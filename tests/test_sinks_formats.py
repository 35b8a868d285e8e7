import json
import os

import pyarrow as pa
import ray.data as rd

from fluent_bit_ray.record import fields_dumps
from fluent_bit_ray.sinks import format_batch, write_sink


def sample_batch():
    return pa.table({
        "conv_id": pa.array(["c1", "c2"]),
        "turn_idx": pa.array([0, 1], type=pa.int32()),
        "role": pa.array(["user", "tool"]),
        "text": pa.array(["hello", "wo,r\"ld"]),
        "tool": pa.array(["", "bash"]),
        "ts": pa.array([1448403340_000000000, 1448403341_000000000],
                       type=pa.timestamp("ns")),
        "fields": pa.array([fields_dumps({"level": "info"}), ""],
                           type=pa.large_string()),
        "tag": pa.array(["transcript.user", "transcript.tool"]),
    })


def test_json_lines_format():
    lines = format_batch(sample_batch(), fmt="json")
    recs = [json.loads(ln) for ln in lines]
    assert recs[0]["conv_id"] == "c1"
    assert recs[0]["level"] == "info"     # fields splatted into the map
    assert recs[0]["date"].startswith("2015-11-24")
    assert "fields" not in recs[0]


def test_csv_format_quoting():
    lines = format_batch(sample_batch(), fmt="csv")
    assert lines[1].split(",")[0] == "c2"
    assert '"wo,r""ld"' in lines[1]       # RFC-style quoting


def test_ltsv_and_template():
    lines = format_batch(sample_batch(), fmt="ltsv")
    assert "conv_id:c1" in lines[0] and "level:info" in lines[0]
    lines = format_batch(sample_batch(), fmt="template",
                         template="[$TAG[1]] $conv_id/$turn_idx $level")
    assert lines[0] == "[user] c1/0 info"
    assert lines[1] == "[tool] c2/1 "     # missing key renders empty


def test_es_bulk_format():
    lines = format_batch(sample_batch(), fmt="es_bulk")
    assert len(lines) == 4                # action + source per record
    action = json.loads(lines[0])
    assert action["index"]["_index"] == "logstash-2015.11.24"
    src = json.loads(lines[1])
    assert src["@timestamp"].startswith("2015-11-24")


def test_write_sink(tmp_path):
    ds = rd.from_arrow(sample_batch())
    n = write_sink(ds, str(tmp_path / "out"), fmt="json")
    assert n == 2
    files = os.listdir(tmp_path / "out")
    assert files and all(f.endswith(".txt") for f in files)
    total = sum(len(open(tmp_path / "out" / f).read().strip().splitlines())
                for f in files)
    assert total == 2


def test_write_sink_identical_blocks_no_collision(tmp_path):
    """Two blocks with byte-identical content must land in two distinct
    part files (regression: hash-of-first-line names silently
    overwrote), and every row must survive to disk."""
    one = sample_batch()
    ds = rd.from_arrow([one, one])  # two identical blocks
    n = write_sink(ds, str(tmp_path / "out"), fmt="json", batch_size=2)
    files = os.listdir(tmp_path / "out")
    total = sum(len(open(tmp_path / "out" / f).read().strip().splitlines())
                for f in files)
    assert n == 4 and total == 4, (n, total, files)


def test_murmur3_reference_vectors():
    # public test vectors for MurmurHash3 x64_128
    from fluent_bit_ray.sinks.murmur3 import murmur3_x64_128
    h1, h2 = murmur3_x64_128(b"", seed=0)
    assert (h1, h2) == (0, 0)
    # known x64_128 vector (h1/h2 big-endian rendering): "hello", seed 0
    h1, h2 = murmur3_x64_128(b"hello", seed=0)
    assert f"{h1:016x}{h2:016x}" == "cbd8a7b341bd9b025b1e906a48ae1d19"


def test_es_bulk_generate_id():
    lines = format_batch(sample_batch(), fmt="es_bulk", es_generate_id=True)
    a1 = json.loads(lines[0])["index"]
    a2 = json.loads(lines[2])["index"]
    assert len(a1["_id"]) == 32 and a1["_id"] != a2["_id"]
    # deterministic: same record → same id
    again = json.loads(format_batch(sample_batch(), fmt="es_bulk",
                                    es_generate_id=True)[0])["index"]
    assert again["_id"] == a1["_id"]


def test_json_stream_format():
    out = format_batch(sample_batch(), fmt="json_stream")
    assert len(out) == 1               # one concatenated stream chunk
    s = out[0]
    assert s.count('"conv_id"') == 2 and "\n" not in s
    # stream decodes as back-to-back objects
    dec = json.JSONDecoder()
    recs, i = [], 0
    while i < len(s):
        obj, i = dec.raw_decode(s, i)
        recs.append(obj)
    assert [r["conv_id"] for r in recs] == ["c1", "c2"]


def test_msgpack_format_roundtrip():
    import pytest
    msgpack = pytest.importorskip("msgpack")
    out = format_batch(sample_batch(), fmt="msgpack")
    assert all(isinstance(x, bytes) for x in out)
    recs = list(msgpack.Unpacker(raw=False))
    unp = msgpack.Unpacker(raw=False)
    unp.feed(b"".join(out))
    recs = list(unp)
    assert len(recs) == 2
    ts0, m0 = recs[0]
    assert ts0 == 1448403340.0
    assert m0["conv_id"] == "c1" and m0["level"] == "info"
    assert m0["turn_idx"] == 0


def test_msgpack_encoder_primitives():
    import pytest
    msgpack = pytest.importorskip("msgpack")
    from fluent_bit_ray.sinks.formats import msgpack_pack
    cases = [None, True, False, 0, 5, 127, 128, -1, -32, -33, 2**40,
             -2**40, 1.5, "", "x" * 31, "x" * 32, "x" * 300, b"\x01\x02",
             ["a", 1, None], {"k": [1, {"n": False}]}, list(range(20))]
    for c in cases:
        assert msgpack.unpackb(msgpack_pack(c), raw=False,
                               strict_map_key=False) == c


def test_write_sink_msgpack(tmp_path):
    import pytest
    msgpack = pytest.importorskip("msgpack")
    ds = rd.from_arrow(sample_batch())
    n = write_sink(ds, str(tmp_path / "mp"), fmt="msgpack")
    assert n == 2
    data = b""
    for f in sorted(os.listdir(tmp_path / "mp")):
        assert f.endswith(".msgpack")
        data += open(tmp_path / "mp" / f, "rb").read()
    unp = msgpack.Unpacker(raw=False)
    unp.feed(data)
    assert len(list(unp)) == 2


def test_json_date_formats():
    # double: epoch seconds float; iso8601: %Y-%m-%dT%H:%M:%S.%fZ
    lines = format_batch(sample_batch(), fmt="json", date_format="double")
    recs = [json.loads(ln) for ln in lines]
    assert recs[0]["date"] == 1448403340.0
    lines = format_batch(sample_batch(), fmt="json", date_format="iso8601")
    recs = [json.loads(ln) for ln in lines]
    assert recs[0]["date"] == "2015-11-24T22:15:40.000000Z"


def test_plain_format():
    lines = format_batch(sample_batch(), fmt="plain")
    recs = [json.loads(ln) for ln in lines]
    assert "date" not in recs[0]          # no timestamp wrapper
    assert recs[0]["conv_id"] == "c1" and recs[0]["level"] == "info"


def test_gelf_format():
    lines = format_batch(sample_batch(), fmt="gelf")
    recs = [json.loads(ln) for ln in lines]
    assert recs[0]["version"] == "1.1"
    assert recs[0]["short_message"] == "hello"     # text promoted
    assert recs[0]["timestamp"] == 1448403340.0
    assert recs[0]["_conv_id"] == "c1"             # extras underscored
    assert recs[0]["_level"] == "info"
    assert "text" not in recs[0] and "conv_id" not in recs[0]


def test_influx_line_protocol():
    lines = format_batch(sample_batch(), fmt="influx")
    assert len(lines) == 2
    meas, rest = lines[0].split(",", 1)
    assert meas == "transcript.user"
    assert rest.startswith("_seq=1 ")
    assert 'conv_id="c1"' in lines[0]
    assert lines[0].endswith(" 1448403340000000000")
    # turn_idx is numeric → unquoted field
    assert "turn_idx=0" in lines[0]
    # comma/quote-containing text is escaped into a quoted field
    assert 'text="wo,r\\"ld"' in lines[1]


def test_loki_payload():
    lines = format_batch(sample_batch(), fmt="loki")
    assert len(lines) == 1                        # one payload per batch
    p = json.loads(lines[0])
    tags = [s["stream"]["tag"] for s in p["streams"]]
    assert tags == ["transcript.tool", "transcript.user"]
    v = p["streams"][1]["values"][0]
    assert v[0] == "1448403340000000000"
    assert json.loads(v[1])["conv_id"] == "c1"


def test_splunk_hec_format():
    lines = format_batch(sample_batch(), fmt="splunk")
    recs = [json.loads(ln) for ln in lines]
    assert recs[0]["time"] == 1448403340.0
    assert recs[0]["event"]["conv_id"] == "c1"
    assert recs[0]["event"]["level"] == "info"


def test_syslog5424_format():
    lines = format_batch(sample_batch(), fmt="syslog5424")
    # level=info → PRI 16*8+6 = 134; RFC5424 header shape
    assert lines[0].startswith("<134>1 2015-11-24T22:15:40.000Z ")
    assert " transcript - - - hello" in lines[0]
    # row 2 has no level key → default severity info
    assert lines[1].startswith("<134>1 ")
    assert lines[1].endswith('wo,r"ld')


def test_gelf_first_key_only():
    # A record with text AND message/msg: only the FIRST present key is
    # promoted to short_message; the others survive as _-prefixed
    # additional fields (out_gelf keeps non-short_message keys).
    b = pa.table({
        "text": pa.array(["primary"]),
        "message": pa.array(["secondary"]),
        "msg": pa.array(["tertiary"]),
        "ts": pa.array([1448403340_000000000], type=pa.timestamp("ns")),
    })
    rec = json.loads(format_batch(b, fmt="gelf")[0])
    assert rec["short_message"] == "primary"
    assert rec["_message"] == "secondary"
    assert rec["_msg"] == "tertiary"


def test_datadog_format():
    opts = {"dd_source": "ray", "dd_service": "svc", "dd_tags": "env:dev",
            "dd_message_key": "text", "include_tag_key": True,
            "tag_key": "fb_tag", "remap": True}
    b = pa.table({
        "text": pa.array(["hello"]),
        "container_name": pa.array(["/web-1"]),
        "ecs_cluster": pa.array(["arn:aws:ecs:us-east-1:1:cluster/prod"]),
        "ecs_task_arn": pa.array(["arn:aws:ecs:us-east-1:1:task/abc123"]),
        "ts": pa.array([1448403340_500000000], type=pa.timestamp("ns")),
        "tag": pa.array(["transcript.user"]),
    })
    lines = format_batch(b, fmt="datadog", fmt_opts=opts)
    assert len(lines) == 1                      # one JSON array per batch
    recs = json.loads(lines[0])
    r = recs[0]
    assert r["timestamp"] == 1448403340500      # epoch ms, rounded
    assert r["ddsource"] == "ray" and r["service"] == "svc"
    assert r["fb_tag"] == "transcript.user"
    assert r["message"] == "hello" and "text" not in r
    # remapped attrs leave the map and join ddtags before dd_tags
    assert "container_name" not in r and "ecs_cluster" not in r
    assert r["ddtags"] == ("container_name:web-1,cluster_name:prod,"
                           "task_arn:abc123,env:dev")


def test_stackdriver_format():
    lines = format_batch(sample_batch(), fmt="stackdriver",
                         fmt_opts={"project_id": "proj",
                                   "resource": "global"})
    p = json.loads(lines[0])
    assert p["resource"]["type"] == "global"
    e = p["entries"][0]
    assert e["severity"] == "INFO"              # level=info mapped
    assert e["jsonPayload"]["conv_id"] == "c1"
    assert e["logName"] == "projects/proj/logs/transcript.user"
    assert e["timestamp"].startswith("2015-11-24T22:15:40")
    assert "severity" not in p["entries"][1]    # no level key in row 2


def test_cloudwatch_format():
    lines = format_batch(sample_batch(), fmt="cloudwatch",
                         fmt_opts={"log_group": "g", "log_stream": "s"})
    p = json.loads(lines[0])
    assert p["logGroupName"] == "g" and p["logStreamName"] == "s"
    evs = p["logEvents"]
    assert [e["timestamp"] for e in evs] == sorted(
        e["timestamp"] for e in evs)            # sorted by ts
    assert json.loads(evs[0]["message"])["conv_id"] == "c1"
    assert evs[0]["timestamp"] == 1448403340000


def test_msgpack_debug_format():
    lines = format_batch(sample_batch(), fmt="msgpack_debug")
    assert lines[0].startswith("[0] transcript.user: [1448403340.")
    assert '"conv_id":"c1"' in lines[0]


def test_msgpack_ext_decode():
    # fluentd EventTime fixext8 type 0 (sec+nsec big-endian) → float;
    # other ext types → (type, payload) instead of raising.
    import struct as _s
    from fluent_bit_ray.sinks.formats import msgpack_unpack_stream
    ev = bytes([0xD7, 0x00]) + _s.pack(">II", 1448403340, 500000000)
    body = ev + b"\x81\xa1k\xa1v"               # [EventTime, {"k":"v"}]
    stream = b"\x92" + body
    (rec,) = msgpack_unpack_stream(stream)
    assert rec[0] == 1448403340.5
    assert rec[1] == {"k": "v"}
    # ext8 with a non-time type: opaque (type, bytes)
    ext8 = bytes([0xC7, 0x03, 0x05]) + b"abc"
    (obj,) = msgpack_unpack_stream(ext8)
    assert obj == (5, b"abc")


def test_msgpack_bignum_degrades_to_str():
    from fluent_bit_ray.sinks.formats import (msgpack_pack,
                                              msgpack_unpack_stream)
    big = 2 ** 70
    for v in (big, -big):
        (out,) = msgpack_unpack_stream(msgpack_pack(v))
        assert out == str(v)
    # boundary values still round-trip as ints
    for v in (2 ** 64 - 1, -(2 ** 63)):
        (out,) = msgpack_unpack_stream(msgpack_pack(v))
        assert out == v


def test_nats_format_pub_frame_per_tag():
    b = pa.table({
        "text": pa.array(["a", "b", "c"]),
        "ts": pa.array([1448403340_500000000] * 3, type=pa.timestamp("ns")),
        "tag": pa.array(["app.x", "app.x", "app.y"]),
    })
    frames = format_batch(b, fmt="nats")
    assert len(frames) == 2                     # one PUB frame per tag
    head, _, body = frames[0].partition("\r\n")
    subj, length = head.split()[1:]
    assert subj == "app.x" and int(length) == len(body.encode())
    pairs = json.loads(body)
    assert [p[1]["text"] for p in pairs] == ["a", "b"]
    assert pairs[0][0] == 1448403340.5          # ts double first
    assert pairs[0][1]["tag"] == "app.x"        # tag key injected


def test_kafka_format_timestamp_injection():
    b = pa.table({
        "text": pa.array(["hello"]),
        "ts": pa.array([1448403340_500000000], type=pa.timestamp("ns")),
    })
    rec = json.loads(format_batch(b, fmt="kafka")[0])
    assert rec["@timestamp"] == 1448403340.5
    assert rec["text"] == "hello"
    rec = json.loads(format_batch(
        b, fmt="kafka", fmt_opts={"timestamp_format": "iso8601",
                                  "timestamp_key": "t"})[0])
    assert rec["t"] == "2015-11-24T22:15:40.500000Z"


def test_slack_format():
    lines = format_batch(sample_batch(), fmt="slack")
    assert len(lines) == 1                # whole flush = one payload
    body = json.loads(lines[0])
    assert set(body) == {"text"}
    txt = body["text"]
    # per-record: ["timestamp": sec.ns9, {"k"=>"v", ...}] + newline
    assert txt.count("\n") == 2
    first = txt.splitlines()[0]
    assert first.startswith('["timestamp": 1448403340.000000000, {')
    assert '"conv_id"=>"c1"' in first
    assert '"level"=>"info"' in first
    assert first.endswith("}]")


def test_mp_print_rendering():
    from fluent_bit_ray.sinks.formats import _mp_print
    assert _mp_print({"a": 1, "b": [True, None, 1.5]}) \
        == '{"a"=>1, "b"=>[true, nil, 1.500000]}'


def test_td_format():
    from fluent_bit_ray.sinks.formats import msgpack_unpack_stream
    payloads = format_batch(sample_batch(), fmt="td")
    assert len(payloads) == 2 and isinstance(payloads[0], bytes)
    rec = msgpack_unpack_stream(payloads[0])[0]
    assert list(rec)[0] == "time"         # time injected FIRST
    assert rec["time"] == 1448403340
    assert rec["conv_id"] == "c1" and rec["level"] == "info"


def test_kafka_rest_format_defaults():
    lines = format_batch(sample_batch(), fmt="kafka_rest")
    assert len(lines) == 1                # whole flush = one body
    body = json.loads(lines[0])
    assert set(body) == {"records"}
    assert len(body["records"]) == 2
    rec = body["records"][0]
    assert set(rec) == {"value"}          # partition -1 / no key omitted
    v = rec["value"]
    # time_key FIRST, default "@timestamp", "%Y-%m-%dT%H:%M:%S.%09dZ"
    assert list(v)[0] == "@timestamp"
    assert v["@timestamp"] == "2015-11-24T22:15:40.000000000Z"
    assert v["conv_id"] == "c1" and v["level"] == "info"
    assert "_flb-key" not in v            # include_tag_key default off


def test_kafka_rest_format_options_and_source_log_drop():
    b = sample_batch().append_column(
        "source_log_raw", pa.array(["x", "y"]))
    lines = format_batch(b, fmt="kafka_rest", fmt_opts={
        "partition": 5, "message_key": "mk", "include_tag_key": True,
        "tag_key": "_k", "time_key": "t", "time_key_format": "%H:%M:%S"})
    rec = json.loads(lines[0])["records"][1]
    assert rec["partition"] == 5 and rec["key"] == "mk"
    v = rec["value"]
    assert list(v)[:2] == ["t", "_k"]     # time then tag key
    assert v["t"] == "22:15:41.000000000Z"
    assert v["_k"] == "transcript.tool"
    # kafka.c strncasecmp prefix match drops source_log* keys
    assert "source_log_raw" not in v and v["conv_id"] == "c2"


def test_bigquery_format():
    lines = format_batch(sample_batch(), fmt="bigquery")
    assert len(lines) == 1
    body = json.loads(lines[0])
    assert body["kind"] == "bigquery#tableDataInsertAllRequest"
    assert len(body["rows"]) == 2
    assert body["rows"][0]["json"]["conv_id"] == "c1"


def test_pgsql_format():
    lines = format_batch(sample_batch(), fmt="pgsql",
                         fmt_opts={"table": "logs"})
    assert len(lines) == 1
    q = lines[0]
    assert q.startswith("INSERT INTO logs SELECT 'transcript.user', "
                        "to_timestamp(CAST(value->>'date' as FLOAT)), "
                        "* FROM json_array_elements('")
    assert q.endswith("');")
    payload = q.split("json_array_elements('")[1][:-3]
    recs = json.loads(payload.replace("''", "'"))
    assert recs[0]["date"] == 1448403340.0
    assert recs[1]["conv_id"] == "c2"


def test_logdna_format():
    lines = format_batch(sample_batch(), fmt="logdna",
                         fmt_opts={"app": "myapp"})
    body = json.loads(lines[0])
    ln = body["lines"][0]
    assert ln["level"] == "info"          # promoted from fields
    assert ln["app"] == "myapp"           # config fill-in
    assert ln["timestamp"] == 1448403340
    inner = json.loads(ln["line"])        # full record as JSON STRING
    assert inner["conv_id"] == "c1" and inner["level"] == "info"


def test_nrlogs_format():
    import pyarrow as pa
    b = pa.table({
        "conv_id": pa.array(["c1", "c2"]),
        "log": pa.array(["from-log", None]),
        "message": pa.array(["from-msg", "only-msg"]),
        "ts": pa.array([1448403340_000000000, 1448403341_500000000],
                       type=pa.timestamp("ns")),
    })
    lines = format_batch(b, fmt="nrlogs")
    body = json.loads(lines[0])
    assert body[0]["common"]["attributes"]["plugin"]["type"] == "Fluent Bit"
    logs = body[0]["logs"]
    assert logs[0]["timestamp"] == 1448403340000
    assert logs[0]["message"] == "from-log"      # log preferred
    assert "log" not in logs[0]["attributes"]
    assert logs[0]["attributes"]["message"] == "from-msg"  # stays
    assert logs[1]["message"] == "only-msg"
    assert "message" not in logs[1]["attributes"]


def test_kinesis_formats():
    import base64
    lines = format_batch(sample_batch(), fmt="kinesis_streams",
                         fmt_opts={"stream": "s1"})
    body = json.loads(lines[0])
    assert body["StreamName"] == "s1"
    assert len(body["Records"]) == 2
    rec = json.loads(base64.b64decode(
        body["Records"][0]["Data"]).decode().rstrip("\n"))
    assert rec["conv_id"] == "c1"
    # deterministic per-tag partition key
    k1 = body["Records"][0]["PartitionKey"]
    again = json.loads(format_batch(sample_batch(), fmt="kinesis_streams",
                                    fmt_opts={"stream": "s1"})[0])
    assert again["Records"][0]["PartitionKey"] == k1

    fh = json.loads(format_batch(
        sample_batch(), fmt="kinesis_firehose",
        fmt_opts={"stream": "d1", "time_key": "at"})[0])
    assert fh["DeliveryStreamName"] == "d1"
    rec = json.loads(base64.b64decode(
        fh["Records"][0]["Data"]).decode().rstrip("\n"))
    assert rec["at"].startswith("2015-11-24T")
    assert "PartitionKey" not in fh["Records"][0]


def test_azure_formats():
    lines = format_batch(sample_batch(), fmt="azure")
    recs = json.loads(lines[0])
    assert len(recs) == 2
    assert list(recs[0])[0] == "@timestamp"       # time key FIRST
    assert recs[0]["@timestamp"] == 1448403340.0

    lines = format_batch(sample_batch(), fmt="azure_blob")
    assert len(lines) == 2                        # json_lines
    r0 = json.loads(lines[0])
    assert r0["@timestamp"].startswith("2015-11-24T22:15:40.")
    assert r0["@timestamp"].endswith("Z")
    assert r0["conv_id"] == "c1"
