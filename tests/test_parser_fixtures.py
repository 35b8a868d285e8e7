"""Parser fixtures mirroring reference payload grammars beyond the
transcript mix: syslog RFC3164 (plugins/in_syslog payloads +
conf/parsers.conf syslog parser shape) and kubernetes Merge_Log
semantics (plugins/filter_kubernetes kubernetes.c:239-268: parse the
'log' field as JSON and splat it into the record)."""

import numpy as np
import pyarrow as pa

from fluent_bit_ray.parsers import build_parser
from fluent_bit_ray.record import fields_dumps, fields_loads
from fluent_bit_ray.stages import build_stage

SYSLOG_RE = (r"^\<(?P<pri>[0-9]+)\>(?P<time>[^ ]* {1,2}[^ ]* [^ ]*) "
             r"(?P<host>[^ ]*) (?P<ident>[a-zA-Z0-9_\/\.\-]*)"
             r"(?:\[(?P<pid>[0-9]+)\])?(?:[^\:]*\:)? *(?P<message>.*)$")


def test_syslog_rfc3164():
    p = build_parser({"name": "syslog", "format": "regex", "regex": SYSLOG_RE,
                      "time_key": "time", "time_format": "%b %d %H:%M:%S",
                      "types": {"pri": "integer", "pid": "integer"}})
    line = "<34>Oct 11 22:14:15 mymachine su[230]: 'su root' failed on /dev/pts/8"
    maps, times = p.parse_column([line])
    m = maps[0]
    assert m["pri"] == 34
    assert m["host"] == "mymachine"
    assert m["ident"] == "su"
    assert m["pid"] == 230
    assert m["message"] == "'su root' failed on /dev/pts/8"
    assert times[0] == np.datetime64("2015-10-11T22:14:15")  # year-less default


def test_kubernetes_merge_log():
    # record with a 'log' field carrying embedded JSON (container stdout)
    batch = pa.table({
        "text": pa.array(["ignored"]),
        "fields": pa.array([fields_dumps(
            {"log": '{"msg": "ready", "code": 200}', "stream": "stdout"})],
            type=pa.large_string()),
    })
    # Merge_Log == parser stage on the 'log' fields key, keeping other
    # fields (Reserve_Data) and dropping the source key (Keep_Log off)
    st = build_stage({"type": "parser", "key_name": "log",
                      "parsers": [{"name": "json", "format": "json",
                                   "types": {"code": "integer"}}],
                      "reserve_data": True, "preserve_key": False})
    out = st(batch)
    f = fields_loads(out.column("fields").to_pylist()[0])
    assert f == {"msg": "ready", "code": 200, "stream": "stdout"}


def test_merge_log_keep_log():
    batch = pa.table({
        "text": pa.array(["x"]),
        "fields": pa.array([fields_dumps({"log": '{"a": 1}'})],
                           type=pa.large_string()),
    })
    st = build_stage({"type": "parser", "key_name": "log",
                      "parsers": [{"name": "json", "format": "json"}],
                      "reserve_data": True, "preserve_key": True})
    f = fields_loads(st(batch).column("fields").to_pylist()[0])
    assert f == {"a": 1, "log": '{"a": 1}'}


def test_decoder_chain_on_escaped_log():
    # filter-parser + decoder composition: nested escaped JSON in 'log'
    p = build_parser({"name": "j", "format": "json",
                      "decoders": [("decode_field_as", "log", "json")]})
    maps, _ = p.parse_column(
        ['{"log": "{\\"inner\\": true, \\"n\\": 3}", "k": "v"}'])
    assert maps[0] == {"log": {"inner": True, "n": 3}, "k": "v"}


# ---------------- statsd / mqtt payload grammars
def test_statsd_line_shapes():
    from fluent_bit_ray.parsers.payloads import parse_statsd_line

    # counter with sample rate (statsd.c:95-104)
    r = parse_statsd_line("api.req:1|c|@0.5")
    assert r == {"type": "counter", "bucket": "api.req", "value": 1.0,
                 "sample_rate": 0.5}
    # timer ("ms", statsd.c:117-127)
    r = parse_statsd_line("db.lat:320.5|ms")
    assert r == {"type": "timer", "bucket": "db.lat", "value": 320.5,
                 "sample_rate": 1.0}
    # gauge: incremental flag for +N/-N (statsd.c:84-86,106-116)
    assert parse_statsd_line("mem:+5|g")["incremental"] == 1
    assert parse_statsd_line("mem:-5|g")["incremental"] == 1
    g = parse_statsd_line("mem:5|g")
    assert g["incremental"] == 0 and g["value"] == 5.0
    # set keeps the raw string value (statsd.c:128-136)
    assert parse_statsd_line("uniq:user42|s")["value"] == "user42"
    # unknown type char falls back to counter (statsd.c:80)
    assert parse_statsd_line("x:1|z")["type"] == "counter"
    # zero sample rate → 1.0 (statsd.c:181-186)
    assert parse_statsd_line("x:1|c|@0")["sample_rate"] == 1.0
    # grammar misses
    assert parse_statsd_line("no-colon-here") is None
    assert parse_statsd_line("bucket:5") is None
    # atof prefix semantics: "5abc" → 5.0
    assert parse_statsd_line("x:5abc|c")["value"] == 5.0


def test_statsd_batch_stage():
    import pandas as pd
    from fluent_bit_ray.parsers.payloads import statsd_batch
    df = pd.DataFrame({"text": ["a:1|c", "junk", "b:2.5|ms|@0.1"]})
    out = statsd_batch(df)
    assert out["bucket"].tolist() == ["a", "b"]
    assert out["value"].tolist() == [1.0, 2.5]
    assert out["sample_rate"].tolist() == [1.0, 0.1]


def test_mqtt_payload():
    from fluent_bit_ray.parsers.payloads import (mqtt_batch,
                                                 parse_mqtt_payload)
    r = parse_mqtt_payload("sensors/t1", '{"temp": 21.5, "ok": true}')
    assert list(r) == ["topic", "temp", "ok"]  # topic prepended
    assert r["topic"] == "sensors/t1" and r["temp"] == 21.5
    # non-object / non-JSON rejected (mqtt_prot.c:147-163)
    assert parse_mqtt_payload("t", "[1,2]") is None
    assert parse_mqtt_payload("t", "not json") is None
    import pandas as pd
    out = mqtt_batch(pd.DataFrame({"topic": ["a", "b"],
                                   "text": ['{"x": 1}', "nope"]}))
    assert out["topic"].tolist() == ["a"]


def test_kmsg_lines():
    import pandas as pd
    from fluent_bit_ray.parsers.payloads import kmsg_batch, parse_kmsg_line

    r = parse_kmsg_line("6,339,5140900,-;NET: Registered protocol family 10",
                        boot_epoch=1000.0)
    assert r == {"priority": 6, "sequence": 339, "sec": 5, "usec": 140900,
                 "msg": "NET: Registered protocol family 10",
                 "ts": 1000.0 + 5.140900}
    # priority is masked to the 3 low bits (facility stripped)
    assert parse_kmsg_line("14,1,0;x")["priority"] == 6
    assert parse_kmsg_line("garbage") is None
    assert parse_kmsg_line("1,2;no timestamp") is None

    df = pd.DataFrame({"text": ["6,339,5140900,-;ok", "nope", "3,1,250000;warn"]})
    out = kmsg_batch(df)
    assert out["msg"].tolist() == ["ok", "warn"]
    assert out["priority"].tolist() == [6, 3]
    assert out["usec"].tolist() == [140900, 250000]


def test_random_and_head_sources(tmp_path):
    from fluent_bit_ray.sources.readers import (gen_random_records,
                                                read_head_records)

    one = gen_random_records(10, seed=7).to_pandas()
    two = gen_random_records(10, seed=7).to_pandas()
    assert one.equals(two)            # deterministic
    assert one["tag"].unique().tolist() == ["random.0"]
    assert (one["rand_value"] >= 0).all()

    p = tmp_path / "f.txt"
    p.write_text("alpha\nbeta\ngamma\n")
    whole = read_head_records(str(p), buf_bytes=8).to_pandas()
    assert whole["head"].tolist() == ["alpha\nbe"]
    lines = read_head_records(str(p), buf_bytes=100,
                              split_lines=True).to_pandas()
    assert lines["head"].tolist() == ["alpha", "beta", "gamma"]
