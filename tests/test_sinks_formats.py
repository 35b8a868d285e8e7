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
