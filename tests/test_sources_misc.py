import json

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from fluent_bit_ray.parsers import LogfmtParser, LtsvParser
from fluent_bit_ray.record import fields_loads
from fluent_bit_ray.sinks import format_batch
from fluent_bit_ray.sources.readers import from_records, read_json_records
from fluent_bit_ray.stages import build_stage


def test_from_records_lib_push():
    ds = from_records([(1448403340.0, {"key": "A", "n": 1}),
                       (1448403341.5, {"key": "B"})], tag="lib.0")
    rows = ds.take_all()
    assert rows[0]["tag"] == "lib.0"
    assert fields_loads(rows[0]["fields"]) == {"key": "A", "n": 1}
    # grep over the pushed records works end to end
    st_ = build_stage({"type": "grep", "rules": [("regex", "$key", "A")]})
    out = ds.map_batches(st_, batch_format="pyarrow").take_all()
    assert len(out) == 1


def test_read_json_records(tmp_path):
    p = tmp_path / "in.json"
    p.write_text('{"a": 1, "b": "x"}\n{"a": 2, "b": "y"}\n')
    ds = read_json_records(str(p), tag="stdin.0")
    rows = sorted(ds.take_all(), key=lambda r: r["a"])
    assert rows[0]["a"] == 1 and rows[0]["tag"] == "stdin.0"


def test_plot_format():
    b = pa.table({
        "ts": pa.array([1448403340_000000000], type=pa.timestamp("ns")),
        "value": pa.array([3.5]),
    })
    lines = format_batch(b, fmt="plot", csv_columns=["value"])
    assert lines == ["1448403340 3.5"]


def test_wide_record_1000_keys():
    # reference gen_data.py wide-record stress: 1000-key JSON map
    payload = json.dumps({f"key_{i}": bool(i % 2) for i in range(1000)})
    b = pa.table({"text": pa.array([payload])})
    stage = build_stage({"type": "parser", "key_name": "text",
                         "parsers": [{"name": "json", "format": "json"}]})
    out = stage(b)
    f = fields_loads(out.column("fields").to_pylist()[0])
    assert len(f) == 1000 and f["key_1"] is True and f["key_0"] is False


_KEY = st.from_regex(r"[A-Za-z][A-Za-z0-9_]{0,8}", fullmatch=True)
_VAL = st.text(alphabet=st.characters(blacklist_characters='\\"\t\n\r=',
                                      min_codepoint=32, max_codepoint=126),
               max_size=12)


@settings(max_examples=50, deadline=None, derandomize=True)
@given(st.dictionaries(_KEY, _VAL, min_size=1, max_size=6))
def test_logfmt_roundtrip_property(d):
    line = " ".join(f'{k}="{v}"' for k, v in d.items())
    maps, _ = LogfmtParser("p").parse_column([line])
    assert maps[0] == d


@settings(max_examples=50, deadline=None, derandomize=True)
@given(st.dictionaries(_KEY, _VAL.filter(lambda s: ":" not in s),
                       min_size=1, max_size=6))
def test_ltsv_roundtrip_property(d):
    line = "\t".join(f"{k}:{v}" for k, v in d.items())
    maps, _ = LtsvParser("p").parse_column([line])
    assert maps[0] == d


def test_msgpack_wire_roundtrip(tmp_path):
    """out_file msgpack sink → in_forward-style reader round-trip."""
    import ray.data as rd

    from fluent_bit_ray.record import fields_loads
    from fluent_bit_ray.sinks import write_sink
    from fluent_bit_ray.sinks.formats import (msgpack_pack,
                                              msgpack_unpack_stream)
    from fluent_bit_ray.sources.readers import (from_msgpack_stream,
                                                read_msgpack_records)

    # encoder/decoder self-consistency across the type lattice
    vals = [None, True, 5, -5, 300, -300, 2**40, 1.25, "héllo", b"\x00\x01",
            ["a", {"k": [1, 2]}], {"m": {"n": None}}, list(range(40)),
            {"k%d" % i: i for i in range(20)}]
    for v in vals:
        assert msgpack_unpack_stream(msgpack_pack(v)) == [v]

    # wire round-trip: sink writes [ts, map] stream, reader re-ingests
    import pandas as pd
    import pyarrow as pa
    src = pa.table({
        "conv_id": ["c1", "c2"], "turn_idx": pa.array([0, 1], pa.int32()),
        "role": ["user", "tool"], "text": ["hi", "yo"], "tool": ["", "bash"],
        "ts": pa.array([1448403340_000000000, 1448403341_000000000],
                       type=pa.timestamp("ns")),
    })
    write_sink(rd.from_arrow(src), str(tmp_path / "mp"), fmt="msgpack")
    import os
    paths = [str(tmp_path / "mp" / f)
             for f in sorted(os.listdir(tmp_path / "mp"))]
    ds = read_msgpack_records(paths, tag="fw.test")
    out = ds.to_pandas().sort_values("ts").reset_index(drop=True)
    assert len(out) == 2
    assert out["tag"].tolist() == ["fw.test", "fw.test"]
    maps = [fields_loads(v) for v in out["fields"]]
    assert maps[0]["conv_id"] == "c1" and maps[1]["tool"] == "bash"
    assert out["ts"].tolist() == pd.to_datetime(
        [1448403340, 1448403341], unit="s").tolist()
