"""Adversarial-input robustness (the reference ships fuzzers under
tests/internal/fuzzers — this is the batch-engine analogue): the
pipeline must neither crash nor mutate ``text`` on hostile payloads."""

import json

import pyarrow as pa
import ray.data as rd

from fluent_bit_ray.pipelines.flagship import build_flagship
from fluent_bit_ray.record import fields_loads
from fluent_bit_ray.sinks import format_batch
from fluent_bit_ray.stages import build_stage

NASTY_TEXTS = [
    "",                                   # empty
    " ",                                  # whitespace only
    "{", "}", "{]",                       # broken JSON
    '{"a": }',                            # invalid JSON
    '{"a": 1',                            # truncated JSON
    "=", "==x==", "a=",                   # degenerate logfmt
    ":", "::", "\t\t\t", "a:\tb:",        # degenerate ltsv
    "CALL (", "CALL x() ->",              # broken tool-call
    'x" quote \\ backslash',              # escapes
    "héllo wörld 😀 \u2028 line-sep",     # unicode incl. line separator
    "a" * 100_000,                        # huge single token
    " ".join(["word"] * 20_000),          # huge many-token row
    "\x01\x02 control chars",             # control characters
    "10.0.0.1 - - [not a date] \"GET\"",  # half-apache
    "null", "true", "123",                # JSON scalars (not objects)
]


def nasty_table():
    n = len(NASTY_TEXTS)
    return pa.table({
        "conv_id": pa.array([f"c{i:03d}" for i in range(n)]),
        "turn_idx": pa.array(list(range(n)), type=pa.int32()),
        "role": pa.array(["user"] * n),
        "text": pa.array(NASTY_TEXTS, type=pa.string()),
        "tool": pa.array([""] * n),
        "ts": pa.array([1448403340_000000000 + i * 10**9 for i in range(n)],
                       type=pa.timestamp("ns")),
    })


def test_flagship_survives_nasty_inputs():
    routed = build_flagship().run(rd.from_arrow(nasty_table()))
    out = routed.sink("all").to_pandas()
    assert len(out) >= len(NASTY_TEXTS)  # originals (+ any alert copies)
    # text never mutated, in order
    got = out[out["conv_id"].str.startswith("c")] \
        .sort_values("turn_idx")["text"].tolist()[:len(NASTY_TEXTS)]
    assert got == NASTY_TEXTS
    # fields JSON is always decodable
    for f in out["fields"]:
        fields_loads(f)


def test_filter_chain_survives_nasty_fields():
    t = nasty_table()
    stages = [
        {"type": "parser", "key_name": "text",
         "parsers": [{"name": "json", "format": "json"},
                     {"name": "logfmt", "format": "logfmt"},
                     {"name": "ltsv", "format": "ltsv"}]},
        {"type": "modify", "rules": [("set", "k", "v"), ("rename", "a", "b"),
                                     ("remove_regex", r"^\d")]},
        {"type": "nest", "operation": "nest", "wildcard": ["k"],
         "nest_under": "sub"},
        {"type": "record_modifier", "records": [("h", "x")]},
        {"type": "alter_size", "add": 2},
        {"type": "grep", "rules": [("exclude", "$nonexistent", "zzz")]},
    ]
    batch = t
    for spec in stages:
        batch = build_stage(spec)(batch)
    assert batch.num_rows == t.num_rows
    assert batch.column("text").to_pylist() == NASTY_TEXTS


def test_formats_survive_nasty_rows():
    t = nasty_table()
    st = build_stage({"type": "parser", "key_name": "text",
                      "parsers": [{"name": "json", "format": "json"}]})
    b = st(t)
    for fmt in ("json", "csv", "ltsv", "es_bulk"):
        lines = format_batch(b, fmt=fmt)
        assert len(lines) >= t.num_rows
    # json lines re-parse
    for ln in format_batch(b, fmt="json"):
        json.loads(ln)


def test_null_text_rows():
    t = nasty_table()
    txt = t.column("text").to_pylist()
    txt[0] = None
    t = t.set_column(t.column_names.index("text"), "text",
                     pa.array(txt, type=pa.string()))
    routed = build_flagship(with_rewrite=False).run(rd.from_arrow(t))
    out = routed.sink("all").to_pandas()
    assert len(out) == t.num_rows
    assert out.sort_values("turn_idx")["parsed_by"].iloc[0] == ""


def test_empty_input_through_wide_operators():
    """Zero-row inputs must flow through the flagship chain, multiline
    and throttle without schema errors (resume reruns can see empty
    shards)."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from fluent_bit_ray.pipelines.flagship import build_flagship
    from fluent_bit_ray.stages import build_stage

    empty = pa.table({
        "conv_id": pa.array([], type=pa.string()),
        "turn_idx": pa.array([], type=pa.int32()),
        "role": pa.array([], type=pa.string()),
        "text": pa.array([], type=pa.string()),
        "tool": pa.array([], type=pa.string()),
        "ts": pa.array([], type=pa.timestamp("ns")),
    })
    ds = rd.from_arrow(empty)
    routed = build_flagship().run(ds)
    counts = routed.sink_counts()
    assert all(v == 0 for v in counts.values())
    th = build_stage({"type": "throttle", "rate": 5, "interval_s": 60})
    assert th.apply(ds).count() == 0


# ------------------------------------------------- wide-record stress
def test_wide_record_1000_keys_parser_modify_nest():
    """JSON_LONG analogue (reference tests/runtime/gen_data.py: 1000
    string keys + END_KEY sentinel) through parser → modify → nest."""
    from fluent_bit_ray.pipelines.pipeline import Pipeline
    from fluent_bit_ray.sources.wide import wide_records

    tbl = wide_records(64, 1000)
    pipe = Pipeline(stages=[
        {"type": "parser", "key_name": "text",
         "parsers": [{"name": "json", "format": "json"}]},
        {"type": "modify", "rules": [("rename", "key_0", "first_key"),
                                     ("set", "marker", "wide")]},
        {"type": "nest", "operation": "nest", "wildcard": ["key_9*"],
         "nest_under": "bucket9"},
    ], sinks=[("all", "*")])
    out = pipe.run(rd.from_arrow(tbl)).ds.to_pandas()
    assert len(out) == 64
    f = fields_loads(out["fields"].iloc[0])
    assert f["first_key"] == "val_0" and f["marker"] == "wide"
    assert f["END_KEY"] == "JSON_END"
    # nested: key_9, key_90..99, key_900..999 = 111 keys
    assert len(f["bucket9"]) == 111
    assert f["bucket9"]["key_999"] == "val_999"
    # top level: row_id + 1000 keys + END_KEY, −111 nested, +marker
    assert len(f) == 1002 + 1 - 111 + 1
    assert f["key_500"] == "val_500"


def test_wide_record_250_bool_keys_roundtrip():
    """JSON_SMALL analogue: 250 bool keys parse with values preserved
    as booleans (not strings)."""
    from fluent_bit_ray.pipelines.pipeline import Pipeline
    from fluent_bit_ray.sources.wide import wide_records

    tbl = wide_records(16, 250, kind="bool")
    pipe = Pipeline(stages=[
        {"type": "parser", "key_name": "text",
         "parsers": [{"name": "json", "format": "json"}]},
    ], sinks=[("all", "*")])
    out = pipe.run(rd.from_arrow(tbl)).ds.to_pandas()
    f = fields_loads(out["fields"].iloc[0])
    assert f["key_0"] is False and f["key_249"] is False
    assert f["END_KEY"] == "JSON_END"
    assert len(f) == 252  # row_id + 250 keys + END_KEY
