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
