"""Integration: a long filter chain in one pipeline config (the
reference 'filter suite' composition, FIXTURES §4) verified against a
hand-computed pandas oracle on the synthetic transcripts."""

import json
import re

import pandas as pd
import pyarrow.parquet as pq
import ray.data as rd

from fluent_bit_ray.pipelines.pipeline import Pipeline
from fluent_bit_ray.record import fields_loads
from fluent_bit_ray.sources.transcripts import ensure_transcripts
from fluent_bit_ray.state import write_routed_sinks

SF = "/root/testdata/sf0.001"


def build_chain():
    return Pipeline(stages=[
        {"type": "parser", "key_name": "text",
         "parsers": [{"name": "json", "format": "json"},
                     {"name": "logfmt", "format": "logfmt"},
                     {"name": "ltsv", "format": "ltsv"}]},
        # drop records whose parsed level is debug
        {"type": "grep", "rules": [("exclude", "$level", "^debug$")]},
        # conditional rewrite: only records that have a level
        {"type": "modify",
         "conditions": [("key_exists", "level")],
         "rules": [("set", "source", "engine"),
                   ("rename", "msg", "message"),
                   ("copy", "level", "severity")]},
        # nest the nested-log keys under meta
        {"type": "nest", "operation": "nest", "wildcard": ["log"],
         "nest_under": "meta"},
        {"type": "record_modifier", "remove_keys": ["tool"],
         "records": [("host", "node-1")]},
    ], sinks=[("all", "*"), ("users", "*.user")])


def oracle(df: pd.DataFrame):
    """Independent reimplementation over the raw table."""
    out = []
    for r in df.itertuples():
        t = r.text
        f = None
        if t.lstrip().startswith("{"):
            try:
                o = json.loads(t)
                f = o if isinstance(o, dict) else None
            except ValueError:
                f = None
        if f is None and "=" in t and not t.startswith("CALL "):
            m = dict(re.findall(r'([\w.\-/@]+)=("(?:[^"\\]|\\.)*"|\S*)', t))
            f = {k: (v[1:-1] if v.startswith('"') else v) for k, v in m.items()} or None
        if f is None and ":" in t:
            # LTSV accepts single-field lines too (k:v with no tab) —
            # mirrors the engine/reference ltsv tokenizer
            f = {}
            for tok in t.split("\t"):
                if ":" in tok:
                    k, _, v = tok.partition(":")
                    f[k] = v
            f = f or None
        if f is None:
            f = {}
        if isinstance(f.get("level"), str) and re.search("^debug$", f["level"]):
            continue  # grep exclude
        if "level" in f:
            f.pop("source", None)
            f["source"] = "engine"
            if "msg" in f and "message" not in f:
                f = {("message" if k == "msg" else k): v for k, v in f.items()}
            if "level" in f and "severity" not in f:
                f["severity"] = f["level"]
        if "log" in f:
            f["meta"] = {"log": f.pop("log")}
        f.pop("tool", None)
        f["host"] = "node-1"
        out.append((r.conv_id, r.turn_idx, f))
    return out


def test_kitchen_sink_matches_oracle():
    path = ensure_transcripts(SF)
    routed = build_chain().run(rd.read_parquet(path))
    got = routed.sink("all").to_pandas()
    df = pq.read_table(path).to_pandas()
    exp = oracle(df)
    assert len(got) == len(exp)

    got_map = {(r.conv_id, r.turn_idx): fields_loads(r.fields)
               for r in got.itertuples()}
    mismatches = 0
    for conv_id, turn_idx, f in exp:
        g = got_map[(conv_id, turn_idx)]
        if g != f:
            mismatches += 1
            if mismatches <= 3:
                print("MISMATCH", conv_id, turn_idx, "\n got:", g, "\n exp:", f)
    assert mismatches == 0

    # users sink is the role=user subset of the kept rows
    users = routed.sink("users").to_pandas()
    kept_users = [1 for c, t, _ in exp
                  if df.set_index(["conv_id", "turn_idx"]) is not None]
    assert len(users) == (got["role"] == "user").sum()


def test_formatted_sink_write(tmp_path):
    routed = build_chain().run(
        rd.read_parquet(ensure_transcripts(SF)))
    counts = write_routed_sinks(routed, str(tmp_path), wave="t",
                                formats={"users": "json"})
    import glob
    jfiles = glob.glob(f"{tmp_path}/users/wave=t/part-*.txt")
    assert jfiles
    total = sum(len(open(f).read().strip().splitlines()) for f in jfiles)
    assert total == counts["users"]
    rec = json.loads(open(jfiles[0]).readline())
    assert rec["host"] == "node-1"


def test_kitchen_sink_round2_features():
    """Round-2 composition guard: kubernetes TTL enrich + decoder
    do_next chain + SP arithmetic + gap-aware multiline + msgpack wave
    sink, all over one synthetic stream."""
    import os

    import numpy as np
    import pyarrow as pa

    from fluent_bit_ray.sp import sp_execute
    from fluent_bit_ray.stages import build_stage

    rows = []
    for c in range(8):
        for t in range(6):
            payload = json.dumps(
                {"level": "info", "code": 200 + (t % 2) * 300,
                 "dur": round(0.1 * (t + 1), 3),
                 "log": json.dumps({"seq": c * 10 + t})})
            rows.append((f"pod-{c % 2}_ns{c % 3}_app", f"c{c}", t, payload,
                         1448403340 + c * 100 + t * 2))
    df = pd.DataFrame(rows, columns=["tag", "conv_id", "turn_idx",
                                     "text", "sec"])
    df["ts"] = pd.to_datetime(df.pop("sec"), unit="s")
    df["role"] = "tool"
    ds = rd.from_pandas(df)

    p = Pipeline(stages=[
        {"type": "parser", "key_name": "text", "parsers": [
            {"name": "json", "format": "json",
             "types": {"code": "integer", "dur": "float"},
             "decoders": [("decode_field_as", "log", "escaped", "do_next"),
                          ("decode_field_as", "log", "json")]}],
         "promote": {"code": "int64", "dur": "float64"}},
    ], sinks=[("all", "*")])
    routed = p.run(ds)

    # SP arithmetic over promoted columns
    res = sp_execute(routed.ds,
                     "SELECT COUNT(*) AS n, SUM(code * 2 + dur) AS load "
                     "FROM TAG:'*' WHERE dur * 10 >= 2")
    kept = df["text"].map(lambda t: json.loads(t)["dur"] * 10 >= 2).sum()
    assert int(res["n"].iloc[0]) == int(kept)

    # decoder chain produced the nested object in fields
    first = fields_loads(routed.ds.take(1)[0]["fields"])
    assert isinstance(first["log"], dict) and "seq" in first["log"]

    # msgpack wave sink round-trips
    import pytest
    msgpack = pytest.importorskip("msgpack")
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        counts = write_routed_sinks(routed, td, wave="w1",
                                    formats={"all": "msgpack"})
        assert counts["all"] == len(df)

    # gap-aware multiline over the same stream (each conv: 2s steps,
    # gap 3 → no flush; gap 1 → every continuation is solo)
    st = build_stage({"type": "multiline", "firstline": r"^\{",
                      "flush_gap_s": 1})
    segs = st.apply(ds).to_pandas()
    assert (segs["n_parts"] == 1).all()  # every line is a firstline here
    assert len(segs) == len(df)
