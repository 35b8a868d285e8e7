import json
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from fluent_bit_ray.pipelines.flagship import build_flagship
from fluent_bit_ray.sinks import counter_total, flowcounter
from fluent_bit_ray.sources.transcripts import ensure_transcripts
from fluent_bit_ray.record import fields_loads

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def transcripts_df():
    return pq.read_table(ensure_transcripts(SF)).to_pandas()


def oracle_level(text: str):
    """Independent reimplementation: level as the pipeline parsers see it."""
    s = text.lstrip()
    if s.startswith("{"):
        try:
            return json.loads(text).get("level")
        except ValueError:
            return None
    if text.startswith("CALL "):
        return None
    m = re.search(r"^|\s", text) and re.match(r".*?\blevel=(\w+)", text)
    if "=" in text and not text.startswith("CALL "):
        m = re.match(r".*?\blevel=(\w+)", text)
        if m:
            return m.group(1)
    if "\t" in text and ":" in text:
        m2 = re.match(r".*?level:(\w+)", text)
        if m2:
            return m2.group(1)
    return None


def test_flagship_routing_counts_vs_oracle(transcripts_df):
    routed = build_flagship(with_rewrite=True, with_enrich=False).run(
        rd.read_parquet(ensure_transcripts(SF)))
    got = routed.sink_counts()

    df = transcripts_df
    tag = "transcript." + df["role"]
    level = df["text"].map(oracle_level)
    is_alert = level.isin(["error", "warn"])
    n = len(df)
    # sink "all" (*): every original row + every alert copy
    assert got["all"] == n + int(is_alert.sum())
    # *.assistant: originals with role assistant + alert copies of them
    a = int((df["role"] == "assistant").sum())
    a_alert = int((is_alert & (df["role"] == "assistant")).sum())
    assert got["assistant"] == a + a_alert
    assert got["tool_sink"] == int((df["role"] == "tool").sum())
    assert got["alerts"] == int(is_alert.sum())


def test_flagship_text_equality_and_order(transcripts_df):
    routed = build_flagship(with_rewrite=False, with_enrich=False).run(
        rd.read_parquet(ensure_transcripts(SF)))
    out = routed.sink("tool_sink")
    pdf = out.to_pandas()[["conv_id", "turn_idx", "text"]] \
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    exp = transcripts_df[transcripts_df["role"] == "tool"][
        ["conv_id", "turn_idx", "text"]] \
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(pdf, exp)


def test_flagship_parse_fraction(transcripts_df):
    routed = build_flagship(with_rewrite=False, with_enrich=False).run(
        rd.read_parquet(ensure_transcripts(SF)))
    pdf = routed.ds.to_pandas()
    # grammar mix: 8/10 of rows are parseable (free text g∈{8,9} is not)
    parsed = (pdf["parsed_by"] != "").mean()
    assert 0.75 <= parsed <= 0.85
    # every parsed apache row promoted a host; every json/logfmt/ltsv a code
    apache = pdf[pdf["parsed_by"] == "apache"]
    assert apache["p_host"].notna().all()
    assert apache["p_code"].notna().all()


def test_flowcounter_vs_pandas(transcripts_df):
    routed = build_flagship(with_rewrite=False, with_enrich=False).run(
        rd.read_parquet(ensure_transcripts(SF)))
    fc = flowcounter(routed.sink("tool_sink"), unit="minute")

    df = transcripts_df[transcripts_df["role"] == "tool"].copy()
    df["bucket_ts"] = df["ts"].dt.floor("min")
    df["tag"] = "transcript.tool"
    exp = (df.groupby(["tag", "bucket_ts"])
             .agg(n_records=("text", "size"),
                  n_bytes=("text", lambda s: s.str.len().sum()))
             .reset_index()
             .sort_values(["tag", "bucket_ts"]).reset_index(drop=True))
    fc["n_records"] = fc["n_records"].astype("int64")
    fc["n_bytes"] = fc["n_bytes"].astype("int64")
    exp["n_bytes"] = exp["n_bytes"].astype("int64")
    pd.testing.assert_frame_equal(fc, exp)


def test_counter(transcripts_df):
    routed = build_flagship(with_rewrite=False, with_enrich=False).run(
        rd.read_parquet(ensure_transcripts(SF)))
    assert counter_total(routed.sink("all")) == len(transcripts_df)


def test_rewrite_tag_loop_bounded():
    # a rule that would retag forever: a.x -> a.x ; must stop at max_hops
    from fluent_bit_ray.pipelines.pipeline import Pipeline
    t = pa.table({"conv_id": ["c"] * 3, "turn_idx": pa.array([0, 1, 2], type=pa.int32()),
                  "role": ["user"] * 3, "text": ["zzz"] * 3,
                  "tool": [""] * 3,
                  "ts": pa.array([0, 1, 2], type=pa.timestamp("ns"))})
    p = Pipeline(stages=[{"type": "rewrite_tag",
                          "rules": [("$text", "z", "$TAG", True)],
                          "max_hops": 3}],
                 sinks=[("all", "*")], max_hops=3)
    routed = p.run(rd.from_arrow(t))
    # originals + copies per hop, bounded: 3 rows × (1 + 3 hops) = 12
    assert routed.sink_counts()["all"] == 12


def test_enrich_in_pipeline(transcripts_df):
    routed = build_flagship(with_rewrite=False, with_enrich=True).run(
        rd.read_parquet(ensure_transcripts(SF)))
    pdf = routed.sink("tool_sink").to_pandas()
    assert (pdf["category"] != "Unknown").all()
    ua = pdf[pdf["parsed_by"] == "apache"]["ua_browser"]
    assert (ua != "Unknown").all()


def test_actor_pool_chain(transcripts_df):
    # concurrency= uses a map_batches actor pool (stages built per actor)
    routed = build_flagship(with_rewrite=False, with_enrich=True,
                            batch_size=2048).run(
        rd.read_parquet(ensure_transcripts(SF)))
    expect = routed.sink_counts()
    from fluent_bit_ray.pipelines.flagship import build_flagship as bf
    p = bf(with_rewrite=False, with_enrich=True, batch_size=2048)
    p.concurrency = 2
    routed2 = p.run(rd.read_parquet(ensure_transcripts(SF)))
    assert routed2.sink_counts() == expect


def test_vector_fields_parity(transcripts_df):
    """The Arrow-native fields-JSON fast path must be semantically
    identical to the per-row dict path over the full synthetic mix."""
    import pyarrow.parquet as pq
    from fluent_bit_ray.stages import build_stage
    from fluent_bit_ray.pipelines.flagship import PARSER_SPECS, PROMOTE

    t = pq.read_table(ensure_transcripts(SF))

    def run(vector: bool):
        st = build_stage({"type": "parser", "key_name": "text",
                          "parsers": PARSER_SPECS, "promote": PROMOTE})
        if not vector:
            for p in st.parsers:
                p._vector_ok = False
        return st(t)

    a, b = run(True), run(False)
    assert a.column("parsed_by").to_pylist() == b.column("parsed_by").to_pylist()
    fa = [fields_loads(v) for v in a.column("fields").to_pylist()]
    fb = [fields_loads(v) for v in b.column("fields").to_pylist()]
    assert fa == fb
    for key in PROMOTE:
        assert a.column(f"p_{key}").to_pylist() == \
            b.column(f"p_{key}").to_pylist(), key
    assert a.column("event_ts").to_pylist() == b.column("event_ts").to_pylist()


def test_vector_fields_parity_nasty():
    from tests.test_robustness import nasty_table
    from fluent_bit_ray.stages import build_stage
    from fluent_bit_ray.pipelines.flagship import PARSER_SPECS, PROMOTE
    t = nasty_table()

    def run(vector: bool):
        st = build_stage({"type": "parser", "key_name": "text",
                          "parsers": PARSER_SPECS, "promote": PROMOTE})
        if not vector:
            for p in st.parsers:
                p._vector_ok = False
        return st(t)

    a, b = run(True), run(False)
    fa = [fields_loads(v) for v in a.column("fields").to_pylist()]
    fb = [fields_loads(v) for v in b.column("fields").to_pylist()]
    assert fa == fb


def test_airflow_composition_e2e():
    """apm_goals_airflow semantics as one pipeline (reference
    plugins/filter_apm_goals_airflow/filter_airflow.c:49-564):
    multiline collection → per-segment scoring enrich → rewrite_tag
    re-emit of scored segments — composed end-to-end through Pipeline
    (multiline is a wide stage, so this also exercises the
    materialized re-entry path)."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from fluent_bit_ray.pipelines.pipeline import Pipeline
    from fluent_bit_ray.record import fields_dumps, fields_loads

    rows = []
    for c in range(6):
        # one airflow-style task log per conv: header + 2 continuations
        rows.append((f"c{c}", 0, f"[task-{c}] started", 100 * c))
        rows.append((f"c{c}", 1, "  retry count 1", 100 * c + 1))
        status = "FAILED" if c % 2 else "SUCCESS"
        rows.append((f"c{c}", 2, f"  final {status}", 100 * c + 2))
    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "text", "sec"])
    df["ts"] = pd.to_datetime(df.pop("sec"), unit="s")
    df["role"] = "tool"
    ds = rd.from_pandas(df)

    # sidecar-scoring stand-in: same (code, record) contract as the
    # reference's enrich hop — marks failed segments
    def score(tag, ts, record):
        record = dict(record)
        record["goal_status"] = ("failed" if "FAILED" in record.get("seg", "")
                                 else "ok")
        return 1, record

    class SegFields:
        """Lift the joined segment text into the fields map."""
        wide = False

        def __call__(self, b: pa.Table) -> pa.Table:
            segs = b.column("text").to_pylist()
            f = pa.array([fields_dumps({"seg": s}) for s in segs],
                         type=pa.large_string())
            from fluent_bit_ray.stages.base import replace_column
            return replace_column(b, "fields", f)

    from fluent_bit_ray.stages.base import Stage

    class SegFieldsStage(Stage):
        def transform(self, batch, mask):
            return SegFields()(batch)

    # multiline collection runs at the source (the reference joins in
    # in_tail / inside the airflow filter's own buffer, before the
    # enrich + retag hops)
    from fluent_bit_ray.stages import build_stage
    segs = build_stage({"type": "multiline", "firstline": r"^\["}).apply(ds) \
        .map_batches(lambda df: df.assign(role="task"),
                     batch_format="pandas")

    p = Pipeline(stages=[
        SegFieldsStage(),
        {"type": "py_udf", "fn": score},
        {"type": "rewrite_tag", "match": "airflow.task",
         "rules": [("$goal_status", "^failed$", "airflow.failed", True)]},
    ], sinks=[("all", "*"), ("failures", "airflow.failed")],
        tag_prefix="airflow")
    routed = p.run(segs)
    counts = routed.sink_counts()
    # 6 segments + 3 re-emitted failed copies
    assert counts["all"] == 9
    assert counts["failures"] == 3
    failed = routed.sink("failures").to_pandas()
    assert set(failed["tag"]) == {"airflow.failed"}
    assert all(fields_loads(v)["goal_status"] == "failed"
               for v in failed["fields"])
    assert all("FAILED" in fields_loads(v)["seg"] for v in failed["fields"])


def test_auto_batch_size_from_metadata():
    """Pipeline's byte-driven batch sizing: wide rows get small
    batches, tiny rows cap at the row default, metadata-less plans
    fall back — and it must never trigger execution (a mapped plan
    answers None instantly)."""
    import pyarrow as pa
    import ray.data as rd

    from fluent_bit_ray.pipelines.pipeline import (_DEFAULT_BATCH_ROWS,
                                                   _auto_batch_size)

    wide = rd.from_arrow(pa.table({
        "a": list(range(512)),
        "b": ["x" * 16384] * 512}))          # ~16 KB rows
    got = _auto_batch_size(wide)
    assert 64 <= got <= 1024                  # ~4 MiB / 16 KB ≈ 256

    tiny = rd.from_arrow(pa.table({"a": list(range(1000))}))
    assert _auto_batch_size(tiny) == _DEFAULT_BATCH_ROWS

    mapped = tiny.map_batches(lambda b: b, batch_format="pyarrow")
    assert _auto_batch_size(mapped) == _DEFAULT_BATCH_ROWS
