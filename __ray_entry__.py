"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init`` / ``ray.shutdown`` anywhere in the library or here.

The engine's canonical input is the transcript table from
``BASELINE.json``'s input_hint (conv_id, turn_idx, role, text, tool,
ts), synthesized deterministically (seed-fixed) and cached under /tmp
— see fluent_bit_ray/sources/transcripts.py. Oracle SQL reads the
same cached parquet via DuckDB ``read_parquet`` so both sides compute
over identical bytes. Additional queries run over the driver-provided
testdata tables (events, documents, embeddings) registered as views.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import os as _os

# the driver compares at sf0.01; GRAFT_ORACLE_SF_DIR lets local runs
# exercise the same oracles at other scales (tools/check_correctness.py)
SF_ORACLE_DIR = _os.environ.get("GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


# ----------------------------------------------------------------- entry
def entry() -> Any:
    """Flagship parse→enrich→route→aggregate over sf0.001 transcripts."""
    from fluent_bit_ray.pipelines.flagship import run_flagship
    from fluent_bit_ray.sinks import flowcounter

    routed = run_flagship("/root/testdata/sf0.001")
    return flowcounter(routed.ds, unit="minute")


# --------------------------------------------------------------- helpers
def _tpath(sf_dir: str) -> str:
    from fluent_bit_ray.sources.transcripts import ensure_transcripts
    return ensure_transcripts(sf_dir)


# The level-extraction logic the flagship parser chain applies, expressed
# once so every oracle query shares it (parser order: apache, toolcall,
# json, logfmt, ltsv; only json/logfmt/ltsv rows carry a level key).
_LEVEL_SQL = """
    CASE
      WHEN text LIKE '{%' THEN json_extract_string(TRY_CAST(text AS JSON), '$.level')
      WHEN text LIKE 'CALL %' THEN NULL
      WHEN regexp_matches(text, 'level=') THEN regexp_extract(text, 'level=(\\w+)', 1)
      WHEN contains(text, chr(9)) AND regexp_matches(text, 'level:')
        THEN regexp_extract(text, 'level:(\\w+)', 1)
      ELSE NULL
    END
"""


def _transcripts_cte(sf_dir: str) -> str:
    return (f"SELECT *, 'transcript.' || role AS tag, {_LEVEL_SQL} AS level "
            f"FROM read_parquet('{_tpath(sf_dir)}/*.parquet')")


# Multiline continuation parsers (tail_multiline.c mult_parsers): the
# SAME RE2-compatible patterns drive the engine's RegexParsers and the
# DuckDB oracle's regexp_extract, so both sides parse identical fields.
_ML_LOGFMT_PAT = (r'^level=(?P<level>\w+) msg="(?P<msg>[^"]*)" '
                  r'tool=(?P<tool>\w+) dur=(?P<dur>[\d.]+) '
                  r'code=(?P<code>\d+)$')
_ML_LTSV_PAT = ('^level:(?P<level>\\w+)\tcode:(?P<code>\\d+)\t'
                'msg:(?P<msg>[^\t]*)\tdur:(?P<dur>[\\d.]+)$')


# --------------------------------------------------------------- queries
def queries() -> dict[str, Callable[[str], Any]]:
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from fluent_bit_ray.pipelines.flagship import build_flagship
    from fluent_bit_ray.sinks import flowcounter
    from fluent_bit_ray.sources.transcripts import read_transcripts

    def _routed(sf_dir: str, **kw):
        return build_flagship(**kw).run(read_transcripts(sf_dir))

    # -- counter oracle: total rows per sink, incl. rewrite_tag re-entry
    def route_counts(sf_dir: str):
        got = _routed(sf_dir).sink_counts()
        return pd.DataFrame(
            {"sink": sorted(got), "n": [got[k] for k in sorted(got)]})

    # -- routed-row equality: the tool sink's exact row set
    def routed_rows_tool(sf_dir: str):
        ds = _routed(sf_dir, with_rewrite=False, with_enrich=False).sink("tool_sink")
        out = ds.to_pandas()[["conv_id", "turn_idx", "text", "tag"]]
        return out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)

    # -- flowcounter oracle per (tag, minute)
    def flowcounter_minute(sf_dir: str):
        routed = _routed(sf_dir, with_rewrite=False, with_enrich=False)
        fc = flowcounter(routed.ds, unit="minute")
        fc["n_records"] = fc["n_records"].astype("int64")
        fc["n_bytes"] = fc["n_bytes"].astype("int64")
        fc["bucket_ts"] = fc["bucket_ts"].astype("datetime64[us]")
        return fc

    # -- parse: tool-call extraction from turn text (grep+regex parse)
    def parse_toolcalls(sf_dir: str):
        routed = _routed(sf_dir, with_rewrite=False, with_enrich=False)
        ds = routed.ds
        import pyarrow as pa

        def project(b: pa.Table) -> pa.Table:
            m = pa.compute.equal(b.column("parsed_by"), "toolcall")
            b = b.filter(m)
            return b.select(["conv_id", "turn_idx", "p_calltool", "p_status"]) \
                .rename_columns(["conv_id", "turn_idx", "calltool", "status"])

        out = ds.map_batches(project, batch_format="pyarrow").to_pandas()
        return out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)

    # -- grep: error-level rows only (filter suite)
    def grep_error_rows(sf_dir: str):
        routed = _routed(sf_dir, with_rewrite=False, with_enrich=False)
        import pyarrow as pa

        def project(b: pa.Table) -> pa.Table:
            m = pa.compute.equal(b.column("p_level"), "error")
            return b.filter(pa.compute.fill_null(m, False)) \
                .select(["conv_id", "turn_idx", "role"])

        out = routed.ds.map_batches(project, batch_format="pyarrow").to_pandas()
        return out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)

    # -- enrich: per-category counts over tool turns (lookup join oracle)
    def enrich_tool_categories(sf_dir: str):
        routed = _routed(sf_dir, with_rewrite=False, with_enrich=True)
        ds = routed.sink("tool_sink")
        from ray.data.aggregate import Count
        agg = ds.groupby("category").aggregate(Count(alias_name="n"))
        out = agg.to_pandas().sort_values("category").reset_index(drop=True)
        out["n"] = out["n"].astype("int64")
        return out

    # -- SP window: tumbling 60s count + dur_ms sum per role, code=200
    def sp_window_tumbling(sf_dir: str):
        routed = _routed(sf_dir, with_rewrite=False, with_enrich=False)
        import numpy as np
        import pyarrow as pa

        def partial(b: pa.Table) -> pa.Table:
            ok = pa.compute.fill_null(
                pa.compute.equal(b.column("p_code"), 200), False)
            b = b.filter(ok)
            if b.num_rows == 0:
                return pa.table({"role": pa.array([], type=pa.string()),
                                 "w": pa.array([], type=pa.int64()),
                                 "n": pa.array([], type=pa.int64()),
                                 "dur_ms": pa.array([], type=pa.int64())})
            ts = b.column("ts").cast(pa.timestamp("ns")).cast(pa.int64()).to_numpy()
            w = (ts // 1_000_000_000) // 60 * 60
            dur = b.column("p_dur").to_numpy(zero_copy_only=False).astype("float64")
            dur_ms = np.where(np.isnan(dur), 0,
                              np.round(dur * 1000)).astype("int64")
            df = pd.DataFrame({"role": b.column("role").to_pylist(), "w": w,
                               "n": 1, "dur_ms": dur_ms})
            g = df.groupby(["role", "w"], sort=False).agg(
                n=("n", "sum"), dur_ms=("dur_ms", "sum")).reset_index()
            return pa.Table.from_pandas(g, preserve_index=False)

        from ray.data.aggregate import Sum
        agg = (routed.ds.map_batches(partial, batch_format="pyarrow")
               .groupby(["role", "w"])
               .aggregate(Sum("n", alias_name="n"),
                          Sum("dur_ms", alias_name="dur_ms")))
        out = agg.to_pandas()
        out["window_start"] = pd.to_datetime(out["w"], unit="s").astype("datetime64[us]")
        out = out[["role", "window_start", "n", "dur_ms"]]
        out["n"] = out["n"].astype("int64")
        out["dur_ms"] = out["dur_ms"].astype("int64")
        return out.sort_values(["role", "window_start"]).reset_index(drop=True)

    # -- events table: flowcounter-style per (event_type, minute)
    def events_flowcounter(sf_dir: str):
        ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["ts", "event_type", "value"])
        import pyarrow as pa

        def partial(b: pa.Table) -> pa.Table:
            ts = b.column("ts").cast(pa.timestamp("ns")).cast(pa.int64()).to_numpy()
            w = (ts // 1_000_000_000) // 60 * 60
            df = pd.DataFrame({"event_type": b.column("event_type").to_pylist(),
                               "w": w,
                               "value_c": np.round(
                                   b.column("value").to_numpy(zero_copy_only=False) * 100
                               ).astype("int64")})
            g = df.groupby(["event_type", "w"], sort=False).agg(
                n=("value_c", "size"), value_c=("value_c", "sum")).reset_index()
            return pa.Table.from_pandas(g, preserve_index=False)

        from ray.data.aggregate import Sum
        agg = (ds.map_batches(partial, batch_format="pyarrow")
               .groupby(["event_type", "w"])
               .aggregate(Sum("n", alias_name="n"),
                          Sum("value_c", alias_name="value_c")))
        out = agg.to_pandas()
        out["minute_ts"] = pd.to_datetime(out["w"], unit="s").astype("datetime64[us]")
        out = out[["event_type", "minute_ts", "n", "value_c"]]
        out["n"] = out["n"].astype("int64")
        out["value_c"] = out["value_c"].astype("int64")
        return out.sort_values(["event_type", "minute_ts"]).reset_index(drop=True)

    def lineitem_pricing(sf_dir: str):
        """TPC-H-q1-style pricing summary over the widest numeric
        table: column-pruned read (5 of 11 columns), per-batch PARTIAL
        aggregation (one row per (flag, status) leaves each task),
        then the tiny groupby — the canonical pre-aggregate-before-
        shuffle shape. Money/qty quantized to int64 cents/hundredths
        so the sums are order-independent and oracle-exact (no float
        accumulation)."""
        import pyarrow as pa
        from ray.data.aggregate import Sum

        ds = rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_returnflag", "l_linestatus", "l_quantity",
                     "l_extendedprice", "l_discount"])

        def partial(b: pa.Table) -> pa.Table:
            qty = np.round(b.column("l_quantity")
                           .to_numpy(zero_copy_only=False) * 100
                           ).astype("int64")
            price = np.round(b.column("l_extendedprice")
                             .to_numpy(zero_copy_only=False) * 100
                             ).astype("int64")
            disc = np.round(b.column("l_discount")
                            .to_numpy(zero_copy_only=False) * 100
                            ).astype("int64")
            df = pd.DataFrame({
                "l_returnflag": b.column("l_returnflag").to_pylist(),
                "l_linestatus": b.column("l_linestatus").to_pylist(),
                "qty_c": qty, "price_c": price,
                # disc_price in cents·1e2: price_c × (100 − disc_c)
                "disc_price_c": price * (100 - disc)})
            g = df.groupby(["l_returnflag", "l_linestatus"],
                           sort=False).agg(
                n=("qty_c", "size"), qty_c=("qty_c", "sum"),
                price_c=("price_c", "sum"),
                disc_price_c=("disc_price_c", "sum")).reset_index()
            return pa.Table.from_pandas(g, preserve_index=False)

        out = (ds.map_batches(partial, batch_format="pyarrow")
               .groupby(["l_returnflag", "l_linestatus"])
               .aggregate(Sum("n", alias_name="n"),
                          Sum("qty_c", alias_name="qty_c"),
                          Sum("price_c", alias_name="price_c"),
                          Sum("disc_price_c", alias_name="disc_price_c"))
               .to_pandas())
        for c in ("n", "qty_c", "price_c", "disc_price_c"):
            out[c] = out[c].astype("int64")
        return (out.sort_values(["l_returnflag", "l_linestatus"])
                .reset_index(drop=True))

    # -- modify: rename msg→message through the chain, oracle-checked
    def modify_rename_msg(sf_dir: str):
        from fluent_bit_ray.pipelines.pipeline import Pipeline
        from fluent_bit_ray.record import fields_loads
        import pyarrow as pa

        p = Pipeline(stages=[
            {"type": "parser", "key_name": "text",
             "parsers": [{"name": "json", "format": "json"},
                         {"name": "logfmt", "format": "logfmt"},
                         {"name": "ltsv", "format": "ltsv"}]},
            {"type": "modify",
             "conditions": [("key_exists", "msg")],
             "rules": [("rename", "msg", "message")]},
        ], sinks=[("all", "*")])
        routed = p.run(read_transcripts(sf_dir))

        def project(b: pa.Table) -> pa.Table:
            msgs = [fields_loads(v).get("message")
                    for v in b.column("fields").to_pylist()]
            out = b.select(["conv_id", "turn_idx"]) \
                .append_column("message", pa.array(msgs, type=pa.string()))
            return out.filter(pa.compute.is_valid(out.column("message")))

        out = routed.ds.map_batches(project, batch_format="pyarrow").to_pandas()
        return out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)

    # -- nest + decoder + SP subkey: nested log.seq via the whole chain
    def nested_log_seq(sf_dir: str):
        from fluent_bit_ray.pipelines.pipeline import Pipeline
        from fluent_bit_ray.sp import sp_execute

        p = Pipeline(stages=[
            {"type": "parser", "key_name": "text",
             "parsers": [{"name": "json", "format": "json",
                          # docker-log style do_next chain: unescape,
                          # then parse as JSON (decoder.c:480-484)
                          "decoders": [
                              ("decode_field_as", "log", "escaped", "do_next"),
                              ("decode_field_as", "log", "json")]}]},
            {"type": "nest", "operation": "nest", "wildcard": ["log"],
             "nest_under": "meta"},
        ], sinks=[("all", "*")])
        routed = p.run(read_transcripts(sf_dir))
        out = sp_execute(routed.ds,
                         "SELECT conv_id, turn_idx, meta.log.seq AS seq "
                         "FROM TAG:'transcript.*' WHERE meta.log.seq >= 0") \
            .to_pandas()
        out["seq"] = out["seq"].astype("int64")
        out["turn_idx"] = out["turn_idx"].astype("int32")
        return out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)

    # -- session windows over the events log (gap = 30 min per user)
    def event_sessions(sf_dir: str):
        from fluent_bit_ray.sp.sessions import sessionize
        ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["user_id", "ts", "event_id"])
        out = sessionize(ds, key="user_id", ts_col="ts", gap_s=1800,
                         tie_col="event_id").to_pandas()
        out["user_id"] = out["user_id"].astype("int64")
        out["session_start"] = out["session_start"].astype("datetime64[us]")
        out["session_end"] = out["session_end"].astype("datetime64[us]")
        out = out[["user_id", "session_idx", "session_start", "session_end",
                   "n_events"]]
        return out.sort_values(["user_id", "session_idx"]) \
            .reset_index(drop=True)

    # -- ordered trailing-row window per user (ROWS BETWEEN .. PRECEDING)
    def events_rolling(sf_dir: str):
        """Per-user rolling 5-row spend over the event stream — the
        ordered-window operator family Ray Data lacks natively. ONE
        coarse user_id exchange; in-partition sort + cumsum kernel
        with group-boundary clamps, zero per-key Python
        (dataops/windows.py:rolling_window)."""
        from fluent_bit_ray.dataops.windows import rolling_window
        ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["event_id", "ts", "user_id", "value"])
        out = rolling_window(
            ev, key="user_id", order=["ts", "event_id"],
            value_col="value", window=5,
            keep_cols=["event_id", "user_id", "ts"]).to_pandas()
        out["roll_sum_c"] = out["roll_sum_c"].astype("int64")
        out["roll_n"] = out["roll_n"].astype("int64")
        out["ts"] = out["ts"].astype("datetime64[us]")
        return out.sort_values("event_id").reset_index(drop=True)

    # -- per-key lag: inter-turn latency over the transcript stream
    def turn_gaps(sf_dir: str):
        """lag(ts) OVER (PARTITION BY conv_id ORDER BY turn_idx):
        milliseconds since the previous turn of the same conversation
        (-1 for the first turn — NULL-free so the value hash is
        representation-stable). ONE coarse conv_id exchange; the
        kernel is one sort + one C-level groupby shift
        (dataops/windows.py:shift_within_key)."""
        from fluent_bit_ray.dataops.windows import shift_within_key
        ds = read_transcripts(sf_dir, columns=["conv_id", "turn_idx", "ts"])
        out = shift_within_key(
            ds, key="conv_id", order=["turn_idx"], cols=["ts"],
            periods=1, keep_cols=["conv_id", "turn_idx", "ts"],
            chunk_rows=1 << 18).to_pandas()
        gap = (out["ts"] - out["ts_lag1"]).dt.total_seconds() * 1000.0
        out["gap_ms"] = gap.round().fillna(-1).astype("int64")
        out = out.drop(columns=["ts", "ts_lag1"])
        return (out.sort_values(["conv_id", "turn_idx"])
                .reset_index(drop=True))

    # -- per-user ordered ranks (row_number / rank / dense_rank)
    def events_rank(sf_dir: str):
        """rank()/dense_rank() OVER (PARTITION BY user_id ORDER BY
        value): one exchange + one lexsort + boundary arithmetic
        (dataops/windows.py:rank_within_key). The op also emits
        row_number, but that column is tie-order-dependent (no total
        tiebreak in the ORDER BY), so the query drops it and compares
        only the tie-invariant rank columns."""
        from fluent_bit_ray.dataops.windows import rank_within_key
        ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["event_id", "user_id", "value"])
        out = rank_within_key(
            ev, key="user_id", order=["value"],
            keep_cols=["event_id", "user_id"]).to_pandas()
        out = out.drop(columns=["row_number"])
        for c in ("rank", "dense_rank"):
            out[c] = out[c].astype("int64")
        return out.sort_values("event_id").reset_index(drop=True)

    # -- per-user expanding (run-to-date) spend
    def events_cum_spend(sf_dir: str):
        """SUM/COUNT OVER (PARTITION BY user_id ORDER BY ts, event_id
        ROWS UNBOUNDED PRECEDING) — the expanding-window family
        (dataops/windows.py:cumulative_within_key)."""
        from fluent_bit_ray.dataops.windows import cumulative_within_key
        ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["event_id", "ts", "user_id", "value"])
        out = cumulative_within_key(
            ev, key="user_id", order=["ts", "event_id"],
            value_col="value", keep_cols=["event_id", "user_id"]).to_pandas()
        out["cum_sum_c"] = out["cum_sum_c"].astype("int64")
        out["cum_n"] = out["cum_n"].astype("int64")
        return out.sort_values("event_id").reset_index(drop=True)

    # -- per-user trailing TIME window (RANGE frame, peers included)
    def events_rolling_time(sf_dir: str):
        """SUM/COUNT OVER (PARTITION BY user_id ORDER BY ts RANGE
        BETWEEN INTERVAL 10 MINUTE PRECEDING AND CURRENT ROW): the
        time-range window — both frame edges from two vectorized
        searchsorted calls over a per-key-rebased monotone time axis
        (dataops/windows.py:rolling_time_window)."""
        from fluent_bit_ray.dataops.windows import rolling_time_window
        ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["event_id", "ts", "user_id", "value"])
        out = rolling_time_window(
            ev, key="user_id", ts_col="ts", value_col="value",
            span_s=600.0, keep_cols=["event_id", "user_id"]).to_pandas()
        out["span_sum_c"] = out["span_sum_c"].astype("int64")
        out["span_n"] = out["span_n"].astype("int64")
        return out.sort_values("event_id").reset_index(drop=True)

    # -- per-user trailing-row MIN/MAX (sliding extremes)
    def events_rolling_minmax(sf_dir: str):
        """MIN/MAX(v) OVER (PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) — extremes don't
        telescope like sums, so the kernel pads each key run with
        window−1 sentinels and takes one vectorized
        sliding_window_view min/max (dataops/windows.py:
        rolling_extremes)."""
        from fluent_bit_ray.dataops.windows import rolling_extremes
        ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["event_id", "ts", "user_id", "value"])
        out = rolling_extremes(
            ev, key="user_id", order=["ts", "event_id"],
            value_col="value", window=5,
            keep_cols=["event_id", "user_id"]).to_pandas()
        out["roll_min_c"] = out["roll_min_c"].astype("int64")
        out["roll_max_c"] = out["roll_max_c"].astype("int64")
        return out.sort_values("event_id").reset_index(drop=True)

    # -- long→wide count pivot over the fixed event-type domain
    def events_pivot(sf_dir: str):
        """Count pivot: per-batch scatter-add partial crosstab (each
        block reduces to ≤|users-in-block| rows BEFORE the exchange),
        then one Ray-native groupby-sum over the tiny partials
        (dataops/windows.py:pivot_counts)."""
        from fluent_bit_ray.dataops.windows import pivot_counts
        cats = ["click", "error", "purchase", "signup", "view"]
        ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["user_id", "event_type"])
        out = pivot_counts(ev, key="user_id", cat_col="event_type",
                           categories=cats).to_pandas()
        for c in cats:
            out[c] = out[c].astype("int64")
        return out.sort_values("user_id").reset_index(drop=True)

    # ---------------- training-data ops over documents / embeddings
    from fluent_bit_ray.dataops import (brute_force_topk, embedding_dup_pairs,
                                        exact_dedup, fingerprint_ds,
                                        langid_ds, minhash_dup_pair_counts,
                                        minhash_dup_pairs,
                                        normalize_ds, quality_ds,
                                        simhash_ds, token_count_ds)

    def _docs(sf_dir: str, columns=None):
        # columns= prunes at the read (only requested columns leave
        # storage) — pass it wherever a query touches a subset
        return rd.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=columns)

    def _embs(sf_dir: str, columns=None):
        return rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=columns)

    def dedup_exact_transcripts(sf_dir: str):
        """Exact dedup over the 60k-row transcript text column:
        representative = min (conv_id:turn_idx) key per distinct text."""
        from ray.data.aggregate import Min

        def keyed(df: pd.DataFrame) -> pd.DataFrame:
            import hashlib
            return pd.DataFrame({
                "h": df["text"].map(
                    lambda t: hashlib.md5(t.encode()).hexdigest()),
                "rep": df["conv_id"] + ":" + df["turn_idx"].astype(str),
            })

        agg = (read_transcripts(sf_dir)
               .map_batches(keyed, batch_format="pandas")
               .groupby("h").aggregate(Min("rep", alias_name="rep")))
        out = agg.to_pandas()[["rep"]]
        return out.sort_values("rep").reset_index(drop=True)

    def dedup_exact_docs(sf_dir: str):
        out = exact_dedup(_docs(sf_dir)).to_pandas()
        out["doc_id"] = out["doc_id"].astype("int64")
        return out.sort_values("doc_id").reset_index(drop=True)

    def doc_token_counts(sf_dir: str):
        out = token_count_ds(_docs(sf_dir)).to_pandas()
        out = out[["doc_id", "n_tokens_ws", "n_tokens_bpe"]]
        return out.sort_values("doc_id").reset_index(drop=True)

    def docs_normalized(sf_dir: str):
        """Unicode normalization sweep (NFC + control strip + ws
        collapse + trim) — stateless Arrow kernels, no shuffle."""
        out = normalize_ds(_docs(sf_dir)).to_pandas()
        out = out[["doc_id", "norm_text", "norm_len"]]
        out["doc_id"] = out["doc_id"].astype("int64")
        return out.sort_values("doc_id").reset_index(drop=True)

    def doc_quality(sf_dir: str):
        out = quality_ds(_docs(sf_dir)).to_pandas()
        out = out[["doc_id", "n_chars_q", "n_words", "n_stopwords",
                   "n_punct"]].copy()
        # composite score as milli-units via floor(q*1000 + 0.5): the
        # identical IEEE expression runs in SQL, and floor (unlike
        # round) has no banker's-vs-half-away asymmetry
        ch = out["n_chars_q"].to_numpy(dtype="float64")
        w = out["n_words"].to_numpy(dtype="float64")
        st = out["n_stopwords"].to_numpy(dtype="float64")
        pu = out["n_punct"].to_numpy(dtype="float64")
        q = (0.4 * np.minimum(ch / 500.0, 1.0)
             + 0.4 * (st / np.maximum(w, 1.0))
             + 0.2 * (1.0 - np.minimum(pu / np.maximum(ch, 1.0) * 10.0,
                                       1.0)))
        out["quality_milli"] = np.floor(q * 1000.0 + 0.5).astype("int64")
        return out.sort_values("doc_id").reset_index(drop=True)

    def doc_langid(sf_dir: str):
        out = langid_ds(_docs(sf_dir)).to_pandas()[["doc_id", "lang_pred"]]
        return out.sort_values("doc_id").reset_index(drop=True)

    def doc_fingerprint(sf_dir: str):
        out = fingerprint_ds(_docs(sf_dir)).to_pandas()[["doc_id", "fingerprint"]]
        return out.sort_values("doc_id").reset_index(drop=True)

    def doc_simhash(sf_dir: str):
        # emitted as zero-padded hex so the DuckDB oracle (which builds
        # the same md5-sign-accumulate in SQL) can compare without
        # uint64→int64 wrap asymmetry
        out = simhash_ds(_docs(sf_dir)).to_pandas()[["doc_id", "simhash"]]
        out["simhash_hex"] = [format(np.uint64(v), "016x")
                              for v in out["simhash"].astype("int64")
                              .to_numpy().view("uint64")]
        out = out[["doc_id", "simhash_hex"]]
        return out.sort_values("doc_id").reset_index(drop=True)

    def docs_simhash_pairs(sf_dir: str):
        """SimHash near-dup PAIRS (hamming ≤ 3 via 4-band pigeonhole
        blocking + in-bucket verification). The banding is lossless for
        the radius, so the oracle is the exact quadratic rule: all
        pairs with bit_count(xor(sig_a, sig_b)) ≤ 3 over the same
        SQL-derived signatures."""
        from fluent_bit_ray.dataops import simhash_dup_pairs
        out = simhash_dup_pairs(_docs(sf_dir))
        out["key_a"] = out["key_a"].astype("int64")
        out["key_b"] = out["key_b"].astype("int64")
        out["hamming"] = out["hamming"].astype("int64")
        return out.reset_index(drop=True)

    def docs_dup_ngram_spans(sf_dir: str):
        """Exact-substring-dedup core (Lee et al. 2022): every
        (doc, pos) whose 8-token gram appears in ≥2 distinct docs.
        One coarse hash exchange co-locates a gram's positions; the
        mulmod rolling hash (B=1000003, M=2^31−1, all int64) is
        replayed term-for-term in the oracle."""
        from fluent_bit_ray.dataops.substring import dup_ngram_spans
        docs = _docs(sf_dir).select_columns(["doc_id", "text"])
        return dup_ngram_spans(docs, k=8, min_docs=2)

    def docs_dup_span_ranges(sf_dir: str):
        """Maximal duplicated token ranges (merged flagged positions,
        gap ≤ k) per document — the spans exact-substring dedup cuts."""
        from fluent_bit_ray.dataops.substring import dup_span_ranges
        docs = _docs(sf_dir).select_columns(["doc_id", "text"])
        return dup_span_ranges(docs, k=8, min_docs=2)

    def docs_dup_removed(sf_dir: str):
        """Exact-substring removal (Lee et al. 2022): every flagged
        span cut from every doc; one co-partitioned (text + flagged
        positions) exchange on doc_id; kept tokens single-space
        joined (documented whitespace-normalizing contract)."""
        from fluent_bit_ray.dataops.substring import (
            remove_dup_ngram_spans)
        docs = _docs(sf_dir).select_columns(["doc_id", "text"])
        out = remove_dup_ngram_spans(docs, k=8, min_docs=2).to_pandas()
        return (out.sort_values("doc_id").reset_index(drop=True))

    def docs_minhash_pairs(sf_dir: str):
        # exact-integer (inter, uni) output so the DuckDB oracle (the
        # same 64-permutation MinHash-LSH written in SQL) hash-matches
        out = minhash_dup_pair_counts(_docs(sf_dir), threshold=(7, 10))
        out["key_a"] = out["key_a"].astype("int64")
        out["key_b"] = out["key_b"].astype("int64")
        return out

    def docs_jaccard_pairs(sf_dir: str):
        """Exact all-pairs n-gram Jaccard (the guarded small-corpus
        path; minhash is the scale path). Integer (inter, uni) output
        with the 0.5 threshold as inter*2 >= uni."""
        from fluent_bit_ray.dataops.dedup import _shingles
        df = _docs(sf_dir).select_columns(["doc_id", "text"]).to_pandas()
        shs = {int(d): _shingles(str(t))
               for d, t in zip(df["doc_id"], df["text"])}
        keys = sorted(shs)
        rows = []
        for i, x in enumerate(keys):
            sx = shs[x]
            for y in keys[i + 1:]:
                sy = shs[y]
                inter = len(sx & sy)
                uni = len(sx) + len(sy) - inter
                if inter * 2 >= uni:
                    rows.append((x, y, inter, uni))
        out = pd.DataFrame(rows, columns=["key_a", "key_b", "inter", "uni"])
        for c in out.columns:
            out[c] = out[c].astype("int64")
        return out.sort_values(["key_a", "key_b"]).reset_index(drop=True)

    def docs_dedup_keep(sf_dir: str):
        """Keys kept after near-dup removal: connected components over
        the MinHash pair set, keep each cluster's min key + all
        unpaired docs (dedup_keep_list)."""
        from fluent_bit_ray.dataops.dedup import dedup_keep_list
        pairs = minhash_dup_pair_counts(_docs(sf_dir), threshold=(7, 10))
        keep = dedup_keep_list(_docs(sf_dir), pairs[["key_a", "key_b"]])
        keep["doc_id"] = keep["doc_id"].astype("int64")
        return keep

    def emb_dup_pairs(sf_dir: str):
        out = embedding_dup_pairs(_embs(sf_dir), threshold=0.5)
        if len(out) == 0:
            return pd.DataFrame({"vec_id_a": pd.Series(dtype="int64"),
                                 "vec_id_b": pd.Series(dtype="int64"),
                                 "cos_r4": pd.Series(dtype="float64")})
        out = out.rename(columns={"key_a": "vec_id_a", "key_b": "vec_id_b"})
        out["cos_r4"] = np.round(out["cosine"], 4)
        return out[["vec_id_a", "vec_id_b", "cos_r4"]]

    def ann_topk(sf_dir: str):
        embs = _embs(sf_dir)
        qdf = embs.to_pandas().sort_values("vec_id").head(5)
        qvecs = np.stack(qdf["embedding"].to_numpy())
        out = brute_force_topk(embs, qvecs, k=10)
        out["cos_r4"] = np.round(out["cosine"], 4)
        out = out[["q", "vec_id", "cos_r4"]]
        return out.sort_values(["q", "vec_id"]).reset_index(drop=True)

    def ann_topk_ivf(sf_dir: str):
        """IVF path under the exact oracle: with n_probe = n_centroids
        every inverted list is probed, so the result must equal the
        brute-force top-k — this puts the IVF plumbing (k-means train
        on a bounded sample, centroid broadcast, per-list scoring,
        local-topk merge) under the same rows+schema+hash gate."""
        from fluent_bit_ray.dataops import ivf_topk
        embs = _embs(sf_dir)
        qdf = embs.to_pandas().sort_values("vec_id").head(5)
        qvecs = np.stack(qdf["embedding"].to_numpy())
        out = ivf_topk(embs, qvecs, k=10, n_centroids=16, n_probe=16)
        out["cos_r4"] = np.round(out["cosine"], 4)
        out = out[["q", "vec_id", "cos_r4"]]
        return out.sort_values(["q", "vec_id"]).reset_index(drop=True)

    def docs_stratified(sf_dir: str):
        """Exactly-n-per-stratum deterministic sample (n smallest
        h64(doc_id) per source — no RNG, parallelism-independent)."""
        from fluent_bit_ray.dataops import stratified_sample
        docs = _docs(sf_dir).select_columns(["doc_id", "source"])
        out = stratified_sample(docs, "source", "doc_id", n=5).to_pandas()
        return out.sort_values("doc_id").reset_index(drop=True)

    def events_user_hll(sf_dir: str):
        """Distributed HyperLogLog distinct-user sketch per event
        type: per-batch register partials (≤ groups×4096 ints leave a
        task), element-wise-max merge. The register TABLE is
        deterministic (md5-derived hash, float64-exponent rho) so the
        oracle reproduces it bit-for-bit in SQL; only the estimate is
        approximate (pytest asserts its accuracy separately)."""
        from fluent_bit_ray.dataops.sketch import hll_registers
        ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["event_type", "user_id"])
        out = hll_registers(ev, "user_id", group_col="event_type",
                            p=12).to_pandas()
        return (out.sort_values(["event_type", "reg"])
                .reset_index(drop=True))

    def sft_pairs(sf_dir: str):
        """SFT training-pair assembly: one exchange co-locates each
        conversation (coarse conv_id hash partitions — skew bounded by
        conversation length), then a vectorized lag/join kernel builds
        each assistant turn's context from the 4 preceding turns.
        Output is ~k× the assistant text (output-bound, streams)."""
        from fluent_bit_ray.dataops.sft import sft_examples
        ds = read_transcripts(sf_dir, columns=["conv_id", "turn_idx",
                                               "role", "text"])
        out = sft_examples(ds, context_turns=4).to_pandas()
        return (out.sort_values(["conv_id", "turn_idx"])
                .reset_index(drop=True))

    def sft_refs(sf_dir: str):
        """Reference-emitting SFT assembly (the 100 TB shape): one row
        of constant size (conv_id, turn_idx, ctx_start, ctx_len) per
        assistant turn — the k× context text never transits the object
        store; a consumer (tokenizer) renders it in-partition via
        sft_render_from_refs."""
        from fluent_bit_ray.dataops.sft import sft_example_refs
        ds = read_transcripts(sf_dir, columns=["conv_id", "turn_idx",
                                               "role", "text"])
        out = sft_example_refs(ds, context_turns=4,
                               assume_dense_order=True).to_pandas()
        out["ctx_start"] = out["ctx_start"].astype("float64")
        return (out.sort_values(["conv_id", "turn_idx"])
                .reset_index(drop=True))

    def wide_parsed(sf_dir: str):
        """1000-key wide-record stress (reference
        tests/runtime/gen_data.py JSON_LONG: key_0..key_999 string map
        + END_KEY sentinel) through parser → modify(rename/set) →
        nest(key_9* under bucket9). Input is deterministic and
        sf-independent (2048 rows); the oracle REBUILDS the same JSON
        in DuckDB and re-parses it with json_extract/json_keys, so
        the parse itself is cross-checked, not just row plumbing.
        batch_size is AUTO-sized by bytes (the ~16 KB rows get ~256-row
        batches from the Pipeline's metadata-driven sizing)."""
        import json as _json

        import numpy as np
        import pandas as pd
        import ray.data as rd

        from fluent_bit_ray.pipelines.pipeline import Pipeline
        from fluent_bit_ray.sources.wide import wide_records

        pipe = Pipeline(stages=[
            {"type": "parser", "key_name": "text",
             "parsers": [{"name": "json", "format": "json"}]},
            {"type": "modify", "rules": [("rename", "key_0", "first_key"),
                                         ("set", "marker", "wide")]},
            {"type": "nest", "operation": "nest", "wildcard": ["key_9*"],
             "nest_under": "bucket9"},
        ], sinks=[("all", "*")])
        ds = pipe.run(rd.from_arrow(wide_records(2048, 1000))
                      .repartition(8)).ds

        def extract(df: pd.DataFrame) -> pd.DataFrame:
            recs = [_json.loads(f) for f in df["fields"]]
            return pd.DataFrame({
                "row_id": np.array([r["row_id"] for r in recs],
                                   dtype="int64"),
                "first_key": [r["first_key"] for r in recs],
                "marker": [r["marker"] for r in recs],
                "n_bucket9": np.array([len(r["bucket9"]) for r in recs],
                                      dtype="int64"),
                "sentinel": [r["END_KEY"] for r in recs]})

        out = ds.map_batches(extract, batch_format="pandas").to_pandas()
        return out.sort_values("row_id").reset_index(drop=True)

    def sft_refs_rendered(sf_dir: str):
        """Lossless-refs cross-check: render (context, target) FROM the
        constant-size reference rows at the consumer
        (sft_render_from_refs: one conv_id co-partition exchange) —
        the result must hash-match the sft_pairs oracle exactly,
        proving the scaling-safe reference shape loses nothing."""
        from fluent_bit_ray.dataops.sft import (sft_example_refs,
                                                sft_render_from_refs)
        ds = read_transcripts(sf_dir, columns=["conv_id", "turn_idx",
                                               "role", "text"])
        refs = sft_example_refs(ds, context_turns=4,
                                assume_dense_order=True)
        out = sft_render_from_refs(ds, refs).to_pandas()
        return (out.sort_values(["conv_id", "turn_idx"])
                .reset_index(drop=True))

    def collapsed_repeats(sf_dir: str):
        """'Last message repeated N times' (rsyslog
        $RepeatedMsgReduction): consecutive identical (role, text)
        turns per conversation collapse to first row + run length.
        Same conv_id exchange as sft_pairs; in-partition run detection
        is one vectorized neighbor-compare (no per-conversation
        Python)."""
        from fluent_bit_ray.dataops.sft import collapse_repeats
        ds = read_transcripts(sf_dir, columns=["conv_id", "turn_idx",
                                               "role", "text"])
        out = collapse_repeats(ds, chunk_rows=1 << 18).to_pandas()
        return (out.sort_values(["conv_id", "turn_idx"])
                .reset_index(drop=True))

    def collapsed_repeats_chunked(sf_dir: str):
        """Hot-key-split collapse FORCED at gate scale
        (chunk_rows=2048: the Zipf-head conv splits into 3 chunks and
        its runs cross chunk boundaries). Must hash-match
        collapsed_repeats' oracle — proves the boundary-record run
        folding is lossless."""
        from fluent_bit_ray.dataops.sft import collapse_repeats
        ds = read_transcripts(sf_dir, columns=["conv_id", "turn_idx",
                                               "role", "text"])
        out = collapse_repeats(ds, chunk_rows=2048).to_pandas()
        out["turn_idx"] = out["turn_idx"].astype("int64")
        out["repeats"] = out["repeats"].astype("int64")
        return (out.sort_values(["conv_id", "turn_idx"])
                .reset_index(drop=True))

    def collapsed_repeats_refs(sf_dir: str):
        """Reference-emitting collapse (the 100 TB shape): only
        (conv_id, turn_idx, role, h64) transits the exchange — ~40 B/
        row instead of full text — and the kept-row refs are rendered
        back to full rows at the consumer
        (dataops/sft.py collapse_repeat_refs +
        collapse_render_from_refs). Must hash-match collapsed_repeats'
        text-equality oracle — proves the hash-run refs are
        lossless."""
        from fluent_bit_ray.dataops.sft import (collapse_render_from_refs,
                                                collapse_repeat_refs)
        ds = read_transcripts(sf_dir, columns=["conv_id", "turn_idx",
                                               "role", "text"])
        refs = collapse_repeat_refs(ds, chunk_rows=1 << 18)
        out = collapse_render_from_refs(ds, refs).to_pandas()
        out["turn_idx"] = out["turn_idx"].astype("int64")
        out["repeats"] = out["repeats"].astype("int64")
        return (out.sort_values(["conv_id", "turn_idx"])
                .reset_index(drop=True))

    def turn_gaps_chunked(sf_dir: str):
        """Halo-chunk lag FORCED at gate scale (chunk_rows=2048, one
        halo row duplicated per boundary). Must hash-match turn_gaps'
        oracle — proves the halo protocol supplies exactly the
        whole-key lag context."""
        from fluent_bit_ray.dataops.windows import shift_within_key
        ds = read_transcripts(sf_dir, columns=["conv_id", "turn_idx", "ts"])
        out = shift_within_key(
            ds, key="conv_id", order=["turn_idx"], cols=["ts"],
            periods=1, keep_cols=["conv_id", "turn_idx", "ts"],
            chunk_rows=2048).to_pandas()
        gap = (out["ts"] - out["ts_lag1"]).dt.total_seconds() * 1000.0
        out["gap_ms"] = gap.round().fillna(-1).astype("int64")
        out = out.drop(columns=["ts", "ts_lag1"])
        return (out.sort_values(["conv_id", "turn_idx"])
                .reset_index(drop=True))

    def tool_transition_counts(sf_dir: str):
        """Tool-usage Markov bigram table: which tool follows which
        within a conversation. One coarse conv_id exchange; only
        (tool, next_tool, n) partial counts leave each partition — the
        merged table is ≤ |tools|² rows at any corpus size."""
        from fluent_bit_ray.dataops.transitions import tool_transitions
        ds = read_transcripts(sf_dir, columns=["conv_id", "turn_idx",
                                               "tool"])
        out = tool_transitions(ds).to_pandas()
        return (out.sort_values(["tool", "next_tool"])
                .reset_index(drop=True))

    def events_user_cms(sf_dir: str):
        """Distributed count-min frequency sketch over event user_ids:
        per-batch register partials (≤ 4×1024 counters leave a task),
        element-wise-SUM merge. The register TABLE is deterministic
        (salted md5 hashes, exact sums) so the oracle reproduces it
        bit-for-bit in SQL; only the point estimate (min over rows) is
        approximate (pytest asserts the ≥-true-count property)."""
        from fluent_bit_ray.dataops.sketch import cms_registers
        ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["user_id"])
        out = cms_registers(ev, "user_id", depth=4, width=1024).to_pandas()
        return out.sort_values(["d", "w"]).reset_index(drop=True)

    def docs_topk_per_source(sf_dir: str):
        """Grouped top-k selection ("best docs per domain"): per-batch
        partial top-k, then one coarse exchange — only k×groups rows
        move. Deterministic tie-break by doc_id."""
        from fluent_bit_ray.dataops import grouped_topk
        docs = _docs(sf_dir).select_columns(["doc_id", "source", "n_chars"])
        out = grouped_topk(docs, "source", "n_chars", k=3,
                           tie_col="doc_id").to_pandas()
        return out.sort_values("doc_id").reset_index(drop=True)

    def emb_kmeans(sf_dir: str):
        """Distributed integer-exact k-means over the embedding table
        (dataops/cluster.py): quantize → deterministic init → 2 Lloyd
        passes (centroids broadcast, k×dim partial sums per batch) →
        final assignment. The oracle replays every iteration in
        long-form SQL — argmin, floor-division centroid update and
        empty-cluster carry-forward are all integer-exact."""
        from fluent_bit_ray.dataops.cluster import kmeans
        out, _ = kmeans(_embs(sf_dir), k=8, iters=2)
        return out

    def emb_cluster_sample(sf_dir: str):
        """Cluster-balanced sampling: exactly 4 vectors per k-means
        cluster, chosen as the n smallest h64(vec_id) within each
        cluster (dataops/cluster.py:cluster_balanced_sample) — the
        topic-balanced subset step. Streaming end to end: broadcast
        centroids, per-batch assignment, partial-top-n exchange."""
        from fluent_bit_ray.dataops import cluster_balanced_sample
        out = cluster_balanced_sample(_embs(sf_dir), k=8, iters=2,
                                      n=4).to_pandas()
        return out.sort_values("vec_id").reset_index(drop=True)

    def orders_enriched(sf_dir: str):
        """Large⋈large fact/dim join through the engine's hash_join
        (Ray native hash-shuffle exchange) with column-pruned reads —
        the docs↔embeddings↔scores shape of a training pipeline."""
        from fluent_bit_ray.joins import hash_join
        orders = rd.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_orderpriority",
                     "o_totalprice"])
        cust = rd.read_parquet(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_mktsegment", "c_nationkey"])
        out = hash_join(orders, cust, on="o_custkey", right_on="c_custkey",
                        num_partitions=16).to_pandas()
        out = out[["o_orderkey", "o_orderpriority", "o_totalprice",
                   "c_mktsegment", "c_nationkey"]]
        return out.sort_values("o_orderkey").reset_index(drop=True)

    def orders_semi_negbal(sf_dir: str):
        """left_semi hash join: orders whose customer has a negative
        account balance (EXISTS shape — keep-list membership at scale)."""
        from fluent_bit_ray.joins import hash_join
        orders = rd.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_orderpriority"])
        cust = rd.read_parquet(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_acctbal"])
        neg = cust.map_batches(lambda df: df[df["c_acctbal"] < 0],
                               batch_format="pandas")
        out = hash_join(orders, neg, on="o_custkey", right_on="c_custkey",
                        how="left_semi", num_partitions=8).to_pandas()
        return out.sort_values("o_orderkey").reset_index(drop=True)

    def purchase_asof_view(sf_dir: str):
        """As-of join (engine extension — Ray Data has none): each
        purchase event matched to the user's most recent view event at
        or before it, co-partitioned by user through one coarse
        exchange. Ties at equal (user, ts) resolve to max event_id in
        BOTH engines (tie_break here, max_by-dedup in the oracle)."""
        import pandas as pd

        from fluent_bit_ray.joins import asof_join
        ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["event_id", "ts", "user_id",
                                      "event_type"])
        p = ev.map_batches(
            lambda df: df[df["event_type"] == "purchase"]
            [["event_id", "ts", "user_id"]], batch_format="pandas")

        def views(df: pd.DataFrame) -> pd.DataFrame:
            df = df[df["event_type"] == "view"]
            return pd.DataFrame({"ts": df["ts"], "user_id": df["user_id"],
                                 "v_event_id": df["event_id"],
                                 "v_ts": df["ts"]})

        v = ev.map_batches(views, batch_format="pandas")
        out = asof_join(p, v, on="ts", by="user_id",
                        tie_break="v_event_id", how="inner",
                        partitions=16).to_pandas()
        gap = (out["ts"].to_numpy() - out["v_ts"].to_numpy()) \
            .astype("timedelta64[us]").astype(np.int64)
        res = pd.DataFrame({"p_event_id": out["event_id"],
                            "user_id": out["user_id"],
                            "v_event_id": out["v_event_id"],
                            "gap_us": gap})
        return res.sort_values("p_event_id").reset_index(drop=True)

    def purchase_in_error_window(sf_dir: str):
        """Range join (engine extension — Ray Data has none): each
        purchase matched to every error of the same user whose
        1-hour window contains it, via one co-partitioned exchange
        on user_id (a true 1-to-many interval join)."""
        import pandas as pd

        from fluent_bit_ray.joins import range_join
        ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["event_id", "ts", "user_id",
                                      "event_type"])
        p = ev.map_batches(
            lambda df: df[df["event_type"] == "purchase"]
            [["event_id", "ts", "user_id"]], batch_format="pandas")

        def errs(df: pd.DataFrame) -> pd.DataFrame:
            df = df[df["event_type"] == "error"]
            return pd.DataFrame({
                "user_id": df["user_id"],
                "lo": df["ts"],
                "hi": df["ts"] + pd.Timedelta(hours=1),
                "err_event_id": df["event_id"]})

        e = ev.map_batches(errs, batch_format="pandas")
        out = range_join(p, e, "ts", "lo", "hi", by="user_id",
                         partitions=16).to_pandas()
        if len(out) == 0:  # all-empty partitions lose the schema
            return pd.DataFrame({
                "p_event_id": pd.Series(dtype="int64"),
                "user_id": pd.Series(dtype="int64"),
                "err_event_id": pd.Series(dtype="int64")})
        res = out.rename(columns={"event_id": "p_event_id"})
        res = res[["p_event_id", "user_id", "err_event_id"]]
        return res.sort_values(["p_event_id", "err_event_id"]) \
            .reset_index(drop=True)

    def docs_src_bjoin(sf_dir: str):
        """Broadcast join against a driver-built dimension frame
        (ray.put once, per-batch vectorized merge, zero shuffle)."""
        import pandas as pd

        from fluent_bit_ray.joins import broadcast_join
        dim = pd.DataFrame({
            "source": [f"src{i}" for i in range(20)],
            "src_rank": list(range(20)),
            "tier": ["low" if i < 7 else ("mid" if i < 14 else "high")
                     for i in range(20)],
        })
        docs = _docs(sf_dir).select_columns(["doc_id", "source"])
        out = broadcast_join(docs, dim, on="source").to_pandas()
        out = out[["doc_id", "source", "src_rank", "tier"]]
        return out.sort_values("doc_id").reset_index(drop=True)

    def revenue_by_nation(sf_dir: str):
        """TPC-H-Q5-shaped multi-join (customer-nation variant):
        region/nation broadcast as a driver dict (tiny dims never
        shuffle), customer filtered+enriched per batch, orders
        date-filtered at a column-pruned read, lineitem PRE-AGGREGATED
        by l_orderkey inside each batch before the fact-fact hash
        join, and the final groupby runs over n_items≤nations rows per
        task. Money in int64 cents·1e2 so sums are order-independent
        and oracle-exact."""
        import pandas as pd
        import pyarrow.parquet as pq

        from fluent_bit_ray.joins import hash_join

        nat = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
        reg = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
        asia = reg.loc[reg["r_name"] == "ASIA", "r_regionkey"]
        nmap = (nat[nat["n_regionkey"].isin(asia)]
                .set_index("n_nationkey")["n_name"].to_dict())

        cust = rd.read_parquet(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_nationkey"])

        def add_nation(df: pd.DataFrame) -> pd.DataFrame:
            df = df[df["c_nationkey"].isin(nmap)]
            return pd.DataFrame({
                "c_custkey": df["c_custkey"],
                "n_name": df["c_nationkey"].map(nmap)})

        cust = cust.map_batches(add_nation, batch_format="pandas")

        lo = pd.Timestamp("1996-01-01")
        hi = pd.Timestamp("1997-01-01")
        orders = rd.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_orderdate"])
        orders = orders.map_batches(
            lambda df: df.loc[(df["o_orderdate"] >= lo)
                              & (df["o_orderdate"] < hi),
                              ["o_orderkey", "o_custkey"]],
            batch_format="pandas")
        oc = hash_join(orders, cust, on="o_custkey",
                       right_on="c_custkey", num_partitions=16)
        oc = oc.select_columns(["o_orderkey", "n_name"])

        li = rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_extendedprice", "l_discount"])

        def li_partial(df: pd.DataFrame) -> pd.DataFrame:
            price = np.round(df["l_extendedprice"].to_numpy() * 100
                             ).astype(np.int64)
            disc = np.round(df["l_discount"].to_numpy() * 100
                            ).astype(np.int64)
            g = pd.DataFrame({"l_orderkey": df["l_orderkey"],
                              "revenue_c": price * (100 - disc)})
            return (g.groupby("l_orderkey", sort=False)
                    .agg(n_items=("revenue_c", "size"),
                         revenue_c=("revenue_c", "sum")).reset_index())

        li = li.map_batches(li_partial, batch_format="pandas")
        j = hash_join(li, oc, on="l_orderkey", right_on="o_orderkey",
                      num_partitions=16)

        def by_nation(df: pd.DataFrame) -> pd.DataFrame:
            return (df.groupby("n_name", sort=False)
                    .agg(n_items=("n_items", "sum"),
                         revenue_c=("revenue_c", "sum")).reset_index())

        from ray.data.aggregate import Sum
        out = (j.map_batches(by_nation, batch_format="pandas")
               .groupby("n_name")
               .aggregate(Sum("n_items", alias_name="n_items"),
                          Sum("revenue_c", alias_name="revenue_c"))
               .to_pandas())
        out["n_items"] = out["n_items"].astype("int64")
        out["revenue_c"] = out["revenue_c"].astype("int64")
        return out.sort_values("n_name").reset_index(drop=True)

    def top_customers_returns(sf_dir: str):
        """TPC-H-Q10-shaped aggregate-then-join-smallest: returned
        lineitems pre-aggregated per batch by order, hash-joined to
        orders for the custkey, revenue summed per customer, then a
        partial-top-k exchange (every block reduces to ≤20 rows before
        ONE final task) — the 20 survivors alone join the customer and
        nation dims. Deterministic under ties: (revenue desc, custkey
        asc) in both engines."""
        import pandas as pd
        import pyarrow.parquet as pq

        from fluent_bit_ray.joins import hash_join

        li = rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_returnflag", "l_extendedprice",
                     "l_discount"])

        def li_partial(df: pd.DataFrame) -> pd.DataFrame:
            df = df[df["l_returnflag"] == "R"]
            price = np.round(df["l_extendedprice"].to_numpy() * 100
                             ).astype(np.int64)
            disc = np.round(df["l_discount"].to_numpy() * 100
                            ).astype(np.int64)
            g = pd.DataFrame({"l_orderkey": df["l_orderkey"],
                              "revenue_c": price * (100 - disc)})
            return (g.groupby("l_orderkey", sort=False)
                    .agg(revenue_c=("revenue_c", "sum")).reset_index())

        li = li.map_batches(li_partial, batch_format="pandas")
        orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                                 columns=["o_orderkey", "o_custkey"])
        j = hash_join(li, orders, on="l_orderkey",
                      right_on="o_orderkey", num_partitions=16)

        from ray.data.aggregate import Sum
        rev = (j.map_batches(
            lambda df: (df.groupby("o_custkey", sort=False)
                        .agg(revenue_c=("revenue_c", "sum"))
                        .reset_index()), batch_format="pandas")
            .groupby("o_custkey")
            .aggregate(Sum("revenue_c", alias_name="revenue_c")))

        def topk(df: pd.DataFrame) -> pd.DataFrame:
            return df.sort_values(
                ["revenue_c", "o_custkey"],
                ascending=[False, True]).head(20)

        top = (rev.map_batches(topk, batch_format="pandas")
               .repartition(1)
               .map_batches(topk, batch_format="pandas")
               .to_pandas())
        top["revenue_c"] = top["revenue_c"].astype("int64")

        # only the 20 survivors touch the dims (driver-side: tiny)
        cust = pq.read_table(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_name", "c_nationkey"],
            filters=[("c_custkey", "in",
                      top["o_custkey"].tolist())]).to_pandas()
        nat = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
        cust = cust.merge(nat[["n_nationkey", "n_name"]],
                          left_on="c_nationkey", right_on="n_nationkey")
        out = top.merge(cust, left_on="o_custkey", right_on="c_custkey")
        out = out.rename(columns={"o_custkey": "custkey"})
        out = out[["custkey", "c_name", "n_name", "revenue_c"]]
        return (out.sort_values(["revenue_c", "custkey"],
                                ascending=[False, True])
                .reset_index(drop=True))

    def tf_score(sf_dir: str):
        """filter_tensorflow analogue end-to-end under a FULL oracle:
        embeddings are integer-quantized (floor(x*128 + 0.5) — exact,
        identical in numpy and DuckDB), then scored by the
        seed-deterministic integer MLP (stages/tensorflow.py FixedMlp;
        interpreter-per-actor, tf_out appended — tensorflow.c:87-97,
        :397-406). Integer weights keep the whole forward pass exact,
        so the oracle re-runs the matmul in SQL bit-for-bit."""
        import pandas as pd

        from fluent_bit_ray.stages import build_stage

        def quant(df: pd.DataFrame) -> pd.DataFrame:
            q = [np.floor(np.asarray(v, dtype=np.float64) * 128.0 + 0.5)
                 .astype(np.int64) for v in df["embedding"]]
            return pd.DataFrame({"vec_id": df["vec_id"], "qemb": q})

        ds = _embs(sf_dir).map_batches(quant, batch_format="pandas")
        st = build_stage({"type": "tensorflow", "input_field": "qemb",
                          "input_dim": 64})
        out = st.apply(ds).to_pandas()
        out["tf0"] = out["tf_out"].map(lambda v: int(v[0]))
        out["tf1"] = out["tf_out"].map(lambda v: int(v[1]))
        out = out[["vec_id", "tf0", "tf1"]]
        return out.sort_values("vec_id").reset_index(drop=True)

    def doc_redact(sf_dir: str):
        """PII redaction sweep over the transcript corpus (vectorized
        sequential RE2 replace, dataops/redact.py): apache lines carry
        IPv4s, so the scrub has real hits. Full oracle: the same
        ordered pattern chain as nested regexp_replace CTEs."""
        from fluent_bit_ray.dataops.redact import redact_ds
        out = redact_ds(read_transcripts(sf_dir)).to_pandas()
        out["turn_idx"] = out["turn_idx"].astype("int64")
        out = out[["conv_id", "turn_idx", "text_redacted", "n_redactions"]]
        return out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)

    def vocab_top(sf_dir: str):
        """Corpus vocabulary top-k (partial counts per batch → groupby
        sum → driver-side final top-k on the vocab-sized merge)."""
        from fluent_bit_ray.dataops import vocab_topk
        return vocab_topk(_docs(sf_dir), k=100)

    def conv_rendered(sf_dir: str):
        """Chat rendering: conversation → one 'role: text'-lines
        training text (coarse conv exchange + boundary slice-joins;
        dataops/sft.py render_conversations)."""
        from fluent_bit_ray.dataops import render_conversations
        out = render_conversations(read_transcripts(sf_dir)).to_pandas()
        out["n_turns"] = out["n_turns"].astype("int64")
        return out.sort_values("conv_id").reset_index(drop=True)

    def convs_curated(sf_dir: str):
        """Composed transcripts curation: structural gate → cross-conv
        boilerplate drop → consecutive-repeat collapse → chat render
        (dataops/sft.py curate_transcripts; stage order is part of the
        contract and the oracle replays it)."""
        from fluent_bit_ray.dataops.sft import curate_transcripts
        out = curate_transcripts(read_transcripts(sf_dir)).to_pandas()
        out["n_turns"] = out["n_turns"].astype("int64")
        return out.sort_values("conv_id").reset_index(drop=True)

    def convs_curated_chunked(sf_dir: str):
        """The hot-key-split curation variant (side-channel gate
        partials + per-chunk render + piece merge) FORCED at gate
        scale (chunk_rows=2048 splits the Zipf-head conv into 3
        chunks). Must hash-match convs_curated's oracle — proves the
        chunk decomposition (incl. boilerplate-drop adjacency across
        boundaries) is lossless. The cluster-scale switch for
        conversations too hot for one task."""
        from fluent_bit_ray.dataops.sft import curate_transcripts
        out = curate_transcripts(read_transcripts(sf_dir),
                                 chunk_rows=2048).to_pandas()
        out["n_turns"] = out["n_turns"].astype("int64")
        return out.sort_values("conv_id").reset_index(drop=True)

    def convs_curated_refs(sf_dir: str):
        """Reference-emitting curation (the 100 TB shape): text never
        transits ANY exchange — the gate reduces per-block partials,
        boilerplate counts 16 B (h64, conv) pairs, and the collapse
        exchanges 40 B hash rows; the kept (conv_id, turn_idx) refs
        are rendered at the consumer (dataops/sft.py
        curate_transcript_refs + curate_render_from_refs). Must
        hash-match convs_curated's full rendered oracle."""
        from fluent_bit_ray.dataops.sft import (curate_render_from_refs,
                                                curate_transcript_refs)
        ds = read_transcripts(sf_dir)
        refs = curate_transcript_refs(ds)
        out = curate_render_from_refs(ds, refs).to_pandas()
        out["n_turns"] = out["n_turns"].astype("int64")
        return out.sort_values("conv_id").reset_index(drop=True)

    def convs_curated_refs_chunked(sf_dir: str):
        """The refs curation with hot-conv chunk splitting FORCED at
        gate scale (chunk_rows=2048) — exercises the missing-chunk-
        tolerant boundary protocol (gate/boilerplate drops can empty
        whole chunks). Must hash-match convs_curated's oracle."""
        from fluent_bit_ray.dataops.sft import (curate_render_from_refs,
                                                curate_transcript_refs)
        ds = read_transcripts(sf_dir)
        refs = curate_transcript_refs(ds, chunk_rows=2048)
        out = curate_render_from_refs(ds, refs).to_pandas()
        out["n_turns"] = out["n_turns"].astype("int64")
        return out.sort_values("conv_id").reset_index(drop=True)

    def convs_curated_packed(sf_dir: str):
        """Fused refs CONSUMER end-to-end: curation refs → in-partition
        render-free token counting (token count of the "\\n"-join ==
        sum of per-piece counts, so the rendered corpus never exists)
        → greedy packing into ≤2048-token bins in conv_id order per
        md5 shard (dataops/sft.py curate_pack_from_refs). The oracle
        materializes the rendered corpus in SQL, counts its tokens and
        replays the sharded packing recurrence — proving the
        render-free path exact."""
        from fluent_bit_ray.dataops.sft import (curate_pack_from_refs,
                                                curate_transcript_refs)
        ds = read_transcripts(sf_dir)
        refs = curate_transcript_refs(ds)
        out = curate_pack_from_refs(ds, refs, budget=2048).to_pandas()
        out["n_tokens"] = out["n_tokens"].astype("int64")
        out["shard"] = out["shard"].astype("int64")
        out["bin_idx"] = out["bin_idx"].astype("int64")
        return out.sort_values("conv_id").reset_index(drop=True)

    def emb_semantic_dup(sf_dir: str):
        """SemDeDup-style semantic near-dup pairs: integer-exact
        k-means buckets, same-cluster cosine scoring per coarse
        partition (dataops/cluster.py semantic_dedup_pairs)."""
        from fluent_bit_ray.dataops import semantic_dedup_pairs
        return semantic_dedup_pairs(_embs(sf_dir), k=8, iters=1,
                                    thr_milli=300)

    def conv_gated(sf_dir: str):
        """Whole-conversation structural gate (SFT prep): keep convs
        with ≥11 turns containing BOTH an assistant and a tool turn
        (one coarse conv exchange; dataops/sft.py conversation_gate)."""
        from fluent_bit_ray.dataops import conversation_gate
        ds = conversation_gate(read_transcripts(sf_dir), min_turns=11,
                               require_roles=("assistant", "tool"))
        out = ds.to_pandas()[["conv_id", "turn_idx", "role"]]
        return out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)

    def boilerplate_removed(sf_dir: str):
        """C4-style boilerplate drop: every turn whose text appears in
        ≥5 distinct conversations is removed entirely (distinct-pair
        partials → coarse count exchange → broadcast drop-set;
        dataops/boilerplate.py)."""
        from fluent_bit_ray.dataops import remove_boilerplate
        ds = remove_boilerplate(read_transcripts(sf_dir), min_groups=5)
        import pyarrow as pa

        def project(b: pa.Table) -> pa.Table:
            return b.select(["conv_id", "turn_idx", "role"])

        out = ds.map_batches(project, batch_format="pyarrow").to_pandas()
        return out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)

    def doc_lm_score(sf_dir: str):
        """Bigram-LM typicality (perplexity-filter analogue): corpus
        count tables via partial aggregation, broadcast once, integer
        milli scores (dataops/lm.py)."""
        from fluent_bit_ray.dataops import ngram_lm_scores
        out = ngram_lm_scores(_docs(sf_dir)).to_pandas()
        out["lm_milli"] = out["lm_milli"].astype("int64")
        return out.sort_values("doc_id").reset_index(drop=True)

    def doc_quality_model(sf_dir: str):
        """fasttext-style hashed-linear quality scoring (actor-pool
        model, integer weights, md5-h64 buckets — dataops/classifier)."""
        from fluent_bit_ray.dataops import quality_model_scores
        out = quality_model_scores(_docs(sf_dir)).to_pandas()
        out["score"] = out["score"].astype("int64")
        return out.sort_values("doc_id").reset_index(drop=True)

    def docs_keyword_topk(sf_dir: str):
        """Keyword retrieval: integer tf-idf top-20 for a fixed query
        bag (df pass → broadcast weights → per-batch top-k partials;
        no shuffle — dataops/search.py)."""
        from fluent_bit_ray.dataops import keyword_search_topk
        return keyword_search_topk(
            _docs(sf_dir), ["hash", "window", "spark", "zzzmissing"], k=20)

    def doc_decontaminate(sf_dir: str):
        """Benchmark n-gram decontamination: the 'benchmark' is the
        deterministic doc_id % 20 == 0 slice of the corpus; its distinct
        word-5-gram h64 hashes are collected once (benchmark-sized),
        broadcast via ray.put, and every doc counts its DISTINCT
        contaminated grams by searchsorted membership — the canonical
        broadcast semi-join (no shuffle, corpus streams)."""
        from fluent_bit_ray.dataops import (benchmark_ngram_hashes,
                                            decontaminate)
        docs = _docs(sf_dir, columns=["doc_id", "text"])
        bench = docs.map_batches(
            lambda df: df[df["doc_id"] % 20 == 0], batch_format="pandas")
        bh = benchmark_ngram_hashes(bench, ngram=5)
        out = decontaminate(docs, bh, ngram=5).to_pandas()
        out["doc_id"] = out["doc_id"].astype("int64")
        out = out[["doc_id", "n_hits", "contaminated"]]
        return out.sort_values("doc_id").reset_index(drop=True)

    def docs_sample_mix(sf_dir: str):
        """Deterministic weighted source mixing: per-source keep rates
        cycle 100/50/30/10 % by source index; membership is
        h64(md5(doc_id)) % 100 < rate — reproducible at any parallelism
        and in SQL (no RNG)."""
        from fluent_bit_ray.dataops import mix_by_source
        weights = {f"src{i}": (100, 50, 30, 10)[i % 4] for i in range(64)}
        out = mix_by_source(_docs(sf_dir), weights).to_pandas()
        out["doc_id"] = out["doc_id"].astype("int64")
        out = out[["doc_id", "source"]]
        return out.sort_values("doc_id").reset_index(drop=True)

    def docs_sampled(sf_dir: str):
        """Deterministic ~37% corpus sample: md5-bucket rule, no RNG —
        identical at any parallelism and on resume."""
        from fluent_bit_ray.dataops import hash_sample
        out = hash_sample(_docs(sf_dir), rate_pct=37).to_pandas()
        out["doc_id"] = out["doc_id"].astype("int64")
        return out[["doc_id"]].sort_values("doc_id").reset_index(drop=True)

    def docs_shuffled(sf_dir: str):
        """Seeded deterministic epoch shuffle (seed 7): global sort by
        h64(md5('7:'||doc_id)) — reproducible training order. The
        OUTPUT ORDER is the result: epoch_pos is the row's position."""
        from fluent_bit_ray.dataops import epoch_shuffle
        out = epoch_shuffle(_docs(sf_dir).select_columns(["doc_id"]),
                            seed=7).to_pandas()
        out["doc_id"] = out["doc_id"].astype("int64")
        out["epoch_pos"] = np.arange(len(out), dtype="int64")
        return out[["doc_id", "epoch_pos"]].reset_index(drop=True)

    def bpe_merges(sf_dir: str):
        """BPE tokenizer training (12 merges): distributed word-count
        partials -> compact-vocab greedy merge loop; the DuckDB oracle
        replays every round (pair counts, argmax, tie-break,
        application) as unrolled CTEs."""
        from fluent_bit_ray.dataops import bpe_train
        return bpe_train(_docs(sf_dir), num_merges=12, max_words=50_000)

    def doc_bpe_tokens(sf_dir: str):
        """The encode side: trained merges broadcast to an actor pool
        with a per-actor word->tokens cache; per-doc token counts.
        Oracle re-derives the merges AND replays the encode in SQL."""
        from fluent_bit_ray.dataops import bpe_tokenize_counts, bpe_train
        m = bpe_train(_docs(sf_dir), num_merges=12, max_words=50_000)
        out = bpe_tokenize_counts(_docs(sf_dir), m["pair"].tolist()) \
            .to_pandas()[["doc_id", "n_bpe_tokens"]]
        out["doc_id"] = out["doc_id"].astype("int64")
        return out.sort_values("doc_id").reset_index(drop=True)

    def docs_bm25(sf_dir: str):
        """Integer-quantized BM25 top-20 for a fixed query bag — the
        ranked-retrieval upgrade of docs_keyword_topk: one stats pass
        (df + doc lengths, ≤ terms+1 partial rows per block), broadcast
        integer idf/avgdl, per-batch top-k partials; no shuffle
        (dataops/search.py:bm25_topk — every factor milli-scaled with
        floor division so the oracle replays it verbatim)."""
        from fluent_bit_ray.dataops import bm25_topk
        out = bm25_topk(_docs(sf_dir, columns=["doc_id", "text"]),
                        ["hash", "window", "spark", "zzzmissing"], k=20)
        out["doc_id"] = out["doc_id"].astype("int64")
        return out

    def docs_hybrid_search(sf_dir: str):
        """Two-stage retrieval: BM25 candidate top-50 (no shuffle) →
        embedding-cosine rerank against a fixed query vector
        (vec_id 7) — candidate ids broadcast, embeddings table
        streamed once with an isin filter, ≤50 rows reach the driver.
        Output = top-10 by cosine (search.py:hybrid_search_topk)."""
        import numpy as np

        from fluent_bit_ray.dataops import hybrid_search_topk
        import pyarrow.dataset as pads

        docs = _docs(sf_dir, columns=["doc_id", "text"])
        embs = _embs(sf_dir, columns=["vec_id", "embedding"])
        # one predicate-pushdown row read for the query vector — no
        # Dataset scan, no row UDF
        qrow = pads.dataset(
            f"{sf_dir.rstrip('/')}/embeddings.parquet").to_table(
            columns=["embedding"],
            filter=pads.field("vec_id") == 7)
        qvec = np.asarray(qrow["embedding"][0].as_py(), dtype=np.float64)
        out = hybrid_search_topk(
            docs, embs, ["hash", "window", "spark", "zzzmissing"], qvec,
            k_lex=50, k=10)
        out["cos_r4"] = np.round(out["cosine"], 4)
        out["doc_id"] = out["doc_id"].astype("int64")
        return out[["doc_id", "score", "cos_r4"]].reset_index(drop=True)

    def docs_segdedup(sf_dir: str):
        """C4-style keep-first cross-document segment dedup (10-word
        windows): first occurrence of each distinct segment survives,
        later occurrences are removed from their docs, emptied docs
        drop. ONE 24-byte-row hash exchange + broadcast drop list —
        text never transits (dataops/segdedup.py)."""
        from fluent_bit_ray.dataops import segment_dedup
        out = segment_dedup(_docs(sf_dir, columns=["doc_id", "text"]),
                            words=10).to_pandas()
        out = out[["doc_id", "text"]]
        out["doc_id"] = out["doc_id"].astype("int64")
        return out.sort_values("doc_id").reset_index(drop=True)

    def docs_split(sf_dir: str):
        """Deterministic train/val/test split (98/1/1): md5-bucket
        range per doc_id — no RNG, stateless batch map, identical at
        any parallelism and on resume (curation.py:hash_split)."""
        from fluent_bit_ray.dataops import hash_split
        out = hash_split(_docs(sf_dir, columns=["doc_id"]),
                         {"train": 98, "val": 1, "test": 1}).to_pandas()
        out = out[["doc_id", "split"]]
        out["doc_id"] = out["doc_id"].astype("int64")
        out["split"] = out["split"].astype(str)
        return out.sort_values("doc_id").reset_index(drop=True)

    def doc_contamination(sf_dir: str):
        """Graded decontamination: per-doc DISTINCT benchmark-gram hits,
        total distinct grams, and the integer contamination fraction
        (1000·hits)//grams — thresholdable overlap instead of a binary
        flag; same broadcast Bloom+searchsorted membership pass as
        doc_decontaminate."""
        from fluent_bit_ray.dataops import (benchmark_ngram_hashes,
                                            decontaminate)
        docs = _docs(sf_dir, columns=["doc_id", "text"])
        bench = docs.map_batches(
            lambda df: df[df["doc_id"] % 20 == 0], batch_format="pandas")
        bh = benchmark_ngram_hashes(bench, ngram=5)
        out = decontaminate(docs, bh, ngram=5).to_pandas()
        out["doc_id"] = out["doc_id"].astype("int64")
        out = out[["doc_id", "n_hits", "n_grams", "overlap_milli"]]
        return out.sort_values("doc_id").reset_index(drop=True)

    def docs_bpe_packed(sf_dir: str):
        """THE training-prep pipeline, composed end-to-end: BPE train
        (12 merges) → actor-pool tokenize (per-doc token counts) →
        greedy per-source sequence packing on the BPE counts (budget
        256). Only (source, doc_id, n_bpe_tokens) transits the packing
        exchange; the oracle re-derives the merges, replays the encode
        AND the packing recurrence in one SQL statement."""
        from fluent_bit_ray.dataops import (bpe_tokenize_counts,
                                            bpe_train, pack_sequences)
        docs = _docs(sf_dir, columns=["source", "doc_id", "text"])
        m = bpe_train(docs, num_merges=12, max_words=50_000)
        counts = bpe_tokenize_counts(docs, m["pair"].tolist())
        out = pack_sequences(counts, budget=256, group_col="source",
                             n_col="n_bpe_tokens").to_pandas()
        out["doc_id"] = out["doc_id"].astype("int64")
        out = out[["source", "doc_id", "n_bpe_tokens", "bin_idx"]]
        return out.sort_values(["source", "doc_id"]).reset_index(drop=True)

    def doc_chunks(sf_dir: str):
        """Fixed word-window chunking (window 32, stride 24): the
        flat-map that turns documents into training-sequence chunks."""
        from fluent_bit_ray.dataops import chunk_docs
        out = chunk_docs(_docs(sf_dir), window=32, stride=24).to_pandas()
        out["doc_id"] = out["doc_id"].astype("int64")
        out = out[["doc_id", "chunk_idx", "chunk_text", "n_words_chunk"]]
        return out.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)

    def doc_repetition(sf_dir: str):
        """Gopher-style repetition signals (duplicate-word fraction and
        top-2-gram fraction, in milli-units) — vectorized explode +
        factorize + groupby kernels."""
        from fluent_bit_ray.dataops import repetition_stats
        out = repetition_stats(_docs(sf_dir)).to_pandas()
        out["doc_id"] = out["doc_id"].astype("int64")
        out = out[["doc_id", "n_words", "dup_word_milli", "top2_milli"]]
        return out.sort_values("doc_id").reset_index(drop=True)

    def docs_curated(sf_dir: str):
        """The composed curation pipeline (exact dedup → benchmark
        decontamination → repetition/length gate → source mixing →
        sequence packing) — one streaming filter chain plus two
        broadcast artifacts; see dataops/curation.py:curate_corpus."""
        from fluent_bit_ray.dataops import curate_corpus
        weights = {f"src{i}": (100, 50, 30, 10)[i % 4] for i in range(64)}
        out = curate_corpus(_docs(sf_dir), weights, budget=128).to_pandas()
        out["doc_id"] = out["doc_id"].astype("int64")
        out = out[["source", "doc_id", "n_words", "bin_idx"]]
        return out.sort_values(["source", "doc_id"]).reset_index(drop=True)

    def doc_len_quantiles(sf_dir: str):
        """Exact per-source length-distribution quantiles over n_chars
        (histogram partials per batch; quantile = smallest value whose
        cumulative count ≥ ceil(q/1000·N), exact integers end to end)."""
        from fluent_bit_ray.dataops import column_quantiles
        out = column_quantiles(_docs(sf_dir), "n_chars",
                               group_col="source")
        for c in ("q_milli", "value", "n_le"):
            out[c] = out[c].astype("int64")
        return out.sort_values(["source", "q_milli"]).reset_index(drop=True)

    def docs_pack(sf_dir: str):
        """Greedy sequence packing per source (budget 128 words,
        doc_id order): only (source, doc_id, n_words) moves through the
        exchange; bins number per source."""
        from fluent_bit_ray.dataops import pack_sequences
        out = pack_sequences(_docs(sf_dir), budget=128).to_pandas()
        out["doc_id"] = out["doc_id"].astype("int64")
        out = out[["source", "doc_id", "n_words", "bin_idx"]]
        return out.sort_values(["source", "doc_id"]).reset_index(drop=True)

    # -- ua_enrich: browser counts over apache rows (regex-table lookup)
    def ua_browser_counts(sf_dir: str):
        routed = _routed(sf_dir, with_rewrite=False, with_enrich=True)
        import pyarrow as pa

        def partial(b: pa.Table) -> pa.Table:
            m = pa.compute.equal(b.column("parsed_by"), "apache")
            b = b.filter(m)
            df = pd.DataFrame({"browser": b.column("ua_browser").to_pylist()})
            g = df.groupby("browser", sort=False).size().reset_index(name="n")
            return pa.Table.from_pandas(g, preserve_index=False)

        from ray.data.aggregate import Sum
        agg = (routed.ds.map_batches(partial, batch_format="pyarrow")
               .groupby("browser").aggregate(Sum("n", alias_name="n")))
        out = agg.to_pandas()
        out["n"] = out["n"].astype("int64")
        return out.sort_values("browser").reset_index(drop=True)

    # ---------------- multiline join (tail multiline semantics)
    FIRSTLINE = r"^(\d|\{|CALL )"

    def multiline_segments(sf_dir: str):
        from fluent_bit_ray.stages import build_stage
        st = build_stage({"type": "multiline", "firstline": FIRSTLINE})
        out = st.apply(read_transcripts(sf_dir)).to_pandas()
        out["first_turn"] = out["first_turn"].astype("int64")
        out["n_parts"] = out["n_parts"].astype("int64")
        out = out[["conv_id", "first_turn", "n_parts", "text"]]
        return out.sort_values(["conv_id", "first_turn"]).reset_index(drop=True)

    def multiline_chunked(sf_dir: str):
        """Same semantics as multiline_segments but with hot-key
        chunk-splitting FORCED at gate scale (chunk_rows=2048: the
        Zipf-head conv at sf0.01 has ~6k turns → 3 ordered chunks +
        boundary merge). Hash-matching multiline_segments' oracle
        proves the chunk decomposition is lossless."""
        from fluent_bit_ray.stages import build_stage
        st = build_stage({"type": "multiline", "firstline": FIRSTLINE,
                          "chunk_rows": 2048})
        out = st.apply(read_transcripts(sf_dir)).to_pandas()
        out["first_turn"] = out["first_turn"].astype("int64")
        out["n_parts"] = out["n_parts"].astype("int64")
        out = out[["conv_id", "first_turn", "n_parts", "text"]]
        return out.sort_values(["conv_id", "first_turn"]).reset_index(drop=True)

    def multiline_segments_gap(sf_dir: str):
        """Multiline with the event-time flush-timeout rule: rows whose
        turn_idx % 7 == 3 arrive 10 s late (synthetic quiet period);
        a gap > 5 s closes the open buffer (tail_multiline.c Flush_MS
        analogue), so the late row starts a fresh segment / is solo."""
        import pyarrow as pa

        from fluent_bit_ray.stages import build_stage

        def inflate(b: pa.Table) -> pa.Table:
            ts = b.column("ts").cast(pa.timestamp("ns")).cast(pa.int64()) \
                .to_numpy()
            ti = b.column("turn_idx").to_numpy(zero_copy_only=False) \
                .astype("int64")
            ts2 = ts + np.where(ti % 7 == 3, 10_000_000_000, 0)
            return b.append_column(
                "ts2", pa.array(ts2).cast(pa.timestamp("ns")))

        ds = read_transcripts(sf_dir).map_batches(inflate,
                                                  batch_format="pyarrow")
        st = build_stage({"type": "multiline", "firstline": FIRSTLINE,
                          "flush_gap_s": 5, "ts_col": "ts2"})
        out = st.apply(ds).to_pandas()
        out["first_turn"] = out["first_turn"].astype("int64")
        out["n_parts"] = out["n_parts"].astype("int64")
        out = out[["conv_id", "first_turn", "n_parts", "text"]]
        return out.sort_values(["conv_id", "first_turn"]).reset_index(drop=True)

    def multiline_parsed(sf_dir: str):
        """Multiline with CONTINUATION PARSERS (tail_multiline.c:41
        ``mult_parsers``, :336-353 first-success loop, :436-512 flush
        merge): logfmt/ltsv continuation lines are parsed and their
        fields merged into the open segment's map (later lines
        overwrite), leaving the text join; free-text lines still
        append. Exposes merged level/msg/tool/code_s for the oracle."""
        from fluent_bit_ray.parsers.core import RegexParser
        from fluent_bit_ray.record import fields_loads
        from fluent_bit_ray.stages import build_stage

        lf = RegexParser("cont_logfmt", _ML_LOGFMT_PAT)
        lt = RegexParser("cont_ltsv", _ML_LTSV_PAT)
        st = build_stage({"type": "multiline", "firstline": FIRSTLINE,
                          "cont_parsers": [lf, lt]})
        out = st.apply(read_transcripts(sf_dir)).to_pandas()
        fj = out["fields"].map(fields_loads)
        for col, k in (("level", "level"), ("msg", "msg"),
                       ("tool", "tool"), ("code_s", "code")):
            out[col] = fj.map(lambda d, k=k: d.get(k, ""))
        out["first_turn"] = out["first_turn"].astype("int64")
        out["n_parts"] = out["n_parts"].astype("int64")
        out = out[["conv_id", "first_turn", "n_parts", "text",
                   "level", "msg", "tool", "code_s"]]
        return out.sort_values(["conv_id", "first_turn"]).reset_index(drop=True)

    # ---------------- SP SQL subset (tumbling count per role)
    def sp_count_window(sf_dir: str):
        from fluent_bit_ray.sp import sp_execute
        routed = _routed(sf_dir, with_rewrite=False, with_enrich=False)
        res = sp_execute(routed.ds,
                         "SELECT role, COUNT(*) AS n FROM TAG:'transcript.*' "
                         "WHERE p_code = 200 WINDOW TUMBLING (60 SECOND) "
                         "GROUP BY role")
        res["n"] = res["n"].astype("int64")
        res["window_start"] = res["window_start"].astype("datetime64[us]")
        return res.sort_values(["role", "window_start"]).reset_index(drop=True)

    def sp_limit(sf_dir: str):
        """SP LIMIT on a plain SELECT (reference sql.y:435-439
        flb_sp_cmd_limit_add): first 500 rows under the engine's
        deterministic order contract (sorted by all output columns)."""
        from fluent_bit_ray.sp import sp_execute
        routed = _routed(sf_dir, with_rewrite=False, with_enrich=False)
        out = sp_execute(
            routed.ds,
            "SELECT conv_id, turn_idx FROM TAG:'transcript.*' "
            "WHERE p_code = 200 LIMIT 500").to_pandas()
        out["turn_idx"] = out["turn_idx"].astype("int64")
        return out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)

    # ---------------- SP snapshot create + flush (buffered side stream)
    def sp_snapshot_flush(sf_dir: str):
        from fluent_bit_ray.sp import sp_execute, sp_snapshot
        routed = _routed(sf_dir, with_rewrite=False, with_enrich=False)
        snaps: dict = {}
        sp_snapshot(routed.ds,
                    "CREATE SNAPSHOT snap AS SELECT * "
                    "FROM TAG:'transcript.*'", snaps)
        flushed = sp_snapshot(None,
                              "FLUSH SNAPSHOT snap AS SELECT * "
                              "FROM STREAM:snap WHERE role = 'tool'",
                              snaps)
        out = sp_execute(flushed,
                         "SELECT conv_id, turn_idx, text "
                         "FROM TAG:'transcript.*'").to_pandas()
        out["turn_idx"] = out["turn_idx"].astype("int32")
        return out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)

    # ---------------- SP FORECAST (linear regression over the stream)
    def sp_forecast(sf_dir: str):
        from fluent_bit_ray.sp import sp_execute
        routed = _routed(sf_dir, with_rewrite=False, with_enrich=False)
        res = sp_execute(
            routed.ds,
            "SELECT role, FORECAST(RECORD_TIME(), dur, 600) AS f "
            "FROM TAG:'transcript.*' WHERE code = 200 GROUP BY role")
        # forecast is a real; both sides round to milli-units so float
        # addition-order ulps cannot flip the integer (boundary
        # probability ~1e-12)
        res["f_milli"] = (res["f"] * 1000).round().astype("int64")
        res = res[["role", "f_milli"]]
        return res.sort_values("role").reset_index(drop=True)

    # ---------------- SP hopping window (overlapping event-time buckets)
    def sp_hopping(sf_dir: str):
        from fluent_bit_ray.sp import sp_execute
        routed = _routed(sf_dir, with_rewrite=False, with_enrich=False)
        res = sp_execute(
            routed.ds,
            "SELECT role, COUNT(*) AS n FROM TAG:'transcript.*' "
            "WHERE code = 200 "
            "WINDOW HOPPING (120 SECOND, ADVANCE BY 60 SECOND) "
            "GROUP BY role")
        res["n"] = res["n"].astype("int64")
        res["window_start"] = res["window_start"].astype("datetime64[us]")
        res = res[["role", "window_start", "n"]]
        return res.sort_values(["role", "window_start"]).reset_index(drop=True)

    # ---------------- SP arithmetic expressions (SELECT/WHERE arith)
    def sp_arith(sf_dir: str):
        from fluent_bit_ray.sp import sp_execute
        routed = _routed(sf_dir, with_rewrite=False, with_enrich=False)
        res = sp_execute(
            routed.ds,
            "SELECT role, COUNT(*) AS n, SUM(code * 2 + turn_idx) AS load_i "
            "FROM TAG:'transcript.*' "
            "WHERE code * 2 < 900 AND dur * 2 > 1 GROUP BY role")
        res["n"] = res["n"].astype("int64")
        # per-row values are exact ints (code·2 + turn_idx) → float sum
        # is exact well below 2^53; cast restores the BIGINT the oracle
        # computes
        res["load_i"] = res["load_i"].round().astype("int64")
        return res.sort_values("role").reset_index(drop=True)

    def sp_contains(sf_dir: str):
        """Reference record functions in WHERE (sql.y:535-544):
        @RECORD.CONTAINS(key) presence test composed with a TIME()
        lower bound (epoch-seconds double, flb_sp_func_record.c)."""
        from fluent_bit_ray.sp import sp_execute
        routed = _routed(sf_dir, with_rewrite=False, with_enrich=False)
        res = sp_execute(
            routed.ds,
            "SELECT role, COUNT(*) AS n FROM TAG:'transcript.*' "
            "WHERE @RECORD.CONTAINS(level) AND @RECORD.TIME() >= 1 "
            "GROUP BY role")
        res["n"] = res["n"].astype("int64")
        return res.sort_values("role").reset_index(drop=True)

    # ---------------- throttle / throttle_size (event-time determinized)
    def throttle_kept(sf_dir: str):
        from fluent_bit_ray.stages import build_stage
        st = build_stage({"type": "throttle", "rate": 5, "interval_s": 60})
        out = st.apply(read_transcripts(sf_dir)).to_pandas()
        out = out[["conv_id", "turn_idx"]]
        out["turn_idx"] = out["turn_idx"].astype("int32")
        return out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)

    def throttle_size_kept(sf_dir: str):
        from fluent_bit_ray.stages import build_stage
        st = build_stage({"type": "throttle_size", "limit_bytes": 2000,
                          "interval_s": 60, "name_field": "role"})
        out = st.apply(read_transcripts(sf_dir)).to_pandas()
        out = out[["conv_id", "turn_idx"]]
        out["turn_idx"] = out["turn_idx"].astype("int32")
        return out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)

    # ---------------- conv-level stats: skew-safe two-stage aggregation.
    # conv_id is Zipf-skewed (conv-000000 holds ~9% of rows); a naive
    # groupby(conv_id) ships every hot-key row to one reducer. The
    # per-batch partial groupby below collapses each conv to ONE row per
    # block before the shuffle — the pre-aggregation/salting pattern.
    def conv_stats(sf_dir: str):
        import pyarrow as pa

        def partial(b: pa.Table) -> pa.Table:
            df = pd.DataFrame({
                "conv_id": b.column("conv_id").to_pylist(),
                "turn_idx": b.column("turn_idx").to_numpy(zero_copy_only=False),
                "ts": b.column("ts").cast(pa.timestamp("ns")).cast(pa.int64())
                      .to_numpy(),
            })
            g = df.groupby("conv_id", sort=False).agg(
                n_turns=("turn_idx", "size"),
                max_turn=("turn_idx", "max"),
                first_ts=("ts", "min"), last_ts=("ts", "max")).reset_index()
            return pa.Table.from_pandas(g, preserve_index=False)

        from ray.data.aggregate import Max, Min, Sum
        agg = (read_transcripts(sf_dir)
               .map_batches(partial, batch_format="pyarrow")
               .groupby("conv_id")
               .aggregate(Sum("n_turns", alias_name="n_turns"),
                          Max("max_turn", alias_name="max_turn"),
                          Min("first_ts", alias_name="first_ts"),
                          Max("last_ts", alias_name="last_ts")))
        out = agg.to_pandas()
        out["n_turns"] = out["n_turns"].astype("int64")
        out["max_turn"] = out["max_turn"].astype("int64")
        out["first_ts"] = pd.to_datetime(out["first_ts"]).astype("datetime64[us]")
        out["last_ts"] = pd.to_datetime(out["last_ts"]).astype("datetime64[us]")
        return out.sort_values("conv_id").reset_index(drop=True)

    # ---------------- stable (conv_id, turn_idx) ordering of the hot conv
    def hot_conversation(sf_dir: str):
        ds = read_transcripts(sf_dir)
        import pyarrow as pa

        def pick(b: pa.Table) -> pa.Table:
            m = pa.compute.equal(b.column("conv_id"), "conv-000000")
            return b.filter(m).select(["conv_id", "turn_idx", "role", "text"])

        out = ds.map_batches(pick, batch_format="pyarrow").to_pandas()
        return out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)

    # ---------------- classic-config surface: the flagship chain built
    # from a fluent-bit .conf + parsers.conf pair (config.build_pipeline
    # translation of [FILTER]/[OUTPUT] sections); the per-sink counts
    # must match the hand-built pipeline's oracle exactly
    def config_route_counts(sf_dir: str):
        from fluent_bit_ray.pipelines.flagship import \
            build_flagship_from_config
        got = build_flagship_from_config().run(
            read_transcripts(sf_dir)).sink_counts()
        return pd.DataFrame(
            {"sink": sorted(got), "n": [got[k] for k in sorted(got)]})

    # grep filter driven ENTIRELY by config text: exclude fires before
    # the keep rule (ordered short-circuit, filter_grep/grep.c:148-175)
    def config_grep_rows(sf_dir: str):
        from fluent_bit_ray.config import build_pipeline
        conf = (
            "[FILTER]\n"
            "    name grep\n"
            "    match *\n"
            "    Exclude role system\n"
            "    Regex   text error\n"
            "[OUTPUT]\n"
            "    name null\n"
            "    match *\n"
        )
        pipe, _ = build_pipeline(conf)
        import pyarrow as pa

        def project(b: pa.Table) -> pa.Table:
            return b.select(["conv_id", "turn_idx", "role"])

        out = pipe.run(read_transcripts(sf_dir)).ds \
            .map_batches(project, batch_format="pyarrow").to_pandas()
        return out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)

    # Registry ORDER matters: the driver's correctness gate checks the
    # FIRST 50 entries only.  The leading block holds the 19 queries
    # that (through round 4) had only judge/local verification, so the
    # round-5 driver snapshot captures them; previously-driver-green
    # queries follow (they stay in the local dual-scale gate,
    # tools/check_correctness.py, which runs all of them).
    return {
        # --- never-driver-checked through r4 (VERDICT r4 item 1) ---
        "conv_rendered": conv_rendered,
        "convs_curated": convs_curated,
        "convs_curated_chunked": convs_curated_chunked,
        "doc_chunks": doc_chunks,
        "doc_decontaminate": doc_decontaminate,
        "doc_len_quantiles": doc_len_quantiles,
        "doc_repetition": doc_repetition,
        "docs_curated": docs_curated,
        "docs_pack": docs_pack,
        "docs_sample_mix": docs_sample_mix,
        "docs_sampled": docs_sampled,
        "emb_cluster_sample": emb_cluster_sample,
        "emb_semantic_dup": emb_semantic_dup,
        "multiline_chunked": multiline_chunked,
        "multiline_parsed": multiline_parsed,
        "sp_contains": sp_contains,
        "sp_limit": sp_limit,
        "collapsed_repeats_chunked": collapsed_repeats_chunked,
        "turn_gaps_chunked": turn_gaps_chunked,
        # --- new in r5 (reference-emitting variants; no driver rows yet) ---
        "collapsed_repeats_refs": collapsed_repeats_refs,
        "convs_curated_refs": convs_curated_refs,
        "convs_curated_refs_chunked": convs_curated_refs_chunked,
        "convs_curated_packed": convs_curated_packed,
        "docs_normalized": docs_normalized,
        "docs_shuffled": docs_shuffled,
        "bpe_merges": bpe_merges,
        "doc_bpe_tokens": doc_bpe_tokens,
        # --- new in round-5 session 3 (never driver-checked) ---
        "docs_bm25": docs_bm25,
        "docs_segdedup": docs_segdedup,
        "docs_split": docs_split,
        "doc_contamination": doc_contamination,
        "docs_bpe_packed": docs_bpe_packed,
        "docs_hybrid_search": docs_hybrid_search,
        # --- driver-green in earlier rounds (fills the 50-slot gate) ---
        "config_grep_rows": config_grep_rows,
        "config_route_counts": config_route_counts,
        "route_counts": route_counts,
        "conv_stats": conv_stats,
        "hot_conversation": hot_conversation,
        "routed_rows_tool": routed_rows_tool,
        "flowcounter_minute": flowcounter_minute,
        "parse_toolcalls": parse_toolcalls,
        "grep_error_rows": grep_error_rows,
        "enrich_tool_categories": enrich_tool_categories,
        "sp_window_tumbling": sp_window_tumbling,
        "events_flowcounter": events_flowcounter,
        "lineitem_pricing": lineitem_pricing,
        "revenue_by_nation": revenue_by_nation,
        "top_customers_returns": top_customers_returns,
        "event_sessions": event_sessions,
        "events_rolling": events_rolling,
        "events_rank": events_rank,
        "events_rolling_minmax": events_rolling_minmax,
        "events_cum_spend": events_cum_spend,
        "events_rolling_time": events_rolling_time,
        "events_pivot": events_pivot,
        "turn_gaps": turn_gaps,
        "modify_rename_msg": modify_rename_msg,
        "nested_log_seq": nested_log_seq,
        "dedup_exact_transcripts": dedup_exact_transcripts,
        "dedup_exact_docs": dedup_exact_docs,
        "doc_token_counts": doc_token_counts,
        "doc_quality": doc_quality,
        "doc_langid": doc_langid,
        "doc_fingerprint": doc_fingerprint,
        "doc_simhash": doc_simhash,
        "docs_simhash_pairs": docs_simhash_pairs,
        "docs_minhash_pairs": docs_minhash_pairs,
        "docs_dup_ngram_spans": docs_dup_ngram_spans,
        "docs_dup_span_ranges": docs_dup_span_ranges,
        "docs_dup_removed": docs_dup_removed,
        "docs_jaccard_pairs": docs_jaccard_pairs,
        "docs_dedup_keep": docs_dedup_keep,
        "emb_dup_pairs": emb_dup_pairs,
        "ann_topk": ann_topk,
        "ann_topk_ivf": ann_topk_ivf,
        "docs_stratified": docs_stratified,
        "events_user_hll": events_user_hll,
        "events_user_cms": events_user_cms,
        "sft_pairs": sft_pairs,
        "sft_refs": sft_refs,
        "sft_refs_rendered": sft_refs_rendered,
        "wide_parsed": wide_parsed,
        "collapsed_repeats": collapsed_repeats,
        "tool_transition_counts": tool_transition_counts,
        "docs_topk_per_source": docs_topk_per_source,
        "emb_kmeans": emb_kmeans,
        "orders_enriched": orders_enriched,
        "orders_semi_negbal": orders_semi_negbal,
        "purchase_asof_view": purchase_asof_view,
        "purchase_in_error_window": purchase_in_error_window,
        "docs_src_bjoin": docs_src_bjoin,
        "tf_score": tf_score,
        "doc_redact": doc_redact,
        "vocab_top": vocab_top,
        "doc_lm_score": doc_lm_score,
        "doc_quality_model": doc_quality_model,
        "docs_keyword_topk": docs_keyword_topk,
        "boilerplate_removed": boilerplate_removed,
        "conv_gated": conv_gated,
        "ua_browser_counts": ua_browser_counts,
        "multiline_segments": multiline_segments,
        "multiline_segments_gap": multiline_segments_gap,
        "sp_count_window": sp_count_window,
        "sp_hopping": sp_hopping,
        "sp_arith": sp_arith,
        "sp_snapshot_flush": sp_snapshot_flush,
        "sp_forecast": sp_forecast,
        "throttle_kept": throttle_kept,
        "throttle_size_kept": throttle_size_kept,
    }


# ------------------------------------------------------------ oracle SQL
def _h64_sql(md5_expr: str) -> str:
    """SQL for dataops.dedup._h64: little-endian 64-bit md5 prefix as
    UBIGINT. ``md5_expr`` is a SQL expression yielding the md5 hex."""
    le = "||".join(f"substr({md5_expr},{i},2)"
                   for i in (15, 13, 11, 9, 7, 5, 3, 1))
    return f"('0x' || {le})::UBIGINT"


def _dup_gram_cte(k: int, min_docs: int) -> str:
    """dataops/substring.py's gram pass replayed in SQL: same \\S+
    tokens, same h64-mod-M token hashes, the SAME k-term mulmod
    rolling hash (each (h·Bʲ) % M term < 2⁶² fits BIGINT; the k-term
    sum < 2³⁴ before the final mod), LEAD window per doc. Yields CTEs
    ``tok(doc_id, tk, pos)``, ``q(doc_id, pos, gram_h)`` and
    ``dupq(doc_id, pos)`` (the flagged positions: gram seen in ≥
    min_docs distinct docs)."""
    from fluent_bit_ray.dataops.substring import NGRAM_B, NGRAM_M
    h = _h64_sql("md5(tk)")
    terms = []
    for j in range(k):
        bp = pow(NGRAM_B, k - 1 - j, NGRAM_M)
        col = "h" if j == 0 else f"lead(h, {j}) OVER w"
        terms.append(f"(({col}) * {bp}) % {NGRAM_M}")
    return f"""
        tok AS (
          SELECT doc_id,
                 unnest(regexp_extract_all(text, '\\S+')) AS tk,
                 generate_subscripts(regexp_extract_all(text, '\\S+'), 1)
                   - 1 AS pos
          FROM documents),
        th AS (SELECT doc_id, pos,
                      CAST({h} % {NGRAM_M} AS BIGINT) AS h FROM tok),
        gh AS (SELECT doc_id, pos,
                      ({' + '.join(terms)}) % {NGRAM_M} AS gram_h,
                      lead(h, {k - 1}) OVER w IS NOT NULL AS ok
               FROM th
               WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
        q AS (SELECT doc_id, pos, gram_h FROM gh WHERE ok),
        cnt AS (SELECT gram_h,
                       count(DISTINCT doc_id)::BIGINT AS n_docs
                FROM q GROUP BY gram_h),
        dupq AS (SELECT q.doc_id, q.pos FROM q JOIN cnt USING (gram_h)
                 WHERE cnt.n_docs >= {min_docs})"""


def _dup_ngram_oracle_sql(k: int = 8, min_docs: int = 2) -> str:
    return f"""
        WITH {_dup_gram_cte(k, min_docs)}
        SELECT q.doc_id, q.pos, q.gram_h::BIGINT AS gram_h, cnt.n_docs
        FROM q JOIN cnt USING (gram_h)
        WHERE cnt.n_docs >= {min_docs}
        ORDER BY q.doc_id, q.pos, gram_h
    """


def _dup_span_ranges_oracle_sql(k: int = 8, min_docs: int = 2) -> str:
    """dataops/substring.py:dup_span_ranges in SQL: gaps-and-islands
    over the flagged positions — consecutive positions with gap ≤ k
    merge (their [pos, pos+k) token covers overlap or touch)."""
    return f"""
        WITH {_dup_gram_cte(k, min_docs)},
        brk AS (SELECT doc_id, pos,
                       CASE WHEN pos - lag(pos) OVER
                              (PARTITION BY doc_id ORDER BY pos) <= {k}
                            THEN 0 ELSE 1 END AS b
                FROM dupq),
        isl AS (SELECT doc_id, pos,
                       sum(b) OVER (PARTITION BY doc_id ORDER BY pos)
                         AS sid
                FROM brk)
        SELECT doc_id, min(pos)::BIGINT AS span_start,
               (max(pos) + {k})::BIGINT AS span_end,
               (max(pos) + {k} - min(pos))::BIGINT AS n_tokens
        FROM isl GROUP BY doc_id, sid
        ORDER BY doc_id, span_start
    """


def _dup_removed_oracle_sql(k: int = 8, min_docs: int = 2) -> str:
    """dataops/substring.py:remove_dup_ngram_spans in SQL: each
    flagged position covers tokens [pos, pos+k); kept tokens are
    re-joined with single spaces (the operator's documented
    whitespace-normalizing contract)."""
    return f"""
        WITH {_dup_gram_cte(k, min_docs)},
        cov AS (SELECT DISTINCT doc_id, pos + j.j AS cp
                FROM dupq CROSS JOIN
                     (SELECT unnest(range({k})) AS j) j),
        kept AS (SELECT t.doc_id, t.pos, t.tk
                 FROM tok t LEFT JOIN cov c
                   ON c.doc_id = t.doc_id AND c.cp = t.pos
                 WHERE c.cp IS NULL),
        agg AS (SELECT doc_id,
                       string_agg(tk, ' ' ORDER BY pos) AS clean_text
                FROM kept GROUP BY doc_id),
        rem AS (SELECT doc_id, count(*)::BIGINT AS n_removed
                FROM cov GROUP BY doc_id),
        brk AS (SELECT doc_id, pos,
                       CASE WHEN pos - lag(pos) OVER
                              (PARTITION BY doc_id ORDER BY pos) <= {k}
                            THEN 0 ELSE 1 END AS b
                FROM dupq),
        isl AS (SELECT doc_id,
                       sum(b) OVER (PARTITION BY doc_id ORDER BY pos)
                         AS sid
                FROM brk),
        sp AS (SELECT doc_id, count(DISTINCT sid)::BIGINT AS n_spans
               FROM isl GROUP BY doc_id)
        SELECT d.doc_id, COALESCE(agg.clean_text, '') AS clean_text,
               COALESCE(rem.n_removed, 0)::BIGINT AS n_removed,
               COALESCE(sp.n_spans, 0)::BIGINT AS n_spans
        FROM documents d
        LEFT JOIN agg USING (doc_id)
        LEFT JOIN rem USING (doc_id)
        LEFT JOIN sp USING (doc_id)
        ORDER BY d.doc_id
    """


def _minhash_oracle_sql() -> str:
    """The engine's MinHash-LSH near-dup pipeline written in DuckDB SQL
    (see fluent_bit_ray/dataops/dedup.py): same shingles, same md5
    64-bit hashes, same permutation constants, same banding, same
    integer-exact verification."""
    from fluent_bit_ray.dataops.dedup import _perm_params
    a, b = _perm_params(64)
    params_rows = ",".join(f"({k},{int(a[k])},{int(b[k])})"
                           for k in range(64))
    le = "||".join(f"substr(md5(s),{i},2)" for i in (15, 13, 11, 9, 7, 5, 3, 1))
    return rf"""
        WITH params(k, a, b) AS (VALUES {params_rows}),
        words AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS ws
                  FROM documents),
        sh AS (SELECT doc_id,
                CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
                ELSE list_distinct(list_transform(range(1, len(ws) - 1),
                     i -> array_to_string(ws[i:i+2], ' '))) END AS shingles
               FROM words),
        shx AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
        hh AS (SELECT doc_id, ('0x' || {le})::UBIGINT::HUGEINT AS h
               FROM shx),
        sig AS (SELECT doc_id, p.k,
                 min(((p.a * hh.h) % CAST(18446744073709551616 AS HUGEINT)
                      + p.b) % CAST(18446744073709551616 AS HUGEINT)
                     % CAST(2305843009213693951 AS HUGEINT)) AS mh
                FROM hh, params p GROUP BY doc_id, p.k),
        bands AS (SELECT doc_id, k // 4 AS band,
                   list(mh ORDER BY k) AS sig_slice
                  FROM sig GROUP BY doc_id, k // 4),
        cand AS (SELECT DISTINCT b1.doc_id AS key_a, b2.doc_id AS key_b
                 FROM bands b1 JOIN bands b2
                   ON b1.band = b2.band AND b1.sig_slice = b2.sig_slice
                      AND b1.doc_id < b2.doc_id),
        verified AS (
          SELECT c.key_a, c.key_b,
                 len(list_intersect(sa.shingles, sb.shingles))::BIGINT
                   AS inter,
                 (len(sa.shingles) + len(sb.shingles)
                   - len(list_intersect(sa.shingles, sb.shingles)))::BIGINT
                   AS uni
          FROM cand c JOIN sh sa ON sa.doc_id = c.key_a
                      JOIN sh sb ON sb.doc_id = c.key_b)
        SELECT key_a, key_b, inter, uni FROM verified
        WHERE inter * 10 >= uni * 7 ORDER BY key_a, key_b
    """


def _redact_oracle_sql(t: str) -> str:
    """The engine's ordered PII pattern chain (dataops/redact.py
    PII_PATTERNS — identical strings) as chained regexp_replace CTEs;
    counts measured on each step's INPUT text, exactly like the
    engine's sequential count-then-replace."""
    from fluent_bit_ray.dataops.redact import PII_PATTERNS
    sql = (f"WITH t AS ({t}),\n"
           "s0 AS (SELECT conv_id, turn_idx, text AS cur,"
           " 0::BIGINT AS n FROM t)")
    for i, (_name, pat, repl) in enumerate(PII_PATTERNS):
        sql += (f",\ns{i + 1} AS (SELECT conv_id, turn_idx, "
                f"regexp_replace(cur, '{pat}', '{repl}', 'g') AS cur, "
                f"n + len(regexp_extract_all(cur, '{pat}'))::BIGINT AS n "
                f"FROM s{i})")
    sql += (f"\nSELECT conv_id, turn_idx, cur AS text_redacted, "
            f"n AS n_redactions FROM s{len(PII_PATTERNS)} "
            "ORDER BY conv_id, turn_idx")
    return sql


def _hll_oracle() -> str:
    from fluent_bit_ray.dataops.sketch import hll_oracle_sql
    return hll_oracle_sql("user_id", "events", "event_type",
                          _h64_sql, p=12)


def _cms_oracle() -> str:
    from fluent_bit_ray.dataops.sketch import cms_oracle_sql
    return cms_oracle_sql("user_id", "events", _h64_sql,
                          depth=4, width=1024)


def _kmeans_oracle() -> str:
    from fluent_bit_ray.dataops.cluster import kmeans_oracle_sql
    return kmeans_oracle_sql(k=8, iters=2)


def _cluster_sample_oracle(n: int = 4) -> str:
    """cluster_balanced_sample replayed in SQL: the full k-means
    assignment (kmeans_oracle_sql, bit-exact) filtered to the n
    smallest h64(md5(vec_id)) rows per cluster — the same
    deterministic quota rule as curation.stratified_sample."""
    from fluent_bit_ray.dataops.cluster import kmeans_oracle_sql
    base = kmeans_oracle_sql(k=8, iters=2)
    body, _, _ = base.rpartition("ORDER BY vec_id")
    h = _h64_sql("md5(CAST(vec_id AS VARCHAR))")
    return f"""
        SELECT vec_id, cluster, dist FROM (
          SELECT vec_id, cluster, dist,
                 row_number() OVER (PARTITION BY cluster
                                    ORDER BY {h}, vec_id) AS rk
          FROM ({body})) WHERE rk <= {n}
        ORDER BY vec_id
    """


def _quality_model_oracle() -> str:
    """dataops/classifier.py replayed in SQL: same \\S+ tokens, same
    md5-h64 % 256 buckets, the same seed-derived integer weights
    inlined as VALUES; score = tf-weighted sum, keep = score >= 0."""
    from fluent_bit_ray.dataops.classifier import N_BUCKETS, model_weights
    w = model_weights()
    vals = ",".join(f"({b},{int(w[b])})" for b in range(N_BUCKETS))
    return f"""
        WITH w(b, wt) AS (VALUES {vals}),
        tok AS (SELECT doc_id,
                       unnest(regexp_extract_all(text, '\\S+')) AS tk
                FROM documents),
        sc AS (SELECT doc_id, sum(w.wt)::BIGINT AS score
               FROM tok JOIN w
                 ON CAST({_h64_sql('md5(tk)')} % {N_BUCKETS} AS BIGINT) = w.b
               GROUP BY doc_id)
        SELECT d.doc_id, COALESCE(sc.score, 0)::BIGINT AS score,
               (COALESCE(sc.score, 0) >= 0) AS keep
        FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id
        ORDER BY d.doc_id
    """


def _semantic_dedup_oracle() -> str:
    from fluent_bit_ray.dataops.cluster import semantic_dedup_oracle_sql
    return semantic_dedup_oracle_sql(k=8, iters=1, thr_milli=300)


def _tf_oracle_sql() -> str:
    """The tensorflow stage's deterministic integer MLP
    (stages/tensorflow.py FixedMlp, seed 2024) re-run in DuckDB SQL:
    quantize → hidden = relu(x@W1+b1) → out = h@W2+b2, all BIGINT
    arithmetic, so the engine/oracle match is exact (no float sums)."""
    from fluent_bit_ray.stages.tensorflow import FixedMlp
    m = FixedMlp(64)
    w1 = ",".join(f"({i},{j},{int(m.w1[i, j])})"
                  for i in range(64) for j in range(8))
    b1 = ",".join(f"({j},{int(m.b1[j])})" for j in range(8))
    w2 = ",".join(f"({j},{k},{int(m.w2[j, k])})"
                  for j in range(8) for k in range(2))
    b2 = ",".join(f"({k},{int(m.b2[k])})" for k in range(2))
    return f"""
        WITH w1(i, j, w) AS (VALUES {w1}),
        b1(j, b) AS (VALUES {b1}),
        w2(j, k, w) AS (VALUES {w2}),
        b2(k, b) AS (VALUES {b2}),
        qq AS (SELECT vec_id,
                      unnest(range(len(embedding))) AS i,
                      CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 128.0
                                 + 0.5) AS BIGINT) AS x
               FROM embeddings),
        h AS (SELECT qq.vec_id, w1.j, sum(qq.x * w1.w) AS s
              FROM qq JOIN w1 ON w1.i = qq.i GROUP BY qq.vec_id, w1.j),
        hr AS (SELECT h.vec_id, h.j, greatest(0, h.s + b1.b) AS v
               FROM h JOIN b1 ON b1.j = h.j),
        o AS (SELECT hr.vec_id, w2.k, sum(hr.v * w2.w) AS s
              FROM hr JOIN w2 ON w2.j = hr.j GROUP BY hr.vec_id, w2.k),
        fin AS (SELECT o.vec_id, o.k, o.s + b2.b AS val
                FROM o JOIN b2 ON b2.k = o.k)
        SELECT vec_id,
               max(CASE WHEN k = 0 THEN val END)::BIGINT AS tf0,
               max(CASE WHEN k = 1 THEN val END)::BIGINT AS tf1
        FROM fin GROUP BY vec_id ORDER BY vec_id
    """


# integer-quantized BM25 CTE chain (search.py:bm25_topk replayed in SQL)
# — shared by the docs_bm25 and docs_hybrid_search oracles so the
# formula can never drift between them
_BM25_CTES = r"""w AS (SELECT doc_id,
                      unnest(regexp_extract_all(text, '\S+')) AS token
               FROM documents),
    dl AS (SELECT doc_id,
                  len(regexp_extract_all(text, '\S+'))::BIGINT AS dl
           FROM documents),
    stats AS (SELECT count(*)::BIGINT AS n,
                     greatest((1000*sum(dl))//count(*), 1) AS avgdl_m
              FROM dl),
    q AS (SELECT unnest(['hash','window','spark','zzzmissing']) AS term),
    dfreq AS (SELECT token, count(DISTINCT doc_id)::BIGINT AS df
              FROM w WHERE token IN (SELECT term FROM q)
              GROUP BY token),
    idf AS (SELECT token, (1000*(s.n - df + 1))//(df + 1) AS idf_m
            FROM dfreq, stats s),
    tf AS (SELECT doc_id, token, count(*)::BIGINT AS tf
           FROM w WHERE token IN (SELECT term FROM q)
           GROUP BY doc_id, token),
    contrib AS (SELECT tf.doc_id,
        idf.idf_m * ((tf.tf*2200000)
          // (tf.tf*1000
              + (1200*(1000-750+(750*dl.dl*1000)//s.avgdl_m))//1000)) AS c
        FROM tf JOIN idf USING (token) JOIN dl USING (doc_id), stats s),
    sc AS (SELECT doc_id, sum(c)::BIGINT AS score
           FROM contrib GROUP BY doc_id)"""


def oracle_sql() -> dict[str, str]:
    from fluent_bit_ray.dataops.bpe import (bpe_tokenize_sql,
                                            bpe_train_sql)
    from fluent_bit_ray.sources.dims import ensure_dim

    t = _transcripts_cte(SF_ORACLE_DIR)
    dim_tools = ensure_dim("dim_tools")

    route_counts_sql = f"""
            WITH t AS ({t}),
            alerts AS (SELECT * FROM t WHERE level IN ('error','warn'))
            SELECT * FROM (
              SELECT 'alerts' AS sink, count(*)::BIGINT AS n FROM alerts
              UNION ALL
              SELECT 'all', (SELECT count(*) FROM t) + (SELECT count(*) FROM alerts)
              UNION ALL
              SELECT 'assistant',
                (SELECT count(*) FROM t WHERE role = 'assistant')
                + (SELECT count(*) FROM alerts WHERE role = 'assistant')
              UNION ALL
              SELECT 'tool_sink', (SELECT count(*) FROM t WHERE role = 'tool')
            ) ORDER BY sink
        """

    sqls = {
        # the config-built pipeline must reproduce the same routing
        # truth table as the hand-built flagship chain
        "config_route_counts": route_counts_sql,
        # config-text grep: Exclude role system (match→drop), then
        # Regex text error (no-match→drop, match→keep)
        "config_grep_rows": f"""
            WITH t AS ({t})
            SELECT conv_id, turn_idx, role FROM t
            WHERE role <> 'system' AND regexp_matches(text, 'error')
            ORDER BY conv_id, turn_idx
        """,
        "route_counts": f"""
            WITH t AS ({t}),
            alerts AS (SELECT * FROM t WHERE level IN ('error','warn'))
            SELECT * FROM (
              SELECT 'alerts' AS sink, count(*)::BIGINT AS n FROM alerts
              UNION ALL
              SELECT 'all', (SELECT count(*) FROM t) + (SELECT count(*) FROM alerts)
              UNION ALL
              SELECT 'assistant',
                (SELECT count(*) FROM t WHERE role = 'assistant')
                + (SELECT count(*) FROM alerts WHERE role = 'assistant')
              UNION ALL
              SELECT 'tool_sink', (SELECT count(*) FROM t WHERE role = 'tool')
            ) ORDER BY sink
        """,
        "conv_stats": f"""
            WITH t AS ({t})
            SELECT conv_id,
                   count(*)::BIGINT AS n_turns,
                   max(turn_idx)::BIGINT AS max_turn,
                   min(ts) AS first_ts,
                   max(ts) AS last_ts
            FROM t GROUP BY conv_id ORDER BY conv_id
        """,
        "hot_conversation": f"""
            WITH t AS ({t})
            SELECT conv_id, turn_idx, role, text FROM t
            WHERE conv_id = 'conv-000000' ORDER BY conv_id, turn_idx
        """,
        "routed_rows_tool": f"""
            WITH t AS ({t})
            SELECT conv_id, turn_idx, text, tag FROM t
            WHERE role = 'tool' ORDER BY conv_id, turn_idx
        """,
        "flowcounter_minute": f"""
            WITH t AS ({t})
            SELECT tag, date_trunc('minute', ts) AS bucket_ts,
                   count(*)::BIGINT AS n_records,
                   sum(strlen(text))::BIGINT AS n_bytes
            FROM t GROUP BY 1, 2 ORDER BY tag, bucket_ts
        """,
        "parse_toolcalls": f"""
            WITH t AS ({t})
            SELECT conv_id, turn_idx,
                   regexp_extract(text, '^CALL (\\w+)\\((.*)\\) -> (\\w+)$', 1) AS calltool,
                   regexp_extract(text, '^CALL (\\w+)\\((.*)\\) -> (\\w+)$', 3) AS status
            FROM t
            WHERE regexp_matches(text, '^CALL (\\w+)\\((.*)\\) -> (\\w+)$')
            ORDER BY conv_id, turn_idx
        """,
        "grep_error_rows": f"""
            WITH t AS ({t})
            SELECT conv_id, turn_idx, role FROM t
            WHERE level = 'error' ORDER BY conv_id, turn_idx
        """,
        "enrich_tool_categories": f"""
            WITH t AS ({t})
            SELECT coalesce(d.category, 'Unknown') AS category,
                   count(*)::BIGINT AS n
            FROM t LEFT JOIN read_parquet('{dim_tools}') d ON t.tool = d.tool
            WHERE t.role = 'tool'
            GROUP BY 1 ORDER BY category
        """,
        "sp_window_tumbling": f"""
            WITH t AS ({t}),
            parsed AS (
              SELECT role, ts,
                CASE
                  WHEN text LIKE '{{%' THEN TRY_CAST(json_extract_string(TRY_CAST(text AS JSON), '$.code') AS BIGINT)
                  WHEN text LIKE 'CALL %' THEN NULL
                  WHEN regexp_matches(text, 'code=') THEN TRY_CAST(regexp_extract(text, 'code=(\\d+)', 1) AS BIGINT)
                  WHEN contains(text, chr(9)) THEN TRY_CAST(regexp_extract(text, 'code:(\\d+)', 1) AS BIGINT)
                  WHEN regexp_matches(text, '^[0-9.]+ - ') THEN TRY_CAST(regexp_extract(text, '" (\\d+) ', 1) AS BIGINT)
                END AS code,
                CASE
                  WHEN text LIKE '{{%' THEN TRY_CAST(json_extract_string(TRY_CAST(text AS JSON), '$.dur') AS DOUBLE)
                  WHEN regexp_matches(text, 'dur=') THEN TRY_CAST(regexp_extract(text, 'dur=([0-9.]+)', 1) AS DOUBLE)
                  WHEN contains(text, chr(9)) THEN TRY_CAST(regexp_extract(text, 'dur:([0-9.]+)', 1) AS DOUBLE)
                END AS dur
              FROM t)
            SELECT role,
                   date_trunc('minute', ts) AS window_start,
                   count(*)::BIGINT AS n,
                   sum(coalesce(CAST(round(dur * 1000) AS BIGINT), 0))::BIGINT AS dur_ms
            FROM parsed WHERE code = 200
            GROUP BY 1, 2 ORDER BY role, window_start
        """,
        "lineitem_pricing": """
            SELECT l_returnflag, l_linestatus,
                   count(*)::BIGINT AS n,
                   sum(CAST(round(l_quantity * 100) AS BIGINT))::BIGINT
                       AS qty_c,
                   sum(CAST(round(l_extendedprice * 100)
                            AS BIGINT))::BIGINT AS price_c,
                   sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(round(l_discount * 100)
                                     AS BIGINT)))::BIGINT
                       AS disc_price_c
            FROM lineitem
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "revenue_by_nation": """
            SELECT n.n_name,
                   count(*)::BIGINT AS n_items,
                   sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(round(l.l_discount * 100)
                                     AS BIGINT)))::BIGINT AS revenue_c
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            WHERE r.r_name = 'ASIA'
              AND o.o_orderdate >= TIMESTAMP '1996-01-01'
              AND o.o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY n.n_name
            ORDER BY n.n_name
        """,
        "top_customers_returns": """
            WITH rev AS (
              SELECT o.o_custkey AS custkey,
                     sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                         * (100 - CAST(round(l.l_discount * 100)
                                       AS BIGINT)))::BIGINT AS revenue_c
              FROM lineitem l
              JOIN orders o ON l.l_orderkey = o.o_orderkey
              WHERE l.l_returnflag = 'R'
              GROUP BY 1)
            SELECT r.custkey, c.c_name, n.n_name, r.revenue_c
            FROM rev r
            JOIN customer c ON r.custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            ORDER BY r.revenue_c DESC, r.custkey
            LIMIT 20
        """,
        "events_flowcounter": """
            SELECT event_type,
                   date_trunc('minute', ts) AS minute_ts,
                   count(*)::BIGINT AS n,
                   sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS value_c
            FROM events GROUP BY 1, 2 ORDER BY event_type, minute_ts
        """,
        "events_rolling": """
            SELECT event_id, user_id, ts,
                   CAST(sum(CAST(round(value * 100) AS BIGINT))
                        OVER w AS BIGINT) AS roll_sum_c,
                   CAST(count(*) OVER w AS BIGINT) AS roll_n
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
            ORDER BY event_id
        """,
        "turn_gaps": f"""
            WITH t AS ({t})
            SELECT conv_id, turn_idx,
                   COALESCE(date_diff('millisecond',
                            lag(ts) OVER (PARTITION BY conv_id
                                          ORDER BY turn_idx), ts),
                            -1)::BIGINT AS gap_ms
            FROM t ORDER BY conv_id, turn_idx
        """,
        "events_rolling_minmax": """
            SELECT event_id, user_id,
                   CAST(min(CAST(round(value * 100) AS BIGINT))
                        OVER w AS BIGINT) AS roll_min_c,
                   CAST(max(CAST(round(value * 100) AS BIGINT))
                        OVER w AS BIGINT) AS roll_max_c
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
            ORDER BY event_id
        """,
        "events_rank": """
            SELECT event_id, user_id,
                   rank() OVER w AS rank,
                   dense_rank() OVER w AS dense_rank
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY value)
            ORDER BY event_id
        """,
        "events_cum_spend": """
            SELECT event_id, user_id,
                   CAST(sum(CAST(round(value * 100) AS BIGINT))
                        OVER w AS BIGINT) AS cum_sum_c,
                   CAST(count(*) OVER w AS BIGINT) AS cum_n
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING)
            ORDER BY event_id
        """,
        "events_rolling_time": """
            SELECT event_id, user_id,
                   CAST(sum(CAST(round(value * 100) AS BIGINT))
                        OVER w AS BIGINT) AS span_sum_c,
                   CAST(count(*) OVER w AS BIGINT) AS span_n
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts
                         RANGE BETWEEN INTERVAL 10 MINUTE PRECEDING
                         AND CURRENT ROW)
            ORDER BY event_id
        """,
        "events_pivot": """
            SELECT user_id,
                   (count(*) FILTER (WHERE event_type = 'click'))::BIGINT
                       AS click,
                   (count(*) FILTER (WHERE event_type = 'error'))::BIGINT
                       AS error,
                   (count(*) FILTER (WHERE event_type = 'purchase'))::BIGINT
                       AS purchase,
                   (count(*) FILTER (WHERE event_type = 'signup'))::BIGINT
                       AS signup,
                   (count(*) FILTER (WHERE event_type = 'view'))::BIGINT
                       AS view
            FROM events GROUP BY user_id ORDER BY user_id
        """,
        "event_sessions": """
            WITH s AS (
              SELECT user_id, ts, event_id,
                     CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                          THEN 1 ELSE 0 END AS brk
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            s2 AS (
              SELECT *, sum(brk) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS sess
              FROM s)
            SELECT user_id, sess::BIGINT AS session_idx,
                   min(ts) AS session_start, max(ts) AS session_end,
                   count(*)::BIGINT AS n_events
            FROM s2 GROUP BY user_id, sess
            ORDER BY user_id, session_idx
        """,
        "modify_rename_msg": f"""
            WITH t AS ({t})
            SELECT conv_id, turn_idx,
                   CASE
                     WHEN text LIKE '{{%' THEN json_extract_string(TRY_CAST(text AS JSON), '$.msg')
                     WHEN regexp_matches(text, 'msg="') THEN regexp_extract(text, 'msg="([^"]*)"', 1)
                     WHEN contains(text, chr(9)) THEN regexp_extract(text, 'msg:([^\t]*)', 1)
                   END AS message
            FROM t
            WHERE (text LIKE '{{%' AND json_extract_string(TRY_CAST(text AS JSON), '$.msg') IS NOT NULL)
               OR regexp_matches(text, 'msg="')
               OR (contains(text, chr(9)) AND regexp_matches(text, 'msg:'))
            ORDER BY conv_id, turn_idx
        """,
        "nested_log_seq": f"""
            WITH t AS ({t})
            SELECT conv_id, turn_idx,
                   CAST(json_extract_string(TRY_CAST(json_extract_string(TRY_CAST(text AS JSON), '$.log') AS JSON),
                        '$.seq') AS BIGINT) AS seq
            FROM t
            WHERE text LIKE '{{%'
              AND json_extract_string(TRY_CAST(text AS JSON), '$.log') IS NOT NULL
            ORDER BY conv_id, turn_idx
        """,
        "dedup_exact_transcripts": f"""
            WITH t AS ({t})
            SELECT min(conv_id || ':' || turn_idx::VARCHAR) AS rep
            FROM t GROUP BY text ORDER BY rep
        """,
        "dedup_exact_docs": """
            SELECT min(doc_id)::BIGINT AS doc_id FROM documents
            GROUP BY text ORDER BY doc_id
        """,
        "doc_token_counts": """
            SELECT doc_id,
                   len(string_split(text, ' '))::BIGINT AS n_tokens_ws,
                   len(regexp_extract_all(text,
                       $$'[a-z]+|[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]+$$))::BIGINT
                       AS n_tokens_bpe
            FROM documents ORDER BY doc_id
        """,
        "docs_normalized": r"""
            WITH n AS (
              SELECT doc_id,
                     trim(regexp_replace(regexp_replace(
                          nfc_normalize(text),
                          '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'),
                          '\s+', ' ', 'g'), ' ') AS norm_text
              FROM documents)
            SELECT doc_id, norm_text, length(norm_text)::BIGINT AS norm_len
            FROM n ORDER BY doc_id
        """,
        "doc_quality": """
            WITH c AS (
              SELECT doc_id,
                     strlen(text)::BIGINT AS n_chars_q,
                     len(string_split(text, ' '))::BIGINT AS n_words,
                     len(list_filter(string_split(lower(text), ' '),
                         x -> x IN ('the','a','an','and','of','to','in','is',
                                    'it','that','for','on','with','as','at',
                                    'by','this','be','are')))::BIGINT
                       AS n_stopwords,
                     len(regexp_extract_all(text, '[^\w\s]'))::BIGINT
                       AS n_punct
              FROM documents)
            SELECT doc_id, n_chars_q, n_words, n_stopwords, n_punct,
                   CAST(floor((
                     0.4 * least(n_chars_q::DOUBLE / 500.0, 1.0)
                     + 0.4 * (n_stopwords::DOUBLE
                              / greatest(n_words::DOUBLE, 1.0))
                     + 0.2 * (1.0 - least(n_punct::DOUBLE
                              / greatest(n_chars_q::DOUBLE, 1.0) * 10.0,
                              1.0))
                   ) * 1000.0 + 0.5) AS BIGINT) AS quality_milli
            FROM c ORDER BY doc_id
        """,
        "emb_dup_pairs": """
            SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
                   round(list_cosine_similarity(a.embedding, b.embedding), 4)
                       AS cos_r4
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.5
            ORDER BY vec_id_a, vec_id_b
        """,
        "ann_topk": """
            WITH q AS (SELECT vec_id AS q, embedding FROM embeddings
                       WHERE vec_id < 5),
            scored AS (
              SELECT q.q, e.vec_id,
                     list_cosine_similarity(q.embedding, e.embedding) AS cos,
                     row_number() OVER (
                       PARTITION BY q.q
                       ORDER BY list_cosine_similarity(q.embedding, e.embedding)
                                DESC, e.vec_id) AS rk
              FROM q CROSS JOIN embeddings e)
            SELECT q, vec_id, round(cos, 4) AS cos_r4 FROM scored
            WHERE rk <= 10 ORDER BY q, vec_id
        """,
        "ann_topk_ivf": """
            WITH q AS (SELECT vec_id AS q, embedding FROM embeddings
                       WHERE vec_id < 5),
            scored AS (
              SELECT q.q, e.vec_id,
                     list_cosine_similarity(q.embedding, e.embedding) AS cos,
                     row_number() OVER (
                       PARTITION BY q.q
                       ORDER BY list_cosine_similarity(q.embedding, e.embedding)
                                DESC, e.vec_id) AS rk
              FROM q CROSS JOIN embeddings e)
            SELECT q, vec_id, round(cos, 4) AS cos_r4 FROM scored
            WHERE rk <= 10 ORDER BY q, vec_id
        """,
        "docs_stratified": f"""
            SELECT doc_id, source FROM (
              SELECT doc_id, source,
                     row_number() OVER (
                       PARTITION BY source
                       ORDER BY {_h64_sql("md5(CAST(doc_id AS VARCHAR))")},
                                doc_id) AS rk
              FROM documents) WHERE rk <= 5
            ORDER BY doc_id
        """,
        "events_user_hll": _hll_oracle(),
        "events_user_cms": _cms_oracle(),
        "sft_pairs": f"""
            WITH t AS ({t}),
            p AS (SELECT conv_id, turn_idx, role, text,
                         role || ': ' || text AS piece FROM t),
            c AS (SELECT conv_id, turn_idx, role, text AS target,
                         concat_ws(chr(10),
                           lag(piece, 4) OVER w, lag(piece, 3) OVER w,
                           lag(piece, 2) OVER w, lag(piece, 1) OVER w)
                           AS context
                  FROM p
                  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx))
            SELECT conv_id, turn_idx, context, target FROM c
            WHERE role = 'assistant' ORDER BY conv_id, turn_idx
        """,
        "sft_refs_rendered": f"""
            WITH t AS ({t}),
            p AS (SELECT conv_id, turn_idx, role, text,
                         role || ': ' || text AS piece FROM t),
            c AS (SELECT conv_id, turn_idx, role, text AS target,
                         concat_ws(chr(10),
                           lag(piece, 4) OVER w, lag(piece, 3) OVER w,
                           lag(piece, 2) OVER w, lag(piece, 1) OVER w)
                           AS context
                  FROM p
                  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx))
            SELECT conv_id, turn_idx, context, target FROM c
            WHERE role = 'assistant' ORDER BY conv_id, turn_idx
        """,
        "sft_refs": f"""
            WITH t AS ({t}),
            c AS (SELECT conv_id, turn_idx, role,
                         CAST(min(turn_idx) OVER w AS DOUBLE) AS ctx_start,
                         count(*) OVER w AS ctx_len
                  FROM t
                  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx
                               ROWS BETWEEN 4 PRECEDING AND 1 PRECEDING))
            SELECT conv_id, turn_idx, ctx_start, ctx_len FROM c
            WHERE role = 'assistant' ORDER BY conv_id, turn_idx
        """,
        "wide_parsed": """
            WITH body AS (
              SELECT string_agg('"key_' || j || '": "val_' || j || '"',
                                ',' ORDER BY j) AS kv
              FROM range(1000) s(j)
            ), r AS (
              SELECT i, '{"row_id": ' || i || ',' || kv
                        || ',"END_KEY": "JSON_END"}' AS text
              FROM range(2048) t(i), body)
            SELECT i AS row_id,
                   json_extract_string(text, '$.key_0') AS first_key,
                   'wide' AS marker,
                   CAST(len(list_filter(json_keys(text),
                                        k -> k LIKE 'key_9%'))
                        AS BIGINT) AS n_bucket9,
                   json_extract_string(text, '$.END_KEY') AS sentinel
            FROM r ORDER BY row_id
        """,
        "tool_transition_counts": f"""
            WITH t AS ({t}),
            tt AS (SELECT conv_id, turn_idx, tool FROM t
                   WHERE tool IS NOT NULL AND tool <> ''),
            s AS (SELECT tool,
                         lead(tool) OVER (PARTITION BY conv_id
                                          ORDER BY turn_idx) AS next_tool
                  FROM tt)
            SELECT tool, next_tool, count(*)::BIGINT AS n FROM s
            WHERE next_tool IS NOT NULL GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "collapsed_repeats": f"""
            WITH t AS ({t}),
            m AS (SELECT conv_id, turn_idx, role, text,
                         CASE WHEN lag(role) OVER w = role
                                   AND lag(text) OVER w = text
                              THEN 0 ELSE 1 END AS new_run
                  FROM t
                  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)),
            r AS (SELECT conv_id, turn_idx, role, text,
                         sum(new_run) OVER (PARTITION BY conv_id
                                            ORDER BY turn_idx
                                            ROWS UNBOUNDED PRECEDING)
                           AS run_id
                  FROM m)
            SELECT conv_id, min(turn_idx) AS turn_idx,
                   min(role) AS role, min(text) AS text,
                   count(*)::BIGINT AS repeats
            FROM r GROUP BY conv_id, run_id
            ORDER BY conv_id, turn_idx
        """,
        "docs_topk_per_source": """
            SELECT doc_id, source, n_chars FROM (
              SELECT doc_id, source, n_chars,
                     row_number() OVER (PARTITION BY source
                                        ORDER BY n_chars DESC, doc_id) AS rk
              FROM documents) WHERE rk <= 3
            ORDER BY doc_id
        """,
        "emb_kmeans": _kmeans_oracle(),
        "emb_cluster_sample": _cluster_sample_oracle(),
        "emb_semantic_dup": _semantic_dedup_oracle(),
        "orders_enriched": """
            SELECT o_orderkey, o_orderpriority, o_totalprice,
                   c_mktsegment, c_nationkey
            FROM orders JOIN customer ON o_custkey = c_custkey
            ORDER BY o_orderkey
        """,
        "orders_semi_negbal": """
            SELECT o_orderkey, o_custkey, o_orderpriority
            FROM orders o
            WHERE EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey
                            AND c.c_acctbal < 0)
            ORDER BY o_orderkey
        """,
        # DuckDB ASOF JOIN is the reference semantics; the right side
        # is pre-deduped to max(event_id) per (user, ts) — the same
        # tie the engine resolves with tie_break="v_event_id"
        "purchase_asof_view": """
            WITH p AS (SELECT event_id, ts, user_id FROM events
                       WHERE event_type = 'purchase'),
            v AS (SELECT user_id, ts, max(event_id) AS v_event_id
                  FROM events WHERE event_type = 'view' GROUP BY 1, 2)
            SELECT p.event_id AS p_event_id, p.user_id, v.v_event_id,
                   date_diff('microsecond', v.ts, p.ts) AS gap_us
            FROM p ASOF JOIN v
              ON p.user_id = v.user_id AND p.ts >= v.ts
            ORDER BY p_event_id
        """,
        "purchase_in_error_window": """
            WITH p AS (SELECT event_id, ts, user_id FROM events
                       WHERE event_type = 'purchase'),
            e AS (SELECT event_id AS err_event_id, user_id, ts AS lo,
                         ts + INTERVAL 1 HOUR AS hi
                  FROM events WHERE event_type = 'error')
            SELECT p.event_id AS p_event_id, p.user_id, e.err_event_id
            FROM p JOIN e ON p.user_id = e.user_id
                         AND p.ts >= e.lo AND p.ts < e.hi
            ORDER BY p_event_id, err_event_id
        """,
        "docs_src_bjoin": """
            WITH dim AS (
              SELECT 'src' || CAST(i AS VARCHAR) AS source,
                     i AS src_rank,
                     CASE WHEN i < 7 THEN 'low'
                          WHEN i < 14 THEN 'mid' ELSE 'high' END AS tier
              FROM range(20) t(i))
            SELECT doc_id, d.source, src_rank, tier
            FROM documents d JOIN dim ON d.source = dim.source
            ORDER BY doc_id
        """,
        # filter_tensorflow analogue: the deterministic integer MLP
        # forward pass re-run entirely in SQL (exact — no float sums)
        "tf_score": _tf_oracle_sql(),
        # sequential PII scrub: same ordered RE2 patterns as the engine
        "doc_redact": _redact_oracle_sql(t),
        "vocab_top": r"""
            WITH w AS (SELECT unnest(regexp_extract_all(text, '\S+'))
                       AS token FROM documents)
            SELECT token, count(*)::BIGINT AS n FROM w
            GROUP BY token ORDER BY n DESC, token LIMIT 100
        """,
        # chat rendering: one training text per conversation
        "conv_rendered": f"""
            WITH t AS ({t})
            SELECT conv_id,
                   string_agg(role || ': ' || text, chr(10)
                              ORDER BY turn_idx) AS rendered,
                   count(*)::BIGINT AS n_turns
            FROM t GROUP BY conv_id ORDER BY conv_id
        """,
        # composed transcripts curation: gate → boilerplate (counted
        # on the GATED subset) → gaps-and-islands repeat collapse →
        # string_agg rendering — each engine stage as one CTE, in the
        # same order
        "convs_curated": f"""
            WITH t AS ({t}),
            g AS (SELECT conv_id FROM t GROUP BY conv_id
                  HAVING count(*) >= 6
                     AND count(*) FILTER (role = 'assistant') > 0
                     AND count(*) FILTER (role = 'user') > 0),
            tg AS (SELECT * FROM t
                   WHERE conv_id IN (SELECT conv_id FROM g)),
            bad AS (SELECT text FROM tg
                    GROUP BY text HAVING count(DISTINCT conv_id) >= 5),
            tb AS (SELECT * FROM tg
                   WHERE text NOT IN (SELECT text FROM bad)),
            runs AS (SELECT conv_id, turn_idx, role, text,
                            row_number() OVER (PARTITION BY conv_id
                                               ORDER BY turn_idx)
                          - row_number() OVER (PARTITION BY conv_id, role,
                                               text ORDER BY turn_idx)
                            AS grp
                     FROM tb),
            coll AS (SELECT conv_id, min(turn_idx) AS turn_idx,
                            role, text
                     FROM runs GROUP BY conv_id, role, text, grp)
            SELECT conv_id,
                   string_agg(role || ': ' || text, chr(10)
                              ORDER BY turn_idx) AS rendered,
                   count(*)::BIGINT AS n_turns
            FROM coll GROUP BY conv_id ORDER BY conv_id
        """,
        # whole-conversation gate: structural HAVING predicates
        "conv_gated": f"""
            WITH t AS ({t}),
            g AS (SELECT conv_id FROM t GROUP BY conv_id
                  HAVING count(*) >= 11
                     AND count(*) FILTER (role = 'assistant') > 0
                     AND count(*) FILTER (role = 'tool') > 0)
            SELECT conv_id, turn_idx, role FROM t
            WHERE conv_id IN (SELECT conv_id FROM g)
            ORDER BY conv_id, turn_idx
        """,
        # boilerplate: drop ALL occurrences of texts seen in >=5
        # distinct conversations (engine matches on md5-h64 of the
        # text; the oracle verifies on raw text equality)
        "boilerplate_removed": f"""
            WITH t AS ({t}),
            bad AS (SELECT text FROM t
                    GROUP BY text HAVING count(DISTINCT conv_id) >= 5)
            SELECT conv_id, turn_idx, role FROM t
            WHERE text NOT IN (SELECT text FROM bad)
            ORDER BY conv_id, turn_idx
        """,
        # bigram-LM typicality: integer conditional-probability milli
        # ratios, floor division at both levels (r per bigram, then
        # the per-doc mean) — no float anywhere
        "doc_lm_score": r"""
            WITH tok AS (
              SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS tk,
                     generate_subscripts(regexp_extract_all(text, '\S+'), 1)
                         AS i
              FROM documents),
            big AS (SELECT a.doc_id, a.tk AS w1, b.tk AS w2
                    FROM tok a JOIN tok b
                      ON a.doc_id = b.doc_id AND b.i = a.i + 1),
            cu AS (SELECT tk AS w1, count(*)::BIGINT AS cu
                   FROM tok GROUP BY tk),
            cb AS (SELECT w1, w2, count(*)::BIGINT AS cb
                   FROM big GROUP BY w1, w2),
            sc AS (SELECT big.doc_id,
                          sum((1000000 * cb.cb) // cu.cu)::BIGINT AS s,
                          count(*)::BIGINT AS nb
                   FROM big JOIN cb USING (w1, w2) JOIN cu USING (w1)
                   GROUP BY big.doc_id)
            SELECT d.doc_id,
                   COALESCE(sc.s // sc.nb, 0)::BIGINT AS lm_milli
            FROM documents d LEFT JOIN sc USING (doc_id)
            ORDER BY d.doc_id
        """,
        # fasttext-style quality model: integer weights inlined as
        # VALUES (the tf_score pattern), md5-h64 token buckets
        "doc_quality_model": _quality_model_oracle(),
        # keyword retrieval: same \S+ tokens; integer tf-idf weights
        # 1e6 // df so both engines use exact integer arithmetic
        # (dataops/search.py scoring contract)
        "docs_keyword_topk": r"""
            WITH w AS (SELECT doc_id,
                              unnest(regexp_extract_all(text, '\S+')) AS token
                       FROM documents),
            q AS (SELECT unnest(['hash','window','spark','zzzmissing']) AS term),
            dfreq AS (SELECT token, count(DISTINCT doc_id)::BIGINT AS df
                      FROM w WHERE token IN (SELECT term FROM q)
                      GROUP BY token),
            tf AS (SELECT doc_id, token, count(*)::BIGINT AS tf
                   FROM w WHERE token IN (SELECT term FROM q)
                   GROUP BY doc_id, token),
            sc AS (SELECT tf.doc_id,
                          sum(tf.tf * (1000000 // dfreq.df))::BIGINT AS score
                   FROM tf JOIN dfreq USING (token) GROUP BY tf.doc_id)
            SELECT doc_id, score FROM sc WHERE score > 0
            ORDER BY score DESC, doc_id LIMIT 20
        """,
        # BM25, integer-quantized (search.py:bm25_topk): every factor
        # milli-scaled with floor division — idf is the rational
        # Robertson surrogate (1000·(N−df+1))//(df+1), k1=1200m,
        # b=750m — so the SQL replays the exact integers
        "docs_bm25": f"""
            WITH {_BM25_CTES}
            SELECT doc_id, score FROM sc WHERE score > 0
            ORDER BY score DESC, doc_id LIMIT 20
        """,
        # hybrid retrieval: the BM25 CTEs feed a 50-candidate rerank by
        # cosine against vec_id 7's embedding (ann_topk's round-to-4
        # float convention)
        "docs_hybrid_search": f"""
            WITH {_BM25_CTES},
            cand AS (SELECT doc_id, score FROM sc WHERE score > 0
                     ORDER BY score DESC, doc_id LIMIT 50),
            qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 7),
            rer AS (SELECT c.doc_id, c.score,
                           list_cosine_similarity(e.embedding, qv.qe) AS cos
                    FROM cand c JOIN embeddings e ON e.vec_id = c.doc_id, qv),
            top AS (SELECT *, row_number() OVER (ORDER BY cos DESC, doc_id)
                           AS rk FROM rer)
            SELECT doc_id, score, round(cos::DOUBLE, 4) AS cos_r4
            FROM top WHERE rk <= 10 ORDER BY doc_id
        """,
        # C4-style keep-first segment dedup: same 10-word windows
        # (last partial window included), keep-first = row_number over
        # (doc_id, seg_idx) per distinct segment STRING (the engine
        # keys on an internal injective hash of the same string)
        "docs_segdedup": r"""
            WITH w AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS ws
                       FROM documents),
            seg AS (SELECT doc_id,
                           unnest(range(0, (len(ws)+9)//10)) AS seg_idx,
                           unnest(list_transform(range(0, (len(ws)+9)//10),
                                  i -> array_to_string(ws[i*10+1 : i*10+10],
                                                       ' '))) AS seg
                    FROM w WHERE len(ws) > 0),
            keep AS (SELECT doc_id, seg_idx, seg,
                            row_number() OVER (PARTITION BY seg
                                ORDER BY doc_id, seg_idx) AS rn
                     FROM seg)
            SELECT doc_id, string_agg(seg, ' ' ORDER BY seg_idx) AS text
            FROM keep WHERE rn = 1 GROUP BY doc_id ORDER BY doc_id
        """,
        "docs_split": f"""
            SELECT doc_id,
              CASE WHEN b < 98 THEN 'train' WHEN b < 99 THEN 'val'
                   ELSE 'test' END AS split
            FROM (SELECT doc_id,
                         {_h64_sql("md5(CAST(doc_id AS VARCHAR))")}
                           % 100 AS b FROM documents)
            ORDER BY doc_id
        """,
        # graded decontamination: doc_decontaminate's gram/hit CTEs
        # plus per-doc distinct-gram totals and the milli fraction
        "doc_contamination": rf"""
            WITH w AS (SELECT doc_id,
                              regexp_extract_all(coalesce(text, ''),
                                                 '\S+') AS ws
                       FROM documents),
            sh AS (SELECT doc_id,
                    CASE WHEN len(ws) < 5 THEN [array_to_string(ws, ' ')]
                    ELSE list_distinct(list_transform(range(1, len(ws) - 3),
                         i -> array_to_string(ws[i:i+4], ' '))) END AS grams
                   FROM w),
            gcnt AS (SELECT doc_id, len(grams)::BIGINT AS n_grams FROM sh),
            gx AS (SELECT DISTINCT doc_id, {_h64_sql('md5(s)')} AS h
                   FROM (SELECT doc_id, unnest(grams) AS s FROM sh)),
            bench AS (SELECT DISTINCT h FROM gx WHERE doc_id % 20 = 0),
            hits AS (SELECT gx.doc_id, count(*)::BIGINT AS n_hits
                     FROM gx JOIN bench USING (h) GROUP BY gx.doc_id)
            SELECT d.doc_id, coalesce(hits.n_hits, 0)::BIGINT AS n_hits,
                   gcnt.n_grams,
                   (1000*coalesce(hits.n_hits, 0))
                     // greatest(gcnt.n_grams, 1) AS overlap_milli
            FROM documents d JOIN gcnt ON gcnt.doc_id = d.doc_id
            LEFT JOIN hits ON hits.doc_id = d.doc_id
            ORDER BY d.doc_id
        """,
        # decontamination: same 5-gram construction as the minhash
        # oracle's shingles (dataops/dedup._shingles), same h64 hash;
        # n_hits counts DISTINCT contaminated gram hashes per doc
        "doc_decontaminate": rf"""
            WITH w AS (SELECT doc_id,
                              regexp_extract_all(coalesce(text, ''),
                                                 '\S+') AS ws
                       FROM documents),
            sh AS (SELECT doc_id,
                    CASE WHEN len(ws) < 5 THEN [array_to_string(ws, ' ')]
                    ELSE list_distinct(list_transform(range(1, len(ws) - 3),
                         i -> array_to_string(ws[i:i+4], ' '))) END AS grams
                   FROM w),
            gx AS (SELECT DISTINCT doc_id, {_h64_sql('md5(s)')} AS h
                   FROM (SELECT doc_id, unnest(grams) AS s FROM sh)),
            bench AS (SELECT DISTINCT h FROM gx WHERE doc_id % 20 = 0),
            hits AS (SELECT gx.doc_id, count(*)::BIGINT AS n_hits
                     FROM gx JOIN bench USING (h) GROUP BY gx.doc_id)
            SELECT d.doc_id, coalesce(hits.n_hits, 0)::BIGINT AS n_hits,
                   coalesce(hits.n_hits, 0) > 0 AS contaminated
            FROM documents d LEFT JOIN hits ON hits.doc_id = d.doc_id
            ORDER BY d.doc_id
        """,
        "docs_sample_mix": f"""
            WITH b AS (SELECT doc_id, source,
                              {_h64_sql('md5(CAST(doc_id AS VARCHAR))')}
                                % 100 AS bucket,
                              CAST(substr(source, 4) AS INT) % 4 AS si
                       FROM documents)
            SELECT doc_id, source FROM b
            WHERE bucket < CASE si WHEN 0 THEN 100 WHEN 1 THEN 50
                                   WHEN 2 THEN 30 ELSE 10 END
            ORDER BY doc_id
        """,
        "docs_sampled": f"""
            SELECT doc_id FROM documents
            WHERE {_h64_sql('md5(CAST(doc_id AS VARCHAR))')} % 100 < 37
            ORDER BY doc_id
        """,
        "docs_shuffled": f"""
            SELECT doc_id,
                   (row_number() OVER (ORDER BY
                     {_h64_sql("md5('7:' || CAST(doc_id AS VARCHAR))")},
                     doc_id) - 1)::BIGINT AS epoch_pos
            FROM documents ORDER BY epoch_pos
        """,
        # full round-by-round replay generated by dataops.bpe (unrolled
        # CTEs: pair counts, argmax + tie-break, replace-sweep apply)
        "bpe_merges": bpe_train_sql(12, 50_000),
        "doc_bpe_tokens": bpe_tokenize_sql(12, 50_000),
        # composed train→tokenize→pack: the tokenize replay feeds the
        # docs_pack recursion (budget 256, per-source chains). The
        # MATERIALIZED hint on d is load-bearing: without it DuckDB
        # inlines the whole BPE training chain into every recursion step
        "docs_bpe_packed": f"""
            WITH RECURSIVE d AS MATERIALIZED (
              SELECT s.source, t.doc_id, t.n_bpe_tokens AS n,
                     row_number() OVER (PARTITION BY s.source
                                        ORDER BY t.doc_id) AS rn
              FROM ({bpe_tokenize_sql(12, 50_000)}) t
              JOIN documents s USING (doc_id)),
            r AS (SELECT source, doc_id, n, rn,
                         0::BIGINT AS bin_idx, n AS cum
                  FROM d WHERE rn = 1
             UNION ALL
             SELECT d.source, d.doc_id, d.n, d.rn,
                    CASE WHEN r.cum + d.n <= 256 THEN r.bin_idx
                         ELSE r.bin_idx + 1 END,
                    CASE WHEN r.cum + d.n <= 256 THEN r.cum + d.n
                         ELSE d.n END
             FROM r JOIN d ON d.source = r.source AND d.rn = r.rn + 1)
            SELECT source, doc_id, n AS n_bpe_tokens, bin_idx
            FROM r ORDER BY source, doc_id
        """,
        "doc_chunks": r"""
            WITH w AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS ws
                       FROM documents),
            st AS (SELECT doc_id, ws, unnest(range(0, len(ws), 24)) AS start
                   FROM w)
            SELECT doc_id, (start // 24)::BIGINT AS chunk_idx,
                   array_to_string(ws[start+1:start+32], ' ') AS chunk_text,
                   least(32, len(ws) - start)::BIGINT AS n_words_chunk
            FROM st ORDER BY doc_id, chunk_idx
        """,
        # repetition: milli-unit floats mirror the engine's exact IEEE
        # expression order (see quality_milli note); pair strings are
        # unambiguous because words contain no spaces
        "doc_repetition": r"""
            WITH w AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS ws
                       FROM documents),
            base AS (SELECT doc_id, len(ws)::BIGINT AS n_words,
                            len(list_distinct(ws))::BIGINT AS n_uniq
                     FROM w),
            pairs AS (SELECT doc_id,
                             unnest(list_transform(range(1, len(ws)),
                                    i -> ws[i] || ' ' || ws[i+1])) AS p
                      FROM w WHERE len(ws) >= 2),
            topg AS (SELECT doc_id, max(c)::BIGINT AS top2 FROM (
                       SELECT doc_id, p, count(*) AS c FROM pairs
                       GROUP BY doc_id, p) GROUP BY doc_id)
            SELECT b.doc_id, b.n_words,
                   floor((1.0 - CAST(b.n_uniq AS DOUBLE)
                          / CAST(greatest(b.n_words, 1) AS DOUBLE))
                         * 1000.0 + 0.5)::BIGINT AS dup_word_milli,
                   CASE WHEN b.n_words >= 2 THEN
                     floor(CAST(coalesce(t.top2, 0) AS DOUBLE)
                           / CAST(b.n_words - 1 AS DOUBLE)
                           * 1000.0 + 0.5)::BIGINT
                   ELSE 0 END AS top2_milli
            FROM base b LEFT JOIN topg t ON t.doc_id = b.doc_id
            ORDER BY b.doc_id
        """,
        # the composed curation pipeline: each stage reuses its
        # standalone oracle's CTE (dedup = min doc_id per md5(text);
        # decontamination = the doc_decontaminate gram join; gates =
        # the doc_repetition milli rule + length window; mixing = the
        # docs_sample_mix bucket rule; packing = the docs_pack
        # recursive recurrence over survivors)
        "docs_curated": rf"""
            WITH RECURSIVE keep AS (
              SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
            w AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS ws
                  FROM documents),
            sh AS (SELECT doc_id,
                    CASE WHEN len(ws) < 5 THEN [array_to_string(ws, ' ')]
                    ELSE list_distinct(list_transform(range(1, len(ws) - 3),
                         i -> array_to_string(ws[i:i+4], ' '))) END AS grams
                   FROM w),
            gx AS (SELECT DISTINCT doc_id, {_h64_sql('md5(s)')} AS h
                   FROM (SELECT doc_id, unnest(grams) AS s FROM sh)),
            bench AS (SELECT DISTINCT h FROM gx WHERE doc_id % 20 = 0),
            cont AS (SELECT DISTINCT gx.doc_id FROM gx
                     JOIN bench USING (h)),
            rep AS (SELECT doc_id, len(ws)::BIGINT AS n_words,
                           len(list_distinct(ws))::BIGINT AS n_uniq
                    FROM w),
            surv AS (
              SELECT d.source, d.doc_id, r.n_words,
                     row_number() OVER (PARTITION BY d.source
                                        ORDER BY d.doc_id) AS rn
              FROM documents d
              JOIN keep k ON k.doc_id = d.doc_id
              JOIN rep r ON r.doc_id = d.doc_id
              LEFT JOIN cont c ON c.doc_id = d.doc_id
              WHERE c.doc_id IS NULL
                AND r.n_words BETWEEN 5 AND 80
                AND floor((1.0 - CAST(r.n_uniq AS DOUBLE)
                           / CAST(greatest(r.n_words, 1) AS DOUBLE))
                          * 1000.0 + 0.5) <= 600
                AND {_h64_sql('md5(CAST(d.doc_id AS VARCHAR))')} % 100
                    < CASE CAST(substr(d.source, 4) AS INT) % 4
                      WHEN 0 THEN 100 WHEN 1 THEN 50
                      WHEN 2 THEN 30 ELSE 10 END),
            pk AS (
              SELECT source, doc_id, n_words, rn,
                     0::BIGINT AS bin_idx, n_words AS cum
              FROM surv WHERE rn = 1
              UNION ALL
              SELECT s.source, s.doc_id, s.n_words, s.rn,
                     CASE WHEN pk.cum + s.n_words <= 128 THEN pk.bin_idx
                          ELSE pk.bin_idx + 1 END,
                     CASE WHEN pk.cum + s.n_words <= 128
                          THEN pk.cum + s.n_words ELSE s.n_words END
              FROM pk JOIN surv s
                ON s.source = pk.source AND s.rn = pk.rn + 1)
            SELECT source, doc_id, n_words, bin_idx
            FROM pk ORDER BY source, doc_id
        """,
        # exact quantile rule shared with the engine: smallest value
        # whose cumulative count ≥ ceil(q/1000·N), integer arithmetic
        "doc_len_quantiles": """
            WITH h AS (SELECT source, n_chars AS value, count(*) AS n
                       FROM documents GROUP BY source, n_chars),
            c AS (SELECT source, value, n,
                         sum(n) OVER (PARTITION BY source ORDER BY value)
                           AS cum,
                         sum(n) OVER (PARTITION BY source) AS total
                  FROM h),
            q AS (SELECT unnest([250, 500, 750, 900, 990]) AS q_milli)
            SELECT c.source, q.q_milli::BIGINT AS q_milli,
                   min(c.value)::BIGINT AS value,
                   arg_min(c.cum, c.value)::BIGINT AS n_le
            FROM c JOIN q ON c.cum >= (q.q_milli * c.total + 999) // 1000
            GROUP BY c.source, q.q_milli
            ORDER BY c.source, q_milli
        """,
        # greedy packing is a sequential recurrence → recursive CTE
        # stepping one row per source per iteration
        "docs_pack": r"""
            WITH RECURSIVE d AS (
              SELECT source, doc_id,
                     len(regexp_extract_all(text, '\S+'))::BIGINT AS n,
                     row_number() OVER (PARTITION BY source
                                        ORDER BY doc_id) AS rn
              FROM documents),
            r AS (
              SELECT source, doc_id, n, rn, 0::BIGINT AS bin_idx, n AS cum
              FROM d WHERE rn = 1
              UNION ALL
              SELECT d.source, d.doc_id, d.n, d.rn,
                     CASE WHEN r.cum + d.n <= 128 THEN r.bin_idx
                          ELSE r.bin_idx + 1 END,
                     CASE WHEN r.cum + d.n <= 128 THEN r.cum + d.n
                          ELSE d.n END
              FROM r JOIN d ON d.source = r.source AND d.rn = r.rn + 1)
            SELECT source, doc_id, n AS n_words, bin_idx
            FROM r ORDER BY source, doc_id
        """,
        "ua_browser_counts": f"""
            WITH t AS ({t}),
            apache AS (
              SELECT regexp_extract(text, '"([^"]*)"$', 1) AS agent
              FROM t
              WHERE regexp_matches(text, '^[0-9.]+ - '))
            SELECT CASE
                     WHEN regexp_matches(agent, 'Firefox/(\\d+)') THEN 'Firefox'
                     WHEN regexp_matches(agent, 'Chrome/(\\d+)') THEN 'Chrome'
                     WHEN regexp_matches(agent, 'curl/([\\d.]+)') THEN 'curl'
                     WHEN regexp_matches(agent, 'python-requests/([\\d.]+)') THEN 'requests'
                     ELSE 'Unknown'
                   END AS browser,
                   count(*)::BIGINT AS n
            FROM apache GROUP BY 1 ORDER BY browser
        """,
        "multiline_segments": f"""
            WITH t AS ({t}),
            seg AS (
              SELECT conv_id, turn_idx, text,
                     CASE WHEN regexp_matches(text, '^(\\d|\\{{|CALL )')
                          THEN 1 ELSE 0 END AS is_first,
                     sum(CASE WHEN regexp_matches(text, '^(\\d|\\{{|CALL )')
                          THEN 1 ELSE 0 END)
                       OVER (PARTITION BY conv_id ORDER BY turn_idx) AS run
              FROM t),
            segs AS (
              -- rows before the first firstline (run=0) are emitted as-is;
              -- others group into their run
              SELECT conv_id,
                     CASE WHEN run = 0 THEN turn_idx ELSE NULL END AS solo,
                     run, turn_idx, text FROM seg)
            SELECT conv_id,
                   min(turn_idx)::BIGINT AS first_turn,
                   count(*)::BIGINT AS n_parts,
                   string_agg(text, chr(10) ORDER BY turn_idx) AS text
            FROM segs
            GROUP BY conv_id, run, solo
            ORDER BY conv_id, first_turn
        """,
        "multiline_segments_gap": f"""
            WITH t AS ({t}),
            w AS (
              SELECT conv_id, turn_idx, text,
                     ts + CASE WHEN turn_idx % 7 = 3
                          THEN INTERVAL 10 SECOND ELSE INTERVAL 0 SECOND END
                       AS ts2,
                     regexp_matches(text, '^(\\d|\\{{|CALL )') AS is_first
              FROM t),
            s AS (
              SELECT *,
                     CASE WHEN epoch(ts2 - lag(ts2) OVER
                          (PARTITION BY conv_id ORDER BY turn_idx)) > 5
                          THEN 1 ELSE 0 END AS gapbrk
              FROM w),
            runs AS (
              SELECT *,
                     sum(CASE WHEN is_first OR gapbrk = 1 THEN 1 ELSE 0 END)
                       OVER (PARTITION BY conv_id ORDER BY turn_idx
                             ROWS UNBOUNDED PRECEDING) AS run
              FROM s),
            runs2 AS (
              SELECT *,
                     first_value(is_first) OVER
                       (PARTITION BY conv_id, run ORDER BY turn_idx) AS rf
              FROM runs)
            SELECT conv_id,
                   min(turn_idx)::BIGINT AS first_turn,
                   count(*)::BIGINT AS n_parts,
                   string_agg(text, chr(10) ORDER BY turn_idx) AS text
            FROM runs2
            GROUP BY conv_id, run, CASE WHEN rf THEN NULL ELSE turn_idx END
            ORDER BY conv_id, first_turn
        """,
        # multiline continuation parsers: same RE2 patterns as the
        # engine's cont_parsers; parsed lines leave the text join and
        # contribute fields (last parsed line wins per key; tool only
        # exists in the logfmt grammar so the last logfmt line wins)
        "multiline_parsed": f"""
            WITH t AS ({t}),
            seg AS (
              SELECT conv_id, turn_idx, text,
                     CASE WHEN regexp_matches(text, '^(\\d|\\{{|CALL )')
                          THEN 1 ELSE 0 END AS is_first,
                     sum(CASE WHEN regexp_matches(text, '^(\\d|\\{{|CALL )')
                          THEN 1 ELSE 0 END)
                       OVER (PARTITION BY conv_id ORDER BY turn_idx) AS run
              FROM t),
            p AS (
              SELECT *,
                CASE WHEN run >= 1 AND is_first = 0
                          AND regexp_matches(text, '{_ML_LOGFMT_PAT}')
                     THEN regexp_extract(text, '{_ML_LOGFMT_PAT}',
                          ['level', 'msg', 'tool', 'dur', 'code']) END AS mlf,
                CASE WHEN run >= 1 AND is_first = 0
                          AND regexp_matches(text, '{_ML_LTSV_PAT}')
                     THEN regexp_extract(text, '{_ML_LTSV_PAT}',
                          ['level', 'code', 'msg', 'dur']) END AS mlt
              FROM seg),
            q AS (
              SELECT conv_id, turn_idx, text, run,
                CASE WHEN run = 0 THEN turn_idx END AS solo,
                (is_first = 1 OR (mlf IS NULL AND mlt IS NULL)) AS keep_text,
                coalesce(mlf.level, mlt.level) AS plevel,
                coalesce(mlf.msg, mlt.msg) AS pmsg,
                mlf.tool AS ptool,
                coalesce(mlf.code, mlt.code) AS pcode
              FROM p)
            SELECT conv_id,
                   min(turn_idx)::BIGINT AS first_turn,
                   count(*)::BIGINT AS n_parts,
                   string_agg(text, chr(10) ORDER BY turn_idx)
                     FILTER (WHERE keep_text) AS text,
                   coalesce(max_by(plevel, turn_idx)
                     FILTER (WHERE plevel IS NOT NULL), '') AS level,
                   coalesce(max_by(pmsg, turn_idx)
                     FILTER (WHERE pmsg IS NOT NULL), '') AS msg,
                   coalesce(max_by(ptool, turn_idx)
                     FILTER (WHERE ptool IS NOT NULL), '') AS tool,
                   coalesce(max_by(pcode, turn_idx)
                     FILTER (WHERE pcode IS NOT NULL), '') AS code_s
            FROM q GROUP BY conv_id, run, solo
            ORDER BY conv_id, first_turn
        """,
        "sp_count_window": f"""
            WITH t AS ({t}),
            parsed AS (
              SELECT role, ts,
                CASE
                  WHEN text LIKE '{{%' THEN TRY_CAST(json_extract_string(TRY_CAST(text AS JSON), '$.code') AS BIGINT)
                  WHEN text LIKE 'CALL %' THEN NULL
                  WHEN regexp_matches(text, 'code=') THEN TRY_CAST(regexp_extract(text, 'code=(\\d+)', 1) AS BIGINT)
                  WHEN contains(text, chr(9)) THEN TRY_CAST(regexp_extract(text, 'code:(\\d+)', 1) AS BIGINT)
                  WHEN regexp_matches(text, '^[0-9.]+ - ') THEN TRY_CAST(regexp_extract(text, '" (\\d+) ', 1) AS BIGINT)
                END AS code
              FROM t)
            SELECT role, date_trunc('minute', ts) AS window_start,
                   count(*)::BIGINT AS n
            FROM parsed WHERE code = 200
            GROUP BY 1, 2 ORDER BY role, window_start
        """,
        "sp_snapshot_flush": f"""
            WITH t AS ({t})
            SELECT conv_id, turn_idx, text FROM t
            WHERE role = 'tool' ORDER BY conv_id, turn_idx
        """,
        # LIMIT under the deterministic order contract: the engine
        # sorts by all output columns before taking the first n
        "sp_limit": f"""
            WITH t AS ({t}),
            parsed AS (
              SELECT conv_id, turn_idx,
                CASE
                  WHEN text LIKE '{{%' THEN TRY_CAST(json_extract_string(TRY_CAST(text AS JSON), '$.code') AS BIGINT)
                  WHEN text LIKE 'CALL %' THEN NULL
                  WHEN regexp_matches(text, 'code=') THEN TRY_CAST(regexp_extract(text, 'code=(\\d+)', 1) AS BIGINT)
                  WHEN contains(text, chr(9)) THEN TRY_CAST(regexp_extract(text, 'code:(\\d+)', 1) AS BIGINT)
                  WHEN regexp_matches(text, '^[0-9.]+ - ') THEN TRY_CAST(regexp_extract(text, '" (\\d+) ', 1) AS BIGINT)
                END AS code
              FROM t)
            SELECT conv_id, turn_idx FROM parsed
            WHERE code = 200
            ORDER BY conv_id, turn_idx LIMIT 500
        """,
        "sp_forecast": f"""
            WITH t AS ({t}),
            parsed AS (
              SELECT role, ts,
                CASE
                  WHEN text LIKE '{{%' THEN TRY_CAST(json_extract_string(TRY_CAST(text AS JSON), '$.code') AS BIGINT)
                  WHEN text LIKE 'CALL %' THEN NULL
                  WHEN regexp_matches(text, 'code=') THEN TRY_CAST(regexp_extract(text, 'code=(\\d+)', 1) AS BIGINT)
                  WHEN contains(text, chr(9)) THEN TRY_CAST(regexp_extract(text, 'code:(\\d+)', 1) AS BIGINT)
                  WHEN regexp_matches(text, '^[0-9.]+ - ') THEN TRY_CAST(regexp_extract(text, '" (\\d+) ', 1) AS BIGINT)
                END AS code,
                CASE
                  WHEN text LIKE '{{%' THEN TRY_CAST(json_extract_string(TRY_CAST(text AS JSON), '$.dur') AS DOUBLE)
                  WHEN regexp_matches(text, 'dur=') THEN TRY_CAST(regexp_extract(text, 'dur=([0-9.]+)', 1) AS DOUBLE)
                  WHEN contains(text, chr(9)) THEN TRY_CAST(regexp_extract(text, 'dur:([0-9.]+)', 1) AS DOUBLE)
                END AS dur
              FROM t),
            f AS (
              SELECT role, epoch(ts)::DOUBLE AS x, dur AS y
              FROM parsed WHERE code = 200 AND dur IS NOT NULL),
            s AS (
              SELECT role, count(*)::DOUBLE AS n, sum(x) AS sx,
                     sum(y) AS sy, sum(x*y) AS sxy, sum(x*x) AS sx2,
                     max(x) AS mx
              FROM f GROUP BY role)
            SELECT role,
                   CAST(round((
                     (sy - ((n*sxy - sx*sy)/(n*sx2 - sx*sx)) * sx) / n
                     + ((n*sxy - sx*sy)/(n*sx2 - sx*sx)) * (mx + 600)
                   ) * 1000) AS BIGINT) AS f_milli
            FROM s ORDER BY role
        """,
        "sp_hopping": f"""
            WITH t AS ({t}),
            parsed AS (
              SELECT role, ts,
                CASE
                  WHEN text LIKE '{{%' THEN TRY_CAST(json_extract_string(TRY_CAST(text AS JSON), '$.code') AS BIGINT)
                  WHEN text LIKE 'CALL %' THEN NULL
                  WHEN regexp_matches(text, 'code=') THEN TRY_CAST(regexp_extract(text, 'code=(\\d+)', 1) AS BIGINT)
                  WHEN contains(text, chr(9)) THEN TRY_CAST(regexp_extract(text, 'code:(\\d+)', 1) AS BIGINT)
                  WHEN regexp_matches(text, '^[0-9.]+ - ') THEN TRY_CAST(regexp_extract(text, '" (\\d+) ', 1) AS BIGINT)
                END AS code
              FROM t),
            hop AS (
              -- hopping(size 120, advance 60): each row lands in
              -- ceil(120/60)=2 overlapping windows
              SELECT role, code,
                     (epoch(ts)::BIGINT // 60) * 60 - 60 * k.k AS ws,
                     epoch(ts)::BIGINT AS es
              FROM parsed, (VALUES (0), (1)) AS k(k))
            SELECT role,
                   TIMESTAMP '1970-01-01' + ws * INTERVAL 1 SECOND
                     AS window_start,
                   count(*)::BIGINT AS n
            FROM hop WHERE code = 200 AND es < ws + 120
            GROUP BY 1, 2 ORDER BY role, window_start
        """,
        "sp_contains": f"""
            WITH t AS ({t})
            SELECT role, count(*)::BIGINT AS n FROM t
            WHERE level IS NOT NULL AND epoch(ts) >= 1
            GROUP BY role ORDER BY role
        """,
        "sp_arith": f"""
            WITH t AS ({t}),
            parsed AS (
              SELECT role, turn_idx,
                CASE
                  WHEN text LIKE '{{%' THEN TRY_CAST(json_extract_string(TRY_CAST(text AS JSON), '$.code') AS BIGINT)
                  WHEN text LIKE 'CALL %' THEN NULL
                  WHEN regexp_matches(text, 'code=') THEN TRY_CAST(regexp_extract(text, 'code=(\\d+)', 1) AS BIGINT)
                  WHEN contains(text, chr(9)) THEN TRY_CAST(regexp_extract(text, 'code:(\\d+)', 1) AS BIGINT)
                  WHEN regexp_matches(text, '^[0-9.]+ - ') THEN TRY_CAST(regexp_extract(text, '" (\\d+) ', 1) AS BIGINT)
                END AS code,
                CASE
                  WHEN text LIKE '{{%' THEN TRY_CAST(json_extract_string(TRY_CAST(text AS JSON), '$.dur') AS DOUBLE)
                  WHEN regexp_matches(text, 'dur=') THEN TRY_CAST(regexp_extract(text, 'dur=([0-9.]+)', 1) AS DOUBLE)
                  WHEN contains(text, chr(9)) THEN TRY_CAST(regexp_extract(text, 'dur:([0-9.]+)', 1) AS DOUBLE)
                END AS dur
              FROM t)
            SELECT role, count(*)::BIGINT AS n,
                   sum(code * 2 + turn_idx)::BIGINT AS load_i
            FROM parsed WHERE code * 2 < 900 AND dur * 2 > 1.0
            GROUP BY role ORDER BY role
        """,
        "throttle_kept": f"""
            WITH t AS ({t})
            SELECT conv_id, turn_idx FROM t
            QUALIFY row_number() OVER (
              PARTITION BY (epoch(ts)::BIGINT // 60)
              ORDER BY ts, conv_id, turn_idx) <= 5
            ORDER BY conv_id, turn_idx
        """,
        "throttle_size_kept": f"""
            WITH t AS ({t})
            SELECT conv_id, turn_idx FROM t
            QUALIFY sum(strlen(text)) OVER (
              PARTITION BY (epoch(ts)::BIGINT // 60), role
              ORDER BY ts, conv_id, turn_idx
              ROWS UNBOUNDED PRECEDING) <= 2000
            ORDER BY conv_id, turn_idx
        """,
        # langid: the stopword-vote heuristic IS SQL-expressible — the
        # sets and the first-wins tie-break mirror
        # fluent_bit_ray/dataops/textstats.py langid_batch exactly
        "doc_langid": """
            WITH w AS (
              SELECT doc_id,
                     regexp_extract_all(lower(text), '[a-zà-ÿä-ü]+') AS ws
              FROM documents),
            c AS (
              SELECT doc_id,
                len(list_filter(ws, x -> x IN ('the','a','an','and','of','to',
                    'in','is','it','that','for','on','with','as','at','by',
                    'this','be','are'))) AS en,
                len(list_filter(ws, x -> x IN ('der','die','das','und','ist',
                    'nicht','mit','ein','zu'))) AS de,
                len(list_filter(ws, x -> x IN ('le','la','les','et','est',
                    'pas','pour','dans','une'))) AS fr,
                len(list_filter(ws, x -> x IN ('el','los','las','y','es','no',
                    'para','en','una'))) AS es
              FROM w)
            SELECT doc_id,
                   CASE WHEN greatest(en, de, fr, es) = 0 THEN 'unknown'
                        WHEN en = greatest(en, de, fr, es) THEN 'en'
                        WHEN de = greatest(en, de, fr, es) THEN 'de'
                        WHEN fr = greatest(en, de, fr, es) THEN 'fr'
                        ELSE 'es' END AS lang_pred
            FROM c ORDER BY doc_id
        """,
        # simhash: DuckDB has md5(), so the word-hash sign-accumulate
        # is SQL-expressible — unnest words, little-endian uint64 of
        # the first 8 digest bytes, ±1 per bit over words, sign → bit
        # (mirrors fluent_bit_ray/dataops/dedup.py simhash64 exactly)
        "doc_simhash": r"""
            WITH w AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(text, '\S+')) AS word
              FROM documents),
            h AS (
              SELECT doc_id,
                ('0x' || substr(md5(word),15,2)||substr(md5(word),13,2)||
                         substr(md5(word),11,2)||substr(md5(word),9,2)||
                         substr(md5(word),7,2)||substr(md5(word),5,2)||
                         substr(md5(word),3,2)||substr(md5(word),1,2)
                )::UBIGINT AS hv
              FROM w),
            b AS (
              SELECT doc_id, g.bit,
                     sum(CASE WHEN (hv >> g.bit) & 1 = 1
                         THEN 1 ELSE -1 END) AS acc
              FROM h, generate_series(0, 63) AS g(bit)
              GROUP BY doc_id, g.bit),
            s AS (
              SELECT doc_id,
                     CAST(sum(CASE WHEN acc > 0
                          THEN CAST(1 AS UBIGINT) << CAST(bit AS INT)
                          ELSE 0 END) AS UBIGINT) AS sim
              FROM b GROUP BY doc_id)
            SELECT d.doc_id,
                   lower(lpad(hex(coalesce(s.sim, 0)), 16, '0'))
                     AS simhash_hex
            FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id
            ORDER BY d.doc_id
        """,
        # simhash pairs: the 4-band pigeonhole blocking is LOSSLESS for
        # hamming ≤ 3, so the oracle is the quadratic exact rule over
        # the same SQL-derived signatures (cross join is benchmark-side
        # only — the engine never does all-pairs)
        "docs_simhash_pairs": r"""
            WITH w AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(text, '\S+')) AS word
              FROM documents),
            h AS (
              SELECT doc_id,
                ('0x' || substr(md5(word),15,2)||substr(md5(word),13,2)||
                         substr(md5(word),11,2)||substr(md5(word),9,2)||
                         substr(md5(word),7,2)||substr(md5(word),5,2)||
                         substr(md5(word),3,2)||substr(md5(word),1,2)
                )::UBIGINT AS hv
              FROM w),
            b AS (
              SELECT doc_id, g.bit,
                     sum(CASE WHEN (hv >> g.bit) & 1 = 1
                         THEN 1 ELSE -1 END) AS acc
              FROM h, generate_series(0, 63) AS g(bit)
              GROUP BY doc_id, g.bit),
            s AS (
              SELECT doc_id,
                     CAST(sum(CASE WHEN acc > 0
                          THEN CAST(1 AS UBIGINT) << CAST(bit AS INT)
                          ELSE 0 END) AS UBIGINT) AS sim
              FROM b GROUP BY doc_id),
            sig AS (
              SELECT d.doc_id, coalesce(s.sim, 0) AS sim
              FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id)
            SELECT a.doc_id AS key_a, b.doc_id AS key_b,
                   bit_count(xor(a.sim, b.sim))::BIGINT AS hamming
            FROM sig a JOIN sig b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.sim, b.sim)) <= 3
            ORDER BY key_a, key_b
        """,
        # fingerprint: Rabin–Karp over utf-8 bytes is expressible via
        # hex(encode(text)) byte slices + list_reduce with HUGEINT
        # modular arithmetic (mirrors textstats.fingerprint_batch)
        "doc_fingerprint": r"""
            WITH hx AS (SELECT doc_id, hex(encode(text)) AS h
                        FROM documents)
            SELECT doc_id,
              CASE WHEN length(h) = 0 THEN 0
              ELSE CAST(list_reduce(
                list_transform(range(0, length(h) // 2),
                  i -> ('0x' || substr(h, (i*2+1)::INT, 2))
                       ::UBIGINT::HUGEINT),
                (acc, b) -> (acc * 257 + b)
                            % CAST(2305843009213693951 AS HUGEINT)
              ) AS BIGINT) END AS fingerprint
            FROM hx ORDER BY doc_id
        """,
        # minhash LSH: the WHOLE pipeline in SQL — md5-based 64-bit
        # shingle hashes, the engine's own 64 permutation constants
        # inlined below, wrapping uint64 arithmetic via HUGEINT mod
        # 2^64, banding by exact signature-slice equality, and exact
        # integer (inter, uni) verification with the 0.7 threshold as
        # inter*10 >= uni*7 (no float rounding on either side)
        "docs_minhash_pairs": _minhash_oracle_sql(),
        "docs_dup_ngram_spans": _dup_ngram_oracle_sql(),
        "docs_dup_span_ranges": _dup_span_ranges_oracle_sql(),
        "docs_dup_removed": _dup_removed_oracle_sql(),
        # connected components over the minhash pair set via a
        # recursive label-reachability CTE; keep = min key per
        # component + all unpaired docs (dedup_keep_list semantics)
        "docs_dedup_keep": f"""
            WITH RECURSIVE pairs AS ({_minhash_oracle_sql()}),
            edges AS (
              SELECT key_a AS u, key_b AS v FROM pairs
              UNION
              SELECT key_b AS u, key_a AS v FROM pairs),
            nodes AS (SELECT DISTINCT u FROM edges),
            reach(u, l) AS (
              SELECT u, u FROM nodes
              UNION
              SELECT e.u, r.l FROM edges e JOIN reach r ON r.u = e.v),
            labels AS (SELECT u, min(l) AS l FROM reach GROUP BY u)
            SELECT d.doc_id::BIGINT AS doc_id FROM documents d
            WHERE d.doc_id NOT IN (SELECT u FROM labels WHERE l <> u)
            ORDER BY doc_id
        """,
        # exact all-pairs Jaccard over string shingle sets (same
        # integer-exact inter/uni convention; 0.5 threshold)
        "docs_jaccard_pairs": r"""
            WITH words AS (SELECT doc_id,
                             regexp_extract_all(text, '\S+') AS ws
                           FROM documents),
            sh AS (SELECT doc_id,
                    CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
                    ELSE list_distinct(list_transform(range(1, len(ws) - 1),
                         i -> array_to_string(ws[i:i+2], ' '))) END
                      AS shingles
                   FROM words)
            SELECT a.doc_id AS key_a, b.doc_id AS key_b,
                   len(list_intersect(a.shingles, b.shingles))::BIGINT
                     AS inter,
                   (len(a.shingles) + len(b.shingles)
                     - len(list_intersect(a.shingles, b.shingles)))::BIGINT
                     AS uni
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE len(list_intersect(a.shingles, b.shingles)) * 2 >=
                  len(a.shingles) + len(b.shingles)
                  - len(list_intersect(a.shingles, b.shingles))
            ORDER BY key_a, key_b
        """,
    }
    # the chunk-split variants must reproduce the whole-key results
    # byte-for-byte — same oracle, same hash
    sqls["multiline_chunked"] = sqls["multiline_segments"]
    sqls["convs_curated_chunked"] = sqls["convs_curated"]
    # reference-emitting variants must reproduce the SAME full results
    # through the refs path (render-at-consumer)
    sqls["collapsed_repeats_refs"] = sqls["collapsed_repeats"]
    sqls["convs_curated_refs"] = sqls["convs_curated"]
    sqls["convs_curated_refs_chunked"] = sqls["convs_curated"]
    # fused refs consumer: the oracle MATERIALIZES the rendered corpus
    # (which the engine never does), counts its tokens and replays the
    # greedy-packing recurrence (docs_pack's recursive-CTE shape,
    # single chain in conv_id order, budget 2048)
    sqls["convs_curated_packed"] = rf"""
        WITH RECURSIVE t AS ({t}),
        g AS (SELECT conv_id FROM t GROUP BY conv_id
              HAVING count(*) >= 6
                 AND count(*) FILTER (role = 'assistant') > 0
                 AND count(*) FILTER (role = 'user') > 0),
        tg AS (SELECT * FROM t
               WHERE conv_id IN (SELECT conv_id FROM g)),
        bad AS (SELECT text FROM tg
                GROUP BY text HAVING count(DISTINCT conv_id) >= 5),
        tb AS (SELECT * FROM tg
               WHERE text NOT IN (SELECT text FROM bad)),
        runs AS (SELECT conv_id, turn_idx, role, text,
                        row_number() OVER (PARTITION BY conv_id
                                           ORDER BY turn_idx)
                      - row_number() OVER (PARTITION BY conv_id, role,
                                           text ORDER BY turn_idx)
                        AS grp
                 FROM tb),
        coll AS (SELECT conv_id, min(turn_idx) AS turn_idx, role, text
                 FROM runs GROUP BY conv_id, role, text, grp),
        conv AS (SELECT conv_id,
                        string_agg(role || ': ' || text, chr(10)
                                   ORDER BY turn_idx) AS rendered
                 FROM coll GROUP BY conv_id),
        d AS (SELECT conv_id,
                     len(regexp_extract_all(rendered, '\S+'))::BIGINT
                       AS n,
                     CAST({_h64_sql('md5(conv_id)')} % 16 AS BIGINT)
                       AS shard,
                     row_number() OVER (
                       PARTITION BY {_h64_sql('md5(conv_id)')} % 16
                       ORDER BY conv_id) AS rn
              FROM conv),
        r AS (SELECT conv_id, n, shard, rn,
                     0::BIGINT AS bin_idx, n AS cum
              FROM d WHERE rn = 1
              UNION ALL
              SELECT d.conv_id, d.n, d.shard, d.rn,
                     CASE WHEN r.cum + d.n <= 2048 THEN r.bin_idx
                          ELSE r.bin_idx + 1 END,
                     CASE WHEN r.cum + d.n <= 2048 THEN r.cum + d.n
                          ELSE d.n END
              FROM r JOIN d ON d.shard = r.shard AND d.rn = r.rn + 1)
        SELECT conv_id, n AS n_tokens, shard, bin_idx
        FROM r ORDER BY conv_id
    """
    sqls["collapsed_repeats_chunked"] = sqls["collapsed_repeats"]
    sqls["turn_gaps_chunked"] = sqls["turn_gaps"]
    return sqls
