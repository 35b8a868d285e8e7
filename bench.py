"""Benchmark harness.

Prints ONE JSON line:
  {"metric": ..., "value": <headline median sec>, "unit": "sec",
   "queries": {...medians...}, "queries_best": {...}, "reps": R,
   "ab_ref": <calibration sec>, "sf": ..., "num_cpus": N,
   "turns_per_sec": ...}

Headline = the flagship parse→enrich→route→aggregate pipeline over the
synthetic transcript table at $GRAFT_SF_DIR scale (default sf0.1,
600k turns), consumed via per-sink counts + flowcounter (no driver
materialization of the row stream).

Noise armor (this host shows ±25% CPU-steal drift): every benchmark
runs $BENCH_REPS (default 3) INTERLEAVED passes — pass k runs every
query once, so a bad host minute hits all queries alike — and reports
the per-query MEDIAN (plus best). ``ab_ref`` is a PINNED single-core
numpy calibration workload (fixed size, never changes across rounds)
measured in the same process-minute: compare ab_ref across BENCH_r*.json
files to separate host-speed drift from real code regressions.

--scaling: runs the full bench twice in FRESH processes at $SCALING_LO
(default 4) and $SCALING_HI (default 16) CPUs on the same input and
reports headline + PER-QUERY throughput at both levels plus scaling
efficiency. The dedup-family queries run against the driver's
documents.parquet when present, else a deterministic synthetic table
at the matching scale (fluent_bit_ray/sources/documents.py), so the
dataops pipelines get scaling evidence at sf1 too.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time


def _calibration_sec() -> float:
    """Pinned single-core workload (NEVER change: cross-round host
    speed reference). ~0.2 s on a quiet core."""
    import numpy as np
    a = np.random.RandomState(0).rand(384, 384)
    t0 = time.perf_counter()
    x = a
    for _ in range(60):
        x = x @ a
        x /= np.abs(x).max()
    return round(time.perf_counter() - t0, 4)


def _docs_path(sf_dir: str) -> str | None:
    """documents table for the dedup-family benches: the driver's when
    present (and no multiplier), else the deterministic synthetic one.
    $GRAFT_DOCS_MULT scales the synthetic table (scaling mode sets 16 ⇒
    800k docs at sf1) so sub-second jobs aren't fixed-overhead noise.

    The driver table is RE-SHARDED once into a cached multi-file copy
    (same rows, one read task per file): Ray reads a single parquet
    file as ONE serial task, which starves every downstream dedup
    stage — an input-layout artifact, not an operator cost.
    """
    mult = float(os.environ.get("GRAFT_DOCS_MULT", "1"))
    p = f"{sf_dir}/documents.parquet"
    if os.path.exists(p) and mult == 1:
        import pyarrow.parquet as pq
        tag = os.path.basename(os.path.normpath(sf_dir))
        d = f"/tmp/graft_docs/driver_shards/{tag}"
        if not os.path.isdir(d):
            tab = pq.read_table(p)
            # driver tables are small (≤50k docs): shard finer so the
            # read still fans out across a 32-CPU node
            shards = max(1, min(64, tab.num_rows // 1_000))
            step = -(-tab.num_rows // shards)
            tmp = d + ".tmp"
            os.makedirs(tmp, exist_ok=True)
            for i in range(shards):
                part = tab.slice(i * step, step)
                if part.num_rows:
                    pq.write_table(part,
                                   os.path.join(tmp, f"part-{i:05d}.parquet"),
                                   row_group_size=2048)
            os.replace(tmp, d)
        return d
    try:
        from fluent_bit_ray.sources.documents import ensure_documents
        from fluent_bit_ray.sources.transcripts import sf_from_dir
        return ensure_documents(sf_from_dir(sf_dir) * mult)
    except Exception:
        return None


def _events_path(sf_dir: str) -> str:
    """events table for the window benches: the driver's when present
    (and no multiplier), else the deterministic synthetic one (scaling
    mode runs at sf1, which the driver does not ship, with
    $GRAFT_EVENTS_MULT sized so the job isn't fixed-overhead noise)."""
    mult = float(os.environ.get("GRAFT_EVENTS_MULT", "1"))
    p = f"{sf_dir}/events.parquet"
    if os.path.exists(p) and mult == 1:
        return p
    from fluent_bit_ray.sources.events import ensure_events
    from fluent_bit_ray.sources.transcripts import sf_from_dir
    return ensure_events(sf_from_dir(sf_dir) * mult)


def run_bench() -> None:
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("BENCH_REPS", "3"))

    import ray
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    # Ray's default read parallelism floor is 200 blocks regardless of
    # cluster size; on these CPU-bound vectorized kernels that shreds
    # small-table jobs into ~15 ms tasks where dispatch dominates
    # (exact dedup measured 5.1 s wall for ~0.6 s of ideal compute).
    # 4 blocks/CPU keeps every core busy with real work.
    ctx.read_op_min_num_blocks = max(8, 4 * num_cpus)

    from fluent_bit_ray.pipelines.flagship import build_flagship
    from fluent_bit_ray.sinks import flowcounter
    from fluent_bit_ray.sources.transcripts import (ensure_transcripts,
                                                    n_rows_for_sf,
                                                    read_transcripts,
                                                    sf_from_dir)

    ensure_transcripts(sf_dir)
    n_rows = n_rows_for_sf(sf_from_dir(sf_dir))

    # warm: OS page cache AND the Ray worker pool (the first executed
    # dataset pays worker spawn + import + JIT costs) with ONE untimed
    # run of the same workload, then measure steady-state throughput
    import ray.data as rd
    read_transcripts(sf_dir).count()
    build_flagship().run(read_transcripts(sf_dir)).sink_counts()

    counts_box: dict = {}

    def headline():
        routed = build_flagship().run(read_transcripts(sf_dir))
        counts_box["counts"] = routed.sink_counts()
        return counts_box["counts"]

    def bench_parse_only():
        routed = build_flagship(with_rewrite=False, with_enrich=False,
                                emit_fields=False) \
            .run(read_transcripts(sf_dir))
        return routed.ds.count()

    def bench_flowcounter():
        routed = build_flagship(with_rewrite=False, with_enrich=False,
                                emit_fields=False) \
            .run(read_transcripts(sf_dir))
        return flowcounter(routed.ds, unit="minute", combine="driver")

    def bench_multiline():
        from fluent_bit_ray.stages import build_stage
        st = build_stage({"type": "multiline",
                          "firstline": r"^(\d|\{|CALL )"})
        return st.apply(read_transcripts(sf_dir)).count()

    docs = _docs_path(sf_dir)
    # the cheapest dedup kernels finish in ~2 s at the hi CPU level,
    # where the ~0.7 s fixed per-execution cost (plan + task ramp)
    # floors measured scaling; scaling mode points them at a 4× table
    # so the measurement reflects the operators, not session overhead
    heavy_mult = float(os.environ.get("GRAFT_DOCS_MULT_HEAVY", "0"))
    if docs and heavy_mult > 0:
        from fluent_bit_ray.sources.documents import ensure_documents
        from fluent_bit_ray.sources.transcripts import sf_from_dir
        docs_heavy = ensure_documents(sf_from_dir(sf_dir) * heavy_mult)
    else:
        docs_heavy = docs

    def bench_dedup_exact():
        from fluent_bit_ray.dataops import exact_dedup
        return exact_dedup(rd.read_parquet(docs_heavy)).count()

    def bench_minhash():
        from fluent_bit_ray.dataops import minhash_dup_pair_counts
        return len(minhash_dup_pair_counts(rd.read_parquet(docs)))

    def bench_simhash():
        from fluent_bit_ray.dataops.dedup import simhash_ds
        return simhash_ds(rd.read_parquet(docs_heavy)).count()

    def bench_decontaminate():
        from fluent_bit_ray.dataops import (benchmark_ngram_hashes,
                                            decontaminate)
        # heavy table in scaling mode: the two fixed per-execution
        # costs (bench pass + flag pass) floor the ratio on the small
        # table (0.71 at mult16 vs 0.83+ compute-only)
        dd = rd.read_parquet(docs_heavy)
        bench_side = dd.map_batches(
            lambda df: df[df["doc_id"] % 20 == 0], batch_format="pandas")
        bh = benchmark_ngram_hashes(bench_side, ngram=5)
        return decontaminate(dd, bh, ngram=5).count()

    def bench_repetition():
        from fluent_bit_ray.dataops import repetition_stats
        return repetition_stats(rd.read_parquet(docs_heavy)).count()

    def bench_pack():
        from fluent_bit_ray.dataops import pack_sequences
        return pack_sequences(rd.read_parquet(docs), budget=128,
                              shards=8).count()

    def bench_curated():
        from fluent_bit_ray.dataops import curate_corpus
        weights = {f"src{i}": (100, 50, 30, 10)[i % 4] for i in range(64)}
        return curate_corpus(rd.read_parquet(docs), weights,
                             budget=128).count()

    def bench_hash_join():
        from fluent_bit_ray.joins import hash_join
        orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                                 columns=["o_orderkey", "o_custkey"])
        cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                               columns=["c_custkey", "c_mktsegment"])
        # partitions sized to the DATA (one per ~20k rows), not the
        # CPU count: each partition is a hash-aggregator actor and
        # 32 of them cost ~6 s of spawn for a 150k-row join (measured
        # 9.2 s at 32 vs 3.2 s at 8); at 100 TB you size partitions
        # so one fits an aggregator heap and spawn amortizes
        return hash_join(orders, cust, on="o_custkey",
                         right_on="c_custkey",
                         num_partitions=8).count()

    def bench_asof_join():
        from fluent_bit_ray.joins import asof_join
        ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["event_id", "ts", "user_id",
                                      "event_type"])
        p = ev.map_batches(
            lambda df: df[df["event_type"] == "purchase"]
            [["event_id", "ts", "user_id"]], batch_format="pandas")
        v = ev.map_batches(
            lambda df: df[df["event_type"] == "view"]
            [["ts", "user_id"]].assign(v=1), batch_format="pandas")
        return asof_join(p, v, on="ts", by="user_id",
                         partitions=num_cpus).count()

    def bench_hll():
        from fluent_bit_ray.dataops.sketch import hll_registers
        ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["event_type", "user_id"])
        return hll_registers(ev, "user_id",
                             group_col="event_type").count()

    def bench_cms():
        from fluent_bit_ray.dataops.sketch import cms_registers
        ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["user_id"])
        return cms_registers(ev, "user_id").count()

    def bench_sft():
        from fluent_bit_ray.dataops.sft import sft_examples
        ds = read_transcripts(sf_dir, columns=["conv_id", "turn_idx",
                                               "role", "text"])
        return sft_examples(ds, context_turns=4).count()

    def bench_sft_refs():
        # reference-emitting variant: constant-size rows, no context
        # text transits the object store (the 100 TB / scaling shape)
        from fluent_bit_ray.dataops.sft import sft_example_refs
        ds = read_transcripts(sf_dir, columns=["conv_id", "turn_idx",
                                               "role", "text"])
        return sft_example_refs(ds, context_turns=4,
                                assume_dense_order=True).count()

    def bench_collapse():
        from fluent_bit_ray.dataops.sft import collapse_repeats
        ds = read_transcripts(sf_dir, columns=["conv_id", "turn_idx",
                                               "role", "text"])
        return collapse_repeats(ds, chunk_rows=1 << 18).count()

    def bench_collapse_refs():
        # reference-emitting variant: only (conv, turn, role, h64)
        # transits the exchange; text stays in its source blocks
        from fluent_bit_ray.dataops.sft import collapse_repeat_refs
        ds = read_transcripts(sf_dir, columns=["conv_id", "turn_idx",
                                               "role", "text"])
        return collapse_repeat_refs(ds, chunk_rows=1 << 18).count()

    def bench_convs_curated_refs():
        # reference-emitting curation: no text through any exchange
        from fluent_bit_ray.dataops.sft import curate_transcript_refs
        ds = read_transcripts(sf_dir, columns=["conv_id", "turn_idx",
                                               "role", "text"])
        return curate_transcript_refs(ds).count()

    def bench_keyword():
        from fluent_bit_ray.dataops.search import keyword_search_topk
        ds = rd.read_parquet(docs_heavy, columns=["doc_id", "text"])
        return len(keyword_search_topk(
            ds, ["hash", "window", "spark", "zzzmissing"], k=20))

    def bench_bm25():
        from fluent_bit_ray.dataops.search import bm25_topk
        ds = rd.read_parquet(docs_heavy, columns=["doc_id", "text"])
        return len(bm25_topk(
            ds, ["hash", "window", "spark", "zzzmissing"], k=20))

    def bench_segdedup():
        from fluent_bit_ray.dataops.segdedup import segment_dedup
        ds = rd.read_parquet(docs_heavy, columns=["doc_id", "text"])
        return segment_dedup(ds, words=10).count()

    def bench_convs_curated():
        from fluent_bit_ray.dataops.sft import curate_transcripts
        ds = read_transcripts(sf_dir, columns=["conv_id", "turn_idx",
                                               "role", "text"])
        return curate_transcripts(ds).count()

    # reference tests/runtime/gen_data.py JSON_LONG shape: 1000 string
    # keys per record. Pre-cached as parquet shards OUTSIDE the timed
    # region ($GRAFT_WIDE_ROWS: scaling mode raises the row count so
    # the fixed-size table has enough work to measure efficiency) —
    # generating 16k × 16 KB JSON strings is ~2 s of serial driver
    # work that used to poison the measurement.
    from fluent_bit_ray.sources.wide import ensure_wide_records
    wide_path = ensure_wide_records(
        int(os.environ.get("GRAFT_WIDE_ROWS", "4096")), 1000)

    def bench_wide_record():
        from fluent_bit_ray.pipelines.pipeline import Pipeline
        # batch size left on "auto": the byte-driven sizing reads the
        # ~16 KB rows from input metadata and picks ~256-row batches
        # (a fixed 16384-row batch would coalesce the whole table into
        # ONE task and put ~256 MB of decoded dicts in one worker heap)
        pipe = Pipeline(stages=[
            {"type": "parser", "key_name": "text",
             "parsers": [{"name": "json", "format": "json"}]},
            {"type": "modify", "rules": [("rename", "key_0", "first_key"),
                                         ("set", "marker", "wide")]},
            {"type": "nest", "operation": "nest", "wildcard": ["key_9*"],
             "nest_under": "bucket9"},
        ], sinks=[("all", "*")])
        return pipe.run(rd.read_parquet(wide_path)).ds.count()

    def bench_quality_model():
        from fluent_bit_ray.dataops import quality_model_scores
        ds = rd.read_parquet(docs_heavy, columns=["doc_id", "text"])
        return quality_model_scores(ds).count()

    def bench_dup_removed():
        from fluent_bit_ray.dataops.substring import remove_dup_ngram_spans
        ds = rd.read_parquet(docs, columns=["doc_id", "text"])
        return remove_dup_ngram_spans(ds, k=8, min_docs=2).count()

    def bench_normalize():
        from fluent_bit_ray.dataops import normalize_ds
        ds = rd.read_parquet(docs_heavy, columns=["doc_id", "text"])
        return normalize_ds(ds).count()

    def bench_epoch_shuffle():
        from fluent_bit_ray.dataops import epoch_shuffle
        ds = rd.read_parquet(docs_heavy, columns=["doc_id"])
        return epoch_shuffle(ds, seed=7).count()

    def bench_bpe():
        from fluent_bit_ray.dataops import bpe_train
        ds = rd.read_parquet(docs_heavy, columns=["doc_id", "text"])
        return len(bpe_train(ds, num_merges=12, max_words=50_000))

    def bench_rolling():
        from fluent_bit_ray.dataops.windows import rolling_window
        ev = rd.read_parquet(_events_path(sf_dir),
                             columns=["event_id", "ts", "user_id", "value"])
        return rolling_window(ev, key="user_id",
                              order=["ts", "event_id"], value_col="value",
                              window=5, keep_cols=["event_id"]).count()

    def bench_rolling_time():
        from fluent_bit_ray.dataops.windows import rolling_time_window
        ev = rd.read_parquet(_events_path(sf_dir),
                             columns=["event_id", "ts", "user_id", "value"])
        return rolling_time_window(ev, key="user_id", ts_col="ts",
                                   value_col="value", span_s=600.0,
                                   keep_cols=["event_id"]).count()

    def bench_turn_gaps():
        from fluent_bit_ray.dataops.windows import shift_within_key
        from fluent_bit_ray.sources.transcripts import read_transcripts
        ds = read_transcripts(sf_dir, columns=["conv_id", "turn_idx", "ts"])
        return shift_within_key(ds, key="conv_id", order=["turn_idx"],
                                cols=["ts"], periods=1,
                                keep_cols=["conv_id", "turn_idx"],
                                chunk_rows=1 << 18).count()

    benches = [("flagship_e2e", headline),
               ("parse_route_count", bench_parse_only),
               ("flowcounter", bench_flowcounter),
               ("multiline", bench_multiline),
               ("sft_pairs", bench_sft),
               ("sft_pairs_refs", bench_sft_refs),
               ("wide_record", bench_wide_record),
               ("collapse_repeats", bench_collapse),
               ("collapse_repeats_refs", bench_collapse_refs),
               ("convs_curated", bench_convs_curated),
               ("convs_curated_refs", bench_convs_curated_refs)]
    if docs:
        benches += [("dedup_exact_docs", bench_dedup_exact),
                    ("minhash_pairs", bench_minhash),
                    ("simhash", bench_simhash),
                    ("decontaminate", bench_decontaminate),
                    ("repetition_stats", bench_repetition),
                    ("pack_sequences", bench_pack),
                    ("curated_pipeline", bench_curated),
                    ("keyword_search", bench_keyword),
                    ("quality_model", bench_quality_model),
                    ("dup_removed", bench_dup_removed),
                    ("normalize_text", bench_normalize),
                    ("epoch_shuffle", bench_epoch_shuffle),
                    ("bpe_train", bench_bpe),
                    ("bm25_topk", bench_bm25),
                    ("segment_dedup", bench_segdedup)]
    if os.path.exists(f"{sf_dir}/orders.parquet"):
        benches += [("hash_join", bench_hash_join),
                    ("asof_join", bench_asof_join),
                    ("hll_sketch", bench_hll),
                    ("cms_sketch", bench_cms)]
    benches += [("rolling_window", bench_rolling),
                ("rolling_time_window", bench_rolling_time),
                ("turn_gaps", bench_turn_gaps)]

    # GRAFT_BENCH_ONLY=a,b,c: focused runs (scaling forensics) — the
    # flagship headline is always kept so the JSON contract holds
    only = os.environ.get("GRAFT_BENCH_ONLY")
    if only:
        keep = set(only.split(",")) | {"flagship_e2e"}
        benches = [(n, f) for n, f in benches if n in keep]

    # interleaved passes: one full sweep per rep so a bad host minute
    # lands on every query equally, medians across passes
    times: dict[str, list[float]] = {name: [] for name, _ in benches}
    ab: list[float] = []
    for _ in range(reps):
        ab.append(_calibration_sec())
        for name, fn in benches:
            t0 = time.perf_counter()
            fn()
            times[name].append(time.perf_counter() - t0)

    queries = {n: round(statistics.median(ts), 3) for n, ts in times.items()}
    queries_best = {n: round(min(ts), 3) for n, ts in times.items()}
    headline_sec = queries["flagship_e2e"]
    print(json.dumps({
        "metric": "flagship parse→enrich→route→aggregate e2e "
                  "(turns/sec in turns_per_sec)",
        "value": headline_sec,
        "unit": "sec",
        "queries": queries,
        "queries_best": queries_best,
        "reps": reps,
        "ab_ref": round(statistics.median(ab), 4),
        "sf": sf_from_dir(sf_dir),
        "rows": n_rows,
        "turns_per_sec": round(n_rows / headline_sec, 1),
        "num_cpus": num_cpus,
        "sink_counts": counts_box.get("counts"),
    }))
    ray.shutdown()


def run_scaling() -> None:
    lo = int(os.environ.get("SCALING_LO", "4"))
    hi = int(os.environ.get("SCALING_HI", "16"))
    # N=4 vs 4N=16 on sf1 (6M turns): enough work to amortize the ~1.5s
    # fixed per-execution overhead, and within the 32-core host's memory
    # bandwidth at both levels (8→32 measures lower because all-32-core
    # runs are bandwidth-saturated — see BASELINE.md).
    # Input is synthesized+cached up front so neither child pays generation.
    sf_dir = os.environ.get("SCALING_SF_DIR", "/root/testdata/sf1")
    from fluent_bit_ray.sources.transcripts import ensure_transcripts
    ensure_transcripts(sf_dir)
    # 16 ⇒ 800k synthetic docs at sf1: big enough that the short dedup
    # jobs (simhash ~16 s of total CPU at mult 8) are not dominated by
    # the ~1 s fixed per-execution overhead at the hi level
    os.environ.setdefault("GRAFT_DOCS_MULT", "16")
    os.environ.setdefault("GRAFT_DOCS_MULT_HEAVY", "64")
    os.environ.setdefault("GRAFT_WIDE_ROWS", "16384")
    # 32 ⇒ 32M events: the raw hash exchange cut rolling_window ~6×,
    # so at mult 8 the job is fixed-overhead-floored at the hi level
    os.environ.setdefault("GRAFT_EVENTS_MULT", "32")
    _docs_path(sf_dir)  # pre-cache the synthetic documents table too
    from fluent_bit_ray.sources.documents import ensure_documents
    from fluent_bit_ray.sources.transcripts import sf_from_dir
    ensure_documents(sf_from_dir(sf_dir)
                     * float(os.environ["GRAFT_DOCS_MULT_HEAVY"]))
    _events_path(sf_dir)  # pre-cache synthetic events for the window benches

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SF_DIR=sf_dir,
                   BENCH_REPS=os.environ.get("SCALING_BENCH_REPS", "1"),
                   GRAFT_DOCS_MULT=os.environ.get("GRAFT_DOCS_MULT", "8"))
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=env, capture_output=True, text=True,
                             check=True,
                             cwd=os.path.dirname(os.path.abspath(__file__)))
        return json.loads(out.stdout.strip().splitlines()[-1])

    # the sandbox host shows CPU-steal noise: interleave lo/hi runs and
    # take the best per level so drift hits both levels alike
    reps = int(os.environ.get("SCALING_REPS", "2"))
    runs_lo, runs_hi = [], []
    for _ in range(reps):
        runs_lo.append(run(lo))
        runs_hi.append(run(hi))
    r_lo = min(runs_lo, key=lambda r: r["value"])
    r_hi = min(runs_hi, key=lambda r: r["value"])
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    ratio = hi / lo

    def best_q(runs, q):
        return min(r["queries"][q] for r in runs if q in r["queries"])

    per_query = {}
    for q in r_hi["queries"]:
        ql = best_q(runs_lo, q)
        qh = best_q(runs_hi, q)
        per_query[q] = {"sec_lo": ql, "sec_hi": qh,
                        "efficiency": round((ql / qh) / ratio, 3)}

    eff = (t_lo / t_hi) / ratio
    print(json.dumps({
        "metric": f"scaling efficiency {lo}→{hi} cpus",
        "cpus_lo": lo, "cpus_hi": hi,
        "sec_lo": t_lo, "sec_hi": t_hi,
        "turns_per_sec_lo": r_lo["turns_per_sec"],
        "turns_per_sec_hi": r_hi["turns_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "per_query": per_query,
        "ab_ref_lo": r_lo.get("ab_ref"), "ab_ref_hi": r_hi.get("ab_ref"),
        "sf": r_hi["sf"], "rows": r_hi["rows"],
    }))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        run_bench()
