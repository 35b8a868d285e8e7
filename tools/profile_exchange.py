"""Phase profiler for exchange-backed ops: run ONE op at a given CPU
count and aggregate ray.timeline() task events into per-phase wall /
CPU-seconds, so 4-vs-16 scaling losses can be attributed to a phase
(upstream read, split, reduce, driver gaps) instead of guessed at.

Usage:
    python tools/profile_exchange.py <cpus> <op> [sf_dir]

ops: multiline | collapse_repeats | dedup_exact | minhash | convs_curated
     | sft_refs | turn_gaps
"""

from __future__ import annotations

import json
import os
import sys
import time


def run_op(op: str, sf_dir: str):
    from fluent_bit_ray.sources.transcripts import read_transcripts

    if op == "multiline":
        from fluent_bit_ray.stages import build_stage
        st = build_stage({"type": "multiline",
                          "firstline": r"^(\d|\{|CALL )"})
        return st.apply(read_transcripts(sf_dir)).count()
    if op == "multiline_nochunk":
        from fluent_bit_ray.stages import build_stage
        st = build_stage({"type": "multiline", "chunk_rows": None,
                          "firstline": r"^(\d|\{|CALL )"})
        return st.apply(read_transcripts(sf_dir)).count()
    if op == "multiline_pandas":
        from fluent_bit_ray.stages import build_stage
        st = build_stage({"type": "multiline", "engine": "pandas",
                          "firstline": r"^(\d|\{|CALL )"})
        return st.apply(read_transcripts(sf_dir)).count()
    if op == "collapse_repeats":
        from fluent_bit_ray.dataops.sft import collapse_repeats
        return collapse_repeats(read_transcripts(sf_dir)).count()
    if op == "turn_gaps":
        from fluent_bit_ray.dataops.sft import turn_gaps
        return turn_gaps(read_transcripts(sf_dir)).count()
    if op == "sft_refs":
        from fluent_bit_ray.dataops.sft import sft_example_refs
        return sft_example_refs(read_transcripts(sf_dir)).count()
    if op == "convs_curated":
        from fluent_bit_ray.dataops.sft import curate_transcripts
        return curate_transcripts(read_transcripts(sf_dir)).count()
    if op == "dedup_exact":
        from fluent_bit_ray.dataops.dedup import exact_dedup
        import ray.data as rd
        docs = rd.read_parquet(f"{sf_dir}/documents.parquet")
        return exact_dedup(docs, text_col="text", id_col="doc_id").count()
    raise SystemExit(f"unknown op {op}")


def aggregate(trace: list[dict], t_start_us: float) -> dict:
    """Per task-name: count, total CPU-seconds, phase span (first start
    → last end, relative to run start)."""
    phases: dict[str, dict] = {}
    for ev in trace:
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        name = ev.get("name", "?")
        # collapse Ray Data operator task names and our remote fns
        if "::" in name:
            name = name.split("::")[-1]
        ts, dur = ev["ts"], ev["dur"]
        if ts + dur < t_start_us:      # warmup / prior work
            continue
        p = phases.setdefault(name, {"n": 0, "cpu_s": 0.0,
                                     "first": float("inf"), "last": 0.0})
        p["n"] += 1
        p["cpu_s"] += dur / 1e6
        p["first"] = min(p["first"], (ts - t_start_us) / 1e6)
        p["last"] = max(p["last"], (ts + dur - t_start_us) / 1e6)
    for p in phases.values():
        p["cpu_s"] = round(p["cpu_s"], 2)
        p["span"] = [round(p.pop("first"), 2), round(p.pop("last"), 2)]
    return dict(sorted(phases.items(), key=lambda kv: -kv[1]["cpu_s"]))


def main() -> None:
    cpus = int(sys.argv[1])
    op = sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf4"

    import ray
    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.read_op_min_num_blocks = max(8, 4 * cpus)

    from fluent_bit_ray.sources.transcripts import ensure_transcripts
    ensure_transcripts(sf_dir)

    run_op(op, sf_dir)            # warm: page cache + worker pool
    t0 = time.time()
    t0_us = t0 * 1e6
    n = run_op(op, sf_dir)
    wall = time.time() - t0

    tl_path = f"/tmp/ray_timeline_{op}_{cpus}.json"
    ray.timeline(filename=tl_path)
    trace = json.load(open(tl_path))
    phases = aggregate(trace, t0_us)
    total_cpu = sum(p["cpu_s"] for p in phases.values())
    print(json.dumps({"op": op, "cpus": cpus, "sf_dir": sf_dir,
                      "rows": int(n), "wall_s": round(wall, 2),
                      "task_cpu_s": round(total_cpu, 2),
                      "cpu_util": round(total_cpu / (wall * cpus), 3),
                      "phases": phases}, indent=1))
    ray.shutdown()


if __name__ == "__main__":
    main()
