#!/bin/bash
# Round-4 final scaling sweep: run AFTER the last library commit, on a
# host with ab_ref near its quiet value (~0.2), with NOTHING else
# running (DuckDB gate runs poison calibration — NOTES_r4.md).
# Each chunk is one bench.py --scaling invocation (4 vs 16 CPUs, sf1,
# interleaved best-of-2) writing tools/scaling_runs/r4_sweep4_<X>.json.
set -e
cd /root/repo
run_chunk () {
  name=$1; only=$2
  echo "=== chunk $name: $only"
  GRAFT_BENCH_ONLY=$only SCALING_REPS=2 python bench.py --scaling \
    2>/dev/null | tail -1 > tools/scaling_runs/r4_sweep4_$name.json
  python - <<PY
import json
d = json.load(open("tools/scaling_runs/r4_sweep4_$name.json"))
print({k: v["efficiency"] for k, v in d["per_query"].items()},
      "ab", d["ab_ref_lo"], d["ab_ref_hi"])
PY
}
case "${1:-all}" in
  A|all) run_chunk A parse_route_count,flowcounter,multiline ;;&
  B|all) run_chunk B collapse_repeats,sft_pairs_refs,convs_curated,turn_gaps ;;&
  C|all) run_chunk C dedup_exact_docs,minhash_pairs,simhash ;;&
  D|all) run_chunk D decontaminate,repetition_stats,pack_sequences,curated_pipeline ;;&
  E|all) run_chunk E keyword_search,quality_model,dup_removed,wide_record ;;&
  F|all) run_chunk F rolling_window,rolling_time_window ;;&
esac
