#!/bin/bash
# Round-4 FINAL scaling sweep, post hot-key-splitting (salted exchange,
# halo chunks, dense sft refs, chunked collapse). Mirrors sweep5's
# chunks; results r4_sweep6_*. Read efficiencies against the HOST
# ceilings (tools/host_ceiling.py): compute-bound 0.83, memcpy-bound
# 0.33-0.45 — a quiet-window chunk needs both ab_ref readings <= ~0.55.
set -e
cd /root/repo
run_chunk () {
  name=$1; only=$2; sfdir=${3:-/root/testdata/sf1}
  echo "=== chunk $name: $only ($sfdir)"
  GRAFT_BENCH_ONLY=$only SCALING_REPS=2 SCALING_SF_DIR=$sfdir \
    python bench.py --scaling \
    2>/dev/null | tail -1 > tools/scaling_runs/r4_sweep6_$name.json
  python - <<PY
import json
d = json.load(open("tools/scaling_runs/r4_sweep6_$name.json"))
print({k: v["efficiency"] for k, v in d["per_query"].items()},
      "ab", d["ab_ref_lo"], d["ab_ref_hi"])
PY
}
case "${1:-all}" in
  A|all) run_chunk A parse_route_count,flowcounter,multiline ;;&
  B|all) run_chunk B collapse_repeats,sft_pairs_refs,convs_curated,turn_gaps ;;&
  C|all) run_chunk C dedup_exact_docs,minhash_pairs,simhash ;;&
  F|all) run_chunk F rolling_window,rolling_time_window ;;&
  G|all) run_chunk G_sf4 multiline,sft_pairs_refs,collapse_repeats,convs_curated,turn_gaps /root/testdata/sf4 ;;&
  H|all) run_chunk H_sf4 dedup_exact_docs,minhash_pairs,simhash /root/testdata/sf4 ;;&
esac
