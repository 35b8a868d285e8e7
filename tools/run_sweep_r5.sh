#!/bin/bash
# Round-5 scaling sweep: transcript family incl. the reference-emitting
# variants (chunk G), dedup family on the vectorized content key
# (chunk H). QUIET-HOST RULE: nothing else may run on the box — two r5
# sweeps were poisoned by concurrent pytest/bench work (NOTES_r5.md);
# trust a chunk only when both ab_ref readings are <= ~0.55.
set -e
cd /root/repo
run_chunk () {
  name=$1; only=$2; sfdir=${3:-/root/testdata/sf4}
  echo "=== chunk $name: $only ($sfdir)"
  GRAFT_BENCH_ONLY=$only SCALING_REPS=2 SCALING_SF_DIR=$sfdir \
    python bench.py --scaling \
    2>/dev/null | tail -1 > tools/scaling_runs/r5_$name.json
  python - <<PY
import json
d = json.load(open("tools/scaling_runs/r5_$name.json"))
print({k: v["efficiency"] for k, v in d["per_query"].items()},
      "ab", d["ab_ref_lo"], d["ab_ref_hi"])
PY
}
case "${1:-all}" in
  G|all) run_chunk G_sf4 multiline,sft_pairs_refs,collapse_repeats,collapse_repeats_refs,convs_curated,convs_curated_refs,turn_gaps ;;&
  H|all) run_chunk H_sf4 dedup_exact_docs,minhash_pairs,simhash ;;&
  J|all) run_chunk J_sf4 bm25_topk,segment_dedup ;;&  # r5 session-3 ops
esac
