#!/bin/bash
# Round-4 FINAL scaling sweep (post read-block fix, single-exchange
# curate, streamed splits). Run AFTER the last library commit with
# NOTHING else on the host.
#
# ab_ref note (corrected this round): /etc/profile.d/zz-ray.sh pins
# OMP_NUM_THREADS=1, so the quiet single-core calibration value is
# ~0.46, NOT the ~0.2 cited in earlier notes (that figure came from a
# multithreaded-BLAS regime). Treat a chunk as quiet-window when both
# ab_ref readings are <= ~0.55; rerun chunks that caught a throttled
# window (the host halves its effective clock invisibly — zero steal
# reported, load 0).
#
# sf1 chunks A-F mirror sweep4 for continuity. G/H rerun the
# transcript and dedup families at sf4: the raw hash exchange made
# those ops fast enough that at sf1 their 16-CPU runs are dominated by
# the ~1.5 s fixed per-execution overhead (T16 ~2 s), which reads as
# poor scaling but is a measurement floor, not a scale defect.
set -e
cd /root/repo
run_chunk () {
  name=$1; only=$2; sfdir=${3:-/root/testdata/sf1}
  echo "=== chunk $name: $only ($sfdir)"
  GRAFT_BENCH_ONLY=$only SCALING_REPS=2 SCALING_SF_DIR=$sfdir \
    python bench.py --scaling \
    2>/dev/null | tail -1 > tools/scaling_runs/r4_sweep5_$name.json
  python - <<PY
import json
d = json.load(open("tools/scaling_runs/r4_sweep5_$name.json"))
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
  G|all) run_chunk G_sf4 multiline,sft_pairs_refs,collapse_repeats,convs_curated,turn_gaps /root/testdata/sf4 ;;&
  H|all) run_chunk H_sf4 dedup_exact_docs,minhash_pairs,simhash /root/testdata/sf4 ;;&
esac
