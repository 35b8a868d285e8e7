"""Job entrypoint for ``ray job submit``.

Example (multi-node cluster per the north rule; local mode here):

    ray job submit --working-dir . -- \
        python -m fluent_bit_ray.cli \
        --input /data/transcripts --output /data/out --wave-files 16

Runs the flagship pipeline over the input shard files in resumable
waves (per-partition lineage manifests under <output>/_lineage); a
re-submitted job skips completed waves. This module is the ONLY
library-side ``ray.init`` owner, and only when run as a script.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="fluent_bit_ray")
    ap.add_argument("--input", required=True,
                    help="input dir of transcript parquet shards, or an "
                         "sf dir name (e.g. /root/testdata/sf0.01) to use "
                         "the synthetic table")
    ap.add_argument("--output", required=True)
    ap.add_argument("--wave-files", type=int, default=16)
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--no-rewrite", action="store_true")
    ap.add_argument("--no-enrich", action="store_true")
    args = ap.parse_args(argv)

    import ray
    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 num_cpus=args.num_cpus, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from fluent_bit_ray.pipelines.flagship import build_flagship
    from fluent_bit_ray.state import LineageRunner

    inp = args.input
    base = os.path.basename(os.path.normpath(inp))
    if base.startswith("sf"):  # an sf scale dir → the synthetic table
        from fluent_bit_ray.sources.transcripts import ensure_transcripts
        files = sorted(glob.glob(
            os.path.join(ensure_transcripts(inp), "*.parquet")))
    else:
        files = sorted(glob.glob(os.path.join(inp, "*.parquet")))
    if not files:
        print(f"no parquet shards under {inp}", file=sys.stderr)
        return 2

    pipeline = build_flagship(with_rewrite=not args.no_rewrite,
                              with_enrich=not args.no_enrich)
    runner = LineageRunner(pipeline, args.output, wave_files=args.wave_files)
    summary = runner.run(files)
    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
