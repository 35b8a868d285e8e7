"""Checkpointed, resumable pipeline runs with per-partition lineage.

Mirrors the reference's crash-resume surfaces in batch terms:
filesystem chunk storage re-ingested at boot (reference
src/flb_storage.c:361-427 + plugins/in_storage_backlog), tail offsets
in SQLite (plugins/in_tail/tail_sql.h:32-52), and S3's staged
multipart resume (plugins/out_s3/s3.h:117-129). Here:

- A *partition* is a deterministic group ("wave") of input shard
  files. Each wave runs as one streaming Dataset pipeline; its
  per-sink outputs land under ``out/<sink>/wave=<id>/`` and a
  manifest ``out/_lineage/wave-<id>.json`` records input files, row
  counts per sink, per-stage metrics and wall time.
- On restart, waves whose manifest exists are SKIPPED — no
  reprocessing of completed partitions. Crash mid-wave leaves no
  manifest → the wave reruns; the rerun first PURGES the wave's
  partial output directories, then rewrites them (idempotent).
- The fan-out write is SINGLE-PASS: one map_batches writes every
  sink's rows for a batch (routes-bitmask split) instead of one
  pipeline execution per sink.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

from ..record import ROUTES_COL


def _wave_id(files: list[str]) -> str:
    h = hashlib.md5("\n".join(sorted(files)).encode()).hexdigest()[:12]
    return h


def write_routed_sinks(routed, outdir: str, wave: str = "w0",
                       formats: dict[str, str] | None = None) -> dict:
    """Single-pass multiplexed write; returns per-sink row counts.

    ``formats`` maps sink name → "parquet" (default) or an out_file
    format ("json" / "csv" / "ltsv" / "es_bulk" / "plot" / "template")
    written as text parts via the format functions.
    """
    router = routed.router
    names = router.sink_names()
    formats = formats or {}
    for nm in names:
        os.makedirs(os.path.join(outdir, nm, f"wave={wave}"), exist_ok=True)

    def write_batch(b: pa.Table) -> pa.Table:
        from ..sinks.formats import format_batch
        counts = []
        for nm in names:
            m = router.sink_mask(b.column(ROUTES_COL), nm)
            sub = b.filter(pa.array(m))
            counts.append(sub.num_rows)
            if sub.num_rows == 0:
                continue
            # uuid part names: two batches of one wave with identical
            # leading values can never overwrite each other (the former
            # content-derived md5 could collide → silent row loss).
            # Rerun idempotency comes from _purge_wave_outputs, not
            # from name stability.
            key = uuid.uuid4().hex[:16]
            fmt = formats.get(nm, "parquet")
            base = os.path.join(outdir, nm, f"wave={wave}", f"part-{key}")
            if fmt == "parquet":
                tmp, path = base + ".parquet.tmp", base + ".parquet"
                pq.write_table(sub, tmp)
            else:
                lines = format_batch(sub, fmt=fmt)
                if lines and isinstance(lines[0], bytes):  # msgpack
                    tmp, path = base + ".msgpack.tmp", base + ".msgpack"
                    with open(tmp, "wb") as fh:
                        fh.write(b"".join(lines))
                else:
                    tmp, path = base + ".txt.tmp", base + ".txt"
                    with open(tmp, "w") as fh:
                        fh.write("\n".join(lines) + "\n")
            os.replace(tmp, path)  # atomic per part file
        return pa.table({"sink": pa.array(names),
                         "n": pa.array(counts, type=pa.int64())})

    from ray.data.aggregate import Sum
    agg = (routed.ds.map_batches(write_batch, batch_format="pyarrow")
           .groupby("sink").aggregate(Sum("n", alias_name="n")))
    return {r["sink"]: int(r["n"]) for r in agg.take_all()}


class LineageRunner:
    """Run a pipeline over input shards in resumable waves."""

    def __init__(self, pipeline, outdir: str, wave_files: int = 8):
        self.pipeline = pipeline
        self.outdir = outdir
        self.wave_files = wave_files
        self.lineage_dir = os.path.join(outdir, "_lineage")
        os.makedirs(self.lineage_dir, exist_ok=True)

    # -- manifest helpers ------------------------------------------
    def completed_waves(self) -> dict[str, dict]:
        out = {}
        for f in os.listdir(self.lineage_dir):
            if f.startswith("wave-") and f.endswith(".json"):
                with open(os.path.join(self.lineage_dir, f)) as fh:
                    m = json.load(fh)
                out[m["wave"]] = m
        return out

    def _purge_wave_outputs(self, wid: str) -> None:
        import shutil
        for nm in self.pipeline.router.sink_names():
            d = os.path.join(self.outdir, nm, f"wave={wid}")
            if os.path.isdir(d):
                shutil.rmtree(d, ignore_errors=True)

    def _waves(self, files: list[str]) -> list[list[str]]:
        files = sorted(files)
        return [files[i:i + self.wave_files]
                for i in range(0, len(files), self.wave_files)]

    # -- main ------------------------------------------------------
    def run(self, input_files: list[str]) -> dict:
        """Process all incomplete waves; returns run summary."""
        import ray.data as rd

        done = self.completed_waves()
        summary = {"waves_total": 0, "waves_skipped": 0, "waves_run": 0,
                   "sink_counts": {}, "rows_in": 0}
        for wave_files in self._waves(input_files):
            wid = _wave_id(wave_files)
            summary["waves_total"] += 1
            if wid in done:
                summary["waves_skipped"] += 1
                m = done[wid]
            else:
                t0 = time.perf_counter()
                # purge any partial output of this (uncommitted) wave: a
                # crashed run may have written parts under different
                # batch boundaries than the rerun will produce
                self._purge_wave_outputs(wid)
                ds = rd.read_parquet(wave_files)
                rows_in = ds.count()
                self.pipeline.collect_metrics = True
                routed = self.pipeline.run(rd.read_parquet(wave_files))
                counts = write_routed_sinks(routed, self.outdir, wave=wid)
                from .metrics import drain_metrics
                m = {"wave": wid, "input_files": wave_files,
                     "rows_in": rows_in,
                     "sink_counts": counts,
                     "stage_metrics": drain_metrics(),
                     "wall_sec": round(time.perf_counter() - t0, 3),
                     "engine": "fluent_bit_ray"}
                tmp = os.path.join(self.lineage_dir, f".wave-{wid}.tmp")
                with open(tmp, "w") as fh:
                    json.dump(m, fh, indent=1)
                os.replace(tmp, os.path.join(self.lineage_dir,
                                             f"wave-{wid}.json"))
                summary["waves_run"] += 1
            summary["rows_in"] += m["rows_in"]
            for k, v in m["sink_counts"].items():
                summary["sink_counts"][k] = summary["sink_counts"].get(k, 0) + v
        return summary
