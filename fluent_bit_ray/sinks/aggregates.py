"""Aggregate sinks — the correctness oracles.

- counter_total: out_counter semantics (reference
  plugins/out_counter/counter.c:53-78 — running total of records
  delivered to the sink).
- flowcounter: out_flowcounter semantics (reference
  plugins/out_flowcounter/out_flowcounter.c:101-117, unit config
  :56-80) — per-(tag, time-unit-bucket) record count and byte count.
  The reference counts msgpack payload bytes and buckets by *arrival*
  time; we count ``len(text)`` UTF-8 bytes and bucket by EVENT time
  (deterministic, documented deviation per SURVEY §7).

Both pre-aggregate per batch inside ``map_batches`` and finish with a
small ``groupby`` over partials — the all-to-all only ever moves one
row per (tag, bucket) per block, not the data.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..record import TAG_COL

_UNIT_SECONDS = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}


def counter_total(ds) -> int:
    """Total records delivered (out_counter 'total' line)."""
    return ds.count()


def flowcounter(ds, unit: str = "minute", ts_col: str = "ts",
                size_col: str = "text", combine: str = "shuffle"):
    """Per-(tag, bucket) counts and bytes → small sorted pandas frame.

    Columns: tag, bucket_ts (timestamp at bucket start), n_records,
    n_bytes.

    ``combine``: "shuffle" (default) finishes with a Ray groupby over
    the per-block partials — correct at any scale. "driver" sums the
    partials in pandas on the driver: faster when partial rows
    (≈ unique (tag, bucket) per block × blocks) comfortably fit driver
    memory; use only when tags × time-range is known-small.
    """
    width = _UNIT_SECONDS[unit]

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"tag": pa.array([], type=pa.string()),
                             "bucket": pa.array([], type=pa.int64()),
                             "n_records": pa.array([], type=pa.int64()),
                             "n_bytes": pa.array([], type=pa.int64())})
        ts = b.column(ts_col).cast(pa.timestamp("ns")).cast(pa.int64()).to_numpy()
        bucket = (ts // 1_000_000_000) // width * width
        sizes = pa.compute.binary_length(
            b.column(size_col)).to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"tag": b.column(TAG_COL).to_pylist(),
                           "bucket": bucket, "bytes": sizes})
        g = (df.groupby(["tag", "bucket"], sort=False)
               .agg(n_records=("bytes", "size"), n_bytes=("bytes", "sum"))
               .reset_index())
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow")
    if combine == "driver":
        out = (parts.to_pandas()
               .groupby(["tag", "bucket"], sort=False)
               .agg(n_records=("n_records", "sum"),
                    n_bytes=("n_bytes", "sum")).reset_index())
    else:
        from ray.data.aggregate import Sum
        agg = (parts.groupby(["tag", "bucket"])
               .aggregate(Sum("n_records", alias_name="n_records"),
                          Sum("n_bytes", alias_name="n_bytes")))
        out = agg.to_pandas()
    out["bucket_ts"] = pd.to_datetime(out["bucket"], unit="s")
    out = out[["tag", "bucket_ts", "n_records", "n_bytes"]]
    return out.sort_values(["tag", "bucket_ts"]).reset_index(drop=True)
