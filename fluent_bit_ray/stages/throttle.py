"""throttle / throttle_size — deterministic event-time rate limiting.

The reference versions are processing-time sliding windows
(plugins/filter_throttle/throttle.c:98-107 global record-rate;
fork plugins/filter_throttle_size/throttle_size.c:658 per-key
byte-rate). Processing-time behavior is nondeterministic, so — per
SURVEY §7 "hard parts" — we re-express both in EVENT time:

- throttle(rate, interval_s): within each event-time bucket
  ``floor(ts / interval)``, keep the first ``rate`` records in
  deterministic (ts, conv_id, turn_idx) order; drop the rest.
- throttle_size(limit_bytes, interval_s, name_field): within each
  (key, bucket), keep records while the running byte total
  (len(text)) stays ≤ limit.

Both are WIDE operators (global per-bucket state): implemented as a
coarse-partitioned per-bucket kernel (``shuffle.coarse_group_apply``)
— the shuffle key is the time bucket
(+ name key), which is uniform by construction, so no skew salting is
needed. They expose ``apply(ds) -> ds`` instead of per-batch
``__call__``; the pipeline builder breaks map_batches fusion around
them.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .base import Stage, register


def _bucket_column(batch: pa.Table, interval_s: int, ts_col: str) -> pa.Table:
    ts = batch.column(ts_col).cast(pa.timestamp("ns")).cast(pa.int64())
    # integer division (epochs are positive → trunc == floor)
    bucket = pa.compute.divide(ts, interval_s * 1_000_000_000)
    return batch.append_column("_bucket", bucket)


@register("throttle")
class ThrottleStage(Stage):
    wide = True

    def __init__(self, rate: int, interval_s: int = 60, ts_col: str = "ts", **kw):
        super().__init__(**kw)
        self.rate = rate
        self.interval_s = interval_s
        self.ts_col = ts_col

    def apply(self, ds):
        rate = self.rate
        ts_col = self.ts_col

        def add_bucket(b: pa.Table) -> pa.Table:
            return _bucket_column(b, self.interval_s, ts_col)

        def limit_partition(g: pd.DataFrame) -> pd.DataFrame:
            # rank within bucket, fully vectorized over the partition
            order = ["_bucket"] + [c for c in (ts_col, "conv_id", "turn_idx")
                                   if c in g.columns]
            g = g.sort_values(order, kind="mergesort")
            rank = g.groupby("_bucket", sort=False).cumcount()
            return g[rank < rate]

        from ..shuffle import coarse_partition_apply
        return coarse_partition_apply(
            ds.map_batches(add_bucket, batch_format="pyarrow"),
            "_bucket", limit_partition).drop_columns(["_bucket"])


@register("throttle_size")
class ThrottleSizeStage(Stage):
    wide = True

    def __init__(self, limit_bytes: int, interval_s: int = 60,
                 name_field: str = "role", size_field: str = "text",
                 ts_col: str = "ts", **kw):
        super().__init__(**kw)
        self.limit_bytes = limit_bytes
        self.interval_s = interval_s
        self.name_field = name_field
        self.size_field = size_field
        self.ts_col = ts_col

    def apply(self, ds):
        limit = self.limit_bytes
        ts_col, size_field = self.ts_col, self.size_field

        def add_bucket(b: pa.Table) -> pa.Table:
            return _bucket_column(b, self.interval_s, ts_col)

        name_field = self.name_field

        def limit_partition(g: pd.DataFrame) -> pd.DataFrame:
            # running byte total per (bucket, key), vectorized
            order = ["_bucket", name_field] + \
                [c for c in (ts_col, "conv_id", "turn_idx") if c in g.columns]
            g = g.sort_values(order, kind="mergesort")
            sizes = g[size_field].astype(str).str.len()
            running = sizes.groupby(
                [g["_bucket"], g[name_field]], sort=False).cumsum()
            return g[running <= limit]

        from ..shuffle import coarse_partition_apply
        return coarse_partition_apply(
            ds.map_batches(add_bucket, batch_format="pyarrow"),
            ["_bucket", name_field],
            limit_partition).drop_columns(["_bucket"])
