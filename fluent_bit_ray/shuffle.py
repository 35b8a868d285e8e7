"""Shuffle-shape helpers.

``coarse_group_apply`` is the engine's standard fix for the
high-cardinality ``groupby(key).map_groups`` pathology: Ray runs the
group kernel once per key, so a million tiny groups mean a million
pandas frames and task dispatches. Hashing keys into a bounded number
of coarse partitions keeps the all-to-all exchange identical in volume
but runs ONE task per partition, with a fast in-task pandas loop over
the keys it owns. Same pattern as the LSH bucket pairing
(dataops/dedup.py:_bucket_pairs). Semantics are identical to
``ds.groupby(key).map_groups(fn)`` for any per-key kernel.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd


def coarse_partition_apply(ds, key, per_partition_fn, partitions: int = 64):
    """Like ``coarse_group_apply`` but the kernel receives the WHOLE
    coarse partition (all rows whose key hashes to it) and is expected
    to be key-aware internally (vectorized groupby/cumsum) — zero
    per-key Python. Guarantee: all rows of one key land in one call."""
    keys = [key] if isinstance(key, str) else list(key)

    def add_hp(df: pd.DataFrame) -> pd.DataFrame:
        kcol = df[keys[0]].astype(str)
        for k in keys[1:]:
            kcol = kcol + "\x1f" + df[k].astype(str)
        codes, uniques = pd.factorize(kcol)
        hp = np.fromiter(
            (zlib.crc32(str(u).encode("utf-8")) % partitions
             for u in uniques),
            dtype=np.int64, count=len(uniques))
        df = df.copy()
        df["_hp"] = hp[codes]
        return df

    return (ds.map_batches(add_hp, batch_format="pandas")
            .groupby("_hp")
            .map_groups(lambda g: per_partition_fn(g.drop(columns=["_hp"])),
                        batch_format="pandas"))


def coarse_group_apply(ds, key, per_group_fn, partitions: int = 64):
    """Apply ``per_group_fn(group_df) -> DataFrame`` once per distinct
    ``key`` value (a column name or list of them), shuffled through
    ``partitions`` coarse hash groups (crc32 of the stringified key —
    deterministic across processes)."""
    keys = [key] if isinstance(key, str) else list(key)
    gb_key = keys[0] if len(keys) == 1 else keys

    def add_hp(df: pd.DataFrame) -> pd.DataFrame:
        kcol = df[keys[0]].astype(str)
        for k in keys[1:]:
            kcol = kcol + "\x1f" + df[k].astype(str)
        codes, uniques = pd.factorize(kcol)
        hp = np.fromiter(
            (zlib.crc32(str(u).encode("utf-8")) % partitions
             for u in uniques),
            dtype=np.int64, count=len(uniques))
        df = df.copy()
        df["_hp"] = hp[codes]
        return df

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_hp"])
        outs = [per_group_fn(sub) for _, sub in g.groupby(gb_key, sort=False)]
        return pd.concat(outs, ignore_index=True)

    return (ds.map_batches(add_hp, batch_format="pandas")
            .groupby("_hp")
            .map_groups(per_partition, batch_format="pandas"))
