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


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public constants) — a full
    64-bit avalanche so consecutive integer keys don't all land in
    consecutive partitions. Deterministic across processes."""
    z = x.astype(np.uint64, copy=True)
    z += np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1E3569B7)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D1BBDF38707FAB)
    return z ^ (z >> np.uint64(31))


def _hp_column(df: pd.DataFrame, keys: list[str], partitions: int
               ) -> np.ndarray:
    """Partition id per row. Integer single-key: pure-numpy mix (no
    per-row Python, no string conversion). Anything else: factorize
    the stringified key, crc32 only the distinct values."""
    if len(keys) == 1 and pd.api.types.is_integer_dtype(df[keys[0]]):
        mixed = _splitmix64(df[keys[0]].to_numpy())
        return (mixed % np.uint64(partitions)).astype(np.int64)
    kcol = df[keys[0]].astype(str)
    for k in keys[1:]:
        kcol = kcol + "\x1f" + df[k].astype(str)
    codes, uniques = pd.factorize(kcol)
    hp = np.fromiter(
        (zlib.crc32(str(u).encode("utf-8")) % partitions
         for u in uniques),
        dtype=np.int64, count=len(uniques))
    return hp[codes]


def coarse_partition_apply(ds, key, per_partition_fn, partitions: int = 64):
    """Like ``coarse_group_apply`` but the kernel receives the WHOLE
    coarse partition (all rows whose key hashes to it) and is expected
    to be key-aware internally (vectorized groupby/cumsum) — zero
    per-key Python. Guarantee: all rows of one key land in one call."""
    keys = [key] if isinstance(key, str) else list(key)

    def add_hp(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_hp"] = _hp_column(df, keys, partitions)
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
        df = df.copy()
        df["_hp"] = _hp_column(df, keys, partitions)
        return df

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_hp"])
        outs = [per_group_fn(sub) for _, sub in g.groupby(gb_key, sort=False)]
        return pd.concat(outs, ignore_index=True)

    return (ds.map_batches(add_hp, batch_format="pandas")
            .groupby("_hp")
            .map_groups(per_partition, batch_format="pandas"))
