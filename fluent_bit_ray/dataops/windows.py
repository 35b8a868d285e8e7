"""Ordered per-key window operators Ray Data lacks natively.

``rolling_window`` — per-key rolling aggregates over the previous W
rows (ROWS BETWEEN W-1 PRECEDING AND CURRENT ROW in SQL terms): the
standard trailing-window feature for event streams (per-user rolling
spend, per-conversation rolling latency). Distributed shape: ONE
coarse exchange on the partition key; inside each coarse partition the
kernel is a single sort + cumsum with group-boundary clamps — zero
per-key Python, any key cardinality.

``shift_within_key`` — per-key lag/lead of arbitrary columns (SQL's
lag()/lead() OVER (PARTITION BY key ORDER BY ...)): inter-turn
latency, previous-event deltas, next-action lookahead. Same coarse
exchange; the kernel is one sort + one C-level groupby shift.

``pivot_counts`` — long→wide count pivot over a SMALL fixed category
domain (the categories become columns). Distributed shape: per-batch
scatter-add partial crosstab (each block reduces to ≤ distinct-keys
rows before the exchange), then one Ray-native groupby-sum over the
already-tiny partials; the category list is a broadcast constant, and
rows never shuffle un-aggregated.

Money/values travel as int64 cents so sums are associative and
order-independent (oracle-exact).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..shuffle import coarse_partition_apply


def rolling_window(ds, key: str, order: list[str], value_col: str,
                   window: int, out_prefix: str = "roll",
                   keep_cols: list[str] | None = None,
                   partitions: int = 64):
    """Trailing-row rolling sum + count of ``value_col`` (in int64
    cents) per ``key``, ordered by ``order`` within the key.

    Returns Dataset[keep_cols..., {out_prefix}_sum_c, {out_prefix}_n]
    with one row per input row. ``window`` counts ROWS including the
    current one (SQL: ROWS BETWEEN window-1 PRECEDING AND CURRENT
    ROW). ``keep_cols`` defaults to [key, *order].
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    kept = list(keep_cols) if keep_cols is not None else [key, *order]

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, *order], kind="mergesort")
        n = len(g)
        if n == 0:
            return pd.DataFrame({**{c: [] for c in kept},
                                 f"{out_prefix}_sum_c": [],
                                 f"{out_prefix}_n": []})
        v = np.round(g[value_col].to_numpy(dtype=np.float64) * 100
                     ).astype(np.int64)
        kc = g[key].to_numpy()
        start = np.empty(n, dtype=bool)
        start[0] = True
        start[1:] = kc[1:] != kc[:-1]
        idx = np.arange(n, dtype=np.int64)
        # first index of each row's group, broadcast down the run
        sidx = np.maximum.accumulate(np.where(start, idx, 0))
        lo = np.maximum(idx - window + 1, sidx)
        csum = np.concatenate([[0], np.cumsum(v)])
        out = g[kept].copy()
        out[f"{out_prefix}_sum_c"] = csum[idx + 1] - csum[lo]
        out[f"{out_prefix}_n"] = (idx - lo + 1).astype(np.int64)
        return out

    return coarse_partition_apply(ds, key, kernel, partitions=partitions)


def shift_within_key(ds, key: str, order: list[str], cols: list[str],
                     periods: int = 1, suffix: str | None = None,
                     keep_cols: list[str] | None = None,
                     partitions: int = 64):
    """Per-key LAG (``periods`` > 0) / LEAD (``periods`` < 0) of
    ``cols``, ordered by ``order`` within ``key`` — SQL's
    lag(col, n) / lead(col, n) OVER (PARTITION BY key ORDER BY order).

    Returns Dataset[keep_cols..., {col}{suffix}...] with one row per
    input row; shifted cells with no source row in the same key are
    NULL. ``suffix`` defaults to ``_lag{n}`` / ``_lead{n}``.
    ``keep_cols`` defaults to [key, *order]. Same distributed shape as
    ``rolling_window``: ONE coarse key exchange, then a single
    in-partition sort + C-level groupby shift (zero per-key Python).
    """
    if periods == 0:
        raise ValueError("periods must be nonzero (use the column itself)")
    sfx = suffix if suffix is not None else (
        f"_lag{periods}" if periods > 0 else f"_lead{-periods}")
    kept = list(keep_cols) if keep_cols is not None else [key, *order]

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, *order], kind="mergesort")
        out = g[kept].copy()
        shifted = g.groupby(key, sort=False)[cols].shift(periods)
        for c in cols:
            out[f"{c}{sfx}"] = shifted[c].to_numpy()
        return out

    return coarse_partition_apply(ds, key, kernel, partitions=partitions)


def pivot_counts(ds, key: str, cat_col: str, categories: list[str]):
    """Count pivot: one output row per ``key`` value, one int64 column
    per category in ``categories`` (a small FIXED domain — it defines
    the output schema, so it must be known up front; values outside it
    are ignored). Returns Dataset[key, *categories].
    """
    from ray.data.aggregate import Sum

    cats = list(categories)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ccodes = pd.Categorical(df[cat_col], categories=cats).codes
        kcodes, kuniq = pd.factorize(df[key].to_numpy())
        mat = np.zeros((len(kuniq), len(cats)), dtype=np.int64)
        ok = ccodes >= 0
        np.add.at(mat, (kcodes[ok], ccodes[ok]), 1)
        out = pd.DataFrame({key: kuniq})
        for j, c in enumerate(cats):
            out[c] = mat[:, j]
        return out

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby(key)
            .aggregate(*[Sum(c, alias_name=c) for c in cats]))
