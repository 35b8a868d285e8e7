"""Ordered per-key window operators Ray Data lacks natively.

``rolling_window`` — per-key rolling aggregates over the previous W
rows (ROWS BETWEEN W-1 PRECEDING AND CURRENT ROW in SQL terms): the
standard trailing-window feature for event streams (per-user rolling
spend, per-conversation rolling latency). Distributed shape: ONE
coarse exchange on the partition key; inside each coarse partition the
kernel is a single lexsort + cumsum with group-boundary clamps — zero
per-key Python, any key cardinality.

``shift_within_key`` — per-key lag/lead of arbitrary columns (SQL's
lag()/lead() OVER (PARTITION BY key ORDER BY ...)): inter-turn
latency, previous-event deltas, next-action lookahead. Same coarse
exchange; the kernel is one lexsort + a clamped index gather (invalid
source indices become Arrow nulls).

``pivot_counts`` — long→wide count pivot over a SMALL fixed category
domain (the categories become columns). Distributed shape: per-batch
scatter-add partial crosstab (each block reduces to ≤ distinct-keys
rows before the exchange), then one Ray-native groupby-sum over the
already-tiny partials; the category list is a broadcast constant, and
rows never shuffle un-aggregated.

Money/values travel as int64 cents so sums are associative and
order-independent (oracle-exact).

Both window kernels are Arrow-native end to end (the r4 scaling sweep
measured the former pandas kernels at ~40 s UDF per 32M rows, ~70% of
it pandas sort_values + frame assembly; the lexsort+take shape is
~4×, and the exchange itself stays zero-copy Arrow on both sides).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..shuffle import hash_exchange_apply


def _sort_perm(t: pa.Table, key: str, order: list[str]) -> np.ndarray:
    """Stable permutation sorting by (key, *order) — np.lexsort takes
    its LAST key as primary, so feed (order_reversed..., key)."""
    cols = [t[c].combine_chunks().to_numpy(zero_copy_only=False)
            for c in (*reversed(order), key)]
    return np.lexsort(cols)


def _group_starts(kc: np.ndarray) -> np.ndarray:
    """For each position in a key-sorted array, the first index of its
    key run (broadcast down the run)."""
    n = len(kc)
    start = np.empty(n, dtype=bool)
    start[0] = True
    start[1:] = kc[1:] != kc[:-1]
    idx = np.arange(n, dtype=np.int64)
    return np.maximum.accumulate(np.where(start, idx, 0))


def rolling_window(ds, key: str, order: list[str], value_col: str,
                   window: int, out_prefix: str = "roll",
                   keep_cols: list[str] | None = None,
                   partitions: int | None = None):
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
    sum_name, n_name = f"{out_prefix}_sum_c", f"{out_prefix}_n"

    def kernel(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return (t.select(kept)
                    .append_column(sum_name, pa.array([], pa.int64()))
                    .append_column(n_name, pa.array([], pa.int64())))
        perm = _sort_perm(t, key, order)
        v = t[value_col].combine_chunks().to_numpy(
            zero_copy_only=False)[perm]
        cents = np.round(v.astype(np.float64) * 100).astype(np.int64)
        kc = t[key].combine_chunks().to_numpy(zero_copy_only=False)[perm]
        idx = np.arange(n, dtype=np.int64)
        sidx = _group_starts(kc)
        lo = np.maximum(idx - window + 1, sidx)
        csum = np.concatenate([[0], np.cumsum(cents)])
        return (t.select(kept).take(perm)
                .append_column(sum_name, pa.array(csum[idx + 1] - csum[lo]))
                .append_column(n_name, pa.array(idx - lo + 1)))

    return hash_exchange_apply(ds, key, kernel, partitions=partitions)


def shift_within_key(ds, key: str, order: list[str], cols: list[str],
                     periods: int = 1, suffix: str | None = None,
                     keep_cols: list[str] | None = None,
                     partitions: int | None = None):
    """Per-key LAG (``periods`` > 0) / LEAD (``periods`` < 0) of
    ``cols``, ordered by ``order`` within ``key`` — SQL's
    lag(col, n) / lead(col, n) OVER (PARTITION BY key ORDER BY order).

    Returns Dataset[keep_cols..., {col}{suffix}...] with one row per
    input row; shifted cells with no source row in the same key are
    NULL. ``suffix`` defaults to ``_lag{n}`` / ``_lead{n}``.
    ``keep_cols`` defaults to [key, *order]. Same distributed shape as
    ``rolling_window``: ONE coarse key exchange, then a single
    in-partition lexsort + clamped gather (zero per-key Python).
    """
    if periods == 0:
        raise ValueError("periods must be nonzero (use the column itself)")
    sfx = suffix if suffix is not None else (
        f"_lag{periods}" if periods > 0 else f"_lead{-periods}")
    kept = list(keep_cols) if keep_cols is not None else [key, *order]

    def kernel(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            out = t.select(kept)
            for c in cols:
                out = out.append_column(f"{c}{sfx}",
                                        t[c].combine_chunks().slice(0, 0))
            return out
        perm = _sort_perm(t, key, order)
        kc = t[key].combine_chunks().to_numpy(zero_copy_only=False)[perm]
        idx = np.arange(n, dtype=np.int64)
        sidx = _group_starts(kc)
        src = idx - periods
        if periods > 0:                      # lag: stay at/after group start
            valid = src >= sidx
        else:                                # lead: stay at/before group end
            start = sidx == idx
            gid = np.cumsum(start) - 1
            gstarts = idx[start]
            gends = np.append(gstarts[1:], n) - 1
            valid = src <= gends[gid]
        # null-masked gather: invalid source indices become Arrow nulls
        src_arr = pa.array(np.where(valid, src, 0), mask=~valid)
        out = t.select(kept).take(perm)
        for c in cols:
            sorted_c = t[c].combine_chunks().take(pa.array(perm))
            out = out.append_column(f"{c}{sfx}", sorted_c.take(src_arr))
        return out

    return hash_exchange_apply(ds, key, kernel, partitions=partitions)


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
