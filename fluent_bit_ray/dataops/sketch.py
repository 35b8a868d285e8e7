"""Distributed mergeable sketches: HyperLogLog distinct-count and
count-min frequency estimation.

The telemetry question the reference's counters cannot answer —
"how many DISTINCT users/conversations per tag?" — at 100 TB, where
exact distinct is an all-to-all of every key. HLL registers are the
textbook mergeable partial: each batch reduces to at most
(groups × 2^p) small integers, merges are element-wise max (order-
and partition-independent), and the final table is KB-sized however
large the corpus is. (Flajolet et al., "HyperLogLog: the analysis of
a near-optimal cardinality estimation algorithm", AofA 2007.)

Exactness contract: the register TABLE is deterministic — values are
hashed with :func:`fluent_bit_ray.dataops.dedup._h64` (md5-derived,
SQL-reproducible), register index = low ``p`` bits, and
rho = position of the first set bit of the remaining ``64-p`` bits
(derived from the exact float64 exponent, valid because
``w < 2**(64-p) ≤ 2**52 < 2**53``). The full register table therefore
has a rows+schema+hash DuckDB oracle; only the final ESTIMATE is
approximate, and that is plain float math over the (tiny, exact)
register table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .dedup import _h64


def _registers_of(values: pd.Series, p: int):
    """(reg, rho) int64 arrays for the DISTINCT values of a batch
    column; md5 runs once per distinct value (factorize first)."""
    codes, uniques = pd.factorize(values.astype(str))
    h = np.fromiter((_h64(u) for u in uniques), dtype=np.uint64,
                    count=len(uniques))
    reg = (h & np.uint64((1 << p) - 1)).astype(np.int64)
    w = h >> np.uint64(p)
    # float64 exponent == bit_length exactly, since w < 2^52 < 2^53
    e = np.frexp(w.astype(np.float64))[1]
    rho = (64 - p + 1) - e
    return codes, reg, rho.astype(np.int64)


def hll_registers(ds, value_col: str, group_col: str | None = None,
                  p: int = 12):
    """HLL register table Dataset[(group_col?), reg, max_rho] —
    non-empty registers only. ``p`` must be ≥ 7 and ≤ 12 (the
    float64-exponent trick needs ``64 - p ≤ 52``... any p ≥ 12
    qualifies; smaller p is capped for estimate quality, larger p
    only grows the table)."""
    if not 4 <= p <= 52:
        raise ValueError("p out of range")
    gcols = [group_col] if group_col else []

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if group_col:
            df = df.drop_duplicates([group_col, value_col])
        codes, reg, rho = _registers_of(df[value_col], p)
        out = pd.DataFrame({"reg": reg[codes], "max_rho": rho[codes]})
        for g in gcols:
            out[g] = df[g].to_numpy()
        return (out.groupby(gcols + ["reg"], sort=False, as_index=False)
                ["max_rho"].max())

    partials = ds.map_batches(partial, batch_format="pandas")
    if group_col:
        from ..shuffle import coarse_partition_apply

        def merge(g: pd.DataFrame) -> pd.DataFrame:
            return (g.groupby(gcols + ["reg"], sort=False, as_index=False)
                    ["max_rho"].max())

        return coarse_partition_apply(partials, group_col, merge)

    def merge_flat(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("reg", sort=False, as_index=False)["max_rho"].max()

    # ungrouped: the register table is ≤ 2^p rows — one-partition merge
    from ..shuffle import coarse_partition_apply
    return coarse_partition_apply(partials, "reg", merge_flat,
                                  partitions=1)


def hll_estimate(registers: pd.DataFrame, p: int = 12,
                 group_col: str | None = None):
    """Standard bias-corrected HLL estimate from a register table
    (small-range linear counting below 2.5·m). Returns a float, or a
    DataFrame[(group_col), estimate] when grouped."""
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m) if m >= 128 else \
        {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))

    def est(g: pd.DataFrame) -> float:
        filled = len(g)
        zeros = m - filled
        s = np.sum(np.ldexp(1.0, -g["max_rho"].to_numpy())) + zeros * 1.0
        e = alpha * m * m / s
        if e <= 2.5 * m and zeros > 0:
            e = m * np.log(m / zeros)
        return float(e)

    if group_col is None:
        return est(registers)
    rows = [(k, est(g)) for k, g in registers.groupby(group_col)]
    return pd.DataFrame(rows, columns=[group_col, "estimate"])


# ------------------------------------------------- count-min sketch
def _cms_cols(values: pd.Series, depth: int, width: int):
    """(counts_per_distinct, register_idx[depth][n_distinct]) for a
    batch column; md5 runs depth× per DISTINCT value (factorize first).
    hash_d(v) = _h64(f"{d}:{v}") % width — the salt-prefix construction
    DuckDB reproduces with md5(d || ':' || val)."""
    codes, uniques = pd.factorize(values.astype(str))
    per_code = np.bincount(codes, minlength=len(uniques)).astype(np.int64)
    hs = np.empty((depth, len(uniques)), dtype=np.int64)
    for d in range(depth):
        pre = f"{d}:"
        hs[d] = np.fromiter(
            (_h64(pre + u) % width for u in uniques),
            dtype=np.int64, count=len(uniques))
    return per_code, hs


def cms_registers(ds, value_col: str, depth: int = 4, width: int = 1024):
    """Count-min sketch register table Dataset[d, w, cnt] — non-empty
    registers only. (Cormode & Muthukrishnan, "An improved data stream
    summary: the count-min sketch and its applications", J.Alg 2005.)

    The mergeable-partial shape the reference's out_counter /
    out_flowcounter cannot give: per-key frequency ESTIMATES from a
    fixed depth×width table however many distinct keys the corpus has.
    Each batch reduces to ≤ depth×width counters, merges are
    element-wise SUM (order- and partition-independent), and the final
    table is KB-sized at any corpus size.

    Exactness contract (same as HLL): the register TABLE is
    deterministic — hash_d(v) = _h64(f"{d}:{v}") % width, register
    (d, w) holds the exact SUM of occurrences of all values hashing
    there — so it has a full rows+schema+hash DuckDB oracle; only the
    point ESTIMATE (min over d) is approximate, and that is exact
    arithmetic over the (tiny, exact) table.
    """
    if depth < 1 or width < 2:
        raise ValueError("depth/width out of range")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        per_code, hs = _cms_cols(df[value_col], depth, width)
        # scatter-add each row's count into its register, per hash row
        frames = []
        for d in range(depth):
            cnt = np.zeros(width, dtype=np.int64)
            np.add.at(cnt, hs[d], per_code)
            nz = np.flatnonzero(cnt)
            frames.append(pd.DataFrame(
                {"d": np.full(len(nz), d, dtype=np.int64), "w": nz,
                 "cnt": cnt[nz]}))
        return pd.concat(frames, ignore_index=True)

    partials = ds.map_batches(partial, batch_format="pandas")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["d", "w"], sort=False, as_index=False)[
            "cnt"].sum()

    # final table ≤ depth×width rows — one-partition merge
    from ..shuffle import coarse_partition_apply
    return coarse_partition_apply(partials, "d", merge, partitions=1)


def cms_estimate(registers: pd.DataFrame, values, depth: int = 4,
                 width: int = 1024) -> pd.DataFrame:
    """Point estimates (min over the depth rows; ≥ true count always)
    for ``values`` from a register table. Returns
    DataFrame[value, estimate]."""
    tbl = np.zeros((depth, width), dtype=np.int64)
    tbl[registers["d"].to_numpy(), registers["w"].to_numpy()] = \
        registers["cnt"].to_numpy()
    vals = [str(v) for v in values]
    est = np.full(len(vals), np.iinfo(np.int64).max, dtype=np.int64)
    for d in range(depth):
        idx = np.fromiter((_h64(f"{d}:{v}") % width for v in vals),
                          dtype=np.int64, count=len(vals))
        np.minimum(est, tbl[d, idx], out=est)
    return pd.DataFrame({"value": vals, "estimate": est})


def cms_oracle_sql(value_expr: str, table: str, h64_sql,
                   depth: int = 4, width: int = 1024) -> str:
    """DuckDB SQL reproducing the register table bit-for-bit: exact
    per-value counts → depth salted hashes → grouped SUM."""
    h = h64_sql("md5(CAST(d.d AS VARCHAR) || ':' || val)")
    return f"""
        WITH c AS (SELECT CAST({value_expr} AS VARCHAR) AS val,
                          count(*) AS n
                   FROM {table} GROUP BY 1),
        r AS (SELECT d.d, CAST({h} % {width} AS BIGINT) AS w, n
              FROM c CROSS JOIN (SELECT unnest(range({depth})) AS d) d)
        SELECT CAST(d AS BIGINT) AS d, w, CAST(sum(n) AS BIGINT) AS cnt
        FROM r GROUP BY 1, 2 ORDER BY 1, 2
    """


def hll_oracle_sql(value_expr: str, table: str, group_col: str | None,
                   h64_sql, p: int = 12) -> str:
    """DuckDB SQL reproducing the register table bit-for-bit:
    distinct values → h64 → (reg = h % 2^p, rho = 64-p+1 -
    length(bin(w))), grouped max. ``h64_sql`` is the repo's
    ``_h64_sql`` helper."""
    m = 1 << p
    g = f"{group_col}, " if group_col else ""
    h = h64_sql("md5(CAST(val AS VARCHAR))")
    return f"""
        WITH v AS (SELECT DISTINCT {g}{value_expr} AS val FROM {table}),
        h AS (SELECT {g}{h} AS h64 FROM v),
        r AS (SELECT {g}CAST(h64 % {m} AS BIGINT) AS reg,
                     CASE WHEN h64 // {m} = 0 THEN {64 - p + 1}
                          ELSE {64 - p + 1} - length(bin(h64 // {m}))
                     END AS rho
              FROM h)
        SELECT {g}reg, CAST(max(rho) AS BIGINT) AS max_rho FROM r
        GROUP BY {'1, 2' if group_col else '1'}
        ORDER BY {'1, 2' if group_col else '1'}
    """
