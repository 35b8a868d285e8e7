"""Duplicate n-gram span detection — the exact-substring-dedup core.

"Deduplicating Training Data Makes Language Models Better" (Lee et
al., 2022) removes exact substrings repeated across documents. The
distributed shape here: every token position contributes one rolling
k-gram hash; all positions of a hash are co-located by ONE coarse
exchange; a hash seen in ≥ ``min_docs`` DISTINCT documents marks each
of its positions as a duplicated span.

Exactness contract (full SQL oracle): tokens are ``\\S+`` runs, the
per-token hash is the dedup-family ``_h64`` (little-endian md5
prefix) reduced mod M, and the k-gram hash is the polynomial
``H(p) = Σ_j h[p+j]·B^(k-1-j) mod M`` with B=1000003 and
M=2147483647 (2³¹−1) — every term fits int64 (h,Bʲ < 2³¹ so the
product < 2⁶², and the running sum is reduced per step), so numpy
and DuckDB produce identical values. Hash collisions can merge two
different grams (p ≈ positions²/2M); both engine and oracle share
them, and for span-REMOVAL purposes a rare false merge only
over-flags (the standard fingerprinting trade — verify spans by text
if exactness of the text is required).

Scale note: like every exact-substring method, the exchange is
corpus-scale — one (hash, doc, pos) row per token position (~20 B
per token; cf. the suffix-array approach which also materializes
O(corpus) entries). The per-batch kernel is k vectorized passes; the
per-partition reducer is sort + run-detection, no per-key Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..shuffle import coarse_partition_apply
from .dedup import _h64

NGRAM_B = 1_000_003
NGRAM_M = 2_147_483_647  # 2^31 - 1 (prime)

# worker-process-level token-hash cache (same pattern as simhash)
_TOKH_CACHE: dict[str, int] = {}
_TOKH_CACHE_MAX = 2_000_000


def _gram_hash_batch(df: pd.DataFrame, k: int, text_col: str,
                     id_col: str) -> pd.DataFrame:
    """One (gram_h, doc, pos) row per token position with ≥k tokens
    remaining. Vectorized: factorize the batch's token stream, md5
    only the distinct vocabulary, k shifted mulmod passes."""
    out_h, out_doc, out_pos = [], [], []
    toks_all = df[text_col].astype(str).str.split()
    bpow = [pow(NGRAM_B, k - 1 - j, NGRAM_M) for j in range(k)]
    flat = toks_all.explode().dropna()
    if len(flat) == 0:
        return pd.DataFrame({"gram_h": pd.Series([], dtype="int64"),
                             id_col: pd.Series([], dtype=df[id_col].dtype),
                             "pos": pd.Series([], dtype="int64")})
    codes, uniques = pd.factorize(flat.to_numpy(dtype=object))
    hs = np.empty(len(uniques), dtype=np.int64)
    for i, w in enumerate(uniques):
        v = _TOKH_CACHE.get(w)
        if v is None:
            v = _h64(w) % NGRAM_M
            if len(_TOKH_CACHE) < _TOKH_CACHE_MAX:
                _TOKH_CACHE[w] = v
        hs[i] = v
    th = hs[codes]                             # per-position token hash
    counts = toks_all.str.len().fillna(0).to_numpy(dtype=np.int64)
    bounds = np.cumsum(counts) - counts
    for row, (st, n) in enumerate(zip(bounds, counts)):
        if n < k:
            continue
        seg = th[st:st + n]
        acc = np.zeros(n - k + 1, dtype=np.int64)
        for j in range(k):                     # k vectorized passes
            acc = (acc + seg[j:j + n - k + 1] * bpow[j]) % NGRAM_M
        out_h.append(acc)
        out_doc.append(np.full(n - k + 1, df[id_col].iloc[row]))
        out_pos.append(np.arange(n - k + 1, dtype=np.int64))
    if not out_h:
        return pd.DataFrame({"gram_h": pd.Series([], dtype="int64"),
                             id_col: pd.Series([], dtype=df[id_col].dtype),
                             "pos": pd.Series([], dtype="int64")})
    return pd.DataFrame({"gram_h": np.concatenate(out_h),
                         id_col: np.concatenate(out_doc),
                         "pos": np.concatenate(out_pos)})


def dup_ngram_spans(ds, k: int = 8, min_docs: int = 2,
                    text_col: str = "text", id_col: str = "doc_id",
                    partitions: int = 64) -> pd.DataFrame:
    """Every (doc, pos) whose k-token gram appears in ≥ ``min_docs``
    distinct documents, with the gram hash and its distinct-doc count.

    Returns DataFrame[id_col, pos, gram_h, n_docs] sorted by
    (id_col, pos, gram_h).
    """
    grams = ds.map_batches(
        lambda df: _gram_hash_batch(df, k=k, text_col=text_col,
                                    id_col=id_col),
        batch_format="pandas")

    def reduce_partition(g: pd.DataFrame) -> pd.DataFrame:
        # all rows of a gram_h are in this partition: sort → runs →
        # distinct-doc counts per run, keep runs with ≥ min_docs docs
        g = g.sort_values(["gram_h", id_col, "pos"], kind="mergesort")
        gh = g["gram_h"].to_numpy()
        dc = g[id_col].to_numpy()
        n = len(g)
        if n == 0:
            return pd.DataFrame({id_col: [], "pos": [], "gram_h": [],
                                 "n_docs": []})
        new_h = np.empty(n, dtype=bool)
        new_h[0] = True
        new_h[1:] = gh[1:] != gh[:-1]
        new_doc = np.empty(n, dtype=bool)
        new_doc[0] = True
        new_doc[1:] = new_h[1:] | (dc[1:] != dc[:-1])
        run_id = np.cumsum(new_h) - 1
        n_docs = np.bincount(run_id[new_doc])   # distinct docs per run
        keep = n_docs[run_id] >= min_docs
        out = g.loc[keep, [id_col, "pos", "gram_h"]].copy()
        out["n_docs"] = n_docs[run_id[keep]].astype(np.int64)
        return out

    out = coarse_partition_apply(grams, "gram_h", reduce_partition,
                                 partitions=partitions).to_pandas()
    return (out.sort_values([id_col, "pos", "gram_h"])
            .reset_index(drop=True))
