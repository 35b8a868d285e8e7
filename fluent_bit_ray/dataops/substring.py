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
    remaining. Fully vectorized — no per-row loop: factorize the
    batch's token stream, md5 only the distinct vocabulary, run the k
    shifted mulmod passes over the ENTIRE flat stream at once, then
    mask out the positions whose k-gram would cross a document
    boundary (grams that straddle two docs produce garbage values at
    masked-off positions and never escape)."""
    empty = pd.DataFrame({"gram_h": pd.Series([], dtype="int64"),
                          id_col: pd.Series([], dtype=df[id_col].dtype),
                          "pos": pd.Series([], dtype="int64")})
    toks_all = df[text_col].astype(str).str.split()
    counts = toks_all.str.len().fillna(0).to_numpy(dtype=np.int64)
    total = int(counts.sum())
    if total < k:
        return empty
    flat = toks_all.explode().dropna()
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
    bpow = [pow(NGRAM_B, k - 1 - j, NGRAM_M) for j in range(k)]
    n_cand = total - k + 1                     # global candidate starts
    acc = np.zeros(n_cand, dtype=np.int64)
    for j in range(k):                         # k passes, whole stream
        acc = (acc + th[j:j + n_cand] * bpow[j]) % NGRAM_M
    bounds = np.cumsum(counts) - counts
    docrow = np.repeat(np.arange(len(counts)), counts)[:n_cand]
    pos = np.arange(n_cand, dtype=np.int64) - bounds[docrow]
    valid = pos + k <= counts[docrow]
    if not valid.any():
        return empty
    return pd.DataFrame({
        "gram_h": acc[valid],
        id_col: df[id_col].to_numpy()[docrow[valid]],
        "pos": pos[valid]})


def _dup_positions_ds(ds, k: int, min_docs: int, text_col: str,
                      id_col: str, partitions: int):
    """Dataset[(id_col, pos, gram_h, n_docs)] — one row per flagged
    token position. The distributed core shared by the span/removal
    operators: hash every position's k-gram, ONE coarse exchange on
    the gram hash, sort + run-detection distinct-doc counts."""
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

    return coarse_partition_apply(grams, "gram_h", reduce_partition,
                                  partitions=partitions)


def dup_ngram_spans(ds, k: int = 8, min_docs: int = 2,
                    text_col: str = "text", id_col: str = "doc_id",
                    partitions: int = 64) -> pd.DataFrame:
    """Every (doc, pos) whose k-token gram appears in ≥ ``min_docs``
    distinct documents, with the gram hash and its distinct-doc count.

    Returns DataFrame[id_col, pos, gram_h, n_docs] sorted by
    (id_col, pos, gram_h).
    """
    out = _dup_positions_ds(ds, k, min_docs, text_col, id_col,
                            partitions).to_pandas()
    return (out.sort_values([id_col, "pos", "gram_h"])
            .reset_index(drop=True))


def dup_span_ranges(ds, k: int = 8, min_docs: int = 2,
                    text_col: str = "text", id_col: str = "doc_id",
                    partitions: int = 64) -> pd.DataFrame:
    """Maximal duplicated token ranges per document.

    Flagged positions p cover tokens ``[p, p+k)``; overlapping or
    adjacent coverage (gap ≤ k between consecutive flagged positions)
    merges into one span — exactly the contiguous regions the removal
    operator cuts. Returns DataFrame[id_col, span_start, span_end,
    n_tokens] with ``span_end`` exclusive, sorted by (id, start).
    """
    pos_ds = _dup_positions_ds(ds, k, min_docs, text_col, id_col,
                               partitions)

    def merge_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([id_col, "pos"], kind="mergesort")
        dc = g[id_col].to_numpy()
        ps = g["pos"].to_numpy()
        n = len(g)
        if n == 0:
            return pd.DataFrame({id_col: [], "span_start": [],
                                 "span_end": [], "n_tokens": []})
        brk = np.empty(n, dtype=bool)
        brk[0] = True
        brk[1:] = (dc[1:] != dc[:-1]) | (ps[1:] - ps[:-1] > k)
        starts = ps[brk]
        # a span's last position sits just before the next break
        last = ps[np.nonzero(np.append(brk[1:], True))[0]]
        return pd.DataFrame({
            id_col: dc[brk], "span_start": starts,
            "span_end": last + k,
            "n_tokens": (last + k - starts).astype(np.int64)})

    out = coarse_partition_apply(
        pos_ds.select_columns([id_col, "pos"]), id_col,
        merge_partition, partitions=partitions).to_pandas()
    return (out.sort_values([id_col, "span_start"])
            .reset_index(drop=True))


def remove_dup_ngram_spans(ds, k: int = 8, min_docs: int = 2,
                           text_col: str = "text",
                           id_col: str = "doc_id",
                           partitions: int = 64):
    """Cut every duplicated span (per ``dup_span_ranges`` semantics)
    out of every document — the removal step of exact-substring dedup
    (Lee et al. 2022 remove ALL occurrences of a repeated substring).

    Returns a Dataset[(id_col, clean_text, n_removed, n_spans)] with
    one row per input document. ``clean_text`` is the kept tokens
    joined by single spaces (tokenization is ``\\S+``, so original
    whitespace is normalized — the documented contract, shared with
    the SQL oracle). Shuffle shape: the corpus-scale gram exchange,
    then ONE coarse co-partitioned exchange of (text + flagged
    positions) on the doc id; text transits the object store once.
    """
    pos_ds = _dup_positions_ds(ds, k, min_docs, text_col, id_col,
                               partitions)

    def doc_side(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            id_col: df[id_col],
            "pos": np.full(len(df), -1, dtype=np.int64),
            text_col: df[text_col].astype(str)})

    def pos_side(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            id_col: df[id_col],
            "pos": df["pos"].astype(np.int64),
            text_col: np.full(len(df), "", dtype=object)})

    tagged = (ds.map_batches(doc_side, batch_format="pandas")
              .union(pos_ds.select_columns([id_col, "pos"])
                     .map_batches(pos_side, batch_format="pandas")))

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        docs = g[g["pos"] < 0]
        flags = g[g["pos"] >= 0]
        nd = len(docs)
        toks = docs[text_col].astype(str).str.split()
        counts = toks.str.len().fillna(0).to_numpy(dtype=np.int64)
        bounds = np.cumsum(counts) - counts
        total = int(counts.sum())
        flat = toks.explode().dropna().to_numpy(dtype=object)
        rowof = pd.Series(np.arange(nd), index=docs[id_col].to_numpy())
        frow = rowof.loc[flags[id_col].to_numpy()].to_numpy()
        starts = bounds[frow] + flags["pos"].to_numpy(dtype=np.int64)
        ends = np.minimum(starts + k, bounds[frow] + counts[frow])
        diff = np.zeros(total + 1, dtype=np.int64)
        np.add.at(diff, starts, 1)
        np.add.at(diff, ends, -1)
        covered = np.cumsum(diff)[:total] > 0
        docrow = np.repeat(np.arange(nd), counts)
        kept = ~covered
        joined = (pd.Series(flat[kept]).groupby(docrow[kept])
                  .agg(" ".join))
        clean = np.full(nd, "", dtype=object)
        clean[joined.index.to_numpy()] = joined.to_numpy()
        # a covered run starts where covered flips on, or at a doc
        # boundary that begins covered
        smask = covered.copy()
        smask[1:] &= ~covered[:-1]
        nz = bounds[counts > 0]
        smask[nz] = covered[nz]
        return pd.DataFrame({
            id_col: docs[id_col].to_numpy(),
            "clean_text": clean,
            "n_removed": np.bincount(docrow[covered],
                                     minlength=nd).astype(np.int64),
            "n_spans": np.bincount(docrow[smask],
                                   minlength=nd).astype(np.int64)})

    return coarse_partition_apply(tagged, id_col, kernel,
                                  partitions=partitions)
