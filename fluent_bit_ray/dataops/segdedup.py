"""Cross-document segment dedup (C4-style keep-first paragraph dedup).

C4 deduplicates at sub-document granularity: any span of text that
already occurred earlier in the corpus is removed from later documents
(Raffel et al. 2020 dedup three-sentence spans; NeMo-Curator and
RefinedWeb do the same at paragraph granularity). The corpus here has
no sentence boundaries, so the segment unit is a fixed window of
``words`` whitespace tokens — the same deterministic segmentation the
DuckDB oracle replays with list slicing.

Semantics: documents are ordered by (id, seg_idx); the FIRST occurrence
of each distinct segment string is kept, every later occurrence is
removed from its document; documents whose segments are all removed
disappear (C4 drops empty docs). Unlike :mod:`boilerplate` (which
REMOVES all occurrences of cross-group repeated text), this is
keep-first dedup — exactly one copy of every segment survives.

Scale shape (100 TB):
- pass 1 segments each batch and ships only ``(h64(segment), id,
  seg_idx)`` 24-byte rows into ONE coarse hash exchange on the segment
  hash — text never transits;
- each partition finds the lexicographic-min (id, seg_idx) per hash
  with one lexsort (no per-key Python) and emits only the NON-first
  occurrences — the drop list, bounded by the corpus' duplicate volume
  (the same boundedness argument as boilerplate's drop set: if drops
  rival the corpus, the corpus is mostly duplicate and should be
  exact-deduped first);
- the drop list is broadcast once via ``ray.put`` as a sorted uint64
  array of packed (id << SEG_BITS | seg_idx) keys; the rebuild pass
  streams the corpus a second time, masks dropped segments with one
  searchsorted, and joins the kept words — zero further shuffle.

The segment hash is the engine's shared vectorized 64-bit content key
(internal co-identity only); the oracle verifies on raw segment-string
equality, so hash parity is not required — injectivity is.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

# seg_idx packs into the low bits of a uint64 alongside the doc id:
# 2^24 segments/doc (= 160M words/doc at words=10) before overflow.
_SEG_BITS = 24


def _segments(df: pd.DataFrame, key: str, text_col: str, words: int):
    """(ids, seg_idx, seg_text) for a batch — every ``words``-token
    window, last partial window included; empty docs emit nothing.
    Per-doc assembly loop (the chunk_docs precedent: output-bound,
    each emitted character is touched once)."""
    ids_out: list = []
    idx_out: list[int] = []
    txt_out: list[str] = []
    # NULL text emits no segments (fillna first — astype(str) alone
    # would mint the literal word 'None', unlike the oracle's
    # regexp_extract_all(NULL) = NULL row excluded by len(ws) > 0)
    for kid, t in zip(df[key].tolist(),
                      df[text_col].fillna("").astype(str).tolist()):
        ws = t.split()
        for si, start in enumerate(range(0, len(ws), words)):
            ids_out.append(kid)
            idx_out.append(si)
            txt_out.append(" ".join(ws[start:start + words]))
    seg = np.array(idx_out, dtype=np.int64)
    if len(seg) and int(seg.max()) >= (1 << _SEG_BITS):
        raise ValueError(
            f"segment_dedup: a document has ≥ 2^{_SEG_BITS} segments; "
            "raise _SEG_BITS or pre-chunk the corpus")
    return ids_out, seg, txt_out


def _packed(ids: np.ndarray, seg: np.ndarray) -> np.ndarray:
    """uint64 (id << SEG_BITS) | seg_idx membership key. Ids must be
    non-negative integers < 2^(64-SEG_BITS) (parquet doc ids are)."""
    return (ids.astype(np.uint64) << np.uint64(_SEG_BITS)) \
        | seg.astype(np.uint64)


def segment_drop_pairs(ds, words: int = 10, key: str = "doc_id",
                       text_col: str = "text") -> np.ndarray:
    """Sorted packed (id, seg_idx) keys of every NON-first occurrence
    of a repeated segment — the drop list the rebuild pass broadcasts.
    """
    from ..shuffle import coarse_partition_apply
    from .boilerplate import _h64_col

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        ids, seg, txt = _segments(df, key, text_col, words)
        return pd.DataFrame(
            {"h": _h64_col(pd.Series(txt, dtype=object)).view(np.int64),
             "id": np.asarray(ids, dtype=np.int64), "seg": seg})

    hashed = ds.map_batches(pairs, batch_format="pandas")

    def drops(part: pd.DataFrame) -> pd.DataFrame:
        if not len(part):
            return pd.DataFrame({"p": np.array([], dtype=np.uint64)
                                 .view(np.int64)})
        h = part["h"].to_numpy(dtype=np.int64)
        ids = part["id"].to_numpy(dtype=np.int64)
        seg = part["seg"].to_numpy(dtype=np.int64)
        order = np.lexsort((seg, ids, h))
        first = np.ones(len(h), dtype=bool)
        first[1:] = h[order][1:] != h[order][:-1]
        drop = order[~first]
        return pd.DataFrame(
            {"p": _packed(ids[drop], seg[drop]).view(np.int64)})

    out = coarse_partition_apply(hashed, "h", drops).to_pandas()
    if not len(out):
        return np.array([], dtype=np.uint64)
    return np.sort(out["p"].to_numpy().view(np.uint64))


def segment_dedup(ds, words: int = 10, key: str = "doc_id",
                  text_col: str = "text"):
    """Keep-first cross-document segment dedup.

    Returns Dataset[key, text] where each doc's text is rebuilt from
    its surviving segments (space-joined); docs with no surviving
    segment are dropped. Column layout: all input columns except
    ``text_col`` are preserved, text replaced in place.
    """
    drop = segment_drop_pairs(ds, words, key, text_col)
    drop_ref = ray.put(drop)

    def rebuild(df: pd.DataFrame) -> pd.DataFrame:
        d = ray.get(drop_ref)
        ids, seg, txt = _segments(df, key, text_col, words)
        if not len(seg):
            return df.iloc[0:0]
        ids_arr = np.asarray(ids, dtype=np.int64)
        keep = np.ones(len(seg), dtype=bool)
        if len(d):
            p = _packed(ids_arr, seg)
            pos = np.searchsorted(d, p)
            pos[pos == len(d)] = 0
            keep = d[pos] != p
        kept = pd.DataFrame({key: ids_arr[keep],
                             "_t": np.asarray(txt, dtype=object)[keep],
                             "_s": seg[keep]})
        joined = (kept.sort_values([key, "_s"], kind="mergesort")
                  .groupby(key, sort=False)["_t"].agg(" ".join))
        out = df[df[key].isin(joined.index)].copy()
        out[text_col] = out[key].map(joined)
        return out

    return ds.map_batches(rebuild, batch_format="pandas")
