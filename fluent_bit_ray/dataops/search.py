"""Keyword search over a document corpus — integer tf-idf top-k.

The retrieval companion to the embedding ANN family (annsearch.py):
given a handful of query terms, rank documents by an exact-integer
tf-idf score so the whole computation is reproducible bit-for-bit in
SQL (the driver's DuckDB oracle) and immune to float-division drift
between engines.

Scoring (BM25-shaped, integer-exact):
    df(t)   = number of documents containing token t (exact token match)
    idf_w(t)= 1_000_000 // df(t)          (0 when t appears nowhere)
    score(d)= Σ_t tf(t, d) · idf_w(t)     (docs with score 0 are dropped)
Top-k by (score DESC, id ASC) — deterministic ties.

Tokens are whitespace runs (``\\S+``), the same split every textstats
op shares with its oracles (regexp_extract_all in SQL).

Scale shape (100 TB): the query-term list is tiny and broadcast; the
corpus streams TWICE (df pass, then score pass), each pass emitting
only per-batch partials — |terms| rows per block for df, ≤ k rows per
block for the score top-k — so the driver merge is O(terms + k·blocks)
regardless of corpus size. No shuffle anywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _term_tf(df: pd.DataFrame, terms: list[str], text_col: str,
             per_doc: bool) -> pd.DataFrame:
    """Token-exact term frequencies per row (or presence per row)."""
    toks = df[text_col].astype(str).str.split().explode().dropna()
    hit = toks[toks.isin(terms)]
    if per_doc:
        tf = hit.groupby([hit.index, hit]).size()
        tf.index.names = ["row", "token"]
        return tf.reset_index(name="tf")
    # df pass: distinct (row, token) pairs only
    pres = hit.reset_index().drop_duplicates()
    pres.columns = ["row", "token"]
    return pres


def document_frequencies(ds, terms: list[str],
                         text_col: str = "text") -> dict[str, int]:
    """df(t) for each query term — per-batch partial counts, driver sum.

    Each block contributes at most ``len(terms)`` rows; the shuffle-free
    merge happens on the driver (terms × blocks is tiny).
    """
    terms = list(dict.fromkeys(terms))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        pres = _term_tf(df, terms, text_col, per_doc=False)
        vc = pres["token"].value_counts()
        return pd.DataFrame({"token": vc.index.astype(str),
                             "n": vc.to_numpy(dtype="int64")})

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    out = {t: 0 for t in terms}
    if len(parts):
        for t, n in parts.groupby("token")["n"].sum().items():
            out[str(t)] = int(n)
    return out


def keyword_search_topk(ds, terms: list[str], k: int = 20,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> pd.DataFrame:
    """Top-k documents for a bag of query terms, integer tf-idf.

    Pass 1 computes df(t) (document_frequencies); pass 2 broadcasts the
    integer weights {t: 1_000_000 // df(t)}, scores each batch
    vectorized (explode + isin + groupby-sum — no Python row loop), and
    keeps only the batch-local top-k, so the driver merges ≤ k rows per
    block. Returns columns (id_col, score) sorted (score DESC, id ASC).
    """
    dfs = document_frequencies(ds, terms, text_col)
    weights = {t: (1_000_000 // n if n else 0) for t, n in dfs.items()}
    weights = {t: w for t, w in weights.items() if w > 0}
    if not weights:
        return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                             "score": pd.Series([], dtype="int64")})
    wterms = list(weights)

    def score_partial(df: pd.DataFrame) -> pd.DataFrame:
        tf = _term_tf(df.reset_index(drop=True), wterms, text_col,
                      per_doc=True)
        if not len(tf):
            return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                                 "score": pd.Series([], dtype="int64")})
        w = tf["token"].map(weights).to_numpy(dtype="int64")
        tf["part"] = tf["tf"].to_numpy(dtype="int64") * w
        ids = df[id_col].reset_index(drop=True)
        sc = tf.groupby("row")["part"].sum()
        out = pd.DataFrame({id_col: ids.iloc[sc.index].to_numpy(),
                            "score": sc.to_numpy(dtype="int64")})
        out = out[out["score"] > 0]
        return out.sort_values(["score", id_col],
                               ascending=[False, True]).head(k)

    parts = ds.map_batches(score_partial, batch_format="pandas").to_pandas()
    if not len(parts):
        return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                             "score": pd.Series([], dtype="int64")})
    out = parts.sort_values(["score", id_col],
                            ascending=[False, True]).head(k)
    out["score"] = out["score"].astype("int64")
    return out.reset_index(drop=True)
