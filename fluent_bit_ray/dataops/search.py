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


def _split_col(df: pd.DataFrame, text_col: str) -> pd.Series:
    """Whitespace-token lists per row. NULL text contributes no tokens
    (fillna before astype — bare astype(str) would mint a literal
    'None' token, diverging from the oracle's
    unnest(regexp_extract_all(NULL)) = nothing)."""
    return df[text_col].fillna("").astype(str).str.split()


def _term_tf(df: pd.DataFrame, terms: list[str], text_col: str,
             per_doc: bool, split: pd.Series | None = None
             ) -> pd.DataFrame:
    """Token-exact term frequencies per row (or presence per row).
    ``split``: reuse an already-tokenized column (the BM25 passes
    also need per-row lengths — splitting is their dominant string
    cost, so it is paid once per batch)."""
    words = split if split is not None else _split_col(df, text_col)
    toks = words.explode().dropna()
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


# -------------------------------------------------- hybrid retrieval
def hybrid_search_topk(docs, embs, terms: list[str], query_vec,
                       k_lex: int = 50, k: int = 10,
                       text_col: str = "text", id_col: str = "doc_id",
                       vec_id_col: str = "vec_id",
                       emb_col: str = "embedding") -> pd.DataFrame:
    """Two-stage retrieval: BM25 candidate generation → embedding
    cosine rerank (the standard lexical-recall / semantic-precision
    hybrid). Returns (id_col, score, cosine) for the top-``k``
    candidates by cosine (ties → id ASC), sorted by id.

    Scale shape: stage 1 is :func:`bm25_topk` (no shuffle, ≤ k_lex
    driver rows); the candidate id set and the query vector broadcast
    via ``ray.put``; stage 2 streams the embeddings table ONCE with a
    vectorized isin filter emitting ≤ k_lex total rows — no shuffle,
    no join exchange. Cosine is float64 over the candidate set only
    (k_lex rows), matching the ann_topk oracle convention (DuckDB
    list_cosine_similarity, compared at 4 decimals). Known shared
    caveat with ann_topk: the top-k CUT uses each side's unrounded
    value, so two candidates whose cosines differ by less than
    float32 epsilon straddling rank k could select different rows —
    data-dependent, not observed at either gate scale.
    """
    import ray

    cand = bm25_topk(docs, terms, k=k_lex, text_col=text_col,
                     id_col=id_col)
    empty = pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                          "score": pd.Series([], dtype="int64"),
                          "cosine": pd.Series([], dtype="float64")})
    if not len(cand):
        return empty
    ids = np.sort(cand[id_col].to_numpy(dtype="int64"))
    ids_ref = ray.put(ids)

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        sel = df[df[vec_id_col].isin(ray.get(ids_ref))]
        return sel[[vec_id_col, emb_col]]

    sub = embs.map_batches(pick, batch_format="pandas").to_pandas()
    if not len(sub):
        return empty
    mat = np.stack(sub[emb_col].to_numpy()).astype(np.float64)
    q = np.asarray(query_vec, dtype=np.float64)
    cos = (mat @ q) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    rer = pd.DataFrame({id_col: sub[vec_id_col].to_numpy(dtype="int64"),
                        "cosine": cos})
    out = cand.merge(rer, on=id_col, how="inner")
    out = out.sort_values(["cosine", id_col],
                          ascending=[False, True]).head(k)
    return out.sort_values(id_col).reset_index(drop=True)


# ------------------------------------------------------------- BM25
def corpus_length_stats(ds, terms: list[str], text_col: str = "text"
                        ) -> tuple[int, int, dict[str, int]]:
    """(n_docs, total_tokens, df-per-term) in ONE corpus pass.

    Each block emits ≤ len(terms)+1 partial rows (term presence counts
    plus one corpus-stats row), so the driver merge is
    O((terms+1)·blocks) regardless of corpus size. Token = ``\\S+``
    run, the split every textstats op shares with its oracles.
    """
    terms = list(dict.fromkeys(terms))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = _split_col(df, text_col)
        dl = toks.str.len().fillna(0).to_numpy(dtype="int64")
        pres = _term_tf(df, terms, text_col, per_doc=False, split=toks)
        vc = pres["token"].value_counts()
        return pd.DataFrame(
            {"token": list(vc.index.astype(str)) + [""],
             "n": list(vc.to_numpy(dtype="int64")) + [len(df)],
             "dl": [0] * len(vc) + [int(dl.sum())]})

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    dfs = {t: 0 for t in terms}
    n_docs = total = 0
    if len(parts):
        agg = parts.groupby("token")[["n", "dl"]].sum()
        for t, row in agg.iterrows():
            if t == "":
                n_docs, total = int(row["n"]), int(row["dl"])
            else:
                dfs[str(t)] = int(row["n"])
    return n_docs, total, dfs


def bm25_topk(ds, terms: list[str], k: int = 20,
              k1_milli: int = 1200, b_milli: int = 750,
              text_col: str = "text", id_col: str = "doc_id"
              ) -> pd.DataFrame:
    """Top-k documents under an INTEGER-QUANTIZED BM25.

    Classic BM25 needs ln() and float division — both drift between
    engines — so every factor here is a milli-scaled integer with
    floor division, replayed verbatim by the DuckDB oracle:

        avgdl_m   = (1000 · Σ dl) // N
        idf_m(t)  = (1000 · (N − df + 1)) // (df + 1)
                    (Robertson-shaped rational idf surrogate — same
                    monotonicity in df, no logarithm; documented
                    deviation from the ln() form)
        norm_m(d) = 1000 − b_m + (b_m · dl · 1000) // avgdl_m
        tfc_m     = (tf · (k1_m + 1000) · 1000)
                      // (tf · 1000 + (k1_m · norm_m) // 1000)
        score(d)  = Σ_t idf_m(t) · tfc_m(t, d)   (score 0 dropped)

    Defaults k1_m=1200, b_m=750 quantize the textbook k1=1.2, b=0.75.
    Top-k by (score DESC, id ASC).

    Scale shape mirrors :func:`keyword_search_topk`: one stats pass
    (≤ terms+1 partial rows per block), then broadcast integer weights
    and a score pass emitting ≤ k rows per block — no shuffle. int64
    is safe while idf_m · tfc_m < 2⁶³: tfc_m ≤ (k1_m+1000)·1000, so
    N/df may reach ~4·10⁹ before overflow — cap idf_m if a corpus
    exceeds that.
    """
    n_docs, total, dfs = corpus_length_stats(ds, terms, text_col)
    if not n_docs or not total:
        return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                             "score": pd.Series([], dtype="int64")})
    # clamp: a corpus that is almost entirely empty docs can floor the
    # milli average length to 0 (div-by-zero in norm_m); the oracle
    # applies the same greatest(..., 1)
    avgdl_m = max(1, (1000 * total) // n_docs)
    idf = {t: (1000 * (n_docs - n + 1)) // (n + 1)
           for t, n in dfs.items() if n > 0}
    if not idf:
        return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                             "score": pd.Series([], dtype="int64")})
    wterms = list(idf)

    def score_partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        empty = pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                              "score": pd.Series([], dtype="int64")})
        words = _split_col(df, text_col)
        tf = _term_tf(df, wterms, text_col, per_doc=True, split=words)
        if not len(tf):
            return empty
        dl_all = words.str.len().fillna(0).to_numpy(dtype="int64")
        rows = tf["row"].to_numpy(dtype="int64")
        t_f = tf["tf"].to_numpy(dtype="int64")
        dl = dl_all[rows]
        idf_w = tf["token"].map(idf).to_numpy(dtype="int64")
        norm_m = 1000 - b_milli + (b_milli * dl * 1000) // avgdl_m
        tfc_m = (t_f * (k1_milli + 1000) * 1000) \
            // (t_f * 1000 + (k1_milli * norm_m) // 1000)
        tf["part"] = idf_w * tfc_m
        sc = tf.groupby("row")["part"].sum()
        ids = df[id_col]
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
