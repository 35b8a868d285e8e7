"""Corpus n-gram LM scoring — the perplexity-filter analogue.

Pipeline stage family: score each document by how typical its token
transitions are under a language model trained on the corpus itself
(the KenLM-perplexity gate of CCNet/RefinedWeb, in a deterministic
integer form so the DuckDB oracle is bit-exact):

    c(w1), c(w1,w2)  = corpus unigram / bigram counts
    r(w1,w2)         = (1_000_000 · c(w1,w2)) // c(w1)   (milli-scaled
                       conditional probability, integer floor)
    lm_milli(doc)    = (Σ r over the doc's bigrams) // n_bigrams
                       (0 when the doc has < 2 tokens)

Scale shape: pass 1 emits per-batch PARTIAL bigram/unigram counts
(each batch collapses to its distinct grams before the exchange — the
vocab_topk shape); the merged tables are vocabulary-sized (≪ corpus)
and broadcast once via ``ray.put``; pass 2 streams the corpus and
scores each batch with vectorized merges — no shuffle of data rows.
At open-web vocabulary sizes the broadcast table is the documented
bound — swap the exact tables for count-min sketches
(dataops/sketch.py) when vocab outgrows worker memory.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray


def _doc_bigrams(df: pd.DataFrame, text_col: str,
                 toks: pd.Series | None = None) -> pd.DataFrame:
    """(row, w1, w2) bigram rows, never crossing a document boundary.
    ``toks`` lets callers reuse an already-exploded token stream."""
    if toks is None:
        toks = df[text_col].astype(str).str.split().explode().dropna()
    if not len(toks):
        return pd.DataFrame({"row": pd.Series([], dtype="int64"),
                             "w1": pd.Series([], dtype="object"),
                             "w2": pd.Series([], dtype="object")})
    rows = toks.index.to_numpy()
    vals = toks.to_numpy(dtype=object)
    same = np.zeros(len(vals), dtype=bool)
    same[:-1] = rows[:-1] == rows[1:]
    return pd.DataFrame({"row": rows[:-1][same[:-1]],
                         "w1": vals[:-1][same[:-1]],
                         "w2": vals[1:][same[:-1]]})


def ngram_counts(ds, text_col: str = "text") -> tuple[pd.DataFrame,
                                                      pd.DataFrame]:
    """(unigram, bigram) corpus count tables via partial aggregation."""
    from ray.data.aggregate import Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        toks = df[text_col].astype(str).str.split().explode().dropna()
        big = _doc_bigrams(df, text_col, toks=toks)  # tokenize ONCE
        u = toks.value_counts()
        b = big.groupby(["w1", "w2"], sort=False).size()
        out_u = pd.DataFrame({"g": "u\x1f" + u.index.astype(str),
                              "n": u.to_numpy(dtype="int64")})
        bkeys = ("b\x1f" + b.index.get_level_values(0).astype(str)
                 + "\x1f" + b.index.get_level_values(1).astype(str))
        out_b = pd.DataFrame({"g": bkeys, "n": b.to_numpy(dtype="int64")})
        return pd.concat([out_u, out_b], ignore_index=True)

    merged = (ds.map_batches(partial, batch_format="pandas")
              .groupby("g").aggregate(Sum("n", alias_name="n")).to_pandas())
    parts = merged["g"].str.split("\x1f")
    kind = parts.str[0]
    uni = pd.DataFrame({"w1": parts[kind == "u"].str[1].to_numpy(),
                        "cu": merged["n"][kind == "u"]
                        .to_numpy(dtype="int64")})
    bi = pd.DataFrame({"w1": parts[kind == "b"].str[1].to_numpy(),
                       "w2": parts[kind == "b"].str[2].to_numpy(),
                       "cb": merged["n"][kind == "b"]
                       .to_numpy(dtype="int64")})
    return uni, bi


def ngram_lm_scores(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Dataset[id_col, lm_milli]: integer bigram-LM typicality score."""
    uni, bi = ngram_counts(ds, text_col)
    table = bi.merge(uni, on="w1")
    table["r"] = (1_000_000 * table["cb"]) // table["cu"]
    ref = ray.put(table[["w1", "w2", "r"]])

    def score(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        lut = ray.get(ref)
        big = _doc_bigrams(df, text_col)
        out = np.zeros(len(df), dtype=np.int64)
        if len(big):
            m = big.merge(lut, on=["w1", "w2"], how="left")
            # every corpus bigram is in the table by construction
            s = m.groupby("row")["r"].agg(["sum", "count"])
            out[s.index.to_numpy()] = (s["sum"].to_numpy(dtype=np.int64)
                                       // s["count"].to_numpy(dtype=np.int64))
        return pd.DataFrame({id_col: df[id_col].to_numpy(),
                             "lm_milli": out})

    return ds.map_batches(score, batch_format="pandas")
