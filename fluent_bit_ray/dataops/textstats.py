"""Text analysis over a documents table: tokens, quality, lang-id,
fingerprints.

All stages are vectorized ``map_batches`` transforms (pandas string
kernels / numpy); nothing materializes the corpus. These extend the
engine beyond the reference's operator set for training-data pipeline
use (per the build brief), so there is no reference citation — the
semantics are standard corpus-QA heuristics.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

_STOP_EN = {"the", "a", "an", "and", "of", "to", "in", "is", "it", "that",
            "for", "on", "with", "as", "at", "by", "this", "be", "are"}
_STOP_DE = {"der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu"}
_STOP_FR = {"le", "la", "les", "et", "est", "pas", "pour", "dans", "une"}
_STOP_ES = {"el", "los", "las", "y", "es", "no", "para", "en", "una"}
_LANGS = [("en", _STOP_EN), ("de", _STOP_DE), ("fr", _STOP_FR), ("es", _STOP_ES)]

# BPE-ish pre-tokenizer: contractions | words | numbers | punct runs
_BPE_RE = re.compile(r"'[a-z]+|[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]+")
_PUNCT_RE = re.compile(r"[^\w\s]")

FP_BASE = 257
FP_MOD = (1 << 61) - 1


def token_count_batch(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    s = df[text_col].astype(str)
    # whitespace tokens, single-space convention (== duckdb string_split ' ')
    df["n_tokens_ws"] = (s.str.count(" ") + 1).astype("int64")
    # str.count(regex) == len(findall) for a group-free pattern
    df["n_tokens_bpe"] = s.str.count(_BPE_RE.pattern).astype("int64")
    return df


def _stopword_counts(words: pd.Series, stop: set, n: int,
                     index) -> np.ndarray:
    """Per-row stopword hits, vectorized: explode once, one isin, one
    scatter-add (duplicates counted, like the per-row sum)."""
    ex = words.explode()
    ew = ex[ex.notna()]
    pos = {idx: i for i, idx in enumerate(index)}
    rowpos = np.fromiter((pos[r] for r in ew.index), dtype=np.int64,
                         count=len(ew))
    out = np.zeros(n, dtype=np.int64)
    hits = ew.isin(stop).to_numpy()
    np.add.at(out, rowpos[hits], 1)
    return out


def quality_batch(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    s = df[text_col].astype(str)
    n_chars = s.str.len().astype("int64")
    low = s.str.lower()
    n_words = (low.str.count(" ") + 1).astype("int64")
    n_stop = pd.Series(
        _stopword_counts(low.str.split(" "), _STOP_EN, len(df), df.index),
        index=df.index, dtype="int64")
    n_punct = s.str.count(_PUNCT_RE.pattern).astype("int64")
    df["n_chars_q"] = n_chars
    df["n_words"] = n_words
    df["n_stopwords"] = n_stop
    df["n_punct"] = n_punct
    # composite quality score (float; per-row deterministic formula)
    df["quality"] = np.round(
        0.4 * np.minimum(n_chars / 500.0, 1.0)
        + 0.4 * (n_stop / np.maximum(n_words, 1))
        + 0.2 * (1.0 - np.minimum(n_punct / np.maximum(n_chars, 1) * 10.0, 1.0)),
        6)
    return df


def langid_batch(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Stopword-vote language id, vectorized: explode words once, one
    isin per language, argmax with first-language tie-break (exactly
    the per-row loop's semantics — earlier language wins ties)."""
    words_col = df[text_col].astype(str).str.lower().str.findall(r"[a-zà-ÿä-ü]+")
    n = len(df)
    ex = words_col.explode()
    valid = ex.notna()
    ew = ex[valid]
    rows = ew.index.to_numpy()
    scores = np.zeros((n, len(_LANGS)), dtype=np.int64)
    pos = {idx: i for i, idx in enumerate(df.index)}
    rowpos = np.fromiter((pos[r] for r in rows), dtype=np.int64,
                         count=len(rows))
    for li, (_, stop) in enumerate(_LANGS):
        hits = ew.isin(stop).to_numpy()
        np.add.at(scores[:, li], rowpos[hits], 1)
    best = np.argmax(scores, axis=1)        # argmax takes the FIRST max
    names = np.array([lang for lang, _ in _LANGS])
    pred = np.where(scores.max(axis=1) >= 1, names[best], "unknown")
    df["lang_pred"] = pred
    return df


_FP_K = 7  # bytes folded per step: dot of 7 base-257 digits < 2^56 (int64-safe)
_FP_POWS = np.array([FP_BASE ** (_FP_K - 1 - i) for i in range(_FP_K)],
                    dtype=np.int64)
_FP_PK = pow(FP_BASE, _FP_K, FP_MOD)


def fingerprint_batch(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Rabin–Karp rolling hash of the whole text (mod 2^61-1).

    Identical to the byte-at-a-time recurrence, but 7 bytes fold per
    Python-level step: the 7-byte window collapses to one int64 dot
    product (numpy), then h = (h·257⁷ + window) mod M."""
    def fp(t: str) -> int:
        b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8).astype(np.int64)
        m = len(b) // _FP_K * _FP_K
        h = 0
        if m:
            for w in b[:m].reshape(-1, _FP_K) @ _FP_POWS:
                h = (h * _FP_PK + int(w)) % FP_MOD
        for ch in b[m:]:
            h = (h * FP_BASE + int(ch)) % FP_MOD
        return h

    df["fingerprint"] = df[text_col].astype(str).map(fp).astype("int64")
    return df


# Control chars except \t \n \r (those fold into the \s+ collapse).
# RE2 syntax on BOTH sides: pyarrow.compute and DuckDB regexp_replace.
_CTRL_RE = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"


def normalize_batch(tbl, text_col: str = "text"):
    """Unicode text normalization, fully Arrow (zero row loop):
    NFC normalize → strip control chars → collapse ``\\s+`` to one
    space → trim spaces; plus the normalized codepoint length.

    Every step is an RE2/Unicode kernel that DuckDB reproduces
    exactly (nfc_normalize + regexp_replace + trim + length), so the
    op carries a full value-hash oracle. Runs as a stateless
    ``map_batches(batch_format="pyarrow")`` stage — at 100 TB this is
    pure streaming compute, no shuffle, no state.

    NFC runs through polars (vectorized, zero-copy from Arrow):
    pyarrow 16's ``utf8_normalize(form="NFC")`` decomposes but never
    RECOMPOSES (measured: ``e+U+0301`` stays two codepoints, and it
    even decomposes a composed ``Å``), so it is not Unicode NFC and
    would hash-mismatch DuckDB. Fallback without polars: per-row
    ``unicodedata.normalize`` on the non-ASCII rows only (ASCII is
    NFC-invariant, so the Python cost is bounded by the non-ASCII
    fraction)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    col = tbl.column(text_col)
    try:
        import polars as pl
        s = pa.chunked_array([
            pl.from_arrow(c).str.normalize("NFC").to_arrow()
            for c in (col.chunks or [col.combine_chunks()])])
        s = pc.cast(s, col.type)
    except ImportError:                              # pragma: no cover
        import unicodedata
        nonascii = pc.match_substring_regex(col, r"[^\x00-\x7F]")
        vals = col.to_pylist()
        s = pa.array([unicodedata.normalize("NFC", v) if na and
                      v is not None else v
                      for v, na in zip(vals, nonascii.to_pylist())],
                     type=col.type)
    s = pc.replace_substring_regex(s, _CTRL_RE, "")
    s = pc.replace_substring_regex(s, r"\s+", " ")
    s = pc.utf8_trim(s, characters=" ")
    tbl = tbl.drop_columns([text_col])
    return tbl.append_column("norm_text", s).append_column(
        "norm_len", pc.cast(pc.utf8_length(s), "int64"))


def normalize_ds(ds, text_col: str = "text"):
    return ds.map_batches(
        lambda t: normalize_batch(t, text_col), batch_format="pyarrow")


def _apply(ds, fn, **kw):
    return ds.map_batches(lambda df: fn(df, **kw), batch_format="pandas")


def token_count_ds(ds, text_col: str = "text"):
    return _apply(ds, token_count_batch, text_col=text_col)


def quality_ds(ds, text_col: str = "text"):
    return _apply(ds, quality_batch, text_col=text_col)


def langid_ds(ds, text_col: str = "text"):
    return _apply(ds, langid_batch, text_col=text_col)


def fingerprint_ds(ds, text_col: str = "text"):
    return _apply(ds, fingerprint_batch, text_col=text_col)


def vocab_topk(ds, text_col: str = "text", k: int = 100) -> pd.DataFrame:
    """Corpus vocabulary top-k — the classic 100 TB partial-aggregation
    shape: per-batch token counts (explode + value_counts, no Python
    loop) shrink each batch to its DISTINCT (token, n) pairs BEFORE the
    shuffle, a Ray groupby-sum merges the partials, and only the merged
    (vocab-sized, ≪ corpus) table reaches the driver for the final
    top-k. Ties break by token ascending (deterministic).

    Tokens are whitespace runs (``\\S+``) — the same split every other
    textstats op uses, reproducible as regexp_extract_all in SQL.
    """
    from ray.data.aggregate import Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df[text_col].astype(str).str.split().explode().dropna()
        vc = toks.value_counts()
        return pd.DataFrame({"token": vc.index.astype(str),
                             "n": vc.to_numpy(dtype="int64")})

    merged = (ds.map_batches(partial, batch_format="pandas")
              .groupby("token").aggregate(Sum("n", alias_name="n"))
              .to_pandas())
    merged["n"] = merged["n"].astype("int64")
    out = merged.sort_values(["n", "token"],
                             ascending=[False, True]).head(k)
    return out[["token", "n"]].reset_index(drop=True)
