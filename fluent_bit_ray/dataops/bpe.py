"""BPE tokenizer training over a document corpus.

The classic two-phase trainer shape (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units" — public):

1. **Corpus scale (distributed)**: word counting. Per-batch
   ``\\S+`` split + ``value_counts`` shrinks each batch to its
   DISTINCT (word, n) pairs BEFORE the shuffle (the vocab_topk
   partial-aggregation pattern), one ``groupby("word").sum()``
   exchange merges partials, and only the compact distinct-word
   table — ≪ corpus, even at 100 TB — reaches the driver.
2. **Vocab scale (driver)**: the greedy merge loop runs over the
   compact (word, count) table in Python. Each round counts adjacent
   symbol pairs weighted by word count (every adjacency, overlapping
   runs included), picks the max — ties break on the smaller
   ``"L R"`` string — and merges that pair in every word.

Symbolization: words lowercase, split into codepoints, ``</w>``
appended as the end-of-word sentinel; the working representation is
the space-padded symbol string ``" l o w </w> "``.

**Merge application is ``_SWEEPS`` non-overlapping string-replace
sweeps** of ``" L R "`` → ``" LR "`` over the padded string, NOT the
single left-to-right symbol scan of reference BPE. One replace sweep
misses adjacencies that share a boundary space with a prior match
(``a a a a a``); repeating the sweep converges, and for natural text
(same-symbol runs ≤ 4) the result is identical to the reference
scan. The deviation is deliberate: ``replace`` has the exact same
semantics in DuckDB, so the oracle replays every round — pair
counting, argmax, tie-break, application — with plain SQL and the
trainer is value-hash checkable end to end.
"""

from __future__ import annotations

import pandas as pd

_SWEEPS = 4
_EOW = "</w>"


def _word_counts(ds, text_col: str, lowercase: bool):
    """Distributed distinct-word counts (partial-aggregate shape)."""
    from ray.data.aggregate import Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # null text contributes no words (SQL: regexp_extract_all(NULL)
        # unnests to nothing), not the literal 'nan'/'None'
        s = df[text_col].fillna("").astype(str)
        if lowercase:
            s = s.str.lower()
        vc = s.str.split().explode().dropna().value_counts()
        return pd.DataFrame({"word": vc.index.astype(str),
                             "n": vc.to_numpy()})

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby("word").aggregate(Sum("n", alias_name="n")))


def _pad(word: str) -> str:
    return " " + " ".join(list(word) + [_EOW]) + " "


def _merge(s: str, pat: str, rep: str) -> str:
    for _ in range(_SWEEPS):
        s = s.replace(pat, rep)
    return s


def bpe_train(ds, num_merges: int, text_col: str = "text",
              max_words: int = 100_000,
              lowercase: bool = True) -> pd.DataFrame:
    """Train ``num_merges`` BPE merges; returns one row per merge:
    ``rank`` (0-based), ``pair`` (the merged ``"L R"``), and
    ``pair_count`` (its weighted adjacency count when chosen).

    ``max_words`` caps the driver-side vocab at the top-N words by
    (count desc, word asc) — the standard practical bound; at 100 TB
    the distinct-word table is the only thing that leaves the
    cluster, and the cap keeps the merge loop's working set fixed no
    matter how big the corpus gets.
    """
    wc = _word_counts(ds, text_col, lowercase).to_pandas()
    if wc.empty:          # empty corpus → Ray returns a column-less frame
        return pd.DataFrame(columns=["rank", "pair", "pair_count"])
    wc = (wc.sort_values(["n", "word"], ascending=[False, True])
          .head(max_words))
    words = [_pad(w) for w in wc["word"]]
    counts = wc["n"].astype("int64").tolist()

    merges = []
    for rank in range(num_merges):
        pairs: dict[str, int] = {}
        for s, n in zip(words, counts):
            syms = s.split()
            for i in range(len(syms) - 1):
                p = syms[i] + " " + syms[i + 1]
                pairs[p] = pairs.get(p, 0) + n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        pat = " " + best[0] + " "
        rep = " " + best[0].replace(" ", "") + " "
        words = [_merge(s, pat, rep) for s in words]
        merges.append({"rank": rank, "pair": best[0],
                       "pair_count": best[1]})
    return pd.DataFrame(merges,
                        columns=["rank", "pair", "pair_count"])


class _BpeTokenizer:
    """Actor-pool encode stage: merges list held once per actor plus a
    word → token-count cache (natural-text word distributions are
    Zipfian, so the cache absorbs almost every lookup). This is the
    CORPUS-scale side of BPE — training touches only the compact
    vocab, but encoding touches every byte of the 100 TB corpus, so
    it must be a stateless-per-batch streaming map with per-actor
    state."""

    def __init__(self, merges: list[str], text_col: str,
                 lowercase: bool):
        self.pats = [(" " + p + " ", " " + p.replace(" ", "") + " ")
                     for p in merges]
        self.text_col = text_col
        self.lowercase = lowercase
        self.cache: dict[str, int] = {}

    def _word_tokens(self, w: str) -> int:
        n = self.cache.get(w)
        if n is None:
            s = _pad(w)
            for pat, rep in self.pats:
                s = _merge(s, pat, rep)
            n = len(s.split())
            self.cache[w] = n
        return n

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        s = df[self.text_col].fillna("").astype(str)
        if self.lowercase:
            s = s.str.lower()
        words = s.str.split()
        counts = [sum(map(self._word_tokens, ws)) for ws in words]
        out = df.drop(columns=[self.text_col]).copy()
        out["n_bpe_tokens"] = pd.Series(counts, index=df.index,
                                        dtype="int64")
        return out


def bpe_tokenize_counts(ds, merges: list[str], text_col: str = "text",
                        lowercase: bool = True, concurrency: int = 4):
    """Per-row trained-BPE token counts: ``merges`` (the ``pair``
    column of :func:`bpe_train`) broadcast via the actor args, applied
    with the SAME replace-sweep semantics as training."""
    return ds.map_batches(_BpeTokenizer,
                          fn_constructor_args=(merges, text_col,
                                               lowercase),
                          batch_format="pandas",
                          concurrency=concurrency)


def _train_ctes(num_merges: int, max_words: int, source: str,
                text_col: str) -> str:
    """The shared WITH-clause body replaying training round by round:
    pair counts via list adjacency, argmax with the (count desc,
    pair asc) tie-break, application as ``_SWEEPS`` nested
    ``replace`` calls. ``bestp{r}`` pads an EXHAUSTED round (no pairs
    left — the engine loop breaks there) with the single-space
    sentinel pair, whose ``'   '`` pattern can never match a
    single-space-joined symbol string, so downstream cross joins stay
    1-row instead of wiping the table."""
    rounds = []
    for r in range(num_merges):
        prev = f"tok{r}"          # tok0 = initial symbolization
        s_expr = "s"
        for _ in range(_SWEEPS):
            s_expr = (f"replace({s_expr}, ' ' || b.pair || ' ', "
                      f"' ' || replace(b.pair, ' ', '') || ' ')")
        rounds.append(f"""
        pairs{r} AS (
          SELECT p, sum(cnt)::BIGINT c FROM (
            SELECT cnt, unnest(list_transform(range(1, len(l)),
                   i -> l[i] || ' ' || l[i + 1])) p
            FROM (SELECT cnt, string_split(trim(s, ' '), ' ') l
                  FROM {prev})) GROUP BY p),
        best{r} AS MATERIALIZED (SELECT p AS pair, c FROM pairs{r}
                    ORDER BY c DESC, p LIMIT 1),
        bestp{r} AS MATERIALIZED (
          SELECT pair FROM best{r}
          UNION ALL
          SELECT ' ' WHERE NOT EXISTS (SELECT 1 FROM best{r})),
        tok{r + 1} AS (SELECT t.word, t.cnt, {s_expr} AS s
                       FROM {prev} t, bestp{r} b)""")
    return f"""
        wc AS (
          SELECT word, count(*)::BIGINT cnt FROM (
            SELECT unnest(regexp_extract_all(lower({text_col}),
                   '\\S+')) word FROM {source})
          GROUP BY word ORDER BY cnt DESC, word LIMIT {max_words}),
        tok0 AS (
          SELECT word, cnt,
                 ' ' || array_to_string(regexp_extract_all(word, '.'),
                 ' ') || ' {_EOW} ' AS s
          FROM wc),{",".join(rounds)}"""


def bpe_train_sql(num_merges: int, max_words: int = 100_000,
                  source: str = "documents",
                  text_col: str = "text") -> str:
    """DuckDB replay of :func:`bpe_train` as unrolled CTEs."""
    unions = "\nUNION ALL ".join(
        f"SELECT {r} AS rank, pair, c AS pair_count FROM best{r}"
        for r in range(num_merges))
    return f"""
        WITH {_train_ctes(num_merges, max_words, source, text_col)}
        SELECT * FROM ({unions}) ORDER BY rank
    """


def bpe_tokenize_sql(num_merges: int, max_words: int = 100_000,
                     source: str = "documents",
                     text_col: str = "text",
                     id_col: str = "doc_id") -> str:
    """DuckDB replay of :func:`bpe_tokenize_counts` over a corpus
    whose merges come from :func:`bpe_train` on the SAME corpus: the
    training CTEs re-derive best0..best{n-1} (each MATERIALIZED once
    and cross-joined as a one-row table — scalar subqueries here made
    DuckDB inline the whole training chain per reference and exhaust
    file handles), then every DISTINCT word is pushed through the
    same ranked replace-sweep chain and token counts sum per
    document."""
    s_expr = "s"
    for r in range(num_merges):
        pat = f"' ' || b{r}.pair || ' '"
        rep = f"' ' || replace(b{r}.pair, ' ', '') || ' '"
        for _ in range(_SWEEPS):
            s_expr = f"replace({s_expr}, {pat}, {rep})"
    joins = ", ".join(f"bestp{r} b{r}" for r in range(num_merges))
    return f"""
        WITH {_train_ctes(num_merges, max_words, source, text_col)},
        wpd AS MATERIALIZED (
          SELECT {id_col}, unnest(regexp_extract_all(lower({text_col}),
                 '\\S+')) word FROM {source}),
        dw AS (SELECT DISTINCT word FROM wpd),
        dtok AS (
          SELECT word, len(string_split(trim({s_expr}, ' '), ' '))
                 ::BIGINT AS n FROM (
            SELECT word, ' ' || array_to_string(
                   regexp_extract_all(word, '.'), ' ') || ' {_EOW} '
                   AS s FROM dw), {joins}),
        agg AS (SELECT w.{id_col}, sum(d.n) AS n
                FROM wpd w JOIN dtok d USING (word)
                GROUP BY w.{id_col})
        SELECT src.{id_col}, coalesce(a.n, 0)::BIGINT AS n_bpe_tokens
        FROM {source} src LEFT JOIN agg a USING ({id_col})
        ORDER BY src.{id_col}
    """
