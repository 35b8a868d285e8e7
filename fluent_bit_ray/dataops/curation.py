"""Corpus-curation operators for training-data pipelines:
benchmark decontamination, deterministic sampling / source mixing,
document chunking, repetition stats and sequence packing.

These extend the engine beyond the reference's operator set (per the
build brief); semantics are the standard web-scale curation recipes
(benchmark n-gram decontamination, Gopher-style repetition filters,
fixed-window chunking, greedy sequence packing).

Scale notes (100 TB framing):

- ``decontaminate``: the benchmark side (a test/eval set) is SMALL by
  construction — its distinct n-gram hashes are collected once, sorted,
  ``ray.put`` ONCE, and every corpus batch membership-tests against the
  shared read-only array (searchsorted, zero-copy from the object
  store). The corpus streams; nothing all-to-all.
- ``hash_sample`` / ``mix_by_source``: stateless per-batch filters on a
  deterministic md5-derived bucket — no shuffle, no RNG state, and the
  same row set at any parallelism (md5 of the key, never
  ``Math.random``-style sampling which is not reproducible or
  resumable).
- ``chunk_docs``: pure flat-map; output-bound (every emitted chunk
  character is touched once).
- ``repetition_stats``: fully vectorized per batch (one explode +
  factorize + scatter-add; no per-row Python beyond pandas C kernels).
- ``pack_sequences``: packing is inherently sequential WITHIN a bin
  stream, so the op packs per (group, shard) — ``shards`` subdivides a
  group deterministically by key hash so one hot source does not
  serialize the job; only (group, key, n_words) moves through the
  shuffle (the text column is projected away before the exchange).

All hashes reuse :func:`fluent_bit_ray.dataops.dedup._h64` (64-bit
little-endian md5 prefix), reproducible in DuckDB SQL — every operator
here has a full rows+schema+hash oracle in ``__ray_entry__.py``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .dedup import _h64, _shingles


# ----------------------------------------------------- decontamination
def benchmark_ngram_hashes(bench_ds, text_col: str = "text",
                           ngram: int = 5) -> np.ndarray:
    """Distinct word-``ngram`` h64 hashes of a (small) benchmark
    Dataset, as a SORTED uint64 array ready to broadcast.

    Computed distributed (per-batch distinct sets), merged on the
    driver — the merge is benchmark-sized (eval sets are MBs), never
    corpus-sized. (A fully distributed dedup+sort — bucket by top bits,
    per-bucket unique, driver concat — was tried and MEASURED SLOWER:
    Ray's sort shuffle on the partial stream costs ~12 s where the
    driver ``np.unique`` costs ~2 s even at the 64× bench table; the
    small serial term is the right trade while the benchmark side
    stays benchmark-sized.)
    """
    def part(df: pd.DataFrame) -> pd.DataFrame:
        hs: set[int] = set()
        # NULL text = empty string (oracle: coalesce(text, '')) — bare
        # astype(str) would mint a literal 'None' gram
        for t in df[text_col].fillna("").astype(str):
            hs |= _shingles(t, ngram)
        arr = np.fromiter(hs, dtype=np.uint64, count=len(hs))
        return pd.DataFrame({"h": arr.view(np.int64)})

    parts = bench_ds.map_batches(part, batch_format="pandas").to_pandas()
    if "h" not in parts.columns or not len(parts):
        return np.zeros(0, dtype=np.uint64)  # empty benchmark
    return np.unique(parts["h"].to_numpy().view(np.uint64))


_BLOOM_BITS = 26  # 2^26-bit (8 MiB) pre-filter bitmap — LLC-resident


def _bloom_bitmap(hashes: np.ndarray, bits: int = _BLOOM_BITS):
    """One-hash Bloom bitmap over the LOW ``bits`` bits of each 64-bit
    hash (uncorrelated with the high-bits ORDER of the sorted array).
    Exactness-preserving pre-filter: a clear bit PROVES absence; a set
    bit falls through to the exact searchsorted, so results never
    change — only the memory traffic does. At 6M benchmark hashes the
    sorted array is ~48 MB and every binary-search probe is ~23 random
    LLC misses at full socket; the bitmap is 8 MiB (LLC-resident,
    shared zero-copy by all workers via plasma) and resolves the ~90%
    non-contaminated grams with ONE load each. Measured NEUTRAL at the
    64× bench table (same-minute A/B best-of-3: 27.7 s vs 28.4 s at 16
    CPUs — md5 shingling dominates there); kept because the probe cost
    it removes grows with the benchmark-hash volume while the bitmap
    stays fixed-size."""
    pos = (hashes & np.uint64((1 << bits) - 1)).astype(np.int64)
    bmp = np.zeros(1 << (bits - 3), dtype=np.uint8)
    np.bitwise_or.at(bmp, pos >> 3,
                     (np.uint8(1) << (pos & 7)).astype(np.uint8))
    return bmp


def _gram_hit_counts(texts: list[str], bh: np.ndarray,
                     bloom: np.ndarray, ngram: int
                     ) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc (DISTINCT contaminated-gram count, DISTINCT gram count)
    — ONE membership pass for the whole batch: concatenate all docs'
    gram sets, Bloom pre-filter (one 8 MiB-bitmap load per gram
    resolves the ~90% non-members), one searchsorted over the
    surviving minority, per-doc counts via reduceat over the doc
    boundaries."""
    n = len(texts)
    n_hits = np.zeros(n, dtype=np.int64)
    sets = [_shingles(t, ngram) for t in texts]
    counts = np.fromiter((len(s) for s in sets), np.int64, count=n)
    if not len(bh) or not n:
        return n_hits, counts
    total = int(counts.sum())
    if not total:
        return n_hits, counts
    allg = np.fromiter((h for s in sets for h in s), np.uint64,
                       count=total)
    pos = allg & np.uint64((1 << _BLOOM_BITS) - 1)
    maybe = (bloom[(pos >> np.uint64(3)).astype(np.int64)]
             >> (pos & np.uint64(7)).astype(np.uint8)) & 1
    hit = np.zeros(total, dtype=np.int64)
    cand = np.flatnonzero(maybe)
    if cand.size:
        g = allg[cand]
        idx = np.searchsorted(bh, g)
        idx[idx == len(bh)] = 0
        hit[cand] = bh[idx] == g
    nz = counts > 0
    bounds = np.concatenate(([0], np.cumsum(counts[nz])[:-1]))
    n_hits[nz] = np.add.reduceat(hit, bounds)
    return n_hits, counts


def decontaminate(ds, bench_hashes: np.ndarray, key: str = "doc_id",
                  text_col: str = "text", ngram: int = 5):
    """Flag corpus docs sharing any word-``ngram`` with the benchmark.

    ``bench_hashes`` is the sorted uint64 array from
    :func:`benchmark_ngram_hashes`; it is ``ray.put`` once (plus an
    8 MiB Bloom pre-filter bitmap, see :func:`_bloom_bitmap`) and each
    task reads both zero-copy. Returns Dataset[key, n_hits, n_grams,
    overlap_milli, contaminated] where ``n_hits`` counts the DISTINCT
    contaminated n-grams of the doc (``_shingles`` is a set),
    ``n_grams`` its total DISTINCT grams, and ``overlap_milli`` the
    integer contamination fraction (1000·n_hits)//max(n_grams,1) —
    the graded-decontamination signal (drop above a threshold instead
    of on any single hit).
    """
    import ray
    bench_hashes = np.ascontiguousarray(bench_hashes, dtype=np.uint64)
    ref = ray.put(bench_hashes)
    bloom_ref = ray.put(_bloom_bitmap(bench_hashes))

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        n_hits, n_grams = _gram_hit_counts(
            df[text_col].fillna("").astype(str).tolist(),
            ray.get(ref), ray.get(bloom_ref), ngram)
        return pd.DataFrame(
            {key: df[key], "n_hits": n_hits, "n_grams": n_grams,
             "overlap_milli": (1000 * n_hits) // np.maximum(n_grams, 1),
             "contaminated": n_hits > 0})

    return ds.map_batches(flag, batch_format="pandas")


# ------------------------------------------------- sampling and mixing
def _key_bucket(s: pd.Series) -> np.ndarray:
    """Deterministic 0..99 bucket per key: h64(str(key)) % 100 — the
    md5 construction DuckDB reproduces, so sampling is oracle-exact
    and identical at any parallelism / on resume."""
    return s.astype(str).map(lambda v: _h64(v) % 100).to_numpy(
        dtype=np.int64)


def hash_sample(ds, rate_pct: int, key: str = "doc_id"):
    """Keep rows whose key bucket < ``rate_pct`` (deterministic ~rate%
    sample; no RNG, no shuffle, resumable)."""
    def keep(df: pd.DataFrame) -> pd.DataFrame:
        return df[_key_bucket(df[key]) < rate_pct]

    return ds.map_batches(keep, batch_format="pandas")


def hash_split(ds, splits: dict[str, int], key: str = "doc_id",
               split_col: str = "split"):
    """Deterministic train/val/test assignment: ``splits`` maps split
    name → percent (must sum to 100); a row's split is the first name
    whose cumulative range contains its key bucket. Every training
    pipeline's first decision — expressed as a stateless per-batch
    map (no RNG, no shuffle, identical at any parallelism and on
    resume; a doc keeps its split across reruns and corpus growth).
    Dict INSERTION order defines the bucket ranges, so pass an
    ordered spec: {"train": 98, "val": 1, "test": 1}."""
    if sum(splits.values()) != 100:
        raise ValueError(f"split percents must sum to 100: {splits}")
    if any(v <= 0 for v in splits.values()):
        # a negative entry would make the cumulative edges non-monotonic
        # and searchsorted would misassign silently; a zero entry is a
        # split no row can ever land in — both are caller mistakes
        raise ValueError(f"split percents must be positive: {splits}")
    names = list(splits)
    edges = np.cumsum([splits[n] for n in names])

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        idx = np.searchsorted(edges, _key_bucket(df[key]), side="right")
        df[split_col] = np.array(names, dtype=object)[idx]
        return df

    return ds.map_batches(assign, batch_format="pandas")


def epoch_shuffle(ds, seed: int, key: str = "doc_id"):
    """Deterministic seeded epoch shuffle: global sort by
    ``h64(md5(f"{seed}:{key}"))`` (ties break on the key) — the
    training-data ordering primitive. Different seeds give
    independent epoch orders; the SAME seed gives the identical
    order at any parallelism and across resumes (no RNG anywhere),
    so a preempted epoch resumes mid-stream instead of re-shuffling.
    Cost shape at 100 TB: one all-to-all range-partition sort on an
    8-byte key — the same exchange ``ds.random_shuffle()`` pays, but
    reproducible."""
    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_shuf"] = df[key].astype(str).map(
            lambda v: _h64(f"{seed}:{v}")).astype(np.uint64)
        return df

    return ds.map_batches(keyed, batch_format="pandas") \
        .sort(["_shuf", key]).drop_columns(["_shuf"])


def mix_by_source(ds, weights: dict[str, int], source_col: str = "source",
                  key: str = "doc_id", default_pct: int = 0):
    """Weighted corpus mixing: per-source deterministic sampling rates
    (percent). The standard "data mixture" step — e.g. keep 100% of
    books, 30% of web — expressed as one stateless batch filter."""
    def keep(df: pd.DataFrame) -> pd.DataFrame:
        pct = df[source_col].map(lambda s: weights.get(s, default_pct)) \
            .to_numpy(dtype=np.int64)
        return df[_key_bucket(df[key]) < pct]

    return ds.map_batches(keep, batch_format="pandas")


# ------------------------------------------------------------ chunking
def chunk_docs(ds, window: int = 32, stride: int = 24,
               key: str = "doc_id", text_col: str = "text"):
    """Split each doc into word windows of ``window`` words every
    ``stride`` words (overlap = window - stride). Pure flat-map:
    Dataset[key, chunk_idx, chunk_text, n_words_chunk]. Empty docs
    emit nothing. Output-bound — each emitted character is assembled
    once; there is no cheaper shape for a chunk-text materializer."""
    def chunks(df: pd.DataFrame) -> pd.DataFrame:
        keys_out: list = []
        idx_out: list[int] = []
        txt_out: list[str] = []
        n_out: list[int] = []
        for k, t in zip(df[key].tolist(), df[text_col].astype(str).tolist()):
            words = t.split()
            for ci, start in enumerate(range(0, len(words), stride)):
                w = words[start:start + window]
                keys_out.append(k)
                idx_out.append(ci)
                txt_out.append(" ".join(w))
                n_out.append(len(w))
        return pd.DataFrame({key: keys_out,
                             "chunk_idx": np.array(idx_out, dtype=np.int64),
                             "chunk_text": txt_out,
                             "n_words_chunk": np.array(n_out,
                                                       dtype=np.int64)})

    return ds.map_batches(chunks, batch_format="pandas")


# ----------------------------------------------------- repetition stats
def _rep_signals(df: pd.DataFrame, text_col: str):
    """(n_words, dup_word_milli, top2_milli) int64 arrays for a batch —
    one explode + one factorize; per-row counts come from C-level
    pandas groupby kernels (no per-row Python). Shared by
    ``repetition_stats`` and the ``curate_corpus`` filter chain."""
    n = len(df)
    words = df[text_col].astype(str).str.split()
    n_words = words.str.len().to_numpy(dtype=np.int64)
    ex = words.explode()
    ew = ex[ex.notna()]
    pos = {idx: i for i, idx in enumerate(df.index)}
    rowpos = np.fromiter((pos[r] for r in ew.index), dtype=np.int64,
                         count=len(ew))
    codes, _ = pd.factorize(ew.to_numpy())
    # distinct words per row: drop duplicate (row, code) pairs
    uniq = pd.DataFrame({"r": rowpos, "c": codes}) \
        .drop_duplicates().groupby("r").size()
    n_uniq = np.zeros(n, dtype=np.int64)
    n_uniq[uniq.index.to_numpy()] = uniq.to_numpy()
    # 2-gram codes: consecutive positions in the SAME row
    same = rowpos[:-1] == rowpos[1:] if len(rowpos) else \
        np.zeros(0, dtype=bool)
    v = int(codes.max()) + 1 if len(codes) else 1
    pair = codes[:-1].astype(np.int64) * v + codes[1:] if len(codes) \
        else np.zeros(0, dtype=np.int64)
    pr = rowpos[:-1][same] if len(rowpos) else rowpos
    pairs = pd.DataFrame({"r": pr, "p": pair[same]})
    top = pairs.groupby(["r", "p"]).size().groupby("r").max()
    top2 = np.zeros(n, dtype=np.int64)
    top2[top.index.to_numpy()] = top.to_numpy()
    n_pairs = np.maximum(n_words - 1, 0)
    dup_frac = 1.0 - n_uniq / np.maximum(n_words, 1)
    top_frac = np.where(n_pairs > 0, top2 / np.maximum(n_pairs, 1), 0.0)
    return (n_words,
            np.floor(dup_frac * 1000.0 + 0.5).astype(np.int64),
            np.floor(top_frac * 1000.0 + 0.5).astype(np.int64))


def repetition_stats(ds, key: str = "doc_id", text_col: str = "text"):
    """Gopher-style within-doc repetition signals, vectorized:

    - ``dup_word_milli`` = floor(1000·(1 − distinct_words/words) + .5)
    - ``top2_milli``     = floor(1000·(max 2-gram count / 2-gram count) + .5)
      (0 for docs with < 2 words)
    """
    def stats(df: pd.DataFrame) -> pd.DataFrame:
        n_words, dup_milli, top2_milli = _rep_signals(df, text_col)
        return pd.DataFrame({
            key: df[key],
            "n_words": n_words,
            "dup_word_milli": dup_milli,
            "top2_milli": top2_milli,
        })

    return ds.map_batches(stats, batch_format="pandas")


# ------------------------------------------------- end-to-end pipeline
def curate_corpus(ds, weights: dict[str, int], budget: int = 128,
                  bench_pred=None, key: str = "doc_id",
                  text_col: str = "text", source_col: str = "source",
                  ngram: int = 5, max_dup_word_milli: int = 600,
                  min_words: int = 5, max_words: int = 80,
                  default_pct: int = 0, dedup_mode: str = "exchange"):
    """The composed training-data curation pipeline: exact dedup →
    repetition + length filter → source mixing → benchmark
    decontamination → sequence packing, as ONE streaming pass over the
    text plus the auxiliary global artifacts it needs.

    Scale shape: the corpus streams through a single fused per-batch
    filter chain; global state is the benchmark n-gram hash set
    (``ray.put`` once, benchmark-sized by construction — contamination
    is checked INLINE in the fused pass, so no corpus-sized flag frame
    ever exists anywhere) and — in ``dedup_mode="broadcast"`` — the
    dedup keep-set. The DEFAULT ``dedup_mode="exchange"`` is the
    100 TB shape: dedup runs as a coarse-partitioned text-hash
    exchange that KEEPS the surviving rows in-stream (the corpus text
    moves once; no driver keep-set at all), making the whole pipeline
    TWO Ray executions (benchmark hashes, then dedup-exchange + fused
    gates + pack). ``"broadcast"`` trades the text exchange for a
    distinct-text-sized driver keep-set — only for corpora whose
    distinct-id set comfortably fits the driver. Results are
    identical across modes (equality-tested). Measured at 800k docs /
    16 CPUs the two are within noise (~2.3 s) — the exchange costs
    nothing extra at bench scale. The final packing exchange moves only
    (source, key, n_words). Returns
    Dataset[source, key, n_words, bin_idx].

    ``bench_pred``: pandas-Series→bool-mask callable selecting the
    benchmark slice (default: ``key % 20 == 0``, the eval-set stand-in
    used by the ``doc_decontaminate`` oracle).
    """
    import ray

    if bench_pred is None:
        def bench_pred(s):  # noqa: E306
            return s % 20 == 0

    keep_ref = None
    if dedup_mode == "broadcast":
        # dedup keep-set: representative (min key) per distinct text
        from .dedup import exact_dedup
        keep_ids = exact_dedup(ds, key=key, text_col=text_col).to_pandas()
        keep_ref = ray.put(np.sort(keep_ids[key].to_numpy()))

    # benchmark n-gram hashes from the benchmark slice of the FULL
    # corpus (pre-dedup — a doc is contaminated regardless of which
    # duplicate survives)
    bench = ds.map_batches(lambda df: df[bench_pred(df[key])],
                           batch_format="pandas")
    bh = benchmark_ngram_hashes(bench, text_col=text_col, ngram=ngram)
    bh_ref = ray.put(bh)
    bloom_ref = ray.put(_bloom_bitmap(bh))

    def _member(sorted_arr: np.ndarray, ids: np.ndarray) -> np.ndarray:
        if not len(sorted_arr):
            return np.zeros(len(ids), dtype=bool)
        idx = np.searchsorted(sorted_arr, ids)
        idx[idx == len(sorted_arr)] = 0
        return sorted_arr[idx] == ids

    def keep_batch(df: pd.DataFrame) -> pd.DataFrame:
        if keep_ref is not None:
            df = df[_member(ray.get(keep_ref), df[key].to_numpy())]
        if not len(df):
            return df.iloc[:0]
        # repetition + length gate (same vectorized kernel as
        # repetition_stats — explode + factorize, no per-row Python)
        n_words, dup_milli, _ = _rep_signals(df, text_col)
        ok = ((n_words >= min_words) & (n_words <= max_words)
              & (dup_milli <= max_dup_word_milli))
        df = df[ok]
        # deterministic source mixing
        pct = df[source_col].map(
            lambda s: weights.get(s, default_pct)).to_numpy(dtype=np.int64)
        df = df[_key_bucket(df[key]) < pct]
        if not len(df):
            return df.iloc[:0]
        # contamination LAST: the gates are independent ANDed
        # predicates, so ordering is free — the n-gram scan is the
        # expensive one and now runs on the fewest rows
        bh_arr = ray.get(bh_ref)
        if len(bh_arr):
            # one batched Bloom-prefiltered membership pass
            # (see _gram_hit_counts)
            n_hits, _ = _gram_hit_counts(
                df[text_col].astype(str).tolist(), bh_arr,
                ray.get(bloom_ref), ngram)
            df = df[n_hits == 0]
        return df

    src = ds
    if dedup_mode == "exchange":
        # in-stream exact dedup: coarse-partition by text hash, keep
        # the min-key row of each distinct text — the corpus text
        # moves through ONE exchange and no keep-set ever exists.
        # r5: the hash is the vectorized 64-bit content key (internal
        # co-identity; the oracle replays dedup by text equality —
        # measured ~20× the per-row md5 map)
        from ..shuffle import coarse_partition_apply, _hash64_of_arrow

        def add_th(df: pd.DataFrame) -> pd.DataFrame:
            import pyarrow as pa
            df = df.copy()
            df["_th"] = _hash64_of_arrow(pa.Array.from_pandas(
                df[text_col].astype(str), type=pa.large_string()))
            return df

        def pick_first(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["_th", key], kind="mergesort")
            th = g["_th"].to_numpy()
            first = np.empty(len(g), dtype=bool)
            if len(g):
                first[0] = True
                first[1:] = th[1:] != th[:-1]
            return g[first].drop(columns=["_th"])

        src = coarse_partition_apply(
            ds.map_batches(add_th, batch_format="pandas"), "_th",
            pick_first)

    survivors = src.map_batches(keep_batch, batch_format="pandas")
    return pack_sequences(survivors, budget=budget, group_col=source_col,
                          key=key, text_col=text_col)


# ----------------------------------------------------------- quantiles
def column_quantiles(ds, col: str, qs=(250, 500, 750, 900, 990),
                     group_col: str | None = None) -> pd.DataFrame:
    """EXACT distributed quantiles of an integer column (the corpus
    length-distribution step), optionally per group.

    Shape: per-batch ``value_counts`` collapses each batch to its
    DISTINCT values (the histogram partial — a hot value ships one row
    per batch, same shape as ``vocab_topk``); the merged histogram is
    driver-sized (distinct values ≪ rows for any length-like column).
    Quantile rule (both engine and oracle): ``qs`` are in MILLI units;
    the q-quantile is the smallest value whose cumulative count
    ≥ ceil(q/1000 · N) — exact integers end to end, no interpolation.

    Returns (group?, q_milli, value, n_le) with ``n_le`` the cumulative
    count at the chosen value (exactness witness).
    """
    cols = [col] if group_col is None else [group_col, col]

    def part(df: pd.DataFrame) -> pd.DataFrame:
        vc = df.groupby(cols, sort=False).size().reset_index(name="n")
        return vc

    hist = (ds.map_batches(part, batch_format="pandas").to_pandas()
            .groupby(cols, sort=False)["n"].sum().reset_index())

    def quantiles_of(h: pd.DataFrame) -> pd.DataFrame:
        h = h.sort_values(col, kind="mergesort")
        cum = h["n"].cumsum().to_numpy()
        total = int(cum[-1]) if len(cum) else 0
        if total == 0:
            return pd.DataFrame({"q_milli": pd.array([], dtype="int64"),
                                 "value": pd.array([], dtype="int64"),
                                 "n_le": pd.array([], dtype="int64")})
        vals = h[col].to_numpy()
        rows = []
        for q in qs:
            rank = -(-q * total // 1000)  # ceil(q/1000 * N), exact int
            i = int(np.searchsorted(cum, rank))
            rows.append((int(q), int(vals[i]), int(cum[i])))
        return pd.DataFrame(rows, columns=["q_milli", "value", "n_le"])

    if group_col is None:
        return quantiles_of(hist).reset_index(drop=True)
    out = (hist.groupby(group_col, sort=False)
           .apply(quantiles_of, include_groups=False).reset_index(level=0)
           .reset_index(drop=True))
    return out.sort_values([group_col, "q_milli"]).reset_index(drop=True)


# ------------------------------------------------------------- packing
def pack_sequences(ds, budget: int = 128, group_col: str = "source",
                   key: str = "doc_id", text_col: str = "text",
                   shards: int = 1, n_col: str | None = None):
    """Greedy sequence packing: within each (group, shard), docs in
    ``key`` order fill bins of at most ``budget`` words; a doc that
    does not fit opens the next bin (an over-budget doc gets its own).
    Returns Dataset[group, key, n_words, bin_idx] (plus ``shard`` when
    ``shards`` > 1; bins are numbered per (group, shard)).

    Only (group, key, n_words) moves through the exchange — the text
    column is projected away in the first map_batches. Packing is
    sequential per (group, shard) by nature; ``shards`` (key-hash
    split) bounds that serialization for hot groups at scale. The
    per-row kernel is integer-only (cumsum-with-reset).

    ``n_col``: pack on a PRECOMPUTED per-row count column (e.g. BPE
    token counts from an upstream tokenizer) instead of counting
    ``text_col`` words; the output count column keeps that name.
    """
    from ..shuffle import coarse_group_apply

    ncol = n_col or "n_words"

    def project(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            group_col: df[group_col],
            key: df[key],
            ncol: df[n_col].to_numpy(dtype=np.int64) if n_col else
            df[text_col].astype(str).str.count(r"\S+")
            .to_numpy(dtype=np.int64),
        })
        if shards > 1:
            out["shard"] = _key_bucket(df[key]) % shards
        return out

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(key, kind="mergesort").reset_index(drop=True)
        n = g[ncol].to_numpy()
        bins = np.zeros(len(g), dtype=np.int64)
        b, cum = 0, 0
        for i, ni in enumerate(n):
            if i > 0 and cum + ni > budget:
                b += 1
                cum = 0
            cum += ni
            bins[i] = b
        g["bin_idx"] = bins
        return g

    gkey = [group_col, "shard"] if shards > 1 else group_col
    return coarse_group_apply(
        ds.map_batches(project, batch_format="pandas"), gkey, pack)


# -------------------------------------------------------- grouped top-k
def grouped_topk(ds, group_col: str, order_col: str, k: int = 5,
                 ascending: bool = False, tie_col: str | None = None):
    """Top-``k`` rows per group by ``order_col`` (the "best docs per
    domain" selection step). Deterministic: ties on ``order_col``
    resolve by ``tie_col`` ascending (required for reproducible
    output — pass the row key).

    Scale shape: each batch first reduces to its OWN top-k per group
    (the partial), so the exchange moves at most k × (groups present
    in the batch) rows per batch — never the corpus; the identical
    kernel then runs once per coarse partition for the global answer.
    """
    from ..shuffle import coarse_partition_apply

    order = [group_col, order_col] + ([tie_col] if tie_col else [])
    asc = [True, ascending] + ([True] if tie_col else [])

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(order, ascending=asc, kind="mergesort")
        return df.groupby(group_col, sort=False).head(k)

    partials = ds.map_batches(topk, batch_format="pandas")
    return coarse_partition_apply(partials, group_col, topk)


def stratified_sample(ds, group_col: str, key: str, n: int = 5):
    """EXACTLY ``n`` rows per stratum (vs the ~rate% of
    :func:`hash_sample`), chosen deterministically as the n smallest
    h64(key) values — no RNG, identical at any parallelism, and the
    standard eval-set construction step. Same partial-top-k exchange
    shape as :func:`grouped_topk` (at most n×groups rows move)."""
    def add_rank(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_hr"] = df[key].astype(str).map(_h64).astype(np.uint64)
        return df

    ranked = ds.map_batches(add_rank, batch_format="pandas")
    out = grouped_topk(ranked, group_col, "_hr", k=n, ascending=True,
                       tie_col=key)
    return out.map_batches(lambda df: df.drop(columns=["_hr"]),
                           batch_format="pandas")
