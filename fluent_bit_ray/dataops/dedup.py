"""Deduplication operators over a documents / embeddings table.

Five families, each expressed Ray-Data-first:

- exact_dedup: content-hash → groupby(hash) → min-key representative.
  The hash (md5 hex) is computed vectorized per batch; the shuffle
  moves only (hash, key) pairs, never the text.
- minhash_dup_pairs: word-shingle → MinHash (k permutations, numpy) →
  LSH banding → groupby(band, band_hash) bucket join → candidate
  pairs → exact n-gram Jaccard verification. Partitioning assumption:
  the candidate set is ≪ the corpus (bucket sizes are capped and
  logged; hot buckets are truncated, which is the standard LSH skew
  guard).
- ngram_jaccard_pairs: the verification metric standalone (exact
  all-pairs — guarded to small inputs; the scale path is
  minhash_dup_pairs which only verifies candidates).
- simhash: 64-bit sign-of-sum signature per doc; near-dup pairs via
  band-exact-match blocking + Hamming verification.
- embedding_dup_pairs: cosine near-dup over a ``list<float>`` column.
  method="exact" does blocked matmul per batch against a broadcast
  (ray.put) normalized matrix — exact, distributed, oracle-matchable;
  method="lsh" buckets by random-hyperplane signature first (the
  100TB path — only same-bucket pairs are scored).

All hashes are md5/crc32-based — deterministic across processes (no
PYTHONHASHSEED dependence). Shingles use md5-derived 64-bit hashes so
the MinHash pipeline is reproducible in DuckDB SQL (the oracle for
``docs_minhash_pairs`` re-implements it end-to-end in SQL).
"""

from __future__ import annotations

import hashlib
import itertools
import os

import numpy as np
import pandas as pd
import pyarrow as pa

_MERSENNE = (1 << 61) - 1


def _md5_hex(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


# ------------------------------------------------------------- exact
def exact_dedup(ds, key: str = "doc_id", text_col: str = "text"):
    """Representative (min key) per distinct text. Returns Dataset[key].

    Per-batch PARTIAL min-by-hash first (each batch shrinks to its
    distinct hashes), then a coarse-partitioned exchange with an
    in-task vectorized groupby-min — the same shape as `_bucket_pairs`
    (Ray's sort-based groupby().aggregate() measured ~2 s fixed cost
    per partition, absurd for the small post-partial exchange).

    r5: the content key is the VECTORIZED 64-bit hash
    (``shuffle._hash64_of_arrow`` — measured 2.8 ms vs 60 ms for the
    per-row md5 map on a 40k-doc batch, warm). It is internal
    co-identity only: the oracle groups by raw text equality, so any
    injective-enough hash matches (collision odds ~n²·2⁻⁶⁵)."""
    import pyarrow.compute as pc

    from ..shuffle import _hash64_of_arrow, coarse_partition_apply

    def hash_batch(t: pa.Table) -> pa.Table:
        kcol = t[key].combine_chunks()
        if t.num_rows == 0:
            return pa.table({"h": pa.array([], pa.uint64()), key: kcol})
        h = _hash64_of_arrow(pc.fill_null(
            pc.cast(t[text_col], pa.large_string()), "None"))
        kv = kcol.to_numpy(zero_copy_only=False)
        order = np.lexsort((kv, h))          # by h, then key
        hs = h[order]
        first = np.ones(len(hs), dtype=bool)
        first[1:] = hs[1:] != hs[:-1]
        sel = pa.array(order[first])
        return pa.table({"h": pa.array(hs[first]),
                         key: pc.take(kcol, sel)})

    hashed = ds.map_batches(hash_batch, batch_format="pyarrow")

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("h", sort=False, as_index=False)[key].min()[[key]]

    return coarse_partition_apply(hashed, "h", pick)


# ----------------------------------------------------------- shingles
def _h64(s: str) -> int:
    """64-bit shingle hash: little-endian first 8 md5 digest bytes —
    the same construction DuckDB can express (md5() + hex slicing), so
    the whole MinHash pipeline is oracle-reproducible in SQL."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8],
                          "little")


# Worker-process-level gram→h64 cache, HIT-RATE ADAPTIVE and keyed
# PER NGRAM SIZE. A dict hit (~450 ns on a multi-M-entry dict —
# random memory access) only beats md5 (~700 ns) when grams actually
# repeat; measured on the synthetic documents corpus (≈90% DISTINCT
# grams in a single streaming pass) a cold cache made shingling 1.8×
# SLOWER (get-miss + insert per gram) and pressured worker memory.
# Each (worker, ngram) therefore runs its own probation window and
# keeps its cache only while it earns its keep — the decision is
# ROLLING, re-checked every _CACHE_WINDOW gets, and an off cache
# re-probes after _CACHE_RETRY gets (≤4% worst-case overhead). The
# round-3 single-global-state design caused a measured 2.4× in-session
# pathology: a dup-heavy ngram-3 pass (minhash/simhash) locked the
# cache into "keep", then a later ngram-5 pass (decontaminate) paid a
# saturated-dict miss + insert for every gram, forever (fresh 28 s →
# conditioned 66 s at the 64× table / 16 CPUs). Bounded per dict so a
# 100 TB vocabulary cannot OOM a worker (~2M entries ≈ 150 MB each).
_SHINGLE_CACHE_MAX = int(os.environ.get("GRAFT_SHINGLE_CACHE", "2000000"))
_CACHE_PROBATION = 200_000     # gets before the first keep/drop call
_CACHE_WINDOW = 1_000_000      # rolling re-check period while kept
_CACHE_RETRY = 5_000_000       # off-state gets before re-probation
_CACHE_MIN_HITRATE = 0.35      # below this the md5 path is faster
# ngram → [cache dict, state (1 probe / 2 keep / -1 off), gets, hits]
_CACHES: dict[int, list] = {}


def _shingles(text: str, n: int = 3) -> set[int]:
    words = text.split()
    if len(words) < n:
        grams = [" ".join(words)]
    else:
        grams = [" ".join(words[i:i + n])
                 for i in range(len(words) - n + 1)]
    st = _CACHES.get(n)
    if st is None:
        st = [{}, 1 if _SHINGLE_CACHE_MAX > 0 else -1, 0, 0]
        _CACHES[n] = st
    if st[1] < 0:
        st[2] += len(grams)
        if st[2] >= _CACHE_RETRY:  # workload may have changed: re-probe
            st[0], st[1], st[2], st[3] = {}, 1, 0, 0
        return {_h64(g) for g in grams}
    cache = st[0]
    out = set()
    st[2] += len(grams)
    for g in grams:
        v = cache.get(g)
        if v is None:
            v = _h64(g)
            if len(cache) < _SHINGLE_CACHE_MAX:
                cache[g] = v
        else:
            st[3] += 1
        out.add(v)
    window = _CACHE_PROBATION if st[1] == 1 else _CACHE_WINDOW
    if st[2] >= window:
        if st[3] >= st[2] * _CACHE_MIN_HITRATE:
            st[1] = 2
        else:
            st[1] = -1
            st[0] = {}  # free the memory too
        st[2] = st[3] = 0
    return out


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


# ----------------------------------------------------------- minhash
def _perm_params(num_perm: int, seed: int = 7):
    rs = np.random.RandomState(seed)
    a = rs.randint(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rs.randint(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def minhash_signature(sh: set[int], a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if not sh:
        return np.zeros(len(a), dtype=np.uint64)
    s = np.fromiter(sh, dtype=np.uint64)
    # per-permutation CONTIGUOUS ops (a broadcast (k,1)×(1,m) matrix
    # measured 30-40× slower per element than the 1-D loop form)
    out = np.empty(len(a), dtype=np.uint64)
    row = np.empty_like(s)
    m = np.uint64(_MERSENNE)
    for i in range(len(a)):
        np.multiply(s, a[i], out=row)
        np.add(row, b[i], out=row)
        np.mod(row, m, out=row)
        out[i] = row.min()
    return out


class _MinhashBands:
    """Actor-pool stage: doc → (band, band_hash, key) rows.

    Signatures for the whole batch are computed in ONE matrix op:
    all docs' shingle hashes are concatenated, the (num_perm × total)
    permuted-hash matrix is built once, and per-doc minima fall out of
    ``np.minimum.reduceat`` over the doc boundaries — no per-shingle
    Python beyond the shingling itself.
    """

    def __init__(self, key: str, text_col: str, num_perm: int, bands: int,
                 shingle_n: int):
        self.key = key
        self.text_col = text_col
        self.a, self.b = _perm_params(num_perm)
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.shingle_n = shingle_n

    def _signatures(self, texts: list[str]) -> np.ndarray:
        """(n_docs, num_perm) uint64 signature matrix.

        One CONTIGUOUS pass per permutation over the batch's
        concatenated shingle stream (mul+add+mod with ``out=`` reuse,
        then ``minimum.reduceat`` over the doc boundaries). The former
        (num_perm × total) broadcast matrix computed identical values
        but numpy's stride-0 broadcast loop measured 30-40× slower per
        element than these 1-D kernels — it was the whole MinHash
        stage's hotspot — and its memory forced chunking; the row form
        needs only 2× the shingle stream."""
        sets = [_shingles(t, self.shingle_n) for t in texts]
        counts = np.array([len(s) for s in sets], dtype=np.int64)
        n = len(sets)
        k = len(self.a)
        sigs = np.zeros((n, k), dtype=np.uint64)
        sub = [np.fromiter(s, dtype=np.uint64, count=len(s))
               for s in sets if len(s)]
        if not sub:
            return sigs
        concat = np.concatenate(sub)
        nz = counts[counts > 0]
        bounds = np.concatenate(([0], np.cumsum(nz)[:-1]))
        mins = np.empty((k, len(nz)), dtype=np.uint64)
        row = np.empty_like(concat)
        m = np.uint64(_MERSENNE)
        for i in range(k):
            np.multiply(concat, self.a[i], out=row)
            np.add(row, self.b[i], out=row)
            np.mod(row, m, out=row)
            mins[i] = np.minimum.reduceat(row, bounds)
        sigs[counts > 0] = mins.T
        return sigs

    # FNV-style multiplier for the vectorized band-slice hash; any
    # deterministic 64-bit mix works — band hashes are BUCKET ids only
    # (the oracle compares raw signature slices; a collision just adds
    # a candidate that exact verification prunes).
    _BAND_MULT = np.uint64(1099511628211)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        texts = df[self.text_col].astype(str).tolist()
        keys = df[self.key].to_numpy()
        sigs = self._signatures(texts)
        r, nb = self.rows_per_band, self.bands
        n = len(texts)
        # polynomial hash over each band's r signature values, all
        # rows × bands at once (uint64 wraparound): h = ((v0*C+v1)*C..)
        sl = sigs.reshape(n, nb, r)
        h = np.zeros((n, nb), dtype=np.uint64)
        for j in range(r):
            h = h * self._BAND_MULT + sl[:, :, j]
        return pd.DataFrame({
            "band": np.tile(np.arange(nb, dtype=np.int64), n),
            "bh": h.view(np.int64).reshape(-1),
            self.key: np.repeat(keys, nb),
        })


def _bucket_pairs(ds_banded, key: str, max_bucket: int = 64,
                  partitions: int = 64):
    """(band, bh) buckets → unordered candidate key pairs (deduped).

    Buckets are hashed into ``partitions`` coarse groups so the
    shuffle produces FEW large groups (a map_groups per million tiny
    buckets is pathological); pairing then runs per bucket inside
    each partition with a hot-bucket cap (LSH skew guard — identical
    texts should be exact-deduped BEFORE minhash, see
    minhash_dup_pairs docstring).
    """
    def add_hb(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["hb"] = ((df["band"].astype("int64") * 1000003
                     + df["bh"].astype("int64")) % partitions)
        return df

    def pairs_of_partition(g: pd.DataFrame) -> pd.DataFrame:
        # sort by exact bucket identity (band, bh) with the key as the
        # in-bucket order, then run-detection: buckets become contiguous
        # row runs. Pairing is vectorized for the dominant size-2
        # buckets; only the rare size ≥ 3 buckets loop in Python (the
        # former per-bucket groupby iterated EVERY bucket — millions of
        # near-singletons — in Python).
        g = g.sort_values(["band", "bh", key], kind="mergesort")
        band = g["band"].to_numpy()
        bh = g["bh"].to_numpy()
        keys_ = g[key].to_numpy()
        n = len(g)
        if n == 0:
            return pd.DataFrame({"key_a": [], "key_b": []})
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = (band[1:] != band[:-1]) | (bh[1:] != bh[:-1])
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], n)
        sizes = ends - starts
        s2 = starts[sizes == 2]
        rows_a = list(keys_[s2])
        rows_b = list(keys_[s2 + 1])
        for si in np.flatnonzero(sizes > 2):
            ks = keys_[starts[si]:ends[si]][:max_bucket]
            for a, b in itertools.combinations(ks.tolist(), 2):
                rows_a.append(a)
                rows_b.append(b)
        # local dedupe shrinks the exchange (same pair from several
        # buckets of one partition)
        return pd.DataFrame({"key_a": rows_a,
                             "key_b": rows_b}).drop_duplicates()

    from ..shuffle import hash_exchange_apply
    cand = hash_exchange_apply(
        ds_banded.map_batches(add_hb, batch_format="pandas"), "hb",
        pairs_of_partition, kernel_format="pandas")
    # global dedupe of pairs produced by multiple bands: coarse
    # partition by pair identity + in-task drop_duplicates. (A Ray
    # groupby(key_a,key_b).aggregate here measured ~2 s of fixed cost
    # PER PARTITION on a 20k-row pair set — the sort-aggregate path is
    # built for big data, not tiny exchanges.)
    from ..shuffle import coarse_partition_apply
    return coarse_partition_apply(
        cand, ["key_a", "key_b"],
        lambda g: g.drop_duplicates(["key_a", "key_b"]))


def _join_verify(ds, cand_ds, key: str, text_col: str, shingle_n: int,
                 round_to: int) -> pd.DataFrame:
    """Exact-Jaccard verification as a partitioned exchange — no
    broadcast key set, no assumption that candidates ≪ corpus.

    Two groupby shuffles: (1) by doc key, attaching each candidate
    endpoint to its text (the corpus text column moves ONCE); (2) by
    pair id, scoring the two endpoint texts. The driver only ever sees
    the scored pair list.
    """
    from ..shuffle import coarse_partition_apply

    def ends(df: pd.DataFrame) -> pd.DataFrame:
        pid = df["key_a"].astype(str) + "\x1f" + df["key_b"].astype(str)
        return pd.DataFrame({
            key: pd.concat([df["key_a"], df["key_b"]], ignore_index=True),
            "pid": pd.concat([pid, pid], ignore_index=True),
            text_col: [None] * (2 * len(df)),
        })

    def corpus_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({key: df[key], "pid": [None] * len(df),
                             text_col: df[text_col].astype(str)})

    both = (cand_ds.map_batches(ends, batch_format="pandas")
            .union(ds.map_batches(corpus_rows, batch_format="pandas")))

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized hash join inside the coarse partition: endpoint
        # rows pick up their doc's text
        txt = g.loc[g["pid"].isna(), [key, text_col]]
        e = g.loc[g["pid"].notna(), [key, "pid"]]
        return e.merge(txt, on=key, how="inner")

    def score_partition(g: pd.DataFrame) -> pd.DataFrame:
        # both endpoints of a pair are co-located; the per-pair shingle
        # comparison IS the verification compute (not dispatch overhead)
        rows_a, rows_b, rows_i, rows_u = [], [], [], []
        g = g.sort_values("pid", kind="mergesort")
        pids = g["pid"].to_numpy()
        keys_ = g[key].to_numpy()
        texts_ = g[text_col].to_numpy()
        i, n = 0, len(g)
        while i + 1 < n:
            if pids[i] != pids[i + 1]:
                i += 1
                continue
            sh_a = _shingles(str(texts_[i]), shingle_n)
            sh_b = _shingles(str(texts_[i + 1]), shingle_n)
            ka, kb = sorted((keys_[i], keys_[i + 1]))
            rows_a.append(ka)
            rows_b.append(kb)
            inter = len(sh_a & sh_b)
            rows_i.append(inter)
            rows_u.append(len(sh_a) + len(sh_b) - inter)
            i += 2
        uni = np.asarray(rows_u, dtype=np.int64)
        inter_a = np.asarray(rows_i, dtype=np.int64)
        jac = np.round(np.where(uni > 0, inter_a / np.maximum(uni, 1), 1.0),
                       round_to)
        return pd.DataFrame({"key_a": rows_a, "key_b": rows_b,
                             "inter": inter_a, "uni": uni,
                             "jaccard": jac})

    attached = coarse_partition_apply(both, key, attach)
    return coarse_partition_apply(attached, "pid",
                                  score_partition).to_pandas()


# Auto verify-path switch: above this many candidate pairs the
# broadcast key-set/texts materialization stops being "small" and the
# partitioned join exchange takes over. At 100 TB users run the
# defaults, so the default must be the path that cannot OOM the driver.
_VERIFY_JOIN_THRESHOLD = 200_000


def _shingle_arrays(ds, cand: pd.DataFrame, key, text_col,
                    shingle_n) -> dict:
    """Broadcast-verify helper: key → SORTED uint64 shingle array for
    every candidate endpoint. Shingling (the md5-per-gram cost) runs
    worker-side in ``map_batches``; the driver only receives the
    candidate docs' hash arrays — it never md5s anything itself (the
    former driver-side dict build measured 5 s serial at 86k docs)."""
    need = set(cand["key_a"]) | set(cand["key_b"])

    def sh_rows(df: pd.DataFrame) -> pd.DataFrame:
        sub = df[df[key].isin(need)]
        return pd.DataFrame({
            key: sub[key],
            "sh": [np.fromiter(s, dtype=np.uint64, count=len(s))
                   for s in (_shingles(str(t), shingle_n)
                             for t in sub[text_col])],
        })

    out = ds.map_batches(sh_rows, batch_format="pandas").to_pandas()
    return {k: np.sort(np.asarray(a, dtype=np.uint64))
            for k, a in zip(out[key], out["sh"])}


def _pair_inter_uni(sh: dict, cand: pd.DataFrame):
    """(inter, uni) int64 arrays for each candidate pair from the
    sorted shingle arrays (``intersect1d(assume_unique)`` — shingle
    sets are sets by construction)."""
    inter = np.empty(len(cand), dtype=np.int64)
    uni = np.empty(len(cand), dtype=np.int64)
    for i, (a, b) in enumerate(zip(cand["key_a"], cand["key_b"])):
        sa, sb = sh[a], sh[b]
        ni = len(np.intersect1d(sa, sb, assume_unique=True))
        inter[i] = ni
        uni[i] = len(sa) + len(sb) - ni
    return inter, uni


# Worker-process-level stage cache: map_batches TASKS reuse worker
# processes, so one _MinhashBands per (params) persists per worker
# WITHOUT an actor pool. (The autoscaling pool started at 1 actor and
# never ramped for short jobs — the same flat-scaling pathology the
# simhash stage hit; plain tasks use every core immediately.)
_BANDS_CACHE: dict[tuple, "_MinhashBands"] = {}


def _banded_candidates(ds, key, text_col, num_perm, bands, shingle_n):
    """shingle → minhash → band → bucket-join candidate pair Dataset,
    MATERIALIZED (it is the small LSH output; materializing lets the
    auto verify switch count it without re-executing the pipeline)."""
    params = (key, text_col, num_perm, bands, shingle_n)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        st = _BANDS_CACHE.get(params)
        if st is None:
            st = _BANDS_CACHE[params] = _MinhashBands(
                key=key, text_col=text_col, num_perm=num_perm,
                bands=bands, shingle_n=shingle_n)
        return st(df)

    banded = ds.map_batches(fn, batch_format="pandas")
    return _bucket_pairs(banded, key).materialize()


def minhash_dup_pairs(ds, key: str = "doc_id", text_col: str = "text",
                      num_perm: int = 64, bands: int = 16,
                      shingle_n: int = 3, threshold: float = 0.7,
                      round_to: int = 6,
                      verify: str = "auto") -> pd.DataFrame:
    """MinHash-LSH near-dup pairs, exact-Jaccard verified.

    Returns a small pandas frame (key_a, key_b, jaccard) sorted.
    ``verify``:
    - "broadcast": fetch only texts of candidate keys (semi-join by
      broadcast key set) — fastest when candidates ≪ corpus;
    - "join": run the verification as a partitioned two-shuffle
      exchange (see ``_join_verify``) — no smallness assumption, the
      100 TB path for dirty corpora;
    - "auto" (DEFAULT): count the materialized candidate Dataset and
      pick — broadcast below ``_VERIFY_JOIN_THRESHOLD`` pairs, join
      above. The candidate count is exactly the data the driver would
      otherwise materialize, so the switch is measured, not guessed.

    Run ``exact_dedup`` FIRST on corpora with many byte-identical
    texts: every bucket of m identical docs otherwise yields m²/2
    candidate pairs (the hot-bucket cap truncates, but dropping exact
    dups up front is both faster and lossless).
    """
    cand_ds = _banded_candidates(ds, key, text_col, num_perm, bands,
                                 shingle_n)
    if verify == "auto":
        verify = ("join" if cand_ds.count() > _VERIFY_JOIN_THRESHOLD
                  else "broadcast")
    if verify == "join":
        cand = _join_verify(ds, cand_ds, key, text_col, shingle_n, round_to)
        if len(cand) == 0:
            return pd.DataFrame({"key_a": [], "key_b": [], "jaccard": []})
        out = cand.loc[cand["jaccard"] >= threshold,
                       ["key_a", "key_b", "jaccard"]]
        return out.sort_values(["key_a", "key_b"]).reset_index(drop=True)

    cand = cand_ds.to_pandas()
    if len(cand) == 0:
        return pd.DataFrame({"key_a": [], "key_b": [], "jaccard": []})

    sh = _shingle_arrays(ds, cand, key, text_col, shingle_n)
    inter, uni = _pair_inter_uni(sh, cand)
    cand["jaccard"] = np.round(
        np.where(uni > 0, inter / np.maximum(uni, 1), 1.0), round_to)
    out = cand[cand["jaccard"] >= threshold][["key_a", "key_b", "jaccard"]]
    return out.sort_values(["key_a", "key_b"]).reset_index(drop=True)


def minhash_dup_pair_counts(ds, key: str = "doc_id", text_col: str = "text",
                            num_perm: int = 64, bands: int = 16,
                            shingle_n: int = 3,
                            threshold=(7, 10),
                            verify: str = "auto") -> pd.DataFrame:
    """Like ``minhash_dup_pairs`` but fully exact-integer output:
    (key_a, key_b, inter, uni) shingle-set intersection/union sizes,
    kept when ``inter * threshold[1] >= uni * threshold[0]`` — integer
    arithmetic on both engine and oracle side, so there is no float
    rounding asymmetry to reconcile.

    ``verify`` shares ``minhash_dup_pairs``' switch: "auto" (default)
    measures the candidate count and uses the partitioned join
    exchange above ``_VERIFY_JOIN_THRESHOLD`` — the driver never holds
    the candidate frame on that path."""
    cand_ds = _banded_candidates(ds, key, text_col, num_perm, bands,
                                 shingle_n)
    lo, hi = threshold
    empty = pd.DataFrame({"key_a": pd.array([], dtype=object),
                          "key_b": pd.array([], dtype=object),
                          "inter": pd.array([], dtype="int64"),
                          "uni": pd.array([], dtype="int64")})
    if verify == "auto":
        verify = ("join" if cand_ds.count() > _VERIFY_JOIN_THRESHOLD
                  else "broadcast")
    if verify == "join":
        cand = _join_verify(ds, cand_ds, key, text_col, shingle_n, 6)
        if len(cand) == 0:
            return empty
        out = cand.loc[cand["inter"] * hi >= cand["uni"] * lo,
                       ["key_a", "key_b", "inter", "uni"]]
        return out.sort_values(["key_a", "key_b"]).reset_index(drop=True)

    cand = cand_ds.to_pandas()
    if len(cand) == 0:
        return empty
    sh = _shingle_arrays(ds, cand, key, text_col, shingle_n)
    inter, uni = _pair_inter_uni(sh, cand)
    cand["inter"] = inter
    cand["uni"] = uni
    out = cand[cand["inter"] * hi >= cand["uni"] * lo]
    out = out[["key_a", "key_b", "inter", "uni"]]
    return out.sort_values(["key_a", "key_b"]).reset_index(drop=True)


def ngram_jaccard_pairs(ds, key: str = "doc_id", text_col: str = "text",
                        shingle_n: int = 3, threshold: float = 0.7,
                        limit: int = 20000) -> pd.DataFrame:
    """Exact all-pairs n-gram Jaccard (small inputs only — guarded)."""
    df = ds.select_columns([key, text_col]).to_pandas()
    if len(df) > limit:
        raise ValueError(f"all-pairs Jaccard guarded to ≤{limit} docs; "
                         "use minhash_dup_pairs at scale")
    keys = df[key].tolist()
    shs = [_shingles(str(t), shingle_n) for t in df[text_col]]
    rows = []
    for i in range(len(keys)):
        for j in range(i + 1, len(keys)):
            v = jaccard(shs[i], shs[j])
            if v >= threshold:
                a, b = sorted((keys[i], keys[j]))
                rows.append((a, b, round(v, 6)))
    out = pd.DataFrame(rows, columns=["key_a", "key_b", "jaccard"])
    return out.sort_values(["key_a", "key_b"]).reset_index(drop=True)


# ----------------------------------------------------------- simhash
_SHIFTS64 = np.arange(64, dtype=np.uint64)


def _word_signvec(w: str) -> np.ndarray:
    """±1 bit-sign vector of one word's 64-bit md5 prefix."""
    h = np.uint64(int.from_bytes(hashlib.md5(w.encode("utf-8")).digest()[:8],
                                 "little"))
    bits = (h >> _SHIFTS64) & np.uint64(1)
    return np.where(bits == 1, 1, -1).astype(np.int32)


def simhash64(text: str) -> int:
    """Reference definition (kept for tests; the batch path below is
    identical but caches per-word vectors across rows)."""
    words = text.split()
    if not words:
        return 0
    acc = np.sum([_word_signvec(w) for w in words], axis=0)
    return int(((acc > 0).astype(np.uint64) << _SHIFTS64).sum())


class _SimhashBatch:
    """Actor-pool stage: text → simhash64, fully vectorized.

    The batch's exploded token stream is factorized once
    (``pd.factorize``); each DISTINCT word is md5-hashed once per actor
    (uint64 cache — the vocabulary is ≪ the token stream), the
    (vocab × 64) ±1 matrix is built in one numpy op, and every row's
    64-lane accumulator falls out of a single ``np.add.reduceat`` over
    the doc boundaries — no per-row or per-word Python in the hot loop.
    """

    _CHUNK_TOKENS = 1_000_000  # bounds the (tokens × 64) int8 gather

    def __init__(self, key: str, text_col: str):
        self.key = key
        self.text_col = text_col
        self.cache: dict[str, int] = {}  # word → uint64 md5 prefix

    def _sig_block(self, toks: list[list[str]],
                   counts: np.ndarray) -> np.ndarray:
        """Signatures for docs whose token lists are in ``toks``
        (all non-empty). Returns (len(toks),) uint64."""
        flat = np.asarray(list(itertools.chain.from_iterable(toks)),
                          dtype=object)
        codes, uniques = pd.factorize(flat, sort=False)
        hs = np.empty(len(uniques), dtype=np.uint64)
        cache = self.cache
        for i, w in enumerate(uniques):
            v = cache.get(w)
            if v is None:
                v = int.from_bytes(
                    hashlib.md5(w.encode("utf-8")).digest()[:8], "little")
                if len(cache) < _SIMHASH_CACHE_MAX:  # bound worker memory
                    cache[w] = v
            hs[i] = v
        # little-endian byte view + unpackbits == (h >> i) & 1 for
        # i = 0..63 — measured ~380× faster than the (vocab × 64)
        # broadcast shift (numpy's stride-0 broadcast loop pathology)
        bits = np.unpackbits(hs.view(np.uint8).reshape(-1, 8), axis=1,
                             bitorder="little")
        pm = (bits.astype(np.int8) * 2 - 1)                 # (vocab, 64)
        tokmat = pm[codes]                                  # (tokens, 64)
        bounds = np.concatenate(([0], np.cumsum(counts)[:-1]))
        acc = np.add.reduceat(tokmat, bounds, axis=0, dtype=np.int32)
        return np.packbits((acc > 0).astype(np.uint8), axis=1,
                           bitorder="little").view(np.uint64).reshape(-1)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        toks = [t.split() for t in df[self.text_col].astype(str)]
        counts = np.array([len(w) for w in toks], dtype=np.int64)
        out = np.zeros(len(df), dtype=np.uint64)
        idx = np.nonzero(counts > 0)[0]
        lo = 0
        while lo < len(idx):  # chunk so the gather matrix stays bounded
            hi, total = lo, 0
            while hi < len(idx) and (hi == lo or total + counts[idx[hi]]
                                     <= self._CHUNK_TOKENS):
                total += counts[idx[hi]]
                hi += 1
            sel = idx[lo:hi]
            out[sel] = self._sig_block([toks[i] for i in sel],
                                       counts[sel])
            lo = hi
        return pd.DataFrame({self.key: df[self.key],
                             "simhash": out.astype("int64")})


# Worker-process-level word-hash cache: map_batches TASKS reuse worker
# processes, so the cache persists across tasks WITHOUT an actor pool.
# (An autoscaling actor pool starts at 1 actor and never ramps for
# short jobs — measured flat 4→16 CPU scaling; plain tasks use every
# core immediately.) Bounded so a 100 TB vocabulary can't OOM a worker.
_SIMHASH_CACHE: dict[str, int] = {}
_SIMHASH_CACHE_MAX = 2_000_000


def _simhash_arrow_batch(tbl: pa.Table, key: str, text_col: str,
                         cache: dict) -> pa.Table:
    """Arrow-native simhash kernel: tokenize + factorize happen in
    Arrow C kernels (``utf8_split_whitespace`` → ``list_flatten`` →
    ``dictionary_encode``) so the batch's text is NEVER materialized
    as Python strings (only the distinct vocabulary is, for the md5
    cache). Bit math identical to ``_SimhashBatch`` (equality
    pytest-enforced); measured ~25% faster per warm batch and, more
    importantly at full socket, skips the whole pandas conversion of
    the text column — fewer bytes through the allocator is what the
    4→16 CPU bandwidth ceiling responds to."""
    import pyarrow.compute as pc

    # match the pandas kernel's astype(str): null → the string "None"
    col = pc.fill_null(tbl.column(text_col), "None")
    toks = pc.utf8_split_whitespace(col)
    flat = pc.list_flatten(toks).combine_chunks()
    counts = pc.list_value_length(toks).to_numpy(
        zero_copy_only=False).astype(np.int64)
    d = pc.dictionary_encode(flat)
    codes = d.indices.to_numpy(zero_copy_only=False)
    uniques = d.dictionary.to_pylist()
    hs = np.empty(len(uniques), dtype=np.uint64)
    empty_code = -1
    for i, w in enumerate(uniques):
        if w == "":        # split_whitespace emits "" for blank text
            empty_code = i
        v = cache.get(w)
        if v is None:
            v = int.from_bytes(
                hashlib.md5(w.encode("utf-8")).digest()[:8], "little")
            if len(cache) < _SIMHASH_CACHE_MAX:
                cache[w] = v
        hs[i] = v
    if empty_code >= 0:    # drop empty tokens (str.split semantics)
        keep = codes != empty_code
        drops = ~keep
        # subtract per-doc dropped-token counts from the list lengths
        doc_of = np.repeat(np.arange(len(counts)), counts)
        counts = counts - np.bincount(doc_of[drops],
                                      minlength=len(counts))
        codes = codes[keep]
    nz = counts > 0
    out = np.zeros(len(counts), dtype=np.uint64)
    if nz.any():
        bits = np.unpackbits(hs.view(np.uint8).reshape(-1, 8), axis=1,
                             bitorder="little")
        pm = (bits.astype(np.int8) * 2 - 1)
        bounds = (np.cumsum(counts) - counts)[nz]
        lo = 0
        chunk = _SimhashBatch._CHUNK_TOKENS
        accs = []
        nz_bounds = np.append(bounds, len(codes))
        while lo < len(bounds):  # bound the (tokens × 64) gather
            hi = lo + 1
            while (hi < len(bounds)
                   and nz_bounds[hi + 1] - nz_bounds[lo] <= chunk):
                hi += 1
            tokmat = pm[codes[nz_bounds[lo]:nz_bounds[hi]]]
            accs.append(np.add.reduceat(
                tokmat, bounds[lo:hi] - nz_bounds[lo], axis=0,
                dtype=np.int32))
            lo = hi
        acc = np.concatenate(accs) if len(accs) > 1 else accs[0]
        out[nz] = np.packbits((acc > 0).astype(np.uint8), axis=1,
                              bitorder="little").view(np.uint64).reshape(-1)
    return pa.table({key: tbl.column(key),
                     "simhash": pa.array(out.astype(np.int64),
                                         type=pa.int64())})


def simhash_ds(ds, key: str = "doc_id", text_col: str = "text"):
    def fn(tbl: pa.Table) -> pa.Table:
        return _simhash_arrow_batch(tbl, key, text_col, _SIMHASH_CACHE)

    return ds.map_batches(fn, batch_format="pyarrow")


def simhash_dup_pairs(ds, key: str = "doc_id", text_col: str = "text",
                      max_hamming: int = 3, partitions: int = 64,
                      max_bucket: int = 4096) -> pd.DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming.

    Blocking: split 64 bits into (max_hamming+1) bands — any pair
    within the radius shares at least one exact band (pigeonhole).
    Buckets are hashed into ``partitions`` coarse groups (same shape
    as ``_bucket_pairs``) so the shuffle produces FEW large groups
    instead of millions of near-singleton ``(band, bv)`` buckets.
    """
    nb = max_hamming + 1
    width = 64 // nb

    def band_rows(df: pd.DataFrame) -> pd.DataFrame:
        s = df["simhash"].to_numpy().astype(np.uint64)
        k = df[key].to_numpy()
        n = len(df)
        bands = np.repeat(np.arange(nb, dtype=np.int64), n)
        keys_r = np.tile(k, nb)
        sims_r = np.tile(s, nb)
        bv = np.concatenate([
            ((s >> np.uint64(bi * width)) & np.uint64((1 << width) - 1))
            .astype(np.int64) for bi in range(nb)])
        hb = (bands * 1000003 + bv) % partitions
        return pd.DataFrame({"band": bands, "bv": bv, "hb": hb,
                             key: keys_r, "simhash": sims_r.astype("int64")})

    sh = simhash_ds(ds, key=key, text_col=text_col)
    banded = sh.map_batches(band_rows, batch_format="pandas")

    popcnt_lut = np.unpackbits(
        np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(axis=1)

    def _hamming(sa: np.ndarray, sb: np.ndarray) -> np.ndarray:
        x = np.bitwise_xor(sa, sb)
        return popcnt_lut[x.view(np.uint8).reshape(-1, 8)].sum(axis=1)

    def pairs_of_partition(g: pd.DataFrame) -> pd.DataFrame:
        # buckets become contiguous runs after the (band, bv, key)
        # sort; size-2 buckets (the common case) verify hamming in one
        # vectorized LUT-popcount pass, only ≥3-member buckets loop
        # (same run-detection shape as the MinHash `_bucket_pairs`)
        g = g.sort_values(["band", "bv", key], kind="mergesort")
        band = g["band"].to_numpy()
        bv = g["bv"].to_numpy()
        keys_ = g[key].to_numpy()
        sims = g["simhash"].to_numpy().astype(np.int64).view(np.uint64)
        n = len(g)
        if n == 0:
            return pd.DataFrame({"key_a": [], "key_b": [], "hamming": []})
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = (band[1:] != band[:-1]) | (bv[1:] != bv[:-1])
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], n)
        sizes = ends - starts
        s2 = starts[sizes == 2]
        ham2 = _hamming(sims[s2], sims[s2 + 1]) if len(s2) else \
            np.zeros(0, dtype=np.int64)
        ok = ham2 <= max_hamming
        rows_a = list(keys_[s2[ok]])
        rows_b = list(keys_[s2[ok] + 1])
        rows_h = [int(h) for h in ham2[ok]]
        for si in np.flatnonzero(sizes > 2):
            ks = keys_[starts[si]:ends[si]][:max_bucket]
            ss = sims[starts[si]:ends[si]][:max_bucket]
            for i, j in itertools.combinations(range(len(ks)), 2):
                ham = int(_hamming(ss[i:i + 1], ss[j:j + 1])[0])
                if ham <= max_hamming:
                    rows_a.append(ks[i])
                    rows_b.append(ks[j])
                    rows_h.append(ham)
        return pd.DataFrame({"key_a": rows_a, "key_b": rows_b,
                             "hamming": rows_h})

    from ..shuffle import hash_exchange_apply
    pairs = hash_exchange_apply(banded, "hb", pairs_of_partition,
                                kernel_format="pandas").to_pandas()
    if len(pairs) == 0:
        return pd.DataFrame({"key_a": [], "key_b": [], "hamming": []})
    pairs = pairs.drop_duplicates(["key_a", "key_b"])
    return pairs.sort_values(["key_a", "key_b"]).reset_index(drop=True)


# ------------------------------------------------- duplicate clusters
def dup_clusters_distributed(pairs, key_a: str = "key_a",
                             key_b: str = "key_b",
                             max_rounds: int = 12) -> pd.DataFrame:
    """Connected components over a near-dup pair **Dataset** via
    min-label propagation — no driver union-find, no full pair-set
    materialization until the final (node, cluster_id) result.

    Each round: (1) attach current node labels to edge endpoints via a
    groupby(node) exchange, (2) per edge take the min endpoint label
    and message it to both ends, (3) groupby(node).min picks each
    node's new label. Labels only decrease, so a stable checksum across
    rounds proves convergence; rounds needed = O(component diameter)
    (near-dup components are shallow in practice). Three shuffles per
    round, each moving one row per edge-end — never the corpus.
    """
    import ray.data as rd
    from ray.data.aggregate import Min

    if isinstance(pairs, pd.DataFrame):
        pairs = rd.from_pandas(
            pairs[[key_a, key_b]].rename(
                columns={key_a: "a", key_b: "b"}))
    else:
        pairs = pairs.map_batches(
            lambda df: df[[key_a, key_b]].rename(
                columns={key_a: "a", key_b: "b"}),
            batch_format="pandas")
    pairs = pairs.map_batches(
        lambda df: df.assign(eid=df["a"].astype(str) + "\x1f"
                             + df["b"].astype(str)),
        batch_format="pandas")

    def init_labels(df: pd.DataFrame) -> pd.DataFrame:
        nodes = pd.concat([df["a"], df["b"]]).unique()
        return pd.DataFrame({"node": nodes, "label": nodes})

    labels = (pairs.map_batches(init_labels, batch_format="pandas")
              .groupby("node").aggregate(Min("label", alias_name="label")))

    def checksum(lbl_ds) -> int:
        def part(df: pd.DataFrame) -> pd.DataFrame:
            import zlib as _z
            s = sum(_z.crc32(f"{n}\x00{v}".encode())
                    for n, v in zip(df["node"], df["label"]))
            return pd.DataFrame({"c": [s]})
        parts = lbl_ds.map_batches(part, batch_format="pandas").to_pandas()
        return int(parts["c"].sum())

    from ..shuffle import coarse_partition_apply

    prev = checksum(labels)
    for _ in range(max_rounds):
        ends = pairs.map_batches(
            lambda df: pd.DataFrame({
                "node": pd.concat([df["a"], df["b"]], ignore_index=True),
                "eid": pd.concat([df["eid"], df["eid"]], ignore_index=True),
                "label": [None] * (2 * len(df)),
            }), batch_format="pandas")
        lab_rows = labels.map_batches(
            lambda df: df.assign(eid=None), batch_format="pandas")

        def attach(g: pd.DataFrame) -> pd.DataFrame:
            # vectorized within the coarse partition: endpoint rows
            # pick up their node's current label via a pandas merge
            lab = g.loc[g["eid"].isna(), ["node", "label"]]
            e = g.loc[g["eid"].notna(), ["node", "eid"]]
            return e.merge(lab, on="node", how="inner")

        end_labels = coarse_partition_apply(ends.union(lab_rows),
                                            "node", attach)

        def edge_min(g: pd.DataFrame) -> pd.DataFrame:
            m = g.groupby("eid", sort=False)["label"].transform("min")
            return pd.DataFrame({"node": g["node"], "label": m})

        msgs = coarse_partition_apply(end_labels, "eid", edge_min)
        labels = (msgs.union(labels.select_columns(["node", "label"]))
                  .groupby("node")
                  .aggregate(Min("label", alias_name="label")))
        labels = labels.materialize()
        cur = checksum(labels)
        if cur == prev:  # labels are monotone → stable checksum = done
            break
        prev = cur
    out = labels.to_pandas().rename(columns={"node": "key",
                                             "label": "cluster_id"})
    return out.sort_values("key").reset_index(drop=True)


def dup_clusters(pairs: pd.DataFrame, key_a: str = "key_a",
                 key_b: str = "key_b") -> pd.DataFrame:
    """Connected components over near-dup pairs → (key, cluster_id).

    cluster_id = min key in the component. The pair set is the OUTPUT
    of an LSH stage and is assumed ≪ corpus (driver union-find); for
    pair sets too large for one node, run min-label propagation as a
    few rounds of groupby instead (see NOTES_r1).
    """
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(pairs[key_a], pairs[key_b]):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra <= rb else (rb, ra)
            parent[hi] = lo
    keys = sorted(set(pairs[key_a]) | set(pairs[key_b]))
    return pd.DataFrame({"key": keys,
                         "cluster_id": [find(k) for k in keys]})


# Above this many near-dup pairs the driver union-find gives way to
# the min-label-propagation exchange (``dup_clusters_distributed``).
_CLUSTER_DISTRIBUTED_THRESHOLD = 500_000


def dedup_keep_list(ds, pairs, key: str = "doc_id"):
    """Keys to KEEP after near-dup removal: every key not in a cluster,
    plus each cluster's representative (min key). Returns a sorted
    pandas frame [key]. The non-pair side streams (anti-join by
    broadcast drop-set; the drop-set is bounded by the pair count).

    ``pairs`` may be a pandas frame or a Dataset. Clustering runs
    driver-side (union-find) below ``_CLUSTER_DISTRIBUTED_THRESHOLD``
    pairs and switches to ``dup_clusters_distributed`` (min-label
    propagation via groupby exchanges) above it — the DEFAULT path is
    scale-safe without the caller opting in.
    """
    if not isinstance(pairs, pd.DataFrame):
        n_pairs = pairs.count()
        if n_pairs > _CLUSTER_DISTRIBUTED_THRESHOLD:
            clusters = dup_clusters_distributed(pairs)
        else:
            clusters = dup_clusters(pairs.to_pandas()) if n_pairs else \
                pd.DataFrame({"key": [], "cluster_id": []})
    elif len(pairs) > _CLUSTER_DISTRIBUTED_THRESHOLD:
        clusters = dup_clusters_distributed(pairs)
    else:
        clusters = dup_clusters(pairs)
    drop = set(clusters.loc[clusters["key"] != clusters["cluster_id"], "key"])

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        return df[~df[key].isin(drop)][[key]]

    out = ds.map_batches(keep, batch_format="pandas").to_pandas()
    return out.sort_values(key).reset_index(drop=True)


# --------------------------------------------------------- embeddings
def _lsh_bucket_batch(df: pd.DataFrame, key: str, col: str,
                      n_planes: int, seed: int,
                      partitions: int) -> pd.DataFrame:
    """Per-batch: normalize vectors, random-hyperplane bucket id.

    The plane matrix is regenerated deterministically from ``seed`` in
    every task (dim×n_planes floats — cheaper to recompute than to
    broadcast). Output carries the normalized vector so same-bucket
    scoring happens AFTER the shuffle, on the workers — the corpus
    never touches the driver.
    """
    mat = np.stack(df[col].to_numpy()).astype(np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    planes = np.random.RandomState(seed).randn(mat.shape[1], n_planes)
    sig = (mat @ planes > 0).astype(np.uint64)
    bucket = (sig << np.arange(n_planes, dtype=np.uint64)).sum(axis=1) \
        .astype(np.int64)
    return pd.DataFrame({
        "bucket": bucket,
        "hb": bucket % partitions,
        key: df[key],
        "_nvec": list(mat.astype(np.float32)),
    })


def _lsh_pairs_of_partition(g: pd.DataFrame, key: str, threshold: float,
                            max_bucket: int) -> pd.DataFrame:
    """Score same-bucket pairs inside one coarse partition (worker-side).

    Run-detection kernel (same shape as ``_bucket_pairs`` / simhash
    ``pairs_of_partition``): sort by (bucket, key) so buckets become
    contiguous row runs, score the dominant size-2 buckets in ONE
    vectorized row-wise dot product, and only loop over the rare
    size ≥ 3 buckets (one small matmul each). The former version
    iterated EVERY bucket — mostly near-singletons — through a pandas
    groupby in Python.
    """
    g = g.sort_values(["bucket", key], kind="mergesort")
    bucket = g["bucket"].to_numpy()
    keys_ = g[key].to_numpy()
    n = len(g)
    if n == 0:
        return pd.DataFrame({"key_a": [], "key_b": [], "cosine": []})
    vecs = np.stack(g["_nvec"].to_numpy()).astype(np.float64)
    new = np.empty(n, dtype=bool)
    new[0] = True
    new[1:] = bucket[1:] != bucket[:-1]
    starts = np.flatnonzero(new)
    ends = np.append(starts[1:], n)
    sizes = ends - starts
    s2 = starts[sizes == 2]
    if len(s2):
        cos2 = np.einsum("ij,ij->i", vecs[s2], vecs[s2 + 1])
        ok = cos2 >= threshold
        rows_a = list(keys_[s2[ok]])
        rows_b = list(keys_[s2[ok] + 1])
        rows_c = [round(float(c), 6) for c in cos2[ok]]
    else:
        rows_a, rows_b, rows_c = [], [], []
    for si in np.flatnonzero(sizes > 2):
        # keys are already sorted inside the run, so the cap keeps the
        # deterministic (lowest-key) members — same rule as before
        ks = keys_[starts[si]:ends[si]][:max_bucket]
        sub = vecs[starts[si]:ends[si]][:max_bucket]
        cos = sub @ sub.T
        ii, jj = np.nonzero(np.triu(cos >= threshold, k=1))
        for i2, j2 in zip(ii, jj):
            rows_a.append(ks[i2])
            rows_b.append(ks[j2])
            rows_c.append(round(float(cos[i2, j2]), 6))
    return pd.DataFrame({"key_a": rows_a, "key_b": rows_b, "cosine": rows_c})


# Auto method switch: above this many corpus rows the exact path's
# driver-side matrix materialization stops being "small" and the fully
# distributed LSH exchange takes over. Same contract as the minhash
# ``verify="auto"`` switch (dedup.py:_VERIFY_JOIN_THRESHOLD): at 100 TB
# users run the defaults, so the default must be the path that cannot
# OOM the driver.
_EMB_EXACT_THRESHOLD = 200_000


def embedding_dup_pairs(ds, key: str = "vec_id", col: str = "embedding",
                        threshold: float = 0.95, method: str = "auto",
                        n_planes: int = 12, seed: int = 11,
                        partitions: int = 64,
                        max_bucket: int = 4096) -> pd.DataFrame:
    """Cosine near-dup pairs over an embedding column.

    method="lsh" (the arbitrarily-large-corpus path): random-hyperplane
    bucketing runs inside ``map_batches`` (deterministic planes per
    task), same-bucket scoring runs worker-side inside a
    coarse-partitioned ``groupby(bucket % partitions)`` — the driver
    only ever sees the (small) pair list. Approximate: only same-bucket
    pairs are scored; identical vectors always share a bucket.

    method="exact": every batch is scored against the full normalized
    matrix broadcast once via ray.put (exact, oracle-matchable; matrix
    must fit a worker — fine to ~1M×256d, use "lsh" beyond).

    method="auto" (DEFAULT): ``ds.count()`` (metadata-cheap on parquet)
    picks — exact below ``_EMB_EXACT_THRESHOLD`` rows, lsh above, so
    the default never materializes an unboundedly large matrix on the
    driver.
    """
    import ray

    if method == "auto":
        method = ("lsh" if ds.count() > _EMB_EXACT_THRESHOLD
                  else "exact")
    if method == "lsh":
        banded = ds.map_batches(
            lambda df: _lsh_bucket_batch(df, key=key, col=col,
                                         n_planes=n_planes, seed=seed,
                                         partitions=partitions),
            batch_format="pandas")
        from ..shuffle import hash_exchange_apply
        pairs = hash_exchange_apply(
            banded, "hb",
            lambda g: _lsh_pairs_of_partition(
                g, key=key, threshold=threshold, max_bucket=max_bucket),
            kernel_format="pandas").to_pandas()
        if len(pairs) == 0:
            return pd.DataFrame({"key_a": [], "key_b": [], "cosine": []})
        return (pairs.drop_duplicates(["key_a", "key_b"])
                     .sort_values(["key_a", "key_b"]).reset_index(drop=True))

    # exact: broadcast matrix once, blocked matmul per batch
    mat_df = ds.select_columns([key, col]).to_pandas()
    keys = mat_df[key].to_numpy()
    mat = np.stack(mat_df[col].to_numpy()).astype(np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    ref = ray.put((keys, mat))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        all_keys, all_mat = ray.get(ref)
        pos = {k: i for i, k in enumerate(all_keys)}
        sub = np.stack(df[col].to_numpy()).astype(np.float64)
        sub /= np.maximum(np.linalg.norm(sub, axis=1, keepdims=True), 1e-12)
        cos = sub @ all_mat.T
        rows_a, rows_b, rows_c = [], [], []
        for r, k in enumerate(df[key]):
            i = pos[k]
            js = np.nonzero(cos[r] >= threshold)[0]
            for j in js:
                if all_keys[j] > k:  # emit each unordered pair once
                    rows_a.append(k)
                    rows_b.append(all_keys[j])
                    rows_c.append(round(float(cos[r, j]), 6))
        return pd.DataFrame({"key_a": rows_a, "key_b": rows_b,
                             "cosine": rows_c})

    out = ds.map_batches(score, batch_format="pandas").to_pandas()
    if len(out) == 0:  # all-empty batches lose their column schema
        return pd.DataFrame({"key_a": [], "key_b": [], "cosine": []})
    return out.sort_values(["key_a", "key_b"]).reset_index(drop=True)
