"""Hashed-linear text classifier — the fasttext-style quality filter.

Model-based quality filtering (the CCNet / GPT-3-era pipeline stage)
scores each document with a linear model over hashed bag-of-words
features and keeps the high scorers. This implementation is the
deterministic, oracle-exact version of that shape:

- feature = md5-h64(token) % n_buckets (the dedup-family hash, so the
  DuckDB oracle reproduces bucketing bit-for-bit);
- score(d) = Σ over token OCCURRENCES of w[bucket] — tf-weighted,
  all int64 (weights are seed-derived integers, inlined into the
  oracle SQL as VALUES, exactly like the tensorflow MLP oracle);
- keep = score ≥ threshold.

Actor-pool shape: the weight table and a per-actor token→bucket cache
live in ``__init__`` (once per actor, the filter_tensorflow
interpreter-per-instance pattern, plugins/filter_tensorflow/
tensorflow.c:87-97); per batch the token stream is exploded and
factorized once, md5 runs per DISTINCT token, and per-row scores come
from one scatter-add — no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .dedup import _h64

N_BUCKETS = 256


def model_weights(seed: int = 7, n_buckets: int = N_BUCKETS) -> np.ndarray:
    """Seed-derived integer weights in [-1000, 1000]."""
    rs = np.random.RandomState(seed)
    return rs.randint(-1000, 1001, size=n_buckets).astype(np.int64)


class HashedLinearScorer:
    """map_batches callable class (actor pool): text → (score, keep)."""

    def __init__(self, seed: int = 7, n_buckets: int = N_BUCKETS,
                 threshold: int = 0, text_col: str = "text",
                 id_col: str = "doc_id"):
        self.w = model_weights(seed, n_buckets)
        self.n_buckets = n_buckets
        self.threshold = int(threshold)
        self.text_col = text_col
        self.id_col = id_col
        self._bucket_cache: dict[str, int] = {}

    def _bucket(self, tok: str) -> int:
        b = self._bucket_cache.get(tok)
        if b is None:
            b = _h64(tok) % self.n_buckets
            if len(self._bucket_cache) < 2_000_000:
                self._bucket_cache[tok] = b
        return b

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)  # positional rows for scatter-add
        n = len(df)
        scores = np.zeros(n, dtype=np.int64)
        toks = df[self.text_col].astype(str).str.split().explode().dropna()
        if len(toks):
            rows = toks.index.to_numpy()          # positional (RangeIndex)
            codes, uniques = pd.factorize(toks.to_numpy(dtype=object))
            buckets = np.fromiter((self._bucket(t) for t in uniques),
                                  dtype=np.int64, count=len(uniques))
            np.add.at(scores, rows, self.w[buckets[codes]])
        return pd.DataFrame({
            self.id_col: df[self.id_col].to_numpy(),
            "score": scores,
            "keep": scores >= self.threshold,
        })


# Worker-process-level scorer cache: map_batches TASKS reuse worker
# processes, so the model + token-bucket cache persist across tasks
# WITHOUT an actor pool. An autoscaling pool (the former
# concurrency=(1, 8)) starts at ONE actor and never ramps for
# short jobs — measured 4→16 CPUs at sf1: 14.7 s → 13.2 s (0.28
# efficiency, the pool was the serial bottleneck); plain tasks use
# every core immediately (same fix as dedup.simhash_ds).
_SCORER_CACHE: dict[tuple, HashedLinearScorer] = {}


def quality_model_scores(ds, seed: int = 7, n_buckets: int = N_BUCKETS,
                         threshold: int = 0, text_col: str = "text",
                         id_col: str = "doc_id", concurrency=None,
                         batch_size: int = 4096):
    """Score every document with the hashed-linear model (weights +
    token-bucket cache built once per WORKER PROCESS and reused across
    tasks). Returns Dataset[id_col, score, keep] — no shuffle
    anywhere. Pass ``concurrency=(lo, hi)`` to force the actor-pool
    form (the tensorflow-stage shape) when the model is too big to sit
    in every worker."""
    kw = dict(seed=seed, n_buckets=n_buckets, threshold=threshold,
              text_col=text_col, id_col=id_col)
    if concurrency is not None:
        return ds.map_batches(
            HashedLinearScorer, fn_constructor_kwargs=kw,
            batch_format="pandas", batch_size=batch_size,
            concurrency=concurrency)
    key = tuple(sorted(kw.items()))

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        st = _SCORER_CACHE.get(key)
        if st is None:
            st = HashedLinearScorer(**kw)
            _SCORER_CACHE[key] = st
        return st(df)

    return ds.map_batches(fn, batch_format="pandas",
                          batch_size=batch_size)
