"""Distributed k-means clustering over an embedding column.

The semantic-clustering step of a training-data pipeline (cluster-
balanced sampling, semantic dedup, topic bucketing), in the standard
distributed Lloyd shape:

- centroids are broadcast (``ray.put``) once per iteration;
- each batch computes its assignments vectorized (one matmul-shaped
  distance pass) and emits k×dim PARTIAL SUMS — the only thing that
  leaves a task is a (k, dim+1) integer matrix per batch;
- the driver reduces the tiny partials and re-derives centroids.

One iteration is one streaming pass over the corpus; nothing
all-to-all, nothing corpus-sized on the driver. At 100 TB the
per-batch partial is still (k, dim+1) — the reduce is O(k·dim·
#batches) on the driver, which a ``map_batches``+``groupby`` partial
tree would replace if k·dim grew large (documented bound, not the
default).

Exactness contract (what makes a full SQL oracle possible): vectors
are quantized to int64 (``floor(x·128 + 0.5)``, exact in numpy and
DuckDB), init centroids are the rows with the k smallest keys
(``vec_id < k`` for the contiguous-id corpus), centroid update is
element-wise FLOOR DIVISION of (sum, count) — integer end to end, so
assignments (argmin of integer squared L2, ties to the lowest cluster
id) are reproducible bit-for-bit in SQL long form. Reference for the
op family: filter_tensorflow's broadcast-model shape
(plugins/filter_tensorflow/tensorflow.c) applied to a trained-state
iteration loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def quantize_batch(df: pd.DataFrame, col: str = "embedding",
                   key: str = "vec_id", scale: float = 128.0) -> pd.DataFrame:
    """floor(x·scale + 0.5) int64 quantization (exact in SQL too)."""
    q = np.stack([np.floor(np.asarray(v, dtype=np.float64) * scale + 0.5)
                  for v in df[col]]).astype(np.int64)
    return pd.DataFrame({key: df[key], "q": list(q)})


def _assign(mat: np.ndarray, cent: np.ndarray):
    """Vectorized argmin of integer squared L2; ties -> lowest id.

    dist(x, c) = x·x - 2 x·c + c·c; the x·x term is constant per row
    so the argmin needs only the (n, k) cross-term pass. All int64
    (|q| ≤ 129·scale-ish keeps every term far from overflow)."""
    cross = mat @ cent.T                       # (n, k) int64
    cnorm = (cent * cent).sum(axis=1)          # (k,)
    score = cnorm[None, :] - 2 * cross         # monotone in true dist
    cluster = np.argmin(score, axis=1)         # ties -> lowest index
    xnorm = (mat * mat).sum(axis=1)
    dist = xnorm + score[np.arange(len(mat)), cluster]
    return cluster.astype(np.int64), dist.astype(np.int64)


def kmeans(embs, k: int = 8, iters: int = 1, col: str = "embedding",
           key: str = "vec_id", scale: float = 128.0):
    """Integer-exact distributed k-means.

    Returns (assignments DataFrame[key, cluster, dist], centroids
    int64 (k, dim)). ``iters`` Lloyd updates run before the final
    assignment pass; every pass streams the corpus once.
    """
    import ray

    qds = embs.map_batches(
        lambda df: quantize_batch(df, col=col, key=key, scale=scale),
        batch_format="pandas")

    # deterministic init: the k smallest keys (contiguous-id corpora:
    # key < k). Tiny filter result; never the corpus.
    init = qds.map_batches(lambda df: df[df[key] < k],
                           batch_format="pandas").to_pandas()
    if len(init):  # an all-empty result loses its column schema
        init = init.sort_values(key).head(k)
    if len(init) < k:
        raise ValueError(
            f"kmeans init needs rows with {key} < k={k} (contiguous-id "
            f"corpora); found {len(init)}. For arbitrary keys, remap "
            "ids first (e.g. rank by key) so the k seed rows exist.")
    cent = np.stack(init["q"].to_numpy()).astype(np.int64)

    for _ in range(iters):
        cent_ref = ray.put(cent)

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            c = ray.get(cent_ref)
            mat = np.stack(df["q"].to_numpy()).astype(np.int64)
            cluster, _ = _assign(mat, c)
            sums = np.zeros((len(c), mat.shape[1]), dtype=np.int64)
            np.add.at(sums, cluster, mat)
            cnt = np.bincount(cluster, minlength=len(c)).astype(np.int64)
            return pd.DataFrame({"cluster": np.arange(len(c)),
                                 "n": cnt, "s": list(sums)})

        parts = qds.map_batches(partial, batch_format="pandas").to_pandas()
        cnt = np.zeros(len(cent), dtype=np.int64)
        sums = np.zeros_like(cent)
        np.add.at(cnt, parts["cluster"].to_numpy(),
                  parts["n"].to_numpy())
        np.add.at(sums, parts["cluster"].to_numpy(),
                  np.stack(parts["s"].to_numpy()))
        nz = cnt > 0  # empty cluster keeps its previous centroid
        cent = cent.copy()
        cent[nz] = np.floor_divide(sums[nz], cnt[nz, None])

    cent_ref = ray.put(cent)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(cent_ref)
        mat = np.stack(df["q"].to_numpy()).astype(np.int64)
        cluster, dist = _assign(mat, c)
        return pd.DataFrame({key: df[key], "cluster": cluster,
                             "dist": dist})

    out = qds.map_batches(final, batch_format="pandas").to_pandas()
    return out.sort_values(key).reset_index(drop=True), cent


def kmeans_oracle_sql(k: int = 8, iters: int = 1,
                      scale: int = 128) -> str:
    """The same integer k-means replayed in long-form SQL: UNNEST the
    quantized vectors to (vec_id, i, v) rows, join against the
    centroid long form per iteration, argmin via row_number with the
    (dist, cluster) tie order, floor-division centroid update."""
    q_cte = f"""
q AS (
  SELECT vec_id, i, CAST(floor(v * {scale} + 0.5) AS BIGINT) AS v
  FROM (SELECT vec_id, unnest(embedding) AS v,
               generate_subscripts(embedding, 1) AS i
        FROM embeddings)),
cent0 AS (
  SELECT vec_id AS cluster, i, v AS c FROM q WHERE vec_id < {k})"""
    steps = [q_cte]
    prev = "cent0"
    for t in range(iters):
        steps.append(f"""
dist{t} AS (
  SELECT q.vec_id, c.cluster, sum((q.v - c.c) * (q.v - c.c)) AS d
  FROM q JOIN {prev} c ON q.i = c.i
  GROUP BY 1, 2),
asg{t} AS (
  SELECT vec_id, cluster FROM (
    SELECT vec_id, cluster,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY d, cluster) AS rk
    FROM dist{t}) WHERE rk = 1),
upd{t} AS (
  SELECT a.cluster, q.i,
         CAST(floor(CAST(sum(q.v) AS DOUBLE) / count(*)) AS BIGINT) AS c
  FROM q JOIN asg{t} a ON q.vec_id = a.vec_id
  GROUP BY 1, 2),
cent{t + 1} AS (
  -- an emptied cluster keeps its previous centroid (engine parity)
  SELECT p.cluster, p.i, COALESCE(u.c, p.c) AS c
  FROM {prev} p LEFT JOIN upd{t} u
    ON p.cluster = u.cluster AND p.i = u.i)""")
        prev = f"cent{t + 1}"
    steps.append(f"""
fdist AS (
  SELECT q.vec_id, c.cluster, sum((q.v - c.c) * (q.v - c.c)) AS d
  FROM q JOIN {prev} c ON q.i = c.i
  GROUP BY 1, 2)
SELECT CAST(vec_id AS BIGINT) AS vec_id,
       CAST(cluster AS BIGINT) AS cluster,
       CAST(d AS BIGINT) AS dist FROM (
  SELECT vec_id, cluster, d,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY d, cluster) AS rk
  FROM fdist) WHERE rk = 1
ORDER BY vec_id""")
    return "WITH " + ",".join(steps)
