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


def kmeans_fit(embs, k: int = 8, iters: int = 1, col: str = "embedding",
               key: str = "vec_id", scale: float = 128.0) -> np.ndarray:
    """The training loop alone: returns the final int64 (k, dim)
    centroids after ``iters`` Lloyd updates (no assignment pass)."""
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
    return cent


def kmeans(embs, k: int = 8, iters: int = 1, col: str = "embedding",
           key: str = "vec_id", scale: float = 128.0):
    """Integer-exact distributed k-means.

    Returns (assignments DataFrame[key, cluster, dist], centroids
    int64 (k, dim)). ``iters`` Lloyd updates run before the final
    assignment pass; every pass streams the corpus once.
    """
    import ray

    cent = kmeans_fit(embs, k=k, iters=iters, col=col, key=key, scale=scale)
    qds = embs.map_batches(
        lambda df: quantize_batch(df, col=col, key=key, scale=scale),
        batch_format="pandas")
    cent_ref = ray.put(cent)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(cent_ref)
        mat = np.stack(df["q"].to_numpy()).astype(np.int64)
        cluster, dist = _assign(mat, c)
        return pd.DataFrame({key: df[key], "cluster": cluster,
                             "dist": dist})

    out = qds.map_batches(final, batch_format="pandas").to_pandas()
    return out.sort_values(key).reset_index(drop=True), cent


def cluster_balanced_sample(embs, k: int = 8, iters: int = 1,
                            n: int = 5, col: str = "embedding",
                            key: str = "vec_id", scale: float = 128.0):
    """Cluster-balanced corpus sampling: EXACTLY ``n`` rows per k-means
    cluster (the diversity-sampling step of training-data curation —
    a topic-balanced subset instead of a frequency-weighted one).

    Fully streaming composition: ``kmeans_fit`` broadcasts centroids,
    assignment runs per batch, and the per-cluster quota is the same
    deterministic n-smallest-h64(key) rule as
    :func:`curation.stratified_sample` (partial-top-n exchange — at
    most n × clusters rows move per batch; no RNG, identical at any
    parallelism). Returns a Dataset of (key, cluster, dist) rows.
    """
    import ray

    from .curation import stratified_sample

    cent = kmeans_fit(embs, k=k, iters=iters, col=col, key=key,
                      scale=scale)
    qds = embs.map_batches(
        lambda df: quantize_batch(df, col=col, key=key, scale=scale),
        batch_format="pandas")
    cent_ref = ray.put(cent)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(cent_ref)
        mat = np.stack(df["q"].to_numpy()).astype(np.int64)
        cluster, dist = _assign(mat, c)
        return pd.DataFrame({key: df[key], "cluster": cluster,
                             "dist": dist})

    asg = qds.map_batches(assign, batch_format="pandas")
    return stratified_sample(asg, "cluster", key, n=n)


_SEM_EMPTY = {"key_a": "int64", "key_b": "int64", "cluster": "int64",
              "dot_q": "int64"}


def semantic_dedup_pairs(embs, k: int = 8, iters: int = 1,
                         thr_milli: int = 300, col: str = "embedding",
                         key: str = "vec_id", scale: float = 128.0,
                         partitions: int = 16,
                         max_cluster: int = 20000) -> pd.DataFrame:
    """SemDeDup-style semantic near-dup pairs: k-means buckets the
    corpus, then only SAME-CLUSTER pairs are cosine-scored — the
    cluster structure replaces the all-pairs matmul, the standard
    semantic-dedup shape (SemDeDup, Abbas et al. 2023).

    Exactness contract: everything runs on the QUANTIZED int64 vectors
    (the same floor(x·scale+0.5) as kmeans), and the cosine threshold
    t = thr_milli/1000 is tested as the integer inequality
    ``1e6·dot² ≥ thr_milli²·|a|²·|b|²  AND  dot > 0`` — no float
    arithmetic anywhere, so the SQL oracle matches bit-for-bit.
    Bounds: with dim ≤ 64 and scale 128, 1e6·dot² ≤ ~1.2e18 < 2^63
    (larger dims need a smaller scale — documented).

    Scale: centroids (k×dim ints) broadcast once; each batch tags its
    rows vectorized (the same integer argmin as kmeans); one coarse
    cluster exchange co-locates each cluster; the in-partition kernel
    matmuls per cluster. ``max_cluster`` caps a pathological cluster
    (scored on its ``key``-smallest members) the way LSH buckets are
    capped; at real scale pick k so clusters stay small (the op's
    contract, as in the paper). Returns (key_a, key_b, cluster, dot_q)
    sorted.
    """
    import ray

    from ..shuffle import coarse_partition_apply

    def empty() -> pd.DataFrame:
        return pd.DataFrame({c: pd.Series([], dtype=t)
                             for c, t in _SEM_EMPTY.items()})

    cent = kmeans_fit(embs, k=k, iters=iters, col=col, key=key, scale=scale)
    cent_ref = ray.put(cent)
    num = int(thr_milli) ** 2  # t² numerator over den = 1e6

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(cent_ref)
        mat = np.stack([np.floor(np.asarray(v, dtype=np.float64) * scale
                                 + 0.5)
                        for v in df[col]]).astype(np.int64)
        cluster, _ = _assign(mat, c)
        return pd.DataFrame({key: df[key], "cluster": cluster,
                             "q": list(mat)})

    tagged = embs.map_batches(tag, batch_format="pandas")

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for cl, grp in part.groupby("cluster", sort=False):
            if len(grp) < 2:
                continue
            grp = grp.sort_values(key)
            if len(grp) > max_cluster:  # hot-cluster cap: score the
                # key-smallest members; WARN because the SQL oracle has
                # no cap (pick k so clusters stay small — the contract)
                import warnings
                warnings.warn(
                    f"semantic_dedup_pairs: cluster {cl} has {len(grp)} "
                    f"members, scoring only the first {max_cluster} "
                    "(raise k or max_cluster)", RuntimeWarning)
                grp = grp.head(max_cluster)
            ks = grp[key].to_numpy()
            sub = np.stack(grp["q"].to_numpy()).astype(np.int64)
            dot = sub @ sub.T
            n2 = (sub * sub).sum(axis=1)
            ok = (dot > 0) & (1_000_000 * dot * dot
                              >= num * (n2[:, None] * n2[None, :]))
            ii, jj = np.nonzero(np.triu(ok, k=1))
            if not len(ii):
                continue
            outs.append(pd.DataFrame({
                "key_a": ks[ii], "key_b": ks[jj],
                "cluster": np.int64(cl), "dot_q": dot[ii, jj]}))
        return pd.concat(outs, ignore_index=True) if outs else empty()

    out = coarse_partition_apply(tagged, "cluster", kernel,
                                 partitions=partitions).to_pandas()
    if not len(out):
        return empty()
    for c, t in _SEM_EMPTY.items():
        out[c] = out[c].astype(t)
    return out.sort_values(["key_a", "key_b"]).reset_index(drop=True)


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


def semantic_dedup_oracle_sql(k: int = 8, iters: int = 1,
                              thr_milli: int = 300,
                              scale: int = 128) -> str:
    """semantic_dedup_pairs replayed in SQL: the kmeans assignment CTEs
    (bit-exact integer argmin, same as kmeans_oracle_sql) produce the
    final clustering; pairs are same-cluster vec_id pairs whose
    QUANTIZED dot product clears t = thr_milli/1000 via the integer
    inequality 1e6·dot² ≥ thr_milli²·|a|²·|b|² ∧ dot>0 — the same
    all-integer contract as the engine, no float anywhere."""
    num = int(thr_milli) ** 2
    base = kmeans_oracle_sql(k=k, iters=iters, scale=scale)
    head, _, _tail = base.rpartition("SELECT CAST(vec_id AS BIGINT)")
    return head + f""",
asgf AS (
  SELECT vec_id, cluster FROM (
    SELECT vec_id, cluster,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY d, cluster) AS rk
    FROM fdist) WHERE rk = 1),
n2 AS (SELECT vec_id, sum(v * v) AS n2 FROM q GROUP BY vec_id),
dots AS (
  SELECT a.vec_id AS key_a, b.vec_id AS key_b,
         CAST(a.cluster AS BIGINT) AS cluster,
         sum(qa.v * qb.v) AS dot
  FROM asgf a JOIN asgf b
    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
  JOIN q qa ON qa.vec_id = a.vec_id
  JOIN q qb ON qb.vec_id = b.vec_id AND qb.i = qa.i
  GROUP BY 1, 2, 3)
SELECT CAST(key_a AS BIGINT) AS key_a, CAST(key_b AS BIGINT) AS key_b,
       cluster, CAST(dot AS BIGINT) AS dot_q
FROM dots d JOIN n2 na ON na.vec_id = d.key_a
JOIN n2 nb ON nb.vec_id = d.key_b
WHERE d.dot > 0
  AND 1000000 * d.dot * d.dot >= {num} * na.n2 * nb.n2
ORDER BY key_a, key_b"""
