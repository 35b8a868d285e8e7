"""Similarity search over an embedding column (list<float>).

- brute_force_topk: exact cosine top-k. The (small) QUERY matrix is
  broadcast via ray.put; each corpus batch computes a numpy matmul
  and emits its LOCAL top-k per query; a final tiny merge keeps the
  global top-k. The corpus streams — only (q, k) candidate rows move.
- lsh_topk: random-hyperplane bucketing; each corpus batch scores
  only queries whose signature matches the row's bucket (multi-probe
  within Hamming radius 1) — the scale path, approximate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def brute_force_topk(ds, query_vecs: np.ndarray, k: int = 10,
                     key: str = "vec_id", col: str = "embedding",
                     round_to: int = 6) -> pd.DataFrame:
    """Exact top-k by cosine. Returns (q, rank, vec_id, cosine)."""
    import ray

    q = _normalize(np.asarray(query_vecs, dtype=np.float64))
    ref = ray.put(q)

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        qm = ray.get(ref)
        sub = _normalize(np.stack(df[col].to_numpy()).astype(np.float64))
        cos = qm @ sub.T  # (nq, batch)
        nq, nb = cos.shape
        kk = min(k, nb)
        part = np.argpartition(-cos, kk - 1, axis=1)[:, :kk]
        rows_q, rows_key, rows_cos = [], [], []
        keys = df[key].to_numpy()
        for qi in range(nq):
            for j in part[qi]:
                rows_q.append(qi)
                rows_key.append(keys[j])
                rows_cos.append(cos[qi, j])
        return pd.DataFrame({"q": rows_q, key: rows_key, "cosine": rows_cos})

    cand = ds.map_batches(local_topk, batch_format="pandas").to_pandas()
    out = []
    for qi, grp in cand.groupby("q"):
        top = grp.sort_values(["cosine", key], ascending=[False, True]).head(k)
        top = top.reset_index(drop=True)
        top["rank"] = np.arange(1, len(top) + 1)
        out.append(top)
    res = pd.concat(out, ignore_index=True)[["q", "rank", key, "cosine"]]
    res["cosine"] = np.round(res["cosine"], round_to)
    res["q"] = res["q"].astype("int64")
    res["rank"] = res["rank"].astype("int64")
    return res.sort_values(["q", "rank"]).reset_index(drop=True)


def kmeans_fit(sample: np.ndarray, n_centroids: int = 16, iters: int = 10,
               seed: int = 13) -> np.ndarray:
    """Tiny deterministic k-means (numpy) for the IVF coarse quantizer."""
    rs = np.random.RandomState(seed)
    sample = _normalize(np.asarray(sample, dtype=np.float64))
    cents = sample[rs.choice(len(sample), size=min(n_centroids, len(sample)),
                             replace=False)]
    for _ in range(iters):
        assign = (sample @ cents.T).argmax(axis=1)
        for c in range(len(cents)):
            m = assign == c
            if m.any():
                v = sample[m].mean(axis=0)
                cents[c] = v / max(np.linalg.norm(v), 1e-12)
    return cents


def ivf_topk(ds, query_vecs: np.ndarray, k: int = 10,
             key: str = "vec_id", col: str = "embedding",
             n_centroids: int = 16, n_probe: int = 4,
             train_sample: int = 4096, seed: int = 13) -> pd.DataFrame:
    """IVF-style ANN: coarse k-means centroids (trained on a bounded
    sample) partition the corpus; each batch scores a query only
    against rows whose centroid is among the query's ``n_probe``
    nearest lists. The centroid table is broadcast once; the corpus
    streams — the 100-TB path alongside ``lsh_topk``."""
    import ray

    sample_df = ds.limit(train_sample).to_pandas()
    cents = kmeans_fit(np.stack(sample_df[col].to_numpy()), n_centroids,
                       seed=seed)
    q = _normalize(np.asarray(query_vecs, dtype=np.float64))
    qlists = np.argsort(-(q @ cents.T), axis=1)[:, :n_probe]
    ref = ray.put((q, cents, [set(map(int, row)) for row in qlists]))

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        qm, cm, probes = ray.get(ref)
        sub = _normalize(np.stack(df[col].to_numpy()).astype(np.float64))
        assign = (sub @ cm.T).argmax(axis=1)
        keys = df[key].to_numpy()
        rows_q, rows_key, rows_cos = [], [], []
        for qi in range(len(qm)):
            mask = np.isin(assign, list(probes[qi]))
            if not mask.any():
                continue
            cos = sub[mask] @ qm[qi]
            idx = np.argsort(-cos)[:k]
            mkeys = keys[mask]
            for j in idx:
                rows_q.append(qi)
                rows_key.append(mkeys[j])
                rows_cos.append(cos[j])
        return pd.DataFrame({"q": rows_q, key: rows_key, "cosine": rows_cos})

    cand = ds.map_batches(local_topk, batch_format="pandas").to_pandas()
    if len(cand) == 0:
        return pd.DataFrame({"q": [], "rank": [], key: [], "cosine": []})
    out = []
    for qi, grp in cand.groupby("q"):
        top = grp.sort_values(["cosine", key], ascending=[False, True]).head(k)
        top = top.reset_index(drop=True)
        top["rank"] = np.arange(1, len(top) + 1)
        out.append(top)
    res = pd.concat(out, ignore_index=True)[["q", "rank", key, "cosine"]]
    res["cosine"] = np.round(res["cosine"], 6)
    res["q"] = res["q"].astype("int64")
    res["rank"] = res["rank"].astype("int64")
    return res.sort_values(["q", "rank"]).reset_index(drop=True)


def lsh_topk(ds, query_vecs: np.ndarray, k: int = 10,
             key: str = "vec_id", col: str = "embedding",
             n_planes: int = 8, seed: int = 11) -> pd.DataFrame:
    """Approximate top-k: score only rows whose hyperplane bucket is
    within Hamming distance 1 of the query's bucket."""
    import ray

    q = _normalize(np.asarray(query_vecs, dtype=np.float64))
    rs = np.random.RandomState(seed)
    dim = q.shape[1]
    planes = rs.randn(dim, n_planes)
    weights = (1 << np.arange(n_planes, dtype=np.uint32))

    def sig_of(m: np.ndarray) -> np.ndarray:
        return ((m @ planes > 0).astype(np.uint32) * weights).sum(axis=1)

    qsig = sig_of(q)
    # multi-probe: query bucket + all radius-1 neighbors
    probe_sets = []
    for s in qsig:
        probe_sets.append({int(s)} | {int(s) ^ (1 << b) for b in range(n_planes)})
    ref = ray.put((q, probe_sets))

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        qm, probes = ray.get(ref)
        sub = _normalize(np.stack(df[col].to_numpy()).astype(np.float64))
        ssig = sig_of(sub)
        keys = df[key].to_numpy()
        rows_q, rows_key, rows_cos = [], [], []
        for qi in range(len(qm)):
            mask = np.fromiter((int(s) in probes[qi] for s in ssig),
                               dtype=bool, count=len(ssig))
            if not mask.any():
                continue
            cos = sub[mask] @ qm[qi]
            idx = np.argsort(-cos)[:k]
            mkeys = keys[mask]
            for j in idx:
                rows_q.append(qi)
                rows_key.append(mkeys[j])
                rows_cos.append(cos[j])
        return pd.DataFrame({"q": rows_q, key: rows_key, "cosine": rows_cos})

    cand = ds.map_batches(local_topk, batch_format="pandas").to_pandas()
    if len(cand) == 0:
        return pd.DataFrame({"q": [], "rank": [], key: [], "cosine": []})
    out = []
    for qi, grp in cand.groupby("q"):
        top = grp.sort_values(["cosine", key], ascending=[False, True]).head(k)
        top = top.reset_index(drop=True)
        top["rank"] = np.arange(1, len(top) + 1)
        out.append(top)
    res = pd.concat(out, ignore_index=True)[["q", "rank", key, "cosine"]]
    res["cosine"] = np.round(res["cosine"], 6)
    res["q"] = res["q"].astype("int64")
    res["rank"] = res["rank"].astype("int64")
    return res.sort_values(["q", "rank"]).reset_index(drop=True)
