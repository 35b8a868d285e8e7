"""Distributed integer k-means (dataops/cluster.py)."""

import numpy as np
import pandas as pd
import ray.data as rd

from fluent_bit_ray.dataops.cluster import kmeans


def _embs_df(vecs):
    return pd.DataFrame({
        "vec_id": np.arange(len(vecs), dtype=np.int64),
        "embedding": [np.asarray(v, dtype=np.float32) for v in vecs],
    })


def test_kmeans_recovers_planted_clusters():
    rng = np.random.default_rng(5)
    centers = np.array([[0.0] * 8, [1.0] * 8, [-1.0] * 8])
    # first k rows must seed distinct clusters: lay one point of each
    # center first, then the noisy rest
    vecs = list(centers)
    labels = [0, 1, 2]
    for _ in range(60):
        c = int(rng.integers(0, 3))
        vecs.append(centers[c] + rng.normal(0, 0.05, 8))
        labels.append(c)
    out, cent = kmeans(rd.from_pandas(_embs_df(vecs)), k=3, iters=2)
    got = out["cluster"].to_numpy()
    # planted label == seeded cluster id by construction
    assert (got == np.array(labels)).all()
    assert cent.shape == (3, 8)


def test_kmeans_empty_cluster_keeps_previous_centroid():
    # vec 1 and vec 2 identical -> during the update pass cluster 2 is
    # never the argmin (ties resolve to the lower id), so it ends the
    # iteration empty and must keep its init centroid ([128,128] =
    # floor(1*128+0.5)); cluster 1's centroid moves off it. (In the
    # FINAL assignment the carried centroid legitimately wins the
    # duplicate points back — exactly what the SQL oracle's
    # carry-forward reproduces.)
    vecs = [[0.0, 0.0], [1.0, 1.0], [1.0, 1.0], [0.1, 0.0], [0.9, 1.0]]
    out, cent = kmeans(rd.from_pandas(_embs_df(vecs)), k=3, iters=1)
    assert (cent[2] == np.array([128, 128])).all()
    assert not (cent[1] == np.array([128, 128])).all()
    assert out.loc[out["vec_id"] == 1, "cluster"].item() == 2


def test_kmeans_zero_iters_assigns_to_init():
    vecs = [[0.0, 0.0], [1.0, 1.0], [0.2, 0.1], [0.8, 0.9]]
    out, cent = kmeans(rd.from_pandas(_embs_df(vecs)), k=2, iters=0)
    assert out["cluster"].tolist() == [0, 1, 0, 1]
    assert out["dist"].tolist()[0] == 0


def test_kmeans_missing_seed_rows_raises():
    import pytest
    df = _embs_df([[0.0, 0.0], [1.0, 1.0]])
    df["vec_id"] = df["vec_id"] + 100  # no ids < k
    with pytest.raises(ValueError, match="kmeans init"):
        kmeans(rd.from_pandas(df), k=2, iters=1)


def test_semantic_dedup_pairs_matches_bruteforce():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from fluent_bit_ray.dataops.cluster import (_assign, kmeans_fit,
                                                semantic_dedup_pairs)

    rs = np.random.RandomState(7)
    base = rs.randn(40, 16).astype(np.float32)
    mat = np.vstack([base, base[:6] + 0.001 * rs.randn(6, 16).astype(np.float32)])

    def embs(m, nparts=1):
        t = pa.table({"vec_id": pa.array(range(len(m)), type=pa.int64()),
                      "embedding": pa.array([list(map(float, r)) for r in m],
                                            type=pa.list_(pa.float32()))})
        ds = rd.from_arrow(t)
        return ds.repartition(nparts) if nparts > 1 else ds

    out = semantic_dedup_pairs(embs(mat), k=4, iters=1, thr_milli=950)
    pairs = set(zip(out["key_a"], out["key_b"]))
    # every planted near-copy shares its source's cluster (identical
    # quantization up to the tiny noise) and clears cos >= 0.95
    for i in range(6):
        assert (i, 40 + i) in pairs

    # brute-force integer reference: same-cluster AND integer rule
    q = np.floor(mat.astype(np.float64) * 128.0 + 0.5).astype(np.int64)
    cent = kmeans_fit(embs(mat), k=4, iters=1)
    cl, _ = _assign(q, cent)
    dot = q @ q.T
    n2 = (q * q).sum(axis=1)
    ok = (dot > 0) & (1_000_000 * dot * dot >= 950**2 * (n2[:, None] * n2[None, :]))
    expect = {(i, j) for i in range(len(q)) for j in range(i + 1, len(q))
              if cl[i] == cl[j] and ok[i, j]}
    assert pairs == expect

    # block-layout independence
    out2 = semantic_dedup_pairs(embs(mat, nparts=9), k=4, iters=1,
                                thr_milli=950)
    assert out.equals(out2)


def test_cluster_balanced_sample_exact_quota():
    """Exactly n rows per non-empty cluster, deterministic across
    parallelism (repartition changes nothing)."""
    import numpy as np
    import ray.data as rd
    import pyarrow as pa

    from fluent_bit_ray.dataops import cluster_balanced_sample

    rs = np.random.RandomState(11)
    centers = rs.randn(4, 8) * 4
    mat = np.vstack([c + 0.1 * rs.randn(50, 8) for c in centers])

    def embs(nparts):
        t = pa.table({
            "vec_id": pa.array(range(len(mat)), type=pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in mat],
                                  type=pa.list_(pa.float32()))})
        return rd.from_arrow(t).repartition(nparts)

    a = cluster_balanced_sample(embs(2), k=4, iters=2, n=6).to_pandas()
    b = cluster_balanced_sample(embs(9), k=4, iters=2, n=6).to_pandas()
    a = a.sort_values("vec_id").reset_index(drop=True)
    b = b.sort_values("vec_id").reset_index(drop=True)
    assert a.equals(b)
    per = a.groupby("cluster").size()
    assert (per == 6).all() and len(per) == 4
