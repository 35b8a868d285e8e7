"""coarse_group_apply / coarse_partition_apply equivalence with plain
groupby(key).map_groups — same per-key results through the coarse
hash-partition exchange."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from fluent_bit_ray.shuffle import coarse_group_apply, coarse_partition_apply


def _ds(n=500, keys=37):
    rs = np.random.RandomState(5)
    return rd.from_pandas(pd.DataFrame({
        "k": [f"key-{i % keys:03d}" for i in range(n)],
        "v": rs.randint(0, 100, n),
    }))


def test_coarse_group_apply_matches_plain_groupby():
    def per_key(g):
        return pd.DataFrame({"k": [g["k"].iloc[0]],
                             "s": [int(g["v"].sum())],
                             "n": [len(g)]})

    a = (coarse_group_apply(_ds(), "k", per_key, partitions=8)
         .to_pandas().sort_values("k").reset_index(drop=True))
    b = (_ds().groupby("k").map_groups(per_key, batch_format="pandas")
         .to_pandas().sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_coarse_group_apply_composite_key():
    ds = rd.from_pandas(pd.DataFrame({
        "a": [i % 3 for i in range(60)],
        "b": [f"x{i % 4}" for i in range(60)],
        "v": range(60)}))

    def per_key(g):
        return pd.DataFrame({"a": [g["a"].iloc[0]], "b": [g["b"].iloc[0]],
                             "s": [int(g["v"].sum())]})

    a = (coarse_group_apply(ds, ["a", "b"], per_key, partitions=4)
         .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    exp = (ds.to_pandas().groupby(["a", "b"])["v"].sum()
           .reset_index(name="s"))
    assert dict(zip(zip(a["a"], a["b"]), a["s"])) == \
        dict(zip(zip(exp["a"], exp["b"]), exp["s"]))


def test_coarse_partition_apply_key_colocation():
    """Every row of one key lands in exactly one partition call."""
    seen: dict = {}

    def per_partition(g):
        ks = set(g["k"])
        return pd.DataFrame({"k": sorted(ks),
                             "n": [int((g["k"] == k).sum())
                                   for k in sorted(ks)]})

    out = (coarse_partition_apply(_ds(), "k", per_partition, partitions=8)
           .to_pandas())
    # since each key appears in exactly one partition, per-key counts
    # must equal the global counts (no splits)
    exp = _ds().to_pandas()["k"].value_counts()
    got = dict(zip(out["k"], out["n"]))
    assert got == exp.to_dict()
    assert len(out) == len(exp)  # one row per key → never split


def test_hash_exchange_apply_key_colocation_string_key():
    """Raw-Ray unsorted exchange: all rows of one key reach exactly one
    kernel call, identical guarantee to coarse_partition_apply."""
    from fluent_bit_ray.shuffle import hash_exchange_apply

    def per_partition(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        ks = sorted(set(df["k"]))
        return pa.table({"k": ks,
                         "n": [int((df["k"] == k).sum()) for k in ks]})

    out = hash_exchange_apply(_ds(), "k", per_partition,
                              partitions=8).to_pandas()
    exp = _ds().to_pandas()["k"].value_counts()
    assert dict(zip(out["k"], out["n"])) == exp.to_dict()
    assert len(out) == len(exp)  # one row per key -> never split


def test_hash_exchange_matches_coarse_partition_apply():
    """Same kernel through both exchanges -> identical result set, for
    integer keys, at several partition counts incl. the degenerate 1."""
    from fluent_bit_ray.shuffle import hash_exchange_apply

    def mk():
        rs = np.random.RandomState(11)
        return rd.from_pandas(pd.DataFrame({
            "uid": rs.randint(0, 40, 300).astype(np.int64),
            "v": rs.randint(0, 9, 300).astype(np.int64)}))

    def kern(t: pa.Table) -> pa.Table:
        df = t.to_pandas().groupby("uid", sort=True)["v"].sum().reset_index()
        return pa.Table.from_pandas(df, preserve_index=False)

    base = (coarse_partition_apply(mk(), "uid", lambda g:
            g.groupby("uid", sort=True)["v"].sum().reset_index(),
            partitions=8)
            .to_pandas().sort_values("uid").reset_index(drop=True))
    for p in (1, 3, 8, 64):
        got = (hash_exchange_apply(mk(), "uid", kern, partitions=p)
               .to_pandas().sort_values("uid").reset_index(drop=True))
        pd.testing.assert_frame_equal(got, base)


def test_hash_exchange_tree_fold(monkeypatch):
    """Reduce fan-in above _MAX_FANIN goes through the concat tree —
    force it by shrinking the fold threshold below the block count."""
    import fluent_bit_ray.shuffle as sh

    monkeypatch.setattr(sh, "_MAX_FANIN", 4)
    ds = _ds(n=600).repartition(24)

    def kern(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        ks = sorted(set(df["k"]))
        return pa.table({"k": ks,
                         "n": [int((df["k"] == k).sum()) for k in ks]})

    out = sh.hash_exchange_apply(ds, "k", kern, partitions=4).to_pandas()
    exp = _ds(n=600).to_pandas()["k"].value_counts()
    assert dict(zip(out["k"], out["n"])) == exp.to_dict()


def test_hash_exchange_sort_fallback_above_group_ceiling(monkeypatch):
    """Past _RAW_MAX_GROUPS split groups the exchange must hand the job
    to the sort-based shuffle (driver ref-matrix guard) — results
    identical."""
    import fluent_bit_ray.shuffle as sh

    def kern(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        ks = sorted(set(df["k"]))
        return pa.table({"k": ks,
                         "n": [int((df["k"] == k).sum()) for k in ks]})

    base = sh.hash_exchange_apply(_ds(n=400), "k", kern,
                                  partitions=4).to_pandas()
    monkeypatch.setattr(sh, "_RAW_MAX_GROUPS", 2)
    forced = sh.hash_exchange_apply(_ds(n=400).repartition(8), "k", kern,
                                    partitions=4).to_pandas()
    key = lambda d: d.sort_values("k").reset_index(drop=True)  # noqa: E731
    pd.testing.assert_frame_equal(key(forced), key(base))


def test_hash_exchange_deferred_sizing_saturation(monkeypatch):
    """Auto-sized exchanges buffer bundles only until the partition
    formula saturates at its 4/CPU cap, then stream the rest into
    split tasks. Shrink the rows-per-partition unit so a unit-scale
    input crosses the saturation threshold — results must match the
    small-input (fully buffered) path."""
    import fluent_bit_ray.shuffle as sh

    def kern(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        ks = sorted(set(df["k"]))
        return pa.table({"k": ks,
                         "n": [int((df["k"] == k).sum()) for k in ks]})

    base = sh.hash_exchange_apply(_ds(n=800), "k", kern,
                                  partitions=None).to_pandas()
    # 10 rows/partition → saturation at cap*10 rows, far below 800:
    # the loop breaks early and the remaining bundles stream
    monkeypatch.setattr(sh, "_ROWS_PER_PART", 10)
    streamed = sh.hash_exchange_apply(_ds(n=800).repartition(16), "k",
                                      kern, partitions=None).to_pandas()
    key = lambda d: d.sort_values("k").reset_index(drop=True)  # noqa: E731
    pd.testing.assert_frame_equal(key(streamed), key(base))


def test_read_block_count_scales_with_rows():
    """Block count is data-size-aware: fixed-per-CPU below ~128k rows
    per block, then grows with the input so task makespan and worker
    heap stay flat as data grows (the property that holds at 100 TB)."""
    from fluent_bit_ray.sources.transcripts import block_count

    assert block_count(600_000, 16) == 24          # floor: 1.5/CPU
    assert block_count(6_000_000, 16) == 45        # data term takes over
    assert block_count(24_000_000, 16) == 183      # keeps growing
    assert block_count(24_000_000, 4) == 183       # independent of CPUs
    assert block_count(20_000, 32) == 2            # tiny: no shredding
    assert block_count(0, 8) == 1


def test_hash_exchange_salt_col_splits_hot_key():
    """With salt_col, one hot key's chunks land in DIFFERENT kernel
    calls (each seeing whole (key, salt) groups); without it the whole
    key reaches one call."""
    import fluent_bit_ray.shuffle as sh

    n = 4000
    df = pd.DataFrame({
        "k": ["hot"] * (n - 100) + [f"k{i}" for i in range(100)],
        "turn": list(range(n - 100)) + [0] * 100,
    })
    df["_ck"] = df["turn"] // 500

    seen = []

    def kern(t: pa.Table) -> pa.Table:
        d = t.to_pandas()
        g = d.groupby(["k", "_ck"]).size()
        return pa.table({
            "k": [k for k, _ in g.index],
            "ck": [int(c) for _, c in g.index],
            "rows": list(g.values),
        })

    out = sh.hash_exchange_apply(rd.from_pandas(df).repartition(8),
                                 "k", kern, partitions=16,
                                 salt_col="_ck").to_pandas()
    hot = out[out["k"] == "hot"].sort_values("ck")
    # every (hot, ck) group is complete in exactly one kernel call
    assert hot["rows"].tolist() == [500] * 7 + [400]
    assert len(hot) == 8


def test_hash_exchange_side_schema():
    """side_schema: kernel returns (main, side|None); the exchange
    returns two datasets, with empty sides filled to the schema."""
    import fluent_bit_ray.shuffle as sh

    side_schema = pa.schema([pa.field("k", pa.string()),
                             pa.field("n", pa.int64())])

    def kern(t: pa.Table):
        d = t.to_pandas()
        main = pa.table({"k": d["k"], "v": d["v"]})
        ks = sorted(set(d["k"]))
        big = [k for k in ks if (d["k"] == k).sum() > 30]
        side = (pa.table({"k": big,
                          "n": [int((d["k"] == k).sum()) for k in big]},
                         schema=side_schema) if big else None)
        return main, side

    df = pd.DataFrame({"k": ["hot"] * 200 + [f"k{i % 11}" for i in range(100)],
                       "v": range(300)})
    main, side = sh.hash_exchange_apply(
        rd.from_pandas(df).repartition(6), "k", kern,
        partitions=8, side_schema=side_schema)
    m = main.to_pandas()
    s = side.to_pandas()
    assert len(m) == 300 and sorted(m["v"]) == list(range(300))
    assert s[s["k"] == "hot"]["n"].tolist() == [200]


def test_hash_exchange_side_schema_sort_fallback(monkeypatch):
    """Past the ref-matrix ceiling the side channel rides in-band
    behind a tag column through the sort shuffle; the split back into
    (main, side) must match the raw-path results."""
    import fluent_bit_ray.shuffle as sh

    side_schema = pa.schema([pa.field("k", pa.string()),
                             pa.field("n", pa.int64())])

    def kern(t: pa.Table):
        d = t.to_pandas()
        main = pa.table({"k": pa.array(d["k"], type=pa.string()),
                         "v": pa.array(d["v"], type=pa.int64())})
        ks = sorted(set(d["k"]))
        big = [k for k in ks if (d["k"] == k).sum() > 30]
        side = (pa.table({"k": big,
                          "n": [int((d["k"] == k).sum()) for k in big]},
                         schema=side_schema) if big else None)
        return main, side

    df = pd.DataFrame({"k": ["hot"] * 200 + [f"k{i % 11}" for i in range(100)],
                       "v": range(300)})
    ds = rd.from_pandas(df).repartition(6)
    main_raw, side_raw = sh.hash_exchange_apply(
        ds, "k", kern, partitions=8, side_schema=side_schema)
    m_raw = main_raw.to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    s_raw = side_raw.to_pandas().sort_values("k").reset_index(drop=True)

    monkeypatch.setattr(sh, "_RAW_MAX_GROUPS", 1)   # force the fallback
    main_fb, side_fb = sh.hash_exchange_apply(
        ds, "k", kern, partitions=8, side_schema=side_schema)
    m_fb = main_fb.to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    s_fb = side_fb.to_pandas().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(m_fb[m_raw.columns], m_raw)
    pd.testing.assert_frame_equal(s_fb[s_raw.columns].astype({"n": "int64"}),
                                  s_raw.astype({"n": "int64"}))


def test_hp_column_matches_arrow_route():
    """The pandas-route partition map (_hp_column) and the Arrow-route
    map (_hp_of_arrow) must be IDENTICAL for single string keys — both
    hash distinct values through _hash64_of_arrow (r5 unification; the
    pandas route previously crc32'd each distinct in Python)."""
    from fluent_bit_ray.shuffle import _hp_column, _hp_of_arrow

    n = 20_000
    keys = [f"conv-{i % 7919:05d}" for i in range(n)]   # high cardinality
    df = pd.DataFrame({"k": keys})
    for parts in (8, 64, 256):
        via_pandas = _hp_column(df, ["k"], parts)
        via_arrow = _hp_of_arrow(pa.chunked_array([pa.array(keys)]), parts)
        np.testing.assert_array_equal(via_pandas, via_arrow)


def test_hp_column_integer_and_composite_deterministic():
    from fluent_bit_ray.shuffle import _hp_column

    df = pd.DataFrame({"a": np.arange(1000, dtype=np.int64),
                       "b": [f"s{i % 13}" for i in range(1000)]})
    one = _hp_column(df, ["a"], 32)
    two = _hp_column(df.copy(), ["a"], 32)
    np.testing.assert_array_equal(one, two)
    comp1 = _hp_column(df, ["a", "b"], 32)
    comp2 = _hp_column(df.iloc[::-1].reset_index(drop=True), ["a", "b"], 32)
    # same (a,b) value → same partition regardless of row order
    np.testing.assert_array_equal(comp1, comp2[::-1])
    assert _hp_column(df.iloc[:0], ["b"], 32).shape == (0,)
