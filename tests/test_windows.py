"""Ordered rolling windows + count pivot (dataops/windows.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from fluent_bit_ray.dataops.windows import (pivot_counts, rolling_window,
                                            shift_within_key)


def ev_ds(rows):
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "value"])
    df["ts"] = pd.to_datetime(df["ts"])
    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


def roll(ds, window, partitions=4):
    out = rolling_window(ds, key="user_id", order=["ts", "event_id"],
                         value_col="value", window=window,
                         keep_cols=["event_id"],
                         partitions=partitions).to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


ROWS = [
    # user 1: three rows, out-of-order input
    (2, 1, "2024-01-01 00:02", 3.00),
    (0, 1, "2024-01-01 00:00", 1.00),
    (1, 1, "2024-01-01 00:01", 2.00),
    # user 2: single row
    (3, 2, "2024-01-01 00:00", 5.00),
    # user 3: tie on ts → event_id breaks it
    (5, 3, "2024-01-01 00:00", 20.00),
    (4, 3, "2024-01-01 00:00", 10.00),
]


def test_rolling_window_trailing_rows():
    out = roll(ev_ds(ROWS), window=2)
    # user 1 ordered 0,1,2: sums 100, 100+200, 200+300
    assert out["roll_sum_c"].tolist() == [100, 300, 500, 500, 1000, 3000]
    assert out["roll_n"].tolist() == [1, 2, 2, 1, 1, 2]


def test_rolling_window_wider_than_group():
    out = roll(ev_ds(ROWS), window=100)
    assert out["roll_sum_c"].tolist() == [100, 300, 600, 500, 1000, 3000]
    assert out["roll_n"].tolist() == [1, 2, 3, 1, 1, 2]


def test_rolling_window_partition_independent():
    a = roll(ev_ds(ROWS), window=2, partitions=1)
    b = roll(ev_ds(ROWS), window=2, partitions=16)
    pd.testing.assert_frame_equal(a, b)


def test_rolling_window_bad_window():
    with pytest.raises(ValueError):
        rolling_window(ev_ds(ROWS), key="user_id", order=["ts"],
                       value_col="value", window=0)


def shift(ds, periods, partitions=4, **kw):
    out = shift_within_key(ds, key="user_id", order=["ts", "event_id"],
                           cols=["value"], periods=periods,
                           keep_cols=["event_id"],
                           partitions=partitions, **kw).to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


def test_shift_lag():
    out = shift(ev_ds(ROWS), periods=1)
    # user 1 ordered 0,1,2 → lag: null,1,2; singles → null; user 3: null,10
    v = out["value_lag1"].tolist()
    assert v[0] is None or np.isnan(v[0])
    assert v[1] == 1.0 and v[2] == 2.0
    assert np.isnan(v[3]) and np.isnan(v[4])
    assert v[5] == 10.0


def test_shift_lead():
    out = shift(ev_ds(ROWS), periods=-1)
    v = out["value_lead1"].tolist()
    assert v[0] == 2.0 and v[1] == 3.0
    assert np.isnan(v[2]) and np.isnan(v[3]) and np.isnan(v[5])
    assert v[4] == 20.0


def test_shift_partition_independent_and_suffix():
    a = shift(ev_ds(ROWS), periods=2, partitions=1, suffix="_p2")
    b = shift(ev_ds(ROWS), periods=2, partitions=16, suffix="_p2")
    pd.testing.assert_frame_equal(a, b)
    assert "value_p2" in a.columns
    with pytest.raises(ValueError):
        shift_within_key(ev_ds(ROWS), key="user_id", order=["ts"],
                         cols=["value"], periods=0)


def test_pivot_counts_fixed_domain():
    df = pd.DataFrame({
        "user_id": [1, 1, 1, 2, 2, 3],
        "event_type": ["a", "b", "a", "b", "zzz", "a"]})
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    out = (pivot_counts(ds, key="user_id", cat_col="event_type",
                        categories=["a", "b"]).to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    # "zzz" is outside the domain → ignored
    assert out["a"].tolist() == [2, 0, 1]
    assert out["b"].tolist() == [1, 1, 0]
    assert list(out.columns) == ["user_id", "a", "b"]


def test_rank_within_key_matches_duckdb():
    import duckdb
    from fluent_bit_ray.dataops.windows import rank_within_key

    rs = np.random.RandomState(7)
    df = pd.DataFrame({
        "uid": rs.randint(0, 9, 200).astype(np.int64),
        "score": rs.randint(0, 5, 200).astype(np.int64),   # many ties
        "eid": np.arange(200, dtype=np.int64),
    })
    got = (rank_within_key(rd.from_pandas(df), key="uid", order=["score"],
                           keep_cols=["eid"], partitions=4)
           .to_pandas().sort_values("eid").reset_index(drop=True))
    exp = duckdb.sql("""
        SELECT eid,
               row_number() OVER w AS row_number,
               rank()       OVER w AS rank,
               dense_rank() OVER w AS dense_rank
        FROM df WINDOW w AS (PARTITION BY uid ORDER BY score)
        ORDER BY eid""").df()
    # row_number needs a full tiebreak to be deterministic; ours breaks
    # ties by input order within equal (key, order) — compare the
    # tie-stable columns exactly and row_number as a SET per tie group
    pd.testing.assert_series_equal(
        got["rank"].astype("int64"), exp["rank"].astype("int64"))
    pd.testing.assert_series_equal(
        got["dense_rank"].astype("int64"),
        exp["dense_rank"].astype("int64"))
    merged = df.assign(rn=got.set_index("eid").loc[df.eid, "row_number"]
                       .to_numpy())
    for _, g in merged.groupby(["uid", "score"]):
        assert sorted(g["rn"]) == list(range(int(g["rn"].min()),
                                             int(g["rn"].min()) + len(g)))


def test_cumulative_within_key_matches_pandas():
    from fluent_bit_ray.dataops.windows import cumulative_within_key

    rs = np.random.RandomState(8)
    df = pd.DataFrame({
        "uid": rs.randint(0, 11, 300).astype(np.int64),
        "t": np.arange(300, dtype=np.int64),
        "v": np.round(rs.uniform(0, 50, 300), 2),
    })
    got = (cumulative_within_key(rd.from_pandas(df), key="uid",
                                 order=["t"], value_col="v",
                                 keep_cols=["t"], partitions=4)
           .to_pandas().sort_values("t").reset_index(drop=True))
    cents = np.round(df["v"].to_numpy() * 100).astype(np.int64)
    exp = (pd.DataFrame({"uid": df.uid, "t": df.t, "c": cents})
           .sort_values(["uid", "t"]))
    exp["cum"] = exp.groupby("uid")["c"].cumsum()
    exp["n"] = exp.groupby("uid").cumcount() + 1
    exp = exp.sort_values("t").reset_index(drop=True)
    assert (got["cum_sum_c"].to_numpy() == exp["cum"].to_numpy()).all()
    assert (got["cum_n"].to_numpy() == exp["n"].to_numpy()).all()


def test_rolling_time_window_matches_duckdb_range():
    import duckdb
    from fluent_bit_ray.dataops.windows import rolling_time_window

    rs = np.random.RandomState(9)
    base = np.datetime64("2024-01-01T00:00:00", "us")
    df = pd.DataFrame({
        "uid": rs.randint(0, 7, 250).astype(np.int64),
        # coarse seconds so ts PEERS exist (RANGE includes them)
        "ts": base + rs.randint(0, 120, 250).astype("timedelta64[s]"),
        "v": np.round(rs.uniform(0, 20, 250), 2),
        "eid": np.arange(250, dtype=np.int64),
    })
    got = (rolling_time_window(rd.from_pandas(df), key="uid", ts_col="ts",
                               value_col="v", span_s=30.0,
                               keep_cols=["eid"], partitions=4)
           .to_pandas().sort_values("eid").reset_index(drop=True))
    exp = duckdb.sql("""
        SELECT eid,
               SUM(CAST(ROUND(v*100) AS BIGINT)) OVER w AS s,
               COUNT(*) OVER w AS n
        FROM df WINDOW w AS (PARTITION BY uid ORDER BY ts
            RANGE BETWEEN INTERVAL 30 SECOND PRECEDING AND CURRENT ROW)
        ORDER BY eid""").df()
    assert (got["span_sum_c"].to_numpy()
            == exp["s"].to_numpy().astype(np.int64)).all()
    assert (got["span_n"].to_numpy()
            == exp["n"].to_numpy().astype(np.int64)).all()


def test_rolling_extremes_matches_duckdb():
    import duckdb
    from fluent_bit_ray.dataops.windows import rolling_extremes

    rs = np.random.RandomState(10)
    df = pd.DataFrame({
        "uid": rs.randint(0, 8, 260).astype(np.int64),
        "t": np.arange(260, dtype=np.int64),
        "v": np.round(rs.uniform(-30, 30, 260), 2),
    })
    got = (rolling_extremes(rd.from_pandas(df), key="uid", order=["t"],
                            value_col="v", window=4,
                            keep_cols=["t"], partitions=4)
           .to_pandas().sort_values("t").reset_index(drop=True))
    exp = duckdb.sql("""
        SELECT t,
               MIN(CAST(ROUND(v*100) AS BIGINT)) OVER w AS mn,
               MAX(CAST(ROUND(v*100) AS BIGINT)) OVER w AS mx
        FROM df WINDOW w AS (PARTITION BY uid ORDER BY t
            ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
        ORDER BY t""").df()
    assert (got["roll_min_c"].to_numpy()
            == exp["mn"].to_numpy().astype(np.int64)).all()
    assert (got["roll_max_c"].to_numpy()
            == exp["mx"].to_numpy().astype(np.int64)).all()


def test_rolling_extremes_window_one_and_partition_independent():
    from fluent_bit_ray.dataops.windows import rolling_extremes

    rs = np.random.RandomState(12)
    df = pd.DataFrame({
        "uid": rs.randint(0, 5, 90).astype(np.int64),
        "t": np.arange(90, dtype=np.int64),
        "v": np.round(rs.uniform(0, 9, 90), 2),
    })
    one = (rolling_extremes(rd.from_pandas(df), "uid", ["t"], "v",
                            window=1, keep_cols=["t"], partitions=1)
           .to_pandas().sort_values("t").reset_index(drop=True))
    cents = np.round(df.sort_values("t")["v"].to_numpy() * 100).astype(
        np.int64)
    assert (one["roll_min_c"].to_numpy() == cents).all()
    assert (one["roll_max_c"].to_numpy() == cents).all()
    a = (rolling_extremes(rd.from_pandas(df), "uid", ["t"], "v",
                          window=3, keep_cols=["t"], partitions=2)
         .to_pandas().sort_values("t").reset_index(drop=True))
    b = (rolling_extremes(rd.from_pandas(df), "uid", ["t"], "v",
                          window=3, keep_cols=["t"], partitions=16)
         .to_pandas().sort_values("t").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_shift_chunked_matches_whole_key():
    """halo_chunk_exchange path: lag and lead over chunk-split keys
    (dense 0-based order) must equal the whole-key exchange, including
    a Zipf-hot key spanning many chunks."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    rng = np.random.default_rng(11)
    rows = []
    sizes = {"hot": 137, **{f"k{i}": int(rng.integers(1, 9))
                            for i in range(12)}}
    for k, m in sizes.items():
        for t in range(m):
            rows.append((k, t, float(rng.integers(0, 100))))
    df = pd.DataFrame(rows, columns=["k", "t", "v"]) \
        .sample(frac=1.0, random_state=5).reset_index(drop=True)
    ds = rd.from_pandas(df)

    for periods in (1, 2, -1, -3):
        base = shift_within_key(ds, key="k", order=["t"], cols=["v"],
                                periods=periods).to_pandas()
        chunked = shift_within_key(ds, key="k", order=["t"], cols=["v"],
                                   periods=periods,
                                   chunk_rows=16).to_pandas()
        key = ["k", "t"]
        b = base.sort_values(key).reset_index(drop=True)
        c = chunked.sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(c, b[c.columns])
