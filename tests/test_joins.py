"""Join operators: broadcast / hash / as-of vs pandas ground truth."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from fluent_bit_ray.joins import asof_join, broadcast_join, hash_join


def _frames(seed=7, n=500, keys=20):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame({"k": rng.integers(0, keys, n), "x": np.arange(n)})
    right = pd.DataFrame({"k": np.arange(keys - 5),
                          "y": np.arange(keys - 5) * 10,
                          "x": np.arange(keys - 5) + 100})
    return left, right


def _norm(df):
    return (df.sort_index(axis=1)
            .sort_values(list(sorted(df.columns)), kind="mergesort")
            .reset_index(drop=True))


def test_broadcast_join_inner_and_left():
    left, right = _frames()
    exp_r = right.rename(columns={"x": "x_r"})
    for how in ("inner", "left"):
        got = broadcast_join(rd.from_pandas(left), right, on="k",
                             how=how).to_pandas()
        exp = left.merge(exp_r, on="k", how=how, sort=False)
        pd.testing.assert_frame_equal(_norm(got), _norm(exp))


def test_broadcast_join_right_on_and_dataset_small_side():
    left, right = _frames()
    r2 = right.rename(columns={"k": "rk"})
    got = broadcast_join(rd.from_pandas(left), rd.from_pandas(r2),
                         on="k", right_on="rk").to_pandas()
    exp = left.merge(right.rename(columns={"x": "x_r"}), on="k")
    pd.testing.assert_frame_equal(_norm(got), _norm(exp))


def test_hash_join_inner_matches_pandas():
    left, right = _frames()
    got = hash_join(rd.from_pandas(left), rd.from_pandas(right), on="k",
                    num_partitions=4).to_pandas()
    exp = left.merge(right.rename(columns={"x": "x_r"}), on="k")
    pd.testing.assert_frame_equal(_norm(got), _norm(exp))


@pytest.mark.parametrize("how", ["left_semi", "left_anti"])
def test_hash_join_semi_anti(how):
    left, right = _frames()
    got = hash_join(rd.from_pandas(left), rd.from_pandas(right), on="k",
                    how=how, num_partitions=4).to_pandas()
    mask = left["k"].isin(right["k"])
    exp = left[mask if how == "left_semi" else ~mask]
    pd.testing.assert_frame_equal(_norm(got), _norm(exp))


def _events(seed=3, n=400, users=8):
    rng = np.random.default_rng(seed)
    ev = pd.DataFrame({"u": rng.integers(0, users, n),
                       "t": rng.integers(0, 10_000, n).astype("int64"),
                       "eid": np.arange(n)})
    lhs = ev.iloc[: n // 2].reset_index(drop=True)
    rhs = (ev.iloc[n // 2:].reset_index(drop=True)
           .rename(columns={"eid": "reid"}))
    rhs["rt"] = rhs["t"]
    return lhs, rhs


def _asof_truth(lhs, rhs, direction="backward", how="inner"):
    l2 = lhs.sort_values("t", kind="mergesort")
    r2 = rhs.sort_values(["t", "reid"], kind="mergesort")
    exp = pd.merge_asof(l2, r2, on="t", by="u", direction=direction)
    if how == "inner":
        exp = exp.dropna(subset=["reid"]).copy()
        exp["reid"] = exp["reid"].astype("int64")
        exp["rt"] = exp["rt"].astype("int64")
    return exp


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_asof_join_directions_match_merge_asof(direction):
    lhs, rhs = _events()
    got = asof_join(rd.from_pandas(lhs), rd.from_pandas(rhs), on="t",
                    by="u", direction=direction, tie_break="reid",
                    partitions=5).to_pandas()
    exp = _asof_truth(lhs, rhs, direction)
    pd.testing.assert_frame_equal(_norm(got), _norm(exp))


def test_asof_join_left_keeps_unmatched():
    lhs, rhs = _events()
    got = asof_join(rd.from_pandas(lhs), rd.from_pandas(rhs), on="t",
                    by="u", tie_break="reid", how="left",
                    partitions=5).to_pandas()
    assert len(got) == len(lhs)
    exp = _asof_truth(lhs, rhs, how="left")
    assert int(got["reid"].isna().sum()) == int(exp["reid"].isna().sum())


def test_asof_join_tie_break_picks_max():
    # two right rows at the same (u, t): the greater reid must win
    lhs = pd.DataFrame({"u": [1], "t": [100], "eid": [0]})
    rhs = pd.DataFrame({"u": [1, 1], "t": [50, 50], "reid": [9, 4],
                        "rt": [50, 50]})
    got = asof_join(rd.from_pandas(lhs), rd.from_pandas(rhs), on="t",
                    by="u", tie_break="reid", partitions=3).to_pandas()
    assert got["reid"].tolist() == [9]


def test_asof_join_collision_suffix_and_empty_side():
    lhs, rhs = _events()
    rhs2 = rhs.rename(columns={"rt": "t2"}).assign(eid=lambda d: d.reid)
    got = asof_join(rd.from_pandas(lhs), rd.from_pandas(rhs2), on="t",
                    by="u", tie_break="reid", partitions=3).to_pandas()
    assert sorted(got.columns) == ["eid", "eid_r", "reid", "t", "t2", "u"]
    # no right rows at all -> inner result is empty but typed
    empty = rhs.iloc[:0]
    got0 = asof_join(rd.from_pandas(lhs), rd.from_pandas(empty), on="t",
                     by="u", partitions=3).to_pandas()
    assert len(got0) == 0


def test_asof_join_string_by_key():
    lhs, rhs = _events()
    lhs = lhs.assign(u=lhs["u"].map("user{}".format))
    rhs = rhs.assign(u=rhs["u"].map("user{}".format))
    got = asof_join(rd.from_pandas(lhs), rd.from_pandas(rhs), on="t",
                    by="u", tie_break="reid", partitions=4).to_pandas()
    exp = _asof_truth(lhs, rhs)
    pd.testing.assert_frame_equal(_norm(got), _norm(exp))


def _ranges(seed=11, n=300, m=80, users=6):
    rng = np.random.default_rng(seed)
    lhs = pd.DataFrame({"u": rng.integers(0, users, n),
                        "t": rng.integers(0, 5000, n).astype("int64"),
                        "eid": np.arange(n)})
    lo = rng.integers(0, 4900, m).astype("int64")
    rhs = pd.DataFrame({"u": rng.integers(0, users, m), "lo": lo,
                        "hi": lo + rng.integers(1, 100, m),
                        "iid": np.arange(m)})
    return lhs, rhs


def test_range_join_by_key_matches_pandas():
    from fluent_bit_ray.joins import range_join
    lhs, rhs = _ranges()
    got = range_join(rd.from_pandas(lhs), rd.from_pandas(rhs), "t",
                     "lo", "hi", by="u", partitions=5).to_pandas()
    exp = lhs.merge(rhs, on="u", how="inner")
    exp = exp[(exp.t >= exp.lo) & (exp.t < exp.hi)]
    cols = ["u", "t", "eid", "lo", "hi", "iid"]
    pd.testing.assert_frame_equal(
        got.sort_values(["eid", "iid"]).reset_index(drop=True)[cols],
        exp.sort_values(["eid", "iid"]).reset_index(drop=True)[cols])


def test_range_join_bucketed_no_key():
    from fluent_bit_ray.joins import range_join
    lhs, rhs = _ranges()
    rhs = rhs.drop(columns=["u"])
    got = range_join(rd.from_pandas(lhs), rd.from_pandas(rhs), "t",
                     "lo", "hi", partitions=7).to_pandas()
    exp = lhs.merge(rhs, how="cross")
    exp = exp[(exp.t >= exp.lo) & (exp.t < exp.hi)]
    cols = ["u", "t", "eid", "lo", "hi", "iid"]
    pd.testing.assert_frame_equal(
        got.sort_values(["eid", "iid"]).reset_index(drop=True)[cols],
        exp.sort_values(["eid", "iid"]).reset_index(drop=True)[cols])
    # an interval spanning a bucket boundary still matches exactly once
    wide = pd.DataFrame({"lo": [95], "hi": [105], "iid": [0]})
    pts = pd.DataFrame({"t": [94, 95, 99, 100, 104, 105],
                        "eid": np.arange(6)})
    got2 = range_join(rd.from_pandas(pts), rd.from_pandas(wide), "t",
                      "lo", "hi", partitions=3, bucket=10).to_pandas()
    assert sorted(got2["eid"]) == [1, 2, 3, 4]


def test_range_join_timestamps_and_empty():
    from fluent_bit_ray.joins import range_join
    lhs, rhs = _ranges()
    lts = lhs.assign(t=pd.to_datetime(lhs.t, unit="s"))
    rts = rhs.assign(lo=pd.to_datetime(rhs.lo, unit="s"),
                     hi=pd.to_datetime(rhs.hi, unit="s"))
    got = range_join(rd.from_pandas(lts), rd.from_pandas(rts), "t",
                     "lo", "hi", by="u", partitions=4).to_pandas()
    exp = lhs.merge(rhs, on="u", how="inner")
    assert len(got) == len(exp[(exp.t >= exp.lo) & (exp.t < exp.hi)])
    got0 = range_join(rd.from_pandas(lts), rd.from_pandas(rts.iloc[:0]),
                      "t", "lo", "hi", by="u", partitions=4,
                      bucket=1).to_pandas()
    assert len(got0) == 0
