import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from fluent_bit_ray.sp import sp_execute, sp_parse


def mk_ds(n=200):
    ts = pd.to_datetime(1_448_403_340 + np.arange(n), unit="s")
    code = np.where(np.arange(n) % 3 == 0, 200, 500)
    return rd.from_arrow(pa.table({
        "tag": pa.array(["transcript.user" if i % 2 else "transcript.tool"
                         for i in range(n)]),
        "role": pa.array(["user" if i % 2 else "tool" for i in range(n)]),
        "p_code": pa.array(code, type=pa.int64()),
        "p_dur": pa.array((np.arange(n) % 10) / 10.0, type=pa.float64()),
        "ts": pa.array(ts, type=pa.timestamp("ns")),
    }))


def test_parse_full_query():
    q = sp_parse("CREATE STREAM s AS SELECT role, COUNT(*), AVG(dur) AS a "
                 "FROM TAG:'transcript.*' WHERE code = 200 "
                 "WINDOW TUMBLING (60 SECOND) GROUP BY role;")
    assert q.stream == "s"
    assert q.from_tag == "transcript.*"
    assert q.window == ("TUMBLING", 60, 60)
    assert q.group_by == ["role"]
    assert q.select[1] == {"kind": "agg", "fn": "COUNT", "key": "*",
                           "alias": "COUNT(*)"}
    assert q.select[2]["alias"] == "a"


def test_parse_invalid():
    with pytest.raises(ValueError):
        sp_parse("SELEKT x FROM TAG:'a'")
    with pytest.raises(ValueError):
        sp_parse("SELECT x FROM TAG:'a' WINDOW HOPPING (5 SECOND)")


def test_non_aggregate_select_where():
    out = sp_execute(mk_ds(), "SELECT role, p_code AS code FROM "
                     "TAG:'*.tool' WHERE p_code = 200").to_pandas()
    assert set(out.columns) == {"role", "code"}
    assert (out["role"] == "tool").all()
    assert (out["code"] == 200).all()
    # tool rows are even i; code=200 at i%3==0 → i%6==0
    assert len(out) == len([i for i in range(200) if i % 2 == 0 and i % 3 == 0])


def test_condition_tree():
    out = sp_execute(mk_ds(), "SELECT role FROM TAG:'*' WHERE "
                     "(p_code = 200 AND p_dur >= 0.5) OR NOT role = 'user'") \
        .to_pandas()
    exp = 0
    for i in range(200):
        code = 200 if i % 3 == 0 else 500
        dur = (i % 10) / 10.0
        role = "user" if i % 2 else "tool"
        if (code == 200 and dur >= 0.5) or role != "user":
            exp += 1
    assert len(out) == exp


def test_tumbling_window_aggregate():
    res = sp_execute(mk_ds(), "SELECT role, COUNT(*) AS n, SUM(p_dur) AS sd, "
                     "MIN(p_code) AS mn, MAX(p_code) AS mx, AVG(p_dur) AS ad "
                     "FROM TAG:'transcript.*' "
                     "WINDOW TUMBLING (60 SECOND) GROUP BY role")
    # reference computation in pandas
    df = mk_ds().to_pandas()
    df["w"] = df["ts"].dt.floor("60s")
    exp = (df.groupby(["w", "role"])
           .agg(n=("p_code", "size"), sd=("p_dur", "sum"),
                mn=("p_code", "min"), mx=("p_code", "max"),
                ad=("p_dur", "mean")).reset_index()
           .sort_values(["w", "role"]).reset_index(drop=True))
    assert len(res) == len(exp)
    assert res["n"].tolist() == exp["n"].tolist()
    assert np.allclose(res["sd"], exp["sd"])
    assert np.allclose(res["ad"], exp["ad"])
    assert res["mn"].tolist() == exp["mn"].tolist()


def test_hopping_window():
    res = sp_execute(mk_ds(120), "SELECT COUNT(*) AS n FROM TAG:'*' "
                     "WINDOW HOPPING (60 SECOND, ADVANCE BY 30 SECOND)")
    df = mk_ds(120).to_pandas()
    epoch = df["ts"].astype("int64") // 10**9
    rows = {}
    for t in epoch:
        base = (t // 30) * 30
        for k in range(2):  # ceil(60/30)
            start = base - k * 30
            if t < start + 60:
                rows[start] = rows.get(start, 0) + 1
    exp = pd.Series(rows).sort_index()
    assert res["n"].tolist() == exp.tolist()
    # each row lands in exactly 2 windows
    assert res["n"].sum() == 2 * 120


def test_count_no_group_no_window():
    res = sp_execute(mk_ds(), "SELECT COUNT(*) AS n FROM TAG:'*' "
                     "WHERE p_code = 500")
    assert res["n"].iloc[0] == len([i for i in range(200) if i % 3 != 0])


def test_record_tag_function():
    out = sp_execute(mk_ds(10), "SELECT RECORD_TAG() AS t FROM TAG:'*.user'") \
        .to_pandas()
    assert (out["t"] == "transcript.user").all()


def test_stream_chaining():
    ds = mk_ds()
    s1 = sp_execute(ds, "CREATE STREAM ok AS SELECT role, p_dur, ts "
                    "FROM TAG:'*' WHERE p_code = 200")
    res = sp_execute(None, "SELECT COUNT(*) AS n FROM STREAM:ok",
                     streams={"ok": s1})
    assert res["n"].iloc[0] == len([i for i in range(200) if i % 3 == 0])


def test_forecast_linear():
    # y = 3 + 2*x exactly → FORECAST(x, y, 5) at max_x+5 must be exact
    import pyarrow as pa
    n = 50
    x = np.arange(n, dtype=float)
    y = 3.0 + 2.0 * x
    ds = rd.from_arrow(pa.table({
        "tag": pa.array(["t.a"] * n),
        "p_x": pa.array(x), "p_y": pa.array(y),
        "ts": pa.array(pd.to_datetime(1_448_403_340 + np.arange(n), unit="s"),
                       type=pa.timestamp("ns")),
    }))
    res = sp_execute(ds, "SELECT FORECAST(p_x, p_y, 5) AS f FROM TAG:'*'")
    assert res["f"].iloc[0] == pytest.approx(3.0 + 2.0 * (49 + 5))
    # FORECAST_R: x at which y reaches 103 → (103-3)/2 = 50
    res2 = sp_execute(ds, "SELECT FORECAST_R(p_x, p_y, 103, 1000) AS r "
                      "FROM TAG:'*'")
    assert res2["r"].iloc[0] == pytest.approx(50.0)
    # cap applies
    res3 = sp_execute(ds, "SELECT FORECAST_R(p_x, p_y, 103, 20) AS r "
                      "FROM TAG:'*'")
    assert res3["r"].iloc[0] == pytest.approx(20.0)


def test_now_and_unix_timestamp():
    out = sp_execute(mk_ds(5), "SELECT NOW() AS now, UNIX_TIMESTAMP() AS ut, "
                     "role FROM TAG:'*'", now=1448403340).to_pandas()
    assert (out["now"] == "2015-11-24 22:15:40").all()
    assert (out["ut"] == 1448403340).all()


def test_snapshot_create_and_flush():
    from fluent_bit_ray.sp import sp_snapshot
    snaps = {}
    ds = mk_ds(100)
    created = sp_snapshot(ds, "CREATE SNAPSHOT recent AS SELECT * FROM "
                          "TAG:'transcript.*' LIMIT 10", snaps)
    assert created.count() == 10
    # LIMIT keeps the LAST 10 rows by event time
    mx = max(r["ts"] for r in created.take_all())
    assert mx == max(r["ts"] for r in ds.take_all())
    flushed = sp_snapshot(None, "FLUSH SNAPSHOT recent AS SELECT * FROM "
                          "TAG:'*' WHERE p_code = 200", snaps)
    assert all(r["p_code"] == 200 for r in flushed.take_all())
    assert "recent" not in snaps
    with pytest.raises(ValueError):
        sp_snapshot(None, "FLUSH SNAPSHOT recent AS SELECT * FROM TAG:'*'",
                    snaps)


def test_subkey_select_and_where():
    # reference SP select_subkeys: dotted path into the nested record map
    from fluent_bit_ray.record import fields_dumps
    t = pa.table({
        "tag": pa.array(["a.b"] * 3),
        "fields": pa.array([fields_dumps({"log": {"nested": True, "seq": i}})
                            for i in range(3)], type=pa.large_string()),
        "ts": pa.array(pd.to_datetime([0, 1, 2], unit="s"),
                       type=pa.timestamp("ns")),
    })
    ds = rd.from_arrow(t)
    out = sp_execute(ds, "SELECT log.seq AS s FROM TAG:'*' "
                     "WHERE log.seq >= 1").to_pandas()
    assert sorted(out["s"].tolist()) == [1, 2]


def test_sessionize():
    from fluent_bit_ray.sp.sessions import sessionize
    base = 1_448_403_340
    rows = [  # user 1: two sessions (gap 3600 > 1800); user 2: one
        (1, base), (1, base + 60), (1, base + 120),
        (1, base + 120 + 3600), (1, base + 120 + 3660),
        (2, base), (2, base + 1700),
    ]
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "ts": pa.array(pd.to_datetime([r[1] for r in rows], unit="s"),
                       type=pa.timestamp("ns")),
        "event_id": pa.array(range(len(rows)), type=pa.int64()),
    })
    out = sessionize(rd.from_arrow(t), gap_s=1800,
                     tie_col="event_id").to_pandas() \
        .sort_values(["user_id", "session_idx"]).reset_index(drop=True)
    assert out["n_events"].tolist() == [3, 2, 2]
    assert out["session_idx"].tolist() == [0, 1, 0]
    assert out.loc[1, "session_start"].timestamp() == base + 120 + 3600


def test_key_vs_key_comparison():
    t = pa.table({
        "tag": pa.array(["x.y"] * 4),
        "p_a": pa.array([1, 5, 3, None], type=pa.int64()),
        "p_b": pa.array([2, 4, 3, 7], type=pa.int64()),
        "ts": pa.array(pd.to_datetime([0, 1, 2, 3], unit="s"),
                       type=pa.timestamp("ns")),
    })
    ds = rd.from_arrow(t)
    out = sp_execute(ds, "SELECT p_a FROM TAG:'*' WHERE p_a > p_b").to_pandas()
    assert out["p_a"].tolist() == [5]
    out2 = sp_execute(ds, "SELECT p_a FROM TAG:'*' WHERE p_a = p_b").to_pandas()
    assert out2["p_a"].tolist() == [3]


def test_bool_literal_condition():
    from fluent_bit_ray.record import fields_dumps
    t = pa.table({
        "tag": pa.array(["x.y"] * 3),
        "fields": pa.array([fields_dumps({"flag": True}),
                            fields_dumps({"flag": False}),
                            fields_dumps({})], type=pa.large_string()),
        "ts": pa.array(pd.to_datetime([0, 1, 2], unit="s"),
                       type=pa.timestamp("ns")),
    })
    out = sp_execute(rd.from_arrow(t),
                     "SELECT flag FROM TAG:'*' WHERE flag = true").to_pandas()
    assert out["flag"].tolist() == [True]


def test_arith_select_expression():
    ds = mk_ds(30)
    out = sp_execute(ds, "SELECT role, code * 2 + 1 AS c2 "
                         "FROM TAG:'transcript.*'").to_pandas()
    assert len(out) == 30
    assert set(out["c2"]) == {401.0, 1001.0}


def test_arith_where_expression():
    ds = mk_ds(30)
    # dur * 10 > 5  → dur in {0.6..0.9}
    out = sp_execute(ds, "SELECT role FROM TAG:'transcript.*' "
                         "WHERE dur * 10 > 5").to_pandas()
    expect = sum(1 for i in range(30) if (i % 10) / 10.0 * 10 > 5)
    assert len(out) == expect
    # parenthesized arithmetic on the left + arithmetic on the right
    out2 = sp_execute(ds, "SELECT role FROM TAG:'transcript.*' "
                          "WHERE (code + 100) * 2 = 600 + 0").to_pandas()
    assert len(out2) == sum(1 for i in range(30) if i % 3 == 0)


def test_arith_aggregate_expression():
    ds = mk_ds(60)
    res = sp_execute(ds, "SELECT role, SUM(code * 2 + dur) AS load "
                         "FROM TAG:'transcript.*' GROUP BY role")
    ref = pd.DataFrame({
        "role": ["user" if i % 2 else "tool" for i in range(60)],
        "v": [(200 if i % 3 == 0 else 500) * 2 + (i % 10) / 10.0
              for i in range(60)]})
    expect = ref.groupby("role")["v"].sum()
    got = dict(zip(res["role"], res["load"]))
    for r in ("user", "tool"):
        assert got[r] == pytest.approx(expect[r])


def test_arith_unary_minus_and_division():
    ds = mk_ds(10)
    out = sp_execute(ds, "SELECT code / -2 AS h FROM TAG:'transcript.*' "
                         "WHERE code = 200").to_pandas()
    assert set(out["h"]) == {-100.0}


def test_parenthesized_condition_still_parses():
    ds = mk_ds(30)
    out = sp_execute(ds, "SELECT role FROM TAG:'transcript.*' "
                         "WHERE (code = 200 AND dur > 0.1) OR role = 'user'") \
        .to_pandas()
    expect = sum(1 for i in range(30)
                 if ((200 if i % 3 == 0 else 500) == 200
                     and (i % 10) / 10.0 > 0.1) or (i % 2 == 1))
    assert len(out) == expect


def test_expression_hypothesis_vs_pandas():
    """Property test: random arithmetic expressions over record keys
    must evaluate exactly as the equivalent pandas expression."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from fluent_bit_ray.sp.engine import _expr_series, parse_expression

    ds_tbl = pa.table({
        "p_a": pa.array([1.0, 2.5, -3.0, 0.0, 7.25], type=pa.float64()),
        "p_b": pa.array([2, -1, 4, 5, 0], type=pa.int64()),
    })

    leaf = st.sampled_from(["a", "b", "2", "3.5", "-4"])
    op = st.sampled_from([" + ", " - ", " * ", " / ", " % "])

    @st.composite
    def expr(draw, depth=0):
        if depth >= 3 or draw(st.booleans()):
            return draw(leaf)
        l = draw(expr(depth=depth + 1))  # noqa: E741
        r = draw(expr(depth=depth + 1))
        e = l + draw(op) + r
        return "(" + e + ")" if draw(st.booleans()) else e

    import pandas as pd

    # dtypes mirror the table: p_a float64, p_b int64 (mod/div
    # semantics differ on signed zeros between int and float)
    cols = {"a": pd.Series([1.0, 2.5, -3.0, 0.0, 7.25]),
            "b": pd.Series([2, -1, 4, 5, 0], dtype="int64")}

    def ref_eval(tree):
        kind = tree[0]
        if kind == "lit":
            return tree[1]  # raw int/float, like the engine (int-zero
                            # sign semantics differ from float zero)
        if kind == "key":
            return cols[tree[1]]
        o, lt, rt = tree[1], tree[2], tree[3]
        if o == "neg":
            return -ref_eval(lt)
        a_, b_ = ref_eval(lt), ref_eval(rt)
        if not hasattr(a_, "index") and not hasattr(b_, "index"):
            a_, b_ = np.float64(a_), np.float64(b_)
        with np.errstate(invalid="ignore", divide="ignore"):
            return {"+": a_ + b_, "-": a_ - b_, "*": a_ * b_,
                    "/": a_ / b_, "%": a_ % b_}[o]

    @settings(max_examples=150, deadline=None, derandomize=True)
    @given(expr())
    def check(e):
        tree = parse_expression(e)
        got = _expr_series(tree, ds_tbl)
        want = ref_eval(tree)
        if not isinstance(want, pd.Series):
            want = pd.Series([float(want)] * 5)
        g = got.to_numpy(dtype=float)
        w = want.to_numpy(dtype=float)
        assert ((g == w) | (np.isnan(g) & np.isnan(w))).all(), (e, g, w)

    check()


def test_sp_limit_projection_and_aggregate():
    tagged_ds = mk_ds()
    # projection LIMIT: deterministic order contract — sorted by all
    # output columns, first n
    out = sp_execute(tagged_ds,
                     "SELECT role, p_dur AS d FROM TAG:'transcript.*' "
                     "WHERE p_code = 200 LIMIT 3").to_pandas()
    assert len(out) == 3
    full = sp_execute(tagged_ds,
                      "SELECT role, p_dur AS d FROM TAG:'transcript.*' "
                      "WHERE p_code = 200").to_pandas()
    exp = full.sort_values(["role", "d"]).head(3)
    assert out.sort_values(["role", "d"]).values.tolist() == \
        exp.values.tolist()
    # aggregate LIMIT caps emitted group rows after the key sort
    agg = sp_execute(tagged_ds,
                     "SELECT role, COUNT(*) AS n FROM TAG:'transcript.*' "
                     "GROUP BY role LIMIT 2")
    agg_full = sp_execute(tagged_ds,
                          "SELECT role, COUNT(*) AS n "
                          "FROM TAG:'transcript.*' GROUP BY role")
    assert len(agg) == 2
    assert agg["role"].tolist() == \
        sorted(agg_full["role"].tolist())[:2]


def mk_fields_ds():
    import json
    ts = pd.to_datetime(1_448_403_340 + np.arange(6), unit="s")
    fields = [json.dumps(d) for d in [
        {"level": "info"}, {}, {"nest": {"level": "warn"}},
        {"level": None}, {"other": 1}, {"level": "error"},
    ]]
    return rd.from_arrow(pa.table({
        "tag": pa.array(["transcript.user"] * 6),
        "role": pa.array(list("abcdef")),
        "fields": pa.array(fields),
        "ts": pa.array(ts, type=pa.timestamp("ns")),
    }))


def test_record_contains_function():
    ds = mk_fields_ds()
    # fields-map key membership: present even when the value is null
    # (rows 0, 3, 5), dotted path walks nesting (row 2)
    out = sp_execute(ds, "SELECT role FROM TAG:'*' "
                         "WHERE @RECORD.CONTAINS(level)").to_pandas()
    assert sorted(out["role"]) == ["a", "d", "f"]
    out = sp_execute(ds, "SELECT role FROM TAG:'*' "
                         "WHERE @RECORD.CONTAINS(nest.level)").to_pandas()
    assert sorted(out["role"]) == ["c"]
    # promoted/fixed column: presence = non-null; composition with NOT
    out = sp_execute(mk_ds(6), "SELECT role FROM TAG:'*' "
                               "WHERE NOT @RECORD.CONTAINS(p_code)") \
        .to_pandas()
    assert len(out) == 0


def test_record_time_function():
    ds = mk_fields_ds()
    out = sp_execute(ds, "SELECT role FROM TAG:'*' "
                         "WHERE @RECORD.TIME() >= 1448403342").to_pandas()
    assert sorted(out["role"]) == ["c", "d", "e", "f"]
    out = sp_execute(ds, "SELECT role FROM TAG:'*' "
                         "WHERE @RECORD.CONTAINS(level) "
                         "AND @RECORD.TIME() < 1448403341").to_pandas()
    assert sorted(out["role"]) == ["a"]


def test_create_stream_with_properties():
    q = sp_parse("CREATE STREAM s WITH (tag='mydata', routable=false) AS "
                 "SELECT role FROM TAG:'*'")
    assert q.props == {"tag": "mydata", "routable": "false"}
    assert q.stream_tag == "mydata" and not q.routable
    # default tag = stream name (instance-alias default); routable on
    q2 = sp_parse("CREATE STREAM s AS SELECT role FROM TAG:'*'")
    assert q2.stream_tag == "s" and q2.routable
    # execution re-tags the emitted records
    ds = mk_ds(6)
    out = sp_execute(ds, "CREATE STREAM s WITH (tag='mydata') AS "
                         "SELECT role, tag FROM TAG:'*'").to_pandas()
    assert (out["tag"] == "mydata").all() and len(out) == 6
    agg = sp_execute(ds, "CREATE STREAM s AS "
                         "SELECT role, COUNT(*) AS n FROM TAG:'*' "
                         "GROUP BY role")
    assert (agg["tag"] == "s").all()
