import json

import numpy as np
import pyarrow as pa
import pytest

from fluent_bit_ray.record import fields_dumps, fields_loads
from fluent_bit_ray.stages import build_stage
from fluent_bit_ray.stages.misc import ExpectViolation


def mk_batch(rows):
    """rows: list of dicts; 'fields' dict is JSON-encoded."""
    cols = {}
    keys = []
    for r in rows:
        for k in r:
            if k not in keys:
                keys.append(k)
    for k in keys:
        vals = [r.get(k) for r in rows]
        if k == "fields":
            vals = [fields_dumps(v) if isinstance(v, dict) else v for v in vals]
            cols[k] = pa.array(vals, type=pa.large_string())
        else:
            cols[k] = pa.array(vals)
    return pa.table(cols)


def fields_of(batch):
    return [fields_loads(v) for v in batch.column("fields").to_pylist()]


# ---------------------------------------------------------------- grep
def test_grep_regex_keeps_matching():
    # mirrors tests/runtime/filter_grep.c: Regex val 1 over {"val": i*i}
    b = mk_batch([{"text": str(i * i)} for i in range(1, 11)])
    st = build_stage({"type": "grep", "rules": [("regex", "$text", "1")]})
    out = st(b)
    vals = out.column("text").to_pylist()
    assert vals == [v for v in (str(i * i) for i in range(1, 11)) if "1" in v]


def test_grep_exclude():
    b = mk_batch([{"text": str(i * i)} for i in range(1, 11)])
    st = build_stage({"type": "grep", "rules": [("exclude", "$text", "1")]})
    out = st(b)
    vals = out.column("text").to_pylist()
    assert vals == [v for v in (str(i * i) for i in range(1, 11)) if "1" not in v]


def test_grep_rule_order_first_decisive_wins():
    b = mk_batch([{"text": "ab"}, {"text": "a"}, {"text": "b"}, {"text": "c"}])
    # exclude b → drops "ab","b"; then regex a keeps "a", drops "c"
    st = build_stage({"type": "grep", "rules": [("exclude", "$text", "b"),
                                               ("regex", "$text", "a")]})
    assert st(b).column("text").to_pylist() == ["a"]
    # reversed: regex a decides everything first (keep a*, drop rest);
    # exclude never runs
    st2 = build_stage({"type": "grep", "rules": [("regex", "$text", "a"),
                                                 ("exclude", "$text", "b")]})
    assert st2(b).column("text").to_pylist() == ["ab", "a"]


def test_grep_on_fields_key():
    b = mk_batch([{"text": "x", "fields": {"level": "error"}},
                  {"text": "y", "fields": {"level": "info"}},
                  {"text": "z", "fields": {}}])
    st = build_stage({"type": "grep", "rules": [("regex", "$level", "^err")]})
    assert st(b).column("text").to_pylist() == ["x"]


# -------------------------------------------------------------- modify
def test_modify_rules_matrix():
    b = mk_batch([{"fields": {"a": "1", "b": "2", "prefix_x": "3"}}])
    st = build_stage({"type": "modify", "rules": [
        ("rename", "a", "a2"),        # ok: a exists, a2 absent
        ("rename", "b", "a2"),        # no-op: conflict
        ("add", "c", "9"),            # added
        ("add", "b", "NO"),           # no-op: exists
        ("set", "b", "22"),           # upsert → moves to end
        ("remove_wildcard", "prefix_"),
        ("copy", "c", "c2"),
    ]})
    f = fields_of(st(b))[0]
    assert f == {"a2": "1", "c": "9", "c2": "9", "b": "22"}
    # insertion order: copy lands right after source; set appends at end
    assert list(f) == ["a2", "c", "c2", "b"]


def test_modify_hard_rename_and_conditions():
    b = mk_batch([{"fields": {"k": "v", "old": "1", "new": "2"}},
                  {"fields": {"old": "1", "new": "2"}}])
    st = build_stage({"type": "modify",
                      "conditions": [("key_exists", "k")],
                      "rules": [("hard_rename", "old", "new")]})
    f = fields_of(st(b))
    assert f[0] == {"k": "v", "new": "1"}   # condition held → hard rename
    assert f[1] == {"old": "1", "new": "2"}  # condition failed → untouched


def test_modify_condition_kinds():
    st = build_stage({"type": "modify",
                      "conditions": [("key_value_equals", "x", "1"),
                                     ("a_key_matches", "^pre"),
                                     ("key_value_matches", "y", r"\d+")],
                      "rules": [("add", "hit", "yes")]})
    b = mk_batch([{"fields": {"x": "1", "prefix": "p", "y": "42"}},
                  {"fields": {"x": "2", "prefix": "p", "y": "42"}}])
    f = fields_of(st(b))
    assert f[0].get("hit") == "yes"
    assert "hit" not in f[1]


# ------------------------------------------------------ record_modifier
def test_record_modifier():
    b = mk_batch([{"fields": {"a": "1", "b": "2", "c": "3"}}])
    st = build_stage({"type": "record_modifier", "remove_keys": ["b"],
                      "records": [("host", "node-1")]})
    assert fields_of(st(b))[0] == {"a": "1", "c": "3", "host": "node-1"}

    st2 = build_stage({"type": "record_modifier", "whitelist_keys": ["a"]})
    assert fields_of(st2(b))[0] == {"a": "1"}

    with pytest.raises(ValueError):
        build_stage({"type": "record_modifier", "remove_keys": ["a"],
                     "whitelist_keys": ["b"]})


# ---------------------------------------------------------------- nest
def test_nest_and_lift():
    b = mk_batch([{"fields": {"k1": "a", "nest_one": "1", "nest_two": "2"}}])
    st = build_stage({"type": "nest", "operation": "nest",
                      "wildcard": ["nest_*"], "nest_under": "sub",
                      "remove_prefix": "nest_"})
    f = fields_of(st(b))[0]
    assert f == {"k1": "a", "sub": {"one": "1", "two": "2"}}

    b2 = mk_batch([{"fields": f}])
    st2 = build_stage({"type": "nest", "operation": "lift",
                       "nested_under": "sub", "add_prefix": "up_"})
    assert fields_of(st2(b2))[0] == {"k1": "a", "up_one": "1", "up_two": "2"}


# -------------------------------------------------------------- parser
def test_parser_stage_first_success_and_promote():
    from fluent_bit_ray.parsers.core import TOOLCALL_PATTERN
    b = mk_batch([
        {"text": 'CALL bash({"a": 1}) -> ok', "role": "tool"},
        {"text": 'level=info code=200 dur=0.5', "role": "user"},
        {"text": 'just free text', "role": "user"},
    ])
    st = build_stage({"type": "parser", "key_name": "text",
                      "parsers": [
                          {"name": "toolcall", "format": "regex",
                           "regex": TOOLCALL_PATTERN},
                          {"name": "logfmt", "format": "logfmt",
                           "types": {"code": "integer", "dur": "float"}},
                      ],
                      "promote": {"code": "int64", "calltool": "string"}})
    out = st(b)
    assert out.column("parsed_by").to_pylist() == ["toolcall", "logfmt", ""]
    f = fields_of(out)
    assert f[0]["calltool"] == "bash" and f[0]["status"] == "ok"
    assert f[1]["code"] == 200 and f[1]["dur"] == 0.5
    assert out.column("p_code").to_pylist() == [None, 200, None]
    assert out.column("p_calltool").to_pylist() == ["bash", None, None]
    # text column untouched (invariant)
    assert out.column("text").to_pylist() == b.column("text").to_pylist()


def test_parser_stage_reserve_data_false():
    b = mk_batch([{"text": "k=v", "fields": {"keepme": "1"}}])
    st = build_stage({"type": "parser", "key_name": "text",
                      "reserve_data": False,
                      "parsers": [{"name": "lf", "format": "logfmt"}]})
    assert fields_of(st(b))[0] == {"k": "v"}
    st2 = build_stage({"type": "parser", "key_name": "text",
                       "parsers": [{"name": "lf", "format": "logfmt"}]})
    assert fields_of(st2(b))[0] == {"k": "v", "keepme": "1"}


# ---------------------------------------------------------- misc stages
def test_alter_size_and_expect():
    b = mk_batch([{"fields": {"a": "1", "b": "2"}}])
    st = build_stage({"type": "alter_size", "add": 3})
    f = fields_of(st(b))[0]
    assert len(f) == 5 and f["key_0"] == "test_value"

    st2 = build_stage({"type": "alter_size", "remove": 1})
    assert fields_of(st2(b))[0] == {"b": "2"}

    ok = build_stage({"type": "expect", "checks": [("key_exists", "a")]})
    ok(b)  # no raise
    bad = build_stage({"type": "expect", "checks": [("key_exists", "zz")]})
    with pytest.raises(ExpectViolation):
        bad(b)


def test_py_udf():
    b = mk_batch([{"text": "a", "fields": {"n": 1}},
                  {"text": "b", "fields": {"n": 2}}])

    def fn(tag, ts, rec):
        if rec.get("n") == 1:
            return -1, rec          # drop
        rec["n2"] = rec["n"] * 10
        return 1, rec               # replace

    st = build_stage({"type": "py_udf", "fn": fn})
    out = st(b)
    assert out.column("text").to_pylist() == ["b"]
    assert fields_of(out)[0] == {"n": 2, "n2": 20}


# ------------------------------------------------------------- throttle
def test_tag_match_scoping():
    b = mk_batch([{"text": "11", "tag": "a.x"}, {"text": "11", "tag": "b.y"}])
    st = build_stage({"type": "grep", "match": "a.*",
                      "rules": [("exclude", "$text", "1")]})
    out = st(b)
    # only the a.x row was subject to the exclude
    assert out.column("tag").to_pylist() == ["b.y"]


# -------------------------------------------------------------- enrich
def test_lookup_enrich():
    b = mk_batch([{"tool": "bash"}, {"tool": ""}, {"tool": "search"}])
    st = build_stage({"type": "lookup_enrich", "dim": "dim_tools",
                      "lookup_key": "tool"})
    out = st(b)
    assert out.column("category").to_pylist() == ["exec", "Unknown", "retrieval"]
    assert out.column("risk").to_pylist() == [3, None, 1]


def test_ua_and_geo_enrich():
    b = mk_batch([{"p_agent": "Mozilla/5.0 (X11; Linux x86_64) Firefox/92.0",
                   "p_host": "10.0.1.2"},
                  {"p_agent": "curl/7.68.0", "p_host": "10.3.1.2"},
                  {"p_agent": None, "p_host": None}])
    ua = build_stage({"type": "ua_enrich", "lookup_key": "p_agent"})
    geo = build_stage({"type": "geoip_enrich", "lookup_key": "p_host"})
    out = geo(ua(b))
    assert out.column("ua_browser").to_pylist() == ["Firefox", "curl", "Unknown"]
    assert out.column("geo_city").to_pylist() == ["Amsterdam", "Unknown", "Unknown"]


def test_py_udf_ts_replacement():
    import pyarrow as pa
    b = mk_batch([{"text": "a", "ts": 1_000_000_000, "fields": {"n": 1}}])
    b = b.set_column(b.column_names.index("ts"), "ts",
                     b.column("ts").cast(pa.timestamp("ns")))

    def fn(tag, ts, rec):
        rec["seen"] = True
        return 1, 5_000_000_000, rec  # replace record AND event time

    st = build_stage({"type": "py_udf", "fn": fn})
    out = st(b)
    assert fields_loads(out.column("fields").to_pylist()[0])["seen"] is True
    assert out.column("event_ts").to_pylist()[0].timestamp() == 5.0


def test_url_normalize():
    b = mk_batch([{"p_path": "/api/v1/users/123/orders/456"},
                  {"p_path": "/health"},
                  {"p_path": "/items/деталь/9"}])
    st = build_stage({"type": "url_normalize", "column": "p_path"})
    out = st(b).column("p_path_norm").to_pylist()
    assert out == ["/api/v1/users/:id/orders/:id", "/health",
                   "/items/деталь/:id"]


def test_message_format():
    b = mk_batch([{"text": "x", "tag": "a.b",
                   "fields": {"level": "warn", "msg": "disk full"}}])
    st = build_stage({"type": "message_format",
                      "template": "[$TAG[1]] $level: $msg"})
    f = fields_of(st(b))[0]
    assert f["formatted"] == "[b] warn: disk full"


def test_wide_plus_rewrite_global_loop():
    # throttle (wide) + rewrite_tag → the pipeline's global re-entry path
    import pandas as pd
    import ray.data as rd
    from fluent_bit_ray.pipelines.pipeline import Pipeline
    n = 30
    t = pa.table({
        "conv_id": pa.array([f"c{i}" for i in range(n)]),
        "turn_idx": pa.array(list(range(n)), type=pa.int32()),
        "role": pa.array(["user"] * n),
        "text": pa.array((["keep me"] * 15 + ["retag me"] * 15)),
        "tool": pa.array([""] * n),
        "ts": pa.array([1448403340_000000000 + i * 10**9 for i in range(n)],
                       type=pa.timestamp("ns")),
    })
    p = Pipeline(stages=[
        {"type": "throttle", "rate": 1000, "interval_s": 60},  # wide, no-op
        {"type": "rewrite_tag", "match": "transcript.*",
         "rules": [("$text", "retag", "alert.x", True)]},
    ], sinks=[("all", "*"), ("alerts", "alert.*")], max_hops=2)
    counts = p.run(rd.from_arrow(t)).sink_counts()
    assert counts["alerts"] == 15
    assert counts["all"] == n + 15


def test_stdout_stage(capsys):
    b = mk_batch([{"text": "hello"}, {"text": "world"}])
    st = build_stage({"type": "stdout", "limit": 1})
    out = st(b)
    assert out.num_rows == 2  # pass-through
    assert "hello" in capsys.readouterr().out


def test_kubernetes_enrich_ttl_and_merge_log(tmp_path):
    import time

    dim = tmp_path / "kube.json"
    dim.write_text(json.dumps({"default:pod-a": {"app": "v1", "node": "n1"}}))
    st = build_stage({"type": "kubernetes_enrich", "dim_path": str(dim),
                      "ttl_s": 0.2, "merge_log": True, "keep_log": False})
    b = mk_batch([
        {"tag": "pod-a_default_main",
         "fields": {"log": '{"seq": 7}', "x": 1}},
        {"tag": "other", "fields": {}},
    ])
    out = st(b)
    assert out.column("kube_pod_name").to_pylist() == ["pod-a", None]
    assert out.column("kube_namespace").to_pylist() == ["default", None]
    assert out.column("kube_container").to_pylist() == ["main", None]
    assert out.column("kube_app").to_pylist() == ["v1", None]
    f0 = fields_loads(out.column("fields").to_pylist()[0])
    assert f0["seq"] == 7 and "log" not in f0 and f0["x"] == 1

    # dimension changes are invisible before the TTL, visible after —
    # the flb_hash TTL-eviction semantic (src/flb_hash.c:42-172)
    dim.write_text(json.dumps({"default:pod-a": {"app": "v2", "node": "n1"}}))
    assert st(b).column("kube_app").to_pylist()[0] == "v1"
    time.sleep(0.25)
    assert st(b).column("kube_app").to_pylist()[0] == "v2"


def test_kubernetes_merge_log_keeps_log_by_default(tmp_path):
    dim = tmp_path / "kube.json"
    dim.write_text(json.dumps({}))
    st = build_stage({"type": "kubernetes_enrich", "dim_path": str(dim),
                      "merge_log": True})
    b = mk_batch([{"tag": "p_ns_c", "fields": {"log": '{"a": 2}'}}])
    f0 = fields_loads(st(b).column("fields").to_pylist()[0])
    assert f0["log"] == '{"a": 2}' and f0["a"] == 2
    # non-JSON log stays untouched
    b2 = mk_batch([{"tag": "p_ns_c", "fields": {"log": "plain"}}])
    f2 = fields_loads(st(b2).column("fields").to_pylist()[0])
    assert f2 == {"log": "plain"}


def test_multiline_flush_gap():
    import pandas as pd
    import ray.data as rd

    # conv layout: firstline at t=0, continuations at 1s, 2s, then a
    # 100s quiet period → continuation after the gap is SOLO; a new
    # firstline later starts a fresh segment
    rows = [
        ("c1", 0, "1 start", 0),
        ("c1", 1, "cont a", 1),
        ("c1", 2, "cont b", 2),
        ("c1", 3, "cont after gap", 102),   # gap > 5 → buffer closed
        ("c1", 4, "another cont", 103),     # still no open buffer
        ("c1", 5, "2 new start", 104),
        ("c1", 6, "cont c", 105),
    ]
    ds = rd.from_pandas(pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "text", "sec"]).assign(
        ts=lambda d: pd.to_datetime(d["sec"], unit="s")))
    st = build_stage({"type": "multiline", "firstline": r"^\d",
                      "flush_gap_s": 5})
    out = st.apply(ds).to_pandas().sort_values("first_turn")
    assert out["first_turn"].tolist() == [0, 3, 4, 5]
    assert out["n_parts"].tolist() == [3, 1, 1, 2]
    assert out["text"].tolist()[0] == "1 start\ncont a\ncont b"
    # without the gap rule the whole run folds into one segment
    st2 = build_stage({"type": "multiline", "firstline": r"^\d"})
    out2 = st2.apply(ds).to_pandas().sort_values("first_turn")
    assert out2["n_parts"].tolist() == [5, 2]


def test_multiline_continuation_parsers():
    import json

    import pandas as pd
    import ray.data as rd

    from fluent_bit_ray.parsers.core import RegexParser

    rows = [
        ("c1", 0, "CALL foo() -> ok"),                       # firstline
        ("c1", 1, 'level=info msg="x" tool=bash dur=1.5 code=7'),
        ("c1", 2, "plain continuation"),                     # raw append
        ("c1", 3, "level:warn\tcode:9\tmsg:ok 3\tdur:0.25"),
        ("c1", 4, "{json-ish start"),                        # new firstline
        ("c1", 5, "tail line"),
        ("c2", 0, "orphan line"),                            # no firstline
    ]
    ds = rd.from_pandas(pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "text"]).assign(
        ts=lambda d: pd.to_datetime(d["turn_idx"], unit="s")))
    lf = RegexParser("cont_logfmt",
                     r'^level=(?P<level>\w+) msg="(?P<msg>[^"]*)" '
                     r'tool=(?P<tool>\w+) dur=(?P<dur>[\d.]+) '
                     r'code=(?P<code>\d+)$')
    lt = RegexParser("cont_ltsv",
                     r'^level:(?P<level>\w+)\tcode:(?P<code>\d+)\t'
                     r'msg:(?P<msg>[^\t]*)\tdur:(?P<dur>[\d.]+)$')
    st = build_stage({"type": "multiline", "firstline": r"^(\d|\{|CALL )",
                      "cont_parsers": [lf, lt]})
    out = st.apply(ds).to_pandas().sort_values(
        ["conv_id", "first_turn"]).reset_index(drop=True)
    assert out.columns.tolist() == ["conv_id", "first_turn", "n_parts",
                                    "text", "fields"]
    # seg 1: firstline + 3 continuations; parsed lines leave the text
    assert out.loc[0, "n_parts"] == 4
    assert out.loc[0, "text"] == "CALL foo() -> ok\nplain continuation"
    f = json.loads(out.loc[0, "fields"])
    # ltsv row (turn 3) parsed LAST → overwrites level/msg/dur/code;
    # tool only came from the logfmt row
    assert f == {"level": "warn", "msg": "ok 3", "tool": "bash",
                 "dur": "0.25", "code": "9"}
    # seg 2: firstline + unparsed tail
    assert out.loc[1, "text"] == "{json-ish start\ntail line"
    assert json.loads(out.loc[1, "fields"]) == {}
    # orphan line (no open buffer) emitted as-is
    assert out.loc[2, "text"] == "orphan line"
    assert out.loc[2, "n_parts"] == 1


def test_multiline_firstline_parser_append_gate():
    import json

    import pandas as pd
    import ray.data as rd

    from fluent_bit_ray.parsers.core import RegexParser

    rows = [
        ("c1", 0, "100 begin"),
        ("c1", 1, "raw one"),
        ("c1", 2, "raw two"),
    ]
    ds = rd.from_pandas(pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "text"]).assign(
        ts=lambda d: pd.to_datetime(d["turn_idx"], unit="s")))
    # firstline parser whose LAST captured value stays a string →
    # unparsed continuations append (is_last_key_val_string == true)
    flp = RegexParser("fl", r"^(?P<num>\d+) (?P<rest>.*)$")
    st = build_stage({"type": "multiline", "firstline": r"^\d",
                      "firstline_parser": flp})
    out = st.apply(ds).to_pandas().sort_values("first_turn")
    assert out["n_parts"].tolist() == [3]
    assert out["text"].iloc[0] == "100 begin\nraw one\nraw two"
    assert json.loads(out["fields"].iloc[0]) == {"num": "100",
                                                 "rest": "begin"}
    # typecast makes the last value an int → append gate CLOSES:
    # continuations are emitted solo (tail_multiline.c pack_line)
    flp2 = RegexParser("fl", r"^(?P<rest>.*?) ?(?P<num>\d+) begin$",
                       types={"num": "integer"})
    st2 = build_stage({"type": "multiline", "firstline": r"^\d",
                       "firstline_parser": flp2})
    out2 = st2.apply(ds).to_pandas().sort_values("first_turn") \
        .reset_index(drop=True)
    assert out2["n_parts"].tolist() == [1, 1, 1]
    assert out2.loc[0, "text"] == "100 begin"
    assert json.loads(out2.loc[0, "fields"])["num"] == 100


def test_tensorflow_stage_semantics():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from fluent_bit_ray.stages.tensorflow import FixedMlp, _TfScoreBatch

    m = FixedMlp(4, hidden=3, out_dim=2, seed=2024)
    # deterministic across instances (interpreter-per-actor contract)
    m2 = FixedMlp(4, hidden=3, out_dim=2, seed=2024)
    assert (m.w1 == m2.w1).all() and (m.b2 == m2.b2).all()
    x = np.array([[1.0, 2.0, 3.0, 4.0]])
    ref = np.maximum(x @ m.w1 + m.b1, 0) @ m.w2 + m.b2
    assert (m.forward(x) == ref).all()

    df = pd.DataFrame({
        "rid": [0, 1, 2, 3],
        "vec": [[1.0, 2.0, 3.0, 4.0], None, [1.0, 2.0], [0.0] * 4],
        "extra": ["a", "b", "c", "d"],
    })
    st = _TfScoreBatch(input_field="vec", input_dim=4, hidden=3, out_dim=2)
    out = st(df)
    # rows 1 (missing) and 2 (wrong size) dropped (tensorflow.c only
    # packs records that passed inference)
    assert out["rid"].tolist() == [0, 3]
    assert out["extra"].tolist() == ["a", "d"]       # include_input_fields
    assert "inference_time" in out.columns
    assert out["tf_out"].iloc[0].tolist() == ref[0].tolist()
    # zero input → relu(b1) @ w2 + b2
    z = (np.maximum(np.zeros((1, 4)) @ m.w1 + m.b1, 0) @ m.w2 + m.b2)[0]
    assert out["tf_out"].iloc[1].tolist() == z.tolist()

    # include_input_fields=False drops the original map
    st2 = _TfScoreBatch(input_field="vec", input_dim=4, hidden=3,
                        out_dim=2, include_input_fields=False)
    out2 = st2(df)
    assert set(out2.columns) == {"inference_time", "tf_out"}

    # normalization_value divides inputs (tensorflow.c:314-326)
    st3 = _TfScoreBatch(input_field="vec", input_dim=4, hidden=3,
                        out_dim=2, normalization_value=2.0)
    out3 = st3(df)
    refn = (np.maximum((x / 2.0) @ m.w1 + m.b1, 0) @ m.w2 + m.b2)[0]
    assert out3["tf_out"].iloc[0].tolist() == refn.tolist()

    # the registered Stage drives an actor pool over a Dataset
    ds = rd.from_pandas(df)
    st4 = build_stage({"type": "tensorflow", "input_field": "vec",
                       "input_dim": 4, "hidden": 3, "out_dim": 2})
    got = st4.apply(ds).to_pandas().sort_values("rid")
    assert got["rid"].tolist() == [0, 3]


def test_multiline_arrow_engine_matches_pandas():
    """The parserless Arrow fast path must produce byte-identical
    segments to the pandas reference path — shuffled input, multiple
    convs, gap flushes, null text (pandas astype(str) renders "None"),
    and non-firstline-leading convs."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    rng = np.random.default_rng(7)
    rows = []
    for c in range(12):
        n = int(rng.integers(1, 30))
        for t in range(n):
            r = rng.random()
            if r < 0.3:
                txt = f"{t} start of segment c{c}"
            elif r < 0.35:
                txt = None
            else:
                txt = f"continuation {c}:{t} body"
            sec = t * (1 if r < 0.9 else 50)
            rows.append((f"conv-{c:02d}", t, txt, sec))
    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "text", "sec"])
    df["ts"] = pd.to_datetime(df["sec"], unit="s")
    df = df.sample(frac=1.0, random_state=3).reset_index(drop=True)

    def run(engine, gap, chunk_rows="default"):
        spec = {"type": "multiline", "firstline": r"^\d",
                "engine": engine}
        if gap:
            spec["flush_gap_s"] = 5
        if chunk_rows != "default":
            spec["chunk_rows"] = chunk_rows
        out = build_stage(spec).apply(rd.from_pandas(df)).to_pandas()
        return out.sort_values(["conv_id", "first_turn"]) \
            .reset_index(drop=True).astype({"text": str})

    for gap in (False, True):
        p = run("pandas", gap)
        # unchunked arrow kernel; chunked-but-single-chunk (default
        # chunk size, no boundary records); chunked with a chunk size
        # small enough that every conv splits (boundary merge,
        # covers_all chains); and one where only some convs split
        for chunk_rows in (None, "default", 4, 16):
            a = run("auto", gap, chunk_rows)
            pd.testing.assert_frame_equal(a, p)
    # a pattern RE2 cannot compile (lookbehind) falls back to the
    # pandas path without error
    st = build_stage({"type": "multiline", "firstline": r"(?<=A)\d"})
    out = st.apply(rd.from_pandas(df)).to_pandas()
    assert len(out) > 0


def test_multiline_chunked_through_sort_fallback(monkeypatch):
    """Past the ref-matrix ceiling the chunked multiline runs through
    the sort shuffle (whole keys co-located — strictly stronger than
    the salted map — with side records in-band): output must match."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    import fluent_bit_ray.shuffle as sh

    rng = np.random.default_rng(41)
    rows = []
    for c in range(6):
        n = int(rng.integers(5, 40))
        for t in range(n):
            r = rng.random()
            txt = f"{t} head c{c}" if r < 0.3 else f"cont {c}:{t}"
            rows.append((f"c{c}", t, txt))
    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "text"])
    ds = rd.from_pandas(df)

    base = build_stage({"type": "multiline", "firstline": r"^\d",
                        "chunk_rows": 4}).apply(ds).to_pandas()
    monkeypatch.setattr(sh, "_RAW_MAX_GROUPS", 1)
    fb = build_stage({"type": "multiline", "firstline": r"^\d",
                      "chunk_rows": 4}).apply(ds).to_pandas()
    key = ["conv_id", "first_turn"]
    pd.testing.assert_frame_equal(
        fb.sort_values(key).reset_index(drop=True),
        base.sort_values(key).reset_index(drop=True))
