import numpy as np
import pyarrow as pa

from fluent_bit_ray.record import RecordAccessor, translate
from fluent_bit_ray.tags import Router, derive_tag, match_mask, tag_match

# wildcard truth table from reference tests/internal/router.c:20-45
TRUTH = [
    ("file.apache.log", "file.*.log", True),
    ("cpu.rpi", "cpu.rpi", True),
    ("cpu.rpi", "cpu.*", True),
    ("cpu.rpi", "*", True),
    ("cpu.rpi", "*.*", True),
    ("cpu.rpi", "*.rpi", True),
    ("cpu.rpi", "mem.*", False),
    ("cpu.rpi", "*u.r*", True),
    ("hoge", "hogeeeeeee", False),
    ("test", "test", True),
]


def test_wildcard_truth_table():
    for tag, pat, want in TRUTH:
        assert tag_match(tag, pat) == want, (tag, pat)


def test_match_regex():
    assert tag_match("transcript.tool", r"^transcript\.(tool|user)$", is_regex=True)
    assert not tag_match("transcript.sys", r"^transcript\.(tool|user)$", is_regex=True)


def test_match_mask_and_router():
    tags = pa.array(["transcript.user", "transcript.tool", "other.x",
                     "transcript.assistant"])
    m = match_mask(tags, "transcript.*")
    assert m.tolist() == [True, True, False, True]

    router = Router([("all", "*"), ("tool_sink", "transcript.tool"),
                     ("assist", "*.assistant")])
    routes = router.routes_column(tags)
    assert routes.dtype == np.uint64
    assert router.sink_mask(routes, "all").tolist() == [True] * 4
    assert router.sink_mask(routes, "tool_sink").tolist() == [False, True, False, False]
    assert router.sink_mask(routes, "assist").tolist() == [False, False, False, True]


def test_derive_tag():
    t = derive_tag(pa.array(["user", "tool"]))
    assert t.to_pylist() == ["transcript.user", "transcript.tool"]


def test_record_accessor():
    row = {"text": "hello", "tag": "transcript.tool",
           "fields": {"level": "info", "log": {"nested": {"k": 7}}, "arr": [1, 2, 3]}}
    assert RecordAccessor("$text").get(row) == "hello"
    assert RecordAccessor("$level").get(row) == "info"
    assert RecordAccessor("$log['nested']['k']").get(row) == 7
    assert RecordAccessor("$arr[1]").get(row) == 2
    assert RecordAccessor("$TAG").get(row) == "transcript.tool"
    assert RecordAccessor("$TAG[1]").get(row) == "tool"
    assert RecordAccessor("$missing").get(row) is None


def test_translate():
    row = {"tag": "a.b", "fields": {"k": "v"}}
    assert translate("x_$k.$TAG[1]", row) == "x_v.b"
    assert translate("cap_$1", row, captures=("full", "g1")) == "cap_g1"
    assert translate("none_$zzz", row) == "none_"
