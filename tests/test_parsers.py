import numpy as np
import pyarrow as pa

from fluent_bit_ray.parsers import (
    JsonParser,
    LogfmtParser,
    LtsvParser,
    RegexParser,
    apply_decoders,
    build_parser,
    typecast,
)
from fluent_bit_ray.parsers.core import APACHE_PATTERN
from fluent_bit_ray.parsers.timeparse import parse_time_column


def test_regex_apache_basic():
    p = build_parser({"name": "apache", "format": "regex", "regex": APACHE_PATTERN,
                      "time_key": "time", "time_format": "%d/%b/%Y:%H:%M:%S %z",
                      "types": {"code": "integer", "size": "integer"}})
    line = ('192.168.1.1 - alice [28/Jul/2006:10:27:10 -0300] '
            '"GET /cgi-bin/try/ HTTP/1.0" 200 3395 "" "curl/7.68.0"')
    maps, times = p.parse_column(pa.array([line, "no match here"]))
    m = maps[0]
    assert m["host"] == "192.168.1.1"
    assert m["user"] == "alice"
    assert m["method"] == "GET"
    assert m["code"] == 200 and isinstance(m["code"], int)
    assert m["size"] == 3395
    # zero-length captures skipped (referer matched empty)
    assert "referer" not in m
    assert "agent" in m
    # time key consumed (time_keep False) and parsed with tz offset
    assert "time" not in m
    assert times[0] == np.datetime64("2006-07-28T13:27:10")
    assert maps[1] is None
    assert np.isnat(times[1])


def test_regex_time_keep():
    p = build_parser({"name": "t", "format": "regex",
                      "regex": r"^(?P<time>\S+) (?P<msg>.*)$",
                      "time_key": "time", "time_format": "%Y-%m-%dT%H:%M:%S",
                      "time_keep": True})
    maps, times = p.parse_column(["2020-01-02T03:04:05 hello"])
    assert maps[0]["time"] == "2020-01-02T03:04:05"
    assert times[0] == np.datetime64("2020-01-02T03:04:05")


def test_json_parser():
    p = JsonParser("j", time_key="time")
    maps, times = p.parse_column([
        '{"a": 1, "b": "x", "time": 1448403340}',
        'not json',
        '[1,2,3]',
        '{"nested": {"k": [1, 2]}}',
    ])
    assert maps[0] == {"a": 1, "b": "x"}
    assert times[0] == np.datetime64("2015-11-24T22:15:40")
    assert maps[1] is None and maps[2] is None
    assert maps[3] == {"nested": {"k": [1, 2]}}


def test_ltsv_logfmt():
    lt = LtsvParser("l")
    maps, _ = lt.parse_column(["level:info\tcode:200\tmsg:ok"])
    assert maps[0] == {"level": "info", "code": "200", "msg": "ok"}

    lf = LogfmtParser("f")
    maps, _ = lf.parse_column(['level=info msg="tool call" dur=0.42 flag='])
    assert maps[0] == {"level": "info", "msg": "tool call", "dur": "0.42", "flag": ""}


def test_typecast():
    assert typecast("42", "integer") == 42
    assert typecast("4.5", "float") == 4.5
    assert typecast("true", "bool") is True
    assert typecast("ff", "hex") == 255
    assert typecast("notanint", "integer") == "notanint"


def test_decoders():
    f = {"log": '{"inner": 1}', "esc": 'a\\nb', "q": "'it''s'"}
    apply_decoders(f, [("decode_field_as", "log", "json"),
                       ("decode_field_as", "esc", "escaped"),
                       ("decode_field_as", "q", "mysql_quoted")])
    assert f["log"] == {"inner": 1}
    assert f["esc"] == "a\nb"
    assert f["q"] == "it's"


def test_decode_field_merges_extra_keys():
    # Decode_Field json: decoded OBJECT keys appended to the record,
    # original value retained (reference flb_parser_decoder.c:487-516,
    # merge_record_and_extra_keys)
    f = {"log": '{"a": 1, "b": "x"}', "other": "y"}
    apply_decoders(f, [("decode_field", "log", "json")])
    assert f["log"] == '{"a": 1, "b": "x"}'      # original value kept
    assert list(f) == ["log", "other", "a", "b"]  # extras at the END
    assert f["a"] == 1 and f["b"] == "x"
    # string result is not allowed as extra keys → no-op
    f2 = {"s": "abc"}
    apply_decoders(f2, [("decode_field", "s", "escaped")])
    assert f2 == {"s": "abc"}


def test_decoder_do_next_chain():
    # the canonical docker-log chain: unescape, then parse as JSON
    # (Decode_Field_As escaped log do_next; Decode_Field_As json log)
    f = {"log": '{\\"seq\\": 5}'}
    apply_decoders(f, [("decode_field_as", "log", "escaped", "do_next"),
                       ("decode_field_as", "log", "json")])
    assert f["log"] == {"seq": 5}
    # non-JSON content: first rule still unescapes, second fails, value
    # stays the unescaped STRING (json failure with no action → stop)
    f2 = {"log": 'plain \\"text\\"'}
    apply_decoders(f2, [("decode_field_as", "log", "escaped", "do_next"),
                        ("decode_field_as", "log", "json")])
    assert f2["log"] == 'plain "text"'


def test_decoder_try_next_fallback():
    # try_next: when the first backend FAILS, try the next rule
    # (reference decoder.c:441-448)
    f = {"log": "not json at all"}
    apply_decoders(f, [("decode_field_as", "log", "json", "try_next"),
                       ("decode_field_as", "log", "mysql_quoted")])
    assert f["log"] == "not json at all"  # mysql_quoted is identity here
    # first rule succeeds with no action → later rules NOT applied
    f2 = {"log": '{"a": 1}'}
    apply_decoders(f2, [("decode_field_as", "log", "json", "try_next"),
                        ("decode_field_as", "log", "escaped")])
    assert f2["log"] == {"a": 1}


def test_decoder_skips_after_object():
    # once decode_field_as produced an OBJECT, later rules skip
    # (reference decoder.c:414-416)
    f = {"log": '{"a": 1}'}
    apply_decoders(f, [("decode_field_as", "log", "json", "do_next"),
                       ("decode_field_as", "log", "escaped", "do_next"),
                       ("decode_field", "log", "json", "do_next")])
    assert f["log"] == {"a": 1}
    assert "a" not in f or f.get("a") == 1  # no extra-merge ran on the object


def test_decode_field_do_next_skips_after_decoded():
    # a decode_field(do_next) rule is skipped once one already
    # succeeded (reference decoder.c:408-412)
    f = {"log": '{"a": 1}'}
    apply_decoders(f, [("decode_field", "log", "json", "do_next"),
                       ("decode_field", "log", "json", "do_next")])
    assert f["a"] == 1
    assert list(f).count("a") == 1


def test_yearless_time():
    out = parse_time_column(["Nov 24 22:15:40"], "%b %d %H:%M:%S")
    assert out[0] == np.datetime64("2015-11-24T22:15:40")


def test_fractional_seconds():
    out = parse_time_column(["2020-01-02 03:04:05.123"], "%Y-%m-%d %H:%M:%S.%L")
    assert out[0] == np.datetime64("2020-01-02T03:04:05.123000000")


# ---------------- vector (Arrow-kernel) vs dict path equivalence
def _dict_path_fields(parser, values, promote_keys=()):
    """Reference result computed through the per-row dict path."""
    import pyarrow as pa
    from fluent_bit_ray.record import fields_dumps, fields_loads
    maps, _ = parser.parse_column(pa.array(values, type=pa.string()))
    fields = [fields_loads(fields_dumps(m)) if m is not None else None
              for m in maps]
    prom = [{k: (m.get(k) if m is not None else None) for k in promote_keys}
            for m in maps]
    return fields, prom


def _vector_path_fields(parser, values, promote_keys=()):
    import pyarrow as pa
    from fluent_bit_ray.record import fields_loads
    vec = parser.vector_parse(pa.array(values, type=pa.string()),
                              promote_keys=promote_keys)
    assert vec is not None
    hit_mask, json_strs, _, promoted = vec
    fields = [None] * len(values)
    prom = [{k: None for k in promote_keys} for _ in values]
    j = 0
    for i, hit in enumerate(hit_mask):
        if hit:
            fields[i] = fields_loads(json_strs[j])
            for k in promote_keys:
                prom[i][k] = promoted[k][j]
            j += 1
    return fields, prom


LOGFMT_CASES = [
    'level=info msg="tool call 7" tool=bash dur=0.473 code=200',
    "level=error code=500 dur=0.999",
    "a=1 b= c=x",
    'q="hello world" n=42',
    "junk before k=v",                 # junk → fallback path
    "code=007 dur=0.5",                # leading zero → fallback (int("007")=7)
    "code=+5",                         # plus sign → fallback
    "dur=5",                           # int-looking float → fallback (5.0)
    "dur=1e3",                         # exponent → fallback
    "dur=1_0.5 code=1_0",              # underscores → fallback
    "code=200 extra=v code=404",       # dup typed key → fallback, last wins
    'msg="a=b c" x=1',                 # '=' inside quoted value → fallback
    "no equals sign here",             # miss
    "k=v\tweird",                      # tab → fallback
    "",                                # miss
]


def test_logfmt_vector_matches_dict_path():
    p = build_parser({"name": "l", "format": "logfmt",
                      "types": {"code": "integer", "dur": "float"}})
    dv, dp = _dict_path_fields(p, LOGFMT_CASES, ("code", "dur", "msg"))
    vv, vp = _vector_path_fields(p, LOGFMT_CASES, ("code", "dur", "msg"))
    for i, case in enumerate(LOGFMT_CASES):
        assert vv[i] == dv[i], f"fields mismatch on {case!r}: {vv[i]} != {dv[i]}"


LTSV_CASES = [
    "level:info\tcode:200\tmsg:ok 3\tdur:0.473",
    "level:error\tcode:500\tdur:0.001",
    "a:\tb:x",
    "code:007\tdur:0.5",               # leading zero → fallback
    "dur:5\tcode:1",                   # int-looking float → fallback
    "k:v:w",                           # colon in value → fallback, k='v:w'... first-colon split
    "noseparator",                     # miss
    "code:200\tcode:404",              # dup key → fallback, last wins
    "",                                # miss
]


def test_ltsv_vector_matches_dict_path():
    p = build_parser({"name": "t", "format": "ltsv",
                      "types": {"code": "integer", "dur": "float"}})
    dv, _ = _dict_path_fields(p, LTSV_CASES, ("code",))
    vv, _ = _vector_path_fields(p, LTSV_CASES, ("code",))
    for i, case in enumerate(LTSV_CASES):
        assert vv[i] == dv[i], f"fields mismatch on {case!r}: {vv[i]} != {dv[i]}"


def test_json_vector_matches_dict_path():
    cases = ['{"a": 1, "b": "x", "code": 200, "dur": 0.5}',
             '{"nested": {"k": [1, 2]}}',
             "not json", "", '["array"]', '{"dup": 1, "dup": 2}']
    p = build_parser({"name": "j", "format": "json",
                      "types": {"code": "integer", "dur": "float"}})
    dv, _ = _dict_path_fields(p, cases)
    vv, _ = _vector_path_fields(p, cases)
    assert vv == dv


def test_kv_vector_hypothesis_equivalence():
    """Property test: on arbitrary printable-ish lines the vector path
    (kernel + guarded fallback) must agree with the dict path."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    key = st.text(alphabet="abzAZ09._-/@", min_size=1, max_size=6)
    uval = st.text(alphabet="abz09._-+:{}\"'\\=e", max_size=8)
    token = st.tuples(key, uval).map(lambda t: f"{t[0]}={t[1]}")
    line = st.lists(token, max_size=5).map(" ".join)

    p = build_parser({"name": "h", "format": "logfmt",
                      "types": {"code": "integer", "dur": "float"}})

    @settings(max_examples=120, deadline=None, derandomize=True)
    @given(st.lists(line, min_size=1, max_size=8))
    def check(lines):
        dv, _ = _dict_path_fields(p, lines, ("code",))
        vv, _ = _vector_path_fields(p, lines, ("code",))
        assert vv == dv

    check()


def test_ltsv_vector_hypothesis_equivalence():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    key = st.text(alphabet="abz09._-", min_size=1, max_size=5)
    val = st.text(alphabet="abz09 .:=\"'\\{}e_", max_size=8)
    token = st.tuples(key, val).map(lambda t: f"{t[0]}:{t[1]}")
    line = st.lists(token, max_size=5).map("\t".join)

    p = build_parser({"name": "h", "format": "ltsv",
                      "types": {"code": "integer", "dur": "float"}})

    @settings(max_examples=120, deadline=None, derandomize=True)
    @given(st.lists(line, min_size=1, max_size=8))
    def check(lines):
        dv, _ = _dict_path_fields(p, lines, ("code",))
        vv, _ = _vector_path_fields(p, lines, ("code",))
        assert vv == dv

    check()


def test_decode_field_trailing_string_suppresses_merge():
    # The reference overwrites out_sds/out_type on EVERY decode_field
    # success (decoder.c:505-511): if the LAST successful decode_field
    # yields a string, nothing is merged — even when an earlier rule in
    # the chain captured an object.
    # Rule 2 carries NO action: it is not subject to the
    # decode_field+do_next skip (decoder.c:408-412) and runs after the
    # json rule already captured an object.
    f = {"log": '{"a":1}'}
    apply_decoders(f, [("decode_field", "log", "json", "do_next"),
                       ("decode_field", "log", "escaped")])
    # json → object, then escaped → string: string wins, no merge
    assert f == {"log": '{"a":1}'}
    # object-last still merges (escaped succeeds with a string, do_next
    # carries on, json then overwrites with the object)
    f2 = {"log": '{"a":1}'}
    apply_decoders(f2, [("decode_field", "log", "escaped", "do_next"),
                        ("decode_field", "log", "json")])
    assert f2 == {"log": '{"a":1}', "a": 1}
