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
    apply_decoders(f, [("decode_field", "log", "json"),
                       ("decode_field_as", "esc", "escaped"),
                       ("decode_field_as", "q", "mysql_quoted")])
    assert f["log"] == {"inner": 1}
    assert f["esc"] == "a\nb"
    assert f["q"] == "it's"


def test_yearless_time():
    out = parse_time_column(["Nov 24 22:15:40"], "%b %d %H:%M:%S")
    assert out[0] == np.datetime64("2015-11-24T22:15:40")


def test_fractional_seconds():
    out = parse_time_column(["2020-01-02 03:04:05.123"], "%Y-%m-%d %H:%M:%S.%L")
    assert out[0] == np.datetime64("2020-01-02T03:04:05.123000000")
