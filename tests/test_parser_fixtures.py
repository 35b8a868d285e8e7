"""Parser fixtures mirroring reference payload grammars beyond the
transcript mix: syslog RFC3164 (plugins/in_syslog payloads +
conf/parsers.conf syslog parser shape) and kubernetes Merge_Log
semantics (plugins/filter_kubernetes kubernetes.c:239-268: parse the
'log' field as JSON and splat it into the record)."""

import numpy as np
import pyarrow as pa

from fluent_bit_ray.parsers import build_parser
from fluent_bit_ray.record import fields_dumps, fields_loads
from fluent_bit_ray.stages import build_stage

SYSLOG_RE = (r"^\<(?P<pri>[0-9]+)\>(?P<time>[^ ]* {1,2}[^ ]* [^ ]*) "
             r"(?P<host>[^ ]*) (?P<ident>[a-zA-Z0-9_\/\.\-]*)"
             r"(?:\[(?P<pid>[0-9]+)\])?(?:[^\:]*\:)? *(?P<message>.*)$")


def test_syslog_rfc3164():
    p = build_parser({"name": "syslog", "format": "regex", "regex": SYSLOG_RE,
                      "time_key": "time", "time_format": "%b %d %H:%M:%S",
                      "types": {"pri": "integer", "pid": "integer"}})
    line = "<34>Oct 11 22:14:15 mymachine su[230]: 'su root' failed on /dev/pts/8"
    maps, times = p.parse_column([line])
    m = maps[0]
    assert m["pri"] == 34
    assert m["host"] == "mymachine"
    assert m["ident"] == "su"
    assert m["pid"] == 230
    assert m["message"] == "'su root' failed on /dev/pts/8"
    assert times[0] == np.datetime64("2015-10-11T22:14:15")  # year-less default


def test_kubernetes_merge_log():
    # record with a 'log' field carrying embedded JSON (container stdout)
    batch = pa.table({
        "text": pa.array(["ignored"]),
        "fields": pa.array([fields_dumps(
            {"log": '{"msg": "ready", "code": 200}', "stream": "stdout"})],
            type=pa.large_string()),
    })
    # Merge_Log == parser stage on the 'log' fields key, keeping other
    # fields (Reserve_Data) and dropping the source key (Keep_Log off)
    st = build_stage({"type": "parser", "key_name": "log",
                      "parsers": [{"name": "json", "format": "json",
                                   "types": {"code": "integer"}}],
                      "reserve_data": True, "preserve_key": False})
    out = st(batch)
    f = fields_loads(out.column("fields").to_pylist()[0])
    assert f == {"msg": "ready", "code": 200, "stream": "stdout"}


def test_merge_log_keep_log():
    batch = pa.table({
        "text": pa.array(["x"]),
        "fields": pa.array([fields_dumps({"log": '{"a": 1}'})],
                           type=pa.large_string()),
    })
    st = build_stage({"type": "parser", "key_name": "log",
                      "parsers": [{"name": "json", "format": "json"}],
                      "reserve_data": True, "preserve_key": True})
    f = fields_loads(st(batch).column("fields").to_pylist()[0])
    assert f == {"a": 1, "log": '{"a": 1}'}


def test_decoder_chain_on_escaped_log():
    # filter-parser + decoder composition: nested escaped JSON in 'log'
    p = build_parser({"name": "j", "format": "json",
                      "decoders": [("decode_field_as", "log", "json")]})
    maps, _ = p.parse_column(
        ['{"log": "{\\"inner\\": true, \\"n\\": 3}", "k": "v"}'])
    assert maps[0] == {"log": {"inner": True, "n": 3}, "k": "v"}
