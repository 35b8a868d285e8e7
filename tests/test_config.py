"""Classic-mode config parsing + config→Pipeline translation."""

import textwrap

import pytest
import ray.data as rd

from fluent_bit_ray.config import (build_pipeline, load_classic,
                                   multiline_parser_specs, parse_classic,
                                   parser_specs)
from fluent_bit_ray.pipelines.flagship import (FLAGSHIP_CONF,
                                               FLAGSHIP_PARSERS_CONF,
                                               build_flagship)
from fluent_bit_ray.sources.transcripts import ensure_transcripts

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------------ parsing

def test_parse_classic_basics():
    text = textwrap.dedent("""\
        # leading comment
        @SET app=myapp

        [SERVICE]
            Flush     5
            log_Level info

        [INPUT]
            Name tail
            Tag  ${app}.logs
            Path /var/log/${app}/*.log
    """)
    secs = parse_classic(text)
    assert [s for s, _ in secs] == ["SERVICE", "INPUT"]
    svc = dict(secs[0][1])
    assert svc == {"flush": "5", "log_level": "info"}  # keys lowercased
    inp = dict(secs[1][1])
    assert inp["tag"] == "myapp.logs"          # @SET expansion
    assert inp["path"] == "/var/log/myapp/*.log"


def test_parse_classic_env_fallback(monkeypatch):
    monkeypatch.setenv("FBR_TEST_REGION", "eu-1")
    secs = parse_classic("[X]\n  k ${FBR_TEST_REGION}\n  m ${FBR_NOPE}\n")
    assert dict(secs[0][1]) == {"k": "eu-1", "m": ""}


def test_parse_classic_errors():
    with pytest.raises(ValueError, match="outside any section"):
        parse_classic("key value\n")
    with pytest.raises(ValueError, match="unknown directive"):
        parse_classic("@BOGUS x\n")


def test_include(tmp_path):
    (tmp_path / "parsers.conf").write_text(
        "[PARSER]\n  Name p1\n  Format json\n")
    (tmp_path / "main.conf").write_text(
        "[SERVICE]\n  flush 1\n@INCLUDE parsers.conf\n[OUTPUT]\n  name null\n")
    secs = load_classic(str(tmp_path / "main.conf"))
    assert [s for s, _ in secs] == ["SERVICE", "PARSER", "OUTPUT"]
    with pytest.raises(FileNotFoundError):
        parse_classic("@INCLUDE nope-*.conf\n", base_dir=str(tmp_path))


# ------------------------------------------------------------- parsers.conf

def test_parser_specs_full():
    text = textwrap.dedent("""\
        [PARSER]
            Name        apache
            Format      regex
            Regex       ^(?<host>[^ ]*) (?<code>\\d+)$
            Time_Key    time
            Time_Format %d/%b/%Y:%H:%M:%S %z
            Types       code:integer size:integer
            Decode_Field_As json log
            Decode_Field    escaped payload try_next

        [PARSER]
            Name   docker
            Format json
            Time_Key time
            Time_Keep On
    """)
    specs = parser_specs(parse_classic(text))
    ap = specs["apache"]
    assert ap["format"] == "regex" and ap["regex"].startswith("^(?<host>")
    assert ap["time_key"] == "time"
    assert ap["time_format"] == "%d/%b/%Y:%H:%M:%S %z"
    assert ap["types"] == {"code": "integer", "size": "integer"}
    assert ap["decoders"] == [("decode_field_as", "log", "json"),
                              ("decode_field", "payload", "escaped",
                               "try_next")]
    dk = specs["docker"]
    assert dk["format"] == "json" and dk["time_keep"] is True


def test_multiline_parser_specs():
    text = textwrap.dedent("""\
        [MULTILINE_PARSER]
            name          multiline-regex-test
            type          regex
            flush_timeout 1000
            rule      "start_state"   "/(Dec \\d+ \\d+:\\d+:\\d+)(.*)/"  "cont"
            rule      "cont"          "/^\\s+at.*/"                     "cont"
    """)
    specs = multiline_parser_specs(parse_classic(text))
    ml = specs["multiline-regex-test"]
    assert ml["firstline"] == "(Dec \\d+ \\d+:\\d+:\\d+)(.*)"
    assert ml["flush_gap_s"] == 1.0
    assert len(ml["rules"]) == 2 and ml["rules"][1][2] == "cont"


# --------------------------------------------------------------- translation

def test_filter_translation_matrix():
    conf = textwrap.dedent("""\
        [FILTER]
            name  grep
            match app.*
            regex   text error|warn
            exclude role system

        [FILTER]
            name modify
            match *
            Condition Key_value_equals level error
            Rename old new
            Remove  junk
            Set     flagged yes

        [FILTER]
            name record_modifier
            match *
            Record hostname web-1
            Remove_key dropme

        [FILTER]
            name nest
            match *
            Operation lift
            Nested_under meta
            Add_prefix meta_

        [FILTER]
            name throttle
            match *
            Rate 10
            Interval 5m

        [FILTER]
            name expect
            match *
            key_exists conv_id
            key_val_eq role tool
            action warn

        [FILTER]
            name rewrite_tag
            match app.*
            Rule $level ^err alert.$TAG[1] false

        [OUTPUT]
            name null
            match *
    """)
    pipe, meta = build_pipeline(conf)
    specs = pipe.stage_specs
    assert specs[0] == {"type": "grep", "match": "app.*",
                        "rules": [("regex", "$text", "error|warn"),
                                  ("exclude", "$role", "system")]}
    assert specs[1]["conditions"] == [("key_value_equals", "level", "error")]
    assert specs[1]["rules"] == [("rename", "old", "new"),
                                 ("remove", "junk"), ("set", "flagged", "yes")]
    assert specs[2] == {"type": "record_modifier", "match": "*",
                        "records": [("hostname", "web-1")],
                        "remove_keys": ["dropme"]}
    assert specs[3] == {"type": "nest", "match": "*", "operation": "lift",
                        "nested_under": "meta", "add_prefix": "meta_"}
    assert specs[4] == {"type": "throttle", "match": "*", "rate": 10,
                        "interval_s": 300}
    assert specs[5] == {"type": "expect", "match": "*", "action": "warn",
                        "checks": [("key_exists", "conv_id"),
                                   ("key_val_eq", "role", "tool")]}
    assert specs[6] == {"type": "rewrite_tag", "match": "app.*",
                        "rules": [("$level", "^err", "alert.$TAG[1]", False)]}
    # every translated spec must construct a real stage
    assert len(pipe._built_stages()) == 7


def test_unsupported_filters_raise():
    with pytest.raises(ValueError, match="'call'"):
        build_pipeline("[FILTER]\n  name lua\n  match *\n  script x.lua\n")
    with pytest.raises(ValueError, match="unsupported filter"):
        build_pipeline("[FILTER]\n  name no_such_plugin\n  match *\n")
    with pytest.raises(ValueError, match="unknown parser"):
        build_pipeline("[FILTER]\n  name parser\n  match *\n  parser ghost\n")


def test_lua_filter_via_registry():
    """[FILTER] name lua binds `call` to a python callable registered
    via register_udf (documented substitution for the Lua runtime) and
    the built pipeline runs it."""
    from fluent_bit_ray.stages.misc import UDF_REGISTRY, register_udf

    @register_udf("test_drop_tool_rows")
    def drop_tools(tag, ts, record):
        if tag is not None and tag.endswith(".tool"):
            return -1, record
        return 0, record
    try:
        conf = ("[FILTER]\n  name lua\n  match *\n  script x.lua\n"
                "  call test_drop_tool_rows\n"
                "[OUTPUT]\n  name null\n  match *\n")
        pipe, _ = build_pipeline(conf)
        ds = rd.read_parquet(ensure_transcripts(SF))
        out = pipe.run(ds).ds.take_batch(2048, batch_format="pandas")
        assert len(out) and "tool" not in set(out["role"])
    finally:
        UDF_REGISTRY.pop("test_drop_tool_rows", None)
    # unregistered call name → clear error naming the registry
    with pytest.raises(ValueError, match="register_udf"):
        build_pipeline("[FILTER]\n  name lua\n  match *\n"
                       "  call no_such_fn\n"
                       "[OUTPUT]\n  name null\n  match *\n")[0] \
            ._built_stages()


def test_lua_filter_script_py_file(tmp_path):
    """`script` pointing at a .py file is exec'd and `call` looked up
    in its globals — the closest analogue of the reference's lua file
    load (plugins/filter_lua/lua.c:411)."""
    p = tmp_path / "udf.py"
    p.write_text("def mark_seen(tag, ts, record):\n"
                 "    record = dict(record)\n"
                 "    record['seen'] = 'y'\n"
                 "    return 1, record\n")
    conf = (f"[FILTER]\n  name lua\n  match *\n  script {p}\n"
            "  call mark_seen\n"
            "[OUTPUT]\n  name null\n  match *\n")
    pipe, _ = build_pipeline(conf)
    ds = rd.read_parquet(ensure_transcripts(SF))
    out = pipe.run(ds).ds.take_batch(8, batch_format="pandas")
    from fluent_bit_ray.record import fields_loads
    assert all(fields_loads(v).get("seen") == "y" for v in out["fields"])


def test_output_alias_dedup_and_match_regex():
    conf = textwrap.dedent("""\
        [OUTPUT]
            name  stdout
            match a.*
        [OUTPUT]
            name  stdout
            match b.*
        [OUTPUT]
            name  es
            alias search
            match_regex ^c\\.
    """)
    pipe, meta = build_pipeline(conf)
    names = pipe.router.sink_names()
    assert names == ["stdout", "stdout.2", "search"]
    assert pipe.router.routes[2].is_regex
    assert meta["outputs"][2]["plugin"] == "es"


def test_input_tag_sets_prefix():
    pipe, _ = build_pipeline(
        "[INPUT]\n  name dummy\n  tag myapp\n[OUTPUT]\n  name null\n  match *\n")
    assert pipe.tag_prefix == "myapp"
    # wildcard tags can't seed a prefix → default
    pipe2, _ = build_pipeline(
        "[INPUT]\n  name tail\n  tag kube.*\n[OUTPUT]\n  name null\n  match *\n")
    assert pipe2.tag_prefix == "transcript"


# ------------------------------------------------------------------ e2e

def test_config_pipeline_matches_flagship_counts():
    """A classic config reproducing the flagship chain routes the same
    row multiset to every sink as the hand-built pipeline."""
    pipe, meta = build_pipeline(FLAGSHIP_CONF, FLAGSHIP_PARSERS_CONF)
    assert [o["alias"] for o in meta["outputs"]] == [
        "all", "assistant", "tool_sink", "alerts"]
    ds = rd.read_parquet(ensure_transcripts(SF))
    got = pipe.run(ds).sink_counts()
    want = build_flagship(with_enrich=False).run(
        rd.read_parquet(ensure_transcripts(SF))).sink_counts()
    assert got == want


def test_enrich_filter_translation():
    conf = textwrap.dedent("""\
        [FILTER]
            name aws
            match *
            Record az us-east-1a
            Record ec2_instance_id i-0123

        [FILTER]
            name apm_ldap
            match *
            dim dim_tools
            lookup_key $tool
            prefix ldap_

        [FILTER]
            name apm_uaparser
            match *
            lookup_key $p_agent

        [FILTER]
            name apm_url_normalizer
            match *
            column p_path
            out_column p_path_norm

        [FILTER]
            name apm_message_formatter
            match *
            Template [$level] $msg
            out_key pretty
        [OUTPUT]
            name null
            match *
    """)
    pipe, _ = build_pipeline(conf)
    specs = pipe.stage_specs
    assert specs[0] == {"type": "const_enrich", "match": "*",
                        "values": {"az": "us-east-1a",
                                   "ec2_instance_id": "i-0123"}}
    assert specs[1] == {"type": "lookup_enrich", "match": "*",
                        "dim": "dim_tools", "lookup_key": "tool",
                        "prefix": "ldap_"}
    assert specs[2] == {"type": "ua_enrich", "match": "*",
                        "lookup_key": "p_agent"}
    assert specs[3] == {"type": "url_normalize", "match": "*",
                        "column": "p_path", "out_column": "p_path_norm"}
    assert specs[4] == {"type": "message_format", "match": "*",
                        "template": "[$level] $msg", "out_key": "pretty"}
    assert len(pipe._built_stages()) == 5
    # aws without Record lines: no metadata source offline
    with pytest.raises(ValueError, match="Record key value"):
        build_pipeline("[FILTER]\n  name aws\n  match *\n")


def test_input_multiline_parser_resolution():
    conf = textwrap.dedent("""\
        [INPUT]
            name tail
            tag  app
            multiline.parser java-stack
        [OUTPUT]
            name null
            match *
    """)
    parsers = textwrap.dedent("""\
        [MULTILINE_PARSER]
            name java-stack
            type regex
            flush_timeout 2000
            rule "start_state" "/^\\S.*Exception/" "cont"
            rule "cont"        "/^\\s+at /"        "cont"
    """)
    _, meta = build_pipeline(conf, parsers)
    spec = meta["inputs"][0]["multiline_specs"][0]
    assert spec["firstline"] == "^\\S.*Exception"
    assert spec["flush_gap_s"] == 2.0
    with pytest.raises(ValueError, match="unknown parser"):
        build_pipeline(conf)  # no parsers.conf supplied


def test_multiline_multiple_start_states_or_joined():
    parsers = textwrap.dedent("""\
        [MULTILINE_PARSER]
            name multi-start
            type regex
            rule "start_state" "/^Dec/" "cont"
            rule "start_state" "/^Jan/" "cont"
            rule "cont"        "/^ /"   "cont"
    """)
    specs = multiline_parser_specs(parse_classic(parsers))
    fl = specs["multi-start"]["firstline"]
    import re as _re
    assert _re.match(fl, "Dec 1 x") and _re.match(fl, "Jan 2 y")
    assert not _re.match(fl, " cont line")


def test_config_empty_rule_values_raise():
    with pytest.raises(ValueError, match="Condition needs a value"):
        build_pipeline("[FILTER]\n  name modify\n  match *\n  Condition\n"
                       "[OUTPUT]\n  name null\n  match *\n")
