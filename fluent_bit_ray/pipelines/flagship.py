"""The flagship parse→enrich→route→aggregate pipeline.

End-to-end analogue of a full reference config (SURVEY §3.1):
transcript source → parser filter (5 parsers, first-success) →
lookup/ua/geo enrich → rewrite_tag on error levels (emitter loop) →
tag/match fan-out to sinks → counter/flowcounter aggregates.
"""

from __future__ import annotations

from ..parsers.core import APACHE_PATTERN, TOOLCALL_PATTERN
from ..sources.transcripts import read_transcripts
from .pipeline import Pipeline

# Each prefilter is a PROVABLE superset of its parser's match
# condition (apache needs a literal '[', toolcall starts 'CALL ',
# json needs a '{', logfmt an '=', ltsv a ':'), so skipping
# non-candidate rows cannot change results — it only avoids running
# the expensive pattern on rows that cannot match.
PARSER_SPECS = [
    {"name": "apache", "format": "regex", "regex": APACHE_PATTERN,
     "time_key": "time", "time_format": "%d/%b/%Y:%H:%M:%S %z",
     "types": {"code": "integer", "size": "integer"},
     "prefilter": ("substring", "[")},
    {"name": "toolcall", "format": "regex", "regex": TOOLCALL_PATTERN,
     "prefilter": ("prefix", "CALL ")},
    {"name": "json", "format": "json",
     "types": {"code": "integer", "dur": "float"},
     "prefilter": ("substring", "{")},
    {"name": "logfmt", "format": "logfmt",
     "types": {"code": "integer", "dur": "float"},
     "prefilter": ("substring", "=")},
    {"name": "ltsv", "format": "ltsv",
     "types": {"code": "integer", "dur": "float"},
     "prefilter": ("substring", ":")},
]

PROMOTE = {"code": "int64", "dur": "float64", "level": "string",
           "calltool": "string", "status": "string",
           "host": "string", "agent": "string"}

SINKS = [
    ("all", "*"),
    ("assistant", "*.assistant"),
    ("tool_sink", "transcript.tool"),
    ("alerts", "alert.*"),
]


def build_flagship(with_rewrite: bool = True, with_enrich: bool = True,
                   emit_fields: bool = True,
                   batch_size: int | None = None) -> Pipeline:
    stages: list[dict] = [
        {"type": "parser", "key_name": "text", "parsers": PARSER_SPECS,
         "promote": PROMOTE, "emit_fields": emit_fields},
    ]
    if with_enrich:
        stages += [
            {"type": "lookup_enrich", "dim": "dim_tools", "lookup_key": "tool"},
            {"type": "ua_enrich", "lookup_key": "p_agent"},
            {"type": "geoip_enrich", "lookup_key": "p_host"},
        ]
    if with_rewrite:
        # error/warn records re-emitted under alert.<role>; original kept
        stages.append({"type": "rewrite_tag", "match": "transcript.*",
                       "rules": [("$p_level", "^(error|warn)$",
                                  "alert.$TAG[1]", True)]})
    return Pipeline(stages=stages, sinks=SINKS, batch_size=batch_size)


def run_flagship(sf_dir: str, **kw):
    ds = read_transcripts(sf_dir)
    return build_flagship(**kw).run(ds)


# The same chain expressed as a classic-mode fluent-bit config pair
# (config.build_pipeline translation); routing counts must equal the
# hand-built pipeline's exactly. Parser order matches PARSER_SPECS.
FLAGSHIP_CONF = """\
[SERVICE]
    flush 1

[INPUT]
    name lib
    tag  transcript

[FILTER]
    name parser
    match *
    Key_Name text
    Parser apache
    Parser toolcall
    Parser json
    Parser logfmt
    Parser ltsv
    Reserve_Data On
    Preserve_Key On

[FILTER]
    name rewrite_tag
    match transcript.*
    Rule $level ^(error|warn)$ alert.$TAG[1] true

[OUTPUT]
    name  counter
    alias all
    match *

[OUTPUT]
    name  null
    alias assistant
    match *.assistant

[OUTPUT]
    name  file
    alias tool_sink
    match transcript.tool

[OUTPUT]
    name  stdout
    alias alerts
    match alert.*
"""

FLAGSHIP_PARSERS_CONF = f"""\
[PARSER]
    Name   apache
    Format regex
    Regex  {APACHE_PATTERN}
    Time_Key time
    Time_Format %d/%b/%Y:%H:%M:%S %z
    Types  code:integer size:integer

[PARSER]
    Name   toolcall
    Format regex
    Regex  {TOOLCALL_PATTERN}

[PARSER]
    Name   json
    Format json
    Types  code:integer dur:float

[PARSER]
    Name   logfmt
    Format logfmt
    Types  code:integer dur:float

[PARSER]
    Name   ltsv
    Format ltsv
    Types  code:integer dur:float
"""


def build_flagship_from_config(**pipeline_kw):
    """The flagship pipeline constructed through the classic-config
    surface (no enrich — lookup/ua/geo are engine stages, not
    reference config plugins)."""
    from ..config import build_pipeline
    pipe, _meta = build_pipeline(FLAGSHIP_CONF, FLAGSHIP_PARSERS_CONF,
                                 **pipeline_kw)
    return pipe
