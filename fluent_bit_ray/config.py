"""Classic-mode fluent-bit configuration files → a runnable Pipeline.

The reference's primary user surface is a classic-mode config file
(conf/fluent-bit.conf): ``[SECTION]`` headers followed by indented
``Key Value`` property lines, read by src/flb_config.c (mk_rconf
format). A user switching from the reference brings exactly such a
file, so this module parses the format and translates the
[FILTER]/[OUTPUT] sections into this engine's stage specs and router
sinks, and parsers.conf [PARSER]/[MULTILINE_PARSER] sections into
``parsers.build_parser`` specs.

Format rules honored (src/flb_config.c + conf/ examples):
- section header ``[NAME]`` (case-insensitive, stored upper);
- property lines are indented ``key value`` pairs — the key is
  matched case-insensitively (config_map lookups in the reference
  lowercase), the value is everything after the first whitespace run;
- ``#`` starts a comment (full-line);
- ``@INCLUDE <glob>`` splices other files, relative to the including
  file (flb_config.c static config include handling);
- ``@SET var=value`` defines a variable; ``${var}`` in any value is
  expanded from @SET vars first, then the process environment.

Out of scope (documented): [SERVICE] daemon/http_server/storage knobs
(the Ray runtime owns scheduling, buffering and metrics) — they are
surfaced in the returned meta, not acted on; network [OUTPUT] plugins
map to the corresponding FORMAT family in sinks/formats.py (transports
are out of scope per SURVEY §2.2).
"""

from __future__ import annotations

import glob as _glob
import os
import re

from .pipelines.pipeline import Pipeline

# --------------------------------------------------------------------- parse

_VAR_RE = re.compile(r"\$\{([A-Za-z_][A-Za-z0-9_]*)\}")

Section = tuple[str, list[tuple[str, str]]]


def _expand(value: str, env: dict) -> str:
    def sub(m: re.Match) -> str:
        name = m.group(1)
        if name in env:
            return env[name]
        return os.environ.get(name, "")
    return _VAR_RE.sub(sub, value)


def parse_classic(text: str, *, env: dict | None = None,
                  base_dir: str | None = None,
                  _depth: int = 0) -> list[Section]:
    """Parse classic-mode config text into ordered (SECTION, props).

    ``props`` preserves duplicate keys in file order (rule-type
    properties — grep Regex, modify Rename, rewrite_tag Rule — repeat).
    """
    if _depth > 8:
        raise ValueError("@INCLUDE nesting too deep (cycle?)")
    env = {} if env is None else env
    sections: list[Section] = []
    cur: list[tuple[str, str]] | None = None
    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        if line.startswith("@"):
            dparts = line.split(None, 1)
            d = dparts[0][1:].upper()
            rest = dparts[1].strip() if len(dparts) > 1 else ""
            if d == "SET":
                var, _, val = rest.partition("=")
                env[var.strip()] = _expand(val.strip(), env)
            elif d == "INCLUDE":
                if base_dir is None:
                    raise ValueError("@INCLUDE needs a base_dir")
                pat = _expand(rest, env)
                if not os.path.isabs(pat):
                    pat = os.path.join(base_dir, pat)
                paths = sorted(_glob.glob(pat))
                if not paths:
                    raise FileNotFoundError(f"@INCLUDE matched nothing: {pat}")
                for p in paths:
                    with open(p) as f:
                        sections.extend(parse_classic(
                            f.read(), env=env,
                            base_dir=os.path.dirname(p), _depth=_depth + 1))
                cur = None  # include boundary ends any open section
            else:
                raise ValueError(f"unknown directive @{d}")
            continue
        if line.startswith("[") and line.endswith("]"):
            cur = []
            sections.append((line[1:-1].strip().upper(), cur))
            continue
        if cur is None:
            raise ValueError(f"property outside any section: {line!r}")
        parts = line.split(None, 1)
        key, val = parts[0], (parts[1] if len(parts) > 1 else "")
        cur.append((key.lower(), _expand(val.strip(), env)))
    return sections


def load_classic(path: str, *, env: dict | None = None) -> list[Section]:
    with open(path) as f:
        return parse_classic(f.read(), env=env,
                             base_dir=os.path.dirname(os.path.abspath(path)))


# --------------------------------------------------------- property helpers

def _get(props: list[tuple[str, str]], key: str, default=None):
    for k, v in props:
        if k == key:
            return v
    return default


def _getall(props: list[tuple[str, str]], *keys: str) -> list[tuple[str, str]]:
    want = set(keys)
    return [(k, v) for k, v in props if k in want]


def _bool(v, default: bool = False) -> bool:
    """flb_utils_bool: true/on/yes (case-insensitive) are true."""
    if v is None:
        return default
    return str(v).strip().lower() in ("true", "on", "yes", "1")


_INTERVAL_RE = re.compile(r"^(\d+)\s*([smhd]?)$", re.I)
_INTERVAL_MULT = {"": 1, "s": 1, "m": 60, "h": 3600, "d": 86400}


def _interval_s(v: str | None, default: int = 60) -> int:
    """Parse a throttle-style interval ('30', '30s', '5m', '1h')."""
    if v is None:
        return default
    m = _INTERVAL_RE.match(str(v).strip())
    if not m:
        raise ValueError(f"bad interval: {v!r}")
    return int(m.group(1)) * _INTERVAL_MULT[m.group(2).lower()]


def _dollar(field: str) -> str:
    """grep/rewrite_tag accept bare key names; RecordAccessor wants $."""
    f = field.strip()
    return f if f.startswith("$") else "$" + f


# ------------------------------------------------------------- parsers.conf

def parser_specs(sections: list[Section]) -> dict[str, dict]:
    """[PARSER] sections → ``parsers.build_parser`` spec dicts.

    Reference loader: flb_parser.c (flb_parser_conf_file) — Name,
    Format, Regex, Time_Key/Time_Format/Time_Keep, Types (space-
    separated field:type pairs), Decode_Field / Decode_Field_As lines
    (ordered; optional 3rd token try_next/do_next).
    """
    out: dict[str, dict] = {}
    for name, props in sections:
        if name != "PARSER":
            continue
        spec: dict = {"name": _get(props, "name"),
                      "format": (_get(props, "format") or "").lower()}
        if spec["name"] is None or not spec["format"]:
            raise ValueError("[PARSER] needs Name and Format")
        if spec["format"] == "regex":
            spec["regex"] = _get(props, "regex")
            if spec["regex"] is None:
                raise ValueError(f"[PARSER] {spec['name']}: regex format "
                                 "needs a Regex property")
            sev = _get(props, "skip_empty_values")
            if sev is not None:
                spec["skip_empty_values"] = _bool(sev, True)
        tk = _get(props, "time_key")
        if tk:
            spec["time_key"] = tk
            tf = _get(props, "time_format")
            if tf:
                spec["time_format"] = tf
            spec["time_keep"] = _bool(_get(props, "time_keep"))
        types = _get(props, "types")
        if types:
            pairs = [p.split(":", 1) for p in types.split()]
            spec["types"] = {k: t for k, t in pairs}
        decs = []
        for k, v in _getall(props, "decode_field", "decode_field_as"):
            toks = v.split()
            if len(toks) < 2:
                raise ValueError(f"bad {k} line: {v!r}")
            backend, field = toks[0], toks[1]
            if len(toks) > 2:  # optional try_next / do_next composition
                decs.append((k, field, backend, toks[2]))
            else:  # reference default: stop on failure (decoder.c:441-448)
                decs.append((k, field, backend))
        if decs:
            spec["decoders"] = decs
        out[spec["name"]] = spec
    return out


def multiline_parser_specs(sections: list[Section]) -> dict[str, dict]:
    """[MULTILINE_PARSER] sections → MultilineStage-shaped specs.

    The reference's multiline core (flb_ml_parser) is a state machine
    of ``rule "from_state" "/regex/" "to_state"`` lines; this engine's
    MultilineStage is firstline-anchored (SURVEY §2.1), so the
    translation takes the start_state rule's regex as ``firstline``
    and keeps the full rule list in the spec for inspection.
    """
    out: dict[str, dict] = {}
    for name, props in sections:
        if name != "MULTILINE_PARSER":
            continue
        pname = _get(props, "name")
        if not pname:
            raise ValueError("[MULTILINE_PARSER] needs Name")
        rules = []
        firsts = []
        for _, v in _getall(props, "rule"):
            toks = re.findall(r'"([^"]*)"', v)
            if len(toks) != 3:
                raise ValueError(f"bad rule line: {v!r}")
            frm, rx, to = toks
            rx = rx[1:-1] if rx.startswith("/") and rx.endswith("/") else rx
            rules.append((frm, rx, to))
            if frm == "start_state":
                firsts.append(rx)
        if not firsts:
            raise ValueError(f"[MULTILINE_PARSER] {pname}: no start_state rule")
        # several start_state rules = alternatives tried in order
        # (flb_ml rule list) -> one alternation anchor
        firstline = firsts[0] if len(firsts) == 1 else \
            "|".join(f"(?:{r})" for r in firsts)
        spec = {"name": pname, "firstline": firstline, "rules": rules}
        ft = _get(props, "flush_timeout")
        if ft is not None:
            spec["flush_gap_s"] = float(ft) / 1000.0  # Flush_MS analogue
        out[pname] = spec
    return out


# ------------------------------------------------------- filter translation

def _f_grep(props, ctx):
    rules = []
    for k, v in _getall(props, "regex", "exclude"):
        toks = v.split(None, 1)
        if len(toks) != 2:
            raise ValueError(f"grep {k} needs 'field pattern': {v!r}")
        rules.append((k, _dollar(toks[0]), toks[1]))
    return {"type": "grep", "rules": rules}


_MODIFY_CONDS = {
    "key_exists": 1, "key_does_not_exist": 1, "a_key_matches": 1,
    "no_key_matches": 1, "key_value_equals": 2,
    "key_value_does_not_equal": 2, "key_value_matches": 2,
    "key_value_does_not_match": 2,
    "matching_keys_have_matching_values": 2,
    "matching_keys_do_not_have_matching_values": 2,
}
_MODIFY_OPS = {"rename": 2, "hard_rename": 2, "add": 2, "set": 2,
               "copy": 2, "hard_copy": 2, "remove": 1,
               "remove_wildcard": 1, "remove_regex": 1}


def _f_modify(props, ctx):
    conditions, rules = [], []
    for k, v in props:
        if k == "condition":
            toks = v.split(None, 1)
            if not toks:
                raise ValueError("modify Condition needs a value")
            kind = toks[0].lower()
            rest = toks[1] if len(toks) > 1 else ""
            if kind not in _MODIFY_CONDS:
                raise ValueError(f"unknown modify condition {kind!r}")
            if _MODIFY_CONDS[kind] == 1:
                conditions.append((kind, rest.strip()))
            else:
                ab = rest.strip().split(None, 1)
                conditions.append((kind, ab[0],
                                   ab[1] if len(ab) > 1 else ""))
        elif k in _MODIFY_OPS:
            if _MODIFY_OPS[k] == 1:
                rules.append((k, v.strip()))
            else:
                ab = v.split(None, 1)
                if not ab:
                    raise ValueError(f"modify {k} needs a value")
                rules.append((k, ab[0], ab[1] if len(ab) > 1 else ""))
    return {"type": "modify", "rules": rules, "conditions": conditions}


def _f_record_modifier(props, ctx):
    spec: dict = {"type": "record_modifier"}
    records = [(sp[0], sp[1] if len(sp) > 1 else "")
               for _, v in _getall(props, "record")
               for sp in [v.split(None, 1)]]
    if records:
        spec["records"] = records
    removes = [v for _, v in _getall(props, "remove_key")]
    if removes:
        spec["remove_keys"] = removes
    allows = [v for _, v in _getall(props, "allowlist_key", "whitelist_key")]
    if allows:
        spec["whitelist_keys"] = allows
    return spec


def _f_nest(props, ctx):
    spec: dict = {"type": "nest",
                  "operation": (_get(props, "operation") or "").lower()}
    wc = [v for _, v in _getall(props, "wildcard")]
    if wc:
        spec["wildcard"] = wc
    for src, dst in (("nest_under", "nest_under"),
                     ("nested_under", "nested_under"),
                     ("remove_prefix", "remove_prefix"),
                     ("add_prefix", "add_prefix")):
        v = _get(props, src)
        if v is not None:
            spec[dst] = v
    return spec


def _f_parser(props, ctx):
    names = [v for _, v in _getall(props, "parser")]
    missing = [n for n in names if n not in ctx["parsers"]]
    if missing:
        raise ValueError(f"filter parser references unknown parser(s) "
                         f"{missing}; pass parsers.conf")
    spec: dict = {"type": "parser",
                  "parsers": [ctx["parsers"][n] for n in names]}
    kn = _get(props, "key_name")
    if kn:
        spec["key_name"] = kn
    rd = _get(props, "reserve_data")
    if rd is not None:
        spec["reserve_data"] = _bool(rd)
    pk = _get(props, "preserve_key")
    if pk is not None:
        spec["preserve_key"] = _bool(pk)
    return spec


def _f_rewrite_tag(props, ctx):
    rules = []
    for _, v in _getall(props, "rule"):
        toks = v.split()
        if len(toks) != 4:
            raise ValueError(f"rewrite_tag Rule needs 4 tokens "
                             f"(KEY REGEX NEW_TAG KEEP): {v!r}")
        field, rx, tmpl, keep = toks
        rules.append((_dollar(field), rx, tmpl, _bool(keep)))
    return {"type": "rewrite_tag", "rules": rules}


def _f_throttle(props, ctx):
    return {"type": "throttle",
            "rate": int(_get(props, "rate", 1)),
            "interval_s": _interval_s(_get(props, "interval"), 1)}


def _f_throttle_size(props, ctx):
    spec = {"type": "throttle_size",
            "limit_bytes": int(_get(props, "rate", 1024)),
            "interval_s": _interval_s(_get(props, "interval"), 1)}
    for src, dst in (("name_field", "name_field"),
                     ("size_field", "size_field")):
        v = _get(props, src)
        if v is not None:
            spec[dst] = v
    return spec


def _f_expect(props, ctx):
    checks = []
    for k, v in props:
        if k in ("key_exists", "key_not_exists", "key_val_is_null",
                 "key_val_is_not_null"):
            checks.append((k, v.strip()))
        elif k == "key_val_eq":
            ab = v.split(None, 1)
            if not ab:
                raise ValueError("expect key_val_eq needs 'key value'")
            checks.append((k, ab[0], ab[1] if len(ab) > 1 else ""))
    spec: dict = {"type": "expect", "checks": checks}
    act = _get(props, "action")
    if act:
        spec["action"] = act
    return spec


def _f_stdout(props, ctx):
    return {"type": "stdout"}


def _f_alter_size(props, ctx):
    return {"type": "alter_size",
            "add": int(_get(props, "add", 0)),
            "remove": int(_get(props, "remove", 0))}


def _f_geoip2(props, ctx):
    spec: dict = {"type": "geoip_enrich"}
    lk = _get(props, "lookup_key")
    if lk:
        spec["lookup_key"] = lk.lstrip("$")
    return spec


def _f_kubernetes(props, ctx):
    spec: dict = {"type": "kubernetes_enrich"}
    ml = _get(props, "merge_log")
    if ml is not None:
        spec["merge_log"] = _bool(ml)
    kl = _get(props, "keep_log")
    if kl is not None:
        spec["keep_log"] = _bool(kl, True)
    ttl = _get(props, "kube_meta_cache_ttl")
    if ttl is not None:
        spec["ttl_s"] = float(_interval_s(ttl, 60))
    dim = _get(props, "dim_path")  # engine extension: offline meta table
    if dim is not None:
        spec["dim_path"] = dim
    return spec


def _f_tensorflow(props, ctx):
    spec: dict = {"type": "tensorflow",
                  "input_field": _get(props, "input_field", "input")}
    mf = _get(props, "model_file")  # reference property tensorflow.c:446
    if mf:
        spec["model_file"] = mf
        dim = _get(props, "input_dim")
        if dim is not None:
            spec["input_dim"] = int(dim)
    else:
        spec["input_dim"] = int(_get(props, "input_dim", 8))
    nv = _get(props, "normalization_value")
    if nv is not None:
        spec["normalization_value"] = float(nv)
    iif = _get(props, "include_input_fields")
    if iif is not None:
        spec["include_input_fields"] = _bool(iif, True)
    return spec


def _f_lua(props, ctx):
    """[FILTER] name lua → py_udf stage (documented substitution).

    The reference (plugins/filter_lua/lua.c:411-545) loads ``script``
    (a .lua file) and calls function ``call`` per record. There is no
    Lua runtime in this engine, so ``call`` names a PYTHON callable
    with the same (tag, ts, record) → (code[, ts], record) contract:
    either registered in-process via
    ``fluent_bit_ray.stages.misc.register_udf(name, fn)``, or defined
    in ``script`` when that is a path to a .py file (the file is
    exec'd once at build time and ``call`` looked up in its globals).
    """
    call = _get(props, "call")
    if not call:
        raise ValueError("filter lua: 'call' (function name) is required")
    script = _get(props, "script")
    if script and script.endswith(".py") and os.path.exists(script):
        import runpy
        ns = runpy.run_path(script)
        if call in ns and callable(ns[call]):
            return {"type": "py_udf", "fn": ns[call]}
    # no script / non-python script: resolve from the UDF registry by
    # name (PyUdfStage raises with the registered names if absent)
    return {"type": "py_udf", "fn": call}


def _f_const_enrich(plugin: str):
    """aws / apm_kubernetes_labels: constant-metadata appenders.

    The reference fills these from a metadata service / label source;
    offline, the constants come from explicit ``Record k v`` lines
    (engine extension — there is no IMDS here to query)."""
    def build(props, ctx):
        values = {sp[0]: (sp[1] if len(sp) > 1 else "")
                  for k, v in props if k == "record"
                  for sp in [v.split(None, 1)]}
        if not values:
            raise ValueError(
                f"filter {plugin}: no metadata source in this engine — "
                "supply the constants as 'Record key value' lines")
        return {"type": "const_enrich", "values": values}
    return build


def _f_apm_ldap(props, ctx):
    spec: dict = {"type": "lookup_enrich"}
    for src, dst in (("dim", "dim"), ("lookup_key", "lookup_key"),
                     ("prefix", "prefix")):
        v = _get(props, src)
        if v is not None:
            spec[dst] = v.lstrip("$") if src == "lookup_key" else v
    return spec


def _f_apm_uaparser(props, ctx):
    spec: dict = {"type": "ua_enrich"}
    lk = _get(props, "lookup_key")
    if lk:
        spec["lookup_key"] = lk.lstrip("$")
    return spec


def _f_apm_url_normalizer(props, ctx):
    spec: dict = {"type": "url_normalize"}
    col = _get(props, "column") or _get(props, "lookup_key")
    if col:
        spec["column"] = col.lstrip("$")
    out = _get(props, "out_column")
    if out:
        spec["out_column"] = out
    return spec


def _f_apm_message_formatter(props, ctx):
    tmpl = _get(props, "template")
    if tmpl is None:
        raise ValueError("apm_message_formatter needs a Template property")
    spec: dict = {"type": "message_format", "template": tmpl}
    ok = _get(props, "out_key")
    if ok:
        spec["out_key"] = ok
    return spec


FILTER_BUILDERS = {
    "grep": _f_grep,
    "modify": _f_modify,
    "record_modifier": _f_record_modifier,
    "nest": _f_nest,
    "parser": _f_parser,
    "rewrite_tag": _f_rewrite_tag,
    "throttle": _f_throttle,
    "throttle_size": _f_throttle_size,
    "expect": _f_expect,
    "stdout": _f_stdout,
    "alter_size": _f_alter_size,
    "geoip2": _f_geoip2,
    "kubernetes": _f_kubernetes,
    "tensorflow": _f_tensorflow,
    "lua": _f_lua,
    "aws": _f_const_enrich("aws"),
    "apm_kubernetes_labels": _f_const_enrich("apm_kubernetes_labels"),
    "apm_geoip": _f_geoip2,
    "apm_ldap": _f_apm_ldap,
    "apm_uaparser": _f_apm_uaparser,
    "apm_url_normalizer": _f_apm_url_normalizer,
    "apm_message_formatter": _f_apm_message_formatter,
}


# ------------------------------------------------------------ pipeline build

def build_pipeline(conf: str | list[Section],
                   parsers_conf: str | list[Section] | None = None,
                   **pipeline_kw) -> tuple[Pipeline, dict]:
    """Translate a classic config into a (Pipeline, meta) pair.

    ``conf`` is classic config text or pre-parsed sections;
    ``parsers_conf`` likewise for the parsers file (a [SERVICE]
    ``parsers_file`` property is resolved only when it is an absolute
    path — pass the text explicitly otherwise). ``meta`` carries the
    [SERVICE] map, the [INPUT] specs (this engine reads its canonical
    parquet source; input name/tag inform tagging only) and the
    [OUTPUT] specs (alias, plugin name, match, format props) in config
    order, aligned with the router's sink list.
    """
    sections = parse_classic(conf) if isinstance(conf, str) else conf
    psecs: list[Section] = []
    if parsers_conf is not None:
        psecs = (parse_classic(parsers_conf)
                 if isinstance(parsers_conf, str) else parsers_conf)

    service = {k: v for name, props in sections if name == "SERVICE"
               for k, v in props}
    pfile = service.get("parsers_file")
    if pfile and os.path.isabs(pfile) and os.path.exists(pfile):
        psecs = psecs + load_classic(pfile)
    parsers = parser_specs(psecs)
    ml_parsers = multiline_parser_specs(psecs)
    ctx = {"parsers": parsers, "multiline_parsers": ml_parsers}

    inputs: list[dict] = []
    stages: list[dict] = []
    outputs: list[dict] = []
    sinks: list[tuple] = []
    seen_aliases: set[str] = set()

    for name, props in sections:
        if name == "INPUT":
            inp = dict(props)
            # in_tail's multiline.parser property: resolve to the
            # [MULTILINE_PARSER] spec (firstline + flush_gap_s) so a
            # MultilineStage can be built directly from the input
            mlp = inp.get("multiline.parser")
            if mlp:
                names = [n.strip() for n in mlp.split(",")]
                missing = [n for n in names if n not in ml_parsers]
                if missing:
                    raise ValueError(f"input multiline.parser references "
                                     f"unknown parser(s) {missing}")
                inp["multiline_specs"] = [ml_parsers[n] for n in names]
            inputs.append(inp)
        elif name == "FILTER":
            plugin = _get(props, "name")
            if plugin not in FILTER_BUILDERS:
                raise ValueError(f"unsupported filter plugin {plugin!r} "
                                 f"(have: {sorted(FILTER_BUILDERS)})")
            spec = FILTER_BUILDERS[plugin](props, ctx)
            spec["match"] = _get(props, "match", "*")
            mre = _get(props, "match_regex")
            if mre is not None:
                spec["match"] = mre
                spec["match_regex"] = True
            stages.append(spec)
        elif name == "OUTPUT":
            plugin = _get(props, "name")
            if not plugin:
                raise ValueError("[OUTPUT] needs a name")
            alias = _get(props, "alias", plugin)
            base, n = alias, 1
            while alias in seen_aliases:
                n += 1
                alias = f"{base}.{n}"
            seen_aliases.add(alias)
            match = _get(props, "match", "*")
            mre = _get(props, "match_regex")
            if mre is not None:
                sinks.append((alias, mre, True))
            else:
                sinks.append((alias, match))
            outputs.append({"alias": alias, "plugin": plugin,
                            **{k: v for k, v in props
                               if k not in ("name", "alias")}})

    if not sinks:
        sinks = [("all", "*")]

    tag_prefix = pipeline_kw.pop("tag_prefix", None)
    if tag_prefix is None:
        # single literal input Tag (no wildcard) → use it as the prefix
        tags = [i.get("tag") for i in inputs if i.get("tag")]
        if len(tags) == 1 and not any(c in tags[0] for c in "*?"):
            tag_prefix = tags[0]
        else:
            tag_prefix = "transcript"

    pipe = Pipeline(stages=stages, sinks=sinks, tag_prefix=tag_prefix,
                    **pipeline_kw)
    meta = {"service": service, "inputs": inputs, "outputs": outputs,
            "parsers": parsers, "multiline_parsers": ml_parsers}
    return pipe, meta
