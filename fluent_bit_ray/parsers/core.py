"""The four Fluent Bit parser formats, vectorized over Arrow columns.

Semantics mirrored from the reference (no code ported):
- dispatcher ``flb_parser_do`` → regex/json/ltsv/logfmt
  (reference src/flb_parser.c:641-660);
- regex: named captures → ordered map, zero-length captures skipped
  (reference src/flb_parser_regex.c:183-200), per-field typecast,
  time-key extraction with optional ``time_keep``;
- json: object → map, time-key lookup/removal
  (reference src/flb_parser_json.c:117-220);
- ltsv: ``k:v<TAB>...`` (reference src/flb_parser_ltsv.c:200);
- logfmt: ``k=v k2="v 2"`` (reference src/flb_parser_logfmt.c:251);
- typecast int/float/bool/string/hex (reference src/flb_parser.c:868);
- decoders json/escaped/escaped_utf8/mysql_quoted
  (reference src/flb_parser_decoder.c:388-464).

API: ``parser.parse_column(arr)`` takes a pyarrow (or numpy/object)
string array and returns ``(maps, times)`` where ``maps`` is a list of
per-row dict-or-None (None = parser miss; the filter stage keeps the
original record on miss, reference plugins/filter_parser/filter_parser.c:330-333)
and ``times`` is a datetime64[ns] numpy array (NaT when the parser
declares no time key or lookup missed).

The regex parser has an Arrow fast path (``pc.extract_regex``) and a
Python ``re`` fallback for syntax RE2 can't compile.
"""

from __future__ import annotations

import json
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

try:  # orjson: ~5× stdlib on the JSON-parser hot path
    import orjson as _orjson
except ImportError:  # pragma: no cover
    _orjson = None

from ..record import fields_dumps as fields_dumps_obj
from .timeparse import parse_epoch_column, parse_time_column

_NAT = np.datetime64("NaT")


def typecast(value, ttype: str):
    """Cast one extracted string per declared type; keep string on failure."""
    if value is None:
        return None
    try:
        if ttype in ("integer", "int"):
            return int(value)
        if ttype == "float":
            return float(value)
        if ttype in ("bool", "boolean"):
            v = str(value).lower()
            if v in ("true", "t", "1", "yes"):
                return True
            if v in ("false", "f", "0", "no"):
                return False
            return value
        if ttype == "hex":
            return int(str(value), 16)
    except (ValueError, TypeError):
        return value
    return value


_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", "a": "\a", '"': '"', "\\": "\\", "/": "/"}


def _unescape(s: str, utf8: bool = False) -> str:
    out = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "\\" and i + 1 < n:
            nxt = s[i + 1]
            if nxt == "u" and i + 5 < n:
                try:
                    out.append(chr(int(s[i + 2:i + 6], 16)))
                    i += 6
                    continue
                except ValueError:
                    pass
            if nxt in _ESCAPES and (utf8 is False or nxt in ('"', "\\", "/")):
                out.append(_ESCAPES[nxt])
                i += 2
                continue
            if utf8:
                out.append(nxt)
                i += 2
                continue
        out.append(c)
        i += 1
    return "".join(out)


def _decode_backend(backend: str, data):
    """One decoder backend run → (ok, value, is_object).

    Mirrors reference src/flb_parser_decoder.c: json must yield exactly
    one OBJECT (decoder.c:62-70); escaped/escaped_utf8/mysql_quoted are
    string rewrites that always succeed.
    """
    if backend == "json":
        try:
            obj = json.loads(data)
        except (ValueError, TypeError):
            return False, None, False
        if not isinstance(obj, dict):
            return False, None, False
        return True, obj, True
    if backend == "escaped":
        return True, _unescape(data), False
    if backend == "escaped_utf8":
        return True, _unescape(data, utf8=True), False
    if backend == "mysql_quoted":
        v = data
        if len(v) >= 2 and v[0] == v[-1] and v[0] in ("'", '"'):
            v = v[1:-1]
        return True, v.replace("''", "'").replace("\\'", "'"), False
    raise ValueError(f"unknown decoder backend {backend!r}")


def apply_decoders(fields: dict, decoders: list[tuple]) -> dict:
    """Apply an ordered decoder ruleset to a parsed map.

    Rules are (action, field, backend[, rule_action]) mirroring the
    reference's ``Decode_Field`` / ``Decode_Field_As`` with optional
    ``try_next`` / ``do_next`` composition
    (src/flb_parser_decoder.c:380-485 rule loop, :674-727 config):

    - "decode_field_as": replace the field's value in place with the
      decoded result (string or object);
    - "decode_field": merge the decoded OBJECT's keys into the record
      as extra keys appended at the end (merge_record_and_extra_keys);
      a string result is not allowed as extra keys (decoder.c:509-511)
      — the original value stays;
    - on backend FAILURE: try_next/do_next → continue with the next
      rule, no action → stop (decoder.c:441-448);
    - on SUCCESS: do_next → keep applying rules (the working value for
      later rules is the decode_field_as result), else stop
      (decoder.c:480-484);
    - a decode_field rule with do_next is skipped once a decode_field
      already succeeded (decoder.c:408-412); once a decode_field_as
      produced an OBJECT, later rules skip (decoder.c:414-416).
    """
    by_field: dict[str, list] = {}
    for rule in decoders:
        action, field, backend = rule[0], rule[1], rule[2]
        rule_action = rule[3] if len(rule) > 3 else ""
        by_field.setdefault(field, []).append((action, backend, rule_action))

    extra: dict = {}
    for field, rules in by_field.items():
        if field not in fields:
            continue
        val = fields[field]
        if not isinstance(val, str):
            continue
        data = val                  # working value (updated by _as rules)
        data_is_obj = False
        is_decoded = False          # a decode_field produced extra keys
        is_decoded_as = False
        out_obj = None              # the extra-keys object
        for action, backend, rule_action in rules:
            if action == "decode_field" and rule_action == "do_next" \
                    and is_decoded:
                continue
            if is_decoded_as and data_is_obj:
                continue
            ok, decoded, is_obj = _decode_backend(backend, data)
            if not ok:
                if rule_action in ("try_next", "do_next"):
                    continue
                break
            if action == "decode_field_as":
                data = decoded
                data_is_obj = is_obj
                is_decoded_as = True
            else:  # decode_field
                is_decoded = True
                # The reference overwrites out_sds/out_type on EVERY
                # decode_field success (decoder.c:505-511): a trailing
                # string result means nothing is merged, even if an
                # earlier rule captured an object.
                out_obj = decoded if is_obj else None
            if rule_action == "do_next":
                continue
            break
        if is_decoded_as:
            fields[field] = data
        if out_obj is not None:
            extra.update(out_obj)
    if extra:
        for k, v in extra.items():  # appended at the record's end
            fields[k] = v
    return fields


class Parser:
    """Base parser: common time-lookup / typecast / decoder plumbing."""

    fmt = "base"

    def __init__(self, name: str, time_key: str | None = None,
                 time_format: str | None = None, time_keep: bool = False,
                 types: dict[str, str] | None = None,
                 decoders: list[tuple[str, str, str]] | None = None,
                 prefilter: tuple[str, str] | None = None):
        self.name = name
        self.time_key = time_key
        self.time_format = time_format
        self.time_keep = time_keep
        self.types = types or {}
        self.decoders = decoders or []
        # ("substring"|"prefix", literal): a cheap candidate scan that
        # must be a SUPERSET of the parser's match condition — rows
        # failing it skip this parser entirely (pure optimization; the
        # parser itself remains the authority on candidate rows)
        self.prefilter = prefilter

    # -- subclass hook ------------------------------------------------
    def _parse_values(self, values: list) -> list[dict | None]:
        raise NotImplementedError

    # -- shared driver ------------------------------------------------
    def parse_column(self, arr) -> tuple[list[dict | None], np.ndarray]:
        """``arr``: pyarrow (chunked) string array OR a Python list.

        Arrow input stays Arrow on the RegexParser fast path (no
        per-row object materialization for unmatched rows); other
        parsers convert once.
        """
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if isinstance(arr, pa.Array) and not isinstance(self, RegexParser):
            values = arr.to_pylist()
        else:
            values = arr if isinstance(arr, pa.Array) else list(arr)
        maps = self._parse_values(values)
        times = self._extract_times(maps)
        if self.types and not getattr(self, "_types_inlined", False):
            for m in maps:
                if m:
                    for k, t in self.types.items():
                        if k in m:
                            m[k] = typecast(m[k], t)
        if self.decoders:
            for m in maps:
                if m:
                    apply_decoders(m, self.decoders)
        return maps, times

    def _extract_times(self, maps: list[dict | None]) -> np.ndarray:
        n = len(maps)
        times = np.full(n, _NAT, dtype="datetime64[ns]")
        if not self.time_key:
            return times
        raw = [None] * n
        hit = []
        for i, m in enumerate(maps):
            if m is not None and self.time_key in m:
                v = m[self.time_key]
                raw[i] = v if isinstance(v, str) else str(v)
                hit.append(i)
                if not self.time_keep:
                    del m[self.time_key]
        if not hit:
            return times
        vals = [raw[i] for i in hit]
        if self.time_format:
            parsed = parse_time_column(vals, self.time_format)
        else:
            parsed = parse_epoch_column(vals)
        for j, i in enumerate(hit):
            times[i] = parsed[j]
        return times


class RegexParser(Parser):
    fmt = "regex"

    def __init__(self, name: str, pattern: str, skip_empty_values: bool = True,
                 **kw):
        super().__init__(name, **kw)
        self.pattern = pattern
        self.skip_empty = skip_empty_values
        # Onigmo uses (?<name>...); translate to (?P<name>...) for both engines
        py_pat = re.sub(r"\(\?<([A-Za-z_]\w*)>", r"(?P<\1>", pattern)
        self._py = re.compile(py_pat)
        self._group_names = [g for g in self._py.groupindex]
        # Arrow/RE2 fast path: probe compile once
        self._arrow_ok = True
        try:
            pc.extract_regex(pa.array(["probe"], type=pa.string()), pattern=py_pat)
        except pa.ArrowInvalid:
            self._arrow_ok = False
        self._arrow_pattern = py_pat
        # vector fast path (fields JSON built with Arrow kernels, no
        # per-row dicts): only safe when semantics are fully covered
        self._vector_ok = (self._arrow_ok and not self.decoders
                           and self.skip_empty
                           and all(t in ("integer", "int")
                                   for t in self.types.values()))

    # -- vector fast path ---------------------------------------------
    @staticmethod
    def _quote_escape(col: pa.Array) -> pa.Array:
        e = pc.replace_substring(col, pattern="\\", replacement="\\\\")
        e = pc.replace_substring(e, pattern='"', replacement='\\"')
        return pc.binary_join_element_wise(pa.scalar('"'), e, pa.scalar('"'),
                                           pa.scalar(""))

    def vector_parse(self, arr: pa.Array, promote_keys=()):
        """Arrow-native parse: returns None when ineligible, else
        ``(hit_mask, json_strs, times, promoted)`` where hit_mask is a
        bool numpy over ``arr``; json_strs/times/promoted align to the
        matched subset. Semantics identical to the dict path (empty
        captures skipped, integer typecast, time key consumed) — the
        fields map is serialized directly to JSON with compute kernels,
        with no Python objects for non-promoted captures.
        """
        if not self._vector_ok:
            return None
        st = pc.extract_regex(arr, pattern=self._arrow_pattern)
        valid = pc.is_valid(st)
        hit_mask = valid.to_numpy(zero_copy_only=False)
        if not hit_mask.any():
            return hit_mask, [], np.empty(0, dtype="datetime64[ns]"), {}
        matched_src = arr.filter(valid)
        # rows with control chars need full JSON escaping → fallback
        ctrl = pc.match_substring_regex(matched_src,
                                        pattern="[\\x00-\\x1f]")
        if pc.any(ctrl).as_py():
            return None
        sub = st.filter(valid)
        names = [f.name for f in st.type]
        n_hit = len(matched_src)

        pieces = []
        time_col = None
        for g, name in enumerate(names):
            col = sub.field(g)
            if name == self.time_key:
                time_col = col
                if not self.time_keep:
                    continue  # consumed from the map
            if self.types.get(name) in ("integer", "int"):
                digits = pc.match_substring_regex(col, pattern=r"^\d{1,18}$")
                safe = pc.if_else(digits, col, pa.scalar("0"))
                as_int = pc.cast(pc.cast(safe, pa.int64()), pa.string())
                val = pc.if_else(digits, as_int, self._quote_escape(col))
            else:
                val = self._quote_escape(col)
            piece = pc.if_else(
                pc.equal(col, ""), pa.scalar(""),
                pc.binary_join_element_wise(pa.scalar(f',"{name}":'), val,
                                            pa.scalar("")))
            pieces.append(piece)
        if pieces:
            concat = pc.binary_join_element_wise(*pieces, pa.scalar("")) \
                if len(pieces) > 1 else pieces[0]
            stripped = pc.replace_substring(concat, pattern=",",
                                            replacement="",
                                            max_replacements=1)
            json_col = pc.binary_join_element_wise(
                pa.scalar("{"), stripped, pa.scalar("}"), pa.scalar(""))
            json_strs = json_col.to_pylist()
        else:
            json_strs = ["{}"] * n_hit

        times = np.full(n_hit, np.datetime64("NaT"), dtype="datetime64[ns]")
        if time_col is not None:
            raw = time_col.to_pylist()
            present = [i for i, v in enumerate(raw) if v]
            if present:
                vals = [raw[i] for i in present]
                parsed = (parse_time_column(vals, self.time_format)
                          if self.time_format else parse_epoch_column(vals))
                for j, i in enumerate(present):
                    times[i] = parsed[j]

        promoted = {}
        for key in promote_keys:
            if key not in names:
                continue
            if key == self.time_key and not self.time_keep:
                continue
            t = self.types.get(key)
            raw = sub.field(names.index(key)).to_pylist()
            if t:
                promoted[key] = [typecast(v, t) if v else None for v in raw]
            else:
                promoted[key] = [v if v != "" else None for v in raw]
        return hit_mask, json_strs, times, promoted

    def _parse_values(self, values) -> list[dict | None]:
        if self._arrow_ok:
            arr = (values if isinstance(values, pa.Array)
                   else pa.array(values, type=pa.string()))
            st = pc.extract_regex(arr, pattern=self._arrow_pattern)
            valid = pc.is_valid(st)
            out: list[dict | None] = [None] * len(values)
            n_hit = pc.sum(valid.cast(pa.int8())).as_py() or 0
            if n_hit == 0:
                return out
            # materialize captured values for MATCHED rows only
            hit_idx = np.nonzero(valid.to_numpy(zero_copy_only=False))[0]
            sub = st.filter(valid)
            names = [f.name for f in st.type]
            cols = [sub.field(i).to_pylist() for i in range(st.type.num_fields)]
            if self.types:
                # typecast once per captured column (not per row-dict)
                self._types_inlined = True
                for g, nm in enumerate(names):
                    t = self.types.get(nm)
                    if t:
                        cols[g] = [typecast(v, t) if v else v
                                   for v in cols[g]]
            nm = tuple(names)
            if self.skip_empty:
                # zero-length captures skipped (flb_parser_regex.c:183-200)
                hits = [{k: v for k, v in zip(nm, r) if v != ""}
                        for r in zip(*cols)]
            else:
                hits = [dict(zip(nm, r)) for r in zip(*cols)]
            for j, i in enumerate(hit_idx):
                out[i] = hits[j]
            return out
        if isinstance(values, pa.Array):
            values = values.to_pylist()
        out = []
        search = self._py.search
        for v in values:
            mt = search(v) if v is not None else None
            if mt is None:
                out.append(None)
                continue
            m = {}
            for nm in self._group_names:
                v2 = mt.group(nm)
                if v2 is None or (v2 == "" and self.skip_empty):
                    continue
                m[nm] = v2
            out.append(m)
        return out


class JsonParser(Parser):
    fmt = "json"

    def vector_parse(self, arr, promote_keys=()):
        """Single-pass parse: orjson loads → typecast → dumps, emitting
        the fields JSON and promoted values directly (the stage skips
        its per-row dict merge entirely). Decoder rules need the dict
        pipeline → ineligible.
        """
        if self.decoders or not getattr(self, "_vector_ok", True):
            return None
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        values = arr.to_pylist() if isinstance(arr, pa.Array) else list(arr)
        n = len(values)
        loads = _orjson.loads if _orjson is not None else json.loads
        hit_mask = np.zeros(n, dtype=bool)
        json_strs: list[str] = []
        raw_times: list[str | None] = []
        promoted = {k: [] for k in promote_keys}
        types = self.types
        tk, tkeep = self.time_key, self.time_keep
        for i, v in enumerate(values):
            if v is None:
                continue
            s = v.lstrip() if isinstance(v, str) else ""
            if not s.startswith("{"):
                continue
            try:
                obj = loads(v)
            except ValueError:
                continue
            if not isinstance(obj, dict):
                continue
            hit_mask[i] = True
            changed = False
            if types:
                for k, t in types.items():
                    if k in obj:
                        ov = obj[k]
                        nv = typecast(ov, t)
                        if type(nv) is not type(ov) or nv != ov:
                            obj[k] = nv
                            changed = True
            if tk is not None and tk in obj:
                tv = obj[tk]
                raw_times.append(tv if isinstance(tv, str) else str(tv))
                if not tkeep:
                    del obj[tk]
                    changed = True
            elif tk is not None:
                raw_times.append(None)
            # typecast was a no-op and no key was consumed → the raw
            # text IS the fields JSON (loads-identical); skip the dump
            json_strs.append(v if not changed else fields_dumps_obj(obj))
            for k in promote_keys:
                promoted[k].append(obj.get(k))
        n_hit = len(json_strs)
        times = np.full(n_hit, _NAT, dtype="datetime64[ns]")
        if tk is not None and n_hit:
            present = [j for j, rv in enumerate(raw_times) if rv]
            if present:
                vals = [raw_times[j] for j in present]
                parsed = (parse_time_column(vals, self.time_format)
                          if self.time_format else parse_epoch_column(vals))
                for j2, j in enumerate(present):
                    times[j] = parsed[j2]
        return hit_mask, json_strs, times, promoted

    def _parse_values(self, values: list) -> list[dict | None]:
        out = []
        loads = _orjson.loads if _orjson is not None else json.loads
        for v in values:
            if v is None:
                out.append(None)
                continue
            s = v.lstrip() if isinstance(v, str) else ""
            if not s.startswith("{"):
                out.append(None)
                continue
            try:
                obj = loads(v)
            except ValueError:
                out.append(None)
                continue
            out.append(obj if isinstance(obj, dict) else None)
        return out


class _KvVectorMixin:
    """Arrow-kernel fast path shared by ltsv/logfmt.

    Token-level RE2 rewrites turn a whole batch of ``k=v`` / ``k:v``
    lines into fields-JSON strings with zero per-row Python. Rows
    outside the provably-safe grammar — quotes/backslashes in values,
    control chars, duplicate promoted keys, or typed-field values the
    dict path would typecast but the canonical-number unquoter would
    not (``007``, ``+5``, ``1e3``, ``1_0``, bare ints for float
    fields) — fall back to the per-row dict path, so the two paths are
    semantically identical by construction (cross-checked by a
    hypothesis test in tests/test_parsers.py). Over-guarding only
    costs speed, never correctness.
    """

    _INT_CANON = r"-?(?:0|[1-9]\d*)"
    _FLOAT_CANON = r"-?(?:0|[1-9]\d*)\.\d+"

    def _init_vector(self):
        self._vector_ok = (not self.decoders and not self.time_key
                           and all(t in ("integer", "int", "float")
                                   for t in self.types.values()))
        pats = []
        for f, t in self.types.items():
            fe = re.escape(f)
            # typed field with a quoted value → dict path
            pats.append(self._bound + fe + self._eq + '"')
            if t in ("integer", "int"):
                bad = r"(?:[+]|-?(?:0\d|\d[\d_]*_))"
            else:
                # float()-parseable but non-canonical (or int-looking —
                # dict path yields 5.0, raw unquote would yield 5)
                bad = (r"(?:[+]|-?(?:[nNiI.]|0\d|\d[\d_]*[_eE]"
                       r"|\d+" + self._end +
                       r"|\d+\.(?:[eE]|" + self._end_inner + r")"
                       r"|\d+\.\d+[eE]))")
            pats.append(self._bound + fe + self._eq + bad)
        self._guard_patterns = pats

    def _dup_guard(self, k: str) -> str:
        ke = re.escape(k)
        return (self._bound + ke + self._eq + ".*" + self._sep_re
                + ke + self._eq)

    def vector_parse(self, arr, promote_keys=()):
        if not self._vector_ok:
            return None
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if not isinstance(arr, pa.Array):
            arr = pa.array(list(arr), type=pa.string())
        n = len(arr)
        valid = pc.is_valid(arr).to_numpy(zero_copy_only=False)
        elig = pc.fill_null(
            pc.match_substring_regex(arr, pattern=self._elig_pattern), False) \
            .to_numpy(zero_copy_only=False).copy()
        guard_keys = set(promote_keys) | set(self.types)
        guards = self._guard_patterns + [self._dup_guard(k)
                                         for k in sorted(guard_keys)]
        for gp in guards:
            g = pc.fill_null(pc.match_substring_regex(arr, pattern=gp), False)
            elig &= ~g.to_numpy(zero_copy_only=False)

        hit_mask = np.zeros(n, dtype=bool)
        out_json = np.full(n, None, dtype=object)
        out_prom = {k: np.full(n, None, dtype=object) for k in promote_keys}

        if elig.any():
            eidx = np.nonzero(elig)[0]
            sub = arr.take(pa.array(eidx))
            body = pc.replace_substring_regex(
                sub, pattern=self._build_pattern,
                replacement=self._build_repl)
            body = pc.replace_substring_regex(body, pattern=r",$",
                                              replacement="")
            js = pc.binary_join_element_wise(
                pa.scalar("{"), body, pa.scalar("}"), pa.scalar(""))
            for f, t in self.types.items():
                fe = re.escape(f)
                canon = (self._INT_CANON if t in ("integer", "int")
                         else self._FLOAT_CANON)
                js = pc.replace_substring_regex(
                    js, pattern=f'"{fe}":"({canon})"',
                    replacement=f'"{f}":\\1')
            out_json[eidx] = js.to_pylist()
            hit_mask[elig] = True  # grammar guarantees ≥1 kv pair
            for k in promote_keys:
                vals = self._extract_promote(sub, k)
                t = self.types.get(k)
                if t:
                    vals = [typecast(v, t) if v else None for v in vals]
                else:
                    vals = [v if v else None for v in vals]
                out_prom[k][eidx] = np.fromiter(vals, dtype=object,
                                                count=len(vals))

        rest = valid & ~elig
        if rest.any():
            ridx = np.nonzero(rest)[0]
            maps = self._parse_values(arr.take(pa.array(ridx)).to_pylist())
            for j, m in enumerate(maps):
                if m is None:
                    continue
                i = ridx[j]
                hit_mask[i] = True
                for k2, t in self.types.items():
                    if k2 in m:
                        m[k2] = typecast(m[k2], t)
                out_json[i] = fields_dumps_obj(m)
                for k in promote_keys:
                    v = m.get(k)
                    if v is not None and v != "":
                        out_prom[k][i] = v

        json_strs = out_json[hit_mask].tolist()
        times = np.full(len(json_strs), _NAT, dtype="datetime64[ns]")
        promoted = {k: out_prom[k][hit_mask].tolist() for k in promote_keys}
        return hit_mask, json_strs, times, promoted


class LtsvParser(_KvVectorMixin, Parser):
    fmt = "ltsv"

    _bound = r"(?:^|\t)"
    _eq = ":"
    _sep_re = r"\t"
    _end = r"(?:\t|$)"
    _end_inner = r"\t|$"
    _elig_pattern = (r'^[^\t:"\\\x00-\x1f]+:[^\t:"\\\x00-\x1f]*'
                     r'(?:\t[^\t:"\\\x00-\x1f]+:[^\t:"\\\x00-\x1f]*)*$')
    _build_pattern = r"([^\t:]+):([^\t]*)(?:\t|$)"
    _build_repl = r'"\1":"\2",'

    def __init__(self, name: str, **kw):
        super().__init__(name, **kw)
        self._init_vector()

    def _extract_promote(self, sub: pa.Array, k: str) -> list:
        st = pc.extract_regex(
            sub, pattern=self._bound + re.escape(k) + r":(?P<v>[^\t]*)")
        return pc.if_else(pc.is_valid(st), pc.struct_field(st, "v"),
                          pa.scalar(None, type=pa.string())).to_pylist()

    def _parse_values(self, values: list) -> list[dict | None]:
        out = []
        for v in values:
            if not v or ":" not in v:
                out.append(None)
                continue
            m = {}
            any_kv = False
            for tok in v.split("\t"):
                if ":" in tok:
                    k, _, val = tok.partition(":")
                    m[k] = val
                    any_kv = True
            out.append(m if any_kv else None)
        return out


_LOGFMT_TOKEN = re.compile(r'([\w.\-/@]+)=("(?:[^"\\]|\\.)*"|\S*)')


class LogfmtParser(_KvVectorMixin, Parser):
    fmt = "logfmt"

    _bound = r"(?:^| )"
    _eq = "="
    _sep_re = r" "
    _end = r"(?: |$)"
    _end_inner = r" |$"
    _QVAL = r'"[^"\\=\x00-\x1f]*"'
    _UVAL = r'[^"\s\\=\x00-\x1f]*'
    _elig_pattern = (r'^[\w.\-/@]+=(?:' + _QVAL + '|' + _UVAL + r')'
                     r'(?: [\w.\-/@]+=(?:' + _QVAL + '|' + _UVAL + r'))*$')
    _build_pattern = r'([\w.\-/@]+)=(?:"([^"\\=]*)"|([^"\s\\=]*))(?: |$)'
    _build_repl = r'"\1":"\2\3",'

    def __init__(self, name: str, **kw):
        super().__init__(name, **kw)
        self._init_vector()

    def _extract_promote(self, sub: pa.Array, k: str) -> list:
        ke = re.escape(k)
        q = pc.extract_regex(
            sub, pattern=self._bound + ke + r'="(?P<v>[^"\\=]*)"')
        u = pc.extract_regex(
            sub, pattern=self._bound + ke + r'=(?P<v>[^"\s\\=]*)')
        qv = pc.if_else(pc.is_valid(q), pc.struct_field(q, "v"),
                        pa.scalar(None, type=pa.string()))
        uv = pc.if_else(pc.is_valid(u), pc.struct_field(u, "v"),
                        pa.scalar(None, type=pa.string()))
        return pc.if_else(pc.is_valid(qv), qv, uv).to_pylist()

    def _parse_values(self, values: list) -> list[dict | None]:
        out = []
        finditer = _LOGFMT_TOKEN.finditer
        for v in values:
            if not v or "=" not in v:
                out.append(None)
                continue
            m = {}
            for mt in finditer(v):
                k, val = mt.group(1), mt.group(2)
                if val.startswith('"') and val.endswith('"') and len(val) >= 2:
                    val = _unescape(val[1:-1])
                m[k] = val
            out.append(m if m else None)
        return out


_PARSER_TYPES = {"regex": RegexParser, "json": JsonParser,
                 "ltsv": LtsvParser, "logfmt": LogfmtParser}


def build_parser(spec: dict) -> Parser:
    """Build a parser from a config dict (the [PARSER] section analogue).

    Keys: name, format (regex|json|ltsv|logfmt), regex (for format=regex),
    time_key, time_format, time_keep, types ({field: type}),
    decoders ([(action, field, backend), ...]).
    """
    spec = dict(spec)
    fmt = spec.pop("format")
    name = spec.pop("name")
    cls = _PARSER_TYPES[fmt]
    kw = {k: spec[k] for k in ("time_key", "time_format", "time_keep",
                               "types", "decoders", "prefilter") if k in spec}
    if "prefilter" in kw and kw["prefilter"] is not None:
        kw["prefilter"] = tuple(kw["prefilter"])
    if fmt == "regex":
        return cls(name, pattern=spec["regex"],
                   skip_empty_values=spec.get("skip_empty_values", True), **kw)
    return cls(name, **kw)


# The engine's default parser set over the synthetic transcript grammars
# (analogue of conf/parsers.conf; the apache pattern follows the same
# named-group shape as conf/parsers.conf:2-6).
APACHE_PATTERN = (
    r'^(?P<host>[^ ]*) [^ ]* (?P<user>[^ ]*) \[(?P<time>[^\]]*)\] '
    r'"(?P<method>\S+)(?: +(?P<path>[^\"]*?)(?: +\S*)?)?" '
    r'(?P<code>[^ ]*) (?P<size>[^ ]*)(?: "(?P<referer>[^\"]*)" "(?P<agent>[^\"]*)")?$'
)
TOOLCALL_PATTERN = (
    r'^CALL (?P<calltool>\w+)\((?P<args>.*)\) -> (?P<status>\w+)$'
)


def default_parsers() -> list[Parser]:
    return [
        build_parser({"name": "apache", "format": "regex", "regex": APACHE_PATTERN,
                      "time_key": "time", "time_format": "%d/%b/%Y:%H:%M:%S %z",
                      "types": {"code": "integer", "size": "integer"}}),
        build_parser({"name": "toolcall", "format": "regex",
                      "regex": TOOLCALL_PATTERN}),
        build_parser({"name": "json", "format": "json",
                      "types": {"code": "integer", "dur": "float"}}),
        build_parser({"name": "logfmt", "format": "logfmt",
                      "types": {"code": "integer", "dur": "float"}}),
        build_parser({"name": "ltsv", "format": "ltsv",
                      "types": {"code": "integer", "dur": "float"}}),
    ]
