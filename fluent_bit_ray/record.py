"""Record model + record accessor.

A record is one Arrow row: the fixed transcript columns
(conv_id, turn_idx, role, text, tool, ts) plus engine columns
``tag`` (string), ``routes`` (uint64 bitmask) and ``fields`` — a
JSON-serialized map (large_string) holding parsed/dynamic keys.
JSON-string representation preserves key order and duplicate-key
tolerance (the reference's maps are positional kv arrays, SURVEY §1.3).

The accessor mirrors the reference's record-accessor pattern language
(reference src/flb_record_accessor.c:84-233 parse, :485 translate,
:627 get_value): ``$key``, ``$key['sub']['sub2'][N]``, ``$TAG``,
``$TAG[n]``, and ``$N`` regex capture back-references (translate only).
"""

from __future__ import annotations

import json
import re

try:  # fast path: orjson is ~5× stdlib for the fields column
    import orjson as _orjson
except ImportError:  # pragma: no cover
    _orjson = None

FIXED_COLUMNS = ("conv_id", "turn_idx", "role", "text", "tool", "ts")
FIELDS_COL = "fields"
TAG_COL = "tag"
ROUTES_COL = "routes"

_PATH_RE = re.compile(r"\[(?:'([^']*)'|\"([^\"]*)\"|(\d+))\]")
_TOKEN_RE = re.compile(
    r"\$(TAG(?:\[\d+\])?|[A-Za-z_][\w]*(?:\[(?:'[^']*'|\"[^\"]*\"|\d+)\])*|\d)")


def fields_loads(s) -> dict:
    if not s:
        return {}
    try:
        obj = _orjson.loads(s) if _orjson is not None else json.loads(s)
    except (ValueError, TypeError):
        return {}
    return obj if isinstance(obj, dict) else {}


def fields_dumps(d: dict) -> str:
    if _orjson is not None:
        try:
            return _orjson.dumps(d).decode()
        except TypeError:
            pass  # exotic value types → stdlib with default=str
    return json.dumps(d, separators=(",", ":"), ensure_ascii=False, default=str)


class RecordAccessor:
    """Compiled accessor for one ``$...`` pattern.

    ``get(row)`` looks up the value on a row-dict whose ``fields`` entry
    is already a decoded dict. Lookup order mirrors the engine's record
    layout: promoted fixed columns first, then the dynamic fields map
    (the reference has a single flat map; our promoted columns are that
    map's well-known keys).
    """

    def __init__(self, pattern: str):
        self.pattern = pattern
        if not pattern.startswith("$"):
            raise ValueError(f"record accessor must start with $: {pattern!r}")
        body = pattern[1:]
        m = re.match(r"^([A-Za-z_]\w*)", body)
        if body.startswith("TAG"):
            self.kind = "tag"
            sub = _PATH_RE.findall(body[3:])
            self.tag_part = int(sub[0][2]) if sub else None
            return
        if not m:
            raise ValueError(f"bad accessor {pattern!r}")
        self.kind = "key"
        self.key = m.group(1)
        self.path: list[str | int] = []
        for q1, q2, idx in _PATH_RE.findall(body[m.end():]):
            if idx:
                self.path.append(int(idx))
            else:
                self.path.append(q1 or q2)

    def get(self, row: dict):
        if self.kind == "tag":
            tag = row.get(TAG_COL)
            if tag is None:
                return None
            if self.tag_part is None:
                return tag
            parts = tag.split(".")
            return parts[self.tag_part] if self.tag_part < len(parts) else None
        val = row.get(self.key)
        if val is None:
            f = row.get(FIELDS_COL)
            if isinstance(f, dict):
                val = f.get(self.key)
        for p in self.path:
            if isinstance(p, int):
                if isinstance(val, list) and p < len(val):
                    val = val[p]
                else:
                    return None
            elif isinstance(val, dict):
                val = val.get(p)
            else:
                return None
        return val


def translate(template: str, row: dict, captures: tuple | None = None) -> str:
    """``flb_ra_translate``-style template substitution.

    ``$key`` / ``$key['sub']`` / ``$TAG`` / ``$TAG[n]`` resolve via the
    accessor; ``$0``..``$9`` resolve to regex capture groups from the
    triggering match (reference src/flb_record_accessor.c:485-537).
    Unresolvable refs render as empty string (reference skips them).
    """
    def _sub(m: re.Match) -> str:
        tok = m.group(1)
        if tok.isdigit():
            i = int(tok)
            if captures is not None and i < len(captures):
                v = captures[i]
                return "" if v is None else str(v)
            return ""
        try:
            v = RecordAccessor("$" + tok).get(row)
        except ValueError:
            return ""
        if v is None:
            return ""
        if isinstance(v, bool):
            return "true" if v else "false"
        return str(v)

    return _TOKEN_RE.sub(_sub, template)
