"""Tag derivation, Tag/Match wildcard routing, routes bitmask.

Mirrors the reference's router semantics (not its code):
- wildcard matcher: ``*`` matches any span including dots, greedy,
  full-string match (reference src/flb_router.c:39-104; truth table
  tests/internal/router.c:20-52, e.g. ``cpu.rpi`` ~ ``*u.r*``);
- the tag/len quirk where only the first ``len`` bytes of the tag are
  compared is a C-API detail we do not reproduce;
- ``Match_Regex`` full regex alternative (reference flb_router.c:46-58);
- per-chunk routes bitmask → per-ROW uint64 bitmask column, one bit
  per sink (reference src/flb_routes_mask.c:32-65). We support 64
  sinks per pipeline; the reference supports 128 — documented limit.

Matching is evaluated once per UNIQUE tag value per batch, then
broadcast — tags are low-cardinality by construction.
"""

from __future__ import annotations

import re
from functools import lru_cache

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


@lru_cache(maxsize=4096)
def _wildcard_re(pattern: str) -> re.Pattern:
    parts = pattern.split("*")
    return re.compile("^" + ".*".join(re.escape(p) for p in parts) + "$", re.S)


def tag_match(tag: str, pattern: str, is_regex: bool = False) -> bool:
    """Does this tag match this Match pattern? (wildcard truth table)"""
    if is_regex:
        return re.search(pattern, tag) is not None
    if "*" not in pattern:
        return tag == pattern
    return _wildcard_re(pattern).match(tag) is not None


def match_mask(tags, pattern: str, is_regex: bool = False) -> np.ndarray:
    """Vectorized tag match over a column → boolean numpy mask.

    Evaluates per unique value, then maps back (tags are
    dictionary-like: one per (source, role) combination).
    """
    if isinstance(tags, (pa.Array, pa.ChunkedArray)):
        arr = tags.combine_chunks() if isinstance(tags, pa.ChunkedArray) else tags
        uniq = pc.unique(arr).to_pylist()
        ok = {u for u in uniq if u is not None and tag_match(u, pattern, is_regex)}
        if not ok:
            return np.zeros(len(arr), dtype=bool)
        return pc.is_in(arr, value_set=pa.array(list(ok),
                                                type=pa.string())).to_numpy(
            zero_copy_only=False)
    tags = np.asarray(tags, dtype=object)
    uniq, inv = np.unique(tags.astype(str), return_inverse=True)
    ok = np.array([tag_match(u, pattern, is_regex) for u in uniq])
    return ok[inv]


class Route:
    """One sink's match spec → one bit in the routes mask."""

    def __init__(self, sink_name: str, match: str, bit: int, is_regex: bool = False):
        if bit >= 64:
            raise ValueError("at most 64 sinks per pipeline (uint64 bitmask)")
        self.sink_name = sink_name
        self.match = match
        self.bit = bit
        self.is_regex = is_regex


class Router:
    """Computes the routes bitmask column and per-sink row masks."""

    def __init__(self, sinks: list[tuple[str, str] | tuple[str, str, bool]]):
        self.routes = []
        for i, spec in enumerate(sinks):
            name, match = spec[0], spec[1]
            is_regex = bool(spec[2]) if len(spec) > 2 else False
            self.routes.append(Route(name, match, i, is_regex))

    def routes_column(self, tags) -> np.ndarray:
        """uint64 bitmask per row: bit i set ⇔ tag matches sink i."""
        n = len(tags)
        out = np.zeros(n, dtype=np.uint64)
        for r in self.routes:
            m = match_mask(tags, r.match, r.is_regex)
            out |= np.where(m, np.uint64(1 << r.bit), np.uint64(0))
        return out

    def sink_mask(self, routes_col, sink_name: str) -> np.ndarray:
        bit = next(r.bit for r in self.routes if r.sink_name == sink_name)
        arr = (routes_col.to_numpy(zero_copy_only=False)
               if isinstance(routes_col, (pa.Array, pa.ChunkedArray))
               else np.asarray(routes_col, dtype=np.uint64))
        return (arr & np.uint64(1 << bit)) != 0

    def sink_names(self) -> list[str]:
        return [r.sink_name for r in self.routes]


def derive_tag(role_col, prefix: str = "transcript") -> pa.Array:
    """Default tag derivation: ``transcript.<role>`` per row."""
    if not isinstance(role_col, (pa.Array, pa.ChunkedArray)):
        role_col = pa.array(role_col, type=pa.string())
    return pc.binary_join_element_wise(
        pa.scalar(prefix), role_col.cast(pa.string()), ".")
