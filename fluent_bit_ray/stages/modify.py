"""modify filter — conditional record rewriting.

Mirrors plugins/filter_modify (reference modify.h:27-50, apply fns
modify.c:805-1141) over the dynamic ``fields`` map:

Conditions (ALL must hold — evaluate_conditions):
  key_exists a | key_does_not_exist a | a_key_matches re(a) |
  no_key_matches re(a) | key_value_equals a b |
  key_value_does_not_equal a b | key_value_matches a re(b) |
  key_value_does_not_match a re(b) |
  matching_keys_have_matching_values re(a) re(b) |
  matching_keys_do_not_have_matching_values re(a) re(b)
Value comparisons only match string values (reference
helper_msgpack_object_matches_str).

Rules (applied in config order):
  rename k v      — only if k exists and v absent; key renamed in place
  hard_rename k v — if k exists: drop existing v, rename in place
  add k v         — append only if k absent
  set k v         — drop existing k, append k=v at END (reference SET
                    packs the new kv last)
  remove k | remove_wildcard prefix | remove_regex re
  copy k v        — only if exactly one k and no v; copy inserted
                    right after the source key
  hard_copy k v   — exactly one k, ≤1 conflict; conflict dropped,
                    copy inserted after source
"wildcard" in the reference is a PREFIX match (strncmp, modify.c:454-471).

The stage decodes the fields map only for rows whose conditions hold,
applies the rule list per row, and scatters results back in place.
Fixed transcript columns are read-only envelope (conditions may read
them; rules never touch them — ``text`` immutability invariant).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from ..record import FIXED_COLUMNS
from .base import Stage, decode_fields_subset, register, scatter_fields


def _as_str(v):
    return v if isinstance(v, str) else None


class _Condition:
    def __init__(self, kind: str, a: str, b: str | None = None):
        self.kind = kind
        self.a = a
        self.b = b
        a_regex_kinds = ("a_key_matches", "no_key_matches",
                         "matching_keys_have_matching_values",
                         "matching_keys_do_not_have_matching_values")
        b_regex_kinds = ("key_value_matches", "key_value_does_not_match",
                         "matching_keys_have_matching_values",
                         "matching_keys_do_not_have_matching_values")
        self.a_re = re.compile(a) if kind in a_regex_kinds else None
        self.b_re = re.compile(b) if b is not None and kind in b_regex_kinds else None

    def eval(self, m: dict) -> bool:
        k = self.kind
        if k == "key_exists":
            return self.a in m
        if k == "key_does_not_exist":
            return self.a not in m
        if k == "a_key_matches":
            return any(self.a_re.search(key) for key in m)
        if k == "no_key_matches":
            return not any(self.a_re.search(key) for key in m)
        if k == "key_value_equals":
            return _as_str(m.get(self.a)) == self.b
        if k == "key_value_does_not_equal":
            return not (_as_str(m.get(self.a)) == self.b)
        if k == "key_value_matches":
            v = _as_str(m.get(self.a))
            return v is not None and self.b_re.search(v) is not None
        if k == "key_value_does_not_match":
            v = _as_str(m.get(self.a))
            return not (v is not None and self.b_re.search(v) is not None)
        if k == "matching_keys_have_matching_values":
            for key, val in m.items():
                if self.a_re.search(key):
                    sv = _as_str(val)
                    if sv is None or not self.b_re.search(sv):
                        return False
            return True
        if k == "matching_keys_do_not_have_matching_values":
            for key, val in m.items():
                if self.a_re.search(key):
                    sv = _as_str(val)
                    if sv is None or not self.b_re.search(sv):
                        return True
            return False
        raise ValueError(f"unknown condition {k!r}")


def _rename_inplace(m: dict, old: str, new: str) -> dict:
    return {(new if key == old else key): val for key, val in m.items()}


def _insert_after(m: dict, src: str, new_key: str, new_val) -> dict:
    out = {}
    for key, val in m.items():
        out[key] = val
        if key == src:
            out[new_key] = new_val
    return out


class _Rule:
    def __init__(self, op: str, key: str, val: str | None = None):
        self.op = op
        self.key = key
        self.val = val
        self.key_re = re.compile(key) if op == "remove_regex" else None

    def apply(self, m: dict) -> dict:
        op, k, v = self.op, self.key, self.val
        if op == "rename":
            if k in m and v not in m:
                return _rename_inplace(m, k, v)
            return m
        if op == "hard_rename":
            if k in m:
                if v in m:
                    m = {key: val for key, val in m.items() if key != v}
                return _rename_inplace(m, k, v)
            return m
        if op == "add":
            if k not in m:
                m[k] = v
            return m
        if op == "set":
            m.pop(k, None)
            m[k] = v  # lands at the end, matching SET's repack order
            return m
        if op == "remove":
            m.pop(k, None)
            return m
        if op == "remove_wildcard":
            return {key: val for key, val in m.items() if not key.startswith(k)}
        if op == "remove_regex":
            return {key: val for key, val in m.items()
                    if not self.key_re.search(key)}
        if op == "copy":
            if k in m and v not in m:
                return _insert_after(m, k, v, m[k])
            return m
        if op == "hard_copy":
            if k in m:
                if v in m:
                    m = {key: val for key, val in m.items() if key != v}
                return _insert_after(m, k, v, m[k])
            return m
        raise ValueError(f"unknown rule {op!r}")


@register("modify")
class ModifyStage(Stage):
    def __init__(self, rules: list[tuple], conditions: list[tuple] | None = None,
                 **kw):
        super().__init__(**kw)
        self.conditions = [_Condition(*c) for c in (conditions or [])]
        self.rules = [_Rule(*r) for r in rules]

    def transform(self, batch: pa.Table, mask: np.ndarray) -> pa.Table:
        idx = np.nonzero(mask)[0]
        dicts = decode_fields_subset(batch, idx)
        if self.conditions:
            fixed = {c: batch.column(c).to_pylist()
                     for c in FIXED_COLUMNS if c in batch.column_names}
            keep_idx, keep_dicts = [], []
            for i, d in zip(idx, dicts):
                view = dict(d)
                for c, vals in fixed.items():
                    view.setdefault(c, vals[i])
                if all(c.eval(view) for c in self.conditions):
                    keep_idx.append(i)
                    keep_dicts.append(d)
            idx, dicts = np.array(keep_idx, dtype=np.int64), keep_dicts
        if len(idx) == 0:
            return batch
        out = []
        for d in dicts:
            for r in self.rules:
                d = r.apply(d)
            out.append(d)
        return scatter_fields(batch, idx, out)
