"""grep filter — keep/exclude records by regex on a record-accessor field.

Reference semantics (plugins/filter_grep/grep.c:148-175), mirrored
exactly: rules evaluated in order per record;
- rule REGEX  : field no-match → DROP;   match → KEEP (short-circuit)
- rule EXCLUDE: field match   → DROP;    no-match → next rule
- fall-through → KEEP.
A missing field counts as no-match (flb_ra_regex_match returns -1);
only string values can match.

Vectorized: plain-column accessors use Arrow's RE2 kernel
(pc.match_substring_regex, unanchored like onig_search); nested /
dynamic fields fall back to compiled Python re over decoded rows.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..record import FIELDS_COL, RecordAccessor, fields_loads
from .base import Stage, register


class _FieldMatcher:
    """Unanchored regex test of one accessor field, vectorized."""

    def __init__(self, field: str, pattern: str):
        self.ra = RecordAccessor(field)
        self.pattern = pattern
        self.py = re.compile(pattern)
        self.simple = (self.ra.kind == "key" and not self.ra.path)
        self.arrow_ok = False
        if self.simple:
            try:
                pc.match_substring_regex(pa.array([""], type=pa.string()),
                                         pattern=pattern)
                self.arrow_ok = True
            except pa.ArrowInvalid:
                pass

    def exact_on(self, batch: pa.Table) -> bool:
        """True when ``match`` evaluates the rule's own regex against a
        string column — authoritative, so a per-row re-check of the
        same pattern cannot disagree (rewrite_tag's vector path)."""
        if not (self.simple and self.ra.key in batch.column_names):
            return False
        col = batch.column(self.ra.key)
        return bool(pa.types.is_string(col.type)
                    or pa.types.is_large_string(col.type))

    def match(self, batch: pa.Table) -> np.ndarray:
        n = batch.num_rows
        if self.simple and self.ra.key in batch.column_names:
            col = batch.column(self.ra.key)
            if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
                if self.arrow_ok:
                    m = pc.match_substring_regex(col, pattern=self.pattern)
                    return pc.fill_null(m, False).to_numpy(zero_copy_only=False)
                vals = col.to_pylist()
                return np.array([v is not None and self.py.search(v) is not None
                                 for v in vals], dtype=bool)
            # non-string promoted column: no match (reference: strings only)
            return np.zeros(n, dtype=bool)
        # dynamic/nested: decode fields and walk the accessor per row
        out = np.zeros(n, dtype=bool)
        if FIELDS_COL not in batch.column_names:
            return out
        fvals = batch.column(FIELDS_COL).to_pylist()
        cols = {c: batch.column(c).to_pylist()
                for c in batch.column_names if c != FIELDS_COL}
        for i in range(n):
            row = {c: cols[c][i] for c in cols}
            row[FIELDS_COL] = fields_loads(fvals[i])
            v = self.ra.get(row)
            if isinstance(v, str) and self.py.search(v):
                out[i] = True
        return out


@register("grep")
class GrepStage(Stage):
    def __init__(self, rules: list[tuple[str, str, str]], **kw):
        """rules: ordered [(kind 'regex'|'exclude', field '$x', pattern)]."""
        super().__init__(**kw)
        self.rules = [(kind, _FieldMatcher(field, pat))
                      for kind, field, pat in rules]

    def keep_mask(self, batch: pa.Table, mask: np.ndarray) -> np.ndarray:
        keep = np.ones(batch.num_rows, dtype=bool)
        undecided = mask.copy()
        for kind, matcher in self.rules:
            if not undecided.any():
                break
            m = matcher.match(batch)
            if kind == "regex":
                keep &= np.where(undecided, m, keep)  # no-match → drop
                undecided &= False  # both outcomes decide (keep or drop)
            else:  # exclude
                drop = undecided & m
                keep &= ~drop
                undecided &= ~m  # matched rows decided(drop); rest continue
        return keep

    def transform(self, batch: pa.Table, mask: np.ndarray) -> pa.Table:
        keep = self.keep_mask(batch, mask)
        if keep.all():
            return batch
        return batch.filter(pa.array(keep))
