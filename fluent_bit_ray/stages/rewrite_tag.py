"""rewrite_tag — re-emit matching records under a new tag.

Reference plugins/filter_rewrite_tag (rewrite_tag.c:286-338): rules
``$key regex NEW_TAG keep``; first matching rule wins per record; the
new tag is a template (``$TAG``, ``$TAG[n]``, ``$key``, ``$0..$9``
regex captures) and the re-emitted copy re-enters the FULL pipeline
under the new tag via the internal emitter input
(plugins/in_emitter/emitter.c:82); ``keep`` keeps or drops the
original record.

Here the stage marks emitted copies with ``_reenter=True`` and a
``_hop`` counter; the pipeline loops re-entrant rows through the whole
chain to a bounded fixed point (the reference can loop forever through
the emitter — we cap hops, documented deviation).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from ..record import FIELDS_COL, TAG_COL, RecordAccessor, fields_loads, translate
from .base import Stage, ensure_column, register, replace_column
from .grep import _FieldMatcher

REENTER_COL = "_reenter"
HOP_COL = "_hop"


@register("rewrite_tag")
class RewriteTagStage(Stage):
    def __init__(self, rules: list[tuple[str, str, str, bool]],
                 max_hops: int = 4, **kw):
        """rules: [(field '$x', regex, new_tag_template, keep_original)]"""
        super().__init__(**kw)
        self.rules = [(RecordAccessor(f), _FieldMatcher(f, p), re.compile(p),
                       tmpl, bool(keep))
                      for f, p, tmpl, keep in rules]
        self.max_hops = max_hops

    def transform(self, batch: pa.Table, mask: np.ndarray) -> pa.Table:
        batch = ensure_column(batch, REENTER_COL, pa.bool_(), fill=False)
        batch = ensure_column(batch, HOP_COL, pa.int32(), fill=0)
        n = batch.num_rows
        hops = batch.column(HOP_COL).to_numpy(zero_copy_only=False)
        eligible = mask & (hops < self.max_hops)
        if not eligible.any():
            return batch

        # vectorized first-match-wins: rule index per row (-1 = no rule)
        rule_of = np.full(n, -1, dtype=np.int64)
        undecided = eligible.copy()
        for r_i, (_, matcher, _, _, _) in enumerate(self.rules):
            if not undecided.any():
                break
            m = matcher.match(batch) & undecided
            rule_of[m] = r_i
            undecided &= ~m
        idx = np.nonzero(rule_of >= 0)[0]
        if len(idx) == 0:
            return batch

        # per-row template translation only for the (few) matched rows:
        # decode just the matched subset, not the whole batch
        sub = batch.take(pa.array(idx))
        cols = {c: sub.column(c).to_pylist() for c in sub.column_names
                if c != FIELDS_COL}
        fvals = (sub.column(FIELDS_COL).to_pylist()
                 if FIELDS_COL in sub.column_names else None)

        keep_orig = np.ones(n, dtype=bool)
        emitted: list[tuple[int, str]] = []  # (source row, new tag)
        for j, i in enumerate(idx):
            ra, _, rx, tmpl, keep = self.rules[rule_of[i]]
            row = {c: cols[c][j] for c in cols}
            row[FIELDS_COL] = fields_loads(fvals[j]) if fvals is not None else {}
            v = ra.get(row)
            m = rx.search(v) if isinstance(v, str) else None
            if m is None:  # matcher/regex disagree only on non-str values
                continue
            new_tag = translate(tmpl, row, captures=(m.group(0),) + m.groups())
            emitted.append((i, new_tag))
            if not keep:
                keep_orig[i] = False

        if not emitted:
            return batch

        src = pa.array([i for i, _ in emitted], type=pa.int64())
        copies = batch.take(src)
        copies = replace_column(copies, TAG_COL,
                                pa.array([t for _, t in emitted], type=pa.string()))
        copies = replace_column(copies, REENTER_COL,
                                pa.array([True] * len(emitted), type=pa.bool_()))
        new_hops = [int(hops[i]) + 1 for i, _ in emitted]
        copies = replace_column(copies, HOP_COL,
                                pa.array(new_hops, type=pa.int32()))
        kept = batch if keep_orig.all() else batch.filter(pa.array(keep_orig))
        return pa.concat_tables([kept, copies], promote_options="default")
