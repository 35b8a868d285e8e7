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


def _template_plan(tmpl: str):
    """Compile a new-tag template into a vector plan when it uses only
    literals, ``$TAG`` and ``$TAG[n]`` — those compose from the tag
    column with Arrow string kernels, no per-row translate. Templates
    referencing record keys or ``$N`` captures return None (per-row
    path)."""
    from ..record import _TOKEN_RE
    parts: list[tuple[str, object]] = []
    pos = 0
    for m in _TOKEN_RE.finditer(tmpl):
        if m.start() > pos:
            parts.append(("lit", tmpl[pos:m.start()]))
        tok = m.group(1)
        if tok == "TAG":
            parts.append(("tag", None))
        elif tok.startswith("TAG["):
            parts.append(("tagpart", int(tok[4:-1])))
        else:
            return None
        pos = m.end()
    if pos < len(tmpl):
        parts.append(("lit", tmpl[pos:]))
    return parts


@register("rewrite_tag")
class RewriteTagStage(Stage):
    def __init__(self, rules: list[tuple[str, str, str, bool]],
                 max_hops: int = 4, **kw):
        """rules: [(field '$x', regex, new_tag_template, keep_original)]"""
        super().__init__(**kw)
        self.rules = [(RecordAccessor(f), _FieldMatcher(f, p), re.compile(p),
                       tmpl, bool(keep), _template_plan(tmpl))
                      for f, p, tmpl, keep in rules]
        self.max_hops = max_hops

    @staticmethod
    def _compose_tags(plan, tags: pa.Array) -> pa.Array:
        """Render a TAG-only template for a tag array, vectorized.
        ``$TAG[n]`` out of range renders "" (translate semantics)."""
        import pyarrow.compute as pc
        max_part = max((v for k, v in plan if k == "tagpart"), default=-1)
        split = None
        if max_part >= 0:
            # pad with separators so list_element is always in range;
            # missing parts come back as "" like translate does
            padded = pc.binary_join_element_wise(
                tags, pa.scalar("." * (max_part + 1)), pa.scalar(""))
            split = pc.split_pattern(padded, pattern=".")
        pieces = []
        for kind, v in plan:
            if kind == "lit":
                pieces.append(pa.scalar(v))
            elif kind == "tag":
                pieces.append(tags)
            else:
                pieces.append(pc.list_element(split, v))
        if len(pieces) == 1:
            p = pieces[0]
            if isinstance(p, pa.Scalar):
                return pa.array([p.as_py()] * len(tags), type=pa.string())
            return p
        return pc.binary_join_element_wise(*pieces, pa.scalar(""))

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
        for r_i, rule in enumerate(self.rules):
            if not undecided.any():
                break
            m = rule[1].match(batch) & undecided
            rule_of[m] = r_i
            undecided &= ~m
        idx = np.nonzero(rule_of >= 0)[0]
        if len(idx) == 0:
            return batch

        keep_orig = np.ones(n, dtype=bool)
        emit_src: list[np.ndarray] = []
        emit_tags: list[pa.Array] = []
        slow: list[np.ndarray] = []
        tag_col = (batch.column(TAG_COL).combine_chunks()
                   if TAG_COL in batch.column_names else None)
        for r_i, rule in enumerate(self.rules):
            _, matcher, _, _, keep, plan = rule
            rows = idx[rule_of[idx] == r_i]
            if len(rows) == 0:
                continue
            if plan is not None and matcher.exact_on(batch) \
                    and tag_col is not None:
                # vector path: the matcher's regex already validated the
                # rows; the template composes from the tag column alone
                tags = tag_col.take(pa.array(rows))
                emit_src.append(rows)
                emit_tags.append(self._compose_tags(plan, tags))
                if not keep:
                    keep_orig[rows] = False
            else:
                slow.append(rows)

        if slow:
            sidx = np.concatenate(slow)
            sub = batch.take(pa.array(sidx))
            cols = {c: sub.column(c).to_pylist() for c in sub.column_names
                    if c != FIELDS_COL}
            fvals = (sub.column(FIELDS_COL).to_pylist()
                     if FIELDS_COL in sub.column_names else None)
            s_rows, s_tags = [], []
            for j, i in enumerate(sidx):
                ra, _, rx, tmpl, keep, _ = self.rules[rule_of[i]]
                row = {c: cols[c][j] for c in cols}
                row[FIELDS_COL] = (fields_loads(fvals[j])
                                   if fvals is not None else {})
                v = ra.get(row)
                m = rx.search(v) if isinstance(v, str) else None
                if m is None:  # matcher/regex disagree only on non-str
                    continue
                s_tags.append(translate(tmpl, row,
                                        captures=(m.group(0),) + m.groups()))
                s_rows.append(i)
                if not keep:
                    keep_orig[i] = False
            if s_rows:
                emit_src.append(np.array(s_rows, dtype=np.int64))
                emit_tags.append(pa.array(s_tags, type=pa.string()))

        if not emit_src:
            return batch

        src = np.concatenate(emit_src)
        copies = batch.take(pa.array(src))
        new_tags = pa.concat_arrays(
            [a.cast(pa.string()) if isinstance(a, pa.Array) else a
             for a in emit_tags])
        copies = replace_column(copies, TAG_COL, new_tags)
        copies = replace_column(
            copies, REENTER_COL,
            pa.array(np.ones(len(src), dtype=bool), type=pa.bool_()))
        copies = replace_column(
            copies, HOP_COL,
            pa.array((hops[src] + 1).astype("int32"), type=pa.int32()))
        kept = batch if keep_orig.all() else batch.filter(pa.array(keep_orig))
        return pa.concat_tables([kept, copies], promote_options="default")
