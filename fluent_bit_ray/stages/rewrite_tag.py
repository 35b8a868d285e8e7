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

REENTER_COL = "_reenter"
HOP_COL = "_hop"


@register("rewrite_tag")
class RewriteTagStage(Stage):
    def __init__(self, rules: list[tuple[str, str, str, bool]],
                 max_hops: int = 4, **kw):
        """rules: [(field '$x', regex, new_tag_template, keep_original)]"""
        super().__init__(**kw)
        self.rules = [(RecordAccessor(f), re.compile(p), tmpl, bool(keep))
                      for f, p, tmpl, keep in rules]
        self.max_hops = max_hops

    def transform(self, batch: pa.Table, mask: np.ndarray) -> pa.Table:
        batch = ensure_column(batch, REENTER_COL, pa.bool_(), fill=False)
        batch = ensure_column(batch, HOP_COL, pa.int32(), fill=0)
        n = batch.num_rows
        hops = batch.column(HOP_COL).to_numpy(zero_copy_only=False)
        idx = np.nonzero(mask & (hops < self.max_hops))[0]
        if len(idx) == 0:
            return batch

        cols = {c: batch.column(c).to_pylist() for c in batch.column_names
                if c != FIELDS_COL}
        fvals = (batch.column(FIELDS_COL).to_pylist()
                 if FIELDS_COL in batch.column_names else [""] * n)

        keep_orig = np.ones(n, dtype=bool)
        emitted: list[tuple[int, str]] = []  # (source row, new tag)
        for i in idx:
            row = {c: cols[c][i] for c in cols}
            row[FIELDS_COL] = fields_loads(fvals[i])
            for ra, rx, tmpl, keep in self.rules:
                v = ra.get(row)
                if not isinstance(v, str):
                    continue
                m = rx.search(v)
                if m is None:
                    continue
                new_tag = translate(tmpl, row, captures=(m.group(0),) + m.groups())
                emitted.append((i, new_tag))
                if not keep:
                    keep_orig[i] = False
                break  # first matching rule wins (process_record loop)

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
