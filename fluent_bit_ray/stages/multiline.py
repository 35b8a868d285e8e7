"""Multiline join — in_tail's multiline mode over conversations.

Reference semantics (plugins/in_tail/tail_multiline.c:56-75): a
``parser_firstline`` regex marks the first line of a logical record;
subsequent non-matching lines are continuations appended to it; a line
arriving with no match and no open buffer is emitted as-is. The
reference flushes open buffers on a processing-time timeout — here the
group boundary (end of conversation) is the deterministic event-time
substitute (SURVEY §7 hard-parts note).

Ray mapping (SURVEY §2.1): groupby(conv_id) → sort by turn_idx within
the group (restores order; rows are shuffled on disk) → linear segment
scan. The shuffle key is ``conv_id``; hot conversations make hot
groups — inherent to the semantics (a conversation must be seen
together), mitigated by Ray's per-group task sizing.
"""

from __future__ import annotations

import re

import pandas as pd

from .base import Stage, register


@register("multiline")
class MultilineStage(Stage):
    wide = True

    def __init__(self, firstline: str, key: str = "conv_id",
                 order_col: str = "turn_idx", text_col: str = "text",
                 joiner: str = "\n", flush_gap_s: float | None = None,
                 ts_col: str = "ts", **kw):
        """``flush_gap_s`` is the event-time analogue of the reference's
        ``Flush_MS`` timeout (tail_multiline.c:56-75): an event-time gap
        > flush_gap_s between consecutive rows CLOSES the open buffer,
        so a continuation line arriving after the gap has no open
        buffer and is emitted as-is — exactly what the processing-time
        timeout does to a quiet stream. None = no timeout (round-1
        behavior: only the group boundary flushes)."""
        super().__init__(**kw)
        self.firstline = firstline
        self.key = key
        self.order_col = order_col
        self.text_col = text_col
        self.joiner = joiner
        self.flush_gap_s = flush_gap_s
        self.ts_col = ts_col

    def apply(self, ds):
        rx = re.compile(self.firstline)
        key, order_col, text_col = self.key, self.order_col, self.text_col
        joiner = self.joiner
        gap_s, ts_col = self.flush_gap_s, self.ts_col

        def join_group(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(order_col, kind="mergesort")
            texts = g[text_col].astype(str).tolist()
            orders = g[order_col].tolist()
            if gap_s is not None:
                deltas = pd.to_datetime(g[ts_col]).diff().dt.total_seconds()
                gap_brk = (deltas > gap_s).fillna(False).tolist()
            else:
                gap_brk = [False] * len(texts)
            segs: list[tuple[int, list[str]]] = []
            open_buf = None
            for t, o, brk in zip(texts, orders, gap_brk):
                if brk:
                    open_buf = None  # timeout flush closes the buffer
                if rx.search(t):
                    open_buf = [t]
                    segs.append((o, open_buf))
                elif open_buf is not None:
                    open_buf.append(t)
                else:
                    segs.append((o, [t]))  # no open buffer → emit as-is
            return pd.DataFrame({
                key: g[key].iloc[0],
                "first_turn": pd.array([s[0] for s in segs], dtype="int64"),
                "n_parts": pd.array([len(s[1]) for s in segs], dtype="int64"),
                text_col: [joiner.join(s[1]) for s in segs],
            })

        from ..shuffle import coarse_group_apply
        # coarse conv-hash partitions: one task per partition with an
        # in-task loop over its conversations — not one map_groups per
        # conversation (pathological at high conv cardinality)
        return coarse_group_apply(ds, key, join_group)
