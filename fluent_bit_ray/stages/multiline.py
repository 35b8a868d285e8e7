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
        pat = self.firstline
        key, order_col, text_col = self.key, self.order_col, self.text_col
        joiner = self.joiner
        gap_s, ts_col = self.flush_gap_s, self.ts_col

        def firstline_mask(texts: pd.Series) -> "np.ndarray":
            import numpy as np
            import pyarrow as pa
            import pyarrow.compute as pc
            try:  # Arrow RE2 search (unanchored), python re fallback
                m = pc.match_substring_regex(
                    pa.array(texts.to_numpy(dtype=object),
                             type=pa.string()), pattern=pat)
                return pc.fill_null(m, False).to_numpy(zero_copy_only=False)
            except pa.ArrowInvalid:
                return np.fromiter((rx.search(t) is not None for t in texts),
                                   dtype=bool, count=len(texts))

        def join_partition(g: pd.DataFrame) -> pd.DataFrame:
            """The stateful open-buffer loop, vectorized over one coarse
            partition: a new RUN starts at every firstline or break
            (conversation start / event-time gap); a run whose first
            row is a firstline folds into one segment, any other run's
            rows are emitted solo — exactly the per-row loop's
            semantics, with one pandas groupby per partition instead
            of per conversation."""
            import numpy as np
            g = g.sort_values([key, order_col], kind="mergesort")
            n = len(g)
            texts = g[text_col].astype(str)
            isf = firstline_mask(texts)
            kvals = g[key].to_numpy()
            conv_start = np.ones(n, dtype=bool)
            conv_start[1:] = kvals[1:] != kvals[:-1]
            if gap_s is not None:
                deltas = pd.to_datetime(g[ts_col]).diff() \
                    .dt.total_seconds().to_numpy()
                gap_brk = np.nan_to_num(deltas, nan=0.0) > gap_s
            else:
                gap_brk = np.zeros(n, dtype=bool)
            new_run = isf | conv_start | gap_brk
            run = np.cumsum(new_run)            # ids 1..R, row 0 starts one
            run_first = isf[np.flatnonzero(new_run)]
            folded = run_first[run - 1]         # row's run starts with a first
            seg = np.where(folded, run, run[-1] + 1 + np.arange(n))
            gg = pd.DataFrame({key: kvals, "_seg": seg,
                               "_turn": g[order_col].to_numpy(),
                               text_col: texts.to_numpy()})
            out = gg.groupby("_seg", sort=False).agg(
                **{key: (key, "first"),
                   "first_turn": ("_turn", "first"),
                   "n_parts": (text_col, "size"),
                   text_col: (text_col, joiner.join)}).reset_index(drop=True)
            out["first_turn"] = out["first_turn"].astype("int64")
            out["n_parts"] = out["n_parts"].astype("int64")
            return out[[key, "first_turn", "n_parts", text_col]]

        import zlib

        import numpy as np

        def add_hp(df: pd.DataFrame) -> pd.DataFrame:
            codes, uniques = pd.factorize(df[key])
            hp = np.fromiter(
                (zlib.crc32(str(u).encode("utf-8")) % 64 for u in uniques),
                dtype=np.int64, count=len(uniques))
            df = df.copy()
            df["_hp"] = hp[codes]
            return df

        def per_partition(g: pd.DataFrame) -> pd.DataFrame:
            return join_partition(g.drop(columns=["_hp"]))

        return (ds.map_batches(add_hp, batch_format="pandas")
                .groupby("_hp")
                .map_groups(per_partition, batch_format="pandas"))
