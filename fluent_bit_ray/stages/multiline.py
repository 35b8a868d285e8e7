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

from ..record import fields_dumps
from .base import Stage, register


def _chain_parse(texts, parsers):
    """First-success parse of each text with the ordered parser list
    (the reference's ``mult_parsers`` loop, tail_multiline.c:336-353:
    first parser whose ``flb_parser_do`` succeeds wins). Returns an
    object array of field dicts (None = no parser matched)."""
    import numpy as np
    import pyarrow as pa

    arr = pa.array(list(texts), type=pa.string())
    n = len(arr)
    maps = np.full(n, None, dtype=object)
    remaining = np.ones(n, dtype=bool)
    for p in parsers:
        if not remaining.any():
            break
        sub = np.nonzero(remaining)[0]
        sub_arr = arr if len(sub) == n else arr.take(pa.array(sub))
        sub_maps, _ = p.parse_column(sub_arr)
        ma = np.fromiter(sub_maps, dtype=object, count=len(sub))
        mhit = ma != None  # noqa: E711 — elementwise on object array
        hits = sub[mhit]
        if len(hits):
            maps[hits] = ma[mhit]
            remaining[hits] = False
    return maps


@register("multiline")
class MultilineStage(Stage):
    wide = True

    def __init__(self, firstline: str, key: str = "conv_id",
                 order_col: str = "turn_idx", text_col: str = "text",
                 joiner: str = "\n", flush_gap_s: float | None = None,
                 ts_col: str = "ts", firstline_parser=None,
                 cont_parsers=None, engine: str = "auto", **kw):
        """``flush_gap_s`` is the event-time analogue of the reference's
        ``Flush_MS`` timeout (tail_multiline.c:56-75): an event-time gap
        > flush_gap_s between consecutive rows CLOSES the open buffer,
        so a continuation line arriving after the gap has no open
        buffer and is emitted as-is — exactly what the processing-time
        timeout does to a quiet stream. None = no timeout (round-1
        behavior: only the group boundary flushes).

        ``firstline_parser`` / ``cont_parsers`` mirror the reference's
        multiline PARSER list (tail_multiline.c:41 ``mult_parsers``,
        :73 firstline parser, :336-353 per-continuation-line
        ``flb_parser_do`` first-success loop, :436-512 flush merge):

        - the firstline's parsed fields seed the segment's field map;
        - each continuation line is tried against ``cont_parsers`` in
          order; the first success contributes its fields to the
          segment's map (appended in line order — later same-named
          keys overwrite, the flattened-dict reading of the
          reference's duplicate msgpack keys) and the line is EXCLUDED
          from the text join (the reference buffers the parsed map,
          not the raw line);
        - unparsed continuation lines join into ``text`` when the
          firstline map's last value is a string
          (``is_last_key_val_string``, :255-288 — always true when no
          firstline_parser is configured), else each is emitted SOLO
          (the ``pack_line`` fallback, :376-379);
        - output gains a ``fields`` column (JSON, empty when nothing
          parsed) only when parsers are configured, keeping the
          parserless schema unchanged.
        """
        super().__init__(**kw)
        self.firstline = firstline
        self.firstline_parser = firstline_parser
        self.cont_parsers = list(cont_parsers or [])
        self.key = key
        self.order_col = order_col
        self.text_col = text_col
        self.joiner = joiner
        self.flush_gap_s = flush_gap_s
        self.ts_col = ts_col
        self.engine = engine  # "auto" | "pandas" (tests pin the slow path)

    def apply(self, ds):
        rx = re.compile(self.firstline)
        pat = self.firstline
        key, order_col, text_col = self.key, self.order_col, self.text_col
        joiner = self.joiner
        gap_s, ts_col = self.flush_gap_s, self.ts_col
        fl_parser = self.firstline_parser
        cont_parsers = self.cont_parsers

        # the output schema never carries columns beyond
        # (key, first_turn, n_parts, text[, fields]) — project the
        # exchange input down to what the kernel reads so the
        # all-to-all never ships role/tool/ts bytes it will drop
        need = [key, order_col, text_col]
        if gap_s is not None:
            need.append(ts_col)
        try:
            have = set(ds.schema(fetch_if_missing=False).names or [])
        except Exception:
            have = set(need)
        if have and set(need) < have:
            ds = ds.select_columns(need)

        def _re2_ok() -> bool:
            import pyarrow as pa
            import pyarrow.compute as pc
            try:
                # a 1-element probe: empty arrays skip kernel execution
                # entirely, so RE2 would never see (and reject) the pattern
                pc.match_substring_regex(
                    pa.array(["x"], type=pa.string()), pattern=pat)
                return True
            except pa.ArrowInvalid:
                return False

        if (self.engine != "pandas" and fl_parser is None
                and not cont_parsers and _re2_ok()):
            return self._apply_arrow(ds)

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
            run_starts = np.flatnonzero(new_run)
            run_first = isf[run_starts]
            folded = run_first[run - 1]         # row's run starts with a first
            texts_np = texts.to_numpy()

            if not cont_parsers and fl_parser is None:
                # Segments are CONTIGUOUS row runs after the sort (a
                # folded run shares one run id; every solo row is its
                # own segment), so boundary arithmetic replaces the
                # pandas groupby: the per-group Python ``joiner.join``
                # agg measured ~11 µs/row — the multiline wall-time
                # hotspot at sf1 — while slice-joins only touch the
                # minority multi-row segments.
                seg = np.where(folded, run, run[-1] + 1 + np.arange(n))
                brk = np.empty(n, dtype=bool)
                brk[0] = True
                brk[1:] = seg[1:] != seg[:-1]
                starts = np.flatnonzero(brk)
                ends = np.append(starts[1:], n)
                nparts = ends - starts
                texts_out = texts_np[starts].copy()
                for i in np.flatnonzero(nparts > 1):
                    texts_out[i] = joiner.join(texts_np[starts[i]:ends[i]])
                return pd.DataFrame({
                    key: kvals[starts],
                    "first_turn": g[order_col].to_numpy()[starts]
                    .astype("int64"),
                    "n_parts": nparts.astype("int64"),
                    text_col: texts_out,
                })

            # ---- continuation-parser path (tail_multiline.c:336-512)
            cont_rows = folded & ~isf
            cmaps = np.full(n, None, dtype=object)
            if cont_parsers and cont_rows.any():
                cmaps[cont_rows] = _chain_parse(texts_np[cont_rows],
                                                cont_parsers)
            fmaps = np.full(n, None, dtype=object)
            # is_last_key_val_string gate: unparsed continuations may
            # only append when the firstline map's LAST value is a
            # string (:255-288); with no firstline parser every line
            # appends (regex-only mode = always-string working value)
            run_append = np.ones(len(run_starts), dtype=bool)
            if fl_parser is not None and isf.any():
                fmaps[isf] = _chain_parse(texts_np[isf], [fl_parser])
                fl_at_start = isf[run_starts]
                for ri in np.nonzero(fl_at_start)[0]:
                    m = fmaps[run_starts[ri]]
                    if m:
                        vals = list(m.values())
                        run_append[ri] = isinstance(vals[-1], str)
            row_append = run_append[run - 1]

            unparsed_cont = cont_rows & (cmaps == None)  # noqa: E711
            solo = unparsed_cont & ~row_append  # pack_line fallback
            in_seg = folded & ~solo
            seg = np.where(in_seg, run, run[-1] + 1 + np.arange(n))
            # text join keeps the firstline raw + appendable unparsed
            # continuations; parsed lines contribute fields instead
            in_text = ~in_seg | isf | unparsed_cont

            # segments are contiguous row runs (same argument as the
            # parserless path) — boundary arithmetic, slice-joins over
            # the in_text mask; Python only touches parsed rows (the
            # per-segment dict merge, inherent) and multi-row joins
            brk = np.empty(n, dtype=bool)
            brk[0] = True
            brk[1:] = seg[1:] != seg[:-1]
            starts = np.flatnonzero(brk)
            ends = np.append(starts[1:], n)
            nparts = ends - starts
            texts_out = np.where(in_text[starts], texts_np[starts], "")
            texts_out = texts_out.astype(object)
            for i in np.flatnonzero(nparts > 1):
                sl = slice(starts[i], ends[i])
                texts_out[i] = joiner.join(texts_np[sl][in_text[sl]])
            # merge parsed maps per segment in line order (firstline
            # seed first — it is its run's first row; later same-named
            # keys overwrite)
            rowmap = np.where(isf, fmaps, cmaps)
            acc: dict = {}
            for i in np.nonzero(rowmap != None)[0]:  # noqa: E711
                acc.setdefault(seg[i], {}).update(rowmap[i])
            return pd.DataFrame({
                key: kvals[starts],
                "first_turn": g[order_col].to_numpy()[starts]
                .astype("int64"),
                "n_parts": nparts.astype("int64"),
                text_col: texts_out,
                "fields": [fields_dumps(acc.get(s, {}))
                           for s in seg[starts]],
            })

        from ..shuffle import coarse_partition_apply
        return coarse_partition_apply(ds, key, join_partition)

    def _apply_arrow(self, ds):
        """Parserless fast path: the whole kernel in Arrow C kernels +
        numpy over integer codes — no pandas conversion, no Python
        string objects. The pandas path's per-partition cost was
        dominated by BlockAccessor.to_pandas + a string-key mergesort +
        ``astype(str)`` materializing every text as a PyObject; at 16
        workers that allocation traffic is what stopped the 4→16
        scaling (measured sf4: pandas kernel 22.5→15.6 s vs this
        kernel 10.3→7.2 s, identical segment counts). Semantics are
        the parserless ``join_partition`` exactly (same run/segment
        arithmetic; nulls render as "None" to match ``astype(str)``)."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        pat = self.firstline
        key, order_col, text_col = self.key, self.order_col, self.text_col
        joiner = self.joiner
        gap_s, ts_col = self.flush_gap_s, self.ts_col

        def join_partition_arrow(t: pa.Table) -> pa.Table:
            n = t.num_rows
            if n == 0:
                return pa.table({
                    key: pa.array([], t.schema.field(key).type),
                    "first_turn": pa.array([], pa.int64()),
                    "n_parts": pa.array([], pa.int64()),
                    text_col: pa.array([], pa.large_string()),
                })
            conv = t[key].combine_chunks()
            codes = conv.dictionary_encode().indices \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            turn = t[order_col].combine_chunks() \
                .to_numpy(zero_copy_only=False)
            order = np.lexsort((turn, codes))
            o_arr = pa.array(order)
            text_s = pc.take(
                pc.cast(t[text_col].combine_chunks(), pa.large_string()),
                o_arr)
            if text_s.null_count:
                text_s = pc.fill_null(text_s, "None")  # astype(str) parity
            codes_s = codes[order]
            turn_s = turn[order]
            isf = pc.fill_null(
                pc.match_substring_regex(text_s, pattern=pat),
                False).to_numpy(zero_copy_only=False)
            conv_start = np.ones(n, dtype=bool)
            conv_start[1:] = codes_s[1:] != codes_s[:-1]
            if gap_s is not None:
                ts = pc.take(t[ts_col].combine_chunks(), o_arr) \
                    .cast(pa.timestamp("ns")) \
                    .to_numpy(zero_copy_only=False).astype("int64")
                gap_brk = np.zeros(n, dtype=bool)
                gap_brk[1:] = (ts[1:] - ts[:-1]) > gap_s * 1e9
                new_run = isf | conv_start | gap_brk
            else:
                new_run = isf | conv_start
            run = np.cumsum(new_run)
            run_starts = np.flatnonzero(new_run)
            folded = isf[run_starts][run - 1]
            seg = np.where(folded, run, run[-1] + 1 + np.arange(n))
            brk = np.empty(n, dtype=bool)
            brk[0] = True
            brk[1:] = seg[1:] != seg[:-1]
            starts = np.flatnonzero(brk)
            nparts = np.diff(np.append(starts, n))
            offsets = pa.array(np.append(starts, n).astype(np.int64))
            la = pa.LargeListArray.from_arrays(offsets, text_s)
            joined = pc.binary_join(
                la, pa.scalar(joiner, type=pa.large_string()))
            return pa.table({
                key: pc.take(conv, pa.array(order[starts])),
                "first_turn": pa.array(turn_s[starts].astype(np.int64)),
                "n_parts": pa.array(nparts.astype(np.int64)),
                text_col: joined,
            })

        from ..shuffle import coarse_partition_apply
        return coarse_partition_apply(ds, key, join_partition_arrow,
                                      batch_format="pyarrow")
