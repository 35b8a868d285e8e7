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
                 cont_parsers=None, engine: str = "auto",
                 chunk_rows: int | None = 1 << 18, **kw):
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

        ``chunk_rows`` (hot-key salting, Arrow engine only): a key
        whose rows exceed it is split into ordered chunks of that many
        rows, each segmented independently, with the chunk-boundary
        segments re-merged through a second (tiny) exchange — so one
        hot key (a Zipf-headed tag owning 10% of a 100 TB stream)
        never lands in a single task. CONTRACT: ``order_col`` must be
        DENSE per key (0,1,2,... — the engine's lineage offsets and
        the transcript turn index both are); a per-chunk density guard
        raises otherwise. ``chunk_rows=None`` disables splitting
        (arbitrary order values, whole key per task).
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
        self.chunk_rows = chunk_rows

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
            # group by factorize CODE (keys only need contiguity;
            # lexsort over object strings pays a Python richcompare
            # per comparison — windows._sort_perm finding, r5)
            codes = pd.factorize(g[key], sort=False)[0]
            g = g.iloc[np.lexsort((g[order_col].to_numpy(), codes))]
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
        if self.chunk_rows:
            return self._apply_arrow_chunked(ds)
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

    def _apply_arrow_chunked(self, ds):
        """Hot-key-safe Arrow path: rows are exchanged by
        (key, order_col // chunk_rows) so a Zipf-headed key spreads
        over many partitions; each chunk is segmented independently
        by the same vector kernel; chunk-boundary state (the open
        trailing segment and the leading continuation run) travels as
        TINY records through a second exchange keyed by the bare key,
        where a sequential per-key walk stitches the boundaries. The
        segment arithmetic matches the unchunked kernel exactly — a
        run that starts with a firstline folds into one segment, any
        other run emits its rows as singletons, and an event-time gap
        > flush_gap_s closes the open buffer (boundary gaps are
        evaluated in the merge from the carried timestamps).

        Requires DENSE per-key order values (see __init__ docstring);
        a per-chunk density guard raises on holes/duplicates."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        pat = self.firstline
        key, order_col, text_col = self.key, self.order_col, self.text_col
        joiner = self.joiner
        gap_s, ts_col = self.flush_gap_s, self.ts_col
        C = int(self.chunk_rows)

        def add_ck(t: pa.Table) -> pa.Table:
            ck = pc.divide(pc.cast(t[order_col], pa.int64()),
                           pa.scalar(C, pa.int64()))
            return t.append_column("_ck", ck)

        def _rec_schema(key_type) -> pa.Schema:
            return pa.schema([
                pa.field(key, key_type),
                pa.field("first_turn", pa.int64()),
                pa.field("n_parts", pa.int64()),
                pa.field(text_col, pa.large_string()),
                pa.field("_kind", pa.int8()),
                pa.field("_ck", pa.int64()),
                pa.field("folded", pa.bool_()),
                pa.field("covers_all", pa.bool_()),
                pa.field("first_ts", pa.int64()),
                pa.field("last_ts", pa.int64()),
                pa.field("lead_turns", pa.large_list(pa.int64())),
                pa.field("lead_texts", pa.large_list(pa.large_string())),
            ])

        def join_chunk_partition(t: pa.Table):
            """Returns (interior_segments, boundary_records|None): the
            final segments of this partition's (key, chunk) groups plus
            the tiny open-trailing / pending-leading records that the
            per-key merge stitches."""
            n = t.num_rows
            key_type = t.schema.field(key).type
            schema = _rec_schema(key_type)
            core_schema = pa.schema([
                pa.field(key, key_type),
                pa.field("first_turn", pa.int64()),
                pa.field("n_parts", pa.int64()),
                pa.field(text_col, pa.large_string()),
            ])
            if n == 0:
                return core_schema.empty_table(), None
            conv = t[key].combine_chunks()
            codes = conv.dictionary_encode().indices \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            turn = pc.cast(t[order_col].combine_chunks(), pa.int64()) \
                .to_numpy(zero_copy_only=False)
            order = np.lexsort((turn, codes))
            o_arr = pa.array(order)
            text_s = pc.take(
                pc.cast(t[text_col].combine_chunks(), pa.large_string()),
                o_arr)
            if text_s.null_count:
                text_s = pc.fill_null(text_s, "None")
            codes_s = codes[order]
            turn_s = turn[order]
            ck_s = turn_s // C

            cs = np.ones(n, dtype=bool)       # (key, chunk) group starts
            cs[1:] = ((codes_s[1:] != codes_s[:-1])
                      | (ck_s[1:] != ck_s[:-1]))
            g_starts = np.flatnonzero(cs)
            g_ends = np.append(g_starts[1:], n)
            g_min_t, g_max_t = turn_s[g_starts], turn_s[g_ends - 1]
            if ((g_min_t < 0).any()
                    or (g_max_t - g_min_t + 1 != g_ends - g_starts).any()):
                raise ValueError(
                    "multiline chunk_rows requires DENSE non-negative "
                    f"'{order_col}' values per '{key}' (holes or "
                    "duplicates found); pass chunk_rows=None for "
                    "arbitrary order values")

            isf = pc.fill_null(
                pc.match_substring_regex(text_s, pattern=pat),
                False).to_numpy(zero_copy_only=False)
            if gap_s is not None:
                ts = pc.take(t[ts_col].combine_chunks(), o_arr) \
                    .cast(pa.timestamp("ns")) \
                    .to_numpy(zero_copy_only=False).astype("int64")
                gap_brk = np.zeros(n, dtype=bool)
                gap_brk[1:] = ((ts[1:] - ts[:-1]) > gap_s * 1e9) & ~cs[1:]
                new_run = isf | cs | gap_brk
            else:
                ts = np.zeros(n, dtype=np.int64)
                new_run = isf | cs
            run = np.cumsum(new_run)
            run_starts = np.flatnonzero(new_run)
            folded = isf[run_starts][run - 1]
            seg = np.where(folded, run, run[-1] + 1 + np.arange(n))
            brk = np.empty(n, dtype=bool)
            brk[0] = True
            brk[1:] = seg[1:] != seg[:-1]
            starts = np.flatnonzero(brk)
            n_segs = len(starts)
            nparts = np.diff(np.append(starts, n))
            offsets = pa.array(np.append(starts, n).astype(np.int64),
                               type=pa.int64())
            la = pa.LargeListArray.from_arrays(offsets, text_s)
            joined = pc.binary_join(
                la, pa.scalar(joiner, type=pa.large_string()))
            seg_first_turn = turn_s[starts]
            seg_folded = isf[starts]

            # ---- group metadata for boundary classification
            g_ck = ck_s[g_starts]
            g_first_isf = isf[g_starts]
            g_full = g_max_t == (g_ck + 1) * C - 1
            g_of_row = np.cumsum(cs) - 1
            rs_pad = np.append(run_starts, n)
            pos = np.searchsorted(run_starts, g_starts)  # exact hits
            lead_end = np.minimum(rs_pad[pos + 1], g_ends)
            g_has_lead = (g_ck > 0) & ~g_first_isf
            g_covers_all = g_has_lead & (lead_end >= g_ends)
            g_first_ts, g_last_ts = ts[g_starts], ts[g_ends - 1]

            fs = np.searchsorted(starts, g_starts)       # exact hits
            last_seg = np.append(fs[1:], n_segs) - 1
            seg_g = g_of_row[starts]
            seg_leading = g_has_lead[seg_g] & (starts < lead_end[seg_g])

            trail_gi = np.flatnonzero(g_full & ~g_covers_all)
            trail_seg = last_seg[trail_gi]
            trail_folded = seg_folded[trail_seg]
            pull = np.zeros(n_segs, dtype=bool)
            pull[trail_seg[trail_folded]] = True

            def nulls(m, typ):
                return pa.nulls(m, type=typ)

            full = pa.table({
                key: pc.take(conv, pa.array(order[starts])),
                "first_turn": pa.array(seg_first_turn),
                "n_parts": pa.array(nparts.astype(np.int64)),
                text_col: joined,
            }, schema=core_schema)
            excl = np.flatnonzero(seg_leading | pull)
            if len(excl) == 0:
                # the common partition (no hot-key chunks): zero extra
                # copies vs the unchunked kernel
                interior = full
            else:
                # drop the few boundary segments via zero-copy slices
                # around them (a take would re-copy every text byte)
                bounds = np.concatenate([[-1], excl, [n_segs]])
                slices = [full.slice(int(a) + 1, int(b) - int(a) - 1)
                          for a, b in zip(bounds[:-1], bounds[1:])
                          if b - a > 1]
                interior = (pa.concat_tables(slices) if slices
                            else core_schema.empty_table())

            tabs = []
            gi_lead = np.flatnonzero(g_has_lead)
            if len(gi_lead):
                rep = lead_end[gi_lead] - g_starts[gi_lead]
                tot = int(rep.sum())
                base = np.cumsum(rep) - rep
                idx = (np.repeat(g_starts[gi_lead], rep)
                       + np.arange(tot) - np.repeat(base, rep))
                offs = pa.array(np.append(0, np.cumsum(rep)).astype(np.int64),
                                type=pa.int64())
                lt = len(gi_lead)
                tabs.append(pa.table({
                    key: pc.take(conv, pa.array(order[g_starts[gi_lead]])),
                    "first_turn": nulls(lt, pa.int64()),
                    "n_parts": nulls(lt, pa.int64()),
                    text_col: nulls(lt, pa.large_string()),
                    "_kind": pa.array(np.ones(lt, dtype=np.int8)),
                    "_ck": pa.array(g_ck[gi_lead]),
                    "folded": nulls(lt, pa.bool_()),
                    "covers_all": pa.array(g_covers_all[gi_lead]),
                    "first_ts": pa.array(g_first_ts[gi_lead]),
                    "last_ts": pa.array(g_last_ts[gi_lead]),
                    "lead_turns": pa.LargeListArray.from_arrays(
                        offs, pa.array(turn_s[idx])),
                    "lead_texts": pa.LargeListArray.from_arrays(
                        offs, pc.take(text_s, pa.array(idx))),
                }, schema=schema))

            if len(trail_gi):
                tt = len(trail_gi)
                tabs.append(pa.table({
                    key: pc.take(conv, pa.array(order[g_starts[trail_gi]])),
                    "first_turn": pa.array(seg_first_turn[trail_seg]),
                    "n_parts": pa.array(nparts[trail_seg].astype(np.int64)),
                    text_col: pc.take(joined, pa.array(trail_seg)),
                    "_kind": pa.array(np.full(tt, 2, dtype=np.int8)),
                    "_ck": pa.array(g_ck[trail_gi]),
                    "folded": pa.array(trail_folded),
                    "covers_all": nulls(tt, pa.bool_()),
                    "first_ts": nulls(tt, pa.int64()),
                    "last_ts": pa.array(g_last_ts[trail_gi]),
                    "lead_turns": nulls(tt, pa.large_list(pa.int64())),
                    "lead_texts": nulls(
                        tt, pa.large_list(pa.large_string())),
                }, schema=schema))

            if not tabs:
                return interior, None
            return interior, (tabs[0] if len(tabs) == 1
                              else pa.concat_tables(tabs))

        def merge_boundaries(t: pa.Table) -> pa.Table:
            from collections import defaultdict

            key_type = t.schema.field(key).type
            rows = t.to_pylist()
            convs = defaultdict(lambda: ({}, {}))
            for r in rows:
                side = convs[r[key]][0 if r["_kind"] == 1 else 1]
                side[r["_ck"]] = r
            out_k, out_ft, out_np, out_tx = [], [], [], []
            gap_ns = None if gap_s is None else gap_s * 1e9

            def emit(cv, st):
                out_k.append(cv)
                out_ft.append(st["first_turn"])
                out_np.append(st["n"])
                out_tx.append(st["text"])

            def trail_state(tr):
                if tr is None:
                    return None
                return {"folded": bool(tr["folded"]),
                        "first_turn": tr["first_turn"],
                        "n": tr["n_parts"], "text": tr[text_col],
                        "last_ts": tr["last_ts"]}

            for cv, (leads, trails) in convs.items():
                open_st = trail_state(trails.get(0))
                max_ck = max(max(leads, default=0),
                             max(trails, default=0))
                for ck in range(1, max_ck + 1):
                    tr, ld = trails.get(ck), leads.get(ck)
                    if ld is None:
                        # chunk starts with a firstline (or the key
                        # ended at the boundary): the open buffer
                        # closes as-is
                        if open_st is not None and open_st["folded"]:
                            emit(cv, open_st)
                        open_st = trail_state(tr)
                        continue
                    gap = (gap_ns is not None and open_st is not None
                           and ld["first_ts"] - open_st["last_ts"]
                           > gap_ns)
                    if (open_st is not None and open_st["folded"]
                            and not gap):
                        # the leading continuation run appends into
                        # the open folded segment
                        open_st["text"] = (
                            open_st["text"] + joiner
                            + joiner.join(ld["lead_texts"]))
                        open_st["n"] += len(ld["lead_texts"])
                        if ld["covers_all"]:
                            open_st["last_ts"] = ld["last_ts"]
                        else:
                            emit(cv, open_st)
                            open_st = trail_state(tr)
                    else:
                        # gap, unfolded predecessor, or no open state:
                        # leading rows are singleton segments
                        if open_st is not None and open_st["folded"]:
                            emit(cv, open_st)
                        for tt_, tx_ in zip(ld["lead_turns"],
                                            ld["lead_texts"]):
                            out_k.append(cv)
                            out_ft.append(tt_)
                            out_np.append(1)
                            out_tx.append(tx_)
                        if ld["covers_all"]:
                            open_st = {"folded": False,
                                       "last_ts": ld["last_ts"]}
                        else:
                            open_st = trail_state(tr)
                if open_st is not None and open_st["folded"]:
                    emit(cv, open_st)
            return pa.table({
                key: pa.array(out_k, type=key_type),
                "first_turn": pa.array(out_ft, type=pa.int64()),
                "n_parts": pa.array(out_np, type=pa.int64()),
                text_col: pa.array(out_tx, type=pa.large_string()),
            })

        from ..shuffle import hash_exchange_apply
        sch = ds.schema().base_schema
        if isinstance(sch, pa.Schema):
            key_type = sch.field(key).type
        else:                       # pandas-block schema (numpy dtypes)
            dt = dict(zip(sch.names, sch.types)).get(key)
            try:
                key_type = (pa.string() if dt is None or dt == object
                            else pa.from_numpy_dtype(dt))
            except pa.ArrowNotImplementedError:
                key_type = pa.string()
        interior, records = hash_exchange_apply(
            ds.map_batches(add_ck, batch_format="pyarrow"),
            key, join_chunk_partition,
            salt_col="_ck", side_schema=_rec_schema(key_type))
        # records exist only for keys that actually span chunks (full
        # chunks and pending leading runs) — a handful of rows even at
        # 100 TB, so counting them is metadata-cheap
        if records.count() == 0:
            return interior
        merged = hash_exchange_apply(records, key, merge_boundaries,
                                     partitions=8)
        return interior.union(merged)
