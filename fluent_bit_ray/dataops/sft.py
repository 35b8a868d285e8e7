"""Training-example assembly from multi-turn transcripts.

The transcripts-payload op every SFT data pipeline runs: turn the
(conv_id, turn_idx, role, text) stream into (context, target) training
pairs — for each assistant turn, the context is the k preceding turns
rendered "role: text" and joined in turn order. Plus the syslog
classic the reference's pipeline users know as "last message repeated
N times" (rsyslog $RepeatedMsgReduction; no fluent-bit filter does
this): collapse CONSECUTIVE identical (role, text) turns per
conversation into one row with a repeat count.

Scale shape (100 TB framing): both ops need one exchange that
co-locates each conversation (coarse hash partitions over conv_id —
the same bounded-skew story as multiline/sessionize: a conversation is
bounded by its turn count, partitions hold many conversations). Inside
a partition everything is vectorized run/shift arithmetic over the
(conv_id, turn_idx)-sorted frame — no per-conversation Python. The
SFT op's output is ~k× the assistant-turn text (output-bound, like
chunk_docs); the collapse op's output is ≤ input.

Both have full rows+schema+hash DuckDB oracles (window functions:
lag/concat_ws for contexts, gaps-and-islands for runs) in
``__ray_entry__.py``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..shuffle import coarse_partition_apply


def _sorted_conv(df: pd.DataFrame) -> pd.DataFrame:
    """(conv_id, turn_idx) grouped ordering: conversations CONTIGUOUS
    (by factorize code, not lexicographically — every kernel below
    only detects group CHANGES and orders turns within a group) with
    turn order inside each. r5: pandas sort_values over object
    conv-id strings paid a Python richcompare per comparison — the
    same finding as windows._sort_perm; factorize+lexsort is pure C."""
    codes = pd.factorize(df["conv_id"], sort=False)[0]
    perm = np.lexsort((df["turn_idx"].to_numpy(), codes))
    return df.iloc[perm]


def sft_examples(ds, context_turns: int = 4, sep: str = "\n",
                 target_role: str = "assistant", partitions: int = 64):
    """Dataset[conv_id, turn_idx, context, target] — one row per
    ``target_role`` turn; ``context`` joins the up-to-``context_turns``
    preceding turns of the SAME conversation as "role: text" lines,
    oldest first (empty string when the target is the first turn)."""
    k = int(context_turns)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        import pyarrow as pa
        import pyarrow.compute as pc

        df = _sorted_conv(df)
        n = len(df)
        conv = df["conv_id"].to_numpy(dtype=object)
        # ALL-ARROW assembly (r3 lesson: Python object-string concat is
        # allocator-bound): pieces = "role: text" via one Arrow join;
        # each lag j is a null-padded slice masked to same-conversation
        # rows; the context accumulates through an if_else fold —
        # zero Python string objects anywhere.
        role = pa.Array.from_pandas(df["role"].astype(str)) \
            .cast(pa.large_string())
        text_raw = pa.Array.from_pandas(df["text"]).cast(pa.large_string())
        # null text: contributes an empty piece to contexts, stays
        # null in targets (the raw value, not the string 'None')
        text = pc.fill_null(text_raw, "")
        pieces = pc.binary_join_element_wise(
            role, text, pa.scalar(": ", type=pa.large_string()))
        # iterative if_else fold, oldest lag first. (NOT one
        # binary_join_element_wise(null_handling="skip") over all k
        # lags: this pyarrow build DROPS rows whose inputs are all
        # null — the output length shrinks.)
        empty = pa.scalar("", type=pa.large_string())
        sep_s = pa.scalar(sep, type=pa.large_string())
        ctx = pa.array([""] * n, type=pa.large_string())
        for j in range(k, 0, -1):  # oldest first
            if j >= n:
                continue
            valid = np.zeros(n, dtype=bool)
            valid[j:] = conv[j:] == conv[:-j]
            lag = pa.concat_arrays([
                pa.nulls(j, type=pa.large_string()),
                pieces.slice(0, n - j)])
            lag_f = pc.fill_null(lag, empty)
            joined = pc.binary_join_element_wise(ctx, lag_f, sep_s)
            grown = pc.if_else(pc.equal(ctx, empty), lag_f, joined)
            ctx = pc.if_else(pa.array(valid), grown, ctx)
        m = pc.equal(role, target_role)
        # return the ARROW table directly — a .to_pandas() here would
        # rebuild every context as a Python object string just for Ray
        # to re-block it
        return pa.table({
            "conv_id": pa.Array.from_pandas(df["conv_id"]),  # any dtype
            "turn_idx": pa.array(df["turn_idx"].to_numpy()),
            "context": ctx,
            "target": text_raw,
        }).filter(m)

    return coarse_partition_apply(ds, "conv_id", kernel,
                                  partitions=partitions)


def sft_example_refs(ds, context_turns: int = 4,
                     target_role: str = "assistant",
                     partitions: int = 64,
                     assume_dense_order: bool = False):
    """Reference-emitting SFT assembly — the 100 TB-scale shape.

    ``sft_examples`` materializes each assistant turn's context text,
    ~k× the assistant text volume; on one box that output saturates
    memory bandwidth (measured 0.44–0.53 scaling efficiency 4→16
    CPUs at sf1). This variant emits constant-size REFERENCES instead:
    one row (conv_id, turn_idx, ctx_start, ctx_len) per ``target_role``
    turn, where the context is the up-to-``context_turns`` turns of the
    same conversation with turn order in [ctx_start, turn_idx) —
    exactly the rows ``sft_render_from_refs`` (or a fused consumer such
    as a tokenizer) needs to rebuild the rendered context. The k×
    blow-up never transits the object store; it is rendered inside the
    consumer task that already holds the conversation partition.

    ctx_start is null when the target is its conversation's first turn
    (ctx_len = 0).

    ``assume_dense_order=True`` declares that ``turn_idx`` IS the
    0-based position within its conversation (dense 0,1,2,... — true
    for the engine's transcript/lineage streams). Then the refs are a
    pure per-row map (ctx_len = min(k, turn_idx)) and NO exchange runs
    at all — the op becomes stateless map_batches, the 100 TB shape.
    With the default False, arbitrary order values are handled via one
    coarse conv exchange.
    """
    k = int(context_turns)

    if assume_dense_order:
        def dense_kernel(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            ti = pc.cast(t["turn_idx"].combine_chunks(), pa.int64()) \
                .to_numpy(zero_copy_only=False)
            m = pc.fill_null(pc.equal(t["role"].combine_chunks(),
                                      target_role), False) \
                .to_numpy(zero_copy_only=False)
            m = np.asarray(m, dtype=bool)
            ti_m = ti[m]
            ctx_len = np.minimum(k, ti_m)
            start = ti_m - ctx_len
            return pa.table({
                "conv_id": t["conv_id"].combine_chunks().filter(
                    pa.array(m)),
                "turn_idx": pa.array(ti_m),
                "ctx_start": pa.array(start, mask=ctx_len == 0),
                "ctx_len": pa.array(ctx_len.astype(np.int64)),
            })

        return ds.map_batches(dense_kernel, batch_format="pyarrow")

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = _sorted_conv(df)
        n = len(df)
        conv = df["conv_id"].to_numpy(dtype=object)
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = conv[1:] != conv[:-1]
        run_id = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        pos = np.arange(n) - starts[run_id]       # 0-based pos in conv
        ctx_len = np.minimum(k, pos)
        ti = df["turn_idx"].to_numpy()
        ctx_start = pd.array(ti[np.arange(n) - ctx_len], dtype="Int64")
        ctx_start[ctx_len == 0] = pd.NA
        m = (df["role"].astype(str) == target_role).to_numpy()
        return pd.DataFrame({
            "conv_id": df["conv_id"].to_numpy()[m],
            "turn_idx": ti[m].astype("int64"),
            "ctx_start": ctx_start[m],
            "ctx_len": ctx_len[m].astype("int64"),
        })

    return coarse_partition_apply(ds, "conv_id", kernel,
                                  partitions=partitions)


def sft_render_from_refs(ds, refs, sep: str = "\n",
                         partitions: int = 64):
    """Consumer-side renderer: co-partition transcripts and refs by
    conv_id (one union exchange) and rebuild (context, target) inside
    each partition — proves the refs are lossless w.r.t.
    ``sft_examples`` and shows the fused-consumer shape (a tokenizer
    would replace the returned strings with token ids in-place)."""
    import pyarrow as pa

    # tag the two sides and union them so ONE coarse exchange
    # co-locates each conversation's turns with its refs
    def tag_turns(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({
            "conv_id": b.column("conv_id"),
            "turn_idx": b.column("turn_idx").cast(pa.int64()),
            "role": b.column("role").cast(pa.large_string()),
            "text": b.column("text").cast(pa.large_string()),
            "_side": pa.array(["t"] * n),
            "ctx_start": pa.nulls(n, type=pa.int64()),
            "ctx_len": pa.nulls(n, type=pa.int64()),
        })

    def tag_refs(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({
            "conv_id": b.column("conv_id"),
            "turn_idx": b.column("turn_idx"),
            "role": pa.nulls(n, type=pa.large_string()),
            "text": pa.nulls(n, type=pa.large_string()),
            "_side": pa.array(["r"] * n),
            "ctx_start": b.column("ctx_start").cast(pa.int64()),
            "ctx_len": b.column("ctx_len").cast(pa.int64()),
        })

    both = (ds.map_batches(tag_turns, batch_format="pyarrow")
            .union(refs.map_batches(tag_refs, batch_format="pyarrow")))

    def render(df: pd.DataFrame) -> pd.DataFrame:
        turns = _sorted_conv(df[df["_side"] == "t"])
        rf = df[df["_side"] == "r"]
        # per-conv turn lookup: (conv_id, turn_idx) → "role: text"
        piece = (turns["role"].astype(str) + ": "
                 + turns["text"].fillna("").astype(str))
        pos = {(c, int(t)): i for i, (c, t) in
               enumerate(zip(turns["conv_id"], turns["turn_idx"]))}
        pieces = piece.to_numpy(dtype=object)
        texts = turns["text"].to_numpy(dtype=object)
        ctxs, tgts = [], []
        for c, t, s, ln in zip(rf["conv_id"], rf["turn_idx"],
                               rf["ctx_start"], rf["ctx_len"]):
            i = pos[(c, int(t))]
            ln = int(ln)
            ctxs.append(sep.join(pieces[i - ln:i]) if ln else "")
            tgts.append(texts[i])
        return pd.DataFrame({
            "conv_id": rf["conv_id"].to_numpy(),
            "turn_idx": rf["turn_idx"].to_numpy().astype("int64"),
            "context": ctxs, "target": tgts})

    return coarse_partition_apply(both, "conv_id", render,
                                  partitions=partitions)


def collapse_repeats(ds, partitions: int = 64,
                     chunk_rows: int | None = None):
    """Dataset[conv_id, turn_idx, role, text, repeats] — consecutive
    turns with identical (role, text) within a conversation collapse
    to their FIRST row plus the run length ("last message repeated N
    times").

    ``chunk_rows`` (hot-key splitting): rows exchange by
    (conv_id, turn_idx//chunk_rows) so the Zipf-head conversation
    never lands in one task; interior runs are emitted locally and
    each chunk's first/last run travels as a tiny boundary record
    through a second exchange where matching (role, text) runs fold
    across the boundary. DENSE 0-based turn_idx contract (runtime
    guard), like MultilineStage.chunk_rows."""
    if chunk_rows is not None:
        return _collapse_repeats_chunked(ds, int(chunk_rows), partitions)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = _sorted_conv(df)
        n = len(df)
        if not n:
            # explicit dtypes: Ray unions of mismatched empty/nonempty
            # schemas degrade silently (see joins union-plan note)
            return pd.DataFrame({
                "conv_id": pd.Series([], dtype=object),
                "turn_idx": pd.Series([], dtype=df["turn_idx"].dtype),
                "role": pd.Series([], dtype=object),
                "text": pd.Series([], dtype=object),
                "repeats": pd.Series([], dtype=np.int64)})
        conv = df["conv_id"].to_numpy(dtype=object)
        role = df["role"].to_numpy(dtype=object)
        text = df["text"].to_numpy(dtype=object)
        new_run = np.ones(n, dtype=bool)
        new_run[1:] = ((conv[1:] != conv[:-1]) | (role[1:] != role[:-1])
                       | (text[1:] != text[:-1]))
        starts = np.flatnonzero(new_run)
        reps = np.diff(np.append(starts, n)).astype(np.int64)
        out = df.iloc[starts][["conv_id", "turn_idx", "role", "text"]]
        out = out.reset_index(drop=True)
        out["repeats"] = reps
        return out

    return coarse_partition_apply(ds, "conv_id", kernel,
                                  partitions=partitions)


def _collapse_repeats_chunked(ds, C: int, partitions: int | None):
    """Chunk-decomposed collapse: same output as the whole-key kernel,
    with each (conv, turn//C) chunk collapsed independently and the
    runs that touch a chunk boundary stitched through a side-channel
    record exchange (shuffle.hash_exchange_apply side_schema)."""
    import pyarrow.compute as pc

    from ..shuffle import hash_exchange_apply

    def add_ck(t: pa.Table) -> pa.Table:
        ck = pc.divide(pc.cast(t["turn_idx"], pa.int64()),
                       pa.scalar(C, pa.int64()))
        return t.append_column("_ck", ck)

    rec_schema = pa.schema([
        pa.field("conv_id", pa.string()),
        pa.field("_ck", pa.int64()),
        pa.field("_kind", pa.int8()),          # 1 lead, 2 trail
        pa.field("turn_idx", pa.int64()),
        pa.field("role", pa.string()),
        pa.field("text", pa.large_string()),
        pa.field("repeats", pa.int64()),
        pa.field("covers_all", pa.bool_()),
    ])
    core_fields = ["conv_id", "turn_idx", "role", "text", "repeats"]

    def kernel(t: pa.Table):
        n = t.num_rows
        key_type = t.schema.field("conv_id").type
        core_schema = pa.schema([
            pa.field("conv_id", key_type),
            pa.field("turn_idx", pa.int64()),
            pa.field("role", t.schema.field("role").type),
            pa.field("text", pa.large_string()),
            pa.field("repeats", pa.int64()),
        ])
        if n == 0:
            return core_schema.empty_table(), None
        conv = t["conv_id"].combine_chunks()
        codes = conv.dictionary_encode().indices \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        turn = pc.cast(t["turn_idx"].combine_chunks(), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        order = np.lexsort((turn, codes))
        codes_s, turn_s = codes[order], turn[order]
        ck_s = turn_s // C
        o_arr = pa.array(order)
        role_s = pc.take(t["role"].combine_chunks(), o_arr)
        text_s = pc.cast(pc.take(t["text"].combine_chunks(), o_arr),
                         pa.large_string())
        role_np = role_s.to_numpy(zero_copy_only=False)
        text_np = text_s.to_numpy(zero_copy_only=False)

        cs = np.ones(n, dtype=bool)
        cs[1:] = (codes_s[1:] != codes_s[:-1]) | (ck_s[1:] != ck_s[:-1])
        g_starts = np.flatnonzero(cs)
        g_ends = np.append(g_starts[1:], n)
        g_min_t, g_max_t = turn_s[g_starts], turn_s[g_ends - 1]
        if ((g_min_t < 0).any()
                or (g_max_t - g_min_t + 1 != g_ends - g_starts).any()):
            raise ValueError(
                "collapse_repeats chunk_rows requires DENSE non-negative "
                "turn_idx per conv_id; pass chunk_rows=None for "
                "arbitrary order values")

        new_run = cs.copy()
        new_run[1:] |= ((role_np[1:] != role_np[:-1])
                        | (text_np[1:] != text_np[:-1]))
        starts = np.flatnonzero(new_run)
        n_runs = len(starts)
        reps = np.diff(np.append(starts, n)).astype(np.int64)

        g_ck = ck_s[g_starts]
        g_full = g_max_t == (g_ck + 1) * C - 1
        fs = np.searchsorted(starts, g_starts)       # first run of group
        ls = np.append(fs[1:], n_runs) - 1           # last run of group
        g_covers = fs == ls

        lead_g = np.flatnonzero(g_ck > 0)
        # a full group's last run stays open (may absorb the next
        # chunk's lead). When the group IS one run and ck>0, the lead
        # record carries it (covers_all keeps it open in the merge);
        # for ck==0 single-run full groups the trail record must.
        trail_g = np.flatnonzero(g_full & (~g_covers | (g_ck == 0)))
        excl = np.zeros(n_runs, dtype=bool)
        excl[fs[lead_g]] = True
        excl[ls[trail_g]] = True
        loc = np.flatnonzero(~excl)

        def run_tbl(ridx, schema, extra=None):
            cols = {
                "conv_id": pc.take(conv, pa.array(order[starts[ridx]])),
                "turn_idx": pa.array(turn_s[starts[ridx]]),
                "role": pc.take(role_s, pa.array(starts[ridx])),
                "text": pc.take(text_s, pa.array(starts[ridx])),
                "repeats": pa.array(reps[ridx]),
            }
            if extra:
                cols.update(extra)
            return pa.table(cols, schema=schema)

        interior = run_tbl(loc, core_schema)

        tabs = []
        if len(lead_g):
            m = len(lead_g)
            tabs.append(run_tbl(fs[lead_g], rec_schema, {
                "conv_id": pc.cast(pc.take(
                    conv, pa.array(order[starts[fs[lead_g]]])),
                    pa.string()),
                "role": pc.cast(pc.take(role_s,
                                        pa.array(starts[fs[lead_g]])),
                                pa.string()),
                "_ck": pa.array(g_ck[lead_g]),
                "_kind": pa.array(np.ones(m, dtype=np.int8)),
                "covers_all": pa.array(g_covers[lead_g]),
            }))
        if len(trail_g):
            m = len(trail_g)
            tabs.append(run_tbl(ls[trail_g], rec_schema, {
                "conv_id": pc.cast(pc.take(
                    conv, pa.array(order[starts[ls[trail_g]]])),
                    pa.string()),
                "role": pc.cast(pc.take(role_s,
                                        pa.array(starts[ls[trail_g]])),
                                pa.string()),
                "_ck": pa.array(g_ck[trail_g]),
                "_kind": pa.array(np.full(m, 2, dtype=np.int8)),
                "covers_all": pa.array(np.zeros(m, dtype=bool)),
            }))
        side = (None if not tabs
                else tabs[0] if len(tabs) == 1
                else pa.concat_tables(tabs))
        return interior, side

    def merge(t: pa.Table) -> pa.Table:
        from collections import defaultdict

        rows = t.to_pylist()
        convs = defaultdict(lambda: ({}, {}))
        for r in rows:
            convs[r["conv_id"]][0 if r["_kind"] == 1 else 1][r["_ck"]] = r
        out = {"conv_id": [], "turn_idx": [], "role": [], "text": [],
               "repeats": []}

        def emit(st):
            out["conv_id"].append(st["conv_id"])
            out["turn_idx"].append(st["turn_idx"])
            out["role"].append(st["role"])
            out["text"].append(st["text"])
            out["repeats"].append(st["repeats"])

        for cv, (leads, trails) in convs.items():
            st = trails.get(0)
            st = dict(st) if st is not None else None
            max_ck = max(max(leads, default=0), max(trails, default=0))
            for ck in range(1, max_ck + 1):
                ld, tr = leads.get(ck), trails.get(ck)
                if ld is None:
                    if st is not None:
                        emit(st)
                    st = dict(tr) if tr is not None else None
                    continue
                if (st is not None and st["role"] == ld["role"]
                        and st["text"] == ld["text"]):
                    st["repeats"] += ld["repeats"]
                    if not ld["covers_all"]:
                        emit(st)
                        st = dict(tr) if tr is not None else None
                else:
                    if st is not None:
                        emit(st)
                    if ld["covers_all"]:
                        st = dict(ld)   # open run, may absorb next chunk
                    else:
                        emit(ld)
                        st = dict(tr) if tr is not None else None
            if st is not None:
                emit(st)
        return pa.table({
            "conv_id": pa.array(out["conv_id"], type=pa.string()),
            "turn_idx": pa.array(out["turn_idx"], type=pa.int64()),
            "role": pa.array(out["role"], type=pa.string()),
            "text": pa.array(out["text"], type=pa.large_string()),
            "repeats": pa.array(out["repeats"], type=pa.int64()),
        })

    interior, records = hash_exchange_apply(
        ds.map_batches(add_ck, batch_format="pyarrow"),
        "conv_id", kernel, partitions=partitions,
        salt_col="_ck", side_schema=rec_schema)
    if records.count() == 0:
        return interior
    merged = hash_exchange_apply(records, "conv_id", merge, partitions=8)
    return interior.union(merged)


def collapse_repeat_refs(ds, partitions: int = 64,
                         chunk_rows: int | None = None):
    """Reference-emitting collapse — the 100 TB shape (r4 VERDICT:
    the text-carrying exchange pinned at the single-box memcpy
    ceiling, 0.42 scaling at sf4, because the full text column moved
    both ways). This variant exchanges (conv_id, turn_idx, role,
    h64(text)) ONLY — ~40 B/row instead of full text — and emits the
    kept-row REFERENCES: Dataset[conv_id, turn_idx, role, repeats].
    The text stays in its source blocks; a consumer that needs it
    attaches per-conversation via ``collapse_render_from_refs`` (or a
    fused consumer tokenizes in place), exactly the
    ``sft_example_refs`` pattern.

    Run equality is decided by role equality + a vectorized 64-bit
    content hash (polars seed-pinned; ``shuffle._hash64_of_arrow``).
    Two ADJACENT differing texts colliding is ~n·2⁻⁶⁴ — negligible at
    10¹² rows — and the refs-path gate query hash-matches the
    text-equality oracle. Null text hashes as the literal "None"
    (same fill the curate kernels use), so null==null continues a run
    like the object-compare kernel.

    ``chunk_rows`` reuses the boundary-record chunk protocol — with
    40 B rows AND chunk splitting, the Zipf-head conversation is no
    longer a single-task problem at any corpus size."""
    import pyarrow.compute as pc

    from ..shuffle import _hash64_of_arrow

    def project(t: pa.Table) -> pa.Table:
        h = _hash64_of_arrow(pc.fill_null(
            pc.cast(t["text"], pa.large_string()), "None"))
        return pa.table({
            "conv_id": t["conv_id"].combine_chunks(),
            "turn_idx": pc.cast(t["turn_idx"].combine_chunks(),
                                pa.int64()),
            "role": t["role"].combine_chunks(),
            "text": pc.cast(pa.array(h), pa.large_string()),
        })

    coll = collapse_repeats(ds.map_batches(project,
                                           batch_format="pyarrow"),
                            partitions=partitions, chunk_rows=chunk_rows)

    def to_refs(t: pa.Table) -> pa.Table:
        return t.select(["conv_id", "turn_idx", "role", "repeats"])

    return coll.map_batches(to_refs, batch_format="pyarrow")


def collapse_render_from_refs(ds, refs, partitions: int = 64):
    """Consumer-side text attach for ``collapse_repeat_refs``: one
    co-partition of turns and refs by conv_id, then an in-partition
    (conv_id, turn_idx) merge rebuilds the full collapsed rows
    (conv_id, turn_idx, role, text, repeats) — proves the refs are
    lossless w.r.t. ``collapse_repeats``. Only here does text move,
    and only because THIS consumer wants the materialized rows; a
    fused consumer replaces the merge output with its own product."""
    def tag_turns(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({
            "conv_id": b.column("conv_id"),
            "turn_idx": b.column("turn_idx").cast(pa.int64()),
            "role": b.column("role").cast(pa.large_string()),
            "text": b.column("text").cast(pa.large_string()),
            "repeats": pa.nulls(n, type=pa.int64()),
            "_side": pa.array(["t"] * n),
        })

    def tag_refs(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({
            "conv_id": b.column("conv_id").cast(pa.string()),
            "turn_idx": b.column("turn_idx").cast(pa.int64()),
            "role": pa.nulls(n, type=pa.large_string()),
            "text": pa.nulls(n, type=pa.large_string()),
            "repeats": b.column("repeats").cast(pa.int64()),
            "_side": pa.array(["r"] * n),
        })

    both = (ds.map_batches(tag_turns, batch_format="pyarrow")
            .union(refs.map_batches(tag_refs, batch_format="pyarrow")))

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        turns = df[df["_side"] == "t"]
        rf = df[df["_side"] == "r"][["conv_id", "turn_idx", "repeats"]]
        out = rf.merge(turns[["conv_id", "turn_idx", "role", "text"]],
                       on=["conv_id", "turn_idx"], how="left")
        out["repeats"] = out["repeats"].astype("int64")
        return out[["conv_id", "turn_idx", "role", "text", "repeats"]]

    return coarse_partition_apply(both, "conv_id", attach,
                                  partitions=partitions)


def conversation_gate(ds, min_turns: int = 1,
                      require_roles: tuple[str, ...] = (),
                      max_turns: int | None = None,
                      partitions: int = 64):
    """Keep only WHOLE conversations passing structural predicates —
    the SFT-prep gate (e.g. ≥3 turns and at least one assistant turn;
    degenerate or truncated conversations are dropped entirely).

    One coarse conv_id exchange (all turns of a conversation land in
    one partition); inside, per-conversation turn counts and role
    presence come from ONE factorize + bincount pass — no
    per-conversation Python. Returns the filtered Dataset (all input
    columns, original rows of surviving conversations).
    """
    want_roles = tuple(require_roles)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        codes, uniques = pd.factorize(df["conv_id"], sort=False)
        n_turns = np.bincount(codes, minlength=len(uniques))
        ok = n_turns >= int(min_turns)
        if max_turns is not None:
            ok &= n_turns <= int(max_turns)
        for role in want_roles:
            has = np.bincount(codes,
                              weights=(df["role"].to_numpy() == role),
                              minlength=len(uniques)) > 0
            ok &= has
        return df[ok[codes]]

    return coarse_partition_apply(ds, "conv_id", kernel,
                                  partitions=partitions)


def render_conversations(ds, sep: str = "\n", partitions: int = 64):
    """Conversation → ONE training text ("role: text" lines in turn
    order) — the chat-rendering export every pretraining/SFT pipeline
    runs before tokenization. Returns Dataset[conv_id, rendered,
    n_turns].

    Same coarse conv_id exchange; inside a partition the rendered
    pieces are built vectorized and conversations are CONTIGUOUS runs
    after the sort, so assembly is boundary arithmetic + one slice-join
    per conversation (the multiline r3 lesson: never groupby.agg(join))."""
    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"conv_id": pd.Series([], dtype="object"),
                                 "rendered": pd.Series([], dtype="object"),
                                 "n_turns": pd.Series([], dtype="int64")})
        df = _sorted_conv(df)
        pieces = (df["role"].astype(str) + ": "
                  + df["text"].astype(str)).to_numpy(dtype=object)
        conv = df["conv_id"].to_numpy(dtype=object)
        starts = np.flatnonzero(np.r_[True, conv[1:] != conv[:-1]])
        ends = np.r_[starts[1:], len(conv)]
        texts = [sep.join(pieces[s:e]) for s, e in zip(starts, ends)]
        return pd.DataFrame({"conv_id": conv[starts],
                             "rendered": texts,
                             "n_turns": (ends - starts).astype("int64")})

    return coarse_partition_apply(ds, "conv_id", kernel,
                                  partitions=partitions)


def curate_transcripts(ds, min_turns: int = 6,
                       require_roles: tuple[str, ...] = ("assistant",
                                                         "user"),
                       boilerplate_min_convs: int = 5,
                       partitions: int = 64,
                       chunk_rows: int | None = None):
    """The composed transcripts-curation pipeline: structural gate →
    cross-conversation boilerplate removal → consecutive-repeat
    collapse → chat rendering. Returns Dataset[conv_id, rendered,
    n_turns] — one training document per surviving conversation.

    Composition stays streaming: the gate and collapse/render share
    the coarse conv exchange shape; boilerplate adds its distinct-pair
    count exchange + one broadcast. Stage order matters and the oracle
    replays it exactly: boilerplate counts distinct conversations on
    the GATED subset, and repeat-runs are detected AFTER removal
    changes adjacency.

    ``chunk_rows`` selects the hot-key-split variant: one exchange by
    (conv, turn//chunk_rows) whose kernel emits per-conv gate partials
    on the side channel (keep-set reduced from those and broadcast);
    each chunk collapses and renders independently and multi-chunk
    conversations stitch their rendered pieces through a tiny per-conv
    merge. DENSE 0-based turn_idx contract. Default is the whole-key
    single-exchange shape: measured on one box it wins at BOTH 4 and
    16 CPUs (the split variant's late gating re-scans ungated rows,
    which costs more than the Zipf-head reduce ceiling it removes).
    On a real multi-node cluster the trade flips — the whole-key path
    puts the hot conversation (10% of a 100 TB corpus) in ONE task,
    which no single worker can hold — so a cluster deployment sets
    chunk_rows (both variants are oracle-verified equal).
    """
    if chunk_rows is not None:
        return _curate_transcripts_chunked(
            ds, min_turns, tuple(require_roles), boilerplate_min_convs,
            partitions, int(chunk_rows))
    import ray

    want_roles = tuple(require_roles)

    # FUSED into ONE full-text conv exchange + one tiny pair exchange
    # (the r3 docs-curated lesson, taken further in r4: the exchange
    # returns a refs-backed Dataset already partitioned by conv, so the
    # pairs scan AND the final pass are plain map_batches over those
    # blocks — re-consuming them costs no re-execution and no second
    # all-to-all. The old two-exchange shape measured a ~5 s
    # non-scaling phase cost PER text exchange at sf1.)
    # Exchange: gate inside (ARROW kernel — the former pandas adapter
    # materialized every text as a PyObject just to run bincounts),
    # output the surviving rows with a vectorized 64-bit text hash
    # computed ONCE (the pairs scan and the final boilerplate drop
    # both reuse it). The hash is internal co-identity only — the
    # oracle derives its own boilerplate SET from the same ≥N-convs
    # rule, so any injective-enough hash matches; the per-call-Python
    # md5 was ~25 CPU·s per sf4 pass.
    def gate_kernel(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ..shuffle import _hash64_of_arrow

        if t.num_rows == 0:
            return t.append_column("_h64", pa.array([], pa.uint64()))
        conv = t["conv_id"].combine_chunks()
        dct = conv.dictionary_encode()
        codes = dct.indices.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        nu = len(dct.dictionary)
        ok = np.bincount(codes, minlength=nu) >= int(min_turns)
        role = t["role"].combine_chunks()
        for r in want_roles:
            w = pc.fill_null(pc.equal(role, r), False) \
                .to_numpy(zero_copy_only=False).astype(np.float64)
            ok &= np.bincount(codes, weights=w, minlength=nu) > 0
        t = t.filter(pa.array(ok[codes]))
        h = _hash64_of_arrow(
            pc.fill_null(pc.cast(t["text"].combine_chunks(),
                                 pa.large_string()), "None"))
        return t.append_column("_h64", pa.array(h))

    gated = coarse_partition_apply(ds, "conv_id", gate_kernel,
                                   partitions=partitions,
                                   batch_format="pyarrow")

    # Distinct (h64(text), conv) pairs per block: each conv is whole
    # inside one block, so per-block distinct == per-conv distinct
    # (16 B rows leave the node, never text). Arrow/numpy throughout —
    # distinct via lexsort run-detection, conv strings only for the
    # surviving pair rows.
    def pairs_batch(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if t.num_rows == 0:
            return pa.table({"h": pa.array([], pa.uint64()),
                             "g": pa.array([], pa.string())})
        h = t["_h64"].combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.uint64)
        conv = t["conv_id"].combine_chunks()
        codes = conv.dictionary_encode().indices \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((h, codes))
        hs, cs = h[order], codes[order]
        first = np.ones(len(order), dtype=bool)
        first[1:] = (hs[1:] != hs[:-1]) | (cs[1:] != cs[:-1])
        sel = pa.array(order[first])
        return pa.table({"h": pa.array(hs[first]),
                         "g": pc.cast(pc.take(conv, sel), pa.string())})

    pairs = gated.map_batches(pairs_batch, batch_format="pyarrow",
                              batch_size=None)

    def count_kernel(part: pd.DataFrame) -> pd.DataFrame:
        vc = part.drop_duplicates()["h"].value_counts()
        bad = vc[vc >= boilerplate_min_convs].index \
            .to_numpy(dtype=np.uint64)
        return pd.DataFrame({"h": bad})

    badf = coarse_partition_apply(pairs, "h", count_kernel).to_pandas()
    bad = np.sort(badf["h"].to_numpy(dtype=np.uint64)) if len(badf) else \
        np.array([], dtype=np.uint64)
    bad_ref = ray.put(bad)

    # Final pass: map over the same conv-partitioned blocks — drop
    # boilerplate rows (reusing the gate-computed h64), collapse runs,
    # render — one ARROW kernel, no re-shuffle. Rendering is the
    # multiline list-join shape: "role: text" pieces via one
    # binary_join_element_wise, per-conv docs via LargeListArray +
    # binary_join — zero Python string objects (the former f-string +
    # "\n".join loops were the pass's hottest term after md5).
    def final_kernel(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        out_schema = pa.schema([
            pa.field("conv_id", t.schema.field("conv_id").type
                     if "conv_id" in t.column_names else pa.string()),
            pa.field("rendered", pa.large_string()),
            pa.field("n_turns", pa.int64()),
        ])
        if t.num_rows == 0:
            return out_schema.empty_table()
        b = ray.get(bad_ref)
        if len(b):
            h = t["_h64"].combine_chunks() \
                .to_numpy(zero_copy_only=False).astype(np.uint64)
            pos = np.searchsorted(b, h)
            pos[pos == len(b)] = 0
            t = t.filter(pa.array(b[pos] != h))
        n = t.num_rows
        if n == 0:
            return out_schema.empty_table()
        conv = t["conv_id"].combine_chunks()
        codes = conv.dictionary_encode().indices \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        turn = pc.cast(t["turn_idx"].combine_chunks(), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        order = np.lexsort((turn, codes))
        o_arr = pa.array(order)
        codes_s = codes[order]
        # null role/text render and compare as "None" — the pandas
        # kernel's f-string and None == None run semantics
        role_s = pc.fill_null(
            pc.cast(pc.take(t["role"].combine_chunks(), o_arr),
                    pa.large_string()), "None")
        text_s = pc.fill_null(
            pc.cast(pc.take(t["text"].combine_chunks(), o_arr),
                    pa.large_string()), "None")
        conv_brk = np.ones(n, dtype=bool)
        conv_brk[1:] = codes_s[1:] != codes_s[:-1]
        same_role = pc.equal(role_s.slice(1), role_s.slice(0, n - 1)) \
            .to_numpy(zero_copy_only=False).astype(bool)
        same_text = pc.equal(text_s.slice(1), text_s.slice(0, n - 1)) \
            .to_numpy(zero_copy_only=False).astype(bool)
        keep = np.ones(n, dtype=bool)
        keep[1:] = conv_brk[1:] | ~(same_role & same_text)
        kidx = np.flatnonzero(keep)
        k_arr = pa.array(kidx)
        pieces = pc.binary_join_element_wise(
            pc.take(role_s, k_arr), pc.take(text_s, k_arr),
            pa.scalar(": ", type=pa.large_string()))
        codes_k = codes_s[kidx]
        starts = np.flatnonzero(np.r_[True, codes_k[1:] != codes_k[:-1]])
        offsets = pa.array(np.append(starts, len(kidx)).astype(np.int64),
                           type=pa.int64())
        rendered = pc.binary_join(
            pa.LargeListArray.from_arrays(offsets, pieces),
            pa.scalar("\n", type=pa.large_string()))
        n_turns = np.diff(np.append(starts, len(kidx))).astype(np.int64)
        return pa.table({
            "conv_id": pc.take(conv, pa.array(order[kidx[starts]])),
            "rendered": rendered,
            "n_turns": pa.array(n_turns),
        }, schema=out_schema)

    return gated.map_batches(final_kernel, batch_format="pyarrow",
                             batch_size=None)


def _curate_transcripts_chunked(ds, min_turns: int, want_roles: tuple,
                                boilerplate_min_convs: int,
                                partitions: int | None, C: int):
    """Hot-key-safe curation (see curate_transcripts docstring):
    broadcast pre-gate → chunk-salted co-location exchange →
    per-chunk boilerplate-drop + collapse + render, with multi-chunk
    conversations' rendered pieces stitched by a per-conv merge."""
    import pyarrow.compute as pc
    import ray

    from ..shuffle import _hash64_of_arrow, hash_exchange_apply
    from .boilerplate import _h64_col

    # ---- 1. ONE salted co-location exchange over all rows; the
    # kernel is identity for the main output (the refs-backed blocks
    # ARE the working set) and emits per-conv gate PARTIALS
    # (n_turns, role counts) on the side channel — the gate needs
    # whole-conv totals, which chunk splitting denies the kernel, so
    # totals are reduced from the tiny side rows instead.
    side_schema = pa.schema(
        [pa.field("g", pa.string()), pa.field("n", pa.int64())]
        + [pa.field(f"r{i}", pa.int64())
           for i in range(len(want_roles))])

    def pre(t: pa.Table) -> pa.Table:
        t = t.select(["conv_id", "turn_idx", "role", "text"])
        ck = pc.divide(pc.cast(t["turn_idx"], pa.int64()),
                       pa.scalar(C, pa.int64()))
        return t.append_column("_ck", ck)

    def colocate(t: pa.Table):
        conv = t["conv_id"].combine_chunks()
        dct = conv.dictionary_encode()
        codes = dct.indices.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        nu = len(dct.dictionary)
        cols = {"g": pc.cast(dct.dictionary, pa.string()),
                "n": pa.array(np.bincount(codes, minlength=nu))}
        role = t["role"].combine_chunks()
        for i, r in enumerate(want_roles):
            w = pc.fill_null(pc.equal(role, r), False) \
                .to_numpy(zero_copy_only=False).astype(np.float64)
            cols[f"r{i}"] = pa.array(np.bincount(
                codes, weights=w, minlength=nu).astype(np.int64))
        return t, pa.table(cols, schema=side_schema)

    gated, gate_partials = hash_exchange_apply(
        ds.map_batches(pre, batch_format="pyarrow"),
        "conv_id", colocate, partitions=partitions, salt_col="_ck",
        side_schema=side_schema)

    def gate_total(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby("g", sort=False).sum(numeric_only=True)
        ok = agg["n"] >= int(min_turns)
        for i in range(len(want_roles)):
            ok &= agg[f"r{i}"] > 0
        return pd.DataFrame({"g": agg.index[ok]})

    keepf = hash_exchange_apply(gate_partials, "g", gate_total,
                                kernel_format="pandas").to_pandas()
    # keep-set as sorted u64 (same vectorized hash on both sides;
    # internal only — collisions are ~(n_keep²/2⁶⁵)). At cluster scale
    # past broadcastable keep-set sizes this becomes a semi-join.
    keep = (np.sort(_hash64_of_arrow(
                pa.array(keepf["g"].astype(str), type=pa.string())))
            if len(keepf) else np.array([], dtype=np.uint64))
    keep_ref = ray.put(keep)

    def keep_mask(conv_col: pd.Series) -> np.ndarray:
        k = ray.get(keep_ref)
        if not len(k):
            return np.zeros(len(conv_col), dtype=bool)
        h = _hash64_of_arrow(pa.array(conv_col.astype(str),
                                      type=pa.string()))
        pos = np.searchsorted(k, h)
        pos[pos == len(k)] = 0
        return k[pos] == h

    # ---- 2. boilerplate hash counts over the co-located blocks,
    # gated rows only (distinct (h64, conv) per block is distinct per
    # conv: every (conv, chunk) group is whole in one block, and
    # count_kernel re-dedups across a conv's chunks)
    def pairs_batch(df: pd.DataFrame) -> pd.DataFrame:
        df = df[keep_mask(df["conv_id"])]
        out = pd.DataFrame({"h": _h64_col(df["text"]),
                            "g": df["conv_id"].astype(str)})
        return out.drop_duplicates()

    pairs = gated.map_batches(pairs_batch, batch_format="pandas",
                              batch_size=None)

    def count_kernel(part: pd.DataFrame) -> pd.DataFrame:
        vc = part.drop_duplicates()["h"].value_counts()
        bad = vc[vc >= boilerplate_min_convs].index \
            .to_numpy(dtype=np.uint64)
        return pd.DataFrame({"h": bad})

    badf = coarse_partition_apply(pairs, "h", count_kernel).to_pandas()
    bad = np.sort(badf["h"].to_numpy(dtype=np.uint64)) if len(badf) else \
        np.array([], dtype=np.uint64)
    bad_ref = ray.put(bad)

    # ---- 4. per-chunk drop + collapse + render. Single-chunk convs
    # finalize locally; multi-chunk convs emit one PIECE row per chunk
    # (lead line, rest, trailing run identity) stitched in the merge.
    # Multi-chunk-ness is decided on the PRE-drop rows (dense turns):
    # ck>0, or chunk 0 full.
    def final_kernel(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "conv_id": pd.Series([], dtype="object"),
            "rendered": pd.Series([], dtype="object"),
            "n_turns": pd.Series([], dtype="int64"),
            "_kind": pd.Series([], dtype="int64"),
            "_ck": pd.Series([], dtype="int64"),
            "lead_role": pd.Series([], dtype="object"),
            "lead_text": pd.Series([], dtype="object"),
            "trail_role": pd.Series([], dtype="object"),
            "trail_text": pd.Series([], dtype="object"),
            "n_rest": pd.Series([], dtype="int64"),
        })
        if not len(df):
            return empty
        df = df[keep_mask(df["conv_id"])]       # gated convs only
        if not len(df):
            return empty
        df = _sorted_conv(df)
        conv_a = df["conv_id"].to_numpy(dtype=object)
        turn_a = df["turn_idx"].to_numpy().astype(np.int64)
        ck_a = df["_ck"].to_numpy().astype(np.int64)
        # multi-chunk flag per conv from PRE-drop rows
        multi_convs = set(conv_a[(ck_a > 0)
                                 | (turn_a % C == C - 1)].tolist())
        b = ray.get(bad_ref)
        if len(b):
            h = _h64_col(df["text"])
            pos = np.searchsorted(b, h)
            pos[pos == len(b)] = 0
            df = df[b[pos] != h]
        if not len(df):
            return empty
        n = len(df)
        conv = df["conv_id"].to_numpy(dtype=object)
        ck = df["_ck"].to_numpy().astype(np.int64)
        role = df["role"].to_numpy(dtype=object)
        text = df["text"].to_numpy(dtype=object)
        grp_chg = np.ones(n, dtype=bool)
        grp_chg[1:] = (conv[1:] != conv[:-1]) | (ck[1:] != ck[:-1])
        keep_m = grp_chg.copy()        # first row of each run
        keep_m[1:] |= (role[1:] != role[:-1]) | (text[1:] != text[:-1])
        kidx = np.flatnonzero(keep_m)
        conv_k, ck_k = conv[kidx], ck[kidx]
        role_k, text_k = role[kidx], text[kidx]
        pieces = np.array([f"{r}: {t}" for r, t in zip(role_k, text_k)],
                          dtype=object)
        gchg = np.ones(len(kidx), dtype=bool)
        gchg[1:] = (conv_k[1:] != conv_k[:-1]) | (ck_k[1:] != ck_k[:-1])
        starts = np.flatnonzero(gchg)
        ends = np.append(starts[1:], len(kidx))
        out_rows = {k: [] for k in empty.columns}

        def emit(cv, kind, ckv, rendered, n_turns, lead_rt, trail_rt,
                 n_rest):
            out_rows["conv_id"].append(cv)
            out_rows["_kind"].append(kind)
            out_rows["_ck"].append(ckv)
            out_rows["rendered"].append(rendered)
            out_rows["n_turns"].append(n_turns)
            out_rows["lead_role"].append(lead_rt[0])
            out_rows["lead_text"].append(lead_rt[1])
            out_rows["trail_role"].append(trail_rt[0])
            out_rows["trail_text"].append(trail_rt[1])
            out_rows["n_rest"].append(n_rest)

        for s, e in zip(starts, ends):
            cv = conv_k[s]
            if cv not in multi_convs:
                emit(cv, 0, int(ck_k[s]),
                     "\n".join(pieces[s:e]), int(e - s),
                     (None, None), (None, None), 0)
            else:
                # piece: lead line + rest; merge decides the lead
                rest = "\n".join(pieces[s + 1:e])
                emit(cv, 1, int(ck_k[s]), rest, 0,
                     (role_k[s], text_k[s]),
                     (role_k[e - 1], text_k[e - 1]), int(e - s - 1))
        return pd.DataFrame(out_rows)[list(empty.columns)]

    finals = gated.map_batches(final_kernel, batch_format="pandas",
                               batch_size=None)

    def keep_local(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["_kind"] == 0][["conv_id", "rendered", "n_turns"]]

    def keep_pieces(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["_kind"] == 1]

    local = finals.map_batches(keep_local, batch_format="pandas")
    piece_ds = finals.map_batches(keep_pieces, batch_format="pandas")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = {"conv_id": [], "rendered": [], "n_turns": []}
        for cv, g in df.groupby("conv_id", sort=False):
            g = g.sort_values("_ck")
            parts, nt, open_rt = [], 0, None
            for r in g.itertuples(index=False):
                lead_rt = (r.lead_role, r.lead_text)
                if open_rt is None or lead_rt != open_rt:
                    parts.append(f"{r.lead_role}: {r.lead_text}")
                    nt += 1
                if r.n_rest:
                    parts.append(r.rendered)
                    nt += int(r.n_rest)
                open_rt = (r.trail_role, r.trail_text)
            out["conv_id"].append(cv)
            out["rendered"].append("\n".join(parts))
            out["n_turns"].append(nt)
        o = pd.DataFrame(out)
        o["n_turns"] = o["n_turns"].astype("int64")
        return o

    merged = coarse_partition_apply(piece_ds, "conv_id", merge,
                                    partitions=8)
    return local.union(merged)


def curate_transcript_refs(ds, min_turns: int = 6,
                           require_roles: tuple[str, ...] = ("assistant",
                                                             "user"),
                           boilerplate_min_convs: int = 5,
                           partitions: int = 64,
                           chunk_rows: int | None = None):
    """Reference-emitting curation — the 100 TB shape of
    ``curate_transcripts`` (r4 VERDICT: the whole-key path ships one
    full-text conv exchange and materializes the rendered corpus;
    measured 0.47–0.51 sf4 scaling, memcpy-bound). Here TEXT NEVER
    TRANSITS ANY EXCHANGE:

    1. one projection pass hashes text in place →
       (conv_id, turn_idx, role, h64) @ ~40 B/row, materialized once
       (at 100 TB input the projection is ~1% of corpus bytes and
       spills to the object store; the raw text is read exactly once);
    2. the structural gate reduces per-BLOCK (conv → n_turns, role
       presence, max chunk) partials through a tiny exchange — no
       data-row co-location at all — and broadcasts the surviving-conv
       keep-set as sorted u64;
    3. boilerplate counts distinct (h64, conv) pairs per block (16 B
       rows) through the same tiny-exchange shape and broadcasts the
       bad-set;
    4. both broadcast sets filter the projection statelessly, and the
       repeat collapse runs over the filtered 40 B rows via one
       (optionally chunk-salted) exchange.

    ``chunk_rows`` splits hot conversations by PRE-filter
    turn_idx//chunk_rows (dense turns, so chunk ids are stable even
    though the filtered rows are not dense). Because gating and
    boilerplate removal can empty whole chunks, the boundary protocol
    here tolerates MISSING chunks: only conversations the gate
    partials saw spanning >1 chunk emit boundary run records (whole /
    lead / trail per surviving chunk), and a per-conv state machine
    folds matching runs across whatever chunks survive — unlike the
    dense-contract protocol in ``_collapse_repeats_chunked``, which
    infers openness from chunk fullness and would mis-stitch filtered
    rows.

    Returns Dataset[conv_id, turn_idx] — the turns the rendered
    curation keeps, i.e. exactly the rows a consumer renders/tokenizes
    via ``curate_render_from_refs`` (which hash-matches
    ``curate_transcripts``'s full oracle through this path).

    Broadcast-set scale note: the keep/bad/multi sets are one u64 per
    surviving CONVERSATION / boilerplate TEXT / hot conversation —
    corpus-cardinality dependent, not row-count dependent; past
    broadcastable sizes they become semi-joins (same switch documented
    in the chunked curate).
    """
    import pyarrow.compute as pc
    import ray

    from ..shuffle import _hash64_of_arrow, hash_exchange_apply

    want_roles = tuple(require_roles)
    C = int(chunk_rows) if chunk_rows is not None else None

    def project(t: pa.Table) -> pa.Table:
        h = _hash64_of_arrow(pc.fill_null(
            pc.cast(t["text"], pa.large_string()), "None"))
        turn = pc.cast(t["turn_idx"].combine_chunks(), pa.int64())
        conv = pc.cast(t["conv_id"].combine_chunks(), pa.string())
        cols = {
            "conv_id": conv,
            "turn_idx": turn,
            "role": pc.cast(t["role"].combine_chunks(),
                            pa.large_string()),
            "_h64": pa.array(h),
            # conv hash computed ONCE here; the pairs pass, the filter
            # pass and the collapse kernel all test membership on it
            "_ch": pa.array(_hash64_of_arrow(conv)),
        }
        if C is not None:
            cols["_ck"] = pc.divide(turn, pa.scalar(C, pa.int64()))
        return pa.table(cols)

    # materialize: gate partials, pairs and the collapse all consume
    # the projection; without this each consumer would re-read (and
    # re-hash) the raw corpus
    proj = ds.map_batches(project, batch_format="pyarrow").materialize()

    # ---- structural gate from per-block partials (no co-location)
    def gate_partials(t: pa.Table) -> pa.Table:
        conv = t["conv_id"].combine_chunks()
        dct = conv.dictionary_encode()
        codes = dct.indices.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        nu = len(dct.dictionary)
        cols = {"g": pc.cast(dct.dictionary, pa.string()),
                "n": pa.array(np.bincount(codes, minlength=nu))}
        role = t["role"].combine_chunks()
        for i, r in enumerate(want_roles):
            w = pc.fill_null(pc.equal(role, r), False) \
                .to_numpy(zero_copy_only=False).astype(np.float64)
            cols[f"r{i}"] = pa.array(np.bincount(
                codes, weights=w, minlength=nu).astype(np.int64))
        if C is not None:
            ck = t["_ck"].combine_chunks() \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            mx = np.zeros(nu, dtype=np.int64)
            np.maximum.at(mx, codes, ck)
            cols["mx"] = pa.array(mx)
        return pa.table(cols)

    def gate_total(df: pd.DataFrame) -> pd.DataFrame:
        gb = df.groupby("g", sort=False)
        agg = gb.sum(numeric_only=True)
        ok = agg["n"] >= int(min_turns)
        for i in range(len(want_roles)):
            ok &= agg[f"r{i}"] > 0
        out = pd.DataFrame({"g": agg.index[ok]})
        if C is not None:
            out["multi"] = (gb["mx"].max()[ok] > 0).to_numpy()
        return out

    # NOTE (r5 A/B): reducing the partials on the DRIVER instead of
    # through this exchange measured 14.4 s vs 8.5 s for the whole op
    # at sf4/16 CPUs — the driver-side to_pandas pull serializes what
    # the exchange reduces in parallel. The exchange stays.
    keepf = hash_exchange_apply(
        proj.map_batches(gate_partials, batch_format="pyarrow"),
        "g", gate_total, kernel_format="pandas").to_pandas()
    keep = (np.sort(_hash64_of_arrow(
                pa.array(keepf["g"].astype(str), type=pa.string())))
            if len(keepf) else np.array([], dtype=np.uint64))
    keep_ref = ray.put(keep)
    if C is not None:
        mf = keepf[keepf["multi"]] if len(keepf) else keepf
        multi = (np.sort(_hash64_of_arrow(
                     pa.array(mf["g"].astype(str), type=pa.string())))
                 if len(mf) else np.array([], dtype=np.uint64))
        multi_ref = ray.put(multi)

    def _in_sorted(h: np.ndarray, k: np.ndarray) -> np.ndarray:
        if not len(k):
            return np.zeros(len(h), dtype=bool)
        pos = np.searchsorted(k, h)
        pos[pos == len(k)] = 0
        return k[pos] == h

    # ---- boilerplate bad-set from per-block distinct (h64, conv)
    # pairs (count_kernel re-dedups across blocks, so ANY block
    # structure is fine — no conv co-location needed here either)
    def pairs_batch(t: pa.Table) -> pa.Table:
        ch = t["_ch"].combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.uint64)
        t = t.filter(pa.array(_in_sorted(ch, ray.get(keep_ref))))
        if t.num_rows == 0:
            return pa.table({"h": pa.array([], pa.uint64()),
                             "g": pa.array([], pa.string())})
        h = t["_h64"].combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.uint64)
        conv = t["conv_id"].combine_chunks()
        codes = conv.dictionary_encode().indices \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((h, codes))
        hs, cs = h[order], codes[order]
        first = np.ones(len(order), dtype=bool)
        first[1:] = (hs[1:] != hs[:-1]) | (cs[1:] != cs[:-1])
        return pa.table({"h": pa.array(hs[first]),
                         "g": pc.cast(pc.take(conv,
                                              pa.array(order[first])),
                                      pa.string())})

    def count_kernel(part: pd.DataFrame) -> pd.DataFrame:
        vc = part.drop_duplicates()["h"].value_counts()
        bad = vc[vc >= boilerplate_min_convs].index \
            .to_numpy(dtype=np.uint64)
        return pd.DataFrame({"h": bad})

    badf = hash_exchange_apply(
        proj.map_batches(pairs_batch, batch_format="pyarrow"),
        "h", count_kernel, kernel_format="pandas").to_pandas()
    bad = np.sort(badf["h"].to_numpy(dtype=np.uint64)) if len(badf) \
        else np.array([], dtype=np.uint64)
    bad_ref = ray.put(bad)

    # ---- stateless gate+boilerplate filter over the projection
    def filter_rows(t: pa.Table) -> pa.Table:
        ch = t["_ch"].combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.uint64)
        m = _in_sorted(ch, ray.get(keep_ref))
        h = t["_h64"].combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.uint64)
        m &= ~_in_sorted(h, ray.get(bad_ref))
        t = t.filter(pa.array(m))
        cols = {
            "conv_id": t["conv_id"].combine_chunks(),
            "turn_idx": t["turn_idx"].combine_chunks(),
            "role": t["role"].combine_chunks(),
            "text": pc.cast(t["_h64"].combine_chunks(),
                            pa.large_string()),
        }
        if C is not None:
            cols["_ck"] = t["_ck"].combine_chunks()
        return pa.table(cols)

    filtered = proj.map_batches(filter_rows, batch_format="pyarrow")

    ref_schema = pa.schema([pa.field("conv_id", pa.string()),
                            pa.field("turn_idx", pa.int64())])

    def to_refs(t: pa.Table) -> pa.Table:
        return pa.table({
            "conv_id": pc.cast(t["conv_id"].combine_chunks(),
                               pa.string()),
            "turn_idx": pc.cast(t["turn_idx"].combine_chunks(),
                                pa.int64()),
        }, schema=ref_schema)

    if C is None:
        coll = collapse_repeats(filtered, partitions=partitions)
        return coll.map_batches(to_refs, batch_format="pyarrow")

    # ---- chunk-salted collapse-to-refs with a MISSING-chunk-tolerant
    # boundary protocol: only convs the gate saw spanning >1 chunk
    # (the multi-set) emit records; each surviving (conv, chunk) group
    # of such a conv sends its first/last run (or one `whole` record
    # when the group is a single run), and the per-conv merge folds
    # matching (role, h) runs across whatever chunks survive.
    rec_schema = pa.schema([
        pa.field("conv_id", pa.string()),
        pa.field("_ck", pa.int64()),
        pa.field("_kind", pa.int8()),          # 0 whole, 1 lead, 2 trail
        pa.field("turn_idx", pa.int64()),
        pa.field("role", pa.large_string()),
        pa.field("h", pa.large_string()),
    ])

    def kernel(t: pa.Table):
        n = t.num_rows
        if n == 0:
            return ref_schema.empty_table(), None
        conv = pc.cast(t["conv_id"].combine_chunks(), pa.string())
        dct = conv.dictionary_encode()
        codes = dct.indices.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        turn = pc.cast(t["turn_idx"].combine_chunks(), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        order = np.lexsort((turn, codes))
        codes_s, turn_s = codes[order], turn[order]
        ck_s = t["_ck"].combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)[order]
        o_arr = pa.array(order)
        role_s = pc.take(t["role"].combine_chunks(), o_arr)
        text_s = pc.take(t["text"].combine_chunks(), o_arr)
        role_np = role_s.to_numpy(zero_copy_only=False)
        text_np = text_s.to_numpy(zero_copy_only=False)

        grp = np.ones(n, dtype=bool)
        grp[1:] = (codes_s[1:] != codes_s[:-1]) | (ck_s[1:] != ck_s[:-1])
        new_run = grp.copy()
        new_run[1:] |= ((role_np[1:] != role_np[:-1])
                        | (text_np[1:] != text_np[:-1]))
        starts = np.flatnonzero(new_run)
        n_runs = len(starts)
        g_starts = np.flatnonzero(grp)
        fs = np.searchsorted(starts, g_starts)      # first run of group
        ls = np.append(fs[1:], n_runs) - 1          # last run of group

        # which groups belong to multi-chunk (hot) convs
        dict_multi = _in_sorted(
            _hash64_of_arrow(dct.dictionary), ray.get(multi_ref))
        g_multi = dict_multi[codes_s[g_starts]]

        excl = np.zeros(n_runs, dtype=bool)
        mi = np.flatnonzero(g_multi)
        excl[fs[mi]] = True
        excl[ls[mi]] = True
        loc = np.flatnonzero(~excl)
        interior = pa.table({
            "conv_id": pc.take(conv, pa.array(order[starts[loc]])),
            "turn_idx": pa.array(turn_s[starts[loc]]),
        }, schema=ref_schema)

        if not len(mi):
            return interior, None
        g_whole = fs[mi] == ls[mi]
        rec_ridx, rec_kind, rec_gi = [], [], []
        for sel, kind in ((np.flatnonzero(g_whole), 0),
                          (np.flatnonzero(~g_whole), 1),
                          (np.flatnonzero(~g_whole), 2)):
            if not len(sel):
                continue
            gi = mi[sel]
            rec_ridx.append((fs if kind in (0, 1) else ls)[gi])
            rec_kind.append(np.full(len(gi), kind, dtype=np.int8))
            rec_gi.append(gi)
        ridx = np.concatenate(rec_ridx)
        gidx = np.concatenate(rec_gi)
        side = pa.table({
            "conv_id": pc.take(conv, pa.array(order[starts[ridx]])),
            "_ck": pa.array(ck_s[g_starts[gidx]]),
            "_kind": pa.array(np.concatenate(rec_kind)),
            "turn_idx": pa.array(turn_s[starts[ridx]]),
            "role": pc.cast(pc.take(role_s, pa.array(starts[ridx])),
                            pa.large_string()),
            "h": pc.cast(pc.take(text_s, pa.array(starts[ridx])),
                         pa.large_string()),
        }, schema=rec_schema)
        return interior, side

    def merge(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        out_conv, out_turn = [], []
        for cv, g in df.groupby("conv_id", sort=False):
            g = g.sort_values(["_ck", "_kind"])
            open_run = None                    # (role, h, start_turn)
            for kind, role, h, ti in zip(g["_kind"], g["role"],
                                         g["h"], g["turn_idx"]):
                if kind in (0, 1):             # first record of chunk
                    if (open_run is not None
                            and open_run[0] == role
                            and open_run[1] == h):
                        if kind == 1:          # lead closes in-chunk
                            out_conv.append(cv)
                            out_turn.append(open_run[2])
                            open_run = None
                        # whole: run stays open, start unchanged
                    else:
                        if open_run is not None:
                            out_conv.append(cv)
                            out_turn.append(open_run[2])
                            open_run = None
                        if kind == 0:
                            open_run = (role, h, ti)
                        else:                  # lead run closes in-chunk
                            out_conv.append(cv)
                            out_turn.append(ti)
                else:                          # trail opens a run
                    open_run = (role, h, ti)
            if open_run is not None:
                out_conv.append(cv)
                out_turn.append(open_run[2])
        return pa.table({
            "conv_id": pa.array(out_conv, type=pa.string()),
            "turn_idx": pa.array(np.asarray(out_turn, dtype=np.int64)),
        }, schema=ref_schema)

    interior, records = hash_exchange_apply(
        filtered, "conv_id", kernel, partitions=partitions,
        salt_col="_ck", side_schema=rec_schema)
    if records.count() == 0:
        return interior
    merged = hash_exchange_apply(records, "conv_id", merge, partitions=8)
    return interior.union(merged)



def curate_render_from_refs(ds, refs, partitions: int = 64):
    """Consumer-side renderer for ``curate_transcript_refs``: one
    co-partition of raw turns and kept-refs by conv_id, then each
    partition filters its turns to the kept (conv_id, turn_idx) set
    and renders "role: text" lines in turn order → Dataset[conv_id,
    rendered, n_turns], byte-equal to ``curate_transcripts``. The
    only text movement in the whole refs-curation is this render
    exchange — and a fused consumer (tokenizer, packer) replaces it
    with in-place consumption."""
    def tag_turns(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({
            "conv_id": b.column("conv_id").cast(pa.string()),
            "turn_idx": b.column("turn_idx").cast(pa.int64()),
            "role": b.column("role").cast(pa.large_string()),
            "text": b.column("text").cast(pa.large_string()),
            "_side": pa.array(["t"] * n),
        })

    def tag_refs(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({
            "conv_id": b.column("conv_id").cast(pa.string()),
            "turn_idx": b.column("turn_idx").cast(pa.int64()),
            "role": pa.nulls(n, type=pa.large_string()),
            "text": pa.nulls(n, type=pa.large_string()),
            "_side": pa.array(["r"] * n),
        })

    both = (ds.map_batches(tag_turns, batch_format="pyarrow")
            .union(refs.map_batches(tag_refs, batch_format="pyarrow")))

    def render(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "conv_id": pd.Series([], dtype="object"),
            "rendered": pd.Series([], dtype="object"),
            "n_turns": pd.Series([], dtype="int64")})
        turns = df[df["_side"] == "t"]
        rf = df[df["_side"] == "r"][["conv_id", "turn_idx"]]
        sub = turns.merge(rf, on=["conv_id", "turn_idx"], how="inner")
        if not len(sub):
            return empty
        sub = _sorted_conv(sub)
        pieces = (sub["role"].astype(str) + ": "
                  + sub["text"].astype(str)).to_numpy(dtype=object)
        conv = sub["conv_id"].to_numpy(dtype=object)
        starts = np.flatnonzero(np.r_[True, conv[1:] != conv[:-1]])
        ends = np.r_[starts[1:], len(conv)]
        return pd.DataFrame({
            "conv_id": conv[starts],
            "rendered": ["\n".join(pieces[s:e])
                         for s, e in zip(starts, ends)],
            "n_turns": (ends - starts).astype("int64")})

    return coarse_partition_apply(both, "conv_id", render,
                                  partitions=partitions)


def curate_pack_from_refs(ds, refs, budget: int = 2048,
                          partitions: int = 64, shards: int = 16):
    """Fused refs CONSUMER — the end-to-end 100 TB shape the refs
    curation exists for: raw turns and kept-refs co-partition by
    conv_id; inside the partition each surviving conversation's token
    count comes straight from its kept "role: text" pieces (the token
    count of the "\\n"-join EQUALS the sum of per-piece counts, so the
    rendered corpus never exists anywhere, not even inside the task);
    the resulting one-row-per-conversation (conv_id, n_tokens) stream
    greedy-packs into training bins of at most ``budget`` tokens in
    conv_id order per md5-hash SHARD (pack_sequences' kernel contract:
    an over-budget conversation gets its own bin; bins are numbered
    per shard — packing is inherently serial in key order, and the
    shard split bounds that serialization, mirrors pack_sequences'
    ``shards`` and keeps the oracle's recursive replay shallow).

    Returns Dataset[conv_id, n_tokens, shard, bin_idx]."""
    def tag_turns(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({
            "conv_id": b.column("conv_id").cast(pa.string()),
            "turn_idx": b.column("turn_idx").cast(pa.int64()),
            "role": b.column("role").cast(pa.large_string()),
            "text": b.column("text").cast(pa.large_string()),
            "_side": pa.array(["t"] * n),
        })

    def tag_refs(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({
            "conv_id": b.column("conv_id").cast(pa.string()),
            "turn_idx": b.column("turn_idx").cast(pa.int64()),
            "role": pa.nulls(n, type=pa.large_string()),
            "text": pa.nulls(n, type=pa.large_string()),
            "_side": pa.array(["r"] * n),
        })

    both = (ds.map_batches(tag_turns, batch_format="pyarrow")
            .union(refs.map_batches(tag_refs, batch_format="pyarrow")))

    def count_kernel(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "conv_id": pd.Series([], dtype="object"),
            "n_tokens": pd.Series([], dtype="int64")})
        turns = df[df["_side"] == "t"]
        rf = df[df["_side"] == "r"][["conv_id", "turn_idx"]]
        sub = turns.merge(rf, on=["conv_id", "turn_idx"], how="inner")
        if not len(sub):
            return empty
        piece_tokens = (sub["role"].astype(str) + ": "
                        + sub["text"].astype(str)) \
            .str.count(r"\S+").to_numpy(dtype=np.int64)
        out = pd.DataFrame({"conv_id": sub["conv_id"].to_numpy(),
                            "n_tokens": piece_tokens})
        agg = out.groupby("conv_id", sort=False,
                          as_index=False)["n_tokens"].sum()
        agg["n_tokens"] = agg["n_tokens"].astype("int64")
        return agg

    counts = coarse_partition_apply(both, "conv_id", count_kernel,
                                    partitions=partitions)

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("conv_id", kind="mergesort") \
            .reset_index(drop=True)
        n = g["n_tokens"].to_numpy()
        bins = np.zeros(len(g), dtype=np.int64)
        b, cum = 0, 0
        for i, ni in enumerate(n):
            if i > 0 and cum + ni > budget:
                b += 1
                cum = 0
            cum += ni
            bins[i] = b
        g["bin_idx"] = bins
        return g[["conv_id", "n_tokens", "shard", "bin_idx"]]

    def add_shard(df: pd.DataFrame) -> pd.DataFrame:
        from .dedup import _h64
        df = df.copy()
        # md5-derived shard — the construction DuckDB replays
        # (_h64_sql), so the sharded packing stays oracle-exact
        df["shard"] = np.fromiter(
            (_h64(str(c)) % shards for c in df["conv_id"]),
            dtype=np.int64, count=len(df))
        return df

    from ..shuffle import coarse_group_apply
    packed = coarse_group_apply(
        counts.map_batches(add_shard, batch_format="pandas"),
        "shard", pack, partitions=min(shards, 16))
    return packed
