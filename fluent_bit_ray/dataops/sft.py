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

from ..shuffle import coarse_partition_apply


def _sorted_conv(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(["conv_id", "turn_idx"], kind="mergesort")


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
                     partitions: int = 64):
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
    """
    k = int(context_turns)

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


def collapse_repeats(ds, partitions: int = 64):
    """Dataset[conv_id, turn_idx, role, text, repeats] — consecutive
    turns with identical (role, text) within a conversation collapse
    to their FIRST row plus the run length ("last message repeated N
    times")."""

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
                       partitions: int = 64):
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
    """
    import ray

    from .boilerplate import _h64_col

    want_roles = tuple(require_roles)

    def gate_mask(df: pd.DataFrame) -> np.ndarray:
        codes, uniques = pd.factorize(df["conv_id"], sort=False)
        n_turns = np.bincount(codes, minlength=len(uniques))
        ok = n_turns >= int(min_turns)
        for r in want_roles:
            ok &= np.bincount(codes,
                              weights=(df["role"].to_numpy() == r),
                              minlength=len(uniques)) > 0
        return ok[codes]

    # FUSED into ONE full-text conv exchange + one tiny pair exchange
    # (the r3 docs-curated lesson, taken further in r4: the exchange
    # returns a refs-backed Dataset already partitioned by conv, so the
    # pairs scan AND the final pass are plain map_batches over those
    # blocks — re-consuming them costs no re-execution and no second
    # all-to-all. The old two-exchange shape measured a ~5 s
    # non-scaling phase cost PER text exchange at sf1.)
    # Exchange: gate inside, output the surviving rows (conv-complete
    # blocks).
    def gate_kernel(df: pd.DataFrame) -> pd.DataFrame:
        return df[gate_mask(df)]

    gated = coarse_partition_apply(ds, "conv_id", gate_kernel,
                                   partitions=partitions)

    # Distinct (h64(text), conv) pairs per block: each conv is whole
    # inside one block, so per-block distinct == per-conv distinct
    # (16 B rows leave the node, never text).
    def pairs_batch(df: pd.DataFrame) -> pd.DataFrame:
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

    # Final pass: map over the same conv-partitioned blocks — drop
    # boilerplate rows, collapse runs, render — one kernel, no
    # re-shuffle (rows are already gated).
    def final_kernel(df: pd.DataFrame) -> pd.DataFrame:
        b = ray.get(bad_ref)
        if len(b) and len(df):
            h = _h64_col(df["text"])
            pos = np.searchsorted(b, h)
            pos[pos == len(b)] = 0
            df = df[b[pos] != h]
        df = _sorted_conv(df)
        n = len(df)
        if not n:
            return pd.DataFrame({"conv_id": pd.Series([], dtype="object"),
                                 "rendered": pd.Series([], dtype="object"),
                                 "n_turns": pd.Series([], dtype="int64")})
        conv = df["conv_id"].to_numpy(dtype=object)
        role = df["role"].to_numpy(dtype=object)
        text = df["text"].to_numpy(dtype=object)
        keep = np.ones(n, dtype=bool)  # drop non-first rows of runs
        keep[1:] = ((conv[1:] != conv[:-1]) | (role[1:] != role[:-1])
                    | (text[1:] != text[:-1]))
        conv, role, text = conv[keep], role[keep], text[keep]
        pieces = np.array([f"{r}: {t}" for r, t in zip(role, text)],
                          dtype=object)
        starts = np.flatnonzero(np.r_[True, conv[1:] != conv[:-1]])
        ends = np.r_[starts[1:], len(conv)]
        return pd.DataFrame({
            "conv_id": conv[starts],
            "rendered": ["\n".join(pieces[s:e])
                         for s, e in zip(starts, ends)],
            "n_turns": (ends - starts).astype("int64")})

    return gated.map_batches(final_kernel, batch_format="pandas",
                             batch_size=None)
