"""SFT pair assembly + consecutive-repeat collapse (dataops/sft.py)."""

import numpy as np
import pandas as pd
import ray.data as rd

from fluent_bit_ray.dataops.sft import collapse_repeats, sft_examples


def _toy(n_convs=40, seed=11):
    rng = np.random.default_rng(seed)
    rows = []
    roles = ["user", "assistant", "tool"]
    for c in range(n_convs):
        n = int(rng.integers(1, 12))
        for i in range(n):
            r = roles[int(rng.integers(0, 3))]
            # force some consecutive repeats
            txt = f"t{int(rng.integers(0, 4))}"
            rows.append((f"conv-{c:03d}", np.int32(i), r, txt))
    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role",
                                     "text"])
    return df.sample(frac=1, random_state=seed).reset_index(drop=True)


def _ref_sft(df, k=4, sep="\n"):
    out = []
    for conv, g in df.sort_values(["conv_id", "turn_idx"]).groupby(
            "conv_id", sort=False):
        pieces = (g["role"] + ": " + g["text"]).tolist()
        for pos, (_, row) in enumerate(g.iterrows()):
            if row["role"] != "assistant":
                continue
            ctx = sep.join(pieces[max(0, pos - k):pos])
            out.append((conv, row["turn_idx"], ctx, row["text"]))
    return pd.DataFrame(out, columns=["conv_id", "turn_idx", "context",
                                      "target"])


def test_sft_examples_matches_row_reference_across_partitions():
    df = _toy()
    got = sft_examples(rd.from_pandas(df).repartition(7),
                       context_turns=4, partitions=5).to_pandas() \
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    ref = _ref_sft(df).sort_values(["conv_id", "turn_idx"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"turn_idx": "int64"}),
        ref.astype({"turn_idx": "int64"}))


def test_sft_refs_render_matches_materialized():
    """The reference-emitting variant (constant-size rows, no context
    text in the exchange) + consumer-side render must reproduce
    sft_examples exactly — the refs are lossless."""
    from fluent_bit_ray.dataops.sft import (sft_example_refs,
                                            sft_render_from_refs)
    df = _toy()
    ds = rd.from_pandas(df).repartition(7)
    refs = sft_example_refs(ds, context_turns=4, partitions=5)
    # refs are constant-size: no text column anywhere in the schema
    assert set(refs.schema().names) == {"conv_id", "turn_idx",
                                        "ctx_start", "ctx_len"}
    rendered = sft_render_from_refs(
        rd.from_pandas(df).repartition(7), refs, partitions=5) \
        .to_pandas().sort_values(["conv_id", "turn_idx"]) \
        .reset_index(drop=True)
    ref = _ref_sft(df).sort_values(["conv_id", "turn_idx"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(
        rendered.astype({"turn_idx": "int64"}),
        ref.astype({"turn_idx": "int64"}))
    # ctx_len semantics: min(k, position-in-conversation)
    r = refs.to_pandas()
    first = r[r["ctx_len"] == 0]
    assert first["ctx_start"].isna().all()
    assert (r.loc[r["ctx_len"] > 0, "ctx_start"]
            < r.loc[r["ctx_len"] > 0, "turn_idx"]).all()


def test_sft_first_turn_has_empty_context_and_no_cross_conv_leak():
    df = pd.DataFrame({
        "conv_id": ["a", "a", "b"],
        "turn_idx": np.array([0, 1, 0], dtype=np.int32),
        "role": ["assistant", "user", "assistant"],
        "text": ["x", "y", "z"],
    })
    got = sft_examples(rd.from_pandas(df), context_turns=4).to_pandas() \
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert got["context"].tolist() == ["", ""]  # b must not see a's turns
    assert got["target"].tolist() == ["x", "z"]


def _ref_collapse(df):
    out = []
    for conv, g in df.sort_values(["conv_id", "turn_idx"]).groupby(
            "conv_id", sort=False):
        run = None
        for _, row in g.iterrows():
            kt = (row["role"], row["text"])
            if run is not None and kt == run[2]:
                run[1] += 1
            else:
                if run is not None:
                    out.append(run[0] + (run[1],))
                run = [(conv, row["turn_idx"], row["role"], row["text"]),
                       1, kt]
        if run is not None:
            out.append(run[0] + (run[1],))
    return pd.DataFrame(out, columns=["conv_id", "turn_idx", "role",
                                      "text", "repeats"])


def test_collapse_repeats_matches_row_reference():
    df = _toy(seed=3)
    got = collapse_repeats(rd.from_pandas(df).repartition(6),
                           partitions=4).to_pandas() \
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    ref = _ref_collapse(df).sort_values(["conv_id", "turn_idx"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"turn_idx": "int64", "repeats": "int64"}),
        ref.astype({"turn_idx": "int64", "repeats": "int64"}))
    # counts conserve rows
    assert got["repeats"].sum() == len(df)


def test_tool_transitions_matches_row_reference():
    from fluent_bit_ray.dataops.transitions import tool_transitions

    rng = np.random.default_rng(21)
    rows = []
    tools = ["", "", "bash", "python", "search"]
    for c in range(30):
        for i in range(int(rng.integers(1, 15))):
            rows.append((f"c{c:02d}", np.int32(i), "tool",
                         tools[int(rng.integers(0, 5))]))
    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role",
                                     "tool"]) \
        .sample(frac=1, random_state=2).reset_index(drop=True)

    got = tool_transitions(rd.from_pandas(df).repartition(5),
                           partitions=4).to_pandas() \
        .sort_values(["tool", "next_tool"]).reset_index(drop=True)

    ref = {}
    for _, g in df.sort_values(["conv_id", "turn_idx"]).groupby(
            "conv_id", sort=False):
        seq = [t for t in g["tool"] if t]
        for a, b in zip(seq, seq[1:]):
            ref[(a, b)] = ref.get((a, b), 0) + 1
    ref = pd.DataFrame(
        [(a, b, n) for (a, b), n in sorted(ref.items())],
        columns=["tool", "next_tool", "n"])
    pd.testing.assert_frame_equal(got.astype({"n": "int64"}), ref)


def test_conversation_gate_predicates():
    import pyarrow as pa
    import ray.data as rd
    from fluent_bit_ray.dataops import conversation_gate

    rows = [
        # c1: 3 turns, has assistant + tool
        ("c1", 0, "user"), ("c1", 1, "assistant"), ("c1", 2, "tool"),
        # c2: 3 turns, no tool
        ("c2", 0, "user"), ("c2", 1, "assistant"), ("c2", 2, "user"),
        # c3: 1 turn only
        ("c3", 0, "assistant"),
        # c4: 5 turns, assistant only
        *[("c4", i, "assistant") for i in range(5)],
    ]
    ds = rd.from_arrow(pa.table({
        "conv_id": pa.array([r[0] for r in rows]),
        "turn_idx": pa.array([r[1] for r in rows], type=pa.int64()),
        "role": pa.array([r[2] for r in rows])}))

    got = conversation_gate(ds, min_turns=3,
                            require_roles=("assistant", "tool")).to_pandas()
    assert sorted(got["conv_id"].unique()) == ["c1"]
    assert len(got) == 3  # all of c1's rows survive

    got2 = conversation_gate(ds, min_turns=2).to_pandas()
    assert sorted(got2["conv_id"].unique()) == ["c1", "c2", "c4"]

    got3 = conversation_gate(ds, min_turns=1, max_turns=3).to_pandas()
    assert sorted(got3["conv_id"].unique()) == ["c1", "c2", "c3"]


def test_render_conversations():
    import pyarrow as pa
    import ray.data as rd
    from fluent_bit_ray.dataops import render_conversations

    rows = [("b", 1, "assistant", "y"), ("a", 0, "user", "hi"),
            ("a", 1, "assistant", "yo"), ("b", 0, "user", "x")]
    ds = rd.from_arrow(pa.table({
        "conv_id": pa.array([r[0] for r in rows]),
        "turn_idx": pa.array([r[1] for r in rows], type=pa.int64()),
        "role": pa.array([r[2] for r in rows]),
        "text": pa.array([r[3] for r in rows])}))
    out = render_conversations(ds).to_pandas().sort_values("conv_id")
    assert out["rendered"].tolist() == ["user: hi\nassistant: yo",
                                        "user: x\nassistant: y"]
    assert out["n_turns"].tolist() == [2, 2]
    # layout independence
    out2 = render_conversations(ds.repartition(3)).to_pandas() \
        .sort_values("conv_id")
    assert out["rendered"].tolist() == out2["rendered"].tolist()


def test_curate_transcripts_composition():
    import pyarrow as pa
    import ray.data as rd
    from fluent_bit_ray.dataops.sft import curate_transcripts

    rows = []
    # conv A: 4 turns incl. assistant+user, has a repeated run
    rows += [("A", 0, "user", "hello"), ("A", 1, "assistant", "hi"),
             ("A", 2, "assistant", "hi"), ("A", 3, "user", "bye")]
    # conv B: too short (2 turns) -> gated out
    rows += [("B", 0, "user", "x"), ("B", 1, "assistant", "y")]
    # convs C..F: 3 turns each with common boilerplate "promo"
    for c in "CDEF":
        rows += [(c, 0, "user", "promo"), (c, 1, "assistant", f"ans{c}"),
                 (c, 2, "user", f"q{c}")]
    ds = rd.from_arrow(pa.table({
        "conv_id": pa.array([r[0] for r in rows]),
        "turn_idx": pa.array([r[1] for r in rows], type=pa.int64()),
        "role": pa.array([r[2] for r in rows]),
        "text": pa.array([r[3] for r in rows])}))

    out = curate_transcripts(ds, min_turns=3,
                             require_roles=("assistant", "user"),
                             boilerplate_min_convs=4).to_pandas() \
        .sort_values("conv_id").reset_index(drop=True)
    # B gated out; "promo" (4 distinct convs) removed everywhere;
    # A's assistant run collapsed to one line
    a = out[out["conv_id"] == "A"]["rendered"].iloc[0]
    assert a == "user: hello\nassistant: hi\nuser: bye"
    c = out[out["conv_id"] == "C"]["rendered"].iloc[0]
    assert c == "assistant: ansC\nuser: qC"  # promo line gone
    assert "B" not in set(out["conv_id"])
    assert out[out["conv_id"] == "A"]["n_turns"].iloc[0] == 3


def test_sft_int_conv_id_and_null_text():
    import pyarrow as pa
    import ray.data as rd
    from fluent_bit_ray.dataops import sft_examples

    ds = rd.from_arrow(pa.table({
        "conv_id": pa.array([1, 1, 2, 2], type=pa.int64()),  # INT ids
        "turn_idx": pa.array([0, 1, 0, 1], type=pa.int64()),
        "role": pa.array(["user", "assistant", "user", "assistant"]),
        "text": pa.array(["hi", "yo", None, "ans"])}))      # null text
    out = sft_examples(ds, context_turns=2).to_pandas() \
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert out["conv_id"].tolist() == [1, 2]                 # dtype kept
    assert out["context"].tolist() == ["user: hi", "user: "]  # null → ""
    assert out["target"].tolist() == ["yo", "ans"]


def test_collapse_repeats_chunked_matches_whole_key():
    """Chunk-split collapse (boundary-record merge) must equal the
    whole-key kernel — repeat-heavy data so runs span chunk
    boundaries, including whole-chunk runs (covers_all chains) and a
    run covering all of chunk 0."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from fluent_bit_ray.dataops.sft import collapse_repeats

    rng = np.random.default_rng(23)
    rows = []
    for c in range(10):
        n = int(rng.integers(2, 60))
        t = 0
        while t < n:
            run = int(rng.integers(1, 14))      # runs often > chunk size
            role = ["user", "assistant"][int(rng.integers(0, 2))]
            txt = f"m{int(rng.integers(0, 3))}" if rng.random() > 0.1 else None
            for _ in range(min(run, n - t)):
                rows.append((f"c{c:02d}", t, role, txt))
                t += 1
    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text"]) \
        .sample(frac=1.0, random_state=7).reset_index(drop=True)
    ds = rd.from_pandas(df)

    base = collapse_repeats(ds).to_pandas()
    key = ["conv_id", "turn_idx"]
    b = base.sort_values(key).reset_index(drop=True).astype({"text": str})
    for C in (4, 8, 1000):
        got = collapse_repeats(ds, chunk_rows=C).to_pandas()
        g = got.sort_values(key).reset_index(drop=True).astype({"text": str})
        pd.testing.assert_frame_equal(
            g.astype({"turn_idx": "int64", "repeats": "int64"}),
            b[g.columns].astype({"turn_idx": "int64", "repeats": "int64"}))


def test_curate_chunked_matches_whole_key():
    """The chunk-split curation (pre-gate broadcast + salted identity
    exchange + per-chunk render + piece merge) must equal the
    whole-key path, with chunks small enough that hot convs split and
    boilerplate-dropped rows change adjacency across boundaries."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from fluent_bit_ray.dataops.sft import curate_transcripts

    rng = np.random.default_rng(31)
    rows = []
    for c in range(16):
        n = int(rng.integers(1, 50))
        for t in range(n):
            r = ["user", "assistant", "tool"][int(rng.integers(0, 3))]
            # ~20% shared boilerplate texts (dropped when seen in ≥5
            # convs), the rest conv-local with repeat runs
            txt = (f"boiler{int(rng.integers(0, 3))}"
                   if rng.random() < 0.2
                   else f"m{c}_{int(rng.integers(0, 6))}")
            rows.append((f"c{c:02d}", t, r, txt))
    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text"]) \
        .sample(frac=1.0, random_state=9).reset_index(drop=True)
    ds = rd.from_pandas(df)

    base = curate_transcripts(ds, min_turns=4, chunk_rows=None) \
        .to_pandas().sort_values("conv_id").reset_index(drop=True)
    for C in (4, 8, 1000):
        got = curate_transcripts(ds, min_turns=4, chunk_rows=C) \
            .to_pandas().sort_values("conv_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got.astype({"n_turns": "int64"}),
            base[got.columns].astype({"n_turns": "int64"}))


def test_collapse_repeat_refs_lossless():
    """collapse_repeat_refs (hash-only exchange) + render must equal
    collapse_repeats row-for-row, whole-key AND chunk-split, on
    repeat-heavy data with null texts."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from fluent_bit_ray.dataops.sft import (collapse_render_from_refs,
                                            collapse_repeat_refs,
                                            collapse_repeats)

    rng = np.random.default_rng(41)
    rows = []
    for c in range(12):
        n = int(rng.integers(2, 50))
        t = 0
        while t < n:
            run = int(rng.integers(1, 10))
            role = ["user", "assistant"][int(rng.integers(0, 2))]
            txt = (f"m{int(rng.integers(0, 3))}"
                   if rng.random() > 0.1 else None)
            for _ in range(min(run, n - t)):
                rows.append((f"c{c:02d}", t, role, txt))
                t += 1
    df = pd.DataFrame(rows,
                      columns=["conv_id", "turn_idx", "role", "text"]) \
        .sample(frac=1.0, random_state=3).reset_index(drop=True)
    ds = rd.from_pandas(df)

    key = ["conv_id", "turn_idx"]
    cast = {"turn_idx": "int64", "repeats": "int64", "text": str}
    base = collapse_repeats(ds).to_pandas() \
        .sort_values(key).reset_index(drop=True).astype(cast)
    for C in (None, 8):
        refs = collapse_repeat_refs(ds, chunk_rows=C)
        # refs alone: kept rows + run lengths, no text column
        rdf = refs.to_pandas().sort_values(key).reset_index(drop=True)
        assert list(rdf.columns) == ["conv_id", "turn_idx", "role",
                                     "repeats"]
        pd.testing.assert_frame_equal(
            rdf.astype({"turn_idx": "int64", "repeats": "int64"}),
            base[rdf.columns])
        # rendered: text re-attached at the consumer
        got = collapse_render_from_refs(ds, refs).to_pandas() \
            .sort_values(key).reset_index(drop=True).astype(cast)
        pd.testing.assert_frame_equal(got[base.columns.tolist()], base)


def test_curate_refs_lossless():
    """curate_transcript_refs (text never transits an exchange) +
    render must equal curate_transcripts, whole-key AND chunk-split,
    incl. boilerplate-drop adjacency effects."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from fluent_bit_ray.dataops.sft import (curate_render_from_refs,
                                            curate_transcript_refs,
                                            curate_transcripts)

    rng = np.random.default_rng(53)
    rows = []
    for c in range(16):
        n = int(rng.integers(1, 40))
        for t in range(n):
            r = ["user", "assistant", "tool"][int(rng.integers(0, 3))]
            txt = (f"boiler{int(rng.integers(0, 3))}"
                   if rng.random() < 0.2
                   else f"m{c}_{int(rng.integers(0, 6))}")
            rows.append((f"c{c:02d}", t, r, txt))
    df = pd.DataFrame(rows,
                      columns=["conv_id", "turn_idx", "role", "text"]) \
        .sample(frac=1.0, random_state=5).reset_index(drop=True)
    ds = rd.from_pandas(df)

    base = curate_transcripts(ds, min_turns=4).to_pandas() \
        .sort_values("conv_id").reset_index(drop=True) \
        .astype({"n_turns": "int64"})
    for C in (None, 8):
        refs = curate_transcript_refs(ds, min_turns=4, chunk_rows=C)
        got = curate_render_from_refs(ds, refs).to_pandas() \
            .sort_values("conv_id").reset_index(drop=True) \
            .astype({"n_turns": "int64"})
        pd.testing.assert_frame_equal(got[base.columns.tolist()], base)


def test_curate_pack_from_refs():
    """Fused refs consumer: per-conv token counts from kept pieces
    (render-free) + sharded greedy packing must equal counting tokens
    of the materialized curate_transcripts render."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from fluent_bit_ray.dataops.dedup import _h64
    from fluent_bit_ray.dataops.sft import (curate_pack_from_refs,
                                            curate_transcript_refs,
                                            curate_transcripts)

    rng = np.random.default_rng(61)
    rows = []
    for c in range(14):
        n = int(rng.integers(1, 30))
        for t in range(n):
            r = ["user", "assistant"][int(rng.integers(0, 2))]
            txt = (f"boiler{int(rng.integers(0, 2))}"
                   if rng.random() < 0.2
                   else f"w{c} " * int(rng.integers(1, 5)))
            rows.append((f"c{c:02d}", t, r, txt.strip()))
    df = pd.DataFrame(rows,
                      columns=["conv_id", "turn_idx", "role", "text"])
    ds = rd.from_pandas(df)

    refs = curate_transcript_refs(ds, min_turns=4,
                                  boilerplate_min_convs=4)
    got = curate_pack_from_refs(ds, refs, budget=30, shards=4) \
        .to_pandas().sort_values("conv_id").reset_index(drop=True)

    rend = curate_transcripts(ds, min_turns=4,
                              boilerplate_min_convs=4).to_pandas()
    rend["n_tokens"] = rend["rendered"].str.count(r"\S+")
    rend["shard"] = [int(_h64(c) % 4) for c in rend["conv_id"]]
    rend = rend.sort_values("conv_id").reset_index(drop=True)
    # token counts match the materialized render exactly
    pd.testing.assert_series_equal(
        got.set_index("conv_id")["n_tokens"].astype("int64"),
        rend.set_index("conv_id")["n_tokens"].astype("int64"))
    pd.testing.assert_series_equal(
        got.set_index("conv_id")["shard"].astype("int64"),
        rend.set_index("conv_id")["shard"].astype("int64"))
    # packing recurrence per shard: replay in plain python
    for sh, g in got.groupby("shard"):
        g = g.sort_values("conv_id")
        b, cum, want = 0, 0, []
        for i, ni in enumerate(g["n_tokens"]):
            if i > 0 and cum + ni > 30:
                b += 1
                cum = 0
            cum += ni
            want.append(b)
        assert g["bin_idx"].tolist() == want


def test_curate_refs_chunked_hypothesis():
    """Property: the missing-chunk-tolerant refs protocol equals the
    whole-key curation for ARBITRARY corpora — runs spanning chunk
    boundaries, whole chunks emptied by the boilerplate drop, gates
    removing hot convs — across random seeds and chunk sizes."""
    from hypothesis import given, settings
    from hypothesis import strategies as st
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from fluent_bit_ray.dataops.sft import (curate_render_from_refs,
                                            curate_transcript_refs,
                                            curate_transcripts)

    @settings(max_examples=6, deadline=None)
    @given(seed=st.integers(0, 10_000), chunk=st.sampled_from([3, 5, 16]))
    def prop(seed, chunk):
        rng = np.random.default_rng(seed)
        rows = []
        for c in range(int(rng.integers(6, 12))):
            n = int(rng.integers(1, 25))
            t = 0
            while t < n:
                run = int(rng.integers(1, 7))
                r = ["user", "assistant", "tool"][int(rng.integers(0, 3))]
                txt = (f"boiler{int(rng.integers(0, 2))}"
                       if rng.random() < 0.3
                       else f"m{c}_{int(rng.integers(0, 4))}")
                for _ in range(min(run, n - t)):
                    rows.append((f"c{c:02d}", t, r, txt))
                    t += 1
        df = pd.DataFrame(rows, columns=["conv_id", "turn_idx",
                                         "role", "text"])
        ds = rd.from_pandas(df)
        base = curate_transcripts(ds, min_turns=3,
                                  boilerplate_min_convs=3) \
            .to_pandas().sort_values("conv_id").reset_index(drop=True)
        refs = curate_transcript_refs(ds, min_turns=3,
                                      boilerplate_min_convs=3,
                                      chunk_rows=chunk)
        got = curate_render_from_refs(ds, refs).to_pandas() \
            .sort_values("conv_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got[base.columns.tolist()].astype({"n_turns": "int64"}),
            base.astype({"n_turns": "int64"}))

    prop()
