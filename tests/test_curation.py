"""Curation ops: decontamination, sampling/mixing, chunking,
repetition stats, sequence packing (fluent_bit_ray/dataops/curation.py).
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from fluent_bit_ray.dataops import (
    benchmark_ngram_hashes,
    chunk_docs,
    decontaminate,
    hash_sample,
    mix_by_source,
    pack_sequences,
    repetition_stats,
)
from fluent_bit_ray.dataops.dedup import _h64, _shingles


def docs_ds(texts, sources=None):
    t = {"doc_id": pa.array(range(len(texts)), type=pa.int64()),
         "text": pa.array(texts, type=pa.string())}
    if sources is not None:
        t["source"] = pa.array(sources, type=pa.string())
    return rd.from_arrow(pa.table(t))


# ------------------------------------------------------ decontaminate
def test_decontaminate_flags_overlap_and_counts_distinct_grams():
    bench = docs_ds(["one two three four five six seven"])
    corpus = docs_ds([
        "one two three four five six seven",        # identical: all grams hit
        "zzz one two three four five yyy xxx www",  # one shared 5-gram
        "totally different words with no overlap at all",
    ])
    bh = benchmark_ngram_hashes(bench, ngram=5)
    out = decontaminate(corpus, bh, ngram=5).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["contaminated"].tolist() == [True, True, False]
    # doc 0 has 3 distinct 5-grams, all contaminated
    assert out["n_hits"].tolist()[:2] == [3, 1]


def test_decontaminate_empty_benchmark_flags_nothing():
    corpus = docs_ds(["a b c d e f"])
    out = decontaminate(corpus, np.array([], dtype=np.uint64)).to_pandas()
    assert not out["contaminated"].any()


def test_benchmark_hashes_match_shingles():
    text = "alpha beta gamma delta epsilon zeta"
    bh = benchmark_ngram_hashes(docs_ds([text]), ngram=5)
    assert set(bh.tolist()) == _shingles(text, 5)


# --------------------------------------------------- sampling / mixing
def test_hash_sample_is_deterministic_and_rate_shaped():
    texts = [f"doc {i}" for i in range(1000)]
    a = hash_sample(docs_ds(texts), 30).to_pandas()["doc_id"]
    b = hash_sample(docs_ds(texts), 30).to_pandas()["doc_id"]
    assert sorted(a) == sorted(b)                       # deterministic
    assert 200 < len(a) < 400                           # ~30%
    # exact membership rule
    expect = [i for i in range(1000) if _h64(str(i)) % 100 < 30]
    assert sorted(a) == expect


def test_mix_by_source_rates_and_default():
    n = 600
    sources = ["keep_all", "half", "drop"] * (n // 3)
    ds = docs_ds([f"t {i}" for i in range(n)], sources)
    out = mix_by_source(ds, {"keep_all": 100, "half": 50},
                        default_pct=0).to_pandas()
    by = out.groupby("source").size()
    assert by.get("keep_all", 0) == n // 3              # 100% kept
    assert "drop" not in by.index                       # default 0
    assert 0 < by.get("half", 0) < n // 3


# ------------------------------------------------------------ chunking
def test_chunk_docs_windows_and_stride():
    words = [f"w{i}" for i in range(80)]
    out = chunk_docs(docs_ds([" ".join(words)]),
                     window=32, stride=24).to_pandas() \
        .sort_values("chunk_idx").reset_index(drop=True)
    # starts 0, 24, 48, 72 → 4 chunks; sizes 32,32,32,8
    assert out["chunk_idx"].tolist() == [0, 1, 2, 3]
    assert out["n_words_chunk"].tolist() == [32, 32, 32, 8]
    assert out["chunk_text"][0] == " ".join(words[:32])
    assert out["chunk_text"][3] == " ".join(words[72:])
    # overlap: chunk 1 starts at word 24
    assert out["chunk_text"][1].split()[0] == "w24"


def test_chunk_docs_short_and_empty():
    out = chunk_docs(docs_ds(["a b c", ""]), window=32,
                     stride=24).to_pandas()
    assert len(out) == 1                                # empty doc drops
    assert out["chunk_text"].iloc[0] == "a b c"
    assert out["n_words_chunk"].iloc[0] == 3


# ----------------------------------------------------- repetition stats
def test_repetition_stats_values():
    out = repetition_stats(docs_ds([
        "a b a b a b",        # 2 uniq / 6 words; top 2-gram "a b" ×3 of 5
        "x y z",              # all unique; every 2-gram once: top = 1/2
        "solo",               # 1 word: no 2-grams
    ])).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out["n_words"].tolist() == [6, 3, 1]
    assert out["dup_word_milli"].tolist() == [
        round((1 - 2 / 6) * 1000), 0, 0]
    assert out["top2_milli"].tolist() == [600, 500, 0]


def test_repetition_stats_batch_isolation():
    # same words in two docs must not cross-count 2-grams
    out = repetition_stats(docs_ds(["a b", "b a"])).to_pandas()
    assert out["top2_milli"].tolist() == [1000, 1000]


# ------------------------------------------------------------- packing
def test_pack_sequences_greedy_bins():
    texts = ["w " * 50, "w " * 50, "w " * 50, "w " * 200, "w " * 10]
    ds = docs_ds([t.strip() for t in texts], ["s"] * 5)
    out = pack_sequences(ds, budget=128).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # doc order: 50+50=100 fits; +50 → 150 > 128 ⇒ new bin;
    # 200 > 128 alone ⇒ new bin; 10 after over-budget ⇒ new bin
    assert out["bin_idx"].tolist() == [0, 0, 1, 2, 3]
    assert out["n_words"].tolist() == [50, 50, 50, 200, 10]


def test_pack_sequences_per_group_and_shards():
    texts = ["w " * 60] * 6
    ds = docs_ds([t.strip() for t in texts], ["a", "a", "a", "b", "b", "b"])
    out = pack_sequences(ds, budget=128).to_pandas()
    # per source: 60+60 fit, third spills → bins [0,0,1] in each group
    for _, g in out.groupby("source"):
        assert sorted(g.sort_values("doc_id")["bin_idx"]) == [0, 0, 1]
    sharded = pack_sequences(ds, budget=128, shards=4).to_pandas()
    assert "shard" in sharded.columns
    # every doc still packed exactly once
    assert sorted(sharded["doc_id"]) == list(range(6))


# ----------------------------------------------------------- quantiles
def test_column_quantiles_exact_rule():
    from fluent_bit_ray.dataops import column_quantiles
    # values 1..10, N=10: q=250 → rank ceil(2.5)=3 → value 3 (cum 3);
    # q=500 → rank 5 → value 5; q=990 → rank ceil(9.9)=10 → value 10
    t = pa.table({"v": pa.array(list(range(1, 11)), type=pa.int64())})
    out = column_quantiles(rd.from_arrow(t), "v", qs=(250, 500, 990))
    assert out["value"].tolist() == [3, 5, 10]
    assert out["n_le"].tolist() == [3, 5, 10]


def test_column_quantiles_grouped_and_ties():
    from fluent_bit_ray.dataops import column_quantiles
    t = pa.table({
        "g": pa.array(["a"] * 4 + ["b"] * 2, type=pa.string()),
        "v": pa.array([7, 7, 7, 9, 1, 2], type=pa.int64()),
    })
    out = column_quantiles(rd.from_arrow(t), "v", qs=(500, 1000),
                           group_col="g")
    a = out[out["g"] == "a"]
    # a: N=4; q=500 → rank 2 → value 7 (cum 3); q=1000 → rank 4 → 9
    assert a["value"].tolist() == [7, 9]
    assert a["n_le"].tolist() == [3, 4]
    b = out[out["g"] == "b"]
    assert b["value"].tolist() == [1, 2]


# ------------------------------------------------------ full pipeline
def test_curate_corpus_stage_semantics():
    from fluent_bit_ray.dataops import curate_corpus
    texts = [
        "alpha beta gamma delta epsilon zeta",     # 0: survives
        "alpha beta gamma delta epsilon zeta",     # 1: exact dup of 0 → dropped
        "one two three four five six seven",       # 2: survives
        "short",                                   # 3: < 5 words → dropped
        "rep rep rep rep rep rep rep rep",         # 4: dup_milli 875 → dropped
    ]
    ds = docs_ds(texts, ["s"] * 5)
    out = curate_corpus(
        ds, weights={"s": 100}, budget=10,
        bench_pred=lambda s: s < 0,  # empty benchmark → no contamination
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out["doc_id"].tolist() == [0, 2]
    # budget 10 < 6+7 ⇒ second doc opens a new bin
    assert out["bin_idx"].tolist() == [0, 1]


def test_curate_corpus_decontaminates_benchmark_overlap():
    from fluent_bit_ray.dataops import curate_corpus
    texts = ["w%d w%d w%d w%d w%d w%d" % (i, i+1, i+2, i+3, i+4, i+5)
             for i in range(8)]
    ds = docs_ds(texts, ["s"] * 8)
    # benchmark = doc 0; docs 0 and 1 share the 5-gram w1..w5 → both drop
    out = curate_corpus(ds, weights={"s": 100}, budget=100,
                        bench_pred=lambda s: s == 0) \
        .to_pandas().sort_values("doc_id")
    assert 0 not in set(out["doc_id"])
    assert 1 not in set(out["doc_id"])
    assert 2 in set(out["doc_id"])


# --------------------------------------------------------- invariants
def test_pack_sequences_budget_invariant():
    from fluent_bit_ray.dataops import pack_sequences
    rs = np.random.RandomState(11)
    texts = ["w " * int(n) for n in rs.randint(1, 60, 200)]
    ds = docs_ds([t.strip() for t in texts],
                 [f"s{i%3}" for i in range(200)])
    out = pack_sequences(ds, budget=100).to_pandas()
    # per (source, bin): total words ≤ budget unless the bin is a
    # single over-budget doc; bins numbered contiguously from 0
    for src, g in out.groupby("source"):
        sums = g.groupby("bin_idx")["n_words"].agg(["sum", "size"])
        for b, row in sums.iterrows():
            assert row["sum"] <= 100 or row["size"] == 1
        bins = sorted(g["bin_idx"].unique())
        assert bins == list(range(len(bins)))


def test_column_quantiles_matches_sorted_rank_definition():
    from fluent_bit_ray.dataops import column_quantiles
    rs = np.random.RandomState(5)
    vals = rs.randint(0, 50, 777)
    t = pa.table({"v": pa.array(vals, type=pa.int64())})
    qs = (100, 250, 500, 750, 999)
    out = column_quantiles(rd.from_arrow(t), "v", qs=qs)
    sv = np.sort(vals)
    for q, got in zip(qs, out["value"].tolist()):
        rank = -(-q * len(sv) // 1000)  # ceil
        assert got == sv[rank - 1]


def test_curate_corpus_exchange_mode_equals_broadcast():
    from fluent_bit_ray.dataops import curate_corpus
    rs = np.random.RandomState(7)
    words = ["w%d" % i for i in range(30)]
    texts = [" ".join(words[j] for j in rs.randint(0, 30, 12))
             for _ in range(120)]
    texts += texts[:20]  # exact dups
    srcs = [f"src{i % 4}" for i in range(len(texts))]
    ds = docs_ds(texts, srcs)
    weights = {f"src{i}": (100, 50, 30, 10)[i % 4] for i in range(4)}
    a = curate_corpus(ds, weights, budget=64).to_pandas() \
        .sort_values(["source", "doc_id"]).reset_index(drop=True)
    b = curate_corpus(ds, weights, budget=64, dedup_mode="exchange") \
        .to_pandas().sort_values(["source", "doc_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0


def test_grouped_topk_matches_window_rank():
    from fluent_bit_ray.dataops import grouped_topk
    rs = np.random.RandomState(9)
    df = pd.DataFrame({"g": [f"g{i%5}" for i in range(300)],
                       "v": rs.randint(0, 40, 300),
                       "k": np.arange(300)})
    got = grouped_topk(rd.from_pandas(df), "g", "v", k=4,
                       tie_col="k").to_pandas()
    exp = (df.sort_values(["g", "v", "k"], ascending=[True, False, True],
                          kind="mergesort")
           .groupby("g", sort=False).head(4))
    got = got.sort_values(["g", "k"]).reset_index(drop=True)
    exp = exp.sort_values(["g", "k"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["g", "v", "k"]], exp[["g", "v", "k"]])


def test_grouped_topk_ascending():
    from fluent_bit_ray.dataops import grouped_topk
    df = pd.DataFrame({"g": ["a"] * 5 + ["b"] * 5,
                       "v": [5, 1, 3, 2, 4, 9, 7, 8, 6, 5],
                       "k": np.arange(10)})
    got = grouped_topk(rd.from_pandas(df), "g", "v", k=2, ascending=True,
                       tie_col="k").to_pandas()
    assert sorted(got.loc[got["g"] == "a", "v"].tolist()) == [1, 2]
    assert sorted(got.loc[got["g"] == "b", "v"].tolist()) == [5, 6]


def test_stratified_sample_exact_n_and_partition_independent():
    from fluent_bit_ray.dataops import stratified_sample
    df = pd.DataFrame({"g": [f"g{i%4}" for i in range(200)],
                       "k": np.arange(200)})
    one = stratified_sample(rd.from_pandas(df), "g", "k", n=7) \
        .to_pandas().sort_values(["g", "k"]).reset_index(drop=True)
    many = stratified_sample(rd.from_pandas(df).repartition(11), "g",
                             "k", n=7) \
        .to_pandas().sort_values(["g", "k"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(one, many)
    assert (one.groupby("g").size() == 7).all()


def test_bloom_prefilter_exactness_properties():
    """The Bloom bitmap may only say 'maybe' for members (no false
    negatives); a forced false positive (same low bits, different
    hash) must be rejected by the exact fall-through."""
    from fluent_bit_ray.dataops.curation import _BLOOM_BITS, _bloom_bitmap

    rng = np.random.default_rng(0)
    bh = np.unique(rng.integers(0, 2**63, 50_000, dtype=np.uint64))
    bmp = _bloom_bitmap(bh)
    mask = np.uint64((1 << _BLOOM_BITS) - 1)

    def maybe(h):
        pos = h & mask
        return ((bmp[(pos >> np.uint64(3)).astype(np.int64)]
                 >> (pos & np.uint64(7)).astype(np.uint8)) & 1).astype(bool)

    assert maybe(bh).all()  # zero false negatives

    # forced FP: flip a bit ABOVE the bloom window; exact search rejects
    probe = (bh[:100] ^ np.uint64(1 << 40)).astype(np.uint64)
    assert maybe(probe).all()
    idx = np.searchsorted(bh, probe)
    idx[idx == len(bh)] = 0
    hits = bh[idx] == probe
    assert not hits.any()


def test_epoch_shuffle_deterministic_across_parallelism(ray_session):
    """Same seed → identical order regardless of partitioning;
    different seed → a different (still deterministic) order."""
    import ray.data as rd

    from fluent_bit_ray.dataops import epoch_shuffle

    df = pd.DataFrame({"doc_id": np.arange(200, dtype="int64")})
    one = rd.from_pandas(df).repartition(1)
    many = rd.from_pandas(df).repartition(13)
    o1 = epoch_shuffle(one, seed=7).to_pandas()["doc_id"].tolist()
    o2 = epoch_shuffle(many, seed=7).to_pandas()["doc_id"].tolist()
    o3 = epoch_shuffle(many, seed=8).to_pandas()["doc_id"].tolist()
    assert o1 == o2                      # parallelism-independent
    assert o1 != o3                      # seeds are independent epochs
    assert sorted(o3) == list(range(200))  # a permutation, nothing lost


def test_bpe_train_matches_duckdb_replay(ray_session):
    """Engine vs generated-SQL oracle on adversarial text (same-symbol
    runs, case folding, ties)."""
    import duckdb
    import ray.data as rd

    from fluent_bit_ray.dataops import bpe_train, bpe_train_sql

    docs = pd.DataFrame({"doc_id": range(4), "text": [
        "banana bandana banana", "aaaaaaa aaa aa",
        "Tie tie TIE toe toe toe", "x y x y x y zzz"]})
    got = bpe_train(rd.from_pandas(docs).repartition(3),
                    num_merges=8, max_words=100)
    exp = duckdb.sql(bpe_train_sql(8, 100, source="docs")).df()
    assert got["pair"].tolist() == exp["pair"].tolist()
    assert got["pair_count"].tolist() == exp["pair_count"].tolist()


def test_bpe_merge_sweeps_semantics():
    """The documented replace-sweep application: boundary-sharing
    adjacencies converge within _SWEEPS passes."""
    from fluent_bit_ray.dataops.bpe import _merge, _pad

    s = _pad("aaaaa")                    # ' a a a a a </w> '
    out = _merge(s, " a a ", " aa ").split()
    assert out == ["aa", "a", "aa", "</w>"]  # sweep semantics, stable
    # a second _merge call is a no-op (fixpoint reached)
    assert _merge(" " + " ".join(out) + " ", " a a ", " aa ").split() \
        == out


def test_bpe_max_words_cap_is_deterministic(ray_session):
    """Top-N cap ties break on (count desc, word asc) — the same rows
    the SQL LIMIT keeps."""
    import ray.data as rd

    from fluent_bit_ray.dataops import bpe_train

    docs = pd.DataFrame({"text": ["pear plum pear plum kiwi fig"]})
    a = bpe_train(rd.from_pandas(docs), num_merges=3, max_words=2)
    b = bpe_train(rd.from_pandas(docs).repartition(4),
                  num_merges=3, max_words=2)
    assert a.equals(b)


def test_bpe_tokenize_counts_matches_sql_and_caches(ray_session):
    """Encode side: per-doc trained-BPE token counts equal the SQL
    replay (incl. an empty doc), and the actor cache tokenizes each
    distinct word once."""
    import duckdb
    import ray.data as rd

    from fluent_bit_ray.dataops import bpe_tokenize_counts, bpe_train
    from fluent_bit_ray.dataops.bpe import _BpeTokenizer, bpe_tokenize_sql

    docs = pd.DataFrame({"doc_id": range(4), "text": [
        "low lower lowest low low", "aaaaa aaa aa a",
        "", "Banana BANANA bandana"]})
    ds = rd.from_pandas(docs)
    m = bpe_train(ds, num_merges=6, max_words=100)
    got = (bpe_tokenize_counts(ds.repartition(2), m["pair"].tolist(),
                               concurrency=2)
           .to_pandas()[["doc_id", "n_bpe_tokens"]]
           .sort_values("doc_id").reset_index(drop=True))
    exp = duckdb.sql(bpe_tokenize_sql(6, 100, source="docs")).df()
    assert got["n_bpe_tokens"].astype(int).tolist() == \
        exp["n_bpe_tokens"].astype(int).tolist()

    tok = _BpeTokenizer(m["pair"].tolist(), "text", True)
    tok(docs)
    assert "low" in tok.cache and tok.cache["banana"] >= 1


def test_bpe_property_random_corpora_match_sql(ray_session):
    """Hypothesis: train + encode equal the DuckDB replay on random
    corpora over a tiny alphabet (forces ties, same-symbol runs, and
    merged-symbol collisions)."""
    import duckdb
    import ray.data as rd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from fluent_bit_ray.dataops import bpe_tokenize_counts, bpe_train
    from fluent_bit_ray.dataops.bpe import bpe_tokenize_sql, bpe_train_sql

    word = st.text(alphabet="ab", min_size=1, max_size=6)
    doc = st.lists(word, min_size=0, max_size=8).map(" ".join)

    @settings(max_examples=10, deadline=None)
    @given(st.lists(doc, min_size=1, max_size=6))
    def run(texts):
        docs = pd.DataFrame({"doc_id": range(len(texts)),
                             "text": texts})
        ds = rd.from_pandas(docs)
        m = bpe_train(ds, num_merges=5, max_words=50)
        exp_m = duckdb.sql(bpe_train_sql(5, 50, source="docs")).df()
        assert m["pair"].tolist() == exp_m["pair"].tolist()
        assert m["pair_count"].tolist() == exp_m["pair_count"].tolist()
        got = (bpe_tokenize_counts(ds, m["pair"].tolist(),
                                   concurrency=2)
               .to_pandas()[["doc_id", "n_bpe_tokens"]]
               .sort_values("doc_id"))
        exp = duckdb.sql(bpe_tokenize_sql(5, 50, source="docs")).df()
        assert got["n_bpe_tokens"].astype(int).tolist() == \
            exp["n_bpe_tokens"].astype(int).tolist()

    run()


def test_bpe_null_text_counts_zero(ray_session):
    """NULL text contributes no words on BOTH sides (SQL unnest of
    regexp_extract_all(NULL) emits nothing)."""
    import duckdb
    import ray.data as rd

    from fluent_bit_ray.dataops import bpe_tokenize_counts, bpe_train
    from fluent_bit_ray.dataops.bpe import bpe_tokenize_sql

    docs = pd.DataFrame({"doc_id": [0, 1],
                         "text": pd.array([None, "nan nan ab"],
                                          dtype="string")})
    ds = rd.from_pandas(docs)
    m = bpe_train(ds, num_merges=3, max_words=50)
    got = (bpe_tokenize_counts(ds, m["pair"].tolist(), concurrency=2)
           .to_pandas().sort_values("doc_id"))
    exp = duckdb.sql(bpe_tokenize_sql(3, 50, source="docs")).df()
    assert got["n_bpe_tokens"].astype(int).tolist() == \
        exp["n_bpe_tokens"].astype(int).tolist()
    assert got["n_bpe_tokens"].iloc[0] == 0


def test_pack_sequences_precomputed_count_column(ray_session):
    """n_col packs on a precomputed count instead of word-counting the
    text, and keeps that column name in the output."""
    import pandas as pd
    import ray.data as rd

    from fluent_bit_ray.dataops import pack_sequences

    df = pd.DataFrame({"source": ["a"] * 4 + ["b"] * 2,
                       "doc_id": [0, 1, 2, 3, 4, 5],
                       "text": ["x"] * 6,     # would count 1 word each
                       "n_tok": [60, 60, 60, 200, 90, 20]})
    out = pack_sequences(rd.from_pandas(df), budget=128,
                         n_col="n_tok").to_pandas() \
        .sort_values(["source", "doc_id"]).reset_index(drop=True)
    assert list(out.columns) == ["source", "doc_id", "n_tok", "bin_idx"]
    # a: 60+60 fit (bin 0), 60 opens bin 1, 200 over-budget -> bin 2
    assert out[out["source"] == "a"]["bin_idx"].tolist() == [0, 0, 1, 2]
    # b: 90+20 fit one bin
    assert out[out["source"] == "b"]["bin_idx"].tolist() == [0, 0]

    # default path unchanged: counts text words
    out2 = pack_sequences(rd.from_pandas(df), budget=128).to_pandas()
    assert (out2["n_words"] == 1).all()
