"""HyperLogLog + count-min sketches (dataops/sketch.py)."""

import numpy as np
import pandas as pd
import ray.data as rd

from fluent_bit_ray.dataops.sketch import (_registers_of, cms_estimate,
                                           cms_registers, hll_estimate,
                                           hll_registers)


def test_registers_match_reference_bit_math():
    from fluent_bit_ray.dataops.dedup import _h64
    vals = pd.Series(["a", "b", "c", "a", "12345"])
    codes, reg, rho = _registers_of(vals, p=12)
    for i, v in enumerate(vals):
        h = _h64(str(v))
        assert reg[codes[i]] == h % 4096
        w = h >> 12
        expect = 53 - w.bit_length() if w else 53
        assert rho[codes[i]] == expect


def test_register_table_partition_independent():
    rng = np.random.default_rng(2)
    df = pd.DataFrame({"v": rng.integers(0, 5000, 20000)})
    one = hll_registers(rd.from_pandas(df), "v", p=10).to_pandas() \
        .sort_values("reg").reset_index(drop=True)
    many = hll_registers(rd.from_pandas(df).repartition(13), "v",
                         p=10).to_pandas() \
        .sort_values("reg").reset_index(drop=True)
    pd.testing.assert_frame_equal(one, many)


def test_estimate_accuracy_and_grouping():
    rng = np.random.default_rng(7)
    true_n = {"a": 4000, "b": 700, "c": 60}
    frames = []
    for g, n in true_n.items():
        vals = np.arange(n) + hash(g) % 10_000_000
        vals = np.repeat(vals, 3)  # duplicates must not matter
        frames.append(pd.DataFrame({"g": g, "v": vals}))
    df = pd.concat(frames, ignore_index=True).sample(frac=1,
                                                     random_state=1)
    regs = hll_registers(rd.from_pandas(df), "v", group_col="g",
                         p=12).to_pandas()
    est = hll_estimate(regs, p=12, group_col="g").set_index("g")
    for g, n in true_n.items():
        rel = abs(est.loc[g, "estimate"] - n) / n
        assert rel < 0.1, (g, n, est.loc[g, "estimate"])


# ------------------------------------------------- count-min sketch
def test_cms_registers_match_reference_bit_math():
    from fluent_bit_ray.dataops.dedup import _h64
    df = pd.DataFrame({"v": ["x", "y", "x", "z", "x", "y"]})
    regs = cms_registers(rd.from_pandas(df), "v",
                         depth=3, width=64).to_pandas()
    tbl = {(d, w): c for d, w, c in regs.itertuples(index=False)}
    true = df["v"].value_counts()
    for d in range(3):
        expect = {}
        for v, n in true.items():
            w = _h64(f"{d}:{v}") % 64
            expect[w] = expect.get(w, 0) + n
        got = {w: c for (dd, w), c in tbl.items() if dd == d}
        assert got == expect


def test_cms_partition_independent_and_total_preserved():
    rng = np.random.default_rng(5)
    df = pd.DataFrame({"v": rng.zipf(1.5, 30000) % 2000})
    one = cms_registers(rd.from_pandas(df), "v",
                        depth=4, width=256).to_pandas() \
        .sort_values(["d", "w"]).reset_index(drop=True)
    many = cms_registers(rd.from_pandas(df).repartition(11), "v",
                         depth=4, width=256).to_pandas() \
        .sort_values(["d", "w"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(one, many)
    # every depth row conserves the exact total count
    assert (one.groupby("d")["cnt"].sum() == len(df)).all()


def test_cms_estimate_overestimates_never_under():
    rng = np.random.default_rng(9)
    vals = rng.zipf(1.3, 50000) % 500
    df = pd.DataFrame({"v": vals})
    regs = cms_registers(rd.from_pandas(df), "v",
                         depth=4, width=1024).to_pandas()
    true = pd.Series(vals).astype(str).value_counts()
    est = cms_estimate(regs, true.index.tolist(),
                       depth=4, width=1024).set_index("value")
    for v, n in true.items():
        e = est.loc[v, "estimate"]
        assert e >= n, (v, n, e)
        # standard CMS error bound: overshoot ≤ 2N/width w.h.p.
        assert e - n <= 2 * len(df) / 1024 * 4, (v, n, e)
