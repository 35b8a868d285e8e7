import glob
import json
import os
import shutil

import pyarrow.parquet as pq

from fluent_bit_ray.pipelines.flagship import build_flagship
from fluent_bit_ray.sources.transcripts import ensure_transcripts
from fluent_bit_ray.state import LineageRunner

SF = "/root/testdata/sf0.001"


def input_files():
    return sorted(glob.glob(ensure_transcripts(SF) + "/*.parquet"))


def fresh_runner(tmp_path, wave_files=2):
    out = str(tmp_path / "out")
    p = build_flagship(with_rewrite=False, with_enrich=False)
    return LineageRunner(p, out, wave_files=wave_files), out


def test_lineage_run_and_resume(tmp_path):
    runner, out = fresh_runner(tmp_path)
    files = input_files()
    s1 = runner.run(files)
    assert s1["waves_run"] == s1["waves_total"] > 0
    assert s1["waves_skipped"] == 0
    # sink counts match a direct pipeline run
    import ray.data as rd
    routed = build_flagship(with_rewrite=False, with_enrich=False).run(
        rd.read_parquet(files))
    expect = routed.sink_counts()
    assert s1["sink_counts"] == expect

    # written parquet row counts agree per sink
    for sink, n in expect.items():
        got = sum(pq.read_metadata(f).num_rows for f in
                  glob.glob(f"{out}/{sink}/wave=*/part-*.parquet"))
        assert got == n

    # resume: everything already complete → nothing reruns
    s2 = runner.run(files)
    assert s2["waves_run"] == 0
    assert s2["waves_skipped"] == s1["waves_total"]
    assert s2["sink_counts"] == expect

    # crash simulation: drop ONE wave's manifest → only that wave reruns
    manifests = sorted(glob.glob(f"{out}/_lineage/wave-*.json"))
    os.unlink(manifests[0])
    s3 = runner.run(files)
    assert s3["waves_run"] == 1
    assert s3["waves_skipped"] == s1["waves_total"] - 1
    assert s3["sink_counts"] == expect
    # idempotent rewrite: per-sink totals still exact after the rerun
    for sink, n in expect.items():
        got = sum(pq.read_metadata(f).num_rows for f in
                  glob.glob(f"{out}/{sink}/wave=*/part-*.parquet"))
        assert got == n


def test_manifest_contents(tmp_path):
    runner, out = fresh_runner(tmp_path, wave_files=3)
    runner.run(input_files())
    m = json.load(open(sorted(glob.glob(f"{out}/_lineage/wave-*.json"))[0]))
    assert set(m) >= {"wave", "input_files", "rows_in", "sink_counts",
                      "wall_sec", "engine"}
    assert m["rows_in"] > 0 and m["wall_sec"] >= 0


def test_stage_metrics_in_manifest(tmp_path):
    runner, out = fresh_runner(tmp_path, wave_files=10)
    runner.run(input_files())
    m = json.load(open(sorted(glob.glob(f"{out}/_lineage/wave-*.json"))[0]))
    sm = m["stage_metrics"]
    assert "parser" in sm
    assert sm["parser"]["rows_in"] == m["rows_in"]
    assert sm["parser"]["rows_out"] == m["rows_in"]  # parser never drops


def test_partial_wave_outputs_purged_before_rerun(tmp_path):
    """A crashed wave may leave partial part-files with batch boundaries
    that a rerun won't reproduce; the runner must purge them so on-disk
    row totals stay exact."""
    runner, out = fresh_runner(tmp_path, wave_files=3)
    files = input_files()
    s1 = runner.run(files)
    expect = s1["sink_counts"]
    # simulate a crash: drop a manifest AND plant a bogus orphan part
    manifests = sorted(glob.glob(f"{out}/_lineage/wave-*.json"))
    m = json.load(open(manifests[0]))
    os.unlink(manifests[0])
    orphan = f"{out}/all/wave={m['wave']}/part-deadbeefdeadbeef.parquet"
    import pyarrow as pa
    import pyarrow.parquet as pqw
    pqw.write_table(pa.table({"x": pa.array([1, 2, 3])}), orphan)
    runner.run(files)
    for sink, n in expect.items():
        got = sum(pq.read_metadata(f).num_rows for f in
                  glob.glob(f"{out}/{sink}/wave=*/part-*.parquet"))
        assert got == n, sink


def test_wave_write_msgpack_sink(tmp_path):
    """A sink configured with the msgpack format writes resumable raw
    [ts, map] stream parts under its wave directory."""
    import pytest
    msgpack = pytest.importorskip("msgpack")
    import pyarrow as pa
    import ray.data as rd

    from fluent_bit_ray.pipelines.pipeline import Pipeline
    from fluent_bit_ray.state.lineage import write_routed_sinks

    t = pa.table({
        "conv_id": ["c1", "c2"], "turn_idx": pa.array([0, 1], pa.int32()),
        "role": ["user", "tool"], "text": ["a", "b"], "tool": ["", "x"],
        "ts": pa.array([1448403340_000000000, 1448403341_000000000],
                       type=pa.timestamp("ns")),
    })
    p = Pipeline(stages=[], sinks=[("all", "*")])
    routed = p.run(rd.from_arrow(t))
    counts = write_routed_sinks(routed, str(tmp_path), wave="w0",
                                formats={"all": "msgpack"})
    assert counts["all"] == 2
    data = b""
    wavedir = tmp_path / "all" / "wave=w0"
    for f in sorted(os.listdir(wavedir)):
        assert f.endswith(".msgpack")
        data += open(wavedir / f, "rb").read()
    unp = msgpack.Unpacker(raw=False)
    unp.feed(data)
    recs = list(unp)
    assert len(recs) == 2 and all(isinstance(r[1], dict) for r in recs)
