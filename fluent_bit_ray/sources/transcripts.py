"""Deterministic synthetic transcript table (the engine's canonical input).

Schema per BASELINE.json ``input_hint``:
    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string, ts:timestamp[ns]

Design (mirrors FIXTURES.md §1-2):
- ``conv_id`` draws are Zipf-skewed (weight 1/(i+1)**1.1) so a few
  conversations are hot — exercises salted-key skew handling.
- ``turn_idx`` is contiguous per conversation; rows are shuffled on
  disk so any order-sensitive stage must restore (conv_id, turn_idx).
- ``text`` carries one of six payload grammars chosen by a
  deterministic per-row hash (apache access log, JSON, logfmt, ltsv,
  tool-call grammar, free text). This mirrors the payloads Fluent
  Bit's parsers handle (reference conf/parsers.conf:2-6 apache regex;
  src/flb_parser_json.c; src/flb_parser_logfmt.c; src/flb_parser_ltsv.c)
  without copying any reference code.
- ``ts`` base epoch 1448403340 is the fixed timestamp the reference's
  own test generator uses (reference tests/runtime/gen_data.py:7), so
  window buckets are deterministic.

Everything is seed-fixed; no wall clock, no external data. Generated
parquet is cached under /tmp and regenerated when GEN_VERSION changes.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

GEN_VERSION = 5
BASE_EPOCH = 1448403340  # fixed ts used by the reference's test data generator
ROWS_PER_SF = 6_000_000  # sf0.001 -> 6k rows, sf0.01 -> 60k, sf0.1 -> 600k
CACHE_ROOT = "/tmp/graft_transcripts"

ROLES = np.array(["user", "assistant", "tool", "system"])
TOOLS = np.array(["search", "bash", "python", "browser"])
LEVELS = np.array(["info", "warn", "error", "debug", "info"])
METHODS = np.array(["GET", "POST", "PUT", "DELETE"])
PATHS = np.array(["/index.html", "/api/v1/items", "/login", "/static/app.js",
                  "/health", "/api/v1/users", "/search", "/admin"])
AGENTS = np.array(["Mozilla/5.0 (X11; Linux x86_64) Firefox/92.0",
                   "Mozilla/5.0 (Windows NT 10.0) Chrome/94.0.4606.81",
                   "curl/7.68.0", "python-requests/2.26.0"])
WORDS = np.array(("the quick brown fox jumps over lazy dog stream pipeline "
                  "parse route aggregate window shuffle batch actor arrow "
                  "vector tag match filter enrich sink source record turn").split())
MONTHS = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
          "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]


def n_rows_for_sf(sf: float) -> int:
    return max(1000, int(round(sf * ROWS_PER_SF)))


def sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(os.path.normpath(sf_dir))
    if base.startswith("sf"):
        try:
            return float(base[2:])
        except ValueError:
            pass
    return 0.001


def _conv_lengths(n_rows: int) -> np.ndarray:
    """Zipf-ish conversation lengths summing exactly to n_rows."""
    n_convs = max(4, n_rows // 10)
    w = 1.0 / np.power(np.arange(1, n_convs + 1, dtype=np.float64), 1.1)
    lengths = np.maximum(1, np.floor(w / w.sum() * n_rows)).astype(np.int64)
    # fix the total by adjusting the head (hot) conversation
    lengths[0] += n_rows - lengths.sum()
    return lengths


def _apache_time(ts_sec: np.ndarray) -> list[str]:
    # %d/%b/%Y:%H:%M:%S +0000 without wall-clock/locale dependence
    days = ts_sec // 86400
    rem = ts_sec % 86400
    out = []
    import datetime as _dt
    epoch = _dt.date(1970, 1, 1)
    # vector of unique days -> date strings (tiny)
    uniq = {}
    for d in np.unique(days):
        dd = epoch + _dt.timedelta(days=int(d))
        uniq[int(d)] = f"{dd.day:02d}/{MONTHS[dd.month - 1]}/{dd.year}"
    for d, r in zip(days, rem):
        out.append(f"{uniq[int(d)]}:{r // 3600:02d}:{(r % 3600) // 60:02d}:{r % 60:02d} +0000")
    return out


def gen_transcripts(n_rows: int, seed: int = 42) -> pa.Table:
    lengths = _conv_lengths(n_rows)
    n_convs = len(lengths)
    conv_num = np.repeat(np.arange(n_convs, dtype=np.int64), lengths)
    turn_idx = (np.arange(n_rows, dtype=np.int64)
                - np.repeat(np.cumsum(lengths) - lengths, lengths))

    role_idx = (turn_idx % 4).astype(np.int64)
    role = ROLES[role_idx]

    h = ((conv_num * 1000003 + turn_idx * 7919 + 12345) & 0x7FFFFFFF)
    g = h % 10
    code = np.where(h % 10 < 7, 200, np.where(h % 10 < 9, 404, 500))
    dur = np.round((h % 1000) / 1000.0, 3)
    level = LEVELS[h % 5]
    tool_pick = TOOLS[h % 4]
    tool = np.where(role == "tool", tool_pick, "")

    ts_sec = BASE_EPOCH + conv_num * 7 + turn_idx

    text = np.empty(n_rows, dtype=object)

    # g in {0,1}: apache/nginx access log (reference conf/parsers.conf:2-6)
    m = (g <= 1)
    if m.any():
        idx = np.nonzero(m)[0]
        hh = h[idx]
        ips = [f"10.{x >> 16 & 255}.{x >> 8 & 255}.{x & 255}" for x in hh]
        times = _apache_time(ts_sec[idx])
        meth = METHODS[hh % 4]
        path = PATHS[hh % 8]
        ag = AGENTS[hh % 4]
        cd = code[idx]
        sz = hh % 5000
        for j, i in enumerate(idx):
            # some rows: '-' size and empty referer (zero-length-capture cases)
            size_s = "-" if hh[j] % 17 == 0 else str(sz[j])
            ref = "" if hh[j] % 13 == 0 else "http://example.com/start"
            text[i] = (f'{ips[j]} - user{hh[j] % 50} [{times[j]}] '
                       f'"{meth[j]} {path[j]} HTTP/1.1" {cd[j]} {size_s} '
                       f'"{ref}" "{ag[j]}"')

    # g in {2,3}: JSON object with time key + nested escaped-JSON "log" field
    m = (g == 2) | (g == 3)
    if m.any():
        idx = np.nonzero(m)[0]
        for i in idx:
            hv = int(h[i])
            base = (f'{{"level": "{level[i]}", "msg": "event {hv % 97}", '
                    f'"code": {int(code[i])}, "dur": {dur[i]:.3f}, '
                    f'"tool": "{TOOLS[hv % 4]}", '
                    f'"log": "{{\\"nested\\": {str(hv % 2 == 0).lower()}, \\"seq\\": {hv % 31}}}"')
            if g[i] == 3 and hv % 50 == 0:  # wide-record stress (gen_data.py 250-key shape)
                extra = "".join(f', "key_{k}": true' for k in range(250))
                base += extra
            text[i] = base + "}"

    # g == 4: logfmt
    m = (g == 4)
    if m.any():
        idx = np.nonzero(m)[0]
        for i in idx:
            text[i] = (f'level={level[i]} msg="tool call {int(h[i]) % 23}" '
                       f'tool={TOOLS[int(h[i]) % 4]} dur={dur[i]:.3f} code={int(code[i])}')

    # g == 5: ltsv
    m = (g == 5)
    if m.any():
        idx = np.nonzero(m)[0]
        for i in idx:
            text[i] = (f"level:{level[i]}\tcode:{int(code[i])}\t"
                       f"msg:ok {int(h[i]) % 11}\tdur:{dur[i]:.3f}")

    # g in {6,7}: tool-call grammar  CALL tool({json}) -> status
    m = (g == 6) | (g == 7)
    if m.any():
        idx = np.nonzero(m)[0]
        for i in idx:
            hv = int(h[i])
            status = "ok" if hv % 5 else "error"
            text[i] = (f'CALL {TOOLS[hv % 4]}({{"arg": {hv % 100}, '
                       f'"q": "item-{hv % 41}"}}) -> {status}')

    # g in {8,9}: unparseable free text
    m = (g >= 8)
    if m.any():
        idx = np.nonzero(m)[0]
        for i in idx:
            hv = int(h[i])
            ws = WORDS[[(hv + k * 131) % len(WORDS) for k in range(6 + hv % 8)]]
            text[i] = " ".join(ws)

    # shuffle rows on disk so ordering must be restored downstream
    rs = np.random.RandomState(seed)
    perm = rs.permutation(n_rows)

    conv_id = np.array([f"conv-{c:06d}" for c in conv_num[perm]], dtype=object)
    return pa.table({
        "conv_id": pa.array(conv_id, type=pa.string()),
        "turn_idx": pa.array(turn_idx[perm].astype(np.int32), type=pa.int32()),
        "role": pa.array(role[perm], type=pa.string()),
        "text": pa.array(text[perm], type=pa.string()),
        "tool": pa.array(tool[perm], type=pa.string()),
        "ts": pa.array((ts_sec[perm] * 1_000_000_000).astype("int64")).cast(pa.timestamp("ns")),
    })


SHARD_ROWS = 100_000  # shard size balances parallel reads vs per-file metadata cost


def transcripts_path(sf_dir: str) -> str:
    """Directory of shard parquet files (the realistic many-file layout)."""
    base = os.path.basename(os.path.normpath(sf_dir)) or "sf0.001"
    return os.path.join(CACHE_ROOT, f"v{GEN_VERSION}", base, "transcripts")


def ensure_transcripts(sf_dir: str) -> str:
    """Generate (once, atomically) and return the transcript parquet dir.

    Output is a directory of `part-NNNNN.parquet` shards so the Ray
    read parallelizes across files — a single big file makes the read
    one serial task and starves every downstream stage.
    """
    path = transcripts_path(sf_dir)
    if os.path.isdir(path):
        return path
    table = gen_transcripts(n_rows_for_sf(sf_from_dir(sf_dir)))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmpdir = tempfile.mkdtemp(dir=os.path.dirname(path),
                              prefix=".transcripts.tmp")
    try:
        n = table.num_rows
        n_shards = max(1, (n + SHARD_ROWS - 1) // SHARD_ROWS)
        for s in range(n_shards):
            lo = s * SHARD_ROWS
            pq.write_table(table.slice(lo, SHARD_ROWS),
                           os.path.join(tmpdir, f"part-{s:05d}.parquet"),
                           row_group_size=8192)
        try:
            os.rename(tmpdir, path)  # atomic publish
        except OSError:
            pass  # concurrent generator won the race; ours is discarded below
    finally:
        if os.path.isdir(tmpdir):
            import shutil
            shutil.rmtree(tmpdir, ignore_errors=True)
    return path


def read_transcripts(sf_dir: str, columns: list[str] | None = None):
    """Ray Dataset over the (cached) synthetic transcript shards.

    Block count is the max of a cluster floor (~1.5 blocks per CPU,
    so small tables still use every core) and a DATA-DRIVEN term
    (~128k rows per block). The old pure-per-CPU formula made block
    size grow with input: at sf4 / 16 CPUs it planned 24 one-million-
    row tasks (~61 CPU·s, 1.2 GB peak heap each) — two unbalanced
    waves, measured 0.54 scaling efficiency where sf1 gave 0.90.
    Capping rows-per-block keeps task makespan and worker heap flat
    as the input grows, which is the property that actually matters
    at 100 TB (the per-CPU floor would be irrelevant there; the cap
    is what bounds straggler size and heap).
    """
    import ray
    import ray.data as rd
    path = ensure_transcripts(sf_dir)
    try:
        ncpu = int(ray.cluster_resources().get("CPU", 8)) \
            if ray.is_initialized() else 8
    except Exception:
        ncpu = 8
    rows = n_rows_for_sf(sf_from_dir(sf_dir))
    return rd.read_parquet(path, columns=columns,
                           override_num_blocks=block_count(rows, ncpu))


def block_count(rows: int, ncpu: int) -> int:
    """max(~1.5 blocks/CPU, ~128k rows/block), bounded so tiny tables
    aren't shredded below ~8k rows/task. The data-driven term is the
    one that matters as input grows (see read_transcripts docstring)."""
    return max(1, min(rows // 8192,
                      max(ncpu + ncpu // 2, rows // 131072)))
