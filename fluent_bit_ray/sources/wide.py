"""Wide-record stress fixtures.

The reference generates JSON records with hundreds of keys to stress
its pack/filter path (tests/runtime/gen_data.py: JSON_SMALL = 250 bool
keys, JSON_LONG = 1000 string keys, both ending in the
"END_KEY": "JSON_END" sentinel). This module builds the same record
shapes as an Arrow table of transcript-shaped rows whose ``text`` is
the wide JSON map, for the parser → modify → nest chain to chew on.

The key/value body is identical across rows (as in the reference) and
built once; only a per-row ``row_id`` field varies, so generation cost
is O(rows) appends, not O(rows × keys) string formatting.
"""

from __future__ import annotations

import pyarrow as pa


def wide_json_body(n_keys: int, kind: str = "string") -> str:
    """The reference record body: key_0..key_{n-1} then the sentinel."""
    if kind == "string":
        kv = ",".join(f'"key_{j}": "val_{j}"' for j in range(n_keys))
    elif kind == "bool":
        kv = ",".join(f'"key_{j}": false' for j in range(n_keys))
    else:
        raise ValueError(f"kind {kind!r}: want 'string' or 'bool'")
    return kv + ',"END_KEY": "JSON_END"'


def wide_records(n_rows: int, n_keys: int = 1000,
                 kind: str = "string") -> pa.Table:
    """Transcript-shaped table whose text column is a wide JSON map."""
    body = wide_json_body(n_keys, kind)
    texts = [f'{{"row_id": {i},{body}}}' for i in range(n_rows)]
    return pa.table({
        "conv_id": pa.array([f"wide-{i % 97:04d}" for i in range(n_rows)],
                            type=pa.large_string()),
        "turn_idx": pa.array([i // 97 for i in range(n_rows)],
                             type=pa.int32()),
        "role": pa.array(["user"] * n_rows, type=pa.large_string()),
        "text": pa.array(texts, type=pa.large_string()),
    })


def ensure_wide_records(n_rows: int, n_keys: int = 1000,
                        kind: str = "string", shards: int = 32) -> str:
    """Cache ``wide_records`` as sharded parquet under /tmp and return
    the directory. Benchmarks read THIS instead of generating in the
    timed region: building 16k × 16 KB JSON strings is ~2 s of serial
    driver work, which poisons any parallel-efficiency measurement
    (and at real scale the wide records would arrive from storage
    anyway, not a driver loop)."""
    import os

    import pyarrow.parquet as pq

    path = f"/tmp/graft_wide/v1/r{n_rows}_k{n_keys}_{kind}"
    done = f"{path}/_DONE"
    if os.path.exists(done):
        return path
    os.makedirs(path, exist_ok=True)
    tbl = wide_records(n_rows, n_keys, kind)
    per = -(-n_rows // shards)
    for s in range(shards):
        piece = tbl.slice(s * per, per)
        if piece.num_rows:
            pq.write_table(piece, f"{path}/part-{s:05d}.parquet")
    with open(done, "w") as f:
        f.write("ok")
    return path
