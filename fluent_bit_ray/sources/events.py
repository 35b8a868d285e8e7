"""Synthetic events table for benchmarks at scales the driver does not
ship (driver testdata carries events.parquet only up to sf0.1).

Mirrors the driver table's shape (event_id:int64, ts:timestamp[us],
user_id:int64, event_type:string, value:double, props:string) and its
rough statistics (5-type domain, ~10 events/user, ts over a few days).
Fully vectorized generation, deterministic (seed-fixed), cached under
/tmp/graft_events/v{GEN_VERSION_EVENTS} — bump the version on any
generator change (same rule as the transcripts/docs caches).

Used ONLY by bench.py for scaling runs; correctness oracles always use
the driver-provided tables.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

GEN_VERSION_EVENTS = 1

_TYPES = np.array(["click", "view", "view", "view", "click",
                   "purchase", "error", "signup"])


def events_for_sf(sf: float) -> int:
    return max(100, int(round(sf * 1_000_000)))


def synth_events(n: int, seed: int = 23) -> pa.Table:
    rs = np.random.RandomState(seed)
    users = max(10, n // 66)           # ~66 events/user like the driver
    user_id = rs.randint(0, users, n).astype(np.int64)
    base = np.int64(1_700_000_000_000_000)            # 2023-11-14 UTC, us
    ts = np.sort(base + rs.randint(0, 5 * 86_400_000_000, n,
                                   dtype=np.int64))
    ttype = _TYPES[rs.randint(0, len(_TYPES), n)]
    value = np.round(rs.uniform(0.0, 200.0, n), 2)
    kcode = rs.randint(0, 7, n)
    props = np.char.add(np.char.add('{"k":', kcode.astype("U1")), "}")
    return pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts, type=pa.timestamp("us")),
        "user_id": pa.array(user_id),
        "event_type": pa.array(ttype),
        "value": pa.array(value, type=pa.float64()),
        "props": pa.array(props.astype(object), type=pa.string()),
    })


def ensure_events(sf: float) -> str:
    """Synthesize-and-cache; returns a parquet DIRECTORY path (many
    shards — one Ray read task each, same rationale as documents.py)."""
    d = f"/tmp/graft_events/v{GEN_VERSION_EVENTS}/sf{sf:g}"
    path = os.path.join(d, "events")
    if not os.path.exists(path):
        tab = synth_events(events_for_sf(sf))
        shards = max(1, min(64, tab.num_rows // 20_000))
        tmp = path + ".tmp"
        os.makedirs(tmp, exist_ok=True)
        step = -(-tab.num_rows // shards)
        for i in range(shards):
            part = tab.slice(i * step, step)
            if part.num_rows:
                pq.write_table(part,
                               os.path.join(tmp, f"part-{i:05d}.parquet"))
        os.replace(tmp, path)
    return path
