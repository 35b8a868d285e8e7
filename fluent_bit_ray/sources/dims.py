"""Deterministic dimension tables for lookup-enrich stages.

Mirrors the reference's enrichment surfaces (FIXTURES.md §3):
- ``dim_tools``  — key→metadata lookup (apm_ldap / kubernetes style;
  reference plugins/filter_apm_ldap/filter_ldap.c:20-120, cache
  semantics src/flb_hash.c:42-172).
- ``dim_agents`` — ordered regex table (apm_uaparser style; reference
  plugins/filter_apm_uaparser/filter_uaparser.c:49-266).
- ``dim_geo``    — prefix lookup (apm_geoip/geoip2 style; reference
  plugins/filter_apm_geoip/filter_geoip.c:67-100). Misses emit the
  reference's "Unknown" convention.

Small (≤1k rows) by design: these are broadcast to actors, never
shuffle-joined.
"""

from __future__ import annotations

import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq

from .transcripts import CACHE_ROOT, GEN_VERSION

UNKNOWN = "Unknown"


def dim_tools() -> pa.Table:
    rows = [
        ("search", "retrieval", "team-web", 1),
        ("bash", "exec", "team-infra", 3),
        ("python", "exec", "team-ml", 2),
        ("browser", "retrieval", "team-web", 2),
    ]
    return pa.table({
        "tool": pa.array([r[0] for r in rows]),
        "category": pa.array([r[1] for r in rows]),
        "owner": pa.array([r[2] for r in rows]),
        "risk": pa.array([r[3] for r in rows], type=pa.int32()),
    })


def dim_agents() -> pa.Table:
    # ordered regex table: first match wins (uaparser convention)
    rows = [
        (r"Firefox/(\d+)", "Firefox", "Linux", "desktop"),
        (r"Chrome/(\d+)", "Chrome", "Windows", "desktop"),
        (r"curl/([\d.]+)", "curl", "cli", "bot"),
        (r"python-requests/([\d.]+)", "requests", "cli", "bot"),
    ]
    return pa.table({
        "agent_re": pa.array([r[0] for r in rows]),
        "browser": pa.array([r[1] for r in rows]),
        "os": pa.array([r[2] for r in rows]),
        "device": pa.array([r[3] for r in rows]),
    })


def dim_geo() -> pa.Table:
    # /8 prefix → geo; deterministic tiny table covering the synthetic 10.x IPs
    rows = []
    cities = ["Amsterdam", "Boston", "Chennai", "Denver", "Essen",
              "Fukuoka", "Geneva", "Hanoi"]
    countries = ["NL", "US", "IN", "US", "DE", "JP", "CH", "VN"]
    for i in range(128):
        rows.append((f"10.{i * 2}.", cities[i % 8], countries[i % 8],
                     round(-60 + i * 0.9, 2), round(-170 + i * 2.6, 2)))
    return pa.table({
        "ip_prefix": pa.array([r[0] for r in rows]),
        "city": pa.array([r[1] for r in rows]),
        "country": pa.array([r[2] for r in rows]),
        "lat": pa.array([r[3] for r in rows], type=pa.float64()),
        "lon": pa.array([r[4] for r in rows], type=pa.float64()),
    })


_GENERATORS = {"dim_tools": dim_tools, "dim_agents": dim_agents, "dim_geo": dim_geo}


def ensure_dim(name: str) -> str:
    """Write dimension table to a cached parquet path (for oracle SQL)."""
    path = os.path.join(CACHE_ROOT, f"v{GEN_VERSION}", "dims", f"{name}.parquet")
    if os.path.exists(path):
        return path
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".tmp")
    os.close(fd)
    try:
        pq.write_table(_GENERATORS[name](), tmp)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return path
