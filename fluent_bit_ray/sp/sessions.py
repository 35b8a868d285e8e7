"""Session windows — gap-based sessionization over a keyed event log.

Beyond the reference's tumbling/hopping windows (SURVEY §2.6): a
session groups consecutive events of one key whose inter-event gap is
≤ ``gap_s``. Implemented Ray-Data-first: ``groupby(key)`` co-locates a
key's events, the per-group kernel sorts by (ts, tie-breaker) and
splits on gaps — the shuffle key is the session key; skewed keys are
bounded by a single key's event count, not the corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def sessionize(ds, key: str = "user_id", ts_col: str = "ts",
               gap_s: int = 1800, tie_col: str | None = None,
               agg: dict[str, tuple[str, str]] | None = None):
    """→ Dataset of sessions: key, session_idx (0-based per key),
    session_start, session_end, n_events [+ custom aggs].

    ``agg``: {out_col: (src_col, "sum"|"min"|"max"|"mean")} extra
    per-session aggregates.
    """
    agg = agg or {}

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        """Gap-break detection vectorized over the whole coarse
        partition: a session break is a key change or an over-gap
        delta; session ids are one global cumsum, re-based per key for
        the 0-based session_idx."""
        order = [key, ts_col] + ([tie_col] if tie_col else [])
        g = g.sort_values(order, kind="mergesort")
        n = len(g)
        ts = g[ts_col].astype("datetime64[ns]")
        kv = g[key].to_numpy()
        newk = np.ones(n, dtype=bool)
        newk[1:] = kv[1:] != kv[:-1]
        gaps = np.nan_to_num(ts.diff().dt.total_seconds().to_numpy(),
                             nan=0.0)
        brk = newk | (gaps > gap_s)
        sess = np.cumsum(brk)                      # global ids 1..S
        key_start_sess = sess[np.flatnonzero(newk)]
        key_run = np.cumsum(newk)                  # key index 1..K
        sess_idx = sess - key_start_sess[key_run - 1]
        g = g.assign(_sess=sess, _sidx=sess_idx)
        spec = {"session_start": (ts_col, "min"),
                "session_end": (ts_col, "max"),
                "n_events": (ts_col, "size")}
        spec.update(agg)
        out = g.groupby("_sess", sort=False).agg(**{
            "_key": pd.NamedAgg(column=key, aggfunc="first"),
            "session_idx": pd.NamedAgg(column="_sidx", aggfunc="first"),
            **{k: pd.NamedAgg(column=c, aggfunc=f)
               for k, (c, f) in spec.items()},
        }).reset_index(drop=True).rename(columns={"_key": key})
        out["session_idx"] = out["session_idx"].astype("int64")
        out["n_events"] = out["n_events"].astype("int64")
        return out

    from ..shuffle import coarse_partition_apply
    return coarse_partition_apply(ds, key, per_partition)
