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

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        order = [ts_col] + ([tie_col] if tie_col else [])
        g = g.sort_values(order, kind="mergesort")
        ts = g[ts_col].astype("datetime64[ns]")
        gaps = ts.diff().dt.total_seconds().fillna(0.0).to_numpy()
        sess = np.cumsum(gaps > gap_s)
        g = g.assign(_sess=sess)
        spec = {"session_start": (ts_col, "min"),
                "session_end": (ts_col, "max"),
                "n_events": (ts_col, "size")}
        spec.update(agg)
        out = g.groupby("_sess", sort=True).agg(**{
            k: pd.NamedAgg(column=c, aggfunc=f) for k, (c, f) in spec.items()
        }).reset_index(names="session_idx")
        out.insert(0, key, g[key].iloc[0])
        out["session_idx"] = out["session_idx"].astype("int64")
        out["n_events"] = out["n_events"].astype("int64")
        return out

    from ..shuffle import coarse_group_apply
    # coarse key-hash partitions (see shuffle.coarse_group_apply): one
    # task per partition, not one per session key
    return coarse_group_apply(ds, key, per_key)
