"""Tool-usage transition counts over agent transcripts.

The telemetry question behind fluent-bit's tag-based counters, asked
of agent behavior: "which tool follows which?" — a Markov bigram table
of consecutive tool invocations within a conversation. Useful both as
pipeline analytics (routing hot paths) and as a training-data signal
(agent behavior drift between corpus slices).

Scale shape: one coarse conv_id exchange co-locates each conversation
(skew bounded by conversation length); inside a partition the kernel
is a vectorized neighbor-compare over the sorted tool rows, and only
(tool, next_tool, n) PARTIAL COUNTS leave each partition — the merged
table is ≤ |tools|² rows at any corpus size. Full rows+schema+hash
DuckDB oracle (lead() window) in ``__ray_entry__.py``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..shuffle import coarse_partition_apply


def tool_transitions(ds, tool_col: str = "tool", partitions: int = 64):
    """Dataset[tool, next_tool, n] — counts of consecutive tool
    invocations (rows with a non-empty ``tool_col``) per conversation,
    summed over the corpus. A conversation's last tool row has no
    successor and contributes nothing."""

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df[tool_col].notna() & (df[tool_col] != "")]
        # conv contiguity by factorize code — no object-string sort
        codes = pd.factorize(df["conv_id"], sort=False)[0]
        df = df.iloc[np.lexsort((df["turn_idx"].to_numpy(), codes))]
        conv = df["conv_id"].to_numpy(dtype=object)
        tool = df[tool_col].to_numpy(dtype=object)
        if len(df) < 2:
            # explicit dtypes: Ray's union of mismatched empty/nonempty
            # schemas silently degrades (see joins union-plan note)
            return pd.DataFrame({
                "tool": pd.Series([], dtype=object),
                "next_tool": pd.Series([], dtype=object),
                "n": pd.Series([], dtype=np.int64)})
        m = conv[1:] == conv[:-1]
        pairs = pd.DataFrame({"tool": tool[:-1][m],
                              "next_tool": tool[1:][m]})
        return (pairs.groupby(["tool", "next_tool"], sort=False)
                .size().reset_index(name="n"))

    partials = coarse_partition_apply(ds, "conv_id", kernel,
                                      partitions=partitions)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(["tool", "next_tool"], sort=False,
                         as_index=False)["n"].sum())
        out["n"] = out["n"].astype(np.int64)
        return out

    # merged table ≤ |tools|² rows — one-partition merge
    return coarse_partition_apply(partials, "tool", merge, partitions=1)
