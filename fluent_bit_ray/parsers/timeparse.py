"""Time-string → timestamp lookup with Fluent Bit's strptime semantics.

Reference behavior being mirrored (not ported):
- ``flb_parser_time_lookup`` (reference src/flb_parser.c:745) with the
  bundled strptime (src/flb_strptime.c): ``%L`` fractional seconds,
  fixed ``%z`` UTC offsets, and year-less formats defaulting to a year
  (the reference uses the *current* year; we use a fixed default for
  determinism).

Vectorized with pandas.to_datetime over the whole column.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

DEFAULT_YEAR = 2015  # deterministic substitute for the reference's "current year"


def _translate_format(fmt: str) -> str:
    # %L = fractional seconds in flb_strptime → pandas %f handles 1-9 digits
    return fmt.replace("%L", "%f")


def parse_time_column(values, fmt: str, default_year: int = DEFAULT_YEAR) -> np.ndarray:
    """Parse a string sequence with a strptime format.

    Returns datetime64[ns] numpy array (NaT on miss). Timezone offsets
    are normalized to UTC then dropped (naive-UTC convention, matching
    Arrow/DuckDB defaults).
    """
    s = pd.Series(values, dtype="object")
    pfmt = _translate_format(fmt)
    yearless = ("%Y" not in pfmt) and ("%y" not in pfmt)
    if yearless:
        s = s.astype(str).radd(f"{default_year} ")
        pfmt = "%Y " + pfmt
    out = pd.to_datetime(s, format=pfmt, errors="coerce", utc=("%z" in pfmt))
    if getattr(out.dt, "tz", None) is not None:
        out = out.dt.tz_convert("UTC").dt.tz_localize(None)
    return out.to_numpy(dtype="datetime64[ns]")


def parse_epoch_column(values) -> np.ndarray:
    """Numeric epoch-seconds strings → datetime64[ns] (NaT on miss)."""
    s = pd.to_numeric(pd.Series(values, dtype="object"), errors="coerce")
    return pd.to_datetime(s, unit="s", errors="coerce").to_numpy(dtype="datetime64[ns]")
