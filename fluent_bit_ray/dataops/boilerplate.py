"""Cross-conversation boilerplate removal (C4-style repeated-line drop).

Transcript corpora are full of canned text — system prompts, greeting
templates, tool banners — that repeats VERBATIM across many distinct
conversations. Training-data curation drops such boilerplate entirely
(C4 removes lines occurring repeatedly across documents; here the
unit is a turn's text and the scope is distinct conversations).

Semantics: a text is boilerplate when it appears in ≥ ``min_groups``
DISTINCT conversations; ALL its occurrences are dropped (not dedup —
removal).

Scale shape (100 TB):
- pass 1 shrinks each batch to its DISTINCT (h64(text), conv_id)
  pairs before the exchange, so the shuffle moves 16-byte pairs, not
  text; the coarse-partitioned kernel (shuffle.coarse_partition_apply,
  64 partitions, vectorized drop_duplicates + value_counts inside)
  counts distinct conversations per hash without per-key Python;
- the resulting boilerplate hash set is BOUNDED (texts repeated across
  ≥K conversations are by construction few relative to the corpus) and
  is broadcast once via ``ray.put`` — membership in pass 2 is one
  sorted-array searchsorted per batch, zero shuffle.

Hashing follows the dedup-family convention (dedup.py): 64-bit
little-endian prefix of md5 — deterministic across processes, and the
DuckDB oracle can verify on raw text equality directly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

from .dedup import _h64


def _h64_col(col: pd.Series) -> np.ndarray:
    """uint64 md5-h64 per row — the dedup-family convention
    (dedup._h64, reproducible via __ray_entry__._h64_sql). Hashes
    each DISTINCT value once (boilerplate-heavy columns repeat a lot;
    md5 is a per-call Python cost worth memoizing per batch)."""
    codes, uniques = pd.factorize(col.astype(str), sort=False)
    hu = np.fromiter((_h64(u) for u in uniques),
                     dtype=np.uint64, count=len(uniques))
    return hu[codes]


def boilerplate_keys(ds, text_col: str = "text",
                     group_col: str = "conv_id",
                     min_groups: int = 5) -> np.ndarray:
    """Sorted int64 h64 hashes of texts seen in ≥ min_groups groups."""
    from ..shuffle import coarse_partition_apply

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"h": _h64_col(df[text_col]),
                            "g": df[group_col].astype(str)})
        return out.drop_duplicates()

    hashed = ds.map_batches(pairs, batch_format="pandas")

    def count_groups(part: pd.DataFrame) -> pd.DataFrame:
        vc = part.drop_duplicates()["h"].value_counts()
        bad = vc[vc >= min_groups].index.to_numpy(dtype=np.uint64)
        return pd.DataFrame({"h": bad})

    out = coarse_partition_apply(hashed, "h", count_groups).to_pandas()
    return np.sort(out["h"].to_numpy(dtype=np.uint64)) if len(out) else \
        np.array([], dtype=np.uint64)


def remove_boilerplate(ds, text_col: str = "text",
                       group_col: str = "conv_id", min_groups: int = 5):
    """Filter out every occurrence of cross-group boilerplate texts.

    Returns the input Dataset minus all rows whose text appears in
    ≥ min_groups distinct groups. The boilerplate set is broadcast
    once; the filter pass streams with zero shuffle.
    """
    bad = boilerplate_keys(ds, text_col, group_col, min_groups)
    bad_ref = ray.put(bad)

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        b = ray.get(bad_ref)
        if not len(b):
            return df
        h = _h64_col(df[text_col])
        pos = np.searchsorted(b, h)
        pos[pos == len(b)] = 0
        hit = b[pos] == h
        return df[~hit]

    return ds.map_batches(keep, batch_format="pandas")
