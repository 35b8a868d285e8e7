"""Filter-stage framework.

The reference runs an ordered filter chain per chunk at ingestion time;
each filter applies only to chunks whose tag matches its ``Match``
pattern and may rewrite or drop records (reference
src/flb_filter.c:56-140, called from src/flb_input_chunk.c:911).

Here a stage is a callable ``pa.Table -> pa.Table`` applied via
``Dataset.map_batches(batch_format="pyarrow")``. Tag selection becomes
a per-row boolean mask: matching rows are transformed, the rest pass
through untouched **in their original row positions** (we scatter
results back rather than re-concatenating, so intra-block order is
stable).

Stages that hold compiled state (regexes, parsers, dimension tables)
are classes whose ``__init__`` runs once per actor when passed to
``map_batches(Cls, concurrency=N)``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..record import FIELDS_COL, TAG_COL, fields_dumps, fields_loads
from ..tags import match_mask


def ensure_column(batch: pa.Table, name: str, typ: pa.DataType,
                  fill=None) -> pa.Table:
    if name in batch.column_names:
        return batch
    arr = pa.nulls(batch.num_rows, type=typ) if fill is None else \
        pa.array([fill] * batch.num_rows, type=typ)
    return batch.append_column(name, arr)


def replace_column(batch: pa.Table, name: str, arr) -> pa.Table:
    if not isinstance(arr, (pa.Array, pa.ChunkedArray)):
        arr = pa.array(arr)
    if name in batch.column_names:
        return batch.set_column(batch.column_names.index(name), name, arr)
    return batch.append_column(name, arr)


def decode_fields_subset(batch: pa.Table, idx: np.ndarray) -> list[dict]:
    """Decode the fields JSON column for the given row indices only."""
    if FIELDS_COL not in batch.column_names:
        return [{} for _ in idx]
    col = batch.column(FIELDS_COL).combine_chunks()
    vals = col.take(pa.array(idx)).to_pylist()
    return [fields_loads(v) for v in vals]


def scatter_fields(batch: pa.Table, idx: np.ndarray,
                   dicts: list[dict]) -> pa.Table:
    """Re-encode updated field dicts back into their row positions."""
    batch = ensure_column(batch, FIELDS_COL, pa.large_string(), fill="")
    col = batch.column(FIELDS_COL).combine_chunks().to_pylist()
    for i, d in zip(idx, dicts):
        col[i] = fields_dumps(d)
    return replace_column(batch, FIELDS_COL, pa.array(col, type=pa.large_string()))


class Stage:
    """Base: applies ``transform`` to tag-matching rows only."""

    def __init__(self, match: str = "*", match_regex: bool = False):
        self.match = match
        self.match_regex = match_regex

    def _mask(self, batch: pa.Table) -> np.ndarray:
        if self.match == "*" or TAG_COL not in batch.column_names:
            return np.ones(batch.num_rows, dtype=bool)
        return match_mask(batch.column(TAG_COL), self.match, self.match_regex)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        mask = self._mask(batch)
        if not mask.any():
            return batch
        return self.transform(batch, mask)

    def transform(self, batch: pa.Table, mask: np.ndarray) -> pa.Table:
        raise NotImplementedError


STAGE_TYPES: dict[str, type] = {}


def register(name: str):
    def deco(cls):
        STAGE_TYPES[name] = cls
        cls.stage_type = name
        return cls
    return deco


def build_stage(spec: dict) -> Stage:
    """Build one stage from a config dict: {"type": ..., **params}."""
    spec = dict(spec)
    typ = spec.pop("type")
    cls = STAGE_TYPES[typ]
    return cls(**spec)


# import stage modules for registration side effects
from . import grep, modify, nest, parser_stage, record_modifier  # noqa: E402,F401
from . import enrich, misc, multiline, rewrite_tag, throttle  # noqa: E402,F401
from . import tensorflow  # noqa: E402,F401
