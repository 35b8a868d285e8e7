"""Small filters: alter_size, expect, python UDF (lua analogue), stdout.

- alter_size (fork plugin filter_alter_size/alter_size.c:62-130): add N
  synthetic keys ``key_N`` or remove the first N keys — record-width
  benchmark helper.
- expect (plugins/filter_expect, expect.h:31-35): per-record assertions
  key_exists / key_not_exists / key_val_is_null / key_val_is_not_null /
  key_val_eq; action "warn" collects, "exit" raises (test oracle).
- py_udf: the Lua filter analogue (plugins/filter_lua/lua.c:411-545):
  user fn(tag, ts, record_dict) -> (code, record_dict); code -1 drop,
  0 keep as-is, 1 replace record. Runs row-wise over decoded fields —
  the user-extension hook, intentionally not vectorized.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..record import TAG_COL
from .base import (Stage, decode_fields_subset, register, replace_column,
                   scatter_fields)


@register("alter_size")
class AlterSizeStage(Stage):
    def __init__(self, add: int = 0, remove: int = 0, **kw):
        super().__init__(**kw)
        self.add = add
        self.remove = remove

    def transform(self, batch: pa.Table, mask: np.ndarray) -> pa.Table:
        idx = np.nonzero(mask)[0]
        dicts = decode_fields_subset(batch, idx)
        out = []
        for d in dicts:
            if self.remove > 0:
                keys = list(d)[self.remove:]
                d = {k: d[k] for k in keys}
            for i in range(self.add):
                d[f"key_{i}"] = "test_value"
            out.append(d)
        return scatter_fields(batch, idx, out)


class ExpectViolation(AssertionError):
    pass


@register("expect")
class ExpectStage(Stage):
    def __init__(self, checks: list[tuple], action: str = "exit", **kw):
        """checks: [(kind, key[, value])] with kinds key_exists |
        key_not_exists | key_val_is_null | key_val_is_not_null | key_val_eq."""
        super().__init__(**kw)
        self.checks = checks
        self.action = action
        self.violations: list[str] = []

    def _check_row(self, d: dict) -> str | None:
        for chk in self.checks:
            kind, key = chk[0], chk[1]
            if kind == "key_exists" and key not in d:
                return f"key_exists failed for {key!r}"
            if kind == "key_not_exists" and key in d:
                return f"key_not_exists failed for {key!r}"
            if kind == "key_val_is_null" and d.get(key) is not None:
                return f"key_val_is_null failed for {key!r}"
            if kind == "key_val_is_not_null" and d.get(key) is None:
                return f"key_val_is_not_null failed for {key!r}"
            if kind == "key_val_eq" and d.get(key) != chk[2]:
                return f"key_val_eq failed for {key!r}: {d.get(key)!r} != {chk[2]!r}"
        return None

    def transform(self, batch: pa.Table, mask: np.ndarray) -> pa.Table:
        idx = np.nonzero(mask)[0]
        dicts = decode_fields_subset(batch, idx)
        for d in dicts:
            msg = self._check_row(d)
            if msg:
                if self.action == "exit":
                    raise ExpectViolation(msg)
                self.violations.append(msg)
        return batch


# Named UDF registry: the classic-config translation of a lua filter
# ([FILTER] name lua / script / call, reference
# plugins/filter_lua/lua.c:411-545) binds ``call`` to a python callable
# registered here (documented substitution — no Lua runtime in this
# engine). The registry is consulted on the DRIVER at build time; the
# resolved function is then shipped to workers with the stage.
UDF_REGISTRY: dict[str, object] = {}


def register_udf(name: str, fn=None):
    """Register ``fn`` under ``name`` for config lua/py_udf filters.

    Usable directly (``register_udf("f", f)``) or as a decorator
    (``@register_udf("f")``).
    """
    if fn is None:
        def deco(f):
            UDF_REGISTRY[name] = f
            return f
        return deco
    UDF_REGISTRY[name] = fn
    return fn


@register("py_udf")
class PyUdfStage(Stage):
    """Lua-filter analogue (reference plugins/filter_lua/lua.c:411-545).

    ``fn(tag, ts, record) -> (code, record)`` or ``(code, ts, record)``:
    code -1 drop; 0 keep untouched; 1 replace record (and, with the
    3-tuple form, replace the event time — lua code 2 'keep time' is
    the 2-tuple form of code 1).

    ``fn`` may be a callable or the name of one registered via
    ``register_udf`` (the classic-config path passes names).
    """

    def __init__(self, fn, **kw):
        super().__init__(**kw)
        if isinstance(fn, str):
            if fn not in UDF_REGISTRY:
                raise ValueError(
                    f"py_udf: no callable registered under {fn!r} "
                    f"(registered: {sorted(UDF_REGISTRY)}); call "
                    "fluent_bit_ray.stages.misc.register_udf first")
            fn = UDF_REGISTRY[fn]
        self.fn = fn

    def transform(self, batch: pa.Table, mask: np.ndarray) -> pa.Table:
        idx = np.nonzero(mask)[0]
        dicts = decode_fields_subset(batch, idx)
        tags = (batch.column(TAG_COL).to_pylist()
                if TAG_COL in batch.column_names else [None] * batch.num_rows)
        ts = (batch.column("ts").to_pylist()
              if "ts" in batch.column_names else [None] * batch.num_rows)
        keep = np.ones(batch.num_rows, dtype=bool)
        out_idx, out_dicts = [], []
        new_ts: dict[int, object] = {}
        for i, d in zip(idx, dicts):
            ret = self.fn(tags[i], ts[i], d)
            if len(ret) == 3:
                code, t2, rec = ret
                if code == 1 and t2 is not None:
                    new_ts[i] = t2
            else:
                code, rec = ret
            if code == -1:
                keep[i] = False
            elif code == 1:
                out_idx.append(i)
                out_dicts.append(rec)
        if out_idx:
            batch = scatter_fields(batch, np.array(out_idx), out_dicts)
        if new_ts:
            col = "event_ts" if "event_ts" in batch.column_names else "ts"
            vals = batch.column(col).to_pylist()
            for i, t2 in new_ts.items():
                vals[i] = t2
            batch = replace_column(batch, "event_ts",
                                   pa.array(vals, type=pa.timestamp("ns")))
        if not keep.all():
            batch = batch.filter(pa.array(keep))
        return batch


@register("url_normalize")
class UrlNormalizeStage(Stage):
    """apm_url_normalizer semantics (reference
    plugins/filter_apm_url_normalize/filter_url_normalize.c:112-210):
    collapse variable URL path segments to placeholders so URLs
    aggregate by route template (e.g. /api/v1/users/123 →
    /api/v1/users/:id). Vectorized Arrow regex over a top-level
    column; writes ``<col>_norm``."""

    def __init__(self, column: str = "p_path", out_column: str | None = None,
                 **kw):
        super().__init__(**kw)
        self.column = column
        self.out_column = out_column or f"{column}_norm"

    def transform(self, batch: pa.Table, mask: np.ndarray) -> pa.Table:
        import pyarrow.compute as pc
        if self.column not in batch.column_names:
            return batch
        col = batch.column(self.column).cast(pa.string())
        # RE2 has no lookahead: match the trailing separator and keep it
        # via \1; run twice so consecutive numeric segments both collapse
        norm = col
        for _ in range(2):
            norm = pc.replace_substring_regex(norm, pattern=r"/\d+(/|$)",
                                              replacement=r"/:id\1")
            norm = pc.replace_substring_regex(
                norm, pattern=r"/[0-9a-fA-F]{8}-[0-9a-fA-F-]{27}(/|$)",
                replacement=r"/:uuid\1")
        if not mask.all():
            norm = pc.if_else(pa.array(mask), norm, col)
        return replace_column(batch, self.out_column, norm)


@register("message_format")
class MessageFormatStage(Stage):
    """apm_message_formatter semantics (reference
    plugins/filter_apm_message_formatter): rewrite a message string by
    template over the record (``$key`` / ``$TAG`` refs); writes
    ``out_key`` into the fields map."""

    def __init__(self, template: str, out_key: str = "formatted", **kw):
        super().__init__(**kw)
        self.template = template
        self.out_key = out_key

    def transform(self, batch: pa.Table, mask: np.ndarray) -> pa.Table:
        from ..record import translate
        idx = np.nonzero(mask)[0]
        dicts = decode_fields_subset(batch, idx)
        cols = {c: batch.column(c).to_pylist() for c in batch.column_names
                if c != "fields"}
        out = []
        for j, i in enumerate(idx):
            row = {c: cols[c][i] for c in cols}
            row["fields"] = dicts[j]
            d = dicts[j]
            d[self.out_key] = translate(self.template, row)
            out.append(d)
        return scatter_fields(batch, idx, out)


@register("stdout")
class StdoutStage(Stage):
    """Pass-through debug print (plugins/filter_stdout)."""

    def __init__(self, limit: int = 5, **kw):
        super().__init__(**kw)
        self.limit = limit

    def transform(self, batch: pa.Table, mask: np.ndarray) -> pa.Table:
        for row in batch.slice(0, self.limit).to_pylist():
            print(row)
        return batch
