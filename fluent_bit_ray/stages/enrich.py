"""Lookup-enrichment stages (the actor-pool stateful family).

Covers the semantics of the reference's enrichment filters without
their transports:
- kubernetes / apm_ldap style key→metadata lookup with an in-process
  cache (reference plugins/filter_kubernetes/kubernetes.c:446-466,
  plugins/filter_apm_ldap/filter_ldap.c:20-120, hash cache
  src/flb_hash.c:42-172) → ``LookupEnrichStage``: the dimension table
  is held per actor (built once in ``__init__`` — broadcast pattern,
  never a shuffle join);
- apm_uaparser ordered-regex table (filter_uaparser.c:49-266) →
  ``UAParserEnrichStage`` (first matching regex wins);
- geoip2 / apm_geoip prefix lookup (filter_geoip.c:67-100) →
  ``GeoipEnrichStage``; misses emit the "Unknown" convention;
- aws metadata constant append (plugins/filter_aws/aws.h:50-64) →
  ``ConstEnrichStage``.

Deviation (documented): enriched keys land as TOP-LEVEL typed columns
(columnar-friendly), not inside the JSON fields map — equivalent
record semantics, vectorized lookups (pandas categorical map / numpy
take) instead of per-row dict writes.

These classes are designed for
``ds.map_batches(Cls, fn_constructor_kwargs=..., concurrency=N)``:
``__init__`` runs once per actor; ``__call__`` per batch.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

from ..sources import dims as dims_mod
from .base import Stage, register, replace_column

UNKNOWN = dims_mod.UNKNOWN


@register("lookup_enrich")
class LookupEnrichStage(Stage):
    def __init__(self, dim: str = "dim_tools", lookup_key: str = "tool",
                 add_fields: list[str] | None = None, prefix: str = "",
                 **kw):
        super().__init__(**kw)
        table = getattr(dims_mod, dim)()
        self.key_col = table.column_names[0]
        self.add_fields = add_fields or [c for c in table.column_names
                                         if c != self.key_col]
        self.lookup_key = lookup_key
        self.prefix = prefix
        df = table.to_pandas().set_index(self.key_col)
        self.maps = {f: df[f].to_dict() for f in self.add_fields}
        self.dtypes = {f: table.schema.field(f).type for f in self.add_fields}

    def transform(self, batch: pa.Table, mask: np.ndarray) -> pa.Table:
        keys = pd.Series(batch.column(self.lookup_key).to_pylist(), dtype="object")
        for f in self.add_fields:
            vals = keys.map(self.maps[f])
            typ = self.dtypes[f]
            if pa.types.is_string(typ) or pa.types.is_large_string(typ):
                vals = vals.where(vals.notna(), UNKNOWN)
                arr = pa.array(np.where(mask, vals.to_numpy(dtype=object), UNKNOWN),
                               type=pa.string())
            else:
                arr = pa.array([v if (m and pd.notna(v)) else None
                                for v, m in zip(vals, mask)], type=typ)
            batch = replace_column(batch, self.prefix + f, arr)
        return batch


@register("ua_enrich")
class UAParserEnrichStage(Stage):
    def __init__(self, lookup_key: str = "p_agent", prefix: str = "ua_", **kw):
        super().__init__(**kw)
        self.lookup_key = lookup_key
        self.prefix = prefix
        t = dims_mod.dim_agents()
        self.rules = [(re.compile(p), b, o, d) for p, b, o, d in
                      zip(t.column("agent_re").to_pylist(),
                          t.column("browser").to_pylist(),
                          t.column("os").to_pylist(),
                          t.column("device").to_pylist())]

    def transform(self, batch: pa.Table, mask: np.ndarray) -> pa.Table:
        if self.lookup_key not in batch.column_names:
            return batch
        vals = batch.column(self.lookup_key).to_pylist()
        n = batch.num_rows
        browser = [UNKNOWN] * n
        osn = [UNKNOWN] * n
        device = [UNKNOWN] * n
        # evaluate per unique agent string (low cardinality), first match wins
        cache: dict[str, tuple[str, str, str]] = {}
        for i in np.nonzero(mask)[0]:
            v = vals[i]
            if not isinstance(v, str) or not v:
                continue
            hit = cache.get(v)
            if hit is None:
                hit = (UNKNOWN, UNKNOWN, UNKNOWN)
                for rx, b, o, d in self.rules:
                    if rx.search(v):
                        hit = (b, o, d)
                        break
                cache[v] = hit
            browser[i], osn[i], device[i] = hit
        batch = replace_column(batch, self.prefix + "browser",
                               pa.array(browser, type=pa.string()))
        batch = replace_column(batch, self.prefix + "os",
                               pa.array(osn, type=pa.string()))
        batch = replace_column(batch, self.prefix + "device",
                               pa.array(device, type=pa.string()))
        return batch


@register("geoip_enrich")
class GeoipEnrichStage(Stage):
    def __init__(self, lookup_key: str = "p_host", prefix: str = "geo_", **kw):
        super().__init__(**kw)
        self.lookup_key = lookup_key
        self.prefix = prefix
        t = dims_mod.dim_geo()
        self.table = {p: (c, co, la, lo) for p, c, co, la, lo in
                      zip(t.column("ip_prefix").to_pylist(),
                          t.column("city").to_pylist(),
                          t.column("country").to_pylist(),
                          t.column("lat").to_pylist(),
                          t.column("lon").to_pylist())}

    def transform(self, batch: pa.Table, mask: np.ndarray) -> pa.Table:
        if self.lookup_key not in batch.column_names:
            return batch
        vals = batch.column(self.lookup_key).to_pylist()
        n = batch.num_rows
        city = [UNKNOWN] * n
        country = [UNKNOWN] * n
        lat: list = [None] * n
        lon: list = [None] * n
        for i in np.nonzero(mask)[0]:
            v = vals[i]
            if not isinstance(v, str):
                continue
            parts = v.split(".")
            if len(parts) < 2:
                continue
            hit = self.table.get(f"{parts[0]}.{parts[1]}.")
            if hit:
                city[i], country[i], lat[i], lon[i] = hit
        batch = replace_column(batch, self.prefix + "city",
                               pa.array(city, type=pa.string()))
        batch = replace_column(batch, self.prefix + "country",
                               pa.array(country, type=pa.string()))
        batch = replace_column(batch, self.prefix + "lat",
                               pa.array(lat, type=pa.float64()))
        batch = replace_column(batch, self.prefix + "lon",
                               pa.array(lon, type=pa.float64()))
        return batch


@register("const_enrich")
class ConstEnrichStage(Stage):
    """aws-filter style: append constant metadata columns."""

    def __init__(self, values: dict[str, str], **kw):
        super().__init__(**kw)
        self.values = values

    def transform(self, batch: pa.Table, mask: np.ndarray) -> pa.Table:
        for k, v in self.values.items():
            batch = replace_column(
                batch, k, pa.array([v] * batch.num_rows, type=pa.string()))
        return batch
