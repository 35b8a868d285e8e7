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
import pyarrow as pa
import pyarrow.compute as pc

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
        # dictionary-encode the key column: the lookup runs once per
        # UNIQUE key, then fans out via take (no per-row Python objects)
        col = batch.column(self.lookup_key)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        dic = pc.dictionary_encode(col)
        uniq = dic.dictionary.to_pylist()
        indices = dic.indices
        all_masked = bool(mask.all())
        for f in self.add_fields:
            typ = self.dtypes[f]
            is_str = pa.types.is_string(typ) or pa.types.is_large_string(typ)
            miss = UNKNOWN if is_str else None
            lut = pa.array([self.maps[f].get(u, miss) if u is not None else miss
                            for u in uniq], type=pa.string() if is_str else typ)
            vals = lut.take(indices)
            if not all_masked:
                keepers = pa.array(mask)
                vals = pc.if_else(keepers, vals,
                                  pa.scalar(miss, type=vals.type))
            batch = replace_column(batch, self.prefix + f, vals)
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
        col = batch.column(self.lookup_key)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        # dictionary-encode: the regex table runs once per UNIQUE agent
        # string (low cardinality), then fans out via take
        dic = pc.dictionary_encode(col)
        uniq = dic.dictionary.to_pylist()
        luts = {"browser": [], "os": [], "device": []}
        for v in uniq:
            hit = (UNKNOWN, UNKNOWN, UNKNOWN)
            if isinstance(v, str) and v:
                for rx, b, o, d in self.rules:  # first match wins
                    if rx.search(v):
                        hit = (b, o, d)
                        break
            luts["browser"].append(hit[0])
            luts["os"].append(hit[1])
            luts["device"].append(hit[2])
        all_masked = bool(mask.all())
        for name, lut in luts.items():
            vals = pa.array(lut, type=pa.string()).take(dic.indices)
            vals = pc.fill_null(vals, UNKNOWN)
            if not all_masked:
                vals = pc.if_else(pa.array(mask), vals, pa.scalar(UNKNOWN))
            batch = replace_column(batch, self.prefix + name, vals)
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
        col = batch.column(self.lookup_key)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        # vectorized prefix extraction, then per-unique-prefix lookup
        # (≤256 uniques: "A.B." prefixes)
        pref = pc.extract_regex(col.cast(pa.string()),
                                pattern=r"^(?P<p>\d+\.\d+\.)")
        pref_vals = pc.if_else(pc.is_valid(pref),
                               pc.struct_field(pref, "p"),
                               pa.scalar(None, type=pa.string()))
        dic = pc.dictionary_encode(pref_vals)
        uniq = dic.dictionary.to_pylist()
        all_masked = bool(mask.all())
        specs = [("city", 0, pa.string(), UNKNOWN),
                 ("country", 1, pa.string(), UNKNOWN),
                 ("lat", 2, pa.float64(), None),
                 ("lon", 3, pa.float64(), None)]
        for name, slot, typ, miss in specs:
            lut = pa.array(
                [self.table[u][slot] if (u is not None and u in self.table)
                 else miss for u in uniq], type=typ)
            vals = lut.take(dic.indices)
            if miss is not None:
                vals = pc.fill_null(vals, miss)
            if not all_masked:
                vals = pc.if_else(pa.array(mask), vals,
                                  pa.scalar(miss, type=typ))
            batch = replace_column(batch, self.prefix + name, vals)
        return batch


# default mirrors the kube tag shape <prefix><pod>_<namespace>_<container>
# (reference plugins/filter_kubernetes/kube_regex.h tag capture)
KUBE_TAG_REGEX = (r"(?P<pod_name>[a-z0-9][-a-z0-9.]*)_"
                  r"(?P<namespace>[^_]+)_(?P<container>.+)$")


@register("kubernetes_enrich")
class KubernetesEnrichStage(Stage):
    """kubernetes filter semantics (reference plugins/filter_kubernetes):

    - tag → pod/namespace/container parse (kube_meta.c tag regex via
      ``Kube_Tag_Prefix``; kubernetes.c:446-466 meta fetch);
    - metadata lookup keyed on "namespace:pod" with a **TTL cache**:
      the reference caches API-server results in an flb_hash with
      time-based eviction (src/flb_hash.c:42-172, entry->created_at
      check); here the actor reloads the dimension source when it is
      older than ``ttl_s`` — a changing dimension table is picked up
      after at most TTL seconds, per actor;
    - ``merge_log``: parse the record's ``log`` field as JSON and splat
      its keys into the fields map; ``keep_log`` keeps/drops the
      original (kubernetes.c:239-268 merge_log_handler).

    ``loader`` is a callable returning ``{"ns:pod": {field: value}}``
    (the API-server stand-in); ``dim_path`` reads that mapping from a
    JSON file instead (tests rewrite the file mid-run).
    """

    def __init__(self, loader=None, dim_path: str | None = None,
                 ttl_s: float = 60.0, tag_regex: str = KUBE_TAG_REGEX,
                 merge_log: bool = False, keep_log: bool = True,
                 prefix: str = "kube_", **kw):
        super().__init__(**kw)
        import time as _time
        self._time = _time
        if loader is None:
            if dim_path is None:
                raise ValueError("need loader or dim_path")

            def loader():
                import json as _json
                with open(dim_path) as fh:
                    return _json.load(fh)
        self.loader = loader
        self.ttl_s = ttl_s
        self.tag_regex = tag_regex
        self.merge_log = merge_log
        self.keep_log = keep_log
        self.prefix = prefix
        self.meta = loader()  # once per actor; refreshed on TTL expiry
        self.loaded_at = self._time.monotonic()
        self.add_fields = sorted({f for v in self.meta.values() for f in v})

    def _maybe_reload(self):
        if self._time.monotonic() - self.loaded_at > self.ttl_s:
            self.meta = self.loader()
            self.loaded_at = self._time.monotonic()
            self.add_fields = sorted({f for v in self.meta.values()
                                      for f in v})

    def transform(self, batch: pa.Table, mask: np.ndarray) -> pa.Table:
        from ..record import TAG_COL
        self._maybe_reload()
        if TAG_COL not in batch.column_names:
            return batch
        col = batch.column(TAG_COL)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        # one regex pass per UNIQUE tag, fan out via take
        dic = pc.dictionary_encode(col)
        uniq = dic.dictionary
        st = pc.extract_regex(uniq, pattern=self.tag_regex)
        ok = pc.is_valid(st)
        all_masked = bool(mask.all())
        keepers = None if all_masked else pa.array(mask)

        def emit(name, lut):
            vals = lut.take(dic.indices)
            if keepers is not None:
                vals = pc.if_else(keepers, vals,
                                  pa.scalar(None, type=pa.string()))
            return replace_column(batch, self.prefix + name, vals)

        parts = {}
        for name in ("pod_name", "namespace", "container"):
            vals = pc.if_else(ok, pc.struct_field(st, name),
                              pa.scalar(None, type=pa.string()))
            parts[name] = vals
            batch = emit(name, vals)
        ns = parts["namespace"].to_pylist()
        pod = parts["pod_name"].to_pylist()
        for f in self.add_fields:
            lut = pa.array(
                [self.meta.get(f"{n}:{p}", {}).get(f) if n is not None
                 else None for n, p in zip(ns, pod)], type=pa.string())
            batch = emit(f, lut)
        if self.merge_log:
            batch = self._merge_log(batch, mask)
        return batch

    def _merge_log(self, batch: pa.Table, mask: np.ndarray) -> pa.Table:
        import json as _json

        from .base import decode_fields_subset, scatter_fields
        from ..record import FIELDS_COL
        if FIELDS_COL not in batch.column_names:
            return batch
        has_log = pc.match_substring(
            batch.column(FIELDS_COL).combine_chunks(), '"log"')
        m = pc.fill_null(has_log, False).to_numpy(zero_copy_only=False) & mask
        if not m.any():
            return batch
        idx = np.nonzero(m)[0]
        dicts = decode_fields_subset(batch, idx)
        changed_idx, changed = [], []
        for i, d in zip(idx, dicts):
            v = d.get("log")
            if not isinstance(v, str) or not v.lstrip().startswith("{"):
                continue
            try:
                obj = _json.loads(v)
            except ValueError:
                continue
            if not isinstance(obj, dict):
                continue
            if not self.keep_log:
                del d["log"]
            d.update(obj)
            changed_idx.append(i)
            changed.append(d)
        if changed_idx:
            batch = scatter_fields(batch, np.array(changed_idx), changed)
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
