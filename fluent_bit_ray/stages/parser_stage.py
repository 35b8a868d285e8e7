"""parser filter — parse one source field with N named parsers.

Reference plugins/filter_parser/filter_parser.c:181-350:
- parsers tried in config order, FIRST success wins per record;
- ``reserve_data``: keep the record's other fields (else the map is
  replaced by the parsed keys);
- ``preserve_key``: keep the parsed source key (else drop it — applies
  to dynamic fields keys only here: fixed transcript columns, above
  all ``text``, are never dropped — per-turn text-equality invariant);
- a parser-extracted time overrides the record time: we emit/refresh
  an ``event_ts`` column (original ``ts`` is never overwritten);
- parser miss keeps the record untouched (filter_parser.c:330-333).

Engine extensions (documented, not in the reference):
- ``parsed_by`` string column records which parser hit ("" = miss);
- ``promote``: {parsed_key: "int64"|"float64"|"string"} lifts chosen
  parsed fields into typed top-level columns (vectorized fast path so
  downstream aggregates never re-decode the JSON fields map);
- ``emit_fields=False`` skips JSON-encoding the parsed map when only
  promoted columns are needed (hot-path option).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..parsers import build_parser
from ..record import FIELDS_COL, fields_dumps, fields_loads
from .base import Stage, register, replace_column

_PROMOTE_TYPES = {"int64": pa.int64(), "float64": pa.float64(),
                  "string": pa.string(), "bool": pa.bool_()}


@register("parser")
class ParserStage(Stage):
    def __init__(self, parsers: list[dict], key_name: str = "text",
                 reserve_data: bool = True, preserve_key: bool = True,
                 promote: dict[str, str] | None = None,
                 emit_fields: bool = True, **kw):
        super().__init__(**kw)
        self.parsers = [build_parser(s) for s in parsers]
        self.key_name = key_name
        self.reserve_data = reserve_data
        self.preserve_key = preserve_key
        self.promote = promote or {}
        self.emit_fields = emit_fields

    def transform(self, batch: pa.Table, mask: np.ndarray) -> pa.Table:
        n = batch.num_rows
        idx = np.nonzero(mask)[0]

        # source values for masked rows — kept as Arrow; only parser
        # subsets materialize Python objects (allocator churn is the
        # scaling bottleneck on many-core nodes)
        full = len(idx) == n
        if self.key_name in batch.column_names:
            src_arr = batch.column(self.key_name).combine_chunks()
            if not full:  # avoid a full-column copy when every row matches
                src_arr = src_arr.take(pa.array(idx))
            src_arr = src_arr.cast(pa.string())
            src_is_fixed = True
        else:
            src_is_fixed = False
            if FIELDS_COL in batch.column_names:
                fv = batch.column(FIELDS_COL).take(pa.array(idx)).to_pylist()
                decoded = [fields_loads(v) for v in fv]
            else:
                decoded = [{} for _ in idx]
            src_arr = pa.array([d.get(self.key_name) for d in decoded],
                               type=pa.string())

        k = len(idx)
        maps: list[dict | None] = [None] * k
        jsons: list[str | None] = [None] * k  # vector-path fields JSON
        vec_promoted: dict[str, list] = {key: [None] * k
                                         for key in self.promote}
        hit_name = [""] * k
        times = np.full(k, np.datetime64("NaT"), dtype="datetime64[ns]")
        remaining = pa.compute.is_valid(src_arr).to_numpy(zero_copy_only=False).copy()
        for p in self.parsers:
            if not remaining.any():
                break
            sub = np.nonzero(remaining)[0]
            sub_arr = src_arr.take(pa.array(sub))
            vec = (p.vector_parse(sub_arr, promote_keys=tuple(self.promote))
                   if self.emit_fields and hasattr(p, "vector_parse")
                   else None)
            if vec is not None:
                hit_mask, json_strs, sub_times, promoted = vec
                hits = sub[hit_mask]
                for j, i in enumerate(hits):
                    jsons[i] = json_strs[j]
                    hit_name[i] = p.name
                    times[i] = sub_times[j]
                for key, vals in promoted.items():
                    dst = vec_promoted[key]
                    for j, i in enumerate(hits):
                        if vals[j] is not None:
                            dst[i] = vals[j]
                remaining[sub] = remaining[sub] & ~hit_mask
                continue
            sub_maps, sub_times = p.parse_column(sub_arr)
            for j, i in enumerate(sub):
                if sub_maps[j] is not None:
                    maps[i] = sub_maps[j]
                    hit_name[i] = p.name
                    times[i] = sub_times[j]
                    remaining[i] = False

        # event_ts: parsed time, else prior event_ts, else ts
        batch = self._merge_event_ts(batch, idx, times)

        # parsed_by column
        pb = (batch.column("parsed_by").to_pylist()
              if "parsed_by" in batch.column_names else [""] * n)
        for j, i in enumerate(idx):
            if hit_name[j]:
                pb[i] = hit_name[j]
        batch = replace_column(batch, "parsed_by", pa.array(pb, type=pa.string()))

        # promoted typed columns (vectorized downstream fast path);
        # single pass over parsed maps for all promoted keys
        if self.promote:
            _MISS = object()
            pcols = {key: (batch.column(f"p_{key}").to_pylist()
                           if f"p_{key}" in batch.column_names else [None] * n)
                     for key in self.promote}
            pkeys = list(self.promote)
            for j, i in enumerate(idx):
                m = maps[j]
                if m is None:
                    continue
                for key in pkeys:
                    v = m.get(key, _MISS)
                    if v is not _MISS:
                        pcols[key][i] = v
            for key in pkeys:  # overlay vector-path promoted values
                vp = vec_promoted[key]
                col = pcols[key]
                for j, i in enumerate(idx):
                    if vp[j] is not None:
                        col[i] = vp[j]
            for key, typ_name in self.promote.items():
                typ = _PROMOTE_TYPES[typ_name]
                col = pcols[key]
                try:
                    arr = pa.array(col, type=typ)
                except (pa.ArrowInvalid, pa.ArrowTypeError):
                    arr = pa.array([_coerce(v, typ_name) for v in col],
                                   type=typ)
                batch = replace_column(batch, f"p_{key}", arr)

        if not self.emit_fields:
            return batch

        # merge parsed map into the fields column
        fcol = (batch.column(FIELDS_COL).to_pylist()
                if FIELDS_COL in batch.column_names else [""] * n)
        for j, i in enumerate(idx):
            m = maps[j]
            if m is None and jsons[j] is None:
                continue  # miss → record untouched
            if jsons[j] is not None:
                if not (self.reserve_data and fcol[i]):
                    fcol[i] = jsons[j]  # vector path: JSON already built
                    continue
                m = fields_loads(jsons[j])  # rare: merge with prior fields
            if self.reserve_data and fcol[i]:
                orig = fields_loads(fcol[i])
                if (not src_is_fixed and not self.preserve_key
                        and self.key_name in orig):
                    del orig[self.key_name]
                out = dict(m)
                for kk, vv in orig.items():
                    if kk not in out:
                        out[kk] = vv
            else:
                out = m  # no prior fields → parsed map is the map
            fcol[i] = fields_dumps(out)
        return replace_column(batch, FIELDS_COL,
                              pa.array(fcol, type=pa.large_string()))

    def _merge_event_ts(self, batch: pa.Table, idx, times) -> pa.Table:
        if "event_ts" in batch.column_names:
            ev = batch.column("event_ts").cast(pa.timestamp("ns")).to_pandas() \
                .to_numpy(dtype="datetime64[ns]", copy=True)
        elif "ts" in batch.column_names:
            ev = batch.column("ts").cast(pa.timestamp("ns")).to_pandas() \
                .to_numpy(dtype="datetime64[ns]", copy=True)
        else:
            ev = np.full(batch.num_rows, np.datetime64("NaT"), dtype="datetime64[ns]")
        for j, i in enumerate(idx):
            if not np.isnat(times[j]):
                ev[i] = times[j]
        return replace_column(batch, "event_ts",
                              pa.array(ev, type=pa.timestamp("ns")))


def _coerce(v, typ_name: str):
    if v is None:
        return None
    try:
        if typ_name == "int64":
            return int(v)
        if typ_name == "float64":
            return float(v)
        if typ_name == "bool":
            return bool(v)
        return str(v)
    except (ValueError, TypeError):
        return None
