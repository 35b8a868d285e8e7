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
        maps = np.full(k, None, dtype=object)    # dict-path parsed maps
        jsons = np.full(k, None, dtype=object)   # vector-path fields JSON
        vec_promoted = {key: np.full(k, None, dtype=object)
                        for key in self.promote}
        hit_name = np.full(k, "", dtype=object)
        times = np.full(k, np.datetime64("NaT"), dtype="datetime64[ns]")
        remaining = pa.compute.is_valid(src_arr).to_numpy(zero_copy_only=False).copy()
        for p in self.parsers:
            if not remaining.any():
                break
            sub = np.nonzero(remaining)[0]
            sub_arr = (src_arr if len(sub) == len(remaining)
                       else src_arr.take(pa.array(sub)))
            pf = getattr(p, "prefilter", None)
            if pf is not None:
                # cheap superset scan: rows failing it cannot match this
                # parser, so they stay `remaining` for the next one
                kind, lit = pf
                if kind == "prefix":
                    cm = pa.compute.starts_with(sub_arr, pattern=lit)
                else:
                    cm = pa.compute.match_substring(sub_arr, pattern=lit)
                cm = pa.compute.fill_null(cm, False) \
                    .to_numpy(zero_copy_only=False)
                if not cm.any():
                    continue
                sub = sub[cm]
                sub_arr = sub_arr.filter(pa.array(cm))
            vec = (p.vector_parse(sub_arr, promote_keys=tuple(self.promote))
                   if self.emit_fields and hasattr(p, "vector_parse")
                   else None)
            if vec is not None:
                hit_mask, json_strs, sub_times, promoted = vec
                hits = sub[hit_mask]
                if len(hits):
                    jsons[hits] = np.fromiter(json_strs, dtype=object,
                                              count=len(hits))
                    hit_name[hits] = p.name
                    times[hits] = sub_times
                    for key, vals in promoted.items():
                        va = np.fromiter(vals, dtype=object, count=len(hits))
                        m2 = va != None  # noqa: E711 — elementwise on object
                        vec_promoted[key][hits[m2]] = va[m2]
                remaining[sub] = remaining[sub] & ~hit_mask
                continue
            sub_maps, sub_times = p.parse_column(sub_arr)
            ma = np.fromiter(sub_maps, dtype=object, count=len(sub))
            mhit = ma != None  # noqa: E711
            hits = sub[mhit]
            if len(hits):
                maps[hits] = ma[mhit]
                hit_name[hits] = p.name
                times[hits] = sub_times[mhit]
                remaining[hits] = False

        # event_ts: parsed time, else prior event_ts, else ts
        batch = self._merge_event_ts(batch, idx, times)

        # parsed_by column
        if "parsed_by" in batch.column_names:
            pb = np.fromiter(batch.column("parsed_by").to_pylist(),
                             dtype=object, count=n)
        else:
            pb = np.full(n, "", dtype=object)
        named = hit_name != ""
        pb[idx[named]] = hit_name[named]
        batch = replace_column(batch, "parsed_by", pa.array(pb, type=pa.string()))

        has_map = maps != None  # noqa: E711
        # promoted typed columns (vectorized downstream fast path)
        if self.promote:
            _MISS = object()
            pcols = {}
            for key in self.promote:
                if f"p_{key}" in batch.column_names:
                    pcols[key] = np.fromiter(
                        batch.column(f"p_{key}").to_pylist(),
                        dtype=object, count=n)
                else:
                    pcols[key] = np.full(n, None, dtype=object)
            pkeys = list(self.promote)
            if has_map.any():  # dict-path rows: one pass over maps
                mrows = np.nonzero(has_map)[0]
                for j in mrows:
                    m = maps[j]
                    i = idx[j]
                    for key in pkeys:
                        v = m.get(key, _MISS)
                        if v is not _MISS:
                            pcols[key][i] = v
            for key in pkeys:  # vector-path promoted values
                vp = vec_promoted[key]
                m2 = vp != None  # noqa: E711
                pcols[key][idx[m2]] = vp[m2]
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

        # merge parsed output into the fields column. Vector-path rows
        # with no prior fields (the common case) are a bulk numpy
        # assignment; only rows needing a real merge loop in Python.
        if FIELDS_COL in batch.column_names:
            fcol = np.fromiter(batch.column(FIELDS_COL).to_pylist(),
                               dtype=object, count=n)
        else:
            fcol = np.full(n, "", dtype=object)
        jmask = jsons != None  # noqa: E711
        prior = np.fromiter((bool(v) for v in fcol[idx]), dtype=bool, count=k)
        easy = (jmask & ~prior) if self.reserve_data else jmask
        fcol[idx[easy]] = jsons[easy]
        slow = np.nonzero((jmask & ~easy) | has_map)[0]
        for j in slow:
            i = idx[j]
            m = maps[j]
            if jsons[j] is not None:
                if not (self.reserve_data and fcol[i]):
                    fcol[i] = jsons[j]
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
        hit_t = ~np.isnat(times)
        ev[idx[hit_t]] = times[hit_t]
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
