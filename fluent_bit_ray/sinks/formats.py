"""Record→wire formatters and file sinks.

Only the FORMAT functions of the reference's outputs carry semantics
(transports are replaced by files — SURVEY §2.2):
- out_file json / csv / ltsv / template formats
  (reference plugins/out_file/file.c:89-145; csv :145);
- out_stdout json_lines (stdout.c:54-79);
- out_es bulk format with logstash-style daily index names
  (reference plugins/out_es/es.c:252-320) — emitted as bulk-JSON
  lines, no network.

``format_batch`` turns one Arrow batch into a list of output lines;
``write_sink`` streams a Dataset through it to per-block text files
(resumable layout: one file per block under the sink directory).
"""

from __future__ import annotations

import json
import os

import pyarrow as pa

from ..record import FIELDS_COL, fields_loads, translate

_ENVELOPE = ("conv_id", "turn_idx", "role", "text", "tool")


def _row_map(b: pa.Table, i: int, cols: dict) -> dict:
    """Record map view: fixed columns + decoded dynamic fields."""
    m = {c: cols[c][i] for c in cols if c not in (FIELDS_COL, "ts", "event_ts")}
    f = cols.get(FIELDS_COL)
    if f is not None:
        m.update(fields_loads(f[i]))
    return m


def format_batch(b: pa.Table, fmt: str = "json", template: str = "",
                 csv_columns: list[str] | None = None,
                 es_index_prefix: str = "logstash",
                 es_generate_id: bool = False) -> list[str]:
    cols = {c: b.column(c).to_pylist() for c in b.column_names}
    n = b.num_rows
    ts = cols.get("ts", [None] * n)
    out = []
    if fmt == "json":
        for i in range(n):
            m = _row_map(b, i, cols)
            rec = {"date": str(ts[i]) if ts[i] is not None else None, **m}
            out.append(json.dumps(rec, separators=(",", ":"), default=str))
    elif fmt == "csv":
        sel = csv_columns or [c for c in _ENVELOPE if c in cols]
        for i in range(n):
            vals = []
            for c in sel:
                v = cols[c][i]
                s = "" if v is None else str(v)
                if "," in s or '"' in s:
                    s = '"' + s.replace('"', '""') + '"'
                vals.append(s)
            out.append(",".join(vals))
    elif fmt == "ltsv":
        for i in range(n):
            m = _row_map(b, i, cols)
            out.append("\t".join(f"{k}:{v}" for k, v in m.items()))
    elif fmt == "template":
        for i in range(n):
            row = {c: cols[c][i] for c in cols if c != FIELDS_COL}
            row[FIELDS_COL] = fields_loads(cols[FIELDS_COL][i]) \
                if FIELDS_COL in cols else {}
            out.append(translate(template, row))
    elif fmt == "plot":
        # out_plot: "epoch value" pairs for gnuplot (reference
        # plugins/out_plot) — value key defaults to the first numeric
        value_key = csv_columns[0] if csv_columns else None
        for i in range(n):
            m = _row_map(b, i, cols)
            v = m.get(value_key) if value_key else next(
                (x for x in m.values() if isinstance(x, (int, float))
                 and not isinstance(x, bool)), "")
            t = ts[i]
            epoch = int(t.timestamp()) if hasattr(t, "timestamp") else ""
            out.append(f"{epoch} {v}")
    elif fmt == "es_bulk":
        for i in range(n):
            m = _row_map(b, i, cols)
            t = ts[i]
            day = (str(t)[:10].replace("-", ".")
                   if t is not None else "0000.00.00")
            m["@timestamp"] = str(t)
            src = json.dumps(m, separators=(",", ":"), default=str)
            action: dict = {"_index": f"{es_index_prefix}-{day}",
                            "_type": "_doc"}
            if es_generate_id:
                # Generate_ID: murmur3(serialized record, seed 42) →
                # stable _id (reference es.c:488-489)
                from .murmur3 import murmur3_id
                action["_id"] = murmur3_id(src.encode("utf-8"))
            out.append(json.dumps({"index": action}))
            out.append(src)
    else:
        raise ValueError(f"unknown format {fmt!r}")
    return out


def write_sink(ds, outdir: str, fmt: str = "json", **fmt_kw) -> int:
    """Stream a Dataset to per-block text files; returns rows written."""
    os.makedirs(outdir, exist_ok=True)

    def write_block(b: pa.Table, task_ctx=None) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"n": pa.array([0], type=pa.int64())})
        lines = format_batch(b, fmt=fmt, **fmt_kw)
        key = abs(hash(tuple(lines[:1] + [len(lines)]))) % (1 << 32)
        path = os.path.join(outdir, f"part-{key:08x}-{b.num_rows}.txt")
        with open(path, "w") as f:
            f.write("\n".join(lines) + "\n")
        return pa.table({"n": pa.array([b.num_rows], type=pa.int64())})

    parts = ds.map_batches(write_block, batch_format="pyarrow",
                           batch_size=65536)
    return sum(r["n"] for r in parts.take_all())
