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
import struct
import uuid

import pyarrow as pa

from ..record import FIELDS_COL, fields_loads, translate

try:  # orjson: same fast path the parsers use, for the write side
    import orjson as _orjson
except ImportError:  # pragma: no cover
    _orjson = None

_ENVELOPE = ("conv_id", "turn_idx", "role", "text", "tool")


def _dumps(obj) -> str:
    if _orjson is not None:
        try:
            return _orjson.dumps(obj).decode()
        except TypeError:
            pass
    return json.dumps(obj, separators=(",", ":"), default=str)


# ---------------------------------------------------------------- msgpack
def msgpack_pack(obj) -> bytes:
    """Minimal msgpack encoder (format spec: msgpack.org; the reference
    stores every record as msgpack ``[timestamp, map]``, out_file's
    msgpack format dumps those bytes raw — file.c:89-99)."""
    out = bytearray()
    _mp(obj, out)
    return bytes(out)


def msgpack_unpack_stream(data: bytes) -> list:
    """Decode a concatenated msgpack stream → list of objects (the
    in_forward wire / out_file-msgpack on-disk shape: back-to-back
    ``[timestamp, map]`` records, fw_prot.c:229-240)."""
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        obj, pos = _mu(data, pos)
        out.append(obj)
    return out


def _mu(d: bytes, p: int):
    b = d[p]
    p += 1
    if b <= 0x7F:
        return b, p
    if b >= 0xE0:
        return b - 0x100, p
    if 0xA0 <= b <= 0xBF:
        n = b & 0x1F
        return d[p:p + n].decode("utf-8"), p + n
    if 0x90 <= b <= 0x9F:
        return _mu_seq(d, p, b & 0x0F)
    if 0x80 <= b <= 0x8F:
        return _mu_map(d, p, b & 0x0F)
    if b == 0xC0:
        return None, p
    if b == 0xC2:
        return False, p
    if b == 0xC3:
        return True, p
    if b == 0xCA:
        return struct.unpack_from(">f", d, p)[0], p + 4
    if b == 0xCB:
        return struct.unpack_from(">d", d, p)[0], p + 8
    if b in (0xCC, 0xCD, 0xCE, 0xCF):
        w = 1 << (b - 0xCC)
        return int.from_bytes(d[p:p + w], "big"), p + w
    if b in (0xD0, 0xD1, 0xD2, 0xD3):
        w = 1 << (b - 0xD0)
        return int.from_bytes(d[p:p + w], "big", signed=True), p + w
    if b in (0xD9, 0xDA, 0xDB):
        w = 1 << (b - 0xD9)
        n = int.from_bytes(d[p:p + w], "big")
        p += w
        return d[p:p + n].decode("utf-8"), p + n
    if b in (0xC4, 0xC5, 0xC6):
        w = 1 << (b - 0xC4)
        n = int.from_bytes(d[p:p + w], "big")
        p += w
        return bytes(d[p:p + n]), p + n
    if b in (0xDC, 0xDD):
        w = 2 << (b - 0xDC)
        n = int.from_bytes(d[p:p + w], "big")
        return _mu_seq(d, p + w, n)
    if b in (0xDE, 0xDF):
        w = 2 << (b - 0xDE)
        n = int.from_bytes(d[p:p + w], "big")
        return _mu_map(d, p + w, n)
    if 0xD4 <= b <= 0xD8:  # fixext 1/2/4/8/16
        n = 1 << (b - 0xD4)
        return _mu_ext(d, p, n)
    if b in (0xC7, 0xC8, 0xC9):  # ext 8/16/32
        w = 1 << (b - 0xC7)
        n = int.from_bytes(d[p:p + w], "big")
        return _mu_ext(d, p + w, n)
    raise ValueError(f"unsupported msgpack byte 0x{b:02x} at {p - 1}")


def _mu_ext(d: bytes, p: int, n: int):
    """Ext family decode. Type 0 with 8 payload bytes is fluent-bit /
    fluentd EventTime (fw_prot.c: big-endian seconds + nanoseconds) →
    epoch float; other ext types come back as (type, raw bytes)."""
    typ = struct.unpack_from(">b", d, p)[0]
    p += 1
    payload = bytes(d[p:p + n])
    if typ == 0 and n == 8:
        sec, nsec = struct.unpack(">II", payload)
        return sec + nsec / 1e9, p + n
    return (typ, payload), p + n


def _mu_seq(d: bytes, p: int, n: int):
    out = []
    for _ in range(n):
        v, p = _mu(d, p)
        out.append(v)
    return out, p


def _mu_map(d: bytes, p: int, n: int):
    out = {}
    for _ in range(n):
        k, p = _mu(d, p)
        v, p = _mu(d, p)
        out[k] = v
    return out, p


def _mp(o, out: bytearray) -> None:
    if o is None:
        out.append(0xC0)
    elif o is True:
        out.append(0xC3)
    elif o is False:
        out.append(0xC2)
    elif isinstance(o, int):
        if 0 <= o < 0x80:
            out.append(o)
        elif -32 <= o < 0:
            out.append(o & 0xFF)
        elif 0 <= o <= 0xFFFFFFFFFFFFFFFF:
            out.append(0xCF)
            out += struct.pack(">Q", o)
        elif -(1 << 63) <= o < 0:
            out.append(0xD3)
            out += struct.pack(">q", o)
        else:  # bignum outside msgpack's 64-bit range: degrade to str
            _mp(str(o), out)
    elif isinstance(o, float):
        out.append(0xCB)
        out += struct.pack(">d", o)
    elif isinstance(o, str):
        b = o.encode("utf-8")
        n = len(b)
        if n < 32:
            out.append(0xA0 | n)
        elif n < 0x100:
            out += bytes((0xD9, n))
        elif n < 0x10000:
            out.append(0xDA)
            out += struct.pack(">H", n)
        else:
            out.append(0xDB)
            out += struct.pack(">I", n)
        out += b
    elif isinstance(o, (bytes, bytearray)):
        n = len(o)
        if n < 0x100:
            out += bytes((0xC4, n))
        elif n < 0x10000:
            out.append(0xC5)
            out += struct.pack(">H", n)
        else:
            out.append(0xC6)
            out += struct.pack(">I", n)
        out += o
    elif isinstance(o, (list, tuple)):
        n = len(o)
        if n < 16:
            out.append(0x90 | n)
        elif n < 0x10000:
            out.append(0xDC)
            out += struct.pack(">H", n)
        else:
            out.append(0xDD)
            out += struct.pack(">I", n)
        for v in o:
            _mp(v, out)
    elif isinstance(o, dict):
        n = len(o)
        if n < 16:
            out.append(0x80 | n)
        elif n < 0x10000:
            out.append(0xDE)
            out += struct.pack(">H", n)
        else:
            out.append(0xDF)
            out += struct.pack(">I", n)
        for k, v in o.items():
            _mp(k if isinstance(k, (str, int, float, bool)) else str(k), out)
            _mp(v, out)
    else:
        _mp(str(o), out)


def _row_map(b: pa.Table, i: int, cols: dict) -> dict:
    """Record map view: fixed columns + decoded dynamic fields."""
    m = {c: cols[c][i] for c in cols if c not in (FIELDS_COL, "ts", "event_ts")}
    f = cols.get(FIELDS_COL)
    if f is not None:
        m.update(fields_loads(f[i]))
    return m


def _mp_print(o) -> str:
    """msgpack-c's ``msgpack_object_print`` rendering
    (reference lib/msgpack-c/src/objectc.c msgpack_object_print_buffer):
    maps as ``{"k"=>v, ...}``, strings quoted UNescaped (the C prints
    ``%.*s`` raw), floats via printf ``%f`` (6 decimals), nil / true /
    false literals. Used by out_slack's payload composer
    (plugins/out_slack/slack.c:186)."""
    if o is None:
        return "nil"
    if o is True:
        return "true"
    if o is False:
        return "false"
    if isinstance(o, float):
        return f"{o:f}"
    if isinstance(o, int):
        return str(o)
    if isinstance(o, str):
        return f'"{o}"'
    if isinstance(o, (bytes, bytearray)):
        return '"' + bytes(o).decode("utf-8", "replace") + '"'
    if isinstance(o, (list, tuple)):
        return "[" + ", ".join(_mp_print(x) for x in o) + "]"
    if isinstance(o, dict):
        return "{" + ", ".join(f"{_mp_print(k)}=>{_mp_print(v)}"
                               for k, v in o.items()) + "}"
    return str(o)


def _fmt_date(t, date_format: str):
    """out_stdout json_date_format variants (stdout.c:54-79,
    flb_pack date renderers): default = str, double = epoch seconds
    as float, iso8601 = %Y-%m-%dT%H:%M:%S.%fZ (microseconds)."""
    if t is None:
        return None
    if date_format == "double":
        return t.timestamp() if hasattr(t, "timestamp") else float(t)
    if date_format == "iso8601":
        if hasattr(t, "strftime"):
            return t.strftime("%Y-%m-%dT%H:%M:%S.%f") + "Z"
        return str(t)
    return str(t)


def format_batch(b: pa.Table, fmt: str = "json", template: str = "",
                 csv_columns: list[str] | None = None,
                 es_index_prefix: str = "logstash",
                 es_generate_id: bool = False,
                 date_format: str = "default",
                 fmt_opts: dict | None = None) -> list[str]:
    cols = {c: b.column(c).to_pylist() for c in b.column_names}
    n = b.num_rows
    ts = cols.get("ts", [None] * n)
    out = []
    if fmt in ("json", "json_stream"):
        # json = one record per line (out_file json); json_stream = the
        # same rendering concatenated with no separator (out_stdout
        # json_stream, stdout.c:54-79 / flb_pack FORMAT_STREAM)
        for i in range(n):
            m = _row_map(b, i, cols)
            rec = {"date": _fmt_date(ts[i], date_format), **m}
            out.append(_dumps(rec))
        if fmt == "json_stream":
            return ["".join(out)] if out else []
    elif fmt == "plain":
        # out_file plain: JSON of the record map alone, no date wrapper
        # (reference plugins/out_file/file.c:308 plain_output)
        for i in range(n):
            out.append(_dumps(_row_map(b, i, cols)))
    elif fmt == "msgpack":
        # out_file msgpack: raw [timestamp, map] msgpack per record
        for i in range(n):
            m = _row_map(b, i, cols)
            t = ts[i]
            epoch = (t.timestamp() if hasattr(t, "timestamp") else 0.0)
            out.append(msgpack_pack([epoch, m]))
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
    elif fmt == "gelf":
        # out_gelf: GELF 1.1 JSON per record — version/host/
        # short_message/timestamp mandatory, every other key prefixed
        # with "_" (reference plugins/out_gelf/gelf.c:49-70 spec note)
        tags = cols.get("tag", [None] * n)
        for i in range(n):
            m = _row_map(b, i, cols)
            t = ts[i]
            # Pick the FIRST present short_message key only; the others
            # stay in m and are emitted below as _-prefixed additional
            # fields (gelf.c keeps non-short_message keys).
            short = ""
            for k in ("text", "message", "msg"):
                if k in m:
                    short = m.pop(k)
                    break
            rec = {"version": "1.1",
                   "host": str(m.pop("host", tags[i] or "engine")),
                   "short_message": str(short),
                   "timestamp": (t.timestamp()
                                 if hasattr(t, "timestamp") else 0.0)}
            for k, v in m.items():
                rec["_" + str(k)] = v
            out.append(_dumps(rec))
    elif fmt == "influx":
        # out_influxdb line protocol: measurement(=tag),seq tag,
        # field set, nanosecond timestamp (reference
        # plugins/out_influxdb/influxdb.c:64-160; sequence tag
        # "_seq" rolls per flush — here per batch, deterministic)
        tags = cols.get("tag", [None] * n)
        for i in range(n):
            m = _row_map(b, i, cols)
            fields = []
            for k, v in m.items():
                ks = str(k).replace(" ", "\\ ").replace(",", "\\,") \
                    .replace("=", "\\=")
                if isinstance(v, bool):
                    fields.append(f"{ks}={'true' if v else 'false'}")
                elif isinstance(v, (int, float)) and v is not None:
                    fields.append(f"{ks}={v}")
                elif v is not None:
                    vs = str(v).replace("\\", "\\\\").replace('"', '\\"')
                    fields.append(f'{ks}="{vs}"')
            t = ts[i]
            ns = (int(t.timestamp() * 1e9)
                  if hasattr(t, "timestamp") else 0)
            meas = str(tags[i] or "records").replace(" ", "\\ ") \
                .replace(",", "\\,")
            out.append(f"{meas},_seq={i + 1} {','.join(fields)} {ns}")
    elif fmt == "loki":
        # out_loki push payload: one JSON per batch — streams grouped
        # by tag, values = [ns_timestamp_string, record_json]
        # (reference plugins/out_loki/loki.c:289-320 pack_labels +
        # payload shape)
        tags = cols.get("tag", [None] * n)
        streams: dict = {}
        for i in range(n):
            m = _row_map(b, i, cols)
            t = ts[i]
            ns = (int(t.timestamp() * 1e9)
                  if hasattr(t, "timestamp") else 0)
            streams.setdefault(str(tags[i] or "records"), []).append(
                [str(ns), _dumps(m)])
        payload = {"streams": [
            {"stream": {"tag": tg}, "values": vals}
            for tg, vals in sorted(streams.items())]}
        out.append(_dumps(payload))
    elif fmt == "splunk":
        # out_splunk HEC envelope: {"time": epoch_double,
        # "event": {record}} per line (reference
        # plugins/out_splunk/splunk.c:56-100 pack_map/pack_event_key)
        for i in range(n):
            m = _row_map(b, i, cols)
            t = ts[i]
            out.append(_dumps({
                "time": (t.timestamp()
                         if hasattr(t, "timestamp") else 0.0),
                "event": m}))
    elif fmt == "syslog5424":
        # out_syslog RFC5424 line:
        # <PRI>1 TIMESTAMP HOSTNAME APPNAME PROCID MSGID - MSG
        # (reference plugins/out_syslog/syslog.c:156-230; severity
        # from the record's level, facility 16 = local0)
        sev = {"emerg": 0, "alert": 1, "crit": 2, "error": 3, "err": 3,
               "warn": 4, "warning": 4, "notice": 5, "info": 6,
               "debug": 7}
        tags = cols.get("tag", [None] * n)
        for i in range(n):
            m = _row_map(b, i, cols)
            t = ts[i]
            stamp = (t.strftime("%Y-%m-%dT%H:%M:%S.%f")[:-3] + "Z"
                     if hasattr(t, "strftime") else "-")
            pri = 16 * 8 + sev.get(str(m.get("level", "")).lower(), 6)
            host = str(m.get("host", tags[i] or "-"))
            app = str(tags[i] or "-").split(".")[0] or "-"
            msg = str(m.get("text", m.get("message", m.get("msg", ""))))
            out.append(f"<{pri}>1 {stamp} {host} {app} - - - {msg}")
    elif fmt == "datadog":
        # out_datadog: one JSON array per batch; each record gets
        # "timestamp" in epoch MILLISECONDS (datadog.c:50-63
        # timestamp_format, rounded), optional tag under tag_key,
        # dd_source→"ddsource", dd_service→"service", the configured
        # message key renamed to "message" (datadog.c:234-243), and
        # container/ECS attrs REMAPPED out of the attr map into the
        # comma-joined "ddtags" string (datadog_remap.c:162-169 table:
        # container_id, container_name [leading / stripped],
        # container_image, ecs_cluster [after "cluster/"],
        # ecs_task_definition [family:revision], ecs_task_arn [after
        # "task/" → task_arn]), concatenated before ctx->dd_tags.
        dd = fmt_opts or {}
        tags = cols.get("tag", [None] * n)
        recs = []
        for i in range(n):
            m = _row_map(b, i, cols)
            t = ts[i]
            ms = (round(t.timestamp() * 1000)
                  if hasattr(t, "timestamp") else 0)
            rec = {dd.get("json_date_key", "timestamp"): ms}
            if dd.get("include_tag_key"):
                rec[dd.get("tag_key", "tag")] = tags[i] or ""
            if dd.get("dd_source"):
                rec["ddsource"] = dd["dd_source"]
            if dd.get("dd_service"):
                rec["service"] = dd["dd_service"]
            remapped = []
            msg_key = dd.get("dd_message_key")
            for k, v in m.items():
                if dd.get("remap") and isinstance(v, str) and v:
                    if k == "container_id":
                        remapped.append(f"container_id:{v}")
                        continue
                    if k == "container_name":
                        remapped.append("container_name:" + v.lstrip("/"))
                        continue
                    if k == "container_image":
                        remapped.append(f"container_image:{v}")
                        continue
                    if k == "ecs_cluster":
                        _, _, name = v.rpartition("cluster/")
                        remapped.append(f"cluster_name:{name}")
                        continue
                    if k == "ecs_task_definition":
                        remapped.append(f"ecs_task_definition:{v}")
                        continue
                    if k == "ecs_task_arn":
                        _, _, arn = v.rpartition("task/")
                        remapped.append(f"task_arn:{arn}")
                        continue
                rec["message" if (msg_key and k == msg_key) else k] = v
            all_tags = ",".join(remapped)
            if dd.get("dd_tags"):
                all_tags = (all_tags + "," + dd["dd_tags"]) if all_tags \
                    else dd["dd_tags"]
            if all_tags:
                rec["ddtags"] = all_tags
            recs.append(rec)
        out.append(_dumps(recs))
    elif fmt == "stackdriver":
        # out_stackdriver: one LogEntry-batch JSON per batch —
        # {"resource": {type, labels}, "entries": [{severity?,
        # jsonPayload, logName: "projects/<proj>/logs/<tag>",
        # timestamp: RFC3339}]} (stackdriver.c:1455-1460 root map,
        # :1732-1736 entry shape, :1838 severity, :1941 logName).
        sd = fmt_opts or {}
        proj = sd.get("project_id", "project")
        sev_map = {"emerg": "EMERGENCY", "alert": "ALERT",
                   "crit": "CRITICAL", "critical": "CRITICAL",
                   "error": "ERROR", "err": "ERROR", "warn": "WARNING",
                   "warning": "WARNING", "notice": "NOTICE",
                   "info": "INFO", "debug": "DEBUG"}
        tags = cols.get("tag", [None] * n)
        entries = []
        for i in range(n):
            m = _row_map(b, i, cols)
            t = ts[i]
            entry: dict = {}
            lvl = str(m.get(sd.get("severity_key", "level"), "")).lower()
            if lvl in sev_map:
                entry["severity"] = sev_map[lvl]
            entry["jsonPayload"] = m
            entry["logName"] = f"projects/{proj}/logs/{tags[i] or 'fb'}"
            entry["timestamp"] = (
                t.strftime("%Y-%m-%dT%H:%M:%S.%f") + "Z"
                if hasattr(t, "strftime") else "1970-01-01T00:00:00Z")
            entries.append(entry)
        out.append(_dumps({
            "resource": {"type": sd.get("resource", "global"),
                         "labels": sd.get("labels", {})},
            "entries": entries}))
    elif fmt == "cloudwatch":
        # out_cloudwatch_logs PutLogEvents payload per batch:
        # {"logGroupName", "logStreamName", "logEvents": [{"timestamp":
        # epoch_ms, "message": record-json}]} with events SORTED by
        # timestamp (cloudwatch_api.c:200-246 init_put_payload,
        # :494-495 qsort compare_events).
        cw = fmt_opts or {}
        events = []
        for i in range(n):
            m = _row_map(b, i, cols)
            t = ts[i]
            ms = (round(t.timestamp() * 1000)
                  if hasattr(t, "timestamp") else 0)
            events.append({"timestamp": ms, "message": _dumps(m)})
        events.sort(key=lambda e: e["timestamp"])
        out.append(_dumps({
            "logGroupName": cw.get("log_group", "fluent-bit"),
            "logStreamName": cw.get("log_stream", "default"),
            "logEvents": events}))
    elif fmt == "nats":
        # out_nats: per tag, one wire payload "PUB <subject> <len>\r\n"
        # + a single JSON array of [ts_double, {"tag": tag, ...record}]
        # pairs (nats.c:102-133 — tag key injected first, subject =
        # the chunk's tag, nats.c:193)
        tags = cols.get("tag", [None] * n)
        by_tag: dict[str, list] = {}
        for i in range(n):
            m = _row_map(b, i, cols)
            t = ts[i]
            epoch = (t.timestamp() if hasattr(t, "timestamp") else 0.0)
            by_tag.setdefault(tags[i] or "", []).append(
                [epoch, {"tag": tags[i] or "", **m}])
        for subject, pairs in by_tag.items():
            body = _dumps(pairs)
            out.append(f"PUB {subject} {len(body.encode())}\r\n{body}")
    elif fmt == "kafka":
        # out_kafka json format: per record, the map with the
        # timestamp injected under timestamp_key (kafka.c:118-152 —
        # double epoch, or iso8601 with microsecond ".%06uZ" suffix)
        kf = fmt_opts or {}
        ts_key = kf.get("timestamp_key", "@timestamp")
        iso = kf.get("timestamp_format") == "iso8601"
        for i in range(n):
            m = _row_map(b, i, cols)
            t = ts[i]
            if iso:
                stamp = (t.strftime("%Y-%m-%dT%H:%M:%S")
                         + f".{t.microsecond:06d}Z"
                         if hasattr(t, "strftime") else "")
            else:
                stamp = (t.timestamp() if hasattr(t, "timestamp") else 0.0)
            out.append(_dumps({ts_key: stamp, **m}))
    elif fmt == "kafka_rest":
        # out_kafka_rest: the WHOLE flush becomes one Kafka REST Proxy
        # body {"records": [{["partition":p,]["key":k,] "value":
        # {time_key: "%Y-%m-%dT%H:%M:%S.%09dZ", [tag_key: tag,]
        # ...record-minus-source_log}}]}
        # (plugins/out_kafka_rest/kafka.c:111-257; defaults
        # kafka.h:24-28 — time_key "@timestamp", tag_key "_flb-key",
        # include_tag_key off, partition -1 = omitted; keys whose
        # first 10 chars case-fold to "source_log" are dropped,
        # kafka.c:196-246 strncasecmp prefix match)
        ko = fmt_opts or {}
        ts_key = ko.get("time_key", "@timestamp")
        ts_fmt = ko.get("time_key_format", "%Y-%m-%dT%H:%M:%S")
        partition = ko.get("partition", -1)
        message_key = ko.get("message_key")
        include_tag = bool(ko.get("include_tag_key", False))
        tag_key = ko.get("tag_key", "_flb-key")
        tags = cols.get("tag", [None] * n)
        records = []
        for i in range(n):
            m = _row_map(b, i, cols)
            t = ts[i]
            v = getattr(t, "value", None)          # pandas ns epoch
            nsec = (v % 10**9) if v is not None else 0
            stamp = ((t.strftime(ts_fmt) if hasattr(t, "strftime")
                      else "") + f".{nsec:09d}Z")
            rec: dict = {}
            if partition is not None and partition >= 0:
                rec["partition"] = int(partition)
            if message_key is not None:
                rec["key"] = message_key
            value: dict = {ts_key: stamp}
            if include_tag:
                value[tag_key] = tags[i] or ""
            for k, val in m.items():
                if str(k)[:10].lower() == "source_log":
                    continue
                value[k] = val
            rec["value"] = value
            records.append(rec)
        if records:
            out.append(_dumps({"records": records}))
    elif fmt == "slack":
        # out_slack: the WHOLE flush becomes one JSON {"text": "..."}
        # where each record renders as '["timestamp": <sec>.<ns09>, '
        # + msgpack_object_print(map) + ']\n'
        # (plugins/out_slack/slack.c:181-197 composes the text,
        # :205-217 wraps it in a 1-key map re-rendered as JSON)
        lines = []
        for i in range(n):
            m = _row_map(b, i, cols)
            t = ts[i]
            v = getattr(t, "value", None)          # pandas ns epoch
            sec, nsec = ((v // 10**9, v % 10**9)
                         if v is not None else (0, 0))
            lines.append(f'["timestamp": {sec}.{nsec:09d}, '
                         f'{_mp_print(m)}]\n')
        if lines:
            out.append(_dumps({"text": "".join(lines)}))
    elif fmt == "td":
        # out_td: msgpack stream of record maps with "time"
        # (int seconds) injected first (plugins/out_td/td.c:112-127)
        for i in range(n):
            m = _row_map(b, i, cols)
            t = ts[i]
            epoch = int(t.timestamp()) if hasattr(t, "timestamp") else 0
            out.append(msgpack_pack({"time": epoch, **m}))
    elif fmt == "bigquery":
        # out_bigquery tableDataInsertAll body: {"kind": ..., "rows":
        # [{"json": record}, ...]} (plugins/out_bigquery/
        # bigquery.c:357-394)
        rows = [{"json": _row_map(b, i, cols)} for i in range(n)]
        if rows:
            out.append(_dumps({
                "kind": "bigquery#tableDataInsertAllRequest",
                "rows": rows}))
    elif fmt == "pgsql":
        # out_pgsql: ONE INSERT per flush — records rendered as a JSON
        # array with the timestamp under timestamp_key (double epoch),
        # inserted through json_array_elements (plugins/out_pgsql/
        # pgsql.c:268-330; FLB_PGSQL_INSERT pgsql.h:39; timestamp_key
        # default "date" pgsql.h:33)
        po = fmt_opts or {}
        table = po.get("table", "fluentbit")
        ts_key = po.get("timestamp_key", "date")
        tags = cols.get("tag", [None] * n)
        recs = []
        for i in range(n):
            m = _row_map(b, i, cols)
            t = ts[i]
            epoch = (t.timestamp() if hasattr(t, "timestamp") else 0.0)
            recs.append({ts_key: epoch, **m})
        if recs:
            tag_sql = "'" + str(tags[0] or "").replace("'", "''") + "'"
            js = _dumps(recs).replace("'", "''")
            out.append(
                f"INSERT INTO {table} SELECT {tag_sql}, "
                f"to_timestamp(CAST(value->>'{ts_key}' as FLOAT)), "
                f"* FROM json_array_elements('{js}');")
    elif fmt == "logdna":
        # out_logdna: {"lines": [...]}; each line promotes level/
        # severity → level, meta, file, app (values copied — the full
        # record still renders under "line"), then integer timestamp
        # and "line" = the record as a JSON STRING
        # (plugins/out_logdna/logdna.c:54-129 primary keys,
        # :132-207 payload composer)
        lo = fmt_opts or {}
        lines = []
        for i in range(n):
            m = _row_map(b, i, cols)
            entry: dict = {}
            for k, v in m.items():
                kl = str(k).lower()
                if kl in ("level", "severity") and "level" not in entry:
                    entry["level"] = v
                elif kl == "meta" and "meta" not in entry:
                    entry["meta"] = v
                elif kl == "file" and "file" not in entry:
                    entry["file"] = v
                elif kl == "app" and "app" not in entry:
                    entry["app"] = v
            # config-level file/app fill in when the record lacks them
            # (logdna.c:110-128)
            if "file" not in entry and lo.get("file"):
                entry["file"] = lo["file"]
            if "app" not in entry and lo.get("app"):
                entry["app"] = lo["app"]
            t = ts[i]
            entry["timestamp"] = (int(t.timestamp())
                                  if hasattr(t, "timestamp") else 0)
            entry["line"] = _dumps(m)
            lines.append(entry)
        if lines:
            out.append(_dumps({"lines": lines}))
    elif fmt == "nrlogs":
        # out_nrlogs (New Relic MELT): [{"common": {...plugin...},
        # "logs": [{"timestamp": ms, "message": <log|message>,
        # "attributes": {rest}}]}] — 'log' preferred over 'message',
        # only the CHOSEN key leaves attributes
        # (plugins/out_nrlogs/newrelic.c:56-135 package_record,
        # :155-230 payload envelope)
        logs = []
        for i in range(n):
            m = _row_map(b, i, cols)
            t = ts[i]
            v = getattr(t, "value", None)
            entry: dict = {"timestamp": (v // 10**6
                                         if v is not None else 0)}
            # a null column value maps to "key absent" in the
            # reference's record map (nulls only exist column-side)
            chosen = ("log" if m.get("log") is not None
                      else "message" if m.get("message") is not None
                      else None)
            if chosen is not None:
                entry["message"] = m[chosen]
            entry["attributes"] = {k: v2 for k, v2 in m.items()
                                   if k != chosen}
            logs.append(entry)
        if logs:
            out.append(_dumps([{
                "common": {"attributes": {"plugin": {
                    "type": "Fluent Bit", "version": "1.7.9"}}},
                "logs": logs}]))
    elif fmt in ("kinesis_streams", "kinesis_firehose"):
        # PutRecords / PutRecordBatch bodies: each record = its JSON
        # (optional time_key appended) + '\n', base64 inside "Data";
        # streams adds "PartitionKey" (plugins/out_kinesis_streams/
        # kinesis_api.c:76-95 header, :310-330 newline, :101-135
        # partition key — reference keys are uuid+clock random; HERE
        # a deterministic djb2(tag)%7919 key so outputs reproduce;
        # firehose_api.c:73-127)
        import base64
        ko = fmt_opts or {}
        name = ko.get("stream", "stream")
        tags = cols.get("tag", [None] * n)
        recs = []
        for i in range(n):
            m = _row_map(b, i, cols)
            if ko.get("time_key"):
                t = ts[i]
                stamp = (t.strftime(ko.get("time_key_format",
                                           "%Y-%m-%dT%H:%M:%S"))
                         if hasattr(t, "strftime") else "")
                m = {**m, ko["time_key"]: stamp}
            data = base64.b64encode((_dumps(m) + "\n").encode()).decode()
            if fmt == "kinesis_streams":
                h = 5381
                for ch in str(tags[i] or ""):
                    h = ((h << 5) + h + ord(ch)) & 0xFFFFFFFFFFFFFFFF
                recs.append({"Data": data,
                             "PartitionKey": str(h % 7919)})
            else:
                recs.append({"Data": data})
        if recs:
            key = ("StreamName" if fmt == "kinesis_streams"
                   else "DeliveryStreamName")
            out.append(_dumps({key: name, "Records": recs}))
    elif fmt == "azure":
        # out_azure Log Analytics body: ONE JSON array, each record
        # with time_key (double epoch) FIRST (plugins/out_azure/
        # azure.c:80-115; default "@timestamp" azure.h:29)
        ao = fmt_opts or {}
        tk = ao.get("time_key", "@timestamp")
        recs = []
        for i in range(n):
            m = _row_map(b, i, cols)
            t = ts[i]
            epoch = (t.timestamp() if hasattr(t, "timestamp") else 0.0)
            recs.append({tk: epoch, **m})
        if recs:
            out.append(_dumps(recs))
    elif fmt == "azure_blob":
        # out_azure_blob: json_lines with ISO8601 date under date_key
        # (plugins/out_azure_blob/azure_blob.c:42-60; default
        # "@timestamp" :562). out_websocket's payload is these same
        # json/json_lines/json_stream/gelf/msgpack renderings
        # (websocket.c:239-243) — no separate formatter needed.
        ao = fmt_opts or {}
        dk = ao.get("date_key", "@timestamp")
        for i in range(n):
            m = _row_map(b, i, cols)
            out.append(_dumps({dk: _fmt_date(ts[i], "iso8601"), **m}))
    elif fmt == "msgpack_debug":
        # out_stdout default (msgpack) format: human-readable
        # "[idx] tag: [epoch, {map json}]" per record, the
        # flb_pack_print rendering stdout.c:54-79 falls back to.
        tags = cols.get("tag", [None] * n)
        for i in range(n):
            m = _row_map(b, i, cols)
            t = ts[i]
            epoch = (t.timestamp() if hasattr(t, "timestamp") else 0.0)
            out.append(f"[{i}] {tags[i] or ''}: [{epoch:.9f}, {_dumps(m)}]")
    elif fmt == "es_bulk":
        for i in range(n):
            m = _row_map(b, i, cols)
            t = ts[i]
            day = (str(t)[:10].replace("-", ".")
                   if t is not None else "0000.00.00")
            m["@timestamp"] = str(t)
            src = _dumps(m)
            action: dict = {"_index": f"{es_index_prefix}-{day}",
                            "_type": "_doc"}
            if es_generate_id:
                # Generate_ID: murmur3(serialized record, seed 42) →
                # stable _id (reference es.c:488-489)
                from .murmur3 import murmur3_id
                action["_id"] = murmur3_id(src.encode("utf-8"))
            out.append(_dumps({"index": action}))
            out.append(src)
    else:
        raise ValueError(f"unknown format {fmt!r}")
    return out


def write_sink(ds, outdir: str, fmt: str = "json",
               batch_size: int = 65536, **fmt_kw) -> int:
    """Stream a Dataset to per-block text files; returns rows written."""
    os.makedirs(outdir, exist_ok=True)

    def write_block(b: pa.Table, task_ctx=None) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"n": pa.array([0], type=pa.int64())})
        lines = format_batch(b, fmt=fmt, **fmt_kw)
        # uuid part names: globally unique, so two blocks with identical
        # leading content can never overwrite each other (a former
        # hash(first_line, len)-derived key could silently collide AND
        # changed per run under PYTHONHASHSEED randomization)
        key = uuid.uuid4().hex[:16]
        if lines and isinstance(lines[0], bytes):  # msgpack: raw stream
            path = os.path.join(outdir, f"part-{key}-{b.num_rows}.msgpack")
            with open(path, "wb") as f:
                f.write(b"".join(lines))
        else:
            path = os.path.join(outdir, f"part-{key}-{b.num_rows}.txt")
            with open(path, "w") as f:
                f.write("\n".join(lines) + "\n")
        return pa.table({"n": pa.array([b.num_rows], type=pa.int64())})

    parts = ds.map_batches(write_block, batch_format="pyarrow",
                           batch_size=batch_size)
    return sum(r["n"] for r in parts.take_all())
