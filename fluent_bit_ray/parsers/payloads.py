"""Wire-payload grammars: statsd and mqtt.

These mirror the record shapes the reference's socket servers produce,
minus the transports (SURVEY §2.1 — "represented as alternative
payload grammars inside ``text``"):

- statsd ``bucket:value|type|@sample_rate`` lines
  (reference plugins/in_statsd/statsd.c:142-190 line split,
  :88-139 per-type record shape, :66-81 type codes, :84-86
  incremental gauges);
- mqtt PUBLISH payloads: a JSON OBJECT payload becomes the record map
  with a ``topic`` key prepended; non-JSON / non-object payloads are
  rejected (reference plugins/in_mqtt/mqtt_prot.c:129-196).

``parse_*`` are the single-payload reference semantics;
``*_batch`` wrap them for ``map_batches`` use.
"""

from __future__ import annotations

import json

import pandas as pd


def _statsd_type(s: str) -> str:
    # statsd.c:66-81: first char decides; unknown → counter
    if s.startswith("g"):
        return "gauge"
    if s.startswith("s"):
        return "set"
    if s.startswith("c"):
        return "counter"
    if s.startswith("ms"):
        return "timer"
    return "counter"


def _atof(s: str) -> float:
    """C atof(): parse the leading float prefix, 0.0 when none."""
    i, n = 0, len(s)
    while i < n and s[i] in " \t":
        i += 1
    j = i
    if j < n and s[j] in "+-":
        j += 1
    seen_dot = False
    while j < n and (s[j].isdigit() or (s[j] == "." and not seen_dot)):
        if s[j] == ".":
            seen_dot = True
        j += 1
    try:
        return float(s[i:j])
    except ValueError:
        return 0.0


def parse_statsd_line(line: str) -> dict | None:
    """One statsd datagram line → record map (statsd.c:88-190)."""
    colon = line.find(":")
    if colon < 0:
        return None  # "no bucket name found"
    bar = line.find("|", colon + 1)
    if bar < 0:
        return None  # "no metric type found"
    bucket = line[:colon]
    value = line[colon + 1:bar]
    mtype = _statsd_type(line[bar + 1:])
    at = line.find("|@", bar + 1)
    sample_rate = 1.0
    if at >= 0:
        r = _atof(line[at + 2:])
        if r != 0:
            sample_rate = r
    if mtype == "counter" or mtype == "timer":
        return {"type": mtype, "bucket": bucket, "value": _atof(value),
                "sample_rate": sample_rate}
    if mtype == "gauge":
        return {"type": "gauge", "bucket": bucket, "value": _atof(value),
                "incremental": 1 if value[:1] in ("+", "-") else 0}
    return {"type": "set", "bucket": bucket, "value": value}


def statsd_batch(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """map_batches stage: parse statsd lines into typed columns; rows
    that fail the grammar are dropped (the reference logs + skips)."""
    recs = [parse_statsd_line(t) for t in df[text_col].astype(str)]
    keep = [(i, r) for i, r in enumerate(recs) if r is not None]
    return pd.DataFrame({
        "type": [r["type"] for _, r in keep],
        "bucket": [r["bucket"] for _, r in keep],
        "value": [r["value"] for _, r in keep],
        "sample_rate": [r.get("sample_rate") for _, r in keep],
        "incremental": [r.get("incremental") for _, r in keep],
    })


def parse_mqtt_payload(topic: str, payload: str) -> dict | None:
    """MQTT PUBLISH payload → record map with ``topic`` prepended.

    The payload must parse as a JSON OBJECT (mqtt_prot.c:147-163);
    anything else is rejected (the reference warns and drops).
    """
    try:
        obj = json.loads(payload)
    except (ValueError, TypeError):
        return None
    if not isinstance(obj, dict):
        return None
    out = {"topic": topic}
    out.update(obj)
    return out


def mqtt_batch(df: pd.DataFrame, topic_col: str = "topic",
               payload_col: str = "text") -> pd.DataFrame:
    recs = [parse_mqtt_payload(t, p)
            for t, p in zip(df[topic_col].astype(str),
                            df[payload_col].astype(str))]
    kept = [r for r in recs if r is not None]
    from ..record import fields_dumps
    return pd.DataFrame({
        "topic": [r["topic"] for r in kept],
        "fields": [fields_dumps({k: v for k, v in r.items()
                                 if k != "topic"}) for r in kept],
    })


# ----------------------------------------------------------- in_kmsg
def parse_kmsg_line(line: str, boot_epoch: float = 0.0) -> dict | None:
    """Kernel log ring line → record, mirroring in_kmsg's process_line
    (plugins/in_kmsg/in_kmsg.c:108-205): ``<prio>,<seq>,<usec>[,flags];msg``
    → {priority: prio & 0x07 (FLB_KLOG_PRI, in_kmsg.h:42-43),
    sequence, sec, usec (relative to boot), msg}; the event time is
    boot_epoch + the relative timestamp (ts key, epoch seconds)."""
    try:
        head, _, msg = line.partition(";")
        if not msg and ";" not in line:
            return None
        parts = head.split(",")
        if len(parts) < 3:
            return None
        prio = int(parts[0])
        seq = int(parts[1])
        usec_total = int(parts[2])
    except ValueError:
        return None
    sec = usec_total // 1_000_000
    usec = usec_total - sec * 1_000_000
    return {"priority": prio & 0x07, "sequence": seq,
            "sec": sec, "usec": usec, "msg": msg,
            "ts": boot_epoch + sec + usec / 1e6}


def kmsg_batch(df: pd.DataFrame, text_col: str = "text",
               boot_epoch: float = 0.0) -> pd.DataFrame:
    recs = [parse_kmsg_line(s, boot_epoch)
            for s in df[text_col].astype(str)]
    kept = [r for r in recs if r is not None]
    return pd.DataFrame({
        "priority": pd.Series([r["priority"] for r in kept], dtype="int64"),
        "sequence": pd.Series([r["sequence"] for r in kept], dtype="int64"),
        "sec": pd.Series([r["sec"] for r in kept], dtype="int64"),
        "usec": pd.Series([r["usec"] for r in kept], dtype="int64"),
        "msg": pd.Series([r["msg"] for r in kept], dtype="string"),
        "ts": pd.Series([r["ts"] for r in kept], dtype="float64"),
    })
