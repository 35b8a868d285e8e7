"""Alternative record sources — the in_stdin / in_exec / in_forward
family reduced to batch semantics.

The reference's stdin/exec inputs read JSON (or LTSV) record streams
(reference plugins/in_stdin, plugins/in_exec); in_forward receives
``[ts, map]`` pairs. In batch terms every one of these is "a file or
in-memory sequence of records that enter the pipeline with a tag", so:

- ``read_json_records`` / ``read_csv_records``: Ray-native readers with
  the engine's tag column attached;
- ``from_records``: the ``flb_lib_push`` analogue — in-memory
  ``[ts, map]``-shaped records → tagged Dataset (the pytest path,
  reference src/flb_lib.c:461).
"""

from __future__ import annotations

import pyarrow as pa

from ..record import FIELDS_COL, TAG_COL, fields_dumps


def _tagged(ds, tag: str):
    def add(b: pa.Table) -> pa.Table:
        return b.append_column(
            TAG_COL, pa.array([tag] * b.num_rows, type=pa.string()))
    return ds.map_batches(add, batch_format="pyarrow")


def read_json_records(paths, tag: str = "json.0"):
    import ray.data as rd
    return _tagged(rd.read_json(paths), tag)


def read_csv_records(paths, tag: str = "csv.0"):
    import ray.data as rd
    return _tagged(rd.read_csv(paths), tag)


def from_msgpack_stream(data: bytes, tag: str = "forward.0"):
    """in_forward analogue: decode a concatenated msgpack stream of
    ``[timestamp, map]`` records (the Fluentd forward wire payload,
    reference plugins/in_forward/fw_prot.c:229-240) into a tagged
    Dataset. Round-trips with the out_file msgpack sink."""
    from ..sinks.formats import msgpack_unpack_stream
    recs = []
    for obj in msgpack_unpack_stream(data):
        if (isinstance(obj, list) and len(obj) == 2
                and isinstance(obj[1], dict)):
            recs.append((float(obj[0]), obj[1]))
    return from_records(recs, tag=tag)


def read_msgpack_records(paths, tag: str = "forward.0"):
    """File variant: one or more raw msgpack stream files → Dataset."""
    if isinstance(paths, str):
        paths = [paths]
    data = b"".join(open(p, "rb").read() for p in paths)
    return from_msgpack_stream(data, tag=tag)


def from_records(records: list[tuple[float, dict]], tag: str = "lib.0"):
    """``flb_lib_push`` analogue: [(epoch_sec, map), ...] → Dataset.

    Map keys matching the fixed transcript columns are promoted; the
    rest are stored in the JSON fields column.
    """
    import ray.data as rd

    ts, fields = [], []
    for t, m in records:
        ts.append(int(t * 1_000_000_000))
        fields.append(fields_dumps(m))
    table = pa.table({
        "ts": pa.array(ts, type=pa.int64()).cast(pa.timestamp("ns")),
        FIELDS_COL: pa.array(fields, type=pa.large_string()),
        TAG_COL: pa.array([tag] * len(records), type=pa.string()),
    })
    return rd.from_arrow(table)


def gen_random_records(n: int, seed: int = 2024, interval_s: float = 1.0,
                       tag: str = "random.0"):
    """in_dummy-style deterministic analogue of in_random
    (plugins/in_random/random.c:75-82: one {rand_value: u64} map per
    interval). Seeded so runs are reproducible — no live entropy."""
    import numpy as np
    import ray.data as rd
    rs = np.random.RandomState(seed)
    vals = rs.randint(0, 2**63 - 1, size=n, dtype=np.int64)
    ts = (np.arange(n, dtype=np.float64) * interval_s)
    t = pa.table({"ts": pa.array(ts, type=pa.float64()),
                  "rand_value": pa.array(vals, type=pa.int64())})
    return _tagged(rd.from_arrow(t), tag)


def read_head_records(path: str, buf_bytes: int = 256,
                      split_lines: bool = False, key: str = "head",
                      tag: str = "head.0"):
    """in_head analogue (plugins/in_head/head.c): read the first
    ``buf_bytes`` of a file into one {key: text} record, or one record
    per line when ``split_lines`` (the plugin's Split_Line mode)."""
    import ray.data as rd
    with open(path, "rb") as f:
        data = f.read(buf_bytes)
    text = data.decode("utf-8", errors="replace")
    vals = text.splitlines() if split_lines else [text]
    t = pa.table({key: pa.array(vals, type=pa.string())})
    return _tagged(rd.from_arrow(t), tag)
