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
