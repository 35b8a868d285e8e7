"""Shuffle-shape helpers.

``coarse_group_apply`` is the engine's standard fix for the
high-cardinality ``groupby(key).map_groups`` pathology: Ray runs the
group kernel once per key, so a million tiny groups mean a million
pandas frames and task dispatches. Hashing keys into a bounded number
of coarse partitions keeps the all-to-all exchange identical in volume
but runs ONE task per partition, with a fast in-task pandas loop over
the keys it owns. Same pattern as the LSH bucket pairing
(dataops/dedup.py:_bucket_pairs). Semantics are identical to
``ds.groupby(key).map_groups(fn)`` for any per-key kernel.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public constants) — a full
    64-bit avalanche so consecutive integer keys don't all land in
    consecutive partitions. Deterministic across processes."""
    z = x.astype(np.uint64, copy=True)
    z += np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1E3569B7)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D1BBDF38707FAB)
    return z ^ (z >> np.uint64(31))


def _hp_column(df: pd.DataFrame, keys: list[str], partitions: int
               ) -> np.ndarray:
    """Partition id per row. Integer single-key: pure-numpy mix (no
    per-row Python, no string conversion). Anything else: factorize
    the (combined) stringified key, then hash only the DISTINCT values
    through the same vectorized kernel as the Arrow route
    (``_hash64_of_arrow`` — polars' seed-pinned string hash, crc32
    fallback), so single-key string exchanges produce IDENTICAL
    partition maps on both routes and high-cardinality keys never pay
    a per-distinct Python loop."""
    if len(keys) == 1 and pd.api.types.is_integer_dtype(df[keys[0]]):
        mixed = _splitmix64(df[keys[0]].to_numpy())
        return (mixed % np.uint64(partitions)).astype(np.int64)
    kcol = df[keys[0]].astype(str)
    for k in keys[1:]:
        kcol = kcol + "\x1f" + df[k].astype(str)
    if len(kcol) == 0:
        return np.zeros(0, dtype=np.int64)
    # measured at 2M rows / 500k distinct: direct full-column hash
    # 0.23 s vs factorize(0.33)+hash-uniques(0.36) — factorize only
    # pays off when polars is absent (crc32 fallback inside the kernel
    # dictionary-encodes, so distincts are still hashed once there)
    arr = pa.Array.from_pandas(kcol, type=pa.large_string())
    return (_hash64_of_arrow(arr) % np.uint64(partitions)).astype(np.int64)


def coarse_partition_apply(ds, key, per_partition_fn,
                           partitions: int | None = None,
                           batch_format: str = "pandas",
                           exchange: str = "raw",
                           salt_col: str | None = None):
    """Like ``coarse_group_apply`` but the kernel receives the WHOLE
    coarse partition (all rows whose key hashes to it) and is expected
    to be key-aware internally (vectorized groupby/cumsum) — zero
    per-key Python. Guarantee: all rows of one key land in one call.

    Single-key calls route through ``hash_exchange_apply`` (raw-Ray
    unsorted exchange — measured ~2–6× the sort-groupby shuffle; see
    its docstring). Composite keys — or ``exchange="sort"`` — use the
    original Dataset-native ``groupby(_hp).map_groups`` path, which is
    also the lazy option (the raw exchange executes its input when
    called). ``batch_format`` picks the kernel's frame type on either
    route. ``partitions=None`` sizes to the cluster on the raw route
    and means 64 on the sort route.
    """
    keys = [key] if isinstance(key, str) else list(key)

    if exchange == "raw" and len(keys) == 1:
        return hash_exchange_apply(ds, keys[0], per_partition_fn,
                                   partitions=partitions,
                                   kernel_format=batch_format,
                                   salt_col=salt_col)
    # NOTE: salt_col is raw-exchange-only; the sort fallback co-locates
    # WHOLE keys, which is strictly stronger and stays correct for any
    # kernel that groups by (key, salt) internally — the hot key just
    # isn't split there.

    if partitions is None:
        partitions = 64

    if batch_format == "pyarrow" and len(keys) == 1:
        k = keys[0]

        def add_hp_arrow(t: pa.Table) -> pa.Table:
            return t.append_column(
                "_hp", pa.array(_hp_of_arrow(t[k], partitions)))

        return (ds.map_batches(add_hp_arrow, batch_format="pyarrow")
                .groupby("_hp")
                .map_groups(lambda t: per_partition_fn(t.drop(["_hp"])),
                            batch_format="pyarrow"))

    def add_hp(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_hp"] = _hp_column(df, keys, partitions)
        return df

    return (ds.map_batches(add_hp, batch_format="pandas")
            .groupby("_hp")
            .map_groups(lambda g: per_partition_fn(g.drop(columns=["_hp"])),
                        batch_format="pandas"))


def coarse_group_apply(ds, key, per_group_fn, partitions: int = 64):
    """Apply ``per_group_fn(group_df) -> DataFrame`` once per distinct
    ``key`` value (a column name or list of them), shuffled through
    ``partitions`` coarse hash groups (crc32 of the stringified key —
    deterministic across processes)."""
    keys = [key] if isinstance(key, str) else list(key)
    gb_key = keys[0] if len(keys) == 1 else keys

    def add_hp(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_hp"] = _hp_column(df, keys, partitions)
        return df

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_hp"])
        outs = [per_group_fn(sub) for _, sub in g.groupby(gb_key, sort=False)]
        return pd.concat(outs, ignore_index=True)

    return (ds.map_batches(add_hp, batch_format="pandas")
            .groupby("_hp")
            .map_groups(per_partition, batch_format="pandas"))


# reduce/concat fan-in bound for hash_exchange_apply: above this many
# input blocks per partition, pieces are pre-concatenated in a tree so no
# single task takes an unbounded argument list
_MAX_FANIN = 256

# driver-memory ceiling for the raw exchange: above this many split
# groups the T×P ref matrix is handed to the sort-based shuffle instead
_RAW_MAX_GROUPS = 4096

# auto-sizing target: ~this many rows per partition (also the
# saturation unit for the deferred-sizing buffer — tests shrink it to
# exercise the streamed path at unit scale)
_ROWS_PER_PART = 100_000


def _hash64_of_arrow(col) -> np.ndarray:
    """Full-width uint64 hash per row of an Arrow column (splitmix64
    for integers, bit-pattern mix for floats, polars' seed-pinned
    vectorized hash for strings with a crc32-per-distinct fallback)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_integer(arr.type):
        return _splitmix64(arr.to_numpy(zero_copy_only=False))
    if pa.types.is_floating(arr.type):
        # float keys (e.g. an int column gone float64 through a union
        # with nulls): hash the BIT PATTERN — equal values get equal
        # partitions, which is all co-location needs (the map need not
        # match the pandas path, only be self-consistent)
        vals = arr.to_numpy(zero_copy_only=False).astype(np.float64)
        bits = (vals + 0.0).view(np.uint64)      # -0.0 → 0.0 first
        return _splitmix64(bits)
    if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
        try:
            # Rust-vectorized, seed-pinned (verified identical across
            # processes for one polars build — all workers in a job
            # share the image, which is all partitioning needs)
            import polars as pl

            return pl.from_arrow(arr).hash(seed=0).to_numpy()
        except ImportError:
            dct = arr.dictionary_encode()
            uniq = dct.dictionary.to_pylist()
            hu = np.fromiter(
                (zlib.crc32(str(u).encode("utf-8")) for u in uniq),
                dtype=np.uint64, count=len(uniq))
            return hu[dct.indices.to_numpy(zero_copy_only=False)]
    raise TypeError(f"hash exchange needs an integer or string key, "
                    f"got {arr.type}")


def _hp_of_arrow(col, partitions: int, salt=None) -> np.ndarray:
    """Partition id per row of an Arrow column. With ``salt`` (an
    integer array, e.g. an order-chunk id) the map becomes
    mix(hash(key) + salt) so one hot key's chunks spread across
    partitions — the caller owns re-merging chunk boundaries."""
    h = _hash64_of_arrow(col)
    if salt is not None:
        s = (salt.combine_chunks() if isinstance(salt, pa.ChunkedArray)
             else salt)
        s = (s.to_numpy(zero_copy_only=False).astype(np.uint64)
             if not isinstance(s, np.ndarray) else s.astype(np.uint64))
        h = _splitmix64(h + s)
    return (h % np.uint64(partitions)).astype(np.int64)


def halo_chunk_exchange(ds, key: str, order_col: str, per_partition_fn,
                        halo_before: int = 0, halo_after: int = 0,
                        chunk_rows: int = 1 << 18,
                        partitions: int | None = None):
    """Hot-key-safe exchange for FIXED-LOOKBACK scan kernels (lag/lead,
    trailing windows): rows are exchanged by (key, order//chunk_rows)
    so one hot key spreads over partitions, and the ``halo_before``
    rows preceding each chunk (and/or ``halo_after`` following it) are
    DUPLICATED into the chunk flagged ``_halo`` — every row's window
    context is present in its chunk, no second merge pass needed.

    Kernel contract: group rows by (key, "_ck"); sorted by the order
    column, ``_halo`` rows land first (before) / last (after) in the
    group and must be DROPPED from the output (they are re-emitted as
    real rows by their own chunk). CONTRACT: order values are dense
    non-negative 0,1,2,... per key (the engine's lineage offsets /
    transcript turn indexes); with sparse order values a chunk may
    lack part of its halo.
    """
    import pyarrow.compute as pc

    C = int(chunk_rows)
    if max(halo_before, halo_after) >= C:
        raise ValueError("halo must be smaller than chunk_rows")

    def add_ck(t: pa.Table) -> pa.Table:
        o = pc.cast(t[order_col].combine_chunks(), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        ck = o // C
        tabs = [t.append_column("_ck", pa.array(ck))
                 .append_column("_halo",
                                pa.array(np.zeros(len(o), dtype=bool)))]
        if halo_before:
            m = (o % C) >= C - halo_before       # tail → next chunk
            if m.any():
                idx = pa.array(np.flatnonzero(m))
                tabs.append(t.take(idx)
                            .append_column("_ck", pa.array(ck[m] + 1))
                            .append_column("_halo", pa.array(
                                np.ones(int(m.sum()), dtype=bool))))
        if halo_after:
            m = ((o % C) < halo_after) & (ck >= 1)  # head → prev chunk
            if m.any():
                idx = pa.array(np.flatnonzero(m))
                tabs.append(t.take(idx)
                            .append_column("_ck", pa.array(ck[m] - 1))
                            .append_column("_halo", pa.array(
                                np.ones(int(m.sum()), dtype=bool))))
        return tabs[0] if len(tabs) == 1 else pa.concat_tables(tabs)

    return hash_exchange_apply(
        ds.map_batches(add_ck, batch_format="pyarrow"),
        key, per_partition_fn, partitions=partitions, salt_col="_ck")


def hash_exchange_apply(ds, key: str, per_partition_fn,
                        partitions: int | None = None,
                        kernel_format: str = "pyarrow",
                        salt_col: str | None = None,
                        side_schema: "pa.Schema | None" = None):
    """UNSORTED hash exchange + per-partition Arrow kernel, built on
    raw Ray tasks. Semantically identical to
    ``coarse_partition_apply(..., batch_format="pyarrow")`` — all rows
    of one key reach one ``per_partition_fn(pa.Table)`` call — but the
    exchange never sorts: Ray Data's ``groupby`` can only co-locate via
    a full sort-based (or slower hash-actor) shuffle, and for kernels
    that re-order internally anyway the sort is pure waste. Measured
    on the 32M-row events table at 16 CPUs: sort-groupby exchange
    19.5 s wall (70 CPU·s in SortReduce alone), Ray HASH_SHUFFLE
    repartition 43 s, this exchange 3.2 s.

    Shape: with ``partitions=None`` the input bundles are collected
    first (their row-count metadata sizes the partition count); with an
    explicit ``partitions`` the bundles are STREAMED — split tasks are
    submitted while the upstream read is still producing blocks. Either
    way small blocks coalesce into ~200k-row split groups; each split
    task bucket-sorts its blocks by the key hash (radix argsort + one
    zero-copy take) and returns ``partitions`` table slices as separate
    objects; each reduce concatenates its slices and runs the kernel. Like any all-to-all this materializes one pass of the
    input in the object store (the sort shuffle does too); blocks
    spill rather than sit in worker heaps. Reduce fan-in is bounded by
    a tree fold above ``_MAX_FANIN`` input blocks so no task takes
    unbounded argument lists at cluster scale.

    ``side_schema``: when given, the kernel returns a TUPLE
    ``(main_table, side_table_or_None)`` and the call returns
    ``(main_ds, side_ds)``. The side channel is for small
    per-partition by-products (e.g. chunk-boundary records of a
    hot-key-split scan kernel) — it rides as a second task return, so
    the main output carries no tag columns and needs no post-filter
    pass. Arrow kernels only.
    """
    import ray
    import ray.data as rd

    if side_schema is not None and kernel_format == "pandas":
        raise ValueError("side_schema requires an Arrow kernel")

    if kernel_format == "pandas":
        # pandas-kernel adapter: conversion happens inside the reduce
        # task (same place Ray's map_groups would do it). Empty
        # partitions never reach the kernel (the driver drops them via
        # the split-side counts) — an empty pandas frame round-trips
        # with null/object dtypes and would poison the output schema.
        pandas_fn = per_partition_fn

        def per_partition_fn(t: pa.Table):          # noqa: F811
            from ray.data.block import BlockAccessor

            # strip pandas schema metadata first: from_pandas-built
            # blocks embed dtype reprs (e.g. Ray TensorDtype) that
            # pyarrow's to_pandas cannot reconstruct
            out = pandas_fn(BlockAccessor.for_block(
                t.replace_schema_metadata(None)).to_pandas())
            # preserve the kernel's batch type as the BLOCK type, like
            # map_groups does: DataFrame → pandas block (downstream
            # unions with other pandas-block datasets stay homogeneous),
            # Arrow table / dict of columns → arrow block
            if isinstance(out, pa.Table):
                return out.replace_schema_metadata(None)
            if isinstance(out, dict):
                from ray.data.block import BlockType
                return BlockAccessor.batch_to_block(out, BlockType.ARROW)
            return out

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    cap = min(4 * ncpu, 256)

    def _raw_entries():
        for bundle in ds.iter_internal_ref_bundles():
            for block_ref, md in bundle.blocks:
                yield block_ref, md.num_rows

    stream = _raw_entries()
    known_rows = 0
    if partitions is None:
        # sizing wants total rows (≥ ~100k rows per partition so reduce
        # tasks do real work, at least one partition per core for kernel
        # parallelism, at most 4/core — measured 64M rows at 4 CPUs:
        # parts=64 21.9 s vs parts=16 14.1 s; on an 80k-row corpus a
        # blind 4×CPU=128-partition matrix costs more in per-object
        # driver overhead than the kernels do). But it doesn't need to
        # see the WHOLE input: buffer bundles only until the formula
        # saturates at its cap, then fix P and stream the rest — small
        # inputs size exactly as before, large inputs overlap split
        # tasks with the upstream read (collect-first measured ~1–1.5 s
        # of idle phase gap per exchange at 16 CPUs on sf1).
        buffered = []
        for br, n in stream:
            buffered.append((br, n))
            known_rows += n or 0
            if known_rows >= cap * _ROWS_PER_PART:
                break
        if not buffered:
            # fall through with an empty stream; handled below
            partitions = max(16, min(256, cap))
        elif known_rows:
            partitions = int(np.clip(-(-known_rows // _ROWS_PER_PART),
                                     min(ncpu, 256), cap))
        else:
            partitions = max(16, min(256, cap))
        from itertools import chain
        stream = chain(buffered, stream)
    # else: explicit partition count — pure streaming, nothing buffered
    P = partitions

    @ray.remote(num_returns=P + 1)
    def split_block(*blocks):
        from ray.data.block import BlockAccessor

        # blocks may be pandas (incl. tensor-dtype columns) — Ray's
        # accessor converts faithfully where bare from_pandas cannot
        tables = [b if isinstance(b, pa.Table)
                  else BlockAccessor.for_block(b).to_arrow()
                  for b in blocks]
        # drop empties: they can carry DEGRADED schemas (a flat_map
        # that produced nothing) and would poison the concat
        tables = [t for t in tables if t.num_rows]
        if not tables:
            return (*(None,) * P, np.zeros(P, dtype=np.int64))
        t = tables[0] if len(tables) == 1 else pa.concat_tables(
            tables, promote_options="permissive")
        hp = _hp_of_arrow(t[key], P,
                          salt=t[salt_col] if salt_col else None)
        order = np.argsort(hp, kind="stable")      # radix sort on int64
        sorted_t = t.take(order)
        bounds = np.searchsorted(hp[order], np.arange(P + 1))
        # last return: per-partition row counts, so the driver can skip
        # empty partitions without fetching any table
        return (*(sorted_t.slice(bounds[i], bounds[i + 1] - bounds[i])
                  for i in range(P)),
                (bounds[1:] - bounds[:-1]).astype(np.int64))

    @ray.remote
    def concat_pieces(*pieces):
        live = [p for p in pieces if p is not None]
        if not live:
            return None
        return pa.concat_tables(live, promote_options="permissive")

    def _concat(tables):
        # promote null-typed columns (Ray unions of empty/nonempty
        # frames type the empty side null) instead of failing
        return pa.concat_tables(tables, promote_options="permissive")

    @ray.remote(num_returns=2 if side_schema is not None else 1)
    def reduce_part(*pieces):
        from ray.data.block import BlockAccessor

        tables = [p if isinstance(p, pa.Table)
                  else BlockAccessor.for_block(p).to_arrow()
                  for p in pieces if p is not None]
        nonempty = [t for t in tables if t.num_rows]
        out = per_partition_fn(_concat(nonempty or tables))
        if side_schema is None:
            return out
        main, side = out
        return main, (side if side is not None
                      else side_schema.empty_table())

    @ray.remote
    def _is_arrow(block) -> bool:
        return isinstance(block, pa.Table)

    def _wrap(out_refs):
        if side_schema is not None:
            return (rd.from_arrow_refs([m for m, _ in out_refs]),
                    rd.from_arrow_refs([s for _, s in out_refs]))
        # one exchange's kernel returns one batch type; probe the first
        # block REMOTELY (nothing is fetched to the driver) and build
        # the Dataset with the matching block layout
        if kernel_format != "pandas" or ray.get(_is_arrow.remote(
                out_refs[0])):
            return rd.from_arrow_refs(out_refs)
        return rd.from_pandas_refs(out_refs)

    def empty_result():
        if kernel_format == "pandas":
            # run the kernel once on a TYPED empty frame so the result
            # keeps the kernel's output columns (a bare from_items([])
            # has no schema and breaks column access downstream)
            sch = ds.schema(fetch_if_missing=False)
            if sch is not None:
                base = getattr(sch, "base_schema", None)
                try:
                    if isinstance(base, pa.Schema):
                        empty_df = base.empty_table().to_pandas()
                    else:
                        empty_df = pd.DataFrame(
                            {n: pd.Series([], dtype=t)
                             for n, t in zip(sch.names, sch.types)})
                    return rd.from_pandas(pandas_fn(empty_df))
                except Exception:
                    pass
            return rd.from_items([])
        empty = pa.Table.from_pylist([], schema=ds.schema().base_schema)
        out = per_partition_fn(empty)
        if side_schema is not None:
            main, side = out
            return (rd.from_arrow(main),
                    rd.from_arrow(side if side is not None
                                  else side_schema.empty_table()))
        return rd.from_arrow(out)

    if P == 1:
        # degenerate single partition: no split needed, one reduce over
        # the raw blocks (num_returns=1 would also return a bare ref,
        # not a 1-tuple, so the generic path can't serve it)
        refs = [br for br, _ in stream]
        if not refs:
            return empty_result()
        out = reduce_part.remote(*refs)
        return _wrap([out] if side_schema is None else [tuple(out)])

    # coalesce small blocks into split tasks of ~200k rows (at least
    # one group per core): shrinks the T×P object matrix — the driver-
    # side cost per exchange is ~T×P ref handoffs, so halving T halves
    # it; blocks of unknown size go one per task. Groups are SUBMITTED
    # as they close, so in the streamed (explicit-partitions) mode
    # splits overlap the upstream read.
    target = max(200_000, known_rows // max(2 * ncpu, 1) or 1)
    piece_refs, count_refs = [], []

    def submit(grp):
        *pieces, counts = split_block.remote(*grp)
        piece_refs.append(pieces)
        count_refs.append(counts)

    overflow = False
    cur, cur_rows = [], 0
    for br, n in stream:
        if len(piece_refs) >= _RAW_MAX_GROUPS:
            overflow = True
            break
        if n is None:
            if cur:
                submit(cur)
                cur, cur_rows = [], 0
            submit([br])
            continue
        cur.append(br)
        cur_rows += n
        if cur_rows >= target:
            submit(cur)
            cur, cur_rows = [], 0
    if not overflow and cur:
        submit(cur)

    if overflow:
        # driver-memory guard: the exchange tracks T×P object refs on
        # the driver; past ~_RAW_MAX_GROUPS split groups (≈ 800M rows
        # at the 200k-row coalescing target) that matrix outgrows what
        # one driver should hold — hand the job to Ray's sort-based
        # shuffle, which streams its ref bookkeeping internally (the
        # input plan re-executes, and in streamed mode the already-
        # submitted split tasks are abandoned; at this scale that is
        # the cheap part)
        if side_schema is not None:
            # the sort shuffle has no second return: ride the side rows
            # in-band behind a tag column and split after (slower —
            # two filter passes — but this path only exists past the
            # ref-matrix ceiling)
            import pyarrow.compute as pc

            def tagged(t: pa.Table):
                main, side = per_partition_fn(t)
                main = main.append_column(
                    "_side", pa.nulls(main.num_rows, pa.bool_()))
                if side is None or side.num_rows == 0:
                    return main
                side = side.rename_columns(
                    ["_s_" + c for c in side.column_names])
                side = side.append_column(
                    "_side", pa.array(np.ones(side.num_rows, dtype=bool)))
                return pa.concat_tables([main, side],
                                        promote_options="permissive")

            both = coarse_partition_apply(
                ds, key, tagged,
                partitions=P, batch_format="pyarrow", exchange="sort")

            def keep_main(t: pa.Table) -> pa.Table:
                t = t.filter(pc.is_null(t["_side"]))
                return t.select([c for c in t.column_names
                                 if c != "_side"
                                 and not c.startswith("_s_")])

            def keep_side(t: pa.Table) -> pa.Table:
                t = t.filter(pc.equal(t["_side"], True))
                names = ["_s_" + c for c in side_schema.names]
                if not set(names) <= set(t.column_names):
                    return side_schema.empty_table()
                return t.select(names).rename_columns(
                    list(side_schema.names)).cast(side_schema)

            return (both.map_batches(keep_main, batch_format="pyarrow"),
                    both.map_batches(keep_side, batch_format="pyarrow"))
        return coarse_partition_apply(
            ds, key,
            per_partition_fn if kernel_format != "pandas" else pandas_fn,
            partitions=P, batch_format=kernel_format, exchange="sort")

    if not piece_refs:
        return empty_result()

    # tiny (P int64s per input block) — a barrier, but every reduce needs
    # every split anyway; lets the driver drop empty partitions (a pandas
    # kernel cannot type an empty frame) without fetching any table
    part_rows = np.sum(ray.get(count_refs), axis=0)

    out_refs = []
    for i in range(P):
        if part_rows[i] == 0:
            continue
        col = [pr[i] for pr in piece_refs]
        while len(col) > _MAX_FANIN:            # tree fold for huge inputs
            col = [concat_pieces.remote(*col[j:j + _MAX_FANIN])
                   for j in range(0, len(col), _MAX_FANIN)]
        out = reduce_part.remote(*col)
        out_refs.append(out if side_schema is None else tuple(out))
    if not out_refs:
        return empty_result()
    return _wrap(out_refs)
