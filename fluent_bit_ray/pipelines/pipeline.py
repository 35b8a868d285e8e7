"""Pipeline = tag derivation → ordered filter chain → route fan-out.

Mirrors the reference engine's lifecycle (SURVEY §3.1) in Ray Data
terms:
- ingestion-time filter chain (src/flb_filter.c:56-140, run in config
  order per matching tag) → consecutive NARROW stages fused into one
  ``map_batches`` callable (one pass over each block, no per-stage
  block materialization);
- WIDE stages (throttle/throttle_size — global windowed state) break
  fusion and run as groupby-based operators;
- rewrite_tag re-entry (emitter semantics, in_emitter/emitter.c:82):
  after a full chain pass, rows marked ``_reenter`` loop through the
  whole chain again under their new tag, to a bounded fixed point;
- routing (src/flb_router.c, flb_routes_mask.c) → a uint64 ``routes``
  bitmask column; each sink is a lazily filtered view, or use
  ``write_sinks`` for the single-pass multiplexed fan-out write.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..record import ROUTES_COL, TAG_COL
from ..stages.base import Stage, build_stage, ensure_column, replace_column
from ..stages.rewrite_tag import HOP_COL, REENTER_COL
from ..tags import Router, derive_tag

INTERNAL_COLS = (REENTER_COL, HOP_COL)

# auto batch sizing: rows per batch chosen so one batch is ~this many
# bytes (r4 lesson: wide_record's ~16 KB rows coalesced into one 27 s
# task at a fixed 16384-row default; conversely tiny rows want big
# batches). 4 MiB × concurrency fits comfortably in a worker heap even
# with decoded-dict blow-up.
_DEFAULT_BATCH_ROWS = 16384
_TARGET_BATCH_BYTES = 4 << 20


def _auto_batch_size(ds) -> int:
    """Rows per batch sized by BYTES from the input's free metadata
    (``_meta_count``/``size_bytes`` on read- or from_arrow-backed
    plans; parquet sizes are file bytes, an underestimate of the
    in-memory table, which errs toward smaller batches — safe).
    Falls back to the row default when the plan exposes no metadata;
    NEVER triggers execution (size_bytes is only consulted after
    meta_count proves the plan is metadata-backed)."""
    try:
        nrows = ds._meta_count()
        if not nrows:
            return _DEFAULT_BATCH_ROWS
        nbytes = ds.size_bytes()
        if not nbytes:
            return _DEFAULT_BATCH_ROWS
        avg = max(1, int(nbytes) // int(nrows))
        return int(min(max(_TARGET_BATCH_BYTES // avg, 64),
                       _DEFAULT_BATCH_ROWS))
    except Exception:
        return _DEFAULT_BATCH_ROWS


class _ChainFn:
    """One fused map_batches callable applying an ordered stage list.

    Constructed per actor/task; stages carry precompiled state
    (regexes, parsers, dimension dicts) built once in their __init__.

    When ``reentrant_hops > 0`` the emitter fixed point runs BATCH-
    LOCALLY: rows a rewrite_tag stage re-emitted (``_reenter``) are
    looped through the same stage list again, up to the hop bound.
    Re-entry is row-local in the reference too (each emitted record
    independently traverses the filter chain under its new tag,
    src/flb_filter.c:56-140), so this is semantically exact for
    chains without wide stages — and it keeps the whole pipeline one
    streaming pass with zero recomputation.
    """

    def __init__(self, specs: list[dict], reentrant_hops: int = 0,
                 collect_metrics: bool = False):
        self.stages = [build_stage(s) if isinstance(s, dict) else s
                       for s in specs]
        self.reentrant_hops = reentrant_hops
        self.collect_metrics = collect_metrics
        self._metrics_actor = None

    def _apply(self, batch: pa.Table) -> pa.Table:
        if not self.collect_metrics:
            for st in self.stages:
                batch = st(batch)
            return batch
        deltas = []
        for st in self.stages:
            rin = batch.num_rows
            batch = st(batch)
            deltas.append((getattr(st, "stage_type", type(st).__name__),
                           rin, batch.num_rows))
        if deltas:
            if self._metrics_actor is None:
                from ..state.metrics import get_metrics_actor
                self._metrics_actor = get_metrics_actor()
            self._metrics_actor.add.remote(deltas)  # fire-and-forget
        return batch

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = self._apply(batch)
        if not self.reentrant_hops or REENTER_COL not in batch.column_names:
            return batch
        done_parts = []
        for _ in range(self.reentrant_hops):
            m = np.asarray(batch.column(REENTER_COL)
                           .to_numpy(zero_copy_only=False), dtype=bool)
            if not m.any():
                break
            done_parts.append(batch.filter(pa.array(~m)))
            pending = _clear_reenter(batch.filter(pa.array(m)))
            batch = self._apply(pending)
        if not done_parts:
            return batch
        done_parts.append(batch)
        return pa.concat_tables(done_parts, promote_options="default")


def _tag_batch(batch: pa.Table, prefix: str) -> pa.Table:
    if TAG_COL in batch.column_names:
        return batch
    tag = derive_tag(batch.column("role"), prefix=prefix)
    return batch.append_column(TAG_COL, tag)


class Pipeline:
    def __init__(self, stages: list[dict | Stage] | None = None,
                 sinks: list[tuple] | None = None,
                 tag_prefix: str = "transcript",
                 max_hops: int = 4,
                 batch_size: int | None | str = "auto",
                 concurrency: int | None = None,
                 collect_metrics: bool = False):
        self.stage_specs = stages or []
        self.router = Router(sinks or [("all", "*")])
        self.tag_prefix = tag_prefix
        self.max_hops = max_hops
        self.batch_size = batch_size
        self.concurrency = concurrency
        self.collect_metrics = collect_metrics

    # ------------------------------------------------------------------
    def _built_stages(self) -> list[Stage]:
        return [build_stage(s) if isinstance(s, dict) else s
                for s in self.stage_specs]

    def _segments(self) -> list[tuple[str, list]]:
        """Split the ordered chain into narrow segments and wide stages."""
        segs: list[tuple[str, list]] = []
        cur: list = []
        for s in self._built_stages():
            if getattr(s, "wide", False):
                if cur:
                    segs.append(("narrow", cur))
                    cur = []
                segs.append(("wide", [s]))
            else:
                cur.append(s)
        if cur:
            segs.append(("narrow", cur))
        return segs

    def _apply_chain(self, ds, reentrant_hops: int = 0,
                     batch_size: int | None = _DEFAULT_BATCH_ROWS):
        prefix = self.tag_prefix

        def tag_fn(b: pa.Table) -> pa.Table:
            return _tag_batch(b, prefix)

        ds = ds.map_batches(tag_fn, batch_format="pyarrow",
                            batch_size=batch_size)
        for kind, seg in self._segments():
            if kind == "wide":
                ds = seg[0].apply(ds)
            else:
                ctor = dict(specs=seg, reentrant_hops=reentrant_hops,
                            collect_metrics=self.collect_metrics)
                if self.concurrency:
                    # actor-pool chain: stages built once per actor
                    ds = ds.map_batches(_ChainFn,
                                        fn_constructor_kwargs=ctor,
                                        concurrency=self.concurrency,
                                        batch_format="pyarrow",
                                        batch_size=batch_size)
                else:
                    ds = ds.map_batches(_ChainFn(**ctor),
                                        batch_format="pyarrow",
                                        batch_size=batch_size)
        return ds

    def _has_rewrite_tag(self) -> bool:
        from ..stages.rewrite_tag import RewriteTagStage
        return any(isinstance(s, RewriteTagStage) for s in self._built_stages())

    def _has_wide(self) -> bool:
        return any(getattr(s, "wide", False) for s in self._built_stages())

    def run(self, ds) -> "Routed":
        """Apply chain (+ bounded emitter fixed point) and routing."""
        # "auto": size batches by BYTES from the input's free metadata
        # (explicit int/None callers keep full control)
        bs = (_auto_batch_size(ds) if self.batch_size == "auto"
              else self.batch_size)
        if self._has_rewrite_tag() and not self._has_wide():
            # single narrow segment → batch-local re-entry, one streaming pass
            out = self._apply_chain(ds, reentrant_hops=self.max_hops,
                                    batch_size=bs)
        else:
            out = self._apply_chain(ds, batch_size=bs)
        if self._has_rewrite_tag() and self._has_wide():
            # bounded re-entry: re-entrant rows are few; materialize the
            # small pending side each hop, never the main stream
            done = _strip_reenter_split(out, keep="done")
            pending = _strip_reenter_split(out, keep="pending")
            for _ in range(self.max_hops):
                pending = pending.materialize()
                if pending.count() == 0:
                    break
                hop_out = self._apply_chain(pending, batch_size=bs)
                done = done.union(_strip_reenter_split(hop_out, keep="done"))
                pending = _strip_reenter_split(hop_out, keep="pending")
            out = done

        router = self.router

        def route_fn(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return b
            routes = router.routes_column(b.column(TAG_COL))
            b = replace_column(b, ROUTES_COL, pa.array(routes, type=pa.uint64()))
            drop = [c for c in INTERNAL_COLS if c in b.column_names]
            return b.drop_columns(drop) if drop else b

        out = out.map_batches(route_fn, batch_format="pyarrow",
                              batch_size=bs)
        return Routed(out, router)


def _clear_reenter(b: pa.Table) -> pa.Table:
    return replace_column(b, REENTER_COL,
                          pa.array([False] * b.num_rows, type=pa.bool_()))


def _strip_reenter_split(ds, keep: str):
    """Split a chain output into completed rows vs re-entrant rows."""
    def fn(b: pa.Table) -> pa.Table:
        b = ensure_column(b, REENTER_COL, pa.bool_(), fill=False)
        m = b.column(REENTER_COL).to_numpy(zero_copy_only=False)
        m = np.asarray(m, dtype=bool)
        if keep == "done":
            return b.filter(pa.array(~m))
        return _clear_reenter(b.filter(pa.array(m)))
    return ds.map_batches(fn, batch_format="pyarrow")


class Routed:
    """Routed output: per-sink filtered views over one tagged stream."""

    def __init__(self, ds, router: Router):
        self.ds = ds
        self.router = router

    def sink(self, name: str):
        router = self.router

        def fn(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return b
            m = router.sink_mask(b.column(ROUTES_COL), name)
            return b.filter(pa.array(m))

        return self.ds.map_batches(fn, batch_format="pyarrow")

    def sink_counts(self):
        """out_counter oracle: row count per sink in ONE pass.

        Per-batch popcount partials → tiny groupby (pre-aggregated,
        no all-to-all of the data itself).
        """
        router = self.router
        names = router.sink_names()

        def partial(b: pa.Table) -> pa.Table:
            counts = [int(router.sink_mask(b.column(ROUTES_COL), n).sum())
                      for n in names]
            return pa.table({"sink": pa.array(names),
                             "n": pa.array(counts, type=pa.int64())})

        # partials are one row per sink per block — summed on the driver
        # (no AllToAll stage for a handful of rows)
        parts = self.ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        if len(parts) == 0:  # zero-row stream: Ray emits no partials
            return {n: 0 for n in names}
        out = parts.groupby("sink")["n"].sum()
        return {k: int(v) for k, v in out.items()}
