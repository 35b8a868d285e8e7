"""Per-stage metrics — the reference's records-in/out accounting.

Fluent Bit tracks per-instance record/byte counters and filter
add/drop deltas (reference src/flb_metrics.c:159 ``flb_metrics_sum``;
src/flb_filter.c:107-127 N_ADDED/N_DROPPED accounting). Here a single
named Ray actor accumulates (stage, rows_in, rows_out) deltas pushed
fire-and-forget from chain tasks (one tiny async call per batch per
segment); the LineageRunner drains it into each wave manifest.

This is one of the few places raw ``@ray.remote`` is justified: a
shared mutable counter is exactly what the Dataset API cannot express.
"""

from __future__ import annotations

import ray

ACTOR_NAME = "fluent_bit_ray_metrics"


@ray.remote(num_cpus=0)
class MetricsActor:
    def __init__(self):
        self._counts: dict[str, list[int]] = {}

    def add(self, deltas: list[tuple[str, int, int]]) -> None:
        for stage, rin, rout in deltas:
            c = self._counts.setdefault(stage, [0, 0])
            c[0] += rin
            c[1] += rout

    def drain(self) -> dict[str, dict[str, int]]:
        out = {k: {"rows_in": v[0], "rows_out": v[1]}
               for k, v in self._counts.items()}
        self._counts = {}
        return out


def get_metrics_actor():
    """Get-or-create the named metrics actor (idempotent)."""
    try:
        return ray.get_actor(ACTOR_NAME)
    except ValueError:
        try:
            return MetricsActor.options(name=ACTOR_NAME, lifetime="detached") \
                .remote()
        except ValueError:  # lost the creation race
            return ray.get_actor(ACTOR_NAME)


def drain_metrics() -> dict:
    try:
        actor = ray.get_actor(ACTOR_NAME)
    except ValueError:
        return {}
    return ray.get(actor.drain.remote())
