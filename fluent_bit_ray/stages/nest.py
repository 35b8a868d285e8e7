"""nest filter — nest keys under a submap, or lift a submap up.

Reference plugins/filter_nest (nest.h:27-46, apply nest.c:483-514):
- operation "nest": keys matching any Wildcard entry (exact, or prefix
  when the entry ends with '*' — nest.c:300-311) are removed and
  re-packed as a submap appended at the END under ``nest_under``;
  optional ``remove_prefix`` strips a prefix from nested key names.
- operation "lift": the map value of ``nested_under`` is removed and
  its entries appended at the END; optional ``add_prefix``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .base import Stage, decode_fields_subset, register, scatter_fields


@register("nest")
class NestStage(Stage):
    def __init__(self, operation: str, wildcard: list[str] | None = None,
                 nest_under: str | None = None, nested_under: str | None = None,
                 remove_prefix: str = "", add_prefix: str = "", **kw):
        super().__init__(**kw)
        if operation not in ("nest", "lift"):
            raise ValueError(f"operation must be nest|lift, got {operation!r}")
        if operation == "nest" and not nest_under:
            raise ValueError("nest requires nest_under")
        if operation == "lift" and not nested_under:
            raise ValueError("lift requires nested_under")
        self.operation = operation
        self.nest_under = nest_under
        self.nested_under = nested_under
        self.remove_prefix = remove_prefix
        self.add_prefix = add_prefix
        self.exact = {w for w in (wildcard or []) if not w.endswith("*")}
        self.prefixes = [w[:-1] for w in (wildcard or []) if w.endswith("*")]

    def _matches(self, key: str) -> bool:
        return key in self.exact or any(key.startswith(p) for p in self.prefixes)

    def _apply(self, d: dict) -> dict:
        if self.operation == "nest":
            keep, nested = {}, {}
            for k, v in d.items():
                if self._matches(k):
                    nk = k
                    if self.remove_prefix and nk.startswith(self.remove_prefix):
                        nk = nk[len(self.remove_prefix):]
                    nested[nk] = v
                else:
                    keep[k] = v
            if nested:
                keep[self.nest_under] = nested
            return keep
        # lift
        if self.nested_under not in d or not isinstance(d[self.nested_under], dict):
            return d
        out = {k: v for k, v in d.items() if k != self.nested_under}
        for k, v in d[self.nested_under].items():
            out[self.add_prefix + k] = v
        return out

    def transform(self, batch: pa.Table, mask: np.ndarray) -> pa.Table:
        idx = np.nonzero(mask)[0]
        dicts = decode_fields_subset(batch, idx)
        return scatter_fields(batch, idx, [self._apply(d) for d in dicts])
