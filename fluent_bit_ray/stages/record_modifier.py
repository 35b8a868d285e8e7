"""record_modifier filter — append static kv; remove/whitelist keys.

Reference plugins/filter_record_modifier/filter_modifier.c:251 (cb),
:119 (remove_keys and whitelist_keys are mutually exclusive). Appended
records go at the end of the map; key filtering applies to the dynamic
fields map (fixed transcript columns are the immutable envelope).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .base import Stage, decode_fields_subset, register, scatter_fields


@register("record_modifier")
class RecordModifierStage(Stage):
    def __init__(self, records: list[tuple[str, str]] | None = None,
                 remove_keys: list[str] | None = None,
                 whitelist_keys: list[str] | None = None, **kw):
        super().__init__(**kw)
        if remove_keys and whitelist_keys:
            raise ValueError("remove_keys and whitelist_keys are exclusive "
                             "with each other")  # filter_modifier.c:119
        self.records = records or []
        self.remove_keys = set(remove_keys or [])
        self.whitelist_keys = set(whitelist_keys) if whitelist_keys else None

    def transform(self, batch: pa.Table, mask: np.ndarray) -> pa.Table:
        idx = np.nonzero(mask)[0]
        dicts = decode_fields_subset(batch, idx)
        out = []
        for d in dicts:
            if self.whitelist_keys is not None:
                d = {k: v for k, v in d.items() if k in self.whitelist_keys}
            elif self.remove_keys:
                d = {k: v for k, v in d.items() if k not in self.remove_keys}
            for k, v in self.records:
                d[k] = v
            out.append(d)
        return scatter_fields(batch, idx, out)
