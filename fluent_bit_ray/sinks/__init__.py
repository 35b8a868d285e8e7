from .aggregates import counter_total, flowcounter  # noqa: F401
from .formats import format_batch, write_sink  # noqa: F401
