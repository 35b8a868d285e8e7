from .lineage import LineageRunner, write_routed_sinks  # noqa: F401
