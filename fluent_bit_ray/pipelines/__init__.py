from .pipeline import Pipeline, Routed  # noqa: F401
