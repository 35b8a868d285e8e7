from .base import Stage, build_stage, STAGE_TYPES  # noqa: F401
