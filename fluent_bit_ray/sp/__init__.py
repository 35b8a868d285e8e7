from .engine import sp_execute, sp_parse  # noqa: F401
