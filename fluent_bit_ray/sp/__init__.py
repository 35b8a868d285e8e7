from .engine import sp_execute, sp_parse, sp_snapshot  # noqa: F401
