from .core import (  # noqa: F401
    JsonParser,
    LogfmtParser,
    LtsvParser,
    Parser,
    RegexParser,
    apply_decoders,
    build_parser,
    typecast,
)
from .timeparse import parse_time_column  # noqa: F401
