"""Session/statement/result engine (the reference's gateway surface)."""

from .ddl import parse_statement, split_statements
from .engine import Engine, SessionManager
from .statement import (
    BatchStatement,
    ImmediateStatement,
    ResultPage,
    Statement,
    StreamingStatement,
)

__all__ = [
    "Engine",
    "SessionManager",
    "Statement",
    "BatchStatement",
    "StreamingStatement",
    "ImmediateStatement",
    "ResultPage",
    "parse_statement",
    "split_statements",
]
