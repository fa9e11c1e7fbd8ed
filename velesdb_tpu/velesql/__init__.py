"""VelesQL: SQL dialect over vectors + text + columns (+ graph MATCH).

Grammar/parser/AST/executor/cache/EXPLAIN — counterpart of
``velesdb-core/src/velesql/`` (SURVEY.md §2.4).
"""

from velesdb_tpu.velesql.ast import Query, SelectStatement, SetOp
from velesdb_tpu.velesql.cache import QueryCache
from velesdb_tpu.velesql.executor import QueryError, execute
from velesdb_tpu.velesql.explain import explain
from velesdb_tpu.velesql.parser import ParseError, parse

__all__ = [
    "parse",
    "execute",
    "explain",
    "Query",
    "SelectStatement",
    "SetOp",
    "QueryCache",
    "ParseError",
    "QueryError",
]
