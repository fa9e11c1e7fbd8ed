"""Cypher-ish MATCH parser.

Counterpart of ``velesql/parser/match_parser.rs`` + ``MatchClause``
(``velesql/ast/graph_pattern.rs:12``). Separate grammar module from SELECT
(like the reference) — patterns, variable-length hops, WHERE over bindings,
RETURN projection, ORDER BY (incl. similarity()), LIMIT::

    MATCH (a:Person {city: 'Paris'})-[r:KNOWS*1..2]->(b:Person)
    WHERE b.age > 30 AND similarity(b, $v) > 0.7
    RETURN a, b.name, similarity(b, $v) AS score
    ORDER BY score DESC LIMIT 10
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

from lark import Lark, Transformer, v_args

from velesdb_tpu.velesql.parser import ParseError, _interval_seconds, _Now

__all__ = ["MatchStatement", "NodePattern", "EdgePattern", "parse_match"]


@dataclasses.dataclass
class NodePattern:
    var: Optional[str]
    labels: list[str]
    props: dict


@dataclasses.dataclass
class EdgePattern:
    var: Optional[str]
    labels: list[str]
    direction: str  # out | in | both
    min_hops: int = 1
    max_hops: int = 1


@dataclasses.dataclass
class ReturnItem:
    expr: Any  # ("var", name) | ("field", var, path) | ("similarity", var, vec)
    alias: Optional[str] = None


@dataclasses.dataclass
class OrderItem:
    expr: Any
    desc: bool = False


@dataclasses.dataclass
class MatchStatement:
    nodes: list[NodePattern]
    edges: list[EdgePattern]
    where: Optional[list] = None  # list of condition dicts (conjunction)
    returns: list[ReturnItem] = dataclasses.field(default_factory=list)
    order_by: list[OrderItem] = dataclasses.field(default_factory=list)
    limit: Optional[int] = None


GRAMMAR = r"""
?start: match_stmt
match_stmt: "MATCH"i pattern where_part? "RETURN"i ret_items order_part? limit_part?

pattern: node_pat (edge_pat node_pat)*
node_pat: "(" NAME? label_spec* prop_map? ")"
label_spec: ":" NAME
prop_map: "{" prop_pair ("," prop_pair)* "}"
prop_pair: NAME ":" value

edge_pat: "-[" edge_body "]->"  -> edge_out
        | "<-[" edge_body "]-"  -> edge_in
        | "-[" edge_body "]-"   -> edge_both
edge_body: NAME? label_spec* hops?
hops: "*" (INT (".." INT)?)?

where_part: "WHERE"i cond ("AND"i cond)*
?cond: "similarity"i "(" NAME "," value ")" CMP_OP value -> sim_cond
     | field_ref CMP_OP value                            -> cmp_cond
     | field_ref "IN"i "(" value ("," value)* ")"        -> in_cond
     | field_ref "LIKE"i value                           -> like_cond
     | field_ref "IS"i "NOT"i "NULL"i                    -> notnull_cond
     | field_ref "IS"i "NULL"i                           -> null_cond
field_ref: NAME ("." NAME)+

ret_items: ret_item ("," ret_item)*
ret_item: ret_expr ("AS"i NAME)?
?ret_expr: "similarity"i "(" NAME "," value ")" -> ret_sim
         | field_ref -> ret_field
         | NAME -> ret_var

order_part: "ORDER"i "BY"i order_item ("," order_item)*
order_item: (NAME | field_ref) order_dir?
order_dir: "ASC"i -> asc
         | "DESC"i -> desc
limit_part: "LIMIT"i INT

?value: STRING -> str_
      | SIGNED_NUMBER -> num
      | "TRUE"i -> true_
      | "FALSE"i -> false_
      | "NULL"i -> null_
      | PARAM -> param
      | "NOW"i "(" ")" (PLUSMINUS "INTERVAL"i STRING)? -> now_expr

PLUSMINUS: "+" | "-"
CMP_OP: "==" | "=" | "!=" | "<>" | ">=" | "<=" | ">" | "<"
PARAM: /\$[a-zA-Z_][a-zA-Z0-9_]*/
NAME: /[a-zA-Z_][a-zA-Z0-9_]*/
STRING: /'([^']|'')*'/
%import common.SIGNED_NUMBER
%import common.INT
%import common.WS
%ignore WS
"""

_CMP = {
    "=": "eq",
    "==": "eq",
    "!=": "neq",
    "<>": "neq",
    ">": "gt",
    ">=": "gte",
    "<": "lt",
    "<=": "lte",
}


@v_args(inline=True)
class _ToMatch(Transformer):
    def str_(self, tok):
        return str(tok)[1:-1].replace("''", "'")

    def num(self, tok):
        f = float(tok)
        return int(f) if f.is_integer() and "." not in tok else f

    def true_(self):
        return True

    def false_(self):
        return False

    def null_(self):
        return None

    def param(self, tok):
        return str(tok)

    def now_expr(self, sign=None, interval=None):
        if sign is None:
            return _Now()
        secs = _interval_seconds(str(interval)[1:-1])
        return _Now(-secs if str(sign) == "-" else secs)

    def label_spec(self, name):
        return ("label", str(name))

    def prop_pair(self, name, value):
        return (str(name), value)

    def prop_map(self, *pairs):
        return ("props", dict(pairs))

    def node_pat(self, *parts):
        var, labels, props = None, [], {}
        for p in parts:
            if isinstance(p, tuple) and p[0] == "label":
                labels.append(p[1])
            elif isinstance(p, tuple) and p[0] == "props":
                props = p[1]
            else:
                var = str(p)  # bare NAME token = binding variable
        return NodePattern(var, labels, props)

    def hops(self, lo=None, hi=None):
        if lo is None:
            return (1, None)
        lo = int(lo)
        return (lo, int(hi) if hi is not None else lo)

    def edge_body(self, *parts):
        var, labels, hops = None, [], (1, 1)
        for p in parts:
            if isinstance(p, tuple) and p[0] == "label":
                labels.append(p[1])
            elif isinstance(p, tuple):
                hops = p
            else:
                var = str(p)
        return (var, labels, hops)

    def edge_out(self, body):
        return _mk_edge(body, "out")

    def edge_in(self, body):
        return _mk_edge(body, "in")

    def edge_both(self, body):
        return _mk_edge(body, "both")

    def field_ref(self, *names):
        return (str(names[0]), ".".join(str(n) for n in names[1:]))

    def sim_cond(self, var, vec, op, thr):
        o = _CMP[str(op)]
        if o in ("eq", "neq"):
            raise ParseError("similarity() supports >, >=, <, <= only")
        return {"kind": "sim", "var": str(var), "vector": vec, "op": o, "value": thr}

    def cmp_cond(self, ref, op, value):
        return {
            "kind": "cmp",
            "var": ref[0],
            "field": ref[1],
            "op": _CMP[str(op)],
            "value": value,
        }

    def in_cond(self, ref, *values):
        return {"kind": "in", "var": ref[0], "field": ref[1], "values": list(values)}

    def like_cond(self, ref, pat):
        return {"kind": "like", "var": ref[0], "field": ref[1], "pattern": pat}

    def null_cond(self, ref):
        return {"kind": "is_null", "var": ref[0], "field": ref[1]}

    def notnull_cond(self, ref):
        return {"kind": "is_not_null", "var": ref[0], "field": ref[1]}

    def where_part(self, *conds):
        return ("where", list(conds))

    def ret_sim(self, var, vec):
        return ("similarity", str(var), vec)

    def ret_field(self, ref):
        return ("field", ref[0], ref[1])

    def ret_var(self, name):
        return ("var", str(name))

    def ret_item(self, expr, alias=None):
        return ReturnItem(expr, str(alias) if alias is not None else None)

    def ret_items(self, *items):
        return ("returns", list(items))

    def order_item(self, expr, direction=None):
        if isinstance(expr, tuple):
            expr = ("field", expr[0], expr[1])
        else:
            expr = str(expr)
        return OrderItem(expr, desc=(direction == "desc"))

    def asc(self):
        return "asc"

    def desc(self):
        return "desc"

    def order_part(self, *items):
        return ("order", list(items))

    def limit_part(self, n):
        return ("limit", int(n))

    def pattern(self, *parts):
        nodes = [p for p in parts if isinstance(p, NodePattern)]
        edges = [p for p in parts if isinstance(p, EdgePattern)]
        return ("pattern", nodes, edges)

    def match_stmt(self, *parts):
        stmt = MatchStatement(nodes=[], edges=[])
        for p in parts:
            if p[0] == "pattern":
                stmt.nodes, stmt.edges = p[1], p[2]
            elif p[0] == "where":
                stmt.where = p[1]
            elif p[0] == "returns":
                stmt.returns = p[1]
            elif p[0] == "order":
                stmt.order_by = p[1]
            elif p[0] == "limit":
                stmt.limit = p[1]
        if len(stmt.nodes) != len(stmt.edges) + 1:
            raise ParseError("malformed MATCH pattern")
        return stmt


def _mk_edge(body, direction) -> EdgePattern:
    var, labels, (lo, hi) = body
    if hi is None:
        hi = 16  # unbounded "*" capped like the reference's guardrails
    if lo < 0 or hi < lo:
        raise ParseError(f"bad hop range *{lo}..{hi}")
    return EdgePattern(var, labels, direction, lo, hi)


_parser = Lark(GRAMMAR, parser="lalr", maybe_placeholders=False)
_transformer = _ToMatch()


def parse_match(text: str) -> MatchStatement:
    try:
        tree = _parser.parse(text)
        return _transformer.transform(tree)
    except ParseError:
        raise
    except Exception as e:
        raise ParseError(f"MATCH syntax error: {e}") from e
