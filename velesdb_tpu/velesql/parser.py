"""VelesQL parser: lark LALR grammar -> AST.

Counterpart of the reference's pest grammar + parser
(``velesql/grammar.pest`` 251 lines, ``Parser::parse`` ``parser/mod.rs:84``).
Covers: SELECT [DISTINCT] cols FROM coll, WHERE with ``vector NEAR $v``,
``NEAR_FUSED [..] USING FUSION``, ``similarity(f, $v) > t``, ``MATCH 'text'``,
comparison/IN/BETWEEN/LIKE/ILIKE/IS NULL predicates, AND/OR/NOT, temporal
``NOW() - INTERVAL '7 days'``, GROUP BY/HAVING/ORDER BY (incl. similarity()),
LIMIT/OFFSET, ``WITH (ef_search=..)``, UNION/UNION ALL/INTERSECT/EXCEPT,
quoted identifiers and ``$param`` placeholders.

The WHERE tree is lowered at parse time into the split the executor wants
(NEAR clause + similarity conds + text match + residual filter DSL), the same
extraction the reference does per query (``search/query/extraction.rs``).
"""

from __future__ import annotations

import time

from lark import Lark, Transformer, v_args

from velesdb_tpu.velesql.ast import (
    Aggregate,
    FusionSpec,
    JoinClause,
    NearClause,
    OrderBy,
    Query,
    SelectItem,
    SelectStatement,
    SetOp,
    SimilarityCond,
    TextMatch,
    WithOptions,
)

__all__ = ["parse", "ParseError"]

_AGG_FUNCS = {"count", "sum", "avg", "min", "max"}
_CMP_FLIP = {"gt": "lt", "gte": "lte", "lt": "gt", "lte": "gte"}

GRAMMAR = r"""
?start: set_expr

?set_expr: select_stmt
         | set_expr "UNION"i "ALL"i select_stmt -> union_all
         | set_expr "UNION"i select_stmt        -> union
         | set_expr "INTERSECT"i select_stmt    -> intersect
         | set_expr "EXCEPT"i select_stmt       -> except_

select_stmt: "SELECT"i distinct? projection "FROM"i table_ref join_clause* \
             where_clause? group_clause? having_clause? order_clause? \
             limit_clause? offset_clause? with_clause?

table_ref: ident ("AS"i ident)?
join_clause: "JOIN"i table_ref join_cond            -> join_inner
           | "INNER"i "JOIN"i table_ref join_cond   -> join_inner
           | "LEFT"i "OUTER"i "JOIN"i table_ref join_cond  -> join_left
           | "LEFT"i "JOIN"i table_ref join_cond    -> join_left
           | "RIGHT"i "OUTER"i "JOIN"i table_ref join_cond -> join_right
           | "RIGHT"i "JOIN"i table_ref join_cond   -> join_right
           | "FULL"i "OUTER"i "JOIN"i table_ref join_cond  -> join_full
           | "FULL"i "JOIN"i table_ref join_cond    -> join_full
join_cond: "ON"i ident_path CMP_OP ident_path -> join_on
         | "USING"i "(" ident ")" -> join_using

distinct: "DISTINCT"i
projection: STAR -> star_proj
          | sel_item ("," sel_item)*
sel_item: expr ("AS"i ident)?
?expr: func_call
     | ident_path -> field_expr
func_call: NAME "(" func_args? ")"
func_args: func_arg ("," func_arg)*
?func_arg: ident_path -> field_expr
         | value
         | STAR -> star_arg

where_clause: "WHERE"i or_expr
?or_expr: and_expr ("OR"i and_expr)*
?and_expr: not_expr ("AND"i not_expr)*
?not_expr: "NOT"i not_expr -> not_
         | "(" or_expr ")"
         | predicate

?predicate: ident_path "NEAR_FUSED"i vec_list "USING"i "FUSION"i fusion_spec -> near_fused
          | ident_path "NEAR"i vector_atom -> near
          | func_call CMP_OP value -> func_cmp
          | ident_path "MATCH"i value -> text_match
          | ident_path CMP_OP value -> cmp
          | ident_path "NOT"i "IN"i "(" select_stmt ")" -> not_in_subquery
          | ident_path "IN"i "(" select_stmt ")" -> in_subquery
          | "EXISTS"i "(" select_stmt ")" -> exists_subquery
          | ident_path CMP_OP "(" select_stmt ")" -> cmp_subquery
          | "(" select_stmt ")" CMP_OP value -> cmp_subquery_l
          | ident_path CMP_OP ident_path -> field_cmp
          | ident_path "NOT"i "IN"i "(" value ("," value)* ")" -> not_in
          | ident_path "IN"i "(" value ("," value)* ")" -> in_
          | ident_path "NOT"i "BETWEEN"i value "AND"i value -> not_between
          | ident_path "BETWEEN"i value "AND"i value -> between
          | ident_path "NOT"i "LIKE"i value -> not_like
          | ident_path "LIKE"i value -> like
          | ident_path "NOT"i "ILIKE"i value -> not_ilike
          | ident_path "ILIKE"i value -> ilike
          | ident_path "IS"i "NOT"i "NULL"i -> is_not_null
          | ident_path "IS"i "NULL"i -> is_null

vec_list: "[" vector_atom ("," vector_atom)* "]"
?vector_atom: PARAM -> param
            | num_array
num_array: "[" number ("," number)* "]"
fusion_spec: NAME fusion_args?
fusion_args: "(" fusion_arg ("," fusion_arg)* ")"
fusion_arg: NAME "=" value -> kw_arg
          | value

group_clause: "GROUP"i "BY"i ident_path ("," ident_path)*
having_clause: "HAVING"i func_call CMP_OP value
order_clause: "ORDER"i "BY"i order_item ("," order_item)*
order_item: (func_call | ident_path) order_dir?
order_dir: "ASC"i -> asc
         | "DESC"i -> desc
limit_clause: "LIMIT"i INT
offset_clause: "OFFSET"i INT
with_clause: "WITH"i "(" with_item ("," with_item)* ")"
with_item: NAME "=" value

?value: string
      | number
      | "TRUE"i -> true_
      | "FALSE"i -> false_
      | "NULL"i -> null_
      | PARAM -> param
      | temporal
temporal: "NOW"i "(" ")" (PLUSMINUS "INTERVAL"i string)? -> now_expr
        | "INTERVAL"i string -> interval

ident_path: ident ("." ident)*
ident: NAME | QUOTED_IDENT
?number: SIGNED_NUMBER -> num
?string: STRING -> str_

STAR: "*"
PLUSMINUS: "+" | "-"
CMP_OP: "==" | "=" | "!=" | "<>" | ">=" | "<=" | ">" | "<"
PARAM: /\$[a-zA-Z_][a-zA-Z0-9_]*/
NAME: /[a-zA-Z_][a-zA-Z0-9_]*/
QUOTED_IDENT: /"[^"]+"/
STRING: /'([^']|'')*'/
%import common.SIGNED_NUMBER
%import common.INT
%import common.WS
%ignore WS
"""


class ParseError(ValueError):
    """Raised on any syntactic or structural VelesQL error."""


def _cmp_name(op: str) -> str:
    return {
        "=": "eq",
        "==": "eq",
        "!=": "neq",
        "<>": "neq",
        ">": "gt",
        ">=": "gte",
        "<": "lt",
        "<=": "lte",
    }[op]


_INTERVAL_UNITS = {
    "second": 1.0,
    "seconds": 1.0,
    "minute": 60.0,
    "minutes": 60.0,
    "hour": 3600.0,
    "hours": 3600.0,
    "day": 86400.0,
    "days": 86400.0,
    "week": 604800.0,
    "weeks": 604800.0,
    "month": 2592000.0,
    "months": 2592000.0,
    "year": 31536000.0,
    "years": 31536000.0,
}


def _interval_seconds(text: str) -> float:
    parts = text.split()
    if len(parts) != 2:
        raise ParseError(f"bad INTERVAL {text!r} (want '<n> <unit>')")
    try:
        n = float(parts[0])
    except ValueError as e:
        raise ParseError(f"bad INTERVAL amount {parts[0]!r}") from e
    unit = parts[1].lower()
    if unit not in _INTERVAL_UNITS:
        raise ParseError(f"bad INTERVAL unit {unit!r}")
    return n * _INTERVAL_UNITS[unit]


class _Now:
    """Deferred NOW() ± INTERVAL — resolved to epoch seconds at execution."""

    def __init__(self, offset: float = 0.0):
        self.offset = offset

    def resolve(self) -> float:
        return time.time() + self.offset


class _Interval:
    def __init__(self, seconds: float):
        self.seconds = seconds


@v_args(inline=True)
class _ToAst(Transformer):
    # -- scalars ------------------------------------------------------------
    def num(self, tok):
        f = float(tok)
        return int(f) if f.is_integer() and "." not in tok and "e" not in tok.lower() else f

    def str_(self, tok):
        return str(tok)[1:-1].replace("''", "'")

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
        secs = _interval_seconds(interval)
        return _Now(-secs if str(sign) == "-" else secs)

    def interval(self, s):
        return _Interval(_interval_seconds(s))

    def ident(self, tok):
        s = str(tok)
        return s[1:-1] if s.startswith('"') else s

    def ident_path(self, *parts):
        return ".".join(parts)

    def num_array(self, *nums):
        return list(nums)

    def vec_list(self, *vecs):
        return list(vecs)

    def star_proj(self, _tok):
        return ["*"]

    def star_arg(self, _tok):
        return "*"

    # -- expressions ----------------------------------------------------------
    def field_expr(self, path):
        return path

    def func_args(self, *args):
        return list(args)

    def func_call(self, name, args=None):
        fname = str(name).lower()
        args = args or []
        if fname == "similarity":
            if len(args) != 2:
                raise ParseError("similarity() takes (field, $vector)")
            return ("similarity", args[0], args[1])
        if fname in _AGG_FUNCS:
            if fname == "count" and (not args or args == ["*"]):
                return Aggregate("count", None)
            if len(args) != 1 or not isinstance(args[0], str):
                raise ParseError(f"{fname}() takes one field")
            return Aggregate(fname, args[0])
        raise ParseError(f"unknown function {fname!r}")

    def sel_item(self, expr, alias=None):
        return SelectItem(expr, alias)

    def projection(self, *items):
        return list(items)

    def distinct(self):
        return True

    # -- predicates -> tagged nodes -------------------------------------------
    def near(self, field, vec):
        return ("near", NearClause(field, [vec]))

    def near_fused(self, field, vecs, fusion):
        return ("near", NearClause(field, vecs, fused=True, fusion=fusion))

    def fusion_spec(self, name, args=None):
        strat = str(name).lower()
        rrf_k, weights, pos = 60, None, []
        for a in args or []:
            if isinstance(a, tuple) and a[0] == "kw":
                if a[1] == "k":
                    rrf_k = int(a[2])
                else:
                    raise ParseError(f"unknown fusion arg {a[1]!r}")
            else:
                pos.append(float(a))
        if pos:
            weights = pos
        return FusionSpec(strat, rrf_k=rrf_k, weights=weights)

    def fusion_args(self, *args):
        return list(args)

    def kw_arg(self, name, value):
        return ("kw", str(name).lower(), value)

    def func_cmp(self, fn, op, value):
        if not (isinstance(fn, tuple) and fn[0] == "similarity"):
            raise ParseError("only similarity() may appear in comparisons")
        opn = _cmp_name(str(op))
        if opn in ("eq", "neq"):
            raise ParseError("similarity() supports >, >=, <, <= only")
        return ("sim", SimilarityCond(fn[1], fn[2], opn, value))

    def text_match(self, field, q):
        return ("match", TextMatch(field, q))

    def cmp(self, field, op, value):
        return {"type": _cmp_name(str(op)), "field": field, "value": value}

    def in_(self, field, *values):
        return {"type": "in", "field": field, "values": list(values)}

    def not_in(self, field, *values):
        return ("not", self.in_(field, *values))

    def in_subquery(self, field, sub):
        # subquery predicates carry a `correlations` list filled in when the
        # ENCLOSING statement assembles (reference: EPIC-039 US-003,
        # parser/values.rs:338 detect_correlated_columns); empty = the
        # materialize-once fast path of subquery_optimizer.rs
        return {"type": "in_subquery", "field": field, "query": sub,
                "correlations": []}

    def not_in_subquery(self, field, sub):
        return ("not", self.in_subquery(field, sub))

    def exists_subquery(self, sub):
        return {"type": "exists_subquery", "query": sub, "correlations": []}

    def cmp_subquery(self, field, op, sub):
        # scalar subquery comparison: total > (SELECT AVG(total) FROM t)
        return {"type": "cmp_subquery", "field": field,
                "op": _cmp_name(str(op)), "query": sub, "correlations": []}

    def cmp_subquery_l(self, sub, op, value):
        # scalar subquery on the LEFT: (SELECT COUNT(*) ...) = 0;
        # field None marks the literal-comparison form for the executor
        return {"type": "cmp_subquery", "field": None,
                "op": _cmp_name(str(op)), "value": value,
                "query": sub, "correlations": []}

    def field_cmp(self, left, op, right):
        # column-to-column comparison; inside a subquery a side qualified
        # with the outer alias makes the subquery correlated
        return {"type": "field_cmp", "field": left,
                "op": _cmp_name(str(op)), "rhs_field": right}

    # -- joins -----------------------------------------------------------------
    def table_ref(self, name, alias=None):
        return ("table", name, alias)

    def join_on(self, left, op, right):
        if _cmp_name(str(op)) != "eq":
            raise ParseError("JOIN ... ON supports equality only")
        return ("on", left, right)

    def join_using(self, field):
        return ("using", field)

    def _join(self, kind, table, cond):
        _, name, alias = table
        alias = alias or name
        if cond[0] == "using":
            left_f = right_f = cond[1]
        else:
            left_f, right_f = cond[1], cond[2]
        return ("join", JoinClause(kind, name, alias, left_f, right_f))

    def join_inner(self, table, cond):
        return self._join("inner", table, cond)

    def join_left(self, table, cond):
        return self._join("left", table, cond)

    def join_right(self, table, cond):
        return self._join("right", table, cond)

    def join_full(self, table, cond):
        return self._join("full", table, cond)

    def between(self, field, lo, hi):
        return {
            "type": "and",
            "conditions": [
                {"type": "gte", "field": field, "value": lo},
                {"type": "lte", "field": field, "value": hi},
            ],
        }

    def not_between(self, field, lo, hi):
        return ("not", self.between(field, lo, hi))

    def like(self, field, pat):
        return {"type": "like", "field": field, "pattern": pat}

    def not_like(self, field, pat):
        return ("not", self.like(field, pat))

    def ilike(self, field, pat):
        return {"type": "ilike", "field": field, "pattern": pat}

    def not_ilike(self, field, pat):
        return ("not", self.ilike(field, pat))

    def is_null(self, field):
        return {"type": "is_null", "field": field}

    def is_not_null(self, field):
        return {"type": "is_not_null", "field": field}

    def not_(self, inner):
        return ("not", inner)

    def or_expr(self, *branches):
        return ("or", list(branches))

    def and_expr(self, *branches):
        return ("and", list(branches))

    # -- clauses ----------------------------------------------------------------
    def where_clause(self, tree):
        return ("where", tree)

    def group_clause(self, *fields):
        return ("group", list(fields))

    def having_clause(self, fn, op, value):
        if not isinstance(fn, Aggregate):
            raise ParseError("HAVING requires an aggregate")
        return ("having", {"agg": fn, "op": _cmp_name(str(op)), "value": value})

    def order_item(self, expr, direction=None):
        return OrderBy(expr, desc=(direction == "desc"))

    def asc(self):
        return "asc"

    def desc(self):
        return "desc"

    def order_clause(self, *items):
        return ("order", list(items))

    def limit_clause(self, n):
        return ("limit", int(n))

    def offset_clause(self, n):
        return ("offset", int(n))

    def with_item(self, name, value):
        return (str(name).lower(), value)

    def with_clause(self, *items):
        opts = WithOptions()
        for name, value in items:
            if name == "ef_search":
                opts.ef_search = int(value)
            elif name == "quality":
                opts.quality = str(value)
            else:
                raise ParseError(f"unknown WITH option {name!r}")
        return ("with", opts)

    # -- statement ----------------------------------------------------------------
    def select_stmt(self, *parts):
        parts = list(parts)
        distinct = False
        if parts and parts[0] is True:
            distinct = True
            parts.pop(0)
        columns_raw = parts.pop(0)
        table = parts.pop(0)  # ("table", name, alias)
        if columns_raw == ["*"]:
            columns = [SelectItem("*")]
        else:
            columns = list(columns_raw)
        stmt = SelectStatement(
            columns=columns,
            distinct=distinct,
            collection=table[1],
            alias=table[2] or table[1],
        )
        while parts and isinstance(parts[0], tuple) and parts[0][0] == "join":
            stmt.joins.append(parts.pop(0)[1])
        for tag, payload in parts:
            if tag == "where":
                _lower_where(stmt, payload)
            elif tag == "group":
                stmt.group_by = payload
            elif tag == "having":
                stmt.having = payload
            elif tag == "order":
                stmt.order_by = payload
            elif tag == "limit":
                stmt.limit = payload
            elif tag == "offset":
                stmt.offset = payload
            elif tag == "with":
                stmt.with_options = payload
        _detect_correlations(stmt)
        return stmt

    def union(self, left, right):
        return SetOp("union", left, right)

    def union_all(self, left, right):
        return SetOp("union_all", left, right)

    def intersect(self, left, right):
        return SetOp("intersect", left, right)

    def except_(self, left, right):
        return SetOp("except", left, right)


def subquery_nodes(cond):
    """Yield every subquery predicate dict in a filter tree (any depth)."""
    if not isinstance(cond, dict):
        return
    t = cond.get("type")
    if t in ("and", "or"):
        for c in cond.get("conditions", []):
            yield from subquery_nodes(c)
    elif t == "not":
        yield from subquery_nodes(cond.get("condition") or {})
    elif t in ("in_subquery", "exists_subquery", "cmp_subquery"):
        yield cond


def _flip_cmp(op: str) -> str:
    return {"eq": "eq", "neq": "neq", "gt": "lt", "gte": "lte",
            "lt": "gt", "lte": "gte"}[op]


def _detect_correlations(stmt: SelectStatement) -> None:
    """Mark subquery predicates that reference the enclosing statement.

    Analog of the reference's ``detect_correlated_columns`` (EPIC-039
    US-003, ``parser/values.rs:338``): inside a subquery's WHERE, a field
    qualified with the OUTER statement's alias (or collection name) is a
    correlated reference — unless the subquery's own alias shadows it (same
    table name = non-correlated, per the reference's semantics). Detection
    is single-level: a depth-2 subquery can correlate only to its immediate
    parent. Each entry records the comparison normalized to
    ``inner OP outer_value`` form so the executor can substitute or
    join-rewrite without re-deriving directions.
    """
    if stmt.filter is None:
        return
    outer_names = {stmt.alias or stmt.collection, stmt.collection}
    for node in subquery_nodes(stmt.filter):
        sub = node["query"]
        names = outer_names - {
            sub.alias or sub.collection,
            sub.collection,
            *(j.alias for j in sub.joins),
        }
        if not names or sub.filter is None:
            continue
        _collect_correlated(sub.filter, names, node["correlations"])


def _collect_correlated(cond, outer_names: set, out: list) -> None:
    if not isinstance(cond, dict):
        return
    t = cond.get("type")
    if t in ("and", "or"):
        for c in cond.get("conditions", []):
            _collect_correlated(c, outer_names, out)
    elif t == "not":
        _collect_correlated(cond.get("condition") or {}, outer_names, out)
    elif t == "field_cmp":
        l_outer = cond["field"].split(".", 1)[0] in outer_names
        r_outer = cond["rhs_field"].split(".", 1)[0] in outer_names
        if l_outer and r_outer:
            raise ParseError(
                "correlated comparison references the outer query on both sides"
            )
        if l_outer or r_outer:
            out.append({
                "kind": "join",
                "op": cond["op"] if r_outer else _flip_cmp(cond["op"]),
                "inner": cond["rhs_field"] if l_outer else cond["field"],
                "outer": cond["field"] if l_outer else cond["rhs_field"],
                "node": cond,
            })
    elif cond.get("field", "").split(".", 1)[0] in outer_names:
        # outer-referencing predicate with a literal (e.g. o.vip = TRUE):
        # constant per outer row — forces the PerRow strategy
        out.append({"kind": "pred", "node": cond})


def _is_special(node) -> bool:
    """True if the node (sub)tree holds NEAR/similarity/MATCH predicates."""
    if isinstance(node, tuple):
        if node[0] in ("near", "sim", "match"):
            return True
        if node[0] in ("and", "or"):
            return any(_is_special(c) for c in node[1])
        if node[0] == "not":
            return _is_special(node[1])
    return False


def _lower_where(stmt: SelectStatement, tree) -> None:
    """Split the WHERE tree into NEAR / similarity / MATCH / residual filter.

    Mirrors the reference's extraction + mode select
    (``search/query/mod.rs:90-160``): a top-level ``OR`` between a
    similarity branch and a metadata branch selects *union mode*.
    """
    if isinstance(tree, tuple) and tree[0] == "or":
        special = [b for b in tree[1] if _is_special(b)]
        plain = [b for b in tree[1] if not _is_special(b)]
        if special and plain:
            stmt.where_mode = "or"
            for b in special:
                _extract_conjunct(stmt, b)
            stmt.filter = _to_filter(("or", plain) if len(plain) > 1 else plain[0])
            return
    conjuncts = tree[1] if isinstance(tree, tuple) and tree[0] == "and" else [tree]
    residual = []
    for c in conjuncts:
        if _is_special(c):
            _extract_conjunct(stmt, c)
        else:
            residual.append(c)
    if residual:
        stmt.filter = _to_filter(
            ("and", residual) if len(residual) > 1 else residual[0]
        )


def _extract_conjunct(stmt: SelectStatement, node) -> None:
    if isinstance(node, tuple) and node[0] == "near":
        if stmt.near is not None:
            raise ParseError("multiple NEAR clauses in one query")
        stmt.near = node[1]
    elif isinstance(node, tuple) and node[0] == "sim":
        stmt.similarity.append(node[1])
    elif isinstance(node, tuple) and node[0] == "match":
        if stmt.text_match is not None:
            raise ParseError("multiple MATCH clauses in one query")
        stmt.text_match = node[1]
    elif isinstance(node, tuple) and node[0] == "not" and isinstance(
        node[1], tuple
    ) and node[1][0] == "sim":
        sim = node[1][1]
        stmt.similarity.append(
            SimilarityCond(sim.field, sim.vector, sim.op, sim.threshold, negated=True)
        )
    elif isinstance(node, tuple) and node[0] == "and":
        for c in node[1]:
            if _is_special(c):
                _extract_conjunct(stmt, c)
            else:
                stmt.filter = (
                    _to_filter(c)
                    if stmt.filter is None
                    else {"type": "and", "conditions": [stmt.filter, _to_filter(c)]}
                )
    else:
        raise ParseError(
            "NEAR/similarity/MATCH must appear in a top-level conjunction "
            "(or one OR branch)"
        )


def _to_filter(node) -> dict:
    """Condition tree -> filter-DSL tagged dict."""
    if isinstance(node, dict):
        return node
    if isinstance(node, tuple):
        if node[0] == "and":
            return {"type": "and", "conditions": [_to_filter(c) for c in node[1]]}
        if node[0] == "or":
            return {"type": "or", "conditions": [_to_filter(c) for c in node[1]]}
        if node[0] == "not":
            return {"type": "not", "condition": _to_filter(node[1])}
    raise ParseError(f"cannot use {node!r} as a metadata filter")


# the transformer runs INLINE during LALR shifts (tree-less parse): 5.4x
# faster than parse-then-transform (43us vs 235us on a simple SELECT).
# _ToAst is stateless, so one instance is safe across parses.
_parser = Lark(
    GRAMMAR, parser="lalr", maybe_placeholders=False, transformer=_ToAst()
)


def parse(text: str) -> Query:
    """Parse VelesQL text into a :class:`Query` (``Parser::parse`` analog)."""
    try:
        root = _parser.parse(text)
    except ParseError:
        raise
    except Exception as e:  # lark exceptions -> uniform ParseError
        raise ParseError(f"VelesQL syntax error: {e}") from e
    return Query(root=root, text=text)
