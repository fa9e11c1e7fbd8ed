"""VelesQL executor: lower the AST onto the collection's device kernels.

Counterpart of ``Collection::execute_query`` (``search/query/mod.rs:78``) and
its satellites (aggregation.rs, ordering.rs, distinct.rs, extraction.rs).
Key differences from the reference, by design:

- filters compile to **mask pushdown** into the distance/BM25 kernels instead
  of the reference's 10x over-fetch + post-filter (``mod.rs:95-160``);
- NEAR + MATCH in one query fuse via RRF on device-computed top lists;
- similarity() thresholds evaluate against device-scored candidates.

Rows come back as plain dicts (JSON-ready for the REST/CLI surfaces).
"""

from __future__ import annotations

from dataclasses import replace
from typing import Any

import numpy as np

from velesdb_tpu.column.filter import _cmp as _filter_cmp
from velesdb_tpu.column.filter import get_path, matches, normalize_filter
from velesdb_tpu.fusion import FusionStrategy, rrf_fuse
from velesdb_tpu.ops import DistanceMetric
from velesdb_tpu.velesql.ast import (
    Aggregate,
    OrderBy,
    Query,
    SelectItem,
    SelectStatement,
    SetOp,
)
from velesdb_tpu.velesql.parser import ParseError, _Now

__all__ = ["execute", "QueryError", "DEFAULT_LIMIT"]

DEFAULT_LIMIT = 10  # reference default top-k for similarity queries


class QueryError(ValueError):
    pass


def execute(db, query: Query, params: dict | None = None, limits=None) -> list[dict]:
    """Execute a parsed query against a Database. Returns rows as dicts.

    ``limits`` (a :class:`~velesdb_tpu.utils.config.LimitsConfig`) gates
    resource consumption before any device work (``validation.rs`` analog).
    """
    from velesdb_tpu.velesql.validation import ValidationError, validate_query

    try:
        validate_query(query.root, limits)
    except ValidationError as e:
        raise QueryError(str(e)) from e
    return _exec_node(db, query.root, params or {})


def _exec_node(db, node, params) -> list[dict]:
    if isinstance(node, SetOp):
        left = _exec_node(db, node.left, params)
        right = _exec_node(db, node.right, params)
        return _apply_setop(node.op, left, right)
    if isinstance(node, SelectStatement):
        return _exec_select(db, node, params)
    raise QueryError(f"unsupported query node {type(node).__name__}")


def _apply_setop(op: str, left: list[dict], right: list[dict]) -> list[dict]:
    """UNION/UNION ALL/INTERSECT/EXCEPT by row id (set ops of the reference's
    grammar; id-keyed like the reference's result sets)."""
    if op == "union_all":
        return left + right
    rids = {r.get("id") for r in right}
    if op == "union":
        seen = set()
        out = []
        for r in left + right:
            rid = r.get("id")
            if rid in seen:
                continue
            seen.add(rid)
            out.append(r)
        return out
    if op == "intersect":
        return [r for r in left if r.get("id") in rids]
    if op == "except":
        return [r for r in left if r.get("id") not in rids]
    raise QueryError(f"unknown set op {op}")


# ---------------------------------------------------------------------------


def _resolve_value(v, params):
    if isinstance(v, str) and v.startswith("$"):
        name = v[1:]
        if name not in params:
            raise QueryError(f"missing parameter ${name}")
        return params[name]
    if isinstance(v, _Now):
        return v.resolve()
    return v


def _resolve_vector(v, params) -> np.ndarray:
    vec = _resolve_value(v, params)
    arr = np.asarray(vec, dtype=np.float32)
    if arr.ndim != 1:
        raise QueryError(f"vector parameter must be 1-D, got shape {arr.shape}")
    return arr


def _resolve_filter(db, cond, params, outer=None):
    """Resolve $params / NOW() / subqueries in a filter tree (copy-on-write).

    Subquery strategy selection (``subquery_optimizer.rs`` analog):
    non-correlated subqueries materialize ONCE (CacheResult); correlated
    ones run as a hash semi-join when every correlation is a top-level
    equality conjunct (RewriteAsJoin), else per outer row (PerRow) capped
    at :data:`CORRELATED_PERROW_MAX`. ``outer`` is ``(collection,
    {alias, collection_name})`` of the enclosing SELECT.
    """
    if cond is None:
        return None
    out = dict(cond)
    t = out.get("type")
    if t in ("and", "or"):
        out["conditions"] = [
            _resolve_filter(db, c, params, outer) for c in out["conditions"]
        ]
    elif t == "not":
        out["condition"] = _resolve_filter(db, out["condition"], params, outer)
    elif t in ("in_subquery", "exists_subquery", "cmp_subquery"):
        return _resolve_subquery(db, out, params, outer)
    else:
        if "value" in out:
            out["value"] = _resolve_value(out["value"], params)
        if "values" in out:
            out["values"] = [_resolve_value(v, params) for v in out["values"]]
        if "pattern" in out:
            out["pattern"] = _resolve_value(out["pattern"], params)
    return out


def _subquery_values(rows: list[dict]) -> list:
    """Single projected column of a subquery's rows (falls back to id)."""
    if not rows:
        return []
    keys = [k for k in rows[0] if k not in ("payload",)]
    key = keys[0] if len(keys) == 1 else "id"
    return [r.get(key) for r in rows]


def _subquery_scalar(rows: list[dict]):
    """First row's single projected value (scalar subquery result)."""
    if not rows:
        return None
    keys = [k for k in rows[0] if k not in ("payload",)]
    key = keys[0] if len(keys) == 1 else "id"
    return rows[0].get(key)


# -- correlated subqueries (EPIC-039 / subquery_optimizer.rs analog) ---------

# PerRow executions allowed before we refuse (the reference's
# SubqueryOptConfig.cache_threshold default)
CORRELATED_PERROW_MAX = 10_000


def _true_cond() -> dict:
    return {"type": "and", "conditions": []}  # matches everything


def _false_cond() -> dict:
    return {"type": "or", "conditions": []}  # matches nothing


def _resolve_subquery(db, node, params, outer):
    sub = node.pop("query")
    corr = node.pop("correlations", [])
    t = node["type"]
    if corr:
        if outer is None:
            raise QueryError("correlated subquery is not supported in this context")
        return _exec_correlated(db, node, sub, corr, params, outer)
    rows = _exec_node(db, sub, params)
    if t == "in_subquery":
        node["type"] = "in"
        node["values"] = _subquery_values(rows)
        return node
    if t == "exists_subquery":
        return _true_cond() if rows else _false_cond()
    val = _subquery_scalar(rows)  # cmp_subquery
    if node.get("field") is None:
        # literal form: (SELECT ...) OP value — constant for the whole query
        lit = _resolve_value(node.get("value"), params)
        return _true_cond() if _cmp_vals(val, lit, node["op"]) else _false_cond()
    if val is None:
        return _false_cond()  # SQL: comparison with NULL scalar is never true
    return {"type": node["op"], "field": node["field"], "value": val}


def _strip_prefix(path: str, names: set) -> str:
    head, _, rest = path.partition(".")
    return rest if rest and head in names else path


def _outer_value(row: dict, path: str, outer_names: set):
    path = _strip_prefix(path, outer_names)
    if path == "id":
        return row["id"]
    return get_path(row.get("payload"), path)


def _cmp_vals(a, b, op: str) -> bool:
    if a is None or b is None:
        return False
    if op == "eq":
        return a == b
    if op == "neq":
        return a != b
    return _filter_cmp(a, b, op)


def _exec_correlated(db, node, sub, corr, params, outer):
    """Correlated subquery -> `id IN [...]` over the outer collection (the
    id-list lowers into the same mask pushdown every engine already takes).
    Strategy: hash semi-join when safe, else PerRow with a row cap."""
    coll, outer_names = outer
    t = node["type"]
    outer_rows = _scan(coll, None)
    ids = None
    if _hash_rewrite_ok(sub, corr, t):
        ids = _correlated_semijoin(
            db, node, sub, corr, params, outer_rows, outer_names, t
        )
    if ids is None:
        if len(outer_rows) > CORRELATED_PERROW_MAX:
            raise QueryError(
                f"correlated subquery over {len(outer_rows)} outer rows "
                f"exceeds the PerRow cap ({CORRELATED_PERROW_MAX}); use "
                "equality correlations so it can run as a join"
            )
        ids = _correlated_per_row(
            db, node, sub, corr, params, outer_rows, outer_names, t
        )
    return {"type": "in", "field": "id", "values": ids}


def _hash_rewrite_ok(sub, corr, t) -> bool:
    """RewriteAsJoin is sound only when dropping the correlated conjuncts
    and grouping by the join key preserves semantics: every correlation is
    a top-level equality conjunct, and the subquery has no top-k/limit
    shape (NEAR/MATCH/LIMIT make the result set query-global)."""
    if any(c.get("kind") == "pred" for c in corr):
        return False
    if any(c["op"] != "eq" for c in corr):
        return False
    if (
        sub.limit is not None
        or sub.offset
        or sub.group_by
        or sub.having is not None
        or sub.near is not None
        or sub.text_match is not None
        or sub.similarity
        or sub.joins
    ):
        return False
    if t == "cmp_subquery" and sub.order_by:
        return False  # "first row" would depend on the dropped ordering
    top = (
        sub.filter["conditions"]
        if isinstance(sub.filter, dict) and sub.filter.get("type") == "and"
        else [sub.filter]
    )
    top_ids = {id(c) for c in top}
    return all(id(c["node"]) in top_ids for c in corr)


def _strip_conjuncts(filt, drop_ids: set):
    if isinstance(filt, dict) and filt.get("type") == "and":
        kept = [c for c in filt["conditions"] if id(c) not in drop_ids]
        if not kept:
            return None
        return kept[0] if len(kept) == 1 else {"type": "and", "conditions": kept}
    return None if id(filt) in drop_ids else filt


def _substitute_nodes(cond, repl: dict):
    """Copy a filter tree replacing nodes by identity (PerRow binding)."""
    if not isinstance(cond, dict):
        return cond
    if id(cond) in repl:
        return repl[id(cond)]
    t = cond.get("type")
    out = dict(cond)
    if t in ("and", "or"):
        out["conditions"] = [
            _substitute_nodes(c, repl) for c in cond.get("conditions", [])
        ]
    elif t == "not":
        out["condition"] = _substitute_nodes(cond.get("condition"), repl)
    return out


def _sub_projection(sub):
    """The value a subquery row contributes to IN/scalar tests: the single
    plain projected field, a single Aggregate, or id."""
    cols = sub.columns
    if len(cols) == 1:
        if isinstance(cols[0].expr, Aggregate):
            return cols[0].expr
        if isinstance(cols[0].expr, str) and cols[0].expr != "*":
            return cols[0].expr
    return "id"


def _row_value(r: dict, path: str):
    if path == "id":
        return r.get("id")
    return get_path(r.get("payload"), path)


def _correlated_semijoin(db, node, sub, corr, params, outer_rows, outer_names, t):
    """RewriteAsJoin: execute the subquery ONCE without its correlated
    conjuncts, group rows by the inner join key, then hash-probe per outer
    row. Aggregate projections evaluate per group (the GROUP BY the
    rewrite implies)."""
    sub_names = {sub.alias or sub.collection, sub.collection}
    stripped = _strip_conjuncts(sub.filter, {id(c["node"]) for c in corr})
    inner = replace(
        sub, filter=stripped, columns=[SelectItem("*")],
        order_by=[], limit=None, offset=0,
    )
    rows = _exec_node(db, inner, params)
    inner_paths = [_strip_prefix(c["inner"], sub_names) for c in corr]
    groups: dict[tuple, list[dict]] = {}
    for r in rows:
        key = tuple(_row_value(r, p) for p in inner_paths)
        if any(k is None for k in key):
            continue  # SQL: NULL never equi-joins
        groups.setdefault(key, []).append(r)
    proj = _sub_projection(sub)
    ids = []
    for row in outer_rows:
        key = tuple(_outer_value(row, c["outer"], outer_names) for c in corr)
        members = groups.get(key, []) if all(k is not None for k in key) else []
        if t == "exists_subquery":
            ok = bool(members)
        elif t == "in_subquery":
            ov = _outer_value(row, node["field"], outer_names)
            if isinstance(proj, Aggregate):
                vals = [_agg_value(proj, members)]
            else:
                vals = [_row_value(r, proj) for r in members]
            ok = ov is not None and ov in vals
        else:  # cmp_subquery
            if isinstance(proj, Aggregate):
                sval = _agg_value(proj, members)
            else:
                sval = _row_value(members[0], proj) if members else None
            if node.get("field") is None:
                ok = _cmp_vals(sval, _resolve_value(node.get("value"), params),
                               node["op"])
            else:
                ov = _outer_value(row, node["field"], outer_names)
                ok = _cmp_vals(ov, sval, node["op"])
        if ok:
            ids.append(row["id"])
    return ids


def _correlated_per_row(db, node, sub, corr, params, outer_rows, outer_names, t):
    """PerRow: bind each outer row's values into the subquery filter and
    re-execute. Correct for every correlation shape; O(outer × subquery)."""
    sub_names = {sub.alias or sub.collection, sub.collection}
    ids = []
    limit = sub.limit
    if t == "exists_subquery":
        limit = 1 if limit is None else min(limit, 1)
    for row in outer_rows:
        repl = {}
        for c in corr:
            if c.get("kind") == "pred":
                pred = dict(c["node"])
                pred["field"] = _strip_prefix(pred["field"], outer_names)
                payload = {**(row.get("payload") or {}), "id": row["id"]}
                ok = matches(payload, normalize_filter(pred))
                repl[id(c["node"])] = _true_cond() if ok else _false_cond()
            else:
                ov = _outer_value(row, c["outer"], outer_names)
                if ov is None:
                    repl[id(c["node"])] = _false_cond()
                else:
                    repl[id(c["node"])] = {
                        "type": c["op"],
                        "field": _strip_prefix(c["inner"], sub_names),
                        "value": ov,
                    }
        inner = replace(
            sub, filter=_substitute_nodes(sub.filter, repl), limit=limit
        )
        rows = _exec_node(db, inner, params)
        if t == "exists_subquery":
            ok = bool(rows)
        elif t == "in_subquery":
            ov = _outer_value(row, node["field"], outer_names)
            ok = ov is not None and ov in _subquery_values(rows)
        elif node.get("field") is None:
            ok = _cmp_vals(
                _subquery_scalar(rows),
                _resolve_value(node.get("value"), params),
                node["op"],
            )
        else:
            ok = _cmp_vals(
                _outer_value(row, node["field"], outer_names),
                _subquery_scalar(rows),
                node["op"],
            )
        if ok:
            ids.append(row["id"])
    return ids


# -- join support ----------------------------------------------------------------


def _aliases_in(cond, known: set[str]) -> set[str]:
    """Alias prefixes referenced anywhere in a condition tree."""
    t = cond.get("type")
    if t in ("and", "or"):
        out = set()
        for c in cond["conditions"]:
            out |= _aliases_in(c, known)
        return out
    if t == "not":
        return _aliases_in(cond["condition"], known)
    field = cond.get("field", "")
    head = field.split(".", 1)[0]
    return {head} if head in known else set()


def _strip_alias(cond, alias: str):
    """Drop the ``alias.`` prefix from every field (pushdown rewrite)."""
    out = dict(cond)
    t = out.get("type")
    if t in ("and", "or"):
        out["conditions"] = [_strip_alias(c, alias) for c in out["conditions"]]
    elif t == "not":
        out["condition"] = _strip_alias(out["condition"], alias)
    elif out.get("field", "").startswith(alias + "."):
        out["field"] = out["field"][len(alias) + 1 :]
    return out


def _partition_filter(filt, base_alias: str, join_aliases: list[str]):
    """Split conjuncts into per-table pushdowns + post-join residual
    (``search/query/pushdown.rs:15`` classification analog)."""
    known = {base_alias, *join_aliases}
    conjuncts = filt["conditions"] if filt.get("type") == "and" else [filt]
    base, per_join, post = [], {a: [] for a in join_aliases}, []
    for c in conjuncts:
        als = _aliases_in(c, known)
        if not als or als == {base_alias}:
            base.append(_strip_alias(c, base_alias))
        elif len(als) == 1:
            a = next(iter(als))
            per_join[a].append(_strip_alias(c, a))
        else:
            post.append(c)

    def combine(lst):
        if not lst:
            return None
        return lst[0] if len(lst) == 1 else {"type": "and", "conditions": lst}

    return combine(base), {a: combine(l) for a, l in per_join.items()}, post


def _merged_payload(row: dict, base_alias: str) -> dict:
    """Qualified-lookup view: base payload at top level + one sub-dict per
    alias (so ``get_path('a.price')`` and bare ``price`` both resolve)."""
    merged = dict(row.get("payload") or {})
    merged["id"] = row.get("id")
    merged[base_alias] = {**(row.get("payload") or {}), "id": row.get("id")}
    for alias, side in (row.get("_joined") or {}).items():
        merged[alias] = (
            {**(side["payload"] or {}), "id": side["id"]} if side else None
        )
    return merged


def _exec_joins(db, stmt, rows: list[dict], join_filts, post, params) -> list[dict]:
    """Sequential hash joins (inner/left/right/full) over candidate rows."""
    base_alias = stmt.alias or stmt.collection
    rows = [dict(r, _joined={}, _base_alias=base_alias) for r in rows]
    for j in stmt.joins:
        try:
            right_coll = db.get_collection(j.collection)
        except KeyError as e:
            raise QueryError(f"unknown collection {j.collection!r}") from e
        rf = _resolve_filter(db, join_filts.get(j.alias), params)
        if rf is not None:
            rf = normalize_filter(rf)
        right_rows = _scan(right_coll, rf)
        rkey_path = (
            j.right_field[len(j.alias) + 1 :]
            if j.right_field.startswith(j.alias + ".")
            else j.right_field
        )
        index: dict = {}
        for rr in right_rows:
            key = rr["id"] if rkey_path == "id" else get_path(rr["payload"], rkey_path)
            if key is not None:
                index.setdefault(key, []).append(rr)
        out = []
        matched_right = set()
        for row in rows:
            lval = get_path(_merged_payload(row, base_alias), j.left_field)
            hits = index.get(lval, []) if lval is not None else []
            if hits:
                for rr in hits:
                    matched_right.add(rr["id"])
                    nr = dict(row)
                    nr["_joined"] = {
                        **row["_joined"],
                        j.alias: {"id": rr["id"], "payload": rr["payload"]},
                    }
                    out.append(nr)
            elif j.kind in ("left", "full"):
                nr = dict(row)
                nr["_joined"] = {**row["_joined"], j.alias: None}
                out.append(nr)
        if j.kind in ("right", "full"):
            for rr in right_rows:
                if rr["id"] not in matched_right:
                    out.append(
                        {
                            "id": None,
                            "score": None,
                            "payload": None,
                            "_joined": {
                                j.alias: {"id": rr["id"], "payload": rr["payload"]}
                            },
                        }
                    )
        rows = out
    # residual (cross-table) predicates evaluate on the merged view
    for cond in post:
        resolved = normalize_filter(_resolve_filter(db, cond, params))
        rows = [r for r in rows if matches(_merged_payload(r, base_alias), resolved)]
    return rows


def _exec_select(db, stmt: SelectStatement, params) -> list[dict]:
    try:
        coll = db.get_collection(stmt.collection)
    except KeyError as e:
        raise QueryError(f"unknown collection {stmt.collection!r}") from e
    if coll is None:
        raise QueryError(f"unknown collection {stmt.collection!r}")

    outer_ctx = (coll, {stmt.alias or stmt.collection, stmt.collection})
    join_filts: dict = {}
    post_filts: list = []
    if stmt.joins:
        base_filt = stmt.filter
        if base_filt is not None:
            base_filt, join_filts, post_filts = _partition_filter(
                base_filt, stmt.alias or stmt.collection, [j.alias for j in stmt.joins]
            )
        filt = _resolve_filter(db, base_filt, params, outer_ctx)
    else:
        filt = _resolve_filter(db, stmt.filter, params, outer_ctx)
    if filt is not None:
        filt = normalize_filter(filt)

    has_vec = stmt.near is not None or stmt.similarity
    has_txt = stmt.text_match is not None
    limit = stmt.limit if stmt.limit is not None else DEFAULT_LIMIT
    need = limit + stmt.offset
    # aggregates / group-by need the full candidate set, not just top-k
    aggregating = bool(stmt.group_by) or any(
        isinstance(c.expr, Aggregate) for c in stmt.columns
    )
    ef = stmt.with_options.ef_search
    quality = stmt.with_options.quality

    candidates: list[dict]
    sims_applied = False
    if stmt.where_mode == "or" and (has_vec or has_txt):
        # union mode (mod.rs union of similarity hits and metadata matches);
        # similarity thresholds restrict only their own branch
        vec_rows = (
            _vector_candidates(coll, stmt, params, need, ef, quality, None)
            if has_vec
            else []
        )
        for sim in stmt.similarity:
            vec_rows = _apply_similarity(coll, sim, params, vec_rows)
        sims_applied = True
        txt_rows = _text_candidates(coll, stmt, params, need, None) if has_txt else []
        meta_rows = _scan(coll, filt) if filt is not None else []
        candidates = _union_rows(vec_rows + txt_rows, meta_rows)
    elif has_vec and has_txt:
        # hybrid: RRF-fuse device top lists (USING FUSION overrides strategy)
        fetch = max(4 * need, 32) if not aggregating else min(coll.count(), max(10 * need, 1000))
        fspec = stmt.near.fusion if stmt.near is not None else None
        fused_dev = _fused_hybrid_rows(
            coll, stmt, params, fetch, ef, quality, filt, fspec, aggregating
        )
        if fused_dev is not None:
            candidates = fused_dev
        else:
            vec_rows = _vector_candidates(coll, stmt, params, fetch, ef, quality, filt)
            txt_rows = _text_candidates(coll, stmt, params, fetch, filt)
            candidates = _fuse_rows(coll, vec_rows, txt_rows, max(need, fetch), fspec)
    elif has_vec:
        # aggregation over NEAR widens the candidate set but stays bounded
        # (the reference's 10x over-fetch, mod.rs; unbounded = [B, N] blowup)
        fetch = min(coll.count(), max(10 * need, 1000)) if aggregating else need
        candidates = _vector_candidates(coll, stmt, params, fetch, ef, quality, filt)
    elif has_txt:
        fetch = min(coll.count(), max(10 * need, 1000)) if aggregating else need
        candidates = _text_candidates(coll, stmt, params, fetch, filt)
    else:
        candidates = _scan(coll, filt)

    # residual similarity thresholds (scan mode / NOT similarity)
    if not sims_applied:
        for sim in stmt.similarity:
            candidates = _apply_similarity(coll, sim, params, candidates)

    if stmt.joins:
        candidates = _exec_joins(db, stmt, candidates, join_filts, post_filts, params)

    if aggregating:
        rows = _aggregate(stmt, candidates)
    else:
        rows = candidates

    rows = _order_rows(coll, stmt, params, rows)
    if stmt.distinct:
        rows = _distinct_rows(stmt, rows)
    if stmt.offset:
        rows = rows[stmt.offset :]
    if stmt.limit is not None or has_vec or has_txt:
        rows = rows[:limit]
    return [_project(stmt.columns, r) for r in rows]


# -- candidate generation ----------------------------------------------------


def _vector_candidates(coll, stmt, params, k, ef, quality, filt) -> list[dict]:
    near = stmt.near
    if near is None:
        # similarity()-only query: treat the first similarity cond as the
        # ranking vector (reference scan mode), keep its threshold as filter
        sim = stmt.similarity[0]
        vectors = [sim.vector]
        fused, fspec = False, None
    else:
        vectors, fused, fspec = near.vectors, near.fused, near.fusion
    k = max(1, min(k, max(coll.count(), 1)))
    qs = [_resolve_vector(v, params) for v in vectors]
    # ONE batched dispatch + readback for every NEAR_FUSED vector (a
    # per-vector coll.search loop paid one tunnel RTT EACH, r4)
    rows = coll.search_batch(np.stack(qs), k, filter=_as_filter_dict(filt),
                             ef=ef, quality=quality)
    lists = [[(h.id, h.score) for h in row] for row in rows]
    if len(lists) == 1:
        fused_list = lists[0]
    else:
        strategy = FusionStrategy.parse(fspec.strategy) if fspec else FusionStrategy.RRF
        fused_list = strategy.fuse(
            lists,
            k,
            weights=fspec.weights if fspec else None,
            rrf_k=fspec.rrf_k if fspec else 60,
        )
    return [
        {"id": vid, "score": float(s), "payload": coll.payloads.retrieve(vid)}
        for vid, s in fused_list
    ]


def _text_candidates(coll, stmt, params, k, filt) -> list[dict]:
    q = _resolve_value(stmt.text_match.query, params)
    if not isinstance(q, str):
        raise QueryError("MATCH requires a string query")
    k = max(1, min(k, max(coll.count(), 1)))
    hits = coll.text_search(q, k, filter=_as_filter_dict(filt))
    return [dict(h) for h in hits]


def _scan(coll, filt) -> list[dict]:
    """Pure metadata scan via the ColumnStore mask (no similarity)."""
    used = coll.vectors.used_slots
    slot_ids, valid = coll.vectors.occupancy()
    if filt is not None:
        coll._ensure_columns()
        mask = coll.columns.mask_for_filter(filt, max(used, 1))
    else:
        mask = np.ones(max(used, 1), bool)
    out = []
    for slot in np.flatnonzero(mask[:used] & valid[:used]):
        vid = int(slot_ids[slot])
        out.append({"id": vid, "score": None, "payload": coll.payloads.retrieve(vid)})
    return out


def _as_filter_dict(filt):
    return {"condition": filt} if filt is not None else None


def _union_rows(primary: list[dict], secondary: list[dict]) -> list[dict]:
    seen = {r["id"] for r in primary}
    return primary + [r for r in secondary if r["id"] not in seen]


def _fused_hybrid_rows(coll, stmt, params, fetch, ef, quality, filt, fspec,
                       aggregating) -> list[dict] | None:
    """Single-readback device-fused NEAR+MATCH (r4): when the hybrid is the
    common shape — one NEAR vector, RRF fusion, non-aggregating, collection
    not on the quantized-rerank route — both branch top lists stay on device
    and fuse in one jitted RRF, halving the per-query readback RTTs of the
    two-branch host path. Returns ``None`` when the shape needs the general
    host fusion (multi-vector NEAR, non-RRF strategies, aggregation).

    RRF ignores branch weights (``fusion.rrf_fuse``), so both device weights
    are 1; ``fetch`` rounds up to a power of two — it becomes the fused
    program's static top-k, and LIMIT/OFFSET-derived raw values would
    compile a fresh program per distinct LIMIT."""
    if aggregating or not getattr(coll, "_hybrid_fused_ok", False):
        return None
    near = stmt.near
    if near is None or len(near.vectors) != 1 or near.fused:
        return None
    strategy = FusionStrategy.parse(fspec.strategy) if fspec else FusionStrategy.RRF
    if strategy is not FusionStrategy.RRF:
        return None
    q = _resolve_value(stmt.text_match.query, params)
    if not isinstance(q, str):
        raise QueryError("MATCH requires a string query")
    vec = _resolve_vector(near.vectors[0], params)
    fetch = max(1, min(fetch, max(coll.count(), 1)))
    fetch_p2 = 1 << (fetch - 1).bit_length()
    rows = coll._hybrid_fused_batch(
        [vec], [q], fetch_p2, w_vec=1.0, w_txt=1.0,
        filter=_as_filter_dict(filt), ef=ef, quality=quality,
        rrf_k=float(fspec.rrf_k) if fspec else None, fetch=fetch_p2,
    )[0]
    return [
        {"id": r.id, "score": float(r.score), "payload": r.payload}
        for r in rows
    ]


def _fuse_rows(coll, vec_rows, txt_rows, k, fspec) -> list[dict]:
    strategy = FusionStrategy.parse(fspec.strategy) if fspec else FusionStrategy.RRF
    fused = strategy.fuse(
        [
            [(r["id"], r["score"]) for r in vec_rows],
            [(r["id"], r["score"]) for r in txt_rows],
        ],
        k,
        weights=fspec.weights if fspec else None,
        rrf_k=fspec.rrf_k if fspec else 60,
    )
    payloads = {r["id"]: r["payload"] for r in vec_rows + txt_rows}
    return [
        {"id": vid, "score": float(s), "payload": payloads.get(vid)}
        for vid, s in fused
    ]


def _apply_similarity(coll, sim, params, rows: list[dict]) -> list[dict]:
    """Filter candidate rows by a similarity() threshold (device-scored)."""
    if not rows:
        return rows
    vec = _resolve_vector(sim.vector, params)
    ids = [r["id"] for r in rows]
    scores = _scores_for_ids(coll, vec, ids)
    thr = float(_resolve_value(sim.threshold, params))
    keep = []
    for r, s in zip(rows, scores):
        ok = {
            "gt": s > thr,
            "gte": s >= thr,
            "lt": s < thr,
            "lte": s <= thr,
        }[sim.op]
        if sim.negated:
            ok = not ok
        if ok:
            r = dict(r)
            if r.get("score") is None:
                r["score"] = float(s)
            keep.append(r)
    return keep


def _scores_for_ids(coll, vec: np.ndarray, ids: list[int]) -> np.ndarray:
    """Similarity of ``vec`` against specific ids (one small device batch)."""
    from velesdb_tpu.ops import pairwise_scores

    rows = np.stack(
        [
            coll.vectors.retrieve(vid)
            if coll.vectors.retrieve(vid) is not None
            else np.zeros(coll.dim, np.float32)
            for vid in ids
        ]
    )
    return np.asarray(pairwise_scores(vec[None, :], rows, coll.metric))[0]


# -- aggregation / ordering / projection -------------------------------------


def _group_key(row, fields) -> tuple:
    return tuple(_field_of(row, f) for f in fields)


def _field_of(row: dict, path: str):
    if path in row:  # grouped rows carry group-key fields directly
        return row[path]
    if path == "id":
        return row.get("id")
    if path in ("score", "similarity"):
        return row.get("score")
    if row.get("_joined"):
        head, _, rest = path.partition(".")
        side = row["_joined"].get(head)
        if side is not None and rest:
            return side["id"] if rest == "id" else get_path(side["payload"], rest)
        if head in row["_joined"]:  # alias matched but side is NULL (outer)
            return None
        # base-alias qualification (a.field on the FROM table)
        if rest and head == row.get("_base_alias"):
            return (
                row.get("id") if rest == "id" else get_path(row.get("payload"), rest)
            )
    return get_path(row.get("payload"), path)


def _agg_value(agg: Aggregate, rows: list[dict]):
    if agg.func == "count":
        if agg.field is None:
            return len(rows)
        return sum(1 for r in rows if _field_of(r, agg.field) is not None)
    vals = [
        v
        for r in rows
        if isinstance((v := _field_of(r, agg.field)), (int, float))
        and not isinstance(v, bool)
    ]
    if not vals:
        return None
    if agg.func == "sum":
        return sum(vals)
    if agg.func == "avg":
        return sum(vals) / len(vals)
    if agg.func == "min":
        return min(vals)
    if agg.func == "max":
        return max(vals)
    raise QueryError(f"unknown aggregate {agg.func}")


def _aggregate(stmt: SelectStatement, rows: list[dict]) -> list[dict]:
    """GROUP BY + HAVING + aggregate projection (``velesql/aggregator.rs``)."""
    groups: dict[tuple, list[dict]] = {}
    if stmt.group_by:
        for r in rows:
            groups.setdefault(_group_key(r, stmt.group_by), []).append(r)
    else:
        groups[()] = rows
    out = []
    for key, members in groups.items():
        if stmt.having is not None:
            hv = _agg_value(stmt.having["agg"], members)
            thr = stmt.having["value"]
            ok = (
                hv is not None
                and {
                    "eq": hv == thr,
                    "neq": hv != thr,
                    "gt": hv > thr,
                    "gte": hv >= thr,
                    "lt": hv < thr,
                    "lte": hv <= thr,
                }[stmt.having["op"]]
            )
            if not ok:
                continue
        row: dict[str, Any] = {"_group": members}
        for f, v in zip(stmt.group_by, key):
            row[f] = v
        out.append(row)
    return out


def _order_rows(coll, stmt, params, rows: list[dict]) -> list[dict]:
    if not stmt.order_by:
        return rows
    sim_cache: dict[int, dict[int, float]] = {}
    # ORDER BY may name a projection alias (e.g. ORDER BY total for
    # SUM(price) AS total) — resolve aliases to their expressions
    aliases = {}
    for c in stmt.columns:
        name = c.alias or (
            c.expr.default_name if isinstance(c.expr, Aggregate) else None
        )
        if name:
            aliases[name] = c.expr

    def key_fn(ob: OrderBy):
        expr = aliases.get(ob.expr, ob.expr) if isinstance(ob.expr, str) else ob.expr

        def get(row):
            if isinstance(expr, Aggregate):
                return _agg_value(expr, row.get("_group", [row]))
            if isinstance(expr, tuple) and expr[0] == "similarity":
                vec = _resolve_vector(expr[2], params)
                ck = id(ob)
                if ck not in sim_cache:
                    ids = [r["id"] for r in rows if r.get("id") is not None]
                    scores = _scores_for_ids(coll, vec, ids) if ids else []
                    sim_cache[ck] = dict(zip(ids, np.asarray(scores, float)))
                return sim_cache[ck].get(row.get("id"))
            return _field_of(row, expr)

        return get

    for ob in reversed(stmt.order_by):
        get = key_fn(ob)
        # stable multi-key sort; None always last regardless of direction
        non_null = [r for r in rows if get(r) is not None]
        nulls = [r for r in rows if get(r) is None]
        non_null.sort(key=get, reverse=ob.desc)
        rows = non_null + nulls
    return rows


def _distinct_rows(stmt: SelectStatement, rows: list[dict]) -> list[dict]:
    seen = set()
    out = []
    fields = [c.expr for c in stmt.columns if isinstance(c.expr, str)]
    for r in rows:
        if fields and fields != ["*"]:
            key = tuple(repr(_field_of(r, f)) for f in fields)
        else:
            key = (r.get("id"),)
        if key in seen:
            continue
        seen.add(key)
        out.append(r)
    return out


def _project(columns: list[SelectItem], row: dict) -> dict:
    if len(columns) == 1 and columns[0].expr == "*":
        out = {"id": row.get("id"), "payload": row.get("payload")}
        if row.get("score") is not None:
            out["score"] = row["score"]
        if row.get("_joined"):
            out["joined"] = row["_joined"]
        return out
    out = {}
    for c in columns:
        if isinstance(c.expr, Aggregate):
            name = c.alias or c.expr.default_name
            out[name] = _agg_value(c.expr, row.get("_group", [row]))
        elif isinstance(c.expr, tuple) and c.expr[0] == "similarity":
            out[c.alias or "similarity"] = row.get("score")
        elif c.expr == "*":
            out["id"] = row.get("id")
            out["payload"] = row.get("payload")
        else:
            out[c.alias or c.expr] = _field_of(row, c.expr)
    return out
