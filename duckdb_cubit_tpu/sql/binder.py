"""SQL binder: resolve a parsed SELECT against the catalog into a plan.

Analog of the reference's Binder/Planner (reference src/planner/: name
resolution, type inference, subquery handling, building the logical
operator tree).  Round-1 scope: single-block SELECTs with joins expressed
as comma-lists or JOIN..ON, WHERE conjunct classification into pushed
filters / equi-join edges / post-join filters, grouped aggregation with
HAVING, ORDER BY/LIMIT, uncorrelated scalar/IN/EXISTS subqueries.
Correlated subqueries raise a clear NotImplementedError (the 22 TPC-H
queries run through their dedicated plan builders; the SQL path is for
ad-hoc queries).
"""

from __future__ import annotations

import dataclasses
from typing import Any

from ..ops import expressions as E
from ..plan import physical as P
from ..types import DECIMAL, TypeId, date_to_days
from . import ast as A
from .parser import parse


class BindError(ValueError):
    pass


@dataclasses.dataclass
class BoundTable:
    name: str         # catalog table name
    alias: str        # resolution name
    columns: list[str]
    join_type: str = "inner"
    join_cond: Any = None


class Binder:
    def __init__(self, catalog, executor=None):
        self.catalog = catalog
        self.executor = executor  # for uncorrelated scalar subqueries

    # ------------------------------------------------------------- binding
    def bind(self, stmt: A.SelectStmt) -> P.PhysicalOperator:
        tables = self._bind_tables(stmt)
        col_owner = {}
        for bt in tables:
            for c in bt.columns:
                col_owner.setdefault(c, bt.alias)
        scope = _Scope(tables, col_owner)

        # classify WHERE conjuncts
        filters: dict[str, list] = {bt.alias: [] for bt in tables}
        join_edges: list[tuple[str, str, str, str]] = []
        post: list = []
        conjuncts = _split_and(stmt.where) if stmt.where is not None else []
        for bt in tables:
            if bt.join_cond is not None:
                conjuncts.extend(_split_and(bt.join_cond))
        for conj in conjuncts:
            tabs = scope.tables_of(conj)
            edge = self._as_join_edge(conj, scope)
            if edge is not None:
                join_edges.append(edge)
            elif len(tabs) <= 1:
                target = next(iter(tabs)) if tabs else tables[0].alias
                filters[target].append(self.to_expr(conj, scope))
            else:
                post.append(conj)

        plan = self._build_join_tree(stmt, tables, filters, join_edges, scope)
        for conj in post:
            plan = P.Filter(plan, self.to_expr(conj, scope))

        plan = self._bind_agg_or_project(stmt, plan, scope)
        return plan

    def bind_sql(self, sql: str) -> P.PhysicalOperator:
        return self.bind(parse(sql))

    # ------------------------------------------------------- FROM handling
    def _bind_tables(self, stmt) -> list[BoundTable]:
        out = []
        for ref in stmt.tables:
            if ref.subquery is not None:
                raise BindError("derived tables not supported in SQL path yet")
            if ref.name not in self.catalog.tables:
                raise BindError(f"unknown table {ref.name}")
            t = self.catalog.table(ref.name)
            out.append(BoundTable(
                name=ref.name, alias=ref.alias or ref.name,
                columns=list(t.columns.keys()),
                join_type=getattr(ref, "join_type", "inner"),
                join_cond=getattr(ref, "join_cond", None)))
        return out

    def _as_join_edge(self, conj, scope):
        if not (isinstance(conj, A.BinaryOp) and conj.op == "=="):
            return None
        l, r = conj.left, conj.right
        if not (isinstance(l, A.ColumnRef) and isinstance(r, A.ColumnRef)):
            return None
        lt, rt = scope.owner(l), scope.owner(r)
        if lt is None or rt is None or lt == rt:
            return None
        return (lt, l.name, rt, r.name)

    def _build_join_tree(self, stmt, tables, filters, join_edges, scope):
        # scans with pushed filters
        rels: dict[str, P.PhysicalOperator] = {}
        for bt in tables:
            rels[bt.alias] = P.TableScan(bt.name, filters=filters[bt.alias])
        if len(tables) == 1:
            return rels[tables[0].alias]
        # greedy: start at the largest table (probe side stays wide),
        # join connected tables one at a time; PK sides become build sides
        sizes = {bt.alias: self.catalog.table(bt.name).num_rows
                 for bt in tables}
        remaining = set(rels)
        start = max(remaining, key=lambda a: sizes[a])
        joined = {start}
        plan = rels[start]
        edges = list(join_edges)
        progress = True
        while remaining - joined and progress:
            progress = False
            for e in list(edges):
                lt, lc, rt, rc = e
                if lt in joined and rt not in joined:
                    probe_key, build_alias, build_key = lc, rt, rc
                elif rt in joined and lt not in joined:
                    probe_key, build_alias, build_key = rc, lt, lc
                else:
                    continue
                bt = next(b for b in tables if b.alias == build_alias)
                jt = "left" if bt.join_type == "left" else "inner"
                # single-match (no expansion) only when the build key is
                # provably unique: a registered PK index, or the referenced
                # side of a foreign key.  Otherwise use the general
                # expansion join (reference chain-walking GatherResult).
                btable = self.catalog.table(bt.name)
                unique = build_key in btable.pk_indexes or (
                    self.catalog.foreign_keys.get(probe_key)
                    == (bt.name, build_key))
                plan = P.HashJoin(plan, rels[build_alias], [probe_key],
                                  [build_key], jt,
                                  single_match=unique or jt == "left")
                joined.add(build_alias)
                edges.remove(e)
                progress = True
        if remaining - joined:
            raise BindError("disconnected join graph (cross products not "
                            "supported in the SQL path)")
        # leftover edges between already-joined tables -> post filters
        for lt, lc, rt, rc in edges:
            plan = P.Filter(plan, E.Col(lc) == E.Col(rc))
        return plan

    # -------------------------------------------- SELECT list / aggregates
    def _bind_agg_or_project(self, stmt, plan, scope):
        agg_items = []
        plain_items = []
        for item in stmt.items:
            if _has_aggregate(item.expr):
                agg_items.append(item)
            else:
                plain_items.append(item)
        if not agg_items and not stmt.group_by:
            projections = {}
            for i, item in enumerate(stmt.items):
                name = item.alias or _default_name(item.expr, i)
                projections[name] = self.to_expr(item.expr, scope)
            out = P.Project(plan, projections)
            return self._order_limit(stmt, out, projections.keys())
        # grouped aggregate
        group_cols = []
        pre_proj = {}
        for g in stmt.group_by:
            if isinstance(g, A.ColumnRef):
                group_cols.append(g.name)
            else:
                name = f"__group_{len(group_cols)}__"
                pre_proj[name] = self.to_expr(g, scope)
                group_cols.append(name)
        aggs = []
        out_names = []
        post_proj = {}
        for i, item in enumerate(stmt.items):
            name = item.alias or _default_name(item.expr, i)
            out_names.append(name)
            if _has_aggregate(item.expr):
                aggs.extend(self._extract_aggs(item.expr, name, scope,
                                               post_proj))
            else:
                if isinstance(item.expr, A.ColumnRef):
                    post_proj[name] = name if item.expr.name == name \
                        else item.expr.name
                else:
                    pre_name = f"__pre_{i}__"
                    pre_proj[pre_name] = self.to_expr(item.expr, scope)
                    post_proj[name] = pre_name
        if pre_proj:
            passthrough = {c: c for bt in scope.tables for c in bt.columns
                           if c in _cols_needed(stmt)}
            passthrough.update(pre_proj)
            plan = P.Project(plan, passthrough)
        plan = P.GroupAggregate(plan, group_cols, aggs)
        if stmt.having is not None:
            plan = P.Filter(plan, self.to_expr(stmt.having, scope,
                                               agg_names=post_proj))
        plan = P.Project(plan, {n: (post_proj.get(n, n)) for n in out_names})
        return self._order_limit(stmt, plan, out_names)

    def _extract_aggs(self, expr, name, scope, post_proj):
        """Bind an aggregate select item; supports a bare agg call or an
        arithmetic combination of agg calls (bound as separate aggregates
        plus a post projection)."""
        if isinstance(expr, A.FuncCall) and expr.name in (
                "sum", "avg", "min", "max", "count"):
            agg_expr = None if (expr.star or not expr.args) else \
                self.to_expr(expr.args[0], scope)
            post_proj[name] = name
            return [P.Aggregate(expr.name, agg_expr, name)]
        raise BindError("complex aggregate expressions need the plan API")

    def _order_limit(self, stmt, plan, names):
        if stmt.order_by:
            keys = []
            for oi in stmt.order_by:
                if isinstance(oi.expr, A.ColumnRef):
                    keys.append((oi.expr.name, oi.descending))
                else:
                    raise BindError("ORDER BY expressions need aliases")
            plan = P.OrderBy(plan, keys, limit=stmt.limit)
        elif stmt.limit is not None:
            plan = P.Limit(plan, stmt.limit)
        return plan

    # ------------------------------------------------------- expressions
    def to_expr(self, node, scope, agg_names=None) -> E.Expr:
        if isinstance(node, A.ColumnRef):
            return E.Col(node.name)
        if isinstance(node, A.Literal):
            if node.type_hint == "date":
                return E.date_lit(node.value)
            if node.type_hint == "string":
                return E.Lit(node.value)
            if node.type_hint == "decimal":
                s = str(node.value)
                scale = len(s.split(".")[1]) if "." in s else 0
                return E.dec_lit(node.value, max(scale, 2))
            return E.Lit(node.value)
        if isinstance(node, A.IntervalLit):
            raise BindError("interval outside date arithmetic")
        if isinstance(node, A.BinaryOp):
            # constant-fold date +- interval
            folded = _fold_date_arith(node)
            if folded is not None:
                return folded
            l = self.to_expr(node.left, scope, agg_names)
            r = self.to_expr(node.right, scope, agg_names)
            ops = {"+": lambda: l + r, "-": lambda: l - r,
                   "*": lambda: l * r, "/": lambda: l / r,
                   "and": lambda: l & r, "or": lambda: l | r,
                   "==": lambda: l == r, "!=": lambda: l != r,
                   "<": lambda: l < r, "<=": lambda: l <= r,
                   ">": lambda: l > r, ">=": lambda: l >= r}
            return ops[node.op]()
        if isinstance(node, A.UnaryOp):
            if node.op == "not":
                return ~self.to_expr(node.child, scope, agg_names)
            return E.Lit(0) - self.to_expr(node.child, scope, agg_names)
        if isinstance(node, A.BetweenExpr):
            e = self.to_expr(node.expr, scope, agg_names)
            b = e.between(self.to_expr(node.low, scope, agg_names),
                          self.to_expr(node.high, scope, agg_names))
            return ~b if node.negated else b
        if isinstance(node, A.InExpr):
            if isinstance(node.values, A.SelectStmt):
                return self._in_subquery(node, scope)
            e = self.to_expr(node.expr, scope, agg_names)
            vals = [v.value for v in node.values]
            r = e.isin(vals)
            return ~r if node.negated else r
        if isinstance(node, A.LikeExpr):
            e = self.to_expr(node.expr, scope, agg_names)
            return e.not_like(node.pattern) if node.negated \
                else e.like(node.pattern)
        if isinstance(node, A.CaseExpr):
            default = self.to_expr(node.default, scope, agg_names) \
                if node.default is not None else E.Lit(0)
            out = default
            for cond, res in reversed(node.whens):
                out = E.Case(self.to_expr(cond, scope, agg_names),
                             self.to_expr(res, scope, agg_names), out)
            return out
        if isinstance(node, A.ExtractExpr):
            assert node.field == "year", "only extract(year) supported"
            return self.to_expr(node.child, scope, agg_names).year()
        if isinstance(node, A.SubstringExpr):
            return E.Substr(self.to_expr(node.child, scope, agg_names),
                            int(node.start.value), int(node.length.value))
        if isinstance(node, A.CastExpr):
            e = self.to_expr(node.child, scope, agg_names)
            if node.target in ("double", "float", "real"):
                return e.cast_double()
            if node.target == "date":
                assert isinstance(node.child, A.Literal)
                return E.date_lit(node.child.value)
            return e
        if isinstance(node, A.SubqueryExpr):
            return self._scalar_subquery(node.query)
        if isinstance(node, A.ExistsExpr):
            raise BindError("EXISTS requires the plan API (correlated)")
        raise BindError(f"cannot bind expression {node!r}")

    def _scalar_subquery(self, query: A.SelectStmt) -> E.Expr:
        if self.executor is None:
            raise BindError("scalar subquery needs an executor")
        sub_plan = self.bind(query)
        rel = self.executor.execute(sub_plan)
        from ..exec.result import materialize
        _, rows, metas = materialize(rel)
        if len(rows) != 1 or len(rows[0]) != 1:
            raise BindError("scalar subquery did not return a single value")
        v = rows[0][0]
        dt, _ = metas[0]
        if dt.id == TypeId.DECIMAL:
            return E.Lit(int(v), dt)
        if dt.id == TypeId.DOUBLE:
            return E.Lit(float(v))
        return E.Lit(int(v))

    def _in_subquery(self, node: A.InExpr, scope) -> E.Expr:
        raise BindError("IN (SELECT ...) requires the plan API in round 1")


class _Scope:
    def __init__(self, tables, col_owner):
        self.tables = tables
        self.col_owner = col_owner
        self.aliases = {bt.alias: bt for bt in tables}

    def owner(self, ref: A.ColumnRef):
        if ref.table is not None:
            return ref.table if ref.table in self.aliases else None
        return self.col_owner.get(ref.name)

    def tables_of(self, node) -> set:
        out = set()

        def walk(n):
            if isinstance(n, A.ColumnRef):
                o = self.owner(n)
                if o:
                    out.add(o)
            elif dataclasses.is_dataclass(n):
                for f in dataclasses.fields(n):
                    v = getattr(n, f.name)
                    if dataclasses.is_dataclass(v):
                        walk(v)
                    elif isinstance(v, list):
                        for x in v:
                            if dataclasses.is_dataclass(x):
                                walk(x)
        walk(node)
        return out


def _split_and(node) -> list:
    if isinstance(node, A.BinaryOp) and node.op == "and":
        return _split_and(node.left) + _split_and(node.right)
    return [node]


def _has_aggregate(node) -> bool:
    if isinstance(node, A.FuncCall) and node.name in (
            "sum", "avg", "min", "max", "count"):
        return True
    if dataclasses.is_dataclass(node):
        for f in dataclasses.fields(node):
            v = getattr(node, f.name)
            if dataclasses.is_dataclass(v) and _has_aggregate(v):
                return True
            if isinstance(v, list) and any(
                    dataclasses.is_dataclass(x) and _has_aggregate(x)
                    for x in v):
                return True
    return False


def _default_name(expr, i: int) -> str:
    if isinstance(expr, A.ColumnRef):
        return expr.name
    return f"col{i}"


def _cols_needed(stmt) -> set:
    out = set()

    def walk(n):
        if isinstance(n, A.ColumnRef):
            out.add(n.name)
        elif dataclasses.is_dataclass(n):
            for f in dataclasses.fields(n):
                v = getattr(n, f.name)
                if dataclasses.is_dataclass(v):
                    walk(v)
                elif isinstance(v, list):
                    for x in v:
                        if dataclasses.is_dataclass(x):
                            walk(x)
    for item in stmt.items:
        walk(item.expr)
    for g in stmt.group_by:
        walk(g)
    if stmt.having is not None:
        walk(stmt.having)
    for oi in stmt.order_by:
        walk(oi.expr)
    return out


def _fold_date_arith(node: A.BinaryOp):
    """date '1998-12-01' - interval '90' day -> folded date literal."""
    if node.op not in ("+", "-"):
        return None
    l, r = node.left, node.right
    if isinstance(l, A.Literal) and l.type_hint == "date" \
            and isinstance(r, A.IntervalLit):
        import datetime

        base = datetime.date.fromisoformat(l.value)
        sign = 1 if node.op == "+" else -1
        if r.unit == "day":
            out = base + datetime.timedelta(days=sign * r.value)
        elif r.unit == "month":
            m = base.month - 1 + sign * r.value
            out = base.replace(year=base.year + m // 12, month=m % 12 + 1)
        elif r.unit == "year":
            out = base.replace(year=base.year + sign * r.value)
        else:
            return None
        return E.date_lit(out.isoformat())
    return None
