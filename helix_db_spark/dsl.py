"""Fluent traversal/batch builder — the user-facing query API.

Mirrors the reference Python SDK surface (sdks/python/src/helixdb/dsl.py:
Traversal builder :1633-2037, batch envelope :2212-2350) but builds our own
logical AST (``plans.ast``) which the Step compiler executes on Spark.

    g().n("customer").where(P.gt("c_acctbal", 1000)).out("in_nation") \
       .values("n_name")
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Union

from .plans import ast

# ---------------------------------------------------------------------------
# Expression helpers
# ---------------------------------------------------------------------------


def _expr(v) -> ast.Expr:
    if isinstance(v, ast.Expr):
        return v
    return ast.Constant(v)


class X:
    """Expr factory: ``X.prop("a") + X.param("b")``."""

    @staticmethod
    def prop(name: str) -> ast.Property:
        return ast.Property(name)

    @staticmethod
    def id() -> ast.IdExpr:
        return ast.IdExpr()

    @staticmethod
    def param(name: str) -> ast.Param:
        return ast.Param(name)

    @staticmethod
    def const(v) -> ast.Constant:
        return ast.Constant(v)

    @staticmethod
    def timestamp() -> ast.TimestampExpr:
        return ast.TimestampExpr()

    @staticmethod
    def now() -> ast.DateTimeNowExpr:
        return ast.DateTimeNowExpr()

    @staticmethod
    def add(a, b):
        return ast.BinOp("Add", _expr(a), _expr(b))

    @staticmethod
    def sub(a, b):
        return ast.BinOp("Sub", _expr(a), _expr(b))

    @staticmethod
    def mul(a, b):
        return ast.BinOp("Mul", _expr(a), _expr(b))

    @staticmethod
    def div(a, b):
        return ast.BinOp("Div", _expr(a), _expr(b))

    @staticmethod
    def mod(a, b):
        return ast.BinOp("Mod", _expr(a), _expr(b))

    @staticmethod
    def neg(a):
        return ast.Neg(_expr(a))

    @staticmethod
    def case(when_then, else_=None):
        return ast.Case(tuple((p, _expr(v)) for p, v in when_then),
                        _expr(else_) if else_ is not None else None)


class P:
    """Predicate factory."""

    @staticmethod
    def eq(prop, v):
        return ast.Cmp("Eq", prop, _expr(v))

    @staticmethod
    def neq(prop, v):
        return ast.Cmp("Neq", prop, _expr(v))

    @staticmethod
    def gt(prop, v):
        return ast.Cmp("Gt", prop, _expr(v))

    @staticmethod
    def gte(prop, v):
        return ast.Cmp("Gte", prop, _expr(v))

    @staticmethod
    def lt(prop, v):
        return ast.Cmp("Lt", prop, _expr(v))

    @staticmethod
    def lte(prop, v):
        return ast.Cmp("Lte", prop, _expr(v))

    @staticmethod
    def between(prop, lo, hi):
        return ast.Between(prop, _expr(lo), _expr(hi))

    @staticmethod
    def has_key(prop):
        return ast.HasKeyPred(prop)

    @staticmethod
    def is_null(prop):
        return ast.IsNullPred(prop)

    @staticmethod
    def is_not_null(prop):
        return ast.IsNotNullPred(prop)

    @staticmethod
    def starts_with(prop, s):
        return ast.StrPred("StartsWith", prop, _expr(s))

    @staticmethod
    def ends_with(prop, s):
        return ast.StrPred("EndsWith", prop, _expr(s))

    @staticmethod
    def contains(prop, s):
        return ast.StrPred("Contains", prop, _expr(s))

    @staticmethod
    def is_in(prop, values):
        return ast.IsIn(prop, _expr(list(values)))

    @staticmethod
    def and_(*preds):
        return ast.And(tuple(preds))

    @staticmethod
    def or_(*preds):
        return ast.Or(tuple(preds))

    @staticmethod
    def not_(p):
        return ast.Not(p)

    @staticmethod
    def compare(left, op, right):
        return ast.Compare(_expr(left), op, _expr(right))


# ---------------------------------------------------------------------------
# Traversal builder
# ---------------------------------------------------------------------------


class G:
    """Immutable fluent builder over a step list."""

    def __init__(self, steps: tuple = ()):  # noqa: D401
        self.steps = steps

    def _with(self, step) -> "G":
        return G(self.steps + (step,))

    def build(self) -> ast.Traversal:
        return ast.Traversal(self.steps)

    # sources
    def n(self, label: Optional[str] = None, ids: Optional[Sequence] = None,
          var: Optional[str] = None, param: Optional[str] = None) -> "G":
        ref = (ast.Ref.of_ids(ids) if ids is not None else
               ast.Ref.var(var) if var is not None else
               ast.Ref.param(param) if param is not None else ast.Ref.all())
        return self._with(ast.N(ref, label))

    def n_where(self, pred, label: Optional[str] = None) -> "G":
        return self._with(ast.NWhere(pred, label))

    def e(self, label: Optional[str] = None, ids: Optional[Sequence] = None,
          var: Optional[str] = None) -> "G":
        ref = (ast.Ref.of_ids(ids) if ids is not None else
               ast.Ref.var(var) if var is not None else ast.Ref.all())
        return self._with(ast.E(ref, label))

    def e_where(self, pred, label: Optional[str] = None) -> "G":
        return self._with(ast.EWhere(pred, label))

    def vector_search(self, label, prop, query_vector, k,
                      tenant_value=None, target="nodes",
                      method="exact") -> "G":
        return self._with(ast.VectorSearch(target, label, prop,
                                           tuple(query_vector), k,
                                           tenant_value, method))

    def text_search(self, label, prop, query_text, k,
                    tenant_value=None, target="nodes") -> "G":
        return self._with(ast.TextSearch(target, label, prop, query_text, k,
                                         tenant_value))

    # navigation
    def out(self, label=None) -> "G":
        return self._with(ast.Hop("out", label))

    def in_(self, label=None) -> "G":
        return self._with(ast.Hop("in", label))

    def both(self, label=None) -> "G":
        return self._with(ast.Hop("both", label))

    def out_e(self, label=None) -> "G":
        return self._with(ast.Hop("out_e", label))

    def in_e(self, label=None) -> "G":
        return self._with(ast.Hop("in_e", label))

    def both_e(self, label=None) -> "G":
        return self._with(ast.Hop("both_e", label))

    def out_n(self) -> "G":
        return self._with(ast.Hop("out_n"))

    def in_n(self) -> "G":
        return self._with(ast.Hop("in_n"))

    def other_n(self) -> "G":
        return self._with(ast.Hop("other_n"))

    # filters
    def where(self, pred) -> "G":
        return self._with(ast.Where(pred))

    def has(self, prop, value) -> "G":
        return self._with(ast.Has(prop, value))

    def has_label(self, label) -> "G":
        return self._with(ast.HasLabel(label))

    def has_key(self, prop) -> "G":
        return self._with(ast.HasKey(prop))

    # stream ops
    def dedup(self) -> "G":
        return self._with(ast.Dedup())

    def within(self, var) -> "G":
        return self._with(ast.Within(var))

    def without(self, var) -> "G":
        return self._with(ast.Without(var))

    def inject(self, var) -> "G":
        return self._with(ast.Inject(var))

    def select(self, var) -> "G":
        return self._with(ast.Select(var))

    def as_(self, name) -> "G":
        return self._with(ast.Store(name))

    store = as_

    def bind(self, name) -> "G":
        return self._with(ast.Bind(name))

    def order_by(self, prop, direction="Asc") -> "G":
        return self._with(ast.OrderBy(((prop, direction),)))

    def order_by_multiple(self, *keys) -> "G":
        return self._with(ast.OrderBy(tuple(keys)))

    def limit(self, n) -> "G":
        return self._with(ast.Limit(n))

    def skip(self, n) -> "G":
        return self._with(ast.Skip(n))

    def range(self, start, end) -> "G":
        return self._with(ast.Range(start, end))

    # aggregation terminals
    def count(self) -> "G":
        return self._with(ast.Count())

    def exists(self) -> "G":
        return self._with(ast.Exists())

    def group(self, prop) -> "G":
        return self._with(ast.Group(prop))

    def group_count(self, prop) -> "G":
        return self._with(ast.GroupCount(prop))

    def aggregate_by(self, fn, prop=None) -> "G":
        return self._with(ast.AggregateBy(fn, prop))

    # projection terminals
    def id_(self) -> "G":
        return self._with(ast.IdTerminal())

    def label_(self) -> "G":
        return self._with(ast.LabelTerminal())

    def values(self, *props) -> "G":
        return self._with(ast.Values(tuple(props)))

    def value_map(self, *props) -> "G":
        return self._with(ast.ValueMap(tuple(props) if props else None))

    def project(self, **aliases) -> "G":
        projs = tuple(ast.Projection(a, s) for a, s in aliases.items())
        return self._with(ast.Project(projs))

    def project_list(self, pairs) -> "G":
        projs = tuple(ast.Projection(a, s) for a, s in pairs)
        return self._with(ast.Project(projs))

    def edge_properties(self) -> "G":
        return self._with(ast.EdgeProperties())

    def project_bindings(self, projections, distinct=False) -> "G":
        return self._with(ast.ProjectBindings(tuple(projections), distinct))

    # branching / repetition
    def union(self, *subs: "G") -> "G":
        return self._with(ast.Union(tuple(ast.SubTraversal(s.steps) for s in subs)))

    def choose(self, condition, then: "G", else_: Optional["G"] = None) -> "G":
        return self._with(ast.Choose(
            condition, ast.SubTraversal(then.steps),
            ast.SubTraversal(else_.steps) if else_ is not None else None))

    def coalesce_(self, *subs: "G") -> "G":
        return self._with(ast.Coalesce(
            tuple(ast.SubTraversal(s.steps) for s in subs)))

    def optional(self, sub: "G") -> "G":
        return self._with(ast.Optional_(ast.SubTraversal(sub.steps)))

    def repeat(self, sub: "G", times=None, until=None, emit="None",
               emit_if=None, max_depth=100) -> "G":
        return self._with(ast.Repeat(ast.SubTraversal(sub.steps), times,
                                     until, emit, emit_if, max_depth))

    # mutations
    def add_n(self, label, **properties) -> "G":
        return self._with(ast.AddN(label, tuple(properties.items())))

    def add_e(self, label, to, **properties) -> "G":
        if isinstance(to, str):
            to = ast.Ref.var(to)
        elif isinstance(to, (list, tuple)):
            to = ast.Ref.of_ids(to)
        return self._with(ast.AddE(label, to, tuple(properties.items())))

    def set_property(self, name, value) -> "G":
        return self._with(ast.SetProperty(name, value))

    def remove_property(self, name) -> "G":
        return self._with(ast.RemoveProperty(name))

    def drop(self) -> "G":
        return self._with(ast.Drop())

    def drop_edge(self, to, label=None) -> "G":
        if isinstance(to, str):
            to = ast.Ref.var(to)
        elif isinstance(to, (list, tuple)):
            to = ast.Ref.of_ids(to)
        return self._with(ast.DropEdge(to, label))

    def drop_edge_by_id(self, edge_ids) -> "G":
        return self._with(ast.DropEdge(ast.Ref.all(), None, tuple(edge_ids)))


def g() -> G:
    return G()


# ---------------------------------------------------------------------------
# Batch builder (reference: read_batch/write_batch, dsl.rs:17-127)
# ---------------------------------------------------------------------------


class BatchBuilder:
    def __init__(self, mode: str):
        self.mode = mode
        self.entries: list = []
        self._returns: tuple = ()

    def var_as(self, name: str, trav: G,
               condition: Optional[ast.BatchCondition] = None,
               foreach_param: Optional[str] = None) -> "BatchBuilder":
        self.entries.append(ast.BatchEntry(name, trav.build(), condition,
                                           foreach_param))
        return self

    def var_as_if(self, name: str, condition: ast.BatchCondition,
                  trav: G) -> "BatchBuilder":
        return self.var_as(name, trav, condition=condition)

    def for_each_param(self, param: str, name: str, body: G) -> "BatchBuilder":
        return self.var_as(name, body, foreach_param=param)

    def returning(self, *names: str) -> "BatchBuilder":
        self._returns = names
        return self

    def build(self, parameters: Optional[dict] = None) -> ast.Batch:
        return ast.Batch(self.mode, tuple(self.entries), tuple(self._returns),
                         parameters or {})

    def to_request_json(self, query_name: Optional[str] = None,
                        parameters: Optional[dict] = None,
                        parameter_types: Optional[dict] = None) -> dict:
        """Serialize to the reference's dynamic-query wire JSON — POSTable
        to any HelixDB /v1/query endpoint or this engine's server."""
        from .plans.wire_out import serialize_request
        return serialize_request(self.build(), query_name, parameters,
                                 parameter_types)


def read_batch() -> BatchBuilder:
    return BatchBuilder("read")


def write_batch() -> BatchBuilder:
    return BatchBuilder("write")


class Cond:
    @staticmethod
    def var_not_empty(var):
        return ast.BatchCondition("VarNotEmpty", var)

    @staticmethod
    def var_empty(var):
        return ast.BatchCondition("VarEmpty", var)

    @staticmethod
    def var_min_size(var, n):
        return ast.BatchCondition("VarMinSize", var, n)

    @staticmethod
    def prev_not_empty():
        return ast.BatchCondition("PrevNotEmpty")
