"""Expr / Predicate -> pyspark Column compiler.

Everything compiles to built-in Column expressions (JVM-side, whole-stage
codegen eligible) — no Python UDFs anywhere in the predicate/expression path.

Property resolution is delegated to a per-frame resolver so the same
expression tree works on any label's typed schema; missing properties
resolve to NULL (the reference's rows are heterogeneous property bags,
dsl.rs:1615-1620).
"""

from __future__ import annotations

import time
from typing import Any, Callable, Optional

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import ast

Resolver = Callable[[str], Column]
# resolver must handle: plain names, dotted paths, $id/$label/$distance/$from/$to


class ExprCompiler:
    """Compiles ast.Expr / ast.Predicate to Columns against one frame."""

    def __init__(self, resolver: Resolver, params: Optional[dict] = None,
                 now_ms: Optional[int] = None):
        self.resolve = resolver
        self.params = params or {}
        # server-side "now", frozen per query for determinism (dsl.rs Timestamp)
        self.now_ms = now_ms if now_ms is not None else int(time.time() * 1000)

    # -- expressions -------------------------------------------------------

    def expr(self, e) -> Column:
        if isinstance(e, ast.Property):
            return self.resolve(e.name)
        if isinstance(e, ast.IdExpr):
            return self.resolve("$id")
        if isinstance(e, ast.TimestampExpr):
            return F.lit(self.now_ms).cast("long")
        if isinstance(e, ast.DateTimeNowExpr):
            return (F.lit(self.now_ms).cast("long") / 1000.0).cast("timestamp")
        if isinstance(e, ast.Constant):
            return lit_value(e.value)
        if isinstance(e, ast.Param):
            if e.name not in self.params:
                raise KeyError(f"missing query parameter '{e.name}'")
            return lit_value(self.params[e.name])
        if isinstance(e, ast.BinOp):
            left, right = self.expr(e.left), self.expr(e.right)
            if e.op == "Add":
                return left + right
            if e.op == "Sub":
                return left - right
            if e.op == "Mul":
                return left * right
            if e.op == "Div":
                return left / right
            if e.op == "Mod":
                return left % right
            raise ValueError(f"unknown binop {e.op}")
        if isinstance(e, ast.Neg):
            return -self.expr(e.expr)
        if isinstance(e, ast.Case):
            # first matching branch; no else => explicit Null (dsl.rs:1415-1421)
            col = None
            for pred, val in e.when_then:
                cond, out = self.pred(pred), self.expr(val)
                col = F.when(cond, out) if col is None else col.when(cond, out)
            if col is None:
                return F.lit(None)
            return col.otherwise(
                self.expr(e.else_expr) if e.else_expr is not None else F.lit(None))
        if isinstance(e, Column):  # already-compiled escape hatch
            return e
        # bare python literal used as an expression
        return lit_value(e)

    # -- predicates ----------------------------------------------------------

    def pred(self, p) -> Column:
        if isinstance(p, ast.Cmp):
            left = self.resolve(p.prop)
            right = self.expr(p.rhs)
            return _cmp(p.op, left, right)
        if isinstance(p, ast.Between):
            c = self.resolve(p.prop)
            return (c >= self.expr(p.lo)) & (c <= self.expr(p.hi))
        if isinstance(p, ast.HasKeyPred):
            return self.resolve(p.prop).isNotNull()
        if isinstance(p, ast.IsNullPred):
            return self.resolve(p.prop).isNull()
        if isinstance(p, ast.IsNotNullPred):
            return self.resolve(p.prop).isNotNull()
        if isinstance(p, ast.StrPred):
            c = self.resolve(p.prop)
            v = self.expr(p.value)
            if p.op == "StartsWith":
                return c.startswith(v)
            if p.op == "EndsWith":
                return c.endswith(v)
            if p.op == "Contains":
                return c.contains(v)
            raise ValueError(f"unknown string predicate {p.op}")
        if isinstance(p, ast.IsIn):
            c = self.resolve(p.prop)
            vals = p.values
            if isinstance(vals, ast.Param):
                vals = ast.Constant(self.params[vals.name])
            if isinstance(vals, ast.Constant):
                return c.isin(list(vals.value))
            raise ValueError("IsIn requires literal/param array")
        if isinstance(p, ast.And):
            out = F.lit(True)
            for q in p.preds:
                out = out & self.pred(q)
            return out
        if isinstance(p, ast.Or):
            out = F.lit(False)
            for q in p.preds:
                out = out | self.pred(q)
            return out
        if isinstance(p, ast.Not):
            return ~self.pred(p.pred)
        if isinstance(p, ast.Compare):
            return _cmp(p.op, self.expr(p.left), self.expr(p.right))
        if isinstance(p, Column):
            return p
        raise ValueError(f"unknown predicate {type(p).__name__}")


def _cmp(op: str, left: Column, right: Column) -> Column:
    if op == "Eq":
        return left == right
    if op == "Neq":
        return left != right
    if op == "Gt":
        return left > right
    if op == "Gte":
        return left >= right
    if op == "Lt":
        return left < right
    if op == "Lte":
        return left <= right
    raise ValueError(f"unknown comparison {op}")


def lit_value(v: Any) -> Column:
    """Python value -> literal Column with Helix coercions (dsl.py:355-395):
    int->I64(long), float->F64(double), homogeneous lists->typed arrays."""
    if isinstance(v, Column):
        return v
    if isinstance(v, bool):
        return F.lit(v)
    if isinstance(v, int):
        return F.lit(v).cast(T.LongType())
    if isinstance(v, float):
        return F.lit(v).cast(T.DoubleType())
    if isinstance(v, (list, tuple)):
        return F.array(*[lit_value(x) for x in v])
    return F.lit(v)


def dotted_path(col: Column, path: str, dtype=None) -> Column:
    """Dotted-path access into nested values (nested-dsl.test.ts:46-69).

    Struct/Map columns use getField chains; JSON-string columns fall back to
    get_json_object (still JVM-side).
    """
    head, _, rest = path.partition(".")
    if not rest:
        return col
    if dtype is not None and isinstance(dtype, T.StringType):
        return F.get_json_object(col, "$." + rest)
    out = col
    for part in rest.split("."):
        out = out.getField(part) if hasattr(out, "getField") else out[part]
    return out
