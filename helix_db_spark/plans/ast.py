"""Logical AST for the helix_db_spark engine.

Mirrors the reference's dynamic-query step algebra (HelixDB SDK AST —
``sdks/rust/src/dsl.rs:2795-3262``, ``sdks/python/src/helixdb/dsl.py``) as
plain dataclasses. This is the *logical plan* the Step compiler consumes;
the wire (tagged-JSON) codec lives in ``plans/wire.py``.

Nothing here touches Spark — pure data.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional, Union

# ---------------------------------------------------------------------------
# Scalar expressions (reference: dsl.rs:1390-1422)
# ---------------------------------------------------------------------------


class Expr:
    """Base scalar expression."""


@dataclass(frozen=True)
class Property(Expr):
    """Property access; dotted paths reach into nested objects."""

    name: str


@dataclass(frozen=True)
class IdExpr(Expr):
    """Current element id (``$id``)."""


@dataclass(frozen=True)
class TimestampExpr(Expr):
    """Server-side now, UTC epoch millis (frozen per query)."""


@dataclass(frozen=True)
class DateTimeNowExpr(Expr):
    """Server-side now as a DateTime value (frozen per query)."""


@dataclass(frozen=True)
class Constant(Expr):
    value: Any  # python-native; tag inferred (int->I64, float->F64, ...)


@dataclass(frozen=True)
class Param(Expr):
    name: str


@dataclass(frozen=True)
class BinOp(Expr):
    op: str  # Add | Sub | Mul | Div | Mod
    left: Expr
    right: Expr


@dataclass(frozen=True)
class Neg(Expr):
    expr: Expr


@dataclass(frozen=True)
class Case(Expr):
    """First matching branch wins; no else => explicit Null (dsl.rs:1415-1421)."""

    when_then: tuple  # tuple[(Predicate, Expr), ...]
    else_expr: Optional[Expr] = None


# ---------------------------------------------------------------------------
# Predicates (reference: dsl.rs:1586-1692)
# ---------------------------------------------------------------------------


class Predicate:
    """Base predicate."""


_CMP_OPS = ("Eq", "Neq", "Gt", "Gte", "Lt", "Lte")


@dataclass(frozen=True)
class Cmp(Predicate):
    """Eq/Neq/Gt/Gte/Lt/Lte(prop, value-or-expr)."""

    op: str
    prop: str
    rhs: Expr  # Constant for the literal forms, anything for *Expr forms

    def __post_init__(self) -> None:
        if self.op not in _CMP_OPS:
            raise ValueError(f"bad cmp op {self.op}")


@dataclass(frozen=True)
class Between(Predicate):
    """Inclusive both ends (dsl.rs:1599-1600)."""

    prop: str
    lo: Expr
    hi: Expr


@dataclass(frozen=True)
class HasKeyPred(Predicate):
    prop: str


@dataclass(frozen=True)
class IsNullPred(Predicate):
    """Missing OR explicitly null (dsl.rs:1615-1620)."""

    prop: str


@dataclass(frozen=True)
class IsNotNullPred(Predicate):
    prop: str


@dataclass(frozen=True)
class StrPred(Predicate):
    op: str  # StartsWith | EndsWith | Contains
    prop: str
    value: Expr  # Constant(str) or expression (ContainsExpr)


@dataclass(frozen=True)
class IsIn(Predicate):
    prop: str
    values: Expr  # Constant(list) or Param


@dataclass(frozen=True)
class And(Predicate):
    preds: tuple


@dataclass(frozen=True)
class Or(Predicate):
    preds: tuple


@dataclass(frozen=True)
class Not(Predicate):
    pred: Predicate


@dataclass(frozen=True)
class Compare(Predicate):
    """Expression-to-expression comparison (dsl.rs:1639-1647)."""

    left: Expr
    op: str
    right: Expr


# ---------------------------------------------------------------------------
# Refs (N/E sources; reference: dsl.py:463-533)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Ref:
    """Node/Edge source reference: All | Ids | Var | Param."""

    kind: str  # all | ids | var | param
    ids: Optional[tuple] = None
    name: Optional[str] = None

    @staticmethod
    def all() -> "Ref":
        return Ref("all")

    @staticmethod
    def of_ids(ids) -> "Ref":
        return Ref("ids", ids=tuple(ids))

    @staticmethod
    def var(name: str) -> "Ref":
        return Ref("var", name=name)

    @staticmethod
    def param(name: str) -> "Ref":
        return Ref("param", name=name)


# ---------------------------------------------------------------------------
# Steps (reference: dsl.rs:2795-3262)
# ---------------------------------------------------------------------------


class Step:
    """Base step."""


# --- sources ---


@dataclass(frozen=True)
class N(Step):
    ref: Ref = field(default_factory=Ref.all)
    label: Optional[str] = None  # sugar: label-scoped scan


@dataclass(frozen=True)
class NWhere(Step):
    """Index-friendly source predicate scan (pushdown eligible)."""

    pred: Predicate
    label: Optional[str] = None


@dataclass(frozen=True)
class E(Step):
    ref: Ref = field(default_factory=Ref.all)
    label: Optional[str] = None


@dataclass(frozen=True)
class EWhere(Step):
    pred: Predicate
    label: Optional[str] = None


@dataclass(frozen=True)
class VectorSearch(Step):
    """Top-k ANN; ascending $distance (dsl.rs:2813-2832)."""

    target: str  # nodes | edges
    label: str
    property: str
    query_vector: tuple
    k: Union[int, Expr]
    tenant_value: Any = None
    method: str = "exact"  # exact | lsh | ivf (ivf is net-new)


@dataclass(frozen=True)
class TextSearch(Step):
    """Top-k BM25; same $distance contract (dsl.rs:2834-2847)."""

    target: str  # nodes | edges
    label: str
    property: str
    query_text: str = ""
    k: Union[int, Expr] = 10
    tenant_value: Any = None


# --- navigation ---


@dataclass(frozen=True)
class Hop(Step):
    """Out/In/Both/OutE/InE/BothE/OutN/InN/OtherN (dsl.rs:2886-2942)."""

    op: str  # out | in | both | out_e | in_e | both_e | out_n | in_n | other_n
    label: Optional[str] = None  # edge-label filter for node->x hops


# --- filters ---


@dataclass(frozen=True)
class Where(Step):
    pred: Predicate


@dataclass(frozen=True)
class Has(Step):
    prop: str
    value: Any


@dataclass(frozen=True)
class HasLabel(Step):
    label: str


@dataclass(frozen=True)
class HasKey(Step):
    prop: str


# --- stream ops ---


@dataclass(frozen=True)
class Dedup(Step):
    """Element-identity dedup (dsl.rs:2960)."""


@dataclass(frozen=True)
class Within(Step):
    """Semi-join on a stored var (dsl.rs:2963-2964)."""

    var: str


@dataclass(frozen=True)
class Without(Step):
    """Anti-join on a stored var (dsl.rs:2966-2967)."""

    var: str


@dataclass(frozen=True)
class Inject(Step):
    """Union a stored var into the stream (dsl.rs:3256-3261)."""

    var: str


@dataclass(frozen=True)
class Select(Step):
    """Replace the stream with a stored var (dsl.rs:3006-3009)."""

    var: str


@dataclass(frozen=True)
class Store(Step):
    """As/Store: name the current stream (dsl.rs:2995-3004)."""

    name: str


@dataclass(frozen=True)
class Limit(Step):
    n: Union[int, Expr]


@dataclass(frozen=True)
class Skip(Step):
    n: Union[int, Expr]


@dataclass(frozen=True)
class Range(Step):
    """[start, end) == skip(start).limit(end-start) (dsl.rs:2989-2993)."""

    start: Union[int, Expr]
    end: Union[int, Expr]


@dataclass(frozen=True)
class OrderBy(Step):
    keys: tuple  # tuple[(prop, "Asc"|"Desc"), ...]


# --- aggregation terminals ---


@dataclass(frozen=True)
class Count(Step):
    pass


@dataclass(frozen=True)
class Exists(Step):
    pass


@dataclass(frozen=True)
class Group(Step):
    prop: str


@dataclass(frozen=True)
class GroupCount(Step):
    prop: str


@dataclass(frozen=True)
class AggregateBy(Step):
    fn: str  # Count | Sum | Min | Max | Mean (dsl.rs:2248-2261)
    prop: Optional[str] = None


# --- projection terminals ---


@dataclass(frozen=True)
class IdTerminal(Step):
    pass


@dataclass(frozen=True)
class LabelTerminal(Step):
    pass


@dataclass(frozen=True)
class Values(Step):
    props: tuple


@dataclass(frozen=True)
class ValueMap(Step):
    props: Optional[tuple] = None  # None => all properties


@dataclass(frozen=True)
class Projection:
    """alias <- property | expr; $from.<p>/$to.<p> on edges (dsl.rs:2039-2066)."""

    alias: str
    source: Union[str, Expr]  # property name (possibly $-prefixed) or Expr


@dataclass(frozen=True)
class Project(Step):
    projections: tuple  # tuple[Projection, ...]


@dataclass(frozen=True)
class EdgeProperties(Step):
    pass


# --- row bindings (dsl.rs:3011-3012, 3043-3049) ---


@dataclass(frozen=True)
class Bind(Step):
    name: str


@dataclass(frozen=True)
class ProjectBindings(Step):
    projections: tuple  # tuple[(alias, tuple[(binding, prop), ...]), ...]
    distinct: bool = False


# --- branching / repetition (dsl.rs:3177-3197) ---


@dataclass(frozen=True)
class SubTraversal:
    steps: tuple


@dataclass(frozen=True)
class Union(Step):
    subs: tuple  # tuple[SubTraversal, ...]


@dataclass(frozen=True)
class Choose(Step):
    condition: Predicate
    then: SubTraversal
    else_: Optional[SubTraversal] = None


@dataclass(frozen=True)
class Coalesce(Step):
    subs: tuple


@dataclass(frozen=True)
class Optional_(Step):
    sub: SubTraversal


@dataclass(frozen=True)
class Repeat(Step):
    """times/until/emit loop; max_depth default 100 (dsl.py:1038-1117)."""

    sub: SubTraversal
    times: Optional[int] = None
    until: Optional[Predicate] = None
    emit: str = "None"  # None | Before | After | All
    emit_if: Optional[Predicate] = None
    max_depth: int = 100


# --- mutations (dsl.rs:3116-3167) ---


@dataclass(frozen=True)
class AddN(Step):
    label: str
    properties: tuple = ()  # tuple[(name, Expr|value), ...]


@dataclass(frozen=True)
class AddE(Step):
    label: str
    to: Ref = field(default_factory=Ref.all)
    properties: tuple = ()


@dataclass(frozen=True)
class SetProperty(Step):
    name: str
    value: Any  # Expr or literal


@dataclass(frozen=True)
class RemoveProperty(Step):
    name: str


@dataclass(frozen=True)
class Drop(Step):
    """Delete current nodes AND their edges (dsl.rs:3146-3147)."""


@dataclass(frozen=True)
class DropEdge(Step):
    to: Ref = field(default_factory=Ref.all)
    label: Optional[str] = None
    edge_ids: Optional[tuple] = None  # DropEdgeById


# --- index DDL (dsl.rs:2580-2658) ---


@dataclass(frozen=True)
class IndexSpec:
    kind: str  # node_equality|node_range|edge_equality|edge_range|node_vector|node_text|edge_vector|edge_text
    label: str
    property: str
    unique: bool = False
    direction: str = "Asc"
    tenant_property: Optional[str] = None


@dataclass(frozen=True)
class CreateIndex(Step):
    spec: IndexSpec
    if_not_exists: bool = False


@dataclass(frozen=True)
class DropIndex(Step):
    spec: IndexSpec


# --- reserved no-ops (dsl.rs:3214-3254): accept and ignore ---

RESERVED_NOOP_TAGS = (
    "Fold",
    "Unfold",
    "Path",
    "SimplePath",
    "WithSack",
    "SackSet",
    "SackAdd",
    "SackGet",
)


@dataclass(frozen=True)
class ReservedNoop(Step):
    tag: str


# ---------------------------------------------------------------------------
# Batch envelope (dsl.rs:17-127)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Traversal:
    steps: tuple  # tuple[Step, ...]


@dataclass(frozen=True)
class BatchCondition:
    """VarNotEmpty | VarEmpty | VarMinSize | PrevNotEmpty."""

    kind: str
    var: Optional[str] = None
    min_size: int = 0


@dataclass(frozen=True)
class BatchEntry:
    var_name: Optional[str]
    traversal: Traversal
    condition: Optional[BatchCondition] = None
    foreach_param: Optional[str] = None  # ForEach{param, body}
    # wire-protocol ForEach bodies hold a full sub-batch (list of entries);
    # builder-API ForEach uses the single ``traversal`` instead
    foreach_body: tuple = ()


@dataclass(frozen=True)
class Batch:
    mode: str  # read | write
    entries: tuple
    returns: tuple = ()
    parameters: dict = field(default_factory=dict)
