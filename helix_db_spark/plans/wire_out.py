"""Wire serializer: this engine's AST -> the reference's dynamic-query JSON.

Inverse of :mod:`plans.wire` (tagged serde-style encoding,
sdks/python/src/helixdb/dsl.py:34-84): lets programs built with this
engine's DSL be shipped to any HelixDB endpoint, POSTed between instances,
or packaged as ``queries.json`` stored-route bundles
(query_generator.rs:49-62, version 5). Round-trip property:
``parse_request(serialize_request(batch)) == batch`` (tested), and the
emitted JSON is structurally equal to what the reference SDK emits for the
same program (tests/test_wire_roundtrip.py).
"""

from __future__ import annotations

import json
from typing import Any, Optional

from . import ast


class WireOutError(ValueError):
    """AST shape that has no wire representation."""


# ---------------------------------------------------------------------------
# values / exprs / bounds
# ---------------------------------------------------------------------------


def value_json(v: Any):
    """python-native -> tagged PropertyValue (coercions per dsl.py:355-395:
    int->I64, float->F64, str->String, homogeneous lists->typed arrays)."""
    if v is None:
        return "Null"
    if isinstance(v, bool):
        return {"Bool": v}
    if isinstance(v, int):
        return {"I64": v}
    if isinstance(v, float):
        return {"F64": v}
    if isinstance(v, str):
        return {"String": v}
    if isinstance(v, (bytes, bytearray)):
        return {"Bytes": list(v)}
    if isinstance(v, dict):
        return {"Object": {k: value_json(x) for k, x in sorted(v.items())}}
    if isinstance(v, (list, tuple)):
        if v and all(isinstance(x, str) for x in v):
            return {"StringArray": list(v)}
        if v and all(isinstance(x, int) and not isinstance(x, bool)
                     for x in v):
            return {"I64Array": list(v)}
        if v and all(isinstance(x, (int, float))
                     and not isinstance(x, bool) for x in v):
            return {"F64Array": [float(x) for x in v]}
        return {"Array": [value_json(x) for x in v]}
    raise WireOutError(f"unserializable value {v!r}")


def expr_json(e: ast.Expr):
    if isinstance(e, ast.Property):
        return {"Property": e.name}
    if isinstance(e, ast.IdExpr):
        return "Id"
    if isinstance(e, ast.TimestampExpr):
        return "Timestamp"
    if isinstance(e, ast.DateTimeNowExpr):
        return "DateTimeNow"
    if isinstance(e, ast.Constant):
        return {"Constant": value_json(e.value)}
    if isinstance(e, ast.Param):
        return {"Param": e.name}
    if isinstance(e, ast.BinOp):
        return {e.op: [expr_json(e.left), expr_json(e.right)]}
    if isinstance(e, ast.Neg):
        return {"Neg": expr_json(e.expr)}
    if isinstance(e, ast.Case):
        return {"Case": {
            "when_then": [[predicate_json(p), expr_json(x)]
                          for p, x in e.when_then],
            "else_expr": expr_json(e.else_expr)
            if e.else_expr is not None else None,
        }}
    raise WireOutError(f"unserializable expr {e!r}")


def _rhs(e: ast.Expr, tag: str) -> tuple:
    """(wire tag, payload) for cmp/str/isin right-hand sides: literal forms
    for Constants, the *Expr variant otherwise."""
    if isinstance(e, ast.Constant):
        return tag, value_json(e.value)
    return tag + "Expr", expr_json(e)


def predicate_json(p: ast.Predicate):
    if isinstance(p, ast.Cmp):
        tag, rhs = _rhs(p.rhs, p.op)
        return {tag: [p.prop, rhs]}
    if isinstance(p, ast.Between):
        if isinstance(p.lo, ast.Constant) and isinstance(p.hi, ast.Constant):
            return {"Between": [p.prop, value_json(p.lo.value),
                                value_json(p.hi.value)]}
        return {"BetweenExpr": [p.prop, expr_json(p.lo), expr_json(p.hi)]}
    if isinstance(p, ast.HasKeyPred):
        return {"HasKey": p.prop}
    if isinstance(p, ast.IsNullPred):
        return {"IsNull": p.prop}
    if isinstance(p, ast.IsNotNullPred):
        return {"IsNotNull": p.prop}
    if isinstance(p, ast.StrPred):
        if isinstance(p.value, ast.Constant):
            return {p.op: [p.prop, p.value.value]}
        return {p.op + "Expr": [p.prop, expr_json(p.value)]}
    if isinstance(p, ast.IsIn):
        tag, rhs = _rhs(p.values, "IsIn")
        return {tag: [p.prop, rhs]}
    if isinstance(p, ast.And):
        return {"And": [predicate_json(x) for x in p.preds]}
    if isinstance(p, ast.Or):
        return {"Or": [predicate_json(x) for x in p.preds]}
    if isinstance(p, ast.Not):
        return {"Not": predicate_json(p.pred)}
    if isinstance(p, ast.Compare):
        return {"Compare": {"left": expr_json(p.left), "op": p.op,
                            "right": expr_json(p.right)}}
    raise WireOutError(f"unserializable predicate {p!r}")


def ref_json(r: ast.Ref):
    if r.kind == "all":
        return "All"
    if r.kind == "ids":
        return {"Ids": list(r.ids or ())}
    if r.kind == "var":
        return {"Var": r.name}
    if r.kind == "param":
        return {"Param": r.name}
    raise WireOutError(f"unserializable ref {r!r}")


def bound_json(b):
    if isinstance(b, int):
        return {"Literal": b}
    return expr_json(b)


def property_input_json(v):
    if isinstance(v, ast.Expr):
        return {"Expr": expr_json(v)}
    return {"Value": value_json(v)}


_INDEX_TAGS = {
    "node_equality": "NodeEquality", "node_range": "NodeRange",
    "edge_equality": "EdgeEquality", "edge_range": "EdgeRange",
    "node_vector": "NodeVector", "node_text": "NodeText",
    "edge_vector": "EdgeVector", "edge_text": "EdgeText",
}


def index_spec_json(spec: ast.IndexSpec):
    payload: dict = {"label": spec.label, "property": spec.property}
    if spec.kind in ("node_equality", "edge_equality") and spec.unique:
        payload["unique"] = True
    if spec.kind in ("node_range", "edge_range"):
        payload["direction"] = spec.direction
    if spec.tenant_property is not None:
        payload["tenant_property"] = spec.tenant_property
    return {_INDEX_TAGS[spec.kind]: payload}


# ---------------------------------------------------------------------------
# steps
# ---------------------------------------------------------------------------

_HOP_TAGS = {"out": "Out", "in": "In", "both": "Both", "out_e": "OutE",
             "in_e": "InE", "both_e": "BothE"}
_HOP_UNITS = {"out_n": "OutN", "in_n": "InN", "other_n": "OtherN"}


def _sub_json(s: ast.SubTraversal):
    return {"steps": steps_json(s.steps)}


def steps_json(steps):
    """Serialize a step list; a single AST step may expand to several wire
    steps (N/E with both a label and an id/var/param ref — the wire payload
    has no label slot there, so the label rides as a HasLabel step that the
    parser fuses back, keeping parse(serialize(b)) == b)."""
    out = []
    for s in steps:
        j = step_json(s)
        out.extend(j) if isinstance(j, list) else out.append(j)
    return out


def step_json(s: ast.Step):  # noqa: C901 — one arm per step family
    if isinstance(s, ast.N):
        if s.label is not None:
            if s.ref.kind == "all":
                return {"NWhere": {"Eq": ["$label", {"String": s.label}]}}
            return [{"N": ref_json(s.ref)}, {"HasLabel": s.label}]
        return {"N": ref_json(s.ref)}
    if isinstance(s, ast.E):
        if s.label is not None:
            if s.ref.kind == "all":
                return {"EWhere": {"Eq": ["$label", {"String": s.label}]}}
            return [{"E": ref_json(s.ref)}, {"EdgeHasLabel": s.label}]
        return {"E": ref_json(s.ref)}
    if isinstance(s, ast.NWhere):
        return {"NWhere": predicate_json(s.pred)}
    if isinstance(s, ast.EWhere):
        return {"EWhere": predicate_json(s.pred)}
    if isinstance(s, ast.VectorSearch):
        payload = {"label": s.label, "property": s.property,
                   "query_vector": {"Value": {"F32Array":
                                              [float(x) for x in s.query_vector]}},
                   "k": bound_json(s.k)}
        if s.tenant_value is not None:
            payload = {**payload,
                       "tenant_value": property_input_json(s.tenant_value)}
        if s.method != "exact":  # net-new optional field; omit the default
            payload = {**payload, "method": s.method}
        return {"VectorSearchNodes" if s.target == "nodes"
                else "VectorSearchEdges": payload}
    if isinstance(s, ast.TextSearch):
        payload = {"label": s.label, "property": s.property,
                   "query_text": {"Value": {"String": s.query_text}},
                   "k": bound_json(s.k)}
        if s.tenant_value is not None:
            payload = {**payload,
                       "tenant_value": property_input_json(s.tenant_value)}
        return {"TextSearchNodes" if s.target == "nodes"
                else "TextSearchEdges": payload}
    if isinstance(s, ast.Hop):
        if s.op in _HOP_UNITS:
            return _HOP_UNITS[s.op]
        return {_HOP_TAGS[s.op]: s.label}
    if isinstance(s, ast.Where):
        return {"Where": predicate_json(s.pred)}
    if isinstance(s, ast.Has):
        return {"Has": [s.prop, value_json(s.value)]}
    if isinstance(s, ast.HasLabel):
        return {"HasLabel": s.label}
    if isinstance(s, ast.HasKey):
        return {"HasKey": s.prop}
    if isinstance(s, ast.Dedup):
        return "Dedup"
    if isinstance(s, ast.Within):
        return {"Within": s.var}
    if isinstance(s, ast.Without):
        return {"Without": s.var}
    if isinstance(s, ast.Inject):
        return {"Inject": s.var}
    if isinstance(s, ast.Select):
        return {"Select": s.var}
    if isinstance(s, ast.Store):
        return {"Store": s.name}
    if isinstance(s, ast.Bind):
        return {"Bind": s.name}
    if isinstance(s, ast.OrderBy):
        if len(s.keys) == 1:
            prop, order = s.keys[0]
            return {"OrderBy": [prop, order]}
        return {"OrderByMultiple": [[p, o] for p, o in s.keys]}
    if isinstance(s, ast.Limit):
        return {"Limit": s.n} if isinstance(s.n, int) \
            else {"LimitBy": expr_json(s.n)}
    if isinstance(s, ast.Skip):
        return {"Skip": s.n} if isinstance(s.n, int) \
            else {"SkipBy": expr_json(s.n)}
    if isinstance(s, ast.Range):
        if isinstance(s.start, int) and isinstance(s.end, int):
            return {"Range": [s.start, s.end]}
        return {"RangeBy": [bound_json(s.start), bound_json(s.end)]}
    if isinstance(s, ast.Count):
        return "Count"
    if isinstance(s, ast.Exists):
        return "Exists"
    if isinstance(s, ast.Group):
        return {"Group": s.prop}
    if isinstance(s, ast.GroupCount):
        return {"GroupCount": s.prop}
    if isinstance(s, ast.AggregateBy):
        return {"AggregateBy": [s.fn, s.prop]}
    if isinstance(s, ast.IdTerminal):
        return "Id"
    if isinstance(s, ast.LabelTerminal):
        return "Label"
    if isinstance(s, ast.Values):
        return {"Values": list(s.props)}
    if isinstance(s, ast.ValueMap):
        return {"ValueMap": list(s.props) if s.props is not None else None}
    if isinstance(s, ast.Project):
        out = []
        for proj in s.projections:
            if isinstance(proj.source, ast.Expr):
                out.append({"alias": proj.alias,
                            "expr": expr_json(proj.source)})
            else:
                out.append({"source": proj.source, "alias": proj.alias})
        return {"Project": out}
    if isinstance(s, ast.EdgeProperties):
        return "EdgeProperties"
    if isinstance(s, ast.ProjectBindings):
        projs = []
        for alias, refs in s.projections:
            def tgt(b):
                return "Current" if b is None else {"Binding": b}
            if len(refs) == 1:
                b, src = refs[0]
                projs.append({"kind": "Property", "target": tgt(b),
                              "source": src, "alias": alias})
            else:
                projs.append({"kind": "Coalesce",
                              "refs": [{"target": tgt(b), "source": src}
                                       for b, src in refs],
                              "alias": alias})
        return {"ProjectBindings": {"projections": projs,
                                    "distinct": s.distinct}}
    if isinstance(s, ast.Union):
        return {"Union": [_sub_json(x) for x in s.subs]}
    if isinstance(s, ast.Choose):
        return {"Choose": {"condition": predicate_json(s.condition),
                           "then_traversal": _sub_json(s.then),
                           "else_traversal": _sub_json(s.else_)
                           if s.else_ is not None else None}}
    if isinstance(s, ast.Coalesce):
        return {"Coalesce": [_sub_json(x) for x in s.subs]}
    if isinstance(s, ast.Optional_):
        return {"Optional": _sub_json(s.sub)}
    if isinstance(s, ast.Repeat):
        return {"Repeat": {
            "traversal": _sub_json(s.sub),
            "times": s.times,
            "until": predicate_json(s.until) if s.until is not None else None,
            "emit": s.emit,
            "emit_predicate": predicate_json(s.emit_if)
            if s.emit_if is not None else None,
            "max_depth": s.max_depth,
        }}
    if isinstance(s, ast.AddN):
        return {"AddN": {"label": s.label,
                         "properties": [[n, property_input_json(v)]
                                        for n, v in s.properties]}}
    if isinstance(s, ast.AddE):
        return {"AddE": {"label": s.label, "to": ref_json(s.to),
                         "properties": [[n, property_input_json(v)]
                                        for n, v in s.properties]}}
    if isinstance(s, ast.SetProperty):
        return {"SetProperty": [s.name, property_input_json(s.value)]}
    if isinstance(s, ast.RemoveProperty):
        return {"RemoveProperty": s.name}
    if isinstance(s, ast.Drop):
        return "Drop"
    if isinstance(s, ast.DropEdge):
        if s.edge_ids is not None:
            return {"DropEdgeById": {"Ids": list(s.edge_ids)}}
        if s.label is not None:
            return {"DropEdgeLabeled": {"to": ref_json(s.to),
                                        "label": s.label}}
        return {"DropEdge": ref_json(s.to)}
    if isinstance(s, ast.CreateIndex):
        return {"CreateIndex": {"spec": index_spec_json(s.spec),
                                "if_not_exists": s.if_not_exists}}
    if isinstance(s, ast.DropIndex):
        return {"DropIndex": {"spec": index_spec_json(s.spec)}}
    if isinstance(s, ast.ReservedNoop):
        return s.tag
    raise WireOutError(f"unserializable step {s!r}")


# ---------------------------------------------------------------------------
# batch envelope / request / bundles
# ---------------------------------------------------------------------------


def condition_json(c: ast.BatchCondition):
    if c.kind == "PrevNotEmpty":
        return "PrevNotEmpty"
    if c.kind in ("VarNotEmpty", "VarEmpty"):
        return {c.kind: c.var}
    if c.kind == "VarMinSize":
        return {"VarMinSize": [c.var, c.min_size]}
    raise WireOutError(f"unserializable condition {c!r}")


def _entry_json(e: ast.BatchEntry):
    if e.foreach_param is not None:
        body = [_entry_json(x) for x in e.foreach_body] if e.foreach_body \
            else [{"Query": {"name": e.var_name,
                             "steps": steps_json(e.traversal.steps),
                             "condition": None}}]
        return {"ForEach": {"param": e.foreach_param, "body": body}}
    return {"Query": {"name": e.var_name,
                      "steps": steps_json(e.traversal.steps),
                      "condition": condition_json(e.condition)
                      if e.condition is not None else None}}


def batch_query_json(batch: ast.Batch) -> dict:
    return {"queries": [_entry_json(e) for e in batch.entries],
            "returns": list(batch.returns)}


def serialize_request(batch: ast.Batch, query_name: Optional[str] = None,
                      parameters: Optional[dict] = None,
                      parameter_types: Optional[dict] = None) -> dict:
    out = {"request_type": batch.mode, "query_name": query_name,
           "query": batch_query_json(batch)}
    if parameters is not None:
        out["parameters"] = parameters
    if parameter_types is not None:
        out["parameter_types"] = parameter_types
    return out


def serialize_query_bundle(read_routes: dict, write_routes: dict,
                           read_parameters: Optional[dict] = None,
                           write_parameters: Optional[dict] = None,
                           version: int = 5) -> str:
    """queries.json stored-route bundle (query_generator.rs:49-62).
    Routes map name -> ast.Batch (mode must match the side)."""
    for name, b in read_routes.items():
        if b.mode != "read":
            raise WireOutError(f"read route {name!r} holds a write batch")
    for name, b in write_routes.items():
        if b.mode != "write":
            raise WireOutError(f"write route {name!r} holds a read batch")
    payload = {
        "version": version,
        "read_routes": {k: batch_query_json(v)
                        for k, v in sorted(read_routes.items())},
        "write_routes": {k: batch_query_json(v)
                         for k, v in sorted(write_routes.items())},
        "read_parameters": read_parameters or {},
        "write_parameters": write_parameters or {},
    }
    return json.dumps(payload, indent=2)
