"""Batch executor: ordered var pipeline + conditions + ForEach.

Reference semantics (dsl.rs:17-127, SURVEY §2.12): a batch is an ordered list
of named traversals sharing a var namespace (CTE-like, evaluated in order),
optional run-conditions on var sizes, and ForEach over an array parameter.
The driver (this process) is the only control-flow locus; executors do the
data movement.
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import DataFrame

from ..catalog import GraphCatalog
from . import ast
from .compiler import ExecContext, StepCompiler, Stream


class BatchExecutor:
    def __init__(self, catalog: GraphCatalog):
        self.catalog = catalog

    def execute(self, batch: ast.Batch,
                params: Optional[dict] = None) -> Dict[str, DataFrame]:
        ctx = ExecContext(self.catalog,
                          params=dict(batch.parameters, **(params or {})),
                          mode=batch.mode)
        compiler = StepCompiler(ctx)
        prev: Optional[Stream] = None
        for entry in batch.entries:
            if entry.condition is not None and not self._check(
                    entry.condition, ctx, prev):
                continue
            if entry.foreach_param is not None:
                prev = self._foreach(entry, ctx, compiler)
            else:
                prev = compiler.run(entry.traversal)
            if entry.var_name:
                ctx.variables[entry.var_name] = prev
        out: Dict[str, DataFrame] = {}
        for name in batch.returns:
            stream = ctx.variables[name]
            out[name] = self._materialize(compiler, stream)
        return out

    def _materialize(self, compiler: StepCompiler, stream: Stream) -> DataFrame:
        if stream.is_terminal():
            return stream.single()
        # non-terminal returns: ids + label (element stream identity)
        return compiler._step_Project(
            ast.Project((ast.Projection("id", "$id"),
                         ast.Projection("label", "$label"))), stream).single()

    def _check(self, cond: ast.BatchCondition, ctx, prev) -> bool:
        if cond.kind == "PrevNotEmpty":
            return prev is not None and not prev.is_empty()
        stream = ctx.variables.get(cond.var)
        if cond.kind == "VarNotEmpty":
            return stream is not None and not stream.is_empty()
        if cond.kind == "VarEmpty":
            return stream is None or stream.is_empty()
        if cond.kind == "VarMinSize":
            if stream is None:
                return False
            n = sum(df.count() for df in stream.frames.values())
            return n >= cond.min_size
        raise ValueError(f"unknown condition {cond.kind}")

    @staticmethod
    def _accumulate(acc: Optional[Stream], res: Stream) -> Stream:
        if acc is None:
            return res
        frames = dict(acc.frames)
        for l, df in res.frames.items():
            frames[l] = (frames[l].unionByName(df, allowMissingColumns=True)
                         if l in frames else df)
        return Stream(acc.kind, frames)

    def _foreach(self, entry: ast.BatchEntry, ctx: ExecContext,
                 compiler: StepCompiler) -> Stream:
        """Run body once per element of an array param; results accumulate
        per var name (parity fixture 014: 2 rows in => count 2). The body is
        either a single traversal (builder API) or a sub-batch of entries
        (wire ForEach{param, body}, dsl.py:2193-2208) — per element the
        entries run in order, each accumulating into its own var."""
        items = ctx.params[entry.foreach_param]
        acc: Optional[Stream] = None
        accs: dict = {}
        for item in items:
            saved = ctx.params
            ctx.params = dict(saved)
            if isinstance(item, dict):
                ctx.params.update(item)
            else:
                ctx.params[entry.foreach_param + "_item"] = item
            try:
                if entry.foreach_body:
                    for sub in entry.foreach_body:
                        res = compiler.run(sub.traversal)
                        if sub.var_name:
                            accs[sub.var_name] = self._accumulate(
                                accs.get(sub.var_name), res)
                            ctx.variables[sub.var_name] = accs[sub.var_name]
                        acc = res
                else:
                    acc = self._accumulate(acc, compiler.run(entry.traversal))
            finally:
                ctx.params = saved
        if acc is None:
            acc = Stream("value", {None: self.catalog.spark.range(0)})
        return acc
