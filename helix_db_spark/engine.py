"""HelixSparkEngine: top-level facade.

Ties the catalog, step compiler and batch executor together; the Spark-side
equivalent of the reference's engine container behind ``POST /v1/query``
(sdks/python/src/helixdb/client.py:170-196).
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import DataFrame, SparkSession

from .catalog import GraphCatalog
from .dsl import G
from .plans import ast
from .plans.batch import BatchExecutor
from .plans.compiler import ExecContext, StepCompiler, Stream


class HelixSparkEngine:
    def __init__(self, catalog: GraphCatalog):
        self.catalog = catalog
        self.spark = catalog.spark
        self._executor = BatchExecutor(catalog)

    # -- single traversal ---------------------------------------------------

    def run(self, trav, params: Optional[dict] = None) -> DataFrame:
        """Execute one traversal, returning its terminal DataFrame."""
        traversal = trav.build() if isinstance(trav, G) else trav
        ctx = ExecContext(self.catalog, params=params or {})
        compiler = StepCompiler(ctx)
        stream = compiler.run(traversal)
        return self._executor._materialize(compiler, stream)

    def stream(self, trav, params: Optional[dict] = None) -> Stream:
        traversal = trav.build() if isinstance(trav, G) else trav
        ctx = ExecContext(self.catalog, params=params or {})
        return StepCompiler(ctx).run(traversal)

    # -- batches -------------------------------------------------------------

    def execute_batch(self, batch, params: Optional[dict] = None
                      ) -> Dict[str, DataFrame]:
        if hasattr(batch, "build") and not isinstance(batch, ast.Batch):
            batch = batch.build()
        return self._executor.execute(batch, params)

    # -- wire protocol (tagged JSON request, POST /v1/query analogue) --------

    def execute_json(self, request: dict) -> dict:
        from .plans.wire import parse_request, serialize_results
        batch = parse_request(request)
        results = self._executor.execute(batch)
        return serialize_results(results)
