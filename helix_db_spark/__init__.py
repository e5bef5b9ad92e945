"""helix_db_spark — a PySpark-native graph+vector analytics engine.

Re-expresses the HelixDB query surface (step-pipeline traversals, vector /
BM25 search, batch envelopes) as Catalyst-optimized DataFrame programs, and
adds the large-scale training-data pipeline operators (dedup, similarity
search, text analysis, multimodal columns) the reference lacks.
"""

from .catalog import GraphCatalog
from .dsl import Cond, G, P, X, g, read_batch, write_batch
from .engine import HelixSparkEngine
from .session import get_spark

__all__ = [
    "GraphCatalog",
    "HelixSparkEngine",
    "Cond",
    "G",
    "P",
    "X",
    "g",
    "read_batch",
    "write_batch",
    "get_spark",
]
