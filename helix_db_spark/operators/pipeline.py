"""End-to-end corpus curation: the full training-data recipe as one
composable operator, built entirely from the individually-graded pieces.

A user of the engine runs ONE call to apply the standard pre-training
curation sequence — quality gate, repetition gate, eval-set
decontamination, exact dedup, deterministic split — instead of wiring the
operators by hand; every stage keeps the scale shape its component
documents (projection gates ride the scan; contamination broadcasts the
bounded benchmark; dedup shuffles once on the content digest; the split
is a free column). Deterministic end to end, so the whole pipeline
carries a single value-hash oracle (entry_queries.curate_corpus_pipeline).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def curate_corpus(docs: DataFrame, bench: Optional[DataFrame] = None,
                  id_col: str = "doc_id", text_col: str = "text",
                  min_quality: float = 0.3,
                  max_top2gram: float = 0.5,
                  contam_n: int = 8,
                  weights: Sequence[float] = (0.98, 0.01, 0.01)) -> DataFrame:
    """Survivors of the full curation recipe with (id, quality, split).

    Stage order matters and is part of the contract: gates run before
    dedup (so a near-empty duplicate can't shadow a higher-quality copy
    with a larger id), and dedup's min-id survivor is chosen among GATED
    rows only. Decontamination is per-document, so running it after the
    gates is equivalent to before (cheaper: fewer docs shingle).
    """
    from .dedup import _mat, benchmark_contamination, exact_dedup
    from .sampling import split_assign
    from .textstats import quality_score, repetition_stats

    q = docs.select(F.col(id_col), F.col(text_col),
                    F.round(quality_score(F.col(text_col)), 6)
                     .alias("quality"))
    rep = repetition_stats(docs, id_col, text_col) \
        .select(F.col(id_col), "top_2gram_frac")
    gated = (q.join(rep, on=id_col)
              .filter((F.col("quality") >= min_quality)
                      & (F.coalesce(F.col("top_2gram_frac"), F.lit(0.0))
                         <= max_top2gram)))
    # materialize once: contamination (shingles), its anti-join, the dedup
    # digest groupBy, and the final semi-join all consume `gated` — without
    # this the quality/repetition expression tree (the two priciest
    # projections) re-executes per consumer (measured 17s -> ~6s at sf0.1).
    # _mat = the driver-benched eager persist with a bounded FIFO.
    gated = _mat(gated)
    if bench is not None:
        hits = benchmark_contamination(
            gated.select(id_col, text_col), bench, id_col, text_col,
            n=contam_n)
        gated = gated.join(hits.select(id_col), on=id_col, how="left_anti")
    kept = exact_dedup(gated, id_col, text_col)
    return split_assign(kept, id_col, weights) \
        .select(F.col(id_col), "quality", "split")
