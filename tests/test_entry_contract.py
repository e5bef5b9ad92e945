"""Replay the driver contract: every queries() entry vs its oracle_sql().

This mirrors the grading gate (CORRECTNESS_r{N}.json): row count, sorted
column names, and order-insensitive values must match DuckDB.
"""

import pytest

from .conftest import SF_DIR, assert_same


def _contract():
    import __spark_entry__ as e
    return e.queries(), e.oracle_sql()


QUERIES, ORACLES = _contract()


def test_entry_smoke(spark):
    import __spark_entry__ as e
    df = e.entry(spark)
    assert df.count() > 0


def test_driver_top50_covers_survey_ops():
    """The grading driver checks only the first 50 queries() entries;
    every SURVEY §2 operator family must have a representative there."""
    from helix_db_spark.entry_queries import DRIVER_TOP50, REGISTRY

    names = list(REGISTRY)
    assert names[:50] == DRIVER_TOP50
    assert len(set(DRIVER_TOP50)) == 50
    critical = {
        # one per §2 family that has no second representative in the top 50
        # datetime_filter demoted r10: the Timestamp family (§2 row 27)
        # is carried by predicate_algebra's folded-in datetime predicate;
        # the freed slot grades paragraph-level dedup
        "count_and_exists", "nwhere_source_filter", "predicate_algebra",
        "string_predicates", "json_dotted_path",
        "case_expression", "arithmetic_projection", "limit_by_param",
        "out_hop_group_count", "semantic_dedup_survivors",
        "edge_endpoint_projection",
        "edge_to_nodes_dedup", "other_n_provenance",
        "within_without_filters",  # merged semi+anti slot (§2 row 14)
        # union_branches demoted r8: Inject compiles as a union, so
        # inject_var_union's UNION ALL oracle keeps §2 row 39 graded;
        # the slot grades hybrid BM25+vector RRF retrieval instead
        "inject_var_union", "hybrid_rrf_search",
        # optional_passthrough demoted r7: Optional's pass-through
        # contract is exercised by coalesce_fallback's per-stream
        # fallback; the freed slot grades the served on-disk ANN probe
        "choose_conditional", "coalesce_fallback",
        "repeat_bfs", "order_limit_topk",
        "group_aggregate_stats",   # merged Group + AggregateBy (rows 36+38)
        "id_value_map",
        # vector_search_topk demoted r13: §2 row 4's exact top-k runs
        # through the SAME compiled vector_search step inside
        # tenant_vector_search (multitenancy on top), and the single-op
        # entry stays below the cap + in the bench set; the slot grades
        # the SemDeDup scale knob (semantic_dedup_bounded) instead
        "project_bindings_rows", "semantic_dedup_bounded",
        # vector_search_ivf demoted r12: the IVF probe family is graded
        # through the strictly stronger disk row (same centroid-rank +
        # exact re-rank, plus the served layout + partition pruning);
        # the slot grades the audit family instead (VERDICT r11 #6)
        "vector_search_ivf_disk",
        "dedup_quality_report_sampled",
        "tenant_vector_search", "bm25_text_search",
        "edge_search_modes",       # merged edge-target search slot (row 7)
        # set_property_update + drop_cascade_counts merged r9 into one
        # write-lifecycle batch (the count_and_exists pattern); the
        # single-op variants stay below the cap, and the freed slot
        # grades the lakehouse MERGE path (file-pruned upsert + manifest
        # commit + time travel — VERDICT r8 #5)
        "write_batch_adds", "write_update_drop_lifecycle",
        "merge_upsert_documents",
        "batch_condition_gate", "foreach_accumulate",
        # LLM-pipeline + dataset-prep families (merged slots are the sole
        # graded representative of their operators)
        "dedup_pipeline_survivors",
        # dedup_simhash_fingerprints demoted r8 (VERDICT r6's named swap
        # candidate): near-dup fingerprinting stays graded through the
        # minhash chain + Hamming rows; the slot grades the KMV sketch
        # family instead
        "kmv_distinct_users",
        # merged n-gram Jaccard + winnow pair mining (r6); the
        # embedding-cosine near-dup family is graded through
        # semantic_dedup_survivors (same cosine math, IVF-celled)
        "overlap_pair_mining",
        # the window-agg family is graded through the streaming twin
        # since r7 (same aggregation + oracle, executed by the streaming
        # engine in watermarked append mode; events_window_agg stays
        # below the cap as the batch twin and the bench query)
        "text_stats_langid", "top_quality_docs_per_source",
        "multimodal_pipeline", "stream_watermarked_counts",
        "events_sessionize",
        # the composed curation slot grades split_assign + quality gate +
        # repetition gate + decontamination + exact dedup (r5)
        "curate_corpus_pipeline", "asof_purchase_features",
        # r5/r6 hoists into the merge-freed slots: DSIR, the CELLED kNN
        # scale path, on-disk incremental dedup, and the CCNet
        # perplexity gate. events_value_quantiles demoted r11: the
        # sketch family stays graded through kmv_distinct_users (same
        # deterministic md5-sketch machinery); the slot grades the
        # link-analysis family instead (VERDICT r10 #8)
        "dsir_importance_weights", "knn_graph_celled",
        "incremental_dedup_classify", "copurchase_pagerank",
        "text_lm_cross_entropy",
        # r10 hoist: paragraph-level dedup (CCNet 3.1 / Dolma), whose
        # oracle value-hashes the reassembled TEXT
        "dedup_paragraph_firstwins",
    }
    assert critical <= set(DRIVER_TOP50)
    # every top-50 entry has a DuckDB oracle (full value-hash grading)
    rows_only = {n for n in DRIVER_TOP50 if REGISTRY[n][1] is None}
    assert rows_only == set()


def test_artifact_dir_memoizes_per_session(spark):
    """Graded probe entries build their on-disk artifacts ONCE per
    (session, sf, kind) into a pid-tagged collision-safe dir (ADVICE r6:
    the old fixed /tmp path raced across concurrent sessions); repeat
    invocations are probe-only."""
    import os

    from helix_db_spark.entry_queries import _artifact_dir

    calls = []
    r1 = _artifact_dir(spark, "/x", "t1", calls.append)
    r2 = _artifact_dir(spark, "/x", "t1", calls.append)
    assert r1 == r2 and len(calls) == 1, "second call must not rebuild"
    r3 = _artifact_dir(spark, "/x", "t2", calls.append)
    assert r3 != r1 and len(calls) == 2
    assert str(os.getpid()) in r1


def test_watermarked_stream_entry_plan_and_equivalence(spark):
    """The graded streaming entry's plan carries an EventTimeWatermark
    node (the state-bounding operator a 100 TB run needs) and its
    append-mode file-sink output equals the batch aggregation exactly —
    the sentinel closes every real window."""
    from helix_db_spark.entry_queries import (events_window_agg,
                                              stream_watermarked_counts)
    from helix_db_spark.streaming.ingest import (stream_events,
                                                 windowed_counts)

    sf = "/root/testdata/sf0.001"
    agg = windowed_counts(stream_events(
        spark, f"{sf}/events.parquet"), window="1 hour",
        watermark="2 hours")
    assert "EventTimeWatermark" in agg._jdf.queryExecution().analyzed() \
        .toString()
    got = sorted(tuple(r) for r in
                 stream_watermarked_counts(spark, sf).collect())
    want = sorted(tuple(r) for r in events_window_agg(spark, sf).collect())
    assert got == want


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_contract(name, spark, oracle):
    df = QUERIES[name](spark, SF_DIR)
    if name in ORACLES:
        assert_same(df, oracle.sql(ORACLES[name]))
    else:
        # rows-only check (approximate / non-SQL-expressible operators)
        assert df.count() >= 0
