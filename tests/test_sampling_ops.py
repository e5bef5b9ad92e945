"""Dataset-prep operators: deterministic splits, chunking, as-of joins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from .conftest import SF_DIR
from helix_db_spark.operators.sampling import (asof_join, chunk_documents,
                                               split_assign)


def test_split_deterministic_and_proportional(spark):
    df = spark.range(0, 10_000).withColumnRenamed("id", "k")
    s1 = split_assign(df, "k")
    s2 = split_assign(df, "k")
    rows1 = dict((r["k"], r["split"]) for r in s1.collect())
    rows2 = dict((r["k"], r["split"]) for r in s2.collect())
    assert rows1 == rows2  # same assignment every run
    counts = {r["split"]: r["n"] for r in
              s1.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts["train"] / 10_000 == pytest.approx(0.98, abs=0.01)
    assert counts["valid"] / 10_000 == pytest.approx(0.01, abs=0.005)
    assert counts["test"] / 10_000 == pytest.approx(0.01, abs=0.005)
    # a different seed reshuffles assignments
    s3 = dict((r["k"], r["split"])
              for r in split_assign(df, "k", seed="other").collect())
    assert s3 != rows1


def test_chunk_documents_boundaries(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(100))),  # 100 tokens
         (2, "a b c"),                                # shorter than a chunk
         (3, "")],                                    # empty -> no chunks
        "doc_id long, text string")
    out = chunk_documents(docs, "doc_id", "text",
                          chunk_tokens=64, overlap=16).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: windows at 0 and 48; second window holds tokens 48..99 (52)
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_id"])
    assert [(r["chunk_start"], r["n_tokens"]) for r in c1] == [(0, 64),
                                                               (48, 52)]
    assert c1[0]["chunk_text"].split()[0] == "t0"
    assert c1[1]["chunk_text"].split()[0] == "t48"
    assert c1[1]["chunk_text"].split()[-1] == "t99"
    # every token appears in some chunk (no drops)
    covered = set()
    for r in c1:
        covered.update(r["chunk_text"].split())
    assert covered == {f"t{i}" for i in range(100)}
    # short doc: one short window; empty doc: nothing
    assert [(r["chunk_start"], r["n_tokens"]) for r in by_doc[2]] == [(0, 3)]
    assert 3 not in by_doc


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, "u", 100), (2, "u", 205), (3, "u", 50), (4, "v", 100)],
        "event_id long, user string, ts long")
    right = spark.createDataFrame(
        [("u", 100, 1.0), ("u", 200, 2.0), ("v", 300, 3.0)],
        "user string, ts long, val double")
    out = {r["event_id"]: (r["val"], r["matched_ts"])
           for r in asof_join(left, right, on="ts", by="user").collect()}
    assert out[1] == (1.0, 100)   # equal ts matches (backward inclusive)
    assert out[2] == (2.0, 200)   # latest prior
    assert out[3] == (None, None)  # nothing at or before 50
    assert out[4] == (None, None)  # v's only purchase is later
    # tolerance: a match older than the window is nulled
    # (event 2 at ts=205 matched ts=200: gap 5 > tolerance 3 -> null)
    tol = {r["event_id"]: r["val"]
           for r in asof_join(left, right, on="ts", by="user",
                              tolerance=3).collect()}
    assert tol[1] == 1.0 and tol[2] is None


def test_asof_join_single_shuffle_plan(spark):
    """Scale gate: the as-of join is one window pass — no cartesian or
    range cross-join in the plan."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    left = ev.filter(F.col("event_type") == "click") \
             .select("event_id", "user_id", "ts")
    right = ev.filter(F.col("event_type") == "purchase") \
              .select("user_id", "ts", "value")
    plan = asof_join(left, right, on="ts", by="user_id") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_asof_join_global_sort_gated(spark):
    """by=None is a single-partition global sort — it must be an explicit
    opt-in, never a silent serialization point (ADVICE r3)."""
    import pytest

    left = spark.createDataFrame([(1, 10)], "id long, ts long")
    right = spark.createDataFrame([(5, 2.0)], "ts long, value double")
    with pytest.raises(ValueError, match="allow_global_sort"):
        asof_join(left, right, on="ts")
    out = asof_join(left, right, on="ts", allow_global_sort=True).collect()
    assert out[0]["value"] == 2.0 and out[0]["matched_ts"] == 5


def test_stratified_sample_deterministic_and_exact(spark):
    """Per-stratum fractions hold approximately; membership is exactly
    reproducible across recomputation and partitioning changes."""
    from helix_db_spark.operators.sampling import stratified_sample

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = stratified_sample(docs, "doc_id", "source",
                            {"src0": 1.0, "src1": 0.5}, default=0.1)
    got = {r["doc_id"] for r in out.select("doc_id").collect()}
    # full stratum kept exactly
    src0 = {r["doc_id"] for r in
            docs.filter(F.col("source") == "src0").collect()}
    assert src0 <= got
    # determinism under repartitioning
    got2 = {r["doc_id"] for r in
            stratified_sample(docs.repartition(7), "doc_id", "source",
                              {"src0": 1.0, "src1": 0.5}, default=0.1)
            .select("doc_id").collect()}
    assert got == got2
    # default stratum lands near its fraction
    n_rest = docs.filter(~F.col("source").isin("src0", "src1")).count()
    kept_rest = len(got - src0
                    - {r["doc_id"] for r in
                       docs.filter(F.col("source") == "src1").collect()})
    assert kept_rest < 0.25 * n_rest


def test_top_k_per_group(spark):
    from helix_db_spark.operators.sampling import top_k_per_group

    df = spark.createDataFrame(
        [("a", 1, 0.9), ("a", 2, 0.9), ("a", 3, 0.5), ("a", 4, 0.99),
         ("b", 5, 0.1), ("b", 6, 0.2)],
        "grp string, id long, score double")
    got = {(r["grp"], r["id"]) for r in
           top_k_per_group(df, "grp", "score", 2,
                           tiebreak_col="id").collect()}
    # a: 4 (0.99) then 1 (0.9, id-tiebreak over 2); b: both rows
    assert got == {("a", 4), ("a", 1), ("b", 6), ("b", 5)}
    # no global sort: plan has a single exchange on the group key
    plan = top_k_per_group(df, "grp", "score", 2, tiebreak_col="id") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning(grp" in plan, plan


def test_weighted_sample(spark):
    """Weighted sampling: w=0 keeps nothing, w>=1 keeps everything, the
    kept set is monotone in scale, and replay is exact (deterministic)."""
    from helix_db_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(i, 0.0 if i % 3 == 0 else (1.0 if i % 3 == 1 else 0.4))
         for i in range(300)], "doc_id long, w double")
    kept = {r["doc_id"] for r in
            weighted_sample(df, "doc_id", "w").collect()}
    assert not any(i in kept for i in range(0, 300, 3))      # w = 0
    assert all(i in kept for i in range(1, 300, 3))          # w = 1
    mid = [i for i in range(2, 300, 3) if i in kept]
    assert 0 < len(mid) < 100                                # w = 0.4 thins
    half = {r["doc_id"] for r in
            weighted_sample(df, "doc_id", "w", scale=0.5).collect()}
    assert half <= kept                                       # monotone
    again = {r["doc_id"] for r in
             weighted_sample(df, "doc_id", "w").collect()}
    assert again == kept                                      # exact replay


def test_asof_join_forward_direction(spark):
    from helix_db_spark.operators.sampling import asof_join

    left = spark.createDataFrame(
        [(1, "u", 10), (2, "u", 25), (3, "u", 99), (4, "v", 5)],
        "id long, u string, t long")
    right = spark.createDataFrame(
        [("u", 10, 1.0), ("u", 20, 2.0), ("u", 30, 3.0), ("v", 4, 9.0)],
        "u string, t long, val double")
    out = {r["id"]: r for r in
           asof_join(left, right, on="t", by="u",
                     direction="forward").collect()}
    assert out[1]["val"] == 1.0 and out[1]["matched_t"] == 10  # >= matches
    assert out[2]["val"] == 3.0                                # next at 30
    assert out[3]["val"] is None                               # nothing after
    assert out[4]["val"] is None                               # v: only before
    # forward tolerance nulls matches farther than `tolerance` ahead
    tol = {r["id"]: r["val"] for r in
           asof_join(left, right, on="t", by="u", direction="forward",
                     tolerance=4).collect()}
    assert tol[1] == 1.0 and tol[2] is None


def test_write_shards_deterministic_layout(spark, tmp_path):
    from helix_db_spark.operators.sampling import write_shards

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "shards")
    info = write_shards(docs, out, n_shards=8, id_col="doc_id")
    assert info["rows"] == 500
    assert sum(info["shards"].values()) == 500
    assert len(info["shards"]) == 8
    # rough balance: md5 spreads uniformly
    assert max(info["shards"].values()) <= 3 * min(info["shards"].values())
    # shard membership is a pure function of the id: rerun == same layout
    info2 = write_shards(docs, str(tmp_path / "shards2"), 8, "doc_id")
    assert info2["shards"] == info["shards"]
    # single-shard read prunes to one directory
    one = spark.read.parquet(out).filter("shard = 3")
    import re
    dirs = {re.search(r"shard=(\d+)", f).group(1) for f in one.inputFiles()}
    assert one.count() == info["shards"]["3"]


def _ts(s: str):
    from datetime import datetime
    return datetime.fromisoformat(s)


def test_interval_join_bounds_and_exactly_once(spark):
    from helix_db_spark.operators.sampling import interval_join
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 12:00:00"))], "lid long, ts timestamp")
    right = spark.createDataFrame(
        [(10, _ts("2024-01-01 11:54:59.999999")),   # 1 us before lower
         (11, _ts("2024-01-01 11:55:00")),          # exactly lower bound
         (12, _ts("2024-01-01 12:00:00")),          # anchor itself
         (13, _ts("2024-01-01 12:05:00")),          # exactly upper bound
         (14, _ts("2024-01-01 12:05:00.000001"))],  # 1 us past upper
        "rid long, rts timestamp")
    out = interval_join(left, right, "ts", "rts", -300.0, 300.0)
    got = sorted(r["rid"] for r in out.collect())
    assert got == [11, 12, 13]  # inclusive bounds, no duplicates


def test_interval_join_matches_bruteforce(spark):
    """The bucketed plan finds the same pairs as an exact brute force,
    including rows sitting on bucket boundaries."""
    from helix_db_spark.operators.sampling import interval_join
    import itertools
    base = _ts("2024-03-01 00:00:00")
    from datetime import timedelta
    lts = [base + timedelta(seconds=7 * i + (i % 3) * 0.25) for i in range(40)]
    rts = [base + timedelta(seconds=11 * i + (i % 5) * 0.2) for i in range(40)]
    left = spark.createDataFrame([(i, t) for i, t in enumerate(lts)],
                                 "lid long, ts timestamp")
    right = spark.createDataFrame([(i, t) for i, t in enumerate(rts)],
                                  "rid long, rts timestamp")
    lo, hi = -13.0, 29.0  # asymmetric band, not a multiple of anything
    out = interval_join(left, right, "ts", "rts", lo, hi)
    got = sorted((r["lid"], r["rid"]) for r in out.collect())
    want = sorted((i, j) for (i, lt), (j, rt)
                  in itertools.product(enumerate(lts), enumerate(rts))
                  if lo <= (rt - lt).total_seconds() <= hi)
    assert got == want and len(got) == len(set(got))


def test_interval_join_pre1970_floor_division(spark):
    """Negative-epoch timestamps bucket by true floor division — plain
    `div` truncates toward zero and would miss cross-zero pairs."""
    from helix_db_spark.operators.sampling import interval_join
    left = spark.createDataFrame(
        [(1, _ts("1969-12-31 23:59:58"))], "lid long, ts timestamp")
    right = spark.createDataFrame(
        [(10, _ts("1969-12-31 23:59:55")),
         (11, _ts("1970-01-01 00:00:01")),
         (12, _ts("1970-01-01 00:00:07"))],
        "rid long, rts timestamp")
    out = interval_join(left, right, "ts", "rts", -4.0, 4.0)
    assert sorted(r["rid"] for r in out.collect()) == [10, 11]


def test_interval_join_by_keys_and_empty_band(spark):
    from helix_db_spark.operators.sampling import interval_join
    left = spark.createDataFrame(
        [(1, "u1", _ts("2024-01-01 12:00:00")),
         (2, "u2", _ts("2024-01-01 12:00:00"))],
        "lid long, user string, ts timestamp")
    right = spark.createDataFrame(
        [(10, "u1", _ts("2024-01-01 12:01:00")),
         (11, "u2", _ts("2024-01-01 11:59:00"))],
        "rid long, user string, rts timestamp")
    out = interval_join(left, right.drop("user"), "ts", "rts",
                        -120.0, 120.0)
    assert out.count() == 4  # keyless: all cross-user pairs in band
    keyed = interval_join(left, right, "ts", "rts", -120.0, 120.0,
                          by=["user"])
    got = sorted((r["lid"], r["rid"]) for r in keyed.collect())
    assert got == [(1, 10), (2, 11)]
    # inverted band is an error; reserved internals are rejected
    with pytest.raises(ValueError):
        interval_join(left, right, "ts", "rts", 5.0, -5.0)
    with pytest.raises(ValueError):
        interval_join(left.withColumn("_b", F.lit(1)), right,
                      "ts", "rts", -1.0, 1.0)


def test_interval_join_point_band(spark):
    """lower == upper is the exact-offset point band: an equi-join on
    the shifted timestamp, bounds-inclusive contract preserved."""
    from helix_db_spark.operators.sampling import interval_join
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 12:00:00"))], "lid long, ts timestamp")
    right = spark.createDataFrame(
        [(10, _ts("2024-01-01 12:00:05")),
         (11, _ts("2024-01-01 12:00:04.999999")),
         (12, _ts("2024-01-01 12:00:06"))],
        "rid long, rts timestamp")
    out = interval_join(left, right, "ts", "rts", 5.0, 5.0)
    assert sorted(r["rid"] for r in out.collect()) == [10]


def test_resample_locf_gapfill(spark):
    """Known series: buckets densified, gaps carried forward, leading
    buckets NULL, last-per-bucket picks the latest observation."""
    from helix_db_spark.operators.sampling import resample_locf

    rows = [
        # group a: obs at bucket 0 (two rows — later ts wins), gap at
        # 60/120, obs at 180
        ("a", "2024-01-01 00:00:05", 1.0),
        ("a", "2024-01-01 00:00:30", 2.0),
        ("a", "2024-01-01 00:03:10", 9.0),
        # group b: first obs at bucket 120 -> leading buckets NULL
        ("b", "2024-01-01 00:02:15", 5.0),
    ]
    df = spark.createDataFrame(rows, "g string, ts_s string, v double") \
        .select("g", F.to_timestamp("ts_s").alias("ts"), "v")
    out = {(r.g, r.bucket_s): (r.value_locf, r.filled)
           for r in resample_locf(df, "ts", "v", step_s=60,
                                  group_cols=["g"]).collect()}
    base = 1704067200               # 2024-01-01 00:00:00 UTC
    assert out[("a", base)] == (2.0, False)       # later ts wins
    assert out[("a", base + 60)] == (2.0, True)   # carried forward
    assert out[("a", base + 120)] == (2.0, True)
    assert out[("a", base + 180)] == (9.0, False)
    assert out[("b", base)] == (None, True)       # leading gap stays NULL
    assert out[("b", base + 60)] == (None, True)
    assert out[("b", base + 120)] == (5.0, False)
    assert out[("b", base + 180)] == (5.0, True)
    assert len(out) == 8                          # dense 2x4 grid


def test_resample_locf_spine_override_and_global(spark):
    from helix_db_spark.operators.sampling import resample_locf

    df = spark.createDataFrame(
        [("x", "2024-01-01 00:01:00", 3.0)], "g string, ts_s string, v double"
    ).select("g", F.to_timestamp("ts_s").alias("ts"), "v")
    base = 1704067200
    # explicit spine widens the grid beyond the observed bounds (and is
    # snapped to bucket starts)
    out = resample_locf(df, "ts", "v", step_s=60, group_cols=["g"],
                        spine=(base, base + 190)).collect()
    assert len(out) == 4
    assert sorted(r.bucket_s for r in out) == [
        base, base + 60, base + 120, base + 180]
    # group-less resample works (one global series)
    glob = resample_locf(df, "ts", "v", step_s=60).collect()
    assert len(glob) == 1 and glob[0].value_locf == 3.0


def test_resample_locf_null_group(spark):
    """Regression (review r8): a NULL group key is a series too — the
    grid join must be null-safe or its observations strand."""
    from helix_db_spark.operators.sampling import resample_locf

    rows = [(None, "2024-01-01 00:00:10", 4.0),
            ("a", "2024-01-01 00:01:10", 7.0)]
    df = spark.createDataFrame(rows, "g string, ts_s string, v double") \
        .select("g", F.to_timestamp("ts_s").alias("ts"), "v")
    out = {(r.g, r.bucket_s): (r.value_locf, r.filled)
           for r in resample_locf(df, "ts", "v", step_s=60,
                                  group_cols=["g"]).collect()}
    base = 1704067200
    assert out[(None, base)] == (4.0, False)      # attached, not stranded
    assert out[(None, base + 60)] == (4.0, True)  # and carried forward
    assert out[("a", base + 60)] == (7.0, False)


def test_ewma_matches_sequential_reference(spark):
    from pyspark.sql import functions as F

    from helix_db_spark.operators.sampling import ewma_by_key
    rows = [("u", i, float(v)) for i, v in
            enumerate([10, 20, 0, 5, 40])] + [("w", 0, 7.0)]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    out = {r["k"]: (r["n_events"], r["ewma"])
           for r in ewma_by_key(df, ["k"], ["t"], "v").collect()}
    ref = 10.0
    for x in [20.0, 0.0, 5.0, 40.0]:
        ref = 0.25 * x + 0.75 * ref
    assert out["u"] == (5, ref)      # bit-identical sequential fold
    assert out["w"] == (1, 7.0)      # single event: ewma = the value
    # order columns drive the fold: reversed input, same result
    rev = spark.createDataFrame(list(reversed(rows)),
                                "k string, t long, v double")
    out2 = {r["k"]: r["ewma"]
            for r in ewma_by_key(rev, ["k"], ["t"], "v").collect()}
    assert out2["u"] == ref
