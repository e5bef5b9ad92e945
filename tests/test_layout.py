"""Z-order layout: Morton-key math, content preservation, and the
measured row-group-pruning win over a one-dimensional layout."""

import pytest
from pyspark.sql import functions as F

from helix_db_spark.sources.layout import (scan_output_rows, zorder_by,
                                           zorder_key, zorder_write)


def _morton(vals, bits):
    """Independent Python reference for bit interleaving."""
    key = 0
    for i, v in enumerate(vals):
        for j in range(bits):
            key |= ((v >> j) & 1) << (j * len(vals) + i)
    return key


def test_zorder_key_matches_reference(spark):
    df = spark.createDataFrame(
        [(a, b) for a in (0, 1, 5, 14, 15) for b in (0, 3, 9, 15)],
        "a long, b long")
    out = df.withColumn(
        "z", zorder_key([F.col("a"), F.col("b")], bits=4)).collect()
    for r in out:
        assert r.z == _morton([r.a, r.b], 4), (r.a, r.b)
    # locality sanity: neighbours in both dims stay close in z
    z00 = _morton([0, 0], 4)
    z11 = _morton([1, 1], 4)
    zff = _morton([15, 15], 4)
    assert z00 < z11 < zff


def test_zorder_key_three_columns_and_overflow(spark):
    df = spark.createDataFrame([(2, 5, 7)], "a long, b long, c long")
    r = df.withColumn("z", zorder_key(
        [F.col("a"), F.col("b"), F.col("c")], bits=3)).collect()[0]
    assert r.z == _morton([2, 5, 7], 3)
    with pytest.raises(ValueError, match="overflows"):
        zorder_key([F.col("a")] * 4, bits=16)


def test_zorder_by_ranges_and_clamp(spark):
    df = spark.createDataFrame(
        [(0.0,), (50.0,), (100.0,), (200.0,)], "x double")
    # explicit range: no eager pass over df; values past hi clamp
    out = zorder_by(df, ["x"], bits=4, ranges=[(0.0, 100.0)]).collect()
    cells = {r.x: r._zkey for r in out}
    assert cells[0.0] == 0
    assert cells[100.0] == 15 and cells[200.0] == 15
    assert 0 < cells[50.0] < 15
    # degenerate constant column collapses to cell 0, not a div-by-zero
    one = spark.createDataFrame([(7.0,), (7.0,)], "x double")
    assert {r._zkey for r in zorder_by(one, ["x"], bits=4).collect()} \
        == {0}


def test_zorder_write_preserves_content(spark, tmp_path):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet") \
        .select("event_id", "user_id", "value")
    path = str(tmp_path / "zo")
    zorder_write(ev, ["user_id", "value"], path, bits=10, files=8)
    back = spark.read.parquet(path)
    assert back.columns == ev.columns          # _zkey dropped
    assert back.count() == ev.count()
    assert back.exceptAll(ev).count() == 0
    assert ev.exceptAll(back).count() == 0


def test_zorder_prunes_row_groups_vs_1d_layout(spark, tmp_path):
    """The actual claim: at EQUAL file counts, a 2-D box filter scans a
    fraction of the rows from the z-ordered layout that it scans from a
    time-ordered one, because every row group's (user_id, value) stats
    cover a tight rectangle. Also checks the measurement itself against
    the true match count (scan rows >= match rows always)."""
    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet") \
        .select("event_id", "user_id", "value", "ts")
    zp, tp = str(tmp_path / "zo"), str(tmp_path / "ts")
    zorder_write(ev, ["user_id", "value"], zp, bits=12, files=32)
    ev.orderBy("ts").coalesce(32).write.parquet(tp)
    box = (F.col("user_id").between(40, 80)
           & F.col("value").between(10.0, 40.0))
    matches = ev.filter(box).count()
    z_rows = scan_output_rows(spark.read.parquet(zp).filter(box))
    t_rows = scan_output_rows(spark.read.parquet(tp).filter(box))
    total = ev.count()
    assert z_rows >= matches and t_rows >= matches
    # the 1-D layout reads essentially everything (user/value are
    # uncorrelated with time); the z-ordered one skips most row groups
    assert t_rows > 0.9 * total, (t_rows, total)
    assert z_rows < 0.5 * t_rows, (z_rows, t_rows)


def test_scan_output_rows_unwraps_aqe(spark, tmp_path):
    """Regression (review r8): AdaptiveSparkPlanExec is a leaf to
    collectLeaves(), so an AQE-wrapped plan (any aggregation) must be
    unwrapped or the helper reports 0 scanned rows."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    agg = ev.groupBy("event_type").count()
    got = scan_output_rows(agg)
    assert got == ev.count()       # the scan under the agg read it all
    # non-file leaves carry the metric too (Range) — counted, not 0
    assert scan_output_rows(spark.range(5)) == 5


def test_zorder_empty_input_raises_clearly(spark, tmp_path):
    """Regression (review r8): inferring ranges from an empty frame (or
    an all-NULL column) must fail with a pointed error, not
    float(None)."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet") \
        .filter(F.lit(False))
    with pytest.raises(ValueError, match="no rows or all-NULL"):
        zorder_write(ev, ["user_id", "value"], str(tmp_path / "e"))
    nulls = spark.createDataFrame(
        [(1, None), (2, None)], "a long, b double")
    with pytest.raises(ValueError, match=r"\['b'\]"):
        zorder_by(nulls, ["a", "b"], bits=4)


def test_zorder_plan_stays_jvm_side(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    keyed = zorder_by(ev, ["user_id", "value"], bits=12)
    plan = keyed._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    # "*(n)" is the simple-string rendering of a WholeStageCodegen span:
    # the whole bit-interleave expression tree compiles into it
    assert "*(" in plan, plan


def test_morton_key_fuzz(spark):
    """Hypothesis: the Spark bit-interleave expression equals the
    independent Python reference for random cell tuples and widths."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(max_examples=10, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(ncols=st.integers(1, 4), bits=st.integers(1, 8),
           data=st.data())
    def run(ncols, bits, data):
        vals = data.draw(st.lists(
            st.tuples(*[st.integers(0, (1 << bits) - 1)] * ncols),
            min_size=1, max_size=20))
        df = spark.createDataFrame(
            vals, ", ".join(f"c{i} long" for i in range(ncols)))
        out = df.withColumn("z", zorder_key(
            [F.col(f"c{i}") for i in range(ncols)], bits=bits)).collect()
        for r in out:
            want = _morton([r[f"c{i}"] for i in range(ncols)], bits)
            assert r.z == want

    run()


def test_zorder_reserved_column_and_compact_scheme(spark, tmp_path):
    """Review r8 guards: a pre-existing _zkey column is rejected (the
    rewrite would silently drop it), and compact_parquet refuses
    non-local filesystem schemes instead of crashing in os.stat."""
    from helix_db_spark.sources.layout import compact_parquet

    df = spark.range(10).select(
        F.col("id").alias("a"), F.col("id").alias("_zkey"))
    with pytest.raises(ValueError, match="_zkey is reserved"):
        zorder_write(df, ["a"], str(tmp_path / "z"))
    with pytest.raises(ValueError, match="Hadoop FileSystem"):
        compact_parquet(spark, "s3a://bucket/table",
                        str(tmp_path / "c"))
    # percent-encoded local paths are decoded before stat
    spaced = tmp_path / "dir with space"
    spark.range(5).coalesce(1).write.parquet(str(spaced))
    out = compact_parquet(spark, str(spaced), str(tmp_path / "c2"))
    assert out["out_files"] == 1 and out["bytes"] > 0
