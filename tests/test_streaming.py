"""Streaming surface tests: bounded parquet source driven to completion,
results cross-checked against the equivalent batch plans."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from helix_db_spark.sources.tpch import read_tables
from helix_db_spark.streaming import ingest

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Re-materialize events with a real timestamp column (testdata parquet
    stores TIMESTAMP(NANOS), unreadable by the streaming schema reader)."""
    out = str(tmp_path_factory.mktemp("events_stream"))
    read_tables(spark, SF_DIR)["events"].coalesce(2).write.mode(
        "overwrite").parquet(out)
    yield out
    shutil.rmtree(out, ignore_errors=True)


def test_windowed_counts_match_batch(spark, events_dir):
    stream = ingest.stream_events(spark, events_dir)
    assert stream.isStreaming
    ingest.run_to_memory(ingest.windowed_counts(stream), "win_out")
    got = {(r["window_start"], r["event_type"]): (r["count"],
                                                  round(r["total"], 4))
           for r in spark.sql("SELECT * FROM win_out").collect()}

    batch = (spark.read.parquet(events_dir)
             .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
             .agg(F.count(F.lit(1)).alias("count"),
                  F.sum("value").alias("total")))
    want = {(r["w"]["start"], r["event_type"]): (r["count"],
                                                 round(r["total"], 4))
            for r in batch.collect()}
    # append mode finalizes a window only once the watermark passes it, so
    # windows inside the final 2h horizon are (correctly) never emitted on a
    # bounded source — everything emitted must match the batch plan, and
    # only horizon-tail windows may be missing.
    assert got, "streaming query emitted nothing"
    for key, val in got.items():
        assert want[key] == val
    max_ts = max(k[0] for k in want)
    import datetime
    horizon = max_ts - datetime.timedelta(hours=2)
    for key in set(want) - set(got):
        assert key[0] >= horizon, f"non-tail window {key} missing"


def test_sessionize_matches_batch_sessions(spark, events_dir):
    stream = ingest.stream_events(spark, events_dir)
    ingest.run_to_memory(ingest.sessionize(stream), "sess_out")
    got = {(r["user_id"], r["session_start"]):
           (r["session_end"], r["n_events"], round(r["total"], 4))
           for r in spark.sql("SELECT * FROM sess_out").collect()}
    assert got, "streaming query emitted nothing"

    # batch reconstruction: lag+cumsum session ids; session_window's end is
    # last event + gap
    from pyspark.sql import Window
    ev = spark.read.parquet(events_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    brk = F.when(prev.isNull() | (F.unix_timestamp("ts")
                                  - F.unix_timestamp(prev) > 1800),
                 1).otherwise(0)
    sess_id = F.sum(brk).over(
        Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0))
    batch = (ev.withColumn("_sid", sess_id)
             .groupBy("user_id", "_sid")
             .agg(F.min("ts").alias("session_start"),
                  (F.max("ts") + F.expr("INTERVAL 30 MINUTES"))
                  .alias("session_end"),
                  F.count(F.lit(1)).alias("n_events"),
                  F.sum("value").alias("total")))
    want = {(r["user_id"], r["session_start"]):
            (r["session_end"], r["n_events"], round(r["total"], 4))
            for r in batch.collect()}
    # every emitted session must equal its batch twin; only sessions inside
    # the final watermark horizon may be unemitted (append-mode semantics)
    for key, val in got.items():
        assert want[key] == val
    import datetime
    max_ts = max(end for end, _, _ in want.values())
    horizon = max_ts - datetime.timedelta(hours=2)
    for key in set(want) - set(got):
        assert want[key][0] >= horizon, f"non-tail session {key} missing"


def test_graph_upserts_cdc(spark, tmp_path):
    from helix_db_spark.catalog import GraphCatalog
    from helix_db_spark.engine import HelixSparkEngine
    from helix_db_spark import g

    src = str(tmp_path / "users")
    spark.createDataFrame(
        [(1, "alice", 10.0), (2, "bob", 20.0)],
        "uid long, name string, score double").write.parquet(src)

    cat = GraphCatalog(spark)
    stream = (spark.readStream.format("parquet")
              .schema("uid long, name string, score double").load(src))
    q = ingest.stream_graph_upserts(stream, cat, "user", "uid")
    try:
        q.processAllAvailable()
        eng = HelixSparkEngine(cat)
        assert eng.run(g().n("user").count()).collect()[0]["count"] == 2

        # second micro-batch: update bob, insert carol (last-writer-wins)
        spark.createDataFrame(
            [(2, "bob2", 21.0), (3, "carol", 30.0)],
            "uid long, name string, score double").write.mode(
            "append").parquet(src)
        q.processAllAvailable()
        rows = {r["name"]: r["score"]
                for r in eng.run(g().n("user").values("name", "score"))
                .collect()}
        assert rows == {"alice": 10.0, "bob2": 21.0, "carol": 30.0}
    finally:
        q.stop()


def test_stream_first_seen_dedup(spark, tmp_path):
    """applyInPandasWithState custom stateful op: across micro-batches, only
    the first row per key survives — the streaming twin of exact dedup."""
    from helix_db_spark.streaming import stateful

    src = str(tmp_path / "dups")
    # two files => two micro-batches (maxFilesPerTrigger=4 but written
    # separately); key 'a' and 'b' repeat within AND across batches
    spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 11.0), (3, "b", 12.0)],
        "event_id long, digest string, value double"
    ).coalesce(1).write.mode("overwrite").parquet(src)
    spark.createDataFrame(
        [(4, "a", 13.0), (5, "c", 14.0), (6, "b", 15.0)],
        "event_id long, digest string, value double"
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (spark.readStream.format("parquet")
              .schema("event_id long, digest string, value double")
              .option("maxFilesPerTrigger", "1")
              .load(src))
    deduped = stateful.stream_first_seen(stream, "digest")
    q = (deduped.writeStream.outputMode("update").format("memory")
         .queryName("first_seen").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM first_seen").collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r["digest"], []).append(r)
    # exactly one survivor per distinct digest, regardless of batch layout
    assert sorted(by_key) == ["a", "b", "c"]
    assert all(len(v) == 1 for v in by_key.values())


def test_dedup_within_watermark_cross_batch(spark, tmp_path):
    """dropDuplicatesWithinWatermark wrapper: redelivered keys are
    suppressed WITHIN and ACROSS micro-batches (duplicate event times
    inside the watermark), and the surviving set equals the batch
    dropDuplicates twin."""
    src = str(tmp_path / "redelivered")
    base = [(i, f"2024-01-01 00:{i:02d}:00", i % 3, "click", float(i))
            for i in range(8)]
    df = spark.createDataFrame(
        base, "event_id long, ts_s string, user_id long, "
              "event_type string, value double") \
        .select("event_id", F.to_timestamp("ts_s").alias("ts"),
                "user_id", "event_type", "value",
                F.lit(None).cast("string").alias("props"))
    # batch 1: originals + 3 in-batch duplicates; batch 2: 4 redeliveries
    df.union(df.filter(F.col("event_id") < 3)) \
      .coalesce(1).write.mode("overwrite").parquet(src)
    df.filter(F.col("event_id") >= 4).coalesce(1) \
      .write.mode("append").parquet(src)

    stream = (spark.readStream.format("parquet")
              .schema(ingest.EVENTS_SCHEMA)
              .option("maxFilesPerTrigger", "1").load(src))
    q = (ingest.dedup_within_watermark(stream, keys=("event_id",),
                                       watermark="2 hours")
         .writeStream.outputMode("append").format("memory")
         .queryName("dd_wm").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM dd_wm").collect()
    assert sorted(r["event_id"] for r in rows) == list(range(8))
    want = {tuple(r) for r in df.dropDuplicates(["event_id"]).collect()}
    assert {tuple(r) for r in rows} == want


def test_stream_decontaminate_matches_batch(spark, tmp_path):
    """Streaming decontamination gate: a bounded document stream filtered
    against a static benchmark set keeps exactly the docs the batch
    operator (benchmark_contamination) finds clean."""
    from helix_db_spark.operators.dedup import benchmark_contamination
    from helix_db_spark.functions.text import tokens

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") % 10 == 0).select(
        "doc_id",
        F.array_join(F.slice(tokens(F.col("text")), 5, 12), " ")
         .alias("text"))

    contaminated = {r["doc_id"] for r in benchmark_contamination(
        docs, bench, "doc_id", "text", n=8).collect()}
    want_clean = {r["doc_id"] for r in docs.collect()} - contaminated
    assert contaminated, "scenario must actually contaminate something"

    d = str(tmp_path / "docs_stream")
    docs.coalesce(2).write.mode("overwrite").parquet(d)
    stream = (spark.readStream.format("parquet")
              .schema("doc_id long, text string").load(d))
    out = ingest.stream_decontaminate(stream, bench, "doc_id", "text", n=8)
    assert out.isStreaming
    ingest.run_to_memory(out, "clean_docs")
    got = {r["doc_id"]: r["n_contaminated"]
           for r in spark.sql("SELECT * FROM clean_docs").collect()}
    assert set(got) == want_clean
    assert all(v == 0 for v in got.values())


def test_stream_curate_matches_batch_gates(spark, tmp_path):
    """Streaming curation gates (quality + repetition + decontamination)
    over a bounded stream keep exactly the docs the batch gate logic
    keeps; composing stream_first_seen on the content digest then
    dedups exactly (one survivor per distinct content)."""
    from helix_db_spark.functions.text import tokens
    from helix_db_spark.operators.dedup import (benchmark_contamination,
                                                content_digest)
    from helix_db_spark.operators.textstats import (quality_score,
                                                    repetition_stats)
    from helix_db_spark.streaming.stateful import stream_first_seen

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") % 10 == 0).select(
        "doc_id",
        F.array_join(F.slice(tokens(F.col("text")), 5, 12), " ")
         .alias("text"))

    # batch expectation: same gates, same thresholds
    rep = repetition_stats(docs, "doc_id", "text", extra_cols=("text",))
    gated = (rep.withColumn("quality",
                            F.round(quality_score(F.col("text")), 6))
                .filter((F.col("quality") >= 0.3)
                        & (F.coalesce(F.col("top_2gram_frac"), F.lit(0.0))
                           <= 0.5)))
    contaminated = {r["doc_id"] for r in benchmark_contamination(
        gated.select("doc_id", "text"), bench, "doc_id", "text",
        n=8).collect()}
    want = {r["doc_id"] for r in gated.collect()} - contaminated
    assert want and len(want) < docs.count()

    d = str(tmp_path / "curate_stream")
    docs.coalesce(2).write.mode("overwrite").parquet(d)
    stream = (spark.readStream.format("parquet")
              .schema("doc_id long, text string").load(d))
    out = ingest.stream_curate(stream, bench, "doc_id", "text")
    ingest.run_to_memory(out, "curated_docs")
    got = {r["doc_id"] for r in spark.sql("SELECT * FROM curated_docs")
           .collect()}
    assert got == want

    # + stateful exact dedup: one survivor per distinct digest
    deduped = stream_first_seen(
        ingest.stream_curate(stream, bench, "doc_id", "text")
        .withColumn("digest", content_digest(F.col("text"))), "digest")
    q = (deduped.writeStream.outputMode("update").format("memory")
         .queryName("curated_unique").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM curated_unique").collect()
    n_digests = (gated.filter(F.col("doc_id").isin([int(x) for x in want]))
                 .select(content_digest(F.col("text"))).distinct().count())
    assert len(rows) == n_digests
    assert {r["doc_id"] for r in rows} <= want


@pytest.mark.slow
def test_stream_dedup_ingest_grows_index(spark, tmp_path):
    """Continuous-ingest dedup: micro-batch N+1 must dedup against the
    NOVEL docs micro-batch N appended to the on-disk index."""
    from pyspark.sql import functions as F

    from helix_db_spark.operators.dedup import store_dedup_index
    from helix_db_spark.streaming.ingest import stream_dedup_ingest

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    root = str(tmp_path / "idx")
    store_dedup_index(docs.filter(F.col("doc_id") < 100),
                      "doc_id", "text", root)

    base = {r["doc_id"]: r["text"]
            for r in docs.filter(F.col("doc_id") < 2).collect()}
    src = str(tmp_path / "feed")
    # batch 1: an exact copy of corpus doc 0 + a genuinely novel doc
    spark.createDataFrame(
        [(500001, base[0]), (500002, "fresh unseen contents " * 10)],
        "doc_id long, text string").coalesce(1) \
        .write.mode("overwrite").parquet(src)
    # batch 2: an exact copy of batch 1's NOVEL doc — only a dup if the
    # stream appended batch 1's novelty into the index
    spark.createDataFrame(
        [(500003, "fresh unseen contents " * 10), (500004, base[1])],
        "doc_id long, text string").coalesce(1) \
        .write.mode("append").parquet(src)

    stream = (spark.readStream.format("parquet")
              .schema("doc_id long, text string")
              .option("maxFilesPerTrigger", "1")
              .load(src))
    out = str(tmp_path / "annotations")
    q = stream_dedup_ingest(stream, "doc_id", "text", root, out,
                            checkpoint=str(tmp_path / "ckpt"))
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    ann = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    assert len(ann) == 4
    assert ann[500001]["dup_kind"] == "exact" and \
        ann[500001]["match_id"] == 0
    assert ann[500002]["dup_kind"] is None
    assert ann[500004]["dup_kind"] == "exact" and \
        ann[500004]["match_id"] == 1
    # the cross-batch catch: 500003 duplicates 500002 from the PRIOR batch
    assert ann[500003]["dup_kind"] == "exact" and \
        ann[500003]["match_id"] == 500002
    # batches processed separately (file-per-trigger)
    assert ann[500001]["_batch"] != ann[500003]["_batch"]


def test_stream_media_features_batch_twin(spark, tmp_path):
    """The multimodal decode operators compose with Structured Streaming
    unchanged (stateless Arrow-batched maps): an availableNow run over a
    media parquet dir produces EXACTLY the batch plan's rows."""
    from pyspark.sql import functions as F

    from helix_db_spark.streaming.ingest import (run_to_memory,
                                                 stream_media,
                                                 stream_media_features)
    from helix_db_spark.operators.multimodal import (synth_png_gray,
                                                     synth_wav_pcm16)

    docs = spark.createDataFrame([(i,) for i in range(24)], "doc_id long")
    media = synth_png_gray(docs).unionByName(synth_wav_pcm16(docs)) \
        .withColumn("media_id",
                    F.when(F.col("media_type") == "audio",
                           F.col("media_id") + 1000)
                     .otherwise(F.col("media_id")))
    src = str(tmp_path / "media")
    media.repartition(6).write.parquet(src)

    stream = stream_media_features(stream_media(spark, src))
    assert stream.isStreaming
    run_to_memory(stream, "media_feats")
    got = {(r.media_id, r.media_type): r
           for r in spark.sql("SELECT * FROM media_feats").collect()}

    batch = {(r.media_id, r.media_type): r
             for r in stream_media_features(media).collect()}
    assert set(got) == set(batch) and len(got) == 48
    for k in got:
        assert tuple(got[k]) == tuple(batch[k]), k
    # spot-check modality columns landed on the right side
    img = got[(3, "image")]
    assert img.ahash64 is not None and img.zcr is None
    aud = got[(1003, "audio")]
    assert aud.zcr is not None and aud.ahash64 is None


def test_stream_media_dedup_ingest_grows_index(spark, tmp_path):
    """Continuous media dedup: micro-batch N+1 must dedup against the
    NOVEL fingerprints micro-batch N appended to the on-disk index."""
    from pyspark.sql import functions as F

    from helix_db_spark.operators.dedup import store_hamming_index
    from helix_db_spark.operators.multimodal import (
        image_perceptual_hashes, synth_png_gray)
    from helix_db_spark.streaming.ingest import stream_media_dedup_ingest

    corpus_ids = spark.createDataFrame([(i,) for i in range(0, 40, 2)],
                                       "doc_id long")
    root = str(tmp_path / "idx")
    store_hamming_index(
        image_perceptual_hashes(synth_png_gray(corpus_ids))
        .select("media_id", "ahash64"), "media_id", "ahash64", root)

    def media_for(pairs):
        """(media_id, image_source_id) rows -> MEDIA_SCHEMA parquet df."""
        ids = spark.createDataFrame(pairs, "media_id long, img long")
        return synth_png_gray(ids, id_col="img") \
            .withColumnRenamed("media_id", "img_id") \
            .join(ids.withColumnRenamed("img", "img_id"), "img_id") \
            .select("media_id", "media_type", "content", "meta")

    src = str(tmp_path / "feed")
    # batch 1: a twin of corpus image 10 + a genuinely novel image
    media_for([(501, 11), (502, 200001)]).coalesce(1) \
        .write.mode("overwrite").parquet(src)
    # batch 2: the SAME novel image again — a dup only if batch 1's
    # novelty was appended — plus its even-base twin (200001 is the
    # odd-perturbed copy of 200000's base image)
    media_for([(503, 200001), (504, 200000)]).coalesce(1) \
        .write.mode("append").parquet(src)

    from helix_db_spark.operators.multimodal import MEDIA_SCHEMA
    stream = (spark.readStream.format("parquet").schema(MEDIA_SCHEMA)
              .option("maxFilesPerTrigger", "1").load(src))
    out = str(tmp_path / "ann")
    q = stream_media_dedup_ingest(stream, root, out,
                                  checkpoint=str(tmp_path / "ckpt"))
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    ann = {r.media_id: r for r in spark.read.parquet(out).collect()}
    assert len(ann) == 4
    assert ann[501].is_duplicate and ann[501].match_id == 10
    assert not ann[502].is_duplicate          # novel in batch 1
    assert ann[503].is_duplicate and ann[503].match_id == 502
    assert ann[504].is_duplicate and ann[504].match_id == 502


def test_stream_interval_join_matches_batch(spark, events_dir):
    """Stream-stream band join (clicks x purchases within ±5 min) emits
    exactly the batch bucketed interval_join's pairs on a bounded
    source — inner-join matches never wait for the watermark."""
    from helix_db_spark.operators.sampling import interval_join

    ev = ingest.stream_events(spark, events_dir)
    clicks = ev.filter(F.col("event_type") == "click") \
               .select(F.col("event_id").alias("click_id"), "ts")
    buys = ev.filter(F.col("event_type") == "purchase") \
             .select(F.col("event_id").alias("buy_id"),
                     F.col("ts").alias("pts"))
    joined = ingest.stream_interval_join(clicks, buys, "ts", "pts",
                                         -300.0, 300.0)
    assert joined.isStreaming
    ingest.run_to_memory(joined.select("click_id", "buy_id"), "ssj_out")
    got = sorted((r["click_id"], r["buy_id"]) for r in
                 spark.sql("SELECT * FROM ssj_out").collect())

    bev = spark.read.parquet(events_dir)
    bl = bev.filter(F.col("event_type") == "click") \
            .select(F.col("event_id").alias("click_id"), "ts")
    br = bev.filter(F.col("event_type") == "purchase") \
            .select(F.col("event_id").alias("buy_id"),
                    F.col("ts").alias("pts"))
    want = sorted((r["click_id"], r["buy_id"]) for r in
                  interval_join(bl, br, "ts", "pts",
                                -300.0, 300.0).collect())
    assert got == want and len(got) > 0
    # the streaming plan carries both watermarks (state is bounded)
    assert "EventTimeWatermark" in joined._jdf.queryExecution() \
        .analyzed().toString()


def test_stream_interval_join_left_outer(spark, events_dir):
    """LEFT OUTER band join: matched pairs plus NULL-padded rows for
    clicks with no purchase in the band. NULL padding is watermark-
    driven — the bounded run's final no-data micro-batch flushes it."""
    ev = ingest.stream_events(spark, events_dir)
    clicks = ev.filter(F.col("event_type") == "click") \
               .select(F.col("event_id").alias("click_id"), "ts")
    buys = ev.filter(F.col("event_type") == "purchase") \
             .select(F.col("event_id").alias("buy_id"),
                     F.col("ts").alias("pts"))
    joined = ingest.stream_interval_join(clicks, buys, "ts", "pts",
                                         -60.0, 60.0, how="left_outer")
    ingest.run_to_memory(joined.select("click_id", "buy_id"), "ssjo_out")
    got = sorted((r["click_id"], r["buy_id"]) for r in
                 spark.sql("SELECT * FROM ssjo_out").collect())

    bev = spark.read.parquet(events_dir)
    bl = bev.filter(F.col("event_type") == "click") \
            .select(F.col("event_id").alias("click_id"), "ts")
    br = bev.filter(F.col("event_type") == "purchase") \
            .select(F.col("event_id").alias("buy_id"),
                    F.col("ts").alias("pts"))
    want = sorted(
        (r["click_id"], r["buy_id"]) for r in
        bl.join(br, F.expr("pts >= ts - INTERVAL 60 SECONDS AND "
                           "pts <= ts + INTERVAL 60 SECONDS"),
                "left_outer").collect())
    n_unmatched_want = sum(1 for _, b in want if b is None)
    n_unmatched_got = sum(1 for _, b in got if b is None)
    # every MATCHED pair emits; unmatched lefts inside the final
    # watermark horizon are (correctly) still buffered on a bounded
    # source, so got's NULL rows are a subset of want's
    assert [p for p in got if p[1] is not None] == \
           [p for p in want if p[1] is not None]
    assert 0 < n_unmatched_got <= n_unmatched_want
    # with the 1h watermark over a 30-day corpus, nearly all flush
    assert n_unmatched_got >= int(0.9 * n_unmatched_want)
    with pytest.raises(ValueError):
        ingest.stream_interval_join(clicks, buys, "ts", "pts",
                                    -60.0, 60.0, how="full_outer")


def test_stream_dedup_ingest_flood_fails_batch(spark, tmp_path):
    """r12 (VERDICT r11 #4): the stream probe's flood guard is ARMED by
    default — a micro-batch hitting a near-dup flood in the index fails
    its StreamingQuery with DedupFloodError's mitigation text instead
    of grinding the verify; max_candidate_pairs=None disarms and the
    same batch classifies through."""
    import pyspark.errors as perr

    from helix_db_spark.operators.dedup import store_dedup_index
    from helix_db_spark.streaming.ingest import stream_dedup_ingest

    flood_text = ("the exact same flooded document body repeated "
                  "verbatim across the whole crawl partition")
    corpus = spark.createDataFrame(
        [(i, flood_text) for i in range(300)], "doc_id long, text string")
    root = str(tmp_path / "idx")
    store_dedup_index(corpus, "doc_id", "text", root)

    src = str(tmp_path / "feed")
    spark.createDataFrame([(9001, flood_text + " again")],
                          "doc_id long, text string").coalesce(1) \
        .write.mode("overwrite").parquet(src)

    def feed():
        return (spark.readStream.format("parquet")
                .schema("doc_id long, text string").load(src))

    q = stream_dedup_ingest(feed(), "doc_id", "text", root,
                            str(tmp_path / "ann"),
                            checkpoint=str(tmp_path / "ckpt"))
    with pytest.raises(perr.StreamingQueryException,
                       match="max_candidates"):
        try:
            q.awaitTermination(120)
        finally:
            q.stop()

    # disarmed: the same batch classifies through on a fresh checkpoint
    q2 = stream_dedup_ingest(feed(), "doc_id", "text", root,
                             str(tmp_path / "ann2"),
                             checkpoint=str(tmp_path / "ckpt2"),
                             max_candidate_pairs=None)
    try:
        q2.awaitTermination(120)
    finally:
        q2.stop()
    ann = spark.read.parquet(str(tmp_path / "ann2")).collect()
    assert len(ann) == 1 and ann[0]["dup_kind"] == "near"
