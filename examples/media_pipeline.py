#!/usr/bin/env python
"""Multimodal training-data walkthrough: media bytes -> shards ->
features -> near-dup dedup -> curated survivors.

Run:  python examples/media_pipeline.py [sf_dir] [work_dir]

Covers, in pipeline order, the media half of a training run (the text
half lives in examples/curation_end_to_end.py):
  1. fabricate WAV/PNG/AVI clips per doc      (multimodal synth_*;
     deterministic bytes through the REAL RIFF/PNG/AVI encoders)
  2. pack + read back WebDataset tar shards   (sources/webdataset)
  3. content features: audio time-domain + spectral, image perceptual
     hashes, per-frame video luma             (multimodal)
  4. near-dup triad: banded Hamming joins over image aHash and audio
     energy fingerprints                      (dedup.hamming_near_dup_pairs)
  5. incremental classify of a new batch vs the on-disk fingerprint
     index — the bounded-probe path           (dedup.store_hamming_index)
  6. composed modality gates -> survivors
Every step prints one summary JSON line; total runtime ~1 min at
sf0.001.
"""

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from helix_db_spark import get_spark
    from helix_db_spark.operators.dedup import (hamming_near_dup_pairs,
                                                incremental_hamming_dedup,
                                                store_hamming_index)
    from helix_db_spark.operators.multimodal import (
        audio_fingerprint64, audio_spectral_features, audio_time_features,
        image_perceptual_hashes, synth_avi_dib, synth_png_gray,
        synth_wav_pcm16, video_frame_stats)
    from helix_db_spark.sources.webdataset import (read_webdataset,
                                                   samples_view,
                                                   write_webdataset)

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp()
    spark = get_spark("media-pipeline-example",
                      **{"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    # doc_id < 200, not limit(200): limit over an unordered scan is an
    # arbitrary subset, and the walkthrough's pair math needs the 100
    # complete even/odd twins
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id").filter(F.col("doc_id") < 200)

    # 1. media synthesis through the real encoders
    wav = synth_wav_pcm16(docs, paired=True)
    png = synth_png_gray(docs)
    avi = synth_avi_dib(docs)
    print(json.dumps({"step": "synth", "clips": wav.count(),
                      "images": png.count(), "videos": avi.count()}))

    # 2. shard the images + a text member, read back file-parallel
    shards = os.path.join(work, "shards")
    data = docs.join(png.select(F.col("media_id").alias("doc_id"),
                                F.col("content").alias("img")), "doc_id") \
        .select(F.format_string("%019d", "doc_id").alias("k"),
                F.format_string("doc-%d", "doc_id").alias("caption"), "img")
    n_shards = write_webdataset(data.repartition(4), shards, "k",
                                {"txt": "caption", "png": "img"})
    members = read_webdataset(spark, shards + "/*.tar")
    sv = samples_view(members)
    print(json.dumps({"step": "shards", "n_shards": n_shards,
                      "samples": sv.count(),
                      "complete": sv.filter(F.col("n_members") == 2)
                                    .count()}))

    # 3. content features per modality
    at = audio_time_features(wav)
    sp = audio_spectral_features(wav)
    hashes = image_perceptual_hashes(png).select("media_id", "ahash64")
    frames = video_frame_stats(avi)
    print(json.dumps({
        "step": "features",
        "mean_rms": round(at.agg(F.avg("rms")).first()[0], 4),
        "mean_centroid_hz": round(
            sp.agg(F.avg("spectral_centroid_hz")).first()[0], 1),
        "frame_rows": frames.count()}))

    # 4. near-dup pairs: image aHash + audio energy fingerprint
    ipairs = hamming_near_dup_pairs(hashes, "media_id", "ahash64",
                                    max_hamming=8)
    afp = audio_fingerprint64(wav).select("media_id", "afp64")
    apairs = hamming_near_dup_pairs(afp, "media_id", "afp64",
                                    max_hamming=8)
    print(json.dumps({"step": "neardup", "image_pairs": ipairs.count(),
                      "audio_pairs": apairs.count()}))

    # 5. incremental classify vs the on-disk fingerprint index
    idx = os.path.join(work, "fp_index")
    store_hamming_index(hashes.filter(F.col("media_id") % 2 == 0),
                        "media_id", "ahash64", idx)
    batch = hashes.filter(F.col("media_id") % 2 == 1) \
        .select(F.col("media_id").alias("doc_id"), "ahash64")
    cls = incremental_hamming_dedup(spark, batch, "doc_id", "ahash64", idx)
    print(json.dumps({
        "step": "incremental",
        "duplicates": cls.filter("is_duplicate").count(),
        "novel": cls.filter("NOT is_duplicate").count()}))

    # 6. composed gates -> survivors (keep non-silent, non-noise audio
    # docs whose image is a dup-group survivor)
    audio_ok = at.filter((F.col("duration_ms") >= 60) &
                         (2 * F.col("zcr") <= F.col("n_samples"))) \
        .select(F.col("media_id").alias("doc_id"))
    dup_b = ipairs.select(F.col("id_b").alias("doc_id")).distinct()
    survivors = docs.join(audio_ok, "doc_id", "left_semi") \
                    .join(dup_b, "doc_id", "left_anti")
    print(json.dumps({"step": "curate", "survivors": survivors.count()}))


if __name__ == "__main__":
    main()
