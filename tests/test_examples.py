"""The shipped example walkthrough must keep running end-to-end."""

import importlib.util
import json
import os
import sys

import pytest


def test_warc_example_runs(spark, tmp_path, capsys):
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", "warc_to_corpus.py")
    spec = importlib.util.spec_from_file_location("warc_example", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    argv = sys.argv
    sys.argv = [path, "/root/testdata/sf0.001", str(tmp_path)]
    try:
        mod.main()
    finally:
        sys.argv = argv
    lines = [json.loads(ln) for ln in
             capsys.readouterr().out.strip().splitlines()]
    steps = [ln["step"] for ln in lines]
    assert steps == ["fixture", "parse", "extract", "gate", "dedup"]
    assert lines[1]["records"] == lines[1]["http_200"] > 0
    assert lines[4]["survivors"] > 0


@pytest.mark.slow
def test_curation_example_runs(spark, tmp_path, capsys):
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", "curation_end_to_end.py")
    spec = importlib.util.spec_from_file_location("curation_example", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    argv = sys.argv
    sys.argv = [path, "/root/testdata/sf0.001", str(tmp_path)]
    try:
        mod.main()
    finally:
        sys.argv = argv
    lines = [json.loads(ln) for ln in
             capsys.readouterr().out.strip().splitlines()]
    steps = [ln["step"] for ln in lines]
    assert steps == ["card", "lm_scoring", "curate", "incremental_dedup",
                     "pack"]
    assert lines[2]["kept"] > 0 and "train" in lines[2]["splits"]


def test_media_example_runs(spark, tmp_path, capsys):
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", "media_pipeline.py")
    spec = importlib.util.spec_from_file_location("media_example", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    argv = sys.argv
    sys.argv = [path, "/root/testdata/sf0.001", str(tmp_path)]
    try:
        mod.main()
    finally:
        sys.argv = argv
    lines = [json.loads(ln) for ln in
             capsys.readouterr().out.strip().splitlines()]
    steps = [ln["step"] for ln in lines]
    assert steps == ["synth", "shards", "features", "neardup",
                     "incremental", "curate"]
    by = {ln["step"]: ln for ln in lines}
    assert by["synth"]["clips"] == by["shards"]["samples"] == 200
    assert by["shards"]["complete"] == 200
    assert by["neardup"]["image_pairs"] >= 100   # planted even/odd pairs
    assert by["incremental"]["duplicates"] == 100  # every odd has a twin
    assert 0 < by["curate"]["survivors"] < 200


def test_feature_store_example_runs(spark, tmp_path, capsys):
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", "feature_store_pipeline.py")
    spec = importlib.util.spec_from_file_location("fs_example", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    argv = sys.argv
    sys.argv = [path, "/root/testdata/sf0.001", str(tmp_path)]
    try:
        mod.main()
    finally:
        sys.argv = argv
    lines = [json.loads(ln) for ln in
             capsys.readouterr().out.strip().splitlines()]
    steps = [ln["step"] for ln in lines]
    assert steps == ["ingest", "gopher", "classify", "band_join",
                     "bucketed"]
    by = {ln["step"]: ln for ln in lines}
    assert by["ingest"]["docs"] == 500
    assert 0 < by["gopher"]["wc_ok"] < 500
    assert by["classify"]["scored"] == 100
    assert by["band_join"]["clicks_with_context"] > 0
    assert by["bucketed"]["query_time_shuffles"] == 0
    assert by["bucketed"]["customers"] > 0


@pytest.mark.slow
def test_streaming_example_runs(spark, tmp_path, capsys):
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", "streaming_pipeline.py")
    spec = importlib.util.spec_from_file_location("stream_example", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    argv = sys.argv
    sys.argv = [path, "/root/testdata/sf0.001", str(tmp_path)]
    try:
        mod.main()
    finally:
        sys.argv = argv
    lines = [json.loads(ln) for ln in
             capsys.readouterr().out.strip().splitlines()]
    by = {ln["step"]: ln for ln in lines}
    assert list(by) == ["windowed", "sessionize", "band_join_inner",
                        "band_join_outer"]
    assert by["windowed"]["finalized_windows"] > 0
    assert by["sessionize"]["sessions"] > 0
    # outer = inner pairs + one NULL row per unmatched click
    assert by["band_join_outer"]["rows"] == \
        by["band_join_inner"]["pairs"] + by["band_join_outer"]["unmatched_clicks"]
    assert by["band_join_outer"]["unmatched_clicks"] > 0


def test_embedding_example_runs(spark, tmp_path, capsys):
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", "embedding_pipeline.py")
    spec = importlib.util.spec_from_file_location("emb_example", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    argv = sys.argv
    sys.argv = [path, "/root/testdata/sf0.001", str(tmp_path)]
    try:
        mod.main()
    finally:
        sys.argv = argv
    lines = [json.loads(ln) for ln in
             capsys.readouterr().out.strip().splitlines()]
    by = {ln["step"]: ln for ln in lines}
    assert list(by) == ["fit", "whiten", "neighbors", "sketch", "layout"]
    # eigenvalues descend; whitened first coord is exactly unit variance
    ev = by["fit"]["top_eigenvalues"]
    assert ev == sorted(ev, reverse=True)
    assert by["whiten"]["rows"] == 500
    assert by["whiten"]["c0_var"] == 1.0
    # whitening genuinely re-ranks the neighborhood
    assert by["neighbors"]["overlap"] < 10
    # the KMV sketch is exact below k everywhere
    assert by["sketch"]["exact_mismatches_below_k"] == 0
    # layout never scans MORE than the 1-D copy, and both cover matches
    assert by["layout"]["scan_rows_zorder"] <= by["layout"]["scan_rows_plain"]
    assert by["layout"]["scan_rows_zorder"] >= by["layout"]["box_matches"]


@pytest.mark.slow
def test_table_lifecycle_example_runs(spark, tmp_path, capsys):
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", "table_lifecycle.py")
    spec = importlib.util.spec_from_file_location("lifecycle_example", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    argv = sys.argv
    sys.argv = [path, "/root/testdata/sf0.001", str(tmp_path)]
    try:
        mod.main()
    finally:
        sys.argv = argv
    lines = [json.loads(ln) for ln in
             capsys.readouterr().out.strip().splitlines()]
    steps = [ln["step"] for ln in lines]
    assert steps == ["init", "merge", "stream", "delete", "compact",
                     "time_travel", "vacuum"]
    by = {ln["step"]: ln for ln in lines}
    # the narrow merge must NOT rewrite the whole table
    assert 0 < by["merge"]["files_rewritten"] < by["merge"]["files_total"]
    # the streamed key carries the LAST batch's version
    assert by["stream"]["doc0"] == [["cdc batch two", 3]]
    # time travel: v0 keeps the pre-merge count; current reflects
    # 5 inserts minus 2 deletes
    assert by["time_travel"]["current_rows"] == \
        by["time_travel"]["v0_rows"] + 5 - 2
    assert by["vacuum"]["deleted_versions"] == 5
