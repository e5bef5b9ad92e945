"""CLI tests (entry point C): subprocess-free — drive main() in-process so
the module-scoped Spark session is reused."""

from __future__ import annotations

import json

import pytest

from helix_db_spark import cli


def _run(capsys, *argv):
    rc = cli.main(list(argv))
    out = capsys.readouterr()
    return rc, out.out, out.err


REQ = json.dumps({
    "request_type": "read",
    "query": {"queries": [{"Query": {
        "name": "r",
        "steps": [{"NWhere": {"Eq": ["$label", {"String": "region"}]}},
                  "Count"],
        "condition": None}}],
        "returns": ["r"]},
})


def test_query_inline_json(spark, capsys):
    rc, out, _ = _run(capsys, "query", "--json", REQ,
                      "--data", "/root/testdata/sf0.001")
    assert rc == 0
    assert json.loads(out) == {"r": [{"count": 5}]}


def test_query_from_file(spark, capsys, tmp_path):
    f = tmp_path / "req.json"
    f.write_text(REQ)
    rc, out, _ = _run(capsys, "query", "--file", str(f),
                      "--data", "/root/testdata/sf0.001")
    assert rc == 0 and json.loads(out) == {"r": [{"count": 5}]}


def test_query_validates_request_type(spark, capsys):
    rc, _, err = _run(capsys, "query", "--json",
                      '{"request_type": "bogus"}')
    assert rc == 2 and "request_type" in json.loads(err)["error"]


def test_query_against_saved_store(spark, capsys, tmp_path):
    from helix_db_spark.sources.store import save_catalog
    from helix_db_spark.sources.tpch import load_graph
    root = str(tmp_path / "store")
    save_catalog(load_graph(spark, "/root/testdata/sf0.001"), root,
                 partitions=2)
    rc, out, _ = _run(capsys, "query", "--json", REQ, "--store", root)
    assert rc == 0 and json.loads(out) == {"r": [{"count": 5}]}
