"""HTTP surface tests: dynamic queries and stored-route bundles over real
sockets, mirroring the reference client protocol (client.py:170-215)."""

from __future__ import annotations

import json
import urllib.request

import pytest

from helix_db_spark.catalog import GraphCatalog
from helix_db_spark.engine import HelixSparkEngine
from helix_db_spark.server import HelixSparkServer, QueryBundle


@pytest.fixture(scope="module")
def server(spark):
    cat = GraphCatalog(spark)
    cat.add_nodes("User", spark.createDataFrame(
        [(1, "alice", 31), (2, "bob", 27)], "k long, name string, age long"),
        key_col="k")
    bundle = QueryBundle.from_json({
        "version": 5,
        "read_routes": {
            "adults": {"queries": [{"Query": {
                "name": "adults",
                "steps": [
                    {"NWhere": {"Eq": ["$label", {"String": "User"}]}},
                    {"Where": {"GteExpr": ["age", {"Param": "min_age"}]}},
                    {"Values": ["name"]}],
                "condition": None}}],
                "returns": ["adults"]},
        },
        "write_routes": {},
        "read_parameters": {"adults": [{"name": "min_age", "ty": "I64"}]},
    })
    srv = HelixSparkServer(HelixSparkEngine(cat), bundle)
    port = srv.start()
    yield f"http://127.0.0.1:{port}"
    srv.stop()


def _post(url: str, body: dict) -> tuple:
    req = urllib.request.Request(
        url, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json",
                 "Authorization": "Bearer test-key"})
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as ex:
        return ex.code, json.loads(ex.read())


def test_dynamic_query_roundtrip(server):
    status, out = _post(server + "/v1/query", {
        "request_type": "read",
        "query": {"queries": [{"Query": {
            "name": "n", "steps": [
                {"NWhere": {"Eq": ["$label", {"String": "User"}]}},
                "Count"], "condition": None}}],
            "returns": ["n"]},
    })
    assert (status, out) == (200, {"n": [{"count": 2}]})


def test_stored_route_with_params(server):
    status, out = _post(server + "/v1/query/adults",
                        {"parameters": {"min_age": 30}})
    assert (status, out) == (200, {"adults": [{"name": "alice"}]})


def test_unknown_route_404(server):
    status, out = _post(server + "/v1/query/nope", {})
    assert status == 404 and "unknown stored query" in out["error"]


def test_bad_request_400(server):
    status, out = _post(server + "/v1/query", {
        "request_type": "neither", "query": {"queries": [], "returns": []}})
    assert status == 400 and "request_type" in out["error"]


def test_write_step_in_read_batch_400(server):
    status, out = _post(server + "/v1/query", {
        "request_type": "read",
        "query": {"queries": [{"Query": {
            "name": "bad",
            "steps": [{"AddN": {"label": "X", "properties": []}}],
            "condition": None}}], "returns": []},
    })
    assert status == 400 and "write step" in out["error"]


def test_bundle_version_check():
    with pytest.raises(Exception, match="unsupported query bundle version"):
        QueryBundle.from_json({"version": 3, "read_routes": {},
                               "write_routes": {}})


def test_readiness_probe(spark):
    srv = HelixSparkServer(HelixSparkEngine(GraphCatalog(spark)))
    assert srv.ready()  # empty label scan answers 0, engine is up
