"""Config-driven graph loading over mixed formats (json + csv + parquet)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from helix_db_spark import P, g
from helix_db_spark.engine import HelixSparkEngine
from helix_db_spark.sources.generic import load_graph_config


@pytest.fixture(scope="module")
def mixed_dataset(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("mixed")
    users = str(root / "users")       # json
    movies = str(root / "movies")     # csv
    ratings = str(root / "ratings")   # parquet
    spark.createDataFrame(
        [(1, "ana", 34), (2, "bo", 27), (3, "cy", 41)],
        "user_id long, name string, age long"
    ).write.mode("overwrite").json(users)
    spark.createDataFrame(
        [(10, "Heat", 1995), (11, "Arrival", 2016)],
        "movie_id long, title string, year long"
    ).write.mode("overwrite").option("header", "true").csv(movies)
    spark.createDataFrame(
        [(1, 10, 5.0), (1, 11, 4.0), (2, 10, 3.0), (3, 11, 2.0)],
        "user_id long, movie_id long, rating double"
    ).write.mode("overwrite").parquet(ratings)
    return {
        "nodes": {
            "user": {"path": users, "format": "json",
                     "schema": "user_id long, name string, age long",
                     "key": "user_id"},
            "movie": {"path": movies, "format": "csv",
                      "options": {"header": "true", "inferSchema": "true"},
                      "key": "movie_id"},
        },
        "edges": {
            "rated": {"path": ratings, "src": ["user", "user_id"],
                      "dst": ["movie", "movie_id"], "props": ["rating"]},
        },
    }


def test_mixed_format_graph_queries(spark, mixed_dataset):
    eng = HelixSparkEngine(load_graph_config(spark, mixed_dataset))
    # hop across formats: json users -> parquet edges -> csv movies
    rows = eng.run(
        g().n("user").where(P.gte("age", 30)).out("rated")
        .values("title")).collect()
    assert sorted(r["title"] for r in rows) == ["Arrival", "Arrival", "Heat"]
    # edge property filter works on the parquet edge table
    high = eng.run(g().n("user").out_e("rated")
                   .where(P.gte("rating", 4.0)).count()).head()["count"]
    assert high == 2


def test_config_ordinals_pinned_in_config_order(spark, mixed_dataset):
    cat = load_graph_config(spark, mixed_dataset)
    cat.nodes("movie")  # force out of order
    assert cat.ordinal("user") == 1
    assert cat.ordinal("movie") == 2


def test_config_broken_path_isolated(spark, mixed_dataset):
    config = {
        "nodes": dict(mixed_dataset["nodes"],
                      ghost={"path": "/nonexistent/ghost", "key": "k"}),
        "edges": mixed_dataset["edges"],
    }
    cat = load_graph_config(spark, config)
    # queries that don't touch the broken label still work
    assert cat.nodes("user")["user"].count() == 3
    with pytest.raises(Exception):
        cat.nodes("ghost")


def test_read_documents_jsonl_and_csv(spark, tmp_path):
    """Any-format corpus on-ramp: jsonl and csv land in the canonical
    (doc_id, text) shape and flow straight into the pipeline operators."""
    from helix_db_spark.operators.textstats import repetition_stats
    from helix_db_spark.sources.generic import read_documents

    jl = tmp_path / "corpus.jsonl"
    jl.write_text('{"id": 1, "body": "spam spam spam spam"}\n'
                  '{"id": 2, "body": "a perfectly normal document"}\n')
    docs = read_documents(spark, str(jl), fmt="json",
                          id_col="id", text_col="body")
    assert {"doc_id", "text"} <= set(docs.columns)
    rep = {r["doc_id"]: r["top_2gram_frac"]
           for r in repetition_stats(docs, "doc_id", "text").collect()}
    assert rep[1] == 1.0 and rep[2] < 1.0

    cs = tmp_path / "corpus.csv"
    cs.write_text("text,lang\nhello world,en\nbonjour monde,fr\n")
    docs2 = read_documents(spark, str(cs), fmt="csv")  # no id -> surrogate
    rows = docs2.collect()
    assert {r["text"] for r in rows} == {"hello world", "bonjour monde"}
    assert len({r["doc_id"] for r in rows}) == 2


def test_read_documents_jsonl_roundtrip_escaping(spark, tmp_path):
    """JSONL write->mount roundtrips the hostile cases: embedded quotes,
    newlines, unicode, and NULL text."""
    from helix_db_spark.sources.generic import read_documents
    rows = [(1, 'he said "hi"\nand left', "en"),
            (2, "naïve café — 中文 \t tab", "zh"),
            (3, None, "en"),
            (4, "", "de")]
    src = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = str(tmp_path / "docs_jsonl")
    src.write.json(out)
    got = read_documents(spark, out, fmt="json",
                         schema="doc_id BIGINT, text STRING, lang STRING")
    back = {r["doc_id"]: (r["text"], r["lang"]) for r in got.collect()}
    # NULL fields are omitted on write and read back as NULL; empty
    # strings survive verbatim
    want = {i: (t, l) for i, t, l in rows}
    assert back == want
