"""Hybrid retrieval (RRF), MMR diversification, and personalized
PageRank — unit tests with independent Python/numpy references, plus
the shape/contract edges (ties, small pools, dangling nodes, empty
seeds). The cross-engine value-hash contract for the graded shapes is
tools/check_oracle.py on the entries (hybrid_rrf_search,
vector_search_ivf_filtered, mmr_diversified_topk,
ppr_graph_expansion)."""

import math

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# rrf_fuse / ranked_topn
# ---------------------------------------------------------------------------


def test_ranked_topn_breaks_ties_by_id(spark):
    from helix_db_spark.operators.search import ranked_topn
    df = spark.createDataFrame(
        [(3, 0.5), (1, 0.5), (2, 0.9), (4, 0.1)], "id long, s double")
    out = ranked_topn(df, "id", F.col("s"), 3, ascending=False)
    rows = {r["id"]: r["_rank"] for r in out.collect()}
    # 0.9 first, then the 0.5 tie resolves to the smaller id
    assert rows == {2: 1, 1: 2, 3: 3}


def test_rrf_fuse_matches_hand_computation(spark):
    from helix_db_spark.operators.search import rrf_fuse
    a = spark.createDataFrame([(10, 1), (11, 2), (12, 3)],
                              "id long, _rank int")
    b = spark.createDataFrame([(11, 1), (13, 2)], "id long, _rank int")
    out = rrf_fuse([a, b], "id", k=10, rrf_k=60)
    got = {r["id"]: (r["rrf_score"], r["n_systems"], r["best_rank"])
           for r in out.collect()}
    assert got[11] == (round(1 / 62 + 1 / 61, 6), 2, 1)
    assert got[10] == (round(1 / 61, 6), 1, 1)
    assert got[13] == (round(1 / 62, 6), 1, 2)
    assert got[12] == (round(1 / 63, 6), 1, 3)
    # doc seen by both systems outranks every single-system doc here
    order = [r["id"] for r in out.collect()]
    assert order[0] == 11


def test_rrf_fuse_k_cut_and_id_tiebreak(spark):
    from helix_db_spark.operators.search import rrf_fuse
    # two docs with identical rank profiles tie on score -> id order
    a = spark.createDataFrame([(7, 1), (5, 1)], "id long, _rank int")
    out = rrf_fuse([a], "id", k=1)
    assert [r["id"] for r in out.collect()] == [5]


# ---------------------------------------------------------------------------
# mmr_rerank
# ---------------------------------------------------------------------------


def _mmr_reference(vecs, qv, k, pool, lam=0.7, penalty=0.3):
    """Independent greedy-MMR implementation over rounded cosines."""
    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(d / (na * nb), 6)

    rel = {i: cos(v, qv) for i, v in vecs.items()}
    cand = sorted(rel, key=lambda i: (-rel[i], i))[:pool]
    picked, out = [], []
    remaining = list(cand)
    while remaining and len(picked) < k:
        if not picked:
            best = min(remaining, key=lambda c: (-rel[c], c))
            score = rel[best]
        else:
            def mmr(c):
                ms = max(cos(vecs[c], vecs[s]) for s in picked)
                return lam * rel[c] - penalty * ms
            best = min(remaining, key=lambda c: (-mmr(c), c))
            score = mmr(best)
        picked.append(best)
        out.append((best, len(picked), score))
        remaining.remove(best)
    return out


def _vec_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "vid long, v array<float>")


def test_mmr_matches_reference_and_diversifies(spark):
    from helix_db_spark.operators.similarity import mmr_rerank
    # 0/1 near-duplicates of the query direction; 2 a clone of 0;
    # 3 orthogonal-ish; 4 negatively aligned
    vecs = {0: [1.0, 0.0, 0.0], 1: [0.99, 0.1, 0.0],
            2: [1.0, 0.001, 0.0], 3: [0.1, 1.0, 0.0],
            4: [-0.5, 0.2, 0.8]}
    qv = [1.0, 0.05, 0.0]
    out = mmr_rerank(_vec_df(spark, vecs), "vid", "v", qv, k=4, pool=5)
    got = [(r["id"], r["mmr_rank"], round(r["mmr_score"], 6))
           for r in out.orderBy("mmr_rank").collect()]
    ref = [(i, r, round(s, 6)) for i, r, s in
           _mmr_reference(vecs, qv, k=4, pool=5)]
    assert got == ref


def test_mmr_penalty_displaces_near_duplicates(spark):
    from helix_db_spark.operators.similarity import mmr_rerank
    # pure top-3 by relevance is the clone cluster {0, 1, 2}; with an
    # equal-weight penalty the off-axis doc 3 must enter the top 3
    vecs = {0: [1.0, 0.0, 0.0], 1: [0.99, 0.1, 0.0],
            2: [1.0, 0.001, 0.0], 3: [0.1, 1.0, 0.0],
            4: [-0.5, 0.2, 0.8]}
    qv = [1.0, 0.05, 0.0]
    out = mmr_rerank(_vec_df(spark, vecs), "vid", "v", qv, k=3, pool=5,
                     lam=0.5, penalty=0.5)
    got = [(r["id"], r["mmr_rank"], r["mmr_score"])
           for r in out.orderBy("mmr_rank").collect()]
    ref = _mmr_reference(vecs, qv, k=3, pool=5, lam=0.5, penalty=0.5)
    assert [(i, r) for i, r, _ in got] == [(i, r) for i, r, _ in ref]
    assert 3 in [i for i, _, _ in got]


def test_mmr_pool_smaller_than_k(spark):
    from helix_db_spark.operators.similarity import mmr_rerank
    vecs = {0: [1.0, 0.0], 1: [0.0, 1.0]}
    out = mmr_rerank(_vec_df(spark, vecs), "vid", "v", [1.0, 0.0],
                     k=10, pool=5)
    assert out.count() == 2  # exhausts the pool, no crash


# ---------------------------------------------------------------------------
# personalized_pagerank
# ---------------------------------------------------------------------------


def _ppr_reference(edges, seeds, iters=4, d=0.85):
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    reset = {n: (1.0 / len(seeds) if n in seeds else 0.0) for n in nodes}
    od = {}
    for a, _ in edges:
        od[a] = od.get(a, 0) + 1
    r = dict(reset)
    for _ in range(iters):
        infl = {n: 0.0 for n in nodes}
        for a, b in edges:
            infl[b] += r[a] / od[a]
        dangling = sum(r[n] for n in nodes if n not in od)
        coef = (1.0 - d) + d * dangling
        r = {n: round(coef * reset[n] + d * infl[n], 12) for n in nodes}
    return r


def test_ppr_matches_reference_with_dangling_node(spark):
    from helix_db_spark.operators.graph import personalized_pagerank
    # 3 is dangling (no out-edges): its mass must restart at the seeds
    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (0, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = personalized_pagerank(df, [0], iters=4)
    got = {r["node"]: r["ppr"] for r in out.collect()}
    ref = _ppr_reference(edges, {0})
    assert set(got) == set(ref)
    for n in ref:
        assert got[n] == pytest.approx(ref[n], abs=1e-11)
    # mass conservation: total rank stays ~1 (teleport recycles dangling)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    # personalization: the seed holds more mass than the dangling sink
    assert got[0] > got[3]


def test_ppr_rejects_empty_seeds(spark):
    from helix_db_spark.operators.graph import personalized_pagerank
    df = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError):
        personalized_pagerank(df, [])


def test_ppr_uniform_seed_over_cycle_is_stationary(spark):
    from helix_db_spark.operators.graph import personalized_pagerank
    # symmetric 3-cycle seeded on all nodes: ranks stay equal
    df = spark.createDataFrame([(0, 1), (1, 2), (2, 0)],
                               "src long, dst long")
    out = personalized_pagerank(df, [0, 1, 2], iters=3)
    vals = [r["ppr"] for r in out.collect()]
    assert len(set(vals)) == 1
    assert sum(vals) == pytest.approx(1.0, abs=1e-9)


# ---------------------------------------------------------------------------
# ann_recall
# ---------------------------------------------------------------------------


def test_ann_recall_full_probe_is_perfect(spark):
    from helix_db_spark.operators.similarity import (ann_recall,
                                                     ivf_cell_budget)
    import random
    rng = random.Random(7)
    vecs = [(i, [rng.uniform(-1, 1) for _ in range(8)])
            for i in range(40)]
    df = spark.createDataFrame(vecs, "vid long, v array<float>")
    ncells = ivf_cell_budget(40)  # probe EVERY cell => recall must be 1
    out = ann_recall(df, "vid", "v", k=3,
                     src_filter=(F.col("vid") % 10 == 0),
                     nprobe=ncells).collect()
    assert len(out) == 4
    for r in out:
        assert r["n_exact"] == 3 and r["n_hits"] == 3
        assert r["recall"] == 1.0


def test_ann_recall_bounded_and_counts(spark):
    from helix_db_spark.operators.similarity import ann_recall
    import random
    rng = random.Random(11)
    vecs = [(i, [rng.uniform(-1, 1) for _ in range(8)])
            for i in range(60)]
    df = spark.createDataFrame(vecs, "vid long, v array<float>")
    out = ann_recall(df, "vid", "v", k=4,
                     src_filter=(F.col("vid") < 6), nprobe=1).collect()
    assert len(out) == 6
    for r in out:
        assert r["n_exact"] == 4
        assert 0 <= r["n_hits"] <= 4
        assert r["recall"] == pytest.approx(r["n_hits"] / 4.0)


# ---------------------------------------------------------------------------
# hits_bipartite
# ---------------------------------------------------------------------------


def _hits_reference(edges, iters=4):
    srcs = sorted({a for a, _ in edges})
    dsts = sorted({b for _, b in edges})
    h = {v: 1.0 for v in srcs}
    a = {}
    for _ in range(iters):
        raw = {u: round(sum(h[v] for v, w in edges if w == u), 12)
               for u in dsts}
        m = max(raw.values())
        a = {u: round(raw[u] / m, 12) for u in dsts}
        raw = {v: round(sum(a[w] for x, w in edges if x == v), 12)
               for v in srcs}
        m = max(raw.values())
        h = {v: round(raw[v] / m, 12) for v in srcs}
    return h, a


def test_hits_matches_reference(spark):
    from helix_db_spark.operators.graph import hits_bipartite
    # customer 1 buys everything (hub); part 10 bought by everyone
    # (authority)
    edges = [(1, 10), (1, 11), (1, 12), (2, 10), (2, 11), (3, 10)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = hits_bipartite(df, iters=4)
    got = {(r["side"], r["node"]): r["s"] for r in out.collect()}
    h, a = _hits_reference(edges)
    for v, s in h.items():
        assert got[("hub", v)] == pytest.approx(s, abs=1e-11)
    for u, s in a.items():
        assert got[("authority", u)] == pytest.approx(s, abs=1e-11)
    # the max-normalized top scores are exactly 1
    assert got[("hub", 1)] == 1.0
    assert got[("authority", 10)] == 1.0
    # duality: the all-buying customer out-hubs the others, the
    # universally-bought part out-ranks the others
    assert got[("hub", 1)] > got[("hub", 3)]
    assert got[("authority", 10)] > got[("authority", 12)]


def test_mmr_pool_bound_enforced(spark):
    """The pool^2 driver chain is bounded IN CODE: a corpus-sized pool
    must raise, not OOM the driver (VERDICT r8 #7)."""
    import pytest
    from helix_db_spark.operators.similarity import MMR_MAX_POOL, mmr_rerank
    df = spark.range(5).selectExpr(
        "id AS vec_id", "array(cast(id as float), 1.0F) AS embedding")
    with pytest.raises(ValueError, match="MMR_MAX_POOL"):
        mmr_rerank(df, "vec_id", "embedding", [1.0, 0.0], k=3,
                   pool=MMR_MAX_POOL + 1)
