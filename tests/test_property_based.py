"""Property-based tests: the Predicate/Expr -> Column compiler vs a direct
Python evaluator over randomized rows and predicate trees.

The reference has no property-based testing (SURVEY §5); this is net-new
hardening: any divergence between the compiled Spark filter and the
reference Python semantics is a real compiler bug.

NULL semantics are SQL three-valued logic (the reference spec is silent on
Not/NULL interaction, dsl.rs:1586-1648; this engine's correctness contract
is DuckDB-SQL oracle equivalence, so comparisons on NULL are unknown,
Not(unknown) stays unknown, and unknown rows never match) — the Python
evaluator below mirrors exactly that.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from helix_db_spark import P, X, g
from helix_db_spark.catalog import GraphCatalog
from helix_db_spark.engine import HelixSparkEngine
from helix_db_spark.plans import ast

# -- row + predicate generators ---------------------------------------------

_ints = st.integers(min_value=-1000, max_value=1000)
_strs = st.sampled_from(["", "a", "ab", "abc", "xyz", "hello", "Zq"])


@st.composite
def rows(draw):
    n = draw(st.integers(min_value=1, max_value=8))
    return [(i,
             draw(st.one_of(_ints, st.none())),
             draw(_strs))
            for i in range(n)]


# evaluators return True / False / None (SQL unknown)


@st.composite
def predicates(draw, depth=0):
    if depth >= 2:
        leaf = True
    else:
        leaf = draw(st.booleans())
    if leaf:
        kind = draw(st.sampled_from(
            ["eq", "neq", "gt", "gte", "lt", "lte", "between", "isnull",
             "notnull", "starts", "ends", "contains", "isin"]))
        if kind in ("eq", "neq", "gt", "gte", "lt", "lte"):
            v = draw(_ints)
            return getattr(P, kind)("num", v), _cmp_eval(kind, v)
        if kind == "between":
            lo, hi = sorted((draw(_ints), draw(_ints)))
            return P.between("num", lo, hi), \
                lambda r: None if r["num"] is None else lo <= r["num"] <= hi
        if kind == "isnull":
            return P.is_null("num"), lambda r: r["num"] is None
        if kind == "notnull":
            return P.is_not_null("num"), lambda r: r["num"] is not None
        s = draw(_strs.filter(lambda x: x))
        if kind == "starts":
            return P.starts_with("txt", s), \
                lambda r: None if r["txt"] is None else r["txt"].startswith(s)
        if kind == "ends":
            return P.ends_with("txt", s), \
                lambda r: None if r["txt"] is None else r["txt"].endswith(s)
        if kind == "contains":
            return P.contains("txt", s), \
                lambda r: None if r["txt"] is None else s in r["txt"]
        vals = draw(st.lists(_ints, min_size=1, max_size=4))
        return P.is_in("num", vals), \
            lambda r: None if r["num"] is None else r["num"] in vals
    op = draw(st.sampled_from(["and", "or", "not"]))
    a_pred, a_eval = draw(predicates(depth=depth + 1))
    if op == "not":
        return P.not_(a_pred), \
            lambda r: None if a_eval(r) is None else not a_eval(r)
    b_pred, b_eval = draw(predicates(depth=depth + 1))
    if op == "and":
        # SQL AND: False dominates, then unknown
        def and_eval(r, a=a_eval, b=b_eval):
            x, y = a(r), b(r)
            if x is False or y is False:
                return False
            if x is None or y is None:
                return None
            return True
        return P.and_(a_pred, b_pred), and_eval

    def or_eval(r, a=a_eval, b=b_eval):
        x, y = a(r), b(r)
        if x is True or y is True:
            return True
        if x is None or y is None:
            return None
        return False
    return P.or_(a_pred, b_pred), or_eval


def _cmp_eval(kind, v):
    import operator
    ops = {"eq": operator.eq, "neq": operator.ne, "gt": operator.gt,
           "gte": operator.ge, "lt": operator.lt, "lte": operator.le}

    def ev(r):
        if r["num"] is None:
            return None  # unknown
        return ops[kind](r["num"], v)
    return ev


# NOTE: one engine per module; hypothesis shrinks fast on local[32]
@pytest.fixture(scope="module")
def mk_engine(spark):
    def make(data):
        cat = GraphCatalog(spark)
        cat.add_nodes("R", spark.createDataFrame(
            data, "k long, num long, txt string"), key_col="k")
        return HelixSparkEngine(cat)
    return make


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=rows(), pred=predicates())
def test_predicate_compiler_matches_python(mk_engine, data, pred):
    predicate, evaluate = pred
    eng = mk_engine(data)
    got = sorted(r["k"] for r in
                 eng.run(g().n("R").where(predicate).values("k")).collect())
    want = sorted(r[0] for r in data
                  if evaluate({"num": r[1], "txt": r[2]}) is True)
    assert got == want


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=rows(), a=_ints.filter(lambda x: x != 0), b=_ints)
def test_arithmetic_expr_matches_python(mk_engine, data, a, b):
    eng = mk_engine(data)
    expr = X.add(X.mul(X.prop("k"), a), b)          # k*a + b, exact int math
    got = {r["k"]: r["v"] for r in
           eng.run(g().n("R").project(k="k", v=expr)).collect()}
    want = {r[0]: r[0] * a + b for r in data}
    assert got == want


# --- round-5 operator properties: Spark vs pure-python references --------

_words = st.lists(st.sampled_from(["a", "b", "c", "ab", "x1", "q"]),
                  min_size=0, max_size=30)


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=st.lists(_words, min_size=1, max_size=8))
@pytest.mark.slow
def test_repetition_stats_matches_python(spark, docs):
    """The sorted-array fold equals a direct Counter-based reference on
    arbitrary token streams (fractions, counts, and NULL short-docs)."""
    from collections import Counter

    from helix_db_spark.operators.textstats import repetition_stats

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r
           for r in repetition_stats(df, "doc_id", "text").collect()}
    for i, ws in enumerate(docs):
        g2 = Counter(" ".join(ws[j:j + 2]) for j in range(len(ws) - 1))
        g3 = Counter(" ".join(ws[j:j + 3]) for j in range(len(ws) - 2))
        r = got[i]
        assert r["n_2grams"] == sum(g2.values())
        if not g2:
            assert r["top_2gram_frac"] is None
        else:
            assert r["top_2gram_count"] == max(g2.values())
            assert math.isclose(
                r["top_2gram_frac"],
                round(max(g2.values()) / sum(g2.values()), 6))
        if not g3:
            assert r["dup_3gram_frac"] is None
        else:
            dup = sum(c for c in g3.values() if c >= 2)
            assert math.isclose(r["dup_3gram_frac"],
                                round(dup / sum(g3.values()), 6))


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(sizes=st.lists(st.integers(min_value=0, max_value=900),
                      min_size=1, max_size=20),
       budget=st.integers(min_value=1, max_value=600))
def test_pack_documents_matches_python(spark, sizes, budget):
    """Packing offsets/bins equal a sequential reference for any sizes
    and budget (single shard)."""
    from helix_db_spark.operators.sampling import pack_documents

    rows = [(i, "s", n) for i, n in enumerate(sizes)]
    df = spark.createDataFrame(rows, "doc_id long, shard string, n int")
    got = {r["doc_id"]: r for r in pack_documents(
        df, "doc_id", "n", budget=budget, by="shard").collect()}
    off = 0
    for i, n in enumerate(sizes):
        r = got[i]
        assert r["stream_offset"] == off
        assert r["bin_start"] == off // budget
        assert r["bin_end"] == (off + max(n, 1) - 1) // budget
        off += n


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=st.lists(_words, min_size=1, max_size=8),
       n=st.integers(min_value=2, max_value=4))
def test_duplicate_spans_matches_python(spark, docs, n):
    """The span-hash join equals a direct set-based reference: a span is
    duplicated iff its exact n-token window occurs in >= 2 docs."""
    from collections import defaultdict

    from helix_db_spark.operators.dedup import duplicate_spans

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r
           for r in duplicate_spans(df, "doc_id", "text", n=n).collect()}
    where = defaultdict(set)
    spans = {}
    for i, ws in enumerate(docs):
        spans[i] = [" ".join(ws[j:j + n]) for j in range(len(ws) - n + 1)]
        for sp in spans[i]:
            where[sp].add(i)
    for i, ws in enumerate(docs):
        if len(ws) < n:
            assert i not in got
            continue
        dup = sum(1 for sp in spans[i] if len(where[sp]) >= 2)
        assert got[i]["n_spans"] == len(spans[i])
        assert got[i]["dup_spans"] == dup
        assert math.isclose(got[i]["dup_fraction"],
                            round(dup / len(spans[i]), 6))


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=st.lists(_words, min_size=1, max_size=10))
@pytest.mark.slow
def test_lm_cross_entropy_matches_python(spark, docs):
    """avg(-ln P_mle(token)) equals the Counter-based reference."""
    from collections import Counter

    from helix_db_spark.operators.textstats import lm_cross_entropy

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r
           for r in lm_cross_entropy(df, "doc_id", "text").collect()}
    counts = Counter(w for ws in docs for w in ws)
    total = sum(counts.values())
    for i, ws in enumerate(docs):
        if not ws:
            assert i not in got
            continue
        ce = sum(-math.log(counts[w] / total) for w in ws) / len(ws)
        assert got[i]["n_tokens"] == len(ws)
        assert math.isclose(got[i]["cross_entropy"], round(ce, 6),
                            abs_tol=2e-6)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(groups=st.lists(
    st.tuples(st.sampled_from("abcdef"), st.integers(1, 500)),
    min_size=1, max_size=12, unique_by=lambda t: t[0]))
def test_mixture_plan_invariants(spark, groups):
    """Downsampling-only plan properties on arbitrary group layouts:
    fracs in (0, 1], the binding group keeps everything, kept units hit
    the target ratios, shares sum to 1."""
    from helix_db_spark.operators.sampling import mixture_plan

    rows = [(f"{g}{i}", g, sz) for g, sz in groups for i in range(1)]
    # one row per group with weight = group size (weights carry the mass)
    df = spark.createDataFrame(rows, "id string, src string, w int")
    out = mixture_plan(df, "src", size_col="w").collect()
    assert len(out) == len(groups)
    assert math.isclose(sum(r["share"] for r in out), 1.0, abs_tol=1e-4)
    tgt = 1.0 / len(groups)
    m = min(sz for _, sz in groups)
    for r in out:
        assert 0 < r["sample_frac"] <= 1.0
        assert math.isclose(r["target_share"], round(tgt, 6), abs_tol=1e-6)
        # every group keeps the binding group's unit mass (uniform target)
        assert math.isclose(r["keep_units"], m, abs_tol=0.51)
    assert any(r["sample_frac"] == 1.0 for r in out)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(groups=st.lists(
    st.tuples(st.sampled_from("abcdef"), st.integers(1, 500)),
    min_size=1, max_size=8, unique_by=lambda t: t[0]),
    temp=st.sampled_from([0.5, 1.0, 2.0, 5.0]))
def test_mixture_plan_temperature_invariants(spark, groups, temp):
    """Temperature targets on arbitrary layouts: targets sum to 1, fracs
    in (0, 1], at least one binding group, and the temperature ordering
    holds — T>1 lifts small groups' targets above their natural share,
    T<1 lowers them (strict when shares differ)."""
    from helix_db_spark.operators.sampling import mixture_plan

    rows = [(f"{g}0", g, sz) for g, sz in groups]
    df = spark.createDataFrame(rows, "id string, src string, w int")
    out = mixture_plan(df, "src", size_col="w", temperature=temp).collect()
    assert len(out) == len(groups)
    assert math.isclose(sum(r["target_share"] for r in out), 1.0,
                        abs_tol=1e-4)
    for r in out:
        assert 0 < r["sample_frac"] <= 1.0
    assert any(r["sample_frac"] == 1.0 for r in out)
    smallest = min(out, key=lambda r: r["share"])
    if temp == 1.0:
        for r in out:
            assert math.isclose(r["target_share"], r["share"], abs_tol=2e-6)
    elif len({r["share"] for r in out}) > 1:
        if temp > 1.0:
            assert smallest["target_share"] > smallest["share"] - 1e-9
        else:
            assert smallest["target_share"] < smallest["share"] + 1e-9


# --- interval_join == brute force on arbitrary timestamps/bands ----------

_epoch_us = st.integers(min_value=-2_000_000_000_000_000,  # ~1906
                        max_value=4_000_000_000_000_000)   # ~2096, in
                                                           # microseconds


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(lts=st.lists(_epoch_us, min_size=1, max_size=12),
       rts=st.lists(_epoch_us, min_size=1, max_size=12),
       lo=st.integers(min_value=-10_000_000, max_value=10_000_000),
       width=st.integers(min_value=0, max_value=20_000_000))
@pytest.mark.slow
def test_interval_join_matches_bruteforce_property(spark, lts, rts,
                                                   lo, width):
    """Bucketed band join == brute force for ANY timestamps (both epoch
    signs) and ANY inclusive band, including the point band — the
    floor-division/bounds contract under fuzz."""
    from helix_db_spark.operators.sampling import interval_join

    hi = lo + width
    left = spark.createDataFrame(
        [(i, v) for i, v in enumerate(lts)], "lid long, lus long") \
        .select("lid", F.timestamp_micros(F.col("lus")).alias("ts"))
    right = spark.createDataFrame(
        [(j, v) for j, v in enumerate(rts)], "rid long, rus long") \
        .select("rid", F.timestamp_micros(F.col("rus")).alias("rts"))
    out = interval_join(left, right, "ts", "rts",
                        lo / 1e6, hi / 1e6)
    got = sorted((r["lid"], r["rid"]) for r in out.collect())
    want = sorted((i, j) for i, lv in enumerate(lts)
                  for j, rv in enumerate(rts)
                  if lv + lo <= rv <= lv + hi)
    assert got == want


# --- nb_classify == pure-Python multinomial NB on arbitrary corpora ------

_nb_word = st.sampled_from(["aa", "bb", "cc", "dd", "the"])
_nb_label = st.sampled_from(["x", "y", None])


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(train=st.lists(st.tuples(
           st.lists(_nb_word, min_size=0, max_size=6), _nb_label),
           min_size=1, max_size=10).filter(
           lambda t: any(lbl is not None for _, lbl in t)),
       test=st.lists(st.lists(_nb_word, min_size=0, max_size=6),
                     min_size=1, max_size=6))
@pytest.mark.slow
def test_nb_classify_matches_python_reference(spark, train, test):
    """The distributed closed form == a dictionary-arithmetic NB:
    same Laplace smoothing, same prior fallback, same NULL-label
    exclusion, same round-then-argmax-with-label-tiebreak."""
    import math
    from collections import Counter
    from helix_db_spark.operators.textstats import nb_classify

    tr_rows = [(i, " ".join(ws), lbl) for i, (ws, lbl) in enumerate(train)]
    te_rows = [(100 + i, " ".join(ws), None) for i, ws in enumerate(test)]
    tdf = spark.createDataFrame(tr_rows, "doc_id long, text string, "
                                         "lang string")
    sdf = spark.createDataFrame(te_rows, "doc_id long, text string, "
                                         "lang string")
    got = {r["doc_id"]: (r["pred_lang"], r["log_score"]) for r in
           nb_classify(tdf, sdf, "doc_id", "text", "lang").collect()}

    labeled = [(ws, lbl) for ws, lbl in train if lbl is not None]
    ct = Counter((lbl, w) for ws, lbl in labeled for w in ws)
    ntok = Counter()
    for (lbl, _), c in ct.items():
        ntok[lbl] += c
    pri = Counter(lbl for _, lbl in labeled)
    ntr = sum(pri.values())
    vocab = len({w for _, w in ct})
    for i, ws in enumerate(test):
        scores = {}
        for lbl in pri:
            s = math.log(pri[lbl] / ntr)
            for w in ws:
                # max(..., 1) = the operator's empty-vocabulary guard
                s += math.log((ct[(lbl, w)] + 1)
                              / max(ntok[lbl] + vocab, 1))
            scores[lbl] = round(s, 6)
        want = min(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        assert got[100 + i][0] == want[0]
        assert got[100 + i][1] == pytest.approx(want[1], abs=2e-6)


# --- gopher_quality_flags == pure-Python rule reference -------------------

_gopher_text = st.text(
    alphabet="ab WZ19#.*-•…\t\n\r",
    min_size=0, max_size=160)


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=st.lists(st.one_of(_gopher_text, st.none()),
                      min_size=1, max_size=6))
def test_gopher_flags_match_python_reference(spark, texts):
    """Every Gopher rule equals an independent Python reimplementation
    on hostile text (CRLF, lone \\r, bullets, ellipses, NULLs)."""
    import re

    from helix_db_spark.operators.textstats import gopher_quality_flags

    stops = {"the", "be", "to", "of", "and", "that", "have", "with"}

    def ref(text):
        t = text or ""
        words = [w for w in re.split(r"[ \t\n\r]+", t) if w]
        nw = len(words)
        sl = sum(len(w) for w in words)
        lines = [x for x in re.split(r"\r?\n", t) if x]
        nl = len(lines)
        ell = t.count("...") + t.count("…")
        nbl = sum(1 for x in lines if re.match(r"^[ \t]*[-*•] ", x))
        nel = sum(1 for x in lines
                  if x.endswith("...") or x.endswith("…"))
        nal = sum(1 for w in words if re.search(r"[a-zA-Z]", w))
        sh = len({w.lower() for w in words} & stops)
        return {
            "n_words": nw,
            "wc_ok": 50 <= nw <= 100000,
            "wlen_ok": nw > 0 and 3.0 <= sl / nw <= 10.0,
            "sym_ok": nw > 0 and (t.count("#") + ell) / nw <= 0.1,
            "bullet_ok": nl == 0 or (nbl / nl <= 0.9 and nel / nl <= 0.3),
            "alpha_ok": nw > 0 and nal / nw >= 0.8,
            "stop_ok": sh >= 2,
        }

    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    got = {r["doc_id"]: r
           for r in gopher_quality_flags(df, "doc_id", "text").collect()}
    for i, t in enumerate(texts):
        want = ref(t)
        for k, v in want.items():
            assert got[i][k] == v, (k, repr(t), got[i][k], v)
        assert got[i]["keep"] == all(v for k, v in want.items()
                                     if k != "n_words")
