"""BPE tokenizer: training order pinned against the worked example in
Sennrich, Haddow & Birch 2016 (Fig. 1 corpus), encode/decode round-trip
(hypothesis), distributed word-frequency parity, and model persistence.
"""

from __future__ import annotations

import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from helix_db_spark.operators.textstats import BPE_PRETOKEN_RE
from helix_db_spark.operators.tokenizer import (EOW, BpeModel, bpe_decode_col,
                                                bpe_encode, bpe_train,
                                                bpe_train_from_frequencies,
                                                word_frequencies)

# The Sennrich 2016 Fig. 1 word-frequency dictionary.
SENNRICH = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_sennrich_merge_order():
    """First merges over the paper's corpus under (freq DESC, lex ASC)
    tie-break: the paper's opening 'es' -> 'est' -> 'est</w>' sequence
    (each count 9) falls out exactly; the later ties (three pairs at
    count 6 after merge 5) resolve lexicographically, so ('e','w')
    precedes the paper's illustrative ('n','e') — same final
    segmentations, documented deterministic order."""
    m = bpe_train_from_frequencies(SENNRICH, num_merges=8)
    assert m.merges == (("e", "s"), ("es", "t"), ("est", EOW),
                        ("l", "o"), ("lo", "w"), ("e", "w"),
                        ("ew", "est</w>"), ("n", "ewest</w>"))


def test_sennrich_encode_segments():
    m = bpe_train_from_frequencies(SENNRICH, num_merges=10)
    assert m.merges[8:] == (("low", EOW), ("d", "est</w>"))
    assert m.encode_word("newest") == ("newest</w>",)
    assert m.encode_word("low") == ("low</w>",)
    # 'lowest' was never a training word: greedy lowest-rank inference
    # still lands on the trained subwords -> low + est</w>
    assert m.encode_word("lowest") == ("low", "est</w>")
    assert m.encode_word("widest") == ("w", "i", "dest</w>")
    # unseen characters stay single symbols, never crash
    assert m.encode_word("löw") == ("l", "ö", "w", EOW)


def test_incremental_counts_match_recount():
    """The inverted-index trainer must produce the same merges as a
    naive recount-every-iteration trainer (overlapping pairs like 'aaa'
    included)."""
    corpus = {"aaa": 4, "aaaa": 2, "abab": 3, "banana": 5, "low": 1}

    def naive(word_freq, n):
        from helix_db_spark.operators.tokenizer import _merge_word

        vocab = {tuple(w) + (EOW,): f for w, f in word_freq.items()}
        merges = []
        for _ in range(n):
            counts: dict = {}
            for syms, f in vocab.items():
                for p in zip(syms, syms[1:]):
                    counts[p] = counts.get(p, 0) + f
            if not counts:
                break
            best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            vocab = {_merge_word(s, best, best[0] + best[1]): f
                     for s, f in vocab.items()}
            merges.append(best)
        return tuple(merges)

    got = bpe_train_from_frequencies(corpus, num_merges=12).merges
    assert got == naive(corpus, 12)


@settings(max_examples=60, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
               max_size=80))
def test_roundtrip_property(text):
    """decode(encode(x)) == the space-joined pre-token stream, for any
    printable-ASCII text and a model trained on unrelated data."""
    m = bpe_train_from_frequencies(SENNRICH, num_merges=10)
    toks = m.encode_text(text)
    assert "".join(toks).replace(EOW, " ").strip() == \
        " ".join(re.findall(BPE_PRETOKEN_RE, text, flags=re.ASCII))
    # every emitted token ends a word iff it carries the EOW marker
    assert all(EOW not in t or t.endswith(EOW) for t in toks)


@pytest.mark.usefixtures("spark")
def test_distributed_train_encode_decode(spark, tmp_path):
    import pandas as pd

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .select("doc_id", "text").limit(200).cache()

    # distributed word frequencies == pandas recount
    wf = {r["word"]: r["freq"]
          for r in word_frequencies(docs).collect()}
    pdf = docs.toPandas()
    expect: dict = {}
    for t in pdf["text"]:
        for w in re.findall(BPE_PRETOKEN_RE, t or "", flags=re.ASCII):
            expect[w] = expect.get(w, 0) + 1
    assert wf == expect

    # the 200-doc synthetic corpus exhausts its pair space early: the
    # trainer must stop cleanly when every word is a single symbol
    model = bpe_train(docs, num_merges=200, max_words=5000)
    assert 50 < len(model.merges) <= 200

    enc = bpe_encode(docs, model, out_col="toks")
    out = enc.select("doc_id", "toks",
                     bpe_decode_col("toks").alias("rt")).toPandas()
    by_id = dict(zip(pdf["doc_id"], pdf["text"]))
    for _, row in out.iterrows():
        src = " ".join(re.findall(BPE_PRETOKEN_RE, by_id[row["doc_id"]], flags=re.ASCII))
        assert row["rt"] == src
        # spark-side encode == driver-side encode
    one = pdf.iloc[0]
    spark_toks = out[out["doc_id"] == one["doc_id"]]["toks"].iloc[0]
    assert list(spark_toks) == model.encode_text(one["text"])

    # persistence round-trip preserves merge order and encoding
    model.save(spark, str(tmp_path / "merges"))
    back = BpeModel.load(spark, str(tmp_path / "merges"))
    assert back.merges == model.merges


def test_word_frequencies_top_n_plan(spark):
    """max_words must compile to TakeOrderedAndProject (partial top-k),
    not a global Sort."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = word_frequencies(docs, max_words=100) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
