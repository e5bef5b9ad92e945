"""Text column functions: tokenization, shingles, deterministic hashes.

All built-in expressions. The tokenizer regex is deliberately simple and
documented so oracle SQL can reproduce it exactly
(DuckDB: regexp_split_to_array(lower(text), '[^a-z0-9]+')).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

TOKEN_SPLIT = "[^a-z0-9]+"


def tokens(text: Column) -> Column:
    """lower -> split on non-alphanumeric -> drop empties."""
    return F.filter(F.split(F.lower(text), TOKEN_SPLIT), lambda t: t != "")


def char_shingles(text: Column, n: int = 3) -> Column:
    """Distinct n-grams of the whitespace-normalized lowercase text.
    Texts shorter than n yield an empty array (guard: Spark's sequence()
    DESCENDS when start > stop, so an unguarded sequence would fabricate
    bogus indices)."""
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    last = F.length(norm) - F.lit(n - 1)
    idx = F.sequence(F.lit(1), last)
    grams = F.transform(idx, lambda i: norm.substr(i, F.lit(n)))
    return F.when(last >= 1, F.array_distinct(grams)) \
        .otherwise(F.array().cast("array<string>"))


def shingles_from_tokens(toks: Column, n: int = 2) -> Column:
    """Distinct word n-grams from an ALREADY-MATERIALIZED token array
    column. Callers must pass a real column (not an inline tokens(text)
    expression): higher-order functions block common-subexpression
    elimination, so an inline expression would re-run the tokenizer regex
    once per shingle (~50x slowdown measured)."""
    last = F.size(toks) - F.lit(n)
    idx = F.sequence(F.lit(0), last)
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    return F.when(last >= 0, F.array_distinct(grams)) \
        .otherwise(F.array().cast("array<string>"))


def token_shingles(text: Column, n: int = 2) -> Column:
    """Distinct word n-grams; fewer than n tokens => empty array.
    Prefer tokens() into a materialized column + shingles_from_tokens()
    in hot paths (see that function's note)."""
    return shingles_from_tokens(tokens(text), n)


def shingle_rows(df: DataFrame, id_col: str, text_col: str,
                 n: int = 3, distinct: bool = True,
                 max_tokens: int | None = None) -> DataFrame:
    """Word n-gram rows (id, _s) — the hot-path shingle shape (DISTINCT per
    doc unless ``distinct=False``; pass False when the consumer is
    idempotent over duplicates, e.g. a min-aggregate, to skip a shuffle).

    posexplode evaluates the tokenizer ONCE per document (generators do
    not re-evaluate their child), then window lead() assembles n-grams.

    An array formulation (slice+concat_ws per row, one explode — the
    winnow_fingerprints shape) was MEASURED AND REJECTED here (r5):
    under honest full work (cache cleared per rep) the window version
    wins — minhash pairs 2.37s vs 2.8-3.1s, ngram jaccard 1.93s vs
    2.7-3.0s at sf0.1. The window's exchange on the doc id is NOT an
    extra shuffle for the main consumers: minhash's signature groupBy
    and the per-doc set collection reuse the same hash partitioning,
    while the array form pays the same downstream shuffle PLUS the
    per-row array build (O(tokens x n) string copying inside one task).
    The count-only explode microbenchmark shows the opposite (0.71 vs
    1.05s) — it omits the downstream aggregate that amortizes the
    window's sort; don't re-swap based on it.

    ``max_tokens`` is a straggler bound for pathological documents: one
    10 MB doc otherwise explodes to ~2M (doc, token) rows in a SINGLE
    window/groupBy group — a per-key straggler no partitioning fixes. It
    is a documented quality knob (like winnowing's max_df): docs are
    compared on their first ``max_tokens`` tokens only.
    """
    toks = df.select(F.col(id_col),
                     F.posexplode(tokens(F.col(text_col))).alias("_p", "_t"))
    if max_tokens is not None:
        toks = toks.filter(F.col("_p") < max_tokens)
    w = Window.partitionBy(id_col).orderBy("_p")
    parts = [F.col("_t")] + [F.lead("_t", k).over(w) for k in range(1, n)]
    last = parts[-1]
    sh = toks.select(F.col(id_col),
                     F.concat_ws(" ", *parts).alias("_s"),
                     last.isNotNull().alias("_ok"))
    out = sh.filter("_ok").drop("_ok")
    return out.dropDuplicates([id_col, "_s"]) if distinct else out


def md5_long(col: Column) -> Column:
    """Deterministic 60-bit hash from md5 — reproducible in DuckDB as
    CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10) \
        .cast("long")


def md5_long32(col: Column) -> Column:
    """32-bit md5-derived hash: safe to multiply by 31-bit constants without
    long overflow (ANSI mode). DuckDB: CAST(('0x' || substr(md5(x), 1, 8))
    AS BIGINT)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10) \
        .cast("long")


def bucket_col(col: Column, n_buckets: int) -> Column:
    """Deterministic bucket id for on-disk index layouts (md5-derived, so
    any engine — and driver-side Python via bucket_id() — computes the
    same bucket for the same value). Used as a parquet partition column:
    a probe that knows its keys filters to their buckets and partition
    pruning skips every other directory."""
    return md5_long32(col) % F.lit(n_buckets)


def bucket_id(value, n_buckets: int) -> int:
    """Driver-side replica of bucket_col() for probe planning."""
    import hashlib

    return int(hashlib.md5(str(value).encode()).hexdigest()[:8],
               16) % n_buckets


