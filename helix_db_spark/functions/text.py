"""Text column functions: tokenization, shingles, deterministic hashes.

All built-in expressions. The tokenizer regex is deliberately simple and
documented so oracle SQL can reproduce it exactly
(DuckDB: regexp_split_to_array(lower(text), '[^a-z0-9]+')).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT = "[^a-z0-9]+"


def tokens(text: Column) -> Column:
    """lower -> split on non-alphanumeric -> drop empties."""
    return F.filter(F.split(F.lower(text), TOKEN_SPLIT), lambda t: t != "")


def char_shingles(text: Column, n: int = 3) -> Column:
    """Distinct n-grams of the whitespace-normalized lowercase text."""
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    idx = F.sequence(F.lit(1), F.greatest(F.length(norm) - F.lit(n - 1), F.lit(0)))
    return F.array_distinct(F.transform(idx, lambda i: norm.substr(i, F.lit(n))))


def token_shingles(text: Column, n: int = 2) -> Column:
    """Distinct word n-grams."""
    toks = tokens(text)
    cnt = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(cnt - F.lit(n), F.lit(-1)))
    return F.array_distinct(F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))))


def md5_long(col: Column) -> Column:
    """Deterministic 60-bit hash from md5 — reproducible in DuckDB as
    CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10) \
        .cast("long")


def minhash_value(col: Column, a: int, b: int,
                  prime: int = (1 << 61) - 1) -> Column:
    """One universal-hash permutation of md5_long(col)."""
    return (md5_long(col) * F.lit(a) + F.lit(b)) % F.lit(prime)
