"""Text-analysis primitives for the LLM-data-pipeline surface
(BASELINE.json north star): tokenization, shingling, portable hashing,
minhash/simhash building blocks, fingerprints, quality features.

Everything is built-in higher-order functions (JVM-side, codegen) — no
Python in the hot path.  The one pandas_udf here exists to cover the
Arrow-vectorized UDF surface (SURVEY.md §2.2 UDF row) and is deliberately
equivalent to the native ``n_tokens`` expression.

Hashing note: minhash/simhash need a hash that the DuckDB oracle can
reproduce bit-for-bit.  We standardize on md5 hex (identical in Spark,
DuckDB, and any warehouse) and derive integers from hex prefixes —
lexicographic order on fixed-width hex == numeric order, so "min over hex
string" is a valid minhash without any engine-specific integer hashing.
At cluster scale you would swap md5 for xxhash64 (cheaper); the operator
shapes are hash-agnostic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(text: Column | str) -> Column:
    """Canonical tokenization: trim, split on single spaces.

    The documents table is space-separated tokens with occasional trailing
    whitespace (FIXTURES.md §4); trim-then-split is reproducible in every
    engine (DuckDB: string_split(trim(text), ' ')).
    """
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), " ")


def n_tokens(text: Column | str) -> Column:
    return F.size(tokens(text))


def shingles(toks: Column, k: int = 3) -> Column:
    """k-token shingles (n-grams) as strings; [] when doc shorter than k."""
    return F.when(F.size(toks) < k, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - k),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
        )
    )


def seeded_md5(col: Column, seed: int) -> Column:
    """Portable seeded hash: md5(seed || '|' || value), hex string."""
    return F.md5(F.concat_ws("|", F.lit(str(seed)), col))


def minhash_signature(items: Column, n_perm: int) -> Column:
    """MinHash signature: per seed, min seeded-md5 over the item set.

    Returns array<string> of length n_perm ([] items → nulls).  min over
    fixed-width hex == numeric minhash; collision behavior matches the
    classic scheme.  Scales as a single projection — no shuffle.
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_perm - 1)),
        lambda s: F.array_min(
            F.transform(items, lambda x: F.md5(F.concat_ws("|", s.cast("string"), x)))
        ),
    )


def hex4_to_int(hex_col: Column) -> Column:
    """First 4 hex chars → int 0..65535 (portable: DuckDB uses strpos math)."""
    return F.conv(F.substring(hex_col, 1, 4), 16, 10).cast("bigint")


def token_fingerprint(text: Column | str) -> Column:
    """Document fingerprint: min token hash (1-perm minhash) — a cheap,
    order-insensitive content id for clustering/sharding."""
    return F.array_min(F.transform(tokens(text), lambda t: F.md5(t)))


def char_len(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.length(F.trim(c))


def type_token_ratio(toks: Column) -> Column:
    """Distinct-token ratio — a classic quality feature."""
    return F.size(F.array_distinct(toks)) / F.size(toks)


def mean_token_len(toks: Column) -> Column:
    return F.aggregate(
        toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)
    ) / F.size(toks)


def quality_score(toks: Column) -> Column:
    """Deterministic quality score in [0,1]: blend of type-token ratio and
    capped mean token length.  The blend is arbitrary but stable — the point
    is the operator shape (pure projection, no shuffle)."""
    ttr = type_token_ratio(toks)
    mtl = F.least(mean_token_len(toks) / F.lit(10.0), F.lit(1.0))
    return F.round(ttr * 0.5 + mtl * 0.5, 4)


def pandas_token_count():
    """Arrow-vectorized UDF equivalent of n_tokens() — exercises the
    pandas_udf surface (SURVEY.md §2.2 UDF row).  Prefer n_tokens() in
    production plans; this exists to prove the slow path is wired."""
    import pandas as pd  # noqa: F401 — needed for the UDF type hints
    from pyspark.sql.functions import pandas_udf

    def _count(s):
        return s.str.strip().str.split(" ").str.len().astype("int32")

    return pandas_udf(_count, "int")
