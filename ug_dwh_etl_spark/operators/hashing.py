"""Cross-engine deterministic hashing + tokenization primitives.

The dedup/fingerprint operators need hash functions that produce
IDENTICAL values in Spark and in the DuckDB oracle. Spark's xxhash64 and
DuckDB's hash() differ, so we build hashes from md5 (same algorithm, same
UTF-8 input, both engines) truncated to 32 or 60 bits:

- Spark:  conv(substr(md5(x), 1, k), 16, 10) :: BIGINT
- DuckDB: ('0x' || substr(md5(x), 1, k)) :: BIGINT

MinHash permutations are (a*h + b) mod P with P = 4294967311 (prime >
2^32) and a < 2^20, so a*h < 2^52 never overflows int64 — Spark 4 ANSI
mode makes silent overflow an error, and DuckDB would too.

Tokenization is normalized identically on both engines: lowercase, every
non-alphanumeric run → single space, trim, split on single space.
"""

from __future__ import annotations

import random

from pyspark.sql import Column
import pyspark.sql.functions as F

MINHASH_PRIME = 4294967311  # smallest prime > 2^32

# Fixed permutation constants (seeded, stable across engines/runs).
_rng = random.Random(2024)
MINHASH_COEFFS: list[tuple[int, int]] = [
    (_rng.randrange(1, 1 << 20) | 1, _rng.randrange(0, MINHASH_PRIME)) for _ in range(16)
]


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# --- Spark side -------------------------------------------------------------

def md5_long(col: Column | str, hex_digits: int = 15) -> Column:
    """First `hex_digits` hex chars of md5 as a non-negative BIGINT
    (15 digits = 60 bits; 8 digits = 32 bits)."""
    return F.conv(F.substring(F.md5(_c(col)), 1, hex_digits), 16, 10).cast("long")


def minhash_perm(hash_col: Column, i: int) -> Column:
    a, b = MINHASH_COEFFS[i]
    return (hash_col % MINHASH_PRIME * F.lit(a) + F.lit(b)) % F.lit(MINHASH_PRIME)


def tokens(col: Column | str) -> Column:
    """Normalized word tokens as array<string>."""
    norm = F.trim(F.regexp_replace(F.lower(_c(col)), "[^a-z0-9]+", " "))
    return F.when(norm == "", F.array().cast("array<string>")).otherwise(F.split(norm, " "))


def shingles(tokens_col: Column, n: int = 3) -> Column:
    """Word n-gram shingles as array<string> (empty if too few tokens).

    Built with a SQL lambda over ``sequence`` so the whole thing stays in
    codegen; guard keeps ``sequence`` ascending (ANSI-safe).
    """
    t = tokens_col
    return F.when(F.size(t) < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(t) - n),
            lambda i: F.concat_ws(" ", *[F.element_at(t, (i + j + 1).cast("int")) for j in range(n)]),
        )
    )


# --- DuckDB side (oracle SQL snippets, same semantics) ------------------------

def sql_md5_long(expr: str, hex_digits: int = 15) -> str:
    return f"('0x' || substr(md5({expr}), 1, {hex_digits}))::BIGINT"


def sql_minhash_perm(hash_expr: str, i: int) -> str:
    a, b = MINHASH_COEFFS[i]
    return f"(({hash_expr}) % {MINHASH_PRIME} * {a} + {b}) % {MINHASH_PRIME}"


def sql_tokens(expr: str) -> str:
    return (
        "CASE WHEN trim(regexp_replace(lower("
        + expr
        + "), '[^a-z0-9]+', ' ', 'g')) = '' THEN []::VARCHAR[] "
        "ELSE string_split(trim(regexp_replace(lower("
        + expr
        + "), '[^a-z0-9]+', ' ', 'g')), ' ') END"
    )


def sql_shingles(tokens_col: str, n: int = 3) -> str:
    """`tokens_col` must be a plain column name (use a CTE) so the DuckDB
    list_transform lambda can close over it."""
    parts = " || ' ' || ".join(f"{tokens_col}[i+{j}]" for j in range(n))
    return (
        f"CASE WHEN len({tokens_col}) < {n} THEN []::VARCHAR[] "
        f"ELSE list_transform(generate_series(1, len({tokens_col}) - {n - 1}), "
        f"i -> {parts}) END"
    )
