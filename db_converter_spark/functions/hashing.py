"""Deterministic, engine-portable hashing primitives.

All content hashes are md5-derived so the SAME integer can be computed in
Spark (``conv(substr(md5(x),..),16,10)``) and in the DuckDB oracle
(hex-parse of ``md5(x)``) — the correctness gate compares values, so the two
engines must agree bit-for-bit. Spark's ``xxhash64``/``hash`` are NOT
portable to DuckDB; never use them in an oracle-checked query.

The reference identifies actions by md5 of the SQL text
(reference: dbccore/dbccore.py:941-951) — same idea, applied to data.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_i64(col: Column) -> Column:
    """First 15 hex chars of md5 → non-negative 60-bit BIGINT.

    15 nibbles keeps the value < 2^60 so both Spark's LongType and DuckDB's
    BIGINT hold it exactly (16 nibbles could overflow into the sign bit).
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def md5_i32(col: Column, *, offset: int = 1) -> Column:
    """8 hex chars of md5 starting at ``offset`` (1-based) → 32-bit value in a
    LongType. Different offsets (1, 9, 17, 25) give 4 independent 32-bit
    hash functions from one md5 — used by minhash permutations."""
    return F.conv(F.substring(F.md5(col), offset, 8), 16, 10).cast("long")


def minhash_hash(col: Column, a: int, b: int, prime: int = (1 << 61) - 1) -> Column:
    """Universal-hash permutation h(x) = (a*md5_32(x) + b) mod p over a
    Mersenne prime. With distinct (a, b) pairs this yields the classic
    minhash family; portable to the oracle because it is plain integer
    arithmetic over the md5-derived value."""
    return (F.lit(a) * md5_i32(col) + F.lit(b)) % F.lit(prime)


def duckdb_md5_i64(expr: str) -> str:
    """DuckDB SQL text computing the same value as :func:`md5_i64`."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def duckdb_md5_i32(expr: str, *, offset: int = 1) -> str:
    """DuckDB SQL text computing the same value as :func:`md5_i32`."""
    return f"(('0x' || substr(md5({expr}), {offset}, 8))::BIGINT)"


def duckdb_minhash_hash(expr: str, a: int, b: int, prime: int = (1 << 61) - 1) -> str:
    """DuckDB SQL text computing the same value as :func:`minhash_hash`."""
    return f"(({a} * {duckdb_md5_i32(expr)} + {b}) % {prime})"
