"""Hashing expression helpers for dedup / fingerprinting / LSH.

All pure Catalyst expressions.  Where an operator must be oracle-checkable
against DuckDB, the hash must be engine-independent: ``md5`` is bit-stable
everywhere, and the polynomial rolling hash below is plain integer
arithmetic (mod 1e9+7, so every intermediate fits far below 2^63 — DuckDB
raises on BIGINT overflow, Spark wraps; staying small keeps both exact).
``xxhash64``/``hash`` are Spark-only and reserved for internal partitioning
(e.g. MinHash permutations), never for oracle-compared output.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MOD = 1_000_000_007
BASE = 31


def md5_bucket(col: Column | str) -> Column:
    """Stable 64-bit-ish bucket from md5 (first 15 hex digits → bigint).

    15 hex digits = 60 bits < 2^63, safe as signed bigint in both engines.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def token_code(tok: Column) -> Column:
    """Engine-independent numeric code for a token: md5 prefix mod 1e9+7."""
    return F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("bigint") % F.lit(MOD)


def rolling_hash(tokens_col: Column) -> Column:
    """Polynomial rolling hash over a token array (document fingerprint).

    h = fold(tokens, 0, (acc, t) -> (acc*BASE + code(t)) mod MOD).
    Intermediates stay < MOD*BASE + MOD < 2^63 — exact in both Spark and
    DuckDB, so the fingerprint is oracle-checkable.
    """
    return F.aggregate(
        tokens_col,
        F.lit(0).cast("bigint"),
        lambda acc, t: (acc * F.lit(BASE) + token_code(t)) % F.lit(MOD),
    )


def salt_to_int(salt: str) -> int:
    """Fold a salt string to a stable integer in [0, MOD) — driver-side,
    so expression mixers can embed it as a literal and oracle SQL builders
    can embed the identical value."""
    import hashlib

    return int(hashlib.md5(salt.encode()).hexdigest()[:15], 16) % MOD
