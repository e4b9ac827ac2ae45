"""Portable deterministic hashing — identical in Spark SQL and DuckDB.

The engine's seeded randomness (sampling coins, MinHash permutations,
SimHash shingle hashes, LSH hyperplanes) is re-expressed as pure
functions of md5 — the one hash both Spark and DuckDB implement
bit-identically — so every probabilistic operator is verifiable by an
external SQL oracle running the same expressions on the same input
(the driver's DuckDB gate, tools/check_contract.py).

Two layers:

- ``md5_int_sql``: SQL-text generator for an integer built from
  position-weighted hex digits of ``md5(arg)``. The text evaluates
  identically in Spark SQL and DuckDB (``md5``, ``substr``,
  ``position(x IN y)`` and integer arithmetic are common built-ins).
  Digits are capped at 15 (60 bits) so the value always fits signed
  BIGINT exactly in both engines — no overflow-wrapping divergence.
- ``md5_uniform`` / ``md5_randint``: the same construction evaluated
  in Python (hashlib) for driver-side constants (hash-family
  parameters, hyperplane components) that are then embedded as
  LITERALS into both the Spark plan and the oracle SQL — the two
  engines never re-derive them, so they agree by construction.

Performance note: md5 is a cryptographic hash, ~3-5x slower than
xxhash64 JVM-side. Operators that hash per-token/per-shingle accept a
``portable=False`` escape hatch that swaps in xxhash64 for production
runs where oracle verifiability is not needed; the distributed shape
(bucketing, banding, partitioning) is identical either way.
"""

from __future__ import annotations

import hashlib

_HEX = "0123456789abcdef"

#: Spark SQL == DuckDB: both print BIGINT/ints the same way inside
#: concat_ws, both implement md5 over UTF-8 bytes.


def md5_digits_sql(hex_sql: str, digits: int = 6, offset: int = 0) -> str:
    """SQL text for an unsigned ``4*digits``-bit integer from an
    ALREADY-computed 32-char md5 hex string (hex chars
    ``offset+1 .. offset+digits``, big-endian; distinct offsets give
    independent draws from one md5).

    Use this (with ``md5(...)`` materialized once in an enclosing
    projection / transform) wherever the hash feeds several digit
    extractions: the digit terms repeat ``hex_sql`` per hex char, and
    neither Spark's interpreted higher-order-function lambdas nor
    DuckDB CSE the md5 across terms — inlining ``md5(s)`` here costs
    ``digits`` md5 evaluations per value instead of one.

    ``digits`` <= 15 keeps the value < 2^60: exact in signed BIGINT
    arithmetic in Spark, DuckDB, and numpy int64 alike.
    """
    if not 1 <= digits <= 15:
        raise ValueError("digits must be in [1, 15] to stay BIGINT-exact")
    if not 0 <= offset <= 32 - digits:
        raise ValueError("offset+digits must fit the 32-char md5 hex string")
    # weights CAST to BIGINT: position() returns INT, and INT*INT
    # overflows under Spark ANSI for digits >= 7
    terms = " + ".join(
        f"(position(substr({hex_sql}, {offset + i + 1}, 1) IN '{_HEX}') - 1)"
        f" * CAST({16 ** (digits - 1 - i)} AS BIGINT)"
        for i in range(digits)
    )
    return f"({terms})"


def md5_digits_spark_sql(hex_sql: str, digits: int = 6, offset: int = 0) -> str:
    """Spark-only fast spelling of :func:`md5_digits_sql` — IDENTICAL
    value, one native call: ``conv(substr(hex, o+1, d), 16, 10)``
    instead of ``digits`` position-weighted substr/position terms
    inside interpreted lambdas (measured: the digit terms, not the md5
    itself, dominated portable-mode hashing cost). DuckDB has no
    ``conv``, so the oracle keeps the digit-term spelling; parity is
    asserted in tests/test_pipeline.py. ``digits`` <= 15 keeps the
    value < 2^60, exact in BIGINT, same bound as md5_digits_sql."""
    if not 1 <= digits <= 15:
        raise ValueError("digits must be in [1, 15] to stay BIGINT-exact")
    if not 0 <= offset <= 32 - digits:
        raise ValueError("offset+digits must fit the 32-char md5 hex string")
    return f"CAST(conv(substr({hex_sql}, {offset + 1}, {digits}), 16, 10) AS BIGINT)"


def md5_int_sql(arg_sql: str, digits: int = 6, offset: int = 0) -> str:
    """:func:`md5_digits_sql` with the md5 inlined — fine for one-shot
    scalar draws (sampling coins); prefer the two-step form for arrays
    or multi-extraction (see md5_digits_sql's note on repeated md5)."""
    return md5_digits_sql(f"md5({arg_sql})", digits, offset)


def md5_int(data: str, digits: int = 6, offset: int = 0) -> int:
    """Python (hashlib) evaluation of :func:`md5_int_sql` — same value
    the SQL text produces for the same string."""
    return int(
        hashlib.md5(data.encode("utf-8")).hexdigest()[offset : offset + digits], 16
    )


def md5_randint(tag: str, i: int, lo: int, hi: int, seed: int = 42) -> int:
    """Deterministic integer in ``[lo, hi)`` from ``(tag, seed, i)``.

    Driver-side only (constants embedded as literals); 15-digit draw so
    modulo bias over typical ranges is < 2^-28.
    """
    return lo + md5_int(f"{tag}:{seed}:{i}", 15) % (hi - lo)


def md5_uniform(tag: str, i: int, seed: int = 42) -> float:
    """Deterministic uniform in [-1, 1) from ``(tag, seed, i)`` — used
    for LSH hyperplane components (any symmetric component law gives a
    valid sign-LSH family; uniform keeps the constant embeddable as a
    short literal)."""
    return md5_int(f"{tag}:{seed}:{i}", 15) / float(16 ** 15) * 2.0 - 1.0
