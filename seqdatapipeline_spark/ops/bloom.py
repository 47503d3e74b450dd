"""Bloom-filter semi-join reduction, built from native expressions.

The scale problem: a selective join against a dim table still shuffles
the ENTIRE fact side when the dim is too big to broadcast outright.
Spark's own runtime row-group filters cover some cases; this operator
makes the technique explicit and portable: build a compact bitset over
the dim keys (kilobytes for millions of keys), ship it as a literal,
and pre-filter the fact scan so only candidate rows ever reach the
shuffle. False positives are harmless — the exact join behind the
filter removes them; false negatives are impossible.

Everything is codegen-friendly: hashing is md5-derived (engine-
portable, deterministic — the same bits an oracle can replay), the
bitset is built with one explode + bit_or aggregation, and the probe
is element_at + bitwise AND on a literal array. The only driver-side
materialization is the bitset itself (m_bits/64 longs — model-sized,
like a broadcast variable or the IVF centroid matrix).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _pos_sql(key_sql: str, j: int, m_bits: int, hash_fn: str = "md5") -> str:
    """SQL for bit position j of a key. ``hash_fn='md5'``: 56-bit md5
    slice of ``key || ':' || j`` — portable across engines, the form an
    oracle can replay. ``hash_fn='xxhash64'``: seeded single-pass hash
    — ~10x cheaper per row, Spark-only; the production default when no
    cross-engine parity is needed."""
    if hash_fn == "xxhash64":
        return f"pmod(xxhash64(CAST({key_sql} AS STRING), {j}), {m_bits})"
    return (
        f"pmod(CAST(conv(substring(md5(concat(CAST({key_sql} AS STRING), ':{j}')), 1, 14), 16, 10) "
        f"AS BIGINT), {m_bits})"
    )


def build_bloom(
    dim: DataFrame, key_col: str, m_bits: int = 1 << 16, k_hashes: int = 5,
    hash_fn: str = "md5",
) -> list[int]:
    """Aggregate the dim keys into a Bloom bitset: explode each key's
    k bit positions, group by 64-bit word index, OR the bits — one
    map-side-combinable shuffle over (word, bits) pairs, then a
    collect of at most m_bits/64 longs. Size for ~1% false positives
    with m_bits ≈ 10 × n_keys and k_hashes = 7 (or 5 at ~2%)."""
    pos_arr = "array(" + ", ".join(
        _pos_sql(key_col, j, m_bits, hash_fn) for j in range(k_hashes)
    ) + ")"
    words = (
        dim.select(F.explode(F.expr(pos_arr)).alias("pos"))
        .select(
            (F.col("pos") / 64).cast("long").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("bits"),
        )
        .groupBy("word")
        .agg(F.bit_or("bits").alias("bits"))
        .collect()
    )
    bitset = [0] * ((m_bits + 63) // 64)
    for r in words:
        bitset[r.word] = r.bits
    return bitset


def might_contain(
    key_sql: str, bitset: list[int], m_bits: int, k_hashes: int,
    hash_fn: str = "md5",
) -> Column:
    """Codegen probe: every one of the key's k bit positions must be
    set in the literal bitset array (element_at is 1-indexed)."""
    arr = "array(" + ", ".join(f"CAST({w} AS BIGINT)" for w in bitset) + ")"
    conds = []
    for j in range(k_hashes):
        p = _pos_sql(key_sql, j, m_bits, hash_fn)
        conds.append(
            f"(element_at({arr}, CAST({p} DIV 64 AS INT) + 1) & "
            f"shiftleft(CAST(1 AS BIGINT), CAST({p} % 64 AS INT))) != 0"
        )
    return F.expr(" AND ".join(conds))


def bloom_semi_reduce(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    m_bits: int = 1 << 16,
    k_hashes: int = 5,
    hash_fn: str = "md5",
) -> DataFrame:
    """Pre-filter ``fact`` to rows whose join key might match ``dim``,
    then the caller joins exactly. Identical join results (the exact
    join culls false positives); the shuffle sees only the surviving
    fraction. Use when dim is too large to broadcast but its key set
    compresses to kilobytes of bitset."""
    bitset = build_bloom(dim, on, m_bits, k_hashes, hash_fn)
    return fact.filter(might_contain(on, bitset, m_bits, k_hashes, hash_fn))
