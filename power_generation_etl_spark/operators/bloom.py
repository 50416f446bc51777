"""Portable Bloom filter — broadcast-free membership pre-filtering.

A Bloom filter built from a key set (m bits, k hashes) answers "possibly
in the set" / "definitely not" with a false-positive rate of roughly
``(1 - e^(-k*n/m))^k``. At 100 TB the point is the *shape*: the filter is
an O(m)-bit driver constant compiled into the probe-side projection, so
pre-filtering a fact table against a dimension key set costs ZERO
shuffles and ZERO joins on the fact side — rows that can't match are
dropped inside the scan stage, and only survivors reach the (much
smaller) exact join. This is the engine-level equivalent of Spark's
runtime `bloomFilterJoin` / Parquet bloom indexes, expressed portably so
a DuckDB oracle can reproduce the exact candidate set bit-for-bit.

Portability: positions come from md5 slices (`hash48`, the same
primitive as the KMV sketch), and the bitmap packs into 48-bit words so
every mask stays positive — DuckDB's checked BIGINT `<<` would error on
a sign-bit shift, and signed-wrap semantics would be engine-specific.

The reference has no approximate structures; this extends the
beyond-reference sketch family (`operators/sketch.py`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from power_generation_etl_spark.operators.sketch import hash48

WORD_BITS = 48  # masks stay < 2^48: positive in BIGINT on both engines

def _pow2() -> Column:
    """Literal 2^b lookup, b ∈ [0, 48): replaces shift-by-column (the
    DataFrame shiftleft/shiftright take only Python-int shift amounts).
    Built lazily — Column literals need an active SparkContext."""
    return F.array(*[F.lit(1 << b).cast("bigint") for b in range(WORD_BITS)])


def bloom_position(col: Column, i: int, m: int) -> Column:
    """Bit position of hash function ``i`` for a key: 48-bit md5 slice of
    ``"{i}:{key}"`` mod m. Matches `bloom_position_sql` exactly."""
    return hash48(F.concat(F.lit(f"{i}:"), col.cast("string"))) % m


def bloom_position_sql(expr: str, i: int, m: int) -> str:
    """DuckDB twin of `bloom_position` (same md5 slice, same modulus)."""
    return (
        f"(CAST('0x' || substr(md5('{i}:' || CAST({expr} AS VARCHAR)), 1, 12)"
        f" AS BIGINT) % {m})"
    )


def build_bloom_words(
    df: DataFrame, key_col: str, *, m: int, k: int
) -> list[int]:
    """Build the filter from a key DataFrame and return it as
    ``m // WORD_BITS`` packed integer words (driver-side constant).

    The set-bit positions are computed distributed (one projection +
    one distinct on ≤ m values); only the ≤ m/48 packed words cross to
    the driver — bounded regardless of key count, like the k-means
    centroid constants (`operators/similarity.py`).
    """
    if m % WORD_BITS:
        raise ValueError(f"m must be a multiple of {WORD_BITS}")
    if not 1 <= k <= 8:
        raise ValueError("k must be in [1, 8]")
    key = F.col(key_col)
    pos = (
        df.where(key.isNotNull())
        .select(
            F.explode(
                F.array(*[bloom_position(key, i, m) for i in range(k)])
            ).alias("p")
        )
        .distinct()
    )
    # Positions are distinct, so sum of per-bit masks == bit_or. The
    # shift-by-column is a literal power-of-two lookup (shiftleft's
    # numBits argument must be a Python int in the DataFrame API).
    packed = (
        pos.groupBy((F.col("p") / WORD_BITS).cast("bigint").alias("w"))
        .agg(
            F.sum(
                F.element_at(_pow2(), (F.col("p") % WORD_BITS).cast("int") + F.lit(1))
            ).alias("mask")
        )
        .collect()
    )
    words = [0] * (m // WORD_BITS)
    for row in packed:
        words[int(row["w"])] = int(row["mask"])
    return words


def bloom_member_expr(col: Column, words: list[int], *, m: int, k: int) -> Column:
    """Codegen membership test against a literal packed bitmap: AND of k
    bit probes, each ``element_at(words, pos div 48 + 1) >> (pos % 48) & 1``.
    Pure projection — no join, no shuffle, whole-stage codegen."""
    lit_words = F.array(*[F.lit(w).cast("bigint") for w in words])
    probes = []
    for i in range(k):
        p = bloom_position(col, i, m)
        word = F.element_at(lit_words, (p / WORD_BITS).cast("int") + F.lit(1))
        # word < 2^48 and the divisor is a power of two, so the double
        # division is exact and the truncating cast recovers word >> b.
        pw = F.element_at(_pow2(), (p % WORD_BITS).cast("int") + F.lit(1))
        bit = (word / pw).cast("bigint") % 2
        probes.append(bit == 1)
    out = probes[0]
    for pr in probes[1:]:
        out = out & pr
    return out


def bloom_positions_py(value, m: int, k: int) -> list[int]:
    """Driver-side twin of `bloom_position` for probing a stored filter
    without a Spark job: identical md5-slice positions for the value's
    string form (Spark's string cast of BIGINT/VARCHAR matches Python
    str()). Test-asserted equal to the Column expression."""
    import hashlib

    s = str(value)
    return [
        int(hashlib.md5(f"{i}:{s}".encode()).hexdigest()[:12], 16) % m
        for i in range(k)
    ]


def words_contain(words: list[int], positions: list[int]) -> bool:
    """Probe packed words for ALL given bit positions (driver-side)."""
    return all(
        (words[p // WORD_BITS] >> (p % WORD_BITS)) & 1 for p in positions
    )
