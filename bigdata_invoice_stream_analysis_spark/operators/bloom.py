"""DataFrame-native Bloom filter: build a bitmap from a key column as
a tiny aggregated table, broadcast it, and pre-filter a probe side
before an exact join.

Why not a collected sketch: building the filter as a DATAFRAME (word
index → 64-bit word, ≤ nbits/64 rows) keeps the whole pattern inside
the engine — the bitmap is produced by one hash-agg (``bit_or`` partial
aggregates map-side), broadcast like any dim table, and probed with
plain integer expressions in codegen. No driver collect, no UDF, no
serialized sketch object; the same shape works at any key cardinality
because the bitmap size is fixed by construction.

Semantics: membership testing has NO false negatives (a key that was
inserted always passes), so using ``might_contain`` as a PRE-filter
before an exact semi/left join never changes the join's result — it
only shrinks the expensive shuffle's probe side. False positives
(~(1-e^{-kn/m})^k) cost nothing but wasted probe rows.

This is the manually-expressed twin of Spark's internal runtime-filter
BloomFilterAggregate — expressed with public operators so the plan is
inspectable and the driver's DuckDB oracle can ignore it entirely (the
exact join downstream fixes any false positive).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_BITS_DEFAULT = 1 << 18  # 256 Kbit → 4096 longs ≈ 32 KB broadcast
SEEDS = (41, 97)  # k = 2 hash functions


def _position(col: Column, nbits: int, seed: int) -> Column:
    """Bit position of ``col`` for one hash function: xxhash64 with a
    per-function seed, folded into [0, nbits)."""
    return F.pmod(F.xxhash64(col, F.lit(seed)), F.lit(nbits))


def build_bitmap(keys: DataFrame, col: str, nbits: int = N_BITS_DEFAULT) -> DataFrame:
    """Aggregate a key column into a Bloom bitmap table
    (word_idx: long, bits: long) with one hash-agg: every key emits k
    (word, 1<<bit) pairs, ``bit_or`` folds them map-side. Output has at
    most nbits/64 rows — broadcastable at any input size."""
    pos = F.explode(
        F.array(*[_position(F.col(col), nbits, s) for s in SEEDS])
    ).alias("p")
    wm = keys.select(pos).select(
        F.shiftright(F.col("p"), 6).alias("word_idx"),
        # pyspark's shiftleft wrapper only takes a literal shift count;
        # the SQL function accepts a column — go through expr.
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").alias("mask"),
    )
    return wm.groupBy("word_idx").agg(F.bit_or("mask").alias("bits"))


def with_might_contain(
    probe: DataFrame,
    bitmap: DataFrame,
    col: str,
    nbits: int = N_BITS_DEFAULT,
    flag: str = "might_contain",
) -> DataFrame:
    """Append a boolean ``flag`` column: True iff every hash position of
    ``probe[col]`` is set in the bitmap (i.e. the key MIGHT be in the
    build set; False means definitely absent). One broadcast join per
    hash function, each on the 64-bit word index; a missing word row
    means those 64 bits are all zero."""
    out = probe
    checks = []
    for i, s in enumerate(SEEDS):
        p = _position(F.col(col), nbits, s)
        bm = F.broadcast(
            bitmap.select(
                F.col("word_idx").alias(f"_w{i}"), F.col("bits").alias(f"_b{i}")
            )
        )
        out = out.withColumn(f"_p{i}", p).join(
            bm, F.shiftright(F.col(f"_p{i}"), 6) == F.col(f"_w{i}"), "left"
        )
        checks.append(
            F.coalesce(F.col(f"_b{i}"), F.lit(0).cast("long"))
            .bitwiseAND(
                F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(_p{i} % 64 AS INT))")
            )
            != 0
        )
    cond = checks[0]
    for c in checks[1:]:
        cond = cond & c
    drop = [c for i in range(len(SEEDS)) for c in (f"_p{i}", f"_w{i}", f"_b{i}")]
    return out.withColumn(flag, cond).drop(*drop)
