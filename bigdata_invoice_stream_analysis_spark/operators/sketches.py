"""Count-min sketch (Cormode & Muthukrishnan 2005) as a relational
operator: d hash rows × w counters, built in ONE corpus pass as a
(row, col) hash aggregation. Point estimates are the min over the d
cells a key hashes to — always an over-count, never an under-count.

All hashing is exact integer arithmetic — hash_i(key) =
((A_i * key + B_i) mod P) mod w with fixed odd constants — so the
sketch (and therefore every estimate) is bit-identical across engines
and shuffle orders, and a DuckDB oracle can rebuild it exactly.

Scale story: the sketch is d*w counters regardless of corpus size —
the explode(d) pre-shuffle multiplies rows by d but partial (map-side)
aggregation collapses each partition to <= d*w cells before the
exchange, so the shuffle carries O(d*w*partitions) rows, not O(N).
This is the standard approximate-frequency path when exact per-key
counts don't fit (heavy-hitter detection over trillions of events).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CMS_P = 1_000_000_007
CMS_D = 4
CMS_W = 256
# Fixed (A, B) per hash row — arbitrary odd constants < P.
CMS_AB = [(31, 7), (131, 101), (1009, 997), (65537, 21)]


def cms_hash(key: Column, r: int) -> Column:
    """Hash row r's column index for ``key`` (BIGINT-exact)."""
    a, b = CMS_AB[r]
    return ((key * a + b) % CMS_P) % CMS_W


def sql_cms_hash(key_expr: str, r: int) -> str:
    a, b = CMS_AB[r]
    return f"((CAST({key_expr} AS BIGINT) * {a} + {b}) % {CMS_P}) % {CMS_W}"


def cms_cells(df: DataFrame, key_col: str) -> DataFrame:
    """Build the sketch: one row per non-empty (r, c) cell with its
    count. The d-way explode happens map-side; partial aggregation
    bounds the shuffle at d*w rows per input partition."""
    cells = F.array(
        *[
            F.struct(F.lit(r).alias("r"), cms_hash(F.col(key_col), r).alias("c"))
            for r in range(CMS_D)
        ]
    )
    return (
        df.select(F.explode(cells).alias("cell"))
        .groupBy(F.col("cell.r").alias("r"), F.col("cell.c").alias("c"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(keys: DataFrame, cells: DataFrame, key_col: str) -> DataFrame:
    """Point-estimate each key against a built sketch: min over its d
    cells. ``cells`` is at most d*w rows, so it broadcasts; the lookup
    is a broadcast join plus a per-key min — no corpus re-scan."""
    probes = keys.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"), cms_hash(F.col(key_col), r).alias("c")
                    )
                    for r in range(CMS_D)
                ]
            )
        ).alias("cell"),
    ).select(key_col, F.col("cell.r").alias("r"), F.col("cell.c").alias("c"))
    return (
        probes.join(F.broadcast(cells), ["r", "c"])
        .groupBy(key_col)
        .agg(F.min("cnt").alias("cms_est"))
    )
