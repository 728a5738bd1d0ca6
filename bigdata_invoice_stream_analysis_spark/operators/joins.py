"""As-of (point-in-time) join — an operator the DataFrame API lacks as
a primitive, rebuilt Spark-first (the reference has no joins at all,
SURVEY.md §2.7; this is a north-star relational extension).

Semantics: for each left row, attach the payload of the single right
row with the same key whose timestamp is the greatest one at-or-before
(``strict=False``) / strictly-before (``strict=True``) the left row's
timestamp. Ties among right rows on the timestamp are broken by a
caller-supplied ``tiebreak`` column (max wins) so the result is fully
deterministic.

Plan shape (why this scales): instead of the naive
``left JOIN right ON key AND r_ts <= l_ts`` (a per-key cross product,
quadratic in events-per-key) the implementation unions the tagged
inputs and computes ``last(payload, ignorenulls=True)`` over a running
row window ordered by ``(ts, side, tiebreak)`` within each key. That
is ONE hash shuffle of left+right keyed by the join key followed by a
per-partition sort — the same cost as a sort-merge join, with no
intermediate blowup. 100 TB posture: the shuffle carries only the key,
the ordering columns, and the requested right payload; skewed keys are
handled by AQE the same as any windowed aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    *,
    strict: bool = True,
    tiebreak: str | None = None,
) -> DataFrame:
    """Point-in-time backward as-of join.

    Returns every left row with ``right_cols`` attached (null when the
    key has no earlier right row — filter on any right col for inner
    semantics). ``right_cols`` must not collide with left columns.
    """
    r_struct_type = T.StructType([right.schema[c] for c in right_cols])
    l_struct_type = T.StructType([left.schema[c] for c in left.columns])
    tb = tiebreak or right_cols[0]
    tb_type = right.schema[tb].dataType

    # Side ordering at equal timestamps decides strictness: with the
    # left row sorted first, the running window stops BEFORE a
    # same-timestamp right row (strict <); sorted last, it includes it.
    l_ord, r_ord = (0, 1) if strict else (1, 0)

    l_tagged = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(l_ord).alias("__ord"),
        F.lit(None).cast(tb_type).alias("__tb"),
        F.lit(None).cast(r_struct_type).alias("__r"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
    )
    r_tagged = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(r_ord).alias("__ord"),
        F.col(tb).alias("__tb"),
        F.struct(*[F.col(c) for c in right_cols]).alias("__r"),
        F.lit(None).cast(l_struct_type).alias("__l"),
    )

    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__ord", "__tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("__r", ignorenulls=True).over(w)

    return (
        l_tagged.unionAll(r_tagged)
        .select("__l", matched.alias("__m"))
        .filter(F.col("__l").isNotNull())
        .select("__l.*", *[F.col(f"__m.{c}").alias(c) for c in right_cols])
    )


def merge_upsert(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    op_col: str = "op",
) -> DataFrame:
    """MERGE INTO semantics (upsert + delete apply) on plain
    DataFrames — the CDC write path a lakehouse table format runs
    under the hood, expressed as its relational core so the engine
    works without Delta/Iceberg in the container:

      * change op 'D'  → row removed,
      * 'U' / 'I'      → change row's payload wins (insert-or-replace),
      * no change      → base row passes through.

    Implemented as ONE full-outer equi-join on the key: unmatched base
    rows flow through, unmatched 'I' rows append, matched rows resolve
    by op. That is the textbook shuffle shape for MERGE — at 100 TB
    both sides hash-partition on the key once (zero-Exchange when base
    is bucketed on the key, `sources.tables.write_bucketed`), and the
    rewrite is bounded by the touched partitions under dynamic
    partition overwrite. Changes must be 1-row-per-key (pre-compacted
    CDC, e.g. latest_event_per_user's keep-latest); a duplicate-key
    change feed fails loudly at execution time (like Delta/Iceberg's
    multiple-matches error) instead of silently fanning base rows out
    through the join — enforced by an in-plan ``raise_error`` guarded
    on a per-key window count, which Catalyst cannot prune because it
    feeds the op resolution itself.

    Returns base's columns; payload columns present in both sides are
    taken from the winning side.
    """
    payload = [c for c in base.columns if c != key]
    b = base.select(F.col(key), *[F.col(c).alias(f"__b_{c}") for c in payload])
    c = changes.select(
        F.col(key),
        F.col(op_col).alias("__op"),
        *[F.col(x).alias(f"__c_{x}") for x in payload if x in changes.columns],
    )
    # Per-key multiplicity on the change feed; shuffles on the same key
    # as the merge join so the exchange is shared, and the guard rides
    # the op column so every downstream use (filter + payload pick)
    # trips it before a duplicate can corrupt the merged table.
    c = c.withColumn("__n", F.count("*").over(Window.partitionBy(key)))
    op_checked = F.when(
        F.col("__n") > 1,
        F.raise_error(
            F.concat(
                F.lit("merge_upsert: multiple change rows for key "),
                F.col(key).cast("string"),
                F.lit(" — pre-compact the CDC feed (keep-latest per key)"),
            )
        ).cast("string"),
    ).otherwise(F.col("__op"))
    c = c.withColumn("__op", op_checked).drop("__n")
    j = b.join(c, key, "full_outer")
    kept = j.filter(F.col("__op").isNull() | (F.col("__op") != "D"))
    cols = [F.col(key)]
    for x in payload:
        if f"__c_{x}" in c.columns:
            cols.append(
                F.when(F.col("__op").isin("U", "I"), F.col(f"__c_{x}"))
                .otherwise(F.col(f"__b_{x}"))
                .alias(x)
            )
        else:
            cols.append(F.col(f"__b_{x}").alias(x))
    return kept.select(*cols)
