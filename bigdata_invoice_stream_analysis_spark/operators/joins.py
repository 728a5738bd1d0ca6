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
