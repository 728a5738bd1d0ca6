"""Skew-resistant aggregation: two-phase salted groupBy.

AQE's skew-join splitting handles skewed JOINS; a skewed GROUP BY key
(one invoice/customer with millions of lines) still funnels one reducer.
Salting splits each key across ``n_salt`` reducers in phase 1 and merges
the partials in phase 2 — correct for any algebraic aggregate.

At 100 TB this is the difference between a stage pegged on one straggler
task and an even spread; phase-2 input is tiny (keys × n_salt rows).

Note Spark's partial aggregation already does map-side combining — the
salt matters when the skew survives partials (high-cardinality values
per key, e.g. collect-style or distinct-ish aggregates, or when a
single key's partials still swamp one reducer).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (phase-1 aggregate, phase-2 merge) per algebraic op.
_MERGES = {
    "sum": (F.sum, F.sum),
    "count": (lambda c: F.count(c), F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, Column | str]],
    n_salt: int = 16,
) -> DataFrame:
    """Two-phase aggregation over ``keys`` with a uniform random salt.

    aggs: {output_name: (op, column)} with op in sum|count|min|max.
    Non-algebraic aggregates (avg) decompose at the call site
    (sum + count, divide after) — the same rule streaming state follows.
    """
    unknown = {op for op, _ in aggs.values()} - set(_MERGES)
    if unknown:
        raise ValueError(f"non-algebraic ops not salt-safe: {sorted(unknown)}")
    salted = df.withColumn(
        "_salt", (F.rand(seed=42) * n_salt).cast("int")
    )
    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[
            _MERGES[op][0](col).alias(name)
            for name, (op, col) in aggs.items()
        ]
    )
    return phase1.groupBy(*keys).agg(
        *[
            _MERGES[op][1](name).alias(name)
            for name, (op, _) in aggs.items()
        ]
    )
