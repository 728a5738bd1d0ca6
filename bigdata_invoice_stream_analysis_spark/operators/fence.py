"""Optimizer fence: a Generate-based barrier against alias inlining.

Catalyst's CollapseProject / PushDownPredicates rewrite downstream
references to an aliased expression in terms of the expression itself.
For a cheap alias that is good (it enables pushdown); for an expensive
one referenced many times (a shingle/token hash array feeding 32 MinHash
permutations, a synthesized CSV line feeding five validation predicates)
it multiplies the work per row — in the worst case the expression lands
inside a join condition. Codegen subexpression elimination only
deduplicates textually identical trees within one operator, so it does
not save cross-operator inlining.

``optimizer_fence`` re-emits every column through a one-row generator
(``inline`` of a single-element struct array). Filters, projects, and
alias substitution cannot cross a Generate whose output they reference,
so everything upstream is computed exactly once per row. The generator
itself is a no-op at runtime (one struct wrap/unwrap per row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def optimizer_fence(df: DataFrame) -> DataFrame:
    return df.select(
        F.inline(F.array(F.struct(*[F.col(c) for c in df.columns])))
    )
