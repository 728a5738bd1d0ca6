"""Scoped DataFrame caching.

``DataFrame.cache()`` registers the plan in Spark's CacheManager, which
holds a strong reference until an explicit ``unpersist()`` — so in a
long-lived session (a bench loop over every query, a notebook, the
driver's correctness runner) per-query caches accumulate executor
storage for the rest of the process. ``scoped_cache`` keeps the
within-query benefit (a CPU-heavy subtree shared by several downstream
branches materializes once per action) while tracking every cache it
creates, so ``release_caches()`` can free them the moment the query's
action completes.

Usage: operators/queries call ``scoped_cache(df)`` instead of
``df.cache()``; harnesses (bench.py, tests/test_oracle_parity.py) call
``release_caches()`` after each query's terminal action.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_ACTIVE: list[DataFrame] = []


def scoped_cache(df: DataFrame) -> DataFrame:
    """Cache ``df`` and register it for later bulk release."""
    df = df.cache()
    _ACTIVE.append(df)
    return df


def release_caches() -> int:
    """Unpersist every scoped cache created since the last release.
    Returns the number of frames released. Safe to call with a stopped
    session (errors are swallowed — the JVM cache died with it)."""
    n = 0
    while _ACTIVE:
        df = _ACTIVE.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    return n
