"""Scoped-cache hygiene: queries that cache an expensive subtree must
register it for release, and release_caches() must actually free it —
the long-lived-session leak named in VERDICT r01 (What's wrong §3)."""

from __future__ import annotations

from bigdata_invoice_stream_analysis_spark import cache as C
from bigdata_invoice_stream_analysis_spark.plans.queries import QUERIES


def test_scoped_cache_registers_and_releases(spark, sf_dir):
    C.release_caches()  # clean slate (other tests may have registered)
    df = QUERIES["tfidf_top_terms"](spark, sf_dir)
    df.count()
    assert C._ACTIVE, "tfidf tf subtree should register a scoped cache"
    cached = list(C._ACTIVE)
    n = C.release_caches()
    assert n >= 1
    assert not C._ACTIVE
    for d in cached:
        assert d.storageLevel.useMemory is False, "unpersist did not take"


def test_dedup_queries_release_cleanly(spark, sf_dir):
    C.release_caches()
    QUERIES["minhash_lsh_dedup"](spark, sf_dir).count()
    assert C._ACTIVE
    C.release_caches()
    assert not C._ACTIVE
