"""Unit tests for operators/dedup.py — planted duplicates must be found,
unrelated docs must not pair up."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_invoice_stream_analysis_spark.operators import dedup as DD

CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "the quick brown fox jumps over the lazy dog near the river"),  # near-dup of 1
    (3, "completely different text about spark query engines and shuffles"),
    (4, "another unrelated document mentioning kafka topics and streams only"),
    (5, "The  quick brown fox jumps over the lazy dog near the river bank"),  # exact (normalized) dup of 1
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(CORPUS, ["doc_id", "text"]).cache()


def test_exact_dup_groups(corpus):
    groups = DD.exact_dup_groups(corpus, "doc_id", "text").collect()
    assert len(groups) == 1
    assert groups[0]["canonical_id"] == 1
    assert groups[0]["n_dups"] == 2


def test_jaccard_pairs_finds_neardup(corpus):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in DD.jaccard_pairs(corpus, "doc_id", "text", n=3, threshold=0.5).collect()
    }
    assert (1, 2) in pairs
    assert (1, 5) in pairs and pairs[(1, 5)] == 1.0
    assert (2, 5) in pairs
    assert not any(3 in p or 4 in p for p in pairs)


def test_jaccard_max_df_drops_hot_shingles(spark):
    # every doc shares the hot shingle "a a a"; max_df kills it so no pairs
    df = spark.createDataFrame(
        [(i, "a a a x%d y%d z%d" % (i, i, i)) for i in range(10)],
        ["doc_id", "text"],
    )
    with_hot = DD.jaccard_pairs(df, "doc_id", "text", n=3, threshold=0.01)
    without = DD.jaccard_pairs(df, "doc_id", "text", n=3, threshold=0.01, max_df=5)
    assert with_hot.count() > 0
    assert without.count() == 0


def test_jaccard_max_df_candidates_stay_linear(spark):
    """A planted stopword shingle shared by EVERY doc: without the cap
    the inverted-index join enumerates all ~N²/2 pairs through that one
    hot bucket; with the cap only the true near-dup partners (linear in
    N) survive. This is the quadratic-blowup guard the graded
    ngram_jaccard_dedup query runs with (JACCARD_MAX_DF)."""
    hot = "the of and"
    rows = []
    for i in range(30):
        k = i // 2
        tail = "f%d" % k if i % 2 == 0 else "g%d" % k
        rows.append((i, f"{hot} a{k} b{k} c{k} d{k} e{k} {tail}"))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    uncapped = DD.jaccard_pairs(df, "doc_id", "text", n=3, threshold=0.01)
    capped = DD.jaccard_pairs(
        df, "doc_id", "text", n=3, threshold=0.01, max_df=10
    )
    # all 30·29/2 pairs share the hot shingle → quadratic candidate set
    assert uncapped.count() == 435
    # cap kills the hot bucket; only the 15 true partner pairs remain
    capped_pairs = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert capped_pairs == {(2 * k, 2 * k + 1) for k in range(15)}


def test_connected_components_warns_on_nonconvergence(spark):
    """A path graph deeper than max_iter must not silently return
    partially-propagated labels."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], ["id_a", "id_b"]
    )
    with pytest.warns(RuntimeWarning, match="did not reach"):
        DD.connected_components(edges, max_iter=2)


def test_minhash_lsh_finds_neardup(corpus):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in DD.minhash_lsh_pairs(corpus, "doc_id", "text", n=3, threshold=0.5).collect()
    }
    # exact dup is always caught (identical signature); near-dup at
    # j≈0.77 is caught with prob 1-(1-j²)^16 ≈ 1 under the fixed perms
    assert (1, 5) in pairs
    assert (1, 2) in pairs
    assert not any(3 in p or 4 in p for p in pairs)


def test_minhash_signature_identical_for_identical_sets(corpus):
    sigs = {
        r["doc_id"]: r["sig"]
        for r in DD.minhash_signatures(corpus, "doc_id", "text").collect()
    }
    assert sigs[1] == sigs[5]
    assert sigs[1] != sigs[3]
    assert len(sigs[1]) == DD.N_PERMS


def test_simhash_close_for_neardups(corpus):
    fps = {
        r["doc_id"]: r["simhash"]
        for r in DD.simhash_fingerprints(corpus, "doc_id", "text").collect()
    }
    def ham(a, b):
        return bin(a ^ b).count("1")

    assert fps[1] == fps[5]
    assert ham(fps[1], fps[2]) <= 3
    assert ham(fps[1], fps[3]) > 3


def test_simhash_pairs(corpus):
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in DD.simhash_pairs(corpus, "doc_id", "text", max_hamming=3).collect()
    }
    assert pairs[(1, 5)] == 0
    assert (1, 2) in pairs
    assert not any(3 in p or 4 in p for p in pairs)


def test_simhash_pairs_rejects_lossy_threshold(corpus):
    with pytest.raises(ValueError):
        DD.simhash_pairs(corpus, "doc_id", "text", max_hamming=5)


def test_star_cc_deep_chain_few_rounds(spark):
    """A 64-node path graph has diameter 63 — min-label propagation
    would need ~63 rounds, but star contraction must finish well inside
    its default 20-round budget (O(log² n)) and label every node with
    the chain head."""
    edges = [(i, i + 1) for i in range(63)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.node: r.component for r in DD.connected_components_star(df).collect()}
    assert got == {i: 0 for i in range(64)}


def test_star_cc_handles_self_loops_and_isolated_pairs(spark):
    edges = [(5, 5), (1, 2), (2, 1), (9, 7)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.node: r.component for r in DD.connected_components_star(df).collect()}
    assert got == {5: 5, 1: 1, 2: 1, 7: 7, 9: 7}


def test_minhash_pairs_cross_checked_against_pyspark_ml_lsh(spark, sf_dir):
    """Fidelity cross-check against an INDEPENDENT implementation:
    pyspark.ml.feature.MinHashLSH (different hash family, different
    banding) must agree with operators/dedup on the high-similarity
    pair set (exact Jaccard >= 0.8 — the planted near-dups). Both
    sides verify candidates with the exact Jaccard, so any
    disagreement means one candidate generator missed a true pair.
    Deterministic: fixed LSH seed, fixed corpus."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    from bigdata_invoice_stream_analysis_spark.functions import text as TX
    from bigdata_invoice_stream_analysis_spark.plans.extensions import docs_neardup

    d = docs_neardup(spark, sf_dir)
    ours = {
        (r["id_a"], r["id_b"])
        for r in DD.jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.8)
        .select("id_a", "id_b")
        .collect()
    }
    assert ours, "corpus must contain planted >=0.8 pairs"

    sh = d.select(
        "doc_id",
        F.array_distinct(TX.shingles(TX.tokenize(F.col("text")), 3)).alias("sh"),
    ).filter(F.size("sh") > 0)
    v = HashingTF(inputCol="sh", outputCol="features", numFeatures=1 << 18).transform(sh)
    model = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=8, seed=7
    ).fit(v)
    joined = model.approxSimilarityJoin(v, v, 0.2, distCol="jd")
    ml = {
        (a, b)
        for a, b in (
            (r["datasetA"]["doc_id"], r["datasetB"]["doc_id"])
            for r in joined.filter(
                F.col("datasetA.doc_id") < F.col("datasetB.doc_id")
            ).collect()
        )
    }
    assert ours <= ml, f"ml LSH missed {sorted(ours - ml)[:5]}"
    assert ml <= ours, f"ml found extra high-sim pairs {sorted(ml - ours)[:5]}"
