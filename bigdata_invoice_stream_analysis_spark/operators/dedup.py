"""Deduplication operators for the training-data pipeline extensions:
exact (content-hash groupBy), n-gram Jaccard (inverted-index self-join),
MinHash + LSH banding, and SimHash with block-candidate generation.
(Embedding-cosine near-dup lives in operators/similarity.py.)

The reference has no dedup of any kind (SURVEY.md §2.12); these are the
north-star extensions (BASELINE.json) built Spark-first.

Scale design (the 100 TB posture)
---------------------------------
* Exact dedup: one hash-shuffle on the content fingerprint — the
  minimum possible; AQE handles skew from pathological duplicate
  explosions.
* Jaccard via inverted index: explode distinct shingles → self-join on
  shingle hash → per-pair intersection counts. The shuffle is keyed by
  shingle hash; hot shingles (stopword-ish n-grams) create quadratic
  pair blowup, so ``max_df`` drops shingles whose document frequency
  exceeds a cap — the standard prefix-filtering degenerate. Joins and
  aggs all run as native hash joins/aggs under AQE.
* MinHash+LSH: per-doc signature is a pure per-row expression (no
  shuffle); candidate generation shuffles only (band_key) pairs —
  O(docs × bands) rows, independent of pair count; verification joins
  shingle sets back by doc id. This is the scalable path: candidate
  count ≈ true-positive count at a well-chosen (bands, rows) operating
  point.
* SimHash: per-row 32-bit fingerprint; candidates via 4×8-bit block
  equality (pigeonhole: hamming ≤ 3 ⇒ ≥ 1 identical block), verified
  with exact popcount. One shuffle keyed by (block_idx, block_value).

Every hash here is exact integer arithmetic (functions/text.poly_hash)
so DuckDB oracles reproduce results bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bigdata_invoice_stream_analysis_spark.cache import scoped_cache
from bigdata_invoice_stream_analysis_spark.functions.text import (
    HASH_P,
    fingerprint,
    shingle_hashes,
)

# ---------------------------------------------------------------------------
# MinHash permutation family: h_i(x) = (a_i·x + b_i) mod p over the
# shingle poly-hash. Constants from a fixed LCG so the DuckDB oracle can
# embed the identical literals (lcg seed 42, glibc multiplier).
# ---------------------------------------------------------------------------

N_PERMS = 32
N_BANDS = 16
ROWS_PER_BAND = N_PERMS // N_BANDS  # 2


def _lcg_constants(n: int = N_PERMS, seed: int = 42) -> tuple[list[int], list[int]]:
    x = seed
    a_list, b_list = [], []
    for _ in range(n):
        x = (1103515245 * x + 12345) % (1 << 31)
        a_list.append((x % (HASH_P - 1)) + 1)
        x = (1103515245 * x + 12345) % (1 << 31)
        b_list.append(x % HASH_P)
    return a_list, b_list


MINHASH_A, MINHASH_B = _lcg_constants()


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """Exact row dedup — dropDuplicates (hash shuffle on the subset)."""
    return df.dropDuplicates(subset) if subset else df.dropDuplicates()


def exact_dup_groups(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Content-hash duplicate groups: token-normalized fingerprint →
    groups with >1 member. Output: (fingerprint, canonical_id = min id,
    n_dups). One hash-aggregate shuffle on the fingerprint."""
    fp = df.select(
        F.col(id_col).alias("doc_id"), fingerprint(F.col(text_col)).alias("fp")
    )
    return (
        fp.groupBy("fp")
        .agg(
            F.min("doc_id").alias("canonical_id"),
            F.count("*").alias("n_dups"),
        )
        .filter(F.col("n_dups") > 1)
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, inverted index)
# ---------------------------------------------------------------------------

def _shingled(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    # Shingling + hashing is the CPU-heavy map stage; spread an
    # under-parallel scan (one-row-group local files) across cores.
    from bigdata_invoice_stream_analysis_spark.sources.tables import ensure_min_parallelism

    df = ensure_min_parallelism(df, df.sparkSession)
    return df.select(
        F.col(id_col).alias("doc_id"),
        shingle_hashes(F.col(text_col), n).alias("sh"),
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.2,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (id_a < id_b, jaccard ≥ t).

    Plan: distinct-shingle explode → (optional hot-shingle drop via
    ``max_df``) → self-join on shingle hash → count shared shingles per
    pair → join per-doc set sizes → |∩| / (|A|+|B|-|∩|) ≥ t.
    """
    sh = scoped_cache(_shingled(df, id_col, text_col, n))
    sizes = sh.select("doc_id", F.size("sh").alias("n_sh"))
    inv = sh.select("doc_id", F.explode("sh").alias("h"))
    if max_df is not None:
        hot = (
            inv.groupBy("h").agg(F.count("*").alias("df_h"))
            .filter(F.col("df_h") > max_df)
            .select("h")
        )
        inv = inv.join(hot, "h", "left_anti")
    a = inv.alias("a")
    b = inv.alias("b")
    inter = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    j = (
        inter.join(sizes.withColumnsRenamed({"doc_id": "id_a", "n_sh": "n_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"doc_id": "id_b", "n_sh": "n_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.col("n_inter")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
        )
    )
    return j.filter(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", "jaccard"
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signature(sh: Column) -> Column:
    """K-perm MinHash signature (array<long>) of a shingle-hash array.
    Pure per-row expression — scales with zero shuffle.

    Single traversal (same trick as simhash): ONE fold walks the
    shingle array carrying all 32 running minima (zip_with least per
    element), instead of 32 independent transform+array_min passes.
    Identical minima, but the generated code walks the array once and
    the expression tree is ~half the nodes — which also halves the
    one-time codegen/JIT cost that a session's first MinHash query
    pays. Init is HASH_P: strictly greater than any permuted value
    (all values are mod p), so it never survives a non-empty array;
    _shingled guarantees >= 1 shingle per doc."""
    init = F.array_repeat(F.lit(HASH_P).cast("long"), N_PERMS)
    # Permutation constants as ONE literal array of (a, b) structs: the
    # expression tree is O(1) in N_PERMS (vs 32 inlined sub-trees),
    # which keeps the generated code far below the JIT huge-method
    # cliff.
    ab = F.array(
        *[
            F.struct(F.lit(a).alias("a"), F.lit(b).alias("b"))
            for a, b in zip(MINHASH_A, MINHASH_B)
        ]
    )

    def permuted_all(h: Column) -> Column:
        return F.transform(ab, lambda s: (s["a"] * h + s["b"]) % HASH_P)

    return F.aggregate(
        sh,
        init,
        lambda acc, h: F.zip_with(acc, permuted_all(h), lambda x, y: F.least(x, y)),
    )


def minhash_signature_np():
    """Arrow-vectorized MinHash signature: one numpy broadcast
    ``(A·h + B) mod p`` + row min per document, replacing 32 interpreted
    higher-order ``transform`` passes. Bit-identical integer math to
    ``minhash_signature`` (products < 2^60 fit int64). Measured SLOWER
    than the fenced column-expression path at 5k docs (Python worker +
    Arrow transfer overhead dominates), so it is opt-in — kept as the
    pattern for much larger per-row payloads. Returns the pandas UDF."""
    from pyspark.sql.functions import pandas_udf

    A = np.asarray(MINHASH_A, dtype=np.int64)[:, None]
    B = np.asarray(MINHASH_B, dtype=np.int64)[:, None]

    @pandas_udf("array<long>")
    def _sig(sh: pd.Series) -> pd.Series:
        out = []
        for arr in sh:
            h = np.asarray(arr, dtype=np.int64)[None, :]
            if h.size == 0:
                # parity with array_min(empty) = NULL per permutation
                out.append([None] * N_PERMS)
            else:
                out.append(((A * h + B) % HASH_P).min(axis=1).tolist())
        return pd.Series(out)

    return _sig


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, use_arrow: bool = False
) -> DataFrame:
    from bigdata_invoice_stream_analysis_spark.operators.fence import optimizer_fence

    # Fence the shingle array: without it CollapseProject inlines the
    # shingling expression into each of the N_PERMS array_min/transform
    # references — re-tokenizing every document 32×.
    sh = optimizer_fence(_shingled(df, id_col, text_col, n))
    sig = minhash_signature_np()(F.col("sh")) if use_arrow else minhash_signature(F.col("sh"))
    return sh.select("doc_id", "sh", sig.alias("sig"))


def band_keys(sig: Column) -> Column:
    """LSH band keys: bands of ROWS_PER_BAND signature values packed
    into one long each (band index folded in so bands don't collide
    across positions). With r=2 and values < p ≈ 2^30, the packed key
    band·p² + s0·p + s1 stays < 16·2^60 — overflow-free in int64? No:
    p² ≈ 2^60, 16·2^60 = 2^64 — so fold the band index by addition
    after a mod instead: key = ((s0·p + s1) mod 2^61) ·16 + band is
    still too wide. Use a string key — exact, collision-free, and
    cross-engine."""
    parts = []
    for band in range(N_BANDS):
        vals = [
            sig[band * ROWS_PER_BAND + r].cast("string")
            for r in range(ROWS_PER_BAND)
        ]
        parts.append(F.concat_ws(":", F.lit(str(band)), *vals))
    return F.array(*parts)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.2,
    use_arrow: bool = False,
) -> DataFrame:
    """MinHash-LSH near-dup pairs: signature → band buckets → candidate
    pairs sharing ≥1 bucket → exact-Jaccard verification ≥ t.

    Output (id_a < id_b, jaccard) contains only LSH-surfaced pairs —
    pairs missed by every band are absent by design (that's the
    accuracy/cost knob: 16 bands × 2 rows ⇒ P(caught) = 1-(1-j²)^16).
    ``use_arrow`` swaps the column-expression signature for the
    numpy/Arrow pandas-UDF twin (bit-identical output; see
    minhash_signature_np for when that trade wins).
    """
    sigs = scoped_cache(minhash_signatures(df, id_col, text_col, n, use_arrow=use_arrow))
    buckets = sigs.select(
        "doc_id", F.explode(band_keys(F.col("sig"))).alias("bk")
    )
    a = buckets.alias("a")
    b = buckets.alias("b")
    cand = (
        a.join(b, (F.col("a.bk") == F.col("b.bk")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .dropDuplicates()
    )
    sh = sigs.select("doc_id", "sh")
    verified = (
        cand.join(sh.withColumnsRenamed({"doc_id": "id_a", "sh": "sh_a"}), "id_a")
        .join(sh.withColumnsRenamed({"doc_id": "id_b", "sh": "sh_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")).cast("double"),
        )
    )
    return verified.filter(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", "jaccard"
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 32
SIMHASH_BLOCKS = 4  # 4 × 8-bit blocks → finds all pairs with hamming ≤ 3


def simhash(token_hashes: Column) -> Column:
    """32-bit SimHash of a token-hash array: bit b of the fingerprint is
    the sign of Σ_tokens (±1 by bit b of the token hash). Per-row
    expression, no shuffle.

    Single traversal: ONE fold carries an array of 32 bit-counters
    (zip_with add per token) instead of 32 independent folds — the
    naive form re-walked the token array (and re-evaluated the
    tokenize/hash expression feeding it) once per bit, 32× the work.
    Counter arithmetic is identical, so fingerprints are unchanged."""

    def bits_pm(h: Column) -> Column:
        # ±1 vote per bit of one token hash.
        return F.array(
            *[
                F.when(
                    F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1,
                    F.lit(1).cast("long"),
                ).otherwise(F.lit(-1).cast("long"))
                for b in range(SIMHASH_BITS)
            ]
        )

    votes = F.aggregate(
        token_hashes,
        F.array_repeat(F.lit(0).cast("long"), SIMHASH_BITS),
        lambda acc, h: F.zip_with(acc, bits_pm(h), lambda a, v: a + v),
    )
    powers = F.array(*[F.lit(1 << b).cast("long") for b in range(SIMHASH_BITS)])
    return F.aggregate(
        F.zip_with(
            votes, powers, lambda v, p: F.when(v >= 0, p).otherwise(F.lit(0).cast("long"))
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def simhash_fingerprints(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Per-doc (doc_id, simhash) over unigram token hashes."""
    from bigdata_invoice_stream_analysis_spark.functions.text import poly_hash, tokenize
    from bigdata_invoice_stream_analysis_spark.sources.tables import ensure_min_parallelism

    df = ensure_min_parallelism(df, df.sparkSession)
    toks = F.transform(tokenize(F.col(text_col)), lambda t: poly_hash(t))
    return df.select(F.col(id_col).alias("doc_id"), simhash(toks).alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 1,
) -> DataFrame:
    """SimHash near-dup pairs with hamming distance ≤ ``max_hamming``
    (must be ≤ SIMHASH_BLOCKS-1 for the block-candidate generation to be
    lossless by pigeonhole). Output: (id_a < id_b, hamming)."""
    if max_hamming > SIMHASH_BLOCKS - 1:
        raise ValueError("block candidate generation is lossy beyond hamming 3")
    fps = scoped_cache(simhash_fingerprints(df, id_col, text_col))
    width = SIMHASH_BITS // SIMHASH_BLOCKS
    blocks = fps.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftright("simhash", i * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("val"),
                    )
                    for i in range(SIMHASH_BLOCKS)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "simhash", "b.blk", "b.val")
    a = blocks.alias("a")
    b = blocks.alias("b")
    xor = F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    ham = F.bit_count(xor)
    # A pair sharing k blocks would surface k times; instead of a
    # dropDuplicates shuffle over millions of candidate rows, each pair
    # is emitted exactly once — by the FIRST block the two fingerprints
    # agree on (a pure integer condition on the xor, evaluated inside
    # the join). The hamming cut is applied in the join condition too,
    # so nothing downstream ever materializes the candidate explosion.
    block_eq = [
        F.shiftright(xor, j * width).bitwiseAND(F.lit((1 << width) - 1)) == 0
        for j in range(SIMHASH_BLOCKS)
    ]
    first_eq = F.when(block_eq[0], 0)
    for j in range(1, SIMHASH_BLOCKS):
        first_eq = first_eq.when(block_eq[j], j)
    cand = a.join(
        b,
        (F.col("a.blk") == F.col("b.blk"))
        & (F.col("a.val") == F.col("b.val"))
        & (F.col("a.doc_id") < F.col("b.doc_id"))
        & (ham <= F.lit(max_hamming))
        & (F.col("a.blk") == first_eq),
    ).select(
        F.col("a.doc_id").alias("id_a"),
        F.col("b.doc_id").alias("id_b"),
        ham.alias("hamming"),
    )
    return cand


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Undirected connected components over a near-dup pair graph —
    the step that turns pairwise dedup output into canonical document
    groups (every member of a component labels itself with the
    component's minimum id, the canonical survivor).

    Iterative min-label propagation: each round, every node takes the
    minimum label among itself and its neighbors (one join + one
    hash-agg per round); converged when the global label sum stops
    decreasing (labels are monotonically non-increasing, so the sum is
    an exact fixpoint witness — no full-table comparison needed).
    Rounds needed = graph diameter; near-dup components are shallow
    (mutant chains of depth 1-2), so 2-3 rounds in practice.
    ``localCheckpoint`` truncates the growing lineage each round so the
    plan stays O(1) per iteration. At 100 TB the same loop runs with
    the edge list hash-partitioned by node; the O(log n) large-star /
    small-star variant is the upgrade path for adversarially deep
    graphs.

    Returns (node, component) — one row per distinct node in ``edges``.
    """
    # Materialize the symmetric edge list ONCE: every round joins
    # against it, and without a checkpoint each round would re-run the
    # whole upstream candidate-generation pipeline (MinHash/LSH etc.).
    sym = (
        edges.select(F.col(src).alias("node"), F.col(dst).alias("nbr"))
        .unionAll(edges.select(F.col(dst).alias("node"), F.col(src).alias("nbr")))
        .localCheckpoint()
    )
    # Seed: label(n) = min(n, min neighbor) — folds the first
    # propagation round into initialization.
    labels = (
        sym.unionAll(sym.select(F.col("node"), F.col("node").alias("nbr")))
        .groupBy("node")
        .agg(F.min("nbr").alias("component"))
        .localCheckpoint()
    )
    prev_sum = labels.agg(F.sum("component")).first()[0]
    converged = False
    for _ in range(max_iter):
        nbr_labels = sym.join(
            labels.withColumnRenamed("node", "nbr"), "nbr"
        ).select("node", "component")
        labels = (
            nbr_labels.unionAll(labels)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint()
        )
        cur_sum = labels.agg(F.sum("component")).first()[0]
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        # A graph whose diameter exceeds max_iter would otherwise
        # return partially-propagated labels — silently wrong canonical
        # survivors. Surface it loudly; callers with adversarially deep
        # graphs should raise max_iter or move to large-star/small-star.
        import warnings

        warnings.warn(
            f"connected_components: min-label propagation did not reach "
            f"its fixpoint within max_iter={max_iter} rounds; labels may "
            f"span partially-merged components",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels


def connected_components_star(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    operations (the O(log²n)-round MapReduce CC algorithm) — the
    documented upgrade path over plain min-label propagation
    (``connected_components``) for graphs whose DIAMETER is large:
    label propagation needs diameter rounds (a 10⁶-long chain needs
    10⁶ joins), star contraction needs O(log²) because every round
    rewires nodes directly at their current minimum.

    * large-star: every node u connects its LARGER neighbors to
      m = min(N(u) ∪ {u}) — one symmetric-adjacency hash-agg for the
      mins plus one join to rewrite the edge targets.
    * small-star: with edges oriented large→small, every node connects
      its (smaller) neighbors and itself to its minimum neighbor.

    Both steps are a groupBy + an equi-join on the node key — the same
    partitioning, so each round is two shuffles over the (shrinking)
    edge list. Convergence: the edge set is a fixpoint; witnessed by a
    (count, Σu, Σv) signature going stable (cheap aggregate, no
    full-set comparison). At the fixpoint the graph is a disjoint
    union of stars rooted at each component's min id.

    Returns (node, component) — one row per distinct node in ``edges``,
    identical contract (and for any input, identical output) to
    ``connected_components``.
    """
    raw = edges.select(
        F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
    )
    # Every distinct endpoint must appear in the output, including
    # nodes touched only by self-loops (which carry no connectivity and
    # are dropped from the working edge set).
    nodes = (
        raw.select("u")
        .unionAll(raw.select(F.col("v").alias("u")))
        .distinct()
        .select(F.col("u").alias("node"))
        .localCheckpoint()
    )
    e = raw.where(F.col("u") != F.col("v")).distinct().localCheckpoint()
    prev_sig = None
    converged = False
    for _ in range(max_iter):
        # large-star round
        sym = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mn"))
            .select("u", F.least(F.col("mn"), F.col("u")).alias("m"))
        )
        large = (
            sym.where(F.col("v") > F.col("u"))
            .join(mins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        e = large.where(F.col("u") != F.col("v")).distinct().localCheckpoint()
        # small-star round (orient large→small; every neighbor is < u,
        # so the group min IS the overall min)
        d = e.select(
            F.greatest(F.col("u"), F.col("v")).alias("u"),
            F.least(F.col("u"), F.col("v")).alias("v"),
        )
        m2 = d.groupBy("u").agg(F.min("v").alias("m"))
        small = d.join(m2, "u").select(
            F.col("v").alias("u"), F.col("m").alias("v")
        ).unionAll(m2.select(F.col("u"), F.col("m").alias("v")))
        e = small.where(F.col("u") != F.col("v")).distinct().localCheckpoint()
        sig = tuple(
            e.agg(
                F.count(F.lit(1)), F.sum("u"), F.sum("v")
            ).first()
        )
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    if not converged:
        import warnings

        warnings.warn(
            f"connected_components_star: star contraction did not reach "
            f"its fixpoint within max_iter={max_iter} rounds",
            RuntimeWarning,
            stacklevel=2,
        )
    # At the fixpoint every edge is (member → component root); roots
    # themselves only appear as targets. Labels via one symmetric
    # min-agg (exact for star graphs, and robust to an unconverged
    # warning state in the same way propagation is).
    symf = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    star = (
        symf.groupBy(F.col("u").alias("node"))
        .agg(F.min("v").alias("mn"))
        .select(
            "node", F.least(F.col("mn"), F.col("node")).alias("component")
        )
    )
    return nodes.join(star, "node", "left").select(
        "node", F.coalesce(F.col("component"), F.col("node")).alias("component")
    )


# ---------------------------------------------------------------------------
# Prefix-filtered Jaccard self-join (PPJoin-style candidate generation)
# ---------------------------------------------------------------------------

def jaccard_prefix_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Exact n-gram Jaccard pairs via PREFIX FILTERING (the PPJoin
    family, Xiao et al. 2008): order every document's shingles by a
    global canonical order (document frequency asc, hash asc — rarest
    first) and index only each doc's PREFIX of length
    |A| - ceil(t*|A|) + 1. Correctness: J(A,B) >= t implies
    |A∩B| >= ceil(t*|A|), so A and B must share a shingle inside both
    prefixes — no candidate is lost. Unlike the max_df cap
    (jaccard_pairs), nothing is dropped heuristically: rare shingles
    carry the candidate generation and the frequent tail never enters
    the index, which is what bounds the self-join at 100 TB (hot
    shingles are exactly the ones prefix filtering excludes).

    Verification joins each candidate pair back to the two full
    shingle ARRAYS and intersects them per-row (array_intersect in
    codegen) — no second explode, no per-shingle shuffle.
    """
    sh = scoped_cache(_shingled(df, id_col, text_col, n))
    inv = sh.select("doc_id", F.size("sh").alias("n_sh"), F.explode("sh").alias("h"))
    dfreq = inv.groupBy("h").agg(F.count(F.lit(1)).alias("df_h"))
    ranked = inv.join(dfreq, "h").withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("doc_id").orderBy(F.asc("df_h"), F.asc("h"))
        ),
    )
    # Cache the prefix index: it feeds BOTH sides of the candidate
    # self-join, and without materialization Spark builds the whole
    # inverted index (explode → dfreq join → per-doc window sort)
    # twice — the r9 before-plan showed two identical Window+Exchange
    # subtrees, one per join side (guide §2.4: share one exchange).
    prefix = scoped_cache(
        ranked.filter(
            F.col("rk")
            <= F.col("n_sh") - F.ceil(F.lit(threshold) * F.col("n_sh")) + 1
        ).select("doc_id", "h")
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    cand = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )
    sa = sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    verified = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("sh_a", "sh_b")).alias("n_inter"),
            F.size("sh_a").alias("n_a"),
            F.size("sh_b").alias("n_b"),
        )
        .withColumn(
            "jaccard",
            F.col("n_inter")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return verified.select("id_a", "id_b", "n_inter", F.round("jaccard", 6).alias("jaccard"))
