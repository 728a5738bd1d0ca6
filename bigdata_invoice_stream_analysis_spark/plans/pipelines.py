"""Round-2 training-data pipeline queries: sub-document dedup,
boilerplate detection, bigram-LM quality scoring, semantic dedup
(SemDeDup), binned interval joins, and integer PageRank.

Same conventions as plans/extensions.py: every query has a DuckDB
oracle computing the identical result; all hash/score math stays in
exact integer arithmetic (or is rounded to 6 decimals on both sides)
so the order-insensitive value hash is engine-stable.

Reference parity note: the reference
(/root/reference/src/main/scala/es/dmr/uimp) has no sub-document,
graph, or embedding operators at all — these are north-star extension
operators (SURVEY.md §2.12 / §7 stage 5), built Spark-first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_invoice_stream_analysis_spark.functions import text as TX
from bigdata_invoice_stream_analysis_spark.operators import graph as G
from bigdata_invoice_stream_analysis_spark.operators import similarity as SIM
from bigdata_invoice_stream_analysis_spark.plans.extensions import (
    DOCS_EXACTDUP_CTE,
    VECS_NEARDUP_CTE,
    _sql_quant_cosine,
    docs_exactdup,
    vecs_neardup,
)
from bigdata_invoice_stream_analysis_spark.plans.queries import query, r6
from bigdata_invoice_stream_analysis_spark.scratch import fresh_checkpoint, scratch_dir
from bigdata_invoice_stream_analysis_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# Sub-document (chunk-level) exact dedup — C4-style paragraph dedup
# ---------------------------------------------------------------------------

_CHUNK_W = 10

_SQL_TOKS = TX.SQL_TOKENIZE.format(col="text")
_SQL_CHUNK_TEXT = (
    f"array_to_string(list_slice(toks, (chunk_idx - 1) * {_CHUNK_W} + 1,"
    f" chunk_idx * {_CHUNK_W}), ' ')"
)


@query(
    "chunk_dedup_stats",
    oracle=f"""
WITH {DOCS_EXACTDUP_CTE},
tok AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM docs_aug),
ch AS (
  SELECT doc_id, toks,
         unnest(generate_series(1, CAST(ceil(len(toks) / {_CHUNK_W}.0) AS BIGINT))) AS chunk_idx
  FROM tok WHERE len(toks) > 0
),
h AS (
  SELECT doc_id, chunk_idx,
         {TX.SQL_POLY_HASH.format(t=_SQL_CHUNK_TEXT)} AS h
  FROM ch
),
r AS (
  SELECT doc_id, h,
         row_number() OVER (PARTITION BY h ORDER BY doc_id, chunk_idx) AS rn
  FROM h
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
FROM r GROUP BY 1
""",
)
def q_chunk_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide sub-document exact dedup (C4's "deduplicate at the
    paragraph level" rule, re-expressed over {w}-token chunks since the
    synthetic corpus has no newlines): each chunk survives only at its
    FIRST occurrence (lowest doc_id, then chunk position); later copies
    are dropped. Runs over the exact-dup-augmented corpus so the
    planted whitespace-doubled docs lose all their chunks.

    Plan shape: chunking + polynomial hashing are per-row expressions
    (zero shuffle); the keep-first rule is one row_number window
    partitioned by the 8-byte chunk hash — the shuffle carries
    (hash, doc_id, idx) triples, never the chunk text; per-doc stats
    re-shuffle only the surviving triple stream. At 100 TB both
    shuffles are minimal-width; hot chunks (the boilerplate tail) skew
    the window key, which AQE skew-split handles — the dedicated
    boilerplate operator below is the pre-filter that removes them
    wholesale."""
    d = docs_exactdup(spark, sf_dir)
    toks = TX.tokenize(F.col("text"))
    ch = d.select(
        "doc_id", F.posexplode(TX.chunks(toks, _CHUNK_W)).alias("pos", "chunk")
    ).select(
        "doc_id",
        (F.col("pos") + 1).alias("chunk_idx"),
        TX.poly_hash(F.col("chunk")).alias("h"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("h").orderBy("doc_id", "chunk_idx")
    ranked = ch.withColumn("rn", F.row_number().over(w))
    return ranked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.when(F.col("rn") > 1, 1).otherwise(0)).alias("n_dropped"),
    )


# ---------------------------------------------------------------------------
# Boilerplate chunk detection (per-source repeated content)
# ---------------------------------------------------------------------------

_FOOTER = "sitewide banner notice terms privacy policy contact careers press"
_BOILER_MIN_DOCS = 5


@query(
    "boilerplate_chunks",
    oracle=f"""
WITH aug AS (
  SELECT doc_id, source,
         '{_FOOTER} ' || source || ' ' || text AS text
  FROM documents
),
tok AS (SELECT doc_id, source, {_SQL_TOKS} AS toks FROM aug),
ch AS (
  SELECT doc_id, source, toks,
         unnest(generate_series(1, CAST(ceil(len(toks) / {_CHUNK_W}.0) AS BIGINT))) AS chunk_idx
  FROM tok WHERE len(toks) > 0
),
h AS (
  SELECT doc_id, source, {TX.SQL_POLY_HASH.format(t=_SQL_CHUNK_TEXT)} AS h
  FROM ch
),
g AS (
  SELECT source, h, COUNT(*) AS cnt, COUNT(DISTINCT doc_id) AS ndocs
  FROM h GROUP BY 1, 2
)
SELECT source,
       CAST(SUM(cnt) AS BIGINT) AS n_instances,
       CAST(SUM(CASE WHEN ndocs >= {_BOILER_MIN_DOCS} THEN cnt ELSE 0 END) AS BIGINT)
         AS n_boiler_instances,
       ROUND(CAST(SUM(CASE WHEN ndocs >= {_BOILER_MIN_DOCS} THEN cnt ELSE 0 END) AS DOUBLE)
             / SUM(cnt), 6) AS boiler_frac
FROM g GROUP BY 1
""",
)
def q_boilerplate_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source boilerplate detection (the C4/RefinedWeb "repeated
    lines across pages of a site" filter): a chunk is boilerplate in a
    source when it appears in >= {k} distinct documents of that source.
    A deterministic site-wide footer is prepended to every document
    (both engines) so each source has planted boilerplate; natural
    repeats count too.

    Plan shape: one (source, chunk_hash) aggregation with a distinct-doc
    count (two-level partial agg), then a per-source re-aggregation of
    the group rows — the corpus is scanned once and the second agg runs
    over vocabulary-bounded rows. The boilerplate REMOVAL form is the
    same first agg followed by a broadcast semi-join of flagged hashes
    back onto the chunk stream (hash-only broadcast)."""
    d = load_table(spark, sf_dir, "documents")
    aug = d.select(
        "doc_id",
        "source",
        F.concat_ws(" ", F.lit(_FOOTER), F.col("source"), F.col("text")).alias("text"),
    )
    toks = TX.tokenize(F.col("text"))
    ch = aug.select(
        "doc_id",
        "source",
        F.explode(TX.chunks(toks, _CHUNK_W)).alias("chunk"),
    ).select("doc_id", "source", TX.poly_hash(F.col("chunk")).alias("h"))
    g = ch.groupBy("source", "h").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.count_distinct("doc_id").alias("ndocs"),
    )
    boiler_cnt = F.sum(
        F.when(F.col("ndocs") >= _BOILER_MIN_DOCS, F.col("cnt")).otherwise(0)
    )
    return g.groupBy("source").agg(
        F.sum("cnt").alias("n_instances"),
        boiler_cnt.alias("n_boiler_instances"),
        r6(boiler_cnt.cast("double") / F.sum("cnt")).alias("boiler_frac"),
    )


# ---------------------------------------------------------------------------
# Bigram-LM "surprise" quality score (conditional-probability variant of
# the unigram doc_rarity_score)
# ---------------------------------------------------------------------------


@query(
    "doc_bigram_surprise",
    oracle=f"""
WITH tok AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
bg AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(toks) - 1),
                               i -> toks[i] || ' ' || toks[i + 1])) AS bigram
  FROM tok WHERE len(toks) >= 2
),
tf2 AS (SELECT doc_id, bigram, COUNT(*) AS cnt FROM bg GROUP BY 1, 2),
big AS (SELECT bigram, SUM(cnt) AS bcnt FROM tf2 GROUP BY 1),
uni AS (SELECT split_part(bigram, ' ', 1) AS prev, SUM(bcnt) AS ucnt
        FROM big GROUP BY 1),
scored AS (
  SELECT tf2.doc_id,
         SUM(tf2.cnt) AS n_bigrams,
         SUM(tf2.cnt * (uni.ucnt // big.bcnt)) AS surprise_sum
  FROM tf2
  JOIN big ON tf2.bigram = big.bigram
  JOIN uni ON split_part(tf2.bigram, ' ', 1) = uni.prev
  GROUP BY 1
)
SELECT doc_id,
       CAST(n_bigrams AS BIGINT) AS n_bigrams,
       CAST(surprise_sum AS BIGINT) AS surprise_sum,
       ROUND(CAST(surprise_sum AS DOUBLE) / n_bigrams, 6) AS mean_surprise
FROM scored
""",
)
def q_doc_bigram_surprise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model quality score — the conditional-probability
    upgrade of doc_rarity_score and the shape of CCNet/Gopher LM-based
    quality filtering: per bigram (prev, cur), surprise =
    floor(count(prev, *) / count(prev, cur)) — the integer inverse of
    the conditional probability p(cur | prev), exact across engines
    (ln() is not bit-specified; integer division is). Documents gluing
    tokens in corpus-typical order score low; improbable transitions
    score high.

    Plan shape: one (doc, bigram) shuffle builds per-doc term counts;
    the bigram and prev-token vocabularies re-aggregate those partials
    (vocabulary-bounded, never a second corpus pass) and broadcast back
    onto tf2. The corpus crosses the wire once."""
    from bigdata_invoice_stream_analysis_spark.operators.fence import optimizer_fence

    docs = load_table(spark, sf_dir, "documents")
    # Fence the tokenization: the bigram transform references the token
    # array twice per position, and Catalyst alias-inlining would
    # otherwise re-evaluate split+filter per element_at.
    tokd = optimizer_fence(
        docs.select("doc_id", TX.tokenize(F.col("text")).alias("toks"))
    )
    toks = F.col("toks")
    n = F.size(toks)
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    tf2 = (
        tokd.select("doc_id", F.explode(bigrams).alias("bigram"))
        .groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    from bigdata_invoice_stream_analysis_spark.cache import scoped_cache

    tf2 = scoped_cache(tf2)
    big = tf2.groupBy("bigram").agg(F.sum("cnt").alias("bcnt"))
    uni = big.groupBy(
        F.substring_index(F.col("bigram"), " ", 1).alias("prev")
    ).agg(F.sum("bcnt").alias("ucnt"))
    # No broadcast hints: the bigram vocabulary grows with corpus
    # diversity (it is NOT small by definition the way a codebook is),
    # so let AQE pick broadcast vs shuffle from measured sizes.
    joined = tf2.join(big, "bigram").join(
        uni,
        F.substring_index(tf2["bigram"], " ", 1) == uni["prev"],
    )
    return (
        joined.groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_bigrams"),
            F.sum(F.col("cnt") * F.expr("ucnt div bcnt")).alias("surprise_sum"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "surprise_sum",
            r6(F.col("surprise_sum").cast("double") / F.col("n_bigrams")).alias(
                "mean_surprise"
            ),
        )
    )


# ---------------------------------------------------------------------------
# SemDeDup — semantic dedup inside coarse embedding clusters
# ---------------------------------------------------------------------------

_SEMDEDUP_MOD = 97
_SEMDEDUP_TAU = 0.99
_COS_AB = _sql_quant_cosine("a.qv", "b.qv")
_SQL_CDIST = (
    "CAST(list_sum(list_transform(generate_series(1, len(v.qv)),"
    " i -> (v.qv[i] - c.cv[i]) * (v.qv[i] - c.cv[i]))) AS BIGINT)"
)


@query(
    "semdedup_drop",
    oracle=f"""
WITH {VECS_NEARDUP_CTE},
cents AS (
  SELECT vec_id AS cell_id, qv AS cv FROM vecs_aug
  WHERE vec_id < 1000000 AND vec_id % {_SEMDEDUP_MOD} = 0
),
assign AS (
  SELECT vec_id, qv, cell_id FROM (
    SELECT v.vec_id, v.qv, c.cell_id,
           row_number() OVER (PARTITION BY v.vec_id ORDER BY
             {_SQL_CDIST} ASC, c.cell_id ASC) AS rn
    FROM vecs_aug v CROSS JOIN cents c
  ) WHERE rn = 1
)
SELECT b.vec_id AS vec_id, CAST(b.cell_id AS BIGINT) AS cell_id,
       ROUND(MAX({_COS_AB}), 6) AS max_cos
FROM assign a JOIN assign b
  ON a.cell_id = b.cell_id AND a.vec_id < b.vec_id
WHERE {_COS_AB} >= {_SEMDEDUP_TAU}
GROUP BY 1, 2
""",
)
def q_semdedup_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup
    that only compares embeddings INSIDE coarse clusters — assign every
    vector to its nearest codebook centroid, then drop any vector whose
    cosine to an earlier (lower-id) same-cell vector exceeds tau. The
    planted perturbed copies (cosine ~0.9999999) land in their
    original's cell and are dropped; cross-cell pairs are never
    compared, which is the whole point of the method at 100 TB: the
    quadratic term is bounded by max cell size, not corpus size.

    Plan shape: cell assignment is the ZERO-SHUFFLE plan-literal
    codebook path (operators/similarity.assign_cells_literal); the only
    shuffles are the cell-keyed self-join and the final per-victim
    aggregate. Skewed cells split under AQE; production would cap cell
    size by recursive re-clustering (the paper's k-means levels)."""
    v = vecs_neardup(spark, sf_dir)
    codebook = [
        (int(r["vec_id"]), [int(x) for x in r["qv"]])
        for r in v.filter(
            (F.col("vec_id") < 1_000_000) & (F.col("vec_id") % _SEMDEDUP_MOD == 0)
        ).collect()
    ]
    # Vectorized assignment (Arrow batch matmul argmin) + per-cell
    # grouped-pandas pairwise pass — the paper's actual execution
    # shape. The expression-form twins (assign_cells_literal +
    # cell-keyed self-join) are unit-tested equivalents
    # (tests/test_pipelines.py); integer Gram matrices keep the numpy
    # path bit-identical to the SQL oracle, and rounding happens HERE
    # (F.round, half-up) so the engine-side rounding convention is
    # preserved.
    assigned = SIM.assign_cells_np(v, codebook, "qv")
    drops = SIM.semdedup_cell_drops(assigned, tau=_SEMDEDUP_TAU)
    return drops.select("vec_id", "cell_id", r6(F.col("max_cos")).alias("max_cos"))


# ---------------------------------------------------------------------------
# Binned interval join (date-range containment via week-bucket equi-join)
# ---------------------------------------------------------------------------

_PERIOD_MOD = 501
_BIN_EPOCH = "1992-01-01"


@query(
    "promo_interval_join",
    oracle=f"""
WITH periods AS (
  SELECT o_orderkey AS period_id,
         CAST(o_orderdate AS DATE) AS p_start,
         CAST(o_orderdate AS DATE) + CAST(o_orderkey % 29 + 3 AS INTEGER) AS p_end
  FROM orders WHERE o_orderkey % {_PERIOD_MOD} = 0
)
SELECT p.period_id,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM periods p JOIN orders o
  ON CAST(o.o_orderdate AS DATE) BETWEEN p.p_start AND p.p_end
GROUP BY 1
""",
)
def q_promo_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-containment join (orders falling inside promo date
    ranges) executed as a BINNED equi-join — the standard scale
    technique for range joins Spark lacks natively: explode each
    period into the week buckets it covers (bounded fanout: len/7 + 2
    bins), equi-join probe rows on their single week bucket, refine
    with the exact BETWEEN predicate. Without binning this is a
    broadcast nested-loop join evaluating every (order, period) pair;
    with it, each probe row meets only the periods overlapping its
    week. No duplicate matches are possible: a probe row has exactly
    one bucket, so each (order, period) pair meets at most once.

    At 100 TB the exploded period side stays broadcast-sized (periods
    x weeks-per-period), and the probe side never shuffles at all —
    the only exchange is the final per-period aggregation."""
    o = load_table(spark, sf_dir, "orders")
    epoch = F.lit(_BIN_EPOCH).cast("date")

    def wk(d):
        return F.floor(F.datediff(d, epoch) / 7)

    periods = o.where(F.col("o_orderkey") % _PERIOD_MOD == 0).select(
        F.col("o_orderkey").alias("period_id"),
        F.col("o_orderdate").cast("date").alias("p_start"),
        F.date_add(
            F.col("o_orderdate").cast("date"),
            (F.col("o_orderkey") % 29 + 3).cast("int"),
        ).alias("p_end"),
    )
    pex = periods.select(
        "period_id",
        "p_start",
        "p_end",
        F.explode(F.sequence(wk(F.col("p_start")), wk(F.col("p_end")))).alias("wk"),
    )
    probe = o.select(
        F.col("o_orderdate").cast("date").alias("od"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    ).withColumn("wk", wk(F.col("od")))
    matched = probe.join(
        F.broadcast(pex),
        (probe["wk"] == pex["wk"])
        & (probe["od"] >= pex["p_start"])
        & (probe["od"] <= pex["p_end"]),
    )
    return matched.groupBy("period_id").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("cents").alias("sum_cents"),
    )


# ---------------------------------------------------------------------------
# Integer PageRank on the co-purchase graph
# ---------------------------------------------------------------------------

_PR_ITERS = 5


def _sql_pagerank() -> str:
    base = G.RANK_SCALE - (G.DAMP_NUM * G.RANK_SCALE) // G.DAMP_DEN
    ctes = [
        f"""op AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem WHERE l_quantity > 30
),
e0 AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
es AS (SELECT u AS src, v AS dst FROM e0 UNION ALL SELECT v, u FROM e0),
deg AS (SELECT src, COUNT(*) AS deg FROM es GROUP BY 1),
ed AS (SELECT es.src, es.dst, deg.deg FROM es JOIN deg ON deg.src = es.src),
pr0 AS (SELECT src AS node, CAST({G.RANK_SCALE} AS BIGINT) AS pr_score FROM deg)"""
    ]
    for t in range(1, _PR_ITERS + 1):
        ctes.append(
            f"""pr{t} AS (
  SELECT ed.dst AS node,
         CAST({base} + ({G.DAMP_NUM} * SUM(p.pr_score // ed.deg)) // {G.DAMP_DEN}
              AS BIGINT) AS pr_score
  FROM ed JOIN pr{t - 1} p ON p.node = ed.src
  GROUP BY 1
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT node, pr_score FROM pr{_PR_ITERS}"
    )


@query("copurchase_pagerank", oracle=_sql_pagerank())
def q_copurchase_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration PageRank over the part co-purchase graph (same
    edge construction as copurchase_triangles), in exact integer
    arithmetic: float PageRank sums are shuffle-order-dependent, while
    BIGINT nano-rank sums are associative — so the result hash is
    stable and the DuckDB oracle (the same 5 iterations unrolled as
    CTEs) reproduces it bit-for-bit. operators/graph.pagerank_int
    documents the per-iteration plan: one rank⋈edge join plus one
    destination-keyed aggregation, lineage truncated per round."""
    li = load_table(spark, sf_dir, "lineitem")
    e0 = G.copurchase_edges(li)
    return G.pagerank_int(G.symmetrize(e0), iterations=_PR_ITERS)


# ---------------------------------------------------------------------------
# Count-min sketch heavy hitters
# ---------------------------------------------------------------------------

from bigdata_invoice_stream_analysis_spark.operators import sketches as SK  # noqa: E402

_CMS_TOPN = 20


def _sql_cms() -> str:
    cell_rows = "\nUNION ALL\n".join(
        f"  SELECT {r} AS r, {SK.sql_cms_hash('l_partkey', r)} AS c,"
        f" COUNT(*) AS cnt FROM lineitem GROUP BY 2"
        for r in range(SK.CMS_D)
    )
    probe_rows = "\nUNION ALL\n".join(
        f"  SELECT l_partkey, exact_cnt, {r} AS r,"
        f" {SK.sql_cms_hash('l_partkey', r)} AS c FROM top"
        for r in range(SK.CMS_D)
    )
    return f"""
WITH cells AS (
{cell_rows}
),
exact AS (SELECT l_partkey, COUNT(*) AS exact_cnt FROM lineitem GROUP BY 1),
top AS (
  SELECT l_partkey, exact_cnt FROM (
    SELECT l_partkey, exact_cnt,
           row_number() OVER (ORDER BY exact_cnt DESC, l_partkey ASC) AS rn
    FROM exact
  ) WHERE rn <= {_CMS_TOPN}
),
probes AS (
{probe_rows}
),
est AS (
  SELECT p.l_partkey, p.exact_cnt, MIN(cells.cnt) AS cms_est
  FROM probes p JOIN cells ON cells.r = p.r AND cells.c = p.c
  GROUP BY 1, 2
)
SELECT l_partkey, CAST(exact_cnt AS BIGINT) AS exact_cnt,
       CAST(cms_est AS BIGINT) AS cms_est,
       CAST(cms_est - exact_cnt AS BIGINT) AS overcount
FROM est
"""


@query("heavy_hitters_cms", oracle=_sql_cms())
def q_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter detection via a count-min sketch
    (operators/sketches.py): the sketch is built in ONE pass as a
    (hash_row, counter) aggregation whose shuffle is bounded by d*w
    cells per partition regardless of corpus size, then the top-N keys
    are point-estimated by min-over-cells against the broadcast
    sketch. The exact per-key counts are computed alongside ONLY to
    exhibit the sketch's one-sided error (cms_est >= exact always) —
    at 100 TB the exact branch is what you cannot afford, and the
    candidate keys would come from an external list or a prior
    sketch round. Integer hashing makes the sketch bit-identical
    across engines and shuffle orders."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey")
    cells = SK.cms_cells(li, "l_partkey")
    exact = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("exact_cnt"))
    # orderBy+limit compiles to TakeOrderedAndProject (per-partition
    # heaps + driver merge), never a single-partition global window.
    top = exact.orderBy(F.desc("exact_cnt"), F.asc("l_partkey")).limit(_CMS_TOPN)
    est = SK.cms_estimate(top.select("l_partkey"), cells, "l_partkey")
    return top.join(F.broadcast(est), "l_partkey").select(
        "l_partkey",
        "exact_cnt",
        "cms_est",
        (F.col("cms_est") - F.col("exact_cnt")).alias("overcount"),
    )


# ---------------------------------------------------------------------------
# Prefix-filtered Jaccard dedup (PPJoin-style)
# ---------------------------------------------------------------------------

from bigdata_invoice_stream_analysis_spark.operators import dedup as DD  # noqa: E402
from bigdata_invoice_stream_analysis_spark.plans.extensions import (  # noqa: E402
    DOCS_NEARDUP_CTE,
    docs_neardup,
)

_PPJ_T = 0.2
_SQL_SH3 = TX.sql_shingle_hashes("text", n=3)


@query(
    "jaccard_prefix_filter",
    oracle=f"""
WITH {DOCS_NEARDUP_CTE},
sh AS (SELECT doc_id, {_SQL_SH3} AS sh FROM docs_aug),
inv AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS h FROM sh),
dfreq AS (SELECT h, COUNT(*) AS df_h FROM inv GROUP BY 1),
ranked AS (
  SELECT inv.doc_id, inv.n_sh, inv.h,
         row_number() OVER (PARTITION BY inv.doc_id
                            ORDER BY d.df_h ASC, inv.h ASC) AS rk
  FROM inv JOIN dfreq d USING (h)
),
prefix AS (
  SELECT doc_id, h FROM ranked
  WHERE rk <= n_sh - CAST(ceil({_PPJ_T} * n_sh) AS BIGINT) + 1
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM prefix a JOIN prefix b ON a.h = b.h AND a.doc_id < b.doc_id
),
v AS (
  SELECT id_a, id_b,
         len(list_intersect(sa.sh, sb.sh)) AS n_inter,
         len(sa.sh) AS n_a, len(sb.sh) AS n_b
  FROM cand JOIN sh sa ON sa.doc_id = cand.id_a
            JOIN sh sb ON sb.doc_id = cand.id_b
)
SELECT id_a, id_b, CAST(n_inter AS BIGINT) AS n_inter,
       ROUND(CAST(n_inter AS DOUBLE) / (n_a + n_b - n_inter), 6) AS jaccard
FROM v WHERE CAST(n_inter AS DOUBLE) / (n_a + n_b - n_inter) >= {_PPJ_T}
""",
)
def q_jaccard_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaccard near-dup pairs via PPJoin-style prefix filtering
    (operators/dedup.jaccard_prefix_pairs): only each document's
    rarest-first prefix enters the inverted index, so hot shingles —
    the quadratic killer the max_df cap (ngram_jaccard_dedup) merely
    truncates — are excluded by construction with NO loss of recall.
    Must find exactly the pairs the exact inverted-index join finds at
    the same threshold."""
    d = docs_neardup(spark, sf_dir)
    out = DD.jaccard_prefix_pairs(
        d, id_col="doc_id", text_col="text", n=3, threshold=_PPJ_T
    )
    return out.select(
        "id_a", "id_b", F.col("n_inter").cast("long").alias("n_inter"), "jaccard"
    )


# ---------------------------------------------------------------------------
# Product-quantization ANN (ADC top-k)
# ---------------------------------------------------------------------------

_PQ_MOD = 149
# Codebook size bound: the mod-filter alone grows as N/149, i.e. a
# linear-in-corpus driver pull; the id-range cap makes the codebook a
# fixed ≤256 centroids per subspace regardless of corpus size (the
# semdedup_drop pattern, q_semdedup_drop). Mirrored in the oracle.
_PQ_MAX_CODES = 256
_PQ_CAP_ID = _PQ_MOD * _PQ_MAX_CODES
_PQ_SUB = 8  # dims per subspace (64 / PQ_M)
_SQL_SUB_SQDIST = (
    "CAST(list_sum(list_transform(generate_series(1, {n}),"
    " i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i]))) AS BIGINT)"
)


def _sql_pq() -> str:
    d_qc = _SQL_SUB_SQDIST.format(n=_PQ_SUB, a="s.sv", b="c.cv")
    d_adc = _SQL_SUB_SQDIST.format(n=_PQ_SUB, a="q.sv", b="c.cv")
    return f"""
WITH qv AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS qv
  FROM embeddings
),
subq AS (
  SELECT vec_id, m, list_slice(qv, m * {_PQ_SUB} + 1, (m + 1) * {_PQ_SUB}) AS sv
  FROM qv CROSS JOIN (SELECT unnest(generate_series(0, {SIM.PQ_M - 1})) AS m)
),
cents AS (SELECT m, vec_id AS cid, sv AS cv FROM subq
          WHERE vec_id % {_PQ_MOD} = 0 AND vec_id < {_PQ_CAP_ID}),
codes AS (
  SELECT vec_id, m, cid FROM (
    SELECT s.vec_id, s.m, c.cid,
           row_number() OVER (PARTITION BY s.vec_id, s.m
                              ORDER BY {d_qc} ASC, c.cid ASC) AS rn
    FROM subq s JOIN cents c ON c.m = s.m
  ) WHERE rn = 1
),
adc AS (
  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         SUM({d_adc}) AS adc_dist
  FROM subq q
  JOIN codes n ON n.m = q.m AND n.vec_id != q.vec_id
  JOIN cents c ON c.m = n.m AND c.cid = n.cid
  WHERE q.vec_id < 20
  GROUP BY 1, 2
)
SELECT query_id, neighbor_id, CAST(adc_dist AS BIGINT) AS adc_dist,
       CAST(rank AS INT) AS rank
FROM (
  SELECT query_id, neighbor_id, adc_dist,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY adc_dist ASC, neighbor_id ASC) AS rank
  FROM adc
) WHERE rank <= 5
"""


@query("ann_pq_topk", oracle=_sql_pq())
def q_ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (Jégou et al. 2011): the corpus is
    encoded as 8 one-byte codes per vector against per-subspace
    codebooks folded into the plan as literals
    (operators/similarity.pq_encode_literal — ZERO-shuffle encode);
    each query then ranks the corpus by the asymmetric distance (ADC):
    the sum over subspaces of the exact integer squared distance from
    the query subvector to the centroid each code names. Completes the
    ANN ladder — brute force (ann_cosine_topk) / IVF (ann_ivf_topk) /
    SQ8 (ann_sq8_topk) / PQ — with the variant whose index is 8 bytes
    per vector, the form that keeps a 100 TB corpus's index resident
    in executor memory. Deterministic throughout: integer distances,
    ties by (dist, neighbor_id, code id)."""
    e = load_table(spark, sf_dir, "embeddings")
    base = e.select("vec_id", SIM.quantize(F.col("embedding")).alias("qv"))
    sampled = base.filter(
        (F.col("vec_id") % _PQ_MOD == 0) & (F.col("vec_id") < _PQ_CAP_ID)
    ).collect()
    codebooks = [
        [
            (int(r["vec_id"]), [int(x) for x in r["qv"][m * _PQ_SUB:(m + 1) * _PQ_SUB]])
            for r in sampled
        ]
        for m in range(SIM.PQ_M)
    ]
    n_codes = len(codebooks[0])
    from bigdata_invoice_stream_analysis_spark.cache import scoped_cache

    # Vectorized Arrow encode (integer matmul argmin per batch) — the
    # scale path; pq_encode_literal is its expression-form twin, proven
    # code-identical in tests/test_pipelines.py. Cache the encoded
    # table: it is the PQ index a production system would persist (M
    # small ints per vector), reused by every query of the batch.
    encoded = scoped_cache(SIM.pq_encode_np(base, codebooks, "qv").drop("qv"))
    # The fixed query set is small (20 ids): pull their vectors and
    # precompute each query's ADC lookup table driver-side — the
    # textbook PQ scoring layout. Per corpus row the distance is then
    # M array lookups, so the broadcast cross join stays in codegen
    # instead of evaluating M*K literal sqdists per pair.
    qrows = sorted(
        base.filter(F.col("vec_id") < 20).collect(), key=lambda r: r["vec_id"]
    )
    queries = spark.createDataFrame(
        [
            (int(r["vec_id"]), SIM.pq_adc_lut([int(x) for x in r["qv"]], codebooks))
            for r in qrows
        ],
        "query_id long, lut array<long>",
    )
    adc = (
        encoded.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            SIM.adc_from_lut_codes(
                F.col("lut"), F.col("codes"), n_codes, SIM.PQ_M
            ).alias("adc_dist"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("neighbor_id"))
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "adc_dist", F.col("rank").cast("int").alias("rank"))
    )


# ---------------------------------------------------------------------------
# MinHash sketch accuracy audit
# ---------------------------------------------------------------------------

from bigdata_invoice_stream_analysis_spark.plans.extensions import (  # noqa: E402
    SHINGLES_CTE,
    docs_neardup as _docs_neardup,
)


def _sql_minhash_audit() -> str:
    sig_cols = ",\n    ".join(
        f"list_min(list_transform(s, h -> ({a} * h + {b}) % {TX.HASH_P})) AS m{i}"
        for i, (a, b) in enumerate(zip(DD.MINHASH_A, DD.MINHASH_B))
    )
    n_eq = " + ".join(
        f"CASE WHEN a.m{i} = b.m{i} THEN 1 ELSE 0 END" for i in range(DD.N_PERMS)
    )
    return f"""
WITH {DOCS_NEARDUP_CTE}, {SHINGLES_CTE},
sig AS (SELECT doc_id, s, {sig_cols} FROM sh),
p AS (
  SELECT doc_id AS id_a, doc_id + 1000000 AS id_b
  FROM documents WHERE doc_id % 10 = 0
)
SELECT p.id_a, p.id_b,
       CAST({n_eq} AS BIGINT) AS n_eq,
       ROUND(CAST({n_eq} AS DOUBLE) / {DD.N_PERMS}, 6) AS est_jaccard,
       ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
             / len(list_distinct(list_concat(a.s, b.s))), 6) AS exact_jaccard
FROM p JOIN sig a ON a.doc_id = p.id_a JOIN sig b ON b.doc_id = p.id_b
"""


@query("minhash_accuracy_audit", oracle=_sql_minhash_audit())
def q_minhash_accuracy_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-accuracy audit: for every planted near-dup pair, the
    MinHash Jaccard estimate (fraction of agreeing signature
    components, 32 perms) side by side with the exact shingle-set
    Jaccard — the measurement a production dedup pipeline runs before
    trusting an LSH operating point (bands x rows) at scale. Everything
    is per-row expression work plus one id-keyed join against the
    planted pair list; signatures and set intersections reuse the
    dedup operators unchanged."""
    d = _docs_neardup(spark, sf_dir)
    sh = d.select(
        "doc_id", TX.shingle_hashes(F.col("text"), 3).alias("s")
    ).withColumn("sig", DD.minhash_signature(F.col("s")))
    pairs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 == 0)
        .select(
            F.col("doc_id").alias("id_a"),
            (F.col("doc_id") + 1_000_000).alias("id_b"),
        )
    )
    a = sh.select(
        F.col("doc_id").alias("id_a"), F.col("s").alias("sa"), F.col("sig").alias("ga")
    )
    b = sh.select(
        F.col("doc_id").alias("id_b"), F.col("s").alias("sb"), F.col("sig").alias("gb")
    )
    j = pairs.join(a, "id_a").join(b, "id_b")
    n_eq = F.size(
        F.filter(
            F.zip_with(F.col("ga"), F.col("gb"), lambda x, y: x == y),
            lambda t: t,
        )
    )
    inter = F.size(F.array_intersect(F.col("sa"), F.col("sb")))
    union = F.size(F.array_union(F.col("sa"), F.col("sb")))
    return j.select(
        "id_a",
        "id_b",
        n_eq.cast("long").alias("n_eq"),
        r6(n_eq.cast("double") / DD.N_PERMS).alias("est_jaccard"),
        r6(inter.cast("double") / union).alias("exact_jaccard"),
    )


# ---------------------------------------------------------------------------
# Pareto frontier (2-D skyline)
# ---------------------------------------------------------------------------


@query(
    "pareto_frontier_parts",
    oracle="""
WITH pc AS (
  SELECT p_partkey, CAST(ROUND(p_retailprice * 100) AS BIGINT) AS price_cents,
         CAST(p_size AS BIGINT) AS p_size
  FROM part
)
SELECT p.p_partkey, p.price_cents, p.p_size
FROM pc p
WHERE NOT EXISTS (
  SELECT 1 FROM pc q
  WHERE q.price_cents <= p.price_cents AND q.p_size <= p.p_size
    AND (q.price_cents < p.price_cents OR q.p_size < p.p_size)
)
""",
)
def q_pareto_frontier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline: parts not dominated on (price, size) — minimize
    both; a part is dominated if another is <= on both axes and
    strictly < on one. The oracle states the NOT EXISTS semantics; the
    Spark plan avoids the quadratic anti-join entirely with the sorted
    running-min formulation: per-price minimum size (one hash agg over
    the full table), then a strict running minimum across ascending
    prices — computed on the DISTINCT-PRICE aggregate, which is
    cardinality-bounded (price domain, not row count), so the global
    window sorts thousands of group rows, never the fact table. Parts
    re-qualify by equality against their price's frontier size. At
    100x the agg shrinks the window input by the duplication factor;
    a d-dimensional skyline generalizes via local-skyline partial
    aggregation (each partition's skyline is a superset filter) +
    merge, the same partial/final shape."""
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.round(F.col("p_retailprice") * 100).cast("long").alias("price_cents"),
        F.col("p_size").cast("long").alias("p_size"),
    )
    g = p.groupBy("price_cents").agg(F.min("p_size").alias("msize"))
    from pyspark.sql.window import Window

    w = Window.orderBy("price_cents").rowsBetween(Window.unboundedPreceding, -1)
    g = g.withColumn("rmin", F.min("msize").over(w))
    frontier_prices = g.filter(
        F.col("rmin").isNull() | (F.col("msize") < F.col("rmin"))
    ).select(
        F.col("price_cents").alias("f_cents"), F.col("msize").alias("f_size")
    )
    return p.join(
        F.broadcast(frontier_prices),
        (F.col("price_cents") == F.col("f_cents"))
        & (F.col("p_size") == F.col("f_size")),
    ).select("p_partkey", "price_cents", "p_size")


# ---------------------------------------------------------------------------
# Revenue concentration (Gini coefficient)
# ---------------------------------------------------------------------------


@query(
    "customer_revenue_gini",
    oracle="""
WITH rev AS (
  SELECT o_custkey, SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY 1
),
ranked AS (
  SELECT cents, row_number() OVER (ORDER BY cents ASC, o_custkey ASC) AS rk
  FROM rev
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
         CAST(SUM(cents) AS BIGINT) AS total_cents,
         CAST(SUM(rk * cents) AS BIGINT) AS weighted_sum
  FROM ranked
)
SELECT n_customers, total_cents, weighted_sum,
       ROUND(2.0 * weighted_sum / (n_customers * CAST(total_cents AS DOUBLE))
             - (n_customers + 1.0) / n_customers, 6) AS gini
FROM s
""",
)
def q_customer_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration audit: exact Gini coefficient over
    per-customer revenue — the sampling-weight / data-balance
    diagnostic a corpus pipeline runs before choosing mixture weights
    (cf. source_temperature_mix). Money stays in integer cents and the
    rank-weighted sum stays in BIGINT, so the only float op is the
    final two-division formula — engine-stable under r6. The global
    rank runs on the per-customer AGGREGATE (customer-domain rows,
    1.5k at sf 0.01), never the order table; at 100x the aggregate
    still fits a single window task, and beyond that the formula
    decomposes over value-sorted range partitions (rank offsets are
    per-partition constants)."""
    rev = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"))
    )
    from pyspark.sql.window import Window

    ranked = rev.withColumn(
        "rk", F.row_number().over(Window.orderBy(F.asc("cents"), F.asc("o_custkey")))
    )
    s = ranked.agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("cents").alias("total_cents"),
        F.sum(F.col("rk") * F.col("cents")).alias("weighted_sum"),
    )
    return s.select(
        "n_customers",
        "total_cents",
        "weighted_sum",
        r6(
            F.lit(2.0) * F.col("weighted_sum")
            / (F.col("n_customers") * F.col("total_cents").cast("double"))
            - (F.col("n_customers") + F.lit(1.0)) / F.col("n_customers")
        ).alias("gini"),
    )


# ---------------------------------------------------------------------------
# Streaming heavy hitters: CMS maintained by the streaming state store
# ---------------------------------------------------------------------------


def _sql_cms_events() -> str:
    cell_rows = "\nUNION ALL\n".join(
        f"  SELECT {r} AS r, {SK.sql_cms_hash('user_id', r)} AS c,"
        f" COUNT(*) AS cnt FROM events GROUP BY 2"
        for r in range(SK.CMS_D)
    )
    probe_rows = "\nUNION ALL\n".join(
        f"  SELECT user_id, exact_cnt, {r} AS r,"
        f" {SK.sql_cms_hash('user_id', r)} AS c FROM top"
        for r in range(SK.CMS_D)
    )
    return f"""
WITH cells AS (
{cell_rows}
),
exact AS (SELECT user_id, COUNT(*) AS exact_cnt FROM events GROUP BY 1),
top AS (
  SELECT user_id, exact_cnt FROM (
    SELECT user_id, exact_cnt,
           row_number() OVER (ORDER BY exact_cnt DESC, user_id ASC) AS rn
    FROM exact
  ) WHERE rn <= {_CMS_TOPN}
),
probes AS (
{probe_rows}
),
est AS (
  SELECT p.user_id, p.exact_cnt, MIN(cells.cnt) AS cms_est
  FROM probes p JOIN cells ON cells.r = p.r AND cells.c = p.c
  GROUP BY 1, 2
)
SELECT user_id, CAST(exact_cnt AS BIGINT) AS exact_cnt,
       CAST(cms_est AS BIGINT) AS cms_est,
       CAST(cms_est - exact_cnt AS BIGINT) AS overcount
FROM est
"""


@query("streaming_heavy_hitters", oracle=_sql_cms_events())
def q_streaming_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The count-min sketch maintained INCREMENTALLY by Structured
    Streaming: the (hash_row, counter) cells are a streaming update-mode
    aggregation, so the engine's keyed state store carries the sketch
    across micro-batches — a sketch is mergeable by construction, which
    is exactly what makes it streamable with bounded (d*w) state no
    matter how many events flow through. The drained cells must produce
    the SAME point estimates as the batch-built sketch (the DuckDB
    oracle), proving the incremental merge is lossless. Exact per-key
    counts are computed batch-side only to rank the probe keys and
    exhibit the one-sided error."""

    from bigdata_invoice_stream_analysis_spark.plans.queries import _run_drain

    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    from bigdata_invoice_stream_analysis_spark.plans.queries import _drain_input_diet

    stream = _drain_input_diet(stream)
    cells_stream = SK.cms_cells(stream.select("user_id"), "user_id")
    acc: dict[tuple[int, int], int] = {}

    def sink(bdf, _bid):
        for r in bdf.collect():
            acc[(r["r"], r["c"])] = r["cnt"]

    ckpt = fresh_checkpoint("stream_cms_ckpt_")
    writer = (
        cells_stream.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
    )
    _run_drain(spark, writer)
    cells = spark.createDataFrame(
        [(r, c, int(n)) for (r, c), n in sorted(acc.items())],
        "r int, c long, cnt long",
    )
    ev = load_table(spark, sf_dir, "events").select("user_id")
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_cnt"))
    top = exact.orderBy(F.desc("exact_cnt"), F.asc("user_id")).limit(_CMS_TOPN)
    est = SK.cms_estimate(top.select("user_id"), cells, "user_id")
    return top.join(F.broadcast(est), "user_id").select(
        "user_id",
        "exact_cnt",
        "cms_est",
        (F.col("cms_est") - F.col("exact_cnt")).alias("overcount"),
    )


# ---------------------------------------------------------------------------
# Bucketed co-partitioned join (zero-Exchange join, driver-gated)
# ---------------------------------------------------------------------------


@query(
    "bucketed_join_revenue",
    oracle="""
SELECT o.o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1
""",
)
def q_bucketed_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB join posture, driver-gated end to end: lineitem and
    orders are PERSISTED bucketed (and sorted) by the join key with the
    same bucket count, then joined — Catalyst recognizes the
    co-partitioning from catalog metadata and plans a sort-merge join
    with NO Exchange and no per-query sort on either side (plan proven
    in tests/test_scale_paths.py; this query gates the RESULT through
    the oracle). At 100 TB this is the difference between re-shuffling
    the fact table on every recurring join and paying the shuffle once
    at layout time — the bucketed write is the one-time cost a real
    deployment amortizes across every downstream join on the key."""

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    from bigdata_invoice_stream_analysis_spark.sources.tables import write_bucketed

    root = scratch_dir("bkt_join")
    write_bucketed(li, "bkt_lineitem_rev", "l_orderkey", 8, path=f"{root}/li")
    write_bucketed(o, "bkt_orders_rev", "o_orderkey", 8, path=f"{root}/o")
    lb = spark.table("bkt_lineitem_rev")
    ob = spark.table("bkt_orders_rev")
    j = lb.join(ob, lb["l_orderkey"] == ob["o_orderkey"])
    return j.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
            "revenue_cents"
        ),
    )


# ---------------------------------------------------------------------------
# Python UDTF surface, driver-gated (sentence segmentation stats)
# ---------------------------------------------------------------------------

_SENT_W = 12


@query(
    "sentence_stats_udtf",
    oracle=f"""
WITH tok AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
punct AS (
  SELECT doc_id,
         array_to_string({TX.sql_chunks('toks', _SENT_W)}, '. ') || '.' AS text2
  FROM tok WHERE len(toks) > 0
),
sents AS (
  SELECT doc_id,
         list_filter(list_transform(string_split_regex(text2, '[.!?]'),
                                    s -> trim(s)), s -> s != '') AS ss
  FROM punct
)
SELECT doc_id,
       CAST(len(ss) AS BIGINT) AS n_sentences,
       -- +1 per sentence: the UDTF keeps the terminating period the
       -- relational split consumes (every sentence here has exactly one)
       CAST(list_sum(list_transform(ss, s -> length(s) + 1)) AS BIGINT) AS total_chars,
       CAST(list_max(list_transform(ss, s -> length(s) + 1)) AS BIGINT) AS max_chars
FROM sents
""",
)
def q_sentence_stats_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 3.5+ table function) in the graded path:
    documents are deterministically punctuated (a period between every
    {w}-token chunk — the corpus has none of its own), LATERAL-joined
    through the ``split_sentences`` UDTF (functions/udtf_fns.py), and
    re-aggregated into per-doc sentence statistics. The UDTF is the
    procedural row expansion (offset-tracking segmentation state that
    a declarative explode cannot carry); everything around it stays
    native. Oracle replicates the segmentation relationally, proving
    the UDTF's semantics, not just its plumbing."""
    from bigdata_invoice_stream_analysis_spark.functions.udtf_fns import (
        split_sentences,
    )

    spark.udtf.register("split_sentences", split_sentences)
    d = load_table(spark, sf_dir, "documents")
    toks = TX.tokenize(F.col("text"))
    punct = d.select(
        "doc_id",
        F.concat(
            F.concat_ws(". ", TX.chunks(toks, _SENT_W)), F.lit(".")
        ).alias("text2"),
    ).filter(F.size(toks) > 0)
    punct.createOrReplaceTempView("udtf_punct_docs")
    sent = spark.sql(
        "SELECT d.doc_id, s.n_chars FROM udtf_punct_docs d, "
        "LATERAL split_sentences(d.text2) s"
    )
    return sent.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_sentences"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.max("n_chars").cast("long").alias("max_chars"),
    )


# ---------------------------------------------------------------------------
# Wide→long unpivot (melt) surface
# ---------------------------------------------------------------------------


@query(
    "unpivot_metrics",
    oracle="""
WITH w AS (
  SELECT o_orderpriority,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
         CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custs
  FROM orders GROUP BY 1
)
SELECT o_orderpriority, 'n_orders' AS metric, n_orders AS value FROM w
UNION ALL
SELECT o_orderpriority, 'sum_cents', sum_cents FROM w
UNION ALL
SELECT o_orderpriority, 'n_custs', n_custs FROM w
""",
)
def q_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape through the native unpivot/melt operator (the
    inverse of status_priority_pivot's relational pivot): a per-priority
    metrics row explodes into (priority, metric, value) triples. Spark
    plans unpivot as a single Expand over the aggregated rows — one
    pass, no join, no union of re-scans (the UNION ALL oracle states
    the semantics; the engine does NOT execute it that way)."""
    o = load_table(spark, sf_dir, "orders")
    w = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("sum_cents"),
        F.count_distinct("o_custkey").alias("n_custs"),
    )
    return w.unpivot(
        ids=["o_orderpriority"],
        values=["n_orders", "sum_cents", "n_custs"],
        variableColumnName="metric",
        valueColumnName="value",
    )


# ---------------------------------------------------------------------------
# Event-transition matrix (first-order Markov over user event streams)
# ---------------------------------------------------------------------------


@query(
    "event_transition_matrix",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events
),
c AS (
  SELECT event_type, next_type, COUNT(*) AS cnt
  FROM seq WHERE next_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT event_type, next_type, CAST(cnt AS BIGINT) AS cnt,
       ROUND(CAST(cnt AS DOUBLE) / SUM(cnt) OVER (PARTITION BY event_type), 6)
         AS prob
FROM c
""",
)
def q_event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    streams (the session-flow diagnostic behind funnel design):
    next-event pairs come from ONE lead() window on the user_id
    exchange (ties broken by event_id for determinism), then a
    transition-domain aggregation — event_type² rows — normalizes
    counts into conditional probabilities with a second, tiny window.
    No event self-join; the fact table crosses the wire once."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql.window import Window

    seq = ev.withColumn(
        "next_type",
        F.lead("event_type").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
        ),
    )
    c = (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wt = Window.partitionBy("event_type")
    return c.select(
        "event_type",
        "next_type",
        "cnt",
        r6(F.col("cnt").cast("double") / F.sum("cnt").over(wt)).alias("prob"),
    )


# ---------------------------------------------------------------------------
# End-to-end streaming anomaly pipeline (the reference's actual job),
# driver-gated
# ---------------------------------------------------------------------------

from bigdata_invoice_stream_analysis_spark.plans.queries import (  # noqa: E402
    FEATS_SELECT,
    PURCHASE_CTE,
    SCORING_CENTROIDS,
    SCORING_THRESHOLD,
    _FEATURE_ALIASES,
    _sql_sqdist,
    purchase_projection,
)


@query(
    "streaming_centroid_anomalies",
    oracle=f"""
WITH {PURCHASE_CTE}, feats AS ({FEATS_SELECT})
SELECT invoice_no,
       CASE WHEN {_sql_sqdist(SCORING_CENTROIDS[0])} <= {_sql_sqdist(SCORING_CENTROIDS[1])}
            THEN 0 ELSE 1 END AS prediction,
       ROUND(LEAST({_sql_sqdist(SCORING_CENTROIDS[0])}, {_sql_sqdist(SCORING_CENTROIDS[1])}), -3) AS dist,
       LEAST({_sql_sqdist(SCORING_CENTROIDS[0])}, {_sql_sqdist(SCORING_CENTROIDS[1])})
         > {SCORING_THRESHOLD!r} AS is_anomaly
FROM feats f
""",
)
def q_streaming_centroid_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's streaming job END TO END under the driver gate
    (InvoicePipeline.scala:133-148): purchase lines arrive as a STREAM
    (file-source lineitem), stream-static join against orders, the
    SHARED purchase projection (identical parse/derive as batch —
    train/serve consistency by construction), good-line filters, a
    keyed update-mode aggregation whose state store carries per-invoice
    integer sums across micro-batches, and nearest-centroid threshold
    scoring of the drained snapshot with plan-literal centroids. The
    result must hash-match the BATCH featurize+score oracle — proving
    the incremental state produces exactly the declarative aggregate.

    Scale notes: the stream side shuffles once on the join key, state
    is O(open invoices) integer sums, and scoring is per-row codegen —
    the same shapes the batch twins carry, now through
    IncrementalExecution."""

    from bigdata_invoice_stream_analysis_spark.functions.time_fns import (
        parse_invoice_ts,
    )
    from bigdata_invoice_stream_analysis_spark.plans.queries import _run_drain
    from bigdata_invoice_stream_analysis_spark.streaming.scoring import (
        score_with_centroids,
    )

    li_schema = spark.read.parquet(f"{sf_dir}/lineitem.parquet").schema
    sli = (
        spark.readStream.schema(li_schema)
        .option("pathGlobFilter", "lineitem.parquet")
        .parquet(sf_dir)
    )
    from bigdata_invoice_stream_analysis_spark.plans.queries import _drain_input_diet

    sli = _drain_input_diet(sli)
    o = load_table(spark, sf_dir, "orders")
    p = purchase_projection(sli.join(o, sli["l_orderkey"] == o["o_orderkey"]))
    p = p.filter(
        ~F.col("InvoiceNo").startswith("C")
        & ~(F.col("CustomerID").isNull() | (F.trim(F.col("CustomerID")) == ""))
    )
    ts = parse_invoice_ts(F.col("InvoiceDate"))
    cents = F.round(F.col("UnitPrice") * 100).cast("long")
    minutes = (F.hour(ts) * 60 + F.minute(ts)).cast("long")
    agg = p.groupBy("InvoiceNo").agg(
        F.sum(cents).alias("sum_cents"),
        F.min("UnitPrice").alias("min_unit_price"),
        F.max("UnitPrice").alias("max_unit_price"),
        F.sum(minutes).alias("sum_minutes"),
        F.sum("Quantity").cast("long").alias("sum_qty"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    acc: dict[str, tuple] = {}

    def sink(bdf, _bid):
        for r in bdf.collect():
            acc[r["InvoiceNo"]] = (
                r["sum_cents"], r["min_unit_price"], r["max_unit_price"],
                r["sum_minutes"], r["sum_qty"], r["n_lines"],
            )

    ckpt = fresh_checkpoint("stream_score_ckpt_")
    writer = (
        agg.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
    )
    _run_drain(spark, writer)
    snap = spark.createDataFrame(
        [(k,) + v for k, v in sorted(acc.items())],
        "InvoiceNo string, sum_cents long, min_unit_price double,"
        " max_unit_price double, sum_minutes long, sum_qty long, n_lines long",
    )
    feats = snap.filter(
        (F.col("sum_cents") > 0)
        & (F.col("min_unit_price") > 0)
        & (F.col("max_unit_price") > 0)
        & (F.col("sum_qty") > 0)
    ).select(
        F.col("InvoiceNo").alias("invoice_no"),
        (F.col("sum_cents") / (F.lit(100.0) * F.col("n_lines"))).alias(
            "avg_unit_price"
        ),
        "min_unit_price",
        "max_unit_price",
        (F.col("sum_minutes") / (F.lit(60.0) * F.col("n_lines"))).alias("time"),
        F.col("sum_qty").cast("double").alias("number_items"),
    )
    scored = score_with_centroids(feats, SCORING_CENTROIDS, _FEATURE_ALIASES)
    return scored.select(
        "invoice_no",
        "prediction",
        F.round(F.col("dist"), -3).alias("dist"),
        (F.col("dist") > F.lit(SCORING_THRESHOLD)).alias("is_anomaly"),
    )


# ---------------------------------------------------------------------------
# Centroid-based silhouette (clustering-quality audit)
# ---------------------------------------------------------------------------


def _sql_cdist(center: list[float]) -> str:
    terms = " + ".join(
        f"(f.{c} - {v!r}) * (f.{c} - {v!r})"
        for c, v in zip(_FEATURE_ALIASES, center)
    )
    return f"sqrt({terms})"


@query(
    "centroid_silhouette",
    oracle=f"""
WITH {PURCHASE_CTE}, feats AS ({FEATS_SELECT}),
scored AS (
  SELECT CASE WHEN {_sql_cdist(SCORING_CENTROIDS[0])} <= {_sql_cdist(SCORING_CENTROIDS[1])}
              THEN 0 ELSE 1 END AS prediction,
         LEAST({_sql_cdist(SCORING_CENTROIDS[0])}, {_sql_cdist(SCORING_CENTROIDS[1])}) AS a,
         GREATEST({_sql_cdist(SCORING_CENTROIDS[0])}, {_sql_cdist(SCORING_CENTROIDS[1])}) AS b
  FROM feats f
)
SELECT prediction,
       CAST(COUNT(*) AS BIGINT) AS n_points,
       CAST(SUM(CAST(ROUND((b - a) / GREATEST(a, b) * 1000000) AS BIGINT)) AS BIGINT)
         AS sum_s_micro,
       ROUND(SUM(CAST(ROUND((b - a) / GREATEST(a, b) * 1000000) AS BIGINT))
             / (1000000.0 * COUNT(*)), 6) AS mean_silhouette
FROM scored GROUP BY 1
""",
)
def q_centroid_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering-quality audit: the centroid-based (simplified)
    silhouette — a = distance to the assigned centroid, b = distance
    to the nearest OTHER centroid, s = (b-a)/max(a,b) — aggregated per
    cluster. The per-row math is pure codegen over the plan-literal
    centroids (no pairwise O(N²) term, which is what makes silhouette
    computable at corpus scale); per-row s is quantized to integer
    micro-units BEFORE the aggregation so the cross-partition sum is
    exact and shuffle-order-independent. From the registry of queries
    the reference's training job would need to pick k honestly (its
    elbow criterion, SURVEY §3.1, is gated separately)."""
    from bigdata_invoice_stream_analysis_spark.plans.queries import QUERIES as _Q

    feats = _Q["invoice_features"](spark, sf_dir)
    d0, d1 = [
        F.sqrt(
            sum(
                (F.col(c) - F.lit(v)) * (F.col(c) - F.lit(v))
                for c, v in zip(_FEATURE_ALIASES, ctr)
            )
        )
        for ctr in SCORING_CENTROIDS
    ]
    scored = feats.select(
        F.when(d0 <= d1, 0).otherwise(1).alias("prediction"),
        F.least(d0, d1).alias("a"),
        F.greatest(d0, d1).alias("b"),
    )
    s_micro = F.round(
        (F.col("b") - F.col("a")) / F.greatest(F.col("a"), F.col("b")) * 1_000_000
    ).cast("long")
    return scored.groupBy("prediction").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum(s_micro).alias("sum_s_micro"),
        r6(F.sum(s_micro) / (F.lit(1_000_000.0) * F.count(F.lit(1)))).alias(
            "mean_silhouette"
        ),
    )


# ---------------------------------------------------------------------------
# Snapshot reconciliation (table diff audit)
# ---------------------------------------------------------------------------


@query(
    "table_diff_audit",
    oracle="""
WITH a AS (
  SELECT o_orderkey AS k, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
         o_orderstatus AS st
  FROM orders
),
b AS (
  SELECT o_orderkey AS k,
         CAST(ROUND(o_totalprice * 100) AS BIGINT)
           + CASE WHEN o_orderkey % 101 = 0 THEN 100 ELSE 0 END AS cents,
         o_orderstatus AS st
  FROM orders WHERE o_orderkey % 103 != 0
  UNION ALL
  SELECT o_orderkey + 10000000,
         CAST(ROUND(o_totalprice * 100) AS BIGINT), o_orderstatus
  FROM orders WHERE o_orderkey % 107 = 0
),
d AS (
  SELECT a.k AS ka, b.k AS kb,
         CASE WHEN a.cents = b.cents AND a.st = b.st THEN 0 ELSE 1 END AS chg
  FROM a FULL OUTER JOIN b ON a.k = b.k
)
SELECT CAST(SUM(CASE WHEN ka IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
       CAST(SUM(CASE WHEN kb IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       CAST(SUM(CASE WHEN ka IS NOT NULL AND kb IS NOT NULL THEN chg ELSE 0 END) AS BIGINT) AS n_changed,
       CAST(SUM(CASE WHEN ka IS NOT NULL AND kb IS NOT NULL AND chg = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged
FROM d
""",
)
def q_table_diff_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation — the anti-entropy audit run between two
    versions of a table (replica divergence, backfill validation, CDC
    sanity): a keyed full outer join classifying every key as
    added / removed / changed / unchanged by comparing integer row
    digests. Version B is derived deterministically (drop %103 keys,
    perturb %101 prices, insert %107 copies under new keys) so both
    engines diff identical snapshots. One key-partitioned shuffle per
    side; at 100 TB the row digest would be a hash over all columns
    computed at scan time, and the join output is counts only — the
    shuffle never carries the wide rows."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    a = o.select(
        F.col("o_orderkey").alias("k"),
        cents.alias("cents"),
        F.col("o_orderstatus").alias("st"),
    )
    b_mod = o.filter(F.col("o_orderkey") % 103 != 0).select(
        F.col("o_orderkey").alias("k"),
        (cents + F.when(F.col("o_orderkey") % 101 == 0, 100).otherwise(0)).alias(
            "cents"
        ),
        F.col("o_orderstatus").alias("st"),
    )
    b_new = o.filter(F.col("o_orderkey") % 107 == 0).select(
        (F.col("o_orderkey") + 10_000_000).alias("k"),
        cents.alias("cents"),
        F.col("o_orderstatus").alias("st"),
    )
    b = b_mod.unionAll(b_new)
    d = a.alias("a").join(b.alias("b"), F.col("a.k") == F.col("b.k"), "full_outer")
    chg = F.when(
        (F.col("a.cents") == F.col("b.cents")) & (F.col("a.st") == F.col("b.st")), 0
    ).otherwise(1)
    both = F.col("a.k").isNotNull() & F.col("b.k").isNotNull()
    return d.agg(
        F.sum(F.when(F.col("a.k").isNull(), 1).otherwise(0)).alias("n_added"),
        F.sum(F.when(F.col("b.k").isNull(), 1).otherwise(0)).alias("n_removed"),
        F.sum(F.when(both, chg).otherwise(0)).alias("n_changed"),
        F.sum(F.when(both & (chg == 0), 1).otherwise(0)).alias("n_unchanged"),
    )


# ---------------------------------------------------------------------------
# Ordered integer EWMA per key (recursive fold the window API can't express)
# ---------------------------------------------------------------------------


@query(
    "user_value_ewma",
    oracle="""
WITH ordered AS (
  SELECT user_id,
         list(CAST(ROUND(value * 100) AS BIGINT) ORDER BY ts, event_id) AS vals
  FROM events GROUP BY 1
)
SELECT user_id,
       CAST(len(vals) AS BIGINT) AS n_events,
       CAST(list_reduce(vals, (acc, x) -> (3 * acc + x) // 4) AS BIGINT) AS ewma_cents
FROM ordered
""",
)
def q_user_value_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average per user with alpha = 1/4
    carried as EXACT integer arithmetic: e_t = (3*e_{t-1} + x_t) div 4
    over the (ts, event_id)-ordered value stream. A recursive
    per-element fold is precisely what SQL window frames cannot
    express (each output depends on the previous OUTPUT, not the
    previous input), so the engine shape is: one keyed shuffle,
    in-group ordering via sort_array on (ts, event_id, value) structs,
    then a higher-order fold — state O(1) per group, no UDF. The
    streaming twin is the same recurrence inside keyed state
    (streaming/state.py's update pattern)."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    g = ev.groupBy("user_id").agg(
        F.sort_array(
            F.collect_list(
                F.struct(F.col("ts"), F.col("event_id"), cents.alias("cents"))
            )
        ).alias("evs")
    )
    vals = F.transform(F.col("evs"), lambda e: e["cents"])
    # (3*acc + x) div 4: operands are non-negative cents, so long-cast
    # truncation equals DuckDB's floor division bit-for-bit.
    ewma = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1),
        lambda acc, x: ((F.lit(3) * acc + x) / F.lit(4)).cast("long"),
    )
    return g.select(
        "user_id",
        F.size("evs").cast("long").alias("n_events"),
        ewma.alias("ewma_cents"),
    )


# ---------------------------------------------------------------------------
# Multimodal resize (NN-resample) profile, driver-gated
# ---------------------------------------------------------------------------

from bigdata_invoice_stream_analysis_spark.operators import multimodal as MM  # noqa: E402

_RS_W, _RS_H = 16, 4


@query(
    "media_resize_profile",
    oracle=f"""
WITH m AS (
  SELECT doc_id AS media_id, text, length(text) AS w FROM documents
),
sel AS (
  SELECT media_id,
         list_transform(generate_series(0, {_RS_W - 1}),
                        c -> CAST(ascii(substr(text, (c * w) // {_RS_W} + 1, 1)) AS BIGINT)) AS rowbytes
  FROM m
)
SELECT media_id,
       CAST({_RS_W * _RS_H} AS BIGINT) AS n_bytes,
       CAST({_RS_H} * list_sum(rowbytes) AS BIGINT) AS byte_sum,
       CAST(list_min(rowbytes) AS INT) AS byte_min,
       CAST(list_max(rowbytes) AS INT) AS byte_max,
       'image' AS kind
FROM sel
""",
)
def q_media_resize_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The image-resize stage of a multimodal pipeline, driver-gated:
    documents-as-media payloads run through the deterministic
    nearest-neighbor resample (operators/multimodal.resize_stub,
    resample=True — real NN index arithmetic over the byte raster;
    only the codec is a stand-in) to a {w}x{h} raster, then through the
    same Arrow byte-stats extractor as media_byte_stats. The oracle
    recomputes the NN sampling relationally (payload height is 1, so
    every output row repeats the column samples (c*w)//{w}), proving
    the resample's INDEX MATH, not just that bytes moved. Plan: two
    chained mapInPandas stages, zero shuffle — the whole pipeline is
    scan-parallel at any scale."""
    media = MM.documents_as_media(load_table(spark, sf_dir, "documents"))
    resized = MM.resize_stub(media, _RS_W, _RS_H, resample=True)
    return MM.extract_byte_stats(resized)


# ---------------------------------------------------------------------------
# Referential-integrity audit (FK violation counts)
# ---------------------------------------------------------------------------


@query(
    "fk_integrity_audit",
    oracle="""
WITH cust_kept AS (SELECT c_custkey FROM customer WHERE c_custkey % 211 != 0),
part_kept AS (SELECT p_partkey FROM part WHERE p_partkey % 223 != 0)
SELECT
  CAST((SELECT COUNT(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM cust_kept c WHERE c.c_custkey = o.o_custkey))
       AS BIGINT) AS orphan_orders,
  CAST((SELECT COUNT(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM part_kept p WHERE p.p_partkey = l.l_partkey))
       AS BIGINT) AS orphan_lineitems,
  CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS n_orders,
  CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT) AS n_lineitems
""",
)
def q_fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit — the data-quality gate run before
    any fact/dim join is trusted: count fact rows whose foreign key has
    no match in the dimension, via LEFT ANTI joins (Catalyst's
    NOT EXISTS plan). Violations are planted deterministically by
    thinning the dimension side (%211 customers, %223 parts dropped)
    so both engines audit identical states. Each audit is one
    key-shuffle anti join where only the KEY column crosses the wire;
    the dims broadcast when they fit. At 100 TB this runs as a
    by-product of the bucketed layout (same key partitioning as the
    production joins)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") % 211 != 0
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") % 223 != 0)
    orphan_o = o.join(
        cust, o["o_custkey"] == cust["c_custkey"], "left_anti"
    ).agg(F.count(F.lit(1)).alias("orphan_orders"))
    orphan_l = li.join(
        part, li["l_partkey"] == part["p_partkey"], "left_anti"
    ).agg(F.count(F.lit(1)).alias("orphan_lineitems"))
    totals = o.agg(F.count(F.lit(1)).alias("n_orders")).crossJoin(
        li.agg(F.count(F.lit(1)).alias("n_lineitems"))
    )
    return orphan_o.crossJoin(orphan_l).crossJoin(totals)


# ---------------------------------------------------------------------------
# Corpus curation funnel (lang -> quality -> dedup, one audited pass)
# ---------------------------------------------------------------------------

from bigdata_invoice_stream_analysis_spark.plans.extensions import (  # noqa: E402
    QF_MAX_STOPWORD_RATIO,
    QF_MIN_TOKENS,
)


def _sql_funnel() -> str:
    q = TX.sql_quality_features("text")
    lang_pred, _ = TX.sql_detect_language("text")
    fp = TX.sql_fingerprint("text")
    return f"""
WITH {DOCS_EXACTDUP_CTE},
feat AS (
  SELECT doc_id, text, length(text) AS n_chars,
         {q["n_tokens"]} AS n_tokens,
         {q["stopword_ratio"]} AS stopword_ratio,
         ({lang_pred}) = 'en' AS lang_ok,
         {fp} AS fp
  FROM docs_aug
),
v AS (
  SELECT doc_id, n_chars, lang_ok, fp,
         (n_tokens >= {QF_MIN_TOKENS} AND stopword_ratio <= {QF_MAX_STOPWORD_RATIO})
           AS q_ok
  FROM feat
),
d AS (
  SELECT doc_id, n_chars, lang_ok, q_ok,
         CASE WHEN lang_ok AND q_ok THEN
           row_number() OVER (PARTITION BY fp, CASE WHEN lang_ok AND q_ok THEN 1 ELSE 0 END
                              ORDER BY doc_id)
         ELSE NULL END AS rn
  FROM v
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_input,
       CAST(SUM(n_chars) AS BIGINT) AS chars_input,
       CAST(SUM(CASE WHEN lang_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_lang,
       CAST(SUM(CASE WHEN lang_ok AND q_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
       CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dedup,
       CAST(SUM(CASE WHEN rn = 1 THEN n_chars ELSE 0 END) AS BIGINT) AS chars_dedup
FROM d
"""


@query("corpus_curation_funnel", oracle=_sql_funnel())
def q_corpus_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation report a pretraining-data pipeline publishes per
    snapshot: one pass computing how many documents (and chars) survive
    each stage — language ID, quality filter, exact dedup keep-first —
    over the dup-augmented corpus. Stage predicates are pure per-row
    expressions stacked in ONE scan; the only shuffle is the
    fingerprint window for the dedup stage, keyed by the 8-byte hash.
    Composition is the point: every stage reuses the gated operator
    (language_id / quality_filter_verdicts / exact_dedup_groups
    semantics) unchanged, so the funnel numbers reconcile with the
    per-stage queries."""
    from pyspark.sql.window import Window

    d = docs_exactdup(spark, sf_dir)
    feats = TX.quality_features(F.col("text"))
    base = d.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        (TX.detect_language(F.col("text")) == "en").alias("lang_ok"),
        (
            (feats["n_tokens"] >= QF_MIN_TOKENS)
            & (feats["stopword_ratio"] <= QF_MAX_STOPWORD_RATIO)
        ).alias("q_ok"),
        TX.fingerprint(F.col("text")).alias("fp"),
    )
    passing = F.col("lang_ok") & F.col("q_ok")
    w = Window.partitionBy(
        "fp", F.when(passing, 1).otherwise(0)
    ).orderBy("doc_id")
    ranked = base.withColumn(
        "rn", F.when(passing, F.row_number().over(w)).otherwise(F.lit(None))
    )
    return ranked.agg(
        F.count(F.lit(1)).alias("n_input"),
        F.sum("n_chars").alias("chars_input"),
        F.sum(F.when(F.col("lang_ok"), 1).otherwise(0)).alias("n_lang"),
        F.sum(F.when(passing, 1).otherwise(0)).alias("n_quality"),
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).alias("n_dedup"),
        F.sum(F.when(F.col("rn") == 1, F.col("n_chars")).otherwise(0)).alias(
            "chars_dedup"
        ),
    )


# ---------------------------------------------------------------------------
# Late-interaction retrieval (ColBERT-style MaxSim top-k)
# ---------------------------------------------------------------------------

_MS_TOK = 8  # token vectors per doc (64-dim embedding -> 8 x 8-dim)
_MS_QUERIES = 10
_MS_K = 5


def _sql_maxsim() -> str:
    tok_dot = (
        "CAST(list_sum(list_transform(generate_series(1, 8),"
        " d -> q.qv[(i - 1) * 8 + d] * c.qv[(j - 1) * 8 + d])) AS DOUBLE)"
    )
    tok_norm = (
        "sqrt(CAST(list_sum(list_transform(generate_series(1, 8),"
        " d -> {v}.qv[({t} - 1) * 8 + d] * {v}.qv[({t} - 1) * 8 + d])) AS DOUBLE))"
    )
    qn = tok_norm.format(v="q", t="i")
    cn = tok_norm.format(v="c", t="j")
    return f"""
WITH qv AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS qv
  FROM embeddings
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         list_sum(list_transform(generate_series(1, {_MS_TOK}), i ->
           list_max(list_transform(generate_series(1, {_MS_TOK}), j ->
             {tok_dot} / ({qn} * {cn})))))
           AS score
  FROM qv q JOIN qv c ON q.vec_id < {_MS_QUERIES} AND c.vec_id != q.vec_id
)
SELECT query_id, cand_id, ROUND(score, 6) AS score, CAST(rank AS INT) AS rank
FROM (
  SELECT query_id, cand_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, cand_id ASC) AS rank
  FROM scored
) WHERE rank <= {_MS_K}
"""


@query("maxsim_topk", oracle=_sql_maxsim())
def q_maxsim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-interaction retrieval (ColBERT's MaxSim, Khattab &
    Zaharia 2020): each embedding is treated as {t} token vectors
    (8-dim slices); score(query, doc) = sum over query tokens of the
    MAX cosine against any doc token. Executed the way a production
    late-interaction scorer runs on Spark: the query token matrices
    broadcast, and each Arrow batch scores its candidates with two
    einsum-shaped numpy contractions (token-dot tensor -> max over doc
    tokens -> sum over query tokens) — the per-pair cost is one 8x8
    integer GEMM, vectorized across the batch. Integer token dots and
    correctly-rounded sqrts keep the floats engine-identical; ranking
    ties break by candidate id."""
    import numpy as np
    import pandas as pd

    e = load_table(spark, sf_dir, "embeddings")
    base = e.select("vec_id", SIM.quantize(F.col("embedding")).alias("qv"))
    qrows = sorted(
        base.filter(F.col("vec_id") < _MS_QUERIES).collect(),
        key=lambda r: r["vec_id"],
    )
    Q = np.array([[int(x) for x in r["qv"]] for r in qrows], dtype=np.int64)
    q_ids = np.array([int(r["vec_id"]) for r in qrows], dtype=np.int64)
    nq = len(q_ids)
    Qt = Q.reshape(nq, _MS_TOK, 8)
    Qn = np.sqrt((Qt.astype(np.float64) ** 2).sum(axis=2))

    def score_batches(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            C = np.array(pdf["qv"].tolist(), dtype=np.int64).reshape(
                len(pdf), _MS_TOK, 8
            )
            Cn = np.sqrt((C.astype(np.float64) ** 2).sum(axis=2))
            # dots[b, q, i, j] = Qt[q, i] . C[b, j]
            dots = np.einsum("qid,bjd->bqij", Qt, C).astype(np.float64)
            cos = dots / (Qn[None, :, :, None] * Cn[:, None, None, :])
            score = cos.max(axis=3).sum(axis=2)  # max over doc tokens, sum over query tokens
            cand = pdf["vec_id"].values
            out = pd.DataFrame(
                {
                    "query_id": np.repeat(q_ids, len(pdf)),
                    "cand_id": np.tile(cand, nq),
                    "score": score.T.reshape(-1),
                }
            )
            yield out[out["query_id"] != out["cand_id"]]

    scored = base.mapInPandas(
        score_batches, schema="query_id long, cand_id long, score double"
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _MS_K)
        .select(
            "query_id", "cand_id", r6(F.col("score")).alias("score"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


# ---------------------------------------------------------------------------
# BM25-lite document search (log-free rational idf, integer-exact sums)
# ---------------------------------------------------------------------------

_BM25_QUERY = ["table", "spark", "window", "vector", "merge"]
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPN = 20


def _sql_bm25() -> str:
    terms = ", ".join(f"'{t}'" for t in _BM25_QUERY)
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({_SQL_TOKS}) AS token FROM documents
),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY 1),
stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
                 AVG(CAST(dl AS DOUBLE)) AS avgdl FROM dl),
tf AS (
  SELECT doc_id, token, COUNT(*) AS tf FROM tok
  WHERE token IN ({terms}) GROUP BY 1, 2
),
df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
term_scores AS (
  SELECT tf.doc_id,
         CAST(ROUND(
           ((s.n_docs - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf * ({_BM25_K1} + 1))
           / (tf.tf + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dl.dl / s.avgdl))
           * 1000000) AS BIGINT) AS s_micro
  FROM tf JOIN df USING (token) JOIN dl USING (doc_id) CROSS JOIN stats s
),
scored AS (
  SELECT doc_id, CAST(SUM(s_micro) AS BIGINT) AS score_micro
  FROM term_scores GROUP BY 1
)
SELECT doc_id, score_micro, CAST(rank AS INT) AS rank
FROM (
  SELECT doc_id, score_micro,
         row_number() OVER (ORDER BY score_micro DESC, doc_id ASC) AS rank
  FROM scored
) WHERE rank <= {_BM25_TOPN}
"""


@query("bm25_lite_search", oracle=_sql_bm25())
def q_bm25_lite_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-text relevance search with BM25 term weighting — idf kept
    as the RATIO (N - df + 0.5)/(df + 0.5) rather than its log (ln is
    not bit-specified across engines; the ratio is monotone in the
    same df, so ranking semantics survive — documented deviation).
    Per-term scores are quantized to integer micro-units BEFORE the
    per-doc sum, so cross-partition aggregation is exact. Plan: the
    token explode is filtered to the query terms AT THE EXPLODE (the
    inverted-index access pattern — only matching postings shuffle);
    doc lengths aggregate in the same pass family; df and avgdl are
    term-domain/1-row broadcasts; final top-20 is
    TakeOrderedAndProject."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(TX.tokenize(F.col("text"))).alias("token"))
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg(F.col("dl").cast("double")).alias("avgdl"),
    )
    tf = (
        tok.filter(F.col("token").isin(_BM25_QUERY))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    term = (
        tf.join(F.broadcast(df_), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    s_micro = F.round(
        ((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
        * (F.col("tf") * (_BM25_K1 + 1))
        / (
            F.col("tf")
            + _BM25_K1 * (1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
        )
        * 1_000_000
    ).cast("long")
    scored = term.select("doc_id", s_micro.alias("s_micro")).groupBy("doc_id").agg(
        F.sum("s_micro").alias("score_micro")
    )
    top = scored.orderBy(F.desc("score_micro"), F.asc("doc_id")).limit(_BM25_TOPN)
    from pyspark.sql.window import Window

    w = Window.orderBy(F.desc("score_micro"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(w).cast("int"))


from bigdata_invoice_stream_analysis_spark.operators import sampling as SAMPLING  # noqa: E402


# ---------------------------------------------------------------------------
# Leakage-aware group split (whole sources stay in one split)
# ---------------------------------------------------------------------------


@query(
    "group_aware_split",
    oracle=f"""
WITH s AS (
  SELECT source, {SAMPLING.sql_split_case("source", 0.7, 0.15)} AS split,
         length(text) AS n_chars
  FROM documents
)
SELECT split,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM s GROUP BY 1
""",
)
def q_group_aware_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-aware train/val/test split: the hash key is the GROUP
    (source/site), not the row — every document of a site lands in the
    same split, so near-duplicate pages within a site can never
    straddle the train/eval boundary (the contamination mode row-level
    splitting invites; split_contamination measures exactly that
    residue). Same zero-shuffle md5-bucket mechanics as
    stratified_split — the only change is the key, which is the whole
    point: split keys must be chosen at the leakage granularity."""
    d = SAMPLING.with_split(
        load_table(spark, sf_dir, "documents"), "source", train=0.7, val=0.15
    )
    return d.groupBy("split").agg(
        F.count_distinct("source").alias("n_sources"),
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text")).alias("total_chars"),
    )


# ---------------------------------------------------------------------------
# Length-bucketed batch planning (padding-efficiency audit)
# ---------------------------------------------------------------------------

_LB_BUCKET = 64  # token-length bucket width
_LB_BATCH = 16   # sequences per batch


@query(
    "length_bucketed_batches",
    oracle=f"""
WITH dl AS (
  SELECT doc_id, len({TX.SQL_TOKENIZE.format(col="text")}) AS n_tok FROM documents
),
b AS (
  SELECT (n_tok // {_LB_BUCKET}) AS bucket, COUNT(*) AS n_docs,
         SUM(n_tok) AS sum_tok, MAX(n_tok) AS max_tok
  FROM dl GROUP BY 1
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(CEIL(CAST(n_docs AS DOUBLE) / {_LB_BATCH}) AS BIGINT) AS n_batches,
       CAST(sum_tok AS BIGINT) AS sum_tok,
       CAST(n_docs * ((bucket + 1) * {_LB_BUCKET}) - sum_tok AS BIGINT) AS pad_waste
FROM b
""",
)
def q_length_bucketed_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batch planning — the padding-efficiency audit
    behind bucketed batching for sequence training (cf.
    sequence_packing, which packs instead of pads): documents group
    into {w}-token length buckets, each bucket pads to its ceiling, and
    the report prices the padding waste per bucket. Per-row length +
    one bucket-domain aggregation; the bucket id doubles as the
    repartition key a real loader would write by."""
    d = load_table(spark, sf_dir, "documents")
    n_tok = F.size(TX.tokenize(F.col("text")))
    b = (
        d.select((n_tok / _LB_BUCKET).cast("long").alias("bucket"), n_tok.alias("n_tok"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("long").alias("sum_tok"),
        )
    )
    return b.select(
        "bucket",
        "n_docs",
        F.ceil(F.col("n_docs").cast("double") / _LB_BATCH).alias("n_batches"),
        "sum_tok",
        (
            F.col("n_docs") * ((F.col("bucket") + 1) * _LB_BUCKET) - F.col("sum_tok")
        ).alias("pad_waste"),
    )


# ---------------------------------------------------------------------------
# Cross-modal sample audit (text ⋈ embedding consistency)
# ---------------------------------------------------------------------------


@query(
    "crossmodal_sample_audit",
    oracle=f"""
WITH n2 AS (
  SELECT vec_id,
         CAST(list_sum(list_transform({SIM.SQL_QUANTIZE.format(v="embedding")},
                                      x -> x * x)) AS BIGINT) AS n2
  FROM embeddings
),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(n2) AS BIGINT) AS sum_n2 FROM n2),
j AS (
  SELECT d.doc_id,
         CAST(len({TX.SQL_TOKENIZE.format(col="d.text")}) AS BIGINT) AS n_tokens,
         n2.n2, s.n, s.sum_n2
  FROM documents d JOIN n2 ON n2.vec_id = d.doc_id CROSS JOIN s
)
SELECT doc_id, n_tokens, n2 AS norm2,
       (n2 * n > 2 * sum_n2) AS high_norm,
       (n_tokens < 30) AS short_text
FROM j
WHERE (n2 * n > 2 * sum_n2) OR (n_tokens < 30)
""",
)
def q_crossmodal_sample_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal consistency audit — the sample-quality sweep a
    multimodal training set runs across PAIRED columns: join each
    document to its embedding (doc_id = vec_id) and flag rows whose
    vector norm is an outlier (norm² > 2× the corpus mean, compared by
    exact integer CROSS-MULTIPLICATION — n2*N > 2*Σn2 — so no float
    mean is ever formed) or whose text is suspiciously short. The
    audit is one key join plus a 1-row statistics broadcast; both
    flags are per-row integer predicates. At 100 TB paired-modality
    joins like this are the backbone of contrastive-pair curation
    (CLIP-style), and the key join is the bucketed-layout case."""
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    n2 = e.select(
        F.col("vec_id"),
        SIM.int_norm2(SIM.quantize(F.col("embedding"))).alias("n2"),
    )
    s = n2.agg(
        F.count(F.lit(1)).alias("n"), F.sum("n2").alias("sum_n2")
    )
    j = (
        d.join(n2, d["doc_id"] == n2["vec_id"])
        .crossJoin(F.broadcast(s))
        .select(
            "doc_id",
            F.size(TX.tokenize(F.col("text"))).cast("long").alias("n_tokens"),
            F.col("n2").alias("norm2"),
            (F.col("n2") * F.col("n") > 2 * F.col("sum_n2")).alias("high_norm"),
            (F.size(TX.tokenize(F.col("text"))) < 30).alias("short_text"),
        )
    )
    return j.filter(F.col("high_norm") | F.col("short_text"))


# ---------------------------------------------------------------------------
# Day-of-week x hour load heatmap
# ---------------------------------------------------------------------------


@query(
    "event_dow_hour_heatmap",
    oracle="""
SELECT CAST(dayofweek(ts) + 1 AS INT) AS dow,
       CAST(EXTRACT(hour FROM ts) AS INT) AS hour,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events
GROUP BY 1, 2
""",
)
def q_event_dow_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal load heatmap: events bucketed by (day-of-week, hour) —
    the capacity-planning / seasonality matrix behind trigger sizing
    and backfill windows. Spark numbers Sunday=1; DuckDB's dayofweek
    is 0-based, so the oracle shifts by one. Pure per-row date parts into a 7x24-domain hash agg:
    partial aggregation collapses each partition to <=168 rows before
    the exchange, the smallest shuffle a full-table profile can have."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.dayofweek("ts").cast("int").alias("dow"),
        F.hour("ts").cast("int").alias("hour"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
    )


# ---------------------------------------------------------------------------
# Partitioned-write + partition-pruned read (lakehouse layout gate)
# ---------------------------------------------------------------------------


@query(
    "partitioned_write_prune",
    oracle="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events
WHERE CAST(ts AS DATE) BETWEEN DATE '1995-02-01' AND DATE '1995-02-28'
GROUP BY 1
""",
)
def q_partitioned_write_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The date-partitioned lakehouse layout, graded end to end: events
    are WRITTEN partitioned by event date (the layout every production
    event table uses), then read back with a date-range predicate that
    must be answered by PARTITION PRUNING — the scan lists only the
    matching date directories, never opening the rest
    (tests/test_plan_properties asserts the PartitionFilters). At
    100 TB this is the difference between scanning a month and
    scanning the table; the write itself is the one-time layout cost,
    exactly like bucketing for joins."""

    ev = load_table(spark, sf_dir, "events")
    root = scratch_dir("part_events")
    ev.withColumn("event_date", F.to_date("ts")).write.mode("overwrite").partitionBy(
        "event_date"
    ).parquet(root)
    back = spark.read.parquet(root)
    pruned = back.filter(
        (F.col("event_date") >= F.lit("1995-02-01").cast("date"))
        & (F.col("event_date") <= F.lit("1995-02-28").cast("date"))
    )
    return pruned.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
    )


# ---------------------------------------------------------------------------
# Schema-evolution merge read (mergeSchema over heterogeneous batches)
# ---------------------------------------------------------------------------


@query(
    "schema_evolution_merge",
    oracle="""
WITH unioned AS (
  SELECT o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
         CAST(NULL AS VARCHAR) AS priority
  FROM orders WHERE o_orderkey % 2 = 0
  UNION ALL
  SELECT o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT), o_orderpriority
  FROM orders WHERE o_orderkey % 2 = 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN priority IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_legacy,
       CAST(SUM(CASE WHEN priority IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_evolved,
       CAST(SUM(cents) AS BIGINT) AS total_cents
FROM unioned
""",
)
def q_schema_evolution_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution under mergeSchema: two parquet batches of the
    same table written with DIFFERENT schemas (the second gains a
    `priority` column — the additive evolution every long-lived
    dataset accumulates) are read back as ONE table via
    ``mergeSchema=true``; legacy rows surface the new column as NULL.
    The gate proves the merged read loses no rows, no values, and
    NULL-fills exactly the legacy batch. Merging footers is a driver-
    side metadata operation at any scale; the data files are untouched
    — which is why additive evolution is free in a parquet lake."""

    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    root = scratch_dir("schema_evo")
    o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", cents.alias("cents")
    ).write.mode("overwrite").parquet(f"{root}/batch=legacy")
    o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", cents.alias("cents"), F.col("o_orderpriority").alias("priority")
    ).write.mode("overwrite").parquet(f"{root}/batch=evolved")
    back = spark.read.option("mergeSchema", "true").parquet(
        f"{root}/batch=legacy", f"{root}/batch=evolved"
    )
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("priority").isNull(), 1).otherwise(0)).alias("n_legacy"),
        F.sum(F.when(F.col("priority").isNotNull(), 1).otherwise(0)).alias(
            "n_evolved"
        ),
        F.sum("cents").alias("total_cents"),
    )
