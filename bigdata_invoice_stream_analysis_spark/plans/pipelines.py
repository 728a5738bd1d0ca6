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
    docs = load_table(spark, sf_dir, "documents")
    toks = TX.tokenize(F.col("text"))
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
        docs.select("doc_id", F.explode(bigrams).alias("bigram"))
        .groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    from bigdata_invoice_stream_analysis_spark.cache import scoped_cache

    tf2 = scoped_cache(tf2)
    big = tf2.groupBy("bigram").agg(F.sum("cnt").alias("bcnt"))
    uni = big.groupBy(
        F.substring_index(F.col("bigram"), " ", 1).alias("prev")
    ).agg(F.sum("bcnt").alias("ucnt"))
    joined = tf2.join(F.broadcast(big), "bigram").join(
        F.broadcast(uni),
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
    assigned = SIM.assign_cells_literal(v, codebook, "qv")
    a = assigned.alias("a")
    b = assigned.alias("b")
    cos = SIM.quant_cosine(F.col("a.qv"), F.col("b.qv"))
    pairs = a.join(
        b,
        (F.col("a.cell_id") == F.col("b.cell_id"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).where(cos >= _SEMDEDUP_TAU)
    return pairs.groupBy(
        F.col("b.vec_id").alias("vec_id"),
        F.col("b.cell_id").cast("long").alias("cell_id"),
    ).agg(r6(F.max(cos)).alias("max_cos"))


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
    op = (
        li.where(F.col("l_quantity") > 30)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = op.alias("a"), op.alias("b")
    e0 = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
    )
    return G.pagerank_int(G.symmetrize(e0), iterations=_PR_ITERS)
