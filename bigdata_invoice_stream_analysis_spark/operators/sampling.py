"""Deterministic hash-based sampling and dataset splitting — the
train/val/test assignment step of a training-data pipeline (north-star
extension; the reference has no sampling of any kind).

Why md5-prefix instead of ``rand()`` or ``hash()``: the assignment must
be (a) reproducible across runs and engines (Spark's ``hash`` is
Murmur3-with-Spark-seed, DuckDB's is its own — md5 is bit-identical
everywhere), (b) stable under repartitioning/insertion order (a pure
function of the key, unlike ``rand``), and (c) uniform. The first 4 hex
chars give 65536 buckets — granular enough for per-mille split weights.

Pure per-row expressions: zero shuffle at any scale; the split column
is computed map-side and survives pushdown/pruning like any projection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1 << 16  # 4 hex chars


def split_thresholds(train: float = 0.8, val: float = 0.1) -> tuple[str, str]:
    """Hex bucket-boundary literals for (train, train+val) — shared by
    the Spark expression and the DuckDB oracle so both engines compare
    the same md5 prefix against the same strings."""
    t1 = format(int(_BUCKETS * train), "04x")
    t2 = format(int(_BUCKETS * (train + val)), "04x")
    return t1, t2


def md5_bucket(key: Column, nchars: int = 4) -> Column:
    """Lowercase-hex md5 prefix of the key's string form."""
    return F.substring(F.md5(key.cast("string")), 1, nchars)


def split_column(key: Column, train: float = 0.8, val: float = 0.1) -> Column:
    """'train' / 'val' / 'test' assignment, a pure function of the key."""
    t1, t2 = split_thresholds(train, val)
    h = md5_bucket(key)
    return (
        F.when(h < t1, F.lit("train")).when(h < t2, F.lit("val")).otherwise(F.lit("test"))
    )


def with_split(
    df: DataFrame, key_col: str, train: float = 0.8, val: float = 0.1
) -> DataFrame:
    """Attach a deterministic 'split' column keyed on ``key_col``."""
    return df.withColumn("split", split_column(F.col(key_col), train, val))


def hash_sample(df: DataFrame, key_col: str, fraction: float) -> DataFrame:
    """Deterministic ``fraction`` sample: keep rows whose md5 bucket
    falls below the fraction boundary. Unlike ``df.sample`` this is
    reproducible across runs, engines, and repartitionings, and the
    same key always samples the same way in every table it appears in
    (consistent entity-level sampling across joined tables)."""
    bound = format(int(_BUCKETS * fraction), "04x")
    return df.filter(md5_bucket(F.col(key_col)) < bound)


def sql_split_case(key_sql: str, train: float = 0.8, val: float = 0.1) -> str:
    """DuckDB twin of split_column over an SQL key expression."""
    t1, t2 = split_thresholds(train, val)
    h = f"substring(md5(CAST({key_sql} AS VARCHAR)), 1, 4)"
    return (
        f"CASE WHEN {h} < '{t1}' THEN 'train' "
        f"WHEN {h} < '{t2}' THEN 'val' ELSE 'test' END"
    )


def bucket_int(key: Column) -> Column:
    """The md5 bucket as an integer in [0, 65536) — for per-row
    VARIABLE acceptance thresholds (weighted sampling), where the hex
    string comparison of hash_sample can't express the bound."""
    return F.conv(md5_bucket(key), 16, 10).cast("long")


def weighted_keep(key: Column, weight: Column, max_weight: int) -> Column:
    """Deterministic importance-weighted acceptance (the DSIR /
    quality-resampling primitive): row kept with probability
    weight/max_weight, decided by the key's md5 bucket —
    ``bucket · max_weight < weight · 65536`` in exact integers, so the
    decision is reproducible across runs, engines, partitionings, and
    tables (same key + same weight ⇒ same verdict everywhere).
    weight=0 never keeps; weight=max_weight always keeps. Pure map-side
    expression — zero shuffle at any scale."""
    return bucket_int(key) * F.lit(max_weight) < weight.cast("long") * F.lit(
        _BUCKETS
    )


def sql_weighted_keep(key_sql: str, weight_sql: str, max_weight: int) -> str:
    """DuckDB twin of weighted_keep ('0x'||hex → UBIGINT parse)."""
    b = (
        f"(('0x' || substring(md5(CAST({key_sql} AS VARCHAR)), 1, 4))::UBIGINT)"
    )
    return f"({b} * {max_weight} < ({weight_sql}) * {_BUCKETS})"


def source_mixture_plan(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    temperature: float = 0.5,
) -> DataFrame:
    """The source-mixing plan multi-corpus training runs on
    (the GPT-3/Pile recipe): per source, token volume and the
    temperature-scaled sampling weight w_i ∝ share_i^τ that
    up-weights small high-quality sources against the web-scale
    bulk.

    Determinism engineering (the repo's standing rule — integer
    domains wherever engines could disagree): token counts are exact
    integer sums; ``share`` is ONE division; τ is fixed at 0.5 so
    the scaling is ``sqrt`` — correctly rounded in IEEE 754, hence
    bit-identical across engines, unlike ``pow`` — and the scaled
    weight is quantized to a 1e-9 integer grid BEFORE the normalizing
    sum, so the denominator is an exact BIGINT in both engines.
    Outputs are integers/ppm only. (``temperature`` other than 0.5
    raises: a libm ``pow`` would silently break the cross-engine
    hash gate — widen deliberately or not at all.)

    One map-side-combined aggregate on ``source`` — trivially
    scale-safe; the plan table is a handful of rows at any corpus
    size."""
    if temperature != 0.5:
        raise ValueError(
            "only temperature=0.5 (sqrt) is cross-engine "
            "deterministic; pow(x, t) is not correctly rounded"
        )
    toks = F.size(
        F.regexp_extract_all(
            F.coalesce(F.col(text_col), F.lit("")),
            F.lit(r"\S+"), F.lit(0),
        )
    ).cast("long")
    per_source = docs.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(toks).alias("n_tokens"),
    )
    total = per_source.select(
        F.sum("n_tokens").alias("total_tokens")
    )
    # Half-up rounding via FLOOR(x + 0.5) rather than ROUND (r10): the
    # engines' ROUND implementations are a cross-engine hazard class
    # (Spark rounds HALF_UP over the decimal shortest-repr; a DuckDB
    # build rounding doubles half-to-even would flip any exact-.5
    # value), while FLOOR is correctly rounded IEEE in both engines on
    # the identical double input — so the quantized grid is
    # bit-reproducible no matter which ROUND the other engine ships.
    # Identical values at every tested SF (no .5-boundary inputs
    # exist); the form is pinned so none can ever diverge.
    scaled = per_source.crossJoin(F.broadcast(total)).select(
        source_col, "n_docs", "n_tokens",
        F.floor(
            F.lit(1e6) * F.col("n_tokens") / F.col("total_tokens")
            + F.lit(0.5)
        ).cast("long").alias("token_share_ppm"),
        F.floor(
            F.lit(1e9) * F.sqrt(
                F.col("n_tokens") / F.col("total_tokens")
            ) + F.lit(0.5)
        ).cast("long").alias("w_quant"),
    )
    wsum = scaled.select(F.sum("w_quant").alias("w_sum"))
    return scaled.crossJoin(F.broadcast(wsum)).select(
        source_col, "n_docs", "n_tokens", "token_share_ppm",
        F.floor(
            F.lit(1e6) * F.col("w_quant") / F.col("w_sum") + F.lit(0.5)
        ).cast("long").alias("mix_weight_ppm"),
    )


def sql_source_mixture_plan(
    source_sql: str = "source", text_sql: str = "text"
) -> str:
    """The DuckDB twin of source_mixture_plan (identical integer
    quantization; `\\S+` token counting via regexp_extract_all)."""
    return f"""
WITH per_source AS (
  SELECT {source_sql} AS source, COUNT(*) AS n_docs,
         SUM(CAST(len(regexp_extract_all(
             COALESCE({text_sql}, ''), '\\S+')) AS BIGINT))
           AS n_tokens
  FROM documents GROUP BY {source_sql}
),
scaled AS (
  SELECT source, n_docs, n_tokens,
         CAST(FLOOR(1e6 * n_tokens /
              (SELECT SUM(n_tokens) FROM per_source) + 0.5) AS BIGINT)
           AS token_share_ppm,
         CAST(FLOOR(1e9 * SQRT(n_tokens /
              (SELECT SUM(n_tokens) FROM per_source)) + 0.5) AS BIGINT)
           AS w_quant
  FROM per_source
)
SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       token_share_ppm,
       CAST(FLOOR(1e6 * w_quant /
            (SELECT SUM(w_quant) FROM scaled) + 0.5) AS BIGINT)
         AS mix_weight_ppm
FROM scaled
"""
