"""Parquet/CSV table loading (reference S1/S2, SURVEY.md §2.1).

The reference reads CSV with header + inferSchema via the external
spark-csv package (Clustering.scala:37-41). The rebuild prefers parquet
(columnar, statistics, predicate pushdown) and explicit schemas for CSV.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from bigdata_invoice_stream_analysis_spark.schemas import PURCHASE_RAW_SCHEMA, TESTDATA_TABLES


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver test table. Plain parquet scan — Catalyst handles
    column pruning + filter pushdown at the source.

    Timestamp normalization (the driver's generator has shipped BOTH
    encodings across rounds):
      * TIMESTAMP(NANOS): Spark's vectorized reader rejects it; read
        nanos as long and convert (integer division truncates to
        micros, matching how DuckDB reads the same file).
      * TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark infers
        TIMESTAMP_NTZ, which time-instant functions (unix_micros,
        window) reject or treat differently; cast to the session-TZ
        timestamp type. The session is pinned UTC, so the wall-clock
        values — and every derived hash — are unchanged, and DuckDB
        reads the same naive micros."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for col, dtype in df.dtypes:
        if name == "events" and col == "ts" and dtype == "bigint":
            from pyspark.sql import functions as F

            # Integer division, NOT `/1000` in double: 2024 epochs are
            # ~2^60 ns, beyond double's 53-bit mantissa, so float
            # division perturbs the microsecond digit. DuckDB truncates
            # ns→us integrally; match it exactly.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif dtype == "timestamp_ntz":
            from pyspark.sql import functions as F

            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def ensure_min_parallelism(df: DataFrame, spark: SparkSession) -> DataFrame:
    """Repartition iff the plan currently has fewer partitions than the
    session has cores. The driver's small-SF parquet is written as ONE
    row group, so a scan is one task and every downstream per-row
    expression runs serially no matter how many cores exist; a
    production-scale table has thousands of properly sized row groups
    and this is a no-op (the partition check is driver-side plan
    inspection — no job runs). Use upstream of CPU-heavy per-row work
    (string synthesis, hashing, shingling); skip for scans that feed
    straight into a shuffle, which redistributes anyway."""
    cores = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < cores:
        return df.repartition(cores)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view for spark.sql queries."""
    for name in TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def read_purchases_csv(
    spark: SparkSession, path: str, header: bool = True
) -> DataFrame:
    """S1 — batch CSV scan of raw purchase lines (Clustering.scala:37-41).

    Explicit schema (all-string at the edge) instead of inferSchema: one
    file pass instead of two, and dirty values (non-numeric Quantity)
    survive to be routed by operators.validate instead of crashing.
    """
    return (
        spark.read.option("header", str(header).lower())
        .schema(PURCHASE_RAW_SCHEMA)
        .csv(path)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    num_buckets: int,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Persist a table bucketed (and sorted) by its join key — the 100 TB
    posture for the recurring lineitem⋈orders-shaped join: two tables
    bucketed on the same key with the same bucket count join with NO
    Exchange on either side (and no sort, if sorted), because Catalyst
    recognizes the co-partitioning from catalog metadata. Bucket count
    rule of thumb at scale: total_size / bucket ≈ 128-512 MB.
    """
    writer = df.write.mode("overwrite").format("parquet").bucketBy(num_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_raw_lines(spark: SparkSession, path: str) -> DataFrame:
    """Read a CSV file as unparsed lines (column ``value``) — the shape
    a Kafka value stream has, so batch tests exercise the exact
    streaming parse path."""
    return spark.read.text(path).withColumnRenamed("value", "value")


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    sort_within: list[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Persist a table hive-partitioned by low-cardinality columns —
    the lakehouse layout for time/category-sliced scans at 100 TB:
    a filter on a partition column prunes whole directories at planning
    time (PartitionFilters, zero IO for excluded partitions), and
    ``sortWithinPartitions`` clusters rows so parquet row-group min/max
    stats prune within the files that remain.

    Partition columns must be low-cardinality (dates, categories —
    thousands of values, not millions): every distinct tuple is a
    directory, and tiny partitions devolve into the small-files
    problem. High-cardinality keys belong in write_bucketed instead.
    ``max_records_per_file`` caps file size without coalescing the
    write parallelism.
    """
    if sort_within:
        df = df.sortWithinPartitions(*sort_within)
    writer = df.write.mode("overwrite").format("parquet")
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.partitionBy(*partition_cols).save(path)
