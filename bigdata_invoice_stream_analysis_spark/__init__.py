"""bigdata_invoice_stream_analysis_spark — PySpark-native analytics engine.

A from-scratch, idiomatic PySpark (DataFrame / Spark SQL / Structured
Streaming / pyspark.ml) rebuild of the query and data-processing
capabilities of the reference project ``xIvqn/bigdata-invoice-stream-analysis``
(a Spark 2.3 Scala DStream + RDD-MLlib invoice anomaly-detection pipeline),
extended with large-scale data-pipeline operators (dedup, similarity
search, text analysis, multimodal columns).

Layout:
    schemas      explicit StructTypes shared by batch + streaming
    session      SparkSession factory tuned for local[N] testing and
                 cluster-scale defaults (AQE, shuffle partitions, Arrow)
    sources/     batch + streaming sources and sinks (CSV, parquet,
                 Kafka, model/threshold persistence, replay producer)
    functions/   scalar/column helpers (time, text, vector math) — all
                 native Column expressions, no row UDFs in hot paths
    operators/   relational operators (validate, featurize, top-k,
                 dedup, similarity, multimodal)
    ml/          KMeans / BisectingKMeans sweep, elbow selection,
                 distance-threshold anomaly scoring
    plans/       registered analytic queries over the test tables
    streaming/   Structured Streaming pipeline (parse → route →
                 windowed counts, keyed state, anomaly scoring, sinks)

Design stance (SURVEY.md §7): one DataFrame core shared by batch and
streaming; explicit schemas; declarative plans so Catalyst does pushdown,
pruning and join selection; Python only at the driver for control flow
and in Arrow-batched pandas UDFs where Spark lacks a primitive.
"""

__version__ = "0.1.0"
