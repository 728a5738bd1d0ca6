"""Stream-safe anomaly scoring (M3/M4) with literal centroids.

``ml.anomaly.score`` uses ``model.transform`` + a broadcast centroid
join — fine for batch. For a streaming DataFrame the same math is
expressed with *zero* joins: the k×5 centroid matrix is folded into the
plan as literals (k ≤ 20 × 5 doubles — smaller than the broadcast
metadata), so the nearest-centroid argmin and squared distance run
entirely inside WholeStageCodegen on the update stream. Per-row cost is
O(k·dim) flops with no shuffle, no state, no Python — the scale-optimal
form for a stream scored against a small fixed model.

Argmin trick: build array< struct(dist, prediction) > and take
``array_min`` — struct ordering is lexicographic, so the min element is
(smallest dist, lowest cluster id) — exactly MLlib's tie-break.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bigdata_invoice_stream_analysis_spark.schemas import FEATURE_COLS


def _sqdist_lit(center: list[float], cols: list[str]) -> Column:
    """Squared distance to one literal centroid, as a codegen-friendly
    sum of squares (Vectors.sqdist twin, InvoicePipeline.scala:224).
    Squares are explicit multiplications, not POWER(x, 2) — multiply is
    bit-identical across engines (the DuckDB oracle twin repeats the
    same expression), POWER may route through exp/log."""
    terms = [
        (F.col(c).cast("double") - F.lit(float(v)))
        * (F.col(c).cast("double") - F.lit(float(v)))
        for c, v in zip(cols, center)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def score_with_centroids(
    df: DataFrame,
    centers: list[list[float]],
    feature_cols: list[str] | None = None,
) -> DataFrame:
    """M3 — add ``prediction`` (nearest centroid) and ``dist`` (squared
    distance to it). Works on batch and streaming DataFrames alike."""
    cols = feature_cols or FEATURE_COLS
    scored = F.array_min(
        F.array(
            *[
                F.struct(
                    _sqdist_lit(c, cols).alias("dist"),
                    F.lit(i).alias("prediction"),
                )
                for i, c in enumerate(centers)
            ]
        )
    )
    return (
        df.withColumn("_scored", scored)
        .withColumn("dist", F.col("_scored.dist"))
        .withColumn("prediction", F.col("_scored.prediction"))
        .drop("_scored")
    )


def anomalies_with_centroids(
    df: DataFrame,
    centers: list[list[float]],
    threshold: float,
    feature_cols: list[str] | None = None,
) -> DataFrame:
    """M4 — rows beyond the distance threshold
    (InvoicePipeline.scala:216-219)."""
    return score_with_centroids(df, centers, feature_cols).filter(
        F.col("dist") > F.lit(float(threshold))
    )


def centers_of(model) -> list[list[float]]:
    """Extract plain-Python centroids from a fitted pyspark.ml
    KMeansModel / BisectingKMeansModel for plan-literal scoring."""
    return [[float(x) for x in c] for c in model.clusterCenters()]
