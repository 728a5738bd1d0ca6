"""KMeans / BisectingKMeans training sweep + elbow selection.

Reference: train.scala / trainBisecting.scala (M1/M2/A5) and
Clustering.scala:125-136 (A6 elbow). Rebuilt on pyspark.ml (DataFrame
native) instead of RDD MLlib.

Deviations from the reference, by design (SURVEY.md §3.1 defects):
  * elbow off-by-one FIXED: the selected model is the one whose k the
    elbow chose (the reference indexes models[k] with a 1-based k,
    silently selecting k+1 and crashing with ArrayIndexOutOfBounds in
    the no-elbow case, train.scala:63-65).
  * seeds are pinned everywhere for reproducibility.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.ml.clustering import BisectingKMeans, KMeans
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdata_invoice_stream_analysis_spark.schemas import FEATURE_COLS

DEFAULT_K_RANGE = range(2, 21)  # reference sweeps 1..20 (k=1 is degenerate)
ELBOW_RATIO = 0.7  # Clustering.scala:127


def assemble_features(df: DataFrame, feature_cols: list[str] | None = None) -> DataFrame:
    """P10 — project feature columns into a `features` vector column
    (Clustering.scala:109-123 did DataFrame→RDD[Vector]; here the data
    never leaves the DataFrame). array_to_vector keeps the lineage in
    native expressions."""
    cols = feature_cols or FEATURE_COLS
    arr = F.array(*[F.col(c).cast("double") for c in cols])
    return df.withColumn("features", array_to_vector(arr))


@dataclass
class SweepResult:
    k: int
    model: object  # KMeansModel | BisectingKMeansModel
    cost: float  # WSSSE / trainingCost on the training data


def train_sweep(
    features_df: DataFrame,
    algo: str = "kmeans",
    ks: range | list[int] = DEFAULT_K_RANGE,
    seed: int = 42,
    max_iter: int = 20,
    rows_per_partition: int | None = 50_000,
    parallelism: int = 4,
) -> list[SweepResult]:
    """M1/M2 + A5 — fit one model per k and record its training cost.

    The input should be cached by the caller (the reference caches,
    train.scala:33); concurrent fits re-scan it otherwise. Each fit
    is internally distributed (per-iteration treeAggregate of cluster
    sums).

    ``parallelism`` runs the independent fits as CONCURRENT Spark jobs
    from a thread pool (the reference sweeps sequentially) — each
    KMeans iteration is one small job over right-sized partitions, so
    a sequential sweep leaves the scheduler idle between iterations;
    concurrent submission overlaps them. Deterministic: every fit
    depends only on (data, k, seed), never on submission order, and
    results return ordered by k. Set parallelism=1 for the reference's
    sequential behavior.

    ``rows_per_partition`` right-sizes partitioning before the sweep:
    every KMeans iteration is one Spark job, so len(ks) × maxIter jobs
    run over the same data, and with tiny per-partition work the task
    scheduling dominates (measured 2.4× on a 97k-row sweep at 32
    partitions vs 4). Only coalesces DOWN — at production row counts
    the existing (larger) partitioning is kept. Costs one count(),
    which also materializes the caller's cache up front.
    """
    features_df = features_df.select("features")
    if rows_per_partition:
        n = features_df.count()
        cur = features_df.rdd.getNumPartitions()
        want = max(1, min(cur, n // rows_per_partition + 1))
        if want < cur:
            features_df = features_df.coalesce(want)

    def fit_one(k: int) -> SweepResult:
        if algo == "kmeans":
            est = KMeans(k=k, seed=seed, maxIter=max_iter)
        elif algo == "bisecting":
            est = BisectingKMeans(k=k, seed=seed, maxIter=max_iter)
        else:
            raise ValueError(f"unknown algo {algo!r}")
        model = est.fit(features_df)
        return SweepResult(k=k, model=model, cost=float(model.summary.trainingCost))

    k_list = list(ks)
    if parallelism > 1 and len(k_list) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(
            max_workers=min(parallelism, len(k_list))
        ) as pool:
            return list(pool.map(fit_one, k_list))
    return [fit_one(k) for k in k_list]


def elbow_selection(costs: list[float], ratio: float = ELBOW_RATIO) -> int:
    """A6 — index (into ``costs``) of the elbow: the last k whose step
    still dropped the cost sharply. Scanning forward, the first i with
    cost[i]/cost[i-1] > ratio means step i no longer helped, so the
    elbow is i-1 (Clustering.scala:125-136 finds the same i but then
    mis-indexes the model array with it — SURVEY.md §3.1; here the
    off-by-one is FIXED so the selected model is the elbow k itself).
    Returns the LAST index when no elbow is found (the reference
    returned len(costs) and crashed with ArrayIndexOutOfBounds,
    train.scala:65)."""
    for i in range(1, len(costs)):
        prev = costs[i - 1]
        if prev == 0:  # degenerate: perfect fit already
            return i - 1
        if costs[i] / prev > ratio:
            return i - 1
    return len(costs) - 1


def select_model(results: list[SweepResult], ratio: float = ELBOW_RATIO) -> SweepResult:
    """A6 applied to a sweep: the model at the elbow of the cost curve."""
    idx = elbow_selection([r.cost for r in results], ratio=ratio)
    return results[idx]
