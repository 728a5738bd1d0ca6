"""Training CLI — the start_training.sh / train.scala twin.

Trains BOTH algorithms (KMeans + BisectingKMeans, the reference runs
them in parallel for A/B comparison, MEM p.1), each with the k-sweep +
elbow selection and the top-2000 distance threshold, then persists
model + threshold for the streaming app.

Usage:
  python -m bigdata_invoice_stream_analysis_spark.ml.cli \
      --input training.csv --out ./models [--kmax 20] [--seed 42]

Deviations from train.scala (SURVEY.md §3.1, intentional):
  * elbow off-by-one fixed (ml.train.elbow_selection);
  * featurization is the canonical shared one (no train/serve skew);
  * CSV read uses an explicit schema (no inferSchema double pass).
"""

from __future__ import annotations

import argparse
import json
import os

from pyspark.sql import SparkSession

from bigdata_invoice_stream_analysis_spark.ml import anomaly
from bigdata_invoice_stream_analysis_spark.ml.train import (
    assemble_features,
    select_model,
    train_sweep,
)
from bigdata_invoice_stream_analysis_spark.operators.featurize import invoice_features
from bigdata_invoice_stream_analysis_spark.sources.tables import read_purchases_csv


def train_all(
    spark: SparkSession,
    input_path: str,
    out_dir: str,
    kmax: int = 20,
    seed: int = 42,
    weighted_avg: bool = False,
) -> dict[str, dict]:
    """Featurize once, then sweep/select/threshold/save per algorithm.
    Returns {algo: {k, cost, threshold, model_path, threshold_path}}."""
    if input_path.endswith(".parquet") or os.path.isdir(input_path):
        purchases = spark.read.parquet(input_path)
    else:
        from bigdata_invoice_stream_analysis_spark.operators.validate import coerce_purchase_types

        purchases = coerce_purchase_types(read_purchases_csv(spark, input_path))
    feats = invoice_features(purchases, weighted_avg=weighted_avg)
    vecs = assemble_features(feats).cache()  # cached like train.scala:33

    results: dict[str, dict] = {}
    for algo in ("kmeans", "bisecting"):
        sweep = train_sweep(vecs, algo=algo, ks=range(2, kmax + 1), seed=seed)
        best = select_model(sweep)
        threshold = anomaly.train_threshold(vecs, best.model)
        model_path = os.path.join(out_dir, algo)
        threshold_path = os.path.join(out_dir, f"{algo}_threshold.json")
        anomaly.save_model(best.model, model_path)
        anomaly.save_threshold(threshold, threshold_path)
        results[algo] = {
            "k": best.k,
            "cost": best.cost,
            "threshold": threshold,
            "model_path": model_path,
            "threshold_path": threshold_path,
        }
    vecs.unpersist()
    return results


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="purchases CSV or parquet")
    ap.add_argument("--out", required=True, help="model output directory")
    ap.add_argument("--kmax", type=int, default=20)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--weighted-avg", action="store_true")
    args = ap.parse_args()

    from bigdata_invoice_stream_analysis_spark.session import get_spark

    spark = get_spark(app_name="train")
    results = train_all(
        spark, args.input, args.out, kmax=args.kmax, seed=args.seed,
        weighted_avg=args.weighted_avg,
    )
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
