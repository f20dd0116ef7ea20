"""Training report sink (reference S10: the text report written to
outputs/model_training_info.txt, app/machine_learning_models.py:299-323).

Same content shape — row counts, describe() stats, RMSE, median threshold,
AUC, cluster centers — emitted both as human-readable text and as a metrics
DataFrame that can land in a table (the queryable form the reference lacked).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .pipelines import TrainingResult


def report_text(result: TrainingResult) -> str:
    lines = [
        "=== Model Training Report ===",
        f"feature categoricals: {', '.join(result.feature_categoricals)}",
        f"dropped categoricals (<2 distinct): {', '.join(result.dropped_categoricals) or 'none'}",
        "",
        "--- describe(award_amount, month, year) ---",
    ]
    for row in result.describe:
        lines.append("  " + "  ".join(f"{k}={v}" for k, v in row.asDict().items()))
    lines += [
        "",
        f"Linear Regression RMSE: {result.regression_rmse:.4f}",
        f"Classification median threshold: {result.classification_threshold:.6f}",
        f"Logistic Regression AUC-ROC: {result.classification_auc:.4f}",
        f"KMeans cluster centers ({len(result.cluster_centers)}):",
    ]
    for i, center in enumerate(result.cluster_centers):
        lines.append(f"  center {i}: [" + ", ".join(f"{v:.4f}" for v in center[:8]) + ", ...]")
    return "\n".join(lines) + "\n"


def write_report(result: TrainingResult, path: str) -> None:
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(report_text(result))


def metrics_df(spark: SparkSession, result: TrainingResult) -> DataFrame:
    """The queryable form: one (metric, value) row per scalar metric."""
    rows = [
        ("regression_rmse", float(result.regression_rmse)),
        ("classification_threshold", float(result.classification_threshold)),
        ("classification_auc", float(result.classification_auc)),
        ("n_clusters", float(len(result.cluster_centers))),
        ("n_feature_categoricals", float(len(result.feature_categoricals))),
    ]
    from ..io import local_frame

    return local_frame(spark, rows, "metric string, value double")
