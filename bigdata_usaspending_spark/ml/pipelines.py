"""The reference's three MLlib pipelines + correlation analysis
(reference: app/machine_learning_models.py:59-330), rebuilt with the same
semantics and the anti-patterns removed.

Reproduced semantics (SURVEY.md §2.11):
- data prep: dropna on required columns (:136-145), month/year derivation
  (:147-148), award_amount > 0 filter (:149);
- the dynamic categorical guard: categorical columns with < 2 distinct
  values are dropped before pipeline construction (:159-167) — the real
  dataset had a single awarding_agency value, so the saved pipelines carry
  4 StringIndexers, not 5;
- StringIndexer(handleInvalid="skip") -> OneHotEncoder -> VectorAssembler;
- LinearRegression on one-hot cats + month + year (:229-235);
- LogisticRegression (maxIter=20) on the binary high/low-vs-median label
  (:237-250);
- KMeans k=5 seed=42 with award_amount in the feature vector (:251-258);
- 80/20 randomSplit seed=42 (:262,279), RMSE + AUC evaluators (:271-292),
  cluster centers (:295-297), describe() stats (:300);
- model persistence via PipelineModel.save/load (:326-328);
- inference on single-row DataFrames where handleInvalid="skip" silently
  drops unseen categories -> surfaced as an explicit None (:211-216).

Fixes vs the reference (SURVEY.md §4):
- distinct counts for the guard computed in ONE aggregation pass, not one
  Spark job per column;
- the prepared DataFrame is cached once and shared by all three pipelines
  (the reference re-fit StringIndexers twice and split twice);
- df.isEmpty() instead of rdd.isEmpty() probes.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F
from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import LogisticRegression
from pyspark.ml.clustering import KMeans
from pyspark.ml.evaluation import BinaryClassificationEvaluator, RegressionEvaluator
from pyspark.ml.feature import OneHotEncoder, StringIndexer, VectorAssembler
from pyspark.ml.regression import LinearRegression
from pyspark.ml.stat import Correlation

from ..operators.cleaning import binary_label, drop_null_required, filter_positive, with_month_year

# The reference's exact 5-column candidate set (:151-157). NOT
# recipient_name: the reference never trained on it (high-cardinality), and
# feature parity means the same candidate list feeding the same guard.
DEFAULT_CATEGORICAL = (
    "awarding_agency",
    "awarding_sub_agency",
    "contract_award_type",
    "funding_agency",
    "funding_sub_agency",
)
# the 7 columns the reference required non-null (:136-145)
REQUIRED = (
    "award_amount",
    "start_date",
    "awarding_agency",
    "awarding_sub_agency",
    "contract_award_type",
    "funding_agency",
    "funding_sub_agency",
)
SEED = 42


@dataclass
class TrainingResult:
    feature_categoricals: list[str]
    dropped_categoricals: list[str]
    regression_model: PipelineModel
    regression_rmse: float
    classification_model: PipelineModel
    classification_auc: float
    classification_threshold: float
    clustering_model: PipelineModel
    cluster_centers: list[list[float]]
    correlation: list[list[float]] | None
    correlation_cols: list[str] = field(default_factory=list)
    describe: list[Row] = field(default_factory=list)


def prepare(df: DataFrame, amount_col: str = "award_amount", date_col: str = "start_date") -> DataFrame:
    """Cleaning + derivation shared by all pipelines (reference :136-149)."""
    cleaned = filter_positive(
        with_month_year(drop_null_required(df, REQUIRED), date_col), amount_col
    )
    return cleaned.withColumn(amount_col, F.col(amount_col).cast("double"))


def usable_categoricals(df: DataFrame, candidates=DEFAULT_CATEGORICAL) -> tuple[list[str], list[str]]:
    """The dynamic feature-column guard (reference :159-167): drop categorical
    columns with < 2 distinct values. One aggregation pass for all columns."""
    counts = df.agg(
        *[F.countDistinct(c).alias(c) for c in candidates]
    ).first()
    keep = [c for c in candidates if counts[c] >= 2]
    dropped = [c for c in candidates if counts[c] < 2]
    return keep, dropped


def _feature_stages(cats: list[str], extra_numeric: list[str], features_col: str):
    indexers = [
        StringIndexer(inputCol=c, outputCol=f"{c}_index", handleInvalid="skip")
        for c in cats
    ]
    encoder = OneHotEncoder(
        inputCols=[f"{c}_index" for c in cats],
        outputCols=[f"{c}_vec" for c in cats],
    )
    assembler = VectorAssembler(
        inputCols=[f"{c}_vec" for c in cats] + extra_numeric, outputCol=features_col
    )
    return [*indexers, encoder, assembler]


def correlation_matrix(df: DataFrame, cats: list[str], numerics=("award_amount", "month", "year")):
    """Pearson correlation over indexed categoricals + numerics
    (reference :174-191)."""
    indexed = df
    for c in cats:
        indexed = (
            StringIndexer(inputCol=c, outputCol=f"{c}_index", handleInvalid="skip")
            .fit(indexed)
            .transform(indexed)
        )
    cols = [f"{c}_index" for c in cats] + list(numerics)
    assembled = VectorAssembler(inputCols=cols, outputCol="corr_features").transform(indexed)
    matrix = Correlation.corr(assembled, "corr_features", method="pearson").head()[0]
    return [list(row) for row in matrix.toArray().tolist()], cols


def train_all(df: DataFrame, amount_col: str = "award_amount") -> TrainingResult:
    """Fit the three pipelines on a prepared awards-shaped DataFrame."""
    prepared = prepare(df, amount_col=amount_col)
    prepared.cache()
    cats, dropped = usable_categoricals(prepared)

    corr, corr_cols = correlation_matrix(prepared, cats)

    # regression: predict amount from one-hot cats + month + year (:229-235)
    reg_pipeline = Pipeline(
        stages=[
            *_feature_stages(cats, ["month", "year"], "features_reg"),
            LinearRegression(featuresCol="features_reg", labelCol=amount_col),
        ]
    )
    train, test = prepared.randomSplit([0.8, 0.2], seed=SEED)
    reg_model = reg_pipeline.fit(train)
    rmse = RegressionEvaluator(
        labelCol=amount_col, predictionCol="prediction", metricName="rmse"
    ).evaluate(reg_model.transform(test))

    # classification: high/low vs approx median threshold (:237-250)
    median = prepared.approxQuantile(amount_col, [0.5], 0.001)[0]
    labeled = prepared.withColumn("label", binary_label(amount_col, float(median)))
    cls_pipeline = Pipeline(
        stages=[
            *_feature_stages(cats, ["month", "year"], "features_cls"),
            LogisticRegression(featuresCol="features_cls", labelCol="label", maxIter=20),
        ]
    )
    ctrain, ctest = labeled.randomSplit([0.8, 0.2], seed=SEED)
    cls_model = cls_pipeline.fit(ctrain)
    auc = BinaryClassificationEvaluator(
        labelCol="label", metricName="areaUnderROC"
    ).evaluate(cls_model.transform(ctest))

    # clustering: KMeans k=5 seed=42, amount included (:251-258)
    clu_pipeline = Pipeline(
        stages=[
            *_feature_stages(cats, ["month", "year", amount_col], "features_clu"),
            KMeans(featuresCol="features_clu", k=5, seed=SEED),
        ]
    )
    clu_model = clu_pipeline.fit(prepared)
    centers = [list(map(float, c)) for c in clu_model.stages[-1].clusterCenters()]

    describe = prepared.select(amount_col, "month", "year").describe().collect()

    # every consumer of the prepared frame has materialized by now; release
    # the cached blocks so repeated train_all calls in a long-lived driver
    # don't accumulate storage
    prepared.unpersist()

    return TrainingResult(
        feature_categoricals=cats,
        dropped_categoricals=dropped,
        regression_model=reg_model,
        regression_rmse=float(rmse),
        classification_model=cls_model,
        classification_auc=float(auc),
        classification_threshold=float(median),
        clustering_model=clu_model,
        cluster_centers=centers,
        correlation=corr,
        correlation_cols=corr_cols,
        describe=describe,
    )


def save_models(result: TrainingResult, base_dir: str) -> None:
    """Persist the three PipelineModels (reference :326-328)."""
    result.regression_model.write().overwrite().save(f"{base_dir}/pipeline_regression")
    result.classification_model.write().overwrite().save(f"{base_dir}/pipeline_classification")
    result.clustering_model.write().overwrite().save(f"{base_dir}/pipeline_clustering")


def load_models(spark, base_dir: str) -> dict[str, PipelineModel]:
    """Reload persisted pipelines (reference app/ml_app.py:68-74)."""
    return {
        name: PipelineModel.load(f"{base_dir}/pipeline_{name}")
        for name in ("regression", "classification", "clustering")
    }


def infer_single(model: PipelineModel, row_df: DataFrame) -> Row | None:
    """Single-row inference. Returns None when handleInvalid='skip' dropped
    the row (unseen category) — the reference probed rdd.isEmpty() and
    flashed an error (app/ml_app.py:211-216); we surface it explicitly.

    The reference's inference forms supplied month/year directly
    (app/ml_app.py:194-208); awards-shaped rows without them get the same
    derivation the training prep used."""
    if "month" not in row_df.columns and "start_date" in row_df.columns:
        row_df = with_month_year(row_df, "start_date")
    out = model.transform(row_df)
    if out.isEmpty():
        return None
    return out.first()


def classify_with_confidence(model: PipelineModel, row_df: DataFrame) -> tuple[str, float] | None:
    """HIGH/LOW + confidence%, as the dashboard displayed it
    (reference app/ml_app.py:282-287)."""
    row = infer_single(model, row_df)
    if row is None:
        return None
    label = int(row["prediction"])
    prob = float(row["probability"][label]) * 100.0
    return ("HIGH" if label == 1 else "LOW", prob)


def tune_regression(
    df: DataFrame,
    amount_col: str = "award_amount",
    num_folds: int = 3,
    parallelism: int = 4,
):
    """Model selection for the regression pipeline: k-fold CrossValidator
    over an elastic-net grid (regParam x elasticNetParam), folds and
    candidate fits running as PARALLEL Spark jobs.

    The reference trains exactly one hard-coded LinearRegression
    (app/machine_learning_models.py:229-235) — no validation beyond a
    single train/test split. This is the warehouse-grade step above it:
    deterministic folds (seed pinned), every candidate scored on held-out
    RMSE, and the winner refit on the full training frame by the
    CrossValidator itself. ``parallelism`` bounds concurrent candidate
    fits — at cluster scale each fit is its own distributed job, so the
    sweep saturates executors without oversubscribing the driver.

    Returns (best_model, best_params, cv_rmse_per_candidate).
    """
    from pyspark.ml.tuning import CrossValidator, ParamGridBuilder

    prepared = prepare(df, amount_col=amount_col)
    cats, _ = usable_categoricals(prepared)
    lr = LinearRegression(featuresCol="features_reg", labelCol=amount_col)
    pipeline = Pipeline(stages=[*_feature_stages(cats, ["month", "year"], "features_reg"), lr])
    grid = (
        ParamGridBuilder()
        .addGrid(lr.regParam, [0.0, 0.1, 1.0])
        .addGrid(lr.elasticNetParam, [0.0, 0.5])
        .build()
    )
    evaluator = RegressionEvaluator(
        labelCol=amount_col, predictionCol="prediction", metricName="rmse"
    )
    cv = CrossValidator(
        estimator=pipeline,
        estimatorParamMaps=grid,
        evaluator=evaluator,
        numFolds=num_folds,
        parallelism=parallelism,
        seed=SEED,
    )
    model = cv.fit(prepared)
    best_lr = model.bestModel.stages[-1]
    best_params = {
        "regParam": float(best_lr.getRegParam()),
        "elasticNetParam": float(best_lr.getElasticNetParam()),
    }
    metrics = [float(m) for m in model.avgMetrics]
    return model.bestModel, best_params, metrics


def tune_classifier(
    df: DataFrame,
    amount_col: str = "award_amount",
    num_folds: int = 3,
    parallelism: int = 4,
):
    """Model selection for the high/low classifier — the tune_regression
    treatment applied to the LogisticRegression pipeline: k-fold
    CrossValidator over a regParam x elasticNetParam grid, candidates
    scored on held-out AUC, parallel candidate fits, deterministic folds.
    The label is the same approx-median threshold train_all uses
    (reference app/machine_learning_models.py:237-250, which fits one
    hard-coded classifier with no validation).

    Returns (best_model, best_params, cv_auc_per_candidate).
    """
    from pyspark.ml.tuning import CrossValidator, ParamGridBuilder

    prepared = prepare(df, amount_col=amount_col)
    median = prepared.approxQuantile(amount_col, [0.5], 0.001)[0]
    labeled = prepared.withColumn("label", binary_label(amount_col, float(median)))
    cats, _ = usable_categoricals(labeled)
    lr = LogisticRegression(featuresCol="features_cls", labelCol="label", maxIter=20)
    pipeline = Pipeline(
        stages=[*_feature_stages(cats, ["month", "year"], "features_cls"), lr]
    )
    grid = (
        ParamGridBuilder()
        .addGrid(lr.regParam, [0.0, 0.01, 0.1])
        .addGrid(lr.elasticNetParam, [0.0, 0.5])
        .build()
    )
    evaluator = BinaryClassificationEvaluator(
        labelCol="label", metricName="areaUnderROC"
    )
    cv = CrossValidator(
        estimator=pipeline,
        estimatorParamMaps=grid,
        evaluator=evaluator,
        numFolds=num_folds,
        parallelism=parallelism,
        seed=SEED,
    )
    model = cv.fit(labeled)
    best_lr = model.bestModel.stages[-1]
    best_params = {
        "regParam": float(best_lr.getRegParam()),
        "elasticNetParam": float(best_lr.getElasticNetParam()),
    }
    metrics = [float(m) for m in model.avgMetrics]
    return model.bestModel, best_params, metrics
