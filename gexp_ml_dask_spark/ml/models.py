"""Model wrappers (SURVEY.md §2.10, OP-ML-07/08/09).

The reference trains XGBoost (functions/dask_pipeline.py:79-104) and
LightGBM (cluster_default_benchmark.py:137-143); neither package is
in this container, so the primary path is MLlib (RandomForest for
multiclass — MLlib's GBTClassifier is binary-only — GBTRegressor for
regression) with distributed XGBoost used automatically when
``xgboost.spark`` is importable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

try:  # gated: not in the v1 container, available on real clusters
    from xgboost.spark import SparkXGBClassifier, SparkXGBRegressor

    HAS_XGBOOST = True
except Exception:  # pragma: no cover - absent dependency
    SparkXGBClassifier = SparkXGBRegressor = None
    HAS_XGBOOST = False


def classifier_engine() -> str:
    """Provenance literal for OP-ML-07 outputs: which backend the
    gated import actually selected in this environment."""
    return "xgboost.spark" if HAS_XGBOOST else "mllib.random_forest"


def lightgbm_engine() -> str:
    """Provenance literal for OP-ML-08 outputs."""
    try:  # pragma: no cover - synapseml absent in this container
        import synapse.ml.lightgbm  # noqa: F401

        return "synapseml.lightgbm"
    except Exception:
        return "mllib.onevsrest_gbt"


def make_classifier(
    features_col: str = "features",
    label_col: str = "label_idx",
    seed: int = 42,
    prefer_xgboost: bool = True,
):
    """OP-ML-07 (classification): XGBClassifier twin. MLlib fallback
    is RandomForest (multiclass-capable, GBDT-family)."""
    if prefer_xgboost and HAS_XGBOOST:
        return SparkXGBClassifier(
            features_col=features_col, label_col=label_col, random_state=seed
        )
    from pyspark.ml.classification import RandomForestClassifier

    return RandomForestClassifier(
        featuresCol=features_col, labelCol=label_col, seed=seed, numTrees=50
    )


def make_regressor(
    features_col: str = "features",
    label_col: str = "label",
    seed: int = 42,
    prefer_xgboost: bool = True,
):
    """OP-ML-07 (regression): XGBRegressor twin / MLlib GBTRegressor."""
    if prefer_xgboost and HAS_XGBOOST:
        return SparkXGBRegressor(
            features_col=features_col, label_col=label_col, random_state=seed
        )
    from pyspark.ml.regression import GBTRegressor

    return GBTRegressor(featuresCol=features_col, labelCol=label_col, seed=seed)


def make_lightgbm_classifier(
    features_col: str = "features",
    label_col: str = "label_idx",
    seed: int = 42,
    max_iter: int = 10,
):
    """OP-ML-08 — LightGBM variant (`cluster_default_benchmark.py:
    137-143,210-216` DaskLGBMClassifier/LGBMClassifier). SynapseML's
    LightGBMClassifier when importable (real clusters); fallback is
    OneVsRest over MLlib's binary GBTClassifier — a true gradient-
    boosted-tree multiclass path, unlike the RandomForest stand-in
    used for OP-ML-07."""
    try:  # pragma: no cover - synapseml absent in this container
        from synapse.ml.lightgbm import LightGBMClassifier

        return LightGBMClassifier(featuresCol=features_col, labelCol=label_col)
    except Exception:
        from pyspark.ml.classification import GBTClassifier, OneVsRest

        gbt = GBTClassifier(
            featuresCol=features_col,
            labelCol=label_col,
            seed=seed,
            maxIter=max_iter,
        )
        return OneVsRest(
            classifier=gbt, featuresCol=features_col, labelCol=label_col
        )


def make_hpo_classifier(
    features_col: str = "features",
    label_col: str = "label_idx",
    n_folds: int = 2,
    parallelism: int = 4,
    seed: int = 42,
    n_iter: int = 20,
):
    """OP-ML-09 — linear-model HPO with honest RandomizedSearchCV
    semantics: the reference samples ``n_iter=100`` points from
    CONTINUOUS distributions (functions/dask_pipeline.py:107-120 —
    RandomizedSearchCV over SGDClassifier alpha/l1_ratio), not a
    fixed grid. Here ``n_iter`` (default 20, the container-budget
    scaling of the reference's 100) points are drawn from a seeded
    log-uniform over regParam ∈ [1e-4, 1e1] and a seeded uniform
    over elasticNetParam ∈ [0, 1] — sampling happens driver-side
    with ``random.Random(seed)``, so the search is reproducible
    bit-for-bit, then the sampled points run as a ParamGrid under
    CrossValidator(numFolds, parallelism): MLlib evaluates the
    sampled params concurrently the way dask_ml did."""
    import math
    import random

    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.evaluation import MulticlassClassificationEvaluator
    from pyspark.ml.tuning import CrossValidator

    lr = LogisticRegression(featuresCol=features_col, labelCol=label_col)
    rng = random.Random(seed)
    lo, hi = math.log(1e-4), math.log(1e1)
    # a ParamGrid IS a list of {Param: value} maps — build the
    # sampled points directly instead of a cartesian GridBuilder
    grid = [
        {
            lr.regParam: math.exp(rng.uniform(lo, hi)),
            lr.elasticNetParam: rng.uniform(0.0, 1.0),
        }
        for _ in range(n_iter)
    ]
    evaluator = MulticlassClassificationEvaluator(
        labelCol=label_col, predictionCol="prediction", metricName="accuracy"
    )
    return CrossValidator(
        estimator=lr,
        estimatorParamMaps=grid,
        evaluator=evaluator,
        numFolds=n_folds,
        parallelism=parallelism,
        seed=seed,
    )


def evaluate_accuracy(predictions: DataFrame, label_col: str = "label_idx") -> float:
    """OP-ML-10 — MLlib evaluator path (SQL twin in metrics.py)."""
    from pyspark.ml.evaluation import MulticlassClassificationEvaluator

    return MulticlassClassificationEvaluator(
        labelCol=label_col, predictionCol="prediction", metricName="accuracy"
    ).evaluate(predictions)


def evaluate_r2(predictions: DataFrame, label_col: str = "label") -> float:
    from pyspark.ml.evaluation import RegressionEvaluator

    return RegressionEvaluator(
        labelCol=label_col, predictionCol="prediction", metricName="r2"
    ).evaluate(predictions)
