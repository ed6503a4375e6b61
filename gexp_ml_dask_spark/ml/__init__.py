from gexp_ml_dask_spark.ml import (
    cv,
    estimators,
    metrics,
    models,
    normalization,
    pipeline,
)

__all__ = ["cv", "estimators", "metrics", "models", "normalization", "pipeline"]
