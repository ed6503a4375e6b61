from gexp_ml_dask_spark.plans.gexp_pipeline import (
    feature_preprocessing,
    gexp_pipeline,
)

__all__ = ["feature_preprocessing", "gexp_pipeline"]
