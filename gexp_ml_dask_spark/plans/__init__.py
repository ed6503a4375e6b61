from gexp_ml_dask_spark.plans.curation import curate_documents
from gexp_ml_dask_spark.plans.gexp_pipeline import (
    feature_preprocessing,
    gexp_pipeline,
)

__all__ = ["curate_documents", "feature_preprocessing", "gexp_pipeline"]
