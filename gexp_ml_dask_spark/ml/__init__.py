from gexp_ml_dask_spark.ml import metrics, normalization

__all__ = ["metrics", "normalization"]
