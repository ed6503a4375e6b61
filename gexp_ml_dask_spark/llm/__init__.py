from gexp_ml_dask_spark.llm import dedup, multimodal, similarity, text

__all__ = ["dedup", "multimodal", "similarity", "text"]
