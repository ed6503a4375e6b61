from gexp_ml_dask_spark.llm import (
    dedup,
    mixture,
    multimodal,
    similarity,
    text,
)

__all__ = ["dedup", "mixture", "multimodal", "similarity", "text"]
