from gexp_ml_dask_spark.operators import (
    aggregates,
    filters,
    joins,
    physical,
    scalars,
    sorts,
    windows,
)

__all__ = [
    "aggregates",
    "filters",
    "joins",
    "physical",
    "scalars",
    "sorts",
    "windows",
]
