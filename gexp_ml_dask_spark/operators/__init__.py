from gexp_ml_dask_spark.operators import (
    aggregates,
    filters,
    graph,
    joins,
    physical,
    scalars,
    sorts,
    windows,
)

__all__ = [
    "aggregates",
    "filters",
    "graph",
    "joins",
    "physical",
    "scalars",
    "sorts",
    "windows",
]
