"""Scalar-function operators (SURVEY.md §2.8, OP-SCL-01..05).

All native Column expressions — JVM-side, whole-stage-codegen'd.
The reference applies these via ``applymap`` (a per-element Python
lambda over every partition, functions/dask_pipeline.py:43); on
Spark that would be a row-at-a-time UDF, the slowest possible path,
so none of these touch Python at runtime.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def log2_plus_one(df: DataFrame, col: str = "value", out: str | None = None) -> DataFrame:
    """OP-SCL-01 — ``log2(x + 1)`` elementwise
    (``applymap(lambda gene: log2(gene + 1))``,
    functions/dask_pipeline.py:43)."""
    return df.withColumn(out or col, F.log2(F.col(col) + F.lit(1.0)))


def ratio_expr(total: Column, g: Column) -> Column:
    """OP-SCL-03 — the TMM "log-ratio" kernel ``(total - g) /
    (total * g)`` (feature_selection_and_normalization.py:100)."""
    return (total - g) / (total * g)


def replace_value(df: DataFrame, col: str, old: float, new: float) -> DataFrame:
    """OP-SCL-04 — conditional replace (``replace(0, 1)``,
    feature_selection_and_normalization.py:24)."""
    return df.withColumn(
        col, F.when(F.col(col) == old, F.lit(new)).otherwise(F.col(col))
    )


def matches_pattern(col: str | Column, pattern: str) -> Column:
    """OP-SCL-05 — regex contains (``columns.str.contains(pat)``,
    brca_data_prep.ipynb cell-16)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike(pattern)
