"""Scoring metrics (SURVEY.md §2.10, OP-ML-10).

Pure-SQL implementations (usable as oracle checks) plus MLlib
evaluator wrappers for Vector-based pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def accuracy_df(pred: DataFrame, label_col: str = "label", pred_col: str = "prediction") -> DataFrame:
    """accuracy = mean(pred == label) (dask_ml accuracy_score,
    functions/dask_pipeline.py:100). 1-row DataFrame."""
    return pred.agg(
        F.avg((F.col(pred_col) == F.col(label_col)).cast("double")).alias("accuracy")
    )


def r2_score_df(pred: DataFrame, label_col: str = "label", pred_col: str = "prediction") -> DataFrame:
    """r² = 1 - SSE/SST (dask_ml r2_score, functions/
    dask_pipeline.py:102). Single aggregate pass: SSE and the pieces
    of SST (sum, sum of squares, count) in one shuffle, no second
    scan for the label mean."""
    y = F.col(label_col)
    yhat = F.col(pred_col)
    stats = pred.agg(
        F.sum((y - yhat) * (y - yhat)).alias("sse"),
        F.sum(y).alias("sy"),
        F.sum(y * y).alias("syy"),
        F.count(F.lit(1)).alias("n"),
    )
    sst = F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")
    return stats.select(
        (F.lit(1.0) - F.try_divide(F.col("sse"), sst)).alias("r2")
    )


def accuracy(pred: DataFrame, label_col: str = "label", pred_col: str = "prediction") -> float:
    return accuracy_df(pred, label_col, pred_col).collect()[0]["accuracy"]


def r2_score(pred: DataFrame, label_col: str = "label", pred_col: str = "prediction") -> float:
    return r2_score_df(pred, label_col, pred_col).collect()[0]["r2"]


def rmse_df(pred: DataFrame, label_col: str = "label", pred_col: str = "prediction") -> DataFrame:
    """Root-mean-squared error as a one-row DataFrame (single
    aggregate; the sqrt is driver-free column arithmetic)."""
    err = F.col(label_col) - F.col(pred_col)
    return pred.agg(F.round(F.sqrt(F.avg(err * err)), 6).alias("rmse"))


def mae_df(pred: DataFrame, label_col: str = "label", pred_col: str = "prediction") -> DataFrame:
    """Mean absolute error as a one-row DataFrame."""
    err = F.abs(F.col(label_col) - F.col(pred_col))
    return pred.agg(F.round(F.avg(err), 6).alias("mae"))
