"""Incremental (partial-fit) model fitting — SURVEY.md §2.10 OP-ML-12.

The reference's ``fit_estimator`` forwards ``classes=`` to estimators
that implement sklearn's ``partial_fit`` contract
(functions/dask_cv.py:10-18): model state lives outside the data
pass, and each epoch updates it from one sweep over the data.

The Spark-idiomatic re-expression: keep the (tiny) model state on
the driver, and make each epoch ONE whole-stage-codegen aggregation
job — the gradient is a sum over rows of pure column arithmetic, so
every epoch is scan -> partial agg (per partition) -> final agg,
with no shuffle of the data itself and nothing but k floats moving
to the driver. That is exactly the shape that survives 100 TB: an
epoch costs one scan, parallel across all partitions, and the
reduced state is O(n_features).

Full-batch gradient descent on least squares (no intercept) is used
so the whole trajectory is deterministic and algebraically
closed-form — w_{t+1} = w_t(1 - lr*2*Sxx/n) + lr*2*Sxy/n — which is
what the DuckDB oracle replays (queries.op_ml_12). The per-epoch
pass still computes sum(x*(x*w_t - y)) honestly from the data, as a
partial_fit implementation would.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def incremental_linear_fit(
    df: DataFrame,
    x_col: str,
    y_col: str,
    *,
    lr: float = 1e-4,
    epochs: int = 4,
    w0: float = 0.0,
) -> dict[str, float]:
    """Fit y ≈ w·x by ``epochs`` full-batch gradient steps.

    Each epoch is one Spark aggregation job:
        grad_t = (2/n) * Σ x·(x·w_t − y)
        w_{t+1} = w_t − lr · grad_t

    Returns driver-side state ``{"n": …, "w": …}`` — the model is
    the state, as with sklearn's partial_fit estimators.

    Complete-rows contract (round-7 edge sweep): only rows where
    both x and y are present, finite, AND within |·| <= 1e6 are
    fitted. The NULL/NaN half: ``count`` previously included a
    NULL-x row the gradient sum silently skipped, so n disagreed
    with the rows the model actually saw (and one NaN would have
    poisoned w for every later epoch). The magnitude half: a single
    1e9-scale outlier makes fixed-lr GD diverge to |w| ~ 1e34, where
    the iterative trajectory and the closed-form oracle differ in
    final ULPs — the 6dp-exact contract (like the JL projection's
    max_abs bound) only holds where the math is numerically sane,
    and an un-winsorized 1e9 outlier in a fixed-lr fit is not.
    """
    # cast to double BEFORE the isnan/abs checks — F.isnan on an
    # integer-typed column is a DATATYPE_MISMATCH under ANSI, and any
    # numeric input type is in-contract for the fit
    x, y = F.col(x_col).cast("double"), F.col(y_col).cast("double")
    fin = lambda c: c.isNotNull() & ~F.isnan(c) & (  # noqa: E731
        F.abs(c) <= F.lit(1e6)
    )
    df = df.filter(fin(x) & fin(y))
    w = float(w0)
    n = None
    for _ in range(epochs):
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.col(x_col) * (F.col(x_col) * F.lit(w) - F.col(y_col))
            ).alias("g"),
        ).collect()[0]
        n = row["n"]
        if not n:
            break
        w = w - lr * 2.0 * float(row["g"]) / n
    return {"n": float(n or 0), "w": w}
