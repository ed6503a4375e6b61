"""Analytic window functions (SURVEY.md §2.5 — `[mandate]`).

The reference has no window functions (SURVEY.md §2.5); these enter
via the driver mandate's analytics surface: per-key ordered frames
over the ``events`` stream — the moving averages / deltas / running
totals a feature-engineering pipeline computes before training.

Scale posture: every function here is ONE hash-partition shuffle on
the partition key + an in-partition sort — no self-joins, no
cross-products. Frames are ROWS-bounded (never RANGE over unbounded
high-cardinality doubles), so state per group is O(frame), and the
deterministic (ts, id) ordering makes results engine-portable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _ordered_window(key_col: str, ts_col: str, id_col: str) -> Window:
    return Window.partitionBy(key_col).orderBy(ts_col, id_col)


def moving_average(
    events: DataFrame,
    frame_rows: int = 5,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    out_col: str = "mavg",
) -> DataFrame:
    """Trailing ``frame_rows``-row moving average of ``value_col``
    per key, ordered by (ts, id). Sequential in-frame summation
    order is identical across engines, so the doubles match bit-for-
    bit (rounded at the query edge regardless)."""
    w = _ordered_window(key_col, ts_col, id_col).rowsBetween(
        -(frame_rows - 1), Window.currentRow
    )
    return events.withColumn(out_col, F.avg(value_col).over(w))


def lag_delta(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    out_col: str = "gap_seconds",
) -> DataFrame:
    """Seconds since the key's previous event (null for the first) —
    the inter-arrival feature; lag(ts) over the same ordered
    window."""
    w = _ordered_window(key_col, ts_col, id_col)
    prev = F.lag(F.col(ts_col)).over(w)
    return events.withColumn(
        out_col,
        F.col(ts_col).cast("double") - prev.cast("double"),
    )


def running_total(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    out_col: str = "running_total",
) -> DataFrame:
    """Per-key cumulative sum in event order (ROWS unbounded
    preceding — RANGE would merge ts ties and differ from pandas'
    cumsum semantics)."""
    w = _ordered_window(key_col, ts_col, id_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return events.withColumn(out_col, F.sum(value_col).over(w))


def rank_in_key(
    events: DataFrame,
    key_col: str = "user_id",
    order_col: str = "value",
    id_col: str = "event_id",
    out_col: str = "value_rank",
    descending: bool = True,
) -> DataFrame:
    """Dense per-key rank of ``order_col`` (ties broken by id so the
    rank is total and engine-portable)."""
    oc: Column = F.desc(order_col) if descending else F.asc(order_col)
    w = Window.partitionBy(key_col).orderBy(oc, F.asc(id_col))
    return events.withColumn(
        out_col, F.row_number().over(w).cast("long")
    )


def ntile_in_key(
    events: DataFrame,
    n: int = 10,
    key_col: str = "user_id",
    order_col: str = "value",
    id_col: str = "event_id",
    out_col: str = "decile",
) -> DataFrame:
    """Per-key NTILE bucketing of ``order_col`` (ties broken by id so
    bucket assignment is total and engine-portable). Same single
    key-shuffle window as :func:`rank_in_key`.

    NULLS LAST explicitly: Spark's default ascending order is NULLS
    FIRST while DuckDB/ANSI default NULLS LAST, so an implicit order
    silently reshuffles every bucket the moment a NULL value appears
    (round-7 edge sweep). NaN needs no pin — both engines already
    sort it above every number."""
    w = Window.partitionBy(key_col).orderBy(
        F.asc_nulls_last(order_col), F.asc(id_col)
    )
    return events.withColumn(out_col, F.ntile(n).over(w).cast("long"))


def ewma_in_key(
    events: DataFrame,
    alpha: float = 0.5,
    depth: int = 8,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    out_col: str = "ewma",
) -> DataFrame:
    """Truncated exponentially-weighted moving average over the last
    ``depth`` rows per key: sum(a^j * lag(v, j)) / sum(a^j over
    PRESENT lags). Expressed as ``depth`` stacked lag() terms over
    ONE window spec — a single key shuffle, all inside codegen — and
    truncated (rather than the recursive full-history EWMA) so the
    weights are plan literals: no a^(-i) overflow at unbounded
    history, and the SQL oracle replays the identical lag algebra.
    """
    w = Window.partitionBy(key_col).orderBy(F.asc(ts_col), F.asc(id_col))
    num = None
    den = None
    for j in range(depth):
        term_v = F.lag(F.col(value_col), j).over(w)
        weight = F.lit(float(alpha**j))
        contrib = F.when(term_v.isNotNull(), term_v * weight).otherwise(F.lit(0.0))
        present = F.when(term_v.isNotNull(), weight).otherwise(F.lit(0.0))
        num = contrib if num is None else num + contrib
        den = present if den is None else den + present
    return events.withColumn(out_col, F.round(F.try_divide(num, den), 6))


def rolling_percentile(
    events: DataFrame,
    q: float = 0.95,
    frame_rows: int = 5,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """OP-WIN-05 [mandate] — trailing exact percentile over a bounded
    ROWS frame per key: the monitoring primitive behind rolling-p95
    latency/score tracking. An exact `percentile` aggregate evaluated
    as a window function over at most ``frame_rows`` values is cheap
    (the frame is constant-sized; this is NOT the global-percentile
    single-reducer cliff — operators/aggregates.py owns that case),
    and linear interpolation matches ANSI percentile_cont /
    DuckDB quantile_cont exactly, so the result value-oracles after
    the standard round(,6).

    Finite-values contract (round-7 edge sweep): engines disagree on
    how NaN/±inf interpolate inside a percentile kernel, so
    non-finite rows are excluded — from the output and from their
    neighbors' frames."""
    v = F.col(value_col)
    events = events.filter(
        v.isNotNull() & ~F.isnan(v) & (F.abs(v) < F.lit(float("inf")))
    )
    w = (
        _ordered_window(key_col, ts_col, id_col)
        .rowsBetween(-(frame_rows - 1), Window.currentRow)
    )
    return events.select(
        F.col(id_col),
        F.col(key_col),
        F.round(F.percentile(F.col(value_col), F.lit(q)).over(w), 6).alias(
            "rolling_p"
        ),
    )
