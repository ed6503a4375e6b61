"""Stream-stream interval join (SURVEY.md §2.11, OP-LLM-05 — [mandate]).

The classic online attribution shape: join one event stream against
another on a key PLUS an event-time interval ("purchase within 30
minutes after a click by the same user"). Exists twice by design,
like every OP-LLM-05 operator:

  * BATCH form — an equi-join on the key with a residual time-band
    predicate; SQL-oracle checkable, and exactly what a backfill
    runs. At 100 TB the same semantics are served shuffle-once by
    ``operators.joins.banded_range_join`` (OP-JOIN-05); the plain
    form here keeps the single-equi-join plan AQE can broadcast.
  * STREAMING form — two watermarked streams joined with the time
    bound in the join condition. For stream-stream joins Spark
    REQUIRES both watermarks and the interval condition to bound
    state: each side's buffered rows are dropped once the other
    side's watermark passes the interval, so state is
    O(key-cardinality × horizon), not O(stream length). Inner-join
    matches emit in the micro-batch where both rows are present
    (the watermark only gates state eviction, not emission).

No reference analogue (the reference has no streams — SURVEY.md §2.5);
driver-mandate extension serviced by the ``events`` table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gexp_ml_dask_spark.streaming.windows import _open_event_stream


def _sides(
    events: DataFrame,
    left_type: str,
    right_type: str,
    ts_col: str,
    key_col: str,
    id_col: str,
):
    """Split one event relation into the two join sides with
    disjoint column names (stream-stream joins reject ambiguous
    attribute references, and the batch twin mirrors the rename so
    both forms share one output schema)."""
    left = events.where(F.col("event_type") == left_type).select(
        F.col(key_col).alias("l_user_id"),
        F.col(id_col).alias("left_id"),
        F.col(ts_col).alias("left_ts"),
    )
    right = events.where(F.col("event_type") == right_type).select(
        F.col(key_col).alias("user_id"),
        F.col(id_col).alias("right_id"),
        F.col(ts_col).alias("right_ts"),
    )
    return left, right


def _joined(left: DataFrame, right: DataFrame, horizon: str) -> DataFrame:
    cond = (
        (F.col("l_user_id") == F.col("user_id"))
        & (F.col("right_ts") >= F.col("left_ts"))
        & (F.col("right_ts") <= F.col("left_ts") + F.expr(f"INTERVAL {horizon}"))
    )
    return left.join(right, cond).select(
        "user_id",
        "left_id",
        "right_id",
        (F.col("right_ts").cast("long") - F.col("left_ts").cast("long")).alias(
            "delta_s"
        ),
    )


def interval_join_batch(
    events: DataFrame,
    left_type: str = "click",
    right_type: str = "purchase",
    horizon: str = "30 MINUTE",
    ts_col: str = "ts",
    key_col: str = "user_id",
    id_col: str = "event_id",
) -> DataFrame:
    """Batch attribution pairs: every ``right_type`` event joined to
    each ``left_type`` event by the same user within ``[left_ts,
    left_ts + horizon]``. One key equi-join (hash, AQE-broadcastable
    — both sides are type-filtered slices of the fact table) with
    the band as a residual filter; ``delta_s`` is whole seconds
    (timestamp→long truncation, matching ``floor(epoch(ts))``)."""
    left, right = _sides(events, left_type, right_type, ts_col, key_col, id_col)
    return _joined(left, right, horizon)


def streaming_interval_join(
    spark,
    source_path: str,
    schema,
    left_type: str = "click",
    right_type: str = "purchase",
    horizon: str = "30 MINUTE",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
    id_col: str = "event_id",
) -> DataFrame:
    """The online twin of :func:`interval_join_batch`: two file-source
    streams over the same event log (each side re-reads and filters
    its type — stream-stream joins need two independent stream
    scans), both watermarked, joined on the key + time interval.

    State bound: the left buffer holds a row until the RIGHT
    watermark passes ``left_ts + horizon``; the right buffer until
    the LEFT watermark passes ``right_ts``. Returns the unstarted
    streaming DataFrame; callers pick sink + trigger. Batch
    equivalence is the test oracle (tests/test_streaming.py)."""
    l_stream = _open_event_stream(spark, source_path, schema, ts_col)
    r_stream = _open_event_stream(spark, source_path, schema, ts_col)
    left, _ = _sides(l_stream, left_type, right_type, ts_col, key_col, id_col)
    _, right = _sides(r_stream, left_type, right_type, ts_col, key_col, id_col)
    left = left.withWatermark("left_ts", watermark)
    right = right.withWatermark("right_ts", watermark)
    return _joined(left, right, horizon)
