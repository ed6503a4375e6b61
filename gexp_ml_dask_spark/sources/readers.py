"""Scan operators (SURVEY.md §2.1, OP-SRC-01..04).

All readers return lazy DataFrames; Catalyst pushes projections and
predicates into the scans (parquet row-group skipping, CSV column
pruning) — the reference has no equivalent and re-reads everything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver-provided parquet table from an sf directory."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load the events table with its timestamp column normalized to
    a session-timezone ``TimestampType`` (the session is pinned UTC,
    so epoch values are unchanged).

    Driver-generated events.parquet has shipped two physical ``ts``
    encodings across rounds, both handled here:
      * ``timestamp[ns]`` — Spark 4 rejects it (PARQUET_TYPE_ILLEGAL)
        unless ``spark.sql.legacy.parquet.nanosAsLong`` is set (a
        session-mutable conf, so setting it here also covers the
        driver's vanilla session); the nanos->micros conversion uses
        integer ``div`` (a double roundtrip at 1e18 nanos loses
        exactness).
      * ``timestamp[us]`` without UTC adjustment — read as
        TIMESTAMP_NTZ, which ANSI mode can't cast to numeric; under a
        UTC session the cast to TimestampType is epoch-exact.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # The NTZ->timestamp cast below reads the naive wall time in the
    # SESSION timezone; the stored values are naive-as-UTC, so pin it
    # (no-op on a UTC host, correctness insurance elsewhere).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(ts_type, T.TimestampNTZType):
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """OP-SRC-01 — parquet scan.

    Reference: ``dd.read_parquet(path).persist()``
    (functions/dask_pipeline.py:19,23). Spark parquet scans are
    columnar with predicate pushdown; persistence is the caller's
    decision (see operators.physical.persist_df), not the scan's.
    """
    return spark.read.parquet(path)


def read_csv_inferred(
    spark: SparkSession,
    path: str,
    sampling_ratio: float | None = None,
    force_double: bool = True,
) -> DataFrame:
    """OP-SRC-02 — header CSV scan with schema inference.

    Reference: ``dd.read_csv(path, assume_missing=True,
    sample=2000000)`` (functions/dask_pipeline.py:21) — a 2 MB type
    sniff with ints promoted to float so later-chunk NaNs can't flip
    dtypes. Spark's analogue: ``inferSchema`` (optionally bounded by
    ``samplingRatio``) + an explicit integral->double cast to mirror
    ``assume_missing``.
    """
    reader = spark.read.options(header=True, inferSchema=True)
    if sampling_ratio is not None:
        reader = reader.option("samplingRatio", str(sampling_ratio))
    df = reader.csv(path)
    if force_double:
        integral = (T.IntegerType(), T.LongType(), T.ShortType(), T.ByteType())
        df = df.select(
            *[
                F.col(f.name).cast("double").alias(f.name)
                if isinstance(f.dataType, integral)
                else F.col(f.name)
                for f in df.schema.fields
            ]
        )
    return df


def read_tsv_projected(
    spark: SparkSession,
    path: str,
    usecols: list[str] | None = None,
    na_value: str = "'--",
    dropna: bool = True,
) -> DataFrame:
    """OP-SRC-03 — TSV scan with column projection + NA markers.

    Reference: ``pd.read_csv(sep='\\t', usecols=[...],
    na_values="'--").dropna()`` (lung_data_prep.ipynb cell-3). The
    ``select`` happens before any action so Catalyst prunes columns
    at the scan.
    """
    df = spark.read.options(
        sep="\t", header=True, inferSchema=True, nullValue=na_value
    ).csv(path)
    if usecols:
        df = df.select(*usecols)
    if dropna:
        df = df.na.drop()
    return df


def read_json_mapping(
    spark: SparkSession,
    path: str,
    key_col: str,
    value_col: str,
    multiline: bool = False,
) -> DataFrame:
    """OP-SRC-04 — JSON metadata -> (key, value) mapping table.

    Reference builds a ``{submitter_id -> file_name}`` dict from GDC
    metadata JSON and applies it with ``Series.map``
    (brca_data_prep.ipynb cell-5/6). The engine keeps the mapping as
    a (small, broadcastable) DataFrame; ``map`` becomes a broadcast
    left join (operators.joins.map_column).

    ``multiline=True`` for a single JSON-array document (the GDC
    metadata layout); default False reads JSON Lines.
    """
    return (
        spark.read.option("multiLine", multiline)
        .json(path)
        .select(F.col(key_col).alias("key"), F.col(value_col).alias("value"))
    )
