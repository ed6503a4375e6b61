"""SQL entry surface — register the canonical tables as temp views
and run ANSI SQL through ``spark.sql`` (Catalyst plans it like the
DataFrame API; the two surfaces are the same engine).

The reference has no SQL layer; this is the [mandate]-era front door
for users who speak SQL rather than DataFrames. Views are session-
scoped temp views (no catalog writes, safe in a shared session).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def register_views(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES
) -> None:
    """Register every driver table as a temp view over its parquet
    file. Scans stay lazy; predicate pushdown / pruning apply to SQL
    exactly as to DataFrame plans."""
    from gexp_ml_dask_spark.sources.readers import load_events, load_table

    for name in tables:
        df = load_events(spark, sf_dir) if name == "events" else load_table(
            spark, sf_dir, name
        )
        df.createOrReplaceTempView(name)


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Run one SQL query against the registered views (registering
    them first). The DataFrame comes back lazy, like any other."""
    register_views(spark, sf_dir)
    return spark.sql(query)
