"""Sink operators (SURVEY.md §2.1, OP-SRC-05/06)."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ~64 MB target partition files — the reference's explicit tuning
# (data/brca_undersample.py:20 `npartitions = bytes/6.4e7`;
# brca_data_prep.ipynb cell-22).
TARGET_FILE_BYTES = 64 * 1024 * 1024


def write_parquet_sized(
    df: DataFrame,
    path: str,
    approx_bytes: int | None = None,
    compression: str = "snappy",
    mode: str = "overwrite",
) -> None:
    """OP-SRC-05 — snappy parquet sink with ~64 MB output files.

    Reference: ``dd.to_parquet(engine='pyarrow',
    compression='snappy')`` after repartitioning to bytes/64MB
    (data/brca_undersample.py:20-27). When ``approx_bytes`` is
    known we coalesce to ceil(bytes/64MB) writers; otherwise AQE's
    advisory partition size (set in session.py) already targets
    64 MB shuffle output.
    """
    if approx_bytes is not None:
        n = max(1, math.ceil(approx_bytes / TARGET_FILE_BYTES))
        df = df.coalesce(n) if n < 200 else df.repartition(n)
    df.write.mode(mode).option("compression", compression).parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """OP-SRC-06 — header CSV sink (``to_csv(index=False)``,
    data/brca_undersample.py:15-17; no index column exists in Spark,
    matching index=False)."""
    df.write.mode(mode).option("header", True).csv(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed parquet table — the PHYSICAL co-location primitive
    for repeated fact-fact joins at scale (the persistent analogue of
    the reference's division-aligned partitioning, OP-PHY-04).

    Two tables bucketed on the same key with the same bucket count
    sort-merge-join with ZERO exchanges (asserted in
    tests/test_plans.py): the shuffle is paid once at write time and
    amortized over every subsequent join/agg on the key. ``sort_col``
    additionally pre-sorts within buckets, removing the join's Sort.
    Requires a metastore-backed ``saveAsTable`` (session.py points
    the warehouse/metastore at stable local dirs; on a real cluster
    this is the shared catalog)."""
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, bucket_col)
    )
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    compression: str = "snappy",
    mode: str = "overwrite",
) -> None:
    """Hive-partitioned parquet sink (``partitionBy`` directory
    layout) — the primary data-layout lever at 100 TB: a reader
    filtering on a partition column touches only matching
    directories (partition pruning, visible as ``PartitionFilters``
    in the scan; pinned in tests/test_plans.py). Partition columns
    should be low-cardinality (lang, source, date); high-cardinality
    keys belong in bucketing (write_bucketed) instead — millions of
    tiny directories kill the listing phase."""
    (
        df.write.mode(mode)
        .option("compression", compression)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def write_orc(
    df: DataFrame,
    path: str,
    compression: str = "zstd",
    mode: str = "overwrite",
) -> None:
    """ORC sink — the second columnar interchange format (no
    reference analogue; the reference is parquet/CSV only). ORC is
    lossless for every engine type we use, carries the same
    column-pruning / predicate-pushdown benefits as parquet
    (Catalyst emits PushedFilters into the ORC scan too), and is the
    native format of Hive/Trino warehouses a 100 TB deployment
    typically has to interoperate with."""
    df.write.mode(mode).option("compression", compression).orc(path)


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: str | None = None,
) -> None:
    """JSON-Lines sink — the interchange format most LLM corpus
    tooling consumes. Spark writes one JSON object per line per
    partition file (read back with multiLine=False).

    ``compression="gzip"`` emits ``.json.gz`` part files (the way
    public corpora actually ship). Scale note: gzip is NOT splittable
    — each part file becomes exactly one read task — so compressed
    corpora must be written as many moderate files (the upstream
    partitioning IS the read parallelism); prefer parquet+zstd for
    internal hops and keep gzip for interchange."""
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def upsert_keep_latest(
    base: DataFrame,
    updates: DataFrame,
    key_col: str,
    version_col: str,
) -> DataFrame:
    """MERGE-by-rewrite for plain parquet lakes (open-source Spark
    has no transactional MERGE without a table format): union base
    and updates, keep the highest-version row per key (ties to the
    update side). One window shuffle on the key; at 100 TB this is
    the compaction job shape — partition the output by the same key
    ranges as the base so unchanged partitions can be skipped by a
    partition-pruned variant.
    """
    from pyspark.sql import Window

    tagged = base.withColumn("_side", F.lit(0)).unionByName(
        updates.withColumn("_side", F.lit(1))
    )
    w = Window.partitionBy(key_col).orderBy(
        F.desc(version_col), F.desc("_side")
    )
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_side")
    )
