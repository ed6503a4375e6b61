"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The real registry lives in ``gexp_ml_dask_spark.queries``; this
module is a thin adapter.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the full UpperQuartile normalization plan
    (OP-ML-01) — zero-gene drop, per-sample exact-quantile factors,
    geometric-mean symmetrization, broadcast scaling join — over the
    sf0.001 lineitem-as-gexp table."""
    from gexp_ml_dask_spark.queries import QUERIES

    return QUERIES["op_ml_01_upper_quartile"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from gexp_ml_dask_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every ✓-oracle query."""
    from gexp_ml_dask_spark.queries import ORACLE

    return dict(ORACLE)
