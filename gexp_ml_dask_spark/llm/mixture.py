"""Dataset mixture sampling (SURVEY.md §2.11, [mandate]).

Training corpora are blended from heterogeneous sources with
per-source sampling rates ("mixture weights"). At 100 TB the sampler
must be a single filter pass — no global shuffle, no RNG whose
stream depends on partition layout — so membership is a pure
function of (doc key, seed), exactly the hash-derived-randomness
rule the split/fold operators follow (ml.pipeline.hash_bucket).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Rate resolution: rates are quantized to 1/RESOLUTION steps so the
# keep cut is an exact integer compare in every engine.
RESOLUTION = 100_000


def sample_mixture(
    docs: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Keep each document with its source's rate, deterministically:
    doc kept iff md5-bucket(id, seed) < rate * RESOLUTION. Sources
    absent from ``weights`` are dropped (rate 0). The weights table
    is dimension-sized — broadcast inner join, then one codegen
    filter; the fact side is never shuffled."""
    from gexp_ml_dask_spark.ml.pipeline import hash_bucket

    spark = docs.sparkSession
    wdf = spark.createDataFrame(
        [(s, int(round(w * RESOLUTION))) for s, w in sorted(weights.items())],
        f"{source_col} string, _cut long",
    )
    b = hash_bucket(id_col, seed, RESOLUTION)
    return (
        docs.join(F.broadcast(wdf), source_col)
        .filter(b < F.col("_cut"))
        .drop("_cut")
    )


def upsample_mixture(
    docs: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Mixture sampling with rates above 1 (source upweighting):
    each doc is emitted floor(rate) times plus one more iff its
    seeded bucket falls under frac(rate) — so expected copies equal
    the rate exactly and membership stays a pure function of
    (key, seed). Output adds ``copy_id`` (1..n) so downstream
    shuffles spread the repeats. Same single broadcast-join +
    codegen pass as :func:`sample_mixture`; the explode is
    row-local (no shuffle)."""
    from gexp_ml_dask_spark.ml.pipeline import hash_bucket

    spark = docs.sparkSession
    wdf = spark.createDataFrame(
        [(s, int(round(w * RESOLUTION))) for s, w in sorted(weights.items())],
        f"{source_col} string, _base long",
    )
    b = hash_bucket(id_col, seed, RESOLUTION)
    n_copies = (F.col("_base") / F.lit(RESOLUTION)).cast("long") + F.when(
        b < F.col("_base") % F.lit(RESOLUTION), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        docs.join(F.broadcast(wdf), source_col)
        .withColumn("_n", n_copies)
        .filter(F.col("_n") > 0)
        .withColumn(
            "copy_id",
            F.explode(F.sequence(F.lit(1).cast("long"), F.col("_n"))),
        )
        .drop("_base", "_n")
    )
