"""ML pre-processing pipeline (SURVEY.md §2.10, OP-ML-03/04/05 +
OP-PHY-03).

Mirrors the reference's pre_ml_processing (functions/dask_pipeline.
py:55-76) with keyed joins instead of positional chunk alignment:
long-form preprocessing -> per-sample feature vectors -> seeded
split -> label encoding -> standard scaling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gene_index(gexp: DataFrame, gene_col: str = "gene_id") -> DataFrame:
    """Sorted gene dim with dense ordinal positions. Tiny (one row
    per gene) — the window sort is over the dim, never the fact."""
    return (
        gexp.select(gene_col)
        .distinct()
        .withColumn("_gidx", F.row_number().over(Window.orderBy(gene_col)) - 1)
    )


def assemble_vectors(
    gexp: DataFrame,
    sample_col: str = "sample_id",
    gene_col: str = "gene_id",
    value_col: str = "value",
    out_col: str = "features",
    dense: bool = True,
) -> DataFrame:
    """OP-PHY-03 — long form -> one ML feature Vector per sample
    (replaces the reference's to_dask_array + rechunk,
    functions/dask_pipeline.py:48-52).

    Gene order is fixed by the sorted gene dim broadcast onto the
    fact, so every sample's vector has identical layout without a
    wide DataFrame ever materializing. One shuffle (the groupBy).

    ``dense=True`` (the canonical gexp case: every kept gene present
    for every sample, zeros explicit) stays entirely JVM-side:
    sort_array + field extraction. ``dense=False`` handles ragged
    input — absent pairs become sparse zeros — via an Arrow-batched
    pandas UDF building SparseVectors (the declared escape hatch,
    OP-LLM-06; a JVM scatter for ragged rows doesn't exist).
    """
    genes = gene_index(gexp, gene_col)
    n_genes = genes.count()

    indexed = gexp.join(F.broadcast(genes), gene_col)
    pairs = indexed.groupBy(sample_col).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("_gidx"), F.col(value_col).alias("v")))
        ).alias("_pairs")
    )

    if dense:
        from pyspark.ml.functions import array_to_vector

        arr = F.transform(F.col("_pairs"), lambda p: p["v"])
        return pairs.select(sample_col, array_to_vector(arr).alias(out_col))

    from pyspark.ml.linalg import SparseVector, VectorUDT

    # VectorUDT cannot cross the Arrow boundary (mapInPandas), so
    # this is a plain UDF — but it fires once per SAMPLE over the
    # pre-aggregated pair array (n rows, not n×f cells), so the
    # pickle cost is per-sample, not per-value.
    @F.udf(returnType=VectorUDT())
    def to_sparse(ps):
        return SparseVector(
            n_genes, [int(p["_gidx"]) for p in ps], [float(p["v"]) for p in ps]
        )

    return pairs.select(sample_col, to_sparse(F.col("_pairs")).alias(out_col))


def train_test_split(
    df: DataFrame, test_size: float = 0.3, seed: int = 42
) -> tuple[DataFrame, DataFrame]:
    """OP-ML-03 — seeded random split (``train_test_split(test_size
    =0.3, shuffle=True, random_state=42)``, functions/dask_pipeline.
    py:57-58). Row membership can't match sklearn's RNG row-for-row
    (SURVEY.md §7.5); the contract is the proportion + determinism
    for a fixed seed."""
    train, test = df.randomSplit([1.0 - test_size, test_size], seed=seed)
    return train, test


def encode_labels(
    df: DataFrame, label_col: str = "label", out_col: str = "label_idx"
) -> tuple[DataFrame, list[str]]:
    """OP-ML-04 — sklearn LabelEncoder contract: codes follow the
    SORTED distinct labels (functions/dask_pipeline.py:64-66), which
    is StringIndexer's alphabetAsc ordering."""
    from pyspark.ml.feature import StringIndexer

    model = StringIndexer(
        inputCol=label_col, outputCol=out_col, stringOrderType="alphabetAsc"
    ).fit(df)
    return model.transform(df), list(model.labels)


def fit_standard_scaler(
    train: DataFrame, features_col: str = "features", out_col: str = "features_scaled"
):
    """OP-ML-05 — StandardScaler(withMean, withStd) fit on TRAIN
    only, applied to train+test (functions/dask_pipeline.py:72-74).
    Returns the fitted model; call ``.transform`` on each split."""
    from pyspark.ml.feature import StandardScaler

    return StandardScaler(
        inputCol=features_col, outputCol=out_col, withMean=True, withStd=True
    ).fit(train)


def standard_scale_long(
    gexp: DataFrame,
    stats: DataFrame | None = None,
    sample_col: str = "sample_id",
    gene_col: str = "gene_id",
    value_col: str = "value",
) -> DataFrame:
    """OP-ML-05 (long-form twin) — (x - μ_g) / σ_g per gene with the
    sklearn σ=0 -> 1 guard; ``stats`` (per-gene mean/std from a
    train split) may be precomputed to scale a held-out set."""
    if stats is None:
        from gexp_ml_dask_spark.operators.aggregates import per_gene_scaling_stats

        stats = per_gene_scaling_stats(gexp, gene_col, value_col)
    sd = F.col("std_value")
    safe = F.when(sd.isNull() | (sd == 0), F.lit(1.0)).otherwise(sd)
    return (
        gexp.join(F.broadcast(stats), gene_col)
        .withColumn(value_col, (F.col(value_col) - F.col("mean_value")) / safe)
        .drop("mean_value", "std_value")
    )


def stratified_sample(
    df: DataFrame,
    n_per_total: int,
    label_col: str = "label",
    seed: int = 42,
    exact: bool = True,
) -> DataFrame:
    """OP-ML-11 — stratified subsample preserving label proportions
    (``train_test_split(..., stratify=labels)``, data/brca_
    undersample.py:29-36).

    ``exact=True`` carves exactly round(n * p_label) rows per label
    via a per-label window (fine when labels are few); False uses
    ``sampleBy`` (single pass, approximate sizes — the 100 TB path).
    """
    total = df.count()
    frac = min(1.0, n_per_total / total)
    if not exact:
        labels = [r[0] for r in df.select(label_col).distinct().collect()]
        return df.sampleBy(label_col, {l: frac for l in labels}, seed=seed)
    counts = {r[0]: r[1] for r in df.groupBy(label_col).count().collect()}
    quota = {l: int(round(c * frac)) for l, c in counts.items()}
    w = Window.partitionBy(label_col).orderBy(F.rand(seed))
    ranked = df.withColumn("_rn", F.row_number().over(w))
    quota_df = df.sparkSession.createDataFrame(
        list(quota.items()), f"{label_col} string, _quota int"
    )
    return (
        ranked.join(F.broadcast(quota_df), label_col)
        .filter(F.col("_rn") <= F.col("_quota"))
        .drop("_rn", "_quota")
    )
