"""Sort / top-k operators (SURVEY.md §2.6, OP-SORT-01/02)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sort_by_key(df: DataFrame, key: str = "sample_id", ascending: bool = True) -> DataFrame:
    """OP-SORT-01 — ``.sort_index()`` re-alignment
    (brca_data_prep.ipynb cell-14). Range-partitioned total sort;
    only needed at export edges — engine internals never depend on
    row order."""
    col = F.col(key).asc() if ascending else F.col(key).desc()
    return df.orderBy(col)


def top_k_genes_by_variance(
    gexp: DataFrame,
    k: int,
    gene_col: str = "gene_id",
    value_col: str = "value",
) -> DataFrame:
    """OP-SORT-02 keep-list — top-k features by variance
    (data/brca_undersample.py:11-13: ``var(axis=0).sort_values(
    ascending=False)`` then first k). Spark plans orderBy+limit as
    TakeOrderedAndProject — per-partition heaps, no total sort.
    Ties broken by gene_id for determinism (pandas keeps first
    occurrence; any stable rule differs only inside exact ties)."""
    return (
        gexp.groupBy(gene_col)
        .agg(F.var_samp(value_col).alias("var_value"))
        .orderBy(F.col("var_value").desc(), F.col(gene_col).asc())
        .limit(k)
    )


def select_top_k_variance(gexp: DataFrame, k: int, gene_col: str = "gene_id", value_col: str = "value") -> DataFrame:
    """OP-SORT-02 — fact table restricted to the top-k-variance
    keep-list (broadcast semi-join)."""
    keep = top_k_genes_by_variance(gexp, k, gene_col, value_col).select(gene_col)
    return gexp.join(F.broadcast(keep), gene_col, "left_semi")
