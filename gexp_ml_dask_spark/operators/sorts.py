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


def global_rank(
    df: DataFrame,
    key_col: str,
    tie_col: str,
    descending: bool = False,
    n_buckets: int = 16,
    out_col: str = "rank",
) -> DataFrame:
    """Exact global row_number by (key, tie) WITHOUT the
    single-partition window cliff (``Window.orderBy`` with no
    partitionBy funnels the whole table through one task — the
    classic 100 TB non-starter).

    Same shape as the estimator fits (TMM/UQ): two tiny actions whose
    scalars are inlined as plan literals, then one deterministic
    distributed plan.

      1. collect ~``n_buckets`` approx-percentile boundaries of the
         key and FREEZE them as literals (the sketch is only advisory
         — boundaries shift bucket sizes, never correctness);
      2. count rows per boundary bucket (an O(n_buckets)-row action)
         and turn the running totals into a literal offset map;
      3. rank inside each bucket with a bucket-partitioned window and
         add the bucket's offset.

    Buckets are contiguous key ranges and the bucket id is a pure
    FUNCTION of the key (not of physical layout or sampling state),
    so offset + local rank == global rank exactly, reproducibly.
    Ranks are 1-based, dense over the frame; ties are broken by
    ``tie_col`` so the order is total."""
    from pyspark.sql import Window

    s = F.col(key_col).cast("double")
    if descending:
        s = -s
    probs = [i / n_buckets for i in range(1, n_buckets)]
    row = df.select(
        F.percentile_approx(s, probs, 10_000).alias("b")
    ).collect()[0]["b"]
    bounds = sorted({b for b in (row or []) if b is not None})

    pid = F.lit(0)
    for b in bounds:
        pid = pid + F.when(s > F.lit(b), 1).otherwise(0)
    tmp = df.withColumn("_gr_pid", pid)

    counts = {
        r["_gr_pid"]: r["c"]
        for r in tmp.groupBy("_gr_pid").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    offsets, acc = {}, 0
    for p in sorted(counts):
        offsets[p] = acc
        acc += counts[p]
    if offsets:
        mapping = F.create_map(
            *[
                lit
                for p, o in sorted(offsets.items())
                for lit in (F.lit(p), F.lit(o))
            ]
        )
        off = F.coalesce(mapping[F.col("_gr_pid")], F.lit(0))
    else:
        off = F.lit(0)

    key_order = F.col(key_col).desc() if descending else F.col(key_col).asc()
    w = Window.partitionBy("_gr_pid").orderBy(key_order, F.col(tie_col).asc())
    return tmp.withColumn(
        out_col, (F.row_number().over(w) + off).cast("long")
    ).drop("_gr_pid")
