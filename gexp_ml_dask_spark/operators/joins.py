"""Join operators (SURVEY.md §2.3, OP-JOIN-01..03).

The reference has NO keyed joins — all alignment is positional
(matching Dask partition divisions, cluster_default_benchmark.py:83).
The engine replaces every positional alignment with an explicit
equi-join on ``sample_id``; the small side (per-sample factors,
labels, mappings) is always broadcast, so the fact table is never
shuffled for these.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scale_rows(
    gexp: DataFrame,
    factors: DataFrame,
    sample_col: str = "sample_id",
    value_col: str = "value",
    factor_col: str = "scaling_factor",
) -> DataFrame:
    """OP-JOIN-01 — the "scaling join": per-row factor applied across
    all of a sample's values (``X.mul(scaling_factor, axis=0)``,
    feature_selection_and_normalization.py:31,58,115). Inner
    equi-join with NO static broadcast hint: |factors| = n samples,
    which scales with the data — forcing a broadcast measured 3.5x
    slower than a shuffle join once factors hit 1.5M rows. AQE sees
    the factor agg's real shuffle size at runtime and picks
    broadcast-hash only when the side is actually small."""
    return (
        gexp.join(factors.select(sample_col, factor_col), sample_col, "inner")
        .withColumn(value_col, F.col(value_col) * F.col(factor_col))
        .drop(factor_col)
    )


def align_features_labels(
    features: DataFrame,
    labels: DataFrame,
    sample_col: str = "sample_id",
) -> DataFrame:
    """OP-JOIN-03 — feature<->label alignment. The reference zips by
    partition divisions (functions/dask_pipeline.py:48-52); the
    engine joins by key. Labels are one row per sample — broadcast."""
    return features.join(F.broadcast(labels), sample_col, "inner")


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe fact⋈dim equi-join by key salting — the manual
    fallback when a hot key overwhelms even AQE's skew-join splitting
    (AQE splits post-shuffle partitions; salting additionally spreads
    a single hot key's BUILD side).

    Fact rows get a random salt in [0, salt); the dim side is
    replicated ``salt`` ways (explode of a literal range — dim-sized
    sides only). The join key becomes (key, salt), so one hot key
    lands in ``salt`` tasks instead of one. Row-identical to the
    plain join for inner/left joins on unique dim keys.
    """
    salted_fact = fact.withColumn(
        "_salt", (F.rand(seed=42) * salt).cast("int")
    )
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = salted_fact.join(salted_dim, [key, "_salt"], how)
    return out.drop("_salt")


def map_column(
    df: DataFrame,
    mapping: DataFrame,
    col: str,
    key_col: str = "key",
    value_col: str = "value",
    keep_unmapped: bool = True,
) -> DataFrame:
    """OP-SCL-06 — dict-map a column (``Series.map(dict)``,
    brca_data_prep.ipynb cell-6) as a broadcast left join + coalesce.
    ``keep_unmapped=False`` mirrors pandas' NaN for missing keys."""
    m = mapping.select(
        F.col(key_col).alias("_k"), F.col(value_col).alias("_v")
    )
    out = df.join(F.broadcast(m), df[col] == F.col("_k"), "left")
    mapped = (
        F.coalesce(F.col("_v"), F.col(col)) if keep_unmapped else F.col("_v")
    )
    return out.withColumn(col, mapped).drop("_k", "_v")
