"""End-to-end document curation plan (SURVEY.md §2.11, [mandate]).

The LLM-data-pipeline operators composed the way a training-corpus
build actually runs them — exact dedup, then quality gating, then
mixture sampling — as ONE lazy DataFrame plan. Catalyst fuses the
quality scalars into the post-dedup projection and the mixture
filter under the broadcast join, so the fact table is shuffled
exactly once (the dedup window) end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gexp_ml_dask_spark.llm.dedup import exact_dedup
from gexp_ml_dask_spark.llm.mixture import sample_mixture
from gexp_ml_dask_spark.llm.text import quality_expr


def curate_documents(
    docs: DataFrame,
    weights: dict[str, float],
    min_quality: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    seed: int = 42,
) -> DataFrame:
    """documents -> deduped, quality-gated, mixture-sampled corpus:
    (doc_id, source, quality) for every surviving document.

    Stage order matters at scale: dedup first (a duplicate-heavy
    crawl shrinks before any scoring work), quality second (pure
    column folds over the survivors), sampling last (so mixture
    rates apply to the CLEAN distribution, the standard curation
    contract).
    """
    deduped = exact_dedup(docs, id_col, text_col)
    # quality is a plain column expression — inlined, NOT a
    # text_stats self-join (which would re-shuffle the fact table
    # on doc_id and evaluate the dedup window twice)
    gated = (
        deduped.withColumn("quality", F.round(quality_expr(text_col), 6))
        .filter(F.col("quality") >= min_quality)
        .select(id_col, source_col, "quality")
    )
    return sample_mixture(gated, weights, source_col, id_col, seed)
