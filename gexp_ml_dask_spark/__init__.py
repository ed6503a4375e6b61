"""gexp_ml_dask_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query / data-processing
capabilities of the reference repo ``PedroGFerreira/gexp-ml-dask``
(a Dask-vs-pandas gene-expression ML benchmark suite) on idiomatic
Spark: DataFrame/SQL plans optimized by Catalyst, ``pyspark.ml``
estimators for the normalizer composites, Structured Streaming for
event windows, plus the large-scale training-data-pipeline operators
(dedup, similarity search, multimodal columns, text analysis) the
reference does not have.

Design stance (SURVEY.md §7): the canonical data model is the
*long-form* expression table ``gexp(sample_id BIGINT, gene_id
STRING, value DOUBLE)`` with keyed joins everywhere the reference
relies on positional alignment. Every matrix op in the reference
becomes a join/groupBy/window plan; wide<->long converters sit at
the edges.
"""

from gexp_ml_dask_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
