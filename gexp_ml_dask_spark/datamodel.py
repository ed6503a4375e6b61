"""Canonical schemas for the engine's tables.

The reference infers schemas (CSV sniffing with ``assume_missing=
True`` int->float promotion, ``functions/dask_pipeline.py:21``);
at 100 TB inference is a full-scan hazard, so the engine declares
explicit ``StructType`` schemas for its canonical tables and uses
them at every scan boundary.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Long-form gene-expression table — THE canonical internal layout
# (SURVEY.md §1.1): rows = (sample, gene, value) observations. The
# reference's wide n×f float64 matrix (brca_data_prep.ipynb cell-14:
# 1205×60,483) maps to this; Spark handles 60k+ physical columns
# poorly, and every reference column-op is a grouped op on long form.
GEXP_LONG_SCHEMA = T.StructType(
    [
        T.StructField("sample_id", T.LongType(), False),
        T.StructField("gene_id", T.StringType(), False),
        T.StructField("value", T.DoubleType(), True),
    ]
)

# Label vectors (classification: string subtype; regression: double).
# The reference aligns labels to features positionally
# (cluster_default_benchmark.py:83); the engine ALWAYS joins on
# sample_id instead.
LABELS_CLASS_SCHEMA = T.StructType(
    [
        T.StructField("sample_id", T.LongType(), False),
        T.StructField("label", T.StringType(), True),
    ]
)

LABELS_REG_SCHEMA = T.StructType(
    [
        T.StructField("sample_id", T.LongType(), False),
        T.StructField("label", T.DoubleType(), True),
    ]
)

# Per-sample raw GDC-style file: two tab-separated columns, no header
# (the missing load_gexp_dataset input layout, brca_data_prep.ipynb
# cell-12).
GEXP_RAW_FILE_SCHEMA = T.StructType(
    [
        T.StructField("gene_id", T.StringType(), False),
        T.StructField("value", T.DoubleType(), True),
    ]
)

# Multimodal document/asset table (mandate, SURVEY.md §2.11): opaque
# binary payload + typed metadata. Image/audio decode is stubbed in
# this container; the schema and partitioning are the real contract.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime_type", T.StringType(), True),
        T.StructField(
            "meta",
            T.MapType(T.StringType(), T.StringType()),
            True,
        ),
    ]
)

# Driver-provided test tables (/root/testdata/sf*/, TESTDATA.md).
DRIVER_TABLES = (
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
