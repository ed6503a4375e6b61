"""Ingest tests (OP-SRC-07): many-files merge + wide<->long pivots —
the reference's missing ``load_gexp_dataset`` reconstructed
(brca_data_prep.ipynb cell-12 call site; SURVEY.md §0 'Missing
module')."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def sample_files(tmp_path_factory):
    """Three per-sample two-column TSVs, GDC-shaped: gene_id \t value."""
    d = tmp_path_factory.mktemp("gexp_files")
    data = {
        "s_b.txt": [("ENSG1", 1.0), ("ENSG2", 2.0)],
        "s_a.txt": [("ENSG1", 3.0), ("ENSG2", 0.0)],
        "s_c.txt": [("ENSG1", 5.0), ("ENSG3", 7.0)],
    }
    for fname, rows in data.items():
        with open(os.path.join(d, fname), "w") as f:
            for g, v in rows:
                f.write(f"{g}\t{v}\n")
    return str(d)


def test_load_gexp_dataset_merges_files(spark, sample_files):
    from gexp_ml_dask_spark.sources.gexp_ingest import load_gexp_dataset

    long_df = load_gexp_dataset(spark, sample_files)
    rows = long_df.collect()
    assert len(rows) == 6
    # dense ordinal ids follow sorted file order: s_a=0, s_b=1, s_c=2
    ids = {
        r["sample_file"]: r["sample_id"] for r in rows
    }
    assert ids == {"s_a.txt": 0, "s_b.txt": 1, "s_c.txt": 2}
    vals = {
        (r["sample_file"], r["gene_id"]): r["value"] for r in rows
    }
    assert vals[("s_a.txt", "ENSG1")] == 3.0
    assert vals[("s_c.txt", "ENSG3")] == 7.0


def test_load_with_mapping_renames_samples(spark, sample_files):
    from gexp_ml_dask_spark.sources.gexp_ingest import load_gexp_dataset

    mapping = spark.createDataFrame(
        [("TCGA-01", "s_a.txt"), ("TCGA-02", "s_b.txt")],
        "key string, value string",
    )
    long_df = load_gexp_dataset(spark, sample_files, mapping=mapping)
    names = {r["sample_file"] for r in long_df.collect()}
    # mapped files renamed, unmapped keep the file name
    assert names == {"TCGA-01", "TCGA-02", "s_c.txt"}


def test_pivot_roundtrip(spark, sample_files):
    """long -> wide -> long returns the original (missing cells
    become explicit nulls in wide, dropped again on unpivot)."""
    from gexp_ml_dask_spark.sources.gexp_ingest import (
        load_gexp_dataset,
        long_to_wide,
        wide_to_long,
    )

    long_df = load_gexp_dataset(spark, sample_files).select(
        "sample_id", "gene_id", "value"
    )
    wide = long_to_wide(long_df, gene_ids=["ENSG1", "ENSG2", "ENSG3"])
    assert set(wide.columns) == {"sample_id", "ENSG1", "ENSG2", "ENSG3"}
    back = wide_to_long(wide).filter(F.col("value").isNotNull())
    orig = {(r["sample_id"], r["gene_id"], r["value"]) for r in long_df.collect()}
    got = {(r["sample_id"], r["gene_id"], r["value"]) for r in back.collect()}
    assert got == orig
