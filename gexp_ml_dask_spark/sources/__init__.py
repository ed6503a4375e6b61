from gexp_ml_dask_spark.sources.readers import (
    load_table,
    read_csv_inferred,
    read_json_mapping,
    read_parquet,
    read_tsv_projected,
)
from gexp_ml_dask_spark.sources.writers import write_csv, write_parquet_sized
from gexp_ml_dask_spark.sources.gexp_ingest import (
    load_gexp_dataset,
    long_to_wide,
    wide_to_long,
)

__all__ = [
    "load_table",
    "read_parquet",
    "read_csv_inferred",
    "read_tsv_projected",
    "read_json_mapping",
    "write_parquet_sized",
    "write_csv",
    "load_gexp_dataset",
    "long_to_wide",
    "wide_to_long",
]
