from dask_datapipeline_spark.sources.readers import (
    load_testdata,
    scan_csv,
    scan_json,
    scan_parquet,
)
from dask_datapipeline_spark.sources.writers import write_csv, write_parquet

__all__ = [
    "scan_csv",
    "scan_parquet",
    "scan_json",
    "load_testdata",
    "write_csv",
    "write_parquet",
]
