from dask_datapipeline_spark.functions.timestamps import (
    cast_timestamp,
    parse_timestamp_literal,
)
from dask_datapipeline_spark.functions.numeric import bround2, exact_sum

__all__ = ["cast_timestamp", "parse_timestamp_literal", "bround2", "exact_sum"]
