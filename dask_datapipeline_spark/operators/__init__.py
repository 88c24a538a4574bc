from dask_datapipeline_spark.operators.joins import equi_join, fold_join
from dask_datapipeline_spark.operators.aggregates import group_agg, AggSpec
from dask_datapipeline_spark.operators.filters import filter_before, filter_between

__all__ = [
    "equi_join",
    "fold_join",
    "group_agg",
    "AggSpec",
    "filter_before",
    "filter_between",
]
