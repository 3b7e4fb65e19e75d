"""Operator library: reference-parity transforms plus beyond-reference
training-data operators. All pure ``DataFrame -> DataFrame`` functions."""

from scala_etl_test_spark.operators.transform import merge_and_transform, parse_order_detail
from scala_etl_test_spark.operators.validate import validate_data_values
from scala_etl_test_spark.operators.category import clients_category, with_department_sums
from scala_etl_test_spark.operators.segmentation import (
    clients_segmentation,
    exact_quantiles_per_group,
)

__all__ = [
    "merge_and_transform",
    "parse_order_detail",
    "validate_data_values",
    "clients_category",
    "with_department_sums",
    "clients_segmentation",
    "exact_quantiles_per_group",
]
