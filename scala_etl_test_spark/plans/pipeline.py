"""Pipeline orchestration — the ``start()`` equivalent.

Reference flow (ApplaudoETL.scala:31-67):

1. merge CSV + JDBC orders (positional union) and normalize ``order_detail``;
2. broadcast LEFT join the API product dimension on
   ``product == product_name`` (dim's ``aisle`` renamed ``aisle_pd`` and
   dropped with ``product_name`` after the join — ``:39``, ``:43-44``);
3. schema-driven validation (trim strings / abs numerics);
4. sink ``products`` (parquet or console);
5. derive ``clients`` = category ⋈ segmentation on ``user_id`` and sink it.

Spark-first deltas (SURVEY §4.2/§7):
- the validated DF is **persisted** across the category/segmentation branches
  (both shuffle by ``user_id``; without the persist the whole upstream scan
  re-runs per branch);
- the 7 driver-side quantile jobs collapse into one ``groupBy`` pass inside
  :func:`clients_segmentation`;
- both rule UDFs are native expressions, so every stage is whole-stage
  codegen-able.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F

from scala_etl_test_spark.operators.category import clients_category
from scala_etl_test_spark.operators.segmentation import clients_segmentation
from scala_etl_test_spark.operators.transform import merge_and_transform
from scala_etl_test_spark.operators.validate import validate_data_values
from scala_etl_test_spark.sources.sinks import show_console, store_parquet


def build_products(orders_sources: list[DataFrame], product_details: DataFrame) -> DataFrame:
    """Raw order sources + dimension → validated 10-column ``products`` fact
    (golden header at reference README.md:60-62)."""
    df_orders = merge_and_transform(*orders_sources)
    dim = product_details.withColumnRenamed("aisle", "aisle_pd")
    joined = df_orders.join(
        F.broadcast(dim), df_orders["product"] == dim["product_name"], "left"
    ).drop("aisle_pd", "product_name")
    return validate_data_values(joined)


def build_clients(df_validated: DataFrame, deterministic_segments: bool = True) -> DataFrame:
    """Validated products fact → ``clients`` (user_id, category,
    client_segment), the J2 inner USING join (ApplaudoETL.scala:59)."""
    df_category = clients_category(df_validated)
    df_segmentation = clients_segmentation(df_validated, deterministic=deterministic_segments)
    return df_category.join(df_segmentation, on=["user_id"])


@dataclass
class EtlPipeline:
    """End-to-end run: sources → products → clients → sinks."""

    spark: SparkSession
    result_path: str | None = None
    products_table: str = "products"
    clients_table: str = "clients"
    deterministic_segments: bool = True
    _outputs: dict = field(default_factory=dict)

    def run(self, orders_sources: list[DataFrame], product_details: DataFrame) -> dict:
        df_validated = build_products(orders_sources, product_details)
        # One materialization reused by the sink + both client branches.
        df_validated.persist()
        try:
            self._sink(df_validated, self.products_table)
            df_clients = build_clients(df_validated, self.deterministic_segments)
            self._sink(df_clients, self.clients_table)
            self._outputs = {"products": df_validated, "clients": df_clients}
            return self._outputs
        finally:
            df_validated.unpersist()

    def _sink(self, df: DataFrame, table: str) -> None:
        if self.result_path:
            store_parquet(df, self.result_path, table)
        else:
            show_console(df)
