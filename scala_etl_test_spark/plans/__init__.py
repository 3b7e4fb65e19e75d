from scala_etl_test_spark.plans.pipeline import EtlPipeline, build_products, build_clients

__all__ = ["EtlPipeline", "build_products", "build_clients"]
