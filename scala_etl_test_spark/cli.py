"""CLI entry point — the ``StartETL`` equivalent (StartETL.scala:14-35).

Usage: ``python -m scala_etl_test_spark.cli [-r <result_path>] [-c <props>]``
— with ``-r`` results go to parquet under the path, without it to console
(the reference's ``-r`` contract, StartETL.scala:4-12). Unknown flags error,
matching the reference's throw at StartETL.scala:25.
"""

from __future__ import annotations

import argparse

from scala_etl_test_spark.config import load_properties
from scala_etl_test_spark.plans.pipeline import EtlPipeline
from scala_etl_test_spark.session import apply_azure_sas, build_session
from scala_etl_test_spark.sources.api_source import read_product_details_api
from scala_etl_test_spark.sources.csv_source import read_orders_csv
from scala_etl_test_spark.sources.jdbc_source import read_orders_jdbc


def main(argv: list[str] | None = None) -> None:
    parser = argparse.ArgumentParser(prog="scala-etl-test-spark")
    parser.add_argument("-r", "--result-path", default=None, help="parquet output dir (console if omitted)")
    parser.add_argument("-c", "--config", required=True, help="application.properties-style config file")
    parser.add_argument("--csv-watermark", type=int, default=-1, help="file-number watermark (S2)")
    parser.add_argument("--jdbc-watermark", type=int, default=-1, help="order_id watermark (S3)")
    args = parser.parse_args(argv)

    props = load_properties(args.config)
    spark = build_session()
    # reference parity (ApplaudoETL.scala:33): wasbs:// SAS credential from
    # the properties file, applied before any source path is resolved
    apply_azure_sas(spark, props)

    sources = []
    if "source.csv.path" in props:
        sources.append(read_orders_csv(spark, props["source.csv.path"], args.csv_watermark))
    if "mssql.url" in props:
        sources.append(
            read_orders_jdbc(
                spark,
                props["mssql.url"],
                props["mssql.dbtable"],
                args.jdbc_watermark,
                driver=props.get("mssql.driver"),
                user=props.get("mssql.user"),
                password=props.get("mssql.password"),
            )
        )
    if not sources:
        raise SystemExit("config declares no sources (source.csv.path / mssql.url)")

    dim = read_product_details_api(spark, props["api.url"])
    EtlPipeline(spark, args.result_path).run(sources, dim)


if __name__ == "__main__":
    main()
