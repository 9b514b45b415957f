"""The reference library's core workflow, end to end on this engine:
JSON table metadata -> read raw data -> impose schema/order (conform)
-> write partitioned parquet -> register in the catalog -> query it.

Run standalone:  python examples/metadata_etl.py [sf_dir]
(or import and call main(spark, sf_dir) from tests/notebooks)
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(spark, sf_dir: str) -> None:
    from pyspark.sql import functions as F

    from dataengineeringutils_spark import catalog, io
    from dataengineeringutils_spark.meta import TableMeta, conformance_report
    from dataengineeringutils_spark.paths import scratch_dir
    from dataengineeringutils_spark.tables import table

    meta = TableMeta.from_dict(
        {
            "name": "nation_curated",
            "data_format": "parquet",
            "columns": [
                {"name": "n_nationkey", "type": "int"},
                {"name": "n_name", "type": "character"},
                {"name": "n_regionkey", "type": "int"},
            ],
            "partitions": ["n_regionkey"],
        }
    )
    raw = table(spark, sf_dir, "nation")
    report = conformance_report(raw, meta)
    print("conformance:", report)

    out = scratch_dir("example_nation_curated")
    io.write_table(raw, meta, path=out)
    meta.location = out
    catalog.create_table_from_metadata(spark, meta)
    try:
        got = spark.sql(
            "SELECT n_regionkey, count(*) AS n FROM nation_curated "
            "GROUP BY n_regionkey ORDER BY n_regionkey"
        )
        got.show()
        assert got.count() == 5
    finally:
        catalog.drop_table(spark, "nation_curated")
    print("metadata ETL round-trip OK")


if __name__ == "__main__":
    from dataengineeringutils_spark.session import get_spark

    main(get_spark("example_etl"), sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
