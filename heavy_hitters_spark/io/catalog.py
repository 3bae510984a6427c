"""Table IO with Iceberg when available, parquet fallback otherwise.

BASELINE.json's input_hint names an Iceberg table of web pages. Iceberg
is a runtime jar, not guaranteed in every environment (it is absent in
this sandbox), so the IO layer detects it at session start and records
which backend is in use — the rest of the library only sees
``read_table``/``write_table``. On a production cluster with the
iceberg-spark-runtime jar + catalog conf, the same code reads/writes
Iceberg identifiers; snapshots then give the checkpoint/resume layer
its file manifests instead of directory listings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.catalog.Catalog"
        )
        return True
    except Exception:
        return False


class TableIO:
    def __init__(self, spark: SparkSession) -> None:
        self.spark = spark
        self.backend = "iceberg" if iceberg_available(spark) else "parquet"

    def read_table(self, ident_or_path: str) -> DataFrame:
        if self.backend == "iceberg" and "/" not in ident_or_path:
            return self.spark.read.format("iceberg").load(ident_or_path)
        return self.spark.read.parquet(ident_or_path)

    def write_table(self, df: DataFrame, ident_or_path: str, mode: str = "overwrite") -> None:
        if self.backend == "iceberg" and "/" not in ident_or_path:
            df.writeTo(ident_or_path).using("iceberg").createOrReplace()
        else:
            df.write.mode(mode).parquet(ident_or_path)

    def metrics(self) -> dict:
        return {"io_backend": self.backend}
