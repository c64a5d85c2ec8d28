"""Table IO abstraction: Iceberg when a catalog is configured, plain
parquet paths otherwise.

SURVEY.md §7 M4: the pyspark 4.1.2 install in this sandbox carries no
Iceberg runtime jar (verified), so the default backend is parquet plus
the engine's own manifest table mirroring Iceberg snapshot semantics
(operators/manifest.py). The Iceberg code path below activates when
``spark.sql.catalog.<name>`` is configured (i.e. the jar is on the
cluster classpath) and uses the same call shapes the tests exercise
against parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession, catalog: str = "cc") -> bool:
    try:
        return spark.conf.get(f"spark.sql.catalog.{catalog}", None) is not None
    except Exception:
        return False


class PageTableIO:
    """read/append/overwrite for page-shaped tables.

    ``ref`` is an Iceberg table name (``cc.db.pages``) when the
    catalog is configured, else a filesystem path.
    """

    def __init__(self, spark: SparkSession, catalog: str = "cc"):
        self.spark = spark
        self.use_iceberg = iceberg_available(spark, catalog)

    def read(self, ref: str) -> DataFrame:
        if self.use_iceberg:
            return self.spark.table(ref)
        return self.spark.read.parquet(ref)

    def append(self, df: DataFrame, ref: str) -> None:
        if self.use_iceberg:
            df.writeTo(ref).append()
        else:
            df.write.mode("append").parquet(ref)

    def overwrite_partitions(self, df: DataFrame, ref: str,
                             partition_col: str) -> None:
        if self.use_iceberg:
            df.writeTo(ref).overwritePartitions()
        else:
            (
                df.write.mode("overwrite")
                .partitionBy(partition_col)
                .option("partitionOverwriteMode", "dynamic")
                .parquet(ref)
            )
