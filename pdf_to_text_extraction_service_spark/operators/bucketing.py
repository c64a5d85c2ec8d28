"""Url-bucketed table writers — shuffle-free co-located joins.

At 100 TB the lineage/manifest anti-join and any url-keyed
self-/delta-join should not reshuffle the big extracted table.
Writing both sides bucketed by url (Hive-style ``bucketBy`` through
``saveAsTable``) lets Catalyst plan SortMergeJoin WITHOUT an Exchange
on either side (verified by tests/test_bucketing.py inspecting the
physical plan). This is the parquet/Hive analog of Iceberg's
``bucket(url, N)`` partition transform that the Iceberg deployment
would use (SURVEY.md §7 M3/M4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, buckets: int = 64,
                   key: str = "url") -> None:
    (
        df.write.mode("overwrite")
        .bucketBy(buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


def colocated_join(spark: SparkSession, left_table: str,
                   right_table: str, key: str = "url",
                   how: str = "inner") -> DataFrame:
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, key, how)
