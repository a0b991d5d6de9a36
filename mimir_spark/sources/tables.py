"""Table IO shim: Iceberg when the runtime has it, parquet otherwise.

The engine's contract (north rule) is Iceberg tables — snapshot
isolation for the per-partition commit protocol, row-level deletes for
tombstones, `rewrite_data_files` for compaction, hidden partitioning
on days for retention. This container has no Iceberg jars, so the shim
keeps one code path: `format("iceberg")` when
`spark.sql.catalog.spark_catalog` is configured, else the
plain-parquet layout of `lineage.TieredStore`, which reproduces the
same commit semantics (data first, lineage marker second, atomic
directory replace). Every call site goes through these two functions
so a cluster deployment flips with configuration, not code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        jvm_class = "org.apache.iceberg.spark.SparkCatalog"
        spark._jvm.java.lang.Class.forName(jvm_class)  # type: ignore[attr-defined]
        return True
    except Exception:
        return False


def read_table(spark: SparkSession, identifier_or_path: str) -> DataFrame:
    """Read an Iceberg table by identifier, or a parquet path."""
    if "/" not in identifier_or_path and iceberg_available(spark):
        return spark.read.format("iceberg").load(identifier_or_path)
    return spark.read.parquet(identifier_or_path)


def write_table(df: DataFrame, identifier_or_path: str,
                mode: str = "overwrite",
                partition_by: list[str] | None = None) -> None:
    """Write to an Iceberg table (MERGE/overwrite semantics come from
    the catalog) or a partitioned parquet directory."""
    spark = df.sparkSession
    if "/" not in identifier_or_path and iceberg_available(spark):
        w = df.writeTo(identifier_or_path)
        if mode == "overwrite":
            w.createOrReplace()
        else:
            w.append()
        return
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(identifier_or_path)
