"""Retention overlays: the deleted-docs set of the reference
(MimirIndex.java:944-998 — a sorted overlay filtered at result
enumeration, `search/RankingQueryRunnerImpl.java:746-755`) in two
Spark forms:

1. tombstone overlay — logical deletes applied as an anti-join at read
   time (Iceberg row-level-delete analogue); cheap to write, paid at
   query time until compaction folds it in;
2. physical expiry — `TieredStore.expire` drops whole date partitions
   (see lineage.py), the terminal form after compaction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def delete_conversations(tombstones: DataFrame, conv_ids: list[str]) -> DataFrame:
    """Append conversation ids to a tombstone set (idempotent union)."""
    spark = tombstones.sparkSession
    new = spark.createDataFrame([(c,) for c in conv_ids], "conv_id string")
    return tombstones.unionByName(new).distinct()


def apply_tombstones(df: DataFrame, tombstones: DataFrame,
                     key: str = "conv_id") -> DataFrame:
    """Filter out tombstoned keys — broadcast anti-join (the overlay is
    small relative to data, like the reference's in-RAM deleted set)."""
    return df.join(F.broadcast(tombstones.select(key).distinct()), key, "left_anti")


def expire_buckets(rollup_df: DataFrame, tier_retention: dict[str, str]) -> DataFrame:
    """Logical tier expiry: keep each tier's buckets newer than its
    cutoff timestamp (e.g. {'1m': '2026-01-10', '1h': '2026-01-01'}).
    The physical counterpart is TieredStore.expire (drops partitions)."""
    pred = F.lit(False)
    for tier, cutoff in tier_retention.items():
        pred = pred | ((F.col("tier") == tier) & (F.col("bucket_ts") >= F.lit(cutoff).cast("timestamp")))
    # tiers without a rule are kept wholesale
    ruled = list(tier_retention)
    pred = pred | ~F.col("tier").isin(ruled)
    return rollup_df.filter(pred)
