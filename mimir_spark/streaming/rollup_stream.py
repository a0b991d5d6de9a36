"""Streaming rollup: continuous ingest with bounded visibility latency.

The reference is continuously ingesting and searchable — docs become
visible at sync-to-disk, driven by an occurrence budget or a timer
(MimirIndex.java:130-139,611-628; IndexConfig.java:229-237). The Spark
mapping is Structured Streaming:

- micro-batch trigger            <-> timeBetweenBatches flush timer
- watermark + append output      <-> batch becomes immutable at flush
- dedup within watermark         <-> duplicate-position suppression
  (AtomicIndex.java:245-254)
- foreachBatch MERGE into tiers  <-> tail batch added to the cluster view

Late data past the watermark is dropped from streaming aggregates;
the batch cascade (rollup.cascade) re-folds them at compaction time —
the same late-tail repair role the LSM compact plays in the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..ingest import token_count_col
from ..rollup import TIER_TRUNC


def stream_turn_metrics(stream: DataFrame) -> DataFrame:
    """Per-turn metric explode for a streaming transcripts source
    (same rules as ingest.turn_metrics; streaming-safe expressions)."""
    tok = token_count_col().cast("double")
    entry = lambda kind, key, metric, v: F.struct(  # noqa: E731
        kind.alias("kind"), key.alias("series_key"),
        metric.alias("metric"), v.alias("v"),
    )
    conv = F.col("conv_id")
    entries = F.array(
        entry(F.lit("conv"), conv, F.lit("turn_rate"), F.lit(1.0)),
        entry(F.lit("conv"), conv, F.lit("token_volume"), tok),
        entry(F.lit("conv"), conv, F.concat(F.lit("role_mix_"), F.col("role")), F.lit(1.0)),
        entry(F.lit("tool"), F.col("tool"), F.lit("turn_rate"),
              F.when(F.col("tool").isNotNull(), F.lit(1.0))),
        entry(F.lit("tool"), F.col("tool"), F.lit("token_volume"),
              F.when(F.col("tool").isNotNull(), tok)),
    )
    return (
        stream.select(F.explode(entries).alias("e"), "ts", "conv_id", "turn_idx")
        .filter(F.col("e.v").isNotNull() & F.col("e.series_key").isNotNull())
        .select("e.kind", "e.series_key", "e.metric", "ts", "conv_id",
                "turn_idx", "e.v")
    )


def streaming_rollup(stream: DataFrame, tier: str = "1m",
                     watermark: str = "10 minutes") -> DataFrame:
    """Continuous tier aggregates with event-time watermarking.

    Append-mode compatible: a bucket is emitted once its window is
    older than the watermark — the streaming analogue of "documents
    become searchable at sync-to-disk". Duplicate (conv_id, turn_idx)
    arrivals inside the watermark are suppressed before aggregation.
    """
    unit = {"1m": "1 minute", "1h": "1 hour", "1d": "1 day"}[tier]
    deduped = (
        stream.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["conv_id", "turn_idx"])
    )
    points = stream_turn_metrics(deduped)  # watermark propagates
    return (
        points
        .groupBy(F.window("ts", unit).alias("w"),
                 "kind", "series_key", "metric")
        .agg(
            F.count("*").alias("cnt"),
            F.sum("v").alias("sum_v"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
        )
        .select("kind", "series_key", "metric",
                F.col("w.start").alias("bucket_ts"),
                "cnt", "sum_v", "min_v", "max_v")
    )


def run_stream_to_memory(spark, source_dir: str, schema: str,
                         query_name: str = "rollup_stream",
                         tier: str = "1m") -> "object":
    """Drive a file-source stream to completion synchronously (test &
    smoke harness; production sinks via foreachBatch MERGE)."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(source_dir)
    )
    agg = streaming_rollup(stream, tier)
    q = (
        agg.writeStream.outputMode("append")
        .format("memory").queryName(query_name)
        .start()
    )
    q.processAllAvailable()
    return q
