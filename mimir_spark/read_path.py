"""Query-side read path: tiered store -> decoded points.

The writer side (rollup/lineage) stores Gorilla-compressed chunks per
(tier, series, bucket); this is the reverse: give a user back raw
(ts, v) points for a series and time range, reading only the store
partitions the range touches.

Plan shape: the `bucket_date` partition column prunes the scan to the
range's days, the series columns prune via parquet row-group stats,
and only the matching rows' chunks are decoded (one Arrow pass,
vectorized codec). At 100 TB this is the dashboard-query path: a
series/day slice reads a few files, never the tier.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import codec
from .rollup import POINTS_SCHEMA


def decode_points(rollup_df: DataFrame) -> DataFrame:
    """Decode every chunk of a rollup frame back to (series, ts, v)
    rows — one vectorized pass, chunks never leave their partition."""

    def decode(iterator):
        for pdf in iterator:
            if len(pdf) == 0:
                continue
            out_kind, out_key, out_metric, out_ts, out_v = [], [], [], [], []
            for kind, key, metric, chunk in zip(
                    pdf["kind"], pdf["series_key"], pdf["metric"],
                    pdf["chunk"]):
                ts_us, v = codec.decode_all(bytes(chunk))
                out_kind.append(np.repeat(kind, len(ts_us)))
                out_key.append(np.repeat(key, len(ts_us)))
                out_metric.append(np.repeat(metric, len(ts_us)))
                out_ts.append(ts_us)
                out_v.append(v)
            if not out_ts:
                continue
            yield pd.DataFrame({
                "kind": np.concatenate(out_kind),
                "series_key": np.concatenate(out_key),
                "metric": np.concatenate(out_metric),
                "ts": np.concatenate(out_ts).astype("datetime64[us]"),
                "v": np.concatenate(out_v),
            })

    return rollup_df.select("kind", "series_key", "metric", "chunk") \
        .mapInPandas(decode, POINTS_SCHEMA)


def series_points(spark: SparkSession, store, tier: str,
                  kind: str | None = None,
                  series_key: str | None = None,
                  metric: str | None = None,
                  t0: str | None = None,
                  t1: str | None = None) -> DataFrame:
    """Raw points for a series slice from a TieredStore.

    ``t0``/``t1`` (inclusive start, exclusive end; any Spark-castable
    timestamp string) prune at THREE levels: the ``bucket_date``
    partition directories, the bucket_ts row filter (row-group stats),
    and finally the decoded points themselves — a chunk straddling the
    range edge contributes only its in-range points."""
    df = store.read_tier(spark, tier)
    if kind is not None:
        df = df.filter(F.col("kind") == kind)
    if series_key is not None:
        df = df.filter(F.col("series_key") == series_key)
    if metric is not None:
        df = df.filter(F.col("metric") == metric)
    if t0 is not None:
        # a bucket starting before t0 can still contain points >= t0
        # only if it overlaps: bucket_ts >= trunc(t0) keeps the edge
        # bucket; bucket_date pruning follows from the same predicate
        df = df.filter(F.col("bucket_date") >= F.to_date(F.lit(t0)))
        df = df.filter(F.col("bucket_ts")
                       >= F.date_trunc(_trunc_unit(tier), F.lit(t0).cast("timestamp")))
    if t1 is not None:
        df = df.filter(F.col("bucket_ts") < F.lit(t1).cast("timestamp"))
        df = df.filter(F.col("bucket_date") <= F.to_date(F.lit(t1)))
    pts = decode_points(df)
    if t0 is not None:
        pts = pts.filter(F.col("ts") >= F.lit(t0).cast("timestamp"))
    if t1 is not None:
        pts = pts.filter(F.col("ts") < F.lit(t1).cast("timestamp"))
    return pts


def _trunc_unit(tier: str) -> str:
    from .rollup import TIER_TRUNC

    return TIER_TRUNC[tier]
