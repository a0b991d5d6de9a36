"""Counter/gauge series math: delta, increase, rate with
counter-reset handling — the standard monitoring-engine semantics
(a counter that drops must be a process restart: the post-reset value
counts fully toward the increase, it is not a negative delta).

All pure window expressions: one shuffle on the series key, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..rollup import SERIES_COLS


def _w(series_cols):
    return Window.partitionBy(*series_cols).orderBy("ts")


def with_delta(points: DataFrame, value_col: str = "v",
               series_cols: tuple[str, ...] = SERIES_COLS) -> DataFrame:
    """Gauge delta: v - lag(v) per series (first point: NULL)."""
    prev = F.lag(value_col).over(_w(series_cols))
    return points.withColumn("delta", F.col(value_col) - prev)


def with_increase(points: DataFrame, value_col: str = "v",
                  series_cols: tuple[str, ...] = SERIES_COLS) -> DataFrame:
    """Counter increase with reset handling: a drop below the previous
    sample is a counter reset, and the new value counts fully
    (increase = v, not v - prev). First point: NULL (no interval)."""
    prev = F.lag(value_col).over(_w(series_cols))
    v = F.col(value_col)
    inc = F.when(prev.isNull(), F.lit(None).cast("double")) \
        .when(v >= prev, v - prev).otherwise(v)
    return points.withColumn("increase", inc)


def with_rate(points: DataFrame, value_col: str = "v",
              series_cols: tuple[str, ...] = SERIES_COLS) -> DataFrame:
    """Per-second instantaneous rate: increase / seconds-since-prev,
    reset-aware; NULL on the first point and on zero-length intervals
    (duplicate timestamps must not divide by zero)."""
    w = _w(series_cols)
    prev_v = F.lag(value_col).over(w)
    dt_us = F.unix_micros(F.col("ts").cast("timestamp")) - F.lag(
        F.unix_micros(F.col("ts").cast("timestamp"))).over(w)
    v = F.col(value_col)
    inc = F.when(v >= prev_v, v - prev_v).otherwise(v)
    rate = F.when(prev_v.isNull() | dt_us.isNull() | (dt_us <= 0),
                  F.lit(None).cast("double")) \
        .otherwise(inc / (dt_us / F.lit(1_000_000.0)))
    return points.withColumn("rate", rate)


def range_increase(points: DataFrame, tier: str,
                   value_col: str = "v",
                   series_cols: tuple[str, ...] = SERIES_COLS) -> DataFrame:
    """Total reset-aware increase per (series, bucket) — the
    ``increase(counter[1h])`` continuous aggregate: sum of per-sample
    increases inside the bucket (the first sample of the whole series
    contributes nothing; the first sample of a BUCKET uses its true
    previous sample, so bucket edges do not lose increase)."""
    from ..rollup import TIER_TRUNC

    inc = with_increase(points, value_col, series_cols)
    bucket = F.date_trunc(TIER_TRUNC[tier], F.col("ts")).alias("bucket_ts")
    return (
        inc.groupBy(*series_cols, bucket)
        .agg(F.sum("increase").alias("increase"),
             F.count("*").alias("n_samples"))
    )
