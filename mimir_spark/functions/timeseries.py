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


# ---------------------------------------------------------------------------
# cross-series arithmetic — the PromQL binary-op analogue
# ---------------------------------------------------------------------------

_BINOPS = ("+", "-", "*", "/")


def series_binop(df: DataFrame, left_metric: str, right_metric: str,
                 op: str = "/", out_metric: str | None = None,
                 value_col: str = "sum_v", time_col: str = "bucket_ts",
                 series_cols: tuple[str, ...] = ("kind", "series_key")
                 ) -> DataFrame:
    """Arithmetic between two METRICS of the same series — the PromQL
    vector-binary-op analogue (`a / b` with on(kind, series_key)
    matching), e.g. tokens-per-turn = token_volume / turn_rate.

    Spark-first shape: NOT a self-join. Both metrics live in the same
    frame, so one conditional-aggregation groupBy pivots them side by
    side — ONE shuffle on (series, bucket), no join, no broadcast.
    Works on any frame with the series/time vocabulary: rollup tiers
    (value_col='sum_v'), query_range output (value_col='value',
    metric-filtered upstream is fine as long as both metrics remain),
    or raw points (value_col='v', time_col='ts').

    Matching is inner (PromQL's default): buckets where either side is
    absent emit nothing. Division by zero yields NULL, never an error
    (guarded for ANSI mode) and never +-Inf.

    Duplicate rows per (series, time, metric) — raw points sharing a
    timestamp, a tier a streaming sink appended to — SUM into the
    slot before the op (max/any-value would silently drop all but one
    row's contribution); on the unique-keyed rollup/query_range
    frames the sum IS the single value."""
    if op not in _BINOPS:
        raise ValueError(f"unknown op {op!r} (one of {_BINOPS})")
    lv = F.sum(F.when(F.col("metric") == left_metric,
                      F.col(value_col))).alias("_lv")
    rv = F.sum(F.when(F.col("metric") == right_metric,
                      F.col(value_col))).alias("_rv")
    grouped = (
        df.filter(F.col("metric").isin([left_metric, right_metric]))
        .groupBy(*series_cols, time_col)
        .agg(lv, rv)
        .filter(F.col("_lv").isNotNull() & F.col("_rv").isNotNull())
    )
    a, b = F.col("_lv"), F.col("_rv")
    if op == "+":
        val = a + b
    elif op == "-":
        val = a - b
    elif op == "*":
        val = a * b
    else:
        val = F.when(b != 0, a / b)
    name = out_metric or f"{left_metric}{op}{right_metric}"
    return (
        grouped.withColumn("metric", F.lit(name))
        .select(*series_cols, "metric", time_col,
                val.alias("value"))
    )


# ---------------------------------------------------------------------------
# rolling z-score anomaly detection
# ---------------------------------------------------------------------------


def _resolve_min_periods(n: int, min_periods: int | None) -> int:
    """Default min_periods adapts to the window (min(5, n), floor 2);
    an explicit min_periods > n is a contradiction — the trailing
    window can never satisfy it, so EVERY z-score would be NULL and an
    anomaly report silently empty — and is rejected loudly."""
    if n < 1:
        raise ValueError("need n >= 1")
    if min_periods is None:
        return max(2, min(5, n))
    if min_periods < 2:
        raise ValueError("need min_periods >= 2")
    if min_periods > n:
        raise ValueError(
            f"min_periods={min_periods} can never be reached by a "
            f"trailing window of n={n} samples — every z-score would "
            f"be NULL")
    return min_periods


def with_zscore(points: DataFrame, value_col: str = "v", n: int = 20,
                min_periods: int | None = None, time_col: str = "ts",
                series_cols: tuple[str, ...] = SERIES_COLS) -> DataFrame:
    """Rolling z-score per series: (v - mean) / stddev over the
    TRAILING n samples EXCLUDING the current one — a spike must not
    inflate its own baseline. NULL until ``min_periods`` prior samples
    exist or while the trailing window has zero variance (a constant
    baseline makes any deviation infinitely surprising; surfacing NULL
    instead of +-inf keeps downstream filters sane).

    One window (one shuffle on the series key), pure expressions —
    the same scale shape as with_rate. ``min_periods`` defaults to
    min(5, n) so a small window still yields scores."""
    min_periods = _resolve_min_periods(n, min_periods)
    w = (Window.partitionBy(*series_cols).orderBy(time_col)
         .rowsBetween(-n, -1))
    v = F.col(value_col).cast("double")
    mean = F.avg(v).over(w)
    sd = F.stddev_samp(v).over(w)
    cnt = F.count(v).over(w)
    z = F.when((cnt >= min_periods) & (sd > 0), (v - mean) / sd)
    return points.withColumn("zscore", z)


def detect_anomalies(points: DataFrame, threshold: float = 3.0,
                     value_col: str = "v", n: int = 20,
                     min_periods: int | None = None, time_col: str = "ts",
                     series_cols: tuple[str, ...] = SERIES_COLS
                     ) -> DataFrame:
    """Rows whose |rolling z-score| >= threshold — the alerting verb
    over raw points or served buckets (pass time_col='bucket_ts',
    value_col='value' for query_range output)."""
    return (with_zscore(points, value_col, n, min_periods, time_col,
                        series_cols)
            .filter(F.abs(F.col("zscore")) >= threshold))


def with_seasonal_zscore(points: DataFrame, period_seconds: int,
                         value_col: str = "v", n: int = 4,
                         min_periods: int | None = None,
                         time_col: str = "ts",
                         series_cols: tuple[str, ...] = SERIES_COLS
                         ) -> DataFrame:
    """Seasonal rolling z-score: each sample is compared against the
    trailing ``n`` samples at the SAME PHASE of a ``period_seconds``
    cycle (e.g. period=86400: today 14:00 vs the previous n days'
    14:00) — the baseline shape real monitoring needs for diurnal /
    weekly patterns, where a plain trailing window flags every morning
    ramp-up as an anomaly.

    Spark-first: phase = epoch mod period becomes an extra PARTITION
    key, so "previous occurrences of this phase" is an ordinary
    trailing window — one shuffle on (series, phase), no self-join,
    no Python. Works on raw points (ties within a phase order by
    time) and on served step buckets (pass time_col='bucket_ts',
    value_col='value'; the step must divide the period or phases
    interleave). Same NULL contract as with_zscore: NULL until
    min_periods prior same-phase samples exist or while the baseline
    has zero variance. ``min_periods`` defaults to min(5, n)."""
    if period_seconds < 1:
        raise ValueError("period_seconds must be >= 1")
    min_periods = _resolve_min_periods(n, min_periods)
    phase = (F.unix_micros(F.col(time_col).cast("timestamp"))
             % F.lit(period_seconds * 1_000_000)).alias("_phase")
    w = (Window.partitionBy(*series_cols, "_phase").orderBy(time_col)
         .rowsBetween(-n, -1))
    v = F.col(value_col).cast("double")
    mean = F.avg(v).over(w)
    sd = F.stddev_samp(v).over(w)
    cnt = F.count(v).over(w)
    z = F.when((cnt >= min_periods) & (sd > 0), (v - mean) / sd)
    return (points.withColumn("_phase", phase)
            .withColumn("seasonal_zscore", z).drop("_phase"))
