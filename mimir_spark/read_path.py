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
from .rollup import POINTS_SCHEMA, TIER_US


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


def _pruned_tier(spark: SparkSession, store, tier: str,
                 kind: str | None, series_key: str | None,
                 metric: str | None, t0: str | None,
                 t1: str | None) -> DataFrame:
    """Tier rows for a slice, pruned at TWO storage levels: the
    ``bucket_date`` partition directories and the series/bucket_ts
    row filters (parquet row-group stats). Shared by the decode path
    (series_points — which adds the third, in-chunk level) and the
    aggregate path (query_range — which needs no decode at all)."""
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
    return df


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
    df = _pruned_tier(spark, store, tier, kind, series_key, metric, t0, t1)
    pts = decode_points(df)
    if t0 is not None:
        pts = pts.filter(F.col("ts") >= F.lit(t0).cast("timestamp"))
    if t1 is not None:
        pts = pts.filter(F.col("ts") < F.lit(t1).cast("timestamp"))
    return pts


def _trunc_unit(tier: str) -> str:
    from .rollup import TIER_TRUNC

    return TIER_TRUNC[tier]


# ---------------------------------------------------------------------------
# aggregate read path: continuous-aggregate serving WITHOUT decode


_STEP_UNITS_US = {"s": 1_000_000, "m": 60_000_000,
                  "h": 3_600_000_000, "d": 86_400_000_000}

#: step-level re-aggregations of the tier's partial aggregates
#: (thunks: Columns need an active session, so never built at import).
#: Every entry is associative over bucket splits, which is exactly
#: what makes serving from ANY tier whose width divides the step
#: correct.
_REAGG = {
    "sum": lambda: F.sum("sum_v"),
    "count": lambda: F.sum("cnt").cast("double"),
    "min": lambda: F.min("min_v"),
    "max": lambda: F.max("max_v"),
    "last": lambda: F.expr("max_by(last_v, bucket_ts)"),
    "avg": lambda: F.sum("sum_v") / F.sum("cnt"),
}


def parse_step(step: str) -> int:
    """'90s' / '5m' / '2h' / '1d' -> microseconds."""
    import re

    m = re.fullmatch(r"(\d+)([smhd])", step.strip())
    if not m:
        raise ValueError(f"bad step {step!r} (expected <n>[smhd])")
    us = int(m.group(1)) * _STEP_UNITS_US[m.group(2)]
    if us <= 0:
        raise ValueError(f"bad step {step!r}")
    return us


def select_tier(step: str, tiers=("1m", "1h", "1d")) -> str:
    """The COARSEST stored tier whose bucket width evenly divides the
    query step — the standard continuous-aggregate serving rule: a 2h
    step reads the 1h tier (2 rows per step bucket), never the 1m tier
    (120 rows), and both give identical results by associativity."""
    step_us = parse_step(step)
    fits = [t for t in tiers if step_us % TIER_US[t] == 0]
    if not fits:
        raise ValueError(
            f"step {step!r} is not a multiple of any stored tier "
            f"{tuple(tiers)}; pick a step divisible by one of them")
    return max(fits, key=lambda t: TIER_US[t])


def query_range(spark: SparkSession, store, metric: str,
                agg: str = "avg", step: str = "1h",
                t0: str | None = None, t1: str | None = None,
                kind: str | None = None,
                series_key: str | None = None,
                fill: str | None = None,
                tier: str | None = None,
                tiers=("1m", "1h", "1d")) -> DataFrame:
    """Dashboard range query served ENTIRELY from stored aggregates —
    the PromQL-style `query_range` surface over the tier store.

    Picks the coarsest tier dividing ``step`` (or uses ``tier``),
    reads only the pruned slice (`_pruned_tier`: bucket_date partition
    dirs + row-group stats), and re-aggregates the tier's partial
    aggregates into step buckets: sum->sum, count->sum(cnt),
    min->min, max->max, last->max_by(last_v, bucket_ts),
    avg->sum(sum_v)/sum(cnt). No chunk ever decodes and no Python
    runs — one hash aggregate over ~(range/tier) rows per series,
    which is why a year-long dashboard query at step=1d over a 100 TB
    corpus reads the 1d tier's few hundred rows per series instead of
    raw points. ``fill`` ('locf'/'linear') gap-fills the step grid
    (gapfill generalizes to arbitrary step widths).

    Range edges resolve at TIER-bucket granularity (a step bucket
    overlapping ``t0``/``t1`` keeps its whole covered tier buckets) —
    sub-bucket trimming requires decoding, which is series_points'
    job, not this path's.

    Returns (kind, series_key, metric, bucket_ts, value[, filled]).
    """
    if agg not in _REAGG:
        raise ValueError(f"unknown agg {agg!r} (one of {sorted(_REAGG)})")
    step_us = parse_step(step)
    tier = tier or select_tier(step, tiers)
    if step_us % TIER_US[tier] != 0:
        raise ValueError(f"step {step!r} is not a multiple of tier {tier!r}")
    rows = _pruned_tier(spark, store, tier, kind, series_key, metric, t0, t1)
    # epoch-aligned step buckets (window().start), same origin as the
    # tiers' date_trunc buckets, so tier buckets nest exactly
    bucket = F.window("bucket_ts", f"{step_us // 1_000_000} seconds")
    out = (
        rows.groupBy("kind", "series_key", "metric",
                     bucket.alias("_w"))
        .agg(_REAGG[agg]().alias("value"))
        .select("kind", "series_key", "metric",
                F.col("_w.start").alias("bucket_ts"), "value")
    )
    if fill is not None:
        from .gapfill import gapfill

        out = gapfill(out, step_us, value_col="value", method=fill)
    if t0 is not None:
        out = out.filter(F.col("bucket_ts")
                         >= F.lit(t0).cast("timestamp") - F.expr(
                             f"INTERVAL {(step_us - 1) // 1_000_000} SECONDS"))
    if t1 is not None:
        out = out.filter(F.col("bucket_ts") < F.lit(t1).cast("timestamp"))
    return out


def query_range_rate(spark: SparkSession, store, metric: str,
                     step: str = "1h", t0: str | None = None,
                     t1: str | None = None, kind: str | None = None,
                     series_key: str | None = None, tier: str = "1m",
                     per_second: bool = False) -> DataFrame:
    """Reset-aware counter ``increase`` (or per-second ``rate``) per
    step bucket — the PromQL counter verbs over the tier store.

    Unlike ``query_range`` this CANNOT be served from the stored
    partial aggregates (a counter reset inside a bucket is invisible
    to sum/min/max/last), but it does not need to be approximate
    either: the chunks store EVERY raw sample, so the pruned slice
    decodes (``series_points``) and the standard reset rule
    (functions.timeseries.with_increase — a drop is a restart, the
    post-reset value counts fully) runs exactly, one window per
    series, then one hash aggregate onto epoch-aligned step buckets.

    Boundary semantics match PromQL's lookbehind gap: the first
    decoded sample at the range edge has no previous sample in range
    and contributes NULL increase (pass an earlier ``t0`` to absorb
    the edge). Returns (kind, series_key, metric, bucket_ts, value,
    n_samples) where value = summed increase, divided by the step
    seconds when ``per_second``."""
    from .functions import timeseries as TS

    step_us = parse_step(step)
    pts = series_points(spark, store, tier, kind, series_key, metric, t0, t1)
    inc = TS.with_increase(pts)
    bucket = F.window("ts", f"{step_us // 1_000_000} seconds")
    value = F.sum("increase")
    if per_second:
        value = value / F.lit(step_us / 1_000_000.0)
    return (
        inc.groupBy("kind", "series_key", "metric", bucket.alias("_w"))
        .agg(value.alias("value"), F.count("*").alias("n_samples"))
        .select("kind", "series_key", "metric",
                F.col("_w.start").alias("bucket_ts"), "value", "n_samples")
    )
