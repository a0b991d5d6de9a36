"""Gap-fill over event-time windows: LOCF + linear interpolation.

New capability relative to the reference (Mimir's token positions are
dense, so it never needs gap-fill — SURVEY.md §2.8); required by the
north rule. Implemented entirely with JVM-side expressions:

1. per-series bucket grid via ``sequence(min, max, interval)`` +
   ``explode`` (no Python, no driver loop);
2. LOCF via ``last(value, ignorenulls=True)`` over an unbounded
   preceding window;
3. linear interpolation via the previous/next known points fetched with
   ignore-nulls window functions, all arithmetic in Catalyst.

The grid explode and the window both partition by series, so a 100 TB
run shuffles each series' buckets exactly once and never materializes
the grid driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .rollup import TIER_US

_SERIES = ["kind", "series_key", "metric"]

#: Max buckets per generated `sequence()` array in the gap-fill grid.
#: A single long-lived sparse series (the canonical gap-fill input)
#: can span years: 2 years at the 1m tier is ~1.05M buckets, which a
#: one-level `sequence(lo, hi, step)` would materialize as ONE
#: million-element array row before the explode (heap blowup per row,
#: and `sequence` hard-caps its element count). The grid therefore
#: generates two levels: chunk starts (span / CHUNK elements), then
#: <= CHUNK buckets within each chunk — identical output, every array
#: bounded.
_GRID_CHUNK = 4096


def _step_us(tier) -> int:
    """Bucket width in microseconds: a named tier ('1m'/'1h'/'1d') or
    an explicit microsecond width (query_range's arbitrary steps)."""
    return TIER_US[tier] if isinstance(tier, str) else int(tier)


def _grid(df: DataFrame, tier) -> DataFrame:
    """One row per (series, bucket) for every tier bucket between each
    series' min and max observed bucket. Two-level chunked expansion —
    see _GRID_CHUNK; both explodes stay partitioned by series, so the
    100 TB shape (one shuffle per series group) is unchanged."""
    unit_s = _step_us(tier) // 1_000_000
    step = F.expr(f"INTERVAL {unit_s} SECONDS")
    chunk_step = F.expr(f"INTERVAL {unit_s * _GRID_CHUNK} SECONDS")
    last_in_chunk = F.expr(
        f"_chunk + INTERVAL {unit_s * (_GRID_CHUNK - 1)} SECONDS")
    return (
        df.groupBy(*_SERIES)
        .agg(F.min("bucket_ts").alias("_lo"), F.max("bucket_ts").alias("_hi"))
        .select(
            *_SERIES, "_hi",
            F.explode(
                F.sequence(F.col("_lo"), F.col("_hi"), chunk_step)
            ).alias("_chunk"),
        )
        .select(
            *_SERIES,
            F.explode(
                F.sequence(F.col("_chunk"),
                           F.least(last_in_chunk, F.col("_hi")), step)
            ).alias("bucket_ts"),
        )
    )


def gapfill(rollup_df: DataFrame, tier, value_col: str = "sum_v",
            method: str = "locf") -> DataFrame:
    """Fill missing tier buckets per series.

    ``tier`` is a named tier or an explicit bucket width in
    microseconds (the query_range step path). Returns (series,
    bucket_ts, <value_col>, filled) where ``filled`` marks synthesized
    buckets. LOCF leaves leading gaps null; linear leaves
    leading/trailing gaps null (bounded by real neighbors).
    """
    if method not in ("locf", "linear"):
        raise ValueError(f"unknown gapfill method {method!r}")
    grid = _grid(rollup_df, tier)
    joined = grid.join(
        rollup_df.select(*_SERIES, "bucket_ts", F.col(value_col).alias("_obs")),
        on=[*_SERIES, "bucket_ts"],
        how="left",
    )
    w = Window.partitionBy(*_SERIES).orderBy("bucket_ts")
    if method == "locf":
        filled_val = F.last("_obs", ignorenulls=True).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        )
    else:
        t = F.col("bucket_ts").cast("double")
        prev_w = w.rowsBetween(Window.unboundedPreceding, 0)
        next_w = w.rowsBetween(0, Window.unboundedFollowing)
        prev_v = F.last("_obs", ignorenulls=True).over(prev_w)
        next_v = F.first("_obs", ignorenulls=True).over(next_w)
        prev_t = F.last(F.when(F.col("_obs").isNotNull(), t), ignorenulls=True).over(prev_w)
        next_t = F.first(F.when(F.col("_obs").isNotNull(), t), ignorenulls=True).over(next_w)
        filled_val = F.when(F.col("_obs").isNotNull(), F.col("_obs")).otherwise(
            F.when(
                prev_v.isNotNull() & next_v.isNotNull(),
                prev_v + (next_v - prev_v) * (t - prev_t) / (next_t - prev_t),
            )
        )
    return joined.select(
        *_SERIES,
        "bucket_ts",
        filled_val.alias(value_col),
        F.col("_obs").isNull().alias("filled"),
    )


def missing_buckets(rollup_df: DataFrame, tier: str) -> DataFrame:
    """The monitoring complement of gap-fill: per-series buckets with
    NO data between each series' first and last observed bucket —
    (series, bucket_ts, gap_len) where gap_len counts the consecutive
    missing run the bucket belongs to. Grid anti-join (the grid side
    is one tiny aggregate per series, broadcast) + one window to label
    runs; no Python."""
    grid = _grid(rollup_df, tier)
    missing = grid.join(
        rollup_df.select(*_SERIES, "bucket_ts"),
        _SERIES + ["bucket_ts"], "left_anti")
    unit_s = _step_us(tier) // 1_000_000
    w = Window.partitionBy(*_SERIES).orderBy("bucket_ts")
    # run id: bucket index minus rank is constant within a consecutive run
    idx = (F.unix_timestamp("bucket_ts") / F.lit(unit_s)).cast("long")
    run = (idx - F.row_number().over(w)).alias("_run")
    runs = missing.select(*_SERIES, "bucket_ts", run)
    wr = Window.partitionBy(*_SERIES, "_run")
    return (
        runs.withColumn("gap_len", F.count("*").over(wr))
        .select(*_SERIES, "bucket_ts", "gap_len")
    )
