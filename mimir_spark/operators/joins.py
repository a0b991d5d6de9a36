"""Time-series join operators Spark lacks natively: as-of join and
range (interval) join, expressed as compositions of built-in ops.

The as-of join is the time-series workhorse (enrich each event with
the latest earlier reference row). Two strategies:

1. ``asof_join`` — union + window trick: zero theta-join, one shuffle,
   scales to arbitrarily dense right sides. This is the plan you want
   at 100 TB: both sides are tagged, unioned, hash-partitioned by key
   and time-sorted once; ``last(right_value) ignore nulls`` over the
   union gives every left row its as-of match. No per-row Python, no
   range explosion.
2. ``asof_join_bucketed`` — bucketize the time axis + equi-join on
   (key, bucket) + pick max earlier ts. Bounded-staleness variant:
   right rows older than ``tolerance`` never match (merge_asof
   tolerance semantics); the equi-join on bucket keeps Catalyst on a
   hash join instead of a broadcast-nested-loop range join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str = "ts",
              by: str | list[str] = "key",
              value_cols: list[str] | None = None,
              suffix: str = "_asof") -> DataFrame:
    """For each left row: columns of the latest right row with
    right.on <= left.on and equal ``by`` keys. Union + sort + last
    ignore-nulls — one shuffle, no range join."""
    by = [by] if isinstance(by, str) else list(by)
    value_cols = value_cols or [c for c in right.columns if c not in {on, *by}]
    l_cols = [c for c in left.columns]
    lt = left.select(*l_cols, F.lit(1).alias("_is_left"),
                     *[F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}")
                       for c in value_cols])
    rt = right.select(
        *[F.col(c) for c in by], F.col(on),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in l_cols if c not in {on, *by}],
        F.lit(0).alias("_is_left"),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
    ).select(*lt.columns)  # align column order
    u = lt.unionByName(rt)
    # right rows sort before left rows at equal ts => "<=" semantics
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.select(
        *l_cols, F.col("_is_left"),
        *[F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
          for c in value_cols],
    )
    return filled.filter(F.col("_is_left") == 1).drop("_is_left")


def asof_join_bucketed(left: DataFrame, right: DataFrame, on: str = "ts",
                       by: str = "key", value_col: str = "value",
                       tolerance_sec: int = 3600,
                       suffix: str = "_asof") -> DataFrame:
    """Bounded-staleness as-of join via time bucketization.

    Each left row probes its own bucket and the previous one, then the
    latest right row within tolerance wins. Scales as an equi-join on
    (by, bucket) — partition-prunable when right is stored bucketed."""
    bucket = lambda c: (F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
                        / (tolerance_sec * 1_000_000)).cast("long")
    # tag each left row with a unique id BEFORE the probe explode so two
    # left rows identical in every column still yield two output rows
    l = (left.withColumn("_lid", F.monotonically_increasing_id())
         .withColumn("_b", bucket(on)).alias("l"))
    r = (right.select(F.col(by), F.col(on).alias("_rts"),
                      F.col(value_col).alias(f"{value_col}{suffix}"))
         .withColumn("_rb", bucket("_rts")).alias("r"))
    probes = l.withColumn("_probe", F.explode(F.array(F.col("_b"), F.col("_b") - 1)))
    j = probes.join(
        r,
        (F.col(f"l.{by}") == F.col(f"r.{by}")) & (F.col("_probe") == F.col("_rb"))
        & (F.col("_rts") <= F.col(f"l.{on}"))
        & (F.col("_rts") >= F.col(f"l.{on}") - F.expr(f"INTERVAL {tolerance_sec} SECONDS")),
        "left",
    )
    w = Window.partitionBy(F.col("l._lid")).orderBy(F.col("_rts").desc_nulls_last())
    return (
        j.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(*[F.col(f"l.{c}") for c in left.columns],
                F.col(f"{value_col}{suffix}"))
    )


def range_join(left: DataFrame, right: DataFrame,
               left_ts: str = "ts", right_start: str = "start",
               right_end: str = "end", by: list[str] | None = None) -> DataFrame:
    """Point-in-interval join: left rows matched to right intervals
    containing them (the event-time ContainsQuery of SURVEY.md §2.3)."""
    cond = (F.col(f"l.{left_ts}") >= F.col(f"r.{right_start}")) & (
        F.col(f"l.{left_ts}") < F.col(f"r.{right_end}"))
    for c in by or []:
        cond = cond & (F.col(f"l.{c}") == F.col(f"r.{c}"))
    return left.alias("l").join(right.alias("r"), cond)
