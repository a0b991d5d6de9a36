"""DDSketch-style mergeable quantile histograms as continuous-aggregate
tiers.

Quantiles are the canonical NON-additive aggregate a tiered time-series
store must still serve from rollups: a p99-per-hour cannot be derived
from p99s-per-minute, and keeping raw points defeats tiered retention.
This repo solves the same problem for distinct counts with HLL sketches
(rollup.rollup_distinct_sketch); this module does it for quantiles with
log-bucketed histograms (Masson, Lee & Lung, "DDSketch: a fast and
fully-mergeable quantile sketch with relative-error guarantees",
VLDB'19 — the same family as Prometheus native histograms and
TimescaleDB's percentile aggregates): per (series, bucket) the value
distribution is kept as counts over geometric bins
``gamma^(i-1) < |v| <= gamma^i`` with ``gamma = (1+alpha)/(1-alpha)``,
so any rank estimate is within RELATIVE error ``alpha`` of the true
order statistic, bins merge by ADDITION (cascade and step-serving reuse
the additive-tier machinery), and sketch size is bounded by the dynamic
range (log_gamma(max/min) bins — ~1.1k bins across 10 decades at
alpha=0.01), independent of point count.

Reference analogue: none — the reference's aggregations stop at counts
(search/terms/AbstractIndexTermsQuery.java:225-300); quantile tiers are
engine-core time-series capability under the north rule's
continuous-aggregate design, sibling to the HLL distinct tier.

Scale notes: everything is JVM-side Catalyst. Bin indexing is one
``ceil(ln|v| / ln gamma)`` expression; the per-bucket bin map is built
by two hash aggregates (both partial+final map-side combine; the second
groups a strict prefix of the first's key, so its shuffle moves only
O(series x buckets x occupied-bins) rows, and AQE coalesces the small
post-shuffle partitions); merging explodes maps back to bin rows and
re-aggregates (row count again O(occupied bins), never O(points)); and
quantile EVALUATION is a pure expression fold (``F.aggregate`` over the
value-sorted bin array) — no Python, no UDF, no collect anywhere.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .rollup import _SERIES_COLS, TIER_TRUNC

#: Default relative-error target: any quantile estimate is within 1%
#: of the true order statistic (zero values are exact; sign is exact).
DEFAULT_ALPHA = 0.01

#: Histogram-tier row shape (alpha rides along so evaluation can never
#: disagree with construction about the bin -> value mapping).
HIST_SCHEMA = (
    "tier string, kind string, series_key string, metric string, "
    "bucket_ts timestamp, alpha double, cnt long, zero_cnt long, "
    "neg_bins map<int,bigint>, pos_bins map<int,bigint>"
)

_OUT_COLS = ["tier", *_SERIES_COLS, "bucket_ts", "alpha", "cnt",
             "zero_cnt", "neg_bins", "pos_bins"]


def gamma_of(alpha: float) -> float:
    """gamma = (1+alpha)/(1-alpha): the geometric bin ratio giving
    relative error <= alpha at the bin midpoint estimate."""
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    return (1.0 + alpha) / (1.0 - alpha)


def _bin_index(v, gamma: float):
    """DDSketch bin index of |v|: ceil(ln|v|/ln gamma), i.e. the i with
    gamma^(i-1) < |v| <= gamma^i (v != 0)."""
    return F.ceil(F.log(F.abs(v)) / F.lit(math.log(gamma))).cast("int")


def rollup_histogram(points: DataFrame, tier: str, value_col: str = "v",
                     alpha: float = DEFAULT_ALPHA) -> DataFrame:
    """Per-(series, bucket) value-distribution histograms at the given
    retention tier — the quantile continuous aggregate. Input is the
    raw points frame (rollup.POINTS_SCHEMA shape); output one row per
    (series, bucket) in HIST_SCHEMA.

    Bins: sign-split like DDSketch's stores — ``neg_bins`` holds
    indices of -v for v < 0, ``zero_cnt`` counts exact zeros,
    ``pos_bins`` indices of v > 0 — so negative values carry the same
    relative-error guarantee on |v| and zero never pollutes the log
    scale."""
    g = gamma_of(alpha)
    v = F.col(value_col).cast("double")
    # NULL values must not bin at all: the sign expression's
    # .otherwise(0) would silently count them as zeros, skewing
    # quantiles downward for any caller whose points frame does not
    # pre-filter NULLs (turn_metrics does; custom extractors and
    # recording outputs need not)
    points = points.filter(v.isNotNull())
    sgn = (F.when(v > 0, F.lit(1)).when(v < 0, F.lit(-1))
           .otherwise(F.lit(0)))
    idx = F.when(v == 0, F.lit(0)).otherwise(_bin_index(v, g))
    bucket = F.date_trunc(TIER_TRUNC[tier], F.col("ts")).alias("bucket_ts")
    per_bin = (
        points.select(*_SERIES_COLS, bucket, sgn.alias("sgn"),
                      idx.alias("idx"))
        .groupBy(*_SERIES_COLS, "bucket_ts", "sgn", "idx")
        .agg(F.count("*").alias("c"))
        .withColumn("alpha", F.lit(float(alpha)))
    )
    return _assemble_bins(per_bin, F.lit(tier))


def _explode_bins(hist_df: DataFrame) -> DataFrame:
    """Histogram rows back to (series, bucket_ts, sgn, idx, c) bin rows
    — the inverse of _assemble_bins. Row count is the number
    of OCCUPIED bins, never the point count.

    ONE scan, one explode: the three stores concatenate into a single
    entry array per row before exploding. A per-store union would read
    the (pruned slice of the) tier three times — measured as 3
    FileScans in the serving plan before this shape; the cascade path
    reads the whole fine tier, where 3x matters at 100 TB."""
    def _store(col, sgn):
        return F.transform(
            F.map_entries(col),
            lambda e: F.struct(F.lit(sgn).alias("sgn"),
                               e["key"].alias("idx"),
                               e["value"].alias("c")))

    zero = F.when(
        F.col("zero_cnt") > 0,
        F.array(F.struct(F.lit(0).alias("sgn"), F.lit(0).alias("idx"),
                         F.col("zero_cnt").alias("c")))
    ).otherwise(F.expr("array()")
                .cast("array<struct<sgn:int,idx:int,c:bigint>>"))
    entries = F.concat(_store("neg_bins", -1), zero,
                       _store("pos_bins", 1))
    return (
        hist_df.select(*_SERIES_COLS, "bucket_ts", "alpha",
                       F.explode(entries).alias("e"))
        .select(*_SERIES_COLS, "bucket_ts", "alpha",
                F.col("e.sgn").alias("sgn"), F.col("e.idx").alias("idx"),
                F.col("e.c").alias("c"))
    )


def _merge_bins(hist_df: DataFrame, bucket, tier_lit) -> DataFrame:
    """Shared merge: explode to bin rows, re-bucket, re-aggregate.
    Exact over the sketch state — counts add — so the result is
    identical to histogramming the raw points at the coarser bucket
    directly (the property the cascade test pins).

    alpha joins the group keys: bins built under different alphas are
    on different grids and must never be summed together — mixed-alpha
    input surfaces as distinct rows instead of silent garbage."""
    rows = _explode_bins(hist_df)
    per_bin = (rows.groupBy(*_SERIES_COLS, bucket.alias("bucket_ts"),
                            "alpha", "sgn", "idx")
               .agg(F.sum("c").alias("c")))
    return _assemble_bins(per_bin, tier_lit)


def _assemble_bins(per_bin: DataFrame, tier_lit) -> DataFrame:
    """(series, bucket_ts, alpha, sgn, idx, c) bin rows -> map-shaped
    HIST_SCHEMA rows, alpha riding in the group keys (the merge-side
    assembly; also the streaming sink's bin-row -> tier-row step)."""
    entry = F.struct(F.col("idx").alias("key"), F.col("c").alias("value"))
    return (
        per_bin.groupBy(*_SERIES_COLS, "bucket_ts", "alpha")
        .agg(F.sum("c").alias("cnt"),
             F.coalesce(F.sum(F.when(F.col("sgn") == 0, F.col("c"))),
                        F.lit(0).cast("long")).alias("zero_cnt"),
             F.map_from_entries(F.array_sort(F.collect_list(
                 F.when(F.col("sgn") == -1, entry)))).alias("neg_bins"),
             F.map_from_entries(F.array_sort(F.collect_list(
                 F.when(F.col("sgn") == 1, entry)))).alias("pos_bins"))
        .withColumn("tier", tier_lit)
        .select(*_OUT_COLS)
    )


def cascade_histogram(hist_df: DataFrame, to_tier: str) -> DataFrame:
    """Re-aggregate a finer histogram tier into ``to_tier`` by bin
    addition — the histogram counterpart of rollup.cascade /
    cascade_distinct_sketch, and the nightly-compaction primitive."""
    bucket = F.date_trunc(TIER_TRUNC[to_tier], F.col("bucket_ts"))
    return _merge_bins(hist_df, bucket, F.lit(to_tier))


def histogram_over_step(hist_df: DataFrame, step_seconds: int) -> DataFrame:
    """Histograms over ARBITRARY step buckets from a stored tier — the
    query_range analogue for quantiles: a 2h dashboard step merges the
    1h tier's bins instead of re-reading raw data. Epoch arithmetic,
    not window(): window's origin is 1970-01-01 in the SESSION
    timezone, which shifts buckets under e.g. +05:30. The step must be
    a multiple of the tier's bucket width (read_path.select_tier owns
    the coarsest-divisor rule)."""
    us = F.unix_micros(F.col("bucket_ts"))
    step_us = step_seconds * 1_000_000
    bucket = F.timestamp_micros(us - (us % F.lit(step_us)))
    return _merge_bins(hist_df, bucket, F.lit(f"{step_seconds}s"))


# ---------------------------------------------------------------------------
# quantile evaluation — a pure expression fold over the bin array
# ---------------------------------------------------------------------------


def _bin_mid(idx_col, g_col):
    """Value estimate for a positive bin: 2*gamma^i/(gamma+1), the
    harmonic midpoint of (gamma^(i-1), gamma^i] — relative error
    <= (gamma-1)/(gamma+1) = alpha for any value in the bin."""
    return F.pow(g_col, idx_col.cast("double")) * F.lit(2.0) / (g_col + 1.0)


def _sorted_entries():
    """array<struct<val double, c long>> of (estimate, count) entries
    sorted ascending by value: negated negative-store estimates, the
    zero count, positive-store estimates. array_sort on an array of
    structs orders by the first field — exactly the value order the
    rank scan needs."""
    g = (1.0 + F.col("alpha")) / (1.0 - F.col("alpha"))
    neg = F.transform(
        F.map_entries("neg_bins"),
        lambda e: F.struct((-_bin_mid(e["key"], g)).alias("val"),
                           e["value"].alias("c")))
    zero = F.when(
        F.col("zero_cnt") > 0,
        F.array(F.struct(F.lit(0.0).alias("val"),
                         F.col("zero_cnt").alias("c")))
    ).otherwise(F.expr("array()").cast("array<struct<val:double,c:bigint>>"))
    pos = F.transform(
        F.map_entries("pos_bins"),
        lambda e: F.struct(_bin_mid(e["key"], g).alias("val"),
                           e["value"].alias("c")))
    return F.array_sort(F.concat(neg, zero, pos))


def _quantile_fold(entries, q: float):
    """Estimate of the order statistic at 0-based rank
    floor(q * (cnt-1)) (numpy percentile method='lower'): one
    F.aggregate pass accumulating (cumulative count, first value whose
    cumulative count exceeds the target rank)."""
    target = F.floor(F.lit(float(q)) * (F.col("cnt") - 1).cast("double"))
    acc0 = F.struct(F.lit(0).cast("long").alias("cum"),
                    F.lit(None).cast("double").alias("ans"))
    folded = F.aggregate(
        entries, acc0,
        lambda acc, e: F.struct(
            (acc["cum"] + e["c"]).alias("cum"),
            F.when(acc["ans"].isNotNull(), acc["ans"])
            .when(acc["cum"] + e["c"] > target, e["val"])
            .alias("ans")))
    return folded["ans"]


def with_quantiles(hist_df: DataFrame,
                   qs: dict[str, float] | None = None) -> DataFrame:
    """Append one estimated-quantile column per (name, q) to a
    histogram frame (rollup_histogram / cascade_histogram /
    histogram_over_step output). Defaults to the dashboard set
    p50/p90/p99. Estimates carry the frame's own alpha (a stored
    column), so evaluation can never disagree with construction about
    the bin grid. Pure Catalyst — the fold happens inside the row, no
    shuffle, no Python."""
    if qs is None:
        qs = {"p50": 0.5, "p90": 0.9, "p99": 0.99}
    entries = _sorted_entries()
    out = hist_df
    for name, q in qs.items():
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile {name}={q} outside [0, 1]")
        out = out.withColumn(name, _quantile_fold(entries, q))
    return out


def _fraction_fold(entries, threshold: float):
    """Estimated fraction of values <= threshold: sum the counts of
    entries whose bin estimate is <= threshold, over cnt. The bin
    estimate carries the sketch's alpha relative-error bound, so the
    only mass that can be miscounted lives in bins whose true values
    straddle threshold*(1 +- alpha) — the standard DDSketch fraction
    contract (exact when the threshold is not inside a populated
    bin's error band)."""
    acc0 = F.lit(0).cast("long")
    below = F.aggregate(
        entries, acc0,
        lambda acc, e: acc + F.when(e["val"] <= F.lit(float(threshold)),
                                    e["c"]).otherwise(F.lit(0)))
    return below.cast("double") / F.col("cnt")


def with_fractions(hist_df: DataFrame,
                   thresholds: dict[str, float]) -> DataFrame:
    """Append one estimated P(value <= t) column per (name, t) — the
    SLO / Prometheus histogram_fraction verb over the same histogram
    tiers the quantile fold serves: 'what fraction of tool turns kept
    under 500 tokens this hour' without re-reading raw data. Pure
    Catalyst (an expression fold inside the row), same plan shape as
    with_quantiles."""
    entries = _sorted_entries()
    out = hist_df
    for name, t in thresholds.items():
        out = out.withColumn(name, _fraction_fold(entries, t))
    return out
