"""spark-submit entry point for querying a tier store.

The read-side companion of rollup_job.py / compact_job.py: point it at
a store and get either raw decoded points (series_points — the
chunk-decode path) or a continuous-aggregate range query (query_range
— served entirely from stored tier aggregates, no decode). Results
print as a table or write to parquet.

Usage:
    # PromQL-style range query, auto tier selection (2h -> 1h tier)
    python jobs/query_job.py --store /tmp/vstore range \
        --metric token_volume --agg avg --step 2h --kind conv \
        --t0 2026-01-06 --t1 2026-01-08 --fill locf

    # raw points for one series slice (decodes chunks)
    python jobs/query_job.py --store /tmp/vstore points \
        --tier 1m --kind tool --series-key bash --t0 2026-01-07

    # write to parquet instead of showing
    ... range --metric turn_rate --agg sum --step 1d --out /tmp/result
"""

from __future__ import annotations

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--store", required=True, help="tier store root")
    ap.add_argument("--cpus", type=int, default=None)
    sub = ap.add_subparsers(dest="mode", required=True)

    rng = sub.add_parser("range", help="aggregate range query (no decode)")
    rng.add_argument("--metric", required=True)
    rng.add_argument("--agg", default="avg",
                     help="sum/count/min/max/last/avg, or a quantile "
                          "(p50, p99, p99.9 — served from the "
                          "histogram tier)")
    rng.add_argument("--step", default="1h",
                     help="bucket step <n>[smhdw]; epoch-aligned "
                          "(weeks start Thursday, as in PromQL)")
    rng.add_argument("--tier", default=None,
                     help="force a tier (default: coarsest divisor of step)")
    rng.add_argument("--fill", default=None, choices=["locf", "linear"])

    rate = sub.add_parser("rate", help="reset-aware counter increase/rate "
                                       "per step (decodes the pruned slice)")
    rate.add_argument("--metric", required=True)
    rate.add_argument("--step", default="1h")
    rate.add_argument("--tier", default="1m")
    rate.add_argument("--per-second", action="store_true")

    pts = sub.add_parser("points", help="raw decoded points")
    pts.add_argument("--tier", default="1m")
    pts.add_argument("--metric", default=None)

    lttb = sub.add_parser("lttb", help="LTTB-downsampled points per "
                                       "series (plot-ready, shape-"
                                       "preserving)")
    lttb.add_argument("--tier", default="1m")
    lttb.add_argument("--metric", default=None)
    lttb.add_argument("--points", type=int, default=2000,
                      help="max output points per series")

    dst = sub.add_parser("distinct", help="approximate distinct counts "
                                          "per step from a persisted "
                                          "sketch tier (HLL union)")
    dst.add_argument("--metric", required=True)
    dst.add_argument("--step", default="1h")
    dst.add_argument("--tier", default=None)

    gaps = sub.add_parser("gaps", help="missing-bucket report: per-"
                                       "series tier buckets with no "
                                       "data, labeled with run length")
    gaps.add_argument("--tier", default="1m")
    gaps.add_argument("--metric", default=None)

    qtl = sub.add_parser("quantile", help="approximate quantiles per "
                                          "step from a persisted "
                                          "histogram tier (bin merge)")
    qtl.add_argument("--metric", required=True)
    qtl.add_argument("--step", default="1h")
    qtl.add_argument("--tier", default=None)
    qtl.add_argument("--q", default="0.5,0.9,0.99",
                     help="comma list of quantiles in [0,1]")
    qtl.add_argument("--le", default="",
                     help="comma list of value thresholds: also "
                          "report estimated P(value <= t) per bucket "
                          "(the SLO fraction verb)")

    topk = sub.add_parser("topk", help="k series with the largest "
                                       "(or --bottom smallest) range "
                                       "aggregate — PromQL topk, "
                                       "served from stored tiers")
    topk.add_argument("--metric", required=True)
    topk.add_argument("--k", type=int, default=10)
    topk.add_argument("--agg", default="sum",
                      choices=["sum", "count", "min", "max", "avg"])
    topk.add_argument("--bottom", action="store_true")
    topk.add_argument("--tier", default=None)

    rec = sub.add_parser("recording", help="serve a recorded metric "
                                           "(record_job output) through "
                                           "the ordinary range path")
    rec.add_argument("--name", required=True, help="recording rule name")
    rec.add_argument("--agg", default="avg",
                     help="re-aggregation over the recorded tier "
                          "(sum/count/min/max/last/avg)")
    rec.add_argument("--step", default=None,
                     help="dashboard step (default: the recorded tier)")

    anom = sub.add_parser("anomalies", help="step buckets whose value "
                                            "deviates >= threshold "
                                            "rolling z-scores from the "
                                            "trailing window")
    anom.add_argument("--metric", required=True)
    anom.add_argument("--agg", default="avg",
                      choices=["sum", "count", "min", "max", "last", "avg"])
    anom.add_argument("--step", default="1h")
    anom.add_argument("--tier", default=None)
    anom.add_argument("--threshold", type=float, default=3.0)
    anom.add_argument("--window", type=int, default=20,
                      help="trailing buckets in the baseline")
    anom.add_argument("--period", default=None,
                      help="seasonal baseline: compare each bucket to "
                           "the previous --window occurrences of the "
                           "SAME phase of this period (e.g. 1d for "
                           "hour-of-day), not plain trailing buckets")

    for p in (rng, rate, pts, lttb, dst, gaps, qtl, topk, rec, anom):
        p.add_argument("--kind", default=None)
        p.add_argument("--series-key", default=None)
        p.add_argument("--t0", default=None)
        p.add_argument("--t1", default=None)
        p.add_argument("--out", default=None, help="parquet output path")
        p.add_argument("--show", type=int, default=20)

    args = ap.parse_args(argv)

    from mimir_spark.lineage import tiered_store
    from mimir_spark.read_path import (query_range, query_range_rate,
                                       series_points)
    from mimir_spark.session import get_spark

    spark = get_spark("query-job", cpus=args.cpus)
    store = tiered_store(args.store, spark)
    if args.mode == "range":
        df = query_range(spark, store, args.metric, agg=args.agg,
                         step=args.step, t0=args.t0, t1=args.t1,
                         kind=args.kind, series_key=args.series_key,
                         fill=args.fill, tier=args.tier)
    elif args.mode == "rate":
        df = query_range_rate(spark, store, args.metric, step=args.step,
                              t0=args.t0, t1=args.t1, kind=args.kind,
                              series_key=args.series_key, tier=args.tier,
                              per_second=args.per_second)
    elif args.mode == "lttb":
        from mimir_spark.downsample import downsample_lttb

        df = downsample_lttb(
            series_points(spark, store, args.tier, kind=args.kind,
                          series_key=args.series_key, metric=args.metric,
                          t0=args.t0, t1=args.t1),
            args.points)
    elif args.mode == "distinct":
        from mimir_spark.read_path import query_range_distinct

        df = query_range_distinct(spark, store, args.metric,
                                  step=args.step, t0=args.t0, t1=args.t1,
                                  kind=args.kind,
                                  series_key=args.series_key,
                                  tier=args.tier)
    elif args.mode == "quantile":
        from mimir_spark.read_path import query_range_quantile

        qs = {}
        for tok in filter(None, args.q.split(",")):
            q = float(tok)
            qs[f"p{q * 100:g}".replace(".", "_")] = q
        fractions = {}
        for tok in filter(None, args.le.split(",")):
            fractions[f"le_{tok.strip()}".replace(".", "_")] = float(tok)
        df = query_range_quantile(spark, store, args.metric, qs=qs,
                                  step=args.step, t0=args.t0, t1=args.t1,
                                  kind=args.kind,
                                  series_key=args.series_key,
                                  tier=args.tier,
                                  fractions=fractions or None)
    elif args.mode == "gaps":
        from mimir_spark.read_path import query_gaps

        df = query_gaps(spark, store, metric=args.metric, tier=args.tier,
                        t0=args.t0, t1=args.t1, kind=args.kind,
                        series_key=args.series_key)
    elif args.mode == "topk":
        from mimir_spark.read_path import query_topk_series

        df = query_topk_series(spark, store, args.metric, args.k,
                               agg=args.agg, t0=args.t0, t1=args.t1,
                               kind=args.kind, bottom=args.bottom,
                               tier=args.tier)
    elif args.mode == "recording":
        from mimir_spark.recording import query_recording

        df = query_recording(spark, store, args.name, agg=args.agg,
                             step=args.step, t0=args.t0, t1=args.t1,
                             kind=args.kind, series_key=args.series_key)
    elif args.mode == "anomalies":
        served = query_range(spark, store, args.metric, agg=args.agg,
                             step=args.step, t0=args.t0, t1=args.t1,
                             kind=args.kind, series_key=args.series_key,
                             tier=args.tier)
        if args.period:
            from mimir_spark.functions.timeseries import \
                with_seasonal_zscore
            from mimir_spark.read_path import parse_step

            from pyspark.sql import functions as F

            df = with_seasonal_zscore(
                served, parse_step(args.period) // 1_000_000,
                value_col="value", n=args.window,
                time_col="bucket_ts") \
                .filter(F.abs(F.col("seasonal_zscore"))
                        >= args.threshold)
        else:
            from mimir_spark.functions.timeseries import detect_anomalies

            df = detect_anomalies(served, threshold=args.threshold,
                                  value_col="value", n=args.window,
                                  time_col="bucket_ts")
    else:
        df = series_points(spark, store, args.tier, kind=args.kind,
                           series_key=args.series_key, metric=args.metric,
                           t0=args.t0, t1=args.t1)
    if args.out:
        df.write.mode("overwrite").parquet(args.out)
        print(f"wrote {spark.read.parquet(args.out).count()} rows -> {args.out}")
    else:
        df.orderBy("kind", "series_key", "metric",
                   df.columns[3]).show(args.show, truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
