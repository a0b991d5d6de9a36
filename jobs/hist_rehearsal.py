"""Histogram-tier rehearsal: the quantile continuous aggregate at ~10x
the bench corpus (2M conversations, ~35M turns) — the empirical
datapoint behind the 100 TB claims for the DDSketch tiers: build
throughput for the finest tier (single source scan, two hash
aggregates), cascade cost (O(bins), no raw re-read), tier row/bin
volume, and serving latency for a 2h-step p99 over the result.

Usage: python jobs/hist_rehearsal.py [--convs 2000000]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
CACHE = pathlib.Path(__file__).resolve().parent.parent / ".cache"


def note(msg):
    print(f"[hist-rehearsal] {msg}", file=sys.stderr, flush=True)


def _du_bytes(path: str) -> int:
    return sum(f.stat().st_size
               for f in pathlib.Path(path).rglob("*") if f.is_file())


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int, default=2_000_000)
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from mimir_spark.histogram import rollup_histogram
    from mimir_spark.ingest import ingest, turn_metrics
    from mimir_spark.lineage import TieredStore
    from mimir_spark.session import get_spark

    spark = get_spark("hist-rehearsal", cpus=args.cpus)
    corpus = CACHE / f"transcripts_rehearsal_{args.convs}"
    if not (corpus / "_SUCCESS").exists():
        note(f"generating {args.convs}-conv corpus -> {corpus}")
        from mimir_spark.fixtures import transcripts_df

        transcripts_df(spark, args.convs).write.mode("overwrite") \
            .parquet(str(corpus))
    n_turns = spark.read.parquet(str(corpus)).count()
    note(f"corpus: {n_turns} turns")

    store_dir = CACHE / f"hist_rehearsal_store_{args.convs}"
    if store_dir.exists():
        import shutil
        shutil.rmtree(store_dir)
    store = TieredStore(store_dir)

    points = turn_metrics(ingest(spark.read.parquet(str(corpus))))
    t0 = time.monotonic()
    store.write_hist_tier(rollup_histogram(points, "1m"), "1m")
    build_s = time.monotonic() - t0
    note(f"1m tier built in {build_s:.1f}s ({n_turns / build_s:,.0f} turns/s)")

    t0 = time.monotonic()
    rows_1h = store.compact_hist_tier(spark, "1m", "1h")
    cascade_s = time.monotonic() - t0
    note(f"1h cascade: {rows_1h} rows in {cascade_s:.1f}s")

    tier = store.read_hist_tier(spark, "1m")
    prof = tier.agg(
        F.count("*").alias("rows"),
        F.sum(F.size("pos_bins") + F.size("neg_bins")).alias("bins"),
        F.max(F.size("pos_bins") + F.size("neg_bins")).alias("max_bins"),
    ).first()

    from mimir_spark.read_path import query_range_quantile
    t0 = time.monotonic()
    n_served = query_range_quantile(
        spark, store, "token_volume", qs={"p99": 0.99}, step="2h",
        kind="tool").count()
    serve_s = time.monotonic() - t0

    payload = {
        "metric": "hist_rehearsal",
        "convs": args.convs, "turns": int(n_turns),
        "build_1m_s": round(build_s, 1),
        "build_turns_per_s": round(n_turns / build_s),
        "cascade_1h_s": round(cascade_s, 1),
        "rows_1m": int(prof["rows"]), "rows_1h": int(rows_1h),
        "bins_total": int(prof["bins"]),
        "bins_per_row_max": int(prof["max_bins"]),
        "store_gb": round(_du_bytes(str(store_dir)) / 1e9, 3),
        "serve_p99_2h_s": round(serve_s, 1),
        "serve_rows": int(n_served),
    }
    print(json.dumps(payload))
    import shutil
    shutil.rmtree(store_dir, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
