"""spark-submit entry point for the resumable transcript rollup job.

Usage (cluster):
    cd repo && zip -r /tmp/mimir_spark.zip mimir_spark
    spark-submit --py-files /tmp/mimir_spark.zip jobs/rollup_job.py \
        --input  <transcripts table/path> \
        --output <store root> \
        --job-id nightly-2026-01-05 \
        --partitions 256 --tiers 1m,1h,1d

Local smoke:
    python jobs/rollup_job.py --generate 1000 --output /tmp/rollup_store

The job shards conversations by pmod(xxhash64(conv_id), P), commits
tier output + a lineage row per shard, and resumes from lineage on
restart — kill it mid-run and re-submit to continue.
"""

from __future__ import annotations

import argparse
import pathlib
import sys

# local runs from any cwd; under spark-submit --py-files the zip on the
# PYTHONPATH wins and this is a no-op
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="transcripts parquet path / Iceberg identifier")
    ap.add_argument("--generate", type=int, default=0,
                    help="generate a deterministic corpus of N conversations instead of --input")
    ap.add_argument("--output", required=True, help="tier store root")
    ap.add_argument("--job-id", default="rollup-job")
    ap.add_argument("--partitions", type=int, default=None,
                    help="conversation shard count P (default 8 for a "
                         "run; --status derives a lower bound from "
                         "lineage when omitted)")
    ap.add_argument("--tiers", default="1m,1h,1d")
    ap.add_argument("--distinct-sketch", default="",
                    help="also build HLL distinct-count sketch tiers: "
                         "comma list of tier:column, e.g. "
                         "1h:conv_id,1d:conv_id (serves query_job "
                         "'distinct'; one extra source scan per column)")
    ap.add_argument("--histogram", default="",
                    help="also build quantile-histogram tiers over the "
                         "point values: comma list of tiers, e.g. "
                         "1h,1d (serves query_range_quantile; one "
                         "extra source scan, coarser tiers cascade)")
    ap.add_argument("--hist-alpha", type=float, default=None,
                    help="relative-error target for --histogram bins "
                         "(default 0.01)")
    ap.add_argument("--status", action="store_true",
                    help="report per-partition lineage for --job-id "
                         "(rows in, points out, bytes compressed, "
                         "commit time) and exit without running")
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args(argv)
    if not args.input and not args.generate and not args.status:
        ap.error("one of --input / --generate is required")

    # validate --distinct-sketch BEFORE the (potentially hours-long)
    # rollup runs, not at the post-job step that consumes it
    by_col: dict[str, list[str]] = {}
    tier_owner: dict[str, str] = {}
    if args.distinct_sketch:
        from mimir_spark.rollup import TIER_US
    for spec in filter(None, args.distinct_sketch.split(",")):
        if ":" not in spec:
            ap.error(f"--distinct-sketch entries must be tier:column, "
                     f"got {spec!r}")
        tier, col = spec.split(":", 1)
        if tier not in TIER_US:
            ap.error(f"--distinct-sketch: unknown tier {tier!r} "
                     f"(expected one of {sorted(TIER_US)})")
        if not col:
            ap.error(f"--distinct-sketch: empty column in {spec!r}")
        # sketch dirs are keyed by tier alone (sketch={tier}) — a
        # tier requested for two columns would silently overwrite
        # one column's sketches with the other's
        if tier_owner.get(tier, col) != col:
            ap.error(f"--distinct-sketch: tier {tier} requested "
                     f"for both {tier_owner[tier]!r} and {col!r}; "
                     f"sketch tiers are stored per tier, so each "
                     f"tier can sketch exactly one column")
        if tier in tier_owner:
            ap.error(f"--distinct-sketch: tier {tier} listed twice")
        tier_owner[tier] = col
        by_col.setdefault(col, []).append(tier)

    hist_tiers: list[str] = []
    if args.histogram:
        from mimir_spark.rollup import TIER_US as _TU
        for tier in filter(None, args.histogram.split(",")):
            if tier not in _TU:
                ap.error(f"--histogram: unknown tier {tier!r} "
                         f"(expected one of {sorted(_TU)})")
            if tier in hist_tiers:
                ap.error(f"--histogram: tier {tier} listed twice")
            hist_tiers.append(tier)
        hist_tiers.sort(key=lambda t: _TU[t])
    if args.hist_alpha is not None and not hist_tiers:
        ap.error("--hist-alpha without --histogram")
    if args.hist_alpha is not None and not 0.0 < args.hist_alpha < 1.0:
        # fail BEFORE the potentially hours-long rollup, like the
        # sketch-spec validation above — not in the post-job step
        ap.error(f"--hist-alpha must be in (0, 1), got {args.hist_alpha}")

    from mimir_spark.lineage import run_rollup_job, tiered_store
    from mimir_spark.session import get_spark
    from mimir_spark.sources.tables import read_table

    spark = get_spark("rollup-job", cpus=args.cpus)

    if args.generate:
        from mimir_spark.fixtures import transcripts_df

        def source():
            return transcripts_df(spark, args.generate)
    else:
        def source():
            return read_table(spark, args.input)

    store = tiered_store(args.output, spark)
    if by_col and not hasattr(store, "write_sketch_tier"):
        ap.error(f"--distinct-sketch: the {type(store).__name__} "
                 f"backend does not support sketch tiers (parquet "
                 f"TieredStore only for now)")
    if hist_tiers and not hasattr(store, "write_hist_tier"):
        ap.error(f"--histogram: the {type(store).__name__} backend "
                 f"does not support histogram tiers (parquet "
                 f"TieredStore only for now)")

    if args.status:
        # the resume contract, surfaced: a partition is done iff its
        # lineage row is readable — this is exactly the set a re-run
        # would skip
        done = store.committed_partitions(spark, args.job_id)
        if not done:
            print(f"job {args.job_id}: no committed partitions")
            return 0
        # lineage records which shards committed, not the job's P; an
        # omitted --partitions can only bound P from below (the top
        # shard may be exactly the uncommitted one), so say so instead
        # of silently assuming a default and reporting bogus pendings
        if args.partitions is None:
            total, assumed = max(done) + 1, True
        else:
            total, assumed = args.partitions, False
        lin = store.read_lineage(spark, args.job_id).orderBy("partition_id")
        lin.show(total + 10, truncate=False)
        tot = lin.groupBy().sum("rows_in", "points_out",
                                "bytes_compressed").first()
        pending = sorted(set(range(total)) - done)
        label = (f">={total} (lower bound from lineage; pass "
                 f"--partitions for exact pending)" if assumed
                 else str(total))
        print(f"job {args.job_id}: {len(done)}/{label} "
              f"partitions committed; pending {pending or 'none'}; "
              f"totals rows_in={tot[0]} points_out={tot[1]} "
              f"bytes_compressed={tot[2]}")
        return 0
    partitions = 8 if args.partitions is None else args.partitions

    aux_requested = bool(by_col or hist_tiers)
    rows = run_rollup_job(
        spark, source, store, args.job_id,
        num_partitions=partitions,
        tiers=tuple(args.tiers.split(",")),
        keep_staging=aux_requested,
    )
    for r in rows:
        print(f"partition={r['partition_id']} rows_in={r['rows_in']} "
              f"points_out={r['points_out']} bytes={r['bytes_compressed']}")
    print(f"done: {len(rows)} partitions this run "
          f"({partitions} total, rest were already committed)")

    # aux-tier input: when THIS invocation staged every shard, the
    # job's narrow deduped turns are still on disk (keep_staging) and
    # turn_metrics reads them directly (n_tok precomputed) — ZERO
    # extra source scans for sketches/histograms, the shape that
    # matters when the source is 100 TB and the staging is ~6% of it.
    # A resumed run staged only the pending subset (and a fully-
    # committed one staged nothing), so those fall back to one source
    # re-scan.
    import pathlib

    from mimir_spark.ingest import ingest, turn_metrics

    stage_dir = store.turns_staging_dir(args.job_id) \
        if hasattr(store, "turns_staging_dir") else None
    staged_complete = (
        aux_requested and stage_dir is not None
        and len(rows) == partitions
        and any(pathlib.Path(stage_dir).glob("*.parquet")))

    points = None
    if aux_requested:
        if staged_complete:
            print("aux tiers: reusing staged narrow turns "
                  "(no source re-scan)")
            points = turn_metrics(spark.read.parquet(stage_dir))
        else:
            # ONE fallback source scan shared by every aux family:
            # persisted so the second write action (e.g. --histogram
            # after --distinct-sketch) re-reads the cached points, not
            # the (100 TB) source
            points = turn_metrics(ingest(source())).persist()

    try:
        if args.distinct_sketch:
            # post-job step (atomic per tier via write_sketch_tier's
            # tmp swap, idempotent on re-run): only the FINEST
            # requested tier aggregates the points; every coarser tier
            # cascades from the persisted finer sketch tier by HLL
            # union (exact over sketch state), reading
            # O(series x buckets) sketch rows instead of the corpus
            from mimir_spark.rollup import TIER_US, rollup_distinct_sketch

            for col, tiers in by_col.items():
                tiers.sort(key=lambda t: TIER_US[t])
                finest = tiers[0]
                store.write_sketch_tier(
                    rollup_distinct_sketch(points, finest,
                                           distinct_col=col),
                    finest)
                print(f"sketch tier {finest} (distinct {col}) written")
                for prev, tier in zip(tiers, tiers[1:]):
                    n = store.compact_sketch_tier(spark, prev, tier)
                    print(f"sketch tier {tier} (distinct {col}) "
                          f"cascaded from {prev}: {n} rows")

        if hist_tiers:
            # same post-job shape as --distinct-sketch: the finest
            # requested histogram tier aggregates the points once;
            # coarser tiers cascade from it by bin addition (exact
            # over the sketch state), reading
            # O(series x buckets x bins) rows
            from mimir_spark.histogram import (DEFAULT_ALPHA,
                                               rollup_histogram)

            alpha = (DEFAULT_ALPHA if args.hist_alpha is None
                     else args.hist_alpha)
            finest = hist_tiers[0]
            store.write_hist_tier(
                rollup_histogram(points, finest, alpha=alpha), finest)
            print(f"histogram tier {finest} (alpha={alpha}) written")
            for prev, tier in zip(hist_tiers, hist_tiers[1:]):
                n = store.compact_hist_tier(spark, prev, tier)
                print(f"histogram tier {tier} cascaded from {prev}: "
                      f"{n} rows")
    finally:
        # the staged turns must not outlive the aux step even when a
        # write fails mid-way — at scale they are ~6% of the source
        if aux_requested and stage_dir is not None:
            store.cleanup_staging(stage_dir)
        if points is not None and not staged_complete:
            points.unpersist()
    return 0


if __name__ == "__main__":
    sys.exit(main())
