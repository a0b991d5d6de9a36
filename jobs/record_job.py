"""spark-submit entry point for recording rules: materialize derived
signals (served aggregates, counter rates, cross-metric binops) into
per-rule recording tier stores nested under the main store, on a cron
next to compact_job.

Usage:
    # recordings.json:
    # [{"name": "tool_tokens_1h", "source": "range",
    #   "metric": "token_volume", "agg": "sum", "step": "1h",
    #   "kind": "tool"},
    #  {"name": "tokens_per_turn", "source": "binop",
    #   "left_metric": "token_volume", "right_metric": "turn_rate",
    #   "agg": "sum", "op": "/", "step": "1h", "kind": "conv"},
    #  {"name": "tok_rate", "source": "rate",
    #   "metric": "token_volume", "step": "1h", "per_second": true}]
    python jobs/record_job.py --store /data/store \
        --rules recordings.json

Re-running with the same --t1 is a no-op; bucket-local sources
refresh date-incrementally (recording.refresh_recording). Serve with
`query_job recording --name tool_tokens_1h --agg sum --step 1d`, or
point alert_job --store at the recording's directory.
"""

from __future__ import annotations

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--store", required=True, help="tier store root")
    ap.add_argument("--rules", required=True,
                    help="JSON recording-rule file")
    ap.add_argument("--t1", default=None,
                    help="record complete buckets strictly before "
                         "this instant (default: now, UTC)")
    ap.add_argument("--t0", default=None,
                    help="window recompute: re-derive dates >= this "
                         "instant (compact --since semantics); older "
                         "recorded dates are preserved")
    ap.add_argument("--partitions", type=int, default=8)
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args(argv)

    from mimir_spark.lineage import tiered_store
    from mimir_spark.recording import load_recording_rules, \
        run_recording_job
    from mimir_spark.session import get_spark

    spark = get_spark("record-job", cpus=args.cpus)
    store = tiered_store(args.store, spark)
    rules = load_recording_rules(args.rules)
    if args.t1 is None:
        import datetime

        t1 = datetime.datetime.now(datetime.timezone.utc) \
            .strftime("%Y-%m-%d %H:%M:%S")
    else:
        t1 = args.t1
    report = run_recording_job(spark, store, rules, t1=t1, t0=args.t0,
                               num_partitions=args.partitions)
    for name, r in report.items():
        print(f"recording {name}: {r['mode']}, "
              f"{r['touched']} partitions touched")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
