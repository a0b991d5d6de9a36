"""spark-submit entry point for alert-rule evaluation over a tier
store — the cron companion of rollup_job/stream_job: evaluate a JSON
rule file up to now (or --t1), persist episodes to a durable ledger,
and print what is firing.

Usage:
    # rules.json: [{"name": "tool_volume_high", "metric":
    #   "token_volume", "agg": "sum", "step": "1h", "op": ">",
    #   "threshold": 5000, "for": "3h", "kind": "tool"},
    #  {"name": "conv_died", "metric": "turn_rate",
    #   "mode": "absent", "step": "1h", "for": "6h", "kind": "conv"}]
    python jobs/alert_job.py --store /data/store \
        --rules rules.json --ledger /data/alerts

    # what is firing right now (no evaluation)
    python jobs/alert_job.py --store /data/store \
        --ledger /data/alerts --status

Re-running with the same --t1 is a no-op; threshold rules resume
incrementally from the ledger high-water mark (alerts.run_alert_job).
"""

from __future__ import annotations

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--store", required=True, help="tier store root")
    ap.add_argument("--rules", default=None,
                    help="JSON rule file (required unless --status)")
    ap.add_argument("--ledger", required=True,
                    help="alert ledger root (created if missing)")
    ap.add_argument("--t1", default=None,
                    help="evaluate complete buckets strictly before "
                         "this instant (default: now, UTC)")
    ap.add_argument("--t0", default=None,
                    help="window rebuild: re-evaluate from this "
                         "instant; episodes that ended before it keep "
                         "their recorded history, episodes overlapping "
                         "it are replaced by the window-local "
                         "derivation; absent rules ignore it and "
                         "re-evaluate fully (default: resume from "
                         "the ledger)")
    ap.add_argument("--status", action="store_true",
                    help="print open alerts from the ledger and exit")
    ap.add_argument("--show", type=int, default=50)
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args(argv)

    from mimir_spark.alerts import AlertLedger, load_rules, run_alert_job
    from mimir_spark.lineage import tiered_store
    from mimir_spark.session import get_spark

    spark = get_spark("alert-job", cpus=args.cpus)
    ledger = AlertLedger(args.ledger)

    if args.status:
        view = ledger.open_alerts(spark)
        if view is None:
            print("ledger is empty")
            return 0
        view = view.orderBy("rule", "kind", "series_key", "started_at")
        view.show(args.show, truncate=False)
        print(f"open alerts: {view.count()}")
        return 0

    if not args.rules:
        ap.error("--rules is required (or use --status)")
    rules = load_rules(args.rules)
    store = tiered_store(args.store, spark)
    if args.t1 is None:
        import datetime

        t1 = datetime.datetime.now(datetime.timezone.utc) \
            .strftime("%Y-%m-%d %H:%M:%S")
    else:
        t1 = args.t1
    report = run_alert_job(spark, store, rules, ledger, t1=t1,
                           t0=args.t0)
    for name, r in report.items():
        print(f"rule {name}: {r['mode']}, {r['episodes']} episodes, "
              f"{r['open']} open")
    n_open = sum(r["open"] for r in report.values())
    print(f"open alerts: {n_open}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
