"""Scale rehearsal: the resumable rollup job at ~10x the bench corpus.

Round-4 verdict item #6 — the first EMPIRICAL datapoint behind the
100 TB design claims. One `run_rollup_job` over a 2M-conversation
(~35M-turn) deterministic corpus with P=64 shards on the full local
parallelism, recording:

  - per-shard skew: rows_in / points_out min / median / max across
    the 64 lineage rows (the fixture plants hot conversations every
    1000th conv, so shard skew is real, not synthetic-uniform);
  - task-time skew: executorRunTime quantiles of the heaviest stages
    from the Spark REST API — in the one-scan architecture shards are
    NOT sequential jobs, so "shard wall time" is not a physical
    quantity; task-time spread in the shared stages is what actually
    bounds the critical path on a cluster;
  - staging size vs source size (the staged-narrow-turns claim: text
    reduced to n_tok before the only wide shuffle), sampled by a
    background poller because the job cleans staging on exit;
  - peak JVM RSS (VmHWM of the local-mode JVM) as the single-process
    stand-in for peak executor memory.

Prints ONE JSON line on stdout (progress on stderr); paste the table
into BENCH.md / PLANS.md.

Usage:
    python jobs/scale_rehearsal.py [--convs 2000000] [--partitions 64]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import subprocess
import sys
import threading
import time
import urllib.request

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

REPO = pathlib.Path(__file__).resolve().parent.parent
CACHE = REPO / ".cache"
UI_PORT = 4049


def note(msg: str) -> None:
    print(f"[rehearsal +{time.monotonic() - T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


T0 = time.monotonic()


def _du_bytes(path: str) -> int:
    try:
        out = subprocess.run(["du", "-sb", path], capture_output=True,
                             text=True, timeout=60)
        return int(out.stdout.split()[0]) if out.returncode == 0 else 0
    except Exception:
        return 0


def _jvm_pid() -> int | None:
    """The local-mode JVM is the single java child of this driver."""
    try:
        out = subprocess.run(["pgrep", "-f", "org.apache.spark.deploy"],
                             capture_output=True, text=True)
        pids = [int(p) for p in out.stdout.split()]
        return pids[0] if pids else None
    except Exception:
        return None


def _vm_hwm_mb(pid: int) -> float:
    try:
        for line in open(f"/proc/{pid}/status"):
            if line.startswith("VmHWM"):
                return int(line.split()[1]) / 1024.0
    except Exception:
        pass
    return 0.0


class Poller(threading.Thread):
    """Samples staging-dir size and JVM peak RSS during the run."""

    def __init__(self, staging_dir: str):
        super().__init__(daemon=True)
        self.staging_dir = staging_dir
        self.max_staging = 0
        self.peak_rss_mb = 0.0
        self.stop = threading.Event()

    def run(self):
        pid = None
        while not self.stop.wait(5.0):
            self.max_staging = max(self.max_staging,
                                   _du_bytes(self.staging_dir))
            pid = pid or _jvm_pid()
            if pid:
                self.peak_rss_mb = max(self.peak_rss_mb, _vm_hwm_mb(pid))


def _rest(path: str):
    url = f"http://localhost:{UI_PORT}/api/v1/{path}"
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.loads(r.read())


def _task_skew(top_n: int = 5) -> list[dict]:
    """executorRunTime quantiles for the heaviest completed stages."""
    try:
        apps = _rest("applications")
        app_id = apps[0]["id"]
        stages = _rest(f"applications/{app_id}/stages?status=complete")
    except Exception as e:
        note(f"REST stage metrics unavailable: {e}")
        return []
    stages.sort(key=lambda s: s.get("executorRunTime", 0), reverse=True)
    out = []
    for s in stages[:top_n]:
        sid, att = s["stageId"], s["attemptId"]
        try:
            q = _rest(f"applications/{app_id}/stages/{sid}/{att}/"
                      f"taskSummary?quantiles=0.05,0.5,0.95,1.0")
            rt = [round(x / 1000.0, 2) for x in q["executorRunTime"]]
        except Exception:
            rt = []
        out.append({
            "stage": sid,
            "name": s.get("name", "")[:60],
            "tasks": s.get("numCompleteTasks"),
            "run_time_quantiles_s": rt,  # p5, p50, p95, max
            "total_run_time_s": round(s.get("executorRunTime", 0) / 1000.0, 1),
            "shuffle_write_mb": round(
                s.get("shuffleWriteBytes", 0) / 1e6, 1),
            "peak_execution_memory_mb": round(
                s.get("peakExecutionMemory", 0) / 1e6, 1),
        })
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int, default=2_000_000)
    ap.add_argument("--partitions", type=int, default=64)
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--keep-store", action="store_true")
    args = ap.parse_args(argv)

    from mimir_spark.lineage import TieredStore, run_rollup_job
    from mimir_spark.session import get_spark

    spark = get_spark("scale-rehearsal", cpus=args.cpus, extra_conf={
        "spark.ui.enabled": "true",          # REST API for task skew
        "spark.ui.port": str(UI_PORT),
        "spark.ui.retainedStages": "500",
    })

    corpus = CACHE / f"transcripts_rehearsal_{args.convs}"
    if not (corpus / "_SUCCESS").exists():
        note(f"generating {args.convs}-conv corpus -> {corpus}")
        from mimir_spark.fixtures import transcripts_df

        transcripts_df(spark, args.convs).write.mode("overwrite") \
            .parquet(str(corpus))
        note("corpus generated")
    else:
        note(f"reusing corpus {corpus}")
    src_bytes = _du_bytes(str(corpus))
    n_turns = spark.read.parquet(str(corpus)).count()
    note(f"corpus: {n_turns} turns, {src_bytes / 1e9:.2f} GB")

    store_dir = CACHE / f"rehearsal_store_{args.convs}_{args.partitions}"
    if store_dir.exists():
        import shutil
        shutil.rmtree(store_dir)
    store = TieredStore(store_dir)
    job_id = "rehearsal"

    def source():
        return spark.read.parquet(str(corpus))

    poller = Poller(store.turns_staging_dir(job_id))
    poller.start()
    t0 = time.monotonic()
    rows = run_rollup_job(spark, source, store, job_id,
                          num_partitions=args.partitions)
    wall = time.monotonic() - t0
    poller.stop.set()
    poller.join(timeout=10)
    note(f"job done: {len(rows)} shards in {wall:.1f}s "
         f"({n_turns / wall:,.0f} turns/s)")

    lin = spark.read.parquet(str(store.lineage_dir(job_id))).toPandas()
    ri = sorted(lin["rows_in"])
    po = sorted(lin["points_out"])
    n = len(ri)
    shard_stats = {
        "shards": n,
        "rows_in": {"min": int(ri[0]), "p50": int(ri[n // 2]),
                    "max": int(ri[-1]),
                    "max_over_median": round(ri[-1] / max(ri[n // 2], 1), 2)},
        "points_out": {"min": int(po[0]), "p50": int(po[n // 2]),
                       "max": int(po[-1])},
        "bytes_compressed_total": int(lin["bytes_compressed"].sum()),
    }
    store_bytes = _du_bytes(str(store_dir))
    payload = {
        "metric": "scale_rehearsal",
        "convs": args.convs,
        "turns": int(n_turns),
        "partitions": args.partitions,
        "wall_s": round(wall, 1),
        "turns_per_s": round(n_turns / wall),
        "source_gb": round(src_bytes / 1e9, 2),
        "staging_peak_gb": round(poller.max_staging / 1e9, 3),
        "staging_over_source": round(poller.max_staging / max(src_bytes, 1), 4),
        "store_gb": round(store_bytes / 1e9, 3),
        "jvm_peak_rss_gb": round(poller.peak_rss_mb / 1024.0, 2),
        "shard_skew": shard_stats,
        "task_skew_top_stages": _task_skew(),
    }
    print(json.dumps(payload))
    if not args.keep_store:
        import shutil
        shutil.rmtree(store_dir, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
