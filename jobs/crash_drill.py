"""Crash-resume drill at scale: SIGKILL the rollup job mid-run, resume,
prove resume ≡ single-shot on the full store content.

The pytest suite drills this at fixture scale (test_lineage); this
script is the same invariant at corpus scale (default: the 2M-conv /
35.6M-turn rehearsal corpus), the evidence the 100 TB resumability
claim actually rests on:

  1. single-shot run -> store A
  2. fresh run -> store B, SIGKILL'd from OUTSIDE (kill -9 of the
     whole process group at --kill-after seconds, mid-write)
  3. re-submit the SAME command -> resumes B from its lineage
  4. compare A vs B per tier: row count, sum(cnt), sum(sum_v),
     sum(crc32(chunk)) — chunk BYTES equal, not just aggregates —
     and the lineage shard sets.

Prints one JSON line; non-zero exit if any comparison differs.

Usage:
    python jobs/crash_drill.py [--convs 2000000] [--partitions 64]
        [--kill-after 45]
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import shutil
import signal
import subprocess
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

REPO = pathlib.Path(__file__).resolve().parent.parent
CACHE = REPO / ".cache"


def note(msg):
    print(f"[drill] {msg}", file=sys.stderr, flush=True)


def _ensure_corpus(convs: int) -> str:
    corpus = CACHE / f"transcripts_rehearsal_{convs}"
    if not (corpus / "_SUCCESS").exists():
        note(f"generating corpus {corpus}")
        from mimir_spark.fixtures import transcripts_df
        from mimir_spark.session import get_spark

        spark = get_spark("drill-gen")
        transcripts_df(spark, convs).write.mode("overwrite") \
            .parquet(str(corpus))
        spark.stop()
    return str(corpus)


def _run_job(corpus: str, store: str, kill_after: float | None,
             partitions: int) -> int:
    """One rollup_job invocation in its own process GROUP; optionally
    SIGKILL the whole group mid-run (the closest local analogue of a
    yarn container kill)."""
    cmd = [sys.executable, str(REPO / "jobs" / "rollup_job.py"),
           "--input", corpus, "--output", store,
           "--job-id", "drill", "--partitions", str(partitions)]
    p = subprocess.Popen(cmd, stdout=subprocess.DEVNULL,
                         stderr=subprocess.DEVNULL, start_new_session=True)
    if kill_after is None:
        return p.wait()
    time.sleep(kill_after)
    try:
        os.killpg(os.getpgid(p.pid), signal.SIGKILL)
    except ProcessLookupError:
        pass  # finished before the kill — drill still valid but weaker
    rc = p.wait()
    note(f"killed mid-run (rc={rc})")
    return rc


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int, default=2_000_000)
    ap.add_argument("--partitions", type=int, default=64)
    ap.add_argument("--kill-after", type=float, default=45.0)
    args = ap.parse_args(argv)

    corpus = _ensure_corpus(args.convs)
    a_dir = str(CACHE / "drill_store_a")
    b_dir = str(CACHE / "drill_store_b")
    for d in (a_dir, b_dir):
        shutil.rmtree(d, ignore_errors=True)

    t0 = time.monotonic()
    note("single-shot run -> store A")
    assert _run_job(corpus, a_dir, None, args.partitions) == 0
    note(f"store A done ({time.monotonic() - t0:.0f}s)")

    note(f"crashed run -> store B (SIGKILL at {args.kill_after}s)")
    _run_job(corpus, b_dir, args.kill_after, args.partitions)
    note("resuming store B")
    t1 = time.monotonic()
    assert _run_job(corpus, b_dir, None, args.partitions) == 0
    resume_s = time.monotonic() - t1

    from pyspark.sql import functions as F

    from mimir_spark.lineage import TieredStore
    from mimir_spark.session import get_spark

    spark = get_spark("drill-verify", cpus=8)
    sa, sb = TieredStore(a_dir), TieredStore(b_dir)
    result = {"metric": "crash_drill", "convs": args.convs,
              "partitions": args.partitions,
              "kill_after_s": args.kill_after,
              "resume_wall_s": round(resume_s, 1), "tiers": {}}
    ok = True
    for tier in ("1m", "1h", "1d"):
        def sig(store):
            return tuple(store.read_tier(spark, tier).agg(
                F.count("*"),
                F.sum("cnt"),
                F.round(F.sum("sum_v"), 3),
                F.sum(F.crc32(F.col("chunk")).cast("decimal(38,0)")),
            ).first())

        va, vb = sig(sa), sig(sb)
        same = va == vb
        ok = ok and same
        result["tiers"][tier] = {"rows": va[0], "match": same}
        note(f"tier {tier}: A={va} B={vb} match={same}")
    la = {r["partition_id"] for r in
          spark.read.parquet(str(sa.lineage_dir("drill"))).collect()}
    lb = {r["partition_id"] for r in
          spark.read.parquet(str(sb.lineage_dir("drill"))).collect()}
    result["lineage_complete"] = (
        la == lb == set(range(args.partitions)))
    ok = ok and result["lineage_complete"]
    result["ok"] = ok
    spark.stop()
    for d in (a_dir, b_dir):
        shutil.rmtree(d, ignore_errors=True)
    print(json.dumps(result))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
