"""Resumable rollup job with per-partition lineage + metrics.

Reference parity:
- per-batch stats written at flush (AtomicIndex.java:1035-1057) ->
  lineage row (rows_in, points_out, bytes_compressed) per partition;
- crash repair to a batch boundary (util/TruncateIndex.java:86-99) ->
  resume skips partitions whose lineage commit exists; an interrupted
  partition is simply recomputed (writes are idempotent overwrites of
  that partition's directory);
- deleted-docs overlay / retention (MimirIndex.java:944-998) ->
  date-partitioned tier layout where expiry = dropping partition dirs.

On a real cluster this layout is an Iceberg table (MERGE INTO +
snapshot per partition commit + rewrite_data_files); the plain-parquet
implementation here preserves the same commit protocol: data first,
then the lineage marker — a partition is "done" iff its lineage row is
readable, and every write is an atomic directory replace.
"""

from __future__ import annotations

import shutil
import time
from pathlib import Path

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .ingest import ingest, turn_metrics
from .rollup import rollup_points

LINEAGE_SCHEMA = (
    "job_id string, partition_id int, rows_in long, points_out long, "
    "bytes_compressed long, committed_at timestamp"
)


class TieredStore:
    """Date-partitioned parquet layout per tier with O(metadata) expiry."""

    def __init__(self, root: str | Path):
        self.root = Path(root)

    def tier_dir(self, tier: str) -> Path:
        return self.root / f"tier={tier}"

    def write_partition(self, df: DataFrame, tier: str, partition_id: int) -> None:
        out = self.tier_dir(tier) / f"p={partition_id}"
        tmp = out.with_name(out.name + ".tmp")
        if tmp.exists():
            shutil.rmtree(tmp)
        (
            df.withColumn("bucket_date", F.to_date("bucket_ts"))
            .write.mode("overwrite")
            .partitionBy("bucket_date")
            .parquet(str(tmp))
        )
        if out.exists():
            shutil.rmtree(out)
        tmp.rename(out)

    def read_tier(self, spark: SparkSession, tier: str) -> DataFrame:
        return spark.read.option("basePath", str(self.tier_dir(tier))).parquet(
            str(self.tier_dir(tier) / "p=*")
        )

    def expire(self, tier: str, cutoff_date: str) -> list[str]:
        """Retention: drop whole date partitions older than cutoff.

        Pure metadata operation — no data rewrite (Iceberg
        drop-partition analogue of the deleted-docs overlay)."""
        dropped = []
        for pdir in sorted(self.tier_dir(tier).glob("p=*/bucket_date=*")):
            date = pdir.name.split("=", 1)[1]
            if date < cutoff_date:
                shutil.rmtree(pdir)
                dropped.append(str(pdir))
        return dropped

    # -- lineage -----------------------------------------------------------

    def lineage_dir(self, job_id: str) -> Path:
        return self.root / "_lineage" / f"job={job_id}"

    def committed_partitions(self, spark: SparkSession, job_id: str) -> set[int]:
        d = self.lineage_dir(job_id)
        if not d.exists():
            return set()
        done = set()
        for p in d.glob("p=*"):
            if (p / "_COMMITTED").exists():
                done.add(int(p.name.split("=", 1)[1]))
        return done

    def commit_lineage(self, row: dict) -> None:
        d = self.lineage_dir(row["job_id"]) / f"p={row['partition_id']}"
        d.mkdir(parents=True, exist_ok=True)
        pdf = pd.DataFrame([row])
        pdf["committed_at"] = pdf["committed_at"].astype("datetime64[us]")
        pdf.to_parquet(d / "lineage.parquet", index=False,
                       coerce_timestamps="us", allow_truncated_timestamps=True)
        (d / "_COMMITTED").touch()

    def read_lineage(self, spark: SparkSession, job_id: str) -> DataFrame:
        return spark.read.parquet(str(self.lineage_dir(job_id) / "p=*" / "lineage.parquet"))


def run_rollup_job(
    spark: SparkSession,
    source,  # callable () -> DataFrame of transcripts
    store: TieredStore,
    job_id: str,
    num_partitions: int = 8,
    tiers: tuple[str, ...] = ("1m", "1h", "1d"),
    max_partitions: int | None = None,
) -> list[dict]:
    """Process transcript partitions (pmod(xxhash64(conv_id), P)) one at
    a time, committing tier output + a lineage row per partition.

    ``max_partitions`` bounds work per invocation (used by tests to
    simulate a crash mid-job); re-invoking resumes from lineage.
    """
    done = store.committed_partitions(spark, job_id)
    pending = [p for p in range(num_partitions) if p not in done]
    if max_partitions is not None:
        pending = pending[:max_partitions]
    results = []
    for p in pending:
        src = source().filter(
            F.pmod(F.xxhash64("conv_id"), F.lit(num_partitions)) == p
        )
        turns = ingest(src).cache()
        rows_in = turns.count()
        rolled = rollup_points(turn_metrics(turns), tiers=tiers).cache()
        stats = rolled.agg(
            F.count("*").alias("points_out"),
            F.coalesce(F.sum(F.length("chunk")), F.lit(0)).alias("bytes"),
        ).collect()[0]
        for tier in tiers:
            store.write_partition(rolled.filter(F.col("tier") == tier), tier, p)
        row = {
            "job_id": job_id,
            "partition_id": p,
            "rows_in": rows_in,
            "points_out": stats["points_out"],
            "bytes_compressed": stats["bytes"],
            "committed_at": pd.Timestamp(int(time.time() * 1_000_000), unit="us"),
        }
        store.commit_lineage(row)
        results.append(row)
        rolled.unpersist()
        turns.unpersist()
    return results
