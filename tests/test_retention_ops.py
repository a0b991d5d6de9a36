"""Document-mode queries, tombstone overlay, tier expiry, pluggable
series extractors."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mimir_spark.ingest import ingest, metric_entry, turn_metrics
from mimir_spark.operators.hits import conversation_stats, document_query
from mimir_spark.retention import apply_tombstones, delete_conversations, expire_buckets
from mimir_spark.rollup import rollup_points


@pytest.fixture(scope="module")
def turns(spark, t_small_df):
    df = ingest(t_small_df).cache()
    df.count()
    return df


def test_document_query_shrinks_and_spans(turns):
    hits = document_query(turns, F.col("n_tool_turns") >= 3).toPandas()
    stats = conversation_stats(turns).toPandas()
    want = stats[stats.n_tool_turns >= 3]
    assert set(hits.conv_id) == set(want.conv_id)
    assert 0 < len(hits) < len(stats)  # strictly shrinks (TestQueries:450-470)
    merged = hits.merge(stats, on="conv_id")
    assert (merged["len"] == merged["n_turns"]).all()
    assert (merged["pos"] == 0).all()


def test_tombstone_overlay(spark, turns):
    empty = spark.createDataFrame([], "conv_id string")
    stones = delete_conversations(empty, ["conv-00000003", "conv-00000007"])
    filtered = apply_tombstones(turns, stones)
    got = {r["conv_id"] for r in filtered.select("conv_id").distinct().collect()}
    assert "conv-00000003" not in got and "conv-00000007" not in got
    assert filtered.count() == turns.filter(
        ~F.col("conv_id").isin("conv-00000003", "conv-00000007")).count()
    # idempotent re-delete
    stones2 = delete_conversations(stones, ["conv-00000003"])
    assert stones2.count() == 2


def test_expire_buckets(spark, turns):
    rolled = rollup_points(turn_metrics(turns), tiers=("1h", "1d")).cache()
    cut = rolled.filter("tier='1h'").agg(
        F.expr("percentile_approx(cast(bucket_ts as double), 0.5)")).collect()[0][0]
    import datetime
    cutoff = datetime.datetime.utcfromtimestamp(cut).strftime("%Y-%m-%d %H:%M:%S")
    kept = expire_buckets(rolled, {"1h": cutoff})
    pdf = kept.toPandas()
    h1 = pdf[pdf.tier == "1h"]
    assert (h1["bucket_ts"] >= cutoff).all()
    # untouched tier keeps everything
    assert len(pdf[pdf.tier == "1d"]) == rolled.filter("tier='1d'").count()
    rolled.unpersist()


def test_custom_series_extractor(turns):
    """A user-supplied extractor rides the same explode — e.g. a
    per-role token-volume family."""
    extra = lambda df: metric_entry(  # noqa: E731
        F.lit("role"), F.col("role"), F.lit("token_volume"),
        F.col("n_tok") if "n_tok" in df.columns else
        F.lit(None),
    )
    from mimir_spark.ingest import narrow_turns, dedup_turns

    narrow = dedup_turns(narrow_turns(turns).repartition("conv_id"))
    points = turn_metrics(narrow, extractors=[extra])
    kinds = {r["kind"] for r in points.select("kind").distinct().collect()}
    assert kinds == {"conv", "tool", "role"}
    role_pts = points.filter("kind = 'role'")
    assert role_pts.count() == narrow.count()  # one per turn


def test_table_shim_roundtrip(spark, tmp_path):
    """sources.tables: parquet path branch round-trips with
    partitioning; Iceberg branch is config-gated (no jars here)."""
    from mimir_spark.sources.tables import (iceberg_available, read_table,
                                            write_table)

    assert iceberg_available(spark) is False
    df = spark.range(0, 20).withColumn("part", (F.col("id") % 2).cast("int"))
    path = str(tmp_path / "t")
    write_table(df, path, partition_by=["part"])
    back = read_table(spark, path)
    assert back.count() == 20
    assert sorted(back.columns) == ["id", "part"]


def test_retention_policy(spark, tmp_path):
    """Per-tier TTL policy drops exactly the partitions older than
    as_of - keep, per tier, deterministically from the logical date."""
    from mimir_spark.fixtures import transcripts_df
    from mimir_spark.lineage import (TieredStore, apply_retention,
                                     parse_retention, run_rollup_job)

    assert parse_retention("30d") == 30
    assert parse_retention("2w") == 14
    with pytest.raises(ValueError):
        parse_retention("3h")

    store = TieredStore(tmp_path / "ret")
    run_rollup_job(spark, lambda: transcripts_df(spark, 150), store,
                   "retjob", num_partitions=2)
    import datetime

    dates = sorted({p.name.split("=")[1]
                    for p in (store.tier_dir("1m")).glob("p=*/bucket_date=*")})
    assert len(dates) >= 3
    # keep only the last day of 1m data; keep everything in 1h
    as_of = dates[-1]
    keep_days = 1
    dropped = apply_retention(
        store, {"1m": f"{keep_days}d", "1h": "520w"}, as_of)
    # exact-N: "1d" keeps ONLY the as_of day
    cutoff = as_of
    left = sorted({p.name.split("=")[1]
                   for p in (store.tier_dir("1m")).glob("p=*/bucket_date=*")})
    assert all(d >= cutoff for d in left)
    assert len(dropped["1m"]) > 0
    assert dropped["1h"] == []
    with pytest.raises(ValueError):
        apply_retention(store, {"5s": "1d"}, as_of)


def test_compact_job_retain_cli(spark, tmp_path, capsys):
    from jobs.compact_job import main as compact_main
    from mimir_spark.fixtures import transcripts_df
    from mimir_spark.lineage import TieredStore, run_rollup_job

    store = TieredStore(tmp_path / "retcli")
    run_rollup_job(spark, lambda: transcripts_df(spark, 120), store,
                   "retclijob", num_partitions=2, tiers=("1m", "1d"))
    dates = sorted({p.name.split("=")[1]
                    for p in store.tier_dir("1m").glob("p=*/bucket_date=*")})
    rc = compact_main(["--store", str(tmp_path / "retcli"),
                       "--retain", "1m:1d", "--as-of", dates[-1]])
    assert rc == 0
    out = capsys.readouterr().out
    assert "retain 1m (1d):" in out
