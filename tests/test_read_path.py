"""Store read path: chunks decode back to the exact ingested points,
range slicing prunes partitions and trims straddling chunks."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mimir_spark.ingest import dedup_turns, ingest, turn_metrics
from mimir_spark.lineage import TieredStore, run_rollup_job
from mimir_spark.read_path import decode_points, series_points


@pytest.fixture(scope="module")
def store(spark, t_small_df, tmp_path_factory):
    d = tmp_path_factory.mktemp("readpath")
    s = TieredStore(d / "store")

    def source():
        return t_small_df

    run_rollup_job(spark, source, s, "rp", num_partitions=3)
    return s


def test_decode_roundtrip_full_tier(spark, t_small_df, store):
    """decode_points(1m tier) == the exact point set that was rolled
    up (same multiset of (series, ts, v))."""
    want = turn_metrics(ingest(t_small_df)) \
        .select("kind", "series_key", "metric", "ts", "v").toPandas()
    got = decode_points(store.read_tier(spark, "1m")).toPandas()
    key = ["kind", "series_key", "metric", "ts", "v"]
    a = want.sort_values(key, kind="mergesort").reset_index(drop=True)
    b = got.sort_values(key, kind="mergesort").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_series_points_slice(spark, t_small_df, store):
    pts = turn_metrics(ingest(t_small_df)).toPandas()
    sub = pts[(pts.kind == "tool") & (pts.metric == "turn_rate")]
    sk = sub["series_key"].mode()[0]
    sub = sub[sub.series_key == sk].sort_values("ts")
    t0 = sub["ts"].quantile(0.25).floor("min")
    t1 = sub["ts"].quantile(0.75).floor("min")
    got = series_points(spark, store, "1m", kind="tool", series_key=sk,
                        metric="turn_rate", t0=str(t0), t1=str(t1)) \
        .toPandas().sort_values("ts").reset_index(drop=True)
    want = sub[(sub.ts >= t0) & (sub.ts < t1)][
        ["kind", "series_key", "metric", "ts", "v"]] \
        .sort_values("ts").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert len(want) > 0


def test_series_points_prunes_partitions(spark, store, t_small_df):
    pts = turn_metrics(ingest(t_small_df)).toPandas()
    days = sorted(pts["ts"].dt.date.unique())
    assert len(days) > 1
    t0 = str(days[-1])  # last day only
    df = series_points(spark, store, "1m", kind="conv", t0=t0)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "bucket_date" in plan
    got_days = {d for (d,) in
                df.select(F.to_date("ts")).distinct().collect()}
    assert got_days == {days[-1]}
