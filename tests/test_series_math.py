"""Cross-series arithmetic (series_binop), rolling z-score anomaly
detection, and top-k series ranking — each against an independent
pandas/numpy oracle, plus plan-shape and CLI coverage."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mimir_spark.functions.timeseries import (detect_anomalies,
                                              series_binop, with_zscore)
from mimir_spark.ingest import ingest, turn_metrics
from mimir_spark.lineage import TieredStore, run_rollup_job
from mimir_spark.read_path import query_topk_series
from mimir_spark.rollup import rollup_aggs


@pytest.fixture(scope="module")
def store(spark, t_small_df, tmp_path_factory):
    s = TieredStore(tmp_path_factory.mktemp("sm") / "store")
    run_rollup_job(spark, lambda: t_small_df, s, "sm", num_partitions=3)
    return s


def test_series_binop_ratio_matches_pandas(spark, t_small_df):
    """tokens-per-turn = token_volume / turn_rate per (series, 1h
    bucket), from the rollup frame — equals the per-bucket pandas
    ratio of exact sums; zero denominators yield NULL rows."""
    points = turn_metrics(ingest(t_small_df))
    tier = rollup_aggs(points, "1h")
    got = series_binop(tier, "token_volume", "turn_rate", "/",
                       out_metric="tokens_per_turn").toPandas()
    assert (got["metric"] == "tokens_per_turn").all()

    raw = points.filter(
        F.col("metric").isin(["token_volume", "turn_rate"])).toPandas()
    raw["bucket_ts"] = raw["ts"].dt.floor("h")
    piv = (raw.pivot_table(index=["kind", "series_key", "bucket_ts"],
                           columns="metric", values="v", aggfunc="sum")
           .dropna().reset_index())
    piv["want"] = np.where(piv["turn_rate"] != 0,
                           piv["token_volume"] / piv["turn_rate"], np.nan)
    key = ["kind", "series_key", "bucket_ts"]
    merged = got.merge(piv, on=key, how="outer", indicator=True)
    assert (merged["_merge"] == "both").all()
    both = merged.dropna(subset=["want"])
    assert len(both) > 50
    assert np.allclose(both["value"].to_numpy(dtype=float),
                       both["want"].to_numpy(), rtol=1e-9)


def test_series_binop_is_one_aggregate_no_join(spark, t_small_df):
    """The binop pivots with conditional aggregation — the plan must
    contain NO join node (the naive translation is a self-join)."""
    tier = rollup_aggs(turn_metrics(ingest(t_small_df)), "1h")
    df = series_binop(tier, "token_volume", "turn_rate", "/")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_series_binop_ops_and_validation(spark):
    pdf = pd.DataFrame({
        "kind": "tool", "series_key": "bash",
        "metric": ["a", "b", "a", "b"],
        "bucket_ts": pd.to_datetime(
            ["2026-01-01", "2026-01-01", "2026-01-02", "2026-01-02"]),
        "sum_v": [6.0, 3.0, 5.0, 0.0],
    })
    df = spark.createDataFrame(pdf)
    for op, want in (("+", 9.0), ("-", 3.0), ("*", 18.0), ("/", 2.0)):
        row = (series_binop(df, "a", "b", op)
               .orderBy("bucket_ts").first())
        assert row["value"] == want, op
    # division by zero -> NULL, not an ANSI error and not inf
    rows = (series_binop(df, "a", "b", "/").orderBy("bucket_ts")
            .collect())
    assert rows[1]["value"] is None
    with pytest.raises(ValueError, match="unknown op"):
        series_binop(df, "a", "b", "%")


def _zscore_oracle(pdf: pd.DataFrame, n: int, min_periods: int
                   ) -> pd.Series:
    """Trailing-window-excluding-current z-score via pandas."""
    def per_series(g):
        prev = g["v"].shift(1)
        mean = prev.rolling(n, min_periods=min_periods).mean()
        sd = prev.rolling(n, min_periods=min_periods).std()
        z = (g["v"] - mean) / sd
        return z.where(sd > 0)
    return (pdf.sort_values("ts")
            .groupby(["kind", "series_key", "metric"], group_keys=False)
            .apply(per_series, include_groups=False))


def test_with_zscore_matches_pandas(spark):
    rng = np.random.default_rng(11)
    n = 600
    pdf = pd.DataFrame({
        "kind": "tool",
        "series_key": rng.choice(["bash", "web", "sql"], n),
        "metric": "tokens",
        "ts": pd.Timestamp("2026-01-01")
        + pd.to_timedelta(np.arange(n) * 60, unit="s"),
        "v": np.round(rng.normal(100, 15, n), 3),
    })
    got = (with_zscore(spark.createDataFrame(pdf), n=20, min_periods=5)
           .toPandas().sort_values(["series_key", "ts"])
           .reset_index(drop=True))
    pdf = pdf.sort_values(["series_key", "ts"]).reset_index(drop=True)
    want = _zscore_oracle(pdf, 20, 5).to_numpy()
    gz = got["zscore"].to_numpy(dtype=float)
    assert np.isnan(want).sum() == got["zscore"].isna().sum()
    m = ~np.isnan(want)
    assert m.sum() > 500
    assert np.allclose(gz[m], want[m], rtol=1e-9)


def test_detect_anomalies_flags_spike_not_constant(spark):
    base = pd.DataFrame({
        "kind": "tool", "series_key": "bash", "metric": "tokens",
        "ts": pd.Timestamp("2026-01-01")
        + pd.to_timedelta(np.arange(60) * 60, unit="s"),
        "v": np.sin(np.arange(60) / 5.0) * 2.0 + 10.0,
    })
    base.loc[40, "v"] = 500.0  # the spike
    flagged = detect_anomalies(spark.createDataFrame(base),
                               threshold=3.0).collect()
    assert [r["ts"] for r in flagged] == [base.loc[40, "ts"]]
    # a spike must not inflate its own baseline: the next sample is
    # back to normal and must NOT be flagged (window excludes current,
    # but includes the spike in ITS baseline -> stddev explodes there,
    # which only ever suppresses, never creates, alerts)

    const = base.assign(v=7.0)
    assert detect_anomalies(spark.createDataFrame(const),
                            threshold=0.1).count() == 0

    with pytest.raises(ValueError):
        with_zscore(spark.createDataFrame(base), min_periods=1)


def test_query_topk_series_matches_exact(spark, t_small_df, store):
    """topk over the full range == exact per-series totals from raw
    points, for sum and avg; bottomk inverts; ordering is
    deterministic under ties (series_key asc)."""
    pts = turn_metrics(ingest(t_small_df)).filter(
        (F.col("kind") == "tool") & (F.col("metric") == "token_volume")
    ).toPandas()
    totals = (pts.groupby("series_key")["v"].sum()
              .sort_values(ascending=False))

    got = query_topk_series(spark, store, "token_volume", k=3,
                            agg="sum", kind="tool").toPandas()
    assert list(got["series_key"]) == list(totals.index[:3])
    assert np.allclose(got["value"], totals.iloc[:3].to_numpy())

    bot = query_topk_series(spark, store, "token_volume", k=2,
                            agg="sum", kind="tool", bottom=True
                            ).toPandas()
    assert list(bot["series_key"]) == list(totals.index[::-1][:2])

    avg = (pts.groupby("series_key")["v"].mean()
           .sort_values(ascending=False))
    got_avg = query_topk_series(spark, store, "token_volume", k=1,
                                agg="avg", kind="tool").toPandas()
    assert got_avg["series_key"][0] == avg.index[0]
    assert np.isclose(got_avg["value"][0], avg.iloc[0])


def test_query_topk_series_range_and_validation(spark, t_small_df,
                                                store):
    """Day-aligned bounds pick the 1d tier; totals equal raw-point
    sums inside the range; misaligned bounds without an explicit tier
    raise; bad agg/k raise."""
    pts = turn_metrics(ingest(t_small_df)).filter(
        (F.col("kind") == "tool") & (F.col("metric") == "token_volume")
    ).toPandas()
    t0, t1 = "2026-01-06", "2026-01-08"
    inside = pts[(pts["ts"] >= t0) & (pts["ts"] < t1)]
    want = (inside.groupby("series_key")["v"].sum()
            .sort_values(ascending=False))
    got = query_topk_series(spark, store, "token_volume", k=2,
                            agg="sum", kind="tool", t0=t0, t1=t1
                            ).toPandas()
    assert list(got["series_key"]) == list(want.index[:2])
    assert np.allclose(got["value"], want.iloc[:2].to_numpy())

    with pytest.raises(ValueError, match="aligns to no stored tier"):
        query_topk_series(spark, store, "token_volume", k=2,
                          t0="2026-01-06 00:30:30")
    # ...but an explicit tier accepts the bounds at ITS resolution
    assert query_topk_series(spark, store, "token_volume", k=2,
                             kind="tool", t0="2026-01-06 00:30:00",
                             tier="1m").count() == 2
    with pytest.raises(ValueError, match="unknown agg"):
        query_topk_series(spark, store, "token_volume", 2, agg="last")
    with pytest.raises(ValueError, match="k must be"):
        query_topk_series(spark, store, "token_volume", 0)


def test_query_job_topk_and_anomaly_verbs(store, capsys):
    import sys

    sys.path.insert(0, "jobs")
    try:
        import query_job
    finally:
        sys.path.pop(0)

    assert query_job.main(["--store", str(store.root), "topk",
                           "--metric", "token_volume", "--k", "3",
                           "--kind", "tool"]) == 0
    out = capsys.readouterr().out
    assert "value" in out

    assert query_job.main(["--store", str(store.root), "anomalies",
                           "--metric", "token_volume", "--step", "1h",
                           "--kind", "tool", "--threshold", "4.0"]) == 0
    out = capsys.readouterr().out
    assert "zscore" in out


def test_seasonal_zscore_vs_pandas_and_diurnal_case(spark):
    """Phase-partitioned baseline == pandas same-phase rolling oracle;
    and the motivating case: a strong diurnal pattern is NOT anomalous
    under the seasonal baseline (every sample matches its phase
    history) while a same-level spike at the WRONG phase is."""
    from mimir_spark.functions.timeseries import with_seasonal_zscore

    # 10 days of hourly samples with a strong daily cycle
    hours = np.arange(240)
    v = 100.0 + 80.0 * np.sin(2 * np.pi * (hours % 24) / 24.0) \
        + np.round(np.random.default_rng(5).normal(0, 1, 240), 3)
    pdf = pd.DataFrame({
        "kind": "tool", "series_key": "bash", "metric": "tokens",
        "ts": pd.Timestamp("2026-01-01")
        + pd.to_timedelta(hours, unit="h"),
        "v": v,
    })
    pdf.loc[9 * 24 + 3, "v"] += 400.0  # spike at 03:00 on day 10

    got = (with_seasonal_zscore(spark.createDataFrame(pdf), 86400,
                                n=5, min_periods=3)
           .toPandas().sort_values("ts").reset_index(drop=True))

    # pandas oracle: same phase = same hour-of-day
    pdf = pdf.sort_values("ts").reset_index(drop=True)
    pdf["phase"] = pdf["ts"].dt.hour

    def per_phase(g):
        prev = g["v"].shift(1)
        mean = prev.rolling(5, min_periods=3).mean()
        sd = prev.rolling(5, min_periods=3).std()
        return ((g["v"] - mean) / sd).where(sd > 0)

    want = (pdf.groupby("phase", group_keys=False)
            .apply(per_phase, include_groups=False)).sort_index()
    gz = got["seasonal_zscore"].to_numpy(dtype=float)
    wz = want.to_numpy(dtype=float)
    m = ~np.isnan(wz)
    assert np.isnan(wz).sum() == got["seasonal_zscore"].isna().sum()
    assert np.allclose(gz[m], wz[m], rtol=1e-9)

    # the diurnal ramp itself is quiet; the off-phase spike screams.
    # threshold 50: a ~unit-variance same-phase baseline cannot reach
    # it by chance, while the +400 spike lands in the hundreds
    flagged = got[np.abs(gz) >= 50.0]
    assert list(flagged["ts"]) == [pdf.loc[9 * 24 + 3, "ts"]]

    with pytest.raises(ValueError):
        with_seasonal_zscore(spark.createDataFrame(pdf.drop(columns="phase")), 0)


def test_query_job_seasonal_anomaly_flag(store, capsys):
    import sys

    sys.path.insert(0, "jobs")
    try:
        import query_job
    finally:
        sys.path.pop(0)
    assert query_job.main(["--store", str(store.root), "anomalies",
                           "--metric", "token_volume", "--step", "1h",
                           "--kind", "tool", "--period", "1d",
                           "--window", "5", "--threshold", "3"]) == 0
    assert "seasonal_zscore" in capsys.readouterr().out


def test_query_topk_series_single_tier_store(spark, t_small_df,
                                             tmp_path):
    """A store holding only the 1m tier (the streaming-built shape)
    still serves topk: auto-selection restricts to tiers present."""
    s = TieredStore(tmp_path / "store")
    run_rollup_job(spark, lambda: t_small_df, s, "one",
                   num_partitions=2, tiers=("1m",))
    got = query_topk_series(spark, s, "token_volume", k=2, kind="tool")
    assert got.count() == 2

    empty = TieredStore(tmp_path / "none")
    with pytest.raises(ValueError, match="no aggregate tier"):
        query_topk_series(spark, empty, "token_volume", k=1)
