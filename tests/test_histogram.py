"""Quantile-histogram tiers (mimir_spark.histogram): bin-count oracle
vs DuckDB, exact mergeability (cascade == direct, step merge ==
direct), relative-error guarantee vs numpy order statistics, store
round-trip (write / compact / expire / query_range_quantile), and the
no-Python plan assertion for the serving path."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mimir_spark import histogram as H
from mimir_spark.ingest import ingest, turn_metrics
from mimir_spark.lineage import TieredStore


def _points_pdf(n: int = 12000, seed: int = 7) -> pd.DataFrame:
    """Deterministic raw-points frame spanning 2 days, 2 series, with
    heavy-tailed positives plus negatives and exact zeros (all three
    DDSketch stores exercised)."""
    rng = np.random.default_rng(seed)
    ts = (pd.Timestamp("2026-01-01", tz="UTC")
          + pd.to_timedelta(rng.integers(0, 2 * 86400, n), unit="s"))
    vals = np.concatenate([
        np.round(rng.lognormal(3.0, 1.5, n - 400), 3),
        -np.round(rng.lognormal(1.0, 1.0, 200), 3),
        np.zeros(200),
    ])
    rng.shuffle(vals)
    return pd.DataFrame({
        "kind": "tool",
        "series_key": rng.choice(["bash", "web"], n),
        "metric": "tokens",
        "ts": ts,
        "v": vals,
    })


@pytest.fixture(scope="module")
def pts_pdf() -> pd.DataFrame:
    return _points_pdf()


@pytest.fixture(scope="module")
def pts(spark, pts_pdf):
    return spark.createDataFrame(pts_pdf)


def _sorted_rows(df):
    return df.orderBy("kind", "series_key", "metric",
                      "bucket_ts").collect()


def test_bin_counts_match_duckdb_oracle(spark, pts, pts_pdf):
    """The exploded positive-store bins equal an independent DuckDB
    computation of ceil(ln(v)/ln(gamma)) counts per (series, hour) —
    pins the bin grid itself, not just internal consistency. Values
    are generated off bin boundaries (3-decimal lognormals), so the
    two engines' float logs cannot disagree on ceil."""
    import duckdb

    alpha = 0.01
    gamma = H.gamma_of(alpha)
    got = (H._explode_bins(H.rollup_histogram(pts, "1h", alpha=alpha))
           .filter(F.col("sgn") == 1)
           .select("series_key", "bucket_ts", "idx", "c")
           .toPandas()
           .sort_values(["series_key", "bucket_ts", "idx"])
           .reset_index(drop=True))
    con = duckdb.connect()
    con.register("pts", pts_pdf.assign(ts=pts_pdf["ts"].dt.tz_localize(None)))
    want = con.sql(f"""
        SELECT series_key, date_trunc('hour', ts) AS bucket_ts,
               CAST(ceil(ln(v) / ln({gamma!r})) AS INT) AS idx,
               count(*) AS c
        FROM pts WHERE v > 0
        GROUP BY ALL ORDER BY series_key, bucket_ts, idx
    """).df()
    con.close()
    assert len(got) == len(want) > 100
    assert (got["idx"].to_numpy() == want["idx"].to_numpy()).all()
    assert (got["c"].to_numpy() == want["c"].to_numpy()).all()
    got_b = got["bucket_ts"].dt.tz_localize(None) \
        if got["bucket_ts"].dt.tz is not None else got["bucket_ts"]
    assert (got_b.to_numpy() == want["bucket_ts"].to_numpy()).all()


def test_cascade_equals_direct(spark, pts):
    """cascade_histogram(1m -> 1h) and (1h -> 1d) are EXACT: identical
    rows to histogramming the raw points at the coarser tier — bin
    counts add losslessly, the property that makes this a continuous
    aggregate."""
    h1m = H.rollup_histogram(pts, "1m")
    assert _sorted_rows(H.cascade_histogram(h1m, "1h")) == \
        _sorted_rows(H.rollup_histogram(pts, "1h"))
    assert _sorted_rows(H.cascade_histogram(
        H.rollup_histogram(pts, "1h"), "1d")) == \
        _sorted_rows(H.rollup_histogram(pts, "1d"))


def test_step_merge_equals_direct(spark, pts_pdf, pts):
    """histogram_over_step(1h tier, 2h) == histogramming raw points
    into epoch-aligned 2h buckets directly."""
    got = _sorted_rows(H.histogram_over_step(
        H.rollup_histogram(pts, "1h"), 7200))
    raw = pts_pdf.copy()
    raw["ts"] = raw["ts"].dt.floor("2h")
    direct = spark.createDataFrame(raw)
    want = _sorted_rows(
        H.rollup_histogram(direct, "1h")
        .withColumn("tier", F.lit("7200s")))
    assert got == want and len(got) > 0


def test_quantile_relative_error_bound(spark, pts, pts_pdf):
    """Every estimated quantile is within alpha relative error of the
    exact order statistic (numpy percentile, method='lower') per
    (series, 1h bucket) — across positives, negatives, and zeros."""
    qs = {"q00": 0.0, "q25": 0.25, "q50": 0.5, "q90": 0.9,
          "q99": 0.99, "q100": 1.0}
    est = H.with_quantiles(H.rollup_histogram(pts, "1h"), qs).toPandas()
    raw = pts_pdf.copy()
    raw["bucket_ts"] = raw["ts"].dt.floor("h")
    checked = 0
    for _, row in est.iterrows():
        b = row["bucket_ts"]
        if b.tz is None:
            b = b.tz_localize("UTC")
        sub = raw[(raw["series_key"] == row["series_key"])
                  & (raw["bucket_ts"] == b)]["v"].to_numpy()
        assert len(sub) == row["cnt"]
        for name, q in qs.items():
            exact = float(np.percentile(sub, q * 100, method="lower"))
            got = row[name]
            if exact == 0.0:
                assert got == 0.0, (name, got)
            else:
                rel = abs(got - exact) / abs(exact)
                assert rel <= 0.0101, (name, exact, got, rel)
                checked += 1
    assert checked > 200


def test_mixed_alpha_never_merges(spark, pts):
    """Histograms built under different alphas sit on different bin
    grids; the merge keys on alpha so they surface as distinct rows
    instead of summing incompatible bins."""
    a = H.rollup_histogram(pts, "1h", alpha=0.01)
    b = H.rollup_histogram(pts, "1h", alpha=0.05)
    merged = H.cascade_histogram(a.unionByName(b), "1d")
    per_alpha = (merged.groupBy("alpha").count().orderBy("alpha")
                 .collect())
    assert len(per_alpha) == 2
    assert per_alpha[0]["count"] == per_alpha[1]["count"] > 0


def test_alpha_validation():
    with pytest.raises(ValueError):
        H.gamma_of(0.0)
    with pytest.raises(ValueError):
        H.gamma_of(1.0)


def test_with_quantiles_rejects_bad_q(spark, pts):
    with pytest.raises(ValueError):
        H.with_quantiles(H.rollup_histogram(pts, "1d"),
                         {"bad": 1.5}).columns


def test_store_roundtrip_compact_and_expire(spark, pts, tmp_path):
    """write_hist_tier -> read_hist_tier round-trips; compact_hist_tier
    derives 1d from 1h equal to the direct cascade; expire() ages the
    histogram tier's date partitions with the aggregate tier's."""
    s = TieredStore(tmp_path / "store")
    h1h = H.rollup_histogram(pts, "1h")
    s.write_hist_tier(h1h, "1h")
    back = s.read_hist_tier(spark, "1h").drop("bucket_date")
    assert _sorted_rows(back.select(*H._OUT_COLS)) == _sorted_rows(h1h)

    n = s.compact_hist_tier(spark, "1h", "1d")
    assert n > 0
    got_1d = s.read_hist_tier(spark, "1d").drop("bucket_date")
    assert _sorted_rows(got_1d.select(*H._OUT_COLS)) == \
        _sorted_rows(H.cascade_histogram(h1h, "1d"))

    dates = sorted(d.name.split("=", 1)[1]
                   for d in s.hist_dir("1h").glob("bucket_date=*"))
    assert len(dates) == 2
    dropped = s.expire("1h", dates[1])
    assert any("hist=1h" in d for d in dropped)
    left = sorted(d.name.split("=", 1)[1]
                  for d in s.hist_dir("1h").glob("bucket_date=*"))
    assert left == [dates[1]]


def test_query_range_quantile_end_to_end(spark, t_small_df, tmp_path):
    """Persisted 1h histogram tier over the transcript fixture ->
    query_range_quantile at a 2h step: estimates within alpha of exact
    per-(series, 2h) numpy quantiles; tier auto-selected; the plan is
    pure Catalyst (no Python eval, no Arrow UDF) and keeps
    bucket_date partition pruning available."""
    from mimir_spark.read_path import query_range_quantile

    points = turn_metrics(ingest(t_small_df)) \
        .filter(F.col("kind") == "tool")
    s = TieredStore(tmp_path / "store")
    s.write_hist_tier(H.rollup_histogram(points, "1h"), "1h")

    df = query_range_quantile(spark, s, "turn_rate", step="2h",
                              kind="tool")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan \
        and "ArrowEvalPython" not in plan
    got = df.toPandas().sort_values(
        ["series_key", "bucket_ts"]).reset_index(drop=True)
    assert len(got) > 0

    raw = points.filter(F.col("metric") == "turn_rate").select(
        "series_key", "ts", "v").toPandas()
    raw["bucket_ts"] = raw["ts"].dt.floor("2h")
    if raw["bucket_ts"].dt.tz is not None:
        raw["bucket_ts"] = raw["bucket_ts"].dt.tz_localize(None)
    for _, row in got.iterrows():
        b = row["bucket_ts"]
        if b.tz is not None:
            b = b.tz_localize(None)
        sub = raw[(raw["series_key"] == row["series_key"])
                  & (raw["bucket_ts"] == b)]["v"].to_numpy()
        assert len(sub) == row["cnt"] > 0
        for name, q in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
            exact = float(np.percentile(sub, q * 100, method="lower"))
            if exact == 0.0:
                assert row[name] == 0.0
            else:
                assert abs(row[name] - exact) / abs(exact) <= 0.0101

    # absent tier -> actionable error
    empty = TieredStore(tmp_path / "empty")
    with pytest.raises(ValueError, match="no histogram tier"):
        query_range_quantile(spark, empty, "turn_rate")


def test_rollup_job_histogram_flag(spark, t_small_df, tmp_path, capsys):
    """rollup_job --histogram 1h,1d builds the finest tier from one
    extra scan and cascades 1d from 1h; query_job 'quantile' serves
    it."""
    import sys

    sys.path.insert(0, "jobs")
    try:
        import query_job
        import rollup_job
    finally:
        sys.path.pop(0)

    src = str(tmp_path / "src")
    t_small_df.limit(3000).write.parquet(src)
    store_dir = str(tmp_path / "store")
    assert rollup_job.main(["--input", src, "--output", store_dir,
                            "--job-id", "hj", "--partitions", "2",
                            "--histogram", "1d,1h"]) == 0
    out = capsys.readouterr().out
    assert "histogram tier 1h" in out and "histogram tier 1d" in out
    # a fresh full run derives aux tiers from the job's OWN staged
    # narrow turns — no source re-scan — and the staging is cleaned
    # up afterwards
    assert "reusing staged narrow turns" in out
    assert not any((TieredStore(store_dir).root / "_staging").glob("*")) \
        or not (TieredStore(store_dir).root / "_staging").exists()

    s = TieredStore(store_dir)
    # staged-turns input == a from-source computation, row for row
    want_1h = H.rollup_histogram(
        turn_metrics(ingest(spark.read.parquet(src))), "1h")
    assert _sorted_rows(
        s.read_hist_tier(spark, "1h").drop("bucket_date")
        .select(*H._OUT_COLS)) == _sorted_rows(want_1h)
    direct = H.cascade_histogram(
        s.read_hist_tier(spark, "1h").drop("bucket_date"), "1d")
    stored = s.read_hist_tier(spark, "1d").drop("bucket_date")
    assert _sorted_rows(stored.select(*H._OUT_COLS)) == \
        _sorted_rows(direct)

    # an already-committed job (nothing pending -> nothing staged)
    # falls back to one source scan and still writes correct tiers
    store2 = str(tmp_path / "store2")
    assert rollup_job.main(["--input", src, "--output", store2,
                            "--job-id", "hj2", "--partitions", "2"]) == 0
    capsys.readouterr()
    assert rollup_job.main(["--input", src, "--output", store2,
                            "--job-id", "hj2", "--partitions", "2",
                            "--histogram", "1h"]) == 0
    out2 = capsys.readouterr().out
    assert "reusing staged narrow turns" not in out2
    assert _sorted_rows(
        TieredStore(store2).read_hist_tier(spark, "1h")
        .drop("bucket_date").select(*H._OUT_COLS)) == \
        _sorted_rows(want_1h)

    assert query_job.main(["--store", store_dir, "quantile",
                           "--metric", "turn_rate", "--step", "2h",
                           "--q", "0.5,0.99"]) == 0
    out = capsys.readouterr().out
    assert "p50" in out and "p99" in out

    # CLI validation
    with pytest.raises(SystemExit):
        rollup_job.main(["--input", src, "--output", store_dir,
                         "--histogram", "5m"])
    with pytest.raises(SystemExit):
        rollup_job.main(["--input", src, "--output", store_dir,
                         "--hist-alpha", "0.05"])


def test_bin_midpoint_guarantee():
    """Unit check of the estimate rule: for any v in a bin, the
    harmonic midpoint 2*gamma^i/(gamma+1) is within alpha relative
    error — the DDSketch invariant the column expressions encode."""
    alpha = 0.02
    g = H.gamma_of(alpha)
    rng = np.random.default_rng(3)
    v = rng.lognormal(0, 4, 5000)
    idx = np.ceil(np.log(v) / math.log(g))
    est = 2.0 * np.power(g, idx) / (g + 1.0)
    rel = np.abs(est - v) / v
    assert rel.max() <= alpha + 1e-9


def test_compact_job_cascade_hist(spark, t_small_df, tmp_path, capsys):
    """compact_job --cascade-hist derives 1d from a persisted 1h
    histogram tier (equal to the direct cascade), and --since makes a
    re-run incremental: only dates >= since are replaced while older
    coarse dates survive fine-tier expiry — the nightly-maintenance
    loop for the quantile tiers."""
    import sys

    sys.path.insert(0, "jobs")
    try:
        import compact_job
    finally:
        sys.path.pop(0)

    points = turn_metrics(ingest(t_small_df))
    s = TieredStore(tmp_path / "store")
    h1h = H.rollup_histogram(points, "1h")
    s.write_hist_tier(h1h, "1h")
    assert compact_job.main(["--store", str(s.root),
                             "--cascade-hist", "1h:1d"]) == 0
    assert "cascade-hist 1h->1d" in capsys.readouterr().out
    assert _sorted_rows(
        s.read_hist_tier(spark, "1d").drop("bucket_date")
        .select(*H._OUT_COLS)) == _sorted_rows(
            H.cascade_histogram(h1h, "1d"))

    # expire the fine tier's oldest date, then re-cascade since a
    # later date: the 1d row for the expired date must SURVIVE
    dates = sorted(d.name.split("=", 1)[1]
                   for d in s.hist_dir("1h").glob("bucket_date=*"))
    assert len(dates) >= 3
    s.expire("1h", dates[1])
    assert compact_job.main(["--store", str(s.root),
                             "--cascade-hist", "1h:1d",
                             "--since", dates[2]]) == 0
    left = sorted(d.name.split("=", 1)[1]
                  for d in s.hist_dir("1d").glob("bucket_date=*"))
    assert left == dates  # expired-fine date still served at 1d


def test_fractions_match_exact_within_boundary_mass(spark, pts,
                                                    pts_pdf):
    """with_fractions: estimated P(v <= t) per (series, 1h bucket)
    equals the exact fraction up to the mass whose true values sit in
    the threshold's alpha error band (the only bins the estimate can
    misclassify) — plus exact cases: t=0 counts negatives+zeros, a
    t below every value gives 0, above every value gives 1."""
    ths = {"le_50": 50.0, "le_0": 0.0, "le_lo": -1e12, "le_hi": 1e12}
    est = H.with_fractions(H.rollup_histogram(pts, "1h"), ths).toPandas()
    raw = pts_pdf.copy()
    raw["bucket_ts"] = raw["ts"].dt.floor("h")
    a = 0.01
    for _, row in est.iterrows():
        b = row["bucket_ts"]
        if b.tz is None:
            b = b.tz_localize("UTC")
        sub = raw[(raw["series_key"] == row["series_key"])
                  & (raw["bucket_ts"] == b)]["v"].to_numpy()
        assert row["le_lo"] == 0.0
        assert row["le_hi"] == 1.0
        assert row["le_0"] == float((sub <= 0).mean())
        exact = float((sub <= 50.0).mean())
        band = float(((sub >= 50.0 / (1 + 3 * a))
                      & (sub <= 50.0 * (1 + 3 * a))).mean())
        assert abs(row["le_50"] - exact) <= band + 1e-12, \
            (exact, row["le_50"], band)


def test_query_range_quantile_fractions(spark, t_small_df, tmp_path,
                                        capsys):
    """query_range_quantile(fractions=...) serves SLO fractions from
    the persisted tier; the CLI --le flag surfaces them."""
    import sys

    from mimir_spark.read_path import query_range_quantile

    points = turn_metrics(ingest(t_small_df)) \
        .filter(F.col("kind") == "tool")
    s = TieredStore(tmp_path / "store")
    s.write_hist_tier(H.rollup_histogram(points, "1h"), "1h")
    got = query_range_quantile(spark, s, "token_volume", step="2h",
                               kind="tool",
                               fractions={"le_100": 100.0}).toPandas()
    assert "le_100" in got.columns
    assert ((got["le_100"] >= 0) & (got["le_100"] <= 1)).all()
    assert got["le_100"].nunique() > 1  # non-degenerate

    sys.path.insert(0, "jobs")
    try:
        import query_job
    finally:
        sys.path.pop(0)
    assert query_job.main(["--store", str(s.root), "quantile",
                           "--metric", "token_volume", "--step", "2h",
                           "--q", "0.9", "--le", "100"]) == 0
    assert "le_100" in capsys.readouterr().out


@pytest.mark.parametrize("case", [
    "single", "constant", "two_far", "wide_range", "all_negative",
    "seeded_0", "seeded_1", "seeded_2",
])
def test_quantile_fuzz_adversarial_shapes(spark, case):
    """Seeded sweep over adversarial value distributions — single
    point, zero variance, extreme dynamic range (1e-9..1e12), all
    negative, random heavy-tail mixes — every quantile estimate stays
    within alpha relative error of numpy's order statistic."""
    rng = np.random.default_rng(abs(hash(case)) % 2**32)
    if case == "single":
        v = np.array([42.75])
    elif case == "constant":
        v = np.full(500, 7.125)
    elif case == "two_far":
        v = np.array([1e-6] * 300 + [1e9] * 200)
    elif case == "wide_range":
        v = 10.0 ** rng.uniform(-9, 12, 2000)
    elif case == "all_negative":
        v = -np.round(rng.lognormal(2, 2, 800), 6)
    else:
        v = np.concatenate([
            np.round(rng.lognormal(rng.uniform(0, 5), rng.uniform(0.5, 3),
                                   700), 6),
            -np.round(rng.lognormal(1, 1, 200), 6),
            np.zeros(100)])
        rng.shuffle(v)
    pdf = pd.DataFrame({
        "kind": "tool", "series_key": "s", "metric": "m",
        "ts": pd.Timestamp("2026-01-01", tz="UTC"), "v": v,
    })
    qs = {f"q{i}": q for i, q in
          enumerate([0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0])}
    row = H.with_quantiles(
        H.rollup_histogram(spark.createDataFrame(pdf), "1d"), qs).first()
    assert row["cnt"] == len(v)
    for name, q in qs.items():
        exact = float(np.percentile(v, q * 100, method="lower"))
        got = row[name]
        if exact == 0.0:
            assert got == 0.0, (case, name)
        else:
            rel = abs(got - exact) / abs(exact)
            assert rel <= 0.0101, (case, name, exact, got, rel)


def test_query_range_quantile_agg_routing(spark, t_small_df, tmp_path):
    """query_range(agg='p99') routes to the histogram tier and equals
    query_range_quantile's estimate column-for-column — one dashboard
    verb across additive and sketch-served aggregates; bad specs
    raise."""
    from mimir_spark.read_path import query_range, query_range_quantile

    points = turn_metrics(ingest(t_small_df)) \
        .filter(F.col("kind") == "tool")
    s = TieredStore(tmp_path / "store")
    s.write_hist_tier(H.rollup_histogram(points, "1h"), "1h")

    via_range = query_range(spark, s, "token_volume", agg="p99",
                            step="2h", kind="tool").toPandas() \
        .sort_values(["series_key", "bucket_ts"]).reset_index(drop=True)
    direct = query_range_quantile(spark, s, "token_volume",
                                  qs={"value": 0.99}, step="2h",
                                  kind="tool").toPandas() \
        .sort_values(["series_key", "bucket_ts"]).reset_index(drop=True)
    assert len(via_range) == len(direct) > 0
    assert (via_range["value"].to_numpy()
            == direct["value"].to_numpy()).all()

    with pytest.raises(ValueError, match="outside p0..p100"):
        query_range(spark, s, "token_volume", agg="p150")
    with pytest.raises(ValueError, match="fill is not supported"):
        query_range(spark, s, "token_volume", agg="p50", fill="locf")
    with pytest.raises(ValueError, match="unknown agg"):
        query_range(spark, s, "token_volume", agg="median")
