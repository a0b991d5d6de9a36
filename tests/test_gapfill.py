"""Gap-fill vs naive oracle + metamorphic invariants (FIXTURES.md §4)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from mimir_spark import oracle_ref
from mimir_spark.gapfill import gapfill
from mimir_spark.ingest import ingest, turn_metrics
from mimir_spark.rollup import rollup_points

KEY = ["kind", "series_key", "metric", "bucket_ts"]


@pytest.fixture(scope="module")
def rollup_1h(spark, t_small_df):
    df = rollup_points(turn_metrics(ingest(t_small_df)), tiers=("1h",)).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def rollup_1h_pdf(rollup_1h):
    return rollup_1h.toPandas()


def _norm(pdf):
    out = pdf.sort_values(KEY, kind="mergesort").reset_index(drop=True)
    out["bucket_ts"] = out["bucket_ts"].astype("datetime64[us]")
    return out


@pytest.mark.parametrize("method", ["locf", "linear"])
def test_gapfill_matches_oracle(rollup_1h, rollup_1h_pdf, method):
    got = _norm(gapfill(rollup_1h, "1h", "sum_v", method).toPandas())
    want = _norm(oracle_ref.gapfill(rollup_1h_pdf, "1h", "sum_v", method))
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_locf_superset_of_raw(rollup_1h, rollup_1h_pdf):
    """Gap-fill output contains every raw bucket with its exact value."""
    got = gapfill(rollup_1h, "1h", "sum_v", "locf").toPandas()
    raw = got[~got["filled"]]
    merged = rollup_1h_pdf.merge(raw, on=KEY, suffixes=("_r", "_g"))
    assert len(merged) == len(rollup_1h_pdf)
    assert (merged["sum_v_r"] == merged["sum_v_g"]).all()


def test_linear_bounded_by_neighbors(rollup_1h):
    got = gapfill(rollup_1h, "1h", "sum_v", "linear").toPandas()
    filled = got[got["filled"] & got["sum_v"].notna()]
    by_series = got.groupby(["kind", "series_key", "metric"])["sum_v"]
    lo, hi = by_series.transform("min"), by_series.transform("max")
    ok = (filled["sum_v"] >= lo[filled.index] - 1e-9) & (
        filled["sum_v"] <= hi[filled.index] + 1e-9
    )
    assert ok.all()


def test_grid_is_dense(rollup_1h):
    got = gapfill(rollup_1h, "1h", "sum_v", "locf").toPandas()
    for _, g in got.groupby(["kind", "series_key", "metric"]):
        b = np.sort(g["bucket_ts"].to_numpy().astype("datetime64[us]").astype(np.int64))
        assert (np.diff(b) == 3_600_000_000).all()


def test_missing_buckets(spark):
    """Gap report: exactly the grid buckets without data, with run
    lengths labelling consecutive gaps."""
    import pandas as pd
    from pyspark.sql import functions as F

    from mimir_spark.gapfill import missing_buckets

    base = pd.Timestamp("2026-04-01 10:00:00")
    have = [0, 1, 4, 5, 9]   # gaps: [2,3] (len 2), [6,7,8] (len 3)
    rows = [("conv", "s1", "m", base + pd.Timedelta(hours=h), 1.0)
            for h in have]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["kind", "series_key", "metric",
                                    "bucket_ts", "sum_v"]))
    got = {(str(r["bucket_ts"]), r["gap_len"])
           for r in missing_buckets(df, "1h").collect()}
    want = {(str(base + pd.Timedelta(hours=h)), n)
            for h, n in [(2, 2), (3, 2), (6, 3), (7, 3), (8, 3)]}
    assert got == want
    # a gapless series reports nothing
    full = spark.createDataFrame(
        pd.DataFrame([("conv", "s2", "m", base + pd.Timedelta(hours=h), 1.0)
                      for h in range(4)],
                     columns=["kind", "series_key", "metric",
                              "bucket_ts", "sum_v"]))
    assert missing_buckets(full, "1h").count() == 0


def test_chunked_grid_crosses_boundary_exactly(spark):
    """The two-level chunked grid (gapfill._GRID_CHUNK buckets per
    sequence array) must reproduce the one-level semantics exactly
    across chunk boundaries: a 1m-tier span of ~4200 buckets (> one
    4096-bucket chunk) with sparse observations matches the naive
    pandas oracle row-for-row."""
    import pandas as pd

    base = pd.Timestamp("2026-01-01 00:00:00")
    have = [0, 7, 4095, 4096, 4097, 4199]  # straddles the chunk edge
    rows = [("conv", "s1", "m", base + pd.Timedelta(minutes=m), float(m))
            for m in have]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["kind", "series_key", "metric",
                                    "bucket_ts", "sum_v"]))
    got = _norm(gapfill(df, "1m", "sum_v", "linear").toPandas())
    want = _norm(oracle_ref.gapfill(df.toPandas(), "1m", "sum_v", "linear"))
    assert len(got) == 4200
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_multi_year_1m_series_grid_is_bounded(spark):
    """A sparse series spanning 2 years at the 1m tier (~1.05M grid
    buckets) gap-fills without materializing a million-element array
    in one row — the exact blowup the chunked grid exists to prevent.
    Verifies the full grid size, chunk-edge continuity, and LOCF
    values at both ends."""
    import pandas as pd
    from pyspark.sql import functions as F

    base = pd.Timestamp("2025-01-01 00:00:00")
    span_min = 2 * 365 * 24 * 60  # 1,051,200 one-minute buckets + 1
    rows = [
        ("conv", "long", "m", base, 1.0),
        ("conv", "long", "m", base + pd.Timedelta(minutes=span_min // 2), 2.0),
        ("conv", "long", "m", base + pd.Timedelta(minutes=span_min), 3.0),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["kind", "series_key", "metric",
                                    "bucket_ts", "sum_v"]))
    filled = gapfill(df, "1m", "sum_v", "locf")
    stats = filled.agg(
        F.count("*").alias("n"),
        F.countDistinct("bucket_ts").alias("nd"),
        F.min("bucket_ts").alias("lo"),
        F.max("bucket_ts").alias("hi"),
    ).first()
    assert stats["n"] == span_min + 1
    assert stats["nd"] == span_min + 1  # dense + duplicate-free
    assert pd.Timestamp(stats["lo"]) == base
    assert pd.Timestamp(stats["hi"]) == base + pd.Timedelta(minutes=span_min)
    probe = {
        pd.Timestamp(r["bucket_ts"]): r["sum_v"]
        for r in filled.filter(
            F.col("bucket_ts").isin(
                [base + pd.Timedelta(minutes=m)
                 for m in (1, span_min // 2 + 1, span_min)])).collect()
    }
    assert probe[base + pd.Timedelta(minutes=1)] == 1.0          # LOCF from lo
    assert probe[base + pd.Timedelta(minutes=span_min // 2 + 1)] == 2.0
    assert probe[base + pd.Timedelta(minutes=span_min)] == 3.0   # real point
