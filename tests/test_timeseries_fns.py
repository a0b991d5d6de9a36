"""Counter math: delta/increase/rate with reset handling vs a pandas
oracle, bucket-edge correctness of range_increase."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from mimir_spark.functions.timeseries import (range_increase, with_delta,
                                              with_increase, with_rate)


@pytest.fixture(scope="module")
def counter_df(spark):
    # one counter series with two resets, one gauge-ish series
    base = pd.Timestamp("2026-02-01")
    rows = []
    vals = [0, 10, 25, 3, 8, 50, 2, 2, 90]   # resets at 3 and at 2
    for i, v in enumerate(vals):
        rows.append(("conv", "c1", "requests",
                     base + pd.Timedelta(minutes=20 * i), float(v)))
    for i, v in enumerate([5.0, 4.0, 6.5]):
        rows.append(("conv", "c2", "temp",
                     base + pd.Timedelta(minutes=i), v))
    pdf = pd.DataFrame(rows, columns=["kind", "series_key", "metric",
                                      "ts", "v"])
    return spark.createDataFrame(pdf)


def test_delta_increase_rate(spark, counter_df):
    out = with_rate(with_increase(with_delta(counter_df))) \
        .filter("series_key = 'c1'").orderBy("ts").collect()
    vals = [r["v"] for r in out]
    assert vals == [0, 10, 25, 3, 8, 50, 2, 2, 90]
    deltas = [r["delta"] for r in out]
    assert deltas[0] is None and deltas[3] == -22.0
    incs = [r["increase"] for r in out]
    #         -   10  15  reset->3  5  42  reset->2  0   88
    assert incs == [None, 10, 15, 3, 5, 42, 2, 0, 88]
    rates = [r["rate"] for r in out]
    assert rates[0] is None
    assert abs(rates[1] - 10 / 1200) < 1e-12
    assert abs(rates[3] - 3 / 1200) < 1e-12   # reset-aware


def test_rate_zero_interval_null(spark):
    pdf = pd.DataFrame({
        "kind": ["conv"] * 2, "series_key": ["x"] * 2, "metric": ["m"] * 2,
        "ts": [pd.Timestamp("2026-02-01")] * 2, "v": [1.0, 2.0]})
    out = with_rate(spark.createDataFrame(pdf)).collect()
    # duplicate timestamp: both rows NULL (no interval to divide by),
    # never an infinite or garbage rate
    assert all(r["rate"] is None for r in out)


def test_range_increase_bucket_edges(spark, counter_df):
    """Bucket sums use each sample's TRUE previous sample: the total
    over all buckets equals the whole-series reset-aware increase."""
    out = range_increase(counter_df.filter("series_key = 'c1'"), "1h")
    total = sum(r["increase"] or 0 for r in out.collect())
    # whole-series: 10+15+3+5+42+2+0+88
    assert total == 165.0
    # pandas oracle per bucket
    pdf = counter_df.filter("series_key = 'c1'").toPandas() \
        .sort_values("ts").reset_index(drop=True)
    prev = pdf["v"].shift(1)
    inc = np.where(prev.isna(), np.nan,
                   np.where(pdf["v"] >= prev, pdf["v"] - prev, pdf["v"]))
    pdf["inc"] = inc
    want = pdf.groupby(pdf["ts"].dt.floor("h"))["inc"].sum(min_count=1)
    got = {pd.Timestamp(r["bucket_ts"]): r["increase"]
           for r in out.collect()}
    for b, w in want.items():
        g = got[b]
        assert (g is None and np.isnan(w)) or g == w
