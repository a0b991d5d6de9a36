"""LTTB downsampling: endpoint retention, shape preservation (peaks
survive), reference-implementation equality, determinism."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mimir_spark.downsample import downsample_lttb, lttb_select


def _lttb_reference(t, v, n_out):
    """Straightforward loop transcription of the published algorithm
    (Steinarsson 2013, fig 4.2) — the oracle for the vectorized one."""
    n = len(t)
    if n_out >= n or n_out < 3:
        return list(range(n))
    bounds = np.linspace(1, n - 1, n_out - 1).astype(int)
    sel = [0]
    a = 0
    for i in range(n_out - 2):
        lo, hi = bounds[i], bounds[i + 1]
        nlo = bounds[i + 1]
        nhi = bounds[i + 2] if i + 2 < len(bounds) else n
        if nlo < nhi:
            bt = float(np.mean(t[nlo:nhi])); bv = float(np.mean(v[nlo:nhi]))
        else:
            bt, bv = float(t[-1]), float(v[-1])
        best, best_area = lo, -1.0
        for j in range(lo, hi):
            area = abs((t[a] - bt) * (v[j] - v[a])
                       - (t[a] - t[j]) * (bv - v[a]))
            if area > best_area:
                best, best_area = j, area
        sel.append(best)
        a = best
    sel.append(n - 1)
    return sel


def test_lttb_matches_reference_loop():
    rng = np.random.default_rng(11)
    t = np.sort(rng.integers(0, 10_000_000, size=500)).astype(float)
    v = rng.standard_normal(500).cumsum()
    for n_out in (3, 10, 57, 499, 500, 600):
        got = lttb_select(t.astype(np.int64), v, n_out).tolist()
        want = _lttb_reference(t, v, n_out)
        assert got == want, n_out


def test_lttb_keeps_endpoints_and_peaks():
    t = np.arange(1000, dtype=np.int64)
    v = np.zeros(1000)
    v[137] = 100.0   # a spike an averaging downsample would flatten
    v[731] = -50.0
    idx = lttb_select(t, v, 20)
    assert idx[0] == 0 and idx[-1] == 999
    assert 137 in idx and 731 in idx
    assert len(idx) == 20


def test_downsample_lttb_distributed(spark):
    rng = np.random.default_rng(5)
    rows = []
    base = pd.Timestamp("2026-01-01")
    for sk in ("s1", "s2"):
        vals = rng.standard_normal(400).cumsum()
        for i in range(400):
            rows.append(("conv", sk, "m", base + pd.Timedelta(seconds=i),
                         float(vals[i])))
    pdf = pd.DataFrame(rows, columns=["kind", "series_key", "metric",
                                      "ts", "v"])
    df = spark.createDataFrame(pdf)
    out = downsample_lttb(df, 50).toPandas()
    assert set(out.groupby("series_key").size()) == {50}
    # per-series result equals the driver-side selection on sorted data
    for sk, g in pdf.groupby("series_key"):
        g = g.sort_values("ts").reset_index(drop=True)
        idx = lttb_select(g["ts"].to_numpy().astype("datetime64[us]")
                          .astype(np.int64),
                          g["v"].to_numpy(), 50)
        want = g.iloc[idx][["ts", "v"]].reset_index(drop=True)
        got = out[out.series_key == sk].sort_values("ts") \
            [["ts", "v"]].reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want)
    # determinism
    again = downsample_lttb(df, 50).toPandas().sort_values(
        ["series_key", "ts"]).reset_index(drop=True)
    first = out.sort_values(["series_key", "ts"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(first, again)


def test_downsample_lttb_duplicate_timestamps_deterministic(spark):
    """Rows sharing a timestamp must not make selection depend on
    shuffle arrival order: the (ts, v) sort key pins them."""
    rows = []
    base = pd.Timestamp("2026-03-01")
    rng = np.random.default_rng(9)
    for i in range(300):
        # every third timestamp duplicated with a different value
        t = base + pd.Timedelta(seconds=i // 3)
        rows.append(("conv", "dup", "m", t, float(rng.standard_normal())))
    pdf = pd.DataFrame(rows, columns=["kind", "series_key", "metric",
                                      "ts", "v"])
    a = downsample_lttb(spark.createDataFrame(pdf), 40) \
        .toPandas().sort_values(["ts", "v"]).reset_index(drop=True)
    b = downsample_lttb(spark.createDataFrame(pdf).repartition(7), 40) \
        .toPandas().sort_values(["ts", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_downsample_lttb_rejects_tiny_budget(spark):
    pdf = pd.DataFrame({"kind": ["c"], "series_key": ["s"],
                        "metric": ["m"],
                        "ts": [pd.Timestamp("2026-01-01")], "v": [1.0]})
    df = spark.createDataFrame(pdf)
    with pytest.raises(ValueError):
        downsample_lttb(df, 2)  # rejected at plan-build time
