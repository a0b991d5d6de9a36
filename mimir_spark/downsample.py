"""Visual downsampling: Largest-Triangle-Three-Buckets per series.

Tier rollups downsample by AGGREGATION (mean/min/max per bucket); LTTB
downsamples by SELECTION — it keeps the n_out actual points that best
preserve the series' visual shape (Steinarsson, "Downsampling Time
Series for Visual Representation", 2013). The standard dashboard
fetch: render a 10^7-point series as ~2000 real points.

Spark shape: one shuffle on the series key, then a per-series numpy
pass (applyInPandas). The sequential dependency of LTTB (each bucket's
choice depends on the previously selected point) is inherent to the
algorithm, so the loop is over the n_out OUTPUT buckets — each
iteration is vectorized over its bucket's points, and n_out is small
by definition (it's a pixel budget).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .rollup import POINTS_SCHEMA as LTTB_SCHEMA
from .rollup import SERIES_COLS


def lttb_select(ts_us: np.ndarray, v: np.ndarray, n_out: int) -> np.ndarray:
    """Indices of the LTTB-selected points for ONE sorted series.

    First and last points are always kept; interior points are chosen
    one per bucket, maximizing the triangle area with the previously
    selected point and the NEXT bucket's average (the classic
    formulation). Ties break toward the earliest point (argmax's first
    maximum), so selection is deterministic."""
    if n_out < 3:
        raise ValueError(f"n_out must be >= 3 (first + last + >=1 "
                         f"interior point), got {n_out}")
    n = len(ts_us)
    if n_out >= n:
        return np.arange(n)
    # n_out - 2 interior buckets over points 1..n-2
    bounds = np.linspace(1, n - 1, n_out - 1).astype(np.int64)
    t = ts_us.astype(np.float64)
    sel = np.empty(n_out, dtype=np.int64)
    sel[0] = 0
    a = 0  # previously selected index
    for i in range(n_out - 2):
        lo, hi = bounds[i], bounds[i + 1]
        nlo, nhi = bounds[i + 1], (bounds[i + 2] if i + 2 < len(bounds)
                                   else n)
        # next bucket's average point (the last "bucket" is the final
        # point itself)
        if nlo < nhi:
            bt, bv = t[nlo:nhi].mean(), v[nlo:nhi].mean()
        else:
            bt, bv = t[n - 1], v[n - 1]
        # triangle areas for every candidate in this bucket (x2)
        area = np.abs(
            (t[a] - bt) * (v[lo:hi] - v[a]) - (t[a] - t[lo:hi]) * (bv - v[a])
        )
        a = lo + int(np.argmax(area))
        sel[i + 1] = a
    sel[n_out - 1] = n - 1
    return sel


def downsample_lttb(points: DataFrame, n_out: int,
                    series_cols: tuple[str, ...] = SERIES_COLS) -> DataFrame:
    """LTTB-downsample every series of a (series..., ts, v) frame to at
    most ``n_out`` points. One shuffle (groupBy the series key); each
    series is processed in one vectorized pass, sorted by (ts) with a
    deterministic tie-break so repeated runs select identical points."""
    if n_out < 3:  # validate driver-side: a worker-raised error would
        # surface as an opaque PythonException mid-job
        raise ValueError(f"n_out must be >= 3 (first + last + >=1 "
                         f"interior point), got {n_out}")
    cols = list(series_cols)

    def per_series(pdf: pd.DataFrame) -> pd.DataFrame:
        # (ts, v) sort key: ts alone leaves duplicate-timestamp rows in
        # shuffle arrival order, which is run-dependent
        pdf = pdf.sort_values(["ts", "v"], kind="mergesort") \
            .reset_index(drop=True)
        ts_us = pdf["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        v = pdf["v"].to_numpy(dtype=np.float64)
        idx = lttb_select(ts_us, v, n_out)
        return pdf.iloc[idx][cols + ["ts", "v"]]

    return (
        points.select(*cols, "ts", "v")
        .groupBy(*cols)
        .applyInPandas(per_series, LTTB_SCHEMA)
    )
