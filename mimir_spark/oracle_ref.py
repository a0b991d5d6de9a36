"""Deliberately naive pandas reference implementation (the golden oracle).

Plays the role of the reference's cross-backend consistency checks
(mimir-test/.../TestQueries.java:76-126): an independent, reviewable,
loop-level implementation of the exact rollup semantics that the Spark
engine must match bit-for-bit after chunk decode.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from . import codec
from .rollup import TIER_US

_WS = re.compile(r"[ \t\n\r]+")


def token_count(text) -> int:
    if text is None or (isinstance(text, float) and np.isnan(text)):
        return 0
    t = text.strip()
    return 0 if not t else len(_WS.split(t))


def dedup_turns(pdf: pd.DataFrame) -> pd.DataFrame:
    """One row per (conv_id, turn_idx): min by (ts, role, tool, n_tok,
    md5(text)) — the canonical survivor spec. n_tok before the hash so
    the engine's narrow path (which sees only n_tok) picks a
    metric-equivalent survivor."""
    import hashlib

    key_cols = ["conv_id", "turn_idx"]
    out = pdf.assign(
        _ntok=pdf["text"].map(token_count),
        _tb=pdf["text"].map(
            lambda t: None if t is None else hashlib.md5(t.encode()).hexdigest()
        ),
    )
    sort_cols = key_cols + ["ts", "role", "tool", "_ntok", "_tb"]
    out = out.sort_values(sort_cols, na_position="last", kind="mergesort")
    return (
        out.drop_duplicates(key_cols, keep="first")
        .drop(columns=["_ntok", "_tb"]).reset_index(drop=True)
    )


def turn_metrics(pdf: pd.DataFrame) -> pd.DataFrame:
    """Row-per-(series, point) explode — same rules as ingest.turn_metrics."""
    rows = []
    known_roles = {"user", "assistant", "tool"}
    for r in pdf.itertuples(index=False):
        tok = float(token_count(r.text))
        base = (r.ts, r.conv_id, r.turn_idx)
        rows.append(("conv", r.conv_id, "turn_rate", *base, 1.0))
        rows.append(("conv", r.conv_id, "token_volume", *base, tok))
        if r.role is not None and not (isinstance(r.role, float) and np.isnan(r.role)):
            rm = f"role_mix_{r.role}" if r.role in known_roles else "role_mix_other"
            rows.append(("conv", r.conv_id, rm, *base, 1.0))
        if r.tool is not None and not (isinstance(r.tool, float) and np.isnan(r.tool)):
            rows.append(("tool", r.tool, "turn_rate", *base, 1.0))
            rows.append(("tool", r.tool, "token_volume", *base, tok))
    return pd.DataFrame(
        rows,
        columns=["kind", "series_key", "metric", "ts", "conv_id", "turn_idx", "v"],
    )


def rollup(points: pd.DataFrame, tier: str) -> pd.DataFrame:
    """Naive per-group rollup at one tier, chunks included."""
    unit = TIER_US[tier]
    pts = points.sort_values(
        ["kind", "series_key", "metric", "ts", "conv_id", "turn_idx"],
        kind="mergesort",
    ).reset_index(drop=True)
    ts_us = pts["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    pts = pts.assign(_ts_us=ts_us, bucket_us=ts_us - ts_us % unit)
    out = []
    for (kind, key, metric, bucket), g in pts.groupby(
        ["kind", "series_key", "metric", "bucket_us"], sort=True
    ):
        v = g["v"].to_numpy(dtype=np.float64)
        out.append({
            "tier": tier, "kind": kind, "series_key": key, "metric": metric,
            "bucket_ts": np.int64(bucket).astype("datetime64[us]"),
            "cnt": len(g),
            "sum_v": float(np.sum(v)),
            "min_v": float(np.min(v)),
            "max_v": float(np.max(v)),
            "last_v": float(v[-1]),
            "chunk": codec.encode_chunk(g["_ts_us"].to_numpy(), v),
        })
    return pd.DataFrame(out)


def rollup_transcripts(pdf: pd.DataFrame, tiers=("1m", "1h", "1d")) -> pd.DataFrame:
    """Full naive pipeline: dedup -> metrics -> per-tier rollups."""
    points = turn_metrics(dedup_turns(pdf))
    return pd.concat([rollup(points, t) for t in tiers], ignore_index=True)


def gapfill(rollup_pdf: pd.DataFrame, tier: str, value_col: str = "sum_v",
            method: str = "locf") -> pd.DataFrame:
    """Naive loop gap-fill oracle matching gapfill.gapfill semantics."""
    unit = TIER_US[tier]
    out = []
    for (kind, key, metric), g in rollup_pdf.groupby(
        ["kind", "series_key", "metric"], sort=True
    ):
        g = g.sort_values("bucket_ts")
        b_us = g["bucket_ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        obs = dict(zip(b_us, g[value_col].astype(float)))
        grid = np.arange(b_us.min(), b_us.max() + unit, unit)
        known_ts = np.array(sorted(obs))
        for t in grid:
            if t in obs:
                out.append((kind, key, metric, t, obs[t], False))
                continue
            prev = known_ts[known_ts < t]
            nxt = known_ts[known_ts > t]
            if method == "locf":
                val = obs[prev[-1]] if len(prev) else None
            else:
                if len(prev) and len(nxt):
                    p, nx = prev[-1], nxt[0]
                    # timestamps enter the formula in SECONDS (Spark
                    # casts timestamp -> double as epoch seconds), so
                    # the float rounding matches bit-for-bit
                    ps, ns, ts_ = p / 1e6, nx / 1e6, t / 1e6
                    val = obs[p] + (obs[nx] - obs[p]) * (ts_ - ps) / (ns - ps)
                else:
                    val = None
            out.append((kind, key, metric, t, val, True))
    pdf = pd.DataFrame(
        out, columns=["kind", "series_key", "metric", "bucket_ts", value_col, "filled"]
    )
    pdf["bucket_ts"] = pdf["bucket_ts"].astype("datetime64[us]")
    return pdf
