"""Committed-golden-file comparison (FIXTURES.md §3): the Spark engine
must reproduce goldens/*.parquet (produced once by the naive pandas
oracle) bit-for-bit after chunk decode — the north rule's hard gate."""

from __future__ import annotations

import json
import pathlib

import numpy as np
import pandas as pd
import pytest

from mimir_spark import codec
from mimir_spark.gapfill import gapfill
from mimir_spark.ingest import ingest, turn_metrics
from mimir_spark.rollup import rollup_points

GOLDEN_DIR = pathlib.Path(__file__).resolve().parent.parent / "goldens"
KEY = ["kind", "series_key", "metric", "bucket_ts"]
AGGS = ["cnt", "sum_v", "min_v", "max_v", "last_v"]


@pytest.fixture(scope="module")
def engine_rollup(spark, t_small_df):
    df = rollup_points(turn_metrics(ingest(t_small_df))).cache()
    df.count()
    return df


@pytest.mark.parametrize("tier", ["1m", "1h", "1d"])
def test_tier_golden(engine_rollup, tier):
    want = pd.read_parquet(GOLDEN_DIR / f"tier_{tier}.parquet")
    got = (
        engine_rollup.filter(f"tier = '{tier}'").toPandas()
        .sort_values(KEY, kind="mergesort").reset_index(drop=True)
    )
    got["bucket_ts"] = got["bucket_ts"].astype("datetime64[us]")
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got[KEY + AGGS], want[KEY + AGGS],
                                  check_dtype=False)
    for g, w in zip(got["chunk"], want["chunk"]):
        gt, gv = codec.decode_chunk(bytes(g))
        wt, wv = codec.decode_chunk(bytes(w))
        assert np.array_equal(gt, wt)
        assert np.array_equal(gv.view(np.uint64), wv.view(np.uint64))


@pytest.mark.parametrize("method", ["locf", "linear"])
def test_gapfill_golden(engine_rollup, method):
    want = pd.read_parquet(GOLDEN_DIR / f"gapfill_{method}.parquet")
    got = (
        gapfill(engine_rollup.filter("tier = '1h'"), "1h", "sum_v", method)
        .toPandas().sort_values(KEY, kind="mergesort").reset_index(drop=True)
    )
    got["bucket_ts"] = got["bucket_ts"].astype("datetime64[us]")
    pd.testing.assert_frame_equal(got, want[got.columns], check_dtype=False)


def test_chunk_byte_goldens():
    """Codec output is format-frozen: byte lengths and prefixes of the
    edge-series chunks must never drift (version bump required)."""
    from tests.test_codec import EDGE_SERIES

    gold = json.loads((GOLDEN_DIR / "chunk_roundtrip.json").read_text())
    for name, (ts, vals) in EDGE_SERIES.items():
        buf = codec.encode_chunk(np.array(ts, np.int64), np.array(vals, np.float64))
        assert len(buf) == gold[name]["bytes"], name
        assert buf[:24].hex() == gold[name]["hex_prefix"], name
