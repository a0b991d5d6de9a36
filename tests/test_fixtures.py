"""Fixture generator determinism + distributed==local equivalence."""

from __future__ import annotations

import numpy as np
import pandas as pd

from mimir_spark import fixtures


def test_deterministic():
    a = fixtures.conversation_frame(3)
    b = fixtures.conversation_frame(3)
    pd.testing.assert_frame_equal(a, b)


def test_edge_rows_present(t_small):
    c0 = t_small[(t_small.conv_id == "conv-00000000")].sort_values("turn_idx")
    assert c0.iloc[0].text == ""
    assert c0.iloc[1].text == fixtures.NON_ASCII_TEXT
    assert len(c0.iloc[2].text) > 9000


def test_duplicates_exist(t_small):
    dups = t_small.duplicated(subset=["conv_id", "turn_idx"])
    assert dups.any(), "duplicate knob must produce rows"


def test_hot_conversation(t_small):
    sizes = t_small.groupby("conv_id").size()
    assert sizes["conv-00000007"] >= 500  # hot conv


def test_ts_monotone_within_conv(t_small):
    base = t_small.drop_duplicates(["conv_id", "turn_idx"])
    for _, g in base.groupby("conv_id"):
        ts = g.sort_values("turn_idx")["ts"].to_numpy()
        assert (np.diff(ts.astype("datetime64[us]").astype(np.int64)) >= 0).all()


def test_distributed_equals_local(spark, t_small):
    df = fixtures.transcripts_df(spark, 200, parallelism=7)
    got = df.toPandas().sort_values(
        ["conv_id", "turn_idx", "ts", "text"]).reset_index(drop=True)
    want = t_small.sort_values(
        ["conv_id", "turn_idx", "ts", "text"]).reset_index(drop=True)
    want["ts"] = want["ts"].astype("datetime64[us]")
    got["ts"] = got["ts"].astype("datetime64[us]")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_committed_fixture_matches_generator(t_small):
    """The committed parquet (the driver-oracle input for
    transcript_rollup_1m) must stay byte-identical to regeneration."""
    committed = pd.read_parquet("fixtures/transcripts_small.parquet")
    want = t_small.copy()
    want["ts"] = want["ts"].astype("datetime64[us]")
    committed["ts"] = committed["ts"].astype("datetime64[us]")
    pd.testing.assert_frame_equal(committed.reset_index(drop=True),
                                  want.reset_index(drop=True),
                                  check_dtype=False)
