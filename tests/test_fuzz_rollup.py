"""Property-based differential fuzzing: random adversarial transcript
frames (colliding turn ids with same AND different text, equal
timestamps, null tools, empty text) -> engine rollup == pandas oracle.

Extends the reference's metamorphic discipline with randomized inputs
the fixtures don't cover.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mimir_spark import oracle_ref
from mimir_spark.fixtures import TRANSCRIPT_SCHEMA
from mimir_spark.ingest import ingest, turn_metrics
from mimir_spark.rollup import rollup_points, rollup_transcripts

KEY = ["tier", "kind", "series_key", "metric", "bucket_ts"]
AGGS = ["cnt", "sum_v", "min_v", "max_v", "last_v"]

# includes an out-of-vocabulary role ("system" -> role_mix_other) and a
# null role (no role_mix point) — both paths must agree on the catch-all
ROLES = ["user", "assistant", "tool", "system", None]
TOOLS = ["bash", "search", None]
TEXTS = ["", "a", "a b", "a b c d", "x " * 50, "Thîs ís à teßt €12"]


@st.composite
def turn_frames(draw):
    n = draw(st.integers(1, 60))
    rows = []
    for _ in range(n):
        conv = f"conv-{draw(st.integers(0, 3)):08d}"
        turn = draw(st.integers(0, 8))
        role = draw(st.sampled_from(ROLES))
        tool = draw(st.sampled_from(TOOLS)) if role == "tool" else None
        text = draw(st.sampled_from(TEXTS))
        # coarse timestamps force equal-ts collisions and tier-boundary hits
        ts = np.int64(1_767_571_200_000_000 + draw(st.integers(0, 50)) * 37_000_000)
        rows.append((conv, turn, role, text, tool, ts))
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role",
                                      "text", "tool", "ts"])
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    return pdf


@pytest.mark.slow
@given(turn_frames())
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
def test_fuzz_engine_matches_oracle(spark, pdf):
    df = spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA)
    got = rollup_points(turn_metrics(ingest(df))).toPandas()
    got = got.sort_values(KEY, kind="mergesort").reset_index(drop=True)
    got["bucket_ts"] = got["bucket_ts"].astype("datetime64[us]")
    want = oracle_ref.rollup_transcripts(pdf)
    want = want.sort_values(KEY, kind="mergesort").reset_index(drop=True)
    want["bucket_ts"] = want["bucket_ts"].astype("datetime64[us]")
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got[KEY + AGGS], want[KEY + AGGS],
                                  check_dtype=False)
    # fast pipeline agrees too (adversarial duplicates included)
    fast = rollup_transcripts(df).toPandas()
    fast = fast.sort_values(KEY, kind="mergesort").reset_index(drop=True)
    fast["bucket_ts"] = fast["bucket_ts"].astype("datetime64[us]")
    pd.testing.assert_frame_equal(fast[KEY + AGGS], want[KEY + AGGS],
                                  check_dtype=False)
