"""Recording rules: materialized derived metrics equal their direct
derivations, re-aggregate/decode through the ordinary read path,
refresh date-incrementally (== single-shot), and compose with
alerting."""

from __future__ import annotations

import shutil

import pandas as pd
import pytest

from mimir_spark.lineage import TieredStore, run_rollup_job
from mimir_spark.read_path import (query_range, query_range_rate,
                                   series_points)
from mimir_spark.recording import (RecordingRule, load_recording_rules,
                                   query_recording, recording_meta,
                                   recording_store, refresh_recording)

SKEY = ["kind", "series_key", "bucket_ts"]
T1 = "2026-03-01"


@pytest.fixture(scope="module")
def store(spark, t_small_df, tmp_path_factory):
    d = tmp_path_factory.mktemp("recording")
    s = TieredStore(d / "store")
    run_rollup_job(spark, lambda: t_small_df, s, "rec", num_partitions=3)
    return s


def canon(pdf):
    return pdf.sort_values(SKEY, kind="mergesort").reset_index(drop=True)


def test_range_recording_matches_direct(spark, store):
    rule = RecordingRule(name="tool_tokens", source="range",
                         metric="token_volume", agg="sum", step="1h",
                         kind="tool")
    rep = refresh_recording(spark, store, rule, t1=T1)
    assert rep["mode"] == "full" and rep["touched"] > 0
    got = canon(query_recording(spark, store, "tool_tokens").toPandas())
    want = canon(query_range(spark, store, "token_volume", agg="sum",
                             step="1h", kind="tool", t1=T1).toPandas())
    assert len(got) > 0
    assert (got["metric"] == "tool_tokens").all()
    pd.testing.assert_frame_equal(
        got.drop(columns=["metric"]), want.drop(columns=["metric"]),
        check_dtype=False)


def test_coarser_reagg_from_recording(spark, store):
    got = canon(query_recording(spark, store, "tool_tokens", agg="sum",
                                step="1d").toPandas())
    want = canon(query_range(spark, store, "token_volume", agg="sum",
                             step="1d", kind="tool", t1=T1).toPandas())
    pd.testing.assert_series_equal(got["value"], want["value"])


def test_decode_path_serves_recording(spark, store):
    """Recorded rows carry real Gorilla chunks: series_points decodes
    exactly one point per recorded bucket with the recorded value."""
    served = canon(query_recording(spark, store, "tool_tokens").toPandas())
    pts = series_points(spark, recording_store(store, "tool_tokens"),
                        "1h").toPandas()
    m = pts.merge(served, left_on=["kind", "series_key", "ts"],
                  right_on=["kind", "series_key", "bucket_ts"])
    assert len(m) == len(served) == len(pts)
    assert (m["v"] == m["value"]).all()


def test_binop_recording_matches_series_binop(spark, store):
    from mimir_spark.functions.timeseries import series_binop

    rule = RecordingRule(name="tokens_per_turn", source="binop",
                         left_metric="token_volume",
                         right_metric="turn_rate", agg="sum", op="/",
                         step="1h", kind="conv")
    refresh_recording(spark, store, rule, t1=T1)
    got = canon(query_recording(spark, store, "tokens_per_turn")
                .toPandas())
    served = query_range(spark, store, None, agg="sum", step="1h",
                         kind="conv", t1=T1)
    want = canon(series_binop(served, "token_volume", "turn_rate",
                              op="/", out_metric="tokens_per_turn",
                              value_col="value").toPandas())
    assert len(got) == len(want) > 0
    pd.testing.assert_series_equal(got["value"], want["value"])


def test_rate_recording_matches_direct(spark, store):
    rule = RecordingRule(name="tok_rate", source="rate",
                         metric="token_volume", step="1h", kind="tool",
                         per_second=True)
    refresh_recording(spark, store, rule, t1=T1)
    got = canon(query_recording(spark, store, "tok_rate").toPandas())
    want = query_range_rate(spark, store, "token_volume", step="1h",
                            kind="tool", t1=T1,
                            per_second=True).toPandas()
    want = canon(want[want["value"].notna()])
    assert len(got) == len(want) > 0
    pd.testing.assert_series_equal(got["value"], want["value"])


def test_incremental_refresh_equals_single_shot(spark, store):
    """Refresh to a mid-DAY split (the trailing date is partially
    recorded), then to the end: the recording must equal a from-
    scratch build — the high-water date recomputes in full and its
    leaves swap."""
    rule = RecordingRule(name="inc", source="range",
                         metric="token_volume", agg="sum", step="1h",
                         kind="tool")
    r1 = refresh_recording(spark, store, rule, t1="2026-01-09 07:30")
    r2 = refresh_recording(spark, store, rule, t1=T1)
    assert (r1["mode"], r2["mode"]) == ("full", "incremental")
    inc = canon(query_recording(spark, store, "inc").toPandas())
    shutil.rmtree(recording_store(store, "inc").root)
    refresh_recording(spark, store, rule, t1=T1)
    single = canon(query_recording(spark, store, "inc").toPandas())
    pd.testing.assert_frame_equal(inc, single)
    # and a re-run with the same t1 is a no-op
    assert refresh_recording(spark, store, rule, t1=T1)["mode"] == "noop"


def test_changed_rule_rebuilds_without_stale_leaves(spark, store):
    """A rule change clears the old tier directory: recorded buckets
    from the previous definition must not survive the rebuild."""
    wide = RecordingRule(name="chg", source="range",
                         metric="token_volume", agg="sum", step="1h")
    refresh_recording(spark, store, wide, t1=T1)
    n_wide = query_recording(spark, store, "chg").count()
    narrow = RecordingRule(name="chg", source="range",
                           metric="token_volume", agg="sum", step="1h",
                           kind="tool")
    rep = refresh_recording(spark, store, narrow, t1=T1)
    assert rep["mode"] == "full"
    got = query_recording(spark, store, "chg").toPandas()
    assert 0 < len(got) < n_wide
    assert (got["kind"] == "tool").all()


def test_alert_on_recording(spark, store):
    """Alert rules evaluate against a recording store unchanged —
    recorded metrics are first-class."""
    from mimir_spark.alerts import AlertRule, evaluate_rule

    rec = recording_store(store, "tool_tokens")
    arule = AlertRule(name="rec_high", metric="tool_tokens", agg="sum",
                      step="1h", op=">", threshold=100.0, for_="3h",
                      tier="1h")
    got = evaluate_rule(spark, rec, arule, t1=T1).toPandas()
    # same episodes as alerting on the underlying metric directly
    direct = AlertRule(name="d", metric="token_volume", agg="sum",
                       step="1h", op=">", threshold=100.0, for_="3h",
                       kind="tool")
    want = evaluate_rule(spark, store, direct, t1=T1).toPandas()
    key = ["series_key", "started_at"]
    a = got.sort_values(key).reset_index(drop=True)
    b = want.sort_values(key).reset_index(drop=True)
    assert len(a) == len(b) > 0
    pd.testing.assert_frame_equal(a.drop(columns=["metric"]),
                                  b.drop(columns=["metric"]),
                                  check_dtype=False)


def test_validation_and_loader(tmp_path):
    with pytest.raises(ValueError, match="unknown source"):
        RecordingRule(name="x", source="nope", metric="m")
    with pytest.raises(ValueError, match="named tier"):
        RecordingRule(name="x", source="range", metric="m", step="2h")
    with pytest.raises(ValueError, match="requires metric"):
        RecordingRule(name="x", source="range")
    with pytest.raises(ValueError, match="left_metric"):
        RecordingRule(name="x", source="binop")
    p = tmp_path / "rec.json"
    p.write_text('[{"name": "a", "source": "range", "metric": "m"},'
                 ' {"name": "b", "source": "binop",'
                 '  "left_metric": "l", "right_metric": "r"}]')
    rules = load_recording_rules(p)
    assert [r.name for r in rules] == ["a", "b"]
    p.write_text('[{"name": "a", "source": "range", "metric": "m"},'
                 ' {"name": "a", "source": "range", "metric": "m"}]')
    with pytest.raises(ValueError, match="duplicate"):
        load_recording_rules(p)


def test_record_job_cli_and_query_verb(spark, store, tmp_path):
    import json as _json
    import sys

    sys.path.insert(0, "jobs")
    try:
        import record_job
        import query_job
    finally:
        sys.path.pop(0)

    rp = tmp_path / "rec.json"
    rp.write_text(_json.dumps(
        [{"name": "cli_rec", "source": "range",
          "metric": "token_volume", "agg": "sum", "step": "1h",
          "kind": "tool"}]))
    assert record_job.main(["--store", str(store.root), "--rules",
                            str(rp), "--t1", T1]) == 0
    assert recording_meta(store, "cli_rec") is not None
    out = tmp_path / "out"
    assert query_job.main(["--store", str(store.root), "recording",
                           "--name", "cli_rec", "--agg", "sum",
                           "--step", "1d", "--out", str(out)]) == 0
    got = canon(spark.read.parquet(str(out)).toPandas())
    want = canon(query_range(spark, store, "token_volume", agg="sum",
                             step="1d", kind="tool", t1=T1).toPandas())
    pd.testing.assert_series_equal(got["value"], want["value"])


# ---------------------------------------------------------------------------
# review-pass regressions


def test_t0_window_recompute_preserves_older_dates(spark, store):
    """--t0 re-derives only dates >= t0 (leaf swap); recorded history
    before it must survive — a scoped heal, not a wipe."""
    rule = RecordingRule(name="win", source="range",
                         metric="token_volume", agg="sum", step="1h",
                         kind="tool")
    refresh_recording(spark, store, rule, t1=T1)
    before = canon(query_recording(spark, store, "win").toPandas())
    dates = sorted(before["bucket_ts"].dt.date.unique())
    assert len(dates) > 2
    cut = str(dates[len(dates) // 2])
    rep = refresh_recording(spark, store, rule, t1=T1, t0=cut)
    assert rep["mode"] == "window"
    after = canon(query_recording(spark, store, "win").toPandas())
    pd.testing.assert_frame_equal(after, before)
    # the high-water mark did not regress
    assert recording_meta(store, "win")["refreshed_until_us"] == \
        recording_meta(store, "tool_tokens")["refreshed_until_us"]


def test_binop_nulls_never_materialize_nan(spark, tmp_path):
    """Zero-division NULLs must be dropped before rollup (float64
    conversion would mint NaN rows that diverge from direct serving
    and — NaN ordering above every double — break > alerts). Crafted
    store: one bucket's denominator is 0."""
    import numpy as np

    ts = [pd.Timestamp(f"2026-01-05 0{i}:00:00").to_pydatetime()
          for i in range(4)]
    rows = []
    for t, num, den in zip(ts, (10.0, 20.0, 30.0, 40.0),
                           (2.0, 0.0, 5.0, 8.0)):
        for metric, v in (("num", num), ("den", den)):
            rows.append(("conv", "c1", metric, t, 1, v, v, v, v, None))
    df = spark.createDataFrame(
        rows, "kind string, series_key string, metric string, "
              "bucket_ts timestamp, cnt long, sum_v double, "
              "min_v double, max_v double, last_v double, chunk binary")
    s2 = TieredStore(tmp_path / "zstore")
    s2.write_partition(df, "1h", 0)
    rule = RecordingRule(name="ratio", source="binop",
                         left_metric="num", right_metric="den",
                         agg="sum", op="/", step="1h")
    refresh_recording(spark, s2, rule, t1=T1)
    got = canon(query_recording(spark, s2, "ratio").toPandas())
    # the zero-denominator bucket is ABSENT, not NaN
    assert len(got) == 3
    assert not got["value"].isna().any()
    assert np.isfinite(got["value"]).all()
    assert got["value"].tolist() == [5.0, 6.0, 5.0]
    # and an > alert on the recording sees no spurious breach
    from mimir_spark.alerts import AlertRule, evaluate_rule

    arule = AlertRule(name="hot", metric="ratio", agg="sum",
                      step="1h", op=">", threshold=100.0, tier="1h")
    assert evaluate_rule(spark, recording_store(s2, "ratio"), arule,
                         t1=T1).count() == 0


def test_changed_partitions_forces_rebuild(spark, store):
    """num_partitions re-keys the (p, date) leaf layout: an
    incremental refresh under a different value would leave stale
    old-p leaves double-counting — it must rebuild instead."""
    rule = RecordingRule(name="pts", source="range",
                         metric="token_volume", agg="sum", step="1h",
                         kind="tool")
    refresh_recording(spark, store, rule, t1="2026-01-09 07:30",
                      num_partitions=8)
    rep = refresh_recording(spark, store, rule, t1=T1,
                            num_partitions=4)
    assert rep["mode"] == "full"
    got = canon(query_recording(spark, store, "pts").toPandas())
    want = canon(query_range(spark, store, "token_volume", agg="sum",
                             step="1h", kind="tool", t1=T1).toPandas())
    pd.testing.assert_series_equal(got["value"], want["value"])
    # and same partitions resumes incrementally as before
    assert refresh_recording(spark, store, rule, t1=T1,
                             num_partitions=4)["mode"] == "noop"


def test_recording_store_composes_with_retention(spark, store):
    """Recordings ARE tier stores: apply_retention expires their old
    date partitions, and a later incremental refresh does not
    resurrect expired dates (it only recomputes from the high-water
    date forward)."""
    from mimir_spark.lineage import apply_retention

    rule = RecordingRule(name="ret", source="range",
                         metric="token_volume", agg="sum", step="1h",
                         kind="tool")
    refresh_recording(spark, store, rule, t1="2026-01-12")
    rec = recording_store(store, "ret")
    before = canon(query_recording(spark, store, "ret").toPandas())
    dates = sorted(before["bucket_ts"].dt.date.unique())
    assert len(dates) > 3
    keep, as_of = 3, str(dates[-1])
    dropped = apply_retention(rec, {"1h": f"{keep}d"}, as_of)
    assert len(dropped["1h"]) > 0
    kept_dates = {d for d in dates
                  if (dates[-1] - d).days < keep}
    after = canon(query_recording(spark, store, "ret").toPandas())
    assert set(after["bucket_ts"].dt.date.unique()) == kept_dates
    # incremental refresh past the expiry does not resurrect old dates
    rep = refresh_recording(spark, store, rule, t1=T1)
    assert rep["mode"] == "incremental"
    final = canon(query_recording(spark, store, "ret").toPandas())
    assert min(final["bucket_ts"].dt.date.unique()) == min(kept_dates)
