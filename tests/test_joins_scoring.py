"""As-of/range joins vs pandas merge_asof oracle; measurement rewrite;
scoring expressions; hit text reconstruction."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mimir_spark.functions.measurement import parse_spec, spec_predicate
from mimir_spark.functions.scoring import binding_scorer_col, count_scorer, tf_idf_scores
from mimir_spark.operators.joins import asof_join, asof_join_bucketed, range_join


@pytest.fixture(scope="module")
def quotes_trades(spark):
    rng = np.random.default_rng(11)
    n_q, n_t = 2000, 800
    keys = [f"k{i}" for i in range(5)]
    quotes = pd.DataFrame({
        "key": rng.choice(keys, n_q),
        "ts": pd.to_datetime(np.sort(rng.integers(0, 10**6, n_q)) * 10**6, unit="us"),
        "px": np.round(rng.normal(100, 5, n_q), 2),
    })
    trades = pd.DataFrame({
        "key": rng.choice(keys, n_t),
        "ts": pd.to_datetime(np.sort(rng.integers(0, 10**6, n_t)) * 10**6, unit="us"),
        "qty": rng.integers(1, 100, n_t),
    })
    qdf = spark.createDataFrame(quotes, "key string, ts timestamp, px double")
    tdf = spark.createDataFrame(trades, "key string, ts timestamp, qty long")
    return quotes, trades, qdf, tdf


def test_asof_join_matches_merge_asof(quotes_trades):
    quotes, trades, qdf, tdf = quotes_trades
    got = asof_join(tdf, qdf, on="ts", by="key", value_cols=["px"]) \
        .toPandas().sort_values(["key", "ts", "qty"]).reset_index(drop=True)
    want = pd.merge_asof(
        trades.sort_values("ts"), quotes.sort_values("ts"),
        on="ts", by="key", direction="backward", suffixes=("", "_asof"),
    ).rename(columns={"px": "px_asof"}) \
        .sort_values(["key", "ts", "qty"]).reset_index(drop=True)
    assert len(got) == len(want)
    pd.testing.assert_series_equal(got["px_asof"], want["px_asof"],
                                   check_dtype=False)


def test_asof_bucketed_matches_within_tolerance(quotes_trades):
    quotes, trades, qdf, tdf = quotes_trades
    tol = 200  # seconds
    got = asof_join_bucketed(tdf, qdf, on="ts", by="key", value_col="px",
                             tolerance_sec=tol) \
        .toPandas().sort_values(["key", "ts", "qty"]).reset_index(drop=True)
    want = pd.merge_asof(
        trades.sort_values("ts"), quotes.sort_values("ts"),
        on="ts", by="key", direction="backward",
        tolerance=pd.Timedelta(seconds=tol), suffixes=("", "_asof"),
    ).rename(columns={"px": "px_asof"}) \
        .sort_values(["key", "ts", "qty"]).reset_index(drop=True)
    a, b = got["px_asof"], want["px_asof"]
    assert ((a == b) | (a.isna() & b.isna())).all()


def test_range_join(spark):
    events = spark.createDataFrame(
        [("a", 5), ("a", 15), ("b", 7)], "key string, ts long")
    intervals = spark.createDataFrame(
        [("a", 0, 10, "w1"), ("a", 10, 20, "w2"), ("b", 0, 5, "w3")],
        "key string, start long, end long, name string")
    got = {(r["ts"], r["name"]) for r in
           range_join(events, intervals, "ts", "start", "end", by=["key"]).collect()}
    assert got == {(5, "w1"), (15, "w2")}


def test_parse_spec():
    assert parse_spec("30 cm") == ("m", 0.3, 0.3)
    unit, lo, hi = parse_spec("1 to 3 feet")
    assert unit == "m" and abs(lo - 0.3048) < 1e-12 and abs(hi - 0.9144) < 1e-12
    assert parse_spec("2 hours") == ("s", 7200.0, 7200.0)
    with pytest.raises(ValueError):
        parse_spec("three bananas")


def test_parse_spec_extended_grammar():
    """Round-4 breadth: area/volume words, powers, compounds, derived
    units, dimension-aware rejection
    (MeasurementAnnotationHelper.java:238-377's parser-backed reach)."""
    # areas (all spell m^2)
    for spec in ["2 square feet", "2 sq ft", "2 ft^2", "2 ft2"]:
        unit, lo, hi = parse_spec(spec)
        assert unit == "m^2" and abs(lo - 2 * 0.3048**2) < 1e-12, spec
    assert parse_spec("1 hectare") == ("m^2", 10000.0, 10000.0)
    assert parse_spec("1 acre")[0] == "m^2"
    # volumes (m^3)
    unit, lo, _ = parse_spec("2 cubic metres")
    assert (unit, lo) == ("m^3", 2.0)
    assert parse_spec("1 litre") == ("m^3", 0.001, 0.001)
    u, lo, hi = parse_spec("1 to 2 gallons")
    assert u == "m^3" and abs(lo - 0.003785411784) < 1e-15
    # derived / compound
    u, lo, _ = parse_spec("10 m/s")
    assert (u, lo) == ("m s^-1", 10.0)
    u, lo, _ = parse_spec("36 km/h")
    assert u == "m s^-1" and abs(lo - 10.0) < 1e-9
    u, lo, _ = parse_spec("10 mph")
    assert u == "m s^-1" and abs(lo - 4.4704) < 1e-12
    u, lo, _ = parse_spec("2 kg per m^3")
    assert u == "kg m^-3" and lo == 2.0
    # dimension-aware rejection and malformed forms
    import pytest as _pt
    for bad in ["2 sq bananas", "2 per m", "2 sq", "2 m^x"]:
        with _pt.raises(ValueError):
            parse_spec(bad)
    # same-number different-dimension specs can never cross-match
    assert parse_spec("2 m")[0] != parse_spec("2 sq m")[0]


def test_normalization_map_expr(spark):
    """Ingest-side normalizer: literal map expression, no UDF."""
    from mimir_spark.functions.measurement import normalization_map

    df = spark.createDataFrame(
        [(5.0, "CM"), (2.0, "feet"), (1.0, "hectare"), (3.0, "min")],
        "value double, unit string")
    m = normalization_map()
    out = df.select(
        m[F.lower("unit")]["unit"].alias("normalized_unit"),
        (F.col("value") * m[F.lower("unit")]["factor"]).alias("nv"),
    ).collect()
    got = {(r["normalized_unit"], round(r["nv"], 6)) for r in out}
    assert got == {("m", 0.05), ("m", 0.6096), ("m^2", 10000.0), ("s", 180.0)}


def test_spec_predicate_overlap(spark):
    rows = spark.createDataFrame(
        [("m", 0.1, 0.2), ("m", 0.25, 0.5), ("m", 1.0, 2.0), ("kg", 0.3, 0.3)],
        "normalized_unit string, normalized_min double, normalized_max double")
    got = rows.filter(spec_predicate("1 to 3 feet")).count()
    # spec range [0.3048, 0.9144] m: overlaps [0.25,0.5] only
    assert got == 1


def test_scorers(spark, t_small_df):
    from mimir_spark.ingest import ingest
    from mimir_spark.operators import term_query
    from mimir_spark.operators.terms import tokenize

    turns = ingest(t_small_df)
    hits = term_query(turns, "role", "assistant")
    scores = count_scorer(hits).toPandas()
    want = hits.toPandas().groupby("conv_id").size()
    assert dict(zip(scores.conv_id, scores.score)) == want.to_dict()

    bs = hits.withColumn("s", binding_scorer_col()).select("s").distinct().collect()
    assert all(r["s"] == 1.0 for r in bs)  # len=1 < h=16

    toks = tokenize(turns)
    some_term = toks.groupBy("term").count().orderBy(F.desc("count")).first()["term"]
    tfidf = tf_idf_scores(toks, some_term).toPandas()
    assert (tfidf["score"] >= 0).all() and len(tfidf) > 0


def test_render_hits(spark, t_small_df):
    from mimir_spark.ingest import ingest
    from mimir_spark.operators import sequence_query, term_query
    from mimir_spark.operators.hits import render_hits

    turns = ingest(t_small_df)
    hits = sequence_query(term_query(turns, "role", "user"),
                          term_query(turns, "role", "assistant"), 0, 0)
    rendered = render_hits(turns, hits.limit(20), context=1).toPandas()
    assert len(rendered) > 0
    tpdf = turns.toPandas().set_index(["conv_id", "turn_idx"])
    for r in rendered.itertuples(index=False):
        lines = r.snippet.split("\n")
        lo = max(r.pos - 1, 0)
        expected_rows = [
            (r.conv_id, i) for i in range(lo, r.pos + r.len + 1)
            if (r.conv_id, i) in tpdf.index
        ]
        assert len(lines) == len(expected_rows)
        for line, key in zip(lines, expected_rows):
            row = tpdf.loc[key]
            assert line == f"{row.role}: {row.text}"


def test_or_terms_strategies(spark):
    from mimir_spark.operators import terms as TERMS

    s0 = spark.createDataFrame([("a", 3), ("b", 1)], "term string, count long")
    s1 = spark.createDataFrame([("b", 5), ("c", 2)], "term string, count long")
    got = {st: dict(TERMS.or_terms([s0, s1], st).collect())
           for st in TERMS.OR_TERMS_STRATEGIES}
    assert got["SUM"] == {"a": 3, "b": 6, "c": 2}
    assert got["MAX"] == {"a": 3, "b": 5, "c": 2}
    assert got["MIN"] == {"a": 3, "b": 1, "c": 2}
    assert got["FIRST"] == {"a": 3, "b": 1, "c": 2}  # s0 wins for b
    with pytest.raises(ValueError):
        TERMS.or_terms([s0], "MEDIAN")


def test_group_by_description(spark):
    from mimir_spark.operators import terms as TERMS

    t = spark.createDataFrame(
        [("aa", 2, "short"), ("bb", 3, "short"), ("ccc", 5, "long")],
        "term string, count long, description string")
    got = {r["description"]: (r["count"], list(r["terms"]), r["n_terms"])
           for r in TERMS.group_by_description(t).collect()}
    assert got == {"short": (5, ["aa", "bb"], 2), "long": (5, ["ccc"], 1)}


def test_bm25_matches_numpy_oracle(spark):
    import math

    from mimir_spark.functions.scoring import bm25_scores
    from mimir_spark.operators import terms as TERMS

    docs = spark.createDataFrame(
        [(0, "x y z x"), (1, "x a b"), (2, "a b c d e"), (3, "x x x")],
        "doc_id long, text string")
    toks = TERMS.tokenize(docs, id_col="doc_id")
    got = dict(bm25_scores(toks, "x", k1=1.2, b=0.75).collect())
    dls = {0: 4, 1: 3, 2: 5, 3: 3}
    tfs = {0: 2, 1: 1, 3: 3}
    n, df, avgdl = 4, 3, sum(dls.values()) / 4
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    for d, tf in tfs.items():
        want = idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dls[d] / avgdl))
        assert got[d] == pytest.approx(round(want, 6), abs=1e-9)
    assert 2 not in got


def test_delegating_helper_chain(spark):
    """compose_helpers: decorator sees the delegate's columns; the
    measurement decorator's virtual features are spec-filterable; an
    unknown unit yields NULL features (never matches)."""
    from mimir_spark.functions.measurement import measurement_helper
    from mimir_spark.ingest import compose_helpers

    raw = spark.createDataFrame(
        [("m1", "5 cm wide", 5.0, "cm"),
         ("m2", "2 sq ft pane", 2.0, "sq ft"),   # multi-token: unknown at ingest
         ("m3", "3 bogons", 3.0, "bogon"),
         ("m4", "1 hectare lot", 1.0, "hectare")],
        "mention string, text string, value double, unit string")

    def base_helper(df):  # the delegate: adds a virtual length feature
        return df.withColumn("text_len", F.length("text"))

    chain = compose_helpers(base_helper, measurement_helper())
    out = chain(raw)
    rows = {r["mention"]: r for r in out.collect()}
    assert rows["m1"]["text_len"] == 9  # delegate ran first
    assert rows["m1"]["normalized_unit"] == "m"
    assert abs(rows["m1"]["normalized_min"] - 0.05) < 1e-12
    assert rows["m4"]["normalized_unit"] == "m^2"
    assert rows["m3"]["normalized_unit"] is None  # unknown unit -> NULL
    assert rows["m2"]["normalized_unit"] is None  # compound = spec-side only

    got = {r["mention"] for r in out.filter(
        spec_predicate("1 to 10 cm")).collect()}
    assert got == {"m1"}
    got_area = {r["mention"] for r in out.filter(
        spec_predicate("0.5 to 2 hectares")).collect()}
    assert got_area == {"m4"}


# ---------------------------------------------------------------------------
# measurement unit algebra: property-based laws
# ---------------------------------------------------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from mimir_spark.functions.measurement import _UNITS, parse_unit

    _NAMES = sorted(_UNITS)

    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.sampled_from(_NAMES), min_size=1, max_size=3))
    def test_unit_product_commutes(names):
        """Multiplication order is irrelevant: dim and factor agree for
        any permutation of a unit product."""
        d1, f1 = parse_unit(" ".join(names))
        d2, f2 = parse_unit(" ".join(reversed(names)))
        assert d1 == d2
        assert abs(f1 - f2) <= 1e-9 * max(abs(f1), abs(f2), 1.0)

    @settings(max_examples=60, deadline=None)
    @given(st.sampled_from(_NAMES), st.sampled_from(_NAMES))
    def test_unit_division_law(a, b):
        """factor(a/b) == factor(a)/factor(b); dim(a/b) == dim(a)-dim(b)."""
        da, fa = parse_unit(a)
        db, fb = parse_unit(b)
        d, f = parse_unit(f"{a}/{b}")
        assert d == tuple(x - y for x, y in zip(da, db))
        assert abs(f - fa / fb) <= 1e-9 * max(abs(f), 1e-12)

    @settings(max_examples=40, deadline=None)
    @given(st.sampled_from(_NAMES), st.sampled_from([2, 3]))
    def test_unit_power_law(name, p):
        d1, f1 = parse_unit(name)
        dp, fp = parse_unit(f"{name}^{p}")
        assert dp == tuple(x * p for x in d1)
        assert abs(fp - f1 ** p) <= 1e-9 * max(abs(fp), 1e-30)

    @settings(max_examples=40, deadline=None)
    @given(st.text(alphabet="qwxzj", min_size=2, max_size=8))
    def test_unknown_units_rejected(word):
        import pytest as _pt
        if word in _UNITS or (word.endswith("s") and word[:-1] in _UNITS):
            return
        with _pt.raises(ValueError):
            parse_unit(word)
except ImportError:  # hypothesis not installed in some environments
    pass
