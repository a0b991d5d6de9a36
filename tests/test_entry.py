"""Driver-contract simulation: run every queries() entry at sf0.01 and
compare against its oracle_sql() via DuckDB — column names, row counts,
and EXACT values (stricter than the driver's value hash)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf.copy()
    out = out[sorted(out.columns)]
    for c in out.columns:
        if pd.api.types.is_datetime64_any_dtype(out[c]):
            out[c] = out[c].astype("datetime64[us]")
        elif pd.api.types.is_bool_dtype(out[c]):
            out[c] = out[c].astype(bool)
        elif pd.api.types.is_float_dtype(out[c]):
            out[c] = out[c].astype(np.float64)
        elif pd.api.types.is_integer_dtype(out[c]):
            out[c] = out[c].astype(np.int64)
    return out.sort_values(list(out.columns), kind="mergesort",
                           na_position="last").reset_index(drop=True)


ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


def test_every_oracle_key_has_query():
    assert set(ORACLES) <= set(QUERIES)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert len(df.schema) >= 3


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, con, name):
    got = _canon(QUERIES[name](spark, SF).toPandas())
    want = _canon(con.sql(ORACLES[name]).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}")
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    for c in got.columns:
        if pd.api.types.is_float_dtype(got[c]):
            a = got[c].to_numpy(dtype=np.float64)
            b = want[c].to_numpy(dtype=np.float64)
            both_nan = np.isnan(a) & np.isnan(b)
            assert bool(np.all(both_nan | (a == b))), (
                f"{name}.{c}: max diff "
                f"{np.nanmax(np.abs(a - b)) if len(a) else 0}"
            )
        else:
            assert got[c].where(got[c].notna(), None).tolist() == \
                want[c].where(want[c].notna(), None).tolist(), f"{name}.{c}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF)
    assert df.count() >= 0
    assert len(df.schema) > 0


# ---------------------------------------------------------------------------
# de-gated twins: the driver's gate records at most 50 entries, so four
# flavors with identical oracles to a still-gated twin were removed from
# queries(); each keeps full verification here (same oracle, exact values)
# ---------------------------------------------------------------------------

DEGATED = {
    "terms_topk_indexed":
        (entry_mod.q_terms_topk_indexed, entry_mod._TERMS_TOPK_ORACLE),
    "rollup_events_1h_salted":
        (entry_mod.q_rollup_events_1h_salted,
         entry_mod._ROLLUP_ORACLE.format(trunc="hour")),
    "lsh_ann_topk":
        (entry_mod.q_lsh_ann_topk, entry_mod._lsh_ann_oracle()),
    "cosine_dup_pairs":
        (entry_mod.q_cosine_dup_pairs, entry_mod._COSINE_DUP_ORACLE),
}


def test_degated_twins_not_registered():
    assert not (set(DEGATED) & set(QUERIES))
    assert len(QUERIES) == 50  # the driver's observed per-round row cap


@pytest.mark.parametrize("name", sorted(DEGATED))
def test_degated_twin_matches_oracle(spark, con, name):
    fn, sql = DEGATED[name]
    got = _canon(fn(spark, SF).toPandas())
    want = _canon(con.sql(sql).df())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    for c in got.columns:
        if pd.api.types.is_float_dtype(got[c]):
            a = got[c].to_numpy(dtype=np.float64)
            b = want[c].to_numpy(dtype=np.float64)
            both_nan = np.isnan(a) & np.isnan(b)
            assert bool(np.all(both_nan | (a == b))), f"{name}.{c}"
        else:
            assert got[c].where(got[c].notna(), None).tolist() == \
                want[c].where(want[c].notna(), None).tolist(), f"{name}.{c}"


def test_cosine_brute_force_guard(spark):
    """The O(n^2) baseline refuses inputs above its row bound."""
    from mimir_spark import dedup

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    with pytest.raises(ValueError, match="O\\(n\\^2\\)"):
        dedup.cosine_dup_pairs(emb, tau=0.9, max_rows=10)


def test_ivf_spark_and_duckdb_samples_agree(spark):
    """The Spark-side training sample (object-store-safe path) and the
    DuckDB driver-side sample (oracle builder) must produce identical
    arrays — hence identical k-means centroids."""
    path = f"{SF}/embeddings.parquet"
    s_spark, q_spark = entry_mod._ivf_sample_and_query(path, spark=spark)
    s_duck, q_duck = entry_mod._ivf_sample_and_query(path)
    assert np.array_equal(s_spark, s_duck)
    assert q_spark == q_duck


def test_ivf_oracle_follows_sf_dir(spark):
    """The IVF oracle is parameterized by corpus (round-4 verdict #8):
    trained and guarded on whatever sf_dir it's given, so the entry
    verifies at sf0.1 exactly as at the gate's sf0.01."""
    sf = "/root/testdata/sf0.1"
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    got = _canon(entry_mod.q_ivf_ann_topk(spark, sf).toPandas())
    want = _canon(c.sql(entry_mod._ivf_ann_oracle(sf)).df())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want) == 10
    a = got["cosine"].to_numpy(np.float64)
    b = want["cosine"].to_numpy(np.float64)
    assert bool(np.all(a == b))
    assert got["vec_id"].tolist() == want["vec_id"].tolist()


def test_atomic_build_race_semantics(tmp_path):
    """_atomic_build promotes exactly one complete store under
    concurrency: a second builder is a no-op, and a builder that
    loses the promotion race discards its copy instead of
    interleaving files into the winner's directory (the observed
    two-write-UUID corruption)."""
    import pathlib

    store = pathlib.Path(tmp_path) / "kind_src_key"

    calls = []

    def build(p):
        calls.append(p)
        d = pathlib.Path(p)
        d.mkdir()
        (d / "part-0.parquet").write_text("A")
        (d / "_SUCCESS").write_text("")

    entry_mod._atomic_build(store, build)
    assert (store / "_SUCCESS").exists() and len(calls) == 1
    entry_mod._atomic_build(store, build)       # cached: no rebuild
    assert len(calls) == 1

    # losing the race: a competing process promotes while we build
    store2 = pathlib.Path(tmp_path) / "other_key"

    def build_racer(p):
        d = pathlib.Path(p)
        d.mkdir()
        (d / "part-0.parquet").write_text("LOSER")
        (d / "_SUCCESS").write_text("")
        store2.mkdir()                          # the racer wins here
        (store2 / "part-0.parquet").write_text("WINNER")
        (store2 / "_SUCCESS").write_text("")

    entry_mod._atomic_build(store2, build_racer)
    assert (store2 / "part-0.parquet").read_text() == "WINNER"
    assert [p.name for p in store2.iterdir()] and \
        len(list(store2.glob("part-*"))) == 1   # no interleaved files
    assert not list(pathlib.Path(tmp_path).glob("*.build-*"))  # tmp gone
