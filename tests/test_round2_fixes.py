"""Regression tests for the round-2 fixes: short-doc shingles, unknown
roles, duplicate-left as-of probes, bounded cascade chunks."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mimir_spark import codec, dedup
from mimir_spark.functions import text as TX
from mimir_spark.ingest import ingest, turn_metrics
from mimir_spark.operators.joins import asof_join_bucketed
from mimir_spark.rollup import cascade, rollup_points


@pytest.fixture(scope="module")
def short_docs(spark):
    pdf = pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4, 5],
        "text": ["", "one", "two tokens", "three token doc",
                 "three token doc", "a much longer document with many tokens"],
    })
    return spark.createDataFrame(pdf, "doc_id long, text string")


def test_short_doc_shingles_empty_not_crash(short_docs):
    sh = dedup.doc_shingles(short_docs).toPandas()
    # docs with < 3 tokens emit no shingles; longer docs do
    assert set(sh[sh.doc_id.isin([0, 1, 2])].doc_id) == set()
    assert (sh.doc_id >= 3).all() and len(sh) > 0


def test_short_doc_jaccard_and_minhash_run(short_docs):
    pairs = dedup.jaccard_pairs(short_docs, tau=0.5).toPandas()
    assert {(3, 4)} == set(zip(pairs.doc_a, pairs.doc_b))
    mh = dedup.minhash_lsh_pairs(short_docs).toPandas()
    assert (3, 4) in set(zip(mh.doc_a, mh.doc_b))


def test_rolling_hashes_short_doc(short_docs):
    out = short_docs.select(
        "doc_id", F.size(TX.rolling_hashes(window=4)).alias("n")).toPandas()
    n = dict(zip(out.doc_id, out.n))
    assert n[0] == 0 and n[1] == 0 and n[2] == 0 and n[3] == 0
    assert n[5] == 7 - 4 + 1


def test_unknown_role_rolls_up_as_other(spark):
    pdf = pd.DataFrame({
        "conv_id": ["c"] * 4,
        "turn_idx": [0, 1, 2, 3],
        "role": ["user", "system", "weird", None],
        "text": ["hi", "boot", "x", "y"],
        "tool": [None] * 4,
        "ts": pd.to_datetime([1_700_000_000_000_000 + i * 1_000_000
                              for i in range(4)], unit="us"),
    })
    df = spark.createDataFrame(
        pdf, "conv_id string, turn_idx int, role string, text string, "
             "tool string, ts timestamp")
    rolled = rollup_points(turn_metrics(ingest(df)), tiers=("1d",)).toPandas()
    role_rows = rolled[rolled.metric.str.startswith("role_mix")]
    got = dict(zip(role_rows.metric, role_rows.cnt))
    # system + weird -> other (2); null role -> no point
    assert got == {"role_mix_user": 1, "role_mix_other": 2}
    # fast path agrees
    from mimir_spark.rollup import rollup_transcripts
    fast = rollup_transcripts(df, tiers=("1d",)).toPandas()
    fr = fast[fast.metric.str.startswith("role_mix")]
    assert dict(zip(fr.metric, fr.cnt)) == got


def test_asof_bucketed_keeps_duplicate_left_rows(spark):
    left = spark.createDataFrame(
        pd.DataFrame({
            "key": ["a", "a"],
            "ts": pd.to_datetime([5_000_000, 5_000_000], unit="us"),
        }), "key string, ts timestamp")
    right = spark.createDataFrame(
        pd.DataFrame({
            "key": ["a"],
            "ts": pd.to_datetime([1_000_000], unit="us"),
            "value": [42.0],
        }), "key string, ts timestamp, value double")
    out = asof_join_bucketed(left, right, on="ts", by="key",
                             value_col="value", tolerance_sec=3600).toPandas()
    assert len(out) == 2
    assert (out["value_asof"] == 42.0).all()


def test_cascade_max_points_bounds_subchunks(spark, t_small_df):
    points = turn_metrics(ingest(t_small_df))
    fine = rollup_points(points, tiers=("1m", "1d"))
    direct = fine.filter("tier = '1d'").toPandas()
    capped = cascade(fine.filter("tier = '1m'"), "1d", max_points=4).toPandas()
    key = ["kind", "series_key", "metric", "bucket_ts"]
    d = direct.sort_values(key, kind="mergesort").reset_index(drop=True)
    c = capped.sort_values(key, kind="mergesort").reset_index(drop=True)
    assert len(d) == len(c)
    split_seen = False
    for dc, cc, cnt in zip(d["chunk"], c["chunk"], c["cnt"]):
        dt, dv = codec.decode_all(bytes(dc))
        ct, cv = codec.decode_all(bytes(cc))
        assert np.array_equal(dt, ct)
        assert np.array_equal(dv.view(np.uint64), cv.view(np.uint64))
        if cnt > 4:
            split_seen = True
            assert codec.chunk_n_points(bytes(cc)) <= 4
    assert split_seen


def test_hot_shingle_df_cap_bounds_candidates(spark):
    """A stop-phrase shingle shared by k docs must not contribute k^2
    candidate pairs once max_df caps it; true near-dups still found."""
    hot = "the quick brown fox jumps"
    rows = [(i, f"{hot} unique{i}a unique{i}b unique{i}c") for i in range(60)]
    # one genuine near-dup pair with distinctive overlap (J=0.8 —
    # LSH detection is probabilistic in J under any fixed hash family;
    # this pair is verified detected under the committed minhash
    # permutation constants via a pure-python replay of the scheme)
    rows += [(100, "alpha beta gamma delta epsilon zeta"),
             (101, "alpha beta gamma delta epsilon zeta eta")]
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"]),
        "doc_id long, text string")
    sh_capped = dedup.doc_shingles(docs, max_df=10)
    # every surviving shingle has df <= 10 -> join fan-out bounded
    dfc = sh_capped.groupBy("shingle").count().toPandas()
    assert (dfc["count"] <= 10).all()
    pairs = dedup.jaccard_pairs(docs, tau=0.5, max_df=10).toPandas()
    assert (100, 101) in set(zip(pairs.doc_a, pairs.doc_b))
    # the hot-shingle docs share nothing after the cap
    assert not any(a < 60 and b < 60 for a, b in zip(pairs.doc_a, pairs.doc_b))
    mh = dedup.minhash_lsh_pairs(docs, max_df=10).toPandas()
    assert (100, 101) in set(zip(mh.doc_a, mh.doc_b))
    assert not any(a < 60 and b < 60 for a, b in zip(mh.doc_a, mh.doc_b))


def test_fold_accents_and_describers(spark):
    df = spark.createDataFrame(
        [("Thîs", "bash", 3), ("teßt", None, 5)],
        "word string, tool string, turn_idx int")
    got = [r["n"] for r in df.select(TX.fold_accents("word").alias("n")).collect()]
    assert got == ["this", "test"]
    toks = spark.createDataFrame([("Thîs ís à teßt",)], "text string") \
        .select(TX.normalized_tokens_col().alias("t")).first()["t"]
    assert toks == ["this", "is", "a", "test"]
    desc = df.select(TX.describe_mention("Tool", ["tool", "turn_idx"])
                     .alias("d")).collect()
    assert desc[0]["d"] == "Tool{tool = bash, turn_idx = 3}"
    assert desc[1]["d"] == "Tool{tool = null, turn_idx = 5}"
    pat = df.select(TX.pattern_description("tool ${tool} at ${turn_idx}!")
                    .alias("d")).collect()
    assert pat[0]["d"] == "tool bash at 3!"
    assert pat[1]["d"] == "tool null at 5!"


def test_annotation_terms_and_description_sort(spark):
    from mimir_spark.operators import terms as TERMS

    turns = spark.createDataFrame(
        [("c1", 0, "tool", "bash", 9), ("c1", 1, "tool", "bash", 3),
         ("c1", 2, "tool", "read", 9), ("c2", 0, "tool", None, 9)],
        "conv_id string, turn_idx int, role string, tool string, size int")
    at = TERMS.annotation_terms(turns, [("size", "GE", 5)], term_col="tool")
    got = {r["term"]: (r["count"], r["length"]) for r in at.collect()}
    assert got == {"bash": (1, 1), "read": (1, 1)}
    t = spark.createDataFrame(
        [("x", 5, "b"), ("y", 9, "a"), ("z", 2, "a")],
        "term string, count long, description string")
    order = [r["term"] for r in TERMS.sorted_terms(t, "description_asc").collect()]
    assert order == ["y", "z", "x"]


def test_extreme_hot_conversation(spark):
    """Skew stress: one conversation with 60k turns inside a single
    day — the (series, coarse-bucket) partitioning puts it on one task,
    so the Arrow pass and the chunk encoder must stay bounded via the
    max_points sub-chunk container and produce exact aggregates."""
    n = 60_000
    pdf = pd.DataFrame({
        "conv_id": "hot",
        "turn_idx": np.arange(n, dtype=np.int32),
        "role": np.where(np.arange(n) % 3 == 0, "user", "assistant"),
        "text": "a b c",
        "tool": None,
        "ts": pd.to_datetime(1_767_571_200_000_000 + np.arange(n) * 1_000_000,
                             unit="us"),
    })
    from mimir_spark.fixtures import TRANSCRIPT_SCHEMA
    from mimir_spark.rollup import rollup_transcripts

    df = spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA)
    out = rollup_transcripts(df, max_points=4096).toPandas()
    day = out[(out.tier == "1d") & (out.metric == "turn_rate")]
    assert day["cnt"].sum() == n
    # the giant group decodes back to every point, bounded sub-chunks
    ch = bytes(day.iloc[0]["chunk"])
    assert codec.chunk_n_points(ch) <= 4096
    ts, v = codec.decode_all(ch)
    assert len(ts) == day.iloc[0]["cnt"]
    # 1m tier: 60k turns over 1000 minutes -> 1000 buckets of 60
    m = out[(out.tier == "1m") & (out.metric == "turn_rate")]
    assert len(m) == 1000 and (m["cnt"] == 60).all()


def test_ontology_describers(spark):
    """OntologyMentionDescriber analogue: 'Class (Instance)' with URIs
    shortened at the FIRST namespace separator; NULL class -> the
    annotation type, NULL instance -> no parens; plus the label-table
    variant riding a broadcast join with local-name fallback."""
    df = spark.createDataFrame(
        [("http://dbpedia.org/onto#City", "http://dbpedia.org/res#London"),
         ("http://dbpedia.org/onto#City", None),
         ("PlainClass", "PlainInst"),
         (None, "http://x#ignored")],
        "cls string, inst string")
    got = [r["d"] for r in df.select(
        TX.ontology_description("Entity", "cls", "inst").alias("d")).collect()]
    assert got == ["City (London)", "City", "PlainClass (PlainInst)", "Entity"]
    # full URIs when local_names_only=False
    full = df.limit(1).select(TX.ontology_description(
        "Entity", "cls", "inst", local_names_only=False).alias("d")).first()["d"]
    assert full == ("http://dbpedia.org/onto#City "
                    "(http://dbpedia.org/res#London)")
    # label-table variant: mapped URIs take the ontology label, unmapped
    # fall back to local-name shortening; the lookup side broadcasts
    mentions = df.filter("cls IS NOT NULL") \
        .withColumnRenamed("cls", "class")
    onto = spark.createDataFrame(
        [("http://dbpedia.org/onto#City", "Populated place")],
        "class string, label string")
    out = TX.describe_with_ontology(mentions, onto)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    descs = sorted(r["description"] for r in out.collect())
    assert descs == ["PlainClass", "Populated place", "Populated place"]
