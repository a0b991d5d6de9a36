"""Composite corpus-prep pipeline: stage gating, monotone shrinkage,
near-dup transitivity through the cluster step, report counts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mimir_spark.pipeline import CorpusConfig, corpus_stats, prepare_corpus


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    df = df.persist()
    df.count()
    yield df
    df.unpersist()


def test_pipeline_shrinks_monotonically(spark, docs):
    clean, report = prepare_corpus(docs, CorpusConfig(max_df=200))
    rows = {r["stage"]: r["docs_kept"] for r in report.collect()}
    assert rows["input"] == docs.count()
    order = ["input", "quality", "exact", "neardup"]
    kept = [rows[s] for s in order if s in rows]
    assert kept == sorted(kept, reverse=True)
    assert clean.count() == kept[-1]
    # clean docs keep the original schema
    assert set(docs.columns) == set(clean.columns)


def test_pipeline_language_gate(spark):
    rows = [
        (1, "the cat and the dog were in the house with the mouse"),
        (2, "el perro y el gato en la casa con el raton bien"),
        (3, "zz qq xx vv kk jj pp ww yy uu nn mm"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cfg = CorpusConfig(languages=("en",), min_quality=0.0, min_tokens=1,
                       stages=("language",))
    clean, _ = prepare_corpus(docs, cfg)
    assert {r["doc_id"] for r in clean.collect()} == {1}


def test_pipeline_exact_and_neardup(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, base), (2, base),                   # exact dup -> keep 1
        (3, base + " extra"),                   # near dup of 1
        (4, "completely different words here about other topics entirely"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cfg = CorpusConfig(min_quality=0.0, min_tokens=1, max_df=None,
                       stages=("exact", "neardup"))
    clean, report = prepare_corpus(docs, cfg)
    kept = sorted(r["doc_id"] for r in clean.collect())
    assert 2 not in kept           # exact dup dropped
    assert 1 in kept and 4 in kept
    counts = {r["stage"]: r["docs_kept"] for r in report.collect()}
    assert counts["exact"] == 3


def test_null_text_survives_exact_stage(spark):
    """With the quality stage disabled, NULL-text docs reach the exact
    stage; they must pass through unchanged — md5(NULL)=NULL used to
    put them ALL in one fingerprint partition and silently drop all
    but the min-id doc as 'duplicates' (round-4 advice)."""
    rows = [(1, "same text here ok"), (2, "same text here ok"),
            (3, None), (4, None), (5, None)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    clean, _ = prepare_corpus(docs, CorpusConfig(stages=("exact",)))
    kept = sorted(r["doc_id"] for r in clean.collect())
    assert kept == [1, 3, 4, 5]  # real dup deduped, NULLs all kept


def test_prepare_corpus_materialize_equals_lazy(spark, docs, tmp_path):
    """materialize=True stages each frame to parquet once (the
    O(stages)-rescan fix); results and report counts are identical to
    the lazy path, and the staged tables actually exist on disk."""
    cfg = CorpusConfig(max_df=200)
    lazy_clean, lazy_report = prepare_corpus(docs, cfg)
    mat_clean, mat_report = prepare_corpus(
        docs, cfg, materialize=True, scratch_dir=str(tmp_path / "stage"))
    lazy_counts = {r["stage"]: r["docs_kept"] for r in lazy_report.collect()}
    mat_counts = {r["stage"]: r["docs_kept"] for r in mat_report.collect()}
    assert mat_counts == lazy_counts
    assert sorted(r["doc_id"] for r in mat_clean.collect()) == \
        sorted(r["doc_id"] for r in lazy_clean.collect())
    staged = {p.name for p in (tmp_path / "stage").iterdir()}
    assert {"quality", "exact", "neardup"} <= staged


def test_default_scratches_are_reclaimable(spark):
    """dup_components' default mkdtemp scratch registers for
    release_component_scratches(); after consuming the result the
    release actually removes the directory (round-4 advice: it used
    to always return 0 and leak)."""
    import os

    from mimir_spark import dedup

    dedup.release_component_scratches()  # drain any prior state
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long")
    comp = dedup.dup_components(pairs)
    got = {(r["node"], r["component"]) for r in comp.collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}
    scratches = list(dedup._CC_SCRATCHES)
    assert len(scratches) == 1 and os.path.isdir(scratches[0])
    assert dedup.release_component_scratches() == 1
    assert not os.path.exists(scratches[0])
    assert dedup._CC_SCRATCHES == []


def test_corpus_stats(spark, docs):
    row = corpus_stats(docs).first()
    assert row["n_docs"] == docs.count()
    assert row["total_tokens"] > 0
    p50, p90, p99 = row["tok_p50_p90_p99"]
    assert p50 <= p90 <= p99


def test_sample_by_hash_deterministic_and_partitioning(spark, docs):
    from mimir_spark.pipeline import sample_by_hash

    a = {r["doc_id"] for r in sample_by_hash(docs, 0.3).collect()}
    b = {r["doc_id"] for r in
         sample_by_hash(docs.repartition(13), 0.3).collect()}
    assert a == b                       # partitioning-independent
    n = docs.count()
    assert 0.2 * n < len(a) < 0.4 * n   # roughly the rate
    # complementary rates partition the corpus exactly
    lo = {r["doc_id"] for r in sample_by_hash(docs, 0.3).collect()}
    # different seed -> a different (roughly independent) subset
    other = {r["doc_id"] for r in
             sample_by_hash(docs, 0.3, seed=7).collect()}
    assert other != lo
    with pytest.raises(ValueError):
        sample_by_hash(docs, 1.5)


def test_pack_sequences(spark, docs):
    from mimir_spark.pipeline import pack_sequences

    BUDGET = 200
    packed = pack_sequences(docs, BUDGET, num_partitions=4)
    rows = packed.collect()
    # coverage: every doc exactly once
    all_ids = sorted(i for r in rows for i in r["doc_ids"])
    want_ids = sorted(r["doc_id"] for r in docs.collect())
    assert all_ids == want_ids
    # budget respected for multi-doc sequences; oversize docs are
    # singletons
    for r in rows:
        if r["n_docs"] > 1:
            assert r["total_tokens"] <= BUDGET
        elif r["total_tokens"] > BUDGET:
            assert r["n_docs"] == 1
    # totals consistent with the real token counts
    from mimir_spark.functions.text import token_count
    toks = {r["doc_id"]: r["nt"] for r in docs.select(
        "doc_id", token_count("text").alias("nt")).collect()}
    for r in rows:
        assert r["total_tokens"] == sum(toks[i] for i in r["doc_ids"])
    # determinism across runs and input partitionings
    again = pack_sequences(docs.repartition(11), BUDGET,
                           num_partitions=4).collect()
    key = lambda rs: sorted((r["seq_id"], tuple(r["doc_ids"])) for r in rs)  # noqa: E731
    assert key(rows) == key(again)
    # utilization: best-fit-decreasing should do much better than one
    # doc per sequence
    n_seqs = len(rows)
    assert n_seqs < len(want_ids) * 0.6


def test_pack_sequences_budget_validation(spark, docs):
    from mimir_spark.pipeline import pack_sequences

    with pytest.raises(ValueError):
        pack_sequences(docs, 0)


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=15, deadline=None)
    @given(st.lists(st.integers(min_value=0, max_value=700),
                    min_size=1, max_size=60),
           st.sampled_from([64, 256, 512]))
    def test_pack_sequences_fuzz(spark, token_counts, budget):
        """Invariants under random document sizes: exact coverage,
        budget respected for multi-doc bins, totals consistent.
        (conftest's spark fixture is session-scoped, so hypothesis's
        function-scoped-fixture health check stays satisfied.)"""
        from mimir_spark.pipeline import pack_sequences
        rows = [(i, " ".join(["w"] * n) if n else None)
                for i, n in enumerate(token_counts)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        packed = pack_sequences(docs, budget, num_partitions=2).collect()
        all_ids = sorted(i for r in packed for i in r["doc_ids"])
        assert all_ids == list(range(len(token_counts)))
        for r in packed:
            if r["n_docs"] > 1:
                assert r["total_tokens"] <= budget
            assert r["total_tokens"] == sum(
                token_counts[i] for i in r["doc_ids"])

except ImportError:
    pass


def test_lang_mix(spark, docs):
    from mimir_spark.pipeline import lang_mix

    rows = lang_mix(docs).collect()
    assert sum(r["n_docs"] for r in rows) == docs.count()
    assert abs(sum(r["pct"] for r in rows) - 100.0) < 0.5
