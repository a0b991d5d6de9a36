"""Dedup quality gates on a seeded near-dup corpus with known ground
truth (fixtures.neardup_docs_pandas): pair recall/precision for
MinHash-LSH and SimHash at their default configs, end-to-end canonical
keep correctness."""

from __future__ import annotations

import pandas as pd
import pytest

from mimir_spark import dedup
from mimir_spark.fixtures import neardup_docs_pandas


@pytest.fixture(scope="module")
def corpus(spark):
    pdf = neardup_docs_pandas()
    truth = {(int(r.dup_of), int(r.doc_id))
             for r in pdf.itertuples() if pd.notna(r.dup_of)}
    df = spark.createDataFrame(pdf.assign(
        dup_of=pdf["dup_of"].astype("float")),
        "doc_id long, text string, dup_of double")
    df = df.persist(); df.count()
    yield df, truth
    df.unpersist()


def _pairs(rows, a="doc_a", b="doc_b"):
    return {(min(r[a], r[b]), max(r[a], r[b])) for r in rows}


def test_minhash_lsh_quality(spark, corpus):
    df, truth = corpus
    got = _pairs(dedup.minhash_lsh_pairs(df, max_df=None).collect())
    assert truth, "fixture produced no dup pairs"
    recall = len(got & truth) / len(truth)
    precision = len(got & truth) / max(len(got), 1)
    assert recall >= 0.9, (recall, len(truth))
    assert precision >= 0.9, (precision, len(got))


def test_simhash_quality(spark):
    """SimHash targets the NEAR-IDENTICAL regime (hamming <= 4 on the
    60-bit fingerprint): gated at 1-token mutations, where it measures
    recall 0.81 / precision 1.0; at 2-token mutations it honestly
    drops to ~0.5 recall (the coarser filter it is — measured and
    documented, MinHash covers that regime with 0.9+)."""
    from mimir_spark.fixtures import neardup_docs_pandas

    pdf = neardup_docs_pandas(mutate_tokens=1)
    truth = {(int(r.dup_of), int(r.doc_id))
             for r in pdf.itertuples() if pd.notna(r.dup_of)}
    df = spark.createDataFrame(pdf[["doc_id", "text"]],
                               "doc_id long, text string")
    got = _pairs(dedup.simhash_pairs(df).collect())
    recall = len(got & truth) / len(truth)
    precision = len(got & truth) / max(len(got), 1)
    assert recall >= 0.8, (recall, len(truth))
    assert precision >= 0.95, (precision, len(got))


def test_jaccard_quality(spark, corpus):
    """2 substitutions in 60 tokens -> Jaccard well above 0.5; exact
    pair generation must find every true pair at tau=0.5."""
    df, truth = corpus
    got = _pairs(dedup.jaccard_pairs(df, 0.5).collect())
    # exact: every true pair found, and NOTHING else (random 60-token
    # docs over a 5k vocabulary cannot reach jaccard 0.5)
    assert got == truth


def test_canonical_keep_drops_exactly_the_dups(spark, corpus):
    df, truth = corpus
    pairs = dedup.minhash_lsh_pairs(df, max_df=None)
    kept = {r["doc_id"]
            for r in dedup.dedup_keep_canonical(df, pairs).collect()}
    found = _pairs(pairs.collect())
    # every found dup (the higher id of a truth pair) is dropped;
    # every base doc survives
    for a, b in truth & found:
        assert a in kept and b not in kept
