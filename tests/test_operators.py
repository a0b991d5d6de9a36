"""Operator algebra tests — the reference's differential/metamorphic
discipline (TestQueries.java:153-252) re-applied:

- sequence(a,a,a) == repeats(a,3,3)            (TestQueries.java:209-226)
- gap-as-Gap == gap-as-length                   (TestQueries.java:238-252)
- no-gap results subset of gap results          (TestQueries.java:153-172)
- brute-force pandas oracles for contains/within/minus/and
"""

from __future__ import annotations

import pandas as pd
import pytest

from mimir_spark.ingest import ingest
from mimir_spark.operators import (
    and_query,
    annotation_query,
    const_restrict,
    contains_query,
    gap_query,
    minus_query,
    or_query,
    repeats_query,
    sequence_query,
    term_query,
    within_query,
)
from mimir_spark.operators.hits import sequence
from mimir_spark.operators.terms import (
    document_terms,
    documents_and_terms,
    documents_or_terms,
    tokenize,
    top_k_terms,
)


@pytest.fixture(scope="module")
def turns(spark, t_small_df):
    df = ingest(t_small_df).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def turns_pdf(turns):
    return turns.toPandas()


def hits_set(df):
    return set(map(tuple, df.select("conv_id", "pos", "len").collect()))


# ---------------------------------------------------------------------------
# metamorphic identities from the reference test suite
# ---------------------------------------------------------------------------

def test_seq3_equals_repeats33(turns):
    a = term_query(turns, "role", "assistant")
    s = sequence([a, a, a])
    r = repeats_query(a, 3, 3)
    assert hits_set(s) == hits_set(r)
    assert len(hits_set(s)) > 0


def test_gap_as_gap_equals_gap_as_length(turns):
    a = term_query(turns, "role", "user")
    b = term_query(turns, "role", "tool")
    g = 2
    via_gap = sequence_query(a, b, g, g)
    via_len = sequence_query(gap_query(a, g), b, 0, 0)
    assert hits_set(via_gap) == hits_set(via_len)
    assert len(hits_set(via_gap)) > 0


def test_nogap_subset_of_gap(turns):
    a = term_query(turns, "role", "user")
    b = term_query(turns, "role", "assistant")
    tight = hits_set(sequence_query(a, b, 0, 0))
    loose = hits_set(sequence_query(a, b, 0, 3))
    assert tight and tight < loose


def test_repeats_1_3_equals_or_of_seqs(turns):
    a = term_query(turns, "role", "user")
    r = repeats_query(a, 1, 3)
    o = or_query(a, sequence([a, a]), sequence([a, a, a]))
    assert hits_set(r) == hits_set(o)


def test_const_restrict_shrinks(spark, turns):
    a = term_query(turns, "role", "user")
    ids = spark.createDataFrame(
        [("conv-00000003",), ("conv-00000007",)], "conv_id string")
    restricted = hits_set(const_restrict(a, ids))
    full = hits_set(a)
    assert restricted < full
    assert {h[0] for h in restricted} <= {"conv-00000003", "conv-00000007"}


def test_annotation_constraints_shrink(turns):
    loose = hits_set(annotation_query(turns, [("role", "EQ", "tool")]))
    tight = hits_set(annotation_query(
        turns, [("role", "EQ", "tool"), ("tool", "REGEX", "^(bash|read)$")]))
    assert tight < loose and tight


# ---------------------------------------------------------------------------
# brute-force oracles
# ---------------------------------------------------------------------------

def _pdf_hits(turns_pdf, col, value):
    sub = turns_pdf[turns_pdf[col] == value]
    return set(zip(sub["conv_id"], sub["turn_idx"], [1] * len(sub)))


def test_sequence_vs_bruteforce(turns, turns_pdf):
    got = hits_set(sequence_query(
        term_query(turns, "role", "user"), term_query(turns, "role", "assistant"),
        0, 1))
    ua = _pdf_hits(turns_pdf, "role", "user")
    aa = _pdf_hits(turns_pdf, "role", "assistant")
    want = set()
    for (c, p, l) in ua:
        for g in (0, 1):
            if (c, p + l + g, 1) in aa:
                want.add((c, p, p + l + g + 1 - p))
    assert got == want


def test_contains_within_minus_vs_bruteforce(turns, turns_pdf):
    # outer: user->...->tool windows; inner: assistant turns
    outer = sequence_query(term_query(turns, "role", "user"),
                           term_query(turns, "role", "tool"), 0, 3)
    inner = term_query(turns, "role", "assistant")
    o_set, i_set = hits_set(outer), hits_set(inner)

    want_contains = {o for o in o_set if any(
        i[0] == o[0] and i[1] >= o[1] and i[1] + i[2] <= o[1] + o[2] for i in i_set)}
    assert hits_set(contains_query(outer, inner)) == want_contains

    want_within = {i for i in i_set if any(
        o[0] == i[0] and i[1] >= o[1] and i[1] + i[2] <= o[1] + o[2] for o in o_set)}
    assert hits_set(within_query(inner, outer)) == want_within

    # minus: user turns that are not the start of a user->assistant pair
    a = term_query(turns, "role", "user")
    b = term_query(turns, "role", "user")  # identical -> empty
    assert hits_set(minus_query(a, b)) == set()
    sub = contains_query(outer, inner)
    assert hits_set(minus_query(outer, sub)) == o_set - want_contains


def _brute_minimal_windows(child_sets):
    """O(everything) minimal-interval oracle."""
    convs = set.intersection(*[{h[0] for h in s} for s in child_sets])
    out = set()
    for conv in convs:
        per_child = [[(p, p + l) for (c, p, l) in s if c == conv] for s in child_sets]
        starts = sorted({iv[0] for ch in per_child for iv in ch})
        ends = sorted({iv[1] for ch in per_child for iv in ch})
        cands = []
        for s in starts:
            for e in ends:
                if e <= s:
                    continue
                if all(any(s <= a and b <= e for (a, b) in ch) for ch in per_child):
                    cands.append((s, e))
                    break  # smallest e for this s
        minimal = [
            (s, e) for (s, e) in cands
            if not any((s2, e2) != (s, e) and s2 >= s and e2 <= e for (s2, e2) in cands)
        ]
        out |= {(conv, s, e - s) for (s, e) in minimal}
    return out


def test_and_query_minimal_intervals(turns, turns_pdf):
    a = term_query(turns, "tool", "bash")
    b = term_query(turns, "tool", "search")
    got = hits_set(and_query(a, b))
    want = _brute_minimal_windows([hits_set(a), hits_set(b)])
    assert got == want
    assert got


def test_and_query_antichain_adversarial(spark):
    """Regression: the pre-r3 queue sweep over-emitted non-minimal
    windows on inputs like this (child0 (3,8),(4,9): window [3,9]
    contains [3,8] and must NOT be in the antichain). Random fuzz vs
    the brute oracle on top."""
    import random

    rng = random.Random(11)
    rows_a = [("c0", 3, 5), ("c0", 4, 5), ("c0", 9, 4)]
    rows_b = [("c0", 3, 5), ("c0", 11, 1), ("c0", 17, 2)]
    for trial in range(30):
        conv = f"f{trial}"
        for rows in (rows_a, rows_b):
            for _ in range(rng.randint(1, 6)):
                s = rng.randint(0, 25)
                rows.append((conv, s, rng.randint(1, 5)))
    a = spark.createDataFrame(rows_a, "conv_id string, pos int, len int")
    b = spark.createDataFrame(rows_b, "conv_id string, pos int, len int")
    got = hits_set(and_query(a, b))
    want = _brute_minimal_windows([set(rows_a), set(rows_b)])
    assert got == want
    assert ("c0", 3, 5) in got and ("c0", 3, 6) not in got


def test_and_query_hit_dense_stress(spark):
    """A hit-dense conversation (10^5 hits per child) must sweep in
    vectorized time, not per-hit Python time."""
    import time

    import numpy as np

    n = 100_000
    rng = np.random.default_rng(5)
    pa = np.sort(rng.integers(0, 10_000_000, n))
    pb = np.sort(rng.integers(0, 10_000_000, n))
    a = spark.createDataFrame(
        pd.DataFrame({"conv_id": "dense", "pos": pa, "len": 3}))
    b = spark.createDataFrame(
        pd.DataFrame({"conv_id": "dense", "pos": pb, "len": 3}))
    t0 = time.monotonic()
    got = and_query(a, b)
    cnt = got.count()
    wall = time.monotonic() - t0
    assert cnt > 10_000
    # sanity: every window covers >=1 hit start from each child
    sample = got.limit(500).toPandas()
    for r in sample.itertuples(index=False):
        for p in (pa, pb):
            i = np.searchsorted(p, r.pos, side="left")
            assert i < len(p) and p[i] + 3 <= r.pos + r.len
    assert wall < 60, f"hit-dense and_query took {wall:.1f}s"


# ---------------------------------------------------------------------------
# terms queries vs pandas value_counts
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def tokens(turns):
    t = tokenize(turns).cache()
    t.count()
    return t


def _pdf_tokens(turns_pdf):
    rows = []
    for r in turns_pdf.itertuples(index=False):
        if r.text is None or not r.text.strip():
            continue
        for tok in r.text.lower().strip().split():
            rows.append((r.conv_id, tok))
    return pd.DataFrame(rows, columns=["doc_id", "term"])


def test_document_terms(tokens, turns_pdf):
    doc = "conv-00000005"
    got = {(r["term"], r["count"]) for r in document_terms(tokens, doc).collect()}
    pdf = _pdf_tokens(turns_pdf)
    want = set(pdf[pdf.doc_id == doc].groupby("term").size().items())
    assert got == want


def test_or_and_terms(tokens, turns_pdf):
    docs = ["conv-00000005", "conv-00000006"]
    pdf = _pdf_tokens(turns_pdf)
    sub = pdf[pdf.doc_id.isin(docs)]
    want_or = set(sub.groupby("term").size().items())
    got_or = {(r["term"], r["count"]) for r in documents_or_terms(tokens, docs).collect()}
    assert got_or == want_or
    present_in_all = set(sub.groupby("term")["doc_id"].nunique()
                         .pipe(lambda s: s[s == len(docs)]).index)
    got_and = {r["term"] for r in documents_and_terms(tokens, docs).collect()}
    assert got_and == present_in_all


def test_top_k_terms_deterministic(tokens):
    a = [tuple(r) for r in top_k_terms(tokens, 10).collect()]
    b = [tuple(r) for r in top_k_terms(tokens, 10).collect()]
    assert a == b and len(a) == 10
    counts = [c for (_, c) in a]
    assert counts == sorted(counts, reverse=True)


# ---------------------------------------------------------------------------
# external binding sources (SPARQL-helper analogue)
# ---------------------------------------------------------------------------

def test_external_bindings_restrict_and_annotate(spark, tmp_path):
    import json

    from mimir_spark.sources.external import (external_annotate,
                                              external_restrict,
                                              load_bindings)

    hits = spark.createDataFrame(
        [("c1", 0, 1), ("c2", 1, 1), ("c3", 2, 2)],
        "conv_id string, pos int, len int")

    jpath = tmp_path / "bindings.json"
    jpath.write_text("\n".join(json.dumps({"conv_id": c, "label": f"L{c}"})
                               for c in ["c1", "c3", "c9"]))
    b = load_bindings(spark, str(jpath))
    got = external_restrict(hits, b).toPandas().sort_values("conv_id")
    assert got["conv_id"].tolist() == ["c1", "c3"]
    # plan: broadcast semi-join, never a shuffle of the big side
    plan = external_restrict(hits, b)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan

    ann = external_annotate(hits, b, on="conv_id").toPandas() \
        .sort_values("conv_id")
    assert ann.loc[ann.conv_id == "c1", "label"].iloc[0] == "Lc1"
    assert ann["label"].isna().sum() == 1  # c2 has no binding

    cpath = tmp_path / "bindings.csv"
    cpath.write_text("conv_id\nc2\n")
    b2 = load_bindings(spark, str(cpath))
    assert external_restrict(hits, b2).count() == 1


def test_default_stopwords_match_reference():
    """The default stop-word list is the reference's verbatim
    (AbstractIndexTermsQuery.java DEFAULT_STOP_WORDS)."""
    import re
    from pathlib import Path

    from mimir_spark.operators.terms import DEFAULT_STOPWORDS

    ref = Path("/root/reference/mimir-core/src/main/java/gate/mimir/"
               "search/terms/AbstractIndexTermsQuery.java")
    if not ref.exists():
        pytest.skip("reference tree not available")
    m = re.search(r"DEFAULT_STOP_WORDS = new String\[\]\{(.*?)\};",
                  ref.read_text(), re.S)
    words = [w.replace("\\\\", "\\").replace('\\"', '"')
             for w in re.findall(r'"((?:[^"\\]|\\.)*)"', m.group(1))]
    assert set(words) == set(DEFAULT_STOPWORDS)


# ---------------------------------------------------------------------------
# and_terms / const_terms (AndTermsQuery.java:55-110, ConstTermsQuery.java)
# ---------------------------------------------------------------------------

def _ts(rows):
    return rows  # readability alias for (term, count) lists


def test_const_terms_literal(spark):
    from mimir_spark.operators.terms import const_terms

    got = {(r["term"], r["count"])
           for r in const_terms(spark, [("a", 3), ("b", 1)]).collect()}
    assert got == {("a", 3), ("b", 1)}


@pytest.mark.parametrize("strategy", ["FIRST", "MAX", "MIN", "SUM"])
def test_and_terms_idempotent(spark, tokens, strategy):
    """Metamorphic: and_terms(s, s) == s for every count strategy
    except SUM (which doubles counts — checked separately)."""
    from mimir_spark.operators.terms import and_terms, documents_or_terms

    s = documents_or_terms(tokens, ["conv-00000005", "conv-00000006"])
    base = {(r["term"], r["count"]) for r in s.collect()}
    got = {(r["term"], r["count"])
           for r in and_terms([s, s], strategy).collect()}
    if strategy == "SUM":
        assert got == {(t, 2 * c) for t, c in base}
    else:
        assert got == base


def test_and_terms_intersection_and_strategies(spark):
    from mimir_spark.operators.terms import and_terms, const_terms

    s0 = const_terms(spark, [("x", 5), ("y", 2), ("only0", 1)])
    s1 = const_terms(spark, [("x", 3), ("y", 7), ("only1", 9)])
    runs = {st: {(r["term"], r["count"])
                 for r in and_terms([s0, s1], st).collect()}
            for st in ["FIRST", "MAX", "MIN", "SUM"]}
    assert runs["FIRST"] == {("x", 5), ("y", 2)}
    assert runs["MAX"] == {("x", 5), ("y", 7)}
    assert runs["MIN"] == {("x", 3), ("y", 2)}
    assert runs["SUM"] == {("x", 8), ("y", 9)}


def test_and_terms_skips_nonpositive_counts(spark):
    """The reference's combiner ignores counts <= 0 (computeCompoundCount's
    aCount > 0 guard) while membership is by presence."""
    from mimir_spark.operators.terms import and_terms, const_terms

    s0 = const_terms(spark, [("x", 0), ("z", 0)])
    s1 = const_terms(spark, [("x", 4), ("z", 0)])
    got = {(r["term"], r["count"])
           for r in and_terms([s0, s1], "FIRST").collect()}
    # x: first POSITIVE count wins (4, from s1); z: no positive -> 0
    assert got == {("x", 4), ("z", 0)}


def test_and_terms_empty_and_errors(spark):
    from mimir_spark.operators.terms import and_terms, const_terms

    s0 = const_terms(spark, [("a", 1)])
    s1 = const_terms(spark, [("b", 1)])
    assert and_terms([s0, s1]).count() == 0  # disjoint -> empty
    with pytest.raises(ValueError):
        and_terms([])
    with pytest.raises(ValueError):
        and_terms([s0], "BOGUS")


# ---------------------------------------------------------------------------
# sub-bindings (Binding.java:28-86 containedBindings)
# ---------------------------------------------------------------------------

def test_sequence_sub_bindings(spark, turns):
    """keep_sub carries each child's (pos, len); children are numbered
    left to right; the envelope equals the flat hit."""
    from mimir_spark.operators.hits import sequence, term_query

    a = term_query(turns, "role", "user")
    b = term_query(turns, "role", "assistant")
    flat = {(r["conv_id"], r["pos"], r["len"])
            for r in sequence([a, b]).collect()}
    rich = sequence([a, b], keep_sub=True).collect()
    assert {(r["conv_id"], r["pos"], r["len"]) for r in rich} == flat
    for r in rich:
        subs = sorted(r["sub"], key=lambda s: s["child"])
        assert [s["child"] for s in subs] == [0, 1]
        # child 0 starts the hit; child 1 ends it; spans abut (gap 0)
        assert subs[0]["pos"] == r["pos"]
        assert subs[0]["pos"] + subs[0]["len"] == subs[1]["pos"]
        assert subs[1]["pos"] + subs[1]["len"] == r["pos"] + r["len"]


def test_sequence_sub_bindings_three_way_with_gap(spark, turns):
    from mimir_spark.operators.hits import sequence, term_query

    a = term_query(turns, "role", "user")
    b = term_query(turns, "role", "assistant")
    c = term_query(turns, "role", "tool")
    rich = sequence([a, b, c], gaps=[(0, 1), (0, 2)], keep_sub=True)
    rows = rich.limit(50).collect()
    assert rows
    for r in rows:
        subs = sorted(r["sub"], key=lambda s: s["child"])
        assert [s["child"] for s in subs] == [0, 1, 2]
        g1 = subs[1]["pos"] - (subs[0]["pos"] + subs[0]["len"])
        g2 = subs[2]["pos"] - (subs[1]["pos"] + subs[1]["len"])
        assert 0 <= g1 <= 1 and 0 <= g2 <= 2


def test_within_preserves_sub_bindings(spark, turns):
    from mimir_spark.operators.hits import (document_query, sequence,
                                            term_query, within_query)

    a = term_query(turns, "role", "user")
    b = term_query(turns, "role", "assistant")
    from pyspark.sql import functions as F

    seq = sequence([a, b], keep_sub=True)
    outer = document_query(turns, F.col("n_turns") >= 2)
    out = within_query(seq, outer)
    assert "sub" in out.columns
    r = out.first()
    assert len(r["sub"]) == 2


def test_render_sub_bindings_highlights_children(spark, turns):
    """Each child's rendered snippet is exactly the text of the turns
    that child covers — the highlight drill-down."""
    from mimir_spark.operators.hits import (render_sub_bindings, sequence,
                                            term_query)

    a = term_query(turns, "role", "user")
    b = term_query(turns, "role", "assistant")
    rich = sequence([a, b], keep_sub=True)
    rendered = render_sub_bindings(turns, rich).limit(30).collect()
    assert rendered
    tmap = {(r["conv_id"], r["turn_idx"]): (r["role"], r["text"])
            for r in turns.collect()}
    roles = {0: "user", 1: "assistant"}
    for r in rendered:
        assert r["sub_len"] == 1
        role, text = tmap[(r["conv_id"], r["sub_pos"])]
        assert role == roles[r["child"]]
        assert r["snippet"] == f"{role}: {text}"
