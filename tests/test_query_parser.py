"""Query-string language: acceptance against the reference's own
17-string corpus (TestQueryParser.java:51-147) plus execution
semantics over a tiny turns frame and the algebra identities the
reference itself tests (TestQueries.java:153-252)."""

from __future__ import annotations

import pandas as pd
import pytest

from mimir_spark import query_parser as QP
from mimir_spark.query_parser import Ann, Bin, Repeat, Seq, Term, parse, run_query

# the reference's acceptance corpus, verbatim (unescaped from Java)
CORPUS = [
    '{Measurement normalisedUnit="m"  normalisedValue<=30}',
    '"A AND OR B"',
    'A "AND" \\+ "OR" B',
    "A AND B",
    "15 September 2007",
    "Thîs ís à teßt €12 and 23¢",
    "A OR B",
    "{A}",
    '{A f1Key.REGEX("f1Value", "flasgs") f2Key="f2Value IN Quotes" '
    'f3Key>= 5.4 unit="1©" }',
    "{A} OVER {B}",
    "{A} IN {B}",
    "{A} [1..4] {B}",
    "{A}+3..5",
    "{A}+3",
    "root:be",
    "{A} {B} ({A} | {B})",
    '({A} | {B}) IN (\\"Going for\\" [1..4] (root:trade | root:sale))',
]


@pytest.mark.parametrize("q", CORPUS)
def test_acceptance_corpus_parses(q):
    assert parse(q) is not None


def test_ast_shapes():
    assert parse("root:be") == Term("be", index="root")
    assert parse("A AND B") == Bin("AND", Term("A"), Term("B"))
    assert parse('"A AND OR B"') == Seq(
        (Term("A"), Term("AND"), Term("OR"), Term("B")),
        ((0, 0), (0, 0), (0, 0)))
    assert parse("{A} [1..4] {B}") == Seq((Ann("A"), Ann("B")), ((1, 4),))
    assert parse("{A}+3..5") == Repeat(Ann("A"), 3, 5)
    assert parse("{A}+3") == Repeat(Ann("A"), 3, 3)
    node = parse('{Measurement normalisedUnit="m" normalisedValue<=30}')
    assert node == Ann("Measurement", (("normalisedUnit", "EQ", "m"),
                                       ("normalisedValue", "LE", 30)))
    # single gap number = max, min 0 (GapQuery production)
    assert parse("a [2] b") == Seq((Term("a"), Term("b")), ((0, 2),))


def test_parse_errors():
    for bad in ["{", "(a", "a +", "a [x] b", "{A f1 ~ 3}"]:
        with pytest.raises(QP.QueryParseError):
            parse(bad)


@pytest.fixture(scope="module")
def turns(spark):
    rows = [
        # conv, idx, role, text, tool
        ("c1", 0, "user", "please fix the build", None),
        ("c1", 1, "assistant", "running the build now", None),
        ("c1", 2, "tool", "build output ok", "bash"),
        ("c1", 3, "assistant", "the build is fixed", None),
        ("c2", 0, "user", "search the docs", None),
        ("c2", 1, "tool", "docs found", "search"),
        ("c2", 2, "assistant", "here are the docs", None),
    ]
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role",
                                      "text", "tool"])
    pdf["ts"] = pd.to_datetime(
        [1_700_000_000_000_000 + i * 60_000_000 for i in range(len(pdf))],
        unit="us")
    return spark.createDataFrame(
        pdf, "conv_id string, turn_idx int, role string, text string, "
             "tool string, ts timestamp")


def _hits(df):
    return sorted(map(tuple, df.select("conv_id", "pos", "len").collect()))


def test_term_matches_text_tokens(turns):
    assert _hits(run_query("build", turns)) == [
        ("c1", 0, 1), ("c1", 1, 1), ("c1", 2, 1), ("c1", 3, 1)]
    assert _hits(run_query("Build", turns)) == _hits(run_query("build", turns))


def test_named_index_term(turns):
    assert _hits(run_query("role:tool", turns)) == [("c1", 2, 1), ("c2", 1, 1)]
    assert _hits(run_query("tool:bash", turns)) == [("c1", 2, 1)]


def test_sequence_and_gap(turns):
    # 'fix' (turn 0) followed within 0..2 gaps by 'output' (turn 2)
    assert _hits(run_query("fix [2] output", turns)) == [("c1", 0, 3)]
    assert _hits(run_query("fix output", turns)) == []
    # adjacent: 'running' then tool turn
    assert _hits(run_query("running {Tool}", turns)) == [("c1", 1, 2)]


def test_or_and_in_over_minus(turns):
    assert _hits(run_query("fix | search", turns)) == [
        ("c1", 0, 1), ("c2", 0, 1)]
    # minimal window containing both
    assert _hits(run_query("fix & fixed", turns)) == [("c1", 0, 4)]
    assert _hits(run_query("build IN ({Document n_turns>3})", turns)) == [
        ("c1", 0, 1), ("c1", 1, 1), ("c1", 2, 1), ("c1", 3, 1)]
    assert _hits(run_query("{Document n_turns>0} OVER (docs found)", turns)) \
        == [("c2", 0, 3)]
    # MINUS removes exact (conv,pos,len) matches: drop the user's build turn
    assert _hits(run_query(
        'build MINUS {Turn role=user text.REGEX(".*build.*")}', turns)) == [
        ("c1", 1, 1), ("c1", 2, 1), ("c1", 3, 1)]


def test_annotation_types(turns):
    assert _hits(run_query("{Tool name=search}", turns)) == [("c2", 1, 1)]
    assert _hits(run_query("{Turn role=assistant}", turns)) == [
        ("c1", 1, 1), ("c1", 3, 1), ("c2", 2, 1)]
    assert _hits(run_query('{Turn text.REGEX(".*docs.*")}', turns)) == [
        ("c2", 0, 1), ("c2", 1, 1), ("c2", 2, 1)]


def test_repeats_identity(turns):
    """seq x3 == +3..3 — the reference's own identity
    (TestQueries.java:209-226)."""
    a = "{Turn role=assistant}"
    got = _hits(run_query(f"({a})+2..2", turns))
    want = _hits(run_query(f"{a} {a}", turns))
    # +2 requires consecutive (zero-gap) runs; seq with gap 0 likewise
    assert got == want


def test_gap_subset_invariant(turns):
    """no-gap results subset of gap results (TestQueries.java:153-172)."""
    no_gap = set(_hits(run_query("fix output", turns)))
    gap = set(_hits(run_query("fix [3] output", turns)))
    assert no_gap <= gap


# ---------------------------------------------------------------------------
# property-based round trip: parse(render(ast)) == ast
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_ident = st.from_regex(r"[a-z][a-z0-9_]{0,8}", fullmatch=True) \
    .filter(lambda s: s.upper() not in {"OR", "AND", "IN", "OVER",
                                        "MINUS", "REGEX"})
_word = st.one_of(_ident, st.sampled_from(
    ["AND", "OR", "IN", "teßt", "€12", "a.b", "x+y", "c:d"]))


def _terms():
    return st.one_of(
        st.builds(Term, _word),
        st.builds(Term, _word, index=_ident),
    )


def _anns():
    value = st.one_of(_word, st.integers(-50, 50),
                      st.floats(-5, 5, allow_nan=False).map(
                          lambda f: round(f, 3)))
    con = st.tuples(_ident, st.sampled_from(["EQ", "LT", "GT", "LE", "GE"]),
                    value)
    regex_con = st.tuples(_ident, st.just("REGEX"), _ident)
    return st.builds(
        lambda t, cs: Ann(t, tuple(cs)),
        _ident, st.lists(st.one_of(con, regex_con), max_size=3))


def _ast(depth=3):
    leaf = st.one_of(_terms(), _anns())
    if depth == 0:
        return leaf
    sub = _ast(depth - 1)
    gap = st.tuples(st.integers(0, 5), st.integers(0, 5)).map(
        lambda g: (min(g), max(g)))
    seq = st.builds(
        lambda items, gaps: Seq(tuple(items), tuple(gaps[:len(items) - 1])),
        st.lists(sub, min_size=2, max_size=3),
        st.lists(gap, min_size=2, max_size=2))
    rep = st.builds(lambda c, m, extra: Repeat(c, m, m + extra),
                    sub, st.integers(1, 3), st.integers(0, 2))
    binop = st.builds(Bin, st.sampled_from(["OR", "AND", "IN", "OVER",
                                            "MINUS"]), sub, sub)
    return st.one_of(leaf, seq, rep, binop)


@given(_ast())
@settings(max_examples=200, deadline=None)
def test_render_parse_roundtrip(ast):
    assert parse(QP.render(ast)) == ast


def test_gap_and_repeat_validation():
    for bad in ["a [-2] b", "a [1.5] b", "a [4..1] b", "a+3.5", "a+0",
                "a+3..2"]:
        with pytest.raises(QP.QueryParseError):
            parse(bad)


# ---------------------------------------------------------------------------
# materialized inverted token index (postings-lookup analogue)
# ---------------------------------------------------------------------------

def test_token_index_equals_scan_and_prunes(spark, t_small_df,
                                            tmp_path_factory):
    """A term lookup through the bucket-partitioned index returns
    EXACTLY the scan-based hit set, and the plan shows partition
    pruning on tb plus the term equality pushed into the pruned scan —
    the skipTo/postings behavior of the reference's TermQuery."""
    from pyspark.sql import functions as F

    from mimir_spark.ingest import ingest
    from mimir_spark.query_parser import run_query
    from mimir_spark.sources import token_index as TI

    # index the INGESTED canonical table (dedup'd): raw duplicate rows
    # would make the scan path emit duplicate hits the distinct index
    # cannot represent — ingest is where that ambiguity dies
    t_small_df = ingest(t_small_df).cache()

    path = str(tmp_path_factory.mktemp("tindex") / "tokens")
    TI.write_token_index(t_small_df, path)
    resolver = TI.indexed_term_resolver(spark, path)

    # pick real corpus terms with different frequencies
    terms = [r["term"] for r in (
        TI.token_postings(t_small_df).groupBy("term").count()
        .orderBy(F.desc("count"), "term").limit(3).collect())]
    terms.append("outlier")           # committed conv-0 edge row
    terms.append("zzz-not-a-term")    # absent term -> empty
    for term in terms:
        scan = run_query(term, t_small_df).toPandas()
        idx = run_query(term, t_small_df, term_index=resolver).toPandas()
        key = ["conv_id", "pos"]
        assert sorted(map(tuple, scan[key].values.tolist())) == \
            sorted(map(tuple, idx[key].values.tolist())), term

    # phrase + compound operators compose over indexed leaves
    q = f'"{terms[0]} {terms[1]}" OR {terms[3]}'
    scan = run_query(q, t_small_df).toPandas()
    idx = run_query(q, t_small_df, term_index=resolver).toPandas()
    assert sorted(map(tuple, scan.values.tolist())) == \
        sorted(map(tuple, idx.values.tolist()))

    # plan evidence: pruned partitions + pushed term predicate
    plan = TI.term_query_indexed(spark, path, terms[0]) \
        ._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters: [", 1)
    assert len(pf) == 2 and "tb" in pf[1].split("]", 1)[0], plan
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "term" in pushed, plan
    # the store has more buckets than the single probed one
    n_all = len({f.split("tb=")[1].split("/")[0]
                 for f in spark.read.parquet(path).inputFiles()})
    assert n_all > 1


def test_term_doc_index_counts_equal_scan(spark, tmp_path_factory):
    """The materialized direct index serves the terms algebra with
    EXACT scan parity (count = sum of per-doc tf), and a per-term doc
    lookup prunes to one bucket partition."""
    from pyspark.sql import functions as F

    from mimir_spark.operators import terms as TERMS
    from mimir_spark.sources import token_index as TI

    docs = spark.read.parquet(
        "/root/testdata/sf0.01/documents.parquet").select("doc_id", "text")
    path = str(tmp_path_factory.mktemp("tdindex") / "termdoc")
    TI.write_term_doc_index(docs, path)

    scan = TERMS.term_type_terms(TERMS.tokenize(docs, id_col="doc_id")) \
        .toPandas().sort_values("term").reset_index(drop=True)
    idx = TI.term_counts_indexed(spark, path) \
        .toPandas().sort_values("term").reset_index(drop=True)
    assert scan["term"].tolist() == idx["term"].tolist()
    assert scan["count"].tolist() == idx["count"].tolist()

    term = scan.sort_values("count", ascending=False)["term"].iloc[0]
    hits = TI.term_docs_indexed(spark, path, term)
    plan = hits._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters: [", 1)
    assert len(pf) == 2 and "tb" in pf[1].split("]", 1)[0], plan
    # tf recovered through the lookup matches the scan count
    assert int(hits.agg(F.sum("tf")).first()[0]) == \
        int(scan.set_index("term").loc[term, "count"])
