"""Query-string <-> index tokenizer parity.

The reference parses query strings with the SAME tokenizer chain used
at indexing time (QueryParser.jj:404-459; doc/searching.tex:55-67), so
a term the index produced is always findable by typing it back into a
query. Our engine's contract is the analogue for ITS tokenizer (the
whitespace tokenizer, terms.WS_RE + downcase): for every token the
index emits from a document, some query-language spelling of that
token — bare, backslash-escaped, or quoted — must hit that document,
with identical downcasing and identical whitespace splitting on both
sides.

Documented divergence from GATE's tokenizer (SURVEY.md §2.7): GATE
splits words at punctuation ("can't" -> can ' t, "state-of-the-art" ->
5 tokens), while this engine's whitespace tokenizer keeps punctuation
attached. That choice is INTERNALLY consistent — both the index and
the query language see the same punctuation-attached terms — which is
the property the reference actually guarantees and these tests pin.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mimir_spark.operators import terms as TERMS
from mimir_spark.query_parser import QueryParseError, parse, run_query

# one doc per adversarial word; text embeds the word between plain words
ADVERSARIAL_WORDS = [
    "can't",                # apostrophe (GATE would split; we keep)
    "state-of-the-art",     # hyphens
    "u.s.",                 # dots — query syntax chars, needs quoting
    "o'neill-smith",        # apostrophe + hyphen
    "don't.stop",           # apostrophe + dot
    "(parens)",             # query grouping chars
    "a+b",                  # repeat operator char
    "x=y",                  # comparison char
    "semi:colon",           # named-index separator
    "q?mark",               # optional char
    "CafÉ",                 # accented + mixed case
    "İstanbul",             # dotted capital I (locale-sensitive lower)
    "STRASSE",              # ß family
    "ΒΟΛΟΣ",                # greek, final sigma under lowercasing
    "naïve—dash",           # em-dash (not whitespace: stays one token)
    "tab nbsp",        # NBSP is NOT index whitespace: one token
]


def _docs_df(spark):
    rows = [(i, f"alpha {w} omega") for i, w in enumerate(ADVERSARIAL_WORDS)]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["conv_id", "text"])
    ).withColumn("turn_idx", F.lit(0))


def _spellings(word: str) -> list[str]:
    """Query-language spellings that should resolve to the word as ONE
    term: quoted always works; bare/escaped when lexable."""
    out = [f'"{word}"']
    escaped = "".join(
        ("\\" + c) if c in '(){}[]:,=<>|&+?."\\' else c for c in word
    )
    out.append(escaped)
    return out


@pytest.fixture(scope="module")
def docs(spark):
    df = _docs_df(spark).persist()
    df.count()
    yield df
    df.unpersist()


@pytest.mark.parametrize("word", ADVERSARIAL_WORDS)
def test_index_token_is_query_findable(spark, docs, word):
    """Every token the index tokenizer emits is findable by querying
    its own spelling — the reference's core tokenizer-parity
    guarantee, on punctuation/apostrophe/hyphen/unicode words."""
    doc_id = ADVERSARIAL_WORDS.index(word)
    toks = {
        r["term"]
        for r in TERMS.tokenize(docs.filter(F.col("conv_id") == doc_id))
        .collect()
    }
    assert len(toks) == 3, (word, toks)  # alpha, word, omega — no splits
    for q in _spellings(word):
        hits = run_query(q, docs).collect()
        assert any(h["conv_id"] == doc_id for h in hits), (word, q)


@pytest.mark.parametrize("word", ADVERSARIAL_WORDS)
def test_query_downcase_matches_index_downcase(spark, docs, word):
    """The query side must downcase with the same engine as the index
    (JVM lower), pinned by querying the UPPERCASED spelling and still
    hitting — catches Python-vs-JVM unicode case-map drift (dotted I,
    final sigma)."""
    doc_id = ADVERSARIAL_WORDS.index(word)
    upper = word.upper()
    # only meaningful when uppercasing round-trips through the SAME
    # token under JVM lowercasing (ss/SS-style folds don't; skip those)
    row = spark.sql("SELECT lower(:a) AS la, lower(:b) AS lb",
                    args={"a": upper, "b": word}).first()
    if row["la"] != row["lb"]:
        pytest.skip(f"{word!r} does not round-trip through upper()")
    hits = run_query(f'"{upper}"', docs).collect()
    assert any(h["conv_id"] == doc_id for h in hits), (word, upper)


def test_quoted_phrase_splits_like_index_tokenizer(spark, docs):
    """Quoted phrases split on EXACTLY the index tokenizer's
    whitespace class [ \\t\\n\\r]+ — \\x0b, \\x0c, NBSP and friends
    stay INSIDE a term on both sides."""
    # NBSP word: index emits one token; a quoted phrase containing it
    # must stay ONE term (str.split() would have split it into two)
    node = parse('"tab nbsp"')
    from mimir_spark.query_parser import Term

    assert node == Term("tab nbsp")
    # real whitespace still splits into a sequence
    node2 = parse('"alpha\tomega"')
    assert not isinstance(node2, Term)
    # and the NBSP term actually matches its document
    doc_id = ADVERSARIAL_WORDS.index("tab nbsp")
    hits = run_query('"tab nbsp"', docs).collect()
    assert any(h["conv_id"] == doc_id for h in hits)


def test_every_index_term_of_fixture_is_query_findable(spark):
    """Corpus-level sweep on the committed transcript fixture: every
    distinct term the index tokenizer emits (punctuation and all) is
    findable via its quoted spelling. Bounded to the distinct-term
    set; guards against future tokenizer drift on real text."""
    fixture = "fixtures/transcripts_small.parquet"
    import pathlib

    root = pathlib.Path(__file__).resolve().parents[1]
    t = (spark.read.parquet(str(root / fixture))
         .select("conv_id", "turn_idx", "text"))
    toks = TERMS.tokenize(t).select("term").distinct()
    terms = [r["term"] for r in toks.collect()]
    assert len(terms) > 50
    # term -> doc set from ONE index scan (driver-side dict), then the
    # query path for a bounded deterministic sample of terms
    tok_pdf = TERMS.tokenize(t).select("doc_id", "term").distinct().toPandas()
    want_by_term = tok_pdf.groupby("term")["doc_id"].apply(set).to_dict()
    sample = [w for w in sorted(terms)[::7]
              if '"' not in w and "\\" not in w][:25]
    assert len(sample) >= 10
    for term in sample:
        got = {r["conv_id"] for r in run_query(f'"{term}"', t).collect()}
        assert got == want_by_term[term], term


def test_unlexable_bare_spellings_fail_loudly():
    """Bare (unquoted, unescaped) punctuation that collides with query
    syntax must be a PARSE structure, not a silent wrong term — the
    documented reason quoted spellings exist."""
    # "u.s." lexes as tok '.' tok '.' — trailing '.' is not an atom
    with pytest.raises(QueryParseError):
        parse("u.s.")
