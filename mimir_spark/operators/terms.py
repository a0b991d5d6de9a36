"""Terms-query algebra: the reference's direct-index count surface
(search/terms/*.java) as DataFrame aggregations.

A terms result is a DataFrame (term string, count long [, n_docs]) —
the columnar TermsResultSet (TermsResultSet.java:41-100). The direct
index itself (term<->doc transpose, AtomicIndex.java:1089-1271) is not
materialized: Spark's hash aggregation over the token stream IS the
transpose, with partial+final aggregation replacing the per-batch
counter visitors (AbstractIndexTermsQuery.java:225-300).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# The reference's full default list, transcribed verbatim
# (AbstractIndexTermsQuery.java DEFAULT_STOP_WORDS, lines 111-156):
# punctuation tokens, digits, single letters, and ~260 English function
# words. Callers can pass their own list to any terms query.
DEFAULT_STOPWORDS = [
    ",", ".", "?", "!", ":", ";", "#", "~", "^", "@", "%", "&", "(", ")",
    "[", "]", "{", "}", "|", "\\", "<", ">", "-", "+", "*", "/", "=", "'",
    '"', "'s", "1", "2", "3", "4", "5", "6", "7", "8", "9", "0",
    "a", "about", "above", "across", "after", "afterwards", "again",
    "against", "all", "almost", "alone", "along", "already", "also",
    "although", "always", "am", "among", "amongst", "amoungst", "amount",
    "an", "and", "another", "any", "anyhow", "anyone", "anything", "anyway",
    "anywhere", "are", "around", "as", "at",
    "b", "back", "be", "became", "because", "become", "becomes", "becoming",
    "been", "before", "beforehand", "behind", "being", "below", "beside",
    "besides", "between", "beyond", "bill", "both", "bottom", "but", "by",
    "c", "call", "can", "cannot", "cant", "co", "con", "could", "couldnt",
    "cry",
    "d", "de", "describe", "detail", "do", "done", "down", "due", "during",
    "e", "each", "eg", "eight", "either", "eleven", "else", "elsewhere",
    "empty", "enough", "etc", "even", "ever", "every", "everyone",
    "everything", "everywhere", "except",
    "f", "few", "fifteen", "fify", "fill", "find", "fire", "first", "five",
    "for", "former", "formerly", "forty", "found", "four", "from", "front",
    "full", "further",
    "g", "get", "give", "go",
    "h", "had", "has", "hasnt", "have", "he", "hence", "her", "here",
    "hereafter", "hereby", "herein", "hereupon", "hers", "herself", "him",
    "himself", "his", "how", "however", "hundred",
    "i", "ie", "if", "in", "inc", "indeed", "interest", "into", "is", "it",
    "its", "itself",
    "j", "k", "keep",
    "l", "last", "latter", "latterly", "least", "less", "ltd",
    "m", "made", "many", "may", "me", "meanwhile", "might", "mill", "mine",
    "more", "moreover", "most", "mostly", "move", "much", "must", "my",
    "myself",
    "n", "name", "namely", "neither", "never", "nevertheless", "next",
    "nine", "no", "nobody", "none", "noone", "nor", "not", "nothing", "now",
    "nowhere",
    "o", "of", "off", "often", "on", "once", "one", "only", "onto", "or",
    "other", "others", "otherwise", "our", "ours", "ourselves", "out",
    "over", "own",
    "p", "part", "per", "perhaps", "please", "put",
    "q",
    "r", "rather", "re",
    "s", "same", "see", "seem", "seemed", "seeming", "seems", "serious",
    "several", "she", "should", "show", "side", "since", "sincere", "six",
    "sixty", "so", "some", "somehow", "someone", "something", "sometime",
    "sometimes", "somewhere", "still", "such", "system",
    "t", "take", "ten", "than", "that", "the", "their", "them",
    "themselves", "then", "thence", "there", "thereafter", "thereby",
    "therefore", "therein", "thereupon", "these", "they", "thickv", "thin",
    "third", "this", "those", "though", "three", "through", "throughout",
    "thru", "thus", "to", "together", "too", "top", "toward", "towards",
    "twelve", "twenty", "two",
    "u", "un", "under", "until", "up", "upon", "us",
    "v", "very", "via",
    "w", "was", "we", "well", "were", "what", "whatever", "when", "whence",
    "whenever", "where", "whereafter", "whereas", "whereby", "wherein",
    "whereupon", "wherever", "whether", "which", "while", "whither", "who",
    "whoever", "whole", "whom", "whose", "why", "will", "with", "within",
    "without", "would",
    "x", "y", "yet", "you", "your", "yours", "yourself", "yourselves", "z",
]

WS_RE = "[ \\t\\n\\r]+"


def tokenize(docs: DataFrame, id_col: str = "conv_id", text_col: str = "text",
             downcase: bool = True) -> DataFrame:
    """(doc, text) -> one row per token position: (id, pos, term).

    The DowncaseTermProcessor analogue (MimirTestUtils.java:69-73)."""
    text = F.lower(F.col(text_col)) if downcase else F.col(text_col)
    toks = F.split(F.trim(text), WS_RE)
    return (
        docs.filter(F.col(text_col).isNotNull() & (F.length(F.trim(F.col(text_col))) > 0))
        .select(F.col(id_col).alias("doc_id"), F.posexplode(toks).alias("pos", "term"))
        .filter(F.length("term") > 0)  # IgnoreEmptiesTermProcessor analogue
    )


def document_terms(tokens: DataFrame, doc_id) -> DataFrame:
    """Terms (with counts) in one document (DocumentTermsQuery.java:27-78)."""
    return (
        tokens.filter(F.col("doc_id") == F.lit(doc_id))
        .groupBy("term").agg(F.count("*").alias("count"))
    )


def documents_or_terms(tokens: DataFrame, doc_ids: list) -> DataFrame:
    """Union of term sets over a doc set, counts summed
    (DocumentsOrTermsQuery.java:76-85)."""
    return (
        tokens.filter(F.col("doc_id").isin(doc_ids))
        .groupBy("term").agg(F.count("*").alias("count"))
    )


def documents_and_terms(tokens: DataFrame, doc_ids: list) -> DataFrame:
    """Terms present in EVERY doc of the set
    (DocumentsAndTermsQuery.java:74-83)."""
    n = len(set(doc_ids))
    return (
        tokens.filter(F.col("doc_id").isin(doc_ids))
        .groupBy("term")
        .agg(F.count("*").alias("count"),
             F.countDistinct("doc_id").alias("_n_docs"))
        .filter(F.col("_n_docs") == n)
        .drop("_n_docs")
    )


def term_type_terms(tokens: DataFrame,
                    stopwords: list[str] | None = None) -> DataFrame:
    """Full-dictionary facet with stop-word filter
    (TermTypeTermsQuery.java:164-222)."""
    sw = DEFAULT_STOPWORDS if stopwords is None else stopwords
    return (
        tokens.filter(~F.col("term").isin(sw))
        .groupBy("term").agg(F.count("*").alias("count"))
    )


OR_TERMS_STRATEGIES = ("FIRST", "MAX", "MIN", "SUM")


def or_terms(term_sets: list[DataFrame], strategy: str = "SUM") -> DataFrame:
    """K-way union of terms result sets with a count-combination
    strategy (OrTermsQuery.java:63-152, computeCompoundCount):

    - SUM:   counts added across inputs
    - MAX/MIN: extreme count across inputs
    - FIRST: the count from the FIRST (lowest-index) input containing
      the term — input order is significant, so each set is tagged
      with its position before the union.
    """
    if strategy not in OR_TERMS_STRATEGIES:
        raise ValueError(f"unknown strategy {strategy!r}; "
                         f"valid: {OR_TERMS_STRATEGIES}")
    tagged = None
    for i, ts in enumerate(term_sets):
        t = ts.select("term", "count").withColumn("_src", F.lit(i))
        tagged = t if tagged is None else tagged.unionByName(t)
    agg = {
        "SUM": F.sum("count"),
        "MAX": F.max("count"),
        "MIN": F.min("count"),
        "FIRST": F.min_by("count", F.col("_src")),
    }[strategy]
    return tagged.groupBy("term").agg(agg.alias("count"))


def const_terms(spark, terms_counts) -> DataFrame:
    """ConstTermsQuery (ConstTermsQuery.java:27,53): a literal,
    pre-computed terms result set, used to splice externally computed
    term sets as operands into compound terms queries. A broadcast-size
    literal DataFrame — Catalyst folds it into a LocalRelation, so
    joining it against a real terms set never shuffles the big side.

    ``terms_counts``: iterable of (term, count) pairs.
    """
    rows = [(str(t), int(c)) for t, c in terms_counts]
    return spark.createDataFrame(rows, "term string, count bigint")


def and_terms(term_sets: list[DataFrame],
              strategy: str = "FIRST") -> DataFrame:
    """AndTermsQuery (AndTermsQuery.java:55-110): Boolean intersection
    of terms result sets — a term survives only if it appears in EVERY
    input. Counts are combined with the compound-counts strategy
    (AbstractCompoundTermsQuery.computeCompoundCount:135-160), whose
    reference default for AND is FIRST; non-positive counts are skipped
    by the combiner exactly as the reference's ``if(aCount > 0)`` guard.

    The reference sorts sub-queries smallest-first before its k-way
    string merge; here that ordering concern disappears — the tagged
    union + single hash aggregation lets AQE pick join/agg strategy,
    and input order only matters semantically for FIRST (preserved via
    the input-index tag).
    """
    if strategy not in OR_TERMS_STRATEGIES:
        raise ValueError(f"unknown strategy {strategy!r}; "
                         f"valid: {OR_TERMS_STRATEGIES}")
    n = len(term_sets)
    if n == 0:
        raise ValueError("and_terms requires at least one input")
    tagged = None
    for i, ts in enumerate(term_sets):
        t = ts.select("term", "count").withColumn("_src", F.lit(i))
        tagged = t if tagged is None else tagged.unionByName(t)
    pos = F.when(F.col("count") > 0, F.col("count"))
    agg = {
        "SUM": F.sum(pos),
        "MAX": F.max(pos),
        "MIN": F.min(pos),
        "FIRST": F.min_by(pos, F.when(F.col("count") > 0, F.col("_src"))),
    }[strategy]
    return (
        tagged.groupBy("term")
        .agg(F.count_distinct("_src").alias("_n_src"), agg.alias("count"))
        .filter(F.col("_n_src") == n)
        .select("term", F.coalesce(F.col("count"), F.lit(0)).alias("count"))
    )


def group_by_description(terms: DataFrame) -> DataFrame:
    """Merge terms sharing a description: counts summed, original term
    strings kept as a sorted list (TermsResultSet.groupByDescription,
    TermsResultSet.java:60-69; applied at
    AbstractIndexTermsQuery.java:298)."""
    return (
        terms.groupBy("description")
        .agg(
            F.sum("count").alias("count"),
            F.sort_array(F.collect_set("term")).alias("terms"),
            F.count_distinct("term").alias("n_terms"),
        )
    )


def annotation_terms(turns: DataFrame,
                     constraints: list[tuple[str, str, object]],
                     term_col: str = "tool") -> DataFrame:
    """AnnotationTermsQuery (AnnotationTermsQuery.java:78-133): the
    distinct mention values satisfying the constraints, with counts and
    mention lengths — here term = a turn column's value, length = 1
    turn (annotations are turn-spans in the graft)."""
    from .hits import _CONSTRAINT_OPS

    pred = F.col(term_col).isNotNull()
    for col, op, val in constraints:
        pred = pred & _CONSTRAINT_OPS[op](F.col(col), val)
    return (
        turns.filter(pred)
        .groupBy(F.col(term_col).alias("term"))
        .agg(F.count("*").alias("count"), F.lit(1).alias("length"))
    )


def sorted_terms(terms: DataFrame, by: str = "count_desc") -> DataFrame:
    """SortedTermsQuery sort criteria: COUNT_DESC (default: count desc,
    term asc), STRING, DESCRIPTION (SortedTermsQuery.java:25,33-64)."""
    if by == "count_desc":
        return terms.orderBy(F.desc("count"), F.asc("term"))
    if by == "term_asc":
        return terms.orderBy(F.asc("term"))
    if by == "description_asc":
        return terms.orderBy(F.asc("description"), F.desc("count"),
                             F.asc("term"))
    if by == "description_desc":
        return terms.orderBy(F.desc("description"), F.desc("count"),
                             F.asc("term"))
    raise ValueError(f"unknown sort {by!r}")


def limit_terms(terms: DataFrame, k: int) -> DataFrame:
    """LimitTermsQuery: after sort this is top-k — Catalyst compiles
    orderBy().limit() to TakeOrderedAndProject (no global sort)."""
    return terms.limit(k)


def top_k_terms(tokens: DataFrame, k: int,
                stopwords: list[str] | None = None) -> DataFrame:
    """The composed facet: TermType -> Sorted -> Limit."""
    return limit_terms(sorted_terms(term_type_terms(tokens, stopwords)), k)
