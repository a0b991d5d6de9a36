"""Text-analysis functions for training-data pipelines: language ID,
quality scoring, token stats, document fingerprinting.

All hot-path functions are pure Catalyst expressions (JVM, codegen) so
they run at scan speed over 100 TB. Every formula is deliberately
ANSI-SQL-expressible so the DuckDB oracle can verify it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WS_RE = "[ \\t\\n\\r]+"

# tiny per-language marker lexicons (n-gram-free heuristic langid):
# the language whose markers hit most tokens wins; ties break by the
# fixed priority order below.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "sich", "auf"],
    "fr": ["le", "la", "les", "et", "est", "que", "une", "dans", "pour", "pas"],
    "es": ["el", "los", "las", "es", "que", "una", "por", "con", "para", "del"],
}
LANG_PRIORITY = ["en", "de", "fr", "es"]


def tokens_col(text_col: str = "text") -> Column:
    return F.split(F.trim(F.lower(F.col(text_col))), WS_RE)


def token_count(text_col: str = "text") -> Column:
    t = F.trim(F.col(text_col))
    return F.when(F.col(text_col).isNull() | (F.length(t) == 0), F.lit(0)) \
        .otherwise(F.size(F.split(t, WS_RE)))


def lang_score(lang: str, text_col: str = "text") -> Column:
    """Number of tokens that are markers of ``lang``."""
    markers = LANG_MARKERS[lang]
    return F.size(F.filter(tokens_col(text_col), lambda t: t.isin(*markers)))


def lang_id(text_col: str = "text") -> Column:
    """argmax over language marker scores; deterministic tie-break by
    LANG_PRIORITY order; 'und' (undetermined) when no marker hits."""
    expr = F.lit("und")
    best = F.lit(0)
    # build right-to-left so earlier-priority languages win ties
    for lang in reversed(LANG_PRIORITY):
        s = lang_score(lang, text_col)
        expr = F.when(s >= F.greatest(best, F.lit(1)), F.lit(lang)).otherwise(expr)
        best = F.greatest(best, s)
    return expr


def stopword_ratio(text_col: str = "text") -> Column:
    n = token_count(text_col)
    hits = lang_score("en", text_col)
    return F.when(n == 0, F.lit(0.0)).otherwise(hits.cast("double") / n)


def alpha_ratio(text_col: str = "text") -> Column:
    """Fraction of characters that are ascii letters or space."""
    t = F.lower(F.col(text_col))
    kept = F.length(F.regexp_replace(t, "[^a-z ]", ""))
    return F.when(F.length(t) == 0, F.lit(0.0)) \
        .otherwise(kept.cast("double") / F.length(t))


def quality_score(text_col: str = "text") -> Column:
    """Composite in [0,1]: length, stopword density, alpha purity.

    round(0.4*min(len/500,1) + 0.4*min(stop_ratio*3.33,1) + 0.2*alpha, 6)
    """
    length_term = F.least(F.length(F.col(text_col)).cast("double") / 500.0, F.lit(1.0))
    stop_term = F.least(stopword_ratio(text_col) * 3.33, F.lit(1.0))
    return F.round(0.4 * length_term + 0.4 * stop_term + 0.2 * alpha_ratio(text_col), 6)


# accent-folding table (NormalizingTermProcessor analogue,
# util/NormalizingTermProcessor.java): 1:1 latin accent mapping via
# translate — stays inside codegen, no Python. ß folds to 's' (single
# char, documented lossy vs 'ss').
_ACCENTS = "àáâãäåāçćčèéêëēìíîïīñńòóôõöøōšùúûüūýÿžß"
_PLAIN = "aaaaaaaccceeeeeiiiiinnooooooosuuuuuyyzs"


def fold_accents(col) -> Column:
    """Unicode term normalization: lowercase + latin accent folding."""
    c = col if isinstance(col, Column) else F.col(col)
    return F.translate(F.lower(c), _ACCENTS, _PLAIN)


def normalized_tokens_col(text_col: str = "text") -> Column:
    """tokens_col with accent-folded terms (a TermProcessor chain:
    downcase -> normalize, IndexConfig.java:96-141)."""
    return F.split(F.trim(fold_accents(F.col(text_col))), WS_RE)


def describe_mention(type_name: str, feature_cols: list[str]) -> Column:
    """Human-readable mention description — DefaultMentionDescriber
    (util/DefaultMentionDescriber.java): 'Type{f1 = v1, f2 = v2}'."""
    parts = [
        F.concat(F.lit(f"{c} = "), F.coalesce(F.col(c).cast("string"),
                                              F.lit("null")))
        for c in feature_cols
    ]
    return F.concat(F.lit(type_name), F.lit("{"),
                    F.concat_ws(", ", *parts), F.lit("}"))


def pattern_description(template: str) -> Column:
    """PatternMentionDescriber analogue
    (util/PatternMentionDescriber.java): a template with ${feature}
    placeholders substituted from columns, e.g.
    'tool ${tool} at turn ${turn_idx}'."""
    import re as _re

    parts: list[Column] = []
    pos = 0
    for m in _re.finditer(r"\$\{(\w+)\}", template):
        if m.start() > pos:
            parts.append(F.lit(template[pos:m.start()]))
        parts.append(F.coalesce(F.col(m.group(1)).cast("string"),
                                F.lit("null")))
        pos = m.end()
    if pos < len(template):
        parts.append(F.lit(template[pos:]))
    return F.concat(*parts) if parts else F.lit(template)


def ontology_description(type_name: str, class_col, instance_col=None,
                         separator: str = "#",
                         local_names_only: bool = True) -> Column:
    """Ontology-entity mention description — OntologyMentionDescriber
    (util/OntologyMentionDescriber.java:91-135): 'Class (Instance)',
    e.g. 'City (London)', where class/instance URIs are shortened to
    their local name (the substring after the FIRST ``separator``
    occurrence; the whole URI when the separator is absent or
    ``local_names_only=False``). A NULL class falls back to the
    annotation type; a NULL instance drops the parenthesis."""
    def _name(col) -> Column:
        c = col if isinstance(col, Column) else F.col(col)
        if not local_names_only:
            return c
        pos = F.instr(c, separator)
        return F.when(pos > 0,
                      c.substr(pos + len(separator), F.length(c))
                      ).otherwise(c)

    cls = class_col if isinstance(class_col, Column) else F.col(class_col)
    desc = _name(cls)
    if instance_col is not None:
        inst = (instance_col if isinstance(instance_col, Column)
                else F.col(instance_col))
        desc = F.when(
            inst.isNotNull(),
            F.concat(desc, F.lit(" ("), _name(inst), F.lit(")"))
        ).otherwise(desc)
    return F.when(cls.isNotNull(), desc).otherwise(F.lit(type_name))


def describe_with_ontology(mentions: DataFrame, ontology: DataFrame,
                           uri_col: str = "class",
                           label_col: str = "label",
                           out_col: str = "description") -> DataFrame:
    """Label-table variant of the ontology describer: descriptions come
    from an ontology lookup table (uri -> human label) instead of URI
    local names. The ontology side is small by construction (a class
    hierarchy), so it ships as a BROADCAST left join — no shuffle of
    the mention table; unmapped URIs fall back to
    ``ontology_description``'s local-name shortening so every mention
    keeps a usable description."""
    look = F.broadcast(
        ontology.select(F.col(uri_col).alias("_ont_uri"),
                        F.col(label_col).alias("_ont_label")))
    fallback = ontology_description("Mention", uri_col)
    return (
        mentions.join(look, mentions[uri_col] == look["_ont_uri"], "left")
        .withColumn(out_col, F.coalesce(F.col("_ont_label"), fallback))
        .drop("_ont_uri", "_ont_label")
    )


def normalize_text(text_col: str = "text") -> Column:
    """lowercase + collapse whitespace — shared by fingerprint/dedup."""
    return F.regexp_replace(F.trim(F.lower(F.col(text_col))), WS_RE, " ")


def fingerprint(text_col: str = "text") -> Column:
    """Deterministic document fingerprint: md5 of normalized text."""
    return F.md5(normalize_text(text_col))


def rolling_hashes(text_col: str = "text", window: int = 8) -> Column:
    """Winnowing-style k-gram rolling hashes: xxhash64 of each
    ``window``-token gram (expression-only; selection of window minima
    is the caller's aggregation)."""
    # token array bound as a lambda variable (transform over a
    # singleton array): embedding the tokenizer expression in the
    # per-index lambda body would re-tokenize the document once per
    # gram — no CSE inside lambda bodies (see dedup.shingles_col)
    def over(toks):
        n = F.size(toks)
        # guard: sequence(1, stop) DESCENDS when stop < 1, and
        # slice(toks, 0, w) then throws — short docs must yield an
        # empty gram list instead
        idx = F.when(n >= window, F.sequence(F.lit(1), n - window + 1)) \
            .otherwise(F.array().cast("array<int>"))
        return F.transform(
            idx,
            lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i, window))))

    return F.transform(F.array(tokens_col(text_col)), over)[0]


def hex_doc_id(id_col) -> Column:
    """NON-NEGATIVE doc id as a 16-hex-digit term, zero-padded so
    LEXICOGRAPHIC order equals NUMERIC order — the direct index's
    doc-id term scheme (reference: index/AtomicIndex.java:586-589).
    The inverse is ``doc_id_from_hex``. Negative ids raise at runtime:
    %016x would two's-complement them, breaking both the ordering
    invariant and the round trip (conv+cast overflows to NULL)."""
    col = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.when(col >= 0, F.format_string("%016x", col)).otherwise(
        F.raise_error(F.format_string(
            "hex_doc_id requires a non-negative id, got %s", col)))


def doc_id_from_hex(hex_col) -> Column:
    """Inverse of ``hex_doc_id``: 16-hex-digit term -> bigint id."""
    col = F.col(hex_col) if isinstance(hex_col, str) else hex_col
    return F.conv(col, 16, 10).cast("long")
