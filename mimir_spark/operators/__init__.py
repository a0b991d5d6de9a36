from .hits import (  # noqa: F401
    HIT_SCHEMA,
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
from .terms import (  # noqa: F401
    document_terms,
    documents_and_terms,
    documents_or_terms,
    limit_terms,
    sorted_terms,
    term_type_terms,
    tokenize,
)
