"""Materialized inverted token index — the postings-file analogue.

The reference's core retrieval advantage is that a TermQuery is a
postings LOOKUP, not a corpus scan (MG4J inverted index,
index/TermQuery.java:147-185 skipTo iteration). The Spark-first
equivalent is a materialized table of (term, conv_id, pos) rows laid
out for pruning:

- parquet/Iceberg PARTITIONED BY ``tb = portable_hash(term) % n_buckets``
  → a term lookup reads 1/n_buckets of the index (PartitionFilters);
- rows sorted by (term, conv_id, pos) within each partition → parquet
  row-group min/max stats on ``term`` skip non-matching groups inside
  the bucket (the skip-list analogue), with the equality predicate
  pushed to the scan (PushedFilters).

At 100 TB this is an Iceberg table with a bucket partition transform on
term and a sort order — maintenance (compaction, expiry) rides the same
TieredStore machinery as the rollup store.

The bucket hash is the md5-derived 60-bit portable hash (dedup.
_portable_hash60), NOT xxhash64/Spark-internal hashing, so the bucket
of a term is computable in driver-side Python and in the DuckDB oracle
without a JVM round trip.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..dedup import _portable_hash60

N_BUCKETS = 64
_WS_RE = "[ \\t\\n\\r]+"


def term_bucket_py(term: str, n_buckets: int = N_BUCKETS) -> int:
    """Driver/oracle-side bucket id: identical arithmetic to the
    Column expression used at write time."""
    return int(hashlib.md5(term.encode()).hexdigest()[:15], 16) % n_buckets


def token_postings(turns: DataFrame, text_col: str = "text") -> DataFrame:
    """(term, conv_id, pos) rows, distinct per (term, turn): token
    position = turn index in this graft (SURVEY §1: document =
    conversation), so multiple occurrences inside one turn collapse —
    exactly the hit set the scan-based Term execution produces."""
    toks = turns.select(
        "conv_id", F.col("turn_idx").alias("pos"),
        F.explode(
            F.split(F.trim(F.lower(F.col(text_col))), _WS_RE)
        ).alias("term"),
    ).filter(F.col("term") != "")
    return toks.distinct()


def write_token_index(turns: DataFrame, path: str,
                      text_col: str = "text",
                      n_buckets: int = N_BUCKETS) -> None:
    """Materialize the index: bucket-partitioned, term-sorted."""
    postings = token_postings(turns, text_col).withColumn(
        "tb", (_portable_hash60(F.col("term")) % n_buckets).cast("int"))
    (
        postings.repartition("tb")
        .sortWithinPartitions("term", "conv_id", "pos")
        .write.mode("overwrite").partitionBy("tb").parquet(str(path))
    )


def term_query_indexed(spark, path: str, term: str,
                       n_buckets: int = N_BUCKETS) -> DataFrame:
    """TermQuery as a postings lookup: partition pruning on the term
    bucket + the equality predicate pushed into the pruned scan.
    Returns hits (conv_id, pos, len) — composes with the whole
    positional algebra in operators.hits."""
    t = term.lower()
    b = term_bucket_py(t, n_buckets)
    df = spark.read.parquet(str(path)).filter(
        (F.col("tb") == b) & (F.col("term") == t))
    return df.select("conv_id", "pos", F.lit(1).alias("len"))


def indexed_term_resolver(spark, path: str, n_buckets: int = N_BUCKETS):
    """Term-node resolver for query_parser.run_query(term_index=...):
    text terms become postings lookups instead of corpus scans."""
    def resolve(term: str) -> DataFrame:
        return term_query_indexed(spark, path, term, n_buckets)
    return resolve


# ---------------------------------------------------------------------------
# the DIRECT index (term <-> doc transpose, AtomicIndex.java:1089-1271)
# ---------------------------------------------------------------------------


def write_term_doc_index(docs: DataFrame, path: str,
                         id_col: str = "doc_id", text_col: str = "text",
                         n_buckets: int = N_BUCKETS) -> None:
    """Materialize the direct index: (term, doc_id, tf) rows,
    bucket-partitioned by term and term-sorted within partitions.

    The reference materializes this transpose so the terms algebra
    never re-reads documents; operators/terms.py recomputes it per
    query (fine for one-off queries, a full corpus scan each time at
    100 TB). Built once, this table serves the whole count surface:
    term facets = sum(tf) group-by (pre-aggregated, ~vocabulary-sized
    input instead of corpus-sized), per-term document lists = a pruned
    bucket lookup."""
    from ..operators import terms as TERMS

    toks = TERMS.tokenize(docs, id_col=id_col, text_col=text_col)
    tf = toks.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))
    (
        tf.withColumn(
            "tb", (_portable_hash60(F.col("term")) % n_buckets).cast("int"))
        .repartition("tb")
        .sortWithinPartitions("term", "doc_id")
        .write.mode("overwrite").partitionBy("tb").parquet(str(path))
    )


def term_counts_indexed(spark, path: str,
                        stopwords: list[str] | None = None) -> DataFrame:
    """term_type_terms served from the direct index — identical result
    (count = sum of per-doc term frequencies), but the input is the
    pre-aggregated transpose, not the corpus."""
    from ..operators.terms import DEFAULT_STOPWORDS

    sw = DEFAULT_STOPWORDS if stopwords is None else stopwords
    idx = spark.read.parquet(str(path))
    return (
        idx.filter(~F.col("term").isin(sw))
        .groupBy("term").agg(F.sum("tf").alias("count"))
    )


def term_docs_indexed(spark, path: str, term: str,
                      n_buckets: int = N_BUCKETS) -> DataFrame:
    """(doc_id, tf) for one term — partition-pruned bucket lookup."""
    b = term_bucket_py(term, n_buckets)
    return (
        spark.read.parquet(str(path))
        .filter((F.col("tb") == b) & (F.col("term") == term))
        .select("doc_id", "tf")
    )
