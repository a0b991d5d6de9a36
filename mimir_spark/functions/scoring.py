"""Scoring expressions: the reference's pluggable scorer surface
(search/score/MimirScorer.java; catalog in MimirScorerService.groovy)
as plain Column expressions over hit/rollup DataFrames.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def count_scorer(hits: DataFrame) -> DataFrame:
    """CountScorer: document score = number of hits."""
    return hits.groupBy("conv_id").agg(F.count("*").alias("score"))


def binding_scorer_col(len_col: str = "len", h: int = 16,
                       alpha: float = 0.9) -> Column:
    """BindingScorer (BindingScorer.java:25-52): per-hit score
    len < h ? 1 : (h/len)^alpha."""
    ln = F.col(len_col).cast("double")
    return F.when(ln < h, F.lit(1.0)).otherwise(F.pow(F.lit(float(h)) / ln, alpha))


def tf_idf_scores(tokens: DataFrame, term: str) -> DataFrame:
    """TfIdfScorer over the token table: score(doc) = tf * ln(N/df).

    Single logical plan, zero driver-side actions: corpus stats (N, df)
    come from one aggregation crossJoined back as a broadcast 1-row
    frame, so the whole scorer is one job when evaluated."""
    stats = tokens.agg(
        F.count_distinct("doc_id").alias("_n_docs"),
        F.count_distinct(
            F.when(F.col("term") == term, F.col("doc_id"))).alias("_df"),
    )
    tf = (tokens.filter(F.col("term") == term)
          .groupBy("doc_id").agg(F.count("*").alias("_tf")))
    return (
        tf.crossJoin(F.broadcast(stats))
        .filter(F.col("_df") > 0)
        .select(
            "doc_id",
            (F.col("_tf") * F.log(F.col("_n_docs") / F.col("_df"))).alias("score"),
        )
    )


def rank_documents(scored: DataFrame, k: int | None = None) -> DataFrame:
    """Block-incremental top-k of the reference
    (RankingQueryRunnerImpl.java:516-573) collapses to
    TakeOrderedAndProject: orderBy(score desc, id asc) [+ limit]."""
    out = scored.orderBy(F.desc("score"), F.asc(scored.columns[0]))
    return out.limit(k) if k else out
