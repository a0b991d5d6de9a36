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
    """TfIdfScorer over the token table: score(doc) = tf * ln(N/df)."""
    n_docs = tokens.select("doc_id").distinct().count()
    hits = tokens.filter(F.col("term") == term)
    df_count = hits.select("doc_id").distinct().count()
    if df_count == 0:
        return hits.select("doc_id", F.lit(0.0).alias("score")).limit(0)
    idf = float(__import__("math").log(n_docs / df_count))
    return (
        hits.groupBy("doc_id")
        .agg((F.count("*") * F.lit(idf)).alias("score"))
    )


def rank_documents(scored: DataFrame, k: int | None = None) -> DataFrame:
    """Block-incremental top-k of the reference
    (RankingQueryRunnerImpl.java:516-573) collapses to
    TakeOrderedAndProject: orderBy(score desc, id asc) [+ limit]."""
    out = scored.orderBy(F.desc("score"), F.asc(scored.columns[0]))
    return out.limit(k) if k else out
