"""Composite training-data preparation pipeline.

One entry point gluing the engine's corpus operators into the standard
LLM-data flow:

    raw docs
      -> quality gate   (length / alpha-ratio / stopword heuristics)
      -> language gate  (n-gram lang-id)
      -> exact dedup    (normalized-text fingerprint, min-id survivor)
      -> near-dup       (MinHash+LSH pairs -> connected components ->
                         canonical keep)
      -> report         (per-stage counts + token statistics)

Every stage is the already-verified operator (functions.text, dedup);
this module only composes them, so the whole pipeline is Catalyst
expressions + the two bounded dedup shuffles — no new per-row Python.
Stage outputs are plain DataFrames: callers can materialize between
stages (the 100 TB shape: write the post-gate corpus once, run both
dedup stages from that staging table — the same staged-narrow-turns
pattern run_rollup_job uses).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import dedup
from .functions import text as TX


@dataclass
class CorpusConfig:
    min_tokens: int = 5
    max_tokens: int = 100_000
    min_quality: float = 0.3
    languages: tuple[str, ...] | None = None  # None = keep all
    minhash_tau_bands: int = 4
    minhash_hashes: int = 16
    shingle_n: int = 3
    max_df: int | None = 1000
    stages: tuple[str, ...] = (
        "quality", "language", "exact", "neardup")
    extra_filters: tuple = field(default_factory=tuple)  # Column predicates


def prepare_corpus(docs: DataFrame, config: CorpusConfig | None = None,
                   id_col: str = "doc_id",
                   text_col: str = "text") -> tuple[DataFrame, DataFrame]:
    """Run the configured stages; returns (clean_docs, report).

    ``report`` is a one-row-per-stage DataFrame (stage, docs_kept) —
    the counts are computed lazily from the returned frames, so calling
    ``report.collect()`` is what materializes them (each count is one
    columnar aggregate; at scale, materialize clean_docs first and the
    counts come from the staged table).
    """
    cfg = config or CorpusConfig()
    spark = docs.sparkSession
    cur = docs
    stage_frames: list[tuple[str, DataFrame]] = [("input", cur)]

    if "quality" in cfg.stages:
        n_tok = TX.token_count(text_col)
        pred = (F.col(text_col).isNotNull()
                & (n_tok >= cfg.min_tokens) & (n_tok <= cfg.max_tokens)
                & (TX.quality_score(text_col) >= cfg.min_quality))
        for extra in cfg.extra_filters:
            pred = pred & extra
        cur = cur.filter(pred)
        stage_frames.append(("quality", cur))

    if "language" in cfg.stages and cfg.languages:
        cur = cur.filter(TX.lang_id(text_col).isin(list(cfg.languages)))
        stage_frames.append(("language", cur))

    if "exact" in cfg.stages:
        w = Window.partitionBy("_fp").orderBy(F.col(id_col).asc())
        cur = (
            cur.withColumn("_fp", F.md5(TX.normalize_text(text_col)))
            .withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1).drop("_fp", "_rk")
        )
        stage_frames.append(("exact", cur))

    if "neardup" in cfg.stages:
        pairs = dedup.minhash_lsh_pairs(
            cur, num_hashes=cfg.minhash_hashes, bands=cfg.minhash_tau_bands,
            id_col=id_col, text_col=text_col, n=cfg.shingle_n,
            max_df=cfg.max_df)
        cur = dedup.dedup_keep_canonical(cur, pairs, id_col=id_col)
        stage_frames.append(("neardup", cur))

    def _report() -> DataFrame:
        rows = [(name, df.count()) for name, df in stage_frames]
        return spark.createDataFrame(rows, "stage string, docs_kept long")

    return cur, _report()


def corpus_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One-row corpus summary: doc count, token totals + approximate
    percentiles — the post-pipeline report card. (Language mix is a
    groupBy away: ``docs.groupBy(TX.lang_id()).count()``.)"""
    n_tok = TX.token_count(text_col)
    return docs.select(n_tok.alias("_t")).agg(
        F.count("*").alias("n_docs"),
        F.sum("_t").alias("total_tokens"),
        F.percentile_approx("_t", [0.5, 0.9, 0.99], 10000)
        .alias("tok_p50_p90_p99"),
    )


def sample_by_hash(docs: DataFrame, rate: float, key_col: str = "doc_id",
                   seed: int = 0) -> DataFrame:
    """Deterministic, reproducible sampling: keep a row iff
    ``xxhash64(key, seed)`` lands in the rate-sized bucket. Unlike
    ``DataFrame.sample`` this is a pure function of the key — stable
    across runs, partitionings, and cluster sizes, so train/eval
    splits and ablation subsets are re-derivable from the key alone
    (and complementary rates partition the corpus exactly:
    sample(r, seed) and its complement never overlap)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    denom = 1 << 32
    h = F.pmod(F.xxhash64(F.col(key_col), F.lit(seed)), F.lit(denom))
    return docs.filter(h < F.lit(int(rate * denom)))
