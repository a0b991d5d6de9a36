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
                   id_col: str = "doc_id", text_col: str = "text",
                   materialize: bool = False,
                   scratch_dir: str | None = None) -> tuple[DataFrame, DataFrame]:
    """Run the configured stages; returns (clean_docs, report).

    ``report`` is a one-row-per-stage DataFrame (stage, docs_kept)
    built as a union of count aggregates — genuinely lazy: no Spark
    job runs until ``report.collect()``, so a caller that only wants
    ``clean_docs`` pays nothing for the report.

    COST WARNING (default path): because each stage frame is lazy,
    ``report.collect()`` re-executes the FULL upstream chain once per
    stage — including the minhash-LSH and connected-components
    shuffles for the post-neardup count. On a large corpus that is
    O(stages) full pipeline runs. Pass ``materialize=True`` to stage
    each frame to parquet once (the 100 TB shape — the same
    staged-narrow pattern ``lineage.run_rollup_job`` uses); then both
    the report counts and downstream consumption of ``clean_docs``
    read the staged tables. ``scratch_dir`` must be reachable by every
    executor (defaults to a driver-local tempdir — local mode only;
    default scratches are registered for
    ``dedup.release_component_scratches()``, and the returned frames
    read the spill lazily, so reclaim only after consumption).
    """
    from functools import reduce
    cfg = config or CorpusConfig()
    spark = docs.sparkSession

    if materialize:
        import tempfile

        scratch = scratch_dir or tempfile.mkdtemp(prefix="prepare_corpus_")
        if scratch_dir is None:
            dedup._CC_SCRATCHES.append(scratch)

        def _stage(df: DataFrame, name: str) -> DataFrame:
            path = f"{scratch}/{name}"
            df.write.mode("overwrite").parquet(path)
            return spark.read.parquet(path)
    else:
        def _stage(df: DataFrame, name: str) -> DataFrame:
            return df

    cur = docs
    stage_frames: list[tuple[str, DataFrame]] = [("input", cur)]

    if "quality" in cfg.stages:
        n_tok = TX.token_count(text_col)
        pred = (F.col(text_col).isNotNull()
                & (n_tok >= cfg.min_tokens) & (n_tok <= cfg.max_tokens)
                & (TX.quality_score(text_col) >= cfg.min_quality))
        for extra in cfg.extra_filters:
            pred = pred & extra
        cur = _stage(cur.filter(pred), "quality")
        stage_frames.append(("quality", cur))

    if "language" in cfg.stages and cfg.languages:
        cur = _stage(
            cur.filter(TX.lang_id(text_col).isin(list(cfg.languages))),
            "language")
        stage_frames.append(("language", cur))

    if "exact" in cfg.stages:
        # NULL text never fingerprints to a shared bucket: when the
        # quality stage is disabled (or filtered out of cfg.stages),
        # NULL-text docs reach this stage, and md5(NULL) = NULL would
        # put them ALL in one window partition, silently dropping all
        # but the min-id doc as "duplicates". A per-doc unique
        # fallback key passes them through unchanged.
        w = Window.partitionBy("_fp").orderBy(F.col(id_col).asc())
        fp = F.when(
            F.col(text_col).isNotNull(), F.md5(TX.normalize_text(text_col))
        ).otherwise(F.concat(F.lit("\x00null:"), F.col(id_col).cast("string")))
        cur = (
            cur.withColumn("_fp", fp)
            .withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1).drop("_fp", "_rk")
        )
        cur = _stage(cur, "exact")
        stage_frames.append(("exact", cur))

    if "neardup" in cfg.stages:
        pairs = dedup.minhash_lsh_pairs(
            cur, num_hashes=cfg.minhash_hashes, bands=cfg.minhash_tau_bands,
            id_col=id_col, text_col=text_col, n=cfg.shingle_n,
            max_df=cfg.max_df)
        cur = _stage(dedup.dedup_keep_canonical(cur, pairs, id_col=id_col),
                     "neardup")
        stage_frames.append(("neardup", cur))

    counts = [
        df.agg(F.count("*").alias("docs_kept"))
        .select(F.lit(name).alias("stage"), "docs_kept")
        for name, df in stage_frames
    ]
    report = reduce(lambda a, b: a.unionByName(b), counts)
    return cur, report


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


PACK_SCHEMA = ("seq_id string, doc_ids array<long>, n_docs int, "
               "total_tokens long")


def pack_sequences(docs: DataFrame, budget: int, id_col: str = "doc_id",
                   text_col: str = "text",
                   num_partitions: int | None = None) -> DataFrame:
    """Pack documents into training sequences of at most ``budget``
    tokens (best-fit-decreasing per partition) — the batch-assembly
    step after corpus prep. Returns one row per packed sequence:
    (seq_id, doc_ids, n_docs, total_tokens), every total <= budget;
    documents longer than the budget become singleton sequences
    (flagged by total_tokens > budget) so nothing silently vanishes —
    the caller decides to truncate or drop.

    Scale shape: packing is planned over (doc_id, n_tok) PAIRS — the
    text never moves; the result is an assignment plan to join back.
    Bins are partition-local (global bin packing doesn't parallelize);
    determinism comes from hash(doc_id) partitioning + a fixed
    (n_tok desc, doc_id) order, so the plan is reproducible across
    runs and cluster sizes at fixed num_partitions."""
    import bisect

    from .functions.text import token_count

    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    meta = docs.select(F.col(id_col).alias("doc_id"),
                       token_count(text_col).cast("long").alias("n_tok"))
    parts = num_partitions or meta.sparkSession.sparkContext.defaultParallelism
    meta = (meta.repartition(parts, F.col("doc_id"))
            .sortWithinPartitions(F.desc("n_tok"), F.asc("doc_id")))

    def pack(iterator):
        import pandas as pd

        # stream the partition; best-fit-decreasing needs the full
        # sorted list, which Spark already provides partition-sorted
        rows_id, rows_tok = [], []
        for pdf in iterator:
            rows_id.extend(pdf["doc_id"].tolist())
            rows_tok.extend(pdf["n_tok"].tolist())
        if not rows_id:
            return
        part_tag = f"{rows_id[0]}"  # deterministic partition label
        remainders: list[int] = []   # sorted ascending
        order: list[int] = []        # remainders[i] -> bin index
        bins: list[list] = []
        totals: list[int] = []
        for did, tok in zip(rows_id, rows_tok):
            if tok >= budget:
                bins.append([did]); totals.append(tok)
                continue
            # best fit: smallest remainder still >= tok
            i = bisect.bisect_left(remainders, tok)
            if i < len(remainders):
                b = order.pop(i)
                rem = remainders.pop(i)
                bins[b].append(did); totals[b] += tok
                new_rem = rem - tok
            else:
                bins.append([did]); totals.append(tok)
                b = len(bins) - 1
                new_rem = budget - tok
            if new_rem > 0:
                j = bisect.bisect_left(remainders, new_rem)
                remainders.insert(j, new_rem)
                order.insert(j, b)
        out = pd.DataFrame({
            "seq_id": [f"p{part_tag}-{i}" for i in range(len(bins))],
            "doc_ids": [sorted(b) for b in bins],
            "n_docs": [len(b) for b in bins],
            "total_tokens": totals,
        })
        yield out

    return meta.mapInPandas(pack, PACK_SCHEMA)


def lang_mix(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Language distribution of a corpus: (lang, n_docs, pct) — the
    companion to corpus_stats for before/after-gate reporting."""
    counts = docs.groupBy(TX.lang_id(text_col).alias("lang")) \
        .agg(F.count("*").alias("n_docs"))
    total = F.sum("n_docs").over(Window.partitionBy())
    return counts.select(
        "lang", "n_docs",
        F.round(F.col("n_docs") / total * 100, 2).alias("pct"))
