"""Similarity search over embedding columns: brute-force cosine top-k
(the exact baseline) and an LSH-bucketed approximate variant (the
scale path: candidates come from hash buckets, never a full scan).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _norm_col(vec):
    return F.sqrt(F.aggregate(vec, F.lit(0.0), lambda a, x: a + x * x))


def _dot_col(u, v):
    return F.aggregate(F.zip_with(u, v, lambda x, y: x * y),
                       F.lit(0.0), lambda a, x: a + x)


def brute_force_topk(embeddings: DataFrame, query_vec: list[float], k: int,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k for one query vector.

    The query is a literal array (broadcast by Catalyst as a constant);
    the scan is embarrassingly parallel; orderBy+limit compiles to
    TakeOrderedAndProject (per-partition heaps + driver merge of k)."""
    q = F.lit(np.asarray(query_vec, dtype=np.float64).tolist()).cast("array<double>")
    v = F.col(vec_col).cast("array<double>")
    sim = _dot_col(v, q) / (_norm_col(v) * _norm_col(q))
    return (
        embeddings.select(F.col(id_col).alias("vec_id"),
                          F.round(sim, 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def hyperplane_signature(embeddings: DataFrame, n_planes: int = 12, dim: int = 64,
                         seed: int = 42, id_col: str = "vec_id",
                         vec_col: str = "embedding") -> DataFrame:
    """Random-hyperplane LSH bucket id per vector (expression-level:
    the planes are literal arrays folded into the plan)."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    v = F.col(vec_col).cast("array<double>")
    sig = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        dot = _dot_col(v, F.lit(p.tolist()).cast("array<double>"))
        sig = sig + F.when(dot > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return embeddings.select(F.col(id_col).alias("vec_id"), v.alias("v"),
                             sig.alias("bucket"))


def lsh_topk(embeddings: DataFrame, query_vec: list[float], k: int,
             n_planes: int = 12, seed: int = 42, probe_hamming: int = 2,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate cosine top-k: score only vectors whose LSH bucket is
    within ``probe_hamming`` bit flips of the query's bucket (multi-probe
    LSH). This in-memory variant computes buckets on the fly (full scan,
    cheap filter); the scale path is write_embeddings_bucketed +
    lsh_topk_bucketed, where the probe set prunes partitions at the
    scan."""
    dim = len(query_vec)
    sigs = hyperplane_signature(embeddings, n_planes, dim, seed, id_col, vec_col)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    q = np.asarray(query_vec, dtype=np.float64)
    qsig = int(sum((1 << i) for i, p in enumerate(planes) if float(p @ q) > 0))
    probe = F.bit_count(F.col("bucket").bitwiseXOR(F.lit(qsig))) <= probe_hamming
    qcol = F.lit(q.tolist()).cast("array<double>")
    sim = _dot_col(F.col("v"), qcol) / (_norm_col(F.col("v")) * _norm_col(qcol))
    return (
        sigs.filter(probe)
        .select("vec_id", F.round(sim, 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def query_signature(query_vec: list[float], n_planes: int = 12,
                    seed: int = 42) -> int:
    """LSH bucket id of one query vector (driver-side, same planes as
    hyperplane_signature)."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, len(query_vec)))
    q = np.asarray(query_vec, dtype=np.float64)
    return int(sum((1 << i) for i, p in enumerate(planes) if float(p @ q) > 0))


def write_embeddings_bucketed(embeddings: DataFrame, path: str,
                              n_planes: int = 12, seed: int = 42,
                              id_col: str = "vec_id",
                              vec_col: str = "embedding",
                              dim: int | None = None) -> None:
    """Materialize the LSH layout: parquet partitioned by ``bucket``.

    This is the scale path's storage half: at 100 TB this is an Iceberg
    table partitioned by bucket, and probing reads ONLY the probed
    partitions (partition pruning at the scan — verified by the
    PartitionFilters entry in the plan, see lsh_topk_bucketed)."""
    if dim is None:  # driver-side probe only when the caller cannot say
        dim = len(embeddings.select(vec_col).first()[0])
    sigs = hyperplane_signature(embeddings, n_planes, dim, seed, id_col, vec_col)
    sigs.write.mode("overwrite").partitionBy("bucket").parquet(str(path))


def lsh_topk_bucketed(spark, path: str, query_vec: list[float], k: int,
                      n_planes: int = 12, seed: int = 42,
                      probe_hamming: int = 2) -> DataFrame:
    """Approximate cosine top-k over the bucket-partitioned store.

    The probe set (buckets within ``probe_hamming`` bit flips of the
    query's bucket) becomes an IN-list filter on the partition column,
    so the scan prunes to the probed partitions — no full pass over the
    table, unlike the in-memory ``lsh_topk`` which filters post-scan."""
    qsig = query_signature(query_vec, n_planes, seed)
    probes = [b for b in range(1 << n_planes)
              if bin(b ^ qsig).count("1") <= probe_hamming]
    df = spark.read.parquet(str(path)).filter(F.col("bucket").isin(probes))
    q = np.asarray(query_vec, dtype=np.float64)
    qcol = F.lit(q.tolist()).cast("array<double>")
    sim = _dot_col(F.col("v"), qcol) / (_norm_col(F.col("v")) * _norm_col(qcol))
    return (
        df.select("vec_id", F.round(sim, 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def all_pairs_topk(embeddings: DataFrame, k: int, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """k nearest neighbours for EVERY vector (brute-force; useful as the
    recall oracle for bucketed variants)."""
    normed = embeddings.select(
        F.col(id_col).alias("vid"), F.col(vec_col).cast("array<double>").alias("v")
    ).withColumn("norm", _norm_col(F.col("v")))
    a, b = normed.alias("a"), normed.alias("b")
    sim = _dot_col(F.col("a.v"), F.col("b.v")) / (F.col("a.norm") * F.col("b.norm"))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (
        a.join(b, F.col("a.vid") != F.col("b.vid"))
        .select(F.col("a.vid").alias("qid"), F.col("b.vid").alias("nid"),
                F.round(sim, 6).alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
