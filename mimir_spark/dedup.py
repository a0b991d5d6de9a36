"""Deduplication suite for web-scale corpora: exact, n-gram Jaccard,
MinHash+LSH, SimHash, embedding-cosine near-dup.

Design notes for 100 TB:
- exact/minhash/simhash are shuffle-on-fingerprint jobs — the
  fingerprint is tiny compared to the document, so the shuffle moves
  keys, not text;
- pair generation always goes through a bucket key (shingle, LSH band,
  simhash band) so candidate pairs are produced by an equi-join, never
  a cross join;
- all hash functions are md5-derived and engine-portable, so the DuckDB
  oracle replays every pipeline exactly (no platform-dependent hashing);
- hot keys are capped before any self-join (``max_df``): one stop-phrase
  shingle with df=10^6 would otherwise alone contribute 10^12 candidate
  pairs.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .functions.text import normalize_text, tokens_col


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Keep the min-id document per identical normalized text."""
    return (
        docs.withColumn("_fp", F.md5(normalize_text(text_col)))
        .groupBy("_fp")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("dup_count"))
        .drop("_fp")
    )


# ---------------------------------------------------------------------------
# word n-gram shingles + Jaccard
# ---------------------------------------------------------------------------

def shingles_col(text_col: str = "text", n: int = 3):
    """Distinct word n-gram shingles of the normalized text.

    Docs with fewer than ``n`` tokens yield an empty array: the index
    list must be guarded because Spark's ``sequence(1, stop)`` DESCENDS
    when stop < 1 ([1, 0]) and slice(toks, 0, n) then throws.

    The token array is bound as a LAMBDA VARIABLE (transform over a
    singleton array) before the per-index transform: a lambda body
    that embeds the raw tokenizer expression re-tokenizes the document
    once PER SHINGLE INDEX — Spark does no common-subexpression
    elimination inside lambda bodies (r6 finding: 3.0 s -> 0.44 s at
    sf0.1, identical output)."""
    def over(toks):
        cnt = F.size(toks)
        idx = F.when(cnt >= n, F.sequence(F.lit(1), cnt - n + 1)) \
            .otherwise(F.array().cast("array<int>"))
        return F.transform(
            idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))

    grams = F.transform(F.array(tokens_col(text_col)), over)[0]
    return F.array_distinct(grams)


def doc_shingles(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", n: int = 3,
                 max_df: int | None = None) -> DataFrame:
    """(doc_id, shingle) rows, distinct per doc.

    ``max_df`` drops shingles whose document frequency exceeds the cap
    BEFORE any self-join — the standard guard against hot-shingle
    candidate blowup (a df=10^6 stop-phrase shingle alone would yield
    10^12 join rows). The hot set is tiny by construction, so it is
    removed with a broadcast anti-join, not a shuffle.

    When the cap is active the raw shingle stream is persisted
    (MEMORY_AND_DISK): the hot-set count is a second full consumer of
    the explode, and downstream callers (signatures, jaccard's sizes +
    self-join) re-consume it again — without the persist each consumer
    re-scans and re-tokenizes the corpus (measured at sf0.1: ~25%
    of minhash_lsh_pairs wall time). MEMORY_AND_DISK spills per
    executor, so the cache stays local at cluster scale; Spark evicts
    it LRU under memory pressure."""
    sh = docs.select(F.col(id_col).alias("doc_id"),
                     F.explode(shingles_col(text_col, n)).alias("shingle"))
    if max_df is None:
        return sh
    sh = sh.persist(StorageLevel.MEMORY_AND_DISK)
    # self-bounding: keep at most 2 shingle caches alive (the newest
    # plus one predecessor that may still back an un-materialized
    # query) — older ones are unpersisted here, so library callers
    # that never call release_shingle_caches() cannot accumulate
    # pinned executor storage without bound
    while len(_SHINGLE_CACHES) >= 2:
        try:
            _SHINGLE_CACHES.pop(0).unpersist()
        except Exception:  # session already stopped
            pass
    _SHINGLE_CACHES.append(sh)
    hot = (sh.groupBy("shingle").agg(F.count("*").alias("_df"))
           .filter(F.col("_df") > max_df).select("shingle"))
    return sh.join(F.broadcast(hot), "shingle", "left_anti")


_SHINGLE_CACHES: list = []


def release_shingle_caches() -> int:
    """Unpersist every shingle stream cached by doc_shingles.

    The persist must outlive the (lazy) query that uses it, so
    doc_shingles cannot scope it itself; long-lived sessions that run
    many dedup queries call this between queries to keep at most one
    cache alive (the driver-gate entries do). Returns the number of
    caches released."""
    n = 0
    while _SHINGLE_CACHES:
        df = _SHINGLE_CACHES.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:  # session already stopped
            pass
    return n


def jaccard_pairs(docs: DataFrame, tau: float, id_col: str = "doc_id",
                  text_col: str = "text", n: int = 3,
                  max_df: int | None = None) -> DataFrame:
    """Near-duplicate pairs with n-gram Jaccard >= tau.

    Candidates come from an equi-join on shared shingles (inverted
    index), so cost is driven by shingle collisions, not |docs|^2;
    ``max_df`` caps the per-shingle collision count (both the common
    counts and the per-doc sizes use the capped shingle universe, so
    jaccard stays a true set ratio). Returns (doc_a, doc_b, jaccard)
    with doc_a < doc_b.
    """
    sh = doc_shingles(docs, id_col, text_col, n, max_df=max_df)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common")), 6),
        )
        .filter(F.col("jaccard") >= tau)
        .select("doc_a", "doc_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

MINHASH_P = 2_147_483_647  # 2^31 - 1 (Mersenne prime)
_MINHASH_SEED = 20260116


def minhash_coeffs(num_hashes: int = 16,
                   seed: int = _MINHASH_SEED) -> list[tuple[int, int, int]]:
    """Deterministic (a, b, c) triples for the per-permutation
    universal hash h_i(x) = (a*x_hi + b*x_lo + c) mod P. Exposed so
    the DuckDB oracle can bake the SAME literals into its replay."""
    import numpy as np

    rng = np.random.default_rng(seed)
    a = rng.integers(1, MINHASH_P, size=num_hashes)
    b = rng.integers(1, MINHASH_P, size=num_hashes)
    c = rng.integers(0, MINHASH_P, size=num_hashes)
    return [(int(x), int(y), int(z)) for x, y, z in zip(a, b, c)]


def minhash_signature(docs: DataFrame, num_hashes: int = 16,
                      id_col: str = "doc_id", text_col: str = "text",
                      n: int = 3, max_df: int | None = None) -> DataFrame:
    """(doc_id, sig array<long>): sig[i] = min over shingles of an
    affine permutation of ONE base hash per shingle.

    One md5 per shingle (the 60-bit portable base), then num_hashes
    universal-hash permutations h_i = (a_i*x_hi + b_i*x_lo + c_i) mod
    (2^31-1) over the base's 30-bit halves — every product stays below
    2^61, so int64 arithmetic is exact and the DuckDB oracle replays it
    verbatim. This replaces the previous md5(shingle || '#i') scheme:
    16x fewer md5 calls per shingle occurrence, and the min-aggregates
    shuffle 8-byte longs instead of 32-char strings. The two-half mix
    keeps the full 60-bit shingle universe (no mod-P aliasing of
    distinct shingles into identical signatures).
    ``max_df`` excludes hot shingles from the signature universe."""
    sh = doc_shingles(docs, id_col, text_col, n, max_df=max_df)
    base = sh.select(
        "doc_id",
        _portable_hash60(F.col("shingle")).alias("x"),
    ).select(
        "doc_id",
        F.shiftright("x", 30).alias("x_hi"),
        F.col("x").bitwiseAND(F.lit((1 << 30) - 1)).alias("x_lo"),
    )
    mins = [
        F.min((F.col("x_hi") * F.lit(a) + F.col("x_lo") * F.lit(b)
               + F.lit(c)) % F.lit(MINHASH_P)).alias(f"h{i}")
        for i, (a, b, c) in enumerate(minhash_coeffs(num_hashes))
    ]
    agg = base.groupBy("doc_id").agg(*mins)
    return agg.select(
        "doc_id",
        F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig"))


def minhash_lsh_pairs(docs: DataFrame, num_hashes: int = 16, bands: int = 4,
                      id_col: str = "doc_id", text_col: str = "text",
                      n: int = 3, max_df: int | None = None) -> DataFrame:
    """Candidate near-dup pairs: docs sharing >=1 LSH band
    (band key = md5 of the band's concatenated minhashes)."""
    rows = num_hashes // bands
    sig = minhash_signature(docs, num_hashes, id_col, text_col, n, max_df=max_df)
    band_rows = sig.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(
                F.lit(bi).alias("band"),
                F.md5(F.concat_ws("|", *[
                    F.col("sig")[bi * rows + r] for r in range(rows)
                ])).alias("bkey"),
            )
            for bi in range(bands)
        ])).alias("b"),
    ).select("doc_id", "b.band", "b.bkey")
    x, y = band_rows.alias("x"), band_rows.alias("y")
    return (
        x.join(y, (F.col("x.band") == F.col("y.band"))
               & (F.col("x.bkey") == F.col("y.bkey"))
               & (F.col("x.doc_id") < F.col("y.doc_id")))
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 60


def _portable_hash60(col):
    """60-bit token hash both engines compute identically: the first 15
    hex chars of md5 as an integer (Spark conv(hex,16,10); DuckDB
    ('0x'||hex)::BIGINT) — always positive, no platform hashing."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def simhash60(docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """60-bit SimHash over tokens: per-token md5-derived hash, bitwise
    majority vote — all expression-level (explode + groupBy + bit ops),
    and exactly replayable by the DuckDB oracle."""
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens_col(text_col)).alias("tok"),
    ).withColumn("h", _portable_hash60("tok"))
    # vote per bit: with S_b = count of tokens with bit b set and N
    # tokens total, the +1/-1 vote sum is 2*S_b - N, so "votes > 0"
    # is exactly "2*S_b > N" — a plain shifted-bit sum per bit plus
    # one shared count, cheaper in codegen than 60 CASE WHEN branches
    # (r6: 2.29 s -> 2.00 s at sf0.1, identical hashes asserted)
    sums = [
        F.sum(F.shiftright("h", b).bitwiseAND(F.lit(1))).alias(f"s{b}")
        for b in range(SIMHASH_BITS)
    ]
    agg = tok.groupBy("doc_id").agg(F.count("*").alias("_n"), *sums)
    sim = None
    for b in range(SIMHASH_BITS):
        bit = F.when(2 * F.col(f"s{b}") > F.col("_n"),
                     F.lit(1 << b)).otherwise(F.lit(0))
        sim = bit if sim is None else sim + bit
    return agg.select("doc_id", sim.alias("simhash"))


def simhash_pairs(docs: DataFrame, max_hamming: int = 4,
                  id_col: str = "doc_id", text_col: str = "text",
                  band_bits: int = 12) -> DataFrame:
    """Near-dup pairs by SimHash: candidates share >=1 of five 12-bit
    bands, verified by popcount of xor <= max_hamming.

    Pigeonhole guarantee: with B = 60/band_bits bands, any pair at
    hamming <= B-1 has at least one clean band, so recall is exact for
    max_hamming <= B-1 (the defaults: 5 bands, max_hamming 4). Callers
    wanting a larger radius must shrink band_bits accordingly."""
    bands_n = SIMHASH_BITS // band_bits
    if max_hamming > bands_n - 1:
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the pigeonhole bound "
            f"{bands_n - 1} of {bands_n} bands; use smaller band_bits")
    sh = simhash60(docs, id_col, text_col)
    bands = sh.select(
        "doc_id", "simhash",
        F.explode(F.array(*[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftrightunsigned(F.col("simhash"), i * band_bits)
                 .bitwiseAND(F.lit((1 << band_bits) - 1)).alias("bkey"),
            )
            for i in range(bands_n)
        ])).alias("b"),
    ).select("doc_id", "simhash", "b.band", "b.bkey")
    x, y = bands.alias("x"), bands.alias("y")
    cand = (
        x.join(y, (F.col("x.band") == F.col("y.band"))
               & (F.col("x.bkey") == F.col("y.bkey"))
               & (F.col("x.doc_id") < F.col("y.doc_id")))
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"),
                F.col("x.simhash").alias("sa"), F.col("y.simhash").alias("sb"))
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming",
            F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).cast("long"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------

def cosine_dup_pairs_lsh(embeddings: DataFrame, tau: float,
                         n_planes: int = 16, bands: int = 4, seed: int = 42,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         dim: int | None = None) -> DataFrame:
    """Near-dup pairs by cosine >= tau — the SCALE path: candidates
    come from an equi-join on shared LSH signature bands (each band =
    ``n_planes/bands`` hyperplane sign bits), then exact cosine
    verification. Never a cross join: candidate count is driven by
    band collisions, and the band rows carry only (id, band, key) —
    vectors are re-joined by id for the verify step.

    Recall is probabilistic (P[band clean] = (1 - angle/pi)^bits per
    band), high for near-identical vectors (tau >= ~0.9) — the dedup
    regime. The brute-force ``cosine_dup_pairs`` is the exact baseline.
    """
    from .similarity import _dot_col, _norm_col, hyperplane_signature

    if dim is None:  # driver-side probe only when the caller can't say
        dim = len(embeddings.select(vec_col).first()[0])
    sigs = hyperplane_signature(embeddings, n_planes, dim, seed,
                                id_col, vec_col)
    bits = n_planes // bands
    mask = (1 << bits) - 1
    band_rows = sigs.select(
        "vec_id",
        F.explode(F.array(*[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftrightunsigned(F.col("bucket"), i * bits)
                 .bitwiseAND(F.lit(mask)).alias("bkey"),
            )
            for i in range(bands)
        ])).alias("b"),
    ).select("vec_id", "b.band", "b.bkey")
    x, y = band_rows.alias("x"), band_rows.alias("y")
    cand = (
        x.join(y, (F.col("x.band") == F.col("y.band"))
               & (F.col("x.bkey") == F.col("y.bkey"))
               & (F.col("x.vec_id") < F.col("y.vec_id")))
        .select(F.col("x.vec_id").alias("id_a"),
                F.col("y.vec_id").alias("id_b"))
        .distinct()
    )
    # the SAME fold expressions as the brute-force baseline and the
    # DuckDB oracles (similarity._dot_col/_norm_col) — the sequential
    # float summation order is determinism-critical, keep one source
    normed = sigs.select("vec_id", "v").withColumn(
        "norm", _norm_col(F.col("v")))
    a = normed.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"),
                      F.col("norm").alias("na"))
    b = normed.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"),
                      F.col("norm").alias("nb"))
    dot = _dot_col(F.col("va"), F.col("vb"))
    return (
        cand.join(a, "id_a").join(b, "id_b")
        .withColumn("cosine", F.round(dot / (F.col("na") * F.col("nb")), 6))
        .filter(F.col("cosine") >= tau)
        .select("id_a", "id_b", "cosine")
    )


#: Upper bound on the input rows `cosine_dup_pairs` will accept.
#: The brute-force shape is an O(n^2) non-equi join
#: (BroadcastNestedLoopJoin) — correct, and the exact-recall oracle
#: for the LSH path — but catastrophic on large tables, so the public
#: API refuses big inputs instead of silently planning a 10^18-pair
#: cross join. Raise it explicitly (or pass max_rows=None) only in
#: tests/oracles.
COSINE_BRUTE_FORCE_MAX_ROWS = 100_000


def cosine_dup_pairs(embeddings: DataFrame, tau: float,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     max_rows: int | None = COSINE_BRUTE_FORCE_MAX_ROWS) -> DataFrame:
    """Pairs with cosine similarity >= tau. Brute-force block join —
    the exact baseline / test oracle; the scale path (and the public
    entry point for real corpora) is cosine_dup_pairs_lsh. Guarded by
    ``max_rows``: the count is one cheap columnar scan and prevents
    the O(n^2) plan from ever reaching a large table by accident."""
    if max_rows is not None:
        n = embeddings.count()
        if n > max_rows:
            raise ValueError(
                f"cosine_dup_pairs is the O(n^2) exact baseline and the "
                f"input has {n} rows (> max_rows={max_rows}); use "
                f"cosine_dup_pairs_lsh for large tables, or pass "
                f"max_rows=None/higher if you really mean it")
    normed = embeddings.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn(
        "norm",
        F.sqrt(F.aggregate(F.col("v"), F.lit(0.0), lambda acc, x: acc + x * x)),
    )
    a, b = normed.alias("a"), normed.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    return (
        a.join(b, F.col("a.vid") < F.col("b.vid"))
        .withColumn("cosine", F.round(dot / (F.col("a.norm") * F.col("b.norm")), 6))
        .filter(F.col("cosine") >= tau)
        .select(F.col("a.vid").alias("id_a"), F.col("b.vid").alias("id_b"), "cosine")
    )


# ---------------------------------------------------------------------------
# duplicate-cluster resolution: pairs -> connected components -> keep set
# ---------------------------------------------------------------------------

def dup_components(pairs: DataFrame, a_col: str = "doc_a",
                   b_col: str = "doc_b", max_iters: int = 60,
                   scratch_dir: str | None = None) -> DataFrame:
    """Connected components over a duplicate-pair graph: (node,
    component) where component = the minimum node id reachable from
    ``node``. The step every dedup pipeline needs after pair
    generation — transitive closure turns pairwise near-dups into
    keep/drop decisions.

    Algorithm: alternating large-star / small-star (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14):
    large-star connects every strictly-larger neighbor of u to
    min(N(u) + {u}); small-star connects the smaller-or-equal
    neighbors (and u) to that min. Each half-round is one
    symmetrize -> groupBy-min -> join over the edge table; the
    alternation provably converges to per-component stars in
    O(log^2 n) rounds (2-4 on dedup graphs, whose components are
    near-cliques). State is just the edge table, sharded like any
    other DataFrame — no driver-side graph.

    Iterative-lineage note: per-round truncation goes through a
    parquet spill of the edge table, NOT localCheckpoint — measured on
    this Spark build, repeated localCheckpoint chains of self-joins
    degrade exponentially after ~15 rounds while the spill stays flat,
    and the spill pattern works against shared storage on a cluster.
    ``scratch_dir``: a location every executor can reach (defaults to
    a driver-local tempdir — correct for local mode; pass a shared
    path on a real cluster). The returned frame reads the final spill
    lazily, so the scratch area must outlive consumption; callers who
    pass ``scratch_dir`` own its lifecycle. Default (driver-local
    tempdir) scratches are registered in ``_CC_SCRATCHES`` so
    ``release_component_scratches()`` reclaims them once results are
    consumed."""
    import tempfile

    scratch = scratch_dir or tempfile.mkdtemp(prefix="dup_components_")
    if scratch_dir is None:
        _CC_SCRATCHES.append(scratch)
    spark = pairs.sparkSession

    def spill(df: DataFrame, name: str) -> DataFrame:
        path = f"{scratch}/{name}"
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    edges = spill(
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct(), "edges_init")

    def neighborhoods_min(e: DataFrame):
        s = e.union(e.select(F.col("v").alias("u"),
                             F.col("u").alias("v")))
        mins = (s.groupBy("u").agg(F.min("v").alias("_mv"))
                .select("u", F.least("_mv", F.col("u")).alias("m")))
        return s, mins

    def checksum(e: DataFrame):
        # decimal(38,0) accumulator: a long sum of 64-bit hashes
        # overflows under ANSI mode
        row = e.agg(F.count("*").alias("c"),
                    F.coalesce(F.sum(F.xxhash64("u", "v")
                                     .cast("decimal(38,0)")),
                               F.lit(0).cast("decimal(38,0)"))
                    .alias("h")).first()
        return (row["c"], str(row["h"]))

    prev_sum = None
    for i in range(max_iters):
        # large-star: (v, m) for v in N(u), v > u
        s, mins = neighborhoods_min(edges)
        large = (s.join(mins, "u").filter(F.col("v") > F.col("u"))
                 .select(F.col("v").alias("u"), F.col("m").alias("v")))
        mid = large.filter(F.col("u") != F.col("v")).distinct()
        # small-star: (v, m) for v in N(u)+{u}, v <= u, v != m —
        # composed over the large-star output in the SAME plan: one
        # parquet spill per round still truncates the iteration's
        # lineage (the flat-cost property measured in round 4) while
        # halving the spill round trips (r6: ~0.7-0.9 s per round at
        # sf0.1 was pure write+read+job overhead of the mid-round
        # spill)
        s, mins = neighborhoods_min(mid)
        small = (s.join(mins, "u").filter(F.col("v") < F.col("u"))
                 .select(F.col("v").alias("u"), F.col("m").alias("v"))
                 .union(mins.select(F.col("u"), F.col("m").alias("v"))))
        edges = spill(small.filter(F.col("u") != F.col("v")).distinct(),
                      f"edges_s{i % 2}")
        cur = checksum(edges)
        if cur == prev_sum:
            break
        prev_sum = cur
    else:
        raise RuntimeError(f"dup_components did not converge in "
                           f"{max_iters} rounds — pathological graph or bug")
    # converged star edges are (child, root); components = least(u, min N(u))
    s = edges.union(edges.select(F.col("v").alias("u"),
                                 F.col("u").alias("v")))
    return (s.groupBy("u").agg(F.min("v").alias("_mv"))
            .select(F.col("u").alias("node"),
                    F.least("_mv", F.col("u")).alias("component")))


_CC_SCRATCHES: list = []


def release_component_scratches() -> int:
    """Remove every default scratch dir left by dup_components calls
    (safe once their results are consumed). Returns the count."""
    import shutil as _sh

    n = 0
    while _CC_SCRATCHES:
        _sh.rmtree(_CC_SCRATCHES.pop(), ignore_errors=True)
        n += 1
    return n


def dedup_keep_canonical(docs: DataFrame, pairs: DataFrame,
                         id_col: str = "doc_id",
                         a_col: str = "doc_a",
                         b_col: str = "doc_b") -> DataFrame:
    """Drop all but the canonical (minimum-id) member of every
    duplicate cluster: docs LEFT ANTI JOIN the non-canonical nodes.
    Documents in no pair pass through untouched. The join ships only
    (node, component) — never text."""
    comp = dup_components(pairs, a_col, b_col)
    losers = comp.filter(F.col("node") != F.col("component")) \
        .select(F.col("node").alias(id_col))
    return docs.join(losers, id_col, "left_anti")
