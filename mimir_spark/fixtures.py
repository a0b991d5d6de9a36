"""Deterministic synthetic transcript corpus (FIXTURES.md §1).

Input table shape per BASELINE.json input_hint:
    (conv_id string, turn_idx int, role string, text string,
     tool string, ts timestamp)

Generation is per-conversation counter-based (SeedSequence([seed,
conv_i])), so the corpus is identical regardless of how conversations
are distributed over partitions — the property that lets the SAME
corpus be generated in-cluster at any scale with no data movement.
This mirrors the reference's test-fixture discipline (one shared corpus
indexed per configuration, mimir-test/.../TestQueries.java:110-124).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

ANCHOR_US = np.int64(pd.Timestamp("2026-01-05T00:00:00").value // 1000)
SEVEN_DAYS_US = 7 * 86_400_000_000
ROLES = np.array(["user", "assistant", "tool"])
ROLE_P = np.array([0.35, 0.45, 0.20])
TOOLS = np.array(["bash", "search", "read", "write", "browser"])
_zipf_w = 1.0 / np.arange(1, len(TOOLS) + 1) ** 1.2
TOOL_P = _zipf_w / _zipf_w.sum()

NON_ASCII_TEXT = "Thîs ís à teßt €12"

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)

# The committed fixture parquet stores naive timestamps, which batch
# reads infer as TIMESTAMP_NTZ (timezone-independent — the property
# that keeps the DuckDB oracles exact under any session timezone).
# Streaming file sources take an EXPLICIT schema, so they must declare
# ntz too or the same bytes would be re-interpreted as instants and
# every bucket boundary would shift with the session timezone.
TRANSCRIPT_SCHEMA_NTZ = TRANSCRIPT_SCHEMA.replace(
    "ts timestamp", "ts timestamp_ntz")


def _vocab() -> np.ndarray:
    """5k-word deterministic vocabulary."""
    rng = np.random.default_rng(20260105)
    syll = np.array(["ba", "ko", "ri", "ta", "mu", "ze", "lo", "fi", "na", "du",
                     "pe", "sa", "wi", "go", "che", "ver", "tion", "ing", "er", "ly"])
    parts = rng.integers(0, len(syll), size=(5000, 3))
    words = np.array(["".join(syll[p]) for p in parts])
    return words


VOCAB = _vocab()


def conversation_frame(conv_i: int, seed: int = 42, hot_period: int = 1000,
                       hot_turns: tuple[int, int] = (500, 2000),
                       dup_frac: float = 0.005) -> pd.DataFrame:
    """Generate one conversation's turns (deterministic in (seed, conv_i)).

    Every 1000th conversation (index % hot_period == 7) is "hot" with
    n_turns ~ Uniform(hot_turns) — the explicit skew knob.
    """
    rng = np.random.default_rng(np.random.SeedSequence([seed, conv_i]))
    if hot_period and conv_i % hot_period == 7:
        n = int(rng.integers(hot_turns[0], hot_turns[1] + 1))
    else:
        n = int(np.clip(np.round(rng.lognormal(2.3, 1.0)), 1, 512))
    if conv_i == 0:
        n = max(n, 4)  # room for the deterministic edge rows

    roles = ROLES[rng.choice(len(ROLES), size=n, p=ROLE_P)]
    tools = np.where(
        roles == "tool", TOOLS[rng.choice(len(TOOLS), size=n, p=TOOL_P)], None
    )

    lens = rng.geometric(1.0 / 40.0, size=n).clip(1, 400)
    flat = VOCAB[rng.integers(0, len(VOCAB), size=int(lens.sum()))]
    bounds = np.cumsum(lens)[:-1]
    texts = np.array([" ".join(w) for w in np.split(flat, bounds)], dtype=object)
    if conv_i == 0:
        texts[0] = ""  # empty-text edge
        texts[1] = NON_ASCII_TEXT  # non-ASCII edge (parser-corpus analogue)
        texts[2] = " ".join(["outlier"] * 1500)  # ~10 kB outlier

    start = ANCHOR_US + np.int64(rng.integers(0, SEVEN_DAYS_US))
    deltas = rng.exponential(20_000_000.0, size=n)
    gap_mask = rng.random(n) < 0.05
    deltas[gap_mask] = rng.uniform(600_000_000.0, 10_800_000_000.0, size=int(gap_mask.sum()))
    deltas[0] = 0
    ts = start + np.cumsum(deltas).astype(np.int64)

    pdf = pd.DataFrame(
        {
            "conv_id": f"conv-{conv_i:08d}",
            "turn_idx": np.arange(n, dtype=np.int32),
            "role": roles,
            "text": texts,
            "tool": tools,
            "ts": ts.astype("datetime64[us]"),
        }
    )
    # exact-duplicate knob: 0.5% of rows appear twice (same conv_id,
    # turn_idx) — ingest must dedup (AtomicIndex.java:245-254 analogue)
    dup = rng.random(n) < dup_frac
    if dup.any():
        pdf = pd.concat([pdf, pdf[dup]], ignore_index=True)
    return pdf


def transcripts_pandas(n_conv: int, seed: int = 42, **kw) -> pd.DataFrame:
    """Whole corpus as a single pandas frame (small scales only)."""
    return pd.concat(
        [conversation_frame(i, seed, **kw) for i in range(n_conv)],
        ignore_index=True,
    )


def transcripts_df(spark, n_conv: int, seed: int = 42, parallelism: int | None = None,
                   **kw):
    """Distributed corpus generation: spark.range over conv ids ->
    mapInPandas, one vectorized conversation frame per id."""
    parallelism = parallelism or spark.sparkContext.defaultParallelism
    ids = spark.range(0, n_conv, 1, parallelism)

    def gen(batches):
        for pdf in batches:
            frames = [conversation_frame(int(i), seed, **kw) for i in pdf["id"]]
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return ids.mapInPandas(gen, TRANSCRIPT_SCHEMA)


# Named scales from FIXTURES.md
SCALES = {
    "t-small": 200,
    "t-mid": 5_000,
    "t-bench": 20_000,
}


def clustered_embeddings_pandas(n_vectors: int, dim: int = 64,
                                n_clusters: int = 20, spread: float = 0.15,
                                seed: int = 7) -> pd.DataFrame:
    """Structured embedding fixture: a seeded mixture of Gaussians.

    Cluster centers ~ N(0, I) on the unit sphere; each vector = its
    center + ``spread``-scaled isotropic noise, renormalized. Unlike
    the near-uniform driver testdata (PLANS.md 'degenerate IVF'
    finding), this has real cluster structure — the distribution ANN
    recall gates run against, mirroring topic/modality clustering in
    production embedding tables."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, n_clusters, size=n_vectors)
    x = centers[labels] + spread * rng.standard_normal((n_vectors, dim))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return pd.DataFrame({
        "vec_id": np.arange(n_vectors, dtype=np.int64),
        "cluster": labels.astype(np.int32),
        "embedding": list(x.astype(np.float64)),
    })


def clustered_embeddings_df(spark, n_vectors: int, dim: int = 64,
                            n_clusters: int = 20, spread: float = 0.15,
                            seed: int = 7):
    pdf = clustered_embeddings_pandas(n_vectors, dim, n_clusters, spread, seed)
    # plain-python floats: vanilla sessions (no Arrow) reject numpy
    # scalars inside array<double> fields
    pdf = pdf.assign(
        embedding=pdf["embedding"].map(lambda a: [float(x) for x in a]))
    return spark.createDataFrame(
        pdf, "vec_id long, cluster int, embedding array<double>")


def neardup_docs_pandas(n_base: int = 150, dup_frac: float = 0.4,
                        mutate_tokens: int = 2, doc_tokens: int = 60,
                        seed: int = 23) -> pd.DataFrame:
    """Seeded near-duplicate corpus with KNOWN ground truth: base
    documents of ``doc_tokens`` vocabulary words; a ``dup_frac``
    fraction get one near-duplicate copy with ``mutate_tokens`` random
    token substitutions (high-Jaccard by construction). Returns
    (doc_id, text, dup_of) where dup_of is the base doc id for
    near-dups and NULL for originals — the label dedup quality gates
    measure against."""
    rng = np.random.default_rng(seed)
    vocab = _vocab()
    rows = []
    next_id = 0
    for b in range(n_base):
        toks = list(vocab[rng.integers(0, len(vocab), size=doc_tokens)])
        rows.append((next_id, " ".join(toks), None))
        base_id = next_id
        next_id += 1
        if rng.random() < dup_frac:
            mut = list(toks)
            for pos in rng.choice(doc_tokens, size=mutate_tokens,
                                  replace=False):
                mut[int(pos)] = str(vocab[rng.integers(0, len(vocab))])
            rows.append((next_id, " ".join(mut), base_id))
            next_id += 1
    return pd.DataFrame(rows, columns=["doc_id", "text", "dup_of"])
