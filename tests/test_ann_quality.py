"""ANN retrieval-quality gates on STRUCTURED embeddings (seeded
mixture of Gaussians, fixtures.clustered_embeddings_df): IVF and LSH
recall@10 vs the exact brute force must clear 0.9 at the documented
probe settings. The driver's near-uniform synthetic table shows the
documented degenerate IVF curve (PLANS.md); this fixture is the
realistic-distribution counterpart."""

from __future__ import annotations

import numpy as np
import pytest

from mimir_spark import similarity
from mimir_spark.fixtures import clustered_embeddings_df, clustered_embeddings_pandas

N, DIM, K = 2000, 64, 10
N_QUERIES = 8


@pytest.fixture(scope="module")
def emb(spark):
    df = clustered_embeddings_df(spark, N, dim=DIM)
    df = df.persist()
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def exact_topk():
    """Ground truth computed in numpy (same cosine, same tie rule:
    descending sim, ascending id)."""
    pdf = clustered_embeddings_pandas(N, dim=DIM)
    x = np.stack(pdf["embedding"].to_numpy())
    norms = np.linalg.norm(x, axis=1)

    def topk(qid: int, k: int = K) -> set[int]:
        q = x[qid]
        sims = np.round(x @ q / (norms * np.linalg.norm(q)), 6)
        order = np.lexsort((np.arange(N), -sims))
        return set(int(i) for i in order[:k])

    return x, topk


def _recall(got_ids: set[int], want_ids: set[int]) -> float:
    return len(got_ids & want_ids) / len(want_ids)


QUERY_IDS = [3, 211, 540, 777, 1024, 1300, 1650, 1999][:N_QUERIES]


def test_brute_force_matches_numpy(spark, emb, exact_topk):
    x, topk = exact_topk
    qid = QUERY_IDS[0]
    got = {r.vec_id for r in
           similarity.brute_force_topk(emb, list(x[qid]), K).collect()}
    assert got == topk(qid)


def test_ivf_recall_on_clustered(spark, emb, exact_topk):
    """IVF (16 cells, nprobe=4 — a 25% expected scan fraction) recalls
    >= 0.9 on clustered data; cf. 0.49 on the near-uniform table."""
    x, topk = exact_topk
    sample = x[:256]
    cent = similarity.ivf_train(sample, 16)
    recs = []
    for qid in QUERY_IDS:
        got = {r.vec_id for r in
               similarity.ivf_topk(emb, list(x[qid]), K, cent, nprobe=4)
               .collect()}
        recs.append(_recall(got, topk(qid)))
    assert np.mean(recs) >= 0.9, recs


def test_multi_lsh_recall_on_clustered(spark, emb, exact_topk):
    """Multi-table LSH at the documented quality config (L=6 tables,
    12 planes, hamming <= 3 — ~40% candidate fraction measured on this
    fixture) recalls >= 0.9; a SINGLE table at a comparable scan
    fraction measured 0.81 (see module docstring / PLANS.md)."""
    x, topk = exact_topk
    recs = []
    for qid in QUERY_IDS:
        got = {r.vec_id for r in
               similarity.multi_lsh_topk(emb, list(x[qid]), K,
                                         n_tables=6, n_planes=12,
                                         probe_hamming=3).collect()}
        recs.append(_recall(got, topk(qid)))
    assert np.mean(recs) >= 0.9, recs


def test_multi_lsh_bucketed_matches_in_memory(spark, emb, exact_topk, tmp_path):
    """The (tbl, bucket)-partitioned store returns the same top-k as
    the in-memory multi-table variant, and its plan prunes partitions
    at the scan."""
    x, _ = exact_topk
    store = str(tmp_path / "mlsh")
    similarity.write_embeddings_multi_lsh(emb, store, n_tables=6,
                                          n_planes=12, dim=DIM)
    qid = QUERY_IDS[1]
    a = [tuple(r) for r in
         similarity.multi_lsh_topk(emb, list(x[qid]), K, n_tables=6,
                                   n_planes=12, probe_hamming=3).collect()]
    bdf = similarity.multi_lsh_topk_bucketed(spark, store, list(x[qid]), K,
                                             n_tables=6, n_planes=12,
                                             probe_hamming=3)
    b = [tuple(r) for r in bdf.collect()]
    assert a == b
    plan = bdf._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan


def test_batch_topk_matches_per_query(spark, emb, exact_topk):
    """One-job batch ANN == per-query exact results for every query."""
    x, topk = exact_topk
    queries = spark.createDataFrame(
        [(int(q), [float(v) for v in x[q]]) for q in QUERY_IDS],
        "qid long, qvec array<double>")
    got = similarity.batch_topk(emb, queries, K).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["qid"], set()).add(r["vec_id"])
    assert set(by_q) == set(QUERY_IDS)
    for q in QUERY_IDS:
        assert by_q[q] == topk(q), q


def test_ivf_batch_topk_matches_single(spark, emb, exact_topk, tmp_path):
    """Batch IVF == the single-query IVF path, query by query; the
    pruned scan reads only the union of probed cells."""
    x, _ = exact_topk
    cent = similarity.ivf_train(x[:256], 16)
    store = str(tmp_path / "ivf")
    similarity.write_embeddings_ivf(emb, store, cent)
    queries = spark.createDataFrame(
        [(int(q), [float(v) for v in x[q]]) for q in QUERY_IDS],
        "qid long, qvec array<double>")
    batch = similarity.ivf_batch_topk(spark, store, queries, K, cent,
                                      nprobe=4)
    by_q = {}
    for r in batch.collect():
        by_q.setdefault(r["qid"], []).append((r["rank"], r["vec_id"],
                                              r["cosine"]))
    for q in QUERY_IDS:
        single = [(i + 1, r["vec_id"], r["cosine"]) for i, r in enumerate(
            similarity.ivf_topk_bucketed(spark, store, list(x[q]), K,
                                         cent, nprobe=4).collect())]
        assert sorted(by_q[q]) == single, q
    plan = batch._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan


def test_ivf_batch_topk_string_qids(spark, emb, exact_topk, tmp_path):
    """qid keeps the input's type — string request ids work."""
    x, _ = exact_topk
    cent = similarity.ivf_train(x[:256], 16)
    store = str(tmp_path / "ivfq")
    similarity.write_embeddings_ivf(emb, store, cent)
    queries = spark.createDataFrame(
        [("req-a", [float(v) for v in x[3]])],
        "qid string, qvec array<double>")
    rows = similarity.ivf_batch_topk(spark, store, queries, 5, cent).collect()
    assert {r["qid"] for r in rows} == {"req-a"} and len(rows) == 5


def test_all_pairs_guard_refuses_big_input(spark, emb):
    """The exact kNN-join is the O(n^2) oracle; above max_rows it must
    refuse instead of planning an n^2 BroadcastNestedLoopJoin."""
    with pytest.raises(ValueError, match="O\\(n\\^2\\)"):
        similarity.all_pairs_topk(emb, K, max_rows=100)


def test_lsh_all_pairs_recall_on_clustered(spark, emb, exact_topk):
    """The bucketed kNN-join (per-(tbl,bucket) local all-pairs, L=12
    tables, 8 planes, hamming<=1 probe expansion — mean recall 0.95 /
    ~40% candidate fraction measured on this fixture) recalls >= 0.9
    of the exact oracle's neighbour sets, averaged over every vector —
    and its plan is equi-join only (no BroadcastNestedLoopJoin)."""
    x, _ = exact_topk
    approx = similarity.lsh_all_pairs_topk(emb, K, dim=DIM)
    plan = approx._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    got = {}
    for r in approx.collect():
        got.setdefault(r["qid"], set()).add(r["nid"])
    exact = similarity.all_pairs_topk(emb, K, max_rows=None)
    want = {}
    for r in exact.collect():
        want.setdefault(r["qid"], set()).add(r["nid"])
    recs = [_recall(got.get(q, set()), nbrs) for q, nbrs in want.items()]
    assert np.mean(recs) >= 0.9, (np.mean(recs), min(recs))


def test_lsh_all_pairs_pairs_are_exact_cosines(spark, emb, exact_topk):
    """Every (qid, nid, cosine) the approximate join emits carries the
    EXACT cosine (rounded 6dp) — approximation only drops pairs, never
    mis-scores them — and ranks are dense per qid."""
    x, _ = exact_topk
    norms = np.linalg.norm(x, axis=1)
    rows = similarity.lsh_all_pairs_topk(emb, K, dim=DIM) \
        .filter("qid IN (3, 211, 540)").collect()
    assert rows
    by_q = {}
    for r in rows:
        q, n = int(r["qid"]), int(r["nid"])
        want = round(float(x[q] @ x[n] / (norms[q] * norms[n])), 6)
        assert abs(r["cosine"] - want) < 1e-9, (q, n)
        by_q.setdefault(q, []).append(int(r["rank"]))
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), q
