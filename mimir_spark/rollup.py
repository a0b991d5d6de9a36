"""Tiered rollup engine: continuous aggregates + compressed chunks.

The production path computes ALL retention tiers (1m/1h/1d) in ONE
shuffle: points are hash-partitioned by (series, day) and sorted by
(series, ts) within partitions; a single Arrow pass then detects tier
boundaries positionally and encodes every tier's chunks with the
vectorized multi-chunk codec — zero per-point Python, zero decode work.
This is the Spark-first replacement for the reference's per-sub-index
single-writer pipeline (MimirIndex.java:139,448; one task per partition
is the single writer) and its batch-flush postings write
(AtomicIndex.java:940-1083).

The 1m->1h->1d *cascade* (re-aggregation from a finer tier, chunk
merge included) is also provided — it is the LSM compact analogue
(AtomicIndex.java:1280-1366) and doubles as the differential test of
the one-pass path: rollup_1h(from raw) == cascade(rollup_1m).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import codec

TIER_US = {"1m": 60_000_000, "1h": 3_600_000_000, "1d": 86_400_000_000}
TIER_TRUNC = {"1m": "minute", "1h": "hour", "1d": "day"}

ROLLUP_SCHEMA = (
    "tier string, kind string, series_key string, metric string, "
    "bucket_ts timestamp, cnt long, sum_v double, min_v double, "
    "max_v double, last_v double, chunk binary"
)

_SERIES_COLS = ["kind", "series_key", "metric"]
#: public alias + the raw-points row schema — shared by read_path,
#: downsample, and functions.timeseries so the series vocabulary has
#: one owner
SERIES_COLS = tuple(_SERIES_COLS)
POINTS_SCHEMA = ("kind string, series_key string, metric string, "
                 "ts timestamp, v double")


# ---------------------------------------------------------------------------
# one-pass multi-tier rollup (the production path)
# ---------------------------------------------------------------------------

def _encode_group_chunks(ts_us, v, starts, max_points):
    """Encode per-group chunks; groups above ``max_points`` become
    concatenated self-delimiting sub-chunks (codec.decode_all reads
    them back) so one hot (series, bucket) group never materializes an
    unbounded array in the codec."""
    if not max_points:
        return codec.encode_many(ts_us, v, starts)
    n = len(ts_us)
    ends = np.append(starts[1:], n)
    sizes = ends - starts
    nsub = np.maximum(1, -(-sizes // max_points))
    total = int(nsub.sum())
    if total == len(starts):
        return codec.encode_many(ts_us, v, starts)
    group_idx = np.repeat(np.arange(len(starts)), nsub)
    k = np.arange(total) - np.repeat(np.cumsum(nsub) - nsub, nsub)
    sub_starts = starts[group_idx] + k * max_points
    chunks = codec.encode_many(ts_us, v, sub_starts)
    out, pos = [], 0
    for cnt in nsub.tolist():
        out.append(b"".join(chunks[pos:pos + cnt]))
        pos += cnt
    return out


def _rollup_block(kind, key, metric, ts_us, v, tiers,
                  max_points=None) -> pd.DataFrame:
    """Vectorized rollup of a sorted block of complete day-groups."""
    n = len(ts_us)
    series_change = np.zeros(n, dtype=bool)
    series_change[0] = True
    if n > 1:
        series_change[1:] = (
            (kind[1:] != kind[:-1]) | (key[1:] != key[:-1]) | (metric[1:] != metric[:-1])
        )
    frames = []
    for tier in tiers:
        unit = TIER_US[tier]
        bucket = ts_us - ts_us % unit
        change = series_change.copy()
        if n > 1:
            change[1:] |= bucket[1:] != bucket[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], n)
        chunks = _encode_group_chunks(ts_us, v, starts, max_points)
        frames.append(pd.DataFrame({
            "tier": tier,
            "kind": kind[starts],
            "series_key": key[starts],
            "metric": metric[starts],
            "bucket_ts": bucket[starts].astype("datetime64[us]"),
            "cnt": (ends - starts).astype(np.int64),
            "sum_v": np.add.reduceat(v, starts),
            "min_v": np.minimum.reduceat(v, starts),
            "max_v": np.maximum.reduceat(v, starts),
            "last_v": v[ends - 1],
            "chunk": pd.Series(chunks, dtype=object),
        }))
    return pd.concat(frames, ignore_index=True)


def _make_rollup_fn(tiers, max_points=None):
    coarsest = TIER_US[tiers[-1]]

    def process(iterator):
        buf = None
        for pdf in iterator:
            if len(pdf) == 0:
                continue
            buf = pdf if buf is None else pd.concat([buf, pdf], ignore_index=True)
            kind = buf["kind"].to_numpy()
            key = buf["series_key"].to_numpy()
            metric = buf["metric"].to_numpy()
            ts_us = buf["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
            day = ts_us - ts_us % coarsest
            n = len(buf)
            change = np.zeros(n, dtype=bool)
            if n > 1:
                change[1:] = (
                    (kind[1:] != kind[:-1]) | (key[1:] != key[:-1])
                    | (metric[1:] != metric[:-1]) | (day[1:] != day[:-1])
                )
            cuts = np.flatnonzero(change)
            if len(cuts):
                cut = int(cuts[-1])
                v = buf["v"].to_numpy(dtype=np.float64)
                yield _rollup_block(kind[:cut], key[:cut], metric[:cut],
                                    ts_us[:cut], v[:cut], tiers, max_points)
                buf = buf.iloc[cut:].reset_index(drop=True)
        if buf is not None and len(buf):
            kind = buf["kind"].to_numpy()
            key = buf["series_key"].to_numpy()
            metric = buf["metric"].to_numpy()
            ts_us = buf["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
            v = buf["v"].to_numpy(dtype=np.float64)
            yield _rollup_block(kind, key, metric, ts_us, v, tiers, max_points)

    return process


def _check_tiers(tiers):
    bad = [t for t in tiers if t not in TIER_US]
    if bad:
        raise ValueError(f"unknown tier(s) {bad}; valid tiers: {sorted(TIER_US)}")


def rollup_points(points: DataFrame, tiers: tuple[str, ...] = ("1m", "1h", "1d"),
                  num_partitions: int | None = None,
                  max_points: int | None = None) -> DataFrame:
    """points (kind, series_key, metric, ts, conv_id, turn_idx, v) ->
    one row per (tier, series, bucket) with aggregates + chunk.

    Partitioning by (series, coarsest-tier bucket) guarantees every
    output group lives wholly in one partition while spreading a hot
    series across time — the explicit skew-split of SURVEY.md §4.3.
    """
    _check_tiers(tiers)
    tiers = tuple(sorted(tiers, key=lambda t: TIER_US[t]))
    part_cols = [F.col(c) for c in _SERIES_COLS] + [
        F.date_trunc(TIER_TRUNC[tiers[-1]], F.col("ts"))
    ]
    shuffled = (
        points.repartition(*(([num_partitions] if num_partitions else []) + part_cols))
        .sortWithinPartitions(*_SERIES_COLS, "ts", "conv_id", "turn_idx")
    )
    return shuffled.mapInPandas(_make_rollup_fn(tiers, max_points), ROLLUP_SCHEMA)


# closed metric vocabulary of the transcript pipeline: shipped to the
# Arrow pass as int8 codes so boundary detection is integer compares,
# not 30M python string comparisons
METRICS = ["turn_rate", "token_volume",
           "role_mix_user", "role_mix_assistant", "role_mix_tool",
           "role_mix_other"]
_METRIC_ARR = np.array(METRICS)


def _conv_points_fast(turns: DataFrame, shard_expr=None) -> DataFrame:
    """conv-kind metric explode with int8 metric codes
    (series_key == conv_id; kind implied). ``shard_expr``: optional
    Column carrying the job shard id (a pure function of conv_id) —
    rides along so the Arrow pass can emit per-shard kinds."""
    tok = F.col("n_tok").cast("double")
    # out-of-vocabulary roles map to the role_mix_other catch-all (same
    # as turn_metrics); null roles emit no role_mix point on either path
    role_metric = (
        F.when(F.col("role") == "user", F.lit(2))
        .when(F.col("role") == "assistant", F.lit(3))
        .when(F.col("role") == "tool", F.lit(4))
        .when(F.col("role").isNotNull(), F.lit(5))
    )
    entry = lambda mid, v: F.struct(  # noqa: E731
        mid.cast("int").alias("metric_id"), v.alias("v"))
    entries = F.array(
        entry(F.lit(0), F.lit(1.0)),
        entry(F.lit(1), tok),
        entry(role_metric, F.lit(1.0)),
    )
    extra = [shard_expr.alias("shard")] if shard_expr is not None else []
    return (
        turns.select(F.col("conv_id").alias("series_key"), "ts", "turn_idx",
                     *extra, F.explode(entries).alias("e"))
        .filter(F.col("e.metric_id").isNotNull())
        .select("series_key", F.col("e.metric_id").alias("metric_id"),
                "ts", "turn_idx", *(["shard"] if extra else []),
                F.col("e.v").alias("v"))
    )


def _rollup_block_fast(key, metric_id, ts_us, v, tiers, kind: str,
                       max_points=None, shard=None) -> pd.DataFrame:
    n = len(ts_us)
    series_change = np.zeros(n, dtype=bool)
    series_change[0] = True
    if n > 1:
        series_change[1:] = (metric_id[1:] != metric_id[:-1]) | (key[1:] != key[:-1])
    frames = []
    for tier in tiers:
        unit = TIER_US[tier]
        bucket = ts_us - ts_us % unit
        change = series_change.copy()
        if n > 1:
            change[1:] |= bucket[1:] != bucket[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], n)
        chunks = _encode_group_chunks(ts_us, v, starts, max_points)
        # shard-tagged kind ("<p>|conv") when a shard array rides along
        # (the resumable job's per-shard commit groups); shard is a
        # function of conv_id == key, so it can't split a series group
        kind_col = (kind if shard is None else
                    np.char.add(np.char.add(
                        shard[starts].astype("U20"), "|"), kind))
        frames.append(pd.DataFrame({
            "tier": tier,
            "kind": kind_col,
            "series_key": key[starts],
            "metric": _METRIC_ARR[metric_id[starts]],
            "bucket_ts": bucket[starts].astype("datetime64[us]"),
            "cnt": (ends - starts).astype(np.int64),
            "sum_v": np.add.reduceat(v, starts),
            "min_v": np.minimum.reduceat(v, starts),
            "max_v": np.maximum.reduceat(v, starts),
            "last_v": v[ends - 1],
            "chunk": pd.Series(chunks, dtype=object),
        }))
    return pd.concat(frames, ignore_index=True)


def _make_rollup_fast_fn(tiers, kind: str, max_points=None,
                         with_shard: bool = False):
    coarsest = TIER_US[tiers[-1]]

    def _shard(b):
        return b["shard"].to_numpy() if with_shard else None

    def process(iterator):
        buf = None
        for pdf in iterator:
            if len(pdf) == 0:
                continue
            buf = pdf if buf is None else pd.concat([buf, pdf], ignore_index=True)
            key = buf["series_key"].to_numpy()
            mid = buf["metric_id"].to_numpy()
            ts_us = buf["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
            day = ts_us - ts_us % coarsest
            n = len(buf)
            change = np.zeros(n, dtype=bool)
            if n > 1:
                change[1:] = ((mid[1:] != mid[:-1]) | (day[1:] != day[:-1])
                              | (key[1:] != key[:-1]))
            cuts = np.flatnonzero(change)
            if len(cuts):
                cut = int(cuts[-1])
                v = buf["v"].to_numpy(dtype=np.float64)
                sh = _shard(buf)
                yield _rollup_block_fast(key[:cut], mid[:cut], ts_us[:cut],
                                         v[:cut], tiers, kind, max_points,
                                         shard=None if sh is None else sh[:cut])
                buf = buf.iloc[cut:].reset_index(drop=True)
        if buf is not None and len(buf):
            yield _rollup_block_fast(
                buf["series_key"].to_numpy(), buf["metric_id"].to_numpy(),
                buf["ts"].to_numpy().astype("datetime64[us]").astype(np.int64),
                buf["v"].to_numpy(dtype=np.float64), tiers, kind, max_points,
                shard=_shard(buf))

    return process


def _conv_turns_narrow(turns: DataFrame, shard_expr=None) -> DataFrame:
    """Narrow per-turn frame for the in-Arrow conv fan-out: one row
    per TURN (not per point), role precoded to the metric id of its
    role_mix series (-1 = null role, emits no role_mix point). The
    Arrow pass explodes each turn into its metric points itself, so
    the Spark-side sort and the JVM->Python transfer carry 3x fewer
    rows than the exploded layout (guide §2.3 'shuffle fewer bytes'
    applied to the serialization boundary)."""
    role_code = (
        F.when(F.col("role") == "user", F.lit(2))
        .when(F.col("role") == "assistant", F.lit(3))
        .when(F.col("role") == "tool", F.lit(4))
        .when(F.col("role").isNotNull(), F.lit(5))
        .otherwise(F.lit(-1))
    )
    extra = [shard_expr.alias("shard")] if shard_expr is not None else []
    return turns.select(
        F.col("conv_id").alias("series_key"), "ts", "turn_idx",
        role_code.cast("int").alias("role_code"),
        F.col("n_tok").cast("double").alias("tok"), *extra)


def _make_rollup_turns_fn(tiers, kind: str, max_points=None,
                          with_shard: bool = False):
    """mapInPandas body over (series_key, ts, turn_idx, role_code,
    tok[, shard]) TURN rows sorted by (series_key, ts, turn_idx)
    within partitions: explodes each turn into its conv-kind metric
    points in numpy and rolls every tier up in the same pass.

    Equivalence to the exploded path (`_conv_points_fast` +
    `_make_rollup_fast_fn`): for a fixed metric, selecting the
    turn subset by mask preserves the (ts, turn_idx) order the
    exploded sort produced, so every (series, metric, bucket) group
    sees the same points in the same order — aggregates and chunk
    bytes are identical (asserted by the rollup equivalence tests).
    """
    coarsest = TIER_US[tiers[-1]]
    # (metric_id, mask-kind, value-kind): turn_rate/token_volume cover
    # every turn; role_mix_<m> covers turns with role_code == m
    def _metric_frames(key, ts_us, role, tok, shard, tiers_):
        frames = []
        ones = None
        for mid in range(len(METRICS)):
            if mid == 0:
                k, t, sh = key, ts_us, shard
                if ones is None or len(ones) != len(ts_us):
                    ones = np.ones(len(ts_us), dtype=np.float64)
                v = ones
            elif mid == 1:
                k, t, v, sh = key, ts_us, tok, shard
            else:
                m = role == mid
                if not m.any():
                    continue
                k, t = key[m], ts_us[m]
                v = np.ones(int(m.sum()), dtype=np.float64)
                sh = None if shard is None else shard[m]
            mid_arr = np.full(len(t), mid, dtype=np.int64)
            frames.append(_rollup_block_fast(
                k, mid_arr, t, v, tiers_, kind, max_points, shard=sh))
        return frames

    def process(iterator):
        buf = None
        for pdf in iterator:
            if len(pdf) == 0:
                continue
            buf = pdf if buf is None else pd.concat([buf, pdf],
                                                    ignore_index=True)
            key = buf["series_key"].to_numpy()
            ts_us = buf["ts"].to_numpy().astype("datetime64[us]") \
                .astype(np.int64)
            day = ts_us - ts_us % coarsest
            n = len(buf)
            change = np.zeros(n, dtype=bool)
            if n > 1:
                change[1:] = (day[1:] != day[:-1]) | (key[1:] != key[:-1])
            cuts = np.flatnonzero(change)
            if len(cuts):
                cut = int(cuts[-1])
                role = buf["role_code"].to_numpy()
                tok = buf["tok"].to_numpy(dtype=np.float64)
                shard = (buf["shard"].to_numpy() if with_shard else None)
                yield pd.concat(_metric_frames(
                    key[:cut], ts_us[:cut], role[:cut], tok[:cut],
                    None if shard is None else shard[:cut], tiers),
                    ignore_index=True)
                buf = buf.iloc[cut:].reset_index(drop=True)
        if buf is not None and len(buf):
            key = buf["series_key"].to_numpy()
            ts_us = buf["ts"].to_numpy().astype("datetime64[us]") \
                .astype(np.int64)
            yield pd.concat(_metric_frames(
                key, ts_us, buf["role_code"].to_numpy(),
                buf["tok"].to_numpy(dtype=np.float64),
                buf["shard"].to_numpy() if with_shard else None, tiers),
                ignore_index=True)

    return process


def _tool_points_fast(turns: DataFrame) -> DataFrame:
    """Tool-kind metric explode over narrow deduped turns — row-for-row
    identical to ``turn_metrics(turns).filter(kind == 'tool')`` (plan-
    free proof: turn_metrics emits tool rows only for non-null tool,
    with v = 1.0 / n_tok, both non-null on the narrow path), but emits
    a 2-entry array over the pre-filtered tool rows instead of a
    5-entry array over every turn that is then 80% discarded."""
    tok = F.col("n_tok").cast("double")
    entries = F.array(
        F.struct(F.lit("turn_rate").alias("metric"), F.lit(1.0).alias("v")),
        F.struct(F.lit("token_volume").alias("metric"), tok.alias("v")),
    )
    return (
        turns.filter(F.col("tool").isNotNull())
        .select(F.col("tool").alias("series_key"), "ts", "conv_id",
                "turn_idx", F.explode(entries).alias("e"))
        .select(F.lit("tool").alias("kind"), "series_key",
                F.col("e.metric").alias("metric"), "ts", "conv_id",
                "turn_idx", F.col("e.v").alias("v"))
    )


def rollup_transcripts(transcripts: DataFrame,
                       tiers: tuple[str, ...] = ("1m", "1h", "1d"),
                       num_partitions: int | None = None,
                       max_points: int | None = None) -> DataFrame:
    """End-to-end transcript rollup tuned for scale (the bench path).

    Plan shape (ONE wide shuffle total for ~88% of the data):
      scan (text reduced to n_tok by the vectorized Arrow tokenizer
            at the scan — never shuffled)
      -> repartition(hash(conv_id))              [shuffle 1: ~50 B rows]
      -> window dedup (reuses that partitioning)
      -> conv-kind series: already co-located by conv_id -> ONE narrow
         row per TURN (series_key, ts, turn_idx, role_code, tok)
         sorted within partitions; the Arrow pass explodes each turn
         into its metric points in numpy (r6: 3x fewer rows sorted
         and serialized than the JVM-exploded layout)   [NO shuffle]
      -> tool-kind series (~12% of points): generic rollup_points over
         the 2-entry tool explode [small shuffle]; the shared
         shuffle-1 subtree is deduplicated by Catalyst's ReuseExchange.

    Equivalent to rollup_points(turn_metrics(ingest(df))) — asserted by
    tests — but moves ~5x fewer bytes end to end.
    """
    from .ingest import dedup_turns, narrow_turns

    _check_tiers(tiers)
    tiers = tuple(sorted(tiers, key=lambda t: TIER_US[t]))
    narrow = narrow_turns(transcripts)
    narrow = (narrow.repartition(num_partitions, F.col("conv_id"))
              if num_partitions else narrow.repartition(F.col("conv_id")))
    turns = dedup_turns(narrow)
    conv = (
        _conv_turns_narrow(turns)
        .sortWithinPartitions("series_key", "ts", "turn_idx")
        # turn_idx is a sort tiebreak only — project it away so the
        # opaque Arrow boundary doesn't serialize it (guide §4.1)
        .drop("turn_idx")
        .mapInPandas(_make_rollup_turns_fn(tiers, kind="conv",
                                           max_points=max_points),
                     ROLLUP_SCHEMA)
    )
    tool = rollup_points(_tool_points_fast(turns), tiers=tiers,
                         max_points=max_points)
    return conv.unionByName(tool)


def rollup_turns(turns: DataFrame,
                 tiers: tuple[str, ...] = ("1m", "1h", "1d"),
                 shard_partitions: int | None = None,
                 num_partitions: int | None = None,
                 max_points: int | None = None) -> DataFrame:
    """Two-branch rollup over an ALREADY-DEDUPED narrow turns table
    (conv_id, turn_idx, role, tool, ts, n_tok) — the staged-input
    variant of ``rollup_transcripts``.

    The resumable job scans the (100 TB) source exactly once, stages
    this narrow deduped frame (~100x smaller: no text), and feeds BOTH
    the conv and tool branches from the staged table — so the union's
    two subtrees re-read the small staging area instead of re-scanning
    the source when AQE declines to reuse the shared Exchange
    (PLANS.md 'flagship double-scan' finding).

    ``shard_partitions``: when set, kind becomes
    "<pmod(xxhash64(conv_id), P)>|conv" / "...|tool" — the per-shard
    commit groups of run_rollup_job, computed identically on both
    branches so a conversation's output always lands in its shard.
    """
    _check_tiers(tiers)
    tiers = tuple(sorted(tiers, key=lambda t: TIER_US[t]))
    shard_expr = (F.pmod(F.xxhash64("conv_id"), F.lit(shard_partitions))
                  if shard_partitions else None)
    t = (turns.repartition(num_partitions, F.col("conv_id"))
         if num_partitions else turns.repartition(F.col("conv_id")))
    conv = (
        _conv_turns_narrow(t, shard_expr=shard_expr)
        .sortWithinPartitions("series_key", "ts", "turn_idx")
        # turn_idx is a sort tiebreak only — project it away so the
        # opaque Arrow boundary doesn't serialize it (guide §4.1)
        .drop("turn_idx")
        .mapInPandas(
            _make_rollup_turns_fn(tiers, kind="conv", max_points=max_points,
                                  with_shard=shard_expr is not None),
            ROLLUP_SCHEMA)
    )
    tool_points = _tool_points_fast(t)
    if shard_expr is not None:
        tool_points = tool_points.withColumn(
            "kind", F.concat(shard_expr.cast("string"), F.lit("|"),
                             F.col("kind")))
    tool = rollup_points(tool_points, tiers=tiers, max_points=max_points)
    return conv.unionByName(tool)


# ---------------------------------------------------------------------------
# aggregate-only rollup (pure JVM, salted two-stage) — for queries that
# don't need chunks; also the oracle-checkable surface
# ---------------------------------------------------------------------------

def rollup_aggs(points: DataFrame, tier: str,
                salt_buckets: int | None = None) -> DataFrame:
    """Continuous aggregates at one tier via built-in hash aggregation.

    With ``salt_buckets`` set, runs the explicit two-stage skew-safe
    plan: partial agg per (series, bucket, salt), final combine per
    (series, bucket). ``last_v`` stays deterministic by carrying the
    (ts, conv_id, turn_idx) order key through both stages.
    """
    bucket = F.date_trunc(TIER_TRUNC[tier], F.col("ts")).alias("bucket_ts")
    ord_key = F.struct(F.col("ts"), F.col("conv_id"), F.col("turn_idx"))
    keys = [*_SERIES_COLS]
    if salt_buckets:
        partial = (
            points.withColumn("_salt", F.pmod(F.xxhash64("conv_id", "turn_idx"),
                                              F.lit(salt_buckets)))
            .groupBy(*keys, bucket, F.col("_salt"))
            .agg(
                F.count("*").alias("cnt"),
                F.sum("v").alias("sum_v"),
                F.min("v").alias("min_v"),
                F.max("v").alias("max_v"),
                F.max_by("v", ord_key).alias("last_v"),
                F.max(ord_key).alias("_ord"),
            )
        )
        return (
            partial.groupBy(*keys, "bucket_ts")
            .agg(
                F.sum("cnt").alias("cnt"),
                F.sum("sum_v").alias("sum_v"),
                F.min("min_v").alias("min_v"),
                F.max("max_v").alias("max_v"),
                F.max_by("last_v", F.col("_ord")).alias("last_v"),
            )
        )
    return (
        points.groupBy(*keys, bucket)
        .agg(
            F.count("*").alias("cnt"),
            F.sum("v").alias("sum_v"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
            F.max_by("v", ord_key).alias("last_v"),
        )
    )


# ---------------------------------------------------------------------------
# tier cascade (compact analogue + differential check of the one-pass path)
# ---------------------------------------------------------------------------

def _merge_chunks_udf(max_points: int | None = None):
    # built lazily: pandas_udf needs an active SparkSession to parse
    # its return type
    @F.pandas_udf("binary")
    def merge_udf(chunk_lists: pd.Series) -> pd.Series:
        def merge(lst):
            return codec.merge_chunks([bytes(e["chunk"]) for e in lst],
                                      max_points=max_points)
        return chunk_lists.map(merge)

    return merge_udf


def cascade(rollup_df: DataFrame, to_tier: str,
            max_points: int | None = None) -> DataFrame:
    """Re-aggregate a finer tier into ``to_tier`` (e.g. 1m -> 1h).

    Aggregates combine associatively; chunks merge in bucket order
    (sort_array on struct sorts by bucket_ts first), so
    decode(cascade chunk) == decode(direct-from-raw chunk).

    ``max_points`` bounds the re-encoded chunk exactly like the one-pass
    writer: merged groups above the bound become sub-chunk containers,
    so compaction cannot materialize an unbounded array either.
    """
    bucket = F.date_trunc(TIER_TRUNC[to_tier], F.col("bucket_ts")).alias("bucket_ts")
    return (
        rollup_df.groupBy(*_SERIES_COLS, bucket)
        .agg(
            F.sum("cnt").alias("cnt"),
            F.sum("sum_v").alias("sum_v"),
            F.min("min_v").alias("min_v"),
            F.max("max_v").alias("max_v"),
            F.max_by("last_v", F.col("bucket_ts")).alias("last_v"),
            F.sort_array(
                F.collect_list(F.struct(F.col("bucket_ts"), F.col("chunk")))
            ).alias("_chunks"),
        )
        .withColumn("chunk", _merge_chunks_udf(max_points)(F.col("_chunks")))
        .withColumn("tier", F.lit(to_tier))
        .select("tier", *_SERIES_COLS, "bucket_ts", "cnt", "sum_v",
                "min_v", "max_v", "last_v", "chunk")
    )


# ---------------------------------------------------------------------------
# mergeable distinct-count sketches per tier (continuous-aggregate HLL)
# ---------------------------------------------------------------------------

def rollup_distinct_sketch(points: DataFrame, tier: str,
                           distinct_col: str = "conv_id",
                           lg_k: int = 12) -> DataFrame:
    """Per-(series, bucket) DISTINCT counts as MERGEABLE DataSketches
    HLL sketches — the continuous-aggregate feature exact counts can't
    give: count_distinct does NOT re-aggregate (distinct users per
    hour can't be summed into distinct users per day), but HLL
    sketches union losslessly, so a coarser tier derives from a finer
    one exactly like the additive aggregates in ``cascade``. Stored as
    a binary column next to the chunk; ~2^lg_k bytes per group,
    estimate error ~1.04/sqrt(2^lg_k) (~1.6% at lg_k=12).

    JVM-side end to end: hll_sketch_agg is a built-in partial+final
    hash aggregate — no Python in the path.
    """
    bucket = F.date_trunc(TIER_TRUNC[tier], F.col("ts")).alias("bucket_ts")
    return (
        points.groupBy(*_SERIES_COLS, bucket)
        .agg(F.hll_sketch_agg(distinct_col, F.lit(lg_k)).alias("distinct_sketch"),
             F.count("*").alias("cnt"))
        .withColumn("tier", F.lit(tier))
        .withColumn("n_distinct",
                    F.hll_sketch_estimate("distinct_sketch").cast("long"))
        .select("tier", *_SERIES_COLS, "bucket_ts", "cnt", "n_distinct",
                "distinct_sketch")
    )


def cascade_distinct_sketch(sketch_df: DataFrame, to_tier: str) -> DataFrame:
    """Re-aggregate a finer sketch tier into ``to_tier`` by HLL union —
    estimates match a direct computation from raw because sketch union
    is exact over the sketch state (same registers either way)."""
    bucket = F.date_trunc(TIER_TRUNC[to_tier],
                          F.col("bucket_ts")).alias("bucket_ts")
    return _union_sketches(sketch_df, bucket, F.lit(to_tier))


def distinct_sketch_over_step(sketch_df: DataFrame,
                              step_seconds: int) -> DataFrame:
    """Distinct counts over ARBITRARY step buckets from a stored
    sketch tier — the query_range analogue for the non-additive
    aggregate: a 2h dashboard step unions the 1h tier's sketches
    (epoch-aligned ``window()`` buckets, same origin as the tiers'
    date_trunc) instead of re-reading raw data. Exact over the sketch
    state, so the estimate equals what rolling up raw points at the
    step granularity would give. The step must be a multiple of the
    sketch tier's bucket width (the caller picks the tier —
    read_path.select_tier implements the coarsest-divisor rule)."""
    # epoch arithmetic, not window(): window's origin is 1970-01-01 in
    # the SESSION timezone, which shifts buckets under e.g. +05:30
    us = F.unix_micros(F.col("bucket_ts"))
    step_us = step_seconds * 1_000_000
    bucket = F.timestamp_micros(us - (us % F.lit(step_us))).alias("bucket_ts")
    return _union_sketches(sketch_df, bucket, F.lit(f"{step_seconds}s"))


def _union_sketches(sketch_df: DataFrame, bucket, tier_lit) -> DataFrame:
    return (
        sketch_df.groupBy(*_SERIES_COLS, bucket)
        .agg(F.hll_union_agg("distinct_sketch").alias("distinct_sketch"),
             F.sum("cnt").alias("cnt"))
        .withColumn("tier", tier_lit)
        .withColumn("n_distinct",
                    F.hll_sketch_estimate("distinct_sketch").cast("long"))
        .select("tier", *_SERIES_COLS, "bucket_ts", "cnt", "n_distinct",
                "distinct_sketch")
    )
