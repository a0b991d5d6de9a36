"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes the engine's operator surface over the driver's
test tables; ``oracle_sql()`` gives the DuckDB-equivalent ANSI SQL.
Determinism rules shared by both sides:

- every double SUM goes through DECIMAL(18,2) (exact, order-independent)
  and is cast back to double, so Spark's parallel partial aggregation
  and DuckDB's sequential scan agree bit-for-bit;
- every "last point" aggregate is keyed on the total order
  (ts, event_id) — max_by(struct) in Spark, ROW_NUMBER in DuckDB;
- every top-k has a total tie-break order;
- float formulas (cosine, interpolation) are written with identical
  operation order on both sides and rounded.
"""

from __future__ import annotations

import os
import pathlib
import sys
from collections.abc import Callable

# make mimir_spark importable regardless of the harness's cwd
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


from mimir_spark.session import ship_package as _ship_package  # noqa: E402

from mimir_spark import dedup, similarity
from mimir_spark.functions import text as TX
from mimir_spark.gapfill import gapfill
from mimir_spark.operators import terms as TERMS

DEC = "decimal(18,2)"
_ORD = lambda: F.struct(F.col("ts"), F.col("event_id"))  # noqa: E731

# committed deterministic transcript corpus — the driver-oracle input
# for the flagship pipeline entries (regenerated == committed is a test)
_TRANSCRIPT_FIXTURE = str(
    pathlib.Path(__file__).resolve().parent / "fixtures" / "transcripts_small.parquet"
)


def _events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _cached_store(kind: str, source_file: str,
                  params: str = "") -> "pathlib.Path":
    """Content-addressed .cache path for a materialized store (ANN
    buckets, token/term-doc indexes): keyed on the source file's path
    + mtime + size PLUS the store's build parameters (plane count,
    centroid config, ...), so the store is built ONCE per
    corpus-and-config and a parameter change can never silently reuse
    a store built with the old config. Callers skip the build when the
    parquet _SUCCESS marker exists. Stale siblings of the same kind
    (old corpus or old params) are pruned on access so .cache stays
    bounded as keys rotate — but ONLY completed siblings (those with
    a _SUCCESS marker) past a grace period: a concurrent gate/bench
    process keyed on different params may be mid-build (no _SUCCESS
    yet) or lazily reading a just-built store, and rmtree'ing it from
    under that process would fail its scan."""
    import hashlib as _h
    import shutil as _sh
    import time as _t

    st = os.stat(source_file)
    # srctag scopes pruning to THIS source file: stores for other
    # scales (sf0.01 gate vs sf0.1 bench) coexist; only rotated
    # mtime/size/params keys of the same source are reclaimed.
    srctag = _h.md5(source_file.encode()).hexdigest()[:6]
    key = _h.md5(f"{source_file}:{st.st_mtime_ns}:{st.st_size}:{params}"
                 .encode()).hexdigest()[:12]
    cache = pathlib.Path(__file__).resolve().parent / ".cache"
    current = cache / f"{kind}_{srctag}_{key}"
    grace_s = 3600.0  # any concurrent reader of a sibling is long done
    if cache.is_dir():
        for stale in cache.glob(f"{kind}_{srctag}_*"):
            if stale == current:
                continue
            marker = stale / "_SUCCESS"
            try:
                done_age = _t.time() - marker.stat().st_mtime
            except OSError:
                continue  # mid-build (or racing delete): never touch
            if done_age > grace_s:
                _sh.rmtree(stale, ignore_errors=True)
    return current


def _atomic_build(store, build) -> None:
    """Build a cache store exactly once even under CONCURRENT
    processes: each writer builds into a private tmp sibling and
    atomically renames it into place; the loser of a race discards
    its copy and reads the winner's. The previous check-then-write
    pattern let two processes that both saw no _SUCCESS (observed:
    the gate and a pytest oracle sweep running together) interleave
    mode("overwrite") output into ONE directory — two write-job
    UUIDs, duplicated rows."""
    import shutil as _sh

    if (store / "_SUCCESS").exists():
        return
    tmp = store.parent / f"{store.name}.build-{os.getpid()}"
    _sh.rmtree(tmp, ignore_errors=True)
    build(str(tmp))
    if store.exists() and not (store / "_SUCCESS").exists():
        # crash artifact from the pre-atomic era (a promoted store
        # always contains _SUCCESS: Spark writes it before the rename)
        _sh.rmtree(store, ignore_errors=True)
    try:
        tmp.rename(store)
    except OSError:  # a racer promoted a complete store first — use it
        _sh.rmtree(tmp, ignore_errors=True)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# ---------------------------------------------------------------------------
# time-series rollup surface (events as the series table)
# ---------------------------------------------------------------------------

def _rollup_events(spark, sf_dir, trunc: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy("event_type", F.date_trunc(trunc, "ts").alias("bucket_ts"))
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_v"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
            F.max_by("value", _ORD()).alias("last_v"),
        )
    )


def q_rollup_events_1m(spark, sf_dir):
    return _rollup_events(spark, sf_dir, "minute")


def q_rollup_events_1h_cascade(spark, sf_dir):
    """1h tier computed FROM the 1m tier (cascade); the oracle computes
    1h directly from raw — proving cascade == direct."""
    ev = _events(spark, sf_dir)
    m1 = (
        ev.groupBy("event_type", F.date_trunc("minute", "ts").alias("b1m"))
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("value").cast(DEC)).alias("sum_d"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
            F.max_by("value", _ORD()).alias("last_v"),
        )
    )
    return (
        m1.groupBy("event_type", F.date_trunc("hour", "b1m").alias("bucket_ts"))
        .agg(
            F.sum("cnt").alias("cnt"),
            F.sum("sum_d").cast("double").alias("sum_v"),
            F.min("min_v").alias("min_v"),
            F.max("max_v").alias("max_v"),
            F.max_by("last_v", F.col("b1m")).alias("last_v"),
        )
    )


_ROLLUP_ORACLE = """
WITH ranked AS (
  SELECT event_type, date_trunc('{trunc}', ts) AS bucket_ts, value,
         ROW_NUMBER() OVER (
           PARTITION BY event_type, date_trunc('{trunc}', ts)
           ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT event_type, bucket_ts,
       count(*) AS cnt,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v,
       min(value) AS min_v,
       max(value) AS max_v,
       max(CASE WHEN rn = 1 THEN value END) AS last_v
FROM ranked
GROUP BY event_type, bucket_ts
"""


def q_gapfill_locf_events_1h(spark, sf_dir):
    hourly = _rollup_events(spark, sf_dir, "hour").select(
        F.lit("events").alias("kind"),
        F.col("event_type").alias("series_key"),
        F.lit("sum_v").alias("metric"),
        "bucket_ts", "sum_v",
    )
    out = gapfill(hourly, "1h", "sum_v", "locf")
    return out.select(F.col("series_key").alias("event_type"),
                      "bucket_ts", "sum_v", "filled")


def q_gapfill_linear_events_1h(spark, sf_dir):
    hourly = _rollup_events(spark, sf_dir, "hour").select(
        F.lit("events").alias("kind"),
        F.col("event_type").alias("series_key"),
        F.lit("sum_v").alias("metric"),
        "bucket_ts", "sum_v",
    )
    out = gapfill(hourly, "1h", "sum_v", "linear")
    return out.select(F.col("series_key").alias("event_type"),
                      "bucket_ts", "sum_v", "filled")


_GAPFILL_GRID = """
hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
  FROM events GROUP BY 1, 2
),
grid AS (
  SELECT h.event_type, UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket_ts
  FROM (SELECT event_type, min(bucket_ts) AS lo, max(bucket_ts) AS hi
        FROM hourly GROUP BY 1) h
),
joined AS (
  SELECT g.event_type, g.bucket_ts, h.sum_v AS obs
  FROM grid g LEFT JOIN hourly h
    ON g.event_type = h.event_type AND g.bucket_ts = h.bucket_ts
)
"""

_GAPFILL_LOCF_ORACLE = f"""
WITH {_GAPFILL_GRID}
SELECT event_type, bucket_ts,
       last_value(obs IGNORE NULLS) OVER (
         PARTITION BY event_type ORDER BY bucket_ts
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sum_v,
       obs IS NULL AS filled
FROM joined
"""

_GAPFILL_LINEAR_ORACLE = f"""
WITH {_GAPFILL_GRID},
w AS (
  SELECT event_type, bucket_ts, obs,
     last_value(obs IGNORE NULLS) OVER prev AS pv,
     first_value(obs IGNORE NULLS) OVER nxt AS nv,
     last_value(CASE WHEN obs IS NOT NULL THEN CAST(epoch(bucket_ts) AS DOUBLE) END IGNORE NULLS) OVER prev AS pt,
     first_value(CASE WHEN obs IS NOT NULL THEN CAST(epoch(bucket_ts) AS DOUBLE) END IGNORE NULLS) OVER nxt AS nt
  FROM joined
  WINDOW
    prev AS (PARTITION BY event_type ORDER BY bucket_ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    nxt AS (PARTITION BY event_type ORDER BY bucket_ts
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_type, bucket_ts,
       CASE WHEN obs IS NOT NULL THEN obs
            WHEN pv IS NOT NULL AND nv IS NOT NULL
            THEN pv + (nv - pv) * (CAST(epoch(bucket_ts) AS DOUBLE) - pt) / (nt - pt)
       END AS sum_v,
       obs IS NULL AS filled
FROM w
"""


def q_asof_enrich(spark, sf_dir):
    """As-of join (the time-series workhorse Spark lacks natively):
    each event enriched with its user's latest completed hourly rollup
    value at or before the event — union + ignore-nulls window, ONE
    shuffle, no range join (operators/joins.py)."""
    from mimir_spark.operators.joins import asof_join

    ev = _events(spark, sf_dir)
    hourly = (
        ev.groupBy("user_id", F.date_trunc("hour", "ts").alias("ts"))
        .agg(F.sum(F.col("value").cast(DEC)).cast("double").alias("hsum"))
    )
    left = ev.select("event_id", "user_id", "ts")
    out = asof_join(left, hourly, on="ts", by="user_id",
                    value_cols=["hsum"])
    return out.select("event_id", "user_id", "hsum_asof")


_ASOF_ORACLE = """
WITH hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS hts,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS hsum
  FROM events GROUP BY 1, 2
)
SELECT e.event_id, e.user_id, h.hsum AS hsum_asof
FROM events e
ASOF LEFT JOIN hourly h
  ON e.user_id = h.user_id AND h.hts <= e.ts
"""


def q_sessionize_events(spark, sf_dir):
    """Sessionization: 30-min inactivity gap; per-user session count and
    longest session (events)."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # integer microsecond arithmetic on both engines — no float boundary
    # (cast NTZ->TZ is identity under the pinned UTC session timezone)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.lag(us, 1).over(w)
    sess = (
        ev.withColumn("new_sess",
                      F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0))
        .withColumn("sess_id", F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    per_sess = sess.groupBy("user_id", "sess_id").agg(F.count("*").alias("n"))
    return per_sess.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.max("n").alias("longest_session"),
    )


_SESSIONIZE_ORACLE = """
WITH g AS (
  SELECT user_id, ts, event_id,
    CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000
          OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         THEN 1 ELSE 0 END AS new_sess
  FROM events
), s AS (
  SELECT user_id,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
  FROM g
), per_sess AS (
  SELECT user_id, sess_id, count(*) AS n FROM s GROUP BY 1, 2
)
SELECT user_id, count(*) AS n_sessions, max(n) AS longest_session
FROM per_sess GROUP BY user_id
"""


def q_topk_users_by_value(spark, sf_dir):
    return (
        _events(spark, sf_dir)
        .groupBy("user_id")
        .agg(F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"))
        .orderBy(F.desc("total_value"), F.asc("user_id"))
        .limit(10)
    )


def q_seq_click_purchase(spark, sf_dir):
    """Sequence operator over the event stream: 'click' followed by
    'purchase' within the next 2 events of the same user."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt1 = F.lead("event_type", 1).over(w)
    nxt2 = F.lead("event_type", 2).over(w)
    hits = ev.withColumn(
        "hit",
        (F.col("event_type") == "click")
        & ((nxt1 == "purchase") | (nxt2 == "purchase")),
    )
    return (
        hits.groupBy("user_id")
        .agg(F.sum(F.col("hit").cast("long")).alias("n_pairs"))
        .filter(F.col("n_pairs") > 0)
    )


_SEQ_ORACLE = """
WITH w AS (
  SELECT user_id, event_type,
         lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS n1,
         lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS n2
  FROM events
)
SELECT user_id,
       CAST(sum(CASE WHEN event_type = 'click' AND (n1 = 'purchase' OR n2 = 'purchase')
                THEN 1 ELSE 0 END) AS BIGINT) AS n_pairs
FROM w GROUP BY user_id HAVING n_pairs > 0
"""


def _events_as_turns(spark, sf_dir):
    """Events stream viewed as ordered turn streams (conversation =
    user, turn = event) so the Mimir query language runs over it."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        F.col("user_id").cast("string").alias("conv_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        F.col("event_type").alias("role"),
        F.col("event_type").alias("text"),
        F.lit(None).cast("string").alias("tool"),
        "ts",
    )


def q_parsed_seq_query(spark, sf_dir):
    """Query-STRING entry point (the reference's primary API): parse
    'view purchase' -> SequenceQuery -> hits over the event stream."""
    from mimir_spark.query_parser import run_query

    return run_query("view purchase", _events_as_turns(spark, sf_dir))


_PARSED_SEQ_ORACLE = """
WITH t AS (
  SELECT CAST(user_id AS VARCHAR) AS conv_id,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
           AS pos,
         event_type
  FROM events
)
SELECT DISTINCT a.conv_id, CAST(a.pos AS INT) AS pos, CAST(2 AS INT) AS len
FROM t a JOIN t b ON a.conv_id = b.conv_id AND b.pos = a.pos + 1
WHERE a.event_type = 'view' AND b.event_type = 'purchase'
"""


def q_repeats_query(spark, sf_dir):
    """RepeatsQuery +2..3 over the event stream: runs of 2..3
    CONSECUTIVE 'click' events (each starting where the previous
    ends)."""
    from mimir_spark.operators.hits import repeats_query, term_query

    turns = _events_as_turns(spark, sf_dir)
    return repeats_query(term_query(turns, "role", "click"), 2, 3)


_REPEATS_ORACLE = """
WITH t AS (
  SELECT CAST(user_id AS VARCHAR) AS conv_id,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
           AS pos,
         event_type
  FROM events
),
c AS (SELECT conv_id, pos FROM t WHERE event_type = 'click'),
runs2 AS (
  SELECT a.conv_id, a.pos, 2 AS len
  FROM c a JOIN c b ON a.conv_id = b.conv_id AND b.pos = a.pos + 1
),
runs3 AS (
  SELECT a.conv_id, a.pos, 3 AS len
  FROM c a JOIN c b ON a.conv_id = b.conv_id AND b.pos = a.pos + 1
           JOIN c d ON a.conv_id = d.conv_id AND d.pos = a.pos + 2
)
SELECT DISTINCT conv_id, CAST(pos AS INT) AS pos, CAST(len AS INT) AS len
FROM (SELECT * FROM runs2 UNION ALL SELECT * FROM runs3)
"""


def q_within_query(spark, sf_dir):
    """WithinQuery (IN): purchase hits contained in the document span
    of high-activity users ({Document n_turns >= 50})."""
    from mimir_spark.operators.hits import (document_query, term_query,
                                            within_query)

    turns = _events_as_turns(spark, sf_dir)
    inner = term_query(turns, "role", "purchase")
    outer = document_query(turns, F.col("n_turns") >= 50)
    return within_query(inner, outer)


_WITHIN_ORACLE = """
WITH t AS (
  SELECT CAST(user_id AS VARCHAR) AS conv_id,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
           AS pos,
         event_type,
         count(*) OVER (PARTITION BY user_id) AS n_turns
  FROM events
)
SELECT conv_id, CAST(pos AS INT) AS pos, CAST(1 AS INT) AS len
FROM t WHERE event_type = 'purchase' AND n_turns >= 50
"""


def q_contains_query(spark, sf_dir):
    """ContainsQuery (OVER): document spans of high-activity users that
    contain at least one purchase."""
    from mimir_spark.operators.hits import (contains_query, document_query,
                                            term_query)

    turns = _events_as_turns(spark, sf_dir)
    outer = document_query(turns, F.col("n_turns") >= 50)
    inner = term_query(turns, "role", "purchase")
    return contains_query(outer, inner)


_CONTAINS_ORACLE = """
WITH s AS (
  SELECT CAST(user_id AS VARCHAR) AS conv_id, count(*) AS n_turns,
         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n_buy
  FROM events GROUP BY user_id
)
SELECT conv_id, CAST(0 AS INT) AS pos, CAST(n_turns AS INT) AS len
FROM s WHERE n_turns >= 50 AND n_buy > 0
"""


def q_rollup_events_1h_salted(spark, sf_dir):
    """The explicit two-stage SKEW-SALTED aggregation plan (partial per
    (series, bucket, salt), final per (series, bucket)) — must equal
    the plain 1h rollup exactly."""
    from mimir_spark.rollup import rollup_aggs

    ev = _events(spark, sf_dir)
    # decimal v keeps the two-stage double sum order-independent;
    # constant conv_id makes the last_v order key (ts, '', event_id)
    # match the oracle's (ts, event_id)
    points = ev.select(
        F.lit("e").alias("kind"),
        F.col("event_type").alias("series_key"),
        F.lit("v").alias("metric"),
        "ts",
        F.lit("").alias("conv_id"),
        F.col("event_id").alias("turn_idx"),
        F.col("value").cast(DEC).alias("v"),
    )
    out = rollup_aggs(points, "1h", salt_buckets=8)
    return out.select(
        F.col("series_key").alias("event_type"), "bucket_ts",
        "cnt",
        F.col("sum_v").cast("double").alias("sum_v"),
        F.col("min_v").cast("double").alias("min_v"),
        F.col("max_v").cast("double").alias("max_v"),
        F.col("last_v").cast("double").alias("last_v"),
    )


def q_users_view_no_purchase(spark, sf_dir):
    """MinusQuery analogue: doc-set difference via anti-join."""
    ev = _events(spark, sf_dir)
    viewers = ev.filter(F.col("event_type") == "view").select("user_id").distinct()
    buyers = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    return viewers.join(buyers, "user_id", "left_anti")


def q_rollup_events_1d(spark, sf_dir):
    return _rollup_events(spark, sf_dir, "day")


def q_running_total_by_user(spark, sf_dir):
    """Window running sum (decimal-exact cumulative aggregate)."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id") \
        .rowsBetween(Window.unboundedPreceding, 0)
    return ev.select(
        "event_id", "user_id",
        F.sum(F.col("value").cast(DEC)).over(w).cast("double").alias("running_total"),
    )


def q_distinct_users_per_type(spark, sf_dir):
    return (
        _events(spark, sf_dir)
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n_users"),
             F.count("*").alias("n_events"))
    )


def q_part_type_facet(spark, sf_dir):
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    return (
        part.groupBy("p_type")
        .agg(F.count("*").alias("n_parts"),
             F.sum(F.col("p_retailprice").cast(DEC)).cast("double").alias("sum_price"),
             F.min("p_size").alias("min_size"),
             F.max("p_size").alias("max_size"))
    )


# ---------------------------------------------------------------------------
# relational coverage (lineitem/orders/customer/part)
# ---------------------------------------------------------------------------

def q_measurement_filter(spark, sf_dir):
    """Measurement-spec rewrite through the driver gate, MULTI-UNIT:
    each part contributes a length measurement (p_size cm) and an area
    measurement (p_size sq ft, normalized to m^2); the filter is the
    disjunction of a '5 to 20 cm' length spec and a '1 to 2 square
    feet' area spec — the dimension signatures keep the two branches
    from cross-matching, and the compound/power grammar
    (functions/measurement.parse_unit) is exercised end to end."""
    from mimir_spark.functions.measurement import parse_unit, spec_predicate

    _, sqft = parse_unit("sq ft")
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    length = part.select(
        "p_partkey", F.lit("len").alias("dim"),
        F.lit("m").alias("normalized_unit"),
        (F.col("p_size") * 0.01).alias("normalized_min"),
        (F.col("p_size") * 0.01).alias("normalized_max"),
    )
    area = part.select(
        "p_partkey", F.lit("area").alias("dim"),
        F.lit("m^2").alias("normalized_unit"),
        (F.col("p_size") * F.lit(sqft)).alias("normalized_min"),
        (F.col("p_size") * F.lit(sqft)).alias("normalized_max"),
    )
    meas = length.unionByName(area)
    pred = spec_predicate("5 to 20 cm") | spec_predicate("1 to 2 square feet")
    return meas.filter(pred).select("p_partkey", "dim")


def _measurement_oracle() -> str:
    from mimir_spark.functions.measurement import parse_spec, parse_unit

    base, lo, hi = parse_spec("5 to 20 cm")
    assert base == "m"
    abase, alo, ahi = parse_spec("1 to 2 square feet")
    assert abase == "m^2"
    (_, sqft) = parse_unit("sq ft")
    return f"""
SELECT p_partkey, 'len' AS dim FROM part
WHERE p_size * 0.01 <= {hi!r} AND p_size * 0.01 >= {lo!r}
UNION ALL
SELECT p_partkey, 'area' AS dim FROM part
WHERE p_size * {sqft!r} <= {ahi!r} AND p_size * {sqft!r} >= {alo!r}
"""


def q_q1_pricing_summary(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    disc = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC)
    )
    charge = disc * (F.lit(1).cast(DEC) + F.col("l_tax").cast(DEC))
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast(DEC)).cast("double").alias("sum_base_price"),
            F.sum(disc).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            F.count("*").alias("count_order"),
        )
    )


_Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
    AS sum_disc_price,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
           * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE)
    AS sum_charge,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_revenue_by_segment(spark, sf_dir):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("revenue"),
            F.count("*").alias("n_orders"),
        )
    )


def q_top_brands_by_revenue(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    rev = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC)
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("p_brand"))
        .limit(5)
    )


def q_customers_without_orders(spark, sf_dir):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti") \
        .select("c_custkey")


# ---------------------------------------------------------------------------
# terms-query surface over documents (Mimir facet algebra)
# ---------------------------------------------------------------------------

_SQL_TOKENIZE = (
    "unnest(string_split_regex(trim(lower(text)), '[ \\t\\n\\r]+')) AS term"
)


def q_terms_topk_documents(spark, sf_dir):
    toks = TERMS.tokenize(_docs(spark, sf_dir), id_col="doc_id")
    return TERMS.top_k_terms(toks, 20)


def q_terms_topk_indexed(spark, sf_dir):
    """The SAME top-k facet as terms_topk_documents, served from the
    materialized DIRECT index (sources/token_index.write_term_doc_index
    — the term<->doc transpose with per-doc tf the reference stores,
    AtomicIndex.java:1089-1271): count = sum(tf) over the
    vocabulary-sized transpose instead of tokenizing the corpus. Same
    oracle as the scan-based entry — the two paths must agree exactly."""
    from mimir_spark.sources import token_index as TI

    store = _cached_store("termdoc", f"{sf_dir}/documents.parquet")
    _atomic_build(store,
                  lambda p: TI.write_term_doc_index(_docs(spark, sf_dir), p))
    counts = TI.term_counts_indexed(spark, str(store))
    return TERMS.limit_terms(TERMS.sorted_terms(counts), 20)


def _sw_list() -> str:
    # single quotes doubled for SQL ('s and ' are in the reference list)
    return ", ".join("'" + w.replace("'", "''") + "'"
                     for w in TERMS.DEFAULT_STOPWORDS)


_TERMS_TOPK_ORACLE = f"""
WITH toks AS (
  SELECT {_SQL_TOKENIZE}
  FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0
)
SELECT term, count(*) AS count
FROM toks
WHERE length(term) > 0 AND term NOT IN ({_sw_list()})
GROUP BY term
ORDER BY count DESC, term ASC
LIMIT 20
"""


def q_documents_and_terms(spark, sf_dir):
    toks = TERMS.tokenize(_docs(spark, sf_dir), id_col="doc_id")
    return TERMS.documents_and_terms(toks, [0, 1, 2, 3, 4])


_AND_TERMS_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {_SQL_TOKENIZE}
  FROM documents
  WHERE text IS NOT NULL AND length(trim(text)) > 0 AND doc_id IN (0,1,2,3,4)
)
SELECT term, count(*) AS count
FROM toks WHERE length(term) > 0
GROUP BY term
HAVING count(DISTINCT doc_id) = 5
"""


def q_annotation_terms(spark, sf_dir):
    """AnnotationTermsQuery over the transcript fixture: tool mentions
    (with counts and lengths) in turns satisfying a typed constraint."""
    t = spark.read.parquet(_TRANSCRIPT_FIXTURE)
    return TERMS.annotation_terms(t, [("turn_idx", "GE", 3)], term_col="tool")


_ANNOTATION_TERMS_ORACLE = f"""
SELECT tool AS term, count(*) AS count, CAST(1 AS INT) AS length
FROM read_parquet('{{fixture}}')
WHERE tool IS NOT NULL AND turn_idx >= 3
GROUP BY tool
""".replace("{fixture}", _TRANSCRIPT_FIXTURE)


def q_or_terms_first(spark, sf_dir):
    """OrTermsQuery with the FIRST count strategy: input order decides
    which set's count wins for terms present in both."""
    toks = TERMS.tokenize(_docs(spark, sf_dir), id_col="doc_id")
    s0 = TERMS.documents_or_terms(toks, [0, 1, 2])
    s1 = TERMS.documents_or_terms(toks, [2, 3, 4, 5])
    return TERMS.or_terms([s0, s1], "FIRST")


_OR_TERMS_FIRST_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {_SQL_TOKENIZE}
  FROM documents
  WHERE text IS NOT NULL AND length(trim(text)) > 0
),
s0 AS (SELECT term, count(*) AS c FROM toks
       WHERE length(term) > 0 AND doc_id IN (0,1,2) GROUP BY term),
s1 AS (SELECT term, count(*) AS c FROM toks
       WHERE length(term) > 0 AND doc_id IN (2,3,4,5) GROUP BY term)
SELECT coalesce(s0.term, s1.term) AS term,
       coalesce(s0.c, s1.c) AS count
FROM s0 FULL JOIN s1 ON s0.term = s1.term
"""


def q_and_terms_intersection(spark, sf_dir):
    """AndTermsQuery + ConstTermsQuery closure
    (AndTermsQuery.java:55-110, ConstTermsQuery.java:27,53): the
    intersection of (a) the terms of docs 0..9 and (b) the stop-word-
    filtered full dictionary, counts via the reference's FIRST strategy
    (= set (a)'s counts, input order significant); then a literal
    const terms set is spliced in through or_terms SUM, so terms in
    both get count + sentinel and pure sentinels appear verbatim."""
    toks = TERMS.tokenize(_docs(spark, sf_dir), id_col="doc_id")
    s0 = TERMS.documents_or_terms(toks, list(range(10)))
    s1 = TERMS.term_type_terms(toks)
    anded = TERMS.and_terms([s0, s1], "FIRST")
    cst = TERMS.const_terms(
        spark, [("zzconst_only", 7), ("zzconst_two", 3)])
    return TERMS.or_terms([anded, cst], "SUM")


_AND_TERMS_INTERSECTION_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {_SQL_TOKENIZE}
  FROM documents
  WHERE text IS NOT NULL AND length(trim(text)) > 0
),
s0 AS (SELECT term, count(*) AS c FROM toks
       WHERE length(term) > 0 AND doc_id IN (0,1,2,3,4,5,6,7,8,9)
       GROUP BY term),
s1 AS (SELECT term, count(*) AS c FROM toks
       WHERE length(term) > 0 AND term NOT IN ({_sw_list()})
       GROUP BY term),
anded AS (SELECT s0.term, s0.c FROM s0 JOIN s1 USING (term)),
cst AS (SELECT * FROM (VALUES ('zzconst_only', 7), ('zzconst_two', 3))
        AS t(term, c))
SELECT term, CAST(sum(c) AS BIGINT) AS count
FROM (SELECT * FROM anded UNION ALL SELECT * FROM cst)
GROUP BY term
"""


def q_terms_by_description(spark, sf_dir):
    """Group-by-description terms merge (TermsResultSet.java:60-69):
    terms sharing a description combine, counts summed. Description
    here = term-length class (a deterministic describer)."""
    toks = TERMS.tokenize(_docs(spark, sf_dir), id_col="doc_id")
    terms = TERMS.term_type_terms(toks).withColumn(
        "description",
        F.concat(F.lit("len_"), F.length("term").cast("string")))
    return TERMS.group_by_description(terms) \
        .select("description", "count", "n_terms")


_TERMS_BY_DESC_ORACLE = f"""
WITH toks AS (
  SELECT {_SQL_TOKENIZE}
  FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0
),
terms AS (
  SELECT term, count(*) AS c FROM toks
  WHERE length(term) > 0 AND term NOT IN ({_sw_list()})
  GROUP BY term
)
SELECT 'len_' || CAST(length(term) AS VARCHAR) AS description,
       CAST(sum(c) AS BIGINT) AS count,
       count(DISTINCT term) AS n_terms
FROM terms GROUP BY 1
"""


def q_bm25_scores(spark, sf_dir):
    """BM25 document scores for one query term (the reference's
    BM25Scorer catalog slot)."""
    from mimir_spark.functions.scoring import bm25_scores

    toks = TERMS.tokenize(_docs(spark, sf_dir), id_col="doc_id")
    return bm25_scores(toks, "filter")


# identical operation ORDER to the Column expression (float parity):
# idf * tf * (k1+1) / denom, with denom = tf + k1*((1-b) + b*dl/avgdl)
_BM25_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {_SQL_TOKENIZE}
  FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0
),
dl AS (
  SELECT doc_id, count(*) AS dl,
         sum(CASE WHEN term = 'filter' THEN 1 ELSE 0 END) AS tf
  FROM (SELECT doc_id, term FROM toks WHERE length(term) > 0)
  GROUP BY doc_id
),
stats AS (
  SELECT count(*) AS n,
         sum(CASE WHEN tf > 0 THEN 1 ELSE 0 END) AS df,
         avg(dl) AS avgdl
  FROM dl
)
SELECT d.doc_id,
  round(
    ln(1.0 + (n - df + 0.5) / (df + 0.5))
      * CAST(tf AS DOUBLE) * (1.2 + 1.0)
      / (CAST(tf AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * d.dl / avgdl)),
    6) AS score
FROM dl d, stats
WHERE tf > 0 AND df > 0
"""


# ---------------------------------------------------------------------------
# training-data pipeline ops over documents/embeddings
# ---------------------------------------------------------------------------

def q_cube_returnflag_status(spark, sf_dir):
    """CUBE grouping over lineitem (engine addition beyond the
    reference, which has no grouping sets — SURVEY.md §2.4 note)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"),
             F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("sum_qty"))
    )


def q_documents_or_terms(spark, sf_dir):
    toks = TERMS.tokenize(_docs(spark, sf_dir), id_col="doc_id")
    return TERMS.documents_or_terms(toks, [0, 1, 2, 3, 4])


_OR_TERMS_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {_SQL_TOKENIZE}
  FROM documents
  WHERE text IS NOT NULL AND length(trim(text)) > 0 AND doc_id IN (0,1,2,3,4)
)
SELECT term, count(*) AS count
FROM toks WHERE length(term) > 0
GROUP BY term
"""


def q_lang_id_counts(spark, sf_dir):
    return (
        _docs(spark, sf_dir)
        .select(TX.lang_id().alias("pred_lang"))
        .groupBy("pred_lang").agg(F.count("*").alias("n_docs"))
    )


def _lang_score_sql(lang: str) -> str:
    markers = ", ".join(f"'{w}'" for w in TX.LANG_MARKERS[lang])
    return (
        "len(list_filter(string_split_regex(trim(lower(coalesce(text,''))), "
        f"'[ \\t\\n\\r]+'), x -> list_contains([{markers}], x)))"
    )


_LANG_ORACLE = f"""
WITH scored AS (
  SELECT {_lang_score_sql('en')} AS s_en, {_lang_score_sql('de')} AS s_de,
         {_lang_score_sql('fr')} AS s_fr, {_lang_score_sql('es')} AS s_es
  FROM documents
), pred AS (
  SELECT CASE
    WHEN s_en >= greatest(s_de, s_fr, s_es, 1) THEN 'en'
    WHEN s_de >= greatest(s_fr, s_es, 1) THEN 'de'
    WHEN s_fr >= greatest(s_es, 1) THEN 'fr'
    WHEN s_es >= 1 THEN 'es'
    ELSE 'und' END AS pred_lang
  FROM scored
)
SELECT pred_lang, count(*) AS n_docs FROM pred GROUP BY pred_lang
"""


def q_token_stats(spark, sf_dir):
    return _docs(spark, sf_dir).select(
        "doc_id",
        TX.token_count().alias("n_tokens"),
        F.length(F.col("text")).alias("n_chars_text"),
    )


_TOKEN_STATS_ORACLE = """
SELECT doc_id,
  CASE WHEN text IS NULL OR length(trim(text)) = 0 THEN 0
       ELSE len(string_split_regex(trim(text), '[ \\t\\n\\r]+')) END AS n_tokens,
  length(text) AS n_chars_text
FROM documents
"""


def q_quality_scores(spark, sf_dir):
    return _docs(spark, sf_dir).select(
        "doc_id", TX.quality_score().alias("quality"))


_QUALITY_ORACLE = f"""
WITH base AS (
  SELECT doc_id, text,
    CASE WHEN text IS NULL OR length(trim(text)) = 0 THEN 0
         ELSE len(string_split_regex(trim(text), '[ \\t\\n\\r]+')) END AS n_tok,
    {_lang_score_sql('en')} AS stop_hits,
    length(lower(text)) AS n_chars,
    length(regexp_replace(lower(text), '[^a-z ]', '', 'g')) AS kept
  FROM documents
)
SELECT doc_id,
  round(
    0.4 * least(CAST(length(text) AS DOUBLE) / 500.0, 1.0)
    + 0.4 * least((CASE WHEN n_tok = 0 THEN 0.0
                        ELSE CAST(stop_hits AS DOUBLE) / n_tok END) * 3.33, 1.0)
    + 0.2 * (CASE WHEN n_chars = 0 THEN 0.0
                  ELSE CAST(kept AS DOUBLE) / n_chars END), 6) AS quality
FROM base
"""


def q_dedup_exact_docs(spark, sf_dir):
    return dedup.exact_dedup(_docs(spark, sf_dir))


_DEDUP_EXACT_ORACLE = """
WITH fp AS (
  SELECT doc_id,
         md5(regexp_replace(trim(lower(text)), '[ \\t\\n\\r]+', ' ', 'g')) AS f
  FROM documents
)
SELECT min(doc_id) AS doc_id, count(*) AS dup_count
FROM fp GROUP BY f
"""


_MAX_DF = 200  # hot-shingle document-frequency cap (both engines)


def q_jaccard_dup_pairs(spark, sf_dir):
    dedup.release_shingle_caches()  # bound persisted shingle streams
    return dedup.jaccard_pairs(_docs(spark, sf_dir), tau=0.4, max_df=_MAX_DF)


_SQL_SHINGLES = f"""
shingled_raw AS (
  SELECT doc_id, UNNEST(list_distinct(sh)) AS shingle
  FROM (
    SELECT doc_id,
      list_transform(
        range(1, greatest(len(toks) - 2, 0) + 1),
        i -> array_to_string(list_slice(toks, i, i + 2), ' ')
      ) AS sh
    FROM (
      SELECT doc_id,
             string_split_regex(trim(lower(coalesce(text, ''))), '[ \\t\\n\\r]+') AS toks
      FROM documents WHERE length(trim(coalesce(text, ''))) > 0
    )
  )
),
shingled AS (
  SELECT s.doc_id, s.shingle
  FROM shingled_raw s
  JOIN (SELECT shingle FROM shingled_raw GROUP BY shingle
        HAVING count(*) <= {_MAX_DF}) keep USING (shingle)
)
"""

_JACCARD_ORACLE = f"""
WITH {_SQL_SHINGLES},
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shingled GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
  FROM shingled a JOIN shingled b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(CAST(common AS DOUBLE) / (sa.n_sh + sb.n_sh - common), 6) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE round(CAST(common AS DOUBLE) / (sa.n_sh + sb.n_sh - common), 6) >= 0.4
"""


def q_minhash_lsh_pairs(spark, sf_dir):
    dedup.release_shingle_caches()  # bound persisted shingle streams
    return dedup.minhash_lsh_pairs(_docs(spark, sf_dir), max_df=_MAX_DF)


def _minhash_oracle() -> str:
    """Replays the affine-permutation signature exactly: one 60-bit
    md5-derived base per shingle, split into 30-bit halves, then the
    SAME (a, b, c) literals as dedup.minhash_coeffs — all int64-exact
    in both engines (products < 2^61)."""
    p = dedup.MINHASH_P
    mins = ",\n    ".join(
        f"min((x_hi * {a} + x_lo * {b} + {c}) % {p}) AS h{i}"
        for i, (a, b, c) in enumerate(dedup.minhash_coeffs(16))
    )
    bands = []
    for b in range(4):
        cols = " || '|' || ".join(
            f"h{b * 4 + r}::VARCHAR" for r in range(4))
        bands.append(f"SELECT doc_id, {b} AS band, md5({cols}) AS bkey FROM sig")
    band_sql = "\nUNION ALL\n".join(bands)
    return f"""
WITH {_SQL_SHINGLES},
based AS (
  SELECT doc_id,
         ('0x' || substr(md5(shingle), 1, 15))::BIGINT >> 30 AS x_hi,
         ('0x' || substr(md5(shingle), 1, 15))::BIGINT & 1073741823 AS x_lo
  FROM shingled
),
sig AS (
  SELECT doc_id, {mins}
  FROM based GROUP BY doc_id
),
bands AS ({band_sql})
SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
FROM bands x JOIN bands y
  ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id
"""


def q_ann_topk_cosine(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    # k=11: the query vector itself is always rank 1 (cosine 1.0)
    return similarity.brute_force_topk(emb, [float(x) for x in qvec], 11) \
        .filter(F.col("vec_id") != 0)


_ANN_ORACLE = """
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT e.vec_id,
    round(
      list_dot_product(e.embedding::DOUBLE[], q.qv)
      / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
         * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cosine
  FROM embeddings e, q
)
SELECT vec_id, cosine FROM scored
ORDER BY cosine DESC, vec_id ASC
LIMIT 10 OFFSET 1
"""


def q_cosine_dup_pairs(spark, sf_dir):
    return dedup.cosine_dup_pairs(_emb(spark, sf_dir), tau=0.5)


def q_cosine_dup_pairs_lsh(spark, sf_dir):
    """Scale-path cosine near-dup: LSH-band candidates + exact verify
    (no O(n^2) join anywhere in the plan). dim=64 is the testdata
    embedding width (the oracle bakes the same 16x64 plane matrix)."""
    return dedup.cosine_dup_pairs_lsh(_emb(spark, sf_dir), tau=0.5, dim=64)


def _cosine_lsh_oracle() -> str:
    """DuckDB replay of the banded-LSH cosine pipeline: the seeded
    16-plane matrix as SQL literals, 4x4-bit signature bands, band
    equi-join candidates, exact cosine verify on the rounded value."""
    import numpy as np

    planes = np.random.default_rng(42).standard_normal((16, 64))
    cols = ", ".join(
        "[" + ", ".join(repr(float(x)) for x in p) + "]::DOUBLE[] AS p" + str(i)
        for i, p in enumerate(planes))
    bucket = "\n      + ".join(
        f"(CASE WHEN list_dot_product(e.v, p.p{i}) > 0 "
        f"THEN {1 << i} ELSE 0 END)"
        for i in range(len(planes)))
    band_rows = "\n  UNION ALL\n  ".join(
        f"SELECT vec_id, {i} AS band, (bucket >> {i * 4}) & 15 AS bkey FROM sig"
        for i in range(4))
    return f"""
WITH planes AS (SELECT {cols}),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
sig AS (
  SELECT e.vec_id, e.v,
    {bucket} AS bucket
  FROM e CROSS JOIN planes p
),
bands AS (
  {band_rows}
),
cand AS (
  SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
  FROM bands x JOIN bands y
    ON x.band = y.band AND x.bkey = y.bkey AND x.vec_id < y.vec_id
),
scored AS (
  SELECT c.id_a, c.id_b,
    round(list_dot_product(a.v, b.v)
          / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))),
          6) AS cosine
  FROM cand c
  JOIN sig a ON a.vec_id = c.id_a
  JOIN sig b ON b.vec_id = c.id_b
)
SELECT id_a, id_b, cosine FROM scored WHERE cosine >= 0.5
"""


_COSINE_DUP_ORACLE = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
  round(
    list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
    / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
       * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6
  ) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
      / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
         * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) >= 0.5
"""


# ---------------------------------------------------------------------------
# rows-only entries (non-SQL-expressible: hashes/approximate/binary UDFs)
# ---------------------------------------------------------------------------

def q_simhash_pairs(spark, sf_dir):
    # max_hamming=4 with five 12-bit bands: pigeonhole-exact recall
    return dedup.simhash_pairs(_docs(spark, sf_dir), max_hamming=4)


def _simhash_oracle() -> str:
    """DuckDB replay of the full 60-bit SimHash pipeline: md5-derived
    token hash -> bitwise majority vote -> 5x12-bit band join ->
    hamming verify."""
    nb = dedup.SIMHASH_BITS
    votes = ",\n    ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(nb))
    sim = "\n      + ".join(
        f"(CASE WHEN v{b} > 0 THEN (1::BIGINT << {b}) ELSE 0::BIGINT END)"
        for b in range(nb))
    band_rows = "\n  UNION ALL\n  ".join(
        f"SELECT doc_id, simhash, {i} AS band, "
        f"(simhash >> {i * 12}) & 4095 AS bkey FROM sim"
        for i in range(nb // 12))
    return f"""
WITH tok AS (
  SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h
  FROM (
    SELECT doc_id,
           unnest(string_split_regex(trim(lower(text)), '[ \\t\\n\\r]+')) AS tok
    FROM documents
  )
),
votes AS (
  SELECT doc_id, {votes}
  FROM tok GROUP BY doc_id
),
sim AS (
  SELECT doc_id, {sim} AS simhash
  FROM votes
),
bands AS (
  {band_rows}
),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
         x.simhash AS sa, y.simhash AS sb
  FROM bands x JOIN bands y
    ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id
)
SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(sa, sb)) <= 4
"""


def q_lsh_ann_topk(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    return similarity.lsh_topk(emb, [float(x) for x in qvec], 10,
                               n_planes=8, probe_hamming=3)


def q_lsh_ann_topk_bucketed(spark, sf_dir):
    """The SCALE path of lsh_ann_topk through the same oracle: the
    embeddings are materialized partitioned by LSH bucket
    (similarity.write_embeddings_bucketed), and probing becomes an
    IN-list on the partition column — partition pruning at the scan
    (PartitionFilters plan evidence asserted in
    tests/test_pipeline_ops.py::test_lsh_bucketed_store_prunes_partitions).
    Same seeded planes and probe radius as the in-memory variant, so
    the result set is identical and _lsh_ann_oracle replays it."""
    store = _cached_store("emb_bucketed", f"{sf_dir}/embeddings.parquet",
                          params="n_planes=8")
    emb = _emb(spark, sf_dir)
    qvec = [float(x)
            for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    _atomic_build(store, lambda p: similarity.write_embeddings_bucketed(
        emb, p, n_planes=8, dim=len(qvec)))
    return similarity.lsh_topk_bucketed(spark, str(store), qvec, 10,
                                        n_planes=8, probe_hamming=3)


def _lsh_ann_oracle() -> str:
    """DuckDB replay of multi-probe hyperplane LSH: the seeded plane
    matrix is folded into the SQL as literal DOUBLE arrays (same floats
    Spark folds into its plan), buckets via sign of sequential dot
    products, probe filter via popcount, cosine re-ranking."""
    import numpy as np

    planes = np.random.default_rng(42).standard_normal((8, 64))
    cols = ", ".join(
        "[" + ", ".join(repr(float(x)) for x in p) + "]::DOUBLE[] AS p" + str(i)
        for i, p in enumerate(planes))
    bucket = "\n      + ".join(
        f"(CASE WHEN list_dot_product(e.v, p.p{i}) > 0 "
        f"THEN {1 << i} ELSE 0 END)"
        for i in range(len(planes)))
    return f"""
WITH planes AS (SELECT {cols}),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
sig AS (
  SELECT e.vec_id, e.v,
    {bucket} AS bucket
  FROM e CROSS JOIN planes p
),
q AS (SELECT v AS qv, bucket AS qsig FROM sig WHERE vec_id = 0)
SELECT s.vec_id,
  round(list_dot_product(s.v, q.qv)
        / (sqrt(list_dot_product(s.v, s.v)) * sqrt(list_dot_product(q.qv, q.qv))),
        6) AS cosine
FROM sig s, q
WHERE bit_count(xor(s.bucket::BIGINT, q.qsig::BIGINT)) <= 3
ORDER BY cosine DESC, s.vec_id ASC
LIMIT 10
"""


_IVF_SAMPLE = 256
_IVF_CENTROIDS = 16
_IVF_NPROBE = 4


def _ivf_sample_and_query(path: str, spark=None):
    """Deterministic training sample (ORDER BY vec_id LIMIT m) + the
    query vector (vec_id 0), read driver-side. At 100 TB this is the
    same `ORDER BY id LIMIT m` collect — a few thousand rows to the
    driver, never the table. With a SparkSession the read goes through
    spark.read.parquet (works against object stores — posix paths are
    only a sandbox convenience); the DuckDB path remains for the
    oracle builder, which has no session. tests pin the two paths to
    identical samples (hence identical centroids)."""
    import numpy as np

    if spark is not None:
        rows = (spark.read.parquet(path)
                .orderBy("vec_id").limit(_IVF_SAMPLE)
                .select("embedding").collect())
        sample = np.asarray([r[0] for r in rows], dtype=np.float64)
    else:
        import duckdb as _duck

        con = _duck.connect()
        rows = con.sql(
            f"SELECT embedding FROM read_parquet('{path}') "
            f"ORDER BY vec_id LIMIT {_IVF_SAMPLE}").fetchall()
        con.close()
        sample = np.asarray([r[0] for r in rows], dtype=np.float64)
    return sample, [float(x) for x in sample[0]]


def q_ivf_ann_topk(spark, sf_dir):
    """IVF ANN — the data-dependent coarse quantizer alongside the
    data-independent LSH store: deterministic Lloyd k-means
    (similarity.ivf_train) on an ORDER-BY-id sample, embeddings
    materialized partitioned by cell id, probe = the nprobe nearest
    cells as an IN-list on the partition column (pruned scan), exact
    cosine rerank. The oracle reruns the identical pure-numpy
    training and replays assignment + probe + rerank in SQL."""
    sample, qvec = _ivf_sample_and_query(f"{sf_dir}/embeddings.parquet",
                                         spark=spark)
    cent = similarity.ivf_train(sample, _IVF_CENTROIDS)
    store = _cached_store("emb_ivf", f"{sf_dir}/embeddings.parquet",
                          params=f"k={_IVF_CENTROIDS},m={_IVF_SAMPLE}")
    _atomic_build(store, lambda p: similarity.write_embeddings_ivf(
        _emb(spark, sf_dir), p, cent))
    return similarity.ivf_topk_bucketed(spark, str(store), qvec, 10, cent,
                                        nprobe=_IVF_NPROBE)


#: Corpus the IVF oracle trains on. The driver's correctness gate runs
#: at sf0.01 (tests/test_entry.py pins the same); override via the env
#: var to verify the entry at another scale (tests/test_entry.py's
#: sf0.1 twin does exactly that).
_IVF_ORACLE_SF_DIR = os.environ.get("MIMIR_ORACLE_SF_DIR",
                                    "/root/testdata/sf0.01")


def _ivf_ann_oracle(sf_dir: str = _IVF_ORACLE_SF_DIR) -> str:
    """Replays the IVF pipeline: identical ivf_train centroids baked
    as DOUBLE[] literals, cell = 1-based argmax of the dot-product
    list (list_position = first match, same tie rule as numpy argmax
    and Spark array_position), probe list precomputed in numpy.
    Trains on ``sf_dir``'s embeddings (default: the gate's sf0.01;
    parameterized so the entry verifies at any scale), with a
    corpus-identity guard computed from the SAME file."""
    import duckdb as _duck

    path = f"{sf_dir}/embeddings.parquet"
    sample, qvec = _ivf_sample_and_query(path)
    cent = similarity.ivf_train(sample, _IVF_CENTROIDS)
    probes = similarity.ivf_probe_cells(qvec, cent, _IVF_NPROBE)
    con = _duck.connect()
    n_rows, id_sum, e1_sum = con.sql(
        f"SELECT count(*), sum(vec_id), sum(embedding[1]::DOUBLE) "
        f"FROM read_parquet('{path}')").fetchone()
    con.close()
    cents = ", ".join(
        "[" + ", ".join(repr(float(x)) for x in c) + "]::DOUBLE[] AS c" + str(i)
        for i, c in enumerate(cent))
    dots = ", ".join(
        f"list_dot_product(e.v, c.c{i})" for i in range(len(cent)))
    probe_list = ", ".join(str(p) for p in probes)
    return f"""
WITH cents AS (SELECT {cents}),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
assigned AS (
  SELECT e.vec_id, e.v,
    list_position([{dots}],
                  list_aggregate([{dots}], 'max')) AS cell
  FROM e CROSS JOIN cents c
),
-- corpus-identity guard: the centroid literals above were trained on
-- {sf_dir}; if the gate's embeddings view is a DIFFERENT corpus this
-- yields 0 oracle rows (an obvious, diagnosable failure) instead of a
-- subtle value-hash diff from mismatched centroids.
chk AS (
  SELECT count(*) = {n_rows} AND sum(vec_id) = {id_sum}
         AND abs(sum(embedding[1]::DOUBLE) - ({e1_sum!r})) < 0.01 AS corpus_ok
  FROM embeddings
),
q AS (SELECT v AS qv FROM e WHERE vec_id = 0 AND (SELECT corpus_ok FROM chk))
SELECT a.vec_id,
  round(list_dot_product(a.v, q.qv)
        / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(q.qv, q.qv))),
        6) AS cosine
FROM assigned a, q
WHERE a.cell IN ({probe_list})
ORDER BY cosine DESC, a.vec_id ASC
LIMIT 10
"""


def q_indexed_term_query(spark, sf_dir):
    """TermQuery as a POSTINGS LOOKUP through the gate — the inverted-
    index analogue (MG4J postings; TermQuery.java:147-185 skipTo): the
    committed fixture is ingested (canonical dedup), materialized as a
    term-bucket-partitioned index (sources/token_index: partition
    pruning on the md5-derived term bucket + the equality predicate
    pushed into the pruned scan, plan-asserted in pytest), and
    'taverpe IN {Document n_tool_turns >= 8}' runs with the parser's
    term leaves resolved via index lookups — postings + containment
    composed in one oracled plan."""
    from mimir_spark.ingest import ingest
    from mimir_spark.query_parser import run_query
    from mimir_spark.sources import token_index as TI

    t = ingest(spark.read.parquet(_TRANSCRIPT_FIXTURE))
    store = _cached_store("tindex", _TRANSCRIPT_FIXTURE)
    _atomic_build(store, lambda p: TI.write_token_index(t, p))
    res = TI.indexed_term_resolver(spark, str(store))
    return run_query("taverpe IN {Document n_tool_turns >= 8}", t,
                     term_index=res)


_INDEXED_TERM_ORACLE = f"""
WITH base AS (
  SELECT conv_id, turn_idx, role, tool, ts, text,
    CASE WHEN text IS NULL OR length(trim(text)) = 0 THEN 0
         ELSE len(string_split_regex(trim(text), '[ \\t\\n\\r]+')) END AS n_tok
  FROM read_parquet('{{fixture}}')
),
dedup AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY conv_id, turn_idx
      ORDER BY ts ASC NULLS LAST, role ASC NULLS LAST, tool ASC NULLS LAST,
               n_tok ASC, md5(text) ASC NULLS LAST) AS _rn
    FROM base) WHERE _rn = 1
),
tok AS (
  SELECT DISTINCT conv_id, turn_idx AS pos
  FROM dedup, unnest(string_split_regex(trim(lower(text)),
                                        '[ \\t\\n\\r]+')) AS t(tk)
  WHERE t.tk = 'taverpe'
),
doc AS (
  SELECT conv_id FROM dedup GROUP BY conv_id
  HAVING sum(CASE WHEN role = 'tool' THEN 1 ELSE 0 END) >= 8
)
SELECT tok.conv_id, CAST(tok.pos AS INT) AS pos, CAST(1 AS INT) AS len
FROM tok JOIN doc USING (conv_id)
""".replace("{fixture}", _TRANSCRIPT_FIXTURE)


def q_transcript_rollup_1m(spark, sf_dir):
    """Flagship engine path on the committed deterministic transcript
    corpus: ingest (dedup) -> metric explode -> one-pass tiered rollup
    (1m slice). Chunk column verified bit-for-bit in pytest goldens;
    the driver oracle checks every aggregate column."""
    from mimir_spark.ingest import ingest, turn_metrics
    from mimir_spark.rollup import rollup_points

    t = spark.read.parquet(_TRANSCRIPT_FIXTURE)
    rolled = rollup_points(turn_metrics(ingest(t)), tiers=("1m",))
    return rolled.select("kind", "series_key", "metric", "bucket_ts",
                         "cnt", "sum_v", "min_v", "max_v", "last_v")


# DuckDB replay of the full pipeline: tokenize -> canonical-survivor
# dedup -> metric explode (incl. role_mix catch-all) -> 1m buckets.
# All metric values are small integers, so float sums are exact in any
# order; last_v is keyed on the total (ts, conv_id, turn_idx) order —
# the same key the engine's in-partition sort uses. ``extra_where``
# injects overlay predicates (the retention entry).
def q_parsed_ann_in_doc_query(spark, sf_dir):
    """Query-string entry point with ANNOTATION constraints + document
    containment composed: '{Tool name=bash} IN {Document n_tool_turns
    >= 8}' — the parser resolves the Tool annotation (name aliases the
    tool column), the Document-mode conversation predicate
    (SemanticAnnotationHelper DOCUMENT mode), and the IN containment
    operator in one plan over the committed transcript fixture."""
    from mimir_spark.query_parser import run_query

    t = spark.read.parquet(_TRANSCRIPT_FIXTURE)
    return run_query("{Tool name=bash} IN {Document n_tool_turns >= 8}", t)


_PARSED_ANN_IN_DOC_ORACLE = f"""
WITH t AS (
  SELECT conv_id, turn_idx, role, tool
  FROM read_parquet('{_TRANSCRIPT_FIXTURE}')
),
doc AS (
  SELECT conv_id FROM t GROUP BY conv_id
  HAVING sum(CASE WHEN role = 'tool' THEN 1 ELSE 0 END) >= 8
)
SELECT t.conv_id, CAST(t.turn_idx AS INT) AS pos, CAST(1 AS INT) AS len
FROM t JOIN doc USING (conv_id)
WHERE t.tool = 'bash'
"""


def _transcript_rollup_oracle(extra_where: str = "", trunc: str = "minute",
                              closed_delay_s: int | None = None,
                              with_last: bool = True) -> str:
    """DuckDB replay of the transcript rollup, parameterized:

    - ``trunc``: bucket unit ('minute'/'hour'/'day').
    - ``closed_delay_s``: when set, keep only buckets CLOSED by the
      terminal streaming watermark ``max(ts) - delay`` (ms-truncated
      the way Spark tracks event time) — the append-mode emitted set
      of the single-batch stream replay.
    - ``with_last``: include last_v (the built-in streaming agg has no
      last-value column; the stateful chunk writer does).
    """
    unit_us = {"minute": 60_000_000, "hour": 3_600_000_000,
               "day": 86_400_000_000}[trunc]
    last_sel = ",\n       max(CASE WHEN rn = 1 THEN v END) AS last_v" \
        if with_last else ""
    closed = ""
    if closed_delay_s is not None:
        closed = (
            f"WHERE epoch_us(bucket_ts) + {unit_us} <= "
            f"(SELECT (epoch_us(max(ts)) // 1000) * 1000 "
            f"- {closed_delay_s * 1_000_000} FROM base)"
        )
    return f"""
WITH base AS (
  SELECT conv_id, turn_idx, role, tool, ts, text,
    CASE WHEN text IS NULL OR length(trim(text)) = 0 THEN 0
         ELSE len(string_split_regex(trim(text), '[ \\t\\n\\r]+')) END AS n_tok
  FROM read_parquet('{_TRANSCRIPT_FIXTURE}')
  WHERE TRUE {extra_where}
),
dedup AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY conv_id, turn_idx
      ORDER BY ts ASC NULLS LAST, role ASC NULLS LAST, tool ASC NULLS LAST,
               n_tok ASC, md5(text) ASC NULLS LAST) AS _rn
    FROM base) WHERE _rn = 1
),
points AS (
  SELECT 'conv' AS kind, conv_id AS series_key, 'turn_rate' AS metric,
         ts, conv_id, turn_idx, 1.0 AS v FROM dedup
  UNION ALL
  SELECT 'conv', conv_id, 'token_volume', ts, conv_id, turn_idx,
         CAST(n_tok AS DOUBLE) FROM dedup
  UNION ALL
  SELECT 'conv', conv_id,
         CASE WHEN role IN ('user','assistant','tool')
              THEN 'role_mix_' || role ELSE 'role_mix_other' END,
         ts, conv_id, turn_idx, 1.0 FROM dedup WHERE role IS NOT NULL
  UNION ALL
  SELECT 'tool', tool, 'turn_rate', ts, conv_id, turn_idx, 1.0
  FROM dedup WHERE tool IS NOT NULL
  UNION ALL
  SELECT 'tool', tool, 'token_volume', ts, conv_id, turn_idx,
         CAST(n_tok AS DOUBLE) FROM dedup WHERE tool IS NOT NULL
),
ranked AS (
  SELECT kind, series_key, metric,
         date_trunc('{trunc}', ts) AS bucket_ts, v,
         ROW_NUMBER() OVER (
           PARTITION BY kind, series_key, metric, date_trunc('{trunc}', ts)
           ORDER BY ts DESC, conv_id DESC, turn_idx DESC) AS rn
  FROM points
)
SELECT kind, series_key, metric, bucket_ts,
       count(*) AS cnt,
       sum(v) AS sum_v,
       min(v) AS min_v,
       max(v) AS max_v{last_sel}
FROM ranked
{closed}
GROUP BY kind, series_key, metric, bucket_ts
"""


_TOMBSTONED = ["conv-00000007", "conv-00000010", "conv-00000042"]


def q_retention_overlay_rollup(spark, sf_dir):
    """Deleted-docs overlay (retention.apply_tombstones) composed with
    the flagship rollup: tombstoned conversations vanish from every
    series before aggregation — the read-time anti-join overlay."""
    from mimir_spark.ingest import ingest, turn_metrics
    from mimir_spark.retention import apply_tombstones
    from mimir_spark.rollup import rollup_points

    t = spark.read.parquet(_TRANSCRIPT_FIXTURE)
    tomb = spark.createDataFrame([(c,) for c in _TOMBSTONED], "conv_id string")
    live = apply_tombstones(t, tomb)
    rolled = rollup_points(turn_metrics(ingest(live)), tiers=("1m",))
    return rolled.select("kind", "series_key", "metric", "bucket_ts",
                         "cnt", "sum_v", "min_v", "max_v", "last_v")


def q_streaming_rollup_1h(spark, sf_dir):
    """SURVEY §2.8 through the driver gate: the watermarked streaming
    tier aggregate (withWatermark + dropDuplicatesWithinWatermark +
    window groupBy, append output) driven to completion over the
    committed transcript fixture in a single data micro-batch
    (replay_stream). The emitted set is exactly the buckets closed by
    the terminal watermark max(ts) - 10min, which the oracle replays
    as a closed-bucket filter over the batch rollup — the continuous
    ingest visibility contract (MimirIndex.java:611-628: documents
    searchable at sync-to-disk)."""
    from mimir_spark.fixtures import TRANSCRIPT_SCHEMA_NTZ
    from mimir_spark.streaming.rollup_stream import (replay_stream,
                                                     streaming_rollup)

    return replay_stream(
        spark, _TRANSCRIPT_FIXTURE, TRANSCRIPT_SCHEMA_NTZ,
        lambda s: streaming_rollup(s, tier="1h", watermark="10 minutes"),
        "gate_stream_agg")


def q_streaming_chunks_1h(spark, sf_dir):
    """The custom STATEFUL streaming operator (the
    applyInPandasWithState Gorilla chunk writer, rollup_stream.py:100)
    through the driver gate: every aggregate column of every bucket it
    closes is oracle-checked. The chunk BYTES are excluded only
    because DuckDB cannot decode Gorilla; they are asserted bit-for-bit
    equal to the batch writer's in pytest
    (test_streaming_chunks_match_batch). Runs the SHARDED state layout
    (stream_job's production default — one columnar buffer per hash
    shard); the per-series layout is the pytest-parametrized twin."""
    from mimir_spark.fixtures import TRANSCRIPT_SCHEMA_NTZ
    from mimir_spark.streaming.rollup_stream import (replay_stream,
                                                     streaming_rollup_chunks)

    out = replay_stream(
        spark, _TRANSCRIPT_FIXTURE, TRANSCRIPT_SCHEMA_NTZ,
        lambda s: streaming_rollup_chunks(s, tier="1h",
                                          watermark="10 minutes",
                                          shards=8),
        "gate_stream_chunks")
    return out.select("kind", "series_key", "metric", "bucket_ts",
                      "cnt", "sum_v", "min_v", "max_v", "last_v")


def q_multimodal_real_features(spark, sf_dir):
    """REAL media decode through the gate: genuine WAV (RIFF 16-bit
    PCM) and BMP (uncompressed 24-bit) payloads parsed with numpy
    only (media_codecs), audio features (duration/RMS/ZCR/FFT bands)
    and image features (channel stats + luminance histogram). The
    oracle replays the whole generate->parse->featurize pipeline in
    pure Python and embeds the expected values as literals — exact
    float64 equality (both sides accumulate the same float32 values
    in array order)."""
    from mimir_spark.multimodal import (extract_features,
                                        synthetic_media_real_df)

    feats = extract_features(synthetic_media_real_df(spark, 48),
                             feat_dim=16, decoder="real")
    return feats.select(
        "media_id", "kind", "feat_dim", "n_bytes",
        F.element_at("feat", 1).cast("double").alias("feat0"),
        F.element_at("feat", 16).cast("double").alias("feat15"),
        F.expr("aggregate(feat, 0D, (acc, x) -> acc + cast(x as double))")
        .alias("feat_sum"),
    )


def _multimodal_real_oracle() -> str:
    from mimir_spark.media_codecs import decode_features
    from mimir_spark.multimodal import real_media_row

    rows = []
    for i in range(48):
        r = real_media_row(i)
        feat = decode_features(bytes(r["payload"]), 16)
        s = 0.0
        for x in feat:
            s += float(x)
        # quote-and-cast: DuckDB parses bare decimal literals as
        # DECIMAL, which can land 1 ulp off the strtod double; a
        # VARCHAR->DOUBLE cast round-trips repr() exactly
        rows.append(
            f"({i}, '{r['kind']}', 16, {len(r['payload'])}, "
            f"CAST('{float(feat[0])!r}' AS DOUBLE), "
            f"CAST('{float(feat[15])!r}' AS DOUBLE), "
            f"CAST('{s!r}' AS DOUBLE))")
    values = ",\n".join(rows)
    return f"""
SELECT * FROM (VALUES
{values}
) AS t(media_id, kind, feat_dim, n_bytes, feat0, feat15, feat_sum)
"""


def q_multimodal_features(spark, sf_dir):
    """Multimodal plumbing, oracle-checked end to end: the fake decoder
    is a pure function of the payload (sha256(payload) bytes / 255 as
    float32, multimodal.py:69), so each feature element recovers its
    source byte exactly via round(x * 255). The oracle replays the
    whole pipeline in pure Python and embeds the expected bytes as a
    literal VALUES table — feature VALUES are verified, not just row
    shape."""
    from mimir_spark.multimodal import extract_features, synthetic_media_df

    feats = extract_features(synthetic_media_df(spark, 64), feat_dim=16)
    return feats.select(
        "media_id", "kind", "feat_dim", "n_bytes",
        F.round(F.element_at("feat", 1).cast("double") * 255.0, 0)
        .cast("int").alias("feat0_byte"),
        F.expr(
            "cast(aggregate(feat, 0D,"
            " (acc, x) -> acc + round(cast(x as double) * 255.0, 0))"
            " as bigint)"
        ).alias("feat_bytes_sum"),
    )


def _multimodal_oracle() -> str:
    """Replay synthetic_media_df + the fake decoder in pure Python
    (hashlib only — no Spark, no numpy float paths) and emit the
    expected rows as a literal table."""
    import hashlib

    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(64):
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * (8 + i % 5)
        fb = hashlib.sha256(payload).digest()[:16]  # dim 16 <= 32 bytes
        rows.append(
            f"({i},'{kinds[i % 3]}',{len(payload)},{fb[0]},{sum(fb)})")
    values = ",".join(rows)
    return f"""
        SELECT CAST(media_id AS BIGINT) AS media_id, kind,
               CAST(16 AS INTEGER) AS feat_dim,
               CAST(n_bytes AS BIGINT) AS n_bytes,
               CAST(feat0_byte AS INTEGER) AS feat0_byte,
               CAST(feat_bytes_sum AS BIGINT) AS feat_bytes_sum
        FROM (VALUES {values})
             AS t(media_id, kind, n_bytes, feat0_byte, feat_bytes_sum)
    """


# ---------------------------------------------------------------------------
# driver contract
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: 1-minute rollup tier
    over the events series table."""
    _ship_package(spark)
    return q_rollup_events_1m(spark, "/root/testdata/sf0.001")


def _with_shipping(fn):
    def wrapped(spark, sf_dir):
        _ship_package(spark)
        return fn(spark, sf_dir)

    wrapped.__name__ = fn.__name__
    wrapped.__doc__ = fn.__doc__
    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _with_shipping(fn) for name, fn in _QUERIES.items()}


_QUERIES = {
        # Entries that lacked CORRECTNESS_r03 rows run FIRST: the
        # round-3 gate recorded exactly 50 rows in registry order, so
        # the registry is capped at 50 entries and the previously
        # starved ones are front-loaded (de-gated twins — salted /
        # indexed / brute-force flavors with identical oracles — are
        # pytest-equivalence-verified instead; see tests/test_entry.py).
        "retention_overlay_rollup": q_retention_overlay_rollup,
        "multimodal_features": q_multimodal_features,
        "multimodal_real_features": q_multimodal_real_features,
        "and_terms_intersection": q_and_terms_intersection,
        # time-series rollup surface
        "rollup_events_1m": q_rollup_events_1m,
        "rollup_events_1h_cascade": q_rollup_events_1h_cascade,
        "rollup_events_1d": q_rollup_events_1d,
        "running_total_by_user": q_running_total_by_user,
        "distinct_users_per_type": q_distinct_users_per_type,
        "part_type_facet": q_part_type_facet,
        "gapfill_locf_events_1h": q_gapfill_locf_events_1h,
        "gapfill_linear_events_1h": q_gapfill_linear_events_1h,
        "sessionize_events": q_sessionize_events,
        "asof_enrich": q_asof_enrich,
        "topk_users_by_value": q_topk_users_by_value,
        "seq_click_purchase": q_seq_click_purchase,
        "parsed_seq_query": q_parsed_seq_query,
        "parsed_ann_in_doc_query": q_parsed_ann_in_doc_query,
        "indexed_term_query": q_indexed_term_query,
        "repeats_query": q_repeats_query,
        "within_query": q_within_query,
        "contains_query": q_contains_query,
        "users_view_no_purchase": q_users_view_no_purchase,
        # relational coverage
        "measurement_filter": q_measurement_filter,
        "q1_pricing_summary": q_q1_pricing_summary,
        "revenue_by_segment": q_revenue_by_segment,
        "top_brands_by_revenue": q_top_brands_by_revenue,
        "customers_without_orders": q_customers_without_orders,
        # terms algebra
        "terms_topk_documents": q_terms_topk_documents,
        "documents_and_terms": q_documents_and_terms,
        "documents_or_terms": q_documents_or_terms,
        "annotation_terms": q_annotation_terms,
        "or_terms_first": q_or_terms_first,
        "terms_by_description": q_terms_by_description,
        "bm25_scores": q_bm25_scores,
        "cube_returnflag_status": q_cube_returnflag_status,
        # training-data pipeline
        "lang_id_counts": q_lang_id_counts,
        "token_stats": q_token_stats,
        "quality_scores": q_quality_scores,
        "dedup_exact_docs": q_dedup_exact_docs,
        "jaccard_dup_pairs": q_jaccard_dup_pairs,
        "minhash_lsh_pairs": q_minhash_lsh_pairs,
        "ann_topk_cosine": q_ann_topk_cosine,
        "cosine_dup_pairs_lsh": q_cosine_dup_pairs_lsh,
        # rows-only (non-SQL-expressible)
        "simhash_pairs": q_simhash_pairs,
        "lsh_ann_topk_bucketed": q_lsh_ann_topk_bucketed,
        "ivf_ann_topk": q_ivf_ann_topk,
        "transcript_rollup_1m": q_transcript_rollup_1m,
        "streaming_rollup_1h": q_streaming_rollup_1h,
        "streaming_chunks_1h": q_streaming_chunks_1h,
    }


def oracle_sql() -> dict[str, str]:
    oracles = {
        "rollup_events_1m": _ROLLUP_ORACLE.format(trunc="minute"),
        "rollup_events_1h_cascade": _ROLLUP_ORACLE.format(trunc="hour"),
        "rollup_events_1d": _ROLLUP_ORACLE.format(trunc="day"),
        "running_total_by_user": """
            SELECT event_id, user_id,
                   CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                     AS running_total
            FROM events
        """,
        "distinct_users_per_type": """
            SELECT event_type, count(DISTINCT user_id) AS n_users,
                   count(*) AS n_events
            FROM events GROUP BY event_type
        """,
        "part_type_facet": """
            SELECT p_type, count(*) AS n_parts,
                   CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
                   min(p_size) AS min_size, max(p_size) AS max_size
            FROM part GROUP BY p_type
        """,
        "gapfill_locf_events_1h": _GAPFILL_LOCF_ORACLE,
        "gapfill_linear_events_1h": _GAPFILL_LINEAR_ORACLE,
        "sessionize_events": _SESSIONIZE_ORACLE,
        "asof_enrich": _ASOF_ORACLE,
        "topk_users_by_value": """
            SELECT user_id,
                   CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
            FROM events GROUP BY user_id
            ORDER BY total_value DESC, user_id ASC LIMIT 10
        """,
        "seq_click_purchase": _SEQ_ORACLE,
        "parsed_seq_query": _PARSED_SEQ_ORACLE,
        "repeats_query": _REPEATS_ORACLE,
        "within_query": _WITHIN_ORACLE,
        "contains_query": _CONTAINS_ORACLE,
        "annotation_terms": _ANNOTATION_TERMS_ORACLE,
        "users_view_no_purchase": """
            SELECT DISTINCT user_id FROM events WHERE event_type = 'view'
            AND user_id NOT IN (SELECT user_id FROM events WHERE event_type = 'purchase')
        """,
        "measurement_filter": _measurement_oracle(),
        "q1_pricing_summary": _Q1_ORACLE,
        "revenue_by_segment": """
            SELECT c_mktsegment,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
                   count(*) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment
        """,
        "top_brands_by_revenue": """
            SELECT p_brand,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
                     AS revenue
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_brand ORDER BY revenue DESC, p_brand ASC LIMIT 5
        """,
        "customers_without_orders": """
            SELECT c_custkey FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        """,
        "terms_topk_documents": _TERMS_TOPK_ORACLE,
        "documents_and_terms": _AND_TERMS_ORACLE,
        "and_terms_intersection": _AND_TERMS_INTERSECTION_ORACLE,
        "documents_or_terms": _OR_TERMS_ORACLE,
        "or_terms_first": _OR_TERMS_FIRST_ORACLE,
        "terms_by_description": _TERMS_BY_DESC_ORACLE,
        "bm25_scores": _BM25_ORACLE,
        "cube_returnflag_status": """
            SELECT l_returnflag, l_linestatus, count(*) AS n,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
            FROM lineitem
            GROUP BY CUBE (l_returnflag, l_linestatus)
        """,
        "lang_id_counts": _LANG_ORACLE,
        "token_stats": _TOKEN_STATS_ORACLE,
        "quality_scores": _QUALITY_ORACLE,
        "dedup_exact_docs": _DEDUP_EXACT_ORACLE,
        "jaccard_dup_pairs": _JACCARD_ORACLE,
        "minhash_lsh_pairs": _minhash_oracle(),
        "simhash_pairs": _simhash_oracle(),
        "ann_topk_cosine": _ANN_ORACLE,
        "cosine_dup_pairs_lsh": _cosine_lsh_oracle(),
        "transcript_rollup_1m": _transcript_rollup_oracle(),
        "streaming_rollup_1h": _transcript_rollup_oracle(
            trunc="hour", closed_delay_s=600, with_last=False),
        "streaming_chunks_1h": _transcript_rollup_oracle(
            trunc="hour", closed_delay_s=600),
        "retention_overlay_rollup": _transcript_rollup_oracle(
            "AND conv_id NOT IN ("
            + ", ".join(f"'{c}'" for c in _TOMBSTONED) + ")"),
        "parsed_ann_in_doc_query": _PARSED_ANN_IN_DOC_ORACLE,
        "indexed_term_query": _INDEXED_TERM_ORACLE,
        "lsh_ann_topk_bucketed": _lsh_ann_oracle(),
        "multimodal_features": _multimodal_oracle(),
        "multimodal_real_features": _multimodal_real_oracle(),
    }
    # the IVF oracle trains on _IVF_ORACLE_SF_DIR's embeddings (the
    # gate's sf0.01 by default; MIMIR_ORACLE_SF_DIR overrides for
    # other-scale verification); on a host without that file the entry
    # degrades to the driver's rows-only check instead of breaking the
    # whole oracle map. ONLY the missing file is tolerated — any error
    # inside the oracle builder propagates.
    if os.path.exists(f"{_IVF_ORACLE_SF_DIR}/embeddings.parquet"):
        oracles["ivf_ann_topk"] = _ivf_ann_oracle()
    return oracles
