"""Positional query algebra over ordered turn streams.

Spark-first re-expression of the reference's compound executors — all
of which are document-aligned merge joins plus an interval algorithm
within each document (AbstractIntersectionQueryExecutor.java:78-112).
Here the "document alignment" is an equi-join on conv_id (Catalyst
picks broadcast/SMJ; skew handled by AQE) and the interval algebra is
range predicates — exactly the plan shape the reference hand-codes.

A *hit* DataFrame has columns (conv_id string, pos int, len int):
the Binding of the reference (search/query/Binding.java:28-86), with
pos = turn index and len = number of turns covered.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HIT_SCHEMA = "conv_id string, pos int, len int"
_HIT_COLS = ["conv_id", "pos", "len"]


def _as_hits(df: DataFrame) -> DataFrame:
    return df.select(*_HIT_COLS)


# ---------------------------------------------------------------------------
# leaf queries (TermQuery.java:147-185, AnnotationQuery.java:80-100)
# ---------------------------------------------------------------------------

def term_query(turns: DataFrame, column: str, value, downcase: bool = False) -> DataFrame:
    """All positions where ``column`` equals ``value`` — the TermQuery.

    The parquet/Iceberg predicate pushdown plays the role of the
    reference's skip-based posting iteration (TermQuery.skipTo)."""
    col = F.lower(F.col(column)) if downcase else F.col(column)
    val = value.lower() if downcase and isinstance(value, str) else value
    return turns.filter(col == F.lit(val)).select(
        "conv_id", F.col("turn_idx").alias("pos"), F.lit(1).alias("len")
    )


_CONSTRAINT_OPS = {
    "EQ": lambda c, v: c == v,
    "GT": lambda c, v: c > v,
    "GE": lambda c, v: c >= v,
    "LT": lambda c, v: c < v,
    "LE": lambda c, v: c <= v,
    "REGEX": lambda c, v: c.rlike(v),
}


def annotation_query(turns: DataFrame,
                     constraints: list[tuple[str, str, object]]) -> DataFrame:
    """{Type f1=v1 f2>v2 ...}: conjunction of typed constraints
    (ConstraintType.java:20-56 — EQ/GT/GE/LT/LE/REGEX) -> hits."""
    pred = F.lit(True)
    for col, op, val in constraints:
        try:
            fn = _CONSTRAINT_OPS[op]
        except KeyError:
            raise ValueError(f"unknown constraint op {op!r}") from None
        pred = pred & fn(F.col(col), val)  # raw value: rlike needs a str pattern
    return turns.filter(pred).select(
        "conv_id", F.col("turn_idx").alias("pos"), F.lit(1).alias("len")
    )


def conversation_stats(turns: DataFrame) -> DataFrame:
    """Conversation-level attribute frame for document-mode queries:
    the virtual whole-document annotation of the reference
    (SemanticAnnotationHelper.java:53-70 DOCUMENT mode)."""
    return turns.groupBy("conv_id").agg(
        F.count("*").alias("n_turns"),
        F.min("ts").alias("start_ts"),
        F.max("ts").alias("end_ts"),
        F.sum(F.when(F.col("role") == "tool", 1).otherwise(0)).alias("n_tool_turns"),
        F.count_distinct("tool").alias("n_distinct_tools"),
    )


def document_query(turns: DataFrame, predicate) -> DataFrame:
    """{Document attr op val}: conversations whose stats satisfy the
    predicate, as whole-conversation hits (pos=0, len=n_turns) — length
    = document size (AnnotationQuery.java:136-138)."""
    return (
        conversation_stats(turns)
        .filter(predicate)
        .select("conv_id", F.lit(0).alias("pos"),
                F.col("n_turns").cast("int").alias("len"))
    )


def const_restrict(hits: DataFrame, conv_ids: DataFrame) -> DataFrame:
    """ConstQuery: restrict hits to a fixed conversation set via a
    broadcast semi-join (ConstQuery.java:32-70)."""
    return hits.join(F.broadcast(conv_ids.select("conv_id").distinct()),
                     "conv_id", "left_semi")


# ---------------------------------------------------------------------------
# compound operators (SURVEY.md §2.3)
# ---------------------------------------------------------------------------

# Sub-bindings (Binding.java:28-86 containedBindings): an optional
# ``sub`` column of array<struct<child int, pos int, len int>> carries
# each child query's matched span through compound operators, so a
# consumer can recover WHICH child matched WHERE without re-running
# the leaves. Default-off: the flat 12-byte hit row stays the wire
# format of the algebra (distinct/joins/shuffles stay narrow); pass
# keep_sub=True where the spans are wanted.

_SUB_STRUCT = "array<struct<child:int,pos:int,len:int>>"


def _ensure_sub(hits: DataFrame) -> DataFrame:
    """Promote a hit frame to carry sub-bindings: a leaf becomes its
    own single child (child index 0)."""
    if "sub" in hits.columns:
        return hits
    return hits.withColumn("sub", F.array(F.struct(
        F.lit(0).cast("int").alias("child"),
        F.col("pos").cast("int").alias("pos"),
        F.col("len").cast("int").alias("len"))))


def sequence_query(left: DataFrame, right: DataFrame,
                   min_gap: int = 0, max_gap: int = 0,
                   keep_sub: bool = False) -> DataFrame:
    """Phrase/sequence: a right hit starting between min_gap and
    max_gap positions after the left hit ends (SequenceQuery.java +
    Gap semantics). Equi-join on conv_id + range predicate — the
    zig-zag doc alignment for free from the join, the position
    constraint as a theta filter.

    With ``keep_sub`` the result carries the children's spans: the
    right side's child indices are shifted past the left's (a chain of
    sequence_querys numbers the N leaves 0..N-1 left to right), and
    distinct() then keys on the full binding — two different child
    decompositions of the same window are two bindings, exactly the
    reference executor's enumeration."""
    if keep_sub:
        left, right = _ensure_sub(left), _ensure_sub(right)
    l, r = left.alias("l"), right.alias("r")
    lo = F.col("l.pos") + F.col("l.len") + F.lit(min_gap)
    hi = F.col("l.pos") + F.col("l.len") + F.lit(max_gap)
    cols = [
        F.col("l.conv_id").alias("conv_id"),
        F.col("l.pos").alias("pos"),
        (F.col("r.pos") + F.col("r.len") - F.col("l.pos")).alias("len"),
    ]
    if keep_sub:
        shift = F.size(F.col("l.sub"))
        rsub = F.transform(
            F.col("r.sub"),
            lambda x: F.struct((x["child"] + shift).cast("int").alias("child"),
                               x["pos"].alias("pos"), x["len"].alias("len")))
        cols.append(F.concat(F.col("l.sub"), rsub).alias("sub"))
    return (
        l.join(r, on=(F.col("l.conv_id") == F.col("r.conv_id"))
               & (F.col("r.pos") >= lo) & (F.col("r.pos") <= hi))
        .select(*cols)
        .distinct()
    )


def sequence(hit_dfs: list[DataFrame], gaps: list[tuple[int, int]] | None = None,
             keep_sub: bool = False) -> DataFrame:
    """N-ary sequence with per-junction (min,max) gaps."""
    gaps = gaps or [(0, 0)] * (len(hit_dfs) - 1)
    acc = hit_dfs[0]
    for nxt, (lo, hi) in zip(hit_dfs[1:], gaps):
        acc = sequence_query(acc, nxt, lo, hi, keep_sub=keep_sub)
    return acc


def explode_bindings(hits: DataFrame) -> DataFrame:
    """Flatten a sub-binding-carrying hit frame to one row per
    (hit, child span)."""
    return hits.select(
        "conv_id", "pos", "len", F.explode("sub").alias("b")
    ).select(
        "conv_id", "pos", "len",
        F.col("b.child").alias("child"),
        F.col("b.pos").alias("sub_pos"),
        F.col("b.len").alias("sub_len"),
    )


def render_sub_bindings(turns: DataFrame, hits: DataFrame) -> DataFrame:
    """Per-child snippet rendering: one row per (hit, child) with the
    CHILD's covered turns joined in order — the highlight-which-child
    counterpart of render_hits (QueryEngine.java:461-572 renders hits
    with their contained bindings)."""
    b = explode_bindings(hits).alias("h")
    t = turns.alias("t")
    cond = (
        (F.col("h.conv_id") == F.col("t.conv_id"))
        & (F.col("t.turn_idx") >= F.col("h.sub_pos"))
        & (F.col("t.turn_idx") < F.col("h.sub_pos") + F.col("h.sub_len"))
    )
    return (
        b.join(t, cond)
        .groupBy(F.col("h.conv_id").alias("conv_id"),
                 F.col("h.pos").alias("pos"), F.col("h.len").alias("len"),
                 F.col("h.child").alias("child"),
                 F.col("h.sub_pos").alias("sub_pos"),
                 F.col("h.sub_len").alias("sub_len"))
        .agg(
            F.concat_ws(
                "\n",
                F.transform(
                    F.sort_array(F.collect_list(
                        F.struct(F.col("t.turn_idx"), F.col("t.role"),
                                 F.col("t.text"))
                    )),
                    lambda s: F.concat_ws(": ", s["role"], s["text"]),
                ),
            ).alias("snippet")
        )
    )


def or_query(*hit_dfs: DataFrame) -> DataFrame:
    """Union of child hits (OrQuery.java k-way merge)."""
    out = _as_hits(hit_dfs[0])
    for h in hit_dfs[1:]:
        out = out.unionByName(_as_hits(h))
    return out.distinct()


def contains_query(outer: DataFrame, inner: DataFrame) -> DataFrame:
    """OVER: outer hits containing >=1 inner hit
    (AbstractOverlapQuery.java:132-183, target=OUTER) — an interval
    semi-join. The target's sub-bindings (when present) pass through,
    matching the reference: the overlap executor returns the target
    node's binding with its containedBindings intact."""
    o, i = outer.alias("o"), inner.alias("i")
    cond = (
        (F.col("o.conv_id") == F.col("i.conv_id"))
        & (F.col("i.pos") >= F.col("o.pos"))
        & (F.col("i.pos") + F.col("i.len") <= F.col("o.pos") + F.col("o.len"))
    )
    keep = _HIT_COLS + (["sub"] if "sub" in outer.columns else [])
    return o.join(i, cond, "left_semi").select(*keep)


def within_query(inner: DataFrame, outer: DataFrame) -> DataFrame:
    """IN: inner hits contained in some outer hit (target=INNER).
    The target's sub-bindings (when present) pass through."""
    i, o = inner.alias("i"), outer.alias("o")
    cond = (
        (F.col("i.conv_id") == F.col("o.conv_id"))
        & (F.col("i.pos") >= F.col("o.pos"))
        & (F.col("i.pos") + F.col("i.len") <= F.col("o.pos") + F.col("o.len"))
    )
    keep = _HIT_COLS + (["sub"] if "sub" in inner.columns else [])
    return i.join(o, cond, "left_semi").select(*keep)


def minus_query(left: DataFrame, right: DataFrame) -> DataFrame:
    """Hits of left not exactly equal to any right hit
    (MinusQuery.java:56-98) — a left-anti join on (conv_id, pos, len)."""
    return _as_hits(left).join(_as_hits(right), _HIT_COLS, "left_anti")


def repeats_query(hits: DataFrame, m: int, n: int) -> DataFrame:
    """Bounded Kleene +m..n: k consecutive hits, each starting exactly
    where the previous ends (RepeatsQuery.java:105-178). Expressed as
    OR(seq x m .. seq x n) with zero-width junctions — the identity the
    reference itself tests (TestQueries.java:182-199)."""
    if not 1 <= m <= n:
        raise ValueError("need 1 <= m <= n")
    runs, acc = [], hits
    for k in range(1, n + 1):
        if k > 1:
            nxt = hits.alias("r")
            a = acc.alias("l")
            acc = (
                a.join(nxt, on=(F.col("l.conv_id") == F.col("r.conv_id"))
                       & (F.col("r.pos") == F.col("l.pos") + F.col("l.len")))
                .select(
                    F.col("l.conv_id").alias("conv_id"),
                    F.col("l.pos").alias("pos"),
                    (F.col("l.len") + F.col("r.len")).alias("len"),
                )
            )
        if k >= m:
            runs.append(acc)
    return or_query(*runs)


def gap_query(hits: DataFrame, k: int) -> DataFrame:
    """Pad each hit's length by k (GapQuery.java:104-108)."""
    return hits.withColumn("len", F.col("len") + F.lit(k))


def render_hits(turns: DataFrame, hits: DataFrame, context: int = 0) -> DataFrame:
    """Text reconstruction for hits + context window — the snippet
    renderer (DocumentData.java:78-98; QueryEngine.java:461-572):
    returns one row per hit with the covered turns' text joined in
    order. Range join on turn_idx; text never leaves the JVM."""
    h, t = hits.alias("h"), turns.alias("t")
    cond = (
        (F.col("h.conv_id") == F.col("t.conv_id"))
        & (F.col("t.turn_idx") >= F.col("h.pos") - context)
        & (F.col("t.turn_idx") < F.col("h.pos") + F.col("h.len") + context)
    )
    return (
        h.join(t, cond)
        .groupBy(F.col("h.conv_id").alias("conv_id"),
                 F.col("h.pos").alias("pos"), F.col("h.len").alias("len"))
        .agg(
            F.concat_ws(
                "\n",
                F.transform(
                    F.sort_array(F.collect_list(
                        F.struct(F.col("t.turn_idx"), F.col("t.role"), F.col("t.text"))
                    )),
                    lambda s: F.concat_ws(": ", s["role"], s["text"]),
                ),
            ).alias("snippet")
        )
    )


def and_query(*hit_dfs: DataFrame) -> DataFrame:
    """Minimal covering windows containing >=1 hit of every child —
    minimal-interval semantics (AndQuery.java:85-256; the result is the
    antichain of covering windows, Clarke et al. as in MG4J). Children
    are tagged, unioned, shuffled once by conv_id, and a closed-form
    numpy sweep runs per conversation:

    for a window starting at S, the minimal covering end is
    E(S) = max over children of (suffix-min of interval ends among that
    child's intervals with start >= S). E is non-decreasing in S, so
    the antichain is exactly {[S, E] : S = largest start with that E,
    E finite}. Each child costs one searchsorted + one suffix-min —
    O(H log H) vectorized, no per-hit Python (a 10^5-hit conversation
    sweeps in milliseconds, see test_and_query_hit_dense_stress)."""
    tagged = []
    for idx, h in enumerate(hit_dfs):
        tagged.append(_as_hits(h).withColumn("child", F.lit(idx)))
    allhits = tagged[0]
    for t in tagged[1:]:
        allhits = allhits.unionByName(t)
    nchildren = len(hit_dfs)

    def per_conv(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for conv, g in pdf.groupby("conv_id", sort=False):
            starts = g["pos"].to_numpy(np.int64)
            ends = starts + g["len"].to_numpy(np.int64)
            child = g["child"].to_numpy()
            if len(np.unique(child)) < nchildren:
                continue
            cand_s = np.unique(starts)
            cover_e = np.full(len(cand_s), -np.inf)
            for c in range(nchildren):
                m = child == c
                order = np.argsort(starts[m], kind="stable")
                a = starts[m][order]
                b = ends[m][order].astype(np.float64)
                sfx = np.minimum.accumulate(b[::-1])[::-1]
                idx = np.searchsorted(a, cand_s, side="left")
                fc = np.where(idx < len(a), np.r_[sfx, [np.inf]][idx], np.inf)
                cover_e = np.maximum(cover_e, fc)
            finite = np.isfinite(cover_e)
            s_arr, e_arr = cand_s[finite], cover_e[finite]
            if len(s_arr) == 0:
                continue
            keep = np.r_[e_arr[:-1] != e_arr[1:], True]
            for s, e in zip(s_arr[keep].tolist(),
                            e_arr[keep].astype(np.int64).tolist()):
                out.append((conv, s, e - s))
        return pd.DataFrame(out, columns=_HIT_COLS)

    return (
        allhits.groupBy("conv_id")
        .applyInPandas(per_conv, HIT_SCHEMA)
        .distinct()
    )
