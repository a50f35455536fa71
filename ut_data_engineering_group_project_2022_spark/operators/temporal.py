"""Temporal join operators Spark's DataFrame API lacks as primitives.

``asof_join`` — for every left row, the single most recent right row
with ``right.ts <= left.ts`` per key (the time-series point-in-time
lookup: trades->quotes, clicks->latest purchase, features->labels).

``range_join_bucketed`` — all (left, right) pairs with ``right.ts`` in
a bounded window before ``left.ts``, via time-bucket equi-join instead
of the quadratic theta-join.

Spark has no ASOF JOIN; the naive formulations are a range join
(quadratic blow-up per key) or a per-key collect. This is the
union-and-carry formulation instead: tag both sides, union, and let one
ordered window per key carry the latest right payload forward into each
left row — ONE shuffle on the key, no row blow-up, no Python. DuckDB
has a native ASOF JOIN, which is exactly what the registered query's
oracle uses (ref: the same union trick appears in classic SQL
point-in-time-join folklore; semantics pinned by the oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    ts_col: str,
    right_payload: list[str],
    right_ts_col: str | None = None,
) -> DataFrame:
    """Left as-of join: latest right row with ``right.ts <= left.ts``.

    Returns every left column plus ``right_payload`` columns (NULL when
    no right row precedes the left row). ``right`` must be unique per
    (keys, ts) — dedupe first (e.g. keep max id) or matches at identical
    timestamps are ambiguous; the registered query does exactly that.

    Plan: union(tagged left, tagged right) -> window(partitionBy keys,
    orderBy ts, right-before-left) -> last(right_struct, ignoreNulls).
    At 100 TB both inputs shuffle once on the key and the window is a
    single pass — same cost as one sort-merge join, against DuckDB's
    native ASOF in the oracle.
    """
    lpay = F.struct(*[F.col(c) for c in left.columns]).alias("__l")
    rpay_t = right.select(F.struct(*right_payload).alias("s")).schema[0].dataType
    l_tag = left.select(
        *keys,
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__is_left"),
        lpay,
        F.lit(None).cast(rpay_t).alias("__r"),
    )
    lpay_t = l_tag.schema["__l"].dataType
    r_tag = right.select(
        *keys,
        F.col(right_ts_col or ts_col).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(lpay_t).alias("__l"),
        F.struct(*right_payload).alias("__r"),
    )
    # Right sorts before left at equal ts -> the <= (inclusive) semantics.
    w = (
        W.partitionBy(*keys)
        .orderBy("__ts", "__is_left")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = l_tag.unionByName(r_tag).withColumn(
        "__r_latest", F.last("__r", ignorenulls=True).over(w)
    )
    out_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns] + [
        F.col(f"__r_latest.{c}").alias(c) for c in right_payload
    ]
    return carried.filter(F.col("__is_left") == 1).select(*out_cols)


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    window_seconds: int,
) -> DataFrame:
    """Pairs with ``left.ts - window <= right.ts < left.ts``, per key.

    A naive range join is an inequality theta-join: Spark plans it as
    BroadcastNestedLoopJoin (or a per-key cross product) — O(n*m) work
    that dies long before 100 TB. The scale plan here discretizes time
    into ``window_seconds``-wide buckets: a right row at most
    ``window_seconds`` before a left row lives in the SAME bucket or
    the one immediately before, so exploding the left side into its two
    candidate buckets turns the range predicate into an EQUI-join on
    (keys..., bucket) — hash-partitioned, AQE-skew-aware, shuffle
    proportional to data size, with the exact inequality applied as a
    cheap post-filter. Candidate blow-up is exactly 2x the left side,
    independent of window width vs. data density.

    Returns all left columns plus all right columns (right's renamed
    with a ``r_`` prefix where they collide).
    """
    bucket = lambda c: F.floor(F.unix_timestamp(F.col(c)) / F.lit(window_seconds))  # noqa: E731
    l_b = left.withColumn(
        "__bl", F.explode(F.array(bucket(left_ts), bucket(left_ts) - 1))
    )
    renames = {c: f"r_{c}" for c in right.columns if c in left.columns}
    r_b = right.withColumn("__br", bucket(right_ts))
    for old, new in renames.items():
        r_b = r_b.withColumnRenamed(old, new)
    r_ts = renames.get(right_ts, right_ts)
    cond = [l_b[k] == r_b[renames.get(k, k)] for k in keys] + [
        l_b["__bl"] == r_b["__br"],
        r_b[r_ts] >= l_b[left_ts] - F.expr(f"INTERVAL {window_seconds} SECOND"),
        r_b[r_ts] < l_b[left_ts],
    ]
    return l_b.join(r_b, cond).drop("__bl", "__br")
