"""Event-stream batch ops: gap sessionization + per-session rollups.

The Versa reference has no event surface; these are the engine-checklist
ops a transcript/telemetry pipeline needs next to the KG job (the
`events` test table exists for them).  Plan shapes:

* ``sessionize`` — two stacked windows over the SAME (user) partitioning
  (lag to mark gaps, running sum to assign session ids), so Catalyst
  plans ONE exchange + one sort for both;
* ``session_stats`` — groupBy (user, session) with map-side partial
  aggregation; JSON props are extracted with get_json_object (JVM
  Jackson, no UDF).

At 100 TB the exchange hashes on user_id (high cardinality, no hot key —
a user emits a bounded event rate); AQE handles stragglers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(events: DataFrame, user_col: str = "user_id",
               ts_col: str = "ts", gap_minutes: int = 30) -> DataFrame:
    """Adds ``session_id`` (0-based per user): a new session starts when
    the gap since the user's previous event exceeds *gap_minutes*."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    # NTZ-safe: cast to timestamp for unix_micros; only
    # DIFFERENCES of micros are used, so any fixed session-tz
    # offset cancels
    ts = F.col(ts_col).cast("timestamp")
    prev = F.lag(ts).over(w)
    # integer microseconds: exact arithmetic, same in any engine (no
    # float-epoch rounding ambiguity at sub-second precision)
    new_session = F.when(
        prev.isNull() | (F.unix_micros(ts)
                         - F.unix_micros(prev)
                         > gap_minutes * 60 * 1_000_000), 1).otherwise(0)
    return (events
            .withColumn("_new", new_session)
            .withColumn("session_id",
                        F.sum("_new").over(
                            w.rowsBetween(Window.unboundedPreceding,
                                          Window.currentRow)) - 1)
            .drop("_new"))


def session_stats(events: DataFrame, user_col: str = "user_id",
                  ts_col: str = "ts", gap_minutes: int = 30,
                  value_col: str = "value",
                  props_col: str = "props") -> DataFrame:
    """Per-session rollup: event count, span seconds, value sum, distinct
    event types, and the max of the JSON prop ``k`` (get_json_object —
    JVM-side semi-structured extraction)."""
    s = sessionize(events, user_col, ts_col, gap_minutes)
    k = F.get_json_object(F.col(props_col), "$.k").cast("int")
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    return (s.groupBy(F.col(user_col).alias("user_id"), "session_id")
            .agg(F.count("*").alias("n_events"),
                 F.floor((F.max(us) - F.min(us)) / 1_000_000)
                 .cast("long").alias("span_s"),
                 # decimal accumulation: exact and association-free, so
                 # the rounded sum is engine-independent
                 F.round(F.sum(F.col(value_col).cast("decimal(18,6)")), 2)
                 .cast("double").alias("value_sum"),
                 F.countDistinct("event_type").alias("n_types"),
                 F.max(k).alias("max_k")))


def asof_join(left: DataFrame, right: DataFrame,
              by: str = "user_id", on: str = "ts",
              right_cols: tuple[str, ...] = ("event_type", "value"),
              suffix: str = "_r",
              tiebreak: str | None = None) -> DataFrame:
    """Backward as-of join: each left row gains the columns of the
    LATEST right row with the same *by* key and right.on <= left.on
    (inclusive); unmatched left rows keep NULLs.  Spark has no built-in
    as-of join — the naive emulation (range join + groupBy max + self
    join) shuffles the corpus three times and explodes on wide
    tolerance windows.

    This is the single-shuffle formulation: tag both sides, UNION, and
    run ONE window (partitionBy *by*, orderBy (*on*, side)) carrying the
    last non-null right payload forward — right rows sort BEFORE left
    rows at equal timestamps, so ties match inclusively.  Exactly one
    exchange keyed on *by* (high-cardinality, bounded per-key rate, the
    sessionize key discipline); payload rides as one struct column, so
    window state is O(1) per row regardless of how many right columns
    are carried.

    Determinism: when several right rows share (*by*, *on*), pass
    *tiebreak* (a right column ordered ascending; the LAST one wins) —
    otherwise which of the tied rows is carried is plan-dependent.
    The DuckDB oracle replays the same semantics with its native
    ``ASOF JOIN`` over a per-(by, on) deduped right side.
    """
    payload = F.struct(*[F.col(c).alias(c + suffix) for c in right_cols])
    r = right.select(
        F.col(by).alias(by), F.col(on).alias(on),
        F.lit(0).alias("_side"),
        (F.col(tiebreak) if tiebreak is not None
         else F.lit(0)).alias("_tb"),
        payload.alias("_payload"))
    left_cols = left.columns
    l = left.select(
        *left_cols, F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_tb"].dataType).alias("_tb"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"))
    # align schemas: left keeps all its columns; right rows carry NULLs
    # for the left-only columns (they are filtered out after the window)
    for c in left_cols:
        if c not in (by, on):
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    u = l.unionByName(r.select(*l.columns))
    w = (Window.partitionBy(by)
         .orderBy(F.col(on).asc(), F.col("_side").asc(), F.col("_tb").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = (u.withColumn("_m", F.last("_payload", ignorenulls=True)
                            .over(w))
               .filter(F.col("_side") == 1))
    return matched.select(
        *left_cols,
        *[F.col("_m")[c + suffix].alias(c + suffix) for c in right_cols])
