"""Gap-based event sessionization — the standard activity-stream
rollup (a training-data pipeline slices interaction logs into sessions
before building per-session examples; an analytics user reads
session counts/durations directly).

A session is a maximal run of a user's events where consecutive gaps
are <= ``gap_sec``. The classic two-step: flag session starts with a
lag() window, then prefix-sum the flags into a per-user session
sequence number — both over ONE user-keyed window partition, so the
whole operator costs a single exchange (the final groupBy keys
(user_id, session_seq) are clustered by the window's user_id
partitioning; Catalyst adds no second shuffle, partial aggregation
handles the rest).

Exactness: gaps compare in integer MICROSECONDS (Spark
``unix_micros``, DuckDB ``epoch_us`` — both BIGINT), so the session
boundaries and every output column are engine-exact; ordering ties on
equal timestamps break by event_id. At 100 TB the only skew risk is a
power-user partition; the window is per-user sequential by definition
(sessionization is order-dependent), matching how every engine
implements it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize_events(events: DataFrame, gap_sec: int = 1800) -> DataFrame:
    """Returns one row per session: DF(user_id, session_seq BIGINT
    (1-based per user, in time order), n_events BIGINT, first_event_id
    BIGINT, start_ts, end_ts, duration_us BIGINT)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # unix_micros requires zoned TIMESTAMP; parquet NTZ columns cast
    # inside the arithmetic only (gaps/durations are tz-invariant),
    # output ts columns keep their source type
    us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    flagged = events.select(
        "user_id",
        "event_id",
        "ts",
        (
            F.coalesce(
                (
                    us(F.col("ts")) - us(F.lag("ts").over(w))
                    > F.lit(int(gap_sec) * 1_000_000)
                ).cast("long"),
                F.lit(1),
            )
        ).alias("new_session"),
    ).withColumn(
        "session_seq",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        flagged.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("event_id").alias("first_event_id"),
            F.min("ts").alias("start_ts"),
            F.max("ts").alias("end_ts"),
            (F.max(us(F.col("ts"))) - F.min(us(F.col("ts")))).alias(
                "duration_us"
            ),
        )
        .orderBy("user_id", "session_seq")
    )


def sessionize_sql(gap_sec: int = 1800) -> str:
    """DuckDB oracle for :func:`sessionize_events` — identical integer
    microsecond gap arithmetic over the events view."""
    gap_us = int(gap_sec) * 1_000_000
    return (
        "WITH flagged AS (SELECT user_id, event_id, ts,"
        " CASE WHEN lag(ts) OVER w IS NULL THEN 1"
        f" WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > {gap_us} THEN 1"
        " ELSE 0 END AS new_session"
        " FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),"
        " seq AS (SELECT user_id, event_id, ts,"
        " SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id"
        "  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq"
        " FROM flagged)"
        " SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,"
        " COUNT(*)::BIGINT AS n_events,"
        " MIN(event_id)::BIGINT AS first_event_id,"
        " MIN(ts) AS start_ts, MAX(ts) AS end_ts,"
        " CAST(MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS BIGINT) AS duration_us"
        " FROM seq GROUP BY user_id, session_seq ORDER BY user_id, session_seq"
    )
