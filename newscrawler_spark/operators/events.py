"""Event-stream operators in their batch form: tumbling-window
aggregation and gap-based sessionization.

The reference is pure batch (SURVEY.md §2.9) — these are the engine's
stream-shaped surface, written so the identical expressions run under
Structured Streaming (`F.window` + watermark for the tumbling agg,
`session_window` for sessions) when fed a readStream source; in batch
they are ordinary shuffles on (key, window).

Scale notes: tumbling agg is one shuffle on (window, key) with map-side
partial aggregation; sessionization shuffles once on user_id and sorts
within partitions (window lag) — both AQE-coalesced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    minutes: int = 60,
) -> DataFrame:
    """Events per (tumbling window, key): (window_start, key, n, total_value)."""
    bucket = F.to_timestamp(
        F.from_unixtime(
            (F.unix_timestamp(ts_col) / (minutes * 60)).cast("bigint") * (minutes * 60)
        )
    )
    return (
        events.groupBy(
            bucket.alias("window_start"), F.col(key_col).alias("key")
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
    )


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Gap-based sessions: a new session starts when the previous event
    of the same user is more than `gap_minutes` older.

    Returns (user_id, session_id, n_events, session_start, session_end)
    with session_id = running session ordinal per user (1-based).
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc(), F.col("event_id").asc())
    gap = F.unix_timestamp(ts_col) - F.unix_timestamp(F.lag(ts_col).over(w))
    new_session = F.when(
        gap.isNull() | (gap > gap_minutes * 60), F.lit(1)
    ).otherwise(F.lit(0))
    sessioned = events.withColumn(
        "session_id",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        sessioned.groupBy(F.col(user_col).alias("user_id"), "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
    )
