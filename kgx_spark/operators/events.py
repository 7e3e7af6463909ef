"""Event-stream aggregations over the events table.

Not in the reference (KGX's 'stream' is bounded record iteration —
SURVEY.md §2.8); these are the event-time operators a continuous ingest of
crawl/extraction telemetry needs: tumbling-window rollups and
sessionization. Batch and Structured Streaming share the same expressions —
`windowed_counts` works on a `readStream` DataFrame unchanged (plus a
`withWatermark` for late data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def windowed_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    ts_col: str = "ts",
    group_col: str = "event_type",
    watermark: str | None = None,
    slide_duration: str | None = None,
) -> DataFrame:
    """Tumbling (default) or SLIDING window counts + value sum per group —
    pass ``slide_duration`` < ``window_duration`` for overlapping windows
    (each event contributes to width/slide windows).

    → (window_start, event_type, n_events, sum_value_1e2). Streaming-safe:
    pass watermark to bound state for late data.
    """
    df = events
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    w = F.window(F.col(ts_col), window_duration, slide_duration or window_duration)
    return (
        df.groupBy(w.alias("w"), F.col(group_col))
        .agg(
            F.count("*").alias("n_events"),
            # round each value BEFORE summing: integer sums are order-free,
            # so the result is identical across partitionings and engines
            F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias("sum_value_1e2"),
        )
        .select(F.col("w.start").alias("window_start"), group_col, "n_events", "sum_value_1e2")
    )


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Gap-based sessionization: lag + cumulative-sum-of-breaks
    (the batch classic; streaming uses session_window).

    → (user_id, session_id, session_start, n_events).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, "event_id")  # tiebreak: deterministic
    # cast via timestamp (session TZ pinned to UTC) — TIMESTAMP_NTZ has no
    # direct long cast
    epoch = F.col(ts_col).cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    with_break = events.withColumn(
        "_new_session", F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    )
    with_sid = with_break.withColumn(
        "session_seq", F.sum("_new_session").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        with_sid.groupBy(user_col, "session_seq")
        .agg(F.min(ts_col).alias("session_start"), F.count("*").alias("n_events"))
        .select(user_col, "session_seq", "session_start", "n_events")
    )
