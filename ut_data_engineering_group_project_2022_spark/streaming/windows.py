"""Event-time windowed aggregations for streams (SURVEY §2.11 extension;
the reference has no event-time semantics — time there is only cron
cadence — so these are the engine's additive streaming surface, the
batch twins of which are registered as oracle-checked queries:
op_tumbling_hourly, op_sessionize).

All builders take a *streaming* DataFrame of the events shape
(ts timestamp, user_id long, event_type string, value double) and
return a windowed aggregate stream:

  * `tumbling_counts`  — fixed windows, count + value sum per type;
  * `sliding_value_sums` — overlapping windows (slide < width);
  * `session_counts`   — gap-based session windows per user
    (`F.session_window`, the Structured Streaming native analog of the
    batch lag/cumsum sessionization in op_sessionize).

Watermarks bound state: late rows beyond the watermark are dropped and
closed windows are evicted — the knob that makes unbounded streams run
in bounded memory on a cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame, width: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling event-time windows: count + exact value sum per
    (window, event_type). Batch twin: op_tumbling_hourly."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sliding_value_sums(
    events: DataFrame,
    width: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding windows (each event lands in width/slide windows)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width, slide).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n",
            "total_value",
        )
    )


def session_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Gap-based session windows per user: a session closes after `gap`
    of inactivity. Streaming-native analog of op_sessionize's batch
    lag+cumsum formulation."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )
