"""Event-time windowed aggregation (SURVEY §2.3 T4-T7) — the streaming
counterparts of catalog queries q39 (tumbling), q32 (sliding), q40
(sessions).

Each builder takes ANY events DataFrame — batch or streaming — because
``window()``/``session_window()`` are plain Catalyst expressions; only
the watermark is stream-specific (ignored in batch mode). That's the
design point: one definition, verified in batch against the DuckDB
oracle, executed incrementally under readStream with late-data bounds.

The reference itself has no true streaming (its poll loop is
incremental batch, /root/reference/README.md:81,145); these are the
EXT operators plus the watermark/late-data machinery the reference
never needed (SURVEY §2.3: "no watermarks, no event-time windows").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..engine.det import dsum


def tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """T4: non-overlapping event-time buckets; count + exact DECIMAL sum
    per (window, event_type). State per open window is one partial agg
    row — bounded by the watermark horizon."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return src.groupBy(F.window("ts", window).alias("w"), "event_type").agg(
        F.count(F.lit(1)).alias("cnt"), dsum("value", "sum_value")
    )


def sliding_counts(
    events: DataFrame,
    window: str = "2 hours",
    slide: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """T5: overlapping buckets (each event lands in window/slide
    buckets). The batch RANGE-frame variant is q32; this form is the
    one that runs incrementally."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return src.groupBy(F.window("ts", window, slide).alias("w"), "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def sessionized_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """T6: per-user sessions with a 30-minute inactivity gap —
    ``session_window`` merges overlapping per-event windows in state.
    Batch twin: q40's gaps-and-islands. Output: one row per closed
    session with its span and event count."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return src.groupBy(F.session_window("ts", gap).alias("w"), "user_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
