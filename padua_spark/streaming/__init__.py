"""Structured Streaming surface.

The reference has no streaming (SURVEY.md §2.14) — this module is the
beyond-reference extension that makes the long model streaming-capable:
the measurements/events fact tables are append-only streams, and every
aggregation operator that is a single groupBy composes with event-time
windows + watermarks.

All builders below accept batch OR streaming DataFrames — the same
lazy plan runs under both engines, which is the Structured Streaming
design point (test batch, deploy streaming).
"""

from padua_spark.streaming.windows import (  # noqa: F401
    dedup_stream,
    interval_join,
    read_event_stream,
    sessionize_batch,
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
    js_hellinger_vs_reference,
    windowed_average_precision,
    windowed_pinball_loss,
    windowed_binned_auc,
    windowed_circular_stats,
    windowed_control_check,
    windowed_fairness_check,
    windowed_gains_table,
    windowed_srm,
    windowed_binned_gini,
    windowed_embedding_drift,
    windowed_cms_sketch,
    windowed_confusion,
    windowed_ddsketch,
    windowed_ece,
    windowed_novelty,
    windowed_quality_screen,
    windowed_token_counts,
    windowed_value_histogram,
)
