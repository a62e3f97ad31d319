"""Structured Streaming surface.

The reference is batch-only; its only incremental feature is the
segment-diff workflow (S4/S5+J13, man/osmcoastline_segments.md). We expose
that as a streaming-native pipeline: a stream of segment (or event) rows →
watermarked tumbling-window aggregation → append sink. The same windowed
aggregation has a batch twin (`windowed_counts_batch`) used by the DuckDB
oracle — streaming and batch share one logical plan, which is the
Structured Streaming contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts_batch(events: DataFrame, minutes: int = 60) -> DataFrame:
    """Batch twin of the streaming aggregation: tumbling window via
    date_trunc arithmetic (portable to the SQL oracle)."""
    bucket = F.to_timestamp(
        F.floor(F.unix_timestamp("ts") / (minutes * 60)) * (minutes * 60)
    )
    return (
        events.groupBy(bucket.alias("window_start"), F.col("event_type"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
    )


def windowed_counts_stream(stream: DataFrame, minutes: int = 60, watermark: str = "2 hours") -> DataFrame:
    """Streaming variant: watermark bounds state for late data."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", f"{minutes} minutes").alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )


def segment_stream_diff(stream: DataFrame, baseline: DataFrame) -> DataFrame:
    """Streaming change detection: incoming segments not present in the
    baseline snapshot (stream-static anti-join — Spark keeps the static side
    broadcast/fresh per micro-batch)."""
    return stream.join(baseline, ["x1", "y1", "x2", "y2"], "left_anti")


def stream_dedup_first_seen(stream: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Custom stateful operator (north-rule applyInPandasWithState surface):
    exact-dedup over an unbounded document stream — for each content hash,
    emit exactly ONE row (the first-seen doc id); duplicates arriving in
    any later micro-batch are swallowed by the keyed state.

    State per key is a single boolean-sized row, so state size is
    O(distinct hashes) — the streaming twin of dedup_exact's groupBy.
    """
    import pandas as pd

    hashed = stream.select(
        F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col).alias("doc_id")
    )

    def first_seen(key, pdfs, state):
        if state.exists:
            # hash already emitted in an earlier batch — swallow
            for _ in pdfs:
                pass
            return iter(())
        best = None
        for pdf in pdfs:
            if len(pdf):
                m = int(pdf["doc_id"].min())
                best = m if best is None else min(best, m)
        if best is None:
            return iter(())
        state.update((1,))
        return iter([pd.DataFrame({"content_hash": [key[0]], "keep_id": [best]})])

    return hashed.groupBy("content_hash").applyInPandasWithState(
        first_seen,
        outputStructType="content_hash string, keep_id long",
        stateStructType="seen int",
        outputMode="append",
        timeoutConf="NoTimeout",
    )
