"""Structured-Streaming ingest: transcripts arrive as a stream,
candidates/edges are extracted per micro-batch and appended to the
graph store via foreachBatch.

The reference's streaming mode is stage-wise delta flushing of a
batch build (builder/streaming.rs:15-86) — there are no event-time
windows or watermarks to replicate (SURVEY.md §2.10); the semantics
to preserve are IDEMPOTENT APPEND of per-batch deltas. Spark's
foreachBatch gives exactly that: each micro-batch is a normal
DataFrame, the full batch extraction pipeline runs on it, and the
sink append is keyed by batch_id for replay-safety (a retried batch
overwrites its own directory, not the store).

Event-time machinery (for pipelines that DO need late-data handling):
`windowed_turn_counts` shows the watermark + tumbling-window shape
over the transcript ts column.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import extract as X
from ..sources.transcripts import TRANSCRIPT_SCHEMA


def read_transcript_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream of transcript parquet drops (the sandbox
    stand-in for a Kafka/Iceberg incremental source)."""
    return spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(input_dir)


def mentions_stream_query(
    stream: DataFrame, out_dir: str, checkpoint_dir: str, available_now: bool = True
):
    """Extract mention candidates per micro-batch and append to a
    batch-id-keyed parquet store. Returns the StreamingQuery."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        out = X.extract_mentions(batch_df)
        # batch-id-keyed dir: a replayed batch overwrites itself ->
        # idempotent (streaming.rs delta-flush analog)
        out.write.mode("overwrite").parquet(os.path.join(out_dir, f"batch={batch_id}"))

    writer = stream.writeStream.foreachBatch(process).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_turn_counts(stream: DataFrame, watermark: str = "10 minutes", window: str = "1 hour") -> DataFrame:
    """Event-time tumbling-window turn counts with late-data bound —
    the watermarked stateful-agg shape for pipelines that need it."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), F.col("role"))
        .agg(F.count("*").alias("n_turns"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "role",
            "n_turns",
        )
    )


# ---------------------------------------------------------------------------
# Custom stateful operator: applyInPandasWithState
# ---------------------------------------------------------------------------

STATE_OUT_SCHEMA = "conv_id STRING, n_turns BIGINT, n_mentions BIGINT, max_turn_idx INT"
STATE_SCHEMA = "n_turns BIGINT, n_mentions BIGINT, max_turn_idx INT"


def _update_conv_state(key, pdfs, state):
    """Per-conversation session accumulator. Counters are
    order-insensitive, so the operator is deterministic regardless of
    how rows split across micro-batches."""
    import pandas as pd

    from ..operators.extract import MENTION_RE

    n_turns = 0
    n_mentions = 0
    max_turn = -1
    for pdf in pdfs:
        n_turns += len(pdf)
        n_mentions += int(pdf["text"].str.count(MENTION_RE).sum())
        max_turn = max(max_turn, int(pdf["turn_idx"].max()))
    if state.exists:
        pt, pm, pmax = state.get
        n_turns += pt
        n_mentions += pm
        max_turn = max(max_turn, pmax)
    state.update((n_turns, n_mentions, max_turn))
    yield pd.DataFrame(
        [
            {
                "conv_id": key[0],
                "n_turns": n_turns,
                "n_mentions": n_mentions,
                "max_turn_idx": max_turn,
            }
        ]
    )


def conversation_state(stream: DataFrame) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState):
    running per-conversation session state — turn count, raw mention
    occurrences, highest turn index — held in the state store across
    micro-batches and emitted as an update row whenever a
    conversation receives data. This is the surface for
    conversation-level accumulators that neither watermarked window
    aggs (event-time keyed) nor foreachBatch appends (stateless per
    batch) express. Arrow-batched; grouped by conv_id, so state
    shards partition exactly like the rest of the pipeline."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return stream.groupBy("conv_id").applyInPandasWithState(
        _update_conv_state,
        outputStructType=STATE_OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def conversation_state_query(
    stream: DataFrame, out_dir: str, checkpoint_dir: str, available_now: bool = True
):
    """Run conversation_state and append each batch's update rows to
    a batch-id-keyed parquet store (idempotent on replay); the latest
    row per conv_id is the current state."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch={batch_id}")
        )

    writer = (
        conversation_state(stream)
        .writeStream.outputMode("update")
        .foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
