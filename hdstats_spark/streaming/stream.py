"""Streaming 1m tier: transcripts stream → watermarked tumbling-window
continuous aggregate.

The batch engine treats late turns by re-rolling day partitions
(TierPipeline.reroll_days); this surface handles them online instead:
`withWatermark(ts, …)` bounds state, a 1-minute tumbling `window()` produces
the same channel sums as rollup_raw, and the sink is append-mode so each
bucket is emitted exactly once when its watermark passes — an Iceberg/parquet
append per micro-batch commit.

The aggregation expressions are shared with the batch path (same semantics,
one definition — rollup channels), so streamed buckets equal batch buckets
for on-time data (tested in tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.channels import channelize
from ..schema import TRANSCRIPT_SCHEMA


def stream_transcripts_from_dir(spark: SparkSession, path: str, max_files: int = 1) -> DataFrame:
    """File-based transcript stream (each new parquet file = one micro-batch
    of arriving turns)."""
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def streaming_rollup_1m(transcripts_stream: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Watermarked 1-minute tumbling rollup with the batch tier's channels."""
    ch = channelize(transcripts_stream)
    agg = (
        ch.withWatermark("ts", watermark)
        .groupBy(F.col("conv_id"), F.window("ts", "1 minute").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("turn_rate"),
            F.sum(F.when(F.col("role") == "user", F.col("tokens")).otherwise(0)).alias("tokens_user"),
            F.sum(F.when(F.col("role") == "assistant", F.col("tokens")).otherwise(0)).alias("tokens_assistant"),
            F.sum(F.when(F.col("role") == "tool", F.col("tokens")).otherwise(0)).alias("tokens_tool"),
            F.sum(F.when(F.col("role") == "user", F.col("chars")).otherwise(0)).alias("chars_user"),
            F.sum(F.when(F.col("role") == "assistant", F.col("chars")).otherwise(0)).alias("chars_assistant"),
            F.sum(F.when(F.col("role") == "tool", F.col("chars")).otherwise(0)).alias("chars_tool"),
            F.sum("is_tool_call").alias("tool_calls"),
        )
    )
    return agg.select("conv_id", F.col("w.start").alias("bucket"), *[c for c in agg.columns if c not in ("conv_id", "w")])


def run_stream_to_memory(
    spark: SparkSession, src_dir: str, checkpoint: str, name: str = "tier_1m_stream",
    watermark: str = "10 minutes",
):
    """Drive the streaming rollup into an in-memory sink (tests / demos);
    production swaps the sink for an Iceberg/parquet append."""
    out = streaming_rollup_1m(stream_transcripts_from_dir(spark, src_dir), watermark)
    return (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .start()
    )
