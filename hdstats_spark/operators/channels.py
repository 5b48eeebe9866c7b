"""Channelization: transcripts → per-turn channel columns.

All whole-stage-codegen-friendly built-in expressions (no Python in the hot
path): token counts from a whitespace split, char counts from length(),
per-role splits via conditional aggregation fodder.  This is the engine
analogue of the reference's band-derivation slicing
(/root/reference/tests/test_ts.py:10).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def token_count(col: Column) -> Column:
    """Whitespace token count; empty/blank text counts 0 tokens."""
    trimmed = F.trim(col)
    return F.when(trimmed == "", F.lit(0)).otherwise(F.size(F.split(trimmed, r"\s+"))).cast("long")


def channelize(transcripts: DataFrame) -> DataFrame:
    """Add per-turn measure columns used by every tier rollup."""
    return transcripts.select(
        "conv_id",
        "turn_idx",
        "role",
        "ts",
        token_count(F.col("text")).alias("tokens"),
        F.length("text").cast("long").alias("chars"),
        F.col("tool").isNotNull().cast("long").alias("is_tool_call"),
    )
