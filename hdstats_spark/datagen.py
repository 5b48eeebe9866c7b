"""Deterministic distributed synthetic transcript generator (FIXTURES.md F1).

Everything is a pure JVM-side column expression over ``spark.range`` — no
driver-side loops, no Python UDFs, no randomness source other than
``xxhash64`` of the keys, so the same (n_convs, seed) always yields the same
table at any parallelism and any scale.  Skew is deliberate: ~1% of
conversations are "hot" (up to ``hot_len`` turns) to exercise the salting /
AQE paths.

Timestamps are a closed-form monotone function of (conv_id, turn_idx):
a 15 s base cadence, ±12 s hash jitter (strictly smaller than the cadence so
order is preserved), a 15-minute hole every 40 turns (exercises gap-fill),
and several turns per minute (exercises 1m rollups).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
    "lima mike november oscar papa quebec romeo sierra tango uniform victor"
).split()

_TOOLS = ("search", "calculator", "browser", "python", "sql", "files", "email", "weather")

EPOCH = "2024-01-01 00:00:00"


def gen_transcripts(
    spark: SparkSession,
    n_convs: int = 1000,
    seed: int = 42,
    short_max: int = 40,
    hot_len: int = 2000,
    partitions: int | None = None,
) -> DataFrame:
    """Generate transcripts(conv_id, turn_idx, role, text, tool, ts)."""
    parts = partitions or spark.sparkContext.defaultParallelism
    convs = (
        spark.range(0, n_convs, 1, parts)
        .select(
            F.format_string("c%08d", F.col("id")).alias("conv_id"),
            F.xxhash64(F.lit(seed), F.col("id")).alias("h"),
        )
        .withColumn(
            "conv_len",
            F.when(
                F.pmod("h", F.lit(100)) == 0,  # ~1% hot conversations
                (F.pmod(F.xxhash64(F.lit("hot"), "h"), F.lit(hot_len - short_max)) + short_max).cast("int"),
            ).otherwise((F.pmod(F.xxhash64(F.lit("len"), "h"), F.lit(short_max - 4)) + 5).cast("int")),
        )
        .withColumn("start_s", F.pmod(F.xxhash64(F.lit("start"), "h"), F.lit(30 * 24 * 3600)))
    )

    turns = convs.select(
        "conv_id",
        "start_s",
        F.explode(F.sequence(F.lit(0), F.col("conv_len") - 1)).alias("turn_idx"),
    )

    th = F.xxhash64(F.lit(seed), "conv_id", "turn_idx")
    is_tool = F.pmod(th, F.lit(7)) == 0
    role = F.when(is_tool, F.lit("tool")).otherwise(
        F.when(F.pmod("turn_idx", F.lit(2)) == 0, F.lit("user")).otherwise(F.lit("assistant"))
    )
    # word count 1..200 from the hash; words chosen by a per-position hash
    wc = (F.pmod(F.xxhash64(F.lit("wc"), th), F.lit(200)) + 1).cast("int")
    words = F.transform(
        F.sequence(F.lit(1), wc),
        lambda i: F.element_at(
            F.array(*[F.lit(w) for w in _WORDS]),
            (F.pmod(F.xxhash64(th, i), F.lit(len(_WORDS))) + 1).cast("int"),
        ),
    )
    text = F.concat(
        F.format_string("turn %d of ", F.col("turn_idx")),
        F.col("conv_id"),
        F.lit(": "),
        F.array_join(words, " "),
    )
    tool = F.when(
        is_tool,
        F.element_at(
            F.array(*[F.lit(t) for t in _TOOLS]),
            (F.pmod(F.xxhash64(F.lit("tool"), th), F.lit(len(_TOOLS))) + 1).cast("int"),
        ),
    )
    # monotone closed-form timestamp: 15s cadence + <15s jitter + minute holes
    offset_s = (
        F.col("turn_idx") * 15
        + F.pmod(F.xxhash64(F.lit("jit"), th), F.lit(13))
        + F.floor(F.col("turn_idx") / 40) * 900
    )
    ts = F.timestamp_seconds(F.unix_timestamp(F.lit(EPOCH).cast("timestamp")) + F.col("start_s") + offset_s)

    return turns.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    )
