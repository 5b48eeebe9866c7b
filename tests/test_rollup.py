"""Tier rollup correctness: raw→1m→1h→1d cascade + pandas cross-check."""

import numpy as np
import pandas as pd

from hdstats_spark.operators.channels import channelize
from hdstats_spark.operators.rollup import rollup_cascade, rollup_raw
from hdstats_spark.schema import CHANNELS


def test_datagen_deterministic(spark, transcripts):
    from hdstats_spark.datagen import gen_transcripts

    again = gen_transcripts(spark, n_convs=60, seed=42, short_max=30, hot_len=300)
    a = transcripts.orderBy("conv_id", "turn_idx").toPandas()
    b = again.orderBy("conv_id", "turn_idx").toPandas()
    pd.testing.assert_frame_equal(a, b)
    # per-turn text is a pure function of (conv_id, turn_idx) — the raw-tier
    # equality invariant of BASELINE.json input_hint
    assert a.text.str.startswith("turn ").all()
    assert (a.groupby("conv_id").turn_idx.apply(lambda s: (s.values == np.arange(len(s))).all())).all()
    # timestamps strictly ordered within conversation
    assert (a.groupby("conv_id").ts.apply(lambda s: s.is_monotonic_increasing)).all()


def test_rollup_matches_pandas(spark, transcripts):
    ch = channelize(transcripts)
    tier = rollup_raw(ch, "1m").toPandas()

    raw = channelize(transcripts).toPandas()
    raw["bucket"] = raw.ts.dt.floor("min")
    expect = (
        raw.assign(
            tokens_user=np.where(raw.role == "user", raw.tokens, 0),
            tokens_assistant=np.where(raw.role == "assistant", raw.tokens, 0),
            tokens_tool=np.where(raw.role == "tool", raw.tokens, 0),
            chars_user=np.where(raw.role == "user", raw.chars, 0),
            chars_assistant=np.where(raw.role == "assistant", raw.chars, 0),
            chars_tool=np.where(raw.role == "tool", raw.chars, 0),
            turn_rate=1,
            tool_calls=raw.is_tool_call,
        )
        .groupby(["conv_id", "bucket"], as_index=False)[list(CHANNELS)]
        .sum()
    )
    got = tier.sort_values(["conv_id", "bucket"]).reset_index(drop=True)
    exp = expect.sort_values(["conv_id", "bucket"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["conv_id", "bucket", *CHANNELS]].astype({c: "int64" for c in CHANNELS}),
        exp[["conv_id", "bucket", *CHANNELS]].astype({c: "int64" for c in CHANNELS}),
    )


def test_cascade_equals_direct(spark, transcripts):
    """1h from 1m ≡ 1h from raw; 1d from 1h ≡ 1d from raw (exactness of the
    re-aggregation — the retention-tier contract)."""
    ch = channelize(transcripts)
    t1m = rollup_raw(ch, "1m")
    for tier in ("1h", "1d"):
        via_cascade = (
            rollup_cascade(t1m, tier).orderBy("conv_id", "bucket").toPandas()
        )
        direct = rollup_raw(ch, tier).orderBy("conv_id", "bucket").toPandas()
        pd.testing.assert_frame_equal(via_cascade, direct)


def test_rollup_never_drops_turns(spark, transcripts):
    total_turns = transcripts.count()
    ch = channelize(transcripts)
    for tier in ("1m", "1h", "1d"):
        s = rollup_raw(ch, tier).groupBy().sum("turn_rate").collect()[0][0]
        assert s == total_turns
