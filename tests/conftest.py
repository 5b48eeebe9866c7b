import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from hdstats_spark.session import get_spark

    s = get_spark(app="hdstats-tests", cores=8, shuffle_partitions=8, driver_memory="8g")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def transcripts(spark):
    """Small deterministic transcript table, cached for the whole session."""
    from hdstats_spark.datagen import gen_transcripts

    df = gen_transcripts(spark, n_convs=60, seed=42, short_max=30, hot_len=300)
    df = df.cache()
    df.count()
    return df
