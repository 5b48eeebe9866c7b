"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship pipeline on sf0.001: events → transcript-style 1m
               rollup → dense gap-fill → per-series geometric median
               composite (the reference's nangeomedian_pcm recast as a
               continuous aggregate, SURVEY.md §3.1).
queries()    — one entry per implemented operator (SURVEY.md §2), each
               (spark, sf_dir) → DataFrame.
oracle_sql() — DuckDB-equivalent SQL for every SQL-expressible query.
               Every kernel family also carries a degenerate-exact
               hash-green mirror (geomedian_1d, dtw_diag/diag_path,
               discordance_lp_identity, fourier_const_bands,
               number_peaks_w1, symmetry_vs_median, *_poly, *_exact) that
               drives the REAL kernel through a provably-SQL-expressible
               setting; the scale-default variants stay rows-only here +
               pytest parity vs hdstats_oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)
# kernel UDF closures import hdstats_oracle/hdstats_spark on the WORKERS:
# exporting PYTHONPATH here (import time, normally before the JVM launches)
# makes the packages importable in worker processes whatever session the
# caller builds; cluster deployments ship them via spark-submit --py-files
_pp = os.environ.get("PYTHONPATH", "")
if _REPO not in _pp.split(os.pathsep):
    os.environ["PYTHONPATH"] = _REPO + (os.pathsep + _pp if _pp else "")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from pyspark.sql import functions as F

    from hdstats_spark.driver_queries import _event_buckets
    from hdstats_spark.operators.gapfill import completion, densify
    from hdstats_spark.operators.series import geomedian_mads_flat

    sf_dir = "/root/testdata/sf0.001"
    channels = ["cnt_click", "cnt_view", "cnt_purchase", "cnt_signup", "cnt_error", "v_sum", "v_max", "n_events"]
    tier = _event_buckets(spark, sf_dir, "hour").withColumnRenamed("user_id", "conv_id")
    tier = tier.withColumn("conv_id", F.col("conv_id").cast("string"))
    dense = completion(densify(tier, "1h", channels), channels)
    # flat zero-copy mapInArrow path — the composite-tier build path at scale
    # (bit-identical to the series_table variant, test_kernels_spark)
    return geomedian_mads_flat(dense, channels)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from hdstats_spark import driver_queries as dq

    return dq.queries()


def oracle_sql() -> dict[str, str]:
    from hdstats_spark import driver_queries as dq

    return dq.oracles()
