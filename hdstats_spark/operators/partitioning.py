"""Scale-adaptive parallelism floor for CPU-heavy operator heads.

The corpus/embedding operators open with per-row CPU work — n-gram
explodes, mapInPandas/mapInArrow kernels, regex batteries — that Spark
runs INSIDE the scan stage.  Locally a small table is one parquet split
(single row group), so that whole head executes on ONE core; on a real
cluster the same tables arrive as thousands of splits and no fix is
needed.  ``ensure_min_partitions`` bridges both: it round-robins the
input up to the session's default parallelism ONLY when the existing
partitioning is below it (guide §2.4 warns against unconditional
``repartition(n)`` "for parallelism" — this one is conditional and
therefore a no-op at scale), trading one narrow exchange of the raw rows
for full-width execution of everything above it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_partitions(df: DataFrame, parallelism: int | None = None) -> DataFrame:
    sc = df.sparkSession.sparkContext
    par = parallelism or sc.defaultParallelism
    try:
        cur = df.rdd.getNumPartitions()
    except Exception:
        return df  # e.g. connect-mode plans with no RDD view: leave as-is
    return df.repartition(par) if cur < par else df
