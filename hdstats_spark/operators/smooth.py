"""Wiener smoothing as a Spark operator (reference `smooth`,
tsslow.py:29-30 → scipy.signal.wiener with window (1,1,k)).

Pure window-function expression of the filter:
  * local mean / local power = zero-padded k-window sums ÷ k — Spark's
    bounded rowsBetween frame sums fewer terms at series edges, which is
    exactly scipy's zero padding when divided by the constant k;
  * noise = the GLOBAL mean of local variances across the whole frame (the
    reference smooths one stacked array, so noise pools over all series) —
    kept lazy via a broadcast cross join of the 1-row aggregate;
  * output = lMean where lVar < noise else lMean + (1 − noise/lVar)(x − lMean).

One shuffle on the series key (shared with every other per-series window),
plus one scalar aggregate.  try_divide keeps ANSI mode on: a constant frame
(noise = lVar = 0) yields NULL exactly where the reference yields NaN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def wiener_smooth(
    df: DataFrame,
    value_col: str,
    k: int = 3,
    order_col: str = "bucket",
    key_col: str = "conv_id",
    out_col: str | None = None,
) -> DataFrame:
    if k % 2 != 1:
        raise ValueError("window size k must be odd")
    h = k // 2
    w = Window.partitionBy(key_col).orderBy(order_col).rowsBetween(-h, h)
    v = F.col(value_col).cast("double")
    lmean = F.sum(v).over(w) / k
    lpow = F.sum(v * v).over(w) / k
    staged = df.withColumn("_lm", lmean).withColumn("_lv", lpow - F.col("_lm") * F.col("_lm"))
    noise = staged.agg(F.avg("_lv").alias("_noise"))
    out = out_col or f"{value_col}_smooth"
    res = (v - F.col("_lm")) * (
        F.lit(1.0) - F.try_divide(F.col("_noise"), F.col("_lv"))
    ) + F.col("_lm")
    return (
        staged.crossJoin(F.broadcast(noise))
        .withColumn(out, F.when(F.col("_lv") < F.col("_noise"), F.col("_lm")).otherwise(res))
        .drop("_lm", "_lv", "_noise")
    )
