"""Focused tests for the round-7 second-pass optimization internals:

* the fused MOR delete-class scan (one reader + one anti join per key
  set) must be row-for-row identical to the exact per-class loop it
  replaced, and must refuse (fall back) when per-file attribution is
  infeasible;
* kmeans_codebook's footer-bounded count skip must produce a
  bit-identical codebook;
* _parquet_col_max must equal the Spark aggregate it replaces;
* the memoized base-table reader and the same-plan cache retention must
  reuse (not rebuild) identical plans and still distinguish different
  ones.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def _mk_mor_table(spark, tmp_path):
    """Partitioned table with two pending-delete commits using DIFFERENT
    key-column sets, so the scan plan has several delete-equivalence
    classes and more than one anti-join group."""
    from hdstats_spark.icelite import IceliteTable

    rows = [
        (i, f"p{i % 3}", i % 7, float(i))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "id long, pt string, k2 long, v double")
    t = IceliteTable(str(tmp_path / "fused"))
    t.overwrite_partitions(df, "pt", cluster="bypart")
    up = df.filter(F.col("id") % 4 == 0).withColumn("v", -F.col("v"))
    t.upsert(up, key_cols=["id"], partition_col="pt", cluster="bypart")
    t.delete_by_keys(
        spark.createDataFrame([(2,), (5,)], "k2 long"), key_cols=["k2"]
    )
    return t


def _collect_sorted(df):
    return sorted(tuple(r) for r in df.collect())


def test_fused_scan_equals_per_class_loop(spark, tmp_path):
    from hdstats_spark.icelite import IceliteTable

    t = _mk_mor_table(spark, tmp_path)
    snap, classes, dentries, _ = t._plan_scan(None, None, None, None)
    assert len(classes) > 1, "scenario must produce multiple classes"
    keysets = {tuple(dentries[p]["keys"]) for key in classes for p in key}
    assert len(keysets) > 1, "scenario must produce multiple key-column sets"

    fused = t._fused_delete_scan(spark, snap, classes, dentries)
    assert fused is not None, "attribution must be feasible here"

    # exact per-class ground truth: force the fused path off and read
    orig = IceliteTable._fused_delete_scan
    try:
        IceliteTable._fused_delete_scan = lambda self, *a, **kw: None
        loop_rows = _collect_sorted(t.read(spark))
    finally:
        IceliteTable._fused_delete_scan = orig
    assert _collect_sorted(fused) == loop_rows
    assert _collect_sorted(t.read(spark)) == loop_rows

    # read_with_partition: fused _partition attribution vs the slow loop
    rwp = t.read_with_partition(spark)
    slow = t._read_with_partition_slow(spark, None, None)
    assert _collect_sorted(rwp) == _collect_sorted(slow)


def test_fused_scan_refuses_infeasible_attribution(spark, tmp_path):
    t = _mk_mor_table(spark, tmp_path)
    snap, classes, dentries, _ = t._plan_scan(None, None, None, None)
    # >64 files in one reader
    many = {(): [f"d/p{i}.parquet" for i in range(65)]}
    assert t._fused_delete_scan(spark, snap, many, {}) is None
    # tail-2 collision across partitions
    coll = {(): ["a/dup.parquet"], ("x",): ["b/../a/dup.parquet"]}
    assert t._fused_delete_scan(spark, snap, coll, {"x": {"keys": ["id"]}}) is None


def test_codebook_n_upper_bit_identical(spark):
    from hdstats_spark.operators.simsearch import kmeans_codebook

    rng = np.random.default_rng(3)
    rows = [(i, rng.standard_normal(8).tolist()) for i in range(50)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    C_counted = kmeans_codebook(e, 4, sample=200)
    C_hinted = kmeans_codebook(e, 4, sample=200, n_upper=50)
    assert np.array_equal(C_counted, C_hinted)


def test_parquet_col_max_matches_scan(spark, tmp_path):
    from hdstats_spark.driver_queries import _parquet_col_max

    p = str(tmp_path / "stats.parquet")
    spark.range(0, 1000).withColumn("x", F.col("id") * 3 - 17).write.parquet(p)
    assert _parquet_col_max(p, "x") == spark.read.parquet(p).agg(F.max("x")).collect()[0][0]
    assert _parquet_col_max(p, "nope") is None


def test_t_memo_reuses_reader_per_session(spark, tmp_path):
    from hdstats_spark.driver_queries import _t

    d = tmp_path / "tbl.parquet"
    spark.range(5).write.parquet(str(d))
    a = _t(spark, str(tmp_path), "tbl")
    b = _t(spark, str(tmp_path), "tbl")
    assert a is b  # memoized lazy plan, not a rebuilt reader
    assert a.count() == 5  # still executes against the files


def test_swap_cache_keeps_identical_plan_only(spark):
    from hdstats_spark.operators.dedup import _swap_cache

    base = spark.range(100).withColumn("y", F.col("id") % 10)
    first = _swap_cache("__test_swap", base)
    again = _swap_cache("__test_swap", spark.range(100).withColumn("y", F.col("id") % 10))
    assert again is first  # same plan: warm cache retained
    other = _swap_cache("__test_swap", spark.range(101).withColumn("y", F.col("id") % 10))
    assert other is not first  # different plan: swapped as before
    other.unpersist()
