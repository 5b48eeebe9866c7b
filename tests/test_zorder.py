"""Z-order clustering: multi-dimensional file skipping through icelite.

Single-column range clustering gives tight per-file min/max on ONE column;
``cluster_zorder`` interleaves the bits of several columns so every file
covers a small hyper-rectangle — predicates on ANY clustered column then
skip files via the fmt-2 stats.  The reference has no storage layer
(inputs are in-memory arrays, reference tests/test_pcm.py:10); this is
the engine's own Iceberg-semantics surface (rewrite_data_files zorder).
"""

import pytest
from pyspark.sql import functions as F

from hdstats_spark.icelite import IceliteTable, cluster_zorder

N = 20_000
FILES = 16


def _grid(spark):
    """Two independent uniform dimensions + a payload."""
    return spark.range(0, N, 1, 8).select(
        F.col("id").alias("rid"),
        (F.xxhash64(F.col("id")) % 1000).alias("x"),
        (F.xxhash64(F.col("id"), F.lit(1)) % 1000).alias("y"),
        (F.col("id") * 3).alias("v"),
        F.lit("p0").alias("day"),
    )


def test_zorder_preserves_content(spark):
    df = _grid(spark)
    zdf = cluster_zorder(df, ["x", "y"], nparts=FILES)
    assert sorted(zdf.columns) == sorted(df.columns)
    a = sorted(tuple(r) for r in df.collect())
    b = sorted(tuple(r) for r in zdf.collect())
    assert a == b


def test_zorder_skips_on_both_dimensions(spark, tmp_path):
    t = IceliteTable(str(tmp_path / "z"))
    t.overwrite_partitions(cluster_zorder(_grid(spark), ["x", "y"], nparts=FILES), "day", cluster="asis")
    # baseline: same data clustered on x only
    tx = IceliteTable(str(tmp_path / "x"))
    tx.overwrite_partitions(
        _grid(spark).repartitionByRange(FILES, "x"), "day", cluster="asis"
    )
    for tbl, name in ((t, "zorder"), (tx, "xrange")):
        n_files = tbl.snapshot().partitions["p0"]["files"]
        assert len(n_files) >= FILES // 2, (name, len(n_files))

    # x-slice: both layouts skip
    t.read(spark, where={"x": ("between", -1000, -751)}).count()
    zx = t.last_scan
    tx.read(spark, where={"x": ("between", -1000, -751)}).count()
    xx = tx.last_scan
    assert zx["files_read"] < zx["files_considered"] / 2, zx
    assert xx["files_read"] < xx["files_considered"] / 2, xx

    # y-slice: ONLY the z-ordered layout skips (x-clustered files all span y)
    t.read(spark, where={"y": ("between", -1000, -751)}).count()
    zy = t.last_scan
    tx.read(spark, where={"y": ("between", -1000, -751)}).count()
    xy = tx.last_scan
    assert zy["files_read"] < zy["files_considered"] / 2, zy
    assert xy["files_read"] == xy["files_considered"], xy

    # results identical regardless of layout
    a = t.read(spark, where={"y": ("between", -1000, -751)}).agg(
        F.count(F.lit(1)), F.sum("v")
    ).collect()
    b = tx.read(spark, where={"y": ("between", -1000, -751)}).agg(
        F.count(F.lit(1)), F.sum("v")
    ).collect()
    assert a == b


def test_compact_partition_zorder(spark, tmp_path):
    t = IceliteTable(str(tmp_path / "c"))
    # messy layout: random roundrobin files, no per-column locality
    t.overwrite_partitions(_grid(spark), "day", cluster="roundrobin")
    totals_before = t.read(spark).agg(F.count(F.lit(1)), F.sum("v")).collect()
    t.read(spark, where={"y": ("between", -1000, -751)}).count()
    before = t.last_scan
    assert before["files_read"] == before["files_considered"], before
    snap = t.compact_partition(
        spark, "day", "p0", target_files=FILES, cluster_col=["x", "y"]
    )
    assert snap is not None
    t.read(spark, where={"y": ("between", -1000, -751)}).count()
    after = t.last_scan
    assert after["files_read"] < after["files_considered"] / 2, after
    # content unchanged through the rewrite
    assert t.read(spark).agg(F.count(F.lit(1)), F.sum("v")).collect() == totals_before


def test_zorder_rejects_strings_and_wide_keys(spark):
    df = _grid(spark)
    with pytest.raises(ValueError):
        cluster_zorder(df, ["day"])  # string column
    with pytest.raises(ValueError):
        cluster_zorder(df, ["x", "y"], bits=32)  # 64 bits > 63
