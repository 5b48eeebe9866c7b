"""Full training-data lakehouse lifecycle in one flow — every round-6
storage capability composed end-to-end:

stage a corpus drop on a BRANCH → QC it (Gopher repetition filter over
the branch read) → FAST-FORWARD publish → CDC changelog materializes a
downstream table → MAINTAIN compacts → TAG the release → EXPIRE — and
every intermediate contract (main isolation, replay equivalence,
tag-pinned reads) holds at each step.  Individually each feature has its
own suite; this guards their COMPOSITION.
"""

from pyspark.sql import functions as F

from hdstats_spark.icelite import IceliteTable
from hdstats_spark.operators.textstats import repetition_stats


_SENTENCE = (
    "the quick brown fox jumps over a lazy dog while seven wizards "
    "brew black quartz potions and judge my vow with sixty distinct tokens"
)


def _docs(spark, lo, hi, words=_SENTENCE):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit(words + " doc"), F.col("id").cast("string")).alias("text"),
        F.concat(F.lit("d"), (F.col("id") % 2).cast("string")).alias("day"),
    )


def test_stage_qc_publish_cdc_maintain_tag_expire(spark, tmp_path):
    corpus = IceliteTable(str(tmp_path / "corpus"))
    derived = IceliteTable(str(tmp_path / "derived"))

    # bootstrap corpus + initial derived materialization point
    corpus.append(_docs(spark, 0, 40), partition_col="day")
    base = corpus.snapshot()

    # ---- stage: a new drop lands on a branch; 5 junk docs ride along
    corpus.create_branch("drop-2026-08")
    junk = spark.range(1000, 1005).select(
        F.col("id").alias("doc_id"),
        F.lit("spam spam spam spam spam spam spam spam").alias("text"),
        F.lit("d0").alias("day"),
    )
    corpus.append(
        _docs(spark, 40, 80).unionByName(junk),
        partition_col="day",
        branch="drop-2026-08",
    )
    assert corpus.rows() == 40  # main untouched

    # ---- audit: Gopher repetition QC over the BRANCH read finds the junk
    staged = corpus.read(spark, ref="drop-2026-08")
    qc = repetition_stats(staged)
    bad = [r.doc_id for r in qc.filter(F.col("keep") == 0).collect()]
    assert sorted(bad) == [1000, 1001, 1002, 1003, 1004]
    # publish, then quarantine the flagged docs with a MOR key delete
    # (main must not move before fast_forward — WAP ordering)
    corpus.fast_forward("drop-2026-08")
    corpus.drop_branch("drop-2026-08")
    corpus.delete_by_keys(
        spark.createDataFrame([(i,) for i in bad], "doc_id long"),
        key_cols=["doc_id"],
    )
    assert corpus.rows() == 85  # physical: junk masked at read, not rewritten
    assert corpus.read(spark).count() == 80  # logical

    # ---- CDC: materialize the changes since `base` into the derived table
    # the partition column lives in manifest keys: CDC surfaces it as
    # _partition; plain reads re-derive it for the downstream write
    ch = corpus.changes_between(spark, base.snapshot_id)
    ins = ch.filter(F.col("_change_type") == "insert").select(
        "doc_id", "text", F.col("_partition").alias("day")
    )
    dels = ch.filter(F.col("_change_type") == "delete").select("doc_id")
    day = F.concat(F.lit("d"), (F.col("doc_id") % 2).cast("string"))
    derived.append(
        corpus.read(spark, snapshot_id=base.snapshot_id).withColumn("day", day),
        partition_col="day",
    )
    derived.append(
        ins.join(dels, "doc_id", "left_anti"), partition_col="day"
    )  # net-apply: inserts minus deleted-in-range
    got = sorted(r.doc_id for r in derived.read(spark).collect())
    want = sorted(r.doc_id for r in corpus.read(spark).collect())
    assert got == want == list(range(80))

    # ---- maintain: compaction materializes the MOR backlog
    res = corpus.maintain(spark, max_files=1, max_delete_files=0)
    assert "d0" in res["compacted"]
    assert corpus.pending_deletes() == {}
    assert corpus.read(spark).count() == 80

    # ---- tag the release, expire history: the tag pins its snapshot
    corpus.create_tag("release-1")
    rel = corpus.read(spark, ref="release-1").count()
    corpus.append(_docs(spark, 80, 90), partition_col="day")
    corpus.expire_snapshots(keep_last=1)
    assert corpus.read(spark, ref="release-1").count() == rel == 80
    assert corpus.read(spark).count() == 90
