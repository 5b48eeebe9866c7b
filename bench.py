"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "points_per_sec": ...}

Every query is forced through a noop sink so the full plan (including
projections the optimizer would prune under count()) executes.

``--repeat N`` (or $SPARK_GRAFT_REPEAT) runs each query N times and records
the PER-QUERY minimum: this box's ±20-30% load variance swamps single-run
per-query deltas, and a per-suite best-of-2 still mixes cold and warm
queries within each run — per-query min is the noise-disciplined mode for
cross-round regression calls.  DEFAULT N=2 since round 6: the driver's
flagless gate bench used to record N=1 single-runs, which made the round
record depend on coincident box load (round 5's uniform ~1.21× "regression"
was exactly that).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "rollup_1m",
    "rollup_1h_cascade",
    "rollup_1d_cascade",
    "derived_measures",
    "gapfill_locf",
    "gapfill_completion",
    "change_features",
    "complexity",
    "wiener_smooth",
    "mad_vs_centroid",
    "sessionize",
    "session_concurrency",
    "events_rollup_totals",
    "events_pivot",
    "asof_join_events",
    "pricing_summary",
    "top_customers",
    "doc_stats",
    "exact_dedup",
    # r6: Gopher-style repetition filtering (top/dup n-gram fractions +
    # keep decision) — hash-checked vs an n-gram SQL oracle
    "gopher_repetition",
    "gopher_repetition_shuffle",
    "fingerprint",
    "corpus_filter",
    # r5: benchmark decontamination (broadcast dirty-ngram set, map-only
    # corpus probe) — hash-checked at sf0.01
    "decontaminate",
    # r6: the bounded-memory Bloom dirty-set variant (bit-identical result;
    # benched so the Bloom build + re-verify overhead has a history)
    "decontaminate_bloom",
    "lang_id",
    "knn_cosine",
    "embedding_centroids",
    "embedding_dups",
    "embedding_dups_lsh",
    "dist_to_centroid",
    "geomedian_1d",
    "geomedian_mads",
    "symmetry",
    "fourier_features",
    "discordance",
    "dtw_area",
    "area_warp",
    "area_l1_to_median",
    "dtw_diag",
    "dtw_diag_path",
    "symmetry_vs_median",
    # r4 degenerate-exact mirrors: both drive the REAL batched FFT kernels
    # (identity low-pass / constant spectrum), hash-checked at sf0.01
    "discordance_lp_identity",
    "discordance_fixed16",
    "topk_users",
    "fourier_const_bands",
    # r5 NON-degenerate fourier mirror: real spectra, fixed-L cohort, naive
    # inlined-constant DFT oracle — hash-checked at all three sf dirs
    "fourier_fixed16",
    # r6 NON-degenerate MAD mirror: first-15-observed daily cohort at p=1
    # through the real Weiszfeld+mads kernels — hash-checked at all sf dirs
    "mads_fixed_p1",
    "number_peaks_w1",
    "minhash_lsh_poly",
    "simhash_poly",
    # degenerate-exact mirrors of the approximate kNN families (one-bucket /
    # one-list settings — the same join+re-rank plans their scale defaults
    # run, so their cost is representative, and hash-checked).
    # embedding_dups_lsh_exact (k=0: ALL candidate pairs as join rows) was
    # unbenchable before the r6 deterministic cohort cap bounded it to
    # sf0.1 scale at any sf; benched now so the degenerate path has history
    "embedding_dups_lsh_exact",
    "knn_ivf_exact",
    "knn_lsh_exact",
    "multimodal_features",
    # re-admitted with the max_doc_freq=200 hot-shingle cap: the synthetic
    # 30-word vocabulary makes every bigram hot at sf0.1, and the cap bounds
    # the self-join fan-out (minhash_lsh remains the uncapped scale path)
    "ngram_jaccard",
    "dup_clusters",
    "minhash_lsh",
    "simhash_dups",
    "knn_lsh",
    "knn_ivf",
    "winnow_overlap",
    "compression_roundtrip",
    # r6: merge-on-read upsert through the icelite storage layer (write +
    # equality-delete commit + pending-delete anti-join read, end-to-end)
    "mor_upsert",
    "icelite_scan",
    # r6: changelog scan (CDC) from the overwrite snapshot through a MOR
    # upsert + key delete — hash-checked vs a relational change-stream oracle
    "icelite_cdc",
    # admitted once their kernels went batched: dtw_path's DP+backtrack is
    # one vectorized pass per length-class; number_peaks stays per-series
    # (ridge linkage is sequential) but spreads round-robin across cores
    "dtw_path",
    "number_peaks",
]


def run_query(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def flagship_geomedian(spark, sf_dir):
    """The nangeomedian_pcm + MAD continuous aggregate (kept as a named
    helper; benched via the geomedian_mads HEADLINE entry)."""
    from hdstats_spark.driver_queries import q_geomedian_mads

    return q_geomedian_mads(spark, sf_dir)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # default best-of-2: the recorded number is each query's MINIMUM over
    # the repeats, so the per-round gate bench (which passes no flags)
    # measures the code, not whatever box load coincides with the run —
    # round 5's only "regression" was a single-run bench on a loaded box
    repeat = int(os.environ.get("SPARK_GRAFT_REPEAT", "2"))
    if "--repeat" in sys.argv:
        idx = sys.argv.index("--repeat")
        try:
            repeat = int(sys.argv[idx + 1])
        except (IndexError, ValueError):
            sys.exit("usage: bench.py [--repeat N]  (N = per-query runs, min recorded)")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from hdstats_spark import driver_queries as dq
    from hdstats_spark.session import get_spark

    spark = get_spark(app="bench", cores=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    # ledger queries + retired-from-ledger scale variants (COVERAGE.md):
    # the bench suite is a perf-history contract, independent of the ≤50
    # correctness window
    qs = {**dq.queries(), **dq.bench_only_queries()}

    timings: dict[str, float] = {}
    for name in HEADLINE:
        best = None
        for _ in range(max(1, repeat)):
            t0 = time.perf_counter()
            run_query(qs[name](spark, sf_dir))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    # rolled-up points/sec (the BASELINE metric: tier rows produced per
    # second across raw→1m→1h→1d)
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    t0 = time.perf_counter()
    n_points = 0
    for unit in ("minute", "hour", "day"):
        n_points += (
            ev.groupBy("user_id", F.date_trunc(unit, "ts").alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
            .count()
        )
    tier_sec = time.perf_counter() - t0
    timings["tier_cascade_points"] = round(tier_sec, 3)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline query suite wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "points_per_sec": round(n_points / tier_sec, 1),
        "cpus": cpus,
        "repeat": repeat,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
