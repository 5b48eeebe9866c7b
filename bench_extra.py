"""Round-7 optimization harness (guide §1): per-query isolation with the
noop sink, repeat-N minima, and .explain("formatted") capture.

bench.py is FROZEN (driver contract); this file holds every extra
measurement mode the optimization round needs:

    python bench_extra.py time q1 q2 ...   # repeat-N minima for named queries
    python bench_extra.py time-all         # the whole HEADLINE list
    python bench_extra.py plans [suffix] [q ...]
                                           # write plans/r07/<q>_<suffix>.txt
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS
(default 32), SPARK_GRAFT_REPEAT (default 3 here — minima discipline).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import HEADLINE  # noqa: E402  (the frozen query list)


def _session():
    from hdstats_spark import driver_queries as dq
    from hdstats_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app="bench_extra", cores=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    qs = {**dq.queries(), **dq.bench_only_queries()}
    return spark, qs, sf_dir


def _noop(df):
    df.write.mode("overwrite").format("noop").save()


def time_queries(names):
    spark, qs, sf_dir = _session()
    repeat = int(os.environ.get("SPARK_GRAFT_REPEAT", "3"))
    out = {}
    for name in names:
        best = None
        samples = []
        for i in range(repeat):
            spark.sparkContext.setJobDescription(f"{name} [{i}]")
            t0 = time.perf_counter()
            _noop(qs[name](spark, sf_dir))
            dt = time.perf_counter() - t0
            samples.append(round(dt, 3))
            best = dt if best is None else min(best, dt)
        out[name] = {"min": round(best, 3), "samples": samples}
        print(f"{name:28s} min {best:7.3f}  {samples}", flush=True)
    print(json.dumps(out))
    spark.stop()


def capture_plans(suffix, names):
    spark, qs, sf_dir = _session()
    os.makedirs("plans/r07", exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = f"plans/r07/{name}_{suffix}.txt"
        with open(path, "w") as f:
            f.write(plan)
        print("wrote", path, flush=True)
    spark.stop()


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "time-all"
    if mode == "time":
        time_queries(sys.argv[2:])
    elif mode == "time-all":
        time_queries(HEADLINE)
    elif mode == "plans":
        suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
        names = sys.argv[3:] or HEADLINE
        capture_plans(suffix, names)
    else:
        sys.exit(f"unknown mode {mode!r}")


if __name__ == "__main__":
    main()
