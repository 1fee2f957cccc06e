"""Per-entry profiler for the optimization rounds.

For each named entry: runs the callable, captures .explain("formatted")
to plans/<tag>/<name>_<suffix>.txt, then times construction + noop write
separately (the bench times them together; splitting attributes the cost),
and reports Spark job counts per phase via the status tracker.

Usage: python tools/profile_entries.py <plans_subdir> <suffix> [entry ...]
  (no entries -> the bench HEADLINE list)
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r12"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("icedb_spark-profile")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import bench
    import __spark_entry__ as entry

    qs = entry.queries()
    names = sys.argv[3:] or bench.HEADLINE
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plans_dir = os.path.join(here, "plans", tag)
    os.makedirs(plans_dir, exist_ok=True)

    st = spark.sparkContext.statusTracker()

    def job_count() -> int:
        ids = st.getJobIdsForGroup(None)
        return len(ids)

    # warmup: same three the bench uses
    for w in ("q01_pricing_summary", "m01_media_features",
              "ice01_insert_roundtrip"):
        qs[w](spark, sf_dir).write.format("noop").mode("overwrite").save()

    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"profile:{name}")
        j0 = job_count()
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        t_build = time.time() - t0
        j_build = job_count() - j0
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(plans_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(buf.getvalue())
        # timed noop writes (3 samples like the bench, rebuild each time —
        # matches the bench's methodology of calling the entry fresh)
        samples = []
        for _ in range(3):
            t0 = time.time()
            d2 = qs[name](spark, sf_dir)
            d2.write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
        j_total = job_count() - j0
        samples.sort()
        out[name] = {
            "build_sec": round(t_build, 3),
            "build_jobs": j_build,
            "run_med": samples[1],
            "runs": samples,
            "jobs_3runs": j_total - j_build,
        }
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"profile": out}), flush=True)


if __name__ == "__main__":
    main()
