"""Capture .explain("formatted") for EVERY registry entry to plans/r12/audit/
(optimization r12, guide §1.2 — plans on file for the full surface).
Skips entries whose audit file already exists; delete a file to refresh it.
Usage: python tools/plan_audit.py"""
import io, os, sys, time, traceback
from contextlib import redirect_stdout
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[32]")
    .appName("icedb-plan-audit")
    .config("spark.sql.shuffle.partitions", 32)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.driver.memory", "16g")
    .config("spark.ui.enabled", "false")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as entry
qs = entry.queries()
outdir = "/root/repo/plans/r12/audit"
os.makedirs(outdir, exist_ok=True)
sf = "/root/testdata/sf0.01"   # gate scale: fast builds, identical plan shapes
fails = []
for name in sorted(qs):
    path = os.path.join(outdir, f"{name}.txt")
    if os.path.exists(path):
        continue
    spark.sparkContext.setJobDescription(f"audit:{name}")
    t0 = time.time()
    try:
        df = qs[name](spark, sf)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"{name}: ok {time.time()-t0:.1f}s", flush=True)
    except Exception as e:
        fails.append(name)
        print(f"{name}: FAIL {type(e).__name__}: {e}", flush=True)
        traceback.print_exc(limit=2)
print("FAILED:", fails)
