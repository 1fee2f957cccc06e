"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Queries are materialized with the noop sink (full execution, no driver
transfer). One untimed warmup run primes the JVM/codegen caches.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# headline set: scan-agg, top-k, window, joins, percentile, dedup,
# similarity, text, and the engine lifecycle (insert+merge under the clock)
HEADLINE = [
    "q01_pricing_summary",
    "q02_count_by_user",
    "q04_distinct",
    "q05_topk",
    "q06_month_rollup",
    "q07_percentile",
    "q10_range_filter",
    "q12_join_broadcast",
    "q13_join_threeway",
    "q14_window_rank",
    "q28_asof_join",
    "q30_sessionize",
    "d02_minhash_lsh",
    "d04_simhash",
    "s01_cosine_topk",
    "s02_cosine_topk_lsh",
    "m01_media_features",
    "t02_text_quality",
    "ice01_insert_roundtrip",
    "ice02_merge_invariant",
    "ice15_parallel_compaction",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("icedb_spark-bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    qs = entry.queries()

    def run(name: str) -> float:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    run("q01_pricing_summary")  # warmup (untimed)

    results: dict[str, float] = {}
    for name in HEADLINE:
        results[name] = round(run(name), 3)

    total = round(sum(results.values()), 3)
    out = {
        "metric": "headline-suite wall time",
        "value": total,
        "unit": "sec",
        "queries": results,
        "sf": sf,
        # row counts of the driving tables (parquet footer metadata, no
        # scan): cross-round deltas are only comparable per-row — the
        # driver regenerated sf0.1 between r1 and r2 with 5x events and
        # 2.5x documents, which dominates any naive wall-clock ratio
        "rows": _table_rows(sf_dir),
    }
    prev = _previous_round(sf)
    if prev:
        prev_name, prev_queries = prev
        out[f"delta_vs_{prev_name}"] = {
            q: round(results[q] / prev_queries[q], 2)
            for q in results
            if prev_queries.get(q)
        }
        if prev_name == "r01":
            out["delta_note"] = (
                "sf0.1 testdata was regenerated between r1 and r2 with 5x "
                "events (20k->100k) and 2.5x documents (2k->5k); r1 recorded "
                "no row counts, so these wall-clock ratios conflate data "
                "growth with code changes — compare per-row using the "
                "'rows' field from r2 onward"
            )
    print(json.dumps(out))


def _table_rows(sf_dir: str) -> dict[str, int]:
    import pyarrow.parquet as pq

    out = {}
    for t in ("lineitem", "events", "documents", "embeddings"):
        try:
            out[t] = pq.ParquetFile(f"{sf_dir.rstrip('/')}/{t}.parquet").metadata.num_rows
        except OSError:
            pass
    return out


def _previous_round(sf: float):
    """Per-entry regression attribution: ratio vs the newest BENCH_r*.json
    recorded at the SAME scale factor (cross-sf ratios are meaningless)."""
    import glob

    here = os.path.dirname(os.path.abspath(__file__))
    rounds = []
    for p in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.fullmatch(r"BENCH_r(\d+)\.json", os.path.basename(p))
        if not m:
            continue
        rounds.append((int(m.group(1)), p))
    best = None
    for n, p in sorted(rounds):  # numeric: r10 really is newer than r9
        try:
            with open(p) as f:
                doc = json.load(f)
        except (OSError, ValueError):
            continue
        parsed = doc.get("parsed", doc)
        queries = (parsed or {}).get("queries")
        prev_sf = (parsed or {}).get("sf", doc.get("sf"))
        if queries and prev_sf == sf:
            best = (f"r{n:02d}", queries)
    return best


if __name__ == "__main__":
    main()
