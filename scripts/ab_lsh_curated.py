"""Same-JVM A/B: dedup_minhash_lsh served from the PLAIN parquet vs
the CURATED text tier (stored content_hash, bucketed) — the r11 watch
item (curated pin 1.434 vs plain pin 0.883 suggested the tier HURTS
this query on the low-duplication bench corpus).

Design: one session, so the per-job lambda epoch is shared; phases
P1 (plain) → curate → C (curated) → drop+clear → P2 (plain again,
detects lambda drift across the session); full measurement-integrity
clears between timed runs (bench._drop_persisted); per-phase lambda
probe + steal sampling; driver JOB COUNTS per execution — the
lambda-independent fingerprint that separates "more fixed-cost
barriers" from "more work".

Usage: python scripts/ab_lsh_curated.py [sf_dir] [n_runs]
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 5

spec = importlib.util.spec_from_file_location("bench", os.path.join(_REPO, "bench.py"))
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)


def phase(spark, fn, label: str) -> dict:
    tracker = spark.sparkContext.statusTracker()
    lam = bench._job_latency_ms(spark)
    walls, jobs = [], []
    s0, t0j = bench._steal_jiffies() if hasattr(bench, "_steal_jiffies") else (0, 0)
    for _ in range(N):
        bench._drop_persisted(spark)
        j0 = len(tracker.getJobIdsForGroup(None) or [])
        t0 = time.perf_counter()
        fn().collect()
        walls.append(round(time.perf_counter() - t0, 3))
        jobs.append(len(tracker.getJobIdsForGroup(None) or []) - j0)
    s1, t1j = bench._steal_jiffies() if hasattr(bench, "_steal_jiffies") else (0, 0)
    steal = round(100.0 * (s1 - s0) / max(t1j - t0j, 1), 2) if t1j else None
    return {
        "phase": label, "walls": walls, "min": min(walls),
        "jobs_per_run": jobs, "lambda_ms": lam, "steal_pct": steal,
    }


def main() -> None:
    from seqdatapipeline_spark.io import layout as lay
    from seqdatapipeline_spark.session import get_spark

    spark = get_spark(app_name="ab-lsh", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    q = entrymod.queries()["dedup_minhash_lsh"]
    spark.read.parquet(os.path.join(SF, "documents.parquet")).count()  # warm

    results = []
    run = lambda: q(spark, SF)
    results.append(phase(spark, run, "plain_1"))

    t0 = time.perf_counter()
    docs = lay.plain_parquet(spark, os.path.join(SF, "documents.parquet"))
    from pyspark.sql import functions as F

    curated_docs = docs.withColumn("content_hash", F.md5(F.col("text")))
    lay.write_curated_bucketed(
        curated_docs, lay.bucketed_table_name(SF, "documents", "content_hash"),
        "content_hash", n_buckets=32,  # what curate_corpus uses
    )
    curate_secs = round(time.perf_counter() - t0, 2)
    results.append(phase(spark, run, "curated"))

    spark.sql(f"DROP TABLE IF EXISTS {lay.bucketed_table_name(SF, 'documents', 'content_hash')}")
    lay.detect_cache_clear()
    results.append(phase(spark, run, "plain_2"))

    print(json.dumps({"curate_secs": curate_secs, "phases": results}, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
