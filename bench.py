"""Benchmark harness (driver contract).

Runs the headline queries from `__spark_entry__.queries()` against
`$SPARK_GRAFT_SF_DIR` (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the noop sink (full computation,
no driver-side collect) so the timing reflects the distributed plan,
not result transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

# Headline set: the reference's analytical core (interval joins, histogram,
# coverage, dedup, routing, peak calling) + the training-data extensions
# (MinHash near-dup, ANN top-k, text quality). Scalars/filters are excluded:
# they are sub-second scans dominated by Spark fixed overhead.
HEADLINE = [
    "feature_interval_join",
    "metrics_interval_join",
    "gene_read_count",
    "fragment_length_histogram",
    "coverage_bin_count",
    "dedup_alignments",
    "pe_mate_join",
    "group_route_jobs",
    "qc_read_stats",
    "peak_call",
    "dedup_exact",
    "dedup_minhash_lsh",
    "ann_topk_cosine",
    "text_quality_score",
    "token_count",
    "vocab_top_terms",
    "pack_sequences",
    "corpus_prepare",
    "asof_latest_event",
    "dedup_clusters",
    "rollup_time_bucket",
    "pagerank_iter",
    "kmeans_assign",
    "dsir_importance_weights",
    "semdedup_prune",
    "incremental_ingest_dedup",
    "quality_percentile_by_source",
    # round-4 heavy families, tracked round-over-round from r5 on
    "ivf_pq_topk",
    "setsim_prefix_join",
    # round-5 rewrite (exact-dup pre-collapse end-to-end clustering)
    "setsim_clusters",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf"))
    except ValueError:
        sf = -1.0

    from seqdatapipeline_spark.session import get_spark

    spark = get_spark(app_name="bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    queries = entrymod.queries()

    # Warm the JVM (codegen, parquet footer cache, shuffle service)
    # before timing: the first action otherwise absorbs ~2s of one-time
    # cost that has nothing to do with the query it lands on.
    for t in ["lineitem", "part", "orders", "documents", "embeddings"]:
        spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")).count()

    # Per-query: one untimed warmup execution (whole-stage-codegen
    # compilation costs ~1s per distinct plan and dwarfs sf0.1 runtimes
    # 3-7x; at the target 100 TB scale that one-time compile is noise
    # against hours of execution), then time the steady-state run —
    # that is the number that extrapolates with data volume. Cold
    # first-run totals are reported alongside for transparency.
    def drop_persisted() -> None:
        # Free localCheckpoint blocks left by iterative operators
        # (connected components) so heap pressure from earlier queries
        # can't distort later timings in this single shared JVM.
        jmap = spark.sparkContext._jsc.sc().getPersistentRDDs()
        it = jmap.values().iterator()
        while it.hasNext():
            it.next().unpersist(True)

    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries.get(name)
        if fn is None:
            continue
        # fn() is inside the timer: plan build is driver-side ms for
        # declarative queries, but iterative operators (connected
        # components) run eager actions during construction.
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        cold[name] = round(time.perf_counter() - t0, 3)
        drop_persisted()
        warm = []
        for _ in range(5):  # min-of-5: r3 showed min-of-3 still lets
            # host-load noise move the total ~19% on identical code
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            warm.append(time.perf_counter() - t0)
            drop_persisted()
        timings[name] = round(min(warm), 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "cold_total": round(sum(cold.values()), 3),
        "sf": sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
