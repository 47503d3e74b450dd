"""Scaling check: run the heavy operators at sf0.1 and at a 10x
replication of it, and report the runtime ratio per operator.

A scan-bound operator should scale ~linearly (ratio ~= 10 on ample
cores, less when the small run underutilizes them); anything clearly
super-linear (pair explosion, degenerate buckets, single-reducer
windows) shows up as a much larger ratio — the local[32] proxy for
"would this survive 100 TB".

The 10x data is built once into /tmp/spark-graft-scale10 by unioning
id-offset copies of the sf0.1 tables (duplicated text/embedding
payloads deliberately stress the dedup operators with 10-member
duplicate groups).

Usage: python scripts/scalecheck.py [op ...]

`SPARK_GRAFT_SCALE_COPIES` overrides the replication factor (default
10); e.g. COPIES=100 is the brief's "would the plan survive 100x"
stress for the flagships. `SPARK_GRAFT_SCALE_TABLES` restricts which
tables get replicated (comma-separated; the rest symlink to sf0.1) —
`lineitem` alone models the real genomics asymptote where reads grow
but the annotation doesn't.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from seqdatapipeline_spark.session import get_spark  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = int(os.environ.get("SPARK_GRAFT_SCALE_COPIES", "10"))
_ONLY = os.environ.get("SPARK_GRAFT_SCALE_TABLES", "")
SCALED = f"/tmp/spark-graft-scale{COPIES}" + (
    f"-{_ONLY.replace(',', '_')}" if _ONLY else ""
)
TABLES = {
    "lineitem": ("l_orderkey", 100_000_000),
    "part": ("p_partkey", 100_000_000),
    "orders": ("o_orderkey", 100_000_000),
    "documents": ("doc_id", 100_000_000),
    "embeddings": ("vec_id", 100_000_000),
    "events": ("event_id", 100_000_000),
    "customer": ("c_custkey", 100_000_000),
}

OPS = [
    "feature_interval_join",
    "metrics_interval_join",
    "gene_read_count",
    "dedup_alignments",
    "fragment_length_histogram",
    "coverage_bin_count",
    "pe_mate_join",
    "peak_call",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "text_quality_score",
    "token_count",
    "vocab_top_terms",
    "pack_sequences",
    "corpus_prepare",
    "ann_topk_cosine",
    "dedup_embedding_cosine",
    "asof_latest_event",
    "dedup_clusters",
    "rollup_time_bucket",
    "scrub_pii",
    "repetition_metrics",
    "tf_idf_top_terms",
    "bloom_semi_reduce_join",
    "dedup_embedding_clusters",
    "apply_changelog",
    "embedding_normalize",
    "embedding_covariance",
    "stream_span_dedup",
    "dedup_minhash_clusters",
    "dedup_spans_exact",
    "dedup_soft_weights",
    "tokenizer_fertility",
    "pe_mate_pivot",
    "decontaminate_ngram",
    "shuffle_shards",
    "fuzzy_match_pairs",
    "table_profile",
    "dq_violations",
    "cooccurrence_counts",
    "mixture_weights",
    "time_weighted_avg",
    "trend_slope",
    "corr_matrix",
    "dataset_split",
    "chunk_documents",
    "clean_text",
    "bigram_counts",
    "anomaly_zscore",
    "equidepth_bins",
    "topk_per_group",
    "gap_fill_daily",
    "value_change_points",
    "token_entropy",
    "event_transitions",
    "weekly_active_users",
    "pipeline_rna",
    "pipeline_chip",
    "pipeline_atac",
    "dup_rate_by_source",
    "source_overlap_matrix",
    "label_centroids",
    "quantile_normalize",
    "minhash_jaccard_estimate",
    "simhash_hamming_pairs",
    "lm_doc_score",
    "mad_outliers",
    "winsorize_stats",
    "top_event_paths",
    "pagerank_iter",
    "graph_degree_stats",
    "kmeans_assign",
    "approx_quantile_bins",
    "bm25_topk",
    "pmi_bigrams",
    "triangle_count",
    "item_cf_topk",
    "rank_fusion_rrf",
    "minhash_containment",
    "stream_quantile_sketch",
    "setsim_prefix_join",
    "ann_recall_report",
    "setsim_clusters",
    "lsh_recall_metrics",
    "pagerank_weighted",
    "stream_vocab_topk",
    "dedup_keep_best",
    "dsir_importance_weights",
    "semdedup_prune",
    "bpe_pair_merge",
    "decontaminate_fuzzy",
    "incremental_ingest_dedup",
    "late_event_rate",
    "quality_features_vector",
    "stream_late_monitor",
    "quality_percentile_by_source",
    "dedup_threshold_sweep",
    "dow_seasonality",
    "lang_id_ngram_model",
    "knn_graph",
    "lsh_index_stats",
    "cluster_top_terms",
    "stream_session_windows",
    "embedding_pq_codes",
    "pq_ann_topk",
    "ivf_pq_topk",
    "assoc_rules",
    "rfm_segments",
    "takedown_promote",
    "corpus_datacard",
    "dedup_keep_priority",
    "shard_balance_report",
    "neardup_review_sample",
    "license_audit",
    "token_budget_planner",
    "dup_cluster_histogram",
    "filter_attrition_report",
]


def build_scaled(spark) -> None:
    os.makedirs(SCALED, exist_ok=True)  # callers other than main()
    # (ad-hoc gate scripts) import build_scaled directly
    only = {t for t in _ONLY.split(",") if t} or set(TABLES)
    for name, (key, stride) in TABLES.items():
        out = os.path.join(SCALED, f"{name}.parquet")
        # lexists: a dangling symlink (BASE moved / SPARK_GRAFT_SF_DIR
        # changed between runs) fails os.path.exists but still blocks
        # os.symlink — unlink and rebuild instead of crashing.
        if os.path.lexists(out):
            if os.path.exists(out):
                continue
            os.unlink(out)
        src = os.path.join(BASE, f"{name}.parquet")
        if name not in only:
            os.symlink(src, out)
            print(f"linked {name} x1", flush=True)
            continue
        df = spark.read.parquet(src)
        # Replicate via explode(sequence), not a COPIES-way union: the
        # union plan is COPIES nodes deep and Catalyst analysis alone
        # takes minutes at 1000x, while one Generate row-multiplies at
        # scan speed with an identical result (modulo row order).
        # repartition BEFORE the explode: the sf0.1 sources are
        # single-split parquet files, so without it the COPIES-fold
        # row multiplication runs in one task (observed: one core
        # pinned for minutes at 1000x while 31 idle).
        scaled = (
            df.repartition(max(32, min(COPIES, 256)))
            .withColumn(
                "__copy", F.explode(F.sequence(F.lit(0), F.lit(COPIES - 1)))
            )
            .withColumn(key, F.col(key) + F.col("__copy").cast("long") * F.lit(stride))
            .drop("__copy")
        )
        scaled.write.mode("overwrite").parquet(out)
        print(f"built {name} x{COPIES}", flush=True)


def drop_persisted(spark) -> None:
    """Free localCheckpoint / cache blocks left by iterative operators
    (connected components checkpoints every round). Across a ~50-op
    sweep in ONE local JVM those blocks accumulate into a heap OOM;
    on a real cluster each job's session would come and go instead."""
    jmap = spark.sparkContext._jsc.sc().getPersistentRDDs()
    it = jmap.values().iterator()
    while it.hasNext():
        it.next().unpersist(True)


def time_op(fn, spark, sf_dir: str) -> float:
    best = None
    for _ in range(2):
        # fn() inside the timer: iterative operators (connected
        # components) run eager actions during plan construction.
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        t = time.perf_counter() - t0
        best = t if best is None else min(best, t)
        drop_persisted(spark)
    return best


# Recycle the JVM every N ops: a full sweep runs 3000+ stages in one
# local session, and driver-side state that a per-job cluster session
# never accumulates (broadcasts, AQE/codegen caches, listener state)
# eventually OOMs a 16g heap even with checkpoint blocks unpersisted.
SESSION_OPS = 12


def main() -> None:
    ops = sys.argv[1:] or OPS
    spark = get_spark(app_name="scalecheck")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(SCALED, exist_ok=True)
    build_scaled(spark)

    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    print(f"{'op':28s} {'sf0.1':>8s} {'x10':>8s} {'ratio':>7s}")
    worst = 0.0
    since_restart = 0
    for name in ops:
        fn = queries.get(name)
        if fn is None:
            continue
        if since_restart >= SESSION_OPS:
            spark.stop()
            spark = get_spark(app_name="scalecheck")
            spark.sparkContext.setLogLevel("ERROR")
            since_restart = 0
        t1 = time_op(fn, spark, BASE)
        t10 = time_op(fn, spark, SCALED)
        since_restart += 1
        ratio = t10 / t1 if t1 > 0 else float("inf")
        worst = max(worst, ratio)
        print(f"{name:28s} {t1:8.3f} {t10:8.3f} {ratio:6.1f}x", flush=True)
    print(f"\nworst ratio: {worst:.1f}x (10x data; >> 10 indicates super-linear cost)")
    spark.stop()


if __name__ == "__main__":
    main()
