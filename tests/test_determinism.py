"""Partitioning-determinism tests: the driver's correctness gate
hashes exact values, so every query must produce identical results
regardless of shuffle-partition count or input layout. Floating-point
aggregation order changes with partitioning — these tests catch any
query whose rounding regime doesn't absorb that (the failure mode
that would flake the oracle gate rather than fail deterministically).

Representative set: one float-accumulating aggregate per family
(histogram density, Poisson+BH scoring, minhash array fold, TF-IDF
window, packing cumsum, KMV estimator).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

REPRESENTATIVE = [
    "fragment_length_histogram",
    "peak_call_bh",
    "dedup_minhash_lsh",
    "tf_idf_top_terms",
    "pack_sequences",
    "approx_ndv_kmv",
    "rollup_time_bucket",
    "dedup_spans_exact",
    "interarrival_stats",
    "time_weighted_avg",
    "trend_slope",
    # round-5 additions with float accumulation across shuffles
    "pagerank_iter",
    "kmeans_assign",
    "item_cf_topk",
    "approx_quantile_bins",
    # round-4 data-selection additions (float log-ratio sums, max_by
    # assignment, band joins)
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


def _rows(df):
    # NULL-safe sort key (cube/rollup grouping rows): Python can't
    # order None against str/float directly.
    return sorted(
        tuple((v is None, "" if v is None else v) for v in r) for r in df.collect()
    )


@pytest.mark.parametrize("name", REPRESENTATIVE)
def test_identical_across_shuffle_partitionings(spark, sf_dir, name):
    fn = entrymod.queries()[name]
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = _rows(fn(spark, sf_dir))
        spark.conf.set("spark.sql.shuffle.partitions", "29")
        b = _rows(fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    assert a == b, f"{name} differs across shuffle partitionings"


# --------------------------------------------------------------------------
# Auto-derived float-stability sweep (CORRECTNESS_r08 quantile_normalize
# lesson): any oracle that ROUNDS an order-dependent double aggregate is
# exposed to FP-summation-order flips at rounding half-boundaries. The
# within-engine proxy for that class: perturb BOTH the reduce side
# (shuffle partitions — changes partial-agg merge order) and the map side
# (maxPartitionBytes — changes which rows each partial sees) and require
# bit-identical output. A query that moves here would also flake against
# DuckDB; fix it with exact decimal/integer arithmetic (see
# ops.windows.quantile_normalize), never by loosening this test.
# --------------------------------------------------------------------------
import re as _re

_ORDER_DEP = _re.compile(
    r"round\s*\(\s*(avg|sum|stddev|stddev_samp|stddev_pop|var_samp|var_pop|"
    r"corr|covar_pop|covar_samp)\s*\(",
    _re.IGNORECASE,
)

FLOAT_ROUNDERS = sorted(
    name
    for name, sql in entrymod.oracle_sql().items()
    if _ORDER_DEP.search(sql) and name not in REPRESENTATIVE
)


@pytest.mark.parametrize("name", FLOAT_ROUNDERS)
def test_rounded_float_aggs_stable_under_perturbation(spark, sf_dir, name):
    fn = entrymod.queries()[name]
    before_sp = spark.conf.get("spark.sql.shuffle.partitions")
    before_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
        a = _rows(fn(spark, sf_dir))
        spark.conf.set("spark.sql.shuffle.partitions", "29")
        spark.conf.set("spark.sql.files.maxPartitionBytes", "134217728")
        b = _rows(fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before_sp)
        spark.conf.set("spark.sql.files.maxPartitionBytes", before_mpb)
    assert a == b, f"{name} float output moved under partitioning perturbation"
