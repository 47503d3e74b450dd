"""Physical-plan anti-pattern sweep over every queries() entry.

Flags (each a scale smell, not necessarily a bug — known-intentional
cases are listed in ALLOW with the reason):
- BNLJ / CartesianProduct: pair-explosion joins
- scans=N: repeated fact-table scans without exchange reuse
- global-window: an unpartitioned Window — single-reducer at scale
  unless its input is already aggregate-sized
- row-python: BatchEvalPython (row-at-a-time Python UDF) — the slow
  path; only Arrow-batched Python (ArrowEvalPython / mapInPandas) is
  acceptable
"""

import re
import sys

sys.path.insert(0, "/root/repo")
from seqdatapipeline_spark.session import get_spark  # noqa: E402
import __spark_entry__ as e  # noqa: E402

# name -> (allowed flag prefixes, reason)
ALLOW = {
    # ANN: the bounded query set is itself a filter of the corpus
    # table, so the table appears as both sides (plus an intentional
    # BNLJ for broadcast scoring when the fold path is chosen).
    "ann_topk_cosine": (("BNLJ", "double-scan"), "query set filtered from the corpus table; broadcast scoring"),
    "ann_ivf_topk": (("BNLJ", "double-scan"), "query set filtered from the corpus table; broadcast centroid scoring"),
    "ann_ivf_pruned_topk": (("BNLJ", "scans="), "queries + per-cell centroid aggregate + candidate cells are three linear passes of the corpus table (queries bounded, centroids one map-combinable agg, candidates the cell-pruned join side); the probe join broadcast-crosses the 10-row centroid model — O(ncells) BNLJ by construction"),
    "robots_filter": ("double-scan", "the second documents pass is the rules-dim SYNTHESIS (distinct sources, column-pruned to one column) so the DuckDB oracle sees identical policy rows; a production deployment reads its robots/policy store instead — the corpus side is one scan"),
    "boilerplate_scrub": ("scans=", "chunk-frequency branch + skew_router_join's hot/cold routes re-derive the chunk explode instead of checkpointing it: the chunk stream is CORPUS-sized (words/3 rows), so materializing it trades a linear re-scan for corpus-scale storage — the same call tf_idf makes for its bigram stream; the frequency TABLE (distinct chunks) is the small side and the router broadcasts its head"),
    "union_inputs": ("double-scan", "union of two sources is two scans by definition"),
    "stream_attribution": ("double-scan", "stream-stream join: the two sides are independent streams by definition"),
    "apply_changelog": ("double-scan", "snapshot and changelog are two distinct tables by definition"),
    "skew_profile": ("global-window", "share/mean windows run over the per-key aggregate (key-cardinality-sized)"),
    "anomaly_zscore": ("double-scan", "stats pass + broadcast-joined probe pass: the scale-correct form (a per-type window would one-task each group)"),
    "source_overlap_matrix": ("double-scan", "the second scan is column-pruned to (doc_id, source) next to the shingle/md5 signature branch; threading source through the signature aggregate would couple the hash kernel to caller schema"),
    "equidepth_bins": (("BNLJ", "double-scan"), "one-row quantile bounds broadcast-crossed into the binning scan: O(1) BNLJ by construction"),
    "mixture_weights": ("global-window", "normalizing sum runs over the per-source aggregate (source-cardinality-sized)"),
    "param_set_union": ("double-scan", "set op over two inputs"),
    "decontaminate_ngram": ("double-scan", "demo uses documents as both corpus and stand-in eval set; in production bench is a separate MB-sized table (one scan each)"),
    "dq_violations": ("scans=", "each rule is an independent check (anti-join / group-having / filter) over its table; rule count is O(10) and fixed, not data-sized"),
    "fuzzy_match_pairs": ("double-scan", "blocked self-join: the table is both sides by definition"),
    "reject_except": ("double-scan", "EXCEPT over two inputs"),
    "dedup_spans_exact": ("double-scan", "span branch + arithmetic totals branch: the price of the skew-immune groupBy-min form (a single-scan window would single-task hot boilerplate spans)"),
    "dedup_soft_weights": (("double-scan", "scans="), "count branch + skew_router_join attribution (hot-hash broadcast route + cold SMJ route): 5 linear column-pruned scans, the price of keeping viral-duplicate rows out of the join exchange entirely — AQE cannot split the groupBy+join-back shape (ops/joins.py skew_router_join docstring), and a content-keyed window would single-task viral duplicates"),
    "tf_idf_top_terms": (("double-scan", "scans="), "tf branch + df branch + skew_router_join (stopword-head broadcast route + tail SMJ route): 5 linear scans, the price of keeping stopword postings out of the join exchange — AQE cannot split the groupBy+join-back shape, and a term-keyed window would single-task stopword partitions"),
    "email_sink": ("double-scan", "alert join of two derived inputs"),
    "multimodal_meta": ("double-scan", "payload + metadata branches"),
    "dedup_embedding_cosine": ("double-scan", "per-block grouping reads blocks once; probe branch second"),
    "dedup_ngram_jaccard": ("scans=", "inverted index feeds sizes + pairs branches"),
    "feature_interval_join": (("scans=", "BNLJ", "global-window"), "count-rewrite branches (interior pre-agg / signed F-lookups + edge-exact); on the dense prefix route the chrom-sized superbin-range broadcast join constant-folds to a BNLJ over a chrom-cardinality table, and the superbin cumulative window is per-chrom over the DENSIFIED superbin range (~points/(273*4096) rows — ~10^6 at 10^12 points), both bounded by construction"),
    "fragment_length_histogram": ("global-window", "density window runs over histogram bins, not rows"),
    "metrics_interval_join": ("global-window", "pct window over the per-category aggregate (band-count-sized)"),
    "peak_call_bh": ("global-window", "BH is a global order statistic over the per-bin aggregate (genome/bin-size bounded)"),
    "density_over_total": ("global-window", "ratio window over the aggregated result"),
    "qc_read_stats": ("global-window", "stats window over per-group aggregates"),
    "chunk_batches": ("global-window", "batch numbering over the routed-group list (group-count-sized)"),
    "limit_first_record": ("global-window", "limit-1 probe"),
    "sra_source": ("global-window", "single-accession probe"),
    "srp_embedding_pairs": ("double-scan", "exact-cosine confirm joins the (column-pruned) vector table onto both pair sides; the signature branch is checkpointed, not rescanned"),
    "lm_doc_score": (("BNLJ", "double-scan"), "one-row vocab-size aggregate broadcast-crossed into the vocab-bounded context table: O(|vocab|) BNLJ by construction; the bigram-instance stream is deliberately scanned twice (train + score) instead of checkpointed — the type-table IS checkpointed (textstats.py lm_doc_score docstring)"),
    "mad_outliers": ("scans=", "exact two-level median (MAD = median of deviations from a median) is inherently multi-pass; each pass is a map-side-combinable groupBy whose key-sized result joins back broadcast — a per-group window would one-task each group"),
    "winsorize_stats": ("double-scan", "quantile pass + clipped re-aggregate: the scale-correct two-pass form (a per-group window would one-task each group)"),
    "kmeans_assign": (("BNLJ", "double-scan"), "the 8-row seed model is a filtered projection of the corpus table (like ann_*); the assignment join broadcasts the model — O(k) BNLJ by construction"),
    "approx_quantile_bins": (("BNLJ", "double-scan"), "min/max pass + bin pass: the documented two-pass histogram form; the 3-row probs table broadcast-crosses the BIN-sized cumulative table — O(1) BNLJ"),
    "bm25_topk": (("BNLJ", "scans="), "tf/df wordcount branches over the corpus: the skew-immune groupBy+join form (like tf_idf); the 1-row (N, avgdl) stats aggregate broadcast-crosses O(1)"),
    "pmi_bigrams": (("BNLJ", "scans="), "bigram/unigram/length wordcount branches over the corpus; the vocab-bounded unigram table joins twice (w1, w2); the 1-row totals aggregate broadcast-crosses O(1)"),
    "triangle_count": ("BNLJ", "three 1-row census aggregates (nodes/edges/triangles) broadcast-crossed into one summary row: O(1) BNLJ by construction; the wedge join itself is equi-keyed over checkpointed edges"),
    "item_cf_topk": ("scans=", "pair-count branch + degree branch over the same bounded-group table: the skew-immune groupBy+join form (caching the grouped table would pin order-cardinality arrays in memory at scale for no asymptotic win)"),
    "rank_fusion_rrf": ("global-window", "both rankings are global order statistics over the part-level aggregate (dim-sized, never the fact table)"),
    "stream_quantile_sketch": (("BNLJ", "double-scan"), "quantile extraction reads the persisted grid-histogram STATE (bin-sized, not the stream) twice (totals + cumulative); the 3-row probs table broadcast-crosses O(1)"),
    "setsim_prefix_join": (("global-window", "scans="), "the rarity ranking is a window over the VOCABULARY aggregate (vocab-sized, never the corpus); explode/size/verify branches all read the checkpointed token-array table, not the parquet source"),
    "ann_recall_report": (("BNLJ", "scans="), "calibration query BY DESIGN runs both the pruned IVF path and the exact brute-force path over the same table to compare them (query set + centroids broadcast; the BNLJ is the intentional broadcast scoring, as in ann_topk_cosine)"),
    "lsh_recall_metrics": (("BNLJ", "double-scan"), "calibration query BY DESIGN derives both the LSH candidate set and the exact setsim truth set from the same corpus; the three 1-row census counts broadcast-cross into one summary row — O(1) BNLJ"),
    "dsir_importance_weights": (("global-window", "double-scan"), "distribution branch + per-doc scoring branch: the DSIR two-pass shape; the normalizing window runs over the 256-bucket aggregate (model-sized), and the log-ratio table broadcast-joins back"),
    "semdedup_prune": (("BNLJ", "scans=", "double-scan"), "the 32-row seed model is a filtered projection of the corpus table (like kmeans_assign) and broadcasts — O(k) BNLJ; the within-cell pair join is the table on both sides by definition"),
    "decontaminate_fuzzy": ("double-scan", "eval slice stands in for the separate benchmark table; the two scans hash DISJOINT doc slices (filter pushed below the signature pass), so total hashing work is one corpus pass"),
    "cluster_top_terms": (("BNLJ", "scans=", "global-window"), "tf / df / doc-count branches over the corpus: the skew-immune groupBy+join form (like tf_idf); the 1-row doc count broadcast-crosses the vocab-sized score table O(1); the ranking window runs over each cluster's TERM aggregate, never raw docs"),
    "token_budget_planner": ("global-window", "weight normalization runs over the source-cardinality aggregate, never the corpus"),
    "shard_balance_report": ("global-window", "share/ratio windows run over the 16-row shard aggregate, never the corpus"),
    "takedown_promote": ("double-scan", "all-members and surviving-members selections read the same cluster-joined projection (the CC side is checkpointed); a single-pass conditional max_by would hide the survivors filter inside the aggregate for no scan savings at scale"),
    "assoc_rules": (("BNLJ", "scans="), "basket/item-count/order-count branches over the same distinct (order, item) projection: the skew-immune groupBy+join form; the 1-row order count broadcast-crosses O(1) and the item-count side is dimension-sized"),
    "rfm_segments": (("BNLJ", "global-window"), "the three 1-row min/max stat aggregates and the 1-row user count broadcast-cross O(1) per metric (9 total); cumulative windows run over the <=1000-row BIN tables; the per-user profile is localCheckpoint-ed once so the event table is scanned once"),
    "ivf_pq_topk": (("BNLJ", "scans="), "coarse centroids, PQ codebook and query tables are all filtered projections of the corpus table and broadcast (the BNLJs are the model-scoring passes, as in ann_*/kmeans_assign); list selection and ADC lookup are equi-joins on (ccell) and (subspace, centroid)"),
    "pq_ann_topk": (("BNLJ", "scans="), "codebook and query distance tables are filtered projections of the corpus table and broadcast (like ann_*); the ADC lookup join is equi-keyed on (subspace, centroid); corpus touched once per branch by construction"),
    "embedding_pq_codes": (("BNLJ", "double-scan"), "the 16-row codebook is a filtered projection of the corpus table (like kmeans_assign) and broadcast-crosses the 8-row subspace list — O(k*m) BNLJ by construction; encode reads the corpus once"),
    "knn_graph": (("BNLJ", "scans=", "double-scan"), "like semdedup_prune: the seed/coarse models are filtered projections of the corpus table and broadcast (O(sqrt k) BNLJ scoring by construction); the cell-keyed self-join reads the assignment subtree on both sides by definition"),
    "lang_id_ngram_model": (("BNLJ", "scans=", "global-window"), "the 5-row language list and 1-row vocab size broadcast-cross O(1); train/test branches read DISJOINT doc slices and the profile/total branches reread the MODEL-sized trigram profile (langs x vocab), never the corpus; the per-lang totals window also runs over that model table"),
    "dedup_threshold_sweep": ("BNLJ", "the 3-row threshold table non-equi-broadcasts against the CANDIDATE-PAIR table (O(3 x pairs)) and the 1-row corpus count broadcast-crosses into the 3-row sweep — both O(1)-bounded by construction"),
    "quality_percentile_by_source": ("scans=", "stats pass + bin-count pass + output join over the same cheap scored projection: the two-pass histogram form (a per-source percent_rank window would one-task each source); every intermediate is source- or source×bin-sized and broadcasts"),
    "incremental_ingest_dedup": ("scans=", "exact-hash and band branches each read the DISJOINT new/old slices (filters pushed below md5/signature), and the exact-match set feeds both the output and the near-pass anti-join; in production the old side's hash + band incidence is the persisted corpus index (zero recompute), so steady-state cost is hashing the new batch only"),
}


def _scans_outside_cache(jnode) -> int:
    """Count file-scan nodes in the PHYSICAL tree, excluding cached
    subtrees.

    The printed plan re-embeds a cached relation's full subtree at
    EVERY InMemoryTableScan use site (with per-site exprIds) and, for
    adaptive cached plans, prints Initial AND Final sections — a raw
    string count over an iterative cached plan reported 44 scans for
    a pagerank plan that physically scans lineitem once. Walking the
    tree avoids both: InMemoryTableScanExec is a LEAF (its cached
    plan is a field, not a child — one materialization regardless of
    use sites), and AdaptiveSparkPlanExec / QueryStageExec wrappers
    are descended through their current plan exactly once."""
    cls = jnode.getClass().getSimpleName()
    if "InMemoryTableScan" in cls or "ReusedExchange" in cls:
        return 0
    if "FileSourceScan" in cls or "BatchScan" in cls:
        return 1
    if "AdaptiveSparkPlan" in cls:
        return _scans_outside_cache(jnode.executedPlan())
    if "QueryStage" in cls:
        return _scans_outside_cache(jnode.plan())
    n = 0
    it = jnode.children().iterator()
    while it.hasNext():
        n += _scans_outside_cache(it.next())
    return n


def main() -> None:
    spark = get_spark(app_name="audit")
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.01"
    flags, allowed = [], []
    for name, fn in sorted(e.queries().items()):
        try:
            df = fn(spark, sf)
            jplan = df._jdf.queryExecution().executedPlan()
            plan = jplan.toString()
            scans = _scans_outside_cache(jplan)
        except Exception as ex:
            flags.append((name, f"ERROR building plan: {ex}"))
            continue
        notes = []
        bnlj = plan.count("BroadcastNestedLoopJoin")
        cart = plan.count("CartesianProduct")
        reused = plan.count("ReusedExchange")
        if bnlj:
            notes.append(f"BNLJ x{bnlj}")
        if cart:
            notes.append(f"CARTESIAN x{cart}")
        if scans > 2 and not reused:
            notes.append(f"scans={scans}")
        if scans == 2 and not reused and "join" not in name and "pe_mate" not in name:
            notes.append("double-scan?")
        # Unpartitioned window: physically an Exchange SinglePartition
        # feeding a Window — a single reducer holds the whole input,
        # acceptable only when that input is already aggregate-sized.
        if "Window [" in plan and "Exchange SinglePartition" in plan:
            notes.append("global-window")
        if "BatchEvalPython" in plan:
            notes.append("row-python")
        if not notes:
            continue
        allow = ALLOW.get(name)
        prefixes = ()
        if allow:
            prefixes = allow[0] if isinstance(allow[0], tuple) else (allow[0],)
        rest = [n for n in notes if not any(n.startswith(p) for p in prefixes)]
        if rest:
            flags.append((name, ", ".join(rest)))
        else:
            allowed.append((name, ", ".join(notes), allow[1]))
    for n, f in flags:
        print(f"FLAG  {n}: {f}")
    for n, f, why in allowed:
        print(f"ok    {n}: {f} — {why}")
    print(f"\n{len(flags)} flagged, {len(allowed)} allowed-intentional, of {len(e.queries())}")
    spark.stop()
    if flags:
        sys.exit(1)


if __name__ == "__main__":
    main()
