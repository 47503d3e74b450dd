"""Generate PLANS.md: the executed physical plan of each flagship
query with the scale-relevant features called out. Regenerate after
plan-shaping changes; tests/test_plans.py pins the same properties
mechanically — this file is the human-readable evidence."""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from seqdatapipeline_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"

# query -> what to look for, one line of commentary
FLAGSHIPS = {
    "feature_interval_join": "interval-COUNT rewrite, density-dispatched (interval_count_adaptive): sparse route shown here at sf0.01 - interior bins hit the pre-aggregated bin table, only edge bins touch raw points; dense inputs switch to the prefix-sum interior (two F-lookups per interval); no BNLJ, no pair materialization on either route",
    "pe_mate_join": "single scan + hash groupBy + explode replaces the two-scan self-join; no join operator, no sort, mate filter pushed to parquet",
    "dedup_minhash_lsh": "shingle -> K-M double-hashed signature -> band equi-join; pairs generated inside buckets, never a table self-join",
    "dedup_spans_exact": "skew-immune C4 span dedup: groupBy-min on the span hash (partial agg collapses hot boilerplate spans map-side), no window, no span-stream join",
    "metrics_interval_join": "band dim folded into a codegen CASE chain - no join operator against the band table at all",
    "contact_lookup_join": "explicit broadcast of the dim side; the fact side never shuffles",
    "ann_topk_cosine": "broadcast query set, per-query ranking window; corpus scanned once (the nested-loop join IS the broadcast scoring pass - intentional, allow-listed in plan_audit)",
    "embedding_covariance": "Arrow-batched centered Gramian partials; shuffle volume dims^2 per batch, independent of row count",
    "pagerank_iter": "3 Pregel rounds as equi-join + map-side-combinable groupBy; mirror-aware build (r12): degrees AND the node set derive from one endpoint-explode over the persisted half-edge set, the mirrored union is never cached, rounds reuse the groupBy exchange; no cartesian, no driver state beyond the node count",
    "kmeans_assign": "broadcast 8-row seed model; Catalyst cosine fold (zero Python); argmax via max(struct) aggregate, never a per-vector window",
    "approx_quantile_bins": "two-pass histogram quantile: min/max pass + bin pass; cumulative window runs over <=1000 BINNED rows per group, never facts; 3-row probs table broadcast-crossed O(1)",
    "triangle_count": "oriented wedge equi-join over localCheckpoint-ed edges; wedges computed from the degree table, never enumerated; 1-row census aggregates broadcast-crossed",
    "setsim_prefix_join": "PPJoin over DISTINCT content (exact-dup collapse + member fan-out): rarest-first (document-frequency) token order via one df groupBy + skew-routed join-back, candidates from the prefix equi-join with length + positional filters applied BEFORE any shuffle, exact array_intersect verify, distinct on the qualified output only; zero false negatives by construction",
    "dsir_importance_weights": "DSIR two-pass: 256-bucket distribution aggregate (map-side combinable), log-ratio model broadcast-joined back, per-doc sum; normalizing window runs over the bucket aggregate, never the corpus",
    "semdedup_prune": "two-level adaptive-k assignment (coarse argmax over sqrt(k) broadcast centroids, fine argmax within the matched coarse cell — O(N*sqrt(k)), not O(N*k)), then a cell-keyed self equi-join; per-cell population bounded by k ~ N/16 so the pair join stays linear",
    "incremental_ingest_dedup": "new-batch-vs-corpus: exact md5 equi-join, then LSH band equi-join for survivors (left_anti on the exact set); filters pushed below the hash/signature passes so the two scans cover disjoint slices",
    "pq_ann_topk": "PQ asymmetric-distance search: per-query 8x16 distance table broadcast, database codes scored by equi-keyed (subspace, centroid) lookup join + sum; no float vector touched at search time",
    "ivf_pq_topk": "combined IVF+PQ: probe top-2 coarse cells (equi-join on ccell), ADC-score only those lists' codes; all models broadcast, compute touches n_probe/n_cells of the index",
}

MARKERS = [
    ("BroadcastHashJoin", "broadcast join"),
    ("SortMergeJoin", "sort-merge join"),
    ("BroadcastNestedLoopJoin", "!! nested-loop join"),
    ("CartesianProduct", "!! cartesian"),
    ("Window", "window"),
    ("HashAggregate", "hash aggregate"),
    ("ObjectHashAggregate", "object hash aggregate"),
    ("ArrowEvalPython", "arrow python"),
    ("BatchEvalPython", "!! row-python"),
    ("PushedFilters: \\[[^]]", "filter pushdown"),
]


def main() -> None:
    spark = get_spark(app_name="gen_plans")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    out = [
        "# PLANS — flagship physical plans",
        "",
        "Auto-generated by `scripts/gen_plans.py` at sf0.01 (plans are",
        "shape-stable across sf; AQE may further coalesce at runtime).",
        "`tests/test_plans.py` pins these properties mechanically; this",
        "file is the readable evidence. `!!` marks patterns plan_audit",
        "flags unless allow-listed with a reason (scripts/plan_audit.py",
        "ALLOW — e.g. ann_topk_cosine's intentional broadcast-scoring",
        "nested loop).",
        "",
    ]
    for name, note in FLAGSHIPS.items():
        df = queries[name](spark, SF_DIR)
        # materialize so AQE finalizes: the printed plan then carries
        # the *(n) whole-stage-codegen markers and runtime join choices
        df.write.format("noop").mode("overwrite").save()
        plan = df._jdf.queryExecution().executedPlan().toString()
        found = []
        for pat, label in MARKERS:
            n = len(re.findall(pat, plan))
            if n:
                found.append(f"{label} x{n}")
        scans = plan.count("Scan parquet")
        out.append(f"## {name}")
        out.append("")
        out.append(f"*{note}*")
        out.append("")
        out.append(
            f"`{scans} parquet scan(s)` · " + " · ".join(f"`{f}`" for f in found)
        )
        out.append("")
        # first 40 plan lines: the operator tree (details sections are cut)
        tree = plan.split("\n\n")[0].splitlines()[:40]
        out.append("```")
        out.extend(tree)
        out.append("```")
        out.append("")
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote PLANS.md: {len(FLAGSHIPS)} flagship plans")
    spark.stop()


if __name__ == "__main__":
    main()
