"""Compute the next driver priority window (__spark_entry__._PRIORITY).

The external driver hash-checks only the FIRST 50 `queries()` entries
per round (observed cap, CORRECTNESS_r02-r04), but the registry holds
209. To convert the whole surface from locally-mirrored to EXTERNALLY
verified, each round keeps a fixed canary set (flagship + one per
operator family, so regressions in the core surface are still caught
every round) and fills the remaining slots with registered queries
that have never appeared in any CORRECTNESS_r*.json.

Usage: python scripts/rotate_window.py
Prints the proposed window as a Python list literal (paste into
__spark_entry__._PRIORITY) plus coverage stats. Deterministic: fills
in registry order, so reruns within a round agree.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WINDOW = 50

# Repeat slots. Policy since r7 (133/210 externally green, zero
# failures ever, full surface mirrored locally every pytest run):
# spend repeat slots ONLY on two family sentinels plus whatever code
# CHANGED in the current round — edit RECHECK per round — and give
# every remaining slot to first-timers.
CANARIES = [
    "form_scan",        # §2.1 scans/sinks sentinel
    "gene_read_count",  # §2.4 agg sentinel
]

# Queries whose implementation changed this round: re-verify the NEW
# code path externally even though an older round passed them.
# r8 note: late-r7 changes landed AFTER the r7 window was fixed —
# recheck dedup_exact, pipeline_rna, incremental_ingest_dedup,
# funnel_conversion (curated-layout detection / pre-aggregation);
# minhash_jaccard_estimate, minhash_containment, top_event_paths,
# cluster_safe_split, split_leakage_report are still never-checked
# and belong in FRONT.
RECHECK = [
    # r7: zero-norm guards, LSH band cap, layout fast paths, probe fold
    "dedup_minhash_lsh", "semdedup_prune", "feature_interval_join",
    "pe_mate_join", "dedup_alignments",
]

# Never-checked queries to front-load before registry-order fill.
# r7: the VERDICT item-1 headliners + the remaining streaming tier.
FRONT = [
    "ivf_pq_topk", "knn_graph", "lm_doc_score", "pagerank_weighted",
    "dataset_split", "bm25_topk", "lang_id_ngram_model", "pagerank_iter",
    "stream_late_monitor", "stream_quantile_sketch", "stream_vocab_topk",
    "dedup_minhash_clusters", "dedup_embedding_clusters",
]


def main() -> None:
    import __spark_entry__ as entrymod

    registered = list(entrymod.queries().keys())
    checked: set[str] = set()
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        with open(path) as f:
            checked |= set(json.load(f))
    never = [n for n in registered if n not in checked]
    recheck = [n for n in RECHECK if n in registered and n not in CANARIES]
    front = [
        n for n in FRONT if n in never and n not in CANARIES and n not in recheck
    ]
    rest = [
        n
        for n in never
        if n not in CANARIES and n not in front and n not in recheck
    ]
    fill = (recheck + front + rest)[: WINDOW - len(CANARIES)]
    window = CANARIES + fill
    n_new = len([n for n in fill if n in never])
    print(f"# registered={len(registered)} ever-checked={len(checked)} "
          f"never-checked={len(never)}")
    print(f"# window: {len(CANARIES)} canaries + {len(recheck)} rechecks + "
          f"{n_new} first-time; {len(never) - n_new} still waiting")
    print("_PRIORITY = [")
    for n in window:
        print(f'    "{n}",')
    print("]")


if __name__ == "__main__":
    main()
