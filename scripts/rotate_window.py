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

# Flagship + one per family — re-checked every round.
CANARIES = [
    "form_scan",              # §2.1 scans/sinks
    "filter_tlen_range",      # §2.2 filters
    "pe_mate_join",           # §2.3 self-join
    "feature_interval_join",  # flagship interval join
    "gene_read_count",        # §2.4 grouped agg
    "peak_call",              # §2.5 windows
    "union_inputs",           # §2.7 set ops
    "stream_windowed_counts", # §2.9 streaming
    "dedup_exact",            # dedup: hash
    "dedup_minhash_lsh",      # dedup: LSH
    "dedup_clusters",         # dedup: connected components
    "ann_ivf_topk",           # similarity search
    "pack_sequences",         # corpus prep
    "text_quality_score",     # text analysis
    "semdedup_prune",         # data selection
]

# Never-checked queries to front-load before registry-order fill —
# list ops whose implementation changed this round here, so the
# driver externally verifies the NEW code path immediately.
FRONT = [
    "setsim_clusters",        # r5: exact-dup pre-collapse rewrite
    "lsh_recall_metrics",     # r5: arithmetic count decomposition
    "decontaminate_ngram",    # r5: train-side rep collapse
]


def main() -> None:
    import __spark_entry__ as entrymod

    registered = list(entrymod.queries().keys())
    checked: set[str] = set()
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        with open(path) as f:
            checked |= set(json.load(f))
    never = [n for n in registered if n not in checked]
    front = [n for n in FRONT if n in never and n not in CANARIES]
    rest = [n for n in never if n not in CANARIES and n not in front]
    fill = (front + rest)[: WINDOW - len(CANARIES)]
    window = CANARIES + fill
    print(f"# registered={len(registered)} ever-checked={len(checked)} "
          f"never-checked={len(never)}")
    print(f"# window: {len(CANARIES)} canaries + {len(fill)} rotation; "
          f"{len(never) - len(fill)} still waiting after this round")
    print("_PRIORITY = [")
    for n in window:
        print(f'    "{n}",')
    print("]")


if __name__ == "__main__":
    main()
