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

NOTE (r9): the never-checked backlog closed in r8 — every registered
query now has at least one external green. The window policy since is
CHANGED-CODE first (every query whose plan or library path moved this
round), then the stalest external greens; this script's
never-checked fill is only relevant again if new operators land
faster than 50/round. See __spark_entry__._PRIORITY's comment for the
current round's rationale.
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
RECHECK = [
    # r8: the three r7 external reds, reshaped to driver-hashable
    # scalar outputs (VERDICT r7 item 1) — MUST lead the window.
    "embedding_normalize", "embedding_quantize", "embedding_pq_codes",
    # r8: late-r7 code changes that landed after the r7 window froze
    # (curated-layout detection / ingest pre-aggregation).
    "dedup_exact", "pipeline_rna", "funnel_conversion",
    "incremental_ingest_dedup",
]

# Never-checked queries to front-load before registry-order fill.
# r8: the latent array-output fix + the new r7 operators.
FRONT = [
    "quality_features_vector",
    "cluster_safe_split", "split_leakage_report",
    "minhash_containment", "minhash_jaccard_estimate", "top_event_paths",
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
