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

# Already-checked queries whose implementation changed this round:
# re-verify the NEW code path externally even though an older round
# passed them (placed right after the canaries).
RECHECK = [
    "setsim_prefix_join",     # r6: df-order prefix + positional filter
    "setsim_clusters",        # r6: same pipeline + late dedupe
]

# Never-checked queries to front-load before registry-order fill.
# r6: the 16 SURVEY §2.8 scalars (core reference surface, never in a
# driver window), the pipeline composites (the reference's actual
# user-facing loop), and the two streaming-tier locals.
FRONT = [
    "strip_fastq_suffix", "common_prefix_pair_key", "xml_tag_extract",
    "username_from_email", "basename", "csv_join_split", "key_concat",
    "mate_number_parse", "abs_int_cast", "format_fixed6", "date_stamp",
    "elapsed_hours", "octal_mode_parse", "chr_decode", "reversed_join",
    "sci_notation_num",
    "pipeline_rna", "pipeline_chip", "pipeline_atac",
    "stream_minhash_dedup", "stream_session_windows",
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
