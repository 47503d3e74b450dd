"""Propose the next driver priority window (__spark_entry__._PRIORITY).

The external driver hash-checks only the FIRST 50 `queries()` entries
per round. Since r8 every registered query has at least one external
green, so the steady-state policy (declared in __spark_entry__ and
VERDICT r9/r10) is:

1. RECHECK — queries whose implementation changed this round (edit
   the list below per round; the new code path must re-verify
   externally even though an older round passed it);
2. the two family CANARIES, every round;
3. never-checked queries (new operators that landed since the last
   window froze);
4. fill with the STALEST external greens — oldest last-green round
   first, registry order within a round.

Usage: python scripts/rotate_window.py
Prints a staleness ledger (how many queries' last green is per round)
and the proposed window as a Python list literal (paste into
__spark_entry__._PRIORITY). Deterministic for a given set of
CORRECTNESS_r*.json files.

A query counts as green-in-round-N when its CORRECTNESS_rN entry has
rows/schema/hash all true (hash may be absent for rows-only checks —
those count too; an entry with err or a false flag does NOT).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WINDOW = 50

CANARIES = [
    "form_scan",        # §2.1 scans/sinks sentinel
    "gene_read_count",  # §2.4 agg sentinel
]

# Queries whose implementation changed this round — edit per round.
# r11: the four late-r10 operators are listed under never-checked
# automatically; nothing else is queued yet.
RECHECK: list[str] = []


def _passed(entry: dict) -> bool:
    if entry.get("err"):
        return False
    flags = [
        entry.get(k)
        for k in ("rows_match", "schema_match", "hash_match")
        if k in entry
    ]
    return bool(flags) and all(f is not False for f in flags)


def main() -> None:
    import __spark_entry__ as entrymod

    registered = list(entrymod.queries().keys())
    last_green: dict[str, int] = {}
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", os.path.basename(path))
        rnd = int(m.group(1)) if m else 0
        with open(path) as f:
            data = json.load(f)
        for name, entry in data.items():
            if isinstance(entry, dict) and _passed(entry):
                last_green[name] = max(last_green.get(name, 0), rnd)
    never = [n for n in registered if n not in last_green]
    ledger: dict[int, int] = {}
    for n in registered:
        ledger[last_green.get(n, 0)] = ledger.get(last_green.get(n, 0), 0) + 1
    print("# staleness ledger (last external green round -> #queries;"
          " 0 = never checked):")
    for rnd in sorted(ledger):
        print(f"#   r{rnd}: {ledger[rnd]}")
    recheck = [n for n in RECHECK if n in registered and n not in CANARIES]
    head = CANARIES + recheck
    fresh = [n for n in never if n not in head]
    stale = sorted(
        (n for n in registered if n in last_green and n not in head),
        key=lambda n: (last_green[n], registered.index(n)),
    )
    window = (head + fresh + stale)[:WINDOW]
    print(f"# registered={len(registered)} never-checked={len(never)} "
          f"window: {len(CANARIES)} canaries + {len(recheck)} rechecks + "
          f"{len([n for n in window if n in fresh])} first-time + "
          f"{len([n for n in window if n in stale])} stalest")
    print("_PRIORITY = [")
    for n in window:
        tag = "never checked" if n in fresh else f"last green r{last_green.get(n, 0)}"
        print(f'    "{n}",  # {tag}')
    print("]")


if __name__ == "__main__":
    main()
