"""CI shape for the dirty-parity instrument (VERDICT r11 item 4): the
full suite re-proves cross-engine agreement on NULL-ridden data for
the CURRENT correctness-window head, so the instrument cannot rot
between rounds — a NULL-contract edit that diverges on dirt fails
pytest the same day it lands, not at the next manual sweep.

Scope: nulls mode (the adversarial class every r10/r11 finding lived
in) over the window head — the 50 entries the external driver will
hash-check next round, i.e. exactly the queries whose code changed
most recently. The full 220x3 sweep stays a round-boundary ritual
(scripts/parity_dirty.py)."""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (REPO, os.path.join(REPO, "scripts")):
    if p not in sys.path:
        sys.path.insert(0, p)


def test_window_head_parity_on_nulls(spark):
    import __spark_entry__ as entrymod
    import parity_dirty as pd_mod

    qs = entrymod.queries()
    orc = entrymod.oracle_sql()
    head = [n for n in list(qs.keys())[:50] if n in orc and n not in pd_mod.SKIP]
    failures = pd_mod.run_parity(spark, "nulls", head)
    assert not failures, "\n".join(failures)
