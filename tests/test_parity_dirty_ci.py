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


# The metric-tier non-finite contract is deliberately deferred to r13
# (window-capacity, see adversarial_sweep._mutate_nonfinite_metrics) —
# these 14 queries are the documented known-red set of that mode,
# measured r12. The quarantine test below keeps the deferral honest:
# the set may only SHRINK (contracts landing), never grow silently.
NONFINITE_METRICS_KNOWN_RED = {
    "abs_int_cast", "anomaly_zscore", "approx_quantile_bins",
    "coverage_bin_count", "format_fixed6", "fragment_length_histogram",
    "hist_tsv_sink", "mad_outliers", "peak_call_bh", "peak_call_islands",
    "pipeline_chip", "sci_notation_num", "stream_quantile_sketch",
    "value_percentiles",
}


def test_nonfinite_metrics_known_red_is_pinned(spark):
    """Run the KNOWN-RED mode over its quarantine list plus a few
    green sentinels: every failure must be IN the list (a new name
    here is a fresh regression hiding behind 'that mode is red
    anyway'), and the instrument must still detect at least one of
    the documented divergences (a silently-green probe would mean the
    injection rotted). Fixing entries early only shrinks the set —
    that passes; update the list when the r13 contracts land."""
    import parity_dirty as pd_mod

    sentinels = ["weekly_active_users", "rolling_7d_avg", "token_count"]
    names = sorted(NONFINITE_METRICS_KNOWN_RED) + sentinels
    failures = pd_mod.run_parity(spark, "nonfinite_metrics", names)
    failed_names = {f.split("] ", 1)[1].split(":", 1)[0] for f in failures}
    unexpected = failed_names - NONFINITE_METRICS_KNOWN_RED
    assert not unexpected, (
        f"NEW nonfinite_metrics divergences outside the quarantine "
        f"list: {sorted(unexpected)}\n" + "\n".join(failures)
    )
    assert failed_names, (
        "nonfinite_metrics detected nothing — the injection or the "
        "probe has rotted (or the r13 contracts landed: update the "
        "quarantine list and the mode docs)"
    )


def test_window_head_parity_on_nulls(spark):
    import __spark_entry__ as entrymod
    import parity_dirty as pd_mod

    qs = entrymod.queries()
    orc = entrymod.oracle_sql()
    head = [n for n in list(qs.keys())[:50] if n in orc and n not in pd_mod.SKIP]
    failures = pd_mod.run_parity(spark, "nulls", head)
    assert not failures, "\n".join(failures)
