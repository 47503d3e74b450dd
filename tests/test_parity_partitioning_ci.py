"""CI shape for the partition-invariance instrument: each full suite
re-proves that the correctness-window head's answers do not depend on
the physical layout of the input (file count, row order) or on the
shuffle-partition count — the "stable on local[32], flips on a
1000-executor cluster" bug class that no fixed-layout oracle run can
see. Scope mirrors tests/test_parity_dirty_ci.py: the 50-entry window
head under one scrambled seed; the full 220x2-seed sweep stays a
round-boundary ritual (scripts/parity_partitioning.py)."""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (REPO, os.path.join(REPO, "scripts")):
    if p not in sys.path:
        sys.path.insert(0, p)


def test_window_head_partition_invariance(spark):
    import __spark_entry__ as entrymod
    import parity_partitioning as pp_mod

    qs = entrymod.queries()
    orc = entrymod.oracle_sql()
    head = [n for n in list(qs.keys())[:50] if n in orc]
    failures = pp_mod.run_invariance(spark, 1, head)
    assert not failures, "\n".join(failures)


def test_scramble_preserves_logical_content(spark):
    """The instrument's own soundness: the scrambled copy must be a
    logical no-op (same multiset of rows) while actually changing the
    physical layout — otherwise a green sweep proves nothing."""
    import glob

    import parity_partitioning as pp_mod

    # customer, not orders: under seed 1 the per-(table, seed) choice
    # gives customer a multi-file layout (orders legitimately draws 1).
    out = pp_mod.build_scrambled(spark, 1)
    src_df = spark.read.parquet(f"{pp_mod.SRC}/customer.parquet")
    scr_path = os.path.join(out, "customer.parquet")
    scr_df = spark.read.parquet(scr_path)
    assert src_df.count() == scr_df.count()
    assert src_df.exceptAll(scr_df).count() == 0
    assert scr_df.exceptAll(src_df).count() == 0
    # layout really changed: canonical testdata is single-file
    n_files = len(glob.glob(os.path.join(scr_path, "part-*.parquet")))
    assert n_files > 1, "scramble produced a single file — no layout change"
