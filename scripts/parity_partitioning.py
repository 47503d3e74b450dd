"""Partition-invariance parity — results must not depend on the
PHYSICAL layout of the input.

Every other instrument (selfcheck, parity_dirty, the driver's external
gate) runs Spark over the canonical testdata layout with a pinned
shuffle-partition count, so a query whose answer depends on input
partitioning — an under-specified window tie, a `first()` without
ordering, `monotonically_increasing_id`, a sample keyed off partition
ids — can be stably green on local[32] at sf0.001 and still flip
answers on a 1000-executor cluster where the scan splits differently.
That is precisely the class of bug "works on 60k rows" misses.

This script rebuilds the sf0.001 tables with a seeded-scrambled
physical layout (rows shuffled across a different file count per
table, per seed) and re-runs every `queries()` entry against its
DuckDB oracle over the SAME logical data via
`parity_dirty.run_parity(..., data_dir=...)` — the compare loop is
shared so tolerance and normalization are identical. The oracle is
layout-blind, so any divergence is the Spark side depending on
physical layout. A second knob re-runs with a different
`spark.sql.shuffle.partitions`, varying post-shuffle layout too.

Usage: python scripts/parity_partitioning.py [seed[,seed...]] [query ...]
Default seeds: 1,2. Exit 1 on any divergence or error.
"""

from __future__ import annotations

import importlib.util
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for _p in (_REPO, os.path.join(_REPO, "scripts")):
    if _p not in sys.path:
        sys.path.insert(0, _p)

import __spark_entry__ as entrymod  # noqa: E402

SRC = "/root/testdata/sf0.001"

# Prime-ish file counts chosen per (table, seed) — deliberately NOT the
# canonical single-file layout and NOT uniform across tables, so scan
# splits, empty partitions, and skewed file sizes all occur.
_PART_CHOICES = [1, 2, 3, 5, 7, 11]

# shuffle.partitions per seed — canonical instruments pin 8; varying it
# moves every exchange's output layout (window ties, agg input order).
_SHUFFLE_FOR_SEED = {1: 5, 2: 13}


def _load(name: str):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(_REPO, "scripts", f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def build_scrambled(spark, seed: int) -> str:
    """Write a copy of the sf0.001 tables whose physical layout is a
    seeded scramble: each table's rows are redistributed across a
    per-(table, seed) file count and reordered within files. Logical
    content is byte-identical to SRC. Idempotent per seed (reused if
    the marker file exists)."""
    from pyspark.sql import functions as F

    pd_mod = _load("parity_dirty")
    out = f"/tmp/spark-graft-partinv-{seed}"
    marker = os.path.join(out, "_sg_complete")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    for i, t in enumerate(pd_mod.TABLES):
        n = _PART_CHOICES[(i + seed) % len(_PART_CHOICES)]
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        # rand(seed) is evaluated per-row against the SOURCE layout
        # (stable: canonical testdata), so the scramble is reproducible.
        (
            df.withColumn("__r", F.rand(seed * 1000 + i))
            .repartition(n, "__r")
            .sortWithinPartitions("__r")
            .drop("__r")
            .write.mode("overwrite")
            .parquet(os.path.join(out, f"{t}.parquet"))
        )
    with open(marker, "w") as fh:
        fh.write("ok\n")
    return out


def run_invariance(spark, seed: int, names: list[str]) -> list[str]:
    """Scramble the layout for `seed`, set that seed's
    shuffle-partition count, and run the shared op-vs-oracle compare
    over the scrambled directory. Importable for the CI test."""
    pd_mod = _load("parity_dirty")
    adv = build_scrambled(spark, seed)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(_SHUFFLE_FOR_SEED.get(seed, 8)),
    )
    try:
        return pd_mod.run_parity(spark, f"partinv-{seed}", names, data_dir=adv)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def main() -> None:
    seeds = [int(s) for s in (sys.argv[1] if len(sys.argv) > 1 else "1,2").split(",")]
    only = set(sys.argv[2:])

    from seqdatapipeline_spark.session import get_spark

    spark = get_spark(app_name="parity-partitioning", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    orc = entrymod.oracle_sql()
    names = sorted(n for n in qs if n in orc and (not only or n in only))
    if only:
        unknown = sorted(only - set(names))
        if unknown:
            print(f"unknown queries: {unknown}", file=sys.stderr)
            sys.exit(2)
    failed = 0
    for seed in seeds:
        failures = run_invariance(spark, seed, names)
        for line in failures:
            print(line, flush=True)
        print(f"[seed {seed}] {len(failures)} divergent/error of {len(names)}")
        failed += len(failures)
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
