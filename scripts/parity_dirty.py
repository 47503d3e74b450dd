"""Cross-engine parity on DIRTY data — the instrument that closed the
r11 latent-divergence class.

`scripts/selfcheck.py` proves op == oracle on the CLEAN sf tables, and
`scripts/adversarial_sweep.py` proves nothing RAISES on crawl-shaped
dirt — but neither proves the two engines still AGREE on that dirt,
which is exactly where the r10/r11 advisor findings lived (NULL
ranking, '' vs NULL rendering, engine-specific regex anchors,
adaptive-k counts shifting under NULLs). This script runs every
`queries()` entry AND its DuckDB oracle over the adversarial datasets
(built/reused via adversarial_sweep._build) and compares results as
multisets.

Float tolerance: cells are rounded to 6 dp before comparison — dirty
data changes aggregation populations, so order-dependent double sums
can legitimately differ in the last ulps between engines; the driver's
full-precision gate only ever runs on clean data, where
scripts/selfcheck.py remains the exact mirror.

Usage: python scripts/parity_dirty.py [mode[,mode...]] [query ...]
Modes: nulls (default) | nullkeys | degenerate | combined | unicode |
nonfinite | nonfinite_metrics (the last is a KNOWN-RED probe — the
r13 metric-value contract head; see adversarial_sweep). Exit 1 on
any divergence or error.
"""

from __future__ import annotations

import importlib.util
import math
import os
import sys
from collections import Counter

import duckdb

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import __spark_entry__ as entrymod  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# Entries whose SQL is only a rows-shape oracle, or whose Spark side is
# a side-effecting sink/stream the clean selfcheck already special-cases
# — mirrored from selfcheck's skip logic by running everything and
# letting genuinely non-deterministic entries be listed here explicitly.
SKIP: set = set()


def _norm(v):
    if v is None:
        return None
    import decimal

    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        # NaN maps to a SENTINEL, never to None: NaN-vs-NULL is itself
        # a cross-engine rendering divergence this instrument must see
        # (r11 review) — only matching NaN on both sides is parity.
        return "NaN" if math.isnan(v) else round(v, 6)
    try:
        import numpy as np

        if isinstance(v, np.integer):
            return int(v)
        if isinstance(v, np.floating):
            f = float(v)
            return "NaN" if math.isnan(f) else round(f, 6)
        if isinstance(v, np.bool_):
            return bool(v)
    except Exception:
        pass
    return v


def _load_sweep():
    spec = importlib.util.spec_from_file_location(
        "adversarial_sweep", os.path.join(_REPO, "scripts", "adversarial_sweep.py")
    )
    sweep = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sweep)
    return sweep


def run_parity(
    spark, mode: str, names: list[str], data_dir: str | None = None
) -> list[str]:
    """Run `names` (queries() entries with oracles) and their DuckDB
    oracles over the adversarial dataset for `mode`; return the
    failure lines (empty = parity). Importable so the CI suite can run
    the window head each full pytest pass (VERDICT r11 item 4).

    ``data_dir`` overrides the dataset: the queries and oracles run
    over that directory's parquet tables instead of building the
    ``mode`` mutation (used by parity_partitioning.py, which perturbs
    the PHYSICAL layout rather than the values — the compare loop is
    deliberately shared so both instruments agree on normalization
    and tolerance)."""
    qs = entrymod.queries()
    orc = entrymod.oracle_sql()
    adv = data_dir if data_dir is not None else _load_sweep()._build(spark, mode)
    con = duckdb.connect()
    failures: list[str] = []
    try:
        for t in TABLES:
            p = os.path.join(adv, f"{t}.parquet")
            pat = f"{p}/*.parquet" if os.path.isdir(p) else p
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")
        for name in names:
            try:
                sdf = qs[name](spark, adv)
                cols = sorted(sdf.columns)
                got = Counter(
                    tuple(_norm(v) for v in r) for r in sdf.select(*cols).collect()
                )
                cur = con.execute(orc[name])
                ocols = [d[0] for d in cur.description]
                order = [ocols.index(c) for c in sorted(ocols)]
                # fetchall keeps native Python types (datetime.date for
                # DATE, None for NULL) — fetchdf's pandas coercion turns
                # DATE into midnight Timestamps and NULL into NaT, which
                # can never equal Spark's values
                want = Counter(
                    tuple(_norm(row[i]) for i in order) for row in cur.fetchall()
                )
            except Exception as ex:
                failures.append(
                    f"ERR  [{mode}] {name}: {str(ex).splitlines()[0][:140]}"
                )
                continue
            if got != want:
                failures.append(
                    f"DIVERGE [{mode}] {name}: spark {sum(got.values())} rows, "
                    f"oracle {sum(want.values())}; e.g. spark-only "
                    f"{list((got - want).keys())[:1]} oracle-only "
                    f"{list((want - got).keys())[:1]}"
                )
    finally:
        con.close()
    return failures


def main() -> None:
    modes = (sys.argv[1] if len(sys.argv) > 1 else "nulls").split(",")
    only = set(sys.argv[2:])

    from seqdatapipeline_spark.session import get_spark

    spark = get_spark(app_name="parity-dirty", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    orc = entrymod.oracle_sql()
    names = sorted(
        n for n in qs if n in orc and n not in SKIP and (not only or n in only)
    )
    if only:
        unknown = sorted(only - set(names))
        if unknown:
            # a typo'd name must never produce a green 0-of-0 run
            print(f"unknown queries: {unknown}", file=sys.stderr)
            sys.exit(2)
    failed = 0
    for mode in modes:
        failures = run_parity(spark, mode, names)
        for line in failures:
            print(line, flush=True)
        print(f"[{mode}] {len(failures)} divergent/error of {len(names)}")
        failed += len(failures)
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
