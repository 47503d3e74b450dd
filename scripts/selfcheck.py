"""Local mirror of the driver's correctness gate: run every
`queries()` entry on Spark and its `oracle_sql()` twin on DuckDB at
sf0.01, compare row count, sorted column names, and an
order-insensitive value hash. Prints one line per query and a final
summary; exit code 1 if any mismatch.

Usage: python scripts/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import traceback

import duckdb

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import __spark_entry__ as entrymod  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if v is None:
        return ""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        # Full precision (repr round-trips the exact double). %.6g
        # masked CORRECTNESS_r08's quantile_normalize red: a 1-ulp
        # flip in the 6th DECIMAL of a 5-digit-integer-part value is
        # invisible at 6 SIGNIFICANT digits. The driver hashes at
        # full precision; the mirror must too.
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_norm(v[k])}" for k in sorted(v)) + "}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def value_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(_norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]) else "/root/testdata/sf0.01"
    only = set(sys.argv[2:]) if len(sys.argv) > 2 else (
        set(sys.argv[1:2]) - {sf_dir} if len(sys.argv) > 1 and not os.path.isdir(sys.argv[1]) else None
    )
    if only is not None and not only and len(sys.argv) > 1 and not os.path.isdir(sys.argv[1]):
        only = set(sys.argv[1:])

    from seqdatapipeline_spark.session import get_spark

    spark = get_spark(app_name="selfcheck")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    fails, oks, rows_only = [], 0, 0
    names = sorted(queries) if not only else sorted(n for n in queries if n in only)
    for name in names:
        try:
            sdf = queries[name](spark, sf_dir)
            scols = list(sdf.columns)
            srows = [tuple(r) for r in sdf.collect()]
        except Exception:
            fails.append(name)
            print(f"FAIL  {name}: spark raised\n{traceback.format_exc()}")
            continue
        if name in oracles:
            # The driver's pandas canonicalizer cannot hash array/map
            # cells (CORRECTNESS_r07 embedding trio): oracle-checked
            # outputs must be scalar-only.
            from pyspark.sql.types import ArrayType, MapType, StructType

            bad = [
                f.name
                for f in sdf.schema.fields
                if isinstance(f.dataType, (ArrayType, MapType, StructType))
            ]
            if bad:
                fails.append(name)
                print(f"FAIL  {name}: non-driver-hashable output columns {bad}")
                continue
        if name not in oracles:
            rows_only += 1
            print(f"rows  {name}: {len(srows)} rows (no oracle)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            fails.append(name)
            print(f"FAIL  {name}: oracle raised {e}")
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rows {len(srows)} vs {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} vs {sorted(ocols)}")
        elif value_hash(scols, srows) != value_hash(ocols, orows):
            problems.append("value-hash mismatch")
        if problems:
            fails.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            oks += 1
            print(f"ok    {name}: {len(srows)} rows")
    print(f"\n{oks} ok, {rows_only} rows-only, {len(fails)} FAIL: {fails}")
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
