"""Adversarial-corpus sweep: run EVERY queries() entry against a
mutated copy of sf0.001 and report operators that crash instead of
producing rows. The correctness gate proves parity on clean data;
this is the complement — crawl-shaped dirt (NULL payloads, NULL keys,
empty/whitespace text, zero vectors) must degrade to NULL/absent rows
per SQL semantics, never to a mid-job exception.

Modes (comma-separable):
  nulls     NULL text/lang/source (documents), NULL embedding/label
            (embeddings), NULL value/props (events) — found the seven
            r9 vector/format crashes (see test_adversarial_corpus_
            nulls_no_crashes).
  nullkeys  NULL user_id/event_type/ts (events) — windows put NULL
            keys in their own partition, equi-joins drop them.
  degenerate  empty/whitespace/sub-shingle texts, zero-norm vectors —
            the r8 ANSI DIVIDE_BY_ZERO class (see
            test_adversarial_corpus_no_ansi_crashes).

Usage: python scripts/adversarial_sweep.py [mode[,mode...]] [query ...]
Exit 1 if anything raises. ~7 min per mode for the full surface.
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

SRC = "/root/testdata/sf0.001"
BASE_TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
]


def _build(spark, mode: str) -> str:
    adv = f"/tmp/spark-graft-adv-{mode}"
    os.makedirs(adv, exist_ok=True)
    for t in BASE_TABLES:
        p = f"{adv}/{t}.parquet"
        if not os.path.exists(p):
            spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(p)

    from seqdatapipeline_spark.registry import _t

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    ev = _t(spark, SRC, "events")
    if mode == "nulls":
        docs = (
            docs.withColumn("text", F.when(F.col("doc_id") % 7 == 0, F.lit(None).cast("string")).otherwise(F.col("text")))
            .withColumn("lang", F.when(F.col("doc_id") % 5 == 0, F.lit(None).cast("string")).otherwise(F.col("lang")))
            .withColumn("source", F.when(F.col("doc_id") % 6 == 0, F.lit(None).cast("string")).otherwise(F.col("source")))
        )
        emb = (
            emb.withColumn("embedding", F.when(F.col("vec_id") % 9 == 0, F.lit(None).cast(emb.schema["embedding"].dataType)).otherwise(F.col("embedding")))
            .withColumn("label", F.when(F.col("vec_id") % 8 == 0, F.lit(None).cast("string")).otherwise(F.col("label")))
        )
        ev = (
            ev.withColumn("value", F.when(F.col("event_id") % 7 == 0, F.lit(None).cast("double")).otherwise(F.col("value")))
            .withColumn("props", F.when(F.col("event_id") % 6 == 0, F.lit(None).cast("string")).otherwise(F.col("props")))
        )
    elif mode == "nullkeys":
        ev = (
            ev.withColumn("user_id", F.when(F.col("event_id") % 11 == 0, F.lit(None).cast("long")).otherwise(F.col("user_id")))
            .withColumn("event_type", F.when(F.col("event_id") % 13 == 0, F.lit(None).cast("string")).otherwise(F.col("event_type")))
            .withColumn("ts", F.when(F.col("event_id") % 17 == 0, F.lit(None).cast("timestamp")).otherwise(F.col("ts")))
        )
    elif mode == "degenerate":
        docs = docs.withColumn(
            "text",
            F.when(F.col("doc_id") % 4 == 0, F.lit(""))
            .when(F.col("doc_id") % 4 == 1, F.lit("word"))
            .when(F.col("doc_id") % 4 == 2, F.lit("  "))
            .otherwise(F.col("text")),
        )
        dim = len(emb.select("embedding").first()[0])
        emb = emb.withColumn(
            "embedding",
            F.when(F.col("vec_id") % 5 == 0, F.array(*[F.lit(0.0).cast("float")] * dim)).otherwise(F.col("embedding")),
        )
    else:
        raise SystemExit(f"unknown mode {mode!r} (nulls|nullkeys|degenerate)")
    docs.write.mode("overwrite").parquet(f"{adv}/documents.parquet")
    emb.write.mode("overwrite").parquet(f"{adv}/embeddings.parquet")
    ev.write.mode("overwrite").parquet(f"{adv}/events.parquet")
    return adv


def main() -> None:
    modes = (sys.argv[1] if len(sys.argv) > 1 else "nulls").split(",")
    only = set(sys.argv[2:])

    from seqdatapipeline_spark.session import get_spark

    spark = get_spark(app_name="adversarial-sweep", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    names = sorted(n for n in qs if not only or n in only)
    failed = 0
    for mode in modes:
        adv = _build(spark, mode)
        raised = []
        for name in names:
            try:
                qs[name](spark, adv).limit(5000).collect()
            except Exception as e:
                raised.append(name)
                print(f"RAISE [{mode}] {name}: {str(e).splitlines()[0][:120]}", flush=True)
        print(f"[{mode}] {len(raised)} raised of {len(names)}")
        failed += len(raised)
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
