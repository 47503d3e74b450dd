"""SparkSession builder and table loaders.

The reference hand-schedules everything (semaphores of 10/6 workers,
32-thread tool invocations, 20 GB sort caps — BASELINE.md). Here the
equivalent knobs are Spark configs: AQE re-plans shuffles at runtime,
``spark.sql.shuffle.partitions`` bounds reducer fan-out, and broadcast
thresholds replace the reference's shared-memory genome index
(reference tools.py:412 ``--genomeLoad LoadAndRemove``).
"""

from __future__ import annotations

import hashlib
import os
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(
    app_name: str = "seqdatapipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build a SparkSession tuned for this engine.

    Scale notes: ``master`` is only set when explicitly requested or
    when no cluster manager is configured (so ``spark-submit --master``
    always wins on a real cluster). Size ``shuffle_partitions`` to
    ~2-3x total cores there; AQE coalesces small post-shuffle
    partitions and splits skewed ones at runtime, so a generous static
    number is safe.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 4)

    builder = (
        SparkSession.builder.appName(app_name)
        # AQE: runtime shuffle-partition coalescing, skew-join splitting,
        # broadcast-join demotion/promotion by observed sizes.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow for pandas_udf / applyInPandas / toPandas round-trips.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Parquet scan: pushdown + pruning (on by default; pinned for clarity).
        .config("spark.sql.parquet.filterPushdown", "true")
        # TIMESTAMP(NANOS) columns (events.ts) read as long instead of
        # erroring; registry._events rebuilds a proper timestamp at
        # micros precision, matching DuckDB's truncating reader.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Conservative auto-broadcast; known dim tables get explicit
        # broadcast() hints instead (a 64 MB global limit risks driver
        # OOM when a "small" side grows at 100x scale).
        .config("spark.sql.autoBroadcastJoinThreshold", str(16 * 1024 * 1024))
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", os.environ.get("SPARK_UI", "false"))
    )
    if master is not None or (
        "SPARK_MASTER" not in os.environ and not os.environ.get("SPARK_SUBMIT")
    ):
        # Local/dev default only; never override an externally-set master.
        builder = builder.master(master or f"local[{cpus}]")
        # In local mode the driver JVM is the whole cluster; Spark's 1g
        # default heap starves broadcast builds and shuffle buffers long
        # before the machine does. Only set here — on a real cluster
        # spark-submit's --driver-memory/--executor-memory govern.
        builder = builder.config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def fan_out(df: DataFrame, *cols: str, min_partitions: int | None = None) -> DataFrame:
    """Raise scan parallelism before per-row-expensive compute
    (shingling, hashing, vector math).

    Small dimension files often arrive as a single input split, which
    pins every downstream narrow operator to one core; a 100 TB table
    already has thousands of splits, so this is a no-op there (the
    partition check avoids an unconditional shuffle). Pass key columns
    to hash-partition by them (keeps a later groupBy on the same keys
    shuffle-free)."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, *cols) if cols else df.repartition(target)


# Bounded registry of library-internal persists (ring_persist). Spark's
# CacheManager holds SQL cache entries until explicitly released — the
# blocks are LRU-evictable but the ENTRIES are not GC-reclaimed — so a
# library that persists per call over varying inputs leaks entries for
# the session lifetime unless something releases them.
_PERSIST_RING: "list[DataFrame]" = []
_PERSIST_RING_CAP = 16
_PERSIST_RING_LOCK = __import__("threading").Lock()

# no_aqe serialization: sections hold the RLock across their body so
# concurrent no_aqe callers queue instead of interleaving restores;
# a thread-local {id(session): depth} map makes same-thread,
# same-session nesting a no-op below the outermost block while still
# disabling AQE per-session when sessions nest.
_NO_AQE_LOCK = __import__("threading").RLock()
_NO_AQE_STATE = __import__("threading").local()
_ring_log = __import__("logging").getLogger("seqdatapipeline_spark.ring")


def ring_persist(df: DataFrame, storage_level=None) -> DataFrame:
    """persist() with a bounded session-lifetime: registers the frame
    in a FIFO ring (cap 16) and unpersists the oldest entry on
    overflow. Evicting a frame that a long-lived returned plan still
    references is CORRECT (the plan recomputes that subtree on next
    use) — the ring trades bounded recompute for a hard bound on
    CacheManager entries, mirroring _ADAPTIVE_STATS/_RANK_MEMO.

    Known sharp edge (ADVICE r8): the ring is process-global and
    shared by batch AND streaming consumers — a long-lived streaming
    query whose plan references a ring-evicted persist silently
    recomputes that subtree per micro-batch. Eviction is logged
    (INFO) so such recompute cliffs are diagnosable; list mutation is
    lock-guarded for multi-threaded callers."""
    out = df.persist(storage_level) if storage_level is not None else df.persist()
    evicted = []
    with _PERSIST_RING_LOCK:
        _PERSIST_RING.append(out)
        while len(_PERSIST_RING) > _PERSIST_RING_CAP:
            evicted.append(_PERSIST_RING.pop(0))
    for old in evicted:
        _ring_log.info(
            "persist-ring eviction (cap %d): unpersisting oldest entry — "
            "any live plan referencing it recomputes on next use",
            _PERSIST_RING_CAP,
        )
        try:
            old.unpersist()
        except Exception:
            pass
    return out


def ring_clear() -> None:
    """Release every ring-registered persist (bench/test hook)."""
    with _PERSIST_RING_LOCK:
        drained, _PERSIST_RING[:] = _PERSIST_RING[:], []
    for old in drained:
        try:
            old.unpersist()
        except Exception:
            pass


def persist_for_rescan(
    df: DataFrame,
    gate: "DataFrame | None" = None,
    min_bytes: int | None = None,
    storage_level=None,
) -> DataFrame:
    """Size-adaptive persist for a derived projection that downstream
    plan branches re-evaluate several times (Spark shares no common
    subtrees across join/union arms): persist it — bounded, via
    ring_persist — when the subtree it re-derives is big enough that
    re-scanning beats the cache barrier, and leave the plan untouched
    otherwise.

    The dispatch reads the Catalyst size ESTIMATE of ``gate`` (the
    expensive input being re-scanned; defaults to ``df``) from the
    optimizer — file-statistics-based, driver-side, zero jobs — and
    compares it to ``min_bytes`` (conf
    ``spark.seqdatapipeline.rescanPersistBytes``, default 256 MB).
    Below the threshold a re-scan costs less than the persist's extra
    AQE stage-materialization barriers (measured on
    quality_percentile_by_source at sf0.1: persist = +3 driver jobs
    for a wall within noise); above it each avoided re-evaluation
    saves a full scan+compute pass of the gated subtree, which at
    100 TB dominates any cache cost — the same size-tiered reasoning
    as Catalyst's broadcast threshold, parameterized so a deployment
    sizes it to its storage bandwidth.

    GATE SEMANTICS (ADVICE r12): ``min_bytes`` is compared against the
    estimate of the RE-SCANNED INPUT (``gate``), not of the persisted
    projection ``df`` — the dispatch asks "is re-deriving this worth
    avoiding", and the cost of re-deriving is a pass over the gate
    subtree. A wide gate feeding a narrow derived table therefore
    fires conservatively-early (the cache is cheaper than the estimate
    suggests), never late. ``storage_level`` controls the persist of
    corpus-cardinality projections (default: Spark's MEMORY_AND_DESER
    via plain persist()); pass e.g. ``StorageLevel.MEMORY_AND_DISK``
    when the cached projection itself is too wide to sit in executor
    memory at deployment scale."""
    if not rescan_gate_fires(gate if gate is not None else df, min_bytes):
        return df
    return ring_persist(df, storage_level=storage_level)


def rescan_gate_fires(gate: DataFrame, min_bytes: int | None = None) -> bool:
    """The persist_for_rescan dispatch predicate, exposed for callers
    that switch PLAN FORMS on the same size gate (r13 dsir: below the
    gate the two-pass token-level plan must stay byte-unchanged, so
    the caller needs the decision BEFORE building the compact-table
    form). Driver-side Catalyst file-statistics estimate, zero jobs;
    False when the estimate is unavailable (keep the untouched
    plan — same conservative default as persist_for_rescan)."""
    spark = gate.sparkSession
    if min_bytes is None:
        try:
            min_bytes = int(
                spark.conf.get(
                    "spark.seqdatapipeline.rescanPersistBytes",
                    str(256 * 1024 * 1024),
                )
            )
        except Exception:
            min_bytes = 256 * 1024 * 1024
    try:
        est = int(
            str(gate._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        )
    except Exception:
        return False  # estimate unavailable: keep the untouched plan
    return est >= min_bytes


@contextmanager
def no_aqe(spark):
    """Temporarily disable adaptive query execution around the
    materialization of an iterative sub-plan whose partitioning and
    stats are already known. AQE materializes EVERY shuffle stage as
    a separate job to re-plan with runtime statistics — for a
    fixed-round matvec whose join sides are co-partitioned by
    construction that re-planning can change nothing, but its
    per-stage barrier costs ~0.15-0.2s each on local[32] (measured
    within-session A/B: pagerank_iter sf0.1 2.42s -> 1.82s with 3
    rounds ≈ 7 stages). Restore is in a finally. Scope this ONLY to
    plans with known-uniform keys — anything that might be skewed at
    100 TB should keep AQE's runtime skew-splitting.

    CONCURRENCY CONTRACT: this toggles the session-global
    ``spark.sql.adaptive.enabled`` conf. Two hazards and how each is
    handled:

    * **Nested / concurrent no_aqe sections** are handled HERE:
      sections serialize on a process-wide re-entrant lock and a
      per-(thread, session) depth counter makes SAME-SESSION nesting
      a no-op below the outermost block, so the pre-entry conf value
      is always the one restored (out-of-order restores cannot
      happen). Nesting a DIFFERENT session's section is not a no-op —
      each session's conf gets its own save/disable/restore.
    * **A concurrent UNRELATED query on the same SparkSession** would
      still plan with AQE off — including its skew handling — and
      this function cannot see it. That is the engine's documented
      single-threaded-driver-per-session invariant (true for the
      registry/bench/driver paths); a multi-threaded caller must run
      such queries on separate sessions (`spark.newSession()` gives
      an isolated conf while sharing the SparkContext and cache).
    """
    with _NO_AQE_LOCK:
        # Depth is keyed per (thread, session): nesting no_aqe(sessionB)
        # inside no_aqe(sessionA) on one thread must disable AQE on B's
        # conf too, not silently no-op because A already holds depth>0
        # (ADVICE r10) — multi-session nesting is exactly the pattern
        # the concurrency contract above recommends.
        depths = getattr(_NO_AQE_STATE, "depths", None)
        if depths is None:
            depths = _NO_AQE_STATE.depths = {}
        key = id(spark)
        depths[key] = depths.get(key, 0) + 1
        outermost = depths[key] == 1
        if outermost:
            prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
            spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            yield
        finally:
            depths[key] -= 1
            if depths[key] == 0:
                del depths[key]
            if outermost:
                spark.conf.set("spark.sql.adaptive.enabled", prev)


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, name: str = "lineitem") -> DataFrame:
    """Load one synthetic table (TESTDATA.md) as a DataFrame.

    No driver-side existence check: ``spark.read.parquet`` raises a
    clear AnalysisException for missing paths and works on any Hadoop
    filesystem (local/S3/HDFS), unlike ``os.path.exists``.
    """
    return spark.read.parquet(table_path(sf_dir, name))


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Load all synthetic tables and register them as temp views."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = spark.read.parquet(table_path(sf_dir, name))
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def plan_fingerprint(df: DataFrame) -> str | None:
    """Canonicalized-plan identity for prepared-plan/statistics memo
    keys, or None when the plan has no durable data identity.

    The canonicalized analyzed plan alone is NOT a data identity: on
    Spark 4.x a parquet relation canonicalizes as
    ``Relation [none#0L,...] parquet`` with the path elided, so two
    different datasets with the same schema print identically. The key
    therefore combines the plan string with a hash of the sorted
    ``df.inputFiles()`` listing — equal keys mean equal plan over the
    same concrete files (up to in-place file mutation, the same
    staleness contract as Spark's own plan cache). A file-backed plan
    that reports no input files, and driver-built inputs
    (createDataFrame -> LogicalRDD / LocalRelation / LocalTableScan,
    which canonicalize WITHOUT their rows), have no durable identity —
    refuse (return None) rather than risk serving one dataset's
    result for another."""
    try:
        s = df._jdf.queryExecution().analyzed().canonicalized().toString()
    except Exception:
        return None  # connect mode / plan-access failure
    if "LogicalRDD" in s or "LocalRelation" in s or "LocalTableScan" in s:
        return None
    try:
        files = sorted(df.inputFiles())
    except Exception:
        return None
    if not files:
        return None
    h = hashlib.sha256("\n".join(files).encode()).hexdigest()[:16]
    return f"{h}:{s}"
