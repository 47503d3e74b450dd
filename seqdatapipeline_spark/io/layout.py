"""Physical-layout operations — the write-side half of scan
performance at 100 TB.

A table's layout (partition dirs, file sizes, in-file sort order)
decides how much of it a query must read long before Catalyst sees a
plan: partition dirs give partition pruning, few-and-large files keep
the driver's split enumeration and task count sane, and in-file sort
order gives parquet min/max row-group skipping. The streaming-ingest
side of the engine produces many small files per trigger; these
operators are the periodic compaction pass that repairs that.
"""

from __future__ import annotations

import logging
import os
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_log = logging.getLogger("seqdatapipeline_spark.layout")

# Curated-layout detection memo, keyed (session identity, catalog
# name) -> DataFrame | None. `spark.catalog.tableExists` is a py4j
# round-trip and detection sits at the head of EVERY consumer call —
# r8's bench showed the per-call probes accumulating into measurable
# fixed overhead on sub-second queries (dedup_exact 0.130 -> 0.236s
# creep, VERDICT r8 item 2). Detection is a session-stable fact
# (tables only appear via this module's write_* functions, which
# invalidate below), so probe once per (session, name) and reuse the
# immutable DataFrame handle. Miss entries (None) are cached too: the
# common plain-parquet path must not re-probe per call.
#
# Keying by id(spark) is safe against id reuse: every cached
# DataFrame holds a strong reference to its session, so a session
# with live entries can never be garbage-collected and its id never
# recycled. The corresponding trade is a bounded leak — a process
# that churns through many sequential sessions retains each one's
# dozen-odd entries until a curated write (or detect_cache_clear)
# flushes the dict; acceptable for the one-session-per-process
# bench/driver/test shape this engine runs in.
# Values: DataFrame | None for curated-table probes; (DataFrame,
# mtime_ns) for memoized plain-parquet reader plans (__plain__ keys),
# so a directory rewrite invalidates the pinned listing/schema.
_DETECT_CACHE: dict[tuple[int, str], object] = {}


def detect_cache_clear() -> None:
    """Drop every memoized curated-detection entry (called by every
    curated write in this module; also a test hook)."""
    _DETECT_CACHE.clear()


def _cached_table_or_none(spark, name: str) -> DataFrame | None:
    """``spark.table(name)`` if it exists in this session's catalog,
    else None — memoized per (session, name), logged once on fill so
    bench/correctness runs are self-documenting about which physical
    path they measured."""
    key = (id(spark), name)
    if key in _DETECT_CACHE:
        return _DETECT_CACHE[key]
    try:
        df = spark.table(name) if spark.catalog.tableExists(name) else None
    except Exception:
        # Transient probe failure (py4j hiccup, metastore timeout):
        # fall back to the plain path for THIS call but do NOT cache
        # the miss — a sticky wrong 'plain' would silently misroute
        # every later call this session.
        return None
    _DETECT_CACHE[key] = df
    _log.info(
        "curated detection: %s -> %s", name, "CURATED" if df is not None else "plain"
    )
    return df


def zorder_key(cols: list[Column | str], bits: int = 12) -> Column:
    """Z-order (Morton) clustering key: interleave the low ``bits``
    bits of each column, so rows close in ALL dimensions get close
    keys. Sorting a file by this key makes parquet min/max row-group
    statistics selective for predicates on ANY of the dimensions — the
    multi-dimensional generalization of sort-by-one-column data
    skipping (the trick behind Delta/Iceberg Z-ORDER OPTIMIZE).

    Pure bit arithmetic inside whole-stage codegen: bit i of column j
    lands at position ``i * n_cols + j``. Keys must already be
    non-negative and < 2^bits (mod/hash them first); with n columns the
    key spans n*bits bits, so keep n*bits ≤ 62.
    """
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    n = len(cs)
    terms = [
        (F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1)) * F.lit(1 << (i * n + j)))
        for j, c in enumerate(cs)
        for i in range(bits)
    ]
    return reduce(lambda a, b: a + b, terms).cast("long")


def zorder_key_sql(cols: list[str], bits: int = 12) -> str:
    """The identical Morton-key arithmetic as a SQL expression string
    (DuckDB/ANSI bit operators) — generated from the same spec as
    ``zorder_key`` so the two can never drift apart."""
    n = len(cols)
    terms = [
        f"((({c} >> {i}) & 1) * {1 << (i * n + j)})"
        for j, c in enumerate(cols)
        for i in range(bits)
    ]
    return "(" + " + ".join(terms) + ")"


def compact_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    sort_cols: list[str] | None = None,
    max_records_per_file: int = 5_000_000,
) -> None:
    """Compaction pass: rewrite a table as one large file per
    partition value (hash repartition on the partition key puts each
    key in exactly one task), optionally sorted within files so
    parquet row-group min/max statistics prune reads on ``sort_cols``
    (pass a ``zorder_key`` expression column upstream for multi-dim
    skipping). ``maxRecordsPerFile`` re-splits genuinely huge
    partitions instead of producing one unmanageable file.

    This is the maintenance operator a streaming ingest needs
    (micro-batches write a small file per trigger per partition;
    reading a day back degenerates into an open()-bound scan of
    thousands of tiny files). Partition dirs + large sorted files =
    partition pruning + row-group skipping on every later read.
    """
    out = df.repartition(*[F.col(c) for c in partition_cols])
    if sort_cols:
        out = out.sortWithinPartitions(*partition_cols, *sort_cols)
    (
        out.write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def bucketed_table_name(sf_dir: str, table: str, bucket_col: str) -> str:
    """Catalog name for the curated bucketed copy of ``sf_dir``'s
    ``table``, clustered on ``bucket_col``. The sf_dir is folded in so
    copies of different scale factors coexist in one warehouse."""
    import re

    tag = re.sub(r"[^0-9a-zA-Z]+", "_", sf_dir.strip("/"))
    return f"sg_{tag}_{table}_by_{bucket_col}"


def write_curated_bucketed(
    df: DataFrame,
    name: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Write ``df`` as a single-key curated bucketed+sorted parquet
    TABLE — the curation-time convenience over the general
    ``io.sinks.write_bucketed`` (one delegates to the other; this
    variant additionally pre-repartitions on the bucket key so each
    bucket lands as ONE file instead of one-per-input-task). A scan of
    the result reports hash-partitioning on ``bucket_col`` to
    Catalyst, so joins/groupBys keyed on it (or on any superset of it)
    need NO Exchange — for a 100 TB alignment store curated this way,
    coordinate dedup and mate pairing become scan + map-side work,
    deleting the single largest shuffle in the genomics tier (the r6
    1000x spot-check measured dedup_alignments at 53.4s and
    pe_mate_join at 24.0s, both pure shuffle).

    ``n_buckets`` sizes reducer-side parallelism for every future
    exchange-free consumer: pick ~(total size / 128 MB) at curation
    time. Sorting within buckets by (bucket_col, *sort_cols) adds
    parquet min/max row-group skipping for point lookups on the key.
    """
    from .sinks import write_bucketed

    write_bucketed(
        df.repartition(n_buckets, F.col(bucket_col)),
        name,
        [bucket_col],
        n_buckets=n_buckets,
        sort_cols=[bucket_col, *(sort_cols or [])],
    )
    detect_cache_clear()  # a new curated table must be re-detected


def ivf_table_names(sf_dir: str) -> tuple[str, str]:
    """(cells table, centroids table) names for the curated IVF index
    over ``sf_dir``'s embeddings."""
    base = bucketed_table_name(sf_dir, "embeddings", "cell")
    return base, base + "_centroids"


def write_curated_ivf(
    spark,
    sf_dir: str,
    kmeans_k: int = 10,
    kmeans_iters: int = 3,
    n_buckets: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Build the curated IVF index for ``sf_dir``'s embeddings: train
    the deterministic coarse quantizer ONCE, store the centroid table,
    and store the corpus with its cell assignment — bucketed on
    ``cell`` so probe-time IN filters bucket-prune the scan
    (SelectedBucketsCount ≈ probed/total). This is the index-build
    step every production vector store runs at ingest; query time
    then skips training AND the whole-corpus assignment map, and
    reads only the probed lists. Serving results are bit-identical to
    the train-at-query-time path because kmeans_cells is
    deterministic and assignment is a pure function of the stored
    centroids."""
    import os

    from ..extensions import similarity as sim

    cells_name, cents_name = ivf_table_names(sf_dir)
    # NULL vectors are not candidates anywhere in the ANN family
    # (second r11 review pass): an unfiltered curated store would keep
    # NULL-vector rows the serve-time paths and the DuckDB oracles all
    # exclude — a crawl corpus WILL have failed-embedding rows.
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).filter(
        sim._has_direction(vec_col)
    )
    cents = sim.kmeans_cells(
        emb, k=kmeans_k, iters=kmeans_iters, id_col=id_col, vec_col=vec_col
    )
    asg = sim.assign_best_cell(
        emb.select(
            F.col(id_col), F.col(vec_col).cast("array<double>").alias("__av")
        ),
        cents,
        vec_expr="__av",
        id_col=id_col,
    ).select(id_col, "cell")
    write_curated_bucketed(emb.join(asg, id_col), cells_name, "cell", n_buckets)
    # Same restart hazard as write_bucketed (VERDICT r10): the
    # session-scoped catalog forgot this table on the last process
    # exit, but its warehouse directory survived — clear both before
    # the unbucketed centroid write too.
    from .sinks import _clear_table_location, write_table_spec

    _clear_table_location(spark, cents_name, None)
    cents.write.mode("overwrite").format("parquet").saveAsTable(cents_name)
    write_table_spec(
        spark, cents_name, cents, bucket_cols=None, n_buckets=None, sort_cols=None
    )
    detect_cache_clear()


def append_curated_bucketed(
    df: DataFrame,
    name: str,
    bucket_col: str,
    n_buckets: int | None = None,
    sort_cols: list[str] | None = None,
) -> None:
    """Append a new batch INTO an existing curated bucketed table —
    the ingest loop of a live 100 TB store, where rebuilding the whole
    curated copy per arrival is a non-starter. `insertInto` on a
    Hive-bucketed table hashes the incoming rows with the TABLE's
    bucket spec, so each append adds one file per (non-empty) bucket
    and every scan keeps reporting the clustering: consumers stay
    exchange-free, now over base + appended data. Pre-repartitioning
    on the bucket key keeps it to at most one new file per bucket per
    batch (run compact_layout periodically to fold small files).
    ``n_buckets``/``sort_cols`` are read from the table's own spec by
    Spark — parameters here are only for the repartition hint and an
    optional within-batch sort to preserve row-group skipping."""
    spark = df.sparkSession
    if n_buckets is None:
        n_buckets = 32
    batch = df.repartition(n_buckets, F.col(bucket_col))
    if sort_cols:
        batch = batch.sortWithinPartitions(bucket_col, *sort_cols)
    # insertInto resolves columns BY POSITION; align to the table.
    cols = spark.table(name).columns
    batch.select(*cols).write.mode("append").insertInto(name)
    detect_cache_clear()


def refresh_curated_ivf(spark, sf_dir: str, new_vectors: DataFrame) -> None:
    """Assign ONLY the new vectors to their cells with the STORED
    centroids (assignment is a pure function of them — no retraining,
    no touching the existing corpus) and append them into the curated
    IVF cells table. This is how a production ANN index absorbs
    ingest: O(batch) work per batch; re-run write_curated_ivf when
    drift warrants a retrain. The refreshed index serves the union,
    still bucket-pruned."""
    from ..extensions import similarity as sim

    cells_name, cents_name = ivf_table_names(sf_dir)
    cents = spark.table(cents_name)
    new_vectors = new_vectors.filter(sim._has_direction("embedding"))  # see
    # write_curated_ivf: direction-less vectors are not ANN candidates
    asg = sim.assign_best_cell(
        new_vectors.select(
            F.col("vec_id"), F.col("embedding").cast("array<double>").alias("__av")
        ),
        cents,
        vec_expr="__av",
        id_col="vec_id",
    ).select("vec_id", "cell")
    append_curated_bucketed(
        new_vectors.join(asg, "vec_id"), cells_name, "cell"
    )


def curate_corpus(
    spark, sf_dir: str, n_buckets: int = 32, ivf_k: int = 10
) -> dict[str, str]:
    """Build EVERY curated layout this engine's consumers detect, in
    one call — the ingest-time step a production deployment runs once
    per dataset so all subsequent queries take the fast paths:

    - lineitem bucketed on l_orderkey (genomics tier:
      dedup_alignments / pe_mate_join / pipeline_rna exchange-free);
    - events bucketed on user_id, sorted on ts (behavioral tier:
      per-user aggregates and windows exchange-free, SortExec
      deleted);
    - documents + STORED content_hash, bucketed on it (text tier:
      exact-dup collapse exchange-free; minhash/setsim over distinct
      texts);
    - embeddings IVF index (ANN tier: stored centroids +
      cell-bucketed corpus, probe-time bucket pruning);
    - co-order edge list (graph tier: weighted half-edge set bucketed
      on src — pagerank/triangle/degree consumers skip the per-call
      edge derivation);
    - parsed URL table (compliance tier: url_norm/domain/path stored,
      bucketed on domain — parse-once-at-ingest, domain-keyed
      group-bys exchange-free).

    Sizes ``n_buckets`` to ~(table size / 128 MB) at real scale.
    Returns {tier: catalog table name}. Detection stays
    session-catalog-scoped; every consumer is layout-agnostic and
    parity-tested against the plain path."""
    import os

    from ..registry import _t

    out = {}
    li_name = bucketed_table_name(sf_dir, "lineitem", "l_orderkey")
    write_curated_bucketed(
        spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")),
        li_name,
        "l_orderkey",
        n_buckets,
    )
    out["genomics"] = li_name
    ev_name = bucketed_table_name(sf_dir, "events", "user_id")
    write_curated_bucketed(
        _t(spark, sf_dir, "events"),
        ev_name,
        "user_id",
        n_buckets,
        sort_cols=["ts"],
    )
    out["events"] = ev_name
    doc_name = bucketed_table_name(sf_dir, "documents", "content_hash")
    write_curated_bucketed(
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).withColumn(
            "content_hash", F.md5("text")
        ),
        doc_name,
        "content_hash",
        n_buckets,
    )
    out["text"] = doc_name
    write_curated_ivf(spark, sf_dir, kmeans_k=ivf_k, n_buckets=n_buckets)
    out["ann"] = ivf_table_names(sf_dir)[0]
    write_curated_pq(spark, sf_dir)
    out["ann_pq"] = pq_table_name(sf_dir)
    write_curated_edges(spark, sf_dir)
    out["graph"] = graph_table_name(sf_dir)
    out["graph_keys"] = graph_keys_table_name(sf_dir)
    write_curated_urls(spark, sf_dir)
    out["urls"] = url_table_name(sf_dir)
    return out


def compact_curated(
    spark,
    table: str,
    dedup_cols: "list[str] | None" = None,
) -> None:
    """Maintenance compaction for a curated BUCKETED table — the
    companion of ``compact_partitioned`` for the catalog-table tiers.
    Streaming ingest (stream_into_curated) and batch appends
    (append_curated_bucketed) each land one file per non-empty bucket
    per batch; after K batches every scan opens K+1 files per bucket
    and an exactly-once replay may have re-appended rows. This pass
    rewrites the table as ONE file per bucket with the SAME bucket/
    sort spec (read from the table's own `_sg_spec.json` manifest, so
    compaction can never drift from the spec the data was written
    under), optionally dropping duplicates on ``dedup_cols`` first —
    the dedup half of the lakehouse compact-with-dedup idiom the
    streaming docstring promises.

    Mechanics: stage the (deduped) rows to a sibling temp directory
    (Spark cannot overwrite a table it is reading), then rewrite in
    place via write_bucketed at the table's ORIGINAL resolved location
    — consumers keep their exchange-free plans, the manifest is
    re-minted, and reattach_curated keeps working after a restart.
    Like every read-modify-overwrite in this engine it is
    single-writer (SURVEY §7 risk 3); run it in the maintenance window
    a production table already has.

    Crash safety (r11 review): the staged directory is given its own
    PLAIN-table manifest (bucket_cols None — the staged copy is not
    hash-laid-out, and registering it as bucketed would corrupt joins)
    before the destructive rewrite starts, so if the rewrite dies
    after write_bucketed cleared the original location, ALL rows still
    exist at ``<loc>.__compact__`` and ``reattach_curated`` over the
    parent directory re-registers them — under the DISTINCT recovery
    name ``<table>__staged``, never the original name, so a crash
    BEFORE the destructive phase (both directories intact) can never
    race the staged plain copy against the real bucketed store for
    the table's identity (second r11 review pass). Recovery is then
    explicit: re-curate ``<table>`` from ``<table>__staged``'s rows.
    A leftover staged directory from a crashed run whose table still
    exists is deleted and re-staged."""
    from .sinks import (
        read_table_spec,
        resolve_table_location,
        write_bucketed,
        write_spec_at,
    )

    loc = resolve_table_location(spark, table)
    spec = read_table_spec(spark, loc)
    if spec is None:
        raise ValueError(
            f"no _sg_spec.json manifest at {loc} — re-curate {table} once "
            "(any r11+ curated write mints the manifest) before compacting"
        )
    if not spec.get("bucket_cols"):
        raise ValueError(f"{table} is not bucketed; use compact_partitioned")
    tmp = loc.rstrip("/") + ".__compact__"
    jvm = spark._jvm
    tmp_path = jvm.org.apache.hadoop.fs.Path(tmp)
    fs = tmp_path.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(tmp_path):
        # table exists (we resolved its location), so this is a stale
        # leftover from a run that died BEFORE its destructive phase —
        # remove it AND any catalog entry a reattach_curated resurrected
        # from it (r11 review: deleting the directory under a live
        # <table>__staged registration would leave it dangling)
        spark.sql(f"DROP TABLE IF EXISTS {table}__staged")
        fs.delete(tmp_path, True)
    df = spark.table(table)
    if dedup_cols:
        df = df.dropDuplicates(dedup_cols)
    df.write.mode("overwrite").parquet(tmp)
    write_spec_at(
        spark, tmp,
        {"table": f"{table}__staged", "ddl": spec["ddl"], "bucket_cols": None,
         "n_buckets": None, "sort_cols": None},
    )
    staged = spark.read.parquet(tmp)  # direct read: the memoized
    # plain_parquet would pin a dead tmp path in the session memo
    n_buckets = int(spec["n_buckets"])
    bucket_cols = spec["bucket_cols"]
    # Destructive phase: the original table must leave the catalog for
    # the in-place rewrite (saveAsTable cannot overwrite a table its
    # own input scan reads — and the input is now the staged copy, not
    # the table). Recovery from here until the rewrite commits is the
    # staged copy + its manifest.
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    write_bucketed(
        staged.repartition(n_buckets, *[F.col(c) for c in bucket_cols]),
        table,
        bucket_cols,
        n_buckets=n_buckets,
        path=loc,
        sort_cols=spec.get("sort_cols"),
    )
    spark.sql(f"DROP TABLE IF EXISTS {table}__staged")  # if reattached
    if fs.exists(tmp_path):
        fs.delete(tmp_path, True)
    detect_cache_clear()


def reattach_curated(spark, warehouse_dir: str | None = None) -> dict[str, str]:
    """Re-register every curated table found under ``warehouse_dir``
    (default: this session's ``spark.sql.warehouse.dir``) into the
    current session's catalog — the RESTART story for the curated
    tiers at 100 TB.

    The engine's catalog is deliberately session-scoped, so a process
    restart forgets every curated table while its data survives on
    disk; without this call the only recovery is re-curating from
    scratch, which defeats incremental ingest entirely at scale. Each
    curated write drops a `_sg_spec.json` manifest inside its table
    directory (io.sinks.write_table_spec: name, column DDL, bucket/
    sort spec); reattach replays it as ``CREATE TABLE ... USING
    parquet [CLUSTERED BY ... INTO n BUCKETS] LOCATION ...`` over the
    existing files. Spark's bucketed readers key bucket membership on
    the `_0000N` component already baked into each file name, so a
    reattached table's scans report the same clustering as the
    original — exchange-free consumers, insertInto-able ingest — with
    zero data movement (verified by plan pins in
    tests/test_domain_ops.py).

    Returns {table: location} for the tables attached. Skips names
    already in the catalog (a live session's managed tables win) and
    directories without a manifest (pre-r11 stores: re-curate once to
    mint manifests). Tables reattach as EXTERNAL — dropping one no
    longer deletes its files, which is exactly the durability being
    added; a later re-curation still overwrites in place
    (write_bucketed clears the location first). This call is explicit
    opt-in: the default session keeps the stale-can't-shadow-fresh
    property, and a deployment that wants durable curated stores runs
    ``reattach_curated(spark)`` once at session start."""
    from .sinks import read_table_spec

    wh = warehouse_dir or spark.conf.get("spark.sql.warehouse.dir")
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(wh)
    fs = root.getFileSystem(hconf)
    attached: dict[str, str] = {}
    if not fs.exists(root):
        return attached
    # Deterministic iteration: FileSystem.listStatus order is
    # unspecified (java File.list on the local FS), and two manifests
    # claiming one name must resolve the same way on every restart —
    # first-by-path wins, the duplicate is logged and skipped.
    statuses = sorted(fs.listStatus(root), key=lambda st: st.getPath().toString())
    for status in statuses:
        if not status.isDirectory():
            continue
        spec = read_table_spec(spark, status.getPath().toString())
        if spec is None:
            # A directory holding parquet but no manifest is either a
            # pre-r11 store or a write that crashed in the
            # saveAsTable→manifest gap (r11 ADVICE) — silently skipping
            # it would quietly strip that table's restart durability,
            # indistinguishable from "never curated". Say so.
            has_parquet = any(
                st.getPath().getName().endswith(".parquet")
                for st in fs.listStatus(status.getPath())
            )
            if has_parquet:
                __import__("logging").getLogger(__name__).warning(
                    "reattach_curated: %s holds parquet data but no %s "
                    "manifest (pre-manifest store, or a write crashed "
                    "before minting it) — NOT reattached; re-curate to "
                    "restore restart durability",
                    status.getPath().toString(), "_sg_spec.json",
                )
            continue
        table = spec["table"]
        if table in attached:
            __import__("logging").getLogger(__name__).warning(
                "reattach_curated: %s also claims table %s (attached from "
                "%s) — skipped; reconcile the duplicate manifests",
                status.getPath().toString(), table, attached[table],
            )
            continue
        if spark.catalog.tableExists(table):
            continue
        loc = status.getPath().toString()
        clause = ""
        if spec.get("bucket_cols"):
            cols = ", ".join(spec["bucket_cols"])
            clause = f" CLUSTERED BY ({cols})"
            if spec.get("sort_cols"):
                scols = ", ".join(spec["sort_cols"])
                clause += f" SORTED BY ({scols})"
            clause += f" INTO {int(spec['n_buckets'])} BUCKETS"
        spark.sql(
            f"CREATE TABLE {table} ({spec['ddl']}) USING parquet"
            f"{clause} LOCATION '{loc}'"
        )
        attached[table] = loc
    if attached:
        detect_cache_clear()
    return attached


def pq_table_name(sf_dir: str) -> str:
    """Catalog name of the curated IVF+PQ code table for ``sf_dir``'s
    embeddings (long form: vec_id, ccell, sub, cent — bucketed on
    ccell)."""
    return bucketed_table_name(sf_dir, "embeddings_pq", "ccell")


def write_curated_pq(spark, sf_dir: str, n_buckets: int = 8) -> None:
    """Build the curated IVF+PQ code table: run the deterministic
    index construction (similarity.pq_ivf_build) ONCE and store the
    coded corpus — (vec_id, ccell, sub, cent), bucketed on the coarse
    cell so probe-time IN filters bucket-prune to the probed inverted
    lists. Serving then skips BOTH full-corpus passes (coarse
    assignment and PQ encoding); the model-sized pieces (coarse
    centroids, codebook, per-query distance tables) are recomputed at
    query time from their lowest-id-vector definitions — identical by
    construction, so results match the build-at-query path
    bit-for-bit."""
    import os

    from ..extensions import similarity as sim

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    _, _, _, _, _, vassign, codes = sim.pq_ivf_build(emb)
    write_curated_bucketed(
        codes.join(vassign, "vec_id"), pq_table_name(sf_dir), "ccell", n_buckets
    )


def url_table_name(sf_dir: str) -> str:
    """Catalog name of the curated URL table for ``sf_dir``'s
    documents (doc_id, lang, source, url_raw, url_norm, domain, path
    — bucketed on domain)."""
    return bucketed_table_name(sf_dir, "documents_urls", "domain")


def write_curated_urls(spark, sf_dir: str, n_buckets: int = 8) -> None:
    """Materialize URL parsing ONCE — the crawl-store curated layout
    for the URL/compliance tier. A web pipeline canonicalizes every
    URL exactly once at ingest and stores the parsed fields; deriving
    (url_norm, domain, path) per query re-runs ~10 regex passes over
    the corpus each time. Stored bucketed on ``domain`` — the policy
    key — so the per-domain census (url_domain_stats), the crawl
    budget (domain_budget_cap: both its salted stage's (domain, salt)
    grouping AND its merge satisfy ClusteredDistribution from the
    domain clustering — measured ZERO exchanges end-to-end) run with
    no exchange on the scan's reported clustering; the census's
    multi-distinct aggregate still shuffles (Spark's distinct rewrite
    goes through an Expand that drops clustering) but reads the
    STORED parsed columns instead of re-running the regex chain.
    Derivation is
    deterministic string expressions, so consumers are bit-identical
    to the derive-per-call path (parity-tested)."""
    # Lazy import: registry_ext owns the deterministic URL synthesis
    # (the columns both engines parse); registry_ext imports this
    # module at load, so the dependency must stay one-way at import
    # time.
    from ..registry_ext import _url_raw_messy_col
    from ..ops import strings as st
    import os

    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    raw = _url_raw_messy_col()
    parsed = d.select(
        "doc_id",
        "lang",
        "source",
        raw.alias("url_raw"),
        st.url_normalize(raw).alias("url_norm"),
        st.url_domain(raw).alias("domain"),
        st.url_path(raw).alias("path"),
    )
    write_curated_bucketed(parsed, url_table_name(sf_dir), "domain", n_buckets)


def curated_urls_or_none(spark, sf_dir: str):
    """The curated URL table when this session's catalog carries one,
    else None (session-scoped, memoized like curated_or_parquet)."""
    return _cached_table_or_none(spark, url_table_name(sf_dir))


def graph_table_name(sf_dir: str) -> str:
    """Catalog name of the curated co-order edge table for ``sf_dir``
    (weighted half-edge set: src < dst, w = co-occurrence count;
    bucketed on src)."""
    return bucketed_table_name(sf_dir, "co_order_edges", "src")


def graph_keys_table_name(sf_dir: str) -> str:
    """Companion table of already-ingested co-occurrence GROUP keys
    (one gkey per order absorbed into the edge store). The edge table
    retains edges, not group keys, so without this side table the
    whole-groups-per-batch ingest contract is unverifiable; with it,
    refresh_curated_edges can anti-check each batch cheaply. Group-
    cardinality-sized (orders, not lineitems), bucketed on gkey so
    the batch-disjointness semi-join is exchange-free."""
    return graph_table_name(sf_dir) + "_gkeys"


def write_curated_edges(
    spark, sf_dir: str, max_group: int = 64, n_buckets: int = 16
) -> None:
    """Materialize the co-order graph ONCE — the graph-tier curated
    layout. Every graph consumer (pagerank_iter, pagerank_weighted,
    triangle_count, graph_degree_stats) re-derives the same edge list
    per call: a groupBy(order).collect_set + bounded in-group pair
    explode + distinct/count over the full fact table — ~1.3 s of the
    2.3 s pagerank wall at sf0.1, and at 100 TB a multi-TB shuffle
    repeated per query. A production graph pipeline stores the edge
    list at ingest and re-derives only on fact-table change.

    Stored form: the WEIGHTED half-edge set (src < dst, w =
    number of co-occurring groups), which subsumes every consumer —
    unweighted edges are the projection (weights dropped; the half set
    is distinct by construction), the undirected half set feeds the
    triangle census directly, and the full directed set is a
    shuffle-free mirror union. Bucketed on src so the per-source
    degree/share aggregations of the pagerank family run
    exchange-free on the scan's reported clustering. Derivation is
    deterministic, so consumers are bit-identical to the plain path.
    """
    import os

    from ..extensions.graph import co_occurrence_weighted_half

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    half = co_occurrence_weighted_half(li, "l_orderkey", "l_partkey", max_group)
    write_curated_bucketed(half, graph_table_name(sf_dir), "src", n_buckets)
    # Companion ingested-group-keys table: lets refresh_curated_edges
    # VALIDATE its whole-groups-per-batch contract instead of trusting
    # it (see graph_keys_table_name).
    keys = li.select(F.col("l_orderkey").alias("gkey")).distinct()
    write_curated_bucketed(keys, graph_keys_table_name(sf_dir), "gkey", n_buckets)


def refresh_curated_edges(spark, sf_dir: str, new_facts: DataFrame,
                          max_group: int = 64,
                          validate_batch_keys: bool = True) -> None:
    """Absorb a fact-table batch into the curated edge store — the
    graph tier's ingest loop.

    PRECONDITION: each co-occurrence group (l_orderkey) arrives WHOLE
    in exactly one batch. Co-occurrence groups ARE the grouping key's
    groups, and under that contract the batch's half-edges derive
    from the batch alone: O(batch) work, appended as delta
    (src, dst, w) rows via the table's own bucket spec. A caller that
    splits one order across batches would silently UNDER-count
    cross-batch pairs and apply max_group per fragment. Orders are
    write-once in this data model (reference: one form/order file per
    submission, parserTools.py's per-form ingestion), so the contract
    matches how facts actually arrive — but since VERDICT r10/ADVICE
    flagged trusting it, the contract is now VALIDATED by default:
    the batch's distinct group keys are semi-joined (exchange-free —
    both sides bucketed on the key) against the companion
    ingested-keys table and any overlap raises before the store is
    touched. ``validate_batch_keys=False`` opts out (e.g. replaying a
    batch into a store that is about to be rebuilt); stores curated
    before the keys table existed skip the check with a warning.

    Readers fold duplicates with a groupBy(src, dst).sum(w) that the
    bucketed layout keeps exchange-free (src is a prefix of the
    grouping keys), so the served weights equal a from-scratch
    rebuild's exactly."""
    from ..extensions.graph import co_occurrence_weighted_half

    keys_tbl = graph_keys_table_name(sf_dir)
    have_keys_tbl = spark.catalog.tableExists(keys_tbl)
    batch_keys = new_facts.select(F.col("l_orderkey").alias("gkey")).distinct()
    if validate_batch_keys:
        if have_keys_tbl:
            overlap = (
                batch_keys.join(spark.table(keys_tbl), "gkey", "left_semi")
                .limit(1)
                .count()
            )
            if overlap:
                raise ValueError(
                    "refresh_curated_edges: batch contains group keys already "
                    f"ingested into {keys_tbl} — a group split across batches "
                    "under-counts cross-batch pairs. Re-derive the store with "
                    "write_curated_edges, or pass validate_batch_keys=False "
                    "if this replay is intentional."
                )
        else:
            import logging

            logging.getLogger(__name__).warning(
                "refresh_curated_edges: no ingested-keys table %s (store "
                "curated before the validation landed) — batch disjointness "
                "NOT checked this call; rebuild via write_curated_edges to "
                "enable it.", keys_tbl,
            )
    delta = co_occurrence_weighted_half(
        new_facts, "l_orderkey", "l_partkey", max_group
    )
    # Keys are registered BEFORE the edge delta lands (r11 review):
    # if the process dies between the two appends, a replay of the
    # batch now RAISES at validation (loud, operator decides — the
    # edges of that batch are missing and the store needs a rebuild or
    # a validate_batch_keys=False replay) instead of passing
    # validation and silently double-counting every edge weight, which
    # no reader could ever detect. Fail-safe beats fail-silent.
    if have_keys_tbl:
        keys_delta = batch_keys
        if not validate_batch_keys:
            # A no-validate call is usually a REPLAY whose keys are
            # already registered; unconditionally appending would grow
            # the keys table by one duplicate row set per replay,
            # forever (r11 ADVICE). Register only the genuinely new
            # keys — exchange-free anti-join, both sides bucketed on
            # gkey — so replays are idempotent on the keys table while
            # a no-validate NEW batch still registers.
            keys_delta = batch_keys.join(
                spark.table(keys_tbl), "gkey", "left_anti"
            )
        append_curated_bucketed(keys_delta, keys_tbl, "gkey")
    # Delta derives from new_facts ALONE — correct only under the
    # whole-groups-per-batch precondition above.
    append_curated_bucketed(delta, graph_table_name(sf_dir), "src")


def curated_edges_or_none(spark, sf_dir: str):
    """The curated weighted half-edge table when this session's
    catalog carries one, else None (session-scoped, memoized like
    curated_or_parquet). Served FOLDED: appended ingest batches leave
    one delta row per (src, dst) per batch, so reads aggregate
    sum(w) — exchange-free on the src-bucketed scan (bucket cols are
    a prefix of the grouping keys) and the identity map on a
    freshly-built table."""
    cur = _cached_table_or_none(spark, graph_table_name(sf_dir))
    if cur is None:
        return None
    return cur.groupBy("src", "dst").agg(F.sum("w").alias("w"))


def curated_pq_or_none(spark, sf_dir: str):
    """The curated IVF+PQ code table when this session's catalog
    carries one, else None (session-scoped like curated_or_parquet;
    detection memoized per session)."""
    return _cached_table_or_none(spark, pq_table_name(sf_dir))


def curated_ivf_or_none(spark, sf_dir: str):
    """(centroids, cells) DataFrames of the curated IVF index when
    this session's catalog carries one, else None. Session-catalog
    scoped like curated_or_parquet — stale warehouse dirs never shadow
    fresh parquet. Detection memoized per session."""
    cells_name, cents_name = ivf_table_names(sf_dir)
    cells = _cached_table_or_none(spark, cells_name)
    cents = _cached_table_or_none(spark, cents_name)
    if cells is not None and cents is not None:
        return cents, cells
    return None


def curated_or_parquet(spark, sf_dir: str, table: str, bucket_col: str):
    """Read ``table`` preferring the curated bucketed copy when one
    exists in this session's catalog: returns ``(df, curated)``.

    Detection is catalog-scoped on purpose — the default in-memory
    catalog only knows tables written THIS session, so a stale
    warehouse directory can never silently shadow fresh parquet. The
    driver/oracle path (no curated table) is bit-identical: the
    curated copy holds the same rows, only the physical layout
    differs, and every consumer is layout-agnostic. Detection (and the
    plain-path reader plan — ``spark.read.parquet`` re-lists files and
    re-reads footers per call) is memoized per session.

    The memoized plain handle pins the file listing and schema
    captured at first read. Curated writes invalidate it (they call
    detect_cache_clear), but an out-of-band rewrite of the plain
    parquet DIRECTORY would not — so the cache entry carries the
    directory's mtime and is dropped when that changes (a single
    os.stat per call, ~1 µs, vs the 40-180 ms footer re-read the memo
    exists to avoid). Rewrites that preserve the directory mtime
    (byte-level file surgery) remain the caller's problem:
    detect_cache_clear() is the escape hatch."""
    name = bucketed_table_name(sf_dir, table, bucket_col)
    df = _cached_table_or_none(spark, name)
    if df is not None:
        return df, True
    return plain_parquet(spark, os.path.join(sf_dir, f"{table}.parquet")), False


def plain_parquet(spark, path: str) -> DataFrame:
    """Memoized ``spark.read.parquet(path)`` — the shared plain-table
    reader behind registry._t and curated_or_parquet. Every naked
    ``spark.read.parquet`` costs a driver-side footer/schema job
    (~40-180 ms under load, measured as TWO such jobs at the head of
    every two-table query — the r8 dedup_exact-creep class); at a
    real deployment the analog is a metastore round trip per query.
    One read per (session, path, directory-mtime): the mtime in the
    key makes an out-of-band directory rewrite re-read instead of
    serving a pinned stale file listing; mtime-preserving byte surgery
    remains the caller's problem (detect_cache_clear is the escape
    hatch)."""
    try:
        mtime = os.stat(path).st_mtime_ns
    except OSError:
        mtime = None
    key = (id(spark), f"__plain__{path}")
    hit = _DETECT_CACHE.get(key)
    if isinstance(hit, tuple) and hit[1] == mtime:
        return hit[0]
    df = spark.read.parquet(path)
    _DETECT_CACHE[key] = (df, mtime)
    return df
