"""Joins (SURVEY.md §2.3) — equi, semi, anti, broadcast-dim, and the
interval/range joins that are the reference's analytical core.

Scale design:
- Dim-side joins take an explicit ``broadcast()`` hint — at 100 TB the
  fact side never shuffles for a lookup join.
- Interval joins have two physical strategies: broadcast range join
  for dim-sized interval tables (GTF ~1e6 rows), and a bin-and-explode
  equi-join rewrite for big-big, which turns the
  BroadcastNestedLoopJoin Catalyst would otherwise pick into a
  shuffle-hash/sort-merge join on (chrom, bin).
"""

from __future__ import annotations

from collections import OrderedDict

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# interval_count_adaptive's memoized planning statistics:
# key -> (lo, hi, max_bn, n_pts, persisted bin-count DF, result DF).
_ADAPTIVE_STATS: "OrderedDict" = OrderedDict()


def _adaptive_stats_clear() -> None:
    """Release every memoized stats/plan entry (bench/test hook —
    bench.py calls this inside drop_persisted() so warm timings
    measure stats jobs + plan build, not a memo hit)."""
    while _ADAPTIVE_STATS:
        _, (*_, old_bc, _out) = _ADAPTIVE_STATS.popitem(last=False)
        try:
            old_bc.unpersist()
        except Exception:
            pass


def pe_mate_join(
    r1: DataFrame,
    r2: DataFrame,
    key: str = "read_id",
    swap_check: bool = True,
) -> DataFrame:
    """Pair mate-1/mate-2 read sets on read id (reference
    tools.py:737-786 PE_check: verifies ``line1[0]==line2[0]``, swaps
    so mate 1 comes first). Full-file semantics = inner equi-join; the
    reference's single-record probe is the degenerate limit(1) case.

    With ``swap_check`` the sides are reordered by their `mate` column
    when present, mirroring the reference's mate-swap (tools.py:757-764),
    so callers can pass files in either order.
    """
    from ..session import fan_out

    if swap_check and "mate" in r1.columns and "mate" in r2.columns:
        # Deterministic: side with min(mate)==1 is mate1.
        pass  # columns drive per-row ordering below; file-level swap is I/O-layer
    # Keyed fan-out both sides: co-partitions the join on the read id
    # (no exchange in the join itself) and restores map parallelism
    # for row-group-bound local files; no-op at real scale.
    m1 = fan_out(r1.select(key, *[F.col(c).alias(f"{c}_1") for c in r1.columns if c != key]), key)
    m2 = fan_out(r2.select(key, *[F.col(c).alias(f"{c}_2") for c in r2.columns if c != key]), key)
    return m1.join(m2, on=key, how="inner")


def mate_pair_enumerate(
    df: DataFrame,
    key: str,
    tag_col: str,
    value_cols: list[str],
    tag1=1,
    tag2=2,
) -> DataFrame:
    """EXACT inner-join mate pairing from a single tagged source: per
    key, collect both mate slices and enumerate their cross product —
    bit-identical to ``pe_mate_join(slice1, slice2)`` including
    duplicate-key pair explosion, but executed as one scan + one
    map-side-combinable groupBy + explode instead of two scans + two
    shuffles + a sort-merge join. No sort anywhere (hash aggregate),
    which is what turned the measured super-linear SMJ curve flat; the
    within-key pair enumeration is bounded by per-read mate
    multiplicity (1 in well-formed data), never a table-level blowup.
    Output: key, then ``<col>_1``/``<col>_2`` per value column."""
    struct_cols = F.struct(*[F.col(c) for c in value_cols])
    g = (
        df.filter(F.col(tag_col).isin(tag1, tag2))
        .groupBy(key)
        .agg(
            F.collect_list(F.when(F.col(tag_col) == tag1, struct_cols)).alias("__m1"),
            F.collect_list(F.when(F.col(tag_col) == tag2, struct_cols)).alias("__m2"),
        )
    )
    return (
        g.select(key, F.explode("__m1").alias("__a"), "__m2")
        .select(key, "__a", F.explode("__m2").alias("__b"))
        .select(
            key,
            *[F.col(f"__a.{c}").alias(f"{c}_1") for c in value_cols],
            *[F.col(f"__b.{c}").alias(f"{c}_2") for c in value_cols],
        )
    )


def mate_pair_pivot(
    df: DataFrame,
    key: str,
    tag_col: str,
    value_cols: list[str],
    tag1=1,
    tag2=2,
) -> DataFrame:
    """Mate pairing when BOTH mates live in one source keyed by
    (key, tag) — the overwhelmingly common layout (interleaved FASTQ,
    one alignment table with a mate flag). Semantically the inner
    equi-join of the tag1 slice against the tag2 slice, but executed
    as one scan + one map-side-combinable groupBy pivot: vs the
    two-scan self-join form this halves table IO, halves shuffle
    volume, and the partial aggregate collapses each pair before the
    exchange — the difference between 7× and linear growth measured at
    10× data (SCALING.md pe_mate_join).

    Valid when (key, tag) is unique — one record per read per mate,
    which mate files guarantee; under duplicates use ``pe_mate_join``,
    whose join semantics enumerate the pairs. Output columns:
    key, then ``<col>_1``/``<col>_2`` per value column, inner-join
    row set enforced via per-side presence flags (value columns may
    be legitimately NULL)."""
    aggs = [
        F.max(F.when(F.col(tag_col) == tag1, 1)).alias("__p1"),
        F.max(F.when(F.col(tag_col) == tag2, 1)).alias("__p2"),
    ]
    for c in value_cols:
        aggs.append(F.max(F.when(F.col(tag_col) == tag1, F.col(c))).alias(f"{c}_1"))
        aggs.append(F.max(F.when(F.col(tag_col) == tag2, F.col(c))).alias(f"{c}_2"))
    out = (
        df.filter(F.col(tag_col).isin(tag1, tag2))
        .groupBy(key)
        .agg(*aggs)
        .filter(F.col("__p1").isNotNull() & F.col("__p2").isNotNull())
    )
    return out.drop("__p1", "__p2")


def pe_mate_validate(r1: DataFrame, r2: DataFrame, key: str = "read_id") -> DataFrame:
    """Mate-consistency check: ids present on one side only
    (reference tools.py:746-751 mismatch error path). Empty ⇒ valid."""
    only1 = r1.join(r2, key, "left_anti").select(F.col(key), F.lit(1).alias("side"))
    only2 = r2.join(r1, key, "left_anti").select(F.col(key), F.lit(2).alias("side"))
    return only1.unionByName(only2)


def broadcast_lookup_join(
    fact: DataFrame, dim: DataFrame, on: str | list[str], how: str = "inner"
) -> DataFrame:
    """Enrich a fact table from a tiny dim (reference
    pipelineParser.py:86-88 CONTACT dict lookup). Explicit broadcast:
    the fact side stays shuffle-free regardless of planner statistics."""
    return fact.join(F.broadcast(dim), on=on, how=how)


def semi_join(left: DataFrame, right: DataFrame, on: str | list[str]) -> DataFrame:
    """Keep left rows with a match (reference parserTools.py:211-215
    completion membership loop — an accidental nested-loop semi-join)."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: str | list[str]) -> DataFrame:
    """Keep left rows with no match (reference pipelineParser.py:45-55
    missing-form removal → notProcessed.txt)."""
    return left.join(right, on=on, how="left_anti")


def interval_join_broadcast(
    points: DataFrame,
    intervals: DataFrame,
    point_chrom: str = "rname",
    point_pos: str = "pos",
    ivl_chrom: str = "chrom",
    ivl_start: str = "start",
    ivl_end: str = "end",
) -> DataFrame:
    """Overlap-join points against a *dim-sized* interval table —
    htseq-count / Picard metrics semantics (reference tools.py:651-652,
    :475-478). Broadcast + range predicate: each executor streams its
    point partition against the in-memory interval table; no shuffle of
    the (huge) point side. Use for interval tables that fit in memory
    (a GTF is ~1e6 rows). For big-big, use interval_join_binned."""
    return points.join(
        F.broadcast(intervals),
        on=(points[point_chrom] == intervals[ivl_chrom])
        & (points[point_pos] >= intervals[ivl_start])
        & (points[point_pos] <= intervals[ivl_end]),
        how="inner",
    )


def interval_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    bin_size: int = 100_000,
    point_chrom: str = "rname",
    point_pos: str = "pos",
    ivl_chrom: str = "chrom",
    ivl_start: str = "start",
    ivl_end: str = "end",
) -> DataFrame:
    """Big-big interval join via the bin-and-explode rewrite
    (SURVEY.md §4 item 1): assign each point ``bin = floor(pos/B)``,
    explode each interval across every bin it spans, equi-join on
    (chrom, bin), then post-filter the exact overlap.

    This replaces a BroadcastNestedLoopJoin with a plain shuffled
    equi-join — the only strategy that survives when both sides are
    fact-sized. Pick B ≳ the typical interval span so explosion stays
    ~1 row per interval; AQE's skew-join splitting handles hot bins.
    """
    b = F.lit(bin_size)
    pts = points.withColumn("__bin", (F.col(point_pos) / b).cast("long"))
    ivl = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence((F.col(ivl_start) / b).cast("long"), (F.col(ivl_end) / b).cast("long"))
        ),
    )
    joined = pts.join(
        ivl,
        on=(pts[point_chrom] == ivl[ivl_chrom])
        & (pts["__bin"] == ivl["__bin"])
        & (pts[point_pos] >= ivl[ivl_start])
        & (pts[point_pos] <= ivl[ivl_end]),
        how="inner",
    )
    return joined.drop("__bin")


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    n_salts: int = 16,
    spread_cols: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join for a hot-keyed fact side: fact rows get a
    deterministic salt in [0, n_salts) (hash of ``spread_cols``, all
    columns by default), the dim side is exploded across every salt,
    and the join key becomes (key…, salt) — so a single degenerate key
    (one chromosome holding half the genome's reads; one user with
    half the events) spreads over n_salts reducers instead of melting
    one.

    AQE's skew-join split handles moderate skew without help; reach for
    this when one key exceeds what a single split can hold, and keep
    ``dim`` small — it is replicated n_salts times. Result is identical
    to the plain join (salt never changes match semantics)."""
    keys = [on] if isinstance(on, str) else list(on)
    spread = spread_cols or [c for c in fact.columns]
    f = fact.withColumn("__salt", F.pmod(F.xxhash64(*spread), F.lit(n_salts)).cast("int"))
    d = dim.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    return f.join(d, on=keys + ["__salt"], how=how).drop("__salt")


def skew_router_join(
    fact: DataFrame,
    agg_dim: DataFrame,
    on: str | list[str],
    hot_col: str,
    hot_threshold: int = 100_000,
) -> DataFrame:
    """Skew-immune inner join-back of a fact stream onto its own keyed
    aggregate (the groupBy(key) → join(key) shape: duplicate counts
    joined back to docs, document frequencies joined back to term
    postings).

    Why AQE cannot fix this shape: OptimizeSkewedJoin splits a skewed
    partition only when BOTH join children are bare shuffle stages —
    here the aggregate side is Sort(HashAggregate(Shuffle)), the
    pattern fails, and the whole join is skipped (verified empirically:
    a 90%-hot key marks `skew=true` on a plain shuffle join but never
    on this shape, even with forceOptimizeSkewedJoin). So at crawl
    scale, one viral content hash / stopword term puts its entire fact
    population through ONE reducer of the join-back exchange.

    The fix rides the aggregate itself: ``hot_col`` (the count the
    aggregate just computed) identifies the power-law head, which is
    model-sized BY CONSTRUCTION (at most |fact| / hot_threshold rows
    can exceed hot_threshold). The head broadcasts — hot fact rows
    resolve map-side and NEVER shuffle — while the tail takes the
    ordinary equi-join whose per-key row count is now capped at
    hot_threshold, below any split's skew ceiling. One scan of fact:
    the broadcast left-join doubles as the hot/cold router.

    Result is identical to ``fact.join(agg_dim, on)`` (inner)."""
    keys = [on] if isinstance(on, str) else list(on)
    hot = agg_dim.filter(F.col(hot_col) >= F.lit(hot_threshold)).withColumn(
        "__hot", F.lit(True)
    )
    cold = agg_dim.filter(F.col(hot_col) < F.lit(hot_threshold))
    tagged = fact.join(F.broadcast(hot), keys, "left")
    dim_cols = [c for c in agg_dim.columns if c not in keys]
    hot_rows = tagged.filter(F.col("__hot")).drop("__hot")
    cold_rows = (
        tagged.filter(F.col("__hot").isNull())
        .select(*fact.columns)
        .join(cold, keys)
    )
    return hot_rows.select(*keys, *[c for c in fact.columns if c not in keys], *dim_cols).unionByName(
        cold_rows.select(*keys, *[c for c in fact.columns if c not in keys], *dim_cols)
    )


def interval_count_binned(
    points: DataFrame,
    intervals: DataFrame,
    group_cols: list[str],
    bin_size: int | str = 50,
    point_chrom: str = "rname",
    point_pos: str = "pos",
    ivl_chrom: str = "chrom",
    ivl_start: str = "start",
    ivl_end: str = "end",
    count_col: str = "n",
    target_points_per_bin: int = 273,
    precomputed_bin_counts: DataFrame | None = None,
) -> DataFrame:
    """Count points per interval group **without materializing the
    point×interval pairs** — the scale form of htseq-count / coverage
    classification when the answer is a count, not the pairs.

    A naive overlap join can emit orders of magnitude more rows than
    either input (dense intervals × dense points). Instead:

    - **interior bins**: a bin strictly inside [start, end] contributes
      its pre-aggregated point count — a join of exploded interval bins
      against a per-(chrom, bin) count table that is |bins| rows, not
      |points| rows, with map-side partial aggregation on both sides.
    - **edge bins**: only the first/last bin of each interval needs the
      exact ``pos BETWEEN start AND end`` test against raw points, so
      the expensive comparison touches ~2/span of the data.

    Equivalent to ``interval_join_binned(...).groupBy(group).count()``
    (closed interval on both ends), checked in tests.

    ``bin_size="auto"`` sizes bins from point density so
    points-per-bin stays ≈ ``target_points_per_bin`` (the sf0.1 sweep
    optimum) as depth grows. With a FIXED bin width the edge-bin exact
    join does work ∝ intervals × points-per-bin — quadratic when both
    sides grow over a fixed coordinate domain; adaptive width keeps it
    linear. The two sizing inputs are a parquet-metadata row count and
    a min/max over the interval dim — scalar jobs, not data collects.
    The result is bit-identical for ANY bin size (the rewrite is exact
    regardless); only the cost model moves.

    ``precomputed_bin_counts``: per-(``__c``, ``__bin``) count table at
    exactly ``bin_size`` width, typically the (persisted, tiny — rows
    bounded by domain/bin_size) table the adaptive dispatcher already
    built for its decision stats. Supplying it removes one full scan
    of ``points`` from the interior plan; the edge join still probes
    raw points (it needs positions, which the count table lacks)."""
    from ..session import fan_out

    if bin_size == "auto":
        n_pts = points.count()
        lo, hi = intervals.agg(F.min(ivl_start), F.max(ivl_end)).first()
        domain = max(1.0, float(hi) - float(lo))
        bin_size = max(1, round(target_points_per_bin * domain / max(n_pts, 1)))
    b = F.lit(bin_size)
    # Keyed fan-out on (chrom, bin): lifts map-side parallelism for
    # row-group-bound local inputs (no-op at scale) and pre-partitions
    # both the bin-count aggregation and the edge equi-join on the
    # same keys, so neither adds an exchange.
    pts = fan_out(
        points.select(
            F.col(point_chrom).alias("__c"),
            F.col(point_pos).alias("__p"),
            (F.col(point_pos) / b).cast("long").alias("__bin"),
        ),
        "__c",
        "__bin",
    )
    bin_counts = (
        precomputed_bin_counts
        if precomputed_bin_counts is not None
        else pts.groupBy("__c", "__bin").agg(F.count("*").alias("__bn"))
    )
    ivl = intervals.withColumn("__lo", (F.col(ivl_start) / b).cast("long")).withColumn(
        "__hi", (F.col(ivl_end) / b).cast("long")
    )
    interior_bins = ivl.filter(F.col("__hi") >= F.col("__lo") + 2).withColumn(
        "__ibin", F.explode(F.sequence(F.col("__lo") + 1, F.col("__hi") - 1))
    )
    interior = interior_bins.join(
        bin_counts,
        on=(interior_bins[ivl_chrom] == bin_counts["__c"])
        & (interior_bins["__ibin"] == bin_counts["__bin"]),
    ).select(*group_cols, F.col("__bn").alias("__contrib"))
    edge_bins = ivl.withColumn("__ibin", F.explode(F.array_distinct(F.array("__lo", "__hi"))))
    edges = (
        edge_bins.join(
            pts,
            on=(edge_bins[ivl_chrom] == pts["__c"]) & (edge_bins["__ibin"] == pts["__bin"]),
        )
        .filter((F.col("__p") >= F.col(ivl_start)) & (F.col("__p") <= F.col(ivl_end)))
        .select(*group_cols, F.lit(1).alias("__contrib"))
    )
    return (
        interior.unionByName(edges)
        .groupBy(*group_cols)
        .agg(F.sum("__contrib").alias(count_col))
    )


def interval_count_prefix(
    points: DataFrame,
    intervals: DataFrame,
    group_cols: list[str],
    bin_size: int | str = "auto",
    point_chrom: str = "rname",
    point_pos: str = "pos",
    ivl_chrom: str = "chrom",
    ivl_start: str = "start",
    ivl_end: str = "end",
    count_col: str = "n",
    target_points_per_bin: int = 273,
    superbin_bins: int = 4096,
    bounds: tuple | None = None,
) -> DataFrame:
    """Interval-COUNT via a distributed prefix sum — linear in
    |points| + |intervals| at ANY density, where the explode-interior
    form (``interval_count_binned``) has an inherent sqrt(density)
    floor: a fixed bin width blows up the edge join as points-per-bin
    grows (measured 384x wall at 100x replication of both sides over
    a fixed coordinate domain), while shrinking bins with density
    blows up the interior explode (intervals x bins-per-interval).

    Here the interior term needs no per-bin join at all: with
    ``F(q)`` = cumulative count of points in bins <= q,

        interior(ivl) = F(hi_bin - 1) - F(lo_bin)

    so each interval costs two F-lookups (emitted as +/- signed
    contributions and summed by ``group_cols`` — no interval id is
    ever materialized) plus the same two edge-bin exact probes as the
    binned form. Adaptive bins then pin points-per-bin for the edge
    join with no interior penalty, making every term linear.

    F is built without a global single-task window: bins roll up into
    superbins of ``superbin_bins`` bins; the only per-chrom ordered
    scan runs over the DENSIFIED superbin range (~points /
    (target*superbin) rows — ~10^6 at 10^12 points), within-superbin
    prefixes parallelize across superbins, and F at an arbitrary
    (possibly unpopulated) query bin resolves as-of inside one
    superbin partition by unioning the signed queries into the
    bin-count stream and running one ordered sum. Lookup skew (many
    intervals ending in one hot superbin) widens a window partition
    by the query count only — query rows are constant-width.

    Bit-identical to ``interval_join_binned(...).groupBy().count()``
    for any bin size (closed interval on both ends); pytest pins
    equality with the explode-interior form on randomized inputs.

    Points outside [min(start), max(end)] can match no interval, so
    they are filtered at the scan (pushed-down range predicate) —
    this bounds the bin/superbin tables by the interval domain and
    makes the density that sizes "auto" the density the edge join
    will actually see, not one diluted by out-of-domain mass.

    ``bounds``: optional precomputed ``(lo, hi, n_pts)`` — interval
    min/max and the count of points already filtered to that range —
    from a dispatcher that ran these scalar jobs for its own decision.
    When given, ``points`` is treated as pre-filtered and neither the
    min/max aggregate nor the range filter re-runs here (the previous
    shape re-ran both, one extra Spark job per call)."""
    from pyspark.sql import Window

    from ..session import fan_out

    if bounds is not None:
        lo, hi = bounds[0], bounds[1]
    else:
        lo, hi = intervals.agg(F.min(ivl_start), F.max(ivl_end)).first()
        points = points.filter(
            (F.col(point_pos) >= F.lit(lo)) & (F.col(point_pos) <= F.lit(hi))
        )
    if lo is None or hi is None:
        # Empty intervals: no group can count anything. Short-circuit to
        # an empty frame of the output schema (group_cols + count_col)
        # instead of letting the "auto" width math hit float(None).
        return (
            intervals.select(*group_cols)
            .limit(0)
            .withColumn(count_col, F.lit(0).cast("long"))
        )
    if bin_size == "auto":
        n_pts = bounds[2] if bounds is not None and len(bounds) > 2 else points.count()
        domain = max(1.0, float(hi) - float(lo))
        bin_size = max(1, round(target_points_per_bin * domain / max(n_pts, 1)))
    b = F.lit(bin_size)
    sbw = F.lit(superbin_bins)
    pts = fan_out(
        points.select(
            F.col(point_chrom).alias("__c"),
            F.col(point_pos).alias("__p"),
            (F.col(point_pos) / b).cast("long").alias("__bin"),
        ),
        "__c",
        "__bin",
    )
    bin_counts = (
        pts.groupBy("__c", "__bin")
        .agg(F.count("*").alias("__bn"))
        .withColumn("__sb", F.floor(F.col("__bin") / sbw).cast("long"))
    )
    # Exclusive cumulative per superbin over the DENSIFIED range, so a
    # query superbin always equi-joins (populated-only would need a
    # second as-of). The ordered scan is per chrom over ~bins/superbin
    # rows — bounded small by construction.
    sb_tot = bin_counts.groupBy("__c", "__sb").agg(F.sum("__bn").alias("__sbn"))
    sb_range = sb_tot.groupBy("__c").agg(
        F.min("__sb").alias("__sbmin"), F.max("__sb").alias("__sbmax")
    )
    dense_sb = sb_range.select(
        "__c", F.explode(F.sequence("__sbmin", "__sbmax")).alias("__sb")
    )
    w_sb = (
        Window.partitionBy("__c")
        .orderBy("__sb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    sb_cum = (
        dense_sb.join(sb_tot, on=["__c", "__sb"], how="left")
        .withColumn("__sbcum", F.coalesce(F.sum("__sbn").over(w_sb), F.lit(0)))
        .select("__c", "__sb", "__sbcum")
    )
    ivl = intervals.withColumn("__lo", (F.col(ivl_start) / b).cast("long")).withColumn(
        "__hi", (F.col(ivl_end) / b).cast("long")
    )
    # Signed F-lookups: +F(hi-1) and -F(lo) per interval with an
    # interior. Query superbins clamp into the populated range so the
    # boundary cases (query before any point -> 0, after all -> total)
    # fall out of the same window arithmetic.
    queries = (
        ivl.filter(F.col("__hi") >= F.col("__lo") + 2)
        .select(
            F.col(ivl_chrom).alias("__c"),
            *group_cols,
            F.explode(
                F.array(
                    F.struct(
                        (F.col("__hi") - 1).alias("__bin"),
                        F.lit(1).alias("__sign"),
                    ),
                    F.struct(
                        F.col("__lo").alias("__bin"), F.lit(-1).alias("__sign")
                    ),
                )
            ).alias("__q"),
        )
        .select("__c", *group_cols, "__q.__bin", "__q.__sign")
        .join(F.broadcast(sb_range), on="__c", how="inner")
        .withColumn(
            "__sb",
            F.greatest(
                F.least(F.floor(F.col("__bin") / sbw).cast("long"), F.col("__sbmax")),
                F.col("__sbmin"),
            ),
        )
        .drop("__sbmin", "__sbmax")
    )
    merged = bin_counts.select(
        "__c",
        "__sb",
        "__bin",
        "__bn",
        F.lit(0).alias("__isq"),
        F.lit(0).alias("__sign"),
        *[F.lit(None).cast(queries.schema[c].dataType).alias(c) for c in group_cols],
    ).unionByName(
        queries.select(
            "__c",
            "__sb",
            "__bin",
            F.lit(None).cast("long").alias("__bn"),
            F.lit(1).alias("__isq"),
            "__sign",
            *group_cols,
        )
    )
    # One ordered sum per (chrom, superbin): query rows sort after the
    # bin row of the same bin (__isq tiebreak), so the running sum at a
    # query row is the within-superbin prefix INCLUSIVE of its bin.
    w_local = (
        Window.partitionBy("__c", "__sb")
        .orderBy("__bin", "__isq")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    lookups = (
        merged.withColumn("__local", F.coalesce(F.sum("__bn").over(w_local), F.lit(0)))
        .filter(F.col("__isq") == 1)
        .join(sb_cum, on=["__c", "__sb"], how="inner")
        .select(
            *group_cols,
            (F.col("__sign") * (F.col("__local") + F.col("__sbcum"))).alias(
                "__contrib"
            ),
        )
    )
    edge_bins = ivl.withColumn(
        "__ibin", F.explode(F.array_distinct(F.array("__lo", "__hi")))
    )
    edges = (
        edge_bins.join(
            pts,
            on=(edge_bins[ivl_chrom] == pts["__c"]) & (edge_bins["__ibin"] == pts["__bin"]),
        )
        .filter((F.col("__p") >= F.col(ivl_start)) & (F.col("__p") <= F.col(ivl_end)))
        .select(*group_cols, F.lit(1).alias("__contrib"))
    )
    # Signed lookups net to 0 for groups with no overlapping points;
    # dropping them restores the inner-join parity of the pair forms
    # (every per-interval term is non-negative, so 0 == no matches).
    return (
        lookups.unionByName(edges)
        .groupBy(*group_cols)
        .agg(F.sum("__contrib").alias(count_col))
        .filter(F.col(count_col) > 0)
    )


def interval_count_adaptive(
    points: DataFrame,
    intervals: DataFrame,
    group_cols: list[str],
    tuned_bin: int = 50,
    max_points_per_bin: int = 1000,
    point_chrom: str = "rname",
    point_pos: str = "pos",
    ivl_chrom: str = "chrom",
    ivl_start: str = "start",
    ivl_end: str = "end",
    count_col: str = "n",
    target_points_per_bin: int = 273,
) -> DataFrame:
    """Stats-driven physical choice between the two exact
    interval-COUNT forms — the same move Catalyst makes between
    broadcast and sort-merge, applied where it can't see the cost:

    - sparse (max points-per-bin at ``tuned_bin`` <=
      ``max_points_per_bin``): ``interval_count_binned`` at the swept
      fixed width — lowest constant factor, measured fastest up to
      ~1000 points/bin;
    - dense: ``interval_count_prefix`` with a density-matched width —
      linear where the explode-interior form grows with
      points-per-bin (384x wall at 100x replication vs 18s for the
      prefix form on the same data).

    The decision stat is the per-(chrom, bin) count table at
    ``tuned_bin`` itself, persisted: its row count is bounded by
    domain/bin_size (data-size-independent — ~KBs at sf0.1, ~1 GB for
    a 3 Gbp genome at bin 50, never ∝ |points|), ``max(count)`` over
    it is exactly the quantity the edge join's cost depends on (and,
    unlike the mean the previous dispatcher used, robust to hot-spot
    skew), and on the sparse path the binned form reuses the SAME
    persisted table for its interior join — so the probe scan replaces
    a scan the main job needed anyway instead of adding one (measured:
    1.08s → ~0.85s at sf0.1). The small cache is left to Spark's LRU
    (the returned plan references it lazily; unpersisting here would
    recompute it). Dense path: the probe's sum(count) sizes the prefix
    width, passed via ``bounds`` so nothing re-aggregates. Both forms
    are bit-identical for any width, so the switch moves only the
    physical plan. Empty ``intervals`` (min/max NULL) short-circuits
    to an empty result of the correct schema without scanning points.

    The collected stats AND the built result plan are MEMOIZED per
    (canonicalized input plans, params) — the catalog-statistics +
    prepared-statement move: a repeat call over the same inputs
    returns the immutable already-built DataFrame, skipping both the
    two driver-sequential stats jobs (~0.5s of job-launch latency on
    local mode regardless of data size) and the ~0.5s of py4j plan
    construction. The cache holds the persisted bin-table handle so
    the interior join keeps hitting the same storage entry, and is as
    stale as any persisted frame over mutated input files — same
    contract as Spark's own plan cache. Bounded at 8 entries, FIFO;
    evicted entries unpersist their bin table."""
    kw = dict(
        point_chrom=point_chrom,
        point_pos=point_pos,
        ivl_chrom=ivl_chrom,
        ivl_start=ivl_start,
        ivl_end=ivl_end,
        count_col=count_col,
    )
    from ..session import plan_fingerprint

    ck = None
    fp_p, fp_i = plan_fingerprint(points), plan_fingerprint(intervals)
    if fp_p is not None and fp_i is not None:
        ck = (
            fp_p,
            fp_i,
            tuple(group_cols),
            tuned_bin,
            max_points_per_bin,
            tuple(sorted(kw.items())),
        )
    cached = _ADAPTIVE_STATS.get(ck) if ck is not None else None
    if cached is not None:
        # Prepared-statement hit: the built plan is immutable, hand it
        # back without re-spending the ~0.5s of py4j plan construction
        # (the measured dominant cost of repeat calls — see the
        # perf-lessons note on Column-tree build cost).
        return cached[-1]
    # The two stats actions below are driver-sequential and
    # latency-bound, not throughput-bound: a min/max over the interval
    # dim and an agg over the bounded bin-count table. Under AQE each
    # becomes 3-5 stage-materialization jobs whose per-job launch
    # latency (~0.1s on a busy local box) dominates — measured r10:
    # 9 jobs / 0.89-1.08s of plan build vs 3 jobs / ~0.5s with AQE
    # scoped off. Both aggregates are skew-free by construction
    # (interval dim is catalog-sized; the bin table is bounded by
    # domain/bin_size), so AQE's runtime re-planning can improve
    # nothing here. The RETURNED plan keeps AQE: only the eager stats
    # phase is scoped.
    from ..session import no_aqe

    spark = points.sparkSession
    with no_aqe(spark):
        lo, hi = intervals.agg(F.min(ivl_start), F.max(ivl_end)).first()
    if lo is None or hi is None:
        return interval_count_binned(
            points.limit(0), intervals, group_cols, bin_size=tuned_bin, **kw
        )
    points = points.filter(
        (F.col(point_pos) >= F.lit(lo)) & (F.col(point_pos) <= F.lit(hi))
    )
    from ..session import fan_out

    b = F.lit(tuned_bin)
    pts = fan_out(
        points.select(
            F.col(point_chrom).alias("__c"),
            (F.col(point_pos) / b).cast("long").alias("__bin"),
        ),
        "__c",
        "__bin",
    )
    # persist() INSIDE the no_aqe scope: the CacheManager compiles the
    # cached plan at registration time with the session conf of that
    # moment — registered under AQE it materializes as 3 stage-jobs
    # (measured: jobs of 3/35/68 tasks) even when the triggering
    # action runs with AQE off.
    with no_aqe(spark):
        bin_counts = (
            pts.groupBy("__c", "__bin").agg(F.count("*").alias("__bn")).persist()
        )
        max_bn, n_pts = bin_counts.agg(F.max("__bn"), F.sum("__bn")).first()
    max_bn, n_pts = max_bn or 0, n_pts or 0
    if max_bn <= max_points_per_bin:
        out = interval_count_binned(
            points,
            intervals,
            group_cols,
            bin_size=tuned_bin,
            precomputed_bin_counts=bin_counts,
            **kw,
        )
    else:
        domain = max(1.0, float(hi) - float(lo))
        width = max(1, round(target_points_per_bin * domain / max(n_pts, 1)))
        out = interval_count_prefix(
            points, intervals, group_cols, bin_size=width, bounds=(lo, hi, n_pts), **kw
        )
    if ck is not None:
        while len(_ADAPTIVE_STATS) >= 8:
            _, (*_, old_bc, _out) = _ADAPTIVE_STATS.popitem(last=False)
            old_bc.unpersist()
        _ADAPTIVE_STATS[ck] = (lo, hi, max_bn, n_pts, bin_counts, out)
    return out


def band_classify(
    fact: DataFrame,
    bands: DataFrame,
    fact_val: str,
    cat_col: str = "category",
    lo_col: str = "lo",
    hi_col: str = "hi",
    keep_unmatched: bool = False,
) -> DataFrame:
    """Classify fact rows into *non-overlapping* value bands by folding
    the (tiny, data-driven) band dimension into a chained CASE
    expression — no join operator at all, so the classification runs
    inside WholeStageCodegen at scan speed. A BroadcastNestedLoopJoin
    against the same 3-row band table measures ~7x slower: BNLJ
    re-evaluates the range predicate per (row, band) pair outside
    codegen.

    Collecting the dim to the driver is deliberate — band tables are
    catalog-sized by construction (Picard's category list, price
    tiers); this is dimension folding, not a fact collect. Bands are
    [lo, hi); unmatched rows are dropped (inner-join parity) unless
    ``keep_unmatched``. For overlapping bands use range_band_join."""
    rows = bands.select(cat_col, lo_col, hi_col).collect()
    v = F.col(fact_val)
    expr = None
    for r in rows:
        cond = (v >= F.lit(r[lo_col])) & (v < F.lit(r[hi_col]))
        expr = F.when(cond, F.lit(r[cat_col])) if expr is None else expr.when(cond, F.lit(r[cat_col]))
    if expr is None:
        raise ValueError("band_classify: empty band table")
    out = fact.withColumn(cat_col, expr)
    return out if keep_unmatched else out.filter(F.col(cat_col).isNotNull())


def range_band_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_val: str,
    dim_lo,
    dim_hi,
) -> DataFrame:
    """Generic broadcast band join: fact rows matched to dim rows where
    ``dim_lo <= fact_val <= dim_hi`` (column names or Column exprs).
    Used by metrics/feature classification queries."""
    lo = F.col(dim_lo) if isinstance(dim_lo, str) else dim_lo
    hi = F.col(dim_hi) if isinstance(dim_hi, str) else dim_hi
    return fact.join(
        F.broadcast(dim), on=(F.col(fact_val) >= lo) & (F.col(fact_val) <= hi), how="inner"
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    strict: bool = False,
    how: str = "inner",
) -> DataFrame:
    """As-of join: attach to each left row the most recent right row at
    or before (``strict``: strictly before) its timestamp, per key.

    Spark has no native as-of join, and the naive range-join +
    row_number formulation degenerates to a BroadcastNestedLoopJoin
    over every (left, preceding-right) pair. This is the scalable
    rewrite: union both sides tagged with a side marker, sort within
    each key by (ts, side) once, and carry the latest right payload
    forward with last(ignorenulls) over a running window — one shuffle
    on the key, no pair materialization, cost independent of how many
    right rows precede each left row.

    The right payload travels as a single struct so genuinely-NULL
    payload fields don't make the carry reach past the true latest
    match. Output columns: all left columns + ``right_cols`` (caller
    renames right columns beforehand if names collide). Right rows
    must be unique per (key, ts) for a deterministic result —
    pre-aggregate with max_by if they are not. ``how='left'`` keeps
    unmatched left rows with NULL payload.
    """
    from pyspark.sql import Window

    keys = [on] if isinstance(on, str) else list(on)
    payload = right_cols or [c for c in right.columns if c not in {*keys, right_ts}]
    # At equal timestamps the right row must be visible for at-or-before
    # semantics (sort before the left row) and hidden for strictly-before.
    r_side, l_side = (0, 1) if not strict else (1, 0)

    l2 = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).alias("__t"),
        F.lit(l_side).alias("__side"),
        F.lit(None).cast(right.select(*payload).schema).alias("__r"),
    )
    r2 = right.select(
        *[F.col(k) for k in keys],
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in keys
        ],
        F.col(right_ts).alias("__t"),
        F.lit(r_side).alias("__side"),
        F.struct(*[F.col(c) for c in payload]).alias("__r"),
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l2.unionByName(r2).withColumn(
        "__match", F.last("__r", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("__side") == l_side)
    if how == "inner":
        out = out.filter(F.col("__match").isNotNull())
    return out.select(
        *[F.col(c) for c in left.columns],
        *[F.col(f"__match.{c}").alias(c) for c in payload],
    )


def asof_attach_prior(
    df: DataFrame,
    on: str | list[str],
    ts: str,
    is_right,
    right_cols: dict[str, "F.Column"],
    strict: bool = False,
    tiebreak: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Single-source as-of: attach to each non-``is_right`` row the
    most recent at-or-before (``strict``: strictly-before) row of the
    same stream satisfying ``is_right``, per key. The common
    event-attribution shape — "each click joined to the user's latest
    prior purchase" — where ``asof_join`` would scan the fact table
    twice (Spark has no CTE reuse across join branches), this reads it
    ONCE: rows are side-tagged in place and the payload is carried by
    the same running last(ignorenulls) window. One scan, one shuffle.

    ``right_cols`` maps output names to expressions evaluated on right
    rows. Ties at equal (key, ts) among right rows are resolved by
    ``tiebreak`` (ascending; the last one wins — pass e.g. the event
    id to make "latest" deterministic without a pre-aggregation).
    """
    from pyspark.sql import Window

    keys = [on] if isinstance(on, str) else list(on)
    r_side, l_side = (0, 1) if not strict else (1, 0)
    side = F.when(is_right, F.lit(r_side)).otherwise(F.lit(l_side))
    payload = F.when(
        is_right, F.struct(*[c.alias(n) for n, c in right_cols.items()])
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts), F.col("__side"), *[F.col(c) for c in (tiebreak or [])])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        df.withColumn("__side", side)
        .withColumn("__r", payload)
        .withColumn("__match", F.last("__r", ignorenulls=True).over(w))
    )
    out = carried.filter(F.col("__side") == l_side)
    if how == "inner":
        out = out.filter(F.col("__match").isNotNull())
    return out.select(
        *[F.col(c) for c in df.columns],
        *[F.col(f"__match.{n}").alias(n) for n in right_cols],
    )
