"""Data-quality operators: the gate a production pipeline runs before
publishing a batch — column profiling (the stats a human checks first)
and rule-based validation (the counts a scheduler alerts on).

Reference parity note: the reference pipelines validate inputs ad hoc
(arity checks, nonzero-size checks — parserTools.py:44-91,
pipelineParser.py:45-55); this module is the systematic generalization
a 100 TB store needs: every check is a full-scan aggregate with
map-side partial aggregation or an anti-join that AQE can broadcast —
never a driver-side loop over rows.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_profile(
    df: DataFrame,
    num_cols: list[str] = (),
    str_cols: list[str] = (),
) -> DataFrame:
    """Per-column profile: row count, null count, exact NDV, and
    min/max (numeric columns in ``min_num``/``max_num``, string-ish
    columns — including dates/timestamps, cast after the min/max —
    in ``min_str``/``max_str``).

    One wide aggregate computes every statistic in a single pass over
    the table (the distinct counts share one Expand-based aggregation),
    then a constant-sized explode pivots the single result row into
    one row per column — the profile itself never re-scans. At 100 TB
    swap ``approx_count_distinct`` in for exact NDV if a 2% error is
    acceptable; everything else is map-side combinable either way."""
    aggs: list = [F.count(F.lit(1)).alias("__n")]
    for c in list(num_cols) + list(str_cols):
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"__ndv_{c}"))
    for c in num_cols:
        aggs.append(F.min(F.col(c)).cast("double").alias(f"__min_{c}"))
        aggs.append(F.max(F.col(c)).cast("double").alias(f"__max_{c}"))
    for c in str_cols:
        aggs.append(F.min(F.col(c)).cast("string").alias(f"__min_{c}"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"__max_{c}"))
    one = df.agg(*aggs)

    def _row(c: str, numeric: bool):
        return F.struct(
            F.lit(c).alias("col_name"),
            F.col("__n").alias("n"),
            (F.col("__n") - F.col(f"__nn_{c}")).alias("n_null"),
            F.col(f"__ndv_{c}").alias("ndv"),
            (F.col(f"__min_{c}") if numeric else F.lit(None).cast("double")).alias("min_num"),
            (F.col(f"__max_{c}") if numeric else F.lit(None).cast("double")).alias("max_num"),
            (F.lit(None).cast("string") if numeric else F.col(f"__min_{c}")).alias("min_str"),
            (F.lit(None).cast("string") if numeric else F.col(f"__max_{c}")).alias("max_str"),
        )

    rows = [_row(c, True) for c in num_cols] + [_row(c, False) for c in str_cols]
    return one.select(F.explode(F.array(*rows)).alias("p")).select("p.*")


def pk_duplicates(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Primary-key violations: one row per key value appearing more
    than once, with its multiplicity. Map-side-combinable groupBy."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


def fk_orphans(
    child: DataFrame, parent: DataFrame, child_key: str, parent_key: str
) -> DataFrame:
    """Foreign-key violations: child rows whose key has no parent —
    a LEFT ANTI join, which AQE turns into a broadcast probe whenever
    the parent's key projection fits, and a shuffled null-skipping
    hash join otherwise. (Null child keys are not orphans, matching
    SQL FK semantics.)"""
    p = parent.select(F.col(parent_key).alias("__pk")).distinct()
    return child.filter(F.col(child_key).isNotNull()).join(
        p, on=(F.col(child_key) == F.col("__pk")), how="left_anti"
    )


def dq_counts(rules: dict[str, DataFrame]) -> DataFrame:
    """Fold named violation sets into one (rule, n_violations) report
    — the artifact a batch gate asserts on (`all counts == 0` to
    publish). Each rule contributes a 1-row count aggregate; the
    union of single-row plans is scheduler noise, not data volume."""
    parts = [
        v.agg(F.count(F.lit(1)).alias("n_violations")).select(
            F.lit(name).alias("rule"), "n_violations"
        )
        for name, v in sorted(rules.items())
    ]
    return reduce(DataFrame.unionByName, parts)


def corr_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pairwise Pearson correlations between numeric columns — the
    profiling step after ``table_profile`` (which columns are
    redundant, which move together). All C(n,2) correlations are
    aggregates in ONE wide groupBy-less pass over the table; the
    output is pair-count-sized. Rounded to 6 so the accumulation
    order (which varies with partitioning) can't leak into results.
    At 100 TB the single pass is the point: n(n-1)/2 separate
    ``df.stat.corr`` calls would each rescan the table."""
    aggs = []
    names = []
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            names.append((a, b))
            aggs.append(F.round(F.corr(F.col(a), F.col(b)), 6).alias(f"__c_{a}_{b}"))
    one = df.agg(*aggs)
    rows = [
        F.struct(
            F.lit(a).alias("col_a"),
            F.lit(b).alias("col_b"),
            F.col(f"__c_{a}_{b}").alias("corr"),
        )
        for a, b in names
    ]
    return one.select(F.explode(F.array(*rows)).alias("p")).select("p.*")


def anomaly_zscore(
    df: DataFrame,
    key_col: str,
    val_col: str,
    threshold: float = 2.5,
) -> DataFrame:
    """Per-group z-score outliers: flag rows whose value sits more than
    ``threshold`` sample standard deviations from their group mean.

    Deliberately NOT a window partitioned by the group key — a
    low-cardinality key would funnel every row of a group through one
    task at 100 TB. Instead: one map-side-combinable groupBy computes
    (mean, stddev) per key — a tiny aggregate — which joins back
    broadcast, and the z-score is then pure row-wise arithmetic.
    Stats are rounded to 6 decimals before the division (and z to 4
    after) so the flagged set is stable across partition layouts and
    engines despite float accumulation order."""
    stats = df.groupBy(key_col).agg(
        F.round(F.avg(val_col), 6).alias("__mu"),
        F.round(F.stddev_samp(val_col), 6).alias("__sd"),
    )
    z = F.round((F.col(val_col) - F.col("__mu")) / F.col("__sd"), 4)
    return (
        df.join(F.broadcast(stats), key_col)
        .withColumn("zscore", z)
        .filter(F.abs(F.col("zscore")) > threshold)
        .drop("__mu", "__sd")
    )


def equidepth_bins(
    df: DataFrame,
    col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Equi-depth histogram: exact quantile boundaries (one aggregate
    pass), then each row is binned by counting the boundaries below it
    — a broadcast of n_bins-1 doubles and a row-wise array scan, never
    a global NTILE window (which would sort the whole table through
    one reducer at scale). Returns per-bin row counts and value
    ranges. Spark `percentile` and DuckDB `quantile_cont` are
    bit-identical (verified), so the bin edges — and therefore the
    bin populations — match exactly."""
    ps = [i / n_bins for i in range(1, n_bins)]
    bounds = df.agg(
        F.percentile(F.col(col), F.array(*[F.lit(p) for p in ps])).alias("__bs")
    )
    binned = df.join(F.broadcast(bounds)).select(
        F.col(col),
        F.aggregate(
            "__bs",
            F.lit(0),
            lambda acc, b: acc + F.when(F.col(col) > b, 1).otherwise(0),
        ).alias("bin"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min(col), 2).alias("min_v"),
            F.round(F.max(col), 2).alias("max_v"),
        )
        .orderBy("bin")
    )


def mad_outliers(
    df: DataFrame,
    key_col: str,
    val_col: str,
    threshold: float = 3.5,
) -> DataFrame:
    """Robust per-group outliers via the modified z-score
    0.6745·|x − median| / MAD — the standard robust alternative to
    mean/stddev z-scores (a few extreme rows inflate the stddev and
    mask their own outlier-ness; the median and MAD are immune to
    up to 50% contamination).

    Two aggregate passes are inherent (MAD is a median OF deviations
    FROM a median), but both are map-side-combinable groupBys whose
    results are key-cardinality-sized and join back broadcast — no
    per-group window, so a hot group never funnels through one task.
    Spark `percentile` == DuckDB `quantile_cont` bit-identically,
    and scores round to 4 before thresholding, keeping the flagged
    set engine- and partition-stable."""
    med = df.groupBy(key_col).agg(
        F.percentile(F.col(val_col), 0.5).alias("__med")
    )
    dev = df.join(F.broadcast(med), key_col).withColumn(
        "__absdev", F.abs(F.col(val_col) - F.col("__med"))
    )
    mad = dev.groupBy(key_col).agg(
        F.percentile(F.col("__absdev"), 0.5).alias("__mad")
    )
    # try_divide: a zero MAD (>=50% of the group identical) is a
    # degenerate group where the modified z-score is undefined — the
    # null propagates through the > filter and flags nothing, matching
    # the oracle's explicit mad > 0 guard (ANSI mode would error).
    score = F.round(F.try_divide(F.lit(0.6745) * F.col("__absdev"), F.col("__mad")), 4)
    return (
        dev.join(F.broadcast(mad), key_col)
        .withColumn("mod_zscore", score)
        .filter(F.col("mod_zscore") > threshold)
        .drop("__med", "__absdev", "__mad")
    )


def winsorize_stats(
    df: DataFrame,
    key_col: str,
    val_col: str,
    p_low: float = 0.01,
    p_high: float = 0.99,
) -> DataFrame:
    """Per-group winsorization report: clip values to the group's
    [p_low, p_high] quantiles and compare the raw vs clipped mean —
    the one-pass-per-level robustness summary that tells you how much
    of a metric's mean is carried by its tails before you train on
    it. One quantile aggregate (key-cardinality-sized, broadcast
    back) + one clipped re-aggregate; no window, no sort."""
    q = df.groupBy(key_col).agg(
        F.percentile(F.col(val_col), p_low).alias("__lo"),
        F.percentile(F.col(val_col), p_high).alias("__hi"),
    )
    clipped = F.least(F.greatest(F.col(val_col), F.col("__lo")), F.col("__hi"))
    return (
        df.join(F.broadcast(q), key_col)
        .groupBy(key_col)
        .agg(
            F.round(F.first("__lo"), 6).alias("p_low"),
            F.round(F.first("__hi"), 6).alias("p_high"),
            F.round(F.avg(val_col), 6).alias("mean_raw"),
            F.round(F.avg(clipped), 6).alias("mean_winsorized"),
            F.sum((F.col(val_col) < F.col("__lo")).cast("long")).alias("n_clipped_low"),
            F.sum((F.col(val_col) > F.col("__hi")).cast("long")).alias("n_clipped_high"),
            F.count("*").cast("long").alias("n_rows"),
        )
    )
