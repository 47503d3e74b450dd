"""Set operations (SURVEY.md §2.7).

UNION here is set-union (distinct), matching the reference's
``sorted(set(a + b))`` idiom — not UNION ALL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def union_inputs(*dfs: DataFrame) -> DataFrame:
    """Union input name lists with dedup (reference mainScript.py:205-228:
    fQnames = -i list + -pe list + batch-file lines → sorted(set()))."""
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df)
    return out.distinct()


def param_set_union(*dfs: DataFrame) -> DataFrame:
    """PARAM accumulation with list(set()) after each append
    (reference pipelineParser.py:106-107, :115-116, :166)."""
    return union_inputs(*dfs)


def reject_except(submitted: DataFrame, rejected: DataFrame) -> DataFrame:
    """processed = submitted EXCEPT rejected (reference
    pipelineParser.py:45-55 remove-missing; mainScript.py:252-255
    malformed-arity removal). EXCEPT DISTINCT semantics."""
    return submitted.exceptAll(rejected).distinct()


def apply_changelog(
    snapshot: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    payload_cols: list[str],
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Apply a CDC changelog to a snapshot — MERGE semantics (the
    Delta/Iceberg maintenance primitive): per key the highest-``seq``
    change wins; op 'D' deletes the key, 'U'/'I' upserts its payload;
    keys the changelog never touches pass through unchanged; changed
    keys absent from the snapshot are inserts.

    Scale shape: the changelog collapses FIRST (max-struct ordered by
    seq — one map-side-combinable aggregation, so ten billion change
    rows shrink to one per touched key before any join), then a single
    full-outer equi-join on the key against the snapshot. Both sides
    hash-partition on the key; with a bucketed snapshot the join is
    exchange-free on that side.
    """
    from pyspark.sql import functions as F

    latest = changes.groupBy(*key_cols).agg(
        F.max(
            F.struct(
                F.col(seq_col).alias("__seq"),
                F.col(op_col).alias("__op"),
                *[F.col(c).alias(c) for c in payload_cols],
            )
        ).alias("__c")
    )
    j = snapshot.join(latest, on=key_cols, how="full_outer")
    kept = j.filter(F.col("__c").isNull() | (F.col("__c.__op") != "D"))
    return kept.select(
        *key_cols,
        *[
            F.when(F.col("__c").isNotNull(), F.col(f"__c.{c}"))
            .otherwise(F.col(c))
            .alias(c)
            for c in payload_cols
        ],
    )
