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
