"""Stage-DAG runner: sequential stages with short-circuit on failure
and per-stage status logging (reference tools.py:910-930 worker loop;
status codes tools.py:33-41; short-circuit assert :915-918).

The reference runs stages as subprocesses and logs to SQLite; here a
stage is a DataFrame transformation whose action triggers the actual
work, and status rows flow to the status-upsert sink.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Stage:
    name: str
    fn: Callable[[DataFrame], DataFrame]
    ok_code: str = "Ok"  # per-stage success codes, reference tools.py:33-41


@dataclass
class StageResult:
    stage: str
    status: str
    rows: int
    seconds: float
    error: str | None = None


@dataclass
class DagRun:
    results: list[StageResult] = field(default_factory=list)
    output: DataFrame | None = None

    @property
    def ok(self) -> bool:
        return all(r.status != "failed" for r in self.results)


def run_pipeline(
    spark: SparkSession,
    source: DataFrame,
    stages: list[Stage],
    sample_id: str = "sample",
    status_path: str | None = None,
) -> DagRun:
    """Run stages sequentially; a failing stage (exception or empty
    output — the reference's non-empty guard tools.py:116) marks
    failure and short-circuits the rest, like the reference's
    ``assert success[0]; break`` loop (tools.py:915-930)."""
    run = DagRun()
    df = source
    failed = False
    for st in stages:
        if failed:
            run.results.append(StageResult(st.name, "skipped", 0, 0.0))
            continue
        t0 = time.time()
        try:
            out = st.fn(df)
            n = out.count()  # the per-stage action (materialization point)
            if n == 0:
                raise ValueError(f"stage {st.name}: empty output")
            df = out
            run.results.append(StageResult(st.name, st.ok_code, n, time.time() - t0))
        except Exception as e:  # noqa: BLE001 — status capture, then stop
            run.results.append(
                StageResult(st.name, "failed", 0, time.time() - t0, error=str(e)[:200])
            )
            failed = True
    run.output = None if failed else df
    if status_path is not None:
        _write_status(spark, run, sample_id, status_path)
    return run


def _write_status(spark: SparkSession, run: DagRun, sample_id: str, path: str) -> None:
    from ..io.sinks import status_upsert

    rows = [
        (f"{sample_id}:{r.stage}", r.stage, r.status, None, r.error)
        for r in run.results
    ]
    updates = spark.createDataFrame(rows, "id string, stage string, status string, ts timestamp, notes string")
    import pyspark.sql.functions as F

    status_upsert(spark, updates.withColumn("ts", F.current_timestamp()), path)
