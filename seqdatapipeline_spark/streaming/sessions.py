"""Incremental sessionization and lateness-monitor kernels.

Both kernels are SOURCE-AGNOSTIC micro-batch updates: they take one
batch of events plus carried state and return (emitted rows, new
state). The batch can come from anywhere — a `spark.readStream` +
`foreachBatch` sink (tests/test_pipeline_streaming.py drives them
that way, with batch boundaries fixed by the file source's offsets)
or an eager drain over event-time ranges (the registry's
stream_session_windows / stream_late_monitor twins, whose scalar
min/max probes exist ONLY to split a static table into batches —
a real deployment gets boundaries from the source, never the data).

State is key-cardinality-bounded (one open session / one watermark
triple per active user), so the kernels scale with the user universe,
not stream length — the property that keeps them alive on an
unbounded 100 TB/day stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..ops.windows import epoch_seconds, lateness_flags
from .rollup import merge_rollup


def session_batch_update(
    batch: DataFrame,
    state: DataFrame | None,
    gap: float = 1800.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> tuple[DataFrame, DataFrame]:
    """One micro-batch of incremental session windows.

    The batch sessionizes locally (F.session_window — Spark's native
    gap-based session assignment), then reconciles with the carried
    per-user OPEN session: the batch's first session absorbs the open
    one when the gap is within ``gap`` seconds, otherwise the open
    session closes and is emitted. The batch's last session per user
    becomes the new open state; untouched users carry through.

    Requires event-time-ordered batches per user (the guarantee a
    watermarked source provides). Returns ``(closed, new_state)``;
    ``closed`` rows are final. Streaming ≡ batch exactly — the
    identity tests/test_pipeline_streaming.py checks against the
    one-shot session_windows query.
    """
    gap_s = float(gap)
    sess = (
        batch.groupBy(F.session_window(ts_col, f"{int(gap_s)} seconds"), user_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(value_col).alias("val"),
        )
        .select(
            user_col,
            epoch_seconds(F.col("session_window.start")).alias("start_s"),
            (epoch_seconds(F.col("session_window.end")) - gap_s).alias("last_s"),
            "n",
            "val",
        )
    )
    wu = Window.partitionBy(user_col).orderBy("start_s")
    cnt = Window.partitionBy(user_col)
    sess = sess.select(
        "*",
        F.row_number().over(wu).alias("__rn"),
        F.count(F.lit(1)).over(cnt).alias("__cnt"),
    )
    carried = None
    closed = None
    if state is not None:
        st = state.select(
            user_col,
            F.col("o_start").alias("__os"),
            F.col("o_last").alias("__ol"),
            F.col("o_n").alias("__on"),
            F.col("o_val").alias("__ov"),
        )
        sess = sess.join(st, user_col, "left")
        merged = F.col("__os").isNotNull() & (
            F.col("start_s") - F.col("__ol") <= gap_s
        )
        first = F.col("__rn") == 1
        sess = sess.select(
            user_col,
            F.when(first & merged, F.col("__os"))
            .otherwise(F.col("start_s"))
            .alias("start_s"),
            "last_s",
            F.when(first & merged, F.col("n") + F.col("__on"))
            .otherwise(F.col("n"))
            .alias("n"),
            F.when(first & merged, F.col("val") + F.col("__ov"))
            .otherwise(F.col("val"))
            .alias("val"),
            "__rn",
            "__cnt",
            "__os",
            "__ol",
            "__on",
            "__ov",
        )
        # The open state closes when its user has batch rows that do
        # NOT merge with it.
        closed = sess.where(
            first & F.col("__os").isNotNull() & ~merged
        ).select(
            user_col,
            F.col("__os").alias("start_s"),
            F.col("__on").alias("n"),
            F.col("__ov").alias("val"),
        )
        carried = state.join(
            sess.select(user_col).distinct(), user_col, "left_anti"
        )
    batch_closed = sess.where(F.col("__rn") < F.col("__cnt")).select(
        user_col, "start_s", "n", "val"
    )
    closed = batch_closed if closed is None else closed.unionByName(batch_closed)
    new_open = sess.where(F.col("__rn") == F.col("__cnt")).select(
        user_col,
        F.col("start_s").alias("o_start"),
        F.col("last_s").alias("o_last"),
        F.col("n").alias("o_n"),
        F.col("val").alias("o_val"),
    )
    state = new_open if carried is None else new_open.unionByName(carried)
    return closed.localCheckpoint(eager=True), state.localCheckpoint(eager=True)


def session_finalize(
    closed: DataFrame, state: DataFrame, user_col: str = "user_id"
) -> DataFrame:
    """Flush remaining open sessions and format the session report
    (user, session_start, n, total_value) — the schema of the batch
    session_windows query."""
    final = closed.unionByName(
        state.select(
            user_col,
            F.col("o_start").alias("start_s"),
            F.col("o_n").alias("n"),
            F.col("o_val").alias("val"),
        )
    )
    return final.select(
        user_col,
        F.floor("start_s").cast("long").alias("session_start"),
        F.col("n").cast("long").alias("n"),
        F.round("val", 4).alias("total_value"),
    )


def late_monitor_batch(
    batch: DataFrame,
    state_path: str,
    tolerance_s: float = 300.0,
    user_col: str = "user_id",
) -> DataFrame:
    """One micro-batch of the per-user lateness monitor: judge each
    event against the carried per-user high-watermark (events more
    than ``tolerance_s`` behind it are late), then merge the
    (n_events, n_late, high_wm) state additively (sum/sum/max) via
    merge_rollup. Additive state ⇒ streaming ≡ batch regardless of
    how the stream is chopped. Returns the merged state."""
    spark = batch.sparkSession
    try:
        prev = spark.read.parquet(state_path).select(
            user_col, F.col("high_wm").alias("__prev_wm")
        )
        batch = batch.join(prev, user_col, "left")
    except Exception:
        batch = batch.withColumn("__prev_wm", F.lit(None).cast("double"))
    scored = lateness_flags(batch, tolerance_s=tolerance_s, prev_wm_col="__prev_wm")
    partial = scored.groupBy(user_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("late").cast("long").alias("n_late"),
        F.max(F.greatest("__t", "__wm")).alias("high_wm"),
    )
    return merge_rollup(
        partial,
        state_path,
        [user_col],
        {"n_events": "sum", "n_late": "sum", "high_wm": "max"},
    )


def late_monitor_report(state: DataFrame, user_col: str = "user_id") -> DataFrame:
    """Format the lateness state as the late-rate report (the schema
    of the batch late_event_rate query)."""
    return state.select(
        user_col,
        F.col("n_events").cast("long").alias("n_events"),
        F.col("n_late").cast("long").alias("n_late"),
        F.round(F.col("n_late") / F.col("n_events"), 6).alias("late_rate"),
    )
