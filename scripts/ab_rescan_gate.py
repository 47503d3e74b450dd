"""Above-gate A/B for the size-adaptive rescan persists (VERDICT r12
item 2): run gate-dependent queries on a replicated fixture with the
gate FORCED ON (rescanPersistBytes=1) vs FORCED OFF (=1 EB), same
session, alternating min-of-N with full clears — the committed
evidence that the persist (or plan-form switch) WINS when the
re-scanned input is large, not just that it is neutral when small.

Usage:
  SPARK_GRAFT_SCALE_COPIES=100 SPARK_GRAFT_SCALE_TABLES=documents \
    python scripts/ab_rescan_gate.py quality_percentile_by_source dsir_importance_weights

The fixture is scalecheck's (built once under /tmp, reused). Job
counts are reported per arm: the ON arm should show the persist's
cache stages; a wall win must come WITH the documented plan change.
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

N_RUNS = int(os.environ.get("SPARK_GRAFT_AB_RUNS", "3"))
OFF_BYTES = str(10**18)


def main() -> None:
    names = sys.argv[1:]
    from scripts.scalecheck import SCALED, build_scaled  # noqa: E402

    from seqdatapipeline_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="ab_rescan_gate", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    build_scaled(spark)

    import __spark_entry__ as entrymod
    from bench import _cpu_steal_total, _drop_persisted

    queries = entrymod.queries()
    tracker = spark.sparkContext.statusTracker()

    def run(name: str, gate_bytes: str) -> tuple[float, int, float]:
        spark.conf.set("spark.seqdatapipeline.rescanPersistBytes", gate_bytes)
        try:
            best, jobs, steal = None, -1, 0.0
            for _ in range(N_RUNS):
                _drop_persisted(spark)
                j0 = max(tracker.getJobIdsForGroup(None) or [-1])
                s0, t0j = _cpu_steal_total()
                t0 = time.perf_counter()
                df = queries[name](spark, SCALED)
                df.write.format("noop").mode("overwrite").save()
                w = time.perf_counter() - t0
                s1, t1j = _cpu_steal_total()
                if best is None or w < best:
                    best = w
                    jobs = max(tracker.getJobIdsForGroup(None) or [-1]) - j0
                    steal = 100.0 * (s1 - s0) / max(t1j - t0j, 1)
            return best, jobs, steal
        finally:
            spark.conf.unset("spark.seqdatapipeline.rescanPersistBytes")
            _drop_persisted(spark)

    copies = os.environ.get("SPARK_GRAFT_SCALE_COPIES", "10")
    print(f"\nfixture: {SCALED} (x{copies}), min-of-{N_RUNS}, alternating arms")
    print(f"{'query':34s} {'OFF s':>8} {'ON s':>8} {'speedup':>8} "
          f"{'jobs OFF':>8} {'jobs ON':>7} {'steal%':>12}")
    for name in names:
        # warmup both forms (codegen compile out of the timed arms)
        for gb in (OFF_BYTES, "1"):
            spark.conf.set("spark.seqdatapipeline.rescanPersistBytes", gb)
            queries[name](spark, SCALED).write.format("noop").mode("overwrite").save()
            spark.conf.unset("spark.seqdatapipeline.rescanPersistBytes")
            _drop_persisted(spark)
        off_w, off_j, off_s = run(name, OFF_BYTES)
        on_w, on_j, on_s = run(name, "1")
        # second alternation to defeat epoch drift
        off2_w, _, off2_s = run(name, OFF_BYTES)
        on2_w, _, on2_s = run(name, "1")
        off_best, on_best = min(off_w, off2_w), min(on_w, on2_w)
        print(f"{name:34s} {off_best:8.3f} {on_best:8.3f} "
              f"{off_best / on_best:8.2f} {off_j:8d} {on_j:7d} "
              f"{max(off_s, off2_s):5.1f}/{max(on_s, on2_s):5.1f}")
    spark.stop()


if __name__ == "__main__":
    main()
