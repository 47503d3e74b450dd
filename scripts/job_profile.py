"""Per-driver-job profile of one registered query (guide §1: measure
first). Runs the query with the bench's exact methodology (noop sink,
full clears, min-of-N) and then dumps, for EVERY driver job of the
final timed run, its wall, stage names and shuffle/task stats from the
Spark UI REST API — the breakdown the aggregate bench wall hides.

Usage: python scripts/job_profile.py <query_name> [sf_dir] [n_runs]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def _rest(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    n_runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from seqdatapipeline_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="job_profile", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl

    import __spark_entry__ as entrymod
    from bench import _drop_persisted

    fn = entrymod.queries()[name]

    # warm: codegen + footer cache
    for t in ["lineitem", "part", "orders", "documents", "embeddings"]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            spark.read.parquet(p).count()

    walls = []
    for i in range(n_runs):
        _drop_persisted(spark)
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        walls.append(time.perf_counter() - t0)
    # final instrumented run
    _drop_persisted(spark)
    tracker = spark.sparkContext.statusTracker()
    j0 = max(tracker.getJobIdsForGroup(None) or [-1])
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    walls.append(wall)

    app_id = spark.sparkContext.applicationId
    jobs = _rest(f"{ui}/api/v1/applications/{app_id}/jobs")
    stages = {
        s["stageId"]: s
        for s in _rest(f"{ui}/api/v1/applications/{app_id}/stages")
    }
    rows = []
    for j in jobs:
        if j["jobId"] <= j0:
            continue
        snames = []
        for sid in sorted(j.get("stageIds", [])):
            s = stages.get(sid)
            if s:
                snames.append(
                    f"{s['name'].split(' at ')[0]}"
                    f"[{s.get('numTasks')}t"
                    f",sh={s.get('shuffleWriteBytes',0)//1024}K]"
                )
        sub = j.get("submissionTime", "")
        comp = j.get("completionTime", "")
        dur = None
        try:
            from datetime import datetime

            f = "%Y-%m-%dT%H:%M:%S.%f%Z"
            dur = (
                datetime.strptime(comp, f) - datetime.strptime(sub, f)
            ).total_seconds()
        except Exception:
            pass
        rows.append(
            {
                "job": j["jobId"],
                "sec": round(dur, 3) if dur is not None else None,
                "tasks": j.get("numTasks"),
                "desc": " | ".join(snames)[:200]
                or (j.get("description") or j.get("name") or "")[:140],
            }
        )
    rows.sort(key=lambda r: r["job"])
    print(f"\n=== {name}: walls={[round(w,3) for w in walls]} "
          f"min={min(walls):.3f} n_driver_jobs(final run)={len(rows)} ===")
    tot = 0.0
    for r in rows:
        tot += r["sec"] or 0.0
        print(f"  job {r['job']:>5}  {r['sec'] if r['sec'] is not None else '?':>7}s  "
              f"tasks={r['tasks']:>4}  {r['desc']}")
    print(f"  sum(job secs)={tot:.3f}  (wall {wall:.3f}; gap = driver/planning/λ)")
    spark.stop()


if __name__ == "__main__":
    main()
