import sys
sys.path.insert(0, "/root/repo")
from seqdatapipeline_spark.session import get_spark
import __spark_entry__ as e
spark = get_spark(app_name="audit"); spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.01"
flags = []
for name, fn in sorted(e.queries().items()):
    try:
        df = fn(spark, sf)
        plan = df._jdf.queryExecution().executedPlan().toString()
    except Exception as ex:
        flags.append((name, f"ERROR building plan: {ex}"))
        continue
    notes = []
    bnlj = plan.count("BroadcastNestedLoopJoin")
    cart = plan.count("CartesianProduct")
    scans = plan.count("Scan parquet")
    reused = plan.count("ReusedExchange")
    if bnlj: notes.append(f"BNLJ x{bnlj}")
    if cart: notes.append(f"CARTESIAN x{cart}")
    if scans > 2 and not reused: notes.append(f"scans={scans}")
    if scans == 2 and not reused and "join" not in name and "pe_mate" not in name:
        notes.append("double-scan?")
    if notes:
        flags.append((name, ", ".join(notes)))
for n, f in flags:
    print(f"{n}: {f}")
print(f"\n{len(flags)} flagged of {len(e.queries())}")
spark.stop()
