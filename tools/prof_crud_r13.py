"""Isolate the crud_compaction bench leg (guide §1): time the
split_state(apply_changes_sql(...)).count() action and dump the
formatted + executed plan.

Usage: python tools/prof_crud_r13.py [sf_dir] [repeats]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

os.environ.setdefault("SPARK_GRAFT_SF_DIR", sf_dir)

import __spark_entry__ as entry
from anndb_spark.operators.crud import apply_changes_sql, split_state
from anndb_spark.session import get_spark

spark = get_spark("prof-crud", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
spark.sparkContext.setJobDescription("prof_crud_r13")

df = split_state(apply_changes_sql(None, entry._crud_changelog(spark, sf_dir)))
print(df._jdf.queryExecution().explainString(
    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))

times = []
for i in range(reps):
    t0 = time.perf_counter()
    n = df.count()
    dt = time.perf_counter() - t0
    times.append(dt)
    print(f"run {i}: {dt:.3f}s rows={n}", flush=True)
times.sort()
print(f"median: {times[len(times) // 2]:.3f}s")
