"""Dump .explain("formatted") for declared queries into plans/<round>/
($SPARK_GRAFT_PLANS_ROUND, default r14).

Usage: python tools/dump_plans.py <suffix> [query ...]

Writes plans/<round>/<query>_<suffix>.txt for each named query (default: all
queries() entries).  The optimization judge reads these files to check
plan-shape claims (Exchange count, join strategy, PushedFilters,
BatchEvalPython nodes) against the code, so the dump is the plan of the
exact declared callable over the bench sf directory.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUND = os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r14")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", ROUND
)


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]

    from anndb_spark.session import get_spark

    spark = get_spark("plan-dump", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    qs = entry.queries()
    if not names:
        names = sorted(qs)
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in names:
        fn = qs[name]
        try:
            df = fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 — record the failure in the file
            plan = f"ERROR building plan: {exc!r}"
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"[plan] {name} -> {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
