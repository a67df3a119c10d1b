"""SparkSession factory with scale-minded defaults.

Local testing runs on local[N]; the configs below are chosen so the same
plans survive a 1000-executor cluster: AQE on (runtime coalescing +
skew-join splitting), adaptive shuffle partitions, Arrow for every
pandas-UDF exchange, and a shuffle-partition count that AQE can shrink.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "anndb-spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4)))
    # one BLAS thread per python worker: each worker owns ONE task core;
    # unbounded OpenBLAS/OMP pools (32 workers × 32 threads) thrash the
    # scheduler the moment any kernel hits a BLAS matmul.  Set in the
    # driver env (local-mode workers inherit it) AND as executorEnv (for
    # real clusters).
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # Pin the session (and JVM) timezone: NTZ<->LTZ casts in the
        # temporal operators must not depend on the host zone.  Without
        # this, range_join's delta_us and hourly-window oracle parity are
        # host-timezone-dependent (wrong across DST transitions on
        # non-UTC hosts).
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.extraJavaOptions", "-Duser.timezone=UTC")
        .config("spark.executor.extraJavaOptions", "-Duser.timezone=UTC")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # vectors are wide rows; keep scan splits moderate so a partition's
        # graph/vector block fits executor memory at large SF
        .config("spark.sql.files.maxPartitionBytes", "128m")
        # split small file scans to at least core count: per-row compute
        # (md5 HOFs, GEMM batches) needs parallelism even when bytes are
        # tiny; at 100 TB the scan exceeds this anyway (no-op)
        .config("spark.sql.files.minPartitionNum", str(cpus))
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.executorEnv.OMP_NUM_THREADS", "1")
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS", "1")
        .config("spark.executorEnv.MKL_NUM_THREADS", "1")
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
