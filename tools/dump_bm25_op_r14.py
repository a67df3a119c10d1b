import sys, os, tempfile
TREE = sys.argv[2] if len(sys.argv) > 2 else "/root/repo"
SUFFIX = sys.argv[1]
sys.path.insert(0, TREE)
OUT = "/root/repo/plans/r14"
SF = "/root/testdata/sf0.1"
from anndb_spark.session import get_spark
spark = get_spark("bm25-op-dump", cpus=32)
spark.sparkContext.setLogLevel("ERROR")
from anndb_spark.operators.text import write_bm25_index, bm25_search_indexed_batch
docs = spark.read.parquet(f"{SF}/documents.parquet")
scratch = tempfile.mkdtemp(prefix="bm25op_")
idx = os.path.join(scratch, "bm25idx")
write_bm25_index(docs, idx, buckets=64)
probes = [("p0", ["batch", "merge"]), ("p1", ["vector", "stream", "merge"]), ("p2", ["window"])]
df = bm25_search_indexed_batch(spark, idx, probes, k=20)
plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
open(os.path.join(OUT, f"op_bm25_search_indexed_batch_{SUFFIX}.txt"), "w").write(plan)
print("written", SUFFIX, len(plan))
spark.stop()
