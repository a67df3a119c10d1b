"""Winnow at 10M documents, two-phase (VERDICT r11 task 4).

The combined 10M run (r11) died when the lsh leg's spill co-resided
with the winnow shuffle; the 5M single-leg retry proved per-session
scratch isolation works — but at 10M even ONE session is too small:
the truth-pair computation (a 1M-row id-join over full shingle sets,
with the corpus and shingles persisted) leaves tens of GB of shuffle
scratch resident when the winnow leg starts, and the box's ~75 GB
scratch volume fills mid-winnow (r12 attempt 1: SPILL_OUT_OF_MEMORY /
ENOSPC with truth already computed).  Shuffle files live until the JVM
exits, so the isolation unit must be the PROCESS:

  phase ``prep``   — synth the corpus INSIDE Spark (bench_dedup1m's
                     deterministic generator), write it to parquet,
                     compute the planted-pair ground truth, write it
                     to parquet (~1M tiny rows), exit (scratch freed);
  phase ``winnow`` — fresh JVM: read the corpus parquet, time
                     `winnow_pairs` end-to-end, join the truth parquet
                     for recall, write the meta record.

This is exactly what a cluster does by spreading scratch across
executors' local disks — documented as the one-box limit in PLANS r11;
the phase split is the one-box workaround, not a plan change.

Usage:
  python tools/winnow10m_r12.py prep   [N_BASE]
  python tools/winnow10m_r12.py winnow [N_BASE]
Artifacts under /tmp/anndb_bench_cache/winnow10m/{corpus,truth};
meta written to /tmp/anndb_bench_cache/dedup10m_winnow_meta.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tools.bench_dedup1m import synth_corpus  # noqa: E402
from tools.host_probe import probe  # noqa: E402

ROOT = "/tmp/anndb_bench_cache/winnow10m"
META = "/tmp/anndb_bench_cache/dedup10m_winnow_meta.json"
THRESHOLD = 0.5


def main() -> None:
    phase = sys.argv[1] if len(sys.argv) > 1 else "prep"
    n_base = int(sys.argv[2]) if len(sys.argv) > 2 else 9_000_000
    n_dup = int(n_base * 0.1111)

    from anndb_spark.session import get_spark

    spark = get_spark(f"winnow10m-{phase}")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(ROOT, exist_ok=True)

    if phase == "prep":
        from anndb_spark.operators.dedup import (
            jaccard_col,
            shingles_from_tokens_col,
        )

        t0 = time.time()
        synth_corpus(spark, n_base, n_dup, 8).repartition(64).write.mode(
            "overwrite"
        ).parquet(f"{ROOT}/corpus")
        gen_s = round(time.time() - t0, 1)
        print("gen+write", gen_s, flush=True)
        corpus = spark.read.parquet(f"{ROOT}/corpus")
        sh = corpus.select(
            "doc_id", F.split("text", " ").alias("_toks")
        ).select(
            "doc_id",
            shingles_from_tokens_col(F.col("_toks"), n=3).alias("s"),
        )
        a = sh.filter(F.col("doc_id") < n_base).withColumnRenamed("s", "sa")
        b = sh.filter(F.col("doc_id") >= n_base).select(
            (F.col("doc_id") - n_base).alias("doc_id"),
            F.col("doc_id").alias("dup_id"),
            F.col("s").alias("sb"),
        )
        t0 = time.time()
        (
            a.join(b, "doc_id")
            .select(
                "doc_id",
                "dup_id",
                jaccard_col(F.col("sa"), F.col("sb")).alias("j"),
            )
            .filter(F.col("j") >= THRESHOLD)
            .select(F.col("doc_id").alias("a"), F.col("dup_id").alias("b"))
            .write.mode("overwrite")
            .parquet(f"{ROOT}/truth")
        )
        truth_s = round(time.time() - t0, 1)
        n_truth = spark.read.parquet(f"{ROOT}/truth").count()
        with open(f"{ROOT}/prep_meta.json", "w") as f:
            json.dump(
                {"gen_s": gen_s, "truth_s": truth_s, "truth_pairs": n_truth},
                f,
            )
        print("truth", n_truth, truth_s, "s", flush=True)
    elif phase == "winnow":
        from anndb_spark.operators.dedup import winnow_pairs

        meta = {
            "winnow10m_n_docs": n_base + n_dup,
            "winnow10m_probe_pre": probe(),
        }
        meta.update(
            {
                f"winnow10m_{k}": v
                for k, v in json.load(open(f"{ROOT}/prep_meta.json")).items()
            }
        )
        corpus = spark.read.parquet(f"{ROOT}/corpus")
        truth = spark.read.parquet(f"{ROOT}/truth")
        t0 = time.time()
        wp = winnow_pairs(
            corpus, k=4, w=4, min_shared=2, max_df=64
        ).persist()
        n_wp = wp.count()
        dt = time.time() - t0
        n = n_base + n_dup
        meta["winnow10m_s"] = round(dt, 1)
        meta["winnow10m_docs_per_s"] = round(n / dt)
        meta["winnow10m_pairs"] = n_wp
        found = truth.join(wp, ["a", "b"]).count()
        n_truth = meta["winnow10m_truth_pairs"]
        meta["winnow10m_recall"] = round(found / max(n_truth, 1), 4)
        meta["winnow10m_probe_post"] = probe()
        with open(META, "w") as f:
            json.dump(meta, f, indent=1)
        print(json.dumps(meta), flush=True)
    else:
        raise SystemExit(f"unknown phase {phase!r}")
    spark.stop()


if __name__ == "__main__":
    main()
