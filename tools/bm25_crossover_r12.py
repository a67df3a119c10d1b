"""BM25 indexed-vs-scan crossover at 1M documents (VERDICT r11 task 3).

BOTH committed r11 records show the inverted-index query side LOSING
to the scan form at sf0.1 (driver 1.547 vs 0.988 s): at 60k docs the
scan form's checkpointed tf is cheap while the indexed form pays fixed
per-query overheads (a stats collect + a |Q|-row bucket-id job + a
64-partition-dir listing).  The index's claim is asymptotic — in
corpus size (the scan re-tokenizes every document per query; the index
reads |Q| pruned buckets) and in probe count (the r12
`bm25_search_indexed_batch` amortizes the fixed overheads across N
probes).  This tool measures both axes on the same deterministic
1M-document corpus as the dedup scale runs (tools/bench_dedup1m.py
`synth_corpus` — xxhash64-seeded, zero Python in the data path):

* ``scan_s``            — `bm25_search` median-of-3 on the parquet
                          corpus (4 head-ish terms, k=20);
* ``indexed_s``         — `bm25_search_indexed` median-of-3 on a
                          64-bucket index written once (write cost
                          reported separately — write-once/query-many);
* ``seq10_s``           — 10 distinct probes, one
                          `bm25_search_indexed` call each (the 2·N
                          round-trips shape);
* ``batch10_s``         — the same 10 probes in ONE
                          `bm25_search_indexed_batch` call;
* ``batch100_s``        — 100 probes in one batch call (amortization
                          scaling).

Host-probe brackets before/after make the record self-calibrating.
Writes /tmp/anndb_bench_cache/bm25xover_meta.json and prints one JSON
line for committal.

Usage: python tools/bm25_crossover_r12.py [N_BASE]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.bench_dedup1m import synth_corpus  # noqa: E402
from tools.host_probe import probe  # noqa: E402

META_PATH = "/tmp/anndb_bench_cache/bm25xover_meta.json"

# head-of-power-law word ids (bench_dedup1m vocab: "w<id>", u^3 skew
# concentrates mass on small ids) — common terms, the EXPENSIVE case
# for an inverted index (long postings lists), so the measured win is
# the conservative one
TERMS = ["w3", "w17", "w101", "w999"]


def _probes(n: int) -> list[tuple[str, list[str]]]:
    """n deterministic 3-term probes over head/torso word ids."""
    rng = np.random.default_rng(1212)
    return [
        (f"p{i}", [f"w{int(w)}" for w in rng.integers(1, 2000, 3)])
        for i in range(n)
    ]


def _median3(fn) -> tuple[float, list[float]]:
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        times.append(round(time.perf_counter() - t0, 3))
    return round(float(np.median(times)), 3), times


def main() -> None:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    out: dict = {"n_docs": n_base, "terms": TERMS}
    out["probe_pre"] = probe()

    from anndb_spark.operators.text import (
        bm25_search,
        bm25_search_indexed,
        bm25_search_indexed_batch,
        write_bm25_index,
    )
    from anndb_spark.session import get_spark

    spark = get_spark("bm25-xover")
    spark.sparkContext.setLogLevel("ERROR")
    scratch = tempfile.mkdtemp(prefix="anndb_bm25xover_")

    corpus_path = os.path.join(scratch, "corpus")
    t0 = time.time()
    synth_corpus(spark, n_base, 0, 0).repartition(64).write.parquet(
        corpus_path
    )
    out["gen_s"] = round(time.time() - t0, 1)
    corpus = spark.read.parquet(corpus_path)

    idx_dir = os.path.join(scratch, "bm25idx")
    t0 = time.time()
    write_bm25_index(corpus, idx_dir, buckets=64)
    out["index_write_s"] = round(time.time() - t0, 1)

    # warm both paths once (JVM/codegen/footers), then time
    bm25_search(corpus, TERMS, k=20).collect()
    bm25_search_indexed(spark, idx_dir, TERMS, k=20).collect()

    out["scan_s"], out["scan_times"] = _median3(
        lambda: bm25_search(corpus, TERMS, k=20).collect()
    )
    out["indexed_s"], out["indexed_times"] = _median3(
        lambda: bm25_search_indexed(spark, idx_dir, TERMS, k=20).collect()
    )
    out["probe_mid"] = probe()

    p10 = _probes(10)

    def seq10():
        for pid, terms in p10:
            bm25_search_indexed(spark, idx_dir, terms, k=20).collect()

    out["seq10_s"], out["seq10_times"] = _median3(seq10)
    out["batch10_s"], out["batch10_times"] = _median3(
        lambda: bm25_search_indexed_batch(spark, idx_dir, p10, k=20).collect()
    )
    p100 = _probes(100)
    out["batch100_s"], out["batch100_times"] = _median3(
        lambda: bm25_search_indexed_batch(
            spark, idx_dir, p100, k=20
        ).collect()
    )
    out["probe_post"] = probe()

    os.makedirs(os.path.dirname(META_PATH), exist_ok=True)
    with open(META_PATH, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()

    import shutil

    shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
