"""Text dedup at 1M-document scale: does the LSH/winnowing pair-join
story hold two orders of magnitude above the sf0.1 gate corpus?

The corpus is generated INSIDE Spark as pure column expressions
(xxhash64-seeded tokens — no Python in the data path, no driver-side
materialization), so generation itself demonstrates the 100 TB shape:

* ``n_base`` organic documents, 50-200 tokens from a 30k-word vocab
  with a power-law skew (u³ density — frequent head words, long tail);
* ``n_dup`` planted near-duplicates: doc ``n_base + j`` mutates doc
  ``j`` token-wise at ``MUT_PCT`` % (deterministic per-(id, pos)
  hash), the ground-truth pair set.

Legs recorded (to /tmp/anndb_bench_cache/dedup1m_meta.json, reported
by bench.py under ``extra.dedup1m``):

* minhash signatures materialization (docs/s — the per-row sketch cost)
* MinHash-LSH near-dup pairs end-to-end (band join + exact-jaccard
  verify) + recall vs the planted pairs whose TRUE 3-gram jaccard
  clears the threshold (mutation is random, so a tail of planted pairs
  legitimately falls below 0.5 — they are excluded from the
  denominator, same protocol as the sf0.001 pytest oracle)
* winnowing pairs end-to-end (k=4, w=4 sketch + df-capped index join)
  + planted-pair recall at min_shared=2
* exact-duplicate groupBy on the same corpus (the cheap first pass)

Usage: python tools/bench_dedup1m.py [N_BASE] [--dups FRAC] [--mut PCT]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

CACHE_ROOT = "/tmp/anndb_bench_cache"
META_PATH = os.path.join(CACHE_ROOT, "dedup1m_meta.json")
VOCAB = 30_000
MIN_TOKENS, TOKEN_SPAN = 50, 150
SEED = "dedup1m-r10"


def _word(h: F.Column) -> F.Column:
    """Power-law word id from a 64-bit hash: u in [0,1) -> floor(V·u³)
    concentrates mass on small ids (head words)."""
    u = (F.pmod(h, F.lit(1_000_003)).cast("double")) / 1_000_003.0
    wid = F.floor(F.lit(float(VOCAB)) * u * u * u).cast("long")
    return F.concat(F.lit("w"), wid.cast("string"))


def _base_token(doc: F.Column, i: F.Column) -> F.Column:
    return _word(F.xxhash64(F.lit(SEED), F.lit("tok"), doc, i))


def synth_corpus(spark: SparkSession, n_base: int, n_dup: int,
                 mut_pct: int) -> DataFrame:
    """(doc_id, text): ids < n_base organic; id = n_base + j mutates
    doc j at mut_pct % of positions.  Everything is a deterministic
    function of (id, pos) — fully distributed, zero Python."""
    docs = spark.range(n_base + n_dup).withColumnRenamed("id", "doc_id")
    is_dup = F.col("doc_id") >= n_base
    src = F.when(is_dup, F.col("doc_id") - n_base).otherwise(F.col("doc_id"))
    n_tok = MIN_TOKENS + F.pmod(
        F.xxhash64(F.lit(SEED), F.lit("len"), src), F.lit(TOKEN_SPAN)
    )
    src_c, dup_c = src, is_dup  # captured by the lambda
    doc_c = F.col("doc_id")
    tok = lambda i: F.when(  # noqa: E731
        dup_c
        & (
            F.pmod(F.xxhash64(F.lit(SEED), F.lit("mut"), doc_c, i), F.lit(100))
            < mut_pct
        ),
        _word(F.xxhash64(F.lit(SEED), F.lit("fresh"), doc_c, i)),
    ).otherwise(_base_token(src_c, i))
    text = F.array_join(F.transform(F.sequence(F.lit(1), n_tok), tok), " ")
    return docs.select("doc_id", text.alias("text"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("n_base", nargs="?", type=int, default=900_000)
    ap.add_argument("--dups", type=float, default=0.1111,
                    help="planted dup fraction of n_base")
    ap.add_argument("--mut", type=int, default=8,
                    help="per-token mutation percent for planted dups")
    ap.add_argument("--threshold", type=float, default=0.5)
    ap.add_argument(
        "--legs",
        default="sig,lsh,lsh16x8,winnow,exact",
        help="comma list of legs to run (10M runs skip the 2x-cost "
        "16x8 leg: --legs sig,lsh,winnow,exact)",
    )
    ap.add_argument(
        "--meta-out",
        default=META_PATH,
        help="where to write the meta json (10M runs should NOT "
        "overwrite the 1M record bench.py reports)",
    )
    args = ap.parse_args()
    legs = set(args.legs.split(","))
    n_base = args.n_base
    n_dup = int(n_base * args.dups)

    from anndb_spark.operators.dedup import (
        dedup_exact,
        jaccard_col,
        minhash_lsh_pairs,
        minhash_signatures_fast,
        shingles_from_tokens_col,
        winnow_pairs,
    )
    from anndb_spark.session import get_spark

    os.makedirs(CACHE_ROOT, exist_ok=True)
    spark = get_spark("bench-dedup1m")
    spark.sparkContext.setLogLevel("ERROR")

    meta: dict = {
        "dedup1m_n_docs": n_base + n_dup,
        "dedup1m_n_planted": n_dup,
        "dedup1m_mut_pct": args.mut,
    }
    corpus = synth_corpus(spark, n_base, n_dup, args.mut)
    corpus = corpus.repartition(64).persist()
    t0 = time.time()
    n = corpus.count()
    meta["dedup1m_gen_s"] = round(time.time() - t0, 1)
    print("gen", meta["dedup1m_gen_s"], "s", flush=True)
    assert n == n_base + n_dup

    # ground truth: true 3-gram jaccard of every planted pair (1-1
    # id join — linear); pairs clearing the threshold are the recall
    # denominator
    sh = corpus.select(
        "doc_id", F.split("text", " ").alias("_toks")
    ).select(
        "doc_id", shingles_from_tokens_col(F.col("_toks"), n=3).alias("s")
    )
    a = sh.filter(F.col("doc_id") < n_base).withColumnRenamed("s", "sa")
    b = sh.filter(F.col("doc_id") >= n_base).select(
        (F.col("doc_id") - n_base).alias("doc_id"),
        F.col("doc_id").alias("dup_id"),
        F.col("s").alias("sb"),
    )
    truth = (
        a.join(b, "doc_id")
        .select(
            "doc_id",
            "dup_id",
            jaccard_col(F.col("sa"), F.col("sb")).alias("j"),
        )
        .filter(F.col("j") >= args.threshold)
        .select(
            F.col("doc_id").alias("a"), F.col("dup_id").alias("b"), "j"
        )
        .persist()
    )
    n_truth = truth.count()
    meta["dedup1m_truth_pairs"] = n_truth
    print("truth", n_truth, flush=True)

    # leg 1: per-row sketch cost
    if "sig" in legs:
        t0 = time.time()
        minhash_signatures_fast(corpus).agg(
            F.max(F.element_at("sig", 1))
        ).collect()
        dt = time.time() - t0
        meta["dedup1m_sig_s"] = round(dt, 1)
        meta["dedup1m_sig_docs_per_s"] = round(n / dt)
        print("sig", round(dt,1), "s", flush=True)

    # leg 2: MinHash-LSH end to end (band join + exact-jaccard verify)
    if "lsh" in legs:
        t0 = time.time()
        lsh = minhash_lsh_pairs(corpus, threshold=args.threshold).persist()
        n_lsh = lsh.count()
        dt = time.time() - t0
        meta["dedup1m_lsh_s"] = round(dt, 1)
        meta["dedup1m_lsh_docs_per_s"] = round(n / dt)
        meta["dedup1m_lsh_pairs"] = n_lsh
        found = truth.join(
            lsh.withColumnRenamed("id_a", "a").withColumnRenamed("id_b", "b"),
            ["a", "b"],
        ).count()
        meta["dedup1m_lsh_recall"] = round(found / max(n_truth, 1), 4)
        print("lsh", meta["dedup1m_lsh_s"], "s recall", meta["dedup1m_lsh_recall"], flush=True)

    # leg 2b: the recall knob priced in PLANS r10 finding 1 — 16
    # hashes × 8 bands (still 2 rows/band) predicts E[1-(1-j²)⁸] over
    # the truth pairs' jaccard distribution at ~2× signature cost.
    # Predicted recall is computed HERE from the actual 1M truth js
    # (not the 100k twin), so predicted-vs-measured is apples-apples.
    for nh, nb in ([(16, 8)] if "lsh16x8" in legs else []):
        r_rows = nh // nb
        pred = truth.agg(
            F.avg(
                F.lit(1.0)
                - F.pow(F.lit(1.0) - F.pow(F.col("j"), F.lit(float(r_rows))),
                        F.lit(float(nb)))
            )
        ).collect()[0][0]
        t0 = time.time()
        lsh2 = minhash_lsh_pairs(
            corpus, num_hashes=nh, bands=nb, threshold=args.threshold
        ).persist()
        n_lsh2 = lsh2.count()
        dt = time.time() - t0
        tag = f"dedup1m_lsh{nh}x{nb}"
        meta[f"{tag}_s"] = round(dt, 1)
        meta[f"{tag}_docs_per_s"] = round(n / dt)
        meta[f"{tag}_pairs"] = n_lsh2
        found2 = truth.join(
            lsh2.withColumnRenamed("id_a", "a").withColumnRenamed(
                "id_b", "b"
            ),
            ["a", "b"],
        ).count()
        meta[f"{tag}_recall"] = round(found2 / max(n_truth, 1), 4)
        meta[f"{tag}_recall_predicted"] = round(pred, 4)
        lsh2.unpersist()
        print(
            f"lsh{nh}x{nb}", meta[f"{tag}_s"], "s recall",
            meta[f"{tag}_recall"], "predicted",
            meta[f"{tag}_recall_predicted"], flush=True,
        )

    # leg 3: winnowing end to end
    if "winnow" in legs:
        t0 = time.time()
        wp = winnow_pairs(corpus, k=4, w=4, min_shared=2, max_df=64).persist()
        n_wp = wp.count()
        dt = time.time() - t0
        meta["dedup1m_winnow_s"] = round(dt, 1)
        meta["dedup1m_winnow_docs_per_s"] = round(n / dt)
        meta["dedup1m_winnow_pairs"] = n_wp
        foundw = truth.join(wp, ["a", "b"]).count()
        meta["dedup1m_winnow_recall"] = round(foundw / max(n_truth, 1), 4)
        print("winnow", meta["dedup1m_winnow_s"], "s recall", meta["dedup1m_winnow_recall"], flush=True)

    # leg 4: exact dedup (hash groupBy) on the same corpus
    if "exact" in legs:
        t0 = time.time()
        dedup_exact(corpus).filter(F.col("id") != F.col("keeper_id")).count()
        meta["dedup1m_exact_s"] = round(time.time() - t0, 1)

    with open(args.meta_out, "w") as f:
        json.dump(meta, f, indent=1)
    print(json.dumps(meta))


if __name__ == "__main__":
    main()
