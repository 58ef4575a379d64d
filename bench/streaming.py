#!/usr/bin/env python
"""Streaming-ingest micro-bench: what does incremental indexing cost
relative to one batch build?

Same corpus, three ways:
  batch_build        build_index over all N docs at once (the baseline)
  delta_builds       the SAME docs as B micro-batches through
                     apply_pages_batch (sum of per-batch build times —
                     the streaming path's ingest cost)
  live_query_x3      3 BM25 queries via search_live over the B live
                     segments (pre-compaction: the multi-segment tax)
  compact            compact_live folding B segments into one base
                     (ONE compressed-postings shuffle, no re-tokenize)
  base_query_x3      the same 3 queries post-compaction (should match
                     single-index latency)

Prints ONE JSON line like bench.py (host probe included).  The
interesting ratios: delta_builds/batch_build (per-batch overhead:
fixed per-job costs amortize worse over small batches — shrinks as
batch size grows), compact/batch_build (compaction moves compressed
blocks, so it should be WELL below a rebuild), live/base query tax.

Usage: python bench/streaming.py [--docs 60000] [--batches 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERIES = ["web search", "data mining", "google map"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=60000)
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--shards", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from bench import host_probe  # repo-root bench.py
    from websearchengine_spark.operators.build import build_index
    from websearchengine_spark.operators.topk import wand_topk
    from websearchengine_spark.session import get_spark
    from websearchengine_spark.sources.corpus import gen_pages_df
    from websearchengine_spark.streaming.ingest import (
        apply_pages_batch,
        compact_live,
        search_live,
    )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench-streaming", cores=cpus)
    work = tempfile.mkdtemp(prefix="wse_sbench_")
    corpus_path = os.path.join(work, "corpus")
    gen_pages_df(spark, args.docs, seed=42).write.mode("overwrite").parquet(
        corpus_path
    )
    pages = spark.read.parquet(corpus_path)

    phases: dict[str, float] = {}
    probe0 = host_probe()

    t0 = time.time()
    build_index(
        spark, pages, os.path.join(work, "batch_idx"),
        n_shards=args.shards, n_groups=2,
    )
    phases["batch_build"] = round(time.time() - t0, 3)

    live = os.path.join(work, "live")
    per_batch = []
    for i in range(args.batches):
        part = pages.filter(F.abs(F.hash("url")) % args.batches == i)
        t0 = time.time()
        apply_pages_batch(
            spark, part, i, live, n_shards=args.shards, n_groups=2,
        )
        per_batch.append(round(time.time() - t0, 3))
    phases["delta_builds"] = round(sum(per_batch), 3)

    t0 = time.time()
    for q in QUERIES:
        search_live(spark, live, q, k=10).collect()
    phases["live_query_x3"] = round(time.time() - t0, 3)

    t0 = time.time()
    compact_live(spark, live)
    phases["compact"] = round(time.time() - t0, 3)

    t0 = time.time()
    for q in QUERIES:
        search_live(spark, live, q, k=10).collect()
    phases["base_query_x3"] = round(time.time() - t0, 3)

    # sanity: the compacted base answers identically to the batch index
    got = [
        (r["url"], round(r["score"], 9))
        for r in search_live(spark, live, QUERIES[0], k=10).collect()
    ]
    want = [
        (r["url"], round(r["score"], 9))
        for r in wand_topk(
            spark, os.path.join(work, "batch_idx"), QUERIES[0], k=10
        ).collect()
    ]
    assert [s for _, s in got] == [s for _, s in want], "rank mismatch"

    print(
        json.dumps(
            {
                "metric": "streaming_ingest_bench",
                "value": phases["delta_builds"],
                "unit": "sec",
                "queries": phases,
                "n_docs": args.docs,
                "n_batches": args.batches,
                "per_batch_sec": per_batch,
                "delta_vs_batch": round(
                    phases["delta_builds"] / max(phases["batch_build"], 1e-9), 3
                ),
                "compact_vs_batch": round(
                    phases["compact"] / max(phases["batch_build"], 1e-9), 3
                ),
                "host_probe": {"start": probe0, "end": host_probe()},
            }
        )
    )


if __name__ == "__main__":
    main()
