#!/usr/bin/env python
"""Benchmark harness — the driver runs this per round.

Runs the headline operators at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": seconds, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Phases:
  index_build      full inverted-index build over the documents table
                   (extract/analyze -> doc-sharded varbyte blocks)
  wand_bm25_x3     3 conjunctive BM25 queries through the block-max WAND
                   kernel (cold index read each time)
  bm25_dataframe   the exhaustive DataFrame BM25 path (1 query)
  term_stats_agg   df/ctf aggregation over the whole corpus
  minhash_dedup    4-hash MinHash signatures over char-8-gram shingles
  ann_cosine       brute-force cosine top-20 over embeddings
  tpch_q1          lineitem pricing summary (Catalyst-native agg)
  pagerank_2iter   2 Jacobi iterations over the synthetic doc graph

Drift-proofing (round-2 lesson: r02 regressed 31% on UNCHANGED code and
only external probes could prove it was the host): every phase runs
BEST-OF-N (default 3, env BENCH_REPS) inside one process, and a fixed
single-thread CPU + memcpy probe runs before and after the suite — the
probe fields make BENCH_r{N}.json comparable across rounds on a host
whose effective CPU drifts (nonzero steal time).

The N-vs-4N scaling run (BASELINE.md protocol) lives in
bench/scaling.py — it needs two fresh JVMs so it cannot run inside one
bench.py process.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("BENCH_REPS", "3"))


def host_probe() -> dict:
    """Fixed-work single-thread probes: ALU (md5 chain) and memcpy
    (40 MB >> LLC buffer copy).  Same work every round — the ratio of
    probe values BETWEEN rounds is the host-drift correction factor."""
    import numpy as np

    h = b"x"
    t0 = time.perf_counter()
    for _ in range(200_000):
        h = hashlib.md5(h).digest()
    alu_ms = (time.perf_counter() - t0) * 1000
    a = np.ones(40_000_000 // 8)
    b = np.empty_like(a)
    b[:] = a  # touch pages before timing
    t0 = time.perf_counter()
    for _ in range(20):
        b[:] = a
    memcpy_gbps = 20 * a.nbytes / (time.perf_counter() - t0) / 1e9
    return {"alu_ms": round(alu_ms, 1), "memcpy_gbps": round(memcpy_gbps, 2)}


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as entry_mod
    from websearchengine_spark.operators.build import build_index
    from websearchengine_spark.operators.query import run_query
    from websearchengine_spark.operators.topk import wand_topk, wand_topk_batch
    from websearchengine_spark.session import get_spark

    spark = get_spark("wse-bench")
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    probe_start = host_probe()
    timings: dict[str, float] = {}
    all_runs: dict[str, list[float]] = {}

    def bench(name: str, fn, reps: int = REPS) -> None:
        runs = []
        for _ in range(reps):
            t0 = time.time()
            fn()
            runs.append(round(time.time() - t0, 3))
        all_runs[name] = runs
        timings[name] = min(runs)

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.count()
    # url+text only: with no html column the whitespace analyzer takes
    # the JVM-native fast path (codegen split, no Python/Arrow pass)
    pages = docs.select(
        F.concat(F.lit("doc"), F.lpad(F.col("doc_id").cast("string"), 9, "0")).alias("url"),
        "text",
    )

    roots: list[str] = []

    def do_build():
        root = tempfile.mkdtemp(prefix="wse_bench_idx_")
        build_index(
            spark, pages, root, n_shards=32, n_groups=2,
            analyzer="whitespace", keep_doc_terms=False,
        )
        roots.append(root)

    bench("index_build", do_build)
    root = roots[-1]

    bench("wand_bm25_x3", lambda: [
        wand_topk(spark, root, q, k=10).collect()
        for q in ["data stream join", "hash merge", "customer query batch"]
    ])

    batch_queries = [
        f"{a} {b}"
        for a in ["data", "hash", "merge", "scan", "row", "join", "batch", "query"]
        for b in ["stream", "window", "table", "column", "filter"]
    ]  # 40 conjunctive queries
    bench("wand_batch_x40", lambda: wand_topk_batch(spark, root, batch_queries, k=10).collect())

    bench("bm25_dataframe", lambda: run_query(spark, root, "data stream join", ranker="bm25", k=10).collect())
    bench("term_stats_agg", lambda: entry_mod.q_term_df(spark, SF_DIR).collect())
    bench("minhash_dedup", lambda: entry_mod.q_minhash_signatures(spark, SF_DIR).collect())
    bench("ann_cosine", lambda: entry_mod.q_ann_cosine(spark, SF_DIR).collect())
    bench("tpch_q1", lambda: entry_mod.q_tpch_q1(spark, SF_DIR).collect())
    bench("pagerank_2iter", lambda: entry_mod.q_pagerank(spark, SF_DIR).collect())

    probe_end = host_probe()
    total = round(sum(timings.values()), 3)
    build_docs_per_sec = round(n_docs / timings["index_build"], 2)
    print(
        json.dumps(
            {
                "metric": "engine_suite_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "n_docs": n_docs,
                "index_build_docs_per_sec": build_docs_per_sec,
                "batch_queries_per_sec": round(40 / timings["wand_batch_x40"], 2),
                # headline semantics marker: since round 3 the per-phase
                # walls are min-of-reps (run 1 carries JIT/codegen warmup);
                # compare against r1/r2 single-shot records via
                # queries_first_run, not the headline fields.
                "selection": "min_of_reps",
                "reps": REPS,
                "queries_first_run": {k: v[0] for k, v in all_runs.items()},
                "queries_all_runs": all_runs,
                "host_probe": {"start": probe_start, "end": probe_end},
            }
        )
    )


if __name__ == "__main__":
    main()
