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

The N-vs-4N scaling run (BASELINE.md protocol) lives in
bench/scaling.py — it needs two fresh JVMs so it cannot run inside one
bench.py process.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as entry_mod
    from websearchengine_spark.operators.build import build_index
    from websearchengine_spark.operators.query import run_query
    from websearchengine_spark.operators.topk import wand_topk
    from websearchengine_spark.session import get_spark

    spark = get_spark("wse-bench")
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    timings: dict[str, float] = {}

    def timed(name):
        class _T:
            def __enter__(self):
                self.t0 = time.time()
                return self

            def __exit__(self, *a):
                timings[name] = round(time.time() - self.t0, 3)

        return _T()

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.count()
    pages = docs.select(
        F.concat(F.lit("doc"), F.lpad(F.col("doc_id").cast("string"), 9, "0")).alias("url"),
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        "text",
        "lang",
    )
    root = tempfile.mkdtemp(prefix="wse_bench_idx_")

    with timed("index_build"):
        build_index(
            spark, pages, root, n_shards=32, n_groups=2,
            analyzer="whitespace", keep_doc_terms=False,
        )

    with timed("wand_bm25_x3"):
        for q in ["data stream join", "hash merge", "customer query batch"]:
            wand_topk(spark, root, q, k=10).collect()

    from websearchengine_spark.operators.topk import wand_topk_batch

    batch_queries = [
        f"{a} {b}"
        for a in ["data", "hash", "merge", "scan", "row", "join", "batch", "query"]
        for b in ["stream", "window", "table", "column", "filter"]
    ]  # 40 conjunctive queries
    with timed("wand_batch_x40"):
        wand_topk_batch(spark, root, batch_queries, k=10).collect()

    with timed("bm25_dataframe"):
        run_query(spark, root, "data stream join", ranker="bm25", k=10).collect()

    with timed("term_stats_agg"):
        entry_mod.q_term_df(spark, SF_DIR).collect()

    with timed("minhash_dedup"):
        entry_mod.q_minhash_signatures(spark, SF_DIR).collect()

    with timed("ann_cosine"):
        entry_mod.q_ann_cosine(spark, SF_DIR).collect()

    with timed("tpch_q1"):
        entry_mod.q_tpch_q1(spark, SF_DIR).collect()

    with timed("pagerank_2iter"):
        entry_mod.q_pagerank(spark, SF_DIR).collect()

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
            }
        )
    )


if __name__ == "__main__":
    main()
