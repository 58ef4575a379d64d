#!/usr/bin/env python
"""Count Spark jobs per bench phase (job-group bookkeeping) — round-6
measurement aid.  Per-job fixed overhead is ~50-150 ms in local mode, so
job count is the first-order cost model at bench SF."""
from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as entry_mod
    from websearchengine_spark.operators.build import build_index
    from websearchengine_spark.operators.query import run_query
    from websearchengine_spark.operators.topk import wand_topk, wand_topk_batch
    from websearchengine_spark.session import get_spark

    spark = get_spark("wse-jobcount-r06")
    sc = spark.sparkContext

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.count()
    pages = docs.select(
        F.concat(F.lit("doc"), F.lpad(F.col("doc_id").cast("string"), 9, "0")).alias("url"),
        "text",
    )

    def count_jobs(name, fn, reps=2):
        best = None
        jobs = None
        for i in range(reps):
            group = f"{name}-{i}"
            sc.setJobGroup(group, name)
            t0 = time.time()
            fn()
            dt = time.time() - t0
            jobs = len(sc.statusTracker().getJobIdsForGroup(group))
            sc.setJobGroup(None, None)
            if best is None or dt < best:
                best = dt
        print(f"{name:24s} jobs={jobs:3d}  best_wall={best:.3f}")

    roots = []

    def do_build():
        root = tempfile.mkdtemp(prefix="wse_jc_idx_")
        build_index(spark, pages, root, n_shards=32, n_groups=2,
                    analyzer="whitespace", keep_doc_terms=False)
        roots.append(root)

    count_jobs("index_build", do_build, reps=2)
    root = roots[-1]
    count_jobs("wand_1query", lambda: wand_topk(spark, root, "data stream join", k=10).collect(), reps=3)
    batch_queries = [f"{a} {b}" for a in ["data", "hash"] for b in ["stream", "window"]]
    count_jobs("wand_batch_x4", lambda: wand_topk_batch(spark, root, batch_queries, k=10).collect(), reps=2)
    count_jobs("bm25_dataframe", lambda: run_query(spark, root, "data stream join", ranker="bm25", k=10).collect(), reps=2)
    count_jobs("term_stats_agg", lambda: entry_mod.q_term_df(spark, SF_DIR).collect(), reps=2)
    count_jobs("minhash_dedup", lambda: entry_mod.q_minhash_signatures(spark, SF_DIR).collect(), reps=2)
    count_jobs("ann_cosine", lambda: entry_mod.q_ann_cosine(spark, SF_DIR).collect(), reps=2)
    count_jobs("tpch_q1", lambda: entry_mod.q_tpch_q1(spark, SF_DIR).collect(), reps=2)
    count_jobs("pagerank_2iter", lambda: entry_mod.q_pagerank(spark, SF_DIR).collect(), reps=2)


if __name__ == "__main__":
    main()
