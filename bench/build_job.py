#!/usr/bin/env python
"""Standalone index-build job for the scaling benchmark.

Submitted via ``spark-submit --master local[N] --py-files
websearchengine_spark.zip bench/build_job.py <corpus_parquet> <out_root>
<n_shards>`` — the packaging path the engine ships with on a real
cluster.  Prints one JSON line with the measured build wall time
(SparkSession startup excluded: timing starts after the session and the
input DataFrame exist)."""

import json
import sys
import time

from pyspark.sql import SparkSession


def main() -> None:
    corpus_path, out_root, n_shards = sys.argv[1], sys.argv[2], int(sys.argv[3])
    n_groups = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    spark = (
        SparkSession.builder.appName("wse-scaling-build")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    cores = spark.sparkContext.defaultParallelism
    # finer-than-cores shuffle partitioning shrinks the last-wave tail of
    # the encode stage (head terms make partitions uneven)
    spark.conf.set("spark.sql.shuffle.partitions", str(max(16, cores * 4)))

    from websearchengine_spark.operators.build import build_index

    pages = spark.read.parquet(corpus_path)
    n_docs = pages.count()

    t0 = time.time()
    store = build_index(
        spark,
        pages,
        out_root,
        n_shards=n_shards,
        n_groups=n_groups,
        keep_doc_terms=False,
        resume=False,
    )
    build_sec = time.time() - t0
    phases = store.read_manifest().get("config", {}).get("phase_timings_sec", {})
    print(
        json.dumps(
            {
                "cores": cores,
                "n_docs": n_docs,
                "n_groups": n_groups,
                "build_sec": round(build_sec, 3),
                "docs_per_sec": round(n_docs / build_sec, 2),
                "phases": phases,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
