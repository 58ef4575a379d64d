"""k-means|| quantizer bench at realistic shape (r5): 256-dim / 50k
clustered vectors / nlist=64 — training wall (per full-scan pass),
index write, and warm probe latency at nprobe=4, plus recall@10 vs
brute force.  One JSON line, same contract as bench.py.

    python bench/ivf_kmeans.py            # SPARK_GRAFT_CPUS honored
    IVF_BENCH_N=100000 python bench/ivf_kmeans.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import tempfile

    from pyspark.sql import functions as F

    from websearchengine_spark.operators.similarity import (
        cosine_topk,
        ivf_topk_indexed,
        ivf_train_centroids_kmeans,
        ivf_write_index,
    )
    from websearchengine_spark.session import get_spark
    from websearchengine_spark.sources.corpus import gen_clustered_embeddings

    n = int(os.environ.get("IVF_BENCH_N", "50000"))
    nlist, dim, nprobe = 64, 256, 4
    spark = get_spark("bench-ivf-kmeans")

    # the SAME generator as test_ivf_kmeans_recall_realistic_dim — the
    # test and the bench measure one corpus shape
    emb = gen_clustered_embeddings(
        spark, n, dim=dim, nlist=nlist, partitions=32
    ).persist()
    emb.count()

    t0 = time.time()
    cents = ivf_train_centroids_kmeans(emb, nlist=nlist, seed=13)
    t_train = time.time() - t0
    n_passes = 3 * 2 + 1 + 5  # seeding x2, weight, Lloyd

    root = tempfile.mkdtemp(prefix="wse_ivf_bench_")
    t0 = time.time()
    ivf_write_index(emb, cents, os.path.join(root, "ivf"))
    t_write = time.time() - t0

    qv = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    ivf_topk_indexed(
        spark, os.path.join(root, "ivf"), cents, qv, k=10, nprobe=nprobe
    ).collect()  # warm
    probes, hits, total = [], 0, 0
    # 10 query ids spread over the corpus, valid for any IVF_BENCH_N
    for q in range(0, n, max(1, n // 10))[:10]:
        qv = emb.filter(F.col("vec_id") == q).collect()[0]["embedding"]
        t0 = time.time()
        got = {
            r["vec_id"]
            for r in ivf_topk_indexed(
                spark, os.path.join(root, "ivf"), cents, qv, k=10,
                nprobe=nprobe,
            ).collect()
        }
        probes.append(time.time() - t0)
        want = {r["vec_id"] for r in cosine_topk(emb, qv, k=10).collect()}
        hits += len(want & got)
        total += len(want)

    print(
        json.dumps(
            {
                "metric": "ivf_kmeans_train_sec",
                "value": round(t_train, 3),
                "unit": "sec",
                "n": n,
                "dim": dim,
                "nlist": nlist,
                "nprobe": nprobe,
                "train_sec_per_pass": round(t_train / n_passes, 3),
                "index_write_sec": round(t_write, 3),
                "probe_warm_sec": round(min(probes), 3),
                "recall_at_10": round(hits / total, 4),
            }
        ),
        flush=True,
    )
    emb.unpersist()


if __name__ == "__main__":
    main()
