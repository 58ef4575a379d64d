#!/usr/bin/env python
"""A/B evidence for the round-4 row-de-amplification of sign-LSH and
SimHash (round-3 review: the old shapes exploded n_planes x n_dim rows
per vector resp. bits x distinct-(doc,term) rows per doc).

Runs BOTH shapes over the bench tables ($SPARK_GRAFT_SF_DIR, default
/root/testdata/sf0.1) and reports, per op:

  * rows_amplified   rows flowing into the aggregation in the OLD shape
  * rows_deamplified rows in the NEW shape (== input cardinality)
  * old_ms / new_ms  wall time of a full count() over the op's output
  * identical        outputs byte-identical (sorted collect compare)

The legacy implementations live HERE, verbatim, as the baseline — the
package operators (operators/similarity.py::lsh_bucket,
operators/dedup.py::simhash) are the de-amplified versions, pinned
explode-free by tests/test_plans.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from websearchengine_spark.operators.dedup import (
    DEFAULT_N_HASHES,
    char_shingles,
    minhash_signatures,
    simhash,
)
from websearchengine_spark.operators.similarity import _as_double, lsh_bucket
from websearchengine_spark.session import get_spark

N_PLANES = 8
BITS = 16


def legacy_lsh_bucket(emb, n_planes=N_PLANES, id_col="vec_id", vec_col="embedding"):
    """The round-3 shape: per-(plane, dimension) explode + two groupBys."""
    rows = emb.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), F.lit(n_planes - 1))).alias("p"),
        F.col(vec_col).alias("v"),
    )
    per_dim = rows.select(
        id_col,
        "p",
        F.explode(F.sequence(F.lit(1), F.size("v"))).alias("i"),
        F.element_at(_as_double(F.col("v")), F.col("i")).alias("x"),
    ).withColumn(
        "w", ((F.col("i") * (F.col("p") + 3) * 2654435761) % 1000) / 1000.0 - 0.5
    )
    dots = per_dim.groupBy(id_col, "p").agg(F.sum(F.col("x") * F.col("w")).alias("d"))
    return (
        dots.withColumn(
            "bit", F.when(F.col("d") > 0, F.pow(F.lit(2.0), F.col("p"))).otherwise(0.0)
        )
        .groupBy(id_col)
        .agg(F.sum("bit").cast("long").alias("bucket"))
    )


def legacy_simhash(docs, text_col="text", bits=BITS):
    """The round-3 shape: per-bit explode between two extra groupBys."""
    from websearchengine_spark.operators.util import widen_for_explode

    toks = widen_for_explode(docs).select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower(text_col), r"\s+"), lambda t: t != "")
        ).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    contribs = tf.select(
        "doc_id",
        "tf",
        "term",
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("b"),
    ).withColumn(
        "contrib",
        F.col("tf")
        * F.when(
            F.substring(F.md5(F.encode("term", "UTF-8")), F.col("b") + 1, 1).isin(
                "1", "3", "5", "7", "9", "b", "d", "f"
            ),
            1,
        ).otherwise(-1),
    )
    return (
        contribs.groupBy("doc_id", "b")
        .agg(F.sum("contrib").alias("s"))
        .withColumn(
            "bit", F.when(F.col("s") > 0, F.pow(F.lit(2.0), F.col("b"))).otherwise(0.0)
        )
        .groupBy("doc_id")
        .agg(F.sum("bit").cast("long").alias("simhash"))
    )


def legacy_minhash_signatures(
    docs, text_col="text", n_hashes=DEFAULT_N_HASHES, shingle_k=8
):
    """The r1-r4 shape, verbatim: char_shingles EXPLODE (~len(text) rows
    per doc) -> groupBy(doc_id) min-aggregates.  Replaced in r5 by the
    explode-free transform/array_min projection."""
    sh = char_shingles(docs, text_col, shingle_k)
    digests = {
        g: F.md5(F.encode(F.concat(F.lit(f"{g}|"), F.col("shingle")), "UTF-8"))
        for g in range((n_hashes + 3) // 4)
    }
    aggs = [
        F.min(
            F.conv(F.substring(digests[h // 4], 1 + 8 * (h % 4), 8), 16, 10).cast(
                "long"
            )
        ).alias(f"mh{h}")
        for h in range(n_hashes)
    ]
    sig = sh.groupBy("doc_id").agg(*aggs)
    return sig.select(
        "doc_id", F.array(*[F.col(f"mh{h}") for h in range(n_hashes)]).alias("mh")
    )


def _timed_rows(df):
    t0 = time.time()
    n = df.count()
    return n, (time.time() - t0) * 1000.0


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("deamplify-bench", cores=int(cpus), shuffle_partitions=32)

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    n_vecs = emb.count()
    n_dim = len(emb.select("embedding").first()[0])
    n_docs = docs.count()

    # ---- sign-LSH -------------------------------------------------------
    old = legacy_lsh_bucket(emb)
    new = lsh_bucket(emb)
    _, old_ms = _timed_rows(old)
    _, new_ms = _timed_rows(new)
    identical = (
        sorted(map(tuple, old.collect())) == sorted(map(tuple, new.collect()))
    )
    print(
        json.dumps(
            {
                "op": "lsh_bucket",
                "n_vecs": n_vecs,
                "rows_amplified": n_vecs * N_PLANES * n_dim,
                "rows_deamplified": n_vecs,
                "amplification_removed": N_PLANES * n_dim,
                "old_ms": round(old_ms, 1),
                "new_ms": round(new_ms, 1),
                "speedup": round(old_ms / max(new_ms, 1e-9), 2),
                "identical": identical,
            }
        )
    )

    # ---- simhash --------------------------------------------------------
    n_doc_terms = (
        docs.select(
            "doc_id",
            F.explode(
                F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
            ).alias("term"),
        )
        .distinct()
        .count()
    )
    old = legacy_simhash(docs)
    new = simhash(docs)
    _, old_ms = _timed_rows(old)
    _, new_ms = _timed_rows(new)
    identical = (
        sorted(map(tuple, old.collect())) == sorted(map(tuple, new.collect()))
    )
    print(
        json.dumps(
            {
                "op": "simhash",
                "n_docs": n_docs,
                "rows_amplified": n_doc_terms * BITS,
                "rows_deamplified": n_doc_terms,
                "amplification_removed": BITS,
                "old_ms": round(old_ms, 1),
                "new_ms": round(new_ms, 1),
                "speedup": round(old_ms / max(new_ms, 1e-9), 2),
                "identical": identical,
            }
        )
    )

    # ---- minhash signatures (r5) ---------------------------------------
    avg_shingles = (
        char_shingles(docs).count() // max(1, n_docs)
    )
    old = legacy_minhash_signatures(docs)
    new = minhash_signatures(docs)
    _, old_ms = _timed_rows(old)
    _, new_ms = _timed_rows(new)
    identical = (
        sorted((r["doc_id"], tuple(r["mh"])) for r in old.collect())
        == sorted((r["doc_id"], tuple(r["mh"])) for r in new.collect())
    )
    print(
        json.dumps(
            {
                "op": "minhash_signatures",
                "n_docs": n_docs,
                "rows_amplified": n_docs * avg_shingles,
                "rows_deamplified": n_docs,
                "amplification_removed": int(avg_shingles),
                "old_ms": round(old_ms, 1),
                "new_ms": round(new_ms, 1),
                "speedup": round(old_ms / max(new_ms, 1e-9), 2),
                "identical": identical,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
