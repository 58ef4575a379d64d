#!/usr/bin/env python
"""Wall-time snapshot of the round-5 LLM-training-data-pipeline tier at
the bench SF ($SPARK_GRAFT_SF_DIR, default /root/testdata/sf0.1):

  * url_dedup          normalize + group 5k synthesized URLs
  * strip_boilerplate  corpus-level line vocab + per-doc rebuild
  * gopher_stats       repetition/quality features (full aggregate)
  * pii_redact         sequential 3-pattern scrub (map-only)
  * semantic_dedup     centroid assign + within-cluster self-join over
                       embeddings ∪ exact copies of every 5th vector
  * scrub_repeated     corpus-level 8-token repeated-window removal
  * clean_corpus_e2e   the WHOLE cleaning chain (url dedup -> pii ->
                       boilerplate -> scrub -> gopher -> exact near-dup
                       -> split) on the driver entry's planted input

Each phase is best-of-$BENCH_REPS (default 3) seconds of a full action
over the op's output (count / tiny agg — nothing driver-materialized
beyond a handful of rows).  Emits one JSON line; append the table to
BENCH/BASELINE.md §BENCH_LLMPIPE by hand (BASELINE.md is append-only
history).

The constructions mirror the driver entries (__spark_entry__.py
q_url_dedup / q_strip_boilerplate / q_semantic_dedup) so these walls
measure the exact shapes the correctness gate certifies.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from websearchengine_spark.operators.dedup import scrub_repeated_ngrams
from websearchengine_spark.operators.pipeline import clean_corpus
from websearchengine_spark.operators.similarity import (
    ivf_build_centroids,
    semantic_dedup,
)
from websearchengine_spark.operators.textstats import (
    gopher_stats,
    pii_redact,
    strip_boilerplate,
    url_dedup,
)
from websearchengine_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("BENCH_REPS", "3"))


def best_of(fn, reps=REPS):
    walls = []
    for _ in range(reps):
        t0 = time.monotonic()
        fn()
        walls.append(time.monotonic() - t0)
    return min(walls)


def main():
    spark = get_spark(app_name="bench_llmpipe")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    n_docs = docs.count()
    n_vecs = emb.count()

    import __spark_entry__ as entry

    urls = docs.select("doc_id", entry._url_spark().alias("url"))
    bp_docs = docs.select("doc_id", entry._bp_text_spark().alias("text"))
    # the +100000 copy-id offset mirrors q_semantic_dedup's SQL literal;
    # it only stays collision-free below 100k originals
    assert n_vecs < 100000, f"copy-id offset collides at {n_vecs} vectors"
    copies = emb.filter(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    emb_all = emb.unionByName(copies)
    cents = [
        [round(float(x), 6) for x in c] for c in ivf_build_centroids(emb, nlist=4)
    ]

    phases = {}
    out = {}

    def run(name, fn):
        phases[name] = round(best_of(fn), 3)

    run("url_dedup", lambda: out.__setitem__(
        "url_groups", url_dedup(urls).count()))
    run("strip_boilerplate", lambda: out.__setitem__(
        "bp_removed",
        strip_boilerplate(bp_docs, min_docs=10)
        .agg(F.sum("n_removed")).collect()[0][0]))
    run("gopher_stats", lambda: out.__setitem__(
        "gopher_pass",
        gopher_stats(bp_docs).agg(F.sum("gopher_pass")).collect()[0][0]))
    run("pii_redact", lambda: pii_redact(docs).count())
    run("semantic_dedup", lambda: out.__setitem__(
        "sem_dropped",
        semantic_dedup(emb_all, cents, threshold=0.9)
        .filter(~F.col("keep")).count()))
    run("scrub_repeated", lambda: out.__setitem__(
        "scrub_removed",
        int(scrub_repeated_ngrams(docs.select("doc_id", "text"), n=8, min_count=2)
            .agg(F.sum("n_removed")).collect()[0][0])))
    # WIDE url synthesis for the pipeline phases (NOT the entry's
    # _url_spark: that one deliberately collapses to ~420 normalized
    # groups to exercise every normalize rule at 500-doc correctness
    # SF, which at 50k docs would drop 99% of the corpus before the
    # text stages and void the scale measurement).  Here every doc
    # gets its own URL except doc_id%10==9, which copies its
    # predecessor's — a flat 10% url_dup rate at any SF.
    _d = F.col("doc_id")
    _du = F.when(_d % 10 == 9, _d - 1).otherwise(_d)
    clean_in = docs.select(
        "doc_id",
        F.concat(
            F.lit("http://host"), (_du % 7).cast("string"),
            F.lit(".com/p"), _du.cast("string"),
        ).alias("url"),
        entry._clean_text_spark().alias("text"),
    )
    run("clean_corpus_e2e", lambda: out.__setitem__(
        "clean_statuses",
        {r["status"]: r["n"] for r in clean_corpus(
            clean_in, boilerplate_min_docs=10, scrub_n=8, scrub_min_count=3,
            near_dup="exact",
        ).groupBy("status").agg(F.count("*").alias("n")).collect()}))

    import tempfile

    def clean_ckpt():
        ck = tempfile.mkdtemp(prefix="wse_clean_ck_")
        out["clean_statuses_ckpt"] = {r["status"]: r["n"] for r in clean_corpus(
            clean_in, boilerplate_min_docs=10, scrub_n=8, scrub_min_count=3,
            near_dup="exact", checkpoint_dir=ck,
        ).groupBy("status").agg(F.count("*").alias("n")).collect()}

    run("clean_corpus_ckpt", clean_ckpt)
    assert out["clean_statuses_ckpt"] == out["clean_statuses"], out

    # sanity: every planted copy is dropped; sf0.1's synthetic vectors
    # are near-orthogonal so drops == planted there, while denser sets
    # (bench/sf1.py's 10-prototype corpus) legitimately add organic
    # >= 0.9 pairs on top
    planted = n_vecs // 5 + (1 if n_vecs % 5 else 0)
    assert out["sem_dropped"] >= planted, (out, planted)

    print(json.dumps({
        "metric": "llmpipe_suite_sec",
        "value": round(sum(phases.values()), 3),
        "unit": "sec",
        "sf_dir": SF_DIR,
        "n_docs": n_docs,
        "n_vecs": n_vecs,
        "reps": REPS,
        "phases": phases,
        "outputs": out,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
