"""Distributed index merge (log-structured compaction of two builds).

The reference builds its index in rounds and merges the per-round
partial posting files into one final index (IndexerInvertedCompressed.
java:167-277 — constructIndex loops corpus batches, then the loader
unifies the per-batch maps).  At web scale the same need appears as
*incremental crawls*: yesterday's 100 TB index plus today's 1 TB delta
should combine WITHOUT re-tokenizing yesterday's corpus.  This operator
merges two built index roots into a third:

    merged = A  ∪  (B shifted by a doc_id offset)

Scale design (the 100 TB story):

  * NO token rescan and NO occurrence shuffle.  The only wide operation
    is a groupBy(shard, term) over the two *compressed postings tables*
    — rows are already per-(shard, term) blocks, i.e. orders of
    magnitude smaller than the occurrence stream the original builds
    shuffled.  Decode → concat → re-encode runs embarrassingly parallel
    in an Arrow-batched numpy pass.
  * the doc_id offset is the smallest multiple of n_shards that clears
    A's doc_id space, so ``(doc_id + offset) % n_shards == doc_id %
    n_shards`` — B's rows KEEP their shard, no re-sharding shuffle of
    docs, doc_terms, or postings.  doc_ids stay unique and ascending
    (A's ids < offset <= B's shifted ids) but are no longer dense; the
    query path never assumes density.
  * posting lists re-encode because df and avg_dl change after the
    merge: per-block ``max_impact`` upper bounds bake in avg_dl
    (codec.bm25_impact), and the champion-head split is an impact
    quantile — both must be recomputed for WAND pruning to stay a
    *valid* bound over the merged corpus.
  * per shard-group resumable commits + lineage in the manifest, same
    contract as build_index (north_rule: checkpoint resume, per-
    partition metrics).

Constraints: both inputs must share n_shards, analyzer, and the
positions flag (ValueError otherwise) — these are index-format
invariants, not merge limitations.
"""

from __future__ import annotations

import time

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from websearchengine_spark.functions.codec import (
    BLOCK_SIZE,
    DEFAULT_HEAD_FRAC,
    decode_posting_blocks,
    encode_posting_blocks,
)
from websearchengine_spark.operators.build import POSTINGS_SCHEMA
from websearchengine_spark.sources.storage import IndexStorage


def _require(cfg_a: dict, cfg_b: dict, key: str, default=None):
    va, vb = cfg_a.get(key, default), cfg_b.get(key, default)
    if va != vb:
        raise ValueError(
            f"cannot merge indexes with different {key!r}: {va!r} vs {vb!r}"
        )
    return va


def merge_indexes(
    spark: SparkSession,
    root_a: str,
    root_b: str,
    out_root: str,
    n_groups: int | None = None,
    block_size: int = BLOCK_SIZE,
    head_frac: float | None = None,
    resume: bool = True,
) -> IndexStorage:
    """Merge built indexes at ``root_a`` and ``root_b`` into ``out_root``.

    B's doc_ids shift by the smallest multiple of n_shards >= A's
    num_docs (shard-preserving).  Posting blocks are decoded, shifted,
    concatenated (A-then-B keeps doc order: every shifted B id exceeds
    every A id) and re-encoded against the merged corpus avg_dl, so
    block-max WAND bounds and the champion-head layout stay valid.
    Returns the output IndexStorage; queries on it are score-identical
    to a from-scratch build of the union corpus (doc_ids differ, so
    exact score ties may order differently).
    """
    store_a, store_b = IndexStorage(root_a), IndexStorage(root_b)
    cfg_a = store_a.read_manifest().get("config", {})
    cfg_b = store_b.read_manifest().get("config", {})
    n_shards = int(_require(cfg_a, cfg_b, "n_shards"))
    analyzer = _require(cfg_a, cfg_b, "analyzer", "reference")
    positions = bool(_require(cfg_a, cfg_b, "positions", True))
    if n_groups is None:
        n_groups = int(cfg_a.get("n_groups", 1) or 1)
    if head_frac is None:
        head_frac = DEFAULT_HEAD_FRAC

    num_docs_a = int(cfg_a["num_docs"])
    num_docs_b = int(cfg_b["num_docs"])
    total_tf = int(cfg_a["total_tf"]) + int(cfg_b["total_tf"])
    num_docs = num_docs_a + num_docs_b
    # shard-preserving shift: (d + offset) % n_shards == d % n_shards
    offset = ((num_docs_a + n_shards - 1) // n_shards) * n_shards
    avg_dl = total_tf / max(1, num_docs)

    out = IndexStorage(out_root)
    manifest = out.read_manifest()
    build_id = out.new_build_id()
    done = out.completed_groups() if resume else set()
    if not resume:
        manifest["completed_groups"] = []
    manifest.setdefault("attempts", []).append(
        {
            "build_id": build_id,
            "ts": time.time(),
            "merged_from": [
                {"root": root_a, "snapshot_id": store_a.read_manifest().get("snapshot_id")},
                {"root": root_b, "snapshot_id": store_b.read_manifest().get("snapshot_id")},
            ],
            "doc_id_offset": offset,
            "resumed_groups": sorted(done),
        }
    )
    out.write_manifest(manifest)

    # ---- docs / forward tables: union with the shifted id ---------------
    def shifted(df):
        return df.withColumn("doc_id", (F.col("doc_id") + F.lit(offset)).cast("long"))

    docs = store_a.read_table(spark, "docs").unionByName(
        shifted(store_b.read_table(spark, "docs"))
    )
    out.write_table(docs, "docs")
    for opt_table in ("doc_terms", "doc_tokens"):
        if store_a.exists(opt_table) and store_b.exists(opt_table):
            out.write_table(
                store_a.read_table(spark, opt_table).unionByName(
                    shifted(store_b.read_table(spark, opt_table))
                ),
                opt_table,
            )

    max_dl = max(
        int(store_a.read_table(spark, "stats").collect()[0]["max_dl"] or 0),
        int(store_b.read_table(spark, "stats").collect()[0]["max_dl"] or 0),
    )
    stats = spark.createDataFrame(
        pd.DataFrame(
            {"num_docs": [num_docs], "total_tf": [total_tf], "max_dl": [max_dl]}
        ).astype("int64")
    )
    out.write_table(stats, "stats")

    # ---- postings: decode + shift + concat + re-encode per (shard, term)
    parts_a = store_a.read_partitioned(spark, "postings").withColumn(
        "side", F.lit(0)
    )
    parts_b = store_b.read_partitioned(spark, "postings").withColumn(
        "side", F.lit(1)
    )
    both = parts_a.unionByName(parts_b).select(
        "shard", "term", "side", "df_shard", "ctf_shard", "blocks"
    )

    def merge_batches(batches):
        import numpy as np

        for pdf in batches:
            out_rows = {
                "shard": [], "term": [], "df_shard": [], "ctf_shard": [], "blocks": [],
            }
            for shard, term, parts in zip(pdf["shard"], pdf["term"], pdf["parts"]):
                docs_l, tfs_l, dls_l, pos_l = [], [], [], []
                # parts arrive unordered; side 0 (A) must precede side 1
                for part in sorted(parts, key=lambda s: s["side"]):
                    d, t, dl, p = decode_posting_blocks(
                        [
                            (
                                b["first_docid"], b["last_docid"], b["n"],
                                b["max_tf"], b["max_impact"], b["data"],
                            )
                            for b in part["blocks"]
                        ],
                        want_positions=positions,
                        want_doclens=True,
                    )
                    if part["side"] == 1:
                        d = d + offset
                    docs_l.append(d)
                    tfs_l.append(t)
                    dls_l.append(dl)
                    if positions:
                        pos_l.append(p)
                d = np.concatenate(docs_l)
                t = np.concatenate(tfs_l)
                dl = np.concatenate(dls_l)
                p = np.concatenate(pos_l) if positions else None
                blocks = encode_posting_blocks(
                    d, t, dl, p, avg_dl, block_size=block_size, head_frac=head_frac
                )
                out_rows["shard"].append(int(shard))
                out_rows["term"].append(term)
                out_rows["df_shard"].append(int(d.size))
                out_rows["ctf_shard"].append(int(t.sum()))
                out_rows["blocks"].append(blocks)
            yield pd.DataFrame(out_rows)

    # grouped rows are FAT (full block lists) — cap Arrow batch rows,
    # same guard as build_index
    _prev_batch = spark.conf.get(
        "spark.sql.execution.arrow.maxRecordsPerBatch", None
    )
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "512")
    try:
        t_group = time.time()
        for g in range(n_groups):
            if g in done:
                continue
            grouped = (
                both.filter(F.col("shard") % n_groups == g)
                .groupBy("shard", "term")
                .agg(
                    F.collect_list(F.struct("side", "blocks")).alias("parts")
                )
            )
            merged = grouped.mapInPandas(merge_batches, schema=POSTINGS_SCHEMA)
            merged = merged.sortWithinPartitions("term")
            out.write_partition(merged, "postings", "group", g)
            written = out.read_table(spark, f"postings/group={g}")
            gm = written.agg(
                F.sum("df_shard").alias("n_postings"),
                F.count("*").alias("n_terms"),
                F.max("ctf_shard").alias("max_term_postings"),
            ).collect()[0]
            out.mark_group_complete(
                g,
                {
                    "build_id": build_id,
                    "n_postings": int(gm["n_postings"] or 0),
                    "n_terms": int(gm["n_terms"] or 0),
                    "max_term_postings": int(gm["max_term_postings"] or 0),
                    "elapsed_sec": time.time() - t_group,
                },
            )
            t_group = time.time()
    finally:
        if _prev_batch is not None:
            spark.conf.set(
                "spark.sql.execution.arrow.maxRecordsPerBatch", _prev_batch
            )
        else:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")

    # ---- global term stats from the merged per-shard postings -----------
    term_stats = (
        out.read_partitioned(spark, "postings")
        .groupBy("term")
        .agg(
            F.sum("df_shard").cast("long").alias("df"),
            F.sum("ctf_shard").cast("long").alias("ctf"),
        )
    )
    out.write_table(term_stats, "term_stats")

    out.finalize_snapshot(
        {
            "n_shards": n_shards,
            "n_groups": n_groups,
            "build_id": build_id,
            "analyzer": analyzer,
            "avg_dl": avg_dl,
            "num_docs": num_docs,
            "total_tf": total_tf,
            "positions": positions,
            "head_frac": head_frac,
            "merged_from": [root_a, root_b],
            "doc_id_offset": offset,
        }
    )
    return out
