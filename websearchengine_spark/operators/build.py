"""Index build pipeline — the Spark-first replacement for
``--mode=index`` (SearchEngine.java:152-157 -> IndexerInvertedCompressed.
constructIndex :167-277; lifecycle traced in SURVEY.md §3.1).

Pipeline (all DataFrame; boundaries are Spark stages):

    pages ──mapInPandas──► (url, title, tokens)          [narrow: extract+analyze]
      │ repartitionByRange(url) + local row_number + partition offsets
      ▼
    docs(doc_id, url, title, doc_len, pagerank, numviews) [1 shuffle]
      │ posexplode(tokens)
      ▼
    groupBy(doc_id, term) -> tf, positions               [shuffle 1: partial agg map-side]
      │ shard = doc_id % n_shards
      ▼
    groupBy(shard, term) -> sorted docs/tfs/positions    [shuffle 2]
      │ applyInPandas encode (delta-gap + varbyte blocks)
      ▼
    postings(shard, term, df_shard, ctf_shard, blocks)   [written per shard-group]

Scale design decisions (the 100 TB story):

  * doc-id assignment is the scalable two-phase scheme (per-partition
    row_number + broadcast partition offsets) — a single-partition global
    window would serialize the corpus through one task.  SURVEY §7.3.
  * postings are DOC-SHARDED (shard = doc_id % n_shards): every term's
    list is split across all shards, so head-term skew (stopwords with
    df ~ corpus size) is bounded by ceil(df / n_shards) — sharding IS the
    salting the north_rule demands; no groupBy ever collects a full head
    term's corpus-wide posting list in one task.  Query-time WAND runs
    per shard and merges (operators/topk.py).
  * both aggregations are native hash aggs with map-side partial
    aggregation; the only Python is the Arrow-batched extract/analyze UDF
    and the block encoder (numpy).
  * the postings write is chunked into ``n_groups`` shard-groups; each
    group commit is recorded in the manifest -> resumable builds with
    per-partition lineage + metrics (north_rule).
"""

from __future__ import annotations

import time

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from websearchengine_spark.functions.analyze import analyze_text
from websearchengine_spark.functions.codec import encode_posting_blocks
from websearchengine_spark.functions.extract import extract_text_and_title
from websearchengine_spark.sources.storage import IndexStorage

DEFAULT_N_SHARDS = 8
DEFAULT_N_GROUPS = 4

ANALYZED_SCHEMA = "url string, title string, tokens array<string>"

POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType()),
        T.StructField("term", T.StringType()),
        T.StructField("df_shard", T.LongType()),
        T.StructField("ctf_shard", T.LongType()),
        T.StructField(
            "blocks",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("first_docid", T.LongType()),
                        T.StructField("last_docid", T.LongType()),
                        T.StructField("n", T.IntegerType()),
                        T.StructField("max_tf", T.IntegerType()),
                        T.StructField("max_impact", T.DoubleType()),
                        T.StructField("data", T.BinaryType()),
                    ]
                )
            ),
        ),
    ]
)


def analyze_pages(pages: DataFrame, analyzer: str = "reference") -> DataFrame:
    """pages -> (url, title, tokens) via one Arrow-batched UDF pass.

    Extraction (S2) + analyzer chain (P1-P4) in a single mapInPandas so
    html bytes never cross a shuffle.  If the ``text`` column is already
    populated (input_hint allows either), it is trusted as the pinned
    extractor's output (byte-identity contract) and only tokenized;
    otherwise the html is extracted here.

    ``analyzer``: "reference" = the full chain (lowercase + Porter step 1
    + 1..20 length filter); "whitespace" = raw lowercase whitespace
    tokens (used when an external SQL oracle must reproduce the token
    stream exactly).
    """

    def run(batches):
        for pdf in batches:
            urls = pdf["url"]
            texts = pdf["text"] if "text" in pdf else pd.Series([None] * len(pdf))
            htmls = pdf["html"] if "html" in pdf else pd.Series([None] * len(pdf))
            titles, out_tokens = [], []
            for text, html in zip(texts, htmls):
                if text is None and html is not None:
                    title, text = extract_text_and_title(html)
                elif html is not None:
                    title, _ = extract_text_and_title(html)
                else:
                    title = ""
                if analyzer == "whitespace":
                    out_tokens.append((text or "").lower().split())
                else:
                    out_tokens.append(analyze_text(text or ""))
                titles.append(title)
            yield pd.DataFrame({"url": urls, "title": titles, "tokens": out_tokens})

    cols = [c for c in ("url", "html", "text") if c in pages.columns]
    return pages.select(*cols).mapInPandas(run, schema=ANALYZED_SCHEMA)


def assign_doc_ids(analyzed: DataFrame, n_parts: int | None = None) -> DataFrame:
    """Deterministic dense doc_id = rank of url in global url sort order.

    Scalable two-phase: range-partition by url, local row_number, then
    add broadcast per-partition offsets.  (A global ``row_number() over
    (order by url)`` funnels everything through one task; never do that
    at 10^12 rows.)  SURVEY.md §7.3.
    """
    spark = analyzed.sparkSession
    if n_parts is None:
        n_parts = max(8, analyzed.sparkSession.sparkContext.defaultParallelism)
    parted = analyzed.repartitionByRange(n_parts, "url").withColumn(
        "_pid", F.spark_partition_id()
    )
    parted = parted.persist()
    counts = {r["_pid"]: r["cnt"] for r in parted.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offs = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
    w = Window.partitionBy("_pid").orderBy("url")
    return (
        parted.withColumn("_rn", F.row_number().over(w))
        .withColumn("doc_id", (offs[F.col("_pid")] + F.col("_rn") - 1).cast("long"))
        .drop("_pid", "_rn")
    )


def build_index(
    spark: SparkSession,
    pages: DataFrame,
    index_root: str,
    n_shards: int = DEFAULT_N_SHARDS,
    n_groups: int = DEFAULT_N_GROUPS,
    resume: bool = True,
    signals: DataFrame | None = None,
    keep_doc_terms: bool = True,
    analyzer: str = "reference",
) -> IndexStorage:
    """Build the full index at ``index_root``; resumable per shard-group.

    ``signals``: optional DataFrame (url, pagerank, numviews) from the
    mining pipeline (operators/graph.py), joined into ``docs`` (J4);
    missing urls get pagerank=0.0 / numviews=0 (coalesce, as the
    reference's map lookups default, IndexerInvertedCompressed.java:258-269).
    """
    store = IndexStorage(index_root)
    manifest = store.read_manifest()
    build_id = store.new_build_id()
    done = store.completed_groups() if resume else set()
    if not resume:
        manifest["completed_groups"] = []
        manifest.setdefault("attempts", [])
    manifest.setdefault("attempts", []).append(
        {"build_id": build_id, "ts": time.time(), "resumed_groups": sorted(done)}
    )
    store.write_manifest(manifest)

    analyzed = assign_doc_ids(analyze_pages(pages, analyzer=analyzer))
    analyzed = analyzed.persist()

    # ---- docs ----------------------------------------------------------
    docs = analyzed.select(
        "doc_id", "url", "title", F.size("tokens").cast("long").alias("doc_len")
    )
    if signals is not None:
        docs = (
            docs.join(signals, "url", "left")
            .withColumn("pagerank", F.coalesce(F.col("pagerank"), F.lit(0.0)).cast("double"))
            .withColumn("numviews", F.coalesce(F.col("numviews"), F.lit(0)).cast("long"))
        )
    else:
        docs = docs.withColumn("pagerank", F.lit(0.0)).withColumn("numviews", F.lit(0).cast("long"))
    store.write_table(docs.select("doc_id", "url", "title", "doc_len", "pagerank", "numviews"), "docs")

    # ---- doc_terms (A1) + term/corpus stats (A3-A5) --------------------
    exploded = analyzed.select(
        "doc_id", F.posexplode("tokens").alias("pos", "term")
    )
    doc_terms = exploded.groupBy("doc_id", "term").agg(
        F.count("*").cast("int").alias("tf"),
        F.sort_array(F.collect_list("pos")).alias("positions"),
    )
    doc_terms = doc_terms.persist()

    if keep_doc_terms:
        store.write_table(doc_terms.select("doc_id", "term", "tf"), "doc_terms")

    term_stats = doc_terms.groupBy("term").agg(
        F.count("*").cast("long").alias("df"),
        F.sum("tf").cast("long").alias("ctf"),
    )
    store.write_table(term_stats, "term_stats")

    docs_df = store.read_table(spark, "docs")
    stats = docs_df.agg(
        F.count("*").cast("long").alias("num_docs"),
        F.sum("doc_len").cast("long").alias("total_tf"),
    )
    store.write_table(stats, "stats")
    srow = store.read_table(spark, "stats").collect()[0]
    avg_dl = srow["total_tf"] / max(1, srow["num_docs"])

    # ---- postings: doc-sharded, blocked, per-group resumable commits ---
    doc_lens = docs_df.select("doc_id", "doc_len")
    sharded = (
        doc_terms.join(doc_lens, "doc_id")
        .withColumn("shard", (F.col("doc_id") % F.lit(n_shards)).cast("int"))
        .withColumn("group", (F.col("shard") % F.lit(n_groups)).cast("int"))
    )

    def encode_batches(batches):
        # rows: (shard, term, plist=[struct(doc_id, tf, doc_len, positions)...])
        # sorted by doc_id via sort_array on the struct (doc_id first field).
        import numpy as np

        for pdf in batches:
            out = {"shard": [], "term": [], "df_shard": [], "ctf_shard": [], "blocks": []}
            for shard, term, plist in zip(pdf["shard"], pdf["term"], pdf["plist"]):
                doc_ids = np.fromiter((e["doc_id"] for e in plist), dtype=np.int64, count=len(plist))
                tfs = np.fromiter((e["tf"] for e in plist), dtype=np.int64, count=len(plist))
                dls = np.fromiter((e["doc_len"] for e in plist), dtype=np.int64, count=len(plist))
                positions = (
                    np.concatenate([np.asarray(e["positions"], dtype=np.int64) for e in plist])
                    if len(plist)
                    else np.empty(0, dtype=np.int64)
                )
                blocks = encode_posting_blocks(doc_ids, tfs, dls, positions, avg_dl)
                out["shard"].append(int(shard))
                out["term"].append(term)
                out["df_shard"].append(len(plist))
                out["ctf_shard"].append(int(tfs.sum()))
                out["blocks"].append(blocks)
            yield pd.DataFrame(out)

    t_group_start = time.time()
    for g in range(n_groups):
        if g in done:
            continue
        part = sharded.filter(F.col("group") == g)
        plists = part.groupBy("shard", "term").agg(
            F.sort_array(
                F.collect_list(F.struct("doc_id", "tf", "doc_len", "positions"))
            ).alias("plist")
        )
        postings = plists.mapInPandas(encode_batches, schema=POSTINGS_SCHEMA)
        store.write_partition(postings, "postings", "group", g)
        gm = part.agg(
            F.count("*").alias("n_postings"),
            F.countDistinct("term").alias("n_terms"),
            F.countDistinct("doc_id").alias("n_docs"),
        ).collect()[0]
        store.mark_group_complete(
            g,
            {
                "build_id": build_id,
                "n_postings": gm["n_postings"],
                "n_terms": gm["n_terms"],
                "n_docs": gm["n_docs"],
                "n_shards_in_group": len(range(g, n_shards, n_groups)),
                "elapsed_sec": time.time() - t_group_start,
            },
        )
        t_group_start = time.time()

    # ---- build_meta table + snapshot -----------------------------------
    m = store.read_manifest()
    meta_rows = [
        {
            "grp": int(k),
            "build_id": v.get("build_id", ""),
            "n_postings": int(v.get("n_postings", 0)),
            "n_terms": int(v.get("n_terms", 0)),
            "n_docs": int(v.get("n_docs", 0)),
            "elapsed_sec": float(v.get("elapsed_sec", 0.0)),
        }
        for k, v in m.get("group_metrics", {}).items()
    ]
    if meta_rows:
        store.write_table(
            spark.createDataFrame(pd.DataFrame(meta_rows)), "build_meta"
        )
    store.finalize_snapshot(
        {
            "n_shards": n_shards,
            "n_groups": n_groups,
            "build_id": build_id,
            "analyzer": analyzer,
            "avg_dl": avg_dl,
        }
    )
    doc_terms.unpersist()
    analyzed.unpersist()
    return store
