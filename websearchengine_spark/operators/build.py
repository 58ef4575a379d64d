"""Index build pipeline — the Spark-first replacement for
``--mode=index`` (SearchEngine.java:152-157 -> IndexerInvertedCompressed.
constructIndex :167-277; lifecycle traced in SURVEY.md §3.1).

Pipeline (all DataFrame; boundaries are Spark stages):

    pages.select(url) ──► url rank (tiny two-phase)      [doc_id mapping]
    pages ──mapInPandas──► (url, title, tokens)          [narrow: extract+analyze]
      │ join(broadcast ids) ──► docs table               [no heavy shuffle]
      │ posexplode(tokens); pack occurrence -> ONE int64
      │   (doc_id << 22 | pos), doc_len -> (doc_id << 22 | doc_len)
      ▼
    groupBy(shard = doc_id % n_shards, term)             [the ONE shuffle]
      │ sort_array(collect_list(occ_packed))  — 8 B/occurrence
      │ sort_array(collect_set(dl_packed))    — map-side dedup, ~df rows
      ▼
    mapInArrow encode: zero-copy numpy slices of the packed-long
      buffers, run-length split per doc, delta-gap + varbyte
      block-max blocks (r6)
      ▼
    postings(shard, term, df_shard, ctf_shard, blocks)   [one dynamic-
      partitioned write for fresh builds; per-group commits either way]
    term_stats = sum of per-shard df/ctf over postings   [tiny agg, no
      rescan; term-sorted 1 MB row groups = the query-time dictionary]

Scale design decisions (the 100 TB story):

  * doc-id assignment is the scalable two-phase scheme (per-partition
    row_number + broadcast partition offsets) computed on the URL COLUMN
    ALONE — a single-partition global window would serialize the corpus
    through one task, and ranking the full analyzed stream would
    double-evaluate the UDF via range-partitioner sampling.  SURVEY §7.3.
  * the occurrence stream is shuffled exactly ONCE, and each occurrence
    crosses the wire as a SINGLE packed int64 (doc_id << 22 | pos) — the
    shuffle phase is memcpy-bound, so row width IS the scaling ceiling.
    doc_len ships as a second packed long deduplicated map-side
    (collect_set partial aggregation -> ~df rows, not ~ctf).  No
    intermediate per-(doc,term) aggregation, no multi-GB cache of
    position arrays, no doc_len join.  Per-doc tf/positions are rebuilt
    by numpy run-length splitting inside the Arrow encoder.
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

# Packed-occurrence layout for the ONE wide shuffle: each occurrence is a
# single int64 ``doc_id << PACK_BITS | pos`` (and the per-doc doc_len a
# single ``doc_id << PACK_BITS | doc_len`` carried ONCE per (doc, term)
# via a map-side-deduplicating collect_set) instead of a 3-field struct
# repeated per occurrence.  Shuffle bytes drop ~2.5-3x, and sort order on
# the packed long IS (doc_id, pos) order since doc_id occupies the high
# bits.  Limits: doc_id < 2^41 (covers the 10^12-doc north_rule with
# margin), pos/doc_len < 2^22 (4.19M tokens per doc; positions are token
# indexes so pos < doc_len always) — enforced against the corpus max
# doc_len before the shuffle runs.
PACK_BITS = 22
PACK_MASK = (1 << PACK_BITS) - 1
MAX_DOC_ID = 1 << (63 - PACK_BITS)

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
                        T.StructField("head", T.BooleanType()),
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

    cols = [c for c in ("url", "html", "text") if c in pages.columns]
    if analyzer == "whitespace" and "text" in cols and "html" not in cols:
        # JVM-NATIVE fast path: with no html to extract, whitespace
        # tokenization is a whole-stage-codegen'd split/filter — no
        # Python, no Arrow transfer of the token stream (UDFs are the
        # slow path).  Split semantics match the Python path on ASCII
        # whitespace (regex \s+ with empties filtered == str.split());
        # the synthetic/oracle corpora are controlled ASCII.
        toks = F.filter(
            F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), r"\s+"),
            lambda t: t != "",
        )
        title = F.col("title") if "title" in pages.columns else F.lit("")
        return pages.select("url", title.alias("title"), toks.alias("tokens"))

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

    return pages.select(*cols).mapInPandas(run, schema=ANALYZED_SCHEMA)


def _rank_urls_handle(
    urls: DataFrame, n_parts: int | None = None
) -> tuple[DataFrame, DataFrame]:
    """rank_urls plus the persisted intermediate, so the caller can
    unpersist it once the ranks have been consumed (build_index does,
    right after the analyzed stream is materialized)."""
    if n_parts is None:
        n_parts = max(8, urls.sparkSession.sparkContext.defaultParallelism)
    parted = urls.select("url").repartitionByRange(n_parts, "url").withColumn(
        "_pid", F.spark_partition_id()
    )
    parted = parted.persist()

    # per-partition counts in the SAME job that materializes the cache:
    # mapInPandas sees one partition per task, so summing batch lengths
    # needs no groupBy exchange (the old groupBy(_pid) agg cost two AQE
    # stage jobs for numbers the scan already knows — r6).  Arrow-batched,
    # no per-row Python work.
    def _part_counts(batches):
        n, pid = 0, None
        for pdf in batches:
            if len(pdf):
                n += len(pdf)
                if pid is None:
                    pid = int(pdf["_pid"].iloc[0])
        if pid is not None:
            yield pd.DataFrame({"_pid": [pid], "cnt": [n]})

    # AQE adds nothing here (explicit partition count, no joins) but
    # materializes each exchange as its own job; off for just this
    # collect, the count pass is one job instead of three
    spark = urls.sparkSession
    _prev_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        counts = {
            r["_pid"]: r["cnt"]
            for r in parted.mapInPandas(_part_counts, "_pid int, cnt long").collect()
        }
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", _prev_aqe)
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offs = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
    w = Window.partitionBy("_pid").orderBy("url")
    out = (
        parted.withColumn("_rn", F.row_number().over(w))
        .withColumn("doc_id", (offs[F.col("_pid")] + F.col("_rn") - 1).cast("long"))
        .drop("_pid", "_rn")
    )
    return out, parted


def rank_urls(urls: DataFrame, n_parts: int | None = None) -> DataFrame:
    """(url, doc_id): dense rank of url in global sort order.

    Scalable two-phase: range-partition by url, local row_number, then
    add broadcast per-partition offsets.  (A global ``row_number() over
    (order by url)`` funnels everything through one task; never do that
    at 10^12 rows.)  SURVEY.md §7.3.
    """
    return _rank_urls_handle(urls, n_parts)[0]


def assign_doc_ids(analyzed: DataFrame, n_parts: int | None = None) -> DataFrame:
    """Attach deterministic dense doc_id = rank of url in sort order.

    The rank is computed on the url column ALONE (a narrow, column-pruned
    pass — critically, this avoids range-partitioner SAMPLING of the
    heavy analyzed stream, which would evaluate the extract/analyze UDF a
    second time) and joined back.  The id side is tiny relative to the
    token stream, so Catalyst broadcasts it at bench scale; at extreme
    scale it degrades to a sort-merge join on url, which is still one
    shuffle of the heavy side — the same price the old repartitionByRange
    paid, without the double UDF evaluation.
    """
    ids = rank_urls(analyzed.select("url"), n_parts)
    return analyzed.join(ids, "url")


def build_index(
    spark: SparkSession,
    pages: DataFrame,
    index_root: str,
    n_shards: int = DEFAULT_N_SHARDS,
    n_groups: int = DEFAULT_N_GROUPS,
    resume: bool = True,
    signals: DataFrame | None = None,
    keep_doc_terms: bool = True,
    keep_doc_tokens: bool = False,
    analyzer: str = "reference",
    block_size: int | None = None,
    positions: bool = True,
    head_frac: float | None = None,
    spell_assist: bool = False,
) -> IndexStorage:
    """Build the full index at ``index_root``; resumable per shard-group.

    ``signals``: optional DataFrame (url, pagerank, numviews) from the
    mining pipeline (operators/graph.py), joined into ``docs`` (J4);
    missing urls get pagerank=0.0 / numviews=0 (coalesce, as the
    reference's map lookups default, IndexerInvertedCompressed.java:258-269).

    ``positions=False`` builds a doconly-style index
    (IndexerInvertedDoconly.java:140-147): posting blocks carry only
    [gaps, tfs, dls] — ~2-3x smaller, and the position column is dropped
    from the build shuffle itself.  Plain conjunctive/BM25 queries are
    unchanged; phrase queries (which need positions) raise ValueError.

    ``head_frac`` (default codec.DEFAULT_HEAD_FRAC): champion-head
    hybrid block layout — long posting lists split their top-impact
    postings into head blocks so tail blocks carry genuinely low
    max_impact bounds and the WAND threshold gate can skip them
    wholesale.  0.0 restores the plain doc-ordered layout.
    """
    phase_t: dict[str, float] = {}
    _t = [time.time()]

    def _mark(name: str) -> None:
        now = time.time()
        phase_t[name] = round(now - _t[0], 2)
        _t[0] = now

    # encode-stage rows are FAT (three parallel arrays, ~df_shard elements
    # each for head terms) — the default 10k-row Arrow batch balloons to
    # gigabytes per in-flight task.  Cap rows per batch for the build.
    _prev_batch = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "512")

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

    # the Arrow extract/analyze UDF is the dominant CPU cost; if the input
    # has fewer splits than cores (e.g. a few large parquet files), the
    # whole stage serializes on those splits — widen it first.  On a real
    # cluster the input normally has plenty of splits and this is a no-op.
    cores = spark.sparkContext.defaultParallelism
    if pages.rdd.getNumPartitions() < cores:
        pages = pages.repartition(cores * 2)
    # url rank from the RAW input (parquet column-prunes to a url-only
    # scan); joining it to the UDF output avoids both a second UDF
    # evaluation (range-partitioner sampling) and a heavy-side shuffle
    # (the id side broadcasts)
    ids, ids_parted = _rank_urls_handle(pages.select("url"))
    analyzed = analyze_pages(pages, analyzer=analyzer).join(ids, "url")
    analyzed = analyzed.persist()
    _mark("setup")

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
    # piggy-back the corpus stats (A5) on the docs-write action itself:
    # an Observation evaluates aggregates inside the write job, so
    # num_docs/total_tf/max_dl cost zero extra jobs and zero re-reads
    from pyspark.sql import Observation

    _stats_obs = Observation("corpus_stats")
    docs_out = docs.select(
        "doc_id", "url", "title", "doc_len", "pagerank", "numviews"
    ).observe(
        _stats_obs,
        F.count(F.lit(1)).cast("long").alias("num_docs"),
        F.sum("doc_len").cast("long").alias("total_tf"),
        F.max("doc_len").cast("long").alias("max_dl"),
    )
    # rebalance on write (guide §6): the docs table inherits the
    # parallelism-widened partitioning (cores x2 tiny files at bench,
    # unsized shards at scale); an AQE rebalance sizes output files by
    # bytes, and EVERY query's metadata join re-lists this table
    store.write_table(docs_out.hint("rebalance"), "docs")
    ids_parted.unpersist(blocking=False)
    _mark("analyze_and_docs")

    # ---- optional forward-index tables (A1 / S7) ------------------------
    if keep_doc_terms:
        exploded = analyzed.select(
            "doc_id", F.posexplode("tokens").alias("pos", "term")
        )
        doc_terms = exploded.groupBy("doc_id", "term").agg(
            F.count("*").cast("int").alias("tf")
        )
        store.write_table(doc_terms, "doc_terms")
    if keep_doc_tokens:
        # positional forward index (S7 analog): doc_id -> kept tokens in
        # position order; powers next-word suggestion (Q6)
        store.write_table(analyzed.select("doc_id", "tokens"), "doc_tokens")
    _mark("doc_terms_tables")

    # corpus stats arrive via the docs-write Observation (zero extra
    # jobs; they used to cost a docs re-read + agg + stats write + stats
    # re-read — 3 jobs for three scalars); the stats table itself is a
    # single row, written driver-side like the manifest.
    srow = {
        "num_docs": int(_stats_obs.get["num_docs"]),
        "total_tf": _stats_obs.get["total_tf"],
        "max_dl": _stats_obs.get["max_dl"],
    }
    import pyarrow as pa

    store.write_small_table(
        {
            "num_docs": [srow["num_docs"]],
            "total_tf": [srow["total_tf"]],
            "max_dl": [srow["max_dl"]],
        },
        "stats",
        pa.schema(
            [("num_docs", pa.int64()), ("total_tf", pa.int64()), ("max_dl", pa.int64())]
        ),
    )
    avg_dl = (srow["total_tf"] or 0) / max(1, srow["num_docs"])
    # packed-long layout guards (see PACK_BITS): pos < doc_len always, so
    # one corpus-max check covers both the position and doc_len fields
    if int(srow["max_dl"] or 0) >= (1 << PACK_BITS):
        raise ValueError(
            f"doc with {srow['max_dl']} tokens exceeds the 2^{PACK_BITS} "
            "packed-occurrence limit; raise PACK_BITS"
        )
    if int(srow["num_docs"]) >= MAX_DOC_ID:
        raise ValueError("corpus exceeds the 2^41 packed doc_id limit")
    _mark("stats")

    # ---- postings: doc-sharded, blocked, per-group resumable commits ---
    # SINGLE-SHUFFLE design with PACKED rows: the pipeline is explode ->
    # pack each occurrence into ONE int64 -> one groupBy(shard, term) ->
    # encode.  No intermediate (doc_id, term) aggregation, no cache of
    # 10^1x-row position arrays, no doc_len join — the occurrence stream
    # is shuffled exactly once, and what crosses the wire per occurrence
    # is 8 bytes (``doc_id << 22 | pos``) instead of a 3-field struct
    # (~40 B serialized).  doc_len ships once per (doc, term) as a
    # second packed long via collect_set, whose map-side partial
    # aggregation dedups the tf>1 repeats before the exchange.  Per-doc
    # tf/positions are reconstructed by numpy run-length splitting of the
    # sorted packed longs inside the Arrow encoder.
    occs = analyzed.select(
        "doc_id",
        F.size("tokens").alias("doc_len"),
        F.posexplode("tokens").alias("pos", "term"),
    )

    def group_slice(g: int):
        return occs.filter(
            (F.col("doc_id") % n_shards) % n_groups == g
        ).withColumn("shard", (F.col("doc_id") % F.lit(n_shards)).cast("int"))

    from websearchengine_spark.functions.codec import BLOCK_SIZE as _DEFAULT_BSZ
    from websearchengine_spark.functions.codec import DEFAULT_HEAD_FRAC

    _bsz = block_size if block_size is not None else _DEFAULT_BSZ
    _hfrac = head_frac if head_frac is not None else DEFAULT_HEAD_FRAC

    # Arrow type of the blocks column (mirrors POSTINGS_SCHEMA)
    import pyarrow as pa

    _BLOCKS_T = pa.list_(
        pa.struct(
            [
                ("first_docid", pa.int64()),
                ("last_docid", pa.int64()),
                ("n", pa.int32()),
                ("max_tf", pa.int32()),
                ("max_impact", pa.float64()),
                ("data", pa.binary()),
                ("head", pa.bool_()),
            ]
        )
    )

    def encode_batches(batches):
        # rows: (shard, term, occs[], dls[]) — ``occs`` is the sorted
        # packed-long occurrence list; ``dls`` the sorted packed-long
        # (doc_id, doc_len) set (positional builds) or empty (positionless
        # builds pack doc_len directly into each occurrence).  Arrow-
        # native (r6): each batch's list columns are ONE contiguous int64
        # buffer + offsets, so per-row arrays are zero-copy numpy slices
        # instead of pandas object cells (guide §4.2).  Varbyte bytes are
        # DEFERRED per block and encoded in ONE vectorized pass per batch
        # (varbyte_encode_many — byte-identical; the per-call numpy
        # overhead on block-sized arrays dominated the stage), and the
        # blocks column is built column-wise instead of list-of-dicts
        # (~20x cheaper conversion).
        import numpy as np
        import pyarrow as pa

        from websearchengine_spark.functions.codec import varbyte_encode_many

        for b in batches:
            shards = b.column(0).to_numpy()
            terms = b.column(1).to_pylist()
            occ_col, dl_col = b.column(2), b.column(3)
            occ_off = occ_col.offsets.to_numpy()
            occ_val = occ_col.values.to_numpy(zero_copy_only=True)
            dl_off = dl_col.offsets.to_numpy()
            dl_val = (
                dl_col.values.to_numpy(zero_copy_only=True)
                if len(dl_col.values)
                else np.empty(0, np.int64)
            )
            flat_blocks, n_blocks, dfs, ctfs = [], [], [], []
            for i in range(len(terms)):
                occ = occ_val[occ_off[i] : occ_off[i + 1]]
                d_all = occ >> PACK_BITS
                # run-length split of the (sorted) doc_id high bits
                change = np.empty(d_all.size, dtype=bool)
                change[0] = True
                np.not_equal(d_all[1:], d_all[:-1], out=change[1:])
                starts = np.flatnonzero(change)
                uniq = d_all[starts]
                counts = np.diff(np.append(starts, d_all.size))
                if positions:
                    dlp = dl_val[dl_off[i] : dl_off[i + 1]]
                    if dlp.size != uniq.size or not np.array_equal(
                        dlp >> PACK_BITS, uniq
                    ):
                        raise ValueError(
                            "packed doc_len set misaligned with occurrence "
                            "docs (PACK_BITS overflow?)"
                        )
                    dls = dlp & PACK_MASK
                    p = occ & PACK_MASK
                else:
                    dls = (occ & PACK_MASK)[starts]
                    p = None
                blocks = encode_posting_blocks(
                    uniq, counts, dls, p, avg_dl, block_size=_bsz,
                    head_frac=_hfrac, _defer_bytes=True,
                )
                flat_blocks.extend(blocks)
                n_blocks.append(len(blocks))
                dfs.append(int(uniq.size))
                ctfs.append(int(d_all.size))
            datas = varbyte_encode_many([blk[5] for blk in flat_blocks])
            offs = np.zeros(len(n_blocks) + 1, dtype=np.int32)
            np.cumsum(n_blocks, out=offs[1:])
            struct = pa.StructArray.from_arrays(
                [
                    pa.array([blk[0] for blk in flat_blocks], pa.int64()),
                    pa.array([blk[1] for blk in flat_blocks], pa.int64()),
                    pa.array([blk[2] for blk in flat_blocks], pa.int32()),
                    pa.array([blk[3] for blk in flat_blocks], pa.int32()),
                    pa.array([blk[4] for blk in flat_blocks], pa.float64()),
                    pa.array(datas, pa.binary()),
                    pa.array([blk[6] for blk in flat_blocks], pa.bool_()),
                ],
                names=[
                    "first_docid", "last_docid", "n", "max_tf",
                    "max_impact", "data", "head",
                ],
            )
            blocks_arr = pa.ListArray.from_arrays(pa.array(offs), struct)
            if blocks_arr.type != _BLOCKS_T:
                blocks_arr = blocks_arr.cast(_BLOCKS_T)
            yield pa.record_batch(
                {
                    "shard": pa.array(shards, pa.int32()),
                    "term": pa.array(terms, pa.string()),
                    "df_shard": pa.array(dfs, pa.int64()),
                    "ctf_shard": pa.array(ctfs, pa.int64()),
                    "blocks": blocks_arr,
                }
            )

    def plists_for(part):
        pk = F.shiftleft(F.col("doc_id"), PACK_BITS)
        if positions:
            return (
                part.select(
                    "shard",
                    "term",
                    (pk + F.col("pos")).alias("occ_p"),
                    (pk + F.col("doc_len")).alias("dl_p"),
                )
                .groupBy("shard", "term")
                .agg(
                    F.sort_array(F.collect_list("occ_p")).alias("occs"),
                    # one packed (doc_id, doc_len) per doc; collect_set's
                    # partial aggregation dedups tf>1 repeats MAP-SIDE, so
                    # the exchange carries ~df rows of it, not ~ctf
                    F.sort_array(F.collect_set("dl_p")).alias("dls"),
                )
            )
        # positionless: doc_len packs directly into each occurrence
        # (the pos field is dropped before the shuffle entirely)
        return (
            part.select("shard", "term", (pk + F.col("doc_len")).alias("occ_p"))
            .groupBy("shard", "term")
            .agg(F.sort_array(F.collect_list("occ_p")).alias("occs"))
            .withColumn("dls", F.array().cast("array<long>"))
        )

    num_docs = int(srow["num_docs"])

    def n_docs_in_group(g: int) -> int:
        # analytic: doc_ids are dense, shard = doc_id % n_shards
        return sum(
            (num_docs - s + n_shards - 1) // n_shards
            for s in range(g, n_shards, n_groups)
        )

    remaining = [g for g in range(n_groups) if g not in done]
    t_group_start = time.time()
    # Group metrics (n_postings/n_terms/max_term_postings) ride the
    # write actions as Observations — they used to cost a read-back +
    # agg + collect job per group (r6: zero extra jobs, same numbers,
    # recorded at commit time exactly as before).
    from pyspark.sql import Observation

    if remaining and not done:
        # FRESH build: all groups from ONE explode + ONE (shard, term)
        # shuffle + ONE dynamic-partitioned write, instead of n_groups
        # sequential jobs that each rescan the token stream (r6: at
        # n_groups=2 this halves the wide work; the shuffle key and the
        # per-group bytes are unchanged — group = shard % n_groups is
        # attached after encoding).  Group dirs are still moved into
        # place and committed individually; a crash mid-write leaves the
        # manifest untouched.  Interrupted builds resume below on the
        # per-group path, whose bytes are identical (resume test).
        part = occs.withColumn(
            "shard", (F.col("doc_id") % F.lit(n_shards)).cast("int")
        )
        postings = plists_for(part).mapInArrow(
            encode_batches, schema=POSTINGS_SCHEMA
        ).withColumn("group", (F.col("shard") % F.lit(n_groups)).cast("int"))
        gm_obs = Observation("group_metrics")
        obs_exprs = []
        for g in range(n_groups):
            in_g = F.col("group") == g
            obs_exprs += [
                F.sum(F.when(in_g, F.col("df_shard"))).alias(f"np_{g}"),
                F.count(F.when(in_g, F.lit(1))).alias(f"nt_{g}"),
                F.max(F.when(in_g, F.col("ctf_shard"))).alias(f"mx_{g}"),
            ]
        postings = postings.observe(gm_obs, *obs_exprs)
        # sort by (group, term): the partition-column prefix satisfies
        # the dynamic-partition writer's required ordering (no extra
        # sort gets inserted) and keeps term-sorted row groups so the
        # `term IN (...)` query filter prunes on parquet min/max stats
        postings = postings.sortWithinPartitions("group", "term")
        store.write_partitions_atomic(postings, "postings", "group", range(n_groups))
        gmv = gm_obs.get
        elapsed_all = round(time.time() - t_group_start, 3)
        for g in range(n_groups):
            store.mark_group_complete(
                g,
                {
                    "build_id": build_id,
                    "n_postings": int(gmv[f"np_{g}"] or 0),
                    "n_terms": int(gmv[f"nt_{g}"] or 0),
                    "n_docs": n_docs_in_group(g),
                    "max_term_postings": int(gmv[f"mx_{g}"] or 0),
                    "n_shards_in_group": len(range(g, n_shards, n_groups)),
                    # one combined job built every group; per-group walls
                    # are not separable on this path
                    "elapsed_sec": elapsed_all,
                },
            )
    else:
        for g in remaining:
            postings = plists_for(group_slice(g)).mapInArrow(
                encode_batches, schema=POSTINGS_SCHEMA
            )
            obs = Observation(f"group_metrics_{g}_{build_id}")
            postings = postings.observe(
                obs,
                F.sum("df_shard").alias("np"),
                F.count(F.lit(1)).alias("nt"),
                F.max("ctf_shard").alias("mx"),
            )
            # term-sorted row groups => parquet min/max stats prune
            # query-term scans (`term IN (...)` skips whole row groups)
            postings = postings.sortWithinPartitions("term")
            store.write_partition(postings, "postings", "group", g)
            gmv = obs.get
            store.mark_group_complete(
                g,
                {
                    "build_id": build_id,
                    "n_postings": int(gmv["np"] or 0),
                    "n_terms": int(gmv["nt"] or 0),
                    "n_docs": n_docs_in_group(g),
                    "max_term_postings": int(gmv["mx"] or 0),
                    "n_shards_in_group": len(range(g, n_shards, n_groups)),
                    "elapsed_sec": time.time() - t_group_start,
                },
            )
            t_group_start = time.time()

    _mark("postings_groups")
    postings_all = store.read_partitioned(spark, "postings")

    # ---- global term stats (A3/A4) from the per-shard postings ---------
    # df/ctf are additive across doc-shards, so this is a tiny aggregation
    # over the (vocab x shards)-row postings table — no token rescan.
    # Term-sorted SMALL row groups on disk: the table is the term
    # DICTIONARY; with rows sorted by term inside each file and ~1 MB
    # row groups, a k-term lookup (storage.lookup_rows / the Spark
    # fallback's `term IN` filter) prunes on parquet min/max stats to
    # at most one row group per file — bounded work at any vocabulary
    # size, without paying a range-repartition (sampling + exchange)
    # job at build time.
    term_stats = (
        postings_all.groupBy("term")
        .agg(
            F.sum("df_shard").cast("long").alias("df"),
            F.sum("ctf_shard").cast("long").alias("ctf"),
        )
        .sortWithinPartitions("term")
    )
    store.write_table(
        term_stats, "term_stats", options={"parquet.block.size": str(1 << 20)}
    )
    _mark("term_stats")

    if spell_assist:
        # persisted bigram->terms assist table (reference utils/
        # AssistantIndexBuilder.java:117-161): /prediction then scans
        # the target's bigram row groups, not the whole vocabulary
        from websearchengine_spark.operators.spell import build_spell_assist

        build_spell_assist(spark, store)
        _mark("spell_assist")

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
        # n_groups rows of driver-known scalars: write driver-side (a
        # Spark job per build for a few hundred bytes is pure overhead)
        import pyarrow as pa

        store.write_small_table(
            {k: [row[k] for row in meta_rows] for k in meta_rows[0]},
            "build_meta",
            pa.schema(
                [
                    ("grp", pa.int64()),
                    ("build_id", pa.string()),
                    ("n_postings", pa.int64()),
                    ("n_terms", pa.int64()),
                    ("n_docs", pa.int64()),
                    ("elapsed_sec", pa.float64()),
                ]
            ),
        )
    store.finalize_snapshot(
        {
            "n_shards": n_shards,
            "n_groups": n_groups,
            "build_id": build_id,
            "analyzer": analyzer,
            "avg_dl": avg_dl,
            "num_docs": int(srow["num_docs"]),
            "total_tf": int(srow["total_tf"]),
            "positions": positions,
            "head_frac": _hfrac,
            "spell_assist": bool(spell_assist),
            "phase_timings_sec": phase_t,
        }
    )
    analyzed.unpersist()
    if _prev_batch is not None:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", _prev_batch)
    else:
        spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
    return store
