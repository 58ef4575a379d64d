"""End-to-end web-corpus cleaning pipeline for LLM training data.

``clean_corpus`` composes the individually-tested pipeline stages
(URL dedup -> PII redaction -> boilerplate line removal ->
repeated-window scrub -> Gopher quality filter -> near-dup collapse ->
train/val/test split) into one call with a per-document audit trail —
the C4/RefinedWeb-family recipe expressed as a single Spark lineage.

Reference parity note: the reference engine (owwlo/WebSearchEngine) has
no corpus-cleaning tier; this module is part of the training-data
extension mandated for the Spark port (SURVEY.md "beyond the
reference" items), built entirely from this repo's own stage
operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from websearchengine_spark.operators.dedup import (
    duplicate_clusters,
    minhash_lsh_pairs,
    scrub_repeated_ngrams,
)
from websearchengine_spark.operators.textstats import (
    gopher_stats,
    pii_redact,
    split_exprs,
    strip_boilerplate,
)

#: status values, in the order the stages run — a doc's status is the
#: FIRST stage that dropped it (later stages never see it)
STATUSES = ("url_dup", "quality", "near_dup", "kept")


def clean_corpus(
    docs: DataFrame,
    url_col: str | None = "url",
    text_col: str = "text",
    id_col: str = "doc_id",
    boilerplate_min_docs: int = 10,
    scrub_n: int | None = 8,
    scrub_min_count: int = 2,
    quality: bool = True,
    near_dup: str | None = "exact",
    minhash_kwargs: dict | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Run the full cleaning pipeline; return one row per INPUT doc:

      (doc_id, status, text, n_pii, n_boilerplate, n_scrubbed,
       bucket, split)

    ``status`` is 'kept' or the first stage that dropped the doc
    ('url_dup' | 'quality' | 'near_dup').  ``text`` is the fully
    cleaned text for every doc that survived the URL stage (dropped-
    for-quality docs keep their cleaned text too — useful for filter
    auditing); NULL for url_dup drops, which never enter the text
    stages.  ``split``/``bucket`` are assigned only to kept docs.

    Stage order (the standard pipeline ordering, each reason noted):

    1. URL dedup (skipped when ``url_col`` is None or absent): crawl-
       level exact dedup is the cheapest filter, so it runs first;
       smallest doc_id per normalized URL wins, NULL-url docs pass.
    2. PII redaction (C4): a pure map; runs before line dedup so that
       redaction-equalized lines (the same <EMAIL> boilerplate in
       every footer) are visible to stage 3.
    3. Boilerplate line removal (RefinedWeb/CCNet): corpus-level, so
       its ``min_docs`` threshold counts only URL-surviving docs.
    4. Repeated-window scrub (Lee et al. ExactSubstr family; skipped
       when ``scrub_n`` is None): runs after line dedup so it spends
       its windows on genuine content repeats, not nav bars.
    5. Gopher quality filter (Rae et al. A1): evaluated on the CLEANED
       text — a doc that is all boilerplate should fail n_words here,
       not sneak through on its raw length.
    6. Near-dup collapse: 'exact' groups by md5 of the cleaned text
       (cleaning first is what makes exact matching effective —
       PII/boilerplate variance is already gone); 'minhash' runs
       MinHash-LSH candidate pairs -> connected components -> keep the
       cluster's min doc_id (NOTE: component-finding iterates with
       localCheckpoint, so this mode runs Spark jobs EAGERLY); None
       skips.  Smallest doc_id per group is kept.
    7. Deterministic hash split (train/val/test) over kept docs.

    Scale shape: every stage is the already-audited linear plan of its
    underlying operator; the per-doc counters are threaded through
    doc_id-keyed joins (co-partitioned with the rebuild aggregations
    that precede them); the exact-dup keeper is a window-min (one
    shuffle) and the split a pure projection, so neither fans the
    lineage out further.  What remains is the quality join: the
    cleaned-text frame feeds both gopher_stats and the output row, and
    gopher_stats itself reads its input twice (features + top-2gram
    argmax join), so the pure lazy DAG re-derives the cleaning chain
    ~3x — at real corpus sizes pass ``checkpoint_dir`` to materialize
    the post-scrub frame to parquet once (a resumable barrier, the
    standard intermediate-dataset pattern) and make those reads scans;
    at test sizes the pure DAG is fine.
    """
    if near_dup not in (None, "exact", "minhash"):
        raise ValueError(f"near_dup must be None|'exact'|'minhash', got {near_dup!r}")
    d0 = docs
    if id_col != "doc_id":
        d0 = d0.withColumnRenamed(id_col, "doc_id")

    # -- 1. URL dedup ------------------------------------------------
    # same keeper rule as url_dedup (min doc_id per normalized URL,
    # NULL urls pass) but as a window-min — one shuffle on the URL key
    # with no group-join back and one fewer reference of the input
    if url_col is not None and url_col in d0.columns:
        from pyspark.sql import Window

        from websearchengine_spark.operators.textstats import normalize_url

        with_key = d0.filter(F.col(url_col).isNotNull()).select(
            "doc_id", normalize_url(F.col(url_col)).alias("norm_url")
        )
        uw = Window.partitionBy("norm_url")
        url_losers = (
            with_key.withColumn("_keep", F.min("doc_id").over(uw))
            .filter(F.col("doc_id") != F.col("_keep"))
            .select("doc_id")
        )
        survivors = d0.join(url_losers, "doc_id", "anti")
    else:
        url_losers = None
        survivors = d0

    # -- 2-4. text transforms (PII -> boilerplate -> scrub) ----------
    # NULL text = empty doc (without this, pii_redact's regex counts
    # come back NULL and the doc's audit counters go NULL instead of 0)
    survivors = survivors.withColumn(
        text_col, F.coalesce(F.col(text_col), F.lit(""))
    )
    red = pii_redact(survivors, text_col=text_col)
    pii_counts = red.select(
        "doc_id",
        (F.col("n_emails") + F.col("n_ipv4") + F.col("n_phones")).alias("n_pii"),
    )
    cleaned = strip_boilerplate(
        red.select("doc_id", F.col("redacted").alias(text_col)),
        text_col=text_col,
        min_docs=boilerplate_min_docs,
    ).withColumnRenamed("n_removed", "n_boilerplate")
    if scrub_n is not None:
        scrubbed = scrub_repeated_ngrams(
            cleaned.select("doc_id", text_col),
            n=scrub_n,
            min_count=scrub_min_count,
            text_col=text_col,
        ).withColumnRenamed("n_removed", "n_scrubbed")
        cleaned = scrubbed.join(
            cleaned.select("doc_id", "n_boilerplate"), "doc_id"
        )
    else:
        cleaned = cleaned.withColumn("n_scrubbed", F.lit(0).cast("long"))
    cleaned = cleaned.join(pii_counts, "doc_id")

    if checkpoint_dir is not None:
        cleaned.write.mode("overwrite").parquet(checkpoint_dir)
        cleaned = docs.sparkSession.read.parquet(checkpoint_dir)

    # -- 5. quality filter on the cleaned text -----------------------
    if quality:
        qpass = gopher_stats(cleaned, text_col=text_col).select(
            "doc_id", F.col("gopher_pass").cast("boolean").alias("_qpass")
        )
        staged = cleaned.join(qpass, "doc_id")
    else:
        staged = cleaned.withColumn("_qpass", F.lit(True))

    # -- 6. near-dup collapse over quality survivors -----------------
    # 'exact' marks losers with a window-min over (qpass, text-hash)
    # instead of a keeper self-join: the join form re-references the
    # whole cleaned lineage twice more, and (without a checkpoint)
    # Spark RECOMPUTES the chain per reference — the window costs one
    # shuffle and zero extra lineage fan-out.  Quality-failed rows get
    # a _dup mark of their own partition too, but status checks
    # 'quality' first so it never surfaces.
    if near_dup == "exact":
        from pyspark.sql import Window

        key = F.md5(F.encode(text_col, "UTF-8"))
        w = Window.partitionBy(F.col("_qpass"), key)
        marked = staged.withColumn(
            "_dup", F.col("_qpass") & (F.col("doc_id") != F.min("doc_id").over(w))
        )
    elif near_dup == "minhash":
        pairs = minhash_lsh_pairs(
            staged.filter(F.col("_qpass")).select("doc_id", text_col),
            text_col=text_col,
            **(minhash_kwargs or {}),
        )
        clusters = duplicate_clusters(pairs)  # eager: iterative jobs
        dup_losers = clusters.filter(
            F.col("doc_id") != F.col("cluster_id")
        ).select("doc_id")
        marked = staged.join(
            dup_losers.withColumn("_dup", F.lit(True)), "doc_id", "left"
        ).withColumn("_dup", F.coalesce(F.col("_dup"), F.lit(False)))
    else:
        marked = staged.withColumn("_dup", F.lit(False))

    status = (
        F.when(~F.col("_qpass"), F.lit("quality"))
        .when(F.col("_dup"), F.lit("near_dup"))
        .otherwise(F.lit("kept"))
    )
    # split assignment is a pure projection — inline it (a hash_split
    # join back onto this lineage would fan the chain out again)
    bucket, split = split_exprs()
    kept = status == F.lit("kept")
    out = marked.withColumn("status", status).select(
        "doc_id", "status", text_col, "n_pii", "n_boilerplate", "n_scrubbed",
        F.when(kept, bucket).alias("bucket"),
        F.when(kept, split).alias("split"),
    )
    if url_losers is not None:
        out = out.unionByName(
            url_losers.select(
                "doc_id",
                F.lit("url_dup").alias("status"),
                F.lit(None).cast("string").alias(text_col),
                F.lit(None).cast("long").alias("n_pii"),
                F.lit(None).cast("long").alias("n_boilerplate"),
                F.lit(None).cast("long").alias("n_scrubbed"),
                F.lit(None).cast("long").alias("bucket"),
                F.lit(None).cast("string").alias("split"),
            )
        )
    if id_col != "doc_id":
        out = out.withColumnRenamed("doc_id", id_col)
    return out
