"""TSV corpus and log-file sources (S3/S4 of SURVEY.md §2.1).

S3: the HW1 ``corpus.tsv`` — one document per line,
``title \\t body \\t numviews`` (IndexerFullScan.java:67-125); doc_id is
the LINE NUMBER.  Preserving line order distributedly uses the same
two-phase trick as url ranking: per-file, per-partition offsets over
(file, line-offset) sort keys.

S4: Wikipedia pageview logs — ``lang article views`` space-separated
(LogMinerNumviews.java:60-73); malformed lines pass through here and are
filtered by the miner (operators/graph.numviews), matching the
reference's skip rules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_tsv_corpus(spark: SparkSession, path: str) -> DataFrame:
    """corpus.tsv -> (doc_id, title, body, numviews), doc_id = line number.

    Line numbering uses ``zipWithIndex`` — the one deliberate RDD use in
    the engine: it is the canonical distributed line-number primitive
    (per-partition counts, then offset + local index; one tiny extra
    job), with guaranteed input order, where a Window over a constant
    sort key would rely on unspecified ordering."""
    rdd = spark.read.text(path).rdd.zipWithIndex()
    df = rdd.map(lambda x: (x[1], x[0]["value"])).toDF(["doc_id", "value"])
    parts = F.split("value", "\t")
    return df.select(
        F.col("doc_id").cast("long"),
        parts.getItem(0).alias("title"),
        parts.getItem(1).alias("body"),
        parts.getItem(2).cast("long").alias("numviews"),
    )


def load_pageview_log(spark: SparkSession, path: str) -> DataFrame:
    """Pageview dump -> (lang, article, views:string).

    ``views`` stays a string: the miner validates ``^\\d+$`` itself, as
    the reference does (malformed third fields are its concern)."""
    parts = F.split("value", " ")
    # F.get returns NULL for missing fields (ANSI mode would throw on
    # short lines; the miner's filters drop the NULLs)
    return spark.read.text(path).select(
        F.get(parts, 0).alias("lang"),
        F.get(parts, 1).alias("article"),
        F.get(parts, 2).alias("views"),
    )
