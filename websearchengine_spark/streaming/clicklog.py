"""Click/query-log ingestion and session analytics — the Structured
Streaming re-expression of the reference's serve-time log machinery
(SURVEY.md §2.10):

  Q5 click logging  — reference: synchronized TSV append + sqljet tables
     (ClickLoggingManager.java:40-45, LogDBManager.java:18-48)
     -> here: ``readStream`` over the click-event source, watermarked,
     appended to a partitioned parquet table (exactly-once via
     checkpointed file sink).

  Q4 session suggestion (PMI) — reference: wall-clock 60s session pairing
     (SessionHandler.java:18-19,237-292):
     queries q1,q2 from the same session within 60s form a pair;
     pmi = log(f_pair / (f_q1 * f_q2) + 1); top-3 with pmi > 0
     -> here: a windowed/lag batch job over the accumulated log (the
     same DataFrame code serves foreachBatch in streaming mode).

Event schema (reference TSV: session \\t query \\t did \\t action \\t ts):
    clicks(session_id string, query string, doc_id long, action string,
           ts timestamp)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

CLICK_SCHEMA = (
    "session_id string, query string, doc_id long, action string, ts timestamp"
)

SESSION_WINDOW_SEC = 60  # SessionHandler.java:18


def start_click_ingest(
    spark: SparkSession,
    source_dir: str,
    table_dir: str,
    checkpoint_dir: str,
    watermark: str = "10 minutes",
):
    """Streaming append of click events to a date-partitioned table.

    File-source -> watermark -> parquet sink with checkpoint (restart-
    safe exactly-once for the file sink). Returns the StreamingQuery.
    """
    src = (
        spark.readStream.schema(CLICK_SCHEMA)
        .json(source_dir)
        .withWatermark("ts", watermark)
        .withColumn("dt", F.to_date("ts"))
    )
    return (
        src.writeStream.format("parquet")
        .option("path", table_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("dt")
        .trigger(availableNow=True)
        .start()
    )


def streaming_query_counts(
    spark: SparkSession, source_dir: str, watermark: str = "10 minutes"
):
    """Windowed per-query counts with late-data handling — the streaming
    form of the reference's ``querycount`` table.  Memory-sink friendly
    for tests; swap the sink for parquet/kafka in production."""
    src = spark.readStream.schema(CLICK_SCHEMA).json(source_dir)
    return (
        src.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 minute"), "query")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("window.start").alias("win_start"),
            "query",
            "n",
        )
    )


def session_query_pairs(clicks: DataFrame) -> DataFrame:
    """Q4 pair extraction: consecutive queries in one session <= 60s
    apart (distinct adjacent queries), one pair row per occurrence."""
    w = Window.partitionBy("session_id").orderBy("ts")
    q = clicks.select("session_id", "query", "ts").withColumn(
        "prev_q", F.lag("query").over(w)
    ).withColumn("prev_ts", F.lag("ts").over(w))
    return (
        q.filter(
            F.col("prev_q").isNotNull()
            & (F.col("prev_q") != F.col("query"))
            & (
                F.unix_timestamp("ts") - F.unix_timestamp("prev_ts")
                <= SESSION_WINDOW_SEC
            )
        )
        .select(F.col("prev_q").alias("q1"), F.col("query").alias("q2"))
    )


def pmi_suggestions(clicks: DataFrame, top_n: int = 3) -> DataFrame:
    """Q4: for each query q1, the top-N q2 by
    pmi = log(f_pair/(f_q1*f_q2) + 1), pmi > 0 (SessionHandler.java:237-292).

    Pure aggregations + a ranking window; usable as-is inside
    ``foreachBatch`` for continuous refresh.
    """
    freq = clicks.groupBy("query").agg(F.count("*").alias("f"))
    pairs = session_query_pairs(clicks).groupBy("q1", "q2").agg(
        F.count("*").alias("f_pair")
    )
    j = (
        pairs.join(freq.withColumnRenamed("query", "q1").withColumnRenamed("f", "f1"), "q1")
        .join(freq.withColumnRenamed("query", "q2").withColumnRenamed("f", "f2"), "q2")
        .withColumn(
            "pmi", F.log(F.col("f_pair") / (F.col("f1") * F.col("f2")) + 1.0)
        )
        .filter(F.col("pmi") > 0.0)
    )
    w = Window.partitionBy("q1").orderBy(F.desc("pmi"), F.asc("q2"))
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_n)
        .select("q1", "q2", F.round("pmi", 9).alias("pmi"), "rn")
    )


def history_suggestions(clicks: DataFrame, query: str, top_n: int = 10) -> DataFrame:
    """Serve-time history match (querySearch 'history' branch,
    IndexerInvertedOccurrence.java:830-840): distinct past queries whose
    text case-insensitively CONTAINS the current query, most frequent
    first."""
    q = query.lower()
    return (
        clicks.filter(F.lower(F.col("query")).contains(q))
        .groupBy("query")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("query"))
        .limit(top_n)
    )
