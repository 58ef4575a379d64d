"""Small shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen_for_explode(df: DataFrame) -> DataFrame:
    """Parallelism guard for explode-amplifying scans.

    Spark sizes scan partitions by INPUT bytes
    (spark.sql.files.maxPartitionBytes), but shingling/tokenizing does
    work proportional to the post-explode volume — a 100x row
    amplification behind a small or single-file input serializes the
    whole explode+hash stage on a handful of cores.  The fix costs one
    exchange of the (tiny) pre-explode rows.  No-op when the input
    already has at least one split per core — the normal case at scale,
    where this never fires.
    """
    cores = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < cores:
        return df.repartition(cores)
    return df
