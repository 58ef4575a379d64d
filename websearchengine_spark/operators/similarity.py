"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k is the exact baseline; the scale paths are
sign-LSH bucketing (hash join instead of cross join) and an IVF-style
coarse quantizer (search only the closest partitions).  All math is
native higher-order functions (zip_with/aggregate) — JVM-side, no
Python.

Scale notes: brute force is O(N) per query but embarrassingly parallel
and shuffle-free (a scan + TakeOrderedAndProject); IVF cuts the scanned
fraction to nprobe/nlist ONLY when the assignment is computed once and
persisted partitioned by ``list_id`` (``ivf_write_index``) — a query
then partition-prunes to the nprobe lists it probes.  Assigning at
query time would re-scan 100% of the vectors per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from websearchengine_spark.operators.dedup import _drop_hot_buckets


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, v: s + v * v))


def _as_double(col):
    return col.cast("array<double>")


def cosine_topk(
    emb: DataFrame, query_vec: list[float], k: int = 10, id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k: (id, cosine), tie-break id asc."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    v = _as_double(F.col(vec_col))
    return (
        emb.select(
            F.col(id_col),
            (_dot(v, q) / (_norm(v) * _norm(q))).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def lsh_bucket(
    emb: DataFrame, n_planes: int = 8, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, bucket): sign-LSH over deterministic pseudo-random hyperplanes.

    Plane p's weight for dimension i is a fixed hash of (i, p) — no
    stored model, reproducible everywhere (including in plain SQL).
    """
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


def cosine_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exhaustive: bool = False,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, cosine) with
    cosine >= threshold and id_a < id_b.

    Scale path (default): candidates come from a sign-LSH BUCKET JOIN
    (vectors agreeing on all n_planes hyperplane signs), then exact
    cosine verifies within buckets — pairwise work is confined to
    buckets, never all-pairs.  Recall is governed by n_planes (each
    plane halves the bucket; a near-dup pair at cosine c agrees on one
    plane with prob 1 - arccos(c)/pi).  ``exhaustive=True`` switches to
    the all-pairs self-join — the oracle path for tests/small data.

    ``max_bucket_size`` is OPT-IN (see dedup.DEFAULT_MAX_BUCKET_SIZE
    note): sign buckets are 2^n_planes coarse partitions whose size
    grows with corpus size — a default cap would silently drop distinct
    vectors past ~cap * 2^n_planes rows.  Scale n_planes with the
    corpus instead (buckets halve per plane), and cap only when a
    degenerate embedding cluster is known to exist.
    """
    v = _as_double(F.col(vec_col))
    base = emb.select(F.col(id_col).alias("_id"), v.alias("_v"))
    if exhaustive:
        cand = (
            base.alias("a")
            .crossJoin(base.alias("b"))
            .filter(F.col("a._id") < F.col("b._id"))
        )
    else:
        buckets = lsh_bucket(emb, n_planes=n_planes, id_col=id_col, vec_col=vec_col)
        bb = base.join(buckets, base["_id"] == buckets[id_col]).select(
            "_id", "_v", "bucket"
        )
        if max_bucket_size is not None:
            bb = _drop_hot_buckets(bb, ["bucket"], max_bucket_size, "cosine_lsh")
        cand = (
            bb.alias("a")
            .join(bb.alias("b"), "bucket")
            .filter(F.col("a._id") < F.col("b._id"))
        )
    cos = _dot(F.col("a._v"), F.col("b._v")) / (
        _norm(F.col("a._v")) * _norm(F.col("b._v"))
    )
    return (
        cand.select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        .orderBy("id_a", "id_b")
    )


def ivf_build_centroids(
    emb: DataFrame, nlist: int = 8, id_col: str = "vec_id", vec_col: str = "embedding"
) -> list[list[float]]:
    """Deterministic coarse quantizer: centroids = mean of each residue
    class (id % nlist) — one aggregation, no iterative k-means (the
    assignment structure, not clustering quality, is what the engine
    path exercises; swap in k-means|| offline for production)."""
    n_dim = len(emb.select(vec_col).first()[0])
    agg = (
        emb.select((F.col(id_col) % nlist).alias("c"), _as_double(F.col(vec_col)).alias("v"))
        .groupBy("c")
        .agg(
            F.array(
                *[F.avg(F.element_at("v", i + 1)) for i in range(n_dim)]
            ).alias("centroid")
        )
        .orderBy("c")
        .collect()
    )
    return [list(r["centroid"]) for r in agg]


def ivf_assign(
    emb: DataFrame, centroids: list[list[float]], id_col: str = "vec_id",
    vec_col: str = "embedding", round_dots: int | None = None,
) -> DataFrame:
    """(id, list_id): nearest centroid by dot product (broadcast arith).

    ``round_dots``: round each centroid dot product to this many decimal
    places before the argmax — makes the assignment reproducible across
    engines whose float summation order differs (used by the driver
    oracle contract; irrelevant to recall)."""
    v = _as_double(F.col(vec_col))

    def _s(c):
        d = _dot(v, F.array(*[F.lit(float(x)) for x in c]))
        return F.round(d, round_dots) if round_dots is not None else d

    scores = [_s(c).alias(f"_s{i}") for i, c in enumerate(centroids)]
    scored = emb.select(F.col(id_col), *scores)
    arr = F.array(*[F.col(f"_s{i}") for i in range(len(centroids))])
    return scored.select(
        id_col,
        (F.array_position(arr, F.array_max(arr)) - 1).cast("int").alias("list_id"),
    )


def _probe_lists(
    centroids: list[list[float]], query_vec: list[float], nprobe: int,
    round_dots: int | None = None,
) -> list[int]:
    """The nprobe centroid ids closest to the query (dot product, ties by id)."""
    import numpy as np

    q = np.asarray(query_vec, dtype=float)
    sims = [float(np.dot(q, np.asarray(c))) for c in centroids]
    if round_dots is not None:
        sims = [round(s, round_dots) for s in sims]
    return sorted(range(len(centroids)), key=lambda i: (-sims[i], i))[:nprobe]


def ivf_write_index(
    emb: DataFrame,
    centroids: list[list[float]],
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dots: int | None = None,
) -> None:
    """Assign ONCE and persist partitioned by ``list_id``.

    This is the index-build step: one full scan total, amortized over
    every subsequent query.  The partitioned layout is what lets
    ``ivf_topk_indexed`` touch only nprobe/nlist of the files."""
    assigned = ivf_assign(emb, centroids, id_col, vec_col, round_dots)
    (
        emb.join(assigned, id_col)
        .write.partitionBy("list_id")
        .mode("overwrite")
        .parquet(path)
    )


def ivf_topk_indexed(
    spark: SparkSession,
    index_path: str,
    centroids: list[list[float]],
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dots: int | None = None,
) -> DataFrame:
    """IVF search over a persisted index: the ``list_id IN probe`` filter
    is a PARTITION filter on the parquet layout, so the scan reads only
    the nprobe probed lists — nprobe/nlist of the data, per query."""
    probe = _probe_lists(centroids, query_vec, nprobe, round_dots)
    subset = spark.read.parquet(index_path).filter(F.col("list_id").isin(probe))
    return cosine_topk(subset, query_vec, k, id_col, vec_col)


def ivf_topk(
    emb: DataFrame,
    centroids: list[list[float]],
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assigned: DataFrame | None = None,
) -> DataFrame:
    """IVF search against an in-memory DataFrame.

    Pass ``assigned`` (the cached/persisted output of ``ivf_assign``) to
    avoid recomputing nearest-centroid for every vector on every query.
    Without it this is a one-off convenience that scans the full table —
    use ``ivf_write_index`` + ``ivf_topk_indexed`` for the scale path
    (partition-pruned reads)."""
    probe = _probe_lists(centroids, query_vec, nprobe)
    if assigned is None:
        assigned = ivf_assign(emb, centroids, id_col, vec_col)
    subset = emb.join(assigned.filter(F.col("list_id").isin(probe)), id_col)
    return cosine_topk(subset, query_vec, k, id_col, vec_col)
