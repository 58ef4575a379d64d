"""HW1 full-scan rankers (R4-R9) over the TSV corpus — SURVEY.md §2.8.

Reference input (S3): ``corpus.tsv`` lines ``title \\t body \\t numviews``
(IndexerFullScan.java:67-125); doc_id = line number.  Tokens are RAW
whitespace splits — no lowercasing, no stemming (readTermVector,
IndexerFullScan.java:131-151).  Corpus stats:

  * ctf(term) counts title+body occurrences; total_tf likewise
    (updateStatistics :160-166)
  * df(term)  counts docs where term is in title OR body (:117-123)
  * the rankers' per-doc tf / doc length use BODY tokens only
    (SignalFactory.java getConvertedBodyTokens)

Rankers (each scores ALL docs, then sort desc + truncate —
RankerFullScan.java:25-36; tie order = doc_id asc, matching the
reference's stable reverse sort):

  R4 ql:       exp(sum_q log(0.5*tf_b/len_b + 0.5*ctf/total_tf))
               (qlRunner, SignalFactory.java:14-88)
  R5 cosine:   tf-idf cosine with n = N+1 and the query counted as an
               extra document: each query occurrence of t adds +1 to
               df(t); a query term ABSENT from the doc gets df' = its
               query count only (updateDf, SignalFactory.java:265-277)
  R6 phrase:   if |q|>1: bigram-overlap count (adjacent-token string
               concat), else unigram tf (phraseRunner :112-180)
  R7 linear:   1.0*cosine + 10.0*ql + 0.001*phrase + 0.01*log(nv+1)
               (linearRunner :182-222)
  R8 fullscan: 1.0 if any TITLE token equals any query token
               (RankerFullScan.java:38-61)
  R9 numviews: log(nv+1) (numViewRunner :90-110)

Spark shape: everything is native column expressions + joins over a
prepared ``corpus_fs`` (doc-term long tables built once); per-query work
touches only the query's terms plus per-doc precomputed norms — the
cosine norm uses the base-norm + overlap-delta trick so no full per-doc
recomputation happens per query.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def prepare_fullscan(docs_fs: DataFrame) -> dict:
    """Precompute stats tables from (doc_id, title, body, numviews).

    Returns dict of DataFrames + scalars used by the scorers.
    """
    base = docs_fs.select(
        "doc_id",
        "numviews",
        F.split(F.trim("title"), r"\s+").alias("title_tokens"),
        F.split(F.trim("body"), r"\s+").alias("body_tokens"),
    ).withColumn(
        "title_tokens", F.filter("title_tokens", lambda t: t != "")
    ).withColumn(
        "body_tokens", F.filter("body_tokens", lambda t: t != "")
    )
    base = base.persist()

    body_terms = (
        base.select("doc_id", F.explode("body_tokens").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    ).persist()
    all_terms = base.select(
        "doc_id", F.explode(F.concat("title_tokens", "body_tokens")).alias("term")
    )
    term_stats = all_terms.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df"), F.count("*").alias("ctf")
    ).persist()
    scal = base.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size("title_tokens") + F.size("body_tokens")).alias("total_tf"),
    ).collect()[0]
    doc_len = base.select("doc_id", F.size("body_tokens").alias("body_len"))
    return {
        "base": base,
        "body_terms": body_terms,
        "term_stats": term_stats,
        "doc_len": doc_len,
        "n_docs": int(scal["n_docs"]),
        "total_tf": int(scal["total_tf"]),
    }


def _query_tokens(query: str) -> list[str]:
    return query.split()


def _qinfo_df(spark: SparkSession, prep: dict, qtokens: list[str]) -> DataFrame:
    counts = Counter(qtokens)
    qdf = spark.createDataFrame(
        [(t, int(c)) for t, c in counts.items()], "term string, qtf int"
    )
    return F.broadcast(
        qdf.join(prep["term_stats"], "term", "left").select(
            "term",
            "qtf",
            F.coalesce("df", F.lit(0)).alias("df"),
            F.coalesce("ctf", F.lit(0)).alias("ctf"),
        )
    )


def score_ql_fullscan(spark, prep, query: str) -> DataFrame:
    """R4 -> (doc_id, score) for ALL docs."""
    qtokens = _query_tokens(query)
    qinfo = _qinfo_df(spark, prep, qtokens)
    total_tf = float(prep["total_tf"])
    matched = (
        prep["body_terms"]
        .join(qinfo, "term")
        .join(prep["doc_len"], "doc_id")
        .withColumn(
            "_lp",
            F.col("qtf")
            * (
                F.log(
                    0.5 * F.col("tf") / F.col("body_len")
                    + 0.5 * F.col("ctf") / F.lit(total_tf)
                )
                - F.log(0.5 * F.col("ctf") / F.lit(total_tf))
            ),
        )
        .groupBy("doc_id")
        .agg(F.sum("_lp").alias("_adj"))
    )
    # base score for a doc with zero matches: sum_q qtf*log(0.5*ctf/totalTF)
    base_row = qinfo.select(
        F.sum(F.col("qtf") * F.log(0.5 * F.col("ctf") / F.lit(total_tf))).alias("b")
    ).collect()[0]
    base_const = base_row["b"]  # None (=> -inf path) if some ctf == 0
    if base_const is None:
        # a query term never occurs in the corpus: every doc scores exp(-inf)=0
        return prep["doc_len"].select("doc_id", F.lit(0.0).alias("score"))
    return (
        prep["doc_len"]
        .join(matched, "doc_id", "left")
        .select(
            "doc_id",
            F.exp(F.coalesce("_adj", F.lit(0.0)) + F.lit(float(base_const))).alias("score"),
        )
    )


def score_numviews(prep) -> DataFrame:
    """R9 -> log(nv+1) for all docs (query-independent)."""
    return prep["base"].select(
        "doc_id", F.log(F.col("numviews").cast("double") + 1.0).alias("score")
    )


def score_phrase_fullscan(spark, prep, query: str) -> DataFrame:
    """R6 -> bigram (or unigram) overlap count for ALL docs."""
    qtokens = _query_tokens(query)
    base = prep["base"]
    if not qtokens:
        return base.select("doc_id", F.lit(0.0).alias("score"))
    if len(qtokens) > 1:
        qgrams = list({qtokens[i] + qtokens[i + 1] for i in range(len(qtokens) - 1)})
        grams = base.select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(slice(body_tokens, 1, greatest(size(body_tokens)-1, 0)),"
                    " (t, i) -> concat(t, body_tokens[i+1]))"
                )
            ).alias("gram"),
        )
        hits = (
            grams.filter(F.col("gram").isin(qgrams))
            .groupBy("doc_id")
            .agg(F.count("*").alias("s"))
        )
    else:
        hits = (
            base.select("doc_id", F.explode("body_tokens").alias("t"))
            .filter(F.col("t") == qtokens[0])
            .groupBy("doc_id")
            .agg(F.count("*").alias("s"))
        )
    return base.select("doc_id").join(hits, "doc_id", "left").select(
        "doc_id", F.coalesce(F.col("s").cast("double"), F.lit(0.0)).alias("score")
    )


def score_fullscan_title(spark, prep, query: str) -> DataFrame:
    """R8 -> 1.0 if any query token appears among the TITLE tokens."""
    qtokens = list(set(_query_tokens(query)))
    return prep["base"].select(
        "doc_id",
        F.when(
            F.arrays_overlap("title_tokens", F.array(*[F.lit(t) for t in qtokens])),
            1.0,
        )
        .otherwise(0.0)
        .alias("score"),
    )


def _cosine_pieces(spark, prep, query: str):
    """Shared pieces for R5: per-doc overlap aggregates + constants."""
    qtokens = _query_tokens(query)
    qinfo = _qinfo_df(spark, prep, qtokens)
    n = float(prep["n_docs"] + 1)  # query counted as a document

    # base doc norm^2 with unmodified dfs (precomputable once per corpus)
    idf_base = F.log(F.lit(n) / F.col("df")) + 1.0
    doc_norm2 = (
        prep["body_terms"]
        .join(prep["term_stats"], "term")
        .withColumn("_t2", F.pow(F.col("tf") * idf_base, 2))
        .groupBy("doc_id")
        .agg(F.sum("_t2").alias("norm2_base"))
    )

    # overlap rows: query term present in doc body
    idf_adj = F.log(F.lit(n) / (F.col("df") + F.col("qtf"))) + 1.0
    idf_qonly = F.log(F.lit(n) / F.col("qtf")) + 1.0
    overlap = (
        prep["body_terms"]
        .join(qinfo, "term")
        .select(
            "doc_id",
            (F.col("qtf") * F.col("tf") * idf_adj * idf_adj).alias("_num"),
            (F.pow(F.col("tf") * idf_adj, 2) - F.pow(F.col("tf") * (F.log(F.lit(n) / F.col("df")) + 1.0), 2)).alias("_dnorm_delta"),
            (F.pow(F.col("qtf") * idf_adj, 2) - F.pow(F.col("qtf") * idf_qonly, 2)).alias("_qnorm_delta"),
        )
        .groupBy("doc_id")
        .agg(
            F.sum("_num").alias("num"),
            F.sum("_dnorm_delta").alias("dnorm_delta"),
            F.sum("_qnorm_delta").alias("qnorm_delta"),
        )
    )
    qnorm2_base = qinfo.select(
        F.sum(F.pow(F.col("qtf") * idf_qonly, 2)).alias("q")
    ).collect()[0]["q"]
    return doc_norm2, overlap, float(qnorm2_base)


def score_cosine_fullscan(spark, prep, query: str) -> DataFrame:
    """R5 -> tf-idf cosine for ALL docs (0 when no overlap)."""
    doc_norm2, overlap, qnorm2_base = _cosine_pieces(spark, prep, query)
    return (
        prep["doc_len"]
        .join(doc_norm2, "doc_id", "left")
        .join(overlap, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(
                F.col("num")
                / (
                    F.sqrt(F.lit(qnorm2_base) + F.coalesce("qnorm_delta", F.lit(0.0)))
                    * F.sqrt(
                        F.coalesce("norm2_base", F.lit(0.0))
                        + F.coalesce("dnorm_delta", F.lit(0.0))
                    )
                ),
                F.lit(0.0),
            ).alias("score"),
        )
    )


def score_linear_fullscan(spark, prep, query: str) -> DataFrame:
    """R7 = 1.0*cosine + 10.0*ql + 0.001*phrase + 0.01*log(nv+1)."""
    co = score_cosine_fullscan(spark, prep, query).withColumnRenamed("score", "s_co")
    ql = score_ql_fullscan(spark, prep, query).withColumnRenamed("score", "s_ql")
    ph = score_phrase_fullscan(spark, prep, query).withColumnRenamed("score", "s_ph")
    nv = score_numviews(prep).withColumnRenamed("score", "s_nv")
    return (
        co.join(ql, "doc_id")
        .join(ph, "doc_id")
        .join(nv, "doc_id")
        .select(
            "doc_id",
            (
                1.0 * F.col("s_co")
                + 10.0 * F.col("s_ql")
                + 0.001 * F.col("s_ph")
                + 0.01 * F.col("s_nv")
            ).alias("score"),
        )
    )


FULLSCAN_RANKERS = {
    "ql": score_ql_fullscan,
    "cosine": score_cosine_fullscan,
    "phrase": score_phrase_fullscan,
    "linear": score_linear_fullscan,
    "fullscan": score_fullscan_title,
}


def run_fullscan_query(
    spark: SparkSession, prep: dict, query: str, ranker: str, k: int = 10
) -> DataFrame:
    """Score all docs with the named ranker, return top-k (doc_id, score)."""
    if ranker == "numviews":
        scored = score_numviews(prep)
    else:
        scored = FULLSCAN_RANKERS[ranker](spark, prep, query)
    return scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)
