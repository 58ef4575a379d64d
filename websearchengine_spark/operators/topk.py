"""Block-max conjunctive BM25 top-k — the scale path for `/search`
(SURVEY.md §4 O1/O9, north_rule: "BM25 with block-max WAND posting-list
intersection over per-partition index shards followed by a global top-k
merge").

Physical shape:

    postings (doc-sharded) filtered to the query terms     [parquet pushdown]
      -> groupBy(shard).applyInPandas(kernel)              [one task per shard]
           kernel: rarest-first block-skip intersection + vectorized BM25
           -> per-shard top-k
      -> orderBy(score desc, doc_id asc).limit(k)          [global merge]
      -> broadcast join docs for url/title                 [J3]

The kernel is the doc-at-a-time galloping intersection of the reference
(IndexerInvertedCompressed.java:438-462) re-expressed for a columnar
engine: the rarest term's docids drive; for every other term only the
blocks whose [first_docid, last_docid] range intersects the current
candidate set are DECODED (the block-max skip — block metadata is read,
block bytes are not), then candidates intersect via sorted-array
intersection and the surviving docs get exact vectorized BM25 scores.
``max_impact`` block bounds additionally let the kernel drop candidate
docs whose summed upper bounds cannot reach the running k-th score
before exact scoring.

Scores are identical to the DataFrame fallback path and the NumPy
oracle: pruning only skips work, never changes the top-k (asserted by
tests at multiple shard counts).

Phrase tokens require positions and take the DataFrame path
(operators/query.py); this kernel handles plain conjunctive queries.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from websearchengine_spark.functions.codec import (
    BM25_B,
    BM25_K1,
    decode_posting_blocks,
)
from websearchengine_spark.operators.query import (
    RESULT_COLS,
    analyze_tokens,
    index_analyzer,
    parse_query,
)
from websearchengine_spark.sources.storage import IndexStorage


def _decode_blocks_overlapping(blocks, cand: np.ndarray):
    """Decode only blocks whose docid range intersects ``cand``.

    Returns (doc_ids, tfs, dls, n_decoded, n_total)."""
    selected = []
    for b in blocks:
        lo, hi = b[0], b[1]
        i = np.searchsorted(cand, lo, side="left")
        if i < cand.size and cand[i] <= hi:
            selected.append(b)
    d, t, dl, _ = decode_posting_blocks(selected, want_positions=False, want_doclens=True)
    return d, t, dl, len(selected), len(blocks)


def shard_bm25_topk(
    term_lists: dict[str, list],
    qweights: dict[str, float],
    idf: dict[str, float],
    avg_dl: float,
    k: int,
    threshold: float = -math.inf,
) -> tuple[np.ndarray, np.ndarray, dict]:
    """Pure kernel for ONE shard: term -> blocks, returns (doc_ids, scores,
    stats).  ``threshold``: scores <= threshold may be dropped (used for
    cross-shard pruning when a running bound is known; -inf = exact).

    Conjunctive semantics: a doc must contain ALL terms.  Stats record
    blocks decoded vs total (the block-max skip evidence).
    """
    stats = {"blocks_total": 0, "blocks_decoded": 0, "candidates": 0, "pruned_by_ub": 0}
    terms = sorted(term_lists, key=lambda t: sum(b[2] for b in term_lists[t]))
    if len(terms) < len(qweights):
        return np.empty(0, np.int64), np.empty(0, np.float64), stats

    # rarest term decoded fully; it drives the candidate set
    first = terms[0]
    cand, tf0, dl0, _ = decode_posting_blocks(
        term_lists[first], want_positions=False, want_doclens=True
    )
    stats["blocks_total"] += len(term_lists[first])
    stats["blocks_decoded"] += len(term_lists[first])
    per_term = {first: (cand, tf0, dl0)}
    for t in terms[1:]:
        if cand.size == 0:
            stats["blocks_total"] += len(term_lists[t])
            return np.empty(0, np.int64), np.empty(0, np.float64), stats
        d, tf, dl, ndec, ntot = _decode_blocks_overlapping(term_lists[t], cand)
        stats["blocks_decoded"] += ndec
        stats["blocks_total"] += ntot
        per_term[t] = (d, tf, dl)
        cand = cand[np.isin(cand, d, assume_unique=True)]
    stats["candidates"] = int(cand.size)
    if cand.size == 0:
        return np.empty(0, np.int64), np.empty(0, np.float64), stats

    # optional UB pruning against a known threshold (block-max upper bounds)
    if threshold > -math.inf:
        ub = np.zeros(cand.size)
        for t in terms:
            d, _tf, _dl = per_term[t]
            blocks = term_lists[t]
            firsts = np.array([b[0] for b in blocks], dtype=np.int64)
            maximp = np.array([b[4] for b in blocks], dtype=np.float64)
            bidx = np.clip(np.searchsorted(firsts, cand, side="right") - 1, 0, len(blocks) - 1)
            ub += qweights[t] * idf[t] * maximp[bidx]
        keep = ub > threshold
        stats["pruned_by_ub"] = int((~keep).sum())
        cand = cand[keep]
        if cand.size == 0:
            return np.empty(0, np.int64), np.empty(0, np.float64), stats

    # exact vectorized BM25 over surviving candidates
    scores = np.zeros(cand.size, dtype=np.float64)
    dl_cand = None
    for t in terms:
        d, tf, dl = per_term[t]
        ix = np.searchsorted(d, cand)
        tf_c = tf[ix].astype(np.float64)
        if dl_cand is None:
            dl_cand = dl[ix].astype(np.float64)
        scores += (
            qweights[t]
            * idf[t]
            * ((BM25_K1 + 1.0) * tf_c)
            / (tf_c + BM25_K1 * (1.0 - BM25_B + BM25_B * dl_cand / avg_dl))
        )
    # per-shard top-k with the pinned tie-break (score desc, doc_id asc)
    if cand.size > k:
        # keep every doc scoring >= the k-th best (ties resolved below)
        kth = np.partition(-scores, k - 1)[k - 1]
        keep = np.flatnonzero(-scores <= kth)
        cand, scores = cand[keep], scores[keep]
    order = np.lexsort((cand, -scores))[:k]
    return cand[order], scores[order], stats


def _rows_to_blocks(blocks) -> list:
    return [
        (
            b["first_docid"],
            b["last_docid"],
            b["n"],
            b["max_tf"],
            b["max_impact"],
            b["data"],
        )
        for b in blocks
    ]


def wand_topk(
    spark: SparkSession,
    index_root: str,
    query: str,
    k: int = 10,
) -> DataFrame:
    """BM25 top-k over the sharded index via the block-max kernel.

    Returns the same columns as query.run_query, ordered by
    (score desc, doc_id asc)."""
    store = IndexStorage(index_root)
    token_words = analyze_tokens(parse_query(query), index_analyzer(store))
    docs = store.read_table(spark, "docs")
    if not token_words:
        return docs.limit(0).withColumn("score", F.lit(0.0)).select(*RESULT_COLS)
    if any(len(ws) > 1 for ws in token_words):
        # phrase queries need positions -> DataFrame path
        from websearchengine_spark.operators.query import run_query

        return run_query(spark, index_root, query, ranker="bm25", k=k)

    words = [w for ws in token_words for w in ws]
    qweights: dict[str, float] = {}
    for w in words:
        qweights[w] = qweights.get(w, 0.0) + 1.0
    terms = sorted(qweights)

    srow = store.read_table(spark, "stats").collect()[0]
    num_docs, total_tf = srow["num_docs"], srow["total_tf"]
    avg_dl = total_tf / max(1, num_docs)
    ts = (
        store.read_table(spark, "term_stats")
        .filter(F.col("term").isin(terms))
        .collect()
    )
    df_by_term = {r["term"]: r["df"] for r in ts}
    if len(df_by_term) < len(terms):
        return docs.limit(0).withColumn("score", F.lit(0.0)).select(*RESULT_COLS)
    idf = {
        t: math.log((num_docs - df + 0.5) / (df + 0.5) + 1.0)
        for t, df in df_by_term.items()
    }

    postings = store.read_partitioned(spark, "postings").filter(
        F.col("term").isin(terms)
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        term_lists = {
            t: _rows_to_blocks(b) for t, b in zip(pdf["term"], pdf["blocks"])
        }
        d, s, _stats = shard_bm25_topk(term_lists, qweights, idf, avg_dl, k)
        return pd.DataFrame({"doc_id": d, "score": s})

    per_shard = postings.select("shard", "term", "blocks").groupBy("shard").applyInPandas(
        kernel, schema="doc_id long, score double"
    )
    out = (
        per_shard.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
        .join(docs, "doc_id")
        .select(*RESULT_COLS)
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
    )
    return out
