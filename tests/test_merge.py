"""Index merge (log-structured compaction, operators/merge.py): merging
two half-corpus builds must be SCORE-identical to the from-scratch build
of the union corpus — same BM25/QL scores (<1e-9), same urls (modulo
exact-tie order, since doc_ids differ), same term_stats and corpus
stats — with B's doc_ids shifted by a shard-preserving offset and no
token rescan.  Mirrors the reference's per-round partial-index merge
(IndexerInvertedCompressed.java:167-277) as a distributed compaction."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import REFERENCE_QUERIES
from websearchengine_spark.operators.build import build_index
from websearchengine_spark.operators.merge import merge_indexes
from websearchengine_spark.operators.query import run_query
from websearchengine_spark.operators.topk import wand_topk
from websearchengine_spark.sources.corpus import url_of
from websearchengine_spark.sources.storage import IndexStorage

N_SHARDS = 3


@pytest.fixture(scope="module")
def merge_roots(spark, corpus_pdf, tmp_path_factory):
    base = tmp_path_factory.mktemp("merge")
    pages = spark.createDataFrame(corpus_pdf)
    cut = url_of(100)
    full, a, b, merged = (str(base / n) for n in ("full", "a", "b", "merged"))
    build_index(spark, pages, full, n_shards=N_SHARDS, n_groups=2)
    build_index(spark, pages.filter(F.col("url") < cut), a, n_shards=N_SHARDS, n_groups=2)
    build_index(spark, pages.filter(F.col("url") >= cut), b, n_shards=N_SHARDS, n_groups=2)
    merge_indexes(spark, a, b, merged)
    return {"full": full, "merged": merged, "a": a, "b": b}


def _url_scores(spark, root, q, ranker, k):
    rows = run_query(spark, root, q, ranker=ranker, k=k).collect()
    return [(r["url"], r["score"]) for r in rows]


def _assert_rank_identical(got, want):
    """Same ranked scores; same urls, order-free within exact score ties
    (doc_id tie-breaks legitimately differ between the two id spaces)."""
    assert len(got) == len(want)
    for (_, s1), (_, s2) in zip(got, want):
        assert abs(s1 - s2) < 1e-9, (s1, s2)
    by_score_got, by_score_want = {}, {}
    for (u, s), (v, t) in zip(got, want):
        by_score_got.setdefault(round(s, 9), []).append(u)
        by_score_want.setdefault(round(t, 9), []).append(v)
    for key in by_score_want:
        assert sorted(by_score_got[key]) == sorted(by_score_want[key]), key


def test_merged_stats_and_term_stats_match_full_build(spark, merge_roots):
    full_cfg = IndexStorage(merge_roots["full"]).read_manifest()["config"]
    m_cfg = IndexStorage(merge_roots["merged"]).read_manifest()["config"]
    assert m_cfg["num_docs"] == full_cfg["num_docs"] == 200
    assert m_cfg["total_tf"] == full_cfg["total_tf"]
    assert abs(m_cfg["avg_dl"] - full_cfg["avg_dl"]) < 1e-12
    assert m_cfg["n_shards"] == N_SHARDS
    # offset is the smallest multiple of n_shards >= |A| (shard-preserving)
    assert m_cfg["doc_id_offset"] == 102

    def ts(root):
        return {
            r["term"]: (r["df"], r["ctf"])
            for r in IndexStorage(root).read_table(spark, "term_stats").collect()
        }

    assert ts(merge_roots["merged"]) == ts(merge_roots["full"])


def test_merged_doc_ids_unique_and_shard_preserving(spark, merge_roots):
    docs = IndexStorage(merge_roots["merged"]).read_table(spark, "docs")
    assert docs.count() == docs.select("doc_id").distinct().count() == 200
    # every B doc keeps its pre-shift shard: doc_id % n == (doc_id-102) % n
    b_docs = IndexStorage(merge_roots["b"]).read_table(spark, "docs")
    m = {r["url"]: r["doc_id"] for r in docs.collect()}
    for r in b_docs.collect():
        assert m[r["url"]] == r["doc_id"] + 102
        assert m[r["url"]] % N_SHARDS == r["doc_id"] % N_SHARDS


@pytest.mark.parametrize("query", REFERENCE_QUERIES)
def test_merge_bm25_rank_identity_vs_full_build(spark, merge_roots, query):
    got = _url_scores(spark, merge_roots["merged"], query, "bm25", 10)
    want = _url_scores(spark, merge_roots["full"], query, "bm25", 10)
    _assert_rank_identical(got, want)


@pytest.mark.parametrize("query", ["data mining", "web search", "apple"])
def test_merge_comprehensive_rank_identity_vs_full_build(spark, merge_roots, query):
    got = _url_scores(spark, merge_roots["merged"], query, "comprehensive", 10)
    want = _url_scores(spark, merge_roots["full"], query, "comprehensive", 10)
    _assert_rank_identical(got, want)


@pytest.mark.parametrize("query", ['"data mining"', 'new "york" city'])
def test_merge_preserves_positions_for_phrases(spark, merge_roots, query):
    """Positions survive decode -> shift -> re-encode: phrase queries on
    the merged index equal the full build (both WAND and DataFrame paths)."""
    got = [
        (r["url"], r["score"])
        for r in wand_topk(spark, merge_roots["merged"], query, k=10).collect()
    ]
    want = [
        (r["url"], r["score"])
        for r in wand_topk(spark, merge_roots["full"], query, k=10).collect()
    ]
    _assert_rank_identical(got, want)


def test_merge_rerun_resumes_as_noop(spark, merge_roots):
    """A second merge over a completed output resumes: all groups are
    already committed, postings bytes stay identical, queries still work."""
    store = IndexStorage(merge_roots["merged"])
    before = (
        store.read_partitioned(spark, "postings")
        .agg(F.sum(F.crc32(F.to_json(F.struct("shard", "term", "df_shard")))))
        .collect()[0][0]
    )
    merge_indexes(spark, merge_roots["a"], merge_roots["b"], merge_roots["merged"])
    after = (
        store.read_partitioned(spark, "postings")
        .agg(F.sum(F.crc32(F.to_json(F.struct("shard", "term", "df_shard")))))
        .collect()[0][0]
    )
    assert before == after
    assert len(wand_topk(spark, merge_roots["merged"], "google", k=5).collect()) == 5


def test_merge_mismatched_format_raises(spark, merge_roots, tmp_path):
    fake = IndexStorage(str(tmp_path / "fake"))
    m = fake.read_manifest()
    m["config"] = {"n_shards": 5, "num_docs": 1, "total_tf": 1}
    fake.write_manifest(m)
    with pytest.raises(ValueError, match="n_shards"):
        merge_indexes(spark, merge_roots["a"], fake.root, str(tmp_path / "out"))


def test_segment_id_span_handles_legacy_and_deleted_configs():
    """Offset computation must clear a segment's OCCUPIED id range:
    dense builds (span == num_docs), post-delete merges (explicit
    id_span), and legacy binary merges (gapped space, no id_span — a
    safe upper bound derives from doc_id_offset)."""
    from websearchengine_spark.operators.merge import segment_id_span

    assert segment_id_span({"num_docs": 100}) == 100
    assert segment_id_span({"num_docs": 195, "id_span": 240}) == 240
    # legacy merge of 5+7 docs at n_shards=4 occupies ids 0-4 and 8-14:
    # num_docs=12 would collide; the derived bound must clear id 14
    legacy = {"num_docs": 12, "n_shards": 4, "doc_id_offset": 8}
    span = segment_id_span(legacy)
    assert span >= 15 and span % 4 == 0
