"""Block-max WAND kernel tests: rank identity vs oracle AND vs the
exhaustive DataFrame path (SURVEY.md §7.4: every WAND test also runs the
exhaustive path), plus direct kernel tests proving block skipping."""

import numpy as np
import pytest

from tests.conftest import REFERENCE_QUERIES
from websearchengine_spark.functions.codec import encode_posting_blocks
from websearchengine_spark.operators.query import run_query
from websearchengine_spark.operators.topk import shard_bm25_topk, wand_topk


@pytest.mark.parametrize("query", REFERENCE_QUERIES)
def test_wand_matches_oracle_and_dataframe_path(spark, built_index, oracle_index, query):
    got = [
        (r["doc_id"], r["score"])
        for r in wand_topk(spark, built_index, query, k=10).collect()
    ]
    want = oracle_index.bm25(query, 10)
    assert [d for d, _ in got] == [d for d, _ in want], query
    for (d1, s1), (d2, s2) in zip(got, want):
        assert abs(s1 - s2) < 1e-9
    df_path = [
        (r["doc_id"], r["score"])
        for r in run_query(spark, built_index, query, ranker="bm25", k=10).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in df_path]


def test_wand_phrase_falls_back(spark, built_index, oracle_index):
    q = '"data mining"'
    got = [(r["doc_id"], r["score"]) for r in wand_topk(spark, built_index, q).collect()]
    # oracle.bm25 applies phrase adjacency through candidates()
    want = oracle_index.bm25(q, 10)
    assert [d for d, _ in got] == [d for d, _ in want]


def test_wand_unknown_term_empty(spark, built_index):
    assert wand_topk(spark, built_index, "zzzznope").count() == 0
    assert wand_topk(spark, built_index, "").count() == 0


def _mk_lists(avg_dl=10.0):
    """Two synthetic terms: rare (3 docs) and common (many blocks)."""
    rare_docs = np.array([5, 500, 900], dtype=np.int64)
    rare = encode_posting_blocks(
        rare_docs,
        np.array([2, 1, 3]),
        np.array([10, 12, 8]),
        np.array([0, 1, 4, 2, 3, 7]),
        avg_dl,
        block_size=2,
    )
    common_docs = np.arange(0, 1000, 2, dtype=np.int64)  # 500 docs, evens
    tfs = np.ones(500, dtype=np.int64)
    # doc_len must be CONSISTENT per doc across terms (it is in real data)
    dls = np.full(500, 10, dtype=np.int64)
    dls[common_docs == 500] = 12
    dls[common_docs == 900] = 8
    pos = np.arange(500, dtype=np.int64)
    common = encode_posting_blocks(common_docs, tfs, dls, pos, avg_dl, block_size=16)
    return {"rare": rare, "common": common}


def test_kernel_block_skipping():
    tl = _mk_lists()
    qw = {"rare": 1.0, "common": 1.0}
    idf = {"rare": 3.0, "common": 0.5}
    d, s, stats = shard_bm25_topk(tl, qw, idf, avg_dl=10.0, k=10)
    # conjunctive: docs 500 and 900 are even (in common), 5 is odd (not)
    assert d.tolist() == [900, 500]  # 900 has tf=3 for rare -> higher score
    assert s[0] > s[1]
    # the common term has ceil(500/16)=32 blocks; only the ones containing
    # candidates {5,500,900} may be decoded (2 blocks)
    assert stats["blocks_total"] == 2 + 32
    assert stats["blocks_decoded"] <= 2 + 3
    assert stats["blocks_decoded"] < stats["blocks_total"]


def test_kernel_missing_term_means_empty():
    tl = _mk_lists()
    qw = {"rare": 1.0, "common": 1.0, "absent": 1.0}
    d, s, stats = shard_bm25_topk(tl, qw, {"rare": 1, "common": 1, "absent": 1}, 10.0, 10)
    assert d.size == 0


def test_kernel_threshold_pruning_never_changes_topk():
    tl = _mk_lists()
    qw = {"rare": 1.0, "common": 1.0}
    idf = {"rare": 3.0, "common": 0.5}
    d0, s0, st0 = shard_bm25_topk(tl, qw, idf, 10.0, k=1)
    # threshold just below the best score must still return the best doc
    d1, s1, st = shard_bm25_topk(tl, qw, idf, 10.0, k=1, threshold=s0[0] - 1e-9)
    assert d1.tolist() == d0.tolist()[:1]
    # the weaker candidate was pruned — either whole blocks were skipped
    # before decode (block-max skip) or the doc was UB-pruned after
    # intersection
    assert (
        st["blocks_decoded"] < st0["blocks_decoded"] or st["pruned_by_ub"] >= 1
    ), (st0, st)


def test_kernel_tie_break_doc_id_asc():
    avg_dl = 10.0
    docs = np.array([3, 7, 11], dtype=np.int64)
    same = encode_posting_blocks(
        docs, np.ones(3, dtype=np.int64), np.full(3, 10), np.arange(3), avg_dl
    )
    d, s, _ = shard_bm25_topk({"t": same}, {"t": 1.0}, {"t": 1.0}, avg_dl, k=2)
    assert d.tolist() == [3, 7]  # equal scores -> lowest doc_ids win


@pytest.fixture(scope="module")
def fine_block_index(spark, corpus_pdf, tmp_path_factory):
    """Index with block_size=8: at 200 docs the default 128-doc blocks
    collapse each shard to 1-2 blocks per term, so every candidate shares
    the block max and the UB can never separate them — fine blocks give
    the UB the resolution the default has at real scale."""
    from websearchengine_spark.operators.build import build_index

    root = str(tmp_path_factory.mktemp("fine_idx"))
    pages = spark.createDataFrame(corpus_pdf)
    build_index(spark, pages, root, n_shards=3, n_groups=2, block_size=8)
    return root


def test_serve_path_two_phase_pruning(spark, fine_block_index, oracle_index):
    """Round 2: the SERVE path itself must prune — phase 1 scores shard 0
    driver-side, phase 2 broadcasts its k-th score as the UB threshold.
    Evidence: executor-side accumulator > 0 on a high-df query, with rank
    identity preserved."""
    from websearchengine_spark.operators.topk import LAST_WAND_STATS

    # high-df terms at small k -> tight threshold -> real pruning
    q = "the of"
    got = [
        (r["doc_id"], r["score"])
        for r in wand_topk(spark, fine_block_index, q, k=3, two_phase=True).collect()
    ]
    want = oracle_index.bm25(q, 3)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (d1, s1), (d2, s2) in zip(got, want):
        assert abs(s1 - s2) < 1e-9
    assert LAST_WAND_STATS["pruned_by_ub"].value > 0, (
        "two-phase threshold never pruned a candidate on a high-df query"
    )


@pytest.mark.parametrize("query", ["web search", "google map", "the of"])
def test_two_phase_equals_exhaustive(spark, built_index, query):
    a = [
        (r["doc_id"], round(r["score"], 9))
        for r in wand_topk(spark, built_index, query, k=10, two_phase=True).collect()
    ]
    b = [
        (r["doc_id"], round(r["score"], 9))
        for r in wand_topk(spark, built_index, query, k=10, two_phase=False).collect()
    ]
    assert a == b


def test_explicit_two_phase_respects_driver_cap(spark, built_index, oracle_index, monkeypatch):
    """ADVICE round-3: the phase-1 driver-collect size cap must apply on
    the EXPLICIT two_phase=True path too — when a shard's posting share
    exceeds it, fall back to exhaustive (identical top-k) with a warning
    instead of collecting unbounded blocks to the driver."""
    import warnings

    from websearchengine_spark.operators import topk as topk_mod

    monkeypatch.setattr(topk_mod, "WAND_PHASE1_MAX_POSTINGS", 1)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        got = [
            (r["doc_id"], round(r["score"], 9))
            for r in topk_mod.wand_topk(
                spark, built_index, "web search", k=10, two_phase=True
            ).collect()
        ]
    assert any("WAND_PHASE1_MAX_POSTINGS" in str(x.message) for x in w)
    want = [(d, round(s, 9)) for d, s in oracle_index.bm25("web search", 10)]
    assert [d for d, _ in got] == [d for d, _ in want]


def test_hybrid_head_blocks_exist_and_rank_identity(spark, corpus_pdf, oracle_index, tmp_path):
    """Round-3 e2e proof that the champion-head layout is ACTIVE in a
    real stored index (not just the synthetic kernel tests) and that
    both serve paths stay rank-identical on it: with n_shards=1 and
    block_size=8 the head terms (df~190 >= HEAD_MIN_BLOCKS*8) split."""
    from pyspark.sql import functions as F

    from websearchengine_spark.operators.build import build_index
    from websearchengine_spark.operators.query import run_query
    from websearchengine_spark.sources.storage import IndexStorage

    root = str(tmp_path / "hyb_idx")
    pages = spark.createDataFrame(corpus_pdf)
    build_index(spark, pages, root, n_shards=1, n_groups=1, block_size=8)

    store = IndexStorage(root)
    heads = (
        store.read_partitioned(spark, "postings")
        .select(F.explode("blocks").alias("b"))
        .filter(F.col("b.head"))
        .count()
    )
    assert heads > 0, "expected head-flagged blocks in the stored index"

    # WAND on a head-split term, exhaustive and thresholded
    for q in ["the of", "web search"]:
        got = [
            (r["doc_id"], round(r["score"], 9))
            for r in wand_topk(spark, root, q, k=10).collect()
        ]
        want = [(d, round(s, 9)) for d, s in oracle_index.bm25(q, 10)]
        assert got == want, q
    # phrase DataFrame path: hybrid positional decode must re-merge runs
    got_ph = [
        r["doc_id"]
        for r in run_query(spark, root, '"data mining"', ranker="comprehensive", k=10).collect()
    ]
    want_ph = [d for d, _ in oracle_index.query('"data mining"', "comprehensive", 10)]
    assert got_ph == want_ph


def test_bound_scale_revalidates_stale_block_bounds():
    """Live multi-segment search scores a segment with the UNION avg_dl,
    but the stored per-block max_impact bounds were encoded with the
    segment's OWN avg_dl — when avg_dl_union > avg_dl_segment they are
    no longer upper bounds and the two-phase gate can prune true top-k
    docs.  bound_scale = avg_q/avg_enc re-validates them (see the
    shard_bm25_topk docstring for the algebra).  This test constructs
    the failure: blocks encoded at avg_dl=2, scored at avg_dl=50 —
    unscaled gating drops EVERY block; scaled gating is exact."""
    import numpy as np

    from websearchengine_spark.functions.codec import encode_posting_blocks
    from websearchengine_spark.operators.topk import shard_bm25_topk

    enc_avg, query_avg = 2.0, 50.0
    d = np.arange(16, dtype=np.int64)
    tf = np.ones(16, dtype=np.int64)
    dl = np.full(16, 50, dtype=np.int64)
    blocks = encode_posting_blocks(d, tf, dl, None, enc_avg, block_size=4)
    term_lists = {"t": blocks}
    qw, idf = {"t": 1.0}, {"t": 1.0}

    d_ex, s_ex, _ = shard_bm25_topk(term_lists, qw, idf, query_avg, 4)
    assert d_ex.size == 4
    thr = float(s_ex[3]) - 1e-9  # a VALID phase-1 threshold at query_avg

    # the bug: stored bounds (encoded at avg_dl=2) sit far below the
    # query-time scores, so an unscaled gate skips every block
    d_bug, _, st_bug = shard_bm25_topk(
        term_lists, qw, idf, query_avg, 4, threshold=thr, bound_scale=1.0
    )
    assert d_bug.size == 0 and st_bug["blocks_decoded"] == 0

    # the fix: scaling by avg_q/avg_enc restores validity -> exact top-k
    d_fix, s_fix, _ = shard_bm25_topk(
        term_lists, qw, idf, query_avg, 4,
        threshold=thr, bound_scale=query_avg / enc_avg,
    )
    np.testing.assert_array_equal(d_fix, d_ex)
    np.testing.assert_allclose(s_fix, s_ex, atol=1e-12)


def test_wand_corpus_stats_override_sets_bound_scale(spark, built_index):
    """End-to-end: wand_topk with a corpus_stats override whose avg_dl
    exceeds the index's own must return the SAME top-k with two-phase
    forced on as with it off (the override path computes bound_scale
    internally)."""
    from websearchengine_spark.operators.topk import _corpus_stats
    from websearchengine_spark.sources.storage import IndexStorage

    store = IndexStorage(built_index)
    nd, tt, _ = _corpus_stats(spark, store)
    fake = (nd + 1000, tt * 30)  # avg_dl ~6x the index's own

    def run(two_phase):
        return [
            (r["doc_id"], round(r["score"], 9))
            for r in wand_topk(
                spark, built_index, "web search", k=10,
                corpus_stats=fake, two_phase=two_phase, docs_join=False,
            ).collect()
        ]

    assert run(True) == run(False)
