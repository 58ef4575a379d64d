"""Batch WAND query API: many queries, one postings scan, per-query
rank identity vs the single-query path and the oracle."""

from tests.conftest import REFERENCE_QUERIES
from websearchengine_spark.operators.topk import wand_topk, wand_topk_batch


def test_batch_matches_single_and_oracle(spark, built_index, oracle_index):
    plain = [q for q in REFERENCE_QUERIES]  # all plain (no phrases)
    out = wand_topk_batch(spark, built_index, plain, k=10).collect()
    by_q: dict[str, list] = {}
    for r in out:
        by_q.setdefault(r["query"], []).append((r["rank"], r["doc_id"], r["score"]))
    for q in plain:
        got = [(d, s) for _, d, s in sorted(by_q.get(q, []))]
        want = oracle_index.bm25(q, 10)
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (d1, s1), (d2, s2) in zip(got, want):
            assert abs(s1 - s2) < 1e-9
        single = [
            (r["doc_id"], r["score"])
            for r in wand_topk(spark, built_index, q, k=10).collect()
        ]
        assert [d for d, _ in got] == [d for d, _ in single], q


def test_batch_handles_unknown_and_empty(spark, built_index):
    out = wand_topk_batch(
        spark, built_index, ["zzznope", "", "data mining"], k=5
    ).collect()
    qs = {r["query"] for r in out}
    assert qs == {"data mining"}


def test_batch_all_unknown(spark, built_index):
    assert wand_topk_batch(spark, built_index, ["zzznope", ""], k=5).count() == 0


def test_batch_phrase_queries_rank_identical(spark, built_index, oracle_index):
    """Round 2: phrases in batch mode — positions decoded in the kernel,
    adjacency filter applied; identical to the DataFrame phrase path."""
    from tests.conftest import PHRASE_QUERIES

    out = wand_topk_batch(spark, built_index, list(PHRASE_QUERIES), k=10).collect()
    by_q: dict[str, list] = {}
    for r in out:
        by_q.setdefault(r["query"], []).append((r["rank"], r["doc_id"], r["score"]))
    for q in PHRASE_QUERIES:
        got = [(d, s) for _, d, s in sorted(by_q.get(q, []))]
        want = oracle_index.bm25(q, 10)
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (d1, s1), (d2, s2) in zip(got, want):
            assert abs(s1 - s2) < 1e-9


def test_batch_mixed_plain_and_phrase(spark, built_index, oracle_index):
    qs = ["google", '"data mining"', "web search"]
    out = wand_topk_batch(spark, built_index, qs, k=5).collect()
    by_q: dict[str, list] = {}
    for r in out:
        by_q.setdefault(r["query"], []).append((r["rank"], r["doc_id"]))
    for q in qs:
        got = [d for _, d in sorted(by_q.get(q, []))]
        want = [d for d, _ in oracle_index.bm25(q, 5)]
        assert got == want, q
