"""PRF expansion (vs oracle mirror), Bhattacharyya, and evaluator tests."""

import math
from collections import Counter

import pytest

from websearchengine_spark.operators.evalx import (
    evaluate_query,
    grade_value,
    parse_qrels_lines,
)
from websearchengine_spark.operators.prf import STOPWORDS, bhattacharyya, prf_expand


def py_prf(oracle, query, num_docs=10, num_terms=5):
    """Mirror of QueryHandler /prf over the python oracle index."""
    top = [d for d, _ in oracle.query(query, "comprehensive", num_docs)]
    mass = Counter()
    all_occ = 0
    for d in top:
        for t, pl in oracle.postings.items():
            if d in pl:
                mass[t] += len(pl[d])
                all_occ += len(pl[d])
    kept = [(t, m) for t, m in mass.items() if t not in STOPWORDS]
    kept.sort(key=lambda x: (-x[1], x[0]))
    kept = kept[:num_terms]
    probs = [(t, m / all_occ) for t, m in kept]
    s = sum(p for _, p in probs)
    return [(t, p / s) for t, p in probs]


@pytest.mark.parametrize("query", ["data mining", "google map"])
def test_prf_matches_oracle(spark, built_index, oracle_index, query):
    got = [(r["term"], r["prob"]) for r in prf_expand(spark, built_index, query).collect()]
    want = py_prf(oracle_index, query)
    assert [t for t, _ in got] == [t for t, _ in want]
    for (t1, p1), (t2, p2) in zip(got, want):
        assert abs(p1 - p2) < 1e-9, t1
    assert abs(sum(p for _, p in got) - 1.0) < 1e-9


def test_bhattacharyya(spark, built_index):
    ea = prf_expand(spark, built_index, "data mining")
    eb = prf_expand(spark, built_index, "data mining")
    # identical distributions -> beta == 1
    assert abs(bhattacharyya(ea, eb) - 1.0) < 1e-9
    ec = prf_expand(spark, built_index, "salsa")
    beta = bhattacharyya(ea, ec)
    assert 0.0 <= beta <= 1.0 + 1e-12


def test_grade_values():
    assert grade_value("Perfect") == 10.0
    assert grade_value("Fair") == 1.0
    assert grade_value("Bad") == 0.0
    assert grade_value(7) == 7.0


def test_parse_qrels():
    qrels = parse_qrels_lines(["q1\t3\tPerfect", "q1\t5\tBad", "q2\t1\tGood"])
    assert qrels == {"q1": {3: 10.0, 5: 0.0}, "q2": {1: 5.0}}


def test_evaluate_query_hand_checked():
    # judgments: doc1 Perfect(10), doc2 Fair(1, NOT relevant), doc3 Good(5)
    judg = {1: 10.0, 2: 1.0, 3: 5.0}
    ranked = [1, 4, 3, 2, 5]
    m = evaluate_query(ranked, judg)
    # M (relevant) = 2 (docs 1 and 3)
    assert m["P@1"] == 1.0
    assert m["R@1"] == 0.5
    assert abs(m["F@1"] - (2 * 1.0 * 0.5 / 1.5)) < 1e-12
    # after rank 5: rel retrieved = 2 -> P@5 = 2/5, R@5 = 1.0
    assert m["P@5"] == 0.4
    assert m["R@5"] == 1.0
    assert m["MRR"] == 1.0
    # MAP = (1/1 + 2/3) / 2
    assert abs(m["MAP"] - (1.0 + 2 / 3) / 2) < 1e-12
    # NDCG@1: dcg = 10*ln2/ln2 = 10; idcg(top min(2,1)=1) = 10 -> 1.0
    assert abs(m["NDCG@1"] - 1.0) < 1e-12
    # NDCG@5: dcg sums ALL judged grades (doc2's Fair=1 at rank 4 counts
    # even though it is not "relevant" — Evaluator.java:155); idcg over
    # sorted grades top min(M=2, N=5)
    dcg = 10 + 5 * math.log(2) / math.log(4) + 1 * math.log(2) / math.log(5)
    idcg = 10 + 5 * math.log(2) / math.log(3)
    assert abs(m["NDCG@5"] - dcg / idcg) < 1e-12
    # 11-pt curve: precision 1.0 at recall 0.5 (ranks 1) and 2/3 at recall 1.0
    assert m["PR11"][0] == 1.0
    assert m["PR11"][5] == 1.0
    assert abs(m["PR11"][10] - 2 / 3) < 1e-12


def test_evaluate_no_relevant():
    m = evaluate_query([1, 2, 3], {9: 10.0})
    assert m["MAP"] == 0.0
    assert m["MRR"] == 0.0
    assert m["P@1"] == 0.0
