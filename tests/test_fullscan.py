"""HW1 full-scan ranker tests vs a dict-based mirror of SignalFactory /
RankerFullScan semantics (including the cosine query-as-document df
update quirk)."""

import math
from collections import Counter

import numpy as np
import pandas as pd
import pytest


def make_tsv_corpus(n_docs=60, seed=7):
    """Deterministic (doc_id, title, body, numviews) corpus."""
    rng = np.random.default_rng(seed)
    vocab = ["web", "search", "data", "mining", "google", "apple", "Salsa",
             "the", "of", "ranking", "engine", "Bing", "map", "iphone"]
    rows = []
    for i in range(n_docs):
        nt = int(rng.integers(1, 4))
        nb = int(rng.integers(5, 30))
        title = " ".join(vocab[int(j)] for j in rng.integers(0, len(vocab), nt))
        body = " ".join(vocab[int(j)] for j in rng.integers(0, len(vocab), nb))
        rows.append((i, title, body, int(rng.integers(0, 1000))))
    return pd.DataFrame(rows, columns=["doc_id", "title", "body", "numviews"])


class PyFullScan:
    """Mirror of IndexerFullScan + SignalFactory scorers."""

    def __init__(self, pdf):
        self.docs = []
        self.ctf = Counter()
        self.df = Counter()
        self.total_tf = 0
        for _, r in pdf.sort_values("doc_id").iterrows():
            tt, bt = r["title"].split(), r["body"].split()
            self.docs.append({"title": tt, "body": bt, "nv": r["numviews"]})
            for t in tt + bt:
                self.ctf[t] += 1
                self.total_tf += 1
            for t in set(tt + bt):
                self.df[t] += 1
        self.n = len(self.docs)

    def ql(self, query, did):
        qv = query.split()
        d = self.docs[did]
        tf = Counter(d["body"])
        ds = len(d["body"])
        s = 0.0
        for w in qv:
            pwd = tf.get(w, 0) / ds
            pwc = self.ctf.get(w, 0) / self.total_tf
            v = 0.5 * pwd + 0.5 * pwc
            s += math.log(v) if v > 0 else float("-inf")
        return math.exp(s)

    def cosine(self, query, did):
        n = self.n + 1
        d = self.docs[did]
        tfd = Counter(d["body"])
        qv = query.split()
        tfq = Counter(qv)
        dfd = {t: self.df[t] for t in tfd}
        for w in qv:
            dfd[w] = dfd.get(w, 0) + 1
        def norm(tfmap):
            s = 0.0
            for t, c in tfmap.items():
                idf = math.log(n / dfd[t]) + 1
                s += (c * idf) ** 2
            return math.sqrt(s)
        nq, nd = norm(tfq), norm(tfd)
        s = 0.0
        for t, cq in tfq.items():
            if t in tfd:
                idf = math.log(n / dfd[t]) + 1
                s += cq * tfd[t] * idf * idf
        return s / (nq * nd) if nq * nd else 0.0

    def phrase(self, query, did):
        qv = query.split()
        dv = self.docs[did]["body"]
        if len(qv) > 1:
            dmap = Counter(dv[i] + dv[i + 1] for i in range(len(dv) - 1))
            qgrams = {qv[i] + qv[i + 1] for i in range(len(qv) - 1)}
            return float(sum(dmap.get(g, 0) for g in qgrams))
        return float(Counter(dv).get(qv[0], 0)) if qv else 0.0

    def numviews(self, did):
        return math.log(self.docs[did]["nv"] + 1)

    def linear(self, query, did):
        return (
            1.0 * self.cosine(query, did)
            + 10.0 * self.ql(query, did)
            + 0.001 * self.phrase(query, did)
            + 0.01 * self.numviews(did)
        )

    def fullscan(self, query, did):
        q = set(query.split())
        return 1.0 if any(t in q for t in self.docs[did]["title"]) else 0.0


@pytest.fixture(scope="module")
def tsv_pdf():
    return make_tsv_corpus()


@pytest.fixture(scope="module")
def py_fs(tsv_pdf):
    return PyFullScan(tsv_pdf)


@pytest.fixture(scope="module")
def prep(spark, tsv_pdf):
    from websearchengine_spark.operators.fullscan import prepare_fullscan

    return prepare_fullscan(spark.createDataFrame(tsv_pdf))


QUERIES = ["web search", "google", "data mining the", "Salsa", "nonexistent term"]


@pytest.mark.parametrize("ranker", ["ql", "cosine", "phrase", "linear", "fullscan"])
@pytest.mark.parametrize("query", QUERIES)
def test_fullscan_rankers_match_mirror(spark, prep, py_fs, ranker, query):
    from websearchengine_spark.operators.fullscan import FULLSCAN_RANKERS

    got = {
        r["doc_id"]: r["score"]
        for r in FULLSCAN_RANKERS[ranker](spark, prep, query).collect()
    }
    assert len(got) == py_fs.n
    fn = getattr(py_fs, ranker)
    for did in range(py_fs.n):
        want = fn(query, did)
        assert abs(got[did] - want) < 1e-9, (ranker, query, did, got[did], want)


def test_numviews_ranker(spark, prep, py_fs):
    from websearchengine_spark.operators.fullscan import score_numviews

    got = {r["doc_id"]: r["score"] for r in score_numviews(prep).collect()}
    for did in range(py_fs.n):
        assert abs(got[did] - py_fs.numviews(did)) < 1e-12


def test_topk_ordering(spark, prep, py_fs):
    from websearchengine_spark.operators.fullscan import run_fullscan_query

    rows = run_fullscan_query(spark, prep, "web search", "linear", k=5).collect()
    scores = [
        (did, py_fs.linear("web search", did)) for did in range(py_fs.n)
    ]
    scores.sort(key=lambda x: (-x[1], x[0]))
    assert [r["doc_id"] for r in rows] == [d for d, _ in scores[:5]]
