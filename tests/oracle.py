"""Single-node pure-Python oracle implementing the reference semantics
exactly (SURVEY.md §5.2(4)): conjunctive intersection + phrase adjacency
+ the R1/R2/R3 scorers + the pinned (score desc, doc_id asc) tie-break.

Independent of the Spark engine: builds its own in-memory index with
dicts and scores with math.log — shares only the token-level kernels
(analyzer, parser), which have their own golden unit tests.
"""

from __future__ import annotations

import math
from collections import Counter

from websearchengine_spark.functions.analyze import analyze_text
from websearchengine_spark.operators.query import analyze_tokens, parse_query

LAMBDA = 0.5


class OracleIndex:
    def __init__(self, pages_pdf, signals: dict | None = None):
        """pages_pdf: pandas DataFrame with url + text (pinned extractor
        output). signals: url -> (pagerank, numviews)."""
        urls = sorted(pages_pdf["url"].tolist())
        self.url_to_id = {u: i for i, u in enumerate(urls)}
        text_by_url = dict(zip(pages_pdf["url"], pages_pdf["text"]))
        self.postings: dict[str, dict[int, list[int]]] = {}
        self.doc_len: dict[int, int] = {}
        self.ctf: Counter = Counter()
        self.signals = signals or {}
        self.urls = urls
        for url in urls:
            did = self.url_to_id[url]
            toks = analyze_text(text_by_url[url] or "")
            self.doc_len[did] = len(toks)
            for pos, t in enumerate(toks):
                self.postings.setdefault(t, {}).setdefault(did, []).append(pos)
                self.ctf[t] += 1
        self.num_docs = len(urls)
        self.total_tf = sum(self.doc_len.values())

    def pagerank(self, did: int) -> float:
        return self.signals.get(self.urls[did], (0.0, 0))[0]

    def numviews(self, did: int) -> int:
        return self.signals.get(self.urls[did], (0.0, 0))[1]

    def tf(self, term: str, did: int) -> int:
        return len(self.postings.get(term, {}).get(did, ()))

    def candidates(self, token_words: list[list[str]]) -> list[int]:
        distinct = {w for ws in token_words for w in ws}
        if not distinct:
            return []
        sets = []
        for w in distinct:
            sets.append(set(self.postings.get(w, {})))
        docs = set.intersection(*sets) if sets else set()
        # phrase adjacency: exists p with word_i at p+i for all i
        for ws in token_words:
            if len(ws) <= 1:
                continue
            ok = set()
            for d in docs:
                p0 = self.postings.get(ws[0], {}).get(d, [])
                rest = [set(self.postings.get(w, {}).get(d, [])) for w in ws[1:]]
                for p in p0:
                    if all((p + i) in rest[i - 1] for i in range(1, len(ws))):
                        ok.add(d)
                        break
            docs = ok
        return sorted(docs)

    def score(self, did: int, token_words, ranker: str) -> float:
        words = [w for ws in token_words for w in ws]
        ql = 0.0
        for w in words:
            pwd = self.tf(w, did) / self.doc_len[did]
            pwc = self.ctf[w] / self.total_tf
            ql += math.log((1 - LAMBDA) * pwd + LAMBDA * pwc)
        if ranker == "comprehensive":
            return (
                1.4 * ql
                + 0.3 * math.log(self.pagerank(did) + 1.0)
                + 0.3 * math.log(self.numviews(did) + 1.0)
            )
        if ranker == "favorite":
            return math.exp(ql)
        if ranker == "conjunctive":
            return 1.0
        raise ValueError(ranker)

    def query(self, query: str, ranker: str = "comprehensive", k: int = 10):
        """Returns [(doc_id, score)] sorted by (score desc, doc_id asc)."""
        token_words = analyze_tokens(parse_query(query))
        if not token_words:
            return []
        cands = self.candidates(token_words)
        scored = [(d, self.score(d, token_words, ranker)) for d in cands]
        scored.sort(key=lambda x: (-x[1], x[0]))
        return scored[:k]

    def bm25(self, query: str, k: int = 10, k1: float = 1.2, b: float = 0.75):
        token_words = analyze_tokens(parse_query(query))
        if not token_words:
            return []
        cands = self.candidates(token_words)
        words = [w for ws in token_words for w in ws]
        avg_dl = self.total_tf / max(1, self.num_docs)
        out = []
        for d in cands:
            s = 0.0
            for w in words:
                df = len(self.postings.get(w, {}))
                idf = math.log((self.num_docs - df + 0.5) / (df + 0.5) + 1.0)
                tf = self.tf(w, d)
                s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * self.doc_len[d] / avg_dl))
            out.append((d, s))
        out.sort(key=lambda x: (-x[1], x[0]))
        return out[:k]
