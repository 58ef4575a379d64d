"""Deterministic synthetic web-pages corpus (FIXTURES.md §1).

Input-table shape per BASELINE.json ``input_hint``:
    pages(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)

Every document is a pure function of its integer index ``i`` and the
corpus seed — generation is therefore partitioning-independent and can
run distributed (``spark.range(n).mapInPandas``) or locally (pandas) with
identical bytes.  The ``text`` column is produced by the pinned extractor
(functions/extract.py) over ``html``, so the extractor byte-identity
contract holds by construction and is separately asserted in tests.

Corpus properties exercised (citations into /root/reference/):
  * url basenames, unique; ``aliasNNN`` / ``aliasNNN.html`` pairs for the
    redirect-aliasing paths (CorpusAnalyzerPagerank.java:56-73)
  * <script>/<style> content that must NOT be indexed
    (Jsoup text() semantics, IndexerInvertedCompressed.java:85-93)
  * links via ``<a href="...">`` matching the reference's regex
    ``<[a|A].*?href="([^ /#]*)".*?>`` (CorpusAnalyzer.java:36-37),
    including off-corpus targets (dropped) and self-links (dropped,
    CorpusAnalyzerPagerank.java:100)
  * Zipf vocabulary incl. Porter step-1 words, the reference query terms
    (queries.tsv), super-head terms (>90% of docs) for skew, 1-char and
    >20-char tokens for the length filter
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd

from websearchengine_spark.functions.extract import extract_text_and_title

EPOCH = dt.datetime(2014, 6, 1, 16, 0, 0)  # fixed; warc_ts = EPOCH + i seconds

QUERY_TERMS = [
    "bing", "data", "mining", "google", "salsa", "web", "search",
    "map", "apple", "iphone", "ios", "new", "york", "city",
]
PORTER_WORDS = [
    "caresses", "ponies", "ties", "feed", "agreed", "disabled", "matting",
    "mating", "meeting", "meetings", "milling", "messing", "caress", "cats",
]
HEAD_TERMS = ["the", "of", "and"]  # super-head: appear in ~every doc
EDGE_TOKENS = [
    "x",                                      # 1-char: kept (len filter is 1..20)
    "supercalifragilisticexpialidocious",     # >20 chars: dropped
    "MixedCase", "UPPER", "don't", "end.",    # case + punctuation-attached
]


def _filler_vocab(n_words: int, seed: int) -> list[str]:
    """Deterministic pseudo-words: CV syllables, 2-5 syllables each."""
    rng = np.random.default_rng(seed)
    cons = list("bcdfghjklmnpqrstvwz")
    vows = list("aeiou")
    words = set()
    out = []
    while len(out) < n_words:
        n_syl = int(rng.integers(2, 6))
        w = "".join(
            cons[int(rng.integers(len(cons)))] + vows[int(rng.integers(len(vows)))]
            for _ in range(n_syl)
        )
        if w not in words:
            words.add(w)
            out.append(w)
    return out


def build_vocab(seed: int = 42) -> list[str]:
    vocab = HEAD_TERMS + QUERY_TERMS + PORTER_WORDS + EDGE_TOKENS
    vocab += _filler_vocab(500 - len(vocab), seed=seed * 7919 + 13)
    return vocab


def _zipf_probs(n: int) -> np.ndarray:
    p = 1.0 / np.arange(1, n + 1, dtype=np.float64)
    return p / p.sum()


def url_of(i: int) -> str:
    """Deterministic unique url for doc index i, with alias pairs."""
    if i % 101 == 0:
        return f"alias{i:07d}"
    if i % 101 == 1 and i > 0:
        return f"alias{i - 1:07d}.html"
    return f"doc{i:07d}.html"


def _make_html(i: int, n_docs: int, vocab: list[str], probs: np.ndarray, seed: int) -> str:
    rng = np.random.default_rng((seed * 0x9E3779B97F4A7C15 + i) % (1 << 64))
    n_title = int(rng.integers(2, 5))
    title_words = [vocab[j] for j in rng.choice(len(vocab), size=n_title, p=probs)]
    n_body = int(rng.integers(40, 160))
    body_words = [vocab[j] for j in rng.choice(len(vocab), size=n_body, p=probs)]
    # super-head terms in ~95% of docs (skew driver)
    if rng.random() < 0.95:
        body_words = HEAD_TERMS + body_words

    # links: ~5 in-corpus (incl. possible self), 1 off-corpus, 1 anchored
    n_links = int(rng.integers(3, 8))
    targets = [url_of(int(t)) for t in rng.integers(0, n_docs, size=n_links)]
    if rng.random() < 0.3:
        targets.append(url_of(i))  # self-link: must be dropped by G1
    links = "".join(f'<a href="{t}">{vocab[int(rng.integers(len(vocab)))]}</a> ' for t in targets)
    off = '<a href="http://offsite.example/page#frag">off</a>'

    cut = len(body_words) // 2
    para1 = " ".join(body_words[:cut])
    para2 = " ".join(body_words[cut:])
    title = " ".join(title_words)
    return (
        f"<html><head><title>{title}</title>"
        f"<script>var hidden_{i} = 'donotindex';</script>"
        f"<style>.c{i} {{ color: red; }}</style></head>"
        f"<body><p>{para1}</p> {links}{off} <div>{para2}</div></body></html>"
    )


def gen_pages_pdf(indices: np.ndarray, n_docs: int, seed: int = 42) -> pd.DataFrame:
    """Generate the pages table rows for the given doc indices (pandas)."""
    vocab = build_vocab(seed)
    probs = _zipf_probs(len(vocab))
    rows = []
    for i in indices:
        i = int(i)
        html = _make_html(i, n_docs, vocab, probs, seed)
        title, text = extract_text_and_title(html)
        rows.append(
            {
                "url": url_of(i),
                "warc_ts": EPOCH + dt.timedelta(seconds=i),
                "html": html.encode("utf-8"),
                "text": text,
                "lang": "en" if i % 50 else "de",
            }
        )
    return pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])


PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def gen_pages_df(spark, n_docs: int, seed: int = 42, partitions: int | None = None):
    """Distributed pages generation: spark.range -> mapInPandas (Arrow)."""
    if partitions is None:
        partitions = max(32, n_docs // 2_500)
    base = spark.range(0, n_docs, numPartitions=partitions)

    def gen(batches):
        for pdf in batches:
            yield gen_pages_pdf(pdf["id"].to_numpy(), n_docs, seed)

    return base.mapInPandas(gen, schema=PAGES_SCHEMA)


def write_pages(spark, out_dir: str, n_docs: int, seed: int = 42) -> None:
    gen_pages_df(spark, n_docs, seed).write.mode("overwrite").parquet(out_dir)


def gen_pageview_log_pdf(n_docs: int, seed: int = 42) -> pd.DataFrame:
    """NumViews input lines ``lang article views`` (LogMinerNumviews.java:60-73).

    Includes articles with and without ``.html``, off-corpus articles
    (ignored), and malformed rows (``views`` column non-numeric) that the
    miner must skip.
    """
    rng = np.random.default_rng(seed * 104729 + 7)
    n_lines = max(20, n_docs * 2)
    arts, langs, views = [], [], []
    for _ in range(n_lines):
        r = rng.random()
        i = int(rng.integers(0, n_docs))
        u = url_of(i)
        if r < 0.15:
            u = u.removesuffix(".html")  # accrues to u + '.html' if both exist
        elif r < 0.2:
            u = f"offcorpus{int(rng.integers(0, 1000))}"
        arts.append(u)
        langs.append("en" if rng.random() < 0.9 else "fr")
        v = int(rng.zipf(1.5))
        views.append(str(v) if rng.random() > 0.02 else "notanumber")
    return pd.DataFrame({"lang": langs, "article": arts, "views": views})


def gen_clustered_embeddings(
    spark,
    n: int,
    dim: int = 256,
    nlist: int = 64,
    noise: float = 0.15,
    seed: int = 11,
    partitions: int = 16,
):
    """Deterministic clustered unit vectors for ANN/IVF fixtures and
    benches: row i = normalize(proto[i % nlist] + N(0, noise)), per-row
    rng keyed by vec_id (partition-invariant).  The SAME generator backs
    tests/test_dedup_similarity.py::test_ivf_kmeans_recall_realistic_dim
    and bench/ivf_kmeans.py so the test and the bench measure the same
    corpus shape.  Returns (vec_id long, embedding array<double>)."""
    protos = np.random.default_rng(seed).normal(size=(nlist, dim))
    protos /= np.linalg.norm(protos, axis=1, keepdims=True)
    protos_b = spark.sparkContext.broadcast(protos)

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            P = protos_b.value
            vecs = []
            for i in ids:
                r = np.random.default_rng(1000 + int(i))
                v = P[int(i) % len(P)] + r.normal(size=P.shape[1]) * noise
                v /= np.linalg.norm(v)
                vecs.append(v.tolist())
            yield pd.DataFrame({"vec_id": ids, "embedding": vecs})

    return spark.range(n, numPartitions=partitions).mapInPandas(
        gen, "vec_id long, embedding array<double>"
    )
