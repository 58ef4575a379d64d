"""The HTTP serve loop (websearchengine_spark/serve.py) — curl-style
integration over real sockets, plus the render-layer XSS hardening
(deliberate divergence from the reference's raw-innerHTML template)."""

import os
import urllib.error
import urllib.request

import pytest


def _get(url: str) -> str:
    with urllib.request.urlopen(url, timeout=120) as resp:
        assert resp.status == 200
        return resp.read().decode("utf-8")


@pytest.fixture(scope="module")
def served(spark, corpus_pdf, tmp_path_factory):
    from websearchengine_spark.operators.build import build_index
    from websearchengine_spark.serve import SearchHTTPServer

    base = tmp_path_factory.mktemp("serve")
    root = str(base / "idx")
    build_index(
        spark, spark.createDataFrame(corpus_pdf), root,
        n_shards=4, n_groups=2, keep_doc_tokens=True,
    )
    clicks = str(base / "clicks")
    srv = SearchHTTPServer(spark, root, click_log_dir=clicks)
    srv.start()
    yield {"base": f"http://127.0.0.1:{srv.port}", "clicks": clicks, "root": root}
    srv.stop()


def test_search_endpoint_text_and_html(served):
    txt = _get(f"{served['base']}/search?query=web+search&ranker=bm25&num=3")
    lines = [l for l in txt.splitlines() if l]
    assert 0 < len(lines) <= 3
    assert all(len(l.split("\t")) == 5 for l in lines)

    html = _get(
        f"{served['base']}/search?query=web+search&ranker=bm25&num=3&format=html"
    )
    assert html.startswith("<!DOCTYPE html>") and "{{" not in html


def test_prf_endpoint(served):
    body = _get(
        f"{served['base']}/prf?query=web+search&ranker=bm25&numdocs=5&numterms=3"
    )
    lines = [l for l in body.splitlines() if l]
    assert len(lines) == 3
    for l in lines:
        term, prob = l.split("\t")
        assert term and 0.0 < float(prob) <= 1.0
    assert _get(f"{served['base']}/prf?numdocs=5") == "No query is given!"


def test_page_summary_endpoint(served):
    body = _get(f"{served['base']}/page_summary?num=0")
    assert body.endswith(" ")
    assert 1 <= len(body.split()) <= 50


def test_prediction_endpoint(served):
    body = _get(f"{served['base']}/prediction?query=data+mining")
    # small corpus: every candidate list is just the token itself
    assert body == "data mining\n"


def test_click_logging_endpoint(spark, served):
    ok = _get(
        f"{served['base']}/click_loging?did=3&query=web+search&ranker=bm25&action=click"
    )
    assert ok == "Success!"
    # the spool is DIRECTLY ingestible by the clicklog readers' schema,
    # and values are url-decoded like /search decodes its own args
    from websearchengine_spark.streaming.clicklog import CLICK_SCHEMA

    rows = (
        spark.read.schema(CLICK_SCHEMA)
        .json(os.path.join(served["clicks"], "clicks.json"))
        .collect()
    )
    assert len(rows) >= 1
    r = rows[-1]
    assert (r["query"], r["doc_id"], r["action"]) == ("web search", 3, "click")
    assert r["ts"] is not None  # timestamp parsed, not null


def test_error_paths_stay_http(served):
    # bogus ranker: an error PAGE, not a dead socket (reference contract)
    body = _get(f"{served['base']}/search?query=x")
    assert "ranker" in body
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(f"{served['base']}/nope")
    assert ei.value.code == 404


def test_html_render_is_xss_hardened():
    """Reflected (query/ranker) and stored (crawled title) payloads
    render inert: placeholders are HTML-escaped, titles only ever
    appear base64-encoded and are decoded into TEXT nodes."""
    from websearchengine_spark.operators.render import (
        DEFAULT_HTML_TEMPLATE,
        format_html_results,
    )

    rows = [
        {
            "doc_id": 1,
            "title": '<img src=x onerror="alert(1)">',
            "score": 1.0,
            "pagerank": 0.0,
            "numviews": 0,
        }
    ]
    html = format_html_results(
        rows,
        query="<script>alert(1)</script>",
        ranker='"><script>steal()</script>',
    )
    assert "<script>alert(1)</script>" not in html
    assert "<script>steal()" not in html  # escaped to &lt;script&gt;... only
    assert "&lt;script&gt;" in html
    assert "<img" not in html  # the title travels base64-encoded only
    assert "innerHTML" not in DEFAULT_HTML_TEMPLATE
    assert "textContent" in DEFAULT_HTML_TEMPLATE


def test_backend_failure_answers_500_not_dead_socket(spark, built_index):
    """A Spark-side failure (doc_tokens table absent for /page_summary)
    answers 500 with the error text — the socket never just drops."""
    from websearchengine_spark.serve import SearchHTTPServer

    with SearchHTTPServer(spark, built_index) as srv:
        with pytest.raises(urllib.error.HTTPError) as ei:
            _get(f"http://127.0.0.1:{srv.port}/page_summary?num=0")
        assert ei.value.code == 500
        assert b"doc_tokens" in ei.value.read()  # the error TEXT is served


def test_non_loopback_bind_gets_generic_500_body(spark, built_index):
    """Bound to a non-loopback host, backend failures answer a GENERIC
    500 body — exception detail (paths, Spark internals) stays in the
    server-side log (ADVICE r4)."""
    from websearchengine_spark.serve import SearchHTTPServer

    with SearchHTTPServer(spark, built_index, host="0.0.0.0") as srv:
        with pytest.raises(urllib.error.HTTPError) as ei:
            _get(f"http://127.0.0.1:{srv.port}/page_summary?num=0")
        assert ei.value.code == 500
        body = ei.value.read()
        assert body == b"internal server error"
        assert b"doc_tokens" not in body


def test_grading_flow_prf_bhattacharyya_over_http(spark, served):
    """The reference's grading_hw3_4_3.sh workflow end-to-end over
    sockets: for each query, GET /prf?query=Q&ranker=comprehensive&
    numdocs=10&numterms=5 (the script's exact curl), parse the
    ``term\\tprob`` expansion lines, then compute the Bhattacharyya
    coefficient over every query pair exactly as the grading tool does
    (Bhattacharyya.java:117-147: symmetric, beta = sum over shared terms
    of sqrt(p1*p2)) — and check it equals the engine's own
    prf.bhattacharyya on the same expansions."""
    import itertools
    import math
    import urllib.parse

    from websearchengine_spark.operators.prf import bhattacharyya, prf_expand

    queries = ["web search", "google map", "data mining"]
    exp = {}
    for q in queries:
        enc = urllib.parse.quote(q)  # the script sed-encodes spaces as %20
        body = _get(
            f"{served['base']}/prf?query={enc}"
            "&ranker=comprehensive&numdocs=10&numterms=5"
        )
        rows = [line.split("\t") for line in body.splitlines() if line]
        assert len(rows) == 5  # numterms=5
        exp[q] = {t: float(p) for t, p in rows}
        assert all(p > 0 for p in exp[q].values())

    for q1, q2 in itertools.combinations(queries, 2):
        beta_http = sum(
            math.sqrt(exp[q1][t] * exp[q2][t])
            for t in exp[q1]
            if t in exp[q2]
        )
        beta_engine = bhattacharyya(
            prf_expand(
                spark, served["root"], q1,
                ranker="comprehensive", num_docs=10, num_terms=5,
            ),
            prf_expand(
                spark, served["root"], q2,
                ranker="comprehensive", num_docs=10, num_terms=5,
            ),
        )
        assert math.isclose(beta_http, beta_engine, rel_tol=0, abs_tol=1e-9)
