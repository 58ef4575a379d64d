"""TSV corpus / pageview-log source tests (S3/S4)."""

import pytest


@pytest.fixture(scope="module")
def tsv_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("tsv")
    p = d / "corpus.tsv"
    lines = [f"title {i}\tbody text number {i} with words\t{i * 10}" for i in range(50)]
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_load_tsv_corpus_line_numbers(spark, tsv_file):
    from websearchengine_spark.sources.tsv import load_tsv_corpus

    df = load_tsv_corpus(spark, tsv_file)
    rows = {r["doc_id"]: r for r in df.collect()}
    assert len(rows) == 50
    for i in range(50):
        assert rows[i]["title"] == f"title {i}"
        assert rows[i]["numviews"] == i * 10
        assert rows[i]["body"].startswith(f"body text number {i}")


def test_tsv_corpus_feeds_fullscan(spark, tsv_file):
    from websearchengine_spark.operators.fullscan import (
        prepare_fullscan,
        run_fullscan_query,
    )
    from websearchengine_spark.sources.tsv import load_tsv_corpus

    prep = prepare_fullscan(load_tsv_corpus(spark, tsv_file))
    top = run_fullscan_query(spark, prep, "number 7", "ql", k=3).collect()
    assert top[0]["doc_id"] == 7  # doc 7 contains both 'number' and '7'


def test_load_pageview_log(spark, tmp_path):
    from websearchengine_spark.operators.graph import numviews
    from websearchengine_spark.sources.tsv import load_pageview_log

    log = tmp_path / "pv.log"
    log.write_text(
        "en doc1.html 5\n"
        "en doc1.html 7\n"
        "fr doc2.html notanum\n"   # malformed views -> skipped
        "en offcorpus 9\n"          # not in corpus -> skipped
        "en doc2 3\n"               # accrues to doc2.html (both exist)
        "short\n"                   # <3 fields -> skipped
    )
    logs = load_pageview_log(spark, str(log))
    pages = spark.createDataFrame(
        [("doc1.html",), ("doc2.html",), ("doc2",)], "url string"
    )
    got = {r["url"]: r["numviews"] for r in numviews(pages, logs).collect()}
    assert got == {"doc1.html": 12, "doc2.html": 3, "doc2": 0}
