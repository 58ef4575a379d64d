"""End-to-end clean_corpus pipeline composition (operators/pipeline.py).

Each stage has its own exhaustive tests (test_dedup_similarity.py,
test_textstats.py); these cover the COMPOSITION: stage order, the
audit-frame partition invariant, counter threading, and the
cleaning-enables-dedup interplay (PII redaction + boilerplate removal
equalizing docs so the exact near-dup stage can catch them).
"""

import pandas as pd
import pytest

from websearchengine_spark.operators.pipeline import STATUSES, clean_corpus


def _longtext(seed: int, n: int = 60) -> str:
    """60 distinct medium-length words -> passes every Gopher gate."""
    return " ".join(f"w{seed}x{i}" for i in range(1, n + 1))


def _df(spark, rows, cols=("doc_id", "url", "text")):
    return spark.createDataFrame(pd.DataFrame(rows, columns=list(cols)))


def test_clean_corpus_stage_partition(spark):
    """One row per input doc; status = FIRST dropping stage; url_dup
    rows carry no text; splits only on kept docs; counters threaded."""
    # the planted boilerplate line is in 3 docs (>= min_docs=3); the
    # content line docs 0 and 3 share is in only 2, so it SURVIVES the
    # line-dedup stage and reaches near-dup — at min_docs=2 the shared
    # content line itself would be stripped as boilerplate first
    bp = "\nSUBSCRIBE NOW"
    rows = [
        (0, "http://a.com/x", _longtext(0) + " alice@y.org" + bp),
        (1, "HTTP://A.COM/x#frag", "never entered the text stages"),
        (2, "http://b.com/", "too short" + bp),
        (3, None, _longtext(0) + " bob@x.com" + bp),
        (4, "http://c.com/", _longtext(4)),
    ]
    out = clean_corpus(
        _df(spark, rows), boilerplate_min_docs=3, scrub_n=None
    ).collect()
    got = {r["doc_id"]: r for r in out}
    assert len(got) == 5
    assert {r["status"] for r in out} <= set(STATUSES)
    assert got[0]["status"] == "kept"
    assert got[1]["status"] == "url_dup"       # same normalized URL, higher id
    assert got[2]["status"] == "quality"       # 2 words fails Gopher n_words
    assert got[3]["status"] == "near_dup"      # equalized by redact+strip
    assert got[4]["status"] == "kept"
    # url_dup never entered the text stages
    assert got[1]["text"] is None and got[1]["n_pii"] is None
    # redaction + boilerplate removal equalized docs 0 and 3
    assert got[0]["text"] == got[3]["text"] == _longtext(0) + " <EMAIL>"
    assert got[0]["n_pii"] == 1 and got[0]["n_boilerplate"] == 1
    assert got[3]["n_pii"] == 1 and got[3]["n_boilerplate"] == 1
    assert got[4]["n_boilerplate"] == 0      # no bp line planted in 4
    # splits assigned exactly to kept docs
    for d, r in got.items():
        assert (r["split"] is not None) == (r["status"] == "kept"), d
        assert (r["bucket"] is not None) == (r["status"] == "kept"), d


def test_clean_corpus_scrub_stage_threads_counters(spark):
    """With the scrub stage on, corpus-repeated windows vanish and
    n_scrubbed lands next to the other counters."""
    shared = "p1 p2 p3 p4"
    rows = [(d, f"{shared} tail{d} more{d}") for d in range(3)]
    out = clean_corpus(
        _df(spark, rows, cols=("doc_id", "text")),
        url_col=None,
        boilerplate_min_docs=99,
        scrub_n=4,
        scrub_min_count=3,
        quality=False,
        near_dup=None,
    ).collect()
    got = {r["doc_id"]: r for r in out}
    for d in range(3):
        assert got[d]["status"] == "kept"
        assert got[d]["text"] == f"tail{d} more{d}"
        assert got[d]["n_scrubbed"] == 4
        assert got[d]["n_boilerplate"] == 0


def test_clean_corpus_minhash_mode_collapses_cluster(spark):
    """near_dup='minhash': near-identical docs cluster and the min id
    survives; the distinct doc is untouched."""
    base = _longtext(7, n=40)
    rows = [
        (10, base),
        (11, base.replace("w7x20", "w7xZZ")),   # one token changed
        (12, _longtext(8, n=40)),
    ]
    out = clean_corpus(
        _df(spark, rows, cols=("doc_id", "text")),
        url_col=None,
        boilerplate_min_docs=99,
        scrub_n=None,
        quality=False,
        near_dup="minhash",
    ).collect()
    got = {r["doc_id"]: r["status"] for r in out}
    assert got == {10: "kept", 11: "near_dup", 12: "kept"}


def test_clean_corpus_checkpoint_dir_is_pure_barrier(spark, tmp_path):
    """checkpoint_dir materializes the cleaned frame without changing
    any output value."""
    rows = [
        (0, "http://a.com/", _longtext(0) + " x@y.zz"),
        (1, "http://a.com", "tiny"),
        (2, "http://b.com/", _longtext(2)),
    ]
    kw = dict(boilerplate_min_docs=2, scrub_n=4, scrub_min_count=2)
    plain = sorted(map(tuple, clean_corpus(_df(spark, rows), **kw).collect()))
    ckpt = sorted(map(tuple, clean_corpus(
        _df(spark, rows), checkpoint_dir=str(tmp_path / "ck"), **kw
    ).collect()))
    assert plain == ckpt
    assert (tmp_path / "ck").exists()


def test_clean_corpus_null_text_is_empty_doc(spark):
    """A NULL text row flows through as an empty doc: zero counters
    (not NULL), quality-dropped, never crashes a stage."""
    rows = [(0, None), (1, _longtext(1))]
    out = clean_corpus(
        _df(spark, rows, cols=("doc_id", "text")),
        url_col=None, boilerplate_min_docs=99, scrub_n=4, scrub_min_count=2,
    ).collect()
    got = {r["doc_id"]: r for r in out}
    assert got[0]["status"] == "quality" and got[0]["text"] == ""
    assert (got[0]["n_pii"], got[0]["n_boilerplate"], got[0]["n_scrubbed"]) == (0, 0, 0)
    assert got[1]["status"] == "kept"


def test_clean_corpus_rejects_bad_near_dup(spark):
    with pytest.raises(ValueError, match="near_dup"):
        clean_corpus(
            _df(spark, [(0, "u", "t")]), near_dup="fuzzy"
        )
