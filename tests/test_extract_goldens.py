"""Byte-identity goldens for the pinned extractor (SURVEY §5.2(2)):
each committed <url>.html must extract to exactly <url>.txt.  Protects
the extractor spec across sessions — any behavior change breaks these
before it silently changes every doc_len/tf in the index."""

import glob
import os

from websearchengine_spark.functions.extract import extract_text_and_title

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens", "extract")


def test_extractor_byte_identity_goldens():
    htmls = sorted(glob.glob(os.path.join(GOLDEN_DIR, "*.html")))
    # *.html.html are alias-url fixtures; both spellings are html inputs
    inputs = [p for p in htmls if not p.endswith(".txt")]
    assert len(inputs) >= 9
    checked = 0
    for hp in inputs:
        tp = hp[: -len(".html")] + ".txt"
        if not os.path.exists(tp):
            continue
        with open(hp, "rb") as f:
            html = f.read()
        with open(tp, encoding="utf-8") as f:
            want = f.read()
        _, text = extract_text_and_title(html)
        assert text == want, hp
        checked += 1
    assert checked >= 9
