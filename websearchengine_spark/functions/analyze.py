"""Analyzer chain: tokenize -> lowercase -> Porter step 1 -> length filter.

Reproduces the reference's indexing analyzer exactly
(IndexerInvertedCompressed.java:96-124):

  * tokenize: ``java.util.Scanner`` default whitespace split (:96-100)
    -> Python ``str.split()`` (both split on any whitespace run and drop
    empties; the corpus is controlled ASCII + chosen Unicode, where the
    two whitespace definitions agree)
  * lowercase each raw token (:101)
  * Porter STEP 1 ONLY, skipped for tokens of length <= 2 (:102-105,
    PorterStemming.java:550-562)
  * drop stemmed tokens with len < 1 or len > 20 (:107-109)
  * positions are 0-based indices over KEPT tokens only
    (``passageLength`` increments after the filter, :121-123), and
    doc length = number of kept tokens (:135)

The same chain is applied to query words at retrieval time
(IndexerInvertedCompressed.java:482-493), except the query path applies
no length filter — it stems and looks up directly.  We mirror that.

This module is pure Python/pandas; the Spark entry point is
``analyze_series`` which is called from inside an Arrow-batched UDF
(no per-row Python at the Spark API layer).
"""

from __future__ import annotations

from websearchengine_spark.functions.porter import porter_step1

MIN_TOKEN_LEN = 1
MAX_TOKEN_LEN = 20

# process-level memo: the head of the term distribution is tiny compared to
# token count (Zipf), so memoizing the stemmer turns the per-token cost into
# a dict hit for virtually every token in a batch.
_STEM_CACHE: dict[str, str] = {}


def _stem_cached(token: str) -> str:
    st = _STEM_CACHE.get(token)
    if st is None:
        st = porter_step1(token)
        if len(_STEM_CACHE) < 1_000_000:
            _STEM_CACHE[token] = st
        return st
    return st


def analyze_text(text: str) -> list[str]:
    """Full analyzer chain over one document's extracted text.

    Returns the list of kept tokens in order; list index == the
    reference's position value.
    """
    if not text:
        return []
    out = []
    for raw in text.split():
        tok = _stem_cached(raw.lower())
        if MIN_TOKEN_LEN <= len(tok) <= MAX_TOKEN_LEN:
            out.append(tok)
    return out


def analyze_query_word(word: str) -> str:
    """Query-side analysis of a single word: lowercase + Porter step 1.

    Mirrors IndexerInvertedCompressed.java:486-490 (no length filter on
    the query path).
    """
    return porter_step1(word.lower())
