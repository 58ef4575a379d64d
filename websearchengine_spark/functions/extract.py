"""Pinned HTML -> (title, text) extractor.

The reference extracts text with Jsoup 1.8.1: ``doc.title()`` and
``doc.text()`` (IndexerInvertedCompressed.java:85-93).  Jsoup's
``Document.text()`` semantics, which this module pins as THE project
extractor spec (SURVEY.md §5.2(2)):

  * only text nodes contribute; ``<script>``/``<style>`` contents are
    DataNodes in Jsoup and are excluded
  * ``<title>`` text IS part of the document text (Jsoup traverses the
    whole tree including <head>)
  * whitespace runs collapse to a single space
  * block-level element boundaries (p, div, li, ...) and <br> act as a
    word boundary; inline tags (a, b, span, ...) do not split words
  * the result is trimmed; HTML entities are decoded

Byte-identity contract (BASELINE.json input_hint): since WE generate the
fixture HTML (FIXTURES.md §1), this extractor is the reference
implementation the goldens are produced with, and the corpus ``text``
column must equal its output per url, byte for byte.

Implemented on ``html.parser.HTMLParser`` (stdlib) — pure Python, called
from an Arrow-batched UDF over pandas Series of HTML bytes.
"""

from __future__ import annotations

from html.parser import HTMLParser

_SKIP_CONTENT = {"script", "style"}

# tags that do NOT introduce a word boundary (Jsoup: only block-level
# elements and <br> emit whitespace between text runs)
_INLINE = {
    "a", "abbr", "b", "bdi", "bdo", "cite", "code", "data", "dfn",
    "em", "font", "i", "kbd", "label", "mark", "q", "s", "samp",
    "small", "span", "strike", "strong", "sub", "sup", "time", "tt",
    "u", "var", "wbr",
}


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self._skip_depth = 0
        self._title_depth = 0
        self.title_parts: list[str] = []
        self._seen_title = False

    def _boundary(self, tag: str) -> None:
        if tag not in _INLINE:
            self.parts.append(" ")

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_CONTENT:
            self._skip_depth += 1
            return
        if tag == "title":
            self._title_depth += 1
        self._boundary(tag)

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_CONTENT:
            if self._skip_depth > 0:
                self._skip_depth -= 1
            return
        if tag == "title" and self._title_depth > 0:
            self._title_depth -= 1
            self._seen_title = True
        self._boundary(tag)

    def handle_startendtag(self, tag: str, attrs) -> None:
        self.handle_starttag(tag, attrs)

    def handle_data(self, data: str) -> None:
        if self._skip_depth > 0:
            return
        if self._title_depth > 0 and not self._seen_title:
            self.title_parts.append(data)
        self.parts.append(data)


def extract_text_and_title(html: str | bytes) -> tuple[str, str]:
    """Return (title, text) for one HTML document, per the pinned spec."""
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8", errors="replace")
    p = _TextExtractor()
    p.feed(html)
    p.close()
    title = " ".join("".join(p.title_parts).split())
    text = " ".join("".join(p.parts).split())
    return title, text
