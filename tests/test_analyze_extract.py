"""Analyzer-chain and pinned-extractor unit tests (SURVEY.md §5.2(1-2))."""

from websearchengine_spark.functions.analyze import analyze_query_word, analyze_text
from websearchengine_spark.functions.extract import extract_text_and_title


def test_analyze_text_chain():
    # lowercase + step-1 stem + 1..20 length filter, positions over kept tokens
    toks = analyze_text("The Ponies AGREED meetings x " + "z" * 25 + " ok")
    assert toks == ["the", "poni", "agree", "meet", "x", "ok"]


def test_analyze_drops_over_20_after_stemming():
    # 21 chars raw, stems to 20 -> kept (filter is applied AFTER stemming,
    # IndexerInvertedCompressed.java:107)
    w = "b" * 19 + "ed"  # ends 'ed' but no vowel in stem -> unchanged, len 21
    assert analyze_text(w) == []
    w2 = "ab" * 9 + "a" + "ed"  # 21 chars, 'ed' dropped -> 19-char stem kept
    assert analyze_text(w2) == ["ab" * 9 + "a"]


def test_analyze_empty():
    assert analyze_text("") == []
    assert analyze_text("   \t\n ") == []
    assert analyze_text(None) == []


def test_analyze_query_word():
    assert analyze_query_word("Meetings") == "meet"
    assert analyze_query_word("as") == "as"


def test_extract_basic():
    html = (
        "<html><head><title>My Title</title>"
        "<script>var x = 'hidden';</script>"
        "<style>.c { color: red }</style></head>"
        "<body><p>Hello   world</p><div>second  block</div></body></html>"
    )
    title, text = extract_text_and_title(html)
    assert title == "My Title"
    assert "hidden" not in text
    assert "color" not in text
    # title text is part of document text (Jsoup Document.text() semantics)
    assert text == "My Title Hello world second block"


def test_extract_inline_tags_do_not_split_words():
    _, text = extract_text_and_title("<p>bo<b>ld</b> and <i>it</i>alic</p>")
    assert text == "bold and italic"


def test_extract_block_tags_split_words():
    _, text = extract_text_and_title("<div>one</div><div>two</div>")
    assert text == "one two"
    _, text = extract_text_and_title("line<br>break")
    assert text == "line break"


def test_extract_entities_decoded():
    _, text = extract_text_and_title("<p>a &amp; b &lt;c&gt;</p>")
    assert text == "a & b <c>"


def test_extract_bytes_input():
    title, text = extract_text_and_title(b"<title>t</title><p>body</p>")
    assert title == "t"
    assert text == "t body"


def test_extract_no_title():
    title, text = extract_text_and_title("<p>just body</p>")
    assert title == ""
    assert text == "just body"
