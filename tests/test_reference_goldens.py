"""Parity with goldens emitted by the COMPILED reference Java code
(see tests/goldens/README.md)."""

import os

from websearchengine_spark.functions.porter import porter_step1
from websearchengine_spark.operators.query import parse_query

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")


def test_porter_matches_compiled_reference():
    n = 0
    with open(os.path.join(GOLDENS, "porter_step1_reference.tsv")) as f:
        for line in f:
            if line.startswith("#"):
                continue
            word, stem = line.rstrip("\n").split("\t")
            assert porter_step1(word.lower()) == stem, word
            n += 1
    assert n > 2500


def test_parse_query_matches_compiled_reference():
    n = 0
    with open(os.path.join(GOLDENS, "queryphrase_reference.tsv")) as f:
        for line in f:
            if line.startswith("#"):
                continue
            query, toks = line.rstrip("\n").split("\t")
            want = [t for t in (toks.split("\x1f") if toks else []) if t.strip()]
            assert parse_query(query) == want, query
            n += 1
    assert n > 150
