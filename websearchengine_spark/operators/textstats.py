"""Text analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All native column expressions over a documents-shaped DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from websearchengine_spark.operators.dedup import _hash32, char_shingles
from websearchengine_spark.operators.util import widen_for_explode

# tiny in-code stopword profiles for the n-gram/stopword language heuristic
LANG_PROFILES = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "pour", "dans"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "para", "en", "que"],
}


def _tokens(text_col: str):
    return F.filter(F.split(F.lower(text_col), r"\s+"), lambda t: t != "")


def lang_id(docs: DataFrame, text_col: str = "text", min_ratio: float = 0.02) -> DataFrame:
    """(doc_id, lang_pred, best_ratio): argmax stopword-hit ratio."""
    toks = widen_for_explode(docs).select(
        "doc_id", F.explode(_tokens(text_col)).alias("term")
    )
    agg = toks.groupBy("doc_id").agg(
        F.count("*").alias("n"),
        *[
            F.sum(F.when(F.col("term").isin(words), 1).otherwise(0)).alias(f"_h_{lang}")
            for lang, words in LANG_PROFILES.items()
        ],
    )
    ratios = [(F.col(f"_h_{lang}") / F.col("n")).alias(lang) for lang in LANG_PROFILES]
    scored = agg.select("doc_id", *ratios)
    langs = list(LANG_PROFILES)
    arr = F.array(*[F.col(lang) for lang in langs])
    best = F.array_max(arr)
    pred = F.when(best < min_ratio, F.lit("und"))
    # argmax with first-wins tie-break in LANG_PROFILES order
    expr = None
    for lang in reversed(langs):
        expr = F.when(F.col(lang) == best, F.lit(lang)) if expr is None else F.when(
            F.col(lang) == best, F.lit(lang)
        ).otherwise(expr)
    return scored.select(
        "doc_id",
        pred.otherwise(expr).alias("lang_pred"),
        F.round(best, 6).alias("best_ratio"),
    )


def quality_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc quality features + a composite [0,1] score.

    Features: token count, type-token ratio, mean token length,
    punctuation ratio, max token repetition share.
    """
    toks = widen_for_explode(docs).select(
        "doc_id", F.explode(_tokens(text_col)).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    feats = tf.groupBy("doc_id").agg(
        F.sum("tf").alias("n_tokens"),
        (F.count("*") / F.sum("tf")).alias("ttr"),
        (F.sum(F.length("term") * F.col("tf")) / F.sum("tf")).alias("mean_tok_len"),
        (F.max("tf") / F.sum("tf")).alias("top_tok_share"),
    )
    punct = docs.select(
        "doc_id",
        (
            F.length(F.regexp_replace(text_col, r"[A-Za-z0-9\s]", ""))
            / F.greatest(F.length(text_col), F.lit(1))
        ).alias("punct_ratio"),
    )
    f = feats.join(punct, "doc_id")
    score = (
        F.least(F.col("n_tokens") / 50.0, F.lit(1.0)) * 0.3
        + F.least(F.col("ttr") * 2.0, F.lit(1.0)) * 0.3
        + (1.0 - F.least(F.col("punct_ratio") * 5.0, F.lit(1.0))) * 0.2
        + (1.0 - F.least(F.col("top_tok_share") * 4.0, F.lit(1.0))) * 0.2
    )
    return f.select(
        "doc_id",
        "n_tokens",
        F.round("ttr", 6).alias("ttr"),
        F.round("mean_tok_len", 6).alias("mean_tok_len"),
        F.round("punct_ratio", 6).alias("punct_ratio"),
        F.round("top_tok_share", 6).alias("top_tok_share"),
        F.round(score, 6).alias("quality"),
    )


BPEISH_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, ws_tokens, bpeish_tokens): whitespace + BPE-ish regex."""
    return docs.select(
        "doc_id",
        F.size(_tokens(text_col)).cast("long").alias("ws_tokens"),
        F.size(F.expr(
            f"regexp_extract_all(regexp_replace(lower({text_col}), '\\\\s+', ' '), '{BPEISH_PATTERN}', 0)"
        )).cast("long").alias("bpeish_tokens"),
    )


def doc_fingerprints(docs: DataFrame, text_col: str = "text", shingle_k: int = 8) -> DataFrame:
    """(doc_id, fingerprint): min rolling-window shingle hash (winnowing
    base case: window = whole doc)."""
    sh = char_shingles(docs, text_col, shingle_k)
    return sh.groupBy("doc_id").agg(
        F.min(_hash32(F.col("shingle"), 0)).alias("fingerprint")
    )
