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


def _lines(text_col: str):
    return F.filter(F.split(text_col, "\n"), lambda l: l != "")


def gopher_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition/quality features per document (Rae et al.
    2021 "Scaling Language Models", appendix A1 filter family — the
    standard pre-training corpus filters the reference-era C4/Gopher
    pipelines apply).

    Columns (all ratios rounded 6dp; ``gopher_pass`` is 0/1 int):
      n_words, mean_word_len, n_lines,
      dup_line_frac        — 1 - distinct/total lines,
      dup_line_char_frac   — chars in repeat occurrences of a line / line chars,
      top_2gram_char_frac  — chars covered by the most frequent word
                             2-gram (count desc, gram asc tie-break),
      symbol_word_ratio    — ('#' chars + '...' occurrences) / words,
      bullet_line_frac, ellipsis_line_frac,
      gopher_pass          — the composite keep/drop decision.

    Scale story: everything except the 2-gram mode is ONE explode-free
    projection (array ops over the token/line arrays — line duplicate
    mass via length-sum minus distinct-length-sum, no per-line rows).
    The 2-gram mode is a linear explode (n_words-1 rows/doc, same order
    as the tf pass every index build already does) -> partial-agg
    groupBy(doc_id, gram) -> groupBy(doc_id) min(struct(-cnt, gram))
    argmax -> join back on doc_id.  Two shuffles total, both keyed and
    combinable map-side; no quadratic term anywhere.
    """
    toks = _tokens(text_col)
    lines = _lines(text_col)
    n_words = F.size(toks)
    word_chars = F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t))
    line_chars = F.aggregate(lines, F.lit(0), lambda a, l: a + F.length(l))
    dup_line_chars = line_chars - F.aggregate(
        F.array_distinct(lines), F.lit(0), lambda a, l: a + F.length(l)
    )
    hash_chars = F.length(text_col) - F.length(F.replace(F.col(text_col), F.lit("#"), F.lit("")))
    ellipsis_occ = (
        F.length(text_col) - F.length(F.replace(F.col(text_col), F.lit("..."), F.lit("")))
    ) / 3
    bullet_lines = F.size(F.filter(lines, lambda l: F.substring(l, 1, 2).isin("- ", "* ")))
    ellipsis_lines = F.size(F.filter(lines, lambda l: l.endswith("...")))

    base = docs.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        word_chars.alias("_word_chars"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(F.array_distinct(lines)).alias("_n_distinct_lines"),
        line_chars.alias("_line_chars"),
        dup_line_chars.alias("_dup_line_chars"),
        (hash_chars + ellipsis_occ).alias("_symbols"),
        bullet_lines.alias("_bullet_lines"),
        ellipsis_lines.alias("_ellipsis_lines"),
        toks.alias("_toks"),
    )

    # most-frequent word 2-gram per doc: linear explode -> count -> argmax
    grams = widen_for_explode(base).select(
        "doc_id",
        F.explode(
            F.when(
                F.size("_toks") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("_toks") - 1),
                    lambda i: F.concat(
                        F.element_at("_toks", i), F.lit(" "), F.element_at("_toks", i + 1)
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("gram"),
    )
    top_gram = (
        grams.groupBy("doc_id", "gram")
        .agg(F.count("*").alias("cnt"))
        .groupBy("doc_id")
        .agg(F.min(F.struct((-F.col("cnt")).alias("negc"), F.col("gram"))).alias("_t"))
        .select(
            "doc_id",
            (-F.col("_t.negc")).alias("_top_cnt"),
            (F.length("_t.gram") - 1).alias("_top_gram_chars"),
        )
    )

    j = base.join(top_gram, "doc_id", "left")
    nw = F.greatest(F.col("n_words"), F.lit(1))
    nl = F.greatest(F.col("n_lines"), F.lit(1))
    lc = F.greatest(F.col("_line_chars"), F.lit(1))
    wc = F.greatest(F.col("_word_chars"), F.lit(1))
    mean_word_len = F.col("_word_chars") / nw
    dup_line_frac = (F.col("n_lines") - F.col("_n_distinct_lines")) / nl
    dup_line_char_frac = F.col("_dup_line_chars") / lc
    top_2gram_char_frac = F.coalesce(
        F.col("_top_cnt") * F.col("_top_gram_chars") / wc, F.lit(0.0)
    )
    symbol_word_ratio = F.col("_symbols") / nw
    bullet_line_frac = F.col("_bullet_lines") / nl
    ellipsis_line_frac = F.col("_ellipsis_lines") / nl
    gopher_pass = (
        (F.col("n_words") >= 50)
        & (F.col("n_words") <= 100_000)
        & (mean_word_len >= 3)
        & (mean_word_len <= 10)
        & (symbol_word_ratio <= 0.1)
        & (dup_line_frac <= 0.3)
        & (top_2gram_char_frac <= 0.2)
        & (bullet_line_frac <= 0.9)
        & (ellipsis_line_frac <= 0.3)
    )
    return j.select(
        "doc_id",
        "n_words",
        F.round(mean_word_len, 6).alias("mean_word_len"),
        "n_lines",
        F.round(dup_line_frac, 6).alias("dup_line_frac"),
        F.round(dup_line_char_frac, 6).alias("dup_line_char_frac"),
        F.round(top_2gram_char_frac, 6).alias("top_2gram_char_frac"),
        F.round(symbol_word_ratio, 6).alias("symbol_word_ratio"),
        F.round(bullet_line_frac, 6).alias("bullet_line_frac"),
        F.round(ellipsis_line_frac, 6).alias("ellipsis_line_frac"),
        gopher_pass.cast("int").alias("gopher_pass"),
    )


# PII patterns chosen to parse identically under Java regex (Spark) and
# RE2 (DuckDB oracle): no alternation, no backreferences, greedy-only —
# leftmost-greedy and leftmost-longest coincide for these.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+?\d[\d\- ]{7,}\d"


def pii_redact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """C4-style PII scrubbing: redact emails, then IPv4 literals, then
    phone-like digit runs; count replacements per stage.

    Returns (doc_id, n_emails, n_ipv4, n_phones, redacted).  Counts are
    taken on each stage's INPUT (i.e. the number of replacements that
    stage makes); redaction tokens contain no digits so later stages
    never re-match earlier ones.  Pure column expressions — one
    projection, no shuffle, scales as a map-only pass at any corpus
    size.
    """
    t0 = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(t0, F.lit(EMAIL_RE), F.lit(0)))
    t1 = F.regexp_replace(t0, EMAIL_RE, "<EMAIL>")
    n_ipv4 = F.size(F.regexp_extract_all(t1, F.lit(IPV4_RE), F.lit(0)))
    t2 = F.regexp_replace(t1, IPV4_RE, "<IP>")
    n_phones = F.size(F.regexp_extract_all(t2, F.lit(PHONE_RE), F.lit(0)))
    t3 = F.regexp_replace(t2, PHONE_RE, "<PHONE>")
    return docs.select(
        "doc_id",
        n_emails.cast("long").alias("n_emails"),
        n_ipv4.cast("long").alias("n_ipv4"),
        n_phones.cast("long").alias("n_phones"),
        t3.alias("redacted"),
    )


def hash_split(
    docs: DataFrame,
    key_col: str = "doc_id",
    buckets: int = 100,
    train_pct: int = 90,
    val_pct: int = 5,
) -> DataFrame:
    """Deterministic train/val/test assignment by content-stable hash.

    bucket = md5-hash32("0|" + key) mod ``buckets``; split boundaries at
    ``train_pct`` and ``train_pct+val_pct``.  Hashing the KEY (url/doc
    id), not a random(), makes the split reproducible across reruns,
    engines, and corpus growth — a doc never migrates between splits
    when other docs are added.  One projection, no shuffle.
    """
    bucket, split = split_exprs(key_col, buckets, train_pct, val_pct)
    return docs.select("doc_id", bucket.alias("bucket"), split.alias("split"))


def split_exprs(
    key_col: str = "doc_id",
    buckets: int = 100,
    train_pct: int = 90,
    val_pct: int = 5,
) -> tuple["F.Column", "F.Column"]:
    """The (bucket, split) column expressions behind ``hash_split`` —
    exposed so composed pipelines can inline the assignment into an
    existing projection instead of paying a join back onto a deep
    lineage (pipeline.clean_corpus does this)."""
    if train_pct + val_pct >= buckets:
        raise ValueError("train_pct + val_pct must leave room for the test split")
    bucket = _hash32(F.col(key_col).cast("string"), 0) % buckets
    split = (
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return bucket.cast("long"), split


def boilerplate_lines(
    docs: DataFrame, text_col: str = "text", min_docs: int = 10
) -> DataFrame:
    """(line, n_docs): non-empty lines appearing in >= ``min_docs``
    DISTINCT documents — corpus-level boilerplate (nav bars, cookie
    banners, footers; the exact-line dedup stage of RefinedWeb /
    CCNet-family pipelines).

    One linear explode (a row per line — no amplification beyond the
    corpus's own line count) into one distinct-aggregation keyed by
    line.  The output is aggregated DOWN to the boilerplate vocabulary,
    typically tiny relative to the corpus."""
    lines = widen_for_explode(docs).select(
        "doc_id",
        F.explode(F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")).alias("line"),
    )
    return (
        lines.filter(F.col("line") != "")
        .groupBy("line")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def strip_boilerplate(
    docs: DataFrame, text_col: str = "text", min_docs: int = 10
) -> DataFrame:
    """(doc_id, text, n_removed): every document with its corpus-level
    boilerplate lines (see ``boilerplate_lines``) removed, remaining
    lines in original order; n_removed counts removed line INSTANCES.

    Plan shape: explode to one row per line, left-join the (small,
    aggregated-down — AQE broadcasts it when it fits) boilerplate
    table on the line key, then ONE groupBy(doc_id) rebuilds the text
    via array_sort(collect_list(struct(pos, line))) — collect_list
    drops the null'd boilerplate rows, array_sort restores line order.
    Empty lines are never boilerplate (paragraph structure survives).
    Linear in total line count at any corpus size."""
    bp = (
        boilerplate_lines(docs, text_col, min_docs)
        .select("line")
        .withColumn("_bp", F.lit(True))
    )
    lines = widen_for_explode(docs).select(
        "doc_id",
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
        ).alias("pos", "line"),
    )
    marked = lines.join(bp, "line", "left")
    return marked.groupBy("doc_id").agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("_bp").isNull(), F.struct("pos", "line"))
                    )
                ),
                lambda s: s["line"],
            ),
        ).alias(text_col),
        F.sum(F.when(F.col("_bp"), 1).otherwise(0)).cast("long").alias("n_removed"),
    )


# tracking query-string keys dropped by normalize_url; anchored,
# alternation-of-literals only (parses identically under Java regex and
# RE2 — the pii_redact portability discipline)
TRACKING_PARAM_RE = r"^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|mc_eid)(=|$)"


def normalize_url(col) -> "F.Column":
    """Column expression: canonical form of an http(s) URL for
    URL-level deduplication (the first dedup stage of every web-corpus
    pipeline).  Rules: drop the fragment; lowercase scheme and
    host[:port]; strip the scheme's default port (:80 http, :443
    https); strip tracking query params (utm_*, fbclid, gclid,
    msclkid, mc_eid) preserving the order of the rest; strip a
    trailing '/' from the path (so host, host/ and host/a/ vs /a
    collide).  Path and query case are PRESERVED (paths are
    case-sensitive on most origins).  Pure column algebra — the query
    string is split/filtered/rejoined as an array, avoiding
    global-regex-replace delimiter edge cases; map-only, no shuffle."""
    u = F.regexp_replace(col, "#.*", "")
    head = F.regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*", 0)
    head_l = F.lower(head)
    head_n = (
        F.when(head_l.startswith("http://"), F.regexp_replace(head_l, ":80$", ""))
        .when(head_l.startswith("https://"), F.regexp_replace(head_l, ":443$", ""))
        .otherwise(head_l)
    )
    rest = u.substr(F.length(head) + 1, F.length(u))
    path = F.regexp_extract(rest, "^[^?]*", 0)
    path_n = F.regexp_replace(path, "/$", "")
    qs = F.regexp_extract(rest, r"\?(.*)$", 1)
    params = F.filter(
        F.split(qs, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    q_n = F.concat_ws("&", params)
    return F.concat(
        head_n,
        path_n,
        F.when(q_n != "", F.concat(F.lit("?"), q_n)).otherwise(F.lit("")),
    )


def url_dedup(df: DataFrame, url_col: str = "url") -> DataFrame:
    """(norm_url, n_docs, keep_doc_id): group documents by normalized
    URL (see ``normalize_url``), counting collisions and electing the
    smallest doc_id as the canonical copy.  One hash aggregation —
    map-side partial combine, single shuffle on the normalized key.

    Rows with a NULL url are EXCLUDED: groupBy treats NULL as one key,
    so a crawl shard of missing-url docs would otherwise collapse into
    a single bogus "duplicate" group with one elected keeper.  Callers
    union missing-url docs back as keepers."""
    return (
        df.filter(F.col(url_col).isNotNull())
        .select("doc_id", normalize_url(F.col(url_col)).alias("norm_url"))
        .groupBy("norm_url")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("doc_id").alias("keep_doc_id"),
        )
    )
