"""Physical-plan regression tests: the plans PLANS.md documents must be
the plans Catalyst produces (pushdown, pruning, broadcast, bounded-heap
top-k)."""

from websearchengine_spark.plans.audit import audit_plans, plan_of


def test_audit_plans_all_ok(spark, built_index):
    results = audit_plans(spark, built_index)
    failed = {k: ev for k, (ok, ev) in results.items() if not ok}
    assert not failed, failed


def test_build_has_single_wide_shuffle(spark, corpus_pdf):
    """The postings job plan contains exactly one Exchange caused by the
    occurrence groupBy (plus AQE artifacts), not a chain of them."""
    from pyspark.sql import functions as F

    from websearchengine_spark.operators.build import analyze_pages

    from websearchengine_spark.operators.build import PACK_BITS

    pages = spark.createDataFrame(corpus_pdf)
    analyzed = analyze_pages(pages)
    occs = analyzed.select(
        F.lit(0).cast("long").alias("doc_id"),
        F.size("tokens").alias("doc_len"),
        F.posexplode("tokens").alias("pos", "term"),
    )
    pk = F.shiftleft(F.col("doc_id"), PACK_BITS)
    plists = occs.select(
        "term",
        (pk + F.col("pos")).alias("occ_p"),
        (pk + F.col("doc_len")).alias("dl_p"),
    ).groupBy("term").agg(
        F.sort_array(F.collect_list("occ_p")).alias("occs"),
        F.sort_array(F.collect_set("dl_p")).alias("dls"),
    )
    import re

    p = plan_of(plists, "formatted")
    # one Exchange NODE (the formatted output mentions each node in both
    # the tree and the detail section; count detail headers)
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1, p


def test_kway_merge_plan_single_compressed_shuffle(spark, corpus_pdf, tmp_path):
    """K-way compaction's only wide operation is ONE Exchange over the
    already-compressed postings tables — no token rescan, no occurrence
    shuffle, regardless of how many segments merge (the LSM scale
    claim in operators/merge.py)."""
    import re

    from pyspark.sql import functions as F

    from websearchengine_spark.operators.build import build_index
    from websearchengine_spark.sources.storage import IndexStorage

    roots = []
    for i in range(3):
        lo, hi = 60 * i, min(60 * (i + 1), 200)
        pages = spark.createDataFrame(corpus_pdf.iloc[lo:hi])
        r = str(tmp_path / f"seg{i}")
        build_index(spark, pages, r, n_shards=3, n_groups=1)
        roots.append(r)
    parts = [
        IndexStorage(r).read_partitioned(spark, "postings").withColumn(
            "side", F.lit(i)
        )
        for i, r in enumerate(roots)
    ]
    both = parts[0]
    for q in parts[1:]:
        both = both.unionByName(q)
    grouped = (
        both.select("shard", "term", "side", "blocks")
        .groupBy("shard", "term")
        .agg(F.collect_list(F.struct("side", "blocks")).alias("parts"))
    )
    p = plan_of(grouped, "formatted")
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1, p
    # the scan reads the compressed postings tables, not pages/tokens
    assert "postings" in p


def test_lsh_bucket_plan_is_explode_free_and_shuffle_free(spark):
    """Round-4 de-amplification pin: sign-LSH computes every plane's dot
    product inside ONE projection over the array column — no per-(plane,
    dimension) Generate (the old shape emitted n_planes x n_dim rows per
    vector) and no Exchange at all (it used to need two aggregations to
    fold the exploded rows back)."""
    from websearchengine_spark.operators.similarity import lsh_bucket

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0, -0.5, 2.0]) for i in range(4)],
        "vec_id long, embedding array<double>",
    )
    p = plan_of(lsh_bucket(emb), "formatted")
    assert "Generate" not in p, p
    assert "Exchange" not in p, p


def test_simhash_plan_has_single_generate_two_exchanges(spark):
    """Round-4 de-amplification pin: simhash's only Generate is the
    tokenizer explode (the old per-bit sequence explode multiplied
    distinct-(doc, term) rows by ``bits``), and the per-bit sums ride
    the per-doc groupBy — two Exchanges total (tf, per-doc), not three."""
    import re

    from websearchengine_spark.operators.dedup import simhash

    docs = spark.createDataFrame(
        [(1, "a b a c"), (2, "b c d")], "doc_id long, text string"
    )
    p = plan_of(simhash(docs), "formatted")
    assert len(re.findall(r"\(\d+\) Generate", p)) == 1, p
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 2, p


def test_minhash_signatures_plan_is_explode_free_and_shuffle_free(spark):
    """Round-5 de-amplification pin: the MinHash signature is array_min
    over transform(sequence) shingle hashes in ONE projection — no
    Generate (the old shape emitted ~len(text) shingle rows per doc, the
    only near-data-proportional bench phase at sf1) and no Exchange (the
    groupBy(doc_id) min-agg shuffle is gone)."""
    from websearchengine_spark.operators.dedup import minhash_signatures

    docs = spark.createDataFrame(
        [(i, f"some text number {i} with words") for i in range(4)],
        "doc_id long, text string",
    )
    p = plan_of(minhash_signatures(docs), "formatted")
    assert "Generate" not in p, p
    assert "Exchange" not in p, p


def test_pii_redact_and_hash_split_plans_are_map_only(spark):
    """Round-5 pins: PII scrubbing and hash-split assignment are pure
    projections — no Generate, no Exchange — so they run as map-only
    passes fused into whatever scan precedes them at any corpus size."""
    from websearchengine_spark.operators.textstats import hash_split, pii_redact

    docs = spark.createDataFrame(
        [(i, f"text {i} a@b.co") for i in range(4)], "doc_id long, text string"
    )
    for df in (pii_redact(docs), hash_split(docs)):
        p = plan_of(df, "formatted")
        assert "Generate" not in p, p
        assert "Exchange" not in p, p


def test_gopher_stats_plan_single_generate(spark):
    """Round-5 pin: every Gopher feature except the 2-gram mode is
    explode-free array algebra; the plan carries exactly ONE Generate
    (the linear gram explode, n_words-1 rows/doc — same order as the tf
    pass the index build already does), never a line- or char-level
    amplification."""
    from websearchengine_spark.operators.textstats import gopher_stats

    docs = spark.createDataFrame(
        [(i, f"line one\nline two {i}\nline one") for i in range(4)],
        "doc_id long, text string",
    )
    import re

    p = plan_of(gopher_stats(docs), "formatted")
    assert len(re.findall(r"\(\d+\) Generate", p)) == 1, p
    # three keyed Exchanges: gram count, per-doc argmax, join co-partition
    assert len(re.findall(r"\(\d+\) Exchange", p)) <= 3, p


def test_normalize_url_plan_map_only(spark):
    """Round-5 pin: URL normalization is pure column algebra — no
    Generate, no Exchange — and url_dedup adds exactly ONE keyed
    Exchange (the groupBy on the normalized key, with a map-side
    partial aggregate below it)."""
    import re

    from websearchengine_spark.operators.textstats import normalize_url, url_dedup
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, f"https://Example.com/p{i}?utm_source=x&id={i}") for i in range(4)],
        "doc_id long, url string",
    )
    p = plan_of(docs.select(normalize_url(F.col("url")).alias("n")), "formatted")
    assert "Generate" not in p, p
    assert "Exchange" not in p, p
    p2 = plan_of(url_dedup(docs), "formatted")
    assert len(re.findall(r"\(\d+\) Exchange", p2)) == 1, p2
    assert "partial_count" in p2 or "HashAggregate" in p2, p2


def test_semantic_dedup_assignment_is_one_projection(spark):
    """Round-5 pin: the SemDeDup default path has no Generate (no row
    amplification anywhere) and at most 4 Exchanges — the list_id
    cogroup for the Arrow pair stage plus the final id-keyed keep join
    (both sides; AQE converts the tiny drop side to broadcast at
    runtime) — never a pair-materializing stage."""
    import re

    from websearchengine_spark.operators.similarity import semantic_dedup

    emb = spark.createDataFrame(
        [(i, [float(i % 3), 1.0]) for i in range(6)],
        "vec_id long, embedding array<double>",
    )
    p = plan_of(
        semantic_dedup(emb, [[1.0, 0.0], [0.0, 1.0]], threshold=0.9), "formatted"
    )
    assert "Generate" not in p, p
    assert len(re.findall(r"\(\d+\) Exchange", p)) <= 4, p


def test_strip_boilerplate_plan_single_generate_per_scan(spark):
    """Round-5 pin: boilerplate stripping explodes each document into
    its own lines exactly once per scan (2 scans: boilerplate vocab +
    rebuild) — linear in total line count, never a cross-product."""
    import re

    from websearchengine_spark.operators.textstats import strip_boilerplate

    docs = spark.createDataFrame(
        [(i, "a\nshared\nb") for i in range(4)], "doc_id long, text string"
    )
    p = plan_of(strip_boilerplate(docs, min_docs=2), "formatted")
    assert len(re.findall(r"\(\d+\) Generate", p)) <= 2, p


def test_scrub_repeated_ngrams_plan_linear_generates(spark):
    """Round-5 pin: the repeated-window scrub emits windows (not
    window x token rows) and stays linear — at most 4 Generates (the
    gram-window explode appears TWICE because the count pass and the
    hit-join pass each recompute it rather than caching corpus-sized
    window rows, plus covered-span expansion bounded by hits x n and
    the token posexplode), never a pairwise or token-amplified stage."""
    import re

    from websearchengine_spark.operators.dedup import scrub_repeated_ngrams

    docs = spark.createDataFrame(
        [(i, "a b c d e f g h i j") for i in range(4)],
        "doc_id long, text string",
    )
    p = plan_of(scrub_repeated_ngrams(docs, n=4, min_count=2), "formatted")
    assert len(re.findall(r"\(\d+\) Generate", p)) <= 4, p
