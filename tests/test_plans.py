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
