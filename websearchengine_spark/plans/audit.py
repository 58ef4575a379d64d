"""Plan audit helpers: assert the physical plans we designed for are the
plans Catalyst actually produces.

``audit_plans(spark, index_root)`` returns {check_name: (ok, evidence)}
and is used both by tests and by ``python -m websearchengine_spark.plans.audit``
to regenerate PLANS.md.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import DataFrame, functions as F


def plan_of(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def audit_plans(spark, index_root: str) -> dict[str, tuple[bool, str]]:
    from websearchengine_spark.operators.query import load_postings_for_terms, run_query
    from websearchengine_spark.operators.topk import wand_topk
    from websearchengine_spark.sources.storage import IndexStorage

    store = IndexStorage(index_root)
    out: dict[str, tuple[bool, str]] = {}

    # 1. query-term filter reaches the parquet scan (PushedFilters) and
    #    only term+blocks columns are read (ReadSchema pruning)
    postings = store.read_partitioned(spark, "postings").filter(
        F.col("term").isin(["web", "search"])
    ).select("term", "blocks")
    p = plan_of(postings)
    ok = ("PushedFilters: [In(term" in p or "PushedFilters: [In(`term`" in p) and "html" not in p
    out["postings_scan_pushdown"] = (ok, _scan_lines(p))

    # audit query = two high-df terms of THIS index's own vocabulary — a
    # fixed "web search" probe audits the EMPTY-RESULT short-circuit on
    # corpora that lack those words (the r5 sf1 false-negative: the plan
    # was fine, the query matched nothing).  Candidates are restricted to
    # ANALYZER FIXED POINTS: term_stats holds analyzer output, and Porter
    # step 1 is not idempotent ('housing'->'hous' but stem('hous')='hou'),
    # so a non-fixed-point stem fed back through the query path would
    # miss the vocabulary and re-create the same false negative
    from websearchengine_spark.operators.query import (
        analyze_tokens,
        index_analyzer,
        parse_query,
    )

    analyzer = index_analyzer(store)
    candidates = [
        r["term"]
        for r in store.read_table(spark, "term_stats")
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(20)
        .collect()
    ]
    top_terms = [
        t
        for t in candidates
        if analyze_tokens(parse_query(t), analyzer) == [[t]]
    ][:2]
    audit_q = " ".join(top_terms) if top_terms else "web search"

    # 2. WAND path: metadata join is a broadcast, global top-k is
    #    TakeOrderedAndProject (bounded heap merge, no full sort)
    wp = plan_of(wand_topk(spark, index_root, audit_q, k=10))
    ok = "TakeOrderedAndProject" in wp and "BroadcastHashJoin" in wp
    out["wand_topk_merge_and_broadcast"] = (ok, _grep(wp, ["TakeOrderedAndProject", "BroadcastHashJoin"]))

    # 3. DataFrame scorer path: same properties
    rp = plan_of(run_query(spark, index_root, audit_q, ranker="bm25", k=10))
    ok = "TakeOrderedAndProject" in rp and "BroadcastHashJoin" in rp
    out["dataframe_scorer_merge"] = (ok, _grep(rp, ["TakeOrderedAndProject", "BroadcastHashJoin"]))

    # 4. docs lookup by doc_id list (J3): predicate pushed to scan
    docs = store.read_table(spark, "docs").filter(F.col("doc_id").isin([1, 2, 3]))
    dp = plan_of(docs)
    ok = "PushedFilters: [In(doc_id" in dp or "PushedFilters: [In(`doc_id`" in dp
    out["docs_lookup_pushdown"] = (ok, _scan_lines(dp))

    # 5. IVF probe: list_id filter is a PARTITION filter on the persisted
    #    index — a query reads nprobe/nlist of the files, never the rest
    import os

    from websearchengine_spark.operators.similarity import (
        ivf_build_centroids,
        ivf_write_index,
    )

    emb = spark.createDataFrame(
        [(i, [float((i * 7 + j) % 13) - 6.0 for j in range(4)]) for i in range(64)],
        "vec_id long, embedding array<double>",
    )
    ivf_path = os.path.join(index_root, "_ivf_audit")
    if not os.path.exists(os.path.join(ivf_path, "_SUCCESS")):
        cents = ivf_build_centroids(emb, nlist=4)
        ivf_write_index(emb, cents, ivf_path)
    probe = spark.read.parquet(ivf_path).filter(F.col("list_id").isin([1]))
    ip = plan_of(probe)
    ok = "PartitionFilters" in ip and "list_id" in ip
    out["ivf_probe_partition_pruned"] = (
        ok,
        _grep(ip, ["PartitionFilters", "Location"]),
    )

    return out


def _grep(plan: str, needles: list[str]) -> str:
    lines = [l.strip() for l in plan.splitlines() if any(n in l for n in needles)]
    return "\n".join(dict.fromkeys(lines))


def _scan_lines(plan: str) -> str:
    keep = [
        l.strip()
        for l in plan.splitlines()
        if "PushedFilters" in l or "ReadSchema" in l or "Scan parquet" in l
    ]
    return "\n".join(keep[:6])


def main() -> None:  # pragma: no cover - manual utility
    import sys
    import tempfile

    sys.path.insert(0, ".")
    from websearchengine_spark.operators.build import build_index
    from websearchengine_spark.session import get_spark
    from websearchengine_spark.sources.corpus import gen_pages_df

    spark = get_spark("plan-audit", cores=4)
    root = tempfile.mkdtemp(prefix="wse_plans_")
    build_index(spark, gen_pages_df(spark, 500, seed=42), root, n_shards=4, n_groups=2)
    for name, (ok, ev) in audit_plans(spark, root).items():
        print(f"### {name}: {'OK' if ok else 'NOT OK'}\n{ev}\n")


if __name__ == "__main__":  # pragma: no cover
    main()
