#!/usr/bin/env python
"""Kernel-level evidence for the two-phase block-max pruning win.

At bench SF (5,000 docs) Spark job scheduling dominates query latency,
so the threshold phase is auto-disabled there (WAND_TWO_PHASE_MIN_POSTINGS)
and `bench.py`'s wand_bm25_x3 cannot show the effect.  This micro-bench
measures the kernel itself at a realistic per-shard posting volume —
the regime a 1000-executor cluster actually runs in — comparing
exhaustive scoring vs scoring with a phase-1 threshold (the k-th score
of a 1/32 sample of the docs, exactly what wand_topk's phase 1
produces).

Prints one JSON line:
  {"postings": N, "exhaustive_ms": a, "thresholded_ms": b,
   "speedup": a/b, "pruned_frac": ..., "identical_topk": true}
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from websearchengine_spark.functions.codec import encode_posting_blocks
from websearchengine_spark.operators.topk import WAND_PRUNE_EPS, shard_bm25_topk


def synth_term(rng, n_docs: int, df: int, avg_dl: float, dl_drift: float = 0.0):
    """One term's posting list over a doc space.

    ``dl_drift`` > 0 models a time-ordered corpus whose documents grow
    with doc_id (late crawl segments are longer): doc_len scales by
    (1 + dl_drift * doc_id/n_docs), so late BLOCKS have uniformly low
    BM25 impact — the layout where block-max skipping shines."""
    docs = np.sort(rng.choice(n_docs, size=df, replace=False)).astype(np.int64)
    # realistic body-term tf: ~75% of postings are tf=1, tail decays fast
    tfs = rng.geometric(0.75, size=df).clip(1, 20).astype(np.int64)
    base = avg_dl * rng.lognormal(0.0, 0.4, size=df)
    drift = 1.0 + dl_drift * (docs / n_docs)
    dls = (base * drift).clip(20, None).astype(np.int64)
    pos = np.concatenate([np.sort(rng.choice(int(dl) + 50, size=int(tf), replace=False)) for tf, dl in zip(tfs, dls)]) if df < 20000 else np.arange(int(tfs.sum()), dtype=np.int64)
    return encode_posting_blocks(docs, tfs, dls, pos, avg_dl)


def run_scenario(name: str, dl_drift: float) -> None:
    rng = np.random.default_rng(7)
    n_docs = 2_000_000  # one shard's doc space at cluster scale
    avg_dl = 300.0
    k = 10
    # the regime where pruning pays: HIGH-df terms, large candidate set
    dfs = {"alpha": 500_000, "beta": 400_000}
    term_lists = {
        t: synth_term(rng, n_docs, df, avg_dl, dl_drift) for t, df in dfs.items()
    }
    n_postings = sum(dfs.values())
    num_docs_total = n_docs * 32
    idf = {
        t: math.log((num_docs_total - df * 32 + 0.5) / (df * 32 + 0.5) + 1.0)
        for t, df in dfs.items()
    }
    qw = {t: 1.0 for t in dfs}

    # phase 1 faithfully: score ONLY the docs of a 1/32 "sample shard"
    # (doc_id % 32 == 0) and take its k-th score as the threshold — this
    # is exactly what wand_topk's phase 1 produces on a doc-sharded index
    d_full, s_full, _ = shard_bm25_topk(term_lists, qw, idf, avg_dl, max(k, 4096))
    mask = d_full % 32 == 0
    sample_scores = np.sort(s_full[mask])[::-1]
    threshold = float(sample_scores[min(k, sample_scores.size) - 1]) - WAND_PRUNE_EPS
    d_full, s_full = d_full[:k], s_full[:k]

    def best_of(n, fn):
        best = math.inf
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    t_ex = best_of(5, lambda: shard_bm25_topk(term_lists, qw, idf, avg_dl, k))
    t_th = best_of(
        5, lambda: shard_bm25_topk(term_lists, qw, idf, avg_dl, k, threshold=threshold)
    )
    _, _, st_ex = shard_bm25_topk(term_lists, qw, idf, avg_dl, k)
    d_thr, s_thr, stats = shard_bm25_topk(
        term_lists, qw, idf, avg_dl, k, threshold=threshold
    )
    identical = d_thr.tolist() == d_full.tolist() and np.allclose(
        s_thr, s_full, atol=1e-12
    )
    print(
        json.dumps(
            {
                "scenario": name,
                "postings": n_postings,
                "blocks_decoded_exhaustive": st_ex["blocks_decoded"],
                "blocks_decoded_thresholded": stats["blocks_decoded"],
                "blocks_total": stats["blocks_total"],
                "candidates_after_skip": stats["candidates"],
                "pruned_by_ub": stats["pruned_by_ub"],
                "exhaustive_ms": round(t_ex * 1000, 1),
                "thresholded_ms": round(t_th * 1000, 1),
                "speedup": round(t_ex / t_th, 2),
                "identical_topk": bool(identical),
            }
        )
    )


def main() -> None:
    # uniform doc-sharded layout: intersection dominates, threshold trims
    # only the scoring tail (the honest common case)
    run_scenario("uniform", dl_drift=0.0)
    # length-drifted corpus (time-ordered crawl): late blocks are uniformly
    # low-impact and the block-max skip eliminates them before decode
    run_scenario("length_drift", dl_drift=4.0)


if __name__ == "__main__":
    main()
