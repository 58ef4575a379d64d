#!/usr/bin/env python
"""Kernel-level evidence for two-phase block-max pruning + the
champion-head (hybrid impact/doc-ordered) block layout.

At bench SF (5,000 docs) Spark job scheduling dominates query latency,
so the threshold phase is auto-disabled there (WAND_TWO_PHASE_MIN_POSTINGS)
and `bench.py`'s wand_bm25_x3 cannot show the effect.  This micro-bench
measures the kernel itself at a realistic per-shard posting volume —
the regime a 1000-executor cluster actually runs in — comparing
exhaustive scoring vs scoring with a phase-1 threshold (the k-th score
of a 1/32 sample of the docs, exactly what wand_topk's phase 1
produces), for BOTH block layouts:

  plain   doc-ordered blocks only (round-2 layout): block maxima are
          near-flat on a uniform corpus, so the impact gate skips ~0.
  hybrid  champion-head layout (round-3, build default): top-impact
          postings live in flagged head blocks, capping every tail
          block's max_impact — the gate then drops the tail wholesale.

Prints one JSON line per (scenario, layout):
  {"scenario": ..., "layout": ..., "exhaustive_ms": a,
   "thresholded_ms": b, "speedup": a/b, ..., "identical_topk": true}
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from websearchengine_spark.functions.codec import (
    DEFAULT_HEAD_FRAC,
    encode_posting_blocks,
)
from websearchengine_spark.operators.topk import WAND_PRUNE_EPS, shard_bm25_topk


def synth_term(rng, n_docs: int, df: int, avg_dl: float, dl_drift: float = 0.0,
               head_frac: float = 0.0, tf_mode: str = "geom",
               dl_sigma: float = 0.4):
    """One term's posting list over a doc space.

    ``dl_drift`` > 0 models a time-ordered corpus whose documents grow
    with doc_id (late crawl segments are longer): doc_len scales by
    (1 + dl_drift * doc_id/n_docs), so late BLOCKS have uniformly low
    BM25 impact — the layout where block-max skipping shines even
    without the head split.

    ``tf_mode="zipf"`` + large ``dl_sigma`` models REAL web text: a
    heavy tf tail and wide doc-length spread concentrate BM25 impact in
    few postings, the regime the champion-head layout targets."""
    docs = np.sort(rng.choice(n_docs, size=df, replace=False)).astype(np.int64)
    if tf_mode == "zipf":
        tfs = rng.zipf(1.8, size=df).clip(1, 200).astype(np.int64)
    else:
        # flat synthetic: ~75% of postings are tf=1, tail decays fast
        tfs = rng.geometric(0.75, size=df).clip(1, 20).astype(np.int64)
    base = avg_dl * rng.lognormal(0.0, dl_sigma, size=df)
    drift = 1.0 + dl_drift * (docs / n_docs)
    dls = np.maximum((base * drift).clip(20, None).astype(np.int64), tfs + 1)
    pos = np.arange(int(tfs.sum()), dtype=np.int64)
    return encode_posting_blocks(docs, tfs, dls, pos, avg_dl,
                                 head_frac=head_frac)


def run_scenario(name: str, dl_drift: float, head_frac: float, layout: str,
                 tf_mode: str = "geom", dl_sigma: float = 0.4) -> dict:
    rng = np.random.default_rng(7)
    n_docs = 2_000_000  # one shard's doc space at cluster scale
    avg_dl = 300.0
    k = 10
    # the regime where pruning pays: HIGH-df terms, large candidate set
    dfs = {"alpha": 500_000, "beta": 400_000}
    term_lists = {
        t: synth_term(rng, n_docs, df, avg_dl, dl_drift, head_frac,
                      tf_mode, dl_sigma)
        for t, df in dfs.items()
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
    rec = {
        "scenario": name,
        "layout": layout,
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
    print(json.dumps(rec))
    return rec


def main() -> None:
    scenarios = (
        # flat synthetic: narrow impact distribution — NO layout can cap
        # the tail below the conjunctive bound; stays ~1x (honest)
        ("uniform", 0.0, "geom", 0.4),
        # time-ordered crawl whose late segments are longer
        ("length_drift", 4.0, "geom", 0.4),
        # realistic web text: zipf tf tail + wide doc-length spread —
        # impact concentrates, the champion head absorbs it, the
        # threshold gate drops the tail wholesale
        ("realistic_web", 0.0, "zipf", 1.0),
    )
    for name, drift, tf_mode, dl_sigma in scenarios:
        # plain doc-ordered layout (round-2): the honest no-win baseline
        run_scenario(name, drift, head_frac=0.0, layout="plain",
                     tf_mode=tf_mode, dl_sigma=dl_sigma)
        # champion-head hybrid (round-3 build default)
        run_scenario(name, drift, head_frac=DEFAULT_HEAD_FRAC,
                     layout="hybrid", tf_mode=tf_mode, dl_sigma=dl_sigma)


if __name__ == "__main__":
    main()
