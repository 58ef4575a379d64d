#!/usr/bin/env python
"""Two-phase WAND: END-TO-END win evidence (round-6, closes the r5
verdict's top item).

The r5 per-shard gate floor (WAND_TWO_PHASE_MIN_SHARD_POSTINGS = 50k)
means auto two-phase never fires at any corpus the sandbox benches
end-to-end; its claimed win came from kernel microbenches only
(bench/wand_pruning.py).  This harness builds a corpus/shard config that
actually REACHES the win regime — the zipf web corpus (sources/corpus.py:
super-head terms with >90% df, zipf tf -> real block-max skew, the shape
the champion-head layout exists for) at N_DOCS docs on N_SHARDS shards,
so a 5-head-term query carries ~1e5 postings per shard — and runs
wand_gate_probe (auto / forced two-phase / forced exhaustive, best-of-3,
identical-top-k asserted) with host probes bracketing.

    WAND_WIN_DOCS=100000 WAND_WIN_SHARDS=4 python bench/wand_live_win.py

Success criterion (VERDICT r5): gate_fired AND auto <= 0.9x exhaustive
wall AND identical_topk.  Results go to stdout as one JSON line; paste
the row into BENCH/BASELINE.md §BENCH_SF1 next to the gate table.
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(os.environ.get("WAND_WIN_DOCS", "100000"))
N_SHARDS = int(os.environ.get("WAND_WIN_SHARDS", "4"))
QUERY = os.environ.get("WAND_WIN_QUERY", "the data search of and")


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from sf1 import wand_gate_probe  # reuse the probe protocol

    from bench import host_probe  # repo-root bench.py
    from websearchengine_spark.operators.build import build_index
    from websearchengine_spark.session import get_spark
    from websearchengine_spark.sources.corpus import gen_pages_df

    spark = get_spark("wand-live-win")

    probe_start = host_probe()
    root = tempfile.mkdtemp(prefix="wse_wandwin_")
    t0 = time.time()
    build_index(
        spark, gen_pages_df(spark, N_DOCS, seed=42), root,
        n_shards=N_SHARDS, n_groups=1,
    )
    build_sec = round(time.time() - t0, 2)
    report = wand_gate_probe(spark, root, query=QUERY)
    report["n_docs"] = N_DOCS
    report["n_shards"] = N_SHARDS
    report["index_build_sec"] = build_sec
    report["host_probe"] = {"start": probe_start, "end": host_probe()}
    report["win"] = bool(
        report["gate_fired"]
        and report["identical_topk"]
        and report["auto_speedup_vs_exhaustive"] >= 1.0 / 0.9
    )
    print(json.dumps(report))


if __name__ == "__main__":
    main()
