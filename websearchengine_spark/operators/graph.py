"""Mining pipeline (``--mode=mining``): link graph, PageRank, NumViews,
Spearman — SURVEY.md §2.9, lifecycle §3.3.

Reference semantics reproduced exactly:

  * link extraction (G1/F7): regex ``<[a|A].*?href="([^ /#]*)".*?>``
    applied line-by-line, all matches (CorpusAnalyzer.java:36-37,61-81).
    The char class ``[a|A]`` literally includes '|' — kept as-is.
  * redirect aliasing: urls ``X`` and ``X.html`` are one PageRank node
    when both exist; the node's rank is reported for ``X.html`` while
    ``X`` is written as 0.0 (CorpusAnalyzerPagerank.java:56-73,160-164).
    (Deviation, documented: the reference's alias resolution is
    dir-listing-order-dependent for pathological ``a``/``a.html``/
    ``a.html.html`` chains; we pin single-level ``canon(u) = u+'.html'
    if present else u``.)
  * PageRank (G2): init 1.0 for every node; 2 Jacobi iterations of
    ``next[t] += cur[s]/outdeg(s)`` then ``cur = 0.9*next + 0.1``;
    dangling mass is NOT redistributed; self-links and off-corpus links
    dropped; duplicate links dedup'd (CorpusAnalyzerPagerank.java:48-49,
    96-106,132-153).
  * NumViews (G3): pageview lines ``lang article views`` (single-space
    split, >=3 fields, views all-digits, article must be a corpus url);
    views for ``X`` accrue to ``X.html`` when both exist
    (LogMinerNumviews.java:60-74).
  * Spearman (G4): ranks 1..N by value desc (name asc as tie-break),
    rho = sum((xi-Z)(yi-Z)) / sqrt(sum sq * sum sq) (Spearman.java:65-94).
    (Deviation, documented: the reference comparator treats values
    within 1e-4 as equal; we rank by exact (value desc, name asc).)

Spark shape: link extraction is an Arrow UDF (the only Python);
aliasing is a self-join on url; each PageRank iteration is
join -> groupBy(dst).sum -> left-join-back — all native, and the
edges/outdeg DataFrames are computed once and cached across the two
iterations.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PR_LAMBDA = 0.9
PR_ITERS = 2

LINK_PATTERN = re.compile(r'<[a|A].*?href="([^ /#]*)".*?>')


def extract_links_from_html(html: str | bytes) -> list[str]:
    """All regex link targets, line by line (order preserved, dups kept)."""
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8", errors="replace")
    out: list[str] = []
    for line in html.splitlines():
        out.extend(LINK_PATTERN.findall(line))
    return out


def extract_links(pages: DataFrame) -> DataFrame:
    """pages -> (url, target) rows, one per extracted link occurrence."""

    def run(batches):
        for pdf in batches:
            urls, targets = [], []
            for url, html in zip(pdf["url"], pdf["html"]):
                for t in extract_links_from_html(html):
                    urls.append(url)
                    targets.append(t)
            yield pd.DataFrame({"url": urls, "target": targets})

    return pages.select("url", "html").mapInPandas(run, schema="url string, target string")


def canonical_nodes(urls: DataFrame) -> DataFrame:
    """(url, node) mapping: node = url+'.html' if that url exists, else url."""
    u = urls.select("url")
    v = urls.select(F.col("url").alias("_html_url"))
    return (
        u.join(v, F.concat(F.col("url"), F.lit(".html")) == F.col("_html_url"), "left")
        .select("url", F.coalesce("_html_url", "url").alias("node"))
    )


def build_link_graph(pages: DataFrame) -> DataFrame:
    """G1: distinct in-corpus (src_node, dst_node) edges, no self-links."""
    urls = pages.select("url").distinct()
    canon = canonical_nodes(urls)
    links = extract_links(pages)
    in_corpus = links.join(urls.withColumnRenamed("url", "target"), "target")
    edges = (
        in_corpus.join(canon, "url")
        .withColumnRenamed("node", "src")
        .join(
            canon.withColumnRenamed("url", "target").withColumnRenamed("node", "dst"),
            "target",
        )
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    return edges


def pagerank_iterate(
    nodes: DataFrame,
    edges: DataFrame,
    lam: float = PR_LAMBDA,
    iters: int = PR_ITERS,
    checkpoint_every: int = 4,
    tol: float | None = None,
    nodes_unique: bool = False,
) -> DataFrame:
    """The Jacobi PageRank loop over an explicit (node) / (src, dst)
    graph — the reference's fixed-iteration scheme
    (CorpusAnalyzerPagerank.java:119-158: rank = lam*inbound + (1-lam),
    no dangling-mass redistribution) generalized for real iteration
    counts:

      * the contribution topology (edge + outdegree) is joined once and
        cached — each iteration is ONE join + ONE aggregation over it;
      * ranks are ``localCheckpoint``ed every ``checkpoint_every``
        rounds: without truncation the logical plan grows per round and
        re-analysis dominates long runs (same pitfall as
        dedup.duplicate_clusters);
      * ``tol``: optional convergence stop — iterate until
        max |rank - prev| < tol (one extra tiny agg per round), capped
        at ``iters``.

    ``nodes_unique=True`` is the caller's guarantee that ``nodes`` has
    no duplicate rows, skipping the defensive ``distinct()`` — that
    dedup is a full exchange of the node set before the loop even
    starts (r6; duplicate nodes under the flag would double-count
    ranks, so only assert it for genuinely keyed inputs such as a doc
    table's primary key).

    Returns (node, rank)."""
    nodes = nodes.select("node")
    if not nodes_unique:
        nodes = nodes.distinct()
    nodes = nodes.persist()
    # contribution topology is fixed across iterations: cache it.
    # outdeg is attached with a window over src rather than a groupBy +
    # self-join — one exchange instead of three (guide §2.4), and when
    # the incoming edges are already clustered by src (the entry's
    # synthetic graph dedups that way) the window needs no exchange at
    # all.  Values are identical: count(*) over (partition by src).
    topo = edges.select(
        "src",
        "dst",
        F.count(F.lit(1)).over(Window.partitionBy("src")).alias("outdeg"),
    ).persist()

    ranks = nodes.withColumn("rank", F.lit(1.0))
    for i in range(iters):
        contribs = (
            topo.join(ranks.withColumnRenamed("node", "src"), "src")
            .select("dst", (F.col("rank") / F.col("outdeg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inbound"))
        )
        new = (
            nodes.join(contribs.withColumnRenamed("dst", "node"), "node", "left")
            .select(
                "node",
                (lam * F.coalesce(F.col("inbound"), F.lit(0.0)) + (1.0 - lam)).alias("rank"),
            )
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            new = new.localCheckpoint(eager=True)
        if tol is not None:
            delta = (
                new.join(
                    ranks.withColumnRenamed("rank", "prev"), "node"
                )
                .agg(F.max(F.abs(F.col("rank") - F.col("prev"))))
                .collect()[0][0]
                or 0.0
            )
            ranks = new
            if delta < tol:
                break
        else:
            ranks = new
    return ranks


def pagerank(
    pages: DataFrame,
    lam: float = PR_LAMBDA,
    iters: int = PR_ITERS,
) -> DataFrame:
    """G2 -> (url, pagerank) for every corpus url (alias sources get 0.0)."""
    urls = pages.select("url").distinct().persist()
    canon = canonical_nodes(urls).persist()
    edges = build_link_graph(pages).persist()
    nodes = canon.select("node").distinct()
    # nodes are distinct'd one line up — skip the iterate-side re-dedup
    ranks = pagerank_iterate(nodes, edges, lam=lam, iters=iters, nodes_unique=True)
    # write-out rule: url X gets 0.0 if X.html is also a corpus url
    # (CorpusAnalyzerPagerank.java:160-164)
    alias_targets = urls.select(F.col("url").alias("_alias_html"))
    out = (
        canon.join(ranks, "node")
        .join(
            alias_targets,
            F.concat(F.col("url"), F.lit(".html")) == F.col("_alias_html"),
            "left",
        )
        .select(
            "url",
            F.when(F.col("_alias_html").isNotNull(), F.lit(0.0))
            .otherwise(F.col("rank"))
            .alias("pagerank"),
        )
    )
    return out


def numviews(pages: DataFrame, log_df: DataFrame) -> DataFrame:
    """G3 -> (url, numviews) for every corpus url.

    ``log_df``: (lang, article, views) with views as STRING (malformed
    rows are filtered here, as the miner does).
    """
    urls = pages.select("url").distinct()
    valid = log_df.filter(F.col("views").rlike(r"^\d+$")).select(
        "article", F.col("views").cast("long").alias("v")
    )
    in_corpus = valid.join(urls.withColumnRenamed("url", "article"), "article")
    html_alias = urls.select(F.col("url").alias("_alias_html"))
    keyed = in_corpus.join(
        html_alias,
        F.concat(F.col("article"), F.lit(".html")) == F.col("_alias_html"),
        "left",
    ).select(F.coalesce("_alias_html", "article").alias("url"), "v")
    agg = keyed.groupBy("url").agg(F.sum("v").alias("nv"))
    return urls.join(agg, "url", "left").select(
        "url", F.coalesce("nv", F.lit(0)).cast("long").alias("numviews")
    )


def mine_signals(pages: DataFrame, log_df: DataFrame | None = None) -> DataFrame:
    """Full mining pass -> (url, pagerank, numviews), the J4 join input."""
    pr = pagerank(pages)
    if log_df is None:
        return pr.withColumn("numviews", F.lit(0).cast("long"))
    nv = numviews(pages, log_df)
    return pr.join(nv, "url", "full").select(
        "url",
        F.coalesce("pagerank", F.lit(0.0)).alias("pagerank"),
        F.coalesce("numviews", F.lit(0)).cast("long").alias("numviews"),
    )


def spearman(a: DataFrame, b: DataFrame) -> float:
    """G4: Spearman rho between two (name, value) DataFrames.

    Ranks are 1..N by (value desc, name asc); rho uses the reference's
    mean-rank formula (Spearman.java:65-94).
    """
    wa = Window.orderBy(F.col("value").desc(), F.col("name").asc())
    ra = a.select("name", F.row_number().over(wa).alias("rx"))
    rb = b.select(
        F.col("name").alias("name_b"),
        F.row_number().over(
            Window.orderBy(F.col("value").desc(), F.col("name").asc())
        ).alias("ry"),
    )
    j = ra.join(rb, ra["name"] == rb["name_b"])
    row = (
        j.select(
            F.avg("rx").alias("z"),
            F.count("*").alias("n"),
        ).crossJoin(j.select(F.col("rx").alias("x"), F.col("ry").alias("y")))
        .select(
            ((F.col("x") - F.col("z")) * (F.col("y") - F.col("z"))).alias("num"),
            ((F.col("x") - F.col("z")) * (F.col("x") - F.col("z"))).alias("dx"),
            ((F.col("y") - F.col("z")) * (F.col("y") - F.col("z"))).alias("dy"),
        )
        .agg(
            (F.sum("num") / F.sqrt(F.sum("dx") * F.sum("dy"))).alias("rho")
        )
        .collect()[0]
    )
    return float(row["rho"])
