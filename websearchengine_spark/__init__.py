"""websearchengine_spark — a from-scratch PySpark-native rebuild of the
capabilities of owwlo/WebSearchEngine (NYU CS2580 search engine).

Spark-first architecture:

- index build  = DataFrame pipeline (Arrow UDF extract/analyze -> posexplode
  -> two hash aggregations -> doc-sharded posting blocks via applyInPandas)
- retrieval    = per-shard block-max-WAND kernel (mapInPandas) + global
  ``orderBy(...).limit(k)`` merge, with a pure-DataFrame fallback scorer
  used for correctness cross-checks
- signals      = PageRank (2 Jacobi iterations, lambda=0.9) and NumViews as
  DataFrame join/agg loops
- everything else (joins, aggregations, top-k merge, set ops) is native
  Catalyst — no custom strategies or RDD code.

See SURVEY.md for the full operator inventory and file:line citations into
the reference.
"""

__version__ = "0.1.0"
