"""searchengine_spark — a PySpark-native full-text indexing + BM25 query engine.

Brand-new implementation (NOT a port) with the capabilities of the reference
Java engine (SlavaSles/searchengine, surveyed in /root/repo/SURVEY.md):
crawl→lemmatize→inverted-index→ranked-search, rebuilt Spark-first over
transcript tables ``(conv_id, turn_idx, role, text, tool, ts)``:

- tokenize/lemmatize via vectorized Arrow pandas UDFs (no per-row Python),
- dense doc-id assignment via two-pass range partitioning,
- delta + varint-compressed posting blocks built with ``applyInPandas``,
- doc-range sharding that bounds every group (explicit skew handling),
- conjunctive Σtf ("reference") and BM25 block-max-WAND top-k query kernels,
- checkpoint/resume with per-partition lineage + metrics,
- the reference's statistics endpoint as DataFrame aggregates.
"""

__version__ = "0.1.0"
