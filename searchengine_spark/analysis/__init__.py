"""Large-scale training-data pipeline operators (beyond the reference).

Deduplication (exact, MinHash+LSH, SimHash, n-gram Jaccard), similarity
search over embeddings (brute-force + LSH-bucketed), text analysis
(language-ID, quality, token stats, fingerprints), and multimodal binary
plumbing. All hot paths are JVM-side DataFrame expressions (whole-stage
codegen); the only Python is the multimodal feature stub, deliberately an
Arrow-batched ``mapInPandas``.

Hash determinism: every hash is the portable md5-derived ``H32`` emitted by
``searchengine_spark.oracle.sqlgen`` — the DuckDB correctness oracles
evaluate the very same generated SQL, so Spark and oracle cannot drift.
"""
