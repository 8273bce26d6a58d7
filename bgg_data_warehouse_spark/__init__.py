"""PySpark-native analytics engine with the capability surface of
phenrickson/bgg-data-warehouse (see SURVEY.md), re-expressed Spark-first.

Subpackages:

- ``sources``   — table registry over parquet, BGG XML flattener, synthetic
                  rate-limited API source (reference: src/api_client/client.py).
- ``operators`` — relational building blocks: latest-per-key dedup, merge /
                  delete-insert writers, band self-joins, top-k, dedup family
                  (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding),
                  similarity search (brute force + LSH ANN).
- ``functions`` — scalar/vector expression helpers: cosine/euclidean/dot over
                  array columns, text analysis (lang-id, quality, tokens),
                  content fingerprints.
- ``plans``     — the analytics model DAG (reference: definitions/*.sqlx) as
                  plain DataFrame->DataFrame functions + a topo-ordered runner.
- ``streaming`` — incremental watermark store, work-queue tracking tables and
                  a Structured Streaming ingest path.
"""

__version__ = "0.1.0"
