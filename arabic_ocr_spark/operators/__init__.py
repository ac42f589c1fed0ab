"""DataFrame-level operators for large-scale training-data pipelines:
deduplication (exact, MinHash+LSH, SimHash, n-gram Jaccard), similarity
search over embeddings, and text analysis (language ID, quality scoring,
token stats, fingerprinting).

Every operator is expressed with built-in pyspark.sql functions (JVM-side,
whole-stage-codegen eligible) — no Python UDFs — and each has an ANSI-SQL
twin in __spark_entry__.oracle_sql() so the driver can verify it against
DuckDB value-for-value.
"""
