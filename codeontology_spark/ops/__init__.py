"""Large-scale training-data pipeline operators over the documents /
embeddings tables: deduplication (exact, MinHash-LSH, n-gram Jaccard,
SimHash), similarity search, and text analysis. All hot paths are built-in
pyspark.sql.functions (JVM/codegen); no Python UDFs."""
