"""Training-data pipeline operators over document/embedding tables.

Beyond the reference's own operators (SURVEY.md §2), these are the
large-scale corpus-preparation ops a 100 TB training-data pipeline needs:
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard /
embedding-cosine), similarity search (brute-force + LSH-bucketed ANN),
text analysis (language-ID, quality scoring, token counting,
fingerprinting) and multimodal stubs.

All hot paths are built-in pyspark.sql.functions (JVM, whole-stage
codegen); no Python UDFs.
"""
