"""Scale-path operators for large training-data pipelines.

These go beyond the reference's ingestion surface (SURVEY.md §2) — they
are the operators a 100 TB text/embedding corpus pipeline needs:
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard /
embedding-cosine), similarity search, text analysis, and multimodal
column plumbing. All are pure DataFrame compositions or Arrow-batched
pandas operators; nothing collects to the driver.
"""
