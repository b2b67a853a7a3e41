"""Training-data pipeline operators: deduplication, similarity search, text
analysis, multimodal plumbing.  First-class components for 100 TB pipelines
(not part of the reference surface — built Spark-first on the documents /
embeddings tables, see TESTDATA.md).
"""
