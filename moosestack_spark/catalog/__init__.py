"""Catalog layer: OlapTable on Parquet, MergeTree-engine read semantics,
views, materialized views, migration planning (SURVEY.md §1.4, §2.11, §4.2).
"""
