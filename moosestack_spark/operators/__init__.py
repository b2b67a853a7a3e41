"""Operator modules — each registers correctness-gate queries via
moosestack_spark.registry.query.  See SURVEY.md §2 for the inventory these
cover and FIXTURES.md for the operator→fixture mapping.
"""
