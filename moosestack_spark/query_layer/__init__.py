"""Semantic query layer — the Spark-first port of the reference's
ts-moose-lib query layer (defineQueryModel, filter compiler, pagination).
"""
