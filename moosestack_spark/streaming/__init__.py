"""Streaming layer — Structured-Streaming port of the reference's streaming
transform model (SURVEY.md §2.8): ZeroOrMany transforms, consumers,
multi-route fan-out, DLQ envelope, at-least-once via checkpointing.
"""
