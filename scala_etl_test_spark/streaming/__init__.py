"""Structured-Streaming extensions (beyond-reference, clearly marked).

The reference has no streaming (SURVEY §2.9) — only batch watermark
incrementality. These modules are the idiomatic Spark upgrade of those
contracts: a file-source stream replacing the file-number watermark, and
windowed/stateful event processing over the ``events`` table shape.
"""
