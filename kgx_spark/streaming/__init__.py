"""Structured Streaming ingest (optional surface).

The reference's "streaming" is bounded generator iteration
(kgx/transformer.py:116) — batch DataFrames already satisfy those semantics
(SURVEY.md §2.8). This package adds a true continuous-ingest mode for
KGX-record streams (e.g. a landing directory of JSONL drops).
"""

from kgx_spark.streaming.ingest import stream_kgx_jsonl  # noqa: F401
