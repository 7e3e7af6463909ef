"""Sinks: each writer takes normalized (nodes, edges) DataFrames.

Registry mirrors SINK_MAP (kgx/transformer.py:62-75); DB connectors are out
of scope per SURVEY.md §2.2.
"""

from kgx_spark.sinks.tsv import write_kgx_tsv  # noqa: F401
from kgx_spark.sinks.jsonl import write_kgx_jsonl  # noqa: F401
from kgx_spark.sinks.parquet import write_kgx_parquet  # noqa: F401
from kgx_spark.sinks.rdf_nt import write_ntriples  # noqa: F401
