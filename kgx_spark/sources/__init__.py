"""Sources: each reader returns normalized (nodes_df, edges_df) or one of them.

Registry mirrors SOURCE_MAP (kgx/transformer.py:43-60); DB connectors
(neo4j/arango) are out of scope per SURVEY.md §2.1 — their Spark analogue is
a partitioned JDBC-style read.
"""

from kgx_spark.sources.tsv import read_nodes_tsv, read_edges_tsv, read_kgx_tsv  # noqa: F401
from kgx_spark.sources.jsonl import read_kgx_jsonl  # noqa: F401
from kgx_spark.sources.json_source import read_kgx_json  # noqa: F401
from kgx_spark.sources.parquet import read_kgx_parquet  # noqa: F401
from kgx_spark.sources.sssom import read_sssom  # noqa: F401
from kgx_spark.sources.obograph import read_obograph  # noqa: F401
from kgx_spark.sources.rdf_nt import read_ntriples  # noqa: F401
