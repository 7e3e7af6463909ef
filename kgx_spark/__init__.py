"""kgx_spark — a from-scratch PySpark-native knowledge-graph construction engine.

Re-expresses the capabilities of the reference (biolink/kgx, a row-oriented
Python generator pipeline over a networkx MultiDiGraph) as pure
DataFrame→DataFrame stage functions over two canonical tables:

- ``nodes(id, name, category: array<string>, ...)``
- ``edges(id, subject, predicate, object, ...)``

plus a web-page corpus table ``pages(url, warc_ts, html, text, lang)`` for the
KG-construction pipeline (extract → link → canonicalize → materialize).

There is no graph object: the pair (nodes DF, edges DF) IS the graph
(reference keeps a MultiDiGraph at kgx/graph/nx_graph.py:25 — we don't).
All per-value logic is native Column expressions or vectorized pandas/Arrow
UDFs; no per-row Python anywhere.
"""

__version__ = "0.1.0"

from kgx_spark.session import get_spark  # noqa: F401
