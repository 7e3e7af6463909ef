"""ArangoDB sink — batched bulk-import upserts.

Reference: kgx/sink/arango_sink.py:47-311 — node/edge records cached per
collection, `import_bulk(batch, on_duplicate="update")` in batches of 10k;
CURIE → `_key` sanitization (``/`` is illegal in Arango keys, :296-311);
edge `_from`/`_to` handles point at `<node_collection>/<sanitized id>`.

Spark design: the RECORD SHAPING (key sanitization, _from/_to construction,
deterministic edge keys) is pure and unit-tested offline; ``write_arango``
is import-gated (`python-arango` absent here) and writes via
``foreachPartition`` — one connection per partition, the distributed twin of
the reference's single driver-side cache flush.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

BATCH_SIZE = 10_000


def sanitize_key(node_id: str) -> str:
    """Arango `_key` forbids '/' (arango_sink.py:296-311)."""
    return node_id.replace("/", "_")


def node_doc(record: dict, node_collection: str = "nodes") -> dict:
    """KGX node record → Arango vertex document (arango_sink.py:152-181)."""
    out = dict(record)
    out["_key"] = sanitize_key(str(record["id"]))
    return out


def edge_doc(record: dict, node_collection: str = "nodes") -> dict:
    """KGX edge record → Arango edge document with _from/_to handles and a
    deterministic s-p-o `_key` (arango_sink.py:183-228)."""
    out = dict(record)
    s, p, o = str(record["subject"]), str(record["predicate"]), str(record["object"])
    out["_from"] = f"{node_collection}/{sanitize_key(s)}"
    out["_to"] = f"{node_collection}/{sanitize_key(o)}"
    out["_key"] = sanitize_key(f"{s}-{p}-{o}")
    return out


def write_arango(
    nodes: DataFrame | None,
    edges: DataFrame | None,
    hosts: str,
    database: str,
    username: str,
    password: str,
    node_collection: str = "nodes",
    edge_collection: str = "edges",
    batch_size: int = BATCH_SIZE,
) -> None:
    """Distributed bulk-import upserts (one connection per partition)."""
    try:
        import arango  # noqa: F401
    except ImportError as e:  # pragma: no cover - driver absent in sandbox
        raise ImportError(
            "write_arango requires `python-arango` (not installed in this "
            "sandbox). The record shapers (node_doc / edge_doc / "
            "sanitize_key) are importable and tested without it."
        ) from e

    def writer(collection: str, shape):
        def fn(rows):
            from arango import ArangoClient

            client = ArangoClient(hosts=hosts)
            db = client.db(database, username=username, password=password)
            col = db.collection(collection)
            batch: list[dict] = []
            for row in rows:
                batch.append(shape(row.asDict(recursive=True), node_collection))
                if len(batch) >= batch_size:
                    col.import_bulk(batch, on_duplicate="update")
                    batch = []
            if batch:
                col.import_bulk(batch, on_duplicate="update")

        return fn

    if nodes is not None:
        nodes.foreachPartition(writer(node_collection, node_doc))
    if edges is not None:
        edges.foreachPartition(writer(edge_collection, edge_doc))
