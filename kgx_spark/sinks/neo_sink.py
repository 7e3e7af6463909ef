"""Neo4j sink — batched UNWIND Cypher writes.

Reference: kgx/sink/neo_sink.py:41-288 — nodes cached per category label and
flushed as `UNWIND $nodes AS node MERGE (n:`NamedThing` {id: node.id}) …`
batches of 10k; edges per predicate as `UNWIND $edges AS edge MATCH … MERGE
(s)-[r:`pred`]->(o) SET r += edge`; unique-id constraints per label.

Spark design: the CYPHER GENERATION (generate_unwind_node_query /
generate_unwind_edge_query / create_constraint_query — the reference's exact
text, neo_sink.py:188-241,263-288) is pure and unit-tested offline. The
write itself is DISTRIBUTED: ``foreachPartition`` opens one bolt session per
partition and pushes its batches concurrently — the reference flushes a
single driver-side cache. ``write_neo`` is import-gated (no bolt driver in
this sandbox).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

DEFAULT_NODE_CATEGORY = "biolink:NamedThing"  # neo_sink.py DEFAULT_NODE_CATEGORY
CATEGORY_DELIMITER = "|"  # cache-key joiner (neo_sink.py:37)
CYPHER_CATEGORY_DELIMITER = ":"  # label-position joiner (neo_sink.py:38)
CACHE_SIZE = 10_000  # neo_sink.py batch size


def sanitize_category(category: list[str]) -> list[str]:
    """Backtick-quote categories for label position (neo_sink.py:168-186)."""
    return [f"`{c}`" for c in category]


def generate_unwind_node_query(category: str) -> str:
    """The reference's node UNWIND text (neo_sink.py:188-214).

    ``category`` must already be in CYPHER label form: backticked labels
    joined by ':' (e.g. ``\\`biolink:Disease\\`:\\`biolink:Gene\\```). Cache
    keys are '|'-joined — convert with
    ``key.replace(CATEGORY_DELIMITER, CYPHER_CATEGORY_DELIMITER)`` exactly as
    the reference does at neo_sink.py:87-89 before building the query.
    """
    return f"""
        UNWIND $nodes AS node
        MERGE (n:`{DEFAULT_NODE_CATEGORY}` {{id: node.id}})
        ON CREATE SET n += node, n:{category}
        ON MATCH SET n += node, n:{category}
        """


def generate_unwind_edge_query(edge_predicate: str) -> str:
    """The reference's edge UNWIND text (neo_sink.py:216-241)."""
    return f"""
        UNWIND $edges AS edge
        MATCH (s:`{DEFAULT_NODE_CATEGORY}` {{id: edge.subject}}), (o:`{DEFAULT_NODE_CATEGORY}` {{id: edge.object}})
        MERGE (s)-[r:`{edge_predicate}`]->(o)
        SET r += edge
        """


def create_constraint_query(category: str) -> str:
    """Unique-id constraint per label (neo_sink.py:263-288).

    ``category`` must be a single backticked label (the reference's
    create_constraints receives sanitize_category output and splits '|'-joined
    keys into subcategories first — neo_sink.py:243-261); raw biolink CURIEs
    like ``biolink:Gene`` would be rejected by Neo4j unbackticked.
    """
    return f"CREATE CONSTRAINT IF NOT EXISTS FOR (n:{category}) REQUIRE n.id IS UNIQUE"


def write_neo(
    nodes: DataFrame | None,
    edges: DataFrame | None,
    uri: str,
    username: str,
    password: str,
    batch_size: int = CACHE_SIZE,
) -> None:
    """Distributed UNWIND writes: each partition holds its own bolt session;
    nodes grouped by primary category label, edges by predicate (the
    reference's cache keys — neo_sink.py:55-158)."""
    try:
        import neo4j  # noqa: F401
    except ImportError as e:  # pragma: no cover - driver absent in sandbox
        raise ImportError(
            "write_neo requires the `neo4j` bolt driver (not installed in "
            "this sandbox). The Cypher builders are importable and tested "
            "without it."
        ) from e

    def write_nodes_partition(rows):
        from neo4j import GraphDatabase

        with GraphDatabase.driver(uri, auth=(username, password)) as driver:
            with driver.session() as session:
                by_cat: dict[str, list[dict]] = {}
                for row in rows:
                    d = row.asDict(recursive=True)
                    cats = d.get("category") or [DEFAULT_NODE_CATEGORY]
                    key = CATEGORY_DELIMITER.join(sanitize_category(sorted(cats)))
                    by_cat.setdefault(key, []).append(d)
                    if len(by_cat[key]) >= batch_size:
                        cypher_key = key.replace(CATEGORY_DELIMITER, CYPHER_CATEGORY_DELIMITER)
                        session.run(generate_unwind_node_query(cypher_key), parameters={"nodes": by_cat.pop(key)})
                for key, batch in by_cat.items():
                    cypher_key = key.replace(CATEGORY_DELIMITER, CYPHER_CATEGORY_DELIMITER)
                    session.run(generate_unwind_node_query(cypher_key), parameters={"nodes": batch})

    def write_edges_partition(rows):
        from neo4j import GraphDatabase

        with GraphDatabase.driver(uri, auth=(username, password)) as driver:
            with driver.session() as session:
                by_pred: dict[str, list[dict]] = {}
                for row in rows:
                    d = row.asDict(recursive=True)
                    pred = d.get("predicate") or "biolink:related_to"
                    by_pred.setdefault(pred, []).append(d)
                    if len(by_pred[pred]) >= batch_size:
                        session.run(generate_unwind_edge_query(pred), parameters={"edges": by_pred.pop(pred)})
                for pred, batch in by_pred.items():
                    session.run(generate_unwind_edge_query(pred), parameters={"edges": batch})

    if nodes is not None:
        from neo4j import GraphDatabase

        cats = {
            c for r in nodes.select("category").distinct().collect()
            for c in (r["category"] or [DEFAULT_NODE_CATEGORY])
        } if "category" in nodes.columns else {DEFAULT_NODE_CATEGORY}
        with GraphDatabase.driver(uri, auth=(username, password)) as driver:
            with driver.session() as session:
                # every label backticked before the constraint DDL, per the
                # reference's backticked cache keys (neo_sink.py:243-261) —
                # raw `biolink:Gene` would be a Cypher syntax error
                for c in sorted(f"`{x}`" for x in cats | {DEFAULT_NODE_CATEGORY}):
                    session.run(create_constraint_query(c))
        nodes.foreachPartition(write_nodes_partition)
    if edges is not None:
        edges.foreachPartition(write_edges_partition)
