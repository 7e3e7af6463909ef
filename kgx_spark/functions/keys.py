"""Edge keys + deterministic edge ids.

Reference: kgx/utils/kgx_utils.py
- generate_edge_key '{s}-{p}-{o}': 343-364
- generate_uuid 'urn:uuid:{uuid4}' for missing edge ids: 768-793

We deliberately replace uuid4 with sha2 of the edge key: uuid4 is
non-reproducible across runs and would break P/R matching against the
reference's (s,p,o) triples — the reference's own dedup KEY is the
deterministic s-p-o string; only the cosmetic id is random.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def edge_key(subject: Column, predicate: Column, obj: Column) -> Column:
    """'{s}-{p}-{o}' (kgx_utils.py:343-364)."""
    return F.concat_ws("-", subject, predicate, obj)


def deterministic_edge_id(subject: Column, predicate: Column, obj: Column) -> Column:
    """Reproducible replacement for generate_uuid (kgx_utils.py:768-778)."""
    return F.sha2(edge_key(subject, predicate, obj), 256)


def generate_edge_identifiers(edges: DataFrame) -> DataFrame:
    """Fill missing edge ``id`` (kgx_utils.py:781-793), deterministically."""
    eid = deterministic_edge_id(F.col("subject"), F.col("predicate"), F.col("object"))
    if "id" not in edges.columns:
        return edges.withColumn("id", eid)
    return edges.withColumn("id", F.coalesce(F.col("id"), eid))
