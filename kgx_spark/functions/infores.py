"""Infores (information-resource) CURIE rewriting.

Reference: kgx/utils/infores.py:135-168 (processor), catalog 109-133,
default provenance fill 326-459.

The reference memoizes a per-process catalog; here the rewrite is a pure
deterministic string pipeline (so no memoization is needed — Catalyst
common-subexpression-eliminates it) and the catalog is a groupBy side-output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def infores_curie(col: Column) -> Column:
    """Knowledge-source name → ``infores:`` CURIE.

    Pipeline per kgx/utils/infores.py:146-162:
    lowercase → whitespace/dots/hyphen-runs → '_' → strip non-word chars →
    '_' → '-' → prefix 'infores:'. Values already infores CURIEs pass through.
    """
    out = F.lower(F.trim(col))
    out = F.regexp_replace(out, r"[\s\.]+", "_")
    out = F.regexp_replace(out, r"[^\w\-]", "")
    out = F.regexp_replace(out, r"_+", "_")
    out = F.regexp_replace(out, "_", "-")
    out = F.concat(F.lit("infores:"), out)
    return F.when(col.startswith("infores:"), col).otherwise(out)


def infores_catalog(df: DataFrame, source_col: str = "knowledge_source") -> DataFrame:
    """Side-output catalog mapping raw source name → infores CURIE.

    Mirrors the reference's write_catalog (kgx/utils/infores.py:109-133) as a
    distinct projection instead of a driver-side dict.
    """
    return (
        df.select(F.col(source_col).alias("knowledge_source"))
        .where(F.col("knowledge_source").isNotNull())
        .distinct()
        .withColumn("infores", infores_curie(F.col("knowledge_source")))
    )


def default_provenance(
    df: DataFrame, default: str, slot: str = "provided_by", multivalued: bool = True
) -> DataFrame:
    """Fill missing provenance with a default (kgx/utils/infores.py:326-459).

    The reference derives the default from the input filename
    (transformer.py:211); callers pass it explicitly here.
    """
    if slot not in df.columns:
        df = df.withColumn(slot, F.lit(None).cast("array<string>" if multivalued else "string"))
    filler = F.array(F.lit(default)) if multivalued else F.lit(default)
    cur = F.col(slot)
    missing = cur.isNull() | (F.size(cur) == 0) if multivalued else cur.isNull()
    return df.withColumn(slot, F.when(missing, filler).otherwise(cur))
