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

# Python's str.strip() / re.sub(r"\s+") are UNICODE-aware; Java's \s and
# RE2's \s are ASCII-only. This class spells Python's whitespace set in
# syntax both Java (Spark) and RE2 (the DuckDB oracle) accept: ASCII
# control whitespace + \x1C-\x1F + NEL + the Z* separator categories.
_WS = r"[\t\n\x0B\f\r \x1C-\x1F\x85\p{Zs}\p{Zl}\p{Zp}]"


def infores_curie(
    col: Column, rewrite: tuple[str, ...] | list[str] | None = None
) -> Column:
    """Knowledge-source name → ``infores:`` CURIE.

    Exact reference pipeline (kgx/utils/infores.py:135-168 _process_infores,
    applied substitution-for-substitution): optional rewrite → optional
    prefix prepend → strip → lowercase → ``\\s+`` → '_' → ``\\.+`` → '_' →
    strip non-word chars (hyphens included — ``[\\W]``) → '_' → '-' →
    prefix 'infores:'. Values already infores CURIEs pass through untouched
    (checked BEFORE the rewrite, as the reference does).

    ``rewrite`` is the reference's optional ``(regex, substitution[,
    prefix])`` tuple from knowledge-source filters (infores.py:86-107):
    ``regex`` matches are replaced by ``substitution`` (all occurrences, on
    the RAW value before case folding; empty/missing substitution deletes
    the matches), then ``prefix`` — the third element — is prepended as a
    separate word. A falsy regex skips the substitution but still applies
    the prefix.
    """
    out = col
    if rewrite:
        regex = rewrite[0]
        substitution = rewrite[1] if len(rewrite) > 1 else ""
        prefix = rewrite[2] if len(rewrite) > 2 else ""
        if regex:
            out = F.regexp_replace(out, regex, substitution)
        if prefix:
            out = F.concat(F.lit(prefix + " "), out)
    # Unicode-aware strip + \s+, matching Python's (F.trim strips only
    # ASCII spaces and Java \s is ASCII-only — 'Name\t' and 'a b'
    # would diverge from the reference otherwise)
    out = F.lower(F.regexp_replace(out, f"^{_WS}+|{_WS}+$", ""))
    out = F.regexp_replace(out, f"{_WS}+", "_")
    out = F.regexp_replace(out, r"\.+", "_")
    # the reference's re.sub(r"[\W]", "") is UNICODE-aware: Python \w =
    # letters (L*), decimal/letter/other numbers (Nd/Nl/No) and '_', so
    # 'café' keeps its é. \p-classes spell that same set in both Java
    # (Spark) and RE2 (the DuckDB oracle).
    out = F.regexp_replace(out, r"[^\p{L}\p{Nd}\p{Nl}\p{No}_]", "")
    out = F.regexp_replace(out, "_", "-")
    out = F.concat(F.lit("infores:"), out)
    return F.when(col.startswith("infores:"), col).otherwise(out)


def infores_catalog(
    df: DataFrame,
    source_col: str = "knowledge_source",
    rewrite: tuple[str, ...] | list[str] | None = None,
) -> DataFrame:
    """Side-output catalog mapping raw source name → infores CURIE.

    Mirrors the reference's write_catalog (kgx/utils/infores.py:109-133) as a
    distinct projection instead of a driver-side dict. ``rewrite`` is the
    optional ``(regex, substitution[, prefix])`` tuple — see infores_curie.
    """
    return (
        df.select(F.col(source_col).alias("knowledge_source"))
        .where(F.col("knowledge_source").isNotNull())
        .distinct()
        .withColumn("infores", infores_curie(F.col("knowledge_source"), rewrite=rewrite))
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
