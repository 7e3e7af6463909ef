"""PII detection + redaction over a document corpus.

The scrub a training-data pipeline runs before anything else ships: find
email addresses, phone numbers, IP addresses, and SSN-shaped ids in raw
text, count them, and replace them with typed placeholder tokens (the
C4/Dolma-style ``[EMAIL]`` convention).

Scale shape: pure column regexp expressions — JVM-side, whole-stage
codegen, zero shuffle, zero Python. The pattern set is a plain dict so
deployments can extend it; every default pattern is written in the
common Java-regex ∩ RE2 subset (character classes, bounded quantifiers,
``\\b`` — no lookarounds, no backreferences) so the DuckDB oracle replays
the exact same patterns.

Semantics: patterns apply IN ORDER, each counting and redacting on the
text as already redacted by the previous patterns. Order matters and is
part of the contract — e.g. the default order scrubs SSN-shaped ids
before the looser phone pattern can swallow them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered: most-specific first. SSN before phone (a bare 123-45-6789 is
# also phone-shaped); ipv4 before phone (dotted quads contain 7+ digit
# runs with separators).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    # + optional, then digits with ()-. / space separators, 8+ chars total,
    # digit-terminated: catches +1 (415) 555-0134 / 415-555-0134 shapes.
    "phone": r"\+?[0-9][0-9()\-\s.]{6,}[0-9]",
}


def redaction_token(kind: str) -> str:
    return "[" + kind.upper() + "]"


def pii_scrub(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """→ (id, text_redacted, n_<kind> per pattern, n_pii total).

    Counts are taken on the progressively-redacted text (pattern k sees
    the output of patterns 1..k-1), so ``n_<kind>`` is exactly the number
    of ``[<KIND>]`` tokens the redacted text carries — auditable from the
    output alone.
    """
    pats = PII_PATTERNS if patterns is None else patterns
    cur: Column = F.col(text_col)
    cols = [F.col(id_col)]
    counts = []
    for kind, rx in pats.items():
        n = F.regexp_count(cur, F.lit(rx)).cast("bigint").alias(f"n_{kind}")
        counts.append(n)
        cur = F.regexp_replace(cur, rx, redaction_token(kind))
    out = df.select(*cols, cur.alias("text_redacted"), *counts)
    total = None
    for kind in pats:
        c = F.col(f"n_{kind}")
        total = c if total is None else total + c
    return out.withColumn("n_pii", total.cast("bigint"))
