"""Case-conversion + Biolink-format column expressions.

Reference: kgx/utils/kgx_utils.py
- camelcase→sentencecase: 116-133; snakecase→sentencecase: 136-151
- sentencecase→snakecase: 154-168; sentencecase→camelcase: 171-187
- format_biolink_category: 190-207; format_biolink_slots: 210-220

All pure regexp/concat expressions — codegen'd, no Python on executors.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def sentence_case(col: Column) -> Column:
    """camelCase or snake_case → sentence case, first letter lowered.

    Mirrors kgx_utils.py:116-151 (un-camel-case then lowercase words).
    """
    spaced = F.regexp_replace(col, r"([a-z0-9])([A-Z])", r"$1 $2")
    spaced = F.regexp_replace(spaced, "_", " ")
    return F.lower(spaced)


def snake_case(col: Column) -> Column:
    """sentence case → snake_case (kgx_utils.py:154-168)."""
    return F.lower(F.regexp_replace(F.trim(col), r"\s+", "_"))


def camel_case(col: Column) -> Column:
    """sentence case → CamelCase (kgx_utils.py:171-187).

    initcap uppercases each word's first letter; removing spaces yields
    CamelCase. (initcap also lowercases the rest of each word, matching the
    reference's ``.title()`` behavior.)
    """
    return F.regexp_replace(F.initcap(F.lower(F.trim(col))), r"\s+", "")


def format_biolink_category(col: Column) -> Column:
    """'named thing' → 'biolink:NamedThing' (kgx_utils.py:190-207).

    Values already CURIE-shaped (containing ':') pass through.
    """
    return F.when(col.contains(":"), col).otherwise(
        F.concat(F.lit("biolink:"), camel_case(col))
    )


def format_biolink_slot(col: Column) -> Column:
    """'related to' → 'biolink:related_to' (kgx_utils.py:210-220)."""
    return F.when(col.contains(":"), col).otherwise(
        F.concat(F.lit("biolink:"), snake_case(col))
    )
