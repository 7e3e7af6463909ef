"""Ingest/export sanitization as column expressions.

Reference: kgx/utils/kgx_utils.py
- sanitize_import (split lists, dedupe+sort, coerce bool, strip \\n\\t,
  remove nulls): 796-909
- build_export_row / _sanitize_export_property (inverse): 912-1005
- is_null / remove_null (None/nan/NA/NaT/''/' ' all null): 1008-1064

The reference runs these per record dict; here each rule is one Column
expression applied per declared column — whole-stage-codegen'd JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kgx_spark.schema import (
    BOOLEAN_PROPERTIES,
    LIST_DELIMITER,
    MULTIVALUED_PROPERTIES,
)

_NULLISH = ("", " ")


def clean_string(col: Column) -> Column:
    """Strip newlines/tabs → space (kgx_utils.py:853-862), null out ''/' '."""
    cleaned = F.regexp_replace(col, r"[\n\t\r]", " ")
    return F.when(cleaned.isin(*_NULLISH), F.lit(None)).otherwise(cleaned)


def clean_array(col: Column) -> Column:
    """Dedupe + sort + null-scrub a string array (kgx_utils.py:864-882, 1008-1042).

    The reference sorts list values on import (kgx_utils.py:871 sorted()), so
    array ordering is deterministic by construction.
    """
    scrubbed = F.filter(
        F.transform(col, lambda x: F.regexp_replace(x, r"[\n\t\r]", " ")),
        lambda x: x.isNotNull() & ~x.isin(*_NULLISH),
    )
    return F.array_sort(F.array_distinct(scrubbed))


def split_list_column(col: Column, delimiter: str = LIST_DELIMITER) -> Column:
    """'a|b|a' → sorted distinct array (kgx_utils.py:884-899 + 871)."""
    return clean_array(F.split(col, "\\" + delimiter))


def coerce_boolean(col: Column) -> Column:
    """String → bool for `negated` (kgx_utils.py:899-901 via eval/str2bool)."""
    return F.when(F.lower(col.cast("string")).isin("true", "t", "1", "yes", "y"), F.lit(True)).when(
        F.lower(col.cast("string")).isin("false", "f", "0", "no", "n"), F.lit(False)
    )


def sanitize_import(df: DataFrame, list_columns: set[str] | None = None) -> DataFrame:
    """Apply the reference's per-property import coercions to a whole DataFrame.

    - declared multivalued columns arriving as strings are split on '|';
    - multivalued columns already arrays are deduped/sorted/null-scrubbed;
    - `negated` is coerced to boolean;
    - all other strings get \\n/\\t stripped and empty→null.
    """
    listcols = MULTIVALUED_PROPERTIES if list_columns is None else list_columns
    out = []
    for field in df.schema.fields:
        c = F.col(field.name)
        if field.name in BOOLEAN_PROPERTIES:
            expr = c if isinstance(field.dataType, T.BooleanType) else coerce_boolean(c)
        elif field.name in listcols:
            if isinstance(field.dataType, T.ArrayType):
                expr = clean_array(c)
            else:
                expr = split_list_column(c.cast("string"))
        elif isinstance(field.dataType, T.StringType):
            expr = clean_string(c)
        else:
            expr = c
        out.append(expr.alias(field.name))
    return df.select(*out)


def sanitize_export(df: DataFrame, delimiter: str = LIST_DELIMITER) -> DataFrame:
    """Inverse: arrays → '|'-joined strings, everything stringified
    (kgx_utils.py:912-1005). Used by the TSV sink."""
    out = []
    for field in df.schema.fields:
        c = F.col(field.name)
        if isinstance(field.dataType, T.ArrayType):
            expr = F.array_join(c, delimiter)
        elif isinstance(field.dataType, T.BooleanType):
            expr = F.when(c, "True").when(~c, "False")  # python str(bool)
        else:
            expr = c.cast("string")
        out.append(expr.alias(field.name))
    return df.select(*out)
