"""As-of join — an operator Spark lacks natively (pyspark guide §'Common
OLAP patterns').

For each left row, attach the latest right row with right.ts ≤ left.ts within
the same key. Two implementations:

- `asof_join` (default): the UNION-AND-SWEEP plan — tag both sides, sort by
  (key, ts, side) inside ONE window, carry the last-seen right values with
  `last(..., ignorenulls=True)`, keep left rows. One shuffle on the key, no
  UDF, no range explosion; the window never holds more than the running
  last-right state. This is the scale path.
- pandas `merge_asof` per group via applyInPandas would be the fallback for
  semantics the sweep can't express (nearest / tolerance); not needed here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    value_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """left rows + latest-right-as-of columns (null when no prior right row).

    Ties (equal ts on both sides) resolve right-before-left, i.e. a right row
    at exactly left.ts IS visible to it — matching DuckDB's ASOF JOIN
    (right.ts <= left.ts).
    """
    value_cols = value_cols or [c for c in right.columns if c not in (key, ts)]
    # the right row travels as ONE struct so carried values stay row-atomic
    # (independent per-column last() could mix values from different rows)
    rrow_type = F.struct(*[F.col(c).alias(c) for c in value_cols])
    l_tag = left.select(
        F.col(key), F.col(ts), F.lit(1).alias("_side"),
        *[F.col(c) for c in left.columns if c not in (key, ts)],
    ).withColumn("_rrow", F.lit(None).cast(
        "struct<" + ",".join(f"{c}:{dict(right.dtypes)[c]}" for c in value_cols) + ">"
    ))
    r_tag = right.select(
        F.col(key), F.col(ts), F.lit(0).alias("_side"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left.columns if c not in (key, ts)],
        rrow_type.alias("_rrow"),
    )
    merged = l_tag.unionByName(r_tag)
    # right rows (side 0) sort before left rows at equal ts → visible to them
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = merged.withColumn("_last", F.last("_rrow", ignorenulls=True).over(w))
    out = carried.where(F.col("_side") == 1).select(
        "*", *[F.col("_last").getField(c).alias(f"{c}{suffix}") for c in value_cols]
    )
    return out.drop("_side", "_rrow", "_last")
