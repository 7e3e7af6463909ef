"""Deterministic corpus sampling for training-data pipelines.

Not in the reference (no corpus layer); these are the standard
corpus-management primitives: reproducible subsampling for ablations and
per-stratum (language / source / quality-bucket) rate control for data
mixing. `df.sample()` is seed-dependent per partition layout and therefore
NOT reproducible across cluster sizes — these operators key the decision on
a HASH of a stable column, so the same document is kept or dropped
regardless of partitioning, executor count, or engine (the md5-based
selector is replayed exactly by the DuckDB oracle).

Scale shape: pure narrow filters over the scan — no shuffle, no sort, no
RNG state; the sampling predicate pushes into the scan's filter stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(col: Column, salt: str = "", buckets: int = 1000) -> Column:
    """Deterministic bucket in [0, buckets): first 8 md5 hex chars of
    (salt || key) as an integer, mod buckets. md5 (not xxhash64) so any
    engine reproduces the assignment bit-for-bit."""
    h = F.md5(F.concat(F.lit(salt), col.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % buckets


def hash_sample(
    df: DataFrame,
    key_col: str,
    rate_permille: int,
    salt: str = "",
) -> DataFrame:
    """Keep rows whose hash bucket < ``rate_permille`` (‰ of the corpus in
    expectation). Same key + same salt → same decision everywhere; change
    ``salt`` to draw an independent sample."""
    return df.where(hash_bucket(F.col(key_col), salt) < rate_permille)


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    rates_permille: dict[str, int],
    default_permille: int = 0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum hash sampling — the data-mixing primitive (e.g. keep 80%
    of 'en', 250‰ of 'de', drop everything unlisted). Rates are a literal
    map compiled into one codegen'd predicate; no join, no shuffle."""
    rate = F.lit(default_permille)
    for value, permille in sorted(rates_permille.items()):
        rate = F.when(F.col(stratum_col) == value, F.lit(permille)).otherwise(rate)
    return df.where(hash_bucket(F.col(key_col), salt) < rate)
