"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline (all arithmetic in
double, fixed left-fold order so the DuckDB oracle matches); the
scale path is LSH bucketing (random-hyperplane signs) that cuts the
candidate set before exact scoring.  All vector math uses built-in
higher-order functions (``zip_with``/``aggregate`` — JVM-side); a
numpy ``mapInPandas`` variant exists for when matrices get wide
enough that BLAS wins.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a: F.Column, b: F.Column) -> F.Column:
    """Σ a_i·b_i in double, left-to-right fold (deterministic)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: F.Column) -> F.Column:
    return F.sqrt(_dot(a, a))


def with_cosine(
    df: DataFrame, query_vec_col: str, vec_col: str = "embedding", round_to: int | None = 6
) -> DataFrame:
    c = _dot(F.col(vec_col), F.col(query_vec_col)) / (
        _norm(F.col(vec_col)) * _norm(F.col(query_vec_col))
    )
    if round_to is not None:
        c = F.round(c, round_to)
    return df.withColumn("cosine", c)


def cosine_topk(
    vectors: DataFrame,
    query_vec_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = 6,
) -> DataFrame:
    """Exact top-k by cosine to the vector with ``query_vec_id``.

    The 1-row query side is broadcast; the scan side streams — at
    scale this is a single map stage + a top-k (global sort of ≤k·P
    candidate rows via takeOrdered semantics under limit)."""
    q = vectors.where(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("_qv")
    )
    scored = with_cosine(
        vectors.where(F.col(id_col) != query_vec_id).crossJoin(F.broadcast(q)),
        "_qv",
        vec_col,
        round_to,
    )
    return (
        scored.select(id_col, "cosine")
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def knn_for_queries(
    vectors: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = 6,
) -> DataFrame:
    """Top-k neighbors for each of a small set of query vectors:
    broadcast the query side, window rank per query."""
    from pyspark.sql import Window

    q = vectors.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("_qv")
    )
    scored = with_cosine(
        vectors.crossJoin(F.broadcast(q)).where(F.col(id_col) != F.col("qid")),
        "_qv",
        vec_col,
        round_to,
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", F.col(id_col).alias("neighbor_id"), "cosine", "rank")
        .orderBy("qid", "rank")
    )


def cosine_pairs_above(
    vectors: DataFrame,
    threshold: float,
    max_id: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = 6,
) -> DataFrame:
    """All pairs with cosine ≥ threshold (embedding near-dup).

    Exact quadratic variant for bounded sets; the scale path is
    ``lsh_bucketed_pairs`` below (bucket first, pair only within
    buckets)."""
    d = vectors
    if max_id is not None:
        d = d.where(F.col(id_col) < max_id)
    a = d.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = d.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    c = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    if round_to is not None:
        c = F.round(c, round_to)
    return (
        pairs.withColumn("cosine", c)
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
        .orderBy("id_a", "id_b")
    )


def hyperplane_lsh_buckets(
    vectors: DataFrame,
    n_planes: int = 16,
    seed: int = 42,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH: bucket = sign-bit pattern of ``n_planes``
    fixed random projections.  Deterministic planes from a seeded
    numpy RNG.  Small plane sets bake into the plan as literals
    (broadcast-free); past EXPR_CENTROID_MAX_CELLS cells the sign
    pattern computes as one numpy matmul per Arrow batch instead
    (plan size O(1) — same blow-up guard as ``assign_centroids``).
    Near vectors collide with probability 1 - θ/π per plane."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    if planes.size <= EXPR_CENTROID_MAX_CELLS:
        sig = F.lit(0).cast("long")
        for j in range(n_planes):
            plane = F.array(*[F.lit(float(x)) for x in planes[j]])
            d = _dot(F.col(vec_col), plane)
            sig = sig + F.when(d > 0, F.lit(1).cast("long") * (1 << j)).otherwise(0)
        return vectors.select(id_col, sig.alias("bucket"))

    pl = np.ascontiguousarray(planes, dtype=np.float64)
    pows = (1 << np.arange(n_planes)).astype(np.int64)

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            bucket = ((m @ pl.T) > 0) @ pows
            yield pd.DataFrame({id_col: pdf[id_col], "bucket": bucket})

    return vectors.select(id_col, vec_col).mapInPandas(
        run, schema=f"{id_col} long, bucket long"
    )


def lsh_bucketed_pairs(
    vectors: DataFrame,
    threshold: float,
    n_planes: int = 8,
    seed: int = 42,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = 6,
) -> DataFrame:
    """Scale path for near-dup: exact cosine only within LSH buckets.

    Recall < 1 by design (LSH); bucket count 2^n_planes bounds the
    per-bucket pair blow-up.  The bucket join is an equi-join —
    shuffle on bucket id, AQE handles residual skew."""
    b = hyperplane_lsh_buckets(vectors, n_planes, seed, dim, id_col, vec_col)
    v = vectors.join(b, id_col)
    a = v.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), "bucket")
    c = v.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), "bucket")
    pairs = a.join(c, ["bucket"]).where(F.col("id_a") < F.col("id_b"))
    cos = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    if round_to is not None:
        cos = F.round(cos, round_to)
    return (
        pairs.withColumn("cosine", cos)
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
        .orderBy("id_a", "id_b")
    )


def _nearest_centroid(vec_col: F.Column, centroids: np.ndarray) -> F.Column:
    """cid of the nearest centroid by dot product, as one codegen'd
    expression: F.greatest over (dot, cid) structs — no join, single
    pass.  Ties break to the larger cid (struct comparison order) —
    deterministic.  Only used below EXPR_CENTROID_MAX_CELLS: the
    expression embeds n_centroids × dim literals, and Catalyst
    plan/codegen size blows up past ~a few thousand cells — larger
    quantizers route through the numpy path (``assign_centroids``)."""
    structs = [
        F.struct(
            _dot(vec_col, F.array(*[F.lit(float(x)) for x in centroids[c]])).alias("d"),
            F.lit(c).alias("cid"),
        )
        for c in range(len(centroids))
    ]
    return F.greatest(*structs)["cid"]


# above this many centroid cells (n_centroids × dim) the literal
# expression tree is replaced by a BLAS matmul in mapInPandas — plan
# size stays O(1) no matter how large the quantizer gets
EXPR_CENTROID_MAX_CELLS = 32 * 128


def assign_centroids(
    vectors: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
) -> DataFrame:
    """All input columns + ``cid`` (nearest centroid by dot product,
    ties to the larger cid).  Small quantizers use the codegen'd
    expression; large ones a vectorized numpy matmul per Arrow batch
    (mapInPandas — plan size independent of n_centroids × dim).  Both
    paths are deterministic; the path choice is a pure function of
    the quantizer size, so every caller of the same quantizer gets
    the same assignment."""
    if centroids.size <= EXPR_CENTROID_MAX_CELLS:
        return vectors.withColumn("cid", _nearest_centroid(F.col(vec_col), centroids))

    from pyspark.sql.types import IntegerType, StructField, StructType

    cents = np.ascontiguousarray(centroids, dtype=np.float64)
    n_c = cents.shape[0]

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            dots = m @ cents.T
            # ties break to the LARGER cid (parity with the struct-
            # greatest expression): argmax over the reversed columns
            # finds the last maximum
            cid = n_c - 1 - dots[:, ::-1].argmax(axis=1)
            yield pdf.assign(cid=cid.astype(np.int32))

    # fresh StructType — StructType.add would MUTATE the DataFrame's
    # cached schema object and corrupt the input plan
    schema = StructType(
        list(vectors.schema.fields) + [StructField("cid", IntegerType())]
    )
    return vectors.mapInPandas(run, schema=schema)


def ivf_train_centroids(
    vectors: DataFrame,
    n_centroids: int = 16,
    n_iters: int = 2,
    seed: int = 42,
    dim: int = 64,
    vec_col: str = "embedding",
) -> np.ndarray:
    """IVF coarse quantizer: deterministic seeded init + a few Lloyd
    iterations.  Assignment is a distributed single-pass expression;
    the centroid update collects n_centroids × dim doubles (tiny).
    At 10^12 rows you'd train on a sample — pass ``vectors.sample``."""
    rng = np.random.default_rng(seed)
    centroids = rng.standard_normal((n_centroids, dim))
    centroids /= np.linalg.norm(centroids, axis=1, keepdims=True)
    for _ in range(n_iters):
        assigned = assign_centroids(
            vectors.select(F.col(vec_col).alias("v")), centroids, vec_col="v"
        ).select("cid", "v")
        sums = (
            assigned.groupBy("cid")
            .agg(
                F.array(*[
                    F.sum(F.element_at("v", i + 1).cast("double")) for i in range(dim)
                ]).alias("vsum"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        for r in sums:
            c = np.array(r["vsum"], dtype=np.float64) / float(r["n"])
            n = np.linalg.norm(c)
            if n > 0:
                centroids[r["cid"]] = c / n
    return centroids


def ivf_topk(
    vectors: DataFrame,
    query_vec: np.ndarray,
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = 6,
) -> DataFrame:
    """IVF approximate top-k: probe the ``nprobe`` inverted lists
    whose centroids are closest to the query (driver-side numpy),
    exact cosine only within those lists.  Recall < 1 by design; the
    per-list filter is a single codegen'd expression, so the scan
    prunes to ~nprobe/n_centroids of the data before any vector math."""
    qv = np.asarray(query_vec, dtype=np.float64)
    probe = np.argsort(-(centroids @ qv))[:nprobe].tolist()
    in_probe = assign_centroids(vectors, centroids, vec_col).where(
        F.col("cid").isin(probe)
    ).drop("cid")
    qlit = F.array(*[F.lit(float(x)) for x in qv])
    cos = _dot(F.col(vec_col), qlit) / (_norm(F.col(vec_col)) * _norm(qlit))
    if round_to is not None:
        cos = F.round(cos, round_to)
    return (
        in_probe.select(id_col, cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def cosine_topk_numpy(
    vectors: DataFrame,
    query_vec: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """mapInPandas variant: per-partition BLAS matmul + local top-k,
    then global top-k of ≤k·P rows — the shape that wins when dim or
    batch is large."""
    qv = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(qv)

    def score(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            sims = (m @ qv) / (np.linalg.norm(m, axis=1) * qn)
            order = np.lexsort((pdf[id_col].to_numpy(), -sims))[:k]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy()[order],
                    "cosine": sims[order],
                }
            )

    partial = vectors.select(id_col, vec_col).mapInPandas(
        score, schema=f"{id_col} long, cosine double"
    )
    return partial.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)
