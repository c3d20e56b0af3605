"""Similarity search over embedding columns (array<float>).

- :func:`cosine_topk` — brute-force exact top-k for one query vector: a
  single narrow scan with the dot product as an ``F.zip_with``/``aggregate``
  expression (JVM, no UDF), then a top-k. The correctness baseline.
- :func:`cosine_pairs` — exact all-pairs ≥ threshold (embedding near-dup).
  Quadratic: fine per-bucket or at audit scale; the scale path is below.
- :func:`rhp_lsh_buckets` / :func:`rhp_ann_topk` — random-hyperplane LSH:
  deterministic seeded hyperplanes, bucket = sign-bit string; queries probe
  only their own bucket (plus Hamming-1 neighbors), turning the scan into a
  partition-pruned lookup. The 100 TB path: buckets are a partition column.
- :func:`ivf_topk` — IVF-style coarse quantization: deterministic sample of
  vectors as centroids, vectors assigned to the nearest centroid, a query
  probes the ``nprobe`` nearest centroid lists only.

All distances are computed in double precision with deterministic
accumulation order (array fold left-to-right), so results are reproducible
across runs and engines.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def _vec(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column) -> Column:
    """NULL (not an ANSI error) when either vector has zero norm; NULL sims
    sort last under desc ordering, so zero vectors never enter a top-k."""
    return F.try_divide(dot(a, b), norm(a) * norm(b))


def cosine_topk(
    emb: DataFrame, query_vec: list[float], k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """Exact top-k by cosine similarity to a literal query vector."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    df = emb.select(F.col(id_col), cosine(_vec(vec_col), q).alias("sim"))
    if exclude_id is not None:
        df = df.filter(F.col(id_col) != exclude_id)
    return df.orderBy(F.desc("sim"), id_col).limit(k)


def cosine_pairs(
    emb: DataFrame, threshold: float,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact embedding near-dup pairs: cosine ≥ threshold, i < j.
    Pre-normalizes once so the join condition is a plain dot product.
    Zero-norm vectors are dropped — cosine is undefined for them (and ANSI
    mode would otherwise raise on the division)."""
    unit = emb.filter(norm(_vec(vec_col)) > 0).select(
        F.col(id_col).alias("id"),
        F.transform(_vec(vec_col), lambda x: x / norm(_vec(vec_col))).alias("u"),
    )
    a, b = unit.alias("a"), unit.alias("b")
    sim = dot(F.col("a.u"), F.col("b.u"))
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .filter(sim >= threshold)
        .select(F.col("a.id").alias("i"), F.col("b.id").alias("j"))
    )


# ---------------------------------------------------------------------------
# Scale paths
# ---------------------------------------------------------------------------


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (driver-side, seeded)."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def rhp_lsh_buckets(
    emb: DataFrame, dim: int, n_planes: int = 8, seed: int = 42,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector a random-hyperplane LSH bucket (long in
    [0, 2^n_planes)). At scale, write partitioned by ``bucket`` so an ANN
    probe reads one partition."""
    planes = _hyperplanes(dim, n_planes, seed)
    v = _vec(vec_col)
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        pl = F.array(*[F.lit(x) for x in p])
        bucket = bucket + F.when(dot(v, pl) >= 0, F.lit(1 << i)).otherwise(0)
    return emb.select(F.col(id_col), F.col(vec_col), bucket.alias("bucket"))


def rhp_ann_topk(
    emb: DataFrame, query_vec: list[float], dim: int, k: int = 10,
    n_planes: int = 8, seed: int = 42, probe_hamming: int = 1,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only vectors whose LSH bucket is within
    ``probe_hamming`` bits of the query's bucket."""
    planes = _hyperplanes(dim, n_planes, seed)
    qb = 0
    for i, p in enumerate(planes):
        if sum(x * y for x, y in zip(query_vec, p)) >= 0:
            qb |= 1 << i
    probe = [qb]
    if probe_hamming >= 1:
        probe += [qb ^ (1 << i) for i in range(n_planes)]

    bucketed = rhp_lsh_buckets(emb, dim, n_planes, seed, id_col, vec_col)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        bucketed.filter(F.col("bucket").isin(probe))
        .select(F.col(id_col), cosine(_vec(vec_col), q).alias("sim"))
        .orderBy(F.desc("sim"), id_col)
        .limit(k)
    )


def ivf_topk(
    emb: DataFrame, query_vec: list[float], k: int = 10,
    nlist: int = 16, nprobe: int = 4,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse search: centroids = a deterministic 1/nlist sample of the
    vectors themselves (id-hash modulo — cheap stand-in for k-means, same
    plumbing); every vector joins its nearest centroid list; the query scans
    the nprobe nearest lists."""
    cents = (
        emb.filter(F.pmod(F.xxhash64(F.col(id_col)), F.lit(997)) < F.lit(997 // nlist))
        .select(F.col(id_col).alias("cid"), _vec(vec_col).alias("cvec"))
    )
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    probe_ids = [
        r["cid"]
        for r in cents.select("cid", cosine(F.col("cvec"), q).alias("cs"))
        .orderBy(F.desc("cs"), "cid")
        .limit(nprobe)
        .collect()
    ]
    assigned = (
        emb.crossJoin(F.broadcast(cents))
        .withColumn("cs", cosine(_vec(vec_col), F.col("cvec")))
        .withColumn(
            "rn",
            F.row_number().over(W.partitionBy(id_col).orderBy(F.desc("cs"), "cid")),
        )
        .filter(F.col("rn") == 1)
    )
    return (
        assigned.filter(F.col("cid").isin(probe_ids))
        .select(F.col(id_col), cosine(_vec(vec_col), q).alias("sim"))
        .orderBy(F.desc("sim"), id_col)
        .limit(k)
    )
