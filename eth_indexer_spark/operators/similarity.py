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

import itertools
import math
import random

from pyspark.sql import Column, DataFrame
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


def cosine_topk_batch(
    emb: DataFrame, queries: DataFrame, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
    query_id_col: str = "query_id", query_vec_col: str = "query_vec",
    exclude_self: bool = True, n_blocks: int = 32,
) -> DataFrame:
    """Exact top-k neighbors for EVERY query vector in ONE corpus scan —
    the batch-retrieval shape (dedup-against-reference-set, eval-set
    retrieval) where per-query :func:`cosine_topk` calls would re-scan the
    corpus Q times.

    ``queries`` is a small (query_id, query_vec) DataFrame, broadcast to
    every task; similarities use the same deterministic fold-order
    ``cosine`` expression as the rest of this module (JVM, no UDF), so
    rankings match an ANSI-SQL oracle bit-for-bit. Top-k is two-staged so
    no task ever sorts more than its block: stage 1 keeps k per
    (query, id-hash block) — the map-side partial reduction built-in aggs
    can't express for top-k — leaving ≤ k·n_blocks·Q tiny rows for the
    stage-2 global window. The corpus itself is never shuffled; only skinny
    (query_id, id, sim) rows move, proportional to the N·Q similarity
    evaluations that exactness inherently costs.

    ``exclude_self`` assumes query ids are drawn from the CORPUS id
    namespace (the self-retrieval shape: every query row is also a corpus
    row, and its trivial self-match must not consume a top-k slot). For an
    external query set whose ids merely COLLIDE with corpus ids, the filter
    would silently drop a legitimate neighbor — pass
    ``exclude_self=False`` there (or re-key the queries first).

    Returns (query_id, id, rnk) with rnk in [1, k].
    """
    from pyspark.sql import Window as W

    skinny = (
        emb.crossJoin(F.broadcast(queries))
        .select(
            F.col(query_id_col),
            F.col(id_col),
            cosine(_vec(vec_col), _vec(query_vec_col)).alias("sim"),
        )
    )
    if exclude_self:
        skinny = skinny.filter(F.col(id_col) != F.col(query_id_col))
    blk = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks))
    order = (F.desc("sim"), F.col(id_col))
    w1 = W.partitionBy(F.col(query_id_col), blk).orderBy(*order)
    local = (
        skinny.withColumn("__rn", F.row_number().over(w1))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
    w2 = W.partitionBy(query_id_col).orderBy(*order)
    return (
        local.withColumn("rnk", F.row_number().over(w2))
        .filter(F.col("rnk") <= k)
        .select(query_id_col, id_col, "rnk")
    )


def cosine_pairs(
    emb: DataFrame, threshold: float,
    id_col: str = "vec_id", vec_col: str = "embedding",
    n_blocks: int = 16,
) -> DataFrame:
    """Exact embedding near-dup pairs: cosine ≥ threshold, i < j.

    Distributed block-pair form: ids hash into ``n_blocks`` blocks; each
    unordered block pair (bi ≤ bj) is one unit of work, reached through TWO
    equi-joins (a broadcast of the tiny block-pair list, then a hash join on
    the right block) — never a nested-loop cross join and never a broadcast
    of the vector table. Exactness inherently costs O(N²/2) similarity
    evaluations; this shape spreads them evenly over B(B+1)/2 hash
    partitions with O(N·(B+1)/2) shuffled rows, so wall-clock scales with
    cluster width. (The sub-quadratic path is :func:`rhp_banded_pairs` —
    recall < 1, candidates exact-verified.) Pre-normalizes once so the pair
    predicate is a plain dot product; zero-norm vectors are dropped (cosine
    undefined)."""
    # norm hoisted into a column: dividing inside the transform lambda would
    # re-evaluate the O(dim) fold per element → O(dim²) work per row
    unit = (
        emb.withColumn("__norm", norm(_vec(vec_col)))
        .filter(F.col("__norm") > 0)
        .select(
            F.col(id_col).alias("id"),
            F.transform(_vec(vec_col), lambda x: x / F.col("__norm")).alias("u"),
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).alias("blk"),
        )
    )
    block_pairs = emb.sparkSession.createDataFrame(
        [(i, j) for i in range(n_blocks) for j in range(i, n_blocks)],
        "bi int, bj int",
    )
    a = unit.select(
        F.col("id").alias("a_id"), F.col("u").alias("a_u"), F.col("blk").alias("a_blk")
    ).join(F.broadcast(block_pairs), F.col("a_blk") == F.col("bi"))
    b = unit.select(
        F.col("id").alias("b_id"), F.col("u").alias("b_u"), F.col("blk").alias("b_blk")
    )
    sim = dot(F.col("a_u"), F.col("b_u"))
    return (
        a.join(b, F.col("bj") == F.col("b_blk"))
        # same-block pairs appear in both orders → keep one; cross-block
        # pairs appear once in arbitrary order → emit (min, max)
        .filter((F.col("a_blk") < F.col("b_blk")) | (F.col("a_id") < F.col("b_id")))
        .filter(sim >= threshold)
        .select(
            F.least("a_id", "b_id").alias("i"),
            F.greatest("a_id", "b_id").alias("j"),
        )
    )


def rhp_banded_pairs(
    emb: DataFrame, dim: int, threshold: float,
    r: int = 8, L: int = 12, seed: int = 42,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Sub-quadratic near-dup pairs: banded random-hyperplane LSH →
    exact-verify. ``L`` independent bucketings of ``r`` planes each;
    candidate pairs share a bucket in ANY bucketing (OR-construction, the
    MinHash-band pattern); every candidate is then exactly verified with a
    full cosine, so precision is 1 and only recall is probabilistic:
    1 − (1 − p^r)^L with p = 1 − θ/π. Designed for DUPLICATE-grade
    thresholds (≥ ~0.8, p ≥ 0.85 → recall ≈ 1); at low thresholds (0.4)
    no LSH family prunes, use :func:`cosine_pairs`.

    Scale shape: per bucketing, pairs come from bucket-local self-joins
    (shuffle on bucket id, never all-pairs); candidates dedup once; one
    verify join. At 100 TB the bucket id is a partition column."""
    unit = (
        emb.withColumn("__norm", norm(_vec(vec_col)))  # hoisted: see cosine_pairs
        .filter(F.col("__norm") > 0)
        .select(
            F.col(id_col).alias("id"),
            F.transform(_vec(vec_col), lambda x: x / F.col("__norm")).alias("u"),
        )
    )
    cand = None
    for t in range(L):
        bk = rhp_lsh_buckets(unit, dim, n_planes=r, seed=seed + 1000 * t,
                             id_col="id", vec_col="u")
        lhs = bk.select(F.col("id").alias("i"), F.col("bucket"))
        rhs = bk.select(F.col("id").alias("j"), F.col("bucket"))
        pairs = lhs.join(rhs, "bucket").filter(F.col("i") < F.col("j")).select("i", "j")
        cand = pairs if cand is None else cand.unionByName(pairs)
    cand = cand.distinct()
    ua = unit.select(F.col("id").alias("i"), F.col("u").alias("ua"))
    ub = unit.select(F.col("id").alias("j"), F.col("u").alias("ub"))
    return (
        cand.join(ua, "i")
        .join(ub, "j")
        .filter(dot(F.col("ua"), F.col("ub")) >= threshold)
        .select("i", "j")
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
    # every bucket within the REQUESTED Hamming distance — all C(n_planes, h)
    # bit-flip masks for h = 0..probe_hamming, not just single flips
    probe = []
    for h in range(min(probe_hamming, n_planes) + 1):
        for bits in itertools.combinations(range(n_planes), h):
            m = 0
            for b in bits:
                m |= 1 << b
            probe.append(qb ^ m)

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
    exclude_id: int | None = None,
) -> DataFrame:
    """IVF coarse search with exactly ``nlist`` centroids.

    Centroids = the ``nlist`` lowest-id vectors (a deterministic, constant-
    size stand-in for one k-means pass — and expressible in ANSI SQL, so the
    whole operator is oracle-checkable). They are collected to the driver
    (nlist rows, CONSTANT in table size) and inlined as literals, so
    assignment is a single narrow scan evaluating nlist dot products per
    row — O(N·nlist), no join, no shuffle, no growing broadcast. Ties pick
    the smallest centroid id (matching ``ROW_NUMBER ... ORDER BY cs DESC,
    cid`` semantics). The query probes the ``nprobe`` nearest centroid
    lists, then an exact top-k runs over the probed lists only."""
    cent_rows = (
        emb.orderBy(F.col(id_col))
        .limit(nlist)
        .select(F.col(id_col).alias("cid"), _vec(vec_col).alias("cvec"))
        .collect()
    )
    # a centroid with a NULL / NaN / ±inf element cannot be rendered as a
    # numeric SQL literal (repr parses as a column name) and its cosine is
    # meaningless — exclude it from assignment and probing outright
    cents = [
        (int(r["cid"]), [float(x) for x in r["cvec"]])
        for r in cent_rows
        if r["cvec"] is not None
        and all(x is not None and math.isfinite(float(x)) for x in r["cvec"])
    ]
    if not cents:  # empty corpus (or only degenerate centroids): empty top-k
        return emb.select(F.col(id_col), F.lit(0.0).alias("sim")).limit(0)

    def _py_cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(y * y for y in b) ** 0.5
        return num / (na * nb) if na > 0 and nb > 0 else float("-inf")

    probe_ids = [
        cid
        for cid, _ in sorted(
            cents, key=lambda c: (-_py_cos(c[1], query_vec), c[0])
        )[:nprobe]
    ]

    # argmax over literal centroids: greatest() on (cs, -cid) structs picks
    # max cosine, ties → smallest cid; whole-stage-codegen, no shuffle.
    # Assembled as ONE SQL string over the staged __v column — the
    # Column-API loop cost nlist·dim driver py4j round trips per call —
    # mirroring cosine()'s exact composition (try_divide / zip_with /
    # left-fold aggregate) so values are bit-identical to the Column form.
    def _cos_sql(cv: list[float]) -> str:
        arr = ", ".join(f"CAST({float(x)!r} AS DOUBLE)" for x in cv)
        return (
            "try_divide("
            "aggregate(zip_with(__v, array({a}), (x, y) -> x * y), "
            "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v), "
            "sqrt(aggregate(transform(__v, x -> x * x), "
            "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)) * "
            "sqrt(aggregate(transform(array({a}), x -> x * x), "
            "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)))"
        ).format(a=arr)

    q = F.array(*[F.lit(float(x)) for x in query_vec])
    if len(cents) == 1:
        # greatest() needs >= 2 arguments; one centroid assigns trivially
        cid_expr = F.lit(cents[0][0]).cast("long")
    else:
        terms = ", ".join(
            f"named_struct('cs', {_cos_sql(cv)}, 'neg_cid', {-int(cid)}L)"
            for cid, cv in cents
        )
        cid_expr = -F.expr(f"(greatest({terms})).neg_cid")
    out = (
        emb.withColumn("__v", _vec(vec_col))
        .withColumn("__cid", cid_expr)
        .filter(F.col("__cid").isin(probe_ids))
        .select(F.col(id_col), cosine(F.col("__v"), q).alias("sim"))
    )
    if exclude_id is not None:
        out = out.filter(F.col(id_col) != exclude_id)
    return out.orderBy(F.desc("sim"), id_col).limit(k)
