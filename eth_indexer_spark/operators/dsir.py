"""DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling"): choose
raw-corpus documents whose hashed n-gram distribution looks like a TARGET
domain (e.g. curated reference text), by importance weight under two
bag-of-ngrams models.

Method, re-expressed Spark-first:

1. **Features**: every document is a bag of word n-grams, each hashed into
   one of ``num_buckets`` feature buckets. The hash is the repo's portable
   md5 construction (first 15 hex digits as an integer, mod B) so the
   features are engine-reproducible and RNG-free.
2. **Models**: bucket-count vectors for the target and raw corpora — two
   skinny map-side-combined groupBys (at most B rows each, B bounded by
   construction, e.g. 4096).
3. **Log-ratio table**: add-one-smoothed ``log p_tgt[b] − log p_raw[b]``
   per bucket, computed ONCE driver-side over the collected B-row count
   tables (the literal-centroid pattern of operators/clustering.py — the
   collect is bounded by B, never by corpus size) and shipped back as a
   single broadcast ``map<int,double>`` row (the tokenize.py pattern: the
   corpus is never exploded or joined per gram).
4. **Weights**: per-document ``Σ_grams ratio[bucket(gram)]`` as a pure
   array expression — ``transform`` + ``aggregate`` over the document's own
   gram array, summed IN ARRAY ORDER, so the double accumulation is
   deterministic (bit-identical across runs, partitionings, and vs the
   sequential Python model in tests). Map-only: zero shuffle beyond the
   two model aggregations.
5. **Selection**: top-k by (weight, id) — TakeOrderedAndProject, never a
   global sort. ``seed`` switches to the paper's actual procedure —
   Gumbel-top-k resampling (top-k of ``logweight + Gumbel`` ≡ sampling k
   items without replacement ∝ exp(logweight)) — with the Gumbel noise
   derived from md5(seed, id), so even the "random" form is RNG-free,
   re-run-stable, and engine-portable (the repo-wide sampling
   convention, operators/sampling.py).

Registered as ``x_dsir_select`` (rows-only: the weights embed driver-side
``math.log`` literals, which DuckDB's ``ln`` cannot be trusted to
reproduce to the last ulp; exactness is instead pinned by a sequential
Python model in pytest).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from eth_indexer_spark.operators.quality import word_ngrams


def hashed_gram_buckets(text_col, n: int = 2, num_buckets: int = 4096) -> Column:
    """array<int> of feature-bucket ids, one per (non-distinct) word n-gram
    of the document, in document order. Portable md5 hashing — identical in
    any engine, no RNG, no JVM-specific hash."""
    return F.transform(
        word_ngrams(text_col, n),
        lambda g: (
            F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("long")
            % num_buckets
        ).cast("int"),
    )


def _bucket_counts(df: DataFrame, text_col: str, n: int, num_buckets: int) -> dict:
    """{bucket: count} over a corpus — one explode + one skinny groupBy,
    collected driver-side (≤ num_buckets rows by construction)."""
    rows = (
        df.select(
            F.explode(hashed_gram_buckets(text_col, n, num_buckets)).alias("b")
        )
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    return {r["b"]: r["c"] for r in rows}


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 2,
    num_buckets: int = 4096,
) -> DataFrame:
    """``(id, n_grams, dsir_logweight)`` for every raw document:
    ``dsir_logweight = Σ_grams [log p_tgt(bucket) − log p_raw(bucket)]``
    with add-one smoothing over ``num_buckets`` buckets. Higher = more
    target-like. Documents with no n-gram (shorter than ``n`` words) get
    weight 0.0 and ``n_grams = 0`` — callers decide their fate; silently
    dropping them here would shrink the corpus before selection."""
    tgt = _bucket_counts(target, text_col, n, num_buckets)
    rawc = _bucket_counts(raw, text_col, n, num_buckets)
    t_total = sum(tgt.values())
    r_total = sum(rawc.values())
    ratio = {
        b: (
            math.log((tgt.get(b, 0) + 1) / (t_total + num_buckets))
            - math.log((rawc.get(b, 0) + 1) / (r_total + num_buckets))
        )
        for b in range(num_buckets)
    }
    spark = raw.sparkSession
    ratio_map = spark.createDataFrame([(ratio,)], "__dsir_ratio map<int,double>")

    buckets = hashed_gram_buckets(text_col, n, num_buckets)
    return (
        raw.crossJoin(F.broadcast(ratio_map))
        .select(
            F.col(id_col),
            F.size(buckets).alias("n_grams"),
            F.aggregate(
                F.transform(buckets, lambda b: F.element_at("__dsir_ratio", b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("dsir_logweight"),
        )
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    text_col: str,
    id_col: str,
    k: int,
    n: int = 2,
    num_buckets: int = 4096,
    seed: str | None = None,
) -> DataFrame:
    """The ``k`` selected raw documents — TakeOrderedAndProject over the
    weight column, never a global sort.

    ``seed=None``: deterministic top-k by (weight, id) — the
    reproducible-pipeline variant. ``seed="..."``: the paper's
    Gumbel-top-k resampling — top-k of ``logweight + Gumbel(0,1)``, which
    draws k documents without replacement with probability ∝
    exp(logweight). The Gumbel variate is ``−log(−log u)`` with ``u``
    derived from md5(seed, id): a different seed is an independent
    resample, the SAME seed is bit-reproducible, and no engine RNG is
    involved."""
    w = dsir_weights(raw, target, text_col, id_col, n, num_buckets)
    score = F.col("dsir_logweight")
    if seed is not None:
        # u strictly inside (0, 1): a 13-hex-digit slice gives h in
        # [0, 2^52) — below 2^53, so h, h + 0.5, and the division are all
        # EXACT in double; u ranges over [2^-53, 1 - 2^-53] and neither
        # log can hit log(0). (A wider slice rounds: 15 hex digits cast to
        # double round values near 2^60 UP, making u == 1.0 and the score
        # silently NULL for ~2^-54 of ids.)
        h = F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.lit(seed), F.col(id_col).cast("string"))),
                1,
                13,
            ),
            16,
            10,
        ).cast("double")
        u = (h + F.lit(0.5)) / F.lit(float(2**52))
        score = score + (-F.log(-F.log(u)))
    return (
        w.withColumn("__dsir_score", score)
        .orderBy(F.col("__dsir_score").desc(), F.col(id_col))
        .limit(k)
        .drop("__dsir_score")
    )
