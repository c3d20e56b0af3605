"""Deterministic corpus splitting and mixing for training-data pipelines.

The split every training run needs — train/val/test — must be (a) stable
under re-runs and data re-shuffles, (b) portable across engines (the same
document lands in the same split whether the pipeline runs on Spark, DuckDB,
or a one-off script), and (c) free at 100 TB. Random sampling
(``df.sample``/``sampleBy``) fails all three: it depends on partition layout
and the engine's RNG stream. A pure hash of the stable document id fails
none: ``split = f(md5(id))`` is a zero-shuffle projection, reproducible
everywhere md5 exists.

md5 (not xxhash64) is deliberate: every engine agrees on it byte-for-byte,
so split assignment is auditable in plain SQL — which is also what makes
the registered query (`x_corpus_split`) fully oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def hash_bucket(col, buckets: int = 100) -> Column:
    """Engine-agnostic deterministic bucket in [0, buckets): the first 8 md5
    hex digits of the stringified id, as an integer, mod ``buckets``. Pure
    projection — no shuffle, no state, no RNG."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("long")
        % buckets
    )


def split_corpus(
    df: DataFrame,
    id_col: str,
    splits: dict[str, int] | None = None,
    buckets: int = 100,
) -> DataFrame:
    """Append a ``split`` label column assigning every row to a named split.

    ``splits`` maps label → bucket share; shares must sum to ``buckets``
    (default 98/1/1 percent). Assignment is by contiguous bucket ranges of
    :func:`hash_bucket`, so it is deterministic per id, disjoint, and
    exhaustive over rows WITH an id. A NULL id cannot be hashed, so its
    ``split`` is NULL — never silently folded into a named split (the
    all-conditions-NULL fallthrough previously routed every NULL-id row
    into the LAST declared split, i.e. the eval set). This matches
    :func:`weighted_mix`, whose NULL-bucket comparison drops NULL-id rows."""
    splits = splits or {"train": 98, "val": 1, "test": 1}
    if sum(splits.values()) != buckets:
        raise ValueError(f"split shares {splits} must sum to {buckets}")
    b = hash_bucket(id_col, buckets)
    expr = F.when(b.isNull(), F.lit(None).cast("string"))
    upper = 0
    *head, (last_label, _) = splits.items()
    for label, share in head:
        upper += share
        expr = expr.when(b < upper, label)
    return df.withColumn("split", expr.otherwise(last_label))


def stratified_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    n_per_group: int,
    rank_col: str | None = None,
) -> DataFrame:
    """Deterministic fixed-size sample per group — the "inspect 100 docs
    from every language/source" audit shape, and the balanced-subset
    builder ("exactly n docs per stratum") where :func:`weighted_mix`'s
    rate-based filter gives proportions, not counts.

    Rows rank within their group by ``md5(id)`` (unique tiebreaker: the id
    itself) and the first ``n_per_group`` survive. Hash-ordering makes the
    sample uniform-ish yet fully deterministic, engine-portable, and — like
    the other operators here — NESTED: the n=100 sample contains the n=50
    sample, so audits at different sizes agree on their overlap.

    Scale shape: one hash shuffle on the group key; Spark's WindowGroupLimit
    pushes the ``rank ≤ n`` bound below the exchange, so each map task keeps
    only n rows per group before anything moves. Skew note: stratification
    keys (language, source) are low-cardinality by nature, so per-group data
    CAN be huge — but the partial limit bounds what reaches the skewed
    reducer at n_per_group × map-tasks rows, which is what makes this form
    safe where a naive global sort would not be.

    Optionally exposes the rank as ``rank_col`` (1-based within group).
    """
    key = F.md5(F.col(id_col).cast("string"))
    w = W.partitionBy(group_col).orderBy(key, F.col(id_col))
    out = df.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= n_per_group
    )
    if rank_col is None:
        return out.drop("__rn")
    return out.withColumnRenamed("__rn", rank_col)


def temperature_mix(
    df: DataFrame,
    id_col: str,
    group_col: str,
    alpha: float = 0.3,
    target_fraction: float = 1.0,
    buckets: int = 10_000,
    max_groups: int = 10_000,
) -> DataFrame:
    """Temperature-based source rebalancing — the multilingual sampling
    standard (mT5 / XLM-R style): sample groups proportional to
    ``p_g^alpha`` so low-resource sources are up-weighted relative to
    their share (``alpha=1`` keeps natural proportions, ``alpha→0``
    approaches uniform-over-groups). ``target_fraction`` is the overall
    share of the corpus to keep.

    Per-group keep rates are derived by deterministic water-filling: a
    group whose temperature share exceeds its size keeps everything (rate
    capped at 1) and its excess budget is redistributed over the remaining
    groups — iterated to a fixpoint, in sorted group order so the float
    accumulation is bit-reproducible run-to-run. The actual row filter is
    :func:`weighted_mix` (md5 bucket < quantized threshold): zero-shuffle,
    RNG-free, nested across sweeps of ``alpha``.

    Scale shape: ONE skinny groupBy for the per-group counts (bounded
    collect — sources/languages are low-cardinality by nature, the same
    driver-side-literal pattern as k-means centroids), then a map-only
    filter. The low-cardinality contract is ENFORCED, not advisory: the
    driver reads at most ``max_groups + 1`` grouped rows (a bounded
    ``take``, never an unbounded ``collect``) and raises if the group
    column exceeds ``max_groups`` distinct values — a caller passing a
    high-cardinality column (a domain hash, a doc id) fails loudly instead
    of flooding the driver. Rates embed driver-computed ``**alpha`` float
    literals, so the registered query is rows-only checked; pytest pins the
    kept set bit-exactly against a sequential Python model instead (the
    DSIR convention)."""
    if not 0.0 <= target_fraction <= 1.0:
        raise ValueError(f"target_fraction must be in [0, 1], got {target_fraction}")
    if alpha < 0.0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    if max_groups < 1:
        raise ValueError(f"max_groups must be >= 1, got {max_groups}")
    head = (
        df.groupBy(F.col(group_col).alias("g"))
        .agg(F.count(F.lit(1)).alias("n"))
        .take(max_groups + 1)
    )
    if len(head) > max_groups:
        raise ValueError(
            f"temperature_mix: {group_col!r} has more than {max_groups} "
            "distinct values — this operator is for low-cardinality source/"
            "language columns (raise max_groups only if the driver can hold "
            "the per-group rate map)"
        )
    counts = {r["g"]: r["n"] for r in head}
    if None in counts:
        # weighted_mix's when-chain would silently assign NULL groups the
        # default threshold 0 — deleting them while target_fraction claims
        # to be honored; fail loudly instead
        raise ValueError(
            f"temperature_mix: {counts[None]} rows have a NULL {group_col!r}; "
            "assign them a source before mixing"
        )
    total = sum(counts[g] for g in sorted(counts))
    if total == 0:
        return df.filter(F.lit(False))
    weights = {g: (counts[g] / total) ** alpha for g in counts}
    budget = target_fraction * total
    rates: dict[str, float] = {}
    remaining = dict(weights)
    while remaining:
        z = sum(remaining[g] for g in sorted(remaining))
        capped = {g for g in remaining if budget * remaining[g] / z >= counts[g]}
        if not capped:
            for g in remaining:
                rates[g] = (budget * remaining[g] / z) / counts[g]
            break
        for g in sorted(capped):
            rates[g] = 1.0
            budget -= counts[g]
            del remaining[g]
    # weighted_mix quantizes thresholds to int(round(rate * buckets)): a
    # group whose water-filled rate lands below 0.5/buckets would quantize
    # to threshold 0 and be dropped ENTIRELY — the exact opposite of the
    # up-weight-low-resource intent. Clamp every nonzero rate to the
    # smallest representable threshold (1/buckets) so tiny sources keep a
    # floor share instead of vanishing. target_fraction drift from the
    # clamp is at most n_groups/buckets of the corpus — immaterial at the
    # enforced group cardinality.
    rates = {g: max(r, 1.0 / buckets) if r > 0.0 else r for g, r in rates.items()}
    return weighted_mix(df, id_col, group_col, rates, buckets=buckets)


def shuffle_order(df: DataFrame, id_col: str, pos_col: str = "shuffle_pos") -> DataFrame:
    """Deterministic global corpus shuffle: append a 1-based training-order
    position obtained by ranking on ``md5(id)`` (id appended as the unique
    tiebreaker). The reproducible alternative to an RNG permutation: the
    order is uniform-ish, stable under re-runs and engine-portable, and a
    resumed/restarted job sees the identical epoch order.

    Scale shape: positions come from the two-phase distributed prefix sum
    over the hash key (operators/prefix_sum.py) — one literal-boundary
    bucket shuffle and a broadcast of per-bucket offsets at any corpus
    size, never a single-task ``ROW_NUMBER`` over everything (which is how
    the oracle expresses it, and exactly what a 100 TB corpus cannot run)."""
    from eth_indexer_spark.operators.prefix_sum import global_running_sum

    if pos_col in ("__shuffle_key", "__pos"):
        # internal names: the cleanup drop below would silently remove the
        # caller's output column
        raise ValueError(f"pos_col {pos_col!r} collides with an internal column")
    c = F.col(id_col)
    keyed = df.withColumn(
        "__shuffle_key", F.concat(F.md5(c.cast("string")), c.cast("string"))
    )
    out = global_running_sum(
        keyed,
        "__shuffle_key",
        F.lit(1).cast("decimal(38,0)"),
        out_col="__pos",
        # numeric boundary proxy: the first 15 md5 hex digits as an integer
        # — monotone in the string key (hex chars sort like their values)
        order_proxy=F.conv(F.substring(F.col("__shuffle_key"), 1, 15), 16, 10).cast("long"),
    )
    return out.withColumn(pos_col, F.col("__pos").cast("long")).drop(
        "__shuffle_key", "__pos"
    )


def token_budget_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    token_col,
    budget: int,
    cum_col: str = "cum_tokens",
    reuse_upstream: bool = False,
) -> DataFrame:
    """Token-BUDGET sampling: per group (source, language, shard), keep
    documents in deterministic md5(id) order until the group's cumulative
    token count reaches ``budget``, then stop. The absolute-budget
    complement of :func:`weighted_mix`'s keep-rates — how real corpus specs
    are written ("50 B tokens of web, 5 B of code"), and like the rest of
    this module it is RNG-free: re-runs, resumes, and other engines pick the
    identical document set.

    Scale shape: the cumulative count comes from
    :func:`~eth_indexer_spark.operators.prefix_sum.grouped_running_sum`, so
    a 100 TB source with a handful of groups still fans out across all
    literal-boundary buckets (one hash shuffle + broadcast offsets) instead
    of one reducer per group — the failure mode of a plain
    ``Window.partitionBy(group)`` here, where group cardinality is by
    construction tiny.

    Returns the kept rows with ``cum_col`` (long) appended. The kept set is
    the MAXIMAL PREFIX of the group's md5 order whose token sum fits:
    cumulative counts run over all documents, and the filter is
    ``cum <= budget``, so the first overflowing document stops the group
    (no knapsack-style skipping past it — skipping would make membership
    depend on every earlier document's size, which is both harder to audit
    and not what corpus specs mean by "take N tokens of X")."""
    from eth_indexer_spark.operators.prefix_sum import grouped_running_sum

    c = F.col(id_col)
    tok = F.col(token_col) if isinstance(token_col, str) else token_col
    # a NEGATIVE count is a data error that would make the cumulative sum
    # non-monotone — the budget filter would then keep a non-contiguous
    # set, breaking the maximal-prefix contract — and a NULL count cannot
    # contribute to a budget; both are excluded (NULL >= 0 is NULL → row
    # filtered). Zero-token documents are legitimate (empty docs) and
    # budget-neutral, so they stay.
    keyed = df.filter(tok >= 0).withColumn(
        "__tb_key", F.concat(F.md5(c.cast("string")), c.cast("string"))
    )
    out = grouped_running_sum(
        keyed,
        group_col,
        ["__tb_key"],
        tok.cast("decimal(38,0)"),
        out_col="__tb_cum",
        order_proxy=F.conv(F.substring(F.col("__tb_key"), 1, 15), 16, 10).cast("long"),
        reuse_upstream=reuse_upstream,
    )
    return (
        out.filter(F.col("__tb_cum") <= budget)
        .withColumn(cum_col, F.col("__tb_cum").cast("long"))
        .drop("__tb_key", "__tb_cum")
    )


def weighted_mix(
    df: DataFrame,
    id_col: str,
    group_col: str,
    rates: dict[str, float],
    buckets: int = 10_000,
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-group downsampling — the corpus-mixing step that
    rebalances training data across sources/languages/domains ("keep 100%
    of the low-resource language, 30% of the web crawl").

    A row survives iff ``hash_bucket(id) < rate(group) * buckets``: the
    same id-hash machinery as :func:`split_corpus`, so the kept set is
    stable under re-runs and engine-portable (no RNG), a pure filter with
    zero shuffle at any scale, and NESTED — the kept set at rate 0.3 is a
    subset of the kept set at 0.5, which is what makes mixing-ratio sweeps
    comparable run-to-run. Groups absent from ``rates`` keep
    ``default_rate`` (0 = drop, the explicit-allowlist posture).

    Rates are quantized to ``1/buckets`` (default 10⁻⁴); exact expected
    proportions, not exact counts — at training-corpus sizes the binomial
    deviation is immaterial, and determinism is worth more than exactness.
    """
    for g, r in list(rates.items()) + [("default_rate", default_rate)]:
        if not (0.0 <= r <= 1.0):
            raise ValueError(f"rate for {g!r} must be in [0, 1], got {r}")
    b = hash_bucket(id_col, buckets)
    thresh = None
    for g, r in rates.items():
        cond = F.col(group_col) == g
        t = F.lit(int(round(r * buckets)))
        thresh = F.when(cond, t) if thresh is None else thresh.when(cond, t)
    thresh = (
        F.lit(int(round(default_rate * buckets)))
        if thresh is None
        else thresh.otherwise(int(round(default_rate * buckets)))
    )
    return df.filter(b < thresh)
