"""Physical-plan audits: the properties that make queries scale are
ASSERTED, not assumed — filters reach the parquet scan (PushedFilters),
projections prune the read schema (ReadSchema), top-k compiles to
TakeOrderedAndProject / WindowGroupLimit partial limits, intentional
broadcasts plan as BroadcastHashJoin, and nothing plans a cartesian product.
A regression in any of these is a silent 100×-at-scale bug that correctness
tests cannot catch."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

from eth_indexer_spark.plans import analytics, extensions

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_point_lookup_pushes_filter_to_scan(spark):
    plan = plan_of(analytics.QUERIES["p1_point_lookup"](spark, SF))
    assert "PushedFilters" in plan
    pushed = plan.split("PushedFilters:", 1)[1].splitlines()[0]
    assert "IsNotNull" in pushed or "EqualTo" in pushed, pushed


def test_range_scan_pushes_range_predicates(spark):
    plan = plan_of(analytics.QUERIES["p2_range_scan"](spark, SF))
    pushed = plan.split("PushedFilters:", 1)[1].splitlines()[0]
    assert "GreaterThan" in pushed and "LessThan" in pushed, pushed


def test_q1_prunes_read_schema(spark):
    """The pricing summary touches 7 lineitem columns; the scan must not
    read the rest (l_comment is the canary — it is the widest column)."""
    plan = plan_of(analytics.QUERIES["q1_pricing_summary"](spark, SF))
    schema_line = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    assert "l_comment" not in schema_line
    assert "l_quantity" in schema_line


def test_topk_compiles_to_take_ordered(spark):
    plan = plan_of(analytics.QUERIES["t3_topk_scan"](spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_ann_topk_compiles_to_take_ordered(spark):
    plan = plan_of(extensions.x_ann_cosine_topk(spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_batch_topk_has_partial_window_limits(spark):
    """The batch retrieval op must keep per-task partial top-k
    (WindowGroupLimit) BEFORE each exchange — without it every (query, sim)
    row shuffles unbounded."""
    plan = plan_of(extensions.x_ann_batch_topk(spark, SF))
    assert plan.count("WindowGroupLimit") >= 2
    assert "BroadcastExchange" in plan  # the query set ships, not the corpus


def test_dim_join_broadcasts(spark):
    plan = plan_of(analytics.QUERIES["j5_broadcast_dim_join"](spark, SF))
    assert "BroadcastHashJoin" in plan


def test_no_cartesian_products_in_join_queries(spark):
    """CartesianProduct in a fact-fact join is the canonical scale-killer.
    (BroadcastNestedLoopJoin appears ONLY where a tiny literal side is
    intentionally shipped — the ANN query set — never between facts.)"""
    for name in ("q3_shipping_priority", "q5_local_supplier_volume",
                 "j4_semi_join", "j6_fact_fact_join", "j8_anti_join"):
        plan = plan_of(analytics.QUERIES[name](spark, SF))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_semi_join_plans_as_left_semi(spark):
    plan = plan_of(analytics.QUERIES["j4_semi_join"](spark, SF))
    assert "LeftSemi" in plan


def test_anti_join_plans_as_left_anti(spark):
    plan = plan_of(analytics.QUERIES["j8_anti_join"](spark, SF))
    assert "LeftAnti" in plan


def test_pack_sequences_distributes_prefix_sum(spark):
    """The packing op's global cumulative sum must run as the two-phase
    distributed form: a hash exchange on the literal-boundary bucket column
    (phase 1) and the per-bucket offsets joined back as a BROADCAST — the
    naive alternative (one Window.orderBy over everything) would funnel the
    whole corpus through a single task."""
    plan = plan_of(extensions.x_pack_sequences(spark, SF))
    assert "hashpartitioning(__ps_bucket" in plan
    assert "BroadcastHashJoin" in plan


def test_corpus_split_and_mix_are_zero_shuffle(spark):
    """Deterministic splitting/mixing are pure per-row projections/filters:
    any Exchange in their plans means the md5-bucket design regressed into
    a shuffle that costs a full repartition of 100 TB."""
    for fn in (extensions.x_corpus_split, extensions.x_corpus_mix):
        plan = plan_of(fn(spark, SF))
        assert "Exchange" not in plan, fn.__name__


def test_decontaminate_broadcasts_benchmark(spark):
    """Contamination detection must ship the (small) benchmark gram set to
    the corpus as a broadcast LeftSemi — a shuffled join here would
    repartition the exploded 100 TB corpus by gram."""
    plan = plan_of(extensions.x_decontaminate(spark, SF))
    assert "LeftSemi" in plan
    assert "BroadcastExchange" in plan


def test_decontam_hit_set_never_force_broadcast(spark):
    """Negative form of test_dim_join_broadcasts: the contaminated-id hit
    set is unbounded (a heavily contaminated corpus makes it corpus-scale),
    so the flag / anti joins must carry NO broadcast hint on it — AQE may
    still broadcast a small hit set at runtime, but a forced hint would OOM
    the driver at scale. With broadcast_bench=False the plan must contain
    zero hints anywhere; with it True, only the benchmark gram set's."""
    from eth_indexer_spark.operators import decontam

    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "f g h i j")], "id long, text string"
    )
    bench = spark.createDataFrame([(0, "a b c d")], "id long, text string")
    for fn in (decontam.contamination_flags, decontam.decontaminate):
        out = fn(docs, bench, "text", "id", k=4, broadcast_bench=False)
        analyzed = out._jdf.queryExecution().analyzed().toString()
        assert "ResolvedHint" not in analyzed, fn.__name__
        hinted = fn(docs, bench, "text", "id", k=4, broadcast_bench=True)
        analyzed = hinted._jdf.queryExecution().analyzed().toString()
        assert analyzed.count("ResolvedHint") == 1, fn.__name__


def test_stratified_sample_has_partial_window_limit(spark):
    """The per-stratum rank filter must push a WindowGroupLimit below the
    exchange: stratification keys are low-cardinality, so without the
    partial limit a whole stratum funnels through one reducer."""
    plan = plan_of(extensions.x_sample_stratified(spark, SF))
    assert "WindowGroupLimit" in plan


def test_chunk_documents_is_shuffle_free(spark):
    """Sliding-window chunking is a pure per-row explode: any Exchange
    means the chunker started moving the corpus to cut it."""
    plan = plan_of(extensions.x_chunk_documents(spark, SF))
    assert "Exchange" not in plan


def test_kmeans_assignment_is_shuffle_free(spark):
    """Centroids are inlined literals, so per-iteration assignment must be
    a pure scan-side projection — an Exchange here would shuffle the corpus
    once per Lloyd iteration."""
    from eth_indexer_spark.catalog import load_table
    from eth_indexer_spark.operators.clustering import kmeans_assign

    emb = load_table(spark, SF, "embeddings")
    cents = [(i, [0.1 * (i + 1)] * 64) for i in range(4)]
    plan = plan_of(kmeans_assign(emb, cents))
    assert "Exchange" not in plan


def test_tokenize_encode_never_explodes_corpus(spark):
    """Encoding attaches the vocabulary as one broadcast map row: the only
    Generate (explode) in the plan belongs to the bounded vocab build —
    an exploded corpus or a sort-merge join here means the map-lookup
    design regressed into shuffling every token twice."""
    import re

    plan = plan_of(extensions.x_tokenize_vocab(spark, SF))
    generates = re.findall(r"\(\d+\) Generate", plan)
    assert len(generates) == 1, plan
    assert "SortMergeJoin" not in plan


def test_corpus_shuffle_distributes_rank(spark):
    """The epoch-shuffle rank must run as the two-phase prefix sum
    (literal-boundary bucket exchange + broadcast offsets), not one global
    ROW_NUMBER window."""
    plan = plan_of(extensions.x_corpus_shuffle(spark, SF))
    assert "hashpartitioning(__ps_bucket" in plan
    assert "BroadcastHashJoin" in plan


def test_line_dedup_is_anti_join_never_cartesian(spark):
    """The boilerplate scrub must plan as hash aggregation + LeftAnti on the
    line digest — never a cartesian/nested-loop join, and the scrubbed text
    is never compared pairwise."""
    plan = plan_of(extensions.x_line_dedup(spark, SF))
    assert "LeftAnti" in plan, plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_substring_dedup_never_pairwise(spark):
    """EXACTSUBSTR must plan as digest aggregation + LeftSemi + one id join
    with array-expression excision — never a cartesian/nested-loop join.
    Exactly ONE Generate (the gram posexplode, pool-persisted so both
    consumers read the cached rows): the corpus is never token-exploded
    for reassembly, and the gram hashing never runs twice. The whole pool
    is released first — a MATERIALIZED cache entry left by ANY earlier
    test (the span audit shares this plan under CacheManager dedup)
    renders its stored adaptive plan inside the explain, which
    double-counts nodes."""
    import re

    from eth_indexer_spark.operators._persist import release_persisted

    release_persisted()
    plan = plan_of(extensions.x_substring_dedup(spark, SF))
    assert "LeftSemi" in plan, plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert len(re.findall(r"\(\d+\) Generate", plan)) == 1, plan
    assert "InMemoryTableScan" in plan


def test_incremental_substring_joins_index_never_cartesian(spark):
    """The online EXACTSUBSTR scrub must equi-join the batch's gram counts
    to the stored index and LeftSemi back onto the gram stream — never a
    cartesian/nested-loop join of batch text against the corpus index."""
    plan = plan_of(extensions.x_substring_dedup_incremental(spark, SF))
    assert "LeftSemi" in plan, plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_lm_score_aggregates_before_joining(spark):
    """The LM scorer must shuffle only (token) and (doc id) keyed rows:
    a vocabulary HashAggregate feeding an equi-join of the token stream,
    never a pairwise comparison of documents."""
    plan = plan_of(extensions.x_lm_unigram_score(spark, SF))
    assert "HashAggregate" in plan, plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dsir_weight_pass_is_map_only_topk(spark):
    """DSIR's two model aggregations run eagerly at build time (bounded
    driver collect — the literal-centroid pattern); the RETURNED plan must
    be scan → one-row broadcast ratio map → pure array-expression weight →
    TakeOrderedAndProject. No Generate (the corpus is never gram-exploded
    for weighting), no sort-merge join, no cartesian product."""
    import re

    plan = plan_of(extensions.x_dsir_select(spark, SF))
    assert "TakeOrderedAndProject" in plan, plan
    assert len(re.findall(r"\(\d+\) Generate", plan)) == 0, plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_pii_scrub_is_map_only(spark):
    """The PII scrub is one codegen'd projection over the scan: no exchange,
    no join, no aggregate anywhere in the plan."""
    plan = plan_of(extensions.x_pii_scrub(spark, SF))
    assert "Exchange" not in plan, plan
    assert "Join" not in plan
    assert "codegen id" in plan


def test_budget_sample_distributes_group_prefix_sum(spark):
    """The per-source cumulative token count must run as the grouped
    two-phase prefix sum (literal-boundary bucket exchange + broadcast
    offsets), never one reducer per source."""
    plan = plan_of(extensions.x_budget_sample(spark, SF))
    assert "hashpartitioning(__ps_bucket" in plan
    assert "BroadcastHashJoin" in plan


def test_incremental_minhash_prunes_corpus_with_semi_joins(spark):
    """The incremental near-dup path must prune the corpus index by
    left-semi joins (bucket share, then verification hsh lookup) — never a
    cartesian/nested-loop join, and the full-index hsh column must not
    reach verification unpruned."""
    plan = plan_of(extensions.x_dedup_minhash_incremental(spark, SF))
    assert "LeftSemi" in plan, plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_gopher_and_c4_are_map_only(spark):
    """Gopher rules and C4 line cleaning are pure Column expressions: any
    Exchange means a per-document filter regressed into a corpus shuffle."""
    for fn in (extensions.x_quality_gopher, extensions.x_c4_clean):
        plan = plan_of(fn(spark, SF))
        assert "Exchange" not in plan, fn.__name__


def test_cluster_representatives_is_aggregation_not_window(spark):
    """Canonical selection must stay a max(struct) aggregation with a
    map-side partial phase: a row_number window would serialize each
    cluster into one task and a boilerplate mega-cluster would straggle."""
    from eth_indexer_spark.operators import dedup

    cl = spark.createDataFrame([(1, 1), (2, 1)], "doc long, cluster long")
    sc = spark.createDataFrame([(1, 0.5), (2, 0.9)], "doc long, quality double")
    plan = plan_of(dedup.cluster_representatives(cl, sc, "quality"))
    assert "Window" not in plan
    assert "partial_max" in plan


def test_contamination_report_single_corpus_scan(spark):
    """The severity report rides one exploded gram stream: exactly two
    parquet scans total (benchmark slice + corpus — a third means the
    id-restore join regressed into a second corpus pass), the benchmark
    gram set broadcast."""
    import re

    plan = plan_of(extensions.x_contamination_report(spark, SF))
    # numbered tree nodes only — the formatted details section repeats each
    scans = re.findall(r"Scan parquet\s+\(\d+\)", plan)
    assert len(scans) == 2, plan
    assert "BroadcastExchange" in plan


def test_temperature_mix_filter_is_zero_shuffle(spark):
    """temperature_mix's returned frame is a pure md5-threshold filter
    (the rate derivation runs as its own bounded groupBy job at call
    time): any Exchange in the RESULT plan means the mixing filter
    regressed into a corpus shuffle."""
    plan = plan_of(extensions.x_temperature_mix(spark, SF))
    assert "Exchange" not in plan


def test_curation_v4_single_shuffle_region(spark):
    """v4's two text filters are map-only; the only shuffles belong to the
    contamination gram aggregation and its id join — and the benchmark
    gram set must arrive by broadcast, never a cartesian or a corpus
    repartition by gram."""
    plan = plan_of(extensions.x_curation_v4(spark, SF))
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_every_registered_query_holds_global_scale_invariants(spark):
    """Registry-wide sweep: EVERY query's physical plan is free of
    CartesianProduct and of row-at-a-time Python UDFs (BatchEvalPython —
    the repo's UDF policy allows only Arrow-batched pandas stages), and
    BroadcastNestedLoopJoin appears ONLY where a tiny literal side is
    intentionally shipped (the one-row vocab map, the ANN query set, the
    DSIR ratio map). Per-query audits pin specific shapes; this sweep
    guarantees no FUTURE registration quietly violates the baseline."""
    import __spark_entry__ as entrymod

    bnlj_whitelist = {"x_tokenize_vocab", "x_ann_batch_topk", "x_dsir_select"}
    violations = []
    for name, fn in entrymod.queries().items():
        plan = plan_of(fn(spark, SF))
        if "CartesianProduct" in plan:
            violations.append((name, "CartesianProduct"))
        if "BatchEvalPython" in plan:
            violations.append((name, "BatchEvalPython"))
        if "BroadcastNestedLoopJoin" in plan and name not in bnlj_whitelist:
            violations.append((name, "BroadcastNestedLoopJoin"))
    assert not violations, violations
