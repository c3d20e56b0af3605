"""Round-11 optimization pins: each test locks the equivalence argument of
one internal rewrite, so the cheaper form cannot silently drift from the
semantics the oracle checks.

- catalog relation memo: same DataFrame plan, hits after first load
- Column-tree memo: memoized builders return plan-identical expressions
- gopher char_sum: length(concat_ws('', words)) ≡ the aggregate fold
- c4 doc-verdict bind: one evaluation of the text input, same verdicts
"""
from __future__ import annotations

import random

from pyspark.sql import functions as F

from eth_indexer_spark import catalog
from eth_indexer_spark.operators import quality

SF = "/root/testdata/sf0.001"

# whitespace/punctuation adversaries: trailing tabs, CR, all-whitespace,
# bans straddling synthesized boundaries, phantom-empty split tokens
EDGE_TEXTS = [
    "",
    " ",
    "\t\t",
    "one line only.",
    "a b c.\nd e f!\ng h i?",
    "lorem ipsum somewhere.\nmore words here.\nthird line ok.",
    "brace { doc.\nsecond line here.\nthird line too.",
    " \ta b.\nc d e.\nf g h.",
    "word " * 50 + ".",
    "x.\n" * 10,
    "Tab\tseparated words here.\nanother line of text.\nfinal line present.",
    "ends with ellipsis...\nshort.\nthird line words.",
]


def _docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(EDGE_TEXTS)], "doc_id long, text string"
    )


def test_catalog_memo_returns_same_relation(spark):
    a = catalog.load_table(spark, SF, "documents")
    b = catalog.load_table(spark, SF, "documents")
    assert a is b  # memo hit: the session-scoped relation is shared
    # and a different sf_dir is a different relation
    c = catalog.load_table(spark, "/root/testdata/sf0.01", "documents")
    assert c is not a


def test_gopher_char_sum_concat_matches_aggregate_fold(spark):
    """length(concat_ws('', words)) == sum(length(word)): exact on every
    document, including empty/whitespace-only ones."""
    df = _docs(spark)
    words = F.split(F.trim(F.col("text")), r"\s+")
    old = F.aggregate(words, F.lit(0).cast("long"), lambda a, w: a + F.length(w))
    new = F.length(F.concat_ws("", words)).cast("long")
    bad = df.select(old.alias("o"), new.alias("n")).filter(
        F.col("o") != F.col("n")
    )
    assert bad.count() == 0
    rng = random.Random(11)
    fuzz = spark.createDataFrame(
        [
            (
                i,
                "".join(
                    rng.choice("ab \t\nc.!?…#-*x ")
                    for _ in range(rng.randint(0, 120))
                ),
            )
            for i in range(200)
        ],
        "doc_id long, text string",
    )
    assert (
        fuzz.select(old.alias("o"), new.alias("n"))
        .filter(F.col("o") != F.col("n"))
        .count()
        == 0
    )


def test_c4_bound_verdict_matches_unbound_form(spark):
    """The _bind-wrapped doc verdict keeps c4_line_filter's exact survivor
    set and outputs on an adversarial corpus (bans, whitespace edges,
    all-short lines)."""
    df = _docs(spark)
    got = quality.c4_line_filter(df, "text", "doc_id").collect()
    # reference: the unbound textbook form, built inline
    c = F.col("text")
    lines = F.split(c, "\n")
    m = 3

    def line_ok(l):
        ends = (
            l.endswith(".") | l.endswith("!") | l.endswith("?") | l.endswith('"')
        )
        runs_m = l.rlike(r"^\s*+(\S++\s++){%d}\S" % (m - 1))
        phantom = l.rlike(r"^ *+[\s&&[^ ]]")
        runs_m1 = l.rlike(r"^\s*+(\S++\s++){%d}\S" % (m - 2))
        ok = ends & (runs_m | (phantom & runs_m1))
        return ok & ~F.lower(l).contains("javascript")

    kept = F.filter(lines, line_ok)
    doc_ok = (
        (F.size(kept) >= 3)
        & ~F.lower(c).contains("lorem ipsum")
        & ~F.lower(c).contains("{")
    )
    want = (
        df.select(F.col("doc_id"), kept.alias("__kept"), doc_ok.alias("__ok"))
        .where(F.col("__ok"))
        .select(
            "doc_id",
            F.array_join("__kept", "\n").alias("clean_text"),
            F.size("__kept").alias("n_lines_kept"),
        )
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_c4_filter_evaluates_text_input_once(spark):
    """The pushed-down survivor filter carries exactly ONE copy of the text
    input expression: feeding an expensive derived column (the v4 shape)
    no longer re-evaluates it per verdict reference."""
    df = _docs(spark).select(
        "doc_id", F.upper(F.repeat(F.col("text"), 2)).alias("text")
    )
    plan = quality.c4_line_filter(df, "text", "doc_id")._jdf.queryExecution().executedPlan().toString()
    filter_lines = [l for l in plan.splitlines() if "Filter" in l and "repeat" in l]
    assert filter_lines, "expected the pushed-down filter over the derived text"
    # the derived input (repeat(...)) appears exactly once in the filter
    assert filter_lines[0].count("repeat(") == 1, filter_lines[0]


def test_colmemo_trees_are_plan_identical(spark):
    """A memoized gopher battery produces the same analyzed plan as a fresh
    build (cleared memo)."""
    from eth_indexer_spark.operators import _colmemo

    df = _docs(spark)
    a = quality.gopher_rules(df, "text", "doc_id")
    _colmemo.clear_col_memo()
    b = quality.gopher_rules(df, "text", "doc_id")
    assert a._jdf.queryExecution().analyzed().sameResult(
        b._jdf.queryExecution().analyzed()
    )


def test_minhash_hashed_distinct_matches_string_distinct(spark):
    """minhash_index's hsh column: distinct-by-hash of the raw shingle
    stream is BIT-identical (same order) to hashing the distinct-by-string
    set — the condition under which signatures, buckets, and verified
    pairs are unchanged."""
    from eth_indexer_spark.operators import dedup

    rng = random.Random(23)
    words = ("a", "b", "c", "d", "e")
    df = spark.createDataFrame(
        [
            (i, " ".join(rng.choice(words) for _ in range(rng.randint(0, 20))))
            for i in range(120)
        ],
        "doc_id long, text string",
    )
    old = F.transform(
        dedup.word_shingles("text", 3), lambda s: F.xxhash64(s)
    )
    new = F.array_distinct(
        F.transform(dedup._raw_word_shingles("text", 3), lambda s: F.xxhash64(s))
    )
    bad = df.select(old.alias("o"), new.alias("n")).filter(
        F.col("o") != F.col("n")
    )
    assert bad.count() == 0


def test_connected_components_empty_and_tiny_edge_sets(spark):
    """The pandas/Arrow label path keeps the driver finisher's schema and
    values, including the empty-edge-set corner (dtype pinned to int64)."""
    from eth_indexer_spark.operators import dedup

    empty = spark.createDataFrame([], "i long, j long")
    out = dedup.connected_components(empty)
    assert out.columns == ["doc", "cluster"]
    assert out.count() == 0
    assert [f.dataType.simpleString() for f in out.schema.fields] == [
        "bigint",
        "bigint",
    ]
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9), (9, 7)], "i long, j long"
    )
    got = sorted(map(tuple, dedup.connected_components(pairs).collect()))
    assert got == [(1, 1), (2, 1), (3, 1), (7, 7), (9, 7)]


def test_c4_word_count_regex_matches_split_form(spark):
    """ADVICE r10: the named pin for word_count_ok's regex rewrite.

    (a) On lines NOT ending in whitespace — the only lines the terminal-
        punctuation gate can pass — the regex form equals
        size(split(trim(l), '\\s+')) >= m for m in {2, 3, 4}.
    (b) The documented divergences are real: 'a b\\t' at m=3 and
        all-whitespace at m=2 differ standalone...
    (c) ...and are unreachable through c4_line_filter: the full line_ok
        conjunction (terminal punct first) agrees with the split-form
        conjunction on EVERY adversarial line.
    """
    lines = [
        "",
        " ",
        "\t",
        "\t\t ",
        "a",
        "a b",
        "a b c",
        "a b\t",
        "a b \t",
        "\ta b c",
        " \ta b c.",
        "a\tb\tc.",
        "a  b   c!",
        "word word word word?",
        "x" * 200 + ".",
        "a b c\r",
        "a b c.\r",
        "\r\r",
        "one two.",
        "one two three.",
        " leading space line.",
        "trailing space line. ",
    ]
    df = spark.createDataFrame([(i, l) for i, l in enumerate(lines)], "i long, l string")
    for m in (2, 3, 4):
        runs_m = F.col("l").rlike(r"^\s*+(\S++\s++){%d}\S" % (m - 1))
        phantom = F.col("l").rlike(r"^ *+[\s&&[^ ]]")
        runs_m1 = F.col("l").rlike(r"^\s*+(\S++\s++){%d}\S" % (m - 2))
        regex_form = runs_m | (phantom & runs_m1)
        split_form = F.size(F.split(F.trim(F.col("l")), r"\s+")) >= m
        ends_ws = F.col("l").rlike(r"\s$") | (F.length(F.col("l")) == 0)
        # (a) equality wherever the line does not end in whitespace
        bad = df.filter(~ends_ws).filter(regex_form != split_form).collect()
        assert bad == [], (m, bad)
    # (b) the two documented standalone divergences
    div = df.filter(F.col("l").isin("a b\t", "\t\t ")).select(
        "l",
        (F.size(F.split(F.trim(F.col("l")), r"\s+")) >= 3).alias("split3"),
        (F.col("l").rlike(r"^\s*+(\S++\s++){2}\S")
         | (F.col("l").rlike(r"^ *+[\s&&[^ ]]")
            & F.col("l").rlike(r"^\s*+(\S++\s++){1}\S"))).alias("regex3"),
        (F.size(F.split(F.trim(F.col("l")), r"\s+")) >= 2).alias("split2"),
        (F.col("l").rlike(r"^\s*+(\S++\s++){1}\S")
         | (F.col("l").rlike(r"^ *+[\s&&[^ ]]")
            & F.col("l").rlike(r"^\s*+(\S++\s++){0}\S"))).alias("regex2"),
    ).collect()
    by_l = {r["l"]: r for r in div}
    assert by_l["a b\t"]["split3"] and not by_l["a b\t"]["regex3"]
    assert by_l["\t\t "]["split2"] and not by_l["\t\t "]["regex2"]
    # (c) full-conjunction agreement: terminal punct gate makes the
    # divergences unreachable
    punct = (
        F.col("l").endswith(".") | F.col("l").endswith("!")
        | F.col("l").endswith("?") | F.col("l").endswith('"')
    )
    for m in (2, 3):
        runs_m = F.col("l").rlike(r"^\s*+(\S++\s++){%d}\S" % (m - 1))
        phantom = F.col("l").rlike(r"^ *+[\s&&[^ ]]")
        runs_m1 = F.col("l").rlike(r"^\s*+(\S++\s++){%d}\S" % (m - 2))
        regex_ok = punct & (runs_m | (phantom & runs_m1))
        split_ok = punct & (F.size(F.split(F.trim(F.col("l")), r"\s+")) >= m)
        assert df.filter(regex_ok != split_ok).collect() == []


def test_keep_best_inline_scores_match_joined_form(spark):
    """cluster_representatives(scores=None) over a passthrough-carrying
    dedup_clusters frame returns exactly the rows of the two-frame joined
    form — including unscored members (NULL quality) and singleton
    clusters."""
    from eth_indexer_spark.operators import dedup

    docs = spark.createDataFrame(
        [(1, 0.5), (2, 0.9), (3, None), (4, 0.2), (7, None), (9, 0.4)],
        "doc_id long, quality double",
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3), (7, 9)], "i long, j long")
    inline = dedup.cluster_representatives(
        dedup.dedup_clusters(docs, pairs, "doc_id", passthrough=("quality",)),
        None,
        "quality",
        id_col="doc",
    )
    joined = dedup.cluster_representatives(
        dedup.dedup_clusters(docs, pairs, "doc_id"),
        docs.select(F.col("doc_id").alias("doc"), "quality"),
        "quality",
        id_col="doc",
    )
    a = sorted(map(tuple, inline.collect()))
    b = sorted(map(tuple, joined.collect()))
    assert a == b
    # winners: cluster 1 -> doc 2 (0.9); cluster 7 -> doc 9 (0.4, doc 7
    # unscored); singleton 4 keeps itself
    by_cluster = {r[0]: r for r in a}
    assert by_cluster[1][1] == 2 and by_cluster[7][1] == 9 and by_cluster[4][1] == 4
