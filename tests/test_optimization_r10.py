"""Round-10 optimization pins: each test locks the equivalence argument of
one internal rewrite, so the cheaper form cannot silently drift from the
semantics the oracle checks.

- hashed_word_shingles ≡ xxhash64 ∘ word_shingles (the Jaccard-family kernel)
- _substring_grams digest: gram-text equality ⟺ struct-digest equality
- minhash banding: long-tuple bucket ids ≡ the former stringified-slice ids
- _merged_dup_intervals: merged-interval coverage ≡ per-start coverage
"""
from __future__ import annotations

import random

from pyspark.sql import functions as F

from eth_indexer_spark.operators import dedup

WORDS = ("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta")


def _corpus(n_docs: int, seed: int) -> list[tuple[int, str]]:
    rng = random.Random(seed)
    return [
        (i, " ".join(rng.choice(WORDS) for _ in range(rng.randint(0, 12))))
        for i in range(n_docs)
    ]


def test_hashed_word_shingles_matches_string_hash_family(spark):
    """Same distinct-shingle cardinality per doc, and the same shared-shingle
    relation between docs, as hashing the string shingles — the condition
    under which every Jaccard-family consumer (sizes, intersections, pairs)
    is unchanged by the rewrite."""
    df = spark.createDataFrame(_corpus(40, 7), "doc_id long, text string")
    both = df.select(
        "doc_id",
        dedup.hashed_word_shingles("text", 3).alias("h"),
        F.transform(dedup.word_shingles("text", 3), lambda s: F.xxhash64(s)).alias("s"),
    ).collect()
    by_doc_h, by_doc_s = {}, {}
    for r in both:
        assert len(r["h"]) == len(r["s"]), r["doc_id"]
        by_doc_h[r["doc_id"]] = set(r["h"])
        by_doc_s[r["doc_id"]] = set(r["s"])
    ids = sorted(by_doc_h)
    for i in ids:
        for j in ids:
            if i >= j:
                continue
            # intersection sizes drive the Jaccard — they must agree pairwise
            assert len(by_doc_h[i] & by_doc_h[j]) == len(by_doc_s[i] & by_doc_s[j])


def test_substring_gram_digest_equality_is_gram_equality(spark):
    """The struct<h1,h2> digest equals another digest iff the gram TEXTS are
    equal (the md5-form contract): same (id, spos) stream, and digest
    equality classes match gram-string equality classes."""
    df = spark.createDataFrame(
        [(1, "a b c d a b c d"), (2, "x y a b c d q"), (3, "p q r")],
        "doc_id long, text string",
    )
    L = 4
    got = dedup._substring_grams(df, "text", "doc_id", L).collect()
    # recompute gram strings in python
    texts = {1: "a b c d a b c d", 2: "x y a b c d q", 3: "p q r"}
    expect = {}
    for i, t in texts.items():
        w = t.split(" ")
        for s in range(len(w) - L + 1):
            expect[(i, s)] = " ".join(w[s : s + L])
    assert {(r["doc_id"], r["__spos"]) for r in got} == set(expect)
    by_digest: dict = {}
    for r in got:
        by_digest.setdefault((r["__gdigest"]["h1"], r["__gdigest"]["h2"]), set()).add(
            expect[(r["doc_id"], r["__spos"])]
        )
    # every digest maps to exactly one gram text (no collisions on the
    # fixture), and equal gram texts share one digest
    assert all(len(v) == 1 for v in by_digest.values())
    assert len(by_digest) == len(set(expect.values()))


def test_minhash_bucket_ids_match_stringified_slice_form(spark):
    """The multi-arg-xxhash64 banding must bucket docs exactly as the former
    concat_ws(slice) form: identical band slices ⟺ identical bucket ids, on
    a fixture with planted exact duplicates (equal slices) and distinct docs
    (unequal slices)."""
    rows = _corpus(20, 5)
    rows += [(100 + i, t) for i, t in rows[:5]]  # planted exact dups
    df = spark.createDataFrame(rows, "doc_id long, text string")
    num_hashes, bands = 32, 8
    rpb = num_hashes // bands
    old_exprs = ", ".join(
        f"xxhash64({band}, xxhash64(concat_ws(',',"
        f" slice(sig, {band * rpb + 1}, {rpb}))))"
        for band in range(bands)
    )
    new = dedup.minhash_index(df, "text", "doc_id", 3, num_hashes, bands)
    old = (
        new.drop("buckets")
        .select(
            "doc",
            dedup.minhash_signature("hsh", num_hashes).alias("sig"),
        )
        .select("doc", F.expr(f"array({old_exprs})").alias("buckets"))
    )
    new_b = {r["doc"]: r["buckets"] for r in new.select("doc", "buckets").collect()}
    old_b = {r["doc"]: r["buckets"] for r in old.collect()}
    # bucket-id VALUES differ between families; the EQUALITY RELATION — which
    # (doc, band) pairs collide — must be identical, since that is all LSH
    # consumes
    def relation(b: dict) -> set:
        pairs = set()
        docs = sorted(b)
        for band in range(bands):
            for i in docs:
                for j in docs:
                    if i < j and b[i][band] == b[j][band]:
                        pairs.add((i, j, band))
        return pairs

    assert relation(new_b) == relation(old_b)
    # planted exact dups must collide in EVERY band under both forms
    for i in range(5):
        orig, dup = rows[i][0], 100 + rows[i][0]
        if len(rows[i][1].split(" ")) >= 3 and rows[i][1]:
            if orig in new_b and dup in new_b:
                assert new_b[orig] == new_b[dup]


def test_merged_dup_intervals_cover_exactly_the_per_start_union(spark):
    """The excision test now runs over _merged_dup_intervals; a token must be
    covered by some merged [lo, hi) iff it is covered by some raw [s, s+L) —
    checked against a Python model on randomized start sets spanning the
    interesting shapes: empty, single, overlapping chains, touching spans
    (s2 == s1 + L merges — coverage is contiguous), gapped chains, repeats,
    and unsorted arrival order (collect_list order is nondeterministic)."""
    L = 5
    rng = random.Random(11)
    cases = [[], [0], [3], [0, 2, 4], [0, 5], [0, 6], [7, 0, 3, 20, 22], [4, 4, 4]]
    for _ in range(40):
        n = rng.randint(1, 12)
        starts = [rng.randint(0, 30) for _ in range(n)]
        rng.shuffle(starts)
        cases.append(starts)
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(cases)], "case_id long, starts array<int>"
    )
    got = {
        r["case_id"]: [(v["lo"], v["hi"]) for v in r["ivl"]]
        for r in df.select(
            "case_id", dedup._merged_dup_intervals(F.col("starts"), L).alias("ivl")
        ).collect()
    }
    for cid, starts in enumerate(cases):
        ivl = got[cid]
        # disjoint, sorted, properly ordered
        assert all(lo < hi for lo, hi in ivl), (cid, ivl)
        assert all(ivl[k][1] < ivl[k + 1][0] for k in range(len(ivl) - 1)), (cid, ivl)
        covered_raw = {i for s in starts for i in range(s, s + L)}
        covered_merged = {i for lo, hi in ivl for i in range(lo, hi)}
        assert covered_merged == covered_raw, (cid, starts, ivl)


def test_excision_merged_branch_matches_raw_semantics_on_dup_heavy_doc(spark):
    """Documents above _MERGE_GATE_STARTS duplicated-gram starts take the
    merged-interval branch of _excise_covered_spans; their output must equal
    the raw per-start coverage model. The fixture plants one dup-heavy doc
    (every gram duplicated → starts ≫ gate), one lightly-duplicated doc
    (raw branch), and one clean doc."""
    L = 3
    # heavy: a 2-word motif tiled ~60 times → every L-gram occurs many times
    heavy = " ".join(["rep tok"] * 60)
    # light: unique filler with ONE duplicated L-gram planted twice
    filler = [f"w{i}" for i in range(40)]
    light = " ".join(filler[:10] + ["a", "b", "c"] + filler[10:30] + ["a", "b", "c"] + filler[30:])
    clean = " ".join(f"u{i}" for i in range(20))
    docs = {1: heavy, 2: light, 3: clean}
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_tokens_kept"])
        for r in dedup.substring_dedup(
            df, "text", "doc_id", min_len=L, min_count=2
        ).collect()
    }

    # python model: corpus-wide gram counts, then raw per-start coverage
    from collections import Counter

    counts: Counter = Counter()
    grams = {}
    for i, t in docs.items():
        w = t.split(" ")
        grams[i] = [tuple(w[s : s + L]) for s in range(len(w) - L + 1)]
        counts.update(grams[i])
    expect = {}
    for i, t in docs.items():
        w = t.split(" ")
        covered = set()
        for s, g in enumerate(grams[i]):
            if counts[g] >= 2:
                covered.update(range(s, s + L))
        kept = [tok for j, tok in enumerate(w) if j not in covered]
        if kept:
            expect[i] = (" ".join(kept), len(kept))
    # the heavy doc must actually exercise the merged branch
    n_dup_starts = sum(1 for g in grams[1] if counts[g] >= 2)
    assert n_dup_starts > dedup._MERGE_GATE_STARTS
    assert got == expect


def test_files_partition_estimate_replays_spark_split_math(spark, tmp_path):
    """_spread's metadata-only parallelism probe must agree exactly with the
    physical scan it predicts (df.rdd.getNumPartitions()) on file-backed
    frames — one tiny file, many small files, and a post-filter projection —
    and decline (None) on frames with no file source so the caller falls
    back to the exact probe."""
    n_target = int(spark.conf.get("spark.sql.shuffle.partitions"))

    one = str(tmp_path / "one")
    spark.range(0, 100).selectExpr(
        "id as doc_id", "repeat('w ', 8) as text"
    ).coalesce(1).write.parquet(one)
    many = str(tmp_path / "many")
    spark.range(0, 2000).selectExpr(
        "id as doc_id", "repeat('w ', 40) as text"
    ).repartition(40).write.parquet(many)

    for path in (one, many):
        df = spark.read.parquet(path)
        est = dedup._files_partition_estimate(df, n_target)
        assert est == df.rdd.getNumPartitions(), path
        # survives select/filter (the shapes _spread actually receives)
        shaped = df.select("doc_id", "text").filter(F.col("doc_id") >= 0)
        est2 = dedup._files_partition_estimate(shaped, n_target)
        assert est2 == shaped.rdd.getNumPartitions(), path

    mem = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    assert dedup._files_partition_estimate(mem, n_target) is None
    # _spread still repartitions underparallelized scans to the target
    under = spark.read.parquet(one)
    assert dedup._spread(under, "doc_id").rdd.getNumPartitions() == n_target


def test_curation_v4_gopher_reads_cleaned_text_through_cache_barrier(spark):
    """The C4 → Gopher cache barrier (r10 kept change #6): building the v4
    stage frames pools the cleaned corpus, and the Gopher stage's optimized
    plan consumes it through an InMemoryRelation — so the battery's metric
    expressions and the pushed-down keep-filter evaluate over MATERIALIZED
    clean text. Without the barrier, predicate pushdown substitutes the
    whole synthesized-lines + C4 higher-order expression into the scan-level
    filter ~30x per raw row (the r10 before-plan)."""
    from eth_indexer_spark.operators._persist import pooled_sites
    from eth_indexer_spark.plans.extensions import _v4_stage_frames

    frames = _v4_stage_frames(spark, "/root/testdata/sf0.001")
    assert "extensions.curation_v4.cleaned" in pooled_sites()
    assert "extensions.curation_v4.kept" in pooled_sites()
    gopher_plan = frames["gopher"]._jdf.queryExecution().optimizedPlan().toString()
    assert "InMemoryRelation" in gopher_plan
    # the barrier stops expression re-substitution: the synthesized-lines
    # subtree (sequence(0, size(...), 4)) appears in the CACHED lineage, not
    # in the consumer plan above the cache boundary
    above_cache = gopher_plan.split("InMemoryRelation", 1)[0]
    assert "sequence(0" not in above_cache


def test_antijoin_cap_matches_window_cap(spark):
    """The capped-jaccard inverted index drops EXACTLY the rows the generic
    window cap drops (r10 kept change #7): same surviving (doc, key) set on
    a corpus with a ubiquitous hot shingle, so sizes, intersections, and the
    final Jaccard pairs are unchanged by the anti-join form."""
    rows = [(i, f"common boilerplate header unique {i} tail {i * 3}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    inv = df.select(
        F.col("doc_id").alias("doc"),
        F.explode(dedup.hashed_word_shingles("text", 3)).alias("s"),
    )
    want = {(r["doc"], r["s"]) for r in dedup.cap_hot_keys(inv, "s", 5).collect()}
    hot = (
        inv.groupBy("s")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") > 5)
        .select("s")
    )
    got = {(r["doc"], r["s"]) for r in inv.join(hot, "s", "left_anti").collect()}
    assert got == want and len(got) > 0


def test_capped_jaccard_plan_caps_without_window(spark):
    """ngram_jaccard_pairs_capped's plan carries the anti-join cap — a
    LeftAnti join and NO Window/Sort in the capping lineage — so the cached
    index is built without the full-index sort the window form pays."""
    df = spark.createDataFrame(
        [(i, f"alpha beta gamma delta {i}") for i in range(20)],
        "doc_id long, text string",
    )
    pairs = dedup.ngram_jaccard_pairs_capped(df, "text", "doc_id", k=3, max_df=5)
    plan = pairs._jdf.queryExecution().optimizedPlan().toString()
    assert "LeftAnti" in plan
    assert "Window" not in plan
    from eth_indexer_spark.operators._persist import release_persisted

    release_persisted()


def test_gopher_presplit_columns_match_inline_splits(spark):
    """gopher_rules given caller-materialized words/lines/word-cores arrays
    (the r10 Session-3 kept change: the v4 battery reads pre-split cache
    columns instead of re-running each split per metric reference) returns
    EXACTLY the rows of the inline-split form — on a corpus exercising the
    edge cases the splits encode: multi-space runs, leading/trailing
    whitespace, punctuation-wrapped stopwords, bullet/ellipsis lines,
    empty and whitespace-only documents."""
    from eth_indexer_spark.operators import quality

    docs = [
        (0, "The quick brown fox. Jumps over the lazy dog."),
        (1, "  the   spaced    out   doc with,, odd punctuation 'the' !!  "),
        (2, "- bullet one\n- bullet two\nnormal line with the word"),
        (3, "ends with ellipsis...\nand another…\nplain the line"),
        (4, ""),
        (5, "   "),
        (6, "### symbols ### everywhere ### the ratio # climbs"),
        (7, "ONE"),
        (8, '"The" (a) [the] {a} the.\nsecond the line here with words'),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    pre = df.select(
        "doc_id",
        "text",
        F.split(F.trim(F.col("text")), r"\s+").alias("__w"),
        F.split(F.col("text"), "\n").alias("__l"),
        F.transform(
            F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
            lambda w: F.regexp_replace(w, r"^[^0-9a-z]+|[^0-9a-z]+$", ""),
        ).alias("__c"),
    )
    plain = quality.gopher_rules(df, "text", "doc_id", min_words=3).collect()
    split_form = quality.gopher_rules(
        pre, "text", "doc_id", min_words=3,
        words_col="__w", lines_col="__l", word_cores_col="__c",
    ).collect()
    assert sorted(map(tuple, plain)) == sorted(map(tuple, split_form))
    assert len(plain) == len(docs)


def test_curation_v4_battery_reads_presplit_arrays(spark):
    """The v4 Gopher stage's optimized plan performs NO split above the
    cleaned-cache boundary: every split the battery needs (words, lines,
    word cores) is materialized INTO the cache, so the metric expressions
    and the pushed-down keep-filter read O(1) cached arrays."""
    from eth_indexer_spark.plans.extensions import _v4_stage_frames

    frames = _v4_stage_frames(spark, "/root/testdata/sf0.001")
    gopher_plan = frames["gopher"]._jdf.queryExecution().optimizedPlan().toString()
    above_cache = gopher_plan.split("InMemoryRelation", 1)[0]
    assert "split(" not in above_cache
    from eth_indexer_spark.operators._persist import release_persisted

    release_persisted()


def test_contamination_report_hashed_grams_match_string_grams(spark):
    """contamination_report grams on 64-bit shingle hashes (r10 Session-3):
    per-document totals, hit counts, overlap fractions and flags equal the
    string-gram form — on a corpus with short docs (no grams), full
    benchmark copies, partial overlap, and repeated shingles."""
    from eth_indexer_spark.operators import decontam

    docs = [
        (0, "alpha beta gamma delta epsilon"),          # partial overlap
        (1, "zeta eta theta iota kappa"),                # no overlap
        (2, "alpha beta gamma alpha beta gamma delta"),  # repeats
        (3, "one two"),                                  # shorter than k
        (4, ""),                                         # empty
        (5, "alpha beta gamma delta epsilon"),           # exact bench copy
    ]
    bench = [(100, "alpha beta gamma delta epsilon"), (101, "mu nu xi omicron pi")]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    b = spark.createDataFrame(bench, "doc_id long, text string")
    got = decontam.contamination_report(d, b, "text", "doc_id", k=3).collect()
    # string-gram reference: the pre-rewrite plan, inlined
    grams = (
        b.select(F.explode(dedup.word_shingles("text", 3)).alias("gram"))
        .distinct()
        .withColumn("__bench", F.lit(True))
    )
    doc_grams = d.select(
        "doc_id", F.explode_outer(dedup.word_shingles("text", 3)).alias("gram")
    )
    per = (
        doc_grams.join(F.broadcast(grams), "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count("gram").alias("n"),
            F.sum(F.when(F.col("__bench"), 1).otherwise(0)).cast("long").alias("h"),
        )
    )
    want = per.select(
        "doc_id",
        F.col("n").alias("n_grams"),
        F.coalesce("h", F.lit(0)).cast("long").alias("n_hit_grams"),
        F.when(F.col("n") > 0, F.round(F.coalesce("h", F.lit(0)).cast("double") / F.col("n"), 4))
        .otherwise(F.lit(0.0))
        .alias("overlap_frac"),
        (F.coalesce("h", F.lit(0)) > 0).alias("contaminated"),
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    assert any(r["contaminated"] for r in got) and any(not r["contaminated"] for r in got)
    # the opt-out path (hashed_grams=False, kept by the v4 composition)
    # is the string form itself
    got_str = decontam.contamination_report(
        d, b, "text", "doc_id", k=3, hashed_grams=False
    ).collect()
    assert sorted(map(tuple, got_str)) == sorted(map(tuple, want))
