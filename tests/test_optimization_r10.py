"""Round-10 optimization pins: each test locks the equivalence argument of
one internal rewrite, so the cheaper form cannot silently drift from the
semantics the oracle checks.

- hashed_word_shingles ≡ xxhash64 ∘ word_shingles (the Jaccard-family kernel)
- _substring_grams digest: gram-text equality ⟺ struct-digest equality
- minhash banding: long-tuple bucket ids ≡ the former stringified-slice ids
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
