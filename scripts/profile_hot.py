"""Stage-level attribution for the bench's heavy operator families.

Times progressive prefixes of each hot pipeline with the noop sink
(guide §1.4) so the expensive stage is identified by measurement, not
guesswork. Each probe is median-of-3 with cache cleared between reps.

Usage: python scripts/profile_hot.py [family ...]
Families: jaccard minhash curation substring
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", 32))

from pyspark.sql import functions as F  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def med3(spark, label, mk):
    mk_df = mk()
    noop(mk_df)  # warm: codegen + JIT
    spark.catalog.clearCache()
    samples = []
    for _ in range(3):
        spark.sparkContext.setJobDescription(label)
        t0 = time.perf_counter()
        noop(mk())
        samples.append(time.perf_counter() - t0)
        spark.catalog.clearCache()
    samples.sort()
    print(f"{label:55s} {samples[1]:7.3f}  [{samples[0]:.3f}, {samples[-1]:.3f}]", flush=True)
    return samples[1]


def docs(spark):
    from eth_indexer_spark.catalog import load_table

    return load_table(spark, SF_DIR, "documents").select("doc_id", "text")


def fam_jaccard(spark):
    from eth_indexer_spark.operators import dedup

    d = docs(spark)

    def sh():
        return (
            dedup._spread(d, "doc_id")
            .select(F.col("doc_id").alias("doc"), dedup.word_shingles("text", 3).alias("shingles"))
            .filter(F.size("shingles") > 0)
            .select("doc", F.transform("shingles", lambda s: F.xxhash64(s)).alias("hsh"))
        )

    med3(spark, "jaccard/0 scan only", lambda: d)
    med3(spark, "jaccard/1 split only", lambda: d.select("doc_id", F.split("text", " ").alias("w")))
    med3(spark, "jaccard/2 shingles(str, no hash)", lambda: (
        dedup._spread(d, "doc_id").select(F.col("doc_id").alias("doc"),
                                          dedup.word_shingles("text", 3).alias("shingles"))))
    med3(spark, "jaccard/3 shingles+xxhash64", sh)
    med3(spark, "jaccard/4 +explode", lambda: sh().select("doc", F.explode("hsh").alias("s")))
    med3(spark, "jaccard/5 +cap_hot_keys(window)", lambda: dedup.cap_hot_keys(
        sh().select("doc", F.explode("hsh").alias("s")), "s", 5))
    med3(spark, "jaccard/6 full capped pairs", lambda: dedup.ngram_jaccard_pairs_capped(
        d, "text", "doc_id", k=3, threshold=0.5, max_df=5))


def fam_minhash(spark):
    from eth_indexer_spark.operators import dedup

    d = docs(spark)
    med3(spark, "minhash/0 full", lambda: dedup.minhash_lsh_pairs(
        d, "text", "doc_id", k=3, num_hashes=32, bands=8, threshold=0.5, max_bucket=5000))

    def sigs():
        sh = (
            dedup._spread(d, "doc_id")
            .select(F.col("doc_id").alias("doc"), dedup.word_shingles("text", 3).alias("shingles"))
            .filter(F.size("shingles") > 0)
            .select("doc", F.transform("shingles", lambda s: F.xxhash64(s)).alias("hsh"))
        )
        return sh.select("doc", dedup.minhash_signature(F.col("hsh"), 32).alias("sig"))

    med3(spark, "minhash/1 signatures only", sigs)


def fam_curation(spark):
    from eth_indexer_spark.plans import extensions as ext

    med3(spark, "curation/0 synthesized_lines", lambda: ext._synthesized_lines(docs(spark)))

    def cleaned():
        from eth_indexer_spark.operators import quality

        return quality.c4_line_filter(
            ext._synthesized_lines(docs(spark)), "text", "doc_id"
        ).withColumnRenamed("clean_text", "text")

    med3(spark, "curation/1 +c4_line_filter", cleaned)

    def gophered():
        from eth_indexer_spark.operators import quality

        return quality.gopher_rules(
            cleaned(), "text", "doc_id",
            min_words=20, required_stopwords=("the", "a"), min_required_stopwords=1,
            passthrough=("text", "n_lines_kept"),
        )

    med3(spark, "curation/2 +gopher_rules", gophered)
    med3(spark, "curation/3 full v4", lambda: ext._v4_stage_frames(spark, SF_DIR)["decontaminated"])


def fam_substring(spark):
    from eth_indexer_spark.operators import dedup

    d = docs(spark)
    med3(spark, "substring/0 full", lambda: dedup.substring_dedup(d, "text", "doc_id", min_len=8))
    med3(spark, "substring/1 grams only", lambda: dedup._substring_grams(d, "text", "doc_id", 8))


FAMILIES = {
    "jaccard": fam_jaccard,
    "minhash": fam_minhash,
    "curation": fam_curation,
    "substring": fam_substring,
}


def main() -> None:
    from eth_indexer_spark.session import get_spark

    spark = get_spark("profile-hot", cpus=CPUS)
    picks = sys.argv[1:] or list(FAMILIES)
    for p in picks:
        print(f"--- {p} ---", flush=True)
        FAMILIES[p](spark)
    spark.stop()


if __name__ == "__main__":
    main()
