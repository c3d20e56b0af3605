"""Second-pass attribution: copair internals, AQE final-plan check,
persist-vs-recompute A/B for the v4 pipeline, partition-count sensitivity.

Usage: python scripts/profile_hot2.py [probe ...]
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


def med3(spark, label, mk, action=noop):
    action(mk())  # warm
    spark.catalog.clearCache()
    samples = []
    for _ in range(3):
        spark.sparkContext.setJobDescription(label)
        t0 = time.perf_counter()
        action(mk())
        samples.append(time.perf_counter() - t0)
        spark.catalog.clearCache()
    samples.sort()
    print(f"{label:55s} {samples[1]:7.3f}  [{samples[0]:.3f}, {samples[-1]:.3f}]", flush=True)
    return samples[1]


def docs(spark):
    from eth_indexer_spark.catalog import load_table

    return load_table(spark, SF_DIR, "documents").select("doc_id", "text")


def probe_copair(spark):
    from eth_indexer_spark.operators import dedup

    d = docs(spark)

    def inv():
        sh = (
            dedup._spread(d, "doc_id")
            .select(F.col("doc_id").alias("doc"), dedup.word_shingles("text", 3).alias("shingles"))
            .filter(F.size("shingles") > 0)
            .select("doc", F.transform("shingles", lambda s: F.xxhash64(s)).alias("hsh"))
        )
        return dedup.cap_hot_keys(sh.select("doc", F.explode("hsh").alias("s")), "s", 5)

    def grp():
        return (
            inv().groupBy("s").agg(F.collect_set("doc").alias("docs"))
            .filter(F.size("docs") >= 2)
        )

    def pairs():
        return (
            grp().select(F.explode("docs").alias("i"), "docs")
            .select("i", F.explode("docs").alias("j"))
            .filter(F.col("i") < F.col("j"))
            .groupBy("i", "j").agg(F.count(F.lit(1)).alias("inter"))
        )

    med3(spark, "copair/a inv (=cap output)", inv)
    med3(spark, "copair/b +collect_set group", grp)
    med3(spark, "copair/c +pair counts", pairs)
    med3(spark, "copair/d full capped (count action)",
         lambda: dedup.ngram_jaccard_pairs_capped(d, "text", "doc_id", k=3, threshold=0.5, max_df=5),
         action=lambda df: df.count())

    # cap via aggregate-count + join instead of window
    def cap_agg():
        sh = (
            dedup._spread(d, "doc_id")
            .select(F.col("doc_id").alias("doc"), dedup.word_shingles("text", 3).alias("shingles"))
            .filter(F.size("shingles") > 0)
            .select("doc", F.explode(F.transform("shingles", lambda s: F.xxhash64(s))).alias("s"))
        )
        keep = sh.groupBy("s").agg(F.count(F.lit(1)).alias("__df")).filter(
            (F.col("__df") <= 5) & (F.col("__df") >= 2))
        return sh.join(keep.select("s"), "s")

    med3(spark, "copair/e cap via agg+join (alt)", cap_agg)

    # single-pass: collect_set once, cap + pair from the same aggregation
    def one_pass():
        sh = (
            dedup._spread(d, "doc_id")
            .select(F.col("doc_id").alias("doc"), dedup.word_shingles("text", 3).alias("shingles"))
            .filter(F.size("shingles") > 0)
            .select("doc", F.explode(F.transform("shingles", lambda s: F.xxhash64(s))).alias("s"))
        )
        g = sh.groupBy("s").agg(F.collect_set("doc").alias("docs")).filter(
            (F.size("docs") >= 2) & (F.size("docs") <= 5))
        return (
            g.select(F.explode("docs").alias("i"), "docs")
            .select("i", F.explode("docs").alias("j"))
            .filter(F.col("i") < F.col("j"))
            .groupBy("i", "j").agg(F.count(F.lit(1)).alias("inter"))
        )

    med3(spark, "copair/f single-pass collect_set cap (alt)", one_pass)


def probe_finalplan(spark):
    from eth_indexer_spark.operators import dedup

    d = docs(spark)
    q = dedup.ngram_jaccard_pairs_capped(d, "text", "doc_id", k=3, threshold=0.5, max_df=5)
    noop(q)
    print(q._sc._jvm.PythonSQLUtils.explainString(q._jdf.queryExecution(), "formatted")[:4000])


def probe_v4persist(spark):
    from eth_indexer_spark.plans import extensions as ext

    med3(spark, "v4/with persist (current, count)",
         lambda: ext._v4_stage_frames(spark, SF_DIR)["decontaminated"],
         action=lambda df: df.count())

    # same frames but without the persist of `kept`
    from eth_indexer_spark.operators import decontam, quality

    def v4_nopersist():
        d = docs(spark)
        cleaned = quality.c4_line_filter(
            ext._synthesized_lines(d), "text", "doc_id"
        ).withColumnRenamed("clean_text", "text")
        g = quality.gopher_rules(
            cleaned, "text", "doc_id",
            min_words=20, required_stopwords=("the", "a"), min_required_stopwords=1,
            passthrough=("text", "n_lines_kept"),
        )
        kept = g.where(F.col("keep")).select("doc_id", "text", "n_lines_kept", "n_words")
        norm = F.replace(
            F.replace(F.col("text"), F.lit("."), F.lit("")), F.lit("\n"), F.lit(" ")
        ).alias("text")
        bench = kept.filter(F.col("doc_id") % 97 == 0).select("doc_id", norm)
        corpus = kept.filter(F.col("doc_id") % 97 != 0)
        rep = decontam.contamination_report(
            corpus.select("doc_id", norm), bench, "text", "doc_id", k=3
        )
        return corpus.join(
            rep.where(F.col("overlap_frac") <= 0.02).select("doc_id", "n_grams", "overlap_frac"),
            "doc_id",
        ).select("doc_id", "n_lines_kept", "n_words", "n_grams", "overlap_frac")

    med3(spark, "v4/no persist (count)", v4_nopersist, action=lambda df: df.count())

    # carry metrics through the aggregation: no final join, no third read
    def v4_carry():
        d = docs(spark)
        cleaned = quality.c4_line_filter(
            ext._synthesized_lines(d), "text", "doc_id"
        ).withColumnRenamed("clean_text", "text")
        g = quality.gopher_rules(
            cleaned, "text", "doc_id",
            min_words=20, required_stopwords=("the", "a"), min_required_stopwords=1,
            passthrough=("text", "n_lines_kept"),
        )
        kept = g.where(F.col("keep")).select("doc_id", "text", "n_lines_kept", "n_words")
        norm = F.replace(
            F.replace(F.col("text"), F.lit("."), F.lit("")), F.lit("\n"), F.lit(" ")
        ).alias("text")
        bench = kept.filter(F.col("doc_id") % 97 == 0).select("doc_id", norm)
        corpus = kept.filter(F.col("doc_id") % 97 != 0)
        grams = decontam.benchmark_ngrams(bench, "text", 3).withColumn("__bench", F.lit(True))
        grams = F.broadcast(grams)
        from eth_indexer_spark.operators.dedup import word_shingles

        doc_grams = corpus.select(
            "doc_id", "n_lines_kept", "n_words",
            F.explode_outer(word_shingles(norm, 3)).alias("gram"),
        )
        per = (
            doc_grams.join(grams, "gram", "left")
            .groupBy("doc_id", "n_lines_kept", "n_words")
            .agg(
                F.count("gram").alias("__n"),
                F.sum(F.when(F.col("__bench"), 1).otherwise(0)).cast("long").alias("__hit"),
            )
        )
        n_grams = F.col("__n")
        n_hits = F.coalesce("__hit", F.lit(0)).cast("long")
        overlap = F.when(n_grams > 0, F.round(n_hits.cast("double") / n_grams, 4)).otherwise(F.lit(0.0))
        return (
            per.select(
                "doc_id", "n_lines_kept", "n_words",
                n_grams.alias("n_grams"), overlap.alias("overlap_frac"),
            )
            .filter(F.col("overlap_frac") <= 0.02)
        )

    med3(spark, "v4/carry-through, no final join (count)", v4_carry, action=lambda df: df.count())


def probe_parts(spark):
    from eth_indexer_spark.operators import dedup

    d = docs(spark)
    for n in (8, 32):
        spark.conf.set("spark.sql.shuffle.partitions", str(n))
        med3(spark, f"parts/{n} capped pairs (count)",
             lambda: dedup.ngram_jaccard_pairs_capped(d, "text", "doc_id", k=3, threshold=0.5, max_df=5),
             action=lambda df: df.count())
    spark.conf.set("spark.sql.shuffle.partitions", str(CPUS))


PROBES = {
    "copair": probe_copair,
    "finalplan": probe_finalplan,
    "v4persist": probe_v4persist,
    "parts": probe_parts,
}


def main() -> None:
    from eth_indexer_spark.session import get_spark

    spark = get_spark("profile-hot2", cpus=CPUS)
    for p in sys.argv[1:] or list(PROBES):
        print(f"--- {p} ---", flush=True)
        PROBES[p](spark)
    spark.stop()


if __name__ == "__main__":
    main()
