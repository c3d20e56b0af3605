"""Repetition-based quality metrics for training-data curation
(Gopher/MassiveText-style filters, Rae et al. 2021 §A.1.1): heavily
repetitious documents — boilerplate, keyword stuffing, templated spam — are
the single highest-yield removal class after exact dedup.

Two complementary metrics per document:

- **duplicate n-gram fraction** — ``1 − distinct_ngrams / total_ngrams``:
  how much of the document is n-gram-level self-repetition. A pure Column
  expression (split → slide → array_distinct), no shuffle, codegen'd.
- **top n-gram fraction** — ``max_count / total``: how much a SINGLE
  repeated n-gram dominates. Needs a per-(doc, gram) count, so it is a
  DataFrame op: explode → two map-side-combinable groupBys keyed on the
  doc id. Both shuffles move one row per (doc, distinct-gram) — skinny,
  and partitioned by the doc id so a 100 TB corpus spreads evenly (doc ids
  are unique; no hot keys by construction).

Both are ratios of small integers rounded to 4 (the repo-wide oracle
determinism convention — Spark and DuckDB both round positive doubles
half-away-from-zero), so the registered query is fully oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_ngrams(col, n: int = 2) -> Column:
    """NON-distinct word n-grams (array<string>) — unlike
    :func:`~eth_indexer_spark.operators.dedup.word_shingles`, repetition
    metrics need every occurrence. Documents shorter than n words yield an
    empty array."""
    c = F.col(col) if isinstance(col, str) else col
    words = F.split(c, " ")
    cnt = F.size(words)
    gram_at = lambda i: F.concat_ws(" ", F.slice(words, i, n))  # noqa: E731
    idx = F.sequence(F.lit(1), cnt - (n - 1))
    return F.when(cnt >= n, F.transform(idx, gram_at)).otherwise(
        F.array().cast("array<string>")
    )


def dup_ngram_fraction(col, n: int = 2) -> Column:
    """1 − distinct/total n-grams, rounded to 4; 0.0 for docs with < n words."""
    g = word_ngrams(col, n)
    total = F.size(g)
    return F.when(
        total > 0, F.round(1.0 - F.size(F.array_distinct(g)) / total, 4)
    ).otherwise(F.lit(0.0))


def repetition_stats(
    df: DataFrame, text_col: str, id_col: str, n: int = 2
) -> DataFrame:
    """Per-document repetition metrics: ``(id, dup_ngram_frac,
    top_ngram_frac)`` for word n-grams (default bigrams).

    ``top_ngram_frac`` = occurrences of the most frequent n-gram / total
    n-grams. Documents with < n words are kept with both metrics 0.0 (they
    carry no repetition signal; dropping them here would silently shrink
    the corpus before the length filter gets to decide)."""
    grams = df.select(F.col(id_col), word_ngrams(text_col, n).alias("g"))
    per_gram = (
        grams.select(F.col(id_col), F.explode("g").alias("gram"))
        .groupBy(id_col, "gram")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    top = per_gram.groupBy(id_col).agg(
        F.max("c").alias("top_cnt"), F.sum("c").alias("total")
    )
    dup = df.select(
        F.col(id_col), dup_ngram_fraction(text_col, n).alias("dup_ngram_frac")
    )
    return (
        dup.join(top, id_col, "left")
        .select(
            F.col(id_col),
            F.col("dup_ngram_frac"),
            F.when(
                F.col("total").isNotNull(),
                F.round(F.col("top_cnt") / F.col("total"), 4),
            )
            .otherwise(F.lit(0.0))
            .alias("top_ngram_frac"),
        )
    )
