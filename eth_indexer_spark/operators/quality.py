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


def unigram_lm_score(
    df: DataFrame,
    text_col: str,
    id_col: str,
    ref: DataFrame | None = None,
    bits: bool = False,
    ref_text_col: str | None = None,
) -> DataFrame:
    """Language-model document scoring (the CCNet quality signal, Wenzek et
    al. 2020, with the external KenLM model replaced by unigram statistics
    of a reference corpus — the strongest LM expressible without model
    files): score each document by how ordinary its tokens are under
    ``ref`` (default: the corpus itself). Documents made of rare/garbled
    tokens score low; fluent common-vocabulary text scores high — the
    standard head/middle/tail quality split.

    Returns ``(id, n_tokens, n_hapax, n_oov, avg_token_df)`` where
    ``n_hapax`` counts tokens occurring exactly once in ``ref``, ``n_oov``
    counts tokens absent from ``ref`` (always 0 when ``ref`` is the corpus
    itself), and ``avg_token_df`` is the mean reference occurrence count of
    the document's tokens (rounded to 4; OOV counts as 0). All outputs are
    exact-integer aggregates plus ONE final per-row division — no
    aggregated floating point — so the registered query is fully
    oracle-checked despite being a statistic over the whole corpus.

    ``bits=True`` adds ``bits_per_token`` = mean −log2(cnt/total), the
    conventional surprisal form (OOV smoothed to count 1). It averages
    per-token doubles, so it is deterministic only to ~1 ulp across
    engines/partitionings — excluded from the oracle-checked output.

    100 TB shape: one explode of (id, token), a map-side-combined groupBy
    on the token for reference counts (vocabulary-sized — Zipf keeps the
    distinct count millions, not trillions), one join of the token stream
    to the counts (unhinted: AQE broadcasts a small vocabulary, shuffles a
    pathological one), and a groupBy(id). No UDF, no driver-side state.

    ``ref_text_col`` names the reference corpus's text column when it
    differs from ``text_col`` (defaults to the same name)."""
    toks = df.select(F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok"))
    ref_toks = (
        toks
        if ref is None
        else ref.select(
            F.explode(F.split(F.col(ref_text_col or text_col), " ")).alias("tok")
        )
    )
    counts = ref_toks.groupBy("tok").agg(F.count(F.lit(1)).alias("__cnt"))
    joined = toks.join(counts, "tok", "left")
    aggs = [
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("__cnt") == 1, 1).otherwise(0)).cast("long").alias("n_hapax"),
        F.sum(F.when(F.col("__cnt").isNull(), 1).otherwise(0)).cast("long").alias("n_oov"),
        F.round(
            F.sum(F.coalesce("__cnt", F.lit(0))).cast("double") / F.count(F.lit(1)), 4
        ).alias("avg_token_df"),
    ]
    if bits:
        total = counts.agg(F.sum("__cnt").alias("__total"))
        joined = joined.crossJoin(F.broadcast(total))
        aggs.append(
            F.round(
                F.avg(-F.log2(F.coalesce("__cnt", F.lit(1)) / F.col("__total"))), 4
            ).alias("bits_per_token")
        )
    return joined.groupBy(id_col).agg(*aggs)


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
