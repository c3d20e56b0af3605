"""Benchmark decontamination: drop (or flag) training documents that share
n-grams with an evaluation/benchmark set.

The standard training-data hygiene step (e.g. GPT-3 App. C / PaLM-style
13-gram overlap): a document is *contaminated* when any of its k-word
shingles also appears in the benchmark corpus. Production pipelines use
k ≈ 13; the registered test query uses a smaller k because the synthetic
corpus has short vocabulary-limited documents.

Scale shape (100 TB corpus, MB-scale benchmark):

- The benchmark n-gram set is tiny (eval suites are thousands of documents)
  → it is DISTINCT-ed and **broadcast**, so the corpus side never shuffles:
  contamination detection is a map-only scan (explode shingles → broadcast
  LeftSemi), and only skinny ``(id)`` rows of the *contaminated* minority
  are aggregated afterwards.
- For a benchmark too large to broadcast, pass ``broadcast_bench=False``
  and the semi-join falls back to a hash shuffle on the gram — still one
  shuffle of (gram, id), never a cross product.

Shingling reuses the dedup family's kernels: the binary
:func:`contaminated_ids`/:func:`decontaminate` path grams on
:func:`eth_indexer_spark.operators.dedup.word_shingles` (distinct k-word
shingles, whitespace tokens — bit-identical to the dedup family and
reproducible in ANSI SQL; the registered queries are fully oracle-checked),
while :func:`contamination_report` defaults to
:func:`~eth_indexer_spark.operators.dedup.hashed_word_shingles` (its output
is counts only, so gram text never needs to materialize — see the function
docstring for the measured rationale and the opt-out).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from eth_indexer_spark.operators.dedup import hashed_word_shingles, word_shingles


def benchmark_ngrams(bench: DataFrame, text_col: str, k: int = 13) -> DataFrame:
    """The distinct k-gram set of the benchmark corpus: one ``gram`` column."""
    return (
        bench.select(F.explode(word_shingles(text_col, k)).alias("gram"))
        .distinct()
    )


def contaminated_ids(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 13,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Ids of documents sharing ≥ 1 k-gram with the benchmark set.

    LeftSemi against the (broadcast) benchmark gram set, then a distinct on
    the surviving ids — the only shuffle is over the contaminated minority.
    """
    grams = benchmark_ngrams(bench, text_col, k)
    if broadcast_bench:
        grams = F.broadcast(grams)
    doc_grams = docs.select(
        F.col(id_col), F.explode(word_shingles(text_col, k)).alias("gram")
    )
    return doc_grams.join(grams, "gram", "left_semi").select(id_col).distinct()


def contamination_flags(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 13,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Every document with a boolean ``contaminated`` column (audit form —
    lets the pipeline report contamination rates before dropping anything).

    The hit set is a skinny id list, but its size is NOT bounded a priori —
    on a corpus with heavy benchmark overlap (exactly when decontamination
    matters most) it can be a large fraction of the corpus, so the flag
    join is NOT force-broadcast: AQE broadcasts it at runtime when it is
    actually small, and falls back to a shuffled join when it is not
    (mirroring the refused unconditional hint in plans/analytics.py
    dim-join policy)."""
    hits = contaminated_ids(docs, bench, text_col, id_col, k, broadcast_bench)
    hits = hits.withColumn("__hit", F.lit(True))
    return (
        docs.join(hits, id_col, "left")
        .withColumn("contaminated", F.coalesce(F.col("__hit"), F.lit(False)))
        .drop("__hit")
    )


def contamination_report(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 13,
    broadcast_bench: bool = True,
    hashed_grams: bool = True,
) -> DataFrame:
    """Contamination SEVERITY per document: ``(id, n_grams, n_hit_grams,
    overlap_frac, contaminated)`` — the inspect-before-you-scrub report
    (the :func:`~eth_indexer_spark.operators.dedup.duplicated_spans`
    analog for decontamination). A binary flag treats a document sharing 1
    of its 500 k-grams with the benchmark the same as a verbatim eval-set
    copy; the overlap fraction is what lets a pipeline pick the drop
    threshold (GPT-3 App. C-style conservative vs aggressive cleaning)
    before committing to a cut.

    Same scale shape as :func:`contamination_flags`: the benchmark gram
    set is broadcast (map-only corpus scan), the hit marking rides the
    SAME exploded gram stream as the total count (one left join + one
    groupBy on the doc id), and the corpus is scanned exactly ONCE:
    ``explode_outer`` keeps documents shorter than ``k`` words as a
    null-gram row — ``count(gram)`` ignores it, so they come back with
    zero counts instead of vanishing, with no second id-restore scan
    (plan-audited).

    Gram text never reaches this operator's OUTPUT (only counts and the
    overlap fraction do), so by default (``hashed_grams=True``) both
    sides gram on
    :func:`~eth_indexer_spark.operators.dedup.hashed_word_shingles` —
    64-bit shingle hashes built without materializing the shingle
    strings. Per-doc distinct-hash counts equal distinct-shingle counts
    and hash-join hits equal string-join hits modulo the same
    ~2⁻⁶⁴-per-pair collision odds the Jaccard family already accepts
    (the dedup kernel's argument); the broadcast rows narrow from gram
    strings to longs for free. Measured (r10): ~1.3× at sf0.1 and ~2× at
    sf1 on the standalone report (6/6 alternating fresh-process pairs) —
    but the same swap LOST inside the v4 composition's small normalized
    gram stage (1/6 sf1 pairs), so callers whose gram stage is a minor,
    short-string slice of a larger cached pipeline pass
    ``hashed_grams=False`` to keep the string form (the kept-#7
    "win-is-specific" precedent). The binary
    :func:`contaminated_ids`/:func:`decontaminate` path always keeps
    string grams (its oracle compares the gram-set predicate directly)."""
    shingles = hashed_word_shingles if hashed_grams else word_shingles
    grams = (
        bench.select(F.explode(shingles(text_col, k)).alias("gram"))
        .distinct()
        .withColumn("__bench", F.lit(True))
    )
    if broadcast_bench:
        grams = F.broadcast(grams)
    doc_grams = docs.select(
        F.col(id_col), F.explode_outer(shingles(text_col, k)).alias("gram")
    )
    per = (
        doc_grams.join(grams, "gram", "left")
        .groupBy(id_col)
        .agg(
            F.count("gram").alias("__n"),
            F.sum(F.when(F.col("__bench"), 1).otherwise(0))
            .cast("long")
            .alias("__hit"),
        )
    )
    n_grams = F.col("__n")
    n_hits = F.coalesce("__hit", F.lit(0)).cast("long")
    return per.select(
        F.col(id_col),
        n_grams.alias("n_grams"),
        n_hits.alias("n_hit_grams"),
        F.when(n_grams > 0, F.round(n_hits.cast("double") / n_grams, 4))
        .otherwise(F.lit(0.0))
        .alias("overlap_frac"),
        (n_hits > 0).alias("contaminated"),
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 13,
    broadcast_bench: bool = True,
) -> DataFrame:
    """The clean corpus: documents with no benchmark k-gram overlap
    (LeftAnti against the hit set — unhinted: AQE broadcasts a small hit
    set at runtime; a corpus-scale hit set must shuffle, not OOM the
    driver under a forced broadcast)."""
    hits = contaminated_ids(docs, bench, text_col, id_col, k, broadcast_bench)
    return docs.join(hits, id_col, "left_anti")
