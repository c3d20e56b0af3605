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

from eth_indexer_spark.operators._colmemo import memo_col


def word_ngrams(col, n: int = 2) -> Column:
    """NON-distinct word n-grams (array<string>) — unlike
    :func:`~eth_indexer_spark.operators.dedup.word_shingles`, repetition
    metrics need every occurrence. Documents shorter than n words yield an
    empty array. Same let-bound shape as ``word_shingles`` (see
    ``dedup._bind``): splicing the split expression into the per-position
    lambda re-evaluates it per element — O(words·len) per document."""
    from eth_indexer_spark.operators.dedup import _bind

    c = F.col(col) if isinstance(col, str) else col

    def body(words):
        cnt = F.size(words)
        idx = F.sequence(F.lit(1), cnt - (n - 1))
        grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i, n)))
        return F.when(cnt >= n, grams).otherwise(F.array().cast("array<string>"))

    return _bind(F.split(c, " "), body)


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

    Vocabulary-growth caveat (measured, sf1→sf10): "vocabulary-bounded"
    is corpus-DEPENDENT, not absolute — real multilingual/web corpora grow
    distinct-token counts with size (new languages, typos, identifiers),
    and at the 10× decade the reference-count build side crossed the 10 MB
    broadcast threshold, so AQE correctly switched the token↔count join
    broadcast→shuffle (SCALING_r07_sf10: exchanges 2→3, wall ×4.94/decade,
    still sub-linear per byte). That switchover is the DESIGN — the join is
    keyed on the token and survives it; read a +1 exchange at a new decade
    as the plan adapting, not a regression.

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


#: Gopher's required-stopword set (Rae et al. 2021 §A.1.1): a document is
#: expected to contain at least 2 of these to count as running English text.
GOPHER_REQUIRED_STOPWORDS: tuple[str, ...] = (
    "the", "be", "to", "of", "and", "that", "have", "with",
)

#: Line-leading characters treated as bullets by the Gopher bullet rule.
BULLET_CHARS: tuple[str, ...] = ("-", "*", "•")


def gopher_rules(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    required_stopwords: tuple[str, ...] = GOPHER_REQUIRED_STOPWORDS,
    min_required_stopwords: int = 2,
    passthrough: tuple[str, ...] = (),
    words_col: str | None = None,
    lines_col: str | None = None,
    word_cores_col: str | None = None,
) -> DataFrame:
    """Gopher/MassiveText quality-rule filter (Rae et al. 2021 §A.1.1) —
    the standard rule battery applied to every web-scale English corpus
    before model-based filtering: word-count bounds, mean word length
    bounds, symbol-to-word ratio (``#`` and ellipses), bullet-line and
    ellipsis-line fractions, fraction of words containing an alphabetic
    character, and a required-stopword count.

    Returns ``(id, n_words, mean_word_len, symbol_ratio, bullet_line_frac,
    ellipsis_line_frac, alpha_word_frac, n_req_stopwords, keep)`` — the
    per-rule evidence plus the verdict, so callers can audit WHY a document
    was dropped (threshold tuning needs the distributions, not just the
    boolean). ``keep`` is computed from the ROUNDED ratios shown, so the
    output is self-consistent and engine-portable (Spark and DuckDB round
    positive doubles identically; the repo-wide 4dp convention).

    100 TB shape: every column is a pure Column expression over the text —
    map-only, zero shuffle, whole-stage codegen; the filter composes ahead
    of any downstream shuffle for free. No UDF.

    Words are whitespace runs (``\\s+`` on the trimmed text), lines are
    ``\\n``-separated; empty documents yield 0 words and ``keep = false``.

    ``passthrough`` names input columns to carry into the output, so a
    pipeline can filter on ``keep`` without re-joining the metrics back to
    the corpus on the id (which would turn a map-only stage into a
    shuffle).

    Feed this battery a PLAIN text column (a scan column or a cache-backed
    one), not a derived expression: the metrics reference the text and its
    splits many times, the splits are interpreted higher-order children
    (no codegen CSE), and predicate pushdown re-substitutes the whole
    text expression into the ``keep`` filter — an expensive upstream
    expression is re-evaluated per reference (measured ~30× for
    x_curation_v4's C4 stage before its cache barrier).

    ``words_col`` / ``lines_col`` / ``word_cores_col`` optionally name
    PRE-SPLIT array columns the caller materialized (e.g. into the same
    cache as the text): they must hold exactly ``split(trim(text),
    '\\s+')``, ``split(text, '\\n')`` and the lowercased edge-stripped
    word cores respectively — the battery then reads the arrays instead
    of re-running each split per metric reference (and again inside the
    pushed-down ``keep`` filter). Semantics are identical by the caller's
    contract; only where the split work happens moves.

    The metric tree (everything except the threshold booleans in ``keep``)
    is ~1200 py4j round trips to build (~0.3 s of driver time per QUERY
    CONSTRUCTION); it depends only on the column names and the stopword
    list, so it is memoized process-wide (:mod:`._colmemo`).
    """

    def build_metrics() -> tuple:
        c = F.col(text_col)
        words = F.col(words_col) if words_col else F.split(F.trim(c), r"\s+")
        n_words = F.when(F.length(F.trim(c)) > 0, F.size(words)).otherwise(
            F.lit(0)
        )
        lines = F.col(lines_col) if lines_col else F.split(c, "\n")
        n_lines = F.size(lines)

        def ratio(num, den):
            return F.when(den > 0, F.round(num.cast("double") / den, 4)).otherwise(
                F.lit(0.0)
            )

        # sum of word lengths == length of the separator-less concatenation
        # (exact: split tokens contain no separators to collapse). concat_ws
        # is whole-stage-codegen; the aggregate fold is an interpreted
        # per-element lambda with Long boxing — measured 0.17 -> 0.14 s per
        # corpus pass at sf0.1, identical output on every document.
        char_sum = F.length(F.concat_ws("", words)).cast("long")
        mean_word_len = ratio(char_sum, n_words)

        def occurrences(literal: str):
            return (
                F.length(c) - F.length(F.replace(c, F.lit(literal), F.lit("")))
            ) / len(literal)

        n_symbols = (
            occurrences("#")
            + F.size(F.regexp_extract_all(c, F.lit(r"\.{3}"), 0))
            + occurrences("…")
        )
        symbol_ratio = ratio(n_symbols, n_words)

        bullet_frac = ratio(
            F.size(
                F.filter(
                    lines,
                    lambda l: F.substring(F.ltrim(l), 1, 1).isin(*BULLET_CHARS),
                )
            ),
            n_lines,
        )
        ellipsis_frac = ratio(
            F.size(
                F.filter(
                    lines,
                    lambda l: l.endswith("...") | l.endswith("…"),
                )
            ),
            n_lines,
        )
        alpha_frac = ratio(
            F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]"))), n_words
        )
        # stopwords are matched on WORD CORES — lowercased whitespace tokens
        # with non-alphanumeric edges stripped — so 'The.' / 'the,' / '"the"'
        # count. A raw whitespace-token intersect would make the rule
        # stricter than Gopher's on any punctuated text (a stopword followed
        # by a comma never matches) and reject fluent documents.
        word_cores = (
            F.col(word_cores_col)
            if word_cores_col
            else F.transform(
                F.split(F.lower(F.trim(c)), r"\s+"),
                lambda w: F.regexp_replace(w, r"^[^0-9a-z]+|[^0-9a-z]+$", ""),
            )
        )
        n_req_stop = F.size(
            F.array_intersect(
                F.array_distinct(word_cores),
                F.array(*[F.lit(s) for s in required_stopwords]),
            )
        )
        return (
            n_words.alias("n_words"),
            mean_word_len.alias("mean_word_len"),
            symbol_ratio.alias("symbol_ratio"),
            bullet_frac.alias("bullet_line_frac"),
            ellipsis_frac.alias("ellipsis_line_frac"),
            alpha_frac.alias("alpha_word_frac"),
            n_req_stop.alias("n_req_stopwords"),
        )

    metrics = memo_col(
        (
            "gopher_metrics",
            text_col,
            words_col,
            lines_col,
            word_cores_col,
            tuple(required_stopwords),
        ),
        build_metrics,
    )

    out = df.select(
        F.col(id_col),
        *[F.col(c) for c in passthrough],
        *metrics,
    )
    keep = (
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len)
        & (F.col("symbol_ratio") <= max_symbol_ratio)
        & (F.col("bullet_line_frac") <= max_bullet_line_frac)
        & (F.col("ellipsis_line_frac") <= max_ellipsis_line_frac)
        & (F.col("alpha_word_frac") >= min_alpha_word_frac)
        & (F.col("n_req_stopwords") >= min_required_stopwords)
    )
    return out.withColumn("keep", keep)


def c4_line_filter(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_words_per_line: int = 3,
    min_lines: int = 3,
    terminal_punct: tuple[str, ...] = (".", "!", "?", '"'),
    line_bans: tuple[str, ...] = ("javascript",),
    doc_bans: tuple[str, ...] = ("lorem ipsum", "{"),
) -> DataFrame:
    """C4-style line-level cleaning (Raffel et al. 2020 §2.2): keep only
    lines that end in terminal punctuation, have at least
    ``min_words_per_line`` words, and contain none of ``line_bans``
    (case-insensitive); drop the whole document if fewer than ``min_lines``
    lines survive or its original text contains any of ``doc_bans``
    (case-insensitive — the curly-brace/lorem-ipsum page rules).

    Returns survivors only: ``(id, clean_text, n_lines_kept)`` with the
    kept lines rejoined by ``\\n`` in original order.

    100 TB shape: split → ``F.filter`` lambda → ``array_join`` — pure
    Column expressions, map-only, zero shuffle, no UDF; like
    :func:`~eth_indexer_spark.operators.dedup.line_dedup` but purely local
    (no corpus-wide line counts), so it belongs FIRST in a curation
    pipeline, ahead of every shuffle-bearing stage.

    The kept-lines / doc-verdict expression pair is memoized process-wide
    by its parameters (:mod:`._colmemo`) — the per-line regex battery is
    hundreds of py4j round trips to build, repeated per query
    construction otherwise."""
    key = (
        "c4_line_filter",
        text_col,
        min_words_per_line,
        min_lines,
        tuple(terminal_punct),
        tuple(line_bans),
        tuple(doc_bans),
    )
    kept, doc_ok = memo_col(key, lambda: _c4_exprs(
        text_col, min_words_per_line, min_lines, terminal_punct, line_bans,
        doc_bans,
    ))
    return (
        df.select(
            F.col(id_col),
            kept.alias("__kept"),
            doc_ok.alias("__ok"),
        )
        .where(F.col("__ok"))
        .select(
            F.col(id_col),
            F.array_join("__kept", "\n").alias("clean_text"),
            F.size("__kept").alias("n_lines_kept"),
        )
    )


def _c4_exprs(
    text_col: str,
    min_words_per_line: int,
    min_lines: int,
    terminal_punct: tuple[str, ...],
    line_bans: tuple[str, ...],
    doc_bans: tuple[str, ...],
) -> tuple[Column, Column]:
    """(kept-lines array, doc-verdict boolean) for :func:`c4_line_filter`."""
    c = F.col(text_col)
    lines = F.split(c, "\n")

    def word_count_ok(l):
        """``size(split(trim(l), r"\\s+")) >= min_words_per_line``, decided
        WITHOUT materializing the word array: the split form allocates one
        string per word on every line just to compare a count, and this
        lambda re-evaluates per plan reference (filter pushdown + project
        copies — interpreted HOFs get no codegen CSE). Anchored POSSESSIVE
        regexes (``\\S++``/``\\s*+`` never backtrack — an unbounded
        greedy ``\\S+`` re-scans a giant unbroken token O(len²) on failure)
        read only the first ``min_words_per_line`` tokens and allocate
        nothing.

        Split-semantics replication FOR THE LINES THIS FILTER CAN KEEP —
        pinned by ``test_c4_word_count_regex_matches_split_form``. ``trim``
        strips SPACES only, and a leading separator yields a phantom empty
        first element (Spark's ``split`` with the default limit=-1 keeps
        BOTH leading and trailing empties), so a space-trimmed line that
        starts — or ends — with non-space whitespace counts phantom
        "words". The regex form models the LEADING phantom (≥ m non-space
        runs, OR the leading phantom and ≥ m-1 runs) but deliberately not
        the trailing one: on a line ending in non-space whitespace
        (``'a b\\t'`` at m = 3) or an all-whitespace line at m = 2 the two
        forms diverge — and every such line is UNREACHABLE here, because
        ``line_ok`` conjoins the terminal-punctuation rule first, which no
        whitespace-terminated line passes. Standalone equivalence
        therefore holds exactly for lines not ending in whitespace (the
        gate's guarantee), not in general. For m < 2 the split form is
        kept outright (an all-whitespace line's phantoms can satisfy the
        bound where run-counting cannot; never hot — the default and
        every caller use m ≥ 2)."""
        if min_words_per_line < 2:
            return F.size(F.split(F.trim(l), r"\s+")) >= min_words_per_line
        m = min_words_per_line
        runs_m = l.rlike(r"^\s*+(\S++\s++){%d}\S" % (m - 1))
        phantom = l.rlike(r"^ *+[\s&&[^ ]]")
        runs_m1 = l.rlike(r"^\s*+(\S++\s++){%d}\S" % (m - 2))
        return runs_m | (phantom & runs_m1)

    def line_ok(l):
        # empty terminal_punct = rule disabled (None & col would yield a
        # NULL boolean that silently drops every line)
        ends = F.lit(True)
        for i, p in enumerate(terminal_punct):
            e = l.endswith(p)
            ends = e if i == 0 else (ends | e)
        ok = ends & word_count_ok(l)
        for b in line_bans:
            ok = ok & ~F.lower(l).contains(b.lower())
        return ok

    kept = F.filter(lines, line_ok)

    # The verdict references the text THREE times (the kept-line count and
    # one ``contains`` per doc ban). When the caller's text column is
    # itself an expensive expression (x_curation_v4 feeds the synthesized-
    # lines subtree straight in), the pushed-down filter re-evaluates it
    # per reference — measured as 3 copies of the synth subtree in the v4
    # scan Filter. Binding the text once (the dedup kernel's ``_bind``
    # let-form, which no optimizer rewrite can inline) makes the verdict
    # evaluate its input exactly once per raw row; for a plain scan/cache
    # column the bind is a no-op read. Semantics unchanged.
    def verdict(t):
        ok = F.size(F.filter(F.split(t, "\n"), line_ok)) >= min_lines
        for b in doc_bans:
            ok = ok & ~F.lower(t).contains(b.lower())
        return ok

    from eth_indexer_spark.operators.dedup import _bind

    doc_ok = _bind(c, verdict)
    return kept, doc_ok


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
