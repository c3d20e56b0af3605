"""Vocabulary construction and corpus encoding — the tokenizer-application
stage of a pretraining pipeline: build a frequency-ranked word vocabulary,
then map every document's token stream to integer ids.

Scale design (100 TB corpus, bounded vocabulary):

- :func:`build_vocab` is the `x_vocab_topk` aggregation hardened into an id
  assignment: explode → map-side-combined groupBy (the shuffle carries one
  row per DISTINCT word) → top-``vocab_size`` by (count desc, word) → dense
  1-based ids by that same order. Ranking the BOUNDED head is the only
  global sort, and it sorts ``vocab_size`` rows, not the corpus.
- :func:`encode_documents` attaches the vocabulary as ONE broadcast map row
  (``map_from_entries`` over the vocab — bounded by ``vocab_size``) and
  encodes with a per-row ``transform`` + ``element_at`` lookup. The corpus
  is NEVER shuffled or exploded: encoding is a map-only scan, unlike the
  explode → join → re-group alternative, which would shuffle every token of
  100 TB twice. Out-of-vocabulary words map to ``unk_id`` (0 by default,
  below the 1-based vocabulary range).

Both stages are deterministic (ties rank lexicographically) and
engine-reproducible — the registered query is fully oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def build_vocab(
    df: DataFrame, text_col: str, vocab_size: int = 50_000, min_count: int = 1
) -> DataFrame:
    """(word, token_id) for the ``vocab_size`` most frequent words
    (count desc, word asc; ids dense from 1). ``min_count`` drops the long
    tail before ranking."""
    if vocab_size <= 0:
        raise ValueError(f"vocab_size must be positive, got {vocab_size}")
    counts = (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
        .orderBy(F.desc("n"), "word")
        .limit(vocab_size)
    )
    # the head is ≤ vocab_size rows — a single-partition rank over it is a
    # bounded control-flow step, not a corpus sort
    w = W.orderBy(F.desc("n"), "word")
    return counts.select(
        "word", F.row_number().over(w).cast("long").alias("token_id")
    )


def encode_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    vocab: DataFrame,
    unk_id: int = 0,
) -> DataFrame:
    """Encode every document against ``vocab`` (a (word, token_id) frame):
    ``(id, token_ids array<long>, n_tokens, n_unk)``.

    The vocabulary is aggregated into a single map row and broadcast, so
    encoding is a zero-shuffle scan of the corpus with an O(1) hash lookup
    per token."""
    vocab_map = vocab.agg(
        F.map_from_entries(
            F.collect_list(F.struct("word", "token_id"))
        ).alias("__vocab")
    )
    words = F.split(F.col(text_col), " ")
    tids = F.transform(
        words,
        lambda x: F.coalesce(
            F.element_at(F.col("__vocab"), x), F.lit(unk_id).cast("long")
        ),
    )
    return (
        df.crossJoin(F.broadcast(vocab_map))
        .select(
            F.col(id_col),
            tids.alias("token_ids"),
            F.size(words).cast("long").alias("n_tokens"),
            F.size(
                F.filter(tids, lambda t: t == unk_id)
            ).cast("long").alias("n_unk"),
        )
    )
