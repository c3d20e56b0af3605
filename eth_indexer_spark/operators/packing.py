"""Sequence packing for pretraining-data pipelines: lay documents out into
fixed-length training sequences.

The GPT-style packing model — concatenate the token streams of all documents
in a stable order and cut the stream every ``seq_len`` tokens — is the one
packing scheme that is simultaneously deterministic, fragmentation-free
(every pack except the last is exactly full), and expressible as pure
relational algebra: a document's placement is a function of the EXCLUSIVE
prefix sum of token counts over the corpus order, nothing else. That makes
it reproducible across engines (auditable in plain SQL, like
``operators/sampling.py``) and embarrassingly scalable — no bin-packing
state, no driver loop.

The global prefix sum is the only non-trivial part at 100 TB: a naive
``Window.orderBy`` with no partition key runs in ONE task. This reuses
:func:`eth_indexer_spark.operators.prefix_sum.global_running_sum`
(literal-boundary bucketing → bucket-local window → broadcast offsets), so
packing costs one bucket shuffle regardless of corpus size. Pack arithmetic is integer ``div``
/ ``%`` on longs — exact, never a double.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from eth_indexer_spark.operators.prefix_sum import global_running_sum


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_count_col,
    seq_len: int = 2048,
    order_proxy=None,
) -> DataFrame:
    """Packing coordinates per document under concat-and-cut packing.

    ``id_col`` must be a unique, totally-ordered key (the corpus order —
    use a deterministic id, not an RNG shuffle, so re-runs pack
    identically). A non-numeric id needs ``order_proxy`` — a numeric
    expression monotone in the id, e.g. its first 15 hex digits for
    md5-style string ids (see prefix_sum.global_running_sum).
    ``token_count_col`` is a column name or expression giving
    each document's token count; rows with a non-positive count are dropped
    (an empty document occupies no tokens and has no placement).

    Returns one row per document:

    - ``n_tokens`` — the document's token count;
    - ``start_pack`` / ``start_offset`` — pack index and offset within it
      where the document's first token lands;
    - ``end_pack`` — pack index of the document's LAST token;
    - ``n_packs`` — how many packs the document spans (1 = fits without
      crossing a boundary; >1 = split across consecutive packs, the
      standard pretraining treatment of long documents).

    Downstream consumers turn this into physical batches by grouping on
    pack index; aggregate utilization is ``sum(n_tokens) / (max(end_pack)+1)
    / seq_len`` — 100% on every pack but the last, by construction.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    n = token_count_col if not isinstance(token_count_col, str) else F.col(token_count_col)
    docs = df.select(F.col(id_col), n.cast("long").alias("n_tokens")).filter(
        F.col("n_tokens") > 0
    )
    cum = global_running_sum(
        docs, id_col, F.col("n_tokens"), out_col="__end_tok", order_proxy=order_proxy
    )
    # __end_tok is the INCLUSIVE cumulative count; start token index is
    # __end_tok - n_tokens, last token index is __end_tok - 1. Long DIV / %
    # keeps the arithmetic exact at any corpus size.
    start_pack = F.expr(f"(__end_tok - n_tokens) DIV {seq_len}")
    end_pack = F.expr(f"(__end_tok - 1) DIV {seq_len}")
    return cum.select(
        id_col,
        "n_tokens",
        start_pack.alias("start_pack"),
        F.expr(f"(__end_tok - n_tokens) % {seq_len}").alias("start_offset"),
        end_pack.alias("end_pack"),
        (end_pack - start_pack + F.lit(1)).alias("n_packs"),
    )


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_tokens: int = 128,
    overlap: int = 16,
) -> DataFrame:
    """Split every document into fixed-size overlapping token-window chunks
    — the context-window chunker (RAG indexing, long-doc pretraining with
    sliding windows). Chunk ``i`` covers word tokens
    ``[i·stride, i·stride + chunk_tokens)`` with ``stride = chunk_tokens −
    overlap``; a chunk starts at every stride multiple up to ``len −
    overlap − 1``, so the tail is always covered (the last kept start is
    within ``chunk_tokens`` of the end) and every token belongs to at least
    one chunk — while a start in the final ``overlap`` tokens, whose chunk
    would be WHOLLY contained in its predecessor, is never emitted
    (duplicate content inflates RAG/pretraining consumers).

    Pure per-row expressions (split → posexplode of the start sequence →
    slice): no shuffle, no state, no UDF — the 100 TB cost is the explode
    fan-out itself, ~``1 + overlap/stride`` output rows per input token
    window, which is the data the consumer asked for. Deterministic and
    engine-reproducible (the registered query is oracle-checked).

    Returns ``(id, chunk_idx, chunk_text, n_chunk_tokens)``. Note the
    whitespace-token convention of the rest of the text family: ``split``
    on a single space, so a zero-length text still counts one (empty)
    token — length filtering belongs to the quality stage upstream.
    """
    if chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be positive, got {chunk_tokens}")
    if not (0 <= overlap < chunk_tokens):
        raise ValueError(f"overlap must be in [0, chunk_tokens), got {overlap}")
    stride = chunk_tokens - overlap
    words = F.split(F.col(text_col), " ")
    # inclusive bound len - overlap - 1: a later start's chunk is a strict
    # subset of its predecessor's; greatest(..., 0) keeps the single chunk
    # of a document shorter than the overlap (incl. the empty-text token)
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size(words) - overlap - 1, F.lit(0)),
        F.lit(stride),
    )
    exploded = df.select(
        F.col(id_col),
        words.alias("__w"),
        F.posexplode(starts).alias("chunk_idx", "__start"),
    )
    return exploded.select(
        F.col(id_col),
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.concat_ws(
            " ", F.slice("__w", F.col("__start") + 1, chunk_tokens)
        ).alias("chunk_text"),
        F.least(
            F.lit(chunk_tokens), F.size("__w") - F.col("__start")
        ).cast("long").alias("n_chunk_tokens"),
    )
