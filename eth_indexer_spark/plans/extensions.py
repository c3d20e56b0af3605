"""Training-data pipeline extension queries over ``documents`` and
``embeddings`` — deduplication, similarity search, text analysis — each
registered with a DuckDB oracle where the semantics are SQL-expressible
(hash-family-dependent ops — MinHash/SimHash/LSH/IVF — get rows-only checks;
their *verification* predicates are exact, so the oracle-checked
ngram-jaccard / cosine-pairs queries pin the same ground truth).

Registered into the same QUERIES/ORACLE registry as plans/analytics.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eth_indexer_spark.catalog import load_table
from eth_indexer_spark.functions import text as tx
from eth_indexer_spark.operators import dedup, similarity
from eth_indexer_spark.operators._persist import persist_bounded
from eth_indexer_spark.plans.analytics import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _doubled_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ (documents with shifted ids): manufactures exact
    duplicates so exact-dedup is non-degenerate (the corpus itself is
    distinct-by-text)."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return d.unionByName(d.select((F.col("doc_id") + 100000).alias("doc_id"), "text"))


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------


@register(
    "x_dedup_exact",
    """
    WITH all_docs AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 100000 AS doc_id, text FROM documents
    )
    SELECT md5(text) AS digest, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
    FROM all_docs GROUP BY md5(text)
    """,
)
def x_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.exact_dedup(_doubled_docs(spark, sf_dir), "text", "doc_id")


@register(
    "x_dedup_ngram_jaccard",
    """
    WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (
        SELECT doc_id,
               list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                              for i in range(1, len(w) - 1)]) AS shingles
        FROM docs WHERE len(w) >= 3
    ),
    e AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
    pairs AS (
        SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS inter
        FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    sizes AS (SELECT doc_id, len(shingles) AS n FROM sh)
    SELECT i, j
    FROM pairs JOIN sizes si ON i = si.doc_id JOIN sizes sj ON j = sj.doc_id
    WHERE inter * 1.0 / (si.n + sj.n - inter) >= 0.5
    """,
)
def x_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), "text", "doc_id", k=3, threshold=0.5,
        exact=True,
    )


@register(
    "x_dedup_ngram_jaccard_capped",
    """
    WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (
        SELECT doc_id,
               list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                              for i in range(1, len(w) - 1)]) AS shingles
        FROM docs WHERE len(w) >= 3
    ),
    e0 AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
    keep AS (SELECT s FROM e0 GROUP BY s HAVING COUNT(*) <= 5),
    e AS (SELECT e0.doc_id, e0.s FROM e0 JOIN keep USING (s)),
    pairs AS (
        SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS inter
        FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM e GROUP BY doc_id)
    SELECT i, j
    FROM pairs JOIN sizes si ON i = si.doc_id JOIN sizes sj ON j = sj.doc_id
    WHERE inter * 1.0 / (si.n + sj.n - inter) >= 0.5
    """,
)
def x_dedup_ngram_jaccard_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The adversarial-corpus-safe near-dup form: shingles in more than
    ``max_df`` docs are dropped before the Jaccard, bounding the hot-key
    O(d²) pair blow-up (operators/dedup.py:cap_hot_keys). Exact semantics
    over the capped representation → fully oracle-checked."""
    return dedup.ngram_jaccard_pairs_capped(
        _t(spark, sf_dir, "documents"), "text", "doc_id", k=3, threshold=0.5, max_df=5
    )


@register(
    "x_dedup_clusters",
    """
    WITH RECURSIVE docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (
        SELECT doc_id,
               list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                              for i in range(1, len(w) - 1)]) AS shingles
        FROM docs WHERE len(w) >= 3
    ),
    e0 AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
    keep AS (SELECT s FROM e0 GROUP BY s HAVING COUNT(*) <= 5),
    e AS (SELECT e0.doc_id, e0.s FROM e0 JOIN keep USING (s)),
    co AS (
        SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS inter
        FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM e GROUP BY doc_id),
    pairs AS (
        SELECT i, j
        FROM co JOIN sizes si ON i = si.doc_id JOIN sizes sj ON j = sj.doc_id
        WHERE inter * 1.0 / (si.n + sj.n - inter) >= 0.5
    ),
    ed AS (SELECT i AS u, j AS v FROM pairs UNION ALL SELECT j AS u, i AS v FROM pairs),
    reach(src, dst) AS (
        SELECT u, v FROM ed
        UNION
        SELECT r.src, ed.v FROM reach r JOIN ed ON r.dst = ed.u
    ),
    cl AS (SELECT src AS doc, LEAST(src, MIN(dst)) AS cluster FROM reach GROUP BY src)
    SELECT d.doc_id AS doc, COALESCE(cl.cluster, d.doc_id) AS cluster
    FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc
    """,
)
def x_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The final stage of every dedup pipeline: assign EVERY document a
    duplicate-cluster id = min doc id of its connected component over the
    near-dup pair graph (operators/dedup.py:connected_components — the
    O(log² n)-round large-star/small-star form, never driver-side
    union-find). Pairs come from the capped exact ngram-Jaccard, so the
    whole pipeline — pair generation AND clustering — is oracle-checked
    (DuckDB mirrors the clustering with a recursive-CTE reachability
    closure + min-label)."""
    d = _t(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs_capped(
        d, "text", "doc_id", k=3, threshold=0.5, max_df=5
    )
    return dedup.dedup_clusters(d, pairs, "doc_id")


@register("x_dedup_minhash_lsh")  # hash-family dependent → rows-only check
def x_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered with the degenerate-corpus guard ON: ``max_bucket`` caps
    candidate generation per LSH bucket, so a corpus where one band collides
    for every document cannot flood verification with O(N²) candidates
    through this entry point. On a normal corpus the cap is far above any
    real bucket size and the output is unchanged (pinned by
    tests/test_extensions.py)."""
    return dedup.minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"), "text", "doc_id",
        k=3, num_hashes=32, bands=8, threshold=0.5, max_bucket=5000,
    )


@register("x_dedup_minhash_incremental")  # hash-family dependent → rows-only
def x_dedup_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup dedup (operators/dedup.py:
    incremental_minhash_pairs): a new batch (every 4th doc) dedupes against
    the stored MinHash/LSH index of the rest of the corpus — candidate
    generation and exact-Jaccard verification run over O(batch + bucket
    collisions) rows, never the corpus text. The append-corpus form of
    x_dedup_minhash_lsh; equality with batch-mode pairs restricted to the
    batch is pinned by test_incremental_minhash_matches_batch_mode."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    # in production the index is a stored table (two column-pruned scans
    # beat caching it); HERE it is derived from text, so pool-persist it —
    # the operator consumes it twice (bucket explode + hsh verification)
    idx = persist_bounded(
        "extensions.minhash_inc.idx",
        dedup.minhash_index(d.filter(F.col("doc_id") % 4 != 0), "text", "doc_id"),
    )
    return dedup.incremental_minhash_pairs(
        d.filter(F.col("doc_id") % 4 == 0), idx, "text", "doc_id",
        k=3, threshold=0.5, max_bucket=5000,
    )


@register("x_dedup_simhash")  # hash-family dependent → rows-only check
def x_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    fps = dedup.simhash(_doubled_docs(spark, sf_dir), "text", "doc_id")
    return dedup.simhash_near_pairs(fps, max_hamming=3)


@register(
    "x_embed_near_dup",
    """
    SELECT a.vec_id AS i, b.vec_id AS j
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                 CAST(b.embedding AS DOUBLE[])) >= 0.4
    """,
)
def x_embed_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.cosine_pairs(_t(spark, sf_dir, "embeddings"), threshold=0.4)


@register(
    "x_embed_near_dup_lsh",
    """
    WITH all_e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        UNION ALL
        SELECT vec_id + 100000,
               list_transform(CAST(embedding AS DOUBLE[]), x -> x * 1.01 + 0.001)
        FROM embeddings
    )
    SELECT a.vec_id AS i, b.vec_id AS j
    FROM all_e a JOIN all_e b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.e, b.e) >= 0.9
    """,
)
def x_embed_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sub-quadratic near-dup path: banded RHP-LSH candidates +
    exact verification, over a corpus with PLANTED duplicates (each vector
    ∪ a perturbed copy — the near-dup analog of `_doubled_docs`). At
    duplicate-grade similarity (here ≈0.9999) banded recall is ≈1 − 1e-17,
    so the output equals the exact all-pairs result and the operator is
    oracle-checked despite being an LSH path."""
    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    as_double = F.transform("embedding", lambda x: x.cast("double"))
    pert = e.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(as_double, lambda x: x * 1.01 + 0.001).alias("embedding"),
    )
    corpus = e.select("vec_id", as_double.alias("embedding")).unionByName(pert)
    dim = len(_query_vec(spark, sf_dir, 0))
    return similarity.rhp_banded_pairs(
        corpus, dim=dim, threshold=0.9, r=8, L=12
    )


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------


def _query_vec(spark: SparkSession, sf_dir: str, vec_id: int = 0) -> list[float]:
    """One query vector, read per CONSTRUCTION (never memoized — it is
    data). The local-file fast path reads the single row driver-side with
    pyarrow (row-group predicate pushdown; ~5 ms) instead of scheduling a
    Spark job for a one-row head() (~80 ms of the ANN queries' measured
    construction time); non-local sources keep the Spark path."""
    path = os.path.join(sf_dir, "embeddings.parquet")
    if os.path.exists(path):
        import pyarrow.parquet as pq

        tbl = pq.read_table(
            path,
            columns=["vec_id", "embedding"],
            filters=[("vec_id", "=", vec_id)],
        )
        if tbl.num_rows:
            return [float(x) for x in tbl.column("embedding")[0].as_py()]
    row = (
        _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") == vec_id).select("embedding").head()
    )
    return [float(x) for x in row["embedding"]]


@register(
    "x_ann_cosine_topk",
    """
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS e FROM embeddings WHERE vec_id = 0)
    SELECT vec_id
    FROM embeddings, q
    WHERE vec_id <> 0
    ORDER BY list_cosine_similarity(CAST(embedding AS DOUBLE[]), q.e) DESC, vec_id
    LIMIT 10
    """,
)
def x_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = _query_vec(spark, sf_dir, 0)
    return similarity.cosine_topk(
        _t(spark, sf_dir, "embeddings"), q, k=10, exclude_id=0
    ).select("vec_id")


@register(
    "x_ann_batch_topk",
    """
    WITH q AS (
        SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        FROM embeddings WHERE vec_id IN (0, 1, 2)
    ),
    r AS (
        SELECT q.query_id, e.vec_id,
               ROW_NUMBER() OVER (
                   PARTITION BY q.query_id
                   ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv)
                            DESC, e.vec_id
               ) AS rnk
        FROM embeddings e, q
        WHERE e.vec_id <> q.query_id
    )
    SELECT query_id, vec_id, rnk FROM r WHERE rnk <= 10
    """,
)
def x_ann_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch retrieval: exact top-10 for a query SET in one corpus scan
    (operators/similarity.py:cosine_topk_batch — two-stage blocked top-k,
    deterministic fold-order cosine, so even the ranks hash-match the
    oracle)."""
    e = _t(spark, sf_dir, "embeddings")
    qs = e.filter(F.col("vec_id").isin(0, 1, 2)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return similarity.cosine_topk_batch(e, qs, k=10)


@register("x_ann_rhp_lsh")  # approximate → rows-only check
def x_ann_rhp_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = _query_vec(spark, sf_dir, 0)
    return similarity.rhp_ann_topk(
        _t(spark, sf_dir, "embeddings"), q, dim=len(q), k=10, n_planes=8
    ).select("vec_id")


@register(
    "x_ann_ivf",
    """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    c AS (SELECT vec_id AS cid, v AS cv FROM e ORDER BY vec_id LIMIT 16),
    q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
    probe AS (
        SELECT cid FROM c, q
        ORDER BY list_cosine_similarity(cv, qv) DESC, cid LIMIT 4
    ),
    assign AS (
        SELECT e.vec_id, c.cid,
               ROW_NUMBER() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cid
               ) AS rn
        FROM e, c
    )
    SELECT a.vec_id
    FROM assign a JOIN e ON a.vec_id = e.vec_id, q
    WHERE a.rn = 1 AND a.cid IN (SELECT cid FROM probe) AND a.vec_id <> 0
    ORDER BY list_cosine_similarity(e.v, qv) DESC, a.vec_id
    LIMIT 10
    """,
)
def x_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with deterministic lowest-id centroids — fully oracle-checkable
    (centroid choice, assignment argmax, probe list, and final top-k all
    have exact ANSI-SQL equivalents)."""
    q = _query_vec(spark, sf_dir, 0)
    return similarity.ivf_topk(
        _t(spark, sf_dir, "embeddings"), q, k=10, nlist=16, nprobe=4, exclude_id=0
    ).select("vec_id")


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


@register(
    "x_text_stats",
    """
    SELECT doc_id,
           len(regexp_split_to_array(text, '\\s+'))                   AS n_tokens,
           len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS n_bpe_tokens,
           length(text)                                               AS n_chars_q,
           ROUND(len(regexp_extract_all(text, '[a-zA-Z]')) * 1.0
                 / length(text), 4)                                   AS alpha_ratio,
           ROUND(len(list_filter(string_split(lower(text), ' '),
                                 w -> w IN ('the','a','and','of','to','in','is','it','that','for'))) * 1.0
                 / len(string_split(lower(text), ' ')), 4)            AS stop_ratio
    FROM documents
    """,
)
def x_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        tx.token_count("text").alias("n_tokens"),
        tx.word_token_count("text").alias("n_bpe_tokens"),
        tx.char_count("text").alias("n_chars_q"),
        tx.alpha_ratio("text").alias("alpha_ratio"),
        tx.stopword_ratio("text").alias("stop_ratio"),
    )


@register(
    "x_text_quality",
    """
    WITH m AS (
        SELECT doc_id,
               len(regexp_split_to_array(text, '\\s+')) AS t,
               len(regexp_extract_all(text, '[a-zA-Z]')) * 1.0 / length(text) AS alpha,
               len(list_filter(string_split(lower(text), ' '),
                               w -> w IN ('the','a','and','of','to','in','is','it','that','for'))) * 1.0
               / len(string_split(lower(text), ' ')) AS stop
        FROM documents
    )
    SELECT doc_id,
           ROUND(0.4 * LEAST(t / 64.0, 1.0)
                 + 0.4 * ROUND(alpha, 4)
                 + 0.2 * LEAST(ROUND(stop, 4) * 5, 1.0), 5) AS quality
    FROM m
    """,
)
def x_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", tx.quality_score("text").alias("quality"))


@register(
    "x_text_langid",
    """
    WITH c AS (
        SELECT doc_id,
               string_split(lower(text), ' ') AS w,
               len(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]')) AS cjk
        FROM documents
    ),
    m AS (
        SELECT doc_id, cjk,
               len(list_filter(w, x -> x IN ('the','and','of','is','to')))   AS c_en,
               len(list_filter(w, x -> x IN ('le','la','et','les','des')))   AS c_fr,
               len(list_filter(w, x -> x IN ('el','la','los','que','de')))   AS c_es,
               len(list_filter(w, x -> x IN ('der','die','und','das','ist'))) AS c_de
        FROM c
    )
    SELECT doc_id,
           CASE WHEN cjk > 0 THEN 'zh'
                WHEN GREATEST(c_en, c_fr, c_es, c_de) = 0 THEN 'und'
                WHEN c_en = GREATEST(c_en, c_fr, c_es, c_de) THEN 'en'
                WHEN c_fr = GREATEST(c_en, c_fr, c_es, c_de) THEN 'fr'
                WHEN c_es = GREATEST(c_en, c_fr, c_es, c_de) THEN 'es'
                WHEN c_de = GREATEST(c_en, c_fr, c_es, c_de) THEN 'de'
                ELSE 'und' END AS lang_pred
    FROM m
    """,
)
def x_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", tx.lang_id("text").alias("lang_pred"))


@register(
    "x_text_fingerprint",
    """
    SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
    FROM documents
    """,
)
def x_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", tx.fingerprint("text").alias("fp"))


# ---------------------------------------------------------------------------
# Multimodal plumbing (operators/multimodal.py): media as opaque binary +
# typed metadata. The corpus has no real media, so the text bytes stand in as
# the payload; the fake decoder derives metadata purely from byte length,
# which DuckDB can mirror — so the mapInPandas plumbing itself is
# oracle-checked end to end.
# ---------------------------------------------------------------------------


@register(
    "x_mm_decode_meta",
    """
    SELECT doc_id,
           16 + (octet_length(encode(text)) % 64)        AS width,
           16 + ((octet_length(encode(text)) // 64) % 64) AS height,
           3                                              AS n_channels,
           octet_length(encode(text)) * 10                AS duration_ms
    FROM documents
    """,
)
def x_mm_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from eth_indexer_spark.operators import multimodal as mm

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("media")
    )
    return mm.decode_media(d, "media").select(
        "doc_id", "width", "height", "n_channels", "duration_ms"
    )


@register(
    "x_mm_frame_sample",
    """
    WITH m AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents),
    f AS (
        SELECT doc_id, n,
               CAST(CEIL(GREATEST(n, 1) / 256.0) AS BIGINT) AS n_frames
        FROM m
    )
    SELECT doc_id, n_frames,
           64 * (n_frames - 1) + LEAST(64, n - 256 * (n_frames - 1)) AS frame_bytes
    FROM f
    """,
)
def x_mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from eth_indexer_spark.operators import multimodal as mm

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("media")
    )
    frames = mm.sample_frames(d, "media", every_n_bytes=256, frame_size=64)
    return frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.sum(F.length("frame")).alias("frame_bytes"),
    )


# ---------------------------------------------------------------------------
# Event-time windows / sessionization (streaming/windows.py) — batch forms of
# the streaming operators, oracle-checked. The streaming paths are pinned to
# these in tests/test_streaming_windows.py.
# ---------------------------------------------------------------------------


@register(
    "x_windowed_agg",
    """
    SELECT date_trunc('hour', ts)                   AS win_start,
           date_trunc('hour', ts) + INTERVAL 1 HOUR AS win_end,
           event_type,
           COUNT(*)             AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM events GROUP BY 1, 2, 3
    """,
)
def x_windowed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from eth_indexer_spark.streaming.windows import windowed_event_aggregate

    return windowed_event_aggregate(
        _t(spark, sf_dir, "events"), window="1 hour", keys=("event_type",)
    )


@register(
    "x_sessions",
    """
    WITH g AS (
        SELECT user_id, ts, value,
               CASE WHEN epoch(ts) - epoch(LAG(ts) OVER
                        (PARTITION BY user_id ORDER BY ts)) >= 1800
                    THEN 1 ELSE 0 END AS brk
        FROM events
    ),
    s AS (
        SELECT user_id, ts, value,
               SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
        FROM g
    )
    SELECT user_id,
           MIN(ts)              AS session_start,
           MAX(ts)              AS session_end,
           COUNT(*)             AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM s GROUP BY user_id, sid
    """,
)
def x_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from eth_indexer_spark.streaming.windows import sessionize_batch

    e = _t(spark, sf_dir, "events").select("user_id", "ts", "value")
    return sessionize_batch(e, gap_minutes=30.0)


@register(
    "x_curation_pipeline",
    """
    WITH m AS (
        SELECT doc_id, text,
               len(regexp_split_to_array(text, '\\s+')) AS t,
               len(regexp_extract_all(text, '[a-zA-Z]')) * 1.0 / length(text) AS alpha,
               len(list_filter(string_split(lower(text), ' '),
                               w -> w IN ('the','a','and','of','to','in','is','it','that','for'))) * 1.0
               / len(string_split(lower(text), ' ')) AS stop
        FROM documents
    ),
    scored AS (
        SELECT doc_id, text,
               ROUND(0.4 * LEAST(t / 64.0, 1.0)
                     + 0.4 * ROUND(alpha, 4)
                     + 0.2 * LEAST(ROUND(stop, 4) * 5, 1.0), 5) AS quality
        FROM m
    ),
    kept AS (
        SELECT doc_id, text FROM scored WHERE quality >= 0.5
        UNION ALL
        SELECT doc_id + 100000, text FROM scored WHERE quality >= 0.5
    )
    SELECT md5(text) AS digest, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
    FROM kept GROUP BY md5(text)
    """,
)
def x_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation composition — the everyday shape of a
    training-data pipeline: score quality → filter → exact-dedup the
    survivors (keep the min-id canonical copy). Stage order matters at
    scale: the cheap pure-expression quality filter runs BEFORE the
    shuffle-bearing dedup, so the one shuffle moves only surviving docs.
    Duplicates are planted by doubling the kept set (id+100000), mirroring
    `_doubled_docs`."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "text", tx.quality_score("text").alias("quality")
    )
    kept = d.filter(F.col("quality") >= 0.5).select("doc_id", "text")
    doubled = kept.unionByName(
        kept.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    )
    return dedup.exact_dedup(doubled, "text", "doc_id")


@register(
    "x_curation_v2",
    """
    WITH m AS (
        SELECT doc_id, source, text,
               len(regexp_split_to_array(text, '\\s+')) AS t,
               len(regexp_extract_all(text, '[a-zA-Z]')) * 1.0 / length(text) AS alpha,
               len(list_filter(string_split(lower(text), ' '),
                               w -> w IN ('the','a','and','of','to','in','is','it','that','for'))) * 1.0
               / len(string_split(lower(text), ' ')) AS stop
        FROM documents
    ),
    q AS (
        SELECT doc_id, source, text FROM m
        WHERE ROUND(0.4 * LEAST(t / 64.0, 1.0)
                    + 0.4 * ROUND(alpha, 4)
                    + 0.2 * LEAST(ROUND(stop, 4) * 5, 1.0), 5) >= 0.5
    ),
    docs2 AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM q),
    seg AS (
        SELECT doc_id, CAST(st // 3 AS BIGINT) AS pos,
               array_to_string(w[st+1 : st+3], ' ') AS line
        FROM (SELECT doc_id, w, unnest(range(0, len(w), 3)) AS st FROM docs2)
    ),
    hot AS (
        SELECT line FROM seg GROUP BY line HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    keptl AS (SELECT * FROM seg WHERE line NOT IN (SELECT line FROM hot)),
    clean AS (
        SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS ct
        FROM keptl GROUP BY doc_id
    ),
    tok AS (
        SELECT c.doc_id, q.source,
               len(regexp_split_to_array(c.ct, '\\s+')) AS n_tokens,
               md5(CAST(c.doc_id AS VARCHAR)) || CAST(c.doc_id AS VARCHAR) AS k
        FROM clean c JOIN q ON c.doc_id = q.doc_id
    ),
    cum AS (
        SELECT doc_id, source, n_tokens,
               SUM(n_tokens) OVER (PARTITION BY source ORDER BY k
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM tok
    )
    SELECT doc_id, source, n_tokens, CAST(cum AS BIGINT) AS cum_tokens
    FROM cum WHERE cum <= 400
    """,
)
def x_curation_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full curation composition over the round-5 stages: quality filter →
    corpus-wide line dedup → per-source token-budget sample. Stage order is
    the 100 TB order: the pure-expression quality filter cuts the corpus
    BEFORE the line-dedup shuffles, and the budget sampler runs last on the
    cleaned token counts (its grouped prefix sum touches only survivors).
    Every stage is the already-oracle-checked operator (`x_text_quality`,
    `x_line_dedup`, `x_budget_sample`); this query pins their composition."""
    from eth_indexer_spark.operators.sampling import token_budget_sample

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", "text", tx.quality_score("text").alias("quality")
    )
    kept = d.filter(F.col("quality") >= 0.5).select("doc_id", "source", "text")
    # let-bound split (dedup._bind): the spliced form re-evaluates the
    # split per line position, O(words·len) per doc — see word_shingles
    seglines = dedup._bind(
        F.split(F.col("text"), " "),
        lambda words: F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.size(words) - 1, F.lit(3)),
                lambda st: F.concat_ws(" ", F.slice(words, st + 1, 3)),
            ),
            "\n",
        ),
    )
    cleaned = dedup.line_dedup(
        kept.select("doc_id", seglines.alias("text")), "text", "doc_id", min_df=2
    )
    scored = cleaned.join(kept.select("doc_id", "source"), "doc_id").select(
        "doc_id", "source", tx.token_count("clean_text").alias("n_tokens")
    )
    return token_budget_sample(
        scored, "doc_id", "source", "n_tokens", budget=400, reuse_upstream=True
    )


@register(
    "x_corpus_stats",
    """
    WITH c AS (
        SELECT doc_id, text,
               string_split(lower(text), ' ') AS w,
               len(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]')) AS cjk
        FROM documents
    ),
    m AS (
        SELECT doc_id, text, cjk,
               len(list_filter(w, x -> x IN ('the','and','of','is','to')))   AS c_en,
               len(list_filter(w, x -> x IN ('le','la','et','les','des')))   AS c_fr,
               len(list_filter(w, x -> x IN ('el','la','los','que','de')))   AS c_es,
               len(list_filter(w, x -> x IN ('der','die','und','das','ist'))) AS c_de
        FROM c
    ),
    langed AS (
        SELECT doc_id, text,
               CASE WHEN cjk > 0 THEN 'zh'
                    WHEN GREATEST(c_en, c_fr, c_es, c_de) = 0 THEN 'und'
                    WHEN c_en = GREATEST(c_en, c_fr, c_es, c_de) THEN 'en'
                    WHEN c_fr = GREATEST(c_en, c_fr, c_es, c_de) THEN 'fr'
                    WHEN c_es = GREATEST(c_en, c_fr, c_es, c_de) THEN 'es'
                    WHEN c_de = GREATEST(c_en, c_fr, c_es, c_de) THEN 'de'
                    ELSE 'und' END AS lang_pred
        FROM m
    )
    SELECT lang_pred,
           COUNT(*)                                                  AS n_docs,
           CAST(SUM(len(regexp_split_to_array(text, '\\s+'))) AS BIGINT) AS total_tokens,
           ROUND(AVG(len(regexp_split_to_array(text, '\\s+'))), 2)   AS avg_tokens
    FROM langed GROUP BY lang_pred
    """,
)
def x_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus report: per-language document counts and token totals — the
    dataset-card aggregation every corpus release runs. Pure expressions +
    one partial-aggregated groupBy on a low-cardinality key; at 100 TB this
    is a single map-side-combined pass."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(
            tx.lang_id("text").alias("lang_pred"),
            tx.token_count("text").alias("n_tok"),
        )
        .groupBy("lang_pred")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            F.round(F.avg("n_tok"), 2).alias("avg_tokens"),
        )
    )


@register(
    "x_corpus_split",
    """
    SELECT doc_id,
           CASE WHEN b < 98 THEN 'train'
                WHEN b < 99 THEN 'val'
                ELSE 'test' END AS split
    FROM (
        SELECT doc_id,
               CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS UBIGINT)
               % 100 AS b
        FROM documents
    )
    """,
)
def x_corpus_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment by md5 id-bucket
    (operators/sampling.py): stable under re-runs and engine-portable —
    which is exactly why it hash-matches a plain-SQL oracle. Zero-shuffle
    projection; the 100 TB cost is one column."""
    from eth_indexer_spark.operators.sampling import split_corpus

    d = _t(spark, sf_dir, "documents").select("doc_id")
    return split_corpus(d, "doc_id")


@register(
    "x_corpus_mix",
    """
    SELECT doc_id, source
    FROM (
        SELECT doc_id, source,
               CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS UBIGINT)
               % 10000 AS b
        FROM documents
    )
    WHERE b < CASE source
                  WHEN 'src0' THEN 10000
                  WHEN 'src1' THEN 5000
                  WHEN 'src2' THEN 2500
                  ELSE 1000 END
    """,
)
def x_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus mixing (operators/sampling.py:weighted_mix):
    per-source keep rates by md5 id-threshold — keep all of src0, half of
    src1, a quarter of src2, 10% of everything else. Pure zero-shuffle
    filter, RNG-free (re-runs and engines agree on the kept set, and lower
    rates select nested subsets), hence fully oracle-checkable — the
    properties RNG sampling can never give a 100 TB mixing sweep."""
    from eth_indexer_spark.operators.sampling import weighted_mix

    d = _t(spark, sf_dir, "documents").select("doc_id", "source")
    return weighted_mix(
        d, "doc_id", "source",
        {"src0": 1.0, "src1": 0.5, "src2": 0.25},
        default_rate=0.1,
    )


@register("x_temperature_mix")  # per-group rates embed driver-side **alpha
# float literals → rows-only check (the DSIR convention); pytest pins the
# kept set bit-exactly against a sequential Python model instead
def x_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source rebalancing (operators/sampling.py:
    temperature_mix — the mT5/XLM-R multilingual sampling standard): keep
    half the corpus with per-source shares proportional to p^0.5, so
    small sources are up-weighted. One skinny source-count groupBy
    (bounded collect), deterministic water-filling for capped groups,
    then the zero-shuffle md5-threshold filter."""
    from eth_indexer_spark.operators.sampling import temperature_mix

    d = _t(spark, sf_dir, "documents").select("doc_id", "source")
    return temperature_mix(
        d, "doc_id", "source", alpha=0.5, target_fraction=0.5
    )


@register(
    "x_pack_sequences",
    """
    WITH t AS (
        SELECT doc_id, len(regexp_split_to_array(text, '\\s+')) AS n_tokens
        FROM documents
    ),
    c AS (
        SELECT doc_id, n_tokens,
               SUM(n_tokens) OVER (ORDER BY doc_id) AS end_tok
        FROM t WHERE n_tokens > 0
    )
    SELECT doc_id,
           n_tokens,
           CAST((end_tok - n_tokens) // 512 AS BIGINT) AS start_pack,
           CAST((end_tok - n_tokens) % 512 AS BIGINT)  AS start_offset,
           CAST((end_tok - 1) // 512 AS BIGINT)        AS end_pack,
           CAST((end_tok - 1) // 512
                - (end_tok - n_tokens) // 512 + 1 AS BIGINT) AS n_packs
    FROM c
    """,
)
def x_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (operators/packing.py): concat-and-cut placement of
    every document into fixed 512-token training sequences. The global
    order is doc_id; the placement is pure arithmetic over the exclusive
    prefix sum of token counts, computed with the two-phase distributed
    prefix sum (operators/prefix_sum.py) — one range shuffle at any corpus
    size, never a single-task global window."""
    from eth_indexer_spark.operators.packing import pack_sequences

    d = _t(spark, sf_dir, "documents")
    return pack_sequences(
        d.select("doc_id", tx.token_count("text").alias("n_tok")),
        "doc_id",
        "n_tok",
        seq_len=512,
    )


@register(
    "x_vocab_topk",
    """
    SELECT w AS word, COUNT(*) AS n
    FROM (SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents)
    WHERE w <> ''
    GROUP BY w ORDER BY n DESC, w LIMIT 50
    """,
)
def x_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary head: top-50 tokens by frequency — the first pass of every
    tokenizer/BPE build. explode → partially-aggregated groupBy →
    TakeOrderedAndProject; the shuffle carries one row per DISTINCT word
    (map-side combine), not one per token."""
    d = _t(spark, sf_dir, "documents")
    words = d.select(
        F.explode(F.split(F.lower("text"), " ")).alias("word")
    ).filter(F.col("word") != "")
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "word")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# Curation hardening: decontamination, repetition filters, stratified audit
# samples, dataset-card quantiles, k-means clustering (round 5 additions).
# These register past the driver's 50-entry bound; tests/test_oracle_parity.py
# runs the full rows+schema+hash check on every oracle-backed entry regardless.
# ---------------------------------------------------------------------------


@register(
    "x_decontaminate",
    """
    WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (
        SELECT doc_id,
               list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
                              for i in range(1, len(w) - 2)]) AS g
        FROM docs WHERE len(w) >= 4
    ),
    bench AS (SELECT DISTINCT unnest(g) AS gram FROM sh WHERE doc_id % 97 = 0),
    e AS (SELECT doc_id, unnest(g) AS gram FROM sh WHERE doc_id % 97 <> 0),
    hits AS (SELECT DISTINCT e.doc_id FROM e JOIN bench USING (gram))
    SELECT d.doc_id, CAST(h.doc_id IS NOT NULL AS INT) AS contaminated
    FROM (SELECT doc_id FROM documents WHERE doc_id % 97 <> 0) d
    LEFT JOIN hits h USING (doc_id)
    """,
)
def x_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (operators/decontam.py): flag training
    documents sharing any 4-gram with a held-out benchmark slice
    (doc_id % 97 — a deterministic eval-set stand-in; production uses
    ~13-grams against real eval suites). The benchmark gram set is
    broadcast, so the corpus side is a map-only scan — no corpus shuffle."""
    from eth_indexer_spark.operators import decontam

    d = _t(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 97 == 0)
    corpus = d.filter(F.col("doc_id") % 97 != 0).select("doc_id", "text")
    flags = decontam.contamination_flags(corpus, bench, "text", "doc_id", k=4)
    return flags.select(
        "doc_id", F.col("contaminated").cast("int").alias("contaminated")
    )


@register(
    "x_contamination_report",
    """
    WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (
        SELECT doc_id,
               list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
                              for i in range(1, len(w) - 2)]) AS g
        FROM docs WHERE len(w) >= 4
    ),
    bench AS (SELECT DISTINCT unnest(g) AS gram FROM sh WHERE doc_id % 97 = 0),
    e AS (SELECT doc_id, unnest(g) AS gram FROM sh WHERE doc_id % 97 <> 0),
    per AS (
        SELECT e.doc_id, COUNT(*) AS n_grams,
               SUM(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END) AS n_hit
        FROM e LEFT JOIN bench b USING (gram) GROUP BY e.doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(per.n_grams, 0) AS BIGINT) AS n_grams,
           CAST(COALESCE(per.n_hit, 0) AS BIGINT) AS n_hit_grams,
           CASE WHEN COALESCE(per.n_grams, 0) > 0
                THEN ROUND(per.n_hit * 1.0 / per.n_grams, 4) ELSE 0.0 END
               AS overlap_frac,
           COALESCE(per.n_hit, 0) > 0 AS contaminated
    FROM (SELECT doc_id FROM documents WHERE doc_id % 97 <> 0) d
    LEFT JOIN per USING (doc_id)
    """,
)
def x_contamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination severity report (operators/decontam.py:
    contamination_report): per-document benchmark-overlap fraction — the
    threshold-picking audit that precedes the binary decontaminate drop.
    Same benchmark stand-in and gram size as x_decontaminate (4-grams,
    doc_id % 97 slice); the hit marking rides the single exploded gram
    stream, so the corpus is scanned once."""
    from eth_indexer_spark.operators import decontam

    d = _t(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 97 == 0)
    corpus = d.filter(F.col("doc_id") % 97 != 0).select("doc_id", "text")
    return decontam.contamination_report(corpus, bench, "text", "doc_id", k=4)


@register(
    "x_quality_repetition",
    """
    WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    g AS (
        SELECT doc_id, [w[i] || ' ' || w[i+1] for i in range(1, len(w))] AS grams
        FROM docs WHERE len(w) >= 2
    ),
    e AS (SELECT doc_id, unnest(grams) AS gram FROM g),
    per AS (SELECT doc_id, gram, COUNT(*) AS c FROM e GROUP BY doc_id, gram),
    agg AS (SELECT doc_id, MAX(c) AS top_cnt, SUM(c) AS total FROM per GROUP BY doc_id)
    SELECT d.doc_id,
           COALESCE(ROUND(1.0 - len(list_distinct(g.grams)) * 1.0 / len(g.grams), 4),
                    0.0) AS dup_ngram_frac,
           COALESCE(ROUND(agg.top_cnt * 1.0 / agg.total, 4), 0.0) AS top_ngram_frac
    FROM documents d
    LEFT JOIN g USING (doc_id)
    LEFT JOIN agg USING (doc_id)
    """,
)
def x_quality_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition metrics (operators/quality.py): duplicate
    bigram fraction (pure expression) + top-bigram dominance (skinny
    doc-id-keyed groupBys) per document — the highest-yield removal class
    after exact dedup."""
    from eth_indexer_spark.operators import quality

    d = _t(spark, sf_dir, "documents")
    return quality.repetition_stats(d, "text", "doc_id", n=2)


@register(
    "x_lm_unigram_score",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    counts AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok)
    SELECT t.doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM(CASE WHEN c.cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
           CAST(SUM(CASE WHEN c.cnt IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
           ROUND(CAST(SUM(COALESCE(c.cnt, 0)) AS DOUBLE) / COUNT(*), 4)
               AS avg_token_df
    FROM toks t LEFT JOIN counts c USING (tok)
    GROUP BY t.doc_id
    """,
)
def x_lm_unigram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LM quality scoring (operators/quality.py:unigram_lm_score — the
    CCNet signal on corpus-trained unigram statistics): per-document token
    commonness under the corpus vocabulary, hapax and OOV counts. Exact
    integer aggregates + one final division, so the corpus-wide statistic
    is still fully oracle-checked."""
    from eth_indexer_spark.operators import quality

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return quality.unigram_lm_score(d, "text", "doc_id")


@register(
    "x_quality_gopher",
    """
    WITH m AS (
        SELECT doc_id, text,
               regexp_split_to_array(trim(text), '\\s+') AS w,
               string_split(text, chr(10)) AS lines
        FROM documents
    ),
    s AS (
        SELECT doc_id,
               CASE WHEN length(trim(text)) > 0 THEN len(w) ELSE 0 END AS n_words,
               list_sum(list_transform(w, x -> length(x))) AS char_sum,
               length(text) - length(replace(text, '#', ''))
                 + len(regexp_extract_all(text, '\\.{3}'))
                 + length(text) - length(replace(text, '…', '')) AS n_symbols,
               len(list_filter(lines,
                   l -> substr(ltrim(l), 1, 1) IN ('-', '*', '•'))) AS n_bullet,
               len(list_filter(lines,
                   l -> l LIKE '%...' OR l LIKE '%…')) AS n_ellip,
               len(lines) AS n_lines,
               len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) AS n_alpha,
               len(list_intersect(
                   list_distinct(list_transform(
                       regexp_split_to_array(trim(lower(text)), '\\s+'),
                       x -> regexp_replace(x, '^[^0-9a-z]+|[^0-9a-z]+$', '', 'g'))),
                   ['the', 'a'])) AS n_req_stopwords
        FROM m
    ),
    r AS (
        SELECT doc_id, n_words,
               CASE WHEN n_words > 0
                    THEN ROUND(char_sum * 1.0 / n_words, 4) ELSE 0.0 END
                   AS mean_word_len,
               CASE WHEN n_words > 0
                    THEN ROUND(n_symbols * 1.0 / n_words, 4) ELSE 0.0 END
                   AS symbol_ratio,
               CASE WHEN n_lines > 0
                    THEN ROUND(n_bullet * 1.0 / n_lines, 4) ELSE 0.0 END
                   AS bullet_line_frac,
               CASE WHEN n_lines > 0
                    THEN ROUND(n_ellip * 1.0 / n_lines, 4) ELSE 0.0 END
                   AS ellipsis_line_frac,
               CASE WHEN n_words > 0
                    THEN ROUND(n_alpha * 1.0 / n_words, 4) ELSE 0.0 END
                   AS alpha_word_frac,
               n_req_stopwords
        FROM s
    )
    SELECT doc_id, n_words, mean_word_len, symbol_ratio, bullet_line_frac,
           ellipsis_line_frac, alpha_word_frac, n_req_stopwords,
           (n_words >= 30 AND n_words <= 100000
            AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
            AND symbol_ratio <= 0.1 AND bullet_line_frac <= 0.9
            AND ellipsis_line_frac <= 0.3 AND alpha_word_frac >= 0.8
            AND n_req_stopwords >= 2) AS keep
    FROM r
    """,
)
def x_quality_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher rule-battery quality filter (operators/quality.py:
    gopher_rules — Rae et al. 2021 §A.1.1): word-count / mean-word-length /
    symbol-ratio / bullet / ellipsis / alpha-word / stopword rules with
    per-rule evidence columns and the keep verdict. Pure Column
    expressions — map-only, zero shuffle. The stopword set is adapted to
    the synthetic corpus's vocabulary ('the', 'a'); thresholds otherwise
    Gopher defaults except min_words=30 (the corpus median is ~50 words,
    so the default 50 would make the rule one-sided)."""
    from eth_indexer_spark.operators import quality

    d = _t(spark, sf_dir, "documents")
    return quality.gopher_rules(
        d, "text", "doc_id", min_words=30,
        required_stopwords=("the", "a"), min_required_stopwords=2,
    )


#: Shared synthesized-lines + C4 SQL prefix (docs → punctuated 4-word
#: lines → line filter → doc-level drops, ending in CTE ``c4 (doc_id, ct,
#: n_lines_kept)``) — interpolated into every oracle that consumes the
#: cleaned corpus so the line-synthesis scheme cannot drift between the
#: standalone query and compositions.
_C4_SQL_PREFIX = """docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    lines AS (
        SELECT doc_id,
               [array_to_string(w[st+1 : st+4], ' ')
                  || (CASE WHEN st % 12 < 8 THEN '.' ELSE '' END)
                for st in range(0, len(w), 4)] AS ls
        FROM docs
    ),
    keptl AS (
        SELECT doc_id,
               list_filter(ls, x ->
                   (x LIKE '%.' OR x LIKE '%!' OR x LIKE '%?' OR x LIKE '%"')
                   AND len(regexp_split_to_array(trim(x), '\\s+')) >= 3
                   AND NOT contains(lower(x), 'javascript')) AS ks,
               array_to_string(ls, chr(10)) AS full_text
        FROM lines
    ),
    c4 AS (
        SELECT doc_id, array_to_string(ks, chr(10)) AS ct, len(ks) AS n_lines_kept
        FROM keptl
        WHERE len(ks) >= 3
          AND NOT contains(lower(full_text), 'lorem ipsum')
          AND NOT contains(full_text, '{')
    )"""


def _synthesized_lines(d: DataFrame) -> DataFrame:
    """documents → deterministic punctuated 4-word "lines": the corpus is
    single-line word soup, so queries exercising line rules segment each
    doc into 4-word lines and punctuate two of every three (st % 12 < 8 —
    the same trick as x_line_dedup). Shared by x_c4_clean and
    x_curation_v4 so the scheme cannot drift from the oracles'."""
    # let-bound split — see word_shingles' docstring
    synth = dedup._bind(
        F.split(F.col("text"), " "),
        lambda words: F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.size(words) - 1, F.lit(4)),
                lambda st: F.concat(
                    F.concat_ws(" ", F.slice(words, st + 1, 4)),
                    F.when(st % 12 < 8, F.lit(".")).otherwise(F.lit("")),
                ),
            ),
            "\n",
        ),
    )
    return d.select("doc_id", synth.alias("text"))


@register(
    "x_c4_clean",
    "WITH " + _C4_SQL_PREFIX + """
    SELECT doc_id, ct AS clean_text, n_lines_kept FROM c4
    """,
)
def x_c4_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 line-level cleaning (operators/quality.py:c4_line_filter —
    Raffel et al. 2020 §2.2): terminal-punctuation + min-words-per-line +
    banned-token line rules, then the doc-level min-lines / lorem-ipsum /
    curly-brace drops. The corpus is single-line word soup, so the query
    segments each doc into 4-word lines and deterministically punctuates
    two of every three (st % 12 < 8 — the same synthesized-lines trick as
    x_line_dedup), giving every rule real work. Map-only, zero shuffle."""
    from eth_indexer_spark.operators import quality

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return quality.c4_line_filter(_synthesized_lines(d), "text", "doc_id")


@register(
    "x_cluster_keep_best",
    """
    WITH RECURSIVE docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (
        SELECT doc_id,
               list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                              for i in range(1, len(w) - 1)]) AS shingles
        FROM docs WHERE len(w) >= 3
    ),
    e0 AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
    keep AS (SELECT s FROM e0 GROUP BY s HAVING COUNT(*) <= 5),
    e AS (SELECT e0.doc_id, e0.s FROM e0 JOIN keep USING (s)),
    co AS (
        SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS inter
        FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM e GROUP BY doc_id),
    pairs AS (
        SELECT i, j
        FROM co JOIN sizes si ON i = si.doc_id JOIN sizes sj ON j = sj.doc_id
        WHERE inter * 1.0 / (si.n + sj.n - inter) >= 0.5
    ),
    ed AS (SELECT i AS u, j AS v FROM pairs UNION ALL SELECT j AS u, i AS v FROM pairs),
    reach(src, dst) AS (
        SELECT u, v FROM ed
        UNION
        SELECT r.src, ed.v FROM reach r JOIN ed ON r.dst = ed.u
    ),
    cl AS (SELECT src AS doc, LEAST(src, MIN(dst)) AS cluster FROM reach GROUP BY src),
    allc AS (
        SELECT d.doc_id AS doc, COALESCE(cl.cluster, d.doc_id) AS cluster
        FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc
    ),
    qm AS (
        SELECT doc_id,
               len(regexp_split_to_array(text, '\\s+')) AS t,
               len(regexp_extract_all(text, '[a-zA-Z]')) * 1.0 / length(text) AS alpha,
               len(list_filter(string_split(lower(text), ' '),
                               w -> w IN ('the','a','and','of','to','in','is','it','that','for'))) * 1.0
               / len(string_split(lower(text), ' ')) AS stop
        FROM documents
    ),
    q AS (
        SELECT doc_id,
               ROUND(0.4 * LEAST(t / 64.0, 1.0)
                     + 0.4 * ROUND(alpha, 4)
                     + 0.2 * LEAST(ROUND(stop, 4) * 5, 1.0), 5) AS quality
        FROM qm
    ),
    r AS (
        SELECT a.cluster, a.doc, q.quality,
               ROW_NUMBER() OVER (PARTITION BY a.cluster
                                  ORDER BY q.quality DESC, a.doc ASC) AS rk,
               COUNT(*) OVER (PARTITION BY a.cluster) AS n_members
        FROM allc a JOIN q ON a.doc = q.doc_id
    )
    SELECT cluster, doc AS keep_id, quality AS best_quality, n_members
    FROM r WHERE rk = 1
    """,
)
def x_cluster_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-document selection per duplicate cluster
    (operators/dedup.py:cluster_representatives): the same capped
    ngram-Jaccard pairs + connected components as x_dedup_clusters, then
    keep the highest-quality member of each cluster (ties to the smallest
    id) instead of the arbitrary min-id. One max(struct) aggregation with
    map-side combine — deliberately not a window, so a boilerplate
    mega-cluster cannot straggle a single task. Fully oracle-checked
    (recursive-CTE closure + window argmax on the DuckDB side)."""
    d = _t(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs_capped(
        d, "text", "doc_id", k=3, threshold=0.5, max_df=5
    )
    # quality rides the cluster-assignment pass (dedup_clusters
    # passthrough) and representatives reads it inline (scores=None):
    # one corpus scan and zero id-keyed re-join, vs the former second
    # scan + fact-fact join — same rows (r11 pin
    # test_keep_best_inline_scores_match_joined_form).
    cl = dedup.dedup_clusters(
        d.select("doc_id", tx.quality_score("text").alias("quality")),
        pairs,
        "doc_id",
        passthrough=("quality",),
    )
    return dedup.cluster_representatives(
        cl, None, "quality", id_col="doc"
    ).withColumnRenamed("best_score", "best_quality")


@register("x_dsir_select")  # weights embed driver-side math.log literals →
# rows-only check (DuckDB ln is not ulp-identical to Python's; pytest pins
# the weights bit-exactly against a sequential Python model instead)
def x_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR domain selection (operators/dsir.py, Xie et al. 2023): the 200
    raw documents (source != 'src0') whose hashed-bigram distribution best
    matches the src0 target domain, by add-one-smoothed log importance
    weight. Two skinny bucket-count aggregations + a broadcast ratio map +
    a map-only in-array-order weight sum; selection is
    TakeOrderedAndProject."""
    from eth_indexer_spark.operators.dsir import dsir_select

    d = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    target = d.filter(F.col("source") == "src0").select("doc_id", "text")
    raw = d.filter(F.col("source") != "src0").select("doc_id", "text")
    return dsir_select(raw, target, "text", "doc_id", k=200, n=2, num_buckets=1024)


@register(
    "x_sample_stratified",
    """
    SELECT lang, doc_id, smp_rank FROM (
        SELECT lang, doc_id,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS smp_rank
        FROM documents
    ) WHERE smp_rank <= 20
    """,
)
def x_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample (operators/sampling.py:
    stratified_sample): exactly 20 docs per language, ranked by md5(id) —
    uniform-ish yet RNG-free, nested across sizes, engine-portable (hence
    fully oracle-checked). WindowGroupLimit bounds what reaches the
    low-cardinality stratum reducers."""
    from eth_indexer_spark.operators.sampling import stratified_sample

    d = _t(spark, sf_dir, "documents").select("lang", "doc_id")
    return stratified_sample(d, "doc_id", "lang", 20, rank_col="smp_rank")


@register(
    "x_corpus_quantiles",
    """
    SELECT source,
           COUNT(*) AS n_docs,
           ROUND(quantile_cont(tc, 0.5), 4)  AS p50_tokens,
           ROUND(quantile_cont(tc, 0.9), 4)  AS p90_tokens,
           ROUND(quantile_cont(tc, 0.99), 4) AS p99_tokens
    FROM (
        SELECT source, len(regexp_split_to_array(text, '\\s+')) AS tc
        FROM documents
    )
    GROUP BY source
    """,
)
def x_corpus_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card length quantiles per source: EXACT percentiles
    (sort-based ``percentile``, not the sketch ``percentile_approx``) so the
    numbers are engine-reproducible and oracle-checked. Exactness costs one
    sort per group of a skinny (source, token-count) projection — the right
    trade for a once-per-release dataset card; the sketch is the
    every-batch monitoring path."""
    d = _t(spark, sf_dir, "documents")
    tc = d.select("source", tx.token_count("text").alias("tc"))
    return tc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.percentile("tc", F.lit(0.5)), 4).alias("p50_tokens"),
        F.round(F.percentile("tc", F.lit(0.9)), 4).alias("p90_tokens"),
        F.round(F.percentile("tc", F.lit(0.99)), 4).alias("p99_tokens"),
    )


@register("x_kmeans")  # iterative fixpoint → rows-only check (pytest pins
# determinism, label recovery, and inertia descent)
def x_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed k-means labels over the embedding corpus
    (operators/clustering.py): deterministic init (k lowest-id vectors),
    DECIMAL-exact centroid means (order-independent → bit-identical across
    runs/partitionings), assignment as a literal-centroid codegen scan.
    Lloyd's fixpoint is not ANSI-SQL-expressible, so the driver records a
    rows-only check; tests/test_extensions.py pins the semantics."""
    from eth_indexer_spark.operators.clustering import kmeans

    e = _t(spark, sf_dir, "embeddings")
    return kmeans(e, k=8, max_iter=10)


@register("x_ann_ivf_trained")  # depends on k-means fixpoint → rows-only
def x_ann_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF search over TRAINED coarse centroids (vs x_ann_ivf's lowest-id
    stand-ins): better-balanced lists, same probe-only scan shape. Recall
    vs the exact top-k is pinned by pytest."""
    from eth_indexer_spark.operators.clustering import ivf_topk_trained

    e = _t(spark, sf_dir, "embeddings")
    q = _query_vec(spark, sf_dir, 0)
    return ivf_topk_trained(
        e, q, k=10, nlist=16, nprobe=4, max_iter=5, exclude_id=0
    ).select("vec_id")


@register(
    "x_chunk_documents",
    """
    WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    s AS (
        SELECT doc_id, w, unnest(range(0, GREATEST(len(w) - 16 - 1, 0) + 1, 48)) AS st
        FROM docs WHERE len(w) > 0
    )
    SELECT doc_id,
           CAST(st // 48 AS BIGINT) AS chunk_idx,
           array_to_string(w[st+1 : st+64], ' ') AS chunk_text,
           CAST(LEAST(64, len(w) - st) AS BIGINT) AS n_chunk_tokens
    FROM s
    """,
)
def x_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking (operators/packing.py:chunk_documents):
    64-token chunks, 16-token overlap — the RAG/long-doc context-window
    cutter. Pure per-row expressions (no shuffle, no UDF), deterministic →
    fully oracle-checked."""
    from eth_indexer_spark.operators.packing import chunk_documents

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return chunk_documents(d, "text", "doc_id", chunk_tokens=64, overlap=16)


@register(
    "x_dedup_incremental",
    """
    WITH idx AS (
        SELECT DISTINCT md5(text) AS digest FROM documents WHERE doc_id % 2 = 0
    ),
    batch AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 100000 AS doc_id, text FROM documents
    ),
    fresh AS (
        SELECT md5(b.text) AS digest, b.doc_id
        FROM batch b LEFT JOIN idx ON md5(b.text) = idx.digest
        WHERE idx.digest IS NULL
    )
    SELECT digest, MIN(doc_id) AS keep_id FROM fresh GROUP BY digest
    """,
)
def x_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental exact dedup (operators/dedup.py:incremental_dedup): a new
    batch (corpus ∪ shifted copies) dedups against an existing digest index
    (the even-id half) — one LeftAnti + one groupBy per batch, never a
    full-corpus re-dedup. The streaming/append-corpus form of
    x_dedup_exact."""
    from eth_indexer_spark.operators import dedup as dd

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    index = (
        d.filter(F.col("doc_id") % 2 == 0)
        .select(dd.content_digest("text").alias("digest"))
        .distinct()
    )
    return dd.incremental_dedup(_doubled_docs(spark, sf_dir), index, "text", "doc_id")


@register(
    "x_budget_sample",
    """
    WITH scored AS (
        SELECT doc_id, source,
               len(regexp_split_to_array(text, '\\s+')) AS n_tokens,
               md5(CAST(doc_id AS VARCHAR)) || CAST(doc_id AS VARCHAR) AS k
        FROM documents
    ),
    c AS (
        SELECT doc_id, source, n_tokens,
               SUM(n_tokens) OVER (PARTITION BY source ORDER BY k
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM scored
    )
    SELECT doc_id, source, n_tokens, CAST(cum AS BIGINT) AS cum_tokens
    FROM c WHERE cum <= 800
    """,
)
def x_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sampling (operators/sampling.py:token_budget_sample):
    keep md5-ordered documents per source until each source hits an 800-token
    budget — the absolute-budget corpus spec ("N tokens of web, M of code"),
    RNG-free and engine-portable. The cumulative count runs as the GROUPED
    two-phase prefix sum, so the oracle's per-source window (one task per
    source — unusable with 20 sources at 100 TB) is replaced by a
    literal-boundary bucket exchange + broadcast offsets."""
    from eth_indexer_spark.operators.sampling import token_budget_sample

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", tx.token_count("text").alias("n_tokens")
    )
    return token_budget_sample(d, "doc_id", "source", "n_tokens", budget=800)


@register(
    "x_line_dedup",
    """
    WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    seg AS (
        SELECT doc_id, CAST(st // 3 AS BIGINT) AS pos,
               array_to_string(w[st+1 : st+3], ' ') AS line
        FROM (SELECT doc_id, w, unnest(range(0, len(w), 3)) AS st FROM docs)
    ),
    hot AS (
        SELECT line FROM seg GROUP BY line HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    kept AS (SELECT * FROM seg WHERE line NOT IN (SELECT line FROM hot))
    SELECT doc_id,
           string_agg(line, chr(10) ORDER BY pos) AS clean_text,
           COUNT(*) AS n_lines_kept
    FROM kept GROUP BY doc_id
    """,
)
def x_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide line dedup (operators/dedup.py:line_dedup — the
    RefinedWeb boilerplate scrub): documents are segmented into 3-word
    "lines" (the corpus is single-line word soup, so segments stand in for
    real lines), every line occurring in ≥2 distinct docs is dropped
    everywhere, and docs are reassembled from the survivors in order. The
    oracle's NOT IN is the LeftAnti the Spark plan runs on md5(line)."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    # let-bound split — see word_shingles' docstring
    seglines = dedup._bind(
        F.split(F.col("text"), " "),
        lambda words: F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.size(words) - 1, F.lit(3)),
                lambda st: F.concat_ws(" ", F.slice(words, st + 1, 3)),
            ),
            "\n",
        ),
    )
    d2 = d.select("doc_id", seglines.alias("text"))
    return dedup.line_dedup(d2, "text", "doc_id", min_df=2)


@register(
    "x_substring_dedup",
    """
    WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    grams AS (
        SELECT doc_id, spos, array_to_string(w[spos+1 : spos+8], ' ') AS gram
        FROM (
            SELECT doc_id, w, unnest(range(0, len(w) - 8 + 1)) AS spos
            FROM docs WHERE len(w) >= 8
        )
    ),
    hot AS (SELECT gram FROM grams GROUP BY gram HAVING COUNT(*) >= 2),
    dup AS (SELECT doc_id, spos FROM grams WHERE gram IN (SELECT gram FROM hot)),
    toks AS (
        SELECT doc_id, unnest(w) AS tok, unnest(range(len(w))) AS pos FROM docs
    ),
    kept AS (
        SELECT t.doc_id, t.pos, t.tok
        FROM toks t
        WHERE NOT EXISTS (
            SELECT 1 FROM dup d
            WHERE d.doc_id = t.doc_id AND d.spos <= t.pos AND t.pos < d.spos + 8
        )
    )
    SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
           COUNT(*) AS n_tokens_kept
    FROM kept GROUP BY doc_id
    """,
)
def x_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring dedup (operators/dedup.py:substring_dedup — the
    Lee et al. 2021 EXACTSUBSTR curation step in gram form): every 8-token
    span occurring ≥ 2 times anywhere in the corpus is excised from every
    document, survivors reassembled in order, fully-excised documents
    dropped. The oracle spells out the per-token coverage test the Spark
    plan runs as pure array expressions after one digest groupBy."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return dedup.substring_dedup(d, "text", "doc_id", min_len=8, min_count=2)


@register(
    "x_curation_v3",
    """
    WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (
        SELECT doc_id,
               list_distinct([array_to_string(w[i : i+3], ' ')
                              for i in range(1, len(w) - 2)]) AS g
        FROM docs WHERE len(w) >= 4
    ),
    bench AS (SELECT DISTINCT unnest(g) AS gram FROM sh WHERE doc_id % 97 = 0),
    e AS (SELECT doc_id, unnest(g) AS gram FROM sh WHERE doc_id % 97 <> 0),
    hits AS (SELECT DISTINCT e.doc_id FROM e JOIN bench USING (gram)),
    surv AS (
        SELECT d.doc_id, d.text FROM documents d LEFT JOIN hits h USING (doc_id)
        WHERE d.doc_id % 97 <> 0 AND h.doc_id IS NULL
    ),
    docs2 AS (SELECT doc_id, string_split(text, ' ') AS w FROM surv),
    grams AS (
        SELECT doc_id, spos, array_to_string(w[spos+1 : spos+8], ' ') AS gram
        FROM (
            SELECT doc_id, w, unnest(range(0, len(w) - 8 + 1)) AS spos
            FROM docs2 WHERE len(w) >= 8
        )
    ),
    hot AS (SELECT gram FROM grams GROUP BY gram HAVING COUNT(*) >= 2),
    dup AS (SELECT doc_id, spos FROM grams WHERE gram IN (SELECT gram FROM hot)),
    toks AS (
        SELECT doc_id, unnest(w) AS tok, unnest(range(len(w))) AS pos FROM docs2
    ),
    kept AS (
        SELECT t.doc_id, t.pos, t.tok FROM toks t
        WHERE NOT EXISTS (
            SELECT 1 FROM dup d
            WHERE d.doc_id = t.doc_id AND d.spos <= t.pos AND t.pos < d.spos + 8
        )
    ),
    cleaned AS (
        SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
               COUNT(*) AS n_tokens_kept
        FROM kept GROUP BY doc_id
    ),
    toks3 AS (
        SELECT doc_id, unnest(string_split(clean_text, ' ')) AS tok FROM cleaned
    ),
    cnts AS (SELECT tok, COUNT(*) AS cnt FROM toks3 GROUP BY tok),
    lm AS (
        SELECT t.doc_id,
               ROUND(CAST(SUM(COALESCE(c.cnt, 0)) AS DOUBLE) / COUNT(*), 4)
                   AS avg_token_df
        FROM toks3 t LEFT JOIN cnts c USING (tok) GROUP BY t.doc_id
    )
    SELECT c.doc_id, c.clean_text, c.n_tokens_kept, lm.avg_token_df
    FROM cleaned c JOIN lm USING (doc_id)
    WHERE lm.avg_token_df >= 810.0
    """,
)
def x_curation_v3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-6 curation composition: benchmark decontamination (drop docs
    sharing any 4-gram with the doc_id % 97 eval slice) → exact substring
    dedup (duplicated 8-token spans excised corpus-wide) → LM quality
    filter (keep docs whose CLEANED text scores ≥ 810 mean token
    commonness under the cleaned corpus's own unigram stats). Stage order
    is the 100 TB order: the map-only decontamination scan cuts the corpus
    before the dedup shuffles, and the LM statistics are trained on the
    text that survives — not on what dedup is about to remove. Every stage
    is an already-oracle-checked operator (`x_decontaminate`,
    `x_substring_dedup`, `x_lm_unigram_score`); this query pins their
    composition end-to-end."""
    from eth_indexer_spark.operators import decontam, quality

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    bench = d.filter(F.col("doc_id") % 97 == 0)
    corpus = d.filter(F.col("doc_id") % 97 != 0)
    # both pool-persisted: substring_dedup consumes its input three times
    # (token base + two gram-stream consumers) and the LM stage consumes
    # the deduped frame three more — without the persists the decontam
    # explode+join lineage re-executes ~6× and dominates the query
    survivors = persist_bounded(
        "extensions.curation_v3.survivors",
        decontam.decontaminate(corpus, bench, "text", "doc_id", k=4),
    )
    deduped = persist_bounded(
        "extensions.curation_v3.deduped",
        dedup.substring_dedup(survivors, "text", "doc_id", min_len=8),
    )
    scored = quality.unigram_lm_score(deduped, "clean_text", "doc_id")
    return (
        deduped.join(scored.select("doc_id", "avg_token_df"), "doc_id")
        .filter(F.col("avg_token_df") >= 810.0)
        .select("doc_id", "clean_text", "n_tokens_kept", "avg_token_df")
    )


#: v4 pipeline SQL core shared by x_curation_v4 and x_curation_funnel:
#: the cleaned corpus (`c4`), the Gopher survivors (`gr`), and the
#: per-doc contamination counts (`per`) and the final decontaminated
#: output (`fin`) — both consumers read `fin`, so the final-stage
#: predicate exists exactly once.
_V4_SQL_CORE = "WITH " + _C4_SQL_PREFIX + """,
    gm AS (
        SELECT doc_id, ct, n_lines_kept,
               regexp_split_to_array(trim(ct), '\\s+') AS w2,
               string_split(ct, chr(10)) AS ls2
        FROM c4
    ),
    gs AS (
        SELECT doc_id, ct, n_lines_kept,
               CASE WHEN length(trim(ct)) > 0 THEN len(w2) ELSE 0 END AS n_words,
               list_sum(list_transform(w2, x -> length(x))) AS char_sum,
               length(ct) - length(replace(ct, '#', ''))
                 + len(regexp_extract_all(ct, '\\.{3}'))
                 + length(ct) - length(replace(ct, '…', '')) AS n_symbols,
               len(list_filter(ls2, l -> substr(ltrim(l), 1, 1) IN ('-', '*', '•'))) AS n_bullet,
               len(list_filter(ls2, l -> l LIKE '%...' OR l LIKE '%…')) AS n_ellip,
               len(ls2) AS n_lines,
               len(list_filter(w2, x -> regexp_matches(x, '[A-Za-z]'))) AS n_alpha,
               len(list_intersect(
                   list_distinct(list_transform(
                       regexp_split_to_array(trim(lower(ct)), '\\s+'),
                       x -> regexp_replace(x, '^[^0-9a-z]+|[^0-9a-z]+$', '', 'g'))),
                   ['the', 'a'])) AS n_req
        FROM gm
    ),
    gr AS (
        SELECT doc_id, ct, n_lines_kept, n_words FROM (
            SELECT *,
                CASE WHEN n_words > 0 THEN ROUND(char_sum * 1.0 / n_words, 4) ELSE 0.0 END AS mwl,
                CASE WHEN n_words > 0 THEN ROUND(n_symbols * 1.0 / n_words, 4) ELSE 0.0 END AS sr,
                CASE WHEN n_lines > 0 THEN ROUND(n_bullet * 1.0 / n_lines, 4) ELSE 0.0 END AS bf,
                CASE WHEN n_lines > 0 THEN ROUND(n_ellip * 1.0 / n_lines, 4) ELSE 0.0 END AS ef,
                CASE WHEN n_words > 0 THEN ROUND(n_alpha * 1.0 / n_words, 4) ELSE 0.0 END AS af
            FROM gs
        )
        WHERE n_words >= 20 AND n_words <= 100000
          AND mwl >= 3.0 AND mwl <= 10.0 AND sr <= 0.1
          AND bf <= 0.9 AND ef <= 0.3 AND af >= 0.8 AND n_req >= 1
    ),
    sh AS (
        SELECT doc_id,
               list_distinct([wc[i] || ' ' || wc[i+1] || ' ' || wc[i+2]
                              for i in range(1, len(wc) - 1)]) AS g4
        FROM (SELECT doc_id,
                     string_split(replace(replace(ct, '.', ''), chr(10), ' '), ' ') AS wc
              FROM gr)
        WHERE len(wc) >= 3
    ),
    bench AS (SELECT DISTINCT unnest(g4) AS gram FROM sh WHERE doc_id % 97 = 0),
    e AS (SELECT doc_id, unnest(g4) AS gram FROM sh WHERE doc_id % 97 <> 0),
    per AS (
        SELECT e.doc_id, COUNT(*) AS n_grams,
               SUM(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END) AS n_hit
        FROM e LEFT JOIN bench b USING (gram) GROUP BY e.doc_id
    ),
    fin AS (
        SELECT g.doc_id, g.n_lines_kept, g.n_words,
               CAST(COALESCE(per.n_grams, 0) AS BIGINT) AS n_grams,
               CASE WHEN COALESCE(per.n_grams, 0) > 0
                    THEN ROUND(per.n_hit * 1.0 / per.n_grams, 4) ELSE 0.0 END
                   AS overlap_frac
        FROM gr g LEFT JOIN per USING (doc_id)
        WHERE g.doc_id % 97 <> 0
          AND (CASE WHEN COALESCE(per.n_grams, 0) > 0
                    THEN ROUND(per.n_hit * 1.0 / per.n_grams, 4) ELSE 0.0 END) <= 0.02
    )
    """


def _v4_stage_frames(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """The v4 pipeline's stage frames, shared by x_curation_v4 (final
    output) and x_curation_funnel (per-stage attrition counts): raw →
    C4-cleaned → Gopher survivors (pool-persisted) → eval-heldout corpus →
    decontaminated final."""
    from eth_indexer_spark.operators import decontam, quality

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    # cache barrier between the C4 stage and the Gopher battery: clean_text
    # is itself an expensive higher-order expression (synthesized lines →
    # per-line word-split filter → array_join), and without the barrier the
    # battery's metric references plus the pushed-down keep-filter
    # substitute that whole expression ~30× per raw row (measured in the
    # r10 before-plan: the scan-level Filter carries ~30 copies of the
    # synthesized-lines subtree). Materializing the survivors once cuts
    # x_curation_v4 ~25% (4/4 alternating fresh-process pairs, guide §4.4's
    # evaluate-once principle applied to interpreted HOFs, which get no
    # codegen CSE).
    # The cache rows additionally materialize the battery's three split
    # arrays (words / lines / word cores) next to the text: the battery
    # references its splits ~12x per row (each metric, then again inside
    # the pushed-down keep-filter — interpreted HOF children get no
    # codegen CSE), so pre-splitting once at materialization cuts the
    # per-row split count to 3 and every downstream reference to an O(1)
    # cached-array read, at the cost of wider cache rows (~3x the text
    # bytes — still the survivor set, not the raw corpus).
    c4 = quality.c4_line_filter(
        _synthesized_lines(d), "text", "doc_id"
    ).withColumnRenamed("clean_text", "text")
    cleaned = persist_bounded(
        "extensions.curation_v4.cleaned",
        c4.select(
            "doc_id",
            "text",
            "n_lines_kept",
            F.split(F.trim(F.col("text")), r"\s+").alias("__gwords"),
            F.split(F.col("text"), "\n").alias("__glines"),
            F.transform(
                F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
                lambda w: F.regexp_replace(w, r"^[^0-9a-z]+|[^0-9a-z]+$", ""),
            ).alias("__gcores"),
        ),
    )
    g = quality.gopher_rules(
        cleaned, "text", "doc_id",
        min_words=20, required_stopwords=("the", "a"), min_required_stopwords=1,
        passthrough=("text", "n_lines_kept"),
        words_col="__gwords", lines_col="__glines", word_cores_col="__gcores",
    )
    kept = persist_bounded(
        "extensions.curation_v4.kept",
        g.where(F.col("keep")).select("doc_id", "text", "n_lines_kept", "n_words"),
    )
    # gram comparison runs on punctuation/newline-normalized text: the
    # synthesized line punctuation is position-dependent, so raw cleaned
    # text would never share a 3-gram across documents
    norm = F.replace(
        F.replace(F.col("text"), F.lit("."), F.lit("")), F.lit("\n"), F.lit(" ")
    ).alias("text")
    bench = kept.filter(F.col("doc_id") % 97 == 0).select("doc_id", norm)
    corpus = kept.filter(F.col("doc_id") % 97 != 0)
    # hashed_grams=False: the hashed-gram default LOST the sf1 A/B inside
    # THIS composition (1/6 alternating pairs) while winning 6/6 on the
    # standalone report — here the gram stage is a small short-string
    # slice of a cached pipeline and the string form is cheaper (r10
    # Session 3; the kept-#7 "win-is-specific" precedent)
    rep = decontam.contamination_report(
        corpus.select("doc_id", norm), bench, "text", "doc_id", k=3,
        hashed_grams=False,
    )
    final = corpus.join(
        rep.where(F.col("overlap_frac") <= 0.02).select(
            "doc_id", "n_grams", "overlap_frac"
        ),
        "doc_id",
    ).select("doc_id", "n_lines_kept", "n_words", "n_grams", "overlap_frac")
    return {
        "raw": d, "c4_clean": cleaned, "gopher": kept,
        "eval_heldout": corpus, "decontaminated": final,
    }


@register(
    "x_curation_v4",
    _V4_SQL_CORE + """
    SELECT doc_id, n_lines_kept, n_words, n_grams, overlap_frac FROM fin
    """,
)
def x_curation_v4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-6 extended-session curation composition, built from this
    round's new operators: C4 line cleaning (on the synthesized punctuated
    4-word lines — same trick as x_c4_clean) → Gopher rule battery on the
    CLEANED text (zero-shuffle via the passthrough columns, no metrics
    re-join) → contamination severity vs the doc_id % 97 eval slice of the
    same cleaned corpus, keeping docs with ≤ 2% benchmark 3-gram overlap.
    Stage order is the 100 TB order: both map-only text filters cut the
    corpus BEFORE the one shuffle (the contamination gram aggregation),
    and the severity threshold demonstrates the report form doing what the
    binary decontaminate cannot — tolerating incidental overlap while
    dropping wholesale copies. Every stage is an already-oracle-checked
    operator; this query pins their composition end-to-end."""
    return _v4_stage_frames(spark, sf_dir)["decontaminated"]


@register(
    "x_curation_funnel",
    _V4_SQL_CORE + """
    SELECT '0_raw' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents
    UNION ALL
    SELECT '1_c4_clean', CAST(COUNT(*) AS BIGINT) FROM c4
    UNION ALL
    SELECT '2_gopher', CAST(COUNT(*) AS BIGINT) FROM gr
    UNION ALL
    SELECT '3_eval_heldout', CAST(COUNT(*) AS BIGINT) FROM gr WHERE doc_id % 97 <> 0
    UNION ALL
    SELECT '4_decontaminated', CAST(COUNT(*) AS BIGINT) FROM fin
    """,
)
def x_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset-card attrition funnel for the v4 pipeline (the
    RefinedWeb-style per-stage removal table): one row per stage with the
    surviving document count — raw corpus, after C4 line cleaning, after
    the Gopher rule battery, after holding out the eval slice, after the
    contamination-severity cut. Shares the exact stage frames with
    x_curation_v4 (and the SQL core with its oracle), so the funnel can
    never drift from the pipeline it describes. Each count is a map-side
    combined aggregate; the Gopher survivors are pool-persisted so the
    funnel costs one pass per stage, not one pipeline re-execution each."""
    frames = _v4_stage_frames(spark, sf_dir)
    order = ["raw", "c4_clean", "gopher", "eval_heldout", "decontaminated"]
    parts = [
        frames[name]
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(F.lit(f"{i}_{name}").alias("stage"), "n_docs")
        for i, name in enumerate(order)
    ]
    out = parts[0]
    for pdf in parts[1:]:
        out = out.unionByName(pdf)
    return out


@register(
    "x_substring_spans",
    """
    WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    grams AS (
        SELECT doc_id, spos, array_to_string(w[spos+1 : spos+8], ' ') AS gram
        FROM (
            SELECT doc_id, w, unnest(range(0, len(w) - 8 + 1)) AS spos
            FROM docs WHERE len(w) >= 8
        )
    ),
    hot AS (SELECT gram FROM grams GROUP BY gram HAVING COUNT(*) >= 2),
    dup AS (
        SELECT doc_id, spos, spos + 8 AS e
        FROM grams WHERE gram IN (SELECT gram FROM hot)
    ),
    m AS (
        SELECT doc_id, spos, e,
               MAX(e) OVER (PARTITION BY doc_id ORDER BY spos
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS pme
        FROM dup
    ),
    g AS (
        SELECT doc_id, spos, e,
               SUM(CASE WHEN pme IS NULL OR spos > pme THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY spos) AS grp
        FROM m
    ),
    spans AS (
        SELECT doc_id, grp, MIN(spos) AS span_start, MAX(e) AS span_end
        FROM g GROUP BY doc_id, grp
    )
    SELECT s.doc_id,
           CAST(s.span_start AS BIGINT) AS span_start,
           CAST(s.span_end AS BIGINT) AS span_end,
           CAST(s.span_end - s.span_start AS BIGINT) AS n_span_tokens,
           array_to_string(d.w[s.span_start+1 : s.span_end], ' ') AS span_text
    FROM spans s JOIN docs d USING (doc_id)
    """,
)
def x_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-span audit (operators/dedup.py:duplicated_spans): the
    maximal merged regions substring dedup would excise, with their text —
    the inspect-before-you-scrub report. Same gram machinery as
    `x_substring_dedup`; the interval merge is one window pass over the
    duplicated-start minority, parallel across documents."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return dedup.duplicated_spans(d, "text", "doc_id", min_len=8, min_count=2)


@register(
    "x_substring_dedup_incremental",
    """
    WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    grams AS (
        SELECT doc_id, spos, array_to_string(w[spos+1 : spos+8], ' ') AS gram
        FROM (
            SELECT doc_id, w, unnest(range(0, len(w) - 8 + 1)) AS spos
            FROM docs WHERE len(w) >= 8
        )
    ),
    hot AS (SELECT gram FROM grams GROUP BY gram HAVING COUNT(*) >= 2),
    dup AS (SELECT doc_id, spos FROM grams WHERE gram IN (SELECT gram FROM hot)),
    toks AS (
        SELECT doc_id, unnest(w) AS tok, unnest(range(len(w))) AS pos FROM docs
    ),
    kept AS (
        SELECT t.doc_id, t.pos, t.tok
        FROM toks t
        WHERE NOT EXISTS (
            SELECT 1 FROM dup d
            WHERE d.doc_id = t.doc_id AND d.spos <= t.pos AND t.pos < d.spos + 8
        )
    )
    SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
           COUNT(*) AS n_tokens_kept
    FROM kept WHERE doc_id % 4 = 0 GROUP BY doc_id
    """,
)
def x_substring_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Online EXACTSUBSTR (operators/dedup.py:incremental_substring_dedup):
    docs with ``doc_id % 4 != 0`` are the stored corpus, reduced to its
    skinny (gram-digest, count) index; every 4th doc arrives as a batch and
    is scrubbed against combined batch+index counts. The modulo split (the
    same convention as x_dedup_minhash_incremental) is scale-COVARIANT: the
    stored index grows with the corpus, so decade scaling runs measure
    index-side growth too, not just the batch. The oracle is batch-mode
    substring dedup over the WHOLE corpus restricted to the batch — the
    equality the incremental contract guarantees (coverage depends only on
    combined gram counts)."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.filter(F.col("doc_id") % 4 != 0)
    batch = d.filter(F.col("doc_id") % 4 == 0)
    index = dedup.substring_gram_index(corpus, "text", "doc_id", min_len=8)
    return dedup.incremental_substring_dedup(
        batch, index, "text", "doc_id", min_len=8, min_count=2
    )


@register(
    "x_pii_scrub",
    """
    WITH injected AS (
        SELECT doc_id,
               text || ' contact user' || doc_id || '@example.com at 10.1.'
                    || (doc_id % 256) || '.7 call 555-867-5309' AS text
        FROM documents
    ),
    s1 AS (
        SELECT doc_id, text,
               regexp_replace(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                   '<EMAIL>', 'g') AS t1
        FROM injected
    ),
    s2 AS (
        SELECT doc_id, text, t1,
               regexp_replace(t1,
                   '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b',
                   '<IP>', 'g') AS t2
        FROM s1
    )
    SELECT doc_id,
           regexp_replace(t2,
               '\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b', '<PHONE>', 'g') AS clean_text,
           len(regexp_extract_all(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_emails,
           len(regexp_extract_all(t1,
               '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS n_ips,
           len(regexp_extract_all(t2,
               '\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b')) AS n_phones
    FROM s2
    """,
)
def x_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (functions/text.py:scrub_pii): the corpus with a
    deterministic synthetic email/IP/phone injected per row (the raw corpus
    is PII-free, which would make the scrub a degenerate identity), then
    scrubbed to typed placeholder tokens with per-kind audit counts. Pure
    chained regexp_replace — map-only, no shuffle, no UDF."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    injected = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com at 10.1."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7 call 555-867-5309"),
    )
    d2 = d.select("doc_id", injected.alias("text"))
    return d2.select(
        "doc_id",
        tx.scrub_pii("text").alias("clean_text"),
        tx.pii_count("text", "email").alias("n_emails"),
        tx.pii_count("text", "ip").alias("n_ips"),
        tx.pii_count("text", "phone").alias("n_phones"),
    )


@register(
    "x_corpus_shuffle",
    """
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (
               ORDER BY md5(CAST(doc_id AS VARCHAR)) || CAST(doc_id AS VARCHAR)
           ) AS BIGINT) AS shuffle_pos
    FROM documents
    """,
)
def x_corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch-order shuffle (operators/sampling.py:
    shuffle_order): 1-based training positions by md5(id) rank, computed
    with the two-phase distributed prefix sum (literal-boundary buckets) —
    the oracle's single ROW_NUMBER window is exactly the single-task plan a
    100 TB corpus cannot run."""
    from eth_indexer_spark.operators.sampling import shuffle_order

    d = _t(spark, sf_dir, "documents").select("doc_id")
    return shuffle_order(d, "doc_id")


@register(
    "x_tokenize_vocab",
    """
    WITH counts AS (
        SELECT w AS word, COUNT(*) AS n
        FROM (SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents)
        WHERE w <> '' GROUP BY w
    ),
    vocab AS (
        SELECT word, CAST(ROW_NUMBER() OVER (ORDER BY n DESC, word) AS BIGINT) AS token_id
        FROM counts ORDER BY n DESC, word LIMIT 40
    ),
    toks AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word,
               generate_subscripts(string_split(lower(text), ' '), 1) AS pos
        FROM documents
    ),
    enc AS (
        SELECT t.doc_id, t.pos, COALESCE(v.token_id, 0) AS tid
        FROM toks t LEFT JOIN vocab v USING (word)
    )
    SELECT doc_id,
           string_agg(CAST(tid AS VARCHAR), ' ' ORDER BY pos) AS token_ids_str,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN tid = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_unk
    FROM enc GROUP BY doc_id
    """,
)
def x_tokenize_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary build + corpus encoding (operators/tokenize.py): top-40
    words by frequency get dense ids; every document encodes to its id
    stream via ONE broadcast vocabulary map — a zero-shuffle scan of the
    corpus (the oracle mirrors it with the explode-join-agg form, which is
    what the Spark side deliberately avoids at scale). token_ids are
    emitted space-joined so the value hash is list-representation-agnostic
    across engines."""
    from eth_indexer_spark.operators.tokenize import build_vocab, encode_documents

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.lower(F.col("text")).alias("text")
    )
    vocab = build_vocab(d, "text", vocab_size=40)
    enc = encode_documents(d, "text", "doc_id", vocab)
    return enc.select(
        "doc_id",
        F.array_join(
            F.transform("token_ids", lambda t: t.cast("string")), " "
        ).alias("token_ids_str"),
        "n_tokens",
        "n_unk",
    )


@register("x_semantic_dedup")  # k-means fixpoint dependent → rows-only
def x_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup composition (operators/clustering.py:semantic_dedup):
    k-means partition → within-cluster cosine pairs → connected-components
    labels. Run over the corpus ∪ perturbed copies (id+100000, scaled) so
    the semantic-duplicate groups are non-degenerate — the same planted-dup
    device as x_dedup_exact. Pytest pins that every planted pair lands in
    one sem_cluster and unrelated vectors stay apart.

    k is DERIVED (auto-k, k ≈ N/2000): at sf0.1 that equals the former
    pinned k=8; at ×10 the cluster count grows with the corpus so the
    within-cluster pair join stays O(N · cluster_size) instead of the
    pinned-k O(N²/k) — the fixed-k form measured ×16 per ×4-embedding
    decade before this changed."""
    from eth_indexer_spark.operators.clustering import semantic_dedup

    e = _t(spark, sf_dir, "embeddings")
    as_double = F.transform("embedding", lambda x: x.cast("double"))
    pert = e.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(as_double, lambda x: x * 1.01 + 0.001).alias("embedding"),
    )
    corpus = e.select("vec_id", as_double.alias("embedding")).unionByName(pert)
    return semantic_dedup(corpus, threshold=0.95, max_iter=5)


@register("x_text_winnow")  # hash-family dependent → rows-only check
def x_text_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash winnowing fingerprints per document (operators/dedup.py:
    winnow_fingerprints); output is the fingerprint-set size — the values
    depend on the xxhash64 family, so the driver records a rows-only check
    while tests/test_extensions.py pins the winnowing guarantee itself."""
    from eth_indexer_spark.operators.dedup import winnow_fingerprints

    d = _t(spark, sf_dir, "documents")
    fps = winnow_fingerprints(d, "text", "doc_id", k=8, window=4)
    return fps.select("doc", F.size("fingerprints").alias("n_fingerprints"))


@register("x_winnow_pairs")  # hash-family dependent → rows-only check
def x_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-overlap pairs by shared winnowing fingerprints
    (operators/dedup.py:winnow_overlap_pairs) — the plagiarism/boilerplate
    detector over the inverted fingerprint index with a hot-fingerprint cap
    (never a cross join). Pair membership depends on the xxhash64 family,
    so the driver records a rows-only check; tests/test_extensions.py pins
    the shared-substring guarantee on planted overlaps."""
    from eth_indexer_spark.operators.dedup import (
        winnow_fingerprints,
        winnow_overlap_pairs,
    )

    d = _t(spark, sf_dir, "documents")
    fps = winnow_fingerprints(d, "text", "doc_id", k=8, window=4)
    # min_shared=40: templated synthetic text shares many short substrings,
    # so a low bar pairs most of the corpus; 40 shared fingerprints isolates
    # the genuinely near-duplicate documents (≈ the planted-dup count).
    # The hot-fingerprint cap must scale WITH the corpus (10% of docs, floor
    # 50): a fixed cap that is 10% of docs at sf0.01 is 1% at sf0.1 and
    # capped away the true dup-family fingerprints — the sf0.1 parity sweep
    # caught the query going degenerate (0 pairs; proportional cap: 210 ≈
    # 10x the 23 at sf0.01, matching the scaled dup families). One bounded
    # count job; identical output at the driver's sf0.01 gate (cap = 50).
    max_df = max(50, d.count() // 10)
    return winnow_overlap_pairs(fps, min_shared=40, max_df=max_df).orderBy("i", "j")
