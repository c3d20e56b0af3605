"""Salting preserves exact semantics: salted ops == plain ops on skewed
inputs (one key holding most rows)."""

from __future__ import annotations

from pyspark.sql import functions as F

from eth_indexer_spark.operators.skew import salted_collect_set, salted_join


def _skewed(spark):
    # key 0 holds 90% of rows; keys 1..10 the rest
    rows = [(0, i) for i in range(900)] + [(k, 1000 + k) for k in range(1, 11)]
    return spark.createDataFrame(rows, "k long, payload long")


def _dim(spark):
    return spark.createDataFrame(
        [(k, f"name{k}") for k in range(0, 8)], "k long, name string"
    )


def test_salted_inner_join_exact(spark):
    big, dim = _skewed(spark), _dim(spark)
    plain = {(r["k"], r["payload"], r["name"]) for r in big.join(dim, "k").collect()}
    salted = {
        (r["k"], r["payload"], r["name"])
        for r in salted_join(big, dim, on="k", salt=4).collect()
    }
    assert salted == plain and len(plain) == 900 + 7


def test_salted_left_join_exact(spark):
    big, dim = _skewed(spark), _dim(spark)
    plain = {
        (r["k"], r["payload"], r["name"]) for r in big.join(dim, "k", "left").collect()
    }
    salted = {
        (r["k"], r["payload"], r["name"])
        for r in salted_join(big, dim, on="k", how="left", salt=4).collect()
    }
    assert salted == plain
    # unmatched keys survive with null name
    assert any(n is None for _, _, n in salted)


def test_salted_collect_set_exact(spark):
    df = _skewed(spark)
    plain = {
        r["k"]: set(r["s"])
        for r in df.groupBy("k").agg(F.collect_set("payload").alias("s")).collect()
    }
    salted = {
        r["k"]: set(r["values"])
        for r in salted_collect_set(df, "k", "payload", salt=4).collect()
    }
    assert salted == plain
    assert len(plain[0]) == 900
