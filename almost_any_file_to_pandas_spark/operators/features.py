"""Feature engineering over relational columns — the model-input prep
stage of a training-data pipeline (categorical encoding, scaling,
hashing-trick bucketing), expressed Spark-first.

Reference scope note: the reference (main.py:1-466) stops at file →
all-string frame; feature encoding is extension surface alongside the
dedup/similarity/text families (SURVEY §7).

Scale shapes:
- ``feat_brand_index_onehot`` fits a StringIndexer-style vocabulary:
  distinct over the corpus (one shuffle over ~|vocab| keys with
  map-side partials) → bounded driver collect of the VOCABULARY (25
  brands here; bounded by category cardinality exactly like MLlib's
  StringIndexer fit, the Bloom bitset or the PQ codebook — never by
  corpus size) → the mapping ships back as a literal CASE chain, so
  the encode pass is a pure column expression: NO join against the
  corpus at all.
- ``feat_price_minmax_scale`` folds min/max in one aggregate and
  broadcasts the 1-row bounds onto the scan (a cross join with a
  1-row side is a broadcast nested loop of cost O(rows)); min/max are
  order-independent so no quantization is needed for hash parity.
- ``feat_hash_bucket`` is stateless — the hashing trick needs no fit
  pass, no vocabulary, no shuffle: one narrow md5-derived bucket
  expression (the engine-portable arithmetic of
  pipeline.split_bucket_expr).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from almost_any_file_to_pandas_spark.plans import register, table
from almost_any_file_to_pandas_spark.session import apply_engine_conf

HASH_BUCKETS = 1024


@register(
    "feat_brand_index_onehot",
    oracle="""
    WITH vocab AS (
      SELECT p_brand,
             ROW_NUMBER() OVER (ORDER BY p_brand) - 1 AS brand_idx
      FROM (SELECT DISTINCT p_brand FROM part)
    )
    SELECT p.p_partkey, p.p_brand, v.brand_idx,
           [CAST(CASE WHEN i = v.brand_idx THEN 1 ELSE 0 END AS INT)
            FOR i IN range((SELECT COUNT(*) FROM vocab))] AS onehot
    FROM part p JOIN vocab v USING (p_brand)
    """,
)
def feat_brand_index_onehot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable categorical index + one-hot vector for ``p_brand`` —
    the StringIndexer/OneHotEncoder pair as engine queries. Index =
    rank in sorted brand order (deterministic, no fit randomness);
    the vocabulary is collected once (bounded by cardinality, module
    docstring) and the encode is a literal CASE chain + array
    expression, keeping the corpus pass join-free and JVM-side.
    """
    apply_engine_conf(spark)
    part = table(spark, sf_dir, "part")
    vocab = sorted(
        r[0]
        for r in part.select("p_brand").distinct().collect()
    )
    idx_expr = F.lit(None).cast("int")
    for i in reversed(range(len(vocab))):
        idx_expr = F.when(
            F.col("p_brand") == vocab[i], F.lit(i)
        ).otherwise(idx_expr)
    onehot = F.array(
        *[
            F.when(F.col("brand_idx") == i, F.lit(1))
            .otherwise(F.lit(0))
            .cast("int")
            for i in range(len(vocab))
        ]
    )
    return (
        part.select("p_partkey", "p_brand")
        .withColumn("brand_idx", idx_expr)
        .withColumn("onehot", onehot)
    )


@register(
    "feat_price_minmax_scale",
    oracle="""
    WITH bounds AS (
      SELECT MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi
      FROM lineitem
    )
    SELECT l_orderkey, l_linenumber,
           l_extendedprice,
           ROUND((l_extendedprice - lo) / (hi - lo), 9) AS price_scaled
    FROM lineitem CROSS JOIN bounds
    """,
)
def feat_price_minmax_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-max scaling of ``l_extendedprice`` to [0, 1] — the
    numeric-feature normalization pass. One aggregate computes the
    bounds (order-independent extremes → no decimal quantization
    needed for hash parity); the 1-row bounds frame broadcasts onto
    the scan, so the scaling pass is a single narrow projection.
    """
    apply_engine_conf(spark)
    li = table(spark, sf_dir, "lineitem")
    bounds = li.agg(
        F.min("l_extendedprice").alias("lo"),
        F.max("l_extendedprice").alias("hi"),
    )
    return li.select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    ).crossJoin(F.broadcast(bounds)).select(
        "l_orderkey",
        "l_linenumber",
        "l_extendedprice",
        F.round(
            (F.col("l_extendedprice") - F.col("lo"))
            / (F.col("hi") - F.col("lo")),
            9,
        ).alias("price_scaled"),
    )


@register(
    "feat_hash_bucket",
    oracle=f"""
    SELECT p_partkey, p_name,
           (('0x' || substr(md5(p_name), 1, 8))::BIGINT % {HASH_BUCKETS})
             AS name_bucket
    FROM part
    """,
)
def feat_hash_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick feature: ``p_name`` → one of ``HASH_BUCKETS``
    buckets from the md5-derived integer (identical arithmetic in the
    oracle). No vocabulary, no fit pass, no shuffle — the stateless
    encoding used when cardinality is unbounded (URLs, tokens,
    user-agents) and a collision rate ~1/buckets is acceptable.
    """
    apply_engine_conf(spark)
    part = table(spark, sf_dir, "part")
    bucket = (
        F.conv(F.substring(F.md5(F.col("p_name")), 1, 8), 16, 10)
        .cast("bigint")
        % HASH_BUCKETS
    )
    return part.select(
        "p_partkey", "p_name", bucket.alias("name_bucket")
    )
