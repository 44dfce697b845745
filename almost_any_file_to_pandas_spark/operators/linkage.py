"""Blocked fuzzy record linkage (entity resolution) across two entity
tables — the dedup-across-sources primitive of a data-integration
pipeline (reference scope: none — extension surface; the reference,
``/root/reference/main.py``, only ingests single files).

The 100 TB shape is the point: naive fuzzy linkage is an O(n·m) cross
join. Blocking bounds it — candidates must agree on cheap deterministic
keys (here: nation + the last two name characters), so the join is an
ordinary *equi-join* on the block keys and the expensive edit-distance
predicate runs only inside blocks. Block volume is Σ|C_b|×|S_b|; with
k uniform blocks that is n·m/k, and the small side broadcasts, so the
big side never shuffles at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from almost_any_file_to_pandas_spark.plans import register, table
from almost_any_file_to_pandas_spark.session import apply_engine_conf

LINK_MAX_DIST = 6  # prefix swap costs 5 ("Customer"->"Supplier"); +1 fuzz


@register(
    "link_customer_supplier_fuzzy",
    oracle=f"""
    SELECT c.c_custkey, s.s_suppkey,
           CAST(levenshtein(c.c_name, s.s_name) AS BIGINT) AS name_dist,
           round(abs(c.c_acctbal - s.s_acctbal), 2) AS bal_gap
    FROM customer c JOIN supplier s
      ON c.c_nationkey = s.s_nationkey
     AND right(c.c_name, 2) = right(s.s_name, 2)
    WHERE levenshtein(c.c_name, s.s_name) <= {LINK_MAX_DIST}
    """,
)
def link_customer_supplier_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer↔supplier linkage: block on (nationkey, name suffix),
    match when edit distance ≤ LINK_MAX_DIST. The entity-name prefixes
    differ by 5 edits, so 6 admits at most one further digit edit —
    "the same id, possibly one typo" in this synthetic naming scheme.

    Plan: supplier (the small side) broadcasts; the blocked equi-join
    keeps levenshtein off the hot path until candidates are bounded.
    """
    apply_engine_conf(spark)
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        "c_acctbal",
        F.expr("right(c_name, 2)").alias("c_sfx"),
    )
    supp = table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        "s_name",
        "s_nationkey",
        "s_acctbal",
        F.expr("right(s_name, 2)").alias("s_sfx"),
    )
    joined = cust.join(
        F.broadcast(supp),
        (F.col("c_nationkey") == F.col("s_nationkey"))
        & (F.col("c_sfx") == F.col("s_sfx")),
    )
    dist = F.levenshtein(F.col("c_name"), F.col("s_name"))
    return joined.filter(dist <= LINK_MAX_DIST).select(
        "c_custkey",
        "s_suppkey",
        dist.cast("bigint").alias("name_dist"),
        F.round(F.abs(F.col("c_acctbal") - F.col("s_acctbal")), 2).alias(
            "bal_gap"
        ),
    )


@register(
    "link_entity_clusters",
    oracle=f"""
    WITH RECURSIVE pairs AS (
      SELECT 2 * c.c_custkey AS u, 2 * s.s_suppkey + 1 AS v
      FROM customer c JOIN supplier s
        ON c.c_nationkey = s.s_nationkey
       AND right(c.c_name, 2) = right(s.s_name, 2)
      WHERE levenshtein(c.c_name, s.s_name) <= {LINK_MAX_DIST}
    ), edges AS (
      SELECT u, v FROM pairs UNION SELECT v AS u, u AS v FROM pairs
    ), reach AS (
      SELECT u, u AS lbl FROM (SELECT DISTINCT u FROM edges)
      UNION
      SELECT e.u, r.lbl FROM edges e JOIN reach r ON e.v = r.u
    )
    SELECT u AS node_id,
           CASE WHEN u % 2 = 0 THEN 'customer' ELSE 'supplier' END
             AS entity_type,
           MIN(lbl) AS component_id
    FROM reach GROUP BY u
    """,
)
def link_entity_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution completed: the fuzzy match pairs become an
    entity GRAPH (customers on even node ids, suppliers on odd — the
    standard disjoint-namespace encoding) and transitive closure
    groups records that refer to the same real-world entity even when
    they never matched each other directly (A↔B and B↔C chain into
    one cluster). This match→cluster step is what turns pairwise
    linkage into deduplicated entities; a golden-record pass would
    pick one survivor per component_id.

    Plan: the blocked broadcast linkage join (above) emits the pairs;
    clustering reuses the dedup family's min-label-propagation CC
    (one join + one aggregate per round, localCheckpoint-truncated,
    O(diameter) rounds — linkage graphs are star-like). The oracle
    closes the identical edge set with a recursive CTE — the
    algorithm-independent component definition — so the row set is an
    equivalence proof, like the alternating-CC gate row.
    """
    from almost_any_file_to_pandas_spark.operators.dedup import (
        connected_components,
    )

    apply_engine_conf(spark)
    pairs = link_customer_supplier_fuzzy(spark, sf_dir)
    edges = pairs.select(
        (2 * F.col("c_custkey")).alias("u"),
        (2 * F.col("s_suppkey") + 1).alias("v"),
    )
    labels = connected_components(edges)
    return labels.select(
        F.col("u").alias("node_id"),
        F.when(F.col("u") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("supplier"))
        .alias("entity_type"),
        F.col("lbl").alias("component_id"),
    )


@register(
    "link_golden_records",
    oracle=f"""
    WITH RECURSIVE pairs AS (
      SELECT 2 * c.c_custkey AS u, 2 * s.s_suppkey + 1 AS v
      FROM customer c JOIN supplier s
        ON c.c_nationkey = s.s_nationkey
       AND right(c.c_name, 2) = right(s.s_name, 2)
      WHERE levenshtein(c.c_name, s.s_name) <= {LINK_MAX_DIST}
    ), edges AS (
      SELECT u, v FROM pairs UNION SELECT v AS u, u AS v FROM pairs
    ), reach AS (
      SELECT u, u AS lbl FROM (SELECT DISTINCT u FROM edges)
      UNION
      SELECT e.u, r.lbl FROM edges e JOIN reach r ON e.v = r.u
    ), members AS (
      SELECT u AS node_id, MIN(lbl) AS component_id FROM reach GROUP BY u
    ), attrs AS (
      SELECT 2 * c_custkey AS node_id, c_name AS name, c_acctbal AS bal
      FROM customer
      UNION ALL
      SELECT 2 * s_suppkey + 1, s_name, s_acctbal FROM supplier
    ), enriched AS (
      SELECT m.component_id, m.node_id, a.name, a.bal,
             row_number() OVER (
               PARTITION BY m.component_id
               ORDER BY a.bal DESC, m.node_id ASC) AS rn
      FROM members m JOIN attrs a USING (node_id)
    )
    SELECT component_id,
           COUNT(*) AS n_members,
           MAX(CASE WHEN rn = 1 THEN node_id END) AS survivor_node,
           MAX(CASE WHEN rn = 1 THEN name END) AS survivor_name,
           ROUND(MAX(bal), 2) AS max_bal
    FROM enriched GROUP BY component_id
    """,
)
def link_golden_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship — the last step of entity resolution: per entity
    cluster, elect ONE golden record by business rule (highest account
    balance, node-id tie-break) and carry merged facts (member count,
    max balance). match → cluster → survive is the full
    dedup-across-sources pipeline; downstream joins hit only golden
    records.

    Plan: clusters from :func:`link_entity_clusters` (blocked
    broadcast match + propagation CC); the attribute union is two
    narrow projections; the survivor election is a per-component rank
    window over component-sized groups (entities are small by
    definition), then one aggregate.
    """
    from pyspark.sql import Window as W

    apply_engine_conf(spark)
    members = link_entity_clusters(spark, sf_dir)
    cust = table(spark, sf_dir, "customer").select(
        (2 * F.col("c_custkey")).alias("node_id"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("bal"),
    )
    supp = table(spark, sf_dir, "supplier").select(
        (2 * F.col("s_suppkey") + 1).alias("node_id"),
        F.col("s_name").alias("name"),
        F.col("s_acctbal").alias("bal"),
    )
    attrs = cust.unionByName(supp)
    w = W.partitionBy("component_id").orderBy(
        F.desc("bal"), F.asc("node_id")
    )
    enriched = members.join(attrs, "node_id").withColumn(
        "rn", F.row_number().over(w)
    )
    return enriched.groupBy("component_id").agg(
        F.count("*").alias("n_members"),
        F.max(F.when(F.col("rn") == 1, F.col("node_id"))).alias(
            "survivor_node"
        ),
        F.max(F.when(F.col("rn") == 1, F.col("name"))).alias(
            "survivor_name"
        ),
        F.round(F.max("bal"), 2).alias("max_bal"),
    )
