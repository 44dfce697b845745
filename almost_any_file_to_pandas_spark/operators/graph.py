"""Graph analytics over behavioral co-occurrence.

Second member of the graph family next to
``connected_components_alternating`` (plans/relational.py): build the
user co-occurrence graph (edge = two users active in the same hour
more often than twice the global mean) and count its TRIANGLES — the
clustering signal behind community detection, bot-ring discovery and
recommendation ("users who always appear together").

Scale shape: the pair expansion reuses the dedup family's capped
one-shuffle bucket machinery (`_pairs_within_buckets`) with the hour
as the bucket — per-hour co-activity bounds the quadratic term
exactly like an LSH bucket, with the same skew cap. Triangles use the
oriented-edge join: every edge is stored once as (lo, hi), and the
two joins enumerate each triangle exactly once as a < b < c — the
standard distributed formulation (no per-vertex adjacency
materialization, no double counting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from almost_any_file_to_pandas_spark.operators.dedup import (
    MAX_BUCKET_SIZE,
    _pairs_within_buckets,
    connected_components_alternating,
)
from almost_any_file_to_pandas_spark.plans import register, table
from almost_any_file_to_pandas_spark.session import apply_engine_conf

EDGE_FACTOR = 2.0  # edge iff co-count > EDGE_FACTOR * mean co-count

# The in-bucket pair expansion drops hours with more than
# MAX_BUCKET_SIZE co-active users (skew guard). Unlike an LSH bucket,
# a dense hour in a co-activity graph is real signal, so the SAME cap
# is encoded in the oracle CTE (hours HAVING COUNT BETWEEN 2 AND cap)
# — both engines compute the identical capped graph by construction,
# and the cap is an explicit, documented model parameter rather than a
# silent engine-side divergence. Dropped hours are an OUTPUT COLUMN
# (n_capped_hours in the triangle census, via _oversize_hours) so a
# capped dense hour is visible in every gate run, never silent.
_HOURS_OK_SQL = f"""
      SELECT h FROM cells GROUP BY h
      HAVING COUNT(*) BETWEEN 2 AND {MAX_BUCKET_SIZE}
"""


def _oversize_hours(cells: DataFrame) -> DataFrame:
    """One-row frame counting the hour buckets the skew cap excludes
    from the graph — the observability hook for the documented cap,
    emitted as the census column ``n_capped_hours`` so a capped dense
    hour is a visible modeling decision, never silent."""
    return (
        cells.groupBy("h")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > MAX_BUCKET_SIZE)
        .agg(F.count("*").alias("n_capped_hours"))
    )


@register(
    "events_cooccurrence_triangles",
    oracle=f"""
    WITH cells AS (
      SELECT DISTINCT date_trunc('hour', ts) AS h, user_id FROM events
    ), hours_ok AS ({_HOURS_OK_SQL}
    ), pair_counts AS (
      SELECT a.user_id AS u1, b.user_id AS u2, COUNT(*) AS c
      FROM cells a JOIN cells b ON a.h = b.h AND a.user_id < b.user_id
      JOIN hours_ok ho ON ho.h = a.h
      GROUP BY a.user_id, b.user_id
    ), cut AS (
      SELECT {EDGE_FACTOR} * AVG(c) AS threshold FROM pair_counts
    ), edges AS (
      SELECT u1, u2 FROM pair_counts CROSS JOIN cut
      WHERE c > cut.threshold
    ), triangles AS (
      SELECT COUNT(*) AS n_triangles
      FROM edges e1
      JOIN edges e2 ON e2.u1 = e1.u2
      JOIN edges e3 ON e3.u1 = e1.u1 AND e3.u2 = e2.u2
    )
    SELECT (SELECT COUNT(DISTINCT user_id) FROM cells) AS n_active_users,
           (SELECT COUNT(*) FROM pair_counts) AS n_copairs,
           (SELECT COUNT(*) FROM edges) AS n_edges,
           n_triangles,
           (SELECT COUNT(*) FROM (
              SELECT h FROM cells GROUP BY h
              HAVING COUNT(*) > {MAX_BUCKET_SIZE}
           )) AS n_capped_hours
    FROM triangles
    """,
)
def events_cooccurrence_triangles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Triangle census of the hour-co-activity user graph. The edge
    threshold is data-derived (co-count strictly above
    ``EDGE_FACTOR``× the mean co-count, a one-row broadcast) so the
    graph stays meaningfully sparse at every scale factor.

    Plan: distinct (hour, user) cells → capped one-shuffle in-bucket
    pair expansion (multiplicity = co-count) → mean-threshold filter →
    oriented-edge double join, each triangle exactly once. Every join
    input is the post-threshold edge table, orders of magnitude
    smaller than the event stream.
    """
    apply_engine_conf(spark)
    ev = table(spark, sf_dir, "events")
    cells = ev.select(
        F.date_trunc("hour", F.col("ts")).alias("h"), "user_id"
    ).distinct()
    co = _pairs_within_buckets(cells, "user_id", ["h"], distinct=False)
    pair_counts = (
        co.groupBy(F.col("doc_a").alias("u1"), F.col("doc_b").alias("u2"))
        .agg(F.count("*").alias("c"))
    )
    pair_counts = pair_counts.localCheckpoint()  # feeds cut + edges + counts
    cut = pair_counts.agg(
        (F.lit(EDGE_FACTOR) * F.avg("c")).alias("threshold")
    )
    edges = (
        pair_counts.crossJoin(F.broadcast(cut))
        .filter(F.col("c") > F.col("threshold"))
        .select("u1", "u2")
    )
    edges = edges.localCheckpoint()  # reused three times in the join
    e1 = edges
    e2 = edges.select(
        F.col("u1").alias("b"), F.col("u2").alias("c2")
    )
    e3 = edges.select(
        F.col("u1").alias("a3"), F.col("u2").alias("c3")
    )
    triangles = (
        e1.join(e2, e1.u2 == e2.b)
        .join(e3, (F.col("a3") == e1.u1) & (F.col("c3") == F.col("c2")))
        .agg(F.count("*").alias("n_triangles"))
    )
    n_users = cells.agg(
        F.countDistinct("user_id").alias("n_active_users")
    )
    n_copairs = pair_counts.agg(F.count("*").alias("n_copairs"))
    n_edges = edges.agg(F.count("*").alias("n_edges"))
    return (
        n_users.crossJoin(n_copairs)
        .crossJoin(n_edges)
        .crossJoin(triangles)
        .crossJoin(_oversize_hours(cells))
    )


PR_DAMP = 0.85
PR_ITERS = 8


def pagerank(edges: DataFrame, damp: float = PR_DAMP,
             iters: int = PR_ITERS) -> DataFrame:
    """Distributed PageRank by synchronous power iteration over an
    UNDIRECTED edge list ``(u1, u2)`` (symmetrized internally).

    Third graph-family member beside the O(log n) connected components
    and the triangle census. Every node in a symmetrized graph has
    out-degree ≥ 1, so there is no dangling mass and rank conserves to
    exactly 1 each round (up to float ulps) — the property the floor
    row pins.

    Scale shape: ``(edge ⨝ ranks)`` then a sum-by-destination — the
    standard two-shuffle PageRank round, both keyed on node id, so AQE
    reuses/broadcasts the small side as the graph allows; ranks are
    ``localCheckpoint``-ed each round to truncate the O(iters)-deep
    lineage (same discipline as the CC and cluster-canonical loops).
    The node count is a one-number aggregate (bounded driver scalar,
    like the Bloom/PQ index builds).
    """
    sym = edges.select(
        F.col("u1").alias("src"), F.col("u2").alias("dst")
    ).union(
        edges.select(F.col("u2").alias("src"), F.col("u1").alias("dst"))
    )
    deg = sym.groupBy("src").agg(F.count("*").alias("deg"))
    out = sym.join(deg, "src").localCheckpoint(eager=True)
    nodes = deg.select(F.col("src").alias("node")).localCheckpoint(
        eager=True
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iters):
        contribs = (
            out.join(ranks, out.src == ranks.node)
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("deg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit((1.0 - damp) / n)
                    + F.lit(damp) * F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


@register(
    "graph_pagerank_floor",
    oracle=f"""
    WITH cells AS (
      SELECT DISTINCT date_trunc('hour', ts) AS h, user_id FROM events
    ), hours_ok AS ({_HOURS_OK_SQL}
    ), pair_counts AS (
      SELECT a.user_id AS u1, b.user_id AS u2, COUNT(*) AS c
      FROM cells a JOIN cells b ON a.h = b.h AND a.user_id < b.user_id
      JOIN hours_ok ho ON ho.h = a.h
      GROUP BY a.user_id, b.user_id
    ), cut AS (
      SELECT {EDGE_FACTOR} * AVG(c) AS threshold FROM pair_counts
    ), edges AS (
      SELECT u1, u2 FROM pair_counts CROSS JOIN cut
      WHERE c > cut.threshold
    ), nodes AS (
      SELECT DISTINCT u FROM (
        SELECT u1 AS u FROM edges UNION ALL SELECT u2 FROM edges
      )
    )
    SELECT (SELECT COUNT(*) FROM nodes) AS n_nodes,
           (SELECT COUNT(*) FROM edges) AS n_edges,
           CAST({PR_ITERS} AS INT) AS iters,
           TRUE AS rank_conserved,
           TRUE AS min_rank_floor_met
    """,
)
def graph_pagerank_floor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank acceptance gate over the hour-co-activity graph (the
    recall-floor pattern): ranks from :func:`pagerank` must conserve
    total mass to 1 (no dangling nodes in a symmetrized graph) and
    every rank must clear the teleport floor (1−d)/n — both provable
    properties the oracle states independently, anchored to the
    node/edge counts it derives from the identical graph CTE. Exact
    ranks are additionally pinned against a numpy power iteration in
    tests/test_operators.py.
    """
    apply_engine_conf(spark)
    ev = table(spark, sf_dir, "events")
    cells = ev.select(
        F.date_trunc("hour", F.col("ts")).alias("h"), "user_id"
    ).distinct()
    co = _pairs_within_buckets(cells, "user_id", ["h"], distinct=False)
    pair_counts = (
        co.groupBy(F.col("doc_a").alias("u1"), F.col("doc_b").alias("u2"))
        .agg(F.count("*").alias("c"))
    ).localCheckpoint(eager=True)
    cut = pair_counts.agg(
        (F.lit(EDGE_FACTOR) * F.avg("c")).alias("threshold")
    )
    edges = (
        pair_counts.crossJoin(F.broadcast(cut))
        .filter(F.col("c") > F.col("threshold"))
        .select("u1", "u2")
        .localCheckpoint(eager=True)
    )
    ranks = pagerank(edges)
    n_edges = edges.count()
    agg = ranks.agg(
        F.count("*").alias("n_nodes"),
        F.sum("rank").alias("total"),
        F.min("rank").alias("mn"),
    ).collect()[0]
    n = agg["n_nodes"]
    # conservation tolerance scales with n: the rank total is an
    # accumulation-order-dependent double sum of n terms, so a fixed
    # 1e-9 bound could flip spuriously on a large graph / different
    # partitioning (each term carries ~ulp(1/n) error; n·1e-12 bounds
    # the worst-case drift with 3 orders of margin at any n where the
    # fixed bound would have been tight)
    conserved = n == 0 or abs(agg["total"] - 1.0) < max(1e-9, n * 1e-12)
    floor_met = n == 0 or agg["mn"] >= (1.0 - PR_DAMP) / n - 1e-12
    return spark.createDataFrame(
        [(n, n_edges, PR_ITERS, bool(conserved), bool(floor_met))],
        schema=(
            "n_nodes bigint, n_edges bigint, iters int, "
            "rank_conserved boolean, min_rank_floor_met boolean"
        ),
    )


@register(
    "graph_degree_assortativity",
    oracle=f"""
    WITH cells AS (
      SELECT DISTINCT date_trunc('hour', ts) AS h, user_id FROM events
    ), hours_ok AS ({_HOURS_OK_SQL}
    ), pair_counts AS (
      SELECT a.user_id AS u1, b.user_id AS u2, COUNT(*) AS c
      FROM cells a JOIN cells b ON a.h = b.h AND a.user_id < b.user_id
      JOIN hours_ok ho ON ho.h = a.h
      GROUP BY a.user_id, b.user_id
    ), cut AS (
      SELECT {EDGE_FACTOR} * AVG(c) AS threshold FROM pair_counts
    ), edges AS (
      SELECT u1, u2 FROM pair_counts CROSS JOIN cut
      WHERE c > cut.threshold
    ), deg AS (
      SELECT u, COUNT(*) AS d FROM (
        SELECT u1 AS u FROM edges UNION ALL SELECT u2 AS u FROM edges
      ) GROUP BY u
    ), sym AS (
      SELECT CAST(d1.d AS HUGEINT) AS x, CAST(d2.d AS HUGEINT) AS y
      FROM edges e JOIN deg d1 ON d1.u = e.u1 JOIN deg d2 ON d2.u = e.u2
      UNION ALL
      SELECT CAST(d2.d AS HUGEINT), CAST(d1.d AS HUGEINT)
      FROM edges e JOIN deg d1 ON d1.u = e.u1 JOIN deg d2 ON d2.u = e.u2
    ), s AS (
      SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x*y) AS sxy, SUM(x*x) AS sxx, SUM(y*y) AS syy
      FROM sym
    )
    SELECT CAST(n // 2 AS BIGINT) AS n_edges,
           CASE WHEN (n*sxx - sx*sx) = 0 OR (n*syy - sy*sy) = 0
                THEN NULL
                ELSE CAST(FLOOR(
                  CAST(n*sxy - sx*sy AS DOUBLE)
                  / (SQRT(CAST(n*sxx - sx*sx AS DOUBLE))
                     * SQRT(CAST(n*syy - sy*sy AS DOUBLE)))
                  * 1000000 + 0.5) AS BIGINT)
           END AS assortativity_q6
    FROM s
    """,
)
def graph_degree_assortativity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Degree assortativity of the co-activity graph — Newman's r,
    the Pearson correlation of endpoint degrees over (symmetrized)
    edges.  Positive r = hubs link to hubs (social/community
    structure); negative r = hubs link to leaves (star/bot topology)
    — the one-number structural complement to the triangle census.

    Determinism: every Pearson term (Σx, Σxy, Σx², n) is an exact
    integer sum widened to DECIMAL(38,0)/HUGEINT (degree products
    overflow int64 at hub degrees ~10⁵ × 10¹⁰ edges); the final r
    divides identical integers through IEEE sqrt and quantizes to
    micros.  A degenerate graph (constant degree) emits NULL in both
    engines.

    Plan: the same capped one-shuffle pair expansion and broadcast
    mean-threshold as the triangle census builds the edge set; the
    degree table is one union-aggregate over edge endpoints; the two
    degree joins shuffle only edge-sized frames on the user key; the
    Pearson fold is one map-side-combined scalar aggregate.
    """
    apply_engine_conf(spark)
    ev = table(spark, sf_dir, "events")
    cells = ev.select(
        F.date_trunc("hour", F.col("ts")).alias("h"), "user_id"
    ).distinct()
    co = _pairs_within_buckets(cells, "user_id", ["h"], distinct=False)
    pair_counts = co.groupBy(
        F.col("doc_a").alias("u1"), F.col("doc_b").alias("u2")
    ).agg(F.count("*").alias("c"))
    pair_counts = pair_counts.localCheckpoint()
    cut = pair_counts.agg(
        (F.lit(EDGE_FACTOR) * F.avg("c")).alias("threshold")
    )
    edges = (
        pair_counts.crossJoin(F.broadcast(cut))
        .filter(F.col("c") > F.col("threshold"))
        .select("u1", "u2")
    )
    edges = edges.localCheckpoint()  # feeds deg + two joins
    deg = (
        edges.select(F.col("u1").alias("u"))
        .unionByName(edges.select(F.col("u2").alias("u")))
        .groupBy("u")
        .agg(F.count("*").alias("d"))
    )
    d1 = deg.select(F.col("u").alias("j1"), F.col("d").alias("dx"))
    d2 = deg.select(F.col("u").alias("j2"), F.col("d").alias("dy"))
    joined = (
        edges.join(d1, edges.u1 == F.col("j1"))
        .join(d2, edges.u2 == F.col("j2"))
        .select(
            F.col("dx").cast("decimal(38,0)").alias("x"),
            F.col("dy").cast("decimal(38,0)").alias("y"),
        )
    )
    sym = joined.unionByName(
        joined.select(F.col("y").alias("x"), F.col("x").alias("y"))
    )
    s = sym.agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return s.select(
        F.expr("CAST(n div 2 AS BIGINT)").alias("n_edges"),
        F.when((vx == 0) | (vy == 0), F.lit(None).cast("bigint"))
        .otherwise(
            F.floor(
                num.cast("double")
                / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double")))
                * 1_000_000
                + F.lit(0.5)
            ).cast("bigint")
        )
        .alias("assortativity_q6"),
    )


LPA_ITERS = 3  # fixed synchronous label-propagation rounds


def _lpa_cte_head() -> str:
    """The shared WITH-chain through ``it{LPA_ITERS}`` (final labels)
    — reused by the LPA census oracle and the modularity oracle."""
    head = f"""
    WITH cells AS (
      SELECT DISTINCT date_trunc('hour', ts) AS h, user_id FROM events
    ), hours_ok AS ({_HOURS_OK_SQL}
    ), pair_counts AS (
      SELECT a.user_id AS u1, b.user_id AS u2, COUNT(*) AS c
      FROM cells a JOIN cells b ON a.h = b.h AND a.user_id < b.user_id
      JOIN hours_ok ho ON ho.h = a.h
      GROUP BY a.user_id, b.user_id
    ), cut AS (
      SELECT {EDGE_FACTOR} * AVG(c) AS threshold FROM pair_counts
    ), edges AS (
      SELECT u1, u2 FROM pair_counts CROSS JOIN cut
      WHERE c > cut.threshold
    ), sym AS (
      SELECT u1 AS u, u2 AS v FROM edges
      UNION ALL
      SELECT u2 AS u, u1 AS v FROM edges
    ), it0 AS (
      SELECT DISTINCT u, u AS lab FROM sym
    )"""
    rounds = []
    for i in range(1, LPA_ITERS + 1):
        rounds.append(f""", step{i} AS (
      SELECT e.u, p.lab, COUNT(*) AS c
      FROM sym e JOIN it{i - 1} p ON p.u = e.v
      GROUP BY e.u, p.lab
    ), pick{i} AS (
      SELECT u, lab FROM (
        SELECT u, lab,
               ROW_NUMBER() OVER (PARTITION BY u
                                  ORDER BY c DESC, lab ASC) AS rn
        FROM step{i}
      ) WHERE rn = 1
    ), it{i} AS (
      SELECT prev.u, COALESCE(pk.lab, prev.lab) AS lab
      FROM it{i - 1} prev LEFT JOIN pick{i} pk ON pk.u = prev.u
    )"""
        )
    return head + "".join(rounds)


def _lpa_sql() -> str:
    """Unrolled synchronous LPA oracle: each round is a neighbor-label
    census + (count DESC, label ASC) argmin pick + isolated-node
    carry-over — the same deterministic rule the engine loop runs."""
    return (
        _lpa_cte_head()
        + f"""
    SELECT lab AS community, COUNT(*) AS n_members
    FROM it{LPA_ITERS} GROUP BY lab
    """
    )


@register("graph_label_propagation", oracle=_lpa_sql())
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan
    et al. 2007) over the hour-co-activity graph — the cheap first
    answer to "which users form rings?", complementing the triangle
    census (local clustering) and connected components (reachability:
    LPA splits a component into densely-knit groups).

    Determinism: textbook LPA tie-breaks randomly and is famously
    unstable; this restatement is FULLY deterministic — fixed
    {LPA_ITERS} synchronous rounds from identity labels, each node
    adopting its neighborhood's (most frequent, then smallest) label,
    isolated carry-over for nodes whose census is empty (cannot
    happen on a symmetrized edge list, kept for rule totality). Both
    engines run the identical rule, so the gate hashes full
    community assignments, not just sizes.

    Plan/scale: the edge build is the shared capped-bucket machinery
    (one shuffle, skew-capped hours). Each round is ONE shuffled join
    on the symmetric edge list + a (node, label) census + a per-node
    top-1 window — the Pregel message-pass compiled to DataFrame ops.
    Labels localCheckpoint per round: constant-depth lineage, and the
    next round's join starts from materialized (node, label) pairs —
    the iterative-algorithm discipline PageRank set (graph.py).
    """
    apply_engine_conf(spark)
    _, labels = _lpa_label_frames(spark, sf_dir)
    return labels.groupBy(F.col("lab").alias("community")).agg(
        F.count("*").alias("n_members")
    )


def _lpa_label_frames(spark: SparkSession, sf_dir: str):
    """The LPA engine loop behind :func:`graph_label_propagation`,
    returning (symmetric edge list, final (u, lab) labels) so the
    modularity scorer can reuse both frames (plan-identical for the
    census query)."""
    ev = table(spark, sf_dir, "events")
    cells = ev.select(
        F.date_trunc("hour", F.col("ts")).alias("h"), "user_id"
    ).distinct()
    co = _pairs_within_buckets(cells, "user_id", ["h"], distinct=False)
    pair_counts = (
        co.groupBy(F.col("doc_a").alias("u1"), F.col("doc_b").alias("u2"))
        .agg(F.count("*").alias("c"))
    )
    pair_counts = pair_counts.localCheckpoint()
    cut = pair_counts.agg(
        (F.lit(EDGE_FACTOR) * F.avg("c")).alias("threshold")
    )
    edges = (
        pair_counts.crossJoin(F.broadcast(cut))
        .filter(F.col("c") > F.col("threshold"))
        .select("u1", "u2")
    )
    sym = edges.select(
        F.col("u1").alias("u"), F.col("u2").alias("v")
    ).unionAll(
        edges.select(F.col("u2").alias("u"), F.col("u1").alias("v"))
    )
    # r10 (r9 verdict #7): the r9 ``repartition("v")`` before this
    # checkpoint claimed the stored partitioning would feed the three
    # round joins. The captured round-2 census plan
    # (plans/r10/graph_label_propagation_round2census_before.txt)
    # refutes it on both counts: the checkpointed scan reports
    # ``UnknownPartitioning(0)`` (localCheckpoint does not preserve
    # outputPartitioning under AQE), and the join is a
    # BroadcastHashJoin BUILDING on sym (the post-threshold edge list
    # is small), so no round join ever consumed a ``v`` partitioning.
    # The repartition was a pure extra |E| shuffle — dropped.
    sym = sym.localCheckpoint(eager=True)
    labels = sym.select("u").distinct().select(
        "u", F.col("u").alias("lab")
    )
    for i in range(LPA_ITERS):
        census = (
            sym.join(
                labels.select(
                    F.col("u").alias("v"), F.col("lab").alias("nlab")
                ),
                "v",
            )
            .groupBy("u", F.col("nlab").alias("lab"))
            .agg(F.count("*").alias("c"))
        )
        # argmax by (count DESC, label ASC) as ONE aggregate instead
        # of a ranking window: max_by over the struct (c, -lab) picks
        # the same row the row_number form did, without the per-round
        # partition sort (the oracle keeps the window formulation).
        # The census covers EVERY node by construction (sym is
        # symmetrized, so each node appears as ``u`` in at least one
        # edge row), so the old carry-over left-join back onto the
        # previous labels was a per-round no-op shuffle — the rule's
        # isolated-node branch cannot fire; dropped (r9, output
        # value-identical, oracle unchanged).
        labels = census.groupBy("u").agg(
            F.expr("max_by(lab, struct(c, -lab))").alias("lab")
        )
        # r10: the rounds CHAIN inside one plan — each intermediate
        # labels frame has exactly one consumer (the next round), so
        # the per-round eager checkpoint bought no reuse and cost a
        # blocking job + a Catalyst compile per round. Lineage depth
        # is linear in the FIXED round count (3 joins + 6 aggregates),
        # well inside planner comfort. Only the FINAL labels frame is
        # materialized (eagerly): the modularity consumer reads it
        # from four places in one job, and an unmaterialized lazy
        # checkpoint could be computed concurrently by those stages.
        if i == LPA_ITERS - 1:
            labels = labels.localCheckpoint(eager=True)
    return sym, labels


@register(
    "graph_modularity_score",
    oracle=_lpa_cte_head()
    + f""", deg AS (
      SELECT u, COUNT(*) AS d FROM sym GROUP BY u
    ), intra AS (
      SELECT COUNT(*) FILTER (WHERE a.lab = b.lab) AS intra2
      FROM sym e
      JOIN it{LPA_ITERS} a ON a.u = e.u
      JOIN it{LPA_ITERS} b ON b.u = e.v
    ), dc AS (
      SELECT COALESCE(SUM(s * s), 0) AS sum_dc2
      FROM (
        SELECT l.lab, SUM(d.d) AS s
        FROM it{LPA_ITERS} l JOIN deg d ON d.u = l.u
        GROUP BY l.lab
      )
    ), m AS (
      SELECT COUNT(*) AS two_m FROM sym
    ), nodes AS (
      SELECT COUNT(*) AS n_nodes,
             COUNT(DISTINCT lab) AS n_communities
      FROM it{LPA_ITERS}
    )
    SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
           CAST(two_m // 2 AS BIGINT) AS n_edges,
           CAST(n_communities AS BIGINT) AS n_communities,
           CAST(intra2 // 2 AS BIGINT) AS intra_edges,
           CASE WHEN two_m = 0 THEN NULL
                ELSE CAST(FLOOR(
                  (intra2 * two_m - sum_dc2)::DOUBLE
                  / (two_m::DOUBLE * two_m::DOUBLE)
                  * 1000000 + 0.5) AS BIGINT)
           END AS modularity_q6
    FROM nodes CROSS JOIN intra CROSS JOIN dc CROSS JOIN m
    """,
)
def graph_modularity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the LPA communities over the co-activity
    graph — the quality score that tells you whether the detected
    partition is actually denser-than-chance (Q > 0) or noise
    (Q ≈ 0), closing the loop on ``graph_label_propagation``:
    ``Q = Σ_c (m_c/m − (d_c/2m)²) = (intra2·2m − Σd_c²) / (2m)²``
    where ``intra2`` counts intra-community rows of the SYMMETRIC
    edge list (each undirected edge twice) and ``d_c`` sums member
    degrees. The numerator/denominator are exact int64; the final
    ratio is the established FLOOR(x·1e6 + 0.5) double recipe
    (``graph_degree_assortativity``'s class — num, den well inside
    2^53), NULL on an empty graph.

    Plan/scale: labels come from the SAME deterministic {LPA_ITERS}-
    round LPA loop (refactored to ``_lpa_label_frames`` —
    plan-identical for the census row); modularity adds two
    node-keyed broadcast-scale maps (labels, degrees) joined onto the
    one materialized edge list — no new corpus pass, no all-pairs
    anything — then three scalar aggregates folded by 1-row
    crossJoins.
    """
    apply_engine_conf(spark)
    sym, labels = _lpa_label_frames(spark, sf_dir)
    deg = sym.groupBy("u").agg(F.count("*").alias("d"))
    lab_u = labels.select(F.col("u"), F.col("lab").alias("lab_a"))
    lab_v = labels.select(
        F.col("u").alias("v"), F.col("lab").alias("lab_b")
    )
    intra = (
        sym.join(lab_u, "u")
        .join(lab_v, "v")
        .agg(
            F.count(
                F.when(F.col("lab_a") == F.col("lab_b"), 1)
            ).alias("intra2")
        )
    )
    dc = (
        labels.join(deg, "u")
        .groupBy("lab")
        .agg(F.sum("d").alias("s"))
        .agg(
            F.coalesce(F.sum(F.col("s") * F.col("s")), F.lit(0)).alias(
                "sum_dc2"
            )
        )
    )
    m = sym.agg(F.count("*").alias("two_m"))
    nodes = labels.agg(
        F.count("*").alias("n_nodes"),
        F.countDistinct("lab").alias("n_communities"),
    )
    return (
        nodes.crossJoin(intra)
        .crossJoin(dc)
        .crossJoin(m)
        .selectExpr(
            "CAST(n_nodes AS BIGINT) AS n_nodes",
            "CAST(two_m div 2 AS BIGINT) AS n_edges",
            "CAST(n_communities AS BIGINT) AS n_communities",
            "CAST(intra2 div 2 AS BIGINT) AS intra_edges",
            "CASE WHEN two_m = 0 THEN NULL"
            " ELSE CAST(FLOOR("
            " CAST(intra2 * two_m - sum_dc2 AS DOUBLE)"
            " / (CAST(two_m AS DOUBLE) * CAST(two_m AS DOUBLE))"
            " * 1000000 + 0.5) AS BIGINT)"
            " END AS modularity_q6",
        )
    )


KCORE_K = 2  # degree floor of the core
KCORE_ROUNDS = 3  # fixed synchronous peels (converged at tested SFs)


def _kcore_sql() -> str:
    """Unrolled fixed-round k-core peel: each round recounts degrees
    on the surviving edge set and drops vertices below KCORE_K — the
    same synchronous recursion both engines run, unrolled because the
    oracle dialect has no iteration."""
    rounds = []
    prev = "e0"
    for r in range(1, KCORE_ROUNDS + 1):
        rounds.append(
            f"""
    , d{r - 1} AS (
      SELECT v, COUNT(*) AS d FROM (
        SELECT u1 AS v FROM {prev} UNION ALL SELECT u2 FROM {prev}
      ) GROUP BY v
    ), s{r} AS (SELECT v FROM d{r - 1} WHERE d >= {KCORE_K})
    , e{r} AS MATERIALIZED (
      SELECT u1, u2 FROM {prev}
      WHERE u1 IN (SELECT v FROM s{r})
        AND u2 IN (SELECT v FROM s{r})
    )"""
        )
        prev = f"e{r}"
    summaries = [
        "SELECT 0 AS round,"
        " (SELECT COUNT(*) FROM d0) AS n_vertices,"
        " (SELECT COUNT(*) FROM e0) AS n_edges"
    ] + [
        f"SELECT {r}, (SELECT COUNT(*) FROM s{r}),"
        f" (SELECT COUNT(*) FROM e{r})"
        for r in range(1, KCORE_ROUNDS + 1)
    ]
    return f"""
    WITH cells AS MATERIALIZED (
      SELECT DISTINCT date_trunc('hour', ts) AS h, user_id FROM events
    ), hours_ok AS ({_HOURS_OK_SQL}
    ), pair_counts AS MATERIALIZED (
      SELECT a.user_id AS u1, b.user_id AS u2, COUNT(*) AS c
      FROM cells a JOIN cells b ON a.h = b.h AND a.user_id < b.user_id
      JOIN hours_ok ho ON ho.h = a.h
      GROUP BY a.user_id, b.user_id
    ), cut AS (
      SELECT {EDGE_FACTOR} * AVG(c) AS threshold FROM pair_counts
    ), e0 AS MATERIALIZED (
      SELECT u1, u2 FROM pair_counts CROSS JOIN cut
      WHERE c > cut.threshold
    ){''.join(rounds)}
    {' UNION ALL '.join(summaries)}
    """


@register("graph_kcore_trajectory", oracle=_kcore_sql())
def graph_kcore_trajectory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{KCORE_K}-core peel trajectory of the hour-co-activity graph:
    per synchronous round, how many vertices still meet the degree
    floor and how many edges survive. The k-core is the standard
    "dense kernel" extractor (Seidman 1983) — the bot-ring /
    power-clique signal that degree alone misses (a vertex with many
    edges to PERIPHERAL vertices peels away once they do). The
    trajectory flattening (round r == round r-1) shows convergence in
    the output itself rather than asserting it.

    Determinism: fixed {KCORE_ROUNDS} synchronous rounds on both
    engines (the oracle unrolls them as CTEs), so the result is exact
    regardless of whether the peel has converged at an untested SF —
    the fixed-round LPA discipline.

    Scale: the edge build is the shared capped-bucket machinery (one
    shuffle, skew-capped hours, corpus-sized); every peel round after
    it runs on the THRESHOLDED edge list (orders of magnitude smaller
    than the corpus) — one degree aggregate + two semi-joins, with a
    localCheckpoint per round for constant-depth lineage, PageRank's
    iterative discipline. Production k-max core numbers would loop
    until fixpoint with the same round body.
    """
    apply_engine_conf(spark)
    ev = table(spark, sf_dir, "events")
    cells = ev.select(
        F.date_trunc("hour", F.col("ts")).alias("h"), "user_id"
    ).distinct()
    co = _pairs_within_buckets(cells, "user_id", ["h"], distinct=False)
    pair_counts = (
        co.groupBy(F.col("doc_a").alias("u1"), F.col("doc_b").alias("u2"))
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=True)
    )
    cut = pair_counts.agg(
        (F.lit(EDGE_FACTOR) * F.avg("c")).alias("threshold")
    )
    edges = (
        pair_counts.crossJoin(F.broadcast(cut))
        .filter(F.col("c") > F.col("threshold"))
        .select("u1", "u2")
        .localCheckpoint(eager=True)
    )

    # r10 two-regime peel (the CC_DRIVER_EDGE_CAP pattern, guide
    # §1.2/§5): the peel runs on the THRESHOLDED edge list — already
    # orders of magnitude below the corpus — and at bench scale the
    # distributed rounds paid 2 blocking checkpoint jobs + a Catalyst
    # compile per round for microseconds of actual degree counting.
    # The eager checkpoint above already materialized the edges, so
    # the count is a cheap stored-blocks job and the collect below is
    # BOUNDED by the cap it gates on (≈2 MB — the broadcast-build
    # size class). Above the cap the distributed loop runs unchanged.
    from almost_any_file_to_pandas_spark.operators.dedup import (
        CC_DRIVER_EDGE_CAP,
    )

    n_edges0 = edges.count()
    if n_edges0 < CC_DRIVER_EDGE_CAP:
        from collections import Counter

        es = [(r["u1"], r["u2"]) for r in edges.collect()]
        deg = Counter()
        for a, b in es:
            deg[a] += 1
            deg[b] += 1
        rows = [(0, len(deg), len(es))]
        for r in range(1, KCORE_ROUNDS + 1):
            surv = {v for v, d in deg.items() if d >= KCORE_K}
            es = [(a, b) for a, b in es if a in surv and b in surv]
            deg = Counter()
            for a, b in es:
                deg[a] += 1
                deg[b] += 1
            rows.append((r, len(surv), len(es)))
        return spark.createDataFrame(
            rows, "round int, n_vertices long, n_edges long"
        )

    def endpoints(e: DataFrame) -> DataFrame:
        return e.select(F.col("u1").alias("v")).unionAll(
            e.select(F.col("u2").alias("v"))
        )

    def summary(rnd: int, n_vertices: DataFrame, e: DataFrame) -> DataFrame:
        return (
            n_vertices.agg(F.count("*").alias("n_vertices"))
            .crossJoin(e.agg(F.count("*").alias("n_edges")))
            .select(
                F.lit(rnd).alias("round"), "n_vertices", "n_edges"
            )
        )

    deg = endpoints(edges).groupBy("v").agg(F.count("*").alias("d"))
    out = summary(0, deg, edges)
    for r in range(1, KCORE_ROUNDS + 1):
        # Checkpointing the survivor set buys two things: fresh
        # attributes for the semi-joins (never the same-lineage
        # trivially-true predicate the skyline fixture pins), and one
        # materialization of the degree shuffle instead of three
        # recomputes (both semi-joins + the summary count) — measured
        # 6.3s vs 9.9s for the sf0.1 trajectory.
        surv = deg.filter(F.col("d") >= KCORE_K).select("v")
        surv = surv.localCheckpoint(eager=True)
        edges = (
            edges.join(
                surv.withColumnRenamed("v", "u1"), "u1", "left_semi"
            )
            .join(surv.withColumnRenamed("v", "u2"), "u2", "left_semi")
            .select("u1", "u2")
            .localCheckpoint(eager=True)
        )
        deg = endpoints(edges).groupBy("v").agg(F.count("*").alias("d"))
        out = out.unionAll(summary(r, surv, edges))
    return out


LINKPRED_TOP = 20


def _linkpred_sql() -> str:
    return f"""
    WITH cells AS (
      SELECT DISTINCT date_trunc('hour', ts) AS h, user_id FROM events
    ), hours_ok AS ({_HOURS_OK_SQL}
    ), pair_counts AS (
      SELECT a.user_id AS u1, b.user_id AS u2, COUNT(*) AS c
      FROM cells a JOIN cells b ON a.h = b.h AND a.user_id < b.user_id
      JOIN hours_ok ho ON ho.h = a.h
      GROUP BY a.user_id, b.user_id
    ), cut AS (
      SELECT {EDGE_FACTOR} * AVG(c) AS threshold FROM pair_counts
    ), edges AS (
      SELECT u1, u2 FROM pair_counts CROSS JOIN cut
      WHERE c > cut.threshold
    ), sym AS (
      SELECT u1 AS u, u2 AS v FROM edges
      UNION ALL
      SELECT u2 AS u, u1 AS v FROM edges
    ), deg AS (
      SELECT u, COUNT(*) AS d FROM sym GROUP BY u
    ), cn AS (
      SELECT a.u AS ua, b.u AS ub, COUNT(*) AS c
      FROM sym a JOIN sym b ON a.v = b.v AND a.u < b.u
      GROUP BY 1, 2
    ), nonedge AS (
      SELECT c.ua, c.ub, c.c FROM cn c
      WHERE NOT EXISTS (
        SELECT 1 FROM edges e WHERE e.u1 = c.ua AND e.u2 = c.ub)
    ), scored AS (
      SELECT ne.ua, ne.ub, ne.c,
             ne.c * 1000000 // (da.d + db.d - ne.c) AS jacc_q6
      FROM nonedge ne
      JOIN deg da ON da.u = ne.ua
      JOIN deg db ON db.u = ne.ub
    )
    SELECT CAST(ua AS BIGINT) AS u1, CAST(ub AS BIGINT) AS u2,
           CAST(c AS BIGINT) AS common_neighbors,
           CAST(jacc_q6 AS BIGINT) AS jacc_q6,
           CAST(ROW_NUMBER() OVER (ORDER BY jacc_q6 DESC, ua, ub)
                AS INTEGER) AS rnk
    FROM scored
    QUALIFY ROW_NUMBER() OVER (ORDER BY jacc_q6 DESC, ua, ub)
            <= {LINKPRED_TOP}
    """


def _coactivity_graph(spark: SparkSession, sf_dir: str):
    """(edges, sym) of the mean-thresholded hour-co-activity graph —
    the shared build of both link-prediction operators (identical to
    the LPA/k-core construction; duplicated there because those
    operators are gate-frozen). Both frames are localCheckpointed:
    edges feeds the anti join, sym feeds wedges (×2) and degrees."""
    ev = table(spark, sf_dir, "events")
    cells = ev.select(
        F.date_trunc("hour", F.col("ts")).alias("h"), "user_id"
    ).distinct()
    co = _pairs_within_buckets(cells, "user_id", ["h"], distinct=False)
    pair_counts = (
        co.groupBy(F.col("doc_a").alias("u1"), F.col("doc_b").alias("u2"))
        .agg(F.count("*").alias("c"))
    )
    pair_counts = pair_counts.localCheckpoint()
    cut = pair_counts.agg(
        (F.lit(EDGE_FACTOR) * F.avg("c")).alias("threshold")
    )
    edges = (
        pair_counts.crossJoin(F.broadcast(cut))
        .filter(F.col("c") > F.col("threshold"))
        .select("u1", "u2")
        .localCheckpoint(eager=True)
    )
    sym = edges.select(
        F.col("u1").alias("u"), F.col("u2").alias("v")
    ).unionAll(
        edges.select(F.col("u2").alias("u"), F.col("u1").alias("v"))
    ).localCheckpoint(eager=True)
    return edges, sym


@register("graph_jaccard_link_prediction", oracle=_linkpred_sql())
def graph_jaccard_link_prediction(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Link prediction by neighborhood Jaccard (Liben-Nowell & Klein-
    berg 2003) on the hour-co-activity graph: for each NON-adjacent
    user pair sharing ≥1 neighbor, score
    ``|Γ(u)∩Γ(v)| div (du + dv − |∩|)`` (exact q6 integer — the
    union by inclusion-exclusion, no set materialization) and emit
    the top-{LINKPRED_TOP} predicted links. Completes the graph
    family's analytics arc: census (triangles) → communities (LPA)
    → cores (k-core) → PREDICTION.

    Plan: the shared capped-bucket edge build (one shuffle), then
    common-neighbor counting as ONE self-join of the symmetric edge
    list keyed on the shared endpoint — the wedge walk, Σ deg²-
    bounded, same cost class as the triangle census — a hash
    aggregate on the (a, b) wedge ends, degree joins keyed on node,
    an existing-edge ANTI join, and a TakeOrderedAndProject top-k.
    No window touches anything corpus-sized; ties break (score DESC,
    u1, u2) on exact integers in both engines.
    """
    apply_engine_conf(spark)
    edges, sym = _coactivity_graph(spark, sf_dir)
    deg = sym.groupBy("u").agg(F.count("*").alias("d"))
    s1 = sym.select(F.col("u").alias("ua"), F.col("v").alias("w"))
    s2 = sym.select(F.col("u").alias("ub"), F.col("v").alias("w"))
    cn = (
        s1.join(s2, "w")
        .filter(F.col("ua") < F.col("ub"))
        .groupBy("ua", "ub")
        .agg(F.count("*").alias("c"))
    )
    nonedge = cn.join(
        edges,
        (cn.ua == edges.u1) & (cn.ub == edges.u2),
        "left_anti",
    )
    scored = (
        nonedge.join(
            deg.select(F.col("u").alias("ua"), F.col("d").alias("da")),
            "ua",
        )
        .join(
            deg.select(F.col("u").alias("ub"), F.col("d").alias("db")),
            "ub",
        )
        .selectExpr(
            "ua",
            "ub",
            "c",
            "c * 1000000 div (da + db - c) AS jacc_q6",
        )
    )
    top = scored.orderBy(
        F.desc("jacc_q6"), F.asc("ua"), F.asc("ub")
    ).limit(LINKPRED_TOP)
    w = W.partitionBy(F.pmod(F.col("jacc_q6"), F.lit(1))).orderBy(
        F.desc("jacc_q6"), F.asc("ua"), F.asc("ub")
    )
    return top.withColumn(
        "rnk", F.row_number().over(w).cast("int")
    ).select(
        F.col("ua").cast("long").alias("u1"),
        F.col("ub").cast("long").alias("u2"),
        F.col("c").cast("long").alias("common_neighbors"),
        F.col("jacc_q6").cast("long").alias("jacc_q6"),
        "rnk",
    )


def _ra_links_sql() -> str:
    return f"""
    WITH cells AS (
      SELECT DISTINCT date_trunc('hour', ts) AS h, user_id FROM events
    ), hours_ok AS ({_HOURS_OK_SQL}
    ), pair_counts AS (
      SELECT a.user_id AS u1, b.user_id AS u2, COUNT(*) AS c
      FROM cells a JOIN cells b ON a.h = b.h AND a.user_id < b.user_id
      JOIN hours_ok ho ON ho.h = a.h
      GROUP BY a.user_id, b.user_id
    ), cut AS (
      SELECT {EDGE_FACTOR} * AVG(c) AS threshold FROM pair_counts
    ), edges AS (
      SELECT u1, u2 FROM pair_counts CROSS JOIN cut
      WHERE c > cut.threshold
    ), sym AS (
      SELECT u1 AS u, u2 AS v FROM edges
      UNION ALL
      SELECT u2 AS u, u1 AS v FROM edges
    ), deg AS (
      SELECT u, COUNT(*) AS d FROM sym GROUP BY u
    ), wedge AS (
      SELECT a.u AS ua, b.u AS ub,
             SUM(1000000 // dw.d) AS ra_q6,
             COUNT(*) AS common_neighbors
      FROM sym a
      JOIN sym b ON a.v = b.v AND a.u < b.u
      JOIN deg dw ON dw.u = a.v
      GROUP BY 1, 2
    ), nonedge AS (
      SELECT w.ua, w.ub, w.ra_q6, w.common_neighbors FROM wedge w
      WHERE NOT EXISTS (
        SELECT 1 FROM edges e WHERE e.u1 = w.ua AND e.u2 = w.ub)
    )
    SELECT CAST(ua AS BIGINT) AS u1, CAST(ub AS BIGINT) AS u2,
           CAST(common_neighbors AS BIGINT) AS common_neighbors,
           CAST(ra_q6 AS BIGINT) AS ra_q6,
           CAST(ROW_NUMBER() OVER (ORDER BY ra_q6 DESC, ua, ub)
                AS INTEGER) AS rnk
    FROM nonedge
    QUALIFY ROW_NUMBER() OVER (ORDER BY ra_q6 DESC, ua, ub)
            <= {LINKPRED_TOP}
    """


@register("graph_resource_allocation_links", oracle=_ra_links_sql())
def graph_resource_allocation_links(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Link prediction by the RESOURCE-ALLOCATION index (Zhou, Lü &
    Zhang 2009): ``RA(u,v) = Σ_{{w ∈ Γ(u)∩Γ(v)}} 1/deg(w)`` — the
    degree-weighted complement of :func:`graph_jaccard_link_
    prediction` (a shared hub predicts little; a shared low-degree
    neighbor predicts a lot). RA is chosen over Adamic-Adar exactly
    because it is LOG-FREE: each term is the exact integer
    ``1e6 div deg(w)`` (the per-term floor IS the stated score), so
    the whole ranking is engine-exact where AA's ``1/ln d`` never
    could be.

    Plan: identical wedge walk to the Jaccard op (shared
    :func:`_coactivity_graph` build) with ONE extra broadcast-sized
    join — the shared endpoint's degree rides the wedge row and the
    per-(u,v) score is a plain SUM, so the cost class is unchanged:
    Σ deg²-bounded wedge rows, anti join, TakeOrderedAndProject.
    """
    apply_engine_conf(spark)
    edges, sym = _coactivity_graph(spark, sf_dir)
    deg = sym.groupBy("u").agg(F.count("*").alias("d"))
    s1 = sym.select(F.col("u").alias("ua"), F.col("v").alias("w"))
    s2 = sym.select(F.col("u").alias("ub"), F.col("v").alias("w"))
    wedge = (
        s1.join(s2, "w")
        .filter(F.col("ua") < F.col("ub"))
        .join(deg.select(F.col("u").alias("w"), "d"), "w")
        .groupBy("ua", "ub")
        .agg(
            F.expr("SUM(1000000 div d)").alias("ra_q6"),
            F.count("*").alias("common_neighbors"),
        )
    )
    nonedge = wedge.join(
        edges,
        (wedge.ua == edges.u1) & (wedge.ub == edges.u2),
        "left_anti",
    )
    top = nonedge.orderBy(
        F.desc("ra_q6"), F.asc("ua"), F.asc("ub")
    ).limit(LINKPRED_TOP)
    w = W.partitionBy(F.pmod(F.col("ra_q6"), F.lit(1))).orderBy(
        F.desc("ra_q6"), F.asc("ua"), F.asc("ub")
    )
    return top.withColumn(
        "rnk", F.row_number().over(w).cast("int")
    ).select(
        F.col("ua").cast("long").alias("u1"),
        F.col("ub").cast("long").alias("u2"),
        F.col("common_neighbors").cast("long").alias("common_neighbors"),
        F.col("ra_q6").cast("long").alias("ra_q6"),
        "rnk",
    )


def _degree_dist_sql() -> str:
    return f"""
    WITH cells AS (
      SELECT DISTINCT date_trunc('hour', ts) AS h, user_id FROM events
    ), hours_ok AS ({_HOURS_OK_SQL}
    ), pair_counts AS (
      SELECT a.user_id AS u1, b.user_id AS u2, COUNT(*) AS c
      FROM cells a JOIN cells b ON a.h = b.h AND a.user_id < b.user_id
      JOIN hours_ok ho ON ho.h = a.h
      GROUP BY a.user_id, b.user_id
    ), cut AS (
      SELECT {EDGE_FACTOR} * AVG(c) AS threshold FROM pair_counts
    ), edges AS (
      SELECT u1, u2 FROM pair_counts CROSS JOIN cut
      WHERE c > cut.threshold
    ), sym AS (
      SELECT u1 AS u, u2 AS v FROM edges
      UNION ALL
      SELECT u2 AS u, u1 AS v FROM edges
    ), deg AS (
      SELECT u, COUNT(*) AS d FROM sym GROUP BY u
    ), with_zero AS (
      SELECT d FROM deg
      UNION ALL
      SELECT 0 AS d FROM (SELECT DISTINCT user_id FROM events) au
      WHERE NOT EXISTS (SELECT 1 FROM deg WHERE deg.u = au.user_id)
    )
    SELECT CAST(d AS BIGINT) AS degree,
           CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM with_zero GROUP BY d
    """


@register("graph_degree_distribution", oracle=_degree_dist_sql())
def graph_degree_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Degree histogram of the hour-co-activity graph, INCLUDING the
    degree-0 row (active users the edge threshold isolated) — the
    first diagnostic every graph-family operator's cost model reads:
    the wedge walks (triangles, LPA, link prediction) are Σ deg²-
    bounded, and this row is where that Σ deg² is measured rather
    than assumed. Same shared capped-bucket build as the rest of the
    family (identical CTEs in the oracle).

    Plan: the one edge-build shuffle, a node-keyed degree count, a
    |degrees|-group histogram aggregate, plus an anti-join of the
    distinct-user frame for the zero row — all frames from ``deg``
    onward are node- or domain-sized, never event-sized.
    """
    apply_engine_conf(spark)
    ev = table(spark, sf_dir, "events")
    edges, sym = _coactivity_graph(spark, sf_dir)
    deg = sym.groupBy("u").agg(F.count("*").alias("d"))
    zero = (
        ev.select("user_id").distinct()
        .join(deg, F.col("user_id") == F.col("u"), "left_anti")
        .select(F.lit(0).alias("d"))
    )
    return (
        deg.select("d")
        .unionAll(zero)
        .groupBy(F.col("d").cast("long").alias("degree"))
        .agg(F.count("*").cast("long").alias("n_nodes"))
    )


_EDGE_CTE_HEAD = f"""
    WITH cells AS (
      SELECT DISTINCT date_trunc('hour', ts) AS h, user_id FROM events
    ), hours_ok AS ({_HOURS_OK_SQL}
    ), pair_counts AS (
      SELECT a.user_id AS u1, b.user_id AS u2, COUNT(*) AS c
      FROM cells a JOIN cells b ON a.h = b.h AND a.user_id < b.user_id
      JOIN hours_ok ho ON ho.h = a.h
      GROUP BY a.user_id, b.user_id
    ), cut AS (
      SELECT {EDGE_FACTOR} * AVG(c) AS threshold FROM pair_counts
    ), edges AS (
      SELECT u1, u2 FROM pair_counts CROSS JOIN cut
      WHERE c > cut.threshold
    ), sym AS (
      SELECT u1 AS u, u2 AS v FROM edges
      UNION ALL
      SELECT u2 AS u, u1 AS v FROM edges
    )"""


@register(
    "graph_two_hop_reach",
    oracle=_EDGE_CTE_HEAD
    + """, hop2 AS (
      SELECT e1.u, e2.v AS w
      FROM sym e1 JOIN sym e2 ON e2.u = e1.v
      WHERE e2.v <> e1.u
      UNION ALL
      SELECT u, v AS w FROM sym
    ), deg AS (
      SELECT u, COUNT(*) AS d FROM sym GROUP BY u
    )
    SELECT h.u AS user_id,
           CAST(d.d AS BIGINT) AS degree,
           CAST(COUNT(DISTINCT h.w) AS BIGINT) AS reach_2hop
    FROM hop2 h JOIN deg d ON d.u = h.u
    GROUP BY h.u, d.d
    """,
)
def graph_two_hop_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-depth reach census: per node, degree and the distinct
    vertex count within ≤2 hops — the neighborhood-growth signal
    (local expander vs clustered) that complements the global
    distance-free metrics (CC, PageRank) and the local triangle
    census; in an abuse pipeline, 2-hop reach ≫ degree flags
    broker/bridge accounts.

    Plan/scale: the shared capped-bucket edge build
    (:func:`_coactivity_graph`, one shuffle), then the 2-hop set is
    ONE self-join of the symmetric edge list keyed on the shared
    endpoint — the wedge walk, Σ deg²-bounded like the triangle and
    link-prediction rows (the degree histogram row measures that
    bound on this exact graph) — unioned with the 1-hop list and
    collapsed by a distinct-count aggregate. Output is node-sized.
    """
    apply_engine_conf(spark)
    _, sym = _coactivity_graph(spark, sf_dir)
    e2 = sym.select(
        F.col("u").alias("mid"), F.col("v").alias("w")
    )
    hop2 = (
        sym.join(e2, F.col("v") == F.col("mid"))
        .filter(F.col("w") != F.col("u"))
        .select("u", "w")
        .unionAll(sym.select("u", F.col("v").alias("w")))
    )
    deg = sym.groupBy("u").agg(F.count("*").alias("d"))
    return (
        hop2.join(deg, "u")
        .groupBy(F.col("u").alias("user_id"), F.col("d"))
        .agg(F.countDistinct("w").alias("reach_2hop"))
        .select(
            "user_id",
            F.col("d").cast("long").alias("degree"),
            F.col("reach_2hop").cast("long"),
        )
    )


BFS_MAX_DEPTH = 3  # bounded-depth closure from the smallest-id seed


def _bfs_recursion_sql(sym_src: str) -> str:
    """The dialect-shared RECURSION text (Spark 4 executes
    `WITH RECURSIVE` natively since SPARK-24497; DuckDB always has),
    parameterized only by the symmetric-edge relation: the engine
    recurses over the MATERIALIZED (localCheckpoint) edge view —
    Spark re-evaluates non-recursive CTEs at every recursion level,
    so recursing over the raw edge-build chain re-ran the whole
    co-activity build per level (measured 23s at sf0.1; checkpointed
    form is seconds) — while the oracle inlines the same build as
    CTEs (DuckDB materializes them once)."""
    return f"""
    WITH RECURSIVE seed AS (
      SELECT MIN(u) AS u FROM {sym_src}
    ), walk(u, depth) AS (
      SELECT u, 0 FROM seed WHERE u IS NOT NULL
      UNION ALL
      SELECT DISTINCT s.v, w.depth + 1
      FROM walk w JOIN {sym_src} s ON s.u = w.u
      WHERE w.depth < {BFS_MAX_DEPTH}
    ), md AS (
      SELECT u, MIN(depth) AS d FROM walk GROUP BY u
    )
    SELECT CAST(d AS BIGINT) AS depth,
           CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM md GROUP BY d
    """


def _bfs_oracle() -> str:
    """Oracle: the shared co-activity edge CTEs inlined ahead of the
    SAME recursion text the engine runs (over its checkpointed sym
    view)."""
    recursion = _bfs_recursion_sql("sym")
    # splice the edge build between WITH RECURSIVE and seed
    head, tail = recursion.split("seed AS (", 1)
    return (
        head
        + f"""cells AS (
      SELECT DISTINCT date_trunc('hour', ts) AS h, user_id FROM events
    ), hours_ok AS (
      SELECT h FROM cells GROUP BY h
      HAVING COUNT(*) BETWEEN 2 AND {MAX_BUCKET_SIZE}
    ), pair_counts AS (
      SELECT a.user_id AS u1, b.user_id AS u2, COUNT(*) AS c
      FROM cells a JOIN cells b ON a.h = b.h AND a.user_id < b.user_id
      JOIN hours_ok ho ON ho.h = a.h
      GROUP BY a.user_id, b.user_id
    ), cut AS (
      SELECT {EDGE_FACTOR} * AVG(c) AS threshold FROM pair_counts
    ), edges AS (
      SELECT u1, u2 FROM pair_counts CROSS JOIN cut
      WHERE c > cut.threshold
    ), sym AS (
      SELECT u1 AS u, u2 AS v FROM edges
      UNION ALL
      SELECT u2 AS u, u1 AS v FROM edges
    ), seed AS ("""
        + tail
    )


@register("graph_reach_bfs_recursive", oracle=_bfs_oracle())
def graph_reach_bfs_recursive(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Bounded-depth BFS closure via Spark 4's NATIVE recursive CTE
    (`WITH RECURSIVE`, SPARK-24497) — a mechanism-parity row: the
    IDENTICAL query text runs on both engines (the seed's min-depth
    frontier census to depth {BFS_MAX_DEPTH} over the co-activity
    graph), exercising the engine's recursion operator rather than
    the DataFrame-loop form the scale-path rows use
    (``connected_components_alternating``'s checkpointed O(log n)
    rounds, LPA, k-core).

    Scale contract: the recursive arm SELECTs DISTINCT per level, so
    each level is bounded by |nodes| rows instead of enumerating
    deg^depth PATHS (the naive UNION ALL form measured 27.5s at
    sf0.1 where this form is seconds — no visited set, but the
    per-level dedup caps total work at depth·|edges|). Still an
    ego/bounded-depth mechanism: full-graph closure at 100 TB stays
    on the checkpointed alternating-CC loop, and this row documents
    the boundary between the two. The depth guard bounds recursion
    well under Spark's cteRecursionLevelLimit.
    """
    apply_engine_conf(spark)
    _, sym = _coactivity_graph(spark, sf_dir)
    view = "sym_bfs_r7"
    sym.createOrReplaceTempView(view)
    return spark.sql(_bfs_recursion_sql(view))


CC_DELTA_MOD = 5  # edges with md5(u:v) % 5 = 0 arrive as the delta


@register(
    "graph_cc_incremental_batch",
    oracle=f"""
    WITH RECURSIVE chained AS (
      SELECT doc_id AS u,
             LEAD(doc_id) OVER (
               PARTITION BY source, lang ORDER BY doc_id) AS v
      FROM documents
    ), e0 AS (
      SELECT u, v FROM chained WHERE v IS NOT NULL
    ), edges AS (
      SELECT u, v FROM e0 UNION SELECT v AS u, u AS v FROM e0
    ), reach AS (
      SELECT u, u AS lbl FROM (SELECT DISTINCT u FROM edges)
      UNION
      SELECT e.u, r.lbl FROM edges e JOIN reach r ON e.v = r.u
    ), comp AS (
      SELECT u, MIN(lbl) AS component_id FROM reach GROUP BY u
    ), sizes AS (
      SELECT component_id, COUNT(*) AS component_size FROM comp
      GROUP BY component_id
    )
    SELECT CAST(component_size AS BIGINT) AS component_size,
           CAST(COUNT(*) AS BIGINT) AS n_components,
           CAST(SUM(component_size) AS BIGINT) AS n_nodes
    FROM sizes GROUP BY component_size
    """,
)
def graph_cc_incremental_batch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """INCREMENTAL connected components — the nightly dedup-graph
    maintenance loop: yesterday's component labels absorb a batch of
    new edges WITHOUT recomputing the full graph. The (source, lang)
    doc-chain edge set is split by the portable edge hash
    (``md5(u:v) % {CC_DELTA_MOD} = 0`` → the delta, ~20%; the rest →
    the base): base labels come from the O(log n) alternating
    algorithm (`connected_components_alternating`), then each delta
    edge is PROJECTED onto base labels and the merge runs on the
    label-QUOTIENT graph — whose size is bounded by the number of
    delta-touched components, not the corpus. Final labels compose
    base → quotient, and the census (component-size histogram) must
    equal a from-scratch CC of the full edge set — the oracle
    recomputes exactly that via recursive reachability, so a wrong
    merge, a lost singleton, or a label collision breaks parity.

    Splitting by edge hash (not time) keeps the row oracle-checkable
    on static testdata while exercising the production contract: the
    delta merge's work is delta-proportional. At 100 TB the base
    labels are a stored table; this query prices only (a) one hash
    partition of the edge scan, (b) two broadcast-ready label joins,
    (c) alternating CC on the quotient frame — component-count-sized,
    orders of magnitude below the node count.
    """
    apply_engine_conf(spark)
    docs = table(spark, sf_dir, "documents")
    w = W.partitionBy("source", "lang").orderBy("doc_id")
    chained = docs.select(
        F.col("doc_id").alias("u"), F.lead("doc_id").over(w).alias("v")
    ).filter(F.col("v").isNotNull())
    is_delta = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.col("u").cast("string"),
                        F.col("v").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % CC_DELTA_MOD
        == 0
    )
    # lazy (r10): materialized by the base CC's first digest job — the
    # eager flag only added a separate blocking job (guide §5)
    edges = chained.withColumn("is_delta", is_delta).localCheckpoint(
        eager=False
    )
    base = edges.filter(~F.col("is_delta")).select("u", "v")
    delta = edges.filter(F.col("is_delta")).select("u", "v")
    # every node in the graph (base AND delta endpoints) gets a base
    # label; nodes unseen by the base edge set stay singletons
    nodes = (
        edges.select("u")
        .union(edges.select(F.col("v").alias("u")))
        .distinct()
    )
    base_lbl = (
        nodes.join(
            connected_components_alternating(base), "u", "left"
        )
        .select("u", F.coalesce("lbl", "u").alias("lbl"))
        # lazy (r10): forced by the quotient CC's first digest, which
        # reads base_lbl through the lu/lv joins
        .localCheckpoint(eager=False)
    )
    lu = base_lbl.select(
        F.col("u").alias("du"), F.col("lbl").alias("lu")
    )
    lv = base_lbl.select(
        F.col("u").alias("dv"), F.col("lbl").alias("lv")
    )
    quotient = (
        delta.join(lu, delta["u"] == lu["du"])
        .join(lv, delta["v"] == lv["dv"])
        .filter(F.col("lu") != F.col("lv"))
        .select(F.col("lu").alias("u"), F.col("lv").alias("v"))
        .distinct()
    )
    q_lbl = connected_components_alternating(quotient).select(
        F.col("u").alias("qlbl_key"), F.col("lbl").alias("qlbl")
    )
    final = base_lbl.join(
        q_lbl, base_lbl["lbl"] == q_lbl["qlbl_key"], "left"
    ).select(
        "u", F.coalesce("qlbl", "lbl").alias("component_id")
    )
    sizes = final.groupBy("component_id").agg(
        F.count("*").alias("component_size")
    )
    return sizes.groupBy("component_size").agg(
        F.count("*").cast("long").alias("n_components"),
        F.sum("component_size").cast("long").alias("n_nodes"),
    ).select(
        F.col("component_size").cast("long").alias("component_size"),
        "n_components",
        "n_nodes",
    )


HYPERBALL_TOL = 0.05  # per-node |est − exact| ≤ tol·exact (+1 slack)


@register(
    "graph_hyperball_reach_floor",
    oracle=_EDGE_CTE_HEAD
    + """, hop2 AS (
      SELECT e1.u, e2.v AS w
      FROM sym e1 JOIN sym e2 ON e2.u = e1.v
      WHERE e2.v <> e1.u
      UNION ALL
      SELECT u, v AS w FROM sym
    )
    SELECT h.u AS user_id,
           CAST(COUNT(DISTINCT h.w) AS BIGINT) AS reach_2hop,
           TRUE AS within_tol
    FROM hop2 h
    GROUP BY h.u
    """,
)
def graph_hyperball_reach_floor(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """One HyperBall iteration (Boldi & Vigna 2013 — the canonical
    web-scale neighborhood-function / effective-diameter algorithm):
    each node keeps a FIXED-SIZE HLL sketch of its ball; round t
    unions every neighbor's round-(t−1) sketch. Here: closed 1-hop
    sketches (``hll_sketch_agg``) → one union round
    (``hll_union_agg`` over the edge join) → |ball₂(v)| estimates,
    verified per node against the EXACT 2-hop reach (the
    ``graph_two_hop_reach`` wedge walk) with the sketch-family
    tolerance harness: the emitted boolean claims
    |est − (exact+1)| ≤ {HYPERBALL_TOL}·(exact+1) + 1 (the +1s: the
    closed ball includes the node itself; sparse-mode HLL at lgK=14
    is near-exact at these neighborhood sizes), and the oracle pins
    it TRUE beside independently computed exact counts.

    Why this matters at 100 TB: the exact wedge walk is Σdeg²-bounded
    and the t-hop generalization explodes combinatorially, while
    HyperBall rounds are each ONE edges⋈sketches join + ONE grouped
    register union of fixed-size blobs — t rounds cost t·|E| regardless
    of ball sizes. The exact anchor here is the correctness harness
    only; production keeps sketches."""
    apply_engine_conf(spark)
    _, sym = _coactivity_graph(spark, sf_dir)
    closed = sym.unionAll(
        sym.select("u").distinct().select(
            F.col("u"), F.col("u").alias("v")
        )
    )
    sk1 = closed.groupBy("u").agg(
        F.expr("hll_sketch_agg(v, 14)").alias("sk")
    )
    sk1 = sk1.localCheckpoint(eager=True)  # feeds both union arms
    neighbor_sketches = sym.join(
        sk1.select(F.col("u").alias("v"), "sk"), "v"
    ).select("u", "sk")
    ball2 = (
        neighbor_sketches.unionAll(sk1.select("u", "sk"))
        .groupBy("u")
        .agg(
            F.expr(
                "CAST(hll_sketch_estimate(hll_union_agg(sk))"
                " AS DOUBLE)"
            ).alias("est")
        )
    )
    e2 = sym.select(F.col("u").alias("mid"), F.col("v").alias("w"))
    hop2 = (
        sym.join(e2, F.col("v") == F.col("mid"))
        .filter(F.col("w") != F.col("u"))
        .select("u", "w")
        .unionAll(sym.select("u", F.col("v").alias("w")))
    )
    exact = hop2.groupBy("u").agg(
        F.countDistinct("w").alias("reach_2hop")
    )
    closed_exact = F.col("reach_2hop") + 1  # the ball includes self
    return exact.join(ball2, "u").select(
        F.col("u").alias("user_id"),
        F.col("reach_2hop").cast("long").alias("reach_2hop"),
        (
            F.abs(F.col("est") - closed_exact)
            <= F.lit(HYPERBALL_TOL) * closed_exact + F.lit(1.0)
        ).alias("within_tol"),
    )
