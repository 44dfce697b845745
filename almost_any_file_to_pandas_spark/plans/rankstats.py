"""Nonparametric / robust rank statistics over the TPC-H-ish tables.

The reference (a pandas file ingester) has no statistics surface;
these operators extend the engine with the distribution-free tests a
data-quality or experimentation pipeline runs at scale: Spearman and
Kendall rank correlation, the Mann-Whitney U shift test, the
Wald-Wolfowitz runs test, the Fano burstiness factor, the
Hodges-Lehmann shift estimator, and isotonic regression via its
minimax closed form.

Engine-portability discipline (SURVEY.md invariants): every statistic
is computed in EXACT integer arithmetic — cents quantization via
``FLOOR(x*100+0.5)``, doubled ranks so tie-averaged ranks stay
integral, q6/q12 fixed-point ratios via widened integer division
(``DECIMAL(38,0)`` on Spark, ``HUGEINT`` on DuckDB — integer
operands only, because DuckDB ``//`` on DECIMAL rounds first), no
transcendentals, no ORDER-sensitive double sums.

Scale notes (100 TB mindset): every operator here reduces the fact
table to a BOUNDED intermediate before any global-order window runs —
the calendar-day frame (≤ a few thousand rows regardless of corpus
size), the value census (distinct cents values), or the 11-level
discount domain. Windows without ``partitionBy`` appear ONLY over
those bounded frames; the corpus-sized work is always a single
map-side-combinable hash aggregate. That is the same
bounded-model-state discipline as the Markov/EWMA/histogram-cube
operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from almost_any_file_to_pandas_spark.plans import register, table, table_wide
from almost_any_file_to_pandas_spark.session import apply_engine_conf

CENTS = "CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)"

# Shared daily-orders frame: one corpus-sized hash aggregate reduces
# orders to (day, order count, revenue cents) — calendar-bounded
# (~2.4k rows at any SF), so downstream unpartitioned windows and
# pair joins are constant-size in corpus terms.
DAILY_SQL = f"""
      SELECT o_orderdate AS d,
             COUNT(*) AS x,
             CAST(SUM({CENTS}) AS BIGINT) AS y
      FROM orders GROUP BY 1
"""


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.count("*").alias("x"),
        F.expr(f"CAST(SUM({CENTS}) AS BIGINT)").alias("y"),
    )


@register(
    "orders_spearman_daily",
    oracle=f"""
    WITH daily AS ({DAILY_SQL}),
    ranked AS (
      SELECT 2 * RANK() OVER (ORDER BY x)
               + COUNT(*) OVER (PARTITION BY x) - 1 AS rx2,
             2 * RANK() OVER (ORDER BY y)
               + COUNT(*) OVER (PARTITION BY y) - 1 AS ry2
      FROM daily
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           COALESCE(CAST(SUM((rx2 - ry2) * (rx2 - ry2)) AS BIGINT), 0)
             AS s4,
           -- rho is undefined below two days (n(n^2-1) = 0)
           CASE WHEN COUNT(*) < 2 THEN NULL
                ELSE CAST(1000000
                - CAST(3 * SUM(CAST((rx2 - ry2) AS HUGEINT)
                               * (rx2 - ry2)) * 1000000 AS HUGEINT)
                  // (2 * COUNT(*)
                      * (CAST(COUNT(*) AS HUGEINT) * COUNT(*) - 1))
                AS BIGINT) END AS rho_q6
    FROM ranked
    """,
)
def orders_spearman_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between daily order COUNT and daily
    revenue — the distribution-free monotone-association monitor.

    Ties use average ranks kept integral by DOUBLING: a value in a
    tie group of size t with min-rank r has 2·avg_rank = 2r + t − 1,
    so d² sums stay exact integers (s4 = Σ(2dᵢ)² = 4Σdᵢ²) and
    ρ = 1 − 6Σd²/(n(n²−1)) becomes the all-integer
    ``1e6 − (3·s4·1e6) div (2n(n²−1))``.

    Scale: one hash aggregate reduces orders to the calendar frame;
    both rank windows and the final fold run over ≤ a few thousand
    rows. No corpus-sized sort anywhere.
    """
    apply_engine_conf(spark)
    daily = _daily(spark, sf_dir)
    ranked = daily.select(
        (
            2 * F.rank().over(W.orderBy("x"))
            + F.count("*").over(W.partitionBy("x"))
            - 1
        ).alias("rx2"),
        (
            2 * F.rank().over(W.orderBy("y"))
            + F.count("*").over(W.partitionBy("y"))
            - 1
        ).alias("ry2"),
    )
    return ranked.agg(
        F.count("*").cast("long").alias("n_days"),
        F.expr(
            "COALESCE(CAST(SUM((rx2 - ry2) * (rx2 - ry2)) AS BIGINT),"
            " 0)"
        ).alias("s4"),
        F.expr(
            "CASE WHEN COUNT(*) < 2 THEN NULL ELSE"
            " CAST(1000000"
            " - CAST(3 * SUM(CAST(rx2 - ry2 AS DECIMAL(38,0))"
            "              * (rx2 - ry2)) * 1000000 AS DECIMAL(38,0))"
            "   div (2 * COUNT(*)"
            "        * (CAST(COUNT(*) AS DECIMAL(38,0)) * COUNT(*) - 1))"
            " AS BIGINT) END"
        ).alias("rho_q6"),
    )


MW_GROUP_A = "1-URGENT"
MW_GROUP_B = "5-LOW"


@register(
    "orders_mannwhitney_priority_shift",
    oracle=f"""
    WITH census AS (
      SELECT {CENTS} AS cents,
             SUM(CASE WHEN o_orderpriority = '{MW_GROUP_A}'
                 THEN 1 ELSE 0 END) AS a_v,
             SUM(CASE WHEN o_orderpriority = '{MW_GROUP_B}'
                 THEN 1 ELSE 0 END) AS b_v
      FROM orders
      WHERE o_orderpriority IN ('{MW_GROUP_A}', '{MW_GROUP_B}')
      GROUP BY 1
    ), walk AS (
      SELECT a_v, b_v,
             SUM(b_v) OVER (ORDER BY cents
                            ROWS UNBOUNDED PRECEDING) - b_v AS b_lt
      FROM census
    ), folded AS (
      SELECT CAST(SUM(a_v) AS BIGINT) AS n_a,
             CAST(SUM(b_v) AS BIGINT) AS n_b,
             CAST(SUM(CAST(a_v AS HUGEINT) * (2 * b_lt + b_v))
                  AS HUGEINT) AS u2_a
      FROM walk
    )
    SELECT n_a, n_b, CAST(u2_a AS BIGINT) AS u2_a,
           CAST(u2_a * 1000000
                // (2 * CAST(n_a AS HUGEINT) * n_b) AS BIGINT)
             AS cles_q6
    FROM folded
    """,
)
def orders_mannwhitney_priority_shift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mann-Whitney U between URGENT and LOW order values — the
    rank-sum shift test, computed over the VALUE CENSUS instead of
    per-row ranks (the trimmed-mean argument: the walk window runs
    over distinct cents values, never corpus rows).

    Doubled U stays integral under midrank ties: for each distinct
    value, its a_v copies each score 2·(#B strictly below) + (#B
    tied), so ``u2_a = Σ a_v·(2·b_lt + b_v) = 2·U_A`` exactly.
    ``cles_q6`` is the common-language effect size U_A/(n_a·n_b)
    (probability a random URGENT order outprices a random LOW one,
    counting ties half) in exact q6.
    """
    apply_engine_conf(spark)
    orders = table(spark, sf_dir, "orders")
    census = (
        orders.filter(
            F.col("o_orderpriority").isin(MW_GROUP_A, MW_GROUP_B)
        )
        .groupBy(F.expr(CENTS).alias("cents"))
        .agg(
            F.sum(
                F.when(
                    F.col("o_orderpriority") == MW_GROUP_A, 1
                ).otherwise(0)
            ).alias("a_v"),
            F.sum(
                F.when(
                    F.col("o_orderpriority") == MW_GROUP_B, 1
                ).otherwise(0)
            ).alias("b_v"),
        )
    )
    walk = census.select(
        "a_v",
        "b_v",
        (
            F.sum("b_v").over(
                W.orderBy("cents").rowsBetween(W.unboundedPreceding, 0)
            )
            - F.col("b_v")
        ).alias("b_lt"),
    )
    folded = walk.agg(
        F.expr("CAST(SUM(a_v) AS BIGINT)").alias("n_a"),
        F.expr("CAST(SUM(b_v) AS BIGINT)").alias("n_b"),
        F.expr(
            "CAST(SUM(CAST(a_v AS DECIMAL(38,0)) * (2 * b_lt + b_v))"
            " AS DECIMAL(38,0))"
        ).alias("u2_wide"),
    )
    return folded.select(
        "n_a",
        "n_b",
        F.expr("CAST(u2_wide AS BIGINT)").alias("u2_a"),
        F.expr(
            "CAST(u2_wide * 1000000"
            " div (2 * CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)"
        ).alias("cles_q6"),
    )


@register(
    "orders_kendall_tau_daily",
    oracle=f"""
    WITH daily AS ({DAILY_SQL}),
    pairs AS (
      SELECT CASE WHEN (a.x < b.x AND a.y < b.y)
                    OR (a.x > b.x AND a.y > b.y) THEN 1 ELSE 0
             END AS conc,
             CASE WHEN (a.x < b.x AND a.y > b.y)
                    OR (a.x > b.x AND a.y < b.y) THEN 1 ELSE 0
             END AS disc
      FROM daily a JOIN daily b ON a.d < b.d
    ), n AS (SELECT COUNT(*) AS n_days FROM daily)
    -- global fold (not grouped by the pair join's output): the
    -- summary row must survive an empty/one-day frame, where the
    -- pair join is empty and tau is undefined (NULL)
    SELECT (SELECT CAST(n_days AS BIGINT) FROM n) AS n_days,
           COALESCE(CAST(SUM(conc) AS BIGINT), 0) AS concordant,
           COALESCE(CAST(SUM(disc) AS BIGINT), 0) AS discordant,
           CASE WHEN (SELECT n_days FROM n) < 2 THEN NULL
                ELSE CAST(
                  CAST(2 * (SUM(conc) - SUM(disc)) * 1000000 AS HUGEINT)
                  // ((SELECT CAST(n_days AS HUGEINT) FROM n)
                      * ((SELECT n_days FROM n) - 1))
                  AS BIGINT) END AS tau_a_q6
    FROM pairs
    """,
)
def orders_kendall_tau_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-a between daily order count and daily revenue —
    concordant/discordant pair counting over the calendar frame.

    The pair self-join is calendar² (≤ ~6M pairs regardless of corpus
    size — the Hodges-Lehmann/Theil-Sen argument), with the smaller
    side broadcast so no shuffle touches it. tau-a's denominator
    n(n−1)/2 keeps the statistic rational: ``tau_a_q6 =
    (2(C−D)·1e6) div (n(n−1))`` — exact integer, truncation toward
    zero identical in both engines (integer operands only).
    """
    apply_engine_conf(spark)
    daily = _daily(spark, sf_dir)
    a = daily.select(
        F.col("d").alias("ad"), F.col("x").alias("ax"),
        F.col("y").alias("ay"),
    )
    b = daily.select(
        F.col("d").alias("bd"), F.col("x").alias("bx"),
        F.col("y").alias("by"),
    )
    pairs = a.join(F.broadcast(b), F.col("ad") < F.col("bd")).select(
        F.when(
            ((F.col("ax") < F.col("bx")) & (F.col("ay") < F.col("by")))
            | ((F.col("ax") > F.col("bx")) & (F.col("ay") > F.col("by"))),
            1,
        )
        .otherwise(0)
        .alias("conc"),
        F.when(
            ((F.col("ax") < F.col("bx")) & (F.col("ay") > F.col("by")))
            | ((F.col("ax") > F.col("bx")) & (F.col("ay") < F.col("by"))),
            1,
        )
        .otherwise(0)
        .alias("disc"),
    )
    n = daily.agg(F.count("*").alias("n_days"))
    return (
        pairs.agg(
            F.sum("conc").alias("c"), F.sum("disc").alias("dd")
        )
        .crossJoin(F.broadcast(n))
        .select(
            F.col("n_days").cast("long").alias("n_days"),
            F.coalesce(F.col("c").cast("long"), F.lit(0)).alias(
                "concordant"
            ),
            F.coalesce(F.col("dd").cast("long"), F.lit(0)).alias(
                "discordant"
            ),
            F.expr(
                "CASE WHEN n_days < 2 THEN NULL ELSE"
                " CAST(CAST(2 * (c - dd) * 1000000 AS DECIMAL(38,0))"
                " div (CAST(n_days AS DECIMAL(38,0)) * (n_days - 1))"
                " AS BIGINT) END"
            ).alias("tau_a_q6"),
        )
    )


@register(
    "orders_runs_test_daily",
    oracle=f"""
    WITH daily AS ({DAILY_SQL}),
    census AS (
      SELECT y, COUNT(*) AS cnt FROM daily GROUP BY 1
    ), walk AS (
      SELECT y, SUM(cnt) OVER (ORDER BY y
                               ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(cnt) OVER () AS n
      FROM census
    ), med AS (
      SELECT MIN(y) AS med FROM walk WHERE cum >= (n + 1) // 2
    ), signs AS (
      SELECT d, CASE WHEN y > med THEN 1 ELSE 0 END AS s
      FROM daily, med WHERE y <> med
    ), flips AS (
      SELECT s, CASE WHEN s <> LAG(s) OVER (ORDER BY d)
                THEN 1 ELSE 0 END AS flip
      FROM signs
    )
    SELECT CAST(SUM(s) AS BIGINT) AS n_plus,
           CAST(SUM(1 - s) AS BIGINT) AS n_minus,
           CAST(1 + SUM(flip) AS BIGINT) AS n_runs,
           CAST(1000000
                + CAST(2 * SUM(s) * SUM(1 - s) AS HUGEINT) * 1000000
                  // (SUM(s) + SUM(1 - s)) AS BIGINT)
             AS expected_runs_q6
    FROM flips
    """,
)
def orders_runs_test_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on daily revenue vs its median — the
    distribution-free randomness screen (too FEW runs ⇒ trend /
    regime persistence; too MANY ⇒ oscillation).

    Median is the LOWER median picked off the daily-revenue census
    walk (rank ``(n+1) div 2`` — all-integer, no percentile
    interpolation); days equal to the median drop (the standard
    dichotomization), signs flip-count via one lag window over the
    calendar frame. ``expected_runs_q6 = 1 + 2·n₊·n₋/(n₊+n₋)`` in
    exact q6 for the z-free comparison.
    """
    apply_engine_conf(spark)
    daily = _daily(spark, sf_dir).cache()
    census = daily.groupBy("y").agg(F.count("*").alias("cnt"))
    walk = census.select(
        "y",
        F.sum("cnt")
        .over(W.orderBy("y").rowsBetween(W.unboundedPreceding, 0))
        .alias("cum"),
        F.sum("cnt").over(
            W.orderBy("y").rowsBetween(
                W.unboundedPreceding, W.unboundedFollowing
            )
        ).alias("n"),
    )
    med = walk.filter(F.expr("cum >= (n + 1) div 2")).agg(
        F.min("y").alias("med")
    )
    signs = (
        daily.crossJoin(F.broadcast(med))
        .filter(F.col("y") != F.col("med"))
        .select(
            "d", F.when(F.col("y") > F.col("med"), 1).otherwise(0).alias("s")
        )
    )
    flips = signs.select(
        "s",
        F.when(
            F.col("s") != F.lag("s").over(W.orderBy("d")), 1
        )
        .otherwise(0)
        .alias("flip"),
    )
    return flips.agg(
        F.expr("CAST(SUM(s) AS BIGINT)").alias("n_plus"),
        F.expr("CAST(SUM(1 - s) AS BIGINT)").alias("n_minus"),
        F.expr("CAST(1 + SUM(flip) AS BIGINT)").alias("n_runs"),
        F.expr(
            "CAST(1000000"
            " + CAST(2 * SUM(s) * SUM(1 - s) AS DECIMAL(38,0)) * 1000000"
            "   div (SUM(s) + SUM(1 - s)) AS BIGINT)"
        ).alias("expected_runs_q6"),
    )


US_PER_HOUR = 3_600_000_000


@register(
    "events_burstiness_fano",
    oracle=f"""
    WITH hourly AS (
      SELECT event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) // {US_PER_HOUR} AS h,
             COUNT(*) AS c
      FROM events GROUP BY 1, 2
    ), span AS (
      SELECT MAX(h) - MIN(h) + 1 AS n_hours FROM hourly
    ), per_type AS (
      SELECT event_type,
             CAST(SUM(c) AS BIGINT) AS n_events,
             CAST(COUNT(*) AS BIGINT) AS nonzero_hours,
             CAST(SUM(CAST(c AS HUGEINT) * c) AS HUGEINT) AS q
      FROM hourly GROUP BY 1
    )
    SELECT event_type,
           CAST(span.n_hours AS BIGINT) AS n_hours,
           n_events, nonzero_hours,
           CAST((CAST(span.n_hours AS HUGEINT) * q
                 - CAST(n_events AS HUGEINT) * n_events) * 1000000
                // (CAST(span.n_hours AS HUGEINT) * n_events)
                AS BIGINT) AS fano_q6
    FROM per_type, span
    """,
)
def events_burstiness_fano(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano factor (variance-to-mean ratio) of hourly event counts
    per type over the dense global hour spine — the burstiness
    monitor (≈1e6 ⇒ Poisson-like, ≫1e6 ⇒ bursty, ≪1e6 ⇒ regular).

    The dense spine is never materialized: zero hours contribute 0 to
    both Σc and Σc², so with n = global hour span (max−min+1 in
    integer epoch-hours), ``var·n² = n·Σc² − S²`` and
    ``fano_q6 = (n·Σc² − S²)·1e6 div (n·S)`` — all exact integers
    off ONE (type, hour) hash aggregate plus a per-type fold. The
    scalar span broadcasts; no window, no join on the fact table.
    """
    apply_engine_conf(spark)
    events = table(spark, sf_dir, "events")
    hourly = events.groupBy(
        "event_type",
        F.expr(f"unix_micros(ts) div {US_PER_HOUR}").alias("h"),
    ).agg(F.count("*").alias("c"))
    hourly = hourly.cache()
    span = hourly.agg(
        (F.max("h") - F.min("h") + 1).alias("n_hours")
    )
    per_type = hourly.groupBy("event_type").agg(
        F.expr("CAST(SUM(c) AS BIGINT)").alias("n_events"),
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("nonzero_hours"),
        F.expr(
            "CAST(SUM(CAST(c AS DECIMAL(38,0)) * c) AS DECIMAL(38,0))"
        ).alias("q"),
    )
    return per_type.crossJoin(F.broadcast(span)).select(
        "event_type",
        F.col("n_hours").cast("long").alias("n_hours"),
        "n_events",
        "nonzero_hours",
        F.expr(
            "CAST((CAST(n_hours AS DECIMAL(38,0)) * q"
            "      - CAST(n_events AS DECIMAL(38,0)) * n_events)"
            "     * 1000000"
            " div (CAST(n_hours AS DECIMAL(38,0)) * n_events)"
            " AS BIGINT)"
        ).alias("fano_q6"),
    )


HL_DAILY_SQL = f"""
      SELECT o_orderdate AS d, o_orderpriority AS pr,
             CAST(SUM({CENTS}) AS BIGINT) AS y
      FROM orders
      WHERE o_orderpriority IN ('{MW_GROUP_A}', '{MW_GROUP_B}')
      GROUP BY 1, 2
"""


@register(
    "orders_hodges_lehmann_shift",
    oracle=f"""
    WITH daily AS ({HL_DAILY_SQL}),
    a AS (SELECT y FROM daily WHERE pr = '{MW_GROUP_A}'),
    b AS (SELECT y FROM daily WHERE pr = '{MW_GROUP_B}'),
    diffs AS (
      SELECT a.y - b.y AS diff, COUNT(*) AS cnt
      FROM a, b GROUP BY 1
    ), walk AS (
      SELECT diff, cnt,
             SUM(cnt) OVER (ORDER BY diff
                            ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(cnt) OVER () AS m
      FROM diffs
    ), lo AS (
      SELECT diff AS v1, m FROM walk
      WHERE cum >= (m + 1) // 2 AND cum - cnt < (m + 1) // 2
    ), hi AS (
      SELECT diff AS v2 FROM walk
      WHERE cum >= (m + 2) // 2 AND cum - cnt < (m + 2) // 2
    )
    SELECT CAST(lo.m AS BIGINT) AS m_pairs,
           CAST(lo.v1 + hi.v2 AS BIGINT) AS hl_shift_cents_x2
    FROM lo, hi
    """,
)
def orders_hodges_lehmann_shift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hodges-Lehmann estimator of the URGENT−LOW shift in DAILY
    revenue: the median of all pairwise differences — the robust
    companion to the Mann-Whitney test (30% breakdown, no Gaussian
    assumption).

    Pairs are calendar × calendar (≤ ~6M regardless of corpus SF —
    the Kendall/Theil-Sen bound), built by broadcasting one daily
    side; the median is ``v@((M+1) div 2) + v@((M+2) div 2)``
    doubled to stay integral for even M. The rank walk over the
    pairwise-difference census is TWO-LEVEL (the histogram-cube
    refinement pattern): an arithmetic-shift bucket key
    (``diff >> 22`` — floor division, so negative diffs keep their
    order) gives a small bucket frame whose cumulative walk locates
    the 1–2 covering buckets; only rows of those buckets then rank
    within-bucket (window PARTITIONED by bucket), so no
    single-partition sort ever sees the multi-million-row census.
    The only fact-table pass is the (day, priority) hash aggregate.
    """
    apply_engine_conf(spark)
    orders = table(spark, sf_dir, "orders")
    daily = (
        orders.filter(
            F.col("o_orderpriority").isin(MW_GROUP_A, MW_GROUP_B)
        )
        .groupBy(
            F.col("o_orderdate").alias("d"),
            F.col("o_orderpriority").alias("pr"),
        )
        .agg(F.expr(f"CAST(SUM({CENTS}) AS BIGINT)").alias("y"))
        .cache()
    )
    a = daily.filter(F.col("pr") == MW_GROUP_A).select(
        F.col("y").alias("ya")
    )
    b = daily.filter(F.col("pr") == MW_GROUP_B).select(
        F.col("y").alias("yb")
    )
    # Pair generation stays inside whole-stage codegen: the LOW side
    # folds to ONE array row (calendar-bounded, ~2.4k longs) that
    # broadcasts and EXPLODES against each URGENT day — a generator,
    # not a BroadcastNestedLoopJoin (BNLJ emits row-at-a-time outside
    # codegen and costs ~5s per pass at this pair count).
    b_arr = b.agg(F.collect_list("yb").alias("ys"))
    pairs = (
        a.crossJoin(F.broadcast(b_arr))
        .select("ya", F.explode("ys").alias("yb"))
        .select((F.col("ya") - F.col("yb")).alias("diff"))
    )
    # Level 1: coarse bucket counts straight off the streamed pair
    # generator (diff range div 2^22) — the full diff census (one
    # row per DISTINCT diff, ~pair-count groups) is never built, so
    # no multi-million-group hash aggregate or shuffle exists in the
    # plan. The bucket frame is small; its window is over buckets.
    bcounts = pairs.groupBy(
        F.expr("shiftright(diff, 22)").alias("bucket")
    ).agg(F.count("*").alias("bc"))
    bwalk = bcounts.select(
        "bucket",
        "bc",
        F.sum("bc")
        .over(W.orderBy("bucket").rowsBetween(W.unboundedPreceding, 0))
        .alias("bcum"),
        F.sum("bc")
        .over(
            W.orderBy("bucket").rowsBetween(
                W.unboundedPreceding, W.unboundedFollowing
            )
        )
        .alias("m"),
    )
    targets = bwalk.select("m").limit(1).select(
        "m",
        F.explode(
            F.array(
                F.expr("(m + 1) div 2"), F.expr("(m + 2) div 2")
            )
        ).alias("r"),
    ).withColumn("tag", F.expr("row_number() over (order by r)")).drop(
        "m"
    )
    cover = bwalk.join(
        F.broadcast(targets),
        (F.col("bcum") >= F.col("r"))
        & (F.col("bcum") - F.col("bc") < F.col("r")),
    ).select(
        "tag",
        "r",
        "m",
        F.col("bucket").alias("cb"),
        (F.col("bcum") - F.col("bc")).alias("base"),
    )
    # Level 2: a second streamed pass over the pair generator,
    # hash-probed against the broadcast covering bucket(s) — only
    # ~1/n_buckets of pairs survive into the (now small) fine
    # census, whose rank window is PARTITIONED by tag. Never a
    # global sort, never a pair-sized shuffle.
    fine = (
        pairs.join(
            F.broadcast(cover),
            F.expr("shiftright(diff, 22)") == F.col("cb"),
        )
        .groupBy("tag", "r", "m", "base", "diff")
        .agg(F.count("*").alias("cnt"))
    )
    picked = fine.withColumn(
        "wcum",
        F.sum("cnt").over(
            W.partitionBy("tag")
            .orderBy("diff")
            .rowsBetween(W.unboundedPreceding, 0)
        ),
    ).filter(
        (F.col("base") + F.col("wcum") >= F.col("r"))
        & (F.col("base") + F.col("wcum") - F.col("cnt") < F.col("r"))
    )
    return picked.agg(
        F.max("m").cast("long").alias("m_pairs"),
        F.expr("CAST(SUM(diff) AS BIGINT)").alias("hl_shift_cents_x2"),
        # no pairs (a priority group absent) → no estimator row, the
        # oracle's pick-join semantics; real corpora always have both
    ).filter(F.col("m_pairs").isNotNull())


@register(
    "lineitem_isotonic_return_rate",
    oracle="""
    WITH levels AS (
      SELECT CAST(FLOOR(l_discount * 100 + 0.5) AS INT) AS pct,
             COUNT(*) AS n,
             SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS r
      FROM lineitem GROUP BY 1
    ), pre AS (
      SELECT pct, n, r,
             SUM(n) OVER (ORDER BY pct
                          ROWS UNBOUNDED PRECEDING) AS cn,
             SUM(r) OVER (ORDER BY pct
                          ROWS UNBOUNDED PRECEDING) AS cr
      FROM levels
    ), intervals AS (
      SELECT lo.pct AS i, hi.pct AS j,
             CAST(CAST(hi.cr - lo.cr + lo.r AS HUGEINT)
                  * 1000000000000
                  // (hi.cn - lo.cn + lo.n) AS BIGINT) AS rate_q12
      FROM pre lo JOIN pre hi ON lo.pct <= hi.pct
    ), inner_min AS (
      SELECT k.pct AS pct, iv.i,
             MIN(iv.rate_q12) AS min_rate
      FROM levels k JOIN intervals iv
        ON iv.i <= k.pct AND k.pct <= iv.j
      GROUP BY 1, 2
    ), fit AS (
      SELECT pct, MAX(min_rate) AS fit_q12
      FROM inner_min GROUP BY 1
    )
    SELECT levels.pct AS discount_pct,
           CAST(levels.n AS BIGINT) AS n_items,
           CAST(levels.r AS BIGINT) AS n_returned,
           CAST(CAST(levels.r AS HUGEINT) * 1000000 // levels.n
                AS BIGINT) AS rate_q6,
           CAST(fit.fit_q12 // 1000000 AS BIGINT) AS iso_rate_q6
    FROM levels JOIN fit ON levels.pct = fit.pct
    """,
)
def lineitem_isotonic_return_rate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Isotonic (nondecreasing) regression of return rate on discount
    level via the MINIMAX closed form — the shape-constrained
    calibration fit (PAVA's output without PAVA's sequential pooling):
    ``fit(k) = max_{i≤k} min_{j≥k} rate(i..j)`` where rate(i..j) is
    the pooled returns/items over contiguous discount levels.

    The discount domain is 11 levels, so intervals (66), the
    (k, i, j) lattice (≤286 rows), and both min/max folds are
    constant-size — bounded-model-state over ONE corpus hash
    aggregate. Rational interval rates compare via identical q12
    integer quantization in both engines (deterministic even at
    sub-ulp gaps, the same discipline as the drift chi2).
    """
    apply_engine_conf(spark)
    lineitem = table(spark, sf_dir, "lineitem")
    levels = lineitem.groupBy(
        F.expr("CAST(FLOOR(l_discount * 100 + 0.5) AS INT)").alias("pct")
    ).agg(
        F.count("*").alias("n"),
        F.sum(
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
        ).alias("r"),
    ).cache()
    w_cum = W.orderBy("pct").rowsBetween(W.unboundedPreceding, 0)
    pre = levels.select(
        "pct",
        "n",
        "r",
        F.sum("n").over(w_cum).alias("cn"),
        F.sum("r").over(w_cum).alias("cr"),
    )
    lo = pre.select(
        F.col("pct").alias("i"),
        F.col("n").alias("lo_n"),
        F.col("r").alias("lo_r"),
        F.col("cn").alias("lo_cn"),
        F.col("cr").alias("lo_cr"),
    )
    hi = pre.select(
        F.col("pct").alias("j"),
        F.col("cn").alias("hi_cn"),
        F.col("cr").alias("hi_cr"),
    )
    intervals = lo.join(
        F.broadcast(hi), F.col("i") <= F.col("j")
    ).select(
        "i",
        "j",
        F.expr(
            "CAST(CAST(hi_cr - lo_cr + lo_r AS DECIMAL(38,0))"
            " * 1000000000000"
            " div (hi_cn - lo_cn + lo_n) AS BIGINT)"
        ).alias("rate_q12"),
    )
    k = levels.select(F.col("pct").alias("kpct"))
    lattice = intervals.join(
        F.broadcast(k),
        (F.col("i") <= F.col("kpct")) & (F.col("kpct") <= F.col("j")),
    )
    inner_min = lattice.groupBy("kpct", "i").agg(
        F.min("rate_q12").alias("min_rate")
    )
    fit = inner_min.groupBy("kpct").agg(
        F.max("min_rate").alias("fit_q12")
    )
    return levels.join(
        F.broadcast(fit), levels.pct == fit.kpct
    ).select(
        F.col("pct").alias("discount_pct"),
        F.col("n").cast("long").alias("n_items"),
        F.col("r").cast("long").alias("n_returned"),
        F.expr(
            "CAST(CAST(r AS DECIMAL(38,0)) * 1000000 div n AS BIGINT)"
        ).alias("rate_q6"),
        F.expr("CAST(fit_q12 div 1000000 AS BIGINT)").alias(
            "iso_rate_q6"
        ),
    )


@register(
    "lineitem_unpivot_measures",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             CAST(FLOOR(l_quantity * 1000000 + 0.5) AS BIGINT) AS qty,
             CAST(FLOOR(l_extendedprice * 1000000 + 0.5) AS BIGINT)
               AS price,
             CAST(FLOOR(l_discount * 1000000 + 0.5) AS BIGINT) AS disc
      FROM lineitem
    ), long AS (
      SELECT l_returnflag, 'qty' AS measure, qty AS val_micro FROM m
      UNION ALL
      SELECT l_returnflag, 'price', price FROM m
      UNION ALL
      SELECT l_returnflag, 'disc', disc FROM m
    )
    SELECT l_returnflag, measure,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(val_micro AS HUGEINT)) AS BIGINT) AS sum_micro,
           CAST(MIN(val_micro) AS BIGINT) AS min_micro,
           CAST(MAX(val_micro) AS BIGINT) AS max_micro
    FROM long GROUP BY 1, 2
    """,
)
def lineitem_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt) of the lineitem measure columns into long form,
    profiled per return flag — the wide→long reshape every feature
    store and metrics layer needs, via Spark's native ``unpivot``
    (one Expand node, NOT a 3-way self-union: the fact table is
    scanned ONCE and the 3× row expansion feeds straight into a
    map-side-combinable hash aggregate, so the shuffle carries only
    (flag, measure) partials — the column-profile Expand argument).

    Measures quantize to integer micro-units BEFORE the expand so
    every downstream aggregate is exact; the oracle's UNION ALL form
    is the semantic twin (DuckDB has no UNPIVOT-to-Expand contract).
    """
    apply_engine_conf(spark)
    li = table(spark, sf_dir, "lineitem")
    m = li.select(
        "l_returnflag",
        F.expr(
            "CAST(FLOOR(l_quantity * 1000000 + 0.5) AS BIGINT)"
        ).alias("qty"),
        F.expr(
            "CAST(FLOOR(l_extendedprice * 1000000 + 0.5) AS BIGINT)"
        ).alias("price"),
        F.expr(
            "CAST(FLOOR(l_discount * 1000000 + 0.5) AS BIGINT)"
        ).alias("disc"),
    )
    long = m.unpivot(
        ["l_returnflag"], ["qty", "price", "disc"], "measure", "val_micro"
    )
    return long.groupBy("l_returnflag", "measure").agg(
        F.count("*").cast("long").alias("n"),
        F.expr(
            "CAST(SUM(CAST(val_micro AS DECIMAL(38,0))) AS BIGINT)"
        ).alias("sum_micro"),
        F.min("val_micro").cast("long").alias("min_micro"),
        F.max("val_micro").cast("long").alias("max_micro"),
    )


@register(
    "orders_mom_revenue_growth",
    oracle=f"""
    WITH monthly AS (
      SELECT CAST(EXTRACT(year FROM o_orderdate) * 100
                  + EXTRACT(month FROM o_orderdate) AS BIGINT) AS yyyymm,
             CAST(SUM({CENTS}) AS BIGINT) AS cents
      FROM orders GROUP BY 1
    )
    SELECT yyyymm, cents,
           LAG(cents) OVER (ORDER BY yyyymm) AS prev_cents,
           CAST(CAST((cents - LAG(cents) OVER (ORDER BY yyyymm))
                     AS HUGEINT) * 1000000
                // LAG(cents) OVER (ORDER BY yyyymm) AS BIGINT)
             AS growth_q6
    FROM monthly
    """,
)
def orders_mom_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth — the windowed lag-ratio KPI,
    in exact q6 off the calendar-bounded monthly frame (one corpus
    hash aggregate; the lag window sees ≤ a few hundred rows). The
    growth numerator can be negative: both engines truncate integer
    division toward zero (integer operands only — the documented
    DuckDB ``//``-DECIMAL rounding trap), and the first month's NULL
    lag propagates to a NULL growth identically.
    """
    apply_engine_conf(spark)
    orders = table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.expr(
            "CAST(year(o_orderdate) * 100 + month(o_orderdate)"
            " AS BIGINT)"
        ).alias("yyyymm")
    ).agg(F.expr(f"CAST(SUM({CENTS}) AS BIGINT)").alias("cents"))
    w = W.orderBy("yyyymm")
    return monthly.select(
        "yyyymm",
        "cents",
        F.lag("cents").over(w).alias("prev_cents"),
        F.expr(
            "CAST(CAST(cents - LAG(cents) OVER (ORDER BY yyyymm)"
            "          AS DECIMAL(38,0)) * 1000000"
            " div LAG(cents) OVER (ORDER BY yyyymm) AS BIGINT)"
        ).alias("growth_q6"),
    )


ABC_BUCKET_SHIFT = 18  # cents >> 18 ≈ $2.6k revenue bands


@register(
    "customer_abc_classification",
    oracle=f"""
    WITH cust AS (
      SELECT o_custkey, CAST(SUM({CENTS}) AS BIGINT) AS rev
      FROM orders GROUP BY 1
    ), walk AS (
      SELECT rev,
             SUM(rev) OVER (ORDER BY rev DESC, o_custkey
                            ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(rev) OVER () AS t
      FROM cust
    ), classed AS (
      SELECT rev,
             CASE WHEN cum * 5 <= t * 4 THEN 'A'
                  WHEN cum * 20 <= t * 19 THEN 'B'
                  ELSE 'C' END AS abc_class,
             t
      FROM walk
    )
    SELECT abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(rev) AS BIGINT) AS class_cents,
           CAST(CAST(SUM(rev) AS HUGEINT) * 1000000 // MAX(t)
                AS BIGINT) AS share_q6
    FROM classed GROUP BY 1
    """,
)
def customer_abc_classification(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ABC (Pareto-class) customer segmentation: rank customers by
    revenue descending and cut at 80% / 95% of cumulative revenue —
    class A funds the business, C is the long tail.

    The oracle's single global-order walk would serialize every
    customer through one partition at 100 TB; the Spark plan is the
    DISTRIBUTED PREFIX SUM (the Hodges-Lehmann two-level walk,
    generalized): an arithmetic-shift revenue band keys a small
    bucket frame whose descending cumulative gives each band its
    global base; customers then rank only WITHIN their band (window
    partitioned by band, ordered (rev DESC, custkey)) and add the
    broadcast base. Ties always share a band (band is a function of
    rev), so the within-band order extends the global order exactly.
    The classification cuts compare exact integers (cum·5 ≤ T·4,
    cum·20 ≤ T·19); the output is the 3-row class rollup.
    """
    apply_engine_conf(spark)
    orders = table(spark, sf_dir, "orders")
    cust = (
        orders.groupBy("o_custkey")
        .agg(F.expr(f"CAST(SUM({CENTS}) AS BIGINT)").alias("rev"))
        .withColumn(
            "band", F.expr(f"shiftright(rev, {ABC_BUCKET_SHIFT})")
        )
        .cache()
    )
    bands = cust.groupBy("band").agg(F.sum("rev").alias("brev"))
    bwalk = bands.select(
        "band",
        (
            F.sum("brev")
            .over(
                W.orderBy(F.col("band").desc()).rowsBetween(
                    W.unboundedPreceding, 0
                )
            )
            - F.col("brev")
        ).alias("base"),
        F.sum("brev")
        .over(
            W.orderBy(F.col("band").desc()).rowsBetween(
                W.unboundedPreceding, W.unboundedFollowing
            )
        )
        .alias("t"),
    )
    classed = (
        cust.join(F.broadcast(bwalk), "band")
        .withColumn(
            "cum",
            F.col("base")
            + F.sum("rev").over(
                W.partitionBy("band")
                .orderBy(F.col("rev").desc(), F.col("o_custkey"))
                .rowsBetween(W.unboundedPreceding, 0)
            ),
        )
        .select(
            "rev",
            "t",
            F.when(
                F.col("cum") * 5 <= F.col("t") * 4, "A"
            )
            .when(F.col("cum") * 20 <= F.col("t") * 19, "B")
            .otherwise("C")
            .alias("abc_class"),
        )
    )
    return classed.groupBy("abc_class").agg(
        F.count("*").cast("long").alias("n_customers"),
        F.expr("CAST(SUM(rev) AS BIGINT)").alias("class_cents"),
        F.expr(
            "CAST(CAST(SUM(rev) AS DECIMAL(38,0)) * 1000000"
            " div MAX(t) AS BIGINT)"
        ).alias("share_q6"),
    )


# Cochran-Armitage z² as ONE shared double-expression text (the
# Wilson exemption: ± * / on identical BIGINT inputs are IEEE
# correctly-rounded, hence bit-identical across engines; no
# transcendental, no order-sensitive aggregate). Inputs stay
# BIGINT-safe at 100 TB: swn ≤ 10·N, sw2n ≤ 100·N.
_CA_Z2 = (
    "CASE WHEN r > 0 AND r < n AND n_levels > 1 THEN"
    " CAST(FLOOR((("
    "(CAST(swr AS DOUBLE) - CAST(r AS DOUBLE) * CAST(swn AS DOUBLE)"
    " / CAST(n AS DOUBLE))"
    " * (CAST(swr AS DOUBLE) - CAST(r AS DOUBLE) * CAST(swn AS DOUBLE)"
    " / CAST(n AS DOUBLE)))"
    " / ((CAST(r AS DOUBLE) / CAST(n AS DOUBLE))"
    "    * (1.0 - CAST(r AS DOUBLE) / CAST(n AS DOUBLE))"
    "    * (CAST(sw2n AS DOUBLE) - CAST(swn AS DOUBLE)"
    "       * CAST(swn AS DOUBLE) / CAST(n AS DOUBLE))))"
    " * 1000 + 0.5) AS BIGINT)"
    " ELSE NULL END"
)


@register(
    "lineitem_trend_test_ca",
    oracle=f"""
    WITH levels AS (
      SELECT CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT) AS w,
             COUNT(*) AS nk,
             SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS rk
      FROM lineitem GROUP BY 1
    ), folded AS (
      SELECT CAST(SUM(nk) AS BIGINT) AS n,
             CAST(SUM(rk) AS BIGINT) AS r,
             CAST(SUM(w * nk) AS BIGINT) AS swn,
             CAST(SUM(w * rk) AS BIGINT) AS swr,
             CAST(SUM(w * w * nk) AS BIGINT) AS sw2n,
             CAST(COUNT(*) AS BIGINT) AS n_levels
      FROM levels
    )
    SELECT n AS n_lines, r AS n_returned, swn, swr, sw2n,
           {_CA_Z2} AS ca_z2_q3
    FROM folded
    """,
)
def lineitem_trend_test_ca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Armitage trend test: is return rate LINEARLY trending
    across the ordered discount levels? — the standard dose-response
    screen, sharper than the omnibus chi² when the alternative is
    monotone (and the hypothesis-test companion to the isotonic
    fit's shape estimate).

    One corpus hash aggregate folds to five BIGINT moments (every
    one ≤ 100·N — no wide decimals needed); z² assembles from ONE
    shared double-expression text on those integers, so the q3
    quantization hashes across engines (the Wilson sqrt-free
    exemption). Degenerate inputs (no returns, all returns, a single
    level) yield NULL rather than a division fault.
    """
    apply_engine_conf(spark)
    li = table(spark, sf_dir, "lineitem")
    levels = li.groupBy(
        F.expr("CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT)").alias(
            "w"
        )
    ).agg(
        F.count("*").alias("nk"),
        F.sum(
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
        ).alias("rk"),
    )
    folded = levels.agg(
        F.expr("CAST(SUM(nk) AS BIGINT)").alias("n"),
        F.expr("CAST(SUM(rk) AS BIGINT)").alias("r"),
        F.expr("CAST(SUM(w * nk) AS BIGINT)").alias("swn"),
        F.expr("CAST(SUM(w * rk) AS BIGINT)").alias("swr"),
        F.expr("CAST(SUM(w * w * nk) AS BIGINT)").alias("sw2n"),
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_levels"),
    )
    return folded.select(
        F.col("n").alias("n_lines"),
        F.col("r").alias("n_returned"),
        "swn",
        "swr",
        "sw2n",
        F.expr(_CA_Z2).alias("ca_z2_q3"),
    )


@register(
    "orders_mix_shift_decomposition",
    oracle=f"""
    WITH span AS (
      SELECT MIN(o_orderdate) AS lo,
             MIN(o_orderdate)
               + TO_DAYS(CAST(date_diff('day', MIN(o_orderdate),
                              MAX(o_orderdate)) // 2 AS INT)) AS cutd
      FROM orders
    ), per AS (
      SELECT o_orderpriority,
             SUM(CASE WHEN o_orderdate < cutd THEN 1 ELSE 0 END) AS n0,
             SUM(CASE WHEN o_orderdate < cutd THEN {CENTS}
                 ELSE 0 END) AS rev0,
             SUM(CASE WHEN o_orderdate >= cutd THEN 1 ELSE 0 END) AS n1,
             SUM(CASE WHEN o_orderdate >= cutd THEN {CENTS}
                 ELSE 0 END) AS rev1
      FROM orders, span
      GROUP BY 1
    ), fx AS (
      SELECT o_orderpriority,
             CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
             CAST(rev0 AS BIGINT) AS rev0, CAST(rev1 AS BIGINT) AS rev1,
             CAST(CAST((n1 - n0) AS HUGEINT) * rev0 // n0 AS BIGINT)
               AS volume_eff_cents,
             CAST(CAST(n0 AS HUGEINT) * rev1 // n1 - rev0 AS BIGINT)
               AS rate_eff_cents
      FROM per WHERE n0 > 0 AND n1 > 0
    )
    SELECT o_orderpriority,
           n0, n1, rev0, rev1,
           CAST(rev1 - rev0 AS BIGINT) AS delta_cents,
           volume_eff_cents, rate_eff_cents,
           CAST(rev1 - rev0 - volume_eff_cents - rate_eff_cents
                AS BIGINT) AS interaction_cents
    FROM fx
    """,
)
def orders_mix_shift_decomposition(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Period-over-period revenue decomposition per priority segment
    (the BI mix-shift / Oaxaca-Blinder bridge): Δrevenue splits into
    a VOLUME effect ((n₁−n₀)·r₀, "more orders at old value"), a RATE
    effect (n₀·(r₁−r₀), "old volume at new value"), and the
    interaction residual — the waterfall chart every revenue review
    reads. Periods are the two calendar halves (cut = midpoint
    date, pure integer date arithmetic).

    Exactness: effects are integer-cents via widened truncating
    division of exact cent sums ((n₁−n₀)·rev₀ div n₀ and
    n₀·rev₁ div n₁ − rev₀); the interaction is defined as the exact
    residual from the truncated pieces, so the three effects sum to
    Δ EXACTLY by construction — additivity survives quantization.
    Plan: one scalar min/max broadcast + ONE conditional-aggregate
    pass over orders (never two scans of the fact side for the two
    periods).
    """
    apply_engine_conf(spark)
    orders = table(spark, sf_dir, "orders")
    span = orders.agg(
        F.min("o_orderdate").alias("lo"),
        F.max("o_orderdate").alias("hi"),
    ).select(
        F.expr(
            "date_add(lo, CAST(datediff(hi, lo) div 2 AS INT))"
        ).alias("cutd")
    )
    per = (
        orders.crossJoin(F.broadcast(span))
        .groupBy("o_orderpriority")
        .agg(
            F.expr(
                "CAST(SUM(CASE WHEN o_orderdate < cutd THEN 1"
                " ELSE 0 END) AS BIGINT)"
            ).alias("n0"),
            F.expr(
                f"CAST(SUM(CASE WHEN o_orderdate < cutd THEN {CENTS}"
                " ELSE 0 END) AS BIGINT)"
            ).alias("rev0"),
            F.expr(
                "CAST(SUM(CASE WHEN o_orderdate >= cutd THEN 1"
                " ELSE 0 END) AS BIGINT)"
            ).alias("n1"),
            F.expr(
                f"CAST(SUM(CASE WHEN o_orderdate >= cutd THEN {CENTS}"
                " ELSE 0 END) AS BIGINT)"
            ).alias("rev1"),
        )
    )
    fx = per.filter((F.col("n0") > 0) & (F.col("n1") > 0)).select(
        "o_orderpriority",
        "n0",
        "n1",
        "rev0",
        "rev1",
        F.expr(
            "CAST(CAST(n1 - n0 AS DECIMAL(38,0)) * rev0 div n0"
            " AS BIGINT)"
        ).alias("volume_eff_cents"),
        F.expr(
            "CAST(CAST(n0 AS DECIMAL(38,0)) * rev1 div n1 - rev0"
            " AS BIGINT)"
        ).alias("rate_eff_cents"),
    )
    return fx.select(
        "o_orderpriority",
        "n0",
        "n1",
        "rev0",
        "rev1",
        (F.col("rev1") - F.col("rev0")).cast("long").alias("delta_cents"),
        "volume_eff_cents",
        "rate_eff_cents",
        F.expr(
            "CAST(rev1 - rev0 - volume_eff_cents - rate_eff_cents"
            " AS BIGINT)"
        ).alias("interaction_cents"),
    )


@register(
    "orders_ks_priority_shift",
    oracle=f"""
    WITH census AS (
      SELECT {CENTS} AS cents,
             SUM(CASE WHEN o_orderpriority = '{MW_GROUP_A}'
                 THEN 1 ELSE 0 END) AS a_v,
             SUM(CASE WHEN o_orderpriority = '{MW_GROUP_B}'
                 THEN 1 ELSE 0 END) AS b_v
      FROM orders
      WHERE o_orderpriority IN ('{MW_GROUP_A}', '{MW_GROUP_B}')
      GROUP BY 1
    ), walk AS (
      SELECT cents,
             SUM(a_v) OVER (ORDER BY cents
                            ROWS UNBOUNDED PRECEDING) AS a_le,
             SUM(b_v) OVER (ORDER BY cents
                            ROWS UNBOUNDED PRECEDING) AS b_le,
             SUM(a_v) OVER () AS n_a,
             SUM(b_v) OVER () AS n_b
      FROM census
    ), diffs AS (
      SELECT cents, n_a, n_b,
             ABS(CAST(n_b AS HUGEINT) * a_le
                 - CAST(n_a AS HUGEINT) * b_le) AS dd
      FROM walk
    ), topd AS (
      SELECT cents, n_a, n_b, dd,
             MAX(dd) OVER () AS d_wide
      FROM diffs
    )
    SELECT CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           CAST(d_wide AS BIGINT) AS d_num,
           CAST(d_wide * 1000000
                // (CAST(n_a AS HUGEINT) * n_b) AS BIGINT) AS ks_q6,
           MIN(cents) AS d_at_cents
    FROM topd
    WHERE dd = d_wide
    GROUP BY n_a, n_b, d_wide
    """,
)
def orders_ks_priority_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov distance between URGENT and LOW
    order-value distributions — the distribution-shift alarm that
    sees SHAPE changes (variance, bimodality) the Mann-Whitney
    location test is blind to; together they are the standard drift
    pair.

    Exactness: at every distinct cents value the scaled ECDF gap
    ``|n_b·A≤(x) − n_a·B≤(x)|`` is an integer (both ECDFs put on the
    common denominator ``n_a·n_b``), so the supremum D is an exact
    integer maximum — no float ECDFs, no epsilon. ``ks_q6`` is
    ``D/(n_a·n_b)`` in exact q6 fixed point; ``d_at_cents`` is the
    smallest value attaining the supremum (deterministic argmax via
    filter-to-max + MIN, never an unspecified-tie-break max_by).

    Scale: the corpus reduces to the value CENSUS (distinct cents —
    bounded by the price domain, not the row count) in one map-side-
    combinable aggregate; the walk window runs over that bounded
    frame only, the module's standing discipline. Products widen to
    DECIMAL(38,0)/HUGEINT before the final BIGINT cast.
    """
    apply_engine_conf(spark)
    orders = table(spark, sf_dir, "orders")
    census = (
        orders.filter(
            F.col("o_orderpriority").isin(MW_GROUP_A, MW_GROUP_B)
        )
        .groupBy(F.expr(CENTS).alias("cents"))
        .agg(
            F.sum(
                F.when(
                    F.col("o_orderpriority") == MW_GROUP_A, 1
                ).otherwise(0)
            ).alias("a_v"),
            F.sum(
                F.when(
                    F.col("o_orderpriority") == MW_GROUP_B, 1
                ).otherwise(0)
            ).alias("b_v"),
        )
    )
    cum = W.orderBy("cents").rowsBetween(W.unboundedPreceding, 0)
    tot = W.partitionBy()
    diffs = census.select(
        "cents",
        F.sum("a_v").over(tot).alias("n_a"),
        F.sum("b_v").over(tot).alias("n_b"),
        F.sum("a_v").over(cum).alias("a_le"),
        F.sum("b_v").over(cum).alias("b_le"),
    ).select(
        "cents",
        "n_a",
        "n_b",
        F.expr(
            "ABS(CAST(n_b AS DECIMAL(38,0)) * a_le"
            " - CAST(n_a AS DECIMAL(38,0)) * b_le)"
        ).alias("dd"),
    )
    return (
        diffs.withColumn("d_wide", F.max("dd").over(tot))
        .filter(F.col("dd") == F.col("d_wide"))
        .groupBy("n_a", "n_b", "d_wide")
        .agg(F.min("cents").alias("d_at_cents"))
        .select(
            F.expr("CAST(n_a AS BIGINT)").alias("n_a"),
            F.expr("CAST(n_b AS BIGINT)").alias("n_b"),
            F.expr("CAST(d_wide AS BIGINT)").alias("d_num"),
            F.expr(
                "CAST(d_wide * 1000000"
                " div (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)"
            ).alias("ks_q6"),
            "d_at_cents",
        )
    )


@register(
    "customer_order_count_dispersion",
    oracle="""
    WITH cnt AS (
      SELECT o_custkey, COUNT(*) AS x FROM orders GROUP BY o_custkey
    ), per AS (
      SELECT c.c_mktsegment, COALESCE(t.x, 0) AS x
      FROM customer c LEFT JOIN cnt t ON c.c_custkey = t.o_custkey
    ), seg AS (
      SELECT c_mktsegment,
             CAST(COUNT(*) AS BIGINT) AS n_customers,
             CAST(SUM(x) AS BIGINT) AS sum_orders,
             CAST(SUM(x * x) AS BIGINT) AS sum_sq
      FROM per GROUP BY c_mktsegment
    )
    SELECT c_mktsegment, n_customers, sum_orders,
           CAST((CAST(n_customers AS HUGEINT) * sum_sq
                 - CAST(sum_orders AS HUGEINT) * sum_orders) * 1000000
                // ((n_customers - 1) * sum_orders)
                AS BIGINT) AS dispersion_q6
    FROM seg WHERE n_customers >= 2 AND sum_orders > 0
    """,
)
def customer_order_count_dispersion(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-segment dispersion index (variance-to-mean ratio) of
    per-customer order counts — the standard over/under-dispersion
    screen against the Poisson arrival model (index ≈ 1e6 in q6 ⇔
    Poisson; > 1e6 ⇔ clumped demand, < 1e6 ⇔ regular demand).
    Customers with ZERO orders enter as x = 0 via the left join —
    dropping them biases the index upward, the classic mistake this
    operator exists to audit.

    Exact integers end-to-end: sample-variance-to-mean =
    ``(n·Σx² − (Σx)²) / ((n−1)·Σx)``, emitted as the widened q6
    ratio (numerator can pass int64 at sf ≥ 10: DECIMAL(38,0) /
    HUGEINT per the module recipe). Segments need n ≥ 2 and Σx > 0.

    Plan: one hash aggregate of orders on custkey (map-side
    combinable), one custkey-keyed join against the customer dim —
    both sides already partition on the join key — then a
    |segments|-row aggregate. No windows, no global sorts; at 100 TB
    the only wide exchange is the orders groupBy.
    """
    apply_engine_conf(spark)
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    cnt = (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("x"))
    )
    per = cust.join(
        cnt, cust.c_custkey == cnt.o_custkey, "left"
    ).select(
        "c_mktsegment", F.coalesce("x", F.lit(0)).alias("x")
    )
    seg = per.groupBy("c_mktsegment").agg(
        F.count("*").cast("long").alias("n_customers"),
        F.sum("x").alias("sum_orders"),
        F.sum(F.col("x") * F.col("x")).alias("sum_sq"),
    )
    return seg.filter(
        (F.col("n_customers") >= 2) & (F.col("sum_orders") > 0)
    ).selectExpr(
        "c_mktsegment",
        "n_customers",
        "sum_orders",
        "CAST((CAST(n_customers AS DECIMAL(38,0)) * sum_sq"
        " - CAST(sum_orders AS DECIMAL(38,0)) * sum_orders) * 1000000"
        " div ((n_customers - 1) * sum_orders)"
        " AS BIGINT) AS dispersion_q6",
    )


TOPSIS_TOP = 20  # suppliers in the final ranking


@register(
    "supplier_topsis_ranking",
    oracle=f"""
    WITH crit AS (
      SELECT s.s_suppkey,
             CAST(COALESCE(SUM(CAST(l.l_extendedprice
                                    AS DECIMAL(25,6))), 0) AS DOUBLE)
               AS rev,
             CAST(COUNT(DISTINCT l.l_partkey) AS DOUBLE) AS parts,
             CAST(COUNT(DISTINCT l.l_orderkey) AS DOUBLE) AS ords
      FROM supplier s JOIN lineitem l ON l.l_suppkey = s.s_suppkey
      GROUP BY s.s_suppkey
    ), mx AS (
      SELECT MAX(rev) AS mr, MAX(parts) AS mp, MAX(ords) AS mo,
             MIN(rev) AS nr, MIN(parts) AS np, MIN(ords) AS no
      FROM crit
    ), norm AS (
      SELECT s_suppkey,
             rev / mr AS x1, parts / mp AS x2, ords / mo AS x3,
             nr / mr AS m1, np / mp AS m2, no / mo AS m3
      FROM crit CROSS JOIN mx
    ), scored AS (
      SELECT s_suppkey,
             SQRT((1 - x1) * (1 - x1) + (1 - x2) * (1 - x2)
                  + (1 - x3) * (1 - x3)) AS dp,
             SQRT((x1 - m1) * (x1 - m1) + (x2 - m2) * (x2 - m2)
                  + (x3 - m3) * (x3 - m3)) AS dm
      FROM norm
    ), q AS (
      SELECT s_suppkey,
             CASE WHEN dp + dm = 0 THEN 500000
                  ELSE CAST(FLOOR(dm / (dp + dm) * 1000000 + 0.5)
                            AS BIGINT) END AS topsis_q6
      FROM scored
    )
    SELECT s_suppkey, topsis_q6, rnk FROM (
      SELECT s_suppkey, topsis_q6,
             CAST(ROW_NUMBER() OVER (ORDER BY topsis_q6 DESC,
                                     s_suppkey) AS BIGINT) AS rnk
      FROM q
    ) WHERE rnk <= {TOPSIS_TOP}
    """,
)
def supplier_topsis_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-criteria supplier ranking by TOPSIS (Hwang & Yoon 1981):
    three benefit criteria (revenue, distinct parts, distinct
    orders), MAX-normalized (the documented order-independent variant
    — the textbook √Σx² normalizer is an order-sensitive float sum,
    which the engine-portability contract forbids; max/min fold
    order-free), then the closeness ratio d⁻/(d⁺+d⁻) to the
    ideal/anti-ideal points. Every distance is an EXPLICIT three-term
    sum (fixed association, bit-identical doubles), sqrt is
    IEEE-exact, and the score quantizes via FLOOR(x·1e6+0.5) BEFORE
    ranking so the top-{TOPSIS_TOP} cut orders on exact integers
    (ties → smaller suppkey). Degenerate single-point criterion
    spaces pin the indifference score 0.5 on both engines.

    100 TB shape: one fact-side shuffle (supplier-keyed aggregate
    with two exact distinct counts), 1-row min/max broadcast, narrow
    scoring projection, TakeOrderedAndProject top-k; the rank window
    sees ≤{TOPSIS_TOP} rows.
    """
    apply_engine_conf(spark)
    from pyspark.sql import Window as W

    sup = table(spark, sf_dir, "supplier")
    li = table(spark, sf_dir, "lineitem")
    crit = (
        sup.join(li, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_suppkey")
        .agg(
            F.coalesce(
                F.sum(F.col("l_extendedprice").cast("decimal(25,6)")),
                F.lit(0),
            )
            .cast("double")
            .alias("rev"),
            F.countDistinct("l_partkey").cast("double").alias("parts"),
            F.countDistinct("l_orderkey").cast("double").alias("ords"),
        )
    )
    mx = crit.agg(
        F.max("rev").alias("mr"),
        F.max("parts").alias("mp"),
        F.max("ords").alias("mo"),
        F.min("rev").alias("nr"),
        F.min("parts").alias("np"),
        F.min("ords").alias("no"),
    )
    q = (
        crit.crossJoin(F.broadcast(mx))
        .selectExpr(
            "s_suppkey",
            "rev / mr AS x1",
            "parts / mp AS x2",
            "ords / mo AS x3",
            "nr / mr AS m1",
            "np / mp AS m2",
            "no / mo AS m3",
        )
        .selectExpr(
            "s_suppkey",
            "SQRT((1 - x1) * (1 - x1) + (1 - x2) * (1 - x2)"
            " + (1 - x3) * (1 - x3)) AS dp",
            "SQRT((x1 - m1) * (x1 - m1) + (x2 - m2) * (x2 - m2)"
            " + (x3 - m3) * (x3 - m3)) AS dm",
        )
        .selectExpr(
            "s_suppkey",
            "CASE WHEN dp + dm = 0 THEN 500000"
            " ELSE CAST(FLOOR(dm / (dp + dm) * 1000000 + 0.5)"
            " AS BIGINT) END AS topsis_q6",
        )
    )
    top = q.orderBy(F.desc("topsis_q6"), F.asc("s_suppkey")).limit(
        TOPSIS_TOP
    )
    w = W.partitionBy(F.pmod(F.col("topsis_q6"), F.lit(1))).orderBy(
        F.desc("topsis_q6"), F.asc("s_suppkey")
    )
    return top.withColumn(
        "rnk", F.row_number().over(w).cast("long")
    )


XYZ_CUT_X_Q6 = 550_000  # demand CV below → X (stable)
XYZ_CUT_Y_Q6 = 700_000  # ... below → Y; else Z (erratic)
_LCENTS = (
    "CAST(FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) * 100 + 0.5)"
    " AS BIGINT)"
)
ABC_PART_SHIFT = 18  # part-revenue band width (the customer-ABC trick)


@register(
    "part_abc_xyz_matrix",
    oracle=f"""
    WITH m AS (
      SELECT l_partkey,
             year(l_shipdate) * 100 + month(l_shipdate) AS ym,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q,
             {_LCENTS} AS cents
      FROM lineitem GROUP BY 1, 2
    ), p AS (
      SELECT l_partkey,
             CAST(SUM(cents) AS BIGINT) AS rev,
             COUNT(*) AS n, SUM(q) AS s, SUM(q * q) AS s2
      FROM m GROUP BY 1
    ), walk AS (
      SELECT l_partkey, rev, n, s, s2,
             SUM(rev) OVER (ORDER BY rev DESC, l_partkey
                            ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(rev) OVER () AS t
      FROM p
    ), classed AS (
      SELECT rev,
             CASE WHEN cum * 5 <= t * 4 THEN 'A'
                  WHEN cum * 20 <= t * 19 THEN 'B'
                  ELSE 'C' END AS abc_class,
             CASE WHEN s = 0 THEN 'Z'
                  WHEN CAST(FLOOR(sqrt(n * s2 - s * s) / s * 1000000
                                  + 0.5) AS BIGINT) < {XYZ_CUT_X_Q6}
                    THEN 'X'
                  WHEN CAST(FLOOR(sqrt(n * s2 - s * s) / s * 1000000
                                  + 0.5) AS BIGINT) < {XYZ_CUT_Y_Q6}
                    THEN 'Y'
                  ELSE 'Z' END AS xyz_class
      FROM walk
    )
    SELECT abc_class, xyz_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(rev) AS BIGINT) AS revenue_cents
    FROM classed GROUP BY 1, 2
    """,
)
def part_abc_xyz_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC×XYZ inventory matrix — the planning grid supply-chain
    teams run: ABC ranks parts by cumulative revenue share (80%/95%
    Pareto cuts, exact-integer comparisons) while XYZ grades demand
    PREDICTABILITY by the coefficient of variation of monthly
    quantities (integer moments ``√(n·Σq²−S²)/S`` — exact int64
    inputs into an IEEE-exact sqrt, FLOOR-q6 before the class cut at
    {XYZ_CUT_X_Q6}/{XYZ_CUT_Y_Q6}). An A×Z cell (high revenue,
    erratic demand) is where safety stock goes.

    100 TB shape: ONE lineitem shuffle to (part, month); part-level
    revenue AND demand moments fold from that frame together. The
    ABC cumulative uses the customer-ABC DISTRIBUTED PREFIX SUM
    (revenue bands by arithmetic shift, broadcast band bases,
    within-band windows) — never a global single-partition walk —
    and the matrix is a ≤9-cell rollup.
    """
    apply_engine_conf(spark)
    li = table(spark, sf_dir, "lineitem")
    m = li.groupBy(
        "l_partkey",
        F.expr(
            "CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT)"
        ).alias("ym"),
    ).agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("q"),
        F.expr(_LCENTS).alias("cents"),
    )
    p = (
        m.groupBy("l_partkey")
        .agg(
            F.sum("cents").cast("long").alias("rev"),
            F.count("*").alias("n"),
            F.sum("q").alias("s"),
            F.sum(F.col("q") * F.col("q")).alias("s2"),
        )
        .withColumn(
            "band", F.expr(f"shiftright(rev, {ABC_PART_SHIFT})")
        )
        .localCheckpoint(eager=True)
    )
    bands = p.groupBy("band").agg(F.sum("rev").alias("brev"))
    bwalk = bands.select(
        "band",
        (
            F.sum("brev")
            .over(
                W.orderBy(F.col("band").desc()).rowsBetween(
                    W.unboundedPreceding, 0
                )
            )
            - F.col("brev")
        ).alias("base"),
        F.sum("brev")
        .over(
            W.orderBy(F.col("band").desc()).rowsBetween(
                W.unboundedPreceding, W.unboundedFollowing
            )
        )
        .alias("t"),
    )
    cv_q6 = (
        "CAST(FLOOR(sqrt(CAST(n * s2 - s * s AS DOUBLE)) / s * 1000000"
        " + 0.5) AS BIGINT)"
    )
    classed = (
        p.join(F.broadcast(bwalk), "band")
        .withColumn(
            "cum",
            F.col("base")
            + F.sum("rev").over(
                W.partitionBy("band")
                .orderBy(F.col("rev").desc(), F.col("l_partkey"))
                .rowsBetween(W.unboundedPreceding, 0)
            ),
        )
        .selectExpr(
            "rev",
            "CASE WHEN cum * 5 <= t * 4 THEN 'A'"
            " WHEN cum * 20 <= t * 19 THEN 'B' ELSE 'C' END AS abc_class",
            f"""CASE WHEN s = 0 THEN 'Z'
                 WHEN {cv_q6} < {XYZ_CUT_X_Q6} THEN 'X'
                 WHEN {cv_q6} < {XYZ_CUT_Y_Q6} THEN 'Y'
                 ELSE 'Z' END AS xyz_class""",
        )
    )
    return classed.groupBy("abc_class", "xyz_class").agg(
        F.count("*").cast("long").alias("n_parts"),
        F.sum("rev").cast("long").alias("revenue_cents"),
    )


# ---------------------------------------------------------------------------
# Round 9: Wasserstein-1 distribution drift + calibration reliability/ECE
# ---------------------------------------------------------------------------

EMD_SPLIT_DATE = "1998-01-01"  # early/late cohort boundary (orders span
# 1995-01..2001-08 in the driver testdata — the split roughly halves it)
EMD_BIN_CENTS = 100_000  # $1,000 value bins → ≤ ~500 bins at any SF


@register(
    "orders_value_emd_drift",
    oracle=f"""
    WITH binned AS (
      SELECT {CENTS} // {EMD_BIN_CENTS} AS bin,
             CASE WHEN o_orderdate < TIMESTAMP '{EMD_SPLIT_DATE}'
                  THEN 1 ELSE 0 END AS is_a
      FROM orders
    ), cells AS (
      SELECT bin, SUM(is_a) AS c_a, SUM(1 - is_a) AS c_b
      FROM binned GROUP BY bin
    ), tot AS (
      SELECT SUM(c_a) AS n_a, SUM(c_b) AS n_b FROM cells
    ), walk AS (
      -- an EMPTY cohort leaves W1 undefined (the single-row corpus
      -- shape): NULL CDFs propagate to NULL distances, no div-by-zero
      SELECT bin, n_a, n_b,
             CASE WHEN n_a > 0 THEN
               (SUM(c_a) OVER (ORDER BY bin) * 1000000) // n_a
             END AS cdf_a_q6,
             CASE WHEN n_b > 0 THEN
               (SUM(c_b) OVER (ORDER BY bin) * 1000000) // n_b
             END AS cdf_b_q6,
             COALESCE(LEAD(bin) OVER (ORDER BY bin), bin + 1) - bin
               AS gap_bins
      FROM cells CROSS JOIN tot
    )
    SELECT CAST(ANY_VALUE(n_a) AS BIGINT) AS n_a,
           CAST(ANY_VALUE(n_b) AS BIGINT) AS n_b,
           CAST(COUNT(*) AS BIGINT) AS n_bins,
           CAST(SUM(gap_bins * {EMD_BIN_CENTS}
                    * abs(cdf_a_q6 - cdf_b_q6)) AS BIGINT)
             AS w1_cents_q6,
           CAST(SUM(gap_bins * {EMD_BIN_CENTS}
                    * abs(cdf_a_q6 - cdf_b_q6)) // 1000000 AS BIGINT)
             AS w1_cents
    FROM walk
    """,
)
def orders_value_emd_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wasserstein-1 (earth-mover's) distance between the early and
    late order-value distributions — the drift metric that, unlike the
    engine's chi²/TVD rows, weights HOW FAR mass moved, not just how
    much: W1(A,B) = ∫|F_A − F_B| dv over the value axis.

    Exact-integer discipline: values quantize to cents, bin to $1,000
    cells, and each side's CDF quantizes to q6 (``cum·1e6 div n`` —
    non-negative operands, so floor == truncate on both engines)
    BEFORE the sum, which keeps every term ≤ 1e5·1e6 and the total
    ≤ ~5e13 — BIGINT-safe at any SF (an un-quantized cross-product
    form ``|cumA·n_b − cumB·n_a|`` overflows 64-bit at sf10). Missing
    bins carry the previous |ΔCDF| for their whole run, priced by the
    LEAD gap; the last bin's ΔCDF is 0 by construction.

    Scale shape (module discipline): ONE corpus-sized hash aggregate
    reduces orders to the ≤ ~500-cell bin census; the unpartitioned
    CDF window and the LEAD both run on that bounded frame only;
    totals broadcast via the 1-row cross join."""
    apply_engine_conf(spark)
    orders = table(spark, sf_dir, "orders")
    cells = (
        orders.select(
            F.expr(f"{CENTS} div {EMD_BIN_CENTS}").alias("bin"),
            F.when(
                F.col("o_orderdate")
                < F.lit(EMD_SPLIT_DATE).cast("timestamp"),
                1,
            )
            .otherwise(0)
            .alias("is_a"),
        )
        .groupBy("bin")
        .agg(
            F.sum("is_a").alias("c_a"),
            F.sum(1 - F.col("is_a")).alias("c_b"),
        )
    )
    tot = cells.agg(
        F.sum("c_a").alias("n_a"), F.sum("c_b").alias("n_b")
    )
    wo = W.orderBy("bin")
    walk = cells.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n_a",
        "n_b",
        F.expr(
            "CASE WHEN n_a > 0 THEN"
            " (SUM(c_a) OVER (ORDER BY bin) * 1000000) div n_a END"
        ).alias("cdf_a_q6"),
        F.expr(
            "CASE WHEN n_b > 0 THEN"
            " (SUM(c_b) OVER (ORDER BY bin) * 1000000) div n_b END"
        ).alias("cdf_b_q6"),
        (
            F.coalesce(F.lead("bin").over(wo), F.col("bin") + 1)
            - F.col("bin")
        ).alias("gap_bins"),
    )
    term = (
        F.col("gap_bins")
        * F.lit(EMD_BIN_CENTS)
        * F.abs(F.col("cdf_a_q6") - F.col("cdf_b_q6"))
    )
    return walk.agg(
        F.any_value("n_a").cast("long").alias("n_a"),
        F.any_value("n_b").cast("long").alias("n_b"),
        F.count("*").cast("long").alias("n_bins"),
        F.sum(term).cast("long").alias("w1_cents_q6"),
        F.expr(
            f"CAST(SUM(gap_bins * {EMD_BIN_CENTS}"
            " * abs(cdf_a_q6 - cdf_b_q6)) div 1000000 AS BIGINT)"
        ).alias("w1_cents"),
    )


CAL_BINS = 10  # reliability-diagram bins over the [0,1] score axis
CAL_SCORE_Q6 = (
    "(CAST(FLOOR(l_quantity + 0.5) AS BIGINT) * 1000000) DIV 50"
)
CAL_SCORE_Q6_SQL = (
    "(CAST(FLOOR(l_quantity + 0.5) AS BIGINT) * 1000000) // 50"
)


@register(
    "lineitem_return_calibration_census",
    oracle=f"""
    WITH scored AS (
      SELECT LEAST({CAL_BINS - 1},
                   ({CAL_SCORE_Q6_SQL} * {CAL_BINS}) // 1000000) AS bin,
             {CAL_SCORE_Q6_SQL} AS score_q6,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS label
      FROM lineitem
    )
    SELECT CAST(bin AS BIGINT) AS bin,
           COUNT(*) AS n,
           CAST(SUM(label) AS BIGINT) AS n_pos,
           CAST((SUM(label) * 1000000) // COUNT(*) AS BIGINT)
             AS label_rate_q6,
           CAST(SUM(score_q6) // COUNT(*) AS BIGINT) AS score_mean_q6,
           CAST(abs((SUM(label) * 1000000) // COUNT(*)
                    - SUM(score_q6) // COUNT(*)) AS BIGINT) AS gap_q6
    FROM scored GROUP BY bin
    """,
)
def lineitem_return_calibration_census(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Reliability diagram for a probability-like score against a
    binary outcome — the standard calibration diagnostic a model-eval
    pipeline runs before trusting scores as probabilities. Here the
    score is the naive quantity-proportional return propensity
    ``l_quantity/50`` (q6 integers; swap in any model score column)
    and the outcome is ``l_returnflag = 'R'``: per score-decile bin,
    observed positive rate vs mean predicted score and their gap.

    All-integer: score quantizes to q6 BEFORE binning and averaging;
    per-bin rates are single integer divisions of non-negative
    operands (floor == truncate both engines). One corpus-sized hash
    aggregate; the census is ≤ {CAL_BINS} rows."""
    apply_engine_conf(spark)
    li = table(spark, sf_dir, "lineitem")
    scored = li.select(
        F.least(
            F.lit(CAL_BINS - 1),
            F.expr(f"(({CAL_SCORE_Q6}) * {CAL_BINS}) DIV 1000000"),
        ).alias("bin"),
        F.expr(CAL_SCORE_Q6).alias("score_q6"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias(
            "label"
        ),
    )
    return scored.groupBy("bin").agg(
        F.count("*").alias("n"),
        F.sum("label").cast("long").alias("n_pos"),
        F.expr("CAST((SUM(label) * 1000000) DIV COUNT(*) AS BIGINT)").alias(
            "label_rate_q6"
        ),
        F.expr("CAST(SUM(score_q6) DIV COUNT(*) AS BIGINT)").alias(
            "score_mean_q6"
        ),
        F.expr(
            "CAST(abs((SUM(label) * 1000000) DIV COUNT(*)"
            " - SUM(score_q6) DIV COUNT(*)) AS BIGINT)"
        ).alias("gap_q6"),
    )


@register(
    "lineitem_return_calibration_ece",
    oracle=f"""
    WITH scored AS (
      SELECT LEAST({CAL_BINS - 1},
                   ({CAL_SCORE_Q6_SQL} * {CAL_BINS}) // 1000000) AS bin,
             {CAL_SCORE_Q6_SQL} AS score_q6,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS label
      FROM lineitem
    ), cells AS (
      SELECT bin, COUNT(*) AS n,
             abs((SUM(label) * 1000000) // COUNT(*)
                 - SUM(score_q6) // COUNT(*)) AS gap_q6
      FROM scored GROUP BY bin
    )
    SELECT CAST(SUM(n) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_bins_used,
           CAST(SUM(n * gap_q6) // SUM(n) AS BIGINT) AS ece_q6,
           CAST(MAX(gap_q6) AS BIGINT) AS mce_q6
    FROM cells
    """,
)
def lineitem_return_calibration_ece(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Expected / maximum calibration error folded from the
    reliability census: ECE = Σ_b (n_b/N)·|rate_b − scorē_b| (the
    bin-count-weighted gap), MCE = max_b gap. Same q6-integer
    discipline as the census; the weighted sum ≤ N·1e6 stays
    BIGINT-safe at any SF, with ONE final division."""
    apply_engine_conf(spark)
    census = lineitem_return_calibration_census(spark, sf_dir)
    return census.agg(
        F.sum("n").cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("n_bins_used"),
        F.expr(
            "CAST(SUM(n * gap_q6) DIV SUM(n) AS BIGINT)"
        ).alias("ece_q6"),
        F.max("gap_q6").cast("long").alias("mce_q6"),
    )


BOOT_B = 199  # bootstrap replicates (odd → clean percentile ranks)
# Poisson(1) CDF, q6-quantized (FLOOR(cdf·1e6 + 0.5)) — the replicate
# weights k are drawn by counting thresholds ≤ the row's hash uniform,
# so the draw is pure integer comparison, identical on both engines.
POISSON1_CDF_Q6 = (
    367879, 735759, 919699, 981012, 996340, 999406, 999917, 999990,
    999999,
)
BOOT_LO_RANK = 5    # ceil(0.025 · 199) → 2.5th percentile rank
BOOT_HI_RANK = 195  # ceil(0.975 · 199) → 97.5th percentile rank


def _poisson_k_sql(u_expr: str) -> str:
    """k = #{thresholds ≤ u} — the inverse-CDF Poisson(1) draw."""
    return " + ".join(
        f"CASE WHEN {u_expr} >= {t} THEN 1 ELSE 0 END"
        for t in POISSON1_CDF_Q6
    )


@register(
    "orders_bootstrap_mean_ci",
    oracle=f"""
    WITH spine AS (
      SELECT unnest(range({BOOT_B})) AS b
    ), hashed AS (
      SELECT s.b,
             {CENTS} AS cents,
             ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)
              || ':' || CAST(s.b AS VARCHAR)), 1, 8))::BIGINT
               % 1000000 AS u
      FROM orders CROSS JOIN spine s
    ), weighted AS (
      SELECT b, cents, {_poisson_k_sql("u")} AS k
      FROM hashed
    ), reps AS (
      SELECT b, SUM(k * cents) // SUM(k) AS mean_cents
      FROM weighted GROUP BY b HAVING SUM(k) > 0
    ), ranked AS (
      SELECT mean_cents,
             ROW_NUMBER() OVER (ORDER BY mean_cents, b) AS rnk,
             COUNT(*) OVER () AS n_reps
      FROM reps
    ), full_mean AS (
      SELECT COUNT(*) AS n_orders,
             SUM({CENTS}) // COUNT(*) AS mean_cents
      FROM orders
    )
    SELECT CAST(f.n_orders AS BIGINT) AS n_orders,
           CAST(ANY_VALUE(r.n_reps) AS BIGINT) AS b_reps,
           CAST(f.mean_cents AS BIGINT) AS mean_cents,
           CAST(MAX(CASE WHEN r.rnk = {BOOT_LO_RANK}
                         THEN r.mean_cents END) AS BIGINT)
             AS ci_lo_cents,
           CAST(MAX(CASE WHEN r.rnk = {BOOT_HI_RANK}
                         THEN r.mean_cents END) AS BIGINT)
             AS ci_hi_cents
    FROM ranked r CROSS JOIN full_mean f
    GROUP BY f.n_orders, f.mean_cents
    """,
)
def orders_bootstrap_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poissonized bootstrap percentile CI for the mean order value —
    the resampling complement of the jackknife CI and the permutation
    test: classical with-replacement resampling is undistributable
    (each replicate needs n coordinated draws), but the Poissonized
    bootstrap gives every (row, replicate) an independent Poisson(1)
    multiplicity — a textbook-standard approximation whose replicate
    size concentrates at n — so the whole resample is ONE narrow
    cross-join fan-out with immediate map-side-combinable aggregation
    into {BOOT_B} cells.

    Determinism (house rule): the Poisson draw is an inverse-CDF count
    of q6-quantized thresholds under the md5 hash uniform (the
    permutation test's portable hash), replicate means are integer
    cent divisions (non-negative operands), and the percentile ranks
    are exact ROW_NUMBER picks with a deterministic (mean, b)
    tie-break — no float crosses an engine boundary.

    100 TB shape: the fan-out multiplies the two-column
    (orderkey, cents) projection by B={BOOT_B}, combining map-side
    into B cells before any shuffle; the rank window runs on the
    B-row replicate frame. Cost is B× the narrow scan, tunable by B —
    the same declared-fan-out contract as events_permutation_test."""
    apply_engine_conf(spark)
    orders = table(spark, sf_dir, "orders")
    # table_wide: the B-fold fan-out + per-row hash is compute-heavy
    # narrow work — without the fan-out guard the local single-row-
    # group parquet shape runs all B·n hashes on ONE task (22 s at
    # sf0.1; ~2 s fanned out)
    narrow = table_wide(spark, sf_dir, "orders").select(
        "o_orderkey", F.expr(CENTS).alias("cents")
    )
    spine = spark.range(BOOT_B).select(F.col("id").alias("b"))
    k_expr = " + ".join(
        f"CASE WHEN u >= {t} THEN 1 ELSE 0 END"
        for t in POISSON1_CDF_Q6
    )
    hashed = narrow.crossJoin(F.broadcast(spine)).select(
        "b",
        "cents",
        F.expr(
            "conv(substring(md5(concat_ws(':',"
            " CAST(o_orderkey AS STRING), CAST(b AS STRING))), 1, 8),"
            " 16, 10) % 1000000"
        ).alias("u"),
    )
    weighted = hashed.select(
        "b", "cents", F.expr(f"CAST({k_expr} AS BIGINT)").alias("k")
    )
    reps = (
        weighted.groupBy("b")
        .agg(
            F.sum(F.col("k") * F.col("cents")).alias("sk"),
            F.sum("k").alias("k_tot"),
        )
        .filter(F.col("k_tot") > 0)
        .select("b", F.expr("sk div k_tot").alias("mean_cents"))
    )
    ranked = reps.select(
        "mean_cents",
        F.row_number()
        .over(W.orderBy("mean_cents", "b"))
        .alias("rnk"),
        F.count("*").over(W.partitionBy()).alias("n_reps"),
    )
    full_mean = orders.agg(
        F.count("*").alias("n_orders"),
        F.expr(f"SUM({CENTS}) div COUNT(*)").alias("fmean"),
    )
    return (
        ranked.crossJoin(F.broadcast(full_mean))
        .groupBy("n_orders", "fmean")
        .agg(
            F.any_value("n_reps").cast("long").alias("b_reps"),
            F.max(
                F.when(
                    F.col("rnk") == BOOT_LO_RANK, F.col("mean_cents")
                )
            )
            .cast("long")
            .alias("ci_lo_cents"),
            F.max(
                F.when(
                    F.col("rnk") == BOOT_HI_RANK, F.col("mean_cents")
                )
            )
            .cast("long")
            .alias("ci_hi_cents"),
        )
        .select(
            F.col("n_orders").cast("long").alias("n_orders"),
            "b_reps",
            F.col("fmean").cast("long").alias("mean_cents"),
            "ci_lo_cents",
            "ci_hi_cents",
        )
    )
