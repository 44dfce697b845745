"""Hand-derived value checks + plan-shape pins for the nonparametric
rank-statistics family (plans/rankstats.py).

Value tests run each operator against tiny hand-built parquet
fixtures where the statistic is derivable on paper — the adversarial
complement to the DuckDB oracle sweep (which covers the real
testdata): midrank ties in Mann-Whitney, a PAVA pooling violation in
the isotonic fit, an even pair count in Hodges-Lehmann, a known runs
sequence.
"""

from __future__ import annotations

import datetime

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _orders_fixture(spark, tmp_path, rows):
    """Write an orders parquet with (date, totalprice, priority)."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.DateType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    )
    data = [
        (i, 1, "O", price, datetime.date(1995, 1, day), prio)
        for i, (day, price, prio) in enumerate(rows)
    ]
    spark.createDataFrame(data, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "orders.parquet"))
    return str(tmp_path)


def test_mannwhitney_doubled_u_with_midrank_ties(spark, tmp_path):
    """A = {1.00, 2.00}, B = {1.00, 3.00}: U_A = 1.5 (one win, one
    half-tie), so u2_a = 3 and cles_q6 = 3·1e6 div 8 = 375000."""
    from almost_any_file_to_pandas_spark.plans.rankstats import (
        orders_mannwhitney_priority_shift,
    )

    sf = _orders_fixture(
        spark,
        tmp_path,
        [
            (1, 1.00, "1-URGENT"),
            (2, 2.00, "1-URGENT"),
            (3, 1.00, "5-LOW"),
            (4, 3.00, "5-LOW"),
            (5, 99.0, "3-MEDIUM"),  # other priorities must not leak in
        ],
    )
    row = orders_mannwhitney_priority_shift(spark, sf).collect()[0]
    assert (row.n_a, row.n_b) == (2, 2)
    assert row.u2_a == 3
    assert row.cles_q6 == 375_000


def test_runs_test_known_sequence(spark, tmp_path):
    """Daily cents by day: [10,50,10,50,50,10,90] → lower median 50;
    non-median days by date sign to −,−,−,+ → 2 runs, n+=1, n−=3,
    expected_q6 = 1e6 + (2·1·3·1e6) div 4 = 2_500_000."""
    from almost_any_file_to_pandas_spark.plans.rankstats import (
        orders_runs_test_daily,
    )

    values = [0.10, 0.50, 0.10, 0.50, 0.50, 0.10, 0.90]
    sf = _orders_fixture(
        spark,
        tmp_path,
        [(d + 1, v, "1-URGENT") for d, v in enumerate(values)],
    )
    row = orders_runs_test_daily(spark, sf).collect()[0]
    assert (row.n_plus, row.n_minus) == (1, 3)
    assert row.n_runs == 2
    assert row.expected_runs_q6 == 2_500_000


def test_spearman_and_kendall_perfect_monotone(spark, tmp_path):
    """Days with (count, revenue) strictly co-increasing: ρ and τ_a
    both hit exactly 1e6, and Spearman's s4 is 0."""
    from almost_any_file_to_pandas_spark.plans.rankstats import (
        orders_kendall_tau_daily,
        orders_spearman_daily,
    )

    rows = []
    for day, n_orders in ((1, 1), (2, 2), (3, 3)):
        rows += [(day, 1.00, "1-URGENT")] * n_orders
    sf = _orders_fixture(spark, tmp_path, rows)
    s = orders_spearman_daily(spark, sf).collect()[0]
    assert (s.n_days, s.s4, s.rho_q6) == (3, 0, 1_000_000)
    k = orders_kendall_tau_daily(spark, sf).collect()[0]
    assert (k.n_days, k.concordant, k.discordant) == (3, 3, 0)
    assert k.tau_a_q6 == 1_000_000


def test_hodges_lehmann_even_pair_median(spark, tmp_path):
    """A daily = {10, 20}, B daily = {1, 2} cents → diffs sorted
    [8, 9, 18, 19], M = 4 → hl_x2 = v@2 + v@3 = 9 + 18 = 27."""
    from almost_any_file_to_pandas_spark.plans.rankstats import (
        orders_hodges_lehmann_shift,
    )

    sf = _orders_fixture(
        spark,
        tmp_path,
        [
            (1, 0.10, "1-URGENT"),
            (2, 0.20, "1-URGENT"),
            (1, 0.01, "5-LOW"),
            (2, 0.02, "5-LOW"),
        ],
    )
    row = orders_hodges_lehmann_shift(spark, sf).collect()[0]
    assert row.m_pairs == 4
    assert row.hl_shift_cents_x2 == 27


def test_isotonic_pools_violation_exactly(spark, tmp_path):
    """Rates by level: [1/2, 0/2, 2/2] violates monotonicity at
    level 1 → PAVA pools levels {0,1} to 1/4; level 2 stays 1.
    The minimax closed form must reproduce that exactly in q6."""
    from pyspark.sql import types as T

    from almost_any_file_to_pandas_spark.plans.rankstats import (
        lineitem_isotonic_return_rate,
    )

    schema = T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
        ]
    )
    rows = [
        (1, 0.00, "R"),
        (2, 0.00, "N"),
        (3, 0.01, "N"),
        (4, 0.01, "A"),
        (5, 0.02, "R"),
        (6, 0.02, "R"),
    ]
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "lineitem.parquet"))
    out = {
        r.discount_pct: r
        for r in lineitem_isotonic_return_rate(
            spark, str(tmp_path)
        ).collect()
    }
    assert out[0].rate_q6 == 500_000 and out[0].iso_rate_q6 == 250_000
    assert out[1].rate_q6 == 0 and out[1].iso_rate_q6 == 250_000
    assert out[2].rate_q6 == 1_000_000 and out[2].iso_rate_q6 == 1_000_000


def test_isotonic_fit_is_nondecreasing_on_testdata(spark):
    from almost_any_file_to_pandas_spark.plans.rankstats import (
        lineitem_isotonic_return_rate,
    )

    rows = sorted(
        lineitem_isotonic_return_rate(spark, SF_DIR).collect(),
        key=lambda r: r.discount_pct,
    )
    fits = [r.iso_rate_q6 for r in rows]
    assert fits == sorted(fits)
    # the fit is a genuine smoothing: bounded by the raw rate range
    raws = [r.rate_q6 for r in rows]
    assert min(raws) <= fits[0] and fits[-1] <= max(raws) + 1


def test_rankstats_plan_shapes(spark):
    """Scale pins: no sort-merge join or cartesian product anywhere;
    Spearman touches orders exactly once with zero joins; the Fano
    fold is window-free with a single broadcast scalar join; the
    Hodges-Lehmann pair generator is an explode (codegen), not a
    pair-sized BNLJ, over one cached daily frame."""
    from almost_any_file_to_pandas_spark.plans import rankstats as R

    def plan(fn):
        return (
            fn(spark, SF_DIR)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )

    for fn in (
        R.orders_spearman_daily,
        R.orders_mannwhitney_priority_shift,
        R.orders_kendall_tau_daily,
        R.orders_runs_test_daily,
        R.events_burstiness_fano,
        R.orders_hodges_lehmann_shift,
        R.lineitem_isotonic_return_rate,
    ):
        p = plan(fn)
        assert "SortMergeJoin" not in p, fn.__name__
        assert "CartesianProduct" not in p, fn.__name__

    # the single-scan pin asserts the FRESH plan: a sibling rankstats
    # query (runs_test / Hodges-Lehmann) caching the shared _daily
    # frame makes CacheManager substitute an InMemoryTableScan here,
    # and the IMTS node PRINTS its stored child plan — so the string
    # would contain the parquet scan twice despite orders still being
    # read once. Clearing the cache restores the order-independent
    # assertion (the loop above just re-registered those caches).
    spark.catalog.clearCache()
    p = plan(R.orders_spearman_daily)
    assert p.count("Scan parquet") == 1
    assert "Join" not in p

    p = plan(R.events_burstiness_fano)
    assert "Window" not in p
    assert p.count("BroadcastNestedLoopJoin") == 1  # scalar span only

    p = plan(R.orders_hodges_lehmann_shift)
    assert p.count("Generate") >= 2  # explode pair generator, both passes
    assert p.count("InMemoryTableScan") >= 4  # daily frame reused, not rescanned


def test_linear_attribution_conserves_value_and_matches_last_touch(
    spark,
):
    """Per-class q6 credit must telescope back to total purchase
    value within the truncation dust (< 2 µcents per purchase), and
    the 'none' class must agree exactly with last-touch attribution
    (a purchase has no in-window touch ⟺ its latest touch is out of
    window ⟺ linear 'none' ⟺ last-touch 'none')."""
    from pyspark.sql import functions as F

    from almost_any_file_to_pandas_spark.operators.funnel import (
        events_attribution_last_touch,
        events_attribution_linear,
    )
    from almost_any_file_to_pandas_spark.plans import table

    lin = {
        r.touch_type: r
        for r in events_attribution_linear(spark, SF_DIR).collect()
    }
    last = {
        r.touch_type: r
        for r in events_attribution_last_touch(spark, SF_DIR).collect()
    }
    assert lin["none"].n_purchases == last["none"].n_purchases
    total_cents = (
        table(spark, SF_DIR, "events")
        .filter(F.col("event_type") == "purchase")
        .agg(
            F.expr(
                "SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))"
            ).alias("c"),
            F.count("*").alias("n"),
        )
        .collect()[0]
    )
    credited = sum(r.credited_q6c for r in lin.values())
    assert credited <= total_cents.c * 1_000_000
    assert credited > total_cents.c * 1_000_000 - 2 * total_cents.n


def test_twap_hand_integral(spark, tmp_path):
    """Values 10, 20, 5 at t = 0, 10µs, 30µs → holds 10µs@10 +
    20µs@20 over a 30µs span → twap = 500e6/30 = 16_666_666 µunits."""
    import datetime

    from pyspark.sql import types as T

    from almost_any_file_to_pandas_spark.operators.temporal import (
        events_time_weighted_value,
    )

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (1, base, 7, "view", 10.0),
        (2, base + datetime.timedelta(microseconds=10), 7, "view", 20.0),
        (3, base + datetime.timedelta(microseconds=30), 7, "view", 5.0),
        (4, base, 8, "view", 1.0),  # single-event user: excluded
    ]
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "events.parquet"))
    out = events_time_weighted_value(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.user_id, r.n_events, r.span_us) == (7, 3, 30)
    assert r.twap_micro == 16_666_666


def test_abc_classes_partition_and_cover(spark):
    """The three ABC classes partition the customer base: counts sum
    to the distinct paying customers, cents sum to total revenue,
    shares sum to 1e6 ± truncation, and A ≥ nothing else is empty."""
    from pyspark.sql import functions as F

    from almost_any_file_to_pandas_spark.plans.rankstats import (
        customer_abc_classification,
    )
    from almost_any_file_to_pandas_spark.plans import table

    rows = {
        r.abc_class: r
        for r in customer_abc_classification(spark, SF_DIR).collect()
    }
    assert set(rows) == {"A", "B", "C"}
    totals = (
        table(spark, SF_DIR, "orders")
        .agg(
            F.countDistinct("o_custkey").alias("n"),
            F.expr(
                "SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))"
            ).alias("c"),
        )
        .collect()[0]
    )
    assert sum(r.n_customers for r in rows.values()) == totals.n
    assert sum(r.class_cents for r in rows.values()) == totals.c
    share = sum(r.share_q6 for r in rows.values())
    assert 1_000_000 - 3 <= share <= 1_000_000
    # rank-cut invariant: every A customer outearns every B customer
    # outearns every C customer, so class MEANS are ordered (the
    # synthetic revenue is near-uniform, so head-count shapes like
    # |A| < |C| are NOT guaranteed — only the ordering is)
    means = {
        k: r.class_cents / r.n_customers for k, r in rows.items()
    }
    assert means["A"] >= means["B"] >= means["C"]


def test_unpivot_single_scan_expand(spark):
    from almost_any_file_to_pandas_spark.plans.rankstats import (
        lineitem_unpivot_measures,
    )

    p = (
        lineitem_unpivot_measures(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert p.count("Scan parquet") == 1  # melt ≠ 3-way self-union
    assert "Expand" in p
    assert "Union" not in p


def test_binary_sign_topk_plan_and_agreement(spark):
    """BQ pins: the corpus never shuffles (no SortMergeJoin; rerank
    broadcasts the shortlist side), and the packed-word Hamming
    shortlist at 50 must recover the exact integer-dot top-1 for
    most queries on the testdata (sign-bit sketches preserve the
    nearest neighbor far more often than not)."""
    from almost_any_file_to_pandas_spark.operators.similarity import (
        sim_binary_sign_topk,
    )

    df = sim_binary_sign_topk(spark, SF_DIR)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in p
    rows = df.collect()
    by_query = {}
    for r in rows:
        by_query.setdefault(r.query_id, []).append(r)
    assert len(by_query) == 10
    for q, rs in by_query.items():
        ranks = sorted(r.knn_rank for r in rs)
        assert ranks == list(range(1, len(rs) + 1))
        # rerank order is by exact dot desc
        rs = sorted(rs, key=lambda r: r.knn_rank)
        dots = [r.dot_q12 for r in rs]
        assert dots == sorted(dots, reverse=True)


def test_ca_trend_hand_case(spark, tmp_path):
    """Levels (w, n, r) = (0,2,0), (1,2,1), (2,2,2): T = 2, Var = 1
    → z² = 4.000 exactly."""
    from pyspark.sql import types as T

    from almost_any_file_to_pandas_spark.plans.rankstats import (
        lineitem_trend_test_ca,
    )

    schema = T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
        ]
    )
    rows = [
        (1, 0.00, "N"), (2, 0.00, "N"),
        (3, 0.01, "R"), (4, 0.01, "N"),
        (5, 0.02, "R"), (6, 0.02, "R"),
    ]
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "lineitem.parquet"))
    row = lineitem_trend_test_ca(spark, str(tmp_path)).collect()[0]
    assert (row.n_lines, row.n_returned) == (6, 3)
    assert (row.swn, row.swr, row.sw2n) == (6, 5, 10)
    assert row.ca_z2_q3 == 4000


def test_mix_shift_hand_decomposition(spark, tmp_path):
    """P0: 2 orders × $1 (rev 200c); P1: 3 × $2 (rev 600c) →
    volume = (3−2)·200/2 = 100c, rate = 2·600/3 − 200 = 200c,
    interaction = 400 − 100 − 200 = 100c — and the three MUST sum to
    Δ exactly (additivity by construction)."""
    from almost_any_file_to_pandas_spark.plans.rankstats import (
        orders_mix_shift_decomposition,
    )

    sf = _orders_fixture(
        spark,
        tmp_path,
        [(1, 1.00, "1-URGENT")] * 2 + [(11, 2.00, "1-URGENT")] * 3,
    )
    row = orders_mix_shift_decomposition(spark, sf).collect()[0]
    assert (row.n0, row.n1, row.rev0, row.rev1) == (2, 3, 200, 600)
    assert row.delta_cents == 400
    assert row.volume_eff_cents == 100
    assert row.rate_eff_cents == 200
    assert row.interaction_cents == 100
    assert (
        row.volume_eff_cents
        + row.rate_eff_cents
        + row.interaction_cents
        == row.delta_cents
    )


def test_time_decay_attribution_hand_weights(spark, tmp_path):
    """Hand-derived dyadic weights: a 2h-old click gets w=64, a
    30h-old view w=32 (same purchase, so credits split 2:1), an
    exactly-7-day-old view is still in window with w=1 (boundary
    pin), and an untouched purchase credits 'none' in full."""
    import datetime

    from pyspark.sql import types as T

    from almost_any_file_to_pandas_spark.operators.funnel import (
        events_attribution_time_decay,
    )

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    base = datetime.datetime(2024, 1, 1)
    h = datetime.timedelta(hours=1)
    rows = [
        (1, base + 10 * h, 7, "view", 0.0),
        (2, base + 38 * h, 7, "click", 0.0),
        (3, base + 40 * h, 7, "purchase", 1.0),
        (4, base, 8, "purchase", 2.5),
        (5, base, 9, "view", 0.0),
        (6, base + 168 * h, 9, "purchase", 1.0),
    ]
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "events.parquet"))
    got = {
        r.touch_type: r
        for r in events_attribution_time_decay(
            spark, str(tmp_path)
        ).collect()
    }
    # user 7: n = 64 + 32 = 96 → view 100e6·32//96, click 100e6·64//96
    # user 9: single view at exactly -7d → w=1, full credit
    assert got["click"].n_purchases == 1
    assert got["click"].credited_q6c == 100_000_000 * 64 // 96
    assert got["view"].n_purchases == 2
    assert (
        got["view"].credited_q6c
        == 100_000_000 * 32 // 96 + 100_000_000
    )
    assert got["none"].n_purchases == 1
    assert got["none"].credited_q6c == 250_000_000


def test_time_decay_attribution_conserves_value(spark):
    """Same conservation contract as linear attribution: per-class q6
    credit telescopes to total purchase value within the per-purchase
    truncation dust, and the 'none' class is identical to linear's
    (decay reweights in-window touches; it never changes which
    purchases are touched)."""
    from pyspark.sql import functions as F

    from almost_any_file_to_pandas_spark.operators.funnel import (
        events_attribution_linear,
        events_attribution_time_decay,
    )
    from almost_any_file_to_pandas_spark.plans import table

    dec = {
        r.touch_type: r
        for r in events_attribution_time_decay(spark, SF_DIR).collect()
    }
    lin = {
        r.touch_type: r
        for r in events_attribution_linear(spark, SF_DIR).collect()
    }
    assert dec["none"].n_purchases == lin["none"].n_purchases
    assert dec["none"].credited_q6c == lin["none"].credited_q6c
    total = (
        table(spark, SF_DIR, "events")
        .filter(F.col("event_type") == "purchase")
        .agg(
            F.expr(
                "SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))"
            ).alias("c"),
            F.count("*").alias("n"),
        )
        .collect()[0]
    )
    credited = sum(r.credited_q6c for r in dec.values())
    assert credited <= total.c * 1_000_000
    assert credited > total.c * 1_000_000 - 2 * total.n


def test_order_count_dispersion_hand_case(spark, tmp_path):
    """Counts [0, 2, 4] in one segment: mean 2, sample variance 4 →
    dispersion index 2.0 (q6 2e6). The zero-order customer MUST
    enter via the left join; a single-customer segment is filtered
    (n ≥ 2)."""
    from pyspark.sql import types as T

    from almost_any_file_to_pandas_spark.plans.rankstats import (
        customer_order_count_dispersion,
    )

    cust_schema = T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    )
    spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "A"), (4, "B")], cust_schema
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "customer.parquet")
    )
    order_schema = T.StructType(
        [T.StructField("o_custkey", T.LongType())]
    )
    spark.createDataFrame(
        [(2,), (2,), (3,), (3,), (3,), (3,), (4,)], order_schema
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )
    out = customer_order_count_dispersion(
        spark, str(tmp_path)
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.c_mktsegment, r.n_customers, r.sum_orders) == ("A", 3, 6)
    assert r.dispersion_q6 == 2_000_000


def test_dispersion_and_time_decay_plan_shapes(spark):
    """Scale pins: the dispersion index is window-free (two keyed
    exchanges only); time-decay attribution reuses ONE user-keyed
    Window node for all 14 day-frame sums and joins nothing."""
    from almost_any_file_to_pandas_spark.operators.funnel import (
        events_attribution_time_decay,
    )
    from almost_any_file_to_pandas_spark.plans.rankstats import (
        customer_order_count_dispersion,
    )

    spark.catalog.clearCache()
    p = (
        customer_order_count_dispersion(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in p
    assert "CartesianProduct" not in p

    p = (
        events_attribution_time_decay(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert p.count("Window") == 1  # one node, all 14 frame sums
    assert "Join" not in p
    assert p.count("Scan parquet") == 1
