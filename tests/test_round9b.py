"""Hand-corpus pins for the round-9 distribution-shape censuses
(operators/distribution.py): the Lorenz/Gini concentration fold and
the dense-daily ACF sufficient statistics. Every expected value below is computed by hand in the
docstrings so a regression points at the exact term that moved.
"""

from __future__ import annotations

import datetime

from almost_any_file_to_pandas_spark import plans
from almost_any_file_to_pandas_spark.plans import QUERIES

plans.load_all()


def _write_orders(spark, sf, rows, schema):
    sf.mkdir(exist_ok=True)
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(sf / "orders.parquet"))
    return str(sf)


def test_gini_lorenz_hand_corpus(spark, tmp_path):
    """Four customers with spends 0 (no orders), 100, 100, 200 cents.
    Sorted ranks 1..4: S0 = 400, S1 = 0·1+100·2+100·3+200·4 = 1300.
    Gini = (2·1300 − 5·400)/(4·400) = 600/1600 → 375000 q6.
    Deciles via (i−1)·10 // 4 + 1 → 1, 3, 6, 8; cumulative shares
    0, 250000, 500000, 1000000."""
    sf = tmp_path / "gini"
    sf.mkdir()
    spark.createDataFrame(
        [(1,), (2,), (3,), (4,)], "c_custkey bigint"
    ).coalesce(1).write.parquet(str(sf / "customer.parquet"))
    spark.createDataFrame(
        [(2, 1.00), (3, 0.50), (3, 0.50), (4, 2.00)],
        "o_custkey bigint, o_totalprice double",
    ).coalesce(1).write.parquet(str(sf / "orders.parquet"))
    rows = sorted(
        QUERIES["customer_spend_gini_lorenz"](
            spark, str(sf)
        ).collect(),
        key=lambda r: r.decile,
    )
    assert [r.decile for r in rows] == [1, 3, 6, 8]
    assert [r.n_cust for r in rows] == [1, 1, 1, 1]
    assert [r.decile_spend_c for r in rows] == [0, 100, 100, 200]
    assert [r.cum_share_q6 for r in rows] == [
        0,
        250_000,
        500_000,
        1_000_000,
    ]
    assert all(r.gini_q6 == 375_000 for r in rows)


def test_acf_hand_corpus(spark, tmp_path):
    """Two orders on each of days 0, 2, 4 → dense series x =
    [2,0,2,0,2] (n=5, S=6, Q=12; den = 25·12 − 5·36 = 120).
    lag1: sxy=0, head=tail=4, num = −5·6·8 + 4·36 = −96
      → trunc(−96e6/120) = −800000 (the alternating signature).
    lag2: sxy=8, num = 200 − 240 + 108 = 68 → 566666.
    lag3: num = −120 + 72 = −48 → −400000.
    lag4: num = 100 − 120 + 36 = 16 → 133333.
    Lags ≥ 5 have no pairs and emit no rows."""
    d = datetime.date
    sf = _write_orders(
        spark,
        tmp_path / "acf",
        [
            (d(2024, 1, 1),),
            (d(2024, 1, 1),),
            (d(2024, 1, 3),),
            (d(2024, 1, 3),),
            (d(2024, 1, 5),),
            (d(2024, 1, 5),),
        ],
        "o_orderdate date",
    )
    rows = {
        r.lag: r
        for r in QUERIES["orders_acf_daily_counts"](
            spark, sf
        ).collect()
    }
    assert sorted(rows) == [1, 2, 3, 4]
    assert rows[1].n_pairs == 4 and rows[1].sxy == 0
    assert rows[1].acf_q6 == -800_000
    assert rows[2].sxy == 8 and rows[2].acf_q6 == 566_666
    assert rows[3].acf_q6 == -400_000
    assert rows[4].n_pairs == 1 and rows[4].acf_q6 == 133_333


def test_entropy_hand_corpus(spark, tmp_path):
    """Types a×2, b×2: H = ln4 − (2·2·ln2·1e6 folded)/4 = ln2 →
    693147 micro-nats; uniform 2-type mix → normalized exactly 1e6."""
    import datetime

    sf = tmp_path / "ent"
    sf.mkdir()
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (1, i, base, 1.0, t)
        for i, t in enumerate(["a", "a", "b", "b"])
    ]
    spark.createDataFrame(
        rows,
        "user_id bigint, event_id bigint, ts timestamp,"
        " value double, event_type string",
    ).coalesce(1).write.parquet(str(sf / "events.parquet"))
    r = QUERIES["events_type_entropy_census"](
        spark, str(sf)
    ).collect()[0]
    assert r.n_events == 4 and r.n_types == 2
    assert r.entropy_q6 == 693_147
    assert r.norm_entropy_q6 == 1_000_000


def test_entropy_single_type_guard(spark, tmp_path):
    import datetime

    sf = tmp_path / "ent1"
    sf.mkdir()
    base = datetime.datetime(2024, 1, 1)
    spark.createDataFrame(
        [(1, 1, base, 1.0, "only")],
        "user_id bigint, event_id bigint, ts timestamp,"
        " value double, event_type string",
    ).coalesce(1).write.parquet(str(sf / "events.parquet"))
    r = QUERIES["events_type_entropy_census"](
        spark, str(sf)
    ).collect()[0]
    assert r.entropy_q6 == 0 and r.norm_entropy_q6 == 0


def test_newsvendor_hand_corpus(spark, tmp_path):
    """Quantities [1,1,1,2,10] at fractile 0.8: need cum ≥ 4 of 5 —
    the census walk hits it at q=2 (cum 4), achieved exactly
    800000."""
    sf = tmp_path / "nv"
    sf.mkdir()
    spark.createDataFrame(
        [(1, "B1")], "p_partkey bigint, p_brand string"
    ).coalesce(1).write.parquet(str(sf / "part.parquet"))
    spark.createDataFrame(
        [(1, float(q)) for q in (1, 1, 1, 2, 10)],
        "l_partkey bigint, l_quantity double",
    ).coalesce(1).write.parquet(str(sf / "lineitem.parquet"))
    r = QUERIES["part_newsvendor_stock_level"](
        spark, str(sf)
    ).collect()[0]
    assert r.brand == "B1" and r.n_obs == 5
    assert r.stock_level == 2
    assert r.achieved_q6 == 800_000


def test_weekday_spectrum_hand_corpus(spark, tmp_path):
    """Orders on days 0 and 2 only → series [1,0,1] (n=3, S0=2).
    Period 2 (residues 0,1,0 with cosq ±1e6): Sc = 2e6, Ss = 0 →
    amp2 = 4e12 // 4 = 1e12 (a perfect alternation scores full
    relative amplitude). Period 4 (residues 0,1,2; cos 1e6,0,−1e6):
    both folds cancel → amp2 = 0."""
    import datetime

    sf = tmp_path / "spec"
    sf.mkdir()
    d = datetime.date
    spark.createDataFrame(
        [(d(2024, 1, 1),), (d(2024, 1, 3),)],
        "o_orderdate date",
    ).coalesce(1).write.parquet(str(sf / "orders.parquet"))
    rows = {
        r.period: r
        for r in QUERIES["orders_weekday_spectrum"](
            spark, str(sf)
        ).collect()
    }
    assert sorted(rows) == list(range(2, 15))
    assert rows[2].n_days == 3
    assert rows[2].s_cos_q6 == 2_000_000 and rows[2].s_sin_q6 == 0
    assert rows[2].amp2_q12 == 1_000_000_000_000
    assert rows[4].s_cos_q6 == 0 and rows[4].s_sin_q6 == 0
    assert rows[4].amp2_q12 == 0


def test_price_index_hand_corpus(spark, tmp_path):
    """Part 1: 2 units @5.00 in 2020, 1 unit @6.00 in 2022 → all
    three indices exactly 1.2 (1200000 q6). Part 2 exists only in
    the base year and drops from the common basket."""
    import datetime

    sf = tmp_path / "pidx"
    sf.mkdir()
    d = datetime.date
    spark.createDataFrame(
        [(10, d(2020, 5, 1)), (11, d(2022, 5, 1))],
        "o_orderkey bigint, o_orderdate date",
    ).coalesce(1).write.parquet(str(sf / "orders.parquet"))
    spark.createDataFrame(
        [
            (10, 1, 10.00, 2.0),
            (10, 2, 3.00, 1.0),
            (11, 1, 6.00, 1.0),
        ],
        "l_orderkey bigint, l_partkey bigint,"
        " l_extendedprice double, l_quantity double",
    ).coalesce(1).write.parquet(str(sf / "lineitem.parquet"))
    r = QUERIES["orders_price_index_fisher"](
        spark, str(sf)
    ).collect()[0]
    assert (r.base_year, r.comp_year) == (2020, 2022)
    assert r.n_common_parts == 1
    assert r.laspeyres_q6 == 1_200_000
    assert r.paasche_q6 == 1_200_000
    assert r.fisher_q6 == 1_200_000


def test_price_index_single_year_empty(spark, tmp_path):
    import datetime

    sf = tmp_path / "pidx1"
    sf.mkdir()
    d = datetime.date
    spark.createDataFrame(
        [(10, d(2020, 5, 1))], "o_orderkey bigint, o_orderdate date"
    ).coalesce(1).write.parquet(str(sf / "orders.parquet"))
    spark.createDataFrame(
        [(10, 1, 5.0, 1.0)],
        "l_orderkey bigint, l_partkey bigint,"
        " l_extendedprice double, l_quantity double",
    ).coalesce(1).write.parquet(str(sf / "lineitem.parquet"))
    assert (
        QUERIES["orders_price_index_fisher"](spark, str(sf)).count()
        == 0
    )
