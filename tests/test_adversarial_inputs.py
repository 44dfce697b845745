"""Adversarial data-shape tests: skew, oversized rows, empty tables.

The determinism battery varies PARTITIONING on fixed data; these vary
the DATA SHAPE on fixed code — the other axis a 100 TB corpus
exercises that the clean synthetic testdata never does:

- **skew**: one user owning half the event stream (the hot-key shape
  salting/AQE exist for) through the sessionizer, the skew profile
  and the salted aggregate, gate-compared against DuckDB;
- **oversized rows**: a ~1 MB single document through the shingle /
  minhash / budget kernels (per-row memory, Arrow batch limits);
- **empty tables**: zero-row inputs through one representative of
  each family — the contract is no exception and engine/oracle
  agreement on the (often NULL-bearing) aggregate row.
"""

from __future__ import annotations

import datetime
import sys

import pytest

sys.path.insert(0, "/root/repo/tools")


def _fingerprint(cols, rows):
    from check_oracle import frame_fingerprint

    return frame_fingerprint(cols, rows)


def _gate_compare(spark, sf_dir, query_name):
    import os

    import duckdb

    from almost_any_file_to_pandas_spark import plans

    plans.load_all()
    sdf = plans.QUERIES[query_name](spark, sf_dir)
    s_fp = _fingerprint(sdf.columns, [tuple(r) for r in sdf.collect()])
    con = duckdb.connect()
    for t in ("events", "documents", "embeddings"):
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        elif not os.path.exists(path):
            continue
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )
    cur = con.execute(plans.ORACLES[query_name])
    cols = [d[0] for d in cur.description]
    d_fp = _fingerprint(cols, cur.fetchall())
    assert s_fp == d_fp, f"{query_name} diverges on adversarial shape"


@pytest.fixture()
def skewed_events_dir(spark, tmp_path):
    """User 1 owns ~half the stream (the hot-key shape); the rest is
    spread thin. Timestamps interleave so sessions split and merge."""
    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for i in range(600):  # hot user: bursts with occasional gaps
        gap_min = 2 if i % 50 else 120
        rows.append(
            (
                eid,
                base + datetime.timedelta(minutes=i * gap_min % 100000),
                1,
                ["view", "click", "purchase"][i % 3],
                float(i % 97) + 0.25,
                None,
            )
        )
        eid += 1
    for u in range(2, 102):  # 100 cold users, 6 events each
        for i in range(6):
            rows.append(
                (
                    eid,
                    base + datetime.timedelta(hours=u, minutes=i * 7),
                    u,
                    "view" if i % 2 else "click",
                    1.5 * i,
                    None,
                )
            )
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.coalesce(2).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    return str(tmp_path)


def test_hot_key_shapes_match_oracle(spark, skewed_events_dir):
    for q in (
        "events_sessionization",
        "events_key_skew_profile",
        "events_salted_agg",
        "events_bot_user_census",
        "events_hourly_quantiles_by_type",
    ):
        _gate_compare(spark, skewed_events_dir, q)


@pytest.fixture()
def megadoc_dir(spark, tmp_path):
    """One ~1 MB document (150k tokens) plus normal docs — per-row
    kernel memory and Arrow batch behavior."""
    big = " ".join(f"tok{i % 5000}" for i in range(150_000))
    rows = [
        (1, big, "en", "web", len(big)),
        (2, "the quick brown fox jumps over the lazy dog", "en", "web", 44),
        (3, "the quick brown fox jumps over the lazy dog", "en", "wiki", 44),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def test_megadoc_through_text_kernels(spark, megadoc_dir):
    from almost_any_file_to_pandas_spark import plans

    plans.load_all()
    # oracle-compared where the oracle stays cheap on a megadoc
    for q in ("text_token_count", "text_token_budget_trim", "dedup_exact"):
        _gate_compare(spark, megadoc_dir, q)
    # engine-only smoke for the heavy kernels (the DuckDB side of the
    # shingle oracles is quadratic-ish on a 150k-token doc)
    out = plans.QUERIES["dedup_minhash_lsh"](spark, megadoc_dir).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in out] == [(2, 3)]


@pytest.fixture()
def empty_dir(spark, tmp_path):
    spark.createDataFrame(
        [],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    spark.createDataFrame(
        [],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    spark.createDataFrame(
        [], "vec_id long, embedding array<double>, label string"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )
    return str(tmp_path)


def test_empty_tables_never_raise(spark, empty_dir):
    """Zero-row inputs through one representative per family: the
    engine must plan and execute (no exception); row counts are
    whatever the aggregate shape implies, compared against the oracle
    where the oracle also runs."""
    from almost_any_file_to_pandas_spark import plans

    plans.load_all()
    for q in (
        "events_sessionization",
        "events_user_erasure_audit",
        "text_token_count",
        "dedup_exact",
        "text_token_budget_trim",
        "events_stream_dedup_batch",
    ):
        rows = plans.QUERIES[q](spark, empty_dir).collect()
        assert rows is not None  # executed without raising
    # gate-level agreement on an aggregate census over nothing
    _gate_compare(spark, empty_dir, "events_user_erasure_audit")
