"""Structured Streaming plumbing tests: the stream builders run
against a real file source with a memory sink (trigger=availableNow)
and must reproduce the batch counterparts' aggregates.

Complete output mode is used so every window surfaces without waiting
on watermark advancement — the semantic gate for windowing is the
batch/oracle pair; this verifies the streaming *plumbing* (source →
watermark → stateful agg → sink) actually runs and agrees.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from almost_any_file_to_pandas_spark.plans import table
from almost_any_file_to_pandas_spark.session import apply_engine_conf
from almost_any_file_to_pandas_spark.streaming.events import (
    events_session_window_stream,
    events_tumbling_window,
    events_tumbling_window_stream,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_source(spark, tmp_path_factory):
    """Re-materialize sf0.001 events as a streamable parquet dir with
    a plain TIMESTAMP column (the source testdata is TIMESTAMP(NANOS),
    which needs the engine's read-side conversion first)."""
    apply_engine_conf(spark)
    out = str(tmp_path_factory.mktemp("events_stream_src"))
    table(spark, SF_DIR, "events").write.mode("overwrite").parquet(out)
    return out


def _run_to_memory(df, name: str, mode: str):
    query = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)
    return query


def test_tumbling_window_stream_matches_batch(spark, events_source):
    schema = spark.read.parquet(events_source).schema
    stream_df = events_tumbling_window_stream(spark, events_source, schema)
    _run_to_memory(stream_df, "tumbling_mem", "complete")
    import datetime as _dt

    def _us(ts):
        return int(
            ts.replace(tzinfo=_dt.timezone.utc).timestamp() * 1_000_000
        )

    got = {
        (_us(r["window_start"]), r["event_type"]): (
            r["n_events"],
            r["total_value"],
        )
        for r in spark.sql("select * from tumbling_mem").collect()
    }
    batch = {
        (r["window_start_us"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in events_tumbling_window(spark, SF_DIR).collect()
    }
    assert got == batch
    assert len(got) > 0


def test_session_window_stream_runs_and_bounds_sessions(spark, events_source):
    schema = spark.read.parquet(events_source).schema
    stream_df = events_session_window_stream(spark, events_source, schema)
    _run_to_memory(stream_df, "sessions_mem", "complete")
    rows = spark.sql("select * from sessions_mem").collect()
    assert len(rows) > 0
    # session totals must partition the event count exactly
    assert sum(r["n_events"] for r in rows) == spark.read.parquet(
        events_source
    ).count()
    # no session may span users
    assert all(r["user_id"] is not None for r in rows)


def test_stream_is_incremental(spark, events_source, tmp_path):
    """Two-batch file arrival: the memory sink must reflect both."""
    import shutil
    from pathlib import Path

    src = tmp_path / "incremental"
    src.mkdir()
    parts = sorted(Path(events_source).glob("*.parquet"))
    assert parts, "expected parquet part files"
    half = max(1, len(parts) // 2)
    for p in parts[:half]:
        shutil.copy(p, src / p.name)

    schema = spark.read.parquet(events_source).schema
    stream_df = (
        spark.readStream.schema(schema)
        .parquet(str(src))
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
    )
    q = _run_to_memory(stream_df, "inc_mem", "complete")
    first_total = sum(
        r["n"] for r in spark.sql("select * from inc_mem").collect()
    )

    for p in parts[half:]:
        shutil.copy(p, src / p.name)
    q2 = _run_to_memory(stream_df, "inc_mem2", "complete")
    second_total = sum(
        r["n"] for r in spark.sql("select * from inc_mem2").collect()
    )
    assert second_total >= first_total
    assert second_total == spark.read.parquet(events_source).count()


def test_running_totals_stateful_stream(spark, events_source):
    from almost_any_file_to_pandas_spark.streaming.events import (
        events_running_totals_stream,
    )

    schema = spark.read.parquet(events_source).schema
    stream_df = events_running_totals_stream(spark, events_source, schema)
    q = (
        stream_df.writeStream.format("memory")
        .queryName("running_mem")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # update mode re-emits a user on every batch → keep the final
    # (maximal) running count per user
    got = {
        r["user_id"]: r["n_events"]
        for r in spark.sql(
            "select user_id, max(n_events) as n_events from running_mem group by user_id"
        ).collect()
    }
    batch = {
        r["user_id"]: r["n"]
        for r in spark.read.parquet(events_source)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == batch


def test_stream_dedup_drops_redeliveries(spark, events_source, tmp_path):
    import shutil
    from pathlib import Path

    from almost_any_file_to_pandas_spark.streaming.events import (
        events_stream_dedup,
    )

    src = tmp_path / "dup_src"
    src.mkdir()
    parts = sorted(Path(events_source).glob("*.parquet"))
    for p in parts:  # deliver every file twice
        shutil.copy(p, src / p.name)
        shutil.copy(p, src / f"redelivery_{p.name}")

    schema = spark.read.parquet(events_source).schema
    q = (
        events_stream_dedup(spark, str(src), schema)
        .writeStream.format("memory")
        .queryName("dedup_mem")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select count(*) n, count(distinct event_id) d from dedup_mem").first()
    expected = spark.read.parquet(events_source).count()
    assert got["n"] == expected  # every duplicate dropped
    assert got["d"] == expected


def test_stream_static_enrich_broadcasts(spark, events_source):
    """Stream-static join: every event row picks up its dimension
    attribute; the join is stateless (runs with no watermark)."""
    from almost_any_file_to_pandas_spark.streaming.events import (
        events_stream_enrich,
    )

    ev = table(spark, SF_DIR, "events")
    dim = (
        ev.select(F.col("user_id").alias("dim_key"))
        .distinct()
        .withColumn("segment", F.concat(F.lit("seg_"), F.col("dim_key") % 3))
    )
    enriched = events_stream_enrich(spark, events_source, ev.schema, dim)
    q = _run_to_memory(enriched, "enriched_events", "append")
    out = spark.sql("SELECT * FROM enriched_events")
    n_src = ev.count()
    assert out.count() == n_src  # inner join, every user in the dim
    assert out.filter(F.col("segment").isNull()).count() == 0
    q.stop()


def test_foreachbatch_sink_idempotent_on_replay(spark, events_source, tmp_path):
    """A replayed micro-batch must overwrite its own partition, not
    append a duplicate — exactly-once effect from at-least-once
    delivery."""
    from almost_any_file_to_pandas_spark.streaming.events import (
        events_stream_upsert_sink,
    )

    ev = table(spark, SF_DIR, "events")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    stream = spark.readStream.schema(ev.schema).parquet(events_source)
    q = events_stream_upsert_sink(stream, sink, ckpt)
    q.awaitTermination(120)

    first = spark.read.parquet(sink)
    n_first = first.count()
    assert n_first == ev.count()

    # Simulate the at-least-once replay: rerun batch 0's write exactly
    # as foreachBatch would on recovery.
    # materialize first: overwrite deletes the very files a lazy
    # self-read would scan
    batch0 = spark.read.parquet(f"{sink}/batch_id=0").localCheckpoint(eager=True)
    batch0.write.mode("overwrite").parquet(f"{sink}/batch_id=0")
    assert spark.read.parquet(sink).count() == n_first


def test_stateful_sessionizer_matches_batch_closed_sessions(
    spark, events_source
):
    """The applyInPandasWithState sessionizer's append feed must be
    EXACTLY the batch sessionizer's answer minus each user's final
    (still-open) session — the state-machine and window forms of the
    same gap rule."""
    from almost_any_file_to_pandas_spark.plans import QUERIES, load_all
    from almost_any_file_to_pandas_spark.streaming.events import (
        events_sessionizer_stateful_stream,
    )

    load_all()
    schema = spark.read.parquet(events_source).schema
    q = _run_to_memory(
        events_sessionizer_stateful_stream(spark, events_source, schema),
        "stateful_sessions",
        "append",
    )
    got = {
        (r["user_id"], r["session_start_us"], r["n_events"])
        for r in spark.sql("SELECT * FROM stateful_sessions").collect()
    }
    from pyspark.sql import Window

    batch = QUERIES["events_sessionization"](spark, SF_DIR)
    w_max = F.max("session_id").over(Window.partitionBy("user_id"))
    closed = (
        batch.withColumn("max_sid", w_max)
        .filter(F.col("session_id") < F.col("max_sid"))
        .select("user_id", "session_start_us", "n_events")
    )
    want = {
        (r["user_id"], r["session_start_us"], r["n_events"])
        for r in closed.collect()
    }
    assert got == want and len(want) > 0


def test_stream_stream_join_matches_batch_range_join(
    spark, events_source, tmp_path
):
    """Watermarked stream-stream join (views x purchases within 1h)
    must emit exactly the pairs the batch range join over the same
    static frames produces. availableNow processes the full history,
    so the watermark only bounds state, never drops — append output
    is the complete pair set."""
    from almost_any_file_to_pandas_spark.streaming.events import (
        STREAM_JOIN_WINDOW_HOURS,
        events_stream_stream_join,
    )

    ev = spark.read.parquet(events_source)
    schema = ev.schema
    views_dir = str(tmp_path / "views")
    purchases_dir = str(tmp_path / "purchases")
    ev.filter(F.col("event_type") == "view").write.parquet(views_dir)
    ev.filter(F.col("event_type") == "purchase").write.parquet(
        purchases_dir
    )

    joined = events_stream_stream_join(
        spark, views_dir, purchases_dir, schema
    )
    q = _run_to_memory(joined, "ss_join", "append")
    got = {
        (r.v_user, r.view_id, r.purchase_id)
        for r in spark.table("ss_join").collect()
    }
    q.stop()

    v = spark.read.parquet(views_dir).select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
        F.col("event_id").alias("view_id"),
    )
    p = spark.read.parquet(purchases_dir).select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    want = {
        (r.v_user, r.view_id, r.purchase_id)
        for r in v.join(
            p,
            F.expr(
                "v_user = p_user AND p_ts >= v_ts AND"
                f" p_ts <= v_ts + interval {STREAM_JOIN_WINDOW_HOURS} hour"
            ),
        ).collect()
    }
    assert got == want and len(want) > 0


def test_heavy_hitters_stream_exact_and_bounded(spark, events_source):
    """Space-saving contract, both regimes. With capacity above the
    distinct-user count no eviction fires: every batch-top-k user is
    emitted with error 0 and max emitted estimate == its true count.
    With a tight capacity every estimate obeys the overestimate bound
    est <= true + N/capacity, and every user whose true count exceeds
    N/capacity appears in the emitted union (the guarantee set)."""
    from almost_any_file_to_pandas_spark.streaming.events import (
        events_heavy_hitters_stream,
    )

    schema = spark.read.parquet(events_source).schema
    ev = spark.read.parquet(events_source)
    true = {
        (r["event_type"], r["user_id"]): r["n"]
        for r in ev.groupBy("event_type", "user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    totals = {}
    for (t, _u), n in true.items():
        totals[t] = totals.get(t, 0) + n
    n_users = len({u for (_t, u) in true})

    # exact regime: capacity > distinct users of any type
    q = _run_to_memory(
        events_heavy_hitters_stream(
            spark, events_source, schema, capacity=n_users + 1, topk=10
        ),
        "hh_exact",
        "update",
    )
    rows = spark.sql("SELECT * FROM hh_exact").collect()
    assert rows, "no heavy-hitter rows emitted"
    assert all(r["err_bound"] == 0 for r in rows)
    best = {}
    for r in rows:
        k = (r["event_type"], r["user_id"])
        best[k] = max(best.get(k, 0), r["est_count"])
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy(
        F.desc("n"), F.asc("user_id")
    )
    batch_topk = (
        ev.groupBy("event_type", "user_id")
        .agg(F.count("*").alias("n"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .collect()
    )
    for r in batch_topk:
        k = (r["event_type"], r["user_id"])
        assert best.get(k) == r["n"], (k, best.get(k), r["n"])

    # tight regime: bound + guarantee set (topk=capacity emits the
    # whole table, so the final batch carries every guaranteed user)
    cap = 8
    q2 = _run_to_memory(
        events_heavy_hitters_stream(
            spark, events_source, schema, capacity=cap, topk=cap
        ),
        "hh_tight",
        "update",
    )
    rows2 = spark.sql("SELECT * FROM hh_tight").collect()
    emitted = {(r["event_type"], r["user_id"]) for r in rows2}
    for r in rows2:
        k = (r["event_type"], r["user_id"])
        bound = true.get(k, 0) + totals[r["event_type"]] // cap
        assert r["est_count"] <= bound, (k, r["est_count"], bound)
    for (t, u), n in true.items():
        if n > totals[t] // cap:
            assert (t, u) in emitted, (t, u, n)


def test_rate_limiter_stream_equals_batch(spark, events_source):
    """The applyInPandasWithState token bucket must emit EXACTLY the
    batch audit's per-event decisions — same integer kernel, state
    carried through the store instead of the group scan."""
    from almost_any_file_to_pandas_spark.plans import QUERIES, load_all
    from almost_any_file_to_pandas_spark.streaming.events import (
        events_rate_limiter_stream,
    )

    load_all()
    schema = spark.read.parquet(events_source).schema
    _run_to_memory(
        events_rate_limiter_stream(spark, events_source, schema),
        "rl_stream",
        "append",
    )
    got = {
        (r["user_id"], r["event_id"], r["allowed"],
         r["tokens_milli_after"])
        for r in spark.sql("SELECT * FROM rl_stream").collect()
    }
    want = {
        (r["user_id"], r["event_id"], r["allowed"],
         r["tokens_milli_after"])
        for r in QUERIES["events_rate_limit_audit"](
            spark, SF_DIR
        ).collect()
    }
    assert got == want


def test_rate_limiter_stream_multi_chunk_groups(spark, tmp_path):
    """Pin the Arrow-chunk ordering fix: with a tiny
    maxRecordsPerBatch every user's micro-batch spans several chunks,
    and the source file is written in REVERSE time order, so any
    chunk-local sort (the fixed bug) processes later events first and
    diverges from the batch audit."""
    import datetime

    from almost_any_file_to_pandas_spark.plans import QUERIES, load_all
    from almost_any_file_to_pandas_spark.streaming.events import (
        events_rate_limiter_stream,
    )

    load_all()
    base = datetime.datetime(2024, 3, 1)
    rows = []
    eid = 0
    for u in (1, 2):
        for i in range(40):  # >> the 7-row Arrow batch below
            rows.append(
                (
                    eid,
                    base + datetime.timedelta(minutes=40 - i),  # reversed
                    u,
                    "view",
                    1.0,
                    None,
                )
            )
            eid += 1
    src = str(tmp_path / "events.parquet")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(src)

    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        schema = spark.read.parquet(src).schema
        _run_to_memory(
            events_rate_limiter_stream(spark, src, schema),
            "rl_chunked",
            "append",
        )
        got = {
            (r["user_id"], r["event_id"], r["allowed"],
             r["tokens_milli_after"])
            for r in spark.sql("SELECT * FROM rl_chunked").collect()
        }
        want = {
            (r["user_id"], r["event_id"], r["allowed"],
             r["tokens_milli_after"])
            for r in QUERIES["events_rate_limit_audit"](
                spark, str(tmp_path)
            ).collect()
        }
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", prev
        )
    assert got == want


def test_heavy_hitters_stream_chunk_invariant(spark, events_source):
    """Space-saving eviction under TIGHT capacity must not depend on
    Arrow chunk boundaries: a 7-row-batch run and a default-batch run
    over the same source must emit identical snapshots (the
    concat-then-sort discipline; chunk-local sorts would evict in a
    chunk-dependent order)."""
    from almost_any_file_to_pandas_spark.streaming.events import (
        events_heavy_hitters_stream,
    )

    schema = spark.read.parquet(events_source).schema

    def run(name, batch_rows):
        prev = spark.conf.get(
            "spark.sql.execution.arrow.maxRecordsPerBatch"
        )
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(batch_rows),
        )
        try:
            _run_to_memory(
                events_heavy_hitters_stream(
                    spark, events_source, schema, capacity=8, topk=8
                ),
                name,
                "update",
            )
        finally:
            spark.conf.set(
                "spark.sql.execution.arrow.maxRecordsPerBatch", prev
            )
        return sorted(
            tuple(r)
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        )

    assert run("hh_chunk7", 7) == run("hh_chunk_big", 100000)


def test_sessionizer_stream_multi_chunk_groups(spark, events_source):
    """Third member of the chunk-ordering trio: the stateful
    sessionizer under 7-row Arrow batches must still equal the batch
    sessionizer minus open tails (the existing contract, now proven
    with every user's micro-batch spanning several chunks)."""
    from pyspark.sql import Window

    from almost_any_file_to_pandas_spark.plans import QUERIES, load_all
    from almost_any_file_to_pandas_spark.streaming.events import (
        events_sessionizer_stateful_stream,
    )

    load_all()
    schema = spark.read.parquet(events_source).schema
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        _run_to_memory(
            events_sessionizer_stateful_stream(
                spark, events_source, schema
            ),
            "sess_chunk7",
            "append",
        )
        got = {
            (r["user_id"], r["session_start_us"], r["n_events"])
            for r in spark.sql("SELECT * FROM sess_chunk7").collect()
        }
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", prev
        )
    batch = QUERIES["events_sessionization"](spark, SF_DIR)
    w_max = F.max("session_id").over(Window.partitionBy("user_id"))
    want = {
        (r["user_id"], r["session_start_us"], r["n_events"])
        for r in batch.withColumn("_last", w_max)
        .filter(F.col("session_id") != F.col("_last"))
        .collect()
    }
    assert got == want


def test_view_click_stream_join_matches_batch(spark, events_source):
    """Stream-stream interval join (watermarked both sides) must emit
    exactly the batch twin's (view, click) pairs — availableNow drains
    the source, and append mode emits each matched pair once."""
    from almost_any_file_to_pandas_spark.streaming.events import (
        events_view_click_pairs,
        events_view_click_stream_join,
    )

    schema = spark.read.parquet(events_source).schema
    stream_df = events_view_click_stream_join(spark, events_source, schema)
    _run_to_memory(stream_df, "vc_join_mem", "append")
    got = {
        (r["view_id"], r["click_id"], r["lag_us"])
        for r in spark.sql("select * from vc_join_mem").collect()
    }
    batch = {
        (r["view_id"], r["click_id"], r["lag_us"])
        for r in events_view_click_pairs(spark, SF_DIR).collect()
    }
    assert got == batch
    assert len(got) > 0


def test_windowed_topk_stream_matches_batch(spark, events_source):
    """The streamed (window, type) counts, ranked by the SAME
    topk_of_window_counts kernel the batch twin uses, reproduce the
    batch leaderboard exactly — complete mode surfaces every window."""
    from almost_any_file_to_pandas_spark.streaming.events import (
        events_windowed_topk,
        events_windowed_topk_stream,
        topk_of_window_counts,
    )

    schema = spark.read.parquet(events_source).schema
    stream_df = events_windowed_topk_stream(spark, events_source, schema)
    _run_to_memory(stream_df, "wtopk_mem", "complete")
    sink = spark.sql("select * from wtopk_mem").select(
        F.unix_micros(F.col("window_start")).alias("window_start_us"),
        "event_type",
        "n_events",
    )
    got = {
        (r["window_start_us"], r["event_type"]): (r["n_events"], r["rnk"])
        for r in topk_of_window_counts(sink).collect()
    }
    batch = {
        (r["window_start_us"], r["event_type"]): (r["n_events"], r["rnk"])
        for r in events_windowed_topk(spark, SF_DIR).collect()
    }
    assert got == batch
    assert len(got) > 0


def test_rate_limiter_tws_stream_equals_batch(spark, events_source):
    """Spark 4's transformWithStateInPandas twin (StatefulProcessor +
    named ValueState) must emit EXACTLY the batch audit's decisions —
    the same kernel the applyInPandasWithState twin runs, proving the
    engine's stateful operators are portable to the successor API.

    ENVIRONMENT GATE (same class as the tabula arm): the TWS Python
    worker speaks protobuf to the state server and this container
    ships no google.protobuf — the twin is exercised wherever
    protobuf exists; here the plan still BUILDS (API wiring checked)
    and the execution path is skipped."""
    pytest.importorskip(
        "google.protobuf.descriptor",
        reason="transformWithStateInPandas state protocol needs "
        "protobuf (not shipped in this container)",
    )
    from almost_any_file_to_pandas_spark.plans import QUERIES, load_all
    from almost_any_file_to_pandas_spark.streaming.events import (
        events_rate_limiter_tws_stream,
    )

    load_all()
    schema = spark.read.parquet(events_source).schema
    _run_to_memory(
        events_rate_limiter_tws_stream(spark, events_source, schema),
        "rl_tws_stream",
        "append",
    )
    got = {
        (r["user_id"], r["event_id"], r["allowed"],
         r["tokens_milli_after"])
        for r in spark.sql("SELECT * FROM rl_tws_stream").collect()
    }
    want = {
        (r["user_id"], r["event_id"], r["allowed"],
         r["tokens_milli_after"])
        for r in QUERIES["events_rate_limit_audit"](
            spark, SF_DIR
        ).collect()
    }
    assert got == want


def test_rate_limiter_tws_plan_builds(spark, events_source):
    """The environment-gated half that CAN run here: the
    transformWithStateInPandas twin's plan must build (StatefulProcessor
    wiring, output schema, state schema all validated at plan time) —
    only the protobuf-speaking execution worker is missing."""
    from almost_any_file_to_pandas_spark.streaming.events import (
        events_rate_limiter_tws_stream,
    )

    schema = spark.read.parquet(events_source).schema
    df = events_rate_limiter_tws_stream(spark, events_source, schema)
    assert df.isStreaming
    assert [f.name for f in df.schema.fields] == [
        "user_id", "event_id", "allowed", "tokens_milli_after",
    ]
