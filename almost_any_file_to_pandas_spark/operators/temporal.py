"""Temporal operators Spark has no built-in for: as-of join.

The reference has no joins at all (SURVEY §2.9); as-of joins are in
the extension surface's named custom-operator list. Per the
composition-first rule (build from existing DataFrame ops before
reaching for UDFs), the as-of join here is NOT a join node: both
sides union into one event stream and a window function carries the
most recent left-side row forward — the "last non-null over ordered
partition" formulation.

Why this wins at 100 TB: a naive as-of join is a non-equi join
(t_right ≤ t_left) that Spark plans as a broadcast nested loop or an
exploded range join; the window form is ONE shuffle on the
partition key and a per-partition sort — exactly the cost of the
sort-merge join it replaces, with no quadratic blowup and AQE-managed
skew. DuckDB's native ASOF JOIN exists for the oracle, but the
window restatement is used there too so both engines run the
identical algorithm on identical types.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from almost_any_file_to_pandas_spark.plans import register, table, table_wide
from almost_any_file_to_pandas_spark.session import apply_engine_conf

ASOF_TOLERANCE_MINUTES = 30


def asof_join_last_before(
    events: DataFrame,
    left_type: str,
    right_type: str,
    tolerance_micros: int,
) -> DataFrame:
    """Generic as-of: for each ``left_type`` event, the most recent
    ``right_type`` event of the same user strictly before it (row
    order: ts, event_id), within ``tolerance_micros``."""
    ev = events.filter(F.col("event_type").isin(left_type, right_type))
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    is_right = F.col("event_type") == right_type
    marked = ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.last(F.when(is_right, F.col("ts")), ignorenulls=True)
        .over(w)
        .alias("matched_ts"),
        F.last(F.when(is_right, F.col("event_id")), ignorenulls=True)
        .over(w)
        .alias("matched_id"),
    )
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.col("matched_ts"))
    return marked.filter(
        (F.col("event_type") == left_type)
        & F.col("matched_ts").isNotNull()
        & (gap <= tolerance_micros)
    ).select(
        F.col("event_id").alias("left_id"),
        "user_id",
        F.col("ts").cast("string").alias("left_ts"),
        F.col("matched_id").alias("right_id"),
        F.col("matched_ts").cast("string").alias("right_ts"),
        (gap / F.lit(1000000.0)).alias("gap_seconds"),
    )


@register(
    "events_asof_view_click",
    oracle=f"""
    WITH ev AS (
      SELECT event_id, user_id, ts, event_type
      FROM events WHERE event_type IN ('click', 'view')
    ), marked AS (
      SELECT event_id, user_id, ts, event_type,
        last_value(CASE WHEN event_type = 'view' THEN ts END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
          AS matched_ts,
        last_value(CASE WHEN event_type = 'view' THEN event_id END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
          AS matched_id
      FROM ev
    )
    SELECT event_id AS left_id, user_id,
           CAST(ts AS VARCHAR) AS left_ts,
           matched_id AS right_id,
           CAST(matched_ts AS VARCHAR) AS right_ts,
           date_diff('microsecond', matched_ts, ts) / 1000000.0 AS gap_seconds
    FROM marked
    WHERE event_type = 'click' AND matched_ts IS NOT NULL
      AND date_diff('microsecond', matched_ts, ts)
          <= {ASOF_TOLERANCE_MINUTES} * 60 * 1000000
    """,
)
def events_asof_view_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View→click attribution: for every click, the user's most recent
    view within the tolerance — the canonical as-of join, in the
    window-function formulation (one shuffle on user_id, no join
    node, no non-equi explosion)."""
    apply_engine_conf(spark)
    ev = table(spark, sf_dir, "events")
    return asof_join_last_before(
        ev, "click", "view", ASOF_TOLERANCE_MINUTES * 60 * 1_000_000
    )


ZSCORE_THRESHOLD = 3.0


@register(
    "events_anomaly_zscore",
    oracle=f"""
    WITH stats AS (
      SELECT event_type,
             COUNT(*) AS n_events,
             ROUND(AVG(value), 6) AS mean_value,
             ROUND(stddev_pop(value), 6) AS std_value
      FROM events GROUP BY event_type
    )
    SELECT s.event_type, s.n_events, s.mean_value, s.std_value,
           COUNT(*) FILTER (
             WHERE abs(e.value - s.mean_value)
                   > {ZSCORE_THRESHOLD} * s.std_value
           ) AS n_anomalies
    FROM events e JOIN stats s USING (event_type)
    GROUP BY s.event_type, s.n_events, s.mean_value, s.std_value
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score anomaly counts — the monitoring pass of an
    event pipeline. Two aggregates: per-type moments (tiny result,
    values ROUNDED before thresholding so both engines cut on the
    identical boundary), broadcast back over the stream for the
    outlier count. The corpus shuffles only for the per-type
    partials; the stats side is |event_types| rows at any scale.
    """
    apply_engine_conf(spark)
    ev = table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.round(F.avg("value"), 6).alias("mean_value"),
        F.round(F.stddev_pop("value"), 6).alias("std_value"),
    )
    return (
        ev.join(F.broadcast(stats), "event_type")
        .groupBy("event_type", "n_events", "mean_value", "std_value")
        .agg(
            F.count_if(
                F.abs(F.col("value") - F.col("mean_value"))
                > ZSCORE_THRESHOLD * F.col("std_value")
            ).alias("n_anomalies")
        )
        .select(
            "event_type", "n_events", "mean_value", "std_value", "n_anomalies"
        )
    )
