"""Round-10 optimization tests: internals changed by the r10 round
(schema-cached parquet reads and operator restructurings) pinned
against their prior semantics."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import SparkSession

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def spark():
    from almost_any_file_to_pandas_spark.session import get_spark

    return get_spark("test_round10_opt")


def test_schema_cache_matches_inference_and_invalidates(spark, tmp_path):
    """plans._read_parquet must return the SAME schema the inference
    path returns (for every testdata table, including the
    TIMESTAMP(NANOS) events file), hit its cache on a second read,
    and invalidate when the file changes underneath it."""
    from almost_any_file_to_pandas_spark import plans
    from almost_any_file_to_pandas_spark.session import apply_engine_conf

    apply_engine_conf(spark)
    for name in plans.TABLES:
        path = f"{SF_DIR}/{name}.parquet"
        plans._SCHEMA_CACHE.clear()
        cold = plans._read_parquet(spark, path)
        assert plans._SCHEMA_CACHE, "first read must populate the cache"
        warm = plans._read_parquet(spark, path)
        inferred = spark.read.parquet(path)
        assert warm.schema == inferred.schema, name
        assert cold.schema == inferred.schema, name

    # rewriting the file must invalidate the cached entry (key carries
    # size + mtime_ns): write a one-column file, read it, then replace
    # it with a DIFFERENT schema at the same path
    p = str(tmp_path / "t.parquet")
    spark.range(3).toDF("a").coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "src1")
    )
    src1 = [
        f for f in os.listdir(tmp_path / "src1") if f.endswith(".parquet")
    ][0]
    shutil.copyfile(str(tmp_path / "src1" / src1), p)
    assert plans._read_parquet(spark, p).columns == ["a"]
    spark.range(3).selectExpr("id AS b", "id AS c").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "src2"))
    src2 = [
        f for f in os.listdir(tmp_path / "src2") if f.endswith(".parquet")
    ][0]
    shutil.copyfile(str(tmp_path / "src2" / src2), p)
    os.utime(p, ns=(1, 1))  # force a distinct mtime even on fast fs
    assert plans._read_parquet(spark, p).columns == ["b", "c"]


def test_kmeans_driver_regime_matches_distributed(spark):
    """The r10 driver-side Lloyd's regime must produce BIT-IDENTICAL
    centroids to the distributed loop (same integer-q12 distances,
    same DECIMAL(30,15) mean arithmetic) — on the real embeddings
    corpus and on an RFM-feature-shaped frame."""
    from pyspark.sql import functions as F

    # similarity must import before ivf_kmeans (module-level oracle
    # strings in similarity import back from ivf_kmeans)
    import almost_any_file_to_pandas_spark.operators.similarity  # noqa: F401
    from almost_any_file_to_pandas_spark.operators.ivf_kmeans import (
        deterministic_kmeans_centroids,
    )
    from almost_any_file_to_pandas_spark.plans import table_wide
    from almost_any_file_to_pandas_spark.session import apply_engine_conf

    apply_engine_conf(spark)
    emb = table_wide(spark, SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    feat = spark.createDataFrame(
        [(i, [((i * 7) % 13) / 13.0, ((i * 5) % 11) / 11.0, i / 40.0])
         for i in range(40)],
        "vec_id long, v array<double>",
    )
    for frame, k in ((emb, 8), (feat, 4)):
        fast = {
            r["cid"]: r["cvec"]
            for r in deterministic_kmeans_centroids(
                spark, frame, k
            ).collect()
        }
        dist = {
            r["cid"]: r["cvec"]
            for r in deterministic_kmeans_centroids(
                spark, frame, k, driver_cap=0
            ).collect()
        }
        assert fast == dist


def test_kcenter_driver_regime_matches_distributed(spark, monkeypatch):
    """The r10 driver-side greedy k-center traversal must emit the
    identical (rank, vec_id, radius_q12) trajectory the distributed
    pass loop emits — same integer-q12 distances, same tie-breaks."""
    import almost_any_file_to_pandas_spark.operators.similarity  # noqa: F401
    from almost_any_file_to_pandas_spark.operators import (
        ivf_kmeans,
        similarity,
    )
    from almost_any_file_to_pandas_spark.session import apply_engine_conf

    apply_engine_conf(spark)
    fast = sorted(
        tuple(r)
        for r in similarity.sim_kcenter_greedy_coreset(
            spark, SF_DIR
        ).collect()
    )
    monkeypatch.setattr(ivf_kmeans, "KMEANS_DRIVER_ROW_CAP", 0)
    slow = sorted(
        tuple(r)
        for r in similarity.sim_kcenter_greedy_coreset(
            spark, SF_DIR
        ).collect()
    )
    assert fast == slow
    assert len(fast) == similarity.KCENTER_K


def test_table_events_ts_conversion_survives_schema_cache(spark):
    """The nanos→timestamp conversion in plans.table() keys off the
    arriving dtype — with the schema cache the cached dtype must take
    the same branch and produce identical rows."""
    from almost_any_file_to_pandas_spark import plans
    from almost_any_file_to_pandas_spark.session import apply_engine_conf

    apply_engine_conf(spark)
    plans._SCHEMA_CACHE.clear()
    cold = plans.table(spark, SF_DIR, "events").select("ts").limit(5)
    cold_rows = [r["ts"] for r in cold.collect()]
    warm = plans.table(spark, SF_DIR, "events").select("ts").limit(5)
    warm_rows = [r["ts"] for r in warm.collect()]
    assert cold_rows == warm_rows
    assert dict(warm.dtypes)["ts"] == "timestamp"
