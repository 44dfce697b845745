"""Determinism battery — the hash-gate contract, asserted directly.

The driver's correctness gate compares an order-insensitive value
hash against DuckDB; that only works if a query's VALUES are
independent of physical execution. These tests run representative
queries under deliberately different parallelism (shuffle partitions,
input partitioning) and demand bit-identical fingerprints — catching
any accumulation-order float sum, partition-dependent sample, or
nondeterministic tie-break that a single-configuration run can't see.

One representative per risk class:
- float aggregation (decimal/integer-quantized sums): linalg profile,
  centroid means
- iterative algorithms: connected components, PageRank floor
- hash-derived sampling/ranking: stratified sample, negative samples
- window tie-breaks: sessionization, top-k
- Arrow-batched Python kernels: minhash LSH, PCA gram fold
"""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"

QUERIES_UNDER_TEST = [
    "emb_dimension_profile",
    "sim_centroid_by_label",
    "connected_components_alternating",
    "graph_pagerank_floor",
    "text_stratified_sample",
    "feat_negative_samples",
    "events_sessionization",
    "sim_bruteforce_topk",
    "dedup_minhash_lsh",
    "emb_pca_power_floor",
]


def fingerprint(df) -> tuple:
    """Order-insensitive value fingerprint, same protocol as the
    driver: columns sorted by name, rows sorted by stringified
    values."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from check_oracle import frame_fingerprint

    rows = [tuple(r) for r in df.collect()]
    digest, n, cols = frame_fingerprint(df.columns, rows)
    return digest, n, tuple(cols)


@pytest.mark.parametrize("name", QUERIES_UNDER_TEST)
def test_query_value_set_is_partitioning_independent(spark, name):
    from almost_any_file_to_pandas_spark import plans

    plans.load_all()
    fn = plans.QUERIES[name]

    spark.conf.set("spark.sql.shuffle.partitions", "32")
    base = fingerprint(fn(spark, SF_DIR))
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        alt = fingerprint(fn(spark, SF_DIR))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
    assert base == alt, (
        f"{name}: value fingerprint changed with shuffle partitioning"
    )
