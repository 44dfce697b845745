"""Sinks: write a parsed/derived table back out.

The reference has NO sinks (SURVEY.md §2.2 — it only returns
in-memory frames); Spark's writers come free, so the engine exposes
them through one façade that mirrors the ``parse`` dispatch-by-
extension contract in reverse. Not a parity requirement — a
completeness feature: a pipeline that reads 100 TB must also write.

Scale defaults: parquet with snappy; caller-controlled partitioning
(``partition_by``) maps to directory partitioning so downstream scans
get partition pruning; ``coalesce`` for the small-output case (a
report-sized result does not need 200 part files).
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterable, Optional, Union

from pyspark.sql import DataFrame

_WRITERS = {
    ".parquet": "parquet",
    ".json": "json",
    ".csv": "csv",
    ".orc": "orc",
}


def write(
    df: DataFrame,
    path: Union[str, Path],
    mode: str = "error",
    partition_by: Optional[Iterable[str]] = None,
    coalesce: Optional[int] = None,
    **options,
) -> str:
    """Write ``df`` to ``path``, format chosen by extension
    (parquet/json/csv/orc; default parquet for extension-less paths —
    the directory-dataset convention).

    Returns the resolved path. CSV writes include a header by default
    (the all-string positional-column tables round-trip through
    ``header=False`` + the parse façade's positional naming instead).
    """
    p = str(path)
    suffix = Path(p).suffix.lower()
    if suffix == ".avro":
        # stdlib OCF writer (no built-in avro jar here): one complete
        # container per partition, the reverse of sources.avro
        from almost_any_file_to_pandas_spark.sources.avro import (
            write_avro,
        )

        if coalesce is not None:
            df = df.coalesce(coalesce)
        return write_avro(df, p, **options)
    fmt = _WRITERS.get(suffix, "parquet")
    if coalesce is not None:
        df = df.coalesce(coalesce)
    writer = df.write.mode(mode)
    if fmt == "csv":
        options.setdefault("header", True)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.options(**options).format(fmt).save(p)
    return p


def write_bucketed(
    df: DataFrame,
    name: str,
    path: Union[str, Path],
    bucket_cols: Iterable[str],
    n_buckets: int = 64,
    sort_cols: Optional[Iterable[str]] = None,
    mode: str = "overwrite",
) -> str:
    """Write ``df`` as a bucketed (and optionally sorted) parquet
    table registered in the catalog as ``name``, stored at ``path``.

    Bucketing is the storage-side half of shuffle elimination: two
    tables bucketed by the same key into the same bucket count join
    with NO Exchange — each task reads matching bucket files from
    both sides (hash co-location is baked into the layout), and with
    ``sort_cols`` matching the join key the per-bucket sort is free
    too. At 100 TB this converts every recurring join/aggregation on
    the bucket key from a full-network shuffle into a local merge —
    the biggest single lever for a fact table that's joined daily.

    Spark requires bucketed output to go through ``saveAsTable`` (the
    bucket spec lives in the catalog, not the files); ``path`` makes
    it an external table so the data outlives the metastore.
    """
    bucket_cols = list(bucket_cols)
    writer = (
        df.write.format("parquet")
        .mode(mode)
        .option("path", str(path))
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*list(sort_cols))
    writer.saveAsTable(name)
    return name


def write_range_layout(
    df: DataFrame,
    path: Union[str, Path],
    range_cols: Iterable[str],
    n_files: Optional[int] = None,
    mode: str = "overwrite",
) -> str:
    """Range-clustered parquet layout: ``repartitionByRange`` on
    ``range_cols`` (sampled split points, one range exchange) +
    ``sortWithinPartitions`` so every output file covers a *disjoint*
    interval of the layout key and rows inside each file are sorted.

    This is the data-skipping layout for time-range/key-range access:
    parquet stores per-column min/max statistics per file and row
    group, so any range predicate on the layout key skips every
    non-overlapping file at planning time — scan cost becomes
    proportional to the selected range, not the table. The 100 TB
    pattern for event logs and fact tables queried by date. (The
    bucketed layout in :func:`write_bucketed` optimizes equi-joins
    instead; pick by access pattern.)
    """
    from pyspark.sql import functions as F

    cols = [F.col(c) for c in range_cols]
    parted = (
        df.repartitionByRange(n_files, *cols)
        if n_files
        else df.repartitionByRange(*cols)
    )
    parted.sortWithinPartitions(*[str(c) for c in range_cols]).write.mode(
        mode
    ).parquet(str(path))
    return str(path)


def compact(
    spark,
    src_path: Union[str, Path],
    dest_path: Union[str, Path],
    target_file_bytes: int = 128 * 1024 * 1024,
) -> tuple:
    """Small-files compaction: rewrite a parquet directory into
    ``ceil(total_bytes / target_file_bytes)`` files via ``coalesce``
    (a narrow, shuffle-free merge of input splits — compaction moves
    every byte once through the writers and nothing over the network).

    The operational companion of streaming ingest: a micro-batch sink
    leaves one small file per batch per partition, and at 100 TB the
    resulting listing/footer overhead dominates scan planning.
    Returns ``(n_files_before, n_files_after)``.
    """
    import glob
    import math
    import os

    files = [
        f
        for f in glob.glob(str(Path(src_path) / "**" / "*.parquet"), recursive=True)
    ]
    total = sum(os.path.getsize(f) for f in files)
    n_out = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(str(src_path))
    df.coalesce(n_out).write.mode("overwrite").parquet(str(dest_path))
    n_after = len(
        glob.glob(str(Path(dest_path) / "**" / "*.parquet"), recursive=True)
    )
    return (len(files), n_after)


def zorder_key(*cols, bits: int = 16):
    """Morton (Z-order) key: interleave the bits of each column's
    rank-normalized value. Rows close in EVERY dimension land close in
    key space, so range-clustering by this key (via
    :func:`write_zorder`) gives parquet min/max skipping on ALL the
    interleaved dimensions at once — the multi-dimensional upgrade of
    :func:`write_range_layout`'s single sort key.

    Columns must be non-negative integers (cast/normalize upstream;
    ``bits`` low bits are used). Pure JVM bit arithmetic — shifts and
    masks, whole-stage-codegen friendly.
    """
    from functools import reduce

    from pyspark.sql import functions as F

    exprs = [F.col(c).cast("bigint") if isinstance(c, str) else c.cast("bigint") for c in cols]
    n = len(exprs)
    parts = []
    for b in range(bits):
        for i, e in enumerate(exprs):
            src_bit = F.shiftrightunsigned(e, b).bitwiseAND(F.lit(1))
            parts.append(F.shiftleft(src_bit, b * n + i))
    return reduce(lambda a, x: a.bitwiseOR(x), parts)


def write_zorder(
    df: DataFrame,
    path: Union[str, Path],
    zorder_cols: Iterable[str],
    n_files: int = 8,
    bits: int = 16,
    mode: str = "overwrite",
) -> str:
    """Z-order-clustered parquet: compute the Morton key, range-
    partition + sort by it, drop the key from the payload. Every file
    then covers a compact hyper-rectangle-ish region of the combined
    key space — predicates on ANY of the z-ordered columns skip most
    files via footer statistics, where a single-column sort would
    only serve its leading column.
    """
    from pyspark.sql import functions as F

    cols = list(zorder_cols)
    keyed = df.withColumn("_zkey", zorder_key(*cols, bits=bits))
    (
        keyed.repartitionByRange(n_files, F.col("_zkey"))
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode(mode)
        .parquet(str(path))
    )
    return str(path)
