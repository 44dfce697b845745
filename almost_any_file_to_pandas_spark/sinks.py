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
