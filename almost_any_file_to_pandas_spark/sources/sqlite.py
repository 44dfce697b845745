"""SQLite database scan: one ParseResult per user table (the M1
sheet-fan-out analogue for the single most common "give me the data
out of this file" container after spreadsheets).

Extension beyond the reference (its ``main.py`` stops at
spreadsheet/text/columnar formats); the contract mirrors the Excel
arm (S2/F3): enumerate members on the driver, fan out, never raise —
wrong magic, zero user tables, or an unreadable file yield failed
results.

Spark design — distributed ROWID-RANGE scan, not a driver slurp:

* the driver opens the file READ-ONLY (``mode=ro&immutable=1`` URI)
  and reads only catalog metadata: ``sqlite_master`` table names,
  ``PRAGMA table_info`` column declarations, and per-table
  ``MIN(rowid)/MAX(rowid)`` bounds — O(tables), never row data;
* each table scan is ``mapInPandas`` over a small frame of rowid
  ranges (one range per task): every task opens the SQLite file
  itself and pulls only ``WHERE rowid BETWEEN lo AND hi``. SQLite's
  rowid is the clustered btree key, so a range probe is a contiguous
  btree walk, not a table scan per task. Like the Avro/driver-side
  arms, executors re-open the path by name — a shared filesystem is
  required (document'd contract, sources/avro.py has the same one);
* ``WITHOUT ROWID`` tables have no rowid to range over — those fall
  back to a single-task scan (flagged in ``engine``), which is the
  honest shape: SQLite files are single-writer local artifacts, and
  a WITHOUT ROWID table large enough to need parallel scan should be
  exported to a splittable format first.

Typing: SQLite columns are dynamically typed; we map each column's
DECLARED affinity (sqlite.org/datatype3.html §3.1 rules) to a Spark
type — INT→bigint, TEXT/CHAR/CLOB→string, BLOB/untyped→binary,
REAL/FLOA/DOUB→double, everything else (NUMERIC)→double — and coerce
stored values per cell, with ``None`` for values a column's affinity
cannot represent (e.g. a TEXT value smuggled into an INTEGER column).
"""

from __future__ import annotations

import sqlite3
from pathlib import Path
from typing import Iterator, List, Optional, Tuple, Union

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from almost_any_file_to_pandas_spark.result import ParseResult

SQLITE_MAGIC = b"SQLite format 3\x00"

SQLITE_SUFFIXES = (".db", ".sqlite", ".sqlite3")

# Upper bound on ranges per table: enough tasks to keep a cluster
# busy without issuing thousands of btree probes against one small
# file. At local[32] this is one range per core.
_MAX_RANGES = 64


def _affinity_type(decl: Optional[str]) -> T.DataType:
    """SQLite §3.1 affinity rules, in rule order."""
    d = (decl or "").upper()
    if "INT" in d:
        return T.LongType()
    if "CHAR" in d or "CLOB" in d or "TEXT" in d:
        return T.StringType()
    if not d or "BLOB" in d:
        return T.BinaryType()
    # REAL/FLOA/DOUB and the NUMERIC catch-all both land on double —
    # the widest lossless target SQLite's dynamic values offer short
    # of string.
    return T.DoubleType()


def _coerce(value, dtype: T.DataType):
    if value is None:
        return None
    if isinstance(dtype, T.LongType):
        if isinstance(value, int):
            return value
        if isinstance(value, float) and value.is_integer():
            return int(value)
        return None
    if isinstance(dtype, T.DoubleType):
        if isinstance(value, (int, float)):
            return float(value)
        return None
    if isinstance(dtype, T.StringType):
        if isinstance(value, bytes):
            return None
        return str(value)
    if isinstance(dtype, T.BinaryType):
        return value if isinstance(value, bytes) else None
    return None


def _connect_ro(path: str) -> sqlite3.Connection:
    # immutable=1: no locking, no journal probing — correct for the
    # parse contract (a snapshot read of a file handed to the engine)
    # and required for read-only network filesystems.
    return sqlite3.connect(
        f"file:{path}?mode=ro&immutable=1", uri=True
    )


def _unique_names(raw: List[str]) -> List[str]:
    seen: dict = {}
    out = []
    for name in raw:
        n = name if name else "col"
        if n in seen:
            seen[n] += 1
            n = f"{n}_{seen[n]}"
        seen.setdefault(n, 0)
        out.append(n)
    return out


def _table_plan(
    con: sqlite3.Connection, tbl: str
) -> Tuple[T.StructType, List[str], Optional[Tuple[int, int]]]:
    """(spark schema, source column names, rowid bounds or None)."""
    qt = tbl.replace('"', '""')
    cols = con.execute(f'PRAGMA table_info("{qt}")').fetchall()
    src_names = [c[1] for c in cols]
    fields = [
        T.StructField(n, _affinity_type(c[2]), True)
        for n, c in zip(_unique_names(src_names), cols)
    ]
    schema = T.StructType(fields)
    try:
        lo, hi = con.execute(
            f'SELECT MIN(rowid), MAX(rowid) FROM "{qt}"'
        ).fetchone()
    except sqlite3.OperationalError:
        return schema, src_names, None  # WITHOUT ROWID table
    if lo is None:
        return schema, src_names, (0, -1)  # empty table
    return schema, src_names, (int(lo), int(hi))


def _scan_ranged(
    spark: SparkSession,
    path: str,
    tbl: str,
    schema: T.StructType,
    src_names: List[str],
    bounds: Tuple[int, int],
) -> DataFrame:
    lo, hi = bounds
    parallelism = spark.sparkContext.defaultParallelism
    n_ranges = max(1, min(_MAX_RANGES, parallelism, hi - lo + 1))
    width = (hi - lo + 1 + n_ranges - 1) // n_ranges
    ranges = [
        (lo + i * width, min(hi, lo + (i + 1) * width - 1))
        for i in range(n_ranges)
        if lo + i * width <= hi
    ]
    qt = tbl.replace('"', '""')
    select_cols = ", ".join(
        '"' + c.replace('"', '""') + '"' for c in src_names
    )
    out_names = [f.name for f in schema.fields]
    dtypes = [f.dataType for f in schema.fields]

    def scan(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            for r_lo, r_hi in zip(pdf["lo"], pdf["hi"]):
                con = _connect_ro(path)
                try:
                    rows = con.execute(
                        f'SELECT {select_cols} FROM "{qt}"'
                        " WHERE rowid BETWEEN ? AND ?",
                        (int(r_lo), int(r_hi)),
                    ).fetchall()
                finally:
                    con.close()
                data = {
                    name: [_coerce(row[i], dt) for row in rows]
                    for i, (name, dt) in enumerate(
                        zip(out_names, dtypes)
                    )
                }
                yield pd.DataFrame(data, columns=out_names)

    range_df = spark.createDataFrame(
        ranges, "lo long, hi long"
    ).repartition(len(ranges))
    return range_df.mapInPandas(scan, schema)


def _scan_single(
    spark: SparkSession,
    path: str,
    tbl: str,
    schema: T.StructType,
    src_names: List[str],
) -> DataFrame:
    """WITHOUT ROWID fallback: one driver-side read."""
    qt = tbl.replace('"', '""')
    select_cols = ", ".join(
        '"' + c.replace('"', '""') + '"' for c in src_names
    )
    con = _connect_ro(path)
    try:
        rows = con.execute(f'SELECT {select_cols} FROM "{qt}"').fetchall()
    finally:
        con.close()
    coerced = [
        tuple(
            _coerce(v, f.dataType) for v, f in zip(row, schema.fields)
        )
        for row in rows
    ]
    return spark.createDataFrame(coerced, schema)


def read_sqlite(
    spark: SparkSession, path: Union[str, Path], **options
) -> List[ParseResult]:
    """One ParseResult per user table, catalog order by name.

    Never raises on format problems: wrong magic, no user tables, or
    a catalog read error each yield a single failed result (the S11 /
    F3 contract the Excel arm follows for missing sheets).
    """
    from almost_any_file_to_pandas_spark.parse import _failed

    p = Path(path)
    try:
        with open(p, "rb") as fh:
            if fh.read(16) != SQLITE_MAGIC:
                return _failed(spark, str(path))
    except OSError:
        return _failed(spark, str(path))

    abspath = str(p.absolute())
    try:
        con = _connect_ro(abspath)
        try:
            tables = [
                r[0]
                for r in con.execute(
                    "SELECT name FROM sqlite_master WHERE type='table'"
                    " AND name NOT LIKE 'sqlite_%' ORDER BY name"
                ).fetchall()
            ]
            plans = {t: _table_plan(con, t) for t in tables}
        finally:
            con.close()
    except sqlite3.Error:
        return _failed(spark, str(path))

    if not tables:
        return _failed(spark, str(path))

    results: List[ParseResult] = []
    for tbl in tables:
        schema, src_names, bounds = plans[tbl]
        if not schema.fields:
            continue
        if bounds is None:
            df = _scan_single(spark, abspath, tbl, schema, src_names)
            engine = "sqlite3 (stdlib, single-task: WITHOUT ROWID)"
        elif bounds[1] < bounds[0]:
            df = spark.createDataFrame([], schema)
            engine = "sqlite3 (stdlib)"
        else:
            df = _scan_ranged(
                spark, abspath, tbl, schema, src_names, bounds
            )
            engine = "sqlite3 (stdlib, rowid-range parallel)"
        results.append(
            ParseResult(
                data=df,
                sheet_name=tbl,
                engine=engine,
                file_path=abspath,
            )
        )
    if not results:
        return _failed(spark, str(path))
    return results
