"""dBase DBF table scan (dBASE III/IV/5 family, no memo fields) —
the fixed-width desktop database format that GIS shapefiles and
legacy business exports still ship (extension beyond the reference,
SURVEY.md §7; spiritually it is EXACTLY the reference's kind of
format: one file, one table).

Distributed by construction: DBF records are FIXED WIDTH, so the
driver reads only the 32-byte header + field descriptors and every
task locates its records by pure offset arithmetic
(``header_size + i·record_size``) — the same rowid-range pattern as
the SQLite arm, with zero per-task catalog work. Deleted records
(``*`` flag) are skipped per spec. Shared-filesystem requirement as
with the other by-path arms.

Typing per field descriptor: C→string (right-trimmed), N/F with 0
decimals→bigint, N/F with decimals→double, L→boolean (T/t/Y/y true,
F/f/N/n false, else NULL), D→date (YYYYMMDD); blank numerics are
NULL. Unknown field types degrade to string rather than failing the
whole table.
"""

from __future__ import annotations

import struct
from pathlib import Path
from typing import Iterator, List, Tuple, Union

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from almost_any_file_to_pandas_spark.result import ParseResult

_DBF_VERSIONS = {0x02, 0x03, 0x04, 0x05, 0x30, 0x31, 0x83, 0x8B}

_MAX_RANGES = 64


class _Field:
    __slots__ = ("name", "ftype", "length", "decimals", "offset")

    def __init__(self, name, ftype, length, decimals, offset):
        self.name = name
        self.ftype = ftype
        self.length = length
        self.decimals = decimals
        self.offset = offset


def _read_layout(blob: bytes) -> Tuple[int, int, int, List[_Field]]:
    if len(blob) < 32:
        raise ValueError("not a DBF file")
    version = blob[0]
    if version not in _DBF_VERSIONS:
        raise ValueError(f"unknown DBF version 0x{version:02x}")
    n_records, header_size, record_size = struct.unpack(
        "<IHH", blob[4:12]
    )
    fields: List[_Field] = []
    pos = 32
    offset = 1  # byte 0 of each record is the deletion flag
    while pos + 32 <= header_size and blob[pos] != 0x0D:
        raw = blob[pos : pos + 32]
        name = raw[:11].split(b"\x00", 1)[0].decode(
            "ascii", "replace"
        ).strip()
        ftype = chr(raw[11])
        length = raw[16]
        decimals = raw[17]
        fields.append(_Field(name or f"f{len(fields)}", ftype, length, decimals, offset))
        offset += length
        pos += 32
    if not fields:
        raise ValueError("DBF has no field descriptors")
    if offset != record_size:
        raise ValueError(
            f"field widths sum to {offset}, record size {record_size}"
        )
    return n_records, header_size, record_size, fields


def _spark_type(f: _Field) -> T.DataType:
    if f.ftype in ("N", "F"):
        return T.LongType() if f.decimals == 0 else T.DoubleType()
    if f.ftype == "L":
        return T.BooleanType()
    if f.ftype == "D":
        return T.DateType()
    return T.StringType()


def _convert(raw: bytes, f: _Field):
    import datetime

    text = raw.decode("ascii", "replace").strip()
    if f.ftype in ("N", "F"):
        if not text:
            return None
        try:
            if f.decimals == 0 and f.ftype == "N":
                return int(text)
            return float(text)
        except ValueError:
            return None
    if f.ftype == "L":
        if text in ("T", "t", "Y", "y"):
            return True
        if text in ("F", "f", "N", "n"):
            return False
        return None
    if f.ftype == "D":
        if len(text) != 8 or not text.isdigit():
            return None
        try:
            return datetime.date(
                int(text[:4]), int(text[4:6]), int(text[6:8])
            )
        except ValueError:
            return None
    return raw.decode("ascii", "replace").rstrip()


def read_dbf(
    spark: SparkSession, path: Union[str, Path], **options
) -> List[ParseResult]:
    from almost_any_file_to_pandas_spark.parse import _failed

    p = Path(path)
    try:
        with open(p, "rb") as fh:
            head = fh.read(32)
            if len(head) < 32:
                return _failed(spark, str(path))
            header_size = struct.unpack("<H", head[8:10])[0]
            fh.seek(0)
            header = fh.read(header_size)
    except OSError:
        return _failed(spark, str(path))
    try:
        n_records, header_size, record_size, fields = _read_layout(
            header
        )
    except ValueError:
        return _failed(spark, str(path))

    schema = T.StructType(
        [T.StructField(f.name, _spark_type(f), True) for f in fields]
    )
    abspath = str(p.absolute())
    parallelism = spark.sparkContext.defaultParallelism
    n_ranges = max(1, min(_MAX_RANGES, parallelism, n_records or 1))
    width = (n_records + n_ranges - 1) // n_ranges if n_records else 1
    ranges = [
        (i * width, min(n_records, (i + 1) * width))
        for i in range(n_ranges)
        if i * width < n_records
    ] or [(0, 0)]
    field_specs = [
        (f.name, f.ftype, f.length, f.decimals, f.offset)
        for f in fields
    ]
    out_names = [f.name for f in fields]

    def scan(batches: Iterator) -> Iterator:
        import pandas as pd

        specs = [_Field(*s) for s in field_specs]
        for pdf in batches:
            for lo, hi in zip(pdf["lo"], pdf["hi"]):
                rows = []
                with open(abspath, "rb") as fh:
                    fh.seek(header_size + int(lo) * record_size)
                    for _ in range(int(hi) - int(lo)):
                        rec = fh.read(record_size)
                        if len(rec) < record_size:
                            break
                        if rec[0:1] == b"*":  # deleted record
                            continue
                        rows.append(
                            tuple(
                                _convert(
                                    rec[f.offset : f.offset + f.length],
                                    f,
                                )
                                for f in specs
                            )
                        )
                yield pd.DataFrame(rows, columns=out_names)

    range_df = spark.createDataFrame(
        ranges, "lo long, hi long"
    ).repartition(len(ranges))
    df = range_df.mapInPandas(scan, schema)
    return [
        ParseResult(
            data=df,
            sheet_name="DBF table content",
            engine="dbf (stdlib, fixed-width record-range parallel)",
            file_path=abspath,
        )
    ]
