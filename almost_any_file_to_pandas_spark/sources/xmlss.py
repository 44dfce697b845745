"""Microsoft SpreadsheetML XML scan (S3/S4) with worksheet fan-out.

Reference: ``ImportXML`` (/root/reference/main.py:268-324) — lxml
parse with the ``urn:schemas-microsoft-com:office:spreadsheet``
namespace, iterate Worksheet → Table → Row → Data, skip rows that
contain zero ``<Data>`` cells (F1, main.py:320-323), and fall back in
three levels: worksheets → bare tables (sheet name "Not defined",
main.py:296-304) → failed answer.

Spark design: SpreadsheetML files are single-document XML — the
parse itself is not splittable, so structure discovery runs driver-
side with stdlib ``ElementTree``. Malformed input gets a salvage
pass (the reference's ``lxml recover=True, huge_tree=True`` contract,
main.py:276): an incremental ``XMLPullParser`` keeps every Row that
completed before the first fatal error, so a truncated or damaged
file yields its intact prefix rows instead of a failed result;
nothing salvageable → failed. Each discovered table becomes a
DataFrame via ``spark.createDataFrame`` over the padded all-string
grid; at scale the unit of parallelism is *many files*, which the
façade callers get by looping paths into independent lazy plans.

Spark's own ``spark.read.format("xml")`` (native since 4.0) is not
used because rowTag-based parsing cannot express the namespace-
qualified Worksheet/Table fan-out or the empty-row skip (SURVEY §2.1
S3 note).
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional, Union
from xml.etree import ElementTree as ET

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from almost_any_file_to_pandas_spark.result import ParseResult

SS_NS = "{urn:schemas-microsoft-com:office:spreadsheet}"


def _failed(spark: SparkSession, path: str) -> List[ParseResult]:
    return [
        ParseResult(
            data=spark.createDataFrame([], T.StructType([])),
            file_path=path,
            engine="spreadsheetml",
        ).mark_failed()
    ]


def table_grid(table: ET.Element) -> list[list[str]]:
    """One ``<Table>`` → padded all-string grid. Rows with zero
    ``<Data>`` cells are dropped (F1 — row numbering shifts, exactly
    as the reference's dict insert skips them, main.py:320-323)."""
    rows: list[list[str]] = []
    for row in table.iter(f"{SS_NS}Row"):
        cells = [
            (data.text or "")
            for data in row.iter(f"{SS_NS}Data")
        ]
        if cells:  # empty-row skip
            rows.append(cells)
    width = max((len(r) for r in rows), default=0)
    return [r + [""] * (width - len(r)) for r in rows]


def _grid_df(spark: SparkSession, grid: list[list[str]]):
    width = len(grid[0]) if grid else 0
    schema = T.StructType(
        [T.StructField(f"c{i}", T.StringType()) for i in range(width)]
    )
    return spark.createDataFrame([tuple(r) for r in grid], schema)


def _salvage_tables(
    path: str,
) -> list[tuple[Optional[str], list[list[str]]]]:
    """Best-effort parse of damaged SpreadsheetML — the stdlib
    analogue of the reference's ``lxml recover=True`` (main.py:276).

    Feed an incremental ``XMLPullParser`` and keep every ``<Row>``
    that COMPLETED before the first fatal error: a truncated or
    locally-damaged file yields all intact rows instead of nothing.
    Returns [(worksheet_name_or_None, padded_grid)] with empty-row
    skip (F1) applied, same as :func:`table_grid`.
    """
    parser = ET.XMLPullParser(events=("start", "end"))
    ws_name: Optional[str] = None
    tables: list[tuple[Optional[str], list[list[str]]]] = []
    open_rows: Optional[list[list[str]]] = None
    try:
        with open(path, "rb") as f:
            while True:
                chunk = f.read(1 << 16)
                if not chunk:
                    parser.close()
                    break
                parser.feed(chunk)
                for event, el in parser.read_events():
                    if event == "start":
                        if el.tag == f"{SS_NS}Worksheet":
                            ws_name = el.get(f"{SS_NS}Name")
                        elif el.tag == f"{SS_NS}Table":
                            open_rows = []
                            tables.append((ws_name, open_rows))
                        continue
                    if el.tag == f"{SS_NS}Row" and open_rows is not None:
                        cells = [
                            (d.text or "") for d in el.iter(f"{SS_NS}Data")
                        ]
                        if cells:  # F1 empty-row skip
                            open_rows.append(cells)
                        el.clear()  # bound memory on huge damaged files
                    elif el.tag == f"{SS_NS}Table":
                        open_rows = None
                    elif el.tag == f"{SS_NS}Worksheet":
                        ws_name = None
    except ET.ParseError:
        pass  # keep whatever completed before the break
    out = []
    for name, rows in tables:
        if not rows:
            continue
        width = max(len(r) for r in rows)
        out.append((name, [r + [""] * (width - len(r)) for r in rows]))
    return out


def read_spreadsheetml(
    spark: SparkSession, path: Union[str, Path], **options
) -> List[ParseResult]:
    p = Path(path)
    try:
        root = ET.parse(str(p)).getroot()
    except ET.ParseError:
        salvaged = _salvage_tables(str(p))
        if not salvaged:
            return _failed(spark, str(p))
        return [
            ParseResult(
                data=_grid_df(spark, grid),
                sheet_name=name if name else "Not defined",
                file_path=str(p),
                engine="spreadsheetml (salvaged)",
            )
            for name, grid in salvaged
        ]

    results: List[ParseResult] = []

    def emit(table: ET.Element, sheet_name: Optional[str]) -> None:
        grid = table_grid(table)
        if not grid:
            return
        results.append(
            ParseResult(
                data=_grid_df(spark, grid),
                sheet_name=sheet_name if sheet_name else "Not defined",
                file_path=str(p),
                engine="spreadsheetml",
            )
        )

    worksheets = list(root.iter(f"{SS_NS}Worksheet"))
    if worksheets:
        for ws in worksheets:
            name = ws.get(f"{SS_NS}Name") or "Not defined"
            for table in ws.iter(f"{SS_NS}Table"):
                emit(table, name)
    else:
        # Level-2 fallback: bare tables without a Worksheet wrapper
        # (main.py:296-304).
        for table in root.iter(f"{SS_NS}Table"):
            emit(table, None)

    return results or _failed(spark, str(p))


def read_spreadsheetml_many(spark: SparkSession, paths):
    """Corpus-scale SpreadsheetML ingestion: many .xml files → one
    DataFrame of ragged rows (source_file, sheet_name, row_idx,
    cells), parsed executor-side via mapInPandas over the file list.

    The per-file parse is the same driver-side logic as
    :func:`read_spreadsheetml`, relocated to executors: the driver
    only ships path strings, so parallelism scales with file count —
    the same corpus shape as ``read_excel_many``. Unparseable files
    contribute zero rows (log-and-continue, reference behavior).
    """
    import glob as _glob
    from pathlib import Path as _P

    from pyspark.sql import functions as F  # noqa: F401

    if isinstance(paths, (str, _P)):
        expanded = sorted(_glob.glob(str(paths))) or [str(paths)]
    else:
        expanded = [str(p) for p in paths]

    ns = SS_NS

    def _parse_files(batches):
        # Self-contained closure: everything (including the grid
        # builder) is local so cloudpickle ships it by value — workers
        # never import this package.
        import pandas as pd
        from xml.etree import ElementTree as _ET

        def grid(tbl):
            rows = []
            for row in tbl.iter(f"{ns}Row"):
                cells = [(d.text or "") for d in row.iter(f"{ns}Data")]
                if cells:  # F1 empty-row skip
                    rows.append(cells)
            width = max((len(r) for r in rows), default=0)
            return [r + [""] * (width - len(r)) for r in rows]

        for batch in batches:
            out = {"source_file": [], "sheet_name": [], "row_idx": [], "cells": []}
            for path in batch["path"]:
                try:
                    root = _ET.parse(path).getroot()
                except Exception:
                    continue
                worksheets = list(root.iter(f"{ns}Worksheet"))
                scoped = (
                    [(ws.get(f"{ns}Name") or "Not defined", t)
                     for ws in worksheets for t in ws.iter(f"{ns}Table")]
                    if worksheets
                    else [("Not defined", t) for t in root.iter(f"{ns}Table")]
                )
                for sheet_name, tbl in scoped:
                    for idx, row in enumerate(grid(tbl)):
                        out["source_file"].append(path)
                        out["sheet_name"].append(sheet_name)
                        out["row_idx"].append(idx)
                        out["cells"].append(row)
            # an all-empty dict-of-lists frame infers float64 columns,
            # which Arrow cannot cast to list<string> — a partition
            # holding only unparseable files must yield nothing
            if out["source_file"]:
                yield pd.DataFrame(out)

    files = spark.createDataFrame(
        [(p,) for p in expanded], "path string"
    ).repartition(min(len(expanded), spark.sparkContext.defaultParallelism))
    return files.mapInPandas(
        _parse_files,
        schema="source_file string, sheet_name string, row_idx int, cells array<string>",
    )


def read_xml_records(
    spark: SparkSession, paths, row_tag: str = "row"
) -> "ParseResult":
    """Generic record-oriented XML via Spark 4's NATIVE ``xml`` data
    source — the distributed path for XML that is NOT SpreadsheetML
    (the reference treats such files as salvage/failure; this is
    extension surface, documented as such).

    Unlike the SpreadsheetML grid parsers (driver- or executor-side
    ElementTree over whole files), the native source splits record
    elements across tasks, infers a typed schema, prunes unreferenced
    fields at the scan, and handles a million-file glob — the right
    engine for log/feed-style XML at corpus scale. The façade's
    ``.xml`` arm keeps the reference's SpreadsheetML-first contract;
    callers with record XML opt into this reader explicitly.

    Never raises (façade error contract): unparseable input yields a
    failed empty ParseResult.
    """
    from pyspark.errors import AnalysisException

    path_arg = (
        [str(p) for p in paths]
        if isinstance(paths, (list, tuple))
        else str(paths)
    )
    try:
        df = (
            spark.read.format("xml")
            .option("rowTag", row_tag)
            .load(path_arg)
        )
        df.schema  # force plan-time resolution into the try block
    except (AnalysisException, ValueError):
        from pyspark.sql import types as T

        return ParseResult(
            data=spark.createDataFrame(
                [], T.StructType([T.StructField("value", T.StringType())])
            ),
            sheet_name="Not defined",
            engine=f"spark-native xml (rowTag={row_tag})",
            file_path=str(paths),
        ).mark_failed()
    return ParseResult(
        data=df,
        sheet_name=row_tag,
        engine=f"spark-native xml (rowTag={row_tag})",
        file_path=str(paths),
    )
