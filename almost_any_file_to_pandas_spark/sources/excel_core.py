"""Self-contained (stdlib-only) Excel parsing core + Python DataSource.

Covers the reference's Excel arm (`ImportExcel`, /root/reference/
main.py:239-265): enumerate sheets, read every sheet headerless with
all cells coerced to strings. The reference delegates to
``pd.read_excel`` (openpyxl/pyxlsb/odf engines); those libraries are
not available here, so this module parses the two zip-container
formats directly from their XML parts:

- ``.xlsx`` — OOXML: ``xl/workbook.xml`` (sheet inventory),
  ``xl/_rels/workbook.xml.rels`` (sheet → part mapping),
  ``xl/sharedStrings.xml``, ``xl/worksheets/sheetN.xml``.
- ``.ods`` / ``.odt`` / ``.odf`` — OpenDocument: ``content.xml``
  with ``table:table`` / ``table:table-row`` / ``table:table-cell``
  (including the ``number-columns-repeated`` run-length encoding).

Legacy binary formats (``.xls`` BIFF, ``.xlsb``) need engines that are
not installed; callers degrade those to a failed ParseResult, exactly
like the reference's log-and-continue path (main.py:251-253).

EVERYTHING in this module must stay importable-by-value: the façade
registers this module with ``cloudpickle.register_pickle_by_value`` so
the :class:`ExcelDataSource` class and these parser functions ship to
executors inside the serialized plan — no package install on workers.
Keep imports stdlib-only.
"""

from __future__ import annotations

import posixpath
import re
import zipfile
from xml.etree import ElementTree as ET

MAIN_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
REL_NS = "{http://schemas.openxmlformats.org/package/2006/relationships}"
R_NS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
TABLE_NS = "{urn:oasis:names:tc:opendocument:xmlns:table:1.0}"
TEXT_NS = "{urn:oasis:names:tc:opendocument:xmlns:text:1.0}"

_CELL_REF = re.compile(r"^([A-Z]+)(\d+)$")


def _col_index(ref: str) -> int:
    """'A'→0, 'Z'→25, 'AA'→26 … (cell refs like 'BC12')."""
    m = _CELL_REF.match(ref)
    if not m:
        return -1
    n = 0
    for ch in m.group(1):
        n = n * 26 + (ord(ch) - 64)
    return n - 1


def _canon_number(text: str) -> str:
    """Numeric cell → the string pandas' dtype=str would show:
    integral floats lose the trailing '.0' is NOT pandas behavior —
    pandas keeps exactly what openpyxl yields ('10' for int-typed,
    '10.5' for float). We keep the stored lexical form verbatim."""
    return text


# ---------------------------------------------------------------------------
# .xlsx (OOXML)
# ---------------------------------------------------------------------------


def xlsx_sheet_inventory(path: str) -> list[tuple[str, str]]:
    """[(sheet_name, zip_member_path)] in workbook order
    (mirrors ``pd.ExcelFile.sheet_names``, main.py:249-250)."""
    with zipfile.ZipFile(path) as z:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
    rid_to_target = {
        rel.get("Id"): rel.get("Target")
        for rel in rels.findall(f"{REL_NS}Relationship")
    }
    out = []
    for sheet in wb.iter(f"{MAIN_NS}sheet"):
        rid = sheet.get(f"{R_NS}id")
        target = rid_to_target.get(rid, "")
        if target.startswith("/"):
            member = target.lstrip("/")
        else:
            member = posixpath.normpath(posixpath.join("xl", target))
        out.append((sheet.get("name", "Not defined"), member))
    return out


def _xlsx_shared_strings(z: zipfile.ZipFile) -> list[str]:
    try:
        raw = z.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    root = ET.fromstring(raw)
    strings = []
    for si in root.findall(f"{MAIN_NS}si"):
        # plain <t> or rich-text runs <r><t>…; join all text descendants
        strings.append("".join(t.text or "" for t in si.iter(f"{MAIN_NS}t")))
    return strings


def _xlsx_cell_value(cell: ET.Element, shared: list[str]) -> str | None:
    ctype = cell.get("t", "n")
    if ctype == "inlineStr":
        is_el = cell.find(f"{MAIN_NS}is")
        if is_el is None:
            return None
        return "".join(t.text or "" for t in is_el.iter(f"{MAIN_NS}t"))
    v = cell.find(f"{MAIN_NS}v")
    if v is None or v.text is None:
        return None
    if ctype == "s":
        try:
            return shared[int(v.text)]
        except (ValueError, IndexError):
            return v.text
    if ctype == "b":
        return "True" if v.text.strip() == "1" else "False"
    if ctype == "n":
        return _canon_number(v.text)
    return v.text


def xlsx_sheet_rows(path: str, member: str) -> list[list[str | None]]:
    """All rows of one worksheet as ragged lists (None = absent cell).
    Row gaps inside the used range become empty rows, matching the
    grid semantics of ``pd.read_excel(header=None)``."""
    with zipfile.ZipFile(path) as z:
        shared = _xlsx_shared_strings(z)
        root = ET.fromstring(z.read(member))
    rows: dict[int, list] = {}
    max_row = 0
    for rnum, row_el in enumerate(root.iter(f"{MAIN_NS}row"), start=1):
        ridx = int(row_el.get("r", rnum))
        cells: list[str | None] = []
        for cnum, cell in enumerate(row_el.findall(f"{MAIN_NS}c")):
            cidx = _col_index(cell.get("r", ""))
            if cidx < 0:
                cidx = cnum
            while len(cells) <= cidx:
                cells.append(None)
            cells[cidx] = _xlsx_cell_value(cell, shared)
        if any(v is not None for v in cells):
            rows[ridx] = cells
            max_row = max(max_row, ridx)
    return [rows.get(i, []) for i in range(1, max_row + 1)]


# ---------------------------------------------------------------------------
# .ods / .odt / .odf (OpenDocument)
# ---------------------------------------------------------------------------

_ODS_REPEAT = f"{TABLE_NS}number-columns-repeated"
_ODS_ROW_REPEAT = f"{TABLE_NS}number-rows-repeated"
_ODS_MAX_REPEAT = 4096  # guard: trailing filler runs can claim 2^20 columns


def _ods_tables(path: str) -> list[ET.Element]:
    with zipfile.ZipFile(path) as z:
        root = ET.fromstring(z.read("content.xml"))
    return list(root.iter(f"{TABLE_NS}table"))


def ods_sheet_inventory(path: str) -> list[tuple[str, int]]:
    """[(sheet_name, table_index)]."""
    return [
        (t.get(f"{TABLE_NS}name", "Not defined"), i)
        for i, t in enumerate(_ods_tables(path))
    ]


def ods_sheet_rows(path: str, table_index: int) -> list[list[str | None]]:
    table = _ods_tables(path)[table_index]
    out: list[list[str | None]] = []
    for row in table.iter(f"{TABLE_NS}table-row"):
        cells: list[str | None] = []
        for cell in row:
            if not cell.tag.endswith("table-cell"):
                continue
            text = "".join(
                "".join(p.itertext()) for p in cell.iter(f"{TEXT_NS}p")
            )
            value: str | None = text if text else None
            repeat = min(
                int(cell.get(_ODS_REPEAT, 1) or 1), _ODS_MAX_REPEAT
            )
            cells.extend([value] * repeat)
        while cells and cells[-1] is None:
            cells.pop()
        rrep = min(int(row.get(_ODS_ROW_REPEAT, 1) or 1), _ODS_MAX_REPEAT)
        out.extend([list(cells) for _ in range(rrep)])
    while out and not out[-1]:
        out.pop()
    return out


# ---------------------------------------------------------------------------
# Generic helpers + Python DataSource (Spark 4)
# ---------------------------------------------------------------------------


def sheet_inventory(path: str, fmt: str) -> list[tuple[str, str]]:
    """[(sheet_name, opaque_sheet_ref)] — ref is a zip member (.xlsx)
    or a stringified table index (.ods family)."""
    if fmt == "xlsx":
        return xlsx_sheet_inventory(path)
    return [(name, str(i)) for name, i in ods_sheet_inventory(path)]


def sheet_rows(path: str, fmt: str, ref: str) -> list[list[str | None]]:
    if fmt == "xlsx":
        return xlsx_sheet_rows(path, ref)
    return ods_sheet_rows(path, int(ref))


def sheet_width(rows: list[list]) -> int:
    return max((len(r) for r in rows), default=0)


def padded(rows: list[list[str | None]], width: int) -> list[list[str]]:
    """Reference normalization: all-string grid, absent cells '' (the
    text pipeline's T3 pad, SURVEY §1.3 — deliberate deviation from
    pandas' NaN for absent excel cells, documented in SURVEY §7)."""
    return [
        [("" if i >= len(r) or r[i] is None else str(r[i])) for i in range(width)]
        for r in rows
    ]


try:  # pragma: no cover - import guard exercised only on Spark < 4
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    class _SheetPartition(InputPartition):
        def __init__(self, ref: str, width: int):
            self.ref = ref
            self.width = width

    class ExcelReader(DataSourceReader):
        def __init__(self, options):
            self.path = options["path"]
            self.fmt = options.get("fmt", "xlsx")
            self.ref = options["sheetref"]
            self.width = int(options["width"])

        def partitions(self):
            # One worksheet = one partition: a worksheet XML part is a
            # single deflate stream, not splittable mid-part. Cross-
            # sheet and cross-file parallelism come from reading each
            # sheet as its own DataFrame (the façade fans out) over
            # many files.
            return [_SheetPartition(self.ref, self.width)]

        def read(self, partition):
            rows = sheet_rows(self.path, self.fmt, partition.ref)
            for row in padded(rows, partition.width):
                yield tuple(row)

    class ExcelDataSource(DataSource):
        """spark.read.format(...) adapter: executor-side stdlib parse
        of one sheet (options: path, fmt, sheetref, width)."""

        @classmethod
        def name(cls):
            return "aaftp_excel"

        def schema(self):
            width = int(self.options["width"])
            return ", ".join(f"c{i} string" for i in range(width))

        def reader(self, schema):
            return ExcelReader(self.options)

except ImportError:  # pragma: no cover
    ExcelDataSource = None  # type: ignore[assignment]


try:  # pragma: no cover - Spark < 4 guard mirrors ExcelDataSource
    from pyspark.sql.datasource import DataSource as _DS2  # noqa: F401

    class _FilePartition(InputPartition):
        def __init__(self, path: str):
            self.path = path

    class ExcelCorpusReader(DataSourceReader):
        """Many-workbooks reader: one partition per file; each
        partition enumerates its own sheets executor-side and yields
        ragged rows as (source_file, sheet_name, row_idx, cells).

        The array<string> cells column sidesteps the fixed-width
        schema problem entirely — no driver pre-scan of any workbook;
        callers normalize width downstream with the same pad
        expressions the text pipeline uses. This is the 100 TB shape:
        driver cost is O(#files) path strings, all parsing runs where
        the tasks run.
        """

        def __init__(self, options):
            self.paths = options["paths"].split("\x1f")
            self.fmt = options.get("fmt", "xlsx")

        def partitions(self):
            return [_FilePartition(p) for p in self.paths]

        def read(self, partition):
            fmt = self.fmt
            try:
                inventory = sheet_inventory(partition.path, fmt)
            except Exception:
                return  # unreadable workbook → contributes no rows
            for sheet_name, ref in inventory:
                try:
                    rows = sheet_rows(partition.path, fmt, ref)
                except Exception:
                    continue
                for idx, row in enumerate(rows):
                    yield (
                        partition.path,
                        sheet_name,
                        idx,
                        ["" if v is None else str(v) for v in row],
                    )

    class ExcelCorpusDataSource(DataSource):
        @classmethod
        def name(cls):
            return "aaftp_excel_corpus"

        def schema(self):
            return (
                "source_file string, sheet_name string, "
                "row_idx int, cells array<string>"
            )

        def reader(self, schema):
            return ExcelCorpusReader(self.options)

except ImportError:  # pragma: no cover
    ExcelCorpusDataSource = None  # type: ignore[assignment]
