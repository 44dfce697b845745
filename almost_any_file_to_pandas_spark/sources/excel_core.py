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

- ``.xlsb`` — BIFF12: same zip container, binary record-stream parts
  (varint-framed records; see the BIFF12 section below).

The remaining legacy binary format (``.xls`` BIFF8 compound document)
needs an engine that is not installed; callers degrade it to a failed
ParseResult, exactly like the reference's log-and-continue path
(main.py:251-253).

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
# .xlsb (BIFF12, MS-XLSB) — same zip container as .xlsx, binary parts.
#
# Record stream: each record is [type: 1-2 bytes, 7 bits per byte with
# high-bit continuation] [size: 1-4 bytes, same varint scheme] [payload].
# The reference reads .xlsb through pd.read_excel(dtype=str) with the
# pyxlsb engine (main.py:249-259, README.md:12); this parser covers the
# records that path consumes: sheet inventory (BrtBundleSh + rels),
# shared strings (BrtSstItem), row headers (BrtRowHdr) and the cell
# value records. Number rendering mirrors pyxlsb + dtype=str: RK
# integers render as ints ('10'), reals as Python str(float) ('10.5').
# ---------------------------------------------------------------------------

_B12_BUNDLE_SH = 0x9C  # BrtBundleSh
_B12_SST_ITEM = 0x13  # BrtSstItem
_B12_ROW_HDR = 0x00  # BrtRowHdr
_B12_CELL_BLANK = 0x01
_B12_CELL_RK = 0x02
_B12_CELL_ERROR = 0x03
_B12_CELL_BOOL = 0x04
_B12_CELL_REAL = 0x05
_B12_CELL_ST = 0x06
_B12_CELL_ISST = 0x07
_B12_FMLA_STRING = 0x08
_B12_FMLA_NUM = 0x09
_B12_FMLA_BOOL = 0x0A
_B12_FMLA_ERROR = 0x0B

_B12_ERRORS = {
    0x00: "#NULL!",
    0x07: "#DIV/0!",
    0x0F: "#VALUE!",
    0x17: "#REF!",
    0x1D: "#NAME?",
    0x24: "#NUM!",
    0x2A: "#N/A",
    0x2B: "#GETTING_DATA",
}


def _biff12_records(data: bytes):
    """Yield (record_id, payload) over a BIFF12 part."""
    i, n = 0, len(data)
    while i < n:
        b = data[i]
        i += 1
        if b & 0x80:
            rid = (b & 0x7F) | ((data[i] & 0x7F) << 7)
            i += 1
        else:
            rid = b
        size, shift = 0, 0
        while True:
            sb = data[i]
            i += 1
            size |= (sb & 0x7F) << shift
            if not (sb & 0x80):
                break
            shift += 7
        yield rid, data[i : i + size]
        i += size


def _b12_wstr(payload: bytes, off: int) -> tuple[str, int]:
    """XLWideString: 4-byte char count + UTF-16LE code units."""
    cch = int.from_bytes(payload[off : off + 4], "little")
    end = off + 4 + 2 * cch
    return payload[off + 4 : end].decode("utf-16-le"), end


def _b12_nullable_wstr(payload: bytes, off: int) -> tuple[str | None, int]:
    cch = int.from_bytes(payload[off : off + 4], "little")
    if cch == 0xFFFFFFFF:
        return None, off + 4
    return _b12_wstr(payload, off)


def _rk_value(u32: int):
    """RkNumber: bit0 = ÷100, bit1 = int; else high-30-bits double."""
    import struct

    fx100 = u32 & 1
    fint = u32 & 2
    if fint:
        v = u32 >> 2
        if v & 0x20000000:  # sign-extend the 30-bit int
            v -= 1 << 30
        return v / 100 if fx100 else v
    bits = (u32 & 0xFFFFFFFC) << 32
    d = struct.unpack("<d", struct.pack("<Q", bits))[0]
    return d / 100 if fx100 else d


def _b12_num_str(v) -> str:
    """pyxlsb + dtype=str rendering: ints bare, floats via str()."""
    if isinstance(v, int):
        return str(v)
    return str(v)


def xlsb_sheet_inventory(path: str) -> list[tuple[str, str]]:
    """[(sheet_name, zip_member_path)] in workbook order."""
    with zipfile.ZipFile(path) as z:
        data = z.read("xl/workbook.bin")
        rels = ET.fromstring(z.read("xl/_rels/workbook.bin.rels"))
    rid_to_target = {
        rel.get("Id"): rel.get("Target")
        for rel in rels.findall(f"{REL_NS}Relationship")
    }
    out = []
    for rid, payload in _biff12_records(data):
        if rid != _B12_BUNDLE_SH:
            continue
        off = 8  # hsState (4) + iTabID (4)
        rel_id, off = _b12_nullable_wstr(payload, off)
        name, off = _b12_wstr(payload, off)
        target = rid_to_target.get(rel_id, "")
        if target.startswith("/"):
            member = target.lstrip("/")
        else:
            member = posixpath.normpath(posixpath.join("xl", target))
        out.append((name or "Not defined", member))
    return out


def _xlsb_shared_strings(z: zipfile.ZipFile) -> list[str]:
    try:
        data = z.read("xl/sharedStrings.bin")
    except KeyError:
        return []
    out = []
    for rid, payload in _biff12_records(data):
        if rid == _B12_SST_ITEM:
            s, _ = _b12_wstr(payload, 1)  # skip richStr flags byte
            out.append(s)
    return out


def _xlsb_cell_value(rid: int, payload: bytes, shared: list[str]) -> str | None:
    """Cell payload → rendered string (None = blank). Layout: col (4)
    + iStyleRef (4) + type-specific value at offset 8."""
    import struct

    if rid == _B12_CELL_BLANK:
        return None
    if rid == _B12_CELL_RK:
        return _b12_num_str(
            _rk_value(int.from_bytes(payload[8:12], "little"))
        )
    if rid in (_B12_CELL_ERROR, _B12_FMLA_ERROR):
        return _B12_ERRORS.get(payload[8], "#ERR")
    if rid in (_B12_CELL_BOOL, _B12_FMLA_BOOL):
        return "True" if payload[8] else "False"
    if rid in (_B12_CELL_REAL, _B12_FMLA_NUM):
        return _b12_num_str(struct.unpack("<d", payload[8:16])[0])
    if rid in (_B12_CELL_ST, _B12_FMLA_STRING):
        return _b12_wstr(payload, 8)[0]
    if rid == _B12_CELL_ISST:
        idx = int.from_bytes(payload[8:12], "little")
        try:
            return shared[idx]
        except IndexError:
            return str(idx)
    return None


_B12_CELL_RIDS = frozenset(range(_B12_CELL_BLANK, _B12_FMLA_ERROR + 1))


def xlsb_sheet_rows(path: str, member: str) -> list[list[str | None]]:
    """All rows of one BIFF12 worksheet as ragged lists — same grid
    semantics as :func:`xlsx_sheet_rows` (row gaps inside the used
    range become empty rows)."""
    with zipfile.ZipFile(path) as z:
        shared = _xlsb_shared_strings(z)
        data = z.read(member)
    rows: dict[int, list] = {}
    max_row = 0
    cur: int | None = None
    for rid, payload in _biff12_records(data):
        if rid == _B12_ROW_HDR:
            cur = int.from_bytes(payload[0:4], "little") + 1  # 1-based
            continue
        if rid not in _B12_CELL_RIDS or cur is None:
            continue
        value = _xlsb_cell_value(rid, payload, shared)
        if value is None:
            continue
        col = int.from_bytes(payload[0:4], "little")
        cells = rows.setdefault(cur, [])
        while len(cells) <= col:
            cells.append(None)
        cells[col] = value
        max_row = max(max_row, cur)
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
    """[(sheet_name, opaque_sheet_ref)] — ref is a zip member
    (.xlsx/.xlsb) or a stringified table index (.ods family)."""
    if fmt == "xlsx":
        return xlsx_sheet_inventory(path)
    if fmt == "xlsb":
        return xlsb_sheet_inventory(path)
    return [(name, str(i)) for name, i in ods_sheet_inventory(path)]


def sheet_rows(path: str, fmt: str, ref: str) -> list[list[str | None]]:
    if fmt == "xlsx":
        return xlsx_sheet_rows(path, ref)
    if fmt == "xlsb":
        return xlsb_sheet_rows(path, ref)
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
