"""Stdlib PDF text-position extractor — the tabula fallback for S7.

Reference scope: ``ImportPDF`` (/root/reference/main.py:371-412)
shells out to tabula (Java) for PDF table detection. tabula is not
installable here, so this module implements the minimal viable
extraction path in pure stdlib (regex + zlib), the same approach as
the BIFF8/BIFF12/CFB readers in excel_core.py: parse the publicly
documented format (ISO 32000) directly.

Scope — simple "digital-born" PDFs, the kind report generators emit:

- objects located by a linear ``N G obj … endobj`` scan (no xref
  table walk; incremental-update files resolve to the LAST definition
  of each object number, matching xref precedence for appended
  updates),
- content streams stored raw or FlateDecode (zlib — stdlib),
- text via ``BT…ET`` blocks: ``Tm/Td/TD/T*/TL`` positioning and
  ``Tj/'/"/TJ`` show ops, literal ``(…)`` and hex ``<…>`` strings,
- single-byte text encodings decoded as Latin-1 (no CID/Type0
  composite fonts, no ToUnicode CMaps).

Table reconstruction: each show op is one cell anchored at the
current line origin; rows cluster on y (descending), columns cluster
on x across the whole page. That recovers the grid for
one-table-per-page layouts — tabula's full ruling-line detection is
out of scope and documented as such (SURVEY §7 deviation; the
reference itself flags PDF extraction "unpredictable", README.md:12).

Anything outside this scope yields no text runs and the caller
degrades to the reference's failed-answer path — never a crash.
"""

from __future__ import annotations

import re
import zlib
from typing import Dict, List, Tuple

_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b(.*?)endobj", re.DOTALL)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.DOTALL)
_CONTENTS_REF_RE = re.compile(rb"/Contents\s+(\d+)\s+\d+\s+R")
_CONTENTS_ARR_RE = re.compile(rb"/Contents\s*\[(.*?)\]", re.DOTALL)
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")

ROW_TOL = 2.0  # points: y values closer than this share a row
COL_TOL = 5.0  # points: x values closer than this share a column


def _objects(data: bytes) -> Dict[int, bytes]:
    """Last definition wins — appended incremental updates override."""
    objs: Dict[int, bytes] = {}
    for m in _OBJ_RE.finditer(data):
        objs[int(m.group(1))] = m.group(2)
    return objs


def _stream_bytes(body: bytes) -> bytes:
    m = _STREAM_RE.search(body)
    if not m:
        return b""
    raw = m.group(1)
    if b"/FlateDecode" in body[: m.start()]:
        try:
            return zlib.decompress(raw)
        except zlib.error:
            return b""
    return raw


def _page_content_streams(data: bytes) -> List[bytes]:
    """Content stream bytes for each /Type /Page object, in document
    order (sufficient for generator-emitted files, where page objects
    appear in reading order)."""
    objs = _objects(data)
    out: List[bytes] = []
    for num in sorted(objs):
        body = objs[num]
        head = body.split(b"stream", 1)[0]
        if not re.search(rb"/Type\s*/Page\b(?!s)", head):
            continue
        refs: List[int] = []
        arr = _CONTENTS_ARR_RE.search(head)
        if arr:
            refs = [int(r) for r in _REF_RE.findall(arr.group(1))]
        else:
            one = _CONTENTS_REF_RE.search(head)
            if one:
                refs = [int(one.group(1))]
        chunks = [
            _stream_bytes(objs[r]) for r in refs if r in objs
        ]
        out.append(b"\n".join(c for c in chunks if c))
    return out


_TOKEN_RE = re.compile(
    rb"\((?:[^()\\]|\\.|\([^()]*\))*\)"  # literal string (1 nesting level)
    rb"|<[0-9A-Fa-f\s]*>"  # hex string
    rb"|/[^\s/\[\]()<>]*"  # name
    rb"|[-+]?\d*\.?\d+"  # number
    rb"|\[|\]"
    rb"|[A-Za-z'\"*]+"  # operator
)


def _decode_literal(tok: bytes) -> str:
    body = tok[1:-1]
    out = bytearray()
    i = 0
    while i < len(body):
        b = body[i]
        if b == 0x5C and i + 1 < len(body):  # backslash
            nxt = body[i + 1]
            esc = {
                ord("n"): b"\n", ord("r"): b"\r", ord("t"): b"\t",
                ord("b"): b"\b", ord("f"): b"\f",
                ord("("): b"(", ord(")"): b")", ord("\\"): b"\\",
            }
            if nxt in esc:
                out += esc[nxt]
                i += 2
                continue
            if 0x30 <= nxt <= 0x37:  # octal, up to 3 digits
                j = i + 1
                oct_digits = b""
                while j < len(body) and len(oct_digits) < 3 and 0x30 <= body[j] <= 0x37:
                    oct_digits += bytes([body[j]])
                    j += 1
                out.append(int(oct_digits, 8) & 0xFF)
                i = j
                continue
            i += 1  # lone backslash: skip (spec: ignore)
            continue
        out.append(b)
        i += 1
    return out.decode("latin-1")


def _decode_hex(tok: bytes) -> str:
    h = re.sub(rb"\s", b"", tok[1:-1])
    if len(h) % 2:
        h += b"0"
    return bytes.fromhex(h.decode("ascii")).decode("latin-1")


def _text_runs(content: bytes) -> List[Tuple[float, float, str]]:
    """(x, y, text) for every show operator, interpreting the text
    positioning subset (module docstring)."""
    runs: List[Tuple[float, float, str]] = []
    stack: List[object] = []
    lx = ly = 0.0  # line matrix origin
    leading = 0.0
    in_array: List[object] | None = None
    for m in _TOKEN_RE.finditer(content):
        tok = m.group(0)
        if tok == b"[":
            in_array = []
            continue
        if tok == b"]":
            stack.append(in_array if in_array is not None else [])
            in_array = None
            continue
        if tok.startswith(b"(") or tok.startswith(b"<"):
            val = _decode_literal(tok) if tok.startswith(b"(") else _decode_hex(tok)
            (in_array if in_array is not None else stack).append(val)
            continue
        if re.fullmatch(rb"[-+]?\d*\.?\d+", tok):
            num = float(tok)
            (in_array if in_array is not None else stack).append(num)
            continue
        if tok.startswith(b"/"):
            stack.append(tok)
            continue
        op = tok
        if op == b"BT":
            # BT resets the text and line matrices to identity
            lx = ly = 0.0
            leading = 0.0
        elif op == b"Tm" and len(stack) >= 6:
            lx, ly = float(stack[-2]), float(stack[-1])
        elif op in (b"Td", b"TD") and len(stack) >= 2:
            lx += float(stack[-2])
            ly += float(stack[-1])
            if op == b"TD":
                leading = -float(stack[-1])
        elif op == b"TL" and stack:
            leading = float(stack[-1])
        elif op == b"T*":
            ly -= leading
        elif op in (b"Tj", b"'") and stack:
            if op == b"'":
                ly -= leading
            s = stack[-1]
            if isinstance(s, str) and s:
                runs.append((lx, ly, s))
        elif op == b'"' and stack:
            ly -= leading
            s = stack[-1]
            if isinstance(s, str) and s:
                runs.append((lx, ly, s))
        elif op == b"TJ" and stack and isinstance(stack[-1], list):
            s = "".join(x for x in stack[-1] if isinstance(x, str))
            if s:
                runs.append((lx, ly, s))
        stack.clear()
    return runs


def _cluster(values: List[float], tol: float) -> List[float]:
    """Sorted cluster centers with single-linkage gap tolerance."""
    centers: List[float] = []
    for v in sorted(values):
        if centers and v - centers[-1] <= tol:
            continue
        centers.append(v)
    return centers


def _grid(runs: List[Tuple[float, float, str]]):
    """Row/column clustering → list-of-rows of cell strings."""
    if not runs:
        return []
    ys = _cluster([r[1] for r in runs], ROW_TOL)
    xs = _cluster([r[0] for r in runs], COL_TOL)

    def nearest(centers: List[float], v: float) -> int:
        return min(range(len(centers)), key=lambda i: abs(centers[i] - v))

    cells: Dict[Tuple[int, int], List[str]] = {}
    for x, y, s in runs:
        key = (nearest(ys, y), nearest(xs, x))
        cells.setdefault(key, []).append(s)
    n_rows, n_cols = len(ys), len(xs)
    grid = [["" for _ in range(n_cols)] for _ in range(n_rows)]
    for (ri, ci), parts in cells.items():
        # top of page = largest y → first row
        grid[n_rows - 1 - ri][ci] = " ".join(parts)
    return grid


def extract_page_tables(data: bytes):
    """One pandas DataFrame (all-string, headerless) per page with
    recoverable text; pages with no text runs are skipped. Returns []
    when the file is outside the supported subset — the caller's
    failed-answer path handles that."""
    import pandas as pd

    if not data.startswith(b"%PDF"):
        return []
    frames = []
    for content in _page_content_streams(data):
        rows = _grid(_text_runs(content))
        if rows:
            frames.append(pd.DataFrame(rows))
    return frames
