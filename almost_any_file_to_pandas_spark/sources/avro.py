"""Avro Object Container File source — extension beyond the reference
(SURVEY.md §7 source family): the row-oriented interchange format
training pipelines meet wherever Kafka/Hadoop tooling produced the
corpus. PySpark's built-in ``format("avro")`` lives in an external
jar this environment does not ship, so the scan is implemented from
the public Avro 1.11 spec directly (container layout §"Object
Container Files", binary encoding §"Binary Encoding") — the same
stdlib-exact discipline as the BIFF/PNG/ADPCM decoders.

Distribution model: the OCF layout is a header (magic, metadata map
carrying the writer schema JSON + codec, 16-byte sync marker) then
independent BLOCKS, each ``(row count, byte size, payload, sync)``.
The driver walks only the block HEADERS (seek-skipping payloads — an
O(#blocks) index pass; a production deployment persists this index
next to the file), then ships ``(offset, size, count)`` triples to
the executors, which decode their blocks independently — the same
split-by-structure pattern as the Excel sheet fan-out, but
row-parallel. Supported: records of null/boolean/int/long/float/
double/string/bytes and ``[null, T]`` unions; deflate and null
codecs. Arrays/maps/enums/fixed/recursive records raise the honest
``NotImplementedError`` gate.
"""

from __future__ import annotations

import io
import json
import struct
import zlib
from pathlib import Path
from typing import Iterator, List, Tuple

from pyspark.sql import DataFrame, SparkSession

AVRO_MAGIC = b"Obj\x01"

_PRIMITIVE_SPARK = {
    "boolean": "boolean",
    "int": "long",
    "long": "long",
    "float": "double",
    "double": "double",
    "string": "string",
    "bytes": "binary",
}


def _zigzag_decode(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n >= 0 else ((-n) << 1) - 1


def read_varint(buf, pos: int) -> Tuple[int, int]:
    """Avro variable-length zigzag long at ``pos`` → (value, next)."""
    shift = acc = 0
    while True:
        if pos < 0 or pos >= len(buf):
            raise ValueError("Avro varint truncated")
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return _zigzag_decode(acc), pos
        shift += 7
        if shift > 70:
            raise ValueError("Avro varint overlong")


def write_varint(n: int) -> bytes:
    z = _zigzag_encode(n) if n < 0 else (n << 1)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _field_decoders(schema: dict):
    """Compile the record schema into per-field (name, decoder)
    pairs; a decoder is ``(buf, pos) -> (value, next pos)``."""
    if schema.get("type") != "record":
        raise NotImplementedError(
            "Avro scan supports record top-level schemas"
        )

    def prim(t: str):
        if t == "null":
            return lambda buf, pos: (None, pos)
        if t == "boolean":
            return lambda buf, pos: (buf[pos] != 0, pos + 1)
        if t in ("int", "long"):
            return read_varint
        if t == "float":
            return lambda buf, pos: (
                struct.unpack_from("<f", buf, pos)[0],
                pos + 4,
            )
        if t == "double":
            return lambda buf, pos: (
                struct.unpack_from("<d", buf, pos)[0],
                pos + 8,
            )
        if t in ("string", "bytes"):
            def dec(buf, pos, _want_str=(t == "string")):
                ln, pos = read_varint(buf, pos)
                if ln < 0 or pos + ln > len(buf):
                    raise ValueError("Avro bytes length out of range")
                raw = bytes(buf[pos : pos + ln])
                if not _want_str:
                    return raw, pos + ln
                try:
                    return raw.decode("utf-8"), pos + ln
                except UnicodeDecodeError as exc:
                    raise ValueError(
                        "Avro string field not UTF-8"
                    ) from exc
            return dec
        raise NotImplementedError(f"Avro type {t!r} not supported")

    def compile_type(t):
        if isinstance(t, str):
            return prim(t)
        if isinstance(t, list):  # union: branch index then value
            branches = [compile_type(b) for b in t]

            def dec(buf, pos):
                idx, pos = read_varint(buf, pos)
                if not 0 <= idx < len(branches):
                    raise ValueError("Avro union index out of range")
                return branches[idx](buf, pos)

            return dec
        if isinstance(t, dict):
            return compile_type(t.get("type"))
        raise NotImplementedError(f"Avro type {t!r} not supported")

    return [
        (f["name"], compile_type(f["type"]))
        for f in schema.get("fields", [])
    ]


def _spark_type(t) -> Tuple[str, bool]:
    """Avro field type → (spark type DDL, nullable)."""
    if isinstance(t, str):
        if t == "null":
            return "string", True  # all-null column
        if t in _PRIMITIVE_SPARK:
            return _PRIMITIVE_SPARK[t], False
        raise NotImplementedError(f"Avro type {t!r} not supported")
    if isinstance(t, list):
        non_null = [b for b in t if b != "null"]
        if len(non_null) != 1:
            raise NotImplementedError("Avro multi-branch unions")
        ddl, _ = _spark_type(non_null[0])
        return ddl, True
    if isinstance(t, dict):
        return _spark_type(t.get("type"))
    raise NotImplementedError(f"Avro type {t!r} not supported")


def read_avro_header(data: bytes):
    """Parse the OCF header → (schema dict, codec, sync marker, pos
    of the first block)."""
    if data[:4] != AVRO_MAGIC:
        raise ValueError("not an Avro object container file")
    pos, meta = 4, {}
    while True:
        n, pos = read_varint(data, pos)
        if n == 0:
            break
        if n < 0:  # negative block count carries a byte size next
            n = -n
            _, pos = read_varint(data, pos)
        if n > 1_000_000:
            raise ValueError("Avro header map count out of range")
        for _ in range(n):
            klen, pos = read_varint(data, pos)
            if klen < 0 or pos + klen > len(data):
                raise ValueError("Avro header key length out of range")
            try:
                key = data[pos : pos + klen].decode("utf-8")
            except UnicodeDecodeError as exc:
                raise ValueError("Avro header key not UTF-8") from exc
            pos += klen
            vlen, pos = read_varint(data, pos)
            if vlen < 0 or pos + vlen > len(data):
                raise ValueError(
                    "Avro header value length out of range"
                )
            meta[key] = data[pos : pos + vlen]
            pos += vlen
    sync = data[pos : pos + 16]
    pos += 16
    if "avro.schema" not in meta:
        raise ValueError("Avro header missing schema")
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode("ascii")
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"Avro codec {codec!r} not supported")
    return schema, codec, sync, pos


def index_avro_blocks(data: bytes, pos: int, sync: bytes):
    """Walk block headers (skipping payloads) → list of (row count,
    payload offset, payload size)."""
    blocks = []
    while pos < len(data):
        count, pos = read_varint(data, pos)
        size, pos = read_varint(data, pos)
        if count < 0 or size < 0 or pos + size + 16 > len(data):
            raise ValueError("Avro block header out of range")
        blocks.append((count, pos, size))
        pos += size
        if data[pos : pos + 16] != sync:
            raise ValueError("Avro sync marker mismatch")
        pos += 16
    return blocks


AVRO_MAX_BLOCK_BYTES = 1 << 28  # decompression-bomb guard per block


def decode_avro_block(
    payload: bytes, codec: str, decoders, count: int
) -> List[tuple]:
    if codec == "deflate":
        d = zlib.decompressobj(-15)
        payload = d.decompress(payload, AVRO_MAX_BLOCK_BYTES)
        if d.unconsumed_tail:
            raise ValueError(
                "Avro deflate block exceeds the untrusted-input "
                "decompression guard (2^28 bytes)"
            )
    rows, pos = [], 0
    for _ in range(count):
        vals = []
        for _name, dec in decoders:
            v, pos = dec(payload, pos)
            vals.append(v)
        rows.append(tuple(vals))
    if pos != len(payload):
        raise ValueError("Avro block has trailing bytes")
    return rows


def read_avro(spark: SparkSession, path, **options):
    """Distributed Avro OCF scan wrapped in the façade's
    :class:`ParseResult` contract: driver indexes block boundaries,
    executors decode their blocks independently."""
    from almost_any_file_to_pandas_spark.result import ParseResult

    return ParseResult(
        data=read_avro_frame(spark, path, **options),
        sheet_name="Avro container content",
        engine="stdlib avro (block-parallel)",
        file_path=str(path),
    )


def read_avro_frame(spark: SparkSession, path, **options) -> DataFrame:
    """The bare DataFrame scan behind :func:`read_avro`."""
    p = str(path)
    data = Path(p).read_bytes()
    schema, codec, sync, pos = read_avro_header(data)
    decoders = _field_decoders(schema)
    fields = []
    for f in schema.get("fields", []):
        ddl, _nullable = _spark_type(f["type"])
        fields.append(f"`{f['name']}` {ddl}")
    ddl = ", ".join(fields)
    blocks = index_avro_blocks(data, pos, sync)
    if not blocks:
        return spark.createDataFrame([], ddl)
    sc = spark.sparkContext
    n_slices = min(len(blocks), sc.defaultParallelism)

    def decode_range(spec):
        count, off, size = spec
        # executors re-read only their payload byte range
        with open(p, "rb") as fh:
            fh.seek(off)
            payload = fh.read(size)
        return decode_avro_block(payload, codec, decoders, count)

    rdd = sc.parallelize(blocks, n_slices).flatMap(decode_range)
    return spark.createDataFrame(rdd, ddl)


def synth_avro(
    schema: dict, rows: List[tuple], codec: str = "null",
    rows_per_block: int = 0,
) -> bytes:
    """Assemble a REAL Avro OCF from the public spec — the fixture
    writer for the pytest round-trips (the BIFF-style answer to "no
    external Avro writer ships in this environment")."""
    decoders = _field_decoders(schema)  # validates the schema

    def enc_val(t, v) -> bytes:
        if isinstance(t, dict):
            return enc_val(t.get("type"), v)
        if isinstance(t, list):
            non_null = [b for b in t if b != "null"]
            if v is None:
                return write_varint(t.index("null"))
            return write_varint(t.index(non_null[0])) + enc_val(
                non_null[0], v
            )
        if t == "null":
            return b""
        if t == "boolean":
            return b"\x01" if v else b"\x00"
        if t in ("int", "long"):
            return write_varint(v)
        if t == "float":
            return struct.pack("<f", v)
        if t == "double":
            return struct.pack("<d", v)
        if t == "string":
            raw = v.encode("utf-8")
            return write_varint(len(raw)) + raw
        if t == "bytes":
            return write_varint(len(v)) + v
        raise NotImplementedError(t)

    field_types = [f["type"] for f in schema["fields"]]
    sync = bytes((i * 17 + 3) % 256 for i in range(16))
    meta = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": codec.encode(),
    }
    out = io.BytesIO()
    out.write(AVRO_MAGIC)
    out.write(write_varint(len(meta)))
    for k, v in meta.items():
        kb = k.encode()
        out.write(write_varint(len(kb)) + kb)
        out.write(write_varint(len(v)) + v)
    out.write(write_varint(0))
    out.write(sync)
    rpb = rows_per_block or max(1, len(rows))
    for i in range(0, len(rows), rpb):
        chunk = rows[i : i + rpb]
        payload = b"".join(
            b"".join(enc_val(t, v) for t, v in zip(field_types, row))
            for row in chunk
        )
        if codec == "deflate":
            comp = zlib.compressobj(wbits=-15)
            payload = comp.compress(payload) + comp.flush()
        out.write(write_varint(len(chunk)))
        out.write(write_varint(len(payload)))
        out.write(payload)
        out.write(sync)
    _ = decoders
    return out.getvalue()


def read_avro_many(spark: SparkSession, paths) -> DataFrame:
    """Corpus-scale Avro ingestion: ONE DataFrame over many container
    files — the 100 TB shape (the single-file reader exists for the
    façade's per-file metadata contract, not throughput). The driver
    reads each file's HEADER + block index only (O(#blocks) seeks,
    the pass a production deployment persists as a manifest);
    executors decode `(file, codec, offset, size, count)` slices
    independently, so parallelism = total block count across the
    corpus, not file count. All files must share one schema (the
    homogeneous-corpus assumption of the other `_many` readers);
    codecs may differ per file."""
    import glob as _glob

    if isinstance(paths, (str, Path)):
        file_list = sorted(_glob.glob(str(paths)))
    else:
        file_list = [str(p) for p in paths]
    if not file_list:
        raise ValueError("read_avro_many: no files matched")
    specs, ddl0, decoders0 = [], None, None
    for fp in file_list:
        data = Path(fp).read_bytes()
        schema, codec, sync, pos = read_avro_header(data)
        fields = []
        for f in schema.get("fields", []):
            t, _ = _spark_type(f["type"])
            fields.append(f"`{f['name']}` {t}")
        ddl = ", ".join(fields)
        if ddl0 is None:
            ddl0, decoders0 = ddl, _field_decoders(schema)
        elif ddl != ddl0:
            raise ValueError(
                f"read_avro_many: schema mismatch in {fp}"
            )
        for count, off, size in index_avro_blocks(data, pos, sync):
            specs.append((fp, codec, count, off, size))
    if not specs:
        return spark.createDataFrame([], ddl0)
    sc = spark.sparkContext
    decoders = decoders0

    def decode_spec(spec):
        fp, codec, count, off, size = spec
        with open(fp, "rb") as fh:
            fh.seek(off)
            payload = fh.read(size)
        return decode_avro_block(payload, codec, decoders, count)

    rdd = sc.parallelize(
        specs, min(len(specs), sc.defaultParallelism)
    ).flatMap(decode_spec)
    return spark.createDataFrame(rdd, ddl0)


_SPARK_TO_AVRO = {
    "boolean": "boolean",
    "int": "int",
    "bigint": "long",
    "float": "float",
    "double": "double",
    "string": "string",
    "binary": "bytes",
}


def write_avro(
    df: DataFrame, path, codec: str = "deflate",
    rows_per_block: int = 1000,
) -> str:
    """Distributed Avro OCF sink — the reverse of
    :func:`read_avro_many`, Hadoop part-file convention: every
    DataFrame partition encodes its rows into its OWN container file
    under ``path/`` (one writer per executor, no driver funnel), each
    a complete spec-valid OCF (header + schema + sync-framed blocks)
    that :func:`read_avro_many` or any Avro reader ingests. Fields
    map boolean/int/bigint/float/double/string/binary; every field is
    written as the ``["null", T]`` union so Spark nullability
    round-trips. Other Spark types (timestamps, decimals, nested)
    raise the honest ``NotImplementedError`` gate."""
    import os

    fields = []
    for f in df.schema.fields:
        ddl = f.dataType.simpleString()
        if ddl not in _SPARK_TO_AVRO:
            raise NotImplementedError(
                f"write_avro: Spark type {ddl!r} (column {f.name!r}) "
                "has no primitive Avro mapping in this writer"
            )
        fields.append(
            {"name": f.name, "type": ["null", _SPARK_TO_AVRO[ddl]]}
        )
    schema = {"type": "record", "name": "row", "fields": fields}
    out_dir = str(path)
    os.makedirs(out_dir, exist_ok=True)

    def write_part(idx, it):
        rows = [tuple(r) for r in it]
        if not rows:
            return iter(())
        blob = synth_avro(
            schema, rows, codec=codec, rows_per_block=rows_per_block
        )
        part = os.path.join(out_dir, f"part-{idx:05d}.avro")
        with open(part, "wb") as fh:
            fh.write(blob)
        return iter([(idx, len(rows))])

    counts = df.rdd.mapPartitionsWithIndex(write_part).collect()
    if not counts:
        # empty frame: still leave a valid, readable empty container
        with open(os.path.join(out_dir, "part-00000.avro"), "wb") as fh:
            fh.write(synth_avro(schema, []))
    return out_dir
