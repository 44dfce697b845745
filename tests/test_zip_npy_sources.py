"""ZIP container fan-out (sources/archive.py) and NumPy array arms
(sources/nparrays.py): member dispatch, bomb guards, typing, and the
never-raise façade contract.
"""

from __future__ import annotations

import io
import zipfile

import numpy as np
import pytest

from almost_any_file_to_pandas_spark.parse import parse


@pytest.fixture()
def mixed_zip(tmp_path):
    path = tmp_path / "drop.zip"
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("a.csv", "x;y\n1;2\n3;4\n")
        zf.writestr("sub/b.csv", "k;v\nfoo;10\n")
        zf.writestr("notes.unsupported", "ignore me")
        zf.writestr("binary.exe", b"\x00\x01")
        zf.writestr("dir/", "")
    return str(path)


def test_zip_fan_out(spark, mixed_zip):
    results = parse(spark, mixed_zip)
    names = sorted(r.sheet_name for r in results)
    assert names == ["a.csv", "sub/b.csv"]
    a = next(r for r in results if r.sheet_name == "a.csv")
    # the member parses through the full delimited pipeline: header
    # row included (reference semantics: no header inference),
    # all-string cells, row numbering
    assert a.data.count() == 3
    assert a.parse_info == "OK"
    # provenance points at the ARCHIVE, temp path at the extraction
    assert a.file_path == mixed_zip
    assert a.temp_path is not None


def test_zip_skips_bad_members_keeps_good(spark, tmp_path):
    path = tmp_path / "partial.zip"
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("good.csv", "a;b\n1;2\n")
        zf.writestr("empty.csv", "")  # parses empty → Failed → skip
    results = parse(spark, str(path))
    assert [r.sheet_name for r in results] == ["good.csv"]


def test_zip_error_paths(spark, tmp_path):
    not_zip = tmp_path / "fake.zip"
    not_zip.write_bytes(b"PK\x03\x04 but truncated garbage")
    assert parse(spark, str(not_zip))[0].parse_info == "Failed"

    empty = tmp_path / "empty.zip"
    with zipfile.ZipFile(empty, "w"):
        pass
    assert parse(spark, str(empty))[0].parse_info == "Failed"

    only_unsupported = tmp_path / "opaque.zip"
    with zipfile.ZipFile(only_unsupported, "w") as zf:
        zf.writestr("x.bin", b"\x00")
        zf.writestr("inner.zip", b"PK\x03\x04")  # no nested recursion
    assert parse(spark, str(only_unsupported))[0].parse_info == "Failed"


def test_zip_member_ceiling_skips_bomb(spark, tmp_path, monkeypatch):
    import importlib

    # the package __init__ re-exports the parse FUNCTION under the
    # same dotted name — go through importlib for the module object
    parse_mod = importlib.import_module(
        "almost_any_file_to_pandas_spark.parse"
    )
    monkeypatch.setattr(
        parse_mod, "XZ_MAX_DECOMPRESSED_BYTES", 1024
    )
    path = tmp_path / "bomb.zip"
    with zipfile.ZipFile(
        path, "w", compression=zipfile.ZIP_DEFLATED
    ) as zf:
        zf.writestr("big.csv", "a;b\n" + "1;2\n" * 100_000)
        zf.writestr("small.csv", "a;b\n9;9\n")
    results = parse(spark, str(path))
    assert [r.sheet_name for r in results] == ["small.csv"]


def test_npy_2d_and_1d(spark, tmp_path):
    p2 = tmp_path / "mat.npy"
    np.save(p2, np.array([[1.5, 2.5], [3.5, 4.5]]))
    res = parse(spark, str(p2))[0]
    assert res.data.columns == ["row_id", "c0", "c1"]
    rows = {r.row_id: (r.c0, r.c1) for r in res.data.collect()}
    assert rows == {0: (1.5, 2.5), 1: (3.5, 4.5)}

    p1 = tmp_path / "vec.npy"
    np.save(p1, np.array([7, 8, 9], dtype=np.int32))
    res = parse(spark, str(p1))[0]
    assert dict(res.data.dtypes) == {
        "row_id": "bigint",
        "value": "bigint",
    }
    assert [r.value for r in res.data.orderBy("row_id").collect()] == [
        7,
        8,
        9,
    ]


def test_npy_structured_and_strings(spark, tmp_path):
    arr = np.array(
        [(1, "ada", 1.5), (2, "bob", -2.0)],
        dtype=[("id", "i8"), ("name", "U8"), ("score", "f4")],
    )
    p = tmp_path / "table.npy"
    np.save(p, arr)
    res = parse(spark, str(p))[0]
    rows = {r.id: r for r in res.data.collect()}
    assert rows[1].name == "ada" and rows[1].score == 1.5
    assert rows[2].score == -2.0


def test_npz_fan_out_and_guards(spark, tmp_path):
    p = tmp_path / "bundle.npz"
    np.savez(
        p,
        counts=np.arange(4, dtype=np.int64),
        weights=np.array([0.5, 0.25]),
        cube=np.zeros((2, 2, 2)),  # rank-3: skipped
    )
    results = parse(spark, str(p))
    assert [r.sheet_name for r in results] == ["counts", "weights"]
    counts = results[0]
    assert [
        r.value for r in counts.data.orderBy("row_id").collect()
    ] == [0, 1, 2, 3]


def test_npy_object_array_refused(spark, tmp_path):
    p = tmp_path / "obj.npy"
    np.save(p, np.array([{"a": 1}], dtype=object), allow_pickle=True)
    assert parse(spark, str(p))[0].parse_info == "Failed"


def test_npy_in_zip(spark, tmp_path):
    buf = io.BytesIO()
    np.save(buf, np.array([1.0, 2.0]))
    path = tmp_path / "arrs.zip"
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("embedded.npy", buf.getvalue())
    results = parse(spark, str(path))
    assert [r.sheet_name for r in results] == ["embedded.npy"]
    assert results[0].data.count() == 2


def test_tar_fan_out_variants(spark, tmp_path):
    import tarfile

    payload = b"x;y\n1;2\n3;4\n"
    for name, mode in [
        ("t.tar", "w"),
        ("t.tar.gz", "w:gz"),
        ("t.tgz", "w:gz"),
        ("t.tar.bz2", "w:bz2"),
    ]:
        path = tmp_path / name
        with tarfile.open(path, mode) as tf:
            import io as _io

            info = tarfile.TarInfo("data/a.csv")
            info.size = len(payload)
            tf.addfile(info, _io.BytesIO(payload))
            skip = tarfile.TarInfo("x.unsupported")
            skip.size = 1
            tf.addfile(skip, _io.BytesIO(b"z"))
        results = parse(spark, str(path))
        assert [r.sheet_name for r in results] == ["data/a.csv"], name
        assert results[0].data.count() == 3
        assert results[0].file_path == str(path)


def test_tar_error_paths(spark, tmp_path):
    bad = tmp_path / "corrupt.tar"
    bad.write_bytes(b"not a tarball at all" * 40)
    assert parse(spark, str(bad))[0].parse_info == "Failed"

    import tarfile as _tar

    empty = tmp_path / "empty.tar"
    with _tar.open(empty, "w"):
        pass
    assert parse(spark, str(empty))[0].parse_info == "Failed"
