"""Build a driver-precision replica of a testdata directory.

The driver environment's ``events.parquet`` carries TIMESTAMP(NANOS),
while the local testdata is microsecond parquet — exactly the divergence class behind round 3's
three gate hash-fails (Spark reads nanos truncated to micros via the
``nanosAsLong`` branch in ``plans.table()``; an un-normalized DuckDB
oracle sees full nanosecond values).

This tool rewrites ``events.parquet`` at TIMESTAMP(NANOS) precision
WITH nonzero sub-microsecond jitter (``event_id mod 1000`` ns — worse
than the driver's data, which plausibly stores micro-resolution
instants in ns units) and symlinks every other table, so

    python tools/make_nanos_testdata.py /root/testdata/sf0.01 /tmp/nanos
    python tools/check_oracle.py /tmp/nanos

re-proves the whole registry against the adversarial precision.
Round-4 record: 157/157 oracle-paired PASS on both the stock micros
directory and this nanos replica.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

TABLES = (
    "region nation customer supplier part orders lineitem "
    "documents embeddings"
).split()


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    src, dst = Path(sys.argv[1]), Path(sys.argv[2])
    dst.mkdir(parents=True, exist_ok=True)

    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(src / "events.parquet")
    ts_ns = (
        t.column("ts")
        .cast(pa.timestamp("ns"))
        .cast(pa.int64())
        .to_numpy(zero_copy_only=False)
    )
    eid = t.column("event_id").to_numpy(zero_copy_only=False)
    jitter = (eid % 1000).astype("int64")
    ts_j = pa.array(ts_ns + jitter).cast(pa.timestamp("ns"))
    t2 = t.set_column(
        t.schema.get_field_index("ts"),
        pa.field("ts", pa.timestamp("ns")),
        ts_j,
    )
    # store_schema=False drops the Arrow schema so readers see the
    # raw parquet TIMESTAMP(NANOS) logical type, like the driver files
    pq.write_table(t2, dst / "events.parquet", store_schema=False)
    for name in TABLES:
        link = dst / f"{name}.parquet"
        if not link.exists():
            os.symlink(src / f"{name}.parquet", link)
    print(f"wrote {dst}/events.parquet (TIMESTAMP_NANOS + ns jitter), "
          f"symlinked {len(TABLES)} tables")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
