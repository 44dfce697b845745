"""Build degenerate corpora for robustness sweeps: every table with
ZERO rows (`empty`) and with exactly ONE row (`single`, the first row
of sf0.001 per table — referential links may dangle, deliberately).

Both engines must agree on these shapes too: a query that crashes or
diverges on an empty scan (uncaught .collect()[0], a COUNT that
becomes NULL on one engine, a threshold crossJoin against an empty
1-row aggregate) is a 100 TB incident waiting for an empty partition
or a fully-filtered day.

pyarrow slicing (not a Spark write) so each table stays ONE parquet
file with the SOURCE schema byte-for-byte — events keeps its
TIMESTAMP(NANOS) physical type, exercising the same read-side
conversion the real testdata needs.

Usage: python tools/make_degenerate_testdata.py [src_sf_dir] [out_root]
Then:  python tools/check_oracle.py <out_root>/empty
       python tools/check_oracle.py <out_root>/single
"""

from __future__ import annotations

import sys
from pathlib import Path

import pyarrow.parquet as pq

REPO = Path(__file__).resolve().parent.parent

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def build(src, out_root) -> None:
    """Write <out_root>/{empty,single}/<table>.parquet from src —
    importable (the pytest battery reuses it), schema-preserving."""
    src, out_root = Path(src), Path(out_root)
    for name in TABLES:
        t = pq.read_table(src / f"{name}.parquet")
        for variant, n in (("empty", 0), ("single", 1)):
            dest = out_root / variant
            dest.mkdir(parents=True, exist_ok=True)
            pq.write_table(t.slice(0, n), dest / f"{name}.parquet")


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_root = (
        sys.argv[2] if len(sys.argv) > 2 else str(REPO / ".tmp_degenerate")
    )
    build(src, out_root)
    print(f"wrote {out_root}/empty and {out_root}/single")
    return 0


if __name__ == "__main__":
    sys.exit(main())
