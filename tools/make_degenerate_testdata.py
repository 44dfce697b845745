"""Build degenerate corpora for robustness sweeps: every table with
ZERO rows (`empty`) and with exactly ONE row (`single`, the first row
of sf0.001 per table — referential links may dangle, deliberately).

Both engines must agree on these shapes too: a query that crashes or
diverges on an empty scan (uncaught .collect()[0], a COUNT that
becomes NULL on one engine, a threshold crossJoin against an empty
1-row aggregate) is a 100 TB incident waiting for an empty partition
or a fully-filtered day.

Usage: python tools/make_degenerate_testdata.py [src_sf_dir] [out_root]
Then:  python tools/check_oracle.py <out_root>/empty
       python tools/check_oracle.py <out_root>/single
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_root = Path(
        sys.argv[2] if len(sys.argv) > 2 else str(REPO / ".tmp_degenerate")
    )
    from almost_any_file_to_pandas_spark.plans import table
    from almost_any_file_to_pandas_spark.session import (
        apply_engine_conf,
        get_spark,
    )

    spark = get_spark()
    apply_engine_conf(spark)
    for name in TABLES:
        df = table(spark, src, name)
        for variant, n in (("empty", 0), ("single", 1)):
            dest = out_root / variant / f"{name}.parquet"
            df.limit(n).coalesce(1).write.mode("overwrite").parquet(
                str(dest)
            )
    print(f"wrote {out_root}/empty and {out_root}/single")
    return 0


if __name__ == "__main__":
    sys.exit(main())
