"""CLI demo — the engine's twin of the reference's ``__main__`` block
(/root/reference/main.py:453-466): parse one or more files and print
the answer list, result types, the first frame, and the per-file sheet
inventory.

Usage::

    python -m almost_any_file_to_pandas_spark FILE [FILE ...]

Uses a local SparkSession; the printed frame is a bounded ``show()``
(never a full collect — the parse results stay lazy DataFrames).
"""

from __future__ import annotations

import sys
from pathlib import Path


def main(argv: list[str]) -> int:
    if not argv:
        print(
            "usage: python -m almost_any_file_to_pandas_spark FILE [FILE ...]",
            file=sys.stderr,
        )
        return 2

    from almost_any_file_to_pandas_spark.parse import parse
    from almost_any_file_to_pandas_spark.session import get_spark

    spark = get_spark("aaftp-cli")
    status = 0
    for path in argv:
        results = parse(spark, path)
        print(f"Parse result instance:\n {results}")
        print("Parse result type: ", type(results))
        print("Parse result element type: ", type(results[0]))
        print("Parse result data attr type: ", type(results[0].data))
        if results[0].data is not None:
            print("\nParse result dataframe:")
            results[0].data.show(20, truncate=False)
        print(f"Pages list for '{Path(path).name}'")
        for order, page in enumerate(results):
            print(f'\t{order + 1} page name is "{page.sheet_name}"')
        if any(r.parse_info == "Failed" for r in results):
            status = 1
    return status


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
