"""Isolated per-query timing + plan capture for optimization work.

Usage: python tools/probe.py <query> [...] [--n 5] [--plan TAG]
                                           [--round r10]
Times each named query with the bench's exact methodology (noop sink,
warm JVM) on $SPARK_GRAFT_SF_DIR (default sf0.1), printing min/median
of n runs. ``--plan TAG`` writes each query's .explain("formatted")
to plans/<round>/<query>_<TAG>.txt (TAG is a filename tag such as
``before``/``after``; the round directory defaults to r10).
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    args = [a for a in sys.argv[1:]]
    n = 5
    plan_tag = None
    if "--n" in args:
        i = args.index("--n")
        n = int(args[i + 1])
        del args[i : i + 2]
    if "--plan" in args:
        i = args.index("--plan")
        plan_tag = args[i + 1]
        del args[i : i + 2]
    round_dir = "r10"
    if "--round" in args:
        i = args.index("--round")
        round_dir = args[i + 1]
        del args[i : i + 2]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from almost_any_file_to_pandas_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("probe")
    queries = entrymod.queries()
    # same warmup as bench.py
    queries["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(128).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    for name in names:
        fn = queries[name]
        if plan_tag:
            df = fn(spark, sf_dir)
            out = REPO / "plans" / round_dir / f"{name}_{plan_tag}.txt"
            out.parent.mkdir(parents=True, exist_ok=True)
            out.write_text(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
        runs = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        med = sorted(runs)[len(runs) // 2]
        print(f"{name}: median {med:.3f}s min {min(runs):.3f}s {runs}",
              flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
