"""Dump .explain("formatted") for queries to <outdir>/<query>.txt.

Usage: python scripts/dump_plans.py <outdir> <query> [query...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)

Used to produce the plans/r14/<query>_before.txt / _after.txt evidence
pairs: run once from a worktree pinned at the round-start commit, once
from the optimized tree.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from scraping_jobsdb_spark.plans.queries import REGISTRY
    from scraping_jobsdb_spark.session import get_spark

    outdir = Path(sys.argv[1])
    outdir.mkdir(parents=True, exist_ok=True)
    names = sys.argv[2:]
    spark = get_spark(app_name="dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        try:
            df = REGISTRY[name].spark_fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            plan = f"ERROR building {name}: {type(e).__name__}: {e}\n"
        (outdir / f"{name}.txt").write_text(plan)
        print(f"{name}: {len(plan)} bytes", flush=True)


if __name__ == "__main__":
    main()
