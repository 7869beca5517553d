"""Split each bench query's wall time into plan-BUILD (the spark_fn call,
driver-side Column/py4j construction plus any eager setup jobs) and EXEC
(the noop-sink materialization) — guide §1 measure-first / §5 driver work.

Usage: python scripts/build_exec_split.py [out.json] [query ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    import bench
    from scraping_jobsdb_spark.plans.queries import REGISTRY
    from scraping_jobsdb_spark.session import get_spark

    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/build_exec_split.json"
    names = sys.argv[2:] or list(bench.BENCH_QUERIES)
    spark = get_spark(app_name="build_exec_split")
    spark.sparkContext.setLogLevel("ERROR")

    for warm in ("groupby_min_max", "pandas_udf_token_count"):
        REGISTRY[warm].spark_fn(spark, "/root/testdata/sf0.001").write.format(
            "noop"
        ).mode("overwrite").save()

    rows = {}
    for name in names:
        q = REGISTRY[name]
        # warm pass (page cache, codegen, lazy inits) — untimed
        q.spark_fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        t0 = time.perf_counter()
        df = q.spark_fn(spark, SF_DIR)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        rows[name] = {"build": round(t1 - t0, 3), "exec": round(t2 - t1, 3)}
        print(
            f"{name}: build={t1 - t0:.3f} exec={t2 - t1:.3f}", flush=True
        )

    tot_b = sum(r["build"] for r in rows.values())
    tot_e = sum(r["exec"] for r in rows.values())
    print(f"TOTAL build={tot_b:.1f}s exec={tot_e:.1f}s n={len(rows)}")
    Path(out_path).write_text(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
