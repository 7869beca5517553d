"""Profile the driver-side BUILD of one query: py4j round-trip count,
Spark jobs triggered (eager work), and a cProfile top list.

Usage: python scripts/profile_build.py <query> [query...]
"""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    import py4j.clientserver as cs
    import py4j.java_gateway as jg

    from scraping_jobsdb_spark.plans.queries import REGISTRY
    from scraping_jobsdb_spark.session import get_spark

    counter = {"n": 0}
    orig = jg.GatewayClient.send_command
    orig_cs = cs.ClientServerConnection.send_command

    def patched(self, *a, **k):
        counter["n"] += 1
        return orig(self, *a, **k)

    def patched_cs(self, *a, **k):
        counter["n"] += 1
        return orig_cs(self, *a, **k)

    jg.GatewayClient.send_command = patched
    cs.ClientServerConnection.send_command = patched_cs

    spark = get_spark(app_name="profile_build")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    for name in sys.argv[1:]:
        q = REGISTRY[name]
        # warm
        q.spark_fn(spark, SF_DIR)
        jobs0 = sc._jsc.sc().dagScheduler().nextJobId()
        counter["n"] = 0
        pr = cProfile.Profile()
        t0 = time.perf_counter()
        pr.enable()
        q.spark_fn(spark, SF_DIR)
        pr.disable()
        dt = time.perf_counter() - t0
        jobs1 = sc._jsc.sc().dagScheduler().nextJobId()
        s = io.StringIO()
        pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(18)
        body = "\n".join(
            ln
            for ln in s.getvalue().splitlines()
            if ln.strip() and not ln.lstrip().startswith(("ncalls", "Ordered"))
        )
        print(
            f"=== {name}: build={dt:.3f}s py4j_cmds={counter['n']} "
            f"spark_jobs={jobs1 - jobs0}"
        )
        print(body[:3500])
        print(flush=True)


if __name__ == "__main__":
    main()
