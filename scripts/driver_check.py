"""Driver-style correctness check: Spark query vs DuckDB oracle via pandas.

Stricter than tests/test_oracle.py — compares the raw pandas frames (values
AND a hash over the stringified sorted frame), approximating the driver's t2
gate so oracle-typing mismatches (HUGEINT→float64, DATE→datetime64) surface
locally before the round gate runs.

Usage: python scripts/driver_check.py [query ...]   (default: all with oracle)
"""

from __future__ import annotations

import hashlib
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import duckdb
import pandas as pd

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def frame_repr(df: pd.DataFrame) -> tuple[str, str]:
    df = df[sorted(df.columns)]
    rows = sorted(
        tuple(str(v) for v in row) for row in df.itertuples(index=False, name=None)
    )
    h = hashlib.sha256(repr(rows).encode()).hexdigest()[:16]
    # datetime64 resolution (ns vs us) stringifies identically, so the real
    # gate's value hash can't see it — normalize it away here too, or every
    # timestamp-bearing query reads as a false FAIL (Spark→pandas gives ns,
    # DuckDB→pandas gives us)
    dtypes = ",".join(
        f"{c}:{str(df[c].dtype).replace('[us]', '[ns]')}" for c in df.columns
    )
    return h, dtypes


def main() -> None:
    from scraping_jobsdb_spark.plans.queries import REGISTRY
    from scraping_jobsdb_spark.session import get_spark

    names = sys.argv[1:] or [n for n, q in REGISTRY.items() if q.oracle]
    spark = get_spark(app_name="driver_check", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    failures = []
    for name in names:
        q = REGISTRY[name]
        if q.oracle is None:
            n = q.spark_fn(spark, SF_DIR).count()
            print(f"{name}: rows-only ({n} rows)")
            continue
        s_pdf = q.spark_fn(spark, SF_DIR).toPandas()
        d_pdf = con.execute(q.oracle).df()
        sh, sd = frame_repr(s_pdf)
        dh, dd = frame_repr(d_pdf)
        ok_rows = len(s_pdf) == len(d_pdf)
        ok_cols = sorted(s_pdf.columns) == sorted(d_pdf.columns)
        ok_hash = sh == dh
        ok_dtype = sd == dd
        status = "PASS" if (ok_rows and ok_cols and ok_hash and ok_dtype) else "FAIL"
        print(
            f"{status} {name}: rows={len(s_pdf)}/{len(d_pdf)} hash={ok_hash} dtypes={ok_dtype}"
        )
        if status == "FAIL":
            failures.append(name)
            if not ok_dtype:
                print(f"  spark dtypes: {sd}\n  duck  dtypes: {dd}")
            if not ok_hash and ok_dtype:
                merged = s_pdf.merge(d_pdf, how="outer", indicator=True)
                diff = merged[merged["_merge"] != "both"]
                print(diff.head(6).to_string())
    if failures:
        print(f"\nFAILED: {failures}")
        sys.exit(1)
    print("\nall green")


if __name__ == "__main__":
    main()
