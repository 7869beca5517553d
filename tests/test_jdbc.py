"""Live JDBC scan/sink tests (SURVEY.md §2.1 S5/S6) against embedded Derby.

Spark's own jar directory ships derby-10.16 (`derby-10.16.1.1.jar`), so a
`jdbc:derby:memory:` database needs zero new dependencies — these tests flip
S5/S6 from "wrapper code, never executed against a database" to live-tested.
Reference behavior being re-expressed: `spark/ParseHtml.py:33-41` reads the
raw table through ONE connection with the filter baked into the query string
(no partitionColumn); `ParseHtml.py:74-80` appends the parsed frame. The
engine's wrappers stripe the scan and keep appends per-partition.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from scraping_jobsdb_spark.sources.tables import (
    load_table,
    read_jdbc_partitioned,
    write_jdbc_append,
)
from tests.conftest import SF_SMOKE

DERBY = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


def test_jdbc_append_and_partitioned_scan_live(spark):
    """S6 append semantics (two appends double the rows — the reference's
    ON-CONFLICT-free raw INSERT) and S5 parallel scan: the read must arrive
    in >1 input partition with the predicate PUSHED to the JDBC source (the
    database does the filtering, not Spark), and the values must round-trip
    exactly (BIGINT/DOUBLE/VARCHAR)."""
    url = "jdbc:derby:memory:sjdb_test_append;create=true"
    src = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    n = src.count()
    write_jdbc_append(src.repartition(3), url, "orders_a", properties=DERBY)
    write_jdbc_append(src.repartition(3), url, "orders_a", properties=DERBY)

    back = read_jdbc_partitioned(
        spark, url, "orders_a", "o_orderkey", 1, 100000, 4, properties=DERBY
    )
    assert back.count() == 2 * n
    assert back.rdd.getNumPartitions() == 4

    filt = back.filter(F.col("o_totalprice") > 100000.0).select(
        "o_orderkey", "o_totalprice"
    )
    plan = filt._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThan(o_totalprice" in plan
    # column pruning reaches the JDBC relation: the scan reads 2 columns
    scan_line = next(l for l in plan.splitlines() if "JDBCRelation" in l)
    assert "o_orderstatus" not in scan_line

    # exact value round-trip (doubles through Derby DOUBLE are IEEE-exact)
    want = {
        (r.o_orderkey, r.o_totalprice, r.o_orderstatus)
        for r in src.collect()
    }
    got = {
        (r.o_orderkey, r.o_totalprice, r.o_orderstatus)
        for r in back.collect()
    }
    assert got == want  # set-compare: the doubled rows collapse


def test_jdbc_bounds_do_not_lose_rows(spark):
    """Partition bounds are a STRIPING hint, not a filter: rows with keys
    outside [lowerBound, upperBound) must still appear (they land in the
    edge partitions)."""
    url = "jdbc:derby:memory:sjdb_test_bounds;create=true"
    df = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    df.write.mode("overwrite").jdbc(url, "t_bounds", properties=DERBY)
    back = read_jdbc_partitioned(
        spark, url, "t_bounds", "k", 40, 60, 3, properties=DERBY
    )
    assert back.count() == 100
    assert {r.k for r in back.collect()} == set(range(100))
