"""Regression guard for the driver-generated testdata schemas.

Round 2 lost its entire scoreboard to a silent testdata change: events.ts
went from TIMESTAMP(NANOS) to plain timestamp[us] and the hardcoded nanos
conversion in load_table became an AnalysisException in 12 gate queries, 33
tests, and the bench warm-up. These tests load every table through the
engine's own reader and pin the dtypes the rest of the codebase assumes, so
the next encoding change fails HERE first, with a readable message.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from conftest import SF_CORRECT, SF_SMOKE

from scraping_jobsdb_spark.sources.tables import (
    TABLE_NAMES,
    load_table,
    normalize_event_ts,
)

# dtypes every module downstream of load_table assumes (column -> spark dtype)
EXPECTED = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
    "customer": {
        "c_custkey": "bigint",
        "c_name": "string",
        "c_nationkey": "int",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "bigint",
        "s_name": "string",
        "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "bigint",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": "timestamp_ntz",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_partkey": "bigint",
        "l_suppkey": "bigint",
        "l_linenumber": "int",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": "timestamp_ntz",
    },
    # ts MUST land as a (session-tz) timestamp whatever the file encodes —
    # watermarks, window(), as-of joins, and the DuckDB oracle all rely on it.
    "events": {
        "event_id": "bigint",
        "ts": "timestamp",
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "bigint",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "bigint",
    },
    "embeddings": {"vec_id": "bigint", "embedding": "array<float>", "label": "int"},
}


@pytest.mark.parametrize("name", TABLE_NAMES)
def test_load_table_dtypes(spark, name):
    df = load_table(spark, SF_SMOKE, name)
    got = dict(df.dtypes)
    for col, want in EXPECTED[name].items():
        assert col in got, f"{name}: column {col} missing (have {sorted(got)})"
        assert got[col] == want, f"{name}.{col}: dtype {got[col]!r}, expected {want!r}"
    # and the scan must actually execute, not just analyze
    assert df.limit(1).count() >= 0


def test_events_ts_consistent_across_sfs(spark):
    """All shipped scale factors must use the same ts encoding — if the
    driver regenerates one and not another, surface it immediately."""
    kinds = {
        sf: str(pq.read_schema(f"{sf}/events.parquet").field("ts").type)
        for sf in (SF_SMOKE, SF_CORRECT)
    }
    assert len(set(kinds.values())) == 1, f"mixed ts encodings: {kinds}"


def test_normalize_event_ts_handles_both_encodings(spark):
    """The adapter must map both historical encodings to equal instants."""
    from pyspark.sql import functions as F

    # micros path: what today's files produce (TIMESTAMP_NTZ)
    ntz = spark.sql(
        "select timestamp_ntz'2024-03-01 12:30:45.123456' as ts"
    )
    out_ntz = normalize_event_ts(ntz)
    assert dict(out_ntz.dtypes)["ts"] == "timestamp"

    # legacy nanos-as-long path: BIGINT nanoseconds since epoch
    nanos = spark.range(1).select(
        F.lit(1709296245123456789).cast("long").alias("ts")
    )
    out_nanos = normalize_event_ts(nanos)
    assert dict(out_nanos.dtypes)["ts"] == "timestamp"
    # nanos truncate to micros: both represent 2024-03-01 12:30:45.123456 UTC
    v = out_nanos.collect()[0].ts
    assert (v.year, v.second, v.microsecond) == (2024, 45, 123456)

    # already-timestamp input passes through unchanged
    passthrough = normalize_event_ts(out_nanos)
    assert dict(passthrough.dtypes)["ts"] == "timestamp"
