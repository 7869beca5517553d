"""Property-based tests (hypothesis) for operator laws.

The differential oracle checks fixed queries on fixed data; these check the
operators' algebraic contracts on adversarial generated inputs — the §5
upgrade the reference never had (its only tests were golden fixtures).
One shared SparkSession; hypothesis drives small local frames.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from scraping_jobsdb_spark.operators.dedup import dedup_exact, dedup_first
from scraping_jobsdb_spark.operators.scale import salted_groupby
from scraping_jobsdb_spark.functions.scalars import pages_for

_SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),   # key (few → collisions)
        st.integers(min_value=-100, max_value=100),  # ord
        st.text(alphabet="abc ", min_size=0, max_size=8),  # payload
    ),
    min_size=1,
    max_size=40,
)


@given(rows=rows_strategy)
@settings(**_SETTINGS)
def test_dedup_first_keeps_exactly_the_minimum_per_key(spark, rows):
    df = spark.createDataFrame(rows, "key int, ord int, payload string")
    out = dedup_first(df, ["key"], ["ord", "payload"]).collect()
    # exactly one row per distinct key
    keys = [r.key for r in out]
    assert sorted(keys) == sorted({k for k, _, _ in rows})
    # and it is the lexicographic minimum under (ord, payload)
    expect = {}
    for k, o, p in rows:
        cur = expect.get(k)
        if cur is None or (o, p) < cur:
            expect[k] = (o, p)
    assert {r.key: (r.ord, r.payload) for r in out} == expect


@given(rows=rows_strategy)
@settings(**_SETTINGS)
def test_dedup_exact_is_content_keyed(spark, rows):
    df = spark.createDataFrame(rows, "key int, ord int, payload string")
    out = dedup_first(  # reference model: one row per payload, min (ord, key)
        df, ["payload"], ["ord", "key"]
    ).collect()
    got = dedup_exact(df.withColumn("uid", F.col("ord")), ["payload"], "uid")
    # one row per distinct payload content, regardless of keys
    assert got.select("payload").distinct().count() == got.count()
    assert got.count() == len({p for _, _, p in rows})
    assert len(out) == got.count()


@given(rows=rows_strategy)
@settings(**_SETTINGS)
def test_salted_groupby_equals_plain_on_generated_data(spark, rows):
    df = spark.createDataFrame(rows, "key int, ord int, payload string")
    salted = salted_groupby(
        df,
        ["key"],
        [("n", "count", "ord"), ("mn", "min", "ord"), ("mx", "max", "ord")],
        n_salts=4,
        salt_source="ord",
    )
    plain = df.groupBy("key").agg(
        F.count(F.lit(1)).alias("n"), F.min("ord").alias("mn"), F.max("ord").alias("mx")
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


@given(total=st.integers(min_value=0, max_value=10_000), per=st.integers(min_value=1, max_value=50))
@settings(**_SETTINGS)
def test_pages_for_is_ceil_division(spark, total, per):
    df = spark.createDataFrame([(total,)], "total int")
    got = df.select(pages_for(F.col("total"), per).alias("p")).collect()[0].p
    assert got == -(-total // per)


@given(texts=st.lists(st.text(alphabet="ab \t", min_size=1, max_size=12), min_size=1, max_size=10))
@settings(**_SETTINGS)
def test_fingerprint_whitespace_case_invariance(spark, texts):
    from scraping_jobsdb_spark.operators.textops import fingerprint

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "id int, text string")
    messy = df.select(
        "id",
        F.concat(F.lit("  "), F.upper(F.regexp_replace("text", " ", "   ")), F.lit("\t")).alias(
            "text"
        ),
    )
    a = {r.id: r.fp for r in df.select("id", fingerprint("text").alias("fp")).collect()}
    b = {r.id: r.fp for r in messy.select("id", fingerprint("text").alias("fp")).collect()}
    assert a == b
