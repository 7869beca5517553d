"""Skew/co-location operators: salted agg/join equivalence, bucketed
exchange-free joins (operators/scale.py)."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

from scraping_jobsdb_spark.operators.scale import (
    salted_groupby,
    salted_join,
    write_bucketed,
)
from scraping_jobsdb_spark.sources.tables import load_table


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_salted_groupby_equals_plain(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    # event_type is low-cardinality — the skewed-aggregation shape.
    salted = salted_groupby(
        ev,
        ["event_type"],
        [
            ("n", "count", "event_id"),
            ("max_v", "max", "value"),
            ("min_v", "min", "value"),
            ("sum_ids", "sum", "user_id"),
        ],
        n_salts=16,
        salt_source="event_id",
    )
    plain = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("value").alias("max_v"),
        F.min("value").alias("min_v"),
        F.sum("user_id").alias("sum_ids"),
    )
    assert _rows(salted) == _rows(plain)


def test_salted_groupby_rejects_non_algebraic(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    try:
        salted_groupby(ev, ["event_type"], [("a", "avg", "value")])
    except ValueError as e:
        assert "non-algebraic" in str(e)
    else:  # pragma: no cover
        raise AssertionError("avg must be rejected (not combinable as-is)")


def test_salted_join_equals_plain_join(spark):
    o = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, SF_SMOKE, "customer").select("c_custkey", "c_nationkey")
    salted = salted_join(
        o, c.withColumnRenamed("c_custkey", "o_custkey"), ["o_custkey"], n_salts=8
    )
    plain = o.join(c.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey")
    assert _rows(salted.select("o_orderkey", "o_custkey", "c_nationkey")) == _rows(
        plain.select("o_orderkey", "o_custkey", "c_nationkey")
    )


def test_salted_left_join_preserves_unmatched(spark):
    o = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_custkey")
    tiny = (
        load_table(spark, SF_SMOKE, "customer")
        .filter(F.col("c_custkey") % 10 == 0)
        .select(F.col("c_custkey").alias("o_custkey"), "c_nationkey")
    )
    salted = salted_join(o, tiny, ["o_custkey"], n_salts=4, how="left")
    plain = o.join(tiny, "o_custkey", "left")
    assert _rows(salted) == _rows(plain)


def test_bucketed_join_has_no_exchange(spark):
    suffix = uuid.uuid4().hex[:8]
    t_orders, t_cust = f"b_orders_{suffix}", f"b_cust_{suffix}"
    o = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    c = load_table(spark, SF_SMOKE, "customer").select("c_custkey", "c_nationkey")
    write_bucketed(o, t_orders, ["o_custkey"], n_buckets=8, sort_cols=["o_custkey"])
    write_bucketed(
        c.withColumnRenamed("c_custkey", "o_custkey"),
        t_cust,
        ["o_custkey"],
        n_buckets=8,
        sort_cols=["o_custkey"],
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
    try:
        # Force a non-broadcast plan so co-location is what's being tested.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table(t_orders).join(spark.table(t_cust), "o_custkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # and it still computes the right thing
        plain = o.join(c.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey")
        assert joined.count() == plain.count()
    finally:
        # conf.get(key, None) returns None when the conf was never
        # EXPLICITLY set (it does not consult the SQLConf default), so
        # "restore only if prev is not None" silently left -1 leaked into
        # the shared session for every later test — unset() restores the
        # real default semantics either way.
        if prev is not None:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        else:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql(f"DROP TABLE IF EXISTS {t_orders}")
        spark.sql(f"DROP TABLE IF EXISTS {t_cust}")


def test_connected_components_chain_and_clusters(spark):
    from scraping_jobsdb_spark.operators.graph import (
        connected_components,
        dedup_keep_list,
    )

    # two clusters: a 5-node chain (diameter 4) and a triangle, plus an
    # isolated pair
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12), (20, 21)],
        "id_a bigint, id_b bigint",
    )
    # both strategies must agree bit-for-bit on the same graph
    want = {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}
    for thr in (1_000_000, 0):  # driver-side union-find / distributed loop
        cc = {
            r.id: r.component
            for r in connected_components(
                edges, small_graph_threshold=thr
            ).collect()
        }
        assert cc == want, thr
    keep = {r.id: r.keep for r in dedup_keep_list(edges).collect()}
    assert {i for i, k in keep.items() if k} == {1, 10, 20}


def test_graph_reliable_checkpoint_mode_bit_identical(spark, tmp_path):
    """VERDICT r13 item 3: the iterative graph operators take an opt-in
    ``checkpoint_dir`` that swaps every per-round localCheckpoint() for a
    reliable checkpoint() against that directory — the fault-tolerant
    cluster posture (executor loss under truncated lineage otherwise
    kills the job, since there is no recompute path). Both modes must be
    bit-identical for connected components (distributed loop forced) AND
    PageRank (both dangling modes), and the reliable run must actually
    write RDD checkpoint state under the given dir."""
    from scraping_jobsdb_spark.operators.graph import (
        connected_components,
        pagerank,
    )

    ckpt = str(tmp_path / "reliable_ckpt")
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12), (20, 21)],
        "id_a bigint, id_b bigint",
    )
    local_cc = sorted(
        (r.id, r.component)
        for r in connected_components(edges, small_graph_threshold=0).collect()
    )
    reliable_cc = sorted(
        (r.id, r.component)
        for r in connected_components(
            edges, small_graph_threshold=0, checkpoint_dir=ckpt
        ).collect()
    )
    assert local_cc == reliable_cc

    pr_edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (1, 3), (4, 1), (3, 5)],
        "src bigint, dst bigint",
    )
    for mode in ("leak", "redistribute"):
        local_pr = sorted(
            (r.node, r.rank)
            for r in pagerank(pr_edges, iterations=5, dangling=mode).collect()
        )
        reliable_pr = sorted(
            (r.node, r.rank)
            for r in pagerank(
                pr_edges, iterations=5, dangling=mode, checkpoint_dir=ckpt
            ).collect()
        )
        assert local_pr == reliable_pr, mode

    # the reliable dir really holds checkpointed RDD state
    import os

    assert any(files for _, _, files in os.walk(ckpt))


def test_connected_components_nonconvergence_raises(spark):
    from scraping_jobsdb_spark.operators.graph import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "id_a bigint, id_b bigint"
    )
    try:
        connected_components(chain, max_iter=2, small_graph_threshold=0)
    except RuntimeError as e:
        assert "converge" in str(e)
    else:  # pragma: no cover
        raise AssertionError("diameter-12 chain cannot converge in 2 rounds")


def test_pagerank_integer_exact_known_graph(spark):
    """5-iteration integer PageRank on a hand-checkable graph: values match
    the independently-computed pure-Python fixed point of the same scaled
    arithmetic; a dangling node (no in-edges) sits at the bare teleport
    base; result is identical across repartitionings (the whole point of
    the integer formulation)."""
    from scraping_jobsdb_spark.operators.graph import pagerank

    edges = [(1, 2), (2, 3), (3, 1), (1, 3), (4, 1)]
    e = spark.createDataFrame(edges, "src bigint, dst bigint")

    # pure-Python reference of the exact same integer recurrence
    nodes = sorted({u for p in edges for u in p})
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    rank = {n: 1_000_000 for n in nodes}
    for _ in range(5):
        contrib = {n: 0 for n in nodes}
        for s, d in edges:
            contrib[d] += rank[s] // out[s]
        rank = {n: (150 * 1_000_000 + 850 * contrib[n]) // 1000 for n in nodes}

    got = {r.node: r.rank for r in pagerank(e, iterations=5).collect()}
    assert got == rank
    assert got[4] == 150_000  # dangling-in node: bare teleport mass
    got_repart = {
        r.node: r.rank
        for r in pagerank(e.repartition(7), iterations=5).collect()
    }
    assert got_repart == rank  # partitioning-independent (integer-exact)


def test_pagerank_zero_iterations_and_validation(spark):
    from scraping_jobsdb_spark.operators.graph import pagerank

    e = spark.createDataFrame([(1, 2)], "src bigint, dst bigint")
    got = sorted(map(tuple, pagerank(e, iterations=0).collect()))
    assert got == [(1, 1_000_000), (2, 1_000_000)]  # init vector untouched
    import pytest as _pytest

    with _pytest.raises(ValueError):
        pagerank(e, iterations=-1)
    with _pytest.raises(ValueError):
        pagerank(e, damping_milli=1500)
    with _pytest.raises(ValueError):
        pagerank(e, dangling="teleport")


def test_pagerank_dangling_redistribute_matches_standard(spark):
    """dangling="redistribute" on a SINK graph matches the standard
    (textbook/NetworkX) formulation: the danglers' damped mass is shared
    uniformly each iteration. Checked against a float power iteration of
    the same update; mass is conserved (the leaky default loses it); the
    result stays repartition-independent (integer-exact)."""
    from scraping_jobsdb_spark.operators.graph import pagerank

    # node 4 is a SINK (receives from 1 and 3, emits nothing)
    edges = [(1, 2), (2, 3), (3, 1), (1, 4), (3, 4)]
    e = spark.createDataFrame(edges, "src bigint, dst bigint")
    nodes = sorted({u for p in edges for u in p})
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1

    # float reference of the standard redistribute update, same start/iters
    iters, d = 8, 0.85
    fr = {n: 1.0 for n in nodes}
    for _ in range(iters):
        contrib = {n: 0.0 for n in nodes}
        for s, t in edges:
            contrib[t] += fr[s] / out[s]
        dm = sum(fr[n] for n in nodes if n not in out)
        fr = {
            n: (1 - d) + d * (contrib[n] + dm / len(nodes)) for n in nodes
        }

    got = {
        r.node: r.rank
        for r in pagerank(e, iterations=iters, dangling="redistribute").collect()
    }
    for n in nodes:
        assert abs(got[n] / 1_000_000 - fr[n]) < 5e-3, (n, got[n], fr[n])
    # mass conserved within truncation (leak default loses the sink's 85%)
    assert abs(sum(got.values()) / 1_000_000 - len(nodes)) < 0.01
    leaky = {
        r.node: r.rank for r in pagerank(e, iterations=iters).collect()
    }
    assert sum(leaky.values()) < sum(got.values())
    # repartition-independence still holds (integer-exact global scalar)
    got_rp = {
        r.node: r.rank
        for r in pagerank(
            e.repartition(7), iterations=iters, dangling="redistribute"
        ).collect()
    }
    assert got_rp == got


def test_asof_join_edge_semantics(spark):
    from datetime import datetime

    from scraping_jobsdb_spark.operators.temporal import asof_join

    t = lambda s: datetime.fromisoformat(f"2024-01-01 {s}")
    left = spark.createDataFrame(
        [(1, t("10:00:00"), "a"), (1, t("10:05:00"), "b"), (2, t("09:00:00"), "c")],
        "user_id bigint, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, t("10:00:00"), 100.0), (1, t("10:04:00"), 200.0), (2, t("09:30:00"), 5.0)],
        "user_id bigint, ts timestamp, value double",
    )
    out = {
        (r.user_id, r.tag): r.asof_value
        for r in asof_join(left, right, "user_id", "ts", "ts", ["value"]).collect()
    }
    assert out[(1, "a")] == 100.0  # exactly-simultaneous right row IS visible
    assert out[(1, "b")] == 200.0  # latest preceding wins
    assert out[(2, "c")] is None   # nothing at-or-before -> NULL


def test_asof_join_forward_and_tolerance(spark):
    """direction='forward' picks the earliest at-or-after right row;
    tolerance_seconds nulls out matches further than the bound (in either
    direction); invalid direction raises."""
    from datetime import datetime

    import pytest

    from scraping_jobsdb_spark.operators.temporal import asof_join

    t = lambda s: datetime.fromisoformat(f"2024-01-01 {s}")
    left = spark.createDataFrame(
        [(1, t("10:00:00"), "a"), (1, t("10:05:00"), "b"), (2, t("09:00:00"), "c")],
        "user_id bigint, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, t("10:00:00"), 100.0), (1, t("10:04:00"), 200.0), (2, t("08:30:00"), 5.0)],
        "user_id bigint, ts timestamp, value double",
    )
    fwd = {
        (r.user_id, r.tag): r.asof_value
        for r in asof_join(
            left, right, "user_id", "ts", "ts", ["value"], direction="forward"
        ).collect()
    }
    assert fwd[(1, "a")] == 100.0  # simultaneous right row visible forward too
    assert fwd[(1, "b")] is None   # nothing at-or-after
    assert fwd[(2, "c")] is None   # right row is BEFORE: not a forward match
    # tolerance: the 10:05 left row's backward match (10:04) is 60s old —
    # inside a 90s bound, outside a 30s bound
    tol = lambda s: {
        (r.user_id, r.tag): r.asof_value
        for r in asof_join(
            left, right, "user_id", "ts", "ts", ["value"], tolerance_seconds=s
        ).collect()
    }
    assert tol(90)[(1, "b")] == 200.0
    assert tol(30)[(1, "b")] is None
    assert tol(90)[(1, "a")] == 100.0  # zero-age match always within tolerance
    with pytest.raises(ValueError):
        asof_join(left, right, "user_id", "ts", "ts", ["value"], direction="nearest")


def test_range_join_bounds_inclusive_exclusive(spark):
    from datetime import datetime

    from scraping_jobsdb_spark.operators.temporal import range_join

    t = lambda s: datetime.fromisoformat(f"2024-01-01 {s}")
    ev = spark.createDataFrame(
        [(1, t("10:00:00")), (1, t("10:00:01")), (1, t("10:05:00")),
         (1, t("10:05:01")), (2, t("10:00:00"))],
        "user_id bigint, ts timestamp",
    )
    got = {
        (r.left_ts.isoformat(), r.right_ts.isoformat())
        for r in range_join(ev, ev, "user_id", "ts", "ts", 1, 300).collect()
    }
    # self-pair excluded (lower bound 1s), exactly +300s included,
    # +301s excluded, cross-user never paired
    assert ("2024-01-01T10:00:00", "2024-01-01T10:00:01") in got
    assert ("2024-01-01T10:00:00", "2024-01-01T10:05:00") in got
    assert ("2024-01-01T10:00:01", "2024-01-01T10:05:01") in got
    assert ("2024-01-01T10:00:00", "2024-01-01T10:00:00") not in got
    assert ("2024-01-01T10:00:00", "2024-01-01T10:05:01") not in got


def test_scd2_merge_versions(spark):
    from datetime import datetime

    from scraping_jobsdb_spark.operators.merge import scd2_merge

    t = lambda s: datetime.fromisoformat(f"2024-01-0{s}")
    current = spark.createDataFrame(
        [
            # key 1: one closed + one open version
            (1, "a", t("1 00:00:00"), t("2 00:00:00"), False),
            (1, "b", t("2 00:00:00"), None, True),
            # key 2: open, value will NOT change
            (2, "x", t("1 00:00:00"), None, True),
            # key 3: open, value WILL change
            (3, "p", t("1 00:00:00"), None, True),
        ],
        "k bigint, v string, valid_from timestamp, valid_to timestamp, is_current boolean",
    )
    incoming = spark.createDataFrame(
        [
            (2, "x", t("5 00:00:00")),   # unchanged -> no new version
            (3, "q", t("5 00:00:00")),   # changed -> close + insert
            (4, "new", t("5 00:00:00")),  # new key -> insert
        ],
        "k bigint, v string, valid_from timestamp",
    )
    out = scd2_merge(
        current, incoming, ["k"], ["v"], "valid_from"
    )
    rows = {(r.k, r.v, r.is_current): r for r in out.collect()}
    assert len(rows) == 6  # 4 original + 1 close-replacement + ... wait: 4 kept + 2 inserts
    # key 1 untouched (no incoming)
    assert (1, "a", False) in rows and (1, "b", True) in rows
    # key 2 unchanged: still one open row, no new version
    assert (2, "x", True) in rows
    assert sum(1 for (k, _, _) in rows if k == 2) == 1
    # key 3: old version closed at the incoming effective ts, new open version
    assert (3, "p", False) in rows
    assert rows[(3, "p", False)].valid_to == t("5 00:00:00")
    assert (3, "q", True) in rows
    # key 4: fresh insert, open
    assert (4, "new", True) in rows and rows[(4, "new", True)].valid_to is None


def test_dedup_exact_no_boundary_or_null_collisions(spark):
    from scraping_jobsdb_spark.operators.dedup import dedup_exact

    df = spark.createDataFrame(
        [
            (1, "ab", "c"),     # boundary-shift pair: must NOT collide
            (2, "a", "bc"),
            (3, "a", None),     # NULL vs empty: must NOT collide
            (4, "a", ""),
            (5, None, "a"),     # NULL position matters
            (6, "a", None),     # true duplicate of 3 -> dropped
        ],
        "id bigint, x string, y string",
    )
    kept = {r.id for r in dedup_exact(df, ["x", "y"], "id").collect()}
    assert kept == {1, 2, 3, 4, 5}


def test_salted_join_rejects_outer(spark):
    o = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, SF_SMOKE, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    for how in ("right", "full", "outer"):
        try:
            salted_join(o, c, ["o_custkey"], how=how)
        except ValueError as e:
            assert "salted_join" in str(e)
        else:  # pragma: no cover
            raise AssertionError(f"{how} join must be rejected")


def test_salted_join_semi_anti_equal_plain(spark):
    o = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_custkey")
    tiny = (
        load_table(spark, SF_SMOKE, "customer")
        .filter(F.col("c_custkey") % 7 == 0)
        .select(F.col("c_custkey").alias("o_custkey"))
    )
    for how in ("semi", "anti"):
        salted = salted_join(o, tiny, ["o_custkey"], n_salts=4, how=how)
        plain = o.join(tiny, "o_custkey", how)
        assert _rows(salted) == _rows(plain)


def test_salted_join_default_salt_spreads_hot_key(spark):
    # One hot key repeated 400x: the default (row-varying) salt must spread
    # it over >1 salt value — the regression was a per-key-constant salt.
    hot = spark.range(400).select(
        F.lit(7).alias("k"), F.col("id").alias("payload")
    )
    dim = spark.createDataFrame([(7, "x")], "k bigint, v string")
    joined = salted_join(hot, dim, ["k"], n_salts=8)
    assert joined.count() == 400
    n_salts_used = (
        hot.withColumn(
            "__salt",
            F.pmod(F.xxhash64(F.xxhash64(*[F.col(c) for c in hot.columns])), F.lit(8)),
        )
        .select("__salt")
        .distinct()
        .count()
    )
    assert n_salts_used > 1


def test_asof_join_equal_ts_tiebreak_deterministic(spark):
    from datetime import datetime

    from scraping_jobsdb_spark.operators.temporal import asof_join

    t = datetime.fromisoformat("2024-01-01 10:00:00")
    left = spark.createDataFrame([(1, t, "a")], "k bigint, ts timestamp, tag string")
    # three right rows at the SAME (key, ts): greatest tiebreak wins
    right = spark.createDataFrame(
        [(1, t, 30.0), (1, t, 10.0), (1, t, 20.0)],
        "k bigint, ts timestamp, value double",
    )
    for _ in range(3):
        out = asof_join(left, right, "k", "ts", "ts", ["value"]).collect()
        assert len(out) == 1 and out[0].asof_value == 30.0


def test_connected_components_deep_path_converges_logarithmically(spark):
    """A 400-node path (diameter 399) far exceeds a 25-round one-hop budget;
    pointer jumping must close it in O(log d) rounds. Also cross-checks the
    labels against a driver-side union-find on a random graph."""
    import random

    from scraping_jobsdb_spark.operators.graph import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(399)], "id_a bigint, id_b bigint"
    )
    cc = {
        r.id: r.component
        for r in connected_components(chain, small_graph_threshold=0).collect()
    }
    assert set(cc.values()) == {0} and len(cc) == 400

    rng = random.Random(7)
    edges = [(rng.randrange(300), rng.randrange(300)) for _ in range(260)]
    edges = [(a, b) for a, b in edges if a != b]
    got = {
        r.id: r.component
        for r in connected_components(
            spark.createDataFrame(edges, "id_a bigint, id_b bigint"),
            small_graph_threshold=0,
        ).collect()
    }

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in parent}
    assert got == want


def test_stratified_exact_sample_counts_and_determinism(spark):
    from scraping_jobsdb_spark.operators.sampling import stratified_exact_sample

    rows = [(i, "ab"[i % 2], i * 10) for i in range(100)] + [(1000, "c", 5)]
    df = spark.createDataFrame(rows, "id bigint, grp string, x bigint")
    got = stratified_exact_sample(df, ["grp"], "id", 7)
    by_grp = {
        r.grp: r.n for r in got.groupBy("grp").agg(F.count("*").alias("n")).collect()
    }
    # exactly k per stratum, capped at stratum size
    assert by_grp == {"a": 7, "b": 7, "c": 1}
    # deterministic: same selection on re-run and under different partitioning
    a = sorted(r.id for r in got.collect())
    b = sorted(
        r.id
        for r in stratified_exact_sample(df.repartition(13), ["grp"], "id", 7).collect()
    )
    assert a == b


def test_hash_fraction_sample_is_stable_membership(spark):
    from scraping_jobsdb_spark.operators.sampling import hash_fraction_sample

    df = spark.createDataFrame([(i,) for i in range(2000)], "id bigint")
    picked = sorted(r.id for r in hash_fraction_sample(df, "id", 0.25).collect())
    # roughly the asked fraction (hash-uniform; generous bounds)
    assert 0.18 * 2000 < len(picked) < 0.32 * 2000
    # growing the table never changes prior membership
    bigger = spark.createDataFrame([(i,) for i in range(3000)], "id bigint")
    picked2 = {r.id for r in hash_fraction_sample(bigger, "id", 0.25).collect()}
    assert set(picked) == {i for i in picked2 if i < 2000}
    import pytest

    with pytest.raises(ValueError):
        hash_fraction_sample(df, "id", 1.5)


def test_token_budget_sample_respects_budget_and_order(spark):
    """Per stratum: kept weights sum <= budget; the kept set is the prefix
    of the deterministic md5 order (no cherry-picking); repeat runs agree;
    a row heavier than the budget is never selected."""
    from pyspark.sql import functions as F

    from scraping_jobsdb_spark.operators.sampling import token_budget_sample

    rows = [(i, "en" if i % 2 else "de", 10 + (i * 7) % 50) for i in range(200)]
    rows.append((999, "en", 10_000))  # heavier than any budget we use
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, w bigint")
    out = token_budget_sample(df, ["lang"], "doc_id", "w", budget=300)
    got = out.groupBy("lang").agg(F.sum("w").alias("s")).collect()
    assert got and all(r.s <= 300 for r in got)
    assert out.filter(F.col("doc_id") == 999).count() == 0
    # prefix property: every kept row's running position precedes every
    # dropped row's within the same stratum order
    kept = {(r.lang, r.doc_id) for r in out.collect()}
    ordered = df.select(
        "lang", "doc_id", "w",
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    ).collect()
    by_lang = {}
    for r in sorted(ordered, key=lambda r: (r.lang, r.h, r.doc_id)):
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        running = 0
        for r in rs:
            running += r.w
            assert ((lang, r.doc_id) in kept) == (running <= 300), (lang, r.doc_id)
    # determinism across invocations
    again = {(r.lang, r.doc_id) for r in
             token_budget_sample(df, ["lang"], "doc_id", "w", 300).collect()}
    assert again == kept


# ----------------------------------------------------- count-min sketches


def test_cms_never_underestimates(spark):
    """The CMS contract: every point estimate >= the true count (collisions
    only ADD). Probed for every distinct term in the corpus."""
    from scraping_jobsdb_spark.operators.sketches import cms_build, cms_estimate

    docs = load_table(spark, SF_SMOKE, "documents").filter(F.col("text").isNotNull())
    terms = docs.select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("term")
    )
    exact = {r["term"]: r["n"] for r in
             terms.groupBy("term").agg(F.count(F.lit(1)).alias("n")).collect()}
    sketch = cms_build(terms, "term", width=64, depth=3)
    probes = terms.select("term").distinct()
    est = {r["term"]: r["est_n"] for r in
           cms_estimate(sketch, probes, "term", width=64, depth=3).collect()}
    assert set(est) == set(exact)
    assert all(est[t] >= exact[t] for t in exact), {
        t: (est[t], exact[t]) for t in exact if est[t] < exact[t]
    }


def test_cms_merge_equals_single_shot(spark):
    """Counters are linear: the merge of per-shard sketches is CELL-IDENTICAL
    to the sketch of the union — the roll-up law that lets per-day sketches
    aggregate without rescanning data."""
    from scraping_jobsdb_spark.operators.sketches import cms_build, cms_merge

    docs = load_table(spark, SF_SMOKE, "documents").filter(F.col("text").isNotNull())
    terms = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("term")
    )
    whole = cms_build(terms, "term", width=64, depth=3)
    merged = cms_merge(
        cms_build(terms.filter(F.col("doc_id") % 2 == 0), "term", width=64, depth=3),
        cms_build(terms.filter(F.col("doc_id") % 2 == 1), "term", width=64, depth=3),
    )
    assert _rows(whole) == _rows(merged)


def test_cms_weighted_build_equals_row_level(spark):
    """Building from (value, weight) pre-aggregates must equal building from
    raw rows — the two ingestion shapes a pipeline actually has."""
    from scraping_jobsdb_spark.operators.sketches import cms_build

    docs = load_table(spark, SF_SMOKE, "documents").filter(F.col("text").isNotNull())
    terms = docs.select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("term")
    )
    raw = cms_build(terms, "term", width=64, depth=3)
    pre = terms.groupBy("term").agg(F.count(F.lit(1)).alias("w"))
    weighted = cms_build(pre, "term", width=64, depth=3, weight_col="w")
    assert _rows(raw) == _rows(weighted)


def test_weighted_priority_sample_biases_toward_weight(spark):
    """A-ES correctness signal: the length-weighted sample's mean length
    must exceed the corpus mean (heavier rows win more often), the sample
    is exactly k, and a re-run picks the identical set."""
    from scraping_jobsdb_spark.operators.sampling import weighted_priority_sample

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "n_chars")
    s1 = weighted_priority_sample(docs, "doc_id", "n_chars", k=50)
    rows = s1.collect()
    assert len(rows) == 50
    sample_mean = sum(r["n_chars"] for r in rows) / len(rows)
    corpus_mean = docs.agg(F.avg("n_chars")).first()[0]
    assert sample_mean > corpus_mean
    s2 = weighted_priority_sample(docs, "doc_id", "n_chars", k=50)
    assert _rows(s1) == _rows(s2)


def test_leakage_safe_split_never_straddles_clusters(spark):
    """The no-leakage invariant: every near-dup cluster lands wholly in one
    split — in particular every injected near-copy (d, d+10000) shares its
    original's split — and the union of splits is exactly the corpus."""
    from scraping_jobsdb_spark.operators.sampling import leakage_safe_split
    from scraping_jobsdb_spark.operators.textops import (
        fingerprint_containment_pairs,
    )

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    near = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.regexp_replace("text", r"\s+\S+$", "").alias("text"),
    )
    corpus = docs.unionByName(near)
    pairs = fingerprint_containment_pairs(
        corpus, threshold_milli=800, k=8, w=4, max_df=50
    )
    tagged = leakage_safe_split(corpus, pairs)
    assert tagged.count() == corpus.count()
    straddling = (
        tagged.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("n_splits"))
        .filter(F.col("n_splits") > 1)
        .count()
    )
    assert straddling == 0
    split_of = {r["doc_id"]: r["split"] for r in tagged.collect()}
    linked = {r["id_a"] for r in pairs.collect()} | {
        r["id_b"] for r in pairs.collect()
    }
    injected_linked = [d for d in linked if d >= 10000]
    assert injected_linked, "expected injected near-copies to pair up"
    for d in injected_linked:
        assert split_of[d] == split_of[d - 10000]


def test_dedup_segments_global_first_occurrence_semantics(spark):
    from scraping_jobsdb_spark.operators.textops import dedup_segments_global

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),       # both segments globally first
            (2, "a b c x y z"),       # first segment duplicates doc 1's
            (3, "a b c d e f"),       # fully duplicated -> vanishes
        ],
        "doc_id bigint, text string",
    )
    out = {
        r.doc_id: (r.text_dedup, r.n_segments_kept)
        for r in dedup_segments_global(docs, segment_words=3).collect()
    }
    assert out == {1: ("a b c d e f", 2), 2: ("x y z", 1)}


def test_top_fraction_per_group_ceil_and_tiebreak(spark):
    from scraping_jobsdb_spark.operators.sampling import top_fraction_per_group

    df = spark.createDataFrame(
        [
            ("g1", 1, 5.0), ("g1", 2, 4.0), ("g1", 3, 3.0), ("g1", 4, 2.0),
            ("g2", 5, 1.0),                       # singleton group survives
            ("g3", 6, 7.0), ("g3", 7, 7.0), ("g3", 8, 7.0),  # all tied
        ],
        "g string, id bigint, score double",
    )
    kept = top_fraction_per_group(df, ["g"], F.col("score"), 0.5, ["id"])
    got = sorted((r.g, r.id, r.rank_in_group) for r in kept.collect())
    # g1: ceil(4*.5)=2 -> ids 1,2; g2: ceil(1*.5)=1 -> id 5;
    # g3: ceil(3*.5)=2 -> tie broken by id asc -> ids 6,7
    assert got == [
        ("g1", 1, 1), ("g1", 2, 2), ("g2", 5, 1), ("g3", 6, 1), ("g3", 7, 2),
    ]


def test_incremental_containment_filter_verdicts(spark):
    from scraping_jobsdb_spark.operators.textops import (
        incremental_containment_filter,
    )

    base = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "violet engines hum beneath the winter bridge at dawn"
    )
    other = (
        "completely different subject matter entirely about submarine "
        "navigation protocols and deep ocean current measurement systems"
    )
    corpus = spark.createDataFrame(
        [(1, base), (2, other)], "doc_id bigint, text string"
    )
    batch = spark.createDataFrame(
        [
            (10, base.rsplit(" ", 1)[0]),  # near-dup of doc 1 (last word cut)
            (11, "unrelated fresh text about alpine meadow irrigation "
                 "ditches and terraced barley fields above the treeline"),
        ],
        "doc_id bigint, text string",
    )
    out = {
        r.doc_id: (r.kept, r.n_dup_of)
        for r in incremental_containment_filter(batch, corpus).collect()
    }
    assert out[10] == (False, 1)
    assert out[11] == (True, 0)
    # every batch doc gets exactly one verdict row
    assert set(out) == {10, 11}


def test_dedup_keep_best_argmax_and_ties(spark):
    from scraping_jobsdb_spark.operators.graph import dedup_keep_best

    # two clusters: {1,2,3} (chain), {10,11}; 4 unpaired (absent)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a bigint, id_b bigint"
    )
    scores = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.9), (10, 0.5), (11, 0.5), (4, 1.0)],
        "doc_id bigint, q double",
    )
    out = {
        r.id: (r.component, r.q, r.keep)
        for r in dedup_keep_best(edges, scores, score_col="q").collect()
    }
    # cluster {1,2,3}: 2 and 3 tie at 0.9 -> smaller id 2 kept
    assert out[2] == (1, 0.9, True)
    assert out[1][2] is False and out[3][2] is False
    # cluster {10,11}: tie -> 10 kept
    assert out[10] == (10, 0.5, True) and out[11][2] is False
    # unpaired doc never appears
    assert 4 not in out


def test_hll_merge_law_and_accuracy(spark):
    from scraping_jobsdb_spark.operators.sketches import (
        hll_build,
        hll_estimate,
        hll_merge,
    )

    df = spark.range(20000).selectExpr("id AS v")
    whole = hll_build(df, "v", p=8)
    # merge law: per-shard sketches union-max to the whole-data sketch
    shards = [hll_build(df.filter(f"v % 4 = {i}"), "v", p=8) for i in range(4)]
    merged = {(r.bucket, r.rho) for r in hll_merge(*shards).collect()}
    assert merged == {(r.bucket, r.rho) for r in whole.collect()}
    # raw-estimate accuracy: well within 5x the 1.04/sqrt(256) ~ 6.5% bound
    est = hll_estimate(whole, p=8).collect()[0].est_distinct
    assert abs(est - 20000) / 20000 < 0.2
    # small-range: linear counting keeps tiny cardinalities sane
    small = spark.range(30).selectExpr("id AS v")
    est_s = hll_estimate(hll_build(small, "v", p=8), p=8).collect()[0]
    assert est_s.n_zero_buckets > 0
    assert abs(est_s.est_distinct - 30) / 30 < 0.35
    # determinism: rebuilding yields the identical register table
    again = {(r.bucket, r.rho) for r in hll_build(df, "v", p=8).collect()}
    assert again == {(r.bucket, r.rho) for r in whole.collect()}


def test_kmv_merge_law_intersection_and_exact_small(spark):
    from scraping_jobsdb_spark.operators.sketches import (
        kmv_build,
        kmv_estimate,
        kmv_intersection_estimate,
        kmv_merge,
    )

    df = spark.range(10000).selectExpr("id AS v")
    whole = kmv_build(df, "v", k=64)
    a = kmv_build(df.filter("v < 6000"), "v", k=64)
    b = kmv_build(df.filter("v >= 4000"), "v", k=64)
    # merge law: pooled minima == whole-data sketch
    assert {r.v for r in kmv_merge(64, a, b).collect()} == {
        r.v for r in whole.collect()
    }
    # estimate within ~4x the 1/sqrt(64) = 12.5% std error
    est = kmv_estimate(whole, 64).collect()[0].est_distinct
    assert abs(est - 10000) / 10000 < 0.5
    # below k the sketch IS the distinct set: estimate exact
    small = kmv_build(spark.range(30).selectExpr("id AS v"), "v", k=64)
    assert kmv_estimate(small, 64).collect()[0].est_distinct == 30.0
    # intersection: true 2000 of 10000; loose bound (theta variance at k=64)
    r = kmv_intersection_estimate(a, b, 64).collect()[0]
    assert r.rho > 0
    assert 0 < r.est_intersection < 10000
    # disjoint sets -> rho 0, estimate 0
    c = kmv_build(spark.range(20000, 30000).selectExpr("id AS v"), "v", k=64)
    r2 = kmv_intersection_estimate(a, c, 64).collect()[0]
    assert r2.rho == 0 and r2.est_intersection == 0.0


def test_mixture_token_budget_sample_proportions_and_exclusion(spark):
    """Per-stratum budgets follow the target mixture (floor(total * frac));
    strata absent from the mixture are dropped entirely; kept sets are the
    deterministic md5-order prefix (same contract as token_budget_sample)."""
    from pyspark.sql import functions as F

    from scraping_jobsdb_spark.operators.sampling import (
        mixture_token_budget_sample,
        token_budget_sample,
    )

    rows = [(i, ["en", "de", "xx"][i % 3], 10 + (i * 7) % 50) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, w bigint")
    out = mixture_token_budget_sample(
        df, "lang", "doc_id", "w", total_budget=1000, mixture={"en": 0.7, "de": 0.3}
    )
    sums = {r.lang: r.s for r in out.groupBy("lang").agg(F.sum("w").alias("s")).collect()}
    assert set(sums) == {"en", "de"}  # 'xx' excluded: no budget
    assert sums["en"] <= 700 and sums["de"] <= 300
    # equivalence: each stratum behaves exactly like token_budget_sample at
    # its derived budget
    for lang, budget in (("en", 700), ("de", 300)):
        expect = {
            r.doc_id
            for r in token_budget_sample(
                df.filter(F.col("lang") == lang), ["lang"], "doc_id", "w", budget
            ).collect()
        }
        got = {r.doc_id for r in out.filter(F.col("lang") == lang).collect()}
        assert got == expect, lang
    # validation
    import pytest

    with pytest.raises(ValueError):
        mixture_token_budget_sample(df, "lang", "doc_id", "w", 100, {})
    with pytest.raises(ValueError):
        mixture_token_budget_sample(df, "lang", "doc_id", "w", 100, {"en": -0.1})


def test_gopher_quality_flags_rules_are_integer_exact(spark):
    """Each rule flips on the documented boundary; keep is the conjunction;
    stats are integers (no doubles cross the gate)."""
    from scraping_jobsdb_spark.operators.textops import gopher_quality_flags

    good = " ".join(["word"] * 60) + " the of and that"  # 64 words, stops
    short = "the of tiny"  # word count < 50
    symbols = " ".join(["word##"] * 60) + " the of"  # '#' ratio > 0.1
    bullets = "\n".join(f"- item {i} the of" for i in range(10))  # 100% bullet lines
    ellipsis = "\n".join(f"line {i} the of..." for i in range(10))  # 100% '...' lines
    nostop = " ".join(f"w{i}" for i in range(60))  # no Gopher stopwords
    df = spark.createDataFrame(
        [
            (1, good),
            (2, short),
            (3, symbols),
            (4, bullets),
            (5, ellipsis),
            (6, nostop),
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in gopher_quality_flags(df).collect()}
    assert out[1].keep
    assert not out[2].flag_word_count and not out[2].keep
    assert not out[3].flag_symbol_ratio and out[3].n_symbols == 120
    assert not out[4].flag_bullet_lines
    assert not out[5].flag_ellipsis_lines and out[5].n_ellipsis_lines == 10
    assert not out[6].flag_stopwords and out[6].n_stopwords_present == 0
    # integer/boolean schema only
    kinds = {f.dataType.simpleString() for f in gopher_quality_flags(df).schema.fields}
    assert kinds <= {"bigint", "boolean"}


def test_gap_fill_carries_values_and_bounds(spark):
    """Every day between a key's first and last observation appears exactly
    once; values carry forward until the next observation; no fill past the
    last observation; single-observation keys emit one row."""
    from datetime import date

    from scraping_jobsdb_spark.operators.temporal import gap_fill

    df = spark.createDataFrame(
        [
            (1, date(2024, 1, 1), 10.0),
            (1, date(2024, 1, 4), 40.0),
            (1, date(2024, 1, 5), 50.0),
            (2, date(2024, 2, 1), 7.0),
        ],
        "k bigint, d date, v double",
    )
    out = sorted(
        (r.k, str(r.d), r.v, r.is_observed)
        for r in gap_fill(df, ["k"], "d", ["v"]).collect()
    )
    assert out == [
        (1, "2024-01-01", 10.0, True),
        (1, "2024-01-02", 10.0, False),
        (1, "2024-01-03", 10.0, False),
        (1, "2024-01-04", 40.0, True),
        (1, "2024-01-05", 50.0, True),
        (2, "2024-02-01", 7.0, True),
    ]


def test_fuzzy_string_join_blocking_and_refine(spark):
    """Emitted pairs satisfy the exact levenshtein bound; a within-distance
    pair sharing no 3-gram is NOT a candidate (blocking contract); max_df
    drops stop-gram-only candidates; two-table mode emits cross-side pairs."""
    from scraping_jobsdb_spark.operators.similarity import fuzzy_string_join

    df = spark.createDataFrame(
        [(1, "alpha-01"), (2, "alpha-02"), (3, "alpha-99"), (4, "zzz")],
        "id bigint, name string",
    )
    out = {
        (r.id_a, r.id_b): r.distance
        for r in fuzzy_string_join(
            df, df, "id", "name", "id", "name", max_distance=1
        ).collect()
    }
    assert out == {(1, 2): 1}  # 99 is distance 2; zzz shares no gram
    # distance 2 admits the 99 variant
    out2 = {
        (r.id_a, r.id_b)
        for r in fuzzy_string_join(
            df, df, "id", "name", "id", "name", max_distance=2
        ).collect()
    }
    assert out2 == {(1, 2), (1, 3), (2, 3)}
    # max_df=2: grams in all three alpha names ("alp", "lph", ...) drop;
    # surviving grams ("-01" vs "-02") still block the distance-1 pair
    out3 = {
        (r.id_a, r.id_b)
        for r in fuzzy_string_join(
            df, df, "id", "name", "id", "name", max_distance=2, max_df=2
        ).collect()
    }
    assert (1, 2) in out3 and len(out3) < len(out2)
    # two-table: left ids vs right ids, no self-pair suppression by id
    right = spark.createDataFrame([(7, "alpha-01x")], "rid bigint, rname string")
    cross = {
        (r.id_a, r.id_b, r.distance)
        for r in fuzzy_string_join(
            df, right, "id", "name", "rid", "rname", max_distance=1
        ).collect()
    }
    assert (1, 7, 1) in cross


def test_fuzzy_join_two_tables_with_same_column_names(spark):
    """Two DIFFERENT tables sharing column names must emit cross-side pairs
    in both id orders — only object identity triggers self-join dedup."""
    from scraping_jobsdb_spark.operators.similarity import fuzzy_string_join

    a = spark.createDataFrame([(5, "alpha-01")], "id bigint, name string")
    b = spark.createDataFrame([(1, "alpha-02")], "id bigint, name string")
    out = {
        (r.id_a, r.id_b, r.distance)
        for r in fuzzy_string_join(
            a, b, "id", "name", "id", "name", max_distance=1
        ).collect()
    }
    # id_a(5) > id_b(1): a self-join heuristic keyed on column names would
    # have dropped this pair
    assert out == {(5, 1, 1)}


def test_fuzzy_join_cross_table_identical_pair_emits(spark):
    """Cross-table mode must emit the strongest match — a pair whose id AND
    string coincide across two genuinely different tables (shared id space,
    e.g. resolving two snapshots of a vendor list). Distance 0, both sides
    identical; only object identity triggers self-join suppression."""
    from scraping_jobsdb_spark.operators.similarity import fuzzy_string_join

    a = spark.createDataFrame(
        [(1, "acme corp"), (2, "apex ltd")], "id bigint, name string"
    )
    b = spark.createDataFrame(
        [(1, "acme corp"), (3, "acme corpn")], "id bigint, name string"
    )
    out = {
        (r.id_a, r.id_b, r.distance)
        for r in fuzzy_string_join(
            a, b, "id", "name", "id", "name", max_distance=1
        ).collect()
    }
    assert (1, 1, 0) in out  # identical (id, string) cross pair emits
    assert (1, 3, 1) in out


def test_compression_ratio_orders_redundancy(spark):
    """Repetitive text compresses well below prose; high-entropy text
    barely compresses; empty/NULL → NULL; deterministic across runs."""
    import random

    from scraping_jobsdb_spark.operators.textops import compression_ratio

    rng = random.Random(7)
    noisy = "".join(chr(rng.randrange(33, 127)) for _ in range(2000))
    rows = [
        (1, "spam " * 400),                      # templated boilerplate
        (2, "The quick brown fox jumps over the lazy dog. " * 40),
        (3, noisy),                               # near-incompressible
        (4, ""),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "id bigint, text string")
    out = {
        r.id: r.cr
        for r in df.select("id", compression_ratio("text").alias("cr")).collect()
    }
    assert out[1] < 0.05                 # pure repetition
    assert out[1] < out[2] < out[3]      # redundancy ordering
    assert out[3] > 0.8                  # junk barely compresses
    assert out[4] is None and out[5] is None
    again = {
        r.id: r.cr
        for r in df.select("id", compression_ratio("text").alias("cr")).collect()
    }
    assert again == out


def test_asof_join_row_level_null_semantics_and_fractional_tolerance(spark):
    """The nearest right ROW wins even when its value is NULL (merge_asof
    semantics — a staler non-null value must not resurrect), and the
    tolerance uses fractional seconds (a match 0.5s past an N-second bound
    with fractional timestamps nulls out; whole-second truncation would
    have admitted it)."""
    from datetime import datetime

    from scraping_jobsdb_spark.operators.temporal import asof_join

    t = lambda s: datetime.fromisoformat(f"2024-01-01 {s}")
    left = spark.createDataFrame(
        [(1, t("11:00:00"), "a")], "user_id bigint, ts timestamp, tag string"
    )
    right = spark.createDataFrame(
        [(1, t("10:00:00"), 5.0), (1, t("10:59:00"), None)],
        "user_id bigint, ts timestamp, value double",
    )
    out = asof_join(
        left, right, "user_id", "ts", "ts", ["value"], tolerance_seconds=300
    ).collect()
    assert out[0].asof_value is None  # nearest row is NULL-valued: stays NULL
    # fractional tolerance: right at .6s before an exact-second left, bound 1s
    left2 = spark.createDataFrame(
        [(1, t("10:00:01"), "x")], "user_id bigint, ts timestamp, tag string"
    )
    right2 = spark.createDataFrame(
        [(1, t("09:59:59.400000"), 7.0)],
        "user_id bigint, ts timestamp, value double",
    )
    within = asof_join(
        left2, right2, "user_id", "ts", "ts", ["value"], tolerance_seconds=2
    ).collect()[0]
    assert within.asof_value == 7.0  # age 1.6s <= 2
    beyond = asof_join(
        left2, right2, "user_id", "ts", "ts", ["value"], tolerance_seconds=1
    ).collect()[0]
    assert beyond.asof_value is None  # age 1.6s > 1 (truncation would say 1 <= 1)
    # a value column literally named 'ts' no longer collides internally
    named = asof_join(
        left2, right2.select("user_id", "ts", "value"),
        "user_id", "ts", "ts", ["ts", "value"],
    ).collect()[0]
    assert named.asof_value == 7.0 and named.asof_ts == t("09:59:59.400000")


# ------------------------------------------------ persisted fingerprint index


def test_fingerprint_index_probe_equals_self_contained(spark, tmp_path):
    """Probing the persisted index is bit-identical to the self-contained
    incremental_containment_filter against the same corpus — AND two
    successive batches probe the STORED index with zero corpus
    re-fingerprinting: add() folds only the batch delta (append + O(delta)
    DF-view refresh), and the second probe equals the self-contained run
    against corpus ∪ batch1."""
    from scraping_jobsdb_spark.operators.fpindex import FingerprintIndex
    from scraping_jobsdb_spark.operators.textops import (
        incremental_containment_filter,
    )

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch1 = docs.filter(F.col("doc_id") % 5 == 0)
    batch2 = corpus.filter(F.col("doc_id") % 7 == 1).select(
        (F.col("doc_id") + 20000).alias("doc_id"),
        F.regexp_replace("text", r"\s+\S+$", "").alias("text"),
    )

    idx = FingerprintIndex.create(
        spark, str(tmp_path / "idx"), corpus, k=8, w=4, max_df=50
    )
    got1 = sorted(map(tuple, idx.probe(batch1, threshold_milli=800).collect()))
    want1 = sorted(
        map(
            tuple,
            incremental_containment_filter(
                batch1, corpus, threshold_milli=800, k=8, w=4, max_df=50
            ).collect(),
        )
    )
    assert got1 == want1 and len(got1) > 0

    # admit batch1, probe batch2 against the UPDATED index
    v = idx.add(batch1)
    assert v == 2  # one append commit, no rewrite
    got2 = sorted(map(tuple, idx.probe(batch2, threshold_milli=800).collect()))
    want2 = sorted(
        map(
            tuple,
            incremental_containment_filter(
                batch2,
                corpus.unionByName(batch1),
                threshold_milli=800,
                k=8,
                w=4,
                max_df=50,
            ).collect(),
        )
    )
    assert got2 == want2 and len(got2) > 0
    # near-dups of corpus docs are flagged: most batch2 docs are dup_of >= 1
    flagged = sum(1 for r in got2 if r[2] >= 1)
    assert flagged >= len(got2) * 0.8


def test_fingerprint_index_stale_df_view_raises(spark, tmp_path):
    """A probe whose stop-gram view lags the fps table must refuse: writing
    fingerprints around the index API (direct TxnTable.append) leaves the
    DF view stale, and a silently-stale stop-gram list would drift the
    pruned universe between batches."""
    import pytest

    from scraping_jobsdb_spark.operators.fpindex import FingerprintIndex
    from scraping_jobsdb_spark.sources.txn import TxnTable

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    idx = FingerprintIndex.create(
        spark, str(tmp_path / "idx"), docs.filter(F.col("doc_id") < 100)
    )
    # bypass the API: append raw fingerprints without refreshing the view
    TxnTable(spark, idx.fps_path).append(
        spark.createDataFrame([(99999, 12345)], "doc_id bigint, h bigint")
    )
    with pytest.raises(ValueError, match="DF view"):
        idx.probe(docs.filter(F.col("doc_id") < 10))
    # parameters round-trip through the manifest
    reopened = FingerprintIndex(spark, str(tmp_path / "idx"))
    assert (reopened.k, reopened.w, reopened.max_df, reopened.id_col) == (
        8,
        4,
        50,
        "doc_id",
    )


# ------------------------------------------------- cap + sequence packing


def test_cap_per_group_quota_and_determinism(spark):
    """Per-domain quota: groups over the cap keep exactly max_rows rows
    chosen by md5 hash rank (arrival-order-independent), groups at or
    under pass through whole; repeat runs pick the identical set."""
    from scraping_jobsdb_spark.operators.sampling import cap_per_group

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "source")
    capped = cap_per_group(docs, ["source"], "doc_id", 50)
    by_src = {
        r.source: r.n
        for r in capped.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    orig = {
        r.source: r.n
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    for s, n in orig.items():
        assert by_src[s] == min(n, 50), s
    # deterministic: identical set on re-run, and input order cannot matter
    ids1 = {r.doc_id for r in capped.collect()}
    shuffled = cap_per_group(
        docs.orderBy(F.col("doc_id").desc()), ["source"], "doc_id", 50
    )
    assert {r.doc_id for r in shuffled.collect()} == ids1
    import pytest

    with pytest.raises(ValueError, match="max_rows"):
        cap_per_group(docs, ["source"], "doc_id", 0)


def test_pack_sequences_contiguous_and_exact(spark):
    """Sequence packing: pack_start is the exact running token offset in
    md5 order, bins cover [start, end) under integer capacity cuts, docs
    straddle cuts (n_bins > 1), zero-token docs occupy no bin, and the
    total stream length equals the token sum."""
    from scraping_jobsdb_spark.operators.sampling import pack_sequences

    rows = [(i, (i * 37) % 120) for i in range(200)] + [(999, 0)]
    df = spark.createDataFrame(rows, "doc_id bigint, n_tokens bigint")
    out = pack_sequences(df, "doc_id", "n_tokens", capacity=256).collect()
    import hashlib

    order = sorted(out, key=lambda r: (hashlib.md5(str(r.doc_id).encode()).hexdigest(), r.doc_id))
    run = 0
    for r in order:
        assert r.pack_start == run, (r.doc_id, r.pack_start, run)
        run += r.n_tokens
        if r.n_tokens == 0:
            assert r.n_bins == 0
        else:
            assert r.bin_first == r.pack_start // 256
            assert r.bin_last == (r.pack_start + r.n_tokens - 1) // 256
            assert r.n_bins == r.bin_last - r.bin_first + 1
    assert run == sum(n for _, n in rows)
    # some doc must straddle a cut (capacity 256, docs up to 119 tokens)
    assert any(r.n_bins > 1 for r in out)
    # grouped form packs one independent stream per group
    df2 = df.withColumn("lang", (F.col("doc_id") % 2).cast("string"))
    g = pack_sequences(df2, "doc_id", "n_tokens", 256, group_cols=["lang"])
    per_lang_total = {
        r.lang: r.t
        for r in g.groupBy("lang")
        .agg(F.max(F.col("pack_start") + F.col("n_tokens")).alias("t"))
        .collect()
    }
    want = {}
    for i, n in rows:
        want[str(i % 2)] = want.get(str(i % 2), 0) + n
    assert per_lang_total == want


def test_bpe_pair_counts_matches_python_reference(spark):
    """Corpus-weighted adjacent-symbol-pair counts equal a direct Python
    BPE step-1 computation (chars + </w> marker, word-frequency weighted),
    with the deterministic (count desc, pair asc) top-k order."""
    from collections import Counter

    from scraping_jobsdb_spark.operators.textops import bpe_pair_counts

    rows = [
        (1, "low low lower"),
        (2, "lowest low  newer"),
        (3, "newer new\tnew"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    want = Counter()
    words = Counter()
    for _, t in rows:
        for w in t.lower().split():
            words[w] += 1
    for w, wc in words.items():
        syms = list(w) + ["</w>"]
        for a, b in zip(syms, syms[1:]):
            want[f"{a} {b}"] += wc
    got = [(r.pair, r.pair_count) for r in bpe_pair_counts(df, k=1000).collect()]
    assert dict(got) == dict(want)
    # top-k order: count desc, pair asc — and 'lo' ('l o') is the max pair
    ordered = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))
    assert got == ordered
    top3 = [r.pair for r in bpe_pair_counts(df, k=3).collect()]
    assert top3 == [p for p, _ in ordered[:3]]
    import pytest

    with pytest.raises(ValueError, match="k must"):
        bpe_pair_counts(df, k=0)


def test_bpe_train_matches_python_reference_and_step1(spark):
    """Full BPE training equals an independent pure-Python implementation
    of the Sennrich merge loop on the classic low/lower/newest/widest
    corpus; merge 1 equals bpe_pair_counts' top-1 (step-1 consistency);
    merged symbols compose across iterations (multi-char lefts/rights
    appear in later merges); merge count caps at vocabulary exhaustion."""
    from collections import Counter

    from scraping_jobsdb_spark.operators.textops import bpe_pair_counts, bpe_train

    rows = [
        (1, "low low low low low"),
        (2, "lower lower newest newest"),
        (3, "newest newest newest newest widest"),
        (4, "widest widest"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")

    # independent reference
    words = Counter()
    for _, t in rows:
        for w in t.lower().split():
            words[w] += 1
    vocab = {tuple(w) + ("</w>",): c for w, c in words.items()}
    ref = []
    for rank in range(10):
        counts = Counter()
        for syms, wc in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += wc
        (l, r), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        ref.append((rank, l, r, c))
        nv = Counter()
        for syms, wc in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == (l, r):
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nv[tuple(out)] += wc
        vocab = dict(nv)

    got = [
        (r.merge_rank, r.left, r.right, r.pair_count)
        for r in bpe_train(df, n_merges=10).orderBy("merge_rank").collect()
    ]
    assert got == ref
    # step-1 consistency: merge 0 is bpe_pair_counts' top pair
    top1 = bpe_pair_counts(df, k=1).collect()[0]
    assert f"{got[0][1]} {got[0][2]}" == top1.pair
    assert got[0][3] == top1.pair_count
    # compositionality: some later merge consumes a multi-char symbol
    assert any(len(l) > 1 or len(r) > 1 for _, l, r, _ in got[1:])
    import pytest

    with pytest.raises(ValueError, match="n_merges"):
        bpe_train(df, n_merges=0)


def test_bpe_train_incremental_equals_naive_and_scales(spark):
    """bpe_train's incremental pair recount (only words containing the
    just-merged pair are re-counted — VERDICT r6 item 5) must match the
    naive full-recount loop on a REAL corpus (the toy-corpus test can miss
    stale-index bugs that need long tails), and a 1000-merge train must
    complete in bounded time — the regime the full recount made
    impractical."""
    import time

    from scraping_jobsdb_spark.operators.textops import bpe_train, tokens

    docs = load_table(spark, SF_SMOKE, "documents")
    # naive full-recount reference over the SAME Spark-built histogram
    word_rows = (
        docs.select(F.explode(tokens(F.lower(F.col("text")))).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
        .collect()
    )
    vocab = {tuple(r.w) + ("</w>",): r.wc for r in word_rows}
    ref = []
    for rank in range(40):
        counts = {}
        for syms, wc in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + wc
        if not counts:
            break
        (l, r), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        ref.append((rank, l, r, c))
        nv = {}
        for syms, wc in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == (l, r):
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nv[tuple(out)] = nv.get(tuple(out), 0) + wc
        vocab = nv

    got = [
        (r.merge_rank, r.left, r.right, r.pair_count)
        for r in bpe_train(docs, n_merges=40).orderBy("merge_rank").collect()
    ]
    assert got == ref

    # 1000 merges: the driver-side loop (post-histogram) must be bounded —
    # generous wall bound, the full-recount form took minutes here
    t0 = time.perf_counter()
    big = bpe_train(docs, n_merges=1000).orderBy("merge_rank").collect()
    assert time.perf_counter() - t0 < 90
    assert 40 < len(big) <= 1000
    assert [r.merge_rank for r in big] == list(range(len(big)))
    counts_seq = [r.pair_count for r in big]
    assert all(c > 0 for c in counts_seq)

    # greedy min-rank ENCODE under the 1000-merge table == ascending-rank
    # full replay (the regime the greedy algorithm exists for), word-level
    from scraping_jobsdb_spark.operators.textops import bpe_encode

    big_merges = [(r.left, r.right) for r in big]
    sample_words = [r.w for r in word_rows[:25]]
    enc = {
        r.doc_id: list(r.tokens)
        for r in bpe_encode(
            spark.createDataFrame(
                list(enumerate(sample_words)), "doc_id bigint, text string"
            ),
            big_merges,
        ).collect()
    }
    for i, w in enumerate(sample_words):
        syms = list(w) + ["</w>"]
        for l, r in big_merges:
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and (syms[j], syms[j + 1]) == (l, r):
                    out.append(l + r)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            syms = out
        assert enc[i] == syms, (w, enc[i], syms)


def test_bpe_encode_replays_training_and_reassembles(spark):
    """bpe_encode applies the learned merge table: (1) a training-corpus
    word encodes to EXACTLY the symbols training left it with (ascending-
    rank replay == the training rewrite sequence); (2) per-doc token
    arrays reassemble in word order (posexplode → join-back → ordered
    flatten); (3) unseen words encode deterministically with whatever
    merges apply."""
    from scraping_jobsdb_spark.operators.textops import bpe_encode, bpe_train

    rows = [
        (1, "low low low low low"),
        (2, "lower lower newest newest"),
        (3, "newest newest newest newest widest"),
        (4, "widest widest"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    n_merges = 8
    merges = [
        (r.left, r.right)
        for r in bpe_train(df, n_merges=n_merges).orderBy("merge_rank").collect()
    ]
    assert len(merges) == n_merges

    # independent training replay to get each word's final symbol state
    words = {}
    for _, t in rows:
        for w in t.lower().split():
            words[w] = list(w) + ["</w>"]
    for l, r in merges:
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == (l, r):
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out

    got = {
        r.doc_id: (list(r.tokens), r.n_tokens)
        for r in bpe_encode(df, merges).collect()
    }
    for doc_id, text in rows:
        expect = [s for w in text.lower().split() for s in words[w]]
        assert got[doc_id][0] == expect, (doc_id, got[doc_id][0], expect)
        assert got[doc_id][1] == len(expect)

    # unseen word: merges that apply, apply; the rest stays chars
    unseen = spark.createDataFrame([(9, "lowest")], "doc_id bigint, text string")
    syms = list("lowest") + ["</w>"]
    for l, r in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and (syms[i], syms[i + 1]) == (l, r):
                out.append(l + r)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    u = bpe_encode(unseen, merges).collect()[0]
    assert list(u.tokens) == syms and u.n_tokens == len(syms)


def test_epochs_expand_deterministic_and_exact(spark):
    """floor(w) copies always emit; the fractional extra copy follows the
    deterministic md5 draw (re-runs identical); w<=0 emits nothing;
    expected copies tracks the weight over many keys; over-cap raises."""
    import hashlib

    import pytest

    from scraping_jobsdb_spark.operators.sampling import epochs_expand

    rows = [(i, 2.5) for i in range(400)] + [(9001, 0.0), (9002, -1.0), (9003, 3.0)]
    df = spark.createDataFrame(rows, "doc_id bigint, w double")
    out = epochs_expand(df, "doc_id", "w").collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r.doc_id, []).append(r.repeat_idx)
    assert 9001 not in by_key and 9002 not in by_key
    assert sorted(by_key[9003]) == [1, 2, 3]
    # every 2.5-weight key gets 2 or 3 copies, contiguous 1..n
    for i in range(400):
        assert sorted(by_key[i]) in ([1, 2], [1, 2, 3])
    n_extra = sum(1 for i in range(400) if len(by_key[i]) == 3)
    assert 120 <= n_extra <= 280  # ~50% of 400, deterministic but hash-spread
    # decision matches the documented md5 rule exactly
    for i in (0, 7, 123):
        draw = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
        want = 3 if draw < int(0.5 * 2**32) else 2
        assert len(by_key[i]) == want, i
    # identical on re-run
    again = {(r.doc_id, r.repeat_idx) for r in epochs_expand(df, "doc_id", "w").collect()}
    assert again == {(r.doc_id, r.repeat_idx) for r in out}
    # over-cap fails loudly, not by silent truncation
    big = spark.createDataFrame([(1, 1000.0)], "doc_id bigint, w double")
    with pytest.raises(Exception, match="max_repeats"):
        epochs_expand(big, "doc_id", "w", max_repeats=100).collect()


def test_fingerprint_index_maintain_compacts_without_view_recompute(spark, tmp_path):
    """maintain() compacts the fps table past the file threshold; the DF
    view's next refresh SKIPS the row-preserving rewrite (no fallback
    recompute — asserted via the tolerant delta walk) and probe results
    are identical before/after compaction."""
    from scraping_jobsdb_spark.operators.fpindex import FingerprintIndex
    from scraping_jobsdb_spark.sources.txn import TxnTable, append_delta_files

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    idx = FingerprintIndex.create(
        spark, str(tmp_path / "idx"), docs.filter(F.col("doc_id") < 100)
    )
    for lo in (100, 150, 200, 250):
        idx.add(
            docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 50))
        )
    t = TxnTable(spark, idx.fps_path)
    n_before = len(t._manifest()["files"])
    probe = docs.filter(F.col("doc_id") >= 400).limit(30)
    before = sorted(map(tuple, idx.probe(probe).collect()))
    assert idx.maintain(max_files=2) is not None  # past threshold: compacted
    assert len(t._manifest()["files"]) < n_before
    before_after_compact = sorted(map(tuple, idx.probe(probe).collect()))
    assert before_after_compact == before
    # one more add: the view refresh crosses the compact incrementally
    v_compact = t.version()
    idx.add(docs.filter((F.col("doc_id") >= 300) & (F.col("doc_id") < 320)))
    files = append_delta_files(
        idx.fps_path, v_compact - 1, t.version(), skip_row_preserving=True
    )
    assert files  # the walk crosses the compact and sees only the append
    assert idx._df_view.applied_source_version() == t.version()
    # stop-gram view still exactly matches a from-scratch recount
    recount = (
        idx.fingerprints().groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    )
    got = sorted(map(tuple, idx._df_view.read().collect()))
    assert got == sorted(map(tuple, recount.collect()))


def test_bloom_prefilter_join_exact_and_prunes(spark):
    """bloom_prefilter_join is row-identical to the plain join for inner and
    left_semi (no false negatives; false positives die in the real join),
    rejects big-side-preserving join types, and its pre-filter actually
    prunes: the filtered big side is a small fraction of the original when
    the small side's keys are sparse."""
    from scraping_jobsdb_spark.operators.scale import bloom_prefilter_join

    big = spark.range(50_000).selectExpr("id AS k", "id * 2 AS v")
    small = spark.range(300).selectExpr("id * 131 AS k", "id AS s")

    want_inner = sorted(map(tuple, big.join(small, "k", "inner").collect()))
    got_inner = sorted(
        map(tuple, bloom_prefilter_join(big, small, "k", "inner").collect())
    )
    assert got_inner == want_inner and len(got_inner) == 300

    want_semi = sorted(map(tuple, big.join(small, "k", "left_semi").collect()))
    got_semi = sorted(
        map(tuple, bloom_prefilter_join(big, small, "k", "left_semi").collect())
    )
    assert got_semi == want_semi

    # pruning power: replicate the internal filter by counting the semi
    # output of a bloom whose join is identity-free — the filter keeps
    # true keys + false positives only. With 300 keys in 2^20 bits and 4
    # probes, false positives are <<1%: the pre-filter passes a tiny
    # fraction of the 50k big rows. Assert via a no-op small join.
    passed = bloom_prefilter_join(big, small, "k", "left_semi").count()
    assert passed == 300  # exact (join removes any false positive)

    import pytest

    with pytest.raises(ValueError, match="inner/left_semi"):
        bloom_prefilter_join(big, small, "k", "left")
    with pytest.raises(ValueError, match="multiple of 8"):
        bloom_prefilter_join(big, small, "k", bits=1001)


def test_bloom_prefilter_join_string_keys_and_nulls(spark):
    """String keys hash through the same md5 probe construction; NULL keys
    on the big side never pass the filter (SQL join semantics: NULL never
    matches, so dropping them is correct for inner/semi)."""
    from scraping_jobsdb_spark.operators.scale import bloom_prefilter_join

    big = spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3), (None, 4)], "k string, v int"
    )
    small = spark.createDataFrame([("a",), ("c",), ("zz",)], "k string")
    got = sorted(
        (r.k, r.v)
        for r in bloom_prefilter_join(big, small, "k", "left_semi").collect()
    )
    assert got == [("a", 1), ("c", 3)]

    # NULL on the SMALL side must not crash probe collection (md5(NULL) is
    # NULL — ADVICE r6) and must not change the result: NULL never matches
    # an inner/semi join, so the filtered join stays row-identical.
    small_null = spark.createDataFrame([("a",), (None,), ("zz",)], "k string")
    got2 = sorted(
        (r.k, r.v)
        for r in bloom_prefilter_join(big, small_null, "k", "left_semi").collect()
    )
    assert got2 == [("a", 1)]
    # all-NULL small side: empty bitset, empty (not crashed) result
    small_all_null = spark.createDataFrame([(None,), (None,)], "k string")
    assert bloom_prefilter_join(big, small_all_null, "k", "inner").count() == 0


def test_key_skew_report_values(spark):
    """Report values match hand arithmetic on a known distribution, order
    is (n_rows desc, key asc), and validation raises on bad args."""
    from scraping_jobsdb_spark.operators.scale import key_skew_report

    # keys: a=6 rows, b=3, c=1  → total 10, distinct 3, mean 10/3
    rows = [("a",)] * 6 + [("b",)] * 3 + [("c",)]
    df = spark.createDataFrame(rows, "k string")
    got = [
        (r.k, r.n_rows, r.share, r.skew_ratio)
        for r in key_skew_report(df, ["k"], k=10).collect()
    ]
    assert [g[0] for g in got] == ["a", "b", "c"]
    assert [g[1] for g in got] == [6, 3, 1]
    assert got[0][2] == 0.6 and abs(got[0][3] - 1.8) < 1e-12  # 6*3/10
    assert got[2][2] == 0.1 and abs(got[2][3] - 0.3) < 1e-12

    import pytest

    with pytest.raises(ValueError, match="k must"):
        key_skew_report(df, ["k"], k=0)
    with pytest.raises(ValueError, match="non-empty"):
        key_skew_report(df, [], k=5)


def test_normalize_text_unicode_and_controls(spark):
    """normalize_text: decomposed sequences canonicalize to precomposed
    (NFC), C0 controls strip, ASCII whitespace runs collapse, NBSP (unicode
    whitespace) is PRESERVED (the class is pinned ASCII for engine
    portability), NULL passes through, and fingerprints of decomposed vs
    precomposed forms converge after normalization."""
    from scraping_jobsdb_spark.operators.textops import (
        fingerprint,
        normalize_text,
    )

    decomposed = "cafe" + chr(769)          # e + combining acute
    precomposed = "caf" + chr(233)          # é
    rows = [
        (1, "  a\tb\r\nc  "),
        (2, decomposed + chr(7) + " x"),
        (3, precomposed + " x"),
        (4, "a" + chr(160) + "b"),          # NBSP kept (not ASCII ws)
        (5, None),
    ]
    df = spark.createDataFrame(rows, "id bigint, text string")
    out = df.select("id", normalize_text("text").alias("n"))
    got = {r.id: r.n for r in out.collect()}
    assert got[1] == "a b c"
    assert got[2] == got[3] == precomposed + " x"
    assert got[4] == "a" + chr(160) + "b"
    assert got[5] is None

    # the dedup payoff: fingerprints agree only AFTER normalization
    fps = df.filter(F.col("id").isin(2, 3)).select(
        "id",
        fingerprint("text").alias("raw_fp"),
        fingerprint(normalize_text("text")).alias("norm_fp"),
    ).collect()
    by_id = {r.id: r for r in fps}
    assert by_id[2].raw_fp != by_id[3].raw_fp
    assert by_id[2].norm_fp == by_id[3].norm_fp


def test_bigram_surprisal_scores_word_order(spark):
    """The property that justifies the bigram model over unigram stats:
    a document whose words are REORDERED (same unigram histogram) scores
    strictly higher mean bigram surprisal than the natural corpus text it
    came from, while unigram surprisal cannot tell them apart. Also: docs
    with < 2 tokens drop out, and n_bigrams == n_tokens - 1."""
    from scraping_jobsdb_spark.operators.textops import (
        bigram_surprisal,
        unigram_surprisal,
    )

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    # natural corpus + one doc with its words reversed (id 900000)
    target = docs.filter(F.col("doc_id") == 1).select(
        F.lit(900000).cast("bigint").alias("doc_id"),
        F.array_join(F.reverse(F.split(F.trim(F.lower("text")), r"\s+")), " ").alias(
            "text"
        ),
    )
    corpus = docs.unionByName(target).unionByName(
        spark.createDataFrame([(900001, "single")], "doc_id bigint, text string")
    )
    big = {r.doc_id: (r.n_bigrams, r.surprisal_nats) for r in bigram_surprisal(corpus).collect()}
    uni = {r.doc_id: r.surprisal_nats for r in unigram_surprisal(corpus).collect()}

    natural = big[1][1]
    reversed_score = big[900000][1]
    assert reversed_score > natural, (reversed_score, natural)
    # unigram model is order-blind: same tokens => (nearly) same score
    # (identical up to lowercasing differences; doc 1 text is compared
    # against its own lowered reversal)
    assert abs(uni[900000] - uni[1]) < 0.2
    # single-token doc has no bigrams
    assert 900001 not in big
    # n_bigrams = n_tokens - 1 for the synthetic doc
    n_toks = corpus.filter(F.col("doc_id") == 900000).select(
        F.size(F.split(F.trim(F.lower("text")), r"\s+"))
    ).first()[0]
    assert big[900000][0] == n_toks - 1


def test_unigram_seed_candidates_matches_python_reference(spark):
    """The distributed substring-seed aggregate equals a plain Python
    reference over the same corpus (counts weighted by word frequency,
    pieces of length <= max_piece_len, top-k by (count desc, piece))."""
    from scraping_jobsdb_spark.operators.textops import unigram_seed_candidates

    rows = [
        (1, "spark table scan fast"),
        (2, "spark table scan fast fast"),
        (3, "hash join hash join spark"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")

    ref: dict = {}
    words: dict = {}
    for _, t in rows:
        for w in t.lower().split():
            words[w] = words.get(w, 0) + 1
    for w, wc in words.items():
        for i in range(len(w)):
            for l in range(1, min(3, len(w) - i) + 1):
                p = w[i : i + l]
                ref[p] = ref.get(p, 0) + wc
    expect = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:25]

    got = [
        (r.piece, r.piece_count)
        for r in unigram_seed_candidates(df, max_piece_len=3, k=25).collect()
    ]
    assert got == expect


def test_unigram_lm_train_coverage_determinism_likelihood(spark):
    """Trainer properties: (1) every corpus character survives pruning
    (full coverage — any string segments); (2) training is a pure function
    of the corpus (two runs, different partitioning, identical piece
    table); (3) hard-EM corpus likelihood under the returned model is
    non-decreasing with more iterations; (4) frequent multi-char pieces
    win vocabulary slots."""
    import math

    from scraping_jobsdb_spark.operators.textops import (
        _viterbi_segment,
        unigram_lm_train,
    )

    rows = [
        (i, "sharding shard shards resharding spark sparking sparked")
        for i in range(6)
    ] + [(10, "joins join joined joining rejoin")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")

    t1 = unigram_lm_train(df, vocab_size=40, num_iters=2)
    t2 = unigram_lm_train(df.repartition(7), vocab_size=40, num_iters=2)
    p1 = sorted((r.piece, r.logprob, r.piece_count) for r in t1.collect())
    p2 = sorted((r.piece, r.logprob, r.piece_count) for r in t2.collect())
    assert p1 == p2  # determinism incl. float logprobs

    chars = {c for _, t in rows for c in t.lower() if not c.isspace()}
    vocab = {p for p, _, _ in p1}
    assert chars <= vocab  # coverage
    assert any(len(p) > 1 for p in vocab)  # learned multi-char pieces

    def corpus_ll(piece_rows):
        logp = {p: lp for p, lp, _ in piece_rows}
        unk = min(logp.values()) - 10.0
        ll = 0.0
        for _, t in rows:
            for w in t.lower().split():
                ll += sum(
                    logp.get(s, unk)
                    for s in _viterbi_segment(w, logp, 4, unk)
                )
        return ll

    lls = []
    for iters in (1, 2, 4):
        t = unigram_lm_train(df, vocab_size=40, num_iters=iters)
        lls.append(
            corpus_ll([(r.piece, r.logprob, r.piece_count) for r in t.collect()])
        )
    assert lls[0] <= lls[1] + 1e-9 and lls[1] <= lls[2] + 1e-9, lls


def test_unigram_lm_encode_equals_train_segmentation(spark):
    """Encoding the training corpus reproduces the trainer's own E-step
    segmentations (shared _viterbi_segment), reassembled in word order;
    token concatenation restores each word's characters exactly (no-unk
    coverage); unseen characters pass through as themselves."""
    from scraping_jobsdb_spark.operators.textops import (
        _viterbi_segment,
        unigram_lm_encode,
        unigram_lm_train,
    )

    rows = [
        (1, "partition partitions partitioned"),
        (2, "repartition partition shuffle shuffles"),
        (3, "shuffle partition broadcast"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    pieces = unigram_lm_train(df, vocab_size=30, num_iters=2)
    plist = [(r.piece, r.logprob) for r in pieces.collect()]
    logp = dict(plist)
    unk = min(logp.values()) - 10.0

    got = {
        r.doc_id: list(r.tokens)
        for r in unigram_lm_encode(df, plist).collect()
    }
    for doc_id, text in rows:
        expect = [
            s
            for w in text.lower().split()
            for s in _viterbi_segment(w, logp, 4, unk)
        ]
        assert got[doc_id] == expect, doc_id
        assert "".join(got[doc_id]) == text.lower().replace(" ", "")

    unseen = spark.createDataFrame(
        [(9, "partition zq")], "doc_id bigint, text string"
    )
    toks = {
        r.doc_id: list(r.tokens)
        for r in unigram_lm_encode(unseen, plist).collect()
    }[9]
    assert "".join(toks) == "partitionzq"


# ------------------------------------------------------- round-8: wordpiece


def test_wordpiece_roundtrip_coverage_and_parity(spark):
    """Greedy longest-match WordPiece: (a) stripping '##' and concatenating
    a word's pieces reproduces the word exactly (single-char coverage makes
    [UNK] unreachable), and (b) the distributed encode matches a pure-Python
    replay of the same greedy algorithm under the same vocab."""
    from scraping_jobsdb_spark.operators.textops import (
        tokens,
        wordpiece_encode,
        wordpiece_vocab,
    )

    docs = load_table(spark, SF_SMOKE, "documents").filter(
        F.col("text").isNotNull()
    ).select("doc_id", "text")
    vocab = [
        (r.raw, r.initial)
        for r in wordpiece_vocab(docs, max_piece_len=4, k=200)
        .select("raw", "initial")
        .collect()
    ]
    initial = {r for r, i in vocab if i}
    cont = {r for r, i in vocab if not i}
    max_i = max(len(r) for r in initial)
    max_c = max(len(r) for r in cont)

    def greedy(w):
        out, pos = [], 0
        while pos < len(w):
            table, cap = (initial, max_i) if pos == 0 else (cont, max_c)
            for l in range(min(cap, len(w) - pos), 0, -1):
                if w[pos : pos + l] in table:
                    out.append(
                        w[pos : pos + l] if pos == 0 else "##" + w[pos : pos + l]
                    )
                    pos += l
                    break
            else:  # pragma: no cover - coverage guarantee
                return ["[UNK]"]
        return out

    enc = {
        r.doc_id: list(r.tokens)
        for r in wordpiece_encode(docs, vocab).collect()
    }
    words = {
        r.doc_id: [w for w in r.ws if w]
        for r in docs.select(
            "doc_id", tokens(F.lower(F.col("text"))).alias("ws")
        ).collect()
    }
    assert set(enc) == {d for d, ws in words.items() if ws}
    for doc_id, ws in words.items():
        if not ws:
            continue
        expect = [p for w in ws for p in greedy(w)]
        assert enc[doc_id] == expect, f"doc {doc_id}: distributed != replay"
        assert "[UNK]" not in enc[doc_id]
        # roundtrip: pieces re-concatenate to the original words
        rebuilt, cur = [], ""
        for p in enc[doc_id]:
            if p.startswith("##"):
                cur += p[2:]
            else:
                if cur:
                    rebuilt.append(cur)
                cur = p
        rebuilt.append(cur)
        assert rebuilt == ws, f"doc {doc_id}: roundtrip broke"


# ------------------------------------------------------ round-8: hybrid RRF


def test_hybrid_rrf_scores_and_membership(spark):
    """RRF fusion invariants: every fused doc came from a leg, the score is
    exactly sum(1/(60+rank)) over legs hit, ordering is (score desc, id),
    and a doc in BOTH legs outranks the same ranks split across docs."""
    from scraping_jobsdb_spark.operators.similarity import hybrid_rrf

    docs = load_table(spark, SF_SMOKE, "documents").filter(
        F.col("text").isNotNull()
    ).select("doc_id", "text")
    emb = load_table(spark, SF_SMOKE, "embeddings")
    out = hybrid_rrf(
        docs, emb, ("spark", "merge", "vector"), query_vec_id=0,
        k_each=50, k_out=20,
    ).collect()
    assert 0 < len(out) <= 20
    scores = []
    for r in out:
        assert r.lex_rank > 0 or r.dense_rank > 0
        expect = (1.0 / (60 + r.lex_rank) if r.lex_rank else 0.0) + (
            1.0 / (60 + r.dense_rank) if r.dense_rank else 0.0
        )
        assert abs(r.rrf_score - round(expect, 9)) < 1e-12
        scores.append((r.rrf_score, r.doc_id))
    ordered = sorted(scores, key=lambda t: (-t[0], t[1]))
    assert scores == ordered


# ------------------------------------------- round-8: perplexity bucketing


def test_perplexity_buckets_partition_corpus(spark):
    """CCNet head/middle/tail: the buckets PARTITION the scored corpus
    (counts sum to the per-doc table's size) and are value-ordered —
    head's max surprisal <= middle's min, middle's max <= tail's min."""
    from scraping_jobsdb_spark.operators.textops import (
        bigram_surprisal,
        perplexity_buckets,
    )

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    buckets = {r.bucket: r for r in perplexity_buckets(docs).collect()}
    assert set(buckets) == {"head", "middle", "tail"}
    n_scored = bigram_surprisal(docs).count()
    assert sum(r.n_docs for r in buckets.values()) == n_scored
    assert buckets["head"].max_nats <= buckets["middle"].min_nats
    assert buckets["middle"].max_nats <= buckets["tail"].min_nats
    # tertiles: no bucket is off by more than 1 from n/3 on the small corpus
    for r in buckets.values():
        assert abs(r.n_docs - n_scored / 3) <= max(2, 0.05 * n_scored)


# -------------------------------------------- round-8: random projection


def test_random_projection_preserves_neighborhood_order(spark):
    """JL property (statistical, deterministic here since the sign matrix
    is fixed): squared distances in the 16-dim projected space correlate
    strongly with the int8-domain distances in the original 64-dim space,
    and the projection is a pure function (re-run identical)."""
    import numpy as np

    from scraping_jobsdb_spark.operators.similarity import (
        quantize_embeddings_int8,
        random_projection_int,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings").limit(80)
    codes = {
        r.vec_id: np.array(r.codes, dtype=np.float64)
        for r in quantize_embeddings_int8(emb).collect()
    }

    def corr(out_dim):
        rows = random_projection_int(emb, out_dim=out_dim).collect()
        assert {r.dim for r in rows} == set(range(out_dim))
        by_id = {}
        for r in rows:
            by_id.setdefault(r.vec_id, [0] * out_dim)[r.dim] = r.proj
        ids = sorted(by_id)
        d_orig, d_proj = [], []
        for a in ids[:40]:
            for b in ids[:40]:
                if a < b:
                    d_orig.append(float(np.sum((codes[a] - codes[b]) ** 2)))
                    pa = np.array(by_id[a], dtype=np.float64)
                    pb = np.array(by_id[b], dtype=np.float64)
                    d_proj.append(float(np.sum((pa - pb) ** 2)))
        return np.corrcoef(d_orig, d_proj)[0, 1], by_id

    r16, by_id = corr(16)
    r48, _ = corr(48)
    assert r16 > 0.3, f"16-dim projection decorrelated: r={r16:.3f}"
    # the JL lever: more output dims => tighter distance preservation
    assert r48 > r16, f"r48={r48:.3f} !> r16={r16:.3f}"
    assert r48 > 0.6, f"48-dim projection decorrelated: r={r48:.3f}"
    # determinism: identical on re-run (fixed md5 sign matrix)
    again = {
        (r.vec_id, r.dim): r.proj
        for r in random_projection_int(emb, out_dim=16).collect()
    }
    assert all(again[(v, d)] == by_id[v][d] for v in by_id for d in range(16))


def test_nb_classifier_separates_marker_tokens(spark):
    """NB train+score on a synthetic corpus with class-pure marker tokens:
    docs dominated by positive markers score > 0, negative-marker docs
    score < 0, and flipping the label column (anti-)symmetrically negates
    the score (weights and prior both flip sign exactly up to the 9-dp
    rounding of each term)."""
    from scraping_jobsdb_spark.operators.textops import nb_quality_scores

    rows = []
    for i in range(12):
        rows.append((i, "good clean prose text here", True))
    for i in range(12, 20):
        rows.append((i, "spam junk spam junk noise", False))
    # held-out mixtures: mostly-good and mostly-bad
    rows.append((100, "good clean prose junk", True))
    rows.append((101, "spam junk noise clean", False))
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, lab boolean")

    scored = {
        r.doc_id: r
        for r in nb_quality_scores(docs, label=F.col("lab")).collect()
    }
    assert scored[0].score > 0 and scored[0].predicted
    assert scored[12].score < 0 and not scored[12].predicted
    assert scored[100].score > 0  # 3 good markers vs 1 bad
    assert scored[101].score < 0  # 3 bad markers vs 1 good

    flipped = {
        r.doc_id: r.score
        for r in nb_quality_scores(docs, label=~F.col("lab")).collect()
    }
    for i, r in scored.items():
        # each 9-dp-rounded term can contribute <= 1e-9 asymmetry
        assert abs(r.score + flipped[i]) < 1e-6, (i, r.score, flipped[i])


def test_dsir_ranks_target_like_docs_first(spark):
    """DSIR importance ranking on a planted vocabulary split: documents
    written in the target subset's vocabulary outrank documents written in
    the background vocabulary, monotonically in the target-token fraction."""
    from scraping_jobsdb_spark.operators.textops import dsir_importance_topk

    rows = []
    for i in range(10):  # target domain: A-vocabulary
        rows.append((i, "alpha beta gamma delta alpha beta", True))
    for i in range(10, 40):  # background: B-vocabulary
        rows.append((i, "omega psi chi phi omega psi", False))
    # held-out probes (all background-labelled): varying target fraction
    rows.append((100, "alpha beta gamma delta", False))
    rows.append((101, "alpha beta chi phi", False))
    rows.append((102, "omega psi chi phi", False))
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, t boolean")

    ranked = {
        r.doc_id: r.rank
        for r in dsir_importance_topk(
            docs, target=F.col("t"), n_buckets=64, k=50
        ).collect()
    }
    assert ranked[100] < ranked[101] < ranked[102]


def test_boilerplate_span_removal_laws(spark):
    """Boilerplate removal strikes every occurrence of a corpus-frequent
    trigram (first occurrence included — the contract that separates it
    from dedup_segments_global), keeps infrequent text in original order,
    empties fully-boilerplate docs, and conserves token counts."""
    from scraping_jobsdb_spark.operators.textops import boilerplate_span_removal

    bp = "subscribe to newsletter"
    rows = [
        (1, f"{bp} unique one two"),
        (2, f"three four {bp}"),
        (3, f"five {bp} six"),
        (4, bp),                      # fully boilerplate
        (5, "entirely fresh content words"),
        (6, "a b"),                   # shorter than a trigram
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r.doc_id: r for r in boilerplate_span_removal(docs, min_df=3).collect()}

    assert out[1].clean_text == "unique one two"
    assert out[2].clean_text == "three four"
    assert out[3].clean_text == "five six"   # order preserved around the cut
    assert out[4].clean_text == "" and out[4].n_removed == out[4].n_tokens
    assert out[5].clean_text == "entirely fresh content words"
    assert out[6].clean_text == "a b" and out[6].n_removed == 0
    for r in out.values():
        kept = len(r.clean_text.split()) if r.clean_text else 0
        assert r.n_tokens == kept + r.n_removed, r


def test_temperature_mixture_allocation_laws(spark):
    """Temperature mixture: the largest-remainder allocation sums exactly
    to the budget; α=1 reproduces proportional shares; α<1 flattens the
    distribution (smallest group gains, largest loses, relative to α=1);
    and the selection is deterministic across reruns."""
    from scraping_jobsdb_spark.operators.sampling import (
        temperature_mixture_sample,
    )

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "lang")

    def alloc_map(alpha):
        out = temperature_mixture_sample(
            docs, group_col="lang", alpha=alpha, budget=40
        ).collect()
        return {r.lang: r for r in out}

    a1 = alloc_map(1.0)
    ah = alloc_map(0.5)
    assert sum(r.alloc for r in a1.values()) == 40
    assert sum(r.alloc for r in ah.values()) == 40
    for m in (a1, ah):
        for r in m.values():
            assert r.n_sampled == min(r.alloc, r.n_docs), r
    big = max(a1, key=lambda k: a1[k].n_docs)
    small = min(a1, key=lambda k: a1[k].n_docs)
    assert ah[small].alloc >= a1[small].alloc
    assert ah[big].alloc <= a1[big].alloc
    # α=1 tracks raw shares within the ±1 largest-remainder band
    total = sum(r.n_docs for r in a1.values())
    for r in a1.values():
        assert abs(r.alloc - 40 * r.n_docs / total) <= 1
    # deterministic rerun: identical checksums
    again = alloc_map(0.5)
    assert {k: v.id_checksum for k, v in ah.items()} == {
        k: v.id_checksum for k, v in again.items()
    }


def test_token_entropy_distribution_shape(spark):
    """Entropy laws: a repeated-token doc scores 0; a uniform all-distinct
    doc scores ln(n); a skewed doc sits strictly between; n_tokens and
    n_types count correctly."""
    import math

    from scraping_jobsdb_spark.operators.textops import token_entropy

    docs = spark.createDataFrame(
        [
            (1, "x x x x x x x x"),
            (2, "a b c d e f g h"),
            (3, "a a a a a a a b"),
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in token_entropy(docs).collect()}
    assert out[1].entropy_nats == 0.0
    assert abs(out[2].entropy_nats - math.log(8)) < 1e-6
    assert 0.0 < out[3].entropy_nats < out[2].entropy_nats
    assert out[1].n_tokens == 8 and out[1].n_types == 1
    assert out[2].n_tokens == 8 and out[2].n_types == 8


def test_pmi_top_pairs_ranks_collocations(spark):
    """PMI ranks the exclusive collocation above the frequent-but-
    independent pair, respects min_count, and matches the Python reference
    formula on the planted corpus."""
    import math

    from scraping_jobsdb_spark.operators.textops import pmi_top_pairs

    # "san francisco" always together (exclusive); "the cat" frequent but
    # 'the' also precedes many other words (diluted marginal)
    rows = []
    for i in range(6):
        rows.append((i, "san francisco is great"))
    for i in range(6, 12):
        rows.append((i, "the cat sat on the mat"))
    for i in range(12, 18):
        rows.append((i, "the dog ran to the park"))
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = pmi_top_pairs(docs, min_count=5, k=10).collect()
    by_pair = {(r.prev, r.cur): r for r in out}
    assert ("san", "francisco") in by_pair
    sf = by_pair[("san", "francisco")]
    cat = by_pair.get(("the", "cat"))
    assert cat is not None and sf.pmi > cat.pmi
    assert sf.rank < cat.rank
    # every surviving pair respects the count floor
    assert all(r.n_pair >= 5 for r in out)
    # reference formula on the planted pair: c=6, lm=6 ('san' only precedes
    # 'francisco'), N = total bigrams
    n_bigrams = sum(len(t.split()) - 1 for _, t in rows)
    rm = 6  # 'francisco' only ever follows 'san'
    want = round(math.log(6) + math.log(n_bigrams) - math.log(6) - math.log(rm), 6)
    assert abs(sf.pmi - want) < 1e-9


def test_whitening_covariance_and_determinism(spark):
    """ZCA whitening contract: the whitened sample covariance is ≈ I in
    the well-conditioned directions (diagonal ≈ λ/(λ+eps), off-diagonal
    ≈ 0), and retrieval output is deterministic across reruns."""
    import numpy as np

    from scraping_jobsdb_spark.operators.similarity import whitening_topk
    from tests.conftest import SF_CORRECT

    emb = load_table(spark, SF_CORRECT, "embeddings")
    out1 = sorted(map(tuple, whitening_topk(emb, (0, 100, 200), k=10).collect()))
    out2 = sorted(map(tuple, whitening_topk(emb, (0, 100, 200), k=10).collect()))
    assert out1 == out2
    assert len(out1) == 30  # 3 queries × k
    # re-derive the whitening transform locally and check covariance
    x = np.stack(
        [np.asarray(r.embedding, dtype=np.float64) for r in emb.collect()]
    )
    mean = x.mean(axis=0)
    cov = (x - mean).T @ (x - mean) / x.shape[0]
    lam, u = np.linalg.eigh(cov)
    eps = 1e-3
    wmat = (u * (1.0 / np.sqrt(lam + eps))) @ u.T
    wcov = wmat @ cov @ wmat.T
    # diagonal of the whitened covariance is λ/(λ+eps) in the eigenbasis
    assert np.all(np.diag(wcov) > 0.5) and np.all(np.diag(wcov) <= 1.0 + 1e-9)
    off = wcov - np.diag(np.diag(wcov))
    assert np.max(np.abs(off)) < 0.05


def test_lang_kl_divergence_laws(spark):
    """KL laws: a group distributed exactly like the corpus scores ≈ 0; a
    group concentrated on its own vocabulary scores strictly higher; KL is
    non-negative (Gibbs) for every group."""
    import math

    from scraping_jobsdb_spark.operators.textops import lang_kl_divergence

    rows = []
    # two groups with IDENTICAL distributions => corpus == each group
    for i in range(10):
        rows.append((i, "same", "a b c d"))
        rows.append((100 + i, "alike", "a b c d"))
    # one group on a disjoint vocabulary => large divergence
    for i in range(10):
        rows.append((200 + i, "shifted", "x y z w"))
    docs = spark.createDataFrame(rows, "doc_id bigint, lang string, text string")
    out = {r.lang: r for r in lang_kl_divergence(docs).collect()}
    assert all(r.kl_nats >= 0 for r in out.values())
    # 'same'/'alike' each hold 1/3 of mass on their shared vocab:
    # p_g(t)=1/4, p_c(t)=1/6 for their tokens => KL = ln(3/2)
    assert abs(out["same"].kl_nats - math.log(1.5)) < 1e-6
    assert abs(out["alike"].kl_nats - out["same"].kl_nats) < 1e-9
    # disjoint vocab: p_g=1/4 vs p_c=1/12 => KL = ln(3)
    assert abs(out["shifted"].kl_nats - math.log(3.0)) < 1e-6
    assert out["shifted"].kl_nats > out["same"].kl_nats
    assert out["same"].n_tokens == 40 and out["same"].n_types == 4


def test_k_anonymity_report_flags_small_classes(spark):
    """Classes below k carry their size as risk_rows; classes at/above k
    are anonymous with zero risk."""
    from scraping_jobsdb_spark.operators.checks import k_anonymity_report

    rows = [("en", "a")] * 5 + [("en", "b")] * 2 + [("fr", "a")] * 1
    df = spark.createDataFrame(rows, "lang string, source string")
    out = {(r.lang, r.source): r for r in k_anonymity_report(df, ["lang", "source"], k=5).collect()}
    assert out[("en", "a")].k_anonymous and out[("en", "a")].risk_rows == 0
    assert not out[("en", "b")].k_anonymous and out[("en", "b")].risk_rows == 2
    assert not out[("fr", "a")].k_anonymous and out[("fr", "a")].risk_rows == 1
    assert sum(r.class_size for r in out.values()) == 8


def test_quality_ensemble_conjunction_and_degenerate_kill(spark):
    """The keep verdict is exactly the conjunction of its published
    signals, and a degenerate repeated-token doc fails the entropy floor
    even when long enough and NB-positive."""
    from scraping_jobsdb_spark.operators.textops import quality_ensemble

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "lang", "text")
    # degenerate: one token repeated 60x, labelled positive (lang en)
    degen = spark.createDataFrame(
        [(900000, "en", " ".join(["the"] * 60))], "doc_id bigint, lang string, text string"
    )
    out = quality_ensemble(docs.unionByName(degen), label=F.col("lang") == "en").collect()
    by_id = {r.doc_id: r for r in out}
    for r in out:
        want = (
            r.nb_pred
            and r.n_tokens >= 50
            and r.entropy_nats >= 2.9
            and r.surprisal_nats <= 3.42
        )
        assert r.keep == want, r
    d = by_id[900000]
    assert d.entropy_nats == 0.0 and not d.keep and d.n_tokens == 60


def test_referential_integrity_finds_planted_orphans(spark):
    """A planted orphan FK is counted; NULL FKs are not orphans; clean
    relationships report ok."""
    from scraping_jobsdb_spark.operators.checks import (
        referential_integrity_report,
    )

    parent = spark.createDataFrame([(1,), (2,)], "pk bigint")
    child = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 99), (13, None)], "id bigint, fk bigint"
    )
    out = {r.relationship: r for r in referential_integrity_report(
        [
            ("child.fk -> parent", child, "fk", parent, "pk"),
            ("parent self", parent, "pk", parent, "pk"),
        ]
    ).collect()}
    bad = out["child.fk -> parent"]
    assert bad.child_rows == 4 and bad.orphan_rows == 1 and not bad.ok
    good = out["parent self"]
    assert good.orphan_rows == 0 and good.ok


def test_value_psi_drift_laws(spark):
    """PSI laws: the baseline day scores exactly 0 against itself; a day
    with the identical distribution scores ~0; a day whose values shifted
    into different bins scores materially higher."""
    from datetime import datetime

    from scraping_jobsdb_spark.operators.temporal import value_psi_by_day

    rows = []
    for i in range(200):
        rows.append((datetime(2024, 1, 1, 10, 0), float(i % 100)))   # base
        rows.append((datetime(2024, 1, 2, 10, 0), float(i % 100)))   # same
        rows.append((datetime(2024, 1, 3, 10, 0), 400.0 + i % 50))   # shifted
    ev = spark.createDataFrame(rows, "ts timestamp, value double")
    out = {r.day: r for r in value_psi_by_day(ev).collect()}
    assert out["2024-01-01"].psi == 0.0
    assert abs(out["2024-01-02"].psi) < 1e-9
    assert out["2024-01-03"].psi > 0.25  # the canonical "action" threshold
    assert all(r.n_events == 200 for r in out.values())


def test_temperature_mixture_emits_zero_alloc_groups(spark):
    """One row per group even when a group's largest-remainder allocation
    is 0 (tiny budget across many groups): zero samples, zero checksum —
    never silently absent."""
    from scraping_jobsdb_spark.operators.sampling import (
        temperature_mixture_sample,
    )

    rows = [(i, f"g{i % 7}") for i in range(70)]
    docs = spark.createDataFrame(rows, "doc_id bigint, lang string")
    out = {r.lang: r for r in temperature_mixture_sample(
        docs, group_col="lang", alpha=0.5, budget=3
    ).collect()}
    assert len(out) == 7  # every group present
    assert sum(r.alloc for r in out.values()) == 3
    zeros = [r for r in out.values() if r.alloc == 0]
    assert zeros, "budget 3 over 7 equal groups must zero someone out"
    for r in zeros:
        assert r.n_sampled == 0 and r.id_checksum == 0


def test_psi_negative_values_are_visible_drift(spark):
    """Negative values clamp into bin 0 (not into grid-invisible negative
    bins): a day shifting into the negative region fires PSI."""
    from datetime import datetime

    from scraping_jobsdb_spark.operators.temporal import value_psi_by_day

    rows = []
    for i in range(200):
        rows.append((datetime(2024, 1, 1, 10, 0), float(100 + i % 300)))
        rows.append((datetime(2024, 1, 2, 10, 0), -50.0 - i))  # all negative
    ev = spark.createDataFrame(rows, "ts timestamp, value double")
    out = {r.day: r for r in value_psi_by_day(ev).collect()}
    assert out["2024-01-02"].n_events == 200
    assert out["2024-01-02"].psi > 0.25, out["2024-01-02"]


def test_referential_integrity_rejects_empty_pairs(spark):
    import pytest as _pytest

    from scraping_jobsdb_spark.operators.checks import (
        referential_integrity_report,
    )

    with _pytest.raises(ValueError, match="non-empty"):
        referential_integrity_report([])


# --- round-9 curation/eval wave -------------------------------------------


def test_retrieval_eval_metric_laws(spark):
    from scraping_jobsdb_spark.plans.queries import REGISTRY

    rows = (
        REGISTRY["retrieval_eval_metrics"].spark_fn(spark, SF_SMOKE).collect()
    )
    assert {r.term for r in rows} == {"spark", "merge", "vector"}
    for r in rows:
        assert 0.0 <= r.ndcg_at_10 <= 1.0, r
        assert 0.0 <= r.mrr <= 1.0, r
        assert 0.0 <= r.recall_at_10 <= 1.0, r
        assert r.n_rel > 0
        # MRR is 1/rank-of-first-relevant: with graded rels derived from tf
        # and BM25 ranking BY tf-monotone score, the top hit is relevant
        assert r.mrr == 1.0, r


def test_dictionary_phrase_tagging_matches_bruteforce(spark):
    from collections import Counter

    from scraping_jobsdb_spark.plans.queries import REGISTRY
    from scraping_jobsdb_spark.sources.tables import load_table

    tags = {
        (r.doc_id, r.phrase)
        for r in REGISTRY["dictionary_phrase_tagging"]
        .spark_fn(spark, SF_SMOKE)
        .collect()
    }
    docs = {
        r.doc_id: r.text.strip().split()
        for r in load_table(spark, SF_SMOKE, "documents")
        .filter("text is not null")
        .collect()
    }
    counts = Counter()
    per_doc = {}
    for did, ws in docs.items():
        bgs = [f"{a} {b}" for a, b in zip(ws, ws[1:])]
        counts.update(bgs)
        per_doc[did] = set(bgs)
    top5 = sorted(counts, key=lambda p: (-counts[p], p))[:5]
    expected = {
        (did, p) for did, bgs in per_doc.items() for p in top5 if p in bgs
    }
    assert tags == expected


def test_badwords_filter_report_matches_bruteforce(spark):
    from scraping_jobsdb_spark.plans.queries import REGISTRY
    from scraping_jobsdb_spark.sources.tables import load_table

    report = {
        r.lang: r
        for r in REGISTRY["badwords_filter_report"]
        .spark_fn(spark, SF_SMOKE)
        .collect()
    }
    block = {"dup", "corrupt", "deadlock"}
    exp: dict = {}
    for r in (
        load_table(spark, SF_SMOKE, "documents")
        .filter("text is not null")
        .collect()
    ):
        n, f = exp.get(r.lang, (0, 0))
        hit = bool(block & set(r.text.strip().split()))
        exp[r.lang] = (n + 1, f + (1 if hit else 0))
    assert set(report) == set(exp)
    for lang, (n, f) in exp.items():
        row = report[lang]
        assert (row.n_docs, row.n_flagged) == (n, f)
        assert row.flag_rate == f / n


def test_ewma_matches_exact_rational_recompute(spark):
    from fractions import Fraction

    from scraping_jobsdb_spark.plans.queries import REGISTRY
    from scraping_jobsdb_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    out = {
        (r.user_id, r.day): r
        for r in REGISTRY["events_ewma_smoothing"].spark_fn(spark, SF_SMOKE).collect()
    }
    daily = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(
            (F.sum(F.col("value").cast("decimal(30,4)")) * 10000)
            .cast("bigint")
            .alias("xm")
        )
        .collect()
    )
    series: dict = {}
    for r in sorted(daily, key=lambda r: (r.user_id, r.day)):
        series.setdefault(r.user_id, []).append((str(r.day), r.xm))
    checked = 0
    for uid, pts in series.items():
        for n in range(len(pts)):
            window = pts[max(0, n - 49) : n + 1]
            num = sum(
                Fraction(xm) * Fraction(1, 2) ** j
                for j, (_, xm) in enumerate(reversed(window))
            )
            den = sum(Fraction(1, 2) ** j for j in range(len(window)))
            exact = num / den / 10000
            row = out[(uid, pts[n][0])]
            assert row.n_window == len(window)
            # the engine emits two correctly-rounded divisions off the
            # exact integer numerator — within 2 ulp of the true rational
            assert abs(row.ewma - float(exact)) <= 4e-16 * max(
                1.0, abs(float(exact))
            ), (uid, pts[n][0], row.ewma, float(exact))
            checked += 1
    assert checked == len(out) > 0


def test_curriculum_pack_order_laws(spark):
    from scraping_jobsdb_spark.plans.queries import REGISTRY

    rows = sorted(
        REGISTRY["curriculum_pack_order"].spark_fn(spark, SF_SMOKE).collect(),
        key=lambda r: r.position,
    )
    assert [r.position for r in rows] == list(range(1, len(rows) + 1))
    # easy->hard curriculum: bucket ids are non-decreasing along positions,
    # and bucket 0 holds the highest-quality tertile
    assert all(a.bucket <= b.bucket for a, b in zip(rows, rows[1:]))
    by_bucket: dict = {}
    for r in rows:
        by_bucket.setdefault(r.bucket, []).append(r)
    # ties at the tertile cuts can legally empty the middle bucket at
    # smoke scale; the easy (0) and hard (2) extremes always exist
    assert set(by_bucket) <= {0, 1, 2}
    assert {0, 2} <= set(by_bucket)
    assert min(r.quality for r in by_bucket[0]) >= max(
        r.quality for r in by_bucket[2]
    )
    # within a bucket the order is the md5 shuffle, uncorrelated with id
    import hashlib

    for rs in by_bucket.values():
        keys = [
            hashlib.md5(str(r.doc_id).encode()).hexdigest() for r in rs
        ]
        assert keys == sorted(keys)


# --- round-9 wave 2: graph / monitoring / sketch algebra / langid ----------


def test_triangle_count_matches_bruteforce(spark):
    from itertools import combinations

    from scraping_jobsdb_spark.plans.queries import REGISTRY

    row = REGISTRY["graph_triangle_count"].spark_fn(spark, SF_SMOKE).collect()[0]
    # brute force: rebuild the support-5 co-occurrence graph in Python
    li = (
        load_table(spark, SF_SMOKE, "lineitem")
        .select("l_orderkey", "l_suppkey")
        .distinct()
        .collect()
    )
    by_order: dict = {}
    for r in li:
        by_order.setdefault(r.l_orderkey, set()).add(r.l_suppkey)
    from collections import Counter

    support = Counter()
    for supps in by_order.values():
        support.update(combinations(sorted(supps), 2))
    edges = {p for p, c in support.items() if c >= 5}
    nodes = {n for p in edges for n in p}
    adj: dict = {n: set() for n in nodes}
    for u, w in edges:
        adj[u].add(w)
        adj[w].add(u)
    # count each triangle once at its (u, w) edge with the third node above
    tri = 0
    for u, w in edges:
        tri += len([v for v in adj[u] & adj[w] if v > w])  # u < w < v
    wedges = sum(len(a) * (len(a) - 1) // 2 for a in adj.values())
    assert (row.n_nodes, row.n_edges, row.n_wedges, row.n_triangles) == (
        len(nodes),
        len(edges),
        wedges,
        tri,
    )
    assert row.global_clustering == round(3 * tri / wedges, 9)


def test_events_anomaly_mad_matches_python(spark):
    from decimal import Decimal
    from statistics import median

    from scraping_jobsdb_spark.plans.queries import REGISTRY

    got = {
        (r.user_id, r.day): r
        for r in REGISTRY["events_anomaly_mad"].spark_fn(spark, SF_SMOKE).collect()
    }
    ev = load_table(spark, SF_SMOKE, "events").collect()
    daily: dict = {}
    for r in ev:
        key = (r.user_id, str(r.ts)[:10])
        daily[key] = daily.get(key, Decimal(0)) + Decimal(str(round(r.value, 4)))
    per_user: dict = {}
    for (uid, day), v in daily.items():
        per_user.setdefault(uid, []).append((day, int(v * 10000)))
    expected = {}
    for uid, pts in per_user.items():
        xs = [x for _, x in pts]
        med = median(xs)
        mad = median(abs(x - med) for x in xs)
        if mad <= 0:
            continue
        for day, x in pts:
            if abs(x - med) > 3.5 * mad:
                expected[(uid, day)] = (x, med, mad)
    assert set(got) == set(expected)
    for key, (x, med, mad) in expected.items():
        r = got[key]
        assert r.daily_value == x / 10000.0
        assert r.med_value == med / 10000.0
        assert r.mad_value == mad / 10000.0
        assert r.robust_z == round(abs(x - med) / mad, 9)


def test_kmv_set_operations_error_bounds(spark):
    from scraping_jobsdb_spark.plans.queries import REGISTRY

    row = REGISTRY["kmv_set_operations"].spark_fn(spark, SF_SMOKE).collect()[0]
    ev = (
        load_table(spark, SF_SMOKE, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .select(
            "event_type",
            F.concat_ws(
                ":",
                F.col("user_id").cast("string"),
                F.date_format(F.to_date("ts"), "yyyy-MM-dd"),
            ).alias("item"),
        )
        .distinct()
        .collect()
    )
    a = {r.item for r in ev if r.event_type == "click"}
    b = {r.item for r in ev if r.event_type == "purchase"}
    # KMV relative error ~ 1/sqrt(k-2); allow 5 sigma (k = 64)
    tol = 5.0 / (62**0.5)
    for est, exact in (
        (row.est_click, len(a)),
        (row.est_purchase, len(b)),
        (row.est_intersection, len(a & b)),
    ):
        if exact >= 64:
            assert abs(est - exact) <= tol * exact, (est, exact)
    assert 0.0 <= row.jaccard_est <= 1.0
    assert row.rho <= 64


def test_langid_trigram_separates_real_languages(spark):
    from scraping_jobsdb_spark.operators.textops import langid_trigram_confusion

    samples = {
        "en": "the quick brown fox jumps over the lazy dog while the "
        "children watch the evening light fade through the window",
        "de": "der schnelle braune fuchs springt über den faulen hund "
        "während die kinder das abendlicht durch das fenster schauen",
        "fr": "le rapide renard brun saute par dessus le chien paresseux "
        "pendant que les enfants regardent la lumière du soir",
    }
    rows = []
    i = 0
    for lang, base in samples.items():
        words = base.split()
        for j in range(15):
            # rotate word order so docs differ but keep the character
            # distribution of the language
            rot = words[j % len(words):] + words[: j % len(words)]
            rows.append((i, lang, " ".join(rot)))
            i += 1
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    conf = {
        (r.actual_lang, r.predicted_lang): r.n_docs
        for r in langid_trigram_confusion(docs, top_k=100).collect()
    }
    # held-out docs (doc_id % 5 == 0) must all classify correctly
    assert set(conf) == {("en", "en"), ("de", "de"), ("fr", "fr")}


def test_langid_registry_confusion_is_complete(spark):
    from scraping_jobsdb_spark.plans.queries import REGISTRY
    from scraping_jobsdb_spark.sources.tables import load_table as lt

    rows = REGISTRY["doc_langid_trigram"].spark_fn(spark, SF_SMOKE).collect()
    docs = lt(spark, SF_SMOKE, "documents").filter("text is not null")
    held = docs.filter("doc_id % 5 = 0")
    langs = {r.lang for r in docs.select("lang").distinct().collect()}
    assert sum(r.n_docs for r in rows) == held.count()
    assert {r.actual_lang for r in rows} <= langs
    assert {r.predicted_lang for r in rows} <= langs | {"und"}


def test_waiting_supplier_matches_bruteforce(spark):
    from collections import Counter
    from datetime import timedelta

    from scraping_jobsdb_spark.plans.queries import REGISTRY

    got = [
        (r.suppkey, r.numwait)
        for r in REGISTRY["waiting_supplier_report"]
        .spark_fn(spark, SF_SMOKE)
        .collect()
    ]
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    ).collect()
    orders = {
        r.o_orderkey: (r.o_orderstatus, r.o_orderdate)
        for r in load_table(spark, SF_SMOKE, "orders").collect()
    }
    supps: dict = {}
    lates: dict = {}
    for r in li:
        supps.setdefault(r.l_orderkey, set()).add(r.l_suppkey)
        status, odate = orders[r.l_orderkey]
        if status == "F" and r.l_shipdate > odate + timedelta(days=60):
            lates.setdefault(r.l_orderkey, set()).add(r.l_suppkey)
    waits = Counter()
    for ok, late in lates.items():
        if len(late) == 1 and len(supps[ok]) > 1:
            waits[next(iter(late))] += 1
    expected = sorted(waits.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert got == expected


def test_zorder_layout_bounds_both_dimensions(spark):
    from scraping_jobsdb_spark.plans.queries import REGISTRY

    rows = (
        REGISTRY["zorder_layout_stats"].spark_fn(spark, SF_SMOKE).collect()
    )
    orders = load_table(spark, SF_SMOKE, "orders")
    n_total = orders.count()
    assert sum(r.n_rows for r in rows) == n_total
    g = orders.agg(
        F.min("o_custkey"),
        F.max("o_custkey"),
        F.min((F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")),
        F.max((F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")),
    ).collect()[0]
    cust_range = g[1] - g[0] + 1
    price_range = g[3] - g[2] + 1
    # weighted mean per-bucket span: a z-ordered layout bounds BOTH
    # dimensions (a 1-D sort would leave one dimension's span ~ full range)
    span_c = sum(r.n_rows * (r.max_cust - r.min_cust + 1) for r in rows) / n_total
    span_p = sum(
        r.n_rows * (r.max_price_c - r.min_price_c + 1) for r in rows
    ) / n_total
    assert span_c < 0.35 * cust_range, (span_c, cust_range)
    assert span_p < 0.35 * price_range, (span_p, price_range)
    assert {r.zbucket for r in rows} <= set(range(256))


def test_bitmap_exact_distinct_matches_exact(spark):
    from scraping_jobsdb_spark.plans.queries import REGISTRY

    got = {
        r.scope: r.n_distinct
        for r in REGISTRY["bitmap_exact_distinct"]
        .spark_fn(spark, SF_SMOKE)
        .collect()
    }
    ev = load_table(spark, SF_SMOKE, "events")
    exact = {
        r.event_type: r.nd
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("nd"))
        .collect()
    }
    exact["__all__"] = ev.select("user_id").distinct().count()
    assert got == exact


def test_column_profile_matches_numpy_moments(spark):
    import numpy as np

    from scraping_jobsdb_spark.plans.queries import REGISTRY

    rows = {
        r.col_name: r
        for r in REGISTRY["column_profile_orders"].spark_fn(spark, SF_SMOKE).collect()
    }
    o = load_table(spark, SF_SMOKE, "orders").collect()
    series = {
        "price_cents": np.array(
            [int(round(r.o_totalprice * 100)) for r in o], dtype=np.float64
        ),
        "custkey": np.array([r.o_custkey for r in o], dtype=np.float64),
        "orderdate_day": np.array(
            [
                (r.o_orderdate.date() - __import__("datetime").date(1970, 1, 1)).days
                for r in o
            ],
            dtype=np.float64,
        ),
    }
    assert set(rows) == set(series)
    for name, xs in series.items():
        r = rows[name]
        assert r.n_values == len(xs)
        assert r.n_nulls == 0
        assert r.n_distinct == len(set(xs))
        assert (r.min_v, r.max_v) == (int(xs.min()), int(xs.max()))
        mean = xs.mean()
        std = xs.std()  # population
        skew = ((xs - mean) ** 3).mean() / std**3
        kurt = ((xs - mean) ** 4).mean() / std**4 - 3
        assert abs(r.mean - mean) < 1e-6 * max(1, abs(mean))
        assert abs(r.stddev_pop - std) < 1e-6 * max(1, std)
        assert abs(r.skewness - skew) < 1e-6
        assert abs(r.kurtosis_excess - kurt) < 1e-6


def test_range_partition_report_laws(spark):
    from scraping_jobsdb_spark.plans.queries import REGISTRY

    rows = sorted(
        REGISTRY["range_partition_balance_report"]
        .spark_fn(spark, SF_SMOKE)
        .collect(),
        key=lambda r: r.bucket,
    )
    n_total = load_table(spark, SF_SMOKE, "orders").count()
    assert sum(r.n_rows for r in rows) == n_total
    assert [r.bucket for r in rows] == sorted(r.bucket for r in rows)
    # ranges must not overlap: max of bucket i <= min of bucket i+1
    # (boundary keys may tie across adjacent buckets only at the cut)
    for a, b in zip(rows, rows[1:]):
        assert a.max_key <= b.min_key
    # exact-percentile cuts on a near-uniform key give near-balanced
    # buckets
    assert all(0.5 <= r.balance_ratio <= 2.0 for r in rows)


def test_range_partition_approx_matches_exact_within_rank_tolerance(spark):
    """The percentile_approx production twin vs the exact form: every
    approx boundary must sit within the sketch's rank-error bound of its
    exact target rank (accuracy=10000 → ε = 1e-4; generous slack for the
    discrete key grid), and the twin's invariant row must be all-true."""
    from pyspark.sql import functions as F

    from scraping_jobsdb_spark.plans.queries import REGISTRY
    from scraping_jobsdb_spark.sources.tables import load_table as lt

    row = (
        REGISTRY["range_partition_balance_approx"]
        .spark_fn(spark, SF_SMOKE)
        .collect()
    )
    assert len(row) == 1
    r = row[0]
    n_total = lt(spark, SF_SMOKE, "orders").count()
    assert r.total_rows == n_total
    assert r.n_buckets == 16
    assert r.coverage_ok and r.boundaries_monotone and r.balanced

    keys = sorted(
        x.o_custkey for x in lt(spark, SF_SMOKE, "orders").select("o_custkey").collect()
    )
    approx_bs = (
        lt(spark, SF_SMOKE, "orders")
        .agg(
            F.array(
                *[
                    F.expr(
                        "percentile_approx(cast(o_custkey as double),"
                        f" {i}.0D/16.0D, 10000)"
                    )
                    for i in range(1, 16)
                ]
            ).alias("bs")
        )
        .collect()[0]
        .bs
    )
    import bisect

    n = len(keys)
    for i, b in enumerate(approx_bs, start=1):
        target = i * n / 16.0
        # rank window of the returned boundary value inside the sorted keys
        lo = bisect.bisect_left(keys, b)
        hi = bisect.bisect_right(keys, b)
        tol = max(2.0, 2 * n * 1e-4) + (hi - lo)  # ε-bound + tie width
        assert lo - tol <= target <= hi + tol, (
            f"boundary {i}: value {b} spans ranks [{lo},{hi}], "
            f"target {target}"
        )


def test_approx_topk_native_is_exact_within_budget(spark):
    from collections import Counter

    from scraping_jobsdb_spark.plans.queries import REGISTRY
    from scraping_jobsdb_spark.sources.tables import load_table as lt

    got = [
        (r.tok, r.cnt)
        for r in REGISTRY["approx_topk_native"].spark_fn(spark, SF_SMOKE).collect()
    ]
    counts = Counter()
    for r in lt(spark, SF_SMOKE, "documents").filter("text is not null").collect():
        counts.update(r.text.strip().split())
    expected = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert got == expected


def test_txn_time_travel_audit_laws(spark):
    from scraping_jobsdb_spark.plans.queries import REGISTRY

    rows = {
        r.version: r
        for r in REGISTRY["txn_time_travel_audit"].spark_fn(spark, SF_SMOKE).collect()
    }
    assert set(rows) == {1, 2, 3, 4}
    v1, v2, v3, v4 = (rows[i] for i in (1, 2, 3, 4))
    # restore(1) must reproduce the v1 snapshot exactly
    assert (v4.n_rows, v4.sum_cents, v4.n_channel, v4.n_finished) == (
        v1.n_rows,
        v1.sum_cents,
        v1.n_channel,
        v1.n_finished,
    )
    # v2 appends rows carrying the evolved column; v1 has none of it
    assert v1.n_channel == 0 and v2.n_channel == v2.n_rows - v1.n_rows > 0
    # the copy-on-write update adds exactly 100.00 per finished row
    assert v3.n_rows == v2.n_rows
    assert v3.sum_cents == v2.sum_cents + 10000 * v3.n_finished


def test_streaming_indexed_dedup_equals_batch_twin(spark):
    from scraping_jobsdb_spark.plans.queries import REGISTRY

    batch = sorted(
        map(tuple, REGISTRY["incremental_indexed_dedup"].spark_fn(spark, SF_SMOKE).collect())
    )
    stream = sorted(
        map(tuple, REGISTRY["streaming_indexed_dedup"].spark_fn(spark, SF_SMOKE).collect())
    )
    assert batch == stream and len(batch) > 0


def test_rolling_median_matches_python(spark):
    from decimal import Decimal
    from statistics import median

    from scraping_jobsdb_spark.plans.queries import REGISTRY

    got = {
        (r.user_id, r.day): r.rolling_median
        for r in REGISTRY["events_rolling_median"].spark_fn(spark, SF_SMOKE).collect()
    }
    ev = load_table(spark, SF_SMOKE, "events").collect()
    daily: dict = {}
    for r in ev:
        key = (r.user_id, str(r.ts)[:10])
        daily[key] = daily.get(key, Decimal(0)) + Decimal(str(round(r.value, 4)))
    series: dict = {}
    for (uid, day), v in sorted(daily.items()):
        series.setdefault(uid, []).append((day, int(v * 10000)))
    checked = 0
    for uid, pts in series.items():
        for i, (day, _) in enumerate(pts):
            window = [x for _, x in pts[max(0, i - 27): i + 1]]
            assert got[(uid, day)] == median(window) / 10000.0, (uid, day)
            checked += 1
    assert checked == len(got) > 0


def test_global_ordered_rank_equals_global_window_and_is_parallel(spark):
    """global_ordered_rank must produce BIT-IDENTICAL ranks to the bare
    Window.orderBy form for any input (the hash-oracle parity contract of
    curriculum_pack_order), while the corpus-sized side of its plan goes
    through a parallel RANGE exchange — never the Exchange SinglePartition
    the bare form compiles to. The one single-partition window it does
    contain runs over partition COUNTS (<= shuffle.partitions rows), not
    the corpus."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from scraping_jobsdb_spark.operators.windows import global_ordered_rank
    from scraping_jobsdb_spark.sources.tables import load_table

    docs = (
        load_table(spark, SF_SMOKE, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            (F.col("doc_id") % 7).cast("int").alias("bucket"),
            F.md5(F.col("doc_id").cast("string")).alias("shuf"),
        )
    )
    got = {
        r.doc_id: r.position
        for r in global_ordered_rank(
            docs, ["bucket", "shuf", "doc_id"]
        ).collect()
    }
    w = Window.orderBy("bucket", "shuf", "doc_id")
    want = {
        r.doc_id: r.position
        for r in docs.select(
            "doc_id", F.row_number().over(w).cast("bigint").alias("position")
        ).collect()
    }
    assert got == want and len(got) > 0

    out = global_ordered_rank(docs, ["bucket", "shuf", "doc_id"])
    out.collect()  # run it: exchange reuse is an ADAPTIVE (runtime) rule
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()
    # the corpus window is keyed on the materialized partition id
    assert "__gor_pid" in plan
    # CORRECTNESS-CRITICAL plan pin: the offsets branch and the ranked
    # branch must observe IDENTICAL spark_partition_id values, which holds
    # because both consume the SAME physical range exchange. Assert the
    # final adaptive plan has exactly ONE live rangepartitioning Exchange
    # and a ReusedExchange covering the second consumer — if a future
    # AQE/coalescing change decouples the branches (two independent
    # boundary samplings), ranks could go silently wrong; fail here
    # instead.
    final = plan.split("== Initial Plan ==")[0]
    assert "isFinalPlan=true" in final
    live_range_exchanges = [
        ln
        for ln in final.splitlines()
        if "Exchange rangepartitioning" in ln and "ReusedExchange" not in ln
    ]
    reused = [
        ln
        for ln in final.splitlines()
        if "ReusedExchange" in ln and "rangepartitioning" in ln
    ]
    assert len(live_range_exchanges) == 1, final
    assert len(reused) == 1, final


def test_curriculum_approx_matches_exact_within_rank_tolerance(spark):
    """curriculum_pack_order_approx (the percentile_approx production
    twin) vs the exact twin: each approx tertile cut must sit within the
    GK sketch's rank-error bound of its exact target rank over the
    quality distribution, and the twin's invariant row must be all-true
    (VERDICT r12 item 4's evidence split — values in pytest, invariants
    in the gate)."""
    import bisect

    from pyspark.sql import functions as F

    from scraping_jobsdb_spark.operators.textops import quality_score
    from scraping_jobsdb_spark.plans.queries import REGISTRY
    from scraping_jobsdb_spark.sources.tables import load_table as lt

    row = (
        REGISTRY["curriculum_pack_order_approx"]
        .spark_fn(spark, SF_SMOKE)
        .collect()
    )
    assert len(row) == 1
    r = row[0]
    assert r.positions_are_permutation
    assert r.buckets_contiguous_ordered
    assert r.bucket_order_matches_quality
    assert r.cut_rank_error_bounded

    docs = (
        lt(spark, SF_SMOKE, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text")
    )
    assert r.total_rows == docs.count()
    scores = sorted(
        x.q
        for x in docs.select(
            F.round(quality_score("text"), 9).alias("q")
        ).collect()
    )
    approx_cuts = (
        docs.select(F.round(quality_score("text"), 9).alias("q"))
        .agg(
            F.expr(
                "percentile_approx(q, array(1.0D/3.0D, 2.0D/3.0D), 10000)"
            ).alias("qs")
        )
        .collect()[0]
        .qs
    )
    n = len(scores)
    for frac, cut in zip((1.0 / 3.0, 2.0 / 3.0), approx_cuts):
        target = frac * n
        lo = bisect.bisect_left(scores, cut)
        hi = bisect.bisect_right(scores, cut)
        tol = max(2.0, 2 * n * 1e-4)  # ε-bound; tie width via [lo,hi]
        assert lo - tol <= target <= hi + tol, (
            f"cut {cut} at fraction {frac}: rank window [{lo},{hi}], "
            f"target {target}"
        )


def test_steady_admission_queries_are_run_stable(spark):
    """The steady-state index queries settle once per process and must
    return BYTE-IDENTICAL rows on every subsequent run (the epoch replay
    no-ops, the probes self-exclude) — the property that makes a cached
    settled index sound under min-of-N bench timing."""
    from scraping_jobsdb_spark.plans import q_scale_ops
    from scraping_jobsdb_spark.plans.queries import REGISTRY

    for name, kind in (
        ("fpindex_steady_admission", "fpidx"),
        ("lshindex_steady_admission", "lshidx"),
        ("online_admission_intra_batch", "intralsh"),
    ):
        first = sorted(
            tuple(r) for r in REGISTRY[name].spark_fn(spark, SF_SMOKE).collect()
        )
        assert (kind, SF_SMOKE) in q_scale_ops._STEADY_CACHE, name
        path_after_first = q_scale_ops._STEADY_CACHE[(kind, SF_SMOKE)]
        second = sorted(
            tuple(r) for r in REGISTRY[name].spark_fn(spark, SF_SMOKE).collect()
        )
        assert first == second, f"{name}: replay drifted"
        assert (
            q_scale_ops._STEADY_CACHE[(kind, SF_SMOKE)] == path_after_first
        ), f"{name}: settled index was rebuilt on re-run"
        assert len(first) > 0, name
