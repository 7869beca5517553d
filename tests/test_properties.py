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


_temporal_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),    # key
        st.integers(min_value=0, max_value=3600), # ts offset seconds
        st.integers(min_value=-50, max_value=50), # value
    ),
    min_size=1,
    max_size=25,
)


def _ts_df(spark, rows, schema_prefix):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, "k int, off int, v int")
    return df.select(
        F.col("k"),
        (F.lit("2024-01-01 00:00:00").cast("timestamp")
         + F.make_interval(secs=F.col("off"))).alias("ts"),
        F.col("v").alias(schema_prefix + "_v"),
        F.col("off").alias(schema_prefix + "_off"),
    )


@given(lrows=_temporal_rows, rrows=_temporal_rows)
@settings(**_SETTINGS)
def test_asof_join_equals_naive_reference(spark, lrows, rrows):
    """Union-sort as-of == naive join → filter → max-ts pick."""
    from pyspark.sql import functions as F

    from scraping_jobsdb_spark.operators.temporal import asof_join

    # dedupe right rows per (key, ts): an as-of pick at equal ts is
    # ambiguous; the operator contract assumes unique (key, ts) on the right
    seen = set()
    rdedup = []
    for k, off, v in rrows:
        if (k, off) not in seen:
            seen.add((k, off))
            rdedup.append((k, off, v))
    left = _ts_df(spark, lrows, "l")
    right = _ts_df(spark, rdedup, "r").select("k", "ts", "r_v")
    got = asof_join(left, right, "k", "ts", "ts", ["r_v"]).collect()

    rmap = {}
    for k, off, v in rdedup:
        rmap.setdefault(k, []).append((off, v))
    expect = []
    for k, off, v in lrows:
        cands = [(ro, rv) for ro, rv in rmap.get(k, []) if ro <= off]
        best = max(cands)[1] if cands else None
        expect.append((k, off, v, best))
    got_t = sorted((r.k, r.l_off, r.l_v, r.asof_r_v) for r in got)
    assert got_t == sorted(expect)


@given(lrows=_temporal_rows)
@settings(**_SETTINGS)
def test_range_join_equals_naive_theta(spark, lrows):
    """Bucket-banded range join == brute-force theta self-join."""
    from scraping_jobsdb_spark.operators.temporal import range_join

    df = _ts_df(spark, lrows, "l").select("k", "ts")
    got = {
        (r.k, r.left_ts.isoformat(), r.right_ts.isoformat())
        for r in range_join(df, df, "k", "ts", "ts", 1, 300).collect()
    }
    rows = [(k, off) for k, off, _ in lrows]
    expect = set()
    from datetime import datetime, timedelta

    base = datetime.fromisoformat("2024-01-01 00:00:00")
    for k1, o1 in rows:
        for k2, o2 in rows:
            if k1 == k2 and o1 + 1 <= o2 <= o1 + 300:
                expect.add(
                    (k1, (base + timedelta(seconds=o1)).isoformat(),
                     (base + timedelta(seconds=o2)).isoformat())
                )
    assert got == expect


# --------------------------------------------------------------------------
# Transactional table model check: a random sequence of append / idempotent-
# append / overwrite / merge must leave the table equal to a plain Python
# dict model applying the same semantics, and every intermediate version
# must remain time-travel readable.
# --------------------------------------------------------------------------

txn_ops = st.lists(
    st.tuples(
        st.sampled_from(["append", "idem", "overwrite", "merge"]),
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=9),   # key (few → conflicts)
                st.text(alphabet="xyz", min_size=1, max_size=3),
            ),
            min_size=1,
            max_size=5,
        ),
    ),
    min_size=1,
    max_size=5,
)


@given(ops=txn_ops)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_txn_table_matches_multiset_model(spark, tmp_path_factory, ops):
    import uuid as _uuid
    from collections import Counter

    from scraping_jobsdb_spark.sources.txn import TxnTable

    path = str(tmp_path_factory.mktemp("txn") / f"t_{_uuid.uuid4().hex[:8]}")

    def df_of(batch):
        return spark.createDataFrame(sorted(batch.items()), "k bigint, v string")

    model = Counter({(0, "seed"): 1})
    t = TxnTable.create(spark, path, df_of({0: "seed"}))

    for op, rows in ops:
        batch = dict(rows)  # one row per key within a batch (last wins)
        if op == "append":
            t.append(df_of(batch))
            model.update((k, v) for k, v in batch.items())
        elif op == "idem":
            t.idempotent_append(df_of(batch), ["k"])
            present = {k for k, _ in model}
            model.update((k, v) for k, v in batch.items() if k not in present)
        elif op == "overwrite":
            t.overwrite(df_of(batch))
            model = Counter((k, v) for k, v in batch.items())
        elif op == "merge":
            src = df_of(batch).withColumnRenamed("v", "nv")
            t.merge(src, on=["k"], when_matched_update={"v": "nv"})
            present = {k for k, _ in model}
            updated = Counter()
            for (k, v), n in model.items():
                updated[(k, batch.get(k, v))] += n
            updated.update(
                (k, v) for k, v in batch.items() if k not in present
            )
            model = updated

    got = Counter((r.k, r.v) for r in t.read().collect())
    assert got == model, (got - model, model - got)

    # every committed version still reads (time travel never breaks)
    for ver in range(1, t.version() + 1):
        assert t.read(version=ver).count() >= 0


@given(
    words=st.lists(
        st.text(alphabet="abcx", min_size=1, max_size=4), min_size=1, max_size=30
    ),
    chunk_size=st.integers(min_value=2, max_value=8),
    overlap=st.integers(min_value=0, max_value=6),
)
@settings(**_SETTINGS)
def test_chunk_documents_reconstruction_and_coverage(
    spark, words, chunk_size, overlap
):
    """Laws: every word position appears in at least one chunk; dropping
    each chunk's first `overlap` words (except chunk 0) and concatenating
    reconstructs the document exactly; chunk count is the ceil formula."""
    from scraping_jobsdb_spark.operators.textops import chunk_documents

    if overlap >= chunk_size:
        return  # operator rejects; covered by the unit test
    step = chunk_size - overlap
    text = " ".join(words)
    docs = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    chunks = sorted(
        (r.chunk_id, r.chunk_text)
        for r in chunk_documents(docs, chunk_size, overlap).collect()
    )
    n = len(words)
    assert len(chunks) == (max(n - 1, 0) // step) + 1
    # reconstruction: chunk 0 whole, then each chunk minus its overlap head
    rebuilt = chunks[0][1].split(" ")
    for _cid, ctext in chunks[1:]:
        rebuilt.extend(ctext.split(" ")[overlap:])
    assert rebuilt == words


@given(lrows=_temporal_rows)
@settings(**_SETTINGS)
def test_asof_forward_equals_naive_reference(spark, lrows):
    """Forward as-of (reversed-scan) == naive min-at-or-after pick; a
    tolerance bound equals naive filtering on the match age."""
    from scraping_jobsdb_spark.operators.temporal import asof_join

    seen = set()
    rdedup = []
    for k, off, v in lrows:
        if (k, off) not in seen:
            seen.add((k, off))
            rdedup.append((k, off, v))
    left = _ts_df(spark, lrows, "l")
    right = _ts_df(spark, rdedup, "r").select("k", "ts", "r_v")
    for tol in (None, 30):
        got = sorted(
            (r.k, r.l_off, r.l_v, r.asof_r_v)
            for r in asof_join(
                left, right, "k", "ts", "ts", ["r_v"],
                direction="forward", tolerance_seconds=tol,
            ).collect()
        )
        rmap = {}
        for k, off, v in rdedup:
            rmap.setdefault(k, []).append((off, v))
        expect = []
        for k, off, v in lrows:
            cands = [
                (ro, rv)
                for ro, rv in rmap.get(k, [])
                if ro >= off and (tol is None or ro - off <= tol)
            ]
            best = min(cands)[1] if cands else None
            expect.append((k, off, v, best))
        assert got == sorted(expect), tol


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),   # key
            st.integers(min_value=0, max_value=25),  # day offset
            st.integers(min_value=-9, max_value=9),  # value
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(**_SETTINGS)
def test_gap_fill_reconstruction_laws(spark, rows):
    """Laws: observed rows == the input; every key's days form the exact
    [first, last] interval with no holes; each filled value equals the
    latest observation at-or-before its day."""
    from datetime import date, timedelta

    from scraping_jobsdb_spark.operators.temporal import gap_fill

    base = date(2024, 3, 1)
    dedup = {}
    for k, off, v in rows:
        dedup[(k, off)] = v  # unique (key, day): last write wins
    data = [(k, base + timedelta(days=off), v) for (k, off), v in dedup.items()]
    df = spark.createDataFrame(data, "k int, d date, v int")
    out = gap_fill(df, ["k"], "d", ["v"]).collect()

    observed = {(r.k, r.d): r.v for r in out if r.is_observed}
    assert observed == {(k, d): v for k, d, v in data}
    by_key = {}
    for k, d, v in data:
        by_key.setdefault(k, []).append((d, v))
    filled = {}
    for r in out:
        assert (r.k, r.d) not in filled, "duplicate day"
        filled[(r.k, r.d)] = r.v
    for k, obs in by_key.items():
        obs.sort()
        days = sorted(d for kk, d in filled if kk == k)
        lo, hi = obs[0][0], obs[-1][0]
        assert days[0] == lo and days[-1] == hi
        assert len(days) == (hi - lo).days + 1  # dense: no holes
        for d in days:
            want = max((od, ov) for od, ov in obs if od <= d)[1]
            assert filled[(k, d)] == want


@given(
    names=st.lists(
        st.text(alphabet="abcx", min_size=1, max_size=8),
        min_size=2,
        max_size=12,
        unique=True,
    )
)
@settings(**_SETTINGS)
def test_fuzzy_join_equals_naive_blocked_reference(spark, names):
    """Blocked fuzzy join == naive reference: all id_a<id_b pairs that
    (a) share at least one char 3-gram and (b) are within levenshtein 2."""
    from scraping_jobsdb_spark.operators.similarity import fuzzy_string_join

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    def grams(s):
        n = max(len(s) - 2, 1)
        return {s[i : i + 3] for i in range(n)}

    rows = list(enumerate(names))
    df = spark.createDataFrame(rows, "id bigint, name string")
    got = {
        (r.id_a, r.id_b, r.distance)
        for r in fuzzy_string_join(
            df, df, "id", "name", "id", "name", max_distance=2
        ).collect()
    }
    expect = {
        (i, j, lev(a, b))
        for i, a in rows
        for j, b in rows
        if i < j and grams(a) & grams(b) and lev(a, b) <= 2
    }
    assert got == expect


_pack_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10_000),  # doc key
        st.integers(min_value=0, max_value=300),     # token count
        st.integers(min_value=0, max_value=2),       # group
    ),
    min_size=1,
    max_size=40,
    unique_by=lambda t: t[0],
)


@given(rows=_pack_rows, cap=st.integers(min_value=1, max_value=128))
@settings(**_SETTINGS)
def test_pack_sequences_laws(spark, rows, cap):
    """Laws on generated corpora: per-group streams are contiguous (offsets
    are the running sums of an md5 total order, no gaps/overlaps), bin ids
    follow from the offsets arithmetically, and the total stream length per
    group equals the group's token sum."""
    import hashlib

    from scraping_jobsdb_spark.operators.sampling import pack_sequences

    df = spark.createDataFrame(rows, "doc_id bigint, n_tokens bigint, g int")
    out = pack_sequences(
        df, "doc_id", "n_tokens", capacity=cap, group_cols=["g"]
    ).collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r.g, []).append(r)
    assert sum(len(v) for v in by_g.values()) == len(rows)
    for g, rs in by_g.items():
        rs.sort(key=lambda r: (hashlib.md5(str(r.doc_id).encode()).hexdigest(), r.doc_id))
        run = 0
        for r in rs:
            assert r.pack_start == run
            run += r.n_tokens
            if r.n_tokens > 0:
                assert r.bin_first == r.pack_start // cap
                assert r.bin_last == (r.pack_start + r.n_tokens - 1) // cap
                assert r.n_bins == r.bin_last - r.bin_first + 1
            else:
                assert r.n_bins == 0
        assert run == sum(n for k, n, gg in rows if gg == g)


@given(rows=_pack_rows, cap=st.integers(min_value=1, max_value=10))
@settings(**_SETTINGS)
def test_cap_per_group_laws(spark, rows, cap):
    """Per-group sizes are min(|group|, cap); the kept set is the md5-rank
    prefix of each group (a pure function of the keys — verified against a
    Python recomputation); ranks are 1..n contiguous."""
    import hashlib

    from scraping_jobsdb_spark.operators.sampling import cap_per_group

    df = spark.createDataFrame(rows, "doc_id bigint, n_tokens bigint, g int")
    out = cap_per_group(df, ["g"], "doc_id", cap).collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r.g, []).append(r)
    groups = {}
    for k, n, g in rows:
        groups.setdefault(g, []).append(k)
    for g, keys in groups.items():
        want = sorted(keys, key=lambda k: (hashlib.md5(str(k).encode()).hexdigest(), k))[:cap]
        got = sorted((r.doc_id for r in by_g.get(g, [])))
        assert got == sorted(want), g
        assert sorted(r.rank_in_group for r in by_g[g]) == list(
            range(1, len(want) + 1)
        )


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000),
            st.floats(min_value=0.0, max_value=5.0, allow_nan=False),
        ),
        min_size=1,
        max_size=30,
        unique_by=lambda t: t[0],
    )
)
@settings(**_SETTINGS)
def test_epochs_expand_laws(spark, rows):
    """Copies per key are floor(w) or floor(w)+1, exactly matching the md5
    draw rule; repeat_idx is 1..n contiguous; total expansion is within
    the deterministic bound; zero weights vanish."""
    import hashlib

    from scraping_jobsdb_spark.operators.sampling import epochs_expand

    df = spark.createDataFrame(rows, "doc_id bigint, w double")
    out = epochs_expand(df, "doc_id", "w").collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r.doc_id, []).append(r.repeat_idx)
    for k, w in rows:
        import math

        draw = int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16)
        extra = 1 if draw < math.floor((w - math.floor(w)) * 2.0**32) else 0
        want = int(math.floor(w)) + extra
        got = sorted(by_key.get(k, []))
        assert got == list(range(1, want + 1)), (k, w, want, got)


corpus_strategy = st.lists(
    st.lists(
        st.sampled_from(["a", "b", "c", "d", "e"]),
        min_size=0,
        max_size=12,
    ),
    min_size=1,
    max_size=25,
)


@given(docs=corpus_strategy)
@settings(**_SETTINGS)
def test_boilerplate_removal_equals_python_reference(spark, docs):
    """boilerplate_span_removal over random tiny-vocab corpora equals a
    direct Python reference: same frequent-trigram set, same covered
    positions, same surviving text, token conservation."""
    from scraping_jobsdb_spark.operators.textops import boilerplate_span_removal

    min_df = 2
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc_id: r for r in boilerplate_span_removal(df, min_df=min_df).collect()}

    # Python reference
    tris: dict[str, set[int]] = {}
    for i, toks in enumerate(docs):
        for s in range(len(toks) - 2):
            tris.setdefault(" ".join(toks[s : s + 3]), set()).add(i)
    freq = {g for g, d in tris.items() if len(d) >= min_df}
    for i, toks in enumerate(docs):
        covered = set()
        for s in range(len(toks) - 2):
            if " ".join(toks[s : s + 3]) in freq:
                covered.update((s, s + 1, s + 2))
        keep = [t for p, t in enumerate(toks) if p not in covered]
        if not toks:
            # an empty doc tokenizes to [''] which the operator filters
            # everywhere — nothing to strike or reassemble, so it drops
            # from the output (the documented too-short rule)
            assert i not in got
            continue
        r = got[i]
        assert r.n_tokens == len(toks), (i, r)
        assert r.n_removed == len(covered), (i, r)
        assert r.clean_text == " ".join(keep), (i, r)


@given(
    groups=st.lists(
        st.integers(min_value=1, max_value=30), min_size=1, max_size=6
    ),
    budget=st.integers(min_value=0, max_value=25),
    alpha=st.sampled_from([0.3, 0.5, 1.0]),
)
@settings(**_SETTINGS)
def test_temperature_mixture_equals_python_reference(spark, groups, budget, alpha):
    """temperature_mixture_sample's allocation equals a direct Python
    largest-remainder reference for random group sizes, budgets and
    temperatures; every group appears; allocations sum to the budget."""
    from decimal import ROUND_HALF_UP, Decimal

    from scraping_jobsdb_spark.operators.sampling import (
        temperature_mixture_sample,
    )

    rows = []
    next_id = 0
    for g, n in enumerate(groups):
        for _ in range(n):
            rows.append((next_id, f"g{g}"))
            next_id += 1
    docs = spark.createDataFrame(rows, "doc_id bigint, lang string")
    got = {r.lang: r for r in temperature_mixture_sample(
        docs, group_col="lang", alpha=alpha, budget=budget
    ).collect()}

    # Python largest-remainder reference over 9-dp quotas
    weights = {f"g{g}": n ** alpha for g, n in enumerate(groups)}
    tot = sum(weights.values())
    q9 = {
        k: Decimal(str(budget * w / tot)).quantize(
            Decimal("0.000000001"), rounding=ROUND_HALF_UP
        )
        for k, w in weights.items()
    }
    base = {k: int(v) for k, v in q9.items()}
    rem = {k: v - base[k] for k, v in q9.items()}
    extra = budget - sum(base.values())
    order = sorted(rem, key=lambda k: (-rem[k], k))
    alloc = {
        k: base[k] + (1 if order.index(k) < extra else 0) for k in q9
    }
    assert len(got) == len(groups)
    assert sum(r.alloc for r in got.values()) == budget
    for g, n in enumerate(groups):
        k = f"g{g}"
        assert got[k].n_docs == n
        assert got[k].alloc == alloc[k], (k, got[k].alloc, alloc[k], q9)
        assert got[k].n_sampled == min(alloc[k], n)


nb_corpus_strategy = st.lists(
    st.tuples(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=1, max_size=8
        ),
        st.booleans(),
    ),
    min_size=2,
    max_size=20,
).filter(lambda rows: any(lab for _, lab in rows) and any(not lab for _, lab in rows))


@given(rows=nb_corpus_strategy)
@settings(**_SETTINGS)
def test_nb_scores_equal_python_reference(spark, rows):
    """nb_quality_scores equals a direct Python naive-Bayes reference
    (add-one smoothing, 9-dp rounded weights, decimal sums) on random
    labelled corpora — guards the decimal precision chain end to end."""
    import math
    from collections import Counter
    from decimal import ROUND_HALF_UP, Decimal

    from scraping_jobsdb_spark.operators.textops import nb_quality_scores

    docs = [(i, " ".join(toks), lab) for i, (toks, lab) in enumerate(rows)]
    df = spark.createDataFrame(docs, "doc_id bigint, text string, lab boolean")
    got = {r.doc_id: r for r in nb_quality_scores(df, label=F.col("lab")).collect()}

    def r9(x):
        return Decimal(str(round(x, 9))).quantize(
            Decimal("0.000000001"), rounding=ROUND_HALF_UP
        )

    cp, cn = Counter(), Counter()
    dp = dn = 0
    for _, text, lab in docs:
        toks = text.split()
        (cp if lab else cn).update(toks)
        if lab:
            dp += 1
        else:
            dn += 1
    np_, nn_ = sum(cp.values()), sum(cn.values())
    vocab = set(cp) | set(cn)
    v = len(vocab)
    w = {
        t: r9(math.log((cp[t] + 1) / (np_ + v)) - math.log((cn[t] + 1) / (nn_ + v)))
        for t in vocab
    }
    prior = r9(math.log(dp) - math.log(dn))
    for i, text, lab in docs:
        tf = Counter(text.split())
        s = prior + sum(Decimal(c) * w[t] for t, c in tf.items())
        assert got[i].score == float(s), (i, got[i].score, float(s))
        assert got[i].predicted == (s > 0)


@given(rows=nb_corpus_strategy)
@settings(**_SETTINGS)
def test_dsir_scores_equal_python_reference(spark, rows):
    """dsir_importance_topk equals a direct Python reference replaying the
    portable md5 bucket hash, the smoothed log-ratios and the decimal
    sums — guards the hash portability contract."""
    import hashlib
    import math
    from collections import Counter
    from decimal import ROUND_HALF_UP, Decimal

    from scraping_jobsdb_spark.operators.textops import dsir_importance_topk

    B = 16
    docs = [(i, " ".join(toks), lab) for i, (toks, lab) in enumerate(rows)]
    df = spark.createDataFrame(docs, "doc_id bigint, text string, t boolean")
    got = {
        r.doc_id: r.score
        for r in dsir_importance_topk(
            df, target=F.col("t"), n_buckets=B, k=len(docs)
        ).collect()
    }

    def bucket(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % B

    def r9(x):
        return Decimal(str(round(x, 9))).quantize(
            Decimal("0.000000001"), rounding=ROUND_HALF_UP
        )

    ct, cr = Counter(), Counter()
    per_doc = {}
    for i, text, lab in docs:
        c = Counter(bucket(t) for t in text.split())
        per_doc[i] = c
        cr.update(c)
        if lab:
            ct.update(c)
    nt, nr = sum(ct.values()), sum(cr.values())
    ratio = {
        b: r9(math.log((ct[b] + 1) / (nt + B)) - math.log((cr[b] + 1) / (nr + B)))
        for b in cr
    }
    for i, _, _ in docs:
        want = float(sum(Decimal(c) * ratio[b] for b, c in per_doc[i].items()))
        assert got[i] == want, (i, got[i], want)
