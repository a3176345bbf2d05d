"""Hypothesis property fuzzing for the round-6 lanes: the CMS
one-sided-error / mass-conservation / mergeability contracts and the
ExactSubstr coverage guarantee, on GENERATED inputs rather than the
fixture (complements the fixed oracle rows with adversarial shapes:
heavy skew, tiny widths, pathological duplication)."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from team_02_spark.operators.dedup import substring_duplicate_spans
from team_02_spark.operators.sketches import (
    estimate_cms,
    merge_cms,
    shard_cms,
)

# small alphabets force collisions and duplication; weights force skew
VALUES = st.lists(
    st.sampled_from([f"v{i}" for i in range(12)]),
    min_size=1, max_size=120,
)

_SETTINGS = settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@_SETTINGS
@given(stream=VALUES, width=st.sampled_from([2, 16, 8192]))
def test_cms_contract_on_random_streams(spark, stream, width):
    """For ANY stream and ANY width: (a) per-depth counter mass equals
    the stream length, (b) every estimate >= the exact count, and
    (c) sharded build == single-partition build exactly."""
    df = spark.createDataFrame([(v,) for v in stream], "item string")
    cms = merge_cms(
        shard_cms(df.repartition(4), keys=[], value="item", width=width),
        keys=[],
    )
    mass = {r.depth: r.s for r in
            cms.groupBy("depth").agg(F.sum("cnt").alias("s")).collect()}
    assert set(mass.values()) == {len(stream)}

    exact = Counter(stream)
    items = spark.createDataFrame(
        [(v,) for v in exact], "item string")
    est = estimate_cms(cms, items, value="item", width=width).collect()
    for r in est:
        assert r.est >= exact[r.item], (r.item, r.est, exact[r.item])

    single = merge_cms(
        shard_cms(df.coalesce(1), keys=[], value="item", width=width),
        keys=[],
    )
    assert cms.exceptAll(single).count() == 0
    assert single.exceptAll(cms).count() == 0


DOC = st.lists(
    st.sampled_from(list("abcdef")), min_size=1, max_size=14
).map(lambda toks: " ".join(toks))


@_SETTINGS
@given(docs=st.lists(DOC, min_size=2, max_size=6))
def test_substring_spans_cover_every_cross_doc_kgram(spark, docs):
    """Ground-truth check on random corpora: for every token 3-gram
    occurring in >= 2 documents, every occurrence EXCEPT exactly one
    global canonical must fall inside a reported span — and spans
    never touch docs with no cross-doc gram."""
    k = 3
    rows = list(enumerate(docs, start=1))
    df = spark.createDataFrame(
        [(i, d) for i, d in rows], "doc_id bigint, text string")
    spans = substring_duplicate_spans(df, k=k).collect()
    covered = {}
    for r in spans:
        covered.setdefault(r.doc_id, set()).update(
            range(r.span_start, r.span_end + 1))

    occs = {}
    for i, d in rows:
        toks = d.split()
        for p in range(len(toks) - k + 1):
            occs.setdefault(" ".join(toks[p:p + k]), []).append((i, p))
    for gram, sites in occs.items():
        if len({i for i, _ in sites}) < 2:
            continue
        canonical = min((i * 1_000_000 + p, i, p) for i, p in sites)
        for i, p in sites:
            if (i * 1_000_000 + p) == canonical[0]:
                continue
            span_range = set(range(p, p + k))
            assert span_range <= covered.get(i, set()), (
                f"occurrence of {gram!r} at doc {i} pos {p} uncovered")

    dup_docs = {
        i for gram, sites in occs.items()
        if len({i for i, _ in sites}) >= 2
        for i, _ in sites
    }
    assert set(covered) <= dup_docs


KEY_SETS = st.lists(
    st.integers(min_value=0, max_value=400),
    min_size=1, max_size=80, unique=True,
)


@_SETTINGS
@given(keys=KEY_SETS, bucket=st.sampled_from([1, 7, 64, 10000]))
def test_gap_ranges_equal_sorted_scan(spark, keys, bucket):
    """For ANY key set and ANY bucket size, the bucket-parallel gap
    plan equals the plain sorted scan, and total gap length equals
    the missing-key count."""
    from team_02_spark.queries.stats_queries import gap_ranges

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = sorted(
        (r.gap_start, r.gap_len)
        for r in gap_ranges(df.repartition(3), bucket_size=bucket).collect()
    )
    ks = sorted(keys)
    expected = [
        (a + 1, b - a - 1)
        for a, b in zip(ks, ks[1:])
        if b - a > 1
    ]
    assert got == expected
    assert sum(g for _, g in got) == (ks[-1] - ks[0] + 1) - len(ks)


POINTS = st.lists(
    st.tuples(st.integers(min_value=0, max_value=300000),
              st.integers(min_value=1, max_value=20)),
    min_size=1, max_size=60,
)


@_SETTINGS
@given(points=POINTS, band=st.sampled_from([1, 1000, 100000]))
def test_skyline_banded_equals_naive(spark, points, band):
    """For ANY point set and ANY band size, the banded frontier
    equals brute-force dominance filtering."""
    from team_02_spark.queries.stats_queries import skyline_frontier

    rows = [(i, p, s) for i, (p, s) in enumerate(points)]
    df = spark.createDataFrame(
        rows, "p_partkey long, price_cents long, size long"
    ).repartition(3)
    got = sorted(
        (r.p_partkey, r.price_cents, r.size)
        for r in skyline_frontier(df, band_size=band).collect()
    )
    expected = sorted(
        (i, p, s)
        for i, p, s in rows
        if not any(
            (p2 <= p and s2 <= s and (p2 < p or s2 < s))
            for _, p2, s2 in rows
        )
    )
    assert got == expected


USER_DAYS = st.lists(
    st.tuples(st.integers(min_value=1, max_value=4),
              st.integers(min_value=0, max_value=25)),
    min_size=1, max_size=60,
)


@_SETTINGS
@given(pairs=USER_DAYS)
def test_islands_and_growth_identities_on_random_activity(spark, pairs):
    """For ANY (user, day) activity set: islands rebuild the exact
    per-user active-day count and longest streak (checked against a
    python fold), and growth accounting conserves flows
    (new+retained+resurrected == DAU; retained+churned == DAU(d-1))."""
    from collections import defaultdict

    from team_02_spark.queries.stats_queries import (
        q_gaps_islands,
        q_growth_accounting,
    )

    uniq = sorted(set(pairs))
    # events fixture shape: the lanes read ts/user_id via load_table —
    # fuzz the core logic through a parquet round-trip of the same shape
    import datetime
    import os
    import tempfile

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (i, base + datetime.timedelta(days=d, minutes=i % 7), u, "view",
         1.0, "{}")
        for i, (u, d) in enumerate(uniq)
    ]
    tmp = tempfile.mkdtemp()
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(os.path.join(tmp, "events.parquet"))

    got = {r.user_id: (r.n_active_days, r.n_islands, r.longest_streak)
           for r in q_gaps_islands(spark, tmp).collect()}
    per_user = defaultdict(set)
    for u, d in uniq:
        per_user[u].add(d)
    for u, days in per_user.items():
        ds = sorted(days)
        runs, cur, longest = 1, 1, 1
        for a, b in zip(ds, ds[1:]):
            if b == a + 1:
                cur += 1
            else:
                runs += 1
                cur = 1
            longest = max(longest, cur)
        assert got[u] == (len(ds), runs, longest), (u, got[u])

    ga = {r.day_num: r for r in q_growth_accounting(spark, tmp).collect()}
    active_by_day = defaultdict(set)
    for u, d in uniq:
        active_by_day[d].add(u)
    for d, users in active_by_day.items():
        r = ga[d + 19723]  # epoch day of 2024-01-01
        assert r.n_new + r.n_retained + r.n_resurrected == len(users)
        prev = active_by_day.get(d - 1, set())
        assert r.n_retained + r.n_churned_from_prev == len(prev)


EVENTS = st.lists(
    st.tuples(st.integers(min_value=1, max_value=3),      # user
              st.integers(min_value=0, max_value=500000), # seconds offset
              st.sampled_from(["a", "b"]),                # type
              st.integers(min_value=1, max_value=40000)), # value x100
    min_size=2, max_size=50,
)


@_SETTINGS
@given(evs=EVENTS)
def test_twap_matches_python_fold_on_random_streams(spark, evs):
    """For ANY event stream, q_twap's integer output must equal an
    exact python reimplementation of the spec (value held until the
    user's next event, whole-second weights, floor-DIV exits)."""
    import datetime
    import os
    import tempfile
    from collections import defaultdict

    from team_02_spark.queries.stats_queries import q_twap

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (i, base + datetime.timedelta(seconds=s, microseconds=i % 997),
         u, ty, v / 100.0, "{}")
        for i, (u, s, ty, v) in enumerate(evs)
    ]
    tmp = tempfile.mkdtemp()
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(os.path.join(tmp, "events.parquet"))

    got = {r.event_type: (r.n_intervals, r.total_s, r.twap_x10000)
           for r in q_twap(spark, tmp).collect()}

    per_user = defaultdict(list)
    for i, (u, s, ty, v) in enumerate(evs):
        us = s * 1_000_000 + (i % 997)
        per_user[u].append((us, i, ty, v * 100))  # v4 = x100 value * 100
    agg = defaultdict(lambda: [0, 0, 0])  # type -> [n, sum_dt, sum_v4dt]
    for u, lst in per_user.items():
        lst.sort()
        for (us, _, ty, v4), (us2, _, _, _) in zip(lst, lst[1:]):
            dt_s = (us2 - us) // 1_000_000
            if dt_s > 0:
                a = agg[ty]
                a[0] += 1
                a[1] += dt_s
                a[2] += v4 * dt_s
    expected = {
        ty: (n, sdt, sv // sdt) for ty, (n, sdt, sv) in agg.items() if n
    }
    assert got == expected
