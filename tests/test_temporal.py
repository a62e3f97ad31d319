"""As-of join + sessionization (functions/temporal.py)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from osmcoastline_spark.functions.temporal import asof_join, sessionize

T0 = dt.datetime(2024, 1, 1)


def _ts(sec):
    return T0 + dt.timedelta(seconds=sec)


def _events(spark, rows):
    # rows: (event_id, user_id, sec, value)
    return spark.createDataFrame(
        [(e, u, _ts(s), float(v)) for e, u, s, v in rows],
        "event_id: long, user_id: long, ts: timestamp, value: double",
    )


def test_sessionize_hand_computed(spark):
    ev = _events(
        spark,
        [
            # user 1: events at 0, 50, 400 s → gap 10 splits after 50
            (1, 1, 0, 1.0),
            (2, 1, 50, 2.0),
            (3, 1, 400, 4.0),
            # user 2: single event
            (4, 2, 10, 8.0),
        ],
    )
    out = sorted(
        (r.user_id, r.session_idx, r.n_events, r.sum_value)
        for r in sessionize(ev, gap_seconds=100).collect()
    )
    assert out == [(1, 1, 2, 3.0), (1, 2, 1, 4.0), (2, 1, 1, 8.0)]
    # sub-second exactness: 100-second gap is NOT a new session (>, not >=)
    ev2 = _events(spark, [(1, 1, 0, 1.0), (2, 1, 100, 2.0)])
    assert sessionize(ev2, gap_seconds=100).count() == 1


def test_sessionize_single_exchange(spark):
    ev = _events(spark, [(1, 1, 0, 1.0), (2, 1, 50, 2.0)])
    plan = (
        sessionize(ev, gap_seconds=100)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan
    assert "Python" not in plan


def test_asof_join_hand_computed(spark):
    left = _events(spark, [(1, 1, 100, 0.0), (2, 1, 200, 0.0), (3, 2, 50, 0.0)])
    right = _events(spark, [(10, 1, 100, 7.0), (11, 1, 150, 9.0), (12, 3, 10, 5.0)])
    out = {
        r.event_id: (r.asof_value, r.asof_ts)
        for r in asof_join(left, right, on="user_id").collect()
    }
    # equal ts matches (ASOF >=); latest-at-or-before wins; no right → NULL
    assert out[1] == (7.0, _ts(100))
    assert out[2] == (9.0, _ts(150))
    assert out[3] == (None, None)


def test_asof_join_matches_brute_force(spark):
    left = _events(
        spark,
        [(i, i % 7, (i * 37) % 500, 0.0) for i in range(120)],
    )
    right = _events(
        spark,
        [(1000 + i, i % 7, (i * 53) % 500, float(i)) for i in range(90)],
    )
    got = {
        r.event_id: r.asof_value
        for r in asof_join(left, right, on="user_id").collect()
    }
    rrows = [(1000 + i, i % 7, (i * 53) % 500, float(i)) for i in range(90)]
    for i in range(120):
        u, t = i % 7, (i * 37) % 500
        cands = [
            (s, v) for _, ru, s, v in rrows if ru == u and s <= t
        ]
        want = max(cands)[1] if cands else None
        assert got[i] == want, (i, got[i], want)


def test_asof_join_null_payload_not_torn(spark):
    """The matched right row is carried ATOMICALLY: a NULL payload in the
    winning (latest) right row must surface as NULL, not be backfilled
    from an older right row (per-column last(ignorenulls) would tear the
    row — mixing asof_value from ts=1 with asof_ts from ts=2)."""
    left = _events(spark, [(1, 1, 300, 0.0)])
    right = spark.createDataFrame(
        [(10, 1, _ts(100), 5.0), (11, 1, _ts(200), None)],
        "event_id: long, user_id: long, ts: timestamp, value: double",
    )
    out = asof_join(left, right, on="user_id").collect()
    assert len(out) == 1
    # the winner is the ts=200 row — BOTH fields must come from it
    assert out[0].asof_ts == _ts(200)
    assert out[0].asof_value is None


def test_asof_join_null_right_ts_excluded(spark):
    """A right row with NULL ts can never satisfy right.ts <= left.ts;
    under nulls-first window ordering it would otherwise become a bogus
    baseline match for left rows that precede every real right row."""
    left = _events(spark, [(1, 1, 50, 0.0)])
    right = spark.createDataFrame(
        [(10, 1, None, 9.0), (11, 1, _ts(100), 7.0)],
        "event_id: long, user_id: long, ts: timestamp, value: double",
    )
    out = asof_join(left, right, on="user_id").collect()
    assert len(out) == 1
    assert out[0].asof_value is None and out[0].asof_ts is None


def test_asof_join_null_key_never_matches(spark):
    """SQL/DuckDB ASOF equality never matches NULL = NULL, but
    partitionBy groups NULLs together — a NULL-key right row must be
    dropped so it can't become the baseline for NULL-key left rows,
    which get NULL payload like any unmatched left row."""
    left = spark.createDataFrame(
        [(1, None, _ts(100), 0.0)],
        "event_id: long, user_id: long, ts: timestamp, value: double",
    )
    right = spark.createDataFrame(
        [(10, None, _ts(50), 7.0)],
        "event_id: long, user_id: long, ts: timestamp, value: double",
    )
    out = asof_join(left, right, on="user_id").collect()
    assert len(out) == 1
    assert out[0].asof_value is None and out[0].asof_ts is None


def test_asof_join_plan_is_joinless(spark):
    left = _events(spark, [(1, 1, 100, 0.0)])
    right = _events(spark, [(10, 1, 50, 7.0)])
    plan = (
        asof_join(left, right, on="user_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan, plan
    assert plan.count("Exchange") == 1, plan


def test_range_join_hand_computed(spark):
    from osmcoastline_spark.functions.temporal import range_join

    points = _events(spark, [(1, 7, 0, 0), (2, 7, 10, 0), (3, 7, 24, 0),
                             (4, 7, 25, 0), (5, 8, 10, 0), (6, 7, 100, 0)])
    intervals = spark.createDataFrame(
        [(100, 7, _ts(5), _ts(25)),   # catches 10, 24 (half-open: not 25)
         (101, 7, _ts(90), _ts(95)),  # catches nothing (100 outside)
         (102, 8, _ts(0), _ts(60)),   # other key: catches point 5 only
         (103, 7, _ts(50), _ts(50))], # empty interval: dropped
        "ivl_id: long, user_id: long, lo: timestamp, hi: timestamp",
    )
    got = sorted(
        (r.event_id, r.ivl_ivl_id)
        for r in range_join(points, intervals, on="user_id", bin_width_s=7.0).collect()
    )
    assert got == [(2, 100), (3, 100), (5, 102)]

    # without the equi key the join is bin-only: point 5 (user 8) now also
    # falls inside interval 100's window
    got_any = sorted(
        (r.event_id, r.ivl_ivl_id)
        for r in range_join(points, intervals, bin_width_s=7.0).collect()
    )
    assert got_any == [(1, 102), (2, 100), (2, 102), (3, 100), (3, 102),
                       (4, 102), (5, 100), (5, 102)]

    # plan: a single equi-join, never a cartesian/nested-loop
    plan = range_join(points, intervals, on="user_id")._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "NestedLoop" not in plan, plan

    import pytest as _pytest
    with _pytest.raises(ValueError, match="bin_width_s"):
        range_join(points, intervals, bin_width_s=0)

    # oversized interval fails loudly inside the plan, not silently explodes
    wide = spark.createDataFrame(
        [(1, 7, _ts(0), _ts(10_000))], "ivl_id: long, user_id: long, lo: timestamp, hi: timestamp"
    )
    with _pytest.raises(Exception, match="covers > 4 bins"):
        range_join(points, wide, on="user_id", bin_width_s=7.0,
                   max_bins_per_interval=4).collect()


@pytest.mark.parametrize(
    "bin_width_s,keyed",
    [
        (10.0, True),   # intervals usually span several bins
        (10.0, False),  # bin-only join
        (500.0, True),  # bin much wider than every interval (single bin)
        (1.0, True),    # bin much narrower (long explodes, < max_bins)
        (7.0, True),    # width coprime to the boundary lattice below
    ],
)
def test_range_join_boundary_grid_matches_brute_force(spark, bin_width_s, keyed):
    """Adversarial bin-boundary grid: binned range join == definitional
    crossJoin + inequality filter when points and interval endpoints are
    deliberately snapped onto bin-boundary multiples — where an off-by-one
    in first_bin/last_bin (the (hi-1) half-open trick) would show up."""
    import random as _random

    from osmcoastline_spark.functions.temporal import range_join

    rng = _random.Random(int(bin_width_s * 10) + keyed)
    # timestamps on a lattice of 10s steps: with bin_width 10 most values
    # sit EXACTLY on bin boundaries; with 7 they straddle them
    pts = [(i, rng.randrange(3), rng.randrange(0, 40) * 10, 0.0) for i in range(60)]
    ivls = []
    for j in range(40):
        lo = rng.randrange(0, 40) * 10
        hi = lo + rng.choice([0, 10, 10, 25, 70])  # incl. empty + multi-bin
        ivls.append((j, rng.randrange(3), _ts(lo), _ts(hi)))
    points = _events(spark, pts)
    intervals = spark.createDataFrame(
        ivls, "ivl_id: long, user_id: long, lo: timestamp, hi: timestamp"
    )

    on = "user_id" if keyed else None
    got = sorted(
        (r.event_id, r.ivl_ivl_id)
        for r in range_join(points, intervals, on=on, bin_width_s=bin_width_s).collect()
    )

    ref_pairs = []
    for e, u, s, _v in pts:
        for j, iu, lo, hi in ivls:
            if lo <= _ts(s) < hi and (not keyed or u == iu):
                ref_pairs.append((e, j))
    assert got == sorted(ref_pairs)
    assert len(got) > 0  # non-vacuous for every config


def test_sessionize_random_matches_pure_python(spark):
    """200 random events, sub-second gaps included: Spark sessionization ==
    a pure-Python scan (exact integer-microsecond gap comparison)."""
    import random as _random

    rng = _random.Random(7)
    rows = []
    eid = 0
    for u in range(5):
        t = 0.0
        for _ in range(40):
            t += rng.choice([0.5, 1.0, 9.999, 10.0, 10.001, 120.0])
            rows.append((eid, u, t, float(rng.randrange(10))))
            eid += 1
    ev = spark.createDataFrame(
        [(e, u, T0 + dt.timedelta(seconds=s), v) for e, u, s, v in rows],
        "event_id: long, user_id: long, ts: timestamp, value: double",
    )
    got = {
        (r.user_id, r.session_idx): (r.session_start, r.session_end, r.n_events, r.sum_value)
        for r in sessionize(ev, gap_seconds=10).collect()
    }

    ref = {}
    for u in range(5):
        mine = sorted((s, e, v) for e, uu, s, v in rows if uu == u)
        idx, prev = 0, None
        for s, e, v in mine:
            us = round(s * 1_000_000)
            if prev is None or us - prev > 10 * 1_000_000:
                idx += 1
            prev = us
            key = (u, idx)
            st, en, n, sv = ref.get(key, (s, s, 0, 0.0))
            ref[key] = (min(st, s), max(en, s), n + 1, sv + v)
    assert set(got) == set(ref)
    for k, (st, en, n, sv) in ref.items():
        g = got[k]
        assert (g[0], g[1]) == (T0 + dt.timedelta(seconds=st), T0 + dt.timedelta(seconds=en))
        assert g[2] == n and abs(g[3] - sv) < 1e-9


def test_asof_random_matches_pure_python(spark):
    """Random left/right streams incl. exact-tie timestamps: the union+window
    as-of == a pure-Python latest-right-<=-left scan (ties: right at equal
    ts matches; right-side same-ts ties resolve to max payload)."""
    import random as _random

    rng = _random.Random(11)
    lrows = [(i, rng.randrange(4), rng.randrange(0, 50) * 2, 0.0) for i in range(80)]
    rrows = [(1000 + i, rng.randrange(4), rng.randrange(0, 50) * 2, float(rng.randrange(100)))
             for i in range(60)]
    left = _events(spark, lrows)
    right = _events(spark, rrows).select("user_id", "ts", "value")
    got = {
        r.event_id: r.asof_value
        for r in asof_join(left, right, on="user_id", payload_cols=("value",)).collect()
    }
    assert len(got) == len(lrows)
    for e, u, s, _v in lrows:
        cands = [(ss, v) for _i, uu, ss, v in rrows if uu == u and ss <= s]
        want = max(cands)[1] if cands else None
        assert got[e] == want, (e, got[e], want)


def test_rolling_stats_hand_computed(spark):
    from osmcoastline_spark.functions.temporal import rolling_stats

    ev = _events(
        spark,
        [
            # user 1: events at 0, 30, 100, 200 s; 100 s window
            (1, 1, 0, 1.0),
            (2, 1, 30, 2.0),
            (3, 1, 100, 4.0),
            (4, 1, 200, 8.0),
            # user 2: single event
            (5, 2, 10, 16.0),
        ],
    )
    out = {
        r["event_id"]: r
        for r in rolling_stats(ev, window_seconds=100).collect()
    }
    # frame is [ts-100s, ts] inclusive on both ends
    assert (out[1]["n_window"], out[1]["sum_window_micros"]) == (1, 1_000_000)
    assert (out[2]["n_window"], out[2]["sum_window_micros"]) == (2, 3_000_000)
    # event 3 at t=100: frame [0,100] includes all three → 7.0
    assert (out[3]["n_window"], out[3]["sum_window_micros"]) == (3, 7_000_000)
    # event 4 at t=200: frame [100,200] includes events 3,4 → 12.0
    assert (out[4]["n_window"], out[4]["sum_window_micros"]) == (2, 12_000_000)
    assert out[5]["n_window"] == 1
    # gaps: first event per user carries the -1 sentinel
    assert out[1]["gap_prev_us"] == -1
    assert out[2]["gap_prev_us"] == 30_000_000
    assert out[3]["gap_prev_us"] == 70_000_000
    assert out[5]["gap_prev_us"] == -1


def test_rolling_stats_ties_are_peer_inclusive(spark):
    from osmcoastline_spark.functions.temporal import rolling_stats

    # two events at the SAME (user, ts): RANGE frames are peer-inclusive,
    # so both rows must see both events regardless of intra-peer order
    ev = _events(spark, [(1, 1, 50, 1.0), (2, 1, 50, 2.0)])
    rows = {r["event_id"]: r for r in rolling_stats(ev, 100).collect()}
    for e in (1, 2):
        assert rows[e]["n_window"] == 2
        assert rows[e]["sum_window_micros"] == 3_000_000
    # lag is made deterministic by the (ts, event_id) tiebreak
    assert rows[1]["gap_prev_us"] == -1
    assert rows[2]["gap_prev_us"] == 0


def test_rolling_stats_single_exchange(spark):
    from osmcoastline_spark.functions.temporal import rolling_stats

    ev = _events(spark, [(1, 1, 0, 1.0), (2, 1, 30, 2.0)])
    plan = (
        rolling_stats(ev, 3600)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan, plan


# ---------------------------------------------------------- interval_join


def _mk_iv(spark, rows, cols="iid long, lo timestamp, hi timestamp"):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    to_ts = lambda m: base + dt.timedelta(minutes=m)  # noqa: E731
    return spark.createDataFrame(
        [(i, to_ts(a), to_ts(b)) for i, a, b in rows], cols
    )


def test_interval_join_hand_and_halfopen(spark):
    from osmcoastline_spark.functions.temporal import interval_join

    left = _mk_iv(spark, [(1, 0, 10), (2, 20, 30), (3, 40, 40)])  # 3 empty
    right = _mk_iv(spark, [(10, 5, 8), (11, 10, 20), (12, 25, 60)],
                   "rid long, lo timestamp, hi timestamp")
    out = interval_join(left, right, bin_width_s=600)
    got = {(r.iid, r.r_rid, r.overlap_us) for r in out.collect()}
    # 1x10 overlap [5,8); 1x11 touch at 10 -> NO (half-open);
    # 2x12 overlap [25,30); empty interval 3 drops
    assert got == {(1, 10, 3 * 60_000_000), (2, 12, 5 * 60_000_000)}


def test_interval_join_matches_bruteforce(spark):
    import random

    from osmcoastline_spark.functions.temporal import interval_join

    rng = random.Random(3)
    lrows = [(i, m := rng.randrange(0, 3000), m + rng.randrange(1, 120)) for i in range(120)]
    rrows = [(i, m := rng.randrange(0, 3000), m + rng.randrange(1, 200)) for i in range(80)]
    left = _mk_iv(spark, lrows)
    right = _mk_iv(spark, rrows, "rid long, lo timestamp, hi timestamp")
    # deliberately small bins so intervals span many bins (dup-risk path)
    out = interval_join(left, right, bin_width_s=60 * 7)
    got = sorted((r.iid, r.r_rid, r.overlap_us) for r in out.collect())
    want = sorted(
        (li, ri, (min(lh, rh) - max(ll, rl)) * 60_000_000)
        for li, ll, lh in lrows
        for ri, rl, rh in rrows
        if ll < rh and rl < lh
    )
    assert got == want  # equality implies exactly-once: no dup pairs


def test_interval_join_keyed_plan_and_cap(spark):
    import datetime as dt

    import pytest as _pt

    from osmcoastline_spark.functions.temporal import interval_join

    base = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(1, "a", base, base + dt.timedelta(minutes=10)),
         (2, "b", base, base + dt.timedelta(minutes=10))],
        "iid long, k string, lo timestamp, hi timestamp",
    )
    right = spark.createDataFrame(
        [(9, "a", base + dt.timedelta(minutes=5), base + dt.timedelta(minutes=15))],
        "rid long, k string, lo timestamp, hi timestamp",
    )
    out = interval_join(left, right, on="k", bin_width_s=600)
    rows = out.collect()
    assert [(r.iid, r.r_rid) for r in rows] == [(1, 9)]  # key blocks iid=2
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    wide = spark.createDataFrame(
        [(1, base, base + dt.timedelta(days=400))],
        "iid long, lo timestamp, hi timestamp",
    )
    with _pt.raises(Exception, match="covers >"):
        interval_join(wide, right.drop("k"), bin_width_s=1.0).collect()
