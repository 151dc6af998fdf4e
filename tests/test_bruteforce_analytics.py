"""Brute-force reference checks for the analytics/session operators:
random event streams scored by plain Python, compared exactly against
the distributed implementations (seeded cases — each case is a Spark
job, so a few good seeds beat hypothesis here)."""

from __future__ import annotations

import datetime
import random
from collections import defaultdict

import pytest
from pyspark.sql import functions as F

T0 = datetime.datetime(2026, 1, 1)


def _events(seed, n_users=6, n_events=120):
    rng = random.Random(seed)
    rows = []
    for eid in range(n_events):
        rows.append(
            (
                eid,
                rng.randrange(n_users),
                T0 + datetime.timedelta(seconds=rng.randrange(100_000)),
                rng.choice(["view", "click", "purchase", "error"]),
                round(rng.uniform(0, 100), 3),
            )
        )
    return rows


SCHEMA = "event_id int, user_id int, ts timestamp, event_type string, value double"


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_funnel_matches_bruteforce(spark, seed):
    from morphik_core_spark.operators.analytics import funnel_counts

    rows = _events(seed)
    steps = ["view", "click", "purchase"]
    got = {
        r["step_name"]: r["n_users"]
        for r in funnel_counts(
            spark.createDataFrame(rows, SCHEMA), "user_id", "ts", "event_type", steps
        ).collect()
    }
    # brute force: per user, walk steps strictly forward via earliest-next
    reach = defaultdict(int)
    by_user = defaultdict(list)
    for eid, u, ts, et, v in rows:
        by_user[u].append((ts, et))
    for u, evs in by_user.items():
        t_prev = None
        for si, step in enumerate(steps):
            cand = [t for t, et in evs if et == step and (t_prev is None or t > t_prev)]
            if not cand:
                break
            t_prev = min(cand)
            reach[step] += 1
    for s in steps:
        assert got.get(s, 0) == reach.get(s, 0), (s, got, reach)


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_scd2_matches_bruteforce(spark, seed):
    from morphik_core_spark.operators.sessions import change_intervals

    rows = _events(seed)
    got = sorted(
        (r["user_id"], r["valid_from"], r["event_type"], r["n_events"], r["valid_to"], r["is_current"])
        for r in change_intervals(
            spark.createDataFrame(rows, SCHEMA), "user_id", "ts", "event_id", "event_type"
        ).collect()
    )
    exp = []
    by_user = defaultdict(list)
    for eid, u, ts, et, v in rows:
        by_user[u].append((ts, eid, et))
    for u, evs in by_user.items():
        evs.sort()
        islands = []
        for ts, eid, et in evs:
            if islands and islands[-1]["state"] == et:
                islands[-1]["n"] += 1
                islands[-1]["last_ts"] = ts
            else:
                islands.append({"state": et, "n": 1, "from": ts, "last_ts": ts})
        for i, isl in enumerate(islands):
            nxt = islands[i + 1]["from"] if i + 1 < len(islands) else None
            exp.append((u, isl["from"], isl["state"], isl["n"], nxt, nxt is None))
    assert got == sorted(exp)


@pytest.mark.parametrize("seed", [1, 2])
def test_moving_aggregates_matches_bruteforce(spark, seed):
    from decimal import Decimal

    from morphik_core_spark.operators.sessions import moving_aggregates

    rows = _events(seed, n_users=3, n_events=60)
    out = moving_aggregates(
        spark.createDataFrame(rows, SCHEMA), "user_id", "ts", "event_id", "value"
    ).collect()
    got = {(r["user_id"], r["event_id"]): r for r in out}
    by_user = defaultdict(list)
    for eid, u, ts, et, v in rows:
        by_user[u].append((ts, eid, v))
    q = Decimal("0.000001")
    for u, evs in by_user.items():
        evs.sort()
        for i, (ts, eid, v) in enumerate(evs):
            win = evs[max(0, i - 5) : i + 1]
            r = got[(u, eid)]
            assert r["mov_cnt"] == len(win)
            assert r["mov_min"] == min(x[2] for x in win)
            assert r["mov_max"] == max(x[2] for x in win)
            exp_sum = sum(Decimal(str(x[2])).quantize(q) for x in win)
            assert r["mov_sum"] == exp_sum.quantize(q)


@pytest.mark.parametrize("seed", [1, 2])
def test_cohort_retention_matches_bruteforce(spark, seed):
    from morphik_core_spark.operators.analytics import cohort_retention

    rows = _events(seed)
    week_us = 7 * 86400 * 1_000_000
    got = {
        (r["cohort_week"], r["week_offset"]): r["n_users"]
        for r in cohort_retention(spark.createDataFrame(rows, SCHEMA), "user_id", "ts").collect()
    }
    epoch = datetime.datetime(1970, 1, 1)
    weeks = defaultdict(set)
    for eid, u, ts, et, v in rows:
        w = int((ts - epoch).total_seconds() * 1_000_000) // week_us
        weeks[u].add(w)
    exp = defaultdict(int)
    for u, ws in weeks.items():
        c = min(ws)
        for w in ws:
            exp[(c, w - c)] += 1
    assert got == dict(exp)


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_average_precision_matches_bruteforce(spark, seed):
    from morphik_core_spark.operators.ml_eval import average_precision

    rng = random.Random(seed)
    rows = [(round(rng.choice([0.1, 0.25, 0.5, 0.75, 0.9]) + rng.random() * 0.05, 6),
             rng.randrange(2)) for _ in range(200)]
    [r] = average_precision(
        spark.createDataFrame(rows, "s double, y int"), "s", "y"
    ).collect()
    # group-level step AP reference
    groups = defaultdict(lambda: [0, 0])
    for s, y in rows:
        g = groups[round(s * 1e6)]
        g[0] += 1
        g[1] += y
    tp = n = 0
    terms = []
    n_pos = sum(y for _, y in rows)
    for s in sorted(groups, reverse=True):
        cnt, pos = groups[s]
        tp += pos
        n += cnt
        terms.append(round(pos * tp * 1e12 / n))
    expect = round(sum(terms) / (n_pos * 1e12), 6)
    assert r["pr_auc"] == expect
    assert r["n_pos"] == n_pos


@pytest.mark.parametrize("seed", [21, 22, 23])
def test_exact_global_rank_matches_bruteforce(spark, seed):
    from morphik_core_spark.plans.ranking import exact_global_rank

    rng = random.Random(seed)
    rows = [(i, rng.randrange(12)) for i in range(150)]
    got = {
        r.id: r.rank
        for r in exact_global_rank(
            spark.createDataFrame(rows, "id long, v long"), "v", "id", ascending=False
        ).collect()
    }
    order = sorted(rows, key=lambda t: (-t[1], t[0]))
    expect = {rid: i + 1 for i, (rid, _) in enumerate(order)}
    assert got == expect


@pytest.mark.parametrize("seed", [31, 32])
def test_length_matching_keep_matches_hash_mirror(spark, seed):
    """The integer keep inequality must reproduce the portable hash
    decision exactly — the kept counts equal a plain-Python replay."""
    import hashlib

    from morphik_core_spark.operators.curation import length_matching

    rng = random.Random(seed)
    rows = [(i, rng.choice([40, 140, 150, 160, 240])) for i in range(300)]
    out = {r.bucket: r.kept_n for r in length_matching(
        spark.createDataFrame(rows, "doc_id long, n_chars int"), "doc_id", "n_chars"
    ).collect()}
    hist = defaultdict(int)
    for _i, c in rows:
        hist[c // 100] += 1
    nmin = min(hist.values())
    expect = defaultdict(int)
    for i, c in rows:
        h = int(hashlib.md5(f"lm:{i}".encode()).hexdigest()[:15], 16) % 1_000_000
        if h * hist[c // 100] < nmin * 1_000_000:
            expect[c // 100] += 1
    assert out == dict(expect)
