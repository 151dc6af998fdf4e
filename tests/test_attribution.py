"""Touch attribution: crafted journeys covering direct conversions,
touch ordering, tie-breaks, and the single-window-sort plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from morphik_core_spark.operators.analytics import touch_attribution


def _events(spark):
    # (user, ts_sec, type, value, event_id)
    rows = [
        # user 1: view -> click -> purchase (last=click, first=view)
        (1, 10, "view", None, 1),
        (1, 20, "click", None, 2),
        (1, 30, "purchase", 100.0, 3),
        # user 2: purchase with NO prior touch -> direct; later view then purchase
        (2, 5, "purchase", 50.0, 4),
        (2, 6, "view", None, 5),
        (2, 7, "purchase", 25.0, 6),
        # user 3: tie on ts -> event_id breaks it (click id=8 is later)
        (3, 1, "view", None, 7),
        (3, 1, "click", None, 8),
        (3, 2, "purchase", 10.0, 9),
    ]
    return spark.createDataFrame(
        rows, "user_id int, ts int, event_type string, value double, event_id int"
    )


def _run(spark):
    out = touch_attribution(
        _events(spark), "user_id", "ts", "event_type", "value", "purchase", "event_id"
    )
    return {(r.model, r.channel): (r.n_conversions, r.revenue) for r in out.collect()}


def test_attribution_semantics(spark):
    got = _run(spark)
    assert got[("last_touch", "click")] == (2, 110.0)  # users 1 and 3
    assert got[("last_touch", "view")] == (1, 25.0)  # user 2 second purchase
    assert got[("last_touch", "direct")] == (1, 50.0)  # user 2 first purchase
    # first-touch: user 2's BOTH purchases credit 'view' (first touch ever,
    # even though it happened after the first purchase -> that one is view too)
    assert got[("first_touch", "view")] == (4, 185.0)
    assert ("first_touch", "direct") not in got


def test_single_window_sort(spark):
    out = touch_attribution(
        _events(spark), "user_id", "ts", "event_type", "value", "purchase", "event_id"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # both touch columns must come from ONE Window sort, and the two
    # rollups reuse it — so exactly one Sort over the events input
    assert plan.count("Window") <= 2  # unbounded-following frame may split
    assert "BatchEvalPython" not in plan
