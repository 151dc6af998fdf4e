"""Incremental aggregate state: merge == full recompute, order/shape
independence, multi-generation schema stability, NULL measures."""

from __future__ import annotations

from pyspark.sql import functions as F

from morphik_core_spark.operators.incremental import (
    agg_state,
    finalize_agg,
    merge_agg_states,
)


def _events(spark):
    rows = [
        ("a", 1, 10.0),
        ("a", 1, 20.5),
        ("a", 2, None),
        ("b", 1, 7.25),
        ("b", 3, 1.0),
        ("b", 3, 2.0),
        ("b", 3, 4.0),
    ]
    return spark.createDataFrame(rows, "k string, day int, value double")


def _norm(df):
    return sorted(map(tuple, df.collect()))


def test_merge_equals_full_recompute(spark):
    ev = _events(spark)
    keys = ["k", "day"]
    full = agg_state(ev, keys, {"v": "value"})
    for split in [1, 3, 6]:
        parts = [
            agg_state(ev.filter(F.col("day") <= split), keys, {"v": "value"}),
            agg_state(ev.filter(F.col("day") > split), keys, {"v": "value"}),
        ]
        merged = merge_agg_states(parts, keys)
        assert _norm(merged) == _norm(full), f"split={split}"


def test_merge_order_independent_and_regenerational(spark):
    ev = _events(spark)
    keys = ["k", "day"]
    s1 = agg_state(ev.filter("day = 1"), keys, {"v": "value"})
    s2 = agg_state(ev.filter("day = 2"), keys, {"v": "value"})
    s3 = agg_state(ev.filter("day = 3"), keys, {"v": "value"})
    ab_c = merge_agg_states([merge_agg_states([s1, s2], keys), s3], keys)
    c_ba = merge_agg_states([s3, merge_agg_states([s2, s1], keys)], keys)
    assert _norm(ab_c) == _norm(c_ba)
    # dtypes stay fixed across merge generations (no DECIMAL widening
    # creep); nullability of n legitimately differs (count vs sum-of-n)
    assert ab_c.dtypes == s1.dtypes


def test_null_measures_skipped_but_counted(spark):
    ev = _events(spark)
    state = agg_state(ev, ["k"], {"v": "value"})
    rows = {r.k: r for r in state.collect()}
    assert rows["a"].n == 3  # NULL value row still counts
    assert float(rows["a"].sum_v) == 30.5


def test_finalize_means(spark):
    ev = _events(spark)
    out = finalize_agg(agg_state(ev, ["k"], {"v": "value"}), means=["v"])
    rows = {r.k: r for r in out.collect()}
    assert rows["b"].mean_v == round(14.25 / 4, 6)


def test_incremental_join_apply_equals_recompute(spark):
    """merge == recompute: maintaining A join B under an I/U/D delta on A
    must produce exactly the join of the CDC-applied A against B."""
    from morphik_core_spark.operators.incremental import incremental_join_apply

    a = spark.createDataFrame(
        [(1, 10, "a1"), (2, 20, "a2"), (3, 10, "a3"), (4, 30, "a4")],
        "pk long, fk long, payload string",
    )
    b = spark.createDataFrame(
        [(10, "b-ten"), (20, "b-twenty"), (30, "b-thirty"), (40, "b-forty")],
        "fk long, b_val string",
    )
    joined = a.join(b, "fk").select("pk", "fk", "payload", "b_val")

    delta = spark.createDataFrame(
        [
            (2, 40, "a2-moved", "U"),   # update: re-points to fk 40
            (3, None, None, "D"),        # delete
            (5, 20, "a5-new", "I"),      # insert
        ],
        "pk long, fk long, payload string, op string",
    )
    maintained = incremental_join_apply(joined, delta, b, "pk", "fk")

    # recompute: apply the CDC to A, then join fresh
    a2 = spark.createDataFrame(
        [(1, 10, "a1"), (4, 30, "a4"), (2, 40, "a2-moved"), (5, 20, "a5-new")],
        "pk long, fk long, payload string",
    )
    fresh = a2.join(b, "fk").select("pk", "fk", "payload", "b_val")
    assert sorted(map(tuple, maintained.collect())) == sorted(map(tuple, fresh.collect()))


def test_incremental_join_apply_delta_sized_plan(spark):
    """The anti join's build side must be the (broadcast) touched-key
    set and the additions join must probe with the delta — never a full
    A-side rescan."""
    from morphik_core_spark.operators.incremental import incremental_join_apply

    a = spark.createDataFrame([(i, i % 7, f"p{i}") for i in range(500)],
                              "pk long, fk long, payload string")
    b = spark.createDataFrame([(i, f"b{i}") for i in range(7)], "fk long, b_val string")
    joined = a.join(b, "fk").select("pk", "fk", "payload", "b_val")
    delta = spark.createDataFrame([(1, 2, "x", "U")], "pk long, fk long, payload string, op string")
    out = incremental_join_apply(joined, delta, b, "pk", "fk")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_incremental_join_apply_compacts_multi_op_delta(spark):
    """A batch carrying more than one op per pk (I-then-D, U-then-U) is
    only sound after per-key compaction — with seq_col the operator
    compacts (latest seq wins) and merge == recompute; the raw
    uncompacted batch would re-add superseded rows."""
    from morphik_core_spark.operators.incremental import incremental_join_apply

    a = spark.createDataFrame(
        [(1, 10, "a1"), (2, 20, "a2")], "pk long, fk long, payload string"
    )
    b = spark.createDataFrame(
        [(10, "b-ten"), (20, "b-twenty"), (30, "b-thirty")], "fk long, b_val string"
    )
    joined = a.join(b, "fk").select("pk", "fk", "payload", "b_val")
    delta = spark.createDataFrame(
        [
            (3, 30, "a3-v1", "I", 1),   # insert ...
            (3, None, None, "D", 2),     # ... then deleted in the same batch
            (2, 30, "a2-v1", "U", 3),    # update ...
            (2, 10, "a2-v2", "U", 4),    # ... superseded by a second update
        ],
        "pk long, fk long, payload string, op string, seq long",
    )
    maintained = incremental_join_apply(joined, delta, b, "pk", "fk", seq_col="seq")
    a2 = spark.createDataFrame(
        [(1, 10, "a1"), (2, 10, "a2-v2")], "pk long, fk long, payload string"
    )
    fresh = a2.join(b, "fk").select("pk", "fk", "payload", "b_val")
    assert sorted(map(tuple, maintained.collect())) == sorted(map(tuple, fresh.collect()))


def test_incremental_join_apply_delta_b_equals_recompute(spark):
    """Dimension-side IVM: maintaining A join B under an I/U/D delta on
    B must equal the join of A against the CDC-applied B — including the
    fan-out case where one dim update touches several fact rows."""
    from morphik_core_spark.operators.incremental import (
        incremental_join_apply_delta_b,
    )

    a = spark.createDataFrame(
        [(1, 10, "a1"), (2, 10, "a2"), (3, 20, "a3"), (4, 30, "a4"), (5, 40, "a5")],
        "pk long, fk long, payload string",
    )
    b = spark.createDataFrame(
        [(10, "b-ten"), (20, "b-twenty"), (30, "b-thirty"), (40, "b-forty")],
        "fk long, b_val string",
    )
    joined = a.join(b, "fk").select("fk", "pk", "payload", "b_val")
    delta_b = spark.createDataFrame(
        [
            (10, "b-ten-v2", "U"),   # fans out to pk 1 AND 2
            (20, None, "D"),          # pk 3 leaves the view
            (50, "b-fifty", "I"),     # matches nothing
        ],
        "fk long, b_val string, op string",
    )
    maintained = incremental_join_apply_delta_b(joined, a, delta_b, "fk")
    b2 = spark.createDataFrame(
        [(10, "b-ten-v2"), (30, "b-thirty"), (40, "b-forty"), (50, "b-fifty")],
        "fk long, b_val string",
    )
    fresh = a.join(b2, "fk").select("fk", "pk", "payload", "b_val")
    assert sorted(map(tuple, maintained.collect())) == sorted(map(tuple, fresh.collect()))


def test_incremental_join_apply_delta_b_compacts_with_seq(spark):
    """Multi-op-per-key dimension batches compact (latest seq wins)
    before the decomposition, same contract as the A-side step."""
    from morphik_core_spark.operators.incremental import (
        incremental_join_apply_delta_b,
    )

    a = spark.createDataFrame([(1, 10, "a1")], "pk long, fk long, payload string")
    b = spark.createDataFrame([(10, "b-v1")], "fk long, b_val string")
    joined = a.join(b, "fk").select("fk", "pk", "payload", "b_val")
    delta_b = spark.createDataFrame(
        [(10, "b-v2", "U", 1), (10, "b-v3", "U", 2)],
        "fk long, b_val string, op string, seq long",
    )
    maintained = incremental_join_apply_delta_b(joined, a, delta_b, "fk", seq_col="seq")
    assert [tuple(r) for r in maintained.collect()] == [(10, 1, "a1", "b-v3")]


def test_incremental_join_apply_both_merge_equals_recompute(spark):
    """Simultaneous two-sided batch: every cross-path fires — an A
    update re-pointed at a B-deleted key (drops), an A update at a
    B-updated key (sees the NEW value), an untouched A row of an
    updated B (revives with the new value), plain A insert/delete, a B
    insert matched by an A update. merge == fresh join of both applied
    tables."""
    from morphik_core_spark.operators.incremental import incremental_join_apply_both

    a = spark.createDataFrame(
        [(1, 10, "a1"), (2, 10, "a2"), (3, 20, "a3"), (4, 30, "a4"), (5, 40, "a5")],
        "pk long, fk long, payload string",
    )
    b = spark.createDataFrame(
        [(10, "b-ten"), (20, "b-twenty"), (30, "b-thirty"), (40, "b-forty")],
        "fk long, b_val string",
    )
    joined = a.join(b, "fk").select("fk", "pk", "payload", "b_val")
    delta_a = spark.createDataFrame(
        [
            (1, 20, "a1-v2", "U"),   # re-pointed to a B-DELETED key -> drops
            (3, 10, "a3-v2", "U"),   # re-pointed to a B-UPDATED key -> new value
            (4, None, None, "D"),    # plain delete
            (6, 50, "a6", "I"),      # insert matching a B INSERT
        ],
        "pk long, fk long, payload string, op string",
    )
    delta_b = spark.createDataFrame(
        [
            (10, "b-ten-v2", "U"),   # pk 2 (untouched) revives with new value
            (20, None, "D"),
            (50, "b-fifty", "I"),
        ],
        "fk long, b_val string, op string",
    )
    maintained = incremental_join_apply_both(
        joined, delta_a, b, delta_b, "pk", "fk", b_cols=["b_val"]
    )
    a2 = spark.createDataFrame(
        [(2, 10, "a2"), (5, 40, "a5"), (1, 20, "a1-v2"), (3, 10, "a3-v2"), (6, 50, "a6")],
        "pk long, fk long, payload string",
    )
    b2 = spark.createDataFrame(
        [(10, "b-ten-v2"), (30, "b-thirty"), (40, "b-forty"), (50, "b-fifty")],
        "fk long, b_val string",
    )
    fresh = a2.join(b2, "fk").select("fk", "pk", "payload", "b_val")
    assert sorted(map(tuple, maintained.collect())) == sorted(map(tuple, fresh.collect()))


def test_incremental_join_apply_both_compacts_with_seq(spark):
    """Both deltas compact independently (latest seq wins) before the
    joint decomposition."""
    from morphik_core_spark.operators.incremental import incremental_join_apply_both

    a = spark.createDataFrame([(1, 10, "a1")], "pk long, fk long, payload string")
    b = spark.createDataFrame([(10, "b-v1")], "fk long, b_val string")
    joined = a.join(b, "fk").select("fk", "pk", "payload", "b_val")
    delta_a = spark.createDataFrame(
        [(1, 10, "a1-v2", "U", 1), (1, 10, "a1-v3", "U", 2)],
        "pk long, fk long, payload string, op string, seq long",
    )
    delta_b = spark.createDataFrame(
        [(10, "b-v2", "U", 1), (10, "b-v3", "U", 2)],
        "fk long, b_val string, op string, seq long",
    )
    maintained = incremental_join_apply_both(
        joined, delta_a, b, delta_b, "pk", "fk", b_cols=["b_val"], seq_col="seq"
    )
    assert [tuple(r) for r in maintained.collect()] == [(10, 1, "a1-v3", "b-v3")]


def test_incremental_join_apply_both_a_snapshot_closes_revival_gap(spark):
    """Without a_for_revival, a fact whose dimension row is ABSENT from
    the view cannot re-attach when the dim key is inserted (the pinned
    self-maintainability boundary); with the CURRENT A snapshot passed,
    the same batch resurrects it."""
    from morphik_core_spark.operators.incremental import incremental_join_apply_both

    # fact pk=1 points at fk=20, which is NOT in B -> not in the view
    a = spark.createDataFrame([(1, 20, "a1"), (2, 10, "a2")], "pk long, fk long, payload string")
    b = spark.createDataFrame([(10, "b-ten")], "fk long, b_val string")
    joined = a.join(b, "fk").select("fk", "pk", "payload", "b_val")
    delta_a = spark.createDataFrame([], "pk long, fk long, payload string, op string")
    delta_b = spark.createDataFrame([(20, "b-twenty", "I")], "fk long, b_val string, op string")

    without = incremental_join_apply_both(
        joined, delta_a, b, delta_b, "pk", "fk", b_cols=["b_val"]
    )
    assert all(r["fk"] != 20 for r in without.collect())  # boundary pinned

    with_a = incremental_join_apply_both(
        joined, delta_a, b, delta_b, "pk", "fk", b_cols=["b_val"], a_for_revival=a
    )
    assert (20, 1, "a1", "b-twenty") in {tuple(r) for r in with_a.collect()}
