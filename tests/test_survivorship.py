"""golden_record survivorship: mode wins, deterministic tie-break,
null-skip, and partitioning-independence."""

from __future__ import annotations

from pyspark.sql import Row

from morphik_core_spark.operators.dedup import golden_record


def _rows(spark, n_parts):
    data = [
        Row(eid=1, name="acme corp", city="berlin"),
        Row(eid=1, name="acme corp", city=None),
        Row(eid=1, name="acme co", city="Berlin"),
        Row(eid=2, name="zeta", city="oslo"),
        Row(eid=2, name="alpha", city="oslo"),
    ]
    return spark.createDataFrame(data).repartition(n_parts)


def test_mode_tiebreak_nullskip(spark):
    out = {
        r.entity: r
        for r in golden_record(_rows(spark, 2), "eid", ["name", "city"]).collect()
    }
    # entity 1: 'acme corp' x2 beats 'acme co' x1
    assert out[1].name == "acme corp"
    # city: 'berlin' vs 'Berlin' 1-1 tie -> binary-lex smallest = 'Berlin'
    assert out[1].city == "Berlin"
    assert out[1].n_records == 3
    # entity 2: 1-1 name tie -> 'alpha'
    assert out[2].name == "alpha"
    assert out[2].n_records == 2


def test_partitioning_independent(spark):
    a = sorted(map(tuple, golden_record(_rows(spark, 1), "eid", ["name", "city"]).collect()))
    b = sorted(map(tuple, golden_record(_rows(spark, 7), "eid", ["name", "city"]).collect()))
    assert a == b


def test_all_null_field_stays_null(spark):
    df = spark.createDataFrame(
        [(1, "x", None), (1, "x", None)], "eid bigint, a string, b string"
    )
    r = golden_record(df, "eid", ["a", "b"]).collect()[0]
    assert r.a == "x" and r.b is None
