"""Listing: keyset pagination equivalence with offset pagination."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from morphik_core_spark.operators.listing import keyset_page, sorted_page


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(f"d{i:03d}", (i * 37) % 100, None if i % 10 == 0 else i) for i in range(50)]
    return spark.createDataFrame(rows, "external_id string, n int, updated_at long").cache()


def test_keyset_walks_same_order_as_offset(docs):
    """Walking pages via keyset must visit rows in the same order as
    offset pagination (modulo NULL-sorted tail, which keyset can't seek)."""
    offset_ids = [
        r.external_id
        for r in sorted_page(docs.filter(F.col("updated_at").isNotNull()), sort_by="updated_at",
                             order="desc", skip=0, limit=50).collect()
    ]
    walked, last = [], None
    base = docs.filter(F.col("updated_at").isNotNull())
    while True:
        page = keyset_page(base, last, sort_by="updated_at", order="desc", limit=7).collect()
        if not page:
            break
        walked.extend(r.external_id for r in page)
        last = (page[-1].updated_at, page[-1].external_id)
    assert walked == offset_ids


def test_keyset_ascending(docs):
    base = docs.filter(F.col("updated_at").isNotNull())
    p1 = keyset_page(base, None, sort_by="updated_at", order="asc", limit=5).collect()
    p2 = keyset_page(base, (p1[-1].updated_at, p1[-1].external_id), sort_by="updated_at", order="asc", limit=5).collect()
    all_asc = [r.updated_at for r in p1 + p2]
    assert all_asc == sorted(all_asc)
    assert len({r.external_id for r in p1} & {r.external_id for r in p2}) == 0