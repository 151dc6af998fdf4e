"""Persist-lifecycle registry: operators register persists, boundaries free them.

Round-5 verdict: ~12 operator persist sites had no matching unpersist, so a
long bench/serving session accumulated cached partitions (measured 1.7-2x
diffuse bench inflation + CacheManager already-cached warnings). The contract
under test: every operator-side persist goes through ``scoped_persist`` and
one ``release_scoped()`` drops storage back to zero while results stay
correct (lazy plans recompute from lineage).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import functions as F

from morphik_core_spark.plans.cache import persist_scope, release_scoped, scoped_persist


def _n_cached(spark) -> int:
    jsc = spark.sparkContext._jsc.sc()
    return sum(
        1 for rdd_info in jsc.getRDDStorageInfo() if rdd_info.numCachedPartitions() > 0
    )


def test_release_scoped_frees_everything(spark):
    release_scoped()  # start clean regardless of test ordering
    spark.catalog.clearCache()
    df = scoped_persist(spark.range(1000).withColumn("x", F.col("id") * 2))
    df.count()  # materialize the cache
    assert _n_cached(spark) >= 1
    freed = release_scoped()
    assert freed == 1
    assert _n_cached(spark) == 0
    # released frames recompute from lineage — still correct, just cold
    assert df.count() == 1000
    release_scoped()
    spark.catalog.clearCache()


def test_release_is_idempotent_and_counts(spark):
    release_scoped()
    a = scoped_persist(spark.range(10))
    b = scoped_persist(spark.range(20), StorageLevel.MEMORY_ONLY)
    a.count(), b.count()
    assert release_scoped() == 2
    assert release_scoped() == 0


def test_persist_scope_releases_only_inner(spark):
    release_scoped()
    spark.catalog.clearCache()
    outer = scoped_persist(spark.range(5))
    outer.count()
    with persist_scope():
        inner = scoped_persist(spark.range(50))
        inner.count()
        assert _n_cached(spark) >= 2
    # inner freed on scope exit; outer still registered and cached
    assert _n_cached(spark) == 1
    assert release_scoped() == 1
    assert _n_cached(spark) == 0


def test_operators_register_their_persists(spark):
    """An operator with a known internal persist (lsh_candidate_pairs)
    leaves nothing cached after release_scoped() even when its lazy result
    was consumed afterwards."""
    from morphik_core_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        word_shingles,
    )

    release_scoped()
    spark.catalog.clearCache()
    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog " + ("x" * (i % 3))) for i in range(30)],
        "doc_id long, text string",
    )
    sigs = minhash_signatures(word_shingles(docs, "text", "doc_id"), "doc_id", num_hashes=8)
    pairs = lsh_candidate_pairs(sigs, "doc_id", bands=4, rows_per_band=2)
    n = pairs.count()
    assert n >= 0
    assert _n_cached(spark) >= 1  # the band-bucket persist is live
    assert release_scoped() >= 1
    assert _n_cached(spark) == 0
    # result is still recomputable post-release
    assert pairs.count() == n
