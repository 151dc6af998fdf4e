"""Persist-lifecycle registry: operators register persists, boundaries free them.

Round-5 verdict: ~12 operator persist sites had no matching unpersist, so a
long bench/serving session accumulated cached partitions (measured 1.7-2x
diffuse bench inflation + CacheManager already-cached warnings). The contract
under test: every operator-side persist goes through ``scoped_persist`` and
one ``release_scoped()`` empties the CacheManager while results stay
correct (lazy plans recompute from lineage).

Assertions target the CacheManager (persist/cache entries), NOT
``getRDDStorageInfo`` — earlier test modules legitimately leave
``localCheckpoint`` blocks that only the ContextCleaner removes, and those
must not fail this suite.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import functions as F

from morphik_core_spark.plans.cache import (
    persist_scope,
    release_all_scoped,
    release_scoped,
    scoped_persist,
)


def _cache_manager_empty(spark) -> bool:
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


def _reset(spark) -> None:
    release_scoped()
    spark.catalog.clearCache()


def test_release_scoped_frees_everything(spark):
    _reset(spark)
    df = scoped_persist(spark.range(1000).withColumn("x", F.col("id") * 2))
    df.count()  # materialize the cache
    assert df.is_cached
    assert not _cache_manager_empty(spark)
    freed = release_scoped()
    assert freed == 1
    assert not df.is_cached
    assert _cache_manager_empty(spark)
    # released frames recompute from lineage — still correct, just cold
    assert df.count() == 1000
    _reset(spark)


def test_release_is_idempotent_and_counts(spark):
    _reset(spark)
    a = scoped_persist(spark.range(10))
    b = scoped_persist(spark.range(20), StorageLevel.MEMORY_ONLY)
    a.count(), b.count()
    assert release_scoped() == 2
    assert release_scoped() == 0


def test_persist_scope_releases_only_inner(spark):
    _reset(spark)
    outer = scoped_persist(spark.range(5))
    outer.count()
    with persist_scope():
        inner = scoped_persist(spark.range(50))
        inner.count()
        assert inner.is_cached and outer.is_cached
    # inner freed on scope exit; outer still registered and cached
    assert not inner.is_cached
    assert outer.is_cached
    assert release_scoped() == 1
    assert not outer.is_cached
    assert _cache_manager_empty(spark)


def test_operators_register_their_persists(spark):
    """An operator with a known internal persist (jaccard_pairs caches
    its exploded shingles) leaves the CacheManager empty after
    release_scoped() even when its lazy result was consumed afterwards.
    (lsh_candidate_pairs lost its internal persist in round 7 — its plan
    is single-pass now — so this gate rides jaccard_pairs instead.)"""
    from morphik_core_spark.operators.dedup import jaccard_pairs, word_shingles

    _reset(spark)
    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog " + ("x" * (i % 3))) for i in range(30)],
        "doc_id long, text string",
    )
    pairs = jaccard_pairs(word_shingles(docs, "text", "doc_id"), "doc_id", threshold=0.5)
    n = pairs.count()
    assert n >= 0
    assert not _cache_manager_empty(spark)  # the band-bucket persist is live
    assert release_scoped() >= 1
    assert _cache_manager_empty(spark)
    # result is still recomputable post-release
    assert pairs.count() == n


def test_registry_is_thread_scoped(spark):
    """A boundary release in one thread must not unpersist a concurrent
    pipeline's in-flight frames (round-6 ADVICE: the registry was one
    process-global list, so request A's boundary could evict request B's
    loop-invariant mid-query)."""
    import threading

    _reset(spark)
    worker_df = {}
    registered = threading.Event()
    may_finish = threading.Event()

    def worker():
        df = scoped_persist(spark.range(123))
        df.count()
        worker_df["df"] = df
        registered.set()
        may_finish.wait(timeout=30)
        # worker's own boundary frees its own frame
        assert release_scoped() == 1

    t = threading.Thread(target=worker)
    t.start()
    assert registered.wait(timeout=30)
    mine = scoped_persist(spark.range(7))
    mine.count()
    # my boundary frees only MY frame; the worker's stays cached
    assert release_scoped() == 1
    assert worker_df["df"].is_cached
    assert not mine.is_cached
    may_finish.set()
    t.join(timeout=30)
    assert not worker_df["df"].is_cached
    assert _cache_manager_empty(spark)


def test_release_all_scoped_sweeps_other_threads(spark):
    """Session-teardown boundary: release_all_scoped frees frames
    registered by every thread (bench.py uses this between timed runs)."""
    import threading

    _reset(spark)
    holder = {}

    def worker():
        df = scoped_persist(spark.range(55))
        df.count()
        holder["df"] = df

    t = threading.Thread(target=worker)
    t.start()
    t.join(timeout=30)
    assert holder["df"].is_cached
    assert release_all_scoped() >= 1
    assert not holder["df"].is_cached
    assert _cache_manager_empty(spark)
