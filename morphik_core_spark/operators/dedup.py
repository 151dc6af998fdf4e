"""Deduplication operators for large-scale training-data pipelines.

Not part of the reference's own surface (morphik-core dedups only on
(document_id, chunk_number) keys) — these are the corpus-level dedup
operators a 100 TB ingestion pipeline needs, built Spark-first:

- exact:     normalize → md5 fingerprint → min-id keeper per group.
             One shuffle on the fingerprint; map-side combine.
- MinHash:   word shingles → k portable hash functions → per-doc signature
             → banded LSH buckets → candidate pairs from bucket joins.
             Shuffles are keyed on shingle/band hashes — uniformly
             distributed by construction, no skew.
- SimHash:   sign-aggregated bit fingerprint; near-dup = small Hamming
             distance between fingerprints.
- n-gram Jaccard: blocked self-join on shared shingles with
             |A∩B| / (|A|+|B|−|A∩B|) verification.
- embedding cosine: blocked (LSH-bucketed) self-join over normalized
             embeddings with a cosine threshold.

Portability note: every hash is derived from md5 hex prefixes
(``conv(substr(md5(x),1,15),16,10)``), which DuckDB reproduces exactly
(``CAST('0x'||substr(md5(x),1,15) AS BIGINT)``) — this keeps every operator
oracle-checkable. At production scale you'd swap in xxhash64 (cheaper);
the plan shape is identical.
"""

from __future__ import annotations

import random
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "normalize_text",
    "portable_hash",
    "exact_duplicates",
    "word_shingles",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "minhash_signatures_inline",
    "simhash",
    "simhash_pandas",
    "jaccard_pairs",
    "containment_pairs",
    "edit_distance_pairs",
    "embedding_near_dup",
    "embedding_near_dup_pandas",
    "connected_components",
    "resolve_duplicate_clusters",
    "paragraph_dedup",
    "span_dedup",
    "semantic_dedup",
    "golden_record",
    "fellegi_sunter_em",
    "mutual_best_match",
]

# 60-bit hash keeps (a*h30 + b) inside int64 after the 30-bit fold
_H30 = 1 << 30
_MERSENNE31 = (1 << 31) - 1


def normalize_text(col: Column) -> Column:
    """lowercase + trim + collapse whitespace — the canonical dedup form."""
    return F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")


def portable_hash(col: Column) -> Column:
    """Deterministic 60-bit integer hash reproducible in DuckDB SQL."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def hash_params(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    """(a, b) pairs for the universal-hash family (a*h + b) mod p."""
    rng = random.Random(seed)
    return [(rng.randrange(1, _MERSENNE31), rng.randrange(0, _MERSENNE31)) for _ in range(num_hashes)]


def exact_duplicates(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, fingerprint, keeper_id, group_size): keeper = min id per group."""
    fp = df.select(F.col(id_col), F.md5(normalize_text(F.col(text_col))).alias("fingerprint"))
    groups = fp.groupBy("fingerprint").agg(
        F.min(id_col).alias("keeper_id"), F.count(F.lit(1)).alias("group_size")
    )
    return fp.join(groups, "fingerprint").select(id_col, "fingerprint", "keeper_id", "group_size")


def word_shingles(
    df: DataFrame, text_col: str, id_col: str, n: int = 3, spread: bool = True
) -> DataFrame:
    """Distinct word n-gram shingles per document, exploded: (id, shingle).

    Documents shorter than n tokens yield no shingles (dropped), matching
    the usual MinHash convention.

    ``spread=False`` skips the pre-fan-out partition probe + repartition:
    the probe physically plans the whole upstream tree just to read a
    partition count (round-11 measured ~0.8 s of pure construction time
    on a candidate-join input), so callers whose input provably arrives
    post-shuffle (partitions already == spark.sql.shuffle.partitions)
    should opt out. The produced rows are identical either way.
    """
    toks = F.split(normalize_text(F.col(text_col)), " ")
    # the <n-token guard lives INSIDE the expression (empty array => the
    # explode drops the row) instead of a .filter(size(tk) >= n): a filter
    # on the unpersisted projection gets pushed below the pre-fan-out
    # exchange with the whole tokenize inlined, so every row paid the
    # regex+split kernel twice — once in the pushed Filter, once in the
    # Project (round-11; same rows by the MinHash convention either way)
    shingles = F.expr(
        f"IF(size(tk) >= {n}, "
        f"array_distinct(transform(sequence(0, size(tk) - {n}), "
        f"i -> concat_ws(' ', {', '.join(f'tk[i + {j}]' for j in range(n))}))), "
        f"array())"
    )
    # pre-fan-out exchange (the perplexity_scores pattern): a small corpus
    # often arrives as 1-2 scan partitions, which would serialize the
    # regex normalize + split + shingle explode — the dedup stack's
    # dominant CPU — on one task. Spread the compact raw rows first, ONLY
    # when the scan under-parallelizes; at real scale this is a no-op.
    base = df.select(F.col(id_col), F.col(text_col))
    if spread:
        par = df.sparkSession.sparkContext.defaultParallelism
        if base.rdd.getNumPartitions() < par:
            base = base.repartition(par)
    return (
        base.select(F.col(id_col), toks.alias("tk"))
        .select(F.col(id_col), F.explode(shingles).alias("shingle"))
    )


def minhash_signatures(
    shingles: DataFrame,
    id_col: str,
    num_hashes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Per-doc MinHash signature as columns mh0..mh{k-1}.

    One aggregate over the exploded shingles computes every hash function —
    a single shuffle keyed on the doc id, partial min map-side.
    """
    h30 = (portable_hash(F.col("shingle")) % _H30).alias("h30")
    base = shingles.select(F.col(id_col), h30)
    aggs = [
        F.min((F.lit(a) * F.col("h30") + F.lit(b)) % _MERSENNE31).alias(f"mh{i}")
        for i, (a, b) in enumerate(hash_params(num_hashes, seed))
    ]
    return base.groupBy(id_col).agg(*aggs)


def minhash_signatures_inline(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_hashes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Map-side MinHash: shingle → hash → min entirely inside codegen.

    Bit-identical to ``word_shingles(...)`` → ``minhash_signatures(...)``
    (same normalize, same n-gram construction, same portable hash family)
    but with ZERO shuffles: each row's distinct shingle array is built
    with ``transform``/``sequence``, hashed once to the 30-bit base, and
    every universal-hash minimum comes from ``array_min`` over that
    per-row array. The groupBy in the exploded form only ever re-gathers
    rows that started together, so the aggregation is a per-row fold —
    this is that fold, expressed where it runs for free. Use this form
    whenever the consumer wants one signature row per doc; keep the
    exploded form where the shingles themselves are reused downstream.
    """
    toks = F.split(normalize_text(F.col(text_col)), " ")
    sh_expr = (
        f"array_distinct(transform(sequence(0, size(tk) - {n}), "
        f"i -> concat_ws(' ', {', '.join(f'tk[i + {j}]' for j in range(n))})))"
    )
    base = df.select(F.col(id_col), toks.alias("tk"))
    # pre-fan-out: same rationale as word_shingles — spread the regex +
    # shingle CPU when the scan under-parallelizes; no-op at real scale.
    par = df.sparkSession.sparkContext.defaultParallelism
    if base.rdd.getNumPartitions() < par:
        base = base.repartition(par)
    h30s = (
        f"transform({sh_expr}, s -> "
        f"CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT) % {_H30}L)"
    )
    # the <n-token drop AND the hash-array projection both ride ONE
    # Generate: explode of the 0/1-element wrapper drops short docs (the
    # old .filter(size(tk) >= n) re-ran the whole tokenize inside the
    # pushed-down Filter), and Generate is a codegen barrier, so the
    # shingle+md5 chain is evaluated exactly once even though all
    # num_hashes array_min projections consume it (adjacent Projects
    # would otherwise collapse and inline the chain per hash function).
    base = base.select(
        F.col(id_col),
        F.explode(F.expr(f"IF(size(tk) >= {n}, array({h30s}), array())")).alias("hs"),
    )
    mins = [
        F.expr(f"array_min(transform(hs, h -> ({a}L * h + {b}L) % {_MERSENNE31}L))").alias(f"mh{i}")
        for i, (a, b) in enumerate(hash_params(num_hashes, seed))
    ]
    return base.select(F.col(id_col), *mins)


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str,
    bands: int,
    rows_per_band: int,
    max_bucket_size: int | None = None,
    persist: bool = True,
    carry_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) sharing any LSH band.

    Docs agreeing on all rows of one band land in the same bucket; the
    band-bucket self-join is an equi-join Catalyst hash-partitions — the
    canonical way to avoid the O(n²) all-pairs comparison at scale.

    ``max_bucket_size`` drops buckets with more members than the cap.
    Without it one hot bucket (boilerplate text, degenerate signatures)
    goes quadratic — a bucket of 1M docs is 5e11 pairs on one reducer.
    An oversized bucket carries almost no signal (its members collide on
    a band by bulk, not similarity), so dropping it is the standard
    recall/robustness trade (cf. datasketch LSH ``_H`` buckets, Spark
    MinHashLSH docs). The cap is also the memory bound on the per-bucket
    member array below — always set it on real corpora.

    ``carry_cols`` rides extra per-id columns through the pair
    generation, emitted as ``<col>_a`` / ``<col>_b`` beside the pair
    ids. A consumer that needs both sides' signatures (estimated-Jaccard
    calibration, agreement scoring) gets them from the pair generation
    itself instead of re-joining the signature frame twice.

    Shape (round 7): one groupBy collects each (band, key) bucket's
    members into a sorted array (the cap filters oversized buckets in
    the same aggregation), then within-bucket pairs explode via
    ``transform``/``slice`` inside codegen. vs the previous self-join
    form this is ONE shuffle instead of three (size histogram, two
    join sides) and needs no internal persist — the signature pipeline
    is read exactly once. ``persist`` is kept for API compatibility and
    is a no-op.
    """
    del persist  # single-pass plan: nothing is read twice anymore
    carry = list(carry_cols or [])
    sig_cols = [c for c in signatures.columns if c != id_col]
    assert len(sig_cols) >= bands * rows_per_band
    band_rows = []
    for b in range(bands):
        cols = sig_cols[b * rows_per_band : (b + 1) * rows_per_band]
        band_rows.append(
            F.struct(F.lit(b).alias("band"), F.concat_ws("_", *[F.col(c) for c in cols]).alias("key"))
        )
    # member struct leads with the id so sort_array orders buckets by id
    # (ids are unique within a bucket: one row per doc per band), making
    # every emitted (i < j) pair satisfy id_a < id_b by construction.
    member = F.struct(F.col(id_col).alias("_id"), *[F.col(c) for c in carry])
    buckets = signatures.select(member.alias("m"), F.explode(F.array(*band_rows)).alias("bk")).select(
        "m", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    grouped = buckets.groupBy("band", "key").agg(F.sort_array(F.collect_list("m")).alias("ms"))
    size_ok = F.size("ms") >= 2
    if max_bucket_size is not None:
        size_ok = size_ok & (F.size("ms") <= max_bucket_size)
    pairs = grouped.filter(size_ok).select(
        F.explode(
            F.expr(
                "flatten(transform(ms, (x, i) -> "
                "transform(slice(ms, i + 2, size(ms) - i - 1), y -> struct(x AS a, y AS b))))"
            )
        ).alias("p")
    )
    return pairs.select(
        F.col("p.a._id").alias("id_a"),
        F.col("p.b._id").alias("id_b"),
        *[F.col(f"p.a.{c}").alias(f"{c}_a") for c in carry],
        *[F.col(f"p.b.{c}").alias(f"{c}_b") for c in carry],
    ).distinct()


def simhash(df: DataFrame, text_col: str, id_col: str, bits: int = 32) -> DataFrame:
    """Per-doc SimHash fingerprint (sign-aggregated token-hash bits).

    Relational form: explode tokens × bit positions → signed sum per bit →
    pack. At scale the pandas-UDF variant folds this into one pass; this
    form is oracle-expressible and still only two shuffles.
    """
    toks = F.split(normalize_text(F.col(text_col)), " ")
    h = portable_hash(F.col("tok")).alias("h")
    exploded = df.select(F.col(id_col), F.explode(toks).alias("tok")).select(F.col(id_col), h)
    per_bit = (
        exploded.select(F.col(id_col), "h", F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("b"))
        .withColumn("sign", F.when(F.expr("(h >> b) & 1") == 1, 1).otherwise(-1))
        .groupBy(id_col, "b")
        .agg(F.sum("sign").alias("s"))
    )
    packed = per_bit.groupBy(id_col).agg(
        F.sum(F.when(F.col("s") > 0, F.expr("shiftleft(cast(1 as bigint), b)")).otherwise(F.lit(0))).alias(
            "simhash"
        )
    )
    return packed


def simhash_pandas(df: DataFrame, text_col: str, id_col: str, bits: int = 32) -> DataFrame:
    """One-pass Arrow-batched SimHash — the serving form of :func:`simhash`.

    Bit-for-bit identical to the relational form (asserted in tests), but
    computed per Arrow batch with zero shuffles and zero row explosion:
    the relational plan multiplies every token by ``bits`` rows (32× data
    inflation through two shuffles), which is the oracle-expressible shape
    but the wrong serving plan at 100 TB. This is the same
    relational-oracle / vectorized-serving split used for MaxSim
    (operators/maxsim.py).

    Hash parity notes (must match `portable_hash` + `normalize_text`
    exactly): md5-prefix 60-bit hashes; Spark's ``trim`` strips only
    ASCII spaces (not \\n), and Java ``\\s`` is ASCII-only — the Python
    side mirrors both. Per-batch token-hash memoization: corpus token
    distributions are Zipfian, so the cache hit rate is high.
    """
    import hashlib
    import re as _re

    import numpy as np
    import pandas as pd

    bit_idx = np.arange(bits, dtype=np.int64)
    weights = np.int64(1) << bit_idx
    ws_run = _re.compile(r"[ \t\n\x0b\f\r]+")

    def _fingerprint_series(texts: pd.Series, cache: dict) -> pd.Series:
        out = np.empty(len(texts), dtype=np.int64)
        for i, text in enumerate(texts):
            norm = ws_run.sub(" ", (text or "").lower().strip(" "))
            acc = np.zeros(bits, dtype=np.int64)
            for tok in norm.split(" "):
                signs = cache.get(tok)
                if signs is None:
                    h = int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:15], 16)
                    signs = (((h >> bit_idx) & 1) * 2 - 1).astype(np.int64)
                    cache[tok] = signs
                acc += signs
            out[i] = int(weights[acc > 0].sum())
        return pd.Series(out)

    from pyspark.sql.functions import pandas_udf

    # no type hints: `from __future__ import annotations` stringifies them,
    # which pandas_udf can't infer — unannotated defaults to SCALAR.
    _simhash_udf = pandas_udf(lambda texts: _fingerprint_series(texts, {}), "long")

    return df.select(F.col(id_col), _simhash_udf(F.col(text_col)).alias("simhash"))


def jaccard_pairs(
    shingles: DataFrame,
    id_col: str,
    threshold: float,
    block: DataFrame | None = None,
    persist: bool = True,
    max_df: int | None = None,
) -> DataFrame:
    """Near-dup pairs by shingle-set Jaccard ≥ threshold.

    (id_a, id_b, jaccard). The self-join is keyed on the shingle — docs
    sharing no shingle never meet, so the pair space is the inverted-index
    join, not O(n²). ``block`` (id → block key) optionally restricts pairs
    to the same block.

    ``max_df`` drops shingles whose document frequency exceeds the cap
    BEFORE the join — the stopword-phrase analog ("of the and" appears in
    half the corpus and is a hot join key that contributes ~0 similarity
    signal but O(df²) pairs on one reducer). Capping makes the Jaccard a
    rare-shingle Jaccard: sizes and intersections are both computed on
    the capped sets, so the measure stays self-consistent. The frequent
    set is tiny by construction → broadcast anti-join, no extra shuffle
    on the fact side.

    ``persist`` caches the exploded shingles: the plan reads them three
    times (both join sides + sizes), and recomputing the explode tripled
    the cost in benchmarks. At 100 TB this is a disk-backed persist of an
    intermediate you were going to shuffle anyway.
    """
    if max_df is not None:
        frequent = (
            shingles.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_df)
            .select("shingle")
        )
        shingles = shingles.join(F.broadcast(frequent), "shingle", "left_anti")
    if persist:
        from morphik_core_spark.plans.cache import scoped_persist

        shingles = scoped_persist(shingles)
    sizes = shingles.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = shingles.alias("a")
    b = shingles.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sz_a = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    out = (
        common.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .withColumn("jaccard", F.col("common") / (F.col("sz_a") + F.col("sz_b") - F.col("common")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    if block is not None:
        blk_a = block.select(F.col(id_col).alias("id_a"), F.col("block").alias("block_a"))
        blk_b = block.select(F.col(id_col).alias("id_b"), F.col("block").alias("block_b"))
        out = (
            out.join(blk_a, "id_a")
            .join(blk_b, "id_b")
            .filter(F.col("block_a") == F.col("block_b"))
            .select("id_a", "id_b", "jaccard")
        )
    return out


def containment_pairs(
    shingles: DataFrame,
    id_col: str,
    threshold: float,
    max_df: int | None = None,
    persist: bool = True,
    decimals: int = 6,
) -> DataFrame:
    """Asymmetric near-dup pairs by shingle-set CONTAINMENT:

        C(a in b) = |S_a ∩ S_b| / |S_a|

    (Broder's containment, the measure behind "doc A is a quoted /
    excerpted / boilerplate-wrapped copy inside doc B"). Jaccard misses
    exactly these: a 50-shingle doc fully embedded in a 5000-shingle doc
    has J ≈ 0.01 but C = 1.0 — on the test corpus roughly half the
    pairs over the default threshold are invisible to `jaccard_pairs`.

    Output: (id_a, id_b, common, sz_a, sz_b, c_a, c_b) for pairs where
    max(c_a, c_b) ≥ threshold; c_a = fraction of a's shingles found in
    b (and vice versa), rounded at the edge, filtered unrounded.

    Same inverted-index join + ``max_df`` hot-shingle cap + scoped
    persist as `jaccard_pairs` — the pair space is the shared-shingle
    join, never O(n²), and the frequent set broadcasts.
    """
    if max_df is not None:
        frequent = (
            shingles.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_df)
            .select("shingle")
        )
        shingles = shingles.join(F.broadcast(frequent), "shingle", "left_anti")
    if persist:
        from morphik_core_spark.plans.cache import scoped_persist

        shingles = scoped_persist(shingles)
    sizes = shingles.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = shingles.alias("a")
    b = shingles.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sz_a = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    c_a = F.col("common") / F.col("sz_a")
    c_b = F.col("common") / F.col("sz_b")
    return (
        common.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .filter(F.greatest(c_a, c_b) >= threshold)
        .select(
            "id_a",
            "id_b",
            "common",
            "sz_a",
            "sz_b",
            F.round(c_a, decimals).alias("c_a"),
            F.round(c_b, decimals).alias("c_b"),
        )
    )


def embedding_near_dup(
    comps: DataFrame,
    hyperplane_comps: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    decimals: int = 6,
    max_bucket_size: int | None = None,
    persist: bool = True,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, cos).

    Completes the dedup family (exact / MinHash-LSH / SimHash / Jaccard /
    embedding-cosine). Input is the SPARSE integer component form
    (id, idx, val) produced by ``hash_embed_components`` — or any
    exploded embedding — so the whole pipeline stays integer-exact until
    the final cosine division and is reproducible in the DuckDB oracle.

    Blocking: sign-LSH over ``hyperplane_comps`` (b, hidx, hv) — a tiny
    broadcast table of hyperplane components. Bucket = Σ 2^b over planes
    with dot(v, hp_b) > 0. Pairs are generated ONLY within a bucket, so
    the self-join is an equi-join on the bucket id, never O(n²); with B
    planes the candidate space drops ~2^B-fold for random vectors while
    true near-dups (cosine ≈ 1) almost always share every sign bit.
    Pairs whose members land in different buckets are missed — the
    standard LSH dedup recall trade, same contract as
    ``lsh_candidate_pairs``.

    The pair-dot join then computes the EXACT cosine for candidates only
    (join on (pair, idx): |cand| × nnz rows, linear in candidates), and
    the threshold filters on the unrounded value.

    Scale notes (100 TB): the bucket self-join hash-partitions on the
    bucket id; ``max_bucket_size`` drops degenerate hot buckets before
    the join exactly like ``lsh_candidate_pairs`` (a bucket that holds
    1% of a billion-vector corpus is 5e13 pairs on one reducer and
    carries no near-dup signal). With more planes buckets shrink
    geometrically; 16-32 planes is the production setting, 4 here keeps
    the oracle SQL tractable.
    """
    if persist:
        from morphik_core_spark.plans.cache import scoped_persist

        comps = scoped_persist(comps)
    norms = comps.groupBy(id_col).agg(F.sqrt(F.sum(F.col("val") * F.col("val"))).alias("norm"))
    bdot = (
        comps.join(F.broadcast(hyperplane_comps), comps["idx"] == hyperplane_comps["hidx"])
        .groupBy(id_col, "b")
        .agg(F.sum(F.col("val") * F.col("hv")).alias("d"))
    )
    # 2^b via pow: exact in double up to 2^52, far beyond any plane count
    buckets = bdot.groupBy(id_col).agg(
        F.sum(
            F.when(F.col("d") > 0, F.pow(F.lit(2.0), F.col("b")).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
        ).alias("bucket")
    )
    if max_bucket_size is not None:
        oversized = (
            buckets.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > max_bucket_size)
            .select("bucket")
        )
        buckets = buckets.join(F.broadcast(oversized), "bucket", "left_anti")
    bk_a = buckets.select(F.col(id_col).alias("id_a"), "bucket")
    bk_b = buckets.select(F.col(id_col).alias("id_b"), "bucket")
    cand = bk_a.join(bk_b, "bucket").filter(F.col("id_a") < F.col("id_b")).select("id_a", "id_b")
    ca = comps.select(F.col(id_col).alias("id_a"), "idx", F.col("val").alias("val_a"))
    cb = comps.select(F.col(id_col).alias("id_b"), "idx", F.col("val").alias("val_b"))
    dots = (
        cand.join(ca, "id_a")
        .join(cb, ["id_b", "idx"])
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("val_a") * F.col("val_b")).alias("dot"))
    )
    na = norms.select(F.col(id_col).alias("id_a"), F.col("norm").alias("norm_a"))
    nb = norms.select(F.col(id_col).alias("id_b"), F.col("norm").alias("norm_b"))
    return (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn("cos", F.col("dot") / (F.col("norm_a") * F.col("norm_b")))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", decimals).alias("cos"))
    )


def embedding_near_dup_pandas(
    comps: DataFrame,
    hyperplanes: Sequence[Sequence[float]],
    threshold: float,
    id_col: str = "doc_id",
    decimals: int = 6,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """One-pass Arrow serving twin of :func:`embedding_near_dup` — same
    output (asserted in tests), different physical plan.

    The relational form pays three shuffling joins AFTER candidate
    generation (cand×comps on id_a, ×comps on (id_b, idx), then two norm
    joins): at |cand| candidate pairs × nnz components that is the whole
    cost — 7.9 s of an 8 s query at sf0.1. Here the per-bucket pair work
    collapses into one numpy Gram matrix per bucket:

    1. ``groupBy(id).collect_list(struct(idx, val))`` — ONE shuffle,
       assembling each doc's sparse vector.
    2. a vectorized pandas UDF computes the sign-LSH bucket per doc from
       the broadcast plane matrix (replaces the comps×planes join + two
       groupBys — no shuffle at all).
    3. ``groupBy(bucket).applyInPandas`` — ONE shuffle; the kernel builds
       the bucket's int64 component matrix M, takes ``G = M @ M.T``
       (integer-exact, like the relational SUM(val_a*val_b)), and emits
       upper-triangle pairs with cos ≥ threshold.

    Exactness: dots and squared norms are int64 until the final
    sqrt/divide, both forms round once via ``F.round`` JVM-side — so the
    twins agree bit-for-bit except when a bucket dot product sits within
    one ulp of 0 (sign summation order), which tests rule out on the
    corpus. Scale: bucket count is 2^planes — at production plane counts
    (16-32) the applyInPandas stage has millions of keys to spread;
    ``max_bucket_size`` drops degenerate hot buckets exactly like the
    relational cap.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    P = np.asarray([list(h) for h in hyperplanes], dtype=np.float64)  # (B, dims)
    n_planes, dims = P.shape
    weights = (np.int64(1) << np.arange(n_planes, dtype=np.int64))

    vecs = comps.groupBy(id_col).agg(
        F.collect_list(F.struct(F.col("idx"), F.col("val"))).alias("sv")
    )

    def _dense(entries, out) -> None:
        for e in entries:
            out[e["idx"]] = e["val"]

    # unannotated → SCALAR pandas UDF (stringified hints break inference
    # under `from __future__ import annotations`, see NOTES.md)
    def _buckets(sv):
        out = np.empty(len(sv), dtype=np.int64)
        v = np.zeros(dims, dtype=np.float64)
        for i, entries in enumerate(sv):
            v[:] = 0.0
            _dense(entries, v)
            d = P @ v
            out[i] = int(((d > 0) * weights).sum())
        return pd.Series(out)

    bucket_udf = pandas_udf(_buckets, "bigint")
    with_bucket = vecs.withColumn("bucket", bucket_udf(F.col("sv")))

    _empty = {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64"),
              "cos": pd.Series(dtype="float64")}

    def _pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2 or (max_bucket_size is not None and n > max_bucket_size):
            return pd.DataFrame(_empty)
        M = np.zeros((n, dims), dtype=np.int64)
        for i, entries in enumerate(pdf["sv"]):
            _dense(entries, M[i])
        G = M @ M.T
        norms = np.sqrt(np.einsum("ij,ij->i", M, M).astype(np.float64))
        ids = pdf[id_col].to_numpy()
        iu, ju = np.triu_indices(n, k=1)
        cos = G[iu, ju] / (norms[iu] * norms[ju])
        keep = cos >= threshold
        if not keep.any():
            return pd.DataFrame(_empty)
        ia, ib = ids[iu[keep]], ids[ju[keep]]
        return pd.DataFrame({
            "id_a": np.minimum(ia, ib),
            "id_b": np.maximum(ia, ib),
            "cos": cos[keep],
        })

    out = with_bucket.groupBy("bucket").applyInPandas(
        _pairs, "id_a bigint, id_b bigint, cos double"
    )
    return out.select("id_a", "id_b", F.round("cos", decimals).alias("cos"))


def connected_components(
    pairs: DataFrame,
    max_iterations: int = 30,
    driver_pair_limit: int = 200_000,
) -> DataFrame:
    """(node, component) for every node in the ``(id_a, id_b)`` pair list:
    component = the smallest node id reachable through the pair graph —
    the canonical duplicate-cluster id.

    This is the step every dedup pipeline runs AFTER candidate-pair
    generation (LSH / Jaccard / embedding near-dup emit PAIRS; keeping
    one document per transitive cluster needs the component). Classic
    iterative min-label propagation:

    1. every node starts labeled with itself,
    2. each round, a node's label becomes the min of its own and its
       neighbors' labels (one equi-join + one groupBy-min per round),
    3. stop when a round changes nothing.

    Rounds needed = graph diameter, which for near-dup clusters is tiny
    (clusters are cliques or near-cliques from banded LSH, diameter ≤ 3
    in practice). Each round is ONE shuffle keyed on node id; the edge
    list is re-used across rounds (persisted), and per-round results are
    ``localCheckpoint``-ed so lineage doesn't re-derive the whole chain
    (same pattern as folders.descendants_by_id). At web scale with
    billion-edge graphs (or high-diameter shapes) switch to
    :func:`graph.connected_components_star` — the alternating
    large-star/small-star implementation (Kiveris et al.),
    equivalence-tested against this one; near-dup graphs don't have high
    diameter, so plain propagation is the right default.

    SIZE GATE (the same pattern as the auth-broadcast gate,
    retrieval.py): blocked candidate-pair graphs are usually
    vocabulary-sized, not corpus-sized — thousands of pairs even when
    the corpus has billions of rows. Below ``driver_pair_limit`` pairs
    the component labels come from a driver-side union-find (one
    collect of the ALREADY-materialized pair list, microseconds of CPU)
    instead of paying per-iteration shuffle+checkpoint rounds; the
    union-find tracks min-id roots so its output is IDENTICAL to the
    propagation's min-label components (equivalence-tested). Above the
    gate — billion-edge web-dedup graphs — the distributed propagation
    runs unchanged. The gate's count() materializes the pair plan once,
    work both paths need anyway.
    """
    from pyspark import StorageLevel

    pairs = pairs.persist(StorageLevel.MEMORY_AND_DISK)
    n_pairs = pairs.count()
    if n_pairs <= driver_pair_limit:
        rows = pairs.select("id_a", "id_b").collect()
        parent: dict = {}

        def find(x):
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:  # path compression
                parent[x], x = root, parent[x]
            return root

        for r in rows:
            a, b = find(r[0]), find(r[1])
            if a != b:
                lo, hi = (a, b) if a < b else (b, a)
                parent[hi] = lo  # min id stays the root -> min-label parity
        nodes = set()
        for r in rows:
            nodes.add(r[0])
            nodes.add(r[1])
        out_rows = [(node, find(node)) for node in sorted(nodes)]
        id_type = pairs.schema["id_a"].dataType
        spark = pairs.sparkSession
        pairs.unpersist()
        from morphik_core_spark.plans.literal import literal_frame_from_schema

        ts = id_type.simpleString()
        return literal_frame_from_schema(
            spark, f"node {ts}, component {ts}", out_rows
        )

    # pairs are distinct with id_a < id_b, so the two-direction union is
    # already duplicate-free — no distinct() shuffle needed
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # fold round 1 into initialization: label0 = min(self, neighbors) is
    # one groupBy straight off the edge list (every node appears as dst).
    # Diameter-1 clusters — the common near-dup case — then converge on
    # the first loop check instead of the second.
    labels = (
        edges.groupBy(F.col("dst").alias("node"))
        .agg(F.min("src").alias("_minn"))
        .select("node", F.least("node", "_minn").alias("component"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iterations):
        # neighbor labels flow along edges; keep the min of (own, incoming)
        incoming = edges.join(
            labels.withColumnRenamed("node", "src"), "src"
        ).select(F.col("dst").alias("node"), "component")
        new_labels = (
            labels.unionByName(incoming)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
        )
        labels = new_labels
        if changed.isEmpty():
            break
    edges.unpersist()
    pairs.unpersist()
    return labels


def resolve_duplicate_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str,
    max_iterations: int = 30,
) -> DataFrame:
    """(id, keeper_id, cluster_size) for EVERY document: transitive
    duplicate clusters resolved to a canonical keeper (min id in the
    component); documents in no pair keep themselves, size 1.

    The full dedup-resolution contract: ``filter(id == keeper_id)``
    is the deduplicated corpus, ``filter(id != keeper_id)`` the drop
    list. Joining components back to the corpus is a left join on the
    doc id — components are tiny next to the corpus (only docs that
    appeared in a candidate pair), so AQE broadcasts it.
    """
    comp = connected_components(pairs, max_iterations=max_iterations)
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("_csize"))
    comp_sized = comp.join(sizes, "component").select(
        F.col("node").alias(id_col),
        F.col("component").alias("keeper_id"),
        F.col("_csize").alias("cluster_size"),
    )
    return (
        docs.select(id_col)
        .join(comp_sized, id_col, "left")
        .select(
            id_col,
            F.coalesce("keeper_id", F.col(id_col)).alias("keeper_id"),
            F.coalesce("cluster_size", F.lit(1)).alias("cluster_size"),
        )
    )


def paragraph_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    sep: str = "\n",
) -> DataFrame:
    """CCNet-style paragraph-level exact dedup: split documents into
    paragraphs, drop every paragraph whose exact content already appeared
    earlier in the corpus (first occurrence by (doc, position) wins,
    globally), and reconstruct the surviving text per document.

    Output: (id, n_paras, n_kept, text_dedup) — text_dedup preserves the
    original paragraph order; a document whose every paragraph was seen
    elsewhere keeps n_kept=0 and ''. This removes boilerplate
    (headers/footers/navigation) that whole-document dedup can't touch.

    Plan shape: posexplode → md5 → winner per hash via one window on the
    hash key (one shuffle) → per-doc rebuild (second shuffle). At 100 TB
    the hash shuffle is the cost — salting is unnecessary because md5
    keys are uniform by construction; boilerplate hashes ARE hot, so the
    window (not a join against a collected winner set) keeps them
    streaming through a single pass.
    """
    from pyspark.sql import Window

    paras = (
        df.select(
            F.col(id_col),
            F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "para"),
        )
        .filter(F.length("para") > 0)
    )
    totals = paras.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_paras"))
    w = Window.partitionBy(F.md5(F.col("para"))).orderBy(
        F.col(id_col).asc(), F.col("pos").asc()
    )
    kept = paras.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    rebuilt = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.concat_ws(
            sep,
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "para"))),
                lambda s: s["para"],
            ),
        ).alias("text_dedup"),
    )
    return totals.join(rebuilt, id_col, "left").select(
        F.col(id_col),
        "n_paras",
        F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
        F.coalesce(F.col("text_dedup"), F.lit("")).alias("text_dedup"),
    )


def span_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 4,
    persist: bool = True,
) -> DataFrame:
    """Exact duplicated-span coverage per document (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better" — their
    ExactSubstr at word granularity: a position is *duplicated* when some
    word n-gram covering it also occurs in another document).

    Output: (id, n_tokens, dup_tokens, dup_fraction) for every document
    (zero coverage included). Unlike whole-doc or paragraph dedup this
    measures partial overlap — quote reuse, template prose — and is the
    signal you'd threshold to trim spans out of a training corpus.

    Plan shape: the gram inverted index is the only corpus-wide shuffle
    (uniform md5-like key space); duplicated grams join back against the
    positional explode as a plain equi-join — at 100 TB you'd df-cap the
    gram index exactly like `jaccard_pairs` does for shingles. Coverage
    union is an explode of at most n positions per duplicated gram,
    distinct-ed per doc — bounded by document length, not corpus size.
    """
    # ONE tokenize pass for the whole operator (round-11): n_tokens rides
    # the positional explode (explode_outer + the in-expression <n guard
    # keeps short docs as a NULL-gram row), so `lengths` becomes an agg
    # over the persisted gram frame instead of a second corpus tokenize —
    # and the old .filter(size(tk) >= n) no longer re-runs the tokenize
    # inside a pushed-down Filter (third pass) either.
    grams_expr = F.expr(
        f"IF(size(tk) >= {n}, "
        f"transform(sequence(0, size(tk) - {n}), "
        f"i -> struct(i AS pos, concat_ws(' ', {', '.join(f'tk[i + {j}]' for j in range(n))}) AS gram)), "
        f"array())"
    )
    base = df.select(F.col(id_col), F.split(normalize_text(F.col(text_col)), " ").alias("tk"))
    g = (
        base.select(F.col(id_col), F.size("tk").alias("n_tokens"), F.explode_outer(grams_expr).alias("g"))
        .select(F.col(id_col), "n_tokens", F.col("g.pos").alias("pos"), F.col("g.gram").alias("gram"))
    )
    if persist:
        # g feeds the length agg, the dup-gram index and the coverage
        # join; without a persist the corpus-wide explode runs per
        # consumer (scoped: freed by the caller's next release_scoped())
        from morphik_core_spark.plans.cache import scoped_persist

        g = scoped_persist(g)
    lengths = g.groupBy(id_col).agg(F.first("n_tokens").alias("n_tokens"))
    dup = (
        g.filter(F.col("gram").isNotNull())
        .groupBy("gram")
        .agg(F.count_distinct(F.col(id_col)).alias("df"))
        .filter(F.col("df") > 1)
        .select("gram")
    )
    covered = (
        g.join(dup, "gram")
        .select(F.col(id_col), F.explode(F.sequence(F.col("pos"), F.col("pos") + (n - 1))).alias("cov"))
        .distinct()
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("dup_tokens"))
    )
    return (
        lengths.join(covered, id_col, "left")
        .select(
            F.col(id_col),
            "n_tokens",
            F.coalesce(F.col("dup_tokens"), F.lit(0)).alias("dup_tokens"),
            F.expr("ROUND(CAST(coalesce(dup_tokens, 0) AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)").alias(
                "dup_fraction"
            ),
        )
    )


def semantic_dedup(
    embeddings: DataFrame,
    centroids: Sequence[tuple[int, Sequence[float]]],
    tau: float = 0.35,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    max_cluster_size: int | None = None,
    decimals: int = 6,
    persist: bool = True,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    web-scale through semantic deduplication"): cluster-blocked semantic
    near-dup removal over dense embeddings.

    Vectors are assigned to k-means clusters (`similarity.ivf_assign` —
    a shuffle-free map against inlined centroid literals); within each
    cluster, pairwise cosine >= ``tau`` marks the higher-id vector as a
    semantic duplicate (greedy keep-first, deterministic). Output:
    (id, cluster_id, kept).

    The cluster structure is what makes this scale: the O(n^2) similarity
    space shrinks to per-cluster blocks (the paper's design), exactly
    like `lsh_candidate_pairs`' band buckets; ``max_cluster_size`` is the
    same hot-block guard — oversized clusters skip pair generation (their
    members are all kept) rather than detonating the self-join.

    Float discipline: each cosine is one array-ordered fold
    (`_dot_sql`'s sequential aggregate == DuckDB list_dot_product), norms
    computed once per vector, ROUND(decimals) before the threshold
    compare — so engines agree on every pair decision.
    """
    from morphik_core_spark.operators.similarity import _dot_sql, ivf_assign

    assigned = ivf_assign(embeddings, centroids, emb_col=emb_col, decimals=decimals).select(
        F.col(id_col),
        F.expr(f"cast(`{emb_col}` as array<double>)").alias("ev"),
        "ivf_cid",
    )
    assigned = assigned.withColumn("nrm", F.expr(f"sqrt({_dot_sql('ev', 'ev')})"))
    if persist:
        # read by both self-join sides and the final keep-join; without a
        # persist the centroid argmax runs three times over the corpus
        # (scoped: freed by the caller's next release_scoped())
        from morphik_core_spark.plans.cache import scoped_persist

        assigned = scoped_persist(assigned)
    pair_src = assigned
    if max_cluster_size is not None:
        ok = (
            assigned.groupBy("ivf_cid")
            .agg(F.count(F.lit(1)).alias("csz"))
            .filter(F.col("csz") <= max_cluster_size)
            .select("ivf_cid")
        )
        pair_src = assigned.join(F.broadcast(ok), "ivf_cid")
    a = pair_src.select(
        F.col("ivf_cid"),
        F.col(id_col).alias("a_id"),
        F.col("ev").alias("a_ev"),
        F.col("nrm").alias("a_nrm"),
    )
    b = pair_src.select(
        F.col("ivf_cid"),
        F.col(id_col).alias("b_id"),
        F.col("ev").alias("b_ev"),
        F.col("nrm").alias("b_nrm"),
    )
    cos = f"ROUND({_dot_sql('a_ev', 'b_ev')} / (a_nrm * b_nrm), {decimals})"
    dups = (
        a.join(b, "ivf_cid")
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(F.expr(f"{cos} >= {float(tau)!r}D"))
        .select(F.col("b_id").alias(id_col))
        .distinct()
    )
    return (
        assigned.join(dups.withColumn("_dup", F.lit(1)), id_col, "left")
        .select(
            F.col(id_col),
            F.col("ivf_cid").alias("cluster_id"),
            F.col("_dup").isNull().alias("kept"),
        )
    )


def golden_record(
    records: DataFrame,
    entity_col: str,
    fields: Sequence[str],
) -> DataFrame:
    """Survivorship / golden-record merge — the step after entity
    resolution in an MDM pipeline (reference has no analog; its
    documents are single-source so `core/services/document_service.py`
    never reconciles conflicting field values).

    Per entity and per field, the survivor is the MODE of the non-null
    values, ties broken by the lexicographically smallest rendered
    value — fully deterministic, engine- and partitioning-independent.

    Scale shape: all fields melt into ONE long frame (field values
    rendered to string), so the plan is two entity-keyed shuffles total
    — count per (entity, field, value), then argmax + re-widen —
    regardless of how many fields survive. The melt fan-out is
    len(fields) rows per record, bounded by the schema, never by data.
    Output: (entity, n_records, <one string column per field>).
    Callers re-cast typed fields; the demo query shows the pattern.
    """
    structs = [
        F.struct(
            F.lit(f).alias("field"),
            F.col(f).cast("string").alias("value"),
        )
        for f in fields
    ]
    melt = (
        records.select(
            F.col(entity_col).alias("entity"),
            F.explode(F.array(*structs)).alias("fv"),
        )
        .select("entity", "fv.field", "fv.value")
        .filter(F.col("value").isNotNull())
    )
    counts = melt.groupBy("entity", "field", "value").agg(
        F.count(F.lit(1)).alias("c")
    )
    # min_by over (-count, value): max count first, smallest value on ties
    surv = counts.groupBy("entity", "field").agg(
        F.min_by("value", F.struct((-F.col("c")).alias("nc"), F.col("value"))).alias(
            "value"
        )
    )
    wide = surv.groupBy("entity").agg(
        *[
            F.max(F.when(F.col("field") == f, F.col("value"))).alias(f)
            for f in fields
        ]
    )
    n = records.groupBy(F.col(entity_col).alias("entity")).agg(
        F.count(F.lit(1)).alias("n_records")
    )
    return n.join(wide, "entity", "left").select("entity", "n_records", *fields)


def blocking_recall(
    truth_pairs: DataFrame,
    candidate_pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    decimals: int = 6,
) -> DataFrame:
    """Blocking-quality audit: how much of the ground-truth duplicate set
    does a candidate generator (banded LSH, sign buckets, an inverted
    index) actually surface? The recall/precision QA every dedup stack
    needs before anyone trusts "dups removed" numbers — a blocked
    pipeline silently misses exactly the pairs its buckets never
    co-locate.

    Both inputs are canonical pairs (id_a < id_b). Output: one row —
    (n_truth, n_candidates, n_hits, recall, precision). ``precision``
    here reads "fraction of candidates that are true dups" — for LSH it
    is expected to be low (candidates are *verified* downstream); recall
    is the number that must stay near 1.

    Scale: one equi-join on the pair key (truth side is the small,
    often-synthesized set → broadcast), three one-row aggregates.
    """
    t = truth_pairs.select(F.col(id_a).alias("_ta"), F.col(id_b).alias("_tb"))
    c = candidate_pairs.select(F.col(id_a).alias("_ca"), F.col(id_b).alias("_cb"))
    hits = c.join(
        F.broadcast(t), (F.col("_ca") == F.col("_ta")) & (F.col("_cb") == F.col("_tb"))
    )
    n_t = t.agg(F.count(F.lit(1)).alias("n_truth"))
    n_c = c.agg(F.count(F.lit(1)).alias("n_candidates"))
    n_h = hits.agg(F.count(F.lit(1)).alias("n_hits"))
    return (
        n_t.join(F.broadcast(n_c))
        .join(F.broadcast(n_h))
        .select(
            "n_truth",
            "n_candidates",
            "n_hits",
            F.round(
                F.expr("CAST(n_hits AS DOUBLE) / CAST(n_truth AS DOUBLE)"), decimals
            ).alias("recall"),
            F.round(
                F.expr("CAST(n_hits AS DOUBLE) / CAST(n_candidates AS DOUBLE)"),
                decimals,
            ).alias("precision"),
        )
    )


def edit_distance_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """All pairs of rows whose ``text_col`` values are within Levenshtein
    distance 1, via deletion-neighborhood blocking (SymSpell / FastSS):
    each string emits itself plus every single-character deletion as a
    block key; two strings at distance ≤ 1 ALWAYS share a key (identity
    for d=0; the deletion at the edit position for a substitution; the
    shorter string itself for an insert/delete), so the equi-join on the
    variant is a complete, exact candidate generator — no all-pairs, no
    length-band scan. Candidates are verified with the real
    ``levenshtein`` before emission.

    Per-row fan-out is ``len+1`` keys and every bucket is a radius-1
    deletion ball, so the join keys are near-unique on natural name/id
    corpora; ``max_bucket_size`` is the hot-bucket valve for degenerate
    inputs (a million rows of the same short token) — buckets past the
    cap are dropped via a broadcast anti-join, same contract as
    ``lsh_candidate_pairs``.

    Output: ``id_a, id_b, text_a, text_b, dist`` with ``id_a < id_b``
    and ``dist ∈ {0, 1}`` (0 = distinct rows, identical strings).

    The entity-resolution primitive the reference's metadata layer
    lacks (morphik-core matches filenames only by exact/ILIKE,
    core/database/postgres_database.py); at 100 TB this is the
    typo-tolerant join for user/entity name reconciliation.
    """
    base = df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_s"))
    # pre-fan-out exchange: a small-file scan arrives as 1-2 partitions
    # and would run the explode + join on one core; no-op at real scale
    sc = df.sparkSession.sparkContext
    if base.rdd.getNumPartitions() < sc.defaultParallelism:
        base = base.repartition(sc.defaultParallelism)
    t = "_s"
    # join on the 8-byte hash of the variant, ids only — the strings and
    # the levenshtein verify rejoin AFTER pair dedup, so each candidate
    # pair is verified once, not once per shared deletion key, and the
    # exchange carries (hash, id) instead of full strings. A hash
    # collision can only ADD a candidate, which the verify then rejects.
    variants = base.select(
        "_id",
        F.explode(
            F.expr(
                f"array_union(array({t}), transform(sequence(1, length({t})),"
                f" i -> concat(substring({t}, 1, i-1),"
                f" substring({t}, i+1, length({t})-i))))"
            )
        ).alias("_v"),
    ).select("_id", F.xxhash64("_v").alias("_h"))
    if max_bucket_size is not None:
        hot = (
            variants.groupBy("_h")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > max_bucket_size)
            .select("_h")
        )
        variants = variants.join(F.broadcast(hot), "_h", "left_anti")
    a = variants.select("_h", F.col("_id").alias("id_a"))
    b = variants.select("_h", F.col("_id").alias("id_b"))
    cand = (
        a.join(b, ["_h"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    na = base.select(F.col("_id").alias("id_a"), F.col("_s").alias("text_a"))
    nb = base.select(F.col("_id").alias("id_b"), F.col("_s").alias("text_b"))
    return (
        cand.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn("dist", F.levenshtein("text_a", "text_b"))
        .filter(F.col("dist") <= 1)
        .select("id_a", "id_b", "text_a", "text_b", "dist")
    )


def fellegi_sunter_em(
    pairs: DataFrame,
    agree_cols: Sequence[str],
    iters: int = 20,
    init_m: float = 0.9,
    init_u: float = 0.1,
    init_p: float = 0.1,
    upper_weight: float = 3.0,
    lower_weight: float = 0.0,
    decimals: int = 6,
) -> DataFrame:
    """Fellegi–Sunter probabilistic record linkage (Fellegi & Sunter
    1969) with unsupervised EM parameter estimation (Winkler 1988) —
    the canonical upgrade over `entity_resolution`'s hard edit-distance
    threshold: per comparison field i, learn m_i = P(agree | match) and
    u_i = P(agree | non-match) under conditional independence, then
    score every agreement PATTERN with the log-likelihood-ratio weight

        w(pattern) = sum_i [ gamma_i * ln(m_i/u_i)
                             + (1-gamma_i) * ln((1-m_i)/(1-u_i)) ]

    and classify match / possible / non-match by the weight thresholds.

    Scale shape: the corpus contributes ONE groupBy — candidate pairs
    collapse to their 2^k agreement patterns (k = len(agree_cols),
    bounded by construction) — and EM runs driver-side on that bounded
    pattern table (the markov-solve boundary class: a distributed
    restatement of a scalar fixed point is pure stage overhead). Every
    EM round re-quantizes m_i, u_i, p to 1e-12 (round-half-even via
    Python round(), mirrored by the oracle's ROUND), so the trajectory
    is bit-reproducible and an unrolled-CTE oracle replays it verbatim.

    Output: one row per OBSERVED pattern — (gamma_<field>..., n_pairs,
    match_posterior, weight, decision), ordered by weight desc then
    pattern. Learned parameters ride every row (m_<field>, u_<field>)
    so the report is self-describing.
    """
    k = len(agree_cols)
    if not 1 <= k <= 10:
        raise ValueError("agree_cols must have 1..10 fields")
    pat = (
        pairs.groupBy(*[F.col(c).cast("int").alias(f"g{i}") for i, c in enumerate(agree_cols)])
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
    rows = pat.collect()  # bounded: at most 2^k rows
    # deterministic pattern order — EM's cross-pattern sums are integer
    # pico-units so order can't move them, but the output row order and
    # the oracle's GROUP BY must agree anyway
    rows = sorted(rows, key=lambda r: tuple(int(r[f"g{i}"]) for i in range(k)))
    gammas = [tuple(int(r[f"g{i}"]) for i in range(k)) for r in rows]
    counts = [int(r["n_pairs"]) for r in rows]
    total = sum(counts)

    # per-round quantize AND clamp away from {0, 1}: EM on separable or
    # degenerate data drives m/u to exact 0/1, which makes the
    # log-likelihood weights infinite — the standard floor keeps every
    # weight finite (and the clamp is part of the mirrored contract)
    q = lambda x: min(max(round(x, 12), 1e-9), 1.0 - 1e-9)

    def posteriors_micro(p, m, u):
        # per-pattern P(match | gamma), quantized to integer MICRO-units
        # (1e-6) immediately — every cross-pattern sum below is then
        # exact integer arithmetic (and stays under 2^53 to ~10^9 pairs,
        # so the oracle's int->double casts are exact too); neither
        # collect order nor the oracle's aggregation order can move an
        # ulp
        out = []
        for g in gammas:
            pm = p
            pu = 1.0 - p
            for i in range(k):
                pm = pm * (m[i] if g[i] else 1.0 - m[i])
                pu = pu * (u[i] if g[i] else 1.0 - u[i])
            out.append(round(pm / (pm + pu) * 1e6))
        return out

    MICRO = 1_000_000
    m = [q(float(init_m))] * k
    u = [q(float(init_u))] * k
    p = q(float(init_p))
    for _ in range(int(iters)):
        wq = posteriors_micro(p, m, u)
        # the 1e-9 clamp protects m/u/p but not these integer sums: on
        # degenerate inputs every posterior can round to 0 (wsum=0) or
        # to MICRO (lsum=0) — floor both at 1 micro-unit so the M-step
        # never divides by zero (mirrored in the generated oracle CTE)
        wsum = max(sum(w * c for w, c in zip(wq, counts)), 1)  # exact int
        lsum = max(sum((MICRO - w) * c for w, c in zip(wq, counts)), 1)
        p = q(wsum / (total * MICRO))
        m = [
            q(sum(w * c for w, c, g in zip(wq, counts, gammas) if g[i]) / wsum)
            for i in range(k)
        ]
        u = [
            q(sum((MICRO - w) * c for w, c, g in zip(wq, counts, gammas) if g[i]) / lsum)
            for i in range(k)
        ]

    # final posterior under the CONVERGED parameters (the loop's last
    # E-step ran before the last M-step)
    post = [w / MICRO for w in posteriors_micro(p, m, u)]

    import math as _math

    out_rows = []
    for g, c, w_post in zip(gammas, counts, post):
        weight = 0.0
        for i in range(k):
            if g[i]:
                weight += round(_math.log(m[i] / u[i]), 12)
            else:
                weight += round(_math.log((1.0 - m[i]) / (1.0 - u[i])), 12)
        weight = round(weight, 9)
        decision = (
            "match" if weight >= upper_weight
            else ("possible" if weight >= lower_weight else "non_match")
        )
        out_rows.append(
            tuple(g) + (c, round(w_post, decimals), round(weight, decimals), decision)
            + tuple(round(m[i], decimals) for i in range(k))
            + tuple(round(u[i], decimals) for i in range(k))
        )
    spark = pairs.sparkSession
    gcols = ", ".join(f"gamma_{c} int" for c in agree_cols)
    mcols = ", ".join(f"m_{c} double" for c in agree_cols)
    ucols = ", ".join(f"u_{c} double" for c in agree_cols)
    schema = (
        f"{gcols}, n_pairs bigint, match_posterior double, weight double, "
        f"decision string, {mcols}, {ucols}"
    )
    from morphik_core_spark.plans.literal import literal_frame_from_schema

    res = literal_frame_from_schema(spark, schema, out_rows)
    return res.orderBy(
        F.col("weight").desc(), *[F.col(f"gamma_{c}").asc() for c in agree_cols]
    )


def mutual_best_match(
    pairs: DataFrame,
    a_col: str,
    b_col: str,
    score_col: str,
    min_score: float | None = None,
    decimals: int = 9,
) -> DataFrame:
    """One-to-one assignment from scored candidate pairs: keep (a, b)
    where b is a's highest-scoring candidate AND a is b's — the
    symmetric-argmax assignment step that turns `fellegi_sunter_em`
    match scores (or any blocker's similarities) into an actual
    entity mapping. Mutual-best is the standard sub-quadratic stand-in
    for optimal bipartite matching: one pass, no iterations, and every
    emitted pair is stable (neither side prefers another candidate).

    Determinism: scores are ROUNDed before the argmax (the
    rounded-argmax rule) and ties break to the smaller partner key, so
    the assignment is engine- and partitioning-independent. Windows
    partition by each side's key — candidate lists are blocking-bounded,
    never corpus-wide.

    Output: the winning pair rows (all input columns), one per matched
    entity on each side.
    """
    from pyspark.sql import Window

    s = F.round(F.col(score_col).cast("double"), decimals)
    if min_score is not None:
        pairs = pairs.filter(F.col(score_col) >= float(min_score))
    w_a = Window.partitionBy(a_col).orderBy(s.desc(), F.col(b_col).asc())
    w_b = Window.partitionBy(b_col).orderBy(s.desc(), F.col(a_col).asc())
    ranked = pairs.withColumn("_ra", F.row_number().over(w_a)).withColumn(
        "_rb", F.row_number().over(w_b)
    )
    return ranked.filter((F.col("_ra") == 1) & (F.col("_rb") == 1)).drop("_ra", "_rb")
