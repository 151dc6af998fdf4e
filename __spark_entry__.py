"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)``   — flagship query (filtered vector top-k, the reference's
                     /retrieve/chunks pipeline) on sf0.001.
``queries()``      — one callable per implemented operator from SURVEY.md §2,
                     mapped onto the synthetic testdata tables
                     (orders/lineitem ≅ documents/chunks, embeddings ≅ vector
                     index — see FIXTURES.md §7).
``oracle_sql()``   — DuckDB-equivalent SQL per query. Column names and float
                     rounding match EXACTLY on both sides (the driver hashes
                     values).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from morphik_core_spark.functions.vectors import retrieval_score
from morphik_core_spark.operators.analytics import POISSON1_CDF_U30
from morphik_core_spark.operators import (
    asof,
    curation,
    dedup,
    docstore,
    graph,
    limits,
    listing,
    maxsim,
    retrieval,
    similarity,
    text_analysis,
)
from morphik_core_spark.operators.metadata_filters import MetadataFilterCompiler
from morphik_core_spark.sources.tables import load_table

# multivector derivation: 64-dim embedding → 8 token vectors × 8 dims
_MV_TOKENS = 8
_MV_DIMS = 8

# Deterministic query vector for retrieval queries: the embedding of
# vec_id = 0 (testdata is seeded, so this is stable across scale factors
# only in distribution, not value — both engines read it from the table
# itself, so parity holds at every sf).
_QUERY_VEC_ID = 0
_EMB_DIMS = 64  # embeddings.parquet vector width
_SCORE_DECIMALS = 6


def _scoped(df: DataFrame) -> DataFrame:
    """Persist through the engine's lifecycle registry: any boundary
    (bench iteration, API edge, driver round) frees these via
    plans.cache.release_scoped() — a bare .persist() here would outlive
    the query and accumulate for the session (round-5 defect)."""
    from morphik_core_spark.plans.cache import scoped_persist

    return scoped_persist(df)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # Harness boundary: these queries DEFINE their timestamp semantics
        # as UTC (matching the DuckDB oracles, whose naive TIMESTAMPs are
        # the stored wall clocks). load_table() itself no longer mutates
        # the session timezone — the instant conversion inside it is
        # tz-independent — but date_trunc/window rendering and collect()
        # are session-tz-sensitive, so the harness session is pinned here.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    return load_table(spark, name, sf_dir)


# Constant-lookup caches keyed by sf_dir. These are tiny driver-side
# reads (one row / four rows) that parameterize the real query; caching
# them keeps BENCH measuring the query plan, not two extra first()
# round-trips per timing. Real deployments hold the query vector in the
# driver anyway — it arrives with the request, not from a table scan.
_QV_CACHE: dict[str, list[float]] = {}
_PLANES_CACHE: dict[str, list[list[float]]] = {}
_FTS_PROJ_CACHE: dict[str, DataFrame] = {}


def _query_vector(spark: SparkSession, sf_dir: str) -> list[float]:
    if sf_dir not in _QV_CACHE:
        row = (
            _t(spark, sf_dir, "embeddings")
            .filter(F.col("vec_id") == _QUERY_VEC_ID)
            .select("embedding")
            .first()
        )
        _QV_CACHE[sf_dir] = [float(x) for x in row.embedding]
    return _QV_CACHE[sf_dir]


# --------------------------------------------------------------- flagship


def entry(spark: SparkSession) -> DataFrame:
    """Filtered vector top-k, end-to-end (SURVEY §3.1 restated in Spark).

    documents(lang='en') → semi-join embeddings → cosine score → top-10.
    """
    sf_dir = "/root/testdata/sf0.001"
    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")

    compiler = MetadataFilterCompiler(metadata_col="metadata", types_col=None, column_fields={"lang": "lang"})
    # documents table has plain columns; route lang as a column field
    authorized = docs.filter(compiler.compile({"lang": {"$in": ["en", "de"]}})).select(
        F.col("doc_id").alias("document_id")
    )
    chunks = emb.select(
        F.col("vec_id").alias("document_id"),
        F.col("vec_id").alias("chunk_number"),
        "embedding",
    )
    qv = _query_vector(spark, sf_dir)
    scored = retrieval.score_chunks(retrieval.scoped_chunks(chunks, authorized), qv)
    scored = scored.withColumn("score", F.round(F.col("score"), _SCORE_DECIMALS))
    return retrieval.top_k(scored, 10, tiebreak=("document_id",)).select("document_id", "score")


# ---------------------------------------------------------------- queries


def _q_semi_join_auth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Authorized-docs semi-join (SURVEY §2.3): restrict fact rows to ids
    passing a dimension predicate; broadcast, no fact shuffle."""
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    auth = orders.filter(F.col("o_orderstatus") == "F").select(F.col("o_orderkey").alias("l_orderkey"))
    return retrieval.scoped_chunks(lineitem, auth, doc_col="l_orderkey").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


def _q_hydration_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk→document hydration join (SURVEY §2.3): broadcast dimension."""
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    return (
        lineitem.join(F.broadcast(orders), lineitem.l_orderkey == orders.o_orderkey)
        .select(
            "l_orderkey",
            "l_linenumber",
            "o_orderdate",
            "o_orderpriority",
            F.round(F.col("l_extendedprice"), 2).alias("price"),
        )
    )


def _q_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k (SURVEY §2.5 vector top-k), score = 1 − d/2."""
    emb = _t(spark, sf_dir, "embeddings")
    qv = _query_vector(spark, sf_dir)
    scored = emb.select(
        "vec_id",
        F.round(
            retrieval_score(F.col("embedding").cast("array<double>"), F.lit(qv).cast("array<double>")),
            _SCORE_DECIMALS,
        ).alias("score"),
    )
    return retrieval.top_k(scored, 10, tiebreak=("vec_id",))


def _q_doc_max_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-level max-score aggregation (SURVEY §2.4): keep each group's best
    row via max_by — single shuffle, map-side combine."""
    lineitem = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("document_id"),
        F.col("l_linenumber").alias("chunk_number"),
        F.col("l_extendedprice").alias("score"),
    )
    out = retrieval.document_results(lineitem)
    return out.select("document_id", "chunk_number", F.round("score", 2).alias("score"))


def _q_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Status counts with ''/NULL → 'unknown' normalization (SURVEY §2.4)."""
    orders = _t(spark, sf_dir, "orders")
    return listing.value_counts(orders, "o_orderstatus")


def _q_listing_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable sorted pagination: NULLS LAST + tiebreak + offset/limit (§2.6)."""
    docs = _t(spark, sf_dir, "documents")
    page = listing.sorted_page(docs, sort_by="n_chars", order="desc", skip=20, limit=10, tiebreak="doc_id")
    return listing.project(page, ["doc_id", "lang", "n_chars"], always=("doc_id",))


def _q_padding_selfjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """±1 chunk padding around matches, matched score kept, padding 0.0 (§2.3)."""
    lineitem = _t(spark, sf_dir, "lineitem")
    chunks = lineitem.select(
        F.col("l_orderkey").alias("document_id"),
        F.col("l_linenumber").alias("chunk_number"),
        F.round("l_extendedprice", 2).alias("price"),
    )
    matches = chunks.filter(F.col("price") > 99000).withColumn("score", F.col("price"))
    padded = retrieval.with_padding(matches.select("document_id", "chunk_number", "score"), chunks, padding=1)
    return padded.select("document_id", "chunk_number", "price", "score")


def _q_colpali_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union-with-replacement on the chunk key (§2.6 colpali/regular merge)."""
    lineitem = _t(spark, sf_dir, "lineitem")
    base = lineitem.select(
        F.col("l_orderkey").alias("document_id"),
        F.col("l_linenumber").alias("chunk_number"),
        F.lit("regular").alias("source_kind"),
    ).filter(F.col("document_id") % 2 == 0)
    override = lineitem.select(
        F.col("l_orderkey").alias("document_id"),
        F.col("l_linenumber").alias("chunk_number"),
        F.lit("colpali").alias("source_kind"),
    ).filter((F.col("document_id") % 4 == 0) & (F.col("chunk_number") <= 2))
    return retrieval.merge_colpali(base, override)


def _q_lang_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic value counts on the documents table (§2.4)."""
    docs = _t(spark, sf_dir, "documents")
    return listing.value_counts(docs, "lang")


def _q_filter_dsl_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata filter DSL over a JSON column (§2.2) — typed comparison,
    combinators, $exists, $contains on a routed plain column."""
    # pre-parse to variant once ("shred at ingest") — every predicate branch
    # then reads the binary variant instead of re-parsing the JSON string
    events = _t(spark, sf_dir, "events").withColumn("props_v", F.parse_json("props"))
    comp = MetadataFilterCompiler(
        metadata_col="props_v", types_col=None, column_fields={"event_type": "event_type"},
        metadata_kind="variant",
    )
    pred = comp.compile(
        {
            "$and": [
                {"k": {"$exists": True}},
                {"$or": [{"k": 7}, {"k": {"$in": [11, 13, 17]}}]},
                {"event_type": {"$contains": "e"}},
            ]
        }
    )
    return events.filter(pred).select("event_id", "event_type", F.round("value", 2).alias("value"))


def _multivectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings table reshaped into ragged multivectors (FIXTURES.md §3)."""
    emb = _t(spark, sf_dir, "embeddings")
    mv = F.expr(
        f"transform(sequence(0, {_MV_TOKENS - 1}), "
        f"t -> slice(cast(embedding AS array<double>), t * {_MV_DIMS} + 1, {_MV_DIMS}))"
    )
    return emb.select("vec_id", mv.alias("multivector"))


def _query_tokens(spark: SparkSession, sf_dir: str) -> list[list[float]]:
    qv = _query_vector(spark, sf_dir)
    return [qv[t * _MV_DIMS : (t + 1) * _MV_DIMS] for t in range(_MV_TOKENS)]


def _q_maxsim_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-interaction MaxSim top-k — served by the vectorized pandas path
    (no shuffle); the oracle is the relational formulation, and
    tests/test_maxsim.py pins that both forms agree to 1e-12."""
    mv = _multivectors(spark, sf_dir)
    scored = maxsim.maxsim_pandas(mv, _query_tokens(spark, sf_dir), id_cols=("vec_id",))
    scored = scored.select("vec_id", F.round("maxsim", _SCORE_DECIMALS).alias("maxsim"))
    return retrieval.top_k(scored, 10, score_col="maxsim", tiebreak=("vec_id",))


def _hamming_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packed-bit Hamming MaxSim scores for every vector (production path:
    quantize once, XOR+popcount per pair). Hamming sims are dyadic
    rationals, so float sums are EXACT — bit-identical to the relational
    oracle with no rounding risk."""
    import numpy as np

    from morphik_core_spark.functions.quantization import (
        hamming_maxsim_packed,
        multivector_quantize_udf,
    )

    mv = _multivectors(spark, sf_dir)
    q_packed = [
        np.packbits(np.asarray(t) > 0).tobytes() for t in _query_tokens(spark, sf_dir)
    ]
    scorer = hamming_maxsim_packed(q_packed, _MV_DIMS)
    packed = mv.withColumn("packed", multivector_quantize_udf(F.col("multivector")))
    return packed.select("vec_id", F.round(scorer("packed"), _SCORE_DECIMALS).alias("maxsim"))


def _q_maxsim_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantized MaxSim top-k — served by the packed-bit kernel;
    oracle stays the relational sign-dot formulation (SURVEY §4)."""
    return retrieval.top_k(_hamming_scored(spark, sf_dir), 10, score_col="maxsim", tiebreak=("vec_id",))


def _q_two_stage_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval: cheap binary Hamming prune to 50 candidates →
    exact rescore → top-10 (reference fast_multivector_store.py:504-608)."""
    mv = _multivectors(spark, sf_dir)
    qtoks = _query_tokens(spark, sf_dir)
    coarse = _hamming_scored(spark, sf_dir)
    survivors = retrieval.top_k(coarse, 50, score_col="maxsim", tiebreak=("vec_id",)).select("vec_id")
    exact = maxsim.maxsim_pandas(
        mv.join(F.broadcast(survivors), "vec_id", "left_semi"), qtoks, id_cols=("vec_id",)
    )
    exact = exact.select("vec_id", F.round("maxsim", _SCORE_DECIMALS).alias("maxsim"))
    return retrieval.top_k(exact, 10, score_col="maxsim", tiebreak=("vec_id",))


# ------------------------------------------------- pipeline extensions

_MINHASHES = 8
_LSH_BANDS = 4
_LSH_ROWS = 2
_JACCARD_N = 3
_JACCARD_THRESHOLD = 0.02
# max-containment gate: ~200 pairs at sf0.01, about half below the
# Jaccard gate (size-mismatched excerpts) — measured, non-vacuous
_CONTAINMENT_THRESHOLD = 0.10
# Skew guards. Both deliberately low enough to bite at sf0.01 so the
# capped code path is the one the driver's oracle verifies; production
# values are corpus-relative (e.g. df > 0.5% of docs, buckets > ~1000).
_JACCARD_MAX_DF = 6
_LSH_MAX_BUCKET = 2
_KNN_QUERIES = 5
# 4 planes → 16 buckets: at the testdata's 500-2000 vectors this keeps
# ~30-125 candidates per bucket, enough to fill k=10 (more planes = finer
# pruning; tune with corpus size). 2 probes = own bucket + the
# lowest-margin bit flip (ivfflat probes analog; recall measured in
# evaluations/retrieval_eval.py).
_ANN_PLANES = 4
_ANN_PROBES = 2
# IVF coarse quantizer: 8 lists over the 500-vector index (~60/list),
# probe 2 — the pgvector ivfflat lists/probes analog. Centroids are
# deterministic pivot rows (vec_id 1..8) standing in for an offline
# k-means fit; recall@10 vs knn_batch measured in retrieval_eval.py.
_IVF_LISTS = 8
_IVF_PROBES = 2
# Embedding-cosine near-dup: 4 sign-LSH planes block the pair space
# (~5× cut at this corpus; geometric with plane count), cosine ≥ 0.98
# keeps true near-dup rewrites while dropping topical-overlap noise.
_NEARDUP_PLANES = 4
_NEARDUP_THRESHOLD = 0.98


def _q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: normalize → md5 fingerprint → min-id keeper per group."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.exact_duplicates(docs, "text", "doc_id")


def _q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures over word 3-gram shingles (portable hash family).

    Served by the zero-shuffle map-side fold (`minhash_signatures_inline`);
    bit-identity with the exploded word_shingles → groupBy-min form is
    test-asserted (tests/test_dedup.py)."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.minhash_signatures_inline(
        docs, "text", "doc_id", n=_JACCARD_N, num_hashes=_MINHASHES
    )


def _q_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded-LSH candidate pairs from the MinHash signatures."""
    sigs = _q_minhash_signatures(spark, sf_dir)
    return dedup.lsh_candidate_pairs(
        sigs, "doc_id", bands=_LSH_BANDS, rows_per_band=_LSH_ROWS, max_bucket_size=_LSH_MAX_BUCKET
    )


def _q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash fingerprints (sign-aggregated token-hash bits).

    Served from the one-pass Arrow kernel (zero shuffles); the relational
    32×-explode form (dedup.simhash) stays as the oracle-expressible twin
    and tests assert the two are bit-identical.
    """
    docs = _t(spark, sf_dir, "documents")
    return dedup.simhash_pandas(docs, "text", "doc_id", bits=32)


def _q_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram Jaccard near-dup pairs via inverted-index self-join."""
    docs = _t(spark, sf_dir, "documents")
    sh = dedup.word_shingles(docs, "text", "doc_id", n=_JACCARD_N)
    pairs = dedup.jaccard_pairs(sh, "doc_id", threshold=_JACCARD_THRESHOLD, max_df=_JACCARD_MAX_DF)
    return pairs.select("id_a", "id_b", F.round("jaccard", _SCORE_DECIMALS).alias("jaccard"))


def _q_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Poisson-bootstrap 95% CI for mean order value
    (`analytics.bootstrap_ci`, Chamandy-style streaming bootstrap):
    200 reproducible resamples from integer-threshold Poisson(1)
    weights on portable-hash residues — the experimentation family's
    uncertainty rollup, exact across engines and partitionings."""
    from morphik_core_spark.operators.analytics import bootstrap_ci

    orders = _t(spark, sf_dir, "orders")
    return bootstrap_ci(orders, "o_totalprice", "o_orderkey", n_resamples=200, decimals=2)


def _q_containment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment near-dup (`dedup.containment_pairs`):
    C(a in b) = |S_a ∩ S_b|/|S_a| over the same capped shingle index as
    `jaccard_pairs` — catches excerpt/boilerplate-wrapped copies whose
    size mismatch hides them from Jaccard (on this corpus roughly half
    the pairs ≥ 0.10 sit below the Jaccard gate)."""
    docs = _t(spark, sf_dir, "documents")
    sh = dedup.word_shingles(docs, "text", "doc_id", n=_JACCARD_N)
    return dedup.containment_pairs(
        sh, "doc_id", threshold=_CONTAINMENT_THRESHOLD, max_df=_JACCARD_MAX_DF
    )


def _q_ranking_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query MRR/NDCG@10 retrieval evaluation (`ml_eval.
    ranking_metrics`): exact cosine top-10 for 5 query vectors
    (self-hits excluded), relevance = shared embedding label — the
    order-sensitive complement of `ann_recall`'s set-overlap audit.
    Scaled-integer DCG terms keep per-query sums order-free."""
    from morphik_core_spark.operators.ml_eval import ranking_metrics
    from pyspark.sql import Window

    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < _KNN_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
        F.col("label").alias("q_label"),
    )
    topk = similarity.knn_brute_force(
        emb, queries_df.select("q_id", "qv"), k=11, decimals=_SCORE_DECIMALS
    ).filter(F.col("vec_id") != F.col("q_id"))
    w = Window.partitionBy("q_id").orderBy(F.col("score").desc(), F.col("vec_id").asc())
    ranked = (
        topk.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .join(F.broadcast(queries_df.select("q_id", "q_label")), "q_id")
        .join(emb.select("vec_id", "label"), "vec_id")
        .withColumn("rel", (F.col("label") == F.col("q_label")).cast("int"))
    )
    return ranking_metrics(ranked, "q_id", "rank", "rel", k=10)


_GRAPH_SEEDS = ["spark"]
_GRAPH_EXPANSION_K = 5
_GRAPH_SEED_WEIGHT = 1000
_OVERLAP_BUCKET_DAYS = 32
_OVERLAP_EPOCH = "1992-01-01"
_HAMPEL_HALF_WINDOW = 12
_LDIV_L = 3


def _q_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval×interval overlap join (`asof.interval_overlap_pairs`):
    each order opens a priority-dependent fulfillment window (7×digit
    days); count, per nation, the concurrently-open order pairs and
    their mean overlap length. Bucket-decomposed equi-join — both
    sides scale to 100 TB; the brute oracle is the O(n²)-per-nation
    form this restates."""
    from morphik_core_spark.operators.asof import interval_overlap_pairs

    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    iv = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            F.col("o_orderkey").alias("k"),
            F.col("c_nationkey").alias("nk"),
            F.datediff(F.col("o_orderdate"), F.lit(_OVERLAP_EPOCH).cast("date")).alias("s"),
            (
                F.datediff(F.col("o_orderdate"), F.lit(_OVERLAP_EPOCH).cast("date"))
                + 7 * F.substring("o_orderpriority", 1, 1).cast("int")
            ).alias("e"),
        )
    )
    pairs = interval_overlap_pairs(
        iv, "k", "s", "e", bucket_width=_OVERLAP_BUCKET_DAYS, key_cols=["nk"]
    )
    return (
        pairs.withColumn(
            "od", F.least("hi_a", "hi_b") - F.greatest("lo_a", "lo_b") + F.lit(1)
        )
        .groupBy("nk")
        .agg(F.count(F.lit(1)).alias("n_pairs"), F.round(F.avg("od"), 4).alias("avg_overlap_days"))
        .join(F.broadcast(nation), F.col("nk") == F.col("n_nationkey"))
        .select("n_name", "n_pairs", "avg_overlap_days")
    )


def _q_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typo-tolerant entity-resolution join (`dedup.edit_distance_pairs`):
    all customer-name pairs within Levenshtein distance 1, generated by
    deletion-neighborhood (SymSpell) blocking — an exact, complete
    candidate set with no all-pairs scan; the oracle is the brute
    length-banded form."""
    cust = _t(spark, sf_dir, "customer")
    pairs = dedup.edit_distance_pairs(cust, "c_name", "c_custkey")
    return pairs.select(
        "id_a", "id_b",
        F.col("text_a").alias("name_a"), F.col("text_b").alias("name_b"),
        F.col("dist").cast("long").alias("dist"),
    )


def _q_graph_rag_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GraphRAG retrieval (`graph.term_cooccurrence_edges` +
    `graph.seed_expansion_weights`): build the term co-occurrence
    knowledge graph over the corpus, expand the seed term one hop to
    its top-5 co-occurring neighbors, then rank documents by
    tf-weighted matched-entity score — the GraphRAG shape (build an
    entity graph offline, expand query entities through it at
    retrieval time; hosted-tier in morphik, no core analog). The
    weight table is
    broadcast-sized by construction, so retrieval is one broadcast
    join over the corpus."""
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    edges = graph.term_cooccurrence_edges(docs, "text", "doc_id")
    wts = graph.seed_expansion_weights(
        edges, _GRAPH_SEEDS, k=_GRAPH_EXPANSION_K, seed_weight=_GRAPH_SEED_WEIGHT
    )
    tf = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("term"),
        )
        .filter(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    scored = (
        tf.join(F.broadcast(wts), "term")
        .groupBy("doc_id")
        .agg(F.sum(F.col("tf") * F.col("wt")).alias("score"), F.count(F.lit(1)).alias("n_matched"))
    )
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 20)
        .select("doc_id", "score", "n_matched")
    )


def _q_rolling_median_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hampel-style ingest watchdog (`analytics.rolling_median_flags`):
    hourly event counts vs the exact median of the ±12-hour
    neighborhood; a row is anomalous when it deviates from the local
    median by more than half of it. Twice-the-median int64 arithmetic
    keeps the flag bit-identical across engines and partitionings."""
    from morphik_core_spark.operators.analytics import rolling_median_flags

    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("hr")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return rolling_median_flags(
        hourly, "hr", "n", half_window=_HAMPEL_HALF_WINDOW, rel_num=1, rel_den=2
    )


def _q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class l-diversity detail (`validation.l_diversity_classes`):
    quasi-identifier = (nation, market segment, account-balance
    decile), sensitive attribute = order priority of the class's
    orders, class size in distinct customers — lists the equivalence
    classes a release gate must generalize or suppress (the
    remediation complement of `validation_suite`'s k-anonymity
    rollup)."""
    from pyspark.sql import Window

    from morphik_core_spark.operators.validation import l_diversity_classes

    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    w = Window.orderBy(F.col("c_acctbal").asc(), F.col("c_custkey").asc())
    c10 = cust.withColumn("bal_decile", F.ntile(10).over(w))
    joined = c10.join(orders, c10.c_custkey == orders.o_custkey)
    return l_diversity_classes(
        joined,
        ["c_nationkey", "c_mktsegment", "bal_decile"],
        "o_orderpriority",
        l=_LDIV_L,
        entity_col="c_custkey",
    )


def _q_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line max-concurrency (`asof.peak_concurrency`): per nation,
    the maximum number of simultaneously-open order fulfillment windows
    and the first day the peak holds — the HOW-MANY companion to
    `interval_overlap`'s WHO-overlaps pair join, in O(n) rows with no
    pair materialization."""
    from morphik_core_spark.operators.asof import peak_concurrency

    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    iv = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        F.col("c_nationkey").alias("nk"),
        F.datediff(F.col("o_orderdate"), F.lit(_OVERLAP_EPOCH).cast("date")).alias("s"),
        (
            F.datediff(F.col("o_orderdate"), F.lit(_OVERLAP_EPOCH).cast("date"))
            + 7 * F.substring("o_orderpriority", 1, 1).cast("int")
        ).alias("e"),
    )
    pk = peak_concurrency(iv, ["nk"], "s", "e")
    return (
        pk.join(F.broadcast(nation), F.col("nk") == F.col("n_nationkey"))
        .select(
            "n_name",
            "peak",
            F.date_add(F.lit(_OVERLAP_EPOCH).cast("date"), F.col("peak_at").cast("int")).alias(
                "peak_date"
            ),
        )
    )


def _q_changepoint_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline change-point (`analytics.cusum_split`): the day that
    maximizes the CUSUM deviation |N·S_t − n_t·S_N| of the daily order
    volume — binary segmentation's first split, decided on exact
    DECIMAL(38,0) integers (the offline complement of `cusum_drift`'s
    online alarm)."""
    from morphik_core_spark.operators.analytics import cusum_split

    orders = _t(spark, sf_dir, "orders")
    daily = orders.groupBy(F.date_trunc("day", F.col("o_orderdate")).alias("dt")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return cusum_split(daily, "dt", "n").select(
        F.col("split_at").cast("date").alias("split_day"),
        "d_stat",
        "mean_left",
        "mean_right",
    )


def _q_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch re-aggregation (`sketches.hll_registers` + `hll_merge` +
    `hll_estimate_from_registers`): per-nation HLL sketches of distinct
    ordering customers MERGE (MAX per register) into region-grain
    estimates — identical to sketching the region's raw rows, which is
    what lets 100 TB rollup tables store sketch columns instead of
    re-scanning facts. The oracle computes the region grain directly;
    associativity makes the two byte-identical."""
    from morphik_core_spark.operators.sketches import (
        hll_estimate_from_registers,
        hll_merge,
        hll_registers,
    )

    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    facts = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("r_name", "n_nationkey", "o_custkey")
    )
    regs = hll_registers(facts, ["r_name", "n_nationkey"], "o_custkey", p=9)
    merged = hll_merge(regs, ["r_name"])
    return hll_estimate_from_registers(merged, ["r_name"], p=9)


def _q_trigram_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence mining (`analytics.sequence_ngrams`): the top-20 most
    frequent within-user event-type trigrams (contiguous PrefixSpan
    case) — what users DO in order, beyond `event_transitions`'
    bigrams. Lead windows shard by user; the count groupBy is bounded
    by |event-type vocabulary|³."""
    from pyspark.sql import Window

    from morphik_core_spark.operators.analytics import sequence_ngrams

    ev = _t(spark, sf_dir, "events")
    tri = sequence_ngrams(ev, ["user_id"], ["ts", "event_id"], "event_type", n=3)
    w = Window.orderBy(
        F.col("n_occurrences").desc(), F.col("g1").asc(), F.col("g2").asc(), F.col("g3").asc()
    )
    return (
        tri.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 20)
        .select("g1", "g2", "g3", "n_occurrences")
    )


def _q_quantile_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization (`curation.quantile_normalize`): each
    order's price is replaced by the GLOBAL price at its within-nation
    per-mille rank — exact nearest-rank integer logic end to end, with
    the per-mille→global-rank lookup riding the bucket-decomposed
    `interval_point_join` over the cumulative value grid."""
    from morphik_core_spark.operators.curation import quantile_normalize

    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    d = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        "o_orderkey", "c_nationkey", "o_totalprice"
    )
    return quantile_normalize(d, ["c_nationkey"], "o_totalprice", "o_orderkey")


def _q_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical feature-relevance screen (`analytics.
    mutual_information`): I(X;Y) in nats for three column pairs —
    (lang, source) is genuinely dependent (~0.09 nats), the TPC-H pairs
    are near-independent (~1e-4) — the multiclass complement of the
    binary-label WOE/IV ladder. Per-cell ROUND(·1e12) quantized-ln
    terms keep the sums integer-exact across engines."""
    from morphik_core_spark.operators.analytics import mutual_information

    docs = _t(spark, sf_dir, "documents")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    parts = [
        mutual_information(docs, "lang", "source").withColumn(
            "pair", F.lit("lang_source")
        ),
        mutual_information(cust, "c_mktsegment", "c_nationkey").withColumn(
            "pair", F.lit("segment_nation")
        ),
        mutual_information(orders, "o_orderpriority", "o_orderstatus").withColumn(
            "pair", F.lit("priority_status")
        ),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select("pair", "mi_nats")


def _q_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum scheduling (`curation.curriculum_order`): documents
    tiled into 10 length-difficulty buckets, deterministically shuffled
    within bucket by portable hash (partitioning-independent, unlike
    rand(seed)), then interleaved one-per-bucket so every training
    epoch sees the full difficulty spectrum early."""
    from morphik_core_spark.operators.curation import curriculum_order

    docs = _t(spark, sf_dir, "documents")
    return curriculum_order(docs, "doc_id", "n_chars", n_buckets=10)


def _q_sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct-user estimate per day by SLIDING sketch
    merge (`sketches.hll_registers` + `hll_merge`): day-grain registers
    fan out to the ≤7 windows they serve (bounded explode), MAX-merge
    per (window, register), finalize — the windowed re-aggregation
    countDistinct can't do without re-scanning every window's raw rows
    7× (associativity makes it byte-identical to the direct per-window
    sketch, which is what the oracle computes)."""
    from morphik_core_spark.operators.sketches import (
        hll_estimate_from_registers,
        hll_merge,
        hll_registers,
    )

    ev = _t(spark, sf_dir, "events")
    facts = ev.select(F.to_date(F.col("ts")).alias("day"), "user_id")
    regs = hll_registers(facts, ["day"], "user_id", p=9)
    fanned = regs.withColumn(
        "tday", F.explode(F.expr("sequence(day, date_add(day, 6), interval 1 day)"))
    ).select(F.col("tday").alias("wday"), "reg", "max_rho")
    merged = hll_merge(fanned, ["wday"])
    observed = facts.select("day").distinct()
    return (
        hll_estimate_from_registers(merged, ["wday"], p=9)
        .join(observed, F.col("wday") == F.col("day"), "left_semi")
        .select(F.col("wday").alias("day"), "registers_used", "distinct_est")
    )


def _q_interval_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands (`asof.interval_islands`): merge each customer's
    overlapping order-fulfillment windows into maximal busy periods,
    rolled up per customer — islands complete the interval family
    (pairs = who, peak = how many, islands = the merged coverage)."""
    from morphik_core_spark.operators.asof import interval_islands

    orders = _t(spark, sf_dir, "orders")
    iv = orders.select(
        F.col("o_custkey").alias("ck"),
        F.datediff(F.col("o_orderdate"), F.lit(_OVERLAP_EPOCH).cast("date")).alias("s"),
        (
            F.datediff(F.col("o_orderdate"), F.lit(_OVERLAP_EPOCH).cast("date"))
            + 7 * F.substring("o_orderpriority", 1, 1).cast("int")
        ).alias("e"),
    )
    isl = interval_islands(iv, ["ck"], "s", "e")
    return isl.groupBy("ck").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.max("n_intervals").alias("max_merged"),
        F.sum(F.col("island_end") - F.col("island_start") + 1).alias("covered_days"),
    )


def _q_sliding_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day per-type event volume from SLIDING count-min
    sketches (`sketches.cms_sketch(group_cols=…)` + additive cell
    merge): day-grain sketches fan to the ≤7 windows they serve and
    cells ADD — the CMS sibling of `sliding_distinct_users`' register
    MAX-merge. Each row carries the exact trailing count beside the
    estimate, exhibiting the one-sided CMS guarantee (est ≥ exact) on
    a deliberately tight 3×16 sketch."""
    from morphik_core_spark.operators.sketches import sliding_cms_window

    ev = _t(spark, sf_dir, "events")
    day_counts = ev.select(F.to_date(F.col("ts")).alias("day"), "event_type").groupBy(
        "day", "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    # the day x type grid is contract-bounded (day grain x small type
    # vocabulary): one collect replays the fanout/merge/estimate chain in
    # exact integers (sketches.sliding_cms_window; bound raises)
    return sliding_cms_window(
        day_counts, "day", "event_type", "n",
        window_days=7, depth=3, width=16, collect_max_rows=500_000,
    )


def _q_markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov removal-effect attribution (`analytics.
    markov_removal_effects`): journeys → first-order transition matrix
    → conversion-absorption probability from '__start__', re-solved
    with each channel knocked out; credit = relative conversion drop —
    the data-driven complement of `attribution`'s positional rules.
    Truncating-integer micro-unit arithmetic and a fixed 10-round
    integer fixed point keep it bit-identical across engines (the
    oracle unrolls the same 10 rounds as CTEs)."""
    from morphik_core_spark.operators.analytics import markov_removal_effects

    ev = _t(spark, sf_dir, "events")
    return markov_removal_effects(
        ev, "user_id", ["ts", "event_id"], "event_type", "purchase", iterations=10
    )


def _markov_oracle_sql(iterations: int = 10) -> str:
    """The markov_attribution oracle: the same journey split, redirect,
    and integer fixed point, with the K absorption rounds UNROLLED as
    chained CTEs (the quality_classifier oracle pattern)."""
    iters = ",\n".join(
        f"""
            p{k + 1} AS (
                SELECT t.scenario, t.src AS state,
                       SUM(t.tu * (CASE WHEN t.dst = '__conv__' THEN 1000000
                                        ELSE coalesce(p.pu, 0) END)) // 1000000 AS pu
                FROM tmat t LEFT JOIN p{k} p
                ON p.scenario = t.scenario AND p.state = t.dst
                GROUP BY 1, 2
            )"""
        for k in range(iterations)
    )
    return f"""
            WITH ev AS (
                SELECT user_id, ts, event_id,
                       coalesce(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                           OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS jid,
                       CASE WHEN event_type = 'purchase' THEN '__conv__'
                            ELSE event_type END AS state
                FROM events
            ),
            ev2 AS (
                SELECT *, lag(state) OVER (PARTITION BY user_id, jid ORDER BY ts, event_id) AS prev
                FROM ev
            ),
            row_edges AS (SELECT coalesce(prev, '__start__') AS src, state AS dst FROM ev2),
            jstats AS (
                SELECT user_id, jid,
                       max({{'t': ts, 'e': event_id, 's': state}}) AS lastr,
                       max(CASE WHEN state = '__conv__' THEN 1 ELSE 0 END) AS conv
                FROM ev2 GROUP BY 1, 2
            ),
            null_edges AS (
                SELECT lastr.s AS src, '__null__' AS dst FROM jstats WHERE conv = 0
            ),
            edges AS (
                SELECT src, dst, count(*) AS n
                FROM (SELECT * FROM row_edges UNION ALL SELECT * FROM null_edges)
                GROUP BY 1, 2
            ),
            scen AS (
                SELECT '__base__' AS scenario
                UNION ALL
                SELECT DISTINCT dst FROM edges WHERE dst NOT IN ('__conv__', '__null__')
            ),
            red AS (
                SELECT s.scenario, e.src,
                       CASE WHEN s.scenario <> '__base__' AND e.dst = s.scenario
                            THEN '__null__' ELSE e.dst END AS dst,
                       SUM(e.n) AS n
                FROM edges e, scen s GROUP BY 1, 2, 3
            ),
            tot AS (SELECT scenario, src, SUM(n) AS ntot FROM red GROUP BY 1, 2),
            tmat AS (
                SELECT r.scenario, r.src, r.dst, (r.n * 1000000) // t.ntot AS tu
                FROM red r JOIN tot t ON r.scenario = t.scenario AND r.src = t.src
            ),
            p0 AS (
                SELECT CAST(NULL AS VARCHAR) AS scenario, CAST(NULL AS VARCHAR) AS state,
                       CAST(NULL AS BIGINT) AS pu WHERE 1 = 0
            ),{iters},
            strt AS (SELECT scenario, pu FROM p{iterations} WHERE state = '__start__'),
            base AS (SELECT pu AS pb FROM strt WHERE scenario = '__base__')
            SELECT s.scenario AS channel,
                   ROUND(b.pb / 1000000.0, 6) AS p_base,
                   ROUND(s.pu / 1000000.0, 6) AS p_removed,
                   ROUND(CAST(b.pb - s.pu AS DOUBLE) / b.pb, 6) AS removal_effect
            FROM strt s, base b WHERE s.scenario <> '__base__'
        """


def _q_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (`validation.t_closeness_classes`): same QI
    classes as `l_diversity` (nation × segment × balance decile),
    total-variation distance between each class's order-priority
    distribution and the table's — the privacy-ladder rung k-anonymity
    and l-diversity can't see (a large, diverse class still leaks when
    its distribution skews). Integer-exact numerator and threshold;
    one double division at the edge."""
    from pyspark.sql import Window

    from morphik_core_spark.operators.validation import t_closeness_classes

    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    w = Window.orderBy(F.col("c_acctbal").asc(), F.col("c_custkey").asc())
    c10 = cust.withColumn("bal_decile", F.ntile(10).over(w))
    joined = c10.join(orders, c10.c_custkey == orders.o_custkey)
    return t_closeness_classes(
        joined, ["c_nationkey", "c_mktsegment", "bal_decile"], "o_orderpriority",
        t_num=3, t_den=10,
    )


def _q_token_budget_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix assembly (`curation.token_budget_mixture`): a 10%
    character budget apportioned across crawl sources by temperature-0.5
    weights (largest-remainder integer apportionment — allocations sum
    EXACTLY to the budget), each source then taken greedily in
    reproducible hash order until its allocation is spent."""
    from morphik_core_spark.operators.curation import token_budget_mixture

    docs = _t(spark, sf_dir, "documents")
    return token_budget_mixture(docs, "source", "doc_id", "n_chars", budget_frac_den=10)


def _q_knn_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact top-5 per query for a 5-query batch (ANN baseline)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries_df = (
        emb.filter(F.col("vec_id") < _KNN_QUERIES)
        .select(F.col("vec_id").alias("q_id"), F.col("embedding").cast("array<double>").alias("qv"))
    )
    return similarity.knn_brute_force(emb, queries_df, k=5, decimals=_SCORE_DECIMALS)


def _hyperplanes(spark: SparkSession, sf_dir: str) -> list[list[float]]:
    if sf_dir not in _PLANES_CACHE:
        rows = (
            _t(spark, sf_dir, "embeddings")
            .filter((F.col("vec_id") >= 1) & (F.col("vec_id") <= _ANN_PLANES))
            .orderBy("vec_id")
            .select("embedding")
            .collect()
        )
        _PLANES_CACHE[sf_dir] = [[float(x) for x in r.embedding] for r in rows]
    return _PLANES_CACHE[sf_dir]


def _q_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucketed ANN: search only the query's bucket (scale path)."""
    emb = _t(spark, sf_dir, "embeddings")
    qv = _query_vector(spark, sf_dir)
    queries_df = spark.createDataFrame([(0, qv)], "q_id long, qv array<double>")
    return similarity.knn_lsh(
        emb,
        queries_df,
        _hyperplanes(spark, sf_dir),
        k=10,
        decimals=_SCORE_DECIMALS,
        n_probes=_ANN_PROBES,
    )


_CENT_CACHE: dict[str, list[tuple[int, list[float]]]] = {}


def _centroids(spark: SparkSession, sf_dir: str) -> list[tuple[int, list[float]]]:
    """IVF centroids: deterministic pivot rows vec_id 1.._IVF_LISTS (the
    offline-k-means stand-in; cached like _hyperplanes)."""
    if sf_dir not in _CENT_CACHE:
        rows = (
            _t(spark, sf_dir, "embeddings")
            .filter((F.col("vec_id") >= 1) & (F.col("vec_id") <= _IVF_LISTS))
            .orderBy("vec_id")
            .select("vec_id", "embedding")
            .collect()
        )
        _CENT_CACHE[sf_dir] = [(int(r.vec_id), [float(x) for x in r.embedding]) for r in rows]
    return _CENT_CACHE[sf_dir]


def _q_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: nearest-centroid inverted lists, probe the 2 lists nearest
    the query, exact rescore + top-k (pgvector ivfflat analog)."""
    emb = _t(spark, sf_dir, "embeddings")
    qv = _query_vector(spark, sf_dir)
    queries_df = spark.createDataFrame([(0, qv)], "q_id long, qv array<double>")
    return similarity.knn_ivf(
        emb, _centroids(spark, sf_dir), queries_df, k=10, n_probes=_IVF_PROBES, decimals=_SCORE_DECIMALS
    )


def _q_near_dup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs over hash-embedded documents:
    sign-LSH blocking → exact cosine ≥ 0.98 on candidates only.

    Served from the per-bucket Gram-matrix Arrow kernel (two shuffles
    total); the relational join form (dedup.embedding_near_dup) is the
    oracle-expressible twin — tests assert pair-set identity."""
    from morphik_core_spark.functions.embedder import hash_embed_components

    docs = _t(spark, sf_dir, "documents")
    comps = hash_embed_components(docs, "text", "doc_id", dims=_EMBED_DIMS, seed=_EMBED_SEED)
    planes = [hp[:_EMBED_DIMS] for hp in _hyperplanes(spark, sf_dir)[:_NEARDUP_PLANES]]
    return dedup.embedding_near_dup_pandas(
        comps, planes, threshold=_NEARDUP_THRESHOLD, decimals=_SCORE_DECIMALS
    )


def _q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counts / stopword ratio / quality score per document."""
    docs = _t(spark, sf_dir, "documents")
    return text_analysis.text_stats(docs, "text", "doc_id", decimals=_SCORE_DECIMALS)


def _q_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic stopword-profile language ID."""
    docs = _t(spark, sf_dir, "documents")
    return text_analysis.language_id(docs, "text", "doc_id")


# winnowing: 8-char grams, window of 4 — any shared substring of length
# ≥ 11 chars between two docs is guaranteed to share a fingerprint
_WINNOW_K = 8
_WINNOW_W = 4


def _q_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS-style winnowing fingerprints (rolling k-gram hash → sliding
    min). Served from the one-pass Arrow kernel; the relational window
    form is the oracle twin (tests assert set-identity)."""
    docs = _t(spark, sf_dir, "documents")
    # the md5-per-char-position kernel is the one pandas op heavy enough
    # that spreading the narrow (single-row-group) local input wins; at
    # cluster scale the scan is already wide and this becomes a no-op cost
    return text_analysis.winnow_fingerprints_pandas(
        docs, "text", "doc_id", k=_WINNOW_K, w=_WINNOW_W,
        parallelism=spark.sparkContext.defaultParallelism,
    )


def _q_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish-regex token counts, chars/token budget ratio."""
    docs = _t(spark, sf_dir, "documents")
    return text_analysis.bpe_token_stats(docs, "text", "doc_id", decimals=_SCORE_DECIMALS)


# token budget per training sequence for the packing query: small enough
# that every language stratum yields many packs at sf0.01
_PACK_BUDGET = 512


def _q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style heuristic quality rules (Rae et al. 2021 A1.1): per-doc
    signals + per-rule verdicts + composite pass (curation filter stage)."""
    docs = _t(spark, sf_dir, "documents")
    out = curation.quality_filter(docs, "text", "doc_id")
    bool_cols = ["ok_word_count", "ok_word_len", "ok_symbols", "ok_alpha", "ok_stopwords", "passes"]
    # ints, not booleans: the driver hashes values and bool text forms differ
    return out.select(
        "doc_id", "word_count", "mean_word_len", "symbol_ratio", "alpha_word_ratio", "stop_hits",
        *[F.col(c).cast("int").alias(c) for c in bool_cols],
    )


def _q_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based train/val/test split, audited per language
    stratum (reproducible across runs/engines/cluster sizes)."""
    docs = _t(spark, sf_dir, "documents")
    return curation.stratified_split(docs, "doc_id", "lang")


def _q_group_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 longest documents per language (windowed per-group curation
    sample with deterministic id tiebreak)."""
    docs = _t(spark, sf_dir, "documents")
    return curation.group_topn(docs, "lang", "n_chars", "doc_id", n=5)


def _q_length_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact nearest-rank p50/p90/p99 of document length per language —
    integer-exact (every output is an actual data value)."""
    docs = _t(spark, sf_dir, "documents")
    return curation.length_percentiles(docs, "lang", "n_chars")


def _q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-then-chunk sequence packing into a fixed token budget per
    language: pack summary (n_docs, pack_tokens) per pack."""
    docs = _t(spark, sf_dir, "documents")
    return curation.sequence_packing(docs, "lang", "doc_id", "text", budget=_PACK_BUDGET)


def _q_sequence_packing_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB shape of sequence packing: the running-sum window
    partitions by (lang, shard) with shard = portable_hash(doc_id) % 4, so
    no window partition's size equals a whole language's corpus. Pack ids
    are namespaced per shard (shard * 2^40 + local pack) — the oracle
    mirrors the exact shard arithmetic."""
    docs = _t(spark, sf_dir, "documents")
    return curation.sequence_packing(docs, "lang", "doc_id", "text", budget=_PACK_BUDGET, shards=4)


# target mixture: per-source keep percentage (a LLaMA/Pile-style weight
# table); deterministic so the oracle can embed the same VALUES literal
_MIXTURE_RATES = {f"src{i}": 15 + (7 * i) % 86 for i in range(20)}


def _q_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style word-2-gram repetition signals: most-frequent-gram and
    duplicated-gram occurrence fractions (boilerplate/looping-text cull)."""
    docs = _t(spark, sf_dir, "documents")
    return text_analysis.repetition_signals(docs, "text", "doc_id", n=2)


def _q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic domain-mixture sampling: per-source keep rates via a
    broadcast rates dimension + pure map-side hash filter (no fact
    shuffle); membership depends only on (salt, doc_id) so re-weighting
    one source never reshuffles another."""
    docs = _t(spark, sf_dir, "documents")
    return curation.mixture_sample(docs, "doc_id", "source", _MIXTURE_RATES)


def _q_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive duplicate-cluster resolution: banded-LSH candidate pairs
    → connected components (iterative min-label propagation, one shuffle
    per round, rounds = cluster diameter) → canonical keeper + cluster
    size for EVERY document (docs in no pair keep themselves). The
    DuckDB oracle is the same fixpoint as a WITH RECURSIVE reachability
    closure."""
    docs = _t(spark, sf_dir, "documents")
    pairs = _q_lsh_pairs(spark, sf_dir)
    out = dedup.resolve_duplicate_clusters(docs, pairs, "doc_id")
    return out.select(
        "doc_id", "keeper_id", F.col("cluster_size").cast("bigint").alias("cluster_size")
    )


def _q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-3-style train/eval decontamination: per train-split document,
    word-3-gram overlap against the eval split's shingle set (same
    deterministic hash split as stratified_split); the flag compares in
    pure int space so engine and oracle can't diverge on a boundary."""
    docs = _t(spark, sf_dir, "documents")
    out = curation.decontaminate(docs, "text", "doc_id")
    # int, not boolean: the driver hashes values and bool text forms differ
    return out.select(
        "doc_id", "n_shingles", "n_shared", "overlap_ratio",
        F.col("contaminated").cast("int").alias("contaminated"),
    )


def _q_event_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window event aggregation (batch form of the streaming agg).
    Decimal-cast sums keep the values exact → engine-independent."""
    events = _t(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.window("ts", "1 hour").start.alias("window_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,4)")).cast("double"), 4).alias("sum_value"),
        )
    )


_EMBED_DIMS = 16
_EMBED_SEED = 42


def _q_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video at_time nearest-timestamp lookup (SURVEY §2.3 as-of join):
    for each error event, the nearest purchase of the same user; exact
    ties resolve to the earlier row (reference video.py:41-53)."""
    events = _t(spark, sf_dir, "events")
    probes = events.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    series = events.filter(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    out = asof.asof_nearest(probes, series, key="user_id")
    matched = series.select(
        F.col("user_id"), F.col("ts").alias("matched_ts"), F.round("value", 2).alias("matched_value")
    )
    return (
        out.join(matched, ["user_id", "matched_ts"], "left")
        .select("event_id", "user_id", "matched_ts", "matched_value")
    )


def _q_asof_backward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic as-of (most recent at or before) — the watermark/state form."""
    events = _t(spark, sf_dir, "events")
    probes = events.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    series = events.filter(F.col("event_type") == "signup").select("user_id", "ts")
    return asof.asof_backward(probes, series, key="user_id").select("event_id", "user_id", "matched_ts")


def _q_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of (earliest at or after) — merge_asof direction=forward;
    completes the backward/forward/nearest family."""
    events = _t(spark, sf_dir, "events")
    probes = events.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    series = events.filter(F.col("event_type") == "signup").select("user_id", "ts")
    return asof.asof_forward(probes, series, key="user_id").select("event_id", "user_id", "matched_ts")


def _q_upsert_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot upsert: updates replace base rows on the key (§2.1 doc store)."""
    docs = _t(spark, sf_dir, "documents")
    updates = docs.filter(F.col("doc_id") % 10 == 0).select(
        "doc_id",
        F.col("text"),
        F.lit("xx").alias("lang"),
        F.col("source"),
        (F.col("n_chars") + 1000).alias("n_chars"),
    )
    return docstore.upsert(docs.select("doc_id", "text", "lang", "source", "n_chars"), updates, ["doc_id"]).select(
        "doc_id", "lang", "n_chars"
    )


def _q_folder_move(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Folder subtree move = path-prefix rewrite (§2.3 folder tree)."""
    docs = _t(spark, sf_dir, "documents").withColumn(
        "folder_path", F.concat(F.lit("/"), "source", F.lit("/"), "lang")
    )
    moved = docstore.move_folder(docs, "/src1", "/archive/src1")
    return moved.select("doc_id", "folder_path")


def _q_batch_get(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite-key batch fetch via broadcast semi-join (§2.3 batch chunk fetch)."""
    lineitem = _t(spark, sf_dir, "lineitem")
    keys = [(k, n) for k in range(1, 41) for n in (1, 2)]
    return docstore.batch_get(lineitem, keys, ["l_orderkey", "l_linenumber"]).select(
        "l_orderkey", "l_linenumber", F.round("l_extendedprice", 2).alias("price")
    )


def _q_padding_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GroupedChunkResponse flattened: padded chunks with is_padding flags
    (§2.6 grouping operator)."""
    lineitem = _t(spark, sf_dir, "lineitem")
    chunks = lineitem.select(
        F.col("l_orderkey").alias("document_id"),
        F.col("l_linenumber").alias("chunk_number"),
        F.round("l_extendedprice", 2).alias("price"),
    )
    matches = chunks.filter(F.col("price") > 99000).withColumn("score", F.col("price"))
    padded = retrieval.with_padding(matches.select("document_id", "chunk_number", "score"), chunks, padding=1)
    return docstore.grouped_response(padded, matches).select(
        "document_id", "chunk_number", "score", "is_padding"
    )


def _q_hash_embed_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion→retrieval end-to-end from RAW TEXT: seeded hash embedding
    (sparse relational form) → cosine top-k. Integer-exact arithmetic until
    the final score division (FIXTURES.md §6)."""
    from morphik_core_spark.functions.embedder import hash_embed_components

    docs = _t(spark, sf_dir, "documents")
    comps = hash_embed_components(docs, "text", "doc_id", dims=_EMBED_DIMS, seed=_EMBED_SEED)
    qcomps = (
        hash_embed_components(docs.filter(F.col("doc_id") == 0), "text", "doc_id", _EMBED_DIMS, _EMBED_SEED)
        .select("idx", F.col("val").alias("qval"))
    )
    norms = comps.groupBy("doc_id").agg(F.sqrt(F.sum(F.col("val") * F.col("val"))).alias("norm"))
    qnorm = qcomps.agg(F.sqrt(F.sum(F.col("qval") * F.col("qval"))).alias("qnorm"))
    dots = (
        comps.join(F.broadcast(qcomps), "idx")
        .groupBy("doc_id")
        .agg(F.sum(F.col("val") * F.col("qval")).alias("dot"))
    )
    scored = (
        dots.join(norms, "doc_id")
        .crossJoin(F.broadcast(qnorm))
        .select(
            "doc_id",
            F.round((F.lit(1.0) + F.col("dot") / (F.col("norm") * F.col("qnorm"))) / 2.0, _SCORE_DECIMALS).alias(
                "score"
            ),
        )
    )
    return retrieval.top_k(scored, 10, tiebreak=("doc_id",))


def _q_chunk_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive-splitter chunking stats (pandas-UDF kernel). The oracle twin
    encodes the splitter's execution trace on this corpus shape (see the
    comment on oracle_sql()['chunk_stats']); chunk-by-chunk equality between
    that trace and the Python splitter is test-asserted at both SFs."""
    from morphik_core_spark.functions.chunking import chunk_documents

    docs = _t(spark, sf_dir, "documents").withColumnRenamed("doc_id", "external_id")
    chunks = chunk_documents(docs, text_col="text", id_col="external_id", chunk_size=256, chunk_overlap=32)
    # content_chars + content_md5 pin the actual chunk text, not just its
    # shape — the driver's rows-only check still hashes these values, so a
    # splitter regression shows up even without an oracle-side splitter.
    return chunks.groupBy("document_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.max(F.length("content")).alias("max_chunk_len"),
        F.sum(F.length("content")).alias("content_chars"),
        F.md5(F.concat_ws("", F.array_sort(F.collect_list(F.md5("content"))))).alias("content_md5"),
    )


def _q_folder_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Folders summary (§2.4): child folders of a parent with doc counts —
    prefix-filtered folder_counts over synthesized folder paths."""
    docs = _t(spark, sf_dir, "documents").withColumn(
        "folder_path", F.concat(F.lit("/"), "source", F.lit("/"), "lang")
    ).withColumn("folder_name", F.col("lang"))
    from morphik_core_spark.operators.scopes import system_predicate

    scoped = docs.filter(system_predicate({"folder_path_prefix": "/src1"}))
    return listing.folder_counts(scoped)


def _q_typed_filter_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata comparison with declared-type guards (§2.2): metadata
    JSON + metadata_types map built from table columns; the 'lang' field is
    deliberately declared number so its cast NULLs and the $or branch
    NULL-poisons away — exact reference CASE semantics."""
    docs = _t(spark, sf_dir, "documents").withColumn(
        "metadata", F.to_json(F.struct("lang", "n_chars"))
    ).withColumn(
        "metadata_types",
        F.create_map(F.lit("lang"), F.lit("number"), F.lit("n_chars"), F.lit("number")),
    )
    comp = MetadataFilterCompiler()
    pred = comp.compile({"$or": [{"lang": {"$gte": 0}}, {"n_chars": {"$gte": 500}}]})
    return docs.filter(pred).select("doc_id", "lang", "n_chars")


def _q_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (lag → gap → cumsum), per-session stats —
    the batch twin of streaming session windows (§2.9 extension)."""
    from morphik_core_spark.operators.sessions import session_stats

    events = _t(spark, sf_dir, "events")
    out = session_stats(events, gap_seconds=1800)
    # integer truncation to 100µs, then one exact division — no rounding
    # boundary for either engine
    return out.select(
        "user_id",
        "session_id",
        "n_events",
        (F.expr("duration_us div 100") / 10000.0).alias("duration_s"),
    )


# usage-rollup anchor: hourly/monthly buckets are taken relative to this
# instant (inside the testdata's event range at every sf)
_USAGE_AS_OF = "2024-01-30 23:00:00"


def _folders_dim(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """(folders, documents-with-folder_path): a depth-3 folder tree
    synthesized from documents — /source → /source/lang →
    /source/lang/{small,large} — with docs attached at depth 2."""
    docs = _t(spark, sf_dir, "documents").withColumn(
        "size_bucket", F.when(F.col("n_chars") < 300, "small").otherwise("large")
    )
    p1 = F.concat(F.lit("/"), "source")
    p2 = F.concat(F.lit("/"), "source", F.lit("/"), "lang")
    p3 = F.concat(F.lit("/"), "source", F.lit("/"), "lang", F.lit("/"), "size_bucket")
    l1 = docs.select(p1.alias("id"), F.lit(None).cast("string").alias("parent_id")).distinct().withColumn("depth", F.lit(1))
    l2 = docs.select(p2.alias("id"), p1.alias("parent_id")).distinct().withColumn("depth", F.lit(2))
    l3 = docs.select(p3.alias("id"), p2.alias("parent_id")).distinct().withColumn("depth", F.lit(3))
    from morphik_core_spark.plans.cache import scoped_persist

    # dimension-sized tree derived from three corpus distincts; callers
    # consume it 2-3x (children + counts, BFS levels) - persist once
    folders = scoped_persist(
        l1.unionByName(l2).unionByName(l3).withColumn("full_path", F.col("id"))
    )
    return folders, docs.withColumn("folder_path", p2)


def _q_folder_children(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Children-of-folder listing (§2.3, reference list_folders
    postgres_database.py:1661-1708): direct children of /src1 with
    per-child child_count (GROUP BY parent_id prefetch) and doc_count
    (list_folders_summary LEFT JOIN), both aggregated before a broadcast
    join to the folders dimension."""
    from morphik_core_spark.operators import folders as folder_ops

    folders, docs = _folders_dim(spark, sf_dir)
    kids = folder_ops.folder_children(folders, "/src1")
    kids = folder_ops.folder_doc_counts(kids, docs)
    return kids.select("id", "depth", "child_count", "doc_count")


def _q_folder_descendants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive descendants by parent_id (§2.3, reference move_folder
    descendant walk postgres_database.py:1896-1944): driver-side BFS, one
    broadcast equi-join per tree level — Spark's shape for a recursive
    CTE over a dimension-sized table."""
    from morphik_core_spark.operators import folders as folder_ops

    folders, _ = _folders_dim(spark, sf_dir)
    # the synthetic tree is sources x langs x 2 (dimension-sized by
    # construction): the bounded-collect BFS pays 1 job instead of 2 per
    # tree level (eager checkpoint + emptiness probe)
    return folder_ops.folder_descendants(
        folders, ["/src1"], collect_max_folders=100_000
    ).select("root", "id", "rel_depth")


def _q_usage_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Usage/tier accounting (§2.4, reference limits_utils.py): event log →
    per-account counters in one conditional-aggregation pass → broadcast
    tier-limits join → over-limit flags. click≅query, view≅ingest
    (value×100 chars → pages), signup≅storage_file (value×1e6 bytes);
    tier assigned deterministically from user_id."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        F.when(F.col("event_type") == "click", "query")
        .when(F.col("event_type") == "view", "ingest")
        .when(F.col("event_type") == "signup", "storage_file")
        .otherwise(F.col("event_type"))
        .alias("event_type"),
        F.floor(F.col("value") * 100).cast("bigint").alias("chars"),
        F.floor(F.col("value") * 1000000).cast("bigint").alias("bytes"),
    )
    counters = limits.usage_counters(ev, as_of=_USAGE_AS_OF)
    tiered = counters.withColumn(
        "tier",
        F.when(F.col("user_id") % 4 == 0, "free")
        .when(F.col("user_id") % 4 == 1, "pro")
        .when(F.col("user_id") % 4 == 2, "teams")
        .otherwise("self_hosted"),
    )
    out = limits.check_limits(tiered, limits.tier_limits_df(spark))
    return out.select(
        "user_id",
        "tier",
        "hourly_query_count",
        "monthly_query_count",
        "ingest_pages",
        "storage_file_count",
        "storage_size_bytes",
        "over_query",
        "over_ingest",
        "over_storage_files",
        "over_storage_size",
    )


def _q_rollup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregation (subtotals + grand total) — Spark built-in the
    reference lacks (SURVEY §2.4 note)."""
    orders = _t(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(F.count(F.lit(1)).alias("n"))


def _q_pivot_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (l_linestatus → columns) via conditional aggregation parity."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.count(F.lit(1)))
        .withColumnRenamed("O", "n_open")
        .withColumnRenamed("F", "n_filled")
    )


def _q_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple DISTINCT aggregates per group (Catalyst expand-based plan;
    §2.4 depth beyond the reference's simple counts)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


def _q_requeue_failed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Requeue-failed selection (§2.1): rows NOT in a terminal status —
    o_orderstatus 'F' stands in for completed."""
    orders = _t(spark, sf_dir, "orders")
    from morphik_core_spark.operators.scopes import status_predicate

    pred = ~status_predicate(["F"], status_col="o_orderstatus")
    return orders.filter(pred).select("o_orderkey", "o_orderstatus", "o_orderpriority")


def _q_storage_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-app storage rollup (§2.4): SUM of per-doc byte counts grouped by
    tenant — documents.source stands in for app_id, n_chars for bytes."""
    docs = _t(spark, sf_dir, "documents")
    return docs.groupBy(F.col("source").alias("app_id")).agg(
        F.sum("n_chars").alias("total_bytes"),
        F.count(F.lit(1)).alias("doc_count"),
    )


def _fts_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build-once lexeme projection for filename FTS — the at-rest analog
    of a stored tsvector column. The ~30-regex stemming chain runs ONCE
    per corpus (at 'ingest'); every query after that ranks from the
    stored array. Keyed by sf_dir + documents.parquet mtime so a testdata
    refresh rebuilds. Stored under the system temp dir (testdata is
    read-only)."""
    import hashlib as _hl
    import tempfile

    src = os.path.join(sf_dir, "documents.parquet")
    key = _hl.md5(f"{sf_dir}:{os.path.getmtime(src)}".encode()).hexdigest()[:12]
    path = os.path.join(tempfile.gettempdir(), f"morphik_fts_proj_{key}")
    cached = _FTS_PROJ_CACHE.get(path)
    if cached is not None:
        return cached
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        from morphik_core_spark.functions.text import with_filename_lexemes

        docs = _t(spark, sf_dir, "documents").withColumn(
            "filename",
            F.concat(
                F.col("source"), F.lit("_report-"), F.col("lang"), F.lit("_"),
                F.when(F.col("n_chars") % 7 == 0, F.lit("report-")).otherwise(F.lit("")),
                F.col("doc_id"), F.lit(".txt"),
            ),
        )
        with_filename_lexemes(docs).select(
            "doc_id", "filename", "filename_lexemes"
        ).write.mode("overwrite").parquet(path)
    df = spark.read.parquet(path)
    # cache the DataFrame (plan, not data): re-listing the projection's
    # files + footer on every call costs ~0.2s of pure driver overhead
    _FTS_PROJ_CACHE[path] = df
    return df


def _q_filename_fts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filename FTS (§2.5): Postgres ts_rank restated (tsrank.c calc_rank_or,
    uniform D weights — 0.1*H2(tf)/zeta(2) per query lexeme, averaged), over
    the reference's normalization chain (postgres_database.py:2700-2790).
    Filenames synthesized deterministically from source+lang+id; every
    seventh doc doubles the 'report' token to exercise the tf decay curve.

    Ranks from the persisted ``filename_lexemes`` projection
    (functions/text.with_filename_lexemes) — stem once at ingest, rank
    from the stored array — so the steady-state query is a columnar scan
    + array ops with zero regex work, the way Postgres ranks from a
    stored tsvector. The DuckDB oracle recomputes everything from scratch,
    so parity also proves projection == recompute."""
    from morphik_core_spark.functions.text import plainto_lexemes, ts_rank

    q_lex = plainto_lexemes("report en")
    proj = _fts_projection(spark, sf_dir)
    rank = F.round(ts_rank(F.col("filename_lexemes"), q_lex), _SCORE_DECIMALS)
    out = proj.withColumn("rank", rank).filter(F.col("rank") > 0)
    return (
        out.orderBy(F.col("rank").desc(), F.col("doc_id").asc())
        .limit(20)
        .select("doc_id", "filename", "rank")
    )


def _q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: the map-side-combine-heavy
    aggregate that anchors BENCH. Decimal casts keep sums exact."""
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(dec("l_quantity")).cast("double"), 4).alias("sum_qty"),
            F.round(F.sum(dec("l_extendedprice")).cast("double"), 4).alias("sum_base_price"),
            F.round(F.sum(dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - dec("l_discount"))).cast("double"), 4).alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def _q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-20 over documents.text for a 3-term query — the
    body-text FTS ranking (reference postgres_database.py:2700-2790 uses
    Postgres FTS; BM25 is the scale restatement). One codegen scan builds
    (dl, tf_t); corpus stats are a tiny broadcast aggregate."""
    docs = _t(spark, sf_dir, "documents")
    from morphik_core_spark.operators.text_analysis import bm25_topk

    return bm25_topk(docs, "text", "doc_id", ["join", "window", "hash"], k=20)


def _q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub (RefinedWeb/CCNet-style): counts + fixed-order redaction,
    pure codegen. PII is synthesized deterministically from table columns
    (emails, a 555 phone, an RFC1918 IP) since the corpus itself is clean;
    the redacted string participates in the value hash, so replacement
    semantics are pinned exactly."""
    docs = _t(spark, sf_dir, "documents")
    contact = F.concat(
        F.col("text"),
        F.lit(" contact "), F.col("source"), F.lit(".team@example.com"),
        F.when(
            F.col("n_chars") % 3 == 0,
            F.concat(F.lit(" cc admin"), (F.col("n_chars") % 10).cast("string"), F.lit("@corp.io")),
        ).otherwise(F.lit("")),
        F.lit(" call 555-"), F.lpad((F.col("n_chars") * 7 % 10000).cast("string"), 4, "0"),
        F.lit(" from 10.0."), (F.col("n_chars") % 256).cast("string"),
        F.lit("."), (F.col("n_chars") * 3 % 256).cast("string"),
    )
    from morphik_core_spark.operators.curation import pii_scrub

    return pii_scrub(docs.withColumn("text", contact), "text", "doc_id")


_PQ_M = 8  # subspaces over the 64-dim embeddings (8 dims each)


def _q_knn_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ ANN (FAISS IndexPQ analog): per-subspace codebooks from the same
    deterministic pivots as IVF, ADC candidate scoring, exact rescore."""
    emb = _t(spark, sf_dir, "embeddings")
    qv = _query_vector(spark, sf_dir)
    return similarity.knn_pq(
        emb, _centroids(spark, sf_dir), qv, m=_PQ_M, k=10, n_candidates=50,
        decimals=_SCORE_DECIMALS,
    )


def _q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Efraimidis-Spirakis weighted sampling: 50 docs drawn proportional to
    n_chars, reproducibly (exact power-of-two-rational uniform)."""
    docs = _t(spark, sf_dir, "documents")
    from morphik_core_spark.operators.curation import weighted_sample

    return weighted_sample(docs, "doc_id", "n_chars", k=50)


def _q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped 3-way join (customer ⋈ orders ⋈ lineitem): selective
    dim filter broadcast into the fact join, decimal-exact revenue agg,
    top-10. The multi-join plan Catalyst should broadcast-then-shuffle."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1995-03-15"))
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1995-03-15"))
    dec = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    )
    return (
        joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - dec("l_discount"))).cast("double"),
                4,
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


def _q_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable rollup: 6-hour time_bucket_gapfill over events with
    last-observation-carried-forward across the gap buckets."""
    events = _t(spark, sf_dir, "events")
    from morphik_core_spark.operators.sessions import time_bucket_gapfill

    return time_bucket_gapfill(events, bucket_secs=21600)


def _q_url_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style URL filtering: scheme allowlist + subdomain-aware domain
    blocklist. URLs synthesized deterministically (every 5th doc gets a
    non-web scheme; hosts rotate through blocked/clean domains)."""
    docs = _t(spark, sf_dir, "documents")
    scheme = F.when(F.col("n_chars") % 5 == 0, F.lit("ftp")).otherwise(F.lit("https"))
    tail = (
        F.when(F.col("n_chars") % 3 == 0, F.lit(".ads.example.com"))
        .when(F.col("n_chars") % 3 == 1, F.lit(".example.org"))
        .otherwise(F.lit(".tracker.net"))
    )
    url = F.concat(scheme, F.lit("://"), F.col("source"), tail, F.lit("/doc/"), F.col("doc_id"))
    from morphik_core_spark.operators.curation import url_filter

    return url_filter(
        docs.withColumn("url", url), "url", "doc_id", ["ads.example.com", "tracker.net"]
    )


def _q_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style paragraph dedup (first occurrence wins globally). The
    single-line corpus is re-lined deterministically (4-token windows →
    paragraphs) so cross-document boilerplate actually exists; the
    reconstructed text participates in the value hash."""
    docs = _t(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & (F.length("text") > 0)
    )
    tk = docs.select("doc_id", F.split("text", " ").alias("tk"))
    synth = tk.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.expr(
                "transform(sequence(0, int(ceil(size(tk)/4.0)) - 1), "
                "i -> concat_ws(' ', slice(tk, i*4+1, 4)))"
            ),
        ).alias("t"),
    )
    from morphik_core_spark.operators.dedup import paragraph_dedup

    return paragraph_dedup(synth, "t", "doc_id")


def _q_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style bigram-LM perplexity per doc (add-one smoothing,
    corpus-trained, <s> start token). Low ppl = fluent-under-corpus."""
    docs = _t(spark, sf_dir, "documents")
    from morphik_core_spark.operators.curation import perplexity_scores

    return perplexity_scores(docs, "text", "doc_id")


def _q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog approximate distinct parts per returnflag (p=9, ~4.6%
    std error) — the sketch that replaces countDistinct at 100 TB."""
    li = _t(spark, sf_dir, "lineitem")
    from morphik_core_spark.operators.sketches import hll_distinct

    return hll_distinct(li, ["l_returnflag"], "l_partkey", p=9)


def _q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min heavy hitters: top-20 tokens with their exact counts and
    the (always >=) sketch estimates from a deliberately tight 3x16
    sketch, so collisions are visible and the min-over-depths matters."""
    docs = _t(spark, sf_dir, "documents")
    from morphik_core_spark.operators.dedup import normalize_text
    from morphik_core_spark.operators.sketches import cms_estimates, cms_sketch

    from morphik_core_spark.plans.cache import scoped_persist

    toks = docs.select(F.explode(F.split(normalize_text(F.col("text")), " ")).alias("tok"))
    # vocab-bounded counts feed the sketch build AND the top-20 pick -
    # persist so the corpus tokenize runs once
    counts = scoped_persist(toks.groupBy("tok").agg(F.count(F.lit(1)).alias("exact_cnt")))
    sketch = cms_sketch(counts, "tok", "exact_cnt", depth=3, width=16)
    cands = counts.orderBy(F.col("exact_cnt").desc(), F.col("tok").asc()).limit(20)
    return cms_estimates(cands, sketch, "tok", depth=3, width=16).select(
        "tok", "exact_cnt", "cms_est"
    )


def _q_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 collocations by PMI with pair count >= 5 (Church & Hanks)."""
    docs = _t(spark, sf_dir, "documents")
    from morphik_core_spark.operators.text_analysis import pmi_bigrams

    return pmi_bigrams(docs, "text", min_count=5, k=20)


def _q_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc duplicated-span coverage over word 4-grams (Lee et al.
    ExactSubstr signal at word granularity)."""
    docs = _t(spark, sf_dir, "documents")
    from morphik_core_spark.operators.dedup import span_dedup

    return span_dedup(docs, "text", "doc_id", n=4)


def _q_moving_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sliding-window features over the last 6 events (frame-spec
    window; DECIMAL-exact rolling sum). The exact DECIMAL sum is cast to
    DOUBLE+ROUND at the output edge only (the `shipping_priority` pattern)
    so the harness value-hash sees a float, not a decimal rendering."""
    events = _t(spark, sf_dir, "events")
    from morphik_core_spark.operators.sessions import moving_aggregates

    out = moving_aggregates(events, "user_id", "ts", "event_id", "value", lookback_rows=5)
    return out.withColumn("mov_sum", F.round(F.col("mov_sum").cast("double"), 6))


def _q_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered semi-join audit: urgent-order keys -> 8192-bit
    bloom -> lineitem key prefilter -> exact semi-join; one row counting
    keys at each stage plus the realized false-positive rate."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    from morphik_core_spark.operators.sketches import bloom_bits, bloom_pass_keys

    auth = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
    bits = bloom_bits(auth, "o_orderkey", num_bits=8192, num_hashes=3)
    keys = li.select(F.col("l_orderkey")).distinct()
    passed = bloom_pass_keys(keys, "l_orderkey", bits, num_bits=8192, num_hashes=3)
    exact = keys.join(auth, keys["l_orderkey"] == auth["o_orderkey"], "left_semi")
    stats = (
        keys.agg(F.count(F.lit(1)).alias("n_keys"))
        .crossJoin(passed.agg(F.count(F.lit(1)).alias("n_bloom_pass")))
        .crossJoin(exact.agg(F.count(F.lit(1)).alias("n_exact_pass")))
    )
    return stats.select(
        "n_keys",
        "n_bloom_pass",
        "n_exact_pass",
        (F.col("n_bloom_pass") - F.col("n_exact_pass")).alias("n_false_pos"),
        F.expr(
            "ROUND(CAST(n_bloom_pass - n_exact_pass AS DOUBLE) / "
            "CAST(n_keys - n_exact_pass AS DOUBLE), 6)"
        ).alias("fp_rate"),
    )


def _q_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order funnel view -> click -> purchase: users reaching each
    step after their earliest completion of the previous one."""
    events = _t(spark, sf_dir, "events")
    from morphik_core_spark.operators.analytics import funnel_counts

    return funnel_counts(events, "user_id", "ts", "event_type", ["view", "click", "purchase"])


def _q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention triangle: distinct users per (first-activity epoch week,
    week offset) — integer epoch bucketing, no tz/DST dependence."""
    events = _t(spark, sf_dir, "events")
    from morphik_core_spark.operators.analytics import cohort_retention

    return cohort_retention(events, "user_id", "ts")


def _q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width (25.0) value histogram per event type."""
    events = _t(spark, sf_dir, "events")
    from morphik_core_spark.operators.analytics import value_histogram

    return value_histogram(events, "event_type", "value", 25.0)


def _q_anomaly_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type mean/std from DECIMAL-exact sums + |z|>3 outlier counts."""
    events = _t(spark, sf_dir, "events")
    from morphik_core_spark.operators.analytics import anomaly_stats

    return anomaly_stats(events, "event_type", "value", 3.0)


def _q_nation_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point PageRank over the customer-nation -> supplier-nation
    trade graph (lineitem x orders x customer x supplier edges); exact
    int64 micro-unit arithmetic makes 3 iterations bit-reproducible."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    from morphik_core_spark.operators.graph import pagerank_fixed_point

    edges = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .groupBy(F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst"))
        .agg(F.count(F.lit(1)).alias("w"))
    )
    # nation keys bound the trade graph at 25 x 25 directed edges: the
    # bounded-collect loop replaces iterations x (join + shuffle) AQE
    # stage-jobs with one collect; the micro-unit recursion is identical
    return pagerank_fixed_point(
        edges, "src", "dst", "w", iterations=3, collect_max_edges=10_000
    )


def _q_quantile_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 per event type from the width-5 histogram sketch
    (mergeable scale path beside length_percentiles' exact ranks)."""
    events = _t(spark, sf_dir, "events")
    from morphik_core_spark.operators.analytics import quantile_estimate

    return quantile_estimate(events, "event_type", "value")


def _q_sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute windows sliding by 5: native F.window sliding semantics,
    integer-bucket oracle pins the epoch alignment."""
    events = _t(spark, sf_dir, "events")
    from morphik_core_spark.operators.analytics import sliding_window_counts

    return sliding_window_counts(events, "event_type", "ts", 600, 300)


def _q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands SCD2 reconstruction: per-user intervals of
    unchanged event_type from the append-only event log."""
    events = _t(spark, sf_dir, "events")
    from morphik_core_spark.operators.sessions import change_intervals

    return change_intervals(events, "user_id", "ts", "event_id", "event_type")


def _q_cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority) — completes the grouping-analytics
    family next to rollup_counts/pivot_counts (SURVEY §2.4 notes the
    reference lacks these; Spark has them built-in)."""
    orders = _t(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )


def _q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: cluster-blocked semantic near-dup removal over the dense
    embeddings (IVF clusters as the blocking structure)."""
    emb = _t(spark, sf_dir, "embeddings")
    from morphik_core_spark.operators.dedup import semantic_dedup

    return semantic_dedup(
        emb, _centroids(spark, sf_dir), tau=0.35, max_cluster_size=5000
    )


def _q_knn_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-quantized ANN (SQ8): per-dim affine uint8 codes + asymmetric
    reconstruction scoring — completes binary→SQ8→PQ quantization ladder."""
    emb = _t(spark, sf_dir, "embeddings")
    qv = _query_vector(spark, sf_dir)
    queries_df = spark.createDataFrame([(0, qv)], "q_id long, qv array<double>")
    return similarity.knn_sq8(emb, queries_df, k=10, dims=_EMB_DIMS)


def _q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from orders whose quantity sits below 20%
    of the part's average — the correlated-aggregate-decorrelated-to-a-
    join pattern. Per-part averages come from DECIMAL-exact sums (a
    double SUM would be aggregation-order-dependent); the 0.2x threshold
    and the compare are one fixed double tree."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    brand = part.filter(F.col("p_brand") == "Brand#4").select("p_partkey")
    avgs = (
        li.groupBy("l_partkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .withColumn("avg_qty", F.expr("CAST(s AS DOUBLE) / CAST(n AS DOUBLE)"))
        .select("l_partkey", "avg_qty")
    )
    small = (
        li.join(F.broadcast(brand), li["l_partkey"] == brand["p_partkey"])
        .join(avgs, "l_partkey")
        .filter(F.expr("l_quantity < 0.2D * avg_qty"))
    )
    return small.agg(
        F.count(F.lit(1)).alias("n_small"),
        F.expr(
            "ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE), 6)"
        ).alias("small_revenue"),
    )


def _q_large_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers whose order total crosses a threshold —
    HAVING on a DECIMAL-exact sum, hydrated against the customer dim,
    top-20 by total."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        orders.groupBy("o_custkey")
        .agg(
            F.expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))").alias("total"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .filter(F.col("total") > 1_500_000)
    )
    return (
        big.join(F.broadcast(cust), big["o_custkey"] == cust["c_custkey"])
        .select(
            F.col("c_custkey"),
            F.col("c_name"),
            F.round(F.col("total").cast("double"), 2).alias("total"),
            "n_orders",
        )
        .orderBy(F.col("total").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


def _q_late_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: order counts per priority where EXISTS a line item
    shipped 30+ days after the order date — a semi-join whose condition
    mixes the equi key with a range predicate."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    cond = (orders["o_orderkey"] == li["l_orderkey"]) & (
        li["l_shipdate"] > F.date_add(orders["o_orderdate"], 30)
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _q_range_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame (vs moving_aggregates' ROWS frame): per
    event, count and DECIMAL-exact value sum over the user's trailing
    hour — rangeBetween on integer epoch-µs so both engines bound the
    frame with the same integer compares."""
    events = _t(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return events.select(
        "user_id",
        "event_id",
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double"), 6
        ).alias("sum_last_hour"),
    )


def _q_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc top-3 TF-IDF terms: tf from one token explode, df/idf from
    a vocab-sized aggregate, idf = ln((N+1)/(df+1)) as one fixed double
    tree over exact ints, per-doc rank window with term tiebreak (the
    keyword-extraction stage of a search/labeling pipeline)."""
    docs = _t(spark, sf_dir, "documents")
    from morphik_core_spark.operators.dedup import normalize_text

    toks = docs.filter(F.col("text").isNotNull()).select(
        "doc_id", F.explode(F.split(normalize_text(F.col("text")), " ")).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = toks.distinct().groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.filter(F.col("text").isNotNull()).agg(F.count(F.lit(1)).alias("n"))
    idf = F.log((F.col("n") + F.lit(1.0)) / (F.col("df") + F.lit(1.0)))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n_docs))
        .select("doc_id", "term", "tf", F.round(F.col("tf") * idf, _SCORE_DECIMALS).alias("score"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "rank", "term", "tf", "score")
    )


def _q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): for finished
    orders, late lines (shipped 60+ days after order date) from suppliers
    who were the ONLY late supplier in a multi-supplier order — a semi-join
    AND an anti-join against the same fact, each mixing the equi key with
    a supplier inequality. 'Late' is restated on l_shipdate vs o_orderdate
    (this testdata carries no commit/receipt dates)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    supp = _t(spark, sf_dir, "supplier")
    fo = orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderdate")
    late = (
        li.join(fo, li["l_orderkey"] == fo["o_orderkey"])
        .filter(F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60))
        .select("l_orderkey", "l_suppkey")
    )
    # EXISTS(other supplier) ≡ n_supp >= 2; NOT EXISTS(other LATE supplier)
    # ≡ n_late_supp == 1 (the row's own supplier is late by construction).
    # The aggregation form replaces two fact-vs-fact joins whose
    # equi-key + supplier-inequality conditions force row-by-row
    # comparisons inside each order group with two partial-aggregated
    # countDistincts — at 100 TB the shuffle carries one row per
    # (order, supplier) instead of the whole fact, twice.
    ostats = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp")
    )
    lstats = late.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_late_supp")
    )
    sole_late = (
        late.join(ostats, "l_orderkey")
        .join(lstats, "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
    )
    return (
        sole_late.join(F.broadcast(supp), sole_late["l_suppkey"] == supp["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(20)
    )


def _q_nfc_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization audit (the text-cleaning stage that makes
    dedup see composed and combining forms as the same bytes). Every 3rd
    doc gets a deliberately decomposed suffix (e+U+0301, i+U+0308) — the
    ASCII corpus itself is NFC-invariant — so changed flags, char counts,
    and the normalized-text digest all discriminate."""
    from morphik_core_spark.operators.curation import unicode_normalization_stats

    docs = _t(spark, sf_dir, "documents")
    suffix = " cafe\u0301 nai\u0308ve"  # combining acute / diaeresis (decomposed)
    staged = docs.filter(F.col("text").isNotNull()).select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, F.concat(F.col("text"), F.lit(suffix)))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return unicode_normalization_stats(staged, "text", "doc_id")


def _q_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix vs the labeled lang column — the
    accuracy diagnostic run after any classifier-ish curation stage
    (rows: true lang x predicted lang with counts)."""
    docs = _t(spark, sf_dir, "documents")
    pred = text_analysis.language_id(docs, "text", "doc_id")
    return (
        docs.select("doc_id", "lang")
        .join(pred, "doc_id")
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _q_dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup rate per source domain — the corpus-health diagnostic
    that decides which crawl sources need harder dedup: docs touched by
    any banded-LSH candidate pair, as a fraction of the source's docs."""
    docs = _t(spark, sf_dir, "documents")
    pairs = _q_lsh_pairs(spark, sf_dir)
    # one explode, not a self-union: referencing `pairs` twice would
    # re-evaluate the whole signature+banding pipeline a second time
    # (Spark reuses nothing across DAG branches without a persist)
    dup_ids = (
        pairs.select(F.explode(F.array("id_a", "id_b")).alias("doc_id"))
        .distinct()
    )
    flagged = docs.select("doc_id", "source").join(
        dup_ids.withColumn("is_dup", F.lit(1)), "doc_id", "left"
    )
    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.coalesce(F.col("is_dup"), F.lit(0))).alias("n_dup"),
        F.round(
            F.sum(F.coalesce(F.col("is_dup"), F.lit(0))).cast("double")
            / F.count(F.lit(1)).cast("double"),
            _SCORE_DECIMALS,
        ).alias("dup_rate"),
    )


def _q_semantic_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space outlier audit per IVF cluster: vectors whose cosine
    to their OWN nearest centroid falls below a floor are cleaning
    candidates (mislabeled/garbage embeddings). Per-cluster counts and an
    exact average from micro-int sums (engine- and order-independent)."""
    from morphik_core_spark.operators.similarity import _argmax_centroid_sql

    emb = _t(spark, sf_dir, "embeddings")
    cents = _centroids(spark, sf_dir)
    arr = _argmax_centroid_sql(
        "cast(`embedding` as array<double>)",
        "sqrt(aggregate(zip_with(cast(`embedding` as array<double>), cast(`embedding` as array<double>), (x, y) -> x * y), 0.0D, (acc, x) -> acc + x))",
        cents,
        _SCORE_DECIMALS,
    )
    assigned = emb.select(
        "vec_id",
        F.expr(f"-array_max({arr}).n").alias("cluster_id"),
        F.expr(f"array_max({arr}).c").alias("cos"),
    ).withColumn("cos_micro", F.expr("CAST(round(cos * 1000000.0, 0) AS BIGINT)"))
    return assigned.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("cos") < 0.2, 1).otherwise(0)).alias("n_outliers"),
        F.round(
            F.sum("cos_micro").cast("double") / (F.count(F.lit(1)).cast("double") * F.lit(1000000.0)),
            _SCORE_DECIMALS,
        ).alias("avg_cos"),
        F.min("cos").alias("min_cos"),
    )


def _q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023): hashed unigram+bigram
    bag-of-words models for target (source='src1') vs raw, per-doc log
    importance weight in exact int64 micro-units — engine- and
    partitioning-independent (the data-selection stage of a training-data
    pipeline)."""
    from morphik_core_spark.operators.curation import dsir_importance_weights

    docs = _t(spark, sf_dir, "documents")
    return dsir_importance_weights(
        docs, "text", "doc_id", target_pred=F.col("source") == "src1", buckets=512
    )


def _q_ppl_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail perplexity bucketing per language (Wenzek et
    al. 2020): nearest-rank terciles over the ROUND(6) bigram-LM ppl both
    engines carry; per-(lang, bucket) counts and ppl ranges."""
    from morphik_core_spark.operators.curation import perplexity_buckets

    docs = _t(spark, sf_dir, "documents")
    return perplexity_buckets(docs, "text", "doc_id", "lang")


def _q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for embedding training: per query, top-5
    vectors scoring inside the confusable band [0.5, 0.95) — similar but
    not near-dup (the contrastive-training negative selector)."""
    from morphik_core_spark.operators.similarity import hard_negatives

    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < _KNN_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").cast("array<double>").alias("qv")
    )
    return hard_negatives(emb, queries_df, k=5, lo=0.5, hi=0.95, decimals=_SCORE_DECIMALS)


def _q_matryoshka_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka two-stage retrieval (MRL): coarse top-50 on the first
    8 dims -> exact 64-dim rescore -> top-10; the dimension-truncation
    rung of the quantization ladder (binary -> SQ8 -> PQ -> prefix)."""
    from morphik_core_spark.operators.similarity import knn_matryoshka

    emb = _t(spark, sf_dir, "embeddings")
    qv = _query_vector(spark, sf_dir)
    return knn_matryoshka(
        emb, qv, k=10, coarse_dims=8, candidates=50, decimals=_SCORE_DECIMALS
    )


def _q_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact integer-space embedding covariance (the PCA/OPQ pretransform
    statistics): per dim-pair int64 Gram sums from one mapInPandas matmul
    kernel + the sample covariance as one fixed double tree. Only the
    upper-triangle pairs of the first 16 dims are emitted (the full 64
    would be 2080 rows — same math, noisier to eyeball)."""
    from morphik_core_spark.operators.embedding_stats import covariance_sums

    emb = _t(spark, sf_dir, "embeddings")
    narrow = emb.select(F.slice(F.col("embedding").cast("array<double>"), 1, 16).alias("embedding"))
    return covariance_sums(narrow, dims=16, scale_bits=10)


_QC_POS_SOURCES = ("src1", "src3", "src5")
_QC_ITERATIONS = 3


def _q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-based quality filtering (GPT-3 Appendix A / LLaMA's
    quality classifier; pairs with the rule-based `quality_filter`):
    TRAIN a logistic-style classifier in-engine — positives = docs from
    a reference source set, one shuffle-free integer-gradient aggregate
    per iteration — then SCORE the corpus as a pure map. All boundary
    arithmetic is int64 micro-units + FLOOR of IEEE divisions and the
    link is the rational fast-sigmoid, so training is bit-reproducible
    under any partitioning and the DuckDB oracle can replay the exact
    run as unrolled CTEs (the pagerank-oracle pattern applied to
    gradient descent)."""
    from morphik_core_spark.operators.classifier import (
        logreg_score, logreg_train, quality_features,
    )

    docs = _scoped(_t(spark, sf_dir, "documents"))
    feats = quality_features(F.col("text"))
    label = F.col("source").isin(*_QC_POS_SOURCES).cast("double")
    weights = logreg_train(docs, feats, label, iterations=_QC_ITERATIONS)
    scored = logreg_score(docs, feats, weights)
    out = scored.select(
        "doc_id",
        F.col("source").isin(*_QC_POS_SOURCES).cast("int").alias("is_positive"),
        "quality_score",
    )
    docs.unpersist()
    return out


def _q_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax/mT5 temperature balancing (T=4) over the LANGUAGE axis —
    the skewed grouping (en dominates ~2.9:1) where balancing actually
    bites: low-resource langs get boost > 1, en gets boost < 1. sqrt-
    chain exponent + micro-int normalizer sum keep both engines
    bit-identical (see curation.temperature_mixture_rates)."""
    docs = _t(spark, sf_dir, "documents")
    return curation.temperature_mixture_rates(docs, "lang", temperature=4)


_SEMDECON_STRIDE = 97
_SEMDECON_THRESHOLD = 0.27


def _q_semantic_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-level train/eval decontamination (the semantic
    complement of the n-gram `decontaminate`): per corpus vector, max
    cosine against the benchmark subset, nearest benchmark id, and the
    contamination flag. Benchmark = every 97th vec_id (eval sets are
    small by nature, so the benchmark side broadcasts — no corpus×corpus
    pairs anywhere)."""
    emb = _t(spark, sf_dir, "embeddings")
    bench = emb.filter(F.col("vec_id") % _SEMDECON_STRIDE == 0)
    corpus = emb.filter(F.col("vec_id") % _SEMDECON_STRIDE != 0)
    return similarity.semantic_decontaminate(
        corpus, bench, threshold=_SEMDECON_THRESHOLD, decimals=_SCORE_DECIMALS
    )


def _q_in_transit_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Big×big point-in-interval join via bucket decomposition — the
    range-join restatement Spark lacks natively (Trino/Databricks range
    hints do the same): each lineitem carries a bounded ship→receipt
    interval (receipt synthesized as ship + 1 + l_suppkey%28 days), each
    distinct order date is a probe point, and the join runs as a plain
    hash equi-join on 32-day buckets with the exact BETWEEN as residual.
    Per order date: in-transit line count + DECIMAL-exact quantity sum.
    The day axis is integer (days since 1992-01-01) so bucket arithmetic
    and residual compares are exact on both engines."""
    from morphik_core_spark.operators.asof import interval_point_join

    # testdata parquet is one row group per file, so without this the
    # scan→explode→join chain runs on ONE task; a narrow 600k-row shuffle
    # buys full-width explode+join parallelism (measured 2.5→1.5 s at
    # sf0.1). On a real multi-split table the scan is already wide and
    # this repartition would be dropped.
    li = _t(spark, sf_dir, "lineitem").repartition(spark.sparkContext.defaultParallelism)
    orders = _t(spark, sf_dir, "orders")
    epoch = F.lit("1992-01-01").cast("date")
    lo = F.datediff(F.col("l_shipdate"), epoch)
    ivals = li.select(
        lo.alias("lo_day"),
        (lo + 1 + (F.col("l_suppkey") % 28).cast("int")).alias("hi_day"),
        F.col("l_quantity").cast("decimal(18,4)").alias("qty"),
    )
    pts = orders.select(F.datediff(F.col("o_orderdate"), epoch).alias("day")).distinct()
    joined = interval_point_join(pts, ivals, "day", "lo_day", "hi_day", bucket_width=32)
    return (
        joined.groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_open"),
            F.round(F.sum(F.col("qty")).cast("double"), 4).alias("qty_sum"),
        )
        .select(
            F.date_add(epoch, F.col("day").cast("int")).alias("d"),
            "n_open",
            "qty_sum",
        )
    )


def _q_kmv_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV set-overlap sketches between crawl sources: per source, the
    k=128 smallest distinct shingle hashes; per source pair, estimated
    distinct counts, union, k-min Jaccard, and estimated intersection —
    'how much of crawl B is already in crawl A' without joining corpora
    (Beyer et al. 2007). Sketches are keys×k rows, so every pair join is
    broadcast-sized; hashes are exact ints, estimates fixed double trees."""
    from morphik_core_spark.operators.dedup import word_shingles
    from morphik_core_spark.operators.sketches import kmv_overlap, kmv_sketch

    # single-row-group fixture: widen before the shingle explode (same
    # rationale as in_transit_by_day; measured 2.5→1.9 s at sf0.1)
    docs = _t(spark, sf_dir, "documents").repartition(spark.sparkContext.defaultParallelism)
    sh = word_shingles(docs, "text", "source", n=3)
    sk = kmv_sketch(sh, "source", "shingle", k=128)
    # crawl sources are a bounded dimension (tens), so the keys×k sketch
    # is driver-safe at any corpus size: opt into the collected pairwise
    # tail (bound raises at 512 sources × k — far past the contract)
    return kmv_overlap(sk, "source", k=128, collect_max_rows=512 * 128)


def _q_c4_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style per-page cleaning (Raffel et al. 2020 §2.2): terminal-
    punctuation + min-word line filter, lorem-ipsum / curly-brace page
    flags, 3-kept-lines page rule — pure codegen array pipeline, zero
    shuffles. The single-line corpus is re-lined deterministically
    (6-token windows, so the 5-word line rule can actually pass), ~3/4 of
    lines get terminal punctuation by md5 parity, and every 37th/41st doc
    gets a lorem-ipsum / curly-brace line so every rule fires both ways."""
    from morphik_core_spark.operators.curation import c4_line_filters

    docs = _t(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & (F.length("text") > 0)
    )
    synth = docs.select(
        "doc_id",
        F.split("text", " ").alias("tk"),
    ).select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.expr(
                "transform(transform(sequence(0, int(ceil(size(tk)/6.0)) - 1), "
                "i -> concat_ws(' ', slice(tk, i*6+1, 6))), "
                "l -> CASE WHEN locate(substr(md5(l), 1, 1), '0123456789ab') > 0 "
                "THEN l || '.' ELSE l END)"
            ),
        ).alias("t"),
    )
    synth = synth.select(
        "doc_id",
        F.concat(
            F.col("t"),
            F.when(F.col("doc_id") % 37 == 0, F.lit("\nlorem ipsum filler text here okay.")).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 41 == 0, F.lit("\ncode sample { return x; } done.")).otherwise(F.lit("")),
        ).alias("t"),
    )
    return c4_line_filters(synth, "t", "doc_id")


def _q_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group deterministic uniform 10-sample (distributed reservoir
    analog): k smallest exact cross-engine uniforms per language — the
    'eyeball N docs per stratum' curation step, reproducible across
    runs/engines/partitionings. Complements weighted_sample (global,
    weight-proportional) and group_topn (ordered, not uniform)."""
    from morphik_core_spark.operators.curation import group_sample

    docs = _t(spark, sf_dir, "documents")
    return group_sample(docs, "doc_id", "lang", k=10)


def _q_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimator calibration audit for the dedup stack: per banded-LSH
    candidate pair, the signature-estimated Jaccard (fraction of the 8
    MinHash values that agree) vs the exact shingle Jaccard, plus the
    absolute error — the query you run before trusting a (bands, rows)
    configuration at 100 TB. Exact-side shingle joins are restricted to
    the candidate pairs, so the audit stays inside the blocked set."""
    # the signature frame feeds the LSH chain once; the 8 signature
    # columns RIDE THROUGH the band self-join (carry_cols) so est_j
    # falls out of the pair generation itself — the round-6 verdict's
    # claw-back: both signature re-joins (and their shuffles) are gone
    sigs = _q_minhash_signatures(spark, sf_dir)
    mh_cols = [f"mh{i}" for i in range(8)]
    cand_sigs = _scoped(
        dedup.lsh_candidate_pairs(
            sigs,
            "doc_id",
            bands=_LSH_BANDS,
            rows_per_band=_LSH_ROWS,
            max_bucket_size=_LSH_MAX_BUCKET,
            carry_cols=mh_cols,
        )
    )
    cand = cand_sigs.select("id_a", "id_b")
    agree = sum(
        F.when(F.col(f"mh{i}_a") == F.col(f"mh{i}_b"), 1).otherwise(0) for i in range(8)
    )
    est = cand_sigs.select(
        "id_a", "id_b", (agree.cast("double") / F.lit(8.0)).alias("est_j")
    )
    docs = _t(spark, sf_dir, "documents")
    # exact-side work is bounded by the CANDIDATE set, not the corpus:
    # shingle only the docs that appear in a candidate pair (left-semi on
    # the pair ids), collect each doc's DISTINCT shingle set into one
    # array row, and compute |A∩B| with array_intersect inside codegen.
    # vs the previous 3-join + per-pair groupBy form this is 2 equi-joins
    # and zero pair-grain shuffles — the exact-rescore shape every verify
    # stage uses (the per-doc array is doc-length-bounded, and the join
    # input is the candidate set, so it holds at 100 TB).
    cand_ids = cand.select(F.col("id_a").alias("doc_id")).unionByName(
        cand.select(F.col("id_b").alias("doc_id"))
    )
    sets = (
        # spread=False: the semi-join output already arrives post-shuffle
        # (>= shuffle.partitions), and the partition probe would
        # physically plan the whole candidate chain a second time just to
        # learn that (~0.8 s of construction, round-11 profile)
        dedup.word_shingles(
            docs.join(cand_ids, "doc_id", "left_semi"), "text", "doc_id", n=3, spread=False
        )
        .groupBy("doc_id")
        .agg(F.collect_set("shingle").alias("sh_set"))
    )
    out = (
        est.join(sets.select(F.col("doc_id").alias("id_a"), F.col("sh_set").alias("set_a")), "id_a")
        .join(sets.select(F.col("doc_id").alias("id_b"), F.col("sh_set").alias("set_b")), "id_b")
        .withColumn("common", F.size(F.array_intersect("set_a", "set_b")))
        .withColumn("sz_a", F.size("set_a"))
        .withColumn("sz_b", F.size("set_b"))
    )
    exact = F.col("common") * 1.0 / (F.col("sz_a") + F.col("sz_b") - F.col("common"))
    est_r = F.round(F.col("est_j"), _SCORE_DECIMALS)
    exact_r = F.round(exact, _SCORE_DECIMALS)
    return out.select(
        "id_a",
        "id_b",
        est_r.alias("est_jaccard"),
        exact_r.alias("exact_jaccard"),
        F.round(F.abs(est_r - exact_r), _SCORE_DECIMALS).alias("abs_err"),
    )


def _q_training_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-shard plan: hash-shard + hash-order = the
    global shuffle for training output (one repartition shuffle at any
    scale, append-stable). Output is the per-shard audit: doc count,
    token sum, distinct sources, order-key range over 16 shards."""
    from morphik_core_spark.operators.curation import training_shards

    docs = _t(spark, sf_dir, "documents")
    return training_shards(docs, "doc_id", "n_chars", "source", n_shards=16)


def _q_cluster_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-TF-IDF cluster labeling (Grootendorst 2022, BERTopic): the
    top-5 terms characterizing each language cluster — tf within cluster
    × ln(1 + avg_cluster_tokens / corpus_tf). The labeling stage run
    after any clustering (IVF cells, dedup clusters, topics); per-doc
    keyword extraction is tfidf_topterms, this is the per-CLUSTER dual."""
    from morphik_core_spark.operators.text_analysis import ctfidf_keywords

    docs = _t(spark, sf_dir, "documents")
    return ctfidf_keywords(docs, "text", "lang", top_n=5)


def _q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD1 CDC merge: apply a change batch (I/U/D ops) to the documents
    snapshot in ONE anti-join + union — deletes drop rows, updates
    replace, inserts append. The batch is synthesized deterministically
    from the snapshot itself (doc_id%10: 0→D, 1→U with lang rewritten,
    3→I as a shifted new id) so every op path is exercised."""
    from morphik_core_spark.operators.docstore import cdc_apply

    from morphik_core_spark.plans.cache import scoped_persist

    # the snapshot feeds itself plus three synthesized change branches
    # and the merge's anti-join - persist the pruned projection once
    docs = scoped_persist(
        _t(spark, sf_dir, "documents").select("doc_id", "lang", "source", "n_chars")
    )
    ten = F.col("doc_id") % 10
    deletes = docs.filter(ten == 0).select("doc_id", "lang", "source", "n_chars").withColumn("op", F.lit("D"))
    updates = (
        docs.filter(ten == 1)
        .select("doc_id", F.lit("xx").alias("lang"), "source", "n_chars")
        .withColumn("op", F.lit("U"))
    )
    inserts = (
        docs.filter(ten == 3)
        .select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            "lang",
            F.lit("cdc_new").alias("source"),
            "n_chars",
        )
        .withColumn("op", F.lit("I"))
    )
    changes = deletes.unionByName(updates).unionByName(inserts)
    return cdc_apply(docs, changes, ["doc_id"])


def _q_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution / MDM pipeline over dirty records: exact-name
    collapse → prefix blocking → within-block fuzzy match (levenshtein
    ≤ 2) → connected components → entity ids. Every 3rd part spawns a
    deterministic dirty twin (one char dropped at partkey mod len), so
    true merges, blocking misses, AND cross-name accidental matches all
    occur. The exact collapse BEFORE fuzzy matching is the scale move:
    pairwise distance runs on distinct names (vocabulary-sized), never
    on records; blocks bound the pair generator like every other
    pair-producing family here. Output at distinct-name grain: each
    name's record count, resolved entity id, and entity totals."""
    part = _t(spark, sf_dir, "part")
    clean = part.select((F.col("p_partkey") * 2).alias("rec_id"), F.col("p_name").alias("name"))
    dirty = part.filter(F.col("p_partkey") % 3 == 0).select(
        (F.col("p_partkey") * 2 + 1).alias("rec_id"),
        F.concat(
            F.expr("substr(p_name, 1, cast(p_partkey % length(p_name) as int))"),
            F.expr("substr(p_name, cast(p_partkey % length(p_name) as int) + 2)"),
        ).alias("name"),
    )
    records = clean.unionByName(dirty)
    names = records.groupBy("name").agg(
        F.min("rec_id").alias("name_id"), F.count(F.lit(1)).alias("n_recs")
    )
    blocked = names.withColumn("blk", F.substring("name", 1, 3))
    a = blocked.select(F.col("blk"), F.col("name_id").alias("id_a"), F.col("name").alias("name_a"))
    b = blocked.select(F.col("blk"), F.col("name_id").alias("id_b"), F.col("name").alias("name_b"))
    pairs = (
        a.join(b, "blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.levenshtein("name_a", "name_b") <= 2)
        .select("id_a", "id_b")
    )
    comp = dedup.connected_components(pairs)
    resolved = names.join(comp, names["name_id"] == comp["node"], "left").select(
        "name",
        "name_id",
        "n_recs",
        F.coalesce(F.col("component"), F.col("name_id")).alias("entity_id"),
    )
    sizes = resolved.groupBy("entity_id").agg(
        F.count(F.lit(1)).alias("entity_names"),
        F.sum("n_recs").alias("entity_recs"),
    )
    return resolved.join(sizes, "entity_id").select(
        "name", "name_id", "n_recs", "entity_id", "entity_names", "entity_recs"
    )


def _q_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global-aggregate subquery + anti-join): customers
    whose balance exceeds the average positive balance AND who placed no
    URGENT order since 1997, counted per nation band with a DECIMAL-exact
    balance sum. The scalar average is a one-row broadcast; the anti-join
    keys on custkey against the filtered order subset (every customer has
    SOME order in this testdata, so the restriction is what makes the
    anti-join discriminate) — the 'lapsed high-value accounts' report."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    dec = F.col("c_acctbal").cast("decimal(18,4)")
    avg_pos = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg((F.sum(dec) / F.count(F.lit(1))).alias("avg_bal"))
    )
    rich = (
        cust.crossJoin(F.broadcast(avg_pos))
        .filter(dec > F.col("avg_bal"))
        .join(
            orders.filter(
                (F.col("o_orderpriority") == "1-URGENT")
                & (F.col("o_orderdate") >= F.lit("1997-01-01"))
            ).select(F.col("o_custkey").alias("c_custkey")),
            "c_custkey",
            "left_anti",
        )
    )
    return (
        rich.groupBy((F.col("c_nationkey") % 5).cast("int").alias("band"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum(dec).cast("double"), 4).alias("totacctbal"),
        )
    )


# --------------------------------------------------- TPC-H shape extensions
# The remaining TPC-H query shapes (Q2, Q5-Q16, Q19, Q20) restated over the
# synthetic star schema; Q1/Q3/Q4/Q17/Q18/Q21/Q22 shapes exist above as
# pricing_summary / shipping_priority / late_ship_priority /
# small_quantity_revenue / large_order_customers / waiting_suppliers /
# idle_rich_customers. Where the schema lacks a TPC-H column or table
# (partsupp, l_shipmode, l_commitdate, p_container, supplier complaints)
# the FILTER is adapted to an equivalent-shape predicate over existing
# columns, but the join/aggregation/subquery STRUCTURE — the part the
# planner has to get right — is preserved, and every predicate branch is
# verified non-vacuous at sf0.001 and sf0.01. Money math follows the house
# rule (cf. pricing_summary): DECIMAL(18,4)-exact sums, cast to DOUBLE and
# ROUND only at the output edge, so results are bit-identical across
# shuffle-partition counts and vs the DuckDB oracle.

_DEC14 = "decimal(18,4)"


def _dec(c: str):  # money-typed column, the exact-aggregation input form
    return F.col(c).cast(_DEC14)


def _one_dec():  # F.lit needs a live SparkContext, so these stay lazy
    return F.lit(1).cast(_DEC14)


def _zero_dec():
    return F.lit(0).cast(_DEC14)


def _disc_price():
    """l_extendedprice * (1 - l_discount) as an exact DECIMAL product."""
    return _dec("l_extendedprice") * (_one_dec() - _dec("l_discount"))


def _q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (min-cost supplier per part): the correlated-min
    subquery decorrelated as a per-part `min(struct(price, suppkey))` —
    ONE shuffle on partkey, and the lexicographic struct-min yields the
    price minimum with a deterministic suppkey tiebreak inside the same
    aggregate (the textbook decorrelation joins the min back and scans
    the fact twice). partsupp doesn't exist in this schema, so supply
    cost = observed unit price l_extendedprice / l_quantity from
    lineitem — per-row IEEE division, bit-exact in both engines."""
    part = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_size").between(10, 20) & (F.col("p_type") == "STANDARD"))
        .select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem")
    unit = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "p_partkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
        "l_suppkey",
    )
    best = unit.groupBy("p_partkey").agg(
        F.min(F.struct("unit_price", "l_suppkey")).alias("m")
    )
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    return (
        best.join(F.broadcast(supp), F.col("m.l_suppkey") == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey",
            F.round(F.col("m.unit_price"), 6).alias("unit_price"),
        )
        .orderBy(F.col("s_acctbal").desc(), F.col("p_partkey").asc())
        .limit(100)
    )


def _q_regional_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (local supplier volume): the region→nation dim
    chain is broadcast into the supplier side; customer joins on BOTH
    custkey and the s_nationkey = c_nationkey closure that makes the
    supplier "local". The only big-big shuffle is lineitem⋈orders on
    orderkey — every dimension side broadcasts."""
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    cust = _t(spark, sf_dir, "customer")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(asia), supp.s_nationkey == asia.n_nationkey)
        .join(
            F.broadcast(cust),
            (orders.o_custkey == cust.c_custkey)
            & (supp.s_nationkey == cust.c_nationkey),
        )
    )
    return (
        joined.groupBy("n_name")
        .agg(F.round(F.sum(_disc_price()).cast("double"), 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


def _q_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape (forecasting revenue change): the pure scan-filter
    aggregate — every conjunct pushes to the parquet scan (shipdate,
    discount band, quantity cap), zero joins, one partial+final agg.
    The query whole-stage codegen should reduce to a single stage."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.round(
            F.sum(_dec("l_extendedprice") * _dec("l_discount")).cast("double"), 4
        ).alias("revenue")
    )


def _q_bilateral_shipping_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping between two trade blocs): nation
    bands (n_nationkey % 5) stand in for the two named nations so the
    pair predicate is non-vacuous at every SF. The disjunctive pair
    filter runs after both dim broadcasts; only lineitem⋈orders and the
    custkey join move data."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    orders = _t(spark, sf_dir, "orders")
    supp = _t(spark, sf_dir, "supplier").select(
        "s_suppkey", (F.col("s_nationkey") % 5).cast("int").alias("supp_band")
    )
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", (F.col("c_nationkey") % 5).cast("int").alias("cust_band")
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(
            ((F.col("supp_band") == 1) & (F.col("cust_band") == 2))
            | ((F.col("supp_band") == 2) & (F.col("cust_band") == 1))
        )
    )
    return (
        joined.groupBy(
            "supp_band", "cust_band",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(F.round(F.sum(_disc_price()).cast("double"), 4).alias("revenue"))
        .orderBy("supp_band", "cust_band", "l_year")
    )


def _q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (market share of a supplier bloc in one region's
    PROMO market): the two-role nation join — customer nations route
    through region AMERICA (broadcast chain), supplier nations only
    contribute the bloc membership flag. Numerator and denominator are
    conditional DECIMAL sums in ONE aggregation pass; the share divides
    in DOUBLE only at the output edge."""
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    am_keys = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select(F.col("n_nationkey").alias("cn_key"))
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    li = _t(spark, sf_dir, "lineitem")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    vol = _disc_price()
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(am_keys), cust.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
    )
    grouped = joined.groupBy(
        F.year("o_orderdate").cast("int").alias("o_year")
    ).agg(
        F.sum(
            F.when(F.col("s_nationkey") % 5 == 0, vol).otherwise(_zero_dec())
        ).alias("bloc_dec"),
        F.sum(vol).alias("total_dec"),
    )
    return grouped.select(
        "o_year",
        F.round(
            F.col("bloc_dec").cast("double") / F.col("total_dec").cast("double"), 6
        ).alias("mkt_share"),
    ).orderBy("o_year")


def _q_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit by nation and year): parts
    picked by p_name substring as in the original; without ps_supplycost
    the cost leg is p_retailprice × l_quantity (schema-native),
    preserving the two-product DECIMAL-exact amount expression and the
    orders join that only contributes the year. Part/supplier/nation all
    broadcast; lineitem⋈orders on orderkey is the single big shuffle."""
    part = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").contains("widget"))
        .select("p_partkey", "p_retailprice")
    )
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    amount = _disc_price() - _dec("p_retailprice") * _dec("l_quantity")
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
    )
    return (
        joined.groupBy(
            "n_name", F.year("o_orderdate").cast("int").alias("o_year")
        )
        .agg(F.round(F.sum(amount).cast("double"), 4).alias("sum_profit"))
        .orderBy(F.col("n_name").asc(), F.col("o_year").desc())
    )


def _q_returned_item_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting): one-quarter order
    window, returnflag='R' lines, revenue per customer with the nation
    name carried through a broadcast, top-20 by lost revenue. The
    grouping keys include the functionally-dependent customer attributes
    exactly as the original does — Catalyst folds them into one
    shuffle on the composite key."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-04-01"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    )
    return (
        joined.groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(_disc_price()).cast("double"), 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


def _q_important_part_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock identification): per-part value
    restricted to a supplier bloc, kept where the part's value exceeds a
    fraction of the bloc-wide total. The group-total-vs-global-scalar
    HAVING is the one-row broadcast crossJoin (BroadcastNestedLoopJoin
    over a single row — same shape as idle_rich_customers' scalar
    average); partsupp is restated over lineitem revenue."""
    supp5 = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey") < 5)
        .select("s_suppkey")
    )
    li = _t(spark, sf_dir, "lineitem")
    vals = (
        li.join(F.broadcast(supp5), li.l_suppkey == supp5.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum(_disc_price()).alias("val_dec"))
    )
    tot = vals.agg(F.sum("val_dec").alias("tot_dec"))
    return (
        vals.crossJoin(F.broadcast(tot))
        .filter(
            F.col("val_dec").cast("double") > F.col("tot_dec").cast("double") * 0.001
        )
        .select(
            "l_partkey", F.round(F.col("val_dec").cast("double"), 4).alias("part_value")
        )
        .orderBy(F.col("part_value").desc(), F.col("l_partkey").asc())
    )


def _q_priority_line_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping-mode priority classes): l_returnflag
    stands in for the missing l_shipmode as the class column; the
    CASE-sum conditional aggregation over the orders⋈lineitem single
    shuffle is the shape under test (urgent vs non-urgent line counts
    per class)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    orders = _t(spark, sf_dir, "orders")
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(urgent, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


def _q_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer order-count distribution): LEFT outer
    join with the order filter folded into the join CONDITION — not a
    WHERE — so zero-order customers survive into the c_count=0 bucket;
    then a second, tiny aggregation over the per-customer counts."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "4-NOT SPECIFIED")
        .select("o_custkey", "o_orderkey")
    )
    counts = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        counts.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def _q_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion effect): one month of lineitem, part
    type routed through a broadcast, promo and total revenue as two
    conditional DECIMAL sums in one pass, percentage formed in DOUBLE
    at the edge with the literal-first association the oracle mirrors."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    vol = _disc_price()
    agg = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).agg(
        F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(_zero_dec())).alias(
            "promo_dec"
        ),
        F.sum(vol).alias("total_dec"),
    )
    return agg.select(
        F.round(
            F.lit(100.0)
            * (F.col("promo_dec").cast("double") / F.col("total_dec").cast("double")),
            6,
        ).alias("promo_share")
    )


def _q_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier by quarterly revenue): revenue per
    supplier over one quarter, then the max-revenue tie set selected by
    EXACT DECIMAL equality against a one-row broadcast max (the view +
    correlated max of the original, without the second fact scan)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    rev = li.groupBy("l_suppkey").agg(F.sum(_disc_price()).alias("total_dec"))
    mx = rev.agg(F.max("total_dec").alias("mx"))
    supp = _t(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_dec") == F.col("mx"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select(
            "s_suppkey", "s_name",
            F.round(F.col("total_dec").cast("double"), 4).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


def _q_supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): distinct-supplier
    counts per (brand, type, size) over an in-list of sizes with a
    brand exclusion, minus a flagged-supplier set via LEFT ANTI join
    (the complaints NOT IN of the original; flagging is the
    deterministic s_suppkey % 7 == 3 since s_comment doesn't exist).
    COUNT(DISTINCT) forces the two-phase exact distinct aggregation."""
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#9")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    flagged = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") % 7 == 3)
        .select("s_suppkey")
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(flagged), li.l_suppkey == flagged.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), F.col("p_brand").asc(),
            F.col("p_type").asc(), F.col("p_size").asc(),
        )
    )


def _q_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (disjunctive predicate revenue): the OR-of-ANDs
    predicate mixes part and lineitem attributes, so no disjunct can be
    pushed below the join on its own — the equi-join on partkey carries
    it and the residual evaluates as one codegen'd filter over the
    broadcast join output. The shape that punishes planners which only
    push conjuncts."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    pred = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(5, 25)
            & F.col("l_quantity").between(5, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(10, 40)
            & F.col("l_quantity").between(10, 40)
        )
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(pred)
        .agg(F.round(F.sum(_disc_price()).cast("double"), 4).alias("revenue"))
    )


def _q_promotable_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (parts ready for promotion): semi-join chain —
    part('red%') broadcast into one year of lineitem, rolled up per
    supplier, kept where the supplier moved > 1.25× the bloc average
    (ps_availqty doesn't exist; the relative threshold reuses the
    global-scalar one-row broadcast shape of Q11/Q22), then a LEFT SEMI
    join back onto supplier. No aggregate ever leaves the blocked set."""
    red = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith("red"))
        .select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    q = (
        li.join(F.broadcast(red), li.l_partkey == red.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(_dec("l_quantity")).alias("qty_dec"))
    )
    avg = q.agg(F.sum("qty_dec").alias("tot_dec"), F.count(F.lit(1)).alias("n"))
    promo = q.crossJoin(F.broadcast(avg)).filter(
        F.col("qty_dec").cast("double")
        > F.lit(1.25) * (F.col("tot_dec").cast("double") / F.col("n"))
    )
    supp = _t(spark, sf_dir, "supplier")
    return (
        supp.join(
            promo.select("l_suppkey"), supp.s_suppkey == F.col("l_suppkey"), "left_semi"
        )
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


def _q_validation_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style data-quality gate over the documents table: one
    aggregation pass computes row count, completeness, key
    distinctness, numeric + length stats, and a language-allowlist
    rate, then derives pass/fail constraint rows from the SAME
    aggregate — adding a rule never adds a scan. The lang in_set
    threshold is deliberately above the corpus's real ~0.71 en/de/fr
    share so the fail path is exercised alongside the passing checks."""
    docs = _t(spark, sf_dir, "documents")
    from morphik_core_spark.operators.validation import validation_suite

    return validation_suite(
        docs,
        completeness_cols=["doc_id", "text", "lang"],
        unique_cols=["doc_id"],
        numeric_cols=["n_chars"],
        length_cols=["text"],
        in_set={"lang": ["en", "de", "fr"]},
        min_completeness={"text": 0.999},
        min_in_set_rate={"lang": 0.9},
        numeric_range={"n_chars": (1.0, 100000.0)},
    )


def _q_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship merge (the MDM step after `entity_resolution`):
    multi-source dirty records collapse to one golden row per entity —
    per-field mode of non-null values, ties to the lexicographically
    smallest. Two deterministic variant feeds exercise every path:
    every 3rd part contributes a corrupted name + NULL brand/size
    (null-skip), every 5th a lowercased brand (1-1 conflict resolved by
    the tie-break) — so mode wins, tie-breaks, and null-skips all occur
    at both SFs. Plan: one melt explode + two entity-keyed shuffles,
    independent of field count."""
    from morphik_core_spark.plans.cache import scoped_persist

    # one pruned scan feeds the base and both variant branches (and the
    # melt downstream) - persist it so part is read once
    part = scoped_persist(_t(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_brand", "p_type", "p_size"
    ))
    base = part.select(
        F.col("p_partkey").alias("entity_key"),
        F.col("p_name").alias("name"),
        F.col("p_brand").alias("brand"),
        F.col("p_type").alias("ptype"),
        F.col("p_size").alias("psize"),
    )
    va = part.filter(F.col("p_partkey") % 3 == 0).select(
        F.col("p_partkey").alias("entity_key"),
        F.concat(
            F.expr("substr(p_name, 1, cast(p_partkey % length(p_name) as int))"),
            F.expr("substr(p_name, cast(p_partkey % length(p_name) as int) + 2)"),
        ).alias("name"),
        F.lit(None).cast("string").alias("brand"),
        F.col("p_type").alias("ptype"),
        F.lit(None).cast("int").alias("psize"),
    )
    vb = part.filter(F.col("p_partkey") % 5 == 0).select(
        F.col("p_partkey").alias("entity_key"),
        F.col("p_name").alias("name"),
        F.lower(F.col("p_brand")).alias("brand"),
        F.lit(None).cast("string").alias("ptype"),
        F.col("p_size").alias("psize"),
    )
    records = base.unionByName(va).unionByName(vb)
    from morphik_core_spark.operators.dedup import golden_record

    out = golden_record(records, "entity_key", ["name", "brand", "ptype", "psize"])
    return out.select(
        F.col("entity").alias("entity_key"),
        "n_records",
        "name",
        "brand",
        "ptype",
        F.col("psize").cast("int").alias("psize"),
    )


def _q_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance: a standing (event_type, epoch-day)
    rollup built from pre-cutoff events as mergeable state, then a
    post-cutoff DELTA batch merged in — merge(state, delta) must equal
    the full recompute (which is exactly what the oracle computes).
    Cutoff 2024-01-20 splits the fixture roughly 2:1 at both SFs, so
    both the state and delta branches carry real rows. All sums live in
    DECIMAL state; means derive at read time. At scale the merge
    shuffles state-sized frames only — the delta is the only raw scan."""
    events = _t(spark, sf_dir, "events")
    from morphik_core_spark.operators.incremental import (
        agg_state,
        finalize_agg,
        merge_agg_states,
    )

    cutoff_us = 1705708800000000  # 2024-01-20T00:00:00Z
    day = F.expr("unix_micros(`ts`) div 86400000000").alias("day")
    base = events.select("event_type", day, "value", F.col("ts"))
    old = base.filter(F.expr(f"unix_micros(`ts`) < {cutoff_us}"))
    new = base.filter(F.expr(f"unix_micros(`ts`) >= {cutoff_us}"))
    keys = ["event_type", "day"]
    state = agg_state(old, keys, {"value": "value"})
    delta = agg_state(new, keys, {"value": "value"})
    merged = merge_agg_states([state, delta], keys)
    out = finalize_agg(merged, means=["value"])
    return out.select(
        "event_type",
        "day",
        F.col("n").alias("n_events"),
        F.round(F.col("sum_value").cast("double"), 4).alias("sum_value"),
        F.col("mean_value"),
    )


def _q_key_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-skew audit: power-of-two count-of-counts histogram over
    lineitem's l_partkey — the pre-flight check before keying a 100 TB
    join. Bucketing is floor(log2) computed by INTEGER bit-length
    (length(bin(cnt))-1), so no libm call can put a boundary count in
    different bins on different engines; the grand total rides a
    one-row broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    from morphik_core_spark.plans.stats import key_skew_histogram

    return key_skew_histogram(li, ["l_partkey"])


def _q_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization before url-keyed dedup: synthesized messy
    URLs (mixed-case scheme/host, default AND non-default ports,
    fragments, unsorted + utm_* query params, a .CO.UK multi-part
    suffix) collapse to canonical form + registrable domain. Every rule
    fires both ways at both SFs by construction of the mod cycles."""
    docs = _t(spark, sf_dir, "documents")
    m4 = F.col("n_chars") % 4
    scheme = (
        F.when(m4 == 0, F.lit("HTTP"))
        .when(m4 == 1, F.lit("https"))
        .when(m4 == 2, F.lit("http"))
        .otherwise(F.lit("HTTPS"))
    )
    www = F.when(F.col("n_chars") % 3 == 0, F.lit("WWW.")).otherwise(F.lit(""))
    m3 = F.col("doc_id") % 3
    sfx = (
        F.when(m3 == 0, F.lit(".CO.UK")).when(m3 == 1, F.lit(".com")).otherwise(F.lit(".org"))
    )
    m5 = F.col("doc_id") % 5
    port = (
        F.when(m5 == 0, F.lit(":80"))
        .when(m5 == 1, F.lit(":443"))
        .when(m5 == 2, F.lit(":8080"))
        .otherwise(F.lit(""))
    )
    m7 = F.col("doc_id") % 7
    qs = (
        F.when(m7 == 0, F.lit("?utm_source=x&b=2&a=1"))
        .when(m7 == 1, F.lit("?b=2&a=1"))
        .when(m7 == 2, F.lit("?utm_campaign=z"))
        .when(m7 == 3, F.lit("?z=9"))
        .otherwise(F.lit(""))
    )
    frag = F.when(F.col("doc_id") % 2 == 0, F.lit("#Sec")).otherwise(F.lit(""))
    url = F.concat(
        scheme, F.lit("://"), www, F.col("source"), F.lit(".Example"), sfx, port,
        F.lit("/Doc/"), F.col("doc_id"), qs, frag,
    )
    from morphik_core_spark.operators.curation import url_canonicalize

    return url_canonicalize(docs.withColumn("url", url), "url", "doc_id")


def _q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/last-touch revenue attribution: each purchase credits the
    user's last preceding non-purchase event (last-touch) and the
    user's first non-purchase event ever (first-touch); purchases with
    no prior touch go to 'direct'. Both lookups share one window sort;
    ties break on event_id so engines can't disagree."""
    events = _t(spark, sf_dir, "events")
    from morphik_core_spark.operators.analytics import touch_attribution

    return touch_attribution(
        events, "user_id", "ts", "event_type", "value", "purchase", "event_id"
    )


def _q_json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured column processing: events.props is a JSON string;
    extract $.k, bucket by tens, roll up per (event_type, bucket) —
    get_json_object stays JVM-side codegen (no UDF), malformed/missing
    JSON degrades to NULL on both engines identically."""
    events = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        events.withColumn("k", k)
        .filter(F.col("k").isNotNull())
        .groupBy("event_type", F.expr("k div 10").alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


def _q_grouping_sets_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS — the §2.4 shape rollup/cube can't express: two
    independent one-dimension breakdowns plus the grand total in ONE
    pass (Spark expands once, aggregates once; no self-union of scans).
    Placeholder '*' marks the aggregated-away dimension (the fixture
    columns are never NULL, so COALESCE is unambiguous)."""
    li = _t(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("_gs_lineitem")
    return spark.sql(
        """
        SELECT COALESCE(l_returnflag, '*') AS returnflag,
               COALESCE(l_linestatus, '*') AS linestatus,
               COUNT(*) AS n_items,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        FROM _gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


def _q_balance_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile decile report over customer balances: per decile the row
    count, balance band, and DECIMAL-exact mean. The ntile order is
    made total by the c_custkey tie-break, so engines can't disagree
    about which side of a boundary a tied balance falls on.

    Scale note: an unpartitioned ntile funnels through one task — fine
    for dimension-sized inputs like customers (exact rank semantics are
    the point of the report); for fact-sized inputs use the histogram/
    nearest-rank cuts (`quantile_estimate`, `length_percentiles`) and
    bucket by broadcast cut points instead."""
    from pyspark.sql.window import Window

    cust = _t(spark, sf_dir, "customer")
    w = Window.orderBy(F.col("c_acctbal").asc(), F.col("c_custkey").asc())
    dec = F.col("c_acctbal").cast("decimal(18,4)")
    return (
        cust.withColumn("decile", F.ntile(10).over(w))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.min("c_acctbal"), 4).alias("min_bal"),
            F.round(F.max("c_acctbal"), 4).alias("max_bal"),
            F.round(
                (F.sum(dec) / F.count(F.lit(1))).cast("double"), 6
            ).alias("mean_bal"),
        )
    )


def _q_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per event type: first half of January
    vs second half over fixed-width value bins — the drift gate a
    training pipeline runs between crawl snapshots. Each bin term is
    one fixed double tree rounded to 1e-12 and summed as a scaled
    INTEGER, so the float sum can never depend on aggregation order."""
    events = _t(spark, sf_dir, "events")
    from morphik_core_spark.operators.analytics import population_stability

    cutoff_us = 1705276800000000  # 2024-01-15T00:00:00Z
    binned = events.filter(F.col("value").isNotNull()).select(
        "event_type",
        F.expr("unix_micros(`ts`)").alias("us"),
        F.expr("CAST(floor(value / 25.0) AS BIGINT)").alias("vbin"),
    )
    base = binned.filter(F.col("us") < cutoff_us)
    cur = binned.filter(F.col("us") >= cutoff_us)
    return population_stability(base, cur, ["event_type"], "vbin")


def _q_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket lift over (user, purchase-item) baskets — items are
    the JSON props key bucketed by tens, purchases only, so baskets sit
    at ~7 of 10 items and BOTH the support filter and the per-basket
    cap (9) genuinely discriminate at both SFs (cap drops 1/15 resp.
    3/150 baskets — the hot-basket rule, in the oracle too);
    item-count dimensions broadcast."""
    events = _t(spark, sf_dir, "events")
    from morphik_core_spark.operators.analytics import basket_lift

    items = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.expr("CAST(get_json_object(props, '$.k') AS INT) div 10").alias("item"),
    ).filter(F.col("item").isNotNull())
    return basket_lift(items, "user_id", "item", min_support=5, max_items_per_group=9)


def _q_trade_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the nation trade graph (customer nation —
    supplier nation edges): degree-ordered orientation counts each
    triangle once with join fan-out bounded by oriented out-degree —
    the celebrity-node-proof restatement (Suri & Vassilvitskii) of the
    one graph op where naive self-joins detonate. Oracle is the naive
    canonical triple join, so the orientation trick is verified
    row-for-row."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    from morphik_core_spark.operators.graph import triangle_count

    edges = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .select(
            F.col("c_nationkey").cast("bigint").alias("src"),
            F.col("s_nationkey").cast("bigint").alias("dst"),
        )
        .distinct()
    )
    # nation keys bound the graph at 25 nodes / 300 canonical edges, so
    # the census rides the bounded-collect fast path (exact driver ints;
    # the clustering double still comes from the identical Spark ROUND
    # expression) instead of ~20 sub-KB AQE stage-jobs. 10_000 is a
    # two-orders-of-magnitude margin on the schema contract.
    return triangle_count(edges, collect_max_edges=10_000)


def _q_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst collapse per (user, event type): drop events arriving
    within 12 hours of the previous same-key event (retry-storm /
    double-fire cleanup before counting; 12 h so the keep AND drop
    branches both fire at both SFs — ~21%% of fixture events collapse).
    One lag window on integer epoch-us, event_id tie-break; suppression
    stays auditable via the kept flag and per-type counts."""
    events = _t(spark, sf_dir, "events")
    from morphik_core_spark.operators.sessions import debounce_events

    flagged = debounce_events(
        events, ["user_id", "event_type"], "ts", 43200, tiebreak_col="event_id"
    )
    return flagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("kept"), 1).otherwise(0)).alias("n_kept"),
        F.round(
            F.sum(F.when(F.col("kept"), 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("keep_rate"),
    )


def _q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per document — the readability rung of the
    quality-filter ladder. Sentence/word/vowel-group counts are pure
    regexp arithmetic (no UDF, no shuffle); the score is one fixed
    double tree ROUND(4)."""
    docs = _t(spark, sf_dir, "documents")
    from morphik_core_spark.operators.text_analysis import readability

    return readability(docs, "text", "doc_id")


def _q_script_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-script composition per document (Latin/digit/CJK/space/
    other ratios + mixed-script flag) — the mojibake/spam/wrong-langid
    gate. Code-point classes via \\x{...} ranges behave identically in
    Java regex and RE2 (verified)."""
    docs = _t(spark, sf_dir, "documents")
    from morphik_core_spark.operators.text_analysis import script_mix

    # the synthetic corpus is pure ASCII; every 7th doc gets a CJK tail
    # long enough (66 chars vs <=553-char docs) to push cjk_ratio past
    # the 0.1 mixed-script threshold, so BOTH flag branches fire
    mixed = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.col("text"), F.lit(" "), F.expr("repeat('漢字', 33)")),
        ).otherwise(F.col("text")),
    )
    return script_mix(mixed, "text", "doc_id")


def _q_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionized bounce report: 6-hour-gap sessions per user, per
    event-count band (1 = bounce, 2-3, 4+) — the engagement rollup on
    top of the gaps-and-islands sessionizer. Exact-int session stats;
    the band share is one ROUND(6) division. 6 h keeps single- AND
    multi-event sessions populated at both SFs."""
    events = _t(spark, sf_dir, "events")
    from morphik_core_spark.operators.sessions import session_stats

    stats = session_stats(events, gap_seconds=21600)
    band = (
        F.when(F.col("n_events") == 1, F.lit("bounce"))
        .when(F.col("n_events") <= 3, F.lit("short"))
        .otherwise(F.lit("engaged"))
    )
    total = stats.groupBy().agg(F.count(F.lit(1)).alias("n_total"))
    return (
        stats.groupBy(band.alias("band"))
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
            F.expr("sum(duration_us) div 1000000").alias("total_secs"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "band",
            "n_sessions",
            "n_events",
            "total_secs",
            F.round(
                F.col("n_sessions").cast("double") / F.col("n_total").cast("double"), 6
            ).alias("share"),
        )
    )


def _q_funnel_timing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-latency distribution: per user, seconds from the
    earliest view to the earliest purchase AFTER it, then exact
    nearest-rank p50/p90/p99 — integer microsecond diffs truncated with
    div, every output an actual observed latency (the funnel_steps
    companion: not just HOW MANY convert, but HOW FAST)."""
    events = _t(spark, sf_dir, "events")
    from morphik_core_spark.operators.curation import length_percentiles

    views = events.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min(F.unix_micros(F.col("ts"))).alias("t_view")
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", F.unix_micros(F.col("ts")).alias("t_p")
    )
    lat = (
        views.join(purchases, "user_id")
        .filter(F.col("t_p") > F.col("t_view"))
        .groupBy("user_id", "t_view")
        .agg(F.min("t_p").alias("t_purchase"))
        .select(
            F.lit("all").alias("cohort"),
            F.expr("(t_purchase - t_view) div 1000000").alias("latency_s"),
        )
    )
    return length_percentiles(lat, "cohort", "latency_s")


def _q_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via Reciprocal Rank Fusion: the dense ranking
    (seeded hash-embedding cosine, query = doc 0) and the sparse
    ranking (BM25 over 3 terms) fuse as Σ 1/(60+rank) — the standard
    hybrid-search combiner (Cormack et al.; what the reference's
    colpali/regular merge approximates with score unioning). Ranks come
    from ROUNDED scores with doc_id tie-breaks, so both engines rank
    identically; each fused score is a two-term fixed tree. Rank
    windows run over 30-row candidate lists (TakeOrdered upstream),
    never the corpus."""
    from morphik_core_spark.functions.embedder import hash_embed_components
    from morphik_core_spark.operators.text_analysis import bm25_topk
    from morphik_core_spark.plans.cache import scoped_persist
    from pyspark.sql.window import Window

    docs = _t(spark, sf_dir, "documents")
    # the embed explode is the dominant CPU and feeds both the norm and
    # the dot branches - persist so it tokenizes once
    comps = scoped_persist(
        hash_embed_components(docs, "text", "doc_id", dims=_EMBED_DIMS, seed=_EMBED_SEED)
    )
    qcomps = (
        hash_embed_components(docs.filter(F.col("doc_id") == 0), "text", "doc_id", _EMBED_DIMS, _EMBED_SEED)
        .select("idx", F.col("val").alias("qval"))
    )
    qnorm = qcomps.agg(F.sqrt(F.sum(F.col("qval") * F.col("qval"))).alias("qnorm"))
    # round-11: norm and dot fold into ONE aggregation over the cached
    # comps (was two passes + a doc_id join). The broadcast join goes
    # LEFT so the norm still sums every component; SUM skips the NULL
    # products of non-query indexes, so `dot` sums exactly the rows the
    # former inner join kept — and is NULL (filtered, as the inner
    # join dropped those docs) when a doc shares no index with the query.
    norm_dot = (
        comps.join(F.broadcast(qcomps), "idx", "left")
        .groupBy("doc_id")
        .agg(
            F.sqrt(F.sum(F.col("val") * F.col("val"))).alias("norm"),
            F.sum(F.col("val") * F.col("qval")).alias("dot"),
        )
        .filter(F.col("dot").isNotNull())
    )
    dense = (
        norm_dot.crossJoin(F.broadcast(qnorm))
        .select(
            "doc_id",
            F.round((F.lit(1.0) + F.col("dot") / (F.col("norm") * F.col("qnorm"))) / 2.0, _SCORE_DECIMALS).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(30)
    )
    sparse = bm25_topk(docs, "text", "doc_id", ["join", "window", "hash"], k=30)
    wd = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    d_ranked = dense.select("doc_id", F.row_number().over(wd).alias("r_dense"))
    s_ranked = sparse.select("doc_id", F.row_number().over(wd).alias("r_sparse"))
    fused = d_ranked.join(s_ranked, "doc_id", "full_outer").select(
        "doc_id",
        "r_dense",
        "r_sparse",
        F.round(
            F.coalesce(F.lit(1.0) / (F.lit(60.0) + F.col("r_dense")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(60.0) + F.col("r_sparse")), F.lit(0.0)),
            6,
        ).alias("rrf_score"),
    )
    return fused.orderBy(F.col("rrf_score").desc(), F.col("doc_id").asc()).limit(10)


def _q_trending_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-decayed trending score per (event_type, item):
    each event weighs 2^-(age_weeks) — decay quantized to whole
    half-lives so every weight is an exact power of two and the sum is
    plain BIGINT arithmetic (no pow(), no float-order dependence). The
    reference 'now' is max(ts), a one-row broadcast."""
    events = _t(spark, sf_dir, "events")
    from morphik_core_spark.operators.analytics import decayed_counts

    items = events.select(
        "event_type",
        F.expr("CAST(get_json_object(props, '$.k') AS INT) div 20").alias("item"),
        "ts",
    ).filter(F.col("item").isNotNull())
    return decayed_counts(items, ["event_type", "item"], "ts", half_life_days=7)


def _q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-keyed dedup AFTER canonicalization — the composition
    url_canonicalize exists for: the synthesized corpus emits the same
    logical URL in mixed case / with tracking params / fragments /
    default ports (doc pairs (2k, 2k+1) differ only in those), so
    canonical-form grouping collapses twins raw-string grouping would
    miss. Output: per canonical URL with duplicates, the keeper (min
    doc_id), group size, and distinct RAW forms collapsed."""
    docs = _t(spark, sf_dir, "documents")
    from morphik_core_spark.operators.curation import url_canonicalize

    base = F.concat(F.lit("ex"), (F.col("doc_id") / 2).cast("bigint").cast("string"))
    messy = F.col("doc_id") % 2 == 1
    url = F.concat(
        F.when(messy, F.lit("HTTP://WWW.")).otherwise(F.lit("http://www.")),
        base,
        F.lit(".Example.com"),
        F.when(messy, F.lit(":80")).otherwise(F.lit("")),
        F.lit("/p"),
        F.when(messy, F.lit("?utm_source=x#frag")).otherwise(F.lit("")),
    )
    canon = url_canonicalize(docs.withColumn("url", url), "url", "doc_id")
    raw = docs.select("doc_id", url.alias("raw_url"))
    joined = canon.join(raw, "doc_id")
    return (
        joined.groupBy("canonical_url")
        .agg(
            F.min("doc_id").alias("keeper_id"),
            F.count(F.lit(1)).alias("group_size"),
            F.countDistinct("raw_url").alias("n_raw_forms"),
        )
        .filter(F.col("group_size") > 1)
    )


def _q_skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D Pareto frontier over part (minimize retail price, maximize
    size): the skyline operator (Börzsönyi et al. ICDE'01) — "best
    price/capability trade-offs" — via `analytics.pareto_frontier_2d`'s
    bucket-local prune + exact per-cost-group pass. The oracle states
    the quadratic NOT EXISTS dominance spec; the engine plan is
    O(n log n) with no self-join."""
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_retailprice", "p_size")
    from morphik_core_spark.operators.analytics import pareto_frontier_2d

    return pareto_frontier_2d(part, "p_retailprice", "p_size").select(
        "p_partkey", "p_retailprice", "p_size"
    )


def _q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams
    (`analytics.transition_counts`): lag window keyed by user, count per
    (prev→next) state pair, per-prev normalization on the |states|²
    aggregate. Ordering ties break on event_id (oracle orders by
    epoch_us + event_id — the micro-truncation parity rule from
    debounce)."""
    ev = _t(spark, sf_dir, "events")
    from morphik_core_spark.operators.analytics import transition_counts

    return transition_counts(ev, "user_id", "ts", "event_type", "event_id")


def _q_dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality profile of order volume: per-dow order
    count, exact DECIMAL revenue, and a seasonality index (dow mean
    order value / overall mean). dow = days-since-Monday-epoch mod 7 —
    pure integer date arithmetic, engine-portable (no locale-dependent
    DAYOFWEEK). The index divides two decimal-exact means inside one
    fixed double tree; the normalizer is a window over the 7-row
    aggregate (sanctioned dimension-sized global window)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    orders = _t(spark, sf_dir, "orders")
    from pyspark.sql import Window

    dec2 = F.col("o_totalprice").cast("decimal(18,2)")
    agg = orders.groupBy(
        F.expr("datediff(CAST(o_orderdate AS DATE), DATE'1970-01-05') % 7").alias("dow")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(dec2).cast("decimal(18,2)").alias("total_price"),
    )
    w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    idx = (
        F.col("total_price").cast("double") / F.col("n_orders").cast("double")
    ) / (
        F.sum("total_price").over(w).cast("double")
        / F.sum("n_orders").over(w).cast("double")
    )
    return agg.select(
        "dow",
        "n_orders",
        F.round(F.col("total_price").cast("double"), 2).alias("total_price"),
        F.round(idx, 6).alias("seasonality_idx"),
    )


def _q_ngram_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source n-gram type/token diversity (`text_analysis.
    ngram_diversity`): total vs distinct word trigrams per source —
    the cross-document repetitiveness audit (template/boilerplate
    sources score low). Same token recipe as the MinHash shingler,
    WITHOUT per-doc distinct."""
    docs = _t(spark, sf_dir, "documents")
    from morphik_core_spark.operators.text_analysis import ngram_diversity

    return ngram_diversity(docs, "text", "source", n=3)


def _q_zipf_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency slope per source (`text_analysis.zipf_slope`):
    OLS of ln(freq) on ln(rank) over each source's top tokens, with ln
    values quantized to scaled BIGINTs before the regression sums so the
    slope is partitioning-independent (PSI/HLL scaled-integer rule)."""
    docs = _t(spark, sf_dir, "documents")
    from morphik_core_spark.operators.text_analysis import zipf_slope

    return zipf_slope(docs, "text", "source", top_n=500)


def _q_sq8_error_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 quantization QA (`similarity.sq8_reconstruction_error`):
    reconstruct every vector through the exact knn_sq8 code path and
    report per-label reconstruction MSE — the is-4x-compression-safe
    audit run before building the quantized index. Per-vector MSE folds
    in array order then quantizes to pico-scaled BIGINTs; group sums are
    exact integers."""
    emb = _t(spark, sf_dir, "embeddings")
    from morphik_core_spark.operators.similarity import sq8_reconstruction_error

    return sq8_reconstruction_error(emb, dims=_EMB_DIMS, group_col="label")


def _q_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation funnel audit (`pipeline.curation_funnel`): documents
    surviving input → language gate → quality rules → exact dedup, as
    one relational plan (no per-stage actions). Synthetic twins (every
    7th doc re-ingested under a shifted id — the re-crawl case) make the
    dedup stage non-vacuous, and the language gate reads the declared
    `lang` column (en/de/fr) so it actually drops es/zh docs; each
    stage's predicate evaluates on the previous stage's survivors,
    keeper = min id per fingerprint among quality-passing docs."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    dup_twins = docs.filter(F.col("doc_id") % 7 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1000000
    )
    corpus = docs.unionByName(dup_twins)
    from morphik_core_spark.pipeline import curation_funnel

    return curation_funnel(
        corpus, "text", "doc_id", keep_langs=("en", "de", "fr"), lang_col="lang"
    )


def _q_dedup_per_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window event dedup (`sessions.keep_first_per_window`):
    at most one event per (user, type, aligned hour) — earliest ts wins,
    event_id tie-break — with the per-window suppression count. Batch
    twin of dropDuplicatesWithinWatermark; one partitioned window, no
    join."""
    ev = _t(spark, sf_dir, "events")
    from morphik_core_spark.operators.sessions import keep_first_per_window

    kept = keep_first_per_window(ev, ["user_id", "event_type"], "ts", "event_id", 3600)
    return kept.select("event_id", "user_id", "event_type", "window_start", "n_in_window")


def _q_length_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-batch length buckets (`curation.length_bucketing`): CASE
    bucket assignment + per-bucket padding-waste audit. The (16,32,64)
    menu keeps the overflow/truncation branch non-vacuous at every SF
    (corpus word counts run 10-99)."""
    docs = _t(spark, sf_dir, "documents")
    return curation.length_bucketing(docs, "text", "doc_id", buckets=(16, 32, 64))


def _q_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental crawl dedup (`streaming.neardup.near_dup_batch`, the
    batch API of the streaming near-dup filter, here against a band
    STORE built from the standing corpus): docs_id%5==0 play today's
    increment, the rest the standing corpus. A new doc is kept iff no
    LSH band matches the store AND no smaller-id batch-mate claimed one
    of its bands — exactly the store-then-claim contract the streaming
    path applies per micro-batch. Output: every new doc with its kept
    verdict."""
    docs = _t(spark, sf_dir, "documents")
    from morphik_core_spark.streaming.neardup import doc_band_keys, near_dup_batch

    new = docs.filter(F.col("doc_id") % 5 == 0)
    # ONE signature pass over the whole corpus, split by id afterwards —
    # banding old and new separately would run the dominant
    # shingle→minhash pipeline twice (the self-union lesson, NOTES.md)
    bands_all = _scoped(doc_band_keys(docs, "text", "doc_id", num_hashes=_MINHASHES, bands=4))
    store = bands_all.filter(F.col("doc_id") % 5 != 0).select("band", "key")
    new_bands = bands_all.filter(F.col("doc_id") % 5 == 0)
    kept_docs, _bands = near_dup_batch(
        new, store, "text", "doc_id", num_hashes=_MINHASHES, bands=4, batch_bands=new_bands
    )
    kept_flag = kept_docs.select("doc_id").withColumn("kept", F.lit(True))
    return (
        new.select("doc_id")
        .join(kept_flag, "doc_id", "left")
        .select("doc_id", F.coalesce("kept", F.lit(False)).alias("kept"))
    )


def _q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label exact centroids (`embedding_stats.label_centroids`),
    exploded to (label, n_vecs, dim, value) scalar rows: per-dim means
    from scaled-int sums — bit-identical under any partitioning."""
    emb = _t(spark, sf_dir, "embeddings")
    from morphik_core_spark.operators.embedding_stats import label_centroids

    cents = label_centroids(emb, dims=_EMB_DIMS)
    return cents.select(
        "label", "n_vecs", F.posexplode("centroid").alias("dim", "value")
    )


def _q_centroid_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid confusion matrix (`embedding_stats.
    centroid_confusion`): every vector assigned to its cosine-nearest
    class prototype, counted as (true label → assigned label) — the
    label-separability audit; rounded-cos argmax with min-cid ties."""
    emb = _t(spark, sf_dir, "embeddings")
    from morphik_core_spark.operators.embedding_stats import centroid_confusion

    return centroid_confusion(emb, dims=_EMB_DIMS)


def _q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation (`analytics.rfm_segments`): per user
    Recency/Frequency/Monetary, each ntile-scored 1..5 with user-id
    tie-breaks, rolled up per (r,f,m) cell. Recency is exact integer
    days vs the corpus max ts; monetary sums are DECIMAL-exact."""
    events = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    from morphik_core_spark.operators.analytics import rfm_segments

    return rfm_segments(events, "user_id", "ts", "value")


def _q_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed mean target encoding (Micci-Barreca 2001) of order
    priority against the finished-status target, plus the leave-one-out
    encode band per category (`curation.target_encoding`). Exact int
    counts; each float is one fixed expression tree rounded once."""
    orders = _t(spark, sf_dir, "orders").withColumn(
        "is_final", (F.col("o_orderstatus") == "F").cast("int")
    )
    from morphik_core_spark.operators.curation import target_encoding

    return target_encoding(orders, "o_orderpriority", "is_final", m_smoothing=10)


def _q_orphan_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity orphan audit (`validation.referential_orphans`)
    across four FK edges of the star schema. The dimensions are
    synthetically restricted (key % prime != 0 rows dropped) so the
    orphan counts are non-vacuous at every sf; each edge is one
    broadcast left join + conditional count, no fact shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    part = _t(spark, sf_dir, "part")
    supp = _t(spark, sf_dir, "supplier")
    from morphik_core_spark.operators.validation import referential_orphans

    return referential_orphans(
        [
            ("lineitem->orders", li, "l_orderkey",
             orders.filter(F.col("o_orderkey") % 97 != 0), "o_orderkey"),
            ("orders->customer", orders, "o_custkey",
             cust.filter(F.col("c_custkey") % 89 != 0), "c_custkey"),
            ("lineitem->part", li, "l_partkey",
             part.filter(F.col("p_partkey") % 83 != 0), "p_partkey"),
            ("lineitem->supplier", li, "l_suppkey",
             supp.filter(F.col("s_suppkey") % 79 != 0), "s_suppkey"),
        ]
    )


def _q_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top session-opening paths (`sessions.session_paths`): first 3
    event types of every 6-hour-gap session, '>'-joined, with session
    and user counts. In-session order is total via the event_id
    tie-break, so the collected prefix is engine-independent."""
    events = _t(spark, sf_dir, "events")
    from morphik_core_spark.operators.sessions import session_paths

    return session_paths(events, gap_seconds=21600, path_len=3)


def _q_json_schema_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured schema inference (`validation.json_schema_profile`):
    per top-level JSON key — presence count/rate, numeric-castable
    count, exact distinct values, min/max string value. The profiled
    JSON is synthesized deterministically from events.props so the key
    set has real variety: 'k' always, 'u' on every 3rd user, 't' on
    purchases only, 'm' mixed numeric/string by event-id parity."""
    events = _t(spark, sf_dir, "events")
    from morphik_core_spark.operators.validation import json_schema_profile

    k = F.get_json_object("props", "$.k")
    js = F.concat(
        F.lit('{"k":'), k,
        F.when(
            F.col("user_id") % 3 == 0,
            F.concat(F.lit(',"u":"u'), F.col("user_id").cast("string"), F.lit('"')),
        ).otherwise(F.lit("")),
        F.when(
            F.col("event_type") == "purchase",
            F.concat(F.lit(',"t":"'), F.col("event_type"), F.lit('"')),
        ).otherwise(F.lit("")),
        F.concat(
            F.lit(',"m":'),
            F.when(F.col("event_id") % 2 == 0, k).otherwise(
                F.concat(F.lit('"x'), k, F.lit('"'))
            ),
        ),
        F.lit("}"),
    )
    return json_schema_profile(events.select(js.alias("js")), "js")


def _q_skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation (`plans.stats.salted_agg`): revenue
    and line count per part key computed as (key, salt) partials merged
    on the key — the manual skew-mitigation shape for a hot aggregation
    key. The oracle is the DIRECT single-stage groupBy, so the salted
    plan's exact equivalence is what the gate verifies. Top-20 by
    revenue with key tie-break keeps the report deterministic."""
    li = _t(spark, sf_dir, "lineitem")
    from morphik_core_spark.plans.stats import salted_agg

    out = salted_agg(
        li,
        ["l_partkey"],
        {
            "revenue": "SUM(CAST(l_extendedprice AS DECIMAL(18,2)))",
            "n_lines": "COUNT(1)",
        },
        n_salts=16,
        salt_col="l_orderkey",
    )
    return (
        out.orderBy(F.col("revenue").desc(), F.col("l_partkey").asc())
        .limit(20)
        .withColumn("revenue", F.round(F.col("revenue").cast("double"), 2))
    )


def _q_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Popularity-proportional negative sampling for contrastive
    training (`curation.negative_sampling`, word2vec-style unigram
    draws): 3 deterministic inverse-CDF draws per purchase positive,
    collisions with the positive item dropped, rolled up as the
    (pos_item, neg_item) draw matrix. Portable-hash uniforms make
    retraining see identical negatives on any engine/partitioning."""
    events = _t(spark, sf_dir, "events")
    from morphik_core_spark.operators.curation import negative_sampling

    positives = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "event_id",
            F.expr("CAST(get_json_object(props, '$.k') AS INT) div 10").alias("item"),
        )
        .filter(F.col("item").isNotNull())
    )
    return negative_sampling(positives, "user_id", "item", "event_id", k=3)


def _q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit (`validation.k_anonymity_audit`)
    of customer under the quasi-identifier (nation, market segment,
    account-balance band): equivalence classes rolled up by class size
    with at-risk flags (size < 5) and the sensitive-attribute diversity
    band (sensitive proxy: custkey mod 7 — the synthetic table has no
    true sensitive column). Counts exact; row_share one rounded
    division."""
    cust = _t(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal").cast("double") / F.lit(1000.0)).alias("bal_band"),
        (F.col("c_custkey") % 7).alias("sens"),
    )
    from morphik_core_spark.operators.validation import k_anonymity_audit

    return k_anonymity_audit(
        cust, ["c_nationkey", "c_mktsegment", "bal_band"], "sens", k=5
    )


def _q_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-digit Benford screen (`validation.benford_audit`) over
    lineitem extended prices per return flag. Digits are extracted
    lexically from the string rendering (no float log path; the DOUBLE
    column renders shortest-round-trip identically in both engines at
    price magnitudes — oracle-proven); expected
    shares are shared full-precision literals; observed shares one
    division of exact counts. TPC-H prices are ~uniform, so the
    deviations are real and non-vacuous."""
    li = _t(spark, sf_dir, "lineitem")
    from morphik_core_spark.operators.validation import benford_audit

    return benford_audit(li, "l_extendedprice", ["l_returnflag"])


def _q_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-Evidence / Information-Value feature screen
    (`curation.woe_iv`) of order priority against the finished-status
    target — `target_encoding`'s credit-scoring sibling. Per-category
    ln trees rounded once; the IV total summed as scaled integers so
    aggregation order can't move it."""
    orders = _t(spark, sf_dir, "orders").withColumn(
        "is_final", (F.col("o_orderstatus") == "F").cast("int")
    )
    from morphik_core_spark.operators.curation import woe_iv

    return woe_iv(orders, "o_orderpriority", "is_final")


def _q_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test A/B readout (`analytics.ab_test_summary`)
    over a SWITCHBACK design: the randomization unit is (user, day) —
    the corpus has only ~15 users per mille of sf, all of whom
    purchase, so user-grain conversion saturates at 1.0 (measured,
    NOTES.md non-vacuity rule) — hash-assigned to control/variant_a/
    variant_b with the portable md5 bucket. Conversion = any purchase
    in the unit, plus a deterministic hash uplift on variant_a
    (~1 in 5 non-converting units flip) so `significant` exercises
    BOTH branches at sf0.01 (z≈6 for variant_a, |z|<2 for variant_b)."""
    events = _t(spark, sf_dir, "events")
    from morphik_core_spark.operators.analytics import ab_test_summary
    from morphik_core_spark.operators.dedup import portable_hash

    day = F.expr("unix_micros(ts) div 86400000000")
    unit = F.concat(F.col("user_id").cast("string"), F.lit(":"), day.cast("string"))
    units = (
        events.select(unit.alias("unit"),
                      (F.col("event_type") == "purchase").cast("int").alias("p"))
        .groupBy("unit")
        .agg(F.max("p").alias("base_conv"))
    )
    bucket = portable_hash(F.concat(F.lit("ab:"), F.col("unit"))) % 3
    uplift = portable_hash(F.concat(F.lit("up:"), F.col("unit"))) % 5 == 0
    variant = (
        F.when(bucket == 0, F.lit("control"))
        .when(bucket == 1, F.lit("variant_a"))
        .otherwise(F.lit("variant_b"))
    )
    assigned = units.select(
        "unit",
        variant.alias("variant"),
        ((F.col("base_conv") == 1) | ((bucket == 1) & uplift)).alias("conv"),
    )
    return ab_test_summary(assigned, "variant", "unit", "conv")


def _q_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-Marginal-Relevance diversification (`rerank.mmr_diversify`)
    of a 12-candidate ANN fan-in for 3 probe queries: greedy λ=0.5
    trade of relevance vs max cosine to the already-picked set, k=3.
    Pure DataFrame loop — every compared float is one rounded tree
    with id tie-breaks, so the picked set is engine-independent."""
    from pyspark.sql import Window

    from morphik_core_spark.functions.vectors import retrieval_score
    from morphik_core_spark.operators.rerank import mmr_diversify

    emb = _t(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )
    scored = (
        emb.select("vec_id", F.col("embedding").cast("array<double>").alias("vec"))
        .crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            F.round(retrieval_score(F.col("vec"), F.col("qv")), _SCORE_DECIMALS).alias(
                "score"
            ),
            "vec",
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("score").desc(), F.col("vec_id").asc())
    cands = scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 12)
    out = mmr_diversify(cands, "q_id", "vec_id", "score", "vec", lam=0.5, k=3)
    return out.withColumnRenamed("rank", "mmr_rank")


def _heuristic_score_and_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared frame for the ML-eval queries: a zero-shot heuristic
    quality probability (rational fast-sigmoid of centered n_chars — no
    training, so the oracle needs no gradient replay) against the
    reference-source label used by `quality_classifier`."""
    from morphik_core_spark.operators.classifier import fast_sigmoid

    docs = _t(spark, sf_dir, "documents").filter(
        F.col("n_chars").isNotNull() & F.col("source").isNotNull()
    )
    z = F.expr("(CAST(n_chars AS DOUBLE) - 298.0D) / 100.0D")
    return docs.select(
        F.round(fast_sigmoid(z), _SCORE_DECIMALS).alias("score"),
        F.col("source").isin(*_QC_POS_SOURCES).cast("int").alias("y"),
    )


def _q_auc_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC AUC / Gini (`ml_eval.auc_roc`) of the heuristic length
    score against the reference-source label — Mann-Whitney rank sums
    with midrank ties, DECIMAL(38,0) accumulation, one rounded division
    at the edge. The distinct-score prefix window is bounded by the
    6-dp quantization, not the corpus."""
    from morphik_core_spark.operators.ml_eval import auc_roc

    return auc_roc(_heuristic_score_and_label(spark, sf_dir), "score", "y")


def _q_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability bins + ECE (`ml_eval.calibration_bins`) for the
    heuristic probability vs the reference-source label: 10 bins,
    exact integer probability sums (scores pre-rounded), ECE via the
    scaled-int sum so partitioning can't move it."""
    from morphik_core_spark.operators.ml_eval import calibration_bins

    return calibration_bins(_heuristic_score_and_label(spark, sf_dir), "score", "y")


def _q_rater_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa (`ml_eval.cohens_kappa`) between the declared
    `lang` column and a simulated 70%-reliability annotator (portable
    hash keeps 7 of 10 labels, the rest shift one step in a fixed lang
    cycle) — the annotator-QA calculation. NOT langid-vs-lang: the
    synthetic corpus is English-like throughout, so `language_id` is a
    constant predictor and kappa would degenerate to exactly 0
    (measured; `langid_confusion` already covers that matrix).
    Integer contingency counts; structural both-raters-constant guard."""
    from morphik_core_spark.operators.dedup import portable_hash
    from morphik_core_spark.operators.ml_eval import cohens_kappa

    docs = _t(spark, sf_dir, "documents")
    nxt = (
        F.when(F.col("lang") == "de", F.lit("en"))
        .when(F.col("lang") == "en", F.lit("es"))
        .when(F.col("lang") == "es", F.lit("fr"))
        .when(F.col("lang") == "fr", F.lit("zh"))
        .otherwise(F.lit("de"))
    )
    keep = portable_hash(
        F.concat(F.lit("rater:"), F.col("doc_id").cast("string"))
    ) % 10 < 7
    rated = docs.select(
        "lang", F.when(keep, F.col("lang")).otherwise(nxt).alias("annotator"),
    )
    return cohens_kappa(rated, "lang", "annotator")


def _synthetic_score_and_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared frame for the threshold/ranking ML-eval queries: a score
    with REAL signal built as 0.7·hash-uniform + 0.3·label (the
    simulated-annotator construction `rater_agreement` uses) — the
    heuristic length score is uniform across deciles at this corpus
    (measured: 8/9/9/7/11/6/4/6/7/8 positives per decile → every lift
    row ≈ 1.0, vacuous), so gains/threshold tables need a score the
    label actually moves. Deterministic: the uniform comes from the
    portable hash in micro-units; one rounded blend."""
    from morphik_core_spark.operators.dedup import portable_hash

    docs = _t(spark, sf_dir, "documents").filter(F.col("source").isNotNull())
    u = (
        portable_hash(F.concat(F.lit("prob:"), F.col("doc_id").cast("string"))) % 1000000
    ).cast("double") / F.lit(1000000.0)
    y = F.col("source").isin(*_QC_POS_SOURCES).cast("int")
    return docs.select(
        "doc_id",
        F.round(F.lit(0.7) * u + F.lit(0.3) * y.cast("double"), _SCORE_DECIMALS).alias("score"),
        y.alias("y"),
    )


def _q_pr_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision / PR-AUC (`ml_eval.average_precision`) of the
    synthetic informative score: step-interpolated AP over distinct
    quantized scores descending, per-group terms pico-quantized into a
    DECIMAL(38,0) sum (partition-proof), vs the positive-rate baseline
    a random ranker would score."""
    from morphik_core_spark.operators.ml_eval import average_precision

    return average_precision(_synthetic_score_and_label(spark, sf_dir), "score", "y")


def _q_brier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brier score (`ml_eval.brier_score`) of the heuristic length
    probability vs the reference-source label — exact micro-unit squared
    errors in DECIMAL(38,0), plus the base-rate skill floor p̄(1−p̄)
    (measured 0.3095 vs floor 0.1275 at sf0.01: the heuristic is WORSE
    than the constant forecast — exactly the verdict this metric
    exists to render)."""
    from morphik_core_spark.operators.ml_eval import brier_score

    return brier_score(_heuristic_score_and_label(spark, sf_dir), "score", "y")


def _q_gains_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative gains / lift deciles (`ml_eval.gains_table`) of the
    synthetic informative score — top decile captures ~5× random at
    sf0.01 (36/75 positives, measured). ntile over (score desc, doc_id)
    total order for cross-engine parity; integer counts, edge ratios."""
    from morphik_core_spark.operators.ml_eval import gains_table

    return gains_table(_synthetic_score_and_label(spark, sf_dir), "score", "y", "doc_id")


def _q_threshold_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operating-point sweep (`ml_eval.threshold_sweep`): precision /
    recall / F1 / accuracy at thresholds 0.1..0.9 over the synthetic
    informative score. The corpus aggregates once to ≤10⁶+1 distinct
    quantized scores; the 9-row threshold grid joins that bounded frame
    — integer confusion counts, one division per ratio."""
    from morphik_core_spark.operators.ml_eval import threshold_sweep

    return threshold_sweep(_synthetic_score_and_label(spark, sf_dir), "score", "y")


def _q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Head-vocabulary coverage curve (`text_analysis.vocab_coverage`)
    over word 3-grams: fraction of all occurrences the top-{100, 1k, 5k}
    grams explain (measured 0.02 / 0.15 / 0.50 at sf0.01 — a long-tail
    corpus, non-vacuous grid). Top-N via distributed orderBy/limit,
    never a full-vocab window."""
    from morphik_core_spark.operators.text_analysis import vocab_coverage

    docs = _t(spark, sf_dir, "documents")
    return vocab_coverage(docs, "text", n=3, top_ns=(100, 1000, 5000))


def _q_demand_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-log demand regression per brand (`analytics.grouped_ols`):
    slope of ln(quantity) on ln(part retail price) — the price-
    elasticity estimate. Both lns per-term quantized to micro-units so
    the moment sums are exact integers (DECIMAL(38,0)); the part dim
    broadcasts into the lineitem side. Synthetic quantities are
    price-independent, so slopes spread around 0 (−0.67..+0.39 across
    the 25 brands, measured) — the non-vacuity is the spread and the
    honest near-zero R²."""
    from morphik_core_spark.operators.analytics import grouped_ols

    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    j = li.join(
        F.broadcast(part.select("p_partkey", "p_brand", "p_retailprice")),
        li.l_partkey == part.p_partkey,
    ).select(
        "p_brand",
        F.expr("CAST(ROUND(ln(CAST(p_retailprice AS DOUBLE)) * 1000000.0) AS BIGINT)").alias("lx"),
        F.expr("CAST(ROUND(ln(CAST(l_quantity AS DOUBLE)) * 1000000.0) AS BIGINT)").alias("ly"),
    )
    # |ln(price)|, |ln(qty)| < 10 so micro-units are < 1e7 and every
    # per-row product < 1e14 — long space holds them exactly
    return grouped_ols(j, "p_brand", "lx", "ly", products_fit_long=True).orderBy(
        "p_brand"
    )


def _q_quality_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-fused quality top-20 (`curation.quality_ensemble`): RRF over
    word count, type-token ratio, and mean word length ranks — the
    scale-free consensus for anti-correlated signals (TTR vs length
    −0.94 measured). Micro-quantized integer RRF terms; total-order
    ranks; deterministic top-k."""
    from morphik_core_spark.operators.curation import quality_ensemble

    docs = _t(spark, sf_dir, "documents")
    return quality_ensemble(docs, "text", "doc_id", k=20)


def _q_length_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-matching resampler audit (`curation.length_matching`):
    down-sample 100-char length buckets to a uniform profile (bucket
    shares 0.07–0.22 at sf0.01, measured — non-trivial keep rates).
    Keep decision is an exact integer inequality on the portable hash,
    reproduced verbatim in the oracle."""
    from morphik_core_spark.operators.curation import length_matching

    docs = _t(spark, sf_dir, "documents")
    return length_matching(docs, "doc_id", "n_chars", bucket_width=100)


def _q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly gap-fill + forward-fill per event type
    (`analytics.gap_fill_series`): the (type, hour) grid is ~6% sparse
    at sf0.01 (215/3600 holes, measured), so the fill is exercised and
    every filled row carries the last observed hourly count with an
    is_gap marker. Integer hour indexes (unix_micros div 3600e6) keep
    the grid and the parity engine-neutral."""
    from morphik_core_spark.operators.analytics import gap_fill_series

    events = _t(spark, sf_dir, "events")
    hourly = events.groupBy(
        F.col("event_type"),
        F.expr("unix_micros(ts) div 3600000000").alias("hour_idx"),
    ).agg(F.count(F.lit(1)).alias("n"))
    return gap_fill_series(hourly, "event_type", "hour_idx", "n")


def _q_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive trend/seasonal/residual split of daily event volume
    (`analytics.seasonal_decompose`, period 7): centered 7-day MA trend
    (full windows only), mean detrended deviation per day-of-week,
    integer micro-unit arithmetic throughout — the series-health readout
    that separates drift from weekly shape from genuine anomalies.
    Complements `dow_seasonality` (raw DOW means) and `acf_daily`
    (lag correlations) with the decomposition itself."""
    from morphik_core_spark.operators.analytics import seasonal_decompose

    events = _t(spark, sf_dir, "events")
    daily = events.groupBy(
        F.expr("unix_micros(ts) div 86400000000").alias("di")
    ).agg(F.count(F.lit(1)).alias("y"))
    return seasonal_decompose(daily, "di", "y", period=7)


def _q_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear-trend smoothing with one-step backtest
    (`analytics.holt_linear`, α=0.3, β=0.1) over daily event volume —
    the forecaster that must beat `forecast_backtest`'s seasonal-naive
    floor. Integer micro-unit state, one half-away round per step; the
    recursion runs at the driver over the series-bounded daily rollup
    (the Markov-solve boundary) and the oracle replays it verbatim as a
    DuckDB recursive CTE."""
    from morphik_core_spark.operators.analytics import holt_linear

    events = _t(spark, sf_dir, "events")
    daily = events.groupBy(
        F.expr("unix_micros(ts) div 86400000000").alias("di")
    ).agg(F.count(F.lit(1)).alias("y"))
    return holt_linear(daily, "di", "y", alpha=0.3, beta=0.1)


def _q_weighted_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted price quartiles per return flag
    (`analytics.weighted_quantiles`): "half the VOLUME ships below this
    price", measured ~0.3% off the unweighted median at sf0.01 so the
    operator discriminates. Integer cumulative over the per-(group,
    value) grid; per-mille integer threshold; selection-only output."""
    from morphik_core_spark.operators.analytics import weighted_quantiles

    li = _t(spark, sf_dir, "lineitem")
    return weighted_quantiles(
        li, "l_returnflag", "l_extendedprice", "l_quantity", qs=(0.25, 0.5, 0.75)
    )


def _q_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal eval-sample allocation across line-count strata
    (`analytics.neyman_allocation`, budget 1000): orders stratified by
    lineitem count (N_h spans 6..3024 at sf0.01), budget split
    proportional to N_h·σ_h = sqrt(N·Σx²−(Σx)²) — one IEEE sqrt of an
    exact cents integer per stratum — with the proportional allocation
    beside it; both Hamilton-apportioned so each sums exactly to 1000."""
    from morphik_core_spark.operators.analytics import neyman_allocation

    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    lc = li.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.count(F.lit(1)).alias("n_lines")
    )
    strat = orders.join(lc, "o_orderkey").select(
        F.col("n_lines").cast("string").alias("stratum"), "o_totalprice"
    )
    return neyman_allocation(strat, "stratum", "o_totalprice", budget=1000)


def _q_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction intervals on the Holt backtest
    (`analytics.conformal_interval`, 1/3 calibration, alpha=1/3 — a 67%
    target interval; the default 90% interval measured coverage 1.0 at
    BOTH SFs on this short series, a never-false covered flag, so the
    parameterization was tightened until the flag discriminates:
    0.85/0.90 measured): the finite-sample-corrected nearest-rank
    quantile of calibration |errors| widths every evaluation forecast
    into [lo, hi] with a covered flag and the empirical coverage the
    guarantee is judged against. Integer micro-units end to end;
    quantile is selection, never interpolation."""
    from morphik_core_spark.operators.analytics import conformal_interval, holt_linear

    events = _t(spark, sf_dir, "events")
    daily = events.groupBy(
        F.expr("unix_micros(ts) div 86400000000").alias("di")
    ).agg(F.count(F.lit(1)).alias("y"))
    fc = holt_linear(daily, "di", "y", alpha=0.3, beta=0.1)
    return conformal_interval(
        fc, "di", "y", calib_frac_num=1, calib_frac_den=3, alpha_num=1, alpha_den=3
    )


def _q_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (PAVA) calibration of the synthetic informative score
    (`ml_eval.isotonic_calibration`): the minimax closed form over the
    3-dp quantized score grid — a bounded quadratic interval grid, the
    AUC-family pattern — yields the non-decreasing probability map the
    reliability diagram only diagnoses. Pooling plateaus appear wherever
    raw per-score rates are non-monotone (ubiquitous at this corpus's
    ~1-3 rows per distinct score — measured, discriminating)."""
    from morphik_core_spark.operators.ml_eval import isotonic_calibration

    return isotonic_calibration(
        _synthetic_score_and_label(spark, sf_dir), "score", "y", grid_decimals=3
    )


def _q_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of daily event volume
    (`analytics.theil_sen_trend`): exact nearest-rank median over the
    435 pairwise slopes (series-bounded pair grid), micro-quantized
    slopes, 2x/4x-carried medians — the outlier-proof complement of
    `grouped_ols`' least-squares line."""
    from morphik_core_spark.operators.analytics import theil_sen_trend

    events = _t(spark, sf_dir, "events")
    daily = events.groupBy(
        F.expr("unix_micros(ts) div 86400000000").alias("di")
    ).agg(F.count(F.lit(1)).alias("y"))
    # day-grain series: same 100k contract bound as the acf/MK family
    return theil_sen_trend(daily, "di", "y", collect_max_points=100_000)


def _q_ratio_metric_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method CI for purchases-per-event by hash variant
    (`analytics.ratio_metric_ci`): the clustered-ratio correction —
    events within a user correlate (corr(x,y) ~ 0.4-0.5 measured), so
    the per-user unit frame feeds exact DECIMAL(38,0) moments and one
    double tree per group."""
    from morphik_core_spark.operators.analytics import ratio_metric_ci
    from morphik_core_spark.operators.dedup import portable_hash

    events = _t(spark, sf_dir, "events")
    grp = F.when(
        portable_hash(F.concat(F.lit("rm:"), F.col("user_id").cast("string"))) % 2 == 0,
        F.lit("control"),
    ).otherwise(F.lit("variant"))
    units = events.groupBy(F.col("user_id"), grp.alias("grp")).agg(
        F.sum((F.col("event_type") == "purchase").cast("bigint")).alias("x"),
        F.count(F.lit(1)).alias("y"),
    )
    return ratio_metric_ci(units, "grp", "x", "y")


def _q_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend significance over daily event volume
    (`analytics.mann_kendall_test`) — the nonparametric companion to
    `theil_sen_trend`: exact integer S over the series-bounded pair
    grid, tie-corrected integer variance, continuity-corrected z. Two
    rows: the RAW series (z ≈ −0.14 at sf0.01, trend 'none') and the
    cusum_drift-style +50% tail uplift (z ≈ 3.64, 'increasing') so the
    trend label exercises both branches — the injected-drift precedent
    from the NOTES non-vacuity rule."""
    from morphik_core_spark.operators.analytics import mann_kendall_test

    from morphik_core_spark.plans.cache import scoped_persist

    events = _t(spark, sf_dir, "events")
    # day-grid series consumed by both the raw and uplifted test (and
    # by its own min subquery): persist so the corpus is scanned once
    d0 = scoped_persist(
        events.groupBy(
            F.expr("unix_micros(ts) div 86400000000").alias("di")
        ).agg(F.count(F.lit(1)).alias("x0"))
    )
    lo = d0.agg(F.min("di").alias("_dmin"))
    base = d0.join(F.broadcast(lo))
    # bounded day grid (see acf_daily): one collect replaces the pair
    # join + grid chains per series
    raw = mann_kendall_test(
        base.select("di", F.col("x0").alias("y")), "di", "y",
        collect_max_points=100_000,
    )
    uplifted = mann_kendall_test(
        base.select(
            "di",
            (
                F.col("x0")
                + F.when(
                    F.col("di") >= F.col("_dmin") + 20, F.expr("x0 div 2")
                ).otherwise(F.lit(0))
            ).alias("y"),
        ),
        "di",
        "y",
        collect_max_points=100_000,
    )
    return raw.select(F.lit("raw").alias("series"), "*").unionByName(
        uplifted.select(F.lit("uplifted").alias("series"), "*")
    )


def _q_sprt_decision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald SPRT early-stopping replay (`analytics.sprt_monitor`) over
    (user, day) conversion units in deterministic hash order, testing
    p0=0.41 vs p1=0.51 at alpha=beta=0.05 (LLR micro-constants 218254 /
    -185717, threshold ln(19)*1e6 = 2944439 — computed once, inlined in
    both engines). The variant carries the ab_test-style 1-in-5
    non-converter uplift, so control accepts H0 (n~77-125) and variant
    accepts H1 (n~90-181) at both SFs — both decision branches fire,
    measured."""
    from morphik_core_spark.operators.analytics import sprt_monitor
    from morphik_core_spark.operators.dedup import portable_hash

    events = _t(spark, sf_dir, "events")
    day = F.expr("unix_micros(ts) div 86400000000")
    unit = F.concat(F.col("user_id").cast("string"), F.lit(":"), day.cast("string"))
    units = events.groupBy(unit.alias("unit")).agg(
        F.max((F.col("event_type") == "purchase").cast("int")).alias("conv0")
    )
    grp = F.when(
        portable_hash(F.concat(F.lit("grp:"), F.col("unit"))) % 2 == 0, F.lit("control")
    ).otherwise(F.lit("variant"))
    uplift = (
        portable_hash(F.concat(F.lit("up:"), F.col("unit"))) % 5 == 0
    ).cast("int")
    staged = units.select(
        "unit",
        grp.alias("grp"),
        portable_hash(F.concat(F.lit("sprt:"), F.col("unit"))).alias("ord"),
        F.greatest(
            F.col("conv0"),
            F.when(grp == "variant", uplift).otherwise(F.lit(0)),
        ).alias("conv"),
    )
    return sprt_monitor(
        staged, "grp", "ord", "conv",
        llr_pos_micro=218254, llr_neg_micro=-185717, threshold_micro=2944439,
    )


def _q_acf_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-volume autocorrelation at lags 1..7
    (`analytics.autocorrelation`): integer deviations n·x−S, DECIMAL(38,0)
    product sums, one division per lag — the weekly-seasonality screen
    over the event stream."""
    from morphik_core_spark.operators.analytics import autocorrelation

    events = _t(spark, sf_dir, "events")
    daily = events.groupBy(
        F.expr("unix_micros(ts) div 86400000000").alias("di")
    ).agg(F.count(F.lit(1)).alias("x"))
    # the day grid is contract-bounded (~decades of days << 100k): the
    # collected path pays the grid aggregation once instead of ~13 AQE
    # stage-jobs of persists/lag-join/agg branches per action
    return autocorrelation(daily, "di", "x", max_lag=7, collect_max_points=100_000)


def _q_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM level-shift detector (`analytics.cusum_screen`) over daily
    event volume with a deterministic +33% uplift injected on the last
    10 of 30 days (the raw series' wander never crosses h at any sf —
    measured, NOTES.md non-vacuity rule — so the drift is synthesized
    to light the alarm in the tail and ONLY the tail). Closed form
    P_d − min(0, running-min P) keeps the recursion in two exact
    integer windows."""
    from morphik_core_spark.operators.analytics import cusum_screen

    events = _t(spark, sf_dir, "events")
    d0 = events.groupBy(
        F.expr("unix_micros(ts) div 86400000000").alias("di")
    ).agg(F.count(F.lit(1)).alias("x0"))
    lo = d0.agg(F.min("di").alias("_dmin"))
    drifted = d0.join(F.broadcast(lo)).select(
        "di",
        (
            F.col("x0")
            + F.when(
                F.col("di") >= F.col("_dmin") + 20, F.expr("x0 div 3")
            ).otherwise(F.lit(0))
        ).alias("x"),
    )
    return cusum_screen(drifted, "di", "x", h_mult=1)


def _q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-quality audit (`similarity.recall_at_k`): IVF (8 lists, 2
    probes) top-10 vs brute-force exact top-10 for 3 probe queries —
    the recall gate an ANN index must pass after every (re)build.
    Both sides are k-sized frames; the audit itself is O(queries·k)."""
    from morphik_core_spark.plans.cache import scoped_persist

    emb = _t(spark, sf_dir, "embeddings")
    # 3 rows, but its lineage scans the embeddings table and BOTH knn
    # paths consume it - persist the tiny frame
    queries_df = scoped_persist(emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
    ))
    exact = similarity.knn_brute_force(emb, queries_df, k=10, decimals=_SCORE_DECIMALS)
    approx = similarity.knn_ivf(
        emb, _centroids(spark, sf_dir), queries_df, k=10,
        n_probes=_IVF_PROBES, decimals=_SCORE_DECIMALS,
    )
    return similarity.recall_at_k(exact, approx)


def _q_ks_price_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample KS statistic (`analytics.ks_statistic`) between
    finished- and open-order total prices in cents (via DECIMAL(18,2), the engine-portable cents conversion — raw double*100 casts truncate in Spark but round in DuckDB) — the sup-norm drift
    test beside PSI; cross-multiplied DECIMAL(38,0) CDF gaps, arg-max
    on exact integers, smallest-value tie-break."""
    from morphik_core_spark.operators.analytics import ks_statistic

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderstatus",
        F.expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").alias("cents"),
    )
    return ks_statistic(
        orders.filter(F.col("o_orderstatus") == "F"),
        orders.filter(F.col("o_orderstatus") == "O"),
        "cents",
    )


def _q_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration Gini (`analytics.lorenz_gini`) over
    per-customer order totals in cents (DECIMAL-exact sums over the
    DOUBLE source column) — the inequality audit for
    "how concentrated is spend"; exact grouped-rank arithmetic in
    DECIMAL(38,0) over the distinct-value grid."""
    from morphik_core_spark.operators.analytics import lorenz_gini

    per_cust = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.expr(
                "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)"
            ).alias("cents")
        )
    )
    return lorenz_gini(per_cust, "cents")


def _q_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive backtest (`analytics.forecast_backtest`) of daily
    event volume at season 7: MAPE/sMAPE from ROUND(x·1e12)-scaled
    per-point ratios, RMSE from exact integer squared errors — the
    accuracy floor a real forecaster must beat."""
    from morphik_core_spark.operators.analytics import forecast_backtest

    events = _t(spark, sf_dir, "events")
    daily = events.groupBy(
        F.expr("unix_micros(ts) div 86400000000").alias("di")
    ).agg(F.count(F.lit(1)).alias("x"))
    return forecast_backtest(daily, "di", "x", season=7)


def _q_cuped_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced experiment readout (`analytics.cuped_adjust`)
    over the same switchback (user, day) units as `ab_test`: metric =
    purchases in the unit, covariate = total events in the unit (the
    pre-exposure activity proxy — strongly correlated with purchases,
    so the reported var_reduction is real). All moments are exact
    DECIMAL(38,0); θ and each adjusted mean are single rounded trees."""
    from morphik_core_spark.operators.analytics import cuped_adjust
    from morphik_core_spark.operators.dedup import portable_hash

    events = _t(spark, sf_dir, "events")
    day = F.expr("unix_micros(ts) div 86400000000")
    unit = F.concat(F.col("user_id").cast("string"), F.lit(":"), day.cast("string"))
    units = (
        events.select(
            unit.alias("unit"),
            (F.col("event_type") == "purchase").cast("int").alias("p"),
        )
        .groupBy("unit")
        .agg(F.sum("p").alias("y"), F.count(F.lit(1)).alias("x"))
    )
    bucket = portable_hash(F.concat(F.lit("ab:"), F.col("unit"))) % 3
    variant = (
        F.when(bucket == 0, F.lit("control"))
        .when(bucket == 1, F.lit("variant_a"))
        .otherwise(F.lit("variant_b"))
    )
    assigned = units.select(variant.alias("variant"), "y", "x")
    return cuped_adjust(assigned, "variant", "y", "x")


def _q_session_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier session-length survival (`analytics.survival_curve`):
    subjects are 6-hour-gap sessions, duration = event count, sessions
    ending in the corpus' final day are right-censored (~4% measured).
    Quantized-ln product carried as integer prefix sums; the exp/round
    edge follows the perplexity precedent."""
    from pyspark.sql import Window

    from morphik_core_spark.operators.analytics import survival_curve

    events = _t(spark, sf_dir, "events")
    us = F.expr("unix_micros(ts)")
    worder = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag(us).over(worder)
    new_sess = (prev.isNull() | ((us - prev) > 21600 * 1_000_000)).cast("int")
    sid = F.sum(new_sess).over(
        worder.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ses = (
        events.select("user_id", "event_id", "ts", sid.alias("sid"))
        .groupBy("user_id", "sid")
        .agg(
            F.count(F.lit(1)).alias("n_ev"),
            F.max(F.expr("unix_micros(ts)")).alias("last_us"),
        )
    )
    mx = events.agg(F.max(F.expr("unix_micros(ts)")).alias("_m"))
    subjects = ses.join(F.broadcast(mx)).select(
        F.col("n_ev").alias("dur"),
        F.when(F.col("_m") - F.col("last_us") < 86400 * 1_000_000, F.lit(0))
        .otherwise(F.lit(1))
        .alias("ev"),
    )
    return survival_curve(subjects, "dur", "ev")


def _q_did_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences (`analytics.did_estimate`) on the
    switchback units: treatment = hash-assigned variant_a, post = the
    last 15 of 30 days, with a deterministic +1 purchase uplift on
    ~1/3 of treatment∩post units ONLY — DiD recovers ≈ that uplift
    while the placebo arms difference out. 2×2 exact cell means, one
    rounded effect row."""
    from morphik_core_spark.operators.analytics import did_estimate
    from morphik_core_spark.operators.dedup import portable_hash

    events = _t(spark, sf_dir, "events")
    day = F.expr("unix_micros(ts) div 86400000000")
    units = (
        events.select(
            F.concat(
                F.col("user_id").cast("string"), F.lit(":"), day.cast("string")
            ).alias("unit"),
            day.alias("day"),
            (F.col("event_type") == "purchase").cast("int").alias("p"),
        )
        .groupBy("unit", "day")
        .agg(F.sum("p").alias("y"))
    )
    lo = units.agg(F.min("day").alias("_dmin"))
    bucket = portable_hash(F.concat(F.lit("ab:"), F.col("unit"))) % 3
    up = portable_hash(F.concat(F.lit("up:"), F.col("unit"))) % 3 == 0
    labeled = units.join(F.broadcast(lo)).select(
        F.when(bucket == 0, F.lit("control"))
        .when(bucket == 1, F.lit("variant_a"))
        .otherwise(F.lit("variant_b"))
        .alias("variant"),
        F.when(F.col("day") >= F.col("_dmin") + 15, F.lit("post"))
        .otherwise(F.lit("pre"))
        .alias("period"),
        (
            F.col("y")
            + F.when(
                (bucket == 1)
                & (F.col("day") >= F.col("_dmin") + 15)
                & up,
                F.lit(1),
            ).otherwise(F.lit(0))
        ).alias("y2"),
    )
    return did_estimate(
        labeled, "variant", "period", "y2", treat_value="variant_a"
    )


def _q_vocab_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram Jensen-Shannon divergence (`text_analysis.vocab_jsd`)
    between the single-digit sources (src0-9) and the rest — the
    vocabulary-drift scalar between crawl cohorts; per-term trees
    summed as scaled integers, finite even for disjoint vocab."""
    from morphik_core_spark.operators.text_analysis import vocab_jsd

    docs = _t(spark, sf_dir, "documents")
    return vocab_jsd(
        docs.filter(F.length("source") == 4),
        docs.filter(F.length("source") != 4),
        "text",
    )


def _q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Test-vs-train 3-gram novelty (`text_analysis.novelty_rate`):
    even doc_ids are train, odd are test; per-document distinct
    shingles, novel = unseen anywhere in train — the diversity
    complement of `decontaminate`."""
    from morphik_core_spark.operators.text_analysis import novelty_rate

    docs = _t(spark, sf_dir, "documents")
    return novelty_rate(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
        "text",
        "doc_id",
        n=3,
    )


def _q_grouped_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-aware split audit (`curation.grouped_split`): events split
    by USER hash so no user leaks across train/val/test; per-split
    group/row counts + shares. Leakage is zero by construction (split
    is a pure function of the group key)."""
    from morphik_core_spark.operators.curation import grouped_split

    events = _t(spark, sf_dir, "events")
    return grouped_split(events, "user_id")


def _q_temporal_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purged time split (`curation.temporal_split`): train < day 20,
    2-day embargo dropped, test ≥ day 22 of the 30-day corpus —
    per-split counts and index bounds for the no-overlap audit."""
    from morphik_core_spark.operators.curation import temporal_split

    events = _t(spark, sf_dir, "events")
    day = F.expr("unix_micros(ts) div 86400000000")
    lo = events.agg(F.min(day).alias("_dmin"))
    rel = events.join(F.broadcast(lo)).select(
        (day - F.col("_dmin")).alias("rel_day")
    )
    return temporal_split(rel, "rel_day", cutoff_idx=20, embargo=2)


def _q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (median/MAD) outlier screen (`analytics.mad_outliers`)
    over order totals in cents per priority — `anomaly_stats`' heavy-
    tail-safe sibling; exact lower medians from per-group grid
    windows, integer-only modified-z flags. TPC-H prices are ~uniform
    (zero natural MAD outliers at any sf — measured), so every 97th
    order is inflated 20x: the screen must flag those whales and
    ONLY roughly those (~1%), exercising both flag branches."""
    from morphik_core_spark.operators.analytics import mad_outliers

    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
            " * (CASE WHEN o_orderkey % 97 = 0 THEN 20 ELSE 1 END)"
        ).alias("cents"),
    )
    return mad_outliers(orders, "priority", "cents", z=3.5)


def _q_lineitem_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation matrix (`analytics.numeric_corr`) over
    lineitem's numeric columns, integer-scaled (whole quantities,
    price cents, discount/tax hundredths — the portable conversions):
    qty↔price strongly positive by construction, discount/tax ≈ 0.
    One aggregation pass for all moments; DECIMAL(38,0) exact."""
    from morphik_core_spark.operators.analytics import numeric_corr

    li = _t(spark, sf_dir, "lineitem").select(
        F.expr("CAST(ROUND(l_quantity) AS BIGINT)").alias("qty"),
        F.expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)").alias("price_c"),
        F.expr("CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)").alias("disc_h"),
        F.expr("CAST(CAST(l_tax AS DECIMAL(18,2)) * 100 AS BIGINT)").alias("tax_h"),
    )
    # price cents < ~1.2e7 dominate every pairwise product (< ~1.5e14),
    # so long space holds the per-row products exactly
    return numeric_corr(
        li, ["qty", "price_c", "disc_h", "tax_h"], products_fit_long=True
    )


def _q_term_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary concentration (`analytics.lorenz_gini` over term
    frequencies): how unequal the corpus' unigram mass is — the Zipf
    audit's scalar complement, zero new machinery (subjects = terms,
    value = frequency)."""
    from morphik_core_spark.operators.analytics import lorenz_gini
    from morphik_core_spark.operators.text_analysis import tokens

    docs = _t(spark, sf_dir, "documents")
    freqs = (
        docs.select(F.explode(tokens(F.col("text"))).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return lorenz_gini(freqs, "freq")


def _q_winsorized_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized price summary (`analytics.winsorize_stats`) per
    return flag with the same 20x whale injection as `mad_outliers`:
    P5/P95 fences from exact nearest-rank grid counts, clipped mean vs
    raw mean — the whales move the raw mean and NOT the winsorized
    one, which is the point."""
    from morphik_core_spark.operators.analytics import winsorize_stats

    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.expr(
            "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
            " * (CASE WHEN l_orderkey % 97 = 0 THEN 20 ELSE 1 END)"
        ).alias("cents"),
    )
    return winsorize_stats(li, "l_returnflag", "cents", lo_pct=5, hi_pct=95)


def _q_ucb_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UCB1 allocation snapshot (`analytics.ucb_allocation`) over the
    switchback units with the variant_a uplift: the policy must pick
    variant_a (highest bound), exercising both would_pick branches.
    Per-arm ln trees rounded once; rounded-bound argmax with name
    tie-break."""
    from morphik_core_spark.operators.analytics import ucb_allocation
    from morphik_core_spark.operators.dedup import portable_hash

    events = _t(spark, sf_dir, "events")
    day = F.expr("unix_micros(ts) div 86400000000")
    unit = F.concat(F.col("user_id").cast("string"), F.lit(":"), day.cast("string"))
    units = (
        events.select(unit.alias("unit"),
                      (F.col("event_type") == "purchase").cast("int").alias("p"))
        .groupBy("unit")
        .agg(F.max("p").alias("base_conv"))
    )
    bucket = portable_hash(F.concat(F.lit("ab:"), F.col("unit"))) % 3
    uplift = portable_hash(F.concat(F.lit("up:"), F.col("unit"))) % 5 == 0
    variant = (
        F.when(bucket == 0, F.lit("control"))
        .when(bucket == 1, F.lit("variant_a"))
        .otherwise(F.lit("variant_b"))
    )
    assigned = units.select(
        variant.alias("variant"),
        ((F.col("base_conv") == 1) | ((bucket == 1) & uplift)).alias("conv"),
    )
    return ucb_allocation(assigned, "variant", "conv")


def _q_theil_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-T revenue inequality (`analytics.theil_decomposition`)
    across customers grouped by nation: how much spend concentration
    is BETWEEN nations vs WITHIN them — the decomposition Gini can't
    give. Customer revenue in DECIMAL-exact cents; nation dim
    broadcast."""
    from morphik_core_spark.operators.analytics import theil_decomposition

    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    per_cust = (
        orders.groupBy("o_custkey")
        .agg(
            F.expr(
                "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)"
            ).alias("cents")
        )
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select((F.col("c_nationkey") % 5).alias("bloc"), "cents")
    )
    return theil_decomposition(per_cust, "bloc", "cents")


def _q_source_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-mix diversity scalars (`analytics.diversity_metrics`)
    over the documents source distribution: HHI/Simpson and
    entropy/Shannon effective source counts — the mixture-health
    dashboard row beside the gini/theil concentration audits."""
    from morphik_core_spark.operators.analytics import diversity_metrics

    docs = _t(spark, sf_dir, "documents")
    return diversity_metrics(docs, "source")


def _q_event_trends(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type daily-volume trend slopes
    (`analytics.group_trend_slopes`): exact integer OLS moments, sign
    of an integer decides `rising` — the growth screen over segments."""
    from morphik_core_spark.operators.analytics import group_trend_slopes

    events = _t(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.expr("unix_micros(ts) div 86400000000").alias("di")
    ).agg(F.count(F.lit(1)).alias("x"))
    return group_trend_slopes(daily, ["event_type"], "di", "x")


def _q_chi_square_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence screen (`analytics.
    chi_square_independence`): significance + Cramér's V for the same
    three pairs `mutual_information` scores in nats — (lang, source) is
    dependent, the TPC-H pairs are noise. Absent cells contribute their
    expected counts via the bounded marginal cross-product; per-cell
    terms ROUND(·1e6)-quantized from exact integer counts."""
    from morphik_core_spark.operators.analytics import chi_square_independence

    docs = _t(spark, sf_dir, "documents")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    # collected-grid fast path: categorical vocab x vocab grids (<=125
    # cells at any scale); the bound RAISES if a contract is violated
    parts = [
        chi_square_independence(
            docs, "lang", "source", collect_max_cells=100_000
        ).withColumn("pair", F.lit("lang_source")),
        chi_square_independence(
            cust, "c_mktsegment", "c_nationkey", collect_max_cells=100_000
        ).withColumn("pair", F.lit("segment_nation")),
        chi_square_independence(
            orders, "o_orderpriority", "o_orderstatus", collect_max_cells=100_000
        ).withColumn("pair", F.lit("priority_status")),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select("pair", "chi2", "dof", "cramers_v", "n").orderBy("pair")


def _q_anova_doclen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA (`analytics.anova_oneway`): does mean document
    length differ across languages / sources more than within-group
    noise explains — the k-group mean screen upstream of
    `length_matching`'s repair step. DECIMAL(38,0) moments; per-group
    S²/n ROUND(·1e6)-quantized before the k-term reduction."""
    from morphik_core_spark.operators.analytics import anova_oneway

    docs = _t(spark, sf_dir, "documents")
    by_lang = anova_oneway(docs, "lang", "n_chars").withColumn("split", F.lit("by_lang"))
    by_source = anova_oneway(docs, "source", "n_chars").withColumn(
        "split", F.lit("by_source")
    )
    return (
        by_lang.unionByName(by_source)
        .select("split", "k", "n", "f_stat", "eta_sq", "ssb", "ssw")
        .orderBy("split")
    )


def _q_market_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HHI concentration (`analytics.hhi_concentration`): per region,
    how concentrated is order revenue across member nations — the
    antitrust readout beside `market_share`'s raw shares and
    `revenue_gini`'s inequality curve. Revenue quantizes once to cents;
    Σrev² / (Σrev)² is one double division of DECIMAL(38,0) integers
    per market."""
    from morphik_core_spark.operators.analytics import hhi_concentration

    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    facts = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .select(
            F.col("r_name").alias("market"),
            F.col("n_name").alias("player"),
            F.col("o_totalprice").alias("rev"),
        )
    )
    return hhi_concentration(facts, "market", "player", "rev", value_scale=100)


def _q_js_event_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen–Shannon drift (`analytics.js_divergence`): event-type mix
    of the first half of the month vs the second — the symmetric,
    ln2-bounded drift number beside `drift_psi` (unbounded, zero-bin
    fragile) and `ks_price_drift` (continuous-only). Per-cell terms
    ROUND(·1e12)-quantized from exact integer counts."""
    from morphik_core_spark.operators.analytics import js_divergence

    events = _t(spark, sf_dir, "events")
    halved = events.withColumn(
        "half",
        F.when(
            F.col("ts") < F.lit("2024-01-16 00:00:00").cast("timestamp"), F.lit("h1")
        ).otherwise(F.lit("h2")),
    )
    return js_divergence(halved, "half", "event_type", "h1", "h2")


def _q_hill_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill tail-index (`analytics.hill_tail_index`) of the order-value
    distribution over the top-500 order statistics — does revenue have
    a finite-variance tail, i.e. are mean-based rollups meaningful on
    it. One distributed top-(k+1); ln ratios of exact cent-quantized
    integers, ROUND(·1e12)-quantized per term."""
    from morphik_core_spark.operators.analytics import hill_tail_index

    orders = _t(spark, sf_dir, "orders")
    return hill_tail_index(orders, "o_totalprice", k=500, value_scale=100)


def _q_spearman_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation (`analytics.spearman_corr`): monotone
    association for three pairs — (n_chars, token count) on documents is
    near-1, while (quantity, extendedprice) and (quantity, discount)
    measure ≈0 because the synthetic generator draws them independently
    (the Pearson `lineitem_corr` agrees) — one ≈1 and two ≈0 pairs keep
    the oracle discriminating. The tie-average ranks come from value
    grids with a hierarchical prefix (no global sort even on the
    near-continuous cents-price grid); DECIMAL(38,0) moments, one
    double division."""
    from morphik_core_spark.operators.analytics import spearman_corr

    # two spearman calls each touch the fact table 3x (rows + two value
    # grids) = 6 pruned column scans. Deliberately NOT persisted: the
    # projection is corpus-sized, and materializing it costs more than
    # the five extra 3-column parquet scans it saves (measured 3.4 s ->
    # 6.3 s at sf0.1 with the persist; round 12 re-measured a joint-
    # cell-grid one-scan variant at 3.8 -> 5.6 s — same lesson) - the
    # scan-budget gate allowlists this query for that reason.
    li = _t(spark, sf_dir, "lineitem").select(
        "l_quantity", "l_extendedprice", "l_discount"
    )
    docs = _t(spark, sf_dir, "documents").withColumn(
        "tok_cnt",
        F.size(F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != "")),
    )
    parts = [
        # price ranked at DOLLAR resolution (the mad_outliers quantization
        # lever): the rank grid shrinks ~100x and a monotone screen is
        # insensitive to sub-dollar rank ties
        spearman_corr(li, "l_quantity", "l_extendedprice", 1, 1).withColumn(
            "pair", F.lit("qty_price")
        ),
        spearman_corr(li, "l_quantity", "l_discount", 1, 100).withColumn(
            "pair", F.lit("qty_discount")
        ),
        spearman_corr(docs, "n_chars", "tok_cnt", 1, 1).withColumn(
            "pair", F.lit("chars_tokens")
        ),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select("pair", "n", "rho").orderBy("pair")


def _q_fdr_nation_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini–Hochberg FDR over 25 per-nation A/B z-tests
    (`analytics.bh_fdr`): order value first half vs second half of the
    date range, with a +40% uplift injected into one nation's second
    half so both the reject and no-reject branches execute. p-values
    ride the shared Abramowitz–Stegun normal tail (exp + IEEE literals
    only) and are 1e12-quantized before ranking — the BH order is
    integer-deterministic on both engines."""
    from morphik_core_spark.operators.analytics import bh_fdr

    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    base = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .select(
            F.col("n_name").alias("nation"),
            F.when(F.col("o_orderdate") < F.lit("1995-06-17").cast("date"), "a")
            .otherwise("b")
            .alias("side"),
            F.col("o_totalprice").alias("v0"),
        )
        .withColumn(
            "v",
            F.when(
                (F.col("nation") == "NATION_3") & (F.col("side") == "b"),
                F.col("v0") * F.lit(1.4),
            ).otherwise(F.col("v0")),
        )
    )
    return bh_fdr(base, "nation", "side", "v", "a", "b", alpha=0.05)


def _q_mcnemar_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar paired test (`ml_eval.mcnemar_test`) between two document
    quality filters over the same corpus — char-length band vs
    token-count band — the significance question `cohens_kappa`'s
    agreement magnitude doesn't answer. Integer discordant counts; one
    continuity-corrected division."""
    from morphik_core_spark.operators.ml_eval import mcnemar_test

    docs = _t(spark, sf_dir, "documents").select(
        F.col("n_chars").between(150, 450).alias("keep_len"),
        F.size(
            F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != "")
        ).between(25, 80).alias("keep_tok"),
    )
    return mcnemar_test(docs, "keep_len", "keep_tok")


def _q_token_entropy_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-entropy profile (`text_analysis.token_entropy`):
    mean Shannon entropy of each doc's token distribution + share below
    3.0 nats — the degenerate/repetitive-doc rate per source that fixed
    n-gram repetition ratios approximate. Term-, doc-, and
    group-quantized integer sums end-to-end."""
    from morphik_core_spark.operators.text_analysis import token_entropy

    docs = _t(spark, sf_dir, "documents")
    return token_entropy(docs, "doc_id", "text", "source", low_threshold=3.0)


def _q_boilerplate_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style cross-document boilerplate measurement
    (`curation.boilerplate_profile`): 3-token segments appearing in ≥3
    distinct docs are boilerplate; per source, the mean share of token
    mass that is boilerplate + the share of docs containing any — the
    frequency-threshold complement of `paragraph_dedup`'s first-wins
    removal. Segments are built inside the token array (codegen, no
    per-token shuffle); ratios quantize to 1e6 integers before the
    group mean."""
    from morphik_core_spark.operators.curation import boilerplate_profile

    docs = _t(spark, sf_dir, "documents")
    return boilerplate_profile(
        docs, "doc_id", "text", "source", seg_words=3, min_docs=3
    )


def _q_kn_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser–Ney bigram LM (`text_analysis.
    kneser_ney_bigram`) over the corpus — the CCNet/KenLM-style quality
    LM training step; top-50 bigrams with MLE vs KN probabilities, the
    continuation counts making the difference visible. All model terms
    exact integer counts; the bigram vocabulary bounds every frame."""
    from morphik_core_spark.operators.text_analysis import kneser_ney_bigram

    docs = _t(spark, sf_dir, "documents")
    return kneser_ney_bigram(docs, "text", discount=0.75, top_n=50)


def _q_log_rank_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample log-rank test (`analytics.log_rank_test`): do early-
    month and late-month sessions share a survival curve — the
    significance readout on top of `session_survival`'s KM estimate.
    Same 6-hour-gap sessions and last-day censoring; groups split on
    session start time. Risk-set cumulatives ride the distinct-duration
    grid; E/V terms 1e6-quantized from exact integer counts."""
    from pyspark.sql import Window

    from morphik_core_spark.operators.analytics import log_rank_test

    events = _t(spark, sf_dir, "events")
    us = F.expr("unix_micros(ts)")
    worder = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag(us).over(worder)
    new_sess = (prev.isNull() | ((us - prev) > 21600 * 1_000_000)).cast("int")
    sid = F.sum(new_sess).over(
        worder.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ses = (
        events.select("user_id", "event_id", "ts", sid.alias("sid"))
        .groupBy("user_id", "sid")
        .agg(
            F.count(F.lit(1)).alias("n_ev"),
            F.min(F.expr("unix_micros(ts)")).alias("first_us"),
            F.max(F.expr("unix_micros(ts)")).alias("last_us"),
        )
    )
    mx = events.agg(F.max(F.expr("unix_micros(ts)")).alias("_m"))
    half_us = 1705363200 * 1_000_000  # 2024-01-16T00:00:00Z
    subjects = ses.join(F.broadcast(mx)).select(
        F.when(F.col("first_us") < half_us, "h1").otherwise("h2").alias("half"),
        F.col("n_ev").alias("dur"),
        F.when(F.col("_m") - F.col("last_us") < 86400 * 1_000_000, F.lit(0))
        .otherwise(F.lit(1))
        .alias("ev"),
    )
    return log_rank_test(subjects, "half", "dur", "ev", "h1", "h2")


def _q_cem_att_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coarsened-exact-matching ATT (`analytics.cem_att`): does the
    BUILDING market segment spend more than balance-comparable
    customers from other segments — treated/control paired by rank
    within $500 account-balance cells, surplus units dropped per CEM.
    Outcome = total order value (0 for orderless customers), exact cent
    sums, one division."""
    from morphik_core_spark.operators.analytics import cem_att

    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("spend")
    )
    units = (
        cust.join(spend, cust["c_custkey"] == spend["o_custkey"], "left")
        .na.fill({"spend": 0.0})
        .select(
            (F.col("c_mktsegment") == "BUILDING").alias("treated"),
            F.col("c_acctbal").alias("score"),
            F.col("spend"),
            F.col("c_custkey"),
        )
    )
    return cem_att(
        units, "treated", "score", "spend", "c_custkey",
        cell_width=500.0, outcome_scale=100,
    )


def _q_ewma_chart_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA control chart (`analytics.ewma_chart`) over daily event
    volume, λ=0.2, 3σ limits — the small-persistent-shift monitor
    between `cusum_drift` and `rolling_median_anomaly`. Driver-side
    series-bounded recursion (the holt_forecast boundary class):
    integer micro-unit state, one half-away round per step, variance
    factor iterated by IEEE multiplies — the oracle's recursive CTE
    replays the trajectory verbatim."""
    from morphik_core_spark.operators.analytics import ewma_chart

    events = _t(spark, sf_dir, "events")
    daily = events.groupBy(
        F.expr("unix_micros(ts) div 86400000000").alias("di")
    ).agg(F.count(F.lit(1)).alias("y"))
    return ewma_chart(daily, "di", "y", lam=0.2, n_sigma=3.0)


def _q_dp_release_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplace-mechanism DP count release (`validation.dp_noisy_counts`)
    over (lang, source) document counts, ε=1 — the publish step after
    the k-anonymity→l-diversity→t-closeness ladder clears a grouping.
    Noise is deterministic per (group, seed) via the portable-hash
    uniform u = (h mod 2³⁰ + 0.5)/2³⁰ and the exact inverse Laplace
    CDF, so the oracle replays it; n_true rides along for the audit."""
    from morphik_core_spark.operators.validation import dp_noisy_counts

    docs = _t(spark, sf_dir, "documents")
    return dp_noisy_counts(docs, ["lang", "source"], epsilon=1.0, seed=8)


def _fs_linkage_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared pair construction for the Fellegi–Sunter query: every 4th
    customer 're-registers' with one name char dropped, a changed
    segment when custkey%5==0, a shifted balance when custkey%7==0.

    Candidates block on (nation, custkey % B) with B = max(N/500, 1) —
    corpus-proportional sub-blocking, so total pairs stay O(N) (each
    a-row meets ~5 b-candidates at any scale) instead of the round-8
    draft's N²/100 nation-only blocks, while TRUE pairs (same custkey
    on both sides) co-block by construction. B is derived from a count
    scan, so both engines compute the identical blocking; the join is a
    plain (nk, sb) equi-join — 25·B keys, shuffle-safe at 100×, AQE
    broadcasts the small side at test scale on its own. True matches
    therefore mostly agree on all three comparison fields, random
    within-block pairs rarely do."""
    return _fs_pairs_from(_t(spark, sf_dir, "customer"))


def _fs_pairs_from(cust: DataFrame) -> DataFrame:
    """Pair construction over an arbitrary customer-shaped table —
    split out of `_fs_linkage_pairs` so the 10x scale probe
    (`scripts/scale_experiment.py --ops round8d`) drives the identical
    blocking over a tiled corpus."""
    spark = cust.sparkSession
    n_cust = cust.count()  # one count scan; B must match the oracle's
    n_sub = max(n_cust // 500, 1)
    a = cust.select(
        F.col("c_custkey").alias("a_key"),
        F.col("c_nationkey").alias("nk"),
        (F.col("c_custkey") % n_sub).alias("sb"),
        F.col("c_name").alias("a_name"),
        F.col("c_mktsegment").alias("a_seg"),
        F.col("c_acctbal").alias("a_bal"),
    )
    dirty = cust.filter(F.col("c_custkey") % 4 == 0)
    b = dirty.select(
        F.col("c_custkey").alias("b_key"),
        F.col("c_nationkey").alias("nk"),
        (F.col("c_custkey") % n_sub).alias("sb"),
        F.concat(
            F.expr("substr(c_name, 1, cast(c_custkey % length(c_name) as int))"),
            F.expr("substr(c_name, cast(c_custkey % length(c_name) as int) + 2)"),
        ).alias("b_name"),
        F.when(F.col("c_custkey") % 5 == 0, F.concat(F.col("c_mktsegment"), F.lit("X")))
        .otherwise(F.col("c_mktsegment"))
        .alias("b_seg"),
        F.when(F.col("c_custkey") % 7 == 0, F.col("c_acctbal") + F.lit(1000.0))
        .otherwise(F.col("c_acctbal"))
        .alias("b_bal"),
    )
    # pre-spread the single-row-group scan so the banded levenshteins
    # run corpus-wide (the in_transit_by_day lesson). threshold=2 runs
    # the banded DP (O(k·n) not O(n²)); the ≤2 boolean is what both
    # engines compare, so the oracle's plain levenshtein agrees.
    a = a.repartition(spark.sparkContext.defaultParallelism)
    return (
        a.join(b, ["nk", "sb"])
        .select(
            "a_key",
            "b_key",
            (F.levenshtein("a_name", "b_name", 2) >= 0).cast("int").alias("g_name"),
            (F.col("a_seg") == F.col("b_seg")).cast("int").alias("g_seg"),
            (F.col("a_bal") == F.col("b_bal")).cast("int").alias("g_bal"),
        )
    )


def _q_fs_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi–Sunter probabilistic record linkage with unsupervised EM
    (`dedup.fellegi_sunter_em`) — the canonical upgrade over
    `entity_resolution`'s hard edit-distance threshold: per-field
    m/u probabilities learned from the agreement-pattern table (2³
    patterns, driver-side integer-micro EM — the markov fixed-point
    boundary class), log-likelihood-ratio weights, match/possible/
    non-match decisions. Corpus contributes one pattern groupBy."""
    from morphik_core_spark.operators.dedup import fellegi_sunter_em

    pairs = _fs_linkage_pairs(spark, sf_dir)
    return fellegi_sunter_em(pairs, ["g_name", "g_seg", "g_bal"], iters=20)


def _fs_oracle_sql(iters: int = 20) -> str:
    """Generate the fs_record_linkage oracle: the pair/pattern CTEs plus
    ``iters`` unrolled EM rounds mirroring `dedup.fellegi_sunter_em`'s
    integer-micro recursion (the markov_attribution generator pattern).
    Every cross-pattern sum is integer micro-units, every learned
    parameter is ROUND(,12)+clamped per round — expression trees match
    the Python EM verbatim."""
    k = 3
    fields = ["g1", "g2", "g3"]
    clamp = lambda x: f"LEAST(GREATEST(ROUND({x}, 12), 1e-9), 1.0 - 1e-9)"

    def prod(params: str, vals: list[str]) -> str:
        # p * f1 * f2 * f3, left-assoc like the Python loop
        out = params
        for i, f in enumerate(fields):
            out = f"({out} * (CASE WHEN {f} = 1 THEN {vals[i]} ELSE 1.0 - {vals[i]} END))"
        return out

    rounds = []
    prev = "r0"
    for t in range(1, iters + 1):
        pm = prod("p", ["m1", "m2", "m3"])
        pu = prod("(1.0 - p)", ["u1", "u2", "u3"])
        w = f"CAST(ROUND({pm} / ({pm} + {pu}) * 1e6) AS BIGINT)"
        # GREATEST(..., 1) mirrors the Python EM's wsum/lsum floor (the
        # degenerate-posterior divide-by-zero guard); a no-op whenever
        # the sums are positive, so non-degenerate parity is unchanged
        msel = ", ".join(
            clamp(
                f"CAST(SUM(CASE WHEN {f} = 1 THEN w * c ELSE 0 END) AS DOUBLE) "
                f"/ CAST(GREATEST(SUM(w * c), 1) AS DOUBLE)"
            )
            + f" AS m{i+1}"
            for i, f in enumerate(fields)
        )
        usel = ", ".join(
            clamp(
                f"CAST(SUM(CASE WHEN {f} = 1 THEN (1000000 - w) * c ELSE 0 END) AS DOUBLE) "
                f"/ CAST(GREATEST(SUM((1000000 - w) * c), 1) AS DOUBLE)"
            )
            + f" AS u{i+1}"
            for i, f in enumerate(fields)
        )
        psel = clamp(
            "CAST(GREATEST(SUM(w * c), 1) AS DOUBLE) / CAST(SUM(c) * 1000000 AS DOUBLE)"
        ) + " AS p"
        rounds.append(
            f"r{t} AS MATERIALIZED (SELECT {psel}, {msel}, {usel} FROM ("
            f"SELECT g1, g2, g3, c, {w} AS w FROM pat CROSS JOIN {prev}))"
        )
        prev = f"r{t}"
    pm_f = prod("p", ["m1", "m2", "m3"])
    pu_f = prod("(1.0 - p)", ["u1", "u2", "u3"])
    w_f = f"CAST(ROUND({pm_f} / ({pm_f} + {pu_f}) * 1e6) AS BIGINT)"
    weight = " + ".join(
        f"(CASE WHEN {f} = 1 THEN ROUND(ln(m{i+1} / u{i+1}), 12) "
        f"ELSE ROUND(ln((1.0 - m{i+1}) / (1.0 - u{i+1})), 12) END)"
        for i, f in enumerate(fields)
    )
    return f"""
            WITH nsub AS (
                -- corpus-proportional sub-block count, mirrors the Spark
                -- fixture's max(count // 500, 1) (positive //, so DuckDB
                -- truncation == floor == Spark div here)
                SELECT GREATEST(count(*) // 500, 1) AS nb FROM customer
            ),
            a AS (
                SELECT c_custkey AS a_key, c_nationkey AS nk,
                       c_custkey % nb AS sb, c_name AS a_name,
                       c_mktsegment AS a_seg, c_acctbal AS a_bal
                FROM customer, nsub
            ),
            b AS (
                SELECT c_custkey AS b_key, c_nationkey AS nk,
                       c_custkey % nb AS sb,
                       substr(c_name, 1, CAST(c_custkey % length(c_name) AS INT))
                           || substr(c_name, CAST(c_custkey % length(c_name) AS INT) + 2) AS b_name,
                       CASE WHEN c_custkey % 5 = 0 THEN c_mktsegment || 'X'
                            ELSE c_mktsegment END AS b_seg,
                       CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 1000.0
                            ELSE c_acctbal END AS b_bal
                FROM customer, nsub WHERE c_custkey % 4 = 0
            ),
            pairs AS (
                SELECT CASE WHEN levenshtein(a_name, b_name) <= 2 THEN 1 ELSE 0 END AS g1,
                       CASE WHEN a_seg = b_seg THEN 1 ELSE 0 END AS g2,
                       CASE WHEN a_bal = b_bal THEN 1 ELSE 0 END AS g3
                FROM a JOIN b USING (nk, sb)
            ),
            pat AS MATERIALIZED (SELECT g1, g2, g3, CAST(count(*) AS BIGINT) AS c FROM pairs GROUP BY 1, 2, 3),
            r0 AS MATERIALIZED (SELECT {clamp('0.9')} AS m1, {clamp('0.9')} AS m2, {clamp('0.9')} AS m3,
                          {clamp('0.1')} AS u1, {clamp('0.1')} AS u2, {clamp('0.1')} AS u3,
                          {clamp('0.1')} AS p),
            {', '.join(rounds)},
            scored AS (
                SELECT g1 AS gamma_g_name, g2 AS gamma_g_seg, g3 AS gamma_g_bal,
                       c AS n_pairs,
                       ROUND(CAST({w_f} AS DOUBLE) / 1e6, 6) AS match_posterior,
                       ROUND(ROUND({weight}, 9), 6) AS weight,
                       ROUND(m1, 6) AS m_g_name, ROUND(m2, 6) AS m_g_seg, ROUND(m3, 6) AS m_g_bal,
                       ROUND(u1, 6) AS u_g_name, ROUND(u2, 6) AS u_g_seg, ROUND(u3, 6) AS u_g_bal,
                       ROUND({weight}, 9) AS _w9
                FROM pat CROSS JOIN r{iters}
            )
            SELECT gamma_g_name, gamma_g_seg, gamma_g_bal, n_pairs, match_posterior, weight,
                   CASE WHEN _w9 >= 3.0 THEN 'match'
                        WHEN _w9 >= 0.0 THEN 'possible'
                        ELSE 'non_match' END AS decision,
                   m_g_name, m_g_seg, m_g_bal, u_g_name, u_g_seg, u_g_bal
            FROM scored
            ORDER BY weight DESC, gamma_g_name ASC, gamma_g_seg ASC, gamma_g_bal ASC
        """


def _q_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword extraction (`text_analysis.textrank_keywords`):
    PageRank over the adjacent-token co-occurrence graph, top-20 terms
    — the graph-centrality keyword signal beside `tfidf_topterms` and
    `pmi_bigrams`. Vocabulary²-bounded edge list; the integer-micro
    pagerank fixed point unrolls into the oracle's CTE rounds."""
    from morphik_core_spark.operators.text_analysis import textrank_keywords

    docs = _t(spark, sf_dir, "documents")
    return textrank_keywords(docs, "text", top_n=20, iterations=3)


def _q_nelson_aalen_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson–Aalen cumulative hazard (`analytics.nelson_aalen`) over
    the same 6-hour-gap sessions as `session_survival` — the additive
    hazard scale the log-rank test lives on, beside KM's multiplicative
    survival. Grid windows over distinct durations; d/n and d/n² terms
    1e12-quantized before the prefix sums."""
    from pyspark.sql import Window

    from morphik_core_spark.operators.analytics import nelson_aalen

    events = _t(spark, sf_dir, "events")
    us = F.expr("unix_micros(ts)")
    worder = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag(us).over(worder)
    new_sess = (prev.isNull() | ((us - prev) > 21600 * 1_000_000)).cast("int")
    sid = F.sum(new_sess).over(
        worder.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ses = (
        events.select("user_id", "event_id", "ts", sid.alias("sid"))
        .groupBy("user_id", "sid")
        .agg(
            F.count(F.lit(1)).alias("n_ev"),
            F.max(F.expr("unix_micros(ts)")).alias("last_us"),
        )
    )
    mx = events.agg(F.max(F.expr("unix_micros(ts)")).alias("_m"))
    subjects = ses.join(F.broadcast(mx)).select(
        F.col("n_ev").alias("dur"),
        F.when(F.col("_m") - F.col("last_us") < 86400 * 1_000_000, F.lit(0))
        .otherwise(F.lit(1))
        .alias("ev"),
    )
    return nelson_aalen(subjects, "dur", "ev")


def _q_corr_matrix_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass Pearson correlation matrix (`analytics.corr_matrix`)
    over four lineitem numerics — the profiling sweep that would
    otherwise rescan the fact table k(k−1)/2 times. Int64 products,
    DECIMAL(38,0) accumulations, one double division per pair."""
    from morphik_core_spark.operators.analytics import corr_matrix

    li = _t(spark, sf_dir, "lineitem")
    return corr_matrix(
        li,
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        scales=[1, 100, 100, 100],
    )


def _q_power_mde_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation minimum detectable effect (`analytics.ab_power_mde`)
    for an even two-arm split of order values at α=0.05 / 80% power —
    the experiment-design readout that belongs BEFORE `fdr_nation_ab`
    ever runs (a 3% hoped-for lift against a 9% MDE is a wasted test).
    Exact integer moments, IEEE z-constant literals."""
    from morphik_core_spark.operators.analytics import ab_power_mde

    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    base = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .select(F.col("n_name").alias("nation"), F.col("o_totalprice").alias("v"))
    )
    return ab_power_mde(base, "nation", "v", value_scale=100)


def _textrank_oracle(iterations: int = 3, damping_pct: int = 85, top_n: int = 20) -> str:
    """DuckDB twin of `text_analysis.textrank_keywords`: the word
    co-occurrence edge CTE + the `_pagerank_oracle` round template over
    VARCHAR nodes."""
    from morphik_core_spark.operators.graph import UNIT

    teleport_u = (UNIT * (100 - damping_pct)) // 100
    ctes = [
        """arr AS (
            SELECT list_filter(regexp_split_to_array(lower(text), '\\s+'),
                               x -> length(x) >= 3) AS a
            FROM documents
        )""",
        "base AS (SELECT a FROM arr WHERE len(a) >= 2)",
        """tok_pairs AS (
            SELECT a[i] AS w1, a[i + 1] AS w2
            FROM base, unnest(range(1, CAST(len(a) AS BIGINT))) AS t(i)
        )""",
        """und AS (
            SELECT least(w1, w2) AS a, greatest(w1, w2) AS b, count(*) AS w
            FROM tok_pairs WHERE w1 <> w2 GROUP BY 1, 2
        )""",
        "edges AS (SELECT a AS src, b AS dst, w FROM und UNION ALL SELECT b, a, w FROM und)",
        "nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges)",
        "nn AS (SELECT count(*) AS n_nodes FROM nodes)",
        "ow AS (SELECT src, CAST(SUM(w) AS BIGINT) AS out_w FROM edges GROUP BY src)",
        "ew AS (SELECT src, dst, w, out_w FROM edges JOIN ow USING (src))",
        f"r0 AS (SELECT node, CAST({UNIT} AS BIGINT) // n_nodes AS rank_u FROM nodes, nn)",
    ]
    for i in range(1, iterations + 1):
        ctes.append(
            f"""c{i} AS (
                SELECT dst AS node, CAST(SUM((rank_u * w) // out_w) AS BIGINT) AS c_sum
                FROM r{i - 1} r JOIN ew ON r.node = ew.src GROUP BY dst
            )"""
        )
        ctes.append(
            f"""r{i} AS (
                SELECT n.node,
                       CAST({teleport_u} AS BIGINT) // nn.n_nodes +
                       ({damping_pct} * coalesce(c_sum, CAST(0 AS BIGINT))) // 100 AS rank_u
                FROM nodes n LEFT JOIN c{i} ON n.node = c{i}.node, nn
            )"""
        )
    return (
        "WITH " + ",\n".join(ctes) + f"""
        SELECT node AS term, rank_u,
               ROUND(CAST(rank_u AS DOUBLE) / {UNIT}.0, 6) AS rank
        FROM r{iterations}
        ORDER BY rank_u DESC, term ASC LIMIT {top_n}
    """
    )


_TRAINER_EXPORT_CLEANUP_REGISTERED: set = set()


def _trainer_export_cleanup(tmp: str) -> None:
    """Temp-disk hygiene for the trainer-export slot: register THIS
    process's export dir for removal at interpreter exit (once per
    path), and sweep sibling ``trainer_export_*_<pid>`` dirs whose
    owning process is gone — crashed drivers never ran their atexit, and
    nothing else ever deletes their dirs."""
    import atexit
    import re
    import shutil
    import tempfile

    if tmp not in _TRAINER_EXPORT_CLEANUP_REGISTERED:
        _TRAINER_EXPORT_CLEANUP_REGISTERED.add(tmp)
        atexit.register(shutil.rmtree, tmp, ignore_errors=True)
    parent = tempfile.gettempdir()
    pat = re.compile(r"^trainer_export_[0-9a-f]{12}_(\d+)$")
    try:
        names = os.listdir(parent)
    except OSError:
        return
    for name in names:
        m = pat.match(name)
        if not m or int(m.group(1)) == os.getpid():
            continue
        try:
            os.kill(int(m.group(1)), 0)
        except ProcessLookupError:
            shutil.rmtree(os.path.join(parent, name), ignore_errors=True)
        except OSError:
            # PermissionError etc.: pid exists (another user's live
            # process) — leave its dir alone.
            continue


def _q_trainer_export_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end trainer-delivery audit: export the documents table as
    TFRecord (framed tf.train.Example) AND WebDataset (POSIX tar)
    shards, read both back through their scans, and emit per-format
    (n_records, n_distinct_keys, total_chars). The export→read
    composition is the identity, so the oracle is the same rollup
    straight off the source table — any framing/protobuf/tar defect or
    lost row breaks the match. (`sources/tfrecord`, `sources/webdataset`.)

    The export must materialize before the read-back scan, so the
    writes run here rather than lazily — into a per-(sf_dir, process)
    directory, wiped before each export: deterministic WITHIN a process
    (repeated runs in one bench/correctness session reuse the slot, no
    mkdtemp leak) but keyed by pid so concurrent gates over the same
    sf_dir never wipe each other's shards mid-read, and not guessable
    by another user on a shared host (the dir is created 0700 fresh).
    The pid key alone would leak one dir per driver process, so the dir
    is rmtree'd at process exit (atexit — the returned DataFrame is
    collected lazily AFTER this function returns, so in-function
    deletion would race the read-back), and dirs left by CRASHED
    processes (atexit never ran) are swept here by pid liveness."""
    import hashlib as _hashlib
    import shutil
    import tempfile

    from morphik_core_spark.sources.tfrecord import (
        read_tfrecord_shards,
        write_tfrecord_shards,
    )
    from morphik_core_spark.sources.webdataset import (
        read_webdataset_shards,
        write_webdataset_shards,
    )

    docs = _t(spark, sf_dir, "documents")
    slot = _hashlib.md5(sf_dir.encode("utf-8")).hexdigest()[:12]
    tmp = os.path.join(
        tempfile.gettempdir(), f"trainer_export_{slot}_{os.getpid()}"
    )
    _trainer_export_cleanup(tmp)
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, mode=0o700)
    write_tfrecord_shards(
        docs, f"{tmp}/tfr", "doc_id", "text", n_shards=8, meta_cols=["source"]
    ).collect()
    write_webdataset_shards(
        docs, f"{tmp}/wds", "doc_id", {"text": "txt", "source": "cls"}, n_shards=8
    ).collect()
    tfr = read_tfrecord_shards(spark, f"{tmp}/tfr").filter(F.col("error").isNull())
    wds = read_webdataset_shards(spark, f"{tmp}/wds", ["txt"]).filter(
        F.col("error").isNull()
    )

    def rollup(df, key, text, fmt):
        return df.agg(
            F.lit(fmt).alias("format"),
            F.count(F.lit(1)).alias("n_records"),
            F.count_distinct(F.col(key)).alias("n_distinct_keys"),
            F.sum(F.length(F.col(text))).alias("total_chars"),
        ).select("format", "n_records", "n_distinct_keys", "total_chars")

    return (
        rollup(tfr, "key", "text", "tfrecord")
        .unionByName(rollup(wds, "key", "txt", "webdataset"))
        .orderBy("format")
    )


def _q_schema_drift_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payload schema drift (`validation.schema_drift`): the event
    props payload is synthesized with a DELIBERATE shape change between
    the two month halves — a key removed (`legacy`), a key added
    (`newf`), a type flip (`m`: numeric→string) — and the detector must
    label every key correctly while `k`/`u` stay stable. The alert an
    ingestion pipeline raises when an upstream producer silently
    changes its payload."""
    from morphik_core_spark.operators.validation import schema_drift

    events = _t(spark, sf_dir, "events")
    k = F.expr("get_json_object(props, '$.k')")
    u_part = F.when(
        F.col("user_id") % 3 == 0,
        F.concat(F.lit(',"u":"u'), F.col("user_id").cast("string"), F.lit('"')),
    ).otherwise(F.lit(""))

    def payload(first_half: bool):
        legacy = F.lit(',"legacy":"1"') if first_half else F.lit("")
        newf = F.lit("") if first_half else F.concat(F.lit(',"newf":'), k)
        m = (
            F.concat(F.lit(',"m":'), k)
            if first_half
            else F.concat(F.lit(',"m":"x'), k, F.lit('"'))
        )
        return F.concat(F.lit('{"k":'), k, u_part, legacy, newf, m, F.lit("}"))

    cut = F.lit("2024-01-16 00:00:00").cast("timestamp")
    old = events.filter(F.col("ts") < cut).select(payload(True).alias("js"))
    new = events.filter(F.col("ts") >= cut).select(payload(False).alias("js"))
    return schema_drift(old, new, "js", min_rate_delta=0.05)


def _q_ivm_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental join-view maintenance (`incremental.
    incremental_join_apply`): a materialized orders⋈customer view
    absorbs a synthesized I/U/D order batch (orderkey%10: 0→D, 1→U
    re-pointed to a rotated customer, 3→I as shifted new keys) with
    delta-sized work — one touched-key anti join + a delta⋈customer
    equi-join, never an |A|×|B| re-join. merge == recompute is the
    oracle (the CDC applied in SQL, then joined fresh); emitted as the
    per-nation rollup of the maintained view so the check spans every
    op path."""
    from morphik_core_spark.operators.incremental import incremental_join_apply

    from morphik_core_spark.plans.cache import scoped_persist

    # the snapshot feeds the view build, three delta branches, and the
    # merge's anti-join - persist the pruned projection once
    orders = scoped_persist(_t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    ))
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    joined = orders.join(
        cust, orders["o_custkey"] == cust["c_custkey"]
    ).select("o_orderkey", "o_custkey", "o_totalprice", "c_nationkey")

    ten = F.col("o_orderkey") % 10
    deletes = orders.filter(ten == 0).withColumn("op", F.lit("D"))
    updates = (
        orders.filter(ten == 1)
        .select(
            "o_orderkey",
            (F.col("o_custkey") % 100 + 1).alias("o_custkey"),
            (F.col("o_totalprice") * F.lit(1.1)).alias("o_totalprice"),
        )
        .withColumn("op", F.lit("U"))
    )
    inserts = (
        orders.filter(ten == 3)
        .select(
            (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
            "o_custkey",
            "o_totalprice",
        )
        .withColumn("op", F.lit("I"))
    )
    delta = deletes.unionByName(updates).unionByName(inserts)
    b_view = cust.withColumnRenamed("c_custkey", "o_custkey")
    maintained = incremental_join_apply(joined, delta, b_view, "o_orderkey", "o_custkey")
    return (
        maintained.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.expr(
                "CAST(SUM(CAST(ROUND(CAST(o_totalprice AS DOUBLE) * 100) AS BIGINT)) AS BIGINT)"
            ).alias("rev_cents"),
        )
        .orderBy("c_nationkey")
    )


def _q_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based join-cardinality estimation (`sketches.
    cms_join_size_estimate`): the lineitem⋈lineitem self-join size on
    partkey (Σ c_p² — the skew-sensitive blowup an optimizer must
    predict) estimated from two 3×64 count-min sketches via the CMS
    inner product, beside the exact value — always an upper bound,
    collisions only add. The corpus contributes one per-key count
    aggregation per side; the inner product is (depth×width)-bounded."""
    from morphik_core_spark.operators.sketches import cms_join_size_estimate

    li = _t(spark, sf_dir, "lineitem")
    counts = li.groupBy(F.col("l_partkey").cast("string").alias("k")).agg(
        F.count(F.lit(1)).alias("c")
    )
    return cms_join_size_estimate(counts, counts, "k", "c", depth=3, width=64)


def _q_twap_event_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (`analytics.time_weighted_average`): per
    event type, the LOCF step-integral mean of the value stream beside
    the sample mean — the TimescaleDB time_weight operator, correct
    where plain AVG is density-biased. Exact integer cents × integer
    microsecond durations in DECIMAL(38,0), one division per key."""
    from morphik_core_spark.operators.analytics import time_weighted_average

    events = _t(spark, sf_dir, "events")
    return time_weighted_average(events, ["event_type"], "ts", "value", value_scale=100)


def _q_ohlc_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC candlesticks (`analytics.ohlc_rollup`) of the event
    value stream per type — the canonical sampled-stream downsampling
    beside `twap_event_value`'s step integral. (ts, value)-ordered
    open/close with deterministic ties; windows partition per
    (key, bucket)."""
    from morphik_core_spark.operators.analytics import ohlc_rollup

    events = _t(spark, sf_dir, "events")
    return ohlc_rollup(events, ["event_type"], "ts", "value", bucket_seconds=86400)


def _q_kruskal_doclen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal–Wallis rank test (`analytics.kruskal_wallis`): do
    document lengths differ across languages / sources — the
    nonparametric twin of `anova_doclen`, robust to the heavy length
    tails `hill_tail` diagnoses. Pooled grid ranks (no row sort),
    per-group R²/n micro-quantized, exact DECIMAL tie correction."""
    from morphik_core_spark.operators.analytics import kruskal_wallis

    docs = _t(spark, sf_dir, "documents")
    # collected-grid fast path: the (lang|source, n_chars) grid is
    # char-grain-bounded (distinct doc lengths saturate; 2k/10k cells at
    # sf0.1), so ONE collect replaces ~30 scheduled bounded-frame stages
    # per call; the bound RAISES if the contract is ever violated.
    by_lang = kruskal_wallis(
        docs, "lang", "n_chars", collect_max_cells=1_000_000
    ).withColumn("split", F.lit("by_lang"))
    by_source = kruskal_wallis(
        docs, "source", "n_chars", collect_max_cells=1_000_000
    ).withColumn("split", F.lit("by_source"))
    return (
        by_lang.unionByName(by_source)
        .select("split", "k", "n", "h_stat", "h_tie_corrected")
        .orderBy("split")
    )


def _q_levene_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levene homogeneity-of-variance test (`analytics.levene_test`,
    mean-centered): does account-balance SPREAD differ across market
    segments — the dispersion screen `anova_doclen`'s mean test can't
    see, and the precondition check for its equal-variance assumption.
    Per-group means micro-quantized so deviations are exact integers;
    ANOVA closed forms over the deviations."""
    from morphik_core_spark.operators.analytics import levene_test

    cust = _t(spark, sf_dir, "customer")
    return levene_test(cust, "c_mktsegment", "c_acctbal", value_scale=100)


def _q_ljung_box_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung–Box white-noise Q test (`analytics.ljung_box`) over daily
    event volume, lags 1..7 — the one-number joint readout on top of
    `acf_daily`'s per-lag screen. ρ from the shared integer-deviation
    ACF at 12 decimals; per-lag terms ROUND(·1e12)-quantized before the
    reduction."""
    from morphik_core_spark.operators.analytics import ljung_box

    events = _t(spark, sf_dir, "events")
    daily = events.groupBy(
        F.expr("unix_micros(ts) div 86400000000").alias("di")
    ).agg(F.count(F.lit(1)).alias("x"))
    # bounded-day-grid contract (see acf_daily): the collected ACF turns
    # the per-lag chain into a literal frame; only the n aggregate and
    # the 7-row term reduction stay in-plan
    return ljung_box(daily, "di", "x", max_lag=7, collect_max_points=100_000)


def _q_ipw_ate_doclen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified-propensity IPW treatment effects (`analytics.ipw_ate`):
    the effect of coming from source 'src1' on document length,
    controlling for language (strata = lang, the discrete propensity
    classes) — the third causal leg beside `cem_att_balance` (matching)
    and `did_effect` (panel). Per-stratum mean diffs micro-quantized;
    both weighted reductions are integer cross-stratum sums."""
    from morphik_core_spark.operators.analytics import ipw_ate

    docs = _t(spark, sf_dir, "documents")
    return ipw_ate(
        docs.withColumn("treated", F.col("source") == F.lit("src1")),
        "lang",
        "treated",
        "n_chars",
    )


def _q_ivm_join_b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric-side incremental join-view maintenance (`incremental.
    incremental_join_apply_delta_b`): the SAME materialized
    orders⋈customer view as `ivm_join`, now absorbing a CDC batch on
    the DIMENSION side (custkey%10: 0→D — every order of the customer
    leaves the view, 1→U — nation re-pointed, fan-out re-join, 3→I as
    shifted new keys that match nothing). Eviction on the join key
    covers the dimension fan-out in one anti join; the re-add probes
    facts with the delta-sized upsert set. merge == recompute is the
    oracle; per-nation rollup spans every op path."""
    from morphik_core_spark.operators.incremental import (
        incremental_join_apply_delta_b,
    )

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    from morphik_core_spark.plans.cache import scoped_persist

    # the dim side feeds the view build, three delta branches, and the
    # merge - persist the pruned projection once
    cust = scoped_persist(
        _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    )
    b_view = cust.withColumnRenamed("c_custkey", "o_custkey")
    joined = orders.join(b_view, "o_custkey").select(
        "o_orderkey", "o_custkey", "o_totalprice", "c_nationkey"
    )
    ten = F.col("o_custkey") % 10
    deletes = b_view.filter(ten == 0).withColumn("op", F.lit("D"))
    updates = (
        b_view.filter(ten == 1)
        .select("o_custkey", ((F.col("c_nationkey") + 7) % 25).alias("c_nationkey"))
        .withColumn("op", F.lit("U"))
    )
    inserts = (
        b_view.filter(ten == 3)
        .select(
            (F.col("o_custkey") + 20_000_000).alias("o_custkey"), "c_nationkey"
        )
        .withColumn("op", F.lit("I"))
    )
    delta_b = deletes.unionByName(updates).unionByName(inserts)
    maintained = incremental_join_apply_delta_b(joined, orders, delta_b, "o_custkey")
    return (
        maintained.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.expr(
                "CAST(SUM(CAST(ROUND(CAST(o_totalprice AS DOUBLE) * 100) AS BIGINT)) AS BIGINT)"
            ).alias("rev_cents"),
        )
        .orderBy("c_nationkey")
    )


def _q_silhouette_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified silhouette per label cluster (`embedding_stats.
    simplified_silhouette`): distance to own vs nearest-other exact
    integer centroid, s = (b−a)/max(a,b) micro-quantized per vector —
    the cluster-quality scalar beside `centroid_assignments`' confusion
    counts. Squared distances are exact int64 (quantized components,
    re-quantized centroids); one broadcast nested-loop vs the 10
    centroids."""
    from morphik_core_spark.operators.embedding_stats import simplified_silhouette

    emb = _t(spark, sf_dir, "embeddings")
    return simplified_silhouette(emb, dims=64)


def _q_rbo_rankings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap (`ml_eval.rank_biased_overlap`, Webber et
    al. 2010) between the top-100 revenue-customer rankings of the two
    order-date halves — "is the leaderboard stable period over period",
    the two-list agreement measure `ranking_quality` (one list vs
    judgments) can't express. Prefix intersections telescope to one
    weight-spine lookup on max(rank_a, rank_b); p^d built by iterative
    IEEE multiplies shared verbatim with the oracle."""
    from morphik_core_spark.operators.ml_eval import rank_biased_overlap

    orders = _t(spark, sf_dir, "orders")
    cut = F.lit("1998-05-01").cast("date")

    def ranked(filtered):
        rev = filtered.groupBy(F.col("o_custkey").alias("k")).agg(
            F.expr(
                "CAST(SUM(CAST(ROUND(CAST(o_totalprice AS DOUBLE) * 100) AS BIGINT)) AS BIGINT)"
            ).alias("rev")
        )
        from pyspark.sql import Window as W

        return rev.select(
            "k",
            F.row_number()
            .over(W.orderBy(F.col("rev").desc(), F.col("k").asc()))
            .alias("rnk"),
        )

    h1 = ranked(orders.filter(F.col("o_orderdate") < cut))
    h2 = ranked(orders.filter(F.col("o_orderdate") >= cut))
    return rank_biased_overlap(h1, h2, "k", "rnk", k=100, p=0.9)


def _rbo_oracle_sql() -> str:
    """Generate the rbo_rankings oracle with the SAME pico-quantized
    weight spine `ml_eval.rbo_weights` feeds the Spark side (iterative
    IEEE p-powers — never pow), so both engines reduce identical
    integers."""
    from morphik_core_spark.operators.ml_eval import rbo_weights

    w_u = rbo_weights(100, 0.9)
    values = ", ".join(f"({m + 1}, {w})" for m, w in enumerate(w_u))
    one_minus_p = repr(1.0 - 0.9)
    return f"""
            WITH h1 AS (
                SELECT o_custkey AS k,
                       CAST(SUM(CAST(ROUND(CAST(o_totalprice AS DOUBLE) * 100) AS BIGINT)) AS BIGINT) AS rev
                FROM orders WHERE o_orderdate < DATE '1998-05-01' GROUP BY 1
            ),
            r1 AS (SELECT k, row_number() OVER (ORDER BY rev DESC, k ASC) AS rnk FROM h1),
            h2 AS (
                SELECT o_custkey AS k,
                       CAST(SUM(CAST(ROUND(CAST(o_totalprice AS DOUBLE) * 100) AS BIGINT)) AS BIGINT) AS rev
                FROM orders WHERE o_orderdate >= DATE '1998-05-01' GROUP BY 1
            ),
            r2 AS (SELECT k, row_number() OVER (ORDER BY rev DESC, k ASC) AS rnk FROM h2),
            inter AS (
                SELECT greatest(a.rnk, b.rnk) AS m
                FROM r1 a JOIN r2 b USING (k)
                WHERE a.rnk <= 100 AND b.rnk <= 100
            ),
            w(m, wu) AS (VALUES {values}),
            agg AS (
                SELECT count(*) AS n_overlap, SUM(wu) AS su
                FROM inter JOIN w USING (m)
            )
            SELECT CAST(100 AS BIGINT) AS k,
                   CAST(coalesce(n_overlap, 0) AS BIGINT) AS n_overlap,
                   ROUND(({one_minus_p}) * CAST(coalesce(su, 0) AS DOUBLE) / 1e12, 6) AS rbo
            FROM agg
        """


def _q_pit_state_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join (`asof.pit_join`) of offset observations to
    the SCD2 history `scd2_intervals` reconstructs: each probe (every
    10th event's timestamp + 30 minutes) picks the event_type version
    VALID at that instant — the warehouse "what did the dimension say
    when this fact happened" contract, keyed equi-join + interval
    filter (never a cartesian; versions per user are history-bounded).
    Rolled up per matched state; probes before a user's first interval
    surface as the NULL row."""
    from morphik_core_spark.operators.asof import pit_join
    from morphik_core_spark.operators.sessions import change_intervals

    events = _t(spark, sf_dir, "events")
    dim = change_intervals(events, "user_id", "ts", "event_id", "event_type").select(
        "user_id", "event_type", "valid_from", "valid_to"
    )
    obs = events.filter(F.col("event_id") % 10 == 7).select(
        "user_id", (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("ots")
    )
    j = pit_join(obs, dim, "user_id", "ots")
    return (
        j.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_obs"))
        .orderBy("event_type")
    )


def _q_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth fit (`text_analysis.heaps_law_fit`)
    over word TRIGRAMS: β and ln K from the cumulative (shingles seen,
    distinct shingles) curve at 10 doc-id checkpoints — the growth dual
    of `zipf_audit`'s frequency exponent and the vocab-sizing input for
    scale planning. Trigrams because the synthetic corpus' unigram
    vocabulary saturates in the first checkpoint (31 terms — measured)
    while the combinatorial shingle vocab genuinely grows. First-seen
    doc per shingle replaces any corpus sort; quantized-ln OLS via
    grouped_ols."""
    from morphik_core_spark.operators.text_analysis import heaps_law_fit

    docs = _t(spark, sf_dir, "documents")
    return heaps_law_fit(docs, ngram=3)


def _q_ipf_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPF raking (`curation.ipf_raking`): cell weights balancing the
    corpus to uniform lang AND source marginals simultaneously — the
    joint-reweighting upgrade over `mixture_sample`'s one-dimensional
    rates (fixing one marginal un-fixes the other; raking alternates to
    the joint fixed point). Bounded cell table, driver-side integer-
    micro recursion, unrolled MATERIALIZED-CTE oracle."""
    from morphik_core_spark.operators.curation import ipf_raking

    docs = _t(spark, sf_dir, "documents")
    return ipf_raking(docs, "lang", "source", iters=10)


def _ipf_oracle_sql(iters: int = 10) -> str:
    """Generate the ipf_mixture oracle: the cell CTE plus ``iters``
    unrolled raking rounds (row half-step then column half-step per
    round, each MATERIALIZED — the FS-EM generator pattern) mirroring
    `curation.ipf_raking`'s integer-micro recursion expression tree."""
    rounds = []
    prev = "r0"
    for t in range(1, iters + 1):
        rounds.append(
            f"a{t} AS MATERIALIZED ("
            f"SELECT x.r, x.c, x.n, "
            f"CAST(ROUND(CAST(x.w AS DOUBLE) * CAST(tot.m AS DOUBLE) / "
            f"(CAST(d.nr AS DOUBLE) * CAST(GREATEST(mg.mk, 1) AS DOUBLE))) AS BIGINT) AS w "
            f"FROM {prev} x "
            f"JOIN (SELECT r, SUM(n * w) AS mk FROM {prev} GROUP BY 1) mg USING (r) "
            f"CROSS JOIN (SELECT SUM(n * w) AS m FROM {prev}) tot "
            f"CROSS JOIN dims d)"
        )
        rounds.append(
            f"r{t} AS MATERIALIZED ("
            f"SELECT x.r, x.c, x.n, "
            f"CAST(ROUND(CAST(x.w AS DOUBLE) * CAST(tot.m AS DOUBLE) / "
            f"(CAST(d.nc AS DOUBLE) * CAST(GREATEST(mg.mk, 1) AS DOUBLE))) AS BIGINT) AS w "
            f"FROM a{t} x "
            f"JOIN (SELECT c, SUM(n * w) AS mk FROM a{t} GROUP BY 1) mg USING (c) "
            f"CROSS JOIN (SELECT SUM(n * w) AS m FROM a{t}) tot "
            f"CROSS JOIN dims d)"
        )
        prev = f"r{t}"
    return f"""
            WITH cells AS MATERIALIZED (
                SELECT CAST(lang AS VARCHAR) AS r, CAST(source AS VARCHAR) AS c,
                       CAST(count(*) AS BIGINT) AS n
                FROM documents GROUP BY 1, 2
            ),
            dims AS MATERIALIZED (
                SELECT CAST(count(DISTINCT r) AS BIGINT) AS nr,
                       CAST(count(DISTINCT c) AS BIGINT) AS nc
                FROM cells
            ),
            r0 AS MATERIALIZED (SELECT r, c, n, CAST(1000000 AS BIGINT) AS w FROM cells),
            {', '.join(rounds)},
            tot AS (SELECT SUM(n * w) AS m FROM r{iters})
            SELECT r AS lang, c AS source, n AS n_rows,
                   ROUND(CAST(w AS DOUBLE) / 1e6, 6) AS weight,
                   ROUND(CAST(n * w AS DOUBLE) / CAST(m AS DOUBLE), 6) AS weighted_share
            FROM r{iters} CROSS JOIN tot ORDER BY 1, 2
        """


def _q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation (`validation.table_diff`): diff the
    orders table against a synthesized later snapshot (every 10th key:
    0→removed, 1→price+priority changed, 5→custkey changed, 3→new keys
    added) and roll up (change_type, changed-column set) counts — the
    audit a migration/backfill runs before cutover, row-level
    complement of `schema_drift_props`. One full-outer shuffle join on
    the key; NULL-safe column compares."""
    from morphik_core_spark.operators.validation import table_diff

    from morphik_core_spark.plans.cache import scoped_persist

    # snapshot A feeds itself plus four synthesized snapshot-B branches
    # and the diff join - persist the pruned projection once
    orders = scoped_persist(_t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    ))
    ten = F.col("o_orderkey") % 10
    keep = orders.filter((ten != 0) & (ten != 1) & (ten != 5))
    upd1 = orders.filter(ten == 1).select(
        "o_orderkey",
        "o_custkey",
        (F.col("o_totalprice") * F.lit(1.1)).alias("o_totalprice"),
        F.concat(F.lit("X-"), F.col("o_orderpriority")).alias("o_orderpriority"),
    )
    upd5 = orders.filter(ten == 5).select(
        "o_orderkey",
        (F.col("o_custkey") + 1).alias("o_custkey"),
        "o_totalprice",
        "o_orderpriority",
    )
    ins = orders.filter(ten == 3).select(
        (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
        "o_custkey",
        "o_totalprice",
        "o_orderpriority",
    )
    snap_b = keep.unionByName(upd1).unionByName(upd5).unionByName(ins)
    d = table_diff(orders, snap_b, ["o_orderkey"])
    return (
        d.groupBy(
            "change_type", F.array_join("changed_cols", ",").alias("cols")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("change_type", "cols")
    )


def _q_linkage_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual-best one-to-one assignment (`dedup.mutual_best_match`)
    over the shared sub-blocked linkage pairs: score = 4·name + 2·seg +
    bal agreement, keep pairs where each side is the other's rounded-
    argmax best — the assignment step that turns `fs_record_linkage`'s
    match scores into an entity mapping. Emits the audit row
    (n_matches, n_true, match_precision); truth = same custkey."""
    from morphik_core_spark.operators.dedup import mutual_best_match

    pairs = _fs_pairs_from(_t(spark, sf_dir, "customer"))
    scored = pairs.select(
        "a_key",
        "b_key",
        (4 * F.col("g_name") + 2 * F.col("g_seg") + F.col("g_bal")).alias("score"),
    )
    m = mutual_best_match(scored, "a_key", "b_key", "score", min_score=1)
    return m.agg(
        F.count(F.lit(1)).alias("n_matches"),
        F.sum(F.when(F.col("a_key") == F.col("b_key"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_true"),
        F.round(
            F.expr(
                "CAST(SUM(CASE WHEN a_key = b_key THEN 1 ELSE 0 END) AS DOUBLE) "
                "/ CAST(count(1) AS DOUBLE)"
            ),
            6,
        ).alias("match_precision"),
    )


def _q_embedding_drift_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding drift (`embedding_stats.embedding_drift`)
    between the even- and odd-id halves of the embedding table — the
    retrain monitor for "which class prototypes moved" beside
    `vocab_drift`'s term-space shift. Exact integer centroids on the
    2^20 grid; sqrt is the only float."""
    from morphik_core_spark.operators.embedding_stats import embedding_drift

    emb = _t(spark, sf_dir, "embeddings")
    return embedding_drift(
        emb.filter(F.col("vec_id") % 2 == 0),
        emb.filter(F.col("vec_id") % 2 == 1),
        dims=64,
    )


def _q_mann_whitney_doclen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U test (`analytics.mann_whitney_u`): do en and de
    document lengths come from the same distribution — the two-sample
    rank test between `ab_test`'s parametric z and `kruskal_doclen`'s
    k-group H (U is also n₁n₂·(1−AUC)). Pooled grid ranks, exact
    DECIMAL tie correction, A&S normal tail quantized to 1e-12."""
    from morphik_core_spark.operators.analytics import mann_whitney_u

    docs = _t(spark, sf_dir, "documents")
    # collected-grid fast path (kruskal_doclen's char-grain bound)
    return mann_whitney_u(
        docs, "lang", "n_chars", "en", "de", collect_max_cells=1_000_000
    )


def _q_dunn_doclen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunn's post-hoc pairwise rank tests (`analytics.dunn_posthoc`)
    across languages — WHICH pairs differ after `kruskal_doclen` says
    some do, with Benjamini–Hochberg correction over all pairs (the
    `fdr_nation_ab` step-up discipline). Pair frame is groups²-bounded;
    p quantized to integer picounits before the BH ranking."""
    from morphik_core_spark.operators.analytics import dunn_posthoc

    docs = _t(spark, sf_dir, "documents")
    # collected-grid fast path (kruskal_doclen's char-grain bound)
    return dunn_posthoc(docs, "lang", "n_chars", collect_max_cells=1_000_000)


def _q_overdispersion_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overdispersion screen (`analytics.overdispersion_screen`) of
    daily event counts per type: index of dispersion s²/x̄ and the
    (n−1)·D chi-square statistic — the Poisson sanity check before
    trusting rate-based monitors (`anomaly_stats`, `cusum_drift`) on a
    bursty stream. DECIMAL moments over the day-grid frame."""
    from morphik_core_spark.operators.analytics import overdispersion_screen

    events = _t(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.expr("unix_micros(ts) div 86400000000").alias("di")
    ).agg(F.count(F.lit(1)).alias("x"))
    return overdispersion_screen(daily, "event_type", "x")


def _mw_oracle_sql() -> str:
    """Generate the mann_whitney_doclen oracle with the exact z/p
    expression trees `analytics.mann_whitney_u` builds (shared A&S
    normal-tail template, tie-corrected variance)."""
    from morphik_core_spark.operators.analytics import _AS_NORMAL_SF

    u1 = "(CAST(s21 AS DOUBLE) / 2.0 - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1.0) / 2.0)"
    nn = "(CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))"
    var = (
        f"(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0 * "
        f"(({nn} + 1.0) - CAST(tt AS DOUBLE) / ({nn} * ({nn} - 1.0))))"
    )
    z = f"(({u1} - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0) / sqrt({var}))"
    p = f"(2.0 * {_AS_NORMAL_SF.format(z=f'abs({z})')})"
    return f"""
            WITH src AS (
                SELECT lang AS g, CAST(n_chars AS BIGINT) AS v
                FROM documents WHERE n_chars IS NOT NULL AND lang IN ('en', 'de')
            ),
            grid AS (SELECT v, count(*) AS c FROM src GROUP BY 1),
            rg AS (
                SELECT v, 2 * (SUM(c) OVER (ORDER BY v ASC ROWS UNBOUNDED PRECEDING) - c)
                          + c + 1 AS r2
                FROM grid
            ),
            rj AS (SELECT s.g, r.r2 FROM src s JOIN rg r ON s.v = r.v),
            per AS (SELECT g, count(*) AS ng, CAST(sum(r2) AS HUGEINT) AS s2 FROM rj GROUP BY 1),
            ties AS (SELECT SUM(CAST(c AS HUGEINT) * c * c - c) AS tt FROM grid),
            agg AS (
                SELECT SUM(CASE WHEN g = 'en' THEN ng END) AS n1,
                       SUM(CASE WHEN g = 'de' THEN ng END) AS n2,
                       SUM(CASE WHEN g = 'en' THEN s2 END) AS s21
                FROM per
            )
            SELECT CAST(n1 AS BIGINT) AS n_left, CAST(n2 AS BIGINT) AS n_right,
                   ROUND({u1}, 6) AS u_stat,
                   ROUND({z}, 6) AS z,
                   ROUND(CAST(CAST(ROUND({p} * 1e12) AS BIGINT) AS DOUBLE) / 1e12, 12) AS p_value
            FROM agg CROSS JOIN ties
        """


def _dunn_oracle_sql(alpha: float = 0.05) -> str:
    """Generate the dunn_doclen oracle: pooled grid ranks, pairwise
    tie-corrected z trees, 1e-12-integer BH step-up — mirroring
    `analytics.dunn_posthoc` verbatim."""
    from morphik_core_spark.operators.analytics import _AS_NORMAL_SF

    rbar_l = "(CAST(s2l AS DOUBLE) / 2.0 / CAST(n_left AS DOUBLE))"
    rbar_r = "(CAST(s2r AS DOUBLE) / 2.0 / CAST(n_right AS DOUBLE))"
    nd = "CAST(nt AS DOUBLE)"
    sig2 = (
        f"(({nd} * ({nd} + 1.0) / 12.0 - CAST(tt AS DOUBLE) / (12.0 * ({nd} - 1.0))) "
        f"* (1.0 / CAST(n_left AS DOUBLE) + 1.0 / CAST(n_right AS DOUBLE)))"
    )
    z = f"(({rbar_l} - {rbar_r}) / sqrt({sig2}))"
    p = f"(2.0 * {_AS_NORMAL_SF.format(z=f'abs({z})')})"
    return f"""
            WITH src AS (
                SELECT lang AS g, CAST(n_chars AS BIGINT) AS v
                FROM documents WHERE n_chars IS NOT NULL
            ),
            grid AS (SELECT v, count(*) AS c FROM src GROUP BY 1),
            rg AS (
                SELECT v, 2 * (SUM(c) OVER (ORDER BY v ASC ROWS UNBOUNDED PRECEDING) - c)
                          + c + 1 AS r2
                FROM grid
            ),
            rj AS (SELECT s.g, r.r2 FROM src s JOIN rg r ON s.v = r.v),
            per AS (SELECT g, count(*) AS ng, CAST(sum(r2) AS HUGEINT) AS s2 FROM rj GROUP BY 1),
            tot AS (
                SELECT (SELECT count(*) FROM rj) AS nt,
                       (SELECT SUM(CAST(c AS HUGEINT) * c * c - c) FROM grid) AS tt
            ),
            pairs AS (
                SELECT a.g AS g_left, b.g AS g_right,
                       a.ng AS n_left, b.ng AS n_right,
                       a.s2 AS s2l, b.s2 AS s2r, nt, tt
                FROM per a JOIN per b ON a.g < b.g CROSS JOIN tot
            ),
            tested AS (
                SELECT g_left, g_right,
                       CAST(n_left AS BIGINT) AS n_left, CAST(n_right AS BIGINT) AS n_right,
                       ROUND({z}, 6) AS z,
                       CAST(ROUND({p} * 1e12) AS BIGINT) AS pu
                FROM pairs
            ),
            ranked AS (
                SELECT *, COUNT(*) OVER () AS m,
                       CAST(row_number() OVER (ORDER BY pu ASC, g_left ASC, g_right ASC) AS BIGINT) AS p_rank
                FROM tested
            ),
            cut AS (
                SELECT *, MAX(CASE WHEN pu * m <= p_rank * CAST(ROUND({float(alpha)} * 1e12) AS BIGINT)
                                   THEN p_rank END) OVER () AS imax
                FROM ranked
            )
            SELECT g_left, g_right, n_left, n_right, z,
                   ROUND(CAST(pu AS DOUBLE) / 1e12, 12) AS p_value,
                   p_rank,
                   COALESCE(p_rank <= imax, FALSE) AS rejected
            FROM cut ORDER BY p_rank
        """


def _q_ccf_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation (`analytics.cross_correlation`) between daily
    view and purchase volumes at lags ±7 — the lead/lag screen
    `acf_daily` can't express (positive lag: views LEAD purchases).
    Integer deviations, DECIMAL product sums, one division per lag."""
    from morphik_core_spark.operators.analytics import cross_correlation

    events = _t(spark, sf_dir, "events")
    di = F.expr("unix_micros(ts) div 86400000000").alias("di")
    dx = events.filter(F.col("event_type") == "view").groupBy(di).agg(
        F.count(F.lit(1)).alias("x")
    )
    dy = events.filter(F.col("event_type") == "purchase").groupBy(di).agg(
        F.count(F.lit(1)).alias("y")
    )
    # day-grain series: same 100k contract bound as the acf/MK family
    return cross_correlation(
        dx.join(dy, "di"), "di", "x", "y", max_lag=7, collect_max_points=100_000
    )


def _q_seasonal_strength_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyndman STL strength scalars (`analytics.seasonal_strength`) over
    the daily-volume decomposition: trend vs seasonal vs noise dominance
    in one row — the skim-level readout on top of `seasonal_decompose`'s
    full table. Micro-int requantization of the rounded components is
    lossless, so the moments are exact."""
    from morphik_core_spark.operators.analytics import (
        seasonal_decompose,
        seasonal_strength,
    )

    events = _t(spark, sf_dir, "events")
    daily = events.groupBy(
        F.expr("unix_micros(ts) div 86400000000").alias("di")
    ).agg(F.count(F.lit(1)).alias("x"))
    return seasonal_strength(seasonal_decompose(daily, "di", "x", period=7))


def _q_holt_winters_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt–Winters additive forecast backtest (`analytics.
    holt_winters_additive`, period 7) over daily event volume — the
    seasonal upgrade `holt_forecast` needs on a weekly-shaped series;
    driver-side integer-micro recursion (the holt/FS-EM boundary
    class), one-step-ahead forecasts after the classic two-cycle
    initialization."""
    from morphik_core_spark.operators.analytics import holt_winters_additive

    events = _t(spark, sf_dir, "events")
    daily = events.groupBy(
        F.expr("unix_micros(ts) div 86400000000").alias("di")
    ).agg(F.count(F.lit(1)).alias("y"))
    return holt_winters_additive(daily, "di", "y", period=7)


def _hw_oracle_sql(
    period: int = 7, alpha: float = 0.3, beta: float = 0.1, gamma: float = 0.2
) -> str:
    """Generate the holt_winters_daily oracle: the `holt_forecast`
    recursive-CTE pattern widened to carry the ``period`` seasonal
    slots as columns, replaying `analytics.holt_winters_additive`'s
    integer-micro recursion verbatim (CAST(lit AS DOUBLE) literals —
    bare decimals are DECIMAL in DuckDB and poison the accumulator)."""
    p = int(period)
    sprev = (
        "(CASE o.phase "
        + " ".join(f"WHEN {j} THEN hw.s{j}" for j in range(p))
        + " END)"
    )
    lt = (
        f"CAST(ROUND(CAST({alpha!r} AS DOUBLE) * (o.y * 1000000 - {sprev}) "
        f"+ CAST({1.0 - alpha!r} AS DOUBLE) * (hw.l + hw.b)) AS BIGINT)"
    )
    bt = (
        f"CAST(ROUND(CAST({beta!r} AS DOUBLE) * ({lt} - hw.l) "
        f"+ CAST({1.0 - beta!r} AS DOUBLE) * hw.b) AS BIGINT)"
    )
    snew = (
        f"CAST(ROUND(CAST({gamma!r} AS DOUBLE) * (o.y * 1000000 - {lt}) "
        f"+ CAST({1.0 - gamma!r} AS DOUBLE) * {sprev}) AS BIGINT)"
    )
    s_cols = ", ".join(f"s{j}" for j in range(p))
    s_seed = ",\n                       ".join(
        f"(SELECT CAST(ROUND((CAST(y AS DOUBLE) - (SELECT m FROM m1)) * 1000000.0) AS BIGINT) "
        f"FROM o WHERE rn <= {p} AND phase = {j})"
        for j in range(p)
    )
    s_step = ",\n                       ".join(
        f"CASE WHEN o.phase = {j} THEN {snew} ELSE hw.s{j} END" for j in range(p)
    )
    return f"""
            WITH RECURSIVE d AS (
                SELECT epoch_us(ts) // 86400000000 AS di, COUNT(*) AS y
                FROM events GROUP BY 1
            ),
            o AS (SELECT di, y, CAST(di % {p} AS INT) AS phase,
                         ROW_NUMBER() OVER (ORDER BY di) AS rn FROM d),
            n AS (SELECT COUNT(*) AS nn FROM o),
            m1 AS (SELECT CAST(SUM(y) AS DOUBLE) / {float(p)!r} AS m FROM o WHERE rn <= {p}),
            m2 AS (SELECT CAST(SUM(y) AS DOUBLE) / {float(p)!r} AS m FROM o
                   WHERE rn > {p} AND rn <= {2 * p}),
            hw(rn, l, b, {s_cols}, sph, f) AS (
                SELECT {p},
                       CAST(ROUND((SELECT m FROM m1) * 1000000.0) AS BIGINT),
                       CAST(ROUND(((SELECT m FROM m2) - (SELECT m FROM m1)) * 1000000.0
                                  / {float(p)!r}) AS BIGINT),
                       {s_seed},
                       CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
                UNION ALL
                SELECT hw.rn + 1,
                       {lt},
                       {bt},
                       {s_step},
                       {snew},
                       hw.l + hw.b + {sprev}
                FROM hw JOIN o ON o.rn = hw.rn + 1 CROSS JOIN n
                WHERE hw.rn < n.nn
            )
            SELECT o.di, o.y,
                   ROUND(CAST(hw.l AS DOUBLE) / 1e6, 6) AS level,
                   ROUND(CAST(hw.b AS DOUBLE) / 1e6, 6) AS trend,
                   ROUND(CAST(hw.sph AS DOUBLE) / 1e6, 6) AS season,
                   ROUND(CAST(hw.f AS DOUBLE) / 1e6, 6) AS forecast,
                   ROUND(CAST(o.y * 1000000 - hw.f AS DOUBLE) / 1e6, 6) AS error
            FROM hw JOIN o ON o.rn = hw.rn
            WHERE hw.rn > {p}
            ORDER BY o.di
        """


def _q_holt_winters_mult_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt–Winters MULTIPLICATIVE forecast backtest (`analytics.
    holt_winters_multiplicative`, period 7) over daily event volume —
    the level-proportional-seasonality twin of `holt_winters_daily`:
    season carried as a RATIO, so the weekly swing scales with the
    level. Driver-side integer-micro recursion (level/trend in
    value-micros, season in ratio-micros), one-step-ahead forecasts
    after the classic two-cycle initialization; daily counts are
    strictly positive, satisfying the ratio form's domain."""
    from morphik_core_spark.operators.analytics import holt_winters_multiplicative

    events = _t(spark, sf_dir, "events")
    daily = events.groupBy(
        F.expr("unix_micros(ts) div 86400000000").alias("di")
    ).agg(F.count(F.lit(1)).alias("y"))
    return holt_winters_multiplicative(daily, "di", "y", period=7)


def _hw_mult_oracle_sql(
    period: int = 7, alpha: float = 0.3, beta: float = 0.1, gamma: float = 0.2
) -> str:
    """Generate the holt_winters_mult_daily oracle: `_hw_oracle_sql`'s
    recursive-CTE shape with the multiplicative state updates — every
    division through DOUBLE exactly once, replaying `analytics.
    holt_winters_multiplicative`'s explicit-float() trees verbatim
    (level/trend in value-micros, season in ratio-micros, half-away
    micro-quantization per update)."""
    p = int(period)
    sprev = (
        "(CASE o.phase "
        + " ".join(f"WHEN {j} THEN hw.s{j}" for j in range(p))
        + " END)"
    )
    lt = (
        f"CAST(ROUND(CAST({alpha!r} AS DOUBLE) * (CAST(o.y AS DOUBLE) * 1000000000000.0 / {sprev}) "
        f"+ CAST({1.0 - alpha!r} AS DOUBLE) * (hw.l + hw.b)) AS BIGINT)"
    )
    bt = (
        f"CAST(ROUND(CAST({beta!r} AS DOUBLE) * ({lt} - hw.l) "
        f"+ CAST({1.0 - beta!r} AS DOUBLE) * hw.b) AS BIGINT)"
    )
    snew = (
        f"CAST(ROUND(CAST({gamma!r} AS DOUBLE) * (CAST(o.y AS DOUBLE) * 1000000000000.0 / {lt}) "
        f"+ CAST({1.0 - gamma!r} AS DOUBLE) * {sprev}) AS BIGINT)"
    )
    fcast = (
        f"CAST(ROUND(CAST(hw.l + hw.b AS DOUBLE) * {sprev} / 1000000.0) AS BIGINT)"
    )
    s_cols = ", ".join(f"s{j}" for j in range(p))
    s_seed = ",\n                       ".join(
        f"(SELECT CAST(ROUND(CAST(y AS DOUBLE) * 1000000.0 / (SELECT m FROM m1)) AS BIGINT) "
        f"FROM o WHERE rn <= {p} AND phase = {j})"
        for j in range(p)
    )
    s_step = ",\n                       ".join(
        f"CASE WHEN o.phase = {j} THEN {snew} ELSE hw.s{j} END" for j in range(p)
    )
    return f"""
            WITH RECURSIVE d AS (
                SELECT epoch_us(ts) // 86400000000 AS di, COUNT(*) AS y
                FROM events GROUP BY 1
            ),
            o AS (SELECT di, y, CAST(di % {p} AS INT) AS phase,
                         ROW_NUMBER() OVER (ORDER BY di) AS rn FROM d),
            n AS (SELECT COUNT(*) AS nn FROM o),
            m1 AS (SELECT CAST(SUM(y) AS DOUBLE) / {float(p)!r} AS m FROM o WHERE rn <= {p}),
            m2 AS (SELECT CAST(SUM(y) AS DOUBLE) / {float(p)!r} AS m FROM o
                   WHERE rn > {p} AND rn <= {2 * p}),
            hw(rn, l, b, {s_cols}, sph, f) AS (
                SELECT {p},
                       CAST(ROUND((SELECT m FROM m1) * 1000000.0) AS BIGINT),
                       CAST(ROUND(((SELECT m FROM m2) - (SELECT m FROM m1)) * 1000000.0
                                  / {float(p)!r}) AS BIGINT),
                       {s_seed},
                       CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
                UNION ALL
                SELECT hw.rn + 1,
                       {lt},
                       {bt},
                       {s_step},
                       {snew},
                       {fcast}
                FROM hw JOIN o ON o.rn = hw.rn + 1 CROSS JOIN n
                WHERE hw.rn < n.nn
            )
            SELECT o.di, o.y,
                   ROUND(CAST(hw.l AS DOUBLE) / 1e6, 6) AS level,
                   ROUND(CAST(hw.b AS DOUBLE) / 1e6, 6) AS trend,
                   ROUND(CAST(hw.sph AS DOUBLE) / 1e6, 6) AS season,
                   ROUND(CAST(hw.f AS DOUBLE) / 1e6, 6) AS forecast,
                   ROUND(CAST(o.y * 1000000 - hw.f AS DOUBLE) / 1e6, 6) AS error
            FROM hw JOIN o ON o.rn = hw.rn
            WHERE hw.rn > {p}
            ORDER BY o.di
        """


def _smk_oracle_series_sql(val_expr: str, label: str) -> str:
    """One seasonal-Mann-Kendall series over daily event volume:
    same-weekday pairs, per-season tie-corrected variances summed —
    `analytics.seasonal_mann_kendall` verbatim (period 7)."""
    return f"""
            SELECT '{label}' AS series, * FROM (
            WITH d0 AS (SELECT epoch_us(ts) // 86400000000 AS di, COUNT(*) AS x0
                        FROM events GROUP BY 1),
            lo AS (SELECT MIN(di) AS dmin FROM d0),
            d AS (SELECT di, CAST({val_expr} AS BIGINT) AS y,
                         CAST(di % 7 AS BIGINT) AS m
                  FROM d0 CROSS JOIN lo),
            s AS (
                SELECT CAST(SUM(CASE WHEN b.y > a.y THEN 1
                                     WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT) AS s
                FROM d a JOIN d b ON a.m = b.m AND a.di < b.di
            ),
            per AS (SELECT m, COUNT(*) AS n FROM d GROUP BY 1),
            ties AS (
                SELECT m, SUM(t * (t - 1) * (2 * t + 5)) AS tie_term
                FROM (SELECT m, y, COUNT(*) AS t FROM d GROUP BY 1, 2)
                WHERE t > 1 GROUP BY 1
            ),
            v AS (
                SELECT CAST(COUNT(*) AS BIGINT) AS n_seasons,
                       CAST(SUM(p.n) AS BIGINT) AS n_points,
                       CAST(SUM(p.n * (p.n - 1) * (2 * p.n + 5)
                                - COALESCE(t.tie_term, 0)) AS BIGINT) AS v18
                FROM per p LEFT JOIN ties t ON p.m = t.m
            )
            SELECT n_points, n_seasons, s AS s_stat,
                   ROUND(CAST(v18 AS DOUBLE) / 18.0, 6) AS var_s,
                   ROUND(CASE WHEN s > 0 THEN CAST(s - 1 AS DOUBLE) / sqrt(CAST(v18 AS DOUBLE) / 18.0)
                              WHEN s < 0 THEN CAST(s + 1 AS DOUBLE) / sqrt(CAST(v18 AS DOUBLE) / 18.0)
                              ELSE 0.0 END, 6) AS z,
                   CASE WHEN ROUND(CASE WHEN s > 0 THEN CAST(s - 1 AS DOUBLE) / sqrt(CAST(v18 AS DOUBLE) / 18.0)
                                        WHEN s < 0 THEN CAST(s + 1 AS DOUBLE) / sqrt(CAST(v18 AS DOUBLE) / 18.0)
                                        ELSE 0.0 END, 6) >= 1.96 THEN 'increasing'
                        WHEN ROUND(CASE WHEN s > 0 THEN CAST(s - 1 AS DOUBLE) / sqrt(CAST(v18 AS DOUBLE) / 18.0)
                                        WHEN s < 0 THEN CAST(s + 1 AS DOUBLE) / sqrt(CAST(v18 AS DOUBLE) / 18.0)
                                        ELSE 0.0 END, 6) <= -1.96 THEN 'decreasing'
                        ELSE 'none' END AS trend
            FROM s CROSS JOIN v
            )
    """


def _pcorr_oracle_sql() -> str:
    """The partial_corr_user_activity oracle: one exact-moment pass over
    per-user (views, purchases, total), three micro-quantized pairwise
    r, the first-order partial closed form —
    `analytics.partial_corr_3var` verbatim."""

    def r(a: str, b: str) -> str:
        va = f"(CAST(CAST(n AS HUGEINT) * p{a}{a} - s{a} * s{a} AS DOUBLE))"
        vb = f"(CAST(CAST(n AS HUGEINT) * p{b}{b} - s{b} * s{b} AS DOUBLE))"
        cov = f"(CAST(CAST(n AS HUGEINT) * p{a}{b} - s{a} * s{b} AS DOUBLE))"
        raw = (
            f"(CASE WHEN {va} <= 0.0 OR {vb} <= 0.0 THEN NULL "
            f"ELSE {cov} / sqrt({va} * {vb}) END)"
        )
        return f"(CAST(ROUND({raw} * 1e6) AS BIGINT) / 1e6)"

    rxy, rxz, ryz = r("x", "y"), r("x", "z"), r("y", "z")
    part = (
        f"(CASE WHEN {rxz} IS NULL OR {ryz} IS NULL OR {rxy} IS NULL "
        f"OR abs({rxz}) >= 1.0 OR abs({ryz}) >= 1.0 THEN NULL "
        f"ELSE ({rxy} - {rxz} * {ryz}) / sqrt((1.0 - {rxz} * {rxz}) * (1.0 - {ryz} * {ryz})) END)"
    )
    return f"""
            WITH pu AS (
                SELECT user_id,
                       SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS x,
                       SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y,
                       COUNT(*) AS z
                FROM events GROUP BY 1
            ),
            m AS (
                SELECT CAST(count(*) AS BIGINT) AS n,
                       CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
                       CAST(SUM(z) AS HUGEINT) AS sz,
                       SUM(CAST(x AS HUGEINT) * x) AS pxx,
                       SUM(CAST(y AS HUGEINT) * y) AS pyy,
                       SUM(CAST(z AS HUGEINT) * z) AS pzz,
                       SUM(CAST(x AS HUGEINT) * y) AS pxy,
                       SUM(CAST(x AS HUGEINT) * z) AS pxz,
                       SUM(CAST(y AS HUGEINT) * z) AS pyz
                FROM pu
            )
            SELECT n,
                   ROUND({rxy}, 6) AS r_xy,
                   ROUND({rxz}, 6) AS r_xz,
                   ROUND({ryz}, 6) AS r_yz,
                   ROUND({part}, 6) AS r_xy_given_z
            FROM m
        """


def _cmh_oracle_sql() -> str:
    """The cmh_lang_exposure oracle: per-stratum 2x2 cells, micro-
    quantized E/V/ad/bc terms, integer reduction, one chi2/OR tree —
    `analytics.cmh_test` expression-for-expression."""
    from morphik_core_spark.operators.analytics import _AS_NORMAL_SF

    n_s = "(CAST(a + b + c + d AS DOUBLE))"
    a_d, b_d = "CAST(a AS DOUBLE)", "CAST(b AS DOUBLE)"
    c_d, d_d = "CAST(c AS DOUBLE)", "CAST(d AS DOUBLE)"
    e_s = f"(({a_d} + {b_d}) * ({a_d} + {c_d}) / {n_s})"
    v_s = (
        f"(({a_d} + {b_d}) * ({c_d} + {d_d}) * ({a_d} + {c_d}) * ({b_d} + {d_d}) "
        f"/ ({n_s} * {n_s} * ({n_s} - 1.0)))"
    )
    chi2 = (
        "(CASE WHEN vv <= 0 THEN 0.0 ELSE "
        "CAST(dev AS DOUBLE) * CAST(dev AS DOUBLE) / 1e6 / CAST(vv AS DOUBLE) END)"
    )
    p_two = (
        f"(CASE WHEN vv <= 0 THEN 1.0 "
        f"ELSE least(1.0, 2.0 * {_AS_NORMAL_SF.format(z=f'sqrt({chi2})')}) END)"
    )
    return f"""
            WITH cells AS (
                SELECT CAST(lang AS VARCHAR) AS s,
                       SUM(CASE WHEN source = 'src1' AND n_chars > 500 THEN 1 ELSE 0 END) AS a,
                       SUM(CASE WHEN source = 'src1' AND NOT (n_chars > 500) THEN 1 ELSE 0 END) AS b,
                       SUM(CASE WHEN source <> 'src1' AND n_chars > 500 THEN 1 ELSE 0 END) AS c,
                       SUM(CASE WHEN source <> 'src1' AND NOT (n_chars > 500) THEN 1 ELSE 0 END) AS d
                FROM documents
                WHERE source IS NOT NULL AND n_chars IS NOT NULL
                GROUP BY 1
            ),
            terms AS (
                SELECT a + b + c + d AS nn,
                       CASE WHEN a + b + c + d > 1
                            THEN CAST(ROUND(({a_d} - {e_s}) * 1e6) AS BIGINT) ELSE 0 END AS dev_u,
                       CASE WHEN a + b + c + d > 1
                            THEN CAST(ROUND({v_s} * 1e6) AS BIGINT) ELSE 0 END AS var_u,
                       CAST(ROUND({a_d} * {d_d} / {n_s} * 1e6) AS BIGINT) AS ad_u,
                       CAST(ROUND({b_d} * {c_d} / {n_s} * 1e6) AS BIGINT) AS bc_u
                FROM cells
            ),
            agg AS (
                SELECT count(*) AS n_strata, SUM(nn) AS n,
                       SUM(dev_u) AS dev, SUM(var_u) AS vv,
                       SUM(ad_u) AS ad, SUM(bc_u) AS bc
                FROM terms
            )
            SELECT CAST(n_strata AS BIGINT) AS n_strata, CAST(n AS BIGINT) AS n,
                   ROUND({chi2}, 6) AS chi2,
                   ROUND(CAST(ROUND({p_two} * 1e12) AS BIGINT) / 1e12, 12) AS p_value,
                   CASE WHEN bc > 0
                        THEN ROUND(CAST(ad AS DOUBLE) / CAST(bc AS DOUBLE), 6) END AS or_mh
            FROM agg
        """


def _friedman_oracle_sql() -> str:
    """The friedman_dow_types oracle: two series (raw + purchase-
    uplifted), each the within-block doubled tie ranks over the
    (block, value) grid, complete-block filter, Conover tie-corrected
    T — `analytics.friedman_test` verbatim."""
    return (
        _friedman_series_sql("v", "raw")
        + "\n            UNION ALL\n"
        + _friedman_series_sql(
            "CASE WHEN t = 'purchase' THEN v + v // 2 ELSE v END", "uplifted"
        )
    )


def _friedman_series_sql(val_expr: str, label: str) -> str:
    kd, nd = "CAST(k AS DOUBLE)", "CAST(n_blocks AS DOUBLE)"
    num4 = (
        f"(CAST(sq2 AS DOUBLE) - 2.0 * {nd} * ({kd} + 1.0) * CAST(sum2 AS DOUBLE) "
        f"+ {kd} * {nd} * ({kd} + 1.0) * {nd} * ({kd} + 1.0))"
    )
    den4 = f"(CAST(a4 AS DOUBLE) - {nd} * {kd} * ({kd} + 1.0) * ({kd} + 1.0))"
    t_stat = (
        f"(CASE WHEN ({den4}) <= 0.0 THEN 0.0 "
        f"ELSE ({kd} - 1.0) * ({num4}) / ({den4}) END)"
    )
    return f"""
            SELECT '{label}' AS series, * FROM (
            WITH daily0 AS (
                SELECT epoch_us(ts) // 86400000000 AS b,
                       CAST(event_type AS VARCHAR) AS t,
                       CAST(COUNT(*) AS BIGINT) AS v
                FROM events GROUP BY 1, 2
            ),
            daily AS (SELECT b, t, CAST({val_expr} AS BIGINT) AS v FROM daily0),
            kt AS (SELECT COUNT(DISTINCT t) AS k_total FROM daily),
            full_blocks AS (
                SELECT b FROM daily GROUP BY b
                HAVING COUNT(DISTINCT t) = (SELECT k_total FROM kt)
            ),
            rows_ AS (
                SELECT d.b, d.t, d.v FROM daily d
                SEMI JOIN full_blocks fb ON d.b = fb.b
            ),
            grid AS (SELECT b, v, COUNT(*) AS c FROM rows_ GROUP BY 1, 2),
            rg AS (
                SELECT b, v,
                       2 * COALESCE(SUM(c) OVER (PARTITION BY b ORDER BY v ASC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       + c + 1 AS r2
                FROM grid
            ),
            ranked AS (SELECT r.b, r.t, g.r2 FROM rows_ r JOIN rg g ON r.b = g.b AND r.v = g.v),
            per_t AS (SELECT t, SUM(CAST(r2 AS HUGEINT)) AS R2 FROM ranked GROUP BY 1),
            a4t AS (
                SELECT SUM(CAST(r2 AS HUGEINT) * r2) AS a4,
                       COUNT(DISTINCT b) AS n_blocks
                FROM ranked
            ),
            agg AS (
                SELECT count(*) AS k,
                       SUM(CAST(R2 AS HUGEINT) * R2) AS sq2,
                       SUM(R2) AS sum2
                FROM per_t
            )
            SELECT CAST(k AS BIGINT) AS k, CAST(n_blocks AS BIGINT) AS n_blocks,
                   ROUND({t_stat}, 6) AS t_stat
            FROM agg CROSS JOIN a4t
            )
        """


def _cochran_oracle_sql() -> str:
    """The cochran_priority_trend oracle: ordered scores from
    row_number over the sorted priority keys, exact DECIMAL T/Var
    cores, the shared A&S tail — `analytics.cochran_armitage_trend`
    expression-for-expression."""
    from morphik_core_spark.operators.analytics import _AS_NORMAL_SF

    t_int = "(CAST(n AS HUGEINT) * ws - CAST(s AS HUGEINT) * wn)"
    v_int = "(CAST(n AS HUGEINT) * wwn - wn * wn)"
    var = (
        "(CAST(s AS DOUBLE) * (CAST(n AS DOUBLE) - CAST(s AS DOUBLE)) "
        f"* CAST({v_int} AS DOUBLE) / CAST(n AS DOUBLE))"
    )
    z = (
        f"(CASE WHEN ({var}) <= 0.0 THEN 0.0 "
        f"ELSE CAST({t_int} AS DOUBLE) / sqrt({var}) END)"
    )
    p_two = (
        f"(CASE WHEN ({var}) <= 0.0 THEN 1.0 "
        f"ELSE least(1.0, 2.0 * {_AS_NORMAL_SF.format(z=f'abs({z})')}) END)"
    )
    return f"""
            WITH per_g AS (
                SELECT CAST(o_orderpriority AS VARCHAR) AS g,
                       count(*) AS ng,
                       SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS sg
                FROM orders GROUP BY 1
            ),
            scored AS (
                SELECT *, CAST(row_number() OVER (ORDER BY g ASC) AS BIGINT) AS w
                FROM per_g
            ),
            agg AS (
                SELECT count(*) AS k, SUM(ng) AS n, SUM(sg) AS s,
                       SUM(CAST(w AS HUGEINT) * sg) AS ws,
                       SUM(CAST(w AS HUGEINT) * ng) AS wn,
                       SUM(CAST(w AS HUGEINT) * w * ng) AS wwn
                FROM scored
            )
            SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
                   ROUND(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) AS pooled_rate,
                   ROUND({z}, 6) AS z,
                   ROUND(CAST(ROUND({p_two} * 1e12) AS BIGINT) / 1e12, 12) AS p_value
            FROM agg
        """


def _jt_oracle_series_sql(val_expr: str, label: str) -> str:
    """One Jonckheere-Terpstra series as a SELECT (pooled-spine grid +
    Hollander-Wolfe tie-corrected variance), mirroring
    `analytics.jonckheere_terpstra` expression-for-expression."""
    from morphik_core_spark.operators.analytics import _AS_NORMAL_SF

    nd = "CAST(n AS DOUBLE)"
    mean2 = "(CAST(CAST(n AS HUGEINT) * n - sn2 AS DOUBLE) / 2.0)"
    var = (
        f"((({nd} * ({nd} - 1.0) * (2.0 * {nd} + 5.0) - CAST(gA AS DOUBLE) - CAST(tA AS DOUBLE)) / 72.0)"
        f" + (CAST(gB AS DOUBLE) * CAST(tB AS DOUBLE) / (36.0 * {nd} * ({nd} - 1.0) * ({nd} - 2.0)))"
        f" + (CAST(gC AS DOUBLE) * CAST(tC AS DOUBLE) / (8.0 * {nd} * ({nd} - 1.0))))"
    )
    z = (
        f"(CASE WHEN ({var}) <= 0.0 THEN 0.0 "
        f"ELSE (CAST(jt2 AS DOUBLE) - {mean2}) / 2.0 / sqrt({var}) END)"
    )
    p_two = (
        f"(CASE WHEN ({var}) <= 0.0 THEN 1.0 "
        f"ELSE least(1.0, 2.0 * {_AS_NORMAL_SF.format(z=f'abs({z})')}) END)"
    )
    return f"""
            SELECT '{label}' AS series, CAST(k AS BIGINT) AS k,
                   CAST(n AS BIGINT) AS n,
                   CAST(jt2 AS DOUBLE) / 2.0 AS jt_stat,
                   {mean2} / 2.0 AS mean_jt,
                   ROUND({z}, 6) AS z,
                   ROUND(CAST(ROUND({p_two} * 1e12) AS BIGINT) / 1e12, 12) AS p_value
            FROM (
                WITH src AS (
                    SELECT CAST(o_orderpriority AS VARCHAR) AS g, {val_expr} AS v
                    FROM orders WHERE o_totalprice IS NOT NULL
                ),
                cells AS (SELECT g, v, count(*) AS c FROM src GROUP BY 1, 2),
                gs AS (SELECT DISTINCT g FROM cells),
                vs AS (SELECT DISTINCT v FROM cells),
                dense AS (
                    SELECT gs.g, vs.v, COALESCE(cells.c, 0) AS c
                    FROM gs CROSS JOIN vs
                    LEFT JOIN cells ON cells.g = gs.g AND cells.v = vs.v
                ),
                cum AS (
                    SELECT g, v, c,
                           COALESCE(SUM(c) OVER (PARTITION BY g ORDER BY v ASC
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS lt
                    FROM dense
                ),
                jt AS (
                    SELECT SUM(CAST(b.c AS HUGEINT) * (2 * a.lt + a.c)) AS jt2
                    FROM cells b JOIN cum a ON a.v = b.v AND a.g < b.g
                ),
                gsz AS (SELECT g, SUM(c) AS ng FROM cells GROUP BY 1),
                gt AS (
                    SELECT count(*) AS k, SUM(ng) AS n,
                           SUM(CAST(ng AS HUGEINT) * ng) AS sn2,
                           SUM(CAST(ng AS HUGEINT) * (ng - 1) * (2 * ng + 5)) AS gA,
                           SUM(CAST(ng AS HUGEINT) * (ng - 1) * (ng - 2)) AS gB,
                           SUM(CAST(ng AS HUGEINT) * (ng - 1)) AS gC
                    FROM gsz
                ),
                tsz AS (SELECT v, SUM(c) AS tv FROM cells GROUP BY 1),
                tt AS (
                    SELECT SUM(CAST(tv AS HUGEINT) * (tv - 1) * (2 * tv + 5)) AS tA,
                           SUM(CAST(tv AS HUGEINT) * (tv - 1) * (tv - 2)) AS tB,
                           SUM(CAST(tv AS HUGEINT) * (tv - 1)) AS tC
                    FROM tsz
                )
                SELECT * FROM jt CROSS JOIN gt CROSS JOIN tt
            )
    """


def _pacf_oracle_sql(max_lag: int = 7) -> str:
    """Generate the pacf_daily oracle: the acf_daily day-grid ACF at
    12-dp quantization, then the Durbin-Levinson recursion UNROLLED as
    chained CTEs — each level carries the phi row as pico-BIGINT columns
    f1..fk, every product/division on CAST(u)/1e12 doubles in the same
    left-to-right order as `analytics.pacf_durbin_levinson`."""

    def d(x: str) -> str:
        return f"(CAST({x} AS DOUBLE) / 1e12)"

    m = int(max_lag)
    lag_vals = ", ".join(f"({k})" for k in range(1, m + 1))
    r_cols = ", ".join(
        f"MAX(CASE WHEN lag = {k} THEN ru END) AS r{k}" for k in range(1, m + 1)
    )
    levels = ["l1 AS (SELECT r1 AS f1 FROM r)"]
    for k in range(2, m + 1):
        num = d(f"r{k}") + "".join(
            f" - {d(f'f{j}')} * {d(f'r{k - j}')}" for j in range(1, k)
        )
        den = "1.0" + "".join(
            f" - {d(f'f{j}')} * {d(f'r{j}')}" for j in range(1, k)
        )
        levels.append(
            f"l{k}n AS (SELECT CAST(ROUND((CASE WHEN abs({den}) < 1e-12 "
            f"THEN 0.0 ELSE ({num}) / ({den}) END) * 1e12) AS BIGINT) AS fkk "
            f"FROM l{k - 1}, r)"
        )
        upd = ", ".join(
            f"CAST(ROUND(({d(f'f{j}')} - {d('fkk')} * {d(f'f{k - j}')}) * 1e12) "
            f"AS BIGINT) AS f{j}"
            for j in range(1, k)
        )
        levels.append(f"l{k} AS (SELECT {upd}, fkk AS f{k} FROM l{k - 1}, l{k}n)")
    finals = "\n            UNION ALL ".join(
        f"SELECT CAST({k} AS INT) AS lag, "
        f"(SELECT CAST(r{k} AS DOUBLE) / 1e12 FROM r) AS acf, "
        f"(SELECT CAST(f{k} AS DOUBLE) / 1e12 FROM l{k}) AS pacf"
        for k in range(1, m + 1)
    )
    level_sql = ",\n            ".join(levels)
    return f"""
            WITH d AS (SELECT epoch_us(ts) // 86400000000 AS di, COUNT(*) AS x
                       FROM events GROUP BY 1),
            g AS (SELECT CAST(SUM(x) AS BIGINT) AS s, COUNT(*) AS n FROM d),
            dev AS (SELECT di, n * x - s AS dd FROM d CROSS JOIN g),
            den AS (SELECT SUM(CAST(dd AS HUGEINT) * dd) AS den FROM dev),
            lags AS (SELECT * FROM (VALUES {lag_vals}) AS l(lag)),
            prs AS (
                SELECT l.lag, a.dd AS da, b.dd AS db
                FROM dev a JOIN lags l ON TRUE
                JOIN dev b ON b.di = a.di + l.lag
            ),
            num AS (SELECT lag, SUM(CAST(da AS HUGEINT) * db) AS num
                    FROM prs GROUP BY 1),
            acf AS (
                SELECT lag, CAST(ROUND(ROUND(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 12)
                                       * 1e12) AS BIGINT) AS ru
                FROM num CROSS JOIN den
            ),
            r AS (SELECT {r_cols} FROM acf),
            {level_sql}
            {finals}
            ORDER BY lag
        """


def _chi_posthoc_oracle_sql(alpha: float = 0.05) -> str:
    """Generate the chi_posthoc_priority oracle: per-priority
    (n, finished) counts, pooled two-proportion z per pair, 1e-12 BH
    step-up — the exact expression trees of
    `analytics.chi_square_posthoc`."""
    from morphik_core_spark.operators.analytics import _AS_NORMAL_SF

    nl, nr = "CAST(n_left AS DOUBLE)", "CAST(n_right AS DOUBLE)"
    sl, sr = "CAST(_sl AS DOUBLE)", "CAST(_sr AS DOUBLE)"
    pool = f"(({sl} + {sr}) / ({nl} + {nr}))"
    var = f"({pool} * (1.0 - {pool}) * (1.0 / {nl} + 1.0 / {nr}))"
    z = (
        f"(CASE WHEN ({var}) <= 0.0 THEN 0.0 "
        f"ELSE ({sl} / {nl} - {sr} / {nr}) / sqrt({var}) END)"
    )
    p_two = (
        f"(CASE WHEN ({var}) <= 0.0 THEN 1.0 "
        f"ELSE least(1.0, 2.0 * {_AS_NORMAL_SF.format(z=f'abs({z})')}) END)"
    )
    return f"""
            WITH per_g AS (
                SELECT CAST(o_orderpriority AS VARCHAR) AS g,
                       count(*) AS ng,
                       SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS sg
                FROM orders GROUP BY 1
            ),
            pairs AS (
                SELECT a.g AS g_left, b.g AS g_right,
                       a.ng AS n_left, b.ng AS n_right,
                       a.sg AS _sl, b.sg AS _sr
                FROM per_g a JOIN per_g b ON a.g < b.g
            ),
            tested AS (
                SELECT g_left, g_right,
                       CAST(n_left AS BIGINT) AS n_left,
                       CAST(n_right AS BIGINT) AS n_right,
                       ROUND({sl} / {nl}, 6) AS rate_left,
                       ROUND({sr} / {nr}, 6) AS rate_right,
                       ROUND({z}, 6) AS z,
                       CAST(ROUND({p_two} * 1e12) AS BIGINT) AS pu
                FROM pairs
            ),
            ranked AS (
                SELECT *, COUNT(*) OVER () AS m,
                       CAST(row_number() OVER (ORDER BY pu ASC, g_left ASC, g_right ASC) AS BIGINT) AS p_rank
                FROM tested
            ),
            cut AS (
                SELECT *, MAX(CASE WHEN pu * m <= p_rank * CAST(ROUND({float(alpha)} * 1e12) AS BIGINT)
                                   THEN p_rank END) OVER () AS imax
                FROM ranked
            )
            SELECT g_left, g_right, n_left, n_right, rate_left, rate_right, z,
                   ROUND(CAST(pu AS DOUBLE) / 1e12, 12) AS p_value,
                   p_rank,
                   COALESCE(p_rank <= imax, FALSE) AS rejected
            FROM cut ORDER BY p_rank
        """



def _q_pacf_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation of daily event volume at lags 1..7
    (`analytics.pacf_durbin_levinson`): the AR-order diagnostic on top
    of `acf_daily`'s raw lags — phi_kk is the lag-k correlation with
    lags 1..k-1 regressed out, via the Durbin-Levinson recursion over
    the 12-dp-quantized ACF in pico-integer steps (driver-side,
    max_lag-bounded — the holt/markov boundary class; the oracle
    unrolls the same 7 levels as chained CTEs)."""
    from morphik_core_spark.operators.analytics import pacf_durbin_levinson

    events = _t(spark, sf_dir, "events")
    daily = events.groupBy(
        F.expr("unix_micros(ts) div 86400000000").alias("di")
    ).agg(F.count(F.lit(1)).alias("x"))
    # same bounded-day-grid contract as acf_daily: one collect replaces
    # the distributed ACF chain feeding the driver-side recursion
    return pacf_durbin_levinson(
        daily, "di", "x", max_lag=7, collect_max_points=100_000
    )


def _q_chi_posthoc_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise proportion post-hoc (`analytics.chi_square_posthoc`):
    which order-priority pairs differ in finished-rate, after the
    k-group chi-square screen — pooled two-proportion z per pair, BH
    step-up over the 10 p-values in 1e-12 integer space (the
    `dunn_doclen` recipe on the proportion scale). Five priority
    groups at ~24-25% finished-rate: mostly non-rejections with the
    z/p/BH machinery fully exercised."""
    from morphik_core_spark.operators.analytics import chi_square_posthoc

    orders = _t(spark, sf_dir, "orders")
    return chi_square_posthoc(
        orders, "o_orderpriority", (F.col("o_orderstatus") == "F").cast("int")
    )


def _q_ivm_join_both(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simultaneous two-sided IVM (`incremental.
    incremental_join_apply_both`): the orders⋈customer view absorbs an
    order batch AND a customer batch in ONE maintenance step — kept
    rows survive a double anti-join, A-side changes re-join the
    POST-batch dimension (an updated order pointing at a same-batch
    deleted customer drops; one pointing at a re-nationalized customer
    lands in the NEW nation), and unchanged orders of changed customers
    revive from the view itself. Deltas reuse the `ivm_join` /
    `ivm_join_b` synthesis so every cross-path fires. merge ==
    recompute is the oracle (both CDCs applied in SQL, joined fresh),
    emitted as the per-nation rollup."""
    from morphik_core_spark.operators.incremental import incremental_join_apply_both
    from morphik_core_spark.plans.cache import scoped_persist

    orders = scoped_persist(_t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    ))
    cust = scoped_persist(
        _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    )
    b_view = cust.withColumnRenamed("c_custkey", "o_custkey")
    joined = orders.join(b_view, "o_custkey").select(
        "o_orderkey", "o_custkey", "o_totalprice", "c_nationkey"
    )
    ten_o = F.col("o_orderkey") % 10
    delta_a = (
        orders.filter(ten_o == 0).withColumn("op", F.lit("D"))
        .unionByName(
            orders.filter(ten_o == 1)
            .select(
                "o_orderkey",
                (F.col("o_custkey") % 100 + 1).alias("o_custkey"),
                (F.col("o_totalprice") * F.lit(1.1)).alias("o_totalprice"),
            )
            .withColumn("op", F.lit("U"))
        )
        .unionByName(
            orders.filter(ten_o == 3)
            .select(
                (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
                "o_custkey",
                "o_totalprice",
            )
            .withColumn("op", F.lit("I"))
        )
    )
    ten_c = F.col("o_custkey") % 10
    delta_b = (
        b_view.filter(ten_c == 0).withColumn("op", F.lit("D"))
        .unionByName(
            b_view.filter(ten_c == 1)
            .select("o_custkey", ((F.col("c_nationkey") + 7) % 25).alias("c_nationkey"))
            .withColumn("op", F.lit("U"))
        )
        .unionByName(
            b_view.filter(ten_c == 3)
            .select(
                (F.col("o_custkey") + 20_000_000).alias("o_custkey"), "c_nationkey"
            )
            .withColumn("op", F.lit("I"))
        )
    )
    maintained = incremental_join_apply_both(
        joined, delta_a, b_view, delta_b, "o_orderkey", "o_custkey",
        b_cols=["c_nationkey"],
    )
    return (
        maintained.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.expr(
                "CAST(SUM(CAST(ROUND(CAST(o_totalprice AS DOUBLE) * 100) AS BIGINT)) AS BIGINT)"
            ).alias("rev_cents"),
        )
        .orderBy("c_nationkey")
    )


def _q_kendall_chars_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b (`analytics.kendall_tau_b`) between document
    character and whitespace-token counts — the concordance-based
    monotone screen beside `spearman_screen`'s rank-moment rho on the
    same pair (near-1 by construction; Kendall's pairwise definition
    gives the probability-of-concordance reading and principled tie
    handling). Dense 2D grid suffix sums over the bounded
    (n_chars x tok_cnt) level sets — never an O(n^2) pair join; exact
    integer C/D/tie counts, one double division."""
    from morphik_core_spark.operators.analytics import kendall_tau_b

    docs = _t(spark, sf_dir, "documents").select(
        "n_chars",
        F.size(
            F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != "")
        ).alias("tok_cnt"),
    )
    return kendall_tau_b(docs, "n_chars", "tok_cnt")


def _q_cochran_priority_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Armitage trend test (`analytics.cochran_armitage_trend`):
    is the finished-order rate trending across the five ORDERED
    priorities — the 1-df trend question the omnibus
    `chi_square_screen` dilutes across 4 df. Scores = natural priority
    order ('1-URGENT'..'5-LOW'); exact integer T/Var cores in
    DECIMAL(38,0), one double z, A&S two-sided p."""
    from morphik_core_spark.operators.analytics import cochran_armitage_trend

    orders = _t(spark, sf_dir, "orders")
    return cochran_armitage_trend(
        orders, "o_orderpriority", (F.col("o_orderstatus") == "F").cast("int")
    )


def _q_jt_priority_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jonckheere-Terpstra ordered-alternative test (`analytics.
    jonckheere_terpstra`): are order prices stochastically ORDERED
    across the five priorities. Two rows (the mann_kendall injected-
    drift precedent): the RAW series (null — the generator draws price
    independent of priority) and a +$100k-per-priority-level uplift (dollar-grain values)
    (z >> 0), so both the null and the detection branch are exercised.
    Pooled-spine grid machinery, full Hollander-Wolfe tie-corrected
    variance, everything integer until the final z."""
    from morphik_core_spark.operators.analytics import jonckheere_terpstra

    # DOLLAR-grain values (exact integer cents div 100 — the spearman
    # "quantization lever"): the pooled spine shrinks ~100x, so the
    # dense (group x spine) rank frame stays small; a rank test on
    # dollar-rounded money loses nothing the test can see.
    # Deliberately NOT persisted (round-11 measured 3.25 -> 5.41 s with
    # a scoped_persist here): the spearman lesson again — materializing
    # a corpus-sized projection costs more than the pruned 2-column
    # parquet re-scans it saves, and at 100 TB pruned scans stream.
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) div 100"
        ).alias("dollars"),
        F.expr("CAST(substr(o_orderpriority, 1, 1) AS BIGINT)").alias("_lvl"),
    )
    # the uplift shifts values, never group membership: collect the
    # per-priority sizes ONCE (matching the operator's val-not-null
    # filter) and hand them to both series — one count job, not two
    gtot = [
        (r[0], int(r[1]))
        for r in orders.filter(F.col("dollars").isNotNull())
        .groupBy(F.col("o_orderpriority").cast("string"))
        .agg(F.count(F.lit(1)))
        .collect()
    ]
    # BOTH series through ONE operator chain (round-11 series_col): the
    # raw/uplifted union carries a series tag, so the pivot shuffle, the
    # bucketed prefix pass and the final aggregation each run once
    # (grouped by series) instead of once per series — half the stages,
    # bit-identical per-series arithmetic (operator doc).
    tagged = orders.select(
        F.lit("raw").alias("series"), "o_orderpriority", "dollars"
    ).unionByName(
        orders.select(
            F.lit("uplifted").alias("series"),
            "o_orderpriority",
            (F.col("dollars") + F.col("_lvl") * F.lit(100_000)).alias("dollars"),
        )
    )
    # sums_fit_long: N = |orders| ≤ 1.5e6 at the driver's largest SF,
    # comfortably under the 2·N³ < 2^63 int64 contract (operator doc) —
    # the per-value pair/tie partials drop DECIMAL multiplies for int64
    # (the lineitem_corr/ad_k wave-11 class).
    return jonckheere_terpstra(
        tagged,
        "o_orderpriority",
        "dollars",
        group_sizes=gtot,
        series_col="series",
        sums_fit_long=True,
    ).orderBy("series")


def _q_cmh_lang_exposure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Mantel-Haenszel stratified 2x2 test (`analytics.
    cmh_test`): does coming from src1 move the long-document rate
    (n_chars > 500) CONTROLLING for language — the Simpson's-paradox
    guard beside the pooled `chi_square_screen` (language drives both
    the source mix and the length distribution, so the pooled 2x2 is
    confounded by construction). Strata-bounded cell table, micro-
    quantized per-stratum terms, integer cross-stratum reduction."""
    from morphik_core_spark.operators.analytics import cmh_test

    docs = _t(spark, sf_dir, "documents")
    return cmh_test(
        docs,
        "lang",
        (F.col("source") == "src1").cast("int"),
        (F.col("n_chars") > 500).cast("int"),
    )


def _q_friedman_dow_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman blocked-rank test (`analytics.friedman_test`): do the
    event types differ in volume when ranked WITHIN each day — the
    repeated-measures question `kruskal_doclen`'s pooled ranks can't
    ask (day-level traffic swings would dominate a pooled test; ranking
    within the day block removes them exactly). Blocks = days,
    treatments = event types, values = daily counts; Conover
    tie-corrected T over doubled integer ranks."""
    from morphik_core_spark.operators.analytics import friedman_test
    from morphik_core_spark.plans.cache import scoped_persist

    events = _t(spark, sf_dir, "events")
    daily = scoped_persist(
        events.groupBy(
            F.expr("unix_micros(ts) div 86400000000").alias("di"),
            "event_type",
        ).agg(F.count(F.lit(1)).alias("x"))
    )
    # collected-blocked fast path: the (day, type, count) frame is
    # contract-bounded (days x types); the bound RAISES past 200k rows.
    raw = friedman_test(daily, "di", "event_type", "x", collect_max_rows=200_000)
    # injected within-block uplift (the mann_kendall precedent): +50%
    # to purchases every day — ranked within day, the test must detect
    # it while the raw uniform fixture stays null.
    # A series_col one-chain form was BUILT (operator support + tests
    # remain), measured NET-SLOWER at sf0.1 (median ~5.7 s vs ~2.0 s,
    # min-of-12 3.16 vs 1.72) and reverted: the union of two one-row
    # series executes both chains CONCURRENTLY inside one job, so
    # merging them serializes the same stage depth on this bounded
    # (day x type) frame — locally and at 100 TB alike — while the
    # blocked-rank chain gains join/window keys.
    uplifted = friedman_test(
        daily.select(
            "di",
            "event_type",
            F.when(
                F.col("event_type") == "purchase",
                F.col("x") + F.expr("x div 2"),
            ).otherwise(F.col("x")).alias("x"),
        ),
        "di",
        "event_type",
        "x",
        collect_max_rows=200_000,
    )
    return raw.select(F.lit("raw").alias("series"), "*").unionByName(
        uplifted.select(F.lit("uplifted").alias("series"), "*")
    )


def _q_brown_forsythe_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe variance-homogeneity test (`analytics.
    brown_forsythe_test`): the median-centered form of `levene_acctbal`
    — the default every stats package reaches for on heavy-tailed money
    columns (a single whale balance inflates a segment's mean AND its
    mean-deviations; the median doesn't budge). Exact lower medians
    from the per-segment value grid; raw-integer deviation ANOVA."""
    from morphik_core_spark.operators.analytics import brown_forsythe_test

    cust = _t(spark, sf_dir, "customer")
    return brown_forsythe_test(cust, "c_mktsegment", "c_acctbal", value_scale=100)


def _q_seasonal_mk_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal Mann-Kendall (`analytics.seasonal_mann_kendall`,
    Hirsch & Slack, period 7): the weekly-cycle-proof trend test beside
    `mann_kendall`'s plain form — same-weekday pairs only, per-season
    tie-corrected variances summed. Two series (the injected-drift
    precedent): RAW daily volume (trend 'none') and the +50% tail
    uplift ('increasing')."""
    from morphik_core_spark.operators.analytics import seasonal_mann_kendall
    from morphik_core_spark.plans.cache import scoped_persist

    events = _t(spark, sf_dir, "events")
    d0 = scoped_persist(
        events.groupBy(
            F.expr("unix_micros(ts) div 86400000000").alias("di")
        ).agg(F.count(F.lit(1)).alias("x0"))
    )
    lo = d0.agg(F.min("di").alias("_dmin"))
    base = d0.join(F.broadcast(lo))
    # bounded day grid (see acf_daily): one collect per series
    raw = seasonal_mann_kendall(
        base.select("di", F.col("x0").alias("y")), "di", "y", period=7,
        collect_max_points=100_000,
    )
    uplifted = seasonal_mann_kendall(
        base.select(
            "di",
            (
                F.col("x0")
                + F.when(
                    F.col("di") >= F.col("_dmin") + 20, F.expr("x0 div 2")
                ).otherwise(F.lit(0))
            ).alias("y"),
        ),
        "di",
        "y",
        period=7,
        collect_max_points=100_000,
    )
    return raw.select(F.lit("raw").alias("series"), "*").unionByName(
        uplifted.select(F.lit("uplifted").alias("series"), "*")
    )


def _q_partial_corr_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order partial correlation (`analytics.partial_corr_3var`):
    per-user view and purchase counts, holding total activity fixed.
    Raw r(views, purchases) measures ~0 (the positive common-activity
    driver and the negative within-budget competition cancel); holding
    total events fixed exposes the competition (r_xy.z ~ -0.2 measured
    — more events of one type means fewer of the other inside a fixed
    budget). The numeric-confounder twin of `cmh_lang_exposure`'s
    stratified guard. One exact-moment pass over the per-user frame."""
    from morphik_core_spark.operators.analytics import partial_corr_3var

    events = _t(spark, sf_dir, "events")
    per_user = events.groupBy("user_id").agg(
        F.sum((F.col("event_type") == "view").cast("int")).alias("views"),
        F.sum((F.col("event_type") == "purchase").cast("int")).alias("purchases"),
        F.count(F.lit(1)).alias("total"),
    )
    return partial_corr_3var(per_user, "views", "purchases", "total")


def _q_cvm_price_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Cramér-von Mises statistic (`analytics.
    cvm_statistic`) between finished- and open-order prices in cents —
    the INTEGRATED CDF-gap companion to `ks_price_drift`'s sup-norm
    (many small distributed shifts register here without ever spiking
    the KS point). Exact integer gaps over the shared value grid, one
    final division."""
    from morphik_core_spark.operators.analytics import cvm_statistic
    from morphik_core_spark.plans.cache import scoped_persist

    orders = scoped_persist(_t(spark, sf_dir, "orders").select(
        "o_orderstatus",
        F.expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").alias("cents"),
    ))
    return cvm_statistic(
        orders.filter(F.col("o_orderstatus") == "F"),
        orders.filter(F.col("o_orderstatus") == "O"),
        "cents",
    )


def _q_wasserstein_price_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-D Wasserstein-1 distance (`analytics.wasserstein_1d`) between
    finished- and open-order prices — "how many DOLLARS did the
    distribution move", the value-unit answer beside `ks_price_drift`'s
    and `cvm_price_drift`'s unitless statistics. Integer |gap| x
    interval-width terms in DECIMAL(38,0) over the pooled cents grid;
    reported in dollars via value_scale=100 on a DECIMAL cents cast."""
    from morphik_core_spark.operators.analytics import wasserstein_1d
    from morphik_core_spark.plans.cache import scoped_persist

    orders = scoped_persist(_t(spark, sf_dir, "orders").select(
        "o_orderstatus",
        # cents as DOUBLE dollars/100-free: quantize inside the op at
        # scale 1 over the exact cents integers, then report /1 cents;
        # here we keep cents and scale=1 so w1 is IN CENTS, and divide
        # to dollars at the edge for the human-facing number
        F.expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").alias("cents"),
    ))
    w1 = wasserstein_1d(
        orders.filter(F.col("o_orderstatus") == "F"),
        orders.filter(F.col("o_orderstatus") == "O"),
        "cents",
    )
    return w1.select(
        "n_a",
        "n_b",
        F.round(F.col("w1") / F.lit(100.0), 6).alias("w1_dollars"),
    )


def _q_ad_price_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Anderson-Darling statistic (`analytics.ad_statistic`)
    between finished- and open-order prices in cents — the TAIL-
    weighted member of the drift family (KS = worst point, CvM =
    integrated gap, W1 = dollars moved, AD = tail-emphasized): the
    1/B(N-B) weight makes top-percentile shifts count. Scholz-Stephens
    midrank tie adjustment; doubled-integer cores, per-term 1e-12
    quantization, raw statistic (null thresholds are external)."""
    from morphik_core_spark.operators.analytics import ad_statistic
    from morphik_core_spark.plans.cache import scoped_persist

    orders = scoped_persist(_t(spark, sf_dir, "orders").select(
        "o_orderstatus",
        F.expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").alias("cents"),
    ))
    return ad_statistic(
        orders.filter(F.col("o_orderstatus") == "F"),
        orders.filter(F.col("o_orderstatus") == "O"),
        "cents",
    )


def _q_ad_k_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-sample Anderson-Darling omnibus drift test (`analytics.
    ad_k_statistic`, Scholz-Stephens midrank form) across the FIVE
    order priorities on dollar-grain prices — "did any segment's value
    distribution drift from the pool?" in one statistic instead of 10
    pairwise tests. Two series (the jt/mann_kendall injected-drift
    precedent): RAW (the generator's mild priority/price association —
    the baseline level) and a +$50k shift injected into priority 1
    (the statistic must dominate the baseline ~40x). Dense
    (group x pooled-value) spine on bucketed prefixes; doubled-midrank
    integer cores; per-term 1e-12 quantization."""
    from morphik_core_spark.operators.analytics import ad_k_statistic
    from morphik_core_spark.plans.cache import scoped_persist

    orders = scoped_persist(_t(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) div 100"
        ).alias("dollars"),
    ))
    # the shift moves values, never group membership: one size collect
    # (matching the operator's not-null filters) serves both series
    gtot = [
        (r[0], int(r[1]))
        for r in orders.filter(
            F.col("o_orderpriority").isNotNull() & F.col("dollars").isNotNull()
        )
        .groupBy(F.col("o_orderpriority").cast("string"))
        .agg(F.count(F.lit(1)))
        .collect()
    ]
    # bucket_width=4096: dollar-grain totalprice spans < 2^20, so the
    # cents-sized default would put EVERY pooled value in one bucket and
    # serialize the prefix pass on a single task (~150 buckets at this
    # range instead). cores_fit_long: N = |orders| ≤ 1.5e6 at the
    # driver's largest SF, far under the 2·N² < 2^63 int64 contract.
    # Both knobs are value-identical by construction (operator doc).
    # (A derive-the-shifted-pivot-from-the-raw-pivot variant was built
    # and measured NET-SLOWER at sf0.1 — 3.25 vs 2.64 s — because
    # `orders` is already persisted, so the "saved" second pivot is a
    # cached re-aggregation while the derivation adds two persists and
    # an explode+regroup; reverted.)
    # BOTH series through ONE operator chain (round-11 series_col): the
    # raw/shifted union carries a series tag, so the pivot shuffle, the
    # bucketed prefix pass and the final aggregation each run once
    # (grouped by series) instead of once per series — half the stages,
    # bit-identical per-series arithmetic (operator doc).
    tagged = orders.select(
        F.lit("raw").alias("series"), "o_orderpriority", "dollars"
    ).unionByName(
        orders.select(
            F.lit("shifted").alias("series"),
            "o_orderpriority",
            (
                F.col("dollars")
                + F.when(
                    F.col("o_orderpriority") == "1-URGENT", F.lit(50000)
                ).otherwise(F.lit(0))
            ).alias("dollars"),
        )
    )
    return ad_k_statistic(
        tagged,
        "o_orderpriority",
        "dollars",
        group_sizes=gtot,
        bucket_width=4096,
        cores_fit_long=True,
        series_col="series",
    ).select("series", "k", "n", "ad_k_stat").orderBy("series")


def _q_bartlett_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bartlett variance-homogeneity test (`analytics.bartlett_test`)
    over account balances by market segment — completing the spread
    triple with `levene_acctbal` (mean-centered) and
    `brown_forsythe_acctbal` (median-centered): Bartlett is the
    parametric, most-powerful-under-normality form, and DISAGREEMENT
    with Brown-Forsythe on the same column is itself the non-normality
    signal. Cents quantization; exact DECIMAL moments; per-group
    ln-terms quantized 1e-12 before the cross-group sum."""
    from morphik_core_spark.operators.analytics import bartlett_test

    cust = _t(spark, sf_dir, "customer")
    return bartlett_test(cust, "c_mktsegment", "c_acctbal", value_scale=100)


def _q_mood_median_doclen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's median test (`analytics.mood_median_test`) on document
    length by language — the outlier-proof one-bit sibling of
    `kruskal_doclen`: every document reduces to above/below the pooled
    lower median, so a handful of pathological giant documents cannot
    move the statistic at all (they can drag Kruskal's rank sums).
    Bucketed-prefix grand median; exact 2 x k counts; per-cell
    (O-E)^2/E quantized 1e-12."""
    from morphik_core_spark.operators.analytics import mood_median_test

    docs = _t(spark, sf_dir, "documents")
    # collected-grid fast path (kruskal_doclen's char-grain bound)
    return mood_median_test(docs, "lang", "n_chars", collect_max_cells=1_000_000)


def _q_durbin_watson_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson statistic (`analytics.durbin_watson`) on daily
    event volume — the single lag-1 serial-correlation number beside
    `acf_daily`'s correlogram and `ljung_box_daily`'s portmanteau
    (d ~ 2(1-r1): the tabulated-bounds diagnostic regression practice
    expects). Exact integer lag-difference numerator; exact-moment
    denominator; one double division."""
    from morphik_core_spark.operators.analytics import durbin_watson

    events = _t(spark, sf_dir, "events")
    daily = events.groupBy(
        F.expr("unix_micros(ts) div 86400000000").alias("di")
    ).agg(F.count(F.lit(1)).alias("y"))
    return durbin_watson(daily, "di", "y")


def _q_runs_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test (`analytics.runs_test`) on daily event
    volume around its lower median — the order-structure randomness
    check the drift family can't see (a series can pass KS/CvM/W1/AD
    against any reference and still be blatantly trending: too few
    sign runs). Median ties drop (standard); exact integer runs/counts;
    one double z tree."""
    from morphik_core_spark.operators.analytics import runs_test

    events = _t(spark, sf_dir, "events")
    daily = events.groupBy(
        F.expr("unix_micros(ts) div 86400000000").alias("di")
    ).agg(F.count(F.lit(1)).alias("y"))
    return runs_test(daily, "di", "y")


def _q_page_week_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page's L trend test (`analytics.page_trend_test`): does daily
    volume trend MONOTONICALLY across the week (blocks = calendar
    weeks, ordered treatments = day-of-week 0..6) — the ordered-
    alternative sibling of `friedman_dow_types` exactly as
    `jt_priority_price` is to `kruskal_doclen`. Two series (the
    friedman precedent): RAW (whatever weekly shape the generator has)
    and an injected +10%-per-weekday-index uplift (monotone by
    construction — z must blow up). Doubled within-block midranks;
    exact integer L2."""
    from morphik_core_spark.operators.analytics import page_trend_test
    from morphik_core_spark.plans.cache import scoped_persist

    events = _t(spark, sf_dir, "events")
    daily = scoped_persist(
        events.groupBy(
            F.expr("unix_micros(ts) div 86400000000").alias("di")
        )
        .agg(F.count(F.lit(1)).alias("x"))
        .select(
            F.expr("di div 7").alias("wk"),
            F.expr("CAST(di % 7 AS STRING)").alias("dow"),
            "x",
        )
    )
    # A series_col one-chain form was BUILT (operator support + tests
    # remain), measured a WASH-to-slight-regression at sf0.1 (min-of-12
    # 1.79 vs 1.50 s) and reverted — the friedman lesson: the union of
    # two one-row series already executes both chains concurrently in
    # one job, so merging bounded blocked-rank chains only adds keys.
    # collected-blocked fast path: weeks x 7 dow rows, contract-bounded
    raw = page_trend_test(daily, "wk", "dow", "x", collect_max_rows=200_000)
    uplifted = page_trend_test(
        daily.select(
            "wk",
            "dow",
            F.expr("(x * (10 + CAST(dow AS BIGINT))) div 10").alias("x"),
        ),
        "wk",
        "dow",
        "x",
        collect_max_rows=200_000,
    )
    return (
        raw.select(F.lit("raw").alias("series"), "k", "n_blocks", "page_l", "z")
        .unionByName(
            uplifted.select(
                F.lit("uplifted").alias("series"), "k", "n_blocks", "page_l", "z"
            )
        )
        .orderBy("series")
    )


def _q_page_hinkley_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley sequential change alarm (`analytics.page_hinkley`)
    on daily event volume NORMALIZED to per-mille of its own global
    mean (so one (delta, lambda) pair is meaningful at every sf —
    Poisson relative noise shrinks with scale, absolute thresholds
    don't travel). Two series (the friedman/jt precedent): RAW (the
    alarm should stay quiet on the generator's stationary series) and
    a +50% uplift injected into the second half of the days (the
    detector MUST alarm after the shift point). Exact micro-integer
    accumulator; streaming twin `streaming.stateful.
    page_hinkley_stream` replays it bit-for-bit."""
    from morphik_core_spark.operators.analytics import page_hinkley
    from morphik_core_spark.plans.cache import scoped_persist

    events = _t(spark, sf_dir, "events")
    daily = events.groupBy(
        F.expr("unix_micros(ts) div 86400000000").alias("di")
    ).agg(F.count(F.lit(1)).alias("y"))
    tot = daily.agg(
        F.sum("y").alias("sy"), F.count(F.lit(1)).alias("nd"),
        F.min("di").alias("d0"), F.max("di").alias("d1"),
    )
    norm = scoped_persist(
        daily.join(F.broadcast(tot)).select(
            "di",
            F.expr(
                "CAST(ROUND(CAST(y AS DOUBLE) * 1000.0 "
                "/ (CAST(sy AS DOUBLE) / CAST(nd AS DOUBLE))) AS BIGINT)"
            ).alias("x"),
            F.expr("(d0 + d1 + 1) div 2").alias("mid"),
        )
    )
    # BOTH series through ONE operator chain (round-11 series_col): the
    # raw/shifted union carries a series tag, so the running-prefix
    # window pass and the final aggregation each run once (partitioned/
    # grouped by series) — bit-identical per-series arithmetic
    # (operator doc).
    tagged = norm.select(
        F.lit("raw").alias("series"), "di", "x"
    ).unionByName(
        norm.select(
            F.lit("shifted").alias("series"),
            "di",
            F.expr("CASE WHEN di >= mid THEN (x * 3) div 2 ELSE x END").alias("x"),
        )
    )
    return page_hinkley(
        tagged, "di", "x", delta=20.0, lam=2000.0, series_col="series"
    ).orderBy("series")


def _ph_oracle_series_sql(x_expr: str, label: str) -> str:
    """One page_hinkley_daily series: the windowed accumulator —
    `analytics.page_hinkley` verbatim (per-mille normalization, exact
    micro-integer deviations, running min, alarm bookkeeping)."""
    dev = (
        "CAST(ROUND((CAST(x AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(k AS DOUBLE) "
        "- CAST(20.0 AS DOUBLE)) * 1e6) AS BIGINT)"
    )
    return f"""
            SELECT '{label}' AS series, * FROM (
            WITH d AS (
                SELECT epoch_us(ts) // 86400000000 AS di, COUNT(*) AS y
                FROM events GROUP BY 1
            ),
            tot AS (
                SELECT SUM(y) AS sy, COUNT(*) AS nd,
                       MIN(di) AS d0, MAX(di) AS d1
                FROM d
            ),
            norm AS (
                SELECT di,
                       CAST(ROUND(CAST(y AS DOUBLE) * 1000.0
                            / (CAST(sy AS DOUBLE) / CAST(nd AS DOUBLE))) AS BIGINT) AS x0,
                       (d0 + d1 + 1) // 2 AS mid
                FROM d CROSS JOIN tot
            ),
            ser AS (SELECT di, {x_expr} AS x FROM norm),
            pre AS (
                SELECT di, x,
                       SUM(x) OVER (ORDER BY di ASC ROWS UNBOUNDED PRECEDING) AS s1,
                       COUNT(*) OVER (ORDER BY di ASC ROWS UNBOUNDED PRECEDING) AS k
                FROM ser
            ),
            acc AS (
                SELECT di,
                       SUM({dev}) OVER (ORDER BY di ASC ROWS UNBOUNDED PRECEDING) AS m
                FROM pre
            ),
            exc AS (
                SELECT di, m,
                       m - MIN(m) OVER (ORDER BY di ASC ROWS UNBOUNDED PRECEDING) AS e
                FROM acc
            ),
            flagged AS (
                SELECT di, e,
                       CASE WHEN CAST(e AS DOUBLE) > 2000.0 * 1e6 THEN 1 ELSE 0 END AS alarm
                FROM exc
            )
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(alarm) AS BIGINT) AS n_alarms,
                   CAST(MIN(CASE WHEN alarm = 1 THEN di END) AS BIGINT) AS first_alarm_idx,
                   ROUND(CAST(MAX(e) AS DOUBLE) / 1e6, 6) AS max_excess
            FROM flagged
            )
    """


def _q_cochran_q_dow_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q (`analytics.cochran_q`): reduce each (day, event
    type) cell to ONE BIT — was this an above-median day for that type
    (vs the type's own lower-median daily volume) — and ask whether the
    k types differ in above-median-day RATE within day blocks. The
    binary sibling of `friedman_dow_types` (ranks) and
    `kendall_w_dow_types` (concordance); everything integer to one
    division."""
    from pyspark.sql import Window

    from morphik_core_spark.operators.analytics import cochran_q
    from morphik_core_spark.plans.cache import scoped_persist

    events = _t(spark, sf_dir, "events")
    daily = scoped_persist(
        events.groupBy(
            F.expr("unix_micros(ts) div 86400000000").alias("di"),
            "event_type",
        ).agg(F.count(F.lit(1)).alias("x"))
    )
    # per-type lower median of its daily counts (type x count grid,
    # bounded; the brown_forsythe cum*2 >= n convention)
    grid = daily.groupBy("event_type", "x").agg(F.count(F.lit(1)).alias("c"))
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy(F.col("x").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_n = Window.partitionBy("event_type")
    med = (
        grid.withColumn("cum", F.sum("c").over(w_cum))
        .withColumn("nt", F.sum("c").over(w_n))
        .filter(F.expr("cum * 2 >= nt"))
        .groupBy("event_type")
        .agg(F.min("x").alias("med"))
    )
    flags = daily.join(F.broadcast(med), "event_type").select(
        "di", "event_type", (F.col("x") > F.col("med")).cast("int").alias("f")
    )
    # collected-blocked fast path: days x types flags, contract-bounded
    return cochran_q(flags, "di", "event_type", "f", collect_max_rows=200_000)


def _q_lilliefors_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lilliefors one-sample normality statistic (`analytics.
    lilliefors_stat`) on the same two columns as `dagostino_profiles`
    (near-normal daily volume, skewed document length) — the CDF-shape
    check beside the moments check: together they split "non-normal
    because skewed/kurtotic" from "non-normal in shape with normal
    moments". Shared A&S Phi tree, bucketed-prefix ECDF, raw statistic
    (the ~0.886/sqrt(n) 5% bound is external)."""
    from morphik_core_spark.operators.analytics import lilliefors_stat

    events = _t(spark, sf_dir, "events")
    daily = events.groupBy(
        F.expr("unix_micros(ts) div 86400000000").alias("di")
    ).agg(F.count(F.lit(1)).alias("y"))
    docs = _t(spark, sf_dir, "documents")
    # collected-grid fast path: day-grain / char-grain value grids
    a = lilliefors_stat(daily, "y", collect_max_cells=1_000_000)
    b = lilliefors_stat(docs, "n_chars", collect_max_cells=1_000_000)
    return (
        a.select(F.lit("daily_volume").alias("series"), "n", "mean", "std", "d_stat")
        .unionByName(
            b.select(F.lit("doc_length").alias("series"), "n", "mean", "std", "d_stat")
        )
        .orderBy("series")
    )


def _lilliefors_oracle_series_sql(src_sql: str, label: str) -> str:
    """One lilliefors_profiles series: ECDF grid + the SAME A&S 26.2.17
    Phi expression the Spark plan uses (`analytics._AS_NORMAL_SF`) —
    exp/+,*,/ only, bit-identical doubles across engines."""
    from morphik_core_spark.operators.analytics import _AS_NORMAL_SF

    nd = "CAST(n AS DOUBLE)"
    mean = f"(CAST(s1 AS DOUBLE) / {nd})"
    s = (
        f"(sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / {nd}) "
        f"/ ({nd} - 1.0)))"
    )
    z = f"((CAST(v AS DOUBLE) - {mean}) / {s})"
    sf = _AS_NORMAL_SF.format(z=f"abs({z})")
    phi = f"(CASE WHEN {z} >= 0.0 THEN 1.0 - {sf} ELSE {sf} END)"
    gap = (
        f"greatest(CAST(cum AS DOUBLE) / {nd} - {phi}, "
        f"{phi} - CAST(cum - lv AS DOUBLE) / {nd})"
    )
    den_ok = (
        f"(CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / {nd})"
    )
    guard = f"n < 4 OR {den_ok} <= 0"
    return f"""
            SELECT '{label}' AS series, * FROM (
            WITH vals AS (
                SELECT v, COUNT(*) AS lv FROM ({src_sql}) GROUP BY 1
            ),
            mom AS (
                SELECT SUM(lv) AS n,
                       SUM(CAST(v AS HUGEINT) * lv) AS s1,
                       SUM(CAST(v AS HUGEINT) * v * lv) AS s2
                FROM vals
            ),
            cums AS (
                SELECT v, lv,
                       SUM(lv) OVER (ORDER BY v ASC ROWS UNBOUNDED PRECEDING) AS cum
                FROM vals
            ),
            agg AS (
                SELECT MAX(n) AS n, MAX(s1) AS s1, MAX(s2) AS s2,
                       MAX(CASE WHEN {den_ok} <= 0 THEN NULL ELSE {gap} END) AS d
                FROM cums CROSS JOIN mom
            )
            SELECT CAST(n AS BIGINT) AS n,
                   CASE WHEN {guard} THEN NULL ELSE ROUND({mean}, 6) END AS mean,
                   CASE WHEN {guard} THEN NULL ELSE ROUND({s}, 6) END AS std,
                   CASE WHEN {guard} THEN NULL ELSE ROUND(d, 6) END AS d_stat
            FROM agg
            )
    """


def _q_cronbach_dow_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cronbach's alpha (`analytics.cronbach_alpha`) treating the event
    types as k parallel "items" each measuring daily traffic — the
    internal-consistency question beside `rater_agreement`'s kappa: if
    the type series all follow the shared daily-volume construct, alpha
    is high; independent per-type noise drives it toward 0. Implicit
    zero cells are exact (count semantics); exact DECIMAL moments with
    per-item variance terms quantized 1e-12."""
    from morphik_core_spark.operators.analytics import cronbach_alpha

    events = _t(spark, sf_dir, "events")
    rows = events.select(
        F.expr("unix_micros(ts) div 86400000000").alias("di"),
        "event_type",
        F.lit(1).alias("one"),
    )
    return cronbach_alpha(rows, "di", "event_type", "one")


def _q_kendall_w_dow_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's W concordance (`analytics.kendall_w`): how strongly do
    the days AGREE on the ranking of the event types — the 0..1
    effect-size companion to `friedman_dow_types`' significance
    statistic, sharing its doubled-midrank machinery and adding the
    classical tie correction. chi2 = m(k-1)W rides along."""
    from morphik_core_spark.operators.analytics import kendall_w
    from morphik_core_spark.plans.cache import scoped_persist

    events = _t(spark, sf_dir, "events")
    daily = scoped_persist(
        events.groupBy(
            F.expr("unix_micros(ts) div 86400000000").alias("di"),
            "event_type",
        ).agg(F.count(F.lit(1)).alias("x"))
    )
    # collected-blocked fast path: days x types rows, contract-bounded
    return kendall_w(daily, "di", "event_type", "x", collect_max_rows=200_000)


def _q_theta_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-method one-step forecast backtest (`analytics.
    theta_forecast`, alpha 0.5) over daily event volume — the M3
    classic completing the forecasting family (holt_linear additive
    trend, Holt-Winters additive/multiplicative seasonal, theta = SES
    + half the expanding OLS drift). Driver-side integer-micro
    recursion with exact integer prefix sums for the slope."""
    from morphik_core_spark.operators.analytics import theta_forecast

    events = _t(spark, sf_dir, "events")
    daily = events.groupBy(
        F.expr("unix_micros(ts) div 86400000000").alias("di")
    ).agg(F.count(F.lit(1)).alias("y"))
    return theta_forecast(daily, "di", "y", alpha=0.5)


def _theta_oracle_sql(alpha: float = 0.5) -> str:
    """Generate the theta_daily oracle: the holt-family recursive-CTE
    pattern carrying the exact integer prefix sums (Σi, Σy, Σiy, Σi²)
    plus the SES level — `analytics.theta_forecast` verbatim (the
    emitted level is the PRE-update l_{t-1}, carried as lprev)."""
    a = f"CAST({alpha!r} AS DOUBLE)"
    om = f"CAST({1.0 - alpha!r} AS DOUBLE)"
    drift = (
        "CAST(ROUND(0.5 * (CAST(th.rn * th.siy - th.si * th.sy AS DOUBLE) * 1000000.0 "
        "/ CAST(th.rn * th.sii - th.si * th.si AS DOUBLE))) AS BIGINT)"
    )
    lnew = f"CAST(ROUND({a} * (o.y * 1000000) + {om} * th.l) AS BIGINT)"
    return f"""
            WITH RECURSIVE d AS (
                SELECT epoch_us(ts) // 86400000000 AS di, COUNT(*) AS y
                FROM events GROUP BY 1
            ),
            o AS (SELECT di, y, ROW_NUMBER() OVER (ORDER BY di) AS rn FROM d),
            n AS (SELECT COUNT(*) AS nn FROM o),
            th(rn, l, lprev, si, sy, siy, sii, drift, f) AS (
                SELECT 1,
                       CAST(y * 1000000 AS BIGINT), CAST(NULL AS BIGINT),
                       CAST(di AS HUGEINT), CAST(y AS HUGEINT),
                       CAST(di AS HUGEINT) * y, CAST(di AS HUGEINT) * di,
                       CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
                FROM o WHERE rn = 1
                UNION ALL
                SELECT th.rn + 1,
                       {lnew},
                       th.l,
                       th.si + o.di, th.sy + o.y,
                       th.siy + CAST(o.di AS HUGEINT) * o.y,
                       th.sii + CAST(o.di AS HUGEINT) * o.di,
                       CASE WHEN th.rn >= 2 THEN {drift} ELSE CAST(NULL AS BIGINT) END,
                       CASE WHEN th.rn >= 2 THEN th.l + {drift} ELSE CAST(NULL AS BIGINT) END
                FROM th JOIN o ON o.rn = th.rn + 1 CROSS JOIN n
                WHERE th.rn < n.nn
            )
            SELECT o.di, o.y,
                   ROUND(CAST(th.lprev AS DOUBLE) / 1e6, 6) AS level,
                   ROUND(CAST(th.drift AS DOUBLE) / 1e6, 6) AS drift,
                   ROUND(CAST(th.f AS DOUBLE) / 1e6, 6) AS forecast,
                   ROUND(CAST(o.y * 1000000 - th.f AS DOUBLE) / 1e6, 6) AS error
            FROM th JOIN o ON o.rn = th.rn
            WHERE th.rn >= 3
            ORDER BY o.di
        """


def _q_wilcoxon_wow_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test (`analytics.wilcoxon_signed_rank`) on
    week-over-week daily volume: pairs = (day t, day t-7) matched BY
    day index (an explicit di = di+7 self-join, not a row-order lag —
    missing days must not mis-pair), d = this week minus same weekday
    last week. The paired member of the rank family: seasonal weekday
    shape cancels inside each pair, so a genuine level shift shows as
    sign-rank asymmetry. Doubled |d| midranks, tie-corrected variance,
    zeros drop."""
    from morphik_core_spark.operators.analytics import wilcoxon_signed_rank
    from morphik_core_spark.plans.cache import scoped_persist

    events = _t(spark, sf_dir, "events")
    daily = scoped_persist(
        events.groupBy(
            F.expr("unix_micros(ts) div 86400000000").alias("di")
        ).agg(F.count(F.lit(1)).alias("y"))
    )
    cur = daily.select(F.col("di").alias("di"), F.col("y").alias("x"))
    prev = daily.select((F.col("di") + 7).alias("di"), F.col("y").alias("yprev"))
    pairs = cur.join(prev, "di")
    return wilcoxon_signed_rank(pairs, "x", "yprev")


def _q_welch_anova_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch heteroscedastic ANOVA (`analytics.welch_anova`) on account
    balances by market segment — the location test that stays honest
    exactly when `bartlett_acctbal`/`brown_forsythe_acctbal` reject
    equal variances (classic pooled ANOVA is anti-conservative there).
    Cents quantization; micro-quantized precision weights; exact
    DECIMAL moments."""
    from morphik_core_spark.operators.analytics import welch_anova

    cust = _t(spark, sf_dir, "customer")
    return welch_anova(cust, "c_mktsegment", "c_acctbal", value_scale=100)


def _q_dagostino_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D'Agostino-Pearson K^2 normality gate (`analytics.dagostino_k2`)
    on two deliberately different columns: daily event volume (Poisson
    with a large mean — the near-normal case the parametric path
    accepts) and document length (skewed — Z1 must light up). The gate
    that decides parametric vs rank path for every other test in the
    family. One exact-DECIMAL moment pass per series; the Z1/Z2/K2
    double tree is generated once and shared verbatim with the DuckDB
    oracle."""
    from morphik_core_spark.operators.analytics import dagostino_k2

    events = _t(spark, sf_dir, "events")
    daily = events.groupBy(
        F.expr("unix_micros(ts) div 86400000000").alias("di")
    ).agg(F.count(F.lit(1)).alias("y"))
    docs = _t(spark, sf_dir, "documents")
    a = dagostino_k2(daily, "y")
    b = dagostino_k2(docs, "n_chars")
    return (
        a.select(F.lit("daily_volume").alias("series"), "n", "skew_z", "kurt_z", "k2_stat")
        .unionByName(
            b.select(F.lit("doc_length").alias("series"), "n", "skew_z", "kurt_z", "k2_stat")
        )
        .orderBy("series")
    )


def _q_hl_quantity_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges-Lehmann shift estimator (`analytics.hodges_lehmann_shift`)
    between returned and non-returned line-item quantities — the SIZE
    companion to the rank/drift detectors on a genuinely bounded value
    domain (quantity 1..50, so the difference grid is at most 50 x 50
    — the enforced-contract case, unlike near-unique money). Two
    series: RAW (the generator draws quantity independent of return
    flag — shift 0) and an injected +7 shift (the estimator must
    report exactly 7 on top of raw)."""
    from morphik_core_spark.operators.analytics import (
        hl_value_grids,
        hodges_lehmann_shift,
    )
    from morphik_core_spark.plans.cache import scoped_persist

    li = scoped_persist(
        _t(spark, sf_dir, "lineitem").select(
            "l_returnflag", F.col("l_quantity").cast("bigint").alias("q")
        )
    )
    r_side = li.filter(F.col("l_returnflag") == "R").select("q")
    n_side = li.filter(F.col("l_returnflag") == "N").select("q")
    # build the per-value count grids ONCE (round-11): a +7 bigint shift
    # is an injective projection, so the shifted series' ga is the raw
    # grid with _x+7 and gb is shared outright — one grid build instead
    # of two, and the size collects run on the tiny persisted grids
    # (matching the operator's own fallback aggregation exactly)
    ga, gb = hl_value_grids(r_side, n_side, "q")
    # ONE driver action for both grid-size pairs (two agg subtrees in a
    # single union plan, rows keyed by a side tag rather than union
    # order): each collect is a whole job round-trip (~0.4 s of
    # construction each at sf0.1), and the persisted grids serve both
    sz = {
        r["g"]: (int(r["c"]), int(r["s"]))
        for r in ga.agg(F.count(F.lit(1)).alias("c"), F.sum("_ca").alias("s"))
        .select(F.lit("a").alias("g"), "c", "s")
        .unionAll(
            gb.agg(F.count(F.lit(1)).alias("c"), F.sum("_cb").alias("s")).select(
                F.lit("b").alias("g"), "c", "s"
            )
        )
        .collect()
    }
    (n_x, n_a), (n_y, n_b) = sz["a"], sz["b"]
    sizes = (int(n_x), int(n_a), int(n_y), int(n_b))
    # BOTH series through ONE operator chain (round-11 series_grids):
    # the tagged raw/+7-projected grids pair via a broadcast equi-join
    # on the tag, so the diff-grid groupBy, the bucketed prefix pass
    # and the final conditional aggregation each run once (grouped by
    # series) instead of once per series — bit-identical per-series
    # arithmetic (operator doc).
    return hodges_lehmann_shift(
        r_side,
        n_side,
        "q",
        sizes=sizes,
        series_grids=[
            ("raw", ga, gb),
            ("shifted", ga.select((F.col("_x") + F.lit(7)).alias("_x"), "_ca"), gb),
        ],
    ).orderBy("series")


def _hl_oracle_series_sql(a_val: str, label: str) -> str:
    """One hl_quantity_shift series: weighted median of the bounded
    difference grid — `analytics.hodges_lehmann_shift` verbatim
    (HUGEINT pair weights, lower/upper middle averaged)."""
    return f"""
            SELECT '{label}' AS series, * FROM (
            WITH ga AS (
                SELECT {a_val} AS x, COUNT(*) AS ca FROM lineitem
                WHERE l_returnflag = 'R' GROUP BY 1
            ),
            gb AS (
                SELECT CAST(l_quantity AS BIGINT) AS y, COUNT(*) AS cb FROM lineitem
                WHERE l_returnflag = 'N' GROUP BY 1
            ),
            diffs AS (
                SELECT x - y AS d, SUM(CAST(ca AS HUGEINT) * cb) AS w
                FROM ga CROSS JOIN gb GROUP BY 1
            ),
            cums AS (
                SELECT d, SUM(w) OVER (ORDER BY d ASC ROWS UNBOUNDED PRECEDING) AS cum
                FROM diffs
            ),
            tot AS (
                SELECT (SELECT SUM(ca) FROM ga) AS n_a,
                       (SELECT SUM(cb) FROM gb) AS n_b
            ),
            lo AS (
                SELECT MIN(d) AS dlo FROM cums CROSS JOIN tot
                WHERE cum >= (n_a * n_b + 1) // 2
            ),
            hi AS (
                SELECT MIN(d) AS dhi FROM cums CROSS JOIN tot
                WHERE cum >= n_a * n_b // 2 + 1
            )
            SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
                   ROUND((CAST(dlo AS DOUBLE) + CAST(dhi AS DOUBLE)) / 2.0, 6) AS hl_shift
            FROM tot CROSS JOIN lo CROSS JOIN hi
            )
    """


def _dagostino_oracle_series_sql(src_sql: str, label: str) -> str:
    """One dagostino_profiles series: exact HUGEINT raw moments plus
    the Z1/Z2/K2 double tree generated by the SAME
    `analytics._dagostino_k2_exprs` the Spark plan uses — parity is
    structural, not coincidental."""
    from morphik_core_spark.operators.analytics import _dagostino_k2_exprs

    nd = "CAST(n AS DOUBLE)"
    mean = f"(CAST(r1 AS DOUBLE) / {nd})"
    m2 = f"(CAST(r2 AS DOUBLE) / {nd} - {mean} * {mean})"
    m3 = (
        f"(CAST(r3 AS DOUBLE) / {nd} - 3.0 * {mean} * CAST(r2 AS DOUBLE) / {nd} "
        f"+ 2.0 * {mean} * {mean} * {mean})"
    )
    m4 = (
        f"(CAST(r4 AS DOUBLE) / {nd} - 4.0 * {mean} * CAST(r3 AS DOUBLE) / {nd} "
        f"+ 6.0 * {mean} * {mean} * CAST(r2 AS DOUBLE) / {nd} "
        f"- 3.0 * {mean} * {mean} * {mean} * {mean})"
    )
    z1, z2, k2 = _dagostino_k2_exprs(nd, m2, m3, m4)
    guard = f"n < 20 OR {m2} <= 0"
    return f"""
            SELECT '{label}' AS series, * FROM (
            WITH agg AS (
                SELECT COUNT(*) AS n,
                       SUM(CAST(v AS HUGEINT)) AS r1,
                       SUM(CAST(v AS HUGEINT) * v) AS r2,
                       SUM(CAST(v AS HUGEINT) * v * v) AS r3,
                       SUM(CAST(v AS HUGEINT) * v * v * v) AS r4
                FROM ({src_sql})
            )
            SELECT CAST(n AS BIGINT) AS n,
                   CASE WHEN {guard} THEN NULL ELSE ROUND({z1}, 6) END AS skew_z,
                   CASE WHEN {guard} THEN NULL ELSE ROUND({z2}, 6) END AS kurt_z,
                   CASE WHEN {guard} THEN NULL ELSE ROUND({k2}, 6) END AS k2_stat
            FROM agg
            )
    """


def _page_oracle_series_sql(val_expr: str, label: str) -> str:
    """One page_week_dow series: Page's L over doubled within-block
    midranks on the (week x day-of-week) grid — `analytics.
    page_trend_test` verbatim (friedman's rank machinery + the
    classical no-tie moments, HUGEINT cores, identical double trees)."""
    kd, nd = "CAST(k AS DOUBLE)", "CAST(n_blocks AS DOUBLE)"
    el = f"({nd} * {kd} * ({kd} + 1.0) * ({kd} + 1.0) / 4.0)"
    vl = (
        f"({nd} * ({kd} * {kd} * {kd} - {kd}) * ({kd} * {kd} * {kd} - {kd}) "
        f"/ (144.0 * ({kd} - 1.0)))"
    )
    return f"""
            SELECT '{label}' AS series, * FROM (
            WITH daily0 AS (
                SELECT epoch_us(ts) // 86400000000 AS di,
                       CAST(COUNT(*) AS BIGINT) AS x0
                FROM events GROUP BY 1
            ),
            daily AS (
                SELECT CAST(di // 7 AS VARCHAR) AS b,
                       CAST(di % 7 AS VARCHAR) AS t,
                       CAST({val_expr} AS BIGINT) AS v
                FROM daily0
            ),
            kt AS (SELECT COUNT(DISTINCT t) AS k_total FROM daily),
            full_blocks AS (
                SELECT b FROM daily GROUP BY b
                HAVING COUNT(DISTINCT t) = (SELECT k_total FROM kt)
            ),
            rows_ AS (
                SELECT d.b, d.t, d.v FROM daily d
                SEMI JOIN full_blocks fb ON d.b = fb.b
            ),
            grid AS (SELECT b, v, COUNT(*) AS c FROM rows_ GROUP BY 1, 2),
            rg AS (
                SELECT b, v,
                       2 * COALESCE(SUM(c) OVER (PARTITION BY b ORDER BY v ASC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       + c + 1 AS r2
                FROM grid
            ),
            ranked AS (
                SELECT r.b, r.t, g.r2 FROM rows_ r
                JOIN rg g ON r.b = g.b AND r.v = g.v
            ),
            per_t AS (SELECT t, SUM(CAST(r2 AS HUGEINT)) AS R2 FROM ranked GROUP BY 1),
            scored AS (
                SELECT R2, ROW_NUMBER() OVER (ORDER BY t ASC) AS w FROM per_t
            ),
            nb AS (SELECT COUNT(DISTINCT b) AS n_blocks FROM rows_),
            agg AS (
                SELECT COUNT(*) AS k, SUM(CAST(w AS HUGEINT) * R2) AS L2
                FROM scored
            )
            SELECT CAST(k AS BIGINT) AS k, CAST(n_blocks AS BIGINT) AS n_blocks,
                   CAST(L2 AS DOUBLE) / 2.0 AS page_l,
                   CASE WHEN k < 2 OR n_blocks = 0 OR {vl} <= 0 THEN NULL ELSE
                   ROUND((CAST(L2 AS DOUBLE) / 2.0 - {el}) / sqrt({vl}), 6) END AS z
            FROM agg CROSS JOIN nb
            )
    """


def _adk_oracle_series_sql(val_expr: str, label: str) -> str:
    """One ad_k_priority series: the Scholz-Stephens k-sample midrank
    A2kN over the dense (priority x pooled dollar) spine —
    `analytics.ad_k_statistic` verbatim (HUGEINT cores mirroring the
    Spark DECIMAL(38,0) exact integers, identical double trees,
    per-term ROUND(·1e12) quantization)."""
    return f"""
            SELECT '{label}' AS series, * FROM (
            WITH cells AS (
                SELECT g, v, COUNT(*) AS c FROM (
                    SELECT o_orderpriority AS g, {val_expr} AS v FROM orders
                ) GROUP BY 1, 2
            ),
            vals AS (SELECT v, SUM(c) AS lv FROM cells GROUP BY 1),
            pooled AS (
                SELECT v, lv,
                       SUM(lv) OVER (ORDER BY v ASC ROWS UNBOUNDED PRECEDING) AS cum
                FROM vals
            ),
            grp AS (SELECT g, SUM(c) AS ng FROM cells GROUP BY 1),
            tot AS (SELECT SUM(lv) AS n FROM vals),
            spine AS (
                SELECT grp.g, grp.ng, p.v, p.lv, p.cum, COALESCE(c.c, 0) AS c
                FROM grp CROSS JOIN pooled p
                LEFT JOIN cells c ON c.g = grp.g AND c.v = p.v
            ),
            cums AS (
                SELECT *,
                       SUM(c) OVER (PARTITION BY g ORDER BY v ASC
                                    ROWS UNBOUNDED PRECEDING) AS cumg
                FROM spine
            ),
            cores AS (
                SELECT lv, ng, n,
                       CAST(2 * cum - lv AS HUGEINT)
                           * (2 * n - (2 * cum - lv))
                           - CAST(n AS HUGEINT) * lv AS den,
                       CAST(n AS HUGEINT) * (2 * cumg - c)
                           - CAST(ng AS HUGEINT) * (2 * cum - lv) AS num
                FROM cums CROSS JOIN tot
            ),
            terms AS (
                SELECT n,
                       CASE WHEN den <= 0 THEN CAST(0 AS BIGINT) ELSE
                       CAST(ROUND(CAST(lv AS DOUBLE) * CAST(num AS DOUBLE) * CAST(num AS DOUBLE)
                            / (CAST(ng AS DOUBLE) * CAST(n AS DOUBLE) * CAST(den AS DOUBLE))
                            * 1e12) AS BIGINT) END AS t
                FROM cores
            ),
            agg AS (
                SELECT (SELECT COUNT(*) FROM grp) AS k,
                       MAX(n) AS n, SUM(t) AS s
                FROM terms
            )
            SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
                   ROUND((CAST(n AS DOUBLE) - 1.0) / CAST(n AS DOUBLE)
                         * (CAST(s AS DOUBLE) / 1e12), 6) AS ad_k_stat
            FROM agg
            )
    """


# The driver's CORRECTNESS gate checks only the FIRST 50 ``queries()``
# entries, so each round rotates 50 names to the front (the local gate
# tests/test_oracle_parity.py covers every entry regardless of order).
# Round-11 window: 0 red carried (r10 was 50/50 green); the 14 round-10
# additions (the only never-driver-checked queries, all judge-verified
# exact-value at the driver's sf0.01 in the round-10 session) rotate in —
# this reaches 295/295 cumulative driver coverage. The remaining 36 slots
# re-verify the queries whose last green driver row is oldest (all 35
# r05-vintage + the first r06-vintage name, registry order within vintage).
_DRIVER_WINDOW = [
    # 14 never-driver-checked round-10 additions
    "pacf_daily", "chi_posthoc_priority", "ivm_join_both",
    "kendall_chars_tokens", "cochran_priority_trend", "jt_priority_price",
    "cmh_lang_exposure", "friedman_dow_types", "brown_forsythe_acctbal",
    "seasonal_mk_daily", "partial_corr_user_activity", "cvm_price_drift",
    "wasserstein_price_drift", "ad_price_drift",
    # 36 re-verify slots: oldest last-green rows first (r05 vintage,
    # registry order …)
    "folder_children", "folder_descendants", "hll_distinct",
    "cms_heavy_hitters", "pmi_bigrams", "span_dedup", "bloom_semi_join",
    "funnel_steps", "cohort_retention", "value_histogram", "anomaly_stats",
    "nation_pagerank", "quantile_estimate", "sliding_window_agg",
    "scd2_intervals", "cube_counts", "semantic_dedup", "knn_sq8",
    "late_ship_priority", "waiting_suppliers", "nfc_normalize",
    "langid_confusion", "dup_rate_by_source", "semantic_outliers",
    "tfidf_topterms", "dsir_weights", "ppl_buckets", "hard_negatives",
    "matryoshka_topk", "embedding_covariance", "quality_classifier",
    "semantic_decontaminate", "temperature_mixture", "min_cost_supplier",
    "regional_supplier_volume",
    # … then r06 vintage, registry order
    "moving_aggregates",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    base = _queries_unordered()
    ordered = {k: base[k] for k in _DRIVER_WINDOW}
    ordered.update((k, v) for k, v in base.items() if k not in ordered)
    return ordered


def _queries_unordered() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "asof_backward": _q_asof_backward,
        "asof_forward": _q_asof_forward,
        "upsert_docs": _q_upsert_docs,
        "folder_move": _q_folder_move,
        "batch_get": _q_batch_get,
        "padding_grouped": _q_padding_grouped,
        "requeue_failed": _q_requeue_failed,
        "storage_rollup": _q_storage_rollup,
        "filename_fts": _q_filename_fts,
        "pricing_summary": _q_pricing_summary,
        "bm25_topk": _q_bm25_topk,
        "pii_scrub": _q_pii_scrub,
        "perplexity": _q_perplexity,
        "knn_pq": _q_knn_pq,
        "paragraph_dedup": _q_paragraph_dedup,
        "url_filter": _q_url_filter,
        "gapfill_locf": _q_gapfill_locf,
        "shipping_priority": _q_shipping_priority,
        "weighted_sample": _q_weighted_sample,
        "sessionization": _q_sessionization,
        "rollup_counts": _q_rollup_counts,
        "pivot_counts": _q_pivot_counts,
        "typed_filter_docs": _q_typed_filter_docs,
        "folder_summary": _q_folder_summary,
        "distinct_counts": _q_distinct_counts,
        "usage_rollup": _q_usage_rollup,
        "folder_children": _q_folder_children,
        "folder_descendants": _q_folder_descendants,
        "hll_distinct": _q_hll_distinct,
        "cms_heavy_hitters": _q_cms_heavy_hitters,
        "pmi_bigrams": _q_pmi_bigrams,
        "span_dedup": _q_span_dedup,
        "moving_aggregates": _q_moving_aggregates,
        "bloom_semi_join": _q_bloom_semi_join,
        "funnel_steps": _q_funnel_steps,
        "cohort_retention": _q_cohort_retention,
        "value_histogram": _q_value_histogram,
        "anomaly_stats": _q_anomaly_stats,
        "nation_pagerank": _q_nation_pagerank,
        "quantile_estimate": _q_quantile_estimate,
        "sliding_window_agg": _q_sliding_window_agg,
        "scd2_intervals": _q_scd2_intervals,
        "cube_counts": _q_cube_counts,
        "semantic_dedup": _q_semantic_dedup,
        "knn_sq8": _q_knn_sq8,
        "small_quantity_revenue": _q_small_quantity_revenue,
        "large_order_customers": _q_large_order_customers,
        "late_ship_priority": _q_late_ship_priority,
        "waiting_suppliers": _q_waiting_suppliers,
        "nfc_normalize": _q_nfc_normalize,
        "langid_confusion": _q_langid_confusion,
        "dup_rate_by_source": _q_dup_rate_by_source,
        "semantic_outliers": _q_semantic_outliers,
        "range_window_agg": _q_range_window_agg,
        "tfidf_topterms": _q_tfidf_topterms,
        "dsir_weights": _q_dsir_weights,
        "ppl_buckets": _q_ppl_buckets,
        "hard_negatives": _q_hard_negatives,
        "matryoshka_topk": _q_matryoshka_topk,
        "embedding_covariance": _q_embedding_covariance,
        "semi_join_auth": _q_semi_join_auth,
        "hydration_join": _q_hydration_join,
        "in_transit_by_day": _q_in_transit_by_day,
        "kmv_source_overlap": _q_kmv_source_overlap,
        "c4_filters": _q_c4_filters,
        "group_sample": _q_group_sample,
        "minhash_calibration": _q_minhash_calibration,
        "training_shards": _q_training_shards,
        "cluster_keywords": _q_cluster_keywords,
        "cdc_apply": _q_cdc_apply,
        "entity_resolution": _q_entity_resolution,
        "idle_rich_customers": _q_idle_rich_customers,
        "topk_cosine": _q_topk_cosine,
        "doc_max_score": _q_doc_max_score,
        "status_counts": _q_status_counts,
        "listing_page": _q_listing_page,
        "padding_selfjoin": _q_padding_selfjoin,
        "colpali_merge": _q_colpali_merge,
        "lang_counts": _q_lang_counts,
        "filter_dsl_events": _q_filter_dsl_events,
        "maxsim_exact": _q_maxsim_exact,
        "maxsim_hamming": _q_maxsim_hamming,
        "two_stage_topk": _q_two_stage_topk,
        "dedup_exact": _q_dedup_exact,
        "minhash_signatures": _q_minhash_signatures,
        "lsh_pairs": _q_lsh_pairs,
        "simhash": _q_simhash,
        "jaccard_pairs": _q_jaccard_pairs,
        "containment_dedup": _q_containment_dedup,
        "ranking_quality": _q_ranking_quality,
        "bootstrap_ci": _q_bootstrap_ci,
        "interval_overlap": _q_interval_overlap,
        "fuzzy_name_pairs": _q_fuzzy_name_pairs,
        "graph_rag_expansion": _q_graph_rag_expansion,
        "rolling_median_anomaly": _q_rolling_median_anomaly,
        "l_diversity": _q_l_diversity,
        "peak_concurrency": _q_peak_concurrency,
        "changepoint_split": _q_changepoint_split,
        "hll_rollup": _q_hll_rollup,
        "trigram_paths": _q_trigram_paths,
        "quantile_normalization": _q_quantile_normalization,
        "mutual_information": _q_mutual_information,
        "curriculum_order": _q_curriculum_order,
        "sliding_distinct_users": _q_sliding_distinct_users,
        "interval_islands": _q_interval_islands,
        "sliding_heavy_hitters": _q_sliding_heavy_hitters,
        "markov_attribution": _q_markov_attribution,
        "t_closeness": _q_t_closeness,
        "token_budget_mixture": _q_token_budget_mixture,
        "knn_batch": _q_knn_batch,
        "knn_lsh": _q_knn_lsh,
        "knn_ivf": _q_knn_ivf,
        "near_dup_embedding": _q_near_dup_embedding,
        "text_stats": _q_text_stats,
        "language_id": _q_language_id,
        "winnow_fingerprints": _q_winnow_fingerprints,
        "bpe_token_stats": _q_bpe_token_stats,
        "quality_filter": _q_quality_filter,
        "stratified_split": _q_stratified_split,
        "group_topn": _q_group_topn,
        "length_percentiles": _q_length_percentiles,
        "sequence_packing": _q_sequence_packing,
        "sequence_packing_sharded": _q_sequence_packing_sharded,
        "dup_clusters": _q_dup_clusters,
        "decontaminate": _q_decontaminate,
        "repetition_signals": _q_repetition_signals,
        "mixture_sample": _q_mixture_sample,
        "event_window_agg": _q_event_window_agg,
        "hash_embed_retrieval": _q_hash_embed_retrieval,
        "chunk_stats": _q_chunk_stats,
        "asof_nearest": _q_asof_nearest,
        "quality_classifier": _q_quality_classifier,
        "semantic_decontaminate": _q_semantic_decontaminate,
        "temperature_mixture": _q_temperature_mixture,
        "min_cost_supplier": _q_min_cost_supplier,
        "regional_supplier_volume": _q_regional_supplier_volume,
        "revenue_forecast": _q_revenue_forecast,
        "bilateral_shipping_volume": _q_bilateral_shipping_volume,
        "market_share": _q_market_share,
        "product_type_profit": _q_product_type_profit,
        "returned_item_report": _q_returned_item_report,
        "important_part_values": _q_important_part_values,
        "priority_line_classes": _q_priority_line_classes,
        "customer_order_distribution": _q_customer_order_distribution,
        "promo_revenue_share": _q_promo_revenue_share,
        "top_revenue_supplier": _q_top_revenue_supplier,
        "supplier_part_variety": _q_supplier_part_variety,
        "disjunctive_revenue": _q_disjunctive_revenue,
        "promotable_part_suppliers": _q_promotable_part_suppliers,
        "validation_suite": _q_validation_suite,
        "golden_record": _q_golden_record,
        "incremental_agg": _q_incremental_agg,
        "key_skew_audit": _q_key_skew_audit,
        "url_canonicalize": _q_url_canonicalize,
        "attribution": _q_attribution,
        "json_props_stats": _q_json_props_stats,
        "grouping_sets_counts": _q_grouping_sets_counts,
        "balance_deciles": _q_balance_deciles,
        "drift_psi": _q_drift_psi,
        "basket_lift": _q_basket_lift,
        "trade_triangles": _q_trade_triangles,
        "debounce": _q_debounce,
        "readability": _q_readability,
        "script_mix": _q_script_mix,
        "bounce_rate": _q_bounce_rate,
        "funnel_timing": _q_funnel_timing,
        "hybrid_rrf": _q_hybrid_rrf,
        "trending_items": _q_trending_items,
        "url_dedup": _q_url_dedup,
        "skyline_parts": _q_skyline_parts,
        "event_transitions": _q_event_transitions,
        "dow_seasonality": _q_dow_seasonality,
        "ngram_diversity": _q_ngram_diversity,
        "zipf_audit": _q_zipf_audit,
        "sq8_error_audit": _q_sq8_error_audit,
        "curation_funnel": _q_curation_funnel,
        "dedup_per_window": _q_dedup_per_window,
        "length_bucketing": _q_length_bucketing,
        "incremental_neardup": _q_incremental_neardup,
        "label_centroids": _q_label_centroids,
        "centroid_assignments": _q_centroid_assignments,
        "rfm_segments": _q_rfm_segments,
        "target_encoding": _q_target_encoding,
        "orphan_audit": _q_orphan_audit,
        "session_paths": _q_session_paths,
        "json_schema_profile": _q_json_schema_profile,
        "skew_salted_agg": _q_skew_salted_agg,
        "negative_sampling": _q_negative_sampling,
        "k_anonymity": _q_k_anonymity,
        "benford_audit": _q_benford_audit,
        "woe_iv": _q_woe_iv,
        "ab_test": _q_ab_test,
        "mmr_rerank": _q_mmr_rerank,
        "auc_score": _q_auc_score,
        "calibration": _q_calibration,
        "pr_auc": _q_pr_auc,
        "brier_score": _q_brier_score,
        "gains_deciles": _q_gains_deciles,
        "threshold_metrics": _q_threshold_metrics,
        "vocab_coverage": _q_vocab_coverage,
        "demand_elasticity": _q_demand_elasticity,
        "quality_ensemble": _q_quality_ensemble,
        "length_matching": _q_length_matching,
        "gap_fill": _q_gap_fill,
        "seasonal_decompose": _q_seasonal_decompose,
        "holt_forecast": _q_holt_forecast,
        "weighted_price_quantiles": _q_weighted_price_quantiles,
        "neyman_allocation": _q_neyman_allocation,
        "conformal_interval": _q_conformal_interval,
        "isotonic_calibration": _q_isotonic_calibration,
        "theil_sen_trend": _q_theil_sen_trend,
        "ratio_metric_ci": _q_ratio_metric_ci,
        "mann_kendall": _q_mann_kendall,
        "sprt_decision": _q_sprt_decision,
        "rater_agreement": _q_rater_agreement,
        "acf_daily": _q_acf_daily,
        "cusum_drift": _q_cusum_drift,
        "ann_recall": _q_ann_recall,
        "ks_price_drift": _q_ks_price_drift,
        "revenue_gini": _q_revenue_gini,
        "forecast_backtest": _q_forecast_backtest,
        "cuped_ab": _q_cuped_ab,
        "session_survival": _q_session_survival,
        "did_effect": _q_did_effect,
        "vocab_drift": _q_vocab_drift,
        "ngram_novelty": _q_ngram_novelty,
        "grouped_split": _q_grouped_split,
        "temporal_split": _q_temporal_split,
        "mad_outliers": _q_mad_outliers,
        "lineitem_corr": _q_lineitem_corr,
        "term_gini": _q_term_gini,
        "winsorized_prices": _q_winsorized_prices,
        "ucb_allocation": _q_ucb_allocation,
        "theil_nations": _q_theil_nations,
        "source_diversity": _q_source_diversity,
        "event_trends": _q_event_trends,
        "chi_square_screen": _q_chi_square_screen,
        "spearman_screen": _q_spearman_screen,
        "boilerplate_profile": _q_boilerplate_profile,
        "kn_bigram_lm": _q_kn_bigram_lm,
        "log_rank_sessions": _q_log_rank_sessions,
        "cem_att_balance": _q_cem_att_balance,
        "ewma_chart_daily": _q_ewma_chart_daily,
        "dp_release_counts": _q_dp_release_counts,
        "fs_record_linkage": _q_fs_record_linkage,
        "textrank_keywords": _q_textrank_keywords,
        "nelson_aalen_hazard": _q_nelson_aalen_hazard,
        "corr_matrix_lineitem": _q_corr_matrix_lineitem,
        "power_mde_nations": _q_power_mde_nations,
        "trainer_export_audit": _q_trainer_export_audit,
        "schema_drift_props": _q_schema_drift_props,
        "ivm_join": _q_ivm_join,
        "join_size_estimate": _q_join_size_estimate,
        "twap_event_value": _q_twap_event_value,
        "ohlc_daily": _q_ohlc_daily,
        "kruskal_doclen": _q_kruskal_doclen,
        "levene_acctbal": _q_levene_acctbal,
        "ljung_box_daily": _q_ljung_box_daily,
        "ipw_ate_doclen": _q_ipw_ate_doclen,
        "ivm_join_b": _q_ivm_join_b,
        "silhouette_labels": _q_silhouette_labels,
        "rbo_rankings": _q_rbo_rankings,
        "pit_state_lookup": _q_pit_state_lookup,
        "heaps_law": _q_heaps_law,
        "ipf_mixture": _q_ipf_mixture,
        "snapshot_diff": _q_snapshot_diff,
        "linkage_assignment": _q_linkage_assignment,
        "embedding_drift_labels": _q_embedding_drift_labels,
        "mann_whitney_doclen": _q_mann_whitney_doclen,
        "dunn_doclen": _q_dunn_doclen,
        "overdispersion_daily": _q_overdispersion_daily,
        "ccf_event_types": _q_ccf_event_types,
        "seasonal_strength_daily": _q_seasonal_strength_daily,
        "holt_winters_daily": _q_holt_winters_daily,
        "holt_winters_mult_daily": _q_holt_winters_mult_daily,
        "pacf_daily": _q_pacf_daily,
        "chi_posthoc_priority": _q_chi_posthoc_priority,
        "ivm_join_both": _q_ivm_join_both,
        "kendall_chars_tokens": _q_kendall_chars_tokens,
        "cochran_priority_trend": _q_cochran_priority_trend,
        "jt_priority_price": _q_jt_priority_price,
        "cmh_lang_exposure": _q_cmh_lang_exposure,
        "friedman_dow_types": _q_friedman_dow_types,
        "brown_forsythe_acctbal": _q_brown_forsythe_acctbal,
        "seasonal_mk_daily": _q_seasonal_mk_daily,
        "partial_corr_user_activity": _q_partial_corr_user_activity,
        "cvm_price_drift": _q_cvm_price_drift,
        "wasserstein_price_drift": _q_wasserstein_price_drift,
        "ad_price_drift": _q_ad_price_drift,
        "ad_k_priority": _q_ad_k_priority,
        "bartlett_acctbal": _q_bartlett_acctbal,
        "mood_median_doclen": _q_mood_median_doclen,
        "durbin_watson_daily": _q_durbin_watson_daily,
        "runs_daily": _q_runs_daily,
        "page_week_dow": _q_page_week_dow,
        "wilcoxon_wow_daily": _q_wilcoxon_wow_daily,
        "welch_anova_acctbal": _q_welch_anova_acctbal,
        "dagostino_profiles": _q_dagostino_profiles,
        "hl_quantity_shift": _q_hl_quantity_shift,
        "theta_daily": _q_theta_daily,
        "cronbach_dow_types": _q_cronbach_dow_types,
        "cochran_q_dow_types": _q_cochran_q_dow_types,
        "lilliefors_profiles": _q_lilliefors_profiles,
        "page_hinkley_daily": _q_page_hinkley_daily,
        "kendall_w_dow_types": _q_kendall_w_dow_types,
        "fdr_nation_ab": _q_fdr_nation_ab,
        "mcnemar_filters": _q_mcnemar_filters,
        "token_entropy_profile": _q_token_entropy_profile,
        "anova_doclen": _q_anova_doclen,
        "market_concentration": _q_market_concentration,
        "js_event_drift": _q_js_event_drift,
        "hill_tail": _q_hill_tail,
    }


# ----------------------------------------------------------------- oracles

_COS_SCORE = (
    "ROUND((1.0 + list_dot_product(e.embedding::DOUBLE[], q.qv) / "
    "(sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) * "
    "sqrt(list_dot_product(q.qv, q.qv)))) / 2.0, 6)"
)

# shared CTE fragments for the text-pipeline oracles
_NORM_TEXT = "regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')"
# BPE-ish pre-tokenizer regex, single quotes doubled for the SQL literal
_BPE_RE_SQL = text_analysis.BPE_TOKEN_RE.replace("'", "''")
_STOP_SQL = "[" + ", ".join(f"'{w}'" for w in text_analysis.STOPWORDS["en"]) + "]"
_TOKENS_CTE = f"tk AS (SELECT doc_id, string_split({_NORM_TEXT}, ' ') AS tk FROM documents)"
_SHINGLES_CTE = (
    "sh AS (SELECT doc_id, unnest(list_distinct(list_transform("
    "range(1, len(tk) - 1), i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS shingle "
    "FROM tk WHERE len(tk) >= 3)"
)
_H30_CTE = (
    "h AS (SELECT doc_id, CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) % 1073741824 AS h30 FROM sh)"
)
def _pagerank_oracle(iterations: int = 3, damping_pct: int = 85) -> str:
    """DuckDB twin of graph.pagerank_fixed_point over the nation trade
    graph — iterations unrolled as CTEs, `//` mirroring Spark's `div`
    (identical for the all-positive operands here), SUM(BIGINT) cast back
    from HUGEINT."""
    from morphik_core_spark.operators.graph import UNIT

    teleport_u = (UNIT * (100 - damping_pct)) // 100
    ctes = [
        """edges AS (
            SELECT c.c_nationkey AS src, s.s_nationkey AS dst, count(*) AS w
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            GROUP BY 1, 2
        )""",
        "nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges)",
        "nn AS (SELECT count(*) AS n_nodes FROM nodes)",
        "ow AS (SELECT src, CAST(SUM(w) AS BIGINT) AS out_w FROM edges GROUP BY src)",
        "ew AS (SELECT src, dst, w, out_w FROM edges JOIN ow USING (src))",
        f"r0 AS (SELECT node, CAST({UNIT} AS BIGINT) // n_nodes AS rank_u FROM nodes, nn)",
    ]
    for i in range(1, iterations + 1):
        ctes.append(
            f"""c{i} AS (
                SELECT dst AS node, CAST(SUM((rank_u * w) // out_w) AS BIGINT) AS c_sum
                FROM r{i - 1} r JOIN ew ON r.node = ew.src GROUP BY dst
            )"""
        )
        ctes.append(
            f"""r{i} AS (
                SELECT n.node,
                       CAST({teleport_u} AS BIGINT) // nn.n_nodes +
                       ({damping_pct} * coalesce(c_sum, CAST(0 AS BIGINT))) // 100 AS rank_u
                FROM nodes n LEFT JOIN c{i} ON n.node = c{i}.node, nn
            )"""
        )
    return (
        "WITH " + ",\n".join(ctes) + f"""
        SELECT node, rank_u,
               ROUND(CAST(rank_u AS DOUBLE) / {UNIT}.0, 6) AS rank
        FROM r{iterations}
    """
    )


def _quality_classifier_oracle(iterations: int = _QC_ITERATIONS) -> str:
    """DuckDB twin of the in-engine logistic training run — gradient
    descent unrolled as CTEs (the _pagerank_oracle pattern): identical
    feature expressions, the same rational fast-sigmoid (no exp — IEEE
    add/mul/div only), int64 micro-unit gradient sums via FLOOR, and the
    same floor-of-IEEE-division weight update. Replays the exact bits of
    classifier.logreg_train + logreg_score."""
    pos = ", ".join(f"'{s}'" for s in _QC_POS_SOURCES)
    feats = [
        "1.0",
        "least(CAST(length(text) AS DOUBLE), 5000.0) / 5000.0",
        "least(CAST(len(string_split(text, ' ')) AS DOUBLE), 1000.0) / 1000.0",
        "CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / "
        "greatest(CAST(length(text) AS DOUBLE), 1.0)",
    ]
    nf = len(feats)
    fcols = ", ".join(f"{e} AS f{j}" for j, e in enumerate(feats))
    zero_w = ", ".join(f"CAST(0 AS BIGINT) AS w{j}" for j in range(nf))

    def z_expr(walias: str) -> str:
        # left-assoc sum mirroring classifier._dot's Column fold
        return " + ".join(f"f{j} * ({walias}.w{j} / 1000000.0)" for j in range(nf))

    ctes = [
        f"""feats AS (
            SELECT doc_id,
                   CASE WHEN source IN ({pos}) THEN 1.0 ELSE 0.0 END AS y,
                   {fcols}
            FROM documents
        )""",
        f"wi0 AS (SELECT {zero_w})",
    ]
    for i in range(1, iterations + 1):
        gsums = ", ".join(
            f"SUM(CAST(FLOOR((s - y) * f{j} * 1000000) AS BIGINT)) AS g{j}" for j in range(nf)
        )
        ctes.append(
            f"""gi{i} AS (
                SELECT {gsums}, COUNT(*) AS n
                FROM (
                    SELECT y, {', '.join(f'f{j}' for j in range(nf))},
                           0.5 + z / (2.0 * (1.0 + abs(z))) AS s
                    FROM (SELECT feats.*, {z_expr(f'wi{i-1}')} AS z FROM feats, wi{i-1})
                )
            )"""
        )
        wupd = ", ".join(
            f"w.w{j} - CAST(FLOOR(CAST(g.g{j} AS DOUBLE) / g.n) AS BIGINT) AS w{j}"
            for j in range(nf)
        )
        ctes.append(f"wi{i} AS (SELECT {wupd} FROM wi{i-1} w, gi{i} g)")
    return (
        "WITH " + ",\n".join(ctes) + f"""
        SELECT doc_id, CAST(y AS INT) AS is_positive,
               ROUND(0.5 + z / (2.0 * (1.0 + abs(z))), 6) AS quality_score
        FROM (SELECT feats.*, {z_expr(f'wi{iterations}')} AS z FROM feats, wi{iterations})
    """
    )


def _sq8_oracle(dims: int = 64, k: int = 10) -> str:
    """DuckDB twin of similarity.knn_sq8 — same affine-code tree (ROUND on
    one double expression, positive values so half-up == half-away), same
    CASE for constant dims, and the reconstruction dot written as an
    explicit left-associated sum mirroring the Spark fold."""
    terms = " + ".join(
        f"(CASE WHEN (st.mx[{i}] - st.mn[{i}]) = 0.0 THEN st.mn[{i}] "
        f"ELSE (CAST(ec.codes[{i}] AS DOUBLE) / 255.0) * (st.mx[{i}] - st.mn[{i}]) + st.mn[{i}] END) * q.qv[{i}]"
        for i in range(1, dims + 1)
    )
    mins = ", ".join(f"MIN(CAST(embedding[{i}] AS DOUBLE))" for i in range(1, dims + 1))
    maxs = ", ".join(f"MAX(CAST(embedding[{i}] AS DOUBLE))" for i in range(1, dims + 1))
    return f"""
        WITH st AS (SELECT [{mins}] AS mn, [{maxs}] AS mx FROM embeddings),
        q AS (SELECT CAST(0 AS BIGINT) AS q_id, embedding::DOUBLE[] AS qv
              FROM embeddings WHERE vec_id = {_QUERY_VEC_ID}),
        ec AS (
            SELECT e.vec_id,
                   list_transform(range(1, {dims + 1}), i ->
                       CAST(least(255, greatest(0,
                           CASE WHEN (st.mx[i] - st.mn[i]) = 0.0 THEN 0
                           ELSE CAST(round(((CAST(e.embedding[i] AS DOUBLE) - st.mn[i]) /
                                (st.mx[i] - st.mn[i])) * 255.0) AS INT) END)) AS INT)) AS codes
            FROM embeddings e, st
        ),
        sc AS (
            SELECT q.q_id, ec.vec_id, ROUND(0.0 + {terms}, 6) AS score
            FROM ec, st, q
        )
        SELECT q_id, vec_id, score FROM (
            SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id ASC) AS rn
            FROM sc
        ) WHERE rn <= {k}
    """


# HLL raw estimator, the exact expression tree sketches.hll_distinct builds
# (p=9): alpha_m * m^2 * 2^SCALE / S with the integer-scaled harmonic sum S
_HLL_EST = (
    "((0.7213 / (1.0 + 1.079 / 512.0)) * 512.0 * 512.0 * 4503599627370496.0) / CAST(s AS DOUBLE)"
)


def _minhash_select() -> str:
    from morphik_core_spark.operators.dedup import hash_params

    cols = ", ".join(
        f"MIN(({a} * h30 + {b}) % 2147483647) AS mh{i}" for i, (a, b) in enumerate(hash_params(_MINHASHES))
    )
    return f"SELECT doc_id, {cols} FROM h GROUP BY doc_id"


_MINHASH_CTES = f"WITH {_TOKENS_CTE}, {_SHINGLES_CTE}, {_H30_CTE}"


def _lsh_ctes(recursive: bool = False) -> str:
    """Shared CTE chain ending in ``cand`` = the banded-LSH candidate
    pairs (used by the lsh_pairs oracle and, with WITH RECURSIVE, by the
    dup_clusters connected-components oracle)."""
    head = _MINHASH_CTES.replace("WITH ", "WITH RECURSIVE ", 1) if recursive else _MINHASH_CTES
    return f"""{head},
            sig AS ({_minhash_select()}),
            buckets AS (
                SELECT doc_id, 0 AS band, mh0::VARCHAR || '_' || mh1::VARCHAR AS key FROM sig
                UNION ALL SELECT doc_id, 1, mh2::VARCHAR || '_' || mh3::VARCHAR FROM sig
                UNION ALL SELECT doc_id, 2, mh4::VARCHAR || '_' || mh5::VARCHAR FROM sig
                UNION ALL SELECT doc_id, 3, mh6::VARCHAR || '_' || mh7::VARCHAR FROM sig
            ),
            capped AS (
                SELECT b.* FROM buckets b JOIN (
                    SELECT band, key FROM buckets
                    GROUP BY band, key HAVING count(*) <= {_LSH_MAX_BUCKET}
                ) ok USING (band, key)
            ),
            cand AS (
                SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
                FROM capped l JOIN capped r
                  ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id
            )"""

_STOPLIST = {lang: "[" + ", ".join(f"'{w}'" for w in ws) + "]" for lang, ws in text_analysis.STOPWORDS.items()}


def _sq8_error_oracle(dims: int = 64) -> str:
    """DuckDB twin of similarity.sq8_reconstruction_error — same affine
    code tree as _sq8_oracle, squared-error fold written as the explicit
    left-associated sum mirroring the Spark aggregate(), pico-scaled
    BIGINT per-vector MSE so the group sums are exact integers."""

    def recon(i: int) -> str:
        return (
            f"(CASE WHEN (st.mx[{i}] - st.mn[{i}]) = 0.0 THEN st.mn[{i}] "
            f"ELSE (CAST(ec.codes[{i}] AS DOUBLE) / 255.0) * (st.mx[{i}] - st.mn[{i}]) + st.mn[{i}] END)"
        )

    terms = " + ".join(
        f"({recon(i)} - CAST(ec.embedding[{i}] AS DOUBLE)) * "
        f"({recon(i)} - CAST(ec.embedding[{i}] AS DOUBLE))"
        for i in range(1, dims + 1)
    )
    mins = ", ".join(f"MIN(CAST(embedding[{i}] AS DOUBLE))" for i in range(1, dims + 1))
    maxs = ", ".join(f"MAX(CAST(embedding[{i}] AS DOUBLE))" for i in range(1, dims + 1))
    return f"""
        WITH st AS (SELECT [{mins}] AS mn, [{maxs}] AS mx FROM embeddings),
        ec AS (
            SELECT e.vec_id, e.label, e.embedding,
                   list_transform(range(1, {dims + 1}), i ->
                       CAST(least(255, greatest(0,
                           CASE WHEN (st.mx[i] - st.mn[i]) = 0.0 THEN 0
                           ELSE CAST(round(((CAST(e.embedding[i] AS DOUBLE) - st.mn[i]) /
                                (st.mx[i] - st.mn[i])) * 255.0) AS INT) END)) AS INT)) AS codes
            FROM embeddings e, st
        ),
        pv AS (
            SELECT ec.label,
                   CAST(round(((0.0 + {terms}) / {dims}.0) * 1000000000000.0) AS BIGINT) AS mse_pico
            FROM ec, st
        ),
        a AS (
            SELECT label, count(*) AS n_vecs,
                   CAST(SUM(mse_pico) AS BIGINT) AS s, MAX(mse_pico) AS mxp
            FROM pv GROUP BY 1
        )
        SELECT label, n_vecs,
               ROUND(CAST(s AS DOUBLE) / CAST(n_vecs AS DOUBLE) / 1000000000000.0, 12) AS mean_mse,
               ROUND(CAST(mxp AS DOUBLE) / 1000000000000.0, 12) AS max_mse
        FROM a
    """


def _centroid_ctes(dims: int = 64) -> str:
    """Shared DuckDB CTEs for the label-centroid oracles: per-label
    scaled-int sums (round(x·10⁷) BIGINT — exact, order-free) and the
    centroid arrays rebuilt through the same double tree the Spark
    operator evaluates (ROUND(s/n/10⁷, 6) + 0.0 to collapse −0.0)."""
    sums = ", ".join(
        f"SUM(CAST(round(CAST(embedding[{i}] AS DOUBLE) * 10000000.0) AS BIGINT)) AS s{i}"
        for i in range(1, dims + 1)
    )
    cent = ", ".join(
        f"ROUND(CAST(CAST(s{i} AS BIGINT) AS DOUBLE) / CAST(n AS DOUBLE) / 10000000.0, 6) + 0.0"
        for i in range(1, dims + 1)
    )
    return f"""
        s AS (SELECT label, count(*) AS n, {sums} FROM embeddings GROUP BY label),
        c AS (SELECT label, n, [{cent}] AS centroid FROM s)"""


def oracle_sql() -> dict[str, str]:
    from morphik_core_spark.functions.text import (
        plainto_lexemes, ts_rank_sql, tsvector_lexemes_sql,
    )

    _fts_norm = (
        "lower(trim(regexp_replace(regexp_replace(filename, '\\.[^.]+$', ''),"
        " '[_\\-]+', ' ', 'g')))"
    )
    _fts_lex = tsvector_lexemes_sql(_fts_norm)
    _fts_rank = ts_rank_sql("lex", plainto_lexemes("report en"))

    _bm25_terms = ["join", "window", "hash"]
    _bm25_tf = ", ".join(
        f"len(list_filter(tk, t -> t = '{t}')) AS tf_{i}" for i, t in enumerate(_bm25_terms)
    )
    _bm25_df = ", ".join(
        f"SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(len(_bm25_terms))
    )
    # mirrors bm25_topk's expression tree exactly (same association order,
    # same float literals) so both engines do the identical double math
    _bm25_score = " + ".join(
        f"ln(1.0 + (n_docs - df_{i} + 0.5) / (df_{i} + 0.5)) * tf_{i} * (1.2 + 1.0)"
        f" / (tf_{i} + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl))"
        for i in range(len(_bm25_terms))
    )

    # PQ oracle: identical arithmetic to knn_pq's generated expressions —
    # same subspace slicing, same left-to-right sums, raw doubles (no
    # rounding) for encode/ADC, ROUND only on the final rescore score
    _pq_sub = 64 // _PQ_M
    _pq_parts = []
    for _j in range(_PQ_M):
        _dists, _tables = [], []
        for _c in range(1, _IVF_LISTS + 1):
            _dterms = " + ".join(
                f"(s.ev[{_j * _pq_sub + _i + 1}] - cb{_c}.cv[{_j * _pq_sub + _i + 1}]) * "
                f"(s.ev[{_j * _pq_sub + _i + 1}] - cb{_c}.cv[{_j * _pq_sub + _i + 1}])"
                for _i in range(_pq_sub)
            )
            _dists.append(f"({_dterms})")
            _qterms = " + ".join(
                f"(q.qv[{_j * _pq_sub + _i + 1}] - cb{_c}.cv[{_j * _pq_sub + _i + 1}]) * "
                f"(q.qv[{_j * _pq_sub + _i + 1}] - cb{_c}.cv[{_j * _pq_sub + _i + 1}])"
                for _i in range(_pq_sub)
            )
            _tables.append(f"({_qterms})")
        _dj = f"list_value({', '.join(_dists)})"
        _code = f"(list_position({_dj}, list_min({_dj})) - 1)"
        _pq_parts.append(f"list_value({', '.join(_tables)})[{_code} + 1]")
    _pq_approx = " + ".join(_pq_parts)
    _pq_cbs = ",\n            ".join(
        f"cb{_c} AS (SELECT embedding::DOUBLE[] AS cv FROM embeddings WHERE vec_id = {_c})"
        for _c in range(1, _IVF_LISTS + 1)
    )
    _pq_joins = ", ".join(f"cb{_c}" for _c in range(1, _IVF_LISTS + 1))
    _pq_score = (
        "ROUND((1.0 + list_dot_product(c.ev, q.qv) / "
        "(sqrt(list_dot_product(c.ev, c.ev)) * sqrt(list_dot_product(q.qv, q.qv)))) / 2.0, "
        f"{_SCORE_DECIMALS})"
    )

    from morphik_core_spark.operators.curation import PII_PATTERNS

    # sequential, like the operator: each rule counts on the text already
    # redacted by the previous rules
    _pii_red = "t"
    _pii_count_list = []
    for _name, _pat, _repl in PII_PATTERNS:
        _pii_count_list.append(
            f"len(regexp_extract_all({_pii_red}, '{_pat}')) AS {_name}_cnt"
        )
        _pii_red = f"regexp_replace({_pii_red}, '{_pat}', '{_repl}', 'g')"
    _pii_counts = ", ".join(_pii_count_list)
    return {
        # The recursive splitter's full generality (separator hierarchy with
        # per-level compounding overlap) is not SQL-expressible, but on the
        # synthetic documents corpus — single-line, space-delimited, no
        # "\n\n"/"\n"/". " separators, no word longer than chunk_size — its
        # execution trace reduces EXACTLY to: word-level greedy merge (with
        # the reference's value-comparison separator quirk) followed by four
        # compounding overlap passes (one per enclosing separator level).
        # That trace is a recursive CTE over greedy cut points + four chained
        # lag() passes; equality with the Python splitter is asserted
        # chunk-by-chunk in tests/test_chunking_embedding.py over both SFs.
        "chunk_stats": """
            WITH RECURSIVE
            docs AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL AND len(text) > 0),
            small AS (SELECT doc_id, 0 AS chunk_no, text AS c FROM docs WHERE len(text) <= 256),
            big AS (SELECT doc_id, string_split(text, ' ') AS parts FROM docs WHERE len(text) > 256),
            words AS (
                SELECT doc_id, i AS idx,
                       parts[i] || CASE WHEN parts[i] <> parts[len(parts)] THEN ' ' ELSE '' END AS piece
                FROM big, LATERAL (SELECT unnest(generate_series(1, len(parts))) AS i) t
            ),
            plen AS (
                SELECT doc_id, idx, piece,
                       SUM(len(piece)) OVER (PARTITION BY doc_id ORDER BY idx) AS s
                FROM words
            ),
            stream AS (
                SELECT doc_id, string_agg(piece, '' ORDER BY idx) AS full_stream, max(s) AS total
                FROM plen GROUP BY doc_id
            ),
            rec AS (
                SELECT doc_id, -1 AS chunk_no, CAST(0 AS BIGINT) AS start_s,
                       CAST(0 AS BIGINT) AS end_s, total
                FROM stream
                UNION ALL
                SELECT rec.doc_id, rec.chunk_no + 1, rec.end_s,
                       (SELECT max(p.s) FROM plen p
                        WHERE p.doc_id = rec.doc_id AND p.s - rec.end_s <= 256),
                       rec.total
                FROM rec WHERE rec.end_s < rec.total
            ),
            c0 AS (
                SELECT r.doc_id, r.chunk_no,
                       substring(st.full_stream, CAST(r.start_s AS INT) + 1,
                                 CAST(r.end_s - r.start_s AS INT)) AS c
                FROM rec r JOIN stream st USING (doc_id) WHERE r.chunk_no >= 0
            ),
            p1 AS (SELECT doc_id, chunk_no, CASE WHEN chunk_no > 0 THEN right(lag(c) OVER (PARTITION BY doc_id ORDER BY chunk_no), 32) || c ELSE c END AS c FROM c0),
            p2 AS (SELECT doc_id, chunk_no, CASE WHEN chunk_no > 0 THEN right(lag(c) OVER (PARTITION BY doc_id ORDER BY chunk_no), 32) || c ELSE c END AS c FROM p1),
            p3 AS (SELECT doc_id, chunk_no, CASE WHEN chunk_no > 0 THEN right(lag(c) OVER (PARTITION BY doc_id ORDER BY chunk_no), 32) || c ELSE c END AS c FROM p2),
            p4 AS (SELECT doc_id, chunk_no, CASE WHEN chunk_no > 0 THEN right(lag(c) OVER (PARTITION BY doc_id ORDER BY chunk_no), 32) || c ELSE c END AS c FROM p3),
            allc AS (SELECT * FROM small UNION ALL SELECT * FROM p4)
            SELECT doc_id AS document_id,
                   COUNT(*) AS n_chunks,
                   CAST(MAX(len(c)) AS INT) AS max_chunk_len,
                   CAST(SUM(len(c)) AS BIGINT) AS content_chars,
                   md5(string_agg(md5(c), chr(1) ORDER BY md5(c))) AS content_md5
            FROM allc GROUP BY doc_id
        """,
        "semi_join_auth": """
            SELECT l_orderkey, l_linenumber, l_quantity
            FROM lineitem
            WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
        """,
        "hydration_join": """
            SELECT l_orderkey, l_linenumber, o_orderdate, o_orderpriority,
                   ROUND(l_extendedprice, 2) AS price
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        """,
        "cluster_keywords": f"""
            WITH toks AS (
                SELECT lang AS cluster, unnest(string_split({_NORM_TEXT}, ' ')) AS term
                FROM documents WHERE text IS NOT NULL
            ),
            ctf AS (SELECT cluster, term, count(*) AS ctf FROM toks GROUP BY cluster, term),
            corpus AS (SELECT term, count(*) AS f_t FROM toks GROUP BY term),
            totals AS (SELECT count(*) AS a_num, count(DISTINCT cluster) AS a_den FROM toks),
            scored AS (
                SELECT c.cluster, c.term, c.ctf,
                       ROUND(c.ctf * ln(1.0 + CAST(t.a_num AS DOUBLE)
                                              / CAST(t.a_den * f.f_t AS DOUBLE)),
                             {_SCORE_DECIMALS}) AS score
                FROM ctf c JOIN corpus f USING (term), totals t
            ),
            ranked AS (
                SELECT cluster, term, ctf, score,
                       row_number() OVER (PARTITION BY cluster
                                          ORDER BY score DESC, term ASC) AS rank
                FROM scored
            )
            SELECT cluster, rank, term, CAST(ctf AS BIGINT) AS ctf, score
            FROM ranked WHERE rank <= 5
        """,
        "idle_rich_customers": """
            WITH avg_pos AS (
                SELECT SUM(CAST(c_acctbal AS DECIMAL(18,4))) / COUNT(*) AS avg_bal
                FROM customer WHERE c_acctbal > 0
            )
            SELECT CAST(c_nationkey % 5 AS INT) AS band,
                   COUNT(*) AS numcust,
                   ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE), 4) AS totacctbal
            FROM customer, avg_pos
            WHERE CAST(c_acctbal AS DECIMAL(18,4)) > avg_bal
              AND NOT EXISTS (
                  SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT'
                    AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
              )
            GROUP BY CAST(c_nationkey % 5 AS INT)
        """,
        "entity_resolution": """
            WITH RECURSIVE
            clean AS (SELECT p_partkey * 2 AS rec_id, p_name AS name FROM part),
            dirty AS (
                SELECT p_partkey * 2 + 1 AS rec_id,
                       substr(p_name, 1, CAST(p_partkey % len(p_name) AS INT))
                       || substr(p_name, CAST(p_partkey % len(p_name) AS INT) + 2) AS name
                FROM part WHERE p_partkey % 3 = 0
            ),
            records AS (SELECT * FROM clean UNION ALL SELECT * FROM dirty),
            names AS (
                SELECT name, min(rec_id) AS name_id, count(*) AS n_recs
                FROM records GROUP BY name
            ),
            blocked AS (SELECT name, name_id, n_recs, substr(name, 1, 3) AS blk FROM names),
            pairs AS (
                SELECT a.name_id AS id_a, b.name_id AS id_b
                FROM blocked a JOIN blocked b
                  ON a.blk = b.blk AND a.name_id < b.name_id
                WHERE levenshtein(a.name, b.name) <= 2
            ),
            edges AS (
                SELECT id_a AS src, id_b AS dst FROM pairs
                UNION ALL SELECT id_b, id_a FROM pairs
            ),
            nodes AS (SELECT DISTINCT src AS node FROM edges),
            reach(node, lbl) AS (
                SELECT node, node FROM nodes
                UNION
                SELECT e.dst, r.lbl FROM reach r JOIN edges e ON r.node = e.src
            ),
            comp AS (SELECT node, MIN(lbl) AS component FROM reach GROUP BY node),
            resolved AS (
                SELECT n.name, n.name_id, n.n_recs,
                       COALESCE(c.component, n.name_id) AS entity_id
                FROM names n LEFT JOIN comp c ON n.name_id = c.node
            ),
            sizes AS (
                SELECT entity_id, count(*) AS entity_names,
                       CAST(SUM(n_recs) AS BIGINT) AS entity_recs
                FROM resolved GROUP BY entity_id
            )
            SELECT r.name, r.name_id, r.n_recs, r.entity_id, s.entity_names, s.entity_recs
            FROM resolved r JOIN sizes s USING (entity_id)
        """,
        "cdc_apply": """
            WITH snap AS (SELECT doc_id, lang, source, n_chars FROM documents),
            changes AS (
                SELECT doc_id, lang, source, n_chars, 'D' AS op FROM snap WHERE doc_id % 10 = 0
                UNION ALL
                SELECT doc_id, 'xx', source, n_chars, 'U' FROM snap WHERE doc_id % 10 = 1
                UNION ALL
                SELECT doc_id + 1000000, lang, 'cdc_new', n_chars, 'I' FROM snap WHERE doc_id % 10 = 3
            )
            SELECT s.doc_id, s.lang, s.source, s.n_chars FROM snap s
            WHERE NOT EXISTS (
                SELECT 1 FROM changes c WHERE c.doc_id = s.doc_id
            )
            UNION ALL
            SELECT doc_id, lang, source, n_chars FROM changes WHERE op IN ('U', 'I')
        """,
        "training_shards": """
            WITH assigned AS (
                SELECT CAST(('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
                           % 16 AS shard,
                       CAST(('0x' || substr(md5('shard:o:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
                           % 1073741824 AS order_key,
                       n_chars AS tokens, source AS grp
                FROM documents
            )
            SELECT shard, count(*) AS n_docs,
                   CAST(SUM(tokens) AS BIGINT) AS tokens,
                   count(DISTINCT grp) AS n_groups,
                   min(order_key) AS min_key, max(order_key) AS max_key
            FROM assigned GROUP BY shard
        """,
        "minhash_calibration": f"""
            {_lsh_ctes()},
            est AS (
                SELECT c.id_a, c.id_b,
                       (CASE WHEN a.mh0 = b.mh0 THEN 1 ELSE 0 END
                      + CASE WHEN a.mh1 = b.mh1 THEN 1 ELSE 0 END
                      + CASE WHEN a.mh2 = b.mh2 THEN 1 ELSE 0 END
                      + CASE WHEN a.mh3 = b.mh3 THEN 1 ELSE 0 END
                      + CASE WHEN a.mh4 = b.mh4 THEN 1 ELSE 0 END
                      + CASE WHEN a.mh5 = b.mh5 THEN 1 ELSE 0 END
                      + CASE WHEN a.mh6 = b.mh6 THEN 1 ELSE 0 END
                      + CASE WHEN a.mh7 = b.mh7 THEN 1 ELSE 0 END) / 8.0 AS est_j
                FROM cand c JOIN sig a ON a.doc_id = c.id_a JOIN sig b ON b.doc_id = c.id_b
            ),
            common AS (
                SELECT c.id_a, c.id_b, count(*) AS common
                FROM cand c
                JOIN sh a ON a.doc_id = c.id_a
                JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
                GROUP BY c.id_a, c.id_b
            ),
            sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id)
            SELECT e.id_a, e.id_b,
                   ROUND(e.est_j, {_SCORE_DECIMALS}) AS est_jaccard,
                   ROUND(COALESCE(cm.common, 0) * 1.0
                         / (sa.sz + sb.sz - COALESCE(cm.common, 0)), {_SCORE_DECIMALS}) AS exact_jaccard,
                   ROUND(ABS(ROUND(e.est_j, {_SCORE_DECIMALS})
                             - ROUND(COALESCE(cm.common, 0) * 1.0
                                     / (sa.sz + sb.sz - COALESCE(cm.common, 0)), {_SCORE_DECIMALS})),
                         {_SCORE_DECIMALS}) AS abs_err
            FROM est e
            LEFT JOIN common cm ON cm.id_a = e.id_a AND cm.id_b = e.id_b
            JOIN sz sa ON sa.doc_id = e.id_a
            JOIN sz sb ON sb.doc_id = e.id_b
        """,
        "group_sample": """
            WITH keyed AS (
                SELECT lang, doc_id,
                       (CAST(('0x' || substr(md5('gs:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
                            % 1073741824 + 1) / 1073741824.0 AS u
                FROM documents
            ),
            r AS (
                SELECT lang, doc_id, u,
                       row_number() OVER (PARTITION BY lang ORDER BY u ASC, doc_id ASC) AS rk
                FROM keyed
            )
            SELECT lang, doc_id, ROUND(u, 6) AS u, rk FROM r WHERE rk <= 10
        """,
        "c4_filters": """
            WITH base AS (
                SELECT doc_id, string_split(text, ' ') AS tk
                FROM documents WHERE text IS NOT NULL AND len(text) > 0
            ),
            relined AS (
                SELECT doc_id,
                       string_agg(
                           CASE WHEN strpos('0123456789ab', substr(md5(ln), 1, 1)) > 0
                                THEN ln || '.' ELSE ln END,
                           chr(10) ORDER BY i) AS t
                FROM (
                    SELECT doc_id, i,
                           array_to_string(tk[i*6+1 : i*6+6], ' ') AS ln
                    FROM base,
                         LATERAL (SELECT unnest(generate_series(0,
                             CAST(ceil(len(tk)/6.0) AS INT) - 1)) AS i) g
                )
                GROUP BY doc_id
            ),
            synth AS (
                SELECT doc_id,
                       t || CASE WHEN doc_id % 37 = 0
                                 THEN chr(10) || 'lorem ipsum filler text here okay.' ELSE '' END
                         || CASE WHEN doc_id % 41 = 0
                                 THEN chr(10) || 'code sample { return x; } done.' ELSE '' END AS t
                FROM relined
            ),
            split2 AS (
                SELECT doc_id, t, string_split(t, chr(10)) AS lns,
                       list_filter(string_split(t, chr(10)),
                           l -> regexp_matches(l, '[.!?"]$')
                                AND len(string_split(l, ' ')) >= 5) AS kept
                FROM synth
            )
            SELECT doc_id,
                   len(lns) AS n_lines,
                   len(kept) AS n_kept,
                   CAST(len(COALESCE(array_to_string(kept, chr(10)), '')) AS INT) AS clean_chars,
                   contains(lower(t), 'lorem ipsum') AS has_lorem,
                   contains(t, '{') AS has_brace,
                   (len(kept) >= 3 AND NOT contains(lower(t), 'lorem ipsum')
                        AND NOT contains(t, '{')) AS doc_pass,
                   COALESCE(array_to_string(kept, chr(10)), '') AS text_clean
            FROM split2
        """,
        # estimator mirrored as the same fixed double tree: exact count below
        # k, else (k-1)*2^30/kth — 127*2^30 is exactly representable so the
        # only inexact op is the final division, identical on both engines
        "kmv_source_overlap": f"""
            WITH tks AS (SELECT source, string_split({_NORM_TEXT}, ' ') AS tk FROM documents),
            shs AS (
                SELECT source, unnest(list_distinct(list_transform(
                    range(1, len(tk) - 1), i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS shingle
                FROM tks WHERE len(tk) >= 3
            ),
            hv AS (
                SELECT DISTINCT source,
                       CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) % 1073741824 AS v
                FROM shs
            ),
            sk AS (
                SELECT source, v,
                       row_number() OVER (PARTITION BY source ORDER BY v ASC) AS rk
                FROM hv QUALIFY rk <= 128
            ),
            per_key AS (SELECT source, count(*) AS cnt, max(v) AS kth FROM sk GROUP BY source),
            pairs AS (
                SELECT a.source AS ka, b.source AS kb,
                       a.cnt AS cnt_a, a.kth AS kth_a, b.cnt AS cnt_b, b.kth AS kth_b
                FROM per_key a JOIN per_key b ON a.source < b.source
            ),
            pv AS (
                SELECT DISTINCT ka, kb, v FROM (
                    SELECT p.ka, p.kb, s.v FROM pairs p JOIN sk s ON s.source = p.ka
                    UNION ALL
                    SELECT p.ka, p.kb, s.v FROM pairs p JOIN sk s ON s.source = p.kb
                )
            ),
            merged AS (
                SELECT ka, kb, v,
                       row_number() OVER (PARTITION BY ka, kb ORDER BY v ASC) AS rk
                FROM pv QUALIFY rk <= 128
            ),
            flagged AS (
                SELECT m.ka, m.kb, m.v,
                       CASE WHEN sa.v IS NOT NULL AND sb.v IS NOT NULL THEN 1 ELSE 0 END AS both_in
                FROM merged m
                LEFT JOIN sk sa ON sa.source = m.ka AND sa.v = m.v
                LEFT JOIN sk sb ON sb.source = m.kb AND sb.v = m.v
            ),
            ustats AS (
                SELECT ka, kb, count(*) AS cnt_u, max(v) AS kth_u,
                       CAST(SUM(both_in) AS BIGINT) AS match_k
                FROM flagged GROUP BY ka, kb
            )
            SELECT p.ka, p.kb,
                   ROUND(CASE WHEN p.cnt_a < 128 THEN CAST(p.cnt_a AS DOUBLE)
                              ELSE 127.0 * 1073741824.0 / CAST(p.kth_a AS DOUBLE) END, 4) AS est_distinct_a,
                   ROUND(CASE WHEN p.cnt_b < 128 THEN CAST(p.cnt_b AS DOUBLE)
                              ELSE 127.0 * 1073741824.0 / CAST(p.kth_b AS DOUBLE) END, 4) AS est_distinct_b,
                   ROUND(CASE WHEN u.cnt_u < 128 THEN CAST(u.cnt_u AS DOUBLE)
                              ELSE 127.0 * 1073741824.0 / CAST(u.kth_u AS DOUBLE) END, 4) AS est_union,
                   u.match_k,
                   ROUND(CAST(u.match_k AS DOUBLE) / CAST(least(128, u.cnt_u) AS DOUBLE), 6) AS est_jaccard,
                   ROUND((CAST(u.match_k AS DOUBLE) / CAST(least(128, u.cnt_u) AS DOUBLE)) *
                         (CASE WHEN u.cnt_u < 128 THEN CAST(u.cnt_u AS DOUBLE)
                               ELSE 127.0 * 1073741824.0 / CAST(u.kth_u AS DOUBLE) END), 4) AS est_intersection,
                   ROUND(least(((CAST(u.match_k AS DOUBLE) / CAST(least(128, u.cnt_u) AS DOUBLE)) *
                                (CASE WHEN u.cnt_u < 128 THEN CAST(u.cnt_u AS DOUBLE)
                                      ELSE 127.0 * 1073741824.0 / CAST(u.kth_u AS DOUBLE) END))
                               / (CASE WHEN p.cnt_a < 128 THEN CAST(p.cnt_a AS DOUBLE)
                                       ELSE 127.0 * 1073741824.0 / CAST(p.kth_a AS DOUBLE) END), 1.0), 6)
                       AS est_containment_a,
                   ROUND(least(((CAST(u.match_k AS DOUBLE) / CAST(least(128, u.cnt_u) AS DOUBLE)) *
                                (CASE WHEN u.cnt_u < 128 THEN CAST(u.cnt_u AS DOUBLE)
                                      ELSE 127.0 * 1073741824.0 / CAST(u.kth_u AS DOUBLE) END))
                               / (CASE WHEN p.cnt_b < 128 THEN CAST(p.cnt_b AS DOUBLE)
                                       ELSE 127.0 * 1073741824.0 / CAST(p.kth_b AS DOUBLE) END), 1.0), 6)
                       AS est_containment_b
            FROM pairs p JOIN ustats u ON p.ka = u.ka AND p.kb = u.kb
        """,
        # oracle is the NAIVE theta join (BETWEEN) — it verifies the bucket
        # decomposition produces exactly the rows the direct range join would
        "in_transit_by_day": """
            WITH iv AS (
                SELECT datediff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE)) AS lo_day,
                       datediff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE))
                           + 1 + CAST(l_suppkey % 28 AS INT) AS hi_day,
                       CAST(l_quantity AS DECIMAL(18,4)) AS qty
                FROM lineitem
            ),
            pts AS (
                SELECT DISTINCT datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS day
                FROM orders
            )
            SELECT DATE '1992-01-01' + CAST(day AS INT) AS d,
                   count(*) AS n_open,
                   ROUND(CAST(SUM(qty) AS DOUBLE), 4) AS qty_sum
            FROM pts JOIN iv ON day BETWEEN lo_day AND hi_day
            GROUP BY day
        """,
        "topk_cosine": f"""
            WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = {_QUERY_VEC_ID})
            SELECT e.vec_id, {_COS_SCORE} AS score
            FROM embeddings e, q
            ORDER BY score DESC, e.vec_id ASC
            LIMIT 10
        """,
        "doc_max_score": """
            SELECT document_id, chunk_number, ROUND(score, 2) AS score FROM (
                SELECT l_orderkey AS document_id, l_linenumber AS chunk_number,
                       l_extendedprice AS score,
                       row_number() OVER (
                           PARTITION BY l_orderkey
                           ORDER BY l_extendedprice DESC, l_linenumber ASC
                       ) AS rn
                FROM lineitem
            ) WHERE rn = 1
        """,
        "status_counts": """
            SELECT COALESCE(NULLIF(o_orderstatus, ''), 'unknown') AS o_orderstatus,
                   count(*) AS count
            FROM orders GROUP BY 1
        """,
        "listing_page": """
            SELECT doc_id, lang, n_chars
            FROM documents
            ORDER BY n_chars DESC NULLS LAST, doc_id ASC
            LIMIT 10 OFFSET 20
        """,
        "padding_selfjoin": """
            WITH chunks AS (
                SELECT l_orderkey AS document_id, l_linenumber AS chunk_number,
                       ROUND(l_extendedprice, 2) AS price
                FROM lineitem
            ),
            matches AS (
                SELECT document_id, chunk_number, price AS score
                FROM chunks WHERE price > 99000
            ),
            wanted AS (
                SELECT DISTINCT m.document_id, m.chunk_number + d.d AS chunk_number
                FROM matches m, (VALUES (-1), (0), (1)) AS d(d)
            )
            SELECT c.document_id, c.chunk_number, c.price,
                   COALESCE(m.score, 0.0) AS score
            FROM chunks c
            JOIN wanted w ON c.document_id = w.document_id AND c.chunk_number = w.chunk_number
            LEFT JOIN matches m ON c.document_id = m.document_id AND c.chunk_number = m.chunk_number
        """,
        "colpali_merge": """
            WITH base AS (
                SELECT l_orderkey AS document_id, l_linenumber AS chunk_number,
                       'regular' AS source_kind
                FROM lineitem WHERE l_orderkey % 2 = 0
            ),
            override AS (
                SELECT l_orderkey AS document_id, l_linenumber AS chunk_number,
                       'colpali' AS source_kind
                FROM lineitem WHERE l_orderkey % 4 = 0 AND l_linenumber <= 2
            )
            SELECT b.* FROM base b
            ANTI JOIN override o ON b.document_id = o.document_id AND b.chunk_number = o.chunk_number
            UNION ALL
            SELECT * FROM override
        """,
        "lang_counts": """
            SELECT COALESCE(NULLIF(lang, ''), 'unknown') AS lang, count(*) AS count
            FROM documents GROUP BY 1
        """,
        "filter_dsl_events": """
            SELECT event_id, event_type, ROUND(value, 2) AS value
            FROM events
            WHERE json_extract(props, '$.k') IS NOT NULL
              AND (json_extract(props, '$.k') = '7'
                   OR json_extract(props, '$.k') IN ('11', '13', '17'))
              AND contains(lower(event_type), 'e')
        """,
        "maxsim_exact": f"""
            WITH d AS (
                SELECT vec_id, r.t AS d_idx,
                       (embedding::DOUBLE[])[r.t * {_MV_DIMS} + 1 : (r.t + 1) * {_MV_DIMS}] AS dv
                FROM embeddings, range({_MV_TOKENS}) AS r(t)
            ),
            q AS (
                SELECT r.t AS q_idx,
                       (embedding::DOUBLE[])[r.t * {_MV_DIMS} + 1 : (r.t + 1) * {_MV_DIMS}] AS qv
                FROM embeddings, range({_MV_TOKENS}) AS r(t)
                WHERE vec_id = {_QUERY_VEC_ID}
            ),
            best AS (
                SELECT d.vec_id, q.q_idx, MAX(list_dot_product(q.qv, d.dv)) AS best
                FROM d, q GROUP BY d.vec_id, q.q_idx
            )
            SELECT vec_id, ROUND(SUM(best), {_SCORE_DECIMALS}) AS maxsim
            FROM best GROUP BY vec_id
            ORDER BY maxsim DESC, vec_id ASC LIMIT 10
        """,
        "maxsim_hamming": f"""
            WITH d AS (
                SELECT vec_id, r.t AS d_idx,
                       list_transform(
                           (embedding::DOUBLE[])[r.t * {_MV_DIMS} + 1 : (r.t + 1) * {_MV_DIMS}],
                           x -> CASE WHEN x > 0 THEN 1.0 ELSE -1.0 END) AS dv
                FROM embeddings, range({_MV_TOKENS}) AS r(t)
            ),
            q AS (
                SELECT r.t AS q_idx,
                       list_transform(
                           (embedding::DOUBLE[])[r.t * {_MV_DIMS} + 1 : (r.t + 1) * {_MV_DIMS}],
                           x -> CASE WHEN x > 0 THEN 1.0 ELSE -1.0 END) AS qv
                FROM embeddings, range({_MV_TOKENS}) AS r(t)
                WHERE vec_id = {_QUERY_VEC_ID}
            ),
            best AS (
                SELECT d.vec_id, q.q_idx,
                       MAX(({_MV_DIMS} + list_dot_product(q.qv, d.dv)) / {2.0 * _MV_DIMS}) AS best
                FROM d, q GROUP BY d.vec_id, q.q_idx
            )
            SELECT vec_id, ROUND(SUM(best), {_SCORE_DECIMALS}) AS maxsim
            FROM best GROUP BY vec_id
            ORDER BY maxsim DESC, vec_id ASC LIMIT 10
        """,
        "two_stage_topk": f"""
            WITH d AS (
                SELECT vec_id, r.t AS d_idx,
                       (embedding::DOUBLE[])[r.t * {_MV_DIMS} + 1 : (r.t + 1) * {_MV_DIMS}] AS dv
                FROM embeddings, range({_MV_TOKENS}) AS r(t)
            ),
            q AS (
                SELECT r.t AS q_idx,
                       (embedding::DOUBLE[])[r.t * {_MV_DIMS} + 1 : (r.t + 1) * {_MV_DIMS}] AS qv
                FROM embeddings, range({_MV_TOKENS}) AS r(t)
                WHERE vec_id = {_QUERY_VEC_ID}
            ),
            coarse_best AS (
                SELECT d.vec_id, q.q_idx,
                       MAX(({_MV_DIMS} + list_dot_product(
                           list_transform(q.qv, x -> CASE WHEN x > 0 THEN 1.0 ELSE -1.0 END),
                           list_transform(d.dv, x -> CASE WHEN x > 0 THEN 1.0 ELSE -1.0 END)
                       )) / {2.0 * _MV_DIMS}) AS best
                FROM d, q GROUP BY d.vec_id, q.q_idx
            ),
            survivors AS (
                SELECT vec_id FROM (
                    SELECT vec_id, ROUND(SUM(best), {_SCORE_DECIMALS}) AS maxsim
                    FROM coarse_best GROUP BY vec_id
                ) ORDER BY maxsim DESC, vec_id ASC LIMIT 50
            ),
            exact_best AS (
                SELECT d.vec_id, q.q_idx, MAX(list_dot_product(q.qv, d.dv)) AS best
                FROM d JOIN survivors s ON d.vec_id = s.vec_id, q
                GROUP BY d.vec_id, q.q_idx
            )
            SELECT vec_id, ROUND(SUM(best), {_SCORE_DECIMALS}) AS maxsim
            FROM exact_best GROUP BY vec_id
            ORDER BY maxsim DESC, vec_id ASC LIMIT 10
        """,
        "dedup_exact": f"""
            WITH fp AS (SELECT doc_id, md5({_NORM_TEXT}) AS fingerprint FROM documents)
            SELECT f.doc_id, f.fingerprint, g.keeper_id, g.group_size
            FROM fp f JOIN (
                SELECT fingerprint, MIN(doc_id) AS keeper_id, count(*) AS group_size
                FROM fp GROUP BY fingerprint
            ) g USING (fingerprint)
        """,
        "minhash_signatures": f"""
            {_MINHASH_CTES}
            {_minhash_select()}
        """,
        "lsh_pairs": f"""
            {_lsh_ctes()}
            SELECT id_a, id_b FROM cand
        """,
        "dup_clusters": f"""
            {_lsh_ctes(recursive=True)},
            edges AS (
                SELECT id_a AS src, id_b AS dst FROM cand
                UNION ALL SELECT id_b, id_a FROM cand
            ),
            nodes AS (SELECT DISTINCT src AS node FROM edges),
            reach(node, lbl) AS (
                SELECT node, node FROM nodes
                UNION
                SELECT e.dst, r.lbl FROM reach r JOIN edges e ON r.node = e.src
            ),
            comp AS (SELECT node, MIN(lbl) AS keeper_id FROM reach GROUP BY node),
            sizes AS (SELECT keeper_id, COUNT(*) AS n FROM comp GROUP BY keeper_id)
            SELECT d.doc_id,
                   COALESCE(c.keeper_id, d.doc_id) AS keeper_id,
                   CAST(COALESCE(s.n, 1) AS BIGINT) AS cluster_size
            FROM documents d
            LEFT JOIN comp c ON d.doc_id = c.node
            LEFT JOIN sizes s ON c.keeper_id = s.keeper_id
        """,
        "repetition_signals": f"""
            WITH {_TOKENS_CTE},
            g AS (
                SELECT doc_id, unnest(list_transform(
                    range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])) AS gram
                FROM tk WHERE len(tk) >= 2
            ),
            c AS (SELECT doc_id, gram, COUNT(*) AS cnt FROM g GROUP BY doc_id, gram),
            a AS (
                SELECT doc_id,
                       CAST(SUM(cnt) AS BIGINT) AS n_grams,
                       CAST(COALESCE(SUM(CASE WHEN cnt >= 2 THEN cnt END), 0) AS BIGINT) AS dup_grams
                FROM c GROUP BY doc_id
            ),
            t AS (
                SELECT doc_id, gram AS top_gram, cnt AS top_count FROM (
                    SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, gram ASC) AS rn
                    FROM c
                ) WHERE rn = 1
            )
            SELECT a.doc_id, n_grams, top_gram, CAST(top_count AS BIGINT) AS top_count,
                   ROUND(CAST(top_count AS DOUBLE) / n_grams, 6) AS top_frac,
                   ROUND(CAST(dup_grams AS DOUBLE) / n_grams, 6) AS dup_frac
            FROM a JOIN t USING (doc_id)
        """,
        "mixture_sample": f"""
            WITH rates(source, rate_pct) AS (VALUES
                {", ".join(f"('{s}', {p})" for s, p in _MIXTURE_RATES.items())}
            )
            SELECT d.doc_id, d.source
            FROM documents d JOIN rates r USING (source)
            WHERE CAST(('0x' || substr(md5('mix:' || CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100
                  < r.rate_pct
        """,
        "decontaminate": f"""
            WITH b AS (
                SELECT doc_id, text,
                       CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS bucket
                FROM documents
            ),
            btk AS (SELECT doc_id, bucket, string_split({_NORM_TEXT}, ' ') AS tk FROM b),
            bsh AS (
                SELECT doc_id, bucket, unnest(list_distinct(list_transform(
                    range(1, len(tk) - 1), i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS shingle
                FROM btk WHERE len(tk) >= 3
            ),
            eval_sh AS (SELECT DISTINCT shingle FROM bsh WHERE bucket >= 95),
            agg AS (
                SELECT t.doc_id,
                       COUNT(*) AS n_shingles,
                       CAST(SUM(CASE WHEN e.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
                FROM (SELECT doc_id, shingle FROM bsh WHERE bucket < 90) t
                LEFT JOIN eval_sh e ON t.shingle = e.shingle
                GROUP BY t.doc_id
            )
            SELECT doc_id, n_shingles, n_shared,
                   ROUND(CAST(n_shared AS DOUBLE) / n_shingles, 6) AS overlap_ratio,
                   CAST(n_shared * 10 >= n_shingles AS INT) AS contaminated
            FROM agg
        """,
        "simhash": f"""
            WITH {_TOKENS_CTE},
            tok AS (SELECT doc_id, unnest(tk) AS tok FROM tk),
            h AS (SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS h FROM tok),
            bits AS (
                SELECT doc_id, r.b,
                       SUM(CASE WHEN (h >> r.b) & 1 = 1 THEN 1 ELSE -1 END) AS s
                FROM h, range(32) AS r(b) GROUP BY doc_id, r.b
            )
            SELECT doc_id,
                   CAST(SUM(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS simhash
            FROM bits GROUP BY doc_id
        """,
        "jaccard_pairs": f"""
            {_MINHASH_CTES},
            shc AS (
                SELECT * FROM sh WHERE shingle NOT IN (
                    SELECT shingle FROM sh GROUP BY shingle HAVING count(*) > {_JACCARD_MAX_DF}
                )
            ),
            sz AS (SELECT doc_id, count(*) AS sz FROM shc GROUP BY doc_id),
            common AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
                FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                GROUP BY a.doc_id, b.doc_id
            )
            SELECT id_a, id_b,
                   ROUND(common * 1.0 / (sa.sz + sb.sz - common), {_SCORE_DECIMALS}) AS jaccard
            FROM common
            JOIN sz sa ON sa.doc_id = id_a
            JOIN sz sb ON sb.doc_id = id_b
            WHERE common * 1.0 / (sa.sz + sb.sz - common) >= {_JACCARD_THRESHOLD}
        """,
        "bootstrap_ci": f"""
            WITH vals AS (
                SELECT CAST(o_orderkey AS VARCHAR) AS k,
                       CAST(CAST(o_totalprice AS DECIMAL(28,2)) * 100 AS BIGINT) AS v
                FROM orders WHERE o_totalprice IS NOT NULL
            ),
            blocks AS (
                SELECT v, blk, md5('boot|' || CAST(blk AS VARCHAR) || '|' || k) AS d
                FROM vals, (SELECT unnest(range(0, 50)) AS blk)
            ),
            drawn AS (
                SELECT blk * 4 + j AS b, v,
                       CAST(('0x' || substr(d, 1 + 8 * j, 8)) AS BIGINT) % 1073741824 AS r
                FROM blocks, (SELECT unnest(range(0, 4)) AS j)
            ),
            weighted AS (
                SELECT b, v,
                       ({" + ".join(f"(CASE WHEN r >= {t} THEN 1 ELSE 0 END)" for t in POISSON1_CDF_U30)}) AS w
                FROM drawn
            ),
            means AS (
                SELECT b, CASE WHEN SUM(w) = 0 THEN NULL
                          ELSE ROUND(CAST(SUM(w * v) AS DOUBLE) / CAST(SUM(w) AS DOUBLE) / 100.0, 2) END AS m
                FROM weighted GROUP BY b
            ),
            ranked AS (
                SELECT m, row_number() OVER (ORDER BY m ASC, b ASC) AS rn,
                       count(*) OVER () AS cnt
                FROM means WHERE m IS NOT NULL
            ),
            fullagg AS (SELECT count(*) AS n_rows, SUM(v) AS sv FROM vals)
            SELECT n_rows, 200 AS n_resamples,
                   ROUND(CAST(sv AS DOUBLE) / CAST(n_rows AS DOUBLE) / 100.0, 2) AS mean,
                   (SELECT m FROM ranked WHERE rn = greatest(1, (25 * cnt + 999) // 1000)) AS ci_lo,
                   (SELECT m FROM ranked WHERE rn = (975 * cnt + 999) // 1000) AS ci_hi
            FROM fullagg
        """,
        "containment_dedup": f"""
            {_MINHASH_CTES},
            shc AS (
                SELECT * FROM sh WHERE shingle NOT IN (
                    SELECT shingle FROM sh GROUP BY shingle HAVING count(*) > {_JACCARD_MAX_DF}
                )
            ),
            sz AS (SELECT doc_id, count(*) AS sz FROM shc GROUP BY doc_id),
            common AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
                FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                GROUP BY a.doc_id, b.doc_id
            )
            SELECT id_a, id_b, common, sa.sz AS sz_a, sb.sz AS sz_b,
                   ROUND(common * 1.0 / sa.sz, 6) AS c_a,
                   ROUND(common * 1.0 / sb.sz, 6) AS c_b
            FROM common
            JOIN sz sa ON sa.doc_id = id_a
            JOIN sz sb ON sb.doc_id = id_b
            WHERE greatest(common * 1.0 / sa.sz, common * 1.0 / sb.sz)
                  >= {_CONTAINMENT_THRESHOLD}
        """,
        "interval_overlap": f"""
            WITH iv AS (
                SELECT o.o_orderkey AS k, c.c_nationkey AS nk,
                       date_diff('day', DATE '{_OVERLAP_EPOCH}', o.o_orderdate) AS s,
                       date_diff('day', DATE '{_OVERLAP_EPOCH}', o.o_orderdate)
                           + 7 * CAST(substr(o.o_orderpriority, 1, 1) AS INT) AS e
                FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            ),
            p AS (
                SELECT a.nk, least(a.e, b.e) - greatest(a.s, b.s) + 1 AS od
                FROM iv a JOIN iv b
                ON a.nk = b.nk AND a.k < b.k AND a.s <= b.e AND b.s <= a.e
            )
            SELECT n.n_name, count(*) AS n_pairs, ROUND(avg(od), 4) AS avg_overlap_days
            FROM p JOIN nation n ON p.nk = n.n_nationkey
            GROUP BY n.n_name
        """,
        "fuzzy_name_pairs": """
            SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
                   a.c_name AS name_a, b.c_name AS name_b,
                   CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
            FROM customer a JOIN customer b
            ON a.c_custkey < b.c_custkey
               AND abs(length(a.c_name) - length(b.c_name)) <= 1
               AND levenshtein(a.c_name, b.c_name) <= 1
        """,
        "graph_rag_expansion": f"""
            WITH tok AS (
                SELECT doc_id, t.term
                FROM documents, unnest(regexp_split_to_array(lower(text), '\\s+')) AS t(term)
                WHERE t.term <> ''
            ),
            tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
            terms AS (SELECT DISTINCT doc_id, term FROM tok),
            edges AS (
                SELECT a.term AS ta, b.term AS tb, count(*) AS w
                FROM terms a JOIN terms b
                ON a.doc_id = b.doc_id AND a.term < b.term
                GROUP BY 1, 2
            ),
            und AS (
                SELECT ta AS t1, tb AS t2, w FROM edges
                UNION ALL SELECT tb, ta, w FROM edges
            ),
            nbr AS (
                SELECT t2 AS term, sum(w) AS wt FROM und
                WHERE t1 IN ({", ".join("'" + s + "'" for s in _GRAPH_SEEDS)})
                  AND t2 NOT IN ({", ".join("'" + s + "'" for s in _GRAPH_SEEDS)})
                GROUP BY t2
                ORDER BY sum(w) DESC, t2 ASC LIMIT {_GRAPH_EXPANSION_K}
            ),
            wts AS (
                SELECT term, CAST({_GRAPH_SEED_WEIGHT} AS BIGINT) AS wt
                FROM (SELECT unnest([{", ".join("'" + s + "'" for s in _GRAPH_SEEDS)}]) AS term)
                UNION ALL SELECT term, CAST(wt AS BIGINT) FROM nbr
            ),
            scored AS (
                SELECT f.doc_id, CAST(sum(f.tf * w.wt) AS BIGINT) AS score,
                       count(*) AS n_matched
                FROM tf f JOIN wts w USING (term) GROUP BY 1
            )
            SELECT doc_id, score, n_matched FROM scored
            ORDER BY score DESC, doc_id ASC LIMIT 20
        """,
        "peak_concurrency": f"""
            WITH iv AS (
                SELECT c.c_nationkey AS nk,
                       date_diff('day', DATE '{_OVERLAP_EPOCH}', o.o_orderdate) AS s,
                       date_diff('day', DATE '{_OVERLAP_EPOCH}', o.o_orderdate)
                           + 7 * CAST(substr(o.o_orderpriority, 1, 1) AS INT) AS e
                FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            ),
            ev AS (
                SELECT nk, s AS d, 1 AS delta FROM iv
                UNION ALL SELECT nk, e + 1, -1 FROM iv
            ),
            net AS (SELECT nk, d, sum(delta) AS nd FROM ev GROUP BY 1, 2),
            cum AS (
                SELECT nk, d,
                       sum(nd) OVER (
                           PARTITION BY nk ORDER BY d
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                       ) AS c
                FROM net
            ),
            pk AS (
                SELECT nk, d, c,
                       row_number() OVER (PARTITION BY nk ORDER BY c DESC, d ASC) AS rn
                FROM cum
            )
            SELECT n.n_name, CAST(pk.c AS INT) AS peak,
                   DATE '{_OVERLAP_EPOCH}' + CAST(pk.d AS INT) AS peak_date
            FROM pk JOIN nation n ON pk.nk = n.n_nationkey
            WHERE rn = 1
        """,
        "changepoint_split": """
            WITH d AS (
                SELECT date_trunc('day', o_orderdate) AS dt, count(*) AS n
                FROM orders GROUP BY 1
            ),
            tot AS (SELECT sum(n) AS sn, count(*) AS nn FROM d),
            c AS (
                SELECT dt,
                       sum(n) OVER (ORDER BY dt
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS st,
                       count(*) OVER (ORDER BY dt
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nt
                FROM d
            ),
            dev AS (
                SELECT dt, st, nt, sn, nn,
                       abs(CAST(nn AS DECIMAL(38,0)) * CAST(st AS DECIMAL(38,0))
                           - CAST(nt AS DECIMAL(38,0)) * CAST(sn AS DECIMAL(38,0))) AS dstat
                FROM c, tot WHERE nt < nn
            )
            SELECT dt AS split_day, CAST(dstat AS DOUBLE) AS d_stat,
                   ROUND(CAST(st AS DOUBLE) / nt, 6) AS mean_left,
                   ROUND(CAST(sn - st AS DOUBLE) / (nn - nt), 6) AS mean_right
            FROM dev ORDER BY dstat DESC, dt ASC LIMIT 1
        """,
        "hll_rollup": f"""
            WITH f AS (
                SELECT r.r_name,
                       CAST(('0x' || substr(md5(CAST(o.o_custkey AS VARCHAR)), 1, 15)) AS BIGINT) AS h
                FROM orders o
                JOIN customer c ON o.o_custkey = c.c_custkey
                JOIN nation n ON c.c_nationkey = n.n_nationkey
                JOIN region r ON n.n_regionkey = r.r_regionkey
            ),
            r AS (SELECT r_name, h % 512 AS reg, h // 512 AS w FROM f),
            rho AS (
                SELECT r_name, reg,
                       52 - (CASE WHEN w = 0 THEN 0 ELSE length(to_base(w, 2)) END) AS rho
                FROM r
            ),
            regs AS (SELECT r_name, reg, MAX(rho) AS max_rho FROM rho GROUP BY 1, 2),
            agg AS (
                SELECT r_name, COUNT(*) AS registers_used,
                       SUM(CAST(1 AS BIGINT) << (52 - max_rho)) AS s_occ
                FROM regs GROUP BY 1
            ),
            fin AS (
                SELECT r_name, registers_used,
                       s_occ + (512 - registers_used) * CAST(4503599627370496 AS BIGINT) AS s
                FROM agg
            )
            SELECT r_name, registers_used,
                   ROUND(CASE WHEN {_HLL_EST} <= 2.5 * 512.0 AND registers_used < 512
                         THEN 512.0 * ln(512.0 / (512 - registers_used))
                         ELSE {_HLL_EST} END, 6) AS distinct_est
            FROM fin
        """,
        "trigram_paths": """
            WITH s AS (
                SELECT event_type AS g1,
                       lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS g2,
                       lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS g3
                FROM events
            ),
            t AS (
                SELECT g1, g2, g3, count(*) AS n_occurrences
                FROM s WHERE g3 IS NOT NULL GROUP BY 1, 2, 3
            )
            SELECT g1, g2, g3, n_occurrences FROM t
            ORDER BY n_occurrences DESC, g1 ASC, g2 ASC, g3 ASC LIMIT 20
        """,
        "quantile_normalization": """
            WITH d AS (
                SELECT o_orderkey, c_nationkey, o_totalprice
                FROM orders JOIN customer ON o_custkey = c_custkey
            ),
            r AS (
                SELECT o_orderkey, c_nationkey, o_totalprice,
                       row_number() OVER (
                           PARTITION BY c_nationkey ORDER BY o_totalprice, o_orderkey
                       ) AS rr,
                       count(*) OVER (PARTITION BY c_nationkey) AS n
                FROM d
            ),
            tot AS (SELECT count(*) AS nn FROM d),
            p AS (SELECT r.*, (rr * nn + n - 1) // n AS k FROM r, tot),
            vg AS (SELECT o_totalprice AS v, count(*) AS cnt FROM d GROUP BY 1),
            sp AS (
                SELECT v, cnt,
                       sum(cnt) OVER (ORDER BY v
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
                FROM vg
            ),
            spans AS (SELECT v, cum - cnt + 1 AS lo, cum AS hi FROM sp)
            SELECT p.o_orderkey, p.c_nationkey, p.o_totalprice, s.v AS norm_value
            FROM p JOIN spans s ON p.k BETWEEN s.lo AND s.hi
        """,
        "mutual_information": """
            WITH pairs AS (
                SELECT 'lang_source' AS pair, lang AS x, source AS y FROM documents
                UNION ALL
                SELECT 'segment_nation', c_mktsegment, CAST(c_nationkey AS VARCHAR) FROM customer
                UNION ALL
                SELECT 'priority_status', o_orderpriority, o_orderstatus FROM orders
            ),
            cells AS (SELECT pair, x, y, count(*) AS nxy FROM pairs GROUP BY 1, 2, 3),
            mx AS (SELECT pair, x, sum(nxy) AS nx FROM cells GROUP BY 1, 2),
            my AS (SELECT pair, y, sum(nxy) AS ny FROM cells GROUP BY 1, 2),
            tot AS (SELECT pair, sum(nxy) AS n FROM cells GROUP BY 1),
            terms AS (
                SELECT c.pair,
                       CAST(ROUND(((CAST(nxy AS DOUBLE) / CAST(n AS DOUBLE)) *
                           ln((CAST(nxy AS DOUBLE) * CAST(n AS DOUBLE)) /
                              (CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE)))) * 1e12) AS BIGINT) AS t
                FROM cells c
                JOIN mx USING (pair, x) JOIN my USING (pair, y) JOIN tot USING (pair)
            )
            SELECT pair, ROUND(CAST(sum(t) AS DOUBLE) / 1e12, 8) AS mi_nats
            FROM terms GROUP BY pair
        """,
        "curriculum_order": """
            WITH t AS (
                SELECT doc_id, n_chars,
                       CAST(ntile(10) OVER (ORDER BY n_chars, doc_id) AS INT) AS bucket
                FROM documents
            ),
            s AS (
                SELECT doc_id, bucket,
                       row_number() OVER (
                           PARTITION BY bucket
                           ORDER BY CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT),
                                    doc_id
                       ) AS rnk
                FROM t
            )
            SELECT CAST(row_number() OVER (ORDER BY rnk, bucket) AS INT) AS position,
                   bucket, doc_id
            FROM s
        """,
        "interval_islands": f"""
            WITH iv AS (
                SELECT o_custkey AS ck,
                       date_diff('day', DATE '{_OVERLAP_EPOCH}', o_orderdate) AS s,
                       date_diff('day', DATE '{_OVERLAP_EPOCH}', o_orderdate)
                           + 7 * CAST(substr(o_orderpriority, 1, 1) AS INT) AS e
                FROM orders
            ),
            m AS (
                SELECT ck, s, e,
                       CASE WHEN s > coalesce(max(e) OVER (
                           PARTITION BY ck ORDER BY s, e
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                       ), -4611686018427387904) THEN 1 ELSE 0 END AS brk
                FROM iv
            ),
            isl AS (
                SELECT ck, s, e,
                       sum(brk) OVER (PARTITION BY ck ORDER BY s, e
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS iid
                FROM m
            ),
            g AS (
                SELECT ck, iid, min(s) AS island_start, max(e) AS island_end,
                       count(*) AS n_intervals
                FROM isl GROUP BY 1, 2
            )
            SELECT ck, count(*) AS n_islands, max(n_intervals) AS max_merged,
                   CAST(sum(island_end - island_start + 1) AS BIGINT) AS covered_days
            FROM g GROUP BY ck
        """,
        "markov_attribution": _markov_oracle_sql(10),
        "token_budget_mixture": """
            WITH stats AS (
                SELECT source, CAST(sum(n_chars) AS BIGINT) AS ns FROM documents GROUP BY 1
            ),
            tot AS (SELECT CAST(sum(n_chars) AS BIGINT) AS t FROM documents),
            w AS (
                SELECT source, ns,
                       CAST(floor(sqrt(CAST(ns AS DOUBLE))) AS BIGINT) AS weight,
                       t // 10 AS b
                FROM stats, tot
            ),
            ws AS (SELECT CAST(sum(weight) AS BIGINT) AS wsum FROM w),
            base AS (
                SELECT source, weight, b,
                       (b * weight) // wsum AS alloc0,
                       (b * weight) % wsum AS rem
                FROM w, ws
            ),
            resid AS (SELECT max(b) - CAST(sum(alloc0) AS BIGINT) AS r FROM base),
            alloc AS (
                SELECT source, weight,
                       alloc0 + CASE WHEN row_number() OVER (ORDER BY rem DESC, source ASC) <= r
                                     THEN 1 ELSE 0 END AS alloc_tokens
                FROM base, resid
            ),
            ordered AS (
                SELECT source, n_chars,
                       sum(n_chars) OVER (
                           PARTITION BY source
                           ORDER BY CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) ASC,
                                    doc_id ASC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                       ) AS cum
                FROM documents
            ),
            taken AS (
                SELECT o.source, count(*) AS n_docs_taken,
                       CAST(sum(o.n_chars) AS BIGINT) AS tokens_taken
                FROM ordered o JOIN alloc a ON o.source = a.source
                WHERE o.cum <= a.alloc_tokens
                GROUP BY 1
            )
            SELECT a.source, a.weight, a.alloc_tokens,
                   coalesce(t.n_docs_taken, 0) AS n_docs_taken,
                   coalesce(t.tokens_taken, 0) AS tokens_taken
            FROM alloc a LEFT JOIN taken t ON a.source = t.source
        """,
        "t_closeness": """
            WITH c10 AS (
                SELECT c_custkey, c_nationkey, c_mktsegment,
                       CAST(ntile(10) OVER (ORDER BY c_acctbal ASC, c_custkey ASC) AS INT)
                           AS bal_decile
                FROM customer
            ),
            j AS (
                SELECT c_nationkey, c_mktsegment, bal_decile, o_orderpriority AS s
                FROM c10 JOIN orders ON o_custkey = c_custkey
            ),
            cls AS (
                SELECT c_nationkey, c_mktsegment, bal_decile, s, count(*) AS ncs
                FROM j GROUP BY 1, 2, 3, 4
            ),
            csz AS (
                SELECT c_nationkey, c_mktsegment, bal_decile, CAST(sum(ncs) AS BIGINT) AS nc
                FROM cls GROUP BY 1, 2, 3
            ),
            g AS (SELECT s, count(*) AS ng FROM j GROUP BY 1),
            tot AS (SELECT count(*) AS nn FROM j),
            agg AS (
                SELECT c.c_nationkey, c.c_mktsegment, c.bal_decile, c.nc, t.nn,
                       CAST(SUM(abs(coalesce(x.ncs, 0) * t.nn - g.ng * c.nc)) AS BIGINT) AS num
                FROM csz c CROSS JOIN g CROSS JOIN tot t
                LEFT JOIN cls x
                ON x.c_nationkey = c.c_nationkey AND x.c_mktsegment = c.c_mktsegment
                   AND x.bal_decile = c.bal_decile AND x.s = g.s
                GROUP BY 1, 2, 3, 4, 5
            )
            SELECT c_nationkey, c_mktsegment, bal_decile, nc AS class_size,
                   ROUND(CAST(num AS DOUBLE) / (2.0 * nc * nn), 6) AS tvd,
                   num * 10 > 6 * nc * nn AS violates_t
            FROM agg
        """,
        "sliding_heavy_hitters": """
            WITH dc AS (
                SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type, count(*) AS n
                FROM events GROUP BY 1, 2
            ),
            days AS (SELECT DISTINCT day FROM dc),
            sk AS (
                SELECT day, d,
                       CAST(('0x' || substr(md5('cms' || d || '|' || event_type), 1, 15)) AS BIGINT) % 16 AS bucket,
                       CAST(SUM(n) AS BIGINT) AS bucket_count
                FROM dc, (SELECT unnest([0, 1, 2]) AS d)
                GROUP BY 1, 2, 3
            ),
            merged AS (
                SELECT t.day AS wday, sk.d, sk.bucket,
                       CAST(SUM(sk.bucket_count) AS BIGINT) AS bucket_count
                FROM days t JOIN sk ON sk.day BETWEEN t.day - 6 AND t.day
                GROUP BY 1, 2, 3
            ),
            exact AS (
                SELECT t.day AS wday, dc.event_type, CAST(SUM(dc.n) AS BIGINT) AS exact_n
                FROM days t JOIN dc ON dc.day BETWEEN t.day - 6 AND t.day
                GROUP BY 1, 2
            ),
            probes AS (
                SELECT wday, event_type, d,
                       CAST(('0x' || substr(md5('cms' || d || '|' || event_type), 1, 15)) AS BIGINT) % 16 AS bucket
                FROM exact, (SELECT unnest([0, 1, 2]) AS d)
            ),
            est AS (
                SELECT p.wday, p.event_type, MIN(m.bucket_count) AS cms_est
                FROM probes p JOIN merged m
                ON p.wday = m.wday AND p.d = m.d AND p.bucket = m.bucket
                GROUP BY 1, 2
            )
            SELECT e.wday AS day, e.event_type, e.exact_n, s.cms_est
            FROM exact e JOIN est s ON e.wday = s.wday AND e.event_type = s.event_type
        """,
        "sliding_distinct_users": f"""
            WITH f AS (
                SELECT CAST(date_trunc('day', ts) AS DATE) AS day, user_id FROM events
            ),
            days AS (SELECT DISTINCT day FROM f),
            win AS (
                SELECT d.day AS wday, f.user_id
                FROM days d JOIN f ON f.day BETWEEN d.day - 6 AND d.day
            ),
            h AS (
                SELECT wday,
                       CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
                FROM win
            ),
            r AS (SELECT wday, h % 512 AS reg, h // 512 AS w FROM h),
            rho AS (
                SELECT wday, reg,
                       52 - (CASE WHEN w = 0 THEN 0 ELSE length(to_base(w, 2)) END) AS rho
                FROM r
            ),
            regs AS (SELECT wday, reg, MAX(rho) AS max_rho FROM rho GROUP BY 1, 2),
            agg AS (
                SELECT wday, COUNT(*) AS registers_used,
                       SUM(CAST(1 AS BIGINT) << (52 - max_rho)) AS s_occ
                FROM regs GROUP BY 1
            ),
            fin AS (
                SELECT wday, registers_used,
                       s_occ + (512 - registers_used) * CAST(4503599627370496 AS BIGINT) AS s
                FROM agg
            )
            SELECT wday AS day, registers_used,
                   ROUND(CASE WHEN {_HLL_EST} <= 2.5 * 512.0 AND registers_used < 512
                         THEN 512.0 * ln(512.0 / (512 - registers_used))
                         ELSE {_HLL_EST} END, 6) AS distinct_est
            FROM fin
        """,
        "rolling_median_anomaly": f"""
            WITH h AS (
                SELECT date_trunc('hour', ts) AS hr, count(*) AS n
                FROM events GROUP BY 1
            ),
            m AS (
                SELECT hr, n,
                       CAST(2 * median(n) OVER (
                           ORDER BY hr
                           ROWS BETWEEN {_HAMPEL_HALF_WINDOW} PRECEDING
                                    AND {_HAMPEL_HALF_WINDOW} FOLLOWING
                       ) AS BIGINT) AS m2
                FROM h
            )
            SELECT hr, n, m2 / 2.0 AS med,
                   2 * abs(2 * n - m2) > m2 AS is_anomaly
            FROM m
        """,
        "l_diversity": f"""
            WITH c10 AS (
                SELECT c_custkey, c_nationkey, c_mktsegment,
                       CAST(ntile(10) OVER (ORDER BY c_acctbal ASC, c_custkey ASC) AS INT)
                           AS bal_decile
                FROM customer
            )
            SELECT c_nationkey, c_mktsegment, bal_decile,
                   count(DISTINCT c_custkey) AS class_size,
                   count(DISTINCT o_orderpriority) AS l_div,
                   count(DISTINCT o_orderpriority) < {_LDIV_L} AS violates_l
            FROM c10 JOIN orders ON o_custkey = c_custkey
            GROUP BY 1, 2, 3
        """,
        "ranking_quality": f"""
            WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv, label AS q_label
                       FROM embeddings WHERE vec_id < {_KNN_QUERIES}),
            ranked AS (
                SELECT q_id, vec_id, q_label, rn AS rank FROM (
                    SELECT q.q_id, e.vec_id, q.q_label,
                           row_number() OVER (
                               PARTITION BY q.q_id
                               ORDER BY {_COS_SCORE} DESC, e.vec_id ASC
                           ) AS rn
                    FROM embeddings e, q
                    WHERE e.vec_id <> q.q_id
                ) WHERE rn <= 10
            ),
            judged AS (
                SELECT r.q_id, r.rank,
                       CASE WHEN e.label = r.q_label THEN 1 ELSE 0 END AS rel
                FROM ranked r JOIN embeddings e ON e.vec_id = r.vec_id
            ),
            gains AS (
                SELECT q_id, rank, rel,
                       CAST(ROUND(CAST(rel AS DOUBLE) / log2(rank + 1) * 1e12) AS BIGINT) AS gain_u,
                       row_number() OVER (
                           PARTITION BY q_id ORDER BY rel DESC, rank ASC
                       ) AS ipos
                FROM judged
            ),
            igains AS (
                SELECT *, CAST(ROUND(CAST(rel AS DOUBLE) / log2(ipos + 1) * 1e12) AS BIGINT) AS igain_u
                FROM gains
            ),
            agg AS (
                SELECT q_id,
                       CAST(SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_rel,
                       MIN(CASE WHEN rel > 0 THEN rank END) AS first_rel_rank,
                       CAST(SUM(gain_u) AS BIGINT) AS dcg_u,
                       CAST(SUM(igain_u) AS BIGINT) AS idcg_u
                FROM igains GROUP BY q_id
            )
            SELECT q_id, n_rel, first_rel_rank,
                   CASE WHEN first_rel_rank IS NULL THEN 0.0
                        ELSE ROUND(1.0 / first_rel_rank, 6) END AS rr,
                   ROUND(dcg_u / 1e12, 6) AS dcg,
                   ROUND(idcg_u / 1e12, 6) AS idcg,
                   CASE WHEN idcg_u > 0 THEN ROUND(dcg_u * 1.0 / idcg_u, 6) END AS ndcg
            FROM agg
        """,
        "knn_batch": f"""
            WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv
                       FROM embeddings WHERE vec_id < {_KNN_QUERIES})
            SELECT q_id, vec_id, score FROM (
                SELECT q.q_id, e.vec_id, {_COS_SCORE} AS score,
                       row_number() OVER (
                           PARTITION BY q.q_id
                           ORDER BY {_COS_SCORE} DESC, e.vec_id ASC
                       ) AS rn
                FROM embeddings e, q
            ) WHERE rn <= 5
        """,
        "knn_lsh": f"""
            WITH hp AS (SELECT vec_id - 1 AS b, embedding::DOUBLE[] AS v
                        FROM embeddings WHERE vec_id BETWEEN 1 AND {_ANN_PLANES}),
            bk AS (
                SELECT e.vec_id,
                       CAST(SUM(CASE WHEN list_dot_product(e.embedding::DOUBLE[], hp.v) > 0
                                THEN (1::BIGINT << hp.b) ELSE 0 END) AS BIGINT) AS bucket
                FROM embeddings e, hp GROUP BY e.vec_id
            ),
            qq AS (SELECT CAST(0 AS BIGINT) AS q_id, e.embedding::DOUBLE[] AS qv, b.bucket
                   FROM embeddings e JOIN bk b ON e.vec_id = b.vec_id
                   WHERE e.vec_id = {_QUERY_VEC_ID}),
            flips AS (
                SELECT hp.b FROM hp, qq
                ORDER BY abs(list_dot_product(qq.qv, hp.v)) ASC, hp.b ASC
                LIMIT {_ANN_PROBES - 1}
            ),
            qp AS (
                SELECT q_id, qv, bucket FROM qq
                UNION ALL
                SELECT q_id, qv, xor(bucket, (1::BIGINT << b)) FROM qq, flips
            )
            SELECT q_id, vec_id, score FROM (
                SELECT q.q_id, e.vec_id, {_COS_SCORE} AS score,
                       row_number() OVER (
                           PARTITION BY q.q_id
                           ORDER BY {_COS_SCORE} DESC, e.vec_id ASC
                       ) AS rn
                FROM embeddings e JOIN bk ON e.vec_id = bk.vec_id
                                  JOIN qp q ON bk.bucket = q.bucket
            ) WHERE rn <= 10
        """,
        "knn_ivf": f"""
            WITH cent AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
                          FROM embeddings WHERE vec_id BETWEEN 1 AND {_IVF_LISTS}),
            assign AS (
                SELECT vec_id, cid FROM (
                    SELECT e.vec_id, c.cid,
                           row_number() OVER (
                               PARTITION BY e.vec_id
                               ORDER BY ROUND(list_dot_product(e.embedding::DOUBLE[], c.cv) /
                                   (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
                                    sqrt(list_dot_product(c.cv, c.cv))), 6) DESC, c.cid ASC) AS rn
                    FROM embeddings e, cent c
                ) WHERE rn = 1
            ),
            q AS (SELECT CAST(0 AS BIGINT) AS q_id, embedding::DOUBLE[] AS qv
                  FROM embeddings WHERE vec_id = {_QUERY_VEC_ID}),
            probes AS (
                SELECT cid FROM (
                    SELECT c.cid, row_number() OVER (
                        ORDER BY ROUND(list_dot_product(q.qv, c.cv) /
                            (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.cv, c.cv))), 6)
                            DESC, c.cid ASC) AS rn
                    FROM cent c, q
                ) WHERE rn <= {_IVF_PROBES}
            )
            SELECT q_id, vec_id, score FROM (
                SELECT q.q_id, e.vec_id, {_COS_SCORE} AS score,
                       row_number() OVER (
                           PARTITION BY q.q_id
                           ORDER BY {_COS_SCORE} DESC, e.vec_id ASC
                       ) AS rn
                FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id
                                  JOIN probes p ON a.cid = p.cid, q
            ) WHERE rn <= 10
        """,
        "near_dup_embedding": f"""
            WITH tok AS (
                SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS tok
                FROM documents
            ),
            tok2 AS (SELECT doc_id, tok FROM tok WHERE length(tok) > 0),
            hh AS (
                SELECT doc_id,
                       CAST(('0x' || substr(md5('{_EMBED_SEED}:' || tok), 1, 15)) AS BIGINT) AS h
                FROM tok2
            ),
            comp AS (
                SELECT doc_id, h % {_EMBED_DIMS} AS idx,
                       SUM(CASE WHEN (h // {_EMBED_DIMS}) % 2 = 0 THEN 1 ELSE -1 END) AS val
                FROM hh GROUP BY doc_id, h % {_EMBED_DIMS}
            ),
            norms AS (SELECT doc_id, sqrt(SUM(val * val)) AS norm FROM comp GROUP BY doc_id),
            hpc AS (
                SELECT vec_id - 1 AS b, idx - 1 AS hidx, hv
                FROM (SELECT vec_id, unnest(embedding[1:{_EMBED_DIMS}]::DOUBLE[]) AS hv,
                             generate_subscripts(embedding[1:{_EMBED_DIMS}]::DOUBLE[], 1) AS idx
                      FROM embeddings WHERE vec_id BETWEEN 1 AND {_NEARDUP_PLANES})
            ),
            bdot AS (
                SELECT c.doc_id, h.b, SUM(c.val * h.hv) AS d
                FROM comp c JOIN hpc h ON c.idx = h.hidx GROUP BY c.doc_id, h.b
            ),
            bk AS (
                SELECT doc_id,
                       CAST(SUM(CASE WHEN d > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS bucket
                FROM bdot GROUP BY doc_id
            ),
            cand AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b
                FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
            ),
            dots AS (
                SELECT ca.doc_id AS id_a, cb.doc_id AS id_b, SUM(ca.val * cb.val) AS dot
                FROM cand JOIN comp ca ON ca.doc_id = cand.id_a
                          JOIN comp cb ON cb.doc_id = cand.id_b AND cb.idx = ca.idx
                GROUP BY ca.doc_id, cb.doc_id
            )
            SELECT id_a, id_b, ROUND(dot / (na.norm * nb.norm), {_SCORE_DECIMALS}) AS cos
            FROM dots JOIN norms na ON na.doc_id = id_a JOIN norms nb ON nb.doc_id = id_b
            WHERE dot / (na.norm * nb.norm) >= {_NEARDUP_THRESHOLD}
        """,
        "text_stats": f"""
            WITH {_TOKENS_CTE},
            s AS (
                SELECT doc_id,
                       len(tk) AS token_cnt,
                       len(list_filter(tk, x -> list_contains({_STOPLIST['en']}, x))) AS stop_cnt,
                       list_sum(list_transform(tk, x -> length(x))) AS total_len
                FROM tk
            )
            SELECT doc_id, token_cnt, stop_cnt,
                   ROUND(stop_cnt * 1.0 / token_cnt, {_SCORE_DECIMALS}) AS stop_ratio,
                   ROUND(total_len * 1.0 / token_cnt, {_SCORE_DECIMALS}) AS avg_token_len,
                   ROUND(stop_cnt * 0.5 / token_cnt +
                         CASE WHEN ROUND(total_len * 1.0 / token_cnt, {_SCORE_DECIMALS})
                                   BETWEEN 3 AND 10 THEN 0.5 ELSE 0.0 END,
                         {_SCORE_DECIMALS}) AS quality
            FROM s
        """,
        "language_id": f"""
            WITH {_TOKENS_CTE},
            s AS (
                SELECT doc_id,
                       len(list_filter(tk, x -> list_contains({_STOPLIST['en']}, x))) AS s_en,
                       len(list_filter(tk, x -> list_contains({_STOPLIST['de']}, x))) AS s_de,
                       len(list_filter(tk, x -> list_contains({_STOPLIST['fr']}, x))) AS s_fr
                FROM tk
            )
            SELECT doc_id,
                   CASE WHEN s_en >= s_de AND s_en >= s_fr THEN 'en'
                        WHEN s_de >= s_fr THEN 'de'
                        ELSE 'fr' END AS pred_lang
            FROM s
        """,
        "winnow_fingerprints": f"""
            WITH norm AS (SELECT doc_id, {_NORM_TEXT} AS t FROM documents),
            pos AS (
                SELECT doc_id, t, unnest(generate_series(1, len(t) - {_WINNOW_K} + 1)) AS pos
                FROM norm WHERE len(t) >= {_WINNOW_K}
            ),
            g AS (
                SELECT doc_id, pos,
                       list_reduce(
                           list_prepend(CAST(0 AS BIGINT),
                               list_transform(generate_series(1, {_WINNOW_K}),
                                   j -> CAST(ord(substr(t, CAST(pos + j - 1 AS INT), 1)) AS BIGINT))),
                           (acc, c) -> (acc * 257 + c) % 2147483647) AS h
                FROM pos
            ),
            wm AS (
                SELECT doc_id, pos,
                       MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                                    ROWS BETWEEN CURRENT ROW AND {_WINNOW_W - 1} FOLLOWING) AS winmin,
                       MAX(pos) OVER (PARTITION BY doc_id) AS max_pos
                FROM g
            )
            SELECT DISTINCT doc_id, winmin AS fp
            FROM wm WHERE pos <= max_pos - {_WINNOW_W - 1}
        """,
        "bpe_token_stats": f"""
            WITH norm AS (SELECT doc_id, {_NORM_TEXT} AS t FROM documents),
            s AS (
                SELECT doc_id,
                       len(string_split(t, ' ')) AS ws_tokens,
                       len(regexp_extract_all(t, '{_BPE_RE_SQL}')) AS bpe_tokens,
                       len(t) AS n_chars
                FROM norm
            )
            SELECT doc_id, ws_tokens, bpe_tokens,
                   ROUND(n_chars / greatest(bpe_tokens, 1), {_SCORE_DECIMALS}) AS chars_per_token
            FROM s
        """,
        "quality_filter": f"""
            WITH norm AS (SELECT doc_id, {_NORM_TEXT} AS t FROM documents),
            base AS (
                SELECT doc_id, string_split(t, ' ') AS words, length(t) AS n_chars_norm,
                       length(regexp_replace(t, '[a-z0-9 ]', '', 'g')) AS symbol_chars
                FROM norm
            ),
            sig AS (
                SELECT doc_id,
                       len(words) AS word_count,
                       ROUND(list_sum(list_transform(words, w -> length(w))) * 1.0 / len(words), {_SCORE_DECIMALS}) AS mean_word_len,
                       ROUND(symbol_chars * 1.0 / greatest(n_chars_norm, 1), {_SCORE_DECIMALS}) AS symbol_ratio,
                       ROUND(len(list_filter(words, w -> regexp_matches(w, '[a-z]'))) * 1.0 / len(words), {_SCORE_DECIMALS}) AS alpha_word_ratio,
                       len(list_filter(words, w -> list_contains({_STOP_SQL}, w))) AS stop_hits
                FROM base
            )
            SELECT doc_id, word_count, mean_word_len, symbol_ratio, alpha_word_ratio, stop_hits,
                   CAST(word_count BETWEEN {curation.MIN_WORDS} AND {curation.MAX_WORDS} AS INT) AS ok_word_count,
                   CAST(mean_word_len BETWEEN {curation.MIN_MEAN_WORD_LEN} AND {curation.MAX_MEAN_WORD_LEN} AS INT) AS ok_word_len,
                   CAST(symbol_ratio <= {curation.MAX_SYMBOL_RATIO} AS INT) AS ok_symbols,
                   CAST(alpha_word_ratio >= {curation.MIN_ALPHA_WORD_RATIO} AS INT) AS ok_alpha,
                   CAST(stop_hits >= {curation.MIN_STOPWORD_HITS} AS INT) AS ok_stopwords,
                   CAST((word_count BETWEEN {curation.MIN_WORDS} AND {curation.MAX_WORDS}
                         AND mean_word_len BETWEEN {curation.MIN_MEAN_WORD_LEN} AND {curation.MAX_MEAN_WORD_LEN}
                         AND symbol_ratio <= {curation.MAX_SYMBOL_RATIO}
                         AND alpha_word_ratio >= {curation.MIN_ALPHA_WORD_RATIO}
                         AND stop_hits >= {curation.MIN_STOPWORD_HITS}) AS INT) AS passes
            FROM sig
        """,
        "stratified_split": """
            WITH b AS (
                SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS bucket,
                       lang
                FROM documents
            )
            SELECT CASE WHEN bucket < 90 THEN 'train'
                        WHEN bucket < 95 THEN 'val'
                        ELSE 'test' END AS split,
                   lang AS strata, COUNT(*) AS n_docs
            FROM b GROUP BY split, strata
        """,
        "group_topn": """
            SELECT lang, doc_id, n_chars, rn FROM (
                SELECT lang, doc_id, n_chars,
                       ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id ASC) AS rn
                FROM documents
            ) WHERE rn <= 5
        """,
        "length_percentiles": """
            WITH r AS (
                SELECT lang, n_chars,
                       ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars) AS rn,
                       COUNT(*) OVER (PARTITION BY lang) AS cnt
                FROM documents
            )
            SELECT lang,
                   MAX(CASE WHEN rn = CEIL(0.5 * cnt) THEN n_chars END) AS p50,
                   MAX(CASE WHEN rn = CEIL(0.9 * cnt) THEN n_chars END) AS p90,
                   MAX(CASE WHEN rn = CEIL(0.99 * cnt) THEN n_chars END) AS p99
            FROM r GROUP BY lang
        """,
        "sequence_packing": f"""
            WITH toks AS (
                SELECT lang, doc_id, len(string_split({_NORM_TEXT}, ' ')) AS tok
                FROM documents
            ),
            c AS (
                SELECT lang, tok,
                       CAST(COALESCE(SUM(tok) OVER (
                           PARTITION BY lang ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
                FROM toks
            )
            SELECT lang, cum_before // {_PACK_BUDGET} AS pack_id,
                   COUNT(*) AS n_docs, CAST(SUM(tok) AS BIGINT) AS pack_tokens
            FROM c GROUP BY lang, pack_id
        """,
        "sequence_packing_sharded": f"""
            WITH toks AS (
                SELECT lang, doc_id,
                       CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 4 AS shard,
                       len(string_split({_NORM_TEXT}, ' ')) AS tok
                FROM documents
            ),
            c AS (
                SELECT lang, shard, tok,
                       CAST(COALESCE(SUM(tok) OVER (
                           PARTITION BY lang, shard ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
                FROM toks
            )
            SELECT lang,
                   shard * 1099511627776 + cum_before // {_PACK_BUDGET} AS pack_id,
                   COUNT(*) AS n_docs, CAST(SUM(tok) AS BIGINT) AS pack_tokens
            FROM c GROUP BY lang, pack_id
        """,
        "event_window_agg": """
            SELECT date_trunc('hour', ts) AS window_start, event_type,
                   count(*) AS n,
                   ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "hash_embed_retrieval": f"""
            WITH tok AS (
                SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS tok
                FROM documents
            ),
            tok2 AS (SELECT doc_id, tok FROM tok WHERE length(tok) > 0),
            hh AS (
                SELECT doc_id,
                       CAST(('0x' || substr(md5('{_EMBED_SEED}:' || tok), 1, 15)) AS BIGINT) AS h
                FROM tok2
            ),
            comp AS (
                SELECT doc_id, h % {_EMBED_DIMS} AS idx,
                       SUM(CASE WHEN (h // {_EMBED_DIMS}) % 2 = 0 THEN 1 ELSE -1 END) AS val
                FROM hh GROUP BY doc_id, h % {_EMBED_DIMS}
            ),
            norms AS (SELECT doc_id, sqrt(SUM(val * val)) AS norm FROM comp GROUP BY doc_id),
            q AS (SELECT idx, val AS qval FROM comp WHERE doc_id = 0),
            qn AS (SELECT sqrt(SUM(qval * qval)) AS qnorm FROM q),
            dots AS (
                SELECT c.doc_id, SUM(c.val * q.qval) AS dot
                FROM comp c JOIN q USING (idx) GROUP BY c.doc_id
            )
            SELECT doc_id, ROUND((1.0 + dot / (norm * qnorm)) / 2.0, {_SCORE_DECIMALS}) AS score
            FROM dots JOIN norms USING (doc_id), qn
            ORDER BY score DESC, doc_id ASC LIMIT 10
        """,
        "asof_nearest": """
            WITH probes AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
            serie AS (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'),
            before_c AS (
                SELECT p.event_id, MAX(s.ts) AS bts
                FROM probes p JOIN serie s ON p.user_id = s.user_id AND s.ts <= p.ts
                GROUP BY p.event_id
            ),
            after_c AS (
                SELECT p.event_id, MIN(s.ts) AS ats
                FROM probes p JOIN serie s ON p.user_id = s.user_id AND s.ts > p.ts
                GROUP BY p.event_id
            ),
            chosen AS (
                SELECT p.event_id, p.user_id,
                       CASE WHEN b.bts IS NULL THEN a.ats
                            WHEN a.ats IS NULL THEN b.bts
                            WHEN (epoch_us(p.ts) - epoch_us(b.bts)) > (epoch_us(a.ats) - epoch_us(p.ts))
                                 THEN a.ats
                            ELSE b.bts END AS matched_ts
                FROM probes p
                LEFT JOIN before_c b ON p.event_id = b.event_id
                LEFT JOIN after_c a ON p.event_id = a.event_id
            )
            SELECT c.event_id, c.user_id, c.matched_ts, ROUND(s.value, 2) AS matched_value
            FROM chosen c
            LEFT JOIN serie s ON s.user_id = c.user_id AND s.ts = c.matched_ts
        """,
        "asof_backward": """
            WITH probes AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
            serie AS (SELECT user_id, ts FROM events WHERE event_type = 'signup'),
            m AS (
                SELECT p.event_id, MAX(s.ts) AS matched_ts
                FROM probes p JOIN serie s ON p.user_id = s.user_id AND s.ts <= p.ts
                GROUP BY p.event_id
            )
            SELECT p.event_id, p.user_id, m.matched_ts
            FROM probes p LEFT JOIN m ON p.event_id = m.event_id
        """,
        "asof_forward": """
            WITH probes AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
            serie AS (SELECT user_id, ts FROM events WHERE event_type = 'signup'),
            m AS (
                SELECT p.event_id, MIN(s.ts) AS matched_ts
                FROM probes p JOIN serie s ON p.user_id = s.user_id AND s.ts >= p.ts
                GROUP BY p.event_id
            )
            SELECT p.event_id, p.user_id, m.matched_ts
            FROM probes p LEFT JOIN m ON p.event_id = m.event_id
        """,
        "upsert_docs": """
            WITH updates AS (
                SELECT doc_id, 'xx' AS lang, n_chars + 1000 AS n_chars
                FROM documents WHERE doc_id % 10 = 0
            )
            SELECT d.doc_id, d.lang, d.n_chars
            FROM documents d ANTI JOIN updates u ON d.doc_id = u.doc_id
            UNION ALL
            SELECT doc_id, lang, n_chars FROM updates
        """,
        "folder_move": """
            SELECT doc_id,
                   CASE WHEN fp = '/src1' OR starts_with(fp, '/src1/')
                        THEN '/archive/src1' || substr(fp, 6)
                        ELSE fp END AS folder_path
            FROM (SELECT doc_id, '/' || source || '/' || lang AS fp FROM documents)
        """,
        "batch_get": """
            WITH wanted AS (
                SELECT k AS l_orderkey, n AS l_linenumber
                FROM range(1, 41) r(k), (VALUES (1), (2)) t(n)
            )
            SELECT l.l_orderkey, l.l_linenumber, ROUND(l.l_extendedprice, 2) AS price
            FROM lineitem l SEMI JOIN wanted w
              ON l.l_orderkey = w.l_orderkey AND l.l_linenumber = w.l_linenumber
        """,
        "padding_grouped": """
            WITH chunks AS (
                SELECT l_orderkey AS document_id, l_linenumber AS chunk_number,
                       ROUND(l_extendedprice, 2) AS price
                FROM lineitem
            ),
            matches AS (
                SELECT document_id, chunk_number, price AS score
                FROM chunks WHERE price > 99000
            ),
            wanted AS (
                SELECT DISTINCT m.document_id, m.chunk_number + d.d AS chunk_number
                FROM matches m, (VALUES (-1), (0), (1)) AS d(d)
            )
            SELECT c.document_id, c.chunk_number,
                   COALESCE(m.score, 0.0) AS score,
                   (m.document_id IS NULL) AS is_padding
            FROM chunks c
            JOIN wanted w ON c.document_id = w.document_id AND c.chunk_number = w.chunk_number
            LEFT JOIN matches m ON c.document_id = m.document_id AND c.chunk_number = m.chunk_number
        """,
        "requeue_failed": """
            SELECT o_orderkey, o_orderstatus, o_orderpriority
            FROM orders
            WHERE NOT (o_orderstatus = 'F')
        """,
        "storage_rollup": """
            SELECT source AS app_id, CAST(SUM(n_chars) AS BIGINT) AS total_bytes,
                   count(*) AS doc_count
            FROM documents GROUP BY source
        """,
        "filename_fts": f"""
            WITH named AS (
                SELECT doc_id,
                       source || '_report-' || lang || '_' ||
                       (CASE WHEN n_chars % 7 = 0 THEN 'report-' ELSE '' END) ||
                       doc_id || '.txt' AS filename
                FROM documents
            ),
            lexed AS (
                SELECT doc_id, filename, {_fts_lex} AS lex
                FROM named
            )
            SELECT doc_id, filename,
                   ROUND({_fts_rank}, {_SCORE_DECIMALS}) AS rank
            FROM lexed
            WHERE ROUND({_fts_rank}, {_SCORE_DECIMALS}) > 0
            ORDER BY rank DESC, doc_id ASC
            LIMIT 20
        """,
        "weighted_sample": """
            WITH keyed AS (
                SELECT doc_id, n_chars,
                       ROUND(ln((CAST(('0x' || substr(md5('ws:' || CAST(doc_id AS VARCHAR)), 1, 15))
                                      AS BIGINT) % 1073741824 + 1) / 1073741824.0)
                             / CAST(n_chars AS DOUBLE), 6) AS sample_key
                FROM documents
                WHERE CAST(n_chars AS DOUBLE) > 0
            )
            SELECT doc_id, n_chars, sample_key
            FROM keyed
            ORDER BY sample_key DESC, doc_id ASC
            LIMIT 50
        """,
        "shipping_priority": """
            SELECT l_orderkey, o_orderdate, o_orderpriority,
                   ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
                       (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))))
                       AS DOUBLE), 4) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
              AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
            GROUP BY l_orderkey, o_orderdate, o_orderpriority
            ORDER BY revenue DESC, l_orderkey ASC
            LIMIT 10
        """,
        "gapfill_locf": """
            WITH ev AS (
                SELECT user_id, epoch_us(ts) // 21600000000 AS b, value AS v
                FROM events
            ),
            agg AS (
                SELECT user_id, b, count(*) AS n_events, ROUND(SUM(v), 6) AS v_sum
                FROM ev GROUP BY user_id, b
            ),
            rng AS (SELECT user_id, min(b) AS b0, max(b) AS b1 FROM agg GROUP BY user_id),
            grid AS (
                SELECT user_id, unnest(generate_series(b0, b1)) AS b FROM rng
            ),
            j AS (
                SELECT g.user_id, g.b, COALESCE(a.n_events, 0) AS n_events, a.v_sum
                FROM grid g LEFT JOIN agg a ON g.user_id = a.user_id AND g.b = a.b
            )
            SELECT user_id, make_timestamp(b * 21600000000) AS bucket_ts,
                   n_events, v_sum,
                   last_value(v_sum IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY b
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_locf
            FROM j
        """,
        "url_filter": """
            WITH urls AS (
                SELECT doc_id,
                       (CASE WHEN n_chars % 5 = 0 THEN 'ftp' ELSE 'https' END) || '://' ||
                       source ||
                       (CASE WHEN n_chars % 3 = 0 THEN '.ads.example.com'
                             WHEN n_chars % 3 = 1 THEN '.example.org'
                             ELSE '.tracker.net' END) || '/doc/' || doc_id AS url
                FROM documents
            ),
            parsed AS (
                SELECT doc_id,
                       nullif(lower(regexp_extract(url, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)), '') AS scheme,
                       nullif(lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)', 1)), '') AS host
                FROM urls
            ),
            m AS (
                SELECT doc_id, scheme, host,
                       list_filter(['ads.example.com', 'tracker.net'],
                                   d -> host = d OR ends_with(host, '.' || d)) AS matched
                FROM parsed
            )
            SELECT doc_id, scheme, host,
                   matched[1] AS blocked_by,
                   COALESCE(scheme IN ('http', 'https') AND host IS NOT NULL
                            AND matched[1] IS NULL, FALSE) AS keep
            FROM m
        """,
        "paragraph_dedup": """
            WITH base AS (
                SELECT doc_id, string_split(text, ' ') AS tk
                FROM documents WHERE text IS NOT NULL AND len(text) > 0
            ),
            synth AS (
                SELECT doc_id,
                       string_agg(array_to_string(tk[i*4+1 : i*4+4], ' '), chr(10) ORDER BY i) AS t
                FROM base,
                     LATERAL (SELECT unnest(generate_series(0,
                         CAST(ceil(len(tk)/4.0) AS INT) - 1)) AS i) g
                GROUP BY doc_id
            ),
            lines AS (
                SELECT doc_id, i - 1 AS pos, p[i] AS para
                FROM (SELECT doc_id, string_split(t, chr(10)) AS p FROM synth),
                     LATERAL (SELECT unnest(generate_series(1, len(p))) AS i) g
            ),
            valid AS (SELECT * FROM lines WHERE len(para) > 0),
            tot AS (SELECT doc_id, count(*) AS n_paras FROM valid GROUP BY doc_id),
            ranked AS (
                SELECT doc_id, pos, para,
                       row_number() OVER (PARTITION BY md5(para)
                                          ORDER BY doc_id ASC, pos ASC) AS rn
                FROM valid
            ),
            agg AS (
                SELECT doc_id, count(*) AS n_kept,
                       string_agg(para, chr(10) ORDER BY pos) AS text_dedup
                FROM ranked WHERE rn = 1 GROUP BY doc_id
            )
            SELECT t.doc_id, t.n_paras,
                   COALESCE(a.n_kept, 0) AS n_kept,
                   COALESCE(a.text_dedup, '') AS text_dedup
            FROM tot t LEFT JOIN agg a USING (doc_id)
        """,
        "knn_pq": f"""
            WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
                       WHERE vec_id = {_QUERY_VEC_ID}),
            {_pq_cbs},
            vecs AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
            approx AS (
                SELECT s.vec_id, s.ev, {_pq_approx} AS approx_dist
                FROM vecs s, q, {_pq_joins}
            ),
            cand AS (
                SELECT vec_id, ev FROM (
                    SELECT vec_id, ev,
                           row_number() OVER (ORDER BY approx_dist ASC, vec_id ASC) AS rn
                    FROM approx
                ) WHERE rn <= 50
            )
            SELECT vec_id, score FROM (
                SELECT c.vec_id, {_pq_score} AS score,
                       row_number() OVER (ORDER BY {_pq_score} DESC, c.vec_id ASC) AS rn
                FROM cand c, q
            ) WHERE rn <= 10
        """,
        "perplexity": f"""
            WITH toks AS (
                SELECT doc_id, list_prepend('<s>', string_split({_NORM_TEXT}, ' ')) AS tk
                FROM documents WHERE text IS NOT NULL
            ),
            big AS (
                SELECT doc_id, tk[i] AS prev, tk[i + 1] AS cur
                FROM toks, LATERAL (SELECT unnest(generate_series(1, len(tk) - 1)) AS i) t
                WHERE len(tk) >= 2
            ),
            cb AS (SELECT prev, cur, count(*) AS c_big FROM big GROUP BY prev, cur),
            cu AS (SELECT prev, count(*) AS c_prev FROM big GROUP BY prev),
            v AS (SELECT count(DISTINCT cur) AS vocab FROM big),
            scored AS (
                SELECT b.doc_id, ln((cb.c_big + 1.0) / (cu.c_prev + v.vocab)) AS lp
                FROM big b JOIN cb USING (prev, cur) JOIN cu USING (prev), v
            )
            SELECT doc_id, count(*) AS n_bigrams,
                   ROUND(exp(-SUM(lp) / count(*)), {_SCORE_DECIMALS}) AS ppl
            FROM scored GROUP BY doc_id
        """,
        "bm25_topk": f"""
            WITH tf AS (
                SELECT doc_id, len(tk) AS dl, {_bm25_tf}
                FROM (
                    SELECT doc_id, string_split({_NORM_TEXT}, ' ') AS tk
                    FROM documents WHERE text IS NOT NULL
                )
            ),
            stats AS (
                SELECT count(*) AS n_docs, avg(dl) AS avgdl, {_bm25_df} FROM tf
            ),
            scored AS (
                SELECT doc_id, ROUND({_bm25_score}, {_SCORE_DECIMALS}) AS score
                FROM tf, stats
            )
            SELECT doc_id, score FROM scored
            WHERE score > 0
            ORDER BY score DESC, doc_id ASC
            LIMIT 20
        """,
        "pii_scrub": f"""
            WITH contact AS (
                SELECT doc_id,
                       text || ' contact ' || source || '.team@example.com' ||
                       (CASE WHEN n_chars % 3 = 0
                             THEN ' cc admin' || CAST(n_chars % 10 AS VARCHAR) || '@corp.io'
                             ELSE '' END) ||
                       ' call 555-' || lpad(CAST((n_chars * 7) % 10000 AS VARCHAR), 4, '0') ||
                       ' from 10.0.' || CAST(n_chars % 256 AS VARCHAR) || '.' ||
                       CAST((n_chars * 3) % 256 AS VARCHAR) AS t
                FROM documents
            )
            SELECT doc_id, {_pii_counts}, {_pii_red} AS redacted
            FROM contact
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_qty,
                   ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_base_price,
                   ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
                              (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 4)
                       AS sum_disc_price,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "sessionization": """
            WITH s AS (
                SELECT user_id, ts, event_id,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000
                            THEN 1 ELSE 0 END AS is_new
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
            ),
            numbered AS (
                SELECT user_id, ts,
                       SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                                         ROWS UNBOUNDED PRECEDING) - 1 AS session_id
                FROM s
            )
            SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
                   count(*) AS n_events,
                   ((epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 100) / 10000.0 AS duration_s
            FROM numbered GROUP BY user_id, session_id
        """,
        "rollup_counts": """
            SELECT o_orderstatus, o_orderpriority, count(*) AS n
            FROM orders
            GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        """,
        "pivot_counts": """
            SELECT l_returnflag,
                   count(*) FILTER (WHERE l_linestatus = 'O') AS n_open,
                   count(*) FILTER (WHERE l_linestatus = 'F') AS n_filled
            FROM lineitem GROUP BY l_returnflag
        """,
        "typed_filter_docs": """
            -- mirrors the compiled typed-CASE OR exactly: the lang branch
            -- (declared number, value text) casts to NULL; NULL OR x = x
            -- only when x is TRUE, so the filter reduces to the n_chars arm
            SELECT doc_id, lang, n_chars
            FROM documents
            WHERE (TRY_CAST(lang AS DOUBLE) >= 0)
               OR (TRY_CAST(CAST(n_chars AS VARCHAR) AS DOUBLE) >= 500)
        """,
        "distinct_counts": """
            SELECT l_returnflag,
                   count(DISTINCT l_partkey) AS n_parts,
                   count(DISTINCT l_suppkey) AS n_supps,
                   count(DISTINCT l_orderkey) AS n_orders
            FROM lineitem GROUP BY l_returnflag
        """,
        "folder_summary": """
            SELECT COALESCE('/' || source || '/' || lang, lang) AS folder,
                   count(*) AS count
            FROM documents
            WHERE ('/' || source || '/' || lang) = '/src1'
               OR starts_with('/' || source || '/' || lang, '/src1/')
            GROUP BY 1
            ORDER BY folder ASC NULLS FIRST
        """,
        "usage_rollup": f"""
            WITH ev AS (
                SELECT user_id, ts,
                       CASE event_type WHEN 'click' THEN 'query'
                                       WHEN 'view' THEN 'ingest'
                                       WHEN 'signup' THEN 'storage_file'
                                       ELSE event_type END AS event_type,
                       CAST(floor(value * 100) AS BIGINT) AS chars,
                       CAST(floor(value * 1000000) AS BIGINT) AS bytes
                FROM events
            ),
            c AS (
                SELECT user_id,
                       CAST(SUM(CASE WHEN event_type = 'query' AND date_trunc('hour', ts) =
                                date_trunc('hour', TIMESTAMP '{_USAGE_AS_OF}') THEN 1 ELSE 0 END) AS BIGINT) AS hourly_query_count,
                       CAST(SUM(CASE WHEN event_type = 'query' AND date_trunc('month', ts) =
                                date_trunc('month', TIMESTAMP '{_USAGE_AS_OF}') THEN 1 ELSE 0 END) AS BIGINT) AS monthly_query_count,
                       CAST(COALESCE(SUM(CASE WHEN event_type = 'ingest'
                                THEN GREATEST(1, CAST(ceil(chars / 2520.0) AS BIGINT)) END), 0) AS BIGINT) AS ingest_pages,
                       CAST(SUM(CASE WHEN event_type = 'storage_file' THEN 1 ELSE 0 END) AS BIGINT) AS storage_file_count,
                       CAST(COALESCE(SUM(CASE WHEN event_type = 'storage_file' THEN bytes END), 0) AS BIGINT) AS storage_size_bytes
                FROM ev GROUP BY user_id
            ),
            w AS (
                SELECT c.*, CASE user_id % 4 WHEN 0 THEN 'free' WHEN 1 THEN 'pro'
                                             WHEN 2 THEN 'teams' ELSE 'self_hosted' END AS tier
                FROM c
            ),
            t(tier, hourly_query_limit, monthly_query_limit, ingest_limit,
              storage_file_limit, storage_size_limit_bytes) AS (
                VALUES ('free', 30, 50, 200, 30, {int(0.25 * 1024**3)}),
                       ('pro', NULL, NULL, NULL, NULL, NULL),
                       ('teams', NULL, NULL, NULL, NULL, NULL),
                       ('self_hosted', NULL, NULL, NULL, NULL, NULL)
            )
            SELECT w.user_id, w.tier, w.hourly_query_count, w.monthly_query_count,
                   w.ingest_pages, w.storage_file_count, w.storage_size_bytes,
                   (COALESCE(w.hourly_query_count > t.hourly_query_limit, FALSE)
                    OR COALESCE(w.monthly_query_count > t.monthly_query_limit, FALSE)) AS over_query,
                   COALESCE(w.ingest_pages > t.ingest_limit, FALSE) AS over_ingest,
                   COALESCE(w.storage_file_count > t.storage_file_limit, FALSE) AS over_storage_files,
                   COALESCE(w.storage_size_bytes > t.storage_size_limit_bytes, FALSE) AS over_storage_size
            FROM w LEFT JOIN t USING (tier)
        """,
        "folder_children": """
            WITH d AS (
                SELECT '/' || source AS p1,
                       '/' || source || '/' || lang AS p2,
                       '/' || source || '/' || lang || '/' ||
                           CASE WHEN n_chars < 300 THEN 'small' ELSE 'large' END AS p3
                FROM documents
            ),
            folders(id, parent_id, depth) AS (
                SELECT DISTINCT p1, NULL, 1 FROM d
                UNION ALL SELECT DISTINCT p2, p1, 2 FROM d
                UNION ALL SELECT DISTINCT p3, p2, 3 FROM d
            ),
            cc AS (
                SELECT parent_id AS id, count(*) AS child_count
                FROM folders WHERE parent_id IS NOT NULL GROUP BY parent_id
            ),
            dc AS (SELECT p2 AS id, count(*) AS doc_count FROM d GROUP BY p2)
            SELECT f.id, f.depth,
                   COALESCE(cc.child_count, 0) AS child_count,
                   COALESCE(dc.doc_count, 0) AS doc_count
            FROM folders f
            LEFT JOIN cc USING (id)
            LEFT JOIN dc USING (id)
            WHERE f.parent_id = '/src1'
        """,
        "folder_descendants": """
            WITH RECURSIVE d AS (
                SELECT '/' || source AS p1,
                       '/' || source || '/' || lang AS p2,
                       '/' || source || '/' || lang || '/' ||
                           CASE WHEN n_chars < 300 THEN 'small' ELSE 'large' END AS p3
                FROM documents
            ),
            folders(id, parent_id) AS (
                SELECT DISTINCT p1, NULL FROM d
                UNION ALL SELECT DISTINCT p2, p1 FROM d
                UNION ALL SELECT DISTINCT p3, p2 FROM d
            ),
            r(root, id, rel_depth) AS (
                SELECT '/src1', id, 1 FROM folders WHERE parent_id = '/src1'
                UNION ALL
                SELECT r.root, f.id, r.rel_depth + 1
                FROM folders f JOIN r ON f.parent_id = r.id
            )
            SELECT root, id, rel_depth FROM r
        """,
        "hll_distinct": f"""
            WITH h AS (
                SELECT l_returnflag,
                       CAST(('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15)) AS BIGINT) AS h
                FROM lineitem WHERE l_partkey IS NOT NULL
            ),
            r AS (SELECT l_returnflag, h % 512 AS reg, h // 512 AS w FROM h),
            rho AS (
                SELECT l_returnflag, reg,
                       52 - (CASE WHEN w = 0 THEN 0 ELSE length(to_base(w, 2)) END) AS rho
                FROM r
            ),
            regs AS (SELECT l_returnflag, reg, MAX(rho) AS max_rho FROM rho GROUP BY 1, 2),
            agg AS (
                SELECT l_returnflag, COUNT(*) AS registers_used,
                       SUM(CAST(1 AS BIGINT) << (52 - max_rho)) AS s_occ
                FROM regs GROUP BY 1
            ),
            fin AS (
                SELECT l_returnflag, registers_used,
                       s_occ + (512 - registers_used) * CAST(4503599627370496 AS BIGINT) AS s
                FROM agg
            )
            SELECT l_returnflag, registers_used,
                   ROUND(CASE WHEN {_HLL_EST} <= 2.5 * 512.0 AND registers_used < 512
                         THEN 512.0 * ln(512.0 / (512 - registers_used))
                         ELSE {_HLL_EST} END, 6) AS distinct_est
            FROM fin
        """,
        "cms_heavy_hitters": f"""
            WITH {_TOKENS_CTE},
            tok AS (SELECT unnest(tk) AS tok FROM tk),
            cnt AS (SELECT tok, count(*) AS exact_cnt FROM tok GROUP BY tok),
            sketch AS (
                SELECT d,
                       CAST(('0x' || substr(md5('cms' || d || '|' || tok), 1, 15)) AS BIGINT) % 16 AS bucket,
                       CAST(SUM(exact_cnt) AS BIGINT) AS bucket_count
                FROM cnt, (SELECT unnest([0, 1, 2]) AS d)
                GROUP BY 1, 2
            ),
            cands AS (SELECT tok, exact_cnt FROM cnt ORDER BY exact_cnt DESC, tok LIMIT 20),
            probes AS (
                SELECT tok, d,
                       CAST(('0x' || substr(md5('cms' || d || '|' || tok), 1, 15)) AS BIGINT) % 16 AS bucket
                FROM cands, (SELECT unnest([0, 1, 2]) AS d)
            ),
            est AS (
                SELECT tok, MIN(bucket_count) AS cms_est
                FROM probes JOIN sketch USING (d, bucket) GROUP BY tok
            )
            SELECT c.tok, c.exact_cnt, e.cms_est FROM cands c JOIN est e USING (tok)
        """,
        "pmi_bigrams": f"""
            WITH {_TOKENS_CTE},
            ucnt AS (
                SELECT w, count(*) AS c1
                FROM (SELECT unnest(tk) AS w FROM tk) GROUP BY w
            ),
            bi AS (
                SELECT unnest(list_transform(range(1, len(tk)), i -> tk[i])) AS w1,
                       unnest(list_transform(range(1, len(tk)), i -> tk[i + 1])) AS w2
                FROM tk WHERE len(tk) >= 2
            ),
            bcnt AS (
                SELECT w1, w2, count(*) AS pair_cnt FROM bi GROUP BY 1, 2
                HAVING count(*) >= 5
            ),
            tot AS (
                SELECT CAST(SUM(len(tk)) AS BIGINT) AS n_uni,
                       CAST(SUM(greatest(len(tk) - 1, 0)) AS BIGINT) AS n_bi
                FROM tk
            )
            SELECT w1, w2, pair_cnt,
                   ROUND(ln((CAST(pair_cnt AS DOUBLE) * CAST(n_uni AS DOUBLE) * CAST(n_uni AS DOUBLE)) /
                         (CAST(n_bi AS DOUBLE) * CAST(ux.c1 AS DOUBLE) * CAST(uy.c1 AS DOUBLE))), 6) AS pmi
            FROM bcnt
            JOIN ucnt ux ON bcnt.w1 = ux.w
            JOIN ucnt uy ON bcnt.w2 = uy.w
            CROSS JOIN tot
            ORDER BY pmi DESC, w1, w2 LIMIT 20
        """,
        "span_dedup": f"""
            WITH {_TOKENS_CTE},
            g AS (
                SELECT doc_id,
                       unnest(range(1, len(tk) - 2)) AS pos,
                       unnest(list_transform(range(1, len(tk) - 2),
                              i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3])) AS gram
                FROM tk WHERE len(tk) >= 4
            ),
            dup AS (SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) > 1),
            cov AS (
                SELECT DISTINCT doc_id, pos2
                FROM (SELECT doc_id, unnest(range(pos, pos + 4)) AS pos2
                      FROM g JOIN dup USING (gram))
            ),
            per AS (SELECT doc_id, count(*) AS dup_tokens FROM cov GROUP BY doc_id),
            lens AS (SELECT doc_id, len(tk) AS n_tokens FROM tk)
            SELECT l.doc_id, n_tokens, coalesce(dup_tokens, 0) AS dup_tokens,
                   ROUND(CAST(coalesce(dup_tokens, 0) AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS dup_fraction
            FROM lens l LEFT JOIN per USING (doc_id)
        """,
        "moving_aggregates": """
            SELECT user_id, event_id,
                   ROUND(CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DECIMAL(18,6)) AS DOUBLE), 6) AS mov_sum,
                   MIN(value) OVER w AS mov_min,
                   MAX(value) OVER w AS mov_max,
                   COUNT(*) OVER w AS mov_cnt
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
        """,
        "bloom_semi_join": """
            WITH auth AS (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'),
            bits AS (
                SELECT DISTINCT
                       CAST(('0x' || substr(md5('bloom' || j || '|' || CAST(o_orderkey AS VARCHAR)), 1, 15)) AS BIGINT) % 8192 AS bit
                FROM auth, (SELECT unnest([0, 1, 2]) AS j)
            ),
            keys AS (SELECT DISTINCT l_orderkey FROM lineitem),
            probes AS (
                SELECT l_orderkey,
                       CAST(('0x' || substr(md5('bloom' || j || '|' || CAST(l_orderkey AS VARCHAR)), 1, 15)) AS BIGINT) % 8192 AS bit
                FROM keys, (SELECT unnest([0, 1, 2]) AS j)
            ),
            pass AS (
                SELECT l_orderkey FROM probes JOIN bits USING (bit)
                GROUP BY l_orderkey HAVING count(*) = 3
            ),
            stats AS (
                SELECT (SELECT count(*) FROM keys) AS n_keys,
                       (SELECT count(*) FROM pass) AS n_bloom_pass,
                       (SELECT count(*) FROM keys WHERE l_orderkey IN (SELECT o_orderkey FROM auth)) AS n_exact_pass
            )
            SELECT n_keys, n_bloom_pass, n_exact_pass,
                   n_bloom_pass - n_exact_pass AS n_false_pos,
                   ROUND(CAST(n_bloom_pass - n_exact_pass AS DOUBLE) /
                         CAST(n_keys - n_exact_pass AS DOUBLE), 6) AS fp_rate
            FROM stats
        """,
        "funnel_steps": """
            WITH r0 AS (SELECT user_id, MIN(ts) AS t_prev FROM events
                        WHERE event_type = 'view' GROUP BY user_id),
            r1 AS (SELECT e.user_id, MIN(e.ts) AS t_prev FROM events e
                   JOIN r0 ON e.user_id = r0.user_id
                   WHERE e.event_type = 'click' AND e.ts > r0.t_prev
                   GROUP BY e.user_id),
            r2 AS (SELECT e.user_id, MIN(e.ts) AS t_prev FROM events e
                   JOIN r1 ON e.user_id = r1.user_id
                   WHERE e.event_type = 'purchase' AND e.ts > r1.t_prev
                   GROUP BY e.user_id)
            SELECT 0 AS step_index, 'view' AS step_name, (SELECT count(*) FROM r0) AS n_users
            UNION ALL
            SELECT 1, 'click', (SELECT count(*) FROM r1)
            UNION ALL
            SELECT 2, 'purchase', (SELECT count(*) FROM r2)
        """,
        "cohort_retention": """
            WITH w AS (SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS week FROM events),
            f AS (SELECT user_id, MIN(week) AS cohort_week FROM w GROUP BY user_id)
            SELECT cohort_week, week - cohort_week AS week_offset, count(*) AS n_users
            FROM w JOIN f USING (user_id) GROUP BY 1, 2
        """,
        "value_histogram": """
            SELECT event_type, CAST(floor(value / 25.0) AS BIGINT) AS bin,
                   CAST(CAST(floor(value / 25.0) AS BIGINT) AS DOUBLE) * 25.0 AS bin_lo,
                   count(*) AS n_events
            FROM events WHERE value IS NOT NULL GROUP BY 1, 2, 3
        """,
        "anomaly_stats": """
            WITH s AS (
                SELECT event_type, count(*) AS n,
                       SUM(CAST(value AS DECIMAL(18,6))) AS s,
                       SUM(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))) AS s2
                FROM events WHERE value IS NOT NULL GROUP BY 1
            ),
            m AS (
                SELECT event_type, n,
                       CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean_raw,
                       sqrt((CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)) -
                            ((CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) *
                             (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))) AS std_raw
                FROM s
            ),
            o AS (
                SELECT e.event_type, count(*) AS n_outliers FROM events e
                JOIN m ON e.event_type = m.event_type
                WHERE abs(e.value - m.mean_raw) > 3.0 * m.std_raw GROUP BY 1
            )
            SELECT m.event_type, n, ROUND(mean_raw, 6) AS mean, ROUND(std_raw, 6) AS std,
                   coalesce(n_outliers, 0) AS n_outliers
            FROM m LEFT JOIN o USING (event_type)
        """,
        "nation_pagerank": _pagerank_oracle(),
        "knn_sq8": _sq8_oracle(),
        "small_quantity_revenue": """
            WITH avgs AS (
                SELECT l_partkey,
                       CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) /
                       CAST(COUNT(*) AS DOUBLE) AS avg_qty
                FROM lineitem GROUP BY l_partkey
            ),
            brand AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#4')
            SELECT COUNT(*) AS n_small,
                   ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE), 6) AS small_revenue
            FROM lineitem l
            JOIN brand b ON l.l_partkey = b.p_partkey
            JOIN avgs a ON l.l_partkey = a.l_partkey
            WHERE l.l_quantity < 0.2 * a.avg_qty
        """,
        "large_order_customers": """
            WITH big AS (
                SELECT o_custkey,
                       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total,
                       COUNT(*) AS n_orders
                FROM orders GROUP BY o_custkey
                HAVING CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) > 1500000
            )
            SELECT c.c_custkey, c.c_name,
                   ROUND(CAST(b.total AS DOUBLE), 2) AS total, b.n_orders
            FROM big b JOIN customer c ON b.o_custkey = c.c_custkey
            ORDER BY b.total DESC, c.c_custkey ASC LIMIT 20
        """,
        "late_ship_priority": """
            SELECT o_orderpriority, COUNT(*) AS n
            FROM orders o
            WHERE EXISTS (
                SELECT 1 FROM lineitem l
                WHERE l.l_orderkey = o.o_orderkey
                  AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
            )
            GROUP BY o_orderpriority
        """,
        "quantile_estimate": """
            WITH h AS (
                SELECT event_type, CAST(floor(value / 5.0) AS BIGINT) AS bin, count(*) AS bin_n
                FROM events WHERE value IS NOT NULL GROUP BY 1, 2
            ),
            c AS (
                SELECT event_type, bin, CAST(bin AS DOUBLE) * 5.0 AS bin_lo, bin_n,
                       CAST(SUM(bin_n) OVER (PARTITION BY event_type ORDER BY bin) AS BIGINT) AS cum
                FROM h
            ),
            c2 AS (SELECT *, cum - bin_n AS cum_prev FROM c),
            t AS (SELECT event_type, count(*) AS n FROM events WHERE value IS NOT NULL GROUP BY 1),
            tg AS (
                SELECT event_type, q, q * CAST(n AS DOUBLE) AS target
                FROM (SELECT event_type, n,
                      unnest([CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE), CAST(0.99 AS DOUBLE)]) AS q
                      FROM t)
            )
            SELECT c2.event_type, q,
                   ROUND(bin_lo + 5.0 * ((target - CAST(cum_prev AS DOUBLE)) / CAST(bin_n AS DOUBLE)), 6) AS est
            FROM c2 JOIN tg ON c2.event_type = tg.event_type
            WHERE cum >= target AND cum_prev < target
        """,
        "sliding_window_agg": """
            WITH b AS (SELECT event_type, epoch_us(ts) // 300000000 AS sb FROM events),
            w AS (SELECT event_type, unnest([sb, sb - 1]) AS wb FROM b)
            SELECT event_type, make_timestamp(wb * 300000000) AS window_start, count(*) AS n_events
            FROM w GROUP BY 1, 2
        """,
        "scd2_intervals": """
            WITH m AS (
                SELECT user_id, ts, event_type,
                       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts,
                       row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     - row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS island
                FROM events
            ),
            g AS (
                SELECT user_id, event_type, island, MIN(ts) AS valid_from,
                       MAX(next_ts) AS mx, COUNT(*) AS n_events,
                       COUNT(*) - COUNT(next_ts) AS op
                FROM m GROUP BY 1, 2, 3
            )
            SELECT user_id, event_type, valid_from,
                   CASE WHEN op > 0 THEN NULL ELSE mx END AS valid_to,
                   n_events, op > 0 AS is_current
            FROM g
        """,
        "cube_counts": """
            SELECT o_orderstatus, o_orderpriority, count(*) AS n
            FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        """,
        "semantic_dedup": f"""
            WITH cent AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
                          FROM embeddings WHERE vec_id BETWEEN 1 AND {_IVF_LISTS}),
            assign AS (
                SELECT vec_id, cid FROM (
                    SELECT e.vec_id, c.cid,
                           row_number() OVER (
                               PARTITION BY e.vec_id
                               ORDER BY ROUND(list_dot_product(e.embedding::DOUBLE[], c.cv) /
                                   (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
                                    sqrt(list_dot_product(c.cv, c.cv))), 6) DESC, c.cid ASC) AS rn
                    FROM embeddings e, cent c
                ) WHERE rn = 1
            ),
            e2 AS (
                SELECT e.vec_id, e.embedding::DOUBLE[] AS ev,
                       sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) AS nrm,
                       a.cid
                FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id
            ),
            ok AS (SELECT cid FROM e2 GROUP BY cid HAVING count(*) <= 5000),
            d AS (
                SELECT DISTINCT y.vec_id
                FROM e2 x
                JOIN e2 y ON x.cid = y.cid AND x.vec_id < y.vec_id
                JOIN ok ON x.cid = ok.cid
                WHERE ROUND(list_dot_product(x.ev, y.ev) / (x.nrm * y.nrm), 6) >= 0.35
            )
            SELECT e2.vec_id, cid AS cluster_id, d.vec_id IS NULL AS kept
            FROM e2 LEFT JOIN d ON e2.vec_id = d.vec_id
        """,
        "langid_confusion": f"""
            WITH {_TOKENS_CTE},
            s AS (
                SELECT doc_id,
                       len(list_filter(tk, x -> list_contains({_STOPLIST['en']}, x))) AS s_en,
                       len(list_filter(tk, x -> list_contains({_STOPLIST['de']}, x))) AS s_de,
                       len(list_filter(tk, x -> list_contains({_STOPLIST['fr']}, x))) AS s_fr
                FROM tk
            ),
            pred AS (
                SELECT doc_id,
                       CASE WHEN s_en >= s_de AND s_en >= s_fr THEN 'en'
                            WHEN s_de >= s_fr THEN 'de'
                            ELSE 'fr' END AS pred_lang
                FROM s
            )
            SELECT d.lang, p.pred_lang, count(*) AS n
            FROM documents d JOIN pred p USING (doc_id)
            GROUP BY 1, 2
        """,
        "dup_rate_by_source": f"""
            {_lsh_ctes()},
            dup AS (
                SELECT DISTINCT doc_id FROM (
                    SELECT id_a AS doc_id FROM cand
                    UNION ALL SELECT id_b FROM cand
                )
            )
            SELECT d.source, count(*) AS n_docs,
                   CAST(SUM(CASE WHEN dup.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
                   ROUND(CAST(SUM(CASE WHEN dup.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
                         / CAST(count(*) AS DOUBLE), {_SCORE_DECIMALS}) AS dup_rate
            FROM documents d LEFT JOIN dup ON d.doc_id = dup.doc_id
            GROUP BY d.source
        """,
        "semantic_outliers": f"""
            WITH cent AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
                          FROM embeddings WHERE vec_id BETWEEN 1 AND {_IVF_LISTS}),
            scored AS (
                SELECT e.vec_id, c.cid,
                       ROUND(list_dot_product(e.embedding::DOUBLE[], c.cv) /
                           (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
                            sqrt(list_dot_product(c.cv, c.cv))), {_SCORE_DECIMALS}) AS cos,
                       row_number() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY ROUND(list_dot_product(e.embedding::DOUBLE[], c.cv) /
                               (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
                                sqrt(list_dot_product(c.cv, c.cv))), {_SCORE_DECIMALS}) DESC,
                               c.cid ASC
                       ) AS rn
                FROM embeddings e, cent c
            ),
            a AS (
                SELECT vec_id, cid AS cluster_id, cos,
                       CAST(round(cos * 1000000.0, 0) AS BIGINT) AS cos_micro
                FROM scored WHERE rn = 1
            )
            SELECT cluster_id, count(*) AS n,
                   CAST(SUM(CASE WHEN cos < 0.2 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
                   ROUND(CAST(CAST(SUM(cos_micro) AS BIGINT) AS DOUBLE)
                         / (CAST(count(*) AS DOUBLE) * 1000000.0), {_SCORE_DECIMALS}) AS avg_cos,
                   MIN(cos) AS min_cos
            FROM a GROUP BY cluster_id
        """,
        "nfc_normalize": """
            WITH staged AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 3 = 0
                            THEN text || ' cafe' || chr(769) || ' nai' || chr(776) || 've'
                            ELSE text END AS t
                FROM documents WHERE text IS NOT NULL
            )
            SELECT doc_id,
                   nfc_normalize(t) <> t AS changed,
                   length(t) AS len_before,
                   length(nfc_normalize(t)) AS len_after,
                   md5(nfc_normalize(t)) AS norm_md5
            FROM staged
        """,
        "range_window_agg": """
            SELECT user_id, event_id,
                   CAST(count(*) OVER w AS BIGINT) AS n_last_hour,
                   ROUND(CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DECIMAL(18,6)) AS DOUBLE), 6) AS sum_last_hour
            FROM events
            WINDOW w AS (
                PARTITION BY user_id ORDER BY epoch_us(ts)
                RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
            )
        """,
        "tfidf_topterms": f"""
            WITH toks AS (
                SELECT doc_id, unnest(string_split({_NORM_TEXT}, ' ')) AS term
                FROM documents WHERE text IS NOT NULL
            ),
            tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
            df AS (
                SELECT term, count(*) AS df
                FROM (SELECT DISTINCT doc_id, term FROM toks) GROUP BY term
            ),
            n AS (SELECT count(*) AS n FROM documents WHERE text IS NOT NULL),
            scored AS (
                SELECT tf.doc_id, tf.term, tf.tf,
                       ROUND(tf.tf * ln((n.n + 1.0) / (df.df + 1.0)), {_SCORE_DECIMALS}) AS score
                FROM tf JOIN df USING (term), n
            )
            SELECT doc_id, rank, term, tf, score FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY doc_id ORDER BY score DESC, term ASC
                ) AS rank
                FROM scored
            ) WHERE rank <= 3
        """,
        "waiting_suppliers": """
            WITH fo AS (
                SELECT o_orderkey, o_orderdate FROM orders WHERE o_orderstatus = 'F'
            ),
            late AS (
                SELECT l.l_orderkey, l.l_suppkey
                FROM lineitem l JOIN fo ON l.l_orderkey = fo.o_orderkey
                WHERE l.l_shipdate > fo.o_orderdate + INTERVAL 60 DAY
            )
            SELECT s.s_name, COUNT(*) AS numwait
            FROM late l1 JOIN supplier s ON l1.l_suppkey = s.s_suppkey
            WHERE EXISTS (
                SELECT 1 FROM lineitem l2
                WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
            )
            AND NOT EXISTS (
                SELECT 1 FROM late l3
                WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
            )
            GROUP BY s.s_name
            ORDER BY numwait DESC, s.s_name ASC
            LIMIT 20
        """,
        # DSIR: all counts integer; the per-bucket log-ratio is ONE fixed
        # double tree truncated to int64 micro-units, so the per-doc sum is
        # exact — mirrors curation.dsir_importance_weights expression-for-
        # expression (ln args are exact ints -> identical doubles).
        "dsir_weights": f"""
            WITH toks AS (
                SELECT doc_id, (source = 'src1') AS is_target,
                       string_split({_NORM_TEXT}, ' ') AS tk
                FROM documents WHERE text IS NOT NULL
            ),
            grams AS (
                SELECT doc_id, is_target, g.gram
                FROM toks, LATERAL (
                    SELECT unnest(list_concat(
                        tk,
                        list_transform(generate_series(1, len(tk) - 1),
                                       i -> tk[i] || ' ' || tk[i + 1])
                    )) AS gram
                ) g
            ),
            bucketed AS (
                SELECT doc_id, is_target,
                       CAST(('0x' || substr(md5(gram), 1, 15)) AS BIGINT) % 512 AS bucket
                FROM grams
            ),
            counts AS (
                SELECT bucket,
                       CAST(SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS ct,
                       CAST(SUM(CASE WHEN is_target THEN 0 ELSE 1 END) AS BIGINT) AS cr
                FROM bucketed GROUP BY bucket
            ),
            totals AS (
                SELECT CAST(SUM(ct) AS BIGINT) AS t_total,
                       CAST(SUM(cr) AS BIGINT) AS r_total
                FROM counts
            ),
            model AS (
                SELECT bucket,
                       CAST(floor((ln(ct + 1.0) - ln(t_total + 512.0)
                                   - ln(cr + 1.0) + ln(r_total + 512.0))
                                  * 1000000.0) AS BIGINT) AS lr_micro
                FROM counts, totals
            )
            SELECT b.doc_id, count(*) AS n_grams,
                   CAST(SUM(m.lr_micro) AS BIGINT) / 1000000.0 AS logw
            FROM bucketed b JOIN model m USING (bucket)
            GROUP BY b.doc_id
        """,
        # head/middle/tail on the ROUND(6) ppl both engines carry; cuts are
        # nearest-rank terciles (value at row ceil(n/3) / ceil(2n/3))
        "ppl_buckets": f"""
            WITH toks AS (
                SELECT doc_id, list_prepend('<s>', string_split({_NORM_TEXT}, ' ')) AS tk
                FROM documents WHERE text IS NOT NULL
            ),
            big AS (
                SELECT doc_id, tk[i] AS prev, tk[i + 1] AS cur
                FROM toks, LATERAL (SELECT unnest(generate_series(1, len(tk) - 1)) AS i) t
                WHERE len(tk) >= 2
            ),
            cb AS (SELECT prev, cur, count(*) AS c_big FROM big GROUP BY prev, cur),
            cu AS (SELECT prev, count(*) AS c_prev FROM big GROUP BY prev),
            v AS (SELECT count(DISTINCT cur) AS vocab FROM big),
            scored AS (
                SELECT b.doc_id, ln((cb.c_big + 1.0) / (cu.c_prev + v.vocab)) AS lp
                FROM big b JOIN cb USING (prev, cur) JOIN cu USING (prev), v
            ),
            ppl AS (
                SELECT doc_id, ROUND(exp(-SUM(lp) / count(*)), {_SCORE_DECIMALS}) AS ppl
                FROM scored GROUP BY doc_id
            ),
            j AS (
                SELECT d.lang, p.doc_id, p.ppl
                FROM ppl p JOIN documents d USING (doc_id)
            ),
            r AS (
                SELECT lang, doc_id, ppl,
                       row_number() OVER (PARTITION BY lang ORDER BY ppl ASC, doc_id ASC) AS rn,
                       count(*) OVER (PARTITION BY lang) AS cnt
                FROM j
            ),
            cuts AS (
                SELECT lang,
                       MAX(CASE WHEN rn = ceil(cnt / 3) THEN ppl END) AS c1,
                       MAX(CASE WHEN rn = ceil(cnt * 2 / 3) THEN ppl END) AS c2
                FROM r GROUP BY lang
            )
            SELECT j.lang,
                   CASE WHEN j.ppl <= c.c1 THEN 'head'
                        WHEN j.ppl <= c.c2 THEN 'middle'
                        ELSE 'tail' END AS bucket,
                   count(*) AS n_docs, MIN(j.ppl) AS min_ppl, MAX(j.ppl) AS max_ppl
            FROM j JOIN cuts c USING (lang)
            GROUP BY 1, 2
        """,
        # band applied to the ROUND(6) score BEFORE the per-query rank —
        # mirror of similarity.hard_negatives
        "hard_negatives": f"""
            WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv
                       FROM embeddings WHERE vec_id < {_KNN_QUERIES})
            SELECT q_id, vec_id, score FROM (
                SELECT q_id, vec_id, score,
                       row_number() OVER (
                           PARTITION BY q_id ORDER BY score DESC, vec_id ASC
                       ) AS rn
                FROM (
                    SELECT q.q_id, e.vec_id, {_COS_SCORE} AS score
                    FROM embeddings e, q
                ) WHERE score >= 0.5 AND score < 0.95
            ) WHERE rn <= 5
        """,
        # coarse cut on the ROUND(6) prefix-cosine, exact full-dim rescore
        "matryoshka_topk": f"""
            WITH q AS (
                SELECT embedding::DOUBLE[] AS qfull,
                       (embedding::DOUBLE[])[1:8] AS qpre
                FROM embeddings WHERE vec_id = {_QUERY_VEC_ID}
            ),
            coarse AS (
                SELECT e.vec_id, e.embedding::DOUBLE[] AS ev,
                       ROUND((1.0 + list_dot_product((e.embedding::DOUBLE[])[1:8], q.qpre) /
                           (sqrt(list_dot_product((e.embedding::DOUBLE[])[1:8],
                                                  (e.embedding::DOUBLE[])[1:8])) *
                            sqrt(list_dot_product(q.qpre, q.qpre)))) / 2.0,
                           {_SCORE_DECIMALS}) AS cs
                FROM embeddings e, q
                ORDER BY cs DESC, e.vec_id ASC
                LIMIT 50
            )
            SELECT c.vec_id,
                   ROUND((1.0 + list_dot_product(c.ev, q.qfull) /
                       (sqrt(list_dot_product(c.ev, c.ev)) *
                        sqrt(list_dot_product(q.qfull, q.qfull)))) / 2.0,
                       {_SCORE_DECIMALS}) AS score
            FROM coarse c, q
            ORDER BY score DESC, c.vec_id ASC
            LIMIT 10
        """,
        # relational pair-explode twin of the int64 Gram-matrix kernel:
        # q = floor(x * 2^10) exactly on both engines, everything else ints
        # until the one covariance double tree
        "embedding_covariance": """
            WITH qv AS (
                SELECT list_transform((embedding::DOUBLE[])[1:16],
                                      x -> CAST(floor(x * 1024.0) AS BIGINT)) AS q
                FROM embeddings
            ),
            n AS (SELECT count(*) AS n FROM qv),
            pairs AS (
                SELECT CAST(ij.i - 1 AS INT) AS i, CAST(ij.j - 1 AS INT) AS j,
                       CAST(SUM(q[ij.i] * q[ij.j]) AS BIGINT) AS sij
                FROM qv, LATERAL (
                    SELECT i.i, j.j
                    FROM (SELECT unnest(generate_series(1, 16)) AS i) i,
                         (SELECT unnest(generate_series(1, 16)) AS j) j
                    WHERE j.j >= i.i
                ) ij
                GROUP BY 1, 2
            ),
            firsts AS (
                SELECT CAST(d.d - 1 AS INT) AS d, CAST(SUM(q[d.d]) AS BIGINT) AS sd
                FROM qv, LATERAL (SELECT unnest(generate_series(1, 16)) AS d) d
                GROUP BY 1
            )
            SELECT p.i, p.j, p.sij,
                   ROUND((CAST(p.sij AS DOUBLE)
                          - CAST(fi.sd AS DOUBLE) * CAST(fj.sd AS DOUBLE) / CAST(n.n AS DOUBLE))
                         / (CAST(n.n AS DOUBLE) - 1.0), 6) AS cov
            FROM pairs p
            JOIN firsts fi ON fi.d = p.i
            JOIN firsts fj ON fj.d = p.j, n
        """,
        "quality_classifier": _quality_classifier_oracle(),
        "semantic_decontaminate": f"""
            WITH b AS (
                SELECT vec_id AS bench_id, embedding::DOUBLE[] AS bv
                FROM embeddings WHERE vec_id % {_SEMDECON_STRIDE} = 0
            ),
            c AS (
                SELECT vec_id, embedding::DOUBLE[] AS cv
                FROM embeddings WHERE vec_id % {_SEMDECON_STRIDE} <> 0
            ),
            pairs AS (
                SELECT c.vec_id, b.bench_id,
                       ROUND(list_dot_product(cv, bv) /
                             (sqrt(list_dot_product(cv, cv)) * sqrt(list_dot_product(bv, bv))),
                             {_SCORE_DECIMALS}) AS cos
                FROM c, b
            ),
            best AS (
                SELECT vec_id, max(struct_pack(c := cos, n := -bench_id)) AS m
                FROM pairs GROUP BY vec_id
            )
            SELECT vec_id, m.c AS max_benchmark_cos, -m.n AS nearest_bench_id,
                   CAST(m.c >= {_SEMDECON_THRESHOLD} AS INT) AS contaminated
            FROM best
        """,
        "temperature_mixture": """
            WITH counts AS (
                SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang
            ),
            tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n_total FROM counts),
            base AS (
                SELECT lang, n_docs,
                       CAST(n_docs AS DOUBLE) / CAST(n_total AS DOUBLE) AS natural_share,
                       CAST(FLOOR(sqrt(sqrt(CAST(n_docs AS DOUBLE) / CAST(n_total AS DOUBLE)))
                                  * 1000000000000.0) AS BIGINT) AS w_micro
                FROM counts, tot
            ),
            z AS (SELECT CAST(SUM(w_micro) AS BIGINT) AS z_micro FROM base)
            SELECT lang, n_docs,
                   ROUND(natural_share, 6) AS natural_share,
                   ROUND(CAST(w_micro AS DOUBLE) / CAST(z_micro AS DOUBLE), 6) AS temp_share,
                   ROUND((CAST(w_micro AS DOUBLE) / CAST(z_micro AS DOUBLE)) / natural_share, 6) AS boost
            FROM base, z
        """,
        "min_cost_supplier": """
            WITH target AS (
                SELECT p_partkey FROM part
                WHERE p_size BETWEEN 10 AND 20 AND p_type = 'STANDARD'
            ),
            u AS (
                SELECT p_partkey, l_extendedprice / l_quantity AS unit_price, l_suppkey
                FROM lineitem JOIN target ON l_partkey = p_partkey
            ),
            best AS (
                SELECT p_partkey,
                       min(struct_pack(unit_price := unit_price,
                                       l_suppkey := l_suppkey)) AS m
                FROM u GROUP BY p_partkey
            )
            SELECT s_acctbal, s_name, n_name, p_partkey,
                   ROUND(m.unit_price, 6) AS unit_price
            FROM best
            JOIN supplier ON m.l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            ORDER BY s_acctbal DESC, p_partkey ASC
            LIMIT 100
        """,
        "regional_supplier_volume": """
            SELECT n_name,
                   ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
                       (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))))
                       AS DOUBLE), 4) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            JOIN customer ON o_custkey = c_custkey AND s_nationkey = c_nationkey
            WHERE r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
            GROUP BY n_name
            ORDER BY revenue DESC, n_name ASC
        """,
        "revenue_forecast": """
            SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
                       CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE), 4) AS revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
              AND l_discount >= 0.05 AND l_discount <= 0.07
              AND l_quantity < 24
        """,
        "bilateral_shipping_volume": """
            WITH j AS (
                SELECT CAST(s_nationkey % 5 AS INT) AS supp_band,
                       CAST(c_nationkey % 5 AS INT) AS cust_band,
                       CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
                       CAST(l_extendedprice AS DECIMAL(18,4)) *
                       (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS vol
                FROM lineitem
                JOIN orders ON l_orderkey = o_orderkey
                JOIN supplier ON l_suppkey = s_suppkey
                JOIN customer ON o_custkey = c_custkey
                WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
            )
            SELECT supp_band, cust_band, l_year,
                   ROUND(CAST(SUM(vol) AS DOUBLE), 4) AS revenue
            FROM j
            WHERE (supp_band = 1 AND cust_band = 2) OR (supp_band = 2 AND cust_band = 1)
            GROUP BY supp_band, cust_band, l_year
            ORDER BY supp_band, cust_band, l_year
        """,
        "market_share": """
            WITH j AS (
                SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
                       s_nationkey,
                       CAST(l_extendedprice AS DECIMAL(18,4)) *
                       (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS vol
                FROM lineitem
                JOIN part ON l_partkey = p_partkey
                JOIN orders ON l_orderkey = o_orderkey
                JOIN customer ON o_custkey = c_custkey
                JOIN nation cn ON c_nationkey = cn.n_nationkey
                JOIN region ON cn.n_regionkey = r_regionkey
                JOIN supplier ON l_suppkey = s_suppkey
                WHERE p_type = 'PROMO' AND r_name = 'AMERICA'
                  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
                  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
            )
            SELECT o_year,
                   ROUND(CAST(SUM(CASE WHEN s_nationkey % 5 = 0 THEN vol
                                       ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                         / CAST(SUM(vol) AS DOUBLE), 6) AS mkt_share
            FROM j
            GROUP BY o_year
            ORDER BY o_year
        """,
        "product_type_profit": """
            SELECT n_name,
                   CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
                   ROUND(CAST(SUM(
                       CAST(l_extendedprice AS DECIMAL(18,4)) *
                       (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
                       - CAST(p_retailprice AS DECIMAL(18,4)) *
                         CAST(l_quantity AS DECIMAL(18,4))
                   ) AS DOUBLE), 4) AS sum_profit
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE p_name LIKE '%widget%'
            GROUP BY n_name, CAST(EXTRACT(year FROM o_orderdate) AS INT)
            ORDER BY n_name ASC, o_year DESC
        """,
        "returned_item_report": """
            SELECT c_custkey, c_name, c_acctbal, n_name,
                   ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
                       (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))))
                       AS DOUBLE), 4) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            WHERE l_returnflag = 'R'
              AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
            GROUP BY c_custkey, c_name, c_acctbal, n_name
            ORDER BY revenue DESC, c_custkey ASC
            LIMIT 20
        """,
        "important_part_values": """
            WITH vals AS (
                SELECT l_partkey,
                       SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
                           (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))))
                           AS val_dec
                FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                WHERE s_nationkey < 5
                GROUP BY l_partkey
            )
            SELECT l_partkey, ROUND(CAST(val_dec AS DOUBLE), 4) AS part_value
            FROM vals
            WHERE CAST(val_dec AS DOUBLE) >
                  (SELECT CAST(SUM(val_dec) AS DOUBLE) FROM vals) * 0.001
            ORDER BY part_value DESC, l_partkey ASC
        """,
        "priority_line_classes": """
            SELECT l_returnflag,
                   CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                                 THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                   CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                                 THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
            GROUP BY l_returnflag
            ORDER BY l_returnflag
        """,
        "customer_order_distribution": """
            WITH counts AS (
                SELECT c_custkey, COUNT(o_orderkey) AS c_count
                FROM customer LEFT JOIN orders
                  ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
                GROUP BY c_custkey
            )
            SELECT c_count, COUNT(*) AS custdist
            FROM counts
            GROUP BY c_count
            ORDER BY custdist DESC, c_count DESC
        """,
        "promo_revenue_share": """
            WITH j AS (
                SELECT p_type,
                       CAST(l_extendedprice AS DECIMAL(18,4)) *
                       (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS vol
                FROM lineitem JOIN part ON l_partkey = p_partkey
                WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
                  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
            )
            SELECT ROUND(100.0 *
                   (CAST(SUM(CASE WHEN p_type = 'PROMO' THEN vol
                                  ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                    / CAST(SUM(vol) AS DOUBLE)), 6) AS promo_share
            FROM j
        """,
        "top_revenue_supplier": """
            WITH rev AS (
                SELECT l_suppkey,
                       SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
                           (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))))
                           AS total_dec
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
                GROUP BY l_suppkey
            )
            SELECT s_suppkey, s_name,
                   ROUND(CAST(total_dec AS DOUBLE), 4) AS total_revenue
            FROM rev JOIN supplier ON l_suppkey = s_suppkey
            WHERE total_dec = (SELECT MAX(total_dec) FROM rev)
            ORDER BY s_suppkey
        """,
        "supplier_part_variety": """
            SELECT p_brand, p_type, p_size,
                   COUNT(DISTINCT l_suppkey) AS supplier_cnt
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_brand <> 'Brand#9'
              AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
              AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_suppkey % 7 = 3)
            GROUP BY p_brand, p_type, p_size
            ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC
        """,
        "disjunctive_revenue": """
            SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
                       (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))))
                       AS DOUBLE), 4) AS revenue
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
                   AND l_quantity BETWEEN 1 AND 20)
               OR (p_brand = 'Brand#2' AND p_size BETWEEN 5 AND 25
                   AND l_quantity BETWEEN 5 AND 30)
               OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 40
                   AND l_quantity BETWEEN 10 AND 40)
        """,
        "promotable_part_suppliers": """
            WITH red AS (SELECT p_partkey FROM part WHERE p_name LIKE 'red%'),
            q AS (
                SELECT l_suppkey, SUM(CAST(l_quantity AS DECIMAL(18,4))) AS qty_dec
                FROM lineitem JOIN red ON l_partkey = p_partkey
                WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
                GROUP BY l_suppkey
            ),
            a AS (SELECT SUM(qty_dec) AS tot_dec, COUNT(*) AS n FROM q)
            SELECT s_suppkey, s_name
            FROM supplier
            WHERE s_suppkey IN (
                SELECT l_suppkey FROM q, a
                WHERE CAST(qty_dec AS DOUBLE) > 1.25 * (CAST(tot_dec AS DOUBLE) / n)
            )
            ORDER BY s_suppkey
        """,
        "validation_suite": """
            WITH s AS (
                SELECT count(*) AS n,
                       count(doc_id) AS nn_doc, count(text) AS nn_text,
                       count(lang) AS nn_lang,
                       count(DISTINCT doc_id) AS d_doc,
                       CAST(min(n_chars) AS DOUBLE) AS min_nc,
                       CAST(max(n_chars) AS DOUBLE) AS max_nc,
                       SUM(CAST(n_chars AS DECIMAL(27,6))) AS sum_nc,
                       count(n_chars) AS cnt_nc,
                       CAST(min(length(text)) AS DOUBLE) AS minlen,
                       CAST(max(length(text)) AS DOUBLE) AS maxlen,
                       SUM(CAST(length(text) AS DECIMAL(27,6))) AS sumlen,
                       count(text) AS cntlen,
                       SUM(CASE WHEN lang IN ('en','de','fr') THEN 1 ELSE 0 END) AS inset_lang
                FROM documents
            ),
            r AS (
                SELECT *,
                       ROUND(CAST(nn_doc AS DOUBLE) / CAST(n AS DOUBLE), 6) AS comp_doc,
                       ROUND(CAST(nn_text AS DOUBLE) / CAST(n AS DOUBLE), 6) AS comp_text,
                       ROUND(CAST(nn_lang AS DOUBLE) / CAST(n AS DOUBLE), 6) AS comp_lang,
                       ROUND(CAST(d_doc AS DOUBLE) / CAST(nn_doc AS DOUBLE), 6) AS dist_doc,
                       ROUND(CAST(sum_nc AS DOUBLE) / CAST(cnt_nc AS DOUBLE), 6) AS mean_nc,
                       ROUND(CAST(sumlen AS DOUBLE) / CAST(cntlen AS DOUBLE), 6) AS avglen,
                       ROUND(CAST(inset_lang AS DOUBLE) / CAST(nn_lang AS DOUBLE), 6) AS inset_rate
                FROM s
            )
            SELECT '_table' AS entity, 'row_count' AS metric, CAST(n AS DOUBLE) AS value FROM r
            UNION ALL SELECT 'doc_id', 'completeness', comp_doc FROM r
            UNION ALL SELECT 'text', 'completeness', comp_text FROM r
            UNION ALL SELECT 'lang', 'completeness', comp_lang FROM r
            UNION ALL SELECT 'doc_id', 'distinctness', dist_doc FROM r
            UNION ALL SELECT 'n_chars', 'min', min_nc FROM r
            UNION ALL SELECT 'n_chars', 'max', max_nc FROM r
            UNION ALL SELECT 'n_chars', 'mean', mean_nc FROM r
            UNION ALL SELECT 'text', 'min_length', minlen FROM r
            UNION ALL SELECT 'text', 'max_length', maxlen FROM r
            UNION ALL SELECT 'text', 'avg_length', avglen FROM r
            UNION ALL SELECT 'lang', 'in_set_rate', inset_rate FROM r
            UNION ALL SELECT 'doc_id', 'check:unique',
                CAST(CASE WHEN dist_doc >= 1.0 THEN 1 ELSE 0 END AS DOUBLE) FROM r
            UNION ALL SELECT 'text', 'check:complete',
                CAST(CASE WHEN comp_text >= 0.999 THEN 1 ELSE 0 END AS DOUBLE) FROM r
            UNION ALL SELECT 'lang', 'check:in_set',
                CAST(CASE WHEN inset_rate >= 0.9 THEN 1 ELSE 0 END AS DOUBLE) FROM r
            UNION ALL SELECT 'n_chars', 'check:range',
                CAST(CASE WHEN min_nc >= 1.0 AND max_nc <= 100000.0 THEN 1 ELSE 0 END AS DOUBLE) FROM r
        """,
        "golden_record": """
            WITH recs AS (
                SELECT p_partkey AS entity_key, p_name AS name, p_brand AS brand,
                       p_type AS ptype, p_size AS psize FROM part
                UNION ALL
                SELECT p_partkey,
                       substr(p_name, 1, CAST(p_partkey % len(p_name) AS INT))
                       || substr(p_name, CAST(p_partkey % len(p_name) AS INT) + 2),
                       NULL, p_type, NULL
                FROM part WHERE p_partkey % 3 = 0
                UNION ALL
                SELECT p_partkey, p_name, lower(p_brand), NULL, p_size
                FROM part WHERE p_partkey % 5 = 0
            ),
            melt AS (
                SELECT entity_key, 'name' AS field, name AS value FROM recs WHERE name IS NOT NULL
                UNION ALL SELECT entity_key, 'brand', brand FROM recs WHERE brand IS NOT NULL
                UNION ALL SELECT entity_key, 'ptype', ptype FROM recs WHERE ptype IS NOT NULL
                UNION ALL SELECT entity_key, 'psize', CAST(psize AS VARCHAR) FROM recs WHERE psize IS NOT NULL
            ),
            cnt AS (SELECT entity_key, field, value, count(*) AS c FROM melt GROUP BY 1, 2, 3),
            rk AS (
                SELECT *, row_number() OVER (
                    PARTITION BY entity_key, field ORDER BY c DESC, value ASC
                ) AS rn FROM cnt
            ),
            surv AS (SELECT entity_key, field, value FROM rk WHERE rn = 1),
            wide AS (
                SELECT entity_key,
                       MAX(CASE WHEN field = 'name' THEN value END) AS name,
                       MAX(CASE WHEN field = 'brand' THEN value END) AS brand,
                       MAX(CASE WHEN field = 'ptype' THEN value END) AS ptype,
                       MAX(CASE WHEN field = 'psize' THEN value END) AS psize
                FROM surv GROUP BY entity_key
            ),
            n AS (SELECT entity_key, count(*) AS n_records FROM recs GROUP BY 1)
            SELECT n.entity_key, n.n_records, wide.name, wide.brand, wide.ptype,
                   CAST(wide.psize AS INT) AS psize
            FROM n LEFT JOIN wide USING (entity_key)
        """,
        "incremental_agg": """
            SELECT event_type,
                   epoch_us(ts) // 86400000000 AS day,
                   count(*) AS n_events,
                   ROUND(CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE), 4) AS sum_value,
                   CASE WHEN count(*) > 0 THEN
                       ROUND(CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) /
                             CAST(count(*) AS DOUBLE), 6)
                   END AS mean_value
            FROM events
            GROUP BY 1, 2
        """,
        "key_skew_audit": """
            WITH c AS (SELECT l_partkey, count(*) AS cnt FROM lineitem GROUP BY 1),
            h AS (
                SELECT CAST(length(bin(cnt)) - 1 AS INT) AS bucket,
                       count(*) AS n_keys,
                       CAST(SUM(cnt) AS BIGINT) AS n_rows
                FROM c GROUP BY 1
            ),
            t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM c)
            SELECT bucket, (1::BIGINT << bucket) AS bucket_lo, n_keys, n_rows,
                   ROUND(CAST(n_rows AS DOUBLE) / CAST(total AS DOUBLE), 6) AS pct_rows
            FROM h, t
        """,
        "url_canonicalize": r"""
            WITH u AS (
                SELECT doc_id,
                       (CASE n_chars % 4 WHEN 0 THEN 'HTTP' WHEN 1 THEN 'https'
                             WHEN 2 THEN 'http' ELSE 'HTTPS' END)
                       || '://'
                       || (CASE WHEN n_chars % 3 = 0 THEN 'WWW.' ELSE '' END)
                       || source || '.Example'
                       || (CASE doc_id % 3 WHEN 0 THEN '.CO.UK' WHEN 1 THEN '.com' ELSE '.org' END)
                       || (CASE doc_id % 5 WHEN 0 THEN ':80' WHEN 1 THEN ':443'
                             WHEN 2 THEN ':8080' ELSE '' END)
                       || '/Doc/' || doc_id
                       || (CASE doc_id % 7 WHEN 0 THEN '?utm_source=x&b=2&a=1'
                             WHEN 1 THEN '?b=2&a=1' WHEN 2 THEN '?utm_campaign=z'
                             WHEN 3 THEN '?z=9' ELSE '' END)
                       || (CASE WHEN doc_id % 2 = 0 THEN '#Sec' ELSE '' END) AS url
                FROM documents
            ),
            p AS (
                SELECT doc_id,
                       lower(regexp_extract(url, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) AS s,
                       lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)', 1)) AS hp,
                       regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS pth,
                       regexp_extract(url, '\?([^#]*)', 1) AS q
                FROM u
            ),
            h AS (
                SELECT doc_id, s, pth, q,
                       CASE WHEN s = 'http' AND regexp_matches(hp, ':80$')
                                THEN regexp_replace(hp, ':80$', '')
                            WHEN s = 'https' AND regexp_matches(hp, ':443$')
                                THEN regexp_replace(hp, ':443$', '')
                            ELSE hp END AS hst
                FROM p
            ),
            c AS (
                SELECT doc_id, s, hst, pth,
                       array_to_string(list_sort(list_filter(string_split(q, '&'),
                           x -> x <> '' AND NOT starts_with(x, 'utm_'))), '&') AS prm,
                       regexp_replace(hst, ':[0-9]+$', '') AS hostn
                FROM h
            ),
            r AS (
                SELECT doc_id, s, hst, pth, prm, hostn,
                       string_split(hostn, '.') AS parts
                FROM c
            )
            SELECT doc_id,
                   s || '://' || hst || pth ||
                   CASE WHEN prm <> '' THEN '?' || prm ELSE '' END AS canonical_url,
                   CASE WHEN len(parts) >= 3
                             AND parts[-2] || '.' || parts[-1] IN ('co.uk', 'com.au', 'co.jp')
                        THEN parts[-3] || '.' || parts[-2] || '.' || parts[-1]
                        WHEN len(parts) >= 2 THEN parts[-2] || '.' || parts[-1]
                        ELSE hostn END AS registrable_domain
            FROM r
        """,
        "attribution": """
            WITH t AS (
                SELECT user_id, ts, event_type, value, event_id,
                       last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
                           OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt,
                       first_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
                           OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS ft
                FROM events
            ),
            p AS (SELECT * FROM t WHERE event_type = 'purchase')
            SELECT 'last_touch' AS model, coalesce(lt, 'direct') AS channel,
                   count(*) AS n_conversions,
                   ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS revenue
            FROM p GROUP BY 2
            UNION ALL
            SELECT 'first_touch', coalesce(ft, 'direct'), count(*),
                   ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4)
            FROM p GROUP BY 2
        """,
        "json_props_stats": """
            WITH e AS (
                SELECT event_type,
                       CAST(json_extract_string(props, '$.k') AS INT) AS k
                FROM events
            )
            SELECT event_type, k // 10 AS k_bucket, count(*) AS n_events,
                   min(k) AS min_k, max(k) AS max_k
            FROM e WHERE k IS NOT NULL GROUP BY 1, 2
        """,
        "grouping_sets_counts": """
            SELECT COALESCE(l_returnflag, '*') AS returnflag,
                   COALESCE(l_linestatus, '*') AS linestatus,
                   COUNT(*) AS n_items,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
            FROM lineitem
            GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """,
        "balance_deciles": """
            WITH d AS (
                SELECT c_acctbal,
                       ntile(10) OVER (ORDER BY c_acctbal ASC, c_custkey ASC) AS decile
                FROM customer
            )
            SELECT decile, count(*) AS n_customers,
                   ROUND(min(c_acctbal), 4) AS min_bal,
                   ROUND(max(c_acctbal), 4) AS max_bal,
                   ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) /
                         CAST(count(*) AS DOUBLE), 6) AS mean_bal
            FROM d GROUP BY 1
        """,
        "drift_psi": """
            WITH e AS (
                SELECT event_type,
                       CAST(floor(value / 25.0) AS BIGINT) AS vbin,
                       CASE WHEN epoch_us(ts) < 1705276800000000 THEN 'a' ELSE 'b' END AS side
                FROM events WHERE value IS NOT NULL
            ),
            c AS (
                SELECT event_type, vbin,
                       CAST(count(*) FILTER (side = 'a') AS BIGINT) AS n_a,
                       CAST(count(*) FILTER (side = 'b') AS BIGINT) AS n_b
                FROM e GROUP BY 1, 2
            ),
            t AS (
                SELECT event_type,
                       CAST(SUM(n_a) AS BIGINT) AS tot_a,
                       CAST(SUM(n_b) AS BIGINT) AS tot_b,
                       count(*) AS n_bins
                FROM c GROUP BY 1
            ),
            terms AS (
                SELECT c.event_type, t.n_bins,
                       CAST(ROUND((
                         (CAST(n_a + 1 AS DOUBLE) / CAST(tot_a + n_bins AS DOUBLE)
                          - CAST(n_b + 1 AS DOUBLE) / CAST(tot_b + n_bins AS DOUBLE))
                         * ln((CAST(n_a + 1 AS DOUBLE) / CAST(tot_a + n_bins AS DOUBLE))
                              / (CAST(n_b + 1 AS DOUBLE) / CAST(tot_b + n_bins AS DOUBLE)))
                       ) * 1e12) AS BIGINT) AS term_scaled
                FROM c JOIN t ON c.event_type = t.event_type
            )
            SELECT event_type, n_bins,
                   ROUND(CAST(SUM(term_scaled) AS DOUBLE) / 1e12, 6) AS psi,
                   ROUND(CAST(SUM(term_scaled) AS DOUBLE) / 1e12, 6) > 0.2 AS drift
            FROM terms GROUP BY 1, 2
        """,
        "basket_lift": """
            WITH items AS (
                SELECT DISTINCT user_id AS g,
                       CAST(json_extract_string(props, '$.k') AS INT) // 10 AS it
                FROM events
                WHERE event_type = 'purchase'
                  AND json_extract_string(props, '$.k') IS NOT NULL
            ),
            ok AS (SELECT g FROM items GROUP BY g HAVING count(*) <= 9),
            capped AS (SELECT items.* FROM items JOIN ok USING (g)),
            n AS (SELECT count(DISTINCT g) AS n_groups FROM capped),
            ic AS (SELECT it, count(*) AS n_item FROM capped GROUP BY 1),
            pairs AS (
                SELECT a.it AS item_a, b.it AS item_b, count(*) AS n_ab
                FROM capped a JOIN capped b ON a.g = b.g AND a.it < b.it
                GROUP BY 1, 2 HAVING count(*) >= 5
            )
            SELECT item_a, item_b, n_ab,
                   ROUND(CAST(n_ab * n_groups AS DOUBLE) /
                         CAST(ca.n_item * cb.n_item AS DOUBLE), 6) AS lift
            FROM pairs
            JOIN ic ca ON pairs.item_a = ca.it
            JOIN ic cb ON pairs.item_b = cb.it
            CROSS JOIN n
        """,
        "trade_triangles": """
            WITH raw AS (
                SELECT DISTINCT CAST(c_nationkey AS BIGINT) AS a,
                                CAST(s_nationkey AS BIGINT) AS b
                FROM lineitem
                JOIN orders ON l_orderkey = o_orderkey
                JOIN customer ON o_custkey = c_custkey
                JOIN supplier ON l_suppkey = s_suppkey
            ),
            e AS (
                SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v
                FROM raw WHERE a <> b
            ),
            deg AS (
                SELECT n, count(*) AS d FROM (
                    SELECT u AS n FROM e UNION ALL SELECT v FROM e
                ) GROUP BY 1
            ),
            tri AS (
                SELECT count(*) AS n_triangles
                FROM e e1
                JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
                JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v
            ),
            s AS (
                SELECT CAST(count(*) AS BIGINT) AS n_nodes,
                       CAST(SUM(d * (d - 1) // 2) AS BIGINT) AS n_wedges
                FROM deg
            )
            SELECT n_nodes,
                   (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
                   CAST(n_triangles AS BIGINT) AS n_triangles,
                   n_wedges,
                   CASE WHEN n_wedges > 0 THEN
                       ROUND(CAST(3 * n_triangles AS DOUBLE) / CAST(n_wedges AS DOUBLE), 6)
                   END AS global_clustering
            FROM s, tri
        """,
        "debounce": """
            WITH g AS (
                SELECT event_type,
                       epoch_us(ts) - lag(epoch_us(ts)) OVER (
                           PARTITION BY user_id, event_type
                           ORDER BY epoch_us(ts), event_id
                       ) AS gap_us
                FROM events
            )
            SELECT event_type, count(*) AS n_events,
                   CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us >= 43200000000
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
                   ROUND(CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us >= 43200000000
                                       THEN 1 ELSE 0 END) AS DOUBLE) /
                         CAST(count(*) AS DOUBLE), 6) AS keep_rate
            FROM g GROUP BY 1
        """,
        "readability": """
            WITH base AS (
                SELECT doc_id, text,
                       regexp_replace(lower(text), '[aeiouy]+', 'V', 'g') AS marked
                FROM documents WHERE text IS NOT NULL AND length(text) > 0
            ),
            c AS (
                SELECT doc_id,
                       greatest(len(string_split_regex(text, '[.!?]+')) - 1, 1) AS n_sentences,
                       greatest(len(list_filter(string_split_regex(text, '\\s+'),
                                                x -> x <> '')), 1) AS n_words,
                       length(marked) - length(replace(marked, 'V', '')) AS vg
                FROM base
            )
            SELECT doc_id, n_sentences, n_words,
                   greatest(vg, n_words) AS n_syllables,
                   ROUND(206.835
                         - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
                         - 84.6 * (CAST(greatest(vg, n_words) AS DOUBLE) / CAST(n_words AS DOUBLE)),
                         4) AS flesch
            FROM c
        """,
        "script_mix": """
            WITH m AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 7 = 0
                            THEN text || ' ' || repeat('漢字', 33)
                            ELSE text END AS text
                FROM documents
            ),
            c AS (
                SELECT doc_id, length(text) AS n_chars,
                       length(text) - length(regexp_replace(text, '[A-Za-z\\x{00c0}-\\x{024f}]', '', 'g')) AS n_latin,
                       length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
                       length(text) - length(regexp_replace(text, '[\\x{4e00}-\\x{9fff}\\x{3040}-\\x{30ff}\\x{ac00}-\\x{d7af}]', '', 'g')) AS n_cjk,
                       length(text) - length(regexp_replace(text, '[\\s]', '', 'g')) AS n_space
                FROM m WHERE text IS NOT NULL AND length(text) > 0
            )
            SELECT doc_id, n_chars,
                   ROUND(CAST(n_latin AS DOUBLE) / CAST(n_chars AS DOUBLE), 6) AS latin_ratio,
                   ROUND(CAST(n_digit AS DOUBLE) / CAST(n_chars AS DOUBLE), 6) AS digit_ratio,
                   ROUND(CAST(n_cjk AS DOUBLE) / CAST(n_chars AS DOUBLE), 6) AS cjk_ratio,
                   ROUND(CAST(n_space AS DOUBLE) / CAST(n_chars AS DOUBLE), 6) AS space_ratio,
                   ROUND(CAST(n_chars - n_latin - n_digit - n_cjk - n_space AS DOUBLE)
                         / CAST(n_chars AS DOUBLE), 6) AS other_ratio,
                   (ROUND(CAST(n_latin AS DOUBLE) / CAST(n_chars AS DOUBLE), 6) > 0.1
                    AND ROUND(CAST(n_cjk AS DOUBLE) / CAST(n_chars AS DOUBLE), 6) > 0.1) AS mixed_script
            FROM c
        """,
        "bounce_rate": """
            WITH o AS (
                SELECT user_id, ts, event_id,
                       CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 21600000000
                                 OR lag(epoch_us(ts)) OVER w IS NULL
                            THEN 1 ELSE 0 END AS is_new
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
            ),
            sess AS (
                SELECT user_id, ts,
                       SUM(is_new) OVER (PARTITION BY user_id
                                         ORDER BY epoch_us(ts), event_id) - 1 AS session_id
                FROM o
            ),
            st AS (
                SELECT user_id, session_id, count(*) AS n_events,
                       epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us
                FROM sess GROUP BY 1, 2
            ),
            banded AS (
                SELECT CASE WHEN n_events = 1 THEN 'bounce'
                            WHEN n_events <= 3 THEN 'short'
                            ELSE 'engaged' END AS band,
                       n_events, duration_us
                FROM st
            ),
            tot AS (SELECT count(*) AS n_total FROM banded)
            SELECT band, count(*) AS n_sessions,
                   CAST(SUM(n_events) AS BIGINT) AS n_events,
                   CAST(SUM(duration_us) // 1000000 AS BIGINT) AS total_secs,
                   ROUND(CAST(count(*) AS DOUBLE) / CAST(n_total AS DOUBLE), 6) AS share
            FROM banded, tot GROUP BY 1, n_total
        """,
        "funnel_timing": """
            WITH v AS (
                SELECT user_id, MIN(epoch_us(ts)) AS t_view FROM events
                WHERE event_type = 'view' GROUP BY 1
            ),
            l AS (
                SELECT 'all' AS cohort,
                       (MIN(epoch_us(e.ts)) - v.t_view) // 1000000 AS latency_s
                FROM events e JOIN v ON e.user_id = v.user_id
                WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > v.t_view
                GROUP BY e.user_id, v.t_view
            ),
            r AS (
                SELECT cohort, latency_s,
                       row_number() OVER (PARTITION BY cohort ORDER BY latency_s ASC) AS rn,
                       count(*) OVER (PARTITION BY cohort) AS cnt
                FROM l
            )
            SELECT cohort,
                   MAX(CASE WHEN rn = CAST(ceil(0.5 * cnt) AS BIGINT) THEN latency_s END) AS p50,
                   MAX(CASE WHEN rn = CAST(ceil(0.9 * cnt) AS BIGINT) THEN latency_s END) AS p90,
                   MAX(CASE WHEN rn = CAST(ceil(0.99 * cnt) AS BIGINT) THEN latency_s END) AS p99
            FROM r GROUP BY 1
        """,
        "hybrid_rrf": """
            WITH tok AS (
                SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS tok
                FROM documents
            ),
            tok2 AS (SELECT doc_id, tok FROM tok WHERE length(tok) > 0),
            hh AS (
                SELECT doc_id,
                       CAST(('0x' || substr(md5('42:' || tok), 1, 15)) AS BIGINT) AS h
                FROM tok2
            ),
            comp AS (
                SELECT doc_id, h % 16 AS idx,
                       SUM(CASE WHEN (h // 16) % 2 = 0 THEN 1 ELSE -1 END) AS val
                FROM hh GROUP BY doc_id, h % 16
            ),
            norms AS (SELECT doc_id, sqrt(SUM(val * val)) AS norm FROM comp GROUP BY doc_id),
            q AS (SELECT idx, val AS qval FROM comp WHERE doc_id = 0),
            qn AS (SELECT sqrt(SUM(qval * qval)) AS qnorm FROM q),
            dots AS (
                SELECT c.doc_id, SUM(c.val * q.qval) AS dot
                FROM comp c JOIN q USING (idx) GROUP BY c.doc_id
            ),
            dense AS (
                SELECT doc_id, ROUND((1.0 + dot / (norm * qnorm)) / 2.0, 6) AS score
                FROM dots JOIN norms USING (doc_id), qn
                ORDER BY score DESC, doc_id ASC LIMIT 30
            ),
            d_ranked AS (
                SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS r_dense
                FROM dense
            ),
            tf AS (
                SELECT doc_id, len(tk) AS dl,
                       len(list_filter(tk, t -> t = 'join')) AS tf_0,
                       len(list_filter(tk, t -> t = 'window')) AS tf_1,
                       len(list_filter(tk, t -> t = 'hash')) AS tf_2
                FROM (
                    SELECT doc_id, string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ') AS tk
                    FROM documents WHERE text IS NOT NULL
                )
            ),
            stats AS (
                SELECT count(*) AS n_docs, avg(dl) AS avgdl,
                       SUM(CASE WHEN tf_0 > 0 THEN 1 ELSE 0 END) AS df_0,
                       SUM(CASE WHEN tf_1 > 0 THEN 1 ELSE 0 END) AS df_1,
                       SUM(CASE WHEN tf_2 > 0 THEN 1 ELSE 0 END) AS df_2
                FROM tf
            ),
            bscored AS (
                SELECT doc_id, ROUND(ln(1.0 + (n_docs - df_0 + 0.5) / (df_0 + 0.5)) * tf_0 * (1.2 + 1.0) / (tf_0 + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl)) + ln(1.0 + (n_docs - df_1 + 0.5) / (df_1 + 0.5)) * tf_1 * (1.2 + 1.0) / (tf_1 + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl)) + ln(1.0 + (n_docs - df_2 + 0.5) / (df_2 + 0.5)) * tf_2 * (1.2 + 1.0) / (tf_2 + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl)), 6) AS score
                FROM tf, stats
            ),
            sparse AS (
                SELECT doc_id, score FROM bscored WHERE score > 0
                ORDER BY score DESC, doc_id ASC LIMIT 30
            ),
            s_ranked AS (
                SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS r_sparse
                FROM sparse
            ),
            fused AS (
                SELECT COALESCE(d.doc_id, s.doc_id) AS doc_id, d.r_dense, s.r_sparse,
                       ROUND(COALESCE(1.0 / (60.0 + d.r_dense), 0.0)
                             + COALESCE(1.0 / (60.0 + s.r_sparse), 0.0), 6) AS rrf_score
                FROM d_ranked d FULL OUTER JOIN s_ranked s ON d.doc_id = s.doc_id
            )
            SELECT doc_id, r_dense, r_sparse, rrf_score
            FROM fused ORDER BY rrf_score DESC, doc_id ASC LIMIT 10
        """,
        "trending_items": """
            WITH i AS (
                SELECT event_type,
                       CAST(json_extract_string(props, '$.k') AS INT) // 20 AS item,
                       epoch_us(ts) AS us
                FROM events
                WHERE json_extract_string(props, '$.k') IS NOT NULL
            ),
            r AS (SELECT MAX(us) AS ref_us FROM i),
            w AS (
                SELECT event_type, item,
                       CASE WHEN (ref_us - us) // 604800000000 >= 20 THEN 0
                            ELSE (1::BIGINT << (20 - CAST((ref_us - us) // 604800000000 AS INT)))
                       END AS wt
                FROM i, r
            )
            SELECT event_type, item, count(*) AS n_events,
                   ROUND(CAST(SUM(wt) AS DOUBLE) / 1048576.0, 6) AS trending_score
            FROM w GROUP BY 1, 2
        """,
        "url_dedup": """
            WITH u AS (
                SELECT doc_id,
                       (CASE WHEN doc_id % 2 = 1 THEN 'HTTP://WWW.' ELSE 'http://www.' END)
                       || 'ex' || CAST(doc_id // 2 AS VARCHAR) || '.Example.com'
                       || (CASE WHEN doc_id % 2 = 1 THEN ':80' ELSE '' END)
                       || '/p'
                       || (CASE WHEN doc_id % 2 = 1 THEN '?utm_source=x#frag' ELSE '' END) AS url
                FROM documents
            ),
            p AS (
                SELECT doc_id, url,
                       lower(regexp_extract(url, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) AS s,
                       lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)', 1)) AS hp,
                       regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS pth,
                       regexp_extract(url, '\\?([^#]*)', 1) AS q
                FROM u
            ),
            c AS (
                SELECT doc_id, url,
                       s || '://' ||
                       (CASE WHEN s = 'http' AND regexp_matches(hp, ':80$')
                             THEN regexp_replace(hp, ':80$', '')
                             WHEN s = 'https' AND regexp_matches(hp, ':443$')
                             THEN regexp_replace(hp, ':443$', '')
                             ELSE hp END)
                       || pth ||
                       (CASE WHEN array_to_string(list_sort(list_filter(string_split(q, '&'),
                                 x -> x <> '' AND NOT starts_with(x, 'utm_'))), '&') <> ''
                             THEN '?' || array_to_string(list_sort(list_filter(string_split(q, '&'),
                                 x -> x <> '' AND NOT starts_with(x, 'utm_'))), '&')
                             ELSE '' END) AS canonical_url
                FROM p
            )
            SELECT canonical_url, MIN(doc_id) AS keeper_id, count(*) AS group_size,
                   count(DISTINCT url) AS n_raw_forms
            FROM c GROUP BY 1 HAVING count(*) > 1
        """,
        "skyline_parts": """
            SELECT a.p_partkey, a.p_retailprice, a.p_size
            FROM part a
            WHERE NOT EXISTS (
                SELECT 1 FROM part b
                WHERE b.p_retailprice <= a.p_retailprice AND b.p_size >= a.p_size
                  AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size)
            )
        """,
        "event_transitions": """
            WITH o AS (
                SELECT user_id, event_type,
                       lag(event_type) OVER (
                           PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                       ) AS prev
                FROM events
            ),
            c AS (
                SELECT prev AS prev_state, event_type AS next_state,
                       count(*) AS n_transitions
                FROM o WHERE prev IS NOT NULL GROUP BY 1, 2
            )
            SELECT prev_state, next_state, n_transitions,
                   ROUND(CAST(n_transitions AS DOUBLE) /
                         CAST(SUM(n_transitions) OVER (PARTITION BY prev_state) AS DOUBLE),
                         6) AS prob
            FROM c
        """,
        "dow_seasonality": """
            WITH agg AS (
                SELECT datediff('day', TIMESTAMP '1970-01-05', o_orderdate) % 7 AS dow,
                       count(*) AS n_orders,
                       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total_price
                FROM orders GROUP BY 1
            )
            SELECT dow, n_orders,
                   ROUND(CAST(total_price AS DOUBLE), 2) AS total_price,
                   ROUND((CAST(total_price AS DOUBLE) / CAST(n_orders AS DOUBLE)) /
                         (CAST(SUM(total_price) OVER () AS DOUBLE) /
                          CAST(SUM(n_orders) OVER () AS DOUBLE)), 6) AS seasonality_idx
            FROM agg
        """,
        "ngram_diversity": f"""
            WITH tks AS (SELECT source, string_split({_NORM_TEXT}, ' ') AS tk FROM documents),
            g AS (
                SELECT source, unnest(list_transform(
                    range(1, len(tk) - 1), i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS gram
                FROM tks WHERE len(tk) >= 3
            )
            SELECT source, count(*) AS n_grams, count(DISTINCT gram) AS n_distinct,
                   ROUND(CAST(count(DISTINCT gram) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS diversity
            FROM g GROUP BY 1
        """,
        "zipf_audit": f"""
            WITH tks AS (SELECT source, string_split({_NORM_TEXT}, ' ') AS tk FROM documents),
            t AS (SELECT source, unnest(tk) AS tok FROM tks),
            c AS (SELECT source, tok, count(*) AS freq FROM t GROUP BY 1, 2),
            r AS (
                SELECT *, row_number() OVER (
                    PARTITION BY source ORDER BY freq DESC, tok ASC) AS rnk
                FROM c
            ),
            s AS (
                SELECT source,
                       CAST(round(ln(CAST(rnk AS DOUBLE)) * 100000.0) AS BIGINT) AS x,
                       CAST(round(ln(CAST(freq AS DOUBLE)) * 100000.0) AS BIGINT) AS y
                FROM r WHERE rnk <= 500
            ),
            a AS (
                SELECT source, count(*) AS n_terms,
                       CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
                       CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx
                FROM s GROUP BY 1
            )
            SELECT source, n_terms,
                   ROUND(CAST(n_terms * sxy - sx * sy AS DOUBLE) /
                         CAST(n_terms * sxx - sx * sx AS DOUBLE), 6) AS zipf_slope
            FROM a
        """,
        "sq8_error_audit": _sq8_error_oracle(),
        "curation_funnel": f"""
            WITH corpus AS (
                SELECT doc_id, text, lang FROM documents
                UNION ALL
                SELECT doc_id + 1000000, text, lang FROM documents WHERE doc_id % 7 = 0
            ),
            base AS (SELECT doc_id, text, lang FROM corpus
                     WHERE text IS NOT NULL AND length(text) > 0),
            norm AS (SELECT doc_id, lang, {_NORM_TEXT} AS t FROM base),
            sigbase AS (
                SELECT doc_id, string_split(t, ' ') AS words, length(t) AS n_chars_norm,
                       length(regexp_replace(t, '[a-z0-9 ]', '', 'g')) AS symbol_chars
                FROM norm
            ),
            sig AS (
                SELECT doc_id, len(words) AS word_count,
                       ROUND(list_sum(list_transform(words, w -> length(w))) * 1.0 / len(words), 6) AS mean_word_len,
                       ROUND(symbol_chars * 1.0 / greatest(n_chars_norm, 1), 6) AS symbol_ratio,
                       ROUND(len(list_filter(words, w -> regexp_matches(w, '[a-z]'))) * 1.0 / len(words), 6) AS alpha_word_ratio,
                       len(list_filter(words, w -> list_contains({_STOP_SQL}, w))) AS stop_hits
                FROM sigbase
            ),
            flags AS (
                SELECT n.doc_id, md5(n.t) AS fp,
                       (n.lang IN ('en', 'de', 'fr')) AS f1,
                       (n.lang IN ('en', 'de', 'fr')) AND
                       (s.word_count BETWEEN {curation.MIN_WORDS} AND {curation.MAX_WORDS}
                        AND s.mean_word_len BETWEEN {curation.MIN_MEAN_WORD_LEN} AND {curation.MAX_MEAN_WORD_LEN}
                        AND s.symbol_ratio <= {curation.MAX_SYMBOL_RATIO}
                        AND s.alpha_word_ratio >= {curation.MIN_ALPHA_WORD_RATIO}
                        AND s.stop_hits >= {curation.MIN_STOPWORD_HITS}) AS f2
                FROM norm n JOIN sig s USING (doc_id)
            ),
            k AS (
                SELECT *, MIN(CASE WHEN f2 THEN doc_id END) OVER (PARTITION BY fp) AS keeper
                FROM flags
            ),
            agg AS (
                SELECT count(*) AS s0,
                       CAST(SUM(CASE WHEN f1 THEN 1 ELSE 0 END) AS BIGINT) AS s1,
                       CAST(SUM(CASE WHEN f2 THEN 1 ELSE 0 END) AS BIGINT) AS s2,
                       CAST(SUM(CASE WHEN f2 AND doc_id = keeper THEN 1 ELSE 0 END) AS BIGINT) AS s3
                FROM k
            )
            SELECT 0 AS stage_idx, 'input' AS stage, s0 AS n_docs FROM agg
            UNION ALL SELECT 1, 'language_id', s1 FROM agg
            UNION ALL SELECT 2, 'quality_filter', s2 FROM agg
            UNION ALL SELECT 3, 'exact_dedup', s3 FROM agg
        """,
        "dedup_per_window": """
            WITH b AS (
                SELECT event_id, user_id, event_type, ts,
                       epoch_us(ts) // 3600000000 AS wb
                FROM events
            ),
            r AS (
                SELECT *,
                       row_number() OVER (
                           PARTITION BY user_id, event_type, wb
                           ORDER BY epoch_us(ts), event_id) AS rn,
                       count(*) OVER (PARTITION BY user_id, event_type, wb) AS n_in_window
                FROM b
            )
            SELECT event_id, user_id, event_type,
                   make_timestamp(wb * 3600000000) AS window_start,
                   CAST(n_in_window AS BIGINT) AS n_in_window
            FROM r WHERE rn = 1
        """,
        "length_bucketing": f"""
            WITH wcs AS (SELECT doc_id, len(string_split({_NORM_TEXT}, ' ')) AS wc FROM documents),
            b AS (
                SELECT doc_id, wc,
                       CASE WHEN wc <= 16 THEN 16 WHEN wc <= 32 THEN 32
                            WHEN wc <= 64 THEN 64 ELSE 64 END AS bucket
                FROM wcs
            ),
            a AS (
                SELECT bucket, count(*) AS n_docs,
                       CAST(SUM(CASE WHEN wc > bucket THEN 1 ELSE 0 END) AS BIGINT) AS n_truncated,
                       CAST(SUM(wc) AS BIGINT) AS total_tokens,
                       CAST(SUM(least(wc, bucket)) AS BIGINT) AS effective_tokens
                FROM b GROUP BY 1
            )
            SELECT bucket, n_docs, n_truncated, total_tokens, effective_tokens,
                   n_docs * bucket AS padded_tokens,
                   ROUND(CAST(n_docs * bucket - effective_tokens AS DOUBLE) /
                         CAST(n_docs * bucket AS DOUBLE), 6) AS waste_ratio
            FROM a
        """,
        "incremental_neardup": f"""
            {_lsh_ctes()},
            oldb AS (SELECT band, key FROM buckets WHERE doc_id % 5 <> 0),
            newb AS (SELECT * FROM buckets WHERE doc_id % 5 = 0),
            hit AS (SELECT DISTINCT n.doc_id FROM newb n JOIN oldb o USING (band, key)),
            surv AS (SELECT * FROM newb WHERE doc_id NOT IN (SELECT doc_id FROM hit)),
            claims AS (SELECT band, key, MIN(doc_id) AS claimer FROM surv GROUP BY 1, 2),
            dropped AS (
                SELECT DISTINCT s.doc_id FROM surv s
                JOIN claims cl ON s.band = cl.band AND s.key = cl.key
                WHERE cl.claimer < s.doc_id
            )
            SELECT d.doc_id,
                   (d.doc_id NOT IN (SELECT doc_id FROM hit)
                    AND d.doc_id NOT IN (SELECT doc_id FROM dropped)) AS kept
            FROM documents d WHERE d.doc_id % 5 = 0
        """,
        "label_centroids": f"""
            WITH {_centroid_ctes()}
            SELECT label, CAST(n AS BIGINT) AS n_vecs,
                   CAST(u.i - 1 AS INT) AS dim, centroid[u.i] AS value
            FROM c CROSS JOIN (SELECT unnest(range(1, 65)) AS i) u
        """,
        "centroid_assignments": f"""
            WITH {_centroid_ctes()},
            sc AS (
                SELECT e.vec_id, e.label AS true_label, c.label AS cid,
                       -ROUND(list_dot_product(e.embedding::DOUBLE[], c.centroid) /
                              (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
                               sqrt(list_dot_product(c.centroid, c.centroid))), 6) AS nc
                FROM embeddings e, c
            ),
            b AS (
                SELECT vec_id, true_label, cid,
                       row_number() OVER (PARTITION BY vec_id ORDER BY nc ASC, cid ASC) AS rn
                FROM sc
            )
            SELECT true_label, cid AS assigned_label, count(*) AS n_vecs
            FROM b WHERE rn = 1 GROUP BY 1, 2
        """,
        "rfm_segments": """
            WITH pu AS (
                SELECT user_id, MAX(epoch_us(ts)) AS last_us, COUNT(*) AS frequency,
                       SUM(CAST(value AS DECIMAL(18,6))) AS monetary
                FROM events WHERE value IS NOT NULL GROUP BY 1
            ),
            g AS (SELECT MAX(epoch_us(ts)) AS gmax FROM events WHERE value IS NOT NULL),
            r AS (
                SELECT user_id, (gmax - last_us) // 86400000000 AS recency_days,
                       frequency, monetary
                FROM pu CROSS JOIN g
            ),
            sc AS (
                SELECT monetary,
                       ntile(5) OVER (ORDER BY recency_days DESC, user_id ASC) AS r_score,
                       ntile(5) OVER (ORDER BY frequency ASC, user_id ASC) AS f_score,
                       ntile(5) OVER (ORDER BY monetary ASC, user_id ASC) AS m_score
                FROM r
            )
            SELECT r_score, f_score, m_score, COUNT(*) AS n_users,
                   ROUND(CAST(SUM(monetary) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS avg_monetary
            FROM sc GROUP BY 1, 2, 3
        """,
        "target_encoding": """
            WITH pc AS (
                SELECT o_orderpriority AS category, COUNT(*) AS n,
                       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_pos
                FROM orders GROUP BY 1
            ),
            g AS (
                SELECT COUNT(*) AS gn,
                       SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS gpos
                FROM orders
            )
            SELECT category, n, n_pos,
                   ROUND((CAST(n_pos AS DOUBLE) + 10.0 * (CAST(gpos AS DOUBLE) / CAST(gn AS DOUBLE)))
                         / (CAST(n AS DOUBLE) + 10.0), 6) AS encoded,
                   ROUND(CASE WHEN n <= 1 THEN NULL
                              WHEN n_pos > 0 THEN CAST(n_pos - 1 AS DOUBLE) / CAST(n - 1 AS DOUBLE)
                              ELSE CAST(n_pos AS DOUBLE) / CAST(n - 1 AS DOUBLE) END, 6) AS loo_min,
                   ROUND(CASE WHEN n <= 1 THEN NULL
                              WHEN n_pos < n THEN CAST(n_pos AS DOUBLE) / CAST(n - 1 AS DOUBLE)
                              ELSE CAST(n_pos - 1 AS DOUBLE) / CAST(n - 1 AS DOUBLE) END, 6) AS loo_max
            FROM pc CROSS JOIN g
        """,
        "orphan_audit": """
            SELECT 'lineitem->orders' AS edge, COUNT(*) AS n_rows,
                   CAST(SUM(CASE WHEN k._k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans,
                   COUNT(DISTINCT CASE WHEN k._k IS NULL THEN f._fk END) AS n_orphan_keys
            FROM (SELECT l_orderkey AS _fk FROM lineitem) f
            LEFT JOIN (SELECT DISTINCT o_orderkey AS _k FROM orders WHERE o_orderkey % 97 <> 0) k
              ON f._fk = k._k
            UNION ALL
            SELECT 'orders->customer', COUNT(*),
                   CAST(SUM(CASE WHEN k._k IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                   COUNT(DISTINCT CASE WHEN k._k IS NULL THEN f._fk END)
            FROM (SELECT o_custkey AS _fk FROM orders) f
            LEFT JOIN (SELECT DISTINCT c_custkey AS _k FROM customer WHERE c_custkey % 89 <> 0) k
              ON f._fk = k._k
            UNION ALL
            SELECT 'lineitem->part', COUNT(*),
                   CAST(SUM(CASE WHEN k._k IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                   COUNT(DISTINCT CASE WHEN k._k IS NULL THEN f._fk END)
            FROM (SELECT l_partkey AS _fk FROM lineitem) f
            LEFT JOIN (SELECT DISTINCT p_partkey AS _k FROM part WHERE p_partkey % 83 <> 0) k
              ON f._fk = k._k
            UNION ALL
            SELECT 'lineitem->supplier', COUNT(*),
                   CAST(SUM(CASE WHEN k._k IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                   COUNT(DISTINCT CASE WHEN k._k IS NULL THEN f._fk END)
            FROM (SELECT l_suppkey AS _fk FROM lineitem) f
            LEFT JOIN (SELECT DISTINCT s_suppkey AS _k FROM supplier WHERE s_suppkey % 79 <> 0) k
              ON f._fk = k._k
        """,
        "session_paths": """
            WITH e AS (
                SELECT user_id, event_id, event_type, ts, epoch_us(ts) AS us,
                       LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
                FROM events
            ),
            s AS (
                SELECT user_id, event_id, event_type, ts,
                       SUM(CASE WHEN prev_us IS NULL OR us - prev_us > 21600000000 THEN 1 ELSE 0 END)
                           OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) - 1 AS session_id
                FROM e
            ),
            p AS (
                SELECT user_id, session_id,
                       array_to_string(list(event_type ORDER BY ts, event_id)[1:3], '>') AS path
                FROM s GROUP BY 1, 2
            )
            SELECT path, COUNT(*) AS n_sessions, COUNT(DISTINCT user_id) AS n_users
            FROM p GROUP BY 1
        """,
        "json_schema_profile": """
            WITH j AS (
                SELECT '{"k":' || json_extract_string(props, '$.k')
                       || CASE WHEN user_id % 3 = 0
                               THEN ',"u":"u' || CAST(user_id AS VARCHAR) || '"' ELSE '' END
                       || CASE WHEN event_type = 'purchase'
                               THEN ',"t":"' || event_type || '"' ELSE '' END
                       || ',"m":' || CASE WHEN event_id % 2 = 0
                                          THEN json_extract_string(props, '$.k')
                                          ELSE '"x' || json_extract_string(props, '$.k') || '"' END
                       || '}' AS js
                FROM events
            ),
            t AS (SELECT COUNT(*) AS n FROM j WHERE js IS NOT NULL),
            kv AS (SELECT js, unnest(json_keys(js)) AS key FROM j WHERE js IS NOT NULL),
            v AS (SELECT key, json_extract_string(js, '$.' || key) AS value FROM kv)
            SELECT key, COUNT(*) AS n_present,
                   ROUND(CAST(COUNT(*) AS DOUBLE) / CAST(MAX(t.n) AS DOUBLE), 6) AS present_rate,
                   COUNT(CASE WHEN TRY_CAST(value AS DOUBLE) IS NOT NULL THEN 1 END) AS n_numeric,
                   COUNT(DISTINCT value) AS n_distinct,
                   MIN(value) AS min_value, MAX(value) AS max_value
            FROM v CROSS JOIN t GROUP BY key
        """,
        "skew_salted_agg": """
            WITH agg AS (
                SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS revenue,
                       COUNT(1) AS n_lines
                FROM lineitem GROUP BY 1
                ORDER BY revenue DESC, l_partkey ASC LIMIT 20
            )
            SELECT l_partkey, ROUND(CAST(revenue AS DOUBLE), 2) AS revenue, n_lines
            FROM agg
        """,
        "negative_sampling": """
            WITH pos AS (
                SELECT user_id, event_id, item FROM (
                    SELECT user_id, event_id,
                           CAST(json_extract_string(props, '$.k') AS INT) // 10 AS item
                    FROM events WHERE event_type = 'purchase'
                ) WHERE item IS NOT NULL
            ),
            pop AS (SELECT item, COUNT(*) AS w FROM pos GROUP BY 1),
            cdf AS (
                SELECT item,
                       SUM(w) OVER (ORDER BY item ASC ROWS UNBOUNDED PRECEDING) - w AS lo,
                       SUM(w) OVER (ORDER BY item ASC ROWS UNBOUNDED PRECEDING) AS hi
                FROM pop
            ),
            tot AS (SELECT SUM(w) AS t FROM pop),
            draws AS (
                SELECT pos.item AS pos_item,
                       CAST(('0x' || substr(md5('neg:' || CAST(event_id AS VARCHAR) || ':'
                                                || CAST(js.j AS VARCHAR)), 1, 15)) AS BIGINT)
                           % t AS u
                FROM pos CROSS JOIN (VALUES (0), (1), (2)) AS js(j) CROSS JOIN tot
            )
            SELECT pos_item, cdf.item AS neg_item, COUNT(*) AS n_draws
            FROM draws JOIN cdf ON draws.u >= cdf.lo AND draws.u < cdf.hi
            WHERE cdf.item <> draws.pos_item
            GROUP BY 1, 2
        """,
        "k_anonymity": """
            WITH q AS (
                SELECT c_nationkey, c_mktsegment,
                       CAST(floor(CAST(c_acctbal AS DOUBLE) / 1000.0) AS BIGINT) AS bal_band,
                       c_custkey % 7 AS sens
                FROM customer
            ),
            cls AS (
                SELECT c_nationkey, c_mktsegment, bal_band,
                       COUNT(*) AS sz, COUNT(DISTINCT sens) AS l
                FROM q GROUP BY 1, 2, 3
            ),
            t AS (SELECT COUNT(*) AS n FROM q)
            SELECT sz AS class_size, COUNT(*) AS n_classes,
                   CAST(SUM(sz) AS BIGINT) AS n_rows,
                   sz < 5 AS at_risk,
                   MIN(l) AS min_l, MAX(l) AS max_l,
                   ROUND(CAST(CAST(SUM(sz) AS BIGINT) AS DOUBLE) / CAST(MAX(t.n) AS DOUBLE), 6) AS row_share
            FROM cls CROSS JOIN t GROUP BY sz
        """,
        "benford_audit": r"""
            WITH v AS (
                SELECT l_returnflag,
                       CAST(regexp_extract(
                           regexp_replace(CAST(abs(l_extendedprice) AS VARCHAR), '^0\.0*', ''),
                           '([1-9])', 1) AS INT) AS digit
                FROM lineitem
                WHERE l_extendedprice IS NOT NULL AND l_extendedprice > 0
            ),
            c AS (SELECT l_returnflag, digit, COUNT(*) AS n FROM v GROUP BY 1, 2),
            g AS (SELECT l_returnflag, CAST(SUM(n) AS BIGINT) AS total FROM c GROUP BY 1),
            spine AS (
                SELECT digit, CAST(expected AS DOUBLE) AS expected FROM (VALUES
                    (1, '0.3010299956639812'), (2, '0.17609125905568124'),
                    (3, '0.12493873660829992'), (4, '0.09691001300805642'),
                    (5, '0.07918124604762482'), (6, '0.06694678963061322'),
                    (7, '0.05799194697768673'), (8, '0.05115252244738129'),
                    (9, '0.04575749056067514')) AS s(digit, expected)
            )
            SELECT g.l_returnflag, spine.digit,
                   CAST(COALESCE(c.n, 0) AS BIGINT) AS n,
                   ROUND(CAST(COALESCE(c.n, 0) AS DOUBLE) / CAST(g.total AS DOUBLE), 6) AS observed,
                   ROUND(spine.expected, 6) AS expected,
                   ROUND(abs(CAST(COALESCE(c.n, 0) AS DOUBLE) / CAST(g.total AS DOUBLE)
                             - spine.expected), 6) AS abs_dev
            FROM g CROSS JOIN spine
            LEFT JOIN c ON c.l_returnflag = g.l_returnflag AND c.digit = spine.digit
        """,
        "woe_iv": """
            WITH pc AS (
                SELECT o_orderpriority AS category, COUNT(*) AS n,
                       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
                FROM orders GROUP BY 1
            ),
            g AS (
                SELECT COUNT(*) AS gn,
                       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS gpos
                FROM orders
            ),
            t AS (
                SELECT category, n, n_pos, n - n_pos AS n_neg,
                       ROUND(ln(((CAST(n_pos AS DOUBLE) + 0.5) / (CAST(gpos AS DOUBLE) + 0.5))
                                / ((CAST(n - n_pos AS DOUBLE) + 0.5) / (CAST(gn - gpos AS DOUBLE) + 0.5))), 6) AS woe,
                       ROUND((((CAST(n_pos AS DOUBLE) + 0.5) / (CAST(gpos AS DOUBLE) + 0.5))
                              - ((CAST(n - n_pos AS DOUBLE) + 0.5) / (CAST(gn - gpos AS DOUBLE) + 0.5)))
                             * (ln(((CAST(n_pos AS DOUBLE) + 0.5) / (CAST(gpos AS DOUBLE) + 0.5))
                                   / ((CAST(n - n_pos AS DOUBLE) + 0.5) / (CAST(gn - gpos AS DOUBLE) + 0.5)))), 6) AS iv_term,
                       CAST(ROUND(((((CAST(n_pos AS DOUBLE) + 0.5) / (CAST(gpos AS DOUBLE) + 0.5))
                              - ((CAST(n - n_pos AS DOUBLE) + 0.5) / (CAST(gn - gpos AS DOUBLE) + 0.5)))
                             * (ln(((CAST(n_pos AS DOUBLE) + 0.5) / (CAST(gpos AS DOUBLE) + 0.5))
                                   / ((CAST(n - n_pos AS DOUBLE) + 0.5) / (CAST(gn - gpos AS DOUBLE) + 0.5))))) * 1e12) AS BIGINT) AS s
                FROM pc CROSS JOIN g
            ),
            tot AS (
                SELECT ROUND(CAST(CAST(SUM(s) AS BIGINT) AS DOUBLE) / 1e12, 6) AS iv_total FROM t
            )
            SELECT category, n, n_pos, n_neg, woe, iv_term, iv_total
            FROM t CROSS JOIN tot
        """,
        "ab_test": """
            WITH un AS (
                SELECT CAST(user_id AS VARCHAR) || ':' ||
                       CAST(epoch_us(ts) // 86400000000 AS VARCHAR) AS unit,
                       MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS base_conv
                FROM events GROUP BY 1
            ),
            u AS (
                SELECT unit,
                       CASE (CAST(('0x' || substr(md5('ab:' || unit), 1, 15)) AS BIGINT) % 3)
                            WHEN 0 THEN 'control' WHEN 1 THEN 'variant_a'
                            ELSE 'variant_b' END AS variant,
                       CASE WHEN base_conv = 1
                              OR (CAST(('0x' || substr(md5('ab:' || unit), 1, 15)) AS BIGINT) % 3 = 1
                                  AND CAST(('0x' || substr(md5('up:' || unit), 1, 15)) AS BIGINT) % 5 = 0)
                            THEN 1 ELSE 0 END AS conv
                FROM un
            ),
            v AS (
                SELECT variant, COUNT(*) AS n_users, CAST(SUM(conv) AS BIGINT) AS n_conv
                FROM u GROUP BY 1
            ),
            c AS (SELECT n_users AS cn, n_conv AS cx FROM v WHERE variant = 'control')
            SELECT variant, n_users, n_conv,
                   ROUND((CAST(n_conv AS DOUBLE) / CAST(n_users AS DOUBLE)), 6) AS rate,
                   ROUND((CAST(cx AS DOUBLE) / CAST(cn AS DOUBLE)), 6) AS control_rate,
                   ROUND((CAST(n_conv AS DOUBLE) / CAST(n_users AS DOUBLE))
                         - (CAST(cx AS DOUBLE) / CAST(cn AS DOUBLE)), 6) AS lift,
                   ROUND(CASE WHEN (n_conv + cx) = 0 OR (n_conv + cx) = (n_users + cn) THEN NULL ELSE
                         (((CAST(n_conv AS DOUBLE) / CAST(n_users AS DOUBLE)))
                          - ((CAST(cx AS DOUBLE) / CAST(cn AS DOUBLE))))
                         / sqrt((CAST(n_conv + cx AS DOUBLE) / CAST(n_users + cn AS DOUBLE))
                                * (1.0 - (CAST(n_conv + cx AS DOUBLE) / CAST(n_users + cn AS DOUBLE)))
                                * (1.0 / CAST(n_users AS DOUBLE) + 1.0 / CAST(cn AS DOUBLE))) END, 6) AS z_score,
                   abs(ROUND(CASE WHEN (n_conv + cx) = 0 OR (n_conv + cx) = (n_users + cn) THEN NULL ELSE
                         (((CAST(n_conv AS DOUBLE) / CAST(n_users AS DOUBLE)))
                          - ((CAST(cx AS DOUBLE) / CAST(cn AS DOUBLE))))
                         / sqrt((CAST(n_conv + cx AS DOUBLE) / CAST(n_users + cn AS DOUBLE))
                                * (1.0 - (CAST(n_conv + cx AS DOUBLE) / CAST(n_users + cn AS DOUBLE)))
                                * (1.0 / CAST(n_users AS DOUBLE) + 1.0 / CAST(cn AS DOUBLE))) END, 6)) > 1.959963984540054 AS significant
            FROM v CROSS JOIN c WHERE variant <> 'control'
        """,
        "mmr_rerank": """
            WITH p AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv
                       FROM embeddings WHERE vec_id < 3),
            sc AS (
                SELECT p.q_id, e.vec_id,
                       ROUND((1.0 + list_dot_product(e.embedding::DOUBLE[], p.qv)
                              / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                                 * sqrt(list_dot_product(p.qv, p.qv)))) / 2.0, 6) AS score,
                       e.embedding::DOUBLE[] AS vec
                FROM embeddings e, p WHERE e.vec_id <> p.q_id
            ),
            c AS (SELECT q_id, vec_id, score, vec FROM (
                    SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id ASC) AS rn
                    FROM sc) WHERE rn <= 12),
            s1 AS (SELECT q_id, vec_id, score, vec FROM (
                    SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id ASC) AS rn
                    FROM c) WHERE rn = 1),
            o2 AS (
                SELECT c.q_id, c.vec_id, c.score, c.vec,
                       ROUND(0.5 * c.score - 0.5 * ROUND(list_dot_product(c.vec, s1.vec)
                             / (sqrt(list_dot_product(c.vec, c.vec)) * sqrt(list_dot_product(s1.vec, s1.vec))), 6), 6) AS mmr
                FROM c JOIN s1 ON c.q_id = s1.q_id AND c.vec_id <> s1.vec_id
            ),
            s2 AS (SELECT q_id, vec_id, score, vec, mmr FROM (
                    SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY mmr DESC, vec_id ASC) AS rn
                    FROM o2) WHERE rn = 1),
            o3 AS (
                SELECT c.q_id, c.vec_id, c.score,
                       ROUND(0.5 * c.score - 0.5 * GREATEST(
                           ROUND(list_dot_product(c.vec, s1.vec)
                                 / (sqrt(list_dot_product(c.vec, c.vec)) * sqrt(list_dot_product(s1.vec, s1.vec))), 6),
                           ROUND(list_dot_product(c.vec, s2.vec)
                                 / (sqrt(list_dot_product(c.vec, c.vec)) * sqrt(list_dot_product(s2.vec, s2.vec))), 6)), 6) AS mmr
                FROM c JOIN s1 ON c.q_id = s1.q_id JOIN s2 ON c.q_id = s2.q_id
                WHERE c.vec_id <> s1.vec_id AND c.vec_id <> s2.vec_id
            ),
            s3 AS (SELECT q_id, vec_id, score, mmr FROM (
                    SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY mmr DESC, vec_id ASC) AS rn
                    FROM o3) WHERE rn = 1)
            SELECT q_id, 1 AS mmr_rank, vec_id, score, score AS mmr_score FROM s1
            UNION ALL
            SELECT q_id, 2 AS mmr_rank, vec_id, score, mmr AS mmr_score FROM s2
            UNION ALL
            SELECT q_id, 3 AS mmr_rank, vec_id, score, mmr AS mmr_score FROM s3
        """,
        "auc_score": """
            WITH sc AS (
                SELECT CAST(ROUND(ROUND(0.5 + ((CAST(n_chars AS DOUBLE) - 298.0) / 100.0)
                                 / (2.0 * (1.0 + abs((CAST(n_chars AS DOUBLE) - 298.0) / 100.0))), 6)
                                 * 1000000) AS BIGINT) AS s,
                       CASE WHEN source IN ('src1', 'src3', 'src5') THEN 1 ELSE 0 END AS y
                FROM documents WHERE n_chars IS NOT NULL AND source IS NOT NULL
            ),
            g AS (SELECT s, COUNT(*) AS cnt, CAST(SUM(y) AS BIGINT) AS pos FROM sc GROUP BY 1),
            r AS (SELECT pos, cnt,
                         SUM(cnt) OVER (ORDER BY s ASC ROWS UNBOUNDED PRECEDING) - cnt AS c_before
                  FROM g),
            a AS (SELECT CAST(SUM(pos * (2 * c_before + cnt + 1)) AS BIGINT) AS rank2_pos,
                         CAST(SUM(pos) AS BIGINT) AS n_pos,
                         CAST(SUM(cnt - pos) AS BIGINT) AS n_neg
                  FROM r)
            SELECT n_pos, n_neg,
                   ROUND(CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL ELSE
                         CAST(rank2_pos - n_pos * (n_pos + 1) AS DOUBLE)
                         / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)) END, 6) AS auc,
                   ROUND(2.0 * (CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL ELSE
                         CAST(rank2_pos - n_pos * (n_pos + 1) AS DOUBLE)
                         / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)) END) - 1.0, 6) AS gini
            FROM a
        """,
        "calibration": """
            WITH p AS (
                SELECT ROUND(0.5 + ((CAST(n_chars AS DOUBLE) - 298.0) / 100.0)
                             / (2.0 * (1.0 + abs((CAST(n_chars AS DOUBLE) - 298.0) / 100.0))), 6) AS prob,
                       CASE WHEN source IN ('src1', 'src3', 'src5') THEN 1 ELSE 0 END AS y
                FROM documents WHERE n_chars IS NOT NULL AND source IS NOT NULL
            ),
            b AS (
                SELECT LEAST(CAST(FLOOR(prob * 10) AS INT), 9) AS bin,
                       CAST(ROUND(prob * 1000000) AS BIGINT) AS sp, y
                FROM p
            ),
            bins AS (
                SELECT bin, COUNT(*) AS n, CAST(SUM(sp) AS BIGINT) AS _sp,
                       CAST(SUM(y) AS BIGINT) AS _np
                FROM b GROUP BY 1
            ),
            t AS (SELECT CAST(SUM(n) AS BIGINT) AS tn FROM bins),
            terms AS (
                SELECT bin, n,
                       ROUND((CAST(_sp AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0)), 6) AS mean_pred,
                       ROUND((CAST(_np AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS observed,
                       ROUND(abs((CAST(_np AS DOUBLE) / CAST(n AS DOUBLE))
                                 - (CAST(_sp AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0))), 6) AS gap,
                       CAST(ROUND((CAST(n AS DOUBLE) / CAST(tn AS DOUBLE))
                                  * (abs((CAST(_np AS DOUBLE) / CAST(n AS DOUBLE))
                                         - (CAST(_sp AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0))))
                                  * 1e12) AS BIGINT) AS tt
                FROM bins CROSS JOIN t
            ),
            e AS (SELECT ROUND(CAST(CAST(SUM(tt) AS BIGINT) AS DOUBLE) / 1e12, 6) AS ece FROM terms)
            SELECT bin, n, mean_pred, observed, gap, ece FROM terms CROSS JOIN e
        """,
        "pr_auc": """
            WITH sc AS (
                SELECT ROUND(CAST(0.7 AS DOUBLE)
                         * (CAST((CAST(('0x' || substr(md5('prob:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000) AS DOUBLE) / 1000000.0)
                         + CAST(0.3 AS DOUBLE) * CAST(y AS DOUBLE), 6) AS score, y
                FROM (SELECT doc_id, CASE WHEN source IN ('src1', 'src3', 'src5') THEN 1 ELSE 0 END AS y
                      FROM documents WHERE source IS NOT NULL)
            ),
            g AS (SELECT CAST(ROUND(score * 1000000) AS BIGINT) AS s, COUNT(*) AS cnt,
                         CAST(SUM(y) AS BIGINT) AS pos FROM sc GROUP BY 1),
            pref AS (SELECT pos,
                            CAST(SUM(pos) OVER (ORDER BY s DESC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tp_cum,
                            CAST(SUM(cnt) OVER (ORDER BY s DESC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_cum
                     FROM g),
            a AS (SELECT CAST(SUM(CAST(ROUND(CAST(pos AS DOUBLE) * CAST(tp_cum AS DOUBLE) * 1e12
                                             / CAST(n_cum AS DOUBLE)) AS HUGEINT)) AS HUGEINT) AS ap_pico,
                         CAST(SUM(pos) AS BIGINT) AS n_pos,
                         CAST(MAX(n_cum) AS BIGINT) AS n_all
                  FROM pref)
            SELECT n_pos, n_all - n_pos AS n_neg,
                   CASE WHEN n_pos > 0 THEN
                        ROUND(CAST(ap_pico AS DOUBLE) / (CAST(n_pos AS DOUBLE) * 1e12), 6) END AS pr_auc,
                   ROUND(CAST(n_pos AS DOUBLE) / CAST(n_all AS DOUBLE), 6) AS baseline
            FROM a
        """,
        "brier_score": """
            WITH p AS (
                SELECT ROUND(0.5 + ((CAST(n_chars AS DOUBLE) - 298.0) / 100.0)
                             / (2.0 * (1.0 + abs((CAST(n_chars AS DOUBLE) - 298.0) / 100.0))), 6) AS score,
                       CASE WHEN source IN ('src1', 'src3', 'src5') THEN 1 ELSE 0 END AS y
                FROM documents WHERE n_chars IS NOT NULL AND source IS NOT NULL
            ),
            b AS (SELECT CAST(ROUND(score * 1000000) AS BIGINT) AS sp, y FROM p),
            a AS (SELECT COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS n_pos,
                         CAST(SUM(CAST((sp - y * 1000000) * (sp - y * 1000000) AS HUGEINT)) AS HUGEINT) AS se
                  FROM b)
            SELECT n, n_pos,
                   ROUND(CAST(se AS DOUBLE) / (CAST(n AS DOUBLE) * 1e12), 6) AS brier,
                   ROUND((CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE))
                         * (CAST(1.0 AS DOUBLE) - CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS brier_baseline
            FROM a
        """,
        "gains_deciles": """
            WITH sc AS (
                SELECT doc_id,
                       ROUND(CAST(0.7 AS DOUBLE)
                         * (CAST((CAST(('0x' || substr(md5('prob:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000) AS DOUBLE) / 1000000.0)
                         + CAST(0.3 AS DOUBLE) * CAST(y AS DOUBLE), 6) AS score, y
                FROM (SELECT doc_id, CASE WHEN source IN ('src1', 'src3', 'src5') THEN 1 ELSE 0 END AS y
                      FROM documents WHERE source IS NOT NULL)
            ),
            d AS (SELECT y, CAST(NTILE(10) OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS bucket FROM sc),
            per AS (SELECT bucket, COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS n_pos FROM d GROUP BY 1),
            c AS (SELECT bucket, n, n_pos,
                         CAST(SUM(n) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_n,
                         CAST(SUM(n_pos) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_pos
                  FROM per),
            t AS (SELECT CAST(SUM(n) AS BIGINT) AS tn, CAST(SUM(n_pos) AS BIGINT) AS tp FROM per)
            SELECT bucket, n, n_pos,
                   ROUND(CAST(cum_pos AS DOUBLE) / CAST(t.tp AS DOUBLE), 6) AS capture_rate,
                   ROUND((CAST(cum_pos AS DOUBLE) / CAST(cum_n AS DOUBLE))
                         / (CAST(t.tp AS DOUBLE) / CAST(t.tn AS DOUBLE)), 6) AS cum_lift
            FROM c CROSS JOIN t ORDER BY bucket
        """,
        "threshold_metrics": """
            WITH sc AS (
                SELECT ROUND(CAST(0.7 AS DOUBLE)
                         * (CAST((CAST(('0x' || substr(md5('prob:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000) AS DOUBLE) / 1000000.0)
                         + CAST(0.3 AS DOUBLE) * CAST(y AS DOUBLE), 6) AS score, y
                FROM (SELECT doc_id, CASE WHEN source IN ('src1', 'src3', 'src5') THEN 1 ELSE 0 END AS y
                      FROM documents WHERE source IS NOT NULL)
            ),
            g AS (SELECT CAST(ROUND(score * 1000000) AS BIGINT) AS sp, COUNT(*) AS cnt,
                         CAST(SUM(y) AS BIGINT) AS pos FROM sc GROUP BY 1),
            thr AS (SELECT CAST(t AS DOUBLE) AS threshold,
                           CAST(ROUND(t * 1000000) AS BIGINT) AS tm
                    FROM (SELECT UNNEST([0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS t)),
            a AS (SELECT threshold,
                         CAST(SUM(CASE WHEN sp >= tm THEN pos ELSE 0 END) AS BIGINT) AS tp,
                         CAST(SUM(CASE WHEN sp >= tm THEN cnt - pos ELSE 0 END) AS BIGINT) AS fp,
                         CAST(SUM(CASE WHEN sp < tm THEN pos ELSE 0 END) AS BIGINT) AS fn,
                         CAST(SUM(CASE WHEN sp < tm THEN cnt - pos ELSE 0 END) AS BIGINT) AS tn
                  FROM g CROSS JOIN thr GROUP BY 1)
            SELECT threshold, tp, fp, fn, tn,
                   ROUND(CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END, 6) AS precision,
                   ROUND(CASE WHEN tp + fn > 0 THEN CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) END, 6) AS recall,
                   ROUND(CASE WHEN 2 * tp + fp + fn > 0 THEN
                         CAST(2.0 AS DOUBLE) * CAST(tp AS DOUBLE) / CAST(2 * tp + fp + fn AS DOUBLE) END, 6) AS f1,
                   ROUND(CAST(tp + tn AS DOUBLE) / CAST(tp + fp + fn + tn AS DOUBLE), 6) AS accuracy
            FROM a ORDER BY threshold
        """,
        "vocab_coverage": r"""
            WITH tk AS (SELECT string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS tk
                        FROM documents WHERE text IS NOT NULL),
            tri AS (SELECT unnest(list_transform(range(1, len(tk) - 1),
                                                 i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS gram
                    FROM tk WHERE len(tk) >= 3),
            cnt AS (SELECT gram, COUNT(*) AS c FROM tri GROUP BY 1),
            tot AS (SELECT CAST(SUM(c) AS BIGINT) AS total_occurrences, COUNT(*) AS vocab_size FROM cnt),
            r AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, gram ASC) AS rk FROM cnt),
            grid AS (SELECT UNNEST([100, 1000, 5000]) AS top_n),
            per AS (SELECT top_n, CAST(SUM(c) AS BIGINT) AS covered
                    FROM grid JOIN r ON r.rk <= grid.top_n GROUP BY 1)
            SELECT top_n, covered, total_occurrences,
                   ROUND(CAST(covered AS DOUBLE) / CAST(total_occurrences AS DOUBLE), 6) AS coverage,
                   vocab_size
            FROM per CROSS JOIN tot ORDER BY top_n
        """,
        "demand_elasticity": """
            WITH j AS (
                SELECT p.p_brand,
                       CAST(ROUND(ln(CAST(p.p_retailprice AS DOUBLE)) * 1000000.0) AS BIGINT) AS lx,
                       CAST(ROUND(ln(CAST(l.l_quantity AS DOUBLE)) * 1000000.0) AS BIGINT) AS ly
                FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            ),
            a AS (
                SELECT p_brand, COUNT(*) AS n,
                       CAST(SUM(CAST(lx AS HUGEINT)) AS HUGEINT) AS sx,
                       CAST(SUM(CAST(ly AS HUGEINT)) AS HUGEINT) AS sy,
                       CAST(SUM(CAST(lx AS HUGEINT) * CAST(lx AS HUGEINT)) AS HUGEINT) AS sxx,
                       CAST(SUM(CAST(lx AS HUGEINT) * CAST(ly AS HUGEINT)) AS HUGEINT) AS sxy,
                       CAST(SUM(CAST(ly AS HUGEINT) * CAST(ly AS HUGEINT)) AS HUGEINT) AS syy
                FROM j GROUP BY 1
            ),
            m AS (
                SELECT p_brand, n,
                       CAST(n AS DOUBLE) AS nd,
                       CAST(sx AS DOUBLE) / 1000000.0 AS sxd,
                       CAST(sy AS DOUBLE) / 1000000.0 AS syd,
                       CAST(sxx AS DOUBLE) / 1000000000000.0 AS sxxd,
                       CAST(sxy AS DOUBLE) / 1000000000000.0 AS sxyd,
                       CAST(syy AS DOUBLE) / 1000000000000.0 AS syyd
                FROM a
            ),
            s AS (
                SELECT p_brand, n, nd, sxd, syd,
                       nd * sxyd - sxd * syd AS cov_n,
                       nd * sxxd - sxd * sxd AS varx_n,
                       nd * syyd - syd * syd AS vary_n
                FROM m
            )
            SELECT p_brand, n,
                   ROUND(CASE WHEN n >= 2 AND varx_n > 0 THEN cov_n / varx_n END, 6) AS slope,
                   ROUND((syd - (CASE WHEN n >= 2 AND varx_n > 0 THEN cov_n / varx_n END) * sxd) / nd, 6) AS intercept,
                   ROUND(CASE WHEN n >= 2 AND varx_n > 0 AND vary_n > 0
                              THEN (cov_n * cov_n) / (varx_n * vary_n) END, 6) AS r2
            FROM s ORDER BY p_brand
        """,
        "quality_ensemble": r"""
            WITH base AS (
                SELECT doc_id, string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS words
                FROM documents WHERE text IS NOT NULL
            ),
            sig AS (
                SELECT doc_id, len(words) AS word_count,
                       ROUND(CAST(len(list_distinct(words)) AS DOUBLE) / CAST(len(words) AS DOUBLE), 6) AS ttr,
                       ROUND(CAST(list_sum(list_transform(words, w -> length(w))) AS DOUBLE)
                             / CAST(len(words) AS DOUBLE), 6) AS mean_word_len
                FROM base
            ),
            r AS (
                SELECT doc_id,
                       CAST(ROW_NUMBER() OVER (ORDER BY word_count DESC, doc_id ASC) AS INT) AS r_len,
                       CAST(ROW_NUMBER() OVER (ORDER BY ttr DESC, doc_id ASC) AS INT) AS r_ttr,
                       CAST(ROW_NUMBER() OVER (ORDER BY mean_word_len DESC, doc_id ASC) AS INT) AS r_mwl
                FROM sig
            ),
            f AS (
                SELECT doc_id, r_len, r_ttr, r_mwl,
                       CAST(ROUND(1e6 / (60 + r_len)) AS BIGINT)
                       + CAST(ROUND(1e6 / (60 + r_ttr)) AS BIGINT)
                       + CAST(ROUND(1e6 / (60 + r_mwl)) AS BIGINT) AS rrf_micro
                FROM r
            )
            SELECT doc_id, r_len, r_ttr, r_mwl, rrf_micro
            FROM f ORDER BY rrf_micro DESC, doc_id ASC LIMIT 20
        """,
        "length_matching": """
            WITH rows_ AS (
                SELECT doc_id, CAST(n_chars AS BIGINT) // 100 AS bucket,
                       CAST(('0x' || substr(md5('lm:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000 AS h
                FROM documents WHERE n_chars IS NOT NULL
            ),
            hist AS (SELECT bucket, COUNT(*) AS n FROM rows_ GROUP BY 1),
            m AS (SELECT CAST(MIN(n) AS BIGINT) AS nmin, CAST(SUM(n) AS BIGINT) AS total FROM hist),
            k AS (
                SELECT r.bucket, h2.n, m.nmin, m.total,
                       CAST(SUM(CASE WHEN r.h * h2.n < m.nmin * 1000000 THEN 1 ELSE 0 END) AS BIGINT) AS kept_n
                FROM rows_ r JOIN hist h2 ON r.bucket = h2.bucket CROSS JOIN m
                GROUP BY 1, 2, 3, 4
            ),
            tk AS (SELECT CAST(SUM(kept_n) AS BIGINT) AS tkp FROM k)
            SELECT bucket, n,
                   ROUND(CAST(n AS DOUBLE) / CAST(total AS DOUBLE), 6) AS corpus_share,
                   ROUND(CAST(nmin AS DOUBLE) / CAST(n AS DOUBLE), 6) AS keep_rate,
                   kept_n,
                   ROUND(CAST(kept_n AS DOUBLE) / CAST(tkp AS DOUBLE), 6) AS kept_share
            FROM k CROSS JOIN tk ORDER BY bucket
        """,
        "sprt_decision": """
            WITH u AS (
                SELECT user_id || ':' || CAST(epoch_us(ts) // 86400000000 AS VARCHAR) AS unit,
                       MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv0
                FROM events GROUP BY 1
            ),
            staged AS (
                SELECT unit,
                       CASE WHEN CAST(('0x' || substr(md5('grp:' || unit), 1, 15)) AS BIGINT) % 2 = 0
                            THEN 'control' ELSE 'variant' END AS grp,
                       CAST(('0x' || substr(md5('sprt:' || unit), 1, 15)) AS BIGINT) AS ord,
                       GREATEST(conv0,
                           CASE WHEN CAST(('0x' || substr(md5('grp:' || unit), 1, 15)) AS BIGINT) % 2 <> 0
                                 AND CAST(('0x' || substr(md5('up:' || unit), 1, 15)) AS BIGINT) % 5 = 0
                                THEN 1 ELSE 0 END) AS conv
                FROM u
            ),
            walked AS (
                SELECT grp, ROW_NUMBER() OVER (PARTITION BY grp ORDER BY ord) AS rn,
                       CAST(SUM(CASE WHEN conv = 1 THEN 218254 ELSE -185717 END)
                            OVER (PARTITION BY grp ORDER BY ord
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
                FROM staged
            ),
            totals AS (
                SELECT grp, COUNT(*) AS n_units,
                       CAST(arg_max(cum, rn) AS BIGINT) AS final
                FROM walked GROUP BY 1
            ),
            crossings AS (
                SELECT grp, CAST(MIN(rn) AS BIGINT) AS n_at_decision
                FROM walked WHERE cum >= 2944439 OR cum <= -2944439 GROUP BY 1
            ),
            at AS (
                SELECT w.grp, c.n_at_decision, w.cum AS dec_cum
                FROM walked w JOIN crossings c ON w.grp = c.grp AND w.rn = c.n_at_decision
            )
            SELECT t.grp, t.n_units,
                   CASE WHEN a.dec_cum >= 2944439 THEN 'accept_h1'
                        WHEN a.dec_cum <= -2944439 THEN 'accept_h0'
                        ELSE 'continue' END AS decision,
                   a.n_at_decision,
                   ROUND(CAST(a.dec_cum AS DOUBLE) / 1e6, 6) AS llr_at_decision,
                   ROUND(CAST(t.final AS DOUBLE) / 1e6, 6) AS final_llr
            FROM totals t LEFT JOIN at a ON t.grp = a.grp ORDER BY t.grp
        """,
        "mann_kendall": """
            WITH d0 AS (
                SELECT epoch_us(ts) // 86400000000 AS i, COUNT(*) AS x0
                FROM events GROUP BY 1
            ),
            lo AS (SELECT MIN(i) AS dmin FROM d0),
            d AS (
                SELECT 'raw' AS series, i, x0 AS y FROM d0
                UNION ALL
                SELECT 'uplifted', i,
                       x0 + CASE WHEN i >= dmin + 20 THEN x0 // 2 ELSE 0 END
                FROM d0 CROSS JOIN lo
            ),
            s AS (
                SELECT a.series,
                       CAST(SUM(CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT) AS s
                FROM d a JOIN d b ON a.series = b.series AND a.i < b.i
                GROUP BY 1
            ),
            n AS (SELECT series, COUNT(*) AS n FROM d GROUP BY 1),
            ties AS (
                SELECT series, CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT) AS tie_term
                FROM (SELECT series, COUNT(*) AS t FROM d GROUP BY series, y HAVING COUNT(*) > 1)
                GROUP BY 1
            ),
            j AS (
                SELECT s.series, s.s, n.n, COALESCE(ties.tie_term, 0) AS tie_term,
                       CAST(n.n * (n.n - 1) * (2 * n.n + 5) - COALESCE(ties.tie_term, 0) AS DOUBLE) / 18.0 AS var_s
                FROM s JOIN n USING (series) LEFT JOIN ties USING (series)
            ),
            zc AS (
                SELECT *, CASE WHEN s > 0 THEN CAST(s - 1 AS DOUBLE) / SQRT(var_s)
                               WHEN s < 0 THEN CAST(s + 1 AS DOUBLE) / SQRT(var_s)
                               ELSE CAST(0.0 AS DOUBLE) END AS z
                FROM j
            )
            SELECT series, n AS n_points, s AS s_stat, ROUND(var_s, 6) AS var_s, ROUND(z, 6) AS z,
                   CASE WHEN ROUND(z, 6) >= 1.96 THEN 'increasing'
                        WHEN ROUND(z, 6) <= -1.96 THEN 'decreasing'
                        ELSE 'none' END AS trend
            FROM zc
        """,
        "ratio_metric_ci": """
            WITH u AS (
                SELECT user_id,
                       CASE WHEN CAST(('0x' || substr(md5('rm:' || CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) % 2 = 0
                            THEN 'control' ELSE 'variant' END AS grp,
                       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS x,
                       COUNT(*) AS y
                FROM events GROUP BY 1, 2
            ),
            a AS (
                SELECT grp, COUNT(*) AS n_units,
                       CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
                       CAST(SUM(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
                       CAST(SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS HUGEINT) AS sxx,
                       CAST(SUM(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS HUGEINT) AS sxy,
                       CAST(SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS HUGEINT) AS syy
                FROM u GROUP BY 1
            ),
            m AS (
                SELECT grp, n_units,
                       CAST(sx AS BIGINT) AS sum_num, CAST(sy AS BIGINT) AS sum_den,
                       CAST(n_units AS DOUBLE) AS nd,
                       CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
                       CAST(sxx AS DOUBLE) AS sxxd, CAST(sxy AS DOUBLE) AS sxyd,
                       CAST(syy AS DOUBLE) AS syyd
                FROM a
            ),
            t AS (
                SELECT grp, n_units, sum_num, sum_den,
                       sxd / syd AS r,
                       SQRT(((sxxd / nd - (sxd / nd) * (sxd / nd))
                             - CAST(2.0 AS DOUBLE) * (sxd / syd) * (sxyd / nd - (sxd / nd) * (syd / nd))
                             + (sxd / syd) * (sxd / syd) * (syyd / nd - (syd / nd) * (syd / nd))) / nd)
                       / (syd / nd) AS se
                FROM m
            )
            SELECT grp, n_units, sum_num, sum_den,
                   ROUND(r, 6) AS ratio, ROUND(se, 6) AS se,
                   ROUND(r - CAST(1.96 AS DOUBLE) * se, 6) AS lo,
                   ROUND(r + CAST(1.96 AS DOUBLE) * se, 6) AS hi
            FROM t ORDER BY grp
        """,
        "theil_sen_trend": """
            WITH d AS (
                SELECT epoch_us(ts) // 86400000000 AS i, COUNT(*) AS y
                FROM events GROUP BY 1
            ),
            pairs AS (
                SELECT CAST(ROUND(CAST(b.y - a.y AS DOUBLE) * 1e6
                                  / CAST(b.i - a.i AS DOUBLE)) AS BIGINT) AS s
                FROM d a JOIN d b ON a.i < b.i
            ),
            pc AS (SELECT COUNT(*) AS np FROM pairs),
            ms AS (
                SELECT CASE WHEN MAX(np) % 2 = 1 THEN CAST(SUM(s) * 2 AS BIGINT)
                            ELSE CAST(SUM(s) AS BIGINT) END AS m2,
                       CAST(MAX(np) AS BIGINT) AS n_pairs
                FROM (SELECT s, ROW_NUMBER() OVER (ORDER BY s) AS r FROM pairs) CROSS JOIN pc
                WHERE (np % 2 = 1 AND r * 2 = np + 1)
                   OR (np % 2 = 0 AND (r * 2 = np OR r * 2 = np + 2))
            ),
            res AS (
                SELECT d.y * 2000000 - ms.m2 * d.i AS r2, ms.m2, ms.n_pairs
                FROM d CROSS JOIN ms
            ),
            rc AS (SELECT COUNT(*) AS nr FROM res),
            im AS (
                SELECT CASE WHEN MAX(nr) % 2 = 1 THEN CAST(SUM(r2) * 2 AS BIGINT)
                            ELSE CAST(SUM(r2) AS BIGINT) END AS i4,
                       CAST(MAX(m2) AS BIGINT) AS m2, CAST(MAX(n_pairs) AS BIGINT) AS n_pairs
                FROM (SELECT r2, m2, n_pairs, ROW_NUMBER() OVER (ORDER BY r2) AS r FROM res) CROSS JOIN rc
                WHERE (nr % 2 = 1 AND r * 2 = nr + 1)
                   OR (nr % 2 = 0 AND (r * 2 = nr OR r * 2 = nr + 2))
            ),
            np2 AS (SELECT COUNT(*) AS n_points FROM d)
            SELECT n_points, n_pairs,
                   ROUND(CAST(m2 AS DOUBLE) / 2e6, 6) AS slope,
                   ROUND(CAST(i4 AS DOUBLE) / 4e6, 6) AS intercept
            FROM np2 CROSS JOIN im
        """,
        "isotonic_calibration": """
            WITH sc AS (
                SELECT ROUND(CAST(0.7 AS DOUBLE)
                         * (CAST((CAST(('0x' || substr(md5('prob:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000) AS DOUBLE) / 1000000.0)
                         + CAST(0.3 AS DOUBLE) * CAST(y AS DOUBLE), 6) AS score, y
                FROM (SELECT doc_id, CASE WHEN source IN ('src1', 'src3', 'src5') THEN 1 ELSE 0 END AS y
                      FROM documents WHERE source IS NOT NULL)
            ),
            g AS (SELECT CAST(ROUND(score * 1000) AS BIGINT) AS s, COUNT(*) AS cnt,
                         CAST(SUM(y) AS BIGINT) AS pos FROM sc GROUP BY 1),
            idx AS (
                SELECT s, cnt, pos,
                       ROW_NUMBER() OVER (ORDER BY s) AS i,
                       CAST(SUM(cnt) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING) AS BIGINT) AS nN,
                       CAST(SUM(pos) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING) AS BIGINT) AS nP
                FROM g
            ),
            grid AS (
                SELECT l.i AS j, r.i AS k,
                       CAST(r.nP - (l.nP - l.pos) AS DOUBLE)
                       / CAST(r.nN - (l.nN - l.cnt) AS DOUBLE) AS a
                FROM idx l JOIN idx r ON l.i <= r.i
            ),
            m AS (
                SELECT j, k,
                       MIN(a) OVER (PARTITION BY j ORDER BY k DESC
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mm
                FROM grid
            ),
            iso AS (SELECT k AS i, MAX(mm) AS iso FROM m GROUP BY 1)
            SELECT ROUND(CAST(idx.s AS DOUBLE) / 1000.0, 3) AS score,
                   idx.cnt AS n, idx.pos,
                   ROUND(CAST(idx.pos AS DOUBLE) / CAST(idx.cnt AS DOUBLE), 6) AS raw_rate,
                   ROUND(iso.iso, 6) AS iso_prob
            FROM idx JOIN iso ON idx.i = iso.i ORDER BY score
        """,
        "conformal_interval": """
            WITH RECURSIVE d AS (
                SELECT epoch_us(ts) // 86400000000 AS di, COUNT(*) AS y
                FROM events GROUP BY 1
            ),
            o AS (SELECT di, y, ROW_NUMBER() OVER (ORDER BY di) AS rn FROM d),
            n AS (SELECT COUNT(*) AS nn FROM o),
            hw(rn, l, b, f) AS (
                SELECT 1,
                       (SELECT y FROM o WHERE rn = 1) * 1000000,
                       ((SELECT y FROM o WHERE rn = 2) - (SELECT y FROM o WHERE rn = 1)) * 1000000,
                       CAST(NULL AS BIGINT)
                UNION ALL
                SELECT hw.rn + 1,
                       CAST(ROUND(CAST(0.3 AS DOUBLE) * (o.y * 1000000)
                                  + CAST(0.7 AS DOUBLE) * (hw.l + hw.b)) AS BIGINT),
                       CAST(ROUND(CAST(0.1 AS DOUBLE)
                                  * (CAST(ROUND(CAST(0.3 AS DOUBLE) * (o.y * 1000000)
                                                + CAST(0.7 AS DOUBLE) * (hw.l + hw.b)) AS BIGINT)
                                     - hw.l)
                                  + CAST(0.9 AS DOUBLE) * hw.b) AS BIGINT),
                       hw.l + hw.b
                FROM hw JOIN o ON o.rn = hw.rn + 1 CROSS JOIN n
                WHERE hw.rn < n.nn
            ),
            fc AS (
                SELECT o.di, o.y, hw.f, o.y * 1000000 - hw.f AS e
                FROM hw JOIN o ON o.rn = hw.rn WHERE hw.f IS NOT NULL
            ),
            rk AS (SELECT *, ROW_NUMBER() OVER (ORDER BY di) AS r, COUNT(*) OVER () AS nf FROM fc),
            parts AS (SELECT *, (nf * 1) // 3 AS ncal FROM rk),
            calib AS (SELECT abs(e) AS ae, ncal FROM parts WHERE r <= ncal),
            q AS (
                SELECT ae AS qv FROM (
                    SELECT ae, ncal, ROW_NUMBER() OVER (ORDER BY ae ASC) AS ar FROM calib
                ) WHERE ar = LEAST(ncal, CAST(ceil((ncal + 1) * (1.0 - 1 / CAST(3 AS DOUBLE))) AS BIGINT))
            ),
            ev AS (
                SELECT p.di, p.y, p.f, p.f - q.qv AS lo, p.f + q.qv AS hi,
                       (p.y * 1000000 >= p.f - q.qv AND p.y * 1000000 <= p.f + q.qv) AS covered
                FROM parts p CROSS JOIN q WHERE p.r > p.ncal
            ),
            cov AS (
                SELECT ROUND(CAST(SUM(CASE WHEN covered THEN 1 ELSE 0 END) AS DOUBLE)
                             / COUNT(*), 6) AS coverage FROM ev
            )
            SELECT ev.di, ev.y,
                   ROUND(CAST(f AS DOUBLE) / 1e6, 6) AS forecast,
                   ROUND(CAST(lo AS DOUBLE) / 1e6, 6) AS lo,
                   ROUND(CAST(hi AS DOUBLE) / 1e6, 6) AS hi,
                   covered, cov.coverage
            FROM ev CROSS JOIN cov
        """,
        "neyman_allocation": """
            WITH lc AS (SELECT l_orderkey, COUNT(*) AS n_lines FROM lineitem GROUP BY 1),
            s AS (
                SELECT CAST(n_lines AS VARCHAR) AS stratum,
                       CAST(ROUND(CAST(o_totalprice AS DOUBLE) * 100) AS BIGINT) AS x
                FROM orders JOIN lc ON o_orderkey = l_orderkey
                WHERE o_totalprice IS NOT NULL
            ),
            st AS (
                SELECT stratum, COUNT(*) AS n,
                       CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
                       CAST(SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS HUGEINT) AS sxx
                FROM s GROUP BY 1
            ),
            w AS (
                SELECT stratum, n,
                       CAST(FLOOR(SQRT(CAST(n * sxx - sx * sx AS DOUBLE))) AS BIGINT) AS wgt,
                       ROUND(SQRT(CAST(n * sxx - sx * sx AS DOUBLE))
                             / (CAST(n AS DOUBLE) * 100.0), 6) AS sigma
                FROM st
            ),
            ws AS (SELECT CAST(SUM(wgt) AS BIGINT) AS tw, CAST(SUM(n) AS BIGINT) AS tn FROM w),
            a AS (
                SELECT w.*, (1000 * wgt) // tw AS a0, (1000 * wgt) % tw AS rm,
                       (1000 * n) // tn AS p0, (1000 * n) % tn AS pm
                FROM w CROSS JOIN ws
            ),
            r AS (SELECT 1000 - CAST(SUM(a0) AS BIGINT) AS ra, 1000 - CAST(SUM(p0) AS BIGINT) AS rp FROM a),
            k AS (
                SELECT a.*,
                       ROW_NUMBER() OVER (ORDER BY rm DESC, stratum ASC) AS rka,
                       ROW_NUMBER() OVER (ORDER BY pm DESC, stratum ASC) AS rkp
                FROM a
            )
            SELECT stratum, n, sigma,
                   CAST(a0 + CASE WHEN rka <= r.ra THEN 1 ELSE 0 END AS BIGINT) AS neyman_alloc,
                   CAST(p0 + CASE WHEN rkp <= r.rp THEN 1 ELSE 0 END AS BIGINT) AS prop_alloc
            FROM k CROSS JOIN r ORDER BY stratum
        """,
        "weighted_price_quantiles": """
            WITH grid AS (
                SELECT l_returnflag, l_extendedprice AS v,
                       CAST(ROUND(SUM(CAST(l_quantity AS DOUBLE))) AS BIGINT) AS w
                FROM lineitem WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
                GROUP BY 1, 2
            ),
            c AS (
                SELECT l_returnflag, v,
                       CAST(SUM(w) OVER (PARTITION BY l_returnflag ORDER BY v
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
                FROM grid
            ),
            t AS (SELECT l_returnflag, CAST(SUM(w) AS BIGINT) AS total_weight FROM grid GROUP BY 1),
            qg AS (SELECT CAST(q AS DOUBLE) AS q, CAST(ROUND(q * 1000000) AS BIGINT) AS p
                   FROM (SELECT UNNEST([0.25, 0.5, 0.75]) AS q))
            SELECT c.l_returnflag, qg.q, MIN(c.v) AS value, MAX(t.total_weight) AS total_weight
            FROM c JOIN t USING (l_returnflag) CROSS JOIN qg
            WHERE CAST(c.cum AS DECIMAL(38,0)) * 1000000
                  >= CAST(qg.p AS DECIMAL(38,0)) * CAST(t.total_weight AS DECIMAL(38,0))
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "holt_forecast": """
            WITH RECURSIVE d AS (
                SELECT epoch_us(ts) // 86400000000 AS di, COUNT(*) AS y
                FROM events GROUP BY 1
            ),
            o AS (SELECT di, y, ROW_NUMBER() OVER (ORDER BY di) AS rn FROM d),
            n AS (SELECT COUNT(*) AS nn FROM o),
            hw(rn, l, b, f) AS (
                SELECT 1,
                       (SELECT y FROM o WHERE rn = 1) * 1000000,
                       ((SELECT y FROM o WHERE rn = 2) - (SELECT y FROM o WHERE rn = 1)) * 1000000,
                       CAST(NULL AS BIGINT)
                UNION ALL
                SELECT hw.rn + 1,
                       CAST(ROUND(CAST(0.3 AS DOUBLE) * (o.y * 1000000)
                                  + CAST(0.7 AS DOUBLE) * (hw.l + hw.b)) AS BIGINT),
                       CAST(ROUND(CAST(0.1 AS DOUBLE)
                                  * (CAST(ROUND(CAST(0.3 AS DOUBLE) * (o.y * 1000000)
                                                + CAST(0.7 AS DOUBLE) * (hw.l + hw.b)) AS BIGINT)
                                     - hw.l)
                                  + CAST(0.9 AS DOUBLE) * hw.b) AS BIGINT),
                       hw.l + hw.b
                FROM hw JOIN o ON o.rn = hw.rn + 1 CROSS JOIN n
                WHERE hw.rn < n.nn
            )
            SELECT o.di, o.y,
                   ROUND(CAST(hw.l AS DOUBLE) / 1e6, 6) AS level,
                   ROUND(CAST(hw.b AS DOUBLE) / 1e6, 6) AS trend,
                   ROUND(CAST(hw.f AS DOUBLE) / 1e6, 6) AS forecast,
                   ROUND(CAST(o.y * 1000000 - hw.f AS DOUBLE) / 1e6, 6) AS error
            FROM hw JOIN o ON o.rn = hw.rn
        """,
        "seasonal_decompose": """
            WITH d AS (
                SELECT epoch_us(ts) // 86400000000 AS di, COUNT(*) AS y
                FROM events GROUP BY 1
            ),
            t AS (
                SELECT di, y,
                       CAST(di % 7 AS INT) AS phase,
                       CASE WHEN COUNT(*) OVER w = 7 THEN
                            CAST(ROUND(CAST(SUM(y) OVER w AS DOUBLE) * 1e6 / 7.0) AS BIGINT)
                       END AS t_micro
                FROM d
                WINDOW w AS (ORDER BY di ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
            ),
            dev AS (SELECT *, y * 1000000 - t_micro AS dv FROM t),
            seas AS (
                SELECT phase, CAST(ROUND(CAST(SUM(dv) AS DOUBLE) / COUNT(*)) AS BIGINT) AS s_micro
                FROM dev WHERE dv IS NOT NULL GROUP BY 1
            )
            SELECT dev.di, dev.y, dev.phase,
                   ROUND(CAST(t_micro AS DOUBLE) / 1e6, 6) AS trend,
                   CASE WHEN t_micro IS NOT NULL THEN ROUND(CAST(s_micro AS DOUBLE) / 1e6, 6) END AS seasonal,
                   CASE WHEN t_micro IS NOT NULL THEN ROUND(CAST(dv - s_micro AS DOUBLE) / 1e6, 6) END AS residual
            FROM dev LEFT JOIN seas ON dev.phase = seas.phase
        """,
        "gap_fill": """
            WITH c AS (
                SELECT event_type, epoch_us(ts) // 3600000000 AS hour_idx, COUNT(*) AS n
                FROM events GROUP BY 1, 2
            ),
            r AS (SELECT event_type, MIN(hour_idx) AS mn, MAX(hour_idx) AS mx FROM c GROUP BY 1),
            g AS (SELECT event_type, unnest(range(mn, mx + 1)) AS hour_idx FROM r),
            j AS (
                SELECT g.event_type, g.hour_idx, c.n
                FROM g LEFT JOIN c ON g.event_type = c.event_type AND g.hour_idx = c.hour_idx
            )
            SELECT event_type, hour_idx, n,
                   LAST_VALUE(n IGNORE NULLS) OVER (
                       PARTITION BY event_type ORDER BY hour_idx
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value,
                   n IS NULL AS is_gap
            FROM j
        """,
        "rater_agreement": """
            WITH rated AS (
                SELECT lang AS a,
                       CASE WHEN CAST(('0x' || substr(md5('rater:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10 < 7
                            THEN lang
                            ELSE CASE lang WHEN 'de' THEN 'en' WHEN 'en' THEN 'es'
                                           WHEN 'es' THEN 'fr' WHEN 'fr' THEN 'zh'
                                           ELSE 'de' END END AS b
                FROM documents WHERE lang IS NOT NULL
            ),
            pairs AS (
                SELECT a, b, COUNT(*) AS c FROM rated GROUP BY 1, 2
            ),
            rm AS (SELECT a, CAST(SUM(c) AS BIGINT) AS ra FROM pairs GROUP BY 1),
            cm AS (SELECT b, CAST(SUM(c) AS BIGINT) AS cb FROM pairs GROUP BY 1),
            ch AS (SELECT CAST(SUM(ra * cb) AS BIGINT) AS rc FROM rm JOIN cm ON rm.a = cm.b),
            dg AS (SELECT CAST(SUM(CASE WHEN a = b THEN c ELSE 0 END) AS BIGINT) AS agree,
                          CAST(SUM(c) AS BIGINT) AS n, COUNT(*) AS n_cells
                   FROM pairs)
            SELECT n,
                   ROUND((CAST(agree AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS observed_agreement,
                   ROUND((CAST(COALESCE(rc, 0) AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))), 6) AS expected_agreement,
                   ROUND(CASE WHEN n_cells = 1 AND agree = n THEN NULL ELSE
                         ((CAST(agree AS DOUBLE) / CAST(n AS DOUBLE))
                          - (CAST(COALESCE(rc, 0) AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
                         / (1.0 - (CAST(COALESCE(rc, 0) AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))) END, 6) AS kappa
            FROM dg CROSS JOIN ch
        """,
        "acf_daily": """
            WITH d AS (SELECT epoch_us(ts) // 86400000000 AS di, COUNT(*) AS x
                       FROM events GROUP BY 1),
            g AS (SELECT CAST(SUM(x) AS BIGINT) AS s, COUNT(*) AS n FROM d),
            dev AS (SELECT di, n * x - s AS dd FROM d CROSS JOIN g),
            den AS (SELECT SUM(CAST(dd AS HUGEINT) * dd) AS den FROM dev),
            lags AS (SELECT * FROM (VALUES (1), (2), (3), (4), (5), (6), (7)) AS l(lag)),
            pairs AS (
                SELECT l.lag, a.dd AS da, b.dd AS db
                FROM dev a JOIN lags l ON TRUE
                JOIN dev b ON b.di = a.di + l.lag
            ),
            num AS (SELECT lag, COUNT(*) AS n_pairs,
                           SUM(CAST(da AS HUGEINT) * db) AS num
                    FROM pairs GROUP BY 1)
            SELECT lag, n_pairs,
                   ROUND(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) AS acf
            FROM num CROSS JOIN den
        """,
        "cusum_drift": """
            WITH d0 AS (SELECT epoch_us(ts) // 86400000000 AS di, COUNT(*) AS x0
                        FROM events GROUP BY 1),
            lo AS (SELECT MIN(di) AS dmin FROM d0),
            d AS (SELECT di, x0 + CASE WHEN di >= dmin + 20 THEN x0 // 3 ELSE 0 END AS x
                  FROM d0 CROSS JOIN lo),
            g AS (SELECT CAST(SUM(x) AS BIGINT) // COUNT(*) AS t FROM d),
            c AS (SELECT di, x, SUM(x - t) OVER (ORDER BY di ASC ROWS UNBOUNDED PRECEDING) AS p
                  FROM d CROSS JOIN g),
            m AS (SELECT di, x, p,
                         LEAST(0, MIN(p) OVER (ORDER BY di ASC ROWS UNBOUNDED PRECEDING)) AS mn
                  FROM c)
            SELECT di AS idx, x AS value, CAST(p AS BIGINT) AS excess,
                   CAST(p - mn AS BIGINT) AS cusum,
                   (p - mn) > t AS alarm
            FROM m CROSS JOIN g
        """,
        "ann_recall": """
            WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv
                       FROM embeddings WHERE vec_id < 3),
            ex AS (
                SELECT q_id, vec_id FROM (
                    SELECT q.q_id, e.vec_id,
                           row_number() OVER (
                               PARTITION BY q.q_id
                               ORDER BY ROUND((1.0 + list_dot_product(e.embedding::DOUBLE[], q.qv) / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) * sqrt(list_dot_product(q.qv, q.qv)))) / 2.0, 6) DESC, e.vec_id ASC
                           ) AS rn
                    FROM embeddings e, q
                ) WHERE rn <= 10
            ),
            cent AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
                     FROM embeddings WHERE vec_id BETWEEN 1 AND 8),
            assign AS (
                SELECT vec_id, cid FROM (
                    SELECT e.vec_id, c.cid,
                           row_number() OVER (
                               PARTITION BY e.vec_id
                               ORDER BY ROUND(list_dot_product(e.embedding::DOUBLE[], c.cv) /
                                   (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
                                    sqrt(list_dot_product(c.cv, c.cv))), 6) DESC, c.cid ASC) AS rn
                    FROM embeddings e, cent c
                ) WHERE rn = 1
            ),
            probes AS (
                SELECT q_id, cid FROM (
                    SELECT q.q_id, c.cid, row_number() OVER (
                        PARTITION BY q.q_id
                        ORDER BY ROUND(list_dot_product(q.qv, c.cv) /
                            (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.cv, c.cv))), 6)
                            DESC, c.cid ASC) AS rn
                    FROM cent c, q
                ) WHERE rn <= 2
            ),
            ap AS (
                SELECT q_id, vec_id FROM (
                    SELECT q.q_id, e.vec_id,
                           row_number() OVER (
                               PARTITION BY q.q_id
                               ORDER BY ROUND((1.0 + list_dot_product(e.embedding::DOUBLE[], q.qv) / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) * sqrt(list_dot_product(q.qv, q.qv)))) / 2.0, 6) DESC, e.vec_id ASC
                           ) AS rn
                    FROM embeddings e
                    JOIN assign a ON e.vec_id = a.vec_id
                    JOIN probes p ON a.cid = p.cid
                    JOIN q ON q.q_id = p.q_id
                ) WHERE rn <= 10
            ),
            base AS (SELECT q_id, COUNT(*) AS n_exact FROM ex GROUP BY 1),
            hits AS (SELECT ex.q_id, COUNT(*) AS n_hits
                     FROM ex JOIN ap ON ex.q_id = ap.q_id AND ex.vec_id = ap.vec_id
                     GROUP BY 1)
            SELECT base.q_id, n_exact, COALESCE(n_hits, 0) AS n_hits,
                   ROUND(CAST(COALESCE(n_hits, 0) AS DOUBLE) / CAST(n_exact AS DOUBLE), 6) AS recall
            FROM base LEFT JOIN hits ON base.q_id = hits.q_id
        """,
        "ks_price_drift": """
            WITH u AS (
                SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
                       CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS sa,
                       CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END AS sb
                FROM orders WHERE o_orderstatus IN ('F', 'O')
            ),
            pv AS (SELECT v, CAST(SUM(sa) AS BIGINT) AS ca, CAST(SUM(sb) AS BIGINT) AS cb
                   FROM u WHERE v IS NOT NULL GROUP BY 1),
            cum AS (SELECT v,
                           SUM(ca) OVER (ORDER BY v ASC ROWS UNBOUNDED PRECEDING) AS cum_a,
                           SUM(cb) OVER (ORDER BY v ASC ROWS UNBOUNDED PRECEDING) AS cum_b
                    FROM pv),
            tot AS (SELECT CAST(SUM(ca) AS BIGINT) AS n_a, CAST(SUM(cb) AS BIGINT) AS n_b FROM pv),
            gaps AS (SELECT v, n_a, n_b,
                            abs(CAST(cum_a AS HUGEINT) * n_b - CAST(cum_b AS HUGEINT) * n_a) AS gap
                     FROM cum CROSS JOIN tot),
            mx AS (SELECT MAX(gap) AS m FROM gaps)
            SELECT n_a, n_b,
                   ROUND(CAST(m AS DOUBLE) / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)), 6) AS ks_stat,
                   MIN(v) AS at_value
            FROM gaps CROSS JOIN mx WHERE gap = m GROUP BY 1, 2, 3
        """,
        "revenue_gini": """
            WITH pc AS (SELECT o_custkey,
                               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS v
                        FROM orders GROUP BY 1),
            pv AS (SELECT v, COUNT(*) AS c FROM pc WHERE v IS NOT NULL GROUP BY 1),
            cum AS (SELECT v, c,
                           SUM(c) OVER (ORDER BY v ASC ROWS UNBOUNDED PRECEDING) - c AS r0
                    FROM pv),
            tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
                           SUM(CAST(v AS HUGEINT) * c) AS total FROM pv),
            terms AS (SELECT n, total, CAST(v AS HUGEINT) * c * (2 * r0 + c - n) AS t
                      FROM cum CROSS JOIN tot)
            SELECT n, CAST(total AS BIGINT) AS total,
                   ROUND(CASE WHEN total = 0 THEN NULL ELSE
                         CAST(SUM(t) AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(total AS DOUBLE)) END, 6) AS gini
            FROM terms GROUP BY n, terms.total
        """,
        "forecast_backtest": """
            WITH d AS (SELECT epoch_us(ts) // 86400000000 AS di, COUNT(*) AS x
                       FROM events GROUP BY 1),
            j AS (SELECT a.x AS x, b.x AS f FROM d a JOIN d b ON a.di = b.di + 7 WHERE a.x > 0),
            agg AS (SELECT COUNT(*) AS n,
                           CAST(SUM(CAST(ROUND((abs(CAST(x - f AS DOUBLE)) / CAST(x AS DOUBLE)) * 1e12) AS BIGINT)) AS BIGINT) AS sa,
                           CAST(SUM(CAST(ROUND((2.0 * abs(CAST(x - f AS DOUBLE)) / CAST(x + f AS DOUBLE)) * 1e12) AS BIGINT)) AS BIGINT) AS ss,
                           SUM(CAST(x - f AS HUGEINT) * (x - f)) AS se
                    FROM j)
            SELECT n AS n_forecasts,
                   ROUND(CAST(sa AS DOUBLE) / 1e12 / CAST(n AS DOUBLE), 6) AS mape,
                   ROUND(CAST(ss AS DOUBLE) / 1e12 / CAST(n AS DOUBLE), 6) AS smape,
                   ROUND(sqrt(CAST(se AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS rmse
            FROM agg
        """,
        "cuped_ab": """
            WITH un AS (
                SELECT CAST(user_id AS VARCHAR) || ':' ||
                       CAST(epoch_us(ts) // 86400000000 AS VARCHAR) AS unit,
                       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS y,
                       COUNT(*) AS x
                FROM events GROUP BY 1
            ),
            a AS (
                SELECT CASE (CAST(('0x' || substr(md5('ab:' || unit), 1, 15)) AS BIGINT) % 3)
                            WHEN 0 THEN 'control' WHEN 1 THEN 'variant_a'
                            ELSE 'variant_b' END AS variant, y, x
                FROM un
            ),
            v AS (SELECT variant, COUNT(*) AS n_units,
                         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy
                  FROM a GROUP BY 1),
            p AS (SELECT COUNT(*) AS _n, CAST(SUM(x) AS BIGINT) AS _sx,
                         CAST(SUM(y) AS BIGINT) AS _sy,
                         SUM(CAST(x AS HUGEINT) * x) AS _sxx,
                         SUM(CAST(x AS HUGEINT) * y) AS _sxy,
                         SUM(CAST(y AS HUGEINT) * y) AS _syy
                  FROM a)
            SELECT variant, n_units,
                   ROUND((CAST(sy AS DOUBLE) / CAST(n_units AS DOUBLE)), 6) AS mean_y,
                   ROUND((CAST(sx AS DOUBLE) / CAST(n_units AS DOUBLE)), 6) AS mean_x,
                   ROUND(CASE WHEN (_n * _sxx - CAST(_sx AS HUGEINT) * _sx) = 0
                              THEN (CAST(sy AS DOUBLE) / CAST(n_units AS DOUBLE)) ELSE
                         (CAST(sy AS DOUBLE) / CAST(n_units AS DOUBLE))
                         - (CASE WHEN (_n * _sxx - CAST(_sx AS HUGEINT) * _sx) = 0 THEN NULL
                                 ELSE CAST((_n * _sxy - CAST(_sx AS HUGEINT) * _sy) AS DOUBLE)
                                      / CAST((_n * _sxx - CAST(_sx AS HUGEINT) * _sx) AS DOUBLE) END)
                           * ((CAST(sx AS DOUBLE) / CAST(n_units AS DOUBLE))
                              - (CAST(_sx AS DOUBLE) / CAST(_n AS DOUBLE))) END, 6) AS adj_mean,
                   ROUND(CASE WHEN (_n * _sxx - CAST(_sx AS HUGEINT) * _sx) = 0 THEN NULL
                              ELSE CAST((_n * _sxy - CAST(_sx AS HUGEINT) * _sy) AS DOUBLE)
                                   / CAST((_n * _sxx - CAST(_sx AS HUGEINT) * _sx) AS DOUBLE) END, 6) AS theta,
                   ROUND(CASE WHEN (_n * _sxx - CAST(_sx AS HUGEINT) * _sx) = 0
                                OR (_n * _syy - CAST(_sy AS HUGEINT) * _sy) = 0 THEN NULL
                              ELSE ((CASE WHEN (_n * _sxx - CAST(_sx AS HUGEINT) * _sx) = 0 THEN NULL
                                          ELSE CAST((_n * _sxy - CAST(_sx AS HUGEINT) * _sy) AS DOUBLE)
                                               / CAST((_n * _sxx - CAST(_sx AS HUGEINT) * _sx) AS DOUBLE) END)
                                    * (CASE WHEN (_n * _sxx - CAST(_sx AS HUGEINT) * _sx) = 0 THEN NULL
                                            ELSE CAST((_n * _sxy - CAST(_sx AS HUGEINT) * _sy) AS DOUBLE)
                                                 / CAST((_n * _sxx - CAST(_sx AS HUGEINT) * _sx) AS DOUBLE) END))
                                   * (CAST((_n * _sxx - CAST(_sx AS HUGEINT) * _sx) AS DOUBLE)
                                      / CAST((_n * _syy - CAST(_sy AS HUGEINT) * _sy) AS DOUBLE)) END, 6) AS var_reduction
            FROM v CROSS JOIN p
        """,
        "session_survival": """
            WITH e AS (
                SELECT user_id, event_id, ts, epoch_us(ts) AS us,
                       LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pus
                FROM events
            ),
            s AS (
                SELECT user_id,
                       SUM(CASE WHEN pus IS NULL OR us - pus > 21600000000 THEN 1 ELSE 0 END)
                           OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sid,
                       ts
                FROM e
            ),
            ses AS (SELECT user_id, sid, COUNT(*) AS n_ev, MAX(epoch_us(ts)) AS last_us
                    FROM s GROUP BY 1, 2),
            mx AS (SELECT MAX(epoch_us(ts)) AS m FROM events),
            subj AS (SELECT n_ev AS t,
                            CASE WHEN m - last_us < 86400000000 THEN 0 ELSE 1 END AS ev
                     FROM ses CROSS JOIN mx),
            pt AS (SELECT t, CAST(SUM(ev) AS BIGINT) AS n_events,
                          CAST(SUM(1 - ev) AS BIGINT) AS n_censored
                   FROM subj GROUP BY 1),
            tot AS (SELECT CAST(SUM(n_events + n_censored) AS BIGINT) AS _n FROM pt),
            rk AS (SELECT t, n_events, n_censored,
                          CAST(_n - (SUM(n_events + n_censored)
                                     OVER (ORDER BY t ASC ROWS UNBOUNDED PRECEDING)
                                     - (n_events + n_censored)) AS BIGINT) AS n_at_risk
                   FROM pt CROSS JOIN tot),
            tm AS (SELECT t, n_at_risk, n_events, n_censored,
                          CASE WHEN n_events = 0 OR n_events = n_at_risk THEN 0
                               ELSE CAST(ROUND(ln(CAST(n_at_risk - n_events AS DOUBLE)
                                                  / CAST(n_at_risk AS DOUBLE)) * 1e12) AS BIGINT) END AS term,
                          CASE WHEN n_events = n_at_risk AND n_events > 0 THEN 1 ELSE 0 END AS dd
                   FROM rk),
            cm AS (SELECT t, n_at_risk, n_events, n_censored,
                          SUM(term) OVER (ORDER BY t ASC ROWS UNBOUNDED PRECEDING) AS l,
                          MAX(dd) OVER (ORDER BY t ASC ROWS UNBOUNDED PRECEDING) AS dead
                   FROM tm)
            SELECT t, n_at_risk, n_events, n_censored,
                   CASE WHEN dead = 1 THEN CAST(0.0 AS DOUBLE)
                        ELSE ROUND(exp(CAST(l AS DOUBLE) / 1e12), 6) END AS survival
            FROM cm
        """,
        "did_effect": """
            WITH un AS (
                SELECT CAST(user_id AS VARCHAR) || ':' ||
                       CAST(epoch_us(ts) // 86400000000 AS VARCHAR) AS unit,
                       epoch_us(ts) // 86400000000 AS day,
                       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS y
                FROM events GROUP BY 1, 2
            ),
            lo AS (SELECT MIN(day) AS dmin FROM un),
            lab AS (
                SELECT CASE WHEN CAST(('0x' || substr(md5('ab:' || unit), 1, 15)) AS BIGINT) % 3 = 1
                            THEN 'treatment' ELSE 'control' END AS grp,
                       CASE WHEN day >= dmin + 15 THEN 'post' ELSE 'pre' END AS period,
                       y + CASE WHEN CAST(('0x' || substr(md5('ab:' || unit), 1, 15)) AS BIGINT) % 3 = 1
                                 AND day >= dmin + 15
                                 AND CAST(('0x' || substr(md5('up:' || unit), 1, 15)) AS BIGINT) % 3 = 0
                                THEN 1 ELSE 0 END AS y2
                FROM un CROSS JOIN lo
            ),
            cells AS (
                SELECT grp, period, COUNT(*) AS n_units, CAST(SUM(y2) AS BIGINT) AS s
                FROM lab GROUP BY 1, 2
            ),
            base AS (
                SELECT grp AS "group", period, n_units,
                       ROUND((CAST(s AS DOUBLE) / CAST(n_units AS DOUBLE)), 6) AS mean
                FROM cells
            ),
            wide AS (
                SELECT
                    MAX(CASE WHEN grp = 'treatment' AND period = 'post'
                             THEN (CAST(s AS DOUBLE) / CAST(n_units AS DOUBLE)) END) AS tpo,
                    MAX(CASE WHEN grp = 'treatment' AND period = 'pre'
                             THEN (CAST(s AS DOUBLE) / CAST(n_units AS DOUBLE)) END) AS tpr,
                    MAX(CASE WHEN grp = 'control' AND period = 'post'
                             THEN (CAST(s AS DOUBLE) / CAST(n_units AS DOUBLE)) END) AS cpo,
                    MAX(CASE WHEN grp = 'control' AND period = 'pre'
                             THEN (CAST(s AS DOUBLE) / CAST(n_units AS DOUBLE)) END) AS cpr
                FROM cells
            )
            SELECT "group", period, n_units, mean FROM base
            UNION ALL
            SELECT '__did__', 'effect', CAST(0 AS BIGINT),
                   ROUND((tpo - tpr) - (cpo - cpr), 6)
            FROM wide
        """,
        "vocab_drift": r"""
            WITH ta AS (
                SELECT term, COUNT(*) AS ca FROM (
                    SELECT unnest(string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ')) AS term
                    FROM documents WHERE length(source) = 4
                ) WHERE term <> '' GROUP BY 1
            ),
            tb AS (
                SELECT term, COUNT(*) AS cb FROM (
                    SELECT unnest(string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ')) AS term
                    FROM documents WHERE length(source) <> 4
                ) WHERE term <> '' GROUP BY 1
            ),
            terms AS (
                SELECT COALESCE(ca, 0) AS ca, COALESCE(cb, 0) AS cb
                FROM ta FULL OUTER JOIN tb USING (term)
            ),
            tot AS (SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb FROM terms),
            scaled AS (
                SELECT na, nb,
                       CAST(ROUND((CASE WHEN ca = 0 THEN 0.0 ELSE
                                 0.5 * (CAST(ca AS DOUBLE) / CAST(na AS DOUBLE))
                                 * ln((CAST(ca AS DOUBLE) / CAST(na AS DOUBLE))
                                      / (((CAST(ca AS DOUBLE) / CAST(na AS DOUBLE))
                                          + (CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))) / 2.0)) END
                               + CASE WHEN cb = 0 THEN 0.0 ELSE
                                 0.5 * (CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))
                                 * ln((CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))
                                      / (((CAST(ca AS DOUBLE) / CAST(na AS DOUBLE))
                                          + (CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))) / 2.0)) END)
                              * 1e12) AS BIGINT) AS t
                FROM terms CROSS JOIN tot
            )
            SELECT COUNT(*) AS n_terms, na AS n_tokens_a, nb AS n_tokens_b,
                   ROUND(CAST(CAST(SUM(t) AS BIGINT) AS DOUBLE) / 1e12, 6) AS jsd_nats,
                   ROUND(CAST(CAST(SUM(t) AS BIGINT) AS DOUBLE) / 1e12 / 0.6931471805599453, 6) AS jsd_bits
            FROM scaled GROUP BY na, nb
        """,
        "ngram_novelty": r"""
            WITH tk AS (SELECT doc_id, string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS tk FROM documents),
            sh AS (
                SELECT doc_id, unnest(list_distinct(list_transform(
                    range(1, len(tk) - 1), i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS shingle
                FROM tk WHERE len(tk) >= 3
            ),
            tr AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 2 = 0),
            te AS (SELECT shingle FROM sh WHERE doc_id % 2 = 1),
            novel AS (SELECT te.shingle FROM te LEFT JOIN tr ON te.shingle = tr.shingle
                      WHERE tr.shingle IS NULL),
            s AS (SELECT COUNT(*) AS n_test_shingles, COUNT(DISTINCT shingle) AS n_distinct_test FROM te),
            nv AS (SELECT COUNT(*) AS n_novel, COUNT(DISTINCT shingle) AS n_distinct_novel FROM novel)
            SELECT n_test_shingles, n_novel,
                   ROUND(CAST(n_novel AS DOUBLE) / CAST(n_test_shingles AS DOUBLE), 6) AS novelty_rate,
                   n_distinct_test, n_distinct_novel,
                   ROUND(CAST(n_distinct_novel AS DOUBLE) / CAST(n_distinct_test AS DOUBLE), 6) AS distinct_novelty_rate
            FROM s CROSS JOIN nv
        """,
        "grouped_split": """
            WITH g AS (
                SELECT CASE
                         WHEN CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 90 THEN 'train'
                         WHEN CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 95 THEN 'val'
                         ELSE 'test' END AS split,
                       user_id, COUNT(*) AS n
                FROM events GROUP BY 1, 2
            ),
            t AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM g)
            SELECT split, COUNT(*) AS n_groups, CAST(SUM(n) AS BIGINT) AS n_rows,
                   ROUND(CAST(CAST(SUM(n) AS BIGINT) AS DOUBLE) / CAST(t.tot AS DOUBLE), 6) AS row_share
            FROM g CROSS JOIN t GROUP BY split, t.tot
        """,
        "temporal_split": """
            WITH lo AS (SELECT MIN(epoch_us(ts) // 86400000000) AS dmin FROM events),
            r AS (SELECT epoch_us(ts) // 86400000000 - dmin AS rel_day
                  FROM events CROSS JOIN lo),
            p AS (
                SELECT CASE WHEN rel_day < 20 THEN 'train'
                            WHEN rel_day < 22 THEN 'embargo'
                            ELSE 'test' END AS split,
                       COUNT(*) AS n_rows,
                       MIN(rel_day) AS min_idx, MAX(rel_day) AS max_idx
                FROM r GROUP BY 1
            ),
            t AS (SELECT CAST(SUM(n_rows) AS BIGINT) AS tot FROM p)
            SELECT split, n_rows, min_idx, max_idx,
                   ROUND(CAST(n_rows AS DOUBLE) / CAST(t.tot AS DOUBLE), 6) AS row_share
            FROM p CROSS JOIN t
        """,
        "mad_outliers": """
            WITH b AS (SELECT o_orderpriority AS g,
                              CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                              * (CASE WHEN o_orderkey % 97 = 0 THEN 20 ELSE 1 END) AS v
                       FROM orders WHERE o_totalprice IS NOT NULL),
            grid AS (SELECT g, v, COUNT(*) AS c FROM b GROUP BY 1, 2),
            rk AS (SELECT g, v,
                          SUM(c) OVER (PARTITION BY g ORDER BY v ASC ROWS UNBOUNDED PRECEDING) AS cum,
                          SUM(c) OVER (PARTITION BY g) AS n
                   FROM grid),
            med AS (SELECT g, MIN(v) AS median, CAST(MAX(n) AS BIGINT) AS n
                    FROM rk WHERE cum * 2 >= n GROUP BY 1),
            dev AS (SELECT b.g, abs(b.v - med.median) AS d FROM b JOIN med ON b.g = med.g),
            dgrid AS (SELECT g, d, COUNT(*) AS c FROM dev GROUP BY 1, 2),
            drk AS (SELECT g, d,
                           SUM(c) OVER (PARTITION BY g ORDER BY d ASC ROWS UNBOUNDED PRECEDING) AS cum,
                           SUM(c) OVER (PARTITION BY g) AS n
                    FROM dgrid),
            mad AS (SELECT g, MIN(d) AS mad FROM drk WHERE cum * 2 >= n GROUP BY 1),
            fl AS (SELECT dev.g, COUNT(*) AS n_outliers
                   FROM dev JOIN mad ON dev.g = mad.g
                   WHERE CAST(dev.d AS HUGEINT) * 674500 > 3500000 * CAST(mad.mad AS HUGEINT)
                   GROUP BY 1)
            SELECT med.g AS priority, med.n AS n, med.median, mad.mad,
                   CAST(COALESCE(fl.n_outliers, 0) AS BIGINT) AS n_outliers,
                   ROUND(CAST(COALESCE(fl.n_outliers, 0) AS DOUBLE) / CAST(med.n AS DOUBLE), 6) AS outlier_share
            FROM med JOIN mad ON med.g = mad.g
            LEFT JOIN fl ON med.g = fl.g
        """,
        "lineitem_corr": """
            WITH b AS (
                SELECT CAST(ROUND(l_quantity) AS BIGINT) AS qty,
                       CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_c,
                       CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) AS disc_h,
                       CAST(CAST(l_tax AS DECIMAL(18,2)) * 100 AS BIGINT) AS tax_h
                FROM lineitem
                WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
                  AND l_discount IS NOT NULL AND l_tax IS NOT NULL
            ),
            m AS (
                SELECT COUNT(*) AS n,
                       CAST(SUM(qty) AS BIGINT) AS s_q, SUM(CAST(qty AS HUGEINT) * qty) AS ss_q,
                       CAST(SUM(price_c) AS BIGINT) AS s_p, SUM(CAST(price_c AS HUGEINT) * price_c) AS ss_p,
                       CAST(SUM(disc_h) AS BIGINT) AS s_d, SUM(CAST(disc_h AS HUGEINT) * disc_h) AS ss_d,
                       CAST(SUM(tax_h) AS BIGINT) AS s_t, SUM(CAST(tax_h AS HUGEINT) * tax_h) AS ss_t,
                       SUM(CAST(qty AS HUGEINT) * price_c) AS sp_qp,
                       SUM(CAST(qty AS HUGEINT) * disc_h) AS sp_qd,
                       SUM(CAST(qty AS HUGEINT) * tax_h) AS sp_qt,
                       SUM(CAST(price_c AS HUGEINT) * disc_h) AS sp_pd,
                       SUM(CAST(price_c AS HUGEINT) * tax_h) AS sp_pt,
                       SUM(CAST(disc_h AS HUGEINT) * tax_h) AS sp_dt
                FROM b
            )
            SELECT 'qty' AS col_a, 'price_c' AS col_b, n,
                   ROUND(CASE WHEN (n * ss_q - CAST(s_q AS HUGEINT) * s_q) = 0 OR (n * ss_p - CAST(s_p AS HUGEINT) * s_p) = 0 THEN NULL ELSE
                         CAST((n * sp_qp - CAST(s_q AS HUGEINT) * s_p) AS DOUBLE)
                         / sqrt(CAST((n * ss_q - CAST(s_q AS HUGEINT) * s_q) AS DOUBLE) * CAST((n * ss_p - CAST(s_p AS HUGEINT) * s_p) AS DOUBLE)) END, 6) AS corr FROM m
            UNION ALL
            SELECT 'qty', 'disc_h', n,
                   ROUND(CASE WHEN (n * ss_q - CAST(s_q AS HUGEINT) * s_q) = 0 OR (n * ss_d - CAST(s_d AS HUGEINT) * s_d) = 0 THEN NULL ELSE
                         CAST((n * sp_qd - CAST(s_q AS HUGEINT) * s_d) AS DOUBLE)
                         / sqrt(CAST((n * ss_q - CAST(s_q AS HUGEINT) * s_q) AS DOUBLE) * CAST((n * ss_d - CAST(s_d AS HUGEINT) * s_d) AS DOUBLE)) END, 6) FROM m
            UNION ALL
            SELECT 'qty', 'tax_h', n,
                   ROUND(CASE WHEN (n * ss_q - CAST(s_q AS HUGEINT) * s_q) = 0 OR (n * ss_t - CAST(s_t AS HUGEINT) * s_t) = 0 THEN NULL ELSE
                         CAST((n * sp_qt - CAST(s_q AS HUGEINT) * s_t) AS DOUBLE)
                         / sqrt(CAST((n * ss_q - CAST(s_q AS HUGEINT) * s_q) AS DOUBLE) * CAST((n * ss_t - CAST(s_t AS HUGEINT) * s_t) AS DOUBLE)) END, 6) FROM m
            UNION ALL
            SELECT 'price_c', 'disc_h', n,
                   ROUND(CASE WHEN (n * ss_p - CAST(s_p AS HUGEINT) * s_p) = 0 OR (n * ss_d - CAST(s_d AS HUGEINT) * s_d) = 0 THEN NULL ELSE
                         CAST((n * sp_pd - CAST(s_p AS HUGEINT) * s_d) AS DOUBLE)
                         / sqrt(CAST((n * ss_p - CAST(s_p AS HUGEINT) * s_p) AS DOUBLE) * CAST((n * ss_d - CAST(s_d AS HUGEINT) * s_d) AS DOUBLE)) END, 6) FROM m
            UNION ALL
            SELECT 'price_c', 'tax_h', n,
                   ROUND(CASE WHEN (n * ss_p - CAST(s_p AS HUGEINT) * s_p) = 0 OR (n * ss_t - CAST(s_t AS HUGEINT) * s_t) = 0 THEN NULL ELSE
                         CAST((n * sp_pt - CAST(s_p AS HUGEINT) * s_t) AS DOUBLE)
                         / sqrt(CAST((n * ss_p - CAST(s_p AS HUGEINT) * s_p) AS DOUBLE) * CAST((n * ss_t - CAST(s_t AS HUGEINT) * s_t) AS DOUBLE)) END, 6) FROM m
            UNION ALL
            SELECT 'disc_h', 'tax_h', n,
                   ROUND(CASE WHEN (n * ss_d - CAST(s_d AS HUGEINT) * s_d) = 0 OR (n * ss_t - CAST(s_t AS HUGEINT) * s_t) = 0 THEN NULL ELSE
                         CAST((n * sp_dt - CAST(s_d AS HUGEINT) * s_t) AS DOUBLE)
                         / sqrt(CAST((n * ss_d - CAST(s_d AS HUGEINT) * s_d) AS DOUBLE) * CAST((n * ss_t - CAST(s_t AS HUGEINT) * s_t) AS DOUBLE)) END, 6) FROM m
        """,
        "term_gini": """
            WITH freqs AS (
                SELECT term, COUNT(*) AS f FROM (
                    SELECT unnest(string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ')) AS term
                    FROM documents
                ) WHERE term <> '' GROUP BY 1
            ),
            pv AS (SELECT f AS v, COUNT(*) AS c FROM freqs GROUP BY 1),
            cum AS (SELECT v, c,
                           SUM(c) OVER (ORDER BY v ASC ROWS UNBOUNDED PRECEDING) - c AS r0
                    FROM pv),
            tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
                           SUM(CAST(v AS HUGEINT) * c) AS total FROM pv),
            terms AS (SELECT n, total, CAST(v AS HUGEINT) * c * (2 * r0 + c - n) AS t
                      FROM cum CROSS JOIN tot)
            SELECT n, CAST(total AS BIGINT) AS total,
                   ROUND(CASE WHEN total = 0 THEN NULL ELSE
                         CAST(SUM(t) AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(total AS DOUBLE)) END, 6) AS gini
            FROM terms GROUP BY n, terms.total
        """,
        "winsorized_prices": """
            WITH b AS (
                SELECT l_returnflag AS g,
                       CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                       * (CASE WHEN l_orderkey % 97 = 0 THEN 20 ELSE 1 END) AS v
                FROM lineitem WHERE l_extendedprice IS NOT NULL
            ),
            grid AS (SELECT g, v, COUNT(*) AS c FROM b GROUP BY 1, 2),
            rk AS (SELECT g, v, c,
                          SUM(c) OVER (PARTITION BY g ORDER BY v ASC ROWS UNBOUNDED PRECEDING) AS cum,
                          SUM(c) OVER (PARTITION BY g) AS n
                   FROM grid),
            f AS (SELECT g,
                         MIN(CASE WHEN cum * 100 >= 5 * n THEN v END) AS p_lo,
                         MIN(CASE WHEN cum * 100 >= 95 * n THEN v END) AS p_hi,
                         CAST(MAX(n) AS BIGINT) AS n
                  FROM rk GROUP BY 1),
            cl AS (SELECT rk.g, rk.c, rk.v,
                          GREATEST(f.p_lo, LEAST(f.p_hi, rk.v)) AS w
                   FROM rk JOIN f ON rk.g = f.g),
            a AS (SELECT g,
                         SUM(CAST(v AS HUGEINT) * c) AS sv,
                         SUM(CAST(w AS HUGEINT) * c) AS sw,
                         CAST(SUM(CASE WHEN v < w THEN c ELSE 0 END) AS BIGINT) AS n_clipped_low,
                         CAST(SUM(CASE WHEN v > w THEN c ELSE 0 END) AS BIGINT) AS n_clipped_high
                  FROM cl GROUP BY 1)
            SELECT f.g AS l_returnflag, f.n, f.p_lo, f.p_hi,
                   a.n_clipped_low, a.n_clipped_high,
                   ROUND(CAST(a.sv AS DOUBLE) / CAST(f.n AS DOUBLE), 6) AS mean,
                   ROUND(CAST(a.sw AS DOUBLE) / CAST(f.n AS DOUBLE), 6) AS winsorized_mean
            FROM f JOIN a ON f.g = a.g
        """,
        "ucb_allocation": """
            WITH un AS (
                SELECT CAST(user_id AS VARCHAR) || ':' ||
                       CAST(epoch_us(ts) // 86400000000 AS VARCHAR) AS unit,
                       MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS base_conv
                FROM events GROUP BY 1
            ),
            u AS (
                SELECT CASE (CAST(('0x' || substr(md5('ab:' || unit), 1, 15)) AS BIGINT) % 3)
                            WHEN 0 THEN 'control' WHEN 1 THEN 'variant_a'
                            ELSE 'variant_b' END AS variant,
                       CASE WHEN base_conv = 1
                              OR (CAST(('0x' || substr(md5('ab:' || unit), 1, 15)) AS BIGINT) % 3 = 1
                                  AND CAST(('0x' || substr(md5('up:' || unit), 1, 15)) AS BIGINT) % 5 = 0)
                            THEN 1 ELSE 0 END AS conv
                FROM un
            ),
            arms AS (SELECT variant, COUNT(*) AS n, CAST(SUM(conv) AS BIGINT) AS n_reward
                     FROM u GROUP BY 1),
            t AS (SELECT CAST(SUM(n) AS BIGINT) AS tn FROM arms),
            sc AS (
                SELECT variant, n, n_reward,
                       ROUND(CAST(n_reward AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_reward,
                       ROUND((CAST(n_reward AS DOUBLE) / CAST(n AS DOUBLE))
                             + sqrt(2.0 * ln(CAST(tn AS DOUBLE)) / CAST(n AS DOUBLE)), 6) AS ucb
                FROM arms CROSS JOIN t
            ),
            b AS (SELECT MAX({'u': ucb, 'v': variant}) AS bb FROM sc)
            SELECT variant, n, n_reward, mean_reward, ucb,
                   (ucb = bb.u AND variant = bb.v) AS would_pick
            FROM sc CROSS JOIN b
        """,
        "theil_nations": """
            WITH pc AS (
                SELECT o_custkey,
                       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
                FROM orders GROUP BY 1
            ),
            b AS (
                SELECT c.c_nationkey % 5 AS g, pc.cents AS x
                FROM pc JOIN customer c ON pc.o_custkey = c.c_custkey
                WHERE pc.cents IS NOT NULL AND pc.cents >= 0
            ),
            gs AS (SELECT g, COUNT(*) AS ng, SUM(CAST(x AS HUGEINT)) AS sg FROM b GROUP BY 1),
            t AS (SELECT CAST(SUM(ng) AS BIGINT) AS n, SUM(sg) AS s FROM gs),
            w AS (
                SELECT b.g, gs.ng, gs.sg,
                       SUM(CASE WHEN b.x = 0 THEN 0 ELSE
                           CAST(ROUND(((CAST(b.x AS DOUBLE) * CAST(gs.ng AS DOUBLE) / CAST(gs.sg AS DOUBLE))
                                       * ln(CAST(b.x AS DOUBLE) * CAST(gs.ng AS DOUBLE) / CAST(gs.sg AS DOUBLE)))
                                      * 1e12) AS BIGINT) END) AS tw
                FROM b JOIN gs ON b.g = gs.g
                GROUP BY 1, 2, 3
            ),
            rows_ AS (
                SELECT w.g, w.ng, w.sg, t.n, t.s,
                       ROUND((CAST(w.sg AS DOUBLE) / CAST(t.s AS DOUBLE)), 6) AS value_share,
                       ROUND(CAST(CAST(w.tw AS BIGINT) AS DOUBLE) / 1e12 / CAST(w.ng AS DOUBLE), 6) AS theil_within,
                       CASE WHEN w.sg = 0 THEN 0 ELSE
                            CAST(ROUND(((CAST(w.sg AS DOUBLE) / CAST(t.s AS DOUBLE))
                                        * ln((CAST(w.sg AS DOUBLE) / CAST(t.s AS DOUBLE))
                                             / (CAST(w.ng AS DOUBLE) / CAST(t.n AS DOUBLE)))) * 1e12) AS BIGINT) END AS bt,
                       CAST(ROUND((CAST(w.sg AS DOUBLE) / CAST(t.s AS DOUBLE))
                                  * (CAST(CAST(w.tw AS BIGINT) AS DOUBLE) / 1e12 / CAST(w.ng AS DOUBLE)) * 1e12) AS BIGINT) AS wc
                FROM w CROSS JOIN t
            ),
            tt AS (
                SELECT ROUND(CAST(CAST(SUM(bt) AS BIGINT) AS DOUBLE) / 1e12, 6) AS theil_between,
                       ROUND((CAST(CAST(SUM(bt) AS BIGINT) AS DOUBLE) + CAST(CAST(SUM(wc) AS BIGINT) AS DOUBLE)) / 1e12, 6) AS theil_total
                FROM rows_
            )
            SELECT g AS bloc, CAST(ng AS BIGINT) AS n, value_share, theil_within,
                   ROUND(CAST(CAST(bt AS BIGINT) AS DOUBLE) / 1e12, 6) AS between_term,
                   theil_between, theil_total
            FROM rows_ CROSS JOIN tt
        """,
        "source_diversity": """
            WITH cats AS (
                SELECT source AS c, COUNT(*) AS k FROM documents
                WHERE source IS NOT NULL GROUP BY 1
            ),
            t AS (SELECT CAST(SUM(k) AS BIGINT) AS n FROM cats),
            terms AS (
                SELECT n,
                       CAST(ROUND(((CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                                   * (CAST(k AS DOUBLE) / CAST(n AS DOUBLE))) * 1e12) AS BIGINT) AS h,
                       CAST(ROUND((-1.0 * (CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                                   * ln(CAST(k AS DOUBLE) / CAST(n AS DOUBLE))) * 1e12) AS BIGINT) AS e
                FROM cats CROSS JOIN t
            )
            SELECT COUNT(*) AS n_categories, n AS n_rows,
                   ROUND(CAST(CAST(SUM(h) AS BIGINT) AS DOUBLE) / 1e12, 6) AS hhi,
                   ROUND(1e12 / CAST(CAST(SUM(h) AS BIGINT) AS DOUBLE), 6) AS effective_simpson,
                   ROUND(CAST(CAST(SUM(e) AS BIGINT) AS DOUBLE) / 1e12, 6) AS entropy_nats,
                   ROUND(exp(CAST(CAST(SUM(e) AS BIGINT) AS DOUBLE) / 1e12), 6) AS effective_shannon
            FROM terms GROUP BY n
        """,
        "event_trends": """
            WITH d AS (
                SELECT event_type, epoch_us(ts) // 86400000000 AS di, COUNT(*) AS x
                FROM events GROUP BY 1, 2
            ),
            m AS (
                SELECT event_type, COUNT(*) AS n_points,
                       CAST(SUM(di) AS BIGINT) AS sx, CAST(SUM(x) AS BIGINT) AS sy,
                       SUM(CAST(di AS HUGEINT) * di) AS sxx,
                       SUM(CAST(di AS HUGEINT) * x) AS sxy
                FROM d GROUP BY 1
            )
            SELECT event_type, n_points,
                   ROUND(CASE WHEN (n_points * sxx - CAST(sx AS HUGEINT) * sx) = 0 THEN NULL ELSE
                         CAST((n_points * sxy - CAST(sx AS HUGEINT) * sy) AS DOUBLE)
                         / CAST((n_points * sxx - CAST(sx AS HUGEINT) * sx) AS DOUBLE) END, 6) AS slope,
                   CASE WHEN (n_points * sxx - CAST(sx AS HUGEINT) * sx) = 0 THEN NULL
                        ELSE (n_points * sxy - CAST(sx AS HUGEINT) * sy) > 0 END AS rising
            FROM m
        """,
        "chi_square_screen": """
            WITH pairs AS (
                SELECT 'lang_source' AS pair, lang AS x, source AS y FROM documents
                UNION ALL
                SELECT 'segment_nation', c_mktsegment, CAST(c_nationkey AS VARCHAR) FROM customer
                UNION ALL
                SELECT 'priority_status', o_orderpriority, o_orderstatus FROM orders
            ),
            cells AS (SELECT pair, x, y, count(*) AS nxy FROM pairs GROUP BY 1, 2, 3),
            mx AS (SELECT pair, x, CAST(sum(nxy) AS BIGINT) AS nx FROM cells GROUP BY 1, 2),
            my AS (SELECT pair, y, CAST(sum(nxy) AS BIGINT) AS ny FROM cells GROUP BY 1, 2),
            tot AS (SELECT pair, CAST(sum(nxy) AS BIGINT) AS n FROM cells GROUP BY 1),
            ks AS (
                SELECT pair, CAST(kx AS BIGINT) AS kx, CAST(ky AS BIGINT) AS ky
                FROM (SELECT pair, count(*) AS kx FROM mx GROUP BY 1)
                JOIN (SELECT pair, count(*) AS ky FROM my GROUP BY 1) USING (pair)
            ),
            full_grid AS (
                SELECT mx.pair, mx.x, my.y, mx.nx, my.ny, COALESCE(c.nxy, 0) AS nxy
                FROM mx JOIN my USING (pair)
                LEFT JOIN cells c ON c.pair = mx.pair AND c.x = mx.x AND c.y = my.y
            ),
            terms AS (
                SELECT f.pair,
                       CAST(ROUND((
                           (CAST(nxy AS DOUBLE) * CAST(n AS DOUBLE) - CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE))
                           * (CAST(nxy AS DOUBLE) * CAST(n AS DOUBLE) - CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE))
                           / (CAST(n AS DOUBLE) * CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE))
                       ) * 1e6) AS BIGINT) AS t
                FROM full_grid f JOIN tot USING (pair)
            ),
            chi AS (SELECT pair, CAST(sum(t) AS BIGINT) AS chi2u FROM terms GROUP BY 1)
            SELECT chi.pair,
                   ROUND(CAST(chi2u AS DOUBLE) / 1e6, 6) AS chi2,
                   CAST((kx - 1) * (ky - 1) AS BIGINT) AS dof,
                   ROUND(sqrt((CAST(chi2u AS DOUBLE) / 1e6)
                              / (CAST(n AS DOUBLE) * CAST(least(kx - 1, ky - 1) AS DOUBLE))), 6) AS cramers_v,
                   n
            FROM chi JOIN ks USING (pair) JOIN tot USING (pair)
            ORDER BY pair
        """,
        "anova_doclen": """
            WITH src AS (
                SELECT 'by_lang' AS split, lang AS g, n_chars AS v FROM documents
                UNION ALL
                SELECT 'by_source', source, n_chars FROM documents
            ),
            grp AS (
                SELECT split, g, count(*) AS ng,
                       CAST(sum(v) AS HUGEINT) AS sg,
                       SUM(CAST(v AS HUGEINT) * v) AS sxx
                FROM src WHERE v IS NOT NULL GROUP BY 1, 2
            ),
            agg AS (
                SELECT split, CAST(count(*) AS BIGINT) AS k, CAST(sum(ng) AS BIGINT) AS n,
                       CAST(sum(sg) AS HUGEINT) AS s,
                       CAST(sum(sxx) AS HUGEINT) AS xx,
                       CAST(sum(CAST(ROUND(CAST(sg * sg AS DOUBLE) / CAST(ng AS DOUBLE) * 1e6) AS BIGINT)) AS BIGINT) AS rat_u
                FROM grp GROUP BY 1
            )
            SELECT split, k, n,
                   ROUND(((CAST(rat_u AS DOUBLE) / 1e6 - CAST(s * s AS DOUBLE) / CAST(n AS DOUBLE)) / (k - 1)) /
                         ((CAST(xx AS DOUBLE) - CAST(rat_u AS DOUBLE) / 1e6) / (n - k)), 6) AS f_stat,
                   ROUND((CAST(rat_u AS DOUBLE) / 1e6 - CAST(s * s AS DOUBLE) / CAST(n AS DOUBLE)) /
                         (CAST(xx AS DOUBLE) - CAST(s * s AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS eta_sq,
                   ROUND((CAST(rat_u AS DOUBLE) / 1e6 - CAST(s * s AS DOUBLE) / CAST(n AS DOUBLE)) / 1.0, 6) AS ssb,
                   ROUND((CAST(xx AS DOUBLE) - CAST(rat_u AS DOUBLE) / 1e6) / 1.0, 6) AS ssw
            FROM agg ORDER BY split
        """,
        "market_concentration": """
            WITH facts AS (
                SELECT r.r_name AS market, nt.n_name AS player,
                       CAST(ROUND(CAST(o.o_totalprice AS DOUBLE) * 100) AS BIGINT) AS x
                FROM orders o
                JOIN customer c ON o.o_custkey = c.c_custkey
                JOIN nation nt ON c.c_nationkey = nt.n_nationkey
                JOIN region r ON nt.n_regionkey = r.r_regionkey
                WHERE o.o_totalprice IS NOT NULL
            ),
            players AS (
                SELECT market, player, CAST(sum(x) AS HUGEINT) AS rev
                FROM facts GROUP BY 1, 2
            ),
            m AS (
                SELECT market, CAST(count(*) AS BIGINT) AS n_players,
                       CAST(sum(rev * rev) AS HUGEINT) AS sq,
                       CAST(sum(rev) AS HUGEINT) AS tot,
                       CAST(max(rev) AS HUGEINT) AS top
                FROM players GROUP BY 1
            )
            SELECT market, n_players,
                   ROUND(CAST(sq AS DOUBLE) / CAST(tot * tot AS DOUBLE), 8) AS hhi,
                   CASE WHEN n_players > 1 THEN
                       ROUND((CAST(sq AS DOUBLE) / CAST(tot * tot AS DOUBLE) - 1.0 / n_players) /
                             (1.0 - 1.0 / n_players), 8)
                   END AS hhi_normalized,
                   ROUND(CAST(top AS DOUBLE) / CAST(tot AS DOUBLE), 8) AS top_share
            FROM m ORDER BY market
        """,
        "js_event_drift": """
            WITH halved AS (
                SELECT CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00' THEN 'h1' ELSE 'h2' END AS half,
                       event_type AS c
                FROM events
            ),
            cells AS (
                SELECT half = 'h1' AS is_l, c, count(*) AS n
                FROM halved WHERE half IN ('h1', 'h2') GROUP BY 1, 2
            ),
            sides AS (
                SELECT c,
                       CAST(sum(CASE WHEN is_l THEN n ELSE 0 END) AS BIGINT) AS a,
                       CAST(sum(CASE WHEN NOT is_l THEN n ELSE 0 END) AS BIGINT) AS b
                FROM cells GROUP BY 1
            ),
            tot AS (SELECT CAST(sum(a) AS BIGINT) AS na, CAST(sum(b) AS BIGINT) AS nb FROM sides),
            terms AS (
                SELECT
                    CASE WHEN a > 0 THEN CAST(ROUND(((CAST(a AS DOUBLE) / CAST(na AS DOUBLE)) / 2.0 *
                        ln((CAST(a AS DOUBLE) / CAST(na AS DOUBLE)) /
                           (((CAST(a AS DOUBLE) / CAST(na AS DOUBLE)) + (CAST(b AS DOUBLE) / CAST(nb AS DOUBLE))) / 2.0))) * 1e12) AS BIGINT)
                        ELSE CAST(0 AS BIGINT) END
                    + CASE WHEN b > 0 THEN CAST(ROUND(((CAST(b AS DOUBLE) / CAST(nb AS DOUBLE)) / 2.0 *
                        ln((CAST(b AS DOUBLE) / CAST(nb AS DOUBLE)) /
                           (((CAST(a AS DOUBLE) / CAST(na AS DOUBLE)) + (CAST(b AS DOUBLE) / CAST(nb AS DOUBLE))) / 2.0))) * 1e12) AS BIGINT)
                        ELSE CAST(0 AS BIGINT) END AS t,
                    na, nb
                FROM sides, tot
            )
            SELECT ROUND(CAST(CAST(sum(t) AS BIGINT) AS DOUBLE) / 1e12, 8) AS jsd_nats,
                   CAST(max(na) AS BIGINT) AS n_left, CAST(max(nb) AS BIGINT) AS n_right
            FROM terms
        """,

        "spearman_screen": """
            WITH pairs AS (
                SELECT 'qty_price' AS pair,
                       CAST(ROUND(CAST(l_quantity AS DOUBLE) * 1) AS BIGINT) AS xv,
                       CAST(ROUND(CAST(l_extendedprice AS DOUBLE) * 1) AS BIGINT) AS yv
                FROM lineitem WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
                UNION ALL
                SELECT 'qty_discount',
                       CAST(ROUND(CAST(l_quantity AS DOUBLE) * 1) AS BIGINT),
                       CAST(ROUND(CAST(l_discount AS DOUBLE) * 100) AS BIGINT)
                FROM lineitem WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
                UNION ALL
                SELECT 'chars_tokens',
                       CAST(ROUND(CAST(n_chars AS DOUBLE) * 1) AS BIGINT),
                       CAST(ROUND(CAST(len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                                        t -> t <> '')) AS DOUBLE) * 1) AS BIGINT)
                FROM documents WHERE n_chars IS NOT NULL AND text IS NOT NULL
            ),
            gx AS (SELECT pair, xv, count(*) AS c FROM pairs GROUP BY 1, 2),
            gxr AS (SELECT pair, xv,
                           2 * (SUM(c) OVER (PARTITION BY pair ORDER BY xv) - c) + c + 1 AS rx
                    FROM gx),
            gy AS (SELECT pair, yv, count(*) AS c FROM pairs GROUP BY 1, 2),
            gyr AS (SELECT pair, yv,
                           2 * (SUM(c) OVER (PARTITION BY pair ORDER BY yv) - c) + c + 1 AS ry
                    FROM gy),
            r AS (
                SELECT p.pair, rx, ry
                FROM pairs p JOIN gxr USING (pair, xv) JOIN gyr USING (pair, yv)
            ),
            m AS (
                SELECT pair, CAST(count(*) AS BIGINT) AS n,
                       SUM(CAST(rx AS HUGEINT)) AS sx, SUM(CAST(ry AS HUGEINT)) AS sy,
                       SUM(CAST(rx AS HUGEINT) * rx) AS sxx, SUM(CAST(ry AS HUGEINT) * ry) AS syy,
                       SUM(CAST(rx AS HUGEINT) * ry) AS sxy
                FROM r GROUP BY 1
            )
            SELECT pair, n,
                   ROUND(CAST(n * sxy - sx * sy AS DOUBLE) /
                         (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
                          sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS rho
            FROM m ORDER BY pair
        """,
        "fdr_nation_ab": """
            WITH base AS (
                SELECT nt.n_name AS nation,
                       CASE WHEN o.o_orderdate < DATE '1995-06-17' THEN 'a' ELSE 'b' END AS side,
                       CAST(o.o_totalprice AS DOUBLE) AS v0
                FROM orders o
                JOIN customer c ON o.o_custkey = c.c_custkey
                JOIN nation nt ON c.c_nationkey = nt.n_nationkey
                WHERE o.o_totalprice IS NOT NULL
            ),
            vals AS (
                SELECT nation, side,
                       CAST(ROUND(CAST(CASE WHEN nation = 'NATION_3' AND side = 'b'
                                             THEN v0 * 1.4 ELSE v0 END AS DOUBLE) * 100) AS BIGINT) AS x
                FROM base
            ),
            sided AS (
                SELECT nation AS _g,
                       CAST(SUM(CASE WHEN side = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
                       CAST(SUM(CASE WHEN side = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
                       SUM(CASE WHEN side = 'a' THEN CAST(x AS HUGEINT) ELSE CAST(0 AS HUGEINT) END) AS _s1,
                       SUM(CASE WHEN side = 'b' THEN CAST(x AS HUGEINT) ELSE CAST(0 AS HUGEINT) END) AS _s2,
                       SUM(CASE WHEN side = 'a' THEN CAST(x AS HUGEINT) * x ELSE CAST(0 AS HUGEINT) END) AS _q1,
                       SUM(CASE WHEN side = 'b' THEN CAST(x AS HUGEINT) * x ELSE CAST(0 AS HUGEINT) END) AS _q2
                FROM vals GROUP BY 1
                HAVING SUM(CASE WHEN side = 'a' THEN 1 ELSE 0 END) > 1
                   AND SUM(CASE WHEN side = 'b' THEN 1 ELSE 0 END) > 1
            ),
            tested AS (
                SELECT _g, n1 AS n_left, n2 AS n_right,
                       ROUND(((CAST(_s1 AS DOUBLE) / n1 - CAST(_s2 AS DOUBLE) / n2) / sqrt((CAST(_q1 AS DOUBLE) / n1 - (CAST(_s1 AS DOUBLE) / n1) * (CAST(_s1 AS DOUBLE) / n1)) / n1 + (CAST(_q2 AS DOUBLE) / n2 - (CAST(_s2 AS DOUBLE) / n2) * (CAST(_s2 AS DOUBLE) / n2)) / n2)), 6) AS z,
                       CAST(ROUND((2.0 * (exp(-(abs(((CAST(_s1 AS DOUBLE) / n1 - CAST(_s2 AS DOUBLE) / n2) / sqrt((CAST(_q1 AS DOUBLE) / n1 - (CAST(_s1 AS DOUBLE) / n1) * (CAST(_s1 AS DOUBLE) / n1)) / n1 + (CAST(_q2 AS DOUBLE) / n2 - (CAST(_s2 AS DOUBLE) / n2) * (CAST(_s2 AS DOUBLE) / n2)) / n2)))) * (abs(((CAST(_s1 AS DOUBLE) / n1 - CAST(_s2 AS DOUBLE) / n2) / sqrt((CAST(_q1 AS DOUBLE) / n1 - (CAST(_s1 AS DOUBLE) / n1) * (CAST(_s1 AS DOUBLE) / n1)) / n1 + (CAST(_q2 AS DOUBLE) / n2 - (CAST(_s2 AS DOUBLE) / n2) * (CAST(_s2 AS DOUBLE) / n2)) / n2)))) / 2.0) / 2.5066282746310002 * ((1.0 / (1.0 + 0.2316419 * (abs(((CAST(_s1 AS DOUBLE) / n1 - CAST(_s2 AS DOUBLE) / n2) / sqrt((CAST(_q1 AS DOUBLE) / n1 - (CAST(_s1 AS DOUBLE) / n1) * (CAST(_s1 AS DOUBLE) / n1)) / n1 + (CAST(_q2 AS DOUBLE) / n2 - (CAST(_s2 AS DOUBLE) / n2) * (CAST(_s2 AS DOUBLE) / n2)) / n2)))))) * (0.319381530 + (1.0 / (1.0 + 0.2316419 * (abs(((CAST(_s1 AS DOUBLE) / n1 - CAST(_s2 AS DOUBLE) / n2) / sqrt((CAST(_q1 AS DOUBLE) / n1 - (CAST(_s1 AS DOUBLE) / n1) * (CAST(_s1 AS DOUBLE) / n1)) / n1 + (CAST(_q2 AS DOUBLE) / n2 - (CAST(_s2 AS DOUBLE) / n2) * (CAST(_s2 AS DOUBLE) / n2)) / n2)))))) * (-0.356563782 + (1.0 / (1.0 + 0.2316419 * (abs(((CAST(_s1 AS DOUBLE) / n1 - CAST(_s2 AS DOUBLE) / n2) / sqrt((CAST(_q1 AS DOUBLE) / n1 - (CAST(_s1 AS DOUBLE) / n1) * (CAST(_s1 AS DOUBLE) / n1)) / n1 + (CAST(_q2 AS DOUBLE) / n2 - (CAST(_s2 AS DOUBLE) / n2) * (CAST(_s2 AS DOUBLE) / n2)) / n2)))))) * (1.781477937 + (1.0 / (1.0 + 0.2316419 * (abs(((CAST(_s1 AS DOUBLE) / n1 - CAST(_s2 AS DOUBLE) / n2) / sqrt((CAST(_q1 AS DOUBLE) / n1 - (CAST(_s1 AS DOUBLE) / n1) * (CAST(_s1 AS DOUBLE) / n1)) / n1 + (CAST(_q2 AS DOUBLE) / n2 - (CAST(_s2 AS DOUBLE) / n2) * (CAST(_s2 AS DOUBLE) / n2)) / n2)))))) * (-1.821255978 + (1.0 / (1.0 + 0.2316419 * (abs(((CAST(_s1 AS DOUBLE) / n1 - CAST(_s2 AS DOUBLE) / n2) / sqrt((CAST(_q1 AS DOUBLE) / n1 - (CAST(_s1 AS DOUBLE) / n1) * (CAST(_s1 AS DOUBLE) / n1)) / n1 + (CAST(_q2 AS DOUBLE) / n2 - (CAST(_s2 AS DOUBLE) / n2) * (CAST(_s2 AS DOUBLE) / n2)) / n2)))))) * 1.330274429))))))) * 1e12) AS BIGINT) AS _pu
                FROM sided
            ),
            ranked AS (
                SELECT *, CAST(count(*) OVER () AS BIGINT) AS _m,
                       CAST(row_number() OVER (ORDER BY _pu ASC, _g ASC) AS BIGINT) AS p_rank
                FROM tested
            ),
            cut AS (
                SELECT *, max(CASE WHEN _pu * _m <= CAST(p_rank * ROUND(0.05 * 1e12) AS BIGINT)
                                   THEN p_rank END) OVER () AS _imax
                FROM ranked
            )
            SELECT _g AS nation, n_left, n_right, z,
                   ROUND(CAST(_pu AS DOUBLE) / 1e12, 12) AS p_value,
                   p_rank,
                   ROUND(CAST(p_rank AS DOUBLE) * 0.05 / _m, 12) AS bh_cutoff,
                   COALESCE(p_rank <= _imax, FALSE) AS rejected
            FROM cut ORDER BY p_rank
        """,
        "mcnemar_filters": """
            WITH flags AS (
                SELECT (n_chars BETWEEN 150 AND 450) AS ka,
                       (len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                        t -> t <> '')) BETWEEN 25 AND 80) AS kb
                FROM documents
            )
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN ka AND kb THEN 1 ELSE 0 END) AS BIGINT) AS n_both_keep,
                   CAST(SUM(CASE WHEN NOT ka AND NOT kb THEN 1 ELSE 0 END) AS BIGINT) AS n_both_drop,
                   CAST(SUM(CASE WHEN ka AND NOT kb THEN 1 ELSE 0 END) AS BIGINT) AS b_only_a,
                   CAST(SUM(CASE WHEN NOT ka AND kb THEN 1 ELSE 0 END) AS BIGINT) AS c_only_b,
                   CASE WHEN SUM(CASE WHEN ka <> kb THEN 1 ELSE 0 END) > 0 THEN
                       ROUND(CAST((abs(CAST(SUM(CASE WHEN ka AND NOT kb THEN 1 ELSE 0 END) AS BIGINT)
                                       - CAST(SUM(CASE WHEN NOT ka AND kb THEN 1 ELSE 0 END) AS BIGINT)) - 1)
                                  * (abs(CAST(SUM(CASE WHEN ka AND NOT kb THEN 1 ELSE 0 END) AS BIGINT)
                                         - CAST(SUM(CASE WHEN NOT ka AND kb THEN 1 ELSE 0 END) AS BIGINT)) - 1) AS DOUBLE)
                             / CAST(CAST(SUM(CASE WHEN ka <> kb THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE), 6)
                   END AS chi2_cc
            FROM flags
        """,
        "token_entropy_profile": """
            WITH toks AS (
                SELECT doc_id, source, t.tok, count(*) AS _c
                FROM documents, unnest(regexp_split_to_array(lower(text), '\\s+')) AS t(tok)
                WHERE t.tok <> '' GROUP BY 1, 2, 3
            ),
            d AS (
                SELECT doc_id, source, CAST(sum(_c) AS BIGINT) AS _n,
                       CAST(sum(CAST(ROUND(CAST(_c AS DOUBLE) * ln(CAST(_c AS DOUBLE)) * 1e12) AS BIGINT)) AS BIGINT) AS _s
                FROM toks GROUP BY 1, 2
            ),
            h AS (
                SELECT source,
                       CAST(ROUND((ln(CAST(_n AS DOUBLE)) - CAST(_s AS DOUBLE) / 1e12 / CAST(_n AS DOUBLE))
                                  * 1e6) AS BIGINT) AS _h
                FROM d
            )
            SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                   ROUND(CAST(CAST(sum(_h) AS BIGINT) AS DOUBLE) / count(*) / 1e6, 6) AS mean_token_entropy,
                   ROUND(CAST(CAST(SUM(CASE WHEN _h < 3000000 THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE)
                         / count(*), 6) AS low_entropy_share
            FROM h GROUP BY source ORDER BY source
        """,

        "boilerplate_profile": """
            WITH arr AS (
                SELECT doc_id, source,
                       list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS a
                FROM documents
            ),
            base AS (SELECT * FROM arr WHERE len(a) > 0),
            segs AS (
                SELECT doc_id, source,
                       CAST(('0x' || substr(md5(array_to_string(a[i * 3 + 1 : i * 3 + 3], ' ')), 1, 15)) AS BIGINT) AS h,
                       least(len(a) - i * 3, 3) AS nt
                FROM base, unnest(range(CAST(ceil(len(a) / 3.0) AS BIGINT))) AS t(i)
            ),
            cnt AS (SELECT h, count(DISTINCT doc_id) AS nd FROM segs GROUP BY 1),
            flagged AS (
                SELECT s.doc_id, s.source, s.h, s.nt,
                       CASE WHEN c.nd >= 3 THEN 1 ELSE 0 END AS bp
                FROM segs s JOIN cnt c USING (h)
            ),
            d AS (
                SELECT doc_id, source,
                       CAST(sum(nt) AS BIGINT) AS tok,
                       CAST(sum(nt * bp) AS BIGINT) AS bptok,
                       max(bp) AS hit
                FROM flagged GROUP BY 1, 2
            ),
            perdoc AS (
                SELECT source,
                       CAST(ROUND(CAST(bptok AS DOUBLE) / CAST(tok AS DOUBLE) * 1e6) AS BIGINT) AS r,
                       hit
                FROM d
            ),
            nbp AS (
                SELECT source, CAST(count(DISTINCT h) AS BIGINT) AS n_bp_segments
                FROM flagged WHERE bp = 1 GROUP BY 1
            ),
            g AS (
                SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                       CAST(sum(r) AS BIGINT) AS rs, CAST(sum(hit) AS BIGINT) AS hits
                FROM perdoc GROUP BY 1
            )
            SELECT g.source, n_docs,
                   COALESCE(n_bp_segments, 0) AS n_bp_segments,
                   ROUND(CAST(rs AS DOUBLE) / n_docs / 1e6, 6) AS mean_bp_ratio,
                   ROUND(CAST(hits AS DOUBLE) / n_docs, 6) AS hit_share
            FROM g LEFT JOIN nbp USING (source)
            ORDER BY source
        """,
        "kn_bigram_lm": """
            WITH arr AS (
                SELECT list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS a
                FROM documents
            ),
            base AS (SELECT a FROM arr WHERE len(a) >= 2),
            pairs AS (
                SELECT a[i] AS w1, a[i + 1] AS w2
                FROM base, unnest(range(1, CAST(len(a) AS BIGINT))) AS t(i)
            ),
            big AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c FROM pairs GROUP BY 1, 2),
            ctx AS (SELECT w1, CAST(sum(c) AS BIGINT) AS c_w1, CAST(count(*) AS BIGINT) AS n1_fwd FROM big GROUP BY 1),
            cont AS (SELECT w2, CAST(count(*) AS BIGINT) AS n1_bwd FROM big GROUP BY 1),
            nbi AS (SELECT CAST(count(*) AS BIGINT) AS n_bigrams FROM big)
            SELECT big.w1, big.w2, c, c_w1, n1_fwd, n1_bwd,
                   ROUND(CAST(c AS DOUBLE) / CAST(c_w1 AS DOUBLE), 8) AS p_mle,
                   ROUND(greatest(CAST(c AS DOUBLE) - 0.75, 0.0) / CAST(c_w1 AS DOUBLE)
                         + 0.75 * CAST(n1_fwd AS DOUBLE) / CAST(c_w1 AS DOUBLE)
                         * (CAST(n1_bwd AS DOUBLE) / CAST(n_bigrams AS DOUBLE)), 8) AS p_kn
            FROM big JOIN ctx USING (w1) JOIN cont USING (w2) CROSS JOIN nbi
            ORDER BY c DESC, w1 ASC, w2 ASC LIMIT 50
        """,

        "log_rank_sessions": """
            WITH e AS (
                SELECT user_id, event_id, ts, epoch_us(ts) AS us,
                       LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pus
                FROM events
            ),
            s AS (
                SELECT user_id,
                       SUM(CASE WHEN pus IS NULL OR us - pus > 21600000000 THEN 1 ELSE 0 END)
                           OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sid,
                       ts
                FROM e
            ),
            ses AS (SELECT user_id, sid, COUNT(*) AS n_ev,
                           MIN(epoch_us(ts)) AS first_us, MAX(epoch_us(ts)) AS last_us
                    FROM s GROUP BY 1, 2),
            mx AS (SELECT MAX(epoch_us(ts)) AS m FROM events),
            subj AS (SELECT CASE WHEN first_us < 1705363200000000 THEN 'h1' ELSE 'h2' END AS half,
                            n_ev AS t,
                            CASE WHEN m - last_us < 86400000000 THEN 0 ELSE 1 END AS ev
                     FROM ses CROSS JOIN mx),
            pt AS (
                SELECT t,
                       CAST(SUM(CASE WHEN half = 'h1' THEN ev ELSE 0 END) AS BIGINT) AS d1,
                       CAST(SUM(CASE WHEN half = 'h2' THEN ev ELSE 0 END) AS BIGINT) AS d2,
                       CAST(SUM(CASE WHEN half = 'h1' THEN 1 ELSE 0 END) AS BIGINT) AS a1,
                       CAST(SUM(CASE WHEN half = 'h2' THEN 1 ELSE 0 END) AS BIGINT) AS a2
                FROM subj GROUP BY 1
            ),
            tot AS (SELECT CAST(SUM(a1) AS BIGINT) AS n1tot, CAST(SUM(a2) AS BIGINT) AS n2tot FROM pt),
            rk AS (
                SELECT t, d1, d2,
                       CAST(n1tot - (SUM(a1) OVER (ORDER BY t ASC ROWS UNBOUNDED PRECEDING) - a1) AS BIGINT) AS n1,
                       CAST(n2tot - (SUM(a2) OVER (ORDER BY t ASC ROWS UNBOUNDED PRECEDING) - a2) AS BIGINT) AS n2,
                       n1tot, n2tot
                FROM pt CROSS JOIN tot
            ),
            agg AS (
                SELECT CAST(SUM(d1) AS BIGINT) AS o1,
                       CAST(SUM(CAST(ROUND(CAST(d1 + d2 AS DOUBLE) * CAST(n1 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE) * 1e6) AS BIGINT)) AS BIGINT) AS e1u,
                       CAST(SUM(CASE WHEN n1 + n2 <= 1 THEN CAST(0 AS BIGINT) ELSE
                           CAST(ROUND(CAST(d1 + d2 AS DOUBLE) * (CAST(n1 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
                                * (CAST(n2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
                                * (CAST(n1 + n2 - d1 - d2 AS DOUBLE) / CAST(n1 + n2 - 1 AS DOUBLE)) * 1e6) AS BIGINT) END) AS BIGINT) AS vu,
                       CAST(MAX(n1tot) AS BIGINT) AS n_left, CAST(MAX(n2tot) AS BIGINT) AS n_right
                FROM rk WHERE d1 + d2 > 0
            )
            SELECT n_left, n_right, o1,
                   ROUND(CAST(e1u AS DOUBLE) / 1e6, 6) AS e1,
                   ROUND(CAST(vu AS DOUBLE) / 1e6, 6) AS variance,
                   ROUND(((CAST(o1 AS DOUBLE) - CAST(e1u AS DOUBLE) / 1e6) / sqrt(CAST(vu AS DOUBLE) / 1e6)), 6) AS z,
                   ROUND(((CAST(o1 AS DOUBLE) - CAST(e1u AS DOUBLE) / 1e6) / sqrt(CAST(vu AS DOUBLE) / 1e6))
                         * ((CAST(o1 AS DOUBLE) - CAST(e1u AS DOUBLE) / 1e6) / sqrt(CAST(vu AS DOUBLE) / 1e6)), 6) AS chi2
            FROM agg
        """,
        "cem_att_balance": """
            WITH spend AS (
                SELECT o_custkey,
                       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS spend
                FROM orders GROUP BY 1
            ),
            units AS (
                SELECT (c_mktsegment = 'BUILDING') AS t,
                       CAST(floor(CAST(CAST(ROUND(CAST(c_acctbal AS DOUBLE) * 1000000) AS BIGINT) AS DOUBLE)
                                  / CAST(500000000 AS BIGINT)) AS BIGINT) AS cell,
                       CAST(ROUND(CAST(COALESCE(s.spend, 0.0) AS DOUBLE) * 100) AS BIGINT) AS y,
                       c_custkey AS id
                FROM customer c LEFT JOIN spend s ON c.c_custkey = s.o_custkey
                WHERE c_acctbal IS NOT NULL
            ),
            ranked AS (
                SELECT *, row_number() OVER (PARTITION BY cell, t ORDER BY id ASC) AS rk
                FROM units
            ),
            pairs AS (
                SELECT a.y AS yt, b.y AS yc
                FROM ranked a JOIN ranked b ON a.cell = b.cell AND a.rk = b.rk
                WHERE a.t AND NOT b.t
            ),
            tt AS (
                SELECT CAST(SUM(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS n_treated,
                       CAST(SUM(CASE WHEN NOT t THEN 1 ELSE 0 END) AS BIGINT) AS n_control
                FROM units
            ),
            m AS (
                SELECT CAST(COUNT(*) AS BIGINT) AS n_matched,
                       CAST(SUM(yt) AS BIGINT) AS st, CAST(SUM(yc) AS BIGINT) AS sc
                FROM pairs
            )
            SELECT n_treated, n_control, n_matched,
                   ROUND(CAST(st - sc AS DOUBLE) / CAST(n_matched AS DOUBLE) / 100.0, 6) AS att,
                   ROUND(CAST(st AS DOUBLE) / CAST(n_matched AS DOUBLE) / 100.0, 6) AS mean_treated_matched,
                   ROUND(CAST(sc AS DOUBLE) / CAST(n_matched AS DOUBLE) / 100.0, 6) AS mean_control_matched
            FROM m CROSS JOIN tt
        """,
        "ewma_chart_daily": """
            WITH RECURSIVE d AS (
                SELECT epoch_us(ts) // 86400000000 AS di, CAST(COUNT(*) AS BIGINT) AS y
                FROM events GROUP BY 1
            ),
            o AS (SELECT di, y, ROW_NUMBER() OVER (ORDER BY di) AS rn FROM d),
            mom AS (
                SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS s,
                       SUM(CAST(y AS HUGEINT) * y) AS sxx
                FROM o
            ),
            mu AS (
                SELECT n,
                       CAST(ROUND(CAST(s * 1000000 AS DOUBLE) / n) AS BIGINT) AS mu_micro,
                       CAST(3.0 AS DOUBLE) * (sqrt(CAST(n * sxx - CAST(s AS HUGEINT) * s AS DOUBLE)) / n)
                           * sqrt(CAST(0.2 AS DOUBLE) / (CAST(2.0 AS DOUBLE) - 0.2)) AS bhw
                FROM mom
            ),
            st(rn, l, p) AS (
                SELECT 0, mu_micro, CAST(1.0 AS DOUBLE) FROM mu
                UNION ALL
                SELECT st.rn + 1,
                       CAST(ROUND(CAST(0.2 AS DOUBLE) * (o.y * 1000000)
                                  + (CAST(1.0 AS DOUBLE) - 0.2) * st.l) AS BIGINT),
                       st.p * ((CAST(1.0 AS DOUBLE) - 0.2) * (CAST(1.0 AS DOUBLE) - 0.2))
                FROM st JOIN o ON o.rn = st.rn + 1
            ),
            hw AS (
                SELECT o.di, o.y, st.l,
                       CAST(ROUND(mu.bhw * sqrt(1.0 - st.p) * 1000000) AS BIGINT) AS h,
                       mu.mu_micro
                FROM st JOIN o ON o.rn = st.rn CROSS JOIN mu
                WHERE st.rn >= 1
            )
            SELECT di, y,
                   ROUND(CAST(l AS DOUBLE) / 1e6, 6) AS ewma,
                   ROUND(CAST(mu_micro + h AS DOUBLE) / 1e6, 6) AS ucl,
                   ROUND(CAST(mu_micro - h AS DOUBLE) / 1e6, 6) AS lcl,
                   abs(l - mu_micro) > h AS out_of_control
            FROM hw
        """,

        "dp_release_counts": """
            WITH counts AS (
                SELECT lang, source, CAST(count(*) AS BIGINT) AS n_true
                FROM documents GROUP BY 1, 2
            ),
            h AS (
                SELECT lang, source, n_true,
                       CAST(('0x' || substr(md5(concat_ws('|', lang, source, '8')), 1, 15)) AS BIGINT) AS _h
                FROM counts
            ),
            nz AS (
                SELECT lang, source, n_true,
                       CAST(ROUND(CASE WHEN ((CAST(_h % 1073741824 AS DOUBLE) + 0.5) / 1073741824.0) < 0.5
                                       THEN ln(2.0 * ((CAST(_h % 1073741824 AS DOUBLE) + 0.5) / 1073741824.0)) / 1.0
                                       ELSE -(ln(2.0 - 2.0 * ((CAST(_h % 1073741824 AS DOUBLE) + 0.5) / 1073741824.0)) / 1.0)
                                  END * 1e6) AS BIGINT) AS _nz
                FROM h
            )
            SELECT lang, source, n_true,
                   ROUND(CAST(_nz AS DOUBLE) / 1e6, 6) AS noise,
                   n_true + CAST(ROUND(CAST(_nz AS DOUBLE) / 1e6) AS BIGINT) AS n_noisy
            FROM nz ORDER BY lang, source
        """,
        "fs_record_linkage": _fs_oracle_sql(20),

        "nelson_aalen_hazard": """
            WITH e AS (
                SELECT user_id, event_id, ts, epoch_us(ts) AS us,
                       LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pus
                FROM events
            ),
            s AS (
                SELECT user_id,
                       SUM(CASE WHEN pus IS NULL OR us - pus > 21600000000 THEN 1 ELSE 0 END)
                           OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sid,
                       ts
                FROM e
            ),
            ses AS (SELECT user_id, sid, COUNT(*) AS n_ev, MAX(epoch_us(ts)) AS last_us
                    FROM s GROUP BY 1, 2),
            mx AS (SELECT MAX(epoch_us(ts)) AS m FROM events),
            subj AS (SELECT n_ev AS t,
                            CASE WHEN m - last_us < 86400000000 THEN 0 ELSE 1 END AS ev
                     FROM ses CROSS JOIN mx),
            pt AS (SELECT t, CAST(SUM(ev) AS BIGINT) AS n_events,
                          CAST(SUM(1 - ev) AS BIGINT) AS n_censored
                   FROM subj GROUP BY 1),
            tot AS (SELECT CAST(SUM(n_events + n_censored) AS BIGINT) AS _n FROM pt),
            rk AS (SELECT t, n_events, n_censored,
                          CAST(_n - (SUM(n_events + n_censored)
                                     OVER (ORDER BY t ASC ROWS UNBOUNDED PRECEDING)
                                     - (n_events + n_censored)) AS BIGINT) AS n_at_risk
                   FROM pt CROSS JOIN tot),
            tm AS (SELECT t, n_at_risk, n_events, n_censored,
                          CAST(ROUND(CAST(n_events AS DOUBLE) / CAST(n_at_risk AS DOUBLE) * 1e12) AS BIGINT) AS ht,
                          CAST(ROUND(CAST(n_events AS DOUBLE) / (CAST(n_at_risk AS DOUBLE) * CAST(n_at_risk AS DOUBLE)) * 1e12) AS BIGINT) AS vt
                   FROM rk),
            cm AS (SELECT t, n_at_risk, n_events, n_censored,
                          CAST(SUM(ht) OVER (ORDER BY t ASC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS h,
                          CAST(SUM(vt) OVER (ORDER BY t ASC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS v
                   FROM tm)
            SELECT t, n_at_risk, n_events, n_censored,
                   ROUND(CAST(h AS DOUBLE) / 1e12, 6) AS cum_hazard,
                   ROUND(CAST(v AS DOUBLE) / 1e12, 6) AS var_hazard
            FROM cm ORDER BY t
        """,
        "corr_matrix_lineitem": """
            WITH base AS (
                SELECT CAST(ROUND(CAST(l_quantity AS DOUBLE) * 1) AS BIGINT) AS x0,
                       CAST(ROUND(CAST(l_extendedprice AS DOUBLE) * 100) AS BIGINT) AS x1,
                       CAST(ROUND(CAST(l_discount AS DOUBLE) * 100) AS BIGINT) AS x2,
                       CAST(ROUND(CAST(l_tax AS DOUBLE) * 100) AS BIGINT) AS x3
                FROM lineitem
                WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
                  AND l_discount IS NOT NULL AND l_tax IS NOT NULL
            ),
            m AS (
                SELECT CAST(count(*) AS BIGINT) AS n,
                       SUM(CAST(x0 AS HUGEINT)) AS s0, SUM(CAST(x0 AS HUGEINT) * x0) AS q0,
                       SUM(CAST(x1 AS HUGEINT)) AS s1, SUM(CAST(x1 AS HUGEINT) * x1) AS q1,
                       SUM(CAST(x2 AS HUGEINT)) AS s2, SUM(CAST(x2 AS HUGEINT) * x2) AS q2,
                       SUM(CAST(x3 AS HUGEINT)) AS s3, SUM(CAST(x3 AS HUGEINT) * x3) AS q3,
                       SUM(CAST(x0 AS HUGEINT) * x1) AS p01, SUM(CAST(x0 AS HUGEINT) * x2) AS p02,
                       SUM(CAST(x0 AS HUGEINT) * x3) AS p03, SUM(CAST(x1 AS HUGEINT) * x2) AS p12,
                       SUM(CAST(x1 AS HUGEINT) * x3) AS p13, SUM(CAST(x2 AS HUGEINT) * x3) AS p23
                FROM base
            ),
            pairs AS (
                SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b, n,
                       ROUND(CAST(n * p01 - s0 * s1 AS DOUBLE) /
                             (sqrt(CAST(n * q0 - s0 * s0 AS DOUBLE)) * sqrt(CAST(n * q1 - s1 * s1 AS DOUBLE))), 6) AS corr FROM m
                UNION ALL
                SELECT 'l_quantity', 'l_discount', n,
                       ROUND(CAST(n * p02 - s0 * s2 AS DOUBLE) /
                             (sqrt(CAST(n * q0 - s0 * s0 AS DOUBLE)) * sqrt(CAST(n * q2 - s2 * s2 AS DOUBLE))), 6) FROM m
                UNION ALL
                SELECT 'l_quantity', 'l_tax', n,
                       ROUND(CAST(n * p03 - s0 * s3 AS DOUBLE) /
                             (sqrt(CAST(n * q0 - s0 * s0 AS DOUBLE)) * sqrt(CAST(n * q3 - s3 * s3 AS DOUBLE))), 6) FROM m
                UNION ALL
                SELECT 'l_extendedprice', 'l_discount', n,
                       ROUND(CAST(n * p12 - s1 * s2 AS DOUBLE) /
                             (sqrt(CAST(n * q1 - s1 * s1 AS DOUBLE)) * sqrt(CAST(n * q2 - s2 * s2 AS DOUBLE))), 6) FROM m
                UNION ALL
                SELECT 'l_extendedprice', 'l_tax', n,
                       ROUND(CAST(n * p13 - s1 * s3 AS DOUBLE) /
                             (sqrt(CAST(n * q1 - s1 * s1 AS DOUBLE)) * sqrt(CAST(n * q3 - s3 * s3 AS DOUBLE))), 6) FROM m
                UNION ALL
                SELECT 'l_discount', 'l_tax', n,
                       ROUND(CAST(n * p23 - s2 * s3 AS DOUBLE) /
                             (sqrt(CAST(n * q2 - s2 * s2 AS DOUBLE)) * sqrt(CAST(n * q3 - s3 * s3 AS DOUBLE))), 6) FROM m
            )
            SELECT col_a, col_b, n, corr FROM pairs ORDER BY col_a, col_b
        """,
        "power_mde_nations": """
            WITH base AS (
                SELECT nt.n_name AS nation,
                       CAST(ROUND(CAST(o.o_totalprice AS DOUBLE) * 100) AS BIGINT) AS x
                FROM orders o
                JOIN customer c ON o.o_custkey = c.c_custkey
                JOIN nation nt ON c.c_nationkey = nt.n_nationkey
                WHERE o.o_totalprice IS NOT NULL
            ),
            g AS (
                SELECT nation, CAST(count(*) AS BIGINT) AS n,
                       SUM(CAST(x AS HUGEINT)) AS s,
                       SUM(CAST(x AS HUGEINT) * x) AS q
                FROM base GROUP BY 1 HAVING count(*) > 3
            )
            SELECT nation, n,
                   ROUND(CAST(s AS DOUBLE) / n / 100.0, 6) AS mean,
                   ROUND(sqrt(CAST(n * q - s * s AS DOUBLE)) / n / 100.0, 6) AS sigma,
                   ROUND((1.959963984540054 + 0.8416212335729143)
                         * sqrt(2.0 * (sqrt(CAST(n * q - s * s AS DOUBLE)) / n / 100.0)
                                    * (sqrt(CAST(n * q - s * s AS DOUBLE)) / n / 100.0)
                                / CAST(n // 2 AS DOUBLE)), 6) AS mde_abs,
                   CASE WHEN (CAST(s AS DOUBLE) / n / 100.0) <> 0.0 THEN
                       ROUND(((1.959963984540054 + 0.8416212335729143)
                              * sqrt(2.0 * (sqrt(CAST(n * q - s * s AS DOUBLE)) / n / 100.0)
                                         * (sqrt(CAST(n * q - s * s AS DOUBLE)) / n / 100.0)
                                     / CAST(n // 2 AS DOUBLE)))
                             / (CAST(s AS DOUBLE) / n / 100.0), 6)
                   END AS mde_rel
            FROM g ORDER BY nation
        """,
        "textrank_keywords": _textrank_oracle(3),

        "trainer_export_audit": """
            WITH base AS (
                SELECT 'tfrecord' AS format, CAST(count(*) AS BIGINT) AS n_records,
                       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_distinct_keys,
                       CAST(sum(length(text)) AS BIGINT) AS total_chars
                FROM documents
                UNION ALL
                SELECT 'webdataset', CAST(count(*) AS BIGINT),
                       CAST(count(DISTINCT doc_id) AS BIGINT),
                       CAST(sum(length(text)) AS BIGINT)
                FROM documents
            )
            SELECT format, n_records, n_distinct_keys, total_chars
            FROM base ORDER BY format
        """,

        "schema_drift_props": """
            WITH oldj AS (
                SELECT '{"k":' || json_extract_string(props, '$.k')
                       || CASE WHEN user_id % 3 = 0
                               THEN ',"u":"u' || CAST(user_id AS VARCHAR) || '"' ELSE '' END
                       || ',"legacy":"1"'
                       || ',"m":' || json_extract_string(props, '$.k')
                       || '}' AS js
                FROM events WHERE ts < TIMESTAMP '2024-01-16 00:00:00'
            ),
            newj AS (
                SELECT '{"k":' || json_extract_string(props, '$.k')
                       || CASE WHEN user_id % 3 = 0
                               THEN ',"u":"u' || CAST(user_id AS VARCHAR) || '"' ELSE '' END
                       || ',"newf":' || json_extract_string(props, '$.k')
                       || ',"m":"x' || json_extract_string(props, '$.k') || '"'
                       || '}' AS js
                FROM events WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'
            ),
            to_ AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tot FROM oldj WHERE js IS NOT NULL),
            tn_ AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tot FROM newj WHERE js IS NOT NULL),
            po AS (
                SELECT key, CAST(COUNT(*) AS BIGINT) AS n_old,
                       CAST(COUNT(CASE WHEN TRY_CAST(json_extract_string(js, '$.' || key) AS DOUBLE)
                                       IS NOT NULL THEN 1 END) AS BIGINT) AS num_old,
                       CAST(MAX(t.n_tot) AS BIGINT) AS tot_old
                FROM (SELECT js, unnest(json_keys(js)) AS key FROM oldj WHERE js IS NOT NULL)
                CROSS JOIN to_ t GROUP BY key
            ),
            pn AS (
                SELECT key, CAST(COUNT(*) AS BIGINT) AS n_new,
                       CAST(COUNT(CASE WHEN TRY_CAST(json_extract_string(js, '$.' || key) AS DOUBLE)
                                       IS NOT NULL THEN 1 END) AS BIGINT) AS num_new,
                       CAST(MAX(t.n_tot) AS BIGINT) AS tot_new
                FROM (SELECT js, unnest(json_keys(js)) AS key FROM newj WHERE js IS NOT NULL)
                CROSS JOIN tn_ t GROUP BY key
            ),
            j AS (SELECT * FROM po FULL OUTER JOIN pn USING (key)),
            typed AS (
                SELECT key,
                       COALESCE(n_old, 0) AS n_old_c, COALESCE(n_new, 0) AS n_new_c,
                       n_old, n_new,
                       CASE WHEN n_old IS NULL THEN NULL
                            WHEN 2 * num_old > n_old THEN 'numeric' ELSE 'string' END AS type_old,
                       CASE WHEN n_new IS NULL THEN NULL
                            WHEN 2 * num_new > n_new THEN 'numeric' ELSE 'string' END AS type_new,
                       CASE WHEN n_old IS NOT NULL THEN
                           ROUND(CAST(n_old AS DOUBLE) / CAST(tot_old AS DOUBLE), 6) END AS rate_old,
                       CASE WHEN n_new IS NOT NULL THEN
                           ROUND(CAST(n_new AS DOUBLE) / CAST(tot_new AS DOUBLE), 6) END AS rate_new,
                       CASE WHEN n_old IS NOT NULL THEN
                           CAST(ROUND(CAST(n_old AS DOUBLE) / CAST(tot_old AS DOUBLE) * 1e6) AS BIGINT) END AS rmo,
                       CASE WHEN n_new IS NOT NULL THEN
                           CAST(ROUND(CAST(n_new AS DOUBLE) / CAST(tot_new AS DOUBLE) * 1e6) AS BIGINT) END AS rmn
                FROM j
            )
            SELECT key, n_old_c AS n_old, n_new_c AS n_new, rate_old, rate_new,
                   type_old, type_new,
                   CASE WHEN n_old IS NULL THEN 'added'
                        WHEN n_new IS NULL THEN 'removed'
                        WHEN type_old <> type_new THEN 'type_changed'
                        WHEN abs(rmn - rmo) >= 50000 THEN 'rate_shift'
                        ELSE 'stable' END AS status
            FROM typed
            ORDER BY status, key
        """,

        "ivm_join": """
            WITH o AS (SELECT o_orderkey, o_custkey, o_totalprice FROM orders),
            deletes AS (SELECT o_orderkey FROM o WHERE o_orderkey % 10 = 0),
            updates AS (
                SELECT o_orderkey, o_custkey % 100 + 1 AS o_custkey,
                       CAST(o_totalprice AS DOUBLE) * 1.1 AS o_totalprice
                FROM o WHERE o_orderkey % 10 = 1
            ),
            inserts AS (
                SELECT o_orderkey + 10000000 AS o_orderkey, o_custkey,
                       CAST(o_totalprice AS DOUBLE) AS o_totalprice
                FROM o WHERE o_orderkey % 10 = 3
            ),
            applied AS (
                SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
                FROM o
                WHERE o_orderkey % 10 NOT IN (0, 1)
                UNION ALL SELECT * FROM updates
                UNION ALL SELECT * FROM inserts
            ),
            j AS (
                SELECT a.o_orderkey, a.o_totalprice, c.c_nationkey
                FROM applied a JOIN customer c ON a.o_custkey = c.c_custkey
            )
            SELECT c_nationkey,
                   CAST(count(*) AS BIGINT) AS n_orders,
                   CAST(SUM(CAST(ROUND(CAST(o_totalprice AS DOUBLE) * 100) AS BIGINT)) AS BIGINT) AS rev_cents
            FROM j GROUP BY 1 ORDER BY 1
        """,

        "join_size_estimate": """
            WITH counts AS (
                SELECT CAST(l_partkey AS VARCHAR) AS k, CAST(count(*) AS BIGINT) AS c
                FROM lineitem GROUP BY 1
            ),
            cells AS (
                SELECT d.d AS depth_i,
                       CAST(('0x' || substr(md5('cms' || d.d || '|' || k), 1, 15)) AS BIGINT) % 64 AS bucket,
                       CAST(SUM(c) AS BIGINT) AS bc
                FROM counts, (SELECT unnest([0, 1, 2]) AS d) d
                GROUP BY 1, 2
            ),
            ip AS (
                SELECT depth_i, CAST(SUM(CAST(a.bc AS HUGEINT) * b.bc) AS BIGINT) AS ipd
                FROM cells a JOIN cells b USING (depth_i, bucket)
                GROUP BY 1
            ),
            est AS (SELECT CAST(MIN(ipd) AS BIGINT) AS estimate FROM ip),
            ex AS (SELECT CAST(SUM(CAST(c AS HUGEINT) * c) AS BIGINT) AS exact_join_size FROM counts)
            SELECT exact_join_size, estimate,
                   ROUND((CAST(estimate AS DOUBLE) - CAST(exact_join_size AS DOUBLE))
                         / CAST(exact_join_size AS DOUBLE), 6) AS rel_error
            FROM ex CROSS JOIN est
        """,

        "twap_event_value": """
            WITH base AS (
                SELECT event_type,
                       CAST(ROUND(CAST(value AS DOUBLE) * 100) AS BIGINT) AS v,
                       epoch_us(ts) AS us
                FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
            ),
            led AS (
                SELECT event_type, v, us,
                       LEAD(us) OVER (PARTITION BY event_type ORDER BY us ASC, v ASC) AS nxt
                FROM base
            ),
            agg AS (
                SELECT event_type, CAST(count(*) AS BIGINT) AS n_samples,
                       CAST(min(us) AS BIGINT) AS t0, CAST(max(us) AS BIGINT) AS t1,
                       SUM(CASE WHEN nxt IS NOT NULL
                                THEN CAST(v AS HUGEINT) * (nxt - us)
                                ELSE CAST(0 AS HUGEINT) END) AS num,
                       SUM(CAST(v AS HUGEINT)) AS sv
                FROM led GROUP BY 1
            )
            SELECT event_type, n_samples,
                   ROUND(CAST(t1 - t0 AS DOUBLE) / 1e6, 6) AS span_seconds,
                   CASE WHEN t1 > t0 THEN
                       ROUND(CAST(num AS DOUBLE) / CAST(t1 - t0 AS DOUBLE) / 100.0, 6)
                   END AS twap,
                   ROUND(CAST(sv AS DOUBLE) / CAST(n_samples AS DOUBLE) / 100.0, 6) AS plain_avg
            FROM agg ORDER BY event_type
        """,

        "ohlc_daily": """
            WITH base AS (
                SELECT event_type,
                       -- floor-mod bucketing, exact-integer twin of the
                       -- Spark pmod form (DuckDB // and % truncate, so
                       -- the double-mod makes the remainder non-negative;
                       -- safe for pre-epoch timestamps on both engines)
                       (epoch_us(ts)
                        - ((epoch_us(ts) % 86400000000 + 86400000000) % 86400000000))
                       // 1000000 AS bkt,
                       epoch_us(ts) AS us,
                       CAST(value AS DOUBLE) AS v
                FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
            ),
            ranked AS (
                SELECT *,
                       row_number() OVER (PARTITION BY event_type, bkt ORDER BY us ASC, v ASC) AS ra,
                       row_number() OVER (PARTITION BY event_type, bkt ORDER BY us DESC, v DESC) AS rd
                FROM base
            )
            SELECT event_type,
                   CAST(to_timestamp(bkt) AS TIMESTAMP) AS bucket_start,
                   ROUND(MAX(CASE WHEN ra = 1 THEN v END), 6) AS open,
                   ROUND(MAX(v), 6) AS high,
                   ROUND(MIN(v), 6) AS low,
                   ROUND(MAX(CASE WHEN rd = 1 THEN v END), 6) AS close,
                   CAST(count(*) AS BIGINT) AS n_samples
            FROM ranked GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "kruskal_doclen": """
            WITH src AS (
                SELECT 'by_lang' AS split, lang AS g, CAST(n_chars AS BIGINT) AS v
                FROM documents WHERE n_chars IS NOT NULL
                UNION ALL
                SELECT 'by_source', source, CAST(n_chars AS BIGINT)
                FROM documents WHERE n_chars IS NOT NULL
            ),
            grid AS (SELECT split, v, count(*) AS c FROM src GROUP BY 1, 2),
            rg AS (
                -- doubled average tie rank from the value grid:
                -- r2 = 2*before + c + 1 (the spearman_corr identity)
                SELECT split, v,
                       2 * (SUM(c) OVER (PARTITION BY split ORDER BY v ASC
                                         ROWS UNBOUNDED PRECEDING) - c) + c + 1 AS r2
                FROM grid
            ),
            rj AS (
                SELECT s.split, s.g, r.r2
                FROM src s JOIN rg r ON s.split = r.split AND s.v = r.v
            ),
            per AS (
                SELECT split, g, count(*) AS ng, CAST(sum(r2) AS HUGEINT) AS s2
                FROM rj GROUP BY 1, 2
            ),
            ties AS (
                SELECT split, SUM(CAST(c AS HUGEINT) * c * c - c) AS tt
                FROM grid GROUP BY 1
            ),
            agg AS (
                SELECT split, CAST(count(*) AS BIGINT) AS k,
                       CAST(sum(ng) AS BIGINT) AS n,
                       SUM(CAST(ROUND(CAST(s2 * s2 AS DOUBLE) / CAST(ng AS DOUBLE)
                                      / 4.0 * 1e6) AS HUGEINT)) AS rat_u
                FROM per GROUP BY 1
            )
            SELECT split, k, n,
                   ROUND((12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)) *
                          (CAST(rat_u AS DOUBLE) / 1e6) - 3.0 * (CAST(n AS DOUBLE) + 1.0)),
                         6) AS h_stat,
                   ROUND((12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)) *
                          (CAST(rat_u AS DOUBLE) / 1e6) - 3.0 * (CAST(n AS DOUBLE) + 1.0)) /
                         (1.0 - CAST(tt AS DOUBLE) /
                          (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                           - CAST(n AS DOUBLE))),
                         6) AS h_tie_corrected
            FROM agg JOIN ties USING (split) ORDER BY split
        """,
        "levene_acctbal": """
            WITH rowsrc AS (
                SELECT c_mktsegment AS g,
                       CAST(ROUND(CAST(c_acctbal AS DOUBLE) * 100) AS BIGINT) AS x
                FROM customer WHERE c_acctbal IS NOT NULL
            ),
            means AS (
                SELECT g, CAST(ROUND(CAST(sum(x) AS DOUBLE) / CAST(count(1) AS DOUBLE)
                                     * 1e6) AS BIGINT) AS mu
                FROM rowsrc GROUP BY 1
            ),
            dev AS (
                SELECT r.g, abs(1000000 * r.x - m.mu) AS d
                FROM rowsrc r JOIN means m ON r.g = m.g
            ),
            grp AS (
                SELECT g, count(*) AS ng, CAST(sum(d) AS HUGEINT) AS sg,
                       SUM(CAST(d AS HUGEINT) * d) AS sxx
                FROM dev GROUP BY 1
            ),
            agg AS (
                SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(ng) AS BIGINT) AS n,
                       CAST(sum(sg) AS HUGEINT) AS s, CAST(sum(sxx) AS HUGEINT) AS xx,
                       SUM(CAST(ROUND(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
                                      / CAST(ng AS DOUBLE) / 1e6) AS DECIMAL(38,0))) AS rat_u
                FROM grp
            )
            SELECT k, n,
                   ROUND(((CAST(rat_u AS DOUBLE) * 1e6 -
                           CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                          / (CAST(k AS DOUBLE) - 1.0)) /
                         ((CAST(xx AS DOUBLE) - CAST(rat_u AS DOUBLE) * 1e6)
                          / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))),
                         6) AS w_stat
            FROM agg
        """,
        "ljung_box_daily": """
            WITH d AS (SELECT epoch_us(ts) // 86400000000 AS di, COUNT(*) AS x
                       FROM events GROUP BY 1),
            g AS (SELECT CAST(SUM(x) AS BIGINT) AS s, COUNT(*) AS n FROM d),
            dev AS (SELECT di, n * x - s AS dd FROM d CROSS JOIN g),
            den AS (SELECT SUM(CAST(dd AS HUGEINT) * dd) AS den FROM dev),
            lags AS (SELECT * FROM (VALUES (1), (2), (3), (4), (5), (6), (7)) AS l(lag)),
            pairs AS (
                SELECT l.lag, a.dd AS da, b.dd AS db
                FROM dev a JOIN lags l ON TRUE
                JOIN dev b ON b.di = a.di + l.lag
            ),
            num AS (SELECT lag, SUM(CAST(da AS HUGEINT) * db) AS num
                    FROM pairs GROUP BY 1),
            acf AS (
                SELECT lag, ROUND(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 12) AS acf
                FROM num CROSS JOIN den
            ),
            terms AS (
                SELECT CAST(ROUND(acf * acf / (CAST(n AS DOUBLE) - CAST(lag AS DOUBLE))
                                  * 1e12) AS BIGINT) AS t_u, n
                FROM acf CROSS JOIN g
            )
            SELECT CAST(n AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS m,
                   ROUND(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2.0) *
                         CAST(SUM(t_u) AS DOUBLE) / 1e12, 6) AS q_stat
            FROM terms GROUP BY n
        """,
        "ipw_ate_doclen": """
            WITH arms AS (
                SELECT lang AS s, (source = 'src1') AS t, CAST(n_chars AS BIGINT) AS y
                FROM documents WHERE n_chars IS NOT NULL
            ),
            cells AS (
                SELECT s, t, count(*) AS na, CAST(sum(y) AS BIGINT) AS sy
                FROM arms GROUP BY 1, 2
            ),
            per_s AS (
                SELECT s,
                       SUM(CASE WHEN t THEN na END) AS n1,
                       SUM(CASE WHEN NOT t THEN na END) AS n0,
                       SUM(CASE WHEN t THEN sy END) AS s1,
                       SUM(CASE WHEN NOT t THEN sy END) AS s0
                FROM cells GROUP BY 1
                HAVING SUM(CASE WHEN t THEN na END) IS NOT NULL
                   AND SUM(CASE WHEN NOT t THEN na END) IS NOT NULL
            ),
            agg AS (
                SELECT CAST(count(*) AS BIGINT) AS n_strata_used,
                       CAST(sum(n1 + n0) AS BIGINT) AS n,
                       CAST(sum(n1) AS BIGINT) AS n_treated,
                       SUM(CAST(CAST(ROUND((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                                 - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)) * 1e6)
                            AS BIGINT) AS HUGEINT) * (n1 + n0)) AS ate_u,
                       SUM(CAST(CAST(ROUND((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                                 - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)) * 1e6)
                            AS BIGINT) AS HUGEINT) * n1) AS att_u
                FROM per_s
            )
            SELECT n, n_treated, n_strata_used,
                   ROUND(CAST(ate_u AS DOUBLE) / CAST(n AS DOUBLE) / 1e6 / 1.0, 6) AS ate,
                   ROUND(CAST(att_u AS DOUBLE) / CAST(n_treated AS DOUBLE) / 1e6 / 1.0, 6) AS att
            FROM agg
        """,
        "ivm_join_b": """
            WITH c AS (SELECT c_custkey, c_nationkey FROM customer),
            updates AS (
                SELECT c_custkey, (c_nationkey + 7) % 25 AS c_nationkey
                FROM c WHERE c_custkey % 10 = 1
            ),
            inserts AS (
                SELECT c_custkey + 20000000 AS c_custkey, c_nationkey
                FROM c WHERE c_custkey % 10 = 3
            ),
            applied AS (
                SELECT c_custkey, c_nationkey FROM c
                WHERE c_custkey % 10 NOT IN (0, 1)
                UNION ALL SELECT * FROM updates
                UNION ALL SELECT * FROM inserts
            ),
            j AS (
                SELECT o.o_totalprice, a.c_nationkey
                FROM orders o JOIN applied a ON o.o_custkey = a.c_custkey
            )
            SELECT c_nationkey,
                   CAST(count(*) AS BIGINT) AS n_orders,
                   CAST(SUM(CAST(ROUND(CAST(o_totalprice AS DOUBLE) * 100) AS BIGINT)) AS BIGINT) AS rev_cents
            FROM j GROUP BY 1 ORDER BY 1
        """,
        "silhouette_labels": """
            WITH q AS (
                SELECT vec_id, label, i,
                       CAST(round(CAST(embedding[i] AS DOUBLE) * 1024.0) AS BIGINT) AS xq
                FROM embeddings, (SELECT unnest(range(1, 65)) AS i) d
            ),
            cent AS (
                SELECT label AS cg, i,
                       CAST(round(CAST(SUM(xq) AS DOUBLE) * 1024.0
                                  / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS cq
                FROM q GROUP BY 1, 2
            ),
            pairs AS (
                SELECT q.vec_id, q.label AS g, c.cg,
                       SUM((1024 * q.xq - c.cq) * (1024 * q.xq - c.cq)) AS d2
                FROM q JOIN cent c USING (i) GROUP BY 1, 2, 3
            ),
            per AS (
                SELECT vec_id, g,
                       MIN(CASE WHEN cg = g THEN d2 END) AS a2,
                       MIN(CASE WHEN cg <> g THEN d2 END) AS b2
                FROM pairs GROUP BY 1, 2
            ),
            su AS (
                SELECT g,
                       CAST(ROUND(CASE WHEN greatest(sqrt(CAST(a2 AS DOUBLE)),
                                                     sqrt(CAST(b2 AS DOUBLE))) = 0.0 THEN 0.0
                            ELSE (sqrt(CAST(b2 AS DOUBLE)) - sqrt(CAST(a2 AS DOUBLE))) /
                                 greatest(sqrt(CAST(a2 AS DOUBLE)), sqrt(CAST(b2 AS DOUBLE)))
                            END * 1e6) AS BIGINT) AS su
                FROM per
            )
            SELECT g AS label, CAST(count(*) AS BIGINT) AS n_vecs,
                   ROUND(CAST(SUM(su) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1e6, 6)
                       AS mean_silhouette
            FROM su GROUP BY 1 ORDER BY 1
        """,
        "rbo_rankings": _rbo_oracle_sql(),
        "pit_state_lookup": """
            WITH m AS (
                SELECT user_id, ts, event_type,
                       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts,
                       row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     - row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS island
                FROM events
            ),
            g AS (
                SELECT user_id, event_type, island, MIN(ts) AS valid_from,
                       MAX(next_ts) AS mx, COUNT(*) - COUNT(next_ts) AS op
                FROM m GROUP BY 1, 2, 3
            ),
            iv AS (
                SELECT user_id, event_type, valid_from,
                       CASE WHEN op > 0 THEN NULL ELSE mx END AS valid_to
                FROM g
            ),
            obs AS (
                SELECT user_id, ts + INTERVAL 30 MINUTE AS ots
                FROM events WHERE event_id % 10 = 7
            ),
            j AS (
                SELECT i.event_type
                FROM obs o LEFT JOIN iv i
                  ON o.user_id = i.user_id
                 AND o.ots >= i.valid_from
                 AND (i.valid_to IS NULL OR o.ots < i.valid_to)
            )
            SELECT event_type, CAST(count(*) AS BIGINT) AS n_obs
            FROM j GROUP BY 1 ORDER BY 1
        """,
        "heaps_law": r"""
            WITH base AS (
                SELECT doc_id AS d,
                       list_filter(regexp_split_to_array(lower(text), '\s+'),
                                   x -> x <> '') AS tk
                FROM documents WHERE text IS NOT NULL
            ),
            sh AS (
                -- word trigram shingles (1-based lists; count = len-2),
                -- docs too short to shingle drop out like the Spark side
                SELECT d, list_transform(range(1, len(tk) - 1),
                                         i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]) AS tk
                FROM base WHERE len(tk) >= 3
            ),
            -- cuts anchored to the observed [min, max] id range, in
            -- lockstep with text_analysis.heaps_law_fit
            mx AS (SELECT MIN(d) AS mn, MAX(d) AS m FROM sh),
            cuts AS (
                SELECT k, mn - 1 + GREATEST(1, ((m - mn + 1) * k) // 10) AS ck
                FROM mx, (SELECT unnest(range(1, 11)) AS k) s
            ),
            perdoc AS (SELECT d, len(tk) AS nt FROM sh),
            fs AS (
                SELECT t, MIN(d) AS fsd
                FROM (SELECT d, unnest(tk) AS t FROM sh) GROUP BY 1
            ),
            tvals AS (
                SELECT c.k, CAST(SUM(CASE WHEN p.d <= c.ck THEN p.nt ELSE 0 END) AS BIGINT) AS t
                FROM cuts c CROSS JOIN perdoc p GROUP BY 1
            ),
            vvals AS (
                SELECT c.k, CAST(SUM(CASE WHEN f.fsd <= c.ck THEN 1 ELSE 0 END) AS BIGINT) AS v
                FROM cuts c CROSS JOIN fs f GROUP BY 1
            ),
            pts AS (
                SELECT CAST(ROUND(ln(CAST(t AS DOUBLE)) * 1e6) AS BIGINT) AS x,
                       CAST(ROUND(ln(CAST(v AS DOUBLE)) * 1e6) AS BIGINT) AS y,
                       t, v
                FROM tvals JOIN vvals USING (k) WHERE t > 0 AND v > 0
            ),
            mom AS (
                SELECT CAST(count(*) AS BIGINT) AS n,
                       CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
                       CAST(SUM(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
                       SUM(CAST(x AS HUGEINT) * x) AS sxx,
                       SUM(CAST(x AS HUGEINT) * y) AS sxy,
                       SUM(CAST(y AS HUGEINT) * y) AS syy,
                       CAST(MAX(t) AS BIGINT) AS total_tokens,
                       CAST(MAX(v) AS BIGINT) AS vocab_size
                FROM pts
            ),
            -- grouped_ols double tree: scaled moments, one division per
            -- output (mirrors analytics.grouped_ols verbatim)
            sc AS (
                SELECT n, total_tokens, vocab_size,
                       CAST(n AS DOUBLE) AS nd,
                       CAST(sx AS DOUBLE) / 1e6 AS sxd,
                       CAST(sy AS DOUBLE) / 1e6 AS syd,
                       CAST(sxx AS DOUBLE) / 1e12 AS sxxd,
                       CAST(sxy AS DOUBLE) / 1e12 AS sxyd,
                       CAST(syy AS DOUBLE) / 1e12 AS syyd
                FROM mom
            )
            SELECT n AS n_points, total_tokens, vocab_size,
                   ROUND((nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd), 6) AS beta,
                   ROUND((syd - ((nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd)) * sxd) / nd, 6) AS ln_k,
                   ROUND(((nd * sxyd - sxd * syd) * (nd * sxyd - sxd * syd)) /
                         ((nd * sxxd - sxd * sxd) * (nd * syyd - syd * syd)), 6) AS r2
            FROM sc
        """,
        "ipf_mixture": _ipf_oracle_sql(10),
        "mann_whitney_doclen": _mw_oracle_sql(),
        "dunn_doclen": _dunn_oracle_sql(),
        "holt_winters_daily": _hw_oracle_sql(7),
        "holt_winters_mult_daily": _hw_mult_oracle_sql(7),
        "pacf_daily": _pacf_oracle_sql(7),
        "kendall_chars_tokens": """
            WITH cells AS (
                SELECT CAST(ROUND(CAST(n_chars AS DOUBLE)) AS BIGINT) AS x,
                       CAST(ROUND(CAST(len(list_filter(
                           regexp_split_to_array(lower(text), '\\s+'),
                           s -> s <> '')) AS DOUBLE)) AS BIGINT) AS y,
                       count(*) AS c
                FROM documents
                WHERE n_chars IS NOT NULL AND text IS NOT NULL
                GROUP BY 1, 2
            ),
            xs AS (SELECT DISTINCT x FROM cells),
            ys AS (SELECT DISTINCT y FROM cells),
            dense AS (
                SELECT xs.x, ys.y, COALESCE(cells.c, 0) AS c
                FROM xs CROSS JOIN ys
                LEFT JOIN cells ON cells.x = xs.x AND cells.y = ys.y
            ),
            sy AS (
                SELECT x, y, c,
                       COALESCE(SUM(c) OVER (PARTITION BY x ORDER BY y DESC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS sy_,
                       COALESCE(SUM(c) OVER (PARTITION BY x ORDER BY y ASC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS py_
                FROM dense
            ),
            gg AS (
                SELECT x, y, c,
                       COALESCE(SUM(sy_) OVER (PARTITION BY y ORDER BY x DESC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS gg_,
                       COALESCE(SUM(py_) OVER (PARTITION BY y ORDER BY x DESC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS gl_
                FROM sy
            ),
            cd AS (
                SELECT SUM(CAST(c AS HUGEINT) * gg_) AS conc,
                       SUM(CAST(c AS HUGEINT) * gl_) AS disc,
                       CAST(SUM(c) AS BIGINT) AS n
                FROM gg
            ),
            t1 AS (SELECT SUM(CAST(t AS HUGEINT) * (t - 1)) AS n1x2
                   FROM (SELECT SUM(c) AS t FROM cells GROUP BY x)),
            t2 AS (SELECT SUM(CAST(t AS HUGEINT) * (t - 1)) AS n2x2
                   FROM (SELECT SUM(c) AS t FROM cells GROUP BY y))
            SELECT n,
                   CAST(CAST(n AS HUGEINT) * (n - 1) / 2 AS BIGINT) AS n_pairs,
                   CAST(conc AS BIGINT) AS concordant,
                   CAST(disc AS BIGINT) AS discordant,
                   ROUND(2.0 * (CAST(conc AS DOUBLE) - CAST(disc AS DOUBLE)) /
                         sqrt(CAST(CAST(n AS HUGEINT) * (n - 1) - n1x2 AS DOUBLE)
                              * CAST(CAST(n AS HUGEINT) * (n - 1) - n2x2 AS DOUBLE)), 6) AS tau_b
            FROM cd CROSS JOIN t1 CROSS JOIN t2
        """,
        "cochran_priority_trend": _cochran_oracle_sql(),
        "cmh_lang_exposure": _cmh_oracle_sql(),
        "friedman_dow_types": _friedman_oracle_sql(),
        "brown_forsythe_acctbal": """
            WITH rowsrc AS (
                SELECT c_mktsegment AS g,
                       CAST(ROUND(CAST(c_acctbal AS DOUBLE) * 100) AS BIGINT) AS x
                FROM customer WHERE c_acctbal IS NOT NULL
            ),
            grid AS (SELECT g, x, count(*) AS c FROM rowsrc GROUP BY 1, 2),
            rk AS (
                SELECT g, x,
                       SUM(c) OVER (PARTITION BY g ORDER BY x ASC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                       SUM(c) OVER (PARTITION BY g) AS n
                FROM grid
            ),
            med AS (SELECT g, MIN(x) AS mdn FROM rk WHERE cum * 2 >= n GROUP BY 1),
            dev AS (
                SELECT r.g, abs(r.x - m.mdn) AS d
                FROM rowsrc r JOIN med m ON r.g = m.g
            ),
            grp AS (
                SELECT g, count(*) AS ng, CAST(sum(d) AS HUGEINT) AS sg,
                       SUM(CAST(d AS HUGEINT) * d) AS sxx
                FROM dev GROUP BY 1
            ),
            agg AS (
                SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(ng) AS BIGINT) AS n,
                       CAST(sum(sg) AS HUGEINT) AS s, CAST(sum(sxx) AS HUGEINT) AS xx,
                       SUM(CAST(ROUND(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
                                      / CAST(ng AS DOUBLE) * 1e6) AS DECIMAL(38,0))) AS rat_u
                FROM grp
            )
            SELECT k, n,
                   ROUND(((CAST(rat_u AS DOUBLE) / 1e6 -
                           CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                          / (CAST(k AS DOUBLE) - 1.0)) /
                         ((CAST(xx AS DOUBLE) - CAST(rat_u AS DOUBLE) / 1e6)
                          / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))),
                         6) AS w_stat
            FROM agg
        """,
        "seasonal_mk_daily": (
            _smk_oracle_series_sql("x0", "raw")
            + "\n            UNION ALL\n"
            + _smk_oracle_series_sql(
                "x0 + CASE WHEN di >= dmin + 20 THEN x0 // 2 ELSE 0 END", "uplifted"
            )
        ),
        "partial_corr_user_activity": _pcorr_oracle_sql(),
        "ad_price_drift": """
            WITH rowsrc AS (
                SELECT o_orderstatus AS st,
                       CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
                FROM orders WHERE o_orderstatus IN ('F', 'O')
            ),
            per_v AS (
                SELECT v,
                       SUM(CASE WHEN st = 'F' THEN 1 ELSE 0 END) AS ca,
                       SUM(CASE WHEN st = 'O' THEN 1 ELSE 0 END) AS cb
                FROM rowsrc GROUP BY 1
            ),
            cum AS (
                SELECT v, ca, cb, ca + cb AS lv,
                       SUM(ca) OVER (ORDER BY v ASC ROWS UNBOUNDED PRECEDING) AS cum_a,
                       SUM(cb) OVER (ORDER BY v ASC ROWS UNBOUNDED PRECEDING) AS cum_b
                FROM per_v
            ),
            tot AS (SELECT SUM(ca) AS n_a, SUM(cb) AS n_b FROM per_v),
            terms AS (
                SELECT n_a, n_b,
                       CASE WHEN (CAST(2 * (cum_a + cum_b) - lv AS HUGEINT)
                                  * (2 * (n_a + n_b) - (2 * (cum_a + cum_b) - lv))
                                  - CAST(n_a + n_b AS HUGEINT) * lv) <= 0 THEN CAST(0 AS BIGINT)
                            ELSE CAST(ROUND(CAST(lv AS DOUBLE)
                                 * CAST(CAST(n_a + n_b AS HUGEINT) * (2 * cum_a - ca)
                                        - CAST(n_a AS HUGEINT) * (2 * (cum_a + cum_b) - lv) AS DOUBLE)
                                 * CAST(CAST(n_a + n_b AS HUGEINT) * (2 * cum_a - ca)
                                        - CAST(n_a AS HUGEINT) * (2 * (cum_a + cum_b) - lv) AS DOUBLE)
                                 / (CAST(n_a AS DOUBLE) * CAST(n_a + n_b AS DOUBLE)
                                    * CAST(CAST(2 * (cum_a + cum_b) - lv AS HUGEINT)
                                           * (2 * (n_a + n_b) - (2 * (cum_a + cum_b) - lv))
                                           - CAST(n_a + n_b AS HUGEINT) * lv AS DOUBLE))
                                 * 1e12) AS BIGINT) END AS ta,
                       CASE WHEN (CAST(2 * (cum_a + cum_b) - lv AS HUGEINT)
                                  * (2 * (n_a + n_b) - (2 * (cum_a + cum_b) - lv))
                                  - CAST(n_a + n_b AS HUGEINT) * lv) <= 0 THEN CAST(0 AS BIGINT)
                            ELSE CAST(ROUND(CAST(lv AS DOUBLE)
                                 * CAST(CAST(n_a + n_b AS HUGEINT) * (2 * cum_b - cb)
                                        - CAST(n_b AS HUGEINT) * (2 * (cum_a + cum_b) - lv) AS DOUBLE)
                                 * CAST(CAST(n_a + n_b AS HUGEINT) * (2 * cum_b - cb)
                                        - CAST(n_b AS HUGEINT) * (2 * (cum_a + cum_b) - lv) AS DOUBLE)
                                 / (CAST(n_b AS DOUBLE) * CAST(n_a + n_b AS DOUBLE)
                                    * CAST(CAST(2 * (cum_a + cum_b) - lv AS HUGEINT)
                                           * (2 * (n_a + n_b) - (2 * (cum_a + cum_b) - lv))
                                           - CAST(n_a + n_b AS HUGEINT) * lv AS DOUBLE))
                                 * 1e12) AS BIGINT) END AS tb
                FROM cum CROSS JOIN tot
            ),
            agg AS (
                SELECT MAX(n_a) AS n_a, MAX(n_b) AS n_b,
                       SUM(ta) AS sta, SUM(tb) AS stb
                FROM terms
            )
            SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
                   ROUND((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) - 1.0)
                         / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
                         * (CAST(sta AS DOUBLE) + CAST(stb AS DOUBLE)) / 1e12, 6) AS ad_stat
            FROM agg
        """,
        "bartlett_acctbal": """
            WITH rowsrc AS (
                SELECT c_mktsegment AS g,
                       CAST(ROUND(CAST(c_acctbal AS DOUBLE) * 100) AS BIGINT) AS v
                FROM customer
                WHERE c_mktsegment IS NOT NULL AND c_acctbal IS NOT NULL
            ),
            per_g AS (
                SELECT g, COUNT(*) AS n,
                       SUM(CAST(v AS HUGEINT)) AS s1,
                       SUM(CAST(v AS HUGEINT) * v) AS s2
                FROM rowsrc GROUP BY 1 HAVING COUNT(*) >= 2
            ),
            terms AS (
                SELECT n, s2,
                       CASE WHEN ((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE)) <= 0 THEN CAST(0 AS DECIMAL(38,0)) ELSE
                       CAST(ROUND(CAST(n - 1 AS DOUBLE) * ln(((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE))) * 1e12) AS DECIMAL(38,0)) END AS tln,
                       CASE WHEN ((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE)) <= 0 THEN 0 ELSE 1 END AS ok,
                       CAST(ROUND(CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                                  / CAST(n AS DOUBLE) * 1e6) AS DECIMAL(38,0)) AS qss,
                       CAST(ROUND(1e12 / CAST(n - 1 AS DOUBLE)) AS BIGINT) AS qinv
                FROM per_g
            ),
            agg AS (
                SELECT COUNT(*) AS k, SUM(n) AS n, SUM(s2) AS sums2,
                       SUM(qss) AS sqss, SUM(tln) AS sln, SUM(qinv) AS sinv,
                       MIN(ok) AS allok
                FROM terms
            )
            SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
                   CASE WHEN allok = 0 OR k < 2 OR n <= k OR ((CAST(sums2 AS DOUBLE) - CAST(sqss AS DOUBLE) / 1e6) / CAST(n - k AS DOUBLE)) <= 0 THEN NULL ELSE
                   ROUND((CAST(n - k AS DOUBLE) * ln(((CAST(sums2 AS DOUBLE) - CAST(sqss AS DOUBLE) / 1e6) / CAST(n - k AS DOUBLE))) - CAST(sln AS DOUBLE) / 1e12)
                         / (1.0 + (CAST(sinv AS DOUBLE) / 1e12 - 1.0 / CAST(n - k AS DOUBLE))
                            / (3.0 * (CAST(k AS DOUBLE) - 1.0))), 6) END AS bartlett_stat
            FROM agg
        """,
        "mood_median_doclen": """
            WITH rowsrc AS (
                SELECT lang AS g, CAST(n_chars AS BIGINT) AS v
                FROM documents WHERE lang IS NOT NULL AND n_chars IS NOT NULL
            ),
            cells AS (SELECT g, v, COUNT(*) AS c FROM rowsrc GROUP BY 1, 2),
            vals AS (SELECT v, SUM(c) AS lv FROM cells GROUP BY 1),
            pooled AS (
                SELECT v, SUM(lv) OVER (ORDER BY v ASC ROWS UNBOUNDED PRECEDING) AS cum
                FROM vals
            ),
            tot AS (SELECT SUM(c) AS n FROM cells),
            med AS (
                SELECT MIN(v) AS gm FROM pooled CROSS JOIN tot
                WHERE cum >= (n + 1) // 2
            ),
            per_g AS (
                SELECT g, SUM(CASE WHEN v > gm THEN c ELSE 0 END) AS a,
                       SUM(c) AS tot_g
                FROM cells CROSS JOIN med GROUP BY 1
            ),
            marg AS (
                SELECT SUM(a) AS ra, SUM(tot_g - a) AS rb, SUM(tot_g) AS n,
                       COUNT(*) AS k
                FROM per_g
            ),
            agg AS (
                SELECT MAX(k) AS k, MAX(n) AS n,
                       MIN(CASE WHEN ra = 0 OR rb = 0 THEN 0 ELSE 1 END) AS ok,
                       SUM(CASE WHEN ra = 0 OR rb = 0 THEN CAST(0 AS BIGINT) ELSE
                           (CAST(ROUND((CAST(a AS DOUBLE) - (CAST(tot_g AS DOUBLE) * CAST(ra AS DOUBLE) / CAST(n AS DOUBLE))) * (CAST(a AS DOUBLE) - (CAST(tot_g AS DOUBLE) * CAST(ra AS DOUBLE) / CAST(n AS DOUBLE))) / (CAST(tot_g AS DOUBLE) * CAST(ra AS DOUBLE) / CAST(n AS DOUBLE)) * 1e12) AS BIGINT)
                            + CAST(ROUND((CAST(tot_g - a AS DOUBLE) - (CAST(tot_g AS DOUBLE) * CAST(rb AS DOUBLE) / CAST(n AS DOUBLE))) * (CAST(tot_g - a AS DOUBLE) - (CAST(tot_g AS DOUBLE) * CAST(rb AS DOUBLE) / CAST(n AS DOUBLE))) / (CAST(tot_g AS DOUBLE) * CAST(rb AS DOUBLE) / CAST(n AS DOUBLE)) * 1e12) AS BIGINT)) END) AS s
                FROM per_g CROSS JOIN marg
            )
            SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
                   (SELECT CAST(gm AS BIGINT) FROM med) AS grand_median,
                   CASE WHEN ok = 0 THEN NULL ELSE ROUND(CAST(s AS DOUBLE) / 1e12, 6) END AS chi2,
                   CAST(k - 1 AS BIGINT) AS dof
            FROM agg
        """,
        "durbin_watson_daily": """
            WITH d AS (
                SELECT epoch_us(ts) // 86400000000 AS di, COUNT(*) AS y
                FROM events GROUP BY 1
            ),
            l AS (SELECT y, y - LAG(y) OVER (ORDER BY di ASC) AS dd FROM d),
            agg AS (
                SELECT COUNT(*) AS n,
                       SUM(CAST(y AS HUGEINT)) AS s1,
                       SUM(CAST(y AS HUGEINT) * y) AS s2,
                       SUM(CAST(dd AS HUGEINT) * dd) AS num
                FROM l
            )
            SELECT CAST(n AS BIGINT) AS n,
                   CASE WHEN n < 2 OR (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) <= 0 THEN NULL ELSE
                   ROUND(CAST(num AS DOUBLE) / (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)), 6) END AS dw_stat
            FROM agg
        """,
        "runs_daily": """
            WITH d AS (
                SELECT epoch_us(ts) // 86400000000 AS di, COUNT(*) AS y
                FROM events GROUP BY 1
            ),
            tot AS (SELECT COUNT(*) AS nn FROM d),
            grid AS (SELECT y, COUNT(*) AS c FROM d GROUP BY 1),
            cumg AS (
                SELECT y, SUM(c) OVER (ORDER BY y ASC ROWS UNBOUNDED PRECEDING) AS cum
                FROM grid
            ),
            med AS (
                SELECT MIN(y) AS m FROM cumg CROSS JOIN tot
                WHERE cum >= (nn + 1) // 2
            ),
            s AS (
                SELECT di, CAST(y > m AS INT) AS sg FROM d CROSS JOIN med
                WHERE y <> m
            ),
            f AS (
                SELECT sg,
                       CASE WHEN LAG(sg) OVER (ORDER BY di ASC) IS NULL
                                 OR LAG(sg) OVER (ORDER BY di ASC) <> sg
                            THEN 1 ELSE 0 END AS chg
                FROM s
            ),
            agg AS (
                SELECT COUNT(*) AS n, SUM(sg) AS n_above,
                       SUM(1 - sg) AS n_below, SUM(chg) AS runs
                FROM f
            )
            SELECT CAST(n AS BIGINT) AS n, CAST(n_above AS BIGINT) AS n_above,
                   CAST(n_below AS BIGINT) AS n_below, CAST(runs AS BIGINT) AS runs,
                   CASE WHEN n_above = 0 OR n_below = 0 OR n < 2 OR (2.0 * CAST((CAST(n_above AS HUGEINT) * n_below) AS DOUBLE) * (2.0 * CAST((CAST(n_above AS HUGEINT) * n_below) AS DOUBLE) - CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) <= 0 THEN NULL ELSE
                   ROUND((CAST(runs AS DOUBLE) - (2.0 * CAST((CAST(n_above AS HUGEINT) * n_below) AS DOUBLE) / CAST(n AS DOUBLE) + 1.0)) / sqrt((2.0 * CAST((CAST(n_above AS HUGEINT) * n_below) AS DOUBLE) * (2.0 * CAST((CAST(n_above AS HUGEINT) * n_below) AS DOUBLE) - CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))), 6) END AS z
            FROM agg
        """,
        "page_week_dow": (
            _page_oracle_series_sql("x0", "raw")
            + "\n            UNION ALL\n"
            + _page_oracle_series_sql("(x0 * (10 + (di % 7))) // 10", "uplifted")
            + "\n            ORDER BY series"
        ),
        "page_hinkley_daily": (
            _ph_oracle_series_sql("x0", "raw")
            + "\n            UNION ALL\n"
            + _ph_oracle_series_sql(
                "CASE WHEN di >= mid THEN (x0 * 3) // 2 ELSE x0 END", "shifted"
            )
            + "\n            ORDER BY series"
        ),
        "cochran_q_dow_types": """
            WITH daily AS (
                SELECT epoch_us(ts) // 86400000000 AS di,
                       CAST(event_type AS VARCHAR) AS t,
                       CAST(COUNT(*) AS BIGINT) AS x
                FROM events GROUP BY 1, 2
            ),
            grid AS (SELECT t, x, COUNT(*) AS c FROM daily GROUP BY 1, 2),
            rk AS (
                SELECT t, x,
                       SUM(c) OVER (PARTITION BY t ORDER BY x ASC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                       SUM(c) OVER (PARTITION BY t) AS nt
                FROM grid
            ),
            med AS (SELECT t, MIN(x) AS med FROM rk WHERE cum * 2 >= nt GROUP BY 1),
            flags AS (
                SELECT d.di, d.t, CAST(d.x > m.med AS INT) AS f
                FROM daily d JOIN med m ON d.t = m.t
            ),
            kt AS (SELECT COUNT(DISTINCT t) AS k_total FROM flags),
            full_blocks AS (
                SELECT di FROM flags GROUP BY di
                HAVING COUNT(DISTINCT t) = (SELECT k_total FROM kt)
            ),
            rows_ AS (
                SELECT f.di, f.t, f.f FROM flags f
                SEMI JOIN full_blocks fb ON f.di = fb.di
            ),
            gt AS (
                SELECT COUNT(*) AS k,
                       SUM(CAST(g AS HUGEINT)) AS sg,
                       SUM(CAST(g AS HUGEINT) * g) AS sg2
                FROM (SELECT t, SUM(f) AS g FROM rows_ GROUP BY 1)
            ),
            bt AS (
                SELECT COUNT(*) AS n_blocks,
                       SUM(CAST(l AS HUGEINT)) AS sl,
                       SUM(CAST(l AS HUGEINT) * l) AS sl2
                FROM (SELECT di, SUM(f) AS l FROM rows_ GROUP BY 1)
            )
            SELECT CAST(k AS BIGINT) AS k, CAST(n_blocks AS BIGINT) AS n_blocks,
                   CASE WHEN k < 2 OR n_blocks = 0 OR (CAST(k AS DOUBLE) * CAST(sl AS DOUBLE) - CAST(sl2 AS DOUBLE)) <= 0 THEN NULL ELSE
                   ROUND(((CAST(k AS DOUBLE) - 1.0) * (CAST(k AS DOUBLE) * CAST(sg2 AS DOUBLE) - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)) / (CAST(k AS DOUBLE) * CAST(sl AS DOUBLE) - CAST(sl2 AS DOUBLE))), 6) END AS q_stat,
                   CAST(k - 1 AS BIGINT) AS dof
            FROM gt CROSS JOIN bt
        """,
        "lilliefors_profiles": (
            _lilliefors_oracle_series_sql(
                "SELECT COUNT(*) AS v FROM events GROUP BY epoch_us(ts) // 86400000000",
                "daily_volume",
            )
            + "\n            UNION ALL\n"
            + _lilliefors_oracle_series_sql(
                "SELECT CAST(n_chars AS BIGINT) AS v FROM documents WHERE n_chars IS NOT NULL",
                "doc_length",
            )
            + "\n            ORDER BY series"
        ),
        "cronbach_dow_types": """
            WITH cells AS (
                SELECT epoch_us(ts) // 86400000000 AS di,
                       CAST(event_type AS VARCHAR) AS t,
                       SUM(1) AS x
                FROM events GROUP BY 1, 2
            ),
            nobs AS (SELECT COUNT(DISTINCT di) AS n FROM cells),
            per_item AS (
                SELECT t, SUM(CAST(x AS HUGEINT)) AS s1,
                       SUM(CAST(x AS HUGEINT) * x) AS s2
                FROM cells GROUP BY 1
            ),
            items AS (
                SELECT COUNT(*) AS k,
                       SUM(CAST(ROUND(((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST((SELECT n FROM nobs) AS DOUBLE)) / (CAST((SELECT n FROM nobs) AS DOUBLE) - 1.0)) * 1e12) AS HUGEINT)) AS sv
                FROM per_item
            ),
            totals AS (
                SELECT SUM(CAST(td AS HUGEINT)) AS t1,
                       SUM(CAST(td AS HUGEINT) * td) AS t2
                FROM (SELECT di, SUM(x) AS td FROM cells GROUP BY 1)
            )
            SELECT CAST(k AS BIGINT) AS k,
                   CAST((SELECT n FROM nobs) AS BIGINT) AS n_obs,
                   CASE WHEN k < 2 OR (SELECT n FROM nobs) < 2 OR (((CAST(t2 AS DOUBLE) - CAST(t1 AS DOUBLE) * CAST(t1 AS DOUBLE) / CAST((SELECT n FROM nobs) AS DOUBLE)) / (CAST((SELECT n FROM nobs) AS DOUBLE) - 1.0))) <= 0 THEN NULL
                   ELSE ROUND((CAST(k AS DOUBLE) / (CAST(k AS DOUBLE) - 1.0) * (1.0 - (CAST(sv AS DOUBLE) / 1e12) / (((CAST(t2 AS DOUBLE) - CAST(t1 AS DOUBLE) * CAST(t1 AS DOUBLE) / CAST((SELECT n FROM nobs) AS DOUBLE)) / (CAST((SELECT n FROM nobs) AS DOUBLE) - 1.0))))), 6) END AS alpha
            FROM items CROSS JOIN totals
        """,
        "kendall_w_dow_types": """
            WITH daily AS (
                SELECT CAST(epoch_us(ts) // 86400000000 AS VARCHAR) AS b,
                       CAST(event_type AS VARCHAR) AS t,
                       CAST(COUNT(*) AS BIGINT) AS v
                FROM events GROUP BY 1, 2
            ),
            kt AS (SELECT COUNT(DISTINCT t) AS k_total FROM daily),
            full_blocks AS (
                SELECT b FROM daily GROUP BY b
                HAVING COUNT(DISTINCT t) = (SELECT k_total FROM kt)
            ),
            rows_ AS (
                SELECT d.b, d.t, d.v FROM daily d
                SEMI JOIN full_blocks fb ON d.b = fb.b
            ),
            grid AS (SELECT b, v, COUNT(*) AS c FROM rows_ GROUP BY 1, 2),
            rg AS (
                SELECT b, v, c,
                       2 * COALESCE(SUM(c) OVER (PARTITION BY b ORDER BY v ASC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       + c + 1 AS r2
                FROM grid
            ),
            ranked AS (
                SELECT r.b, r.t, g.r2 FROM rows_ r
                JOIN rg g ON r.b = g.b AND r.v = g.v
            ),
            per_t AS (SELECT t, SUM(CAST(r2 AS HUGEINT)) AS R2 FROM ranked GROUP BY 1),
            ties AS (
                SELECT COALESCE(SUM(CAST(c AS HUGEINT) * c * c - c), 0) AS tt,
                       COUNT(DISTINCT b) AS n_blocks
                FROM grid
            ),
            agg AS (
                SELECT COUNT(*) AS k,
                       SUM(CAST(R2 AS HUGEINT) * R2) AS sq2,
                       SUM(R2) AS sum2
                FROM per_t
            )
            SELECT CAST(k AS BIGINT) AS k, CAST(n_blocks AS BIGINT) AS n_blocks,
                   CASE WHEN k < 2 OR n_blocks = 0 OR (CAST(n_blocks AS DOUBLE) * CAST(n_blocks AS DOUBLE) * (CAST(k AS DOUBLE) * CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - CAST(k AS DOUBLE)) - CAST(n_blocks AS DOUBLE) * CAST(tt AS DOUBLE)) <= 0 THEN NULL ELSE
                   ROUND((3.0 * (CAST(sq2 AS DOUBLE) - 2.0 * CAST(n_blocks AS DOUBLE) * (CAST(k AS DOUBLE) + 1.0) * CAST(sum2 AS DOUBLE) + CAST(k AS DOUBLE) * CAST(n_blocks AS DOUBLE) * (CAST(k AS DOUBLE) + 1.0) * CAST(n_blocks AS DOUBLE) * (CAST(k AS DOUBLE) + 1.0)) / (CAST(n_blocks AS DOUBLE) * CAST(n_blocks AS DOUBLE) * (CAST(k AS DOUBLE) * CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - CAST(k AS DOUBLE)) - CAST(n_blocks AS DOUBLE) * CAST(tt AS DOUBLE))), 6) END AS w,
                   CASE WHEN k < 2 OR n_blocks = 0 OR (CAST(n_blocks AS DOUBLE) * CAST(n_blocks AS DOUBLE) * (CAST(k AS DOUBLE) * CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - CAST(k AS DOUBLE)) - CAST(n_blocks AS DOUBLE) * CAST(tt AS DOUBLE)) <= 0 THEN NULL ELSE
                   ROUND(CAST(n_blocks AS DOUBLE) * (CAST(k AS DOUBLE) - 1.0) * (3.0 * (CAST(sq2 AS DOUBLE) - 2.0 * CAST(n_blocks AS DOUBLE) * (CAST(k AS DOUBLE) + 1.0) * CAST(sum2 AS DOUBLE) + CAST(k AS DOUBLE) * CAST(n_blocks AS DOUBLE) * (CAST(k AS DOUBLE) + 1.0) * CAST(n_blocks AS DOUBLE) * (CAST(k AS DOUBLE) + 1.0)) / (CAST(n_blocks AS DOUBLE) * CAST(n_blocks AS DOUBLE) * (CAST(k AS DOUBLE) * CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - CAST(k AS DOUBLE)) - CAST(n_blocks AS DOUBLE) * CAST(tt AS DOUBLE))), 6) END AS chi2
            FROM agg CROSS JOIN ties
        """,
        "theta_daily": _theta_oracle_sql(0.5),
        "wilcoxon_wow_daily": """
            WITH d AS (
                SELECT epoch_us(ts) // 86400000000 AS di, COUNT(*) AS y
                FROM events GROUP BY 1
            ),
            pairs AS (
                SELECT a.y - b.y AS dd FROM d a JOIN d b ON a.di = b.di + 7
                WHERE a.y - b.y <> 0
            ),
            cells AS (
                SELECT abs(dd) AS av,
                       SUM(CASE WHEN dd > 0 THEN 1 ELSE 0 END) AS cpos,
                       COUNT(*) AS c
                FROM pairs GROUP BY 1
            ),
            rk AS (
                SELECT av, cpos, c,
                       2 * COALESCE(SUM(c) OVER (ORDER BY av ASC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       + c + 1 AS r2
                FROM cells
            ),
            agg AS (
                SELECT SUM(c) AS n,
                       SUM(CAST(cpos AS HUGEINT) * r2) AS w2,
                       SUM(CAST(c AS HUGEINT) * c * c - c) AS tie
                FROM rk
            )
            SELECT CAST(COALESCE(n, 0) AS BIGINT) AS n,
                   CAST(w2 AS DOUBLE) / 2.0 AS w_plus,
                   CASE WHEN n IS NULL OR n = 0 OR (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0) * (2.0 * CAST(n AS DOUBLE) + 1.0) / 24.0 - CAST(tie AS DOUBLE) / 48.0) <= 0 THEN NULL ELSE
                   ROUND((CAST(w2 AS DOUBLE) / 2.0 - (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0) / 4.0)) / sqrt((CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0) * (2.0 * CAST(n AS DOUBLE) + 1.0) / 24.0 - CAST(tie AS DOUBLE) / 48.0)), 6) END AS z
            FROM agg
        """,
        "welch_anova_acctbal": """
            WITH rowsrc AS (
                SELECT c_mktsegment AS g,
                       CAST(ROUND(CAST(c_acctbal AS DOUBLE) * 100) AS BIGINT) AS v
                FROM customer
                WHERE c_mktsegment IS NOT NULL AND c_acctbal IS NOT NULL
            ),
            per_g AS (
                SELECT g, COUNT(*) AS ng,
                       SUM(CAST(v AS HUGEINT)) AS s1,
                       SUM(CAST(v AS HUGEINT) * v) AS s2
                FROM rowsrc GROUP BY 1 HAVING COUNT(*) >= 2
            ),
            gm AS (SELECT SUM(ng) AS gn, SUM(s2) AS gs2 FROM per_g),
            staged AS (
                SELECT ng,
                       CASE WHEN ((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(ng AS DOUBLE)) / CAST(ng - 1 AS DOUBLE)) <= 0 THEN 0 ELSE 1 END AS ok,
                       CASE WHEN ((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(ng AS DOUBLE)) / CAST(ng - 1 AS DOUBLE)) <= 0 THEN CAST(0 AS HUGEINT) ELSE
                       CAST(ROUND((CAST(ng AS DOUBLE) / ((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(ng AS DOUBLE)) / CAST(ng - 1 AS DOUBLE))) * (CAST(gs2 AS DOUBLE) / CAST(gn AS DOUBLE)) * 1e6) AS HUGEINT) END AS qw,
                       CASE WHEN ((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(ng AS DOUBLE)) / CAST(ng - 1 AS DOUBLE)) <= 0 THEN CAST(0 AS HUGEINT) ELSE
                       CAST(ROUND((CAST(ng AS DOUBLE) / ((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(ng AS DOUBLE)) / CAST(ng - 1 AS DOUBLE))) * (CAST(s1 AS DOUBLE) / CAST(ng AS DOUBLE)) * (CAST(gs2 AS DOUBLE) / CAST(gn AS DOUBLE)) * 1e6) AS HUGEINT) END AS qwm,
                       (CAST(s1 AS DOUBLE) / CAST(ng AS DOUBLE)) AS m,
                       (CAST(gs2 AS DOUBLE) / CAST(gn AS DOUBLE)) AS ms
                FROM per_g CROSS JOIN gm
            ),
            tot AS (
                SELECT COUNT(*) AS k, SUM(ng) AS n, SUM(qw) AS sw,
                       SUM(qwm) AS swm, MIN(ok) AS allok
                FROM staged
            ),
            terms AS (
                SELECT MAX(k) AS k, MAX(n) AS n, MIN(allok) AS allok,
                       SUM(CAST(ROUND(CAST(qw AS DOUBLE) * (m - (CAST(swm AS DOUBLE) / CAST(sw AS DOUBLE))) * (m - (CAST(swm AS DOUBLE) / CAST(sw AS DOUBLE))) / ms) AS HUGEINT)) AS sa,
                       SUM(CAST(ROUND((1.0 - CAST(qw AS DOUBLE) / CAST(sw AS DOUBLE)) * (1.0 - CAST(qw AS DOUBLE) / CAST(sw AS DOUBLE)) / CAST(ng - 1 AS DOUBLE) * 1e12) AS HUGEINT)) AS sl
                FROM staged CROSS JOIN tot
            )
            SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
                   CASE WHEN allok = 0 OR k < 2 OR (CAST(sl AS DOUBLE) / 1e12) <= 0 THEN NULL ELSE ROUND(((CAST(sa AS DOUBLE) / 1e6 / (CAST(k AS DOUBLE) - 1.0)) / (1.0 + 2.0 * (CAST(k AS DOUBLE) - 2.0) / (CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1.0) * (CAST(sl AS DOUBLE) / 1e12))), 6) END AS f_stat,
                   CAST(k - 1 AS BIGINT) AS df1,
                   CASE WHEN allok = 0 OR k < 2 OR (CAST(sl AS DOUBLE) / 1e12) <= 0 THEN NULL ELSE ROUND(((CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1.0) / (3.0 * (CAST(sl AS DOUBLE) / 1e12))), 6) END AS df2
            FROM terms
        """,
        "dagostino_profiles": (
            _dagostino_oracle_series_sql(
                "SELECT COUNT(*) AS v FROM events GROUP BY epoch_us(ts) // 86400000000",
                "daily_volume",
            )
            + "\n            UNION ALL\n"
            + _dagostino_oracle_series_sql(
                "SELECT CAST(n_chars AS BIGINT) AS v FROM documents WHERE n_chars IS NOT NULL",
                "doc_length",
            )
            + "\n            ORDER BY series"
        ),
        "hl_quantity_shift": (
            _hl_oracle_series_sql("CAST(l_quantity AS BIGINT)", "raw")
            + "\n            UNION ALL\n"
            + _hl_oracle_series_sql("CAST(l_quantity AS BIGINT) + 7", "shifted")
            + "\n            ORDER BY series"
        ),
        "ad_k_priority": (
            _adk_oracle_series_sql("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) // 100", "raw")
            + "\n            UNION ALL\n"
            + _adk_oracle_series_sql(
                "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) // 100 + (CASE WHEN o_orderpriority = '1-URGENT' THEN 50000 ELSE 0 END)",
                "shifted",
            )
            + "\n            ORDER BY series"
        ),
        "cvm_price_drift": """
            WITH rowsrc AS (
                SELECT o_orderstatus AS st,
                       CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
                FROM orders WHERE o_orderstatus IN ('F', 'O')
            ),
            per_v AS (
                SELECT v,
                       SUM(CASE WHEN st = 'F' THEN 1 ELSE 0 END) AS ca,
                       SUM(CASE WHEN st = 'O' THEN 1 ELSE 0 END) AS cb
                FROM rowsrc GROUP BY 1
            ),
            cum AS (
                SELECT v, ca + cb AS lv,
                       SUM(ca) OVER (ORDER BY v ASC ROWS UNBOUNDED PRECEDING) AS cum_a,
                       SUM(cb) OVER (ORDER BY v ASC ROWS UNBOUNDED PRECEDING) AS cum_b
                FROM per_v
            ),
            tot AS (SELECT SUM(ca) AS n_a, SUM(cb) AS n_b FROM per_v),
            agg AS (
                SELECT MAX(n_a) AS n_a, MAX(n_b) AS n_b,
                       SUM(CAST(lv AS DOUBLE)
                           * CAST(CAST(cum_a AS HUGEINT) * n_b - CAST(cum_b AS HUGEINT) * n_a AS DOUBLE)
                           * CAST(CAST(cum_a AS HUGEINT) * n_b - CAST(cum_b AS HUGEINT) * n_a AS DOUBLE)) AS num
                FROM cum CROSS JOIN tot
            )
            SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
                   ROUND(num / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
                                * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
                                * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))), 6) AS cvm_stat
            FROM agg
        """,
        "wasserstein_price_drift": """
            WITH rowsrc AS (
                SELECT o_orderstatus AS st,
                       CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
                FROM orders WHERE o_orderstatus IN ('F', 'O')
            ),
            per_v AS (
                SELECT v,
                       SUM(CASE WHEN st = 'F' THEN 1 ELSE 0 END) AS ca,
                       SUM(CASE WHEN st = 'O' THEN 1 ELSE 0 END) AS cb
                FROM rowsrc GROUP BY 1
            ),
            cum AS (
                SELECT v,
                       SUM(ca) OVER (ORDER BY v ASC ROWS UNBOUNDED PRECEDING) AS cum_a,
                       SUM(cb) OVER (ORDER BY v ASC ROWS UNBOUNDED PRECEDING) AS cum_b,
                       LEAD(v) OVER (ORDER BY v ASC) AS vn
                FROM per_v
            ),
            tot AS (SELECT SUM(ca) AS n_a, SUM(cb) AS n_b FROM per_v),
            agg AS (
                SELECT MAX(n_a) AS n_a, MAX(n_b) AS n_b,
                       SUM(CASE WHEN vn IS NULL THEN CAST(0 AS HUGEINT)
                                ELSE abs(CAST(cum_a AS HUGEINT) * n_b - CAST(cum_b AS HUGEINT) * n_a)
                                     * (vn - v) END) AS num
                FROM cum CROSS JOIN tot
            )
            SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
                   ROUND(ROUND(CAST(num AS DOUBLE) / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) * 1.0), 6)
                         / 100.0, 6) AS w1_dollars
            FROM agg
        """,
        "jt_priority_price": (
            _jt_oracle_series_sql(
                "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) // 100", "raw"
            )
            + "\n            UNION ALL\n"
            + _jt_oracle_series_sql(
                "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) // 100 "
                "+ CAST(substr(o_orderpriority, 1, 1) AS BIGINT) * 100000",
                "uplifted",
            )
        ),
        "chi_posthoc_priority": _chi_posthoc_oracle_sql(),
        "ivm_join_both": """
            WITH o AS (SELECT o_orderkey, o_custkey, o_totalprice FROM orders),
            o_applied AS (
                SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
                FROM o WHERE o_orderkey % 10 NOT IN (0, 1)
                UNION ALL
                SELECT o_orderkey, o_custkey % 100 + 1 AS o_custkey,
                       CAST(o_totalprice AS DOUBLE) * 1.1 AS o_totalprice
                FROM o WHERE o_orderkey % 10 = 1
                UNION ALL
                SELECT o_orderkey + 10000000 AS o_orderkey, o_custkey,
                       CAST(o_totalprice AS DOUBLE) AS o_totalprice
                FROM o WHERE o_orderkey % 10 = 3
            ),
            c AS (SELECT c_custkey, c_nationkey FROM customer),
            c_applied AS (
                SELECT c_custkey, c_nationkey FROM c
                WHERE c_custkey % 10 NOT IN (0, 1)
                UNION ALL
                SELECT c_custkey, (c_nationkey + 7) % 25 AS c_nationkey
                FROM c WHERE c_custkey % 10 = 1
                UNION ALL
                SELECT c_custkey + 20000000 AS c_custkey, c_nationkey
                FROM c WHERE c_custkey % 10 = 3
            ),
            j AS (
                SELECT a.o_orderkey, a.o_totalprice, cc.c_nationkey
                FROM o_applied a JOIN c_applied cc ON a.o_custkey = cc.c_custkey
            )
            SELECT c_nationkey,
                   CAST(count(*) AS BIGINT) AS n_orders,
                   CAST(SUM(CAST(ROUND(CAST(o_totalprice AS DOUBLE) * 100) AS BIGINT)) AS BIGINT) AS rev_cents
            FROM j GROUP BY 1 ORDER BY 1
        """,
        "ccf_event_types": """
            WITH dx AS (
                SELECT epoch_us(ts) // 86400000000 AS di, COUNT(*) AS x
                FROM events WHERE event_type = 'view' GROUP BY 1
            ),
            dy AS (
                SELECT epoch_us(ts) // 86400000000 AS di, COUNT(*) AS y
                FROM events WHERE event_type = 'purchase' GROUP BY 1
            ),
            d AS (SELECT dx.di, x, y FROM dx JOIN dy USING (di)),
            g AS (SELECT CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
                         COUNT(*) AS n FROM d),
            dev AS (SELECT di, n * x - sx AS ddx, n * y - sy AS ddy FROM d CROSS JOIN g),
            den AS (SELECT SUM(CAST(ddx AS HUGEINT) * ddx) AS dxx,
                           SUM(CAST(ddy AS HUGEINT) * ddy) AS dyy FROM dev),
            lags AS (SELECT unnest(range(-7, 8)) AS lag),
            pairs AS (
                SELECT l.lag, a.ddx, b.ddy
                FROM dev a JOIN lags l ON TRUE
                JOIN dev b ON b.di = a.di + l.lag
            ),
            num AS (SELECT lag, COUNT(*) AS n_pairs,
                           SUM(CAST(ddx AS HUGEINT) * ddy) AS num
                    FROM pairs GROUP BY 1)
            SELECT CAST(lag AS INT) AS lag, n_pairs,
                   ROUND(CAST(num AS DOUBLE)
                         / sqrt(CAST(dxx AS DOUBLE) * CAST(dyy AS DOUBLE)), 6) AS ccf
            FROM num CROSS JOIN den ORDER BY lag
        """,
        "seasonal_strength_daily": """
            WITH d AS (
                SELECT epoch_us(ts) // 86400000000 AS di, COUNT(*) AS y
                FROM events GROUP BY 1
            ),
            t AS (
                SELECT di, y,
                       CAST(di % 7 AS INT) AS phase,
                       CASE WHEN COUNT(*) OVER w = 7 THEN
                            CAST(ROUND(CAST(SUM(y) OVER w AS DOUBLE) * 1e6 / 7.0) AS BIGINT)
                       END AS t_micro
                FROM d
                WINDOW w AS (ORDER BY di ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
            ),
            dev AS (SELECT *, y * 1000000 - t_micro AS dv FROM t),
            seas AS (
                SELECT phase, CAST(ROUND(CAST(SUM(dv) AS DOUBLE) / COUNT(*)) AS BIGINT) AS s_micro
                FROM dev WHERE dv IS NOT NULL GROUP BY 1
            ),
            comp AS (
                -- micro components of the decompose output rows with a
                -- full trend window (r = dv - s; tr = t + r; sr = s + r)
                SELECT (dv - s_micro) AS r,
                       (t_micro + (dv - s_micro)) AS tr,
                       (s_micro + (dv - s_micro)) AS sr
                FROM dev JOIN seas ON dev.phase = seas.phase
                WHERE t_micro IS NOT NULL
            ),
            mins AS (
                SELECT MIN(r) AS m_r, MIN(tr) AS m_tr, MIN(sr) AS m_sr FROM comp
            ),
            cen AS (
                -- min-centering mirrors the Spark side: kills the
                -- catastrophic cancellation of q - s^2/n at micro scale
                SELECT (r - m_r) AS r, (tr - m_tr) AS tr, (sr - m_sr) AS sr
                FROM comp CROSS JOIN mins
            ),
            m AS (
                SELECT COUNT(*) AS n,
                       SUM(CAST(r AS HUGEINT)) AS s_r, SUM(CAST(r AS HUGEINT) * r) AS q_r,
                       SUM(CAST(tr AS HUGEINT)) AS s_tr, SUM(CAST(tr AS HUGEINT) * tr) AS q_tr,
                       SUM(CAST(sr AS HUGEINT)) AS s_sr, SUM(CAST(sr AS HUGEINT) * sr) AS q_sr
                FROM cen
            )
            SELECT CAST(n AS BIGINT) AS n,
                   ROUND(CASE WHEN (CAST(q_tr AS DOUBLE) - CAST(s_tr AS DOUBLE) * CAST(s_tr AS DOUBLE) / CAST(n AS DOUBLE)) <= 0.0 THEN 0.0
                         ELSE greatest(0.0, 1.0 - (CAST(q_r AS DOUBLE) - CAST(s_r AS DOUBLE) * CAST(s_r AS DOUBLE) / CAST(n AS DOUBLE)) / (CAST(q_tr AS DOUBLE) - CAST(s_tr AS DOUBLE) * CAST(s_tr AS DOUBLE) / CAST(n AS DOUBLE))) END, 6) AS trend_strength,
                   ROUND(CASE WHEN (CAST(q_sr AS DOUBLE) - CAST(s_sr AS DOUBLE) * CAST(s_sr AS DOUBLE) / CAST(n AS DOUBLE)) <= 0.0 THEN 0.0
                         ELSE greatest(0.0, 1.0 - (CAST(q_r AS DOUBLE) - CAST(s_r AS DOUBLE) * CAST(s_r AS DOUBLE) / CAST(n AS DOUBLE)) / (CAST(q_sr AS DOUBLE) - CAST(s_sr AS DOUBLE) * CAST(s_sr AS DOUBLE) / CAST(n AS DOUBLE))) END, 6) AS seasonal_strength
            FROM m
        """,
        "overdispersion_daily": """
            WITH d AS (
                SELECT event_type, epoch_us(ts) // 86400000000 AS di,
                       CAST(count(*) AS BIGINT) AS x
                FROM events GROUP BY 1, 2
            ),
            g AS (
                SELECT event_type, count(*) AS n,
                       SUM(CAST(x AS HUGEINT)) AS s,
                       SUM(CAST(x AS HUGEINT) * x) AS ss
                FROM d GROUP BY 1 HAVING count(*) > 1
            )
            SELECT event_type, CAST(n AS BIGINT) AS n,
                   ROUND((CAST(s AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS mean,
                   ROUND((((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                           / (CAST(n AS DOUBLE) - 1.0))
                          / (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))), 6) AS dispersion,
                   ROUND(((CAST(n AS DOUBLE) - 1.0) *
                          (((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                            / (CAST(n AS DOUBLE) - 1.0))
                           / (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))), 6) AS chi2_stat
            FROM g ORDER BY 1
        """,
        "linkage_assignment": """
            WITH nsub AS (
                SELECT GREATEST(count(*) // 500, 1) AS nb FROM customer
            ),
            a AS (
                SELECT c_custkey AS a_key, c_nationkey AS nk,
                       c_custkey % nb AS sb, c_name AS a_name,
                       c_mktsegment AS a_seg, c_acctbal AS a_bal
                FROM customer, nsub
            ),
            b AS (
                SELECT c_custkey AS b_key, c_nationkey AS nk,
                       c_custkey % nb AS sb,
                       substr(c_name, 1, CAST(c_custkey % length(c_name) AS INT))
                           || substr(c_name, CAST(c_custkey % length(c_name) AS INT) + 2) AS b_name,
                       CASE WHEN c_custkey % 5 = 0 THEN c_mktsegment || 'X'
                            ELSE c_mktsegment END AS b_seg,
                       CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 1000.0
                            ELSE c_acctbal END AS b_bal
                FROM customer, nsub WHERE c_custkey % 4 = 0
            ),
            p AS (
                SELECT a_key, b_key,
                       4 * (CASE WHEN levenshtein(a_name, b_name) <= 2 THEN 1 ELSE 0 END)
                       + 2 * (CASE WHEN a_seg = b_seg THEN 1 ELSE 0 END)
                       + (CASE WHEN a_bal = b_bal THEN 1 ELSE 0 END) AS score
                FROM a JOIN b USING (nk, sb)
            ),
            f AS (SELECT * FROM p WHERE score >= 1),
            r AS (
                SELECT a_key, b_key,
                       row_number() OVER (PARTITION BY a_key
                           ORDER BY ROUND(CAST(score AS DOUBLE), 9) DESC, b_key ASC) AS ra,
                       row_number() OVER (PARTITION BY b_key
                           ORDER BY ROUND(CAST(score AS DOUBLE), 9) DESC, a_key ASC) AS rb
                FROM f
            ),
            m AS (SELECT a_key, b_key FROM r WHERE ra = 1 AND rb = 1)
            SELECT CAST(count(*) AS BIGINT) AS n_matches,
                   CAST(SUM(CASE WHEN a_key = b_key THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
                   ROUND(CAST(SUM(CASE WHEN a_key = b_key THEN 1 ELSE 0 END) AS DOUBLE)
                         / CAST(count(1) AS DOUBLE), 6) AS match_precision
            FROM m
        """,
        "embedding_drift_labels": """
            WITH spine AS (SELECT unnest(range(1, 65)) AS i),
            qa AS (
                SELECT label, i,
                       CAST(round(CAST(embedding[i] AS DOUBLE) * 1024.0) AS BIGINT) AS xq
                FROM embeddings, spine WHERE vec_id % 2 = 0
            ),
            qb AS (
                SELECT label, i,
                       CAST(round(CAST(embedding[i] AS DOUBLE) * 1024.0) AS BIGINT) AS xq
                FROM embeddings, spine WHERE vec_id % 2 = 1
            ),
            ca AS (
                SELECT label, i,
                       CAST(round(CAST(SUM(xq) AS DOUBLE) * 1024.0
                                  / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS cq
                FROM qa GROUP BY 1, 2
            ),
            cb AS (
                SELECT label, i,
                       CAST(round(CAST(SUM(xq) AS DOUBLE) * 1024.0
                                  / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS cq
                FROM qb GROUP BY 1, 2
            ),
            na AS (SELECT label, CAST(count(*) AS BIGINT) AS n_a
                   FROM embeddings WHERE vec_id % 2 = 0 GROUP BY 1),
            nb AS (SELECT label, CAST(count(*) AS BIGINT) AS n_b
                   FROM embeddings WHERE vec_id % 2 = 1 GROUP BY 1),
            shifts AS (
                SELECT a.label, SUM((a.cq - b.cq) * (a.cq - b.cq)) AS d2
                FROM ca a JOIN cb b USING (label, i) GROUP BY 1
            )
            SELECT label,
                   COALESCE(n_a, 0) AS n_a, COALESCE(n_b, 0) AS n_b,
                   ROUND(sqrt(CAST(d2 AS DOUBLE)) / 1048576.0, 6) AS centroid_shift
            FROM na FULL OUTER JOIN nb USING (label)
            LEFT JOIN shifts USING (label)
            ORDER BY label
        """,
        "snapshot_diff": """
            WITH a AS (
                SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority FROM orders
            ),
            b AS (
                SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
                FROM a WHERE o_orderkey % 10 NOT IN (0, 1, 5)
                UNION ALL
                SELECT o_orderkey, o_custkey,
                       CAST(o_totalprice AS DOUBLE) * 1.1, 'X-' || o_orderpriority
                FROM a WHERE o_orderkey % 10 = 1
                UNION ALL
                SELECT o_orderkey, o_custkey + 1, o_totalprice, o_orderpriority
                FROM a WHERE o_orderkey % 10 = 5
                UNION ALL
                SELECT o_orderkey + 10000000, o_custkey, o_totalprice, o_orderpriority
                FROM a WHERE o_orderkey % 10 = 3
            ),
            d AS (
                SELECT
                    CASE WHEN a.o_orderkey IS NULL THEN 'added'
                         WHEN b.o_orderkey IS NULL THEN 'removed'
                         WHEN (a.o_custkey IS DISTINCT FROM b.o_custkey)
                           OR (a.o_totalprice IS DISTINCT FROM b.o_totalprice)
                           OR (a.o_orderpriority IS DISTINCT FROM b.o_orderpriority)
                         THEN 'changed' ELSE 'unchanged' END AS change_type,
                    -- COALESCE: DuckDB's array_to_string of an empty
                    -- list yields NULL, Spark's array_join yields ''
                    CASE WHEN a.o_orderkey IS NULL OR b.o_orderkey IS NULL THEN ''
                         ELSE COALESCE(array_to_string(list_filter([
                                CASE WHEN a.o_custkey IS DISTINCT FROM b.o_custkey
                                     THEN 'o_custkey' END,
                                CASE WHEN a.o_totalprice IS DISTINCT FROM b.o_totalprice
                                     THEN 'o_totalprice' END,
                                CASE WHEN a.o_orderpriority IS DISTINCT FROM b.o_orderpriority
                                     THEN 'o_orderpriority' END
                              ], x -> x IS NOT NULL), ','), '') END AS cols
                FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey
            )
            SELECT change_type, cols, CAST(count(*) AS BIGINT) AS n
            FROM d GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "hill_tail": """
            WITH q AS (
                SELECT CAST(ROUND(CAST(o_totalprice AS DOUBLE) * 100) AS BIGINT) AS x
                FROM orders WHERE o_totalprice IS NOT NULL
            ),
            top AS (SELECT x FROM q WHERE x > 0 ORDER BY x DESC LIMIT 501),
            thr AS (SELECT min(x) AS xmin FROM top),
            terms AS (
                SELECT CAST(ROUND(ln(CAST(x AS DOUBLE) / CAST(xmin AS DOUBLE)) * 1e12) AS BIGINT) AS t,
                       xmin
                FROM top, thr WHERE x > xmin
            )
            SELECT CAST(count(*) AS BIGINT) AS k,
                   ROUND(CAST(max(xmin) AS DOUBLE) / 100.0, 6) AS x_kplus1,
                   ROUND(CAST(CAST(sum(t) AS BIGINT) AS DOUBLE) / 1e12 / count(*), 6) AS xi,
                   ROUND(CAST(count(*) AS DOUBLE) / (CAST(CAST(sum(t) AS BIGINT) AS DOUBLE) / 1e12), 6) AS alpha
            FROM terms
        """,
    }


if __name__ == "__main__":
    from morphik_core_spark.session import get_spark

    spark = get_spark()
    df = entry(spark)
    df.show(truncate=False)
    print("queries:", ", ".join(sorted(queries())))
