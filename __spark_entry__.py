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
from morphik_core_spark.operators import listing, maxsim, retrieval
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
_SCORE_DECIMALS = 6


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


def _query_vector(spark: SparkSession, sf_dir: str) -> list[float]:
    row = (
        _t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == _QUERY_VEC_ID)
        .select("embedding")
        .first()
    )
    return [float(x) for x in row.embedding]


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
    events = _t(spark, sf_dir, "events")
    comp = MetadataFilterCompiler(metadata_col="props", types_col=None, column_fields={"event_type": "event_type"})
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
    """Late-interaction MaxSim top-k, relational form (SURVEY §2.4 MaxSim)."""
    mv = _multivectors(spark, sf_dir)
    scored = maxsim.maxsim_relational(mv, _query_tokens(spark, sf_dir), id_cols=("vec_id",))
    scored = scored.select("vec_id", F.round("maxsim", _SCORE_DECIMALS).alias("maxsim"))
    return retrieval.top_k(scored, 10, score_col="maxsim", tiebreak=("vec_id",))


def _q_maxsim_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantized MaxSim (sign-bit Hamming) top-k — the coarse stage
    of two-stage retrieval (SURVEY §4)."""
    mv = _multivectors(spark, sf_dir)
    scored = maxsim.maxsim_hamming_relational(mv, _query_tokens(spark, sf_dir), id_cols=("vec_id",))
    scored = scored.select("vec_id", F.round("maxsim", _SCORE_DECIMALS).alias("maxsim"))
    return retrieval.top_k(scored, 10, score_col="maxsim", tiebreak=("vec_id",))


def _q_two_stage_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval: cheap binary Hamming prune to 50 candidates →
    exact rescore → top-10 (reference fast_multivector_store.py:504-608)."""
    mv = _multivectors(spark, sf_dir)
    qtoks = _query_tokens(spark, sf_dir)
    coarse = maxsim.maxsim_hamming_relational(mv, qtoks, id_cols=("vec_id",))
    coarse = coarse.select("vec_id", F.round("maxsim", _SCORE_DECIMALS).alias("maxsim"))
    survivors = retrieval.top_k(coarse, 50, score_col="maxsim", tiebreak=("vec_id",)).select("vec_id")
    exact = maxsim.maxsim_relational(
        mv.join(F.broadcast(survivors), "vec_id", "left_semi"), qtoks, id_cols=("vec_id",)
    )
    exact = exact.select("vec_id", F.round("maxsim", _SCORE_DECIMALS).alias("maxsim"))
    return retrieval.top_k(exact, 10, score_col="maxsim", tiebreak=("vec_id",))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "semi_join_auth": _q_semi_join_auth,
        "hydration_join": _q_hydration_join,
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
    }


# ----------------------------------------------------------------- oracles

_COS_SCORE = (
    "ROUND((1.0 + list_dot_product(e.embedding::DOUBLE[], q.qv) / "
    "(sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) * "
    "sqrt(list_dot_product(q.qv, q.qv)))) / 2.0, 6)"
)


def oracle_sql() -> dict[str, str]:
    return {
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
    }


if __name__ == "__main__":
    from morphik_core_spark.session import get_spark

    spark = get_spark()
    df = entry(spark)
    df.show(truncate=False)
    print("queries:", ", ".join(sorted(queries())))
