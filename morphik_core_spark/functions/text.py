"""Text scalar functions (SURVEY §2.7): cleaning, normalization, token
counting, filename normalization + lightweight FTS ranking.

All built-in expressions — one codegen'd scan, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "clean_control_chars",
    "normalize_whitespace",
    "token_count",
    "normalize_filename",
    "filename_search",
    "STOPWORDS_EN",
    "stem_token",
    "stem_token_py",
    "stem_token_sql",
    "tsvector_lexemes",
    "tsvector_lexemes_sql",
    "plainto_lexemes",
    "ts_rank",
    "ts_rank_sql",
]

# C0 control chars except \t \n \r (reference text_utils.rs:120-140,
# fast_ops.py:22-26)
_CONTROL_CHARS = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"


def clean_control_chars(col: Column) -> Column:
    return F.regexp_replace(col, _CONTROL_CHARS, "")


def normalize_whitespace(col: Column) -> Column:
    return F.regexp_replace(F.trim(col), r"\s+", " ")


def token_count(col: Column) -> Column:
    """Whitespace token count (the reference's cheap token estimate)."""
    return F.when(F.length(F.trim(col)) == 0, 0).otherwise(
        F.size(F.split(normalize_whitespace(col), " "))
    )


def normalize_filename(col: Column) -> Column:
    """Strip extension, fold [_-]+ to spaces, lowercase — the reference's
    FTS normalization (postgres_database.py:2739-2749)."""
    no_ext = F.regexp_replace(col, r"\.[^.]+$", "")
    return F.lower(F.trim(F.regexp_replace(no_ext, r"[_\-]+", " ")))


# --------------------------------------------------------------------------
# ts_rank restatement (reference postgres_database.py:2700-2790 orders
# filename search by Postgres ts_rank(to_tsvector('english', ...),
# plainto_tsquery(...)) with no weight labels). We restate the actual rank
# math from PG's tsrank.c calc_rank_or for uniform default weights:
#   per matched query lexeme: 0.1 * (sum_{j=1..tf} 1/j^2) / zeta(2)
#   rank = sum over query lexemes / (number of query lexemes)
# (with a single uniform weight the max-weight correction term in tsrank.c
# cancels, leaving exactly the harmonic-square tf curve). The 'english'
# tsvector is restated as a stopword filter + a fixed, RE2-safe suffix
# stemmer ("stemmer-lite": Porter step-1 plural/ing/ed rules) shared
# verbatim by Spark, DuckDB, and Python so the oracle is the same function.

_TS_ZETA2 = 1.64493406685  # pi^2/6, PG tsrank.c's position-decay normalizer
_TS_WEIGHT_D = 0.1  # PG default weight for unlabeled lexemes

# Lucene/Postgres-style english stopword core. Order-insensitive set; the
# SQL twins inline it, so keep it small and frozen.
STOPWORDS_EN = (
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these", "they", "this",
    "to", "was", "will", "with",
)

# (pattern, spark_repl, duckdb_repl, python_repl) — applied in order, one
# rule at a time. Patterns are anchored so replace-first (DuckDB/Python)
# and replace-all (Spark's regexp_replace) agree; RE2-safe (no lookaround).
_STEM_RULES = (
    (r"sses$", "ss", "ss", "ss"),
    (r"ies$", "i", "i", "i"),
    (r"^([a-z0-9]*[^su])s$", "$1", r"\1", r"\1"),
    (r"^([a-z0-9]{3,})ing$", "$1", r"\1", r"\1"),
    (r"^([a-z0-9]{3,})ed$", "$1", r"\1", r"\1"),
)


def stem_token(col: Column) -> Column:
    """Apply the shared suffix-stemmer rules to a single token Column."""
    for pat, repl, _d, _p in _STEM_RULES:
        col = F.regexp_replace(col, pat, repl)
    return col


def stem_token_py(tok: str) -> str:
    """Python twin of stem_token — used to derive query lexemes driver-side."""
    import re

    for pat, _s, _d, repl in _STEM_RULES:
        tok = re.sub(pat, repl, tok)
    return tok


def stem_token_sql(var: str) -> str:
    """DuckDB twin of stem_token as an expression over lambda variable `var`."""
    expr = var
    for pat, _s, repl, _p in _STEM_RULES:
        expr = f"regexp_replace({expr}, '{pat}', '{repl}')"
    return expr


def tsvector_lexemes(norm_text: Column) -> Column:
    """to_tsvector('english', ...) restated: split normalized text on single
    spaces, drop stopwords (checked pre-stem, as PG does), stem the rest.
    Duplicates are kept — they are the tf positions ts_rank consumes."""
    toks = F.split(norm_text, " ")
    stops = F.array(*[F.lit(s) for s in STOPWORDS_EN])
    kept = F.filter(toks, lambda t: (F.length(t) > 0) & ~F.array_contains(stops, t))
    return F.transform(kept, lambda t: stem_token(t))


def tsvector_lexemes_sql(norm_expr: str) -> str:
    """DuckDB twin of tsvector_lexemes over a normalized-text SQL expression."""
    stops = ", ".join(f"'{s}'" for s in STOPWORDS_EN)
    return (
        f"list_transform(list_filter(string_split({norm_expr}, ' '), "
        f"t -> len(t) > 0 AND t NOT IN ({stops})), t -> {stem_token_sql('t')})"
    )


def plainto_lexemes(query: str) -> list[str]:
    """plainto_tsquery('english', query) restated driver-side: lowercase,
    split on non-alphanumerics, drop stopwords, stem. Order preserved."""
    import re

    out = []
    for tok in re.split(r"[^a-z0-9]+", query.lower()):
        if not tok or tok in STOPWORDS_EN:
            continue
        out.append(stem_token_py(tok))
    return out


def _lexeme_eq(value: str):
    # closure factory: PySpark infers lambda arity from the signature and
    # late-binds loop variables — never capture the loop var directly.
    return lambda t: t == F.lit(value)


# Precomputed harmonic-square prefix sums: _H2_TABLE[tf] = sum_{j=1..tf}
# 1/j², accumulated left-to-right ascending — the SAME IEEE evaluation
# order as the aggregate fallback and the DuckDB oracle's list_sum, so
# the lookup is bit-identical to recomputation. Kept SMALL deliberately:
# the array literal is a CreateArray node per entry until constant
# folding, and Catalyst re-walks it on every analysis pass — a 1024-entry
# table measurably slowed plan construction. 32 covers any real
# filename's per-lexeme tf; beyond that the exact fold still runs.
_H2_TABLE_N = 32


def _h2_prefix_sums() -> list[float]:
    out = [0.0]
    acc = 0.0
    for j in range(1, _H2_TABLE_N + 1):
        acc += 1.0 / (j * j)
        out.append(acc)
    return out


_H2_TABLE = _h2_prefix_sums()
_H2_TABLE_COL: list = []  # lazily-built one-element cache (needs a live session)


def _h2_table_col() -> Column:
    # ONE parsed SQL literal (constant-folded to a single Literal array by
    # the optimizer) — F.lit(list)/F.array would create 1025 py4j Column
    # objects and dominate plan-construction time. repr() round-trips
    # doubles exactly, so the parsed values are bit-identical.
    if not _H2_TABLE_COL:
        _H2_TABLE_COL.append(F.expr("array(" + ", ".join(f"{x!r}D" for x in _H2_TABLE) + ")"))
    return _H2_TABLE_COL[0]


def ts_rank(lexemes: Column, query_lexemes: list[str]) -> Column:
    """PG ts_rank (default normalization 0, uniform D weights) over a lexeme
    array: per query lexeme 0.1 * H2(tf) / zeta(2), averaged over the query.

    Fast shape: tf via ``size(a) - size(array_remove(a, q))`` (two plain
    codegen array ops, no lambda) and H2 via an array-literal prefix-sum
    lookup — no sequence/aggregate higher-order functions, which dominate
    both plan-construction and execution time for this expression. The
    exact fold remains as the >_H2_TABLE_N fallback, so values are
    identical for every tf."""
    if not query_lexemes:
        return F.lit(0.0)
    table = _h2_table_col()
    n = F.size(lexemes)
    terms = []
    for q in query_lexemes:
        tf = n - F.size(F.array_remove(lexemes, q))
        h2 = F.when(tf <= F.lit(_H2_TABLE_N), F.get(table, tf)).otherwise(
            F.aggregate(
                F.sequence(F.lit(1), tf),
                F.lit(0.0),
                lambda acc, j: acc + F.lit(1.0) / (j.cast("double") * j.cast("double")),
            )
        )
        terms.append(h2 * F.lit(_TS_WEIGHT_D / _TS_ZETA2))
    total = terms[0]
    for t in terms[1:]:
        total = total + t
    return total / F.lit(float(len(query_lexemes)))


def ts_rank_sql(lexemes_expr: str, query_lexemes: list[str]) -> str:
    """DuckDB twin of ts_rank over a lexeme-list SQL expression."""
    if not query_lexemes:
        return "0.0"
    parts = []
    for q in query_lexemes:
        tf = f"len(list_filter({lexemes_expr}, t -> t = '{q}'))"
        h2 = (
            f"CASE WHEN {tf} = 0 THEN 0.0 ELSE "
            f"list_sum(list_transform(range(1, {tf} + 1), j -> 1.0/(j*j))) END"
        )
        parts.append(f"({h2}) * {_TS_WEIGHT_D / _TS_ZETA2!r}")
    return f"(({' + '.join(parts)}) / {float(len(query_lexemes))!r})"


def with_filename_lexemes(
    df: DataFrame, filename_col: str = "filename", out_col: str = "filename_lexemes"
) -> DataFrame:
    """Ingest-time lexeme projection: normalize + tokenize + stem ONCE and
    store the lexeme array alongside the row. Ranking then reads the
    stored array (`ts_rank(F.col(out_col), q)`) instead of re-running the
    ~30-regex stemming chain per filename per query — the same
    amortization Postgres gets from a stored tsvector column + GIN input.
    At 100 TB the projection is written with the documents table and costs
    one column of storage; every FTS query after that is a scan + array
    ops, no regex."""
    return df.withColumn(out_col, tsvector_lexemes(normalize_filename(F.col(filename_col))))


def filename_search(
    df: DataFrame,
    query: str,
    filename_col: str = "filename",
    recency_col: str = "updated_at",
    limit: int = 50,
) -> DataFrame:
    """Filename FTS (reference postgres_database.py:2700-2790): a row matches
    if the raw query is an ILIKE substring of the filename OR any english
    lexeme hits the normalized-filename tsvector OR any raw ('simple') token
    hits the unstemmed tokens; ordered by english ts_rank desc, recency
    desc nulls last. All codegen expressions — no UDFs, no shuffle."""
    name = F.col(filename_col)
    norm = normalize_filename(name)
    # stored projection wins: rank from the ingest-time lexeme column
    # (with_filename_lexemes) instead of re-running the stemming chain —
    # the stored-tsvector amortization, transparent to callers
    if "filename_lexemes" in df.columns:
        lexemes = F.col("filename_lexemes")
    else:
        lexemes = tsvector_lexemes(norm)
    q_lex = plainto_lexemes(query)
    simple_toks = [t for t in query.lower().split() if t]

    ilike_hit = F.contains(F.lower(name), F.lit(query.strip().lower()))
    english_hit = F.lit(False)
    if q_lex:
        english_hit = F.size(F.array_intersect(lexemes, F.array(*[F.lit(t) for t in q_lex]))) > 0
    simple_hit = F.lit(False)
    if simple_toks:
        simple_hit = (
            F.size(F.array_intersect(F.split(norm, " "), F.array(*[F.lit(t) for t in simple_toks]))) > 0
        )

    rank = ts_rank(lexemes, q_lex).alias("rank")
    out = df.filter(ilike_hit | english_hit | simple_hit).withColumn("rank", rank)
    order = [F.col("rank").desc()]
    if recency_col in df.columns:
        order.append(F.col(recency_col).desc_nulls_last())
    return out.orderBy(*order).limit(limit)
