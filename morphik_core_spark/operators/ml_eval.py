"""Model-quality evaluation operators: exact AUC/Gini, calibration
reliability bins + ECE, Cohen's kappa inter-rater agreement, and
MRR/NDCG@k ranking quality.

Extensions beyond the reference surface (morphik-core has no model-QA
analytics); these are the evaluation rollups a training-data pipeline
runs over classifier scores, heuristic quality signals, and weak labels
before trusting them to filter a 100 TB corpus.

Determinism contracts (the repo-wide rules):

- AUC is computed from EXACT integer rank sums over scores quantized to
  ``decimals`` places — the Mann-Whitney U statistic with midrank tie
  handling, kept integral by carrying 2·U — so the only float ops are
  the final divisions, each one fixed tree rounded once.
- Calibration's per-bin mean prediction sums ROUND(p·10^decimals)
  integers (exact because the scores are already rounded); ECE sums
  per-bin scaled-integer terms, so aggregation order can't move it.
- Kappa is pure integer contingency counts into one rounded tree.

Scale shapes:

- :func:`auc_roc` — one map-side-combined groupBy on the quantized
  score, then a prefix-sum window over DISTINCT scores. For scores in
  [0, 1] at 6 decimals that frame is ≤ 10^6+1 rows REGARDLESS of corpus
  size, so the unpartitioned window is bounded by construction (for
  unbounded score ranges, range-repartition the distinct frame and
  two-pass the prefix sums).
- :func:`calibration_bins` — one groupBy on ≤ n_bins keys.
- :func:`cohens_kappa` — one groupBy on the (a, b) label pairs (≤
  |labels|² rows), then driver-free broadcasts of the marginals.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "auc_roc",
    "average_precision",
    "brier_score",
    "calibration_bins",
    "cohens_kappa",
    "gains_table",
    "ranking_metrics",
    "threshold_sweep",
    "isotonic_calibration",
    "mcnemar_test",
    "rbo_weights",
    "rank_biased_overlap",
]


def auc_roc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    decimals: int = 6,
) -> DataFrame:
    """Exact ROC AUC of a score against a 0/1 label via the rank-sum
    (Mann-Whitney U) identity, with midrank tie correction:

        AUC = (Σ_{positives} rank_i − n⁺(n⁺+1)/2) / (n⁺ · n⁻)

    Ranks are over the score quantized to ``decimals`` (ties share the
    midrank). Carrying 2·rank keeps everything integral: for a tied
    score group starting after ``c`` rows with ``cnt`` members, each
    member's 2·midrank = 2c + cnt + 1, so

        2U = Σ_groups pos_cnt · (2c + cnt + 1) − n⁺(n⁺+1)

    and AUC = 2U / (2 n⁺ n⁻) — one division, rounded once. Gini =
    2·AUC − 1 from the same unrounded tree.

    Output: one row (n_pos, n_neg, auc, gini); auc/gini NULL when
    either class is empty.
    """
    scale = 10**decimals
    q = F.expr(
        f"CAST(ROUND(CAST({score_col} AS DOUBLE) * {scale}) AS BIGINT)"
    ).alias("_s")
    y = F.col(label_col).cast("bigint")
    groups = (
        df.filter(F.col(score_col).isNotNull() & y.isNotNull())
        .select(q, y.alias("_y"))
        .groupBy("_s")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("_y").alias("pos"))
    )
    w = Window.orderBy("_s").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = groups.select(
        "pos",
        "cnt",
        (F.sum("cnt").over(w) - F.col("cnt")).alias("c_before"),
    )
    # the rank sum is O(N²): accumulate in DECIMAL(38,0) (exact to 1e38)
    # so a corpus-scale N never overflows int64 under ANSI — pos is cast
    # BEFORE the multiply, since pos·(2c+cnt+1) alone can exceed 2⁶³
    agg = ranked.agg(
        F.sum(
            F.col("pos").cast("decimal(38,0)")
            * (F.lit(2) * F.col("c_before") + F.col("cnt") + F.lit(1))
        ).alias("rank2_pos"),
        F.sum("pos").alias("n_pos"),
        F.sum(F.col("cnt") - F.col("pos")).alias("n_neg"),
    )
    auc = (
        "CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL ELSE "
        "CAST(rank2_pos - CAST(n_pos AS DECIMAL(38,0)) * (n_pos + 1) AS DOUBLE) "
        "/ (2.0D * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)) END"
    )
    return agg.select(
        "n_pos",
        "n_neg",
        F.round(F.expr(auc), decimals).alias("auc"),
        F.round(F.expr(f"2.0D * ({auc}) - 1.0D"), decimals).alias("gini"),
    )


def calibration_bins(
    df: DataFrame,
    prob_col: str,
    label_col: str,
    n_bins: int = 10,
    decimals: int = 6,
) -> DataFrame:
    """Reliability-diagram bins + Expected Calibration Error for a
    probability column in [0, 1] (Naeini 2015 binned ECE): rows land in
    ``floor(p · n_bins)`` (top edge clamped into the last bin), each
    bin reports its mean predicted probability, observed positive rate,
    and |gap|; ECE = Σ_b (n_b/N)·|obs_b − pred_b| is summed as
    ROUND(x·1e12) scaled integers and repeated per row.

    ``prob_col`` must already be rounded to ``decimals`` (every score
    producer in this repo rounds at the edge) — that makes the per-bin
    probability sums EXACT integer arithmetic.

    Output: (bin, n, mean_pred, observed, gap, ece) — at most n_bins
    rows; one map-side-combined groupBy plus a one-row broadcast.
    """
    scale = 10**decimals
    b = F.least(
        F.floor(F.col(prob_col).cast("double") * n_bins).cast("int"),
        F.lit(n_bins - 1),
    )
    y = F.col(label_col).cast("bigint")
    bins = (
        df.filter(F.col(prob_col).isNotNull() & y.isNotNull())
        .select(
            b.alias("bin"),
            F.expr(f"CAST(ROUND(CAST({prob_col} AS DOUBLE) * {scale}) AS BIGINT)").alias("_p"),
            y.alias("_y"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_p").alias("_sp"),
            F.sum("_y").alias("_np"),
        )
    )
    total = bins.agg(F.sum("n").alias("_tn"))
    pred = f"(CAST(_sp AS DOUBLE) / (CAST(n AS DOUBLE) * {float(scale)}D))"
    obs = "(CAST(_np AS DOUBLE) / CAST(n AS DOUBLE))"
    gap = f"abs({obs} - {pred})"
    terms = bins.join(F.broadcast(total)).select(
        "bin",
        "n",
        F.round(F.expr(pred), decimals).alias("mean_pred"),
        F.round(F.expr(obs), decimals).alias("observed"),
        F.round(F.expr(gap), decimals).alias("gap"),
        F.expr(
            f"CAST(ROUND((CAST(n AS DOUBLE) / CAST(_tn AS DOUBLE)) * ({gap}) * 1e12) AS BIGINT)"
        ).alias("_t"),
    )
    ece = terms.agg(F.sum("_t").alias("_s")).select(
        F.round(F.col("_s").cast("double") / F.lit(1e12), decimals).alias("ece")
    )
    return terms.drop("_t").join(F.broadcast(ece))


def cohens_kappa(
    df: DataFrame,
    rater_a_col: str,
    rater_b_col: str,
    decimals: int = 6,
) -> DataFrame:
    """Cohen's kappa agreement between two categorical columns (weak
    labels, annotator pairs, declared-vs-predicted language):

        κ = (p_o − p_e) / (1 − p_e),
        p_o = Σ_i n_ii / N,   p_e = Σ_i (row_i · col_i) / N²

    Counts are exact; p_o/p_e/κ form one fixed double tree rounded
    once; κ is NULL when p_e = 1, detected STRUCTURALLY (exactly one
    contingency cell and it is diagonal ⇔ both raters constant) — an
    integer n·n guard would overflow int64 beyond ~3·10⁹ rows and a
    float comparison would be inexact past 2⁵³.

    Output: one row (n, observed_agreement, expected_agreement, kappa).
    Scale: one groupBy on label pairs (≤ |labels|²), marginals derived
    from that tiny frame — the corpus contributes one combinable scan.
    """
    pairs = (
        df.filter(F.col(rater_a_col).isNotNull() & F.col(rater_b_col).isNotNull())
        .groupBy(F.col(rater_a_col).alias("_a"), F.col(rater_b_col).alias("_b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    row_m = pairs.groupBy("_a").agg(F.sum("c").alias("ra"))
    col_m = pairs.groupBy("_b").agg(F.sum("c").alias("cb"))
    chance = (
        row_m.join(col_m, F.col("_a") == F.col("_b"))
        .agg(F.sum(F.col("ra") * F.col("cb")).alias("rc"))
    )
    diag = pairs.agg(
        F.sum(F.when(F.col("_a") == F.col("_b"), F.col("c")).otherwise(F.lit(0))).alias("agree"),
        F.sum("c").alias("n"),
        F.count(F.lit(1)).alias("n_cells"),
    )
    po = "(CAST(agree AS DOUBLE) / CAST(n AS DOUBLE))"
    pe = "(CAST(COALESCE(rc, 0) AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))"
    kappa = (
        f"CASE WHEN n_cells = 1 AND agree = n THEN NULL "
        f"ELSE ({po} - {pe}) / (1.0D - {pe}) END"
    )
    return diag.join(F.broadcast(chance)).select(
        "n",
        F.round(F.expr(po), decimals).alias("observed_agreement"),
        F.round(F.expr(pe), decimals).alias("expected_agreement"),
        F.round(F.expr(kappa), decimals).alias("kappa"),
    )


def ranking_metrics(
    ranked: DataFrame,
    query_col: str,
    rank_col: str,
    rel_col: str,
    k: int = 10,
    decimals: int = 6,
) -> DataFrame:
    """Per-query ranking quality: reciprocal rank and NDCG@k — the two
    rollups a retrieval/rerank evaluation runs over a judged result list
    (complements `similarity.recall_at_k`, which only checks set overlap
    against an exact baseline; these grade the ORDER).

    Input: one row per (query, JUDGED result) with its 1-based
    ``rank_col`` and a non-negative graded ``rel_col`` (binary or graded
    relevance). Pass ALL judged rows, not just the top-k: the standard
    NDCG@k definition builds the ideal list from every judged item
    (truncated at k), so relevant items the system ranked beyond k still
    lower NDCG — filtering to rank≤k first would inflate it (round-6
    ADVICE). Output per query: (query, n_rel, first_rel_rank, rr, dcg,
    idcg, ndcg); ``n_rel`` counts ALL judged relevant rows, ``dcg`` sums
    over the observed top-k only, ``idcg`` over the best k of all judged
    rows, ``rr`` = 1/first_rel_rank within the top-k (0.0 when nothing
    in the top-k is relevant — the standard MRR@k convention), ``ndcg``
    NULL when idcg is 0. Mean rr over queries = MRR; mean ndcg = mean
    NDCG@k.

    Determinism: each row's DCG term rel/log2(rank+1) is ONE fixed
    double tree scaled to integer micro-units (ROUND(x·1e12) AS BIGINT)
    before summation, so per-query sums are aggregation-order-free; the
    ideal ordering ranks by (rel DESC, rank ASC) — the observed rank as
    the tie-break makes IDCG unique. The final rr/ndcg divisions round
    once at the edge.

    Scale: one groupBy + one per-query window over the judged rows —
    partitions are judgment-list-sized, never corpus-sized; with Q
    queries and J judgments each, the shuffled frame is Q·J rows.
    """
    scale = 1_000_000_000_000  # 1e12 micro-unit grid (repo-wide recipe)
    qcol, rnk = F.col(query_col), F.col(rank_col).cast("bigint")
    rel = F.col(rel_col).cast("double")
    judged = ranked.select(
        qcol.alias("_q"),
        rnk.alias("_rank"),
        rel.alias("_rel"),
        # observed DCG gain: only ranks inside the cutoff contribute
        F.when(
            rnk <= k,
            F.expr(
                f"CAST(ROUND(CAST({rel_col} AS DOUBLE) / LOG2(CAST({rank_col} AS BIGINT) + 1)"
                f" * {scale}) AS BIGINT)"
            ),
        )
        .otherwise(F.lit(0).cast("bigint"))
        .alias("_gain_u"),
    )
    iw = Window.partitionBy("_q").orderBy(F.col("_rel").desc(), F.col("_rank").asc())
    ideal = judged.withColumn("_ipos", F.row_number().over(iw)).withColumn(
        "_igain_u",
        # ideal list truncates at k, but ranks over ALL judged rows
        F.when(
            F.col("_ipos") <= k,
            F.expr(f"CAST(ROUND(_rel / LOG2(_ipos + 1) * {scale}) AS BIGINT)"),
        ).otherwise(F.lit(0).cast("bigint")),
    )
    agg = ideal.groupBy("_q").agg(
        F.sum(F.when(F.col("_rel") > 0, 1).otherwise(0)).alias("n_rel"),
        F.min(
            F.when((F.col("_rel") > 0) & (F.col("_rank") <= k), F.col("_rank"))
        ).alias("first_rel_rank"),
        F.sum("_gain_u").alias("_dcg_u"),
        F.sum("_igain_u").alias("_idcg_u"),
    )
    return agg.select(
        F.col("_q").alias(query_col),
        "n_rel",
        "first_rel_rank",
        F.when(F.col("first_rel_rank").isNull(), F.lit(0.0))
        .otherwise(F.round(F.lit(1.0) / F.col("first_rel_rank"), decimals))
        .alias("rr"),
        F.round(F.col("_dcg_u") / F.lit(float(scale)), decimals).alias("dcg"),
        F.round(F.col("_idcg_u") / F.lit(float(scale)), decimals).alias("idcg"),
        F.when(F.col("_idcg_u") > 0, F.round(F.col("_dcg_u") / F.col("_idcg_u"), decimals))
        .alias("ndcg"),
    )


def average_precision(
    df: DataFrame,
    score_col: str,
    label_col: str,
    decimals: int = 6,
) -> DataFrame:
    """Area under the precision-recall curve as step-interpolated average
    precision (the `average_precision_score` definition, evaluated at
    distinct-score granularity so ties are handled as one group):

        AP = Σ_g (pos_g / n⁺) · precision@g,   precision@g = TP_cum / N_cum

    over distinct quantized scores DESCENDING. Like `auc_roc`, the group
    frame is bounded by the quantization (≤ 10^decimals + 1 rows), so
    the ordered prefix window never sees corpus-scale input. Each
    group's term is quantized to pico-units (ROUND(·×10¹²) — the
    per-term-rounding determinism recipe) and summed in DECIMAL(38,0),
    so partitioning can't move the result.

    Output: one row (n_pos, n_neg, pr_auc, baseline) — baseline is the
    positive rate, the AP of a random ranker, the number pr_auc must
    beat for the score to carry signal.
    """
    scale = 10**decimals
    q = F.expr(f"CAST(ROUND(CAST({score_col} AS DOUBLE) * {scale}) AS BIGINT)").alias("_s")
    y = F.col(label_col).cast("bigint")
    groups = (
        df.filter(F.col(score_col).isNotNull() & y.isNotNull())
        .select(q, y.alias("_y"))
        .groupBy("_s")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("_y").alias("pos"))
    )
    w = Window.orderBy(F.col("_s").desc()).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pref = groups.select(
        "pos",
        F.sum("pos").over(w).alias("tp_cum"),
        F.sum("cnt").over(w).alias("n_cum"),
    )
    term = F.expr(
        "CAST(ROUND(CAST(pos AS DOUBLE) * CAST(tp_cum AS DOUBLE) * 1e12 "
        "/ CAST(n_cum AS DOUBLE)) AS DECIMAL(38,0))"
    )
    agg = pref.agg(
        F.sum(term).alias("ap_pico"),
        F.sum("pos").alias("n_pos"),
        F.max("n_cum").alias("n_all"),
    )
    return agg.select(
        "n_pos",
        (F.col("n_all") - F.col("n_pos")).alias("n_neg"),
        F.when(
            F.col("n_pos") > 0,
            F.round(
                F.col("ap_pico").cast("double")
                / (F.col("n_pos").cast("double") * F.lit(1e12)),
                decimals,
            ),
        ).alias("pr_auc"),
        F.round(F.col("n_pos").cast("double") / F.col("n_all").cast("double"), decimals).alias(
            "baseline"
        ),
    )


def brier_score(
    df: DataFrame,
    score_col: str,
    label_col: str,
    decimals: int = 6,
) -> DataFrame:
    """Mean squared error of a probability against a 0/1 outcome — the
    proper scoring rule that punishes BOTH miscalibration and lack of
    resolution (its two Murphy-decomposition terms; `calibration_bins`
    reports the reliability half separately).

    Exact arithmetic: probabilities quantized to micro-units, squared
    error per row is an int64 ≤ 10¹², accumulated in DECIMAL(38,0) —
    one division at the edge. Also emits the reference Brier of always
    predicting the base rate (the skill floor: a useful score comes in
    BELOW it)."""
    scale = 10**decimals
    base = df.filter(F.col(score_col).isNotNull() & F.col(label_col).isNotNull()).select(
        F.expr(f"CAST(ROUND(CAST({score_col} AS DOUBLE) * {scale}) AS BIGINT)").alias("_sp"),
        F.col(label_col).cast("bigint").alias("_y"),
    )
    agg = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_y").alias("n_pos"),
        F.sum(
            ((F.col("_sp") - F.col("_y") * F.lit(scale)) * (F.col("_sp") - F.col("_y") * F.lit(scale)))
            .cast("decimal(38,0)")
        ).alias("_se"),
    )
    brier = F.col("_se").cast("double") / (F.col("n").cast("double") * F.lit(float(scale) ** 2))
    rate = F.col("n_pos").cast("double") / F.col("n").cast("double")
    return agg.select(
        "n",
        "n_pos",
        F.round(brier, decimals).alias("brier"),
        # base-rate reference: p̄(1-p̄), the Brier of the constant forecast
        F.round(rate * (F.lit(1.0) - rate), decimals).alias("brier_baseline"),
    )


def gains_table(
    df: DataFrame,
    score_col: str,
    label_col: str,
    id_col: str,
    n_buckets: int = 10,
    decimals: int = 6,
) -> DataFrame:
    """Cumulative gains / lift table: rank by score descending (id as
    the deterministic tiebreak — ntile needs a TOTAL order for
    cross-engine parity), split into ``n_buckets`` equal-count buckets,
    and report per bucket the positives captured so far and the lift of
    targeting only the top buckets vs random — the campaign-targeting /
    review-queue-sizing readout of a classifier.

    Counts are pure integers; the four ratios divide once each at the
    edge. The bucket assignment does NOT use a global ntile sort: the
    global rank comes from `plans.ranking.exact_global_rank` (bounded
    value-grid cumulative + per-score sharded row_number — scores are
    quantized, so the grid is bounded by construction) and the bucket
    from the closed-form `ntile_from_rank`; equivalence with real
    NTILE is test-asserted and the oracle uses SQL NTILE directly."""
    from morphik_core_spark.plans.ranking import exact_global_rank, ntile_from_rank

    base = df.filter(F.col(score_col).isNotNull() & F.col(label_col).isNotNull()).select(
        F.col(score_col).alias("_s"),
        F.col(label_col).cast("bigint").alias("_y"),
        F.col(id_col).alias("_id"),
    )
    from morphik_core_spark.plans.cache import scoped_persist

    # base rides both sides of the rank's value-grid join, ranked feeds
    # the row count AND the bucketing, per feeds totals AND the cumsum —
    # unpersisted that compounded to 8 corpus scans
    base = scoped_persist(base)
    ranked = scoped_persist(
        exact_global_rank(base, "_s", "_id", ascending=False, rank_col="_r")
    )
    bucketed = ranked.join(F.broadcast(ranked.agg(F.count(F.lit(1)).alias("_nn")))).select(
        "_y", ntile_from_rank("_r", "_nn", n_buckets).alias("bucket")
    )
    per = scoped_persist(bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"), F.sum("_y").alias("n_pos")
    ))
    wc = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tot = per.agg(
        F.sum("n").alias("_tn"), F.sum("n_pos").alias("_tp")
    )
    cum = per.select(
        "bucket",
        "n",
        "n_pos",
        F.sum("n").over(wc).alias("cum_n"),
        F.sum("n_pos").over(wc).alias("cum_pos"),
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            "n",
            "n_pos",
            F.round(F.col("cum_pos").cast("double") / F.col("_tp").cast("double"), decimals).alias(
                "capture_rate"
            ),
            F.round(
                (F.col("cum_pos").cast("double") / F.col("cum_n").cast("double"))
                / (F.col("_tp").cast("double") / F.col("_tn").cast("double")),
                decimals,
            ).alias("cum_lift"),
        )
        .orderBy("bucket")
    )


def threshold_sweep(
    df: DataFrame,
    score_col: str,
    label_col: str,
    thresholds: Sequence[float] = (0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9),
    decimals: int = 6,
) -> DataFrame:
    """Precision / recall / F1 / accuracy at each decision threshold —
    the operating-point table you read before picking the cutoff that
    gates a 100 TB filter.

    Shape: the corpus aggregates ONCE to distinct quantized scores
    (≤ 10^decimals + 1 rows by construction), and the threshold grid
    joins against that bounded frame — so sweeping 9 or 900 thresholds
    never rescans the data. All counts integral; ratios divide at the
    edge. Predicted-positive is score ≥ threshold, compared in integer
    micro-units so float drift can't flip a boundary row."""
    scale = 10**decimals
    groups = (
        df.filter(F.col(score_col).isNotNull() & F.col(label_col).isNotNull())
        .select(
            F.expr(f"CAST(ROUND(CAST({score_col} AS DOUBLE) * {scale}) AS BIGINT)").alias("_sp"),
            F.col(label_col).cast("bigint").alias("_y"),
        )
        .groupBy("_sp")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("_y").alias("pos"))
    )
    spark = df.sparkSession
    from morphik_core_spark.plans.literal import values_literal_frame

    thr = values_literal_frame(
        spark,
        [("threshold", "double"), ("_t", "bigint")],
        [(round(float(t), decimals), int(round(float(t) * scale))) for t in thresholds],
    )
    joined = groups.crossJoin(F.broadcast(thr))
    agg = joined.groupBy("threshold").agg(
        F.sum(F.when(F.col("_sp") >= F.col("_t"), F.col("pos")).otherwise(F.lit(0))).alias("tp"),
        F.sum(
            F.when(F.col("_sp") >= F.col("_t"), F.col("cnt") - F.col("pos")).otherwise(F.lit(0))
        ).alias("fp"),
        F.sum(F.when(F.col("_sp") < F.col("_t"), F.col("pos")).otherwise(F.lit(0))).alias("fn"),
        F.sum(
            F.when(F.col("_sp") < F.col("_t"), F.col("cnt") - F.col("pos")).otherwise(F.lit(0))
        ).alias("tn"),
    )
    prec = F.when(
        (F.col("tp") + F.col("fp")) > 0,
        F.col("tp").cast("double") / (F.col("tp") + F.col("fp")).cast("double"),
    )
    rec = F.when(
        (F.col("tp") + F.col("fn")) > 0,
        F.col("tp").cast("double") / (F.col("tp") + F.col("fn")).cast("double"),
    )
    f1 = F.when(
        (F.lit(2) * F.col("tp") + F.col("fp") + F.col("fn")) > 0,
        F.lit(2.0)
        * F.col("tp").cast("double")
        / (F.lit(2) * F.col("tp") + F.col("fp") + F.col("fn")).cast("double"),
    )
    acc = (F.col("tp") + F.col("tn")).cast("double") / (
        F.col("tp") + F.col("fp") + F.col("fn") + F.col("tn")
    ).cast("double")
    return agg.select(
        "threshold",
        "tp",
        "fp",
        "fn",
        "tn",
        F.round(prec, decimals).alias("precision"),
        F.round(rec, decimals).alias("recall"),
        F.round(f1, decimals).alias("f1"),
        F.round(acc, decimals).alias("accuracy"),
    ).orderBy("threshold")


def isotonic_calibration(
    df: DataFrame,
    score_col: str,
    label_col: str,
    grid_decimals: int = 3,
    decimals: int = 6,
) -> DataFrame:
    """Isotonic (PAVA) probability calibration of a score against a 0/1
    label, computed EXACTLY via the minimax characterization instead of
    the sequential pool-adjacent-violators loop:

        iso_i = max_{j ≤ i} min_{k ≥ i} mean(y[j..k])

    (the classical closed form of the isotonic regression). The score
    first quantizes to ``grid_decimals`` (calibration never needs more
    resolution than the downstream bins), so the distinct-score frame is
    ≤ 10^grid_decimals + 1 rows REGARDLESS of corpus size and the
    quadratic (j, k) interval grid stays ≤ ~500k rows at 3 decimals —
    bounded by construction, the AUC-family pattern. Interval means are
    single divisions of exact integer prefix sums (identical IEEE
    doubles on every engine); the min/max cascades are two window
    passes over the bounded grid.

    Output per distinct quantized score: (score, n, pos, raw_rate,
    iso_prob) — iso_prob is non-decreasing in score by construction;
    wherever raw_rate is non-monotone the pooling shows as plateaus.
    This is the Zadrozny-Elkan calibrator `calibration_bins` only
    diagnoses.
    """
    gscale = 10**grid_decimals
    q = F.expr(f"CAST(ROUND(CAST({score_col} AS DOUBLE) * {gscale}) AS BIGINT)").alias("_s")
    y = F.col(label_col).cast("bigint")
    groups = (
        df.filter(F.col(score_col).isNotNull() & y.isNotNull())
        .select(q, y.alias("_y"))
        .groupBy("_s")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("_y").alias("pos"))
    )
    w_idx = Window.orderBy("_s")
    w_cum = w_idx.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    idx = groups.select(
        "_s",
        "cnt",
        "pos",
        F.row_number().over(w_idx).alias("_i"),
        F.sum("cnt").over(w_cum).alias("_N"),
        F.sum("pos").over(w_cum).alias("_P"),
    )
    left = idx.select(
        F.col("_i").alias("j"),
        (F.col("_N") - F.col("cnt")).alias("n_before"),
        (F.col("_P") - F.col("pos")).alias("p_before"),
    )
    right = idx.select(F.col("_i").alias("k"), F.col("_N").alias("n_k"), F.col("_P").alias("p_k"))
    grid = left.join(right, F.col("j") <= F.col("k"))
    a = (F.col("p_k") - F.col("p_before")).cast("double") / (
        F.col("n_k") - F.col("n_before")
    ).cast("double")
    # inner min over k >= i for each j: running min over k DESC per j
    w_min = (
        Window.partitionBy("j")
        .orderBy(F.col("k").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    m = grid.select("j", "k", F.min(a).over(w_min).alias("_m"))
    # outer max over j <= i: rows (j, k=i) already satisfy j <= i
    iso = m.groupBy(F.col("k").alias("_i")).agg(F.max("_m").alias("_iso"))
    return (
        idx.join(iso, "_i")
        .select(
            F.round(F.col("_s").cast("double") / F.lit(float(gscale)), grid_decimals).alias(
                "score"
            ),
            F.col("cnt").alias("n"),
            "pos",
            F.round(F.col("pos").cast("double") / F.col("cnt").cast("double"), decimals).alias(
                "raw_rate"
            ),
            F.round(F.col("_iso"), decimals).alias("iso_prob"),
        )
        .orderBy("score")
    )


def mcnemar_test(
    df: DataFrame,
    keep_a_col: str,
    keep_b_col: str,
    decimals: int = 6,
) -> DataFrame:
    """McNemar's paired test between two binary decision columns over the
    SAME rows — the correct way to ask "do these two quality filters
    disagree more than coin-flip noise" (an unpaired chi-square wastes
    the pairing and understates power; `cohens_kappa` measures agreement
    magnitude, not its significance). Only the discordant cells matter:

        b = A keeps, B drops;  c = A drops, B keeps
        chi2_cc = (|b − c| − 1)² / (b + c)      (continuity-corrected)

    Pure integer counts until the single final division; NULL statistic
    when b + c = 0 (the test is undefined — the filters never disagree).
    One combinable scan; output ONE row: (n, n_both_keep, n_both_drop,
    b_only_a, c_only_b, chi2_cc).
    """
    a = F.col(keep_a_col).cast("boolean")
    b = F.col(keep_b_col).cast("boolean")
    agg = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((a & b).cast("long")).alias("n_both_keep"),
        F.sum((~a & ~b).cast("long")).alias("n_both_drop"),
        F.sum((a & ~b).cast("long")).alias("b_only_a"),
        F.sum((~a & b).cast("long")).alias("c_only_b"),
    )
    disc = F.col("b_only_a") + F.col("c_only_b")
    diff = F.abs(F.col("b_only_a") - F.col("c_only_b"))
    return agg.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("n_both_keep").cast("bigint").alias("n_both_keep"),
        F.col("n_both_drop").cast("bigint").alias("n_both_drop"),
        F.col("b_only_a").cast("bigint").alias("b_only_a"),
        F.col("c_only_b").cast("bigint").alias("c_only_b"),
        F.when(
            disc > 0,
            F.round(
                ((diff - 1) * (diff - 1)).cast("double") / disc.cast("double"), decimals
            ),
        ).alias("chi2_cc"),
    )


def rbo_weights(k: int, p: float) -> list[int]:
    """The truncated-RBO per-entry weights, pico-quantized: an item
    whose later-of-the-two ranks is m contributes W(m) = Σ_{d=m..k}
    p^{d−1}/d to the overlap sum. p^{d−1} is built by ITERATIVE IEEE
    multiplication (never pow — libm pow is not ulp-portable across
    engines), each W rounds once to integer pico-units, and the list is
    shared verbatim by the Spark spine and the generated oracle, so
    both engines reduce identical integers."""
    pows = [1.0]
    for _ in range(1, k):
        pows.append(pows[-1] * p)
    out = []
    for m in range(1, k + 1):
        acc = 0.0
        for d in range(m, k + 1):
            acc += pows[d - 1] / d
        out.append(round(acc * 1e12))
    return out


def rank_biased_overlap(
    a: DataFrame,
    b: DataFrame,
    key_col: str,
    rank_col: str,
    k: int = 100,
    p: float = 0.9,
    decimals: int = 6,
) -> DataFrame:
    """Truncated rank-biased overlap (Webber, Moffat & Zobel 2010)
    between two rankings: RBO@k = (1−p) Σ_{d=1..k} p^{d−1} ·
    |A_d ∩ B_d| / d — the top-weighted agreement measure for comparing
    result lists (`ranking_metrics` grades ONE list against judgments;
    RBO compares two lists to each other: dense vs sparse retrieval,
    this period's top customers vs last period's, pre- vs post-deploy).

    The prefix-intersection telescopes per key: an item ranked r_a and
    r_b enters every prefix depth d ≥ max(r_a, r_b), so its total
    contribution is W(max(r_a, r_b)) from :func:`rbo_weights` — one
    equi-join on the key, one lookup join against the k-row weight
    spine, one integer sum. No per-depth pass, no window over the
    corpus; inputs are already-ranked frames (dimension-sized top-k
    lists by construction).

    Output ONE row: (k, n_overlap, rbo).
    """
    spark = a.sparkSession
    w_u = rbo_weights(int(k), float(p))
    from morphik_core_spark.plans.literal import values_literal_frame

    spine = values_literal_frame(
        spark, [("m", "int"), ("w_u", "bigint")], [(m + 1, w_u[m]) for m in range(int(k))]
    )
    ra = a.filter(F.col(rank_col) <= k).select(
        F.col(key_col).alias("_k"), F.col(rank_col).cast("int").alias("_ra")
    )
    rb = b.filter(F.col(rank_col) <= k).select(
        F.col(key_col).alias("_k"), F.col(rank_col).cast("int").alias("_rb")
    )
    both = ra.join(rb, "_k").select(
        F.greatest(F.col("_ra"), F.col("_rb")).alias("m")
    )
    agg = both.join(F.broadcast(spine), "m").agg(
        F.count(F.lit(1)).alias("n_overlap"), F.sum("w_u").alias("_s_u")
    )
    return agg.select(
        F.lit(int(k)).cast("bigint").alias("k"),
        F.coalesce(F.col("n_overlap"), F.lit(0)).cast("bigint").alias("n_overlap"),
        F.round(
            F.expr(f"({1.0 - float(p)!r}) * CAST(coalesce(_s_u, 0) AS DOUBLE) / 1e12"),
            decimals,
        ).alias("rbo"),
    )
