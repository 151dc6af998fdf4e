"""Unit tests for the round-6 second-session operators: interval×interval
overlap pairs, deletion-neighborhood edit-distance pairs, the GraphRAG
term-graph build/expansion, the rolling-median anomaly screen, and
per-class l-diversity.

The oracle-parity gate pins each query's values vs DuckDB; these pin the
operator properties the oracle can't see: equivalence of the bucket
decomposition to the naive quadratic overlap join (boundary hits,
negative axes, malformed rows), completeness/exactness of the SymSpell
blocking vs brute-force Levenshtein, the expansion's tie rules and caps,
and the rolling median vs pandas on both window parities.
"""

from __future__ import annotations

import itertools
import random

import pytest
from pyspark.sql import functions as F

from morphik_core_spark.operators.analytics import rolling_median_flags
from morphik_core_spark.operators.asof import interval_overlap_pairs
from morphik_core_spark.operators.dedup import edit_distance_pairs
from morphik_core_spark.operators.graph import (
    seed_expansion_weights,
    term_cooccurrence_edges,
)
from morphik_core_spark.operators.validation import l_diversity_classes


# ------------------------------------------------- interval overlap


def _naive_pairs(rows):
    out = set()
    for (ka, sa, ea), (kb, sb, eb) in itertools.combinations(rows, 2):
        if sa <= eb and sb <= ea:
            out.add((min(ka, kb), max(ka, kb)))
    return out


@pytest.mark.parametrize("width", [1, 3, 7, 32])
def test_interval_overlap_matches_naive(spark, width):
    rng = random.Random(7)
    rows = []
    for i in range(120):
        lo = rng.randint(-50, 100)
        rows.append((i, lo, lo + rng.randint(0, 25)))
    df = spark.createDataFrame(rows, "id long, lo long, hi long")
    got = {
        (r.id_a, r.id_b)
        for r in interval_overlap_pairs(df, "id", "lo", "hi", bucket_width=width).collect()
    }
    assert got == _naive_pairs(rows)


def test_interval_overlap_pair_emitted_exactly_once(spark):
    # long intervals spanning many buckets: the count-once rule must not
    # duplicate the pair per shared bucket
    df = spark.createDataFrame(
        [(1, 0, 100), (2, 50, 150), (3, 90, 95)], "id long, lo long, hi long"
    )
    out = interval_overlap_pairs(df, "id", "lo", "hi", bucket_width=8).collect()
    pairs = [(r.id_a, r.id_b) for r in out]
    assert sorted(pairs) == [(1, 2), (1, 3), (2, 3)]
    assert len(pairs) == len(set(pairs))


def test_interval_overlap_boundary_and_keys(spark):
    # touching endpoints are inclusive; key columns shard the pair space
    df = spark.createDataFrame(
        [("a", 1, 0, 10), ("a", 2, 10, 20), ("b", 3, 0, 10), ("b", 4, 11, 20)],
        "grp string, id long, lo long, hi long",
    )
    out = interval_overlap_pairs(df, "id", "lo", "hi", bucket_width=4, key_cols=["grp"])
    assert [(r.grp, r.id_a, r.id_b) for r in out.collect()] == [("a", 1, 2)]


def test_interval_overlap_malformed_rows_dropped(spark):
    # hi < lo and NULL bounds must not kill the job (F.sequence guard)
    df = spark.createDataFrame(
        [(1, 10, 0), (2, None, 5), (3, 0, 5), (4, 3, 8)],
        "id long, lo long, hi long",
    )
    out = interval_overlap_pairs(df, "id", "lo", "hi", bucket_width=4).collect()
    assert [(r.id_a, r.id_b) for r in out] == [(3, 4)]


# --------------------------------------------- edit-distance pairs


def _lev(a, b):
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_edit_distance_pairs_matches_bruteforce(spark):
    rng = random.Random(11)
    alphabet = "abc"
    strings = ["".join(rng.choice(alphabet) for _ in range(rng.randint(0, 5))) for _ in range(80)]
    df = spark.createDataFrame(list(enumerate(strings)), "id long, s string")
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in edit_distance_pairs(df, "s", "id").collect()
    }
    want = {
        (i, j, _lev(strings[i], strings[j]))
        for i in range(len(strings))
        for j in range(i + 1, len(strings))
        if _lev(strings[i], strings[j]) <= 1
    }
    assert got == want


def test_edit_distance_pairs_edit_kinds(spark):
    df = spark.createDataFrame(
        [(1, "spark"), (2, "spark"), (3, "spark!"), (4, "park"), (5, "spurk"), (6, "sprk"),
         (7, "stork")],
        "id long, s string",
    )
    got = {(r.id_a, r.id_b): r.dist for r in edit_distance_pairs(df, "s", "id").collect()}
    # identical (d=0), append, delete-first, substitute, delete-middle
    assert got[(1, 2)] == 0
    assert got[(1, 3)] == 1 and got[(1, 4)] == 1 and got[(1, 5)] == 1 and got[(1, 6)] == 1
    assert (1, 7) not in got  # distance 2
    assert (4, 5) not in got  # park vs spurk = 2


def test_edit_distance_pairs_hot_bucket_cap(spark):
    # 40 copies of one short token: every deletion bucket is hot; the cap
    # drops them all, so no pairs emerge (the valve, not the default)
    df = spark.createDataFrame([(i, "aa") for i in range(40)], "id long, s string")
    assert edit_distance_pairs(df, "s", "id", max_bucket_size=10).count() == 0
    assert edit_distance_pairs(df, "s", "id").count() == 40 * 39 // 2


# --------------------------------------------------------- GraphRAG


def test_term_cooccurrence_edges_counts_presence(spark):
    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "a b c"), (3, "b c")], "doc_id long, text string"
    )
    got = {
        (r.term_a, r.term_b): r.weight
        for r in term_cooccurrence_edges(docs, "text", "doc_id").collect()
    }
    # presence not frequency: doc 1 contributes (a,b) once
    assert got == {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 2}


def test_term_cooccurrence_max_terms_cap(spark):
    docs = spark.createDataFrame(
        [(1, "a a a b b c")], "doc_id long, text string"
    )
    got = {
        (r.term_a, r.term_b)
        for r in term_cooccurrence_edges(
            docs, "text", "doc_id", max_terms_per_doc=2
        ).collect()
    }
    # top-2 by tf keeps a, b; c is cut -> only the (a, b) edge
    assert got == {("a", "b")}


def test_seed_expansion_weights_topk_and_ties(spark):
    edges = spark.createDataFrame(
        [("q", "x", 5), ("q", "y", 5), ("q", "z", 3), ("x", "y", 9)],
        "term_a string, term_b string, weight long",
    )
    got = {(r.term, r.wt) for r in seed_expansion_weights(edges, ["q"], k=2, seed_weight=100).collect()}
    # x and y tie at 5 -> both beat z; lexicographic tie order doesn't
    # change membership at k=2; seed rides at seed_weight
    assert got == {("q", 100), ("x", 5), ("y", 5)}
    got3 = {r.term for r in seed_expansion_weights(edges, ["q"], k=1, seed_weight=100).collect()}
    assert got3 == {"q", "x"}  # tie at 5 -> 'x' < 'y'


# --------------------------------------------------- rolling median


def test_rolling_median_matches_pandas(spark):
    pd = pytest.importorskip("pandas")
    rng = random.Random(3)
    vals = [rng.randint(0, 40) for _ in range(60)]
    df = spark.createDataFrame(list(enumerate(vals)), "t long, x long")
    for hw in (2, 3):
        out = {
            r.t: r.med
            for r in rolling_median_flags(df, "t", "x", half_window=hw).collect()
        }
        want = (
            pd.Series(vals).rolling(2 * hw + 1, center=True, min_periods=1).median()
        )
        assert out == {i: float(want[i]) for i in range(len(vals))}


def test_rolling_median_flag_rule_and_groups(spark):
    # per-group screens sort independently; |x - med| > med/2 exact rule
    rows = [("g1", t, 10) for t in range(9)] + [("g2", t, 10) for t in range(9)]
    rows[4] = ("g1", 4, 16)   # |16-10| = 6 > 5 -> anomaly
    rows[13] = ("g2", 4, 15)  # |15-10| = 5 = med/2 -> NOT anomaly (strict >)
    df = spark.createDataFrame(rows, "g string, t long, x long")
    out = rolling_median_flags(df, "t", "x", half_window=4, group_cols=["g"])
    flagged = {(r.g, r.t) for r in out.filter("is_anomaly").collect()}
    assert flagged == {("g1", 4)}


# ------------------------------------------------------ l-diversity


def test_l_diversity_classes_rows_vs_entities(spark):
    df = spark.createDataFrame(
        [("q1", "e1", "s1"), ("q1", "e1", "s2"), ("q1", "e2", "s1"),
         ("q2", "e3", "s1"), ("q2", "e4", "s1")],
        "qi string, ent string, sens string",
    )
    by_rows = {r.qi: (r.class_size, r.l_div, r.violates_l)
               for r in l_diversity_classes(df, ["qi"], "sens", l=2).collect()}
    assert by_rows == {"q1": (3, 2, False), "q2": (2, 1, True)}
    by_ent = {r.qi: r.class_size
              for r in l_diversity_classes(df, ["qi"], "sens", l=2, entity_col="ent").collect()}
    assert by_ent == {"q1": 2, "q2": 2}


# ------------------------------------------------- peak concurrency


def test_peak_concurrency_matches_naive(spark):
    from morphik_core_spark.operators.asof import peak_concurrency

    rng = random.Random(5)
    rows = []
    for i in range(150):
        lo = rng.randint(0, 60)
        rows.append((i % 3, i, lo, lo + rng.randint(0, 15)))
    df = spark.createDataFrame(rows, "grp int, id long, lo long, hi long")
    got = {(r.grp): (r.peak, r.peak_at) for r in peak_concurrency(df, ["grp"], "lo", "hi").collect()}
    for g in (0, 1, 2):
        ivs = [(lo, hi) for (gg, _i, lo, hi) in rows if gg == g]
        counts = {}
        for d in range(0, 80):
            counts[d] = sum(1 for lo, hi in ivs if lo <= d <= hi)
        peak = max(counts.values())
        first = min(d for d, c in counts.items() if c == peak)
        assert got[g] == (peak, first)


def test_peak_concurrency_malformed_dropped(spark):
    from morphik_core_spark.operators.asof import peak_concurrency

    df = spark.createDataFrame(
        [(1, 5, 0), (2, None, 3), (3, 1, 4)], "id long, lo long, hi long"
    )
    out = peak_concurrency(df.withColumn("g", F.lit(1)), ["g"], "lo", "hi").collect()
    assert [(r.peak, r.peak_at) for r in out] == [(1, 1)]


# ------------------------------------------------- changepoint split


def test_cusum_split_finds_level_shift(spark):
    from morphik_core_spark.operators.analytics import cusum_split

    vals = [10] * 30 + [20] * 30
    df = spark.createDataFrame(list(enumerate(vals)), "t long, x long")
    row = cusum_split(df, "t", "x").collect()[0]
    assert row.split_at == 29  # last point of the left segment
    assert row.mean_left == 10.0 and row.mean_right == 20.0


def test_cusum_split_tie_earliest(spark):
    from morphik_core_spark.operators.analytics import cusum_split

    # symmetric bump: D_t ties across the flat middle -> earliest wins
    vals = [0, 10, 10, 0]
    df = spark.createDataFrame(list(enumerate(vals)), "t long, x long")
    row = cusum_split(df, "t", "x").collect()[0]
    assert row.split_at == 0


# ------------------------------------------------------- HLL merge


def test_hll_merge_equals_direct(spark):
    from morphik_core_spark.operators.sketches import (
        hll_distinct,
        hll_estimate_from_registers,
        hll_merge,
        hll_registers,
    )

    rows = [("r1", f"n{i % 5}", f"v{i % 700}") for i in range(3000)] + [
        ("r2", f"n{i % 3}", f"v{i % 90}") for i in range(500)
    ]
    df = spark.createDataFrame(rows, "region string, nat string, v string")
    fine = hll_registers(df, ["region", "nat"], "v", p=7)
    merged = hll_estimate_from_registers(hll_merge(fine, ["region"]), ["region"], p=7)
    direct = hll_distinct(df, ["region"], "v", p=7)
    got = {r.region: (r.registers_used, r.distinct_est) for r in merged.collect()}
    want = {r.region: (r.registers_used, r.distinct_est) for r in direct.collect()}
    assert got == want  # MAX-merge == direct sketch, bit-identical


# ------------------------------------------------- sequence n-grams


def test_sequence_ngrams_counts(spark):
    from morphik_core_spark.operators.analytics import sequence_ngrams

    rows = [(1, i, v) for i, v in enumerate("abcabc")] + [(2, i, v) for i, v in enumerate("abX")]
    df = spark.createDataFrame(rows, "u long, t long, v string")
    got = {
        (r.g1, r.g2, r.g3): r.n_occurrences
        for r in sequence_ngrams(df, ["u"], ["t"], "v", n=3).collect()
    }
    # user 1: abc,bca,cab,abc ; user 2: abX
    assert got == {("a", "b", "c"): 2, ("b", "c", "a"): 1, ("c", "a", "b"): 1, ("a", "b", "X"): 1}
    bi = {
        (r.g1, r.g2): r.n_occurrences
        for r in sequence_ngrams(df, ["u"], ["t"], "v", n=2).collect()
    }
    assert bi[("a", "b")] == 3


# -------------------------------------------- quantile normalization


def test_quantile_normalize_identity_single_group(spark):
    # with one group at grid >= n, each value maps to itself (same rank
    # in group and globally)
    from morphik_core_spark.operators.curation import quantile_normalize

    rows = [(i, 1, float(v)) for i, v in enumerate([5, 1, 9, 3, 7, 2, 8])]
    df = spark.createDataFrame(rows, "id long, g int, v double")
    out = quantile_normalize(df, ["g"], "v", "id").collect()
    assert all(r.v == r.norm_value for r in out)
    # the per-mille grid lever may bias a rank by at most one global step
    approx = quantile_normalize(df, ["g"], "v", "id", grid=1000).collect()
    ordered = sorted(r[0] for r in df.select("v").collect())
    for r in approx:
        i = ordered.index(r.v)
        assert r.norm_value in ordered[i : i + 2]


def test_quantile_normalize_maps_group_max_to_global_max(spark):
    from morphik_core_spark.operators.curation import quantile_normalize

    # two groups with disjoint ranges: each group's max hits per-mille
    # 1000 -> the GLOBAL max; each group's min hits the global min span
    rows = [(i, "lo", float(v)) for i, v in enumerate([1, 2, 3, 4])] + [
        (i + 10, "hi", float(v)) for i, v in enumerate([101, 102, 103, 104])
    ]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    out = {(r.g, r.v): r.norm_value for r in quantile_normalize(df, ["g"], "v", "id").collect()}
    assert out[("lo", 4.0)] == 104.0 and out[("hi", 104.0)] == 104.0
    # same within-group rank -> same normalized value across groups
    assert out[("lo", 1.0)] == out[("hi", 101.0)]


# --------------------------------------------- mutual information


def test_mutual_information_independent_and_dependent(spark):
    from morphik_core_spark.operators.analytics import mutual_information

    import math

    # perfectly dependent: MI = ln(2); independent 2x2: MI = 0
    dep = spark.createDataFrame([("a", "x")] * 50 + [("b", "y")] * 50, "u string, v string")
    ind = spark.createDataFrame(
        [("a", "x")] * 25 + [("a", "y")] * 25 + [("b", "x")] * 25 + [("b", "y")] * 25,
        "u string, v string",
    )
    mi_dep = mutual_information(dep, "u", "v").collect()[0].mi_nats
    mi_ind = mutual_information(ind, "u", "v").collect()[0].mi_nats
    assert abs(mi_dep - math.log(2)) < 1e-9
    assert mi_ind == 0.0


# ----------------------------------------------- curriculum order


def test_curriculum_order_interleaves_buckets(spark):
    from morphik_core_spark.operators.curation import curriculum_order

    rows = [(i, i * 10) for i in range(40)]
    df = spark.createDataFrame(rows, "id long, diff long")
    out = curriculum_order(df, "id", "diff", n_buckets=4).collect()
    assert sorted(r.position for r in out) == list(range(1, 41))
    # the first 4 positions cover all 4 buckets (one per bucket), and so
    # does every subsequent stripe of 4
    by_pos = {r.position: r.bucket for r in out}
    for stripe in range(10):
        assert sorted(by_pos[stripe * 4 + j] for j in range(1, 5)) == [1, 2, 3, 4]
    # deterministic under re-run
    again = {r.position: r.id for r in curriculum_order(df, "id", "diff", n_buckets=4).collect()}
    assert again == {r.position: r.id for r in out}


# ------------------------------------------------- interval islands


def test_interval_islands_matches_naive(spark):
    from morphik_core_spark.operators.asof import interval_islands

    rng = random.Random(13)
    rows = []
    for i in range(200):
        lo = rng.randint(0, 80)
        rows.append((i % 4, lo, lo + rng.randint(0, 12)))
    df = spark.createDataFrame(rows, "g int, lo long, hi long")
    got = {
        (r.g, r.island_start, r.island_end, r.n_intervals)
        for r in interval_islands(df, ["g"], "lo", "hi").collect()
    }
    want = set()
    for g in range(4):
        ivs = sorted((lo, hi) for (gg, lo, hi) in rows if gg == g)
        cur_s, cur_e, n = None, None, 0
        for lo, hi in ivs:
            if cur_s is None or lo > cur_e:
                if cur_s is not None:
                    want.add((g, cur_s, cur_e, n))
                cur_s, cur_e, n = lo, hi, 1
            else:
                cur_e, n = max(cur_e, hi), n + 1
        if cur_s is not None:
            want.add((g, cur_s, cur_e, n))
    assert got == want


def test_interval_islands_touching_merge_and_malformed(spark):
    from morphik_core_spark.operators.asof import interval_islands

    df = spark.createDataFrame(
        [(1, 0, 5), (1, 5, 9), (1, 11, 12), (1, 9, 3), (1, None, 4)],
        "g int, lo long, hi long",
    )
    got = sorted(
        (r.island_start, r.island_end, r.n_intervals)
        for r in interval_islands(df, ["g"], "lo", "hi").collect()
    )
    # touching at 5 merges (inclusive ends); malformed rows dropped
    assert got == [(0, 9, 2), (11, 12, 1)]


# ---------------------------------------------- markov attribution


def test_markov_journey_transitions_hand_case(spark):
    from morphik_core_spark.operators.analytics import markov_journey_transitions

    # user 1: a -> b -> CONV, then trailing a (never converts)
    # user 2: b -> CONV; user 3: a (never converts)
    rows = [
        (1, 1, "a"), (1, 2, "b"), (1, 3, "buy"), (1, 4, "a"),
        (2, 1, "b"), (2, 2, "buy"),
        (3, 1, "a"),
    ]
    df = spark.createDataFrame(rows, "u long, t long, et string")
    got = {
        (r.src, r.dst): r.n
        for r in markov_journey_transitions(df, "u", ["t"], "et", "buy").collect()
    }
    assert got == {
        ("__start__", "a"): 3,
        ("__start__", "b"): 1,
        ("a", "b"): 1,
        ("b", "__conv__"): 2,
        ("a", "__null__"): 2,
    }


def test_markov_removal_effect_knockout(spark):
    from morphik_core_spark.operators.analytics import markov_removal_effects

    # every conversion flows through b: removing b kills ALL conversion
    # (effect 1.0); removing a still leaves start->b->conv paths
    rows = [
        (1, 1, "a"), (1, 2, "b"), (1, 3, "buy"),
        (2, 1, "b"), (2, 2, "buy"),
        (3, 1, "a"),
    ]
    df = spark.createDataFrame(rows, "u long, t long, et string")
    got = {
        r.channel: (r.p_base, r.p_removed, r.removal_effect)
        for r in markov_removal_effects(df, "u", ["t"], "et", "buy", iterations=10).collect()
    }
    assert set(got) == {"a", "b"}
    assert got["b"][1] == 0.0 and got["b"][2] == 1.0
    assert 0.0 < got["a"][2] < 1.0
    assert got["a"][0] == got["b"][0]  # same base probability


def test_cms_sketch_group_cols_independent(spark):
    from morphik_core_spark.operators.sketches import cms_estimates, cms_sketch

    rows = [("g1", "x", 5), ("g1", "y", 3), ("g2", "x", 7)]
    counts = spark.createDataFrame(rows, "g string, tok string, n long")
    sk = cms_sketch(counts, "tok", "n", depth=3, width=64, group_cols=["g"])
    cands = counts.selectExpr("g", "tok", "n AS exact")
    got = {
        (r.g, r.tok): r.cms_est
        for r in cms_estimates(cands, sk, "tok", depth=3, width=64, group_cols=["g"]).collect()
    }
    # width 64 >> 3 tokens: no collisions, estimates exact per group
    assert got == {("g1", "x"): 5, ("g1", "y"): 3, ("g2", "x"): 7}


# -------------------------------------------------- t-closeness


def test_t_closeness_skew_and_uniform(spark):
    from morphik_core_spark.operators.validation import t_closeness_classes

    # global: 50/50 of s1/s2. class q1 mirrors it (tvd 0); class q2 is
    # all-s1 (tvd 0.5 > 0.3); class q3 60/40 (tvd 0.1, safe)
    rows = (
        [("q1", "s1")] * 10 + [("q1", "s2")] * 10
        + [("q2", "s1")] * 20
        + [("q3", "s1")] * 12 + [("q3", "s2")] * 8
    )
    # rebalance so global is exactly 50/50: add a q4 block
    rows += [("q4", "s2")] * 14
    df = spark.createDataFrame(rows, "qi string, s string")
    got = {
        r.qi: (r.class_size, r.tvd, r.violates_t)
        for r in t_closeness_classes(df, ["qi"], "s", t_num=3, t_den=10).collect()
    }
    n1 = 10 + 20 + 12          # 42 s1
    n2 = 10 + 8 + 14           # 32 s2
    N = n1 + n2
    def tvd(c1, c2, nc):
        return 0.5 * (abs(c1 / nc - n1 / N) + abs(c2 / nc - n2 / N))
    assert got["q2"][2] is True and abs(got["q2"][1] - round(tvd(20, 0, 20), 6)) < 1e-9
    assert got["q1"][2] is (tvd(10, 10, 20) > 0.3)
    assert got["q4"][2] is True  # all-s2 block is maximally far
    assert got["q3"][2] is (tvd(12, 8, 20) > 0.3)


# ------------------------------------------- random-fuzz references


def test_quantile_normalize_matches_python_reference(spark):
    from morphik_core_spark.operators.curation import quantile_normalize

    rng = random.Random(21)
    rows = [
        (i, rng.choice("pqr"), float(rng.randint(0, 50)))  # heavy value ties
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    got = {r.id: r.norm_value for r in quantile_normalize(df, ["g"], "v", "id").collect()}

    all_sorted = sorted(v for _i, _g, v in rows)
    N = len(all_sorted)
    by_g = {}
    for i, g, v in rows:
        by_g.setdefault(g, []).append((v, i))
    want = {}
    for g, items in by_g.items():
        items.sort()
        n = len(items)
        for r0, (_v, i) in enumerate(items, 1):
            k = -(-r0 * N // n)  # ceil
            want[i] = all_sorted[k - 1]
    assert got == want


def test_markov_matches_python_simulation(spark):
    from morphik_core_spark.operators.analytics import markov_removal_effects

    rng = random.Random(33)
    rows = []
    for u in range(40):
        t = 0
        for _ in range(rng.randint(1, 12)):
            t += 1
            rows.append((u, t, rng.choice(["a", "b", "c", "buy"])))
    df = spark.createDataFrame(rows, "u long, t long, et string")
    got = {
        r.channel: (r.p_base, r.p_removed)
        for r in markov_removal_effects(df, "u", ["t"], "et", "buy", iterations=10).collect()
    }

    # pure-python reference: same journey split, same integer fixed point
    SCALE = 1_000_000
    from collections import defaultdict

    edges = defaultdict(int)
    by_u = defaultdict(list)
    for u, t, et in rows:
        by_u[u].append((t, et))
    for u, evs in by_u.items():
        evs.sort()
        prev, converted = "__start__", False
        for _t, et in evs:
            st = "__conv__" if et == "buy" else et
            edges[(prev, st)] += 1
            if st == "__conv__":
                prev, converted = "__start__", True
            else:
                prev, converted = st, False
        if prev != "__start__":
            edges[(prev, "__null__")] += 1

    channels = sorted({d for (_s, d) in edges if d not in ("__conv__", "__null__")})

    def absorb(removed):
        e2 = defaultdict(int)
        for (s, d), n in edges.items():
            e2[(s, "__null__" if d == removed else d)] += n
        tot = defaultdict(int)
        for (s, _d), n in e2.items():
            tot[s] += n
        tu = {(s, d): n * SCALE // tot[s] for (s, d), n in e2.items()}
        p = {}
        for _ in range(10):
            nxt = defaultdict(int)
            for (s, d), t_u in tu.items():
                pv = SCALE if d == "__conv__" else p.get(d, 0)
                nxt[s] += t_u * pv
            p = {k: v // SCALE for k, v in nxt.items()}
        return p.get("__start__", 0)

    pb = absorb(None)
    for c in channels:
        want = (round(pb / SCALE, 6), round(absorb(c) / SCALE, 6))
        assert got[c] == want, f"{c}: {got[c]} vs {want}"


# ------------------------------------------- token budget mixture


def test_token_budget_mixture_invariants(spark):
    from morphik_core_spark.operators.curation import token_budget_mixture

    rng = random.Random(17)
    rows = [
        (i, f"s{i % 4}", rng.randint(50, 400)) for i in range(120)
    ]
    df = spark.createDataFrame(rows, "id long, src string, sz long")
    out = token_budget_mixture(df, "src", "id", "sz", budget=5000).collect()
    # largest-remainder apportionment sums EXACTLY to the budget
    assert sum(r.alloc_tokens for r in out) == 5000
    # greedy prefix never overshoots its allocation
    assert all(r.tokens_taken <= r.alloc_tokens for r in out)
    # deterministic under re-run
    again = token_budget_mixture(df, "src", "id", "sz", budget=5000).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    # temperature 0.5: a 16x-larger source gets sqrt(16) = 4x the weight
    big = [("b", "big", 400)] * 64 + [("s", "small", 400)] * 4
    df2 = spark.createDataFrame(
        [(i, s, z) for i, (_k, s, z) in enumerate(big)], "id long, src string, sz long"
    )
    w = {r.source: r.weight for r in token_budget_mixture(df2, "src", "id", "sz", budget=100).collect()}
    assert w["big"] == 160 and w["small"] == 40  # sqrt(64*400), sqrt(4*400)
