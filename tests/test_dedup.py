"""Dedup operator behavior on known-duplicate corpora."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from morphik_core_spark.operators import dedup

DOCS = [
    (1, "The quick brown fox jumps over the lazy dog"),
    (2, "the  quick BROWN fox   jumps over the lazy dog"),  # exact dup after normalize
    (3, "The quick brown fox jumps over the lazy cat"),  # near-dup (one word)
    (4, "completely different content about spark engines and shuffles"),
    (5, "spark engines and shuffles completely different content about"),  # rotated
    (6, "tiny"),  # shorter than shingle width
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string").cache()


def test_exact_duplicates(docs):
    out = {r.doc_id: r for r in dedup.exact_duplicates(docs, "text", "doc_id").collect()}
    assert out[1].keeper_id == 1 and out[2].keeper_id == 1
    assert out[1].group_size == 2
    assert out[3].keeper_id == 3 and out[3].group_size == 1
    assert len(out) == len(DOCS)


def test_shingles_drop_short_docs(docs):
    sh = dedup.word_shingles(docs, "text", "doc_id", n=3)
    ids = {r.doc_id for r in sh.select("doc_id").distinct().collect()}
    assert 6 not in ids and 1 in ids


def test_minhash_identical_docs_same_signature(docs):
    sh = dedup.word_shingles(docs, "text", "doc_id", n=3)
    sigs = {r.doc_id: tuple(r)[1:] for r in dedup.minhash_signatures(sh, "doc_id").collect()}
    assert sigs[1] == sigs[2]  # identical shingle sets → identical signatures
    assert sigs[1] != sigs[4]


def test_minhash_inline_bit_identical_to_exploded(docs):
    """The zero-shuffle map-side fold must match the exploded groupBy-min
    form exactly — same normalize, shingles, hash family, and types."""
    sh = dedup.word_shingles(docs, "text", "doc_id", n=3)
    exploded = sorted(tuple(r) for r in dedup.minhash_signatures(sh, "doc_id").collect())
    inline = sorted(
        tuple(r) for r in dedup.minhash_signatures_inline(docs, "text", "doc_id", n=3).collect()
    )
    assert inline == exploded


def test_lsh_carry_cols_ride_through_pairs(docs):
    """carry_cols emits both sides' signature columns beside the pair ids,
    matching what an explicit re-join of the signature frame would give."""
    sh = dedup.word_shingles(docs, "text", "doc_id", n=3)
    sigs = dedup.minhash_signatures(sh, "doc_id")
    mh = [c for c in sigs.columns if c != "doc_id"]
    carried = dedup.lsh_candidate_pairs(sigs, "doc_id", 4, 2, carry_cols=mh)
    sig_map = {r.doc_id: {c: r[c] for c in mh} for r in sigs.collect()}
    rows = carried.collect()
    assert rows, "expected at least one candidate pair"
    for r in rows:
        assert r.id_a < r.id_b
        for c in mh:
            assert r[f"{c}_a"] == sig_map[r.id_a][c]
            assert r[f"{c}_b"] == sig_map[r.id_b][c]


def test_lsh_finds_near_dups(docs):
    sh = dedup.word_shingles(docs, "text", "doc_id", n=3)
    sigs = dedup.minhash_signatures(sh, "doc_id")
    pairs = {(r.id_a, r.id_b) for r in dedup.lsh_candidate_pairs(sigs, "doc_id", 4, 2).collect()}
    assert (1, 2) in pairs  # exact dups always collide on every band


def test_jaccard_pairs(docs):
    sh = dedup.word_shingles(docs, "text", "doc_id", n=3)
    pairs = {(r.id_a, r.id_b): r.jaccard for r in dedup.jaccard_pairs(sh, "doc_id", 0.2).collect()}
    assert pairs[(1, 2)] == 1.0
    assert 0.2 <= pairs[(1, 3)] < 1.0


def test_lsh_bucket_cap_drops_oversized_buckets(spark):
    # 3 identical docs + 1 outlier: every band bucket for the dup group has
    # size 3. Cap at 2 → every bucket dropped → no candidate pairs at all.
    rows = [(i, "the quick brown fox jumps over the lazy dog") for i in range(1, 4)]
    rows.append((9, "completely different content about spark engines and shuffles"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sh = dedup.word_shingles(df, "text", "doc_id", n=3)
    sigs = dedup.minhash_signatures(sh, "doc_id")
    uncapped = {(r.id_a, r.id_b) for r in dedup.lsh_candidate_pairs(sigs, "doc_id", 4, 2).collect()}
    capped = {
        (r.id_a, r.id_b)
        for r in dedup.lsh_candidate_pairs(sigs, "doc_id", 4, 2, max_bucket_size=2).collect()
    }
    assert (1, 2) in uncapped and (1, 3) in uncapped
    assert capped == set()


def test_jaccard_max_df_drops_frequent_shingles(spark):
    # A shingle present in every doc is the only thing docs 1 and 2 share;
    # with the df cap it is excluded, so the pair disappears and the
    # remaining pair's jaccard is computed on the capped sets.
    rows = [
        (1, "alpha beta gamma zzz yyy xxx"),
        (2, "alpha beta gamma qqq www eee"),
        (3, "alpha beta gamma qqq www eee"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sh = dedup.word_shingles(df, "text", "doc_id", n=3)
    uncapped = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.jaccard_pairs(sh, "doc_id", 0.01, persist=False).collect()
    }
    capped = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.jaccard_pairs(sh, "doc_id", 0.01, persist=False, max_df=2).collect()
    }
    assert (1, 2) in uncapped
    assert (1, 2) not in capped  # only shared shingle was corpus-frequent
    assert capped[(2, 3)] == 1.0  # identical docs still pair on rare shingles


def test_simhash_pandas_matches_relational(docs, spark):
    relational = {r.doc_id: r.simhash for r in dedup.simhash(docs, "text", "doc_id").collect()}
    kernel = {r.doc_id: r.simhash for r in dedup.simhash_pandas(docs, "text", "doc_id").collect()}
    assert kernel == relational
    # Spark trim strips only spaces — leading \n must survive into an empty
    # first token in both forms.
    nasty = spark.createDataFrame(
        [(1, "\nfoo  bar\t baz "), (2, ""), (3, "   "), (4, "unicode nbsp")],
        "doc_id long, text string",
    )
    relational = {r.doc_id: r.simhash for r in dedup.simhash(nasty, "text", "doc_id").collect()}
    kernel = {r.doc_id: r.simhash for r in dedup.simhash_pandas(nasty, "text", "doc_id").collect()}
    assert kernel == relational


def test_simhash_similar_docs_close(docs):
    out = {r.doc_id: r.simhash for r in dedup.simhash(docs, "text", "doc_id").collect()}

    def hamming(a, b):
        return bin(a ^ b).count("1")

    # identical docs → identical simhash; near-dup ≤ rotated-different distance
    assert out[1] == out[2]
    assert hamming(out[1], out[3]) <= hamming(out[1], out[4])
    # rotation preserves the token multiset → identical simhash
    assert out[4] == out[5]


def test_embedding_near_dup_finds_pair_and_respects_blocking(spark):
    # sparse comps: docs 1/2 near-identical (cos ≈ 1), doc 3 unrelated,
    # doc 4 ≈ doc 1 but on the other side of the hyperplane → blocked out
    comps = spark.createDataFrame(
        [
            (1, 0, 1), (1, 1, 100),
            (2, 0, 1), (2, 1, 99),
            (3, 2, 50),
            (4, 0, -1), (4, 1, 100),
        ],
        "doc_id long, idx bigint, val long",
    )
    # one plane along dim 0: bucket bit = sign of val[0]
    hpc = spark.createDataFrame([(0, 0, 1.0)], "b int, hidx bigint, hv double")
    out = dedup.embedding_near_dup(comps, hpc, threshold=0.99, id_col="doc_id")
    pairs = {(r.id_a, r.id_b): r.cos for r in out.collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] > 0.999
    # (1,4) has cosine ≈ 0.9998 but lands in a different sign-LSH bucket:
    # the standard LSH recall trade — blocked pairs are never scored
    assert (1, 4) not in pairs
    assert all(a < b for a, b in pairs)


def test_embedding_near_dup_bucket_cap(spark):
    comps = spark.createDataFrame(
        [(i, 0, 10) for i in range(6)] + [(i, 1, 1) for i in range(6)],
        "doc_id long, idx bigint, val long",
    )
    hpc = spark.createDataFrame([(0, 0, 1.0)], "b int, hidx bigint, hv double")
    uncapped = dedup.embedding_near_dup(comps, hpc, threshold=0.5, id_col="doc_id")
    capped = dedup.embedding_near_dup(
        comps, hpc, threshold=0.5, id_col="doc_id", max_bucket_size=5
    )
    assert uncapped.count() == 15  # all 6 docs share one bucket → C(6,2)
    assert capped.count() == 0  # hot bucket dropped before the self-join


def test_embedding_near_dup_pandas_matches_relational(spark, docs):
    """The Arrow serving twin must produce the exact pair set + rounded
    cosines of the relational (oracle) form on the real corpus."""
    from morphik_core_spark.functions.embedder import hash_embed_components

    comps = hash_embed_components(docs, "text", "doc_id", dims=16, seed=42)
    planes = [
        [float(x) for x in r.embedding[:16]]
        for r in spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .filter("vec_id between 1 and 4")
        .orderBy("vec_id")
        .collect()
    ]
    hpc_rows = [(b, i, v) for b, hp in enumerate(planes) for i, v in enumerate(hp)]
    hpc = spark.createDataFrame(hpc_rows, "b int, hidx bigint, hv double")
    rel = dedup.embedding_near_dup(comps, hpc, threshold=0.9, id_col="doc_id")
    fast = dedup.embedding_near_dup_pandas(comps, planes, threshold=0.9, id_col="doc_id")
    rel_rows = sorted((r.id_a, r.id_b, r.cos) for r in rel.collect())
    fast_rows = sorted((r.id_a, r.id_b, r.cos) for r in fast.collect())
    assert rel_rows == fast_rows
    assert len(rel_rows) > 0  # threshold low enough that pairs exist


def test_embedding_near_dup_pandas_bucket_cap(spark):
    comps = spark.createDataFrame(
        [(i, 0, 10) for i in range(6)] + [(i, 1, 1) for i in range(6)],
        "doc_id long, idx bigint, val long",
    )
    planes = [[1.0, 0.0]]
    uncapped = dedup.embedding_near_dup_pandas(comps, planes, threshold=0.5, id_col="doc_id")
    capped = dedup.embedding_near_dup_pandas(
        comps, planes, threshold=0.5, id_col="doc_id", max_bucket_size=5
    )
    assert uncapped.count() == 15
    assert capped.count() == 0


def test_connected_components_chain_and_cycle(spark):
    """Transitive closure: a chain (1-2, 2-3) and a cycle (10-11, 11-12,
    10-12) each collapse to one component labeled by their min id."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 12), (10, 12)], "id_a long, id_b long"
    )
    comp = {r.node: r.component for r in dedup.connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


def test_connected_components_driver_and_distributed_paths_agree(spark):
    """The size-gated union-find fast path must be bit-identical to the
    distributed min-label propagation — same components, same labels —
    on a graph with chains, cycles, cross-links, and string ids."""
    import random

    rng = random.Random(7)
    edges = set()
    # 40 random clusters knitted from chains + random chords
    for c in range(40):
        members = [c * 100 + i for i in range(rng.randint(2, 9))]
        for a, b in zip(members, members[1:]):
            edges.add((a, b))
        for _ in range(2):
            a, b = rng.sample(members, 2)
            edges.add((min(a, b), max(a, b)))
    pairs = spark.createDataFrame(sorted(edges), "id_a long, id_b long")
    fast = {r.node: r.component for r in dedup.connected_components(pairs).collect()}
    slow = {
        r.node: r.component
        for r in dedup.connected_components(pairs, driver_pair_limit=0).collect()
    }
    assert fast == slow and len(fast) > 80

    # string ids survive the driver path with their type intact
    spairs = spark.createDataFrame([("b", "c"), ("a", "b")], "id_a string, id_b string")
    out = dedup.connected_components(spairs)
    assert dict(out.dtypes) == {"node": "string", "component": "string"}
    assert {r.node: r.component for r in out.collect()} == {"a": "a", "b": "a", "c": "a"}


def test_resolve_duplicate_clusters_keeps_isolated_docs(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = spark.createDataFrame([(1, 4), (4, 5)], "id_a long, id_b long")
    rows = {r.doc_id: (r.keeper_id, r.cluster_size)
            for r in dedup.resolve_duplicate_clusters(docs, pairs, "doc_id").collect()}
    assert rows == {0: (0, 1), 1: (1, 3), 2: (2, 1), 3: (3, 1), 4: (1, 3), 5: (1, 3)}
    # the dedup contract: keepers form the surviving corpus
    keepers = {d for d, (k, _) in rows.items() if d == k}
    assert keepers == {0, 1, 2, 3, 5 - 2}  # 0,1,2,3 survive; 4,5 drop


def test_paragraph_dedup_first_occurrence_wins(spark):
    from morphik_core_spark.operators.dedup import paragraph_dedup

    rows = [
        ("a", "intro text\nshared footer\nunique a"),
        ("b", "different intro\nshared footer\nunique b"),
        ("c", "shared footer"),  # nothing survives
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {r.doc_id: r for r in paragraph_dedup(df, "text", "doc_id").collect()}

    assert got["a"].text_dedup == "intro text\nshared footer\nunique a"
    assert (got["a"].n_paras, got["a"].n_kept) == (3, 3)  # doc 'a' owns the footer
    assert got["b"].text_dedup == "different intro\nunique b"  # footer removed
    assert (got["b"].n_paras, got["b"].n_kept) == (3, 2)
    assert got["c"].text_dedup == "" and got["c"].n_kept == 0  # fully boilerplate
    # empty paragraphs (double separators) never count
    df2 = spark.createDataFrame([("x", "one\n\ntwo")], "doc_id string, text string")
    r = paragraph_dedup(df2, "text", "doc_id").collect()[0]
    assert (r.n_paras, r.text_dedup) == (2, "one\ntwo")


def test_paragraph_dedup_fires_on_corpus(spark, sf_dir):
    """The 4-token re-lining of the synthetic corpus must actually contain
    cross-document duplicates, or the query proves nothing."""
    import __spark_entry__ as entry_mod

    out = entry_mod.queries()["paragraph_dedup"](spark, sf_dir)
    agg = out.agg(
        F.sum("n_paras").alias("total"), F.sum("n_kept").alias("kept")
    ).first()
    assert agg.kept < agg.total  # duplicates existed and were dropped
    assert agg.kept > 0


def test_semantic_dedup_keeps_first_and_blocks_by_cluster(spark):
    from morphik_core_spark.operators.dedup import semantic_dedup

    # two orthogonal centroids; near-identical pair (1,2) + distinct 3
    cents = [(1, [1.0, 0.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0, 0.0])]
    rows = [
        (10, [1.0, 0.05, 0.0, 0.0]),   # cluster 1
        (11, [1.0, 0.06, 0.0, 0.0]),   # ~dup of 10
        (12, [0.2, 0.98, 0.0, 0.0]),   # cluster 2, unique
        (13, [0.0, 1.0, 0.5, 0.0]),    # cluster 2, cos~0.88 to 12 < tau
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    out = {r["vec_id"]: r for r in semantic_dedup(df, cents, tau=0.95).collect()}
    assert out[10]["kept"] and not out[11]["kept"]  # higher id drops
    assert out[12]["kept"] and out[13]["kept"]
    assert out[10]["cluster_id"] == 1 and out[12]["cluster_id"] == 2


def test_semantic_dedup_cluster_cap_skips_pairgen(spark):
    from morphik_core_spark.operators.dedup import semantic_dedup

    cents = [(1, [1.0, 0.0])]
    rows = [(i, [1.0, 0.001 * i]) for i in range(10)]  # all near-dups, one cluster
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    capped = semantic_dedup(df, cents, tau=0.9, max_cluster_size=5).collect()
    assert all(r["kept"] for r in capped)  # oversized cluster: everyone kept
    uncapped = semantic_dedup(df, cents, tau=0.9).collect()
    assert sum(1 for r in uncapped if r["kept"]) == 1  # only vec 0 survives


def test_containment_pairs_catches_what_jaccard_misses(spark):
    from morphik_core_spark.operators.dedup import containment_pairs, jaccard_pairs, word_shingles

    # doc 2 is a verbatim excerpt of doc 1 plus nothing else; doc 1 is
    # much larger, so Jaccard is tiny but containment of 2 in 1 is 1.0
    big = " ".join(f"w{i} w{i+1} w{i+2}" for i in range(0, 120, 3))
    small = "w0 w1 w2 w3 w4"
    other = "completely different tokens entirely unrelated corpus"
    df = spark.createDataFrame(
        [(1, big), (2, small), (3, other)], "doc_id long, text string"
    )
    sh = word_shingles(df, "text", "doc_id", n=3)
    cont = {(r["id_a"], r["id_b"]): r.asDict() for r in containment_pairs(sh, "doc_id", threshold=0.9).collect()}
    assert (1, 2) in cont
    pair = cont[(1, 2)]
    assert pair["c_b"] == 1.0  # all of doc 2's shingles are inside doc 1
    assert pair["c_a"] < 0.2
    # jaccard at the same gate sees nothing
    assert jaccard_pairs(sh, "doc_id", threshold=0.9).count() == 0
    # unrelated doc pairs with nobody
    assert all(3 not in k for k in cont)


def test_containment_pairs_max_df_drops_hot_shingles(spark):
    from morphik_core_spark.operators.dedup import containment_pairs, word_shingles

    # a boilerplate shingle shared by every doc would pair everyone;
    # max_df removes it, so docs that ONLY share boilerplate never meet
    boiler = "terms of service apply"
    rows = [(i, f"{boiler} unique{i}a unique{i}b unique{i}c") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sh = word_shingles(df, "text", "doc_id", n=3)
    assert containment_pairs(sh, "doc_id", threshold=0.1, max_df=3).count() == 0
    assert containment_pairs(sh, "doc_id", threshold=0.1).count() == 15


def test_containment_jaccard_invariants_random_corpus(spark):
    """Structural invariants on a seeded random corpus: for every pair,
    0 < c_a, c_b <= 1; jaccard <= min(c_a, c_b); and containment recomputed
    from (common, sz) matches the reported ratio."""
    import random

    from morphik_core_spark.operators.dedup import containment_pairs, word_shingles

    rng = random.Random(606)
    vocab = [f"tok{i}" for i in range(30)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(5, 60))))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sh = word_shingles(df, "text", "doc_id", n=3)
    pairs = containment_pairs(sh, "doc_id", threshold=0.05).collect()
    assert pairs, "seeded corpus must produce candidate pairs"
    for r in pairs:
        assert 0.0 < r["c_a"] <= 1.0 and 0.0 < r["c_b"] <= 1.0
        assert r["id_a"] < r["id_b"]
        jac = r["common"] / (r["sz_a"] + r["sz_b"] - r["common"])
        assert jac <= min(r["c_a"], r["c_b"]) + 1e-9
        assert abs(r["c_a"] - round(r["common"] / r["sz_a"], 6)) < 1e-12
        assert abs(r["c_b"] - round(r["common"] / r["sz_b"], 6)) < 1e-12


# ---------------------------------------------------------------- round 8


def test_fellegi_sunter_em_separates_planted_matches(spark):
    """Plant a linkage problem where true matches mostly agree on all
    three fields and random pairs agree rarely: EM must learn m >> u per
    field and the all-agree pattern must classify as a match with a
    high posterior, the all-disagree pattern as a non-match."""
    import random

    from morphik_core_spark.operators.dedup import fellegi_sunter_em

    rng = random.Random(7)
    rows = []
    for _ in range(200):  # true matches: agree w.p. 0.95 per field
        rows.append(tuple(int(rng.random() < 0.95) for _ in range(3)))
    for _ in range(2000):  # random pairs: agree w.p. 0.08 per field
        rows.append(tuple(int(rng.random() < 0.08) for _ in range(3)))
    df = spark.createDataFrame(rows, "a int, b int, c int")
    out = {
        (r["gamma_a"], r["gamma_b"], r["gamma_c"]): r
        for r in fellegi_sunter_em(df, ["a", "b", "c"]).collect()
    }
    full = out[(1, 1, 1)]
    none = out[(0, 0, 0)]
    assert full["decision"] == "match" and full["match_posterior"] > 0.95
    assert none["decision"] == "non_match" and none["match_posterior"] < 0.05
    assert full["weight"] > 3.0 > none["weight"]
    for f in ("a", "b", "c"):
        assert full[f"m_{f}"] > 0.7 > 0.3 > full[f"u_{f}"]
    # weights are monotone in the number of agreements when fields are iid
    assert out[(1, 1, 1)]["weight"] > out[(1, 1, 0)]["weight"] > out[(1, 0, 0)]["weight"]


def test_fellegi_sunter_em_python_replay(spark):
    """The EM trajectory is bit-reproducible: a plain-python replay with
    the documented per-round 1e-12 quantization reproduces the learned
    parameters exactly (the unrolled-CTE oracle contract)."""
    from morphik_core_spark.operators.dedup import fellegi_sunter_em

    rows = [(1, 1)] * 50 + [(1, 0)] * 30 + [(0, 1)] * 25 + [(0, 0)] * 400
    df = spark.createDataFrame(rows, "x int, y int")
    out = {(r["gamma_x"], r["gamma_y"]): r for r in fellegi_sunter_em(
        df, ["x", "y"], iters=20
    ).collect()}

    gammas = [(0, 0), (0, 1), (1, 0), (1, 1)]
    counts = [400, 25, 30, 50]
    total = 505
    MICRO = 10 ** 6
    q = lambda v: min(max(round(v, 12), 1e-9), 1.0 - 1e-9)

    def post_micro(p, m, u):
        out = []
        for g in gammas:
            pm, pu = p, 1.0 - p
            for i in range(2):
                pm *= m[i] if g[i] else 1.0 - m[i]
                pu *= u[i] if g[i] else 1.0 - u[i]
            out.append(round(pm / (pm + pu) * 1e6))
        return out

    m, u, p = [q(0.9)] * 2, [q(0.1)] * 2, q(0.1)
    for _ in range(20):
        wq = post_micro(p, m, u)
        wsum = sum(w * c for w, c in zip(wq, counts))
        lsum = sum((MICRO - w) * c for w, c in zip(wq, counts))
        p = q(wsum / (total * MICRO))
        m = [q(sum(w * c for w, c, g in zip(wq, counts, gammas) if g[i]) / wsum) for i in range(2)]
        u = [q(sum((MICRO - w) * c for w, c, g in zip(wq, counts, gammas) if g[i]) / lsum) for i in range(2)]
    post = [w / MICRO for w in post_micro(p, m, u)]
    for g, c, w_post in zip(gammas, counts, post):
        r = out[g]
        assert r["n_pairs"] == c
        assert r["match_posterior"] == round(w_post, 6), (g, r["match_posterior"], w_post)
        assert r["m_x"] == round(m[0], 6) and r["u_y"] == round(u[1], 6)


def test_fellegi_sunter_em_partition_invariant(spark):
    from morphik_core_spark.operators.dedup import fellegi_sunter_em

    rows = [((i * 3) % 2, (i * 5) % 2, (i * 7) % 3 == 0) for i in range(500)]
    df = spark.createDataFrame(rows, "x int, y int, z boolean")
    a = [tuple(r) for r in fellegi_sunter_em(df, ["x", "y", "z"]).collect()]
    b = [tuple(r) for r in fellegi_sunter_em(df.repartition(13), ["x", "y", "z"]).collect()]
    assert a == b


def test_fellegi_sunter_em_degenerate_inputs_no_zerodiv(spark):
    """Degenerate corpora must not crash the M-step: when every pattern's
    posterior rounds to 1 (lsum would be 0) or to 0 (wsum would be 0),
    the micro-unit floor keeps the divisions finite and the output
    well-formed (the 1e-9 clamp then bounds m/u/p)."""
    from morphik_core_spark.operators.dedup import fellegi_sunter_em

    # all-agree only: EM drives the single pattern's posterior to 1
    hi = spark.createDataFrame([(1, 1, 1)] * 50, "a int, b int, c int")
    out = fellegi_sunter_em(hi, ["a", "b", "c"], iters=20).collect()
    assert len(out) == 1 and out[0]["n_pairs"] == 50

    # all-disagree only: posterior rounds toward 0
    lo = spark.createDataFrame([(0, 0, 0)] * 50, "a int, b int, c int")
    out2 = fellegi_sunter_em(lo, ["a", "b", "c"], iters=20).collect()
    assert len(out2) == 1 and out2[0]["n_pairs"] == 50


def test_mutual_best_match_stability_and_ties(spark):
    """Only symmetric argmax pairs survive: a one-sided best is dropped;
    equal-score ties break to the smaller partner key; min_score gates
    weak candidates out before ranking."""
    from morphik_core_spark.operators.dedup import mutual_best_match

    pairs = spark.createDataFrame(
        [
            # a1's best is b1 (0.9) and b1's best is a1 -> match
            (1, 101, 0.9), (1, 102, 0.5),
            (2, 101, 0.7),          # b101 prefers a1 -> a2 unmatched
            # tie on 0.8 for a3: partners 103 and 104 -> 103 wins (smaller)
            (3, 103, 0.8), (3, 104, 0.8),
            # below min_score -> filtered, a4 has no match
            (4, 105, 0.1),
        ],
        "a long, b long, score double",
    )
    got = {
        (r["a"], r["b"])
        for r in mutual_best_match(pairs, "a", "b", "score", min_score=0.2).collect()
    }
    assert (1, 101) in got
    assert (3, 103) in got
    assert all(a != 2 and a != 4 for a, _ in got)
    # one-to-one: no key repeats on either side
    a_side = [a for a, _ in got]
    b_side = [b for _, b in got]
    assert len(a_side) == len(set(a_side)) and len(b_side) == len(set(b_side))
