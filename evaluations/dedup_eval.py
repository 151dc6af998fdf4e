"""Dedup-stack quality evaluation: LSH candidate recall vs exact Jaccard.

The skew guards added for 100 TB safety (shingle document-frequency cap,
LSH bucket-size cap) trade recall for bounded reducers. This harness
measures that trade on the synthetic corpus with planted near-duplicates:

- ground truth: exact n-gram Jaccard >= threshold over UNCAPPED shingle
  sets for the planted pairs (duckdb, small n — exact is affordable).
- measured: (a) capped-Jaccard pair recall, (b) MinHash-LSH candidate
  recall at the served band configuration, with and without the bucket
  cap.

Planting: every k-th document gets a near-duplicate made by swapping a
few tokens, so the expected pair set is known by construction.

Run: python evaluations/dedup_eval.py    ($SPARK_GRAFT_SF_DIR or sf0.01)
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

N_PLANTED = 60
SWAP_EVERY = 15  # swap every 15th token in the duplicate
JACCARD_THRESHOLD = 0.3
BANDS, ROWS_PER_BAND, MINHASHES = 4, 2, 8


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    from pyspark.sql import SparkSession

    from morphik_core_spark.operators import dedup

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("dedup_eval")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' ORDER BY doc_id LIMIT {N_PLANTED * 2}"
    ).fetchall()

    planted = []
    next_id = 10_000_000
    expected_pairs = set()
    for doc_id, text in rows[:N_PLANTED]:
        toks = text.split()
        dup = [t if i % SWAP_EVERY else "swapped" for i, t in enumerate(toks)]
        planted.append((next_id, " ".join(dup)))
        expected_pairs.add((doc_id, next_id))
        next_id += 1

    corpus = spark.createDataFrame(rows + planted, "doc_id long, text string").cache()
    sh = dedup.word_shingles(corpus, "text", "doc_id", n=3)

    # ground truth: uncapped exact Jaccard on the planted pairs
    truth = {
        (a, b)
        for a, b in expected_pairs
        if (a, b)
        in {
            (r.id_a, r.id_b)
            for r in dedup.jaccard_pairs(sh, "doc_id", JACCARD_THRESHOLD, persist=False).collect()
        }
    }

    def pair_recall(pairs_df) -> float:
        got = {(r.id_a, r.id_b) for r in pairs_df.collect()}
        return round(len(truth & got) / max(1, len(truth)), 4)

    capped_jaccard = dedup.jaccard_pairs(sh, "doc_id", JACCARD_THRESHOLD, persist=False, max_df=6)
    sigs = dedup.minhash_signatures(sh, "doc_id", num_hashes=MINHASHES)
    lsh_uncapped = dedup.lsh_candidate_pairs(sigs, "doc_id", BANDS, ROWS_PER_BAND)
    lsh_capped = dedup.lsh_candidate_pairs(sigs, "doc_id", BANDS, ROWS_PER_BAND, max_bucket_size=2)

    out = {
        "metric": "dedup_candidate_recall",
        "sf_dir": sf_dir,
        "planted_pairs": len(expected_pairs),
        "truth_pairs_at_threshold": len(truth),
        "capped_jaccard_recall": pair_recall(capped_jaccard),
        "lsh_recall": pair_recall(lsh_uncapped),
        "lsh_recall_bucket_capped": pair_recall(lsh_capped),
    }
    out["value"] = out["lsh_recall_bucket_capped"]

    # --- SemDeDup: planted embedding near-dups ------------------------
    # jittered copies of every 4th embedding; measure how many planted
    # copies semantic_dedup removes (recall) and how many originals it
    # wrongly drops (false-drop) at the served tau.
    import numpy as np

    erows = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    rng = np.random.default_rng(7)
    eplanted, planted_ids = [], set()
    enext = 20_000_000
    for vid, vec in erows[::4]:
        v = np.asarray(vec, dtype=np.float64)
        jit = v + rng.normal(0.0, 0.02 * float(np.abs(v).mean()), size=v.shape)
        eplanted.append((enext, [float(x) for x in jit]))
        planted_ids.add(enext)
        enext += 1
    emb = spark.createDataFrame(
        [(int(a), [float(x) for x in b]) for a, b in erows] + eplanted,
        "vec_id long, embedding array<double>",
    )
    cents = [(i + 1, [float(x) for x in erows[i][1]]) for i in range(8)]
    sem = dedup.semantic_dedup(emb, cents, tau=0.9).collect()
    dropped = {r["vec_id"] for r in sem if not r["kept"]}
    out["semdedup_planted"] = len(planted_ids)
    out["semdedup_recall"] = round(len(planted_ids & dropped) / max(1, len(planted_ids)), 4)
    originals = {int(a) for a, _ in erows}
    out["semdedup_false_drop"] = round(len(originals & dropped) / max(1, len(originals)), 4)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
