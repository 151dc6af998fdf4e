"""Retrieval quality evaluation — sketch fidelity against exact TF-cosine.

The reference grades retrieval with LLM-judged accuracy evals
(/root/reference/evaluations/custom_eval, BASELINE.md); those need live
models. This harness measures the analogous deterministic quantity: the
hash embedder accumulates signed token counts, so it is a random-projection
sketch of the exact term-frequency cosine. Ground truth per query doc =
top-R documents by exact TF-cosine; the engine answers with hash-embedding
cosine top-k; we report recall@k and MRR across embedding widths.

Measured on the synthetic corpus (shared ~40-word vocabulary — the hard,
near-tied case): recall@10 ≈ 0.49 (16 dims) → 0.81 (64) → 1.00 (256),
NDCG@10 ≈ 0.44 → 0.73 → 1.00 (binary-gain, order-sensitive — tracks the
same JL-style convergence with a sharper penalty for misordered heads).
Production embedders plug into the same retrieval operators; this
isolates engine behavior from model quality.

Run: python evaluations/retrieval_eval.py   ($SPARK_GRAFT_SF_DIR or sf0.01)
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
from collections import Counter

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from morphik_core_spark.functions.embedder import hash_embed

N_QUERIES = 20
K = 10
R_RELEVANT = 5
DIMS_SWEEP = (16, 64, 256)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    rows = duckdb.sql(f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'").fetchall()
    texts = dict(rows)

    vocab = sorted({w for t in texts.values() for w in t.lower().split()})
    vidx = {w: i for i, w in enumerate(vocab)}

    def tf_vector(text: str) -> np.ndarray:
        v = np.zeros(len(vocab))
        for w, c in Counter(text.lower().split()).items():
            v[vidx[w]] = c
        return v / np.linalg.norm(v)

    tfs = {d: tf_vector(t) for d, t in texts.items()}
    query_ids = sorted(texts)[:N_QUERIES]

    def truth(qid) -> set:
        ranked = sorted(((tfs[qid] @ tfs[d], d) for d in texts if d != qid), key=lambda x: (-x[0], x[1]))
        return {d for _, d in ranked[:R_RELEVANT]}

    out = {"metric": f"retrieval_recall@{K}", "n_queries": N_QUERIES,
           "relevant_per_query": R_RELEVANT, "sf_dir": sf_dir, "by_dims": {}}
    for dims in DIMS_SWEEP:
        embs = {d: np.asarray(hash_embed(t, dims)) for d, t in texts.items()}

        def cos(a, b):
            return float(embs[a] @ embs[b] / (np.linalg.norm(embs[a]) * np.linalg.norm(embs[b]) + 1e-12))

        # binary-gain IDCG is a constant: all R relevant docs ranked first
        idcg = sum(1.0 / np.log2(i + 2) for i in range(min(K, R_RELEVANT)))
        recalls, rr, ndcgs = [], [], []
        for qid in query_ids:
            tset = truth(qid)
            ranked = sorted(((cos(qid, d), d) for d in texts if d != qid), key=lambda x: (-x[0], x[1]))
            got = [d for _, d in ranked[:K]]
            recalls.append(len(tset & set(got)) / R_RELEVANT)
            rank = next((i + 1 for i, d in enumerate(got) if d in tset), None)
            rr.append(1.0 / rank if rank else 0.0)
            dcg = sum(1.0 / np.log2(i + 2) for i, d in enumerate(got) if d in tset)
            ndcgs.append(dcg / idcg)
        out["by_dims"][str(dims)] = {
            "recall": round(float(np.mean(recalls)), 4),
            "mrr": round(float(np.mean(rr)), 4),
            "ndcg": round(float(np.mean(ndcgs)), 4),
        }
    out["value"] = out["by_dims"][str(DIMS_SWEEP[0])]["recall"]
    out["lsh_probes"] = lsh_probe_recall(sf_dir)
    out["ivf_probes"] = ivf_probe_recall(sf_dir)
    out["pq_candidates"] = pq_adc_recall(sf_dir)
    out["sq8"] = sq8_recall(sf_dir)
    out["matryoshka"] = matryoshka_recall(sf_dir)
    print(json.dumps(out))


def lsh_probe_recall(sf_dir: str, n_planes: int = 4, k: int = 10, n_queries: int = 50) -> dict:
    """Recall@k of sign-LSH bucketed ANN vs exact cosine, by probe count.

    Mirrors operators/similarity.knn_lsh's probe sequence (own bucket +
    single-bit flips of the lowest-|margin| hyperplanes) in numpy, so the
    recall/scan-breadth tradeoff of the `n_probes` knob is measured
    directly. `avg_scanned` is the mean candidate fraction — the cost side
    of the same knob.
    """
    emb = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    ids = np.asarray([r[0] for r in emb])
    mat = np.asarray([r[1] for r in emb], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1) + 1e-12
    planes = mat[1 : n_planes + 1]  # same fixed hyperplanes as the served query

    margins = mat @ planes.T  # (n, planes)
    buckets = ((margins > 0) * (1 << np.arange(n_planes))).sum(axis=1)

    rng_q = ids[:n_queries]
    result: dict[str, dict] = {}
    for n_probes in (1, 2, 4):
        recalls, scanned = [], []
        for qi in rng_q:
            q = mat[qi]
            exact = np.argsort(-(mat @ q) / (norms * np.linalg.norm(q)))
            exact_top = set(ids[[i for i in exact if ids[i] != qi][:k]])
            flip_order = np.argsort(np.abs(margins[qi]))
            probes = {int(buckets[qi])}
            for b in flip_order[: n_probes - 1]:
                probes.add(int(buckets[qi]) ^ (1 << int(b)))
            cand = np.isin(buckets, list(probes))
            cand_ids = ids[cand]
            cand_mat = mat[cand]
            sims = (cand_mat @ q) / ((np.linalg.norm(cand_mat, axis=1) + 1e-12) * np.linalg.norm(q))
            got = set(cand_ids[np.argsort(-sims)][: k + 1]) - {qi}
            recalls.append(len(exact_top & got) / k)
            scanned.append(cand.mean())
        result[str(n_probes)] = {
            "recall": round(float(np.mean(recalls)), 4),
            "avg_scanned": round(float(np.mean(scanned)), 4),
        }
    return result


def ivf_probe_recall(sf_dir: str, n_lists: int = 8, k: int = 10, n_queries: int = 50) -> dict:
    """Recall@k of IVF inverted-list ANN vs exact cosine, by probe count.

    Mirrors operators/similarity.knn_ivf (pivot centroids vec_id 1..8,
    round-6 nearest-centroid assignment) in numpy. `avg_scanned` is the
    probed fraction of the corpus — with balanced lists it approaches
    n_probes / n_lists, the ivfflat cost model.
    """
    emb = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    ids = np.asarray([r[0] for r in emb])
    mat = np.asarray([r[1] for r in emb], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1) + 1e-12
    cents = mat[1 : n_lists + 1]  # same pivot centroids as the served query
    cnorms = np.linalg.norm(cents, axis=1) + 1e-12

    cos_c = np.round((mat @ cents.T) / (norms[:, None] * cnorms[None, :]), 6)
    assign = np.argmax(cos_c, axis=1)  # argmax takes first (lowest cid) on ties

    result: dict[str, dict] = {}
    for n_probes in (1, 2, 4):
        recalls, scanned = [], []
        for qi in ids[:n_queries]:
            q = mat[qi]
            exact = np.argsort(-(mat @ q) / (norms * np.linalg.norm(q)))
            exact_top = set(ids[[i for i in exact if ids[i] != qi][:k]])
            probes = np.argsort(-cos_c[qi])[:n_probes]
            cand = np.isin(assign, probes)
            cand_ids = ids[cand]
            cand_mat = mat[cand]
            sims = (cand_mat @ q) / ((np.linalg.norm(cand_mat, axis=1) + 1e-12) * np.linalg.norm(q))
            got = set(cand_ids[np.argsort(-sims)][: k + 1]) - {qi}
            recalls.append(len(exact_top & got) / k)
            scanned.append(cand.mean())
        result[str(n_probes)] = {
            "recall": round(float(np.mean(recalls)), 4),
            "avg_scanned": round(float(np.mean(scanned)), 4),
        }
    return result


def pq_adc_recall(sf_dir: str, m: int = 8, k: int = 10, n_queries: int = 50) -> dict:
    """Recall@k of PQ/ADC candidate selection vs exact cosine, by candidate
    pool size. Mirrors operators/similarity.knn_pq (codebooks = subspace
    slices of pivot vectors vec_id 1..8, L2 encode, ADC table scoring,
    exact rescore of the pool) in numpy."""
    emb = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    ids = np.asarray([r[0] for r in emb])
    mat = np.asarray([r[1] for r in emb], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1) + 1e-12
    n, d = mat.shape
    sub = d // m
    cents = mat[1:9]  # 8 codebook entries per subspace, same pivots as IVF

    # encode: per subspace, nearest codebook slice by L2
    codes = np.empty((n, m), dtype=np.int64)
    for j in range(m):
        seg = mat[:, j * sub : (j + 1) * sub]
        cseg = cents[:, j * sub : (j + 1) * sub]
        d2 = ((seg[:, None, :] - cseg[None, :, :]) ** 2).sum(axis=2)
        codes[:, j] = np.argmin(d2, axis=1)

    result: dict[str, dict] = {}
    for n_cand in (25, 50, 100):
        recalls = []
        for qi in ids[:n_queries]:
            q = mat[qi]
            exact = np.argsort(-(mat @ q) / (norms * np.linalg.norm(q)))
            exact_top = set(ids[[i for i in exact if ids[i] != qi][:k]])
            # ADC tables for this query
            approx = np.zeros(n)
            for j in range(m):
                qseg = q[j * sub : (j + 1) * sub]
                cseg = cents[:, j * sub : (j + 1) * sub]
                table = ((qseg[None, :] - cseg) ** 2).sum(axis=1)
                approx += table[codes[:, j]]
            cand = np.argsort(approx)[:n_cand]
            sims = (mat[cand] @ q) / (norms[cand] * np.linalg.norm(q))
            got = set(ids[cand[np.argsort(-sims)]][: k + 1]) - {qi}
            recalls.append(len(exact_top & got) / k)
        result[str(n_cand)] = {
            "recall": round(float(np.mean(recalls)), 4),
            "avg_scanned": round(n_cand / n, 4),
        }
    return result




def sq8_recall(sf_dir: str, k: int = 10, n_queries: int = 50) -> dict:
    """Recall@k of SQ8 asymmetric scoring vs exact inner product —
    mirrors operators/similarity.knn_sq8 (per-dim affine uint8 codes,
    full-precision query) in numpy."""
    emb = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    ids = np.asarray([r[0] for r in emb])
    mat = np.asarray([r[1] for r in emb], dtype=np.float64)
    mn, mx = mat.min(axis=0), mat.max(axis=0)
    span = np.where(mx - mn == 0, 1.0, mx - mn)
    codes = np.clip(np.round((mat - mn) / span * 255.0), 0, 255)
    recon = codes / 255.0 * span + mn

    recalls = []
    for qi in ids[:n_queries]:
        q = mat[qi]
        exact = np.argsort(-(mat @ q))
        exact_top = set(ids[[i for i in exact if ids[i] != qi][:k]])
        approx = np.argsort(-(recon @ q))
        got = set(ids[[i for i in approx if ids[i] != qi][:k]])
        recalls.append(len(exact_top & got) / k)
    return {"recall_at_10": round(float(np.mean(recalls)), 4)}
def matryoshka_recall(sf_dir: str, k: int = 10, candidates: int = 50, n_queries: int = 50) -> dict:
    """Recall@k of prefix-coarse -> full rescore (knn_matryoshka) vs exact
    cosine, swept over coarse prefix widths — shows how many dims the
    coarse stage needs before the candidate pool covers the true top-k.
    (These embeddings are not MRL-trained, so this is the pessimistic
    bound; MRL checkpoints concentrate variance in the prefix.)"""
    emb = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    ids = np.asarray([r[0] for r in emb])
    mat = np.asarray([r[1] for r in emb], dtype=np.float64)
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    out = {}
    for cd in (4, 8, 16, 32):
        pre = mat[:, :cd] / (np.linalg.norm(mat[:, :cd], axis=1, keepdims=True) + 1e-30)
        recalls = []
        for qi in ids[:n_queries]:
            exact = [i for i in np.argsort(-(norm @ norm[qi])) if ids[i] != qi][:k]
            pool = np.argsort(-(pre @ pre[qi]))[:candidates]
            rescored = pool[np.argsort(-(norm[pool] @ norm[qi]))]
            got = [i for i in rescored if ids[i] != qi][:k]
            recalls.append(len(set(exact) & set(got)) / k)
        out[str(cd)] = round(float(np.mean(recalls)), 4)
    return out


if __name__ == "__main__":
    main()
