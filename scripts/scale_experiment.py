"""Local 10x scale experiment: synthesize a 10x corpus and measure how
the corpus operators' wall time grows.

The point is the growth EXPONENT, not the absolute numbers: an operator
that is structurally scale-safe grows ~linearly (ratio <= ~10x on 10x
rows, usually much less because fixed overhead dominates locally), and
anything superlinear is a plan bug to chase. Results land in SCALE.md.

Corpus: every sf0.1 document plus nine deterministic perturbed variants
(suffix tokens + word rotation), so near-dup structure EXISTS at 10x
(worst case for dedup families — every doc sits in a 10-clone cluster).
Embeddings are tiled 10x with a deterministic +noise column so ANN /
covariance see genuinely distinct vectors.

Usage: python scripts/scale_experiment.py [--ops dsir,covariance,...]
Prints one JSON line per operator: {op, t_1x, t_10x, ratio}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from morphik_core_spark.session import get_spark
from morphik_core_spark.sources.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def corpus_10x(spark, docs):
    variants = []
    for k in range(10):
        v = docs.select(
            (F.col("doc_id") * 10 + k).alias("doc_id"),
            F.concat(F.col("text"), F.lit(f" variant token vt{k}")).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        variants.append(v)
    out = variants[0]
    for v in variants[1:]:
        out = out.unionByName(v)
    return out


def emb_10x(emb):
    tiles = []
    for k in range(10):
        tiles.append(
            emb.select(
                (F.col("vec_id") * 10 + k).alias("vec_id"),
                F.transform(
                    F.col("embedding").cast("array<double>"),
                    lambda x, i: x + (F.lit(float(k)) * 0.001) * F.cos(i.cast("double")),
                ).alias("embedding"),
                "label",
            )
        )
    out = tiles[0]
    for t in tiles[1:]:
        out = out.unionByName(t)
    return out


def mat(df):
    df.write.format("noop").mode("overwrite").save()


_SPARK = None


def timed(fn) -> float:
    """min-of-2 with the DataFrame cache cleared before every run: several
    operators persist intermediates internally, and without the clear the
    timed runs would measure cache reads, not the operator."""
    fn()  # warm JVM/codegen only
    best = float("inf")
    for _ in range(2):
        _SPARK.catalog.clearCache()
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--ops",
        default="dsir,ppl_buckets,covariance,image_bands,neardup_batch,tfidf,"
        "c4,kmv,interval,shards,ctfidf",
    )
    args = ap.parse_args()
    ops = set(args.ops.split(","))

    import tempfile

    spark = get_spark(app_name="scale_experiment")
    global _SPARK
    _SPARK = spark
    docs1 = load_table(spark, "documents", SF_DIR).select("doc_id", "text", "lang", "source", "n_chars")
    emb1 = load_table(spark, "embeddings", SF_DIR)
    # materialize the synthetic corpora to parquet: timings must read a
    # stable on-disk input (clearCache() would otherwise force lazy
    # recomputation of the synthesis inside the measured window)
    tmp = tempfile.mkdtemp(prefix="scale10x_")
    corpus_10x(spark, docs1).write.mode("overwrite").parquet(os.path.join(tmp, "docs10"))
    emb_10x(emb1).write.mode("overwrite").parquet(os.path.join(tmp, "emb10"))
    docs10 = spark.read.parquet(os.path.join(tmp, "docs10"))
    emb10 = spark.read.parquet(os.path.join(tmp, "emb10"))

    from morphik_core_spark.operators import curation, embedding_stats
    from morphik_core_spark.streaming.neardup import near_dup_batch

    runs = {}
    if "dsir" in ops:
        runs["dsir_weights"] = lambda d: mat(
            curation.dsir_importance_weights(d, "text", "doc_id", F.col("source") == "src1", buckets=512)
        )
    if "ppl_buckets" in ops:
        runs["ppl_buckets"] = lambda d: mat(curation.perplexity_buckets(d, "text", "doc_id", "lang"))
    if "tfidf" in ops:
        def tfidf(d):
            toks = d.filter(F.col("text").isNotNull()).select(
                "doc_id", F.explode(F.split(F.lower(F.col("text")), " ")).alias("term")
            )
            tf = toks.groupBy("doc_id", "term").count()
            mat(tf)
        runs["tfidf_tf"] = tfidf
    if "neardup_batch" in ops:
        runs["neardup_batch"] = lambda d: mat(near_dup_batch(d, store=None, text_col="text", id_col="doc_id")[0])
    if "c4" in ops:
        def c4(d):
            relined = d.filter(F.col("text").isNotNull()).select(
                "doc_id", F.regexp_replace("text", " (\\w+ \\w+ \\w+ \\w+ \\w+)", "\n$1.").alias("t")
            )
            mat(curation.c4_line_filters(relined, "t", "doc_id"))
        runs["c4_filters"] = c4
    if "kmv" in ops:
        from morphik_core_spark.operators.dedup import word_shingles
        from morphik_core_spark.operators.sketches import kmv_overlap, kmv_sketch

        def kmv(d):
            sh = word_shingles(d, "text", "source", n=3)
            mat(kmv_overlap(kmv_sketch(sh, "source", "shingle", k=128), "source", k=128))
        runs["kmv_overlap"] = kmv
    if "shards" in ops:
        runs["training_shards"] = lambda d: mat(
            curation.training_shards(d, "doc_id", "n_chars", "source", n_shards=64)
        )
    if "ctfidf" in ops:
        from morphik_core_spark.operators.text_analysis import ctfidf_keywords

        runs["ctfidf_keywords"] = lambda d: mat(ctfidf_keywords(d, "text", "lang", top_n=5))
    if "interval" in ops:
        from morphik_core_spark.operators.asof import interval_point_join

        def interval(d):
            iv = d.select(
                (F.col("doc_id") % 100000).alias("lo"),
                ((F.col("doc_id") % 100000) + (F.col("n_chars") % 29)).alias("hi"),
            )
            pts = d.select((F.col("doc_id") % 120000).alias("p")).distinct()
            mat(interval_point_join(pts, iv, "p", "lo", "hi", bucket_width=32))
        runs["interval_join"] = interval

    out = []
    for name, fn in runs.items():
        t1 = timed(lambda: fn(docs1))
        t10 = timed(lambda: fn(docs10))
        out.append({"op": name, "t_1x": t1, "t_10x": t10, "ratio": round(t10 / t1, 2)})
        print(json.dumps(out[-1]))

    if "covariance" in ops:
        def cov(e):
            mat(embedding_stats.covariance_sums(e, dims=64))
        t1 = timed(lambda: cov(emb1))
        t10 = timed(lambda: cov(emb10))
        print(json.dumps({"op": "embedding_covariance", "t_1x": t1, "t_10x": t10, "ratio": round(t10 / t1, 2)}))


if __name__ == "__main__":
    main()
