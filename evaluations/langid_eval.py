"""Language-ID quality evaluation on planted multilingual documents.

The heuristic scorer (`text_analysis.language_id`) argmaxes stopword
hits over en/de/fr profiles. This harness generates synthetic documents
with a KNOWN language — a mixture of that language's stopwords plus
language-neutral filler at a controlled stopword density — and measures
accuracy as density falls. This quantifies the operating range of the
heuristic (high-density prose: near-perfect; terse/technical text: falls
toward the en-biased tie-break), which is the honest boundary a corpus
pipeline needs to know before trusting per-language routing.

Run: python evaluations/langid_eval.py      Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS_PER_LANG = 60
DOC_LEN = 60
FILLER = [f"w{i}" for i in range(200)]  # language-neutral tokens


def make_doc(rng: random.Random, words: list[str], density: float) -> str:
    toks = [
        rng.choice(words) if rng.random() < density else rng.choice(FILLER)
        for _ in range(DOC_LEN)
    ]
    return " ".join(toks)


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from morphik_core_spark.operators.text_analysis import STOPWORDS, language_id

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("langid_eval")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    rng = random.Random(42)
    out = {"metric": "langid_accuracy", "per_density": {}}
    for density in (0.3, 0.15, 0.07, 0.03):
        rows = []
        i = 0
        for lang, words in STOPWORDS.items():
            for _ in range(N_DOCS_PER_LANG):
                rows.append((i, lang, make_doc(rng, words, density)))
                i += 1
        df = spark.createDataFrame(rows, "doc_id long, true_lang string, text string")
        pred = language_id(df, "text", "doc_id")
        joined = df.join(pred, "doc_id")
        n = joined.count()
        correct = joined.filter("true_lang = pred_lang").count()
        per_lang = {
            r["true_lang"]: float(r["acc"])
            for r in joined.groupBy("true_lang")
            .agg(
                F.expr(
                    "ROUND(AVG(CASE WHEN true_lang = pred_lang THEN 1.0 ELSE 0.0 END), 4)"
                ).alias("acc")
            )
            .collect()
        }
        out["per_density"][str(density)] = {
            "accuracy": round(correct / n, 4),
            "per_lang": per_lang,
        }
    out["value"] = out["per_density"]["0.15"]["accuracy"]
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
