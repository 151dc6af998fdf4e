"""CLI for the end-to-end curation pipeline: documents parquet in,
per-stage JSON audit out (one line per stage + a final summary).

Usage: python scripts/curation_pipeline.py [--sf-dir DIR] [--shards N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from morphik_core_spark.pipeline import run_curation_pipeline
from morphik_core_spark.session import get_spark
from morphik_core_spark.sources.tables import load_table


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--shards", type=int, default=16)
    args = ap.parse_args()

    spark = get_spark(app_name="curation_pipeline")
    docs = load_table(spark, "documents", args.sf_dir)
    rates = {f"src{i}": 40 + (13 * i) % 61 for i in range(20)}
    curated, audit, stats = run_curation_pipeline(
        docs, mixture_rates=rates, n_shards=args.shards
    )
    for s in stats:
        print(json.dumps(s))
    shard_rows = audit.collect()
    print(
        json.dumps(
            {
                "stage": "summary",
                "final_docs": stats[-1]["rows_out"],
                "n_shards": len(shard_rows),
                "total_tokens": sum(r["tokens"] for r in shard_rows),
            }
        )
    )


if __name__ == "__main__":
    main()
