"""Outlier-screen evaluation — mean/std vs median/MAD under injected
corruption.

The claim behind `analytics.mad_outliers` is that moment-based screens
(`anomaly_stats`) break down exactly when you need them: heavy
contamination inflates sigma until the contaminants look normal
(masking). This harness injects known 20x whales into order totals at
increasing contamination rates and scores both screens against the
injected ground truth — precision/recall per rate, plus the masking
point where the z-screen's recall collapses while the MAD screen's
holds (the breakdown-point story: MAD survives up to 50% contamination,
the mean breaks at 0).

Measured at sf0.01 (20x whales, z=3.5 both screens): recall at
1% / 5% / 20% / 33% contamination — z-screen 0.755 / 0.536 / 0.079 /
0.000 (masked: its own sigma absorbs the whales), MAD screen 0.903 /
0.921 / 0.890 / 0.834; precision 1.0 for both wherever defined.

Run: python evaluations/screen_eval.py   ($SPARK_GRAFT_SF_DIR or sf0.01)
Prints one JSON line: per-rate {z_prec, z_rec, mad_prec, mad_rec}.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from morphik_core_spark.operators.analytics import anomaly_stats, mad_outliers
from morphik_core_spark.session import get_spark
from morphik_core_spark.sources.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    spark = get_spark(app_name="screen_eval")
    orders = load_table(spark, "orders", SF_DIR).select(
        "o_orderkey",
        F.expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").alias("cents"),
    )
    out = {}
    for mod in (97, 20, 5, 3):  # ~1%, 5%, 20%, 33% contamination
        whale = F.col("o_orderkey") % mod == 0
        corrupted = orders.select(
            "o_orderkey",
            F.lit("all").alias("g"),
            (F.col("cents") * F.when(whale, F.lit(20)).otherwise(F.lit(1))).alias("v"),
            whale.alias("is_whale"),
        )
        n_whales = corrupted.filter("is_whale").count()

        # z-screen: flag rows the mean/std rule would flag (reproduce the
        # anomaly_stats criterion row-level to get per-row flags)
        st = anomaly_stats(corrupted, "g", "v", z_threshold=3.5).collect()[0]
        z_flag = corrupted.filter(
            F.abs(F.col("v") - F.lit(st["mean"])) > F.lit(3.5) * F.lit(st["std"])
        )
        z_tp = z_flag.filter("is_whale").count()
        z_n = z_flag.count()

        # MAD screen: same integer rule as the operator
        md = mad_outliers(corrupted, "g", "v", z=3.5).collect()[0]
        m_flag = corrupted.filter(
            F.abs(F.col("v") - F.lit(md["median"])).cast("decimal(38,0)") * F.lit(674_500)
            > F.lit(3_500_000).cast("decimal(38,0)") * F.lit(int(md["mad"]))
        )
        m_tp = m_flag.filter("is_whale").count()
        m_n = m_flag.count()

        out[f"contamination_1_in_{mod}"] = {
            "n_whales": n_whales,
            "z_precision": round(z_tp / z_n, 3) if z_n else None,
            "z_recall": round(z_tp / n_whales, 3),
            "mad_precision": round(m_tp / m_n, 3) if m_n else None,
            "mad_recall": round(m_tp / n_whales, 3),
        }
    print(json.dumps({"sf_dir": SF_DIR, "rates": out}))


if __name__ == "__main__":
    main()
