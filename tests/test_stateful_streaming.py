"""applyInPandasWithState: state persists across micro-batches."""

from __future__ import annotations

import time
from datetime import datetime

from pyspark.sql import functions as F

from morphik_core_spark.streaming.stateful import running_counter_stream


def test_running_counters_accumulate_across_batches(spark, tmp_path):
    src = str(tmp_path / "in")
    chk = str(tmp_path / "chk")
    schema = "event_id long, user_id long, value double, ts timestamp"

    def write_batch(rows):
        spark.createDataFrame(rows, schema).write.mode("append").parquet(src)

    out = str(tmp_path / "out")

    def run_once():
        # memory sink rejects checkpoint recovery; foreachBatch + parquet is
        # the fault-tolerant shape (same as the ingestion pipeline)
        stream = spark.readStream.schema(schema).parquet(src)

        def sink(batch_df, epoch_id):
            batch_df.write.mode("append").parquet(out)

        q = (
            running_counter_stream(stream)
            .writeStream.outputMode("append")
            .foreachBatch(sink)
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), "stream did not terminate"
        snapshots = spark.read.parquet(out).collect()
        latest = {}
        for r in snapshots:  # keep the most advanced snapshot per user
            cur = latest.get(r.user_id)
            if cur is None or r.n_events > cur[0]:
                latest[r.user_id] = (r.n_events, r.total_value)
        return latest

    t = datetime(2024, 1, 1)
    write_batch([(1, 10, 1.0, t), (2, 10, 2.0, t), (3, 20, 5.0, t)])
    got1 = run_once()
    assert got1[10] == (2, 3.0) and got1[20] == (1, 5.0)

    # second batch: state must carry over via the checkpoint
    write_batch([(4, 10, 4.0, t)])
    got2 = run_once()
    assert got2[10] == (3, 7.0)  # 2 events + 1 new, totals accumulate
