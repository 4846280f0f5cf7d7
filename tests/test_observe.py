from __future__ import annotations

import json

from terraform_aws_lambda_kinesis_to_es_spark.streaming.observe import MetricsListener


def test_metrics_listener_captures_progress(spark, tmp_path):
    listener = MetricsListener()
    spark.streams.addListener(listener)
    try:
        src = tmp_path / "src"
        src.mkdir()
        rows = [{"v": i} for i in range(7)]
        (src / "a.json").write_text("\n".join(json.dumps(r) for r in rows))
        q = (
            spark.readStream.schema("v long")
            .json(str(src))
            .writeStream.format("memory")
            .queryName("obs_t")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        # listener events are async; progress may lag the query end briefly
        import time

        for _ in range(50):
            if listener.total_input_rows() >= 7:
                break
            time.sleep(0.2)
        assert listener.total_input_rows() == 7
        assert listener.started
    finally:
        spark.streams.removeListener(listener)
