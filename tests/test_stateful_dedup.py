"""applyInPandasWithState cross-batch dedup (custom stateful operator)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from rdfshape_api_spark.streaming.stateful_dedup import stream_dedup_first_seen


def test_cross_batch_first_seen(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    schema = pa.schema([("fp", pa.string()), ("doc_sha256", pa.string())])
    # batch 1: a, b     batch 2: b (dup), c
    pq.write_table(
        pa.table({"fp": ["a", "b"], "doc_sha256": ["s1", "s2"]}, schema=schema),
        str(in_dir / "b1.parquet"),
    )
    pq.write_table(
        pa.table({"fp": ["b", "c"], "doc_sha256": ["s3", "s4"]}, schema=schema),
        str(in_dir / "b2.parquet"),
    )

    stream = (
        spark.readStream.schema("fp string, doc_sha256 string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir))
    )
    out_dir = str(tmp_path / "out")
    q = (
        stream_dedup_first_seen(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    rows = {r["fp"]: r for r in spark.read.parquet(out_dir).collect()}
    # each fingerprint emitted exactly once, despite b appearing in 2 batches
    assert set(rows) == {"a", "b", "c"}
    assert rows["a"]["doc_sha256"] == "s1"
    assert rows["c"]["doc_sha256"] == "s4"
    total = spark.read.parquet(out_dir).count()
    assert total == 3
