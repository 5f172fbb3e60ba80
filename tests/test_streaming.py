"""Structured Streaming validation tests (SURVEY §2.10 T1-T5)."""

from __future__ import annotations

import glob
import os
import shutil

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from rdfshape_api_spark.fixtures.generator import SHAPEMAP_QUERY, SHEX_SENSOR
from rdfshape_api_spark.streaming import CLOSE_CODES, StreamConfig, stream_validate


@pytest.fixture()
def stream_input(tmp_path, fixtures_001):
    """Split the fixture docs parquet into 3 chunk files (micro-batches)."""
    tbl = pq.read_table(fixtures_001["docs"])
    n = tbl.num_rows
    d = tmp_path / "in"
    d.mkdir()
    for i, (lo, hi) in enumerate([(0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n)]):
        pq.write_table(tbl.slice(lo, hi - lo), str(d / f"chunk{i}.parquet"))
    return str(d)


def test_stream_matches_batch(spark, stream_input, tmp_path, triples_001):
    out = str(tmp_path / "out")
    cfg = StreamConfig(
        shex_schema=SHEX_SENSOR,
        shex_shapemap=SHAPEMAP_QUERY,
        max_files_per_trigger=1,
    )
    status = stream_validate(spark, stream_input, out, cfg)
    assert status["kind"] == "STANDARD"
    assert status["code"] == CLOSE_CODES["STANDARD"]
    assert status["batches"] >= 1

    # T1: streamed verdicts == batch verdicts on the same input
    from rdfshape_api_spark.plans import parse_shexc, validate

    batch = validate(
        triples_001, parse_shexc(SHEX_SENSOR), shapemap=SHAPEMAP_QUERY, shape_label="shex_stream"
    ).select("doc_sha256", "node", "status")
    streamed = spark.read.parquet(os.path.join(out, "verdicts")).select(
        "doc_sha256", "node", "status"
    )
    assert streamed.exceptAll(batch).isEmpty()
    assert batch.exceptAll(streamed).isEmpty()


def test_halt_on_invalid(spark, stream_input, tmp_path):
    out = str(tmp_path / "halt")
    cfg = StreamConfig(
        shex_schema=SHEX_SENSOR,
        shex_shapemap=SHAPEMAP_QUERY,
        halt_on_invalid=True,
        max_files_per_trigger=1,
    )
    status = stream_validate(spark, stream_input, out, cfg)
    # fixture has nonconformant readings in every chunk → halts on batch 0
    assert status["kind"] == "INVALID_ITEM"
    assert status["code"] == 3003
    assert status["batches"] == 1


def test_halt_on_errored(spark, stream_input, tmp_path):
    out = str(tmp_path / "halt_err")
    cfg = StreamConfig(
        shex_schema=SHEX_SENSOR,
        shex_shapemap=SHAPEMAP_QUERY,
        halt_on_errored=True,
        max_files_per_trigger=1,
    )
    status = stream_validate(spark, stream_input, out, cfg)
    # ~1% syntax-error docs exist in the fixture → ERRORED_ITEM close
    assert status["kind"] == "ERRORED_ITEM"
    assert status["code"] == 3005


def test_no_schema_is_configuration_error(spark, stream_input, tmp_path):
    out = str(tmp_path / "noschema")
    status = stream_validate(spark, stream_input, out, StreamConfig())
    assert status["kind"] == "CONFIGURATION_ERROR"
    assert status["code"] == 3002


def test_kafka_source_config_selection():
    """stream block with server+topic selects the Kafka source path
    (CometTransformations.scala:115-141); without it, file-stream."""
    from rdfshape_api_spark.streaming.validate_stream import StreamConfig

    cfg = StreamConfig.from_reference_json(
        {
            "validator": {"schema": {"content": "x", "engine": "shex"},
                           "triggerMode": {"shape-map": "{FOCUS a ex:T}@ex:S"}},
            "extractor": {"data": {"format": "Turtle"}},
            "stream": {"server": "kafka://broker", "port": 9092,
                        "topic": "rdf-docs", "groupId": "g1"},
        }
    )
    assert cfg.uses_kafka()
    assert cfg.extractor_format == "turtle"
    nofk = StreamConfig.from_reference_json(
        {"validator": {"schema": {"content": "x", "engine": "shex"},
                        "triggerMode": {"shape-map": "m"}}}
    )
    assert not nofk.uses_kafka()


def test_kafka_recorded_offset_replay(spark, tmp_path):
    """Broker-less execution evidence for the Kafka source path (r5):
    recorded messages in the spark-sql-kafka wire shape stream through
    the SAME projection the live source uses (kafka_message_projection) —
    topic/partition/offset become repo/path/commit, value bytes become
    the document — and the full foreachBatch validation pipeline runs on
    top.  Streamed verdicts must equal batch validation of the same
    payloads."""
    import pyspark.sql.functions as SF

    from rdfshape_api_spark.streaming.validate_stream import (
        KAFKA_WIRE_SCHEMA,
        StreamConfig,
        stream_validate,
    )

    ex = "http://example.org/"
    good = f"@prefix ex: <{ex}> .\nex:n1 a ex:T ; ex:p ex:v .\n"
    bad = f"@prefix ex: <{ex}> .\nex:n2 a ex:T .\n"
    records = [
        (None, good.encode(), "rdf-docs", 0, 0),
        (None, bad.encode(), "rdf-docs", 0, 1),
        (None, good.replace("n1", "n3").encode(), "rdf-docs", 1, 0),
    ]
    replay_dir = tmp_path / "recorded"
    replay_dir.mkdir()
    spark.createDataFrame(
        [r + (None,) for r in records], KAFKA_WIRE_SCHEMA
    ).coalesce(1).write.mode("overwrite").parquet(str(replay_dir / "seg0"))
    # the file-stream reader expects files directly under the dir
    src = glob.glob(str(replay_dir / "seg0" / "*.parquet"))[0]
    shutil.move(src, str(replay_dir / "rec0.parquet"))
    shutil.rmtree(replay_dir / "seg0")

    cfg = StreamConfig(
        shex_schema=f"PREFIX ex: <{ex}>\nex:S {{ ex:p . }}",
        shex_shapemap=f"{{FOCUS a <{ex}T>}}@<{ex}S>",
        stream_info={
            "server": "kafka://recorded", "topic": "rdf-docs",
            "replayDir": str(replay_dir),
        },
    )
    out = str(tmp_path / "out")
    status = stream_validate(spark, str(tmp_path / "unused"), out, cfg)
    assert status["kind"] == "STANDARD" and status["batches"] >= 1

    verdicts = spark.read.parquet(os.path.join(out, "verdicts"))
    rows = {(r["node"], r["status"]) for r in verdicts.collect()}
    assert rows == {
        (ex + "n1", "conformant"),
        (ex + "n2", "nonconformant"),
        (ex + "n3", "conformant"),
    }
    # the projection's synthetic identity: repo=kafka:<topic>,
    # path=<partition>/<offset>, commit=<offset>
    docs = verdicts.select("doc_sha256").distinct()
    assert docs.count() == 3


def test_kafka_projection_identity_columns(spark):
    """The shared projection itself (unit): wire row → docs row."""
    from rdfshape_api_spark.streaming.validate_stream import (
        KAFKA_WIRE_SCHEMA,
        StreamConfig,
        kafka_message_projection,
    )

    cfg = StreamConfig(
        shex_schema="x",
        stream_info={"server": "kafka://b", "topic": "t"},
    )
    wire = spark.createDataFrame(
        [(None, b"<a> <b> <c> .", "t", 3, 17, None)], KAFKA_WIRE_SCHEMA
    )
    row = wire.select(*kafka_message_projection(cfg)).collect()[0]
    assert row["repo"] == "kafka:t"
    assert row["path"] == "3/17"
    assert row["commit"] == "17"
    assert row["content"] == "<a> <b> <c> ."
    import hashlib

    assert row["content_sha256"] == hashlib.sha256(b"<a> <b> <c> .").hexdigest()


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_KAFKA_BOOTSTRAP"),
    reason="no Kafka broker configured (set SPARK_GRAFT_KAFKA_BOOTSTRAP host:port)",
)
def test_kafka_source_integration(spark, tmp_path):
    """Real-broker integration: requires the spark-sql-kafka connector and
    a topic with RDF document values."""
    from rdfshape_api_spark.streaming.validate_stream import (
        StreamConfig,
        stream_validate,
    )

    host, port = os.environ["SPARK_GRAFT_KAFKA_BOOTSTRAP"].rsplit(":", 1)
    cfg = StreamConfig(
        shex_schema="PREFIX ex: <http://example.org/>\nex:S { ex:p . }",
        shex_shapemap="{FOCUS a <http://example.org/T>}@<http://example.org/S>",
        stream_info={"server": host, "port": int(port),
                     "topic": os.environ.get("SPARK_GRAFT_KAFKA_TOPIC", "rdf-docs")},
    )
    status = stream_validate(spark, str(tmp_path / "in"), str(tmp_path / "out"), cfg)
    assert status["code"] in (3000, 3003, 3005)


def test_windowed_event_counts_watermark_drops_late_rows(spark, tmp_path):
    """Tumbling windows + watermark over a file stream: a row older than
    the watermark is dropped; finalized windows emit exactly once
    (append mode)."""
    import os
    import time

    from rdfshape_api_spark.streaming.windowed_events import windowed_event_counts

    src = tmp_path / "events_in"
    src.mkdir()
    schema = "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"

    def write_batch(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(tmp_path / "stage" / name))
        import glob
        import shutil

        part = glob.glob(str(tmp_path / "stage" / name / "part-*.parquet"))[0]
        shutil.copy(part, str(src / f"{name}.parquet"))

    from datetime import datetime

    t = datetime(2024, 1, 1, 10, 0, 0)

    def at(h, m):
        return datetime(2024, 1, 1, h, m, 0)

    write_batch(
        "b1",
        [
            (1, at(10, 5), 1, "click", 1.0),
            (2, at(10, 40), 1, "click", 2.0),
            # advances the watermark to 13:00 - 2h = 11:00 → the 10:00
            # window is finalized
            (3, at(13, 0), 2, "view", 3.0),
        ],
    )
    stream = spark.readStream.schema(schema).parquet(str(src))
    agg = windowed_event_counts(stream, window_minutes=60, watermark_minutes=120)
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # late row for the CLOSED 10:00 window (watermark 11:00) + a row
        # at 16:00 that pushes the watermark to 14:00, finalizing 13:00
        write_batch(
            "b2",
            [
                (4, at(10, 50), 1, "click", 9.0),  # late → dropped
                (5, at(16, 0), 2, "view", 4.0),
            ],
        )
        q.processAllAvailable()
        rows = {
            (r["window_start"].hour, r["event_type"]): r["n_events"]
            for r in spark.sql("SELECT * FROM win_counts").collect()
        }
        # 10:00 window emitted once with the ON-TIME rows only
        assert rows[(10, "click")] == 2
        assert rows[(13, "view")] == 1
    finally:
        q.stop()


def test_sessionize_stream_matches_batch_sessions(spark, tmp_path):
    """session_window sessions over a (bounded) stream agree with the
    batch gap-sessionization session count per user."""
    from rdfshape_api_spark.streaming.windowed_events import sessionize_stream

    src = tmp_path / "sess_in"
    src.mkdir()
    schema = "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"
    from datetime import datetime

    rows = [
        (1, datetime(2024, 1, 1, 9, 0), 1, "a", 0.0),
        (2, datetime(2024, 1, 1, 9, 10), 1, "a", 0.0),   # same session
        (3, datetime(2024, 1, 1, 11, 0), 1, "a", 0.0),   # new session
        (4, datetime(2024, 1, 1, 9, 5), 2, "a", 0.0),
    ]
    df = spark.createDataFrame(rows, schema).coalesce(1)
    df.write.mode("overwrite").parquet(str(tmp_path / "stage_s"))
    import glob
    import shutil

    for i, part in enumerate(
        glob.glob(str(tmp_path / "stage_s" / "part-*.parquet"))
    ):
        shutil.copy(part, str(src / f"s{i}.parquet"))

    stream = spark.readStream.schema(schema).parquet(str(src))
    q = (
        sessionize_stream(stream, gap_minutes=30)
        .writeStream.format("memory")
        .queryName("sess")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        out = spark.sql("SELECT * FROM sess").collect()
        per_user = {}
        for r in out:
            per_user.setdefault(r["user_id"], []).append(r["n_events"])
        assert sorted(per_user[1]) == [1, 2]  # two sessions: 2 events + 1
        assert per_user[2] == [1]
    finally:
        q.stop()
