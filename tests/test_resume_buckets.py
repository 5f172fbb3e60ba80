"""Sub-stage (bucket-level) extraction resume — north rule: resumable from
checkpoint with per-partition lineage."""

from __future__ import annotations

import os
import shutil

from rdfshape_api_spark.fixtures.generator import SHAPEMAP_QUERY, SHEX_SENSOR
from rdfshape_api_spark.pipeline import run_pipeline


def test_bucketed_extraction_equals_single_shot(spark, fixtures_001, tmp_path):
    docs = spark.read.parquet(fixtures_001["docs"])
    m1 = run_pipeline(
        spark, docs, str(tmp_path / "single"),
        shex_schema=SHEX_SENSOR, shex_shapemap=SHAPEMAP_QUERY, resume=False,
    )
    m2 = run_pipeline(
        spark, docs, str(tmp_path / "bucketed"),
        shex_schema=SHEX_SENSOR, shex_shapemap=SHAPEMAP_QUERY, resume=False,
        extract_buckets=3, golden_triples=fixtures_001["triples"],
    )
    assert m2["triples"] == m1["triples"]
    assert m2["docs"] == m1["docs"]
    assert m2["error_docs"] == m1["error_docs"]
    assert m2["precision"] == 1.0 and m2["recall"] == 1.0


def test_bucket_resume_redoes_only_missing_bucket(spark, fixtures_001, tmp_path):
    docs = spark.read.parquet(fixtures_001["docs"])
    out = str(tmp_path / "out")
    m1 = run_pipeline(
        spark, docs, out,
        shex_schema=SHEX_SENSOR, shex_shapemap=SHAPEMAP_QUERY, resume=False,
        extract_buckets=3,
    )
    raw_dir = os.path.join(out, "raw_triples")
    # simulate a crash: bucket 1 lost, stage marker + downstream gone
    shutil.rmtree(os.path.join(raw_dir, "bucket=1"))
    os.remove(os.path.join(raw_dir, "_SUCCESS"))
    for stage in ("triple_store", "verdicts"):
        shutil.rmtree(os.path.join(out, stage), ignore_errors=True)

    kept_marker = os.path.join(raw_dir, "bucket=0", "_SUCCESS")
    mtime_before = os.path.getmtime(kept_marker)
    m2 = run_pipeline(
        spark, docs, out,
        shex_schema=SHEX_SENSOR, shex_shapemap=SHAPEMAP_QUERY, resume=True,
        extract_buckets=3,
    )
    # untouched bucket was NOT rewritten; totals identical to the first run
    assert os.path.getmtime(kept_marker) == mtime_before
    assert m2["triples"] == m1["triples"]
    assert m2["verdicts"] == m1["verdicts"]
