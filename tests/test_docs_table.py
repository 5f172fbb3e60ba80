"""Docs-table source adapter + packaging smoke."""

from __future__ import annotations

import subprocess
import sys
import zipfile

import pytest

from rdfshape_api_spark.sources.docs_table import DocsSchemaError, read_docs_table


def test_parquet_path_with_schema_check(spark, fixtures_001):
    df = read_docs_table(spark, fixtures_001["docs"])
    assert {"repo", "path", "commit", "lang", "content"} <= set(df.columns)
    assert df.count() > 0


def test_schema_violation_rejected(spark, tmp_path):
    bad = str(tmp_path / "bad.parquet")
    spark.createDataFrame([(1, "x")], "a int, b string").write.parquet(bad)
    with pytest.raises(DocsSchemaError, match="missing required columns"):
        read_docs_table(spark, bad)


def test_unavailable_format_clear_error(spark, fixtures_001):
    with pytest.raises(Exception, match="iceberg|DATA_SOURCE|not available"):
        read_docs_table(spark, fixtures_001["docs"], fmt="iceberg")


def test_package_zip():
    out = subprocess.run(
        [sys.executable, "tools/package.py"], capture_output=True, text=True, check=True
    )
    assert "spark-submit" in out.stdout
    zip_path = out.stdout.split()[1]
    names = zipfile.ZipFile(zip_path).namelist()
    assert "rdfshape_api_spark/pipeline.py" in names
    assert "rdfshape_api_spark/plans/validate.py" in names
    assert not any("test" in n or "fixtures/rdf_" in n for n in names)


def test_spark_submit_py_files_end_to_end(fixtures_001, tmp_path):
    """The north-star deployment mode, actually exercised: package the
    engine, run the pipeline via ``spark-submit --py-files`` in a fresh
    JVM/driver, and check the emitted metrics line + store output.  This
    is the closest a single box gets to the cluster submit path — module
    resolution, zip imports, and the __main__ entry all go through
    spark-submit, not the test process."""
    import json
    import os
    import shutil

    subprocess.run(
        [sys.executable, "tools/package.py"], capture_output=True, check=True
    )
    submit = shutil.which("spark-submit")
    if submit is None:
        pytest.skip("spark-submit not on PATH")
    out_dir = str(tmp_path / "store")
    r = subprocess.run(
        [
            submit,
            "--master", "local[4]",
            "--py-files", os.path.abspath("dist/rdfshape_api_spark.zip"),
            "--conf", "spark.sql.adaptive.enabled=true",
            "--conf", "spark.sql.shuffle.partitions=8",
            "rdfshape_api_spark/pipeline.py",
            fixtures_001["docs"],
            out_dir,
        ],
        capture_output=True,
        text=True,
        timeout=280,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    metrics = json.loads(
        [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert metrics["docs"] == 1000
    assert metrics["sha_violations"] == 0
    assert metrics["triples"] > 10000
    assert os.listdir(out_dir), "pipeline wrote nothing to the output dir"
