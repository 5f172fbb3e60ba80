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
