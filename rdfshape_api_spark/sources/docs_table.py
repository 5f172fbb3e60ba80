"""Docs-table source adapter (north rule: "Iceberg tables of source-code
repositories").

Production reads the Iceberg table (snapshot isolation, hidden
partitioning, incremental scans); this sandbox has no Iceberg runtime JARs,
so the adapter resolves in order:

1. an Iceberg/catalog table identifier (``catalog.db.table``) via
   ``spark.read.table`` — works unchanged when the cluster ships the
   Iceberg runtime and catalog config;
2. an explicit ``format`` (e.g. ``iceberg`` with a path) when available;
3. a parquet path — the sandbox stand-in with the identical schema.

Schema is validated against the input_hint contract
``(repo, path, commit, lang, content[, content_sha256])`` either way.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

REQUIRED_COLUMNS = ("repo", "path", "commit", "lang", "content")


class DocsSchemaError(ValueError):
    pass


def _check_schema(df: DataFrame, source: str) -> DataFrame:
    missing = [c for c in REQUIRED_COLUMNS if c not in df.columns]
    if missing:
        raise DocsSchemaError(
            f"docs table {source!r} is missing required columns {missing}; "
            f"input contract is (repo, path, commit, lang, content)"
        )
    return df


def read_docs_table(
    spark: SparkSession, source: str, fmt: str | None = None
) -> DataFrame:
    """Load the docs table from an Iceberg/catalog identifier or a file
    path, with schema validation."""
    if fmt:
        try:
            return _check_schema(spark.read.format(fmt).load(source), source)
        except Exception as e:  # noqa: BLE001
            if "DATA_SOURCE_NOT_FOUND" in str(e) or "ClassNotFound" in str(e):
                raise DocsSchemaError(
                    f"format {fmt!r} is not available in this runtime "
                    "(Iceberg needs its runtime JARs on the cluster)"
                ) from e
            raise
    if not os.path.exists(source) and "/" not in source.strip("/"):
        # looks like a table identifier, not a filesystem path
        return _check_schema(spark.read.table(source), source)
    if os.path.isdir(source) or source.endswith(".parquet"):
        return _check_schema(spark.read.parquet(source), source)
    return _check_schema(spark.read.table(source), source)
