"""Spark extraction stage vs golden triples (SURVEY §2.1, §7.1 step 2/3)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F


def test_extraction_matches_golden_exactly(triples_001, fixtures_001):
    got = {
        tuple(r)
        for r in triples_001.select(
            "doc_sha256", "subj", "pred", "obj_kind", "obj_value", "obj_lang", "obj_datatype"
        ).collect()
    }
    exp = set(
        map(
            tuple,
            duckdb.sql(f"SELECT DISTINCT * FROM '{fixtures_001['triples']}'").fetchall(),
        )
    )
    assert got == exp  # P/R = 1.0


def test_error_channel(spark, fixtures_001):
    from rdfshape_api_spark.sources.extract import extract_errors

    docs = spark.read.parquet(fixtures_001["docs"])
    errs = extract_errors(docs)
    n = errs.count()
    # generator marks j % 97 == 13 → j ∈ {13, 110, …, 983}: 11 docs in 1000
    assert n == 11
    assert errs.filter(F.col("error").isNull()).count() == 0


def test_sha_invariant(spark, fixtures_001):
    from rdfshape_api_spark.lineage import sha_invariant_violations

    docs = spark.read.parquet(fixtures_001["docs"])
    assert sha_invariant_violations(docs).count() == 0


def test_prefix_tables(spark, fixtures_001):
    from rdfshape_api_spark.sources.extract import extract_prefixes, merged_prefix_map

    docs = spark.read.parquet(fixtures_001["docs"])
    pm = {r["prefix"]: r["iri"] for r in merged_prefix_map(extract_prefixes(docs)).collect()}
    assert pm["ex"] == "http://example.org/"
    assert pm["sensor"] == "http://example.org/"
    assert pm["xsd"] == "http://www.w3.org/2001/XMLSchema#"


def test_nt_fast_path_is_columnar(spark):
    """The N-Triples path must stay pure Spark SQL (no Python stage):
    its physical plan contains no ArrowEvalPython/MapInPandas nodes and
    the scan prunes to the used columns."""
    from rdfshape_api_spark.sources.extract import extract_ntriples_columnar, with_doc_sha

    docs = with_doc_sha(
        spark.createDataFrame(
            [("r", "p", "c", "ntriples", "<http://e/s> <http://e/p> <http://e/o> .")],
            "repo string, path string, commit string, lang string, content string",
        )
    )
    plan = extract_ntriples_columnar(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "InPandas" not in plan
