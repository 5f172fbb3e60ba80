"""Single-pass multi-schema validation parity + plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from rdfshape_api_spark.fixtures.generator import (
    SHACL_SENSOR,
    SHAPEMAP_QUERY,
    SHEX_SENSOR,
)
from rdfshape_api_spark.plans import parse_shacl, parse_shexc, validate
from rdfshape_api_spark.plans.validate import validate_batch


def test_batch_matches_sequential(spark, triples_001):
    jobs = [
        (parse_shexc(SHEX_SENSOR), SHAPEMAP_QUERY, "shex_sensor"),
        (parse_shacl(SHACL_SENSOR), None, "shacl_sensor"),
    ]
    batch = validate_batch(triples_001, jobs).select(
        "doc_sha256", "node", "shape_id", "status"
    )
    seq = (
        validate(triples_001, jobs[0][0], shapemap=SHAPEMAP_QUERY, shape_label="shex_sensor")
        .unionByName(validate(triples_001, jobs[1][0], shape_label="shacl_sensor"))
        .select("doc_sha256", "node", "shape_id", "status")
    )
    assert batch.exceptAll(seq).isEmpty() and seq.exceptAll(batch).isEmpty()


def test_batch_single_aggregate_pass(spark, triples_001):
    jobs = [
        (parse_shexc(SHEX_SENSOR), SHAPEMAP_QUERY, "shex"),
        (parse_shacl(SHACL_SENSOR), None, "shacl"),
    ]
    plan = (
        validate_batch(triples_001, jobs)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # exactly ONE constraint aggregation (the groupBy carrying the m_/t_
    # sums) serves both schemas; sequential validation would have two
    assert plan.count("AS m_0_0") == 1
    assert plan.count("AS m_1_0") == 1


def test_batch_falls_back_for_complex_schemas(spark, triples_001):
    # a schema with a shape reference routes through the sequential path
    ref_schema = parse_shexc(
        "PREFIX ex: <http://example.org/>\n"
        "ex:A { ex:station @ex:B }\nex:B { ex:status . + }"
    )
    out = validate_batch(
        triples_001,
        [(ref_schema, "{FOCUS a <http://example.org/Reading>}@<http://example.org/A>", "refjob")],
    )
    assert out.filter(F.col("shape_id") == "refjob").count() > 0
