"""Validation compiler + evaluator vs golden verdicts (SURVEY §2.7)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from rdfshape_api_spark.fixtures.generator import SHACL_SENSOR, SHAPEMAP_QUERY, SHEX_SENSOR
from rdfshape_api_spark.plans import parse_shacl, parse_shexc, validate

EX = "http://example.org/"
XSD = "http://www.w3.org/2001/XMLSchema#"


def test_shex_parse():
    s = parse_shexc(SHEX_SENSOR)
    shape = s.shapes[EX + "ValidReading"]
    assert len(shape.constraints) == 3
    dt, temp, status = shape.constraints
    assert dt.pred == EX + "readingDatetime" and dt.datatype == XSD + "dateTime"
    assert (dt.min_count, dt.max_count) == (1, 1)
    assert temp.min_inclusive == 18 and temp.max_inclusive == 20
    assert (temp.min_count, temp.max_count) == (1, None)
    assert status.value_set == [("literal", "OK"), ("literal", "RUNNING")]


def test_shex_parse_features():
    s = parse_shexc(
        """PREFIX ex: <http://e/>
        PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
        ex:S CLOSED EXTRA ex:p {
          ex:p IRI + ;
          ex:q @ex:T ? ;
          ex:r xsd:string
          PATTERN "^a.*" MINLENGTH 2 MAXLENGTH 10 {2,4} ;
          a [ ex:C ]
        }
        ex:T { ex:x . }
        """
    )
    sh = s.shapes["http://e/S"]
    assert sh.closed
    p, q, r, ty = sh.constraints
    assert p.node_kind == "iri" and p.extra and p.max_count is None
    assert q.ref_shape == "http://e/T" and (q.min_count, q.max_count) == (0, 1)
    assert r.pattern == "^a.*" and (r.min_length, r.max_length) == (2, 10)
    assert (r.min_count, r.max_count) == (2, 4)
    assert ty.value_set == [("iri", "http://e/C")]


def test_shex_rejects_out_of_subset():
    # `start` is supported now; IMPORT stays a clean reject (needs
    # external resolution)
    with pytest.raises(ValueError):
        parse_shexc("PREFIX ex: <http://e/>\nIMPORT <http://e/other.shex>\nex:S { ex:p . }")


def test_shacl_parse():
    s = parse_shacl(SHACL_SENSOR)
    shape = s.shapes["http://example.org/ValidReadingShape"]
    assert shape.target_class == [EX + "Reading"]
    by_pred = {c.pred: c for c in shape.constraints}
    assert by_pred[EX + "readingDatetime"].max_count == 1
    assert by_pred[EX + "readingTemperature"].min_inclusive == 18
    assert by_pred[EX + "status"].value_set == [("literal", "OK"), ("literal", "RUNNING")]


def test_verdicts_match_golden(triples_001, fixtures_001):
    v_shex = validate(
        triples_001, parse_shexc(SHEX_SENSOR), shapemap=SHAPEMAP_QUERY, shape_label="shex_sensor"
    )
    v_shacl = validate(triples_001, parse_shacl(SHACL_SENSOR), shape_label="shacl_sensor")
    got = {
        (r["doc_sha256"], r["node"], r["shape_id"], r["status"])
        for v in (v_shex, v_shacl)
        for r in v.collect()
    }
    exp = set(map(tuple, duckdb.sql(f"SELECT * FROM '{fixtures_001['verdicts']}'").fetchall()))
    assert got == exp


def test_reasons_populated(triples_001):
    v = validate(triples_001, parse_shexc(SHEX_SENSOR), shapemap=SHAPEMAP_QUERY)
    bad = v.filter(F.col("status") == "nonconformant")
    assert bad.filter(F.size("reasons") == 0).count() == 0
    ok = v.filter(F.col("status") == "conformant")
    assert ok.filter(F.size("reasons") > 0).count() == 0


def _mini_triples(spark, rows):
    return spark.createDataFrame(
        [("d1", *r) for r in rows],
        "doc_sha256 string, subj string, pred string, obj_kind string, "
        "obj_value string, obj_lang string, obj_datatype string",
    )


def test_shape_reference_join(spark):
    """ShEx @ref (SURVEY J3): value node must conform to the referenced
    shape."""
    schema = parse_shexc(
        """PREFIX ex: <http://e/>
        PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
        ex:Person { ex:knows @ex:Named + }
        ex:Named { ex:name xsd:string }
        """
    )
    rows = [
        ("http://e/a", "http://e/knows", "iri", "http://e/b", None, None),
        ("http://e/b", "http://e/name", "literal", "Bob", None, None),
        ("http://e/c", "http://e/knows", "iri", "http://e/x", None, None),
        # x has no name → c nonconformant
    ]
    tri = _mini_triples(spark, rows)
    v = validate(tri, schema, shapemap="<http://e/a>@<http://e/Person>, <http://e/c>@<http://e/Person>")
    res = {r["node"]: r["status"] for r in v.collect()}
    assert res == {"http://e/a": "conformant", "http://e/c": "nonconformant"}


def test_mutual_recursion_fixpoint(spark):
    """A⇄B mutual recursion resolves via the greatest-fixpoint loop
    (full coverage in test_recursion.py)."""
    schema = parse_shexc(
        "PREFIX ex: <http://e/>\nex:A { ex:p @ex:B }\nex:B { ex:q @ex:A }"
    )
    tri = _mini_triples(
        spark,
        [
            ("http://e/a", "http://e/p", "iri", "http://e/b", None, None),
            ("http://e/b", "http://e/q", "iri", "http://e/a", None, None),
        ],
    )
    v = validate(tri, schema, shapemap="<http://e/a>@<http://e/A>")
    assert v.collect()[0]["status"] == "conformant"


def test_closed_shape(spark):
    schema = parse_shexc("PREFIX ex: <http://e/>\nex:S CLOSED { ex:p . }")
    tri = _mini_triples(
        spark,
        [
            ("http://e/ok", "http://e/p", "literal", "1", None, None),
            ("http://e/bad", "http://e/p", "literal", "1", None, None),
            ("http://e/bad", "http://e/other", "literal", "1", None, None),
        ],
    )
    v = validate(tri, schema, shapemap="<http://e/ok>@<http://e/S>, <http://e/bad>@<http://e/S>")
    res = {r["node"]: r["status"] for r in v.collect()}
    assert res == {"http://e/ok": "conformant", "http://e/bad": "nonconformant"}


def test_extra_relaxes_matching(spark):
    """EXTRA ex:p: non-matching values of ex:p are tolerated."""
    schema = parse_shexc(
        "PREFIX ex: <http://e/>\nPREFIX xsd: <http://www.w3.org/2001/XMLSchema#>\n"
        "ex:S EXTRA ex:p { ex:p xsd:integer + }\n"
        "ex:T { ex:p xsd:integer + }"
    )
    rows = [
        ("http://e/n", "http://e/p", "literal", "5", None, "http://www.w3.org/2001/XMLSchema#integer"),
        ("http://e/n", "http://e/p", "literal", "notanint", None, None),
    ]
    tri = _mini_triples(spark, rows)
    v = validate(tri, schema, shapemap="<http://e/n>@<http://e/S>, <http://e/n>@<http://e/T>")
    res = {(r["node"], r["shape_id"]): r["status"] for r in v.collect()}
    assert res[("http://e/n", "http://e/S")] == "conformant"
    assert res[("http://e/n", "http://e/T")] == "nonconformant"


def test_shacl_target_kinds(spark):
    schema = parse_shacl(
        """@prefix sh: <http://www.w3.org/ns/shacl#> .
        @prefix ex: <http://e/> .
        ex:S a sh:NodeShape ;
          sh:targetSubjectsOf ex:p ;
          sh:property [ sh:path ex:p ; sh:minCount 2 ] .
        """
    )
    tri = _mini_triples(
        spark,
        [
            ("http://e/a", "http://e/p", "literal", "1", None, None),
            ("http://e/a", "http://e/p", "literal", "2", None, None),
            ("http://e/b", "http://e/p", "literal", "1", None, None),
        ],
    )
    v = validate(tri, schema)
    res = {r["node"]: r["status"] for r in v.collect()}
    assert res == {"http://e/a": "conformant", "http://e/b": "nonconformant"}


def test_resolve_focus_mixed_selectors(spark):
    """A4/J1: a multi-association shapemap mixing fixed nodes with query
    selectors resolves to one work-list row per (doc, node, shape)
    (TriggerShapeMap.scala:52-54; NodeSelector.fromString,
    DataExtract.scala:128)."""
    from rdfshape_api_spark.model import RDF_TYPE
    from rdfshape_api_spark.plans.shapemap import parse_shapemap, resolve_focus

    rows = [
        ("http://e/r1", RDF_TYPE, "iri", "http://e/C", None, None),
        ("http://e/r1", "http://e/station", "iri", "http://e/hub", None, None),
        ("http://e/r2", "http://e/station", "iri", "http://e/hub", None, None),
        ("http://e/fix", "http://e/p", "literal", "v", None, None),
    ]
    tri = _mini_triples(spark, rows)
    assocs = parse_shapemap(
        "{FOCUS a ex:C}@ex:S1, {FOCUS ex:station ex:hub}@ex:S2, ex:fix@ex:S3",
        {"ex": "http://e/"},
    )
    assert [a.kind for a in assocs] == ["query", "query", "fixed"]
    got = {(r["node"], r["shape_id"]) for r in resolve_focus(tri, assocs).collect()}
    assert got == {
        ("http://e/r1", "http://e/S1"),
        ("http://e/r1", "http://e/S2"),
        ("http://e/r2", "http://e/S2"),
        ("http://e/fix", "http://e/S3"),
    }


def test_shex_inverse_triple_constraint(spark):
    """ShExC inverse constraint `^ex:p` (senseFlags): ranges over triples
    whose OBJECT is the focus node; values are the pointing subjects."""
    schema = parse_shexc(
        "PREFIX ex: <http://e/>\n"
        "ex:Managed { ^ex:managerOf [ ex:boss ] ; ex:name . }"
    )
    tc = [c for c in schema.shapes["http://e/Managed"].constraints if c.inverse]
    assert len(tc) == 1 and tc[0].pred == "http://e/managerOf"
    rows = [
        ("http://e/a", "http://e/name", "literal", "A", None, None),
        ("http://e/b", "http://e/name", "literal", "B", None, None),
        ("http://e/c", "http://e/name", "literal", "C", None, None),
        ("http://e/boss", "http://e/managerOf", "iri", "http://e/a", None, None),
        ("http://e/other", "http://e/managerOf", "iri", "http://e/b", None, None),
        # c: nobody manages it
    ]
    tri = _mini_triples(spark, rows)
    smap = ", ".join(f"<http://e/{n}>@<http://e/Managed>" for n in ("a", "b", "c"))
    out = {r["node"][-1]: r["status"] for r in validate(tri, schema, shapemap=smap).collect()}
    # a: managed by boss (in value set, exactly one) → conformant
    # b: managed by other (not ex:boss) → nonconformant
    # c: zero inbound → cardinality {1,1} fails
    assert out == {"a": "conformant", "b": "nonconformant", "c": "nonconformant"}


def test_shex_inverse_renders_roundtrip():
    """to_shexc renders the ^ flag; reparse is stable."""
    src = (
        "PREFIX ex: <http://e/>\n"
        "ex:Managed { ^ex:managerOf [ ex:boss ] ; ex:name . }"
    )
    from rdfshape_api_spark.plans.convert import to_shexc

    text = to_shexc(parse_shexc(src))
    assert "^ex:managerOf" in text
    re = parse_shexc(text)
    assert any(c.inverse for c in re.shapes["http://e/Managed"].constraints)
