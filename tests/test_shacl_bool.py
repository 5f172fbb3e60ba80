"""SHACL sh:or / sh:and / sh:not logical components."""

from __future__ import annotations

import pytest

from rdfshape_api_spark.plans import parse_shacl, validate

E = "http://e/"
XSD = "http://www.w3.org/2001/XMLSchema#"

PRELUDE = f"""\
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <{E}> .
@prefix xsd: <{XSD}> .
"""


def _tri(spark, rows):
    cols = "doc_sha256 string, subj string, pred string, obj_kind string, obj_value string, obj_lang string, obj_datatype string"
    return spark.createDataFrame([("d", *r) for r in rows], cols)


def test_sh_or_datatypes(spark):
    schema = parse_shacl(
        PRELUDE
        + """ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:v ;
  sh:property [ sh:path ex:v ; sh:minCount 1 ;
    sh:or ( [ sh:datatype xsd:integer ] [ sh:datatype xsd:decimal ] ) ] ."""
    )
    tc = schema.shapes[E + "S"].constraints[0]
    assert tc.disjuncts and len(tc.disjuncts) == 2

    tri = _tri(
        spark,
        [
            (E + "a", E + "v", "literal", "5", None, XSD + "integer"),
            (E + "b", E + "v", "literal", "5.5", None, XSD + "decimal"),
            (E + "c", E + "v", "literal", "x", None, XSD + "string"),
        ],
    )
    out = {r["node"][-1]: r["status"] for r in validate(tri, schema).collect()}
    assert out == {"a": "conformant", "b": "conformant", "c": "nonconformant"}


def test_sh_not(spark):
    schema = parse_shacl(
        PRELUDE
        + """ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:v ;
  sh:property [ sh:path ex:v ; sh:not [ sh:in ( "BAD" ) ] ] ."""
    )
    tri = _tri(
        spark,
        [
            (E + "a", E + "v", "literal", "FINE", None, None),
            (E + "b", E + "v", "literal", "BAD", None, None),
        ],
    )
    out = {r["node"][-1]: r["status"] for r in validate(tri, schema).collect()}
    assert out == {"a": "conformant", "b": "nonconformant"}


def test_sh_and_merges(spark):
    schema = parse_shacl(
        PRELUDE
        + """ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:v ;
  sh:property [ sh:path ex:v ;
    sh:and ( [ sh:datatype xsd:decimal ] [ sh:minInclusive 5 ] ) ] ."""
    )
    tri = _tri(
        spark,
        [
            (E + "a", E + "v", "literal", "7", None, XSD + "decimal"),
            (E + "b", E + "v", "literal", "3", None, XSD + "decimal"),
        ],
    )
    out = {r["node"][-1]: r["status"] for r in validate(tri, schema).collect()}
    assert out == {"a": "conformant", "b": "nonconformant"}


def test_sh_xone_parses_as_exclusive_disjunction():
    schema = parse_shacl(
        PRELUDE
        + """ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:v ;
  sh:property [ sh:path ex:v ; sh:xone ( [ sh:datatype xsd:integer ] ) ] ."""
    )
    tc = schema.shapes[E + "S"].constraints[0]
    assert tc.xone and tc.disjuncts and len(tc.disjuncts) == 1
