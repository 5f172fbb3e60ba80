"""sh:property on logical-member nodes: the member compiles as an
anonymous node shape and the value condition becomes a shape reference
(shaclex parity: arbitrary nesting behind SchemaService.scala:80-84)."""

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
    cols = (
        "doc_sha256 string, subj string, pred string, obj_kind string, "
        "obj_value string, obj_lang string, obj_datatype string"
    )
    return spark.createDataFrame([("d", *r) for r in rows], cols)


def test_member_property_in_or(spark):
    """knows-values must have an email OR a phone."""
    schema = parse_shacl(
        PRELUDE
        + """ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:knows ;
  sh:property [ sh:path ex:knows ;
    sh:or ( [ sh:property [ sh:path ex:email ; sh:minCount 1 ] ]
            [ sh:property [ sh:path ex:phone ; sh:minCount 1 ] ] ) ] ."""
    )
    tri = _tri(
        spark,
        [
            # a knows e (has email) -> conformant
            (E + "a", E + "knows", "iri", E + "e", None, None),
            (E + "e", E + "email", "literal", "e@x", None, None),
            # b knows p (has phone) -> conformant
            (E + "b", E + "knows", "iri", E + "p", None, None),
            (E + "p", E + "phone", "literal", "555", None, None),
            # c knows n (neither) -> nonconformant
            (E + "c", E + "knows", "iri", E + "n", None, None),
            (E + "n", E + "other", "literal", "x", None, None),
        ],
    )
    out = {r["node"][-1]: r["status"] for r in validate(tri, schema).collect()}
    assert out == {"a": "conformant", "b": "conformant", "c": "nonconformant"}


def test_member_property_direct(spark):
    """A single member under sh:not: value must NOT conform to the
    anonymous shape (has a flag property)."""
    schema = parse_shacl(
        PRELUDE
        + """ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:v ;
  sh:property [ sh:path ex:v ;
    sh:not [ sh:property [ sh:path ex:flag ; sh:minCount 1 ] ] ] ."""
    )
    tri = _tri(
        spark,
        [
            (E + "a", E + "v", "iri", E + "clean", None, None),
            (E + "clean", E + "other", "literal", "x", None, None),
            (E + "b", E + "v", "iri", E + "flagged", None, None),
            (E + "flagged", E + "flag", "literal", "1", None, None),
        ],
    )
    out = {r["node"][-1]: r["status"] for r in validate(tri, schema).collect()}
    assert out == {"a": "conformant", "b": "nonconformant"}


def test_member_property_conjoined_with_nodekind(spark):
    """Direct fields on the member conjoin with the anonymous-shape ref."""
    schema = parse_shacl(
        PRELUDE
        + """ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:v ;
  sh:property [ sh:path ex:v ;
    sh:or ( [ sh:nodeKind sh:IRI ;
              sh:property [ sh:path ex:ok ; sh:minCount 1 ] ]
            [ sh:datatype xsd:integer ] ) ] ."""
    )
    tri = _tri(
        spark,
        [
            # IRI value with ex:ok -> first member
            (E + "a", E + "v", "iri", E + "g", None, None),
            (E + "g", E + "ok", "literal", "1", None, None),
            # integer literal -> second member
            (E + "b", E + "v", "literal", "7", None, XSD + "integer"),
            # IRI value without ex:ok, not an integer -> neither
            (E + "c", E + "v", "iri", E + "h", None, None),
            (E + "h", E + "nope", "literal", "1", None, None),
        ],
    )
    out = {r["node"][-1]: r["status"] for r in validate(tri, schema).collect()}
    assert out == {"a": "conformant", "b": "conformant", "c": "nonconformant"}


def test_member_qualified_still_rejects(spark):
    with pytest.raises(ValueError, match="qualifiedValueShape"):
        parse_shacl(
            PRELUDE
            + """ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:v ;
  sh:property [ sh:path ex:v ;
    sh:or ( [ sh:qualifiedValueShape [ sh:datatype xsd:integer ] ;
              sh:qualifiedMinCount 1 ]
            [ sh:datatype xsd:decimal ] ) ] ."""
        )


def test_member_property_plus_node_rejects(spark):
    with pytest.raises(ValueError, match="sh:property/sh:closed and sh:node"):
        parse_shacl(
            PRELUDE
            + """ex:T a sh:NodeShape ; sh:targetSubjectsOf ex:w ;
  sh:property [ sh:path ex:w ; sh:datatype xsd:string ] .
ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:v ;
  sh:property [ sh:path ex:v ;
    sh:or ( [ sh:node ex:T ;
              sh:property [ sh:path ex:u ; sh:minCount 1 ] ]
            [ sh:datatype xsd:integer ] ) ] ."""
        )
