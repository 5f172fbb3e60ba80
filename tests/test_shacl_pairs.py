"""SHACL property-pair constraints (sh:equals / sh:disjoint /
sh:lessThan / sh:lessThanOrEquals) and sh:xone.

Reference behavior: shaclex / TopBraid engines behind
``SchemaService.scala:80-84`` implement SHACL core §4.3 (property pair
constraint components) and §4.6.3 (sh:xone)."""

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


def test_sh_equals(spark):
    schema = parse_shacl(
        PRELUDE
        + """ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:given ;
  sh:property [ sh:path ex:given ; sh:equals ex:preferred ] ."""
    )
    tri = _tri(
        spark,
        [
            # a: same value set on both predicates → conformant
            (E + "a", E + "given", "literal", "Ann", None, None),
            (E + "a", E + "preferred", "literal", "Ann", None, None),
            # b: differing sets → nonconformant
            (E + "b", E + "given", "literal", "Bob", None, None),
            (E + "b", E + "preferred", "literal", "Robert", None, None),
            # c: value only on the path side → nonconformant
            (E + "c", E + "given", "literal", "Cy", None, None),
        ],
    )
    out = {r["node"][-1]: r["status"] for r in validate(tri, schema).collect()}
    assert out == {"a": "conformant", "b": "nonconformant", "c": "nonconformant"}


def test_sh_disjoint(spark):
    schema = parse_shacl(
        PRELUDE
        + """ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:nick ;
  sh:property [ sh:path ex:nick ; sh:disjoint ex:formal ] ."""
    )
    tri = _tri(
        spark,
        [
            (E + "a", E + "nick", "literal", "Al", None, None),
            (E + "a", E + "formal", "literal", "Albert", None, None),
            (E + "b", E + "nick", "literal", "Bee", None, None),
            (E + "b", E + "formal", "literal", "Bee", None, None),
            # c: no formal values at all → trivially disjoint
            (E + "c", E + "nick", "literal", "Cee", None, None),
        ],
    )
    out = {r["node"][-1]: r["status"] for r in validate(tri, schema).collect()}
    assert out == {"a": "conformant", "b": "nonconformant", "c": "conformant"}


def test_sh_less_than(spark):
    schema = parse_shacl(
        PRELUDE
        + """ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:start ;
  sh:property [ sh:path ex:start ; sh:lessThan ex:end ] ."""
    )
    tri = _tri(
        spark,
        [
            (E + "a", E + "start", "literal", "1", None, None),
            (E + "a", E + "end", "literal", "5", None, None),
            # b: equal is NOT less-than → nonconformant
            (E + "b", E + "start", "literal", "5", None, None),
            (E + "b", E + "end", "literal", "5", None, None),
            # c: one end value below one start value → nonconformant
            (E + "c", E + "start", "literal", "3", None, None),
            (E + "c", E + "start", "literal", "9", None, None),
            (E + "c", E + "end", "literal", "7", None, None),
            # d: no end values → no pairs → conformant
            (E + "d", E + "start", "literal", "2", None, None),
            # e: non-numeric start → incomparable pair → nonconformant
            (E + "e", E + "start", "literal", "soon", None, None),
            (E + "e", E + "end", "literal", "7", None, None),
        ],
    )
    out = {r["node"][-1]: r["status"] for r in validate(tri, schema).collect()}
    assert out == {
        "a": "conformant",
        "b": "nonconformant",
        "c": "nonconformant",
        "d": "conformant",
        "e": "nonconformant",
    }


def test_sh_less_than_or_equals(spark):
    schema = parse_shacl(
        PRELUDE
        + """ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:start ;
  sh:property [ sh:path ex:start ; sh:lessThanOrEquals ex:end ] ."""
    )
    tri = _tri(
        spark,
        [
            (E + "a", E + "start", "literal", "5", None, None),
            (E + "a", E + "end", "literal", "5", None, None),
            (E + "b", E + "start", "literal", "6", None, None),
            (E + "b", E + "end", "literal", "5", None, None),
        ],
    )
    out = {r["node"][-1]: r["status"] for r in validate(tri, schema).collect()}
    assert out == {"a": "conformant", "b": "nonconformant"}


def test_sh_xone(spark):
    # exactly one member must hold per value: an integer in range matches
    # BOTH members → violation; a plain string matches only the pattern
    schema = parse_shacl(
        PRELUDE
        + """ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:v ;
  sh:property [ sh:path ex:v ;
    sh:xone ( [ sh:datatype xsd:integer ] [ sh:pattern "^[0-9]+$" ] ) ] ."""
    )
    tri = _tri(
        spark,
        [
            # typed integer whose lexical form matches the pattern → 2 hits
            (E + "a", E + "v", "literal", "7", None, XSD + "integer"),
            # plain "x7" matches neither → 0 hits → violation
            (E + "b", E + "v", "literal", "x7", None, None),
            # plain digits: pattern only (datatype member needs xsd:integer)
            (E + "c", E + "v", "literal", "42", None, None),
        ],
    )
    out = {r["node"][-1]: r["status"] for r in validate(tri, schema).collect()}
    assert out == {"a": "nonconformant", "b": "nonconformant", "c": "conformant"}


def test_pair_constraint_rejects_inverse_path(spark):
    with pytest.raises(ValueError, match="direct sh:path"):
        parse_shacl(
            PRELUDE
            + """ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:p ;
  sh:property [ sh:path [ sh:inversePath ex:p ] ; sh:equals ex:q ] ."""
        )
