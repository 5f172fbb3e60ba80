"""ShEx OneOf ('|') triple-expression alternatives."""

from __future__ import annotations

from rdfshape_api_spark.plans import parse_shexc, validate
from rdfshape_api_spark.plans.convert import to_shexc

E = "http://e/"
XSD = "http://www.w3.org/2001/XMLSchema#"


def _tri(spark, rows):
    cols = "doc_sha256 string, subj string, pred string, obj_kind string, obj_value string, obj_lang string, obj_datatype string"
    return spark.createDataFrame([("d", *r) for r in rows], cols)


SCHEMA = f"""PREFIX ex: <{E}>
PREFIX xsd: <{XSD}>
ex:Contact {{
  ex:email . ; ex:verified [ "true" ] |
  ex:phone . ; ex:country .
}}
"""


def test_parse_oneof_groups():
    sh = parse_shexc(SCHEMA).shapes[E + "Contact"]
    assert sh.alternatives is not None
    assert [len(g) for g in sh.alternatives] == [2, 2]
    assert not sh.constraints


def test_oneof_validation(spark):
    tri = _tri(
        spark,
        [
            # a: matches alternative 1 (email + verified)
            (E + "a", E + "email", "literal", "a@x", None, None),
            (E + "a", E + "verified", "literal", "true", None, None),
            # b: matches alternative 2 (phone + country)
            (E + "b", E + "phone", "literal", "123", None, None),
            (E + "b", E + "country", "literal", "BE", None, None),
            # c: partial alt-1 only → nonconformant
            (E + "c", E + "email", "literal", "c@x", None, None),
            # d: matches BOTH alternatives → conformant (at-least-one)
            (E + "d", E + "email", "literal", "d@x", None, None),
            (E + "d", E + "verified", "literal", "true", None, None),
            (E + "d", E + "phone", "literal", "456", None, None),
            (E + "d", E + "country", "literal", "NL", None, None),
        ],
    )
    smap = ", ".join(f"<{E}{n}>@<{E}Contact>" for n in "abcd")
    out = {
        r["node"][-1]: (r["status"], list(r["reasons"]))
        for r in validate(tri, parse_shexc(SCHEMA), shapemap=smap).collect()
    }
    assert out["a"][0] == "conformant"
    assert out["b"][0] == "conformant"
    assert out["c"][0] == "nonconformant"
    assert out["c"][1] == ["no OneOf alternative satisfied"]
    assert out["d"][0] == "conformant"


def test_oneof_roundtrips_through_shexc():
    text = to_shexc(parse_shexc(SCHEMA))
    assert " |" in text
    re2 = parse_shexc(text)
    assert re2.shapes[E + "Contact"].alternatives is not None


def test_repeated_predicate_in_eachof_parses():
    # repeated properties use partition-matching semantics now
    # (tests/test_shex_repeated.py); the parser accepts them
    schema = parse_shexc(f"PREFIX ex: <{E}>\nex:S {{ ex:p . ; ex:p . }}")
    assert len(schema.shapes[E + "S"].constraints) == 2
