"""ShEx OR / AND / NOT value expressions (SURVEY §2.7 step 3)."""

from __future__ import annotations

from rdfshape_api_spark.plans import parse_shexc, validate

E = "http://e/"


def _tri(spark, rows):
    cols = "doc_sha256 string, subj string, pred string, obj_kind string, obj_value string, obj_lang string, obj_datatype string"
    return spark.createDataFrame([("d", *r) for r in rows], cols)


XSD = "http://www.w3.org/2001/XMLSchema#"


def test_or_datatypes(spark):
    schema = parse_shexc(
        f"PREFIX ex: <{E}>\nPREFIX xsd: <{XSD}>\n"
        "ex:S { ex:v xsd:integer OR xsd:decimal }"
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
    smap = ", ".join(f"<{E}{n}>@<{E}S>" for n in "abc")
    out = {r["node"][-1]: r["status"] for r in validate(tri, schema, shapemap=smap).collect()}
    assert out == {"a": "conformant", "b": "conformant", "c": "nonconformant"}


def test_or_value_set_and_nodekind(spark):
    schema = parse_shexc(
        f'PREFIX ex: <{E}>\nex:S {{ ex:v [ "OK" ] OR IRI }}'
    )
    tri = _tri(
        spark,
        [
            (E + "a", E + "v", "literal", "OK", None, None),
            (E + "b", E + "v", "iri", E + "thing", None, None),
            (E + "c", E + "v", "literal", "NO", None, None),
        ],
    )
    smap = ", ".join(f"<{E}{n}>@<{E}S>" for n in "abc")
    out = {r["node"][-1]: r["status"] for r in validate(tri, schema, shapemap=smap).collect()}
    assert out == {"a": "conformant", "b": "conformant", "c": "nonconformant"}


def test_not_value_set(spark):
    schema = parse_shexc(f'PREFIX ex: <{E}>\nex:S {{ ex:v NOT [ "BAD" ] }}')
    tri = _tri(
        spark,
        [
            (E + "a", E + "v", "literal", "FINE", None, None),
            (E + "b", E + "v", "literal", "BAD", None, None),
            (E + "c", E + "v", "iri", E + "x", None, None),  # non-literal ≠ "BAD"
        ],
    )
    smap = ", ".join(f"<{E}{n}>@<{E}S>" for n in "abc")
    out = {r["node"][-1]: r["status"] for r in validate(tri, schema, shapemap=smap).collect()}
    assert out == {"a": "conformant", "b": "nonconformant", "c": "conformant"}


def test_explicit_and_facets(spark):
    schema = parse_shexc(
        f"PREFIX ex: <{E}>\nPREFIX xsd: <{XSD}>\n"
        "ex:S { ex:v xsd:decimal AND MININCLUSIVE 5 }"
    )
    tri = _tri(
        spark,
        [
            (E + "a", E + "v", "literal", "7", None, XSD + "decimal"),
            (E + "b", E + "v", "literal", "3", None, XSD + "decimal"),
        ],
    )
    out = {
        r["node"][-1]: r["status"]
        for r in validate(
            tri, schema, shapemap=f"<{E}a>@<{E}S>, <{E}b>@<{E}S>"
        ).collect()
    }
    assert out == {"a": "conformant", "b": "nonconformant"}


def test_or_roundtrips_through_shexc():
    from rdfshape_api_spark.plans.convert import to_shexc

    schema = parse_shexc(
        f"PREFIX ex: <{E}>\nPREFIX xsd: <{XSD}>\n"
        'ex:S { ex:v xsd:integer OR [ "NA" ] ; ex:w NOT IRI }'
    )
    text = to_shexc(schema)
    assert "OR" in text and "NOT" in text
    re2 = parse_shexc(text)
    tc = re2.shapes[E + "S"].constraints[0]
    assert tc.disjuncts and len(tc.disjuncts) == 2
    assert re2.shapes[E + "S"].constraints[1].negated
