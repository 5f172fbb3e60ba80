"""ShEx EachOf with repeated properties — partition-matching semantics.

Each triple must be matched by exactly one constraint of the group
(transportation feasibility over satisfaction profiles); reference
semantics live behind the shexs engine (SchemaValidate.scala:97-99).
"""

from __future__ import annotations

import pytest

from rdfshape_api_spark.plans import parse_shexc, validate

EX = "http://example.org/"
XSD = "http://www.w3.org/2001/XMLSchema#"


def _tri(spark, rows):
    cols = "doc_sha256 string, subj string, pred string, obj_kind string, obj_value string, obj_lang string, obj_datatype string"
    return spark.createDataFrame(
        [
            ("d", EX + s, EX + p, k, (EX + o if k == "iri" else o), None, dt)
            for s, p, k, o, dt in rows
        ],
        cols,
    )


def _statuses(tri, schema_text, nodes, shape="S"):
    schema = parse_shexc(schema_text)
    smap = ", ".join(f"<{EX}{n}>@<{EX}{shape}>" for n in nodes)
    return {
        r["node"][len(EX):]: r["status"]
        for r in validate(tri, schema, shapemap=smap).collect()
    }


SCHEMA_STR_INT = f"""\
PREFIX ex: <{EX}>
PREFIX xsd: <{XSD}>
ex:S {{
  ex:val xsd:string ;
  ex:val xsd:integer
}}
"""


def test_disjoint_value_exprs(spark):
    tri = _tri(
        spark,
        [
            # a: one string + one integer -> conformant
            ("a", "val", "literal", "hello", None),
            ("a", "val", "literal", "5", XSD + "integer"),
            # b: two strings -> integer constraint unmatched
            ("b", "val", "literal", "x", None),
            ("b", "val", "literal", "y", None),
            # c: string + integer + iri (matches neither) -> fail
            ("c", "val", "literal", "hi", None),
            ("c", "val", "literal", "7", XSD + "integer"),
            ("c", "val", "iri", "thing", None),
            # e: only an integer -> string constraint unmatched
            ("e", "val", "literal", "9", XSD + "integer"),
        ],
    )
    out = _statuses(tri, SCHEMA_STR_INT, ["a", "b", "c", "e"])
    assert out == {
        "a": "conformant",
        "b": "nonconformant",
        "c": "nonconformant",
        "e": "nonconformant",
    }


def test_overlapping_value_exprs_need_flow(spark):
    """Values matching BOTH constraints: a greedy per-constraint count
    would mis-assign; the feasibility conditions find the partition."""
    schema = f"""\
PREFIX ex: <{EX}>
PREFIX xsd: <{XSD}>
ex:S {{
  ex:lbl MINLENGTH 1 ;
  ex:lbl PATTERN "^a"
}}
"""
    tri = _tri(
        spark,
        [
            # "abc" matches both; "zzz" matches only MINLENGTH:
            # abc->pattern, zzz->minlength  => conformant
            ("a", "lbl", "literal", "abc", None),
            ("a", "lbl", "literal", "zzz", None),
            # both match only MINLENGTH -> pattern constraint starves
            ("b", "lbl", "literal", "zzz", None),
            ("b", "lbl", "literal", "yyy", None),
            # both match both -> one each, conformant
            ("c", "lbl", "literal", "aa", None),
            ("c", "lbl", "literal", "ab", None),
        ],
    )
    out = _statuses(tri, schema, ["a", "b", "c"])
    assert out == {"a": "conformant", "b": "nonconformant", "c": "conformant"}


def test_cardinalities_within_group(spark):
    schema = f"""\
PREFIX ex: <{EX}>
PREFIX xsd: <{XSD}>
ex:S {{
  ex:val xsd:string {{1,2}} ;
  ex:val xsd:integer ?
}}
"""
    tri = _tri(
        spark,
        [
            ("a", "val", "literal", "x", None),  # 1 string, 0 int -> ok
            ("b", "val", "literal", "x", None),
            ("b", "val", "literal", "y", None),
            ("b", "val", "literal", "5", XSD + "integer"),  # 2 str + 1 int -> ok
            ("c", "val", "literal", "5", XSD + "integer"),  # 0 strings -> fail
            ("e", "val", "literal", "x", None),
            ("e", "val", "literal", "y", None),
            ("e", "val", "literal", "z", None),  # 3 strings > max 2 -> fail
        ],
    )
    out = _statuses(tri, schema, ["a", "b", "c", "e"])
    assert out == {
        "a": "conformant",
        "b": "conformant",
        "c": "nonconformant",
        "e": "nonconformant",
    }


def test_extra_relaxes_unmatched(spark):
    schema = f"""\
PREFIX ex: <{EX}>
PREFIX xsd: <{XSD}>
ex:S EXTRA ex:val {{
  ex:val xsd:string ;
  ex:val xsd:integer
}}
"""
    tri = _tri(
        spark,
        [
            # string + integer + unmatched iri -> EXTRA absorbs the iri
            ("a", "val", "literal", "hi", None),
            ("a", "val", "literal", "5", XSD + "integer"),
            ("a", "val", "iri", "thing", None),
            # missing integer still fails (lower bound, not extra-related)
            ("b", "val", "literal", "hi", None),
        ],
    )
    out = _statuses(tri, schema, ["a", "b"])
    assert out == {"a": "conformant", "b": "nonconformant"}


def test_repeated_in_oneof_alternative(spark):
    schema = f"""\
PREFIX ex: <{EX}>
PREFIX xsd: <{XSD}>
ex:S {{
  ex:val xsd:string ; ex:val xsd:integer
  | ex:tag xsd:string
}}
"""
    tri = _tri(
        spark,
        [
            ("a", "val", "literal", "x", None),
            ("a", "val", "literal", "5", XSD + "integer"),
            ("b", "tag", "literal", "t", None),
            ("c", "val", "literal", "x", None),  # neither alt satisfied
        ],
    )
    out = _statuses(tri, schema, ["a", "b", "c"])
    assert out == {"a": "conformant", "b": "conformant", "c": "nonconformant"}


def test_more_than_four_repeats_rejected(spark):
    schema = f"PREFIX ex: <{EX}>\nex:S {{\n" + " ;\n".join(
        ["  ex:v MINLENGTH 1"] * 5
    ) + "\n}\n"
    with pytest.raises(ValueError, match="repeated more than 4"):
        parse_shexc(schema)
