"""ShEx recursive shape references — the SURVEY §4 fixpoint row."""

from __future__ import annotations

from pyspark.sql import functions as F

from rdfshape_api_spark.plans import parse_shexc, validate

EX = "http://example.org/"

SCHEMA = f"""\
PREFIX ex: <{EX}>
ex:PersonShape {{
  ex:name . ;
  ex:knows @ex:PersonShape *
}}
"""


def _triples(spark, rows):
    cols = ["doc_sha256", "subj", "pred", "obj_kind", "obj_value", "obj_lang", "obj_datatype"]
    return spark.createDataFrame(
        [("d", EX + s, EX + p, k, (EX + o if k == "iri" else o), None, None) for s, p, k, o in rows],
        ", ".join(f"{c} string" for c in cols),
    )


def test_mutual_recursion_greatest_fixpoint(spark):
    # a ⇄ b (cycle, both named)        → both conform
    # c → d, d has no name             → d fails, failure propagates to c
    # e stands alone with a name       → conforms
    tri = _triples(
        spark,
        [
            ("a", "name", "literal", "A"),
            ("b", "name", "literal", "B"),
            ("c", "name", "literal", "C"),
            ("e", "name", "literal", "E"),
            ("a", "knows", "iri", "b"),
            ("b", "knows", "iri", "a"),
            ("c", "knows", "iri", "d"),
            ("d", "knows", "iri", "e"),
        ],
    )
    schema = parse_shexc(SCHEMA)
    smap = ", ".join(
        f"<{EX}{n}>@<{EX}PersonShape>" for n in ("a", "b", "c", "d", "e")
    )
    out = {
        r["node"][len(EX):]: r["status"]
        for r in validate(tri, schema, shapemap=smap).collect()
    }
    assert out == {
        "a": "conformant",
        "b": "conformant",
        "c": "nonconformant",  # knows the nameless d
        "d": "nonconformant",  # no ex:name
        "e": "conformant",
    }


def test_self_loop_conforms(spark):
    tri = _triples(
        spark,
        [("x", "name", "literal", "X"), ("x", "knows", "iri", "x")],
    )
    out = validate(
        tri, parse_shexc(SCHEMA), shapemap=f"<{EX}x>@<{EX}PersonShape>"
    ).collect()
    assert out[0]["status"] == "conformant"


def test_acyclic_refs_still_work(spark):
    # non-recursive reference chain keeps the DAG path (no fixpoint)
    schema = parse_shexc(
        f"""PREFIX ex: <{EX}>
ex:A {{ ex:child @ex:B }}
ex:B {{ ex:name . }}
"""
    )
    tri = _triples(
        spark,
        [
            ("p", "child", "iri", "q"),
            ("q", "name", "literal", "Q"),
            ("r", "child", "iri", "s"),
        ],
    )
    out = {
        r["node"][len(EX):]: r["status"]
        for r in validate(
            tri, schema, shapemap=f"<{EX}p>@<{EX}A>, <{EX}r>@<{EX}A>"
        ).collect()
    }
    assert out == {"p": "conformant", "r": "nonconformant"}
