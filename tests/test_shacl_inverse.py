"""SHACL sh:inversePath property shapes."""

from __future__ import annotations

import pytest

from rdfshape_api_spark.plans import parse_shacl, validate

EX = "http://example.org/"
SH = "http://www.w3.org/ns/shacl#"


def _tri(spark, rows):
    cols = "doc_sha256 string, subj string, pred string, obj_kind string, obj_value string, obj_lang string, obj_datatype string"
    return spark.createDataFrame(
        [("d", EX + s, EX + p, k, (EX + o if k == "iri" else o), None, None) for s, p, k, o in rows],
        cols,
    )


SHAPES = f"""\
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <{EX}> .

ex:StationShape a sh:NodeShape ;
  sh:targetClass ex:Station ;
  sh:property [
    sh:path [ sh:inversePath ex:station ] ;
    sh:minCount 1 ;
    sh:maxCount 2 ;
    sh:nodeKind sh:IRI
  ] .
"""


def test_inverse_path_counts(spark):
    tri = _tri(
        spark,
        [
            ("s1", "type", "iri", "Station"),
            ("s2", "type", "iri", "Station"),
            ("s3", "type", "iri", "Station"),
            # s1: two readings point at it -> conformant
            ("r1", "station", "iri", "s1"),
            ("r2", "station", "iri", "s1"),
            # s2: three readings -> maxCount 2 violated
            ("r3", "station", "iri", "s2"),
            ("r4", "station", "iri", "s2"),
            ("r5", "station", "iri", "s2"),
            # s3: none -> minCount 1 violated
        ],
    ).withColumn(
        "pred",
        # map ex:type to rdf:type for targetClass resolution
        __import__("pyspark.sql.functions", fromlist=["when"]).when(
            __import__("pyspark.sql.functions", fromlist=["col"]).col("pred") == EX + "type",
            "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
        ).otherwise(__import__("pyspark.sql.functions", fromlist=["col"]).col("pred")),
    )
    out = {
        r["node"][len(EX):]: r["status"]
        for r in validate(tri, parse_shacl(SHAPES)).collect()
    }
    assert out == {
        "s1": "conformant",
        "s2": "nonconformant",
        "s3": "nonconformant",
    }


def test_inverse_plus_forward_mix(spark):
    shapes = f"""\
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <{EX}> .
ex:S a sh:NodeShape ;
  sh:targetSubjectsOf ex:name ;
  sh:property [ sh:path ex:name ; sh:minCount 1 ] ;
  sh:property [ sh:path [ sh:inversePath ex:managerOf ] ; sh:minCount 1 ] .
"""
    tri = _tri(
        spark,
        [
            ("a", "name", "literal", "A"),
            ("boss", "managerOf", "iri", "a"),
            ("b", "name", "literal", "B"),  # nobody manages b -> fail
        ],
    )
    out = {
        r["node"][len(EX):]: r["status"]
        for r in validate(tri, parse_shacl(shapes)).collect()
    }
    assert out == {"a": "conformant", "b": "nonconformant"}


def test_repeated_inverse_shacl_conjoins(spark):
    """Round 4: repeated SHACL property shapes on one (inverse) path
    CONJOIN per the spec — every shape applies to all values — so
    minCount 1 + maxCount 2 means 1 ≤ inbound ≤ 2.  (Previously a clean
    reject; partition matching is ShEx-only semantics.)"""
    shapes = f"""\
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <{EX}> .
ex:S a sh:NodeShape ;
  sh:targetSubjectsOf ex:name ;
  sh:property [ sh:path [ sh:inversePath ex:p ] ; sh:minCount 1 ] ;
  sh:property [ sh:path [ sh:inversePath ex:p ] ; sh:maxCount 2 ] .
"""
    rows = [("a", "name", "literal", "A"), ("b", "name", "literal", "B"),
            ("c", "name", "literal", "C"),
            ("s1", "p", "iri", "b"),
            ("s1", "p", "iri", "c"), ("s2", "p", "iri", "c"),
            ("s3", "p", "iri", "c")]
    tri = _tri(spark, rows)
    out = {r["node"][-1]: r["status"] for r in validate(tri, parse_shacl(shapes)).collect()}
    # a: 0 inbound (min fails); b: 1 inbound ok; c: 3 inbound (max fails)
    assert out == {"a": "nonconformant", "b": "conformant", "c": "nonconformant"}


def test_repeated_inverse_shex_partitions(spark):
    """The shex engine (reached for inverse constraints via shacl_to_shex)
    partition-matches repeated inverse constraints: each inbound subject
    is assigned to exactly one constraint, EachOf-style."""
    from rdfshape_api_spark.plans.convert import shacl_to_shex

    shapes = f"""\
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <{EX}> .
ex:S a sh:NodeShape ;
  sh:property [ sh:path [ sh:inversePath ex:p ] ; sh:minCount 1 ; sh:maxCount 1 ;
                sh:in ( ex:boss ) ] ;
  sh:property [ sh:path [ sh:inversePath ex:p ] ; sh:minCount 1 ] .
"""
    schema = shacl_to_shex(parse_shacl(shapes))
    rows = [
        # focus nodes must occur as subjects for fixed-node resolution
        ("a", "name", "literal", "A"), ("b", "name", "literal", "B"),
        ("c", "name", "literal", "C"),
        # a: inbound from boss + other → boss satisfies c1, other c2 → ok
        ("boss", "p", "iri", "a"), ("other", "p", "iri", "a"),
        # b: inbound from boss only → c1 takes boss, c2 starves → fail
        ("boss", "p", "iri", "b"),
        # c: two non-boss inbound → c1 starves → fail
        ("x", "p", "iri", "c"), ("y", "p", "iri", "c"),
    ]
    tri = _tri(spark, rows)
    smap = ", ".join(f"<{EX}{n}>@<{EX}S>" for n in ("a", "b", "c"))
    out = {r["node"][-1]: r["status"] for r in validate(tri, schema, shapemap=smap).collect()}
    assert out == {"a": "conformant", "b": "nonconformant", "c": "nonconformant"}
