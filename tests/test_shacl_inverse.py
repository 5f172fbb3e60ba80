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


def test_repeated_inverse_rejected(spark):
    shapes = f"""\
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <{EX}> .
ex:S a sh:NodeShape ;
  sh:targetSubjectsOf ex:name ;
  sh:property [ sh:path [ sh:inversePath ex:p ] ; sh:minCount 1 ] ;
  sh:property [ sh:path [ sh:inversePath ex:p ] ; sh:maxCount 2 ] .
"""
    tri = _tri(spark, [("a", "name", "literal", "A")])
    with pytest.raises(ValueError, match="repeated inverse-path"):
        validate(tri, parse_shacl(shapes)).collect()
