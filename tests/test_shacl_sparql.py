"""SHACL-SPARQL constraints (sh:sparql → sh:select with $this).

Reference surface: the TopBraid engine option behind
`SchemaService.scala:80-84`.  Our evaluation is set-based: the constraint
query runs ONCE with ?this free, doc-scoped by threading the document id
through every BGP join; violators anti-overlay the core verdicts.
"""

from __future__ import annotations

from rdfshape_api_spark.plans import validate
from rdfshape_api_spark.plans.shacl import parse_shacl

E = "http://e/"


def _tri(spark, rows, doc="d"):
    cols = "doc_sha256 string, subj string, pred string, obj_kind string, obj_value string, obj_lang string, obj_datatype string"
    return spark.createDataFrame([(doc, *r) for r in rows], cols)


SHAPES = f"""
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <{E}> .
ex:PersonShape a sh:NodeShape ;
  sh:targetClass ex:Person ;
  sh:sparql [
    sh:message "birth after death" ;
    sh:select \"\"\"SELECT ?this WHERE {{
      ?this ex:born ?b .
      ?this ex:died ?d .
      FILTER (?b > ?d)
    }}\"\"\" ;
  ] .
"""

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def test_sh_sparql_basic(spark):
    tri = _tri(
        spark,
        [
            (E + "ok", RDF_TYPE, "iri", E + "Person", None, None),
            (E + "ok", E + "born", "literal", "1900", None, None),
            (E + "ok", E + "died", "literal", "1980", None, None),
            (E + "bad", RDF_TYPE, "iri", E + "Person", None, None),
            (E + "bad", E + "born", "literal", "1990", None, None),
            (E + "bad", E + "died", "literal", "1980", None, None),
            # no born/died at all: the constraint query has no solution
            (E + "free", RDF_TYPE, "iri", E + "Person", None, None),
        ],
    )
    schema = parse_shacl(SHAPES)
    out = {
        r["node"].rsplit("/", 1)[-1]: (r["status"], list(r["reasons"]))
        for r in validate(tri, schema).collect()
    }
    assert out["ok"][0] == "conformant"
    assert out["free"][0] == "conformant"
    assert out["bad"][0] == "nonconformant"
    assert "birth after death" in out["bad"][1]


def test_sh_sparql_doc_scoped(spark):
    # same node IRI in two documents; only doc d2's graph violates — the
    # d1 verdict must stay conformant (per-document dataset semantics)
    rows1 = [
        (E + "x", RDF_TYPE, "iri", E + "Person", None, None),
        (E + "x", E + "born", "literal", "1900", None, None),
        (E + "x", E + "died", "literal", "1980", None, None),
    ]
    rows2 = [
        (E + "x", RDF_TYPE, "iri", E + "Person", None, None),
        (E + "x", E + "born", "literal", "1999", None, None),
        (E + "x", E + "died", "literal", "1980", None, None),
    ]
    tri = _tri(spark, rows1, doc="d1").unionByName(_tri(spark, rows2, doc="d2"))
    schema = parse_shacl(SHAPES)
    out = {r["doc_sha256"]: r["status"] for r in validate(tri, schema).collect()}
    assert out == {"d1": "conformant", "d2": "nonconformant"}


def test_sh_sparql_prefix_declarations(spark):
    shapes = f"""
    @prefix sh: <http://www.w3.org/ns/shacl#> .
    @prefix ex: <{E}> .
    ex:S a sh:NodeShape ;
      sh:targetClass ex:Person ;
      sh:sparql [
        sh:prefixes [ sh:declare [ sh:prefix "exx" ; sh:namespace "{E}" ] ] ;
        sh:select "SELECT ?this WHERE {{ ?this exx:banned ?b }}" ;
      ] .
    """
    tri = _tri(
        spark,
        [
            (E + "a", RDF_TYPE, "iri", E + "Person", None, None),
            (E + "a", E + "banned", "literal", "yes", None, None),
            (E + "b", RDF_TYPE, "iri", E + "Person", None, None),
        ],
    )
    out = {r["node"][-1]: r["status"] for r in validate(tri, parse_shacl(shapes)).collect()}
    assert out == {"a": "nonconformant", "b": "conformant"}


def test_sh_sparql_exists_scoped(spark):
    shapes = f"""
    @prefix sh: <http://www.w3.org/ns/shacl#> .
    @prefix ex: <{E}> .
    ex:S a sh:NodeShape ;
      sh:targetClass ex:Person ;
      sh:sparql [
        sh:select \"\"\"SELECT ?this WHERE {{
          ?this ex:knows ?o .
          FILTER NOT EXISTS {{ ?o ex:name ?n }}
        }}\"\"\" ;
      ] .
    """
    tri = _tri(
        spark,
        [
            (E + "a", RDF_TYPE, "iri", E + "Person", None, None),
            (E + "a", E + "knows", "iri", E + "b", None, None),
            (E + "b", E + "name", "literal", "B", None, None),
            (E + "c", RDF_TYPE, "iri", E + "Person", None, None),
            (E + "c", E + "knows", "iri", E + "ghost", None, None),
        ],
    )
    out = {r["node"][-1]: r["status"] for r in validate(tri, parse_shacl(shapes)).collect()}
    assert out == {"a": "conformant", "c": "nonconformant"}
