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


SHAPES_PATH = f"""
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <{E}> .
ex:ReachShape a sh:NodeShape ;
  sh:targetClass ex:Person ;
  sh:sparql [
    sh:message "reaches a banned node via knows+" ;
    sh:select \"\"\"SELECT ?this WHERE {{
      ?this ex:knows+ ?x .
      ?x a ex:Banned .
    }}\"\"\" ;
  ] .
"""


def test_sh_sparql_property_path_doc_scoped(spark):
    """knows+ fixpoint runs per document: the d1 chain reaches a banned
    node, the d2 copy of the same start node does NOT (its doc has no
    banned member) — cross-doc leakage would flag it too."""
    rows_d1 = [
        (E + "a", RDF_TYPE, "iri", E + "Person", None, None),
        (E + "a", E + "knows", "iri", E + "b", None, None),
        (E + "b", E + "knows", "iri", E + "c", None, None),
        (E + "c", RDF_TYPE, "iri", E + "Banned", None, None),
    ]
    rows_d2 = [
        (E + "a", RDF_TYPE, "iri", E + "Person", None, None),
        (E + "a", E + "knows", "iri", E + "b", None, None),
    ]
    tri = _tri(spark, rows_d1, doc="d1").unionByName(_tri(spark, rows_d2, doc="d2"))
    schema = parse_shacl(SHAPES_PATH)
    out = {
        (r["doc_sha256"], r["node"].rsplit("/", 1)[-1]): r["status"]
        for r in validate(tri, schema).collect()
    }
    assert out[("d1", "a")] == "nonconformant"
    assert out[("d2", "a")] == "conformant"


SHAPES_SUBQ = f"""
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <{E}> .
ex:CrowdShape a sh:NodeShape ;
  sh:targetClass ex:Person ;
  sh:sparql [
    sh:message "document lists 3 or more persons" ;
    sh:select \"\"\"SELECT ?this WHERE {{
      ?this a ex:Person .
      {{ SELECT (COUNT(?p) AS ?n) WHERE {{ ?p a ex:Person . }} }}
      FILTER (?n >= 3)
    }}\"\"\" ;
  ] .
"""


def test_sh_sparql_subquery_doc_scoped(spark):
    """The inner COUNT aggregates per document (implicit _g_doc grouping):
    d1 has 2 persons (conformant), d2 has 3 (all violators).  A global
    count (5) would flag every node in both docs."""
    rows_d1 = [
        (E + "a", RDF_TYPE, "iri", E + "Person", None, None),
        (E + "b", RDF_TYPE, "iri", E + "Person", None, None),
    ]
    rows_d2 = [
        (E + "a", RDF_TYPE, "iri", E + "Person", None, None),
        (E + "b", RDF_TYPE, "iri", E + "Person", None, None),
        (E + "c", RDF_TYPE, "iri", E + "Person", None, None),
    ]
    tri = _tri(spark, rows_d1, doc="d1").unionByName(_tri(spark, rows_d2, doc="d2"))
    schema = parse_shacl(SHAPES_SUBQ)
    out = {
        (r["doc_sha256"], r["node"].rsplit("/", 1)[-1]): r["status"]
        for r in validate(tri, schema).collect()
    }
    assert out[("d1", "a")] == out[("d1", "b")] == "conformant"
    assert out[("d2", "a")] == out[("d2", "b")] == out[("d2", "c")] == "nonconformant"
