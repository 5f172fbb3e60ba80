"""SHACL shapes graphs in non-Turtle RDF syntaxes (reference parity:
``ShaclFormat.availableFormats = List(Turtle, NTriples, NQuads, TriG,
JsonLd, RdfXml)``, ``ShaclFormat.scala:20-28``)."""

from __future__ import annotations

import pytest

from rdfshape_api_spark.plans.shacl import parse_shacl

SH = "http://www.w3.org/ns/shacl#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XSD = "http://www.w3.org/2001/XMLSchema#"
E = "http://e/"

TTL = f"""
@prefix sh: <{SH}> .
@prefix ex: <{E}> .
@prefix xsd: <{XSD}> .
ex:PersonShape a sh:NodeShape ;
  sh:targetClass ex:Person ;
  sh:property [ sh:path ex:name ; sh:datatype xsd:string ; sh:minCount 1 ] .
"""

NT = f"""
<{E}PersonShape> <{RDF}type> <{SH}NodeShape> .
<{E}PersonShape> <{SH}targetClass> <{E}Person> .
<{E}PersonShape> <{SH}property> _:b0 .
_:b0 <{SH}path> <{E}name> .
_:b0 <{SH}datatype> <{XSD}string> .
_:b0 <{SH}minCount> "1"^^<{XSD}integer> .
"""

RDFXML = f"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="{RDF}" xmlns:sh="{SH}">
  <sh:NodeShape rdf:about="{E}PersonShape">
    <sh:targetClass rdf:resource="{E}Person"/>
    <sh:property rdf:parseType="Resource">
      <sh:path rdf:resource="{E}name"/>
      <sh:datatype rdf:resource="{XSD}string"/>
      <sh:minCount rdf:datatype="{XSD}integer">1</sh:minCount>
    </sh:property>
  </sh:NodeShape>
</rdf:RDF>
"""

JSONLD = f"""{{
  "@context": {{"sh": "{SH}"}},
  "@id": "{E}PersonShape",
  "@type": "sh:NodeShape",
  "sh:targetClass": {{"@id": "{E}Person"}},
  "sh:property": {{
    "sh:path": {{"@id": "{E}name"}},
    "sh:datatype": {{"@id": "{XSD}string"}},
    "sh:minCount": 1
  }}
}}
"""


def _constraints(schema):
    shape = schema.shapes[E + "PersonShape"]
    return (
        shape.target_class,
        [(c.pred, c.datatype, c.min_count, c.max_count) for c in shape.constraints],
    )


@pytest.mark.parametrize(
    "text,fmt",
    [(NT, "ntriples"), (NT, "nquads"), (RDFXML, "rdf-xml"), (JSONLD, "json-ld"),
     (TTL, "trig")],
)
def test_same_schema_from_every_syntax(text, fmt):
    ref = parse_shacl(TTL)  # default: turtle
    got = parse_shacl(text, fmt=fmt)
    assert _constraints(got) == _constraints(ref)
    assert got.engine == "shacl"


def test_turtle_keeps_doc_prefixes_for_sparql_headers():
    assert parse_shacl(TTL).prefixes["ex"] == E
    assert parse_shacl(NT, fmt="ntriples").prefixes == {}


@pytest.mark.parametrize("fmt", ["html-rdfa11", "bogus", ""])
def test_unsupported_format_rejects(fmt):
    if fmt == "":
        parse_shacl(TTL, fmt=fmt)  # empty falls back to turtle
        return
    with pytest.raises(ValueError, match="unsupported shapes-graph format"):
        parse_shacl(TTL, fmt=fmt)
