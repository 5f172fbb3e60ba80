"""Format-matrix completion: N-Quads, TriG, RDF/JSON, RDF/XML subset
(SURVEY §2.1 S1 — the full RdfFormat.scala:18-29 list)."""

from __future__ import annotations

import pytest

from rdfshape_api_spark.sources.parsers import (
    parse_document,
    parse_nquads,
    parse_rdfjson,
    parse_rdfxml,
    parse_turtle,
)

E = "http://e/"
XSD = "http://www.w3.org/2001/XMLSchema#"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def test_nquads_drops_graph_label():
    doc = (
        f'<{E}a> <{E}p> <{E}b> <{E}g1> .\n'
        f'<{E}a> <{E}q> "lit"@en <{E}g2> .\n'
        f'_:b1 <{E}r> "5"^^<{XSD}integer> .\n'  # plain triple line also ok
    )
    out = parse_nquads(doc)
    assert out == [
        (E + "a", E + "p", "iri", E + "b", None, None),
        (E + "a", E + "q", "literal", "lit", "en", None),
        ("_:b1", E + "r", "literal", "5", None, XSD + "integer"),
    ]


def test_nquads_object_iri_not_mistaken_for_graph():
    out = parse_nquads(f"<{E}a> <{E}p> <{E}b> .\n")
    assert out == [(E + "a", E + "p", "iri", E + "b", None, None)]


def test_nquads_rejects_garbage():
    with pytest.raises(ValueError, match="malformed"):
        parse_nquads("not a quad line\n")


def test_trig_graph_blocks():
    doc = f"""@prefix ex: <{E}> .
ex:g1 {{ ex:a ex:p ex:b . ex:a ex:q "v" }}
GRAPH ex:g2 {{ ex:c ex:p ex:d }}
{{ ex:e ex:p ex:f . }}
ex:plain ex:p ex:x .
"""
    out = sorted(parse_turtle(doc))
    assert (E + "a", E + "p", "iri", E + "b", None, None) in out
    assert (E + "a", E + "q", "literal", "v", None, None) in out
    assert (E + "c", E + "p", "iri", E + "d", None, None) in out
    assert (E + "e", E + "p", "iri", E + "f", None, None) in out
    assert (E + "plain", E + "p", "iri", E + "x", None, None) in out
    assert len(out) == 5  # graph labels dropped, no extra triples


def test_rdfjson():
    doc = f"""{{
      "{E}a": {{
        "{E}p": [{{"type": "uri", "value": "{E}b"}},
                  {{"type": "literal", "value": "hi", "lang": "EN"}}],
        "{E}q": [{{"type": "literal", "value": "5", "datatype": "{XSD}integer"}},
                  {{"type": "bnode", "value": "_:x"}}]
      }}
    }}"""
    out = sorted(parse_rdfjson(doc))
    assert out == sorted(
        [
            (E + "a", E + "p", "iri", E + "b", None, None),
            (E + "a", E + "p", "literal", "hi", "en", None),
            (E + "a", E + "q", "literal", "5", None, XSD + "integer"),
            (E + "a", E + "q", "bnode", "_:x", None, None),
        ]
    )


def test_rdfxml_striped_subset():
    doc = f"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:ex="{E}">
  <ex:Reading rdf:about="{E}r1">
    <ex:status>OK</ex:status>
    <ex:temp rdf:datatype="{XSD}decimal">19.5</ex:temp>
    <ex:label xml:lang="EN">Reading one</ex:label>
    <ex:station rdf:resource="{E}hub"/>
    <ex:linked rdf:nodeID="b7"/>
    <ex:nested>
      <rdf:Description rdf:about="{E}r2">
        <ex:status>RUNNING</ex:status>
      </rdf:Description>
    </ex:nested>
  </ex:Reading>
</rdf:RDF>"""
    out = set(parse_rdfxml(doc))
    assert (E + "r1", RDF_TYPE, "iri", E + "Reading", None, None) in out
    assert (E + "r1", E + "status", "literal", "OK", None, None) in out
    assert (E + "r1", E + "temp", "literal", "19.5", None, XSD + "decimal") in out
    assert (E + "r1", E + "label", "literal", "Reading one", "en", None) in out
    assert (E + "r1", E + "station", "iri", E + "hub", None, None) in out
    assert (E + "r1", E + "linked", "bnode", "_:b7", None, None) in out
    assert (E + "r1", E + "nested", "iri", E + "r2", None, None) in out
    assert (E + "r2", E + "status", "literal", "RUNNING", None, None) in out


def test_dispatch_routes_all_formats():
    for lang, doc in [
        ("nquads", f"<{E}a> <{E}p> <{E}b> <{E}g> .\n"),
        ("trig", f"<{E}g> {{ <{E}a> <{E}p> <{E}b> }}"),
        ("rdfjson", f'{{"{E}a": {{"{E}p": [{{"type": "uri", "value": "{E}b"}}]}}}}'),
        (
            "rdfxml",
            f'<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
            f'xmlns:ex="{E}"><rdf:Description rdf:about="{E}a">'
            f'<ex:p rdf:resource="{E}b"/></rdf:Description></rdf:RDF>',
        ),
    ]:
        triples, err = parse_document(doc, lang)
        assert err is None, f"{lang}: {err}"
        assert (E + "a", E + "p", "iri", E + "b", None, None) in triples, lang
