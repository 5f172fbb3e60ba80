"""Differential hardening for the JSON-LD and RDF/XML subsets (goldens by
construction — rdflib is unavailable in this environment).

Reference gets both formats whole from Jena (``RdfFormat.scala:18-29``);
these tests pin the subset's behavior on the constructs the round-2 review
called out: nested/array contexts, @graph-in-@graph, xml:base, rdf:ID.
"""

from __future__ import annotations

import json

from rdfshape_api_spark.sources.parsers import parse_jsonld, parse_rdfxml

EX = "http://example.org/"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def _spo(triples):
    return {(s, p, k, v) for s, p, k, v, _, _ in triples}


# --------------------------------------------------------------------------
# JSON-LD
# --------------------------------------------------------------------------

def test_jsonld_array_of_contexts_merged_left_to_right():
    doc = {
        "@context": [{"ex": EX}, {"name": "ex:name"}],
        "@id": "ex:a",
        "name": "Alice",
    }
    got = _spo(parse_jsonld(json.dumps(doc)))
    assert got == {(EX + "a", EX + "name", "literal", "Alice")}


def test_jsonld_nested_node_context_override():
    # the child node's local @context remaps 'name' to a different IRI;
    # the parent keeps its own mapping
    doc = {
        "@context": {"ex": EX, "name": "ex:name", "child": "ex:child"},
        "@id": "ex:p",
        "name": "outer",
        "child": {
            "@context": {"name": "ex:label"},
            "@id": "ex:c",
            "name": "inner",
        },
    }
    got = _spo(parse_jsonld(json.dumps(doc)))
    assert (EX + "p", EX + "name", "literal", "outer") in got
    assert (EX + "c", EX + "label", "literal", "inner") in got
    assert (EX + "p", EX + "child", "iri", EX + "c") in got


def test_jsonld_graph_in_graph():
    doc = {
        "@context": {"ex": EX, "name": "ex:name"},
        "@graph": [
            {"@id": "ex:a", "name": "A"},
            {
                "@id": "ex:wrap",
                "@graph": [{"@id": "ex:b", "name": "B"}],
                "name": "W",
            },
        ],
    }
    got = _spo(parse_jsonld(json.dumps(doc)))
    assert (EX + "a", EX + "name", "literal", "A") in got
    assert (EX + "b", EX + "name", "literal", "B") in got
    assert (EX + "wrap", EX + "name", "literal", "W") in got


def test_jsonld_term_definition_with_id_object():
    doc = {
        "@context": {"ex": EX, "knows": {"@id": "ex:knows"}},
        "@id": "ex:a",
        "knows": {"@id": "ex:b"},
    }
    got = _spo(parse_jsonld(json.dumps(doc)))
    assert got == {(EX + "a", EX + "knows", "iri", EX + "b")}


def test_jsonld_typed_and_language_values():
    doc = {
        "@context": {"ex": EX},
        "@id": "ex:a",
        "ex:score": {"@value": "9", "@type": "ex:Points"},
        "ex:label": {"@value": "hallo", "@language": "DE"},
    }
    out = parse_jsonld(json.dumps(doc))
    by_pred = {p: (v, lang, dt) for _, p, _, v, lang, dt in out}
    assert by_pred[EX + "score"] == ("9", None, EX + "Points")
    assert by_pred[EX + "label"] == ("hallo", "de", None)  # BCP47 lowercased


# --------------------------------------------------------------------------
# RDF/XML: xml:base + rdf:ID
# --------------------------------------------------------------------------

_RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"


def test_rdfxml_document_base_resolves_relative_about_and_resource():
    xml = f"""<rdf:RDF xmlns:rdf="{_RDF}" xmlns:ex="{EX}"
                 xml:base="http://base.org/dir/doc">
      <rdf:Description rdf:about="item1">
        <ex:rel rdf:resource="item2"/>
        <ex:abs rdf:resource="{EX}x"/>
      </rdf:Description>
    </rdf:RDF>"""
    got = _spo(parse_rdfxml(xml))
    assert ("http://base.org/dir/item1", EX + "rel", "iri", "http://base.org/dir/item2") in got
    assert ("http://base.org/dir/item1", EX + "abs", "iri", EX + "x") in got


def test_rdfxml_rdf_id_names_fragment_of_base():
    xml = f"""<rdf:RDF xmlns:rdf="{_RDF}" xmlns:ex="{EX}"
                 xml:base="http://base.org/doc">
      <rdf:Description rdf:ID="frag">
        <ex:p>v</ex:p>
      </rdf:Description>
    </rdf:RDF>"""
    got = _spo(parse_rdfxml(xml))
    assert got == {("http://base.org/doc#frag", EX + "p", "literal", "v")}


def test_rdfxml_element_scoped_base_overrides_document_base():
    xml = f"""<rdf:RDF xmlns:rdf="{_RDF}" xmlns:ex="{EX}"
                 xml:base="http://outer.org/doc">
      <rdf:Description rdf:about="a" xml:base="http://inner.org/doc">
        <ex:p rdf:resource="b"/>
      </rdf:Description>
    </rdf:RDF>"""
    got = _spo(parse_rdfxml(xml))
    assert ("http://inner.org/a", EX + "p", "iri", "http://inner.org/b") in got


def test_rdfxml_no_base_keeps_relative_verbatim():
    xml = f"""<rdf:RDF xmlns:rdf="{_RDF}" xmlns:ex="{EX}">
      <rdf:Description rdf:about="{EX}a">
        <ex:p rdf:resource="{EX}b"/>
      </rdf:Description>
    </rdf:RDF>"""
    got = _spo(parse_rdfxml(xml))
    assert got == {(EX + "a", EX + "p", "iri", EX + "b")}


def test_rdfxml_nested_node_inherits_base():
    xml = f"""<rdf:RDF xmlns:rdf="{_RDF}" xmlns:ex="{EX}"
                 xml:base="http://b.org/d">
      <rdf:Description rdf:about="outer">
        <ex:has>
          <ex:Thing rdf:about="inner"/>
        </ex:has>
      </rdf:Description>
    </rdf:RDF>"""
    got = _spo(parse_rdfxml(xml))
    assert ("http://b.org/outer", EX + "has", "iri", "http://b.org/inner") in got
    assert ("http://b.org/inner", RDF_TYPE, "iri", EX + "Thing") in got
