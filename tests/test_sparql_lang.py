"""SPARQL LANG() / DATATYPE() / LANGMATCHES() over term-metadata sidecars.

Reference surface: ARQ §17.4.2 accessors behind `DataQuery.scala:51-63` —
our subset binds values as strings and threads kind/lang/datatype through
``__kind_/__lang_/__dt_`` sidecar columns, materialized only for queries
that mention a metadata builtin.
"""

from __future__ import annotations

from rdfshape_api_spark.plans.sparql import sparql_select

EX = "http://example.org/"
XSD = "http://www.w3.org/2001/XMLSchema#"
PREFIX = f"PREFIX ex: <{EX}>\nPREFIX xsd: <{XSD}>\n"

COLS = "subj string, pred string, obj_kind string, obj_value string, obj_lang string, obj_datatype string"


def _tri(spark):
    return spark.createDataFrame(
        [
            (EX + "a", EX + "label", "literal", "hello", "en", None),
            (EX + "b", EX + "label", "literal", "bonjour", "fr", None),
            (EX + "c", EX + "label", "literal", "hi there", "en-US", None),
            (EX + "d", EX + "label", "literal", "plain", None, None),
            (EX + "e", EX + "label", "literal", "42", None, XSD + "integer"),
            (EX + "f", EX + "label", "iri", EX + "thing", None, None),
        ],
        COLS,
    )


def test_lang_filter(spark):
    out = sparql_select(
        _tri(spark),
        PREFIX + 'SELECT ?s WHERE { ?s ex:label ?v . FILTER(LANG(?v) = "en") }',
    )
    assert {r["s"] for r in out.collect()} == {EX + "a"}


def test_lang_empty_for_plain_literal(spark):
    out = sparql_select(
        _tri(spark),
        PREFIX + 'SELECT ?s WHERE { ?s ex:label ?v . FILTER(LANG(?v) = "") }',
    )
    # plain and typed literals have LANG "" — the IRI object is an error
    # (null) and never passes the filter
    assert {r["s"] for r in out.collect()} == {EX + "d", EX + "e"}


def test_langmatches_range(spark):
    out = sparql_select(
        _tri(spark),
        PREFIX + 'SELECT ?s WHERE { ?s ex:label ?v . FILTER(LANGMATCHES(LANG(?v), "en")) }',
    )
    # RFC 4647 basic filtering: "en" matches en and en-US
    assert {r["s"] for r in out.collect()} == {EX + "a", EX + "c"}


def test_langmatches_wildcard(spark):
    out = sparql_select(
        _tri(spark),
        PREFIX + 'SELECT ?s WHERE { ?s ex:label ?v . FILTER(LANGMATCHES(LANG(?v), "*")) }',
    )
    assert {r["s"] for r in out.collect()} == {EX + "a", EX + "b", EX + "c"}


def test_datatype(spark):
    out = sparql_select(
        _tri(spark),
        PREFIX + "SELECT ?s ?dt WHERE { ?s ex:label ?v . BIND(DATATYPE(?v) AS ?dt) }",
    )
    got = {r["s"]: r["dt"] for r in out.collect()}
    assert got[EX + "a"] == "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"
    assert got[EX + "d"] == XSD + "string"
    assert got[EX + "e"] == XSD + "integer"
    assert got[EX + "f"] is None  # DATATYPE of an IRI is an error → unbound


def test_datatype_filter(spark):
    out = sparql_select(
        _tri(spark),
        PREFIX
        + f"SELECT ?s WHERE {{ ?s ex:label ?v . FILTER(DATATYPE(?v) = <{XSD}integer>) }}",
    )
    assert {r["s"] for r in out.collect()} == {EX + "e"}


def test_lang_bind_projection(spark):
    out = sparql_select(
        _tri(spark),
        PREFIX + "SELECT ?s ?l WHERE { ?s ex:label ?v . BIND(LANG(?v) AS ?l) }",
    )
    got = {r["s"]: r["l"] for r in out.collect()}
    assert got[EX + "b"] == "fr"
    assert got[EX + "d"] == ""
    assert got[EX + "f"] is None
    # sidecar columns never leak into the projection
    assert set(out.columns) == {"s", "l"}


def test_meta_does_not_change_plain_queries(spark):
    # a query without metadata builtins must not carry sidecar columns
    out = sparql_select(
        _tri(spark), PREFIX + "SELECT ?s ?v WHERE { ?s ex:label ?v }"
    )
    assert set(out.columns) == {"s", "v"}
    assert out.count() == 6


def test_lang_in_optional_and_union(spark):
    out = sparql_select(
        _tri(spark),
        PREFIX
        + """SELECT ?s WHERE {
              { ?s ex:label ?v . FILTER(LANG(?v) = "fr") }
              UNION
              { ?s ex:label ?v . FILTER(LANGMATCHES(LANG(?v), "en")) }
            }""",
    )
    assert {r["s"] for r in out.collect()} == {EX + "a", EX + "b", EX + "c"}
