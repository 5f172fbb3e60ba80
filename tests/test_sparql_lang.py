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


def test_datetime_accessors(spark):
    tri = spark.createDataFrame(
        [(EX + "a", EX + "when", "literal", "2024-03-05T12:34:56", None, XSD + "dateTime")],
        COLS,
    )
    out = sparql_select(
        tri,
        PREFIX
        + """SELECT ?y ?mo ?d ?h ?mi ?s WHERE {
            ?x ex:when ?w .
            BIND(YEAR(?w) AS ?y) BIND(MONTH(?w) AS ?mo) BIND(DAY(?w) AS ?d)
            BIND(HOURS(?w) AS ?h) BIND(MINUTES(?w) AS ?mi) BIND(SECONDS(?w) AS ?s)
          }""",
    ).collect()[0]
    assert (out["y"], out["mo"], out["d"], out["h"], out["mi"], out["s"]) == (
        2024, 3, 5, 12, 34, 56,
    )


def test_hash_and_encode_builtins(spark):
    tri = spark.createDataFrame(
        [(EX + "a", EX + "v", "literal", "abc def", None, None)], COLS
    )
    out = sparql_select(
        tri,
        PREFIX
        + """SELECT ?m ?s1 ?s256 ?e WHERE {
            ?x ex:v ?v .
            BIND(MD5(?v) AS ?m) BIND(SHA1(?v) AS ?s1) BIND(SHA256(?v) AS ?s256)
            BIND(ENCODE_FOR_URI(?v) AS ?e)
          }""",
    ).collect()[0]
    import hashlib

    assert out["m"] == hashlib.md5(b"abc def").hexdigest()
    assert out["s1"] == hashlib.sha1(b"abc def").hexdigest()
    assert out["s256"] == hashlib.sha256(b"abc def").hexdigest()
    assert out["e"] == "abc%20def"


def test_isnumeric_sameterm_iri(spark):
    tri = spark.createDataFrame(
        [
            (EX + "a", EX + "v", "literal", "42", None, None),
            (EX + "b", EX + "v", "literal", "nope", None, None),
        ],
        COLS,
    )
    out = sparql_select(
        tri,
        PREFIX + "SELECT ?x WHERE { ?x ex:v ?v . FILTER(ISNUMERIC(?v)) }",
    )
    assert {r["x"] for r in out.collect()} == {EX + "a"}
    out2 = sparql_select(
        tri,
        PREFIX + "SELECT ?x WHERE { ?x ex:v ?v . FILTER(SAMETERM(?v, \"42\")) }",
    )
    assert {r["x"] for r in out2.collect()} == {EX + "a"}
    out3 = sparql_select(
        tri,
        PREFIX + "SELECT ?i WHERE { ?x ex:v ?v . BIND(IRI(?x) AS ?i) }",
    )
    assert {r["i"] for r in out3.collect()} == {EX + "a", EX + "b"}


def test_strlang_strdt_constructors(spark):
    tri = spark.createDataFrame(
        [(EX + "a", EX + "v", "literal", "chat", None, None)], COLS
    )
    out = sparql_select(
        tri,
        PREFIX
        + f"""SELECT ?l ?dt WHERE {{
            ?x ex:v ?v .
            BIND(STRLANG(?v, "EN") AS ?tagged)
            BIND(STRDT(?v, <{XSD}token>) AS ?typed)
            BIND(LANG(?tagged) AS ?l)
            BIND(DATATYPE(?typed) AS ?dt)
          }}""",
    ).collect()[0]
    assert out["l"] == "en"
    assert out["dt"] == XSD + "token"
