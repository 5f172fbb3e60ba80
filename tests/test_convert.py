"""Schema conversion / info tests (SURVEY §2.2 K3, §2.4 A4, §2.3 P5)."""

from __future__ import annotations

import pytest

from rdfshape_api_spark.fixtures.generator import (
    SHACL_SENSOR,
    SHAPEMAP_QUERY,
    SHEX_SENSOR,
)
from rdfshape_api_spark.plans import parse_shacl, parse_shexc, validate
from rdfshape_api_spark.plans.convert import (
    schema_info,
    shacl_to_shex,
    shapemap_info,
    shex_to_shacl,
    to_shacl_turtle,
    to_shexc,
)

EX = "http://example.org/"


def test_shacl_to_shex_roundtrip_validates_identically(spark, triples_001):
    """SHACL → IR → ShExC text → reparse → validate must agree with the
    original SHACL verdicts (the conversion-correctness contract)."""
    shacl = parse_shacl(SHACL_SENSOR)
    shex = shacl_to_shex(shacl)
    text = to_shexc(shex)
    reparsed = parse_shexc(text)

    orig = validate(triples_001, shacl, shape_label="s").select("doc_sha256", "node", "status")
    conv = validate(
        triples_001, reparsed, shapemap="{FOCUS a <" + EX + "Reading>}@<" + EX + "ValidReadingShape>",
        shape_label="s",
    ).select("doc_sha256", "node", "status")
    assert orig.exceptAll(conv).isEmpty() and conv.exceptAll(orig).isEmpty()


def test_shex_to_shacl_roundtrip_validates_identically(spark, triples_001):
    """ShEx → IR → SHACL Turtle → reparse → validate (same shapemap
    trigger) must agree with the original ShEx verdicts.  An engine
    EXTENSION: the reference refuses this direction
    (SchemaConvert.scala:183-186)."""
    shex = parse_shexc(SHEX_SENSOR)
    ttl = to_shacl_turtle(shex_to_shacl(shex))
    reparsed = parse_shacl(ttl)
    assert reparsed.engine == "shacl"
    smap = "{FOCUS a <" + EX + "Reading>}@<" + EX + "ValidReading>"
    orig = validate(triples_001, shex, shapemap=smap, shape_label="s").select(
        "doc_sha256", "node", "status"
    )
    conv = validate(triples_001, reparsed, shapemap=smap, shape_label="s").select(
        "doc_sha256", "node", "status"
    )
    assert orig.exceptAll(conv).isEmpty() and conv.exceptAll(orig).isEmpty()


def test_shex_to_shacl_extra_becomes_qualified(spark):
    """EXTRA p → sh:qualifiedValueShape + qualifiedMin/MaxCount: both
    compile to the count-only verdict, so extras never violate."""
    shex = parse_shexc(
        f"PREFIX ex: <{EX}>\nPREFIX xsd: <http://www.w3.org/2001/XMLSchema#>\n"
        "ex:S EXTRA ex:v { ex:v xsd:integer + }"
    )
    ttl = to_shacl_turtle(shex_to_shacl(shex))
    assert "sh:qualifiedValueShape" in ttl and "sh:qualifiedMinCount 1" in ttl
    reparsed = parse_shacl(ttl)
    rows = [
        ("d", EX + "a", EX + "v", "literal", "5", None,
         "http://www.w3.org/2001/XMLSchema#integer"),
        ("d", EX + "a", EX + "v", "literal", "oops", None, None),  # extra, allowed
        ("d", EX + "b", EX + "v", "literal", "oops", None, None),  # no match → fail
    ]
    cols = (
        "doc_sha256 string, subj string, pred string, obj_kind string, "
        "obj_value string, obj_lang string, obj_datatype string"
    )
    tri = spark.createDataFrame(rows, cols)
    smap = f"<{EX}a>@<{EX}S>, <{EX}b>@<{EX}S>"
    for schema in (parse_shexc(
        f"PREFIX ex: <{EX}>\nPREFIX xsd: <http://www.w3.org/2001/XMLSchema#>\n"
        "ex:S EXTRA ex:v { ex:v xsd:integer + }"
    ), reparsed):
        out = {r["node"][-1]: r["status"] for r in validate(tri, schema, shapemap=smap).collect()}
        assert out == {"a": "conformant", "b": "nonconformant"}, (schema.engine, out)


def test_shex_to_shacl_renders_value_tree(spark):
    """OR / NOT value trees render to sh:or / sh:not and read back with
    identical verdicts."""
    src = (
        f"PREFIX ex: <{EX}>\nPREFIX xsd: <http://www.w3.org/2001/XMLSchema#>\n"
        'ex:S { ex:v (xsd:integer OR NOT ([ "BAD" ] OR IRI)) }'
    )
    shex = parse_shexc(src)
    ttl = to_shacl_turtle(shex_to_shacl(shex))
    reparsed = parse_shacl(ttl)
    rows = [
        ("d", EX + "a", EX + "v", "literal", "5", None,
         "http://www.w3.org/2001/XMLSchema#integer"),
        ("d", EX + "b", EX + "v", "literal", "BAD", None, None),
        ("d", EX + "c", EX + "v", "iri", EX + "x", None, None),
        ("d", EX + "e", EX + "v", "literal", "fine", None, None),
    ]
    cols = (
        "doc_sha256 string, subj string, pred string, obj_kind string, "
        "obj_value string, obj_lang string, obj_datatype string"
    )
    tri = spark.createDataFrame(rows, cols)
    smap = ", ".join(f"<{EX}{n}>@<{EX}S>" for n in ("a", "b", "c", "e"))
    want = {"a": "conformant", "b": "nonconformant", "c": "nonconformant", "e": "conformant"}
    for schema in (shex, reparsed):
        out = {r["node"][-1]: r["status"] for r in validate(tri, schema, shapemap=smap).collect()}
        assert out == want, (schema.engine, out)


def test_shex_to_shacl_rejects_out_of_subset():
    with pytest.raises(ValueError, match="OneOf"):
        shex_to_shacl(parse_shexc(
            f"PREFIX ex: <{EX}>\n"
            "ex:S { ex:a . | ex:b . }"
        ))
    with pytest.raises(ValueError, match="stem|exclusion|wildcard"):
        shex_to_shacl(parse_shexc(
            f"PREFIX ex: <{EX}>\n"
            "ex:S { ex:v [ ex:~ ] }"
        ))
    with pytest.raises(ValueError, match="repeated"):
        shex_to_shacl(parse_shexc(
            f"PREFIX ex: <{EX}>\nPREFIX xsd: <http://www.w3.org/2001/XMLSchema#>\n"
            'ex:S { ex:v xsd:integer ; ex:v [ "x" ] }'
        ))


def test_shacl_turtle_roundtrip(spark, triples_001):
    """IR → SHACL Turtle → reparse → validate agrees (same-engine format
    conversion, SchemaConvert.scala:69-105)."""
    shacl = parse_shacl(SHACL_SENSOR)
    text = to_shacl_turtle(shacl)
    reparsed = parse_shacl(text)
    orig = validate(triples_001, shacl, shape_label="s").select("doc_sha256", "node", "status")
    rt = validate(triples_001, reparsed, shape_label="s").select("doc_sha256", "node", "status")
    assert orig.exceptAll(rt).isEmpty() and rt.exceptAll(orig).isEmpty()


def test_shexc_render_mentions_facets():
    text = to_shexc(parse_shexc(SHEX_SENSOR))
    assert "MININCLUSIVE 18" in text and "MAXINCLUSIVE 20" in text
    assert '[ "OK" "RUNNING" ]' in text
    reparsed = parse_shexc(text)
    assert set(reparsed.shapes) == set(parse_shexc(SHEX_SENSOR).shapes)


def test_schema_info():
    info = schema_info(parse_shexc(SHEX_SENSOR))
    assert info["engine"] == "shex"
    assert info["n_shapes"] == 1
    assert info["shapes"] == [EX + "ValidReading"]
    assert info["prefix_map"]["ex"] == EX


def test_shapemap_info():
    info = shapemap_info(SHAPEMAP_QUERY, {"ex": EX})
    assert info["n_associations"] == 1
    a = info["associations"][0]
    assert a["selector_kind"] == "query"
    assert a["query_obj"] == EX + "Reading"
    assert a["shape"] == EX + "ValidReading"


def test_check_datatype(spark, triples_001):
    from pyspark.sql import functions as F

    from rdfshape_api_spark.operators.algebra import check_datatype

    node = (
        triples_001.filter(F.col("pred") == EX + "readingTemperature")
        .select("subj").first()["subj"]
    )
    out = check_datatype(triples_001, node, "http://www.w3.org/2001/XMLSchema#decimal")
    rows = out.collect()
    assert any(r["datatype_ok"] for r in rows if r["pred"] == EX + "readingTemperature")
    # non-decimal predicates on the same node must fail the check
    assert all(
        not r["datatype_ok"] for r in rows if r["pred"] == EX + "status"
    )


def test_to_shexc_renders_shape_level_refs_and_nc():
    from rdfshape_api_spark.plans import parse_shexc
    from rdfshape_api_spark.plans.convert import to_shexc

    E = "http://e/"
    schema = parse_shexc(
        f"PREFIX ex: <{E}>\n"
        "ex:Child @ex:Base AND { ex:age . }\n"
        "ex:Base { ex:name . }\n"
        "ex:T @ex:Base OR @ex:Child\n"
        "ex:N IRI"
    )
    text = to_shexc(schema)
    re2 = parse_shexc(text)
    assert re2.shapes[E + "Child"].conjunct_refs == [E + "Base"]
    assert re2.shapes[E + "T"].disjunct_refs == [E + "Base", E + "Child"]
    assert re2.shapes[E + "N"].node_constraint.node_kind == "iri"


def test_schema_to_uml_and_dot():
    """Schema→UML (Schema2UML parity, SchemaConvert.scala:246): classes,
    attribute entries, ref links; DOT render is a well-formed digraph."""
    from rdfshape_api_spark.plans.convert import schema_to_uml, uml_to_dot

    shex = """
    PREFIX ex: <http://example.org/>
    ex:Person {
      ex:name . ;
      ex:age ex:Num ? ;
      ex:knows @ex:Person *
    }
    ex:Num xsd:integer
    """
    uml = schema_to_uml(parse_shexc("PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>\n" + shex))
    assert uml["engine"] == "shex"
    by_label = {c["label"]: c for c in uml["classes"]}
    person = by_label["ex:Person"]
    names = {e["name"] for e in person["entries"]}
    assert "ex:name" in names
    knows = [l for l in person["links"] if l["name"] == "ex:knows"]
    assert len(knows) == 1 and knows[0]["card"] == "*"
    assert knows[0]["target"].endswith("Person")
    dot = uml_to_dot(uml)
    assert dot.startswith("digraph uml {") and dot.endswith("}")
    assert "shape=record" in dot and '-> C' in dot.replace("  ", " ")
    # every class id referenced by an edge exists
    assert dot.count("[label=") >= len(uml["classes"])


def test_schema_to_uml_sensor_fixture():
    from rdfshape_api_spark.plans.convert import schema_to_uml, uml_to_dot

    uml = schema_to_uml(parse_shexc(SHEX_SENSOR))
    cls = uml["classes"][0]
    assert cls["entries"], "sensor shape has attribute entries"
    assert any("MININCLUSIVE" in e["type"] for e in cls["entries"])
    assert "|" in uml_to_dot(uml)  # record rows rendered


def test_to_shexc_pattern_roundtrips():
    """Patterns render as the spec /re/ form (slash-escaped) and reparse."""
    from rdfshape_api_spark.plans.convert import to_shexc

    s = parse_shexc('PREFIX ex: <http://e/>\nex:S { ex:p PATTERN "^x/y$" }')
    assert parse_shexc(to_shexc(s)) == s
    # the /re/ input form is the same constraint
    assert parse_shexc('PREFIX ex: <http://e/>\nex:S { ex:p /^x\\/y$/ }') == s


def test_to_shexc_keeps_ref_conjoined_with_datatype():
    from rdfshape_api_spark.plans.convert import to_shexc

    src = (
        "PREFIX ex: <http://e/>\n"
        "PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>\n"
        "ex:S { ex:p xsd:string AND @ex:A }\n"
        "ex:A { ex:q . }"
    )
    s = parse_shexc(src)
    tc = parse_shexc(to_shexc(s)).shapes["http://e/S"].constraints[0]
    assert tc.ref_shape == "http://e/A" and tc.datatype.endswith("string")
