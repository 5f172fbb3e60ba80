"""Shape/class references at arbitrary depth of the value-expression tree.

Round-4 lift: the evaluator assigns a conformance column per ref-carrying
node of the value tree (validate._walk_value_nodes), so refs work under
nested ORs, sh:xone members, sh:not members, and inside mixed-polarity
ShEx conjunctions.  Reference parity: shexs / shaclex accept arbitrary
nesting behind SchemaValidate.scala:97-99 and SchemaService.scala:80-84.
"""

from __future__ import annotations

import pytest

from rdfshape_api_spark.plans import parse_shacl, parse_shexc, validate
from rdfshape_api_spark.plans.validate import validate_batch

E = "http://e/"
XSD = "http://www.w3.org/2001/XMLSchema#"

PRELUDE = f"""\
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <{E}> .
@prefix xsd: <{XSD}> .
"""


def _tri(spark, rows):
    cols = (
        "doc_sha256 string, subj string, pred string, obj_kind string, "
        "obj_value string, obj_lang string, obj_datatype string"
    )
    return spark.createDataFrame([("d", *r) for r in rows], cols)


def test_shex_ref_in_mixed_polarity_conjunction(spark):
    """`IRI AND NOT (@ex:Bad OR ["x"])`: the value must be an IRI that is
    neither conformant to ex:Bad nor the literal "x"."""
    schema = parse_shexc(
        f"PREFIX ex: <{E}>\nPREFIX xsd: <{XSD}>\n"
        "ex:Bad { ex:flag . }\n"
        'ex:S { ex:v IRI AND NOT (@ex:Bad OR [ "x" ]) }'
    )
    rows = [
        # bad_node conforms to ex:Bad (has ex:flag)
        (E + "bad", E + "flag", "literal", "1", None, None),
        # a → points at a clean IRI: conformant
        (E + "a", E + "v", "iri", E + "clean", None, None),
        # b → points at the Bad-conformant node: nonconformant
        (E + "b", E + "v", "iri", E + "bad", None, None),
        # c → literal "x": nonconformant (and not an IRI anyway)
        (E + "c", E + "v", "literal", "x", None, None),
    ]
    tri = _tri(spark, rows)
    smap = ", ".join(f"<{E}{n}>@<{E}S>" for n in ("a", "b", "c"))
    out = {r["node"][-1]: r["status"] for r in validate(tri, schema, shapemap=smap).collect()}
    assert out == {"a": "conformant", "b": "nonconformant", "c": "nonconformant"}


def test_shacl_node_under_nested_xone(spark):
    """sh:node inside an sh:xone member that is itself nested in an sh:or
    member — two non-associative levels deep."""
    schema = parse_shacl(
        PRELUDE
        + """ex:Inner a sh:NodeShape ;
  sh:property [ sh:path ex:name ; sh:minCount 1 ] .
ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:v ;
  sh:property [ sh:path ex:v ; sh:minCount 1 ;
    sh:or (
      [ sh:xone ( [ sh:node ex:Inner ] [ sh:datatype xsd:integer ] ) ]
      [ sh:in ( "WILD" ) ]
    ) ] ."""
    )
    rows = [
        (E + "named", E + "name", "literal", "N", None, None),
        # a → named node (Inner-conformant, not an integer): xone=1 → ok
        (E + "a", E + "v", "iri", E + "named", None, None),
        # b → integer literal: xone=1 → ok
        (E + "b", E + "v", "literal", "7", None, XSD + "integer"),
        # c → WILD literal: second or-member → ok
        (E + "c", E + "v", "literal", "WILD", None, None),
        # e → unnamed IRI, not integer, not WILD: nonconformant
        (E + "e", E + "v", "iri", E + "unnamed", None, None),
    ]
    tri = _tri(spark, rows)
    out = {r["node"][-1]: r["status"] for r in validate(tri, schema).collect()}
    assert out == {
        "a": "conformant",
        "b": "conformant",
        "c": "conformant",
        "e": "nonconformant",
    }


def test_shacl_node_under_nested_not(spark):
    """sh:not [ sh:node ex:Inner ] as an sh:or member: the value must NOT
    conform to Inner (or match the other member)."""
    schema = parse_shacl(
        PRELUDE
        + """ex:Inner a sh:NodeShape ;
  sh:property [ sh:path ex:name ; sh:minCount 1 ] .
ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:v ;
  sh:property [ sh:path ex:v ; sh:minCount 1 ;
    sh:or ( [ sh:not [ sh:node ex:Inner ] ] [ sh:in ( "OK" ) ] ) ] ."""
    )
    rows = [
        (E + "named", E + "name", "literal", "N", None, None),
        # a → named (Inner-conformant) and not "OK": nonconformant
        (E + "a", E + "v", "iri", E + "named", None, None),
        # b → unnamed IRI: NOT Inner → conformant
        (E + "b", E + "v", "iri", E + "unnamed", None, None),
        # c → "OK" literal (a literal never conforms to a node shape whose
        # constraints require outgoing arcs → NOT Inner also holds)
        (E + "c", E + "v", "literal", "OK", None, None),
    ]
    tri = _tri(spark, rows)
    out = {r["node"][-1]: r["status"] for r in validate(tri, schema).collect()}
    assert out == {"a": "nonconformant", "b": "conformant", "c": "conformant"}


def test_deep_negated_ref_in_cycle_still_rejects(spark):
    """Stratification: a ref under NOT inside a reference cycle is still a
    clean reject — parity-aware at any depth now."""
    schema = parse_shexc(
        f"PREFIX ex: <{E}>\nPREFIX xsd: <{XSD}>\n"
        'ex:A { ex:p NOT (@ex:B OR [ "x" ]) }\n'
        "ex:B { ex:q @ex:A }"
    )
    tri = _tri(spark, [(E + "n", E + "p", "literal", "y", None, None)])
    with pytest.raises(ValueError, match="stratifiable"):
        validate(tri, schema, shapemap=f"<{E}n>@<{E}A>").collect()


def test_validate_batch_routes_deep_refs_to_full_path(spark):
    """The batched m/t aggregation cannot attach conformance joins: a
    schema with a ref nested in a conjunct must take the full validate()
    path and agree with it (the round-3 ADVICE failure mode, generalized)."""
    schema = parse_shexc(
        f"PREFIX ex: <{E}>\nPREFIX xsd: <{XSD}>\n"
        "ex:Bad { ex:flag . }\n"
        'ex:S { ex:v IRI AND NOT (@ex:Bad OR [ "x" ]) }'
    )
    rows = [
        (E + "bad", E + "flag", "literal", "1", None, None),
        (E + "a", E + "v", "iri", E + "clean", None, None),
        (E + "b", E + "v", "iri", E + "bad", None, None),
    ]
    tri = _tri(spark, rows)
    smap = f"<{E}a>@<{E}S>, <{E}b>@<{E}S>"
    full = {
        (r["node"], r["status"])
        for r in validate(tri, schema, shapemap=smap).collect()
    }
    batched = {
        (r["node"], r["status"])
        for r in validate_batch(tri, [(schema, smap, "lbl")]).collect()
    }
    assert full == batched
    assert (E + "b", "nonconformant") in full
