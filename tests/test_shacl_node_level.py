"""SHACL node-shape-LEVEL constraint components (r4s10).

Before this round a node shape carrying sh:or/xone/and/not, sh:node,
sh:class, or any direct value component (sh:nodeKind, sh:in, sh:hasValue,
sh:pattern, …) at the NODE level compiled to zero constraints — the
trivially-conformant silent failure mode.  These compile onto the shared
shape-level IR (node_constraint gate / conjunct_refs / disjunct_refs /
negated_refs / conjunct_classes), the same algebra ShEx shape-level
expressions use.  Reference parity: shaclex evaluates all of these whole
behind ``SchemaService.scala:80-84``.
"""

from __future__ import annotations

import pytest

from rdfshape_api_spark.plans import parse_shacl, validate
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


def _verdicts(tri, schema):
    return {r["node"][-1]: r["status"] for r in validate(tri, schema).collect()}


def test_node_level_or_of_property_shapes(spark):
    """The spec's canonical node-level sh:or: at least one of two
    property shapes must hold."""
    schema = parse_shacl(
        PRELUDE
        + """ex:S a sh:NodeShape ; sh:targetClass ex:T ;
  sh:or ( [ sh:path ex:p ; sh:minCount 1 ] [ sh:path ex:q ; sh:minCount 1 ] ) ."""
    )
    rdf_type = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    tri = _tri(
        spark,
        [
            (E + "a", rdf_type, "iri", E + "T", None, None),
            (E + "a", E + "p", "literal", "x", None, None),
            (E + "b", rdf_type, "iri", E + "T", None, None),
            (E + "b", E + "q", "literal", "x", None, None),
            (E + "c", rdf_type, "iri", E + "T", None, None),
            (E + "c", E + "r", "literal", "x", None, None),
        ],
    )
    assert _verdicts(tri, schema) == {
        "a": "conformant",
        "b": "conformant",
        "c": "nonconformant",
    }


def test_node_level_xone_of_property_shapes(spark):
    """sh:xone: EXACTLY one member must hold — a node with both p and q
    fails."""
    schema = parse_shacl(
        PRELUDE
        + """ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:t ;
  sh:xone ( [ sh:path ex:p ; sh:minCount 1 ] [ sh:path ex:q ; sh:minCount 1 ] ) ."""
    )
    tri = _tri(
        spark,
        [
            (E + "a", E + "t", "literal", "x", None, None),
            (E + "a", E + "p", "literal", "x", None, None),
            (E + "b", E + "t", "literal", "x", None, None),
            (E + "b", E + "p", "literal", "x", None, None),
            (E + "b", E + "q", "literal", "x", None, None),
            (E + "c", E + "t", "literal", "x", None, None),
        ],
    )
    assert _verdicts(tri, schema) == {
        "a": "conformant",
        "b": "nonconformant",
        "c": "nonconformant",
    }


def test_node_level_not_class(spark):
    """sh:not [ sh:class C ]: instances of C (through the subclass
    closure) are nonconformant."""
    rdf_type = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    sub = "http://www.w3.org/2000/01/rdf-schema#subClassOf"
    schema = parse_shacl(
        PRELUDE
        + """ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:t ;
  sh:not [ sh:class ex:C ] ."""
    )
    tri = _tri(
        spark,
        [
            (E + "a", E + "t", "literal", "x", None, None),
            (E + "a", rdf_type, "iri", E + "C", None, None),
            (E + "b", E + "t", "literal", "x", None, None),
            (E + "b", rdf_type, "iri", E + "Sub", None, None),
            (E + "Sub", sub, "iri", E + "C", None, None),
            (E + "c", E + "t", "literal", "x", None, None),
            (E + "c", rdf_type, "iri", E + "Other", None, None),
        ],
    )
    assert _verdicts(tri, schema) == {
        "a": "nonconformant",
        "b": "nonconformant",
        "c": "conformant",
    }


def test_node_level_class_conjunct(spark):
    """Direct sh:class on the node shape: the focus itself must be a
    SHACL instance of the class."""
    rdf_type = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    schema = parse_shacl(
        PRELUDE
        + """ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:t ; sh:class ex:C ."""
    )
    tri = _tri(
        spark,
        [
            (E + "a", E + "t", "literal", "x", None, None),
            (E + "a", rdf_type, "iri", E + "C", None, None),
            (E + "b", E + "t", "literal", "x", None, None),
        ],
    )
    assert _verdicts(tri, schema) == {"a": "conformant", "b": "nonconformant"}


def test_node_level_value_components_gate_focus(spark):
    """Direct sh:nodeKind + sh:pattern on the node shape gate the focus
    node's own term."""
    schema = parse_shacl(
        PRELUDE
        + """ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:t ;
  sh:nodeKind sh:IRI ; sh:pattern "/good/" ."""
    )
    tri = _tri(
        spark,
        [
            (E + "good/a", E + "t", "literal", "x", None, None),
            (E + "bad/b", E + "t", "literal", "x", None, None),
        ],
    )
    assert _verdicts(tri, schema) == {"a": "conformant", "b": "nonconformant"}


def test_node_level_in_and_hasvalue(spark):
    schema = parse_shacl(
        PRELUDE
        + """ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:t ;
  sh:in ( ex:a ex:b ) ."""
    )
    tri = _tri(
        spark,
        [
            (E + "a", E + "t", "literal", "x", None, None),
            (E + "c", E + "t", "literal", "x", None, None),
        ],
    )
    assert _verdicts(tri, schema) == {"a": "conformant", "c": "nonconformant"}

    schema2 = parse_shacl(
        PRELUDE
        + """ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:t ; sh:hasValue ex:a ."""
    )
    assert _verdicts(tri, schema2) == {"a": "conformant", "c": "nonconformant"}


def test_node_level_sh_node_to_property_shape(spark):
    """sh:node at node level = conjunct reference: focus must also
    conform to the referenced (target-less) shape."""
    schema = parse_shacl(
        PRELUDE
        + """ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:t ; sh:node ex:Base .
ex:Base sh:property [ sh:path ex:p ; sh:minCount 1 ] ."""
    )
    tri = _tri(
        spark,
        [
            (E + "a", E + "t", "literal", "x", None, None),
            (E + "a", E + "p", "literal", "x", None, None),
            (E + "b", E + "t", "literal", "x", None, None),
        ],
    )
    assert _verdicts(tri, schema) == {"a": "conformant", "b": "nonconformant"}


def test_node_level_sh_node_plain_target_inlines(spark):
    """sh:node to a value-only shape inlines its fields (no conformance
    join) — also at VALUE level, where literals must still match."""
    schema = parse_shacl(
        PRELUDE
        + """ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:v ;
  sh:property [ sh:path ex:v ; sh:minCount 1 ; sh:node ex:DateShape ] .
ex:DateShape sh:datatype xsd:date ."""
    )
    tc = schema.shapes[E + "S"].constraints[0]
    assert tc.ref_shape is None and tc.datatype == XSD + "date"
    tri = _tri(
        spark,
        [
            (E + "a", E + "v", "literal", "2020-01-01", None, XSD + "date"),
            (E + "b", E + "v", "literal", "5", None, XSD + "integer"),
        ],
    )
    assert _verdicts(tri, schema) == {"a": "conformant", "b": "nonconformant"}


def test_targeted_standalone_property_shape(spark):
    """A property shape with its own targets (no enclosing node shape)
    — previously silently undiscovered."""
    schema = parse_shacl(
        PRELUDE + """ex:P sh:path ex:p ; sh:targetSubjectsOf ex:t ; sh:minCount 1 ."""
    )
    tri = _tri(
        spark,
        [
            (E + "a", E + "t", "literal", "x", None, None),
            (E + "a", E + "p", "literal", "x", None, None),
            (E + "b", E + "t", "literal", "x", None, None),
        ],
    )
    assert _verdicts(tri, schema) == {"a": "conformant", "b": "nonconformant"}


def test_value_level_or_member_with_path(spark):
    """A property-shape sh:or whose member IS a property shape
    ([sh:path …]): the member applies to each value node as its focus —
    previously the member's path+minCount were silently unread."""
    schema = parse_shacl(
        PRELUDE
        + """ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:v ;
  sh:property [ sh:path ex:v ; sh:minCount 1 ;
    sh:or ( [ sh:datatype xsd:string ] [ sh:path ex:q ; sh:minCount 1 ] ) ] ."""
    )
    tri = _tri(
        spark,
        [
            # a's value is a plain string literal -> first member
            (E + "a", E + "v", "literal", "x", None, XSD + "string"),
            # b's value is an IRI node that has a q arc -> second member
            (E + "b", E + "v", "iri", E + "n1", None, None),
            (E + "n1", E + "q", "literal", "x", None, None),
            # c's value is an IRI node without q -> neither member
            (E + "c", E + "v", "iri", E + "n2", None, None),
            (E + "n2", E + "r", "literal", "x", None, None),
        ],
    )
    out = _verdicts(tri, schema)
    assert out["a"] == "conformant"
    assert out["b"] == "conformant"
    assert out["c"] == "nonconformant"


def test_qualified_value_shape_with_path(spark):
    """sh:qualifiedValueShape that is itself a property shape: count the
    values whose OWN q-neighbourhood satisfies it."""
    schema = parse_shacl(
        PRELUDE
        + """ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:v ;
  sh:property [ sh:path ex:v ;
    sh:qualifiedValueShape [ sh:path ex:q ; sh:minCount 1 ] ;
    sh:qualifiedMinCount 1 ] ."""
    )
    tri = _tri(
        spark,
        [
            (E + "a", E + "v", "iri", E + "n1", None, None),
            (E + "n1", E + "q", "literal", "x", None, None),
            (E + "b", E + "v", "iri", E + "n2", None, None),
            (E + "n2", E + "r", "literal", "x", None, None),
        ],
    )
    assert _verdicts(tri, schema) == {"a": "conformant", "b": "nonconformant"}


def test_member_closed_shape(spark):
    """sh:node to an anonymous CLOSED shape (was a clean reject)."""
    schema = parse_shacl(
        PRELUDE
        + """ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:v ;
  sh:property [ sh:path ex:v ;
    sh:node [ sh:closed true ; sh:property [ sh:path ex:q ] ] ] ."""
    )
    tri = _tri(
        spark,
        [
            (E + "a", E + "v", "iri", E + "n1", None, None),
            (E + "n1", E + "q", "literal", "x", None, None),
            (E + "b", E + "v", "iri", E + "n2", None, None),
            (E + "n2", E + "q", "literal", "x", None, None),
            (E + "n2", E + "r", "literal", "x", None, None),  # unmentioned
        ],
    )
    assert _verdicts(tri, schema) == {"a": "conformant", "b": "nonconformant"}


def test_node_level_not_property_member(spark):
    """sh:not [ sh:property … ]: conforming to the inner shape makes the
    focus NONconformant."""
    schema = parse_shacl(
        PRELUDE
        + """ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:t ;
  sh:not [ sh:property [ sh:path ex:p ; sh:minCount 1 ] ] ."""
    )
    tri = _tri(
        spark,
        [
            (E + "a", E + "t", "literal", "x", None, None),
            (E + "a", E + "p", "literal", "x", None, None),
            (E + "b", E + "t", "literal", "x", None, None),
        ],
    )
    assert _verdicts(tri, schema) == {"a": "nonconformant", "b": "conformant"}


def test_node_level_mixed_or_value_and_shape_member(spark):
    """Mixed sh:or: a value member and a property-shape member — the
    value member synthesizes an anonymous gate shape."""
    schema = parse_shacl(
        PRELUDE
        + """ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:t ;
  sh:or ( [ sh:pattern "/lit/" ] [ sh:path ex:p ; sh:minCount 1 ] ) ."""
    )
    tri = _tri(
        spark,
        [
            (E + "lit/a", E + "t", "literal", "x", None, None),
            (E + "b", E + "t", "literal", "x", None, None),
            (E + "b", E + "p", "literal", "x", None, None),
            (E + "c", E + "t", "literal", "x", None, None),
        ],
    )
    assert _verdicts(tri, schema) == {
        "a": "conformant",
        "b": "conformant",
        "c": "nonconformant",
    }


def test_validate_batch_falls_back_for_node_level(spark):
    """validate_batch must route node-level schemas through the full
    evaluator (the ADVICE r3 silent-drop lesson)."""
    schema = parse_shacl(
        PRELUDE
        + """ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:t ;
  sh:not [ sh:class ex:C ] ."""
    )
    rdf_type = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    tri = _tri(
        spark,
        [
            (E + "a", E + "t", "literal", "x", None, None),
            (E + "a", rdf_type, "iri", E + "C", None, None),
            (E + "b", E + "t", "literal", "x", None, None),
        ],
    )
    out = {
        r["node"][-1]: r["status"]
        for r in validate_batch(tri, [(schema, None, "S")]).collect()
    }
    assert out == {"a": "nonconformant", "b": "conformant"}


def test_rejects_are_clean_not_silent(spark):
    for body, msg in [
        ("ex:S a sh:NodeShape ; sh:targetClass ex:T ; sh:minCount 1 .", "unsupported component"),
        ("ex:S a sh:NodeShape ; sh:targetClass ex:T ; sh:uniqueLang true .", "unsupported component"),
        (
            "ex:S a sh:NodeShape ; sh:targetClass ex:T ; sh:property [ sh:path ex:p ; sh:closed true ] .",
            "sh:closed on a property shape",
        ),
    ]:
        with pytest.raises(ValueError, match=msg):
            parse_shacl(PRELUDE + body)


def test_node_level_and_with_shape_member(spark):
    schema = parse_shacl(
        PRELUDE
        + """ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:t ;
  sh:and ( [ sh:nodeKind sh:IRI ] [ sh:path ex:p ; sh:minCount 1 ] ) ."""
    )
    tri = _tri(
        spark,
        [
            (E + "a", E + "t", "literal", "x", None, None),
            (E + "a", E + "p", "literal", "x", None, None),
            (E + "b", E + "t", "literal", "x", None, None),
        ],
    )
    assert _verdicts(tri, schema) == {"a": "conformant", "b": "nonconformant"}


def test_negated_ref_into_cycle_from_outside_ok(spark):
    """A node-level sh:not referencing a RECURSIVE shape from OUTSIDE the
    cycle is fine — the referring shape evaluates post-fixpoint."""
    schema = parse_shacl(
        PRELUDE
        + """ex:Chain a sh:NodeShape ;
  sh:property [ sh:path ex:next ; sh:node ex:Chain ] .
ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:t ;
  sh:not [ sh:node ex:Chain ] ."""
    )
    tri = _tri(
        spark,
        [
            # a -> b, b has no next: both sit in Chain's greatest fixpoint,
            # so NOT(Chain) makes a nonconformant.  (b needs SOME arc —
            # conformant sets range over the subject universe.)
            (E + "a", E + "t", "literal", "x", None, None),
            (E + "a", E + "next", "iri", E + "b", None, None),
            (E + "b", E + "name", "literal", "B", None, None),
            # c's next is a literal (never in a conformant set) => c is NOT
            # in Chain => NOT(Chain) holds
            (E + "c", E + "t", "literal", "x", None, None),
            (E + "c", E + "next", "literal", "x", None, None),
        ],
    )
    assert _verdicts(tri, schema) == {"a": "nonconformant", "c": "conformant"}


def test_negated_ref_inside_cycle_rejects(spark):
    """Both ends of a shape-level negated reference inside the reference
    cycle: non-stratifiable, clean reject."""
    schema = parse_shacl(
        PRELUDE
        + """ex:A a sh:NodeShape ; sh:targetSubjectsOf ex:t ;
  sh:not [ sh:node ex:B ] ;
  sh:property [ sh:path ex:p ; sh:node ex:A ] .
ex:B a sh:NodeShape ;
  sh:property [ sh:path ex:q ; sh:node ex:A ] ."""
    )
    tri = _tri(spark, [(E + "a", E + "t", "literal", "x", None, None)])
    with pytest.raises(ValueError, match="not stratifiable"):
        validate(tri, schema).collect()
