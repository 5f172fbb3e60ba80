"""SHACL sh:or / sh:and / sh:not logical components."""

from __future__ import annotations

import pytest

from rdfshape_api_spark.plans import parse_shacl, validate

E = "http://e/"
XSD = "http://www.w3.org/2001/XMLSchema#"

PRELUDE = f"""\
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <{E}> .
@prefix xsd: <{XSD}> .
"""


def _tri(spark, rows):
    cols = "doc_sha256 string, subj string, pred string, obj_kind string, obj_value string, obj_lang string, obj_datatype string"
    return spark.createDataFrame([("d", *r) for r in rows], cols)


def test_sh_or_datatypes(spark):
    schema = parse_shacl(
        PRELUDE
        + """ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:v ;
  sh:property [ sh:path ex:v ; sh:minCount 1 ;
    sh:or ( [ sh:datatype xsd:integer ] [ sh:datatype xsd:decimal ] ) ] ."""
    )
    tc = schema.shapes[E + "S"].constraints[0]
    assert tc.disjuncts and len(tc.disjuncts) == 2

    tri = _tri(
        spark,
        [
            (E + "a", E + "v", "literal", "5", None, XSD + "integer"),
            (E + "b", E + "v", "literal", "5.5", None, XSD + "decimal"),
            (E + "c", E + "v", "literal", "x", None, XSD + "string"),
        ],
    )
    out = {r["node"][-1]: r["status"] for r in validate(tri, schema).collect()}
    assert out == {"a": "conformant", "b": "conformant", "c": "nonconformant"}


def test_sh_not(spark):
    schema = parse_shacl(
        PRELUDE
        + """ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:v ;
  sh:property [ sh:path ex:v ; sh:not [ sh:in ( "BAD" ) ] ] ."""
    )
    tri = _tri(
        spark,
        [
            (E + "a", E + "v", "literal", "FINE", None, None),
            (E + "b", E + "v", "literal", "BAD", None, None),
        ],
    )
    out = {r["node"][-1]: r["status"] for r in validate(tri, schema).collect()}
    assert out == {"a": "conformant", "b": "nonconformant"}


def test_sh_and_merges(spark):
    schema = parse_shacl(
        PRELUDE
        + """ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:v ;
  sh:property [ sh:path ex:v ;
    sh:and ( [ sh:datatype xsd:decimal ] [ sh:minInclusive 5 ] ) ] ."""
    )
    tri = _tri(
        spark,
        [
            (E + "a", E + "v", "literal", "7", None, XSD + "decimal"),
            (E + "b", E + "v", "literal", "3", None, XSD + "decimal"),
        ],
    )
    out = {r["node"][-1]: r["status"] for r in validate(tri, schema).collect()}
    assert out == {"a": "conformant", "b": "nonconformant"}


def test_sh_xone_parses_as_exclusive_disjunction():
    schema = parse_shacl(
        PRELUDE
        + """ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:v ;
  sh:property [ sh:path ex:v ; sh:xone ( [ sh:datatype xsd:integer ] ) ] ."""
    )
    tc = schema.shapes[E + "S"].constraints[0]
    assert tc.xone and tc.disjuncts and len(tc.disjuncts) == 1


def test_sh_or_with_sibling_constraints(spark):
    """Sibling value components AND with sh:or (independent conjuncts,
    SHACL spec §4.6.2): sh:nodeKind sh:Literal ; sh:or (integer|decimal)."""
    schema = parse_shacl(
        PRELUDE
        + """ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:v ;
  sh:property [ sh:path ex:v ; sh:minCount 1 ;
    sh:pattern "^[0-9.]+$" ;
    sh:or ( [ sh:datatype xsd:integer ] [ sh:datatype xsd:decimal ] ) ] ."""
    )
    tri = _tri(
        spark,
        [
            (E + "a", E + "v", "literal", "5", None, XSD + "integer"),
            (E + "b", E + "v", "literal", "5.5", None, XSD + "decimal"),
            # integer datatype but fails the sibling pattern
            (E + "c", E + "v", "literal", "x", None, XSD + "integer"),
            # passes pattern but neither datatype
            (E + "d", E + "v", "literal", "7", None, XSD + "string"),
        ],
    )
    out = {r["node"][-1]: r["status"] for r in validate(tri, schema).collect()}
    assert out == {
        "a": "conformant",
        "b": "conformant",
        "c": "nonconformant",
        "d": "nonconformant",
    }


def test_sh_xone_with_sibling_constraints(spark):
    """Sibling + sh:xone: value must satisfy the sibling AND exactly one
    member."""
    schema = parse_shacl(
        PRELUDE
        + """ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:v ;
  sh:property [ sh:path ex:v ; sh:minCount 1 ;
    sh:minLength 2 ;
    sh:xone ( [ sh:pattern "^a" ] [ sh:pattern "b$" ] ) ] ."""
    )
    tri = _tri(
        spark,
        [
            (E + "a", E + "v", "literal", "ax", None, None),   # first only
            (E + "b", E + "v", "literal", "xb", None, None),   # second only
            (E + "c", E + "v", "literal", "ab", None, None),   # both → fail
            (E + "d", E + "v", "literal", "a", None, None),    # sibling fails
        ],
    )
    out = {r["node"][-1]: r["status"] for r in validate(tri, schema).collect()}
    assert out == {
        "a": "conformant",
        "b": "conformant",
        "c": "nonconformant",
        "d": "nonconformant",
    }


def test_sh_or_sibling_conflict_rejected(spark):
    """A field set on both the sibling and a member has no single-slot
    encoding — clear reject."""
    with pytest.raises(ValueError, match="both"):
        parse_shacl(
            PRELUDE
            + """ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:v ;
  sh:property [ sh:path ex:v ; sh:datatype xsd:string ;
    sh:or ( [ sh:datatype xsd:integer ] [ sh:datatype xsd:decimal ] ) ] ."""
        )


def test_sh_or_sibling_node_ref(spark):
    """A sibling sh:node distributes into sh:or members (ref columns are
    threaded per disjunct)."""
    schema = parse_shacl(
        PRELUDE
        + """ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:v ;
  sh:property [ sh:path ex:v ; sh:minCount 1 ; sh:node ex:N ;
    sh:or ( [ sh:pattern "ok" ] [ sh:pattern "fine" ] ) ] .
ex:N a sh:NodeShape ; sh:property [ sh:path ex:tag ; sh:minCount 1 ] ."""
    )
    tri = _tri(
        spark,
        [
            # value node passes ex:N and matches a member pattern
            (E + "a", E + "v", "iri", E + "ok1", None, None),
            (E + "ok1", E + "tag", "literal", "t", None, None),
            # value node matches a member pattern but fails ex:N
            (E + "b", E + "v", "iri", E + "ok2", None, None),
            # value node passes ex:N but matches no member
            (E + "c", E + "v", "iri", E + "zz3", None, None),
            (E + "zz3", E + "tag", "literal", "t", None, None),
        ],
    )
    out = {
        r["node"][-1]: r["status"]
        for r in validate(tri, schema).collect()
        if r["node"] in (E + "a", E + "b", E + "c")
    }
    assert out == {"a": "conformant", "b": "nonconformant", "c": "nonconformant"}


def test_sh_deactivated(spark):
    """sh:deactivated true (spec §2.1.3.3): the shape validates nothing;
    a deactivated property shape is skipped inside an active node shape."""
    schema = parse_shacl(
        PRELUDE
        + """ex:Dead a sh:NodeShape ; sh:deactivated true ;
  sh:targetSubjectsOf ex:v ;
  sh:property [ sh:path ex:v ; sh:datatype xsd:integer ] .
ex:Live a sh:NodeShape ; sh:targetSubjectsOf ex:v ;
  sh:property [ sh:path ex:v ; sh:minCount 1 ] ;
  sh:property [ sh:path ex:v ; sh:datatype xsd:integer ;
                sh:deactivated true ] ."""
    )
    assert E + "Dead" not in schema.shapes
    tri = _tri(spark, [(E + "a", E + "v", "literal", "zz", None, XSD + "string")])
    out = {r["node"][-1]: r["status"] for r in validate(tri, schema).collect()}
    # the integer constraint is deactivated, so the string value conforms
    assert out == {"a": "conformant"}


def test_sh_pattern_flags(spark):
    schema = parse_shacl(
        PRELUDE
        + """ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:v ;
  sh:property [ sh:path ex:v ; sh:pattern "^ok" ; sh:flags "i" ] ."""
    )
    tri = _tri(
        spark,
        [
            (E + "a", E + "v", "literal", "OKAY", None, None),
            (E + "b", E + "v", "literal", "nope", None, None),
        ],
    )
    out = {r["node"][-1]: r["status"] for r in validate(tri, schema).collect()}
    assert out == {"a": "conformant", "b": "nonconformant"}


def test_sh_message_in_reasons(spark):
    schema = parse_shacl(
        PRELUDE
        + """ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:v ;
  sh:property [ sh:path ex:v ; sh:datatype xsd:integer ;
                sh:message "v must be an integer" ] ."""
    )
    tri = _tri(spark, [(E + "a", E + "v", "literal", "zz", None, None)])
    rows = validate(tri, schema).collect()
    assert rows[0]["status"] == "nonconformant"
    assert "v must be an integer" in list(rows[0]["reasons"])


def test_nested_sh_or_splices_flat():
    """r4: a nested sh:or member splices into the parent disjunction (OR
    associativity) — before round 4 the nested combinator was silently
    unread, leaving a trivially-true member."""
    schema = parse_shacl(
        PRELUDE
        + """ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:v ;
  sh:property [ sh:path ex:v ;
    sh:or ( [ sh:or ( [ sh:datatype xsd:integer ] [ sh:datatype xsd:decimal ] ) ]
            [ sh:nodeKind sh:IRI ] ) ] ."""
    )
    tc = schema.shapes[E + "S"].constraints[0]
    assert len(tc.disjuncts) == 3
    assert all(d.disjuncts is None for d in tc.disjuncts)


def test_nested_sh_or_with_node_ref_validates(spark):
    """sh:node nested two sh:or levels deep — the former clean reject:
    splicing puts the ref at disjunct level 1, where per-disjunct ref
    columns already work."""
    schema = parse_shacl(
        PRELUDE
        + """ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:v ;
  sh:property [ sh:path ex:v ; sh:minCount 1 ;
    sh:or ( [ sh:or ( [ sh:node ex:N ] [ sh:datatype xsd:integer ] ) ]
            [ sh:nodeKind sh:BlankNode ] ) ] .
ex:N a sh:NodeShape ;
  sh:property [ sh:path ex:name ; sh:minCount 1 ] ."""
    )
    tri = _tri(
        spark,
        [
            # a: IRI value conforming to ex:N (has a name)
            (E + "a", E + "v", "iri", E + "n1", None, None),
            (E + "n1", E + "name", "literal", "x", None, None),
            # b: integer literal — second nested disjunct
            (E + "b", E + "v", "literal", "5", None, XSD + "integer"),
            # c: IRI value NOT conforming to ex:N, not integer, not bnode
            (E + "c", E + "v", "iri", E + "bare", None, None),
            (E + "bare", E + "other", "literal", "1", None, None),
        ],
    )
    out = {
        r["node"][len(E):]: r["status"]
        for r in validate(tri, schema).collect()
        if r["shape_id"] == E + "S"
    }
    assert out["a"] == "conformant"
    assert out["b"] == "conformant"
    assert out["c"] == "nonconformant"


def test_nested_sh_not_in_member(spark):
    """sh:not inside an sh:or member: NOT(integer) OR IRI."""
    schema = parse_shacl(
        PRELUDE
        + """ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:v ;
  sh:property [ sh:path ex:v ; sh:minCount 1 ;
    sh:or ( [ sh:not [ sh:datatype xsd:integer ] ] [ sh:nodeKind sh:IRI ] ) ] ."""
    )
    tri = _tri(
        spark,
        [
            (E + "a", E + "v", "literal", "x", None, XSD + "string"),  # not-int ok
            (E + "b", E + "v", "literal", "5", None, XSD + "integer"),  # int, literal
            (E + "c", E + "v", "iri", E + "w", None, None),  # IRI disjunct
        ],
    )
    out = {
        r["node"][len(E):]: r["status"] for r in validate(tri, schema).collect()
    }
    assert out == {"a": "conformant", "b": "nonconformant", "c": "conformant"}


def test_member_field_distributes_into_nested_or():
    """Direct fields on a member node are conjuncts with its nested OR and
    distribute into the nested members."""
    schema = parse_shacl(
        PRELUDE
        + """ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:v ;
  sh:property [ sh:path ex:v ;
    sh:or ( [ sh:nodeKind sh:Literal ;
              sh:or ( [ sh:datatype xsd:integer ] [ sh:datatype xsd:decimal ] ) ]
            [ sh:nodeKind sh:IRI ] ) ] ."""
    )
    tc = schema.shapes[E + "S"].constraints[0]
    assert [(d.node_kind, d.datatype and d.datatype.split("#")[1]) for d in tc.disjuncts] == [
        ("literal", "integer"),
        ("literal", "decimal"),
        ("iri", None),
    ]


def test_unread_member_component_rejects():
    """A member node carrying a component the frontend cannot evaluate at
    value level must reject, never silently pass.  (sh:property on a member
    is no longer in this list — it evaluates as an anonymous-shape
    reference since r4s9; sh:closed members joined it in r4s10, see
    test_shacl_node_level.py.)"""
    for comp in (
        "sh:qualifiedValueShape [ sh:node ex:N ] ; sh:qualifiedMinCount 1",
    ):
        with pytest.raises(ValueError, match="logical-member"):
            parse_shacl(
                PRELUDE
                + f"""ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:v ;
  sh:property [ sh:path ex:v ; sh:or ( [ {comp} ] [ sh:nodeKind sh:IRI ] ) ] ."""
            )


def test_sh_and_over_disjunction_distributes():
    """Fields conjoined with a disjunction via sh:and distribute into the
    disjuncts — (a OR b) AND nk ≡ (a AND nk) OR (b AND nk); a TC carrying
    both would silently drop the fields in _value_ok's disjunct branch."""
    schema = parse_shacl(
        PRELUDE
        + """ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:v ;
  sh:property [ sh:path ex:v ;
    sh:or ( [ sh:datatype xsd:integer ] [ sh:datatype xsd:decimal ] ) ;
    sh:and ( [ sh:nodeKind sh:Literal ] ) ] ."""
    )
    tc = schema.shapes[E + "S"].constraints[0]
    assert all(d.node_kind == "literal" for d in tc.disjuncts)
    # nested variant: sh:and( or-carrier, field ) inside an sh:or member
    schema2 = parse_shacl(
        PRELUDE
        + """ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:v ;
  sh:property [ sh:path ex:v ;
    sh:or ( [ sh:and ( [ sh:or ( [ sh:datatype xsd:integer ]
                                 [ sh:datatype xsd:decimal ] ) ]
                       [ sh:nodeKind sh:Literal ] ) ]
            [ sh:nodeKind sh:IRI ] ) ] ."""
    )
    tc2 = schema2.shapes[E + "S"].constraints[0]
    assert [(bool(d.datatype), d.node_kind) for d in tc2.disjuncts] == [
        (True, "literal"),
        (True, "literal"),
        (False, "iri"),
    ]


def test_sh_and_with_not_member(spark):
    """Round-4 fix: an sh:and member carrying sh:not lowered through the
    field fold LOST its negation (inverted verdicts).  Mixed-polarity
    sh:and now lowers to a `conjuncts` carrier the evaluator ANDs
    recursively."""
    schema = parse_shacl(
        PRELUDE
        + """ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:v ;
  sh:property [ sh:path ex:v ;
    sh:or ( [ sh:and ( [ sh:not [ sh:in ( "BAD" ) ] ] [ sh:minLength 2 ] ) ]
            [ sh:in ( "ZZ" ) ] ) ] ."""
    )
    tc = schema.shapes[E + "S"].constraints[0]
    assert tc.disjuncts[0].conjuncts is not None
    assert any(m.negated for m in tc.disjuncts[0].conjuncts)
    tri = _tri(
        spark,
        [
            (E + "a", E + "v", "literal", "BAD", None, None),  # NOT-BAD fails
            (E + "b", E + "v", "literal", "FINE", None, None),  # ok
            (E + "c", E + "v", "literal", "ZZ", None, None),  # 2nd or-member
            (E + "e", E + "v", "literal", "x", None, None),  # minLength fails
        ],
    )
    out = {r["node"][-1]: r["status"] for r in validate(tri, schema).collect()}
    assert out == {
        "a": "nonconformant",
        "b": "conformant",
        "c": "conformant",
        "e": "nonconformant",
    }


def test_sh_and_two_disjunctions(spark):
    """Two disjunctions conjoined under sh:and (previously a reject):
    (integer OR decimal) AND (minInclusive 1 OR maxInclusive -1)."""
    schema = parse_shacl(
        PRELUDE
        + """ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:v ;
  sh:property [ sh:path ex:v ; sh:minCount 1 ;
    sh:and (
      [ sh:or ( [ sh:datatype xsd:integer ] [ sh:datatype xsd:decimal ] ) ]
      [ sh:or ( [ sh:minInclusive 1 ] [ sh:maxInclusive -1 ] ) ]
    ) ] ."""
    )
    tri = _tri(
        spark,
        [
            (E + "a", E + "v", "literal", "5", None, XSD + "integer"),
            (E + "b", E + "v", "literal", "-2.5", None, XSD + "decimal"),
            (E + "c", E + "v", "literal", "0", None, XSD + "integer"),
            (E + "e", E + "v", "literal", "5", None, XSD + "string"),
        ],
    )
    out = {r["node"][-1]: r["status"] for r in validate(tri, schema).collect()}
    assert out == {
        "a": "conformant",
        "b": "conformant",
        "c": "nonconformant",
        "e": "nonconformant",
    }


def test_sh_hasvalue_on_logical_member(spark):
    """sh:hasValue on a node shape applies to a single value node → the
    condition degenerates to value == term (one-member sh:in).  Previously
    a clean reject."""
    schema = parse_shacl(
        PRELUDE
        + """ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:v ;
  sh:property [ sh:path ex:v ; sh:minCount 1 ;
    sh:or ( [ sh:hasValue ex:gold ] [ sh:datatype xsd:integer ] ) ] ."""
    )
    tri = _tri(
        spark,
        [
            (E + "a", E + "v", "iri", E + "gold", None, None),
            (E + "b", E + "v", "literal", "7", None, XSD + "integer"),
            (E + "c", E + "v", "iri", E + "lead", None, None),
        ],
    )
    out = {r["node"][-1]: r["status"] for r in validate(tri, schema).collect()}
    assert out == {"a": "conformant", "b": "conformant", "c": "nonconformant"}


def test_sh_hasvalue_member_intersects_sh_in(spark):
    """hasValue conjoined with a sibling sh:in on one member: intersect
    ({term} if admitted, unsatisfiable otherwise)."""
    schema = parse_shacl(
        PRELUDE
        + """ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:v ;
  sh:property [ sh:path ex:v ; sh:minCount 1 ;
    sh:or ( [ sh:in ( "A" "B" ) ; sh:hasValue "A" ] [ sh:in ( "Z" ) ] ) ] ."""
    )
    tri = _tri(
        spark,
        [
            (E + "a", E + "v", "literal", "A", None, None),
            (E + "b", E + "v", "literal", "B", None, None),  # in sh:in, not hasValue
            (E + "z", E + "v", "literal", "Z", None, None),
        ],
    )
    out = {r["node"][-1]: r["status"] for r in validate(tri, schema).collect()}
    assert out == {"a": "conformant", "b": "nonconformant", "z": "conformant"}
