"""Parenthesized ShEx value expressions (ShExC ``shapeAtom ::= '('
shapeExpression ')'``): pure groups, NOT over groups (including shape
references — the conformance-set-complement case), and DNF distribution
of a group conjoined with other primitives.

Reference parity: shexs accepts arbitrarily nested shape expressions
behind SchemaValidate.scala:97-99; the subset boundaries that remain
(negated groups in disjunct position carrying refs, negated groups
conjoined with primitives) raise clean errors.
"""

from __future__ import annotations

import pytest

from rdfshape_api_spark.plans import parse_shexc, validate

E = "http://e/"
XSD = "http://www.w3.org/2001/XMLSchema#"


def _tri(spark, rows):
    cols = "doc_sha256 string, subj string, pred string, obj_kind string, obj_value string, obj_lang string, obj_datatype string"
    return spark.createDataFrame([("d", *r) for r in rows], cols)


# ---------------------------------------------------------------- parser


def test_pure_group_lowers_to_disjuncts():
    sch = parse_shexc(
        f"PREFIX ex: <{E}>\nPREFIX xsd: <{XSD}>\n"
        "ex:S { ex:v (xsd:string OR xsd:integer) }"
    )
    tc = sch.shapes[E + "S"].constraints[0]
    assert not tc.negated
    assert [d.datatype for d in tc.disjuncts] == [XSD + "string", XSD + "integer"]


def test_not_group_sets_negated_disjunction():
    sch = parse_shexc(
        f"PREFIX ex: <{E}>\nPREFIX xsd: <{XSD}>\n"
        "ex:S { ex:v NOT (xsd:string OR xsd:integer) }"
    )
    tc = sch.shapes[E + "S"].constraints[0]
    assert tc.negated and len(tc.disjuncts) == 2


def test_nested_pure_groups_splice_flat():
    sch = parse_shexc(
        f"PREFIX ex: <{E}>\nPREFIX xsd: <{XSD}>\n"
        "ex:S { ex:v ((xsd:string OR xsd:integer) OR IRI) }"
    )
    tc = sch.shapes[E + "S"].constraints[0]
    assert len(tc.disjuncts) == 3 and tc.disjuncts[2].node_kind == "iri"


def test_and_group_distributes_to_dnf():
    sch = parse_shexc(
        f"PREFIX ex: <{E}>\n"
        "ex:A { ex:name . }\nex:B { ex:mbox . }\n"
        "ex:S { ex:v IRI AND (@ex:A OR @ex:B) }"
    )
    tc = sch.shapes[E + "S"].constraints[0]
    assert [(d.node_kind, d.ref_shape) for d in tc.disjuncts] == [
        ("iri", E + "A"),
        ("iri", E + "B"),
    ]


def test_facets_tighten_in_conjunction():
    sch = parse_shexc(
        f"PREFIX ex: <{E}>\nPREFIX xsd: <{XSD}>\n"
        "ex:S { ex:v (MININCLUSIVE 3 OR MININCLUSIVE 7) AND MININCLUSIVE 5 }"
    )
    tc = sch.shapes[E + "S"].constraints[0]
    assert [d.min_inclusive for d in tc.disjuncts] == [5.0, 7.0]


def test_unsatisfiable_conjunct_dropped():
    # IRI∧BNODE matches no term: the DNF keeps only the live conjuncts
    sch = parse_shexc(
        f"PREFIX ex: <{E}>\n"
        "ex:A { ex:name . }\n"
        "ex:S { ex:v BNODE AND (@ex:A OR IRI) }"
    )
    tc = sch.shapes[E + "S"].constraints[0]
    assert tc.disjuncts is None and tc.ref_shape == E + "A" and tc.node_kind == "bnode"


def test_fully_unsatisfiable_conjunction_rejects():
    with pytest.raises(ValueError, match="unsatisfiable"):
        parse_shexc(f"PREFIX ex: <{E}>\nex:S {{ ex:v IRI AND (BNODE OR LITERAL) }}")


def test_not_mixing_group_and_primitive_rejects():
    with pytest.raises(ValueError, match="NOT over a conjunction"):
        parse_shexc(
            f"PREFIX ex: <{E}>\nPREFIX xsd: <{XSD}>\n"
            "ex:S { ex:v NOT IRI AND (xsd:string OR xsd:integer) }"
        )


def test_negated_group_conjunction_lowers_to_conjuncts():
    """Round-4 lift: a negated (...) group conjoined with primitives
    lowers to a value-level `conjuncts` carrier instead of rejecting."""
    sch = parse_shexc(
        f"PREFIX ex: <{E}>\nPREFIX xsd: <{XSD}>\n"
        'ex:S { ex:v xsd:string AND NOT ([ "bad" "worse" ] OR MINLENGTH 9) }'
    )
    tc = sch.shapes[E + "S"].constraints[0]
    assert tc.conjuncts and len(tc.conjuncts) == 2
    assert tc.conjuncts[0].datatype == XSD + "string"
    assert tc.conjuncts[1].negated and len(tc.conjuncts[1].disjuncts) == 2
    # positive group with a negated member conjoined with a primitive
    sch2 = parse_shexc(
        f"PREFIX ex: <{E}>\nPREFIX xsd: <{XSD}>\n"
        "ex:S { ex:v (NOT IRI OR xsd:string) AND MINLENGTH 2 }"
    )
    tc2 = sch2.shapes[E + "S"].constraints[0]
    assert tc2.conjuncts and len(tc2.conjuncts) == 2


def test_negated_group_conjunction_with_ref_parses():
    """Round 4: a shape ref inside a mixed-polarity conjunction lowers to
    a `conjuncts` carrier with the ref on a nested (negated) disjunct —
    the evaluator attaches a conformance column per ref-carrying node
    (validate._walk_value_nodes), so this is no longer a reject."""
    schema = parse_shexc(
        f"PREFIX ex: <{E}>\nPREFIX xsd: <{XSD}>\n"
        "ex:T { ex:name . }\n"
        "ex:S { ex:v xsd:string AND NOT (@ex:T OR xsd:integer) }"
    )
    tc = schema.shapes[E + "S"].constraints[0]
    assert tc.conjuncts is not None
    neg = [m for m in tc.conjuncts if m.negated]
    assert len(neg) == 1 and any(
        d.ref_shape == E + "T" for d in neg[0].disjuncts
    )


def test_conflicting_pattern_rejects():
    with pytest.raises(ValueError, match="pattern"):
        parse_shexc(
            f"PREFIX ex: <{E}>\n"
            'ex:S { ex:v PATTERN "a" AND (PATTERN "b" OR IRI) }'
        )


# ------------------------------------------------------------- evaluator


def test_not_group_pure_values(spark):
    schema = parse_shexc(
        f"PREFIX ex: <{E}>\nPREFIX xsd: <{XSD}>\n"
        'ex:S { ex:v NOT (xsd:integer OR [ "BAD" ]) }'
    )
    tri = _tri(
        spark,
        [
            (E + "a", E + "v", "literal", "FINE", None, None),
            (E + "b", E + "v", "literal", "5", None, XSD + "integer"),
            (E + "c", E + "v", "literal", "BAD", None, None),
            (E + "d", E + "v", "iri", E + "x", None, None),
        ],
    )
    smap = ", ".join(f"<{E}{n}>@<{E}S>" for n in "abcd")
    out = {r["node"][-1]: r["status"] for r in validate(tri, schema, shapemap=smap).collect()}
    assert out == {
        "a": "conformant",
        "b": "nonconformant",
        "c": "nonconformant",
        "d": "conformant",
    }


def test_not_group_with_shape_ref(spark):
    # NOT (@ex:Named OR IRI): the value must be neither a conformant
    # ex:Named node nor an IRI — the conformance-set complement that was
    # round 3's clean reject, now first-class via the negated disjunction
    schema = parse_shexc(
        f"PREFIX ex: <{E}>\n"
        "ex:Named { ex:name . }\n"
        "ex:S { ex:v NOT (@ex:Named OR IRI) }"
    )
    tri = _tri(
        spark,
        [
            # value _:n1 has a name → in Named's set → a fails
            (E + "a", E + "v", "bnode", "_:n1", None, None),
            ("_:n1", E + "name", "literal", "x", None, None),
            # value _:n2 has no name → not Named, not IRI → b conforms
            (E + "b", E + "v", "bnode", "_:n2", None, None),
            # IRI value without a name → still an IRI → c fails
            (E + "c", E + "v", "iri", E + "thing", None, None),
            # literal value → d conforms
            (E + "d", E + "v", "literal", "5", None, None),
        ],
    )
    smap = ", ".join(f"<{E}{n}>@<{E}S>" for n in "abcd")
    out = {r["node"][-1]: r["status"] for r in validate(tri, schema, shapemap=smap).collect()}
    assert out == {
        "a": "nonconformant",
        "b": "conformant",
        "c": "nonconformant",
        "d": "conformant",
    }


def test_and_distribution_end_to_end(spark):
    # IRI AND (@ex:A OR @ex:B): value must be an IRI conforming to A or B
    schema = parse_shexc(
        f"PREFIX ex: <{E}>\n"
        "ex:A { ex:name . }\nex:B { ex:mbox . }\n"
        "ex:S { ex:v IRI AND (@ex:A OR @ex:B) }"
    )
    tri = _tri(
        spark,
        [
            (E + "a", E + "v", "iri", E + "n1", None, None),
            (E + "n1", E + "name", "literal", "x", None, None),
            (E + "b", E + "v", "iri", E + "n2", None, None),
            (E + "n2", E + "mbox", "literal", "m@x", None, None),
            # bnode value conforms to A but fails the IRI conjunct
            (E + "c", E + "v", "bnode", "_:n3", None, None),
            ("_:n3", E + "name", "literal", "y", None, None),
            # IRI value conforming to neither
            (E + "d", E + "v", "iri", E + "n4", None, None),
            (E + "n4", E + "other", "literal", "z", None, None),
        ],
    )
    smap = ", ".join(f"<{E}{n}>@<{E}S>" for n in "abcd")
    out = {r["node"][-1]: r["status"] for r in validate(tri, schema, shapemap=smap).collect()}
    assert out == {
        "a": "conformant",
        "b": "conformant",
        "c": "nonconformant",
        "d": "nonconformant",
    }


def test_negated_ref_group_in_disjunct_position(spark):
    """Round 4: a negated group carrying a ref at nested disjunct level is
    now evaluated — path-keyed conformance columns reach any depth.
    `LITERAL OR NOT (@ex:A OR IRI)`: conformant iff the value is a literal,
    or is neither A-conformant nor an IRI."""
    schema = parse_shexc(
        f"PREFIX ex: <{E}>\n"
        "ex:A { ex:name . }\n"
        "ex:S { ex:v LITERAL OR NOT (@ex:A OR IRI) }"
    )
    rows = [
        (E + "named", E + "name", "literal", "N", None, None),
        (E + "a", E + "v", "literal", "x", None, None),  # literal → ok
        (E + "b", E + "v", "iri", E + "named", None, None),  # IRI → not ok
        # bnode value, not A-conformant, not an IRI → second disjunct holds
        (E + "c", E + "v", "bnode", "_:z", None, None),
    ]
    tri = _tri(spark, rows)
    smap = ", ".join(f"<{E}{n}>@<{E}S>" for n in ("a", "b", "c"))
    out = {r["node"][-1]: r["status"] for r in validate(tri, schema, shapemap=smap).collect()}
    assert out == {"a": "conformant", "b": "nonconformant", "c": "conformant"}


def test_mixed_polarity_conjunction_end_to_end(spark):
    """`xsd:string AND NOT ([ "bad" "worse" ] OR MINLENGTH 9)` — the
    round-4 mixed-polarity conjuncts carrier, through both validate()
    and the batched path."""
    from rdfshape_api_spark.plans.validate import validate_batch

    schema = parse_shexc(
        f"PREFIX ex: <{E}>\nPREFIX xsd: <{XSD}>\n"
        'ex:S { ex:v xsd:string AND NOT ([ "bad" "worse" ] OR MINLENGTH 9) }'
    )
    tri = _tri(
        spark,
        [
            (E + "a", E + "v", "literal", "good", None, None),
            (E + "b", E + "v", "literal", "bad", None, None),
            (E + "c", E + "v", "literal", "worse", None, None),
            (E + "d", E + "v", "iri", E + "x", None, None),
            (E + "e", E + "v", "literal", "5", None, XSD + "integer"),
        ],
    )
    smap = ", ".join(f"<{E}{n}>@<{E}S>" for n in "abcde")
    expected = {
        "a": "conformant",
        "b": "nonconformant",
        "c": "nonconformant",
        "d": "nonconformant",   # IRI is not an xsd:string literal
        "e": "nonconformant",   # integer datatype
    }
    out = {r["node"][-1]: r["status"] for r in validate(tri, schema, shapemap=smap).collect()}
    assert out == expected
    outb = {
        r["node"][-1]: r["status"]
        for r in validate_batch(tri, [(schema, smap, "s")]).collect()
    }
    assert outb == expected


def test_minlength_with_negated_member_group_end_to_end(spark):
    """`(NOT IRI OR xsd:string) AND MINLENGTH 2`."""
    schema = parse_shexc(
        f"PREFIX ex: <{E}>\nPREFIX xsd: <{XSD}>\n"
        "ex:S { ex:v (NOT IRI OR xsd:string) AND MINLENGTH 2 }"
    )
    tri = _tri(
        spark,
        [
            (E + "a", E + "v", "literal", "ok", None, None),    # not-IRI & len 2
            (E + "b", E + "v", "literal", "x", None, None),     # len 1 fails
            (E + "c", E + "v", "iri", E + "longiri", None, None),  # IRI, no string dt
        ],
    )
    smap = ", ".join(f"<{E}{n}>@<{E}S>" for n in "abc")
    out = {r["node"][-1]: r["status"] for r in validate(tri, schema, shapemap=smap).collect()}
    assert out == {"a": "conformant", "b": "nonconformant", "c": "nonconformant"}
