"""ShEx OR / AND / NOT value expressions (SURVEY §2.7 step 3)."""

from __future__ import annotations

from rdfshape_api_spark.plans import parse_shexc, validate

E = "http://e/"


def _tri(spark, rows):
    cols = "doc_sha256 string, subj string, pred string, obj_kind string, obj_value string, obj_lang string, obj_datatype string"
    return spark.createDataFrame([("d", *r) for r in rows], cols)


XSD = "http://www.w3.org/2001/XMLSchema#"


def test_or_datatypes(spark):
    schema = parse_shexc(
        f"PREFIX ex: <{E}>\nPREFIX xsd: <{XSD}>\n"
        "ex:S { ex:v xsd:integer OR xsd:decimal }"
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
    smap = ", ".join(f"<{E}{n}>@<{E}S>" for n in "abc")
    out = {r["node"][-1]: r["status"] for r in validate(tri, schema, shapemap=smap).collect()}
    assert out == {"a": "conformant", "b": "conformant", "c": "nonconformant"}


def test_or_value_set_and_nodekind(spark):
    schema = parse_shexc(
        f'PREFIX ex: <{E}>\nex:S {{ ex:v [ "OK" ] OR IRI }}'
    )
    tri = _tri(
        spark,
        [
            (E + "a", E + "v", "literal", "OK", None, None),
            (E + "b", E + "v", "iri", E + "thing", None, None),
            (E + "c", E + "v", "literal", "NO", None, None),
        ],
    )
    smap = ", ".join(f"<{E}{n}>@<{E}S>" for n in "abc")
    out = {r["node"][-1]: r["status"] for r in validate(tri, schema, shapemap=smap).collect()}
    assert out == {"a": "conformant", "b": "conformant", "c": "nonconformant"}


def test_not_value_set(spark):
    schema = parse_shexc(f'PREFIX ex: <{E}>\nex:S {{ ex:v NOT [ "BAD" ] }}')
    tri = _tri(
        spark,
        [
            (E + "a", E + "v", "literal", "FINE", None, None),
            (E + "b", E + "v", "literal", "BAD", None, None),
            (E + "c", E + "v", "iri", E + "x", None, None),  # non-literal ≠ "BAD"
        ],
    )
    smap = ", ".join(f"<{E}{n}>@<{E}S>" for n in "abc")
    out = {r["node"][-1]: r["status"] for r in validate(tri, schema, shapemap=smap).collect()}
    assert out == {"a": "conformant", "b": "nonconformant", "c": "conformant"}


def test_explicit_and_facets(spark):
    schema = parse_shexc(
        f"PREFIX ex: <{E}>\nPREFIX xsd: <{XSD}>\n"
        "ex:S { ex:v xsd:decimal AND MININCLUSIVE 5 }"
    )
    tri = _tri(
        spark,
        [
            (E + "a", E + "v", "literal", "7", None, XSD + "decimal"),
            (E + "b", E + "v", "literal", "3", None, XSD + "decimal"),
        ],
    )
    out = {
        r["node"][-1]: r["status"]
        for r in validate(
            tri, schema, shapemap=f"<{E}a>@<{E}S>, <{E}b>@<{E}S>"
        ).collect()
    }
    assert out == {"a": "conformant", "b": "nonconformant"}


def test_or_roundtrips_through_shexc():
    from rdfshape_api_spark.plans.convert import to_shexc

    schema = parse_shexc(
        f"PREFIX ex: <{E}>\nPREFIX xsd: <{XSD}>\n"
        'ex:S { ex:v xsd:integer OR [ "NA" ] ; ex:w NOT IRI }'
    )
    text = to_shexc(schema)
    assert "OR" in text and "NOT" in text
    re2 = parse_shexc(text)
    tc = re2.shapes[E + "S"].constraints[0]
    assert tc.disjuncts and len(tc.disjuncts) == 2
    assert re2.shapes[E + "S"].constraints[1].negated


def test_or_of_shape_refs(spark):
    """`@<P> OR @<O>` — one conformance column per disjunct
    (reference surface: shexs ShapeOr over ShapeRefs, used by e.g. the
    rdfshape-api ShEx demos; SURVEY §2.7)."""
    schema = parse_shexc(
        f"PREFIX ex: <{E}>\n"
        "ex:S { ex:v @ex:P OR @ex:O }\n"
        "ex:P { ex:name . }\n"
        "ex:O { ex:org . }"
    )
    tri = _tri(
        spark,
        [
            (E + "a", E + "v", "iri", E + "pa", None, None),
            (E + "pa", E + "name", "literal", "Ann", None, None),
            (E + "b", E + "v", "iri", E + "ob", None, None),
            (E + "ob", E + "org", "literal", "ACME", None, None),
            (E + "c", E + "v", "iri", E + "xc", None, None),
            (E + "xc", E + "other", "literal", "?", None, None),
        ],
    )
    smap = ", ".join(f"<{E}{n}>@<{E}S>" for n in "abc")
    out = {r["node"][-1]: r["status"] for r in validate(tri, schema, shapemap=smap).collect()}
    assert out == {"a": "conformant", "b": "conformant", "c": "nonconformant"}


def test_or_mixes_value_set_and_shape_ref(spark):
    schema = parse_shexc(
        f'PREFIX ex: <{E}>\n'
        'ex:S { ex:v [ "none" ] OR @ex:P }\n'
        "ex:P { ex:name . }"
    )
    tri = _tri(
        spark,
        [
            (E + "a", E + "v", "literal", "none", None, None),
            (E + "b", E + "v", "iri", E + "pb", None, None),
            (E + "pb", E + "name", "literal", "Bea", None, None),
            (E + "c", E + "v", "literal", "some", None, None),
        ],
    )
    smap = ", ".join(f"<{E}{n}>@<{E}S>" for n in "abc")
    out = {r["node"][-1]: r["status"] for r in validate(tri, schema, shapemap=smap).collect()}
    assert out == {"a": "conformant", "b": "conformant", "c": "nonconformant"}


def test_or_negated_shape_ref_disjunct(spark):
    """`[ "x" ] OR NOT @<P>` — a value conforms if it is "x" or fails P."""
    schema = parse_shexc(
        f'PREFIX ex: <{E}>\n'
        'ex:S { ex:v [ "x" ] OR NOT @ex:P }\n'
        "ex:P { ex:name . }"
    )
    tri = _tri(
        spark,
        [
            (E + "a", E + "v", "literal", "x", None, None),
            (E + "b", E + "v", "iri", E + "nb", None, None),  # nb fails P
            (E + "nb", E + "other", "literal", "?", None, None),
            (E + "c", E + "v", "iri", E + "pc", None, None),  # pc passes P
            (E + "pc", E + "name", "literal", "Cy", None, None),
        ],
    )
    smap = ", ".join(f"<{E}{n}>@<{E}S>" for n in "abc")
    out = {r["node"][-1]: r["status"] for r in validate(tri, schema, shapemap=smap).collect()}
    assert out == {"a": "conformant", "b": "conformant", "c": "nonconformant"}


def test_or_ref_to_bare_node_constraint_inlines(spark):
    """`@ex:T OR IRI` where ex:T is a bare xsd:integer node constraint —
    the literal branch must be inlined (literals never sit in a shape's
    conformance set)."""
    schema = parse_shexc(
        f"PREFIX ex: <{E}>\nPREFIX xsd: <{XSD}>\n"
        "ex:S { ex:v @ex:T OR IRI }\n"
        "ex:T xsd:integer"
    )
    tri = _tri(
        spark,
        [
            (E + "a", E + "v", "literal", "5", None, XSD + "integer"),
            (E + "b", E + "v", "iri", E + "thing", None, None),
            (E + "c", E + "v", "literal", "zz", None, XSD + "string"),
        ],
    )
    smap = ", ".join(f"<{E}{n}>@<{E}S>" for n in "abc")
    out = {r["node"][-1]: r["status"] for r in validate(tri, schema, shapemap=smap).collect()}
    assert out == {"a": "conformant", "b": "conformant", "c": "nonconformant"}


def test_or_negated_ref_in_cycle_rejected(spark):
    """Disjunct-level negated ref whose target sits in a reference cycle
    is non-stratifiable — must reject, same as the top-level NOT case."""
    import pytest

    schema = parse_shexc(
        f'PREFIX ex: <{E}>\n'
        'ex:S { ex:v [ "x" ] OR NOT @ex:S }'
    )
    tri = _tri(spark, [(E + "a", E + "v", "iri", E + "a", None, None)])
    with pytest.raises(ValueError, match="not stratifiable"):
        validate(tri, schema, shapemap=f"<{E}a>@<{E}S>").collect()


def test_or_of_refs_with_recursion(spark):
    """Positive disjunct refs participate in the fixpoint like top-level
    refs: S requires v → (P OR S) — a chain ending at a P-node conforms."""
    schema = parse_shexc(
        f"PREFIX ex: <{E}>\n"
        "ex:S { ex:v @ex:P OR @ex:S }\n"
        "ex:P { ex:name . }"
    )
    tri = _tri(
        spark,
        [
            # a → b → p (p conforms to P) — both a and b conform to S
            (E + "a", E + "v", "iri", E + "b", None, None),
            (E + "b", E + "v", "iri", E + "p", None, None),
            (E + "p", E + "name", "literal", "end", None, None),
            # c → d, d → c: a pure 2-cycle with no P anchor; greatest
            # fixpoint admits it (standard gfp recursion semantics)
            (E + "c", E + "v", "iri", E + "d", None, None),
            (E + "d", E + "v", "iri", E + "c", None, None),
            # e → nothing: no ex:v at all — nonconformant
            (E + "e", E + "other", "literal", "?", None, None),
        ],
    )
    smap = ", ".join(f"<{E}{n}>@<{E}S>" for n in "abcde")
    out = {r["node"][-1]: r["status"] for r in validate(tri, schema, shapemap=smap).collect()}
    assert out["a"] == "conformant" and out["b"] == "conformant"
    assert out["e"] == "nonconformant"
    assert out["c"] == out["d"] == "conformant"


def test_ref_conjunction_rewrites_to_synthetic_shape():
    """`@<A> AND @<B>` parses to one reference to a synthetic conjunct
    shape carrying both targets (evaluation tested in
    test_shex_node_constraints.test_value_level_ref_conjunction)."""
    schema = parse_shexc(
        f"PREFIX ex: <{E}>\n"
        "ex:S { ex:v @ex:A AND @ex:B }\n"
        "ex:A { ex:name . }\n"
        "ex:B { ex:age . }"
    )
    tc = schema.shapes[E + "S"].constraints[0]
    assert tc.ref_shape.startswith("urn:shex:and:")
    assert schema.shapes[tc.ref_shape].conjunct_refs == [E + "A", E + "B"]


def test_or_refs_two_levels_deep_accepted():
    """r4: refs two OR-levels deep normalize at parse time — the mixed
    shape-level OR `@ex:A OR IRI` lifts to Shape.disjunct_refs with the
    IRI disjunct wrapped in a synthetic `urn:shex:or:N` shape, and the
    value-level `[ "x" ] OR @ex:T` keeps @ex:T as an ordinary disjunct
    ref (T is no longer a bare node-constraint shape)."""
    schema = parse_shexc(
        f'PREFIX ex: <{E}>\n'
        'ex:S { ex:v [ "x" ] OR @ex:T }\n'
        "ex:T @ex:A OR IRI\n"
        "ex:A { ex:name . }"
    )
    t = schema.shapes[E + "T"]
    assert t.disjunct_refs[0] == E + "A"
    assert t.disjunct_refs[1].startswith("urn:shex:or:")
    syn = schema.shapes[t.disjunct_refs[1]]
    assert syn.node_constraint.node_kind == "iri"
    tc = schema.shapes[E + "S"].constraints[0]
    assert [d.ref_shape for d in tc.disjuncts] == [None, E + "T"]


def test_or_valued_bare_shape_splices_in_disjunct_position():
    """An OR-valued bare node-constraint shape referenced inside an OR
    splices flat (OR associativity) — no 2-deep disjunct nesting."""
    schema = parse_shexc(
        f'PREFIX ex: <{E}>\n'
        'PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>\n'
        'ex:S { ex:v [ "x" ] OR @ex:T }\n'
        'ex:T [ "a"~ ] OR xsd:integer\n'
    )
    tc = schema.shapes[E + "S"].constraints[0]
    assert len(tc.disjuncts) == 3
    assert all(d.disjuncts is None for d in tc.disjuncts)


def test_not_over_or_valued_bare_shape(spark):
    """r4: NOT @ex:T where T = [ "a"~ ] OR xsd:integer keeps the
    disjunction nested on the disjunct with the negation bit — the
    evaluator compiles ~(stem | datatype) (De Morgan by Column algebra)."""
    from rdfshape_api_spark.plans.validate import validate

    schema = parse_shexc(
        f'PREFIX ex: <{E}>\n'
        'PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>\n'
        'ex:S { ex:v [ "x" ] OR NOT @ex:T }\n'
        'ex:T [ "a"~ ] OR xsd:integer\n'
    )
    tc = schema.shapes[E + "S"].constraints[0]
    assert len(tc.disjuncts) == 2
    neg = tc.disjuncts[1]
    assert neg.negated and len(neg.disjuncts) == 2

    cols = (
        "doc_sha256 string, subj string, pred string, obj_kind string, "
        "obj_value string, obj_lang string, obj_datatype string"
    )
    X = "http://www.w3.org/2001/XMLSchema#"
    tri = spark.createDataFrame(
        [
            ("d", E + "s1", E + "v", "literal", "x", None, None),  # first disjunct
            ("d", E + "s2", E + "v", "literal", "zzz", None, None),  # NOT(stem|int) ok
            ("d", E + "s3", E + "v", "literal", "abc", None, None),  # "a" stem → fails both
            ("d", E + "s4", E + "v", "literal", "7", None, X + "integer"),  # int → fails
        ],
        cols,
    )
    sm = ", ".join(f"<{E}s{i}>@<{E}S>" for i in range(1, 5))
    got = {
        r["node"][len(E):]: r["status"]
        for r in validate(tri, schema, shapemap=sm).collect()
    }
    assert got == {
        "s1": "conformant",
        "s2": "conformant",
        "s3": "nonconformant",
        "s4": "nonconformant",
    }


def test_not_over_shape_level_or_of_refs(spark):
    """NOT @ex:T where T is a real shape (`@ex:A OR IRI`) is an ordinary
    negated disjunct-level reference: T's conformance set is the union of
    its disjuncts, and negation is set complement — De Morgan for free."""
    from rdfshape_api_spark.plans.validate import validate

    schema = parse_shexc(
        f'PREFIX ex: <{E}>\n'
        'ex:S { ex:v [ "x" ] OR NOT @ex:T }\n'
        "ex:T @ex:A OR IRI\n"
        "ex:A { ex:name . }"
    )
    cols = (
        "doc_sha256 string, subj string, pred string, obj_kind string, "
        "obj_value string, obj_lang string, obj_datatype string"
    )
    tri = spark.createDataFrame(
        [
            ("d", E + "s1", E + "v", "literal", "x", None, None),  # 1st disjunct
            # bnode conforming to A → T-conformant → NOT fails, not "x"
            ("d", E + "s2", E + "v", "bnode", "_:n1", None, None),
            ("d", "_:n1", E + "name", "literal", "N", None, None),
            # literal "y": neither A-conformant nor IRI → NOT @T holds
            ("d", E + "s3", E + "v", "literal", "y", None, None),
            # IRI value → T's IRI disjunct → NOT fails
            ("d", E + "s4", E + "v", "iri", E + "w", None, None),
            ("d", E + "w", E + "other", "literal", "1", None, None),
        ],
        cols,
    )
    sm = ", ".join(f"<{E}s{i}>@<{E}S>" for i in range(1, 5))
    got = {
        r["node"][len(E):]: r["status"]
        for r in validate(tri, schema, shapemap=sm).collect()
    }
    assert got == {
        "s1": "conformant",
        "s2": "nonconformant",
        "s3": "conformant",
        "s4": "nonconformant",
    }


def test_nested_or_refs_validation(spark):
    """End-to-end validation through the normalized nested OR: ex:v must
    be "x" or a node conforming to T, where T = @ex:A OR IRI."""
    from rdfshape_api_spark.plans.validate import validate

    schema = parse_shexc(
        f'PREFIX ex: <{E}>\n'
        'ex:S { ex:v [ "x" ] OR @ex:T }\n'
        "ex:T @ex:A OR IRI\n"
        "ex:A { ex:name . }"
    )
    cols = (
        "doc_sha256 string, subj string, pred string, obj_kind string, "
        "obj_value string, obj_lang string, obj_datatype string"
    )
    tri = spark.createDataFrame(
        [
            # s1: literal "x" → first disjunct
            ("d", E + "s1", E + "v", "literal", "x", None, None),
            # s2: bnode value conforming to ex:A (has a name)
            ("d", E + "s2", E + "v", "bnode", "_:n1", None, None),
            ("d", "_:n1", E + "name", "literal", "N", None, None),
            # s3: IRI value with no triples of its own — but it IS a
            # subject elsewhere, so it sits in the all-subjects universe
            ("d", E + "s3", E + "v", "iri", E + "w", None, None),
            ("d", E + "w", E + "other", "literal", "1", None, None),
            # s4: literal "y" — matches nothing
            ("d", E + "s4", E + "v", "literal", "y", None, None),
        ],
        cols,
    )
    sm = ", ".join(f"<{E}s{i}>@<{E}S>" for i in range(1, 5))
    out = {
        r["node"][len(E):]: r["status"]
        for r in validate(tri, schema, shapemap=sm).collect()
    }
    assert out == {
        "s1": "conformant",
        "s2": "conformant",
        "s3": "conformant",
        "s4": "nonconformant",
    }
