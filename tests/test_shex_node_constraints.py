"""ShEx shape-level node constraints: bare node-constraint shapes
(`ex:T IRI`, inlined into referencing triple constraints) and braced
shapes gated on the focus node (`ex:S IRI AND { … }`)."""

from __future__ import annotations

from rdfshape_api_spark.plans import parse_shexc, validate

E = "http://e/"
XSD = "http://www.w3.org/2001/XMLSchema#"


def _tri(spark, rows):
    cols = "doc_sha256 string, subj string, pred string, obj_kind string, obj_value string, obj_lang string, obj_datatype string"
    return spark.createDataFrame([("d", *r) for r in rows], cols)


def test_bare_node_constraint_shape_inlined():
    schema = parse_shexc(
        f"PREFIX ex: <{E}>\nPREFIX xsd: <{XSD}>\n"
        "ex:DateT xsd:date\n"
        "ex:S { ex:born @ex:DateT }"
    )
    tc = schema.shapes[E + "S"].constraints[0]
    assert tc.ref_shape is None
    assert tc.datatype == XSD + "date"


def test_bare_node_constraint_nodekind_inlined(spark):
    schema = parse_shexc(
        f"PREFIX ex: <{E}>\nex:IriT IRI\nex:S {{ ex:link @ex:IriT }}"
    )
    tri = _tri(
        spark,
        [
            (E + "a", E + "link", "iri", E + "x", None, None),
            (E + "b", E + "link", "literal", "nope", None, None),
        ],
    )
    smap = f"<{E}a>@<{E}S>, <{E}b>@<{E}S>"
    out = {r["node"][-1]: r["status"] for r in validate(tri, schema, shapemap=smap).collect()}
    assert out == {"a": "conformant", "b": "nonconformant"}


def test_bare_valueset_shape_inlined(spark):
    schema = parse_shexc(
        f"PREFIX ex: <{E}>\nex:StatusT [ \"OK\" \"RUNNING\" ]\n"
        f"ex:S {{ ex:status @ex:StatusT }}"
    )
    tri = _tri(
        spark,
        [
            (E + "a", E + "status", "literal", "OK", None, None),
            (E + "b", E + "status", "literal", "BROKEN", None, None),
        ],
    )
    smap = f"<{E}a>@<{E}S>, <{E}b>@<{E}S>"
    out = {r["node"][-1]: r["status"] for r in validate(tri, schema, shapemap=smap).collect()}
    assert out == {"a": "conformant", "b": "nonconformant"}


def test_braced_shape_with_node_kind_gate(spark):
    # IRI AND { … }: a blank-node focus fails regardless of its triples
    schema = parse_shexc(
        f"PREFIX ex: <{E}>\nex:S IRI AND {{ ex:v [ \"OK\" ] }}"
    )
    assert schema.shapes[E + "S"].node_constraint.node_kind == "iri"
    tri = _tri(
        spark,
        [
            (E + "a", E + "v", "literal", "OK", None, None),
            ("_:b1", E + "v", "literal", "OK", None, None),
        ],
    )
    smap = f"<{E}a>@<{E}S>, _:b1@<{E}S>"
    out = {r["node"]: r["status"] for r in validate(tri, schema, shapemap=smap).collect()}
    assert out[E + "a"] == "conformant"
    assert out["_:b1"] == "nonconformant"


def test_node_constraint_pattern_gate(spark):
    # bare node-constraint shape validated DIRECTLY via shapemap: the
    # focus node's own IRI must match the pattern
    schema = parse_shexc(f"PREFIX ex: <{E}>\nex:T PATTERN \"^http://e/good\"")
    tri = _tri(
        spark,
        [
            (E + "good1", E + "p", "iri", E + "x", None, None),
            (E + "bad1", E + "p", "iri", E + "x", None, None),
        ],
    )
    smap = f"<{E}good1>@<{E}T>, <{E}bad1>@<{E}T>"
    out = {r["node"].rsplit("/", 1)[-1]: r["status"] for r in validate(tri, schema, shapemap=smap).collect()}
    assert out == {"good1": "conformant", "bad1": "nonconformant"}


def test_next_shape_label_not_eaten_as_datatype():
    # `ex:T IRI` followed directly by another shape declaration: the next
    # label must not be consumed as a datatype of T's node constraint
    schema = parse_shexc(
        f"PREFIX ex: <{E}>\nex:T IRI\nex:S {{ ex:v . }}"
    )
    assert schema.shapes[E + "T"].node_constraint.datatype is None
    assert E + "S" in schema.shapes


def test_shape_level_conjunct_ref(spark):
    """`ex:Child @ex:Base AND { … }` — the ShEx mixin pattern: focus must
    conform to Base AND satisfy the braced body."""
    from rdfshape_api_spark.plans import parse_shexc, validate

    schema = parse_shexc(
        f"PREFIX ex: <{E}>\n"
        "ex:Child @ex:Base AND { ex:age . }\n"
        "ex:Base { ex:name . }"
    )
    assert schema.shapes[E + "Child"].conjunct_refs == [E + "Base"]
    tri = _tri(
        spark,
        [
            (E + "a", E + "name", "literal", "Ann", None, None),
            (E + "a", E + "age", "literal", "9", None, None),
            (E + "b", E + "name", "literal", "Bob", None, None),  # no age
            (E + "c", E + "age", "literal", "7", None, None),     # no name
        ],
    )
    smap = ", ".join(f"<{E}{n}>@<{E}Child>" for n in "abc")
    out = {r["node"][-1]: r["status"] for r in validate(tri, schema, shapemap=smap).collect()}
    assert out == {"a": "conformant", "b": "nonconformant", "c": "nonconformant"}


def test_shape_alias_via_conjunct_ref(spark):
    """`ex:T @ex:Base` with no body: pure alias — conformance to T equals
    conformance to Base."""
    from rdfshape_api_spark.plans import parse_shexc, validate

    schema = parse_shexc(
        f"PREFIX ex: <{E}>\nex:T @ex:Base\nex:Base {{ ex:name . }}"
    )
    tri = _tri(
        spark,
        [
            (E + "a", E + "name", "literal", "Ann", None, None),
            (E + "b", E + "other", "literal", "x", None, None),
        ],
    )
    smap = f"<{E}a>@<{E}T>, <{E}b>@<{E}T>"
    out = {r["node"][-1]: r["status"] for r in validate(tri, schema, shapemap=smap).collect()}
    assert out == {"a": "conformant", "b": "nonconformant"}


def test_negated_shape_level_ref_rejected():
    import pytest

    from rdfshape_api_spark.plans import parse_shexc

    with pytest.raises(ValueError, match="negated shape-level"):
        parse_shexc(
            f"PREFIX ex: <{E}>\n"
            "ex:S NOT @ex:Base AND { ex:age . }\n"
            "ex:Base { ex:name . }"
        )


def test_value_level_ref_conjunction(spark):
    """`ex:v @ex:A AND @ex:B` — rewritten at parse to a synthetic conjunct
    shape; a value conforms iff it conforms to BOTH referenced shapes."""
    from rdfshape_api_spark.plans import parse_shexc, validate

    schema = parse_shexc(
        f"PREFIX ex: <{E}>\n"
        "ex:S { ex:v @ex:A AND @ex:B }\n"
        "ex:A { ex:name . }\n"
        "ex:B { ex:age . }"
    )
    tri = _tri(
        spark,
        [
            (E + "s1", E + "v", "iri", E + "both", None, None),
            (E + "both", E + "name", "literal", "N", None, None),
            (E + "both", E + "age", "literal", "5", None, None),
            (E + "s2", E + "v", "iri", E + "only_a", None, None),
            (E + "only_a", E + "name", "literal", "N", None, None),
            (E + "s3", E + "v", "iri", E + "neither", None, None),
            (E + "neither", E + "x", "literal", "?", None, None),
        ],
    )
    smap = ", ".join(f"<{E}s{n}>@<{E}S>" for n in "123")
    out = {r["node"][-1]: r["status"] for r in validate(tri, schema, shapemap=smap).collect()}
    assert out == {"1": "conformant", "2": "nonconformant", "3": "nonconformant"}


def test_shape_level_disjunct_refs(spark):
    """`ex:T @ex:A OR @ex:B` — ShapeOr of refs: conformance to T is
    membership in at least one referenced conformant set."""
    from rdfshape_api_spark.plans import parse_shexc, validate

    schema = parse_shexc(
        f"PREFIX ex: <{E}>\n"
        "ex:T @ex:A OR @ex:B\n"
        "ex:A { ex:name . }\n"
        "ex:B { ex:age . }"
    )
    assert schema.shapes[E + "T"].disjunct_refs == [E + "A", E + "B"]
    tri = _tri(
        spark,
        [
            (E + "n1", E + "name", "literal", "N", None, None),
            (E + "n2", E + "age", "literal", "7", None, None),
            (E + "n3", E + "other", "literal", "?", None, None),
        ],
    )
    smap = ", ".join(f"<{E}n{n}>@<{E}T>" for n in "123")
    out = {r["node"][-1]: r["status"] for r in validate(tri, schema, shapemap=smap).collect()}
    assert out == {"1": "conformant", "2": "conformant", "3": "nonconformant"}


def test_shape_level_mixed_or_accepted(spark):
    """r4: a mixed shape-level OR lifts to Shape.disjunct_refs with the
    value disjunct wrapped in a synthetic urn:shex:or:N shape (previously a
    clean reject)."""
    from rdfshape_api_spark.plans import parse_shexc

    schema = parse_shexc(
        f"PREFIX ex: <{E}>\nex:T @ex:A OR IRI\nex:A {{ ex:name . }}"
    )
    t = schema.shapes[E + "T"]
    assert t.disjunct_refs[0] == E + "A"
    syn = schema.shapes[t.disjunct_refs[1]]
    assert syn.node_constraint.node_kind == "iri"
