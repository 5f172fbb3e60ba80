"""ShEx value-set stems (`~`), wildcard (`.`), and exclusions (`- m`).

Reference surface: shexs value-set semantics behind
`SchemaService.scala:80-84` (IRIStem / LiteralStem / StemRange with
exclusions per the ShEx 2.1 spec §5.5).
"""

from __future__ import annotations

from rdfshape_api_spark.plans import parse_shexc, validate

E = "http://e/"


def _tri(spark, rows):
    cols = "doc_sha256 string, subj string, pred string, obj_kind string, obj_value string, obj_lang string, obj_datatype string"
    return spark.createDataFrame([("d", *r) for r in rows], cols)


def _run(spark, schema_text, rows, nodes):
    schema = parse_shexc(schema_text)
    tri = _tri(spark, rows)
    smap = ", ".join(f"<{E}{n}>@<{E}S>" for n in nodes)
    return {r["node"][-1]: r["status"] for r in validate(tri, schema, shapemap=smap).collect()}


def test_iri_stem(spark):
    out = _run(
        spark,
        f"PREFIX ex: <{E}>\nex:S {{ ex:v [ ex:good~ ] }}",
        [
            (E + "a", E + "v", "iri", E + "goodThing", None, None),
            (E + "b", E + "v", "iri", E + "bad", None, None),
            (E + "c", E + "v", "literal", E + "goodThing", None, None),
        ],
        "abc",
    )
    assert out == {"a": "conformant", "b": "nonconformant", "c": "nonconformant"}


def test_literal_stem(spark):
    out = _run(
        spark,
        f'PREFIX ex: <{E}>\nex:S {{ ex:v [ "ab"~ ] }}',
        [
            (E + "a", E + "v", "literal", "abc", None, None),
            (E + "b", E + "v", "literal", "ab", None, None),
            (E + "c", E + "v", "literal", "xabc", None, None),
        ],
        "abc",
    )
    assert out == {"a": "conformant", "b": "conformant", "c": "nonconformant"}


def test_wildcard_with_exclusions(spark):
    # `.` admits everything except the excluded stem/member
    out = _run(
        spark,
        f"PREFIX ex: <{E}>\nex:S {{ ex:v [ . - ex:bad~ ] }}",
        [
            (E + "a", E + "v", "iri", E + "fine", None, None),
            (E + "b", E + "v", "iri", E + "badThing", None, None),
            (E + "c", E + "v", "literal", "anything", None, None),
        ],
        "abc",
    )
    assert out == {"a": "conformant", "b": "nonconformant", "c": "conformant"}


def test_stem_with_exact_exclusion(spark):
    out = _run(
        spark,
        f"PREFIX ex: <{E}>\nex:S {{ ex:v [ ex:p~ - ex:pX ] }}",
        [
            (E + "a", E + "v", "iri", E + "pA", None, None),
            (E + "b", E + "v", "iri", E + "pX", None, None),
            (E + "c", E + "v", "iri", E + "q", None, None),
        ],
        "abc",
    )
    assert out == {"a": "conformant", "b": "nonconformant", "c": "nonconformant"}


def test_mixed_members_and_stems(spark):
    out = _run(
        spark,
        f'PREFIX ex: <{E}>\nex:S {{ ex:v [ ex:exact "lit" "st"~ ] }}',
        [
            (E + "a", E + "v", "iri", E + "exact", None, None),
            (E + "b", E + "v", "literal", "lit", None, None),
            (E + "c", E + "v", "literal", "stem-prefixed", None, None),
            (E + "d", E + "v", "iri", E + "other", None, None),
        ],
        "abcd",
    )
    assert out == {
        "a": "conformant",
        "b": "conformant",
        "c": "conformant",
        "d": "nonconformant",
    }


def test_shexc_roundtrip_stems():
    from rdfshape_api_spark.plans.convert import to_shexc

    src = f"PREFIX ex: <{E}>\nex:S {{ ex:v [ . ex:a \"l\"~ - ex:bad~ ] }}"
    schema = parse_shexc(src)
    tc = schema.shapes[E + "S"].constraints[0]
    assert tc.value_set_has_wildcard
    assert ("iri", E + "a") in tc.value_set
    assert ("literal_stem", "l") in tc.value_set
    assert tc.value_set_excl == [("iri_stem", E + "bad")]
    # render → parse is stable
    schema2 = parse_shexc(to_shexc(schema))
    tc2 = schema2.shapes[E + "S"].constraints[0]
    assert tc2.value_set_has_wildcard == tc.value_set_has_wildcard
    assert sorted(tc2.value_set) == sorted(tc.value_set)
    assert tc2.value_set_excl == tc.value_set_excl


def test_language_members(spark):
    out = _run(
        spark,
        f"PREFIX ex: <{E}>\nex:S {{ ex:v [ @en @fr ] }}",
        [
            (E + "a", E + "v", "literal", "hello", "en", None),
            (E + "b", E + "v", "literal", "salut", "fr", None),
            (E + "c", E + "v", "literal", "hallo", "de", None),
            (E + "d", E + "v", "literal", "plain", None, None),
            (E + "e", E + "v", "literal", "hi", "EN", None),  # case-insensitive
        ],
        "abcde",
    )
    assert out == {
        "a": "conformant",
        "b": "conformant",
        "c": "nonconformant",
        "d": "nonconformant",
        "e": "conformant",
    }


def test_language_stem(spark):
    out = _run(
        spark,
        f"PREFIX ex: <{E}>\nex:S {{ ex:v [ @en~ ] }}",
        [
            (E + "a", E + "v", "literal", "hi", "en", None),
            (E + "b", E + "v", "literal", "howdy", "en-US", None),
            (E + "c", E + "v", "literal", "enx", "enx", None),  # not a subtag
        ],
        "abc",
    )
    assert out == {"a": "conformant", "b": "conformant", "c": "nonconformant"}


def test_language_member_roundtrip():
    from rdfshape_api_spark.plans.convert import to_shexc

    src = f"PREFIX ex: <{E}>\nex:S {{ ex:v [ @en @fr~ ] }}"
    schema = parse_shexc(src)
    tc = schema.shapes[E + "S"].constraints[0]
    assert tc.value_set == [("lang", "en"), ("lang_stem", "fr")]
    schema2 = parse_shexc(to_shexc(schema))
    assert schema2.shapes[E + "S"].constraints[0].value_set == tc.value_set


def test_semantic_actions_and_annotations_ignored(spark):
    # semantic actions (%ext{...%}) and annotations (// pred value) carry
    # no validation semantics — parsed and dropped
    out = _run(
        spark,
        f"""PREFIX ex: <{E}>
        ex:S {{
          ex:v [ "GOOD" ] %js{{ return value.length > 2; %}}
             // ex:comment "checked by extension"@en ;
          ex:w . ? // ex:seeAlso ex:docs
        }}""",
        [
            (E + "a", E + "v", "literal", "GOOD", None, None),
            (E + "b", E + "v", "literal", "BAD", None, None),
        ],
        "ab",
    )
    assert out == {"a": "conformant", "b": "nonconformant"}


def test_start_shape(spark):
    from rdfshape_api_spark.plans.convert import to_shexc

    src = f"""PREFIX ex: <{E}>
    start = @ex:S
    ex:S {{ ex:v [ "OK" ] }}"""
    schema = parse_shexc(src)
    assert schema.start == E + "S"
    # shapemap `node@start` resolves to the declared start shape
    tri = _tri(
        spark,
        [
            (E + "a", E + "v", "literal", "OK", None, None),
            (E + "b", E + "v", "literal", "NO", None, None),
        ],
    )
    smap = f"<{E}a>@start, <{E}b>@start"
    out = {r["node"][-1]: r["status"] for r in validate(tri, schema, shapemap=smap).collect()}
    assert out == {"a": "conformant", "b": "nonconformant"}
    # renderer round-trips the start declaration
    assert parse_shexc(to_shexc(schema)).start == E + "S"
