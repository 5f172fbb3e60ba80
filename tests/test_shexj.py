"""ShExJ frontend: the JSON ShEx syntax must mean exactly what the
equivalent ShExC means (one shared lowering pipeline — plans/shexj.py).

Reference parity: ``ShExFormat.availableFormats = List(ShExC, ShExJ)``
(``ShExFormat.scala:21-26``).
"""

from __future__ import annotations

import json

import pytest

from rdfshape_api_spark.plans import parse_shexc, validate
from rdfshape_api_spark.plans.shexj import parse_shexj, shexj_to_shexc

E = "http://e/"
XSD = "http://www.w3.org/2001/XMLSchema#"


def _schema(shapes, **extra):
    return json.dumps({"type": "Schema", "shapes": shapes, **extra})


def _decl(sid, expr):
    return {"type": "ShapeDecl", "id": sid, "shapeExpr": expr}


def _tc(pred, value_expr=None, **kw):
    tc = {"type": "TripleConstraint", "predicate": pred, **kw}
    if value_expr is not None:
        tc["valueExpr"] = value_expr
    return tc


def test_node_constraint_facets():
    j = _schema(
        [
            _decl(
                E + "S",
                {
                    "type": "Shape",
                    "expression": {
                        "type": "EachOf",
                        "expressions": [
                            _tc(E + "name", {
                                "type": "NodeConstraint",
                                "datatype": XSD + "string",
                                "minlength": 2,
                                "pattern": "^[A-Z]",
                            }),
                            _tc(E + "age", {
                                "type": "NodeConstraint",
                                "mininclusive": 0,
                                "maxexclusive": 150,
                            }, min=0, max=1),
                            _tc(E + "home", {"type": "NodeConstraint", "nodeKind": "iri"},
                                min=0, max=-1),
                            _tc(E + "code", {"type": "NodeConstraint", "length": 3},
                                min=1, max=2),
                        ],
                    },
                },
            )
        ]
    )
    c = (
        f"<{E}S> {{ <{E}name> <{XSD}string> MINLENGTH 2 PATTERN \"^[A-Z]\" ; "
        f"<{E}age> MININCLUSIVE 0 MAXEXCLUSIVE 150 ? ; "
        f"<{E}home> IRI * ; "
        f"<{E}code> MINLENGTH 3 MAXLENGTH 3 {{1,2}} }}"
    )
    assert parse_shexj(j) == parse_shexc(c)


def test_value_sets_and_stems():
    j = _schema(
        [
            _decl(E + "S", {
                "type": "Shape",
                "expression": _tc(E + "tag", {
                    "type": "NodeConstraint",
                    "values": [
                        E + "ok",
                        {"value": "plain"},
                        {"type": "Language", "languageTag": "en"},
                        {"type": "IriStem", "stem": E + "good/"},
                        {"type": "LiteralStem", "stem": "pre"},
                        {"type": "LanguageStem", "stem": "de"},
                        {
                            "type": "IriStemRange",
                            "stem": {"type": "Wildcard"},
                            "exclusions": [
                                E + "bad",
                                {"type": "IriStem", "stem": E + "evil/"},
                            ],
                        },
                    ],
                }, min=1, max=-1),
            })
        ]
    )
    c = (
        f'<{E}S> {{ <{E}tag> [ <{E}ok> "plain" @en <{E}good/>~ "pre"~ @de~ . '
        f"- <{E}bad> - <{E}evil/>~ ] + }}"
    )
    assert parse_shexj(j) == parse_shexc(c)


def test_closed_extra_inverse_oneof():
    j = _schema(
        [
            _decl(E + "S", {
                "type": "Shape",
                "closed": True,
                "extra": [E + "p"],
                "expression": {
                    "type": "OneOf",
                    "expressions": [
                        {
                            "type": "EachOf",
                            "expressions": [
                                _tc(E + "p", {"type": "NodeConstraint",
                                              "values": [E + "a"]}),
                                _tc(E + "q", None, inverse=True),
                            ],
                        },
                        _tc(E + "r", {"type": "NodeConstraint", "nodeKind": "literal"}),
                    ],
                },
            })
        ]
    )
    c = (
        f"<{E}S> CLOSED EXTRA <{E}p> {{ <{E}p> [ <{E}a> ] ; ^<{E}q> . "
        f"| <{E}r> LITERAL }}"
    )
    assert parse_shexj(j) == parse_shexc(c)


def test_refs_logic_and_start():
    j = _schema(
        [
            _decl(E + "A", {"type": "Shape",
                            "expression": _tc(E + "x", None)}),
            _decl(E + "B", {"type": "Shape",
                            "expression": _tc(E + "y", None)}),
            _decl(E + "S", {
                "type": "Shape",
                "expression": {
                    "type": "EachOf",
                    "expressions": [
                        _tc(E + "v", {"type": "ShapeOr",
                                      "shapeExprs": [E + "A", E + "B"]}),
                        _tc(E + "w", {
                            "type": "ShapeAnd",
                            "shapeExprs": [
                                {"type": "NodeConstraint", "nodeKind": "iri"},
                                {"type": "ShapeNot", "shapeExpr": {
                                    "type": "NodeConstraint",
                                    "values": [E + "bad"],
                                }},
                            ],
                        }, min=0, max=1),
                    ],
                },
            }),
            _decl(E + "Alias", E + "A"),
        ],
        start=E + "S",
    )
    c = (
        f"start = @<{E}S>\n"
        f"<{E}A> {{ <{E}x> . }}\n"
        f"<{E}B> {{ <{E}y> . }}\n"
        f"<{E}S> {{ <{E}v> @<{E}A> OR @<{E}B> ; "
        f"<{E}w> IRI AND NOT ([ <{E}bad> ]) ? }}\n"
        f"<{E}Alias> @<{E}A>"
    )
    assert parse_shexj(j) == parse_shexc(c)


def test_inline_anonymous_shape_hoists():
    j = _schema(
        [
            _decl(E + "S", {
                "type": "Shape",
                "expression": _tc(E + "v", {
                    "type": "Shape",
                    "expression": _tc(E + "inner", {
                        "type": "NodeConstraint", "datatype": XSD + "string"}),
                }),
            })
        ]
    )
    s = parse_shexj(j)
    sid = "urn:shexj:inline:0"
    assert s.shapes[E + "S"].constraints[0].ref_shape == sid
    assert s.shapes[sid].constraints[0].pred == E + "inner"


def test_inline_start_expression():
    j = _schema(
        [_decl(E + "A", {"type": "Shape", "expression": _tc(E + "x", None)})],
        start={"type": "Shape", "expression": _tc(E + "v", None)},
    )
    s = parse_shexj(j)
    assert s.start == "urn:shexj:start"
    assert s.shapes["urn:shexj:start"].constraints[0].pred == E + "v"


def test_shape_and_mixin_declaration():
    j = _schema(
        [
            _decl(E + "Base", {"type": "Shape", "expression": _tc(E + "x", None)}),
            _decl(E + "S", {
                "type": "ShapeAnd",
                "shapeExprs": [
                    E + "Base",
                    {"type": "Shape", "expression": _tc(E + "y", None)},
                ],
            }),
        ]
    )
    s = parse_shexj(j)
    assert s.shapes[E + "S"].conjunct_refs == [E + "Base"]
    assert s.shapes[E + "S"].constraints[0].pred == E + "y"


@pytest.mark.parametrize(
    "doc,msg",
    [
        ({"type": "Schema", "imports": [E + "other"], "shapes": []}, "import"),
        (
            {"type": "Schema", "shapes": [_decl(E + "S", {
                "type": "Shape",
                "expression": _tc(E + "p", {
                    "type": "NodeConstraint", "pattern": "x", "flags": "i"}),
            })]},
            "flags",
        ),
        (
            {"type": "Schema", "shapes": [_decl(E + "S", {
                "type": "Shape",
                "expression": _tc(E + "p", {
                    "type": "NodeConstraint", "totaldigits": 3}),
            })]},
            "totaldigits",
        ),
        (
            {"type": "Schema", "shapes": [_decl(E + "S", {
                "type": "Shape", "expression": "http://e/teRef"})]},
            "tripleExprRef",
        ),
        (
            {"type": "Schema", "shapes": [_decl(E + "S", {
                "type": "Shape",
                "expression": {"type": "EachOf", "expressions": [
                    _tc(E + "p", None),
                    {"type": "OneOf", "expressions": [_tc(E + "q", None)]},
                ]},
            })]},
            "OneOf nested",
        ),
        (
            {"type": "Schema", "shapes": [_decl(E + "S", {
                "type": "Shape",
                "expression": _tc(E + "p", {
                    "type": "NodeConstraint",
                    "values": [{"value": "v", "language": "en"}],
                }),
            })]},
            "language-tagged",
        ),
        (
            {"type": "Schema", "shapes": [_decl(E + "S", {
                "type": "Shape",
                "expression": _tc(E + "p", None, id=E + "lbl"),
            })]},
            "labeled",
        ),
    ],
)
def test_clean_rejects(doc, msg):
    with pytest.raises(ValueError, match=msg):
        parse_shexj(json.dumps(doc))


def test_printer_is_deterministic_text():
    j = {"type": "Schema", "shapes": [
        _decl(E + "S", {"type": "Shape", "expression": _tc(E + "p", None)})]}
    assert shexj_to_shexc(j) == shexj_to_shexc(json.dumps(j))


def test_validation_equivalence(spark):
    """End-to-end: the ShExJ schema validates identically to its ShExC twin."""
    j = _schema(
        [
            _decl(E + "Person", {
                "type": "Shape",
                "expression": {
                    "type": "EachOf",
                    "expressions": [
                        _tc(E + "name", {"type": "NodeConstraint",
                                         "datatype": XSD + "string"}),
                        _tc(E + "knows", E + "Person", min=0, max=-1),
                    ],
                },
            })
        ]
    )
    c = (
        f"<{E}Person> {{ <{E}name> <{XSD}string> ; "
        f"<{E}knows> @<{E}Person> * }}"
    )
    cols = (
        "doc_sha256 string, subj string, pred string, obj_kind string, "
        "obj_value string, obj_lang string, obj_datatype string"
    )
    rows = [
        ("d", E + "a", E + "name", "literal", "Ann", None, XSD + "string"),
        ("d", E + "a", E + "knows", "iri", E + "b", None, None),
        ("d", E + "b", E + "name", "literal", "Bob", None, XSD + "string"),
        ("d", E + "c", E + "knows", "iri", E + "a", None, None),
    ]
    tri = spark.createDataFrame(rows, cols)
    smap = ", ".join(f"<{E}{n}>@<{E}Person>" for n in "abc")
    got_j = {r["node"]: r["status"]
             for r in validate(tri, parse_shexj(j), shapemap=smap).collect()}
    got_c = {r["node"]: r["status"]
             for r in validate(tri, parse_shexc(c), shapemap=smap).collect()}
    assert got_j == got_c
    assert got_j[E + "a"] == "conformant" and got_j[E + "c"] == "nonconformant"


def test_json_shapemap_equivalent(spark):
    """JSON ShapeMap form ≡ compact form (ShapeMapFormat.scala:20-26)."""
    import json as _json

    from rdfshape_api_spark.plans.shapemap import parse_shapemap

    prefixes = {"ex": E}
    compact = parse_shapemap(f"{{FOCUS a ex:Person}}@ex:S, <{E}n1>@ex:T", prefixes)
    jtext = _json.dumps(
        [
            {"node": {"subject": "FOCUS", "predicate": "a",
                      "object": E + "Person"}, "shape": "ex:S"},
            {"node": f"<{E}n1>", "shape": E + "T", "status": "conformant"},
        ]
    )
    assert parse_shapemap(jtext, prefixes) == compact


def test_json_shapemap_rejects():
    import pytest as _pytest

    from rdfshape_api_spark.plans.shapemap import parse_shapemap_json

    with _pytest.raises(ValueError, match="negative"):
        parse_shapemap_json(
            '[{"node": "<http://e/n>", "shape": "<http://e/S>", '
            '"status": "nonconformant"}]',
            {},
        )
    with _pytest.raises(ValueError, match="subject-side FOCUS"):
        parse_shapemap_json(
            '[{"node": {"subject": "<http://e/s>", "predicate": "<http://e/p>", '
            '"object": "FOCUS"}, "shape": "<http://e/S>"}]',
            {},
        )
    with _pytest.raises(ValueError, match="bad JSON"):
        parse_shapemap_json("[oops", {})
