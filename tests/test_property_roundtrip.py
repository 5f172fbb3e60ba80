"""Property-based parser round-trips (SURVEY §5: random small graphs →
parse(serialize(g)) == g). Pure-Python — no Spark session needed."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from rdfshape_api_spark.sources.parsers import parse_ntriples

XSD = "http://www.w3.org/2001/XMLSchema#"

_iri_local = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"), max_codepoint=0x2FF),
    min_size=1,
    max_size=12,
)
_iris = _iri_local.map(lambda s: f"http://example.org/{s}")
# bnode labels: spec PN_CHARS is roughly ASCII alnum + a few ranges — stay
# in the portable subset (the N-Triples grammar is stricter than _:\S+)
_bnodes = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789",
    min_size=1,
    max_size=10,
).map(lambda s: f"_:b{s}")
# literal text incl. the characters the escaper must handle
_lit_text = st.text(
    alphabet=st.one_of(
        st.characters(whitelist_categories=("Ll", "Lu", "Nd", "Zs"), max_codepoint=0x2FF),
        st.sampled_from(['"', "\\", "\n", "\t", "\r", "é", "λ", "中"]),
    ),
    max_size=24,
)
_langs = st.sampled_from(["en", "es", "de", "fr-be"])


def _nt_escape(s: str) -> str:
    return (
        s.replace("\\", "\\\\")
        .replace('"', '\\"')
        .replace("\n", "\\n")
        .replace("\r", "\\r")
        .replace("\t", "\\t")
    )


_objects = st.one_of(
    _iris.map(lambda v: ("iri", v, None, None)),
    _bnodes.map(lambda v: ("bnode", v, None, None)),
    _lit_text.map(lambda v: ("literal", v, None, None)),
    st.tuples(_lit_text, _langs).map(lambda t: ("literal", t[0], t[1], None)),
    st.tuples(_lit_text, st.sampled_from([XSD + "string", XSD + "dateTime"])).map(
        lambda t: ("literal", t[0], None, t[1])
    ),
)

_triples = st.lists(
    st.tuples(st.one_of(_iris, _bnodes), _iris, _objects), min_size=0, max_size=12
)


def _render(triples) -> str:
    lines = []
    for subj, pred, (kind, val, lang, dt) in triples:
        s = subj if subj.startswith("_:") else f"<{subj}>"
        if kind == "iri":
            o = f"<{val}>"
        elif kind == "bnode":
            o = val
        else:
            o = f'"{_nt_escape(val)}"'
            if lang:
                o += f"@{lang}"
            elif dt:
                o += f"^^<{dt}>"
        lines.append(f"{s} <{pred}> {o} .")
    return "\n".join(lines) + ("\n" if lines else "")


@settings(max_examples=200, deadline=None)
@given(_triples)
def test_ntriples_roundtrip(triples):
    parsed = parse_ntriples(_render(triples))
    expected = [
        (subj, pred, kind, val, lang, dt)
        for subj, pred, (kind, val, lang, dt) in triples
    ]
    assert parsed == expected


@settings(max_examples=100, deadline=None)
@given(_triples)
def test_turtle_parser_accepts_ntriples(triples):
    """N-Triples is a syntactic subset of Turtle — the Turtle parser must
    agree with the N-Triples parser on it."""
    from rdfshape_api_spark.sources.parsers import parse_turtle

    text = _render(triples)
    # None-safe sort key: tuples may mix None and str in the lang/datatype
    # slots, and Python refuses None < str.
    key = lambda t: tuple("" if x is None else str(x) for x in t)
    assert sorted(parse_turtle(text), key=key) == sorted(parse_ntriples(text), key=key)
