"""W3C conformance sample (fixtures/w3c_sample.py): the engine's verdicts
must match the official suites' expected outcomes on every transcribed
case.  Reference parity: the Scala reference inherits the official W3C
ShEx suite through shexs (build.sbt:346-349; SURVEY §5.4) and the SHACL
data-shapes suite through shaclex — this sample is the same correctness
authority driven through THIS engine's distributed path (one
validate_batch over the unioned corpus).

Deliberate exclusions are listed in the module docstring
(fixtures/w3c_sample.py): semantic actions, IMPORT, base-resolution
cases, non-stratifiable negation, ShExJ-syntax cases, entailment regimes.
"""

import pytest


def test_case_table_well_formed():
    from rdfshape_api_spark.fixtures.w3c_sample import cases

    cs = cases()
    assert len(cs) >= 50
    kinds = {c["kind"] for c in cs}
    assert kinds == {"shex", "shacl"}
    # both polarity classes present in both suites
    for kind in kinds:
        assert any(c["expected"] for c in cs if c["kind"] == kind)
        assert any(not c["expected"] for c in cs if c["kind"] == kind)
    # per-test namespacing: no IRI sharing between cases
    for c in cs:
        assert f"http://w3c.example/{c['name']}#" in c["data"]


def test_w3c_sample_verdicts(spark):
    from rdfshape_api_spark.fixtures.w3c_sample import cases, run_sample

    rows = run_sample(spark).collect()
    assert len(rows) == len(cases())
    wrong = [
        (r["test"], r["status"], r["expected"])
        for r in rows
        if (r["status"] == "conformant") != r["expected"]
    ]
    assert not wrong, f"verdict mismatches vs W3C-expected: {wrong}"


@pytest.mark.parametrize("kind", ["shex", "shacl"])
def test_w3c_sample_covers_constraint_families(kind):
    """The sample is only evidence if it spans the constraint surface:
    assert the big families each contribute at least one case."""
    from rdfshape_api_spark.fixtures.w3c_sample import cases

    text = "\n".join(c["schema"] for c in cases() if c["kind"] == kind)
    if kind == "shex":
        for marker in ["CLOSED", "EXTRA", "MININCLUSIVE", "MINLENGTH", "@:S",
                       "IRI", "BNODE", "LITERAL", " OR ", " AND ", "NOT ", "~", "|"]:
            assert marker in text, f"no ShEx case exercises {marker!r}"
    else:
        for marker in ["sh:minCount", "sh:maxCount", "sh:datatype", "sh:class",
                       "sh:nodeKind", "sh:minInclusive", "sh:pattern", "sh:in",
                       "sh:hasValue", "sh:and", "sh:or", "sh:not", "sh:closed",
                       "sh:equals", "sh:disjoint", "sh:lessThan", "sh:uniqueLang",
                       "sh:node ", "sh:qualifiedValueShape", "sh:targetNode",
                       "sh:targetSubjectsOf", "sh:targetObjectsOf"]:
            assert marker in text, f"no SHACL case exercises {marker!r}"
