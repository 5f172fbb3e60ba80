"""Schema inference tests (SURVEY §2.6 DataExtract)."""

from __future__ import annotations

from rdfshape_api_spark.operators.infer_schema import (
    extract_schema,
    node_selector_focus,
)

EX = "http://example.org/"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def test_focus_selector(spark, triples_001):
    focus = node_selector_focus(triples_001, "{FOCUS a <" + EX + "Reading>}")
    n = focus.count()
    assert n > 0
    from pyspark.sql import functions as F

    expected = (
        triples_001.filter((F.col("pred") == RDF_TYPE) & (F.col("obj_value") == EX + "Reading"))
        .select("subj").distinct().count()
    )
    assert n == expected


def test_profile_and_shexc(spark, triples_001):
    profile, shapemap, text = extract_schema(
        triples_001, "{FOCUS a <" + EX + "Reading>}", shape_label="Inferred"
    )
    rows = {r["pred"]: r for r in profile.collect()}
    # every reading has exactly one rdf:type and one station arc
    assert rows[RDF_TYPE]["card_min"] == 1
    assert rows[EX + "station"]["card_max"] >= 1
    # temperatures: 1..3 per reading, all typed xsd:decimal
    t = rows[EX + "readingTemperature"]
    assert t["card_min"] >= 0 and t["card_max"] >= 1
    assert t["datatypes"] == ["http://www.w3.org/2001/XMLSchema#decimal"]
    # datetime can be absent (5% of readings) → min 0
    dt = rows[EX + "readingDatetime"]
    assert dt["card_min"] == 0
    # label is optional and lang-tagged
    assert rows[EX + "label"]["langs"] == ["en"]
    # ShExC rendering mentions the shape and the typed constraint
    assert "<Inferred>" in text
    assert "xsd" in text or "XMLSchema#decimal" in text
    # result shapemap: one association per focus node
    focus_n = node_selector_focus(triples_001, "{FOCUS a <" + EX + "Reading>}").count()
    assert shapemap.count() == focus_n
    assert shapemap.first()["shape"] == "Inferred"


def test_follow_on_profiles_referenced_nodes(spark, triples_001):
    # readings reference ex:hub via ex:station → hop-1 shape profiles hub
    profile, shapemap, text = extract_schema(
        triples_001, "{FOCUS a <" + EX + "Reading>}", shape_label="R", max_follow_on=1
    )
    hop_nodes = {r["node"] for r in shapemap.filter("shape = 'R_hop1'").collect()}
    assert EX + "hub" in hop_nodes
    # hub has no outgoing arcs in the fixture, so only the base shape renders
    assert text.startswith("<R>")


def test_fixed_node_selector(spark, triples_001):
    focus = node_selector_focus(triples_001, f"<{EX}shared0>")
    assert focus.collect()[0]["node"] == EX + "shared0"
