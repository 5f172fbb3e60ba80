"""Thin API-surface parity: SPARQL JSON bindings, streaming config tree,
Wikibase compositions (SURVEY §2.9 Q1 JSON contract, §2.10 config, §2.12)."""

from __future__ import annotations

from rdfshape_api_spark.fixtures.generator import SHEX_SENSOR
from rdfshape_api_spark.plans import parse_shexc
from rdfshape_api_spark.plans.sparql import sparql_select_json
from rdfshape_api_spark.streaming import StreamConfig

EX = "http://example.org/"


def test_sparql_json_bindings(spark, triples_001):
    res = sparql_select_json(
        triples_001,
        f'PREFIX ex: <{EX}>\nSELECT ?s ?st WHERE {{ ?s ex:status ?st . }} LIMIT 5',
    )
    assert res["head"]["vars"] == ["s", "st"]
    assert len(res["results"]["bindings"]) == 5
    b = res["results"]["bindings"][0]
    assert b["s"]["type"] == "uri"
    assert b["st"]["type"] == "literal"


def test_stream_config_from_reference_json():
    cfg = StreamConfig.from_reference_json(
        {
            "validator": {
                "schema": {"content": SHEX_SENSOR, "engine": "shex", "format": "ShExC"},
                "triggerMode": {"type": "ShapeMap", "shape-map": "{FOCUS a ex:Reading}@ex:ValidReading"},
                "haltOnInvalid": True,
            },
            "extractor": {"data": {"format": "turtle", "inference": "NONE"}},
            "stream": {"server": "kafka.local", "port": 9092, "topic": "rdf", "groupId": "g1"},
        }
    )
    assert cfg.shex_schema == SHEX_SENSOR
    assert cfg.shex_shapemap.endswith("@ex:ValidReading")
    assert cfg.halt_on_invalid and not cfg.halt_on_errored
    assert cfg.stream_info["topic"] == "rdf"
    assert cfg.shacl_schema is None


def test_wikibase_compositions(spark, triples_001):
    from pyspark.sql import functions as F

    from rdfshape_api_spark.operators.wikibase import (
        wikibase_schema_extract,
        wikibase_schema_validate,
    )

    entity = (
        triples_001.filter(F.col("pred") == EX + "status")
        .select("subj").first()["subj"]
    )
    profile, shapemap, text = wikibase_schema_extract(triples_001, entity)
    assert profile.count() > 0
    assert shapemap.filter(F.col("node") == entity).count() == 1

    verdict = wikibase_schema_validate(
        triples_001, entity, parse_shexc(SHEX_SENSOR), EX + "ValidReading"
    )
    rows = verdict.collect()
    assert rows and all(r["node"] == entity for r in rows)
