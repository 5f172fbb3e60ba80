"""Wikibase-style operation compositions (SURVEY §2.12).

The reference's Wikibase suite (~2.1k LoC of HTTP orchestration,
``modules/server/.../wikibase/...``) reduces to two compositions over
operators this engine already has:

* ``WikibaseSchemaExtract`` (``WikibaseSchemaExtract.scala:50-115``) =
  fetch entity Turtle + S1 extraction + §2.6 schema inference with
  ``maxFollowOn=3`` (``:78``);
* ``WikibaseSchemaValidate`` (``WikibaseSchemaValidate.scala:60-121``) =
  fetch + §2.7 validation with a fixed-node shapemap.

The fetch step is external HTTP (out of scope — at scale entities come
from the docs table); these wrappers take the already-extracted triples
DataFrame and run the same compositions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from rdfshape_api_spark.operators.infer_schema import extract_schema
from rdfshape_api_spark.plans import validate
from rdfshape_api_spark.plans.ir import CompiledSchema

WIKIBASE_MAX_FOLLOW_ON = 3  # WikibaseSchemaExtract.scala:78


def wikibase_schema_extract(
    triples: DataFrame, entity_iri: str, shape_label: str | None = None
):
    """Entity → inferred ShEx schema, following referenced entities 3 hops
    (the Wikidata InferOptions profile)."""
    label = shape_label or entity_iri.rsplit("/", 1)[-1] + "Shape"
    return extract_schema(
        triples, f"<{entity_iri}>", shape_label=label,
        max_follow_on=WIKIBASE_MAX_FOLLOW_ON,
    )


def wikibase_schema_validate(
    triples: DataFrame, entity_iri: str, schema: CompiledSchema, shape_id: str
) -> DataFrame:
    """Validate one entity against one shape — the fixed-node shapemap
    composition of WikibaseSchemaValidate."""
    return validate(triples, schema, shapemap=f"<{entity_iri}>@<{shape_id}>")
