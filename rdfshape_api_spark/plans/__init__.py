"""Compiled validation plans: schema text → constraint IR → DataFrame DAG.

The reference delegates validation to shexs/shaclex behind one abstraction
(``Schemas.fromString`` → ``schema.validate(rdf, trigger)``,
SchemaSimple.scala:61-76 / SchemaValidate.scala:97-108).  Here the same
surface is a **compiler**: both ShEx and SHACL normalize to the constraint
records of ``model.CONSTRAINT_SCHEMA``, and one evaluator emits the verdict
DataFrame — compile, don't interpret (SURVEY §2.7).
"""

from rdfshape_api_spark.plans.shex import parse_shexc  # noqa: F401
from rdfshape_api_spark.plans.shacl import parse_shacl  # noqa: F401
from rdfshape_api_spark.plans.shapemap import parse_shapemap, resolve_focus  # noqa: F401
from rdfshape_api_spark.plans.validate import validate  # noqa: F401
from rdfshape_api_spark.plans.sparql import sparql_select  # noqa: F401
from rdfshape_api_spark.plans.convert import (  # noqa: F401
    schema_info,
    shacl_to_shex,
    shapemap_info,
    shex_to_shacl,
    to_shacl_turtle,
    to_shexc,
)
