"""Deterministic synthetic fixtures (FIXTURES.md): RDF docs table + goldens."""

from rdfshape_api_spark.fixtures.generator import (  # noqa: F401
    ensure_fixtures,
    generate,
    sf_tag_from_dir,
)
