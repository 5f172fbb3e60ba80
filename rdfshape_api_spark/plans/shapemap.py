"""ShapeMap parsing + focus-node resolution (SURVEY §2.5 J1/J2).

Compact ShapeMap subset per the reference's trigger surface
(``TriggerShapeMap.getValidationTrigger``, TriggerShapeMap.scala:52-54;
node selectors via ``NodeSelector.fromString``, DataExtract.scala:128):

* fixed association   ``ex:node@ex:Shape`` / ``<iri>@<iri>``
* query association   ``{FOCUS a ex:C}@ex:Shape`` and
  ``{FOCUS ex:p ex:o}@ex:Shape``

Multiple associations separated by ',' or newlines.  Prefixed names are
resolved against the schema's prefix map (the reference pulls prefix maps
from data+schema in the trigger decoder, TriggerShapeMap.scala:61-110).

Focus resolution is relational: a fixed node becomes a filtered projection
of the triples DataFrame; a query selector becomes filter+project — both
produce ``(doc_sha256, node, shape_id)`` rows, the validation work-list.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from rdfshape_api_spark.model import RDF_TYPE


@dataclass
class Association:
    kind: str  # "fixed" | "query"
    node: str | None  # fixed node IRI (or _:label)
    query_pred: str | None  # query selector predicate ('a' → rdf:type)
    query_obj: str | None  # query selector object IRI
    shape: str  # shape IRI


_ASSOC = re.compile(r"\s*(\{[^}]*\}|<[^>]*>|[^@,\s]+)\s*@\s*(<[^>]*>|\S+?)\s*(?:,|$)", re.M)
_QUERY = re.compile(r"\{\s*FOCUS\s+(\S+)\s+(\S+)\s*\}")


def _expand(term: str, prefixes: dict[str, str]) -> str:
    if term.startswith("<") and term.endswith(">"):
        return term[1:-1]
    if term.startswith("_:"):
        return term
    if term.lower() == "start":
        # `node@start`: the schema's start shape — resolved against
        # CompiledSchema.start by the validator
        return "@start"
    pref, sep, local = term.partition(":")
    if sep and pref in prefixes:
        return prefixes[pref] + local
    if re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://", term):
        return term
    raise ValueError(f"shapemap: cannot resolve term {term!r}")


def parse_shapemap(text: str, prefixes: dict[str, str]) -> list[Association]:
    assocs: list[Association] = []
    for m in _ASSOC.finditer(text):
        sel, shape_t = m.group(1), m.group(2)
        shape = _expand(shape_t, prefixes)
        q = _QUERY.match(sel)
        if q:
            pred_t, obj_t = q.group(1), q.group(2)
            pred = RDF_TYPE if pred_t == "a" else _expand(pred_t, prefixes)
            assocs.append(Association("query", None, pred, _expand(obj_t, prefixes), shape))
        else:
            assocs.append(Association("fixed", _expand(sel, prefixes), None, None, shape))
    if not assocs:
        raise ValueError(f"shapemap: no associations parsed from {text!r}")
    return assocs


def resolve_focus(triples: DataFrame, assocs: list[Association]) -> DataFrame:
    """Associations → focus work-list ``(doc_sha256, node, shape_id)``.

    Fixed nodes resolve to the documents where the node occurs as subject
    (per-document validation scope); query selectors are filter+project on
    the triples DataFrame — both stay fully relational, no driver loops
    over data.
    """
    parts: list[DataFrame] = []
    for a in assocs:
        if a.kind == "fixed":
            parts.append(
                triples.filter(F.col("subj") == a.node)
                .select("doc_sha256", F.col("subj").alias("node"))
                .distinct()
                .withColumn("shape_id", F.lit(a.shape))
            )
        else:
            cond = F.col("pred") == a.query_pred
            cond = cond & (F.col("obj_value") == a.query_obj)
            parts.append(
                triples.filter(cond)
                .select("doc_sha256", F.col("subj").alias("node"))
                .distinct()
                .withColumn("shape_id", F.lit(a.shape))
            )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def resolve_targets(triples: DataFrame, shape) -> DataFrame:
    """SHACL target resolution (SURVEY §2.5 J2,
    TriggerTargetDeclarations.scala:24-25): shapes select their own focus
    nodes. Returns ``(doc_sha256, node)``."""
    parts: list[DataFrame] = []
    if shape.target_class:
        parts.append(
            triples.filter(
                (F.col("pred") == RDF_TYPE) & F.col("obj_value").isin(*shape.target_class)
            ).select("doc_sha256", F.col("subj").alias("node"))
        )
    if shape.target_node:
        parts.append(
            triples.filter(F.col("subj").isin(*shape.target_node)).select(
                "doc_sha256", F.col("subj").alias("node")
            )
        )
    if shape.target_subjects_of:
        parts.append(
            triples.filter(F.col("pred").isin(*shape.target_subjects_of)).select(
                "doc_sha256", F.col("subj").alias("node")
            )
        )
    if shape.target_objects_of:
        parts.append(
            triples.filter(
                F.col("pred").isin(*shape.target_objects_of)
                & (F.col("obj_kind") != "literal")
            ).select("doc_sha256", F.col("obj_value").alias("node"))
        )
    if not parts:
        raise ValueError(f"shape {shape.shape_id} declares no targets")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.distinct()
