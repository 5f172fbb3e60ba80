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


def parse_shapemap_json(text: str, prefixes: dict[str, str]) -> list[Association]:
    """The JSON ShapeMap syntax (reference parity:
    ``ShapeMapFormat.availableFormats = List(Compact, Json)``,
    ``ShapeMapFormat.scala:20-26``; JSON representation per the ShapeMap
    spec / shex.js): an array of association objects ``{"node": …,
    "shape": …}`` where ``node`` is an IRI / prefixed name / ``_:label``
    string, or a triple-pattern object ``{"subject": "FOCUS",
    "predicate": p, "object": o}`` (compact ``{FOCUS p o}``).  A
    ``status`` other than ``"conformant"`` (negative shapemaps) and
    object-side FOCUS patterns are outside this engine's subset and
    reject cleanly, the compact parser's convention."""
    import json

    try:
        doc = json.loads(text)
    except json.JSONDecodeError as e:
        raise ValueError(f"shapemap: bad JSON: {e}") from e
    if not isinstance(doc, list):
        raise ValueError("shapemap: JSON form must be an array of associations")
    assocs: list[Association] = []
    for entry in doc:
        if not isinstance(entry, dict) or "node" not in entry or "shape" not in entry:
            raise ValueError(
                f"shapemap: JSON association needs 'node' and 'shape': {entry!r}"
            )
        if entry.get("status", "conformant") != "conformant":
            raise ValueError(
                "shapemap: negative/other-status associations are unsupported"
            )
        shape = _expand(str(entry["shape"]), prefixes)
        node = entry["node"]
        if isinstance(node, str):
            assocs.append(Association("fixed", _expand(node, prefixes), None, None, shape))
            continue
        if not isinstance(node, dict):
            raise ValueError(f"shapemap: bad node selector {node!r}")
        subj = node.get("subject")
        if subj != "FOCUS":
            raise ValueError(
                "shapemap: only subject-side FOCUS triple patterns are "
                f"supported, got subject {subj!r}"
            )
        pred_t = str(node.get("predicate"))
        pred = RDF_TYPE if pred_t in ("a", "rdf:type") else _expand(pred_t, prefixes)
        assocs.append(
            Association("query", None, pred, _expand(str(node.get("object")), prefixes), shape)
        )
    if not assocs:
        raise ValueError("shapemap: no associations in the JSON array")
    return assocs


def parse_shapemap(text: str, prefixes: dict[str, str]) -> list[Association]:
    if text.lstrip().startswith("["):
        # '[' can't start a compact association — the JSON array form
        return parse_shapemap_json(text, prefixes)
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
