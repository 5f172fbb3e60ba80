"""Schema extraction / inference (SURVEY §2.6, DataExtract).

Reference: ``DataExtract.dataExtract(data, nodeSelector, engine=ShEx,
format=ShExC, label, base)`` profiles the selected nodes' outgoing
predicates into a ShEx shape and returns a ``(node, inferredShape)``
shapemap (``modules/server/.../data/logic/operations/DataExtract.scala:107-167``;
inference itself in lib ``SchemaInfer.runInferSchema`` :133-139, options
:66-74 — ``inferTypePlainNode=true``, ``maxFollowOn=1``).

Spark mapping (SURVEY §2.4 A6): a two-level aggregation —
``groupBy(subj, pred).count()`` then ``groupBy(pred)`` collecting
min/max cardinality, observed object kinds, datatypes and languages —
produces a *shape profile* DataFrame; `to_shexc` renders it to ShExC text
on the driver (shape profiles are KB-sized, never data-sized).  `follow_on`
hops re-join referenced IRI objects back onto the triples table, mirroring
``InferOptions.maxFollowOn``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from rdfshape_api_spark.model import KIND_IRI, KIND_LITERAL, RDF_TYPE

XSD = "http://www.w3.org/2001/XMLSchema#"


def node_selector_focus(triples: DataFrame, selector: str) -> DataFrame:
    """`{FOCUS a <Cls>}`-style selector or a fixed node IRI → focus-node DF
    (NodeSelector.fromString usage at DataExtract.scala:128)."""
    sel = selector.strip()
    if sel.startswith("{") and sel.endswith("}"):
        inner = sel[1:-1].split()
        if len(inner) == 3 and inner[0].upper() == "FOCUS" and inner[1] == "a":
            cls = inner[2].strip("<>")
            return (
                triples.filter((F.col("pred") == RDF_TYPE) & (F.col("obj_value") == cls))
                .select(F.col("subj").alias("node"))
                .distinct()
            )
        raise ValueError(f"unsupported node selector {selector!r}")
    return triples.sparkSession.createDataFrame([(sel.strip("<>"),)], "node string")


def infer_shape_profile(triples: DataFrame, focus: DataFrame) -> DataFrame:
    """Per-predicate profile over the focus nodes: cardinality bounds and
    observed value kinds/datatypes.  min_count is 0 when some focus node
    lacks the predicate entirely (the group-by can't see absent rows, so we
    compare per-pred subject counts against the focus-set size)."""
    n_focus = focus.count()
    arcs = triples.join(F.broadcast(focus), triples["subj"] == focus["node"]).select(
        "subj", "pred", "obj_kind", "obj_value", "obj_lang", "obj_datatype"
    )
    per_subj = arcs.groupBy("subj", "pred").agg(F.count("*").alias("n"))
    card = per_subj.groupBy("pred").agg(
        F.min("n").alias("card_min_present"),
        F.max("n").cast("bigint").alias("card_max"),
        F.count("*").cast("bigint").alias("n_subjects"),
    )
    kinds = arcs.groupBy("pred").agg(
        F.sort_array(F.collect_set("obj_kind")).alias("obj_kinds"),
        F.sort_array(F.collect_set("obj_datatype")).alias("datatypes"),
        F.sort_array(F.collect_set("obj_lang")).alias("langs"),
        F.sort_array(F.collect_set(F.when(F.col("pred") == RDF_TYPE, F.col("obj_value")))).alias(
            "type_values"
        ),
    )
    return (
        card.join(kinds, "pred")
        .select(
            "pred",
            F.when(F.col("n_subjects") < F.lit(n_focus), F.lit(0))
            .otherwise(F.col("card_min_present"))
            .cast("bigint")
            .alias("card_min"),
            "card_max",
            "n_subjects",
            "obj_kinds",
            "datatypes",
            "langs",
            "type_values",
        )
    )


def _constraint_for(row) -> str:
    if row["pred"] == RDF_TYPE and row["type_values"]:
        vals = " ".join(f"<{v}>" for v in row["type_values"])
        return f"[{vals}]"
    kinds = set(row["obj_kinds"])
    dts = [d for d in row["datatypes"] if d]
    langs = [l for l in row["langs"] if l]
    if kinds == {KIND_IRI}:
        return "IRI"
    if kinds == {KIND_LITERAL}:
        if len(dts) == 1 and not langs:
            return f"<{dts[0]}>"
        if langs and not dts:
            return "Literal"
        return "Literal"
    return "."


def _card_suffix(mn: int, mx: int) -> str:
    if (mn, mx) == (1, 1):
        return ""
    if (mn, mx) == (0, 1):
        return " ?"
    if mn == 0:
        return " *"
    if mx >= mn and mx > 1 and mn == 1:
        return " +"
    return f" {{{mn},{mx}}}"


def to_shexc(profile_rows: list, shape_label: str = "InferredShape") -> str:
    """Render a collected shape profile to ShExC (driver-side; mirrors the
    reference's default target ShExC, DataService.scala:142-156)."""
    lines = [f"<{shape_label}> {{"]
    body = []
    for row in sorted(profile_rows, key=lambda r: r["pred"]):
        pred = "a" if row["pred"] == RDF_TYPE else f"<{row['pred']}>"
        body.append(
            f"  {pred} {_constraint_for(row)}"
            f"{_card_suffix(int(row['card_min']), int(row['card_max']))}"
        )
    lines.append(" ;\n".join(body))
    lines.append("}")
    return "\n".join(lines)


def referenced_nodes(triples: DataFrame, focus: DataFrame) -> DataFrame:
    """IRI objects referenced by the focus nodes' arcs (excluding
    rdf:type class IRIs) — the follow-on frontier of ``InferOptions``."""
    arcs = triples.join(F.broadcast(focus), triples["subj"] == focus["node"], "left_semi")
    return (
        arcs.filter((F.col("obj_kind") == KIND_IRI) & (F.col("pred") != RDF_TYPE))
        .select(F.col("obj_value").alias("node"))
        .distinct()
    )


def extract_schema(
    triples: DataFrame,
    selector: str,
    shape_label: str = "InferredShape",
    max_follow_on: int = 0,
) -> tuple[DataFrame, DataFrame, str]:
    """The full DataExtract contract: returns (profile DF, result shapemap
    DF `(node, shape)`, ShExC text).

    ``max_follow_on`` profiles referenced nodes up to that many hops away
    into additional shapes (``InferOptions.maxFollowOn`` — 1 at the API,
    3 for the Wikidata extract, DataExtract.scala:70 /
    WikibaseSchemaExtract.scala:78); each hop's shape is named
    ``{shape_label}_hop{i}``."""
    focus = node_selector_focus(triples, selector)
    profile = infer_shape_profile(triples, focus)
    shapemap = focus.select("node", F.lit(shape_label).alias("shape"))
    texts = [to_shexc(profile.collect(), shape_label)]

    seen = focus
    frontier = focus
    for hop in range(1, max_follow_on + 1):
        frontier = referenced_nodes(triples, frontier).join(seen, "node", "left_anti")
        if frontier.isEmpty():
            break
        hop_label = f"{shape_label}_hop{hop}"
        hop_profile = infer_shape_profile(triples, frontier)
        hop_rows = hop_profile.collect()
        if hop_rows:
            texts.append(to_shexc(hop_rows, hop_label))
        shapemap = shapemap.unionByName(
            frontier.select("node", F.lit(hop_label).alias("shape"))
        )
        seen = seen.unionByName(frontier).distinct()
    return profile, shapemap, "\n\n".join(texts)
