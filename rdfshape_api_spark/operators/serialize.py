"""Sinks / serialization (SURVEY §2.2 K1/K2).

Reference: ``DataConvert.dataConvert`` re-serializes a model to any
RdfFormat (``modules/server/.../data/logic/operations/DataConvert.scala:66-127``)
and builds JSON/DOT visual graphs (:83-120).  Spark mapping:

* **N-Triples emitter** — pure columnar ``concat`` (the round-trip format;
  feeds conversion tests and the K1 contract);
* **Turtle emitter** — groupBy(subj) + one Arrow batch stage for
  pretty-printing (presentation, not hot path);
* **JSON adjacency export** (K2) — ``groupBy(subj).agg(collect_list(...))``
  → ``toJSON``; DOT/SVG rendering is presentation-only and out of scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from rdfshape_api_spark.model import KIND_BNODE, KIND_IRI, KIND_LITERAL


def _nt_escape(col):
    c = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    c = F.replace(c, F.lit('"'), F.lit('\\"'))
    c = F.replace(c, F.lit("\n"), F.lit("\\n"))
    c = F.replace(c, F.lit("\t"), F.lit("\\t"))
    return F.replace(c, F.lit("\r"), F.lit("\\r"))


def nt_term_obj() -> F.Column:
    v = F.col("obj_value")
    lit = F.concat(F.lit('"'), _nt_escape(v), F.lit('"'))
    lit = F.when(
        F.col("obj_lang").isNotNull(), F.concat(lit, F.lit("@"), F.col("obj_lang"))
    ).when(
        F.col("obj_datatype").isNotNull(),
        F.concat(lit, F.lit("^^<"), F.col("obj_datatype"), F.lit(">")),
    ).otherwise(lit)
    return (
        F.when(F.col("obj_kind") == KIND_IRI, F.concat(F.lit("<"), v, F.lit(">")))
        .when(F.col("obj_kind") == KIND_BNODE,
              F.when(v.startswith("_:"), v).otherwise(F.concat(F.lit("<"), v, F.lit(">"))))
        .otherwise(lit)
    )


def to_ntriples(df: DataFrame) -> DataFrame:
    """One N-Triples line per triple — fully columnar (no Python).
    Skolemized bnodes serialize as their skolem IRIs (deterministic)."""
    subj_term = F.when(
        F.col("subj").startswith("_:"), F.col("subj")
    ).otherwise(F.concat(F.lit("<"), F.col("subj"), F.lit(">")))
    return df.select(
        F.concat_ws(
            " ",
            subj_term,
            F.concat(F.lit("<"), F.col("pred"), F.lit(">")),
            nt_term_obj(),
            F.lit("."),
        ).alias("line")
    )


def write_ntriples(df: DataFrame, path: str, partitions: int | None = None) -> None:
    out = to_ntriples(df)
    if partitions:
        out = out.repartition(partitions)
    out.write.mode("overwrite").text(path)


def to_json_graph(df: DataFrame) -> DataFrame:
    """K2 JSON adjacency export: one row per subject with its arcs."""
    return (
        df.groupBy("subj")
        .agg(
            F.collect_list(
                F.struct(
                    F.col("pred"),
                    F.col("obj_kind"),
                    F.col("obj_value"),
                    F.col("obj_lang"),
                    F.col("obj_datatype"),
                )
            ).alias("arcs")
        )
    )


def to_turtle_per_doc(df: DataFrame) -> DataFrame:
    """Turtle pretty-printer: per (doc, subj) grouped rendering.

    Columnar assembly: predicate-object groups via two-level aggregation,
    final string concat with array functions — no Python stage needed for
    this simple (prefix-free, absolute-IRI) profile.
    """
    obj_term = nt_term_obj()
    po = df.groupBy("doc_sha256", "subj", "pred").agg(
        F.array_join(F.sort_array(F.collect_list(obj_term)), ", ").alias("objs")
    )
    stmts = po.groupBy("doc_sha256", "subj").agg(
        F.array_join(
            F.sort_array(F.collect_list(F.concat(F.lit("<"), F.col("pred"), F.lit("> "), F.col("objs")))),
            " ;\n    ",
        ).alias("body")
    )
    subj_term = F.when(F.col("subj").startswith("_:"), F.col("subj")).otherwise(
        F.concat(F.lit("<"), F.col("subj"), F.lit(">"))
    )
    return stmts.select(
        "doc_sha256",
        F.concat(subj_term, F.lit(" "), F.col("body"), F.lit(" .")).alias("turtle"),
    )


def to_nquads(df: DataFrame) -> DataFrame:
    """One N-Quads line per triple, graph label = the per-document graph
    ``urn:doc:<doc_sha256>`` (the same naming the SPARQL ``GRAPH``
    extension exposes) — fully columnar, like :func:`to_ntriples`.
    Reference parity: N-Quads is an output RdfFormat of DataConvert
    (``RdfFormat.scala:18-29``, ``DataConvert.scala:66-127``); the
    reference's merged model drops per-source graph labels, so emitting
    the per-document provenance graph is the engine's strictly-richer
    variant."""
    subj_term = F.when(
        F.col("subj").startswith("_:"), F.col("subj")
    ).otherwise(F.concat(F.lit("<"), F.col("subj"), F.lit(">")))
    return df.select(
        F.concat_ws(
            " ",
            subj_term,
            F.concat(F.lit("<"), F.col("pred"), F.lit(">")),
            nt_term_obj(),
            F.concat(F.lit("<urn:doc:"), F.col("doc_sha256"), F.lit(">")),
            F.lit("."),
        ).alias("line")
    )
