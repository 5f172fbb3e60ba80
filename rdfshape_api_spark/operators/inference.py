"""RDFS inference (SURVEY §2.8 I1).

Reference: ``applyInference`` appends a Jena inference model to the data —
self-admittedly unoptimized ("just appends the inferred model",
``MergedModels.scala:117-124``; engine list ``ApiDefinitions.scala:59-60``).

Spark design: the *schema-side* closure (subClassOf/subPropertyOf DAGs,
domain/range maps) is tiny relative to instance data, so it is computed with
a driver-side fixpoint on filtered scans, **broadcast**, and applied to the
instance triples in ONE pass — no iterative shuffles over the big table.
Entailed triples carry ``origin='inferred'``; asserted rows get
``origin='asserted'``.

Rules implemented (RDFS subset the reference's Jena RDFS reasoner applies
to typical data): rdfs2 (domain), rdfs3 (range), rdfs5/7 (subPropertyOf
transitivity + use), rdfs9/11 (subClassOf transitivity + type lift).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from rdfshape_api_spark.model import (
    KIND_IRI,
    RDF_TYPE,
    RDFS_DOMAIN,
    RDFS_RANGE,
    RDFS_SUBCLASSOF,
    RDFS_SUBPROPERTYOF,
)


def _transitive_pairs(edges: list[tuple[str, str]]) -> list[tuple[str, str]]:
    """Driver-side transitive closure of a small (schema-level) relation."""
    from collections import defaultdict

    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
    out = set()
    for start in list(adj):
        seen, stack = set(), [start]
        while stack:
            cur = stack.pop()
            for nxt in adj.get(cur, ()):
                if nxt not in seen:
                    seen.add(nxt)
                    stack.append(nxt)
        out.update((start, d) for d in seen)
    return sorted(out)


def rdfs_closure(df: DataFrame, spark=None) -> DataFrame:
    """Materialize RDFS-entailed triples; returns asserted+inferred union
    with an ``origin`` column. One big-table pass; schema broadcast."""
    spark = spark or df.sparkSession
    schema_rows = (
        df.filter(F.col("pred").isin(RDFS_SUBCLASSOF, RDFS_SUBPROPERTYOF, RDFS_DOMAIN, RDFS_RANGE))
        .select("pred", "subj", "obj_value")
        .collect()
    )
    subclass = _transitive_pairs(
        [(r["subj"], r["obj_value"]) for r in schema_rows if r["pred"] == RDFS_SUBCLASSOF]
    )
    subprop = _transitive_pairs(
        [(r["subj"], r["obj_value"]) for r in schema_rows if r["pred"] == RDFS_SUBPROPERTYOF]
    )
    domain = [(r["subj"], r["obj_value"]) for r in schema_rows if r["pred"] == RDFS_DOMAIN]
    rng = [(r["subj"], r["obj_value"]) for r in schema_rows if r["pred"] == RDFS_RANGE]

    asserted = df.withColumn("origin", F.lit("asserted"))
    parts = [asserted]
    base = ["repo", "path", "commit", "doc_sha256"] if "repo" in df.columns else ["doc_sha256"]

    def _mk(src: DataFrame, subj_col, pred_iri: str, obj_col) -> DataFrame:
        return src.select(
            *base,
            subj_col.alias("subj"),
            F.lit(pred_iri).alias("pred"),
            F.lit(KIND_IRI).alias("obj_kind"),
            obj_col.alias("obj_value"),
            F.lit(None).cast("string").alias("obj_lang"),
            F.lit(None).cast("string").alias("obj_datatype"),
            F.lit("inferred").alias("origin"),
        )

    if subclass:  # rdfs9: x a C, C ⊑ D ⇒ x a D (broadcast map join via CASE)
        sc_df = spark.createDataFrame(subclass, "c string, d string")
        typed = df.filter(F.col("pred") == RDF_TYPE)
        j = typed.join(F.broadcast(sc_df), typed["obj_value"] == sc_df["c"])
        parts.append(_mk(j, F.col("subj"), RDF_TYPE, F.col("d")))
    if subprop:  # rdfs7: x p y, p ⊑ q ⇒ x q y (keeps object kind/literal form)
        sp_df = spark.createDataFrame(subprop, "p string, q string")
        j = df.join(F.broadcast(sp_df), df["pred"] == sp_df["p"])
        parts.append(
            j.select(
                *base,
                "subj",
                F.col("q").alias("pred"),
                "obj_kind",
                "obj_value",
                "obj_lang",
                "obj_datatype",
                F.lit("inferred").alias("origin"),
            )
        )
    if domain:  # rdfs2: x p y, p domain C ⇒ x a C
        d_df = spark.createDataFrame(domain, "p string, c string")
        j = df.join(F.broadcast(d_df), df["pred"] == d_df["p"])
        parts.append(_mk(j, F.col("subj"), RDF_TYPE, F.col("c")))
    if rng:  # rdfs3: x p y (y non-literal), p range C ⇒ y a C
        r_df = spark.createDataFrame(rng, "p string, c string")
        j = df.filter(F.col("obj_kind") != "literal").join(
            F.broadcast(r_df), df["pred"] == r_df["p"]
        )
        parts.append(_mk(j, F.col("obj_value"), RDF_TYPE, F.col("c")))

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    key = [c for c in out.columns if c != "origin"]
    # asserted wins over inferred duplicates (min_by on origin: 'asserted' < 'inferred')
    return out.groupBy(*key).agg(F.min("origin").alias("origin"))


def apply_inference(df: DataFrame, engine: str = "NONE") -> DataFrame:
    """The reference's applyInference dispatch (NONE default,
    ApiDefaults.scala:60)."""
    eng = (engine or "NONE").upper()
    if eng == "NONE":
        return df
    if eng == "RDFS":
        return rdfs_closure(df)
    raise ValueError(f"inference engine {engine!r} not supported (NONE | RDFS)")
