"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG-construction query; ``queries()``
exposes one entry per implemented operator (SURVEY.md §2 + the
training-data ops); ``oracle_sql()`` gives the DuckDB twin for every
SQL-expressible operator.

RDF operators run over the deterministic fixture docs table
(FIXTURES.md; generated idempotently under ``fixtures/rdf_sf*``) — golden
triples/verdicts are computed by construction at generation time, so the
oracle side reads the golden parquet while the Spark side runs the real
extract→canonicalize→validate pipeline. Text/dedup/similarity/events
operators run over the driver's own tables with genuinely independent
SQL oracles.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from rdfshape_api_spark.fixtures.generator import (
    FIXTURES_ROOT,
    SHACL_SENSOR,
    SHAPEMAP_QUERY,
    SHEX_SENSOR,
    ensure_fixtures,
    sf_tag_from_dir,
)

# fixtures must exist before the driver's DuckDB oracle runs (idempotent, fast)
ensure_fixtures("sf0.001")
_SF001 = ensure_fixtures("sf0.01")

from rdfshape_api_spark.fixtures.social import (
    SHAPEMAP_PERSON,
    SHEX_PERSON,
    ensure_social,
)

ensure_social("sf0.001")
_SOC001 = ensure_social("sf0.01")

from rdfshape_api_spark.fixtures.catalog import (
    SHAPEMAP_ITEM,
    SHEX_ITEM,
    ensure_catalog,
)

ensure_catalog("sf0.001")
_CAT001 = ensure_catalog("sf0.01")

from rdfshape_api_spark.fixtures.webdocs import ensure_webdocs

ensure_webdocs("sf0.001")
_WEB001 = ensure_webdocs("sf0.01")

EX = "http://example.org/"
_ORACLE_TRIPLES = _SF001["triples"]
_ORACLE_VERDICTS = _SF001["verdicts"]
_ORACLE_DOCS = _SF001["docs"]
_SOC_TRIPLES = _SOC001["triples"]
_SOC_VERDICTS = _SOC001["verdicts"]
_CAT_TRIPLES = _CAT001["triples"]
_CAT_VERDICTS = _CAT001["verdicts"]
_WEB_TRIPLES = _WEB001["triples"]

_triples_cache: dict[str, DataFrame] = {}
_social_cache: dict[str, DataFrame] = {}
_catalog_cache: dict[str, DataFrame] = {}


def _catalog_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rdfshape_api_spark.fixtures.generator import sf_tag_from_dir as _tagof
    from rdfshape_api_spark.operators.canonicalize import canonicalize, dedup_triples
    from rdfshape_api_spark.sources.extract import extract_triples

    tag = _tagof(sf_dir)
    if tag not in _catalog_cache:
        paths = ensure_catalog(tag)
        docs = spark.read.parquet(paths["docs"])
        tri = dedup_triples(canonicalize(extract_triples(docs)), scope_doc=True)
        _catalog_cache[tag] = tri.persist()
    return _catalog_cache[tag]


def _social_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rdfshape_api_spark.fixtures.generator import sf_tag_from_dir as _tagof
    from rdfshape_api_spark.operators.canonicalize import canonicalize, dedup_triples
    from rdfshape_api_spark.sources.extract import extract_triples

    tag = _tagof(sf_dir)
    if tag not in _social_cache:
        paths = ensure_social(tag)
        docs = spark.read.parquet(paths["docs"])
        tri = dedup_triples(canonicalize(extract_triples(docs)), scope_doc=True)
        _social_cache[tag] = tri.persist()
    return _social_cache[tag]


def _rdf_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical deduped triples for the fixture tier matching sf_dir
    (cached per tier — several queries share the extraction)."""
    from rdfshape_api_spark.operators.canonicalize import canonicalize, dedup_triples
    from rdfshape_api_spark.sources.extract import extract_triples

    tag = sf_tag_from_dir(sf_dir)
    if tag not in _triples_cache:
        paths = ensure_fixtures(tag)
        docs = spark.read.parquet(paths["docs"])
        tri = dedup_triples(canonicalize(extract_triples(docs)), scope_doc=True)
        _triples_cache[tag] = tri.persist()
    return _triples_cache[tag]


def _rdf_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    paths = ensure_fixtures(sf_tag_from_dir(sf_dir))
    return spark.read.parquet(paths["docs"])


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full KG-construction slice on sf0.001 — extract →
    canonicalize → ShEx-validate; returns the verdict DataFrame."""
    from rdfshape_api_spark.plans import parse_shexc, validate

    tri = _rdf_triples(spark, "sf0.001")
    schema = parse_shexc(SHEX_SENSOR)
    return validate(tri, schema, shapemap=SHAPEMAP_QUERY, shape_label="shex_sensor").select(
        "doc_sha256", "node", "shape_id", "status"
    )


# ---------------------------------------------------------------------------
# query registry
# ---------------------------------------------------------------------------

def _q_rdf_extract(spark, sf_dir):
    return _rdf_triples(spark, sf_dir).select(
        "doc_sha256", "subj", "pred", "obj_kind", "obj_value", "obj_lang", "obj_datatype"
    ).distinct()


def _q_incremental_merge(spark, sf_dir):
    """Incremental construction (operators/incremental.py): build the store
    from STALE versions of 1/8 of the line-oriented docs (extra marker
    triple, zeroed commit), then MERGE the true versions as a delta.  The
    merged store must equal the full extraction — the golden-triples
    oracle — which fails if retraction leaks stale triples OR the delta
    append misses rows.  Reference has no incremental mode (stateless per
    request, DataSingle.scala:78-93); this is the 10^12-file north-rule
    path: never re-extract the corpus for a delta of commits."""
    from rdfshape_api_spark.operators.incremental import incremental_merge
    from rdfshape_api_spark.operators.canonicalize import canonicalize, dedup_triples
    from rdfshape_api_spark.sources.extract import extract_triples

    docs = _rdf_docs(spark, sf_dir)
    is_delta = (F.pmod(F.xxhash64("path"), F.lit(8)) == 0) & F.lower(
        F.col("lang")
    ).isin("ntriples", "nt", "turtle", "ttl")
    delta = docs.filter(is_delta)
    stale = (
        delta.withColumn(
            "content",
            F.concat(
                F.lit('<http://stale.example/f> <http://stale.example/p> "stale" .\n'),
                F.col("content"),
            ),
        )
        .withColumn("commit", F.lit("0" * 40))
        .withColumn("content_sha256", F.sha2(F.col("content"), 256))
    )
    base = docs.filter(~is_delta).unionByName(stale)
    store = dedup_triples(canonicalize(extract_triples(base)), scope_doc=True)
    return incremental_merge(store, delta).select(
        "doc_sha256", "subj", "pred", "obj_kind", "obj_value", "obj_lang", "obj_datatype"
    ).distinct()


def _q_incremental_verdicts(spark, sf_dir):
    """Incremental verdict-store maintenance: verdicts built over the
    STALE base (same split as rdf_incremental_merge) must, after the
    delta merge re-validates only the delta docs, equal the golden
    verdict table exactly — the doc-scoped-validation correctness
    argument in operators/incremental.py."""
    from rdfshape_api_spark.operators.canonicalize import canonicalize, dedup_triples
    from rdfshape_api_spark.operators.incremental import incremental_merge_verdicts
    from rdfshape_api_spark.plans import parse_shacl, parse_shexc
    from rdfshape_api_spark.plans.validate import validate_batch
    from rdfshape_api_spark.sources.extract import extract_triples

    docs = _rdf_docs(spark, sf_dir)
    is_delta = (F.pmod(F.xxhash64("path"), F.lit(8)) == 0) & F.lower(
        F.col("lang")
    ).isin("ntriples", "nt", "turtle", "ttl")
    delta = docs.filter(is_delta)
    stale = (
        delta.withColumn(
            "content",
            F.concat(
                F.lit('<http://stale.example/f> <http://stale.example/p> "stale" .\n'),
                F.col("content"),
            ),
        )
        .withColumn("commit", F.lit("0" * 40))
        .withColumn("content_sha256", F.sha2(F.col("content"), 256))
    )
    base_tri = dedup_triples(
        canonicalize(extract_triples(docs.filter(~is_delta).unionByName(stale))),
        scope_doc=True,
    )
    jobs = [
        (parse_shexc(SHEX_SENSOR), SHAPEMAP_QUERY, "shex_sensor"),
        (parse_shacl(SHACL_SENSOR), None, "shacl_sensor"),
    ]
    base_v = validate_batch(base_tri, jobs).join(
        base_tri.select("doc_sha256", "repo", "path").distinct(), on="doc_sha256"
    )
    merged = incremental_merge_verdicts(base_v, delta, jobs)
    return merged.select("doc_sha256", "node", "shape_id", "status").distinct()


def _q_validate_shex(spark, sf_dir):
    from rdfshape_api_spark.plans import parse_shexc, validate

    tri = _rdf_triples(spark, sf_dir)
    return validate(tri, parse_shexc(SHEX_SENSOR), shapemap=SHAPEMAP_QUERY).select(
        "doc_sha256", "node", "status"
    )


def _q_validate_batch(spark, sf_dir):
    """Single-pass multi-schema validation (the pipeline's stage-3 path)."""
    from rdfshape_api_spark.plans import parse_shacl, parse_shexc
    from rdfshape_api_spark.plans.validate import validate_batch

    tri = _rdf_triples(spark, sf_dir)
    jobs = [
        (parse_shexc(SHEX_SENSOR), SHAPEMAP_QUERY, "shex_sensor"),
        (parse_shacl(SHACL_SENSOR), None, "shacl_sensor"),
    ]
    return validate_batch(tri, jobs).select("doc_sha256", "node", "shape_id", "status")


def _q_validate_shacl(spark, sf_dir):
    from rdfshape_api_spark.plans import parse_shacl, validate

    tri = _rdf_triples(spark, sf_dir)
    return validate(tri, parse_shacl(SHACL_SENSOR)).select("doc_sha256", "node", "status")


def _q_w3c_sample(spark, sf_dir):
    """W3C ShEx/SHACL conformance sample: ~93 cases transcribed from the
    official shexTest / data-shapes manifests (fixtures/w3c_sample.py),
    validated in ONE validate_batch pass over the unioned corpus.
    sf-independent by design — the corpus IS the suite sample.  The
    oracle is the manifests' expected verdicts, so a hash match means
    the engine agrees with the W3C-expected outcome case by case (the
    reference inherits the same authority via shexs/shaclex,
    build.sbt:346-349; SURVEY §5.4)."""
    from rdfshape_api_spark.fixtures.w3c_sample import run_sample

    return run_sample(spark).select("test", "status")


def _q_validation_report(spark, sf_dir):
    """SHACL ValidationReport graph (spec §3) rendered as triples — the
    response shape the reference's validate endpoints return (shaclex
    report behind SchemaService.scala:80-84).  Messages excluded: the
    engine's reason strings are not part of the golden contract; the
    structural report (conforms, results, focus/shape/severity) is."""
    from rdfshape_api_spark.operators.serialize import validation_report_triples
    from rdfshape_api_spark.plans import parse_shacl, validate

    tri = _rdf_triples(spark, sf_dir)
    v = validate(tri, parse_shacl(SHACL_SENSOR))
    return validation_report_triples(v, include_messages=False)


def _q_subjects(spark, sf_dir):
    from rdfshape_api_spark.operators.algebra import subjects

    return subjects(_rdf_triples(spark, sf_dir))


def _q_predicates(spark, sf_dir):
    from rdfshape_api_spark.operators.algebra import predicates

    return predicates(_rdf_triples(spark, sf_dir))


def _q_iris(spark, sf_dir):
    from rdfshape_api_spark.operators.algebra import iris

    return iris(_rdf_triples(spark, sf_dir))


def _q_triples_with_predicate(spark, sf_dir):
    from rdfshape_api_spark.operators.algebra import triples_with_predicate

    return triples_with_predicate(_rdf_triples(spark, sf_dir), EX + "status").select(
        "doc_sha256", "subj", "obj_value"
    )


def _q_data_info(spark, sf_dir):
    from rdfshape_api_spark.operators.algebra import data_info_per_doc

    return data_info_per_doc(_rdf_triples(spark, sf_dir)).select(
        "doc_sha256",
        F.col("n_statements").cast("bigint").alias("n_statements"),
        F.col("n_distinct_predicates").cast("bigint").alias("n_distinct_predicates"),
    )


def _q_cardinalities(spark, sf_dir):
    from rdfshape_api_spark.operators.algebra import cardinalities

    return cardinalities(_rdf_triples(spark, sf_dir))


def _q_outgoing(spark, sf_dir):
    return (
        _rdf_triples(spark, sf_dir)
        .filter(F.col("subj") == EX + "shared0")
        .select("pred", "obj_value")
        .distinct()
    )


def _q_type_instances(spark, sf_dir):
    from rdfshape_api_spark.model import RDF_TYPE

    return (
        _rdf_triples(spark, sf_dir)
        .filter((F.col("pred") == RDF_TYPE) & (F.col("obj_value") == EX + "Reading"))
        .select("doc_sha256", "subj")
        .distinct()
    )


def _q_error_count(spark, sf_dir):
    from rdfshape_api_spark.sources.extract import extract_triples_raw

    docs = _rdf_docs(spark, sf_dir)
    raw = extract_triples_raw(docs)
    return raw.filter(F.col("error").isNotNull()).agg(
        F.count("*").cast("bigint").alias("n_error_docs")
    )


def _q_prefix_map(spark, sf_dir):
    from rdfshape_api_spark.sources.extract import extract_prefixes, merged_prefix_map

    return merged_prefix_map(extract_prefixes(_rdf_docs(spark, sf_dir)))


def _q_shex2shacl_validate(spark, sf_dir):
    """K3 EXCEEDS-reference direction: ShEx → SHACL Turtle → reparse →
    validate (shapemap trigger).  The converted schema must reproduce the
    golden ShEx verdicts exactly (oracle = expected_verdicts shex_sensor).
    Reference refuses this direction (SchemaConvert.scala:183-186)."""
    from rdfshape_api_spark.plans import parse_shacl, parse_shexc, validate
    from rdfshape_api_spark.plans.convert import shex_to_shacl, to_shacl_turtle

    converted = parse_shacl(to_shacl_turtle(shex_to_shacl(parse_shexc(SHEX_SENSOR))))
    tri = _rdf_triples(spark, sf_dir)
    return validate(tri, converted, shapemap=SHAPEMAP_QUERY).select(
        "doc_sha256", "node", "status"
    )


def _q_shapemap_resolve(spark, sf_dir):
    """A4/J1 ShapeMapInfo surface (ShapeMapInfo.scala:34-56 + the trigger
    decoder TriggerShapeMap.scala:52-54): parse a compact multi-association
    shapemap mixing query selectors ({FOCUS a C}, {FOCUS p o}) with fixed
    nodes (prefixed and <iri> forms), then resolve the focus work-list
    relationally against the canonical triples — filter+project per
    association, no driver loop over data."""
    from rdfshape_api_spark.plans.shapemap import parse_shapemap, resolve_focus

    smap = (
        "{FOCUS a ex:Reading}@ex:ValidReading, "
        "{FOCUS ex:station ex:hub}@ex:Stationed, "
        "ex:shared0@ex:SharedShape, "
        "<http://example.org/shared1>@<http://example.org/SharedShape>"
    )
    assocs = parse_shapemap(smap, {"ex": EX})
    return resolve_focus(_rdf_triples(spark, sf_dir), assocs)


def _nt_render_kind():
    """obj_kind normalized to its RENDER-equivalence class: nt_term_obj
    serializes a bnode-kind value that does not start with "_:" (e.g. a
    skolem IRI) identically to an iri-kind value, so the narrow dedup must
    collapse those or it under-dedups vs the old line-level distinct."""
    return F.when(
        (F.col("obj_kind") == "bnode") & ~F.col("obj_value").startswith("_:"),
        F.lit("iri"),
    ).otherwise(F.col("obj_kind"))


def _q_ntriples(spark, sf_dir):
    """K1 N-Triples emitter.  Narrow-then-serialize (r5): the global
    dedup runs on the six ~40-byte term columns BEFORE concat_ws, not on
    fully-serialized ~200-byte lines — same output set (term→line
    serialization is injective over the kind-normalized columns),
    ~40% less shuffle width."""
    from rdfshape_api_spark.operators.serialize import to_ntriples

    tri = _rdf_triples(spark, sf_dir).select(
        "subj", "pred", _nt_render_kind().alias("obj_kind"),
        "obj_value", "obj_lang", "obj_datatype"
    ).distinct()
    return to_ntriples(tri)


def _q_nquads(spark, sf_dir):
    """K1 N-Quads emitter: graph label = per-document urn:doc:<sha>.
    Narrow-then-serialize like _q_ntriples (dedup keys include the doc)."""
    from rdfshape_api_spark.operators.serialize import to_nquads

    tri = _rdf_triples(spark, sf_dir).select(
        "doc_sha256", "subj", "pred", _nt_render_kind().alias("obj_kind"),
        "obj_value", "obj_lang", "obj_datatype"
    ).distinct()
    return to_nquads(tri)


def _q_has_pred_subj(spark, sf_dir):
    """P4 vectorized: hasPredicateWithSubject for ex:label over every
    subject (9843 of ~17.8k subjects carry a label — the boolean varies)."""
    from rdfshape_api_spark.operators.algebra import has_predicate_table

    return has_predicate_table(_rdf_triples(spark, sf_dir), EX + "label")


def _q_check_datatype(spark, sf_dir):
    """P5 vectorized: checkDatatype over two claims — readingTemperature
    vs xsd:decimal (valid) and label vs xsd:decimal (wrong datatype) — so
    the verdict column varies."""
    from rdfshape_api_spark.operators.algebra import check_datatype_table

    tri = _rdf_triples(spark, sf_dir)
    xsd_dec = "http://www.w3.org/2001/XMLSchema#decimal"
    return check_datatype_table(tri, EX + "readingTemperature", xsd_dec).unionByName(
        check_datatype_table(tri, EX + "label", xsd_dec)
    ).distinct()


def _q_graph_fp(spark, sf_dir):
    """P9 at corpus scale: bnode-blind canonical graph fingerprints
    (one groupBy render + one count; exact isomorphic() settles the tiny
    candidate groups)."""
    from rdfshape_api_spark.operators.algebra import graph_fingerprints

    return graph_fingerprints(_rdf_triples(spark, sf_dir))


def _q_trig(spark, sf_dir):
    """K1 TriG emitter: one <urn:doc:sha> { … } graph block per document
    (RdfFormat.scala:18-29 lists TriG as a DataConvert output)."""
    from rdfshape_api_spark.operators.serialize import to_trig

    return to_trig(_rdf_triples(spark, sf_dir))


def _roundtrip_q(spark, sf_dir, fn_name: str, text_col: str, lang: str):
    """K1 round-trip entries: raw-extract the fixture docs, serialize each
    document with the given emitter, re-parse the serialized text with this
    package's own parser (original doc_sha256 threaded through so
    skolemization lands identically), canonicalize + per-doc dedup — the
    result must hash-equal the canonical triples parquet (the oracle).
    Proves emitter AND parser jointly lossless (SURVEY §5's
    parse(serialize(g)) == g property, driver-checked)."""
    from pyspark.sql import functions as F

    from rdfshape_api_spark.operators import serialize as ser
    from rdfshape_api_spark.operators.canonicalize import canonicalize, dedup_triples
    from rdfshape_api_spark.sources.extract import extract_triples

    raw = extract_triples(_rdf_docs(spark, sf_dir))
    redocs = getattr(ser, fn_name)(raw).select(
        F.lit("roundtrip").alias("repo"),
        F.col("doc_sha256").alias("path"),
        F.lit("c0").alias("commit"),
        "doc_sha256",  # ORIGINAL sha — with_doc_sha preserves an existing column
        F.lit(lang).alias("lang"),
        F.col(text_col).alias("content"),
    )
    return dedup_triples(canonicalize(extract_triples(redocs)), scope_doc=True).select(
        "doc_sha256", "subj", "pred", "obj_kind", "obj_value", "obj_lang", "obj_datatype"
    )


def _q_rdfxml_roundtrip(spark, sf_dir):
    """K1 RDF/XML emitter, checked by round-trip through parse_rdfxml."""
    return _roundtrip_q(spark, sf_dir, "to_rdfxml_per_doc", "xml", "rdfxml")


def _q_jsonld_roundtrip(spark, sf_dir):
    """K1 JSON-LD (expanded form) emitter, round-trip via parse_jsonld."""
    return _roundtrip_q(spark, sf_dir, "to_jsonld_per_doc", "jsonld", "jsonld")


def _q_rdfjson_roundtrip(spark, sf_dir):
    """K1 RDF/JSON (Talis) emitter, round-trip via parse_rdfjson."""
    return _roundtrip_q(spark, sf_dir, "to_rdfjson_per_doc", "rdfjson", "rdfjson")


def _q_pagerank(spark, sf_dir):
    """Integerized 10-iteration PageRank over the merged entity graph
    (operators/algebra.pagerank) — fixed-point arithmetic makes the
    fixpoint bit-identical to the unrolled SQL twin."""
    from rdfshape_api_spark.operators.algebra import pagerank

    return pagerank(_rdf_triples(spark, sf_dir), iterations=10)


# left-biased prefix list for DOT labels — same entries the P8 prefix-map
# union exposes (rdf_prefix_map): 'sensor' aliases the 'ex' IRI, so 'ex'
# wins every compaction, which the oracle macro mirrors by omitting it.
_DOT_PREFIXES = [
    ("ex", EX),
    ("sensor", EX),
    ("xsd", "http://www.w3.org/2001/XMLSchema#"),
]


def _q_dot(spark, sf_dir):
    """Data→DOT conversion (DataConvert's Dot target via RDF2SGraph,
    DataConvert.scala:83-120): per-document DOT body statements —
    content-addressed node declarations + labeled edges, fully columnar."""
    from rdfshape_api_spark.operators.serialize import to_dot

    return to_dot(_rdf_triples(spark, sf_dir), _DOT_PREFIXES)


def _q_skolem_count(spark, sf_dir):
    return _rdf_triples(spark, sf_dir).agg(
        F.count_distinct(
            F.when(F.col("subj").startswith("urn:skolem:"), F.col("subj"))
        ).cast("bigint").alias("n_skolem_subjects")
    )


def _q_hub_degree(spark, sf_dir):
    from rdfshape_api_spark.operators.canonicalize import entity_degree

    return entity_degree(_rdf_triples(spark, sf_dir)).filter(
        F.col("entity") == EX + "hub"
    ).select("entity", F.col("degree").cast("bigint").alias("degree"))


def _q_social_extract(spark, sf_dir):
    return _social_triples(spark, sf_dir).select(
        "doc_sha256", "subj", "pred", "obj_kind", "obj_value", "obj_lang", "obj_datatype"
    ).distinct()


def _q_entity_match(spark, sf_dir):
    """Rule-based ER candidate generation (propose_identity_edges): for a
    deterministic 1/4 of persons, a twin entity (`<iri>#alt`) sharing the
    person's email is synthesized; entities sharing an email value are
    proposed as identity edges (star per value group, max_group guard).
    Each twin must pair with its original — plus any organically shared
    emails in the fixture."""
    from rdfshape_api_spark.operators.canonicalize import propose_identity_edges

    email = EX + "email"
    tri = _social_triples(spark, sf_dir)
    rows = tri.filter(F.col("pred") == email)
    twins = rows.filter(
        F.substring(F.md5(F.col("subj")), 1, 1).isin("0", "4", "8", "c")
    ).withColumn("subj", F.concat(F.col("subj"), F.lit("#alt")))
    return propose_identity_edges(tri.unionByName(twins), [email])


def _q_social_validate(spark, sf_dir):
    """OneOf + recursive shape references under the golden gate."""
    from rdfshape_api_spark.plans import parse_shexc, validate

    tri = _social_triples(spark, sf_dir)
    return validate(
        tri, parse_shexc(SHEX_PERSON), shapemap=SHAPEMAP_PERSON, shape_label="shex_person"
    ).select("doc_sha256", "node", "status")


# The SAME schema in ShExJ, the JSON ShEx syntax (reference parity:
# `ShExFormat.availableFormats = List(ShExC, ShExJ)`, ShExFormat.scala:21-26)
# — hand-written AST, NOT printed from SHEX_PERSON, so the entry proves the
# two syntaxes reach identical verdicts through plans/shexj.py's printer +
# the shared lowering pipeline.  Oracle: the same golden verdicts as
# social_validate_person.
_SHEXJ_TC = lambda pred, **kw: {  # noqa: E731 — local AST shorthand
    "type": "TripleConstraint",
    "predicate": EX + pred,
    **kw,
}
SHEXJ_PERSON = {
    "type": "Schema",
    "shapes": [
        {
            "type": "ShapeDecl",
            "id": EX + "PersonShape",
            "shapeExpr": {
                "type": "Shape",
                "expression": {
                    "type": "OneOf",
                    "expressions": [
                        {
                            "type": "EachOf",
                            "expressions": [
                                _SHEXJ_TC("name"),
                                _SHEXJ_TC("knows", valueExpr=EX + "PersonShape",
                                          min=0, max=-1),
                                _SHEXJ_TC("email"),
                                _SHEXJ_TC("verified", valueExpr={
                                    "type": "NodeConstraint",
                                    "values": [{"value": "true"}],
                                }),
                            ],
                        },
                        {
                            "type": "EachOf",
                            "expressions": [
                                _SHEXJ_TC("name"),
                                _SHEXJ_TC("knows", valueExpr=EX + "PersonShape",
                                          min=0, max=-1),
                                _SHEXJ_TC("phone"),
                                _SHEXJ_TC("country"),
                            ],
                        },
                    ],
                },
            },
        }
    ],
}


def _q_social_shexj(spark, sf_dir):
    from rdfshape_api_spark.plans import validate
    from rdfshape_api_spark.plans.shexj import parse_shexj

    tri = _social_triples(spark, sf_dir)
    # ShExJ documents carry absolute IRIs only (no prefix map), so the
    # shapemap spells them out too
    return validate(
        tri,
        parse_shexj(SHEXJ_PERSON),
        shapemap=f"{{FOCUS a <{EX}Person>}}@<{EX}PersonShape>",
        shape_label="shex_person",
    ).select("doc_sha256", "node", "status")


# ShEx disjunction of shape references (`@<A> OR @<B>` inside a value
# expression — reference surface: shexs ShapeOr over ShapeRefs, SURVEY
# §2.7): every person someone knows must be reachable as an email-contact
# or a phone-contact person.  Per-disjunct conformance columns are
# broadcast-joined into the neighbourhood scan (plans/validate._ref_reqs).
SHEX_KNOWS_TYPED = f"""\
PREFIX ex: <{EX}>

ex:KnowsTyped {{
  ex:knows @ex:EmailPerson OR @ex:PhonePerson *
}}
ex:EmailPerson {{ ex:email . }}
ex:PhonePerson {{ ex:phone . }}
"""


def _q_social_or_refs(spark, sf_dir):
    from rdfshape_api_spark.plans import parse_shexc, validate

    tri = _social_triples(spark, sf_dir)
    return validate(
        tri,
        parse_shexc(SHEX_KNOWS_TYPED),
        shapemap="{FOCUS a ex:Person}@ex:KnowsTyped",
    ).select("doc_sha256", "node", "status")


# ShEx shape refs TWO OR-levels deep (r3's clean reject, lifted in r4):
# the value-level OR's @ex:Reachable disjunct references a shape that is
# ITSELF a mixed shape-level OR — `@ex:Emailed OR BNODE` normalizes at
# parse time to Shape.disjunct_refs with the BNODE disjunct wrapped in a
# synthetic urn:shex:or:N node-constraint shape.
SHEX_NESTED_OR_SOCIAL = """\
PREFIX ex: <http://example.org/>
ex:CircleShape { ex:knows [ ex:nobody ] OR @ex:Reachable * ; ex:name . }
ex:Reachable @ex:Emailed OR BNODE
ex:Emailed { ex:email . }
"""


def _q_social_nested_or(spark, sf_dir):
    from rdfshape_api_spark.plans import parse_shexc, validate

    tri = _social_triples(spark, sf_dir)
    return validate(
        tri,
        parse_shexc(SHEX_NESTED_OR_SOCIAL),
        shapemap="{FOCUS a <http://example.org/Person>}@<http://example.org/CircleShape>",
    ).select("doc_sha256", "node", "status")


# ShEx shape ref inside a mixed-polarity value conjunction (r3's clean
# reject, lifted in r4): `IRI AND NOT (@ex:Verified OR BNODE)` lowers to a
# conjuncts carrier whose negated disjunct carries the ref — the evaluator
# attaches a conformance column per ref-carrying node of the value tree
# (validate._walk_value_nodes), so the complement is the column's negation.
SHEX_CONJ_NOT_REF = """\
PREFIX ex: <http://example.org/>
ex:Verified { ex:verified [ "true" ] }
ex:TrustCircle { ex:knows (IRI AND NOT (@ex:Verified OR BNODE)) * ; ex:name . }
"""


def _q_social_conj_not_ref(spark, sf_dir):
    from rdfshape_api_spark.plans import parse_shexc, validate

    tri = _social_triples(spark, sf_dir)
    return validate(
        tri,
        parse_shexc(SHEX_CONJ_NOT_REF),
        shapemap="{FOCUS a ex:Person}@ex:TrustCircle",
    ).select("doc_sha256", "node", "status")


def _q_sparql_graph(spark, sf_dir):
    """SPARQL GRAPH over per-document graphs (engine extension; the
    reference's surface is the merged model, MergedModels.scala:182-191):
    every document is a named graph `urn:doc:<doc_sha256>`; the inner BGP
    matches within one document and ?g binds the graph name."""
    from rdfshape_api_spark.plans.sparql import sparql_select

    tri = _rdf_triples(spark, sf_dir)
    q = (
        f"PREFIX ex: <{EX}>\n"
        'SELECT ?g ?s WHERE { GRAPH ?g { ?s ex:status "BROKEN" . } }'
    )
    return sparql_select(tri, q)


def _q_sparql_graph_enum(spark, sf_dir):
    """`GRAPH ?g {}` (§13.3): the empty group matches every named graph
    with the empty solution, enumerating the per-document graph names."""
    from rdfshape_api_spark.plans.sparql import sparql_select

    tri = _rdf_triples(spark, sf_dir)
    return sparql_select(tri, "SELECT ?g WHERE { GRAPH ?g { } }")


def _q_sparql_construct_limit(spark, sf_dir):
    """CONSTRUCT with trailing ORDER BY/LIMIT (ADVICE r3 medium: solution
    modifiers on non-SELECT forms now apply to the solution sequence
    before template instantiation)."""
    from rdfshape_api_spark.plans.sparql import sparql_construct

    tri = _rdf_triples(spark, sf_dir)
    q = (
        f"PREFIX ex: <{EX}>\n"
        'CONSTRUCT { ?s ex:flagged "BROKEN" . } '
        'WHERE { ?s ex:status "BROKEN" . } ORDER BY ?s LIMIT 100'
    )
    return sparql_construct(tri, q)


# Parenthesized ShEx negation over a group containing a shape reference
# (`NOT (@<A> OR [ … ])` — round-4 lift of the conformance-set-complement
# reject): every known node must be NEITHER an email-contact person NOR
# the ex:nobody sentinel.  The evaluator negates the OR of the disjunct
# value predicate and the per-disjunct ref-conformance column.
SHEX_PAREN_NOT = f"""\
PREFIX ex: <{EX}>

ex:NoEmailCircle {{
  ex:knows NOT (@ex:EmailPerson OR [ ex:nobody ]) *
}}
ex:EmailPerson {{ ex:email . }}
"""


SHEX_MIXED_AND = f"""\
PREFIX ex: <{EX}>

ex:NameShape {{
  ex:name (PATTERN "^Person" AND NOT ([ "Person 1"~ ] OR MINLENGTH 13)) ?
}}
"""


def _q_social_mixed_and(spark, sf_dir):
    """Round-4 lift: mixed-polarity value conjunction (`PATTERN AND NOT
    (stem OR MINLENGTH)`) — the `conjuncts` carrier end-to-end."""
    from rdfshape_api_spark.plans import parse_shexc, validate

    tri = _social_triples(spark, sf_dir)
    return validate(
        tri,
        parse_shexc(SHEX_MIXED_AND),
        shapemap="{FOCUS a ex:Person}@ex:NameShape",
    ).select("doc_sha256", "node", "status")


def _q_social_paren_not(spark, sf_dir):
    from rdfshape_api_spark.plans import parse_shexc, validate

    tri = _social_triples(spark, sf_dir)
    return validate(
        tri,
        parse_shexc(SHEX_PAREN_NOT),
        shapemap="{FOCUS a ex:Person}@ex:NoEmailCircle",
    ).select("doc_sha256", "node", "status")


def _q_sparql_graph_optional(spark, sf_dir):
    """GRAPH inside OPTIONAL (round-4 lift): subjects with a BROKEN status
    anywhere in the merged model, optionally extended with the named graph
    (document) in which they carry an ex:label."""
    from rdfshape_api_spark.plans.sparql import sparql_select

    tri = _rdf_triples(spark, sf_dir)
    q = (
        f"PREFIX ex: <{EX}>\n"
        "SELECT DISTINCT ?s ?g WHERE { ?s ex:status \"BROKEN\" . "
        "OPTIONAL { GRAPH ?g { ?s ex:label ?w . } } }"
    )
    return sparql_select(tri, q)


def _q_entity_link(spark, sf_dir):
    """Entity linking (north-star): identity-edge components → canonical
    representative rewrite.  The social fixture carries no owl:sameAs, so
    the ex:knows graph stands in as the identity-edge source — the
    operator takes any (a, b) edge set (owl:sameAs extraction is the
    default path, unit-tested in test_canonicalize.py)."""
    from pyspark.sql import functions as F

    from rdfshape_api_spark.operators.canonicalize import link_entities

    tri = _social_triples(spark, sf_dir).select(
        "doc_sha256", "subj", "pred", "obj_kind", "obj_value", "obj_lang", "obj_datatype"
    ).distinct()
    edges = tri.filter(
        (F.col("pred") == EX + "knows") & (F.col("obj_kind") != "literal")
    ).select(F.col("subj").alias("a"), F.col("obj_value").alias("b"))
    return link_entities(tri, edges=edges).distinct()


def _q_html_extract(spark, sf_dir):
    """HTML→RDF (RDFa-lite + Microdata) through the standard extract →
    canonicalize path (S2; reference HtmlToRdf.scala:50-122)."""
    from rdfshape_api_spark.fixtures.generator import sf_tag_from_dir as _tagof
    from rdfshape_api_spark.operators.canonicalize import canonicalize, dedup_triples
    from rdfshape_api_spark.sources.extract import extract_triples

    paths = ensure_webdocs(_tagof(sf_dir))
    docs = spark.read.parquet(paths["docs"])
    tri = dedup_triples(canonicalize(extract_triples(docs)), scope_doc=True)
    return tri.select(
        "doc_sha256", "subj", "pred", "obj_kind", "obj_value", "obj_lang", "obj_datatype"
    ).distinct()


def _q_catalog_validate(spark, sf_dir):
    """Repeated-property EachOf (partition matching) under the golden gate."""
    from rdfshape_api_spark.plans import parse_shexc, validate

    tri = _catalog_triples(spark, sf_dir)
    return validate(
        tri, parse_shexc(SHEX_ITEM), shapemap=SHAPEMAP_ITEM, shape_label="shex_item"
    ).select("doc_sha256", "node", "status")


def _q_text_redact(spark, sf_dir):
    from rdfshape_api_spark.functions.textops import redact_pii

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return redact_pii(docs)


def _q_text_features(spark, sf_dir):
    from rdfshape_api_spark.functions.textops import text_features

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return text_features(docs)


def _q_text_repetition(spark, sf_dir):
    from rdfshape_api_spark.functions.textops import repetition_signals

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return repetition_signals(docs)


def _q_text_quality(spark, sf_dir):
    from rdfshape_api_spark.functions.textops import quality_filter

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return quality_filter(docs)


def _q_dedup_exact(spark, sf_dir):
    from pyspark.sql import functions as F

    from rdfshape_api_spark.functions.dedup import exact_duplicates

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    # key on the normalized 80-char prefix: full-text exact duplicates
    # don't exist at the driver's sf0.01 tier (a 0=0 oracle match verifies
    # nothing), prefix groups do — same groupBy/HAVING plan, real output
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return exact_duplicates(docs, fp=F.md5(F.substring(norm, 1, 80)))


def _q_dedup_bloom(spark, sf_dir):
    """Bloom-filter incremental dedup: the 100 TB ingest pattern — the
    existing corpus (doc_id % 10 < 8) is distilled once into its bloom
    bit set; the incoming batch (the other 20%) is flagged map-side +
    one small groupBy, never joining the corpus itself.  Key = normalized
    80-char-prefix fingerprint (same as dedup_exact, so real collisions
    exist at every tier)."""
    from pyspark.sql import functions as F

    from rdfshape_api_spark.functions.dedup import bloom_build, bloom_dedup_incremental

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    fp = F.md5(F.substring(norm, 1, 80))
    corpus = docs.filter(F.col("doc_id") % 10 < 8)
    incoming = docs.filter(F.col("doc_id") % 10 >= 8).select("doc_id", fp.alias("fp"))
    bloom = bloom_build(corpus, fp, k=5, m=1 << 20)
    return bloom_dedup_incremental(incoming, bloom, "fp", k=5, m=1 << 20)


def _q_corpus_stats(spark, sf_dir):
    """Corpus mixture report per (lang, source): doc/token/char counts +
    exact-integer ppm shares (functions/textops.corpus_stats)."""
    from rdfshape_api_spark.functions.textops import corpus_stats

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return corpus_stats(docs)


def _q_bpe_encode(spark, sf_dir):
    """Real corpus-trained BPE tokenization (functions/tokenize.py):
    merges trained on the distributed word-frequency table (top-2000
    words, 200 merges, deterministic tiebreaks), applied corpus-wide in
    one Arrow-batched mapInPandas stage.  Iterative merge order is not
    SQL-expressible — rows-only contract entry; pytest pins hand-computed
    merges + the decode∘encode identity."""
    from rdfshape_api_spark.functions.tokenize import (
        bpe_encode,
        build_vocab,
        train_bpe,
        word_frequencies,
    )

    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    wf = [(r["word"], r["n"]) for r in word_frequencies(docs, top_k=2000).collect()]
    merges = train_bpe(wf, num_merges=200)
    vocab = build_vocab(merges, wf)
    enc = bpe_encode(docs, merges, vocab)
    # Contract shape: stringify the array column so the driver's pandas
    # canonicalizer (sort_values over every column) can hash the row.
    return enc.select(
        *[c for c in enc.columns if c != "token_ids"],
        F.concat_ws(",", F.col("token_ids").cast("array<string>")).alias("token_ids"),
    )


def _q_pack_token_ids(spark, sf_dir):
    """Concat-and-chunk packing (functions/sampling.pack_token_ids) over a
    portable hash-word tokenization (md5-derived int per whitespace word),
    so the DuckDB twin can rebuild the identical token stream: unnest WITH
    ORDINALITY → row_number within shard → (rn-1)//seq_len groups, full
    sequences only.  Spark never shuffles per-token rows — one doc-level
    repartition + a streaming Arrow chunker; the oracle (tiny data) can
    afford the per-token form."""
    from pyspark.sql import functions as F

    from rdfshape_api_spark.functions.sampling import pack_token_ids

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    word_id = lambda w: F.conv(F.substring(F.md5(w), 1, 7), 16, 10).cast("int")
    encoded = docs.select(
        "doc_id",
        F.transform(
            F.split(F.lower(F.trim(F.col("text"))), r"\s+"), word_id
        ).alias("token_ids"),
    )
    packed = pack_token_ids(encoded, seq_len=32, n_shards=8)
    # Contract shape: the driver's canonicalizer sorts columns with pandas,
    # which cannot hash a list column — project the sequence to a sortable
    # scalar (comma-joined string) on BOTH sides; the oracle mirrors with
    # array_to_string.  pack_token_ids itself keeps the array<int> schema.
    return packed.select(
        "shard",
        "seq_idx",
        F.concat_ws(",", F.col("token_ids").cast("array<string>")).alias("token_ids"),
    )


def _q_dedup_lsh(spark, sf_dir):
    from rdfshape_api_spark.functions.dedup import lsh_candidate_pairs

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return lsh_candidate_pairs(docs)


def _q_dedup_lsh_keep(spark, sf_dir):
    from rdfshape_api_spark.functions.dedup import lsh_dedup_keep

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return lsh_dedup_keep(docs)


def _q_dedup_verified(spark, sf_dir):
    from rdfshape_api_spark.functions.dedup import lsh_verified_pairs

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return lsh_verified_pairs(docs, threshold=0.5)


def _q_dedup_lsh_incremental(spark, sf_dir):
    """Batch-vs-corpus near-dup dedup: docs with doc_id % 4 == 0 arrive as
    the incoming batch; the rest are the existing corpus, represented ONLY
    by its stored band table (the 100 TB ingest contract — the corpus text
    is never re-read)."""
    from rdfshape_api_spark.functions.dedup import lsh_incremental_keep, minhash_bands

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    batch = docs.filter(F.col("doc_id") % 4 == 0)
    corpus_bands = minhash_bands(docs.filter(F.col("doc_id") % 4 != 0))
    return lsh_incremental_keep(corpus_bands, batch)


def _q_dedup_clusters(spark, sf_dir):
    """Duplicate clusters: connected components of the LSH candidate-pair
    graph, computed by contracting each bucket-clique to a star before the
    min-label fixpoint (Σ|bucket| edges, not Σ|bucket|²) — row-identical
    to CC over the enumerated pairs (oracle = recursive CTE over them)."""
    from rdfshape_api_spark.functions.dedup import lsh_duplicate_clusters

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return lsh_duplicate_clusters(docs)


def _q_dedup_ngram(spark, sf_dir):
    from rdfshape_api_spark.functions.dedup import ngram_jaccard_pairs

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return ngram_jaccard_pairs(docs, threshold=0.5)


def _q_text_decontaminate(spark, sf_dir):
    """Benchmark decontamination (GPT-3 appendix-C style n-gram overlap).

    The "benchmark" is a deterministic slice of the corpus itself
    (doc_id % 97 == 0 — every eval set a lab guards against is drawn
    from the same web distribution as the training data, so the slice is
    a faithful stand-in and the check is self-contained)."""
    from pyspark.sql import functions as F

    from rdfshape_api_spark.functions.dedup import decontaminate

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    return decontaminate(docs, bench, n=3)


def _q_text_span_dedup(spark, sf_dir):
    """C4-style duplicate-span removal: drop 3-word spans occurring in >=2
    docs, reassemble the survivors (dedup.span_dedup docstring has the
    100TB plan notes)."""
    from rdfshape_api_spark.functions.dedup import span_dedup

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return span_dedup(docs, span_words=3, min_df=2)


def _q_dedup_simhash(spark, sf_dir):
    from rdfshape_api_spark.functions.dedup import simhash_bucket_pairs

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return simhash_bucket_pairs(docs)


def _q_sim_topk(spark, sf_dir):
    from rdfshape_api_spark.functions.similarity import cosine_topk

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return cosine_topk(emb, k=5, n_queries=10)


def _q_sim_near_dups(spark, sf_dir):
    from rdfshape_api_spark.functions.similarity import embedding_near_dups

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    # 0.4: the synthetic embeddings' top within-cell cosine is ~0.47, so
    # 0.9 matched the oracle on 0 rows — trivially green; 0.4 verifies
    # real pairs at every tier (5 at sf0.01, 86 at sf0.1)
    return embedding_near_dups(emb, threshold=0.4).select("vec_a", "vec_b")


def _q_text_pack(spark, sf_dir):
    """Token-budget sequence packing, 16 shards, 64-token bins."""
    from rdfshape_api_spark.functions.sampling import pack_sequences

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return pack_sequences(docs, max_tokens=64, n_shards=16)


def _q_text_lm_score(spark, sf_dir):
    """CCNet-style unigram-LM quality buckets (textops.lm_score)."""
    from rdfshape_api_spark.functions.textops import lm_score

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return lm_score(docs)


def _q_text_normalize(spark, sf_dir):
    """Unicode NFC + CCNet dedup-key normalization (textops.normalize_text)."""
    from rdfshape_api_spark.functions.textops import normalize_text

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return normalize_text(docs)


def _q_text_top_ngrams(spark, sf_dir):
    """Corpus heavy-hitter bigrams at 5% document-frequency support
    (the synthetic word-soup corpus tops out near 9% — 0.05 keeps the
    result non-trivial at every tier)."""
    from rdfshape_api_spark.functions.textops import top_ngrams

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return top_ngrams(docs, n=2, support=0.05)


def _q_text_tfidf(spark, sf_dir):
    """Per-document top-5 TF-IDF terms (integerized scores)."""
    from rdfshape_api_spark.functions.textops import tfidf_topk

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return tfidf_topk(docs, k=5)


def _q_text_leakage_split(spark, sf_dir):
    """Duplicate-cluster-aware train/val/test split: the split key is the
    duplicate-family component (dups land in one split — no train/eval
    contamination), singletons key on themselves; md5-bucket assignment
    into cumulative ratio ranges (96/2/2).  Families here = the
    normalized-prefix exact-dup groups (the LSH transitive components
    chain 494/500 synthetic docs into ONE family at sf0.01 — correct CC
    but a degenerate split demo; the `clusters` parameter exists for
    exactly this policy choice)."""
    from rdfshape_api_spark.functions.dedup import exact_duplicates
    from rdfshape_api_spark.functions.sampling import leakage_safe_split

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    fp = F.md5(F.substring(norm, 1, 80))
    groups = exact_duplicates(docs, fp=fp)
    clusters = (
        docs.select("doc_id", fp.alias("fp"))
        .join(groups.select("fp", F.col("min_doc_id").alias("component")), on="fp")
        .select("doc_id", "component")
    )
    return leakage_safe_split(
        docs, {"train": 0.96, "val": 0.02, "test": 0.02}, clusters=clusters
    )


def _q_text_hash_sample(spark, sf_dir):
    """Deterministic corpus-mixing sample: en halved, es upsampled 2.25x,
    de kept whole, zh/fr dropped (explicit-manifest convention)."""
    from rdfshape_api_spark.functions.sampling import hash_sample

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return hash_sample(docs, {"en": 0.5, "es": 2.25, "de": 1.0}).select(
        "doc_id", "lang", F.col("n_copy").cast("int").alias("n_copy")
    )


def _q_text_source_cap(spark, sf_dir):
    """Per-source quota (Dolma/RefinedWeb-style skew guard): at most 10
    docs per source, selected by deterministic hash rank."""
    from rdfshape_api_spark.functions.sampling import per_source_cap

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return per_source_cap(docs, cap=10).select(
        "doc_id", "source", F.col("src_rank").cast("int").alias("src_rank")
    )


def _q_temperature_mix(spark, sf_dir):
    """α=0.5 temperature rebalancing over lang strata: weights derived
    from the corpus itself via IEEE-exact ops (max/divide/sqrt/floor), so
    the DuckDB twin recomputes the micro-weights bit-identically."""
    from rdfshape_api_spark.functions.sampling import temperature_mix

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return temperature_mix(docs, alpha=0.5, stratum_col="lang").select(
        "doc_id", "lang", "weight_micro",
        F.col("n_copy").cast("int").alias("n_copy"),
    )


def _q_epoch_shards(spark, sf_dir):
    """Per-epoch deterministic shard assignment (3 epochs × 64 shards) —
    the scale-correct 'reshuffle every epoch' (no global permutation)."""
    from rdfshape_api_spark.functions.sampling import epoch_shards

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return epoch_shards(docs, epochs=3, n_shards=64).select(
        F.col("epoch").cast("int").alias("epoch"), "shard", "sort_key", "doc_id"
    )


def _q_sim_pca(spark, sf_dir):
    """Distributed PCA: one-pass partial moments -> driver eigh -> map-only
    integerized projection onto the top-4 components.  No SQL twin (the
    eigendecomposition has no DuckDB equivalent) — rows-only check, same
    contract tier as IVF k-means."""
    from rdfshape_api_spark.functions.similarity import pca_fit, pca_project

    from pyspark.sql import functions as F

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    mean, comps, _ = pca_fit(emb, k=4)
    proj = pca_project(emb, mean, comps)
    # Contract shape: stringify the array column so the driver's pandas
    # canonicalizer (sort_values over every column) can hash the row.
    return proj.select(
        *[c for c in proj.columns if c != "proj"],
        F.concat_ws(",", F.col("proj").cast("array<string>")).alias("proj"),
    )


def _q_sim_semantic_dedup(spark, sf_dir):
    """SemDeDup-style keep/drop per vector: hyperplane-bucketed candidate
    pairs, cosine >= 0.4 (the de-trivialized threshold, see
    sim_embedding_near_dups), keep-the-min rule."""
    from rdfshape_api_spark.functions.similarity import semantic_dedup

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return semantic_dedup(emb, threshold=0.4, n_planes=4)


def _q_sim_lsh_ann(spark, sf_dir):
    from rdfshape_api_spark.functions.similarity import lsh_ann_topk

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return lsh_ann_topk(emb, k=5, n_queries=10)


def _q_sim_ivf_ann(spark, sf_dir):
    """IVF ANN (k-means cells + n_probe search): deterministic for the
    fixed seed but no SQL twin (k-means) — rows-only driver entry; the
    correctness gate is the recall@5 test vs cosine_topk in
    tests/test_functions.py."""
    from rdfshape_api_spark.functions.similarity import ivf_ann_topk

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return ivf_ann_topk(emb, k=5, n_queries=10, n_cells=8, n_probe=2)


def _q_sim_semantic_dedup_kmeans(spark, sf_dir):
    """SemDeDup with the k-means coarse quantizer as the blocking key
    (cells scale with N — the corpus-scale blocking form, r5).  No SQL
    twin (k-means) — rows-only; keep semantics pinned by pytest against
    the hyperplane form on separated clusters."""
    from rdfshape_api_spark.functions.similarity import semantic_dedup_kmeans

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return semantic_dedup_kmeans(emb, threshold=0.4, n_cells=16, max_bucket=500)


def _q_mm_meta(spark, sf_dir):
    from rdfshape_api_spark.functions.multimodal import payload_metadata

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return payload_metadata(docs)


def _q_mm_features(spark, sf_dir):
    """Byte-histogram features as 8 integer columns (hash-friendly: the
    driver's canonicalizer can't sort/hash array columns, and integer
    counts avoid float-rounding skew vs the oracle)."""
    from rdfshape_api_spark.functions.multimodal import (
        FEATURE_DIM,
        attach_binary,
        extract_features,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    feats = extract_features(attach_binary(docs), normalize=False)
    return feats.select(
        "doc_id",
        *[
            F.element_at("features", i + 1).cast("bigint").alias(f"f{i}")
            for i in range(FEATURE_DIM)
        ],
    )


def _q_mm_frames(spark, sf_dir):
    from rdfshape_api_spark.functions.multimodal import attach_binary, frame_sample

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return frame_sample(attach_binary(docs.filter(F.col("doc_id") < 100)))


def _q_mm_audio(spark, sf_dir):
    """Audio feature plumbing: the text-byte payloads take the fake
    unsigned-8-bit-PCM path (integer-exact energy / zero crossings); RIFF
    payloads would hit the real stdlib WAV decoder (multimodal.decode_wav,
    pytest-covered on generated WAVs)."""
    from rdfshape_api_spark.functions.multimodal import attach_binary, audio_features

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return audio_features(attach_binary(docs.filter(F.col("doc_id") < 100)))


def _merged_triples(spark, sf_dir):
    """Merged-model view: the graph is a SET of triples, so identical rows
    from different docs collapse (MergedModels.scala:182-191)."""
    return (
        _rdf_triples(spark, sf_dir)
        .select("subj", "pred", "obj_kind", "obj_value", "obj_lang", "obj_datatype")
        .distinct()
    )


def _q_sparql_select(spark, sf_dir):
    from rdfshape_api_spark.plans.sparql import sparql_select

    q = f"""
    PREFIX ex: <{EX}>
    SELECT DISTINCT ?s ?t WHERE {{
      ?s a ex:Reading .
      ?s ex:readingTemperature ?t .
      ?s ex:status "OK" .
      FILTER (?t >= 19.5)
    }}
    """
    return sparql_select(_merged_triples(spark, sf_dir), q)


def _q_sparql_agg(spark, sf_dir):
    from rdfshape_api_spark.plans.sparql import sparql_select

    q = f"""
    PREFIX ex: <{EX}>
    SELECT ?st (COUNT(?s) AS ?n) WHERE {{ ?s ex:status ?st . }} GROUP BY ?st
    """
    return sparql_select(_merged_triples(spark, sf_dir), q)


def _q_sparql_bind(spark, sf_dir):
    from rdfshape_api_spark.plans.sparql import sparql_select

    q = f"""
    PREFIX ex: <{EX}>
    SELECT ?s ?t2 WHERE {{
      ?s ex:readingTemperature ?t .
      BIND (?t * 2 AS ?t2)
      FILTER (?t2 >= 39.0)
    }}
    """
    return sparql_select(_merged_triples(spark, sf_dir), q)


def _q_sparql_lang(spark, sf_dir):
    """SPARQL §17.4.2 term accessors: LANG()/DATATYPE() over the sidecar
    metadata columns, LANGMATCHES for range filtering (ARQ surface behind
    DataQuery.scala:51-63)."""
    from rdfshape_api_spark.plans.sparql import sparql_select

    q = f"""
    PREFIX ex: <{EX}>
    SELECT ?s ?p ?l ?dt WHERE {{
      ?s ?p ?v .
      BIND (LANG(?v) AS ?l)
      BIND (DATATYPE(?v) AS ?dt)
      FILTER (BOUND(?dt))
    }}
    """
    return sparql_select(_merged_triples(spark, sf_dir), q)


def _q_sparql_having(spark, sf_dir):
    from rdfshape_api_spark.plans.sparql import sparql_select

    q = f"""
    PREFIX ex: <{EX}>
    SELECT ?st (COUNT(?s) AS ?n) WHERE {{ ?s ex:status ?st . }}
    GROUP BY ?st HAVING (?n > 4000)
    """
    return sparql_select(_merged_triples(spark, sf_dir), q)


def _q_sparql_in(spark, sf_dir):
    """IN / NOT IN expression operators (§17.4.1.9-10) + an ORDER BY
    expression — both compiled to Column logic."""
    from rdfshape_api_spark.plans.sparql import sparql_select

    q = f"""
    PREFIX ex: <{EX}>
    SELECT DISTINCT ?s ?st WHERE {{
      ?s ex:status ?st .
      FILTER (?st IN ("OK", "BROKEN") && ?s NOT IN (<{EX}nothing>))
    }}
    ORDER BY DESC(STRLEN(?st)) ?s
    """
    return sparql_select(_merged_triples(spark, sf_dir), q)


def _q_sparql_subquery(spark, sf_dir):
    """SPARQL 1.1 §12 subquery: per-status max temperature (aggregated in
    the subquery) joined back onto every reading of that status."""
    from rdfshape_api_spark.plans.sparql import sparql_select

    q = f"""
    PREFIX ex: <{EX}>
    SELECT ?s ?t ?maxt WHERE {{
      ?s ex:status ?st .
      ?s ex:readingTemperature ?t .
      {{ SELECT ?st (MAX(?tt) AS ?maxt) WHERE {{
           ?x ex:status ?st . ?x ex:readingTemperature ?tt .
         }} GROUP BY ?st }}
    }}
    """
    return sparql_select(_merged_triples(spark, sf_dir), q)


def _q_sparql_values(spark, sf_dir):
    from rdfshape_api_spark.plans.sparql import sparql_select

    q = f"""
    PREFIX ex: <{EX}>
    SELECT ?s ?st WHERE {{
      ?s ex:status ?st .
      VALUES ?st {{ "OK" "BROKEN" }}
    }}
    """
    return sparql_select(_merged_triples(spark, sf_dir), q)


def _q_sparql_path_alt(spark, sf_dir):
    """Property path: alternative (a|ex:status) over the merged model."""
    from rdfshape_api_spark.plans.sparql import sparql_select

    q = f"""
    PREFIX ex: <{EX}>
    SELECT ?s ?o WHERE {{ ?s (a|ex:status) ?o . }}
    """
    return sparql_select(_merged_triples(spark, sf_dir), q)


def _q_sparql_path_neg(spark, sf_dir):
    """Negated property set (§9.1): forward branch excludes rdf:type,
    inverse branch excludes ex:status — exercises both NPS sides."""
    from rdfshape_api_spark.plans.sparql import sparql_select

    q = f"""
    PREFIX ex: <{EX}>
    SELECT DISTINCT ?s ?o WHERE {{ ?s !(a|^ex:status) ?o . }}
    """
    return sparql_select(_merged_triples(spark, sf_dir), q)


def _q_sparql_knows_plus(spark, sf_dir):
    """Transitive property path ex:knows+ (cyclic social graph)."""
    from rdfshape_api_spark.plans.sparql import sparql_select

    q = f"""
    PREFIX ex: <{EX}>
    SELECT DISTINCT ?a ?b WHERE {{ ?a ex:knows+ ?b . }}
    """
    return sparql_select(_social_triples(spark, sf_dir), q)


def _q_sparql_not_exists(spark, sf_dir):
    """FILTER NOT EXISTS — anti-join semantics (readings with no label)."""
    from rdfshape_api_spark.plans.sparql import sparql_select

    q = f"""
    PREFIX ex: <{EX}>
    SELECT DISTINCT ?s WHERE {{
      ?s a ex:Reading .
      FILTER NOT EXISTS {{ ?s ex:label ?l . }}
    }}
    """
    return sparql_select(_rdf_triples(spark, sf_dir), q)


def _q_sparql_construct(spark, sf_dir):
    """CONSTRUCT: template instantiation into a triple set."""
    from rdfshape_api_spark.plans.sparql import sparql_construct

    q = f"""
    PREFIX ex: <{EX}>
    CONSTRUCT {{ ?s ex:hasState ?st . }} WHERE {{ ?s ex:status ?st . }}
    """
    return sparql_construct(_rdf_triples(spark, sf_dir), q)


def _q_sparql_minus(spark, sf_dir):
    """MINUS — SPARQL set difference (readings minus the broken ones)."""
    from rdfshape_api_spark.plans.sparql import sparql_select

    q = f"""
    PREFIX ex: <{EX}>
    SELECT DISTINCT ?s WHERE {{
      ?s a ex:Reading .
      MINUS {{ ?s ex:status "BROKEN" . }}
    }}
    """
    return sparql_select(_rdf_triples(spark, sf_dir), q)


def _q_sparql_group_concat(spark, sf_dir):
    """GROUP_CONCAT + SAMPLE aggregates (deterministic: sorted concat,
    min-valued sample)."""
    from rdfshape_api_spark.plans.sparql import sparql_select

    q = f"""
    PREFIX ex: <{EX}>
    SELECT ?st (GROUP_CONCAT(DISTINCT ?dt ; SEPARATOR=",") AS ?types)
               (SAMPLE(?s) AS ?one)
    WHERE {{ ?s ex:status ?st . ?s a ?dt . }}
    GROUP BY ?st
    """
    return sparql_select(_merged_triples(spark, sf_dir), q)


def _q_sparql_describe(spark, sf_dir):
    """DESCRIBE ?s — one-hop outgoing description of matched resources."""
    from rdfshape_api_spark.plans.sparql import sparql_describe

    q = f"""
    PREFIX ex: <{EX}>
    DESCRIBE ?s WHERE {{ ?s ex:status "BROKEN" . }}
    """
    return sparql_describe(_rdf_triples(spark, sf_dir), q)


def _q_sparql_knows_star(spark, sf_dir):
    """ex:knows* — zero-length path semantics (every graph term reflexive)
    unioned with the + closure (SPARQL 1.1 §18.4 ZeroLengthPath)."""
    from rdfshape_api_spark.plans.sparql import sparql_select

    q = f"""
    PREFIX ex: <{EX}>
    SELECT DISTINCT ?a ?b WHERE {{ ?a ex:knows* ?b . }}
    """
    return sparql_select(_social_triples(spark, sf_dir), q)


# SHACL sh:qualifiedValueShape over the sensor model: a well-sampled
# reading has ≥ 2 temperatures inside [18, 20] — out-of-range temps are
# NOT violations, only the count of in-range ones is bounds-checked
SHACL_QUALIFIED_SENSOR = f"""\
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <{EX}> .

ex:WellSampledReading a sh:NodeShape ;
  sh:targetClass ex:Reading ;
  sh:property [
    sh:path ex:readingTemperature ;
    sh:qualifiedValueShape [ sh:minInclusive 18 ; sh:maxInclusive 20 ] ;
    sh:qualifiedMinCount 2 ;
  ] .
"""


def _q_shacl_qualified(spark, sf_dir):
    from rdfshape_api_spark.plans import parse_shacl, validate

    tri = _rdf_triples(spark, sf_dir)
    return validate(tri, parse_shacl(SHACL_QUALIFIED_SENSOR)).select(
        "doc_sha256", "node", "status"
    )


# SHACL-SPARQL constraint over the sensor model (sh:sparql → sh:select
# with $this): a Reading is inconsistent when a cold temperature carries
# an "OK" status.  Evaluated set-based: ONE distributed query with ?this
# free, doc-scoped by threading the document id through every BGP join
# (plans/sparql.sparql_violators) — no per-focus-node loop.
SHACL_SPARQL_SENSOR = f"""\
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <{EX}> .

ex:ConsistentReading a sh:NodeShape ;
  sh:targetClass ex:Reading ;
  sh:sparql [
    sh:message "cold reading marked OK" ;
    sh:select \"\"\"SELECT ?this WHERE {{
      ?this ex:readingTemperature ?t .
      ?this ex:status ?st .
      FILTER (?t < 19.0 && ?st = "OK")
    }}\"\"\" ;
  ] .
"""


def _q_shacl_sparql(spark, sf_dir):
    from rdfshape_api_spark.plans import parse_shacl, validate

    tri = _rdf_triples(spark, sf_dir)
    return validate(tri, parse_shacl(SHACL_SPARQL_SENSOR)).select(
        "doc_sha256", "node", "status"
    )


# SHACL sequence path over the social graph: every Person must know
# somebody with an email (path ex:knows/ex:email, focus-seeded
# reachability join — plans/paths.py)
SHACL_SEQPATH_SOCIAL = f"""\
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <{EX}> .

ex:ConnectedShape a sh:NodeShape ;
  sh:targetClass ex:Person ;
  sh:property [ sh:path ( ex:knows ex:email ) ; sh:minCount 1 ] .
"""


# sh:hasValue over the sensor model: the status value set must include
# "OK" — compiled to a count-only (qualified) one-member value-set
# constraint, so RUNNING/BROKEN siblings are never violations
SHACL_HASVALUE_SENSOR = f"""\
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <{EX}> .

ex:HasOkStatus a sh:NodeShape ;
  sh:targetClass ex:Reading ;
  sh:property [ sh:path ex:status ; sh:hasValue "OK" ] .
"""


def _q_shacl_hasvalue(spark, sf_dir):
    from rdfshape_api_spark.plans import parse_shacl, validate

    tri = _rdf_triples(spark, sf_dir)
    return validate(tri, parse_shacl(SHACL_HASVALUE_SENSOR)).select(
        "doc_sha256", "node", "status"
    )


# sh:equals property-pair over the social graph: a Person's email value
# set must equal their phone value set — mixed verdicts (both-empty →
# conformant; any asymmetry → violation)
SHACL_PAIR_SOCIAL = f"""\
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <{EX}> .

ex:ContactParity a sh:NodeShape ;
  sh:targetClass ex:Person ;
  sh:property [ sh:path ex:email ; sh:equals ex:phone ] .
"""


def _q_shacl_pair_equals(spark, sf_dir):
    from rdfshape_api_spark.plans import parse_shacl, validate

    tri = _social_triples(spark, sf_dir)
    return validate(tri, parse_shacl(SHACL_PAIR_SOCIAL)).select(
        "doc_sha256", "node", "status"
    )


# The SAME shapes graph in RDF/XML (reference parity: shaclex reads the
# shapes graph from any Jena syntax — `ShaclFormat.availableFormats =
# List(Turtle, NTriples, NQuads, TriG, JsonLd, RdfXml)`,
# ShaclFormat.scala:20-28).  Hand-written XML, parsed by this package's own
# RDF/XML parser via parse_shacl(fmt="rdf-xml"); oracle: the same SQL as
# social_shacl_pair_equals.
SHACL_PAIR_SOCIAL_XML = f"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:sh="http://www.w3.org/ns/shacl#">
  <sh:NodeShape rdf:about="{EX}ContactParity">
    <sh:targetClass rdf:resource="{EX}Person"/>
    <sh:property rdf:parseType="Resource">
      <sh:path rdf:resource="{EX}email"/>
      <sh:equals rdf:resource="{EX}phone"/>
    </sh:property>
  </sh:NodeShape>
</rdf:RDF>
"""


def _q_shacl_from_xml(spark, sf_dir):
    from rdfshape_api_spark.plans import parse_shacl, validate

    tri = _social_triples(spark, sf_dir)
    return validate(tri, parse_shacl(SHACL_PAIR_SOCIAL_XML, fmt="rdf-xml")).select(
        "doc_sha256", "node", "status"
    )


# sh:xone over the sensor model: every temperature must satisfy EXACTLY
# one of {≥18, ≤20} — values inside [18,20] satisfy both (violation),
# values outside satisfy one (ok), non-numerics satisfy none (violation)
SHACL_XONE_SENSOR = f"""\
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <{EX}> .

ex:OutOfBandReading a sh:NodeShape ;
  sh:targetClass ex:Reading ;
  sh:property [ sh:path ex:readingTemperature ;
    sh:xone ( [ sh:minInclusive 18 ] [ sh:maxInclusive 20 ] ) ] .
"""


def _q_shacl_xone(spark, sf_dir):
    from rdfshape_api_spark.plans import parse_shacl, validate

    tri = _rdf_triples(spark, sf_dir)
    return validate(tri, parse_shacl(SHACL_XONE_SENSOR)).select(
        "doc_sha256", "node", "status"
    )


def _q_shacl_seqpath(spark, sf_dir):
    from rdfshape_api_spark.plans import parse_shacl, validate

    tri = _social_triples(spark, sf_dir)
    return validate(tri, parse_shacl(SHACL_SEQPATH_SOCIAL)).select(
        "doc_sha256", "node", "status"
    )


# Disjoint qualified sh:node siblings over an INVERSE path (r3's last SHACL
# clean reject, lifted in r4): every Person needs (a) ≥ 1 bnode follower
# with an email — the sh:nodeKind IRI sibling excludes IRI-named followers
# from that count — and (b) ≥ 1 IRI-named follower WITHOUT an email (the
# EmailedShape sibling excludes emailed ones).  Followers = inverse
# ex:knows neighbourhood (subjects pointing at the focus node).
SHACL_QUALIFIED_INV_SOCIAL = f"""\
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <{EX}> .

ex:EmailedShape a sh:NodeShape ;
  sh:property [ sh:path ex:email ; sh:minCount 1 ] .

ex:AudienceShape a sh:NodeShape ;
  sh:targetClass ex:Person ;
  sh:property [ sh:path [ sh:inversePath ex:knows ] ;
    sh:qualifiedValueShape [ sh:node ex:EmailedShape ] ;
    sh:qualifiedMinCount 1 ;
    sh:qualifiedValueShapesDisjoint true ] ;
  sh:property [ sh:path [ sh:inversePath ex:knows ] ;
    sh:qualifiedValueShape [ sh:nodeKind sh:IRI ] ;
    sh:qualifiedMinCount 1 ;
    sh:qualifiedValueShapesDisjoint true ] .
"""


def _q_shacl_qualified_inverse(spark, sf_dir):
    from rdfshape_api_spark.plans import parse_shacl, validate

    tri = _social_triples(spark, sf_dir)
    return validate(tri, parse_shacl(SHACL_QUALIFIED_INV_SOCIAL)).select(
        "doc_sha256", "node", "status"
    )


# sh:property on logical-member nodes (r4s9): knows-values must carry an
# email OR a phone — each sh:or member is an anonymous node shape, compiled
# to a shape reference (per-value conformance join; shaclex accepts
# arbitrary nesting behind SchemaService.scala:80-84).
SHACL_MEMBER_PROP_SOCIAL = """\
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .

ex:ContactablePeers a sh:NodeShape ;
  sh:targetClass ex:Person ;
  sh:property [
    sh:path ex:knows ;
    sh:or ( [ sh:property [ sh:path ex:email ; sh:minCount 1 ] ]
            [ sh:property [ sh:path ex:phone ; sh:minCount 1 ] ] )
  ] .
"""


def _q_shacl_member_prop(spark, sf_dir):
    from rdfshape_api_spark.plans import parse_shacl, validate

    tri = _social_triples(spark, sf_dir)
    return validate(tri, parse_shacl(SHACL_MEMBER_PROP_SOCIAL)).select(
        "doc_sha256", "node", "status"
    )


# Node-shape-LEVEL components (r4s10): sh:or over PROPERTY-shape members
# directly on the node shape (the spec's canonical disjunction form,
# silently unread before this round) conjoined with a node-level sh:not
# over a value member gating the focus term itself.  Reference: shaclex
# evaluates node-level logicals whole (SchemaService.scala:80-84).
SHACL_NODE_LEVEL_SOCIAL = """\
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .

ex:ReachableNamedPerson a sh:NodeShape ;
  sh:targetClass ex:Person ;
  sh:or ( [ sh:path ex:email ; sh:minCount 1 ]
          [ sh:path ex:phone ; sh:minCount 1 ] ) ;
  sh:not [ sh:pattern "^urn:skolem:" ] .
"""


def _q_shacl_node_level(spark, sf_dir):
    from rdfshape_api_spark.plans import parse_shacl, validate

    tri = _social_triples(spark, sf_dir)
    return validate(tri, parse_shacl(SHACL_NODE_LEVEL_SOCIAL)).select(
        "doc_sha256", "node", "status"
    )


def _q_infer_profile(spark, sf_dir):
    from rdfshape_api_spark.operators.infer_schema import (
        infer_shape_profile,
        node_selector_focus,
    )

    merged = _merged_triples(spark, sf_dir)
    focus = node_selector_focus(merged, "{FOCUS a <" + EX + "Reading>}")
    return infer_shape_profile(merged, focus).select(
        "pred", "card_min", "card_max", "n_subjects"
    )


def _q_rdfs_closure(spark, sf_dir):
    from rdfshape_api_spark.model import RDF_TYPE, RDFS_SUBCLASSOF, RDFS_RANGE
    from rdfshape_api_spark.operators.inference import rdfs_closure

    base = _rdf_triples(spark, sf_dir).select(
        "doc_sha256", "subj", "pred", "obj_kind", "obj_value", "obj_lang", "obj_datatype"
    )
    schema_triples = spark.createDataFrame(
        [
            ("__schema__", EX + "Reading", RDFS_SUBCLASSOF, "iri", EX + "Observation", None, None),
            ("__schema__", EX + "Observation", RDFS_SUBCLASSOF, "iri", EX + "Entity", None, None),
            ("__schema__", EX + "station", RDFS_RANGE, "iri", EX + "Station", None, None),
        ],
        base.schema,
    )
    closure = rdfs_closure(base.unionByName(schema_triples))
    return (
        closure.filter(
            (F.col("pred") == RDF_TYPE)
            & F.col("obj_value").isin(
                EX + "Reading", EX + "Observation", EX + "Entity", EX + "Station"
            )
        )
        .groupBy(F.col("obj_value").alias("cls"))
        .agg(F.count_distinct("subj").cast("bigint").alias("n_subjects"))
    )


def _q_owl_sameas(spark, sf_dir):
    """owl:sameAs identity merge as an inference mode (r5; the missing
    half of OWL-lite vs Jena's reasoner, MergedModels.scala:117-124):
    deterministic alias identities are synthesized over the corpus — every
    example.org reading subject gains an ``http://alias.example/`` twin,
    BROKEN readings a second-hop ``http://alias2.example/`` twin (a
    3-member identity chain exercising transitive component resolution) —
    then ``owl_sameas_closure`` entails the canonical-representative
    rewrite + eq-sym mirrors.  The DuckDB twin reruns the derivation with
    a recursive-CTE component closure."""
    from rdfshape_api_spark.operators.inference import OWL_SAMEAS, owl_sameas_closure

    base = _rdf_triples(spark, sf_dir).select(
        "doc_sha256", "subj", "pred", "obj_kind", "obj_value", "obj_lang", "obj_datatype"
    )
    ents = (
        base.filter(
            (F.col("pred") == EX + "status") & F.col("subj").startswith(EX)
        )
        .select("doc_sha256", "subj", "obj_value")
        .distinct()
    )
    alias1 = F.regexp_replace(F.col("subj"), "^http://example\\.org/", "http://alias.example/")
    alias2 = F.regexp_replace(F.col("subj"), "^http://example\\.org/", "http://alias2.example/")
    same1 = ents.select(
        "doc_sha256",
        alias1.alias("subj"),
        F.lit(OWL_SAMEAS).alias("pred"),
        F.lit("iri").alias("obj_kind"),
        F.col("subj").alias("obj_value"),
        F.lit(None).cast("string").alias("obj_lang"),
        F.lit(None).cast("string").alias("obj_datatype"),
    )
    same2 = ents.filter(F.col("obj_value") == "BROKEN").select(
        "doc_sha256",
        F.col("subj"),
        F.lit(OWL_SAMEAS).alias("pred"),
        F.lit("iri").alias("obj_kind"),
        alias2.alias("obj_value"),
        F.lit(None).cast("string").alias("obj_lang"),
        F.lit(None).cast("string").alias("obj_datatype"),
    )
    merged = owl_sameas_closure(base.unionByName(same1).unionByName(same2))
    return merged.select(
        "doc_sha256", "subj", "pred", "obj_kind", "obj_value",
        "obj_lang", "obj_datatype", "origin",
    )


def _q_path_reachable(spark, sf_dir):
    from rdfshape_api_spark.operators.algebra import path_direct, path_zero_or_more

    pairs = path_direct(_rdf_triples(spark, sf_dir), EX + "station")
    return path_zero_or_more(pairs).select("doc_sha256", "src", "dst").distinct()


def _q_json_graph(spark, sf_dir):
    from rdfshape_api_spark.operators.serialize import to_json_graph

    return to_json_graph(_merged_triples(spark, sf_dir)).select(
        "subj", F.size("arcs").cast("bigint").alias("n_arcs")
    )


def _q_turtle(spark, sf_dir):
    from rdfshape_api_spark.operators.serialize import to_turtle_per_doc

    return to_turtle_per_doc(_rdf_triples(spark, sf_dir))


def _q_stream_validate(spark, sf_dir):
    import tempfile

    from rdfshape_api_spark.fixtures.generator import (
        SHAPEMAP_QUERY as smap,
        SHEX_SENSOR as shex,
    )
    from rdfshape_api_spark.streaming import StreamConfig, stream_validate

    paths = ensure_fixtures(sf_tag_from_dir(sf_dir))
    in_dir = os.path.dirname(paths["docs"])
    out = tempfile.mkdtemp(prefix="stream_validate_")
    cfg = StreamConfig(
        shex_schema=shex,
        shex_shapemap=smap,
        extra={"pathGlobFilter": os.path.basename(paths["docs"])},
    )
    stream_validate(spark, in_dir, out, cfg)
    return spark.read.parquet(os.path.join(out, "verdicts")).select(
        "doc_sha256", "node", "status"
    )


def _q_docs_stream_dedup(spark, sf_dir):
    """Custom stateful streaming operator (applyInPandasWithState) driven
    over the documents table as a bounded stream: first-seen dedup keyed
    by content fingerprint.  One availableNow trigger = one batch, and
    the within-trigger representative is the min sha — so the result
    equals the batch GROUP BY, which is exactly the DuckDB oracle."""
    from rdfshape_api_spark.streaming.stateful_dedup import stream_dedup_first_seen

    doc_schema = (
        "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    stream = (
        spark.readStream.schema(doc_schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    keyed = stream.select(
        F.md5("text").alias("fp"), F.col("doc_id").cast("string").alias("doc_sha256")
    )
    name = "docs_stream_dedup_sink"
    q = (
        stream_dedup_first_seen(keyed)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name).select("fp", "doc_sha256", "n_seen")


def _q_events_windowed_stream(spark, sf_dir):
    """Structured-Streaming tumbling-window aggregation (watermark +
    event-time windows, streaming/windowed_events.py) driven over the
    events table as a bounded file stream; complete output mode emits
    every window, so the result equals the batch tumbling aggregation —
    which is exactly the DuckDB oracle."""
    from rdfshape_api_spark.streaming.windowed_events import windowed_event_counts

    ev_schema = (
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    )
    # events.parquet is a single file; file streams want a directory —
    # stream the sf dir with a glob pinned to the one table
    stream = (
        spark.readStream.schema(ev_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    agg = windowed_event_counts(stream, window_minutes=60, watermark_minutes=120)
    name = "events_windowed_stream_sink"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.table(name)
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:00:00").alias("hour"),
        "event_type",
        F.col("n_events").cast("bigint").alias("n_events"),
        F.round("sum_value", 4).alias("sum_value"),
    )


def _q_events_hourly(spark, sf_dir):
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00:00").alias("hour"),
            "event_type",
        )
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


def _q_events_sessionize(spark, sf_dir):
    from rdfshape_api_spark.functions.textops import sessionize

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return sessionize(ev, gap_minutes=30)


def _q_events_sessions(spark, sf_dir):
    from pyspark.sql import Window

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id", "event_id", F.row_number().over(w).cast("bigint").alias("seq")
    )


# --- code-corpus operators over the north-rule input shape ----------------
# (repo, path, commit, lang, content) — repository-level analytics of the
# source-file corpus itself, complementing the per-file RDF extraction.


def _code_docs(spark, sf_dir):
    """Fixture docs table for the tier, spread over partitions (the fixture
    parquet is a single file; production reads a bucketed Iceberg table)."""
    tag = sf_tag_from_dir(sf_dir)
    return spark.read.parquet(ensure_fixtures(tag)["docs"]).repartition(
        32, "repo", "path"
    )


def _q_code_winnow_fp(spark, sf_dir):
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken SIGMOD'03,
    the MOSS sketch): min-hash of each w-window of k-gram hashes, exploded
    to the inverted-index shape. Map-only Column/array expressions."""
    from rdfshape_api_spark.functions.codeops import winnow_fingerprints

    return winnow_fingerprints(_code_docs(spark, sf_dir))


def _q_code_winnow_clones(spark, sf_dir):
    """Intra-repo near-duplicate file pairs by winnowing-fingerprint
    Jaccard (clone/vendored-copy detection). Scoped to the org0/org1
    repos on the first 400 content chars — the head sketch keeps the
    oracle twin tractable; the operator itself takes the full corpus."""
    from rdfshape_api_spark.functions.codeops import winnow_near_dup_pairs

    docs = _code_docs(spark, sf_dir).filter(
        F.col("repo").startswith("org0/") | F.col("repo").startswith("org1/")
    ).withColumn("content", F.substring("content", 1, 400))
    return winnow_near_dup_pairs(docs, threshold=0.35, within_repo=True)


def _q_sim_pq_ann(spark, sf_dir):
    """IVF-PQ-style ANN: product-quantization codes (8 subspaces x 16
    centroids = 64x compression), ADC shortlist by LUT join, exact cosine
    re-rank of the shortlist. k-means has no SQL twin — rows-only entry
    (recall gate in tests/test_functions.py)."""
    from rdfshape_api_spark.functions.similarity import pq_ann_topk

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return pq_ann_topk(emb, k=5, n_queries=10, rerank=50)


def _q_social_triangles(spark, sf_dir):
    """Per-node triangle counts over the merged knows graph — the
    degree-ordered wedge join (compact-forward), O(m^1.5) wedges on any
    graph vs the hub-quadratic lexicographic orientation. Oracle uses the
    orientation-invariant x<y<z join (row-identical output)."""
    from rdfshape_api_spark.operators.algebra import triangle_counts

    tri = _social_triples(spark, sf_dir)
    kn = tri.filter(F.col("pred") == EX + "knows").select(
        F.col("subj").alias("src"), F.col("obj_value").alias("dst")
    )
    return triangle_counts(kn)


def _q_code_winnow_lsh(spark, sf_dir):
    """Cross-repo near-dup candidates at corpus scale: winnow sketch →
    MinHash signature → band-bucket join (the scale path the raw
    fingerprint join can't take — Σ bucket², not Σ df²). Same org0/org1 +
    400-char head scope as code_winnow_clones for oracle tractability."""
    from rdfshape_api_spark.functions.codeops import winnow_lsh_pairs

    docs = _code_docs(spark, sf_dir).filter(F.col("repo").startswith("org0/"))
    return winnow_lsh_pairs(docs, num_hashes=16, bands=2)


def _q_code_repo_stats(spark, sf_dir):
    from rdfshape_api_spark.functions.codeops import repo_stats

    return repo_stats(_code_docs(spark, sf_dir))


def _q_code_license_profile(spark, sf_dir):
    """Per-repo license-family rollup (the governance gate a code-corpus
    training pipeline filters on).  The RDF fixture corpus carries no
    real license headers, so the entry prepends a DETERMINISTIC header
    chosen by ``length(content) % 7`` — declared identically in the
    DuckDB twin; what the entry exercises is the operator's own
    detection path (SPDX tag extraction + phrase matching + rollup),
    which sees only the augmented text."""
    from rdfshape_api_spark.functions.codeops import repo_license_profile

    docs = _code_docs(spark, sf_dir)
    r = F.length("content") % 7
    hdr = (
        F.when(r == 0, F.lit("// SPDX-License-Identifier: MIT\n"))
        .when(r == 1, F.lit("# Licensed under the Apache License, Version 2.0\n"))
        .when(r == 2, F.lit("/* GNU General Public License */\n"))
        .when(r == 3, F.lit("// SPDX-License-Identifier: BSD-3-Clause\n"))
        .otherwise(F.lit(""))
    )
    aug = docs.withColumn("content", F.concat(hdr, F.col("content")))
    return repo_license_profile(aug)


def _q_code_ident_top(spark, sf_dir):
    from rdfshape_api_spark.functions.codeops import identifier_top

    return identifier_top(_code_docs(spark, sf_dir), top=10)


# Driver-verification rotation: the driver runs the FIRST 50 queries() keys
# per round, so entries past the window never get a CORRECTNESS row.  Keys
# listed here are moved to the FRONT of the dict (in this order) so
# never-verified and least-recently-verified entries get their green row.
# Maintenance: each round, lead with (a) entries new this round, (b) entries
# with no green row in any CORRECTNESS_r*.json, (c) entries whose last green
# row is oldest.  r4 ordering: 4 never-verified (r3 additions), then the 17
# LLM-pipeline entries last green in r2.
_VERIFY_FIRST = [
    # Tie-break hints WITHIN the never-verified class only — the rotation
    # itself is dynamic (_driver_verified reads CORRECTNESS_r*.json at
    # call time and floats never-verified entries to the front, r4s10).
    # Order here: the r4 verdict's 14 never-driver-verified entries, one
    # hash-checkable entry per code-corpus family first so the window's
    # slots sample different subsystems; rows-only entries (k-means PCA,
    # trained BPE, PQ — no SQL twin) last so window slots carry
    # hash-checkable oracles.
    "text_pack_token_ids",
    "social_shacl_member_prop",
    "social_triangles",
    "code_winnow_clones",
    "code_winnow_lsh",
    "code_ident_top",
    "text_pack_sequences",
    "rdf_trig",
    "rdf_rdfjson_roundtrip",
    "rdf_check_datatype",
    "text_epoch_shards",
    "text_tfidf",
    "sim_pca_project",
    "text_bpe_encode",
    "sim_pq_ann",
]


def _driver_verified() -> set[str]:
    """Entries that already have a hash-green (or rows-green) row in ANY
    driver CORRECTNESS file — read at call time so the rotation below
    self-updates every round without manual list maintenance."""
    import glob
    import json

    seen: set[str] = set()
    here = os.path.dirname(os.path.abspath(__file__))
    try:
        for p in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
            with open(p) as f:
                for name, row in json.load(f).items():
                    if isinstance(row, dict) and not row.get("err") and (
                        row.get("hash_match") or row.get("rows_match")
                    ):
                        seen.add(name)
    except Exception:
        pass  # rotation is an optimization; never let it break queries()
    return seen


def _rotate_for_verification(
    d: dict[str, Callable[[SparkSession, str], DataFrame]],
) -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Order the contract so the driver's 50-entry CORRECTNESS window
    always covers never-verified entries first: within each class
    (never-verified, then already-green), _VERIFY_FIRST acts as a manual
    priority hint and registration order breaks ties."""
    verified = _driver_verified()
    hinted = [k for k in _VERIFY_FIRST if k in d]
    ordered = hinted + [k for k in d if k not in set(hinted)]
    out = {k: d[k] for k in ordered if k not in verified}
    out.update((k, d[k]) for k in ordered if k in verified)
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _rotate_for_verification({
        # SURVEY §2 operators (RDF engine)
        "rdf_extract_canonical": _q_rdf_extract,         # S1+S4, canonicalize
        "rdf_incremental_merge": _q_incremental_merge,   # incremental MERGE (r4s8)
        "rdf_incremental_verdicts": _q_incremental_verdicts,  # incremental validation (r4s8)
        "rdf_validate_shex": _q_validate_shex,           # §2.7 flagship + J1
        "rdf_validate_shacl": _q_validate_shacl,         # §2.7 + J2 targets
        "rdf_validation_report": _q_validation_report,   # §3.1 report graph (r4s10)
        "rdf_w3c_sample": _q_w3c_sample,                 # W3C suite sample (r5)
        "rdf_validate_batch": _q_validate_batch,         # §2.7 single-pass multi-schema
        "rdf_subjects": _q_subjects,                     # P2
        "rdf_predicates": _q_predicates,                 # P2
        "rdf_iris": _q_iris,                             # P2
        "rdf_triples_with_predicate": _q_triples_with_predicate,  # P3
        "rdf_data_info": _q_data_info,                   # A1/A2
        "rdf_cardinalities": _q_cardinalities,           # A5
        "rdf_outgoing": _q_outgoing,                     # A3
        "rdf_type_instances": _q_type_instances,         # P6
        "rdf_error_count": _q_error_count,               # S1 error channel
        "rdf_prefix_map": _q_prefix_map,                 # P8
        "rdf_ntriples": _q_ntriples,                     # K1
        "rdf_shapemap_resolve": _q_shapemap_resolve,     # A4/J1 (r4)
        "rdf_shex2shacl_validate": _q_shex2shacl_validate,  # K3 reverse direction (r4)
        "rdf_sparql_graph_enum": _q_sparql_graph_enum,   # GRAPH ?g {} enumeration (r4)
        "rdf_nquads": _q_nquads,                         # K1 N-Quads (r4)
        "rdf_trig": _q_trig,                             # K1 TriG (r4)
        "rdf_has_pred_subj": _q_has_pred_subj,           # P4 vectorized (r4)
        "rdf_check_datatype": _q_check_datatype,         # P5 vectorized (r4)
        "rdf_graph_fp": _q_graph_fp,                     # P9 corpus fingerprints (r4)
        "rdf_xml_roundtrip": _q_rdfxml_roundtrip,        # K1 RDF/XML round-trip (r4)
        "rdf_jsonld_roundtrip": _q_jsonld_roundtrip,     # K1 JSON-LD round-trip (r4)
        "rdf_rdfjson_roundtrip": _q_rdfjson_roundtrip,   # K1 RDF/JSON round-trip (r4)
        "rdf_dot": _q_dot,                               # K-DOT visual graph (r4)
        "rdf_pagerank": _q_pagerank,                     # KG entity salience (r4)
        "rdf_skolem_count": _q_skolem_count,             # canonicalization
        "rdf_hub_degree": _q_hub_degree,                 # J5 skewed entity agg
        "rdf_sparql_select": _q_sparql_select,           # Q1 SPARQL subset
        "rdf_sparql_agg": _q_sparql_agg,                 # Q1 aggregates/GROUP BY
        "rdf_sparql_bind": _q_sparql_bind,               # Q1 BIND expressions
        "rdf_sparql_having": _q_sparql_having,           # Q1 HAVING post-agg
        "rdf_sparql_in": _q_sparql_in,                   # Q1 IN/NOT IN + ORDER BY expr
        "rdf_sparql_lang": _q_sparql_lang,               # Q1 LANG/DATATYPE accessors
        "rdf_sparql_values": _q_sparql_values,           # Q1 VALUES inline data
        "rdf_sparql_subquery": _q_sparql_subquery,       # Q1 §12 subqueries
        "rdf_sparql_path_alt": _q_sparql_path_alt,       # Q1 property path (alt)
        "rdf_sparql_path_neg": _q_sparql_path_neg,       # Q1 negated property set (r4)
        "social_sparql_knows_plus": _q_sparql_knows_plus,  # Q1 path + (fixpoint)
        "social_sparql_knows_star": _q_sparql_knows_star,  # Q1 path * (zero-length)
        "rdf_sparql_not_exists": _q_sparql_not_exists,     # Q1 FILTER NOT EXISTS
        "rdf_sparql_construct": _q_sparql_construct,       # Q1 CONSTRUCT form
        "rdf_sparql_minus": _q_sparql_minus,               # Q1 MINUS
        "rdf_sparql_group_concat": _q_sparql_group_concat,  # Q1 GROUP_CONCAT/SAMPLE
        "rdf_sparql_describe": _q_sparql_describe,         # Q1 DESCRIBE form
        "rdf_shacl_qualified": _q_shacl_qualified,         # §2.7 sh:qualifiedValueShape
        "rdf_shacl_sparql": _q_shacl_sparql,               # §2.7 SHACL-SPARQL (sh:sparql)
        "social_shacl_pair_equals": _q_shacl_pair_equals,  # §2.7 sh:equals pair
        "social_shacl_rdfxml": _q_shacl_from_xml,        # shapes graph in RDF/XML
        "rdf_shacl_xone": _q_shacl_xone,                   # §2.7 sh:xone
        "rdf_shacl_hasvalue": _q_shacl_hasvalue,           # §2.7 sh:hasValue
        "social_shacl_seqpath": _q_shacl_seqpath,          # §2.7 sh:path sequence
        "social_shacl_qualified_inverse": _q_shacl_qualified_inverse,  # §2.7 disjoint qualified over inverse path (r4)
        "social_shacl_member_prop": _q_shacl_member_prop,  # §2.7 sh:property on or-members (r4s9)
        "social_shacl_node_level": _q_shacl_node_level,    # §2.7 node-shape-level or/not (r4s10)
        "social_triangles": _q_social_triangles,  # KG triangle support (r4s9)
        "sim_pq_ann": _q_sim_pq_ann,  # PQ-ADC ANN + exact re-rank (r4s9; rows-only)
        "rdf_infer_profile": _q_infer_profile,           # §2.6 schema inference
        "rdf_rdfs_closure": _q_rdfs_closure,             # I1 RDFS entailment
        "rdf_owl_sameas": _q_owl_sameas,                 # I1 owl:sameAs merge (r5)
        "rdf_path_reachable": _q_path_reachable,         # P7 path fixpoint
        "rdf_json_graph": _q_json_graph,                 # K2 adjacency export
        "rdf_turtle": _q_turtle,                         # K1 Turtle emitter
        "rdf_stream_validate": _q_stream_validate,       # T1 streaming validation
        "social_extract": _q_social_extract,             # S1 incl. N-Quads/TriG
        "rdf_entity_match": _q_entity_match,             # ER candidate edges (r4s8)
        "social_validate_person": _q_social_validate,    # §2.7 OneOf + recursion
        "social_shexj_validate": _q_social_shexj,        # §2.7 ShExJ syntax
        "social_shex_or_refs": _q_social_or_refs,        # §2.7 @<A> OR @<B> disjunct refs
        "social_shex_nested_or": _q_social_nested_or,    # §2.7 refs two OR-levels deep (r4)
        "social_shex_conj_not_ref": _q_social_conj_not_ref,  # §2.7 ref in mixed-polarity AND (r4)
        "social_shex_paren_not": _q_social_paren_not,    # §2.7 NOT over (@ref OR …) paren group (r4)
        "social_shex_mixed_and": _q_social_mixed_and,    # §2.7 mixed-polarity AND conjuncts (r4)
        "rdf_sparql_graph": _q_sparql_graph,             # Q1 GRAPH doc-scoped BGPs (r4)
        "rdf_sparql_graph_optional": _q_sparql_graph_optional,  # Q1 GRAPH inside OPTIONAL (r4)
        "rdf_sparql_construct_limit": _q_sparql_construct_limit,  # Q1 CONSTRUCT + modifiers (r4)
        "rdf_entity_link": _q_entity_link,               # north-star entity linking
        "catalog_validate_item": _q_catalog_validate,    # §2.7 repeated-prop EachOf
        "rdf_html_extract": _q_html_extract,             # S2 HTML→RDF (RDFa/Microdata)
        # training-data pipeline operators
        "text_features": _q_text_features,
        "text_redact": _q_text_redact,
        "text_repetition": _q_text_repetition,
        "text_quality": _q_text_quality,
        "dedup_exact": _q_dedup_exact,
        "dedup_bloom_incremental": _q_dedup_bloom,   # bloom ingest guard (r4s7)
        "text_corpus_stats": _q_corpus_stats,        # mixture report (r4s7)
        "text_bpe_encode": _q_bpe_encode,            # real BPE tokenizer (r4s7, rows-only)
        "text_pack_token_ids": _q_pack_token_ids,    # concat-and-chunk packing (r4s7)
        "dedup_lsh_pairs": _q_dedup_lsh,
        "dedup_verified_pairs": _q_dedup_verified,   # est-Jaccard refine (r4s8)
        "dedup_lsh_incremental": _q_dedup_lsh_incremental,  # batch-vs-corpus ingest (r4s8)
        "dedup_lsh_keep": _q_dedup_lsh_keep,
        "dedup_clusters": _q_dedup_clusters,
        "dedup_ngram_jaccard": _q_dedup_ngram,
        "text_decontaminate": _q_text_decontaminate,
        "text_span_dedup": _q_text_span_dedup,
        "dedup_simhash_pairs": _q_dedup_simhash,
        "sim_cosine_topk": _q_sim_topk,
        "sim_embedding_near_dups": _q_sim_near_dups,
        "sim_lsh_ann": _q_sim_lsh_ann,
        "sim_ivf_ann": _q_sim_ivf_ann,                   # IVF (rows-only, r5)
        "sim_semantic_dedup_kmeans": _q_sim_semantic_dedup_kmeans,  # r5, rows-only
        "sim_semantic_dedup": _q_sim_semantic_dedup,
        "sim_pca_project": _q_sim_pca,
        "text_top_ngrams": _q_text_top_ngrams,
        "text_tfidf": _q_text_tfidf,
        "text_hash_sample": _q_text_hash_sample,
        "text_source_cap": _q_text_source_cap,           # per-source quota
        "text_leakage_split": _q_text_leakage_split,  # cluster-aware split (r4)
        "text_temperature_mix": _q_temperature_mix,      # α-tempered rebalance (r4)
        "text_epoch_shards": _q_epoch_shards,            # per-epoch shard shuffle (r4)
        "text_lm_score": _q_text_lm_score,
        "text_normalize": _q_text_normalize,
        "text_pack_sequences": _q_text_pack,
        "mm_payload_meta": _q_mm_meta,
        "mm_features": _q_mm_features,
        "mm_frame_samples": _q_mm_frames,
        "mm_audio_features": _q_mm_audio,
        "events_hourly": _q_events_hourly,
        "events_windowed_stream": _q_events_windowed_stream,  # T1+ watermarked windows
        "docs_stream_dedup": _q_docs_stream_dedup,       # stateful streaming dedup (r4)
        "events_sessions": _q_events_sessions,
        "events_sessionize_gap": _q_events_sessionize,
        # code-corpus operators over the north-rule input shape (r4s9)
        "code_winnow_fp": _q_code_winnow_fp,
        "code_winnow_clones": _q_code_winnow_clones,
        "code_winnow_lsh": _q_code_winnow_lsh,
        "code_repo_stats": _q_code_repo_stats,
        "code_license_profile": _q_code_license_profile,
        "code_ident_top": _q_code_ident_top,
    })


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

_T = f"'{_ORACLE_TRIPLES}'"
_V = f"'{_ORACLE_VERDICTS}'"
_D = f"'{_ORACLE_DOCS}'"

_NT_OBJ = """
CASE WHEN obj_kind IN ('iri') THEN '<' || obj_value || '>'
     WHEN obj_kind = 'bnode' AND obj_value NOT LIKE '\\_:%' ESCAPE '\\' THEN '<' || obj_value || '>'
     WHEN obj_kind = 'bnode' THEN obj_value
     WHEN obj_lang IS NOT NULL THEN '"' || obj_value || '"@' || obj_lang
     WHEN obj_datatype IS NOT NULL THEN '"' || obj_value || '"^^<' || obj_datatype || '>'
     ELSE '"' || obj_value || '"' END
"""

# DOT oracle macros — the SQL twins of serialize._qname / _dot_escape.
# Prefix order mirrors _DOT_PREFIXES (left-biased; 'sensor' shares the 'ex'
# IRI so 'ex' always wins, exactly like the Spark side).
_XSD_NS = "http://www.w3.org/2001/XMLSchema#"


def _dot_qn_sql(x: str) -> str:
    parts = []
    for pfx, iri in (("ex", EX), ("xsd", _XSD_NS)):
        n = len(iri)
        parts.append(
            f"WHEN starts_with({x}, '{iri}') AND length({x}) > {n} "
            f"AND NOT regexp_matches(substr({x}, {n + 1}), '[/#]') "
            f"THEN '{pfx}:' || substr({x}, {n + 1})"
        )
    return "CASE " + " ".join(parts) + f" ELSE {x} END"


def _pagerank_sql(iters: int = 10, scale: int = 1_000_000) -> str:
    """Unrolled integer-arithmetic PageRank twin of algebra.pagerank —
    one CTE per iteration; integer ops make summation order irrelevant."""
    ctes = [
        f"e AS (SELECT DISTINCT subj AS src, obj_value AS dst FROM {_T} "
        "WHERE obj_kind <> 'literal')",
        "nodes AS (SELECT DISTINCT node FROM "
        "(SELECT src AS node FROM e UNION ALL SELECT dst FROM e))",
        "od AS (SELECT src, count(*)::BIGINT AS deg FROM e GROUP BY src)",
        "ew AS (SELECT e.src, e.dst, od.deg FROM e JOIN od USING (src))",
        "p AS (SELECT count(*)::BIGINT AS n FROM nodes)",
        f"r0 AS (SELECT node, ({scale} // n)::BIGINT AS rank FROM nodes, p)",
    ]
    for i in range(iters):
        ctes.append(
            f"r{i + 1} AS (SELECT n.node, "
            f"((15 * ({scale} // p.n)) // 100 "
            f"+ (85 * coalesce(s.m, 0)) // 100)::BIGINT AS rank "
            f"FROM nodes n CROSS JOIN p LEFT JOIN ("
            f"SELECT ew.dst, sum(r.rank // ew.deg) AS m "
            f"FROM ew JOIN r{i} r ON ew.src = r.node GROUP BY ew.dst"
            f") s ON s.dst = n.node)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT node AS entity, rank AS rank_int FROM r{iters}"
    )


def _dot_esc_sql(x: str) -> str:
    # backslash, quote, LF, CR — same order as serialize._dot_escape
    return (
        "replace(replace(replace(replace(" + x +
        ", '\\', '\\\\'), '\"', '\\\"'), chr(10), '\\n'), chr(13), '\\r')"
    )


def oracle_sql() -> dict[str, str]:
    ex = EX
    d = {
        "rdf_extract_canonical": f"SELECT DISTINCT * FROM {_T}",
        # incremental MERGE must reproduce the full extraction exactly:
        # stale-version triples retracted, delta extraction appended
        "rdf_incremental_merge": f"SELECT DISTINCT * FROM {_T}",
        # incremental verdict maintenance must reproduce the golden
        # verdicts exactly (delta-only revalidation is exact because
        # validation is doc-scoped)
        "rdf_incremental_verdicts": (
            f"SELECT DISTINCT doc_sha256, node, shape_id, status FROM {_V}"
        ),
        "rdf_validate_shex": (
            f"SELECT doc_sha256, node, status FROM {_V} WHERE shape_id = 'shex_sensor'"
        ),
        "rdf_sparql_graph_enum": (
            f"SELECT DISTINCT 'urn:doc:' || doc_sha256 AS g FROM {_T}"
        ),
        "rdf_shex2shacl_validate": (
            f"SELECT doc_sha256, node, status FROM {_V} WHERE shape_id = 'shex_sensor'"
        ),
        "rdf_validate_shacl": (
            f"SELECT doc_sha256, node, status FROM {_V} WHERE shape_id = 'shacl_sensor'"
        ),
        "rdf_validation_report": f"""
            -- the structural sh:ValidationReport graph derived from the
            -- golden verdicts (same deterministic result skolems as the
            -- engine: sha256(node||US||shapeIRI) first 16 hex chars)
            WITH v AS (
              SELECT doc_sha256, node, status FROM {_V}
              WHERE shape_id = 'shacl_sensor'
            ),
            hdr AS (SELECT doc_sha256, 'urn:report:' || doc_sha256 AS r,
                           min(CASE WHEN status = 'conformant' THEN 1 ELSE 0 END) AS ok
                    FROM v GROUP BY 1, 2),
            bad AS (SELECT doc_sha256, 'urn:report:' || doc_sha256 AS r, node,
                           'urn:report:' || doc_sha256 || ':' ||
                           substr(sha256(node || chr(31) ||
                                  'http://example.org/ValidReadingShape'), 1, 16) AS res
                    FROM v WHERE status <> 'conformant')
            SELECT doc_sha256, r AS subj,
                   'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS pred,
                   'iri' AS obj_kind,
                   'http://www.w3.org/ns/shacl#ValidationReport' AS obj_value,
                   NULL AS obj_lang, NULL AS obj_datatype
            FROM hdr
            UNION ALL
            SELECT doc_sha256, r, 'http://www.w3.org/ns/shacl#conforms', 'literal',
                   CASE WHEN ok = 1 THEN 'true' ELSE 'false' END,
                   NULL, 'http://www.w3.org/2001/XMLSchema#boolean'
            FROM hdr
            UNION ALL
            SELECT doc_sha256, r, 'http://www.w3.org/ns/shacl#result', 'iri', res, NULL, NULL FROM bad
            UNION ALL
            SELECT doc_sha256, res, 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type', 'iri',
                   'http://www.w3.org/ns/shacl#ValidationResult', NULL, NULL FROM bad
            UNION ALL
            SELECT doc_sha256, res, 'http://www.w3.org/ns/shacl#focusNode', 'iri', node, NULL, NULL FROM bad
            UNION ALL
            SELECT doc_sha256, res, 'http://www.w3.org/ns/shacl#sourceShape', 'iri',
                   'http://example.org/ValidReadingShape', NULL, NULL FROM bad
            UNION ALL
            SELECT doc_sha256, res, 'http://www.w3.org/ns/shacl#resultSeverity', 'iri',
                   'http://www.w3.org/ns/shacl#Violation', NULL, NULL FROM bad
        """,
        "rdf_validate_batch": f"SELECT doc_sha256, node, shape_id, status FROM {_V}",
        "rdf_subjects": f"SELECT DISTINCT subj FROM {_T}",
        "rdf_predicates": f"SELECT DISTINCT pred FROM {_T}",
        "rdf_iris": f"""
            SELECT DISTINCT iri FROM (
                SELECT subj AS iri FROM {_T} WHERE subj NOT LIKE '\\_:%' ESCAPE '\\'
                UNION ALL SELECT pred FROM {_T}
                UNION ALL SELECT obj_value FROM {_T} WHERE obj_kind = 'iri'
            )
        """,
        "rdf_triples_with_predicate": (
            f"SELECT DISTINCT doc_sha256, subj, obj_value FROM {_T} "
            f"WHERE pred = '{ex}status'"
        ),
        "rdf_data_info": f"""
            SELECT doc_sha256,
                   count(*)::BIGINT AS n_statements,
                   count(DISTINCT pred)::BIGINT AS n_distinct_predicates
            FROM (SELECT DISTINCT * FROM {_T}) GROUP BY doc_sha256
        """,
        "rdf_cardinalities": f"""
            SELECT doc_sha256, subj, pred, count(*)::BIGINT AS n_values
            FROM (SELECT DISTINCT * FROM {_T}) GROUP BY doc_sha256, subj, pred
        """,
        "rdf_outgoing": (
            f"SELECT DISTINCT pred, obj_value FROM {_T} WHERE subj = '{ex}shared0'"
        ),
        "rdf_type_instances": f"""
            SELECT DISTINCT doc_sha256, subj FROM {_T}
            WHERE pred = 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'
              AND obj_value = '{ex}Reading'
        """,
        "rdf_error_count": f"""
            SELECT count(*)::BIGINT AS n_error_docs FROM {_D}
            WHERE content_sha256 NOT IN (SELECT DISTINCT doc_sha256 FROM {_T})
        """,
        "rdf_prefix_map": f"""
            SELECT * FROM (VALUES
                ('ex', '{ex}'),
                ('sensor', '{ex}'),
                ('xsd', 'http://www.w3.org/2001/XMLSchema#')
            ) AS t(prefix, iri)
        """,
        "rdf_shapemap_resolve": f"""
            SELECT DISTINCT doc_sha256, subj AS node,
                   '{ex}ValidReading' AS shape_id
            FROM {_T}
            WHERE pred = 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'
              AND obj_value = '{ex}Reading'
            UNION ALL
            SELECT DISTINCT doc_sha256, subj, '{ex}Stationed'
            FROM {_T} WHERE pred = '{ex}station' AND obj_value = '{ex}hub'
            UNION ALL
            SELECT DISTINCT doc_sha256, subj, '{ex}SharedShape'
            FROM {_T} WHERE subj = '{ex}shared0'
            UNION ALL
            SELECT DISTINCT doc_sha256, subj, '{ex}SharedShape'
            FROM {_T} WHERE subj = '{ex}shared1'
        """,
        "rdf_ntriples": f"""
            SELECT DISTINCT
              (CASE WHEN subj LIKE '\\_:%' ESCAPE '\\' THEN subj ELSE '<' || subj || '>' END)
              || ' <' || pred || '> ' || {_NT_OBJ} || ' .' AS line
            FROM {_T}
        """,
        "rdf_nquads": f"""
            SELECT DISTINCT
              (CASE WHEN subj LIKE '\\_:%' ESCAPE '\\' THEN subj ELSE '<' || subj || '>' END)
              || ' <' || pred || '> ' || {_NT_OBJ}
              || ' <urn:doc:' || doc_sha256 || '> .' AS line
            FROM {_T}
        """,
        "rdf_has_pred_subj": f"""
            WITH s AS (SELECT DISTINCT subj FROM {_T}),
            p AS (SELECT DISTINCT subj FROM {_T} WHERE pred = '{EX}label')
            SELECT s.subj, (p.subj IS NOT NULL) AS has_pred
            FROM s LEFT JOIN p ON p.subj = s.subj
        """,
        "rdf_check_datatype": f"""
            -- datatype_ok = literal & dt IRI match & no lang & lexical form
            SELECT DISTINCT subj, pred, obj_value,
                   coalesce(obj_kind = 'literal'
                    AND obj_datatype = 'http://www.w3.org/2001/XMLSchema#decimal'
                    AND obj_lang IS NULL
                    AND regexp_matches(obj_value, '^[+-]?([0-9]+\\.?[0-9]*|\\.[0-9]+)$'),
                    FALSE) AS datatype_ok
            FROM {_T}
            WHERE pred IN ('{EX}readingTemperature', '{EX}label')
        """,
        "rdf_graph_fp": f"""
            -- bnode-blind canonical graph fingerprint per document:
            -- sorted DISTINCT masked lines, md5 of the newline join
            WITH l AS (
              SELECT DISTINCT doc_sha256,
                (CASE WHEN subj LIKE 'urn:skolem:%' THEN '_:' ELSE subj END)
                || ' ' || pred || ' ' ||
                (CASE WHEN obj_kind = 'literal'
                      THEN '"' || obj_value || '"'
                           || coalesce('@' || obj_lang, '')
                           || coalesce('^^' || obj_datatype, '')
                      WHEN obj_value LIKE 'urn:skolem:%' THEN '_:'
                      ELSE obj_value END) AS line
              FROM {_T}
            ), fp AS (
              SELECT doc_sha256,
                     md5(string_agg(line, chr(10) ORDER BY line)) AS graph_fp
              FROM l GROUP BY doc_sha256
            )
            SELECT graph_fp, count(*) AS n_docs, min(doc_sha256) AS rep_doc
            FROM fp GROUP BY graph_fp
        """,
        "rdf_trig": f"""
            WITH l AS (
              SELECT DISTINCT doc_sha256,
                (CASE WHEN subj LIKE '\\_:%' ESCAPE '\\' THEN subj ELSE '<' || subj || '>' END)
                || ' <' || pred || '> ' || {_NT_OBJ} || ' .' AS line
              FROM {_T}
            )
            SELECT doc_sha256,
                   '<urn:doc:' || doc_sha256 || '> {{' || chr(10) || '  '
                   || string_agg(line, chr(10) || '  ' ORDER BY line)
                   || chr(10) || '}}' AS trig
            FROM l GROUP BY doc_sha256
        """,
        # round-trip oracles: serialize→reparse→canonicalize must reproduce
        # the canonical triple store exactly (emitter + parser jointly
        # lossless); the oracle is simply the store itself
        "rdf_xml_roundtrip": f"""
            SELECT DISTINCT doc_sha256, subj, pred, obj_kind, obj_value,
                            obj_lang, obj_datatype FROM {_T}
        """,
        "rdf_jsonld_roundtrip": f"""
            SELECT DISTINCT doc_sha256, subj, pred, obj_kind, obj_value,
                            obj_lang, obj_datatype FROM {_T}
        """,
        "rdf_rdfjson_roundtrip": f"""
            SELECT DISTINCT doc_sha256, subj, pred, obj_kind, obj_value,
                            obj_lang, obj_datatype FROM {_T}
        """,
        "rdf_pagerank": _pagerank_sql(10),
        "rdf_dot": f"""
            WITH t AS (
              SELECT *,
                (subj LIKE '\\_:%' ESCAPE '\\') AS s_bn,
                md5('r|' || subj) AS sid,
                {_dot_esc_sql("obj_value")} ||
                  (CASE WHEN obj_lang IS NOT NULL THEN '@' || obj_lang
                        WHEN obj_datatype IS NOT NULL
                          THEN '^^' || {_dot_qn_sql("obj_datatype")}
                        ELSE '' END) AS littext
              FROM {_T}
            ), t2 AS (
              SELECT *,
                CASE WHEN obj_kind = 'literal'
                     THEN md5('l|' || subj || '|' || pred || '|' || littext)
                     ELSE md5('r|' || obj_value) END AS oid
              FROM t
            )
            SELECT DISTINCT doc_sha256, line FROM (
              SELECT doc_sha256,
                '"N' || sid || '" [shape=' ||
                (CASE WHEN s_bn THEN 'circle' ELSE 'ellipse' END) ||
                ', label="' ||
                (CASE WHEN s_bn THEN {_dot_esc_sql("subj")}
                      ELSE {_dot_esc_sql(_dot_qn_sql("subj"))} END) ||
                '"];' AS line
              FROM t2
              UNION ALL
              SELECT doc_sha256,
                '"N' || oid || '" [shape=' ||
                (CASE WHEN obj_kind = 'literal' THEN 'record'
                      WHEN obj_kind = 'bnode' THEN 'circle'
                      ELSE 'ellipse' END) ||
                ', label="' ||
                (CASE WHEN obj_kind = 'literal' THEN littext
                      WHEN obj_kind = 'bnode' THEN
                        (CASE WHEN obj_value LIKE '\\_:%' ESCAPE '\\'
                              THEN {_dot_esc_sql("obj_value")}
                              ELSE {_dot_esc_sql(_dot_qn_sql("obj_value"))} END)
                      ELSE {_dot_esc_sql(_dot_qn_sql("obj_value"))} END) ||
                '"];'
              FROM t2
              UNION ALL
              SELECT doc_sha256,
                '"N' || sid || '" -> "N' || oid || '" [label="' ||
                {_dot_esc_sql(_dot_qn_sql("pred"))} || '"];'
              FROM t2
            )
        """,
        "rdf_skolem_count": f"""
            SELECT count(DISTINCT subj)::BIGINT AS n_skolem_subjects
            FROM {_T} WHERE subj LIKE 'urn:skolem:%'
        """,
        "rdf_hub_degree": f"""
            SELECT '{ex}hub' AS entity, count(*)::BIGINT AS degree FROM (
                SELECT subj AS e FROM (SELECT DISTINCT * FROM {_T})
                 WHERE subj = '{ex}hub'
                UNION ALL
                SELECT obj_value FROM (SELECT DISTINCT * FROM {_T})
                 WHERE obj_kind <> 'literal' AND obj_value = '{ex}hub'
            )
        """,
        "rdf_sparql_select": f"""
            WITH m AS (SELECT DISTINCT subj, pred, obj_kind, obj_value, obj_lang,
                              obj_datatype FROM {_T})
            SELECT DISTINCT a.subj AS s, b.obj_value AS t
            FROM m a
            JOIN m b ON b.subj = a.subj
            JOIN m c ON c.subj = a.subj
            WHERE a.pred = 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'
              AND a.obj_value = '{ex}Reading'
              AND b.pred = '{ex}readingTemperature'
              AND c.pred = '{ex}status' AND c.obj_kind = 'literal' AND c.obj_value = 'OK'
              AND CAST(b.obj_value AS DOUBLE) >= 19.5
        """,
        "rdf_sparql_agg": f"""
            -- merged model = 6-column distinct; aggregates are bag-semantics
            -- over it (each model triple counts once)
            WITH m AS (SELECT DISTINCT subj, pred, obj_kind, obj_value, obj_lang,
                              obj_datatype FROM {_T})
            SELECT obj_value AS st, count(*)::BIGINT AS n
            FROM m WHERE pred = '{ex}status' GROUP BY 1
        """,
        "rdf_sparql_bind": f"""
            WITH m AS (SELECT DISTINCT subj, pred, obj_kind, obj_value, obj_lang,
                              obj_datatype FROM {_T})
            SELECT subj AS s, CAST(obj_value AS DOUBLE) * 2 AS t2
            FROM m WHERE pred = '{ex}readingTemperature'
              AND CAST(obj_value AS DOUBLE) * 2 >= 39.0
        """,
        "rdf_sparql_lang": f"""
            -- literals only (BOUND(DATATYPE) ⇔ kind = literal); LANG "" for
            -- plain/typed, DATATYPE rdf:langString for tagged, xsd:string
            -- default for plain
            WITH m AS (SELECT DISTINCT subj, pred, obj_kind, obj_value, obj_lang,
                              obj_datatype FROM {_T})
            SELECT subj AS s, pred AS p,
                   COALESCE(obj_lang, '') AS l,
                   CASE WHEN obj_lang IS NOT NULL
                        THEN 'http://www.w3.org/1999/02/22-rdf-syntax-ns#langString'
                        ELSE COALESCE(obj_datatype,
                                      'http://www.w3.org/2001/XMLSchema#string')
                   END AS dt
            FROM m WHERE obj_kind = 'literal'
        """,
        "rdf_sparql_having": f"""
            WITH m AS (SELECT DISTINCT subj, pred, obj_kind, obj_value, obj_lang,
                              obj_datatype FROM {_T})
            SELECT obj_value AS st, count(*)::BIGINT AS n
            FROM m WHERE pred = '{ex}status' GROUP BY 1 HAVING count(*) > 4000
        """,
        "rdf_sparql_in": f"""
            WITH m AS (SELECT DISTINCT subj, pred, obj_value FROM {_T})
            SELECT subj AS s, obj_value AS st
            FROM m WHERE pred = '{ex}status'
              AND obj_value IN ('OK', 'BROKEN')
              AND subj NOT IN ('{ex}nothing')
        """,
        "rdf_sparql_subquery": f"""
            WITH m AS (SELECT DISTINCT subj, pred, obj_kind, obj_value, obj_lang,
                              obj_datatype FROM {_T}),
            st AS (SELECT s.subj AS s, s.obj_value AS st, t.obj_value AS t
                   FROM m s JOIN m t ON t.subj = s.subj
                   WHERE s.pred = '{ex}status'
                     AND t.pred = '{ex}readingTemperature'),
            mx AS (SELECT st, MAX(CAST(t AS DOUBLE)) AS maxt
                   FROM st GROUP BY st)
            SELECT st.s AS s, st.t AS t, mx.maxt AS maxt
            FROM st JOIN mx USING (st)
        """,
        "rdf_sparql_values": f"""
            WITH m AS (SELECT DISTINCT subj, pred, obj_kind, obj_value, obj_lang,
                              obj_datatype FROM {_T})
            SELECT subj AS s, obj_value AS st
            FROM m WHERE pred = '{ex}status' AND obj_value IN ('OK', 'BROKEN')
        """,
        "rdf_sparql_path_alt": f"""
            WITH m AS (SELECT DISTINCT subj, pred, obj_kind, obj_value, obj_lang,
                              obj_datatype FROM {_T})
            SELECT subj AS s, obj_value AS o FROM m
            WHERE pred IN ('http://www.w3.org/1999/02/22-rdf-syntax-ns#type',
                           '{ex}status')
        """,
        "rdf_sparql_path_neg": f"""
            WITH m AS (SELECT DISTINCT subj, pred, obj_value FROM {_T})
            SELECT DISTINCT s, o FROM (
              SELECT subj AS s, obj_value AS o FROM m
              WHERE pred <> 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'
              UNION
              SELECT obj_value AS s, subj AS o FROM m
              WHERE pred <> '{ex}status'
            )
        """,
        "social_sparql_knows_plus": f"""
            WITH RECURSIVE m AS (
              SELECT DISTINCT subj, obj_value FROM '{_SOC_TRIPLES}'
              WHERE pred = '{ex}knows'
            ), r AS (
              SELECT subj AS a, obj_value AS b FROM m
              UNION
              SELECT r.a, m.obj_value FROM r JOIN m ON m.subj = r.b
            )
            SELECT DISTINCT a, b FROM r
        """,
        "rdf_sparql_construct": f"""
            -- CONSTRUCT {{ ?s ex:hasState ?st }} over the merged model:
            -- one row per distinct (s, st); status values are plain
            -- literals (the engine's term-kind heuristic agrees)
            WITH m AS (SELECT DISTINCT subj, pred, obj_value FROM {_T})
            SELECT DISTINCT subj, '{ex}hasState' AS pred,
                   'literal' AS obj_kind, obj_value,
                   NULL AS obj_lang, NULL AS obj_datatype
            FROM m WHERE pred = '{ex}status'
        """,
        "rdf_sparql_not_exists": f"""
            WITH m AS (SELECT DISTINCT subj, pred, obj_value FROM {_T})
            SELECT DISTINCT subj AS s FROM m
            WHERE pred = 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'
              AND obj_value = '{ex}Reading'
              AND subj NOT IN (SELECT subj FROM m WHERE pred = '{ex}label')
        """,
        "rdf_sparql_minus": f"""
            -- MINUS with a shared always-bound ?s = plain anti-join
            WITH m AS (SELECT DISTINCT subj, pred, obj_value FROM {_T})
            SELECT DISTINCT subj AS s FROM m
            WHERE pred = 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'
              AND obj_value = '{ex}Reading'
              AND subj NOT IN (
                SELECT subj FROM m
                WHERE pred = '{ex}status' AND obj_value = 'BROKEN')
        """,
        "rdf_sparql_group_concat": f"""
            -- engine sorts concat elements lexically; SAMPLE = min()
            WITH m AS (SELECT DISTINCT subj, pred, obj_value FROM {_T}),
            st AS (SELECT subj, obj_value AS st FROM m WHERE pred = '{ex}status'),
            ty AS (SELECT subj, obj_value AS dt FROM m
                   WHERE pred = 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type')
            SELECT st.st, string_agg(DISTINCT ty.dt, ',' ORDER BY ty.dt) AS types,
                   min(st.subj) AS one
            FROM st JOIN ty USING (subj)
            GROUP BY st.st
        """,
        "rdf_sparql_describe": f"""
            -- DESCRIBE = every merged-model triple of the matched subjects
            WITH m AS (SELECT DISTINCT subj, pred, obj_kind, obj_value,
                              obj_lang, obj_datatype FROM {_T})
            SELECT * FROM m
            WHERE subj IN (
              SELECT subj FROM m
              WHERE pred = '{ex}status' AND obj_value = 'BROKEN')
        """,
        "social_sparql_knows_star": f"""
            -- knows* = zero-length (every graph term reflexive, literals
            -- included, SPARQL 1.1 §18.4) ∪ knows+
            WITH RECURSIVE m AS (
              SELECT DISTINCT subj, obj_value FROM '{_SOC_TRIPLES}'
              WHERE pred = '{ex}knows'
            ), r AS (
              SELECT subj AS a, obj_value AS b FROM m
              UNION
              SELECT r.a, m.obj_value FROM r JOIN m ON m.subj = r.b
            ), terms AS (
              SELECT DISTINCT subj AS t FROM '{_SOC_TRIPLES}'
              UNION SELECT DISTINCT obj_value FROM '{_SOC_TRIPLES}'
            )
            SELECT DISTINCT a, b FROM (
              SELECT t AS a, t AS b FROM terms
              UNION ALL SELECT a, b FROM r
            )
        """,
        "rdf_shacl_sparql": f"""
            -- SHACL-SPARQL verdict twin: targets = Readings per doc;
            -- violators = focus nodes where the constraint query (cold
            -- temp AND status OK, doc-scoped) has a solution
            WITH m AS (SELECT DISTINCT doc_sha256, subj, pred, obj_kind,
                              obj_value, obj_lang, obj_datatype FROM {_T}),
            tgt AS (SELECT DISTINCT doc_sha256, subj FROM m
                    WHERE pred = 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'
                      AND obj_value = '{ex}Reading'),
            viol AS (SELECT DISTINCT t.doc_sha256, t.subj
                     FROM m t JOIN m s
                       ON s.doc_sha256 = t.doc_sha256 AND s.subj = t.subj
                     WHERE t.pred = '{ex}readingTemperature'
                       AND TRY_CAST(t.obj_value AS DOUBLE) < 19.0
                       AND s.pred = '{ex}status' AND s.obj_value = 'OK')
            SELECT tgt.doc_sha256, tgt.subj AS node,
                   CASE WHEN v.subj IS NULL THEN 'conformant'
                        ELSE 'nonconformant' END AS status
            FROM tgt LEFT JOIN viol v
              ON v.doc_sha256 = tgt.doc_sha256 AND v.subj = tgt.subj
        """,
        "rdf_shacl_qualified": f"""
            -- sh:qualifiedValueShape: count values inside [18,20]; verdict
            -- is count >= qualifiedMinCount(2); other values never violate
            WITH m AS (
              SELECT DISTINCT doc_sha256, subj, pred, obj_value FROM {_T}
            ), focus AS (
              SELECT DISTINCT doc_sha256, subj AS node FROM m
              WHERE pred = 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'
                AND obj_value = '{ex}Reading'
            ), q AS (
              SELECT doc_sha256, subj AS node, count(*) AS nq FROM m
              WHERE pred = '{ex}readingTemperature'
                AND TRY_CAST(obj_value AS DOUBLE) >= 18
                AND TRY_CAST(obj_value AS DOUBLE) <= 20
              GROUP BY 1, 2
            )
            SELECT f.doc_sha256, f.node,
                   CASE WHEN coalesce(q.nq, 0) >= 2
                        THEN 'conformant' ELSE 'nonconformant' END AS status
            FROM focus f LEFT JOIN q ON q.doc_sha256 = f.doc_sha256 AND q.node = f.node
        """,
        "social_shacl_pair_equals": f"""
            -- sh:equals ex:phone on path ex:email: per-focus value SETS
            -- must be identical (sorted distinct concat; '|' never occurs
            -- in emails/phones)
            WITH m AS (
              SELECT DISTINCT doc_sha256, subj, pred, obj_value
              FROM '{_SOC_TRIPLES}'
            ), focus AS (
              SELECT DISTINCT doc_sha256, subj AS node FROM m
              WHERE pred = 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'
                AND obj_value = '{ex}Person'
            ), ev AS (
              SELECT doc_sha256, subj AS node,
                     string_agg(DISTINCT obj_value, '|' ORDER BY obj_value) AS vs
              FROM m WHERE pred = '{ex}email' GROUP BY 1, 2
            ), pv AS (
              SELECT doc_sha256, subj AS node,
                     string_agg(DISTINCT obj_value, '|' ORDER BY obj_value) AS vs
              FROM m WHERE pred = '{ex}phone' GROUP BY 1, 2
            )
            SELECT f.doc_sha256, f.node,
                   CASE WHEN coalesce(ev.vs, '') = coalesce(pv.vs, '')
                        THEN 'conformant' ELSE 'nonconformant' END AS status
            FROM focus f
            LEFT JOIN ev ON ev.doc_sha256 = f.doc_sha256 AND ev.node = f.node
            LEFT JOIN pv ON pv.doc_sha256 = f.doc_sha256 AND pv.node = f.node
        """,
        "rdf_shacl_xone": f"""
            -- sh:xone(≥18, ≤20): each temperature value must satisfy
            -- exactly one member; NULL casts satisfy none → violation
            WITH m AS (
              SELECT DISTINCT doc_sha256, subj, pred, obj_value FROM {_T}
            ), focus AS (
              SELECT DISTINCT doc_sha256, subj AS node FROM m
              WHERE pred = 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'
                AND obj_value = '{ex}Reading'
            ), bad AS (
              SELECT DISTINCT doc_sha256, subj AS node FROM m
              WHERE pred = '{ex}readingTemperature'
                AND (CASE WHEN TRY_CAST(obj_value AS DOUBLE) >= 18 THEN 1 ELSE 0 END
                   + CASE WHEN TRY_CAST(obj_value AS DOUBLE) <= 20 THEN 1 ELSE 0 END) <> 1
            )
            SELECT f.doc_sha256, f.node,
                   CASE WHEN b.node IS NULL
                        THEN 'conformant' ELSE 'nonconformant' END AS status
            FROM focus f
            LEFT JOIN bad b ON b.doc_sha256 = f.doc_sha256 AND b.node = f.node
        """,
        "rdf_shacl_hasvalue": f"""
            -- sh:hasValue "OK": conformant iff the status value set
            -- includes the plain literal "OK" (value-set literal match:
            -- no lang tag; string-family datatype)
            WITH m AS (
              SELECT DISTINCT doc_sha256, subj, pred, obj_kind, obj_value,
                     obj_lang, obj_datatype FROM {_T}
            ), focus AS (
              SELECT DISTINCT doc_sha256, subj AS node FROM m
              WHERE pred = 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'
                AND obj_value = '{ex}Reading'
            ), q AS (
              SELECT doc_sha256, subj AS node, count(*) AS nq FROM m
              WHERE pred = '{ex}status' AND obj_kind = 'literal'
                AND obj_value = 'OK' AND obj_lang IS NULL
                AND (obj_datatype IS NULL
                     OR obj_datatype = 'http://www.w3.org/2001/XMLSchema#string'
                     OR obj_datatype = 'http://www.w3.org/2001/XMLSchema#integer'
                     OR obj_datatype = 'http://www.w3.org/2001/XMLSchema#decimal')
              GROUP BY 1, 2
            )
            SELECT f.doc_sha256, f.node,
                   CASE WHEN coalesce(q.nq, 0) >= 1
                        THEN 'conformant' ELSE 'nonconformant' END AS status
            FROM focus f LEFT JOIN q ON q.doc_sha256 = f.doc_sha256 AND q.node = f.node
        """,
        "social_shacl_seqpath": f"""
            -- sequence path ex:knows/ex:email with sh:minCount 1: ≥ 1
            -- DISTINCT path value (set semantics over value tuples)
            WITH m AS (
              SELECT DISTINCT doc_sha256, subj, pred, obj_kind, obj_value,
                     obj_lang, obj_datatype FROM '{_SOC_TRIPLES}'
            ), focus AS (
              SELECT DISTINCT doc_sha256, subj AS node FROM m
              WHERE pred = 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'
                AND obj_value = '{ex}Person'
            ), vals AS (
              SELECT DISTINCT k.doc_sha256, k.subj AS node, e.obj_kind,
                     e.obj_value, e.obj_lang, e.obj_datatype
              FROM m k JOIN m e
                ON e.doc_sha256 = k.doc_sha256 AND e.subj = k.obj_value
               AND e.pred = '{ex}email'
              WHERE k.pred = '{ex}knows'
            ), q AS (
              SELECT doc_sha256, node, count(*) AS n FROM vals GROUP BY 1, 2
            )
            SELECT f.doc_sha256, f.node,
                   CASE WHEN coalesce(q.n, 0) >= 1
                        THEN 'conformant' ELSE 'nonconformant' END AS status
            FROM focus f LEFT JOIN q ON q.doc_sha256 = f.doc_sha256 AND q.node = f.node
        """,
        "social_shacl_qualified_inverse": f"""
            -- disjoint qualified sh:node/sh:nodeKind siblings over an
            -- inverse path: followers = knows-subjects pointing at the
            -- focus; bnode kind = '_:'/skolem prefix (evaluator's
            -- subject-kind rule); disjointness excludes values conforming
            -- to the sibling shape from each count
            WITH m AS (
              SELECT DISTINCT doc_sha256, subj, pred, obj_kind, obj_value
              FROM '{_SOC_TRIPLES}'
            ), focus AS (
              SELECT DISTINCT doc_sha256, subj AS node FROM m
              WHERE pred = 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'
                AND obj_value = '{ex}Person'
            ), emailed AS (
              SELECT DISTINCT doc_sha256, subj FROM m WHERE pred = '{ex}email'
            ), followers AS (
              SELECT k.doc_sha256, k.obj_value AS node, k.subj AS val,
                     (k.subj LIKE '\\_:%' ESCAPE '\\'
                      OR k.subj LIKE 'urn:skolem:%') AS is_bnode,
                     (e.subj IS NOT NULL) AS has_email
              FROM m k LEFT JOIN emailed e
                ON e.doc_sha256 = k.doc_sha256 AND e.subj = k.subj
              WHERE k.pred = '{ex}knows'
            ), counts AS (
              SELECT doc_sha256, node,
                     SUM(CASE WHEN has_email AND is_bnode THEN 1 ELSE 0 END) AS n_em,
                     SUM(CASE WHEN NOT has_email AND NOT is_bnode THEN 1 ELSE 0 END) AS n_iri
              FROM followers GROUP BY 1, 2
            )
            SELECT f.doc_sha256, f.node,
                   CASE WHEN coalesce(c.n_em, 0) >= 1
                         AND coalesce(c.n_iri, 0) >= 1
                        THEN 'conformant' ELSE 'nonconformant' END AS status
            FROM focus f LEFT JOIN counts c
              ON c.doc_sha256 = f.doc_sha256 AND c.node = f.node
        """,
        "rdf_infer_profile": f"""
            WITH m AS (SELECT DISTINCT subj, pred, obj_kind, obj_value, obj_lang,
                              obj_datatype FROM {_T}),
            f AS (SELECT DISTINCT subj FROM m
                  WHERE pred = 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'
                    AND obj_value = '{ex}Reading'),
            arcs AS (SELECT m.* FROM m JOIN f ON m.subj = f.subj),
            per AS (SELECT subj, pred, count(*) AS n FROM arcs GROUP BY 1, 2)
            SELECT pred,
                   (CASE WHEN count(*) < (SELECT count(*) FROM f)
                         THEN 0 ELSE min(n) END)::BIGINT AS card_min,
                   max(n)::BIGINT AS card_max,
                   count(*)::BIGINT AS n_subjects
            FROM per GROUP BY pred
        """,
        "rdf_rdfs_closure": f"""
            WITH m AS (SELECT DISTINCT subj, pred, obj_kind, obj_value FROM {_T}),
            r AS (SELECT count(DISTINCT subj) AS c FROM m
                  WHERE pred = 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'
                    AND obj_value = '{ex}Reading')
            SELECT '{ex}Reading' AS cls, c::BIGINT AS n_subjects FROM r
            UNION ALL SELECT '{ex}Observation', c::BIGINT FROM r
            UNION ALL SELECT '{ex}Entity', c::BIGINT FROM r
            UNION ALL SELECT '{ex}Station',
              (SELECT count(DISTINCT obj_value) FROM m
               WHERE pred = '{ex}station' AND obj_kind <> 'literal')::BIGINT
        """,
        "rdf_owl_sameas": f"""
            -- owl:sameAs merge: same alias derivation as the Spark entry,
            -- recursive-CTE identity components (symmetric closure,
            -- min-label canon), eq-sym mirrors + canonical rewrites of
            -- changed rows, asserted-wins dedup
            WITH RECURSIVE base AS (
              SELECT DISTINCT doc_sha256, subj, pred, obj_kind, obj_value,
                     obj_lang, obj_datatype FROM {_T}
            ), ent AS (
              SELECT DISTINCT doc_sha256, subj AS s, obj_value AS status
              FROM base
              WHERE pred = '{ex}status' AND subj LIKE 'http://example.org/%'
            ), ident AS (
              SELECT doc_sha256,
                     regexp_replace(s, '^http://example\\.org/',
                                    'http://alias.example/') AS subj,
                     'http://www.w3.org/2002/07/owl#sameAs' AS pred,
                     'iri' AS obj_kind, s AS obj_value,
                     CAST(NULL AS VARCHAR) AS obj_lang,
                     CAST(NULL AS VARCHAR) AS obj_datatype
              FROM ent
              UNION ALL
              SELECT doc_sha256, s,
                     'http://www.w3.org/2002/07/owl#sameAs', 'iri',
                     regexp_replace(s, '^http://example\\.org/',
                                    'http://alias2.example/'),
                     CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
              FROM ent WHERE status = 'BROKEN'
            ), asserted AS (
              SELECT doc_sha256, subj, pred, obj_kind, obj_value, obj_lang,
                     obj_datatype, 'asserted' AS origin FROM base
              UNION ALL
              SELECT DISTINCT doc_sha256, subj, pred, obj_kind, obj_value,
                     obj_lang, obj_datatype, 'asserted' FROM ident
            ), e AS (
              SELECT DISTINCT subj AS a, obj_value AS b FROM ident
              UNION
              SELECT DISTINCT obj_value, subj FROM ident
            ), nodes AS (
              SELECT DISTINCT a AS n FROM e
            ), r AS (
              SELECT n, n AS reach FROM nodes
              UNION
              SELECT r.n, e.b FROM r JOIN e ON e.a = r.reach
            ), mapping AS (
              SELECT n, canon FROM (
                SELECT n, min(reach) AS canon FROM r GROUP BY n
              ) WHERE n <> canon
            ), sym AS (
              SELECT DISTINCT doc_sha256, o AS subj, pred, obj_kind,
                     s2 AS obj_value, obj_lang, obj_datatype,
                     'inferred' AS origin
              FROM (SELECT doc_sha256, subj AS s2, pred, obj_kind,
                           obj_value AS o, obj_lang, obj_datatype FROM ident)
              WHERE s2 <> o
            ), rewritten AS (
              SELECT DISTINCT t.doc_sha256,
                     coalesce(ms.canon, t.subj) AS subj,
                     t.pred, t.obj_kind,
                     CASE WHEN t.obj_kind <> 'literal'
                          THEN coalesce(mo.canon, t.obj_value)
                          ELSE t.obj_value END AS obj_value,
                     t.obj_lang, t.obj_datatype, 'inferred' AS origin
              FROM asserted t
              LEFT JOIN mapping ms ON ms.n = t.subj
              LEFT JOIN mapping mo
                ON mo.n = t.obj_value AND t.obj_kind <> 'literal'
              WHERE ms.n IS NOT NULL
                 OR (mo.n IS NOT NULL AND t.obj_kind <> 'literal')
            ), unioned AS (
              SELECT * FROM asserted
              UNION ALL SELECT * FROM sym
              UNION ALL
              SELECT * FROM rewritten
              WHERE NOT (pred = 'http://www.w3.org/2002/07/owl#sameAs'
                         AND subj = obj_value)
            )
            SELECT doc_sha256, subj, pred, obj_kind, obj_value, obj_lang,
                   obj_datatype, min(origin) AS origin
            FROM unioned GROUP BY 1, 2, 3, 4, 5, 6, 7
        """,
        "rdf_path_reachable": f"""
            SELECT DISTINCT doc_sha256, subj AS src, obj_value AS dst
            FROM {_T} WHERE pred = '{ex}station'
        """,
        "rdf_json_graph": f"""
            WITH m AS (SELECT DISTINCT subj, pred, obj_kind, obj_value, obj_lang,
                              obj_datatype FROM {_T})
            SELECT subj, count(*)::BIGINT AS n_arcs FROM m GROUP BY subj
        """,
        "rdf_turtle": f"""
            WITH m AS (SELECT DISTINCT doc_sha256, subj, pred, obj_kind, obj_value,
                              obj_lang, obj_datatype FROM {_T}),
            po AS (
              SELECT doc_sha256, subj, pred,
                     string_agg({_NT_OBJ}, ', ' ORDER BY ({_NT_OBJ})) AS objs
              FROM m GROUP BY 1, 2, 3
            ),
            st AS (
              SELECT doc_sha256, subj,
                     string_agg('<' || pred || '> ' || objs,
                                ' ;' || chr(10) || '    '
                                ORDER BY ('<' || pred || '> ' || objs)) AS body
              FROM po GROUP BY 1, 2
            )
            SELECT doc_sha256,
                   (CASE WHEN subj LIKE '\\_:%' ESCAPE '\\' THEN subj
                         ELSE '<' || subj || '>' END) || ' ' || body || ' .' AS turtle
            FROM st
        """,
        "rdf_stream_validate": (
            f"SELECT doc_sha256, node, status FROM {_V} WHERE shape_id = 'shex_sensor'"
        ),
        "social_extract": f"SELECT DISTINCT * FROM '{_SOC_TRIPLES}'",
        "rdf_entity_match": f"""
            -- ER candidates: star edges per shared-email value group,
            -- with 1/4 of persons given a twin entity sharing their email
            WITH email AS (
              SELECT DISTINCT subj, obj_value
              FROM '{_SOC_TRIPLES}'
              WHERE pred = 'http://example.org/email' AND obj_kind = 'literal'
            ), aug AS (
              SELECT subj, obj_value FROM email
              UNION ALL
              SELECT subj || '#alt', obj_value FROM email
              WHERE substring(md5(subj), 1, 1) IN ('0', '4', '8', 'c')
            ), keyed AS (
              SELECT DISTINCT subj AS entity, obj_value AS val FROM aug
            ), grp AS (
              SELECT val, min(entity) AS a, count(*) AS n
              FROM keyed GROUP BY 1
              HAVING count(*) BETWEEN 2 AND 1000
            )
            SELECT DISTINCT g.a, k.entity AS b,
                   'http://example.org/email' AS evidence_pred
            FROM keyed k JOIN grp g ON k.val = g.val
            WHERE k.entity <> g.a
        """,
        "social_validate_person": (
            f"SELECT doc_sha256, node, status FROM '{_SOC_VERDICTS}'"
        ),
        "catalog_validate_item": (
            f"SELECT doc_sha256, node, status FROM '{_CAT_VERDICTS}'"
        ),
        "rdf_entity_link": f"""
            -- entity linking: connected components over the (symmetric)
            -- knows graph via a recursive CTE, min-label canon, then the
            -- subject/IRI-object rewrite the Spark operator performs
            WITH RECURSIVE m AS (
              SELECT DISTINCT doc_sha256, subj, pred, obj_kind, obj_value,
                     obj_lang, obj_datatype FROM '{_SOC_TRIPLES}'
            ), e AS (
              SELECT DISTINCT subj AS a, obj_value AS b FROM m
              WHERE pred = '{EX}knows' AND obj_kind <> 'literal'
              UNION
              SELECT DISTINCT obj_value, subj FROM m
              WHERE pred = '{EX}knows' AND obj_kind <> 'literal'
            ), nodes AS (
              SELECT DISTINCT a AS n FROM e
            ), r AS (
              SELECT n, n AS reach FROM nodes
              UNION
              SELECT r.n, e.b FROM r JOIN e ON e.a = r.reach
            ), comp AS (
              SELECT n, min(reach) AS canon FROM r GROUP BY n
            )
            SELECT DISTINCT m.doc_sha256,
                   coalesce(cs.canon, m.subj) AS subj,
                   m.pred, m.obj_kind,
                   CASE WHEN m.obj_kind <> 'literal'
                        THEN coalesce(co.canon, m.obj_value)
                        ELSE m.obj_value END AS obj_value,
                   m.obj_lang, m.obj_datatype
            FROM m
            LEFT JOIN comp cs ON cs.n = m.subj
            LEFT JOIN comp co ON co.n = m.obj_value AND m.obj_kind <> 'literal'
        """,
        "rdf_sparql_construct_limit": f"""
            -- CONSTRUCT template over the first 100 BROKEN subjects
            -- (solution sequence ordered by ?s, then instantiated)
            SELECT s AS subj, '{ex}flagged' AS pred, 'literal' AS obj_kind,
                   'BROKEN' AS obj_value, CAST(NULL AS VARCHAR) AS obj_lang,
                   CAST(NULL AS VARCHAR) AS obj_datatype
            FROM (
              SELECT DISTINCT subj AS s
              FROM (SELECT DISTINCT subj, pred, obj_kind, obj_value,
                           obj_lang, obj_datatype FROM {_T})
              WHERE pred = '{ex}status' AND obj_kind = 'literal'
                AND obj_value = 'BROKEN'
              ORDER BY s LIMIT 100
            )
        """,
        "rdf_sparql_graph": f"""
            -- GRAPH ?g scopes the BGP to one document; ?g = urn:doc:<sha>
            SELECT 'urn:doc:' || doc_sha256 AS g, subj AS s
            FROM (SELECT DISTINCT doc_sha256, subj, pred, obj_kind,
                         obj_value, obj_lang, obj_datatype FROM {_T})
            WHERE pred = '{ex}status' AND obj_kind = 'literal'
              AND obj_value = 'BROKEN'
        """,
        "rdf_sparql_graph_optional": f"""
            -- GRAPH inside OPTIONAL: BROKEN subjects from the merged
            -- model, left-extended with the document graph carrying their
            -- ex:label (DISTINCT projection on both sides)
            WITH m AS (
              SELECT DISTINCT doc_sha256, subj, pred, obj_kind, obj_value
              FROM {_T}
            ), mm AS (
              SELECT DISTINCT subj, pred, obj_kind, obj_value FROM m
            ), broken AS (
              SELECT DISTINCT subj AS s FROM mm
              WHERE pred = '{ex}status' AND obj_kind = 'literal'
                AND obj_value = 'BROKEN'
            ), lab AS (
              SELECT DISTINCT doc_sha256, subj FROM m
              WHERE pred = '{ex}label'
            )
            SELECT DISTINCT b.s AS s, 'urn:doc:' || l.doc_sha256 AS g
            FROM broken b LEFT JOIN lab l ON l.subj = b.s
        """,
        "social_shex_conj_not_ref": f"""
            -- ref inside a mixed-polarity conjunction: a knows-value
            -- conforms iff it is an IRI and NOT (@ex:Verified OR BNODE);
            -- @ex:Verified = exactly one ex:verified triple, value "true".
            -- Focus conforms iff no knows value fails and it has exactly
            -- one name (the `.` {{1}} constraint).
            WITH m AS (
              SELECT DISTINCT doc_sha256, subj, pred, obj_kind, obj_value
              FROM '{_SOC_TRIPLES}'
            ), focus AS (
              SELECT DISTINCT doc_sha256, subj AS node FROM m
              WHERE pred = 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'
                AND obj_value = 'http://example.org/Person'
            ), ver AS (
              SELECT doc_sha256, subj FROM m
              WHERE pred = 'http://example.org/verified'
              GROUP BY 1, 2 HAVING count(*) = 1 AND max(obj_value) = 'true'
            ), name1 AS (
              SELECT doc_sha256, subj FROM m
              WHERE pred = 'http://example.org/name'
              GROUP BY 1, 2 HAVING count(*) = 1
            ), badknows AS (
              SELECT DISTINCT k.doc_sha256, k.subj AS node
              FROM m k
              LEFT JOIN ver v
                ON v.doc_sha256 = k.doc_sha256 AND v.subj = k.obj_value
              WHERE k.pred = 'http://example.org/knows'
                AND (k.obj_kind <> 'iri' OR v.subj IS NOT NULL)
            )
            SELECT f.doc_sha256, f.node,
                   CASE WHEN n.subj IS NOT NULL AND b.node IS NULL
                        THEN 'conformant' ELSE 'nonconformant' END AS status
            FROM focus f
            LEFT JOIN name1 n
              ON n.doc_sha256 = f.doc_sha256 AND n.subj = f.node
            LEFT JOIN badknows b
              ON b.doc_sha256 = f.doc_sha256 AND b.node = f.node
        """,
        "social_shex_nested_or": f"""
            -- refs two OR-levels deep: knows-value conforms iff it is
            -- ex:nobody (never in the data), has EXACTLY ONE email
            -- (@ex:Emailed), or is a bnode-kind subject (the synthetic
            -- BNODE disjunct of @ex:Reachable); focus conforms iff no
            -- knows value fails AND it has exactly one name
            WITH m AS (
              SELECT DISTINCT doc_sha256, subj, pred, obj_kind, obj_value
              FROM '{_SOC_TRIPLES}'
            ), focus AS (
              SELECT DISTINCT doc_sha256, subj AS node FROM m
              WHERE pred = 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'
                AND obj_value = '{ex}Person'
            ), emailed AS (
              SELECT doc_sha256, subj AS node FROM m
              WHERE pred = '{ex}email' GROUP BY 1, 2 HAVING count(*) = 1
            ), subjects AS (
              SELECT DISTINCT doc_sha256, subj AS node FROM m
            ), reachable AS (
              SELECT node, doc_sha256 FROM emailed
              UNION
              SELECT node, doc_sha256 FROM subjects
              WHERE node LIKE 'urn:skolem:%' OR node LIKE '\\_:%' ESCAPE '\\'
            ), bad AS (
              SELECT DISTINCT k.doc_sha256, k.subj AS node
              FROM m k
              WHERE k.pred = '{ex}knows'
                AND k.obj_value <> '{ex}nobody'
                AND NOT EXISTS (
                  SELECT 1 FROM reachable r
                  WHERE r.doc_sha256 = k.doc_sha256 AND r.node = k.obj_value
                )
            ), names AS (
              SELECT doc_sha256, subj AS node, count(*) AS n FROM m
              WHERE pred = '{ex}name' GROUP BY 1, 2
            )
            SELECT f.doc_sha256, f.node,
                   CASE WHEN b.node IS NULL AND coalesce(nm.n, 0) = 1
                        THEN 'conformant' ELSE 'nonconformant' END AS status
            FROM focus f
            LEFT JOIN bad b ON b.doc_sha256 = f.doc_sha256 AND b.node = f.node
            LEFT JOIN names nm ON nm.doc_sha256 = f.doc_sha256 AND nm.node = f.node
        """,
        "social_shex_mixed_and": f"""
            -- ex:name (PATTERN "^Person" AND NOT (["Person 1"]~ OR
            -- MINLENGTH 13)) ? : a name value passes iff it matches
            -- ^Person AND is neither a "Person 1"-stem nor >= 13 chars;
            -- cardinality ? — absent name conforms, any failing value
            -- does not
            WITH m AS (
              SELECT DISTINCT doc_sha256, subj, pred, obj_value FROM '{_SOC_TRIPLES}'
            ), focus AS (
              SELECT DISTINCT doc_sha256, subj AS node FROM m
              WHERE pred = 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'
                AND obj_value = '{EX}Person'
            ), bad AS (
              SELECT DISTINCT doc_sha256, subj AS node FROM m
              WHERE pred = '{EX}name'
                AND NOT (regexp_matches(obj_value, '^Person')
                         AND NOT (starts_with(obj_value, 'Person 1')
                                  OR length(obj_value) >= 13))
            )
            SELECT f.doc_sha256, f.node,
                   CASE WHEN b.node IS NULL
                        THEN 'conformant' ELSE 'nonconformant' END AS status
            FROM focus f
            LEFT JOIN bad b ON b.doc_sha256 = f.doc_sha256 AND b.node = f.node
        """,
        "social_shex_paren_not": f"""
            -- NOT (@ex:EmailPerson OR [ ex:nobody ]): a known node FAILS
            -- iff it has exactly one email (EmailPerson's {{1,1}} EachOf)
            -- or is the ex:nobody IRI; focus conforms iff no knows value
            -- fails (cardinality * imposes no counts)
            WITH m AS (
              SELECT DISTINCT doc_sha256, subj, pred, obj_value FROM '{_SOC_TRIPLES}'
            ), focus AS (
              SELECT DISTINCT doc_sha256, subj AS node FROM m
              WHERE pred = 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'
                AND obj_value = '{EX}Person'
            ), e1 AS (
              SELECT doc_sha256, subj FROM m WHERE pred = '{EX}email'
              GROUP BY 1, 2 HAVING count(*) = 1
            ), bad AS (
              SELECT DISTINCT k.doc_sha256, k.subj AS node
              FROM m k
              LEFT JOIN e1 ON e1.doc_sha256 = k.doc_sha256 AND e1.subj = k.obj_value
              WHERE k.pred = '{EX}knows'
                AND (e1.subj IS NOT NULL OR k.obj_value = '{EX}nobody')
            )
            SELECT f.doc_sha256, f.node,
                   CASE WHEN b.node IS NULL
                        THEN 'conformant' ELSE 'nonconformant' END AS status
            FROM focus f
            LEFT JOIN bad b ON b.doc_sha256 = f.doc_sha256 AND b.node = f.node
        """,
        "social_shex_or_refs": f"""
            -- @ex:EmailPerson OR @ex:PhonePerson over every ex:knows value:
            -- a known node conforms to a disjunct iff it has EXACTLY ONE
            -- email (resp. phone) triple ({{ ex:email . }} is a {{1,1}}
            -- EachOf); focus conforms iff no known node fails both
            WITH m AS (
              SELECT DISTINCT doc_sha256, subj, pred, obj_value FROM '{_SOC_TRIPLES}'
            ), focus AS (
              SELECT DISTINCT doc_sha256, subj AS node FROM m
              WHERE pred = 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'
                AND obj_value = '{EX}Person'
            ), e1 AS (
              SELECT doc_sha256, subj FROM m WHERE pred = '{EX}email'
              GROUP BY 1, 2 HAVING count(*) = 1
            ), p1 AS (
              SELECT doc_sha256, subj FROM m WHERE pred = '{EX}phone'
              GROUP BY 1, 2 HAVING count(*) = 1
            ), bad AS (
              SELECT DISTINCT k.doc_sha256, k.subj AS node
              FROM m k
              LEFT JOIN e1 ON e1.doc_sha256 = k.doc_sha256 AND e1.subj = k.obj_value
              LEFT JOIN p1 ON p1.doc_sha256 = k.doc_sha256 AND p1.subj = k.obj_value
              WHERE k.pred = '{EX}knows' AND e1.subj IS NULL AND p1.subj IS NULL
            )
            SELECT f.doc_sha256, f.node,
                   CASE WHEN b.node IS NULL
                        THEN 'conformant' ELSE 'nonconformant' END AS status
            FROM focus f
            LEFT JOIN bad b ON b.doc_sha256 = f.doc_sha256 AND b.node = f.node
        """,
        "rdf_html_extract": f"SELECT DISTINCT * FROM '{_WEB_TRIPLES}'",
        "text_features": """
            SELECT doc_id,
                   len(regexp_split_to_array(trim(text), '\\s+'))::BIGINT AS n_tokens,
                   len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))::BIGINT AS n_bpe_tokens,
                   CASE
                     WHEN (len(regexp_split_to_array(text, '\\bthe\\b'))-1
                          +len(regexp_split_to_array(text, '\\ba\\b'))-1
                          +len(regexp_split_to_array(text, '\\bof\\b'))-1) >=
                          greatest(
                            len(regexp_split_to_array(text, '\\bthe\\b'))-1+len(regexp_split_to_array(text, '\\ba\\b'))-1+len(regexp_split_to_array(text, '\\bof\\b'))-1,
                            len(regexp_split_to_array(text, '\\bel\\b'))-1+len(regexp_split_to_array(text, '\\bla\\b'))-1+len(regexp_split_to_array(text, '\\bde\\b'))-1,
                            len(regexp_split_to_array(text, '\\bder\\b'))-1+len(regexp_split_to_array(text, '\\bdie\\b'))-1+len(regexp_split_to_array(text, '\\bdas\\b'))-1,
                            len(regexp_split_to_array(text, '\\ble\\b'))-1+len(regexp_split_to_array(text, '\\bles\\b'))-1+len(regexp_split_to_array(text, '\\bune\\b'))-1)
                      AND greatest(
                            len(regexp_split_to_array(text, '\\bthe\\b'))-1+len(regexp_split_to_array(text, '\\ba\\b'))-1+len(regexp_split_to_array(text, '\\bof\\b'))-1,
                            len(regexp_split_to_array(text, '\\bel\\b'))-1+len(regexp_split_to_array(text, '\\bla\\b'))-1+len(regexp_split_to_array(text, '\\bde\\b'))-1,
                            len(regexp_split_to_array(text, '\\bder\\b'))-1+len(regexp_split_to_array(text, '\\bdie\\b'))-1+len(regexp_split_to_array(text, '\\bdas\\b'))-1,
                            len(regexp_split_to_array(text, '\\ble\\b'))-1+len(regexp_split_to_array(text, '\\bles\\b'))-1+len(regexp_split_to_array(text, '\\bune\\b'))-1) > 0
                     THEN 'en'
                     WHEN (len(regexp_split_to_array(text, '\\bel\\b'))-1
                          +len(regexp_split_to_array(text, '\\bla\\b'))-1
                          +len(regexp_split_to_array(text, '\\bde\\b'))-1) >=
                          greatest(
                            len(regexp_split_to_array(text, '\\bel\\b'))-1+len(regexp_split_to_array(text, '\\bla\\b'))-1+len(regexp_split_to_array(text, '\\bde\\b'))-1,
                            len(regexp_split_to_array(text, '\\bder\\b'))-1+len(regexp_split_to_array(text, '\\bdie\\b'))-1+len(regexp_split_to_array(text, '\\bdas\\b'))-1,
                            len(regexp_split_to_array(text, '\\ble\\b'))-1+len(regexp_split_to_array(text, '\\bles\\b'))-1+len(regexp_split_to_array(text, '\\bune\\b'))-1)
                      AND (len(regexp_split_to_array(text, '\\bel\\b'))-1
                          +len(regexp_split_to_array(text, '\\bla\\b'))-1
                          +len(regexp_split_to_array(text, '\\bde\\b'))-1) > 0
                     THEN 'es'
                     WHEN (len(regexp_split_to_array(text, '\\bder\\b'))-1
                          +len(regexp_split_to_array(text, '\\bdie\\b'))-1
                          +len(regexp_split_to_array(text, '\\bdas\\b'))-1) >=
                          greatest(
                            len(regexp_split_to_array(text, '\\bder\\b'))-1+len(regexp_split_to_array(text, '\\bdie\\b'))-1+len(regexp_split_to_array(text, '\\bdas\\b'))-1,
                            len(regexp_split_to_array(text, '\\ble\\b'))-1+len(regexp_split_to_array(text, '\\bles\\b'))-1+len(regexp_split_to_array(text, '\\bune\\b'))-1)
                      AND (len(regexp_split_to_array(text, '\\bder\\b'))-1
                          +len(regexp_split_to_array(text, '\\bdie\\b'))-1
                          +len(regexp_split_to_array(text, '\\bdas\\b'))-1) > 0
                     THEN 'de'
                     WHEN (len(regexp_split_to_array(text, '\\ble\\b'))-1
                          +len(regexp_split_to_array(text, '\\bles\\b'))-1
                          +len(regexp_split_to_array(text, '\\bune\\b'))-1) > 0
                     THEN 'fr'
                     ELSE 'unknown'
                   END AS lang_pred,
                   round(
                     0.4 * least((n_chars::DOUBLE / len(regexp_split_to_array(trim(text), '\\s+'))) / 8.0, 1.0)
                   + 0.3 * least(((len(regexp_split_to_array(text, '\\bthe\\b'))-1
                                  +len(regexp_split_to_array(text, '\\ba\\b'))-1
                                  +len(regexp_split_to_array(text, '\\bof\\b'))-1
                                  +len(regexp_split_to_array(text, '\\band\\b'))-1
                                  +len(regexp_split_to_array(text, '\\bto\\b'))-1
                                  +len(regexp_split_to_array(text, '\\bin\\b'))-1)::DOUBLE
                                  / len(regexp_split_to_array(trim(text), '\\s+'))) * 5.0, 1.0)
                   + 0.3 * least(n_chars::DOUBLE / 500.0, 1.0), 4) AS quality,
                   md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
            FROM documents
        """,
        "text_repetition": r"""
            -- Gopher-style repetition signals: integer numerators only
            -- (floats would hash differently across engines); bigram
            -- frequencies via list functions, mirroring the Spark
            -- zip_with/transform expression exactly
            WITH d AS (
              SELECT doc_id, coalesce(text, '') AS text FROM documents
            ), p AS (
              SELECT doc_id,
                list_filter(string_split(text, chr(10)), x -> x <> '') AS lines,
                list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS words
              FROM d
            ), g AS (
              SELECT doc_id, lines, words,
                list_transform(range(1, greatest(len(words), 1)),
                               i -> words[i] || ' ' || words[i+1]) AS grams
              FROM p
            )
            SELECT doc_id,
              len(lines)::BIGINT AS n_lines,
              (len(lines) - len(list_distinct(lines)))::BIGINT AS n_dup_lines,
              (length(array_to_string(lines, ''))
               - length(array_to_string(list_distinct(lines), '')))::BIGINT AS n_dup_line_chars,
              len(words)::BIGINT AS n_words,
              (len(words) - len(list_distinct(words)))::BIGINT AS n_dup_words,
              coalesce(list_max(list_transform(list_distinct(grams),
                       gg -> len(list_filter(grams, x -> x = gg)))), 0)::BIGINT AS top_bigram_count
            FROM g
        """,
        "text_quality": r"""
            -- C4/Gopher-style keep/drop: floor() is the portable
            -- double->int path (Spark casts truncate, DuckDB casts round)
            WITH p AS (
              SELECT doc_id,
                list_filter(regexp_split_to_array(trim(coalesce(text,'')), '\s+'),
                            x -> x <> '') AS words
              FROM documents
            ), m AS (
              SELECT doc_id,
                len(words)::BIGINT AS n_words,
                CASE WHEN len(words) > 0
                     THEN CAST(floor(length(array_to_string(words,'')) * 100.0 / len(words)) AS BIGINT)
                     ELSE 0 END AS mean_word_len_x100,
                CASE WHEN len(words) > 0
                     THEN CAST(floor((len(words) - len(list_distinct(words))) * 100.0 / len(words)) AS BIGINT)
                     ELSE 0 END AS dup_word_pct
              FROM p
            ), r AS (
              SELECT doc_id, n_words, mean_word_len_x100, dup_word_pct,
                list_filter([
                  CASE WHEN n_words < 20 THEN 'too_few_words' END,
                  CASE WHEN n_words > 100000 THEN 'too_many_words' END,
                  CASE WHEN mean_word_len_x100 < 200 THEN 'mean_word_too_short' END,
                  CASE WHEN mean_word_len_x100 > 1200 THEN 'mean_word_too_long' END,
                  CASE WHEN dup_word_pct > 60 THEN 'repetitive' END
                ], x -> x IS NOT NULL) AS reasons
              FROM m
            )
            SELECT doc_id, n_words, mean_word_len_x100, dup_word_pct,
                   len(reasons) = 0 AS keep,
                   coalesce(array_to_string(reasons, ','), '') AS drop_reasons
            FROM r
        """,
        "text_redact": r"""
            -- identical RE2-safe patterns as functions/textops.py redact_pii;
            -- IPv4 replaced BEFORE phone (phone pattern matches inside
            -- digit-grouped dotted IPs), counts from each step's input
            WITH s1 AS (
              SELECT doc_id, text,
                regexp_replace(text,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g')
                AS after_email
              FROM documents
            ), s2 AS (
              SELECT doc_id, text, after_email,
                regexp_replace(after_email,
                  '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g')
                AS after_ip
              FROM s1
            )
            SELECT doc_id,
                   regexp_replace(after_ip,
                     '\+?[0-9]{1,3}[-. ][0-9]{2,4}[-. ][0-9]{3,6}', '<PHONE>', 'g')
                     AS clean_text,
                   (len(regexp_extract_all(text,
                      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                    + len(regexp_extract_all(after_email,
                      '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}'))
                    + len(regexp_extract_all(after_ip,
                      '\+?[0-9]{1,3}[-. ][0-9]{2,4}[-. ][0-9]{3,6}')))::BIGINT
                     AS n_redactions
            FROM s2
        """,
        "dedup_exact": """
            -- normalized-80-char-prefix fingerprint (full-text exact dups
            -- are absent at sf0.01; prefix groups make the check non-trivial)
            SELECT md5(substring(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), 1, 80)) AS fp,
                   count(*)::BIGINT AS n_docs, min(doc_id) AS min_doc_id
            FROM documents GROUP BY 1 HAVING count(*) > 1
        """,
        "dedup_bloom_incremental": """
            -- bloom membership by relational division: a doc is maybe_dup
            -- iff every one of its k=5 distinct bit positions is lit by
            -- some corpus key (m = 2^20; same md5-derived positions)
            WITH keyed AS (
              SELECT doc_id,
                     md5(substring(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), 1, 80)) AS fp
              FROM documents
            ),
            cpos AS (
              SELECT DISTINCT
                     CAST('0x' || substring(md5('bloom:' || CAST(i AS VARCHAR) || ':' || fp), 1, 8) AS BIGINT) % 1048576 AS pos
              FROM (SELECT DISTINCT fp FROM keyed WHERE doc_id % 10 < 8), range(5) r(i)
            ),
            ipos AS (
              SELECT DISTINCT doc_id, fp,
                     CAST('0x' || substring(md5('bloom:' || CAST(i AS VARCHAR) || ':' || fp), 1, 8) AS BIGINT) % 1048576 AS pos
              FROM keyed, range(5) r(i) WHERE doc_id % 10 >= 8
            )
            SELECT i.doc_id, i.fp,
                   (count(*) = count(c.pos)) AS maybe_dup
            FROM ipos i LEFT JOIN cpos c ON i.pos = c.pos
            GROUP BY i.doc_id, i.fp
        """,
        "text_corpus_stats": """
            -- mixture report: counts + exact-integer ppm shares
            WITH per AS (
              SELECT lang, source,
                     count(*)::BIGINT AS n_docs,
                     sum(len(regexp_split_to_array(trim(text), '\\s+')))::BIGINT AS n_tokens,
                     sum(length(text))::BIGINT AS n_chars
              FROM documents GROUP BY lang, source
            ), tot AS (
              SELECT sum(n_docs) AS td, sum(n_tokens) AS tt FROM per
            )
            SELECT lang, source, n_docs, n_tokens, n_chars,
                   ((n_docs * 1000000) // td)::BIGINT AS docs_ppm,
                   ((n_tokens * 1000000) // tt)::BIGINT AS tokens_ppm
            FROM per, tot
        """,
        "text_pack_token_ids": """
            -- per-token twin of the streaming chunker: global order within
            -- shard = (doc_id, word ordinal); sequences = (rn-1)//32 groups;
            -- trailing partials dropped (HAVING = seq_len)
            WITH split AS (
              SELECT (doc_id % 8)::INT AS shard, doc_id,
                     regexp_split_to_array(lower(trim(text)), '\\s+') AS arr
              FROM documents
            ),
            toks AS (
              SELECT shard, doc_id,
                     unnest(arr) AS w, generate_subscripts(arr, 1) AS ord
              FROM split
            ),
            ranked AS (
              SELECT shard,
                     CAST(CAST('0x' || substring(md5(w), 1, 7) AS BIGINT) AS INT) AS tid,
                     row_number() OVER (PARTITION BY shard ORDER BY doc_id, ord) AS rn
              FROM toks
            )
            SELECT shard, ((rn - 1) // 32)::BIGINT AS seq_idx,
                   array_to_string(list(tid ORDER BY rn), ',') AS token_ids
            FROM ranked
            GROUP BY shard, ((rn - 1) // 32)
            HAVING count(*) = 32
        """,
        "dedup_lsh_pairs": """
            WITH sigs AS (
              SELECT doc_id,
                     list_transform(range(0, 16), i ->
                       list_min(list_transform(
                         list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+')),
                         w -> md5(i::VARCHAR || ':' || w)))) AS sig
              FROM documents
            ), bands AS (
              SELECT doc_id, b AS band,
                     md5(array_to_string(list_slice(sig, b*4+1, b*4+4), '|')) AS band_key
              FROM sigs, unnest(range(0, 4)) AS t(b)
            )
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
        """,
        "dedup_lsh_incremental": """
            -- batch (doc_id % 4 = 0) vs corpus (rest): drop on any corpus
            -- bucket collision OR smaller-id batch bucket-mate; dup_of =
            -- smallest colliding doc, NULL when kept
            WITH sigs AS (
              SELECT doc_id,
                     list_transform(range(0, 16), i ->
                       list_min(list_transform(
                         list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+')),
                         w -> md5(i::VARCHAR || ':' || w)))) AS sig
              FROM documents
            ), bands AS (
              SELECT doc_id, b AS band,
                     md5(array_to_string(list_slice(sig, b*4+1, b*4+4), '|')) AS band_key
              FROM sigs, unnest(range(0, 4)) AS t(b)
            ), batchb AS (
              SELECT * FROM bands WHERE doc_id % 4 = 0
            ), cmin AS (
              SELECT band, band_key, min(doc_id) AS cmin
              FROM bands WHERE doc_id % 4 <> 0 GROUP BY 1, 2
            ), bmin AS (
              SELECT band, band_key, min(doc_id) AS bmin
              FROM batchb GROUP BY 1, 2
            ), per AS (
              SELECT b.doc_id,
                     min(c.cmin) AS corpus_dup, min(m.bmin) AS batch_rep
              FROM batchb b
              LEFT JOIN cmin c ON b.band = c.band AND b.band_key = c.band_key
              JOIN bmin m ON b.band = m.band AND b.band_key = m.band_key
              GROUP BY 1
            )
            SELECT doc_id,
                   (corpus_dup IS NULL AND batch_rep = doc_id) AS keep,
                   CASE
                     WHEN corpus_dup IS NOT NULL AND batch_rep <> doc_id
                       THEN least(corpus_dup, batch_rep)
                     WHEN corpus_dup IS NOT NULL THEN corpus_dup
                     WHEN batch_rep <> doc_id THEN batch_rep
                   END AS dup_of
            FROM per
        """,
        "dedup_verified_pairs": """
            -- LSH candidates refined by estimated Jaccard: fraction of
            -- equal minhash slots; n_eq >= 8 == est_jaccard >= 0.5 (exact)
            WITH sigs AS (
              SELECT doc_id,
                     list_transform(range(0, 16), i ->
                       list_min(list_transform(
                         list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+')),
                         w -> md5(i::VARCHAR || ':' || w)))) AS sig
              FROM documents
            ), bands AS (
              SELECT doc_id, b AS band,
                     md5(array_to_string(list_slice(sig, b*4+1, b*4+4), '|')) AS band_key
              FROM sigs, unnest(range(0, 4)) AS t(b)
            ), pairs AS (
              SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM bands a JOIN bands b
                ON a.band = b.band AND a.band_key = b.band_key
               AND a.doc_id < b.doc_id
            ), scored AS (
              SELECT p.doc_a, p.doc_b,
                     CAST(len(list_filter(range(1, 17),
                           i -> sa.sig[i] = sb.sig[i])) AS INTEGER) AS n_eq
              FROM pairs p
              JOIN sigs sa ON sa.doc_id = p.doc_a
              JOIN sigs sb ON sb.doc_id = p.doc_b
            )
            SELECT doc_a, doc_b, n_eq,
                   CAST(n_eq AS DOUBLE) / 16 AS est_jaccard
            FROM scored
            WHERE n_eq >= 8
        """,
        "dedup_lsh_keep": """
            WITH sigs AS (
              SELECT doc_id,
                     list_transform(range(0, 16), i ->
                       list_min(list_transform(
                         list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+')),
                         w -> md5(i::VARCHAR || ':' || w)))) AS sig
              FROM documents
            ), bands AS (
              SELECT doc_id, b AS band,
                     md5(array_to_string(list_slice(sig, b*4+1, b*4+4), '|')) AS band_key
              FROM sigs, unnest(range(0, 4)) AS t(b)
            ), bmin AS (
              SELECT band, band_key, min(doc_id) AS bmin
              FROM bands GROUP BY 1, 2
            )
            SELECT b.doc_id, min(m.bmin) AS cluster_rep,
                   (b.doc_id = min(m.bmin)) AS keep
            FROM bands b JOIN bmin m ON b.band = m.band AND b.band_key = m.band_key
            GROUP BY b.doc_id
        """,
        "text_leakage_split": """
            -- cluster-aware split: component = min doc_id of the
            -- normalized-prefix exact-dup family (singletons: own doc_id),
            -- md5 bucket into cumulative 96/2/2 ranges
            WITH fp AS (
              SELECT doc_id,
                     md5(substring(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), 1, 80)) AS fp
              FROM documents
            ), groups AS (
              SELECT fp, min(doc_id) AS component
              FROM fp GROUP BY 1 HAVING count(*) > 1
            ), keyed AS (
              SELECT f.doc_id, COALESCE(g.component, f.doc_id) AS split_key
              FROM fp f LEFT JOIN groups g ON g.fp = f.fp
            )
            SELECT doc_id, split_key,
                   CASE WHEN bucket < 960000 THEN 'train'
                        WHEN bucket < 980000 THEN 'val'
                        ELSE 'test' END AS split
            FROM (
              SELECT doc_id, split_key,
                     CAST('0x' || substring(md5('split:v1:' || split_key), 1, 8)
                          AS BIGINT) % 1000000 AS bucket
              FROM keyed
            )
        """,
        "dedup_clusters": """
            WITH RECURSIVE sigs AS (
              SELECT doc_id,
                     list_transform(range(0, 16), i ->
                       list_min(list_transform(
                         list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+')),
                         w -> md5(i::VARCHAR || ':' || w)))) AS sig
              FROM documents
            ), bands AS (
              SELECT doc_id, b AS band,
                     md5(array_to_string(list_slice(sig, b*4+1, b*4+4), '|')) AS band_key
              FROM sigs, unnest(range(0, 4)) AS t(b)
            ), pairs AS (
              SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM bands a JOIN bands b
                ON a.band = b.band AND a.band_key = b.band_key
               AND a.doc_id < b.doc_id
            ), edges AS (
              SELECT doc_a AS src, doc_b AS dst FROM pairs
              UNION
              SELECT doc_b AS src, doc_a AS dst FROM pairs
            ), reach(node, lbl) AS (
              SELECT src, src FROM edges
              UNION
              SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
            )
            SELECT node AS doc_id, MIN(lbl) AS component
            FROM reach GROUP BY node
        """,
        "dedup_ngram_jaccard": """
            WITH toks AS (
              SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS ws
              FROM documents
            ), sh AS (
              SELECT doc_id, unnest(
                CASE WHEN len(ws) >= 2
                     THEN list_distinct(list_transform(range(0, len(ws)-1),
                              i -> array_to_string(list_slice(ws, i+1, i+2), ' ')))
                     ELSE list_distinct(ws) END) AS shingle
              FROM toks
            ), sizes AS (
              SELECT doc_id, count(*)::BIGINT AS n_sh FROM sh GROUP BY doc_id
            ), inter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS n_inter
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT doc_a, doc_b,
                   round(n_inter::DOUBLE / (sa.n_sh + sb.n_sh - n_inter), 4) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b
            WHERE n_inter::DOUBLE / (sa.n_sh + sb.n_sh - n_inter) >= 0.5
        """,
        "text_decontaminate": """
            -- benchmark = deterministic corpus slice (doc_id % 97 = 0);
            -- trigram fallback to distinct words for docs shorter than n
            -- mirrors ngram_shingles
            WITH toks AS (
              SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS ws
              FROM documents
            ), sh AS (
              SELECT doc_id, unnest(
                CASE WHEN len(ws) >= 3
                     THEN list_distinct(list_transform(range(0, len(ws)-2),
                              i -> array_to_string(list_slice(ws, i+1, i+3), ' ')))
                     ELSE list_distinct(ws) END) AS ngram
              FROM toks
            ), bench AS (
              SELECT DISTINCT ngram FROM sh WHERE doc_id % 97 = 0
            )
            SELECT doc_id, count(*)::BIGINT AS n_hit_ngrams
            FROM sh JOIN bench USING (ngram)
            GROUP BY doc_id
        """,
        "text_span_dedup": """
            -- C4-style duplicate-span removal, 3-word non-overlapping
            -- chunks, df counted over distinct docs; empty spans never
            -- count and are always kept; string_agg of zero kept rows is
            -- NULL in DuckDB vs '' in Spark -> coalesce
            WITH toks AS (
              SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS ws
              FROM documents
            ), spans AS (
              SELECT doc_id,
                     unnest(range(0, (len(ws)+2)//3)) AS pos,
                     unnest(list_transform(range(0, (len(ws)+2)//3),
                         i -> array_to_string(list_slice(ws, i*3+1, i*3+3), ' '))) AS span
              FROM toks
            ), dup AS (
              SELECT span AS k FROM spans WHERE trim(span) <> ''
              GROUP BY span HAVING count(DISTINCT doc_id) >= 2
            )
            SELECT doc_id,
                   coalesce(string_agg(CASE WHEN d.k IS NULL THEN span END,
                                       ' ' ORDER BY pos), '') AS clean_text,
                   count(*)::BIGINT AS n_spans,
                   sum(CASE WHEN d.k IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
                       AS n_spans_dropped
            FROM spans LEFT JOIN dup d ON d.k = span
            GROUP BY doc_id
        """,
        "dedup_simhash_pairs": """
            -- portable simhash twin: same md5-derived 64-bit token hash
            -- (hi = first 8 hex chars, lo = next 8), same bit-majority,
            -- same 4x16-bit band blocking as functions/dedup.py:simhash64
            WITH toks AS (
              SELECT doc_id,
                     unnest(list_distinct(
                       regexp_split_to_array(lower(trim(text)), '\\s+'))) AS w
              FROM documents
            ), h AS (
              SELECT doc_id,
                     CAST('0x' || substring(md5(w), 1, 8) AS BIGINT) AS hi,
                     CAST('0x' || substring(md5(w), 9, 8) AS BIGINT) AS lo
              FROM toks
            ), votes AS (
              SELECT doc_id, b,
                     sum(CASE WHEN ((CASE WHEN b < 32 THEN lo >> b
                                         ELSE hi >> (b - 32) END) & 1) = 1
                              THEN 1 ELSE -1 END) AS v
              FROM h, unnest(range(0, 64)) AS t(b)
              GROUP BY 1, 2
            ), bands AS (
              SELECT doc_id, b // 16 AS band,
                     sum(CASE WHEN v > 0 THEN 1 ELSE 0 END << (b % 16)) AS band_val
              FROM votes GROUP BY 1, 2
            )
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.band_val = b.band_val AND a.doc_id < b.doc_id
        """,
        "sim_lsh_ann": """
            -- hyperplane components are md5-derived (similarity.py:_plane_component)
            -- so the oracle recomputes identical sign-bit buckets
            WITH sig AS (
              SELECT vec_id, embedding,
                array_to_string(list_transform(range(0, 8), p ->
                  CASE WHEN list_dot_product(embedding::DOUBLE[],
                    list_transform(range(0, len(embedding)), i ->
                      (CAST('0x' || substring(md5('plane' || p || ':' || i), 1, 8)
                            AS BIGINT)::DOUBLE / 4294967295.0) - 0.5)) > 0
                  THEN '1' ELSE '0' END), '') AS bucket
              FROM embeddings
            ), q AS (
              SELECT vec_id AS query_id, embedding AS q_emb, bucket
              FROM sig WHERE vec_id < 10
            ), scored AS (
              SELECT q.query_id, e.vec_id AS neighbor_id,
                     list_dot_product(q.q_emb::DOUBLE[], e.embedding::DOUBLE[])
                       / (sqrt(list_dot_product(q.q_emb::DOUBLE[], q.q_emb::DOUBLE[]))
                          * sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))) AS score
              FROM q JOIN sig e ON e.bucket = q.bucket AND e.vec_id <> q.query_id
            )
            SELECT query_id, rank, neighbor_id FROM (
              SELECT query_id, neighbor_id,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY score DESC, neighbor_id ASC)::BIGINT AS rank
              FROM scored)
            WHERE rank <= 5
        """,
        "text_pack_sequences": """
            -- contiguous token-budget packing: shard = doc_id % 16,
            -- bin = floor(shard-local running token count before this doc / 64)
            WITH d AS (
              SELECT doc_id, CAST(doc_id % 16 AS INTEGER) AS shard,
                     len(regexp_split_to_array(trim(text), '\\s+'))::BIGINT AS n_tokens
              FROM documents
            )
            SELECT doc_id, shard,
                   CAST(floor(coalesce(sum(n_tokens) OVER (
                        PARTITION BY shard ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                        / 64) AS BIGINT) AS bin_id,
                   n_tokens
            FROM d
        """,
        "text_normalize": """
            -- NFC + control strip; dedup key = md5 of the folded form
            -- (lower, accents stripped, digits->0, punct dropped, ws
            -- collapsed) — explicit ws classes match the Java regex side
            WITH n AS (
              SELECT doc_id,
                     nfc_normalize(text) AS nt,
                     regexp_replace(nfc_normalize(text),
                                    '[\\x00-\\x08\\x0b-\\x1f\\x7f]', '', 'g') AS clean,
                     strip_accents(lower(nfc_normalize(text))) AS folded
              FROM documents
            )
            SELECT doc_id,
                   clean AS norm_text,
                   md5(trim(regexp_replace(regexp_replace(regexp_replace(
                       folded, '[0-9]', '0', 'g'),
                       '[^a-z0-9 \t\n\r]', '', 'g'),
                       '[ \t\n\r]+', ' ', 'g'))) AS dedup_key,
                   (clean <> nt) AS had_control_chars
            FROM n
        """,
        "text_lm_score": """
            -- corpus-empirical unigram LM: avg ln(count(w)/total) per doc,
            -- floor-scaled to an integer bucket (portable double->int)
            WITH tf AS (
              SELECT doc_id,
                     unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w
              FROM documents
            ), toks AS (
              SELECT doc_id, w FROM tf WHERE w <> ''
            ), counts AS (
              SELECT w, count(*)::DOUBLE AS c FROM toks GROUP BY w
            ), tot AS (
              SELECT sum(c) AS tot FROM counts
            )
            SELECT doc_id, count(*)::BIGINT AS n_words,
                   CAST(floor(avg(ln(c / tot)) * 100) AS BIGINT) AS lm_bucket
            FROM toks JOIN counts USING (w), tot
            GROUP BY doc_id
        """,
        "text_top_ngrams": """
            -- heavy-hitter bigrams: document frequency >= 5% of docs;
            -- parallel unnests zip (word_i, position_i) so the self-join
            -- on i+1 rebuilds in-order bigrams
            WITH arr AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(trim(coalesce(text, ''))),
                                 '\\s+'), x -> x <> '') AS ws
              FROM documents
            ), tok AS (
              SELECT doc_id, unnest(ws) AS w,
                     unnest(range(1, len(ws) + 1)) AS i
              FROM arr
            ), dg AS (
              SELECT DISTINCT a.doc_id, a.w || ' ' || b.w AS gram
              FROM tok a JOIN tok b ON b.doc_id = a.doc_id AND b.i = a.i + 1
            ), n AS (SELECT count(*)::DOUBLE AS n_docs FROM documents)
            SELECT gram, count(*)::BIGINT AS df
            FROM dg, n GROUP BY gram, n.n_docs
            HAVING count(*) >= ceil(0.05 * n_docs)
        """,
        "text_tfidf": """
            -- top-5 terms per doc by tf*ln(N/df); score integerized to
            -- micro units on BOTH engines so ranking and hashing agree
            WITH toks AS (
              SELECT doc_id,
                     unnest(regexp_split_to_array(lower(trim(coalesce(text, ''))),
                            '\\s+')) AS term
              FROM documents
            ), tf AS (
              SELECT doc_id, term, count(*)::BIGINT AS tf
              FROM toks WHERE term <> '' GROUP BY doc_id, term
            ), dfx AS (
              SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
            ), n AS (
              SELECT count(DISTINCT doc_id)::DOUBLE AS n_docs FROM tf
            ), scored AS (
              SELECT tf.doc_id, tf.term, tf.tf, dfx.df,
                     CAST(round(tf.tf * ln(n.n_docs / dfx.df) * 1e6, 0)
                          AS BIGINT) AS score_micro
              FROM tf JOIN dfx USING (term), n
            )
            SELECT doc_id, term, tf, df, score_micro, rank FROM (
              SELECT *, row_number() OVER (
                       PARTITION BY doc_id
                       ORDER BY score_micro DESC, term ASC)::BIGINT AS rank
              FROM scored
            ) WHERE rank <= 5
        """,
        "text_source_cap": """
            -- per-source quota: hash-rank within source, first 10 survive
            SELECT doc_id, source, src_rank FROM (
              SELECT doc_id, source,
                     row_number() OVER (
                       PARTITION BY source
                       ORDER BY md5('cap:' || CAST(doc_id AS VARCHAR)) ASC,
                                doc_id ASC)::INT AS src_rank
              FROM documents
            ) WHERE src_rank <= 10
        """,
        "text_hash_sample": """
            -- deterministic corpus-mixing sample: bucket = first 8 md5 hex
            -- chars of 'mix:<doc_id>' mod 1e6; full copies from the weight's
            -- integer part, one more when bucket < frac(weight)*1e6
            WITH w AS (
              SELECT doc_id, lang,
                     CAST('0x' || substring(md5('mix:' || doc_id), 1, 8)
                          AS BIGINT) % 1000000 AS bucket,
                     CASE lang WHEN 'en' THEN 0.5 WHEN 'es' THEN 2.25
                               WHEN 'de' THEN 1.0 END AS wt
              FROM documents
            ), n AS (
              SELECT doc_id, lang,
                     CAST(floor(wt) AS INTEGER)
                     + CASE WHEN bucket < CAST((wt - floor(wt)) * 1000000 AS BIGINT)
                            THEN 1 ELSE 0 END AS n_copies
              FROM w WHERE wt IS NOT NULL
            )
            SELECT doc_id, lang, CAST(unnest(range(0, n_copies)) AS INTEGER) AS n_copy
            FROM n WHERE n_copies > 0
        """,
        "text_temperature_mix": """
            -- α=0.5 temperature rebalance: w_l = sqrt(n_max/n_l), micro-
            -- integerized; copy decision = hash_sample mechanism with
            -- salt 'tmix'.  Every arithmetic step is IEEE-correctly-
            -- rounded (max, divide, sqrt, floor) so the micro weight is
            -- bit-identical across engines.
            WITH c AS (
              SELECT lang, count(*) AS n FROM documents GROUP BY lang
            ), w AS (
              SELECT lang,
                     CAST(floor(sqrt(CAST((SELECT max(n) FROM c) AS DOUBLE)
                                     / CAST(n AS DOUBLE)) * 1000000) AS BIGINT)
                       AS weight_micro
              FROM c
            ), d AS (
              SELECT doc_id, documents.lang, weight_micro,
                     CAST('0x' || substring(md5('tmix:' || doc_id), 1, 8)
                          AS BIGINT) % 1000000 AS bucket
              FROM documents JOIN w ON w.lang = documents.lang
            ), n AS (
              SELECT doc_id, lang, weight_micro,
                     CAST(floor(weight_micro / 1000000.0) AS BIGINT)
                     + CASE WHEN bucket < weight_micro % 1000000
                            THEN 1 ELSE 0 END AS n_copies
              FROM d
            )
            SELECT doc_id, lang, weight_micro,
                   CAST(unnest(range(0, n_copies)) AS INTEGER) AS n_copy
            FROM n WHERE n_copies > 0
        """,
        "text_epoch_shards": """
            -- epoch e, doc d -> shard = first-8-hex(md5('epoch:e:d')) mod 64
            SELECT CAST(e AS INTEGER) AS epoch,
                   CAST('0x' || substring(md5('epoch:' || e || ':' || doc_id), 1, 8)
                        AS BIGINT) % 64 AS shard,
                   md5('epoch:' || e || ':' || doc_id) AS sort_key,
                   doc_id
            FROM documents CROSS JOIN (SELECT unnest(range(0, 3)) AS e) t
        """,
        "sim_semantic_dedup": """
            -- SemDeDup keep/drop: same md5-derived hyperplane buckets as
            -- sim_lsh_ann (4 planes), cosine rounded 4 vs 0.4, drop when a
            -- smaller-id near-dup shares the bucket
            WITH sig AS (
              SELECT vec_id, embedding,
                array_to_string(list_transform(range(0, 4), p ->
                  CASE WHEN list_dot_product(embedding::DOUBLE[],
                    list_transform(range(0, len(embedding)), i ->
                      (CAST('0x' || substring(md5('plane' || p || ':' || i), 1, 8)
                            AS BIGINT)::DOUBLE / 4294967295.0) - 0.5)) > 0
                  THEN '1' ELSE '0' END), '') AS bucket
              FROM embeddings
            ), pairs AS (
              SELECT a.vec_id AS va, b.vec_id AS vb
              FROM sig a JOIN sig b
                ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
              WHERE round(
                list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
                  / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                     * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))),
                4) >= 0.4
            ), stats AS (
              SELECT va, count(*)::BIGINT AS n_near_dups,
                     max(CASE WHEN vb < va THEN 1 ELSE 0 END) AS smaller
              FROM pairs GROUP BY va
            )
            SELECT e.vec_id,
                   (CASE WHEN coalesce(s.smaller, 0) = 1 THEN 0 ELSE 1 END)::INTEGER
                       AS keep,
                   coalesce(s.n_near_dups, 0)::BIGINT AS n_near_dups
            FROM embeddings e LEFT JOIN stats s ON s.va = e.vec_id
        """,
        "sim_cosine_topk": """
            WITH scored AS (
              SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                     list_dot_product(q.embedding::DOUBLE[], e.embedding::DOUBLE[])
                       / (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[]))
                          * sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))) AS score
              FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
              WHERE q.vec_id < 10
            )
            SELECT query_id, rank, neighbor_id FROM (
              SELECT query_id, neighbor_id,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY score DESC, neighbor_id ASC)::BIGINT AS rank
              FROM scored)
            WHERE rank <= 5
        """,
        "sim_embedding_near_dups": """
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
            FROM embeddings a JOIN embeddings b
              ON a.label = b.label AND a.vec_id < b.vec_id
            WHERE round(
              list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
                / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                   * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 4) >= 0.4
        """,
        "mm_payload_meta": """
            -- DuckDB md5 takes VARCHAR; hashing the text hashes the same
            -- utf-8 bytes Spark's md5(encode(text,'utf-8')) hashes
            SELECT doc_id, octet_length(encode(text))::BIGINT AS n_bytes,
                   md5(text) AS payload_md5
            FROM documents
        """,
        "mm_features": """
            -- byte-histogram counts mod 8 over the utf-8 payload; byte k of
            -- the blob = hex chars (2k+1, 2k+2) — exact integers, no floats
            WITH idx AS (
              SELECT doc_id, hex(encode(text)) AS hx,
                     unnest(range(0, octet_length(encode(text)))) AS i
              FROM documents
            ), bytes AS (
              SELECT doc_id,
                     CAST('0x' || substring(hx, i * 2 + 1, 2) AS INTEGER) % 8 AS bucket
              FROM idx
            ), hist AS (
              SELECT doc_id, bucket, count(*)::BIGINT AS c FROM bytes GROUP BY 1, 2
            )
            SELECT d.doc_id,
                   coalesce(max(CASE WHEN bucket = 0 THEN c END), 0)::BIGINT AS f0,
                   coalesce(max(CASE WHEN bucket = 1 THEN c END), 0)::BIGINT AS f1,
                   coalesce(max(CASE WHEN bucket = 2 THEN c END), 0)::BIGINT AS f2,
                   coalesce(max(CASE WHEN bucket = 3 THEN c END), 0)::BIGINT AS f3,
                   coalesce(max(CASE WHEN bucket = 4 THEN c END), 0)::BIGINT AS f4,
                   coalesce(max(CASE WHEN bucket = 5 THEN c END), 0)::BIGINT AS f5,
                   coalesce(max(CASE WHEN bucket = 6 THEN c END), 0)::BIGINT AS f6,
                   coalesce(max(CASE WHEN bucket = 7 THEN c END), 0)::BIGINT AS f7
            FROM documents d LEFT JOIN hist h USING (doc_id)
            GROUP BY d.doc_id
        """,
        "mm_frame_samples": """
            -- sampled byte at offsets 0, 64, 128, ... of the payload
            WITH idx AS (
              SELECT doc_id, hex(encode(text)) AS hx,
                     unnest(range(0, (octet_length(encode(text)) + 63) // 64)) AS k
              FROM documents WHERE doc_id < 100
            )
            SELECT doc_id, (k * 64)::BIGINT AS frame_offset,
                   CAST('0x' || substring(hx, k * 128 + 1, 2) AS INTEGER)::BIGINT AS sample_value
            FROM idx
        """,
        "mm_audio_features": """
            -- fake-PCM path: payload bytes as unsigned 8-bit samples
            -- recentred at 128; energy and zero crossings are integer-
            -- exact (sum of squares / sign products), so the contract is
            -- float-free.  Byte extraction via hex() as in mm_frame_samples.
            WITH b AS (
              SELECT doc_id, hex(encode(text)) AS hx,
                     octet_length(encode(text)) AS n
              FROM documents WHERE doc_id < 100
            ), v0 AS (
              SELECT doc_id, hx, unnest(range(0, n)) AS i FROM b
            ), v AS (
              SELECT doc_id, i,
                     CAST('0x' || substring(hx, i * 2 + 1, 2) AS INTEGER) - 128 AS v
              FROM v0
            ), agg AS (
              SELECT doc_id, count(*)::BIGINT AS n_samples,
                     sum(v * v)::BIGINT AS energy_ssq
              FROM v GROUP BY doc_id
            ), zc AS (
              SELECT a.doc_id,
                     sum(CASE WHEN a.v * c.v < 0 THEN 1 ELSE 0 END)::BIGINT AS z
              FROM v a JOIN v c ON c.doc_id = a.doc_id AND c.i = a.i + 1
              GROUP BY a.doc_id
            )
            SELECT agg.doc_id, n_samples, 1::BIGINT AS n_channels,
                   8000::BIGINT AS sample_rate, energy_ssq,
                   coalesce(z, 0)::BIGINT AS zero_crossings
            FROM agg LEFT JOIN zc ON zc.doc_id = agg.doc_id
        """,
        "events_hourly": """
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
                   event_type, count(*)::BIGINT AS n_events,
                   round(sum(value), 4) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "docs_stream_dedup": """
            -- one availableNow batch + min-sha representative == batch GROUP BY
            SELECT md5(text) AS fp,
                   min(CAST(doc_id AS VARCHAR)) AS doc_sha256,
                   count(*) AS n_seen
            FROM documents GROUP BY md5(text)
        """,
        "events_windowed_stream": """
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
                   event_type, count(*)::BIGINT AS n_events,
                   round(sum(value), 4) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "events_sessions": """
            SELECT user_id, event_id,
                   row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)::BIGINT AS seq
            FROM events
        """,
        "events_sessionize_gap": """
            WITH b AS (
              SELECT user_id, event_id, ts,
                     CASE WHEN lag(ts) OVER w IS NULL
                            OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                          THEN 1 ELSE 0 END AS boundary
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            )
            SELECT user_id, event_id,
                   sum(boundary) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING)::BIGINT AS session_id
            FROM b
        """,
        "social_shacl_member_prop": f"""
            -- sh:property on sh:or members: each knows-value must have
            -- >=1 email OR >=1 phone (anonymous member shapes evaluated
            -- as per-value conformance); no knows values -> conformant
            WITH m AS (
              SELECT DISTINCT doc_sha256, subj, pred, obj_value
              FROM '{_SOC_TRIPLES}'
            ), focus AS (
              SELECT DISTINCT doc_sha256, subj AS node FROM m
              WHERE pred = 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'
                AND obj_value = 'http://example.org/Person'
            ), vals AS (
              SELECT doc_sha256, subj AS node, obj_value AS v FROM m
              WHERE pred = 'http://example.org/knows'
            ), contactable AS (
              SELECT DISTINCT doc_sha256, subj AS v FROM m
              WHERE pred IN ('http://example.org/email',
                             'http://example.org/phone')
            ), bad AS (
              SELECT DISTINCT vals.doc_sha256, vals.node
              FROM vals LEFT JOIN contactable c
                ON c.doc_sha256 = vals.doc_sha256 AND c.v = vals.v
              WHERE c.v IS NULL
            )
            SELECT f.doc_sha256, f.node,
                   CASE WHEN b.node IS NULL
                        THEN 'conformant' ELSE 'nonconformant' END AS status
            FROM focus f LEFT JOIN bad b
              ON b.doc_sha256 = f.doc_sha256 AND b.node = f.node
        """,
        "social_shacl_node_level": f"""
            -- node-shape-LEVEL components: conformant iff (>=1 email OR
            -- >=1 phone) AND the focus term does NOT match ^urn:skolem:
            -- (node-level sh:or over property members + sh:not value gate)
            WITH m AS (
              SELECT DISTINCT doc_sha256, subj, pred, obj_value
              FROM '{_SOC_TRIPLES}'
            ), focus AS (
              SELECT DISTINCT doc_sha256, subj AS node FROM m
              WHERE pred = 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'
                AND obj_value = 'http://example.org/Person'
            ), contact AS (
              SELECT DISTINCT doc_sha256, subj AS node FROM m
              WHERE pred IN ('http://example.org/email',
                             'http://example.org/phone')
            )
            SELECT f.doc_sha256, f.node,
                   CASE WHEN c.node IS NOT NULL
                             AND f.node NOT LIKE 'urn:skolem:%'
                        THEN 'conformant' ELSE 'nonconformant' END AS status
            FROM focus f LEFT JOIN contact c
              ON c.doc_sha256 = f.doc_sha256 AND c.node = f.node
        """,
        "social_triangles": f"""
            -- orientation-invariant triangle enumeration (x<y<z joins;
            -- the Spark side uses the degree-ordered orientation, same
            -- per-node output), each triangle exploded to its 3 vertices
            WITH k AS (
              SELECT DISTINCT subj AS a, obj_value AS b
              FROM '{_SOC_TRIPLES}'
              WHERE pred = 'http://example.org/knows' AND subj <> obj_value
            ),
            e2 AS (
              SELECT DISTINCT least(a, b) AS x, greatest(a, b) AS y
              FROM (SELECT a, b FROM k UNION SELECT b, a FROM k)
            ),
            tri AS (
              SELECT e1.x AS a, e1.y AS b, f.y AS c
              FROM e2 e1
              JOIN e2 f ON f.x = e1.y
              JOIN e2 g ON g.x = e1.x AND g.y = f.y
            )
            SELECT node, count(*)::BIGINT AS n_tri
            FROM (SELECT unnest([a, b, c]) AS node FROM tri)
            GROUP BY 1
        """,
        "code_winnow_fp": f"""
            -- winnowing fingerprints (Schleimer et al. 2003): k-gram md5
            -- hashes (portable 60-bit ints), min per w-window, distinct
            WITH d AS (SELECT repo, path, content FROM {_D}),
            kg AS (
              SELECT repo, path,
                CASE WHEN length(content) >= 8
                  THEN [CAST('0x'||substr(md5(substr(content, i, 8)),1,15) AS BIGINT)
                        FOR i IN range(1, length(content)-8+2)]
                  ELSE [CAST('0x'||substr(md5(content),1,15) AS BIGINT)] END AS hs
              FROM d
            ),
            fps AS (
              SELECT repo, path,
                CASE WHEN len(hs) >= 4
                  THEN list_distinct([list_min(hs[j:j+4-1]) FOR j IN range(1, len(hs)-4+2)])
                  ELSE [list_min(hs)] END AS fp
              FROM kg
            )
            SELECT repo, path, unnest(fp) AS fingerprint FROM fps
        """,
        "code_winnow_clones": f"""
            -- intra-repo clone pairs: winnow fingerprint Jaccard >= 0.35
            -- over the head sketch (first 400 chars), org0/org1 repos
            WITH d AS (
              SELECT repo, repo || ':' || path AS file_id,
                     substr(content, 1, 400) AS content
              FROM {_D}
              WHERE repo LIKE 'org0/%' OR repo LIKE 'org1/%'
            ),
            kg AS (
              SELECT repo, file_id,
                CASE WHEN length(content) >= 8
                  THEN [CAST('0x'||substr(md5(substr(content, i, 8)),1,15) AS BIGINT)
                        FOR i IN range(1, length(content)-8+2)]
                  ELSE [CAST('0x'||substr(md5(content),1,15) AS BIGINT)] END AS hs
              FROM d
            ),
            fps AS (
              SELECT repo, file_id,
                CASE WHEN len(hs) >= 4
                  THEN list_distinct([list_min(hs[j:j+4-1]) FOR j IN range(1, len(hs)-4+2)])
                  ELSE [list_min(hs)] END AS fp
              FROM kg
            ),
            sizes AS (SELECT file_id, len(fp) AS n_fp FROM fps),
            ex AS (SELECT repo, file_id, unnest(fp) AS fingerprint FROM fps),
            inter AS (
              SELECT a.file_id AS file_a, b.file_id AS file_b, count(*) AS n_inter
              FROM ex a JOIN ex b
                ON a.repo = b.repo AND a.fingerprint = b.fingerprint
               AND a.file_id < b.file_id
              GROUP BY 1, 2
            )
            SELECT i.file_a, i.file_b,
                   round(CAST(i.n_inter AS DOUBLE)
                         / (sa.n_fp + sb.n_fp - i.n_inter), 4) AS jaccard
            FROM inter i JOIN sizes sa ON i.file_a = sa.file_id
                         JOIN sizes sb ON i.file_b = sb.file_id
            WHERE round(CAST(i.n_inter AS DOUBLE)
                        / (sa.n_fp + sb.n_fp - i.n_inter), 4) >= 0.35
        """,
        "code_winnow_lsh": f"""
            -- winnow sketch -> 16-hash MinHash -> 2 bands of 8 -> bucket join
            WITH d AS (
              SELECT repo, repo || ':' || path AS file_id, content
              FROM {_D}
              WHERE repo LIKE 'org0/%'
            ),
            kg AS (
              SELECT file_id,
                CASE WHEN length(content) >= 8
                  THEN [CAST('0x'||substr(md5(substr(content, i, 8)),1,15) AS BIGINT)
                        FOR i IN range(1, length(content)-8+2)]
                  ELSE [CAST('0x'||substr(md5(content),1,15) AS BIGINT)] END AS hs
              FROM d
            ),
            fps AS (
              SELECT file_id,
                CASE WHEN len(hs) >= 4
                  THEN list_distinct([list_min(hs[j:j+4-1]) FOR j IN range(1, len(hs)-4+2)])
                  ELSE [list_min(hs)] END AS fp
              FROM kg
            ),
            sig AS (
              SELECT file_id,
                [list_min([CAST('0x'||substr(md5(i || ':' || f),1,15) AS BIGINT)
                           FOR f IN fp])
                 FOR i IN range(0, 16)] AS s
              FROM fps
            ),
            bk AS (
              SELECT file_id, b AS band,
                     array_to_string(s[b*8+1 : b*8+8], ',') AS band_key
              FROM sig, unnest(range(0, 2)) AS t(b)
            )
            SELECT DISTINCT a.file_id AS file_a, b.file_id AS file_b
            FROM bk a JOIN bk b
              ON a.band = b.band AND a.band_key = b.band_key
             AND a.file_id < b.file_id
        """,
        "code_repo_stats": f"""
            SELECT repo,
                   count(*)::BIGINT AS n_files,
                   count(DISTINCT lang)::BIGINT AS n_langs,
                   count(DISTINCT "commit")::BIGINT AS n_commits,
                   sum(length(content))::BIGINT AS total_bytes,
                   count(DISTINCT content_sha256)::BIGINT AS distinct_contents
            FROM {_D}
            GROUP BY repo
        """,
        "code_license_profile": f"""
            -- deterministic augmentation (same rule as the Spark entry):
            -- residue of length(content) decides which license header each
            -- file gets; expected families derive from the construction
            WITH d AS (
              SELECT repo,
                     CASE length(content) % 7
                       WHEN 0 THEN 'MIT'
                       WHEN 1 THEN 'Apache-2.0'
                       WHEN 2 THEN 'GPL'
                       WHEN 3 THEN 'BSD'
                       ELSE 'unknown' END AS family
              FROM {_D}
            ),
            per AS (
              SELECT repo, family, count(*)::BIGINT AS n_files
              FROM d GROUP BY 1, 2
            ),
            t AS (SELECT repo, sum(n_files)::BIGINT AS repo_files FROM per GROUP BY 1)
            SELECT per.repo, per.family, per.n_files, t.repo_files,
                   round(per.n_files / t.repo_files::DOUBLE, 6) AS frac
            FROM per JOIN t ON t.repo = per.repo
        """,
        "code_ident_top": f"""
            -- top-10 identifiers per language (ties break lexicographically)
            WITH toks AS (
              SELECT lang,
                     unnest(regexp_extract_all(content,
                            '[A-Za-z_][A-Za-z0-9_]{{2,}}')) AS identifier
              FROM {_D}
            ),
            c AS (SELECT lang, identifier, count(*)::BIGINT AS n
                  FROM toks GROUP BY 1, 2)
            SELECT lang, identifier, n, rank FROM (
              SELECT lang, identifier, n,
                     row_number() OVER (PARTITION BY lang
                                        ORDER BY n DESC, identifier ASC)::BIGINT AS rank
              FROM c)
            WHERE rank <= 10
        """,
    }
    # Syntax-twin entries run the SAME semantics through a different schema
    # syntax, so they share the original entry's oracle by construction:
    # ShExJ twin of social_validate_person (plans/shexj.py) and the RDF/XML
    # shapes-graph twin of social_shacl_pair_equals (parse_shacl
    # fmt="rdf-xml", ShaclFormat.scala:20-28 parity).
    d["social_shexj_validate"] = d["social_validate_person"]
    d["social_shacl_rdfxml"] = d["social_shacl_pair_equals"]
    # W3C conformance sample: the oracle IS the official suites' expected
    # verdicts (fixtures/w3c_sample.py transcribes them per case), so a
    # hash match means the engine agrees with the W3C-expected outcome on
    # every sampled case — the same correctness authority the reference
    # inherits via shexs/shaclex (build.sbt:346-349).
    from rdfshape_api_spark.fixtures.w3c_sample import cases as _w3c_cases

    _vals = ",\n              ".join(
        "('{}', '{}')".format(
            c["name"], "conformant" if c["expected"] else "nonconformant"
        )
        for c in _w3c_cases()
    )
    d["rdf_w3c_sample"] = (
        "SELECT * FROM (VALUES\n              " + _vals + "\n"
        "            ) AS t(test, status)"
    )
    return d
