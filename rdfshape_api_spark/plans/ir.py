"""Constraint IR shared by the ShEx and SHACL frontends.

One record ≈ one ShEx TripleConstraint / one SHACL PropertyShape.  The
evaluator semantics (see plans/validate.py) make the two engines coincide
for non-overlapping predicates:

    conforms(node, shape)  ⇔  ∀ constraints c:
        matched_c(node) == total_c(node)            # every value satisfies
        ∧ min_c ≤ matched_c(node) ≤ max_c           # cardinality bounds

which is ShEx's closed-per-predicate matching without EXTRA (shexs
semantics at the SchemaValidate.scala:97-108 call site) and exactly SHACL's
conjunction of value-level components + minCount/maxCount.  ``extra=True``
relaxes the first conjunct (ShEx ``EXTRA p``); ``closed=True`` additionally
forbids unmentioned predicates (ShEx CLOSED / sh:closed).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class TripleConstraint:
    pred: str
    min_count: int = 1
    max_count: int | None = 1  # None = unbounded
    datatype: str | None = None
    node_kind: str | None = None  # iri|bnode|literal|nonliteral
    # (kind, value) — kind iri | literal | iri_stem | literal_stem (stems
    # are ShEx `~` prefix matches over the value's lexical form)
    value_set: list[tuple[str, str]] | None = None
    # ShEx value-set wildcard member `.` (everything, modulo exclusions)
    value_set_has_wildcard: bool = False
    # ShEx value-set exclusions `- member` / `- stem~`: matching values are
    # excluded from the set regardless of which positive member matched
    value_set_excl: list[tuple[str, str]] | None = None
    min_inclusive: float | None = None
    max_inclusive: float | None = None
    min_exclusive: float | None = None
    max_exclusive: float | None = None
    pattern: str | None = None
    min_length: int | None = None
    max_length: int | None = None
    ref_shape: str | None = None
    # SHACL sh:class: every value must be a SHACL instance of this class
    # (rdf:type + rdfs:subClassOf closure) — evaluated like a shape
    # reference, with the instance set as the conformant side
    class_iri: str | None = None
    # SHACL sh:languageIn ( "en" "de" … ): literal language tag matches one
    # of the basic language ranges (tag or tag-prefixed per BCP47)
    language_in: list[str] | None = None
    # SHACL sh:uniqueLang true: no two values share a language tag
    unique_lang: bool = False
    # SHACL sh:message on the property shape: overrides the generated
    # violation reason text in the report (spec §2.3.2.3)
    message: str | None = None
    # SHACL sh:severity on the property shape (spec §2.3.2.2): carried
    # into the ValidationReport's sh:resultSeverity (default sh:Violation);
    # NEVER affects conformance — sh:conforms is false whenever any result
    # exists, regardless of severity
    severity: str | None = None
    extra: bool = False  # ShEx EXTRA on this predicate
    negated: bool = False  # ShEx NOT on this value expression
    # SHACL sh:path [ sh:inversePath p ]: the constraint ranges over the
    # INVERSE neighbourhood (subjects pointing AT the focus node); the
    # "value" is the pointing subject
    inverse: bool = False
    # SHACL sh:qualifiedValueShape: count-only semantics — the verdict is
    # qualifiedMinCount ≤ |values satisfying the qualified shape| ≤
    # qualifiedMaxCount; values NOT satisfying it are never violations
    # (unlike plain value constraints, which require matched == total).
    # Qualified constraints also never join repeated-property partition
    # matching — each evaluates independently per SHACL semantics.
    qualified: bool = False
    # SHACL sh:qualifiedValueShapesDisjoint true: a value counts toward
    # this qualified constraint only if it does NOT conform to any sibling
    # qualified value shape (the other sh:qualifiedValueShape constraints
    # of the same node shape) — spec §4.7.  Members must be pure value
    # predicates (no sh:node/sh:class), enforced by the SHACL frontend.
    disjoint_siblings: list["TripleConstraint"] | None = None
    # SHACL non-trivial sh:path (sequence list / sh:alternativePath /
    # sh:zeroOrMorePath / sh:oneOrMorePath): a path AST from
    # plans/paths.py; when set, `pred` holds a synthetic display name and
    # the constraint's value rows come from the path-reachability join
    # instead of a pred == filter
    path: object | None = None
    # ShEx OR of value expressions: when set, the value predicate is the
    # disjunction of the members' predicates (each member is a value-only
    # TripleConstraint; pred/cardinality of members are ignored)
    disjuncts: list["TripleConstraint"] | None = None
    # SHACL sh:xone: exactly ONE disjunct must hold per value (vs sh:or's
    # at-least-one); only meaningful when `disjuncts` is set
    xone: bool = False
    # ShEx AND of value expressions with mixed polarity (e.g.
    # `xsd:string AND NOT ("bad" OR "worse")`): when set, the value
    # predicate is the conjunction of the members' predicates and every
    # other value field on THIS carrier is clear (members are value-only
    # carriers, pure primitives or [negated] disjunctions — never shape
    # refs, which would need conformance-set complements)
    conjuncts: list["TripleConstraint"] | None = None
    # SHACL property-pair constraints — compare this path's value set with
    # the value set at ANOTHER predicate on the same focus node
    # (sh:equals / sh:disjoint: set comparison; sh:lessThan /
    # sh:lessThanOrEquals: every pair ordered, numeric subset)
    pair_equals: str | None = None
    pair_disjoint: str | None = None
    pair_less_than: str | None = None
    pair_less_than_eq: str | None = None


@dataclass
class Shape:
    shape_id: str
    constraints: list[TripleConstraint] = field(default_factory=list)
    closed: bool = False
    # SHACL sh:ignoredProperties ( p… ): predicates a closed shape permits
    # beyond its sh:path set (commonly rdf:type)
    ignored: list[str] = field(default_factory=list)
    # ShEx OneOf at the triple-expression level: when set, the shape body is
    # `alt_0 | alt_1 | …` (each an EachOf constraint list) and a node
    # conforms iff at least one alternative's constraints hold;
    # `constraints` is empty in that case
    alternatives: list[list[TripleConstraint]] | None = None
    # SHACL target declarations (TriggerTargetDeclarations.scala:24-25)
    target_class: list[str] = field(default_factory=list)
    target_node: list[str] = field(default_factory=list)
    target_subjects_of: list[str] = field(default_factory=list)
    target_objects_of: list[str] = field(default_factory=list)
    # ShEx shape-level node constraint (`ex:S IRI AND { … }` or a bare
    # node-constraint shape `ex:T IRI` / `ex:T xsd:date`): value fields
    # only, applied to the FOCUS node itself.  References to bare
    # node-constraint shapes are inlined into the referencing triple
    # constraint at parse time (plans/shex.py), so the evaluator only sees
    # this on braced shapes (where it gates on the focus node's string).
    node_constraint: "TripleConstraint | None" = None
    # ShEx shape-level conjunction with shape references
    # (`ex:S @ex:Base AND { … }` — the mixin/inheritance pattern, or a
    # pure alias `ex:T @ex:Base`): the focus node must ALSO belong to
    # every listed shape's conformant set (positive refs only)
    conjunct_refs: list[str] = field(default_factory=list)
    # ShEx shape-level disjunction of shape references (`ex:T @ex:A OR
    # @ex:B` — ShapeOr): the focus node must belong to AT LEAST ONE of
    # the listed shapes' conformant sets (positive refs only)
    disjunct_refs: list[str] = field(default_factory=list)
    # SHACL node-shape-level sh:xone over shape members: exactly ONE of
    # ``disjunct_refs`` must hold (vs sh:or's at-least-one)
    disjunct_refs_xone: bool = False
    # SHACL node-shape-level sh:class: the FOCUS node must be a SHACL
    # instance (rdf:type through the rdfs:subClassOf closure) of every
    # listed class
    conjunct_classes: list[str] = field(default_factory=list)
    # SHACL node-shape-level sh:not over a shape-ish member: the focus
    # node must NOT sit in the referenced shape's conformant set
    negated_refs: list[str] = field(default_factory=list)
    # SHACL node-shape-level sh:not [ sh:class C ]: the focus node must
    # NOT be a SHACL instance of the class
    negated_classes: list[str] = field(default_factory=list)
    # SHACL-SPARQL constraints (sh:sparql → sh:select): each entry is
    # (select_query_text, message) with ``$this`` still in the text — the
    # evaluator rewrites it to ?this and computes the violator set with ONE
    # distributed query per constraint (no per-focus-node loop)
    sparql_selects: list[tuple[str, str | None]] = field(default_factory=list)


@dataclass
class CompiledSchema:
    engine: str  # "shex" | "shacl"
    shapes: dict[str, Shape]
    prefixes: dict[str, str]
    # ShEx `start = @<Shape>` declaration; shapemaps may reference it as
    # the shape label `@start`
    start: str | None = None

    def shape(self, shape_id: str) -> Shape:
        return self.shapes[shape_id]
