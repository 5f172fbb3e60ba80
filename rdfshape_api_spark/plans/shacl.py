"""SHACL frontend: shapes graph (Turtle) → constraint IR (SURVEY §2.7).

The reference runs SHACL through shaclex/JenaShacl/ShaclTQ
(``SchemaService.scala:80-84``); default SHACL format is Turtle
(``ShaclFormat.scala:31``).  Here the shapes graph is parsed with the
engine's own Turtle parser (driver-side — schemas are KBs, not data) and the
SHACL core vocabulary is lifted into the same constraint records as ShEx:

* ``sh:NodeShape`` + targets: ``sh:targetClass`` / ``sh:targetNode`` /
  ``sh:targetSubjectsOf`` / ``sh:targetObjectsOf``
  (TriggerTargetDeclarations.scala:24-25 — the TargetDecls trigger);
* ``sh:property`` property shapes with ``sh:path`` (direct IRI paths),
  ``sh:minCount/maxCount``, ``sh:datatype``, ``sh:in``, numeric ranges,
  ``sh:pattern``, ``sh:minLength/maxLength``, ``sh:nodeKind``, ``sh:node``
  (shape reference), ``sh:closed``.

Logical constraint components ``sh:or`` / ``sh:and`` / ``sh:not`` over
value-level members map to the IR's disjuncts/negated fields (same
evaluator as ShEx OR/AND/NOT); ``sh:node`` nests inside all three.
``sh:qualifiedValueShape`` + ``sh:qualifiedMin/MaxCount`` compile to
count-only constraints (``TripleConstraint.qualified``);
``sh:qualifiedValueShapesDisjoint true`` wires the node shape's other
qualified value shapes in as count exclusions (spec §4.7 sibling shapes).
Non-trivial
``sh:path`` objects — sequence lists, ``sh:alternativePath``,
``sh:zeroOrMorePath`` / ``sh:oneOrMorePath`` / ``sh:zeroOrOnePath``, and
nested ``sh:inversePath`` — compile to a path AST (plans/paths.py)
evaluated by a focus-seeded reachability join.  ``sh:sparql``/``sh:select``
constraints compile to set-based violator queries (plans/sparql.
sparql_violators).  Disjoint qualified siblings carrying sh:node/sh:class
are supported over every path shape (forward, inverse, non-trivial) —
the sibling's value shape evaluates against the constraint's own value
neighbourhood via dedicated conformance joins.
"""

from __future__ import annotations

from collections import defaultdict

from rdfshape_api_spark.model import RDF_FIRST, RDF_NIL, RDF_REST, RDF_TYPE, SH
from rdfshape_api_spark.plans.ir import CompiledSchema, Shape, TripleConstraint
from rdfshape_api_spark.plans.paths import (
    PathAlt,
    PathClosure,
    PathInverse,
    PathNode,
    PathPred,
    PathSeq,
    path_display,
)
from rdfshape_api_spark.sources.parsers import (
    PARSERS,
    parse_turtle,
    turtle_prefixes,
)

_NODEKIND = {
    SH + "IRI": "iri",
    SH + "BlankNode": "bnode",
    SH + "Literal": "literal",
    SH + "BlankNodeOrIRI": "nonliteral",
}

_UNSUPPORTED: set[str] = set()


class _Graph:
    """Tiny indexed triple set for driver-side shapes-graph walking."""

    def __init__(self, triples):
        self.spo = defaultdict(lambda: defaultdict(list))
        for s, p, k, v, lang, dt in triples:
            self.spo[s][p].append((k, v, lang, dt))

    def objs(self, s, p):
        return self.spo.get(s, {}).get(p, [])

    def obj1(self, s, p):
        vals = self.objs(s, p)
        return vals[0] if vals else None

    def rdf_list(self, head):
        out = []
        while head != RDF_NIL:
            first = self.obj1(head, RDF_FIRST)
            if first is None:
                break
            out.append(first)
            rest = self.obj1(head, RDF_REST)
            head = rest[1] if rest else RDF_NIL
        return out


def _num(v: str) -> float:
    return float(v)


_VALUE_FIELDS = (
    "datatype", "node_kind", "value_set", "min_inclusive", "max_inclusive",
    "min_exclusive", "max_exclusive", "pattern", "min_length", "max_length",
    "ref_shape", "class_iri", "language_in",
)


def _read_value_constraints(
    g: "_Graph", node: str, tc: TripleConstraint, nested: bool = False
) -> None:
    """Lift the SHACL value-level components of ``node`` onto ``tc``.

    ``nested=True`` when ``node`` is a logical-member / qualified-value
    shape rather than the property shape itself: the logical combinators
    (sh:or / sh:xone / sh:and / sh:not) are then read HERE, recursively —
    the property-shape-level combinators stay in ``parse_shacl``'s main
    loop, which also handles sibling distribution and cardinality.
    Before round 4 a combinator on a member node was silently unread,
    leaving the member empty — i.e. trivially TRUE; silent acceptance is
    the one failure mode this frontend must never have, so everything a
    member node can carry is now either read or cleanly rejected."""
    if nested and g.obj1(node, SH + "path") is not None:
        # the member IS a property shape (applied to the value node as its
        # focus): every field on it belongs to the property-shape parse of
        # its injected wrapper (_inject_path_member_wrappers), and the
        # member reduces to a reference to that wrapper
        tc.ref_shape = node + _WRAP_SFX
        return
    if (v := g.obj1(node, SH + "datatype")) is not None:
        tc.datatype = v[1]
    if (v := g.obj1(node, SH + "nodeKind")) is not None:
        tc.node_kind = _NODEKIND.get(v[1])
    if (v := g.obj1(node, SH + "in")) is not None:
        tc.value_set = [
            ("iri" if k in ("iri", "bnode") else "literal", val)
            for k, val, _, _ in g.rdf_list(v[1])
        ]
    for sh_name, field in (
        ("minInclusive", "min_inclusive"),
        ("maxInclusive", "max_inclusive"),
        ("minExclusive", "min_exclusive"),
        ("maxExclusive", "max_exclusive"),
    ):
        if (v := g.obj1(node, SH + sh_name)) is not None:
            setattr(tc, field, _num(v[1]))
    if (v := g.obj1(node, SH + "pattern")) is not None:
        tc.pattern = v[1]
        # sh:flags (e.g. "i"): inline as an embedded-flag group — the
        # evaluator's rlike and Java regex both accept (?i)/(?s)/(?m)
        if (fl := g.obj1(node, SH + "flags")) is not None and fl[1]:
            tc.pattern = f"(?{fl[1]}){tc.pattern}"
    if (v := g.obj1(node, SH + "minLength")) is not None:
        tc.min_length = int(v[1])
    if (v := g.obj1(node, SH + "maxLength")) is not None:
        tc.max_length = int(v[1])
    if (v := g.obj1(node, SH + "node")) is not None:
        tc.ref_shape = v[1]
    if (v := g.obj1(node, SH + "class")) is not None:
        tc.class_iri = v[1]
    if (v := g.obj1(node, SH + "languageIn")) is not None:
        tc.language_in = [val for _, val, _, _ in g.rdf_list(v[1])]
    # sh:node to a PLAIN value shape (only datatype/kind/in/range/pattern/
    # length/class/hasValue components): inline the target's fields as
    # conjuncts instead of a conformance-set join — set joins range over
    # SUBJECTS, so a literal value could never satisfy the reference even
    # when it matches every component; inlining keeps spec semantics and
    # costs nothing.  (Targets carrying sh:property/closed/logicals keep
    # the reference path.)
    if tc.ref_shape is not None and _is_plain_value_shape(g, tc.ref_shape):
        target, tc.ref_shape = tc.ref_shape, None
        m = TripleConstraint(pred=tc.pred)
        _read_value_constraints(g, target, m, nested=True)
        _merge_value_fields(tc, m, f"(inlined sh:node <{target}>)")
    if not nested:
        return
    # --- nested logical combinators (member / qualified-shape nodes) ---
    for comp, is_xone in (("or", False), ("xone", True)):
        if (v := g.obj1(node, SH + comp)) is None:
            continue
        if tc.disjuncts:
            raise ValueError(
                "SHACL: two logical list components on one member node "
                "are unsupported in this subset"
            )
        members = []
        for _, mnode, _, _ in g.rdf_list(v[1]):
            m = TripleConstraint(pred=tc.pred)
            _read_value_constraints(g, mnode, m, nested=True)
            members.append(m)
        # the member node's own direct fields are conjuncts with its OR:
        # distribute them into the nested members (clearing them here),
        # which also turns this node into a pure carrier — spliceable by
        # the parent's _splice_or_members pass
        _distribute_siblings(tc, members, f"nested sh:{comp}")
        tc.disjuncts = _splice_or_members(members) if not is_xone else members
        tc.xone = is_xone
    if (v := g.obj1(node, SH + "and")) is not None:
        members = []
        for _, mnode, _, _ in g.rdf_list(v[1]):
            m = TripleConstraint(pred=tc.pred)
            _read_value_constraints(g, mnode, m, nested=True)
            members.append(m)
        _fold_and_members(tc, members)
    if (v := g.obj1(node, SH + "not")) is not None:
        if _has_value_fields(tc) or tc.disjuncts:
            raise ValueError(
                "SHACL: sh:not combined with sibling value components on "
                "one member node is unsupported in this subset"
            )
        _read_value_constraints(g, v[1], tc, nested=True)
        tc.negated = not tc.negated
    # anything else a member node could carry that this frontend does not
    # evaluate at value level must reject, not silently pass
    # sh:hasValue on a node shape: "at least one value node equals the
    # term" — a logical member applies to ONE value node, so the value-node
    # set is {v} and the condition degenerates to v == term, i.e. a
    # one-member sh:in (spec §4.5.2 over a singleton value set)
    if (hv := g.obj1(node, SH + "hasValue")) is not None:
        member = ("literal" if hv[0] == "literal" else "iri", hv[1])
        if tc.value_set is None:
            tc.value_set = [member]
        else:
            # conjoined with a sibling sh:in: intersect — {term} if the
            # sh:in admits it, else unsatisfiable (empty set keeps AND
            # semantics honest for the single value node)
            tc.value_set = [member] if member in tc.value_set else []
    # sh:property on a member node: the member is an (anonymous,
    # target-less) node shape — parse_shacl's shape-discovery pass picks
    # up every node with sh:property, so the member compiles as a regular
    # shape and the value-level condition reduces to a shape REFERENCE:
    # exactly the sh:node path (per-value conformance join), same as
    # shaclex evaluates it (SchemaService.scala:80-84).  Direct value
    # fields on the member conjoin with the reference (ref + datatype/...
    # conjunctions are already an evaluator feature).
    # sh:closed on a member node joins sh:property in the anonymous-shape
    # reduction: the shape-discovery pass picks up closed-carrying nodes
    # too, so the member compiles as a (target-less) node shape whose
    # closedness the conformance join evaluates — lifted in r4s10 (was a
    # clean reject)
    if (
        g.obj1(node, SH + "property") is not None
        or (cl := g.obj1(node, SH + "closed")) is not None
        and cl[1] == "true"
    ):
        if tc.ref_shape is not None:
            raise ValueError(
                "SHACL: sh:property/sh:closed and sh:node on one member "
                "node are unsupported in this subset"
            )
        if tc.negated:
            raise ValueError(
                "SHACL: sh:not over a member carrying sh:property/sh:closed "
                "is unsupported in this subset"
            )
        tc.ref_shape = node
    if g.obj1(node, SH + "qualifiedValueShape") is not None:
        # only meaningful on a property shape (needs sh:path, which the
        # wrapper branch handles); directly on a value-level member it is
        # an invalid schema — reject, never silently pass
        raise ValueError(
            "SHACL: sh:qualifiedValueShape on a logical-member node "
            "without sh:path is unsupported (invalid without a path)"
        )


def _splice_or_members(members: list[TripleConstraint]) -> list[TripleConstraint]:
    """OR associativity: a member that is a PURE disjunction carrier (a
    nested sh:or whose own fields were distributed away) splices its
    disjuncts into the parent list — pure simplification; since round 4
    the evaluator threads path-keyed ref columns to ANY depth
    (plans/validate._walk_value_nodes), so splicing is no longer
    load-bearing for refs.  ``sh:xone``
    and negated carriers keep their nesting — exactly-one and NOT are not
    associative with the outer OR (pure-value nested xone/NOT is handled
    by the evaluator's recursive ``_value_ok``)."""
    out: list[TripleConstraint] = []
    for m in members:
        if m.disjuncts and not m.xone and not m.negated and not _has_value_fields(m):
            out.extend(m.disjuncts)
        else:
            out.append(m)
    return out


def _tc_value_copy(tc: TripleConstraint) -> TripleConstraint:
    """Copy the value-level payload of ``tc`` (fields + structural
    disjunction/conjunction/negation) onto a fresh carrier."""
    m = TripleConstraint(pred=tc.pred)
    for f in _VALUE_FIELDS:
        setattr(m, f, getattr(tc, f))
    m.disjuncts = tc.disjuncts
    m.xone = tc.xone
    m.negated = tc.negated
    m.conjuncts = tc.conjuncts
    return m


def _clear_value(tc: TripleConstraint) -> None:
    for f in _VALUE_FIELDS:
        setattr(tc, f, None)
    tc.disjuncts = None
    tc.xone = False
    tc.negated = False
    tc.conjuncts = None


def _fold_and_members(tc: TripleConstraint, members: list[TripleConstraint]) -> None:
    """Conjoin sh:and members into ``tc``.  Pure-value members field-fold
    (conflicting values raise; one disjunction may survive, with direct
    fields distributed into it).  A member carrying negation (sh:not), a
    nested conjunction, or a SECOND disjunction lowers the whole
    conjunction to a ``conjuncts`` carrier instead — the evaluator ANDs
    members recursively (validate._value_ok), with shape refs supported at
    any depth, so no component is ever silently dropped (before round 4 a
    negated member's NOT was lost by the field fold — the inverted-verdict
    failure mode)."""
    complex_ = any(m.negated or m.conjuncts for m in members) or (
        sum(1 for m in members if m.disjuncts) + (1 if tc.disjuncts else 0) > 1
    )
    if complex_:
        conj: list[TripleConstraint] = []
        if _has_value_fields(tc) or tc.disjuncts or tc.negated or tc.conjuncts:
            conj.append(_tc_value_copy(tc))
            _clear_value(tc)
        conj.extend(members)
        tc.conjuncts = conj
        return
    for m in members:
        if m.disjuncts:
            tc.disjuncts, tc.xone = m.disjuncts, m.xone
            continue
        for f in _VALUE_FIELDS:
            mv = getattr(m, f)
            if mv is None:
                continue
            if getattr(tc, f) is not None and getattr(tc, f) != mv:
                raise ValueError(f"SHACL: conflicting {f} in sh:and members")
            setattr(tc, f, mv)
    # a TC carrying BOTH direct fields and a disjunction would drop the
    # fields (_value_ok's disjunct branch returns the member-OR alone):
    # distribute — (a OR b) AND dt ≡ (a AND dt) OR (b AND dt)
    if tc.disjuncts and _has_value_fields(tc):
        _distribute_siblings(tc, tc.disjuncts, "sh:and over a disjunction")


def _has_value_fields(tc: TripleConstraint) -> bool:
    return any(getattr(tc, f) is not None for f in _VALUE_FIELDS)


def _distribute_siblings(
    tc: TripleConstraint, members: list[TripleConstraint], comp: str
) -> None:
    """Move ``tc``'s sibling value fields into every disjunction member
    (SHACL components are independent conjuncts, spec §4.6.2; distribution
    over OR is semantics-preserving because members are never negated).
    Reference parity: shaclex core behind SchemaService.scala:80-84."""
    for f in _VALUE_FIELDS:
        sv = getattr(tc, f)
        if sv is None:
            continue
        for m in members:
            if getattr(m, f) is not None:
                raise ValueError(
                    f"SHACL: {comp} member and a sibling constraint both "
                    f"set {f} — no single-slot encoding in this subset"
                )
            setattr(m, f, sv)
        setattr(tc, f, None)


_WRAP_SFX = "#auto-wrap"

# node-level predicates whose payload the frontend can inline as plain
# value fields when a sh:node target carries nothing else (annotations
# included — they are ignored everywhere)
_PLAIN_VALUE_PREDS = frozenset(
    SH + p
    for p in (
        "datatype", "nodeKind", "in", "minInclusive", "maxInclusive",
        "minExclusive", "maxExclusive", "pattern", "flags", "minLength",
        "maxLength", "languageIn", "class", "hasValue",
        "message", "severity", "name", "description",
    )
) | {RDF_TYPE}


def _inject_path_member_wrappers(g: "_Graph") -> None:
    """A node that carries ``sh:path`` but is NOT the object of a
    ``sh:property`` arc is a property shape used in a non-property
    position: a logical member (sh:or/xone/and/not lists), a
    ``sh:qualifiedValueShape``, or a standalone TARGETED property shape
    (``ex:P sh:path ex:p ; sh:targetClass ex:C``).  Wrap each in a
    synthetic anonymous node shape (one injected ``sh:property`` arc) so
    the ordinary property-shape parse reads it whole and every use site
    reduces to a shape REFERENCE — before round 4 session 10 these
    members were silently unread (the trivially-conformant failure
    mode)."""
    referenced_by_property = {
        v
        for preds in g.spo.values()
        for _, v, _, _ in preds.get(SH + "property", [])
    }
    for n in [n for n, preds in g.spo.items() if SH + "path" in preds]:
        if n in referenced_by_property:
            continue
        g.spo[n + _WRAP_SFX][SH + "property"].append(("bnode", n, None, None))


def _is_plain_value_shape(g: "_Graph", n: str) -> bool:
    """True when ``n`` exists in the shapes graph and carries ONLY plain
    value components (no sh:property/closed/targets/logicals/path/node),
    so a ``sh:node`` reference to it can be INLINED into the referencing
    constraint — which keeps literal values working (conformant-set joins
    range over subjects only) and costs no join."""
    preds = g.spo.get(n)
    return preds is not None and all(p in _PLAIN_VALUE_PREDS for p in preds)


def _merge_value_fields(tc: TripleConstraint, m: TripleConstraint, ctx: str) -> None:
    """Conjoin ``m``'s value fields onto ``tc`` with conflict detection
    (same contract as the sh:and field fold)."""
    for f in _VALUE_FIELDS:
        mv = getattr(m, f)
        if mv is None:
            continue
        if getattr(tc, f) is not None and getattr(tc, f) != mv:
            raise ValueError(f"SHACL: conflicting {f} {ctx}")
        setattr(tc, f, mv)


def _tree_nodes(tc: TripleConstraint):
    yield tc
    for d in tc.disjuncts or []:
        yield from _tree_nodes(d)
    for c in tc.conjuncts or []:
        yield from _tree_nodes(c)


def _tree_has_ref(tc: TripleConstraint) -> bool:
    return any(
        n.ref_shape is not None or n.class_iri is not None for n in _tree_nodes(tc)
    )


def _path_ast(g: "_Graph", k: str, v: str) -> PathNode:
    """sh:path object (beyond a direct IRI) → path AST."""
    if k == "iri":
        return PathPred(v)
    if (alt := g.obj1(v, SH + "alternativePath")) is not None:
        members = g.rdf_list(alt[1])
        if not members:
            raise ValueError("SHACL: empty sh:alternativePath list")
        return PathAlt(tuple(_path_ast(g, mk, mv) for mk, mv, _, _ in members))
    if (z := g.obj1(v, SH + "zeroOrMorePath")) is not None:
        return PathClosure(_path_ast(g, z[0], z[1]), 0, None)
    if (o := g.obj1(v, SH + "oneOrMorePath")) is not None:
        return PathClosure(_path_ast(g, o[0], o[1]), 1, None)
    if (zo := g.obj1(v, SH + "zeroOrOnePath")) is not None:
        return PathClosure(_path_ast(g, zo[0], zo[1]), 0, 1)
    if (inv := g.obj1(v, SH + "inversePath")) is not None:
        return PathInverse(_path_ast(g, inv[0], inv[1]))
    members = g.rdf_list(v)
    if members:  # sequence path: sh:path ( ex:a ex:b … )
        if len(members) < 2:
            raise ValueError("SHACL: sequence path needs ≥ 2 members")
        return PathSeq(tuple(_path_ast(g, mk, mv) for mk, mv, _, _ in members))
    raise ValueError(f"SHACL: unrecognized sh:path object {v}")


def _parse_path(g: "_Graph", pk: str, pv: str) -> tuple[str | None, bool, PathNode | None]:
    """sh:path object → (pred, inverse, path_ast).  Direct IRIs and plain
    single-predicate inverses keep the fast pred== evaluator paths;
    everything else compiles to an AST."""
    if pk == "iri":
        return pv, False, None
    if pk != "bnode":
        raise ValueError("SHACL: sh:path must be an IRI or blank node")
    inv = g.obj1(pv, SH + "inversePath")
    if inv is not None and inv[0] == "iri":
        return inv[1], True, None
    ast = _path_ast(g, pk, pv)
    return None, False, ast


def _read_sparql_constraint(
    g: "_Graph", cnode: str, doc_prefixes: dict[str, str]
) -> tuple[str, str | None]:
    """One ``sh:sparql`` constraint: the ``sh:select`` query text with a
    PREFIX header assembled from ``sh:prefixes``/``sh:declare`` plus (as a
    documented convenience the reference's TopBraid engine also extends)
    the shapes document's own prefix map."""
    sel = g.obj1(cnode, SH + "select")
    if sel is None:
        raise ValueError("SHACL: sh:sparql constraint requires sh:select")
    msg = g.obj1(cnode, SH + "message")
    decls = dict(doc_prefixes)
    for _, ont, _, _ in g.objs(cnode, SH + "prefixes"):
        for _, d, _, _ in g.objs(ont, SH + "declare"):
            px = g.obj1(d, SH + "prefix")
            ns = g.obj1(d, SH + "namespace")
            if px is not None and ns is not None:
                decls[px[1]] = ns[1]
    header = "".join(f"PREFIX {p}: <{iri}>\n" for p, iri in decls.items())
    return header + sel[1], (msg[1] if msg is not None else None)


# node-shape-level predicates this frontend reads (or deliberately
# ignores as annotations); anything else in the SHACL namespace on a
# discovered node shape rejects — never a silent pass
_NODE_LEVEL_KNOWN = frozenset(
    SH + p
    for p in (
        # structure / targets / evaluated components
        "targetClass", "targetNode", "targetSubjectsOf", "targetObjectsOf",
        "property", "closed", "ignoredProperties", "sparql", "deactivated",
        "or", "xone", "and", "not", "node", "class", "hasValue",
        "in", "datatype", "nodeKind", "minInclusive", "maxInclusive",
        "minExclusive", "maxExclusive", "pattern", "flags", "minLength",
        "maxLength", "languageIn",
        # pure annotations (report/UI metadata — no verdict impact)
        "message", "severity", "name", "description", "order", "group",
    )
) | {RDF_TYPE}


def _member_shape_rep(
    g: "_Graph",
    base: str,
    tag: str,
    m: TripleConstraint,
    shapes: dict[str, Shape],
) -> str:
    """Reduce a node-shape-level logical member to a shape ID the
    shape-level evaluator can reference.  A pure first-level reference
    passes through; everything else synthesizes an anonymous shape
    (``{base}#nl-{tag}``) decomposed into node_constraint /
    conjunct_refs / conjunct_classes / negated_refs — the same
    synthetic-shape trick ShEx uses for mixed shape-level ORs
    (plans/shex.py ``urn:shex:or:N``).  References nested BELOW the
    first level of the member's value tree reject cleanly (a Column
    gate cannot carry set membership)."""
    only_ref = m.ref_shape is not None and not (
        m.class_iri is not None
        or _has_value_fields_except(m, ("ref_shape", "class_iri"))
        or m.disjuncts
        or m.conjuncts
    )
    if only_ref and not m.negated:
        return m.ref_shape
    sid = f"{base}#nl-{tag}"
    synth = Shape(shape_id=sid)
    if m.negated:
        # NOT(payload): synthesize the un-negated payload and negate the
        # reference — NOT is not decomposable across join + gate otherwise
        inner = _tc_value_copy(m)
        inner.negated = False
        synth.negated_refs.append(_member_shape_rep(g, base, tag + "-n", inner, shapes))
        shapes[sid] = synth
        return sid
    if m.ref_shape is not None:
        synth.conjunct_refs.append(m.ref_shape)
    if m.class_iri is not None:
        synth.conjunct_classes.append(m.class_iri)
    rest = _tc_value_copy(m)
    rest.ref_shape = None
    rest.class_iri = None
    for n in _tree_nodes(rest):
        if n is not rest and (n.ref_shape is not None or n.class_iri is not None):
            raise ValueError(
                "SHACL: a node-shape-level logical member with sh:node/"
                "sh:class nested below its first level is unsupported in "
                "this subset"
            )
    if _has_value_fields(rest) or rest.disjuncts or rest.conjuncts:
        synth.node_constraint = rest
    shapes[sid] = synth
    return sid


def _has_value_fields_except(tc: TripleConstraint, skip: tuple[str, ...]) -> bool:
    return any(
        getattr(tc, f) is not None for f in _VALUE_FIELDS if f not in skip
    )


def _read_node_level(
    g: "_Graph",
    s: str,
    shape: Shape,
    shapes: dict[str, Shape],
    member_nodes: set[str],
) -> None:
    """Read the node-shape-LEVEL constraint components of ``s`` — value
    components on the focus node itself, sh:node/sh:class, and the
    logical combinators with arbitrary members.  Before round 4 session
    10 ALL of these were silently unread (a node shape carrying only
    ``sh:or ( [sh:path …] … )`` compiled to zero constraints — the
    trivially-conformant failure mode).  Reference parity: shaclex
    evaluates them whole behind ``SchemaService.scala:80-84``.

    Logical members compile exactly like ShEx's shape-level algebra:
    pure-value trees gate on the focus term (Shape.node_constraint),
    shape-ish members reduce to conformance-set references
    (disjunct_refs / conjunct_refs / negated_refs, with synthetic
    anonymous shapes for mixed members)."""
    if s in member_nodes and s.startswith("_:"):
        # an ANONYMOUS logical member's components conjoin at its USE site
        # (the value-level member lifting in _read_value_constraints) —
        # reading them here too would double-apply them, and value-only
        # fields (sh:datatype on a [sh:property …] member) would turn the
        # member's conformant set empty via the focus-term gate.  A NAMED
        # shape that also appears as a member keeps its own node-level
        # compile: its own targets must still see every component.
        return
    if g.obj1(s, SH + "path") is not None:
        if g.obj1(s, SH + "property") is not None:
            raise ValueError(
                f"SHACL: shape {s} carries both sh:path and sh:property"
            )
        # standalone TARGETED property shape (ex:P sh:path ex:p ;
        # sh:targetClass ex:C ; …): focus nodes come from the targets and
        # the condition is the injected wrapper shape holding this node as
        # its one property constraint
        shape.conjunct_refs.append(s + _WRAP_SFX)
        return
    nc = TripleConstraint(pred="@focus", min_count=0, max_count=None)
    _read_value_constraints(g, s, nc, nested=False)
    # direct sh:node / sh:class act on the FOCUS node: set-membership
    # joins, not Column gates (plain sh:node targets were already inlined
    # into nc's value fields by _read_value_constraints)
    if nc.ref_shape is not None:
        shape.conjunct_refs.append(nc.ref_shape)
        nc.ref_shape = None
    if nc.class_iri is not None:
        shape.conjunct_classes.append(nc.class_iri)
        nc.class_iri = None
    if (hv := g.obj1(s, SH + "hasValue")) is not None:
        # node-shape sh:hasValue: the value-node set is {focus}, so the
        # condition degenerates to focus == term (spec §4.5.2)
        member = ("literal" if hv[0] == "literal" else "iri", hv[1])
        if nc.value_set is None:
            nc.value_set = [member]
        else:
            nc.value_set = [member] if member in nc.value_set else []
    conj: list[TripleConstraint] = []
    if _has_value_fields(nc) or nc.disjuncts or nc.conjuncts or nc.negated:
        conj.append(nc)
    # sh:or / sh:xone over arbitrary members
    for comp, is_x in (("or", False), ("xone", True)):
        if (v := g.obj1(s, SH + comp)) is None:
            continue
        members = []
        for _, mnode, _, _ in g.rdf_list(v[1]):
            m = TripleConstraint(pred="@focus")
            _read_value_constraints(g, mnode, m, nested=True)
            members.append(m)
        if not members:
            raise ValueError(f"SHACL: empty sh:{comp} list on node shape {s}")
        if not any(_tree_has_ref(m) for m in members):
            # pure-value disjunction: a focus-term Column gate, no joins
            carrier = TripleConstraint(pred="@focus")
            carrier.disjuncts = _splice_or_members(members) if not is_x else members
            carrier.xone = is_x
            conj.append(carrier)
        else:
            if shape.disjunct_refs:
                raise ValueError(
                    "SHACL: two shape-level disjunction lists on one node "
                    "shape are unsupported in this subset"
                )
            shape.disjunct_refs = [
                _member_shape_rep(g, s, f"{comp}{k}", m, shapes)
                for k, m in enumerate(members)
            ]
            shape.disjunct_refs_xone = is_x
    # sh:and: members conjoin — value trees into the gate, shape-ish
    # members as conjunct references
    if (v := g.obj1(s, SH + "and")) is not None:
        for k, (_, mnode, _, _) in enumerate(g.rdf_list(v[1])):
            m = TripleConstraint(pred="@focus")
            _read_value_constraints(g, mnode, m, nested=True)
            if not _tree_has_ref(m):
                conj.append(m)
            else:
                shape.conjunct_refs.append(
                    _member_shape_rep(g, s, f"and{k}", m, shapes)
                )
    # sh:not (repeatable): negated member
    for k, (_, mnode, _, _) in enumerate(g.objs(s, SH + "not")):
        m = TripleConstraint(pred="@focus")
        _read_value_constraints(g, mnode, m, nested=True)
        if not _tree_has_ref(m):
            neg = _tc_value_copy(m)
            neg.negated = not neg.negated
            conj.append(neg)
        elif (
            m.class_iri is not None
            and not m.negated
            and m.ref_shape is None
            and not _has_value_fields_except(m, ("class_iri",))
            and not m.disjuncts
            and not m.conjuncts
        ):
            shape.negated_classes.append(m.class_iri)
        else:
            shape.negated_refs.append(_member_shape_rep(g, s, f"not{k}", m, shapes))
    if conj:
        shape.node_constraint = (
            conj[0]
            if len(conj) == 1
            else TripleConstraint(pred="@focus", conjuncts=conj)
        )
    # sweep: any OTHER SHACL-namespace component on the node shape is
    # either property-shape-only (sh:minCount, sh:uniqueLang, pair
    # constraints, …) or outside this subset — reject, never silently pass
    for p in g.spo.get(s, {}):
        if p.startswith(SH) and p not in _NODE_LEVEL_KNOWN:
            raise ValueError(
                f"SHACL: unsupported component <{p}> at node-shape level "
                f"on {s}"
            )


def parse_shacl(text: str, fmt: str = "turtle") -> CompiledSchema:
    """Parse a SHACL shapes graph into the shared constraint IR.

    ``fmt`` accepts any RDF syntax this engine parses — reference parity
    with ``ShaclFormat.availableFormats = List(Turtle, NTriples, NQuads,
    TriG, JsonLd, RdfXml)`` (``ShaclFormat.scala:20-28``; shaclex reads
    the shapes graph through Jena from any of them).  The shapes-document
    prefix map (a convenience merged into ``sh:sparql`` query headers) is
    only recoverable from Turtle/TriG text; other syntaxes carry absolute
    IRIs, so their SPARQL constraints must declare prefixes via
    ``sh:prefixes``/``sh:declare`` (the spec's own mechanism).
    """
    key = (fmt or "turtle").lower()
    parser = PARSERS.get(key)
    if parser is None or key.startswith("html"):
        raise ValueError(f"SHACL: unsupported shapes-graph format {fmt!r}")
    triples = parser(text)
    g = _Graph(triples)
    prefixes = turtle_prefixes(text) if parser is parse_turtle else {}
    shapes: dict[str, Shape] = {}

    _inject_path_member_wrappers(g)
    node_shapes = [
        s
        for s, preds in g.spo.items()
        if any(v == SH + "NodeShape" for _, v, _, _ in preds.get(RDF_TYPE, []))
        or SH + "property" in preds
        or SH + "targetClass" in preds
        or SH + "targetNode" in preds
        or SH + "targetSubjectsOf" in preds
        or SH + "targetObjectsOf" in preds
        # closed-carrying logical members compile as anonymous shapes
        # (their conformance join evaluates the closedness); sh:closed on
        # a node that is itself a property shape stays with that parse
        or (SH + "closed" in preds and SH + "path" not in preds)
    ]
    # nodes used as logical members / qualified value shapes: their
    # components conjoin at the USE site (value level) — collected so the
    # node-shape-level reader never double-applies them at focus level
    member_nodes: set[str] = set()
    for _s2, preds in g.spo.items():
        for comp in ("or", "xone", "and"):
            for _, head, _, _ in preds.get(SH + comp, []):
                member_nodes.update(v for _, v, _, _ in g.rdf_list(head))
        member_nodes.update(v for _, v, _, _ in preds.get(SH + "not", []))
        member_nodes.update(
            v for _, v, _, _ in preds.get(SH + "qualifiedValueShape", [])
        )
    for s in node_shapes:
        # sh:deactivated true (spec §2.1.3.3): the shape validates nothing
        if (da := g.obj1(s, SH + "deactivated")) is not None and da[1] == "true":
            continue
        shape = Shape(shape_id=s)
        shape.target_class = [v for _, v, _, _ in g.objs(s, SH + "targetClass")]
        shape.target_node = [v for _, v, _, _ in g.objs(s, SH + "targetNode")]
        shape.target_subjects_of = [v for _, v, _, _ in g.objs(s, SH + "targetSubjectsOf")]
        shape.target_objects_of = [v for _, v, _, _ in g.objs(s, SH + "targetObjectsOf")]
        closed = g.obj1(s, SH + "closed")
        shape.closed = bool(closed and closed[1] == "true")
        if (ig := g.obj1(s, SH + "ignoredProperties")) is not None:
            shape.ignored = [val for _, val, _, _ in g.rdf_list(ig[1])]
        for _, cnode, _, _ in g.objs(s, SH + "sparql"):
            shape.sparql_selects.append(_read_sparql_constraint(g, cnode, prefixes))
        # node-shape-LEVEL components: value constraints on the focus node
        # itself, sh:node/sh:class, and sh:or/xone/and/not with arbitrary
        # members (silently unread before r4s10)
        _read_node_level(g, s, shape, shapes, member_nodes)
        # (qualified constraint, disjoint flag) per sh:qualifiedValueShape —
        # sibling wiring for sh:qualifiedValueShapesDisjoint happens after
        # the property-shape loop, when all siblings exist
        qvs_tcs: list[tuple[TripleConstraint, bool]] = []

        for _, pshape, _, _ in g.objs(s, SH + "property"):
            if (pda := g.obj1(pshape, SH + "deactivated")) is not None and pda[1] == "true":
                continue
            for bad in g.spo.get(pshape, {}):
                if bad in _UNSUPPORTED:
                    raise ValueError(f"SHACL: unsupported constraint {bad}")
            # property-shape sh:sparql: $this is still the focus node of
            # the enclosing node shape — same evaluation path
            for _, cnode, _, _ in g.objs(pshape, SH + "sparql"):
                shape.sparql_selects.append(_read_sparql_constraint(g, cnode, prefixes))
            path = g.obj1(pshape, SH + "path")
            if path is None:
                raise ValueError(f"SHACL: property shape {pshape} has no sh:path")
            if (pcl := g.obj1(pshape, SH + "closed")) is not None and pcl[1] == "true":
                # sh:closed on a PROPERTY shape closes the value nodes, a
                # per-value neighbourhood this subset does not aggregate —
                # reject (was silently unread)
                raise ValueError(
                    "SHACL: sh:closed on a property shape is unsupported "
                    "in this subset (close the value nodes via sh:node to "
                    "a closed node shape instead)"
                )
            pred, inverse, past = _parse_path(g, path[0], path[1])
            # sh:closed + non-trivial paths: spec §4.8.1 — closedness ranges
            # over the shape's IRI sh:path values ONLY, so a sequence/
            # alternative/closure path contributes nothing to the allowed
            # predicate set (the evaluator's `mentioned` already excludes
            # path constraints); no reject needed
            tc = TripleConstraint(
                pred=pred if past is None else path_display(past),
                min_count=0,
                max_count=None,
                inverse=inverse,
                path=past,
            )
            if (v := g.obj1(pshape, SH + "minCount")) is not None:
                tc.min_count = int(v[1])
            if (v := g.obj1(pshape, SH + "maxCount")) is not None:
                tc.max_count = int(v[1])
            _read_value_constraints(g, pshape, tc)
            if (v := g.obj1(pshape, SH + "uniqueLang")) is not None and v[1] == "true":
                tc.unique_lang = True
            # sh:message: custom violation text carried into the report's
            # reasons column; sh:severity rides along for the report's
            # sh:resultSeverity (the VERDICT stays binary — severity never
            # affects conformance, spec §3.4)
            if (v := g.obj1(pshape, SH + "message")) is not None:
                tc.message = v[1]
            if (v := g.obj1(pshape, SH + "severity")) is not None:
                tc.severity = v[1]

            # sh:hasValue: the value set must INCLUDE the term — count-only
            # semantics over a one-member value set (other values are never
            # violations), i.e. a qualified constraint with min 1
            if (hv := g.obj1(pshape, SH + "hasValue")) is not None:
                hk, hval = hv[0], hv[1]
                shape.constraints.append(
                    TripleConstraint(
                        pred=tc.pred,
                        min_count=1,
                        max_count=None,
                        inverse=inverse,
                        path=past,
                        qualified=True,
                        value_set=[("literal" if hk == "literal" else "iri", hval)],
                    )
                )

            # sh:qualifiedValueShape [ … ] + sh:qualifiedMin/MaxCount:
            # a SEPARATE count-only constraint on the same path — values
            # failing the qualified shape are not violations, only the
            # count of satisfying values is bounds-checked
            qvs = g.obj1(pshape, SH + "qualifiedValueShape")
            qtc = None
            if qvs is not None:
                dis = g.obj1(pshape, SH + "qualifiedValueShapesDisjoint")
                qtc_disjoint = bool(dis is not None and dis[1] == "true")
                qtc = TripleConstraint(
                    pred=tc.pred,
                    min_count=0,
                    max_count=None,
                    inverse=inverse,
                    path=past,
                    qualified=True,
                )
                _read_value_constraints(g, qvs[1], qtc, nested=True)
                if (v := g.obj1(pshape, SH + "qualifiedMinCount")) is not None:
                    qtc.min_count = int(v[1])
                if (v := g.obj1(pshape, SH + "qualifiedMaxCount")) is not None:
                    qtc.max_count = int(v[1])
                if qtc.min_count == 0 and qtc.max_count is None:
                    raise ValueError(
                        "SHACL: sh:qualifiedValueShape requires "
                        "sh:qualifiedMinCount and/or sh:qualifiedMaxCount"
                    )

            # sh:or ( m1 m2 … ): value disjunction — each member is a
            # value-only blank node lifted into a disjunct TC.  SHACL
            # components on one property shape are independent conjuncts,
            # so sibling value constraints distribute into every member:
            # s AND (m1 OR m2) ≡ (s AND m1) OR (s AND m2)  (members carry
            # no negation, so the fold is sound; a field set on both sides
            # has no single-slot encoding and stays rejected)
            if (v := g.obj1(pshape, SH + "or")) is not None:
                members = []
                for _, mnode, _, _ in g.rdf_list(v[1]):
                    m = TripleConstraint(pred=tc.pred)
                    _read_value_constraints(g, mnode, m, nested=True)
                    members.append(m)
                # splice pure nested-OR carriers FIRST (associativity),
                # then distribute pshape-level siblings into the flat list
                members = _splice_or_members(members)
                _distribute_siblings(tc, members, "sh:or")
                tc.disjuncts = members

            # sh:xone ( m1 m2 … ): exactly-one-of value disjunction — same
            # member lifting as sh:or, exclusive verdict per value.  The
            # sibling fold is still sound for the xone count: a value
            # failing the sibling satisfies zero folded members (≠ 1),
            # matching the independent-conjunct verdict.
            if (v := g.obj1(pshape, SH + "xone")) is not None:
                if tc.disjuncts:
                    raise ValueError(
                        "SHACL: sh:xone combined with sh:or on one property "
                        "shape is not supported in this subset"
                    )
                members = []
                for _, mnode, _, _ in g.rdf_list(v[1]):
                    m = TripleConstraint(pred=tc.pred)
                    _read_value_constraints(g, mnode, m, nested=True)
                    members.append(m)
                _distribute_siblings(tc, members, "sh:xone")
                tc.disjuncts = members
                tc.xone = True

            # property-pair constraints: sh:path's value set compared with
            # another predicate's value set on the same focus node
            for sh_name, f_name in (
                ("equals", "pair_equals"),
                ("disjoint", "pair_disjoint"),
                ("lessThan", "pair_less_than"),
                ("lessThanOrEquals", "pair_less_than_eq"),
            ):
                if (v := g.obj1(pshape, SH + sh_name)) is not None:
                    if inverse or past is not None:
                        raise ValueError(
                            f"SHACL: sh:{sh_name} requires a direct sh:path "
                            "predicate (no inverse/sequence paths)"
                        )
                    setattr(tc, f_name, v[1])

            # sh:and ( m1 m2 … ): conjunction — members' value components
            # merge onto the property shape (conflicting fields rejected)
            if (v := g.obj1(pshape, SH + "and")) is not None:
                members = []
                for _, mnode, _, _ in g.rdf_list(v[1]):
                    m = TripleConstraint(pred=tc.pred)
                    _read_value_constraints(g, mnode, m, nested=True)
                    members.append(m)
                _fold_and_members(tc, members)

            # sh:not [ … ]: negated value constraint (only form supported:
            # no sibling value constraints on the property shape itself)
            if (v := g.obj1(pshape, SH + "not")) is not None:
                if _has_value_fields(tc) or tc.disjuncts:
                    raise ValueError(
                        "SHACL: sh:not combined with sibling value constraints "
                        "is not supported in this subset"
                    )
                _read_value_constraints(g, v[1], tc, nested=True)
                tc.negated = not tc.negated
            # a pshape carrying ONLY qualified/hasValue constraints leaves
            # the plain tc trivial ({0,*}, no value components) — skip the
            # useless aggregate
            trivial = (
                tc.min_count == 0
                and tc.max_count is None
                and not _has_value_fields(tc)
                and not tc.disjuncts
                and not tc.negated
                and not tc.unique_lang
                and tc.pair_equals is None
                and tc.pair_disjoint is None
                and tc.pair_less_than is None
                and tc.pair_less_than_eq is None
            )
            if not (trivial and (qtc is not None or hv is not None)):
                shape.constraints.append(tc)
            if qtc is not None:
                shape.constraints.append(qtc)
                qvs_tcs.append((qtc, qtc_disjoint))
        # sh:qualifiedValueShapesDisjoint (spec §4.7): a value counts toward
        # a disjoint qualified constraint only if it conforms to NO sibling
        # qualified value shape.  Siblings carrying sh:node / sh:class are
        # supported over ANY path shape (forward, inverse, sequence/alt/
        # closure): the sibling's VALUE SHAPE applies to this constraint's
        # values regardless of the sibling's own path, so the evaluator
        # attaches dedicated per-(constraint, sibling) conformance columns
        # to each constraint's own value neighbourhood
        # (plans/validate._sib_reqs) — path-keyed since round 4, so sibling
        # refs resolve at any nesting depth.
        for qtc, disjoint in qvs_tcs:
            if not disjoint:
                continue
            qtc.disjoint_siblings = [o for o, _ in qvs_tcs if o is not qtc]
        shapes[s] = shape

    return CompiledSchema(engine="shacl", shapes=shapes, prefixes=prefixes)
